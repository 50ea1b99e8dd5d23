package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ↔ catalyst-Expression
  * converters, so the library can expose custom codegen `Expression`s
  * (e.g. [[graft.functions.CosineSimilarity]]) through the public Column
  * API without registering session extensions. Lives under
  * `org.apache.spark.sql` for access only — the standard pattern of
  * Spark-ecosystem expression libraries; nothing else belongs here. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
