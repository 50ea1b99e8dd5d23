package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` session function registry, so
  * [[graft.GraftExtensions]] can also register graft's SQL functions on
  * an ALREADY-RUNNING session (notebooks, tests) — the config-driven
  * `spark.sql.extensions` path only applies at session build time. Same
  * access-only rationale as [[ColumnBridge]]. */
object FunctionBridge {
  def registerTemp(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
