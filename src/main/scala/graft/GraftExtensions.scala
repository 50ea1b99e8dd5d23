package graft

import graft.functions.{CosineSimilarity, GridCellsOnWay}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.FunctionBridge

/** The library's `SparkSessionExtensions` face: registers graft's custom
  * Catalyst expressions as SQL functions, so `spark.sql("SELECT
  * cosine_sim(a, b) …")` works anywhere the DataFrame API does — the
  * deployment shape is one cluster conf line,
  * `spark.sql.extensions=graft.GraftExtensions`, and every session on
  * the cluster (including pure-SQL clients) gets the functions with full
  * whole-stage codegen. [[GraftExtensions.register]] does the same for a
  * session that already exists (notebooks, tests).
  *
  * Only genuinely custom expressions are registered; graft operators
  * that compose Spark built-ins need no registration — they are already
  * reachable from SQL. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, className, builder) =>
      ext.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo(className, name),
        builder))
    }
}

object GraftExtensions {
  private def binary(f: (Expression, Expression) => Expression)(
      args: Seq[Expression]): Expression = {
    require(args.length == 2, s"expected 2 arguments, got ${args.length}")
    f(args(0), args(1))
  }

  /** (name, implementing class for DESCRIBE FUNCTION, builder) for every
    * registered SQL function — the class name lives in the table so each
    * entry documents itself. */
  private def quaternary(
      f: (Expression, Expression, Expression, Expression) => Expression)(
      args: Seq[Expression]): Expression = {
    require(args.length == 4, s"expected 4 arguments, got ${args.length}")
    f(args(0), args(1), args(2), args(3))
  }

  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", classOf[CosineSimilarity].getName,
      binary(CosineSimilarity(_, _)) _),
    ("grid_cells_on_way", classOf[GridCellsOnWay].getName,
      quaternary(GridCellsOnWay(_, _, _, _)) _))

  /** Register the same functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      FunctionBridge.registerTemp(spark, name, builder)
    }
}
