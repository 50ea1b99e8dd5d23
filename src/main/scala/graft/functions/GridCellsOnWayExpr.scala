package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Static bridge the generated Java calls into: runs the primitive
  * slope walk ([[GeoFunctions.cellsOnWayInts]],
  * GeoUtils.java:89-150) and wraps the `int[]` as Spark's off-heap
  * array layout in one copy. A Scala top-level object emits static
  * forwarders, so `graft.functions.GeoWalk.cells(...)` is a plain
  * static call from codegen — no boxing, no closure capture. */
object GeoWalk {
  def cells(lon1: Double, lat1: Double, lon2: Double, lat2: Double): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(
      GeoFunctions.cellsOnWayInts(lon1, lat1, lon2, lat2))
}

/** Native Catalyst expression for F3 path rasterization
  * (`GeoUtils.java:89-150` slope walk) — the promotion of the one hot
  * per-row UDF in the contract to whole-stage codegen, same tier-(b)
  * pattern as [[CosineSimilarity]]. Versus the Scala UDF this removes
  * four `Double` boxes, an `ArrayBuffer`, the `Seq→catalyst` converter
  * and the codegen fence per row; the walk itself is the identical
  * shared primitive routine, so expression == UDF byte-for-byte
  * (asserted by GeoFunctionsExprSpec). */
final case class GridCellsOnWay(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects DOUBLE inputs, got " +
        children.map(_.dataType.sql).mkString(", "))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "grid_cells_on_way"

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GeoWalk.cells(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.GeoWalk.cells($a, $b, $c, $d);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

object GridCellsOnWay {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  /** Column face of the expression. */
  def apply(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column =
    ColumnBridge.column(GridCellsOnWay(
      ColumnBridge.expression(lon1), ColumnBridge.expression(lat1),
      ColumnBridge.expression(lon2), ColumnBridge.expression(lat2)))
}
