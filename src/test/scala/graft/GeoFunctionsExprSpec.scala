package graft

import graft.functions.GeoFunctions
import org.apache.spark.sql.functions._

/** [[graft.functions.GridCellsOnWay]] — the codegen promotion of the F3
  * rasterization UDF. The contract is byte-equality with the UDF (both
  * call the same primitive walk), verified over the q24 input shape and
  * a deterministic random sweep, plus codegen sanity (the expression
  * must live inside a WholeStageCodegen span, which the UDF never
  * could). */
class GeoFunctionsExprSpec extends SparkSpec {
  import spark.implicits._

  private def segments = Seq(
    (-74.0, 40.6, -73.8, 40.6), (-73.9, 40.55, -73.9, 40.95),
    (-74.0, 40.95, -73.8, 40.55), (-73.8, 40.55, -74.0, 40.95),
    (-74.04, 40.51, -73.71, 40.99)) ++
    (0 until 500).map { i =>
      val r = new scala.util.Random(i)
      (-74.05 + r.nextDouble() * 0.2, 40.5 + r.nextDouble() * 0.4,
       -74.05 + r.nextDouble() * 0.3, 40.5 + r.nextDouble() * 0.4)
    }

  test("grid_cells_on_way expression == UDF byte-for-byte (F3)") {
    val df = segments.toDF("lon1", "lat1", "lon2", "lat2")
    val both = df.select(
      GeoFunctions.mapToGridCellsOnWay($"lon1", $"lat1", $"lon2", $"lat2")
        .as("expr_cells"),
      GeoFunctions.mapToGridCellsOnWayUdf($"lon1", $"lat1", $"lon2", $"lat2")
        .as("udf_cells"))
    assert(both.schema("expr_cells").dataType.sql == "ARRAY<INT>")
    val diff = both.filter($"expr_cells" =!= $"udf_cells").count()
    assert(diff == 0)
  }

  test("grid_cells_on_way participates in whole-stage codegen") {
    // a Range source, not a literal LocalRelation — Catalyst would fold
    // constant inputs at plan time and leave nothing to codegen
    val df = spark.range(100).select(
      (lit(-74.05) + ($"id" % 30).cast("double") / 100).as("lon1"),
      (lit(40.5) + ($"id" % 20).cast("double") / 50).as("lat1"),
      (lit(-74.0) + ($"id" % 7).cast("double") / 100).as("lon2"),
      (lit(40.6) + ($"id" % 11).cast("double") / 50).as("lat2"))
      .select(GeoFunctions.mapToGridCellsOnWay(
        $"lon1", $"lat1", $"lon2", $"lat2").as("cells"))
    // `*(n)` is the simple-string marker for a WholeStageCodegen span;
    // the expression must sit inside one (a Scala UDF never does — it
    // plans as BatchEvalPython/plain Project outside the span)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [grid_cells_on_way"),
      s"expected grid_cells_on_way inside a codegen span, got:\n$plan")
    // and the q24 shape still computes
    assert(df.select(size($"cells")).as[Int].collect().forall(_ >= 1))
  }

  test("out-of-grid coordinates stay bounded: guard-limited, no crash (F3)") {
    // coordinates far outside the NYC box drive the cell indices to
    // extremes; the walk must terminate at the 100k-step guard with a
    // bounded result — not overflow the allocation size or blow memory
    // (the Int sum of the deltas would be negative for these inputs)
    val extremes = Seq(
      (-74.05, 40.5, 2600.0, 40.5),         // xi(lon2) near Int extreme
      (-74.05, -4.0e6, -73.7, 41.0),        // yi(lat1) huge
      (3.0e6, 40.5, -3.0e6, 41.0),          // both ends far out
      (Double.MaxValue / 1e300, 40.5, -73.7, 41.0))
    for ((a, b, c, d) <- extremes) {
      val cells = GeoFunctions.cellsOnWayInts(a, b, c, d)
      assert(cells.length >= 1 && cells.length <= 100001,
        s"walk for ($a,$b)->($c,$d) returned ${cells.length} cells")
    }
    // and the expression path returns the identical bounded result
    val df = Seq((-74.05, 40.5, 2600.0, 40.5)).toDF("a", "b", "c", "d")
      .select(
        size(GeoFunctions.mapToGridCellsOnWay($"a", $"b", $"c", $"d")).as("n_expr"),
        size(GeoFunctions.mapToGridCellsOnWayUdf($"a", $"b", $"c", $"d")).as("n_udf"))
    val r = df.head()
    assert(r.getInt(0) == r.getInt(1))
  }

  test("grid_cells_on_way is registered in SQL (extensions face)") {
    GraftExtensions.register(spark)
    val n = spark.sql(
      "SELECT size(grid_cells_on_way(-74.0D, 40.6D, -73.8D, 40.6D)) n")
      .as[Int].head()
    assert(n == GeoFunctions.cellsOnWayInts(-74.0, 40.6, -73.8, 40.6).length)
  }
}
