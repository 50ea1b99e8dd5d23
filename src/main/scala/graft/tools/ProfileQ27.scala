package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage profiling for q27 (first order per customer via a
  * partitioned rank window) — its r9 driver sample spiked 10.3×
  * (0.52 → 5.37 s) with a flat history before it (2.70/0.54/0.62/0.52).
  * The plan is the intended one (one hash-partition exchange on
  * o_custkey feeding WindowGroupLimit + rank filter); this pins whether
  * wall time is data work, whole-stage-codegen compile, or environment
  * noise, per the ProfileQ26 precedent (whose spikes turned out to be
  * predecessor cache-release GC debt, since billed correctly).
  */
object ProfileQ27 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val orders = graft.sources.Tables.load(spark, dir, "orders")

    def q27(d: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_orderdate"), asc("o_orderkey"))
      d.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    }

    def time(name: String)(f: => Any): Double = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name: $s%.3f s ($r)"); s
    }

    // reproduce the bench's suite context: q26 (the alphabetical
    // predecessor) immediately before, plus an explicit GC to surface
    // any deferred debt the way Bench.exec would bill it
    if (args.contains("--suite")) {
      val li = graft.sources.Tables.load(spark, dir, "lineitem")
      time("suite ctx: q26 rollup")(
        li.rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity").cast("decimal(38,6)")).as("s")).count())
      time("suite ctx: q27 in-context #1")(q27(orders).count())
      System.gc()
      time("suite ctx: q27 after System.gc()")(q27(orders).count())
    }

    // constant session costs first
    time("scan only: orders count")(orders.count())
    time("plain groupBy o_custkey (same exchange, no window)")(
      orders.groupBy("o_custkey").agg(max("o_orderdate")).count())

    val cold = time("q27 COLD (first compile)")(q27(orders).count())
    val warm = (1 to 5).map(i => time(s"q27 warm #$i")(q27(orders).count()))
    println(f"q27 warm min=${warm.min}%.3f s median=${warm.sorted.apply(2)}%.3f s cold-warm delta=${cold - warm.min}%.3f s")

    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("q27 codegen OFF #1")(q27(orders).count())
    time("q27 codegen OFF #2")(q27(orders).count())
    spark.conf.set("spark.sql.codegen.wholeStage", "true")

    println("---- optimized plan ----")
    q27(orders).explain("formatted")
    spark.stop()
  }
}
