package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway stage-by-stage profiling for q26 (rollup revenue) — its
  * driver-bench samples exceeded 2× the frozen minimum two rounds
  * running (r7 3.61 s, r8 11.09 s vs a 1.2 s minimum). The plan is the
  * one we want (Expand + single hash aggregate), so this pins where the
  * wall time actually goes: scan, Expand+agg data work, whole-stage
  * codegen compilation, or first-use classloading of the decimal
  * aggregate path.
  */
object ProfileQ26 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.sources.Tables.load(spark, dir, "lineitem")

    def q26(d: DataFrame): DataFrame = d
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(38,6)")).cast("decimal(38,6)")
          .cast("double").as("sum_qty"),
        count(lit(1)).as("cnt"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

    def time(name: String)(f: => Any): Double = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name: $s%.3f s ($r)"); s
    }

    // optional: reproduce the bench's suite context first — run the
    // heavy memoizing queries that precede q26 in Bench order, so the
    // block manager holds their persisted tables and the JVM carries
    // their GC/JIT state when q26 runs
    if (args.contains("--suite")) {
      val docs = graft.sources.Tables.load(spark, dir, "documents")
      time("suite ctx: q18 ngram-jaccard")(
        graft.dedup.Dedup.ngramJaccardPairs(docs, 3, 0.35, 100).count())
      time("suite ctx: q19 minhash LSH")(
        graft.dedup.Dedup.minHashLshPairs(docs).count())
      time("suite ctx: q26 in-context #1")(q26(li).count())
      time("suite ctx: q26 in-context #2")(q26(li).count())
      System.gc()
      time("suite ctx: q26 after System.gc()")(q26(li).count())
    }

    // isolate the constant session costs first
    time("scan only: lineitem count")(li.count())
    time("plain agg (no rollup, same decimal sum)")(
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("decimal(38,6)")).as("s")).count())

    // the query under test: cold (first codegen compile) then repeats
    val cold = time("q26 COLD (first compile)")(q26(li).count())
    val warm = (1 to 5).map(i => time(s"q26 warm #$i")(q26(li).count()))
    println(f"q26 warm min=${warm.min}%.3f s median=${warm.sorted.apply(2)}%.3f s cold-warm delta=${cold - warm.min}%.3f s")

    // codegen off: if cold-run cost is compile, this narrows the gap
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("q26 codegen OFF #1")(q26(li).count())
    time("q26 codegen OFF #2")(q26(li).count())
    spark.conf.set("spark.sql.codegen.wholeStage", "true")

    println("---- optimized plan ----")
    q26(li).explain("formatted")
    spark.stop()
  }
}
