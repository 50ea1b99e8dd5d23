package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-by-stage profiling for q18 (local iteration). */
object ProfileQ18 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.load(spark, dir, "documents")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }

    time("docs count")(docs.count())
    time("shingleTable raw")(
      Dedup.shingleTable(docs, 3, "text", "doc_id").count())
    time("shingleHashes (memoized, persists)")(
      Dedup.shingleHashes(docs, 3, "text", "doc_id").count())
    time("shingleHashes again (cache hit)")(
      Dedup.shingleHashes(docs, 3, "text", "doc_id").count())
    time("full q18 (warm cache)")(
      Dedup.ngramJaccardPairs(docs, 3, 0.35, 100).count())
    time("full q18 again")(
      Dedup.ngramJaccardPairs(docs, 3, 0.35, 100).count())
    graft.util.CacheRegistry.releaseAll()
    time("full q18 (cold cache)")(
      Dedup.ngramJaccardPairs(docs, 3, 0.35, 100).count())
    graft.util.CacheRegistry.releaseAll()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("full q18 (cold cache, codegen off)")(
      Dedup.ngramJaccardPairs(docs, 3, 0.35, 100).count())
    spark.conf.set("spark.sql.codegen.wholeStage", "true")

    // stage breakdown (warm shingle cache)
    import org.apache.spark.sql.expressions.Window
    val s0 = Dedup.shingleHashes(docs, 3, "text", "doc_id")
    time("warm: shingle cache count")(s0.count())
    val sf = s0.withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
      .filter(col("df") <= lit(100)).select("sid", "sh")
    time("warm: df-capped table")(sf.count())
    val inter = sf.select(col("sid").as("a_id"), col("sh"))
      .join(sf.select(col("sid").as("b_id"), col("sh")), "sh")
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    time("warm: inter pairs")(inter.count())
    val sz = sf.groupBy("sid").agg(count(lit(1)).as("sz"))
    time("warm: sz")(sz.count())
    time("warm: full q18")(Dedup.ngramJaccardPairs(docs, 3, 0.35, 100).count())
    spark.stop()
  }
}
