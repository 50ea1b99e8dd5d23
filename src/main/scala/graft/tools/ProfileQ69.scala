package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage profiling for q69 (local iteration). */
object ProfileQ69 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.load(spark, dir, "documents")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }

    time("pairs only (q19 shape)")(
      Dedup.minHashLshPairs(docs, 3, 16, 4).count())
    graft.util.CacheRegistry.releaseAll()
    time("pairs cold again")(
      Dedup.minHashLshPairs(docs, 3, 16, 4).count())
    val src = docs.select(col("doc_id"), col("source"))
    val q69 = Dedup.minHashLshPairs(docs, 3, 16, 4)
      .join(src.select(col("doc_id").as("a_id"), col("source").as("src_a")), "a_id")
      .join(src.select(col("doc_id").as("b_id"), col("source").as("src_b")), "b_id")
      .select(least(col("src_a"), col("src_b")).as("src_lo"),
        greatest(col("src_a"), col("src_b")).as("src_hi"))
      .groupBy("src_lo", "src_hi").agg(count(lit(1)).as("n_pairs"))
    time("full q69 (warm band cache)")(q69.count())
    graft.util.CacheRegistry.releaseAll()
    time("full q69 (cold cache)")(q69.count())
    println("--- physical plan ---")
    println(q69.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
