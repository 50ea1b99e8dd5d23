package graft.tools

import org.apache.spark.sql.SparkSession

/** Cold-vs-warm split for q41: the second identical run hits Spark's
  * generated-class cache, so (cold − warm) ≈ codegen compile cost and
  * warm ≈ actual data work. Same method as ProfileQ18. */
object ProfileQ41 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def run(tag: String): Unit = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q41_repetition_stats")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[q41 $tag] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    run("cold"); run("warm"); run("warm2")
    spark.stop()
  }
}
