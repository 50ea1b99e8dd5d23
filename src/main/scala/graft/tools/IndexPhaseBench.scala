package graft.tools

import org.apache.spark.sql.SparkSession

/** Index-phase A/B harness (r19 verdict tasks #4/#7): run the full
  * concurrent index phase once at SPARK_GRAFT_SF_DIR under the current
  * SPARK_GRAFT_INDEX_PAR and print the phase wall plus the ten most
  * expensive entries — the measurement behind the LPT submission order
  * and the pool-width default. Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf10x SPARK_GRAFT_INDEX_PAR=16 \
  *     runMain graft.tools.IndexPhaseBench */
object IndexPhaseBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val par = sys.env.getOrElse("SPARK_GRAFT_INDEX_PAR", "8")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.useIdInClassName", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val detail = graft.SparkEntry.buildIndexesTimed(spark, dir)
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[index-phase] par=$par sf=$dir wall=$wall%.1f s " +
      s"entries=${detail.size}")
    detail.sortBy(-_._2).take(10).foreach { case (n, s) =>
      println(f"[index-phase]   $n%-28s $s%8.2f")
    }
    spark.stop()
  }
}
