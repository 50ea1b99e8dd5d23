package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Splits q129's wall time into CONSTRUCTION (closure → DataFrame:
  * registry key fingerprints, the coarse-slice guard, plan analysis)
  * vs EXECUTION (the noop write) — attribution for the round-16
  * steady-state shift. */
object ProfileGateConstruct {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.useIdInClassName", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.buildIndexes(spark, dir)
    def one(tag: String, q: String): Unit = {
      (1 to 3).foreach { i =>
        val f0 = graft.util.CacheRegistry.fingerprintNanos.get()
        val c0 = graft.util.CacheRegistry.fingerprintCalls.get()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, dir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        val fs = (graft.util.CacheRegistry.fingerprintNanos.get() - f0) / 1e9
        val cs = graft.util.CacheRegistry.fingerprintCalls.get() - c0
        println(f"[$tag-$i] construct=${(t1 - t0) / 1e9}%6.2f" +
          f" execute=${(t2 - t1) / 1e9}%6.2f fp=$fs%6.2f fpCalls=$cs")
      }
    }
    one("q129", "q129_ingest_gate")
    one("q118", "q118_semantic_dedup_2l")
    spark.stop()
  }
}
