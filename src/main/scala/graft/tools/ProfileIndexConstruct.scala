package graft.tools

import org.apache.spark.sql.SparkSession

/** Attribute the index phase's SERIAL construction bill (r19: with
  * counts parallelized, construction is the remaining ~half of the
  * phase wall): time `indexBuildsProbe` (construction + key
  * derivation only, no counts) and split out the cumulative
  * [[graft.util.CacheRegistry.planFingerprint]] cost via its
  * diagnostic counters. Usage:
  * SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileIndexConstruct */
object ProfileIndexConstruct {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.useIdInClassName", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fp0 = graft.util.CacheRegistry.fingerprintNanos.get()
    val fc0 = graft.util.CacheRegistry.fingerprintCalls.get()
    val t0 = System.nanoTime()
    graft.SparkEntry.indexBuildsProbe(spark, dir)
    val wall = (System.nanoTime() - t0) / 1e9
    val fpS = (graft.util.CacheRegistry.fingerprintNanos.get() - fp0) / 1e9
    val fpN = graft.util.CacheRegistry.fingerprintCalls.get() - fc0
    println(f"[idx-construct] wall=$wall%.2f s fingerprint=$fpS%.2f s " +
      f"($fpN calls) other=${wall - fpS}%.2f s")
    // second construction: memo effects (coarse-slice guard, dim
    // probes) are warm; fingerprints re-derive per call
    val t1 = System.nanoTime()
    graft.SparkEntry.indexBuildsProbe(spark, dir)
    println(f"[idx-construct] second=${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
