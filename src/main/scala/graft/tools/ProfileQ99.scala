package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** q99 compile-bill profiler: wall + whole-stage-codegen compilations,
  * cold and warm, with AQE on (arg "true"/default) or off ("false") —
  * quantifies how much of q99's residual JIT tax is AQE's per-stage
  * re-planning vs the operator's own plan count.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileQ99 [aqe]
  *
  * Round-14 extension (the "generated-class cache" experiment the r13
  * verdict asked for): env SPARK_GRAFT_CODEGEN_NOID=1 sets
  * `spark.sql.codegen.useIdInClassName=false` (the per-query stage id
  * embedded in the generated class NAME makes otherwise-identical
  * sources differ, so Janino's source-keyed compile cache can never
  * hit across stages/plans) and SPARK_GRAFT_CODEGEN_CACHE=N raises the
  * static `spark.sql.codegen.cache.maxEntries` (default 100 — q99
  * alone compiles ~126 stages, so the suite thrashes the cache).
  */
object ProfileQ99 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val aqe = args.headOption.getOrElse("true")
    val noId = sys.env.get("SPARK_GRAFT_CODEGEN_NOID").contains("1")
    val cacheN = sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.codegen.useIdInClassName", (!noId).toString)
      .config("spark.sql.codegen.cache.maxEntries", cacheN)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def cg: Long = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount
    def jit: Long = Option(
      java.lang.management.ManagementFactory.getCompilationMXBean)
      .map(_.getTotalCompilationTime).getOrElse(0L)
    def run(tag: String): Unit = {
      val t0 = System.nanoTime(); val c0 = cg; val j0 = jit
      SparkEntry.queries("q99_lsh_incremental")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[q99 aqe=$aqe] $tag wall=${(System.nanoTime() - t0) / 1e9}%.2f" +
        f" cg=${cg - c0} jit_ms=${jit - j0}")
    }
    run("cold")
    graft.util.CacheRegistry.releaseAll()
    spark.sharedState.cacheManager.clearCache()
    System.gc()
    run("warm")
    spark.stop()
  }
}
