package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** q129 compile-bill profiler (the r14 verdict's ProfileQ129 ask):
  * where do the gate's ~39 in-region whole-stage compilations come
  * from, and how many survive in the REALISTIC suite context — after
  * the index phase and the sibling incremental queries (q99's bands,
  * q110's vec lookups, q122's two-level codebook, q125/q128/q131's
  * landed tables) have already compiled their shared stage shapes
  * into the generated-class cache?
  *
  * Phases (each reporting wall / whole-stage compilations / jit_ms):
  *   index    — SparkEntry.buildIndexes (the bench's untimed "index"
  *              metric context)
  *   siblings — q110, q122, q125, q128, q131, q99 (suite order puts
  *              all of these before q129; their stage shapes are the
  *              cache q129 should hit)
  *   q129-1   — first q129 landing (the driver-sample condition)
  *   q129-2   — warm rerun (pure data cost, zero-compile ideal)
  *   q132-1   — the full gate, landing after q129 as in the suite
  *
  * Codegen knobs mirror Bench: useIdInClassName=false + cache 2000.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileQ129
  */
object ProfileQ129 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.useIdInClassName", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def cg: Long = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount
    def jit: Long = Option(
      java.lang.management.ManagementFactory.getCompilationMXBean)
      .map(_.getTotalCompilationTime).getOrElse(0L)
    def phase(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); val c0 = cg; val j0 = jit
      body
      println(f"[q129] $tag%-8s wall=${(System.nanoTime() - t0) / 1e9}%6.2f" +
        f" cg=${cg - c0}%3d jit_ms=${jit - j0}")
    }
    def run(q: String): Unit =
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    phase("index") { SparkEntry.buildIndexes(spark, dir) }
    phase("siblings") {
      Seq("q110_embed_incremental", "q122_semantic_inc_2l",
        "q125_dsir_incremental", "q128_landed_containment",
        "q131_ppl_incremental", "q99_lsh_incremental").foreach(run)
    }
    System.gc()
    phase("q129-1") { run("q129_ingest_gate") }
    System.gc()
    phase("q129-2") { run("q129_ingest_gate") }
    System.gc()
    phase("q132-1") { run("q132_ingest_gate_full") }
    spark.stop()
  }
}
