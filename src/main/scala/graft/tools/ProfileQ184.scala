package graft.tools

import graft.SparkEntry
import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q184 absorb-bill profiler (the r18 verdict's task #2 measurement):
  * where does the post-q196 q184 landing (≥13.4 s) go? Phases:
  *
  *   index    — SparkEntry.buildIndexes (the suite's untimed context;
  *              pre-pays the landed family + q196 retrieval kinds)
  *   stage1   — gate batch 1 + localCheckpoint of the admit ids
  *   sem2l    — absorbSemantic2L (eager stride probe + 3 seeds)
  *   ivfpq    — absorbIvfPq (eager stride probe + probeDim + 2 seeds)
  *   text     — absorbTextIndexes (4 seeds, no probe)
  *   bm25     — absorbBm25 (1 seed, no probe)
  *   dsir     — absorbDsir (3 seeds, no probe)
  *   gate2    — the stage-2 gate over the grown corpus (noop write —
  *              this is where the lazy seeds actually materialize)
  *   q184-2   — warm full rerun through the registry entry
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileQ184
  */
object ProfileQ184 {
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
      println(f"[q184] $tag%-8s wall=${(System.nanoTime() - t0) / 1e9}%6.2f" +
        f" cg=${cg - c0}%3d jit_ms=${jit - j0}")
    }
    phase("index") { SparkEntry.buildIndexes(spark, dir) }
    System.gc()
    // the q184 body, phase-instrumented (mirrors DedupRegistry's entry)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val d0 = docs.filter(!pmod(col("doc_id"), lit(100L))
      .isin(2L, 22L, 47L, 67L, 12L, 37L, 62L, 87L))
    val b1 = docs.filter(pmod(col("doc_id"), lit(100L))
      .isin(2L, 22L, 47L, 67L))
    val b2 = docs.filter(pmod(col("doc_id"), lit(100L))
      .isin(12L, 37L, 62L, 87L))
    val e0 = emb.filter(!pmod(col("vec_id"), lit(100L))
      .isin(2L, 22L, 47L, 67L, 12L, 37L, 62L, 87L))
    val be1 = emb.filter(pmod(col("vec_id"), lit(100L))
      .isin(2L, 22L, 47L, 67L))
    val be2 = emb.filter(pmod(col("vec_id"), lit(100L))
      .isin(12L, 37L, 62L, 87L))
    var admDocs: org.apache.spark.sql.DataFrame = null
    var admEmb: org.apache.spark.sql.DataFrame = null
    var landed2d: org.apache.spark.sql.DataFrame = null
    var landed2e: org.apache.spark.sql.DataFrame = null
    phase("stage1") {
      val adm = Dedup.ingestGate(d0, b1, e0, be1, "src0", keepBp = 5000)
        .filter(col("gate") === "admit").select("doc_id")
        .localCheckpoint(true)
      admDocs = b1.join(adm, Seq("doc_id"))
      admEmb = be1.join(adm.select(col("doc_id").as("vec_id")), Seq("vec_id"))
      landed2d = d0.unionByName(admDocs)
      landed2e = e0.unionByName(admEmb)
    }
    phase("sem2l") {
      graft.similarity.Similarity.absorbSemantic2L(e0, admEmb, landed2e,
        fineStride = 25, fineOffset = 8, coarseFactor = 5)
    }
    phase("ivfpq") {
      graft.similarity.Similarity.absorbIvfPq(e0, admEmb, landed2e)
    }
    phase("text") { Dedup.absorbTextIndexes(d0, admDocs, landed2d) }
    phase("bm25") {
      graft.curation.Curation.absorbBm25(d0, admDocs, landed2d)
    }
    phase("dsir") {
      graft.curation.Curation.absorbDsir(d0, admDocs, landed2d, "src0",
        keepBp = 5000)
    }
    phase("gate2") {
      Dedup.ingestGate(landed2d, b2, landed2e, be2, "src0", keepBp = 5000)
        .orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    System.gc()
    phase("q184-2") {
      SparkEntry.queries("q184_absorb_gate")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
