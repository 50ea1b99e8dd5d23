package graft

import graft.dedup.Dedup
import graft.sources.IndexStore
import graft.util.CacheRegistry
import org.apache.spark.sql.functions._

/** Cross-session index persistence: a landed index built in one
  * "session" (registry generation), saved, and restored must (1) be
  * served parquet-backed — no rebuild of the landed computation — to
  * a consumer constructing the same landed frame, and (2) produce
  * verdicts identical to a fresh build; (3) a CHANGED landed corpus
  * must MISS the restored entry (the semantic-hash key is the
  * staleness guard). */
class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def landed = graft.sources.Tables.load(spark, dir, "documents")
    .filter(pmod(col("doc_id"), lit(5L)) =!= 2)
  private def batch = graft.sources.Tables.load(spark, dir, "documents")
    .filter(pmod(col("doc_id"), lit(5L)) === 2)

  // the file-scan roots of a frame's analyzed plan (DataFrame
  // .inputFiles reads empty for these relations on this Spark build)
  private def scanRoots(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.analyzed.collectLeaves().flatMap {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
      case _ => Seq.empty
    }

  test("save/restore round-trips the landed index; same key hits, changed corpus misses") {
    val out = java.nio.file.Files.createTempDirectory("graft-idx").toString
    CacheRegistry.releaseAll()
    // "session 1": build + persist
    Dedup.landedFingerprints(landed).count()
    Dedup.landedShingleSet(landed).count()
    val fresh = Dedup.landedContainmentScreen(landed, batch)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(IndexStore.saveAll(out) >= 2)
    // "session 2": cold registry, restore from disk
    CacheRegistry.releaseAll()
    assert(IndexStore.restoreAll(spark, out) >= 2)
    val served = Dedup.landedShingleSet(landed)
    // the restored entry is parquet-backed from the index dir — the
    // landed shingling was NOT rebuilt
    assert(scanRoots(served).exists(_.contains(out)),
      "restored index not served from the persisted parquet")
    val replayed = Dedup.landedContainmentScreen(landed, batch)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(replayed == fresh, "restored-index verdicts diverge")
    // a changed landed corpus computes a different semantic key and
    // must fall through to a fresh build, never the stale index
    val changed = Dedup.landedShingleSet(
      landed.filter(col("doc_id") =!= 0L))
    assert(!scanRoots(changed).exists(_.contains(out)),
      "stale index served for a changed landed corpus")
    CacheRegistry.releaseAll()
  }

  test("absorbed landed2 artifacts persist and restore like built ones") {
    import graft.similarity.Similarity
    val base = java.nio.file.Files.createTempDirectory("graft-absorb").toString
    val out = s"$base/store"
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
    val d0 = docs.filter(pmod(col("doc_id"), lit(5L)).isin(0L, 1L, 3L))
    val e0 = emb.filter(pmod(col("vec_id"), lit(5L)).isin(0L, 1L, 3L))
    // durable absorb: the admitted batch is APPENDED to the landed
    // store first (parquet), and the grown landed frames read the
    // post-append files — a file-backed plan whose fingerprint any
    // later session reproduces (an in-memory checkpoint leaf's cannot
    // be; see absorbBatch's durability note)
    // off EVERY frozen codebook stride: since round 18 the absorb
    // family also appends to the IVF-PQ serving kinds, whose codeword
    // stride (% 25 == 7) intersects the %5 == 2 slice
    docs.filter(pmod(col("doc_id"), lit(5L)) === 2 &&
        pmod(col("doc_id"), lit(25L)) =!= 7 &&
        pmod(col("doc_id"), lit(50L)) =!= 11)
      .write.mode("overwrite").parquet(s"$base/adm_docs")
    emb.filter(pmod(col("vec_id"), lit(5L)) === 2 &&
        pmod(col("vec_id"), lit(25L)) =!= 7 &&
        pmod(col("vec_id"), lit(50L)) =!= 11)
      .write.mode("overwrite").parquet(s"$base/adm_emb")
    def admDocs = spark.read.parquet(s"$base/adm_docs")
    def admEmb = spark.read.parquet(s"$base/adm_emb")
    def landed2d = d0.unionByName(admDocs)
    def landed2e = e0.unionByName(admEmb)
    val b2 = docs.filter(pmod(col("doc_id"), lit(5L)) === 4)
    val be2 = emb.filter(pmod(col("vec_id"), lit(5L)) === 4)
    CacheRegistry.releaseAll()
    // "session 1": absorb, gate, persist the registry (absorbed seeds
    // included — they are ordinary entries)
    Dedup.absorbBatch(d0, admDocs, e0, admEmb, landed2d, landed2e, "src0")
    val expect = Dedup.ingestGate(landed2d, b2, landed2e, be2, "src0")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(IndexStore.saveAll(out) >= 8)
    // "session 2": cold registry, restore; the absorbed fp set must be
    // served from the store, and the gate must replay identically
    CacheRegistry.releaseAll()
    assert(IndexStore.restoreAll(spark, out) >= 8)
    val served = Dedup.landedFingerprints(landed2d)
    assert(scanRoots(served).exists(_.contains(out)),
      "absorbed landed-fp not served from the persisted parquet")
    val served2 = Similarity.landedSemanticAssignment2L(landed2e, 25, 8, 5)
    assert(scanRoots(served2).exists(_.contains(out)),
      "absorbed sem-assign-2l not served from the persisted parquet")
    val replayed = Dedup.ingestGate(landed2d, b2, landed2e, be2, "src0")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(replayed == expect, "restored absorbed-index verdicts diverge")
    CacheRegistry.releaseAll()
  }
}
