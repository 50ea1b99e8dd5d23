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
}
