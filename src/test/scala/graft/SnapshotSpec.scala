package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.util.CacheRegistry

/** The snapshot reconciliation pair (q204/q205) — [[Dedup.snapshotDiff]]
  * derives the CDC change set from two authoritative snapshots (the
  * inverse direction of q201's attachChurn, which CONSUMES one), and
  * [[Dedup.migrateToSnapshot]] applies a derived diff through retract +
  * absorb-by-fiat so the landed artifacts match the new snapshot. The
  * q205 oracle proves migrate ≡ rebuild for the adds+deletes case; this
  * spec pins what the oracle cannot: the UPDATE path (fingerprint
  * change ⇒ delete+add decomposition, including its stride refusal),
  * the diff's null-safe fingerprint classification, and the no-change
  * no-op. */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.sources.Tables.load(spark, dir, "documents")
  private def emb = graft.sources.Tables.load(spark, dir, "embeddings")

  test("snapshotDiff: presence → add/delete, null-safe fingerprint compare → update; unchanged emits nothing") {
    val oldD = Seq[(Long, String)](
      (1L, null), // null body both sides → unchanged
      (2L, "alpha beta"), // body changes → update
      (3L, "delete me"), // only in old → delete
      (5L, null), // null → body: update
      (6L, "Same,  text!"), // re-rendered but same normalized fp → unchanged
      (7L, "stays")) // unchanged
      .toDF("doc_id", "text")
    val newD = Seq[(Long, String)](
      (1L, null),
      (2L, "alpha gamma"),
      (4L, "brand new"), // only in new → add
      (5L, "now a body"),
      (6L, "same text"),
      (7L, "stays"))
      .toDF("doc_id", "text")
    val diff = Dedup.snapshotDiff(oldD, newD)
      .select("doc_id", "op").as[(Long, String)].collect().toMap
    assert(diff == Map(2L -> "update", 3L -> "delete", 4L -> "add",
      5L -> "update"))
  }

  test("migrate with UPDATES ≡ fresh rebuild over the new snapshot (gate verdicts equal)") {
    CacheRegistry.releaseAll()
    // old = corpus minus adds {5,30,55,80} and holdout {9,59};
    // new = corpus minus deletes {21,71} and holdout, with a text
    // revision planted on residue {44} — an UPDATE the oracle row
    // (adds+deletes only) cannot carry
    val oldRes = Seq(5L, 30L, 55L, 80L, 9L, 59L)
    val newRes = Seq(21L, 71L, 9L, 59L)
    def revised(d: org.apache.spark.sql.DataFrame) = d.withColumn("text",
      when(pmod(col("doc_id"), lit(100L)) === 44L,
        concat(col("text"), lit(" rev2"))).otherwise(col("text")))
    val oD = docs.filter(!pmod(col("doc_id"), lit(100L)).isin(oldRes: _*))
    val oE = emb.filter(!pmod(col("vec_id"), lit(100L)).isin(oldRes: _*))
    val nD = revised(
      docs.filter(!pmod(col("doc_id"), lit(100L)).isin(newRes: _*)))
    val nE = emb.filter(!pmod(col("vec_id"), lit(100L)).isin(newRes: _*))
    val probe = docs.filter(pmod(col("doc_id"), lit(100L)).isin(9L, 59L))
    val probeE = emb.filter(pmod(col("vec_id"), lit(100L)).isin(9L, 59L))

    // the diff must carry the revision as an update
    val ops = Dedup.snapshotDiff(oD, nD).select("doc_id", "op")
      .as[(Long, String)].collect()
    assert(ops.exists { case (id, op) => id % 100 == 44 && op == "update" })
    assert(ops.forall { case (id, op) => op match {
      case "add" => Seq(5L, 30L, 55L, 80L).contains(id % 100)
      case "delete" => Seq(21L, 71L).contains(id % 100)
      case "update" => id % 100 == 44
      case _ => false
    }})

    val (migD, migE) = Dedup.migrateToSnapshot(oD, oE, nD, nE, "src0",
      keepBp = 5000)
    val migrated = Dedup.ingestGate(migD, probe, migE, probeE, "src0",
      keepBp = 5000).as[(Long, String)].collect().toSet
    CacheRegistry.releaseAll()
    val rebuilt = Dedup.ingestGate(nD, probe, nE, probeE, "src0",
      keepBp = 5000).as[(Long, String)].collect().toSet
    assert(migrated.nonEmpty)
    assert(migrated == rebuilt,
      s"migrate ≠ rebuild: ${migrated.diff(rebuilt).take(3)} / " +
        s"${rebuilt.diff(migrated).take(3)}")
    CacheRegistry.releaseAll()
  }

  test("serve through migrated kinds with UPDATES ≡ fresh serve over the new snapshot") {
    CacheRegistry.releaseAll()
    // same fixture as the migrate-with-updates test: the {44} text
    // revision reaches the BM25 kinds through retract+absorb, so the
    // served lexical side must reflect the NEW body — the serve-path
    // statement the q206 oracle (adds+deletes only) cannot carry
    val oldRes = Seq(5L, 30L, 55L, 80L, 9L, 59L)
    val newRes = Seq(21L, 71L, 9L, 59L)
    def revised(d: org.apache.spark.sql.DataFrame) = d.withColumn("text",
      when(pmod(col("doc_id"), lit(100L)) === 44L,
        concat(col("text"), lit(" rev2"))).otherwise(col("text")))
    val oD = docs.filter(!pmod(col("doc_id"), lit(100L)).isin(oldRes: _*))
    val oE = emb.filter(!pmod(col("vec_id"), lit(100L)).isin(oldRes: _*))
    val nD = revised(
      docs.filter(!pmod(col("doc_id"), lit(100L)).isin(newRes: _*)))
    val nE = emb.filter(!pmod(col("vec_id"), lit(100L)).isin(newRes: _*))
    val (migD, migE) = Dedup.migrateToSnapshot(oD, oE, nD, nE, "src0",
      keepBp = 5000)
    val served = graft.curation.Curation.hybridRrfTopKServed(migD, migE)
      .as[(Long, Long, Long, Long)].collect().toSet
    CacheRegistry.releaseAll()
    val fresh = graft.curation.Curation.hybridRrfTopKServed(nD, nE)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(served.nonEmpty)
    assert(served == fresh,
      s"migrated serve ≠ fresh serve: ${served.diff(fresh).take(3)} / " +
        s"${fresh.diff(served).take(3)}")
    CacheRegistry.releaseAll()
  }

  test("an update on a codebook-stride id refuses loudly (mutating a codebook member is a rebuild)") {
    CacheRegistry.releaseAll()
    // 33 % 25 == 8: a member of the gate-family sem2l codebook. An
    // update decomposes to delete+add, and the delete side's
    // retractSemantic2L refuses the stride id before anything seeds.
    val oD = docs.filter(col("doc_id") < 200)
    val oE = emb.filter(col("vec_id") < 200)
    val nD = oD.withColumn("text",
      when(col("doc_id") === 33L, lit("rewritten body"))
        .otherwise(col("text")))
    val before = CacheRegistry.size
    intercept[Similarity.CodebookStrideRefusal] {
      Dedup.migrateToSnapshot(oD, oE, nD, oE, "src0", keepBp = 5000)
    }
    assert(CacheRegistry.size == before)
    CacheRegistry.releaseAll()
  }

  test("no-change migration is a no-op: empty diff, gate equals the one-shot") {
    CacheRegistry.releaseAll()
    val oD = docs.filter(pmod(col("doc_id"), lit(7L)) === 1)
    val oE = emb.filter(pmod(col("vec_id"), lit(7L)) === 1)
    assert(Dedup.snapshotDiff(oD, oD).isEmpty)
    val (migD, migE) = Dedup.migrateToSnapshot(oD, oE, oD, oE, "src0",
      keepBp = 5000)
    val probe = docs.filter(pmod(col("doc_id"), lit(7L)) === 3)
    val probeE = emb.filter(pmod(col("vec_id"), lit(7L)) === 3)
    val viaMigrate = Dedup.ingestGate(migD, probe, migE, probeE, "src0",
      keepBp = 5000).as[(Long, String)].collect().toSet
    CacheRegistry.releaseAll()
    val oneShot = Dedup.ingestGate(oD, probe, oE, probeE, "src0",
      keepBp = 5000).as[(Long, String)].collect().toSet
    assert(viaMigrate == oneShot)
    CacheRegistry.releaseAll()
  }
}
