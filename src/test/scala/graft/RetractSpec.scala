package graft

import org.apache.spark.sql.functions._
import graft.curation.Curation
import graft.similarity.Similarity
import graft.util.CacheRegistry

/** The retract family (q199) — the right-to-be-forgotten inverse of
  * absorb: deleting a set of documents from every landed artifact must
  * equal the one-shot rebuild over (landed ∖ deleted). The q199 oracle
  * proves it for the gate-read kinds; this spec pins the RETRIEVAL
  * kinds the gate cannot see, the frozen-codebook refusals in reverse
  * (deleting a centroid/codeword is a rebuild), the shared-evidence
  * edge the naive anti-join gets wrong (a fingerprint/shingle held by
  * BOTH a kept and a deleted doc must survive), and the never-landed
  * no-op. */
class RetractSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.sources.Tables.load(spark, dir, "documents")
  private def emb = graft.sources.Tables.load(spark, dir, "embeddings")

  // delete residues off every codebook stride (mod 25 ∉ {7, 8},
  // mod 50 ≠ 11)
  private val delRes = Seq(14L, 39L)
  private def delIds = docs.filter(pmod(col("doc_id"), lit(100L))
    .isin(delRes: _*)).select("doc_id")
  private def keptD = docs.join(delIds, Seq("doc_id"), "left_anti")
  private def keptE = emb.join(delIds.select(col("doc_id").as("vec_id")),
    Seq("vec_id"), "left_anti")

  test("retractBm25: decremented index ≡ one-shot bm25Stats over the kept corpus") {
    CacheRegistry.releaseAll()
    val kept = keptD
    Curation.retractBm25(docs, delIds, kept)
    val retracted = Curation.bm25Stats(kept)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    CacheRegistry.releaseAll()
    val oneShot = Curation.bm25Stats(kept)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(retracted.nonEmpty)
    assert(retracted == oneShot,
      s"retracted ≠ one-shot: ${retracted.diff(oneShot).take(3)} / " +
        s"${oneShot.diff(retracted).take(3)}")
    CacheRegistry.releaseAll()
  }

  test("retractIvfPq: anti-joined routing + codes ≡ one-shot over the kept corpus") {
    CacheRegistry.releaseAll()
    val kept = keptE
    val del = delIds.select(col("doc_id").as("vec_id"))
    Similarity.retractIvfPq(emb, del, kept)
    val rAsn = Similarity.landedIvfPqAssignment(kept)
      .as[(Long, Long)].collect().toSet
    val rCodes = Similarity.landedIvfPqCodes(kept)
      .as[(Long, Int, Long)].collect().toSet
    CacheRegistry.releaseAll()
    assert(rAsn == Similarity.landedIvfPqAssignment(kept)
      .as[(Long, Long)].collect().toSet)
    assert(rCodes == Similarity.landedIvfPqCodes(kept)
      .as[(Long, Int, Long)].collect().toSet)
    CacheRegistry.releaseAll()
  }

  test("deleting a codebook-stride id refuses on every stride family, seeds nothing") {
    CacheRegistry.releaseAll()
    // 57 % 25 == 7 (PQ codeword + sem2l default fine stride), 111 % 50
    // == 11 (coarse IVF), 33 % 25 == 8 (the gate's sem2l offset)
    for (bad <- Seq(57L, 111L)) {
      val del = Seq(bad).toDF("vec_id")
      val kept = emb.join(del, Seq("vec_id"), "left_anti")
      val before = CacheRegistry.size
      intercept[Similarity.CodebookStrideRefusal] {
        Similarity.retractIvfPq(emb, del, kept)
      }
      assert(CacheRegistry.size == before)
    }
    val del8 = Seq(33L).toDF("vec_id")
    intercept[Similarity.CodebookStrideRefusal] {
      Similarity.retractSemantic2L(emb, del8,
        emb.join(del8, Seq("vec_id"), "left_anti"), fineOffset = 8)
    }
    CacheRegistry.releaseAll()
  }

  test("shared evidence survives: a fingerprint held by kept AND deleted docs stays") {
    CacheRegistry.releaseAll()
    // synthetic: docs 1 and 2 share a body; 3 is unique; delete 2 and 3
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa"),
      (4L, "lambda mu nu xi omicron")).toDF("doc_id", "text")
    val del = Seq(2L, 3L).toDF("doc_id")
    val kept = d.join(del, Seq("doc_id"), "left_anti")
    graft.dedup.Dedup.retractTextIndexes(d, del, kept)
    val fps = graft.dedup.Dedup.landedFingerprints(kept)
      .as[String].collect().toSet
    CacheRegistry.releaseAll()
    val oneShot = graft.dedup.Dedup.landedFingerprints(kept)
      .as[String].collect().toSet
    assert(fps == oneShot)
    assert(fps.size == 2, s"doc 1's fp must survive doc 2's deletion: $fps")
    CacheRegistry.releaseAll()
  }

  test("hybrid serve over retracted kinds ≡ fresh rebuild over the kept corpus; never-landed delete is a no-op") {
    CacheRegistry.releaseAll()
    val kd = keptD
    val ke = keptE
    graft.dedup.Dedup.retractBatch(docs, delIds, emb, kd, ke, "src0")
    val served = Curation.hybridRrfTopKServed(kd, ke)
      .orderBy("q_id", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    CacheRegistry.releaseAll()
    val rebuilt = Curation.hybridRrfTopKServed(kd, ke)
      .orderBy("q_id", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(served.nonEmpty && served == rebuilt)
    CacheRegistry.releaseAll()
    // never-landed ids: retraction degenerates to identity on every kind
    val ghost = Seq(999999989L).toDF("doc_id")
    val kd2 = docs.join(ghost, Seq("doc_id"), "left_anti")
    Curation.retractBm25(docs, ghost, kd2)
    val viaGhost = Curation.bm25Stats(kd2)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    CacheRegistry.releaseAll()
    val direct = Curation.bm25Stats(docs)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(viaGhost == direct, "ghost delete changed the index")
    CacheRegistry.releaseAll()
  }

  test("retentionAgeOut: tripped age-out ≡ explicit-id retract of the derived expired set; huge horizon keeps everything") {
    CacheRegistry.releaseAll()
    // the q213 fixture: src14's landed ids are off every codebook
    // stride (14 mod 20 never hits 7/8 mod 25 or 11 mod 50)
    val (action, span, keptPolD, keptPolE) = graft.dedup.Dedup
      .retentionAgeOut(docs, emb, "src14", horizonIds = 200L, "src0")
    assert(action == "retract", s"fixture must trip, got $action")
    assert(span > 200L)
    // the equivalence target: the explicit-id retract of the SAME set
    val cutoff = docs.filter(col("source") === "src14")
      .agg(max("doc_id")).as[Long].collect()(0) - 200L
    val expIds = docs
      .filter(col("source") === "src14" && col("doc_id") < cutoff)
      .select("doc_id")
    assert(expIds.count() > 0, "expired set empty — vacuous fixture")
    val keptIds = keptPolD.select("doc_id").as[Long].collect().toSet
    val expectedKept = docs.join(expIds, Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(keptIds == expectedKept,
      "policy kept set ≠ explicit-id anti-join of the derived set")
    // the seeded kinds equal an explicit retractBatch's over the same
    // frames: compare the policy-seeded bm25 index against the
    // one-shot build over the kept corpus (the retract ≡ rebuild
    // statement, via the policy path)
    val viaPolicy = Curation.bm25Stats(keptPolD)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    CacheRegistry.releaseAll()
    val oneShot = Curation.bm25Stats(keptPolD)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(viaPolicy == oneShot,
      s"policy-retracted index ≠ one-shot: ${viaPolicy.diff(oneShot).take(3)}")
    // untripped: a horizon wider than the span keeps the corpus frames
    // verbatim and retracts nothing
    CacheRegistry.releaseAll()
    val before = CacheRegistry.size
    val (d0, e0) = (docs, emb)
    val (a2, s2, kd2, ke2) = graft.dedup.Dedup
      .retentionAgeOut(d0, e0, "src14", horizonIds = 1000000L, "src0")
    assert(a2 == "keep" && s2 == span)
    assert(kd2 eq d0, "untripped must return the landed frame itself")
    assert(ke2 eq e0)
    assert(CacheRegistry.size == before, "untripped must seed nothing")
    CacheRegistry.releaseAll()
  }
}
