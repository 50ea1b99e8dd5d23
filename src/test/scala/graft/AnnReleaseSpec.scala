package graft

import graft.similarity.Similarity
import graft.sources.IndexStore
import graft.util.CacheRegistry
import org.apache.spark.sql.functions._

/** The ANN release lifecycle (q193): rebuild codebooks from the grown
  * corpus, publish as an atomic release (artifacts first, pin last),
  * serve through the pin — and the three properties a production
  * lifecycle needs: (1) serving an unpublished release FAILS LOUDLY
  * (the swap-order contract, not a silent fallback to stale
  * codebooks); (2) the pin + artifacts survive an IndexStore
  * save/restore and serve identical answers; (3) serving CONTINUITY —
  * the rebuilt release's answer quality (recall@5 vs the exact scan)
  * does not collapse relative to the pre-rebuild serving. */
class AnnReleaseSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = graft.sources.Tables.load(spark, dir, "embeddings")
  private def queries = emb.filter(pmod(col("vec_id"), lit(100)) === 0)

  private def topSets(rows: Seq[(Long, Long, Long)]): Map[Long, Set[Long]] =
    rows.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).toSet }

  private def meanRecall(got: Map[Long, Set[Long]],
      ideal: Map[Long, Set[Long]]): Double = {
    val per = ideal.toSeq.map { case (q, ids) =>
      got.getOrElse(q, Set.empty).intersect(ids).size.toDouble / ids.size }
    per.sum / per.size
  }

  test("unpublished release fails loudly; publish-then-serve works; continuity holds") {
    CacheRegistry.releaseAll()
    intercept[IllegalStateException] {
      Similarity.ivfPqTopKReleased(emb, queries, 5, "never-published")
    }
    // BEFORE: landed-drawn codebooks serving the grown corpus (q158)
    val landed = emb.filter(pmod(col("vec_id"), lit(4L)) =!= 2)
    val batch = emb.filter(pmod(col("vec_id"), lit(4L)) === 2)
    val before = topSets(Similarity.ivfPqIncrement(landed, batch, queries, 5)
      .select("q_id", "rank", "vec_id")
      .as[(Long, Long, Long)].collect().toSeq)
    // REBUILD + SWAP, then AFTER: the released full-corpus codebooks
    Similarity.rebuildIvfPqRelease(emb, "spec-r1")
    val after = topSets(Similarity.ivfPqTopKReleased(emb, queries, 5, "spec-r1")
      .select("q_id", "rank", "vec_id")
      .as[(Long, Long, Long)].collect().toSeq)
    val ideal = topSets(Similarity.bruteForceTopK(emb, queries, 5)
      .select("q_id", "rank", "vec_id")
      .as[(Long, Long, Long)].collect().toSeq)
    assert(after.keySet == ideal.keySet, "after-serving lost queries")
    val rBefore = meanRecall(before, ideal)
    val rAfter = meanRecall(after, ideal)
    // continuity: the rebuild must not collapse answer quality — the
    // rebuilt codebooks cover the grown corpus, so recall@5 vs the
    // exact scan stays within one shortlist slot of the old serving
    assert(rAfter >= rBefore - 0.2,
      s"rebuild collapsed serving quality: recall $rBefore -> $rAfter")
    CacheRegistry.releaseAll()
  }

  test("releases are immutable: identical re-publish is a no-op, changed parameters fail loudly") {
    CacheRegistry.releaseAll()
    Similarity.rebuildIvfPqRelease(emb, "spec-imm")
    // crash-retry shape: identical parameters re-publish silently
    Similarity.rebuildIvfPqRelease(emb, "spec-imm")
    // a DIFFERENT codebook under the same name would silently keep
    // serving the old one — must throw instead (review finding)
    intercept[IllegalArgumentException] {
      Similarity.rebuildIvfPqRelease(emb, "spec-imm", ivfOffset = 13)
    }
    CacheRegistry.releaseAll()
  }

  test("release pin + artifacts round-trip the IndexStore; restored release serves identically") {
    val out = java.nio.file.Files.createTempDirectory("graft-ann-rel").toString
    CacheRegistry.releaseAll()
    // "session 1": rebuild, publish, serve, save — materialize the
    // release artifacts so the store has something to persist
    Similarity.rebuildIvfPqRelease(emb, "spec-r2")
    Similarity.landedIvfPqAssignment(emb).count()
    Similarity.landedIvfPqCodes(emb).count()
    val fresh = Similarity.ivfPqTopKReleased(emb, queries, 5, "spec-r2")
      .orderBy("q_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(IndexStore.saveAll(out) >= 3,
      "expected asn + codes + pin to persist")
    // "session 2": cold registry, restore, serve through the pin
    CacheRegistry.releaseAll()
    assert(IndexStore.restoreAll(spark, out) >= 3)
    val served = Similarity.ivfPqTopKReleased(emb, queries, 5, "spec-r2")
      .orderBy("q_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(served == fresh, "restored release serves different answers")
    CacheRegistry.releaseAll()
  }

  test("drift policy: untripped keeps the frozen path and publishes nothing; tripped rebuilds and serves the release") {
    CacheRegistry.releaseAll()
    val landed = emb.filter(pmod(col("vec_id"), lit(4L)) =!= 2)
    val batch = emb.filter(pmod(col("vec_id"), lit(4L)) === 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("q_id", "rnk")
        .as[(String, Option[Long], Long, Long, Long, Double)]
        .collect().toSeq
    // KEEP: a threshold no finite drift exceeds
    val keep = rows(Similarity.driftRebuildPolicy(landed, batch, emb,
      queries, "policy-keep", maxDriftPpm = Long.MaxValue))
    assert(keep.nonEmpty && keep.forall(_._1 == "keep"))
    assert(!CacheRegistry.entries.keys.exists(k =>
        k.startsWith("ann-release:") && k.contains(":policy-keep:")),
      "untripped policy must publish nothing")
    val frozen = Similarity.ivfPqIncrement(landed, batch, queries, 5)
      .orderBy("q_id", "rank").as[(Long, Long, Long, Double)]
      .collect().toSeq
    assert(keep.map(r => (r._3, r._4, r._5, r._6)) == frozen,
      "keep branch must serve exactly the frozen-codebook append path")
    // REBUILD: any positive drift trips
    val reb = rows(Similarity.driftRebuildPolicy(landed, batch, emb,
      queries, "policy-reb", maxDriftPpm = 0L))
    assert(reb.nonEmpty && reb.forall(_._1 == "rebuild"))
    val released = Similarity.ivfPqTopKReleased(emb, queries, 5,
        "policy-reb")
      .orderBy("q_id", "rank").as[(Long, Long, Long, Double)]
      .collect().toSeq
    assert(reb.map(r => (r._3, r._4, r._5, r._6)) == released,
      "rebuild branch must serve exactly the published release")
    // the decision evidence rides in the answer: drift_ppm constant
    // and equal to the q160 measurement's batch row
    val measured = Similarity.codebookDrift(landed, batch)
      .filter(col("grp") === "batch").select("drift_ppm")
      .as[Option[Long]].collect()(0)
    assert(keep.map(_._2).distinct == Seq(measured))
    assert(reb.map(_._2).distinct == Seq(measured))
    // an EMPTY batch is no evidence: keep, NULL drift, nothing published
    val empty = rows(Similarity.driftRebuildPolicy(landed,
      batch.limit(0), emb, queries, "policy-empty", maxDriftPpm = 0L))
    assert(empty.nonEmpty && empty.forall(r =>
      r._1 == "keep" && r._2.isEmpty))
    assert(!CacheRegistry.entries.keys.exists(_.contains(":policy-empty:")))
    CacheRegistry.releaseAll()
  }
}
