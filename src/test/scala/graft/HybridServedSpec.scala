package graft

import org.apache.spark.sql.functions._

/** The served hybrid-retrieval face (q192): BM25 over the memoized
  * lexical index fused with IVF-PQ over the memoized ANN index. The
  * load-bearing property is RANK COMPATIBILITY with the brute-force
  * face — at exhaustive probe/rerank parameters the served semantic
  * side degenerates to the exact scan (same 4-decimal rounding, same
  * id tie-break, same self-exclusion), so the fused outputs must be
  * IDENTICAL, not merely close. */
class HybridServedSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def docs = graft.sources.Tables.load(spark, dir, "documents")
  private def emb = graft.sources.Tables.load(spark, dir, "embeddings")

  test("served hybrid ≡ brute-force hybrid at exhaustive nprobe/rerank") {
    graft.util.CacheRegistry.releaseAll()
    // nprobe ≥ cell count (sid % 50 == 11 → ~10 cells at sf0.001) and
    // shortlist depth·rerankFactor ≥ corpus: every non-self candidate
    // reaches the exact rerank, so ranks collapse to bruteForceTopK's
    val served = graft.curation.Curation.hybridRrfTopKServed(
        docs, emb, nprobe = 1000, rerankFactor = 1000)
      .orderBy("q_id", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val brute = graft.curation.Curation.hybridRrfTopK(docs, emb)
      .orderBy("q_id", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(served.nonEmpty, "no fused rows")
    assert(served == brute,
      s"exhaustive served ≠ brute: ${served.diff(brute)} / ${brute.diff(served)}")
    graft.util.CacheRegistry.releaseAll()
  }

  test("served hybrid at production params: k rows per query, both systems fuse") {
    graft.util.CacheRegistry.releaseAll()
    val out = graft.curation.Curation.hybridRrfTopKServed(docs, emb)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val byQ = out.groupBy(_._1)
    val nq = emb.filter(pmod(col("vec_id"), lit(100L)) === 0).count()
    assert(byQ.size == nq, s"queries: ${byQ.size} != $nq")
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted == (1L to rows.size.toLong),
        s"query $q ranks not contiguous: ${rows.map(_._2).sorted}")
      assert(rows.size <= 5, s"query $q has ${rows.size} rows")
      // a fused score must be at least one system's worst vote and at
      // most both systems' best: 1e9/(60+20) .. 2·1e9/61
      rows.foreach { case (_, _, _, rrf) =>
        assert(rrf >= 1000000000L / 80 && rrf <= 2 * (1000000000L / 61),
          s"query $q rrf $rrf out of band")
      }
    }
    graft.util.CacheRegistry.releaseAll()
  }
}
