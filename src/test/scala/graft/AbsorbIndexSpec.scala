package graft

import org.apache.spark.sql.functions._
import graft.curation.Curation
import graft.similarity.Similarity
import graft.util.CacheRegistry

/** The retrieval cells of the absorb family (round 18): absorbing an
  * admitted batch into the landed BM25 lexical index (absorbBm25) and
  * the landed IVF-PQ serving kinds (absorbIvfPq) must be
  * integer-exact against the one-shot rebuild over landed ∪ admitted
  * — the absorb ≡ rebuild contract every absorb cell carries (the
  * q196 oracle replays the full gate → absorb → serve chain in SQL;
  * this spec pins each cell in isolation plus the frozen-codebook
  * refusal). */
class AbsorbIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.sources.Tables.load(spark, dir, "documents")
  private def emb = graft.sources.Tables.load(spark, dir, "embeddings")

  // q184's stage-1 residues: off BOTH semantic strides (% 25 ∉ {7, 8})
  // and both IVF-PQ strides (% 50 != 11, % 25 != 7)
  private val res = Seq(2L, 22L, 47L, 67L)
  private def landedD = docs.filter(!pmod(col("doc_id"), lit(100L)).isin(res: _*))
  private def batchD = docs.filter(pmod(col("doc_id"), lit(100L)).isin(res: _*))
  private def landedE = emb.filter(!pmod(col("vec_id"), lit(100L)).isin(res: _*))
  private def batchE = emb.filter(pmod(col("vec_id"), lit(100L)).isin(res: _*))

  test("absorbBm25: merged index ≡ one-shot bm25Stats over the union") {
    CacheRegistry.releaseAll()
    val landed2 = landedD.unionByName(batchD)
    Curation.absorbBm25(landedD, batchD, landed2)
    // this call hits the seeded entry — the merged (never re-tokenized
    // landed side) index
    val merged = Curation.bm25Stats(landed2)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    CacheRegistry.releaseAll()
    val oneShot = Curation.bm25Stats(landed2)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(merged.nonEmpty, "empty merged bm25 index")
    assert(merged == oneShot,
      s"merged ≠ one-shot: only-merged=${merged.diff(oneShot).take(3)} " +
        s"only-oneshot=${oneShot.diff(merged).take(3)}")
    CacheRegistry.releaseAll()
  }

  test("absorbIvfPq: merged routing + codes ≡ one-shot over the union") {
    CacheRegistry.releaseAll()
    val landed2 = landedE.unionByName(batchE)
    Similarity.absorbIvfPq(landedE, batchE, landed2)
    val mergedAsn = Similarity.landedIvfPqAssignment(landed2)
      .as[(Long, Long)].collect().toSet
    val mergedCodes = Similarity.landedIvfPqCodes(landed2)
      .as[(Long, Int, Long)].collect().toSet
    CacheRegistry.releaseAll()
    val oneShotAsn = Similarity.landedIvfPqAssignment(landed2)
      .as[(Long, Long)].collect().toSet
    val oneShotCodes = Similarity.landedIvfPqCodes(landed2)
      .as[(Long, Int, Long)].collect().toSet
    assert(mergedAsn.nonEmpty && mergedCodes.nonEmpty)
    assert(mergedAsn == oneShotAsn,
      s"asn drift: ${mergedAsn.diff(oneShotAsn).take(3)} / " +
        s"${oneShotAsn.diff(mergedAsn).take(3)}")
    assert(mergedCodes == oneShotCodes,
      s"codes drift: ${mergedCodes.diff(oneShotCodes).take(3)} / " +
        s"${oneShotCodes.diff(mergedCodes).take(3)}")
    CacheRegistry.releaseAll()
  }

  test("absorbIvfPq refuses codebook-stride ids on BOTH strides, seeds nothing") {
    CacheRegistry.releaseAll()
    // 111 % 50 == 11 (coarse stride), 57 % 25 == 7 (codeword stride)
    for (bad <- Seq(111L, 57L)) {
      val badBatch = emb.limit(1)
        .select(lit(bad).as("vec_id"), col("embedding"))
      val landed2 = landedE.select("vec_id", "embedding")
        .unionByName(badBatch)
      val before = CacheRegistry.size
      intercept[Similarity.CodebookStrideRefusal] {
        Similarity.absorbIvfPq(landedE, badBatch, landed2)
      }
      assert(CacheRegistry.size == before,
        s"refusal for id $bad must not leave grown-corpus seeds behind")
    }
    CacheRegistry.releaseAll()
  }

  test("hybrid serve over absorbed kinds ≡ fresh rebuild over the grown corpus") {
    CacheRegistry.releaseAll()
    val landed2d = landedD.unionByName(batchD)
    val landed2e = landedE.unionByName(batchE)
    // full absorb (every cell, as the operational loop runs it) with
    // the whole batch as the admitted set
    graft.dedup.Dedup.absorbBatch(landedD, batchD, landedE, batchE,
      landed2d, landed2e, "src0")
    val served = Curation.hybridRrfTopKServed(landed2d, landed2e)
      .orderBy("q_id", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    CacheRegistry.releaseAll()
    val rebuilt = Curation.hybridRrfTopKServed(landed2d, landed2e)
      .orderBy("q_id", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(served.nonEmpty, "no fused rows")
    assert(served == rebuilt,
      s"absorbed serve ≠ rebuilt serve: ${served.diff(rebuilt).take(3)} / " +
        s"${rebuilt.diff(served).take(3)}")
    CacheRegistry.releaseAll()
  }
}
