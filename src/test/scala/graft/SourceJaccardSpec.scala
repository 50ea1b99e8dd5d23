package graft

import graft.dedup.Dedup

/** KMV cross-source Jaccard: hand-computable shingle sets, exact-twin
  * agreement, and the merge property (bottom-k of unioned partials ==
  * bottom-k of the one-shot set — the mergeability contract the q151
  * oracle hash-proves at corpus scale). */
class SourceJaccardSpec extends SparkSpec {
  import spark.implicits._

  // srcA = {"a b c", "b c d"}; srcB = {"a b c", "b c e"}:
  // inter = 1, union = 3 → exact jaccard 1/3
  private def docs = Seq(
    (1L, "a b c d", "srcA"),
    (2L, "a b c", "srcA"),
    (3L, "a b c e", "srcB"))
    .toDF("doc_id", "text", "source")

  test("exact twin and full-universe sketch agree on the hand sets") {
    val rows = Dedup.sourceJaccard(docs, k = 64)
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect()
    assert(rows.length == 1, rows.mkString(","))
    val (a, b, kUsed, interK, estE6, interEx, unionEx, exE6) = rows.head
    assert(a == "srcA" && b == "srcB")
    // k > universe: the sketch IS the set, estimate == exact
    assert(kUsed == 3L && interK == 1L && estE6 == 333333L,
      rows.head.toString)
    assert(interEx == 1L && unionEx == 3L && exE6 == 333333L,
      rows.head.toString)
  }

  test("merged doc-slice partials replay the one-shot report exactly") {
    val oneShot = Dedup.sourceJaccard(docs, k = 2).collect().toSeq
    val pa = Dedup.sourceKmvPartials(docs.filter($"doc_id" === 1L), k = 2)
    val pb = Dedup.sourceKmvPartials(docs.filter($"doc_id" =!= 1L), k = 2)
    val merged = Dedup.sourceJaccardReport(pa.unionByName(pb), docs, k = 2)
      .collect().toSeq
    assert(merged == oneShot, s"merged=$merged oneShot=$oneShot")
  }

  test("k truncation keeps the k smallest union values") {
    // k = 1: merged sketch per source is its single smallest hash;
    // the pair report ranks the union's single smallest value
    val got = Dedup.sourceJaccard(docs, k = 1)
      .select("k_used").as[Long].collect()
    assert(got.toSeq == Seq(1L), got.mkString(","))
  }
}
