package graft

import graft.curation.Bpe

/** BPE merge learning (q113's operator): the iterative
  * most-frequent-adjacent-pair merge loop over the word-frequency
  * dict, with the deterministic (count desc, lhs, rhs) tie-break and
  * the greedy left-to-right merge rewrite. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def hash60(s: String): BigInt = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    BigInt(hex, 16)
  }

  // corpus: see×2, saw×2, sea×1 — merge sequence hand-derivable
  private val docs = Seq((1L, "see saw see"), (2L, "saw sea"))

  test("merge sequence: counts and deterministic lexicographic tie-break") {
    val got = Bpe.bpeMerges(docs.toDF("doc_id", "text"), steps = 3)
      .orderBy("step")
      .select("step", "lhs", "rhs", "pair_count")
      .as[(Int, String, String, Long)].collect().toSeq
    // step 1: (s,e) count 3 beats everything
    // step 2: five pairs tie at 2 — 'a' < 'e' < 's' < 'se' < 'w' picks (a,w)
    // step 3: 'aw' < 'e' < 's' < 'se' picks (aw,</w>)
    assert(got == Seq(
      (1, "s", "e", 3L),
      (2, "a", "w", 2L),
      (3, "aw", "</w>", 2L)))
  }

  test("vocab digest pins the full post-merge segmentation state") {
    val got = Bpe.bpeMerges(docs.toDF("doc_id", "text"), steps = 1)
      .select("vocab_digest").as[Long].head()
    // after merging (s,e): see -> " se e </w> ", sea -> " se a </w> ",
    // saw untouched
    val expected = (hash60("see|2| se e </w> ") +
      hash60("saw|2| s a w </w> ") +
      hash60("sea|1| se a </w> ")) mod BigInt(1000000007)
    assert(got == expected.toLong)
  }

  test("merge rewrite is greedy left-to-right on repeated symbols") {
    // "aaa" alone: step 1 merges (a,a) — adjacent occurrences count
    // per-position ((1,2) and (2,3) -> pair_count 2) and the rewrite is
    // greedy LEFT-to-right: " a a a </w> " -> " aa a </w> ", never
    // " a aa </w> ". The digest pins the post-merge segmentation, which
    // differs between the two rewrites.
    val got = Bpe.bpeMerges(Seq((1L, "aaa")).toDF("doc_id", "text"), steps = 1)
      .select("lhs", "rhs", "pair_count", "vocab_digest")
      .as[(String, String, Long, Long)].head()
    val digest = (hash60("aaa|1| aa a </w> ") mod BigInt(1000000007)).toLong
    assert(got == (("a", "a", 2L, digest)))
  }

  test("bpeSegmentStats: hand-computed fertility and compression per source") {
    // 1 merge = (s,e): see -> [se, e, </w>] (3), saw -> 4 symbols,
    // sea -> [se, a, </w>] (3)
    val docs = Seq(
      (1L, "see saw see", "A"), // subwords 3+4+3=10, symbols0 4*3=12
      (2L, "saw sea", "B"))     // subwords 4+3=7,   symbols0 4+4=8
      .toDF("doc_id", "text", "source")
    val got = Bpe.bpeSegmentStats(docs, steps = 1)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("A", 3L, 10L, 12L, 3333333L, 833333L),
      ("B", 2L, 7L, 8L, 3500000L, 875000L)), got.toString)
  }

  test("bpeSegmentStatsIncrement: landed merges only; unseen batch words still segment") {
    // landed trains 1 merge on "see see saw": pair counts (s,e)=2,
    // (e,e)=2, (e,</w>)=2, rest 1 — the (count desc, lhs, rhs) tie
    // resolves to (e, </w>) ('<' sorts below 'e'). Batch:
    //   "sea" (unseen in landed dict — the dict join would have
    //   dropped it) -> ' s e a </w> ': merge doesn't apply, 4 subwords;
    //   "see" -> ' s e e</w> ' = 3;
    //   "ox" (no 'e') -> [o, x, </w>] = 3, symbols0 3.
    val landed = Seq((0L, "see see saw", "A")).toDF("doc_id", "text", "source")
    val batch = Seq((2L, "sea see", "A"), (7L, "ox", "B"))
      .toDF("doc_id", "text", "source")
    val got = Bpe.bpeSegmentStatsIncrement(landed, batch, steps = 1)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // A: words 2, subwords 4+3=7, symbols0 4+4=8 -> 3500000, 875000
    // B: words 1, subwords 3,     symbols0 3     -> 3000000, 1000000
    assert(got == Seq(
      ("A", 2L, 7L, 8L, 3500000L, 875000L),
      ("B", 1L, 3L, 3L, 3000000L, 1000000L)), got.toString)
    // batch-order independence: reversing the batch changes nothing
    val rev = Bpe.bpeSegmentStatsIncrement(landed,
        Seq((7L, "ox", "B"), (2L, "sea see", "A"))
          .toDF("doc_id", "text", "source"), steps = 1)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rev == got, rev.toString)
  }

  test("non-lowercase-alnum words are excluded from training") {
    val got = Bpe.bpeMerges(
        Seq((1L, "Hello, WORLD ab ab")).toDF("doc_id", "text"), steps = 1)
      .select("lhs", "rhs", "pair_count")
      .as[(String, String, Long)].head()
    // only "ab"×2 trains: pairs (a,b)×2, (b,</w>)×2 -> tie, 'a' < 'b'
    assert(got == (("a", "b", 2L)))
  }

  // ── tokenizerRebuildPolicy (q207): both branches, pinned ──
  // landed: short repetitive words the learned merges compress well;
  // drifted batch: long unseen gibberish that segments poorly from
  // characters under the frozen table → fertility spikes → trip
  private val polLanded = Seq(
    (1L, "see saw see saw", "A"), (2L, "saw sea see", "A"),
    (3L, "see see saw", "B")).toDF("doc_id", "text", "source")
  private val polDrifted = Seq(
    (11L, "zqxjkvbn wpfmtrlg zqxjkvbn", "A"),
    (12L, "hdcyubio wpfmtrlg", "B")).toDF("doc_id", "text", "source")

  test("tokenizer policy, tripped: retrains over grown, publishes the release, serves through the pin") {
    graft.util.CacheRegistry.releaseAll()
    val grown = polLanded.unionByName(polDrifted)
    val got = Bpe.tokenizerRebuildPolicy(polLanded, polDrifted, grown,
        "tok-test-1", maxDriftE6 = 0L, steps = 3)
      .as[(String, Long, String, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got.nonEmpty)
    assert(got.forall(_._1 == "rebuild"), got.toString)
    assert(got.map(_._2).distinct.size == 1 && got.head._2 > 0L)
    // the served rows ARE the grown-table increment face
    val expect = Bpe.bpeSegmentStatsIncrement(grown, polDrifted, steps = 3)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got.map(r => (r._3, r._4, r._5, r._6, r._7, r._8)).toSet
      == expect)
    // the release pin exists and re-publishing identically is a no-op
    assert(graft.util.CacheRegistry.entries.keys
      .exists(_.startsWith("bpe-release")))
    val before = graft.util.CacheRegistry.size
    Bpe.publishBpeRelease(grown, "tok-test-1", steps = 3)
    assert(graft.util.CacheRegistry.size == before)
    // a different merge count under the published name fails loudly
    intercept[IllegalArgumentException] {
      Bpe.publishBpeRelease(grown, "tok-test-1", steps = 2)
    }
    graft.util.CacheRegistry.releaseAll()
  }

  test("tokenizer policy, untripped: serves the frozen face and publishes nothing") {
    graft.util.CacheRegistry.releaseAll()
    // batch of the landed vocabulary's BEST-compressed word (see fully
    // merges in 3 steps): batch fertility < the landed baseline → keep
    val batch = Seq((21L, "see see see", "A"))
      .toDF("doc_id", "text", "source")
    val grown = polLanded.unionByName(batch)
    val got = Bpe.tokenizerRebuildPolicy(polLanded, batch, grown,
        "tok-test-2", maxDriftE6 = 0L, steps = 3)
      .as[(String, Long, String, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got.nonEmpty)
    assert(got.forall(_._1 == "keep"), got.toString)
    val expect = Bpe.bpeSegmentStatsIncrement(polLanded, batch, steps = 3)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got.map(r => (r._3, r._4, r._5, r._6, r._7, r._8)).toSet
      == expect)
    assert(!graft.util.CacheRegistry.entries.keys
      .exists(_.startsWith("bpe-release")))
    graft.util.CacheRegistry.releaseAll()
  }

  test("tokenizer policy, empty batch: no evidence, keep, zero rows, nothing published") {
    graft.util.CacheRegistry.releaseAll()
    val batch = Seq((31L, "!!! ???", "A")).toDF("doc_id", "text", "source")
    val got = Bpe.tokenizerRebuildPolicy(polLanded, batch, polLanded,
      "tok-test-3", maxDriftE6 = 0L, steps = 3)
    assert(got.isEmpty)
    assert(!graft.util.CacheRegistry.entries.keys
      .exists(_.startsWith("bpe-release")))
    graft.util.CacheRegistry.releaseAll()
  }
}
