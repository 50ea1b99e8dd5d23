package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Substring-level dedup (q109's operator): excise token runs of
  * length >= k occurring >= 2x corpus-wide, across or within docs. */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private val passage =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet"

  private def run(docs: Seq[(Long, String)], k: Int = 8) =
    Dedup.substringDedup(docs.toDF("doc_id", "text"), k = k)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
      .map { case (id, n, r, m) => id -> ((n, r, m)) }.toMap

  private def md5Of(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("a passage shared by two docs is excised from both, rest kept") {
    val got = run(Seq(
      (1L, s"unique one text here $passage and a tail follows now"),
      (2L, s"different head entirely $passage closing words differ too"),
      (3L, "completely unrelated document with no repeated content at all")))
    // passage = 10 tokens -> all 10 removed from both carriers
    val (n1, r1, m1) = got(1L)
    assert((n1, r1) == ((19L, 10L)))
    assert(m1 == md5Of("unique one text here and a tail follows now"))
    val (n2, r2, m2) = got(2L)
    assert((n2, r2) == ((17L, 10L)))
    assert(m2 == md5Of("different head entirely closing words differ too"))
    // untouched doc: nothing removed, md5 of its own text
    val (n3, r3, m3) = got(3L)
    assert((n3, r3) == ((9L, 0L)))
    assert(m3 == md5Of("completely unrelated document with no repeated content at all"))
  }

  test("within-document repetition is excised (both occurrences)") {
    val got = run(Seq(
      (1L, s"$passage middle filler words $passage"),
      (2L, "independent second doc keeps the corpus honest here")))
    // both 10-token runs covered; the 3 middle tokens survive
    val (n1, r1, m1) = got(1L)
    assert((n1, r1) == ((23L, 20L)))
    assert(m1 == md5Of("middle filler words"))
  }

  test("runs shorter than k survive; docs shorter than k are untouched") {
    val shared7 = "one two three four five six seven" // 7 tokens < k=8
    val got = run(Seq(
      (1L, s"$shared7 aa bb"),
      (2L, s"$shared7 cc dd"),
      (3L, "tiny doc")))
    assert(got(1L)._2 == 0L && got(2L)._2 == 0L && got(3L)._2 == 0L)
    assert(got(3L)._1 == 2L)
  }

  test("maximal repeated run longer than k is fully excised") {
    // 12-token shared run: every token of the run is covered by some
    // duplicated 8-gram, including the edges
    val run12 = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12"
    val got = run(Seq(
      (1L, s"head $run12 tail"),
      (2L, s"other start $run12 other end")))
    assert(got(1L) == ((14L, 12L, md5Of("head tail"))))
    assert(got(2L) == ((16L, 12L, md5Of("other start other end"))))
  }

  test("incremental: landed content excised from batch; landed side untouched") {
    val landed = Seq(
      (1L, s"landed carrier of $passage right here"),
      (2L, "some other landed document with plainly unrelated words inside"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      // quotes the landed passage once — excised on the landed hit alone
      (101L, s"fresh head then $passage and fresh tail"),
      // unique content — untouched
      (102L, "entirely novel batch document nothing shared with anything"))
      .toDF("doc_id", "text")
    val got = Dedup.substringDedupIncrement(landed, incoming, k = 8)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
      .map { case (id, n, r, m) => id -> ((n, r, m)) }.toMap
    // output covers ONLY the incoming slice
    assert(got.keySet == Set(101L, 102L))
    assert(got(101L) == ((16L, 10L, md5Of("fresh head then and fresh tail"))))
    assert(got(102L)._2 == 0L)
  }

  test("incremental: within-batch repetition excised without any landed hit") {
    val landed = Seq((1L, "landed filler totally unrelated to the batch content here"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (101L, s"alpha start $passage"),
      (102L, s"$passage omega end"),
      (103L, "standalone batch doc sharing no long runs with its peers"))
      .toDF("doc_id", "text")
    val got = Dedup.substringDedupIncrement(landed, incoming, k = 8)
      .as[(Long, Long, Long, String)].collect()
      .map { case (id, n, r, m) => id -> ((n, r, m)) }.toMap
    assert(got(101L) == ((12L, 10L, md5Of("alpha start"))))
    assert(got(102L) == ((12L, 10L, md5Of("omega end"))))
    assert(got(103L)._2 == 0L)
  }

  test("incremental ≡ batch substringDedup restricted to the batch slice") {
    // the defining identity: cleaning a batch against landed ∪ batch
    // equals running the ONE-SHOT operator over landed ∪ batch and
    // keeping the batch rows — landed-side runs of length < 2x never
    // differ because a landed-only dup cannot excise batch tokens
    val all = Seq(
      (1L, s"landed one with $passage inside it"),
      (2L, "landed two distinct filler material here"),
      (101L, s"batch quoting $passage verbatim"),
      (102L, "batch unique content with no repeats at all"),
      (103L, "batch unique content with no repeats at all padded"))
      .toDF("doc_id", "text")
    val landed = all.filter($"doc_id" < 100L)
    val incoming = all.filter($"doc_id" >= 100L)
    val inc = Dedup.substringDedupIncrement(landed, incoming, k = 8)
      .as[(Long, Long, Long, String)].collect().toSet
    val oneShot = Dedup.substringDedup(all, k = 8)
      .filter($"doc_id" >= 100L)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(inc == oneShot)
  }

  test("matches an O(n²) brute-force reference on random corpora (5 seeds)") {
    // independent oracle: count every positional k-gram by VALUE (not
    // hash), mark covered tokens by direct interval painting, excise
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val vocab = (1 to 12).map(i => f"w$i%02d")
      val passage = (1 to 9).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val docs = (1L to 12L).map { id =>
        val body = (1 to 6 + rnd.nextInt(20))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
        // a third of the docs embed the shared passage somewhere
        val text = if (id % 3 == 0) s"$body $passage" else body
        (id, text)
      }
      val k = 4
      // brute force
      val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
      val gramCount = scala.collection.mutable.Map.empty[Seq[String], Int]
        .withDefaultValue(0)
      toks.values.foreach(_.sliding(k).filter(_.size == k)
        .foreach(g => gramCount(g) += 1))
      val expect = toks.map { case (id, ts) =>
        val covered = Array.fill(ts.size)(false)
        (0 to ts.size - k).foreach { s =>
          if (gramCount(ts.slice(s, s + k)) >= 2)
            (s until s + k).foreach(covered(_) = true)
        }
        val clean = ts.zipWithIndex.collect {
          case (t, i) if !covered(i) => t }.mkString(" ")
        id -> ((ts.size.toLong, covered.count(identity).toLong, md5Of(clean)))
      }
      val got = run(docs, k = k)
      assert(got == expect, s"seed $seed")
    }
  }

  test("incremental: batch-over-batch — content landed by batch A cleans batch B") {
    val landed0 = Seq(
      (1L, s"first landed doc holds $passage intact"),
      (2L, "second landed doc entirely different material inside"))
      .toDF("doc_id", "text")
    val runA = "alpha beta gamma delta epsilon zeta eta theta iota" // 9 tokens
    val batchA = Seq((101L, runA)).toDF("doc_id", "text")
    val cleanA = Dedup.substringDedupIncrement(landed0, batchA, k = 8)
      .as[(Long, Long, Long, String)].collect()
    assert(cleanA.toSeq == Seq((101L, 9L, 0L, md5Of(runA))))
    // batch A lands; batch B quotes the ORIGINAL landed passage and
    // batch A's run — both must now excise
    val landed1 = landed0.unionByName(batchA)
    val batchB = Seq(
      (201L, s"quoting now $passage done"),
      (202L, s"$runA trailer"))
      .toDF("doc_id", "text")
    val got = Dedup.substringDedupIncrement(landed1, batchB, k = 8)
      .as[(Long, Long, Long, String)].collect()
      .map { case (id, n, r, m) => id -> ((n, r, m)) }.toMap
    assert(got(201L) == ((13L, 10L, md5Of("quoting now done"))))
    assert(got(202L) == ((10L, 9L, md5Of("trailer"))))
  }

  test("substringDedupStats: per-source counts, hit docs and exact ppm") {
    val docs = Seq(
      (1L, "a", s"head one $passage"),                  // 12 tok, 10 removed
      (2L, "a", s"other opener here $passage trailer"), // 14 tok, 10 removed
      (3L, "a", "clean source-a document with nothing repeated anywhere"), // 7, 0
      (4L, "b", "source b stays entirely clean of long repeated runs"))    // 9, 0
      .toDF("doc_id", "source", "text")
    val got = Dedup.substringDedupStats(docs, k = 8)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // source a: 3 docs, 33 tokens, 20 removed, 2 docs hit,
    // ppm = 20e6 div 33 = 606060
    assert(got == Seq(
      ("a", 3L, 33L, 20L, 2L, 606060L),
      ("b", 1L, 9L, 0L, 0L, 0L)))
  }

  test("substringDedupClean returns the text whose md5 the contract face ships") {
    val docs = Seq(
      (1L, s"unique head $passage unique tail"),
      (2L, s"$passage second carrier body"),
      (3L, "wholly original document body here")).toDF("doc_id", "text")
    val clean = Dedup.substringDedupClean(docs, k = 8)
      .as[(Long, Long, Long, String)].collect()
      .map { case (id, n, r, c) => id -> ((n, r, c)) }.toMap
    val digest = run(Seq(
      (1L, s"unique head $passage unique tail"),
      (2L, s"$passage second carrier body"),
      (3L, "wholly original document body here")), k = 8)
    assert(clean.keySet == digest.keySet)
    clean.foreach { case (id, (n, r, c)) =>
      assert((n, r, md5Of(c)) == digest(id), s"doc $id")
    }
    assert(clean(1L)._3 == "unique head unique tail")
  }

  test("one row per input doc; all-duplicate doc cleans to empty string") {
    val got = run(Seq(
      (1L, passage),
      (2L, passage),
      (3L, "a filler doc so the corpus is not only the duplicate pair")))
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((10L, 10L, md5Of(""))))
    assert(got(2L) == ((10L, 10L, md5Of(""))))
  }
}
