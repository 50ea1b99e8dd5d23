package graft

import graft.curation.Curation
import org.apache.spark.sql.functions._

/** Dataset-curation operators: hash-deterministic stratified sampling and
  * per-shard sequence packing. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedSample keeps decisions stable when the corpus grows") {
    val full = (0 until 400).map(i => (i.toLong, if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val half = full.filter(col("doc_id") < 200)
    def sample(df: org.apache.spark.sql.DataFrame) =
      Curation.stratifiedSample(df, col("lang"), col("doc_id").cast("string"),
          Map("en" -> 0.5), defaultRate = 0.1)
        .select("doc_id").as[Long].collect().toSet
    val sHalf = sample(half)
    val sFull = sample(full)
    // growing the corpus never flips an existing row's keep decision
    assert(sFull.filter(_ < 200) == sHalf)
    // per-stratum rates land in loose Bernoulli bounds (134 en, 266 de)
    val en = sFull.count(_ % 3 == 0)
    val de = sFull.size - en
    assert(en > 40 && en < 95, s"en kept $en of 134 at rate 0.5")
    assert(de > 5 && de < 60, s"de kept $de of 266 at rate 0.1")
  }

  test("packSequences: contiguous per-shard offsets and exact boundary spans") {
    // doc i has (i % 7) + 1 single-letter tokens; 2 shards, cut every 10
    val docs = (0 until 60)
      .map(i => (i.toLong, Seq.fill(i % 7 + 1)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Curation.packSequences(docs, maxTokens = 10, nShards = 2)
      .select("doc_id", "shard", "n_tokens", "start_offset",
        "first_seq", "last_seq", "n_seqs")
      .as[(Long, Int, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1)

    // reference pack computed directly
    var offsets = Map(0 -> 0L, 1 -> 0L)
    val expected = (0 until 60).map { i =>
      val shard = i % 2
      val n = (i % 7 + 1).toLong
      val start = offsets(shard)
      offsets += shard -> (start + n)
      (i.toLong, shard, n, start, start / 10, (start + n - 1) / 10,
        (start + n - 1) / 10 - start / 10 + 1)
    }
    assert(got.toSeq == expected)
    // at least one doc straddles a cut (the boundary case exists)
    assert(got.exists(_._7 == 2), "no doc crossed a sequence boundary")
  }
}
