package graft

import graft.curation.Curation
import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** End-to-end streaming ingest composition: streamingExact (q73's
  * operator) feeding qualityGate (q94) and threeWaySplit (q106) inside
  * one foreachBatch — the production wiring of the append-only pipeline.
  * The operators are individually oracle-checked; what this spec pins is
  * their COMPOSITION under micro-batch semantics: every admitted row gets
  * exactly one gate verdict and (if kept) exactly one split, batch row
  * accounting closes, and the batch-mode operators applied to the same
  * rows agree verdict-for-verdict (the batch/streaming parity argument). */
class StreamingPipelineSpec extends SparkSpec {
  import spark.implicits._

  // well above epoch: a row whose event time equals the INITIAL
  // watermark (0) is silently late-dropped before its fingerprint can
  // enter the dedup state — found the hard way
  private def ts(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)

  /** ≥30 tokens, mean word length ≈4.5, 24% stopwords, ~78% unique —
    * passes every qualityGate heuristic; `salt` makes the fingerprint
    * (and id-hash) unique per document. */
  private def goodText(salt: Int): String =
    ((1 to 30).map(j => f"wrd$j%02d") ++ Seq.fill(10)("the") ++
      Seq(f"doc$salt%02d")).mkString(" ")

  test("streamingExact -> qualityGate -> threeWaySplit closes row accounting") {
    val input = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val docs = input.toDF().toDF("doc_id", "ts", "text")

    // (batchId, doc_id, keep, split-or-null) for every admitted row
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String)]
    val q = Dedup.streamingExact(docs, "ts", "10 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        // PIN the batch before fanning it out: the gate and the split
        // both reference it, and re-evaluating a STATEFUL source inside
        // one foreachBatch re-runs the dedup against already-advanced
        // state (rows vanish nondeterministically). persist-then-reuse
        // is the documented composition contract for multi-use batches.
        val batch = batch0.persist()
        try {
          val gated = Curation.qualityGate(batch)
          val kept = batch.join(
            gated.filter(col("keep") === 1).select("doc_id"), Seq("doc_id"))
          val split = Curation.threeWaySplit(kept).select("doc_id", "split")
          val rows = gated.select("doc_id", "keep")
            .join(split, Seq("doc_id"), "left")
            .collect()
          seen.synchronized {
            rows.foreach { r: Row =>
              seen += ((batchId, r.getLong(0), r.getLong(1),
                Option(r.getString(2)).orNull))
            }
          }
        } finally { batch.unpersist(); () }
        ()
      }
      .start()
    try {
      // batch 1: two good docs + one too-short doc
      input.addData(
        (1L, ts(0), goodText(1)),
        (2L, ts(1000), goodText(2)),
        (3L, ts(2000), "tiny text"))
      q.processAllAvailable()
      // batch 2: an exact duplicate of doc 1 (must never reach the gate)
      // + one fresh good doc
      input.addData(
        (4L, ts(3000), goodText(1)),
        (5L, ts(4000), goodText(5)))
      q.processAllAvailable()
    } finally q.stop()

    val admitted = seen.map(_._2).toSet
    assert(admitted == Set(1L, 2L, 3L, 5L), s"admitted=$admitted seen=$seen")

    // gate verdicts: good docs keep, the short doc drops; every admitted
    // row has exactly one verdict row
    assert(seen.size == 4)
    val keepOf = seen.map(t => t._2 -> t._3).toMap
    assert(keepOf == Map(1L -> 1L, 2L -> 1L, 3L -> 0L, 5L -> 1L))

    // kept rows carry exactly one split, dropped rows none
    val splitOf = seen.map(t => t._2 -> t._4).toMap
    assert(splitOf(3L) == null)
    assert(Set("train", "val", "test").intersect(splitOf.values.toSet).nonEmpty)

    // batch/streaming parity: the same docs through the BATCH operators
    // produce identical verdicts and splits (split is a pure function of
    // doc_id; the gate a pure function of text)
    val batchDocs = Seq(
      (1L, goodText(1)), (2L, goodText(2)), (3L, "tiny text"),
      (5L, goodText(5))).toDF("doc_id", "text")
    val batchGate = Curation.qualityGate(batchDocs)
      .select("doc_id", "keep").as[(Long, Long)].collect().toMap
    assert(batchGate == keepOf)
    val batchSplit = Curation.threeWaySplit(
        batchDocs.join(Curation.qualityGate(batchDocs)
          .filter(col("keep") === 1).select("doc_id"), Seq("doc_id")))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(batchSplit == splitOf.filter(_._2 != null))

    // per-batch accounting closes: rows = keep + drop; keep = Σ splits
    seen.groupBy(_._1).foreach { case (bid, rows) =>
      val nKeep = rows.count(_._3 == 1L)
      assert(rows.count(_._4 != null) == nKeep, s"batch $bid split count")
    }
  }
}
