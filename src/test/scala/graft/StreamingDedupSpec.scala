package graft

import graft.dedup.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming exact dedup: duplicates within the watermark horizon are
  * dropped across micro-batches; fingerprints age out with the watermark
  * (bounded state), after which the text is re-admitted. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  // offset well above epoch: a row whose event time equals the INITIAL
  // watermark (0) is silently late-dropped before its fingerprint enters
  // state — at ts(0) exactly, doc 1 was being "deduplicated" by the
  // late-data path, not the state store (found via StreamingPipelineSpec)
  private def ts(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)

  test("streamingExact drops cross-batch dups within the horizon, re-admits after eviction") {
    val input = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val q = Dedup.streamingExact(docs, "ts", "10 minutes")
      .select("doc_id")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append).start()
    try {
      val h = 3600L * 1000 // 1 h
      // batch 1: in-batch duplicate (doc 2) dropped, distinct texts kept
      input.addData((1L, ts(0), "a b"), (2L, ts(1000), "a b"), (3L, ts(2000), "c"))
      q.processAllAvailable()
      // batch 2: duplicate of doc 1 within the 10-min horizon — dropped
      input.addData((4L, ts(3000), "a b"))
      q.processAllAvailable()
      // batch 3: jump event time 2 h ahead; its commit advances the
      // watermark far past 0 + 10 min, evicting the old fingerprints
      input.addData((5L, ts(2 * h), "d"))
      q.processAllAvailable()
      // batch 4: the same text again, long after eviction — re-admitted
      input.addData((6L, ts(2 * h + 1000), "a b"))
      q.processAllAvailable()
      val kept = spark.table("sdedup").as[Long].collect().toSet
      // exactly ONE of the in-batch duplicates {1, 2} survives (which one
      // is partition-order-dependent); 4 (the cross-batch dup) never does
      assert(kept.intersect(Set(1L, 2L)).size == 1, s"kept=$kept")
      assert(!kept.contains(4L) && kept.contains(3L) &&
        kept.contains(5L) && kept.contains(6L), s"kept=$kept")
    } finally q.stop()
  }
}
