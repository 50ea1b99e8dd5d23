package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The STREAMING face of the unified ingest gate — the production
  * wiring a continuous append-only pipeline runs: incoming documents
  * arrive as a stream of ingest records `(idCol, stratum, textCol,
  * vecCol)`, each micro-batch is gated against the LANDED corpus with
  * [[graft.dedup.Dedup.ingestGate]] / [[graft.dedup.Dedup.ingestGateFull]],
  * and the per-batch verdict table `(idCol, gate)` is delivered to the
  * caller's sink.
  *
  * `foreachBatch` is the right seam, not a stateful streaming
  * operator: the gate is a batch-shaped composition of incremental
  * operators whose corpus-dependent evidence is entirely LANDED-side
  * (fingerprint set, band tables, two-level codebook, DSIR
  * distributions, bigram LM + boundaries — all memoized through
  * [[graft.util.CacheRegistry]] and reused batch over batch), so a
  * micro-batch needs no cross-batch Spark state of its own, and
  * structured streaming's epoch replay re-derives the identical
  * verdicts on retry (every stage is deterministic given landed +
  * batch). Verdicts are batch-order-independent by the gate's
  * contract, so micro-batch boundaries — however the trigger slices
  * the stream — never change a document's outcome.
  *
  * The batch is persisted before gating (it feeds both the document
  * and embedding sides of the gate; an unpersisted streaming batch
  * re-evaluated within one epoch can re-run its source) and
  * unpersisted after delivery. One deliberate non-goal: this face
  * does NOT fold admitted documents back into the landed corpus
  * mid-run — landed-index refresh is a periodic compaction decision
  * (rebuild the memoized indexes from the grown corpus between
  * sessions), not a per-batch one; folding per batch would make
  * verdicts order-dependent, exactly what the landed-codebook
  * principle exists to prevent. */
object IngestGateStream {

  /** Attach the gate to a streaming `records` frame with columns
    * `(idCol, stratum, textCol, vecCol)` — the stratum/vector columns
    * are renamed to the gate family's canonical `source`/`embedding`
    * per batch, so `landedDocs` must carry its strata in `source` (as
    * the documents table does). `full = true` runs the
    * eight-stage [[graft.dedup.Dedup.ingestGateFull]] funnel,
    * otherwise the six-stage [[graft.dedup.Dedup.ingestGate]].
    * `onVerdicts(epochId, verdicts)` receives one `(idCol, gate)` row
    * per document of the micro-batch. */
  def attach(records: DataFrame, landedDocs: DataFrame,
      landedEmb: DataFrame, targetSource: String,
      full: Boolean = true, centroidOffset: Int = 8,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      idCol: String = "doc_id", stratum: String = "source",
      textCol: String = "text", vecCol: String = "embedding")(
      onVerdicts: (Long, DataFrame) => Unit): StreamingQuery =
    records.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], epochId: Long) =>
        val b = batch.persist()
        try {
          // persist FIRST: even the emptiness probe must not re-run
          // the source (the hazard the persist exists to prevent)
          if (!b.isEmpty) {
            // the gate family's internal stage calls are keyed to the
            // canonical column names — rename here so any caller-side
            // names work (r15 second-review finding)
            val docs = b.select(col(idCol), col(stratum).as("source"),
              col(textCol))
            val emb = b.select(col(idCol).as("vec_id"),
              col(vecCol).as("embedding"))
            // memoizeEvidence = false: a micro-batch frame's registry
            // fingerprint is unique per trigger, so the gate-evidence
            // memo would leak one persisted entry per micro-batch here
            val verdicts =
              if (full)
                Dedup.ingestGateFull(landedDocs, docs, landedEmb, emb,
                  targetSource, centroidOffset = centroidOffset,
                  textCol = textCol, idCol = idCol,
                  memoizeEvidence = false)
              else
                Dedup.ingestGate(landedDocs, docs, landedEmb, emb,
                  targetSource, centroidOffset = centroidOffset,
                  textCol = textCol, idCol = idCol,
                  memoizeEvidence = false)
            onVerdicts(epochId, verdicts)
          }
        } finally { b.unpersist(); () }
      }
      .start()
}
