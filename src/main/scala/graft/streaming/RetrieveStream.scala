package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The STREAMING face of hybrid retrieval — continuous SERVING, the
  * query-side twin of [[IngestGateStream]]'s ingest side: retrieval
  * requests arrive as a stream of records `(idCol, textCol, vecCol)`
  * (a request carries its own text and embedding), each micro-batch is
  * served against the LANDED corpus with
  * [[graft.curation.Curation.hybridRrfTopKServedQueries]] — the
  * lexical side probes the memoized bm25-stats index, the semantic
  * side the memoized IVF-PQ routed/coded kinds — and the fused
  * top-`k` table `(q_id, rnk, idCol, rrf_e9)` is delivered to the
  * caller's sink.
  *
  * `foreachBatch` is the right seam for the same reason as the gate's:
  * serving is a batch-shaped composition whose corpus-dependent state
  * is entirely LANDED-side and memoized — a query batch needs no
  * cross-batch Spark state, retries re-derive identical answers
  * (every stage is deterministic given landed + batch), and queries
  * are INDEPENDENT, so micro-batch boundaries never change an answer:
  * the union of any replay's per-trigger outputs equals the one-shot
  * batch serve over the union of its queries (the q198 oracle is
  * q192's verbatim). Unlike the gate, serving mutates nothing — no
  * absorption, no generations, no compaction — so this face has no
  * release bookkeeping at all: the only registry entries it touches
  * are the landed kinds, keyed on the constant landed frames and
  * REUSED trigger over trigger (per-trigger query frames never reach
  * the registry).
  *
  * At 100 TB the landed kinds are the IndexStore-restored artifacts
  * and a trigger's bill is queries × (rarest-term probe + nprobe
  * cells' ADC + shortlist rerank) — the q192 per-batch shape,
  * amortizing the corpus-side work across the stream's lifetime. */
object RetrieveStream {
  def attach(records: DataFrame, docs: DataFrame, embeddings: DataFrame,
      k: Int = 5, depth: Int = 20, kTerms: Int = 8, rrfK: Int = 60,
      nprobe: Int = 3, m: Int = 4, codeStride: Int = 25,
      codeOffset: Int = 7, ivfStride: Int = 50, ivfOffset: Int = 11,
      rerankFactor: Int = 4,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      idCol: String = "doc_id", textCol: String = "text",
      vecCol: String = "embedding")(
      onResults: (Long, DataFrame) => Unit): StreamingQuery =
    attachLive(records, () => (docs, embeddings), k, depth, kTerms,
      rrfK, nprobe, m, codeStride, codeOffset, ivfStride, ivfOffset,
      rerankFactor, trigger, idCol, textCol, vecCol)(onResults)

  /** [[attach]] against a MUTATING corpus — the serve-during-churn
    * composition (r19 verdict task #8): `current` is read once per
    * serve trigger, so each query batch is answered against one
    * coherent landed generation (an [[IngestGateStream.LandedView]]'s
    * `current`, whose visibility contract guarantees the tuple is a
    * COMPLETED generation — retract+absorb merges landed, journal
    * appended — never a half-rotated one). The serve still mutates
    * nothing; the landed kinds it probes are the generation's
    * absorb/retract-seeded registry entries, so a serve at epoch E
    * answers exactly like the one-shot chain over epoch E's corpus
    * (the q214 oracle states this per epoch). */
  def attachLive(records: DataFrame,
      current: () => (DataFrame, DataFrame),
      k: Int = 5, depth: Int = 20, kTerms: Int = 8, rrfK: Int = 60,
      nprobe: Int = 3, m: Int = 4, codeStride: Int = 25,
      codeOffset: Int = 7, ivfStride: Int = 50, ivfOffset: Int = 11,
      rerankFactor: Int = 4,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      idCol: String = "doc_id", textCol: String = "text",
      vecCol: String = "embedding")(
      onResults: (Long, DataFrame) => Unit): StreamingQuery =
    records.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], epochId: Long) =>
        // one coherent generation per trigger (read ONCE, before any
        // plan is built — both retrieval systems must see the same
        // corpus)
        val (docs, embeddings) = current()
        // persisted: the query frame feeds both retrieval systems —
        // an unpersisted streaming batch would re-evaluate the source
        // under each
        val b = batch.persist()
        try {
          if (!b.isEmpty) {
            val qd = b.select(col(idCol).as("q_id"), col(textCol))
            val qe = b.select(col(idCol).as("q_id"), col(vecCol))
            onResults(epochId,
              graft.curation.Curation.hybridRrfTopKServedQueries(
                docs, embeddings, qd, qe, k, depth, kTerms, rrfK,
                nprobe, m, codeStride, codeOffset, ivfStride, ivfOffset,
                rerankFactor, idCol = idCol, textCol = textCol,
                vecCol = vecCol))
          }
        } finally {
          b.unpersist()
          ()
        }
      }
      .start()
}
