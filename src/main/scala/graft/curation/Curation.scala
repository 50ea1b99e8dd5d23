package graft.curation

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines: deterministic
  * stratified sampling (corpus mixing) and GPT-style sequence packing.
  * Both are pure column expressions / window aggregations — single scan,
  * codegen end to end, no driver-side loops — and both are *hash- or
  * order-deterministic* so a 100 TB run, its retry, and the SQL oracle
  * produce byte-identical output (no RNG state, no partition-order
  * dependence).
  */
object Curation {

  /** Per-million threshold rendering of a sampling rate. */
  private def ppm(rate: Double): Long = math.round(rate * 1000000L)

  /** Deterministic stratified Bernoulli sample: a row survives iff
    * `hash60(key) mod 1e6 < rate(stratum) · 1e6`. This is how a corpus
    * mixture ("keep 50% of English, 10% of everything else") is taken at
    * scale: the keep decision is a pure function of the row's stable key,
    * so resampling a grown corpus keeps prior decisions (only new keys
    * are decided fresh), retries are idempotent, and any engine with md5
    * reproduces the exact sample. One scan, zero shuffle; the stratum
    * rate table compiles to a chained CASE (strata counts are
    * human-scale). */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit(ppm(defaultRate))) {
      case (acc, (s, r)) => when(stratum === lit(s), lit(ppm(r))).otherwise(acc)
    }
    df.filter(pmod(TextFunctions.hash60(key), lit(1000000L)) < threshold)
  }

  /** GPT-style sequence packing: documents are concatenated in id order
    * and cut every `maxTokens` tokens; a document therefore occupies
    * sequences `first_seq .. last_seq` of its shard. Packing is
    * per-shard (`shard = doc_id mod nShards`) — the industry-standard
    * sharded pack — because a single global prefix sum would funnel the
    * corpus through one partition; per shard the running offset is a
    * window cumsum over id order, which shuffles once on the shard key
    * and scales with shard count. Token counts use the BPE-ish
    * pre-tokenizer ([[TextFunctions.regexTokens]]); tokenless documents
    * are dropped (they occupy no sequence).
    *
    * Output per surviving doc: (doc_id, shard, n_tokens, start_offset,
    * first_seq, last_seq, n_seqs). */
  def packSequences(docs: DataFrame, maxTokens: Int, nShards: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol),
        pmod(col(idCol), lit(nShards)).cast("int").as("shard"),
        size(TextFunctions.regexTokens(col(textCol))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("start_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("first_seq", floor(col("start_offset") / lit(maxTokens)))
      .withColumn("last_seq",
        floor((col("start_offset") + col("n_tokens") - 1) / lit(maxTokens)))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
  }
}
