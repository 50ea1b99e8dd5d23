package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-stride document chunking — the splitting step of a RAG /
  * long-context training pipeline: each document becomes
  * `ceil(n_chars / stride)` chunks of `size` characters starting every
  * `stride` (overlap = size − stride). Pure generate-and-project: a
  * `sequence` array per row exploded to one row per chunk — no shuffle
  * at all (the operator is embarrassingly parallel per document), and
  * chunk boundaries are arithmetic on `length(text)`, so every engine
  * cuts identically. Emits the chunk's stable fingerprint rather than
  * the text so downstream exact-dedup over chunks ships 16 bytes, not
  * the payload; project `substring` again where the text is needed.
  *
  * Output: (id, chunk_id, start, chunk_len, chunk_fp) — `start` 0-based,
  * `chunk_len` the realized (possibly short, final) length. */
object Chunker {
  def chunk(docs: DataFrame, size: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "need 0 < stride <= size (overlap = size - stride)")
    docs
      .select(col(idCol), col(textCol).as("__t"),
        length(col(textCol)).as("__n"))
      .filter(col("__n") > 0)
      .withColumn("start",
        explode(sequence(lit(0L), (col("__n") - 1).cast("long"),
          lit(stride.toLong))))
      .select(col(idCol),
        (col("start") / lit(stride.toLong)).cast("long").as("chunk_id"),
        col("start"),
        least(lit(size.toLong), col("__n") - col("start")).as("chunk_len"),
        md5(expr(s"substring(__t, start + 1, $size)")).as("chunk_fp"))
  }

  /** Cross-document duplicate-CHUNK report — the RAG-index hygiene
    * check: a chunk whose fingerprint appears in ≥ 2 distinct
    * documents is boilerplate or syndication that will be retrieved
    * over and over, crowding real context out of the window (and in a
    * training mixture, the same chunk sampled many times). Output: the
    * top `k` duplicated fingerprints by occurrence count with their
    * document spread — the rows an operator actually deletes or
    * downweights.
    *
    * Scale: [[chunk]] is a zero-shuffle generate-and-project carrying
    * fingerprints, not payloads; this adds one fp-keyed
    * map-side-combined aggregate and a TakeOrderedAndProject — the
    * same shape as exact dedup, at chunk granularity. */
  def duplicateChunks(docs: DataFrame, size: Int = 500, stride: Int = 400,
      k: Int = 25, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    chunk(docs, size, stride, idCol, textCol)
      .groupBy("chunk_fp")
      .agg(count_distinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= 2)
      .orderBy(desc("n_occurrences"), asc("chunk_fp"))
      .limit(k)
}
