package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, portable hashing, normalization,
  * fingerprinting, quality scoring, language id.
  *
  * Everything here is pure `org.apache.spark.sql.functions` composition —
  * codegen'd, no UDFs — so the expressions stay inside whole-stage codegen
  * and push through Catalyst untouched.
  *
  * Determinism note: every hash used for dedup is derived from md5 (not
  * Spark's murmur3 `hash()`), so results are reproducible across engines
  * and versions — the DuckDB oracle computes the identical value with
  * `('0x' || substr(md5(s),1,15))::BIGINT`.
  */
object TextFunctions {

  /** Whitespace tokenizer (the document corpus is pre-normalized prose). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish regex tokenizer: letter runs, digit runs, single punctuation
    * marks — the classic pre-tokenization split used before byte-pair
    * merging. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Word n-gram shingles over an already-materialized token array
    * (an attribute or lambda-bound value — NOT a raw `tokens(text)`
    * expression, see [[shingles]]): `["a b c", "b c d", ...]`. Empty for
    * fewer than n tokens (Spark's `sequence` counts *down* when
    * start > stop, so the short case needs the guard). */
  def shinglesOf(ts: Column, n: Int): Column =
    when(size(ts) >= n,
      transform(sequence(lit(1), size(ts) - lit(n - 1)),
        i => concat_ws(" ", slice(ts, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Word n-gram shingles of a text column. The token array is bound
    * once per row as a lambda variable (`transform` over a 1-element
    * wrapper array) before the per-shingle `slice` touches it: higher-
    * order functions evaluate interpreted with no subexpression reuse,
    * so slicing `tokens(text)` directly would re-run the regex split
    * once per shingle — O(words²) per row. The let-binding keeps it
    * O(words) and survives Catalyst project-collapsing by construction. */
  def shingles(text: Column, n: Int): Column =
    element_at(transform(array(tokens(text)), ts => shinglesOf(ts, n)), 1)

  /** Portable 60-bit string hash: first 15 hex digits of md5, as a long.
    * Engine-agnostic (DuckDB: `('0x'||substr(md5(s),1,15))::BIGINT`). */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Aggressive normalization for near-exact dedup: lowercase, strip
    * non-alphanumerics to spaces, collapse whitespace. */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9]+", " "), " +", " "))

  /** Document fingerprint: md5 of the normalized text (hex string). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Number of non-space characters. */
  def nonSpaceChars(text: Column): Column =
    length(regexp_replace(text, "\\s+", ""))

  /** Tokens of `text` that appear in `words` (count). */
  def tokensIn(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(lit(_)): _*)))

  /** English stopword markers used by the quality/lang-id heuristics. */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "on", "for", "with")

  /** Quality-score feature columns: token count, mean token length,
    * stopword ratio, and a blended score. All divisions are
    * integer-over-integer in IEEE double — bit-identical on any engine. */
  def qualityFeatures(text: Column): Seq[Column] = {
    val nTok = size(tokens(text)).cast("long")
    val nChr = nonSpaceChars(text).cast("long")
    val nStop = tokensIn(text, EnStopwords).cast("long")
    val meanLen = nChr.cast("double") / nTok.cast("double")
    val stopRatio = nStop.cast("double") / nTok.cast("double")
    Seq(
      nTok.as("n_tokens"),
      nChr.as("n_alpha_chars"),
      round(meanLen, 6).as("mean_token_len"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(stopRatio * lit(0.5) + least(meanLen / lit(10.0), lit(1.0)) * lit(0.5), 6)
        .as("quality_score"))
  }

  /** N-gram-marker language id: count marker hits per language, pick the
    * argmax with a deterministic tiebreak (marker order, then "und"). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "die", "und", "ist"),
    "es" -> Seq("el", "la", "los", "es"),
    "fr" -> Seq("le", "la", "les", "est"))

  def langId(text: Column): Column = {
    val scored = LangMarkers.map { case (lang, ws) => (lang, tokensIn(text, ws)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((lang, cnt), acc) =>
      when(cnt > 0 && cnt === best, lit(lang)).otherwise(acc)
    }
  }
}
