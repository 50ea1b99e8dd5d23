package graft.curation

import graft.functions.TextFunctions._
import graft.util.CacheRegistry
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BPE merge learning — tokenizer TRAINING, the iterative
  * most-frequent-adjacent-pair loop of Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units" (ACL'16), and the one
  * standard LLM-pipeline stage the engine lacked (r13 verdict, "What's
  * missing" #3; no reference counterpart — the reference has no text
  * processing). q32's BPE-ish *pre-tokenization* segments text with a
  * fixed regex; this learns the merge table itself.
  *
  * Algorithm (classic, over the word-frequency dictionary — every
  * published implementation trains on the dict, not the running text):
  *
  *  1. corpus → word-frequency dictionary (the ONLY corpus-global
  *     stage: one hash aggregate with map-side combine, memoized via
  *     [[graft.util.CacheRegistry]] kind "bpe-dict");
  *  2. each word starts segmented as its characters + an `</w>`
  *     end-of-word marker;
  *  3. `steps` rounds of: count adjacent symbol pairs across the dict
  *     weighted by word frequency (one vocab-sized hash aggregate);
  *     pick the most frequent pair, ties broken deterministically on
  *     (count desc, lhs asc, rhs asc) so any engine replays the same
  *     sequence; rewrite every segmentation with the pair merged
  *     (greedy left-to-right, the `replace` semantics both Spark and
  *     DuckDB share).
  *
  * Training words are restricted to `^[a-z0-9]+$` so character
  * segmentation is engine-portable (no multi-byte/code-unit ambiguity
  * between JVM regex and utf8 engines); a production tokenizer would
  * front this with byte-level pre-tokenization.
  *
  * Scale shape: after the one corpus scan, every round runs over the
  * VOCABULARY (distinct words), which is orders of magnitude smaller
  * than the corpus and bounded in practice (~millions at 100 TB) — the
  * same driver-coordinated small-table iteration as
  * [[graft.similarity.Similarity.kMeansCentroids]]. Each round is one
  * pair-count aggregate + a 1-row argmax collect + a map-only rewrite;
  * nothing per-round touches the corpus again. Segmentations are
  * single-space-joined symbol strings padded with one leading/trailing
  * space, so a merge is the literal string replace of `" lhs rhs "`
  * with `" lhsrhs "` — greedy, non-overlapping, identical across
  * engines (verified: `" a a a "` → `" aa a "` on both).
  *
  * Output, one row per merge step: (step, lhs, rhs, pair_count,
  * vocab_digest) where vocab_digest = Σ hash60(word|freq|segmentation)
  * mod 1e9+7 over the post-merge dictionary — the digest pins the FULL
  * segmentation state after each merge, so an oracle hash-match proves
  * the entire merge sequence and every intermediate rewrite, not just
  * the chosen pairs. */
object Bpe {

  def bpeMerges(docs: DataFrame, steps: Int = 8,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val (merges, digests, _) = learn(docs, steps, textCol)
    val mergeDf = spark.createDataFrame(
      spark.sparkContext.parallelize(merges, 1),
      StructType(Seq(
        StructField("step", IntegerType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
    mergeDf.join(digests.reduce(_ unionByName _), "step")
      .select("step", "lhs", "rhs", "pair_count", "vocab_digest")
  }

  /** Apply face of [[bpeMerges]] — the report a pipeline reads after
    * training: segment every corpus word with the learned merge table
    * and fold per-stratum subword statistics. `n_symbols0` is the
    * pre-merge symbol count (chars + the `</w>` marker), so
    * `compression_ppm = n_subwords/n_symbols0` prices what the learned
    * vocabulary bought; `subwords_per_mword` is the fertility dial
    * (subwords per word, ×1e6).
    *
    * Scale: ONE corpus re-tokenization scan, word-keyed join against
    * the VOCAB-sized segmented dictionary (AQE broadcasts it — a
    * vocabulary is broadcast-sized even at 100 TB corpus scale), then
    * a stratum fold; both ppm divisions are DECIMAL(38,0)-widened
    * integer `div` (BIGINT×1e6 wraps beyond ~9e12 subwords).
    * Output: (stratum, n_words, n_subwords, n_symbols0,
    * subwords_per_mword, compression_ppm). */
  def bpeSegmentStats(docs: DataFrame, steps: Int = 8,
      stratum: String = "source", textCol: String = "text"): DataFrame = {
    val (_, _, dict) = learn(docs, steps, textCol)
    val sub = dict.select(col("word"),
      size(split(trim(col("seg")), " ")).cast("long").as("nsub"))
    docs.select(col(stratum), explode(tokens(col(textCol))).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .join(sub, "word")
      .groupBy(stratum)
      .agg(count(lit(1)).as("n_words"),
        sum(col("nsub")).as("n_subwords"),
        sum(length(col("word")).cast("long") + lit(1L)).as("n_symbols0"))
      .withColumn("subwords_per_mword",
        expr("CAST(n_subwords AS DECIMAL(38,0)) * 1000000 div n_words"))
      .withColumn("compression_ppm",
        expr("CAST(n_subwords AS DECIMAL(38,0)) * 1000000 div n_symbols0"))
  }

  /** Incremental BPE apply — the TOKENIZER cell of the incremental
    * matrix: the merge table is a LANDED artifact (learned once from
    * the landed corpus over its memoized "bpe-dict"; an incoming batch
    * must not move the vocabulary it is segmented by), and the batch
    * segments under it from characters — so batch words UNSEEN in the
    * landed dictionary still segment (the honest tokenizer behavior;
    * [[bpeSegmentStats]]'s dict join would silently drop them).
    * Replaying the merge sequence in learned order on a word's
    * character segmentation reproduces the training rewrite exactly
    * (each merge's applicability depends only on the current
    * segmentation, which evolves identically — the standard BPE-apply
    * equivalence), so in-dict words read the same as the batch face.
    *
    * Scale: the landed side is the memoized dict + `steps` vocab-sized
    * argmax rounds (q113's shape, amortized across batches in a
    * production deployment that persists the merge table); per-batch
    * cost = one tokenization scan, `steps` literal string replaces per
    * DISTINCT batch word, a word-keyed join back (AQE broadcasts the
    * distinct-word table), one stratum fold. Output as
    * [[bpeSegmentStats]]: (stratum, n_words, n_subwords, n_symbols0,
    * subwords_per_mword, compression_ppm), one row per batch
    * stratum. */
  def bpeSegmentStatsIncrement(landed: DataFrame, incoming: DataFrame,
      steps: Int = 8, stratum: String = "source",
      textCol: String = "text"): DataFrame =
    segStatsUnderMerges(mergeSeqOf(landedBpeMerges(landed, steps, textCol)),
      incoming, stratum, textCol)

  /** The landed corpus's memoized MERGE TABLE (kind "bpe-merges",
    * `steps` rows: step, lhs, rhs) — the tokenizer artifact itself.
    * The first call per landed corpus pays the training rounds
    * ([[learn]]); every later batch (the q134 incremental face, each
    * [[tokenizerRebuildPolicy]] trigger) reads the memo instead of
    * re-paying `steps` vocab-sized argmax rounds per batch (review
    * finding: the per-batch frozen face re-learned the landed table
    * every call). IndexStore-persistable like every landed kind. */
  def landedBpeMerges(docs: DataFrame, steps: Int = 8,
      textCol: String = "text"): DataFrame =
    CacheRegistry.cache(
      CacheRegistry.key(docs, "bpe-merges", steps, textCol), {
        val spark = docs.sparkSession
        import spark.implicits._
        val (merges, _, _) = learn(docs, steps, textCol)
        merges.map(r => (r.getInt(0), r.getString(1), r.getString(2)))
          .toDF("step", "lhs", "rhs")
      })

  /** Bounded collect of a merge table (≤ steps rows) in learned
    * order — the sequence [[segStatsUnderMerges]] folds. */
  private def mergeSeqOf(mergesDf: DataFrame): Seq[(String, String)] =
    mergesDf.orderBy("step").select("lhs", "rhs")
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))

  /** Segment a batch's words FROM CHARACTERS through an explicit merge
    * sequence and fold per-stratum subword stats — the apply tail
    * shared by [[bpeSegmentStatsIncrement]] (landed-learned sequence)
    * and [[tokenizerRebuildPolicy]]'s released branch (pin-read
    * sequence), one definition so the two faces can never drift. */
  private def segStatsUnderMerges(mseq: Seq[(String, String)],
      incoming: DataFrame, stratum: String, textCol: String): DataFrame = {
    val batchWords = incoming
      .select(col(stratum), explode(tokens(col(textCol))).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
    val seg0 = concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 "),
      lit("</w> "))
    val segged = mseq.foldLeft(seg0) { case (seg, (l, r)) =>
      replace(seg, lit(s" $l $r "), lit(s" $l$r "))
    }
    val sub = batchWords.select("word").distinct()
      .withColumn("nsub", size(split(trim(segged), " ")).cast("long"))
    batchWords.join(sub, "word")
      .groupBy(stratum)
      .agg(count(lit(1)).as("n_words"),
        sum(col("nsub")).as("n_subwords"),
        sum(length(col("word")).cast("long") + lit(1L)).as("n_symbols0"))
      .withColumn("subwords_per_mword",
        expr("CAST(n_subwords AS DECIMAL(38,0)) * 1000000 div n_words"))
      .withColumn("compression_ppm",
        expr("CAST(n_subwords AS DECIMAL(38,0)) * 1000000 div n_symbols0"))
  }

  /** The landed corpus's memoized FERTILITY BASELINE (kind
    * "bpe-landed-fert"): one row (s = total subwords, w = total words)
    * of the landed corpus segmented by its OWN merge table — a
    * property of (landed corpus, merge table) that never changes
    * between retrains, so every [[tokenizerRebuildPolicy]] call shares
    * it instead of re-paying a landed segmentation pass (the
    * drift-landed-res idiom applied to the tokenizer). */
  def landedBpeFertility(landed: DataFrame, steps: Int = 8,
      stratum: String = "source", textCol: String = "text"): DataFrame =
    CacheRegistry.cache(
      CacheRegistry.key(landed, "bpe-landed-fert", steps, stratum, textCol),
      // segment the landed corpus under the MEMOIZED landed merge table
      // (kind "bpe-merges") instead of bpeSegmentStats, whose learn()
      // call re-paid the `steps` driver-side argmax training rounds per
      // build (ADVICE-r18). Values are identical: every landed word is
      // in the landed dict, so applying the learned merge sequence from
      // characters reproduces the dict segmentation exactly.
      segStatsUnderMerges(
        mergeSeqOf(landedBpeMerges(landed, steps, textCol)),
        landed, stratum, textCol)
        .agg(sum("n_subwords").as("s"), sum("n_words").as("w")))

  /** Publish a trained merge table as an immutable tokenizer RELEASE
    * (kind "bpe-release", caller-owned releaseId — the q193 pin idiom
    * applied to the tokenizer artifact): re-publishing an existing
    * name with IDENTICAL parameters is an idempotent no-op (the
    * crash-retry shape); a different merge count under an existing
    * name fails loudly — a silently-swapped tokenizer re-segments the
    * whole corpus downstream. The pin IS the artifact here (a merge
    * table is `steps` rows), so artifacts-before-pin collapses to one
    * registration. */
  def publishBpeRelease(corpus: DataFrame, releaseId: String,
      steps: Int = 8, textCol: String = "text"): DataFrame = {
    val key = CacheRegistry.key(corpus, "bpe-release", textCol, releaseId)
    // a release NAME is immutable across corpora too: the key embeds
    // the corpus plan's fingerprint, so publishing the same releaseId
    // over a DIFFERENT corpus (the normal case as the grown corpus
    // grows between policy triggers) would otherwise create a second
    // coexisting release under one name with no immutability check
    // (ADVICE-r18) — scan by kind+releaseId prefix, fail loudly
    val prefix = s"bpe-release:$textCol:$releaseId:"
    CacheRegistry.entries.keys
      .find(k => k.startsWith(prefix) && k != key)
      .foreach { _ =>
        throw new IllegalStateException(
          s"publishBpeRelease: release '$releaseId' is already published " +
            "over a DIFFERENT corpus plan — releases are immutable; " +
            "publish under a new releaseId and switch serving")
      }
    CacheRegistry.entries.get(key).foreach { pin =>
      // null-safe one-row read (ADVICE-r18): a zero-row pin (steps = 0
      // publish, where learn's per-step head() never ran) must hit the
      // contract message below, not an NPE on the collected max
      val r = pin.agg(max("step")).collect()(0)
      val s = if (r.isNullAt(0)) 0 else r.getInt(0)
      require(s == steps,
        s"publishBpeRelease: release '$releaseId' is already published " +
          s"with a different merge count ($s vs $steps) — releases are " +
          "immutable; publish under a new releaseId and switch serving")
    }
    // the pin is the merge TABLE alone — not bpeMerges' report row
    // (whose vocab_digest columns would force `steps` corpus-vocab
    // digest aggregates just to evaluate the pin); DETACHED copy so
    // the "bpe-merges" entry and the release never alias one frame
    // under two keys (the double-save/release hazard)
    val m = landedBpeMerges(corpus, steps, textCol)
    CacheRegistry.cache(key, m.select(m.columns.map(col).toIndexedSeq: _*))
  }

  /** Read a published tokenizer release's merge table; throws if the
    * release was never published (serving from a half-built release is
    * what the pin contract forbids). */
  def bpeMergesReleased(corpus: DataFrame, releaseId: String,
      textCol: String = "text"): DataFrame =
    CacheRegistry.entries.getOrElse(
      CacheRegistry.key(corpus, "bpe-release", textCol, releaseId),
      throw new IllegalStateException(
        s"bpeMergesReleased: release '$releaseId' was never published"))

  /** Drift-triggered tokenizer RETRAIN policy — the q197 control loop
    * applied to the BPE artifact, so "retrain the tokenizer" is an
    * operator, not a human reading a fertility dashboard. Measures the
    * batch's FERTILITY under the frozen landed merge table
    * (subwords per million words, the [[bpeSegmentStatsIncrement]]
    * face — unseen words segment from characters, which is exactly
    * where drift shows up) against the landed corpus's own memoized
    * baseline ([[landedBpeFertility]]); `drift_e6 = batch − landed`.
    * Trips iff `drift_e6 > maxDriftE6`: retrains over the caller's
    * grown corpus, publishes the merge table as `releaseId`
    * ([[publishBpeRelease]]), and serves the batch's stats through the
    * PUBLISHED pin's merge sequence (one ≤-steps-row bounded collect);
    * untripped serves the frozen face and publishes NOTHING. An empty
    * batch (no trainable words) has no evidence: keep, NULL drift,
    * zero served rows.
    *
    * The decision evidence rides in the answer (action + drift_e6 as
    * constant columns) and the q207 oracle replays measure + decide +
    * BOTH serve chains in SQL with the final select gated on the
    * decision scalar — the policy's consequence is hash-checked, not
    * just its number. Decision collects are one-row bounded (the
    * pin-consult shape); drift arithmetic is BigInt truncating
    * division on non-negative operands ≡ the oracle's HUGEINT `//`. */
  def tokenizerRebuildPolicy(landed: DataFrame, incoming: DataFrame,
      grown: DataFrame, releaseId: String, maxDriftE6: Long,
      steps: Int = 8, stratum: String = "source",
      textCol: String = "text"): DataFrame = {
    def spwOf(r: Row): Option[BigInt] =
      if (r.isNullAt(0) || r.isNullAt(1) || r.getLong(1) == 0L) None
      else Some(BigInt(r.getLong(0)) * 1000000 / BigInt(r.getLong(1)))
    val baseSpw = spwOf(
      landedBpeFertility(landed, steps, stratum, textCol).collect()(0))
    val frozen = bpeSegmentStatsIncrement(landed, incoming, steps,
      stratum, textCol)
    val batchSpw = spwOf(frozen
      .agg(sum("n_subwords").as("s"), sum("n_words").as("w"))
      .collect()(0))
    val drift = for { b <- batchSpw; l <- baseSpw } yield b - l
    val trip = drift.exists(_ > maxDriftE6)
    val served =
      if (trip) {
        publishBpeRelease(grown, releaseId, steps, textCol)
        segStatsUnderMerges(
          mergeSeqOf(bpeMergesReleased(grown, releaseId, textCol)),
          incoming, stratum, textCol)
      } else frozen
    served.select(
      lit(if (trip) "rebuild" else "keep").as("action"),
      drift.map(d => lit(d.toLong)).getOrElse(lit(null)).cast("long")
        .as("drift_e6"),
      col(stratum), col("n_words"), col("n_subwords"), col("n_symbols0"),
      col("subwords_per_mword"), col("compression_ppm"))
  }

  /** The memoized word-frequency dictionary with its character-level
    * starting segmentation — the ONE corpus-global stage of the BPE
    * family (kind "bpe-dict", keyed by the docs plan), shared by
    * [[bpeMerges]] and [[bpeSegmentStats]] in one session and exposed
    * for an index-build phase. */
  def baseDict(docs: DataFrame, textCol: String = "text"): DataFrame =
    CacheRegistry.cache(
      CacheRegistry.key(docs, "bpe-dict", textCol),
      docs.select(explode(tokens(col(textCol))).as("word"))
        .filter(col("word").rlike("^[a-z0-9]+$"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
        .withColumn("seg",
          concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 "),
            lit("</w> "))))

  /** Session-scoped memo of [[learn]] results (optimization r21): the
    * `steps` training rounds are `steps` SERIAL argmax actions over
    * the vocab — q113 (the merge table) and q115 (the apply/stats
    * face) train on the IDENTICAL (corpus, steps) pair, so the second
    * caller re-paid the whole loop per session (~2.5 s at sf0.1 on the
    * r21 box). Keyed like every shared kind (plan fingerprint embeds
    * the corpus files' content signature) PLUS the session identity —
    * the memo holds session-bound DataFrames, which must never leak
    * across sessions (the CacheRegistry convention, made explicit
    * here). Values are tiny: `steps` merge rows + lazy vocab-sized
    * plans. */
  private val learnMemo = scala.collection.concurrent.TrieMap
    .empty[String, (Seq[Row], Seq[DataFrame], DataFrame)]

  private def learn(docs: DataFrame, steps: Int, textCol: String)
      : (Seq[Row], Seq[DataFrame], DataFrame) =
    learnMemo.getOrElseUpdate(
      CacheRegistry.key(docs, "bpe-learn", steps, textCol,
        System.identityHashCode(docs.sparkSession)),
      learnImpl(docs, steps, textCol))

  /** The shared training loop: `steps` rounds of pair-count argmax +
    * greedy merge over the memoized word-frequency dict. Returns the
    * merge rows, the per-step digest aggregates (lazy, one tiny plan
    * each), and the final segmented dictionary. */
  private def learnImpl(docs: DataFrame, steps: Int, textCol: String)
      : (Seq[Row], Seq[DataFrame], DataFrame) = {
    var dict = baseDict(docs, textCol).select("word", "freq", "seg")
    val merges = Seq.newBuilder[Row]
    var digests = Seq.empty[DataFrame]
    for (i <- 1 to steps) {
      val pairs = dict
        .withColumn("sy", split(trim(col("seg")), " "))
        .select(col("freq"), explode(expr(
          "transform(slice(sy, 1, size(sy) - 1)," +
            " (s, i) -> struct(s as lhs, sy[i + 1] as rhs))")).as("pr"))
        .groupBy(col("pr.lhs").as("lhs"), col("pr.rhs").as("rhs"))
        .agg(sum("freq").as("c"))
      val best = pairs.orderBy(desc("c"), asc("lhs"), asc("rhs")).limit(1).head()
      val (l, r, c) = (best.getString(0), best.getString(1), best.getLong(2))
      dict = dict.withColumn("seg",
        replace(col("seg"), lit(s" $l $r "), lit(s" $l$r ")))
      merges += Row(i, l, r, c)
      digests = digests :+ dict
        .agg((sum(hash60(concat(col("word"), lit("|"),
            col("freq").cast("string"), lit("|"), col("seg")))
            // per-value widening BEFORE the sum: 60-bit values overflow
            // a BIGINT accumulator after ~8 rows (2^63 / 2^60)
            .cast("decimal(38,0)"))
          % lit(1000000007)).cast("long")
          .as("vocab_digest"))
        .withColumn("step", lit(i))
    }
    (merges.result(), digests, dict)
  }
}
