package graft

import graft.exec.BatchExec
import graft.rules.RuleCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The text-curation family registry: quality stats and gates,
  * language id, BPE, DSIR, perplexity, TF-IDF/BM25/KL/PMI, the
  * classifier and its mergeable-partials faces, mixtures/splits, and
  * the funnel report. */
trait CurationRegistry extends EntryHelpers {

  protected def curationQueries: Map[String, (SparkSession, String) => DataFrame] = {
    import graft.dedup.Dedup
    import graft.functions.TextFunctions
    import graft.similarity.Similarity
    Map(
      // Text quality scoring: token counts, mean token length, stopword
      // ratio, blended quality score.
      "q14_text_stats" -> ((s, dir) =>
        table(s, dir, "documents")
          .select(col("doc_id") +: TextFunctions.qualityFeatures(col("text")): _*)
          .orderBy("doc_id")),

      // Marker-token language id heuristic.
      "q15_text_langid" -> ((s, dir) =>
        table(s, dir, "documents")
          .select(col("doc_id"), TextFunctions.langId(col("text")).as("lang_id"))
          .orderBy("doc_id")),

      // Document fingerprinting (md5 of normalized text).
      "q16_text_fingerprint" -> ((s, dir) =>
        table(s, dir, "documents")
          .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
          .orderBy("doc_id")),

      // BPE-ish pre-tokenization (letter runs / digit runs / single
      // punctuation): per-doc token and distinct-token counts.
      "q32_text_bpe_tokens" -> ((s, dir) =>
        table(s, dir, "documents")
          .select(col("doc_id"),
            TextFunctions.regexTokens(col("text")).as("tk"))
          .select(col("doc_id"),
            size(col("tk")).cast("long").as("n_bpe_tokens"),
            size(array_distinct(col("tk"))).cast("long").as("n_distinct"))
          .orderBy("doc_id")),

      // Deterministic stratified sampling (corpus mixing): keep 50% of
      // English, 10% of everything else, decided by hash60(doc_id) so
      // the sample is reproducible across engines, runs and retries.
      "q39_stratified_sample" -> ((s, dir) => {
        import graft.curation.Curation
        val docs = table(s, dir, "documents")
          .withColumn("lang_id", TextFunctions.langId(col("text")))
        Curation.stratifiedSample(docs, col("lang_id"),
            col("doc_id").cast("string"), Map("en" -> 0.5), defaultRate = 0.1)
          .select("doc_id", "lang_id")
          .orderBy("doc_id")
      }),

      // GPT-style sequence packing: concat docs in id order per shard,
      // cut every 2048 BPE-ish tokens; per-doc sequence span.
      "q40_sequence_pack" -> ((s, dir) =>
        graft.curation.Curation.packSequences(
            table(s, dir, "documents"), maxTokens = 2048, nShards = 8)
          .orderBy("doc_id")),

      // The training-output delivery contract: per shard of q40's
      // packing — doc/token/sequence counts, id range, and an
      // order-independent integer content digest (what a resumed job
      // checks instead of re-reading the shard).
      "q153_shard_manifest" -> ((s, dir) =>
        graft.curation.Curation.shardManifest(
            table(s, dir, "documents"), maxTokens = 2048, nShards = 8)
          .orderBy("shard")),

      // The RESUMED-WRITER cell: q153's manifest folded from the
      // memoized landed partial + the batch's own partial — equals the
      // one-shot manifest over the union (the oracle replays it).
      "q162_manifest_incremental" -> ((s, dir) => {
        val docs = table(s, dir, "documents")
        graft.curation.Curation.shardManifestIncrement(
            docs.filter(pmod(col("doc_id"), lit(4L)) =!= 2),
            docs.filter(pmod(col("doc_id"), lit(4L)) === 2),
            maxTokens = 2048, nShards = 8)
          .orderBy("shard")
      }),

      // Quality-aware cluster representatives: q148's retention policy
      // with the kept copy chosen by the trained classifier's margin.
      "q165_quality_rep" -> ((s, dir) =>
        graft.curation.Curation.qualityRepresentatives(
            table(s, dir, "documents"), "src0")
          .orderBy("cluster_id")),

      // Ingest drift alarm: batch head-coverage + head-restricted KL
      // vs the memoized landed head — the distribution monitor in
      // front of the q129/q132 gates.
      "q163_ingest_drift" -> ((s, dir) => {
        val docs = table(s, dir, "documents")
        graft.curation.Curation.ingestDriftReport(
          docs.filter(pmod(col("doc_id"), lit(4L)) =!= 2),
          docs.filter(pmod(col("doc_id"), lit(4L)) === 2))
      }),

      // Gopher-style repetition filters: duplicate-word fraction and the
      // share of bigrams taken by the most frequent bigram, per doc.
      "q41_repetition_stats" -> ((s, dir) =>
        graft.curation.Curation.repetitionStats(table(s, dir, "documents"))
          .orderBy("doc_id")),

      // Benchmark decontamination: docs sharing any word 3-gram with the
      // pseudo-benchmark slice (doc_id % 97 == 0) of the corpus.
      "q42_decontaminate" -> ((s, dir) => {
        val docs = table(s, dir, "documents")
        graft.curation.Curation.contamination(
            docs.filter(col("doc_id") % 97 =!= 0),
            docs.filter(col("doc_id") % 97 === 0), n = 3)
          .orderBy("doc_id")
      }),

      // Incremental decontamination — q42's screen as a production
      // batch operator: the benchmark's distinct-gram hash set is the
      // memoized landed artifact (kind "bench-grams"; it changes on
      // benchmark RELEASES, not per batch), and each incoming batch
      // (here the %5==2 ingest slice, benchmark rows excluded) pays
      // only its own gram explode + one join against the
      // benchmark-sized set. Oracle = the one-shot q42 chain over the
      // same slices — the hash match IS the batch-order-independence
      // proof.
      "q194_decontam_incremental" -> ((s, dir) => {
        val docs = table(s, dir, "documents")
        graft.curation.Curation.contaminationIncrement(
            docs.filter(col("doc_id") % 97 === 0),
            docs.filter(pmod(col("doc_id"), lit(5L)) === 2 &&
              col("doc_id") % 97 =!= 0), n = 3)
          .orderBy("doc_id")
      }),

      // Length-curriculum ordering: (bucket asc, hash60(seed:id)) via
      // the q47 two-level numbering — short-to-long schedule with a
      // seeded intra-bucket shuffle, reproducible on any cluster.
      "q181_length_curriculum" -> ((s, dir) =>
        graft.curation.Curation.lengthCurriculum(
            table(s, dir, "documents"), nBuckets = 8, seed = 42L)
          .orderBy("pos")),

      // No-split packing report: per length class, docs / k-per-seq /
      // sequences / padding / utilization under length-bucketed
      // packing at 512 tokens — the SFT packing-efficiency dial.
      "q178_bucketed_pack" -> ((s, dir) =>
        graft.curation.Curation.bucketedPackReport(
            table(s, dir, "documents"), maxTokens = 512)
          .orderBy("len")),

      // Cross-source LM matrix: per (eval, train) pair, eval bigram
      // coverage under the train LM + covered tokens' summed micro-ln
      // log-prob — the domain-similarity dial for mixture design.
      "q173_cross_source_lm" -> ((s, dir) =>
        graft.curation.Curation.crossSourceLmMatrix(
            table(s, dir, "documents"))
          .orderBy("e_src", "t_src")),

      // q173's incremental cell: landed per-source bigram partials
      // memoized, batch tokenized fresh, matrix = the fold over the
      // union — oracle is the ONE-SHOT matrix over landed∪batch, so
      // the hash match IS the merge proof.
      "q182_xsource_lm_incremental" -> ((s, dir) => {
        val docs = table(s, dir, "documents")
        graft.curation.Curation.crossSourceLmIncrement(
            docs.filter(pmod(col("doc_id"), lit(4L)) =!= 2),
            docs.filter(pmod(col("doc_id"), lit(4L)) === 2))
          .orderBy("e_src", "t_src")
      }),

      // Docs↔embeddings referential-integrity gate: the %7 doc slice
      // and %11 vector slice are dropped so unembedded docs AND
      // orphan vectors both exist deterministically.
      "q172_embedding_coverage" -> ((s, dir) =>
        graft.curation.Curation.embeddingCoverage(
            table(s, dir, "documents")
              .filter(pmod(col("doc_id"), lit(7L)) =!= 3),
            table(s, dir, "embeddings")
              .filter(pmod(col("vec_id"), lit(11L)) =!= 5))
          .orderBy("source")),

      // Corpus release diff: old = corpus minus the %17 slice with the
      // %13 slice truncated (simulated edits), new = corpus minus the
      // %19 slice — per (source, status) doc counts + token movement.
      "q168_snapshot_diff" -> ((s, dir) => {
        val docs = table(s, dir, "documents")
        val old = docs.filter(col("doc_id") % 17 =!= 3)
          .withColumn("text", when(col("doc_id") % 13 === 5,
            substring(col("text"), 1, 20)).otherwise(col("text")))
        val nw = docs.filter(col("doc_id") % 19 =!= 7)
        graft.curation.Curation.snapshotDiff(old, nw)
          .orderBy("source", "status")
      }),

      // Corpus vocabulary: top-100 tokens by frequency with document
      // frequency; lexicographic tie-break makes the cut reproducible.
      "q44_vocab_topk" -> ((s, dir) =>
        graft.curation.Curation.vocabTopK(table(s, dir, "documents"), k = 100)
          .orderBy("rank")),

      // Exact doc-length percentiles per source by integer rank selection
      // (basis points, rank = (bp·n+9999) div 10000 — no float ranks).
      "q45_length_percentiles" -> ((s, dir) =>
        graft.curation.Curation.distributionStats(table(s, dir, "documents"),
            "source", "n_chars", "doc_id", Seq(5000, 9000, 9900))
          .orderBy("source", "pct")),

      // TF-IDF keyword extraction: top-5 scoring tokens per document
      // (raw tf × micro-unit-quantized ln(N/df), ties lexicographic).
      "q50_tfidf_topterms" -> ((s, dir) =>
        graft.curation.Curation.tfidfTopTerms(table(s, dir, "documents"), k = 5)
          .orderBy("doc_id", "rank")),

      // Percentile-rank normalization of doc length within each source —
      // the feature-scaling step before cross-source thresholds can be
      // compared ((rank-1)/(n-1), exact integers over integers, one
      // IEEE division).
      "q67_percentile_normalize" -> ((s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
        table(s, dir, "documents")
          .select("doc_id", "source", "n_chars")
          .withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(Window.partitionBy("source")))
          .select(col("doc_id"), col("source"), col("n_chars"),
            when(col("cnt") > 1,
              (col("rn") - 1).cast("double") / (col("cnt") - 1))
              .otherwise(lit(0.0)).as("len_pctile"))
          .orderBy("doc_id")
      }),

      // N-gram novelty: the fraction of a doc's distinct trigrams that
      // appear in NO other document (df == 1) — high novelty separates
      // genuinely fresh text from recombined boilerplate. Same inverted
      // shingle-hash index as the dedup family; df folds the gram table.
      // 60-bit gram-hash df join shared with the scale benches —
      // see [[graft.curation.Curation.noveltyStats]]
      "q68_ngram_novelty" -> ((s, dir) =>
        graft.curation.Curation.noveltyStats(table(s, dir, "documents"))
          .orderBy("doc_id")),

      // Temperature-scaled mixture (α = 0.5): strata sampled ∝ √count —
      // flattens the source mix toward uniform at an expected 25% of
      // the corpus; integer-quantized weights keep it engine-exact.
      "q66_temperature_mix" -> ((s, dir) =>
        graft.curation.Curation.temperatureSample(
            table(s, dir, "documents").select("doc_id", "source"),
            "source", col("doc_id").cast("string"), targetFrac = 0.25)
          .orderBy("doc_id")),

      // Token-budget selection: best-quality docs per source until the
      // 800-token quota fills — the greedy mixture-assembly step.
      "q63_token_budget" -> ((s, dir) => {
        val docs = table(s, dir, "documents")
        val feat = docs.select(col("doc_id") +: col("source") +:
          TextFunctions.qualityFeatures(col("text")): _*)
        graft.curation.Curation.tokenBudgetSelect(feat, "source",
            col("quality_score"), col("n_tokens"), lit(800L))
          .orderBy("source", "rank_in_stratum")
      }),

      // One-row corpus health report — the composed summary a pipeline
      // owner checks before a training run: volume, exact-dup rate,
      // language mix, exact median length, vocabulary size. Three
      // aggregation subplans (row-shaped stats fused into ONE pass;
      // vocabulary needs the exploded token shape; the median needs the
      // length histogram) — at scale, cache the (text, n_chars)
      // projection or run the report off an already-materialized stats
      // table so the scans share one read.
      "q61_corpus_report" -> ((s, dir) => {
        val docs = table(s, dir, "documents")
        val stats = docs.agg(
          count(lit(1)).as("n_docs"),
          count_distinct(TextFunctions.fingerprint(col("text")))
            .as("n_distinct_texts"),
          sum(when(TextFunctions.langId(col("text")) === "en", 1L)
            .otherwise(0L)).as("n_english"))
        val vocab = docs
          .select(explode(TextFunctions.tokens(col("text"))).as("t"))
          .agg(count_distinct(col("t")).as("vocab_size"))
        // exact corpus median WITHOUT a corpus-wide sort: cumulative
        // counts over the VALUE HISTOGRAM (|distinct lengths| rows — an
        // aggregate-sized input), then the smallest value whose
        // cumulative count reaches rank ceil(n/2). Same selected value
        // as q45's row-rank form, in the shape that survives 100 TB.
        val w = org.apache.spark.sql.expressions.Window.orderBy("n_chars")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        val med = docs.groupBy("n_chars").agg(count(lit(1)).as("c"))
          .withColumn("cum", sum(col("c")).over(w))
          .crossJoin(docs.agg(count(lit(1)).as("n")))
          .filter(col("cum") >= expr("(5000 * n + 9999) div 10000"))
          .agg(min(col("n_chars")).as("median_n_chars"))
          // an ungrouped agg always yields one row; on an EMPTY corpus
          // that row is (null) while the oracle's rank filter yields no
          // rows — drop the null so both sides agree at zero rows
          .filter(col("median_n_chars").isNotNull)
        stats.crossJoin(vocab).crossJoin(med)
          .select(col("n_docs"),
            (col("n_docs") - col("n_distinct_texts")).as("n_exact_dups"),
            col("n_english"), col("vocab_size"), col("median_n_chars"))
      }),

      // Corpus-bigram LM scoring: mean log P(b|a) per document under the
      // corpus MLE bigram model (cheap fluency/outlier signal).
      "q55_bigram_logprob" -> ((s, dir) =>
        graft.curation.Curation.bigramLogProb(table(s, dir, "documents"))
          .orderBy("doc_id")),

      // Fixed-stride chunking (500-char chunks every 400): no shuffle,
      // arithmetic boundaries, fingerprint instead of payload.
      "q51_chunk_docs" -> ((s, dir) =>
        graft.curation.Chunker.chunk(table(s, dir, "documents"),
            size = 500, stride = 400)
          .orderBy("doc_id", "chunk_id")),

      // The composed curation pipeline a training-data user actually runs:
      // exact-dedup survivors → quality scoring → language filter. One
      // dataflow, three operators, no intermediate materialization.
      "q36_curation_pipeline" -> ((s, dir) => {
        val docs = table(s, dir, "documents")
        val kept = Dedup.exact(docs).select(col("keep_id").as("doc_id"))
        docs.join(kept, "doc_id")
          .select(col("doc_id") +:
            TextFunctions.qualityFeatures(col("text")) :+
            TextFunctions.langId(col("text")).as("lang_id"): _*)
          .filter(col("quality_score") >= lit(0.25) && col("lang_id") === "en")
          .select("doc_id", "n_tokens", "quality_score")
          .orderBy("doc_id")
      }),

      // BM25 lexical retrieval: top-5 documents per query over the
      // corpus inverted index — the lexical face of the similarity
      // family (the ANN queries are its dense face). Scores follow
      // Robertson/Spärck Jones BM25 (k1 = 1.2, b = 0.75) with each
      // per-term score quantized to integer micro-units before the
      // per-doc sum (the q55 device: float addition is
      // order-dependent, integer addition is not, and the 1e-6
      // quantum absorbs any last-bit ln() divergence between
      // engines). Shape at scale: tf/df/dl are corpus-keyed hash
      // aggregates, the query list is a broadcast literal, and top-k
      // is a per-query window — no corpus self-join anywhere.
      "q71_bm25_topk" -> ((s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val sp = s; import sp.implicits._
        val tok = table(s, dir, "documents")
          .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("tok"))
        val tf = tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_len"))
        val dfr = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        val qs = Seq((1, "table"), (1, "join"), (1, "spark"),
          (2, "window"), (2, "stream"),
          (3, "hash"), (3, "merge"), (3, "sort")).toDF("query_id", "tok")
        val scored = qs
          .join(tf, "tok").join(dfr, "tok").join(dl, "doc_id")
          .crossJoin(broadcast(stats)) // one-row stats: fused scan, not a blowup
          .withColumn("idf",
            log((col("n_docs").cast("double") - col("df") + lit(0.5)) /
              (col("df") + lit(0.5)) + lit(1.0)))
          .withColumn("s_e6", round(
            col("idf") * (col("tf") * lit(2.2)) /
              (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") /
                (col("total_len").cast("double") / col("n_docs"))))
              * lit(1000000)).cast("long"))
          .groupBy("query_id", "doc_id")
          .agg(sum("s_e6").as("score_e6"))
        val w = Window.partitionBy("query_id")
          .orderBy(col("score_e6").desc, col("doc_id"))
        scored.withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 5)
          .select("query_id", "rnk", "doc_id", "score_e6")
          .orderBy("query_id", "rnk")
      }),

      // Hybrid lexical+semantic retrieval: q71's BM25 and q21's exact
      // cosine ranks fused by reciprocal rank (⌊1e9/(60+rank)⌋ summed
      // — integer floor division, exact in both engines); query = each
      // ≡0-mod-100 doc via its 8 rarest tokens (lexical) and its
      // embedding row (semantic).
      "q187_hybrid_rrf" -> ((s, dir) =>
        graft.curation.Curation.hybridRrfTopK(
            table(s, dir, "documents"), table(s, dir, "embeddings"))
          .orderBy("q_id", "rnk")),

      // Hybrid retrieval SERVED from the landed indexes — the shape a
      // deployment runs: BM25 probes the memoized bm25-stats kind, the
      // semantic side probes the memoized IVF-PQ index (routed
      // assignment + PQ codes, q158's kinds on the full corpus) with
      // probe→ADC→exact-rerank per query; only the RRF fusion is fresh
      // work. Same fixture as q187 (query = each ≡0-mod-100 doc), so
      // the two rows together price brute-scan vs served retrieval.
      "q192_hybrid_served" -> ((s, dir) =>
        graft.curation.Curation.hybridRrfTopKServed(
            table(s, dir, "documents"), table(s, dir, "embeddings"))
          .orderBy("q_id", "rnk")),

      // Serving-quality audit of the served hybrid: per query,
      // overlap@5 of the index-served fusion vs the brute-force fusion
      // in exact ppm — the q145/q159 audit pattern applied to
      // retrieval; the dial an operator reads after an ANN parameter
      // change or a q193 codebook rebuild.
      "q195_hybrid_audit" -> ((s, dir) =>
        graft.curation.Curation.hybridServedAudit(
            table(s, dir, "documents"), table(s, dir, "embeddings"))
          .orderBy("q_id")),

      // CONTINUOUS SERVING, oracle-checked — the query-side twin of
      // the q190 streaming gate: q192's query set (each ≡0-mod-100
      // doc, carrying its own text + embedding as a retrieval request)
      // replayed through RetrieveStream.attach in three deterministic
      // micro-batches (q_id % 3). Queries are INDEPENDENT — unlike the
      // gate, whose within-batch dup evidence forced a staged oracle —
      // so the union of the per-trigger outputs equals the one-shot
      // batch serve and q192's oracle applies VERBATIM: the hash match
      // proves the stream face introduces no batch-boundary effects.
      // The MemoryStream feed is the replay harness, not a data path;
      // the landed kinds are registry-memoized and reused trigger over
      // trigger (serving creates no per-trigger registry entries).
      "q198_streaming_serve" -> ((s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val emb = table(s, dir, "embeddings")
        val qd = docs.filter(pmod(col("doc_id"), lit(100L)) === 0)
          .select("doc_id", "text")
          .as[(Long, String)].collect().sortBy(_._1)
        val qe = emb.filter(pmod(col("vec_id"), lit(100L)) === 0)
          .select("vec_id", "embedding")
          .as[(Long, Seq[Float])].collect().toMap
        val records = qd.toSeq.flatMap { case (id, text) =>
          qe.get(id).map(e => (id, text, e)) }
        val input = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, String, Seq[Float])](s)
        val stream = input.toDF().toDF("doc_id", "text", "embedding")
        val got =
          scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        val q = graft.streaming.RetrieveStream.attach(
          stream, docs, emb) { (_, v) =>
          val rows = v.select("q_id", "rnk", "doc_id", "rrf_e9")
            .as[(Long, Long, Long, Long)].collect()
          got.synchronized { got ++= rows }
          ()
        }
        try {
          records.groupBy(_._1 % 3).toSeq.sortBy(_._1)
            .foreach { case (_, rs) =>
              input.addData(rs.sortBy(_._1))
              q.processAllAvailable()
            }
        } finally q.stop()
        got.toSeq.toDF("q_id", "rnk", "doc_id", "rrf_e9")
          .orderBy("q_id", "rnk")
      }),

      // Lexicon scrub: denylist redaction with token-equality
      // semantics (the corpus tokenizer's own split — a term never
      // bleeds into a larger word) + the per-doc hit count as the
      // audit column. The regex/PII face (redactPatterns) rides the
      // same machinery and is spec-pinned on planted fixtures — the
      // synthetic corpus carries no PII by construction.
      "q203_lexicon_scrub" -> ((s, dir) =>
        graft.curation.Curation.scrubReport(
            table(s, dir, "documents"),
            Seq("customer", "vector", "spark"))
          .orderBy("doc_id")),

      // Head-vocabulary coverage: the share of all token occurrences
      // the top-k vocabulary entries cover, at k = 1/5/10/25 — the
      // tokenizer-sizing curve (how big must the vocab be before OOV
      // is rare). Scale shape: on a 100 TB web corpus the RAW-token
      // vocabulary is itself corpus-scale (typo/unicode tail), so no
      // stage may rank it globally. The only corpus-sized work here is
      // one hash aggregate (token counts, memoized); the head is
      // `orderBy … limit 25` — Catalyst plans TakeOrderedAndProject
      // (per-partition heap, k·partitions rows to the driver, never a
      // global sort); the grand total is a one-row aggregate over the
      // same memoized counts; and the cumulative curve is folded over
      // the 25 head rows on the driver (bounded by the constant k).
      "q70_vocab_coverage" -> ((s, dir) => {
        val counts = graft.util.CacheRegistry.cache(
          graft.util.CacheRegistry.key(table(s, dir, "documents"), "q70tokcnt"),
          table(s, dir, "documents")
            .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("cnt")))
        val head = counts.orderBy(col("cnt").desc, col("tok")).limit(25)
          .collect().map(r => (r.getString(0), r.getLong(1)))
          .sortBy { case (tok, cnt) => (-cnt, tok) } // re-assert head order
        // sum() over zero rows is NULL — coalesce so an empty corpus
        // yields an empty curve instead of an NPE on getLong
        val total = counts.agg(coalesce(sum(col("cnt")), lit(0L))
            .cast("long").as("t"))
          .first().getLong(0)
        val ks = Set(1, 5, 10, 25)
        var cum = 0L
        val rows: Vector[(Long, Long, Long, Double)] =
          if (total == 0L) Vector.empty
          else head.iterator.zipWithIndex.flatMap { case ((_, cnt), i) =>
            cum += cnt
            if (ks(i + 1)) Some(((i + 1).toLong, cum, total, cum.toDouble / total))
            else None
          }.toVector
        import s.implicits._
        rows.toDF("k", "covered", "total", "coverage").orderBy("k")
      }),

      // PII redaction audit: the synthetic corpus carries no natural
      // PII, so the query plants a deterministic email + IP + phone
      // per document (same string arithmetic on both sides) and then
      // redacts — every row exercises all three patterns, and the
      // md5 of the full redacted text makes ANY regex-semantics
      // divergence between engines a hash failure, not a silent
      // partial match. One scan, no shuffle (the redaction is pure
      // codegen'd column work; only the final presentation sort
      // exchanges).
      "q82_pii_redaction" -> ((s, dir) => {
        val salted = table(s, dir, "documents").select(col("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com or 10."),
            pmod(col("doc_id"), lit(256L)).cast("string"),
            lit(".0."), pmod(col("doc_id"), lit(200L)).cast("string"),
            lit(" call 555-"),
            lpad(pmod(col("doc_id"), lit(1000L)).cast("string"), 3, "0"),
            lit("-1234 done")).as("text"))
        graft.curation.Curation.redactPii(salted)
          .select(col("doc_id"),
            col("n_emails").cast("long").as("n_emails"),
            col("n_ips").cast("long").as("n_ips"),
            col("n_phones").cast("long").as("n_phones"),
            md5(col("text")).as("red_md5"))
          .orderBy("doc_id")
      }),

      // LM quality filter: bottom 10% of each source by corpus-bigram
      // mean log-probability (q55's exact integer scores), flagged by
      // per-stratum integer rank selection — the CCNet/Gopher quality
      // cut with the corpus LM standing in for the real one.
      "q89_perplexity_filter" -> ((s, dir) =>
        graft.curation.Curation.perplexityFlag(table(s, dir, "documents"),
            cutBp = 1000)
          .orderBy("doc_id")),

      // Mixture rebalancing: per-source natural token share vs a uniform
      // target at the corpus's own budget, and the ×1e6 sampling weight
      // realizing it — all BIGINT `div` arithmetic, bit-identical
      // everywhere.
      "q90_mixture_weights" -> ((s, dir) =>
        graft.curation.Curation.mixtureWeights(table(s, dir, "documents"))
          .orderBy("source")),

      // q89's production twin (the q74 device over the quality cut):
      // the per-source cut threshold comes from the mergeable
      // percentile sketch over avg_logp — no rank window, no
      // single-reducer stratum — and the verdict pins the sketch
      // threshold inside its declared rank-error band: with lt/le the
      // counts strictly-below/at-or-below the threshold, ok = 1 iff
      // lt+1 ≤ 0.1·n + tol AND le ≥ 0.1·n − tol (tie-robust: a run of
      // equal scores straddling the cut widens le−lt, not the verdict).
      // An out-of-band sketch hash-fails against the oracle's ok=1.
      "q91_perplexity_sketch_cut" -> ((s, dir) => {
        import graft.curation.Curation
        val docs = table(s, dir, "documents")
        // derives from the SAME registry-persisted scored projection as
        // q89 (kind "ppl-scored"): the LM chain runs once for the whole
        // perplexity family, and this harness's two branches (sketch +
        // verdict aggregate) read the cache instead of re-scoring
        val scored = Curation.perplexityScored(docs)
          .select(col("source"), col("avg_logp").as("v"))
        val ap = Curation.approxDistributionStats(scored, "source", "v",
          Seq(1000), accuracy = 1000)
        val target = lit(0.1) * col("n")
        val tol = lit(2.0) * col("n") / lit(1000) + lit(1.0)
        scored.join(broadcast(ap), "source")
          .groupBy("source")
          .agg(count(lit(1)).as("n"),
            sum(when(col("v") <= col("value"), 1L).otherwise(0L)).as("le"),
            sum(when(col("v") < col("value"), 1L).otherwise(0L)).as("lt"))
          .select(col("source"), col("n"),
            when((col("lt") + 1).cast("double") <= target + tol &&
                 col("le").cast("double") >= target - tol, 1L)
              .otherwise(0L).as("ok"))
          .orderBy("source")
      }),

      // Ingest-robustness face of q85: a JSONL drop with deterministic
      // planted corruption (every doc_id % 20 == 0 line prefixed into
      // invalid JSON) read back PERMISSIVE — per-source good counts
      // plus the __malformed__ count. The oracle derives the same
      // numbers from the plant rule, so a parser that silently drops
      // or mis-attributes lines hash-fails.
      "q93_jsonl_malformed_rate" -> ((s, dir) => {
        import graft.sources.Tables
        // keyed by the DATA DIR too (review finding): one session
        // building q93 against two sf dirs must not clobber the first
        // write and hand the lazily-read frame wrong-scale data
        val dirKey = java.lang.Long.toHexString(
          dir.hashCode.toLong & 0xffffffffL)
        val tmp = s"/tmp/graft_${s.sparkContext.applicationId}/" +
          s"jsonl_corrupt_$dirKey/documents"
        registerTmpCleanup(
          new java.io.File(s"/tmp/graft_${s.sparkContext.applicationId}"))
        val line = to_json(struct(col("doc_id"), col("source"), col("text")))
        table(s, dir, "documents")
          .select(when(pmod(col("doc_id"), lit(20L)) === 0,
              concat(lit("{oops "), line)).otherwise(line).as("value"))
          .write.mode("overwrite").text(tmp)
        Tables.jsonlIngestStats(s, tmp,
            "doc_id LONG, source STRING, text STRING")
          .orderBy("source")
      }),

      // Gopher-style composite quality gate: reason bitmask + keep
      // verdict, all comparisons integer cross-multiplication so the
      // verdict can never flip on float rounding at a threshold.
      "q94_quality_gate" -> ((s, dir) =>
        graft.curation.Curation.qualityGate(table(s, dir, "documents"))
          .orderBy("doc_id")),

      // Per-source unigram KL vs the corpus over the head-200
      // vocabulary: the content-distance mixture diagnostic. Integer
      // micro-unit ln sums (q50's device); the numerator ships
      // undivided because Spark `div` truncates while DuckDB `//`
      // floors on negatives.
      "q95_source_unigram_kl" -> ((s, dir) =>
        graft.curation.Curation.sourceUnigramKL(
            table(s, dir, "documents"), headV = 200)
          .orderBy("source")),

      // PMI collocations over the corpus: all-integer micro-unit-ln
      // chain, rare-pair floor applied before ranking.
      "q97_pmi_collocations" -> ((s, dir) =>
        graft.curation.Curation.pmiTopK(table(s, dir, "documents"),
            k = 25, minCount = 5)
          .orderBy(desc("pmi_e6"), asc("bigram"))),

      // Mergeable-partials face of q90: the mixture report computed by
      // FOLDING two slice partials (mod-2 split) — the incremental
      // path that never rescans landed data. The oracle is the
      // one-shot full-corpus computation: merge ≡ recompute, proven
      // by hash.
      "q104_mixture_merge" -> ((s, dir) => {
        import graft.curation.Curation
        val docs = table(s, dir, "documents")
        val pa = Curation.mixturePartials(
          docs.filter(pmod(col("doc_id"), lit(2L)) === 0))
        val pb = Curation.mixturePartials(
          docs.filter(pmod(col("doc_id"), lit(2L)) === 1))
        Curation.mixtureFromPartials(pa.union(pb)).orderBy("source")
      }),

      // Deterministic hash-banded train/val/test assignment, reported
      // as per-(source, split) counts — membership is a pure function
      // of doc_id, so growing the corpus never reassigns a doc.
      "q106_three_way_split" -> ((s, dir) =>
        graft.curation.Curation.threeWaySplit(table(s, dir, "documents"))
          .groupBy("source", "split").agg(count(lit(1)).as("n_docs"))
          .orderBy("source", "split")),

      // Per-source log2 token-length histogram — integer-binary bucket
      // (length of bin(n)), immune to float-log boundary flips.
      "q107_token_length_histogram" -> ((s, dir) =>
        graft.curation.Curation.tokenLengthHistogram(
            table(s, dir, "documents"))
          .orderBy("source", "bucket")),

      // BPE merge learning (tokenizer training): 8 rounds of
      // most-frequent-adjacent-pair count + greedy merge over the
      // word-frequency dict, ties on (count desc, lhs, rhs); the
      // per-step vocab digest pins every intermediate segmentation
      // state, so the hash match proves the whole merge sequence.
      "q113_bpe_merges" -> ((s, dir) =>
        graft.curation.Bpe.bpeMerges(table(s, dir, "documents"), steps = 8)
          .orderBy("step")),

      // BPE apply face: segment the corpus with q113's learned merges,
      // fold per-source fertility (subwords/word ×1e6) and compression
      // vs the pre-merge character segmentation — exact-integer ppm.
      "q115_bpe_segment_stats" -> ((s, dir) =>
        graft.curation.Bpe.bpeSegmentStats(table(s, dir, "documents"),
            steps = 8)
          .orderBy("source")),

      // Per-source curation funnel (the corpus "data card"): each doc
      // attributed to the FIRST rejecting stage — q116's dedup lattice,
      // then q94's quality gate, then q89's perplexity cut — doc and
      // token counts per (source, stage), all exact integers.
      "q120_curation_funnel" -> ((s, dir) =>
        graft.curation.Curation.curationFunnel(
            table(s, dir, "documents"), table(s, dir, "embeddings"))
          .orderBy("source", "stage")),

      // DSIR importance resampling (Xie et al. 2023): hashed-unigram
      // (V=1024) log importance weights vs the src0 target
      // distribution in micro-ln integers, per-source top-20%
      // selection by integer rank — the data-selection stage between
      // dedup and mixture.
      "q121_dsir_select" -> ((s, dir) =>
        graft.curation.Curation.dsirSelect(
            table(s, dir, "documents"), "src0")
          .orderBy("doc_id")),

      // Trained quality classifier (the fastText-style filter of
      // CCNet/LLaMA pipelines): logistic regression over 64 hashed-
      // unigram buckets + bias, 3 full-batch GD rounds with exact
      // integer gradients (the one float op — sigma — is e6-rounded
      // immediately), label = "is src0". Oracle replays the identical
      // unrolled rounds, pinning every intermediate weight table.
      "q123_quality_classifier" -> ((s, dir) =>
        graft.curation.Curation.qualityClassifier(
            table(s, dir, "documents"), "src0")
          .orderBy("doc_id")),

      // Reliability diagram for q123's scores: fixed-width z bins,
      // empirical positive rate vs mean predicted probability, gap in
      // ppm — the audit run before anyone thresholds on the score.
      // Pairwise agreement matrix between the three quality-filter
      // policies (RAW flags, no funnel precedence): heuristic gate,
      // perplexity decile cut, trained classifier — q157's dial for
      // the curation side of the funnel.
      "q161_filter_agreement" -> ((s, dir) =>
        graft.curation.Curation.filterMethodAgreement(
            table(s, dir, "documents"), "src0")
          .orderBy("m1", "m2")),

      "q154_classifier_calibration" -> ((s, dir) =>
        graft.curation.Curation.classifierCalibration(
            table(s, dir, "documents"), "src0")
          .orderBy("bin")),

      // Exact AUC + accuracy of q123's trained scores — Mann–Whitney
      // rank-sum over the score value histogram (ties at half weight,
      // kept integral by doubling), the global cumsum staged two-level
      // so only the tiny block table sees an unpartitioned window.
      "q155_classifier_auc" -> ((s, dir) =>
        graft.curation.Curation.classifierAuc(
          table(s, dir, "documents"), "src0")),

      // Incremental DSIR (the data-selection cell of the incremental
      // matrix): the %4==2 slice arrives as a batch and scores against
      // the LANDED distributions and LANDED per-source thresholds —
      // the landed-codebook principle applied to data selection.
      "q125_dsir_incremental" -> ((s, dir) => {
        val docs = table(s, dir, "documents")
        graft.curation.Curation.dsirScoreIncrement(
          docs.filter(pmod(col("doc_id"), lit(4L)) =!= 2),
          docs.filter(pmod(col("doc_id"), lit(4L)) === 2), "src0")
          .orderBy("doc_id")
      }),

      // Interpolated Kneser-Ney bigram scoring (D=3/4): the smoothed
      // LM next to q55's MLE — with the 3/4 discount every probability
      // is an exact integer ratio, so the whole model replays in
      // micro-ln integers.
      "q126_kneser_ney" -> ((s, dir) =>
        graft.curation.Curation.kneserNeyLogProb(table(s, dir, "documents"))
          .orderBy("doc_id")),

      // Incremental perplexity cut — the LM cell of the incremental
      // matrix: the %5==2 slice scores under the LANDED bigram LM
      // only (unseen bigrams carry no landed evidence and drop) and
      // flags against the LANDED per-source boundary ratio by exact
      // integer cross-multiplication.
      "q131_ppl_incremental" -> ((s, dir) => {
        val docs = table(s, dir, "documents")
        graft.curation.Curation.perplexityFlagIncrement(
          docs.filter(pmod(col("doc_id"), lit(5L)) =!= 2),
          docs.filter(pmod(col("doc_id"), lit(5L)) === 2))
          .orderBy("doc_id")
      }),

      // Mergeable retrieval-index partials (the index-update cell):
      // per-slice (token, df) + doc-count sentinel rows merged by
      // union, all docs scored under the folded index — the oracle is
      // the ONE-SHOT q50 TF-IDF, proving df/N additivity.
      "q137_tfidf_merge" -> ((s, dir) => {
        val docs = table(s, dir, "documents")
        val pa = graft.curation.Curation.retrievalPartials(
          docs.filter(pmod(col("doc_id"), lit(2L)) === 0))
        val pb = graft.curation.Curation.retrievalPartials(
          docs.filter(pmod(col("doc_id"), lit(2L)) === 1))
        graft.curation.Curation.tfidfTopTermsFromPartials(
          pa.unionByName(pb), docs, 5)
          .withColumnRenamed("rank", "rnk")
          .orderBy("doc_id", "rnk")
      }),

      // Mergeable count-min partials (the sketch-update cell): cell
      // tables from the two %2 slices merged by union+sum, the exact
      // top-25 audit re-probed against the folded sketch — the oracle
      // is the ONE-SHOT q87 sketch, so the hash match proves the
      // cell-additivity the sketch family's 100 TB story rests on.
      "q136_cms_merge" -> ((s, dir) => {
        val docs = table(s, dir, "documents")
        val pa = graft.curation.Curation.cmsPartials(
          docs.filter(pmod(col("doc_id"), lit(2L)) === 0))
        val pb = graft.curation.Curation.cmsPartials(
          docs.filter(pmod(col("doc_id"), lit(2L)) === 1))
        graft.curation.Curation.countMinTopKFromPartials(
          pa.unionByName(pb), docs, 25)
          .orderBy(desc("freq"), asc("token"))
      }),

      // Mergeable LM partials (the model-update cell): bigram counts
      // from the two %2 slices merged by union, all docs scored under
      // the folded model — the oracle is the ONE-SHOT corpus LM
      // (q55's SQL verbatim), so the hash match IS the mergeability
      // proof, the q104 pattern applied to the model itself.
      "q135_lm_merge" -> ((s, dir) => {
        val docs = table(s, dir, "documents")
        val pa = graft.curation.Curation.lmPartials(
          docs.filter(pmod(col("doc_id"), lit(2L)) === 0))
        val pb = graft.curation.Curation.lmPartials(
          docs.filter(pmod(col("doc_id"), lit(2L)) === 1))
        graft.curation.Curation.bigramLogProbFromPartials(
          pa.unionByName(pb), docs)
          .orderBy("doc_id")
      }),

      // Mergeable gradient partials (the distributed-training cell):
      // the classifier fit data-parallel over the two %2 slices — each
      // GD round folds per-slice integer gradient partials by plain
      // sum, which IS the full-corpus gradient at the frozen weights,
      // so the weight trajectory and every score are bit-identical to
      // the one-shot fit. Oracle = q123's unrolled replay verbatim;
      // the hash match is the data-parallelism proof.
      "q138_qc_merge" -> ((s, dir) => {
        val docs = table(s, dir, "documents")
        graft.curation.Curation.qualityClassifierFromParts(
          Seq(docs.filter(pmod(col("doc_id"), lit(2L)) === 0),
            docs.filter(pmod(col("doc_id"), lit(2L)) === 1)), "src0")
          .orderBy("doc_id")
      }),

      // Incremental BPE apply — the tokenizer cell of the incremental
      // matrix: merges learned from the LANDED slice only; the %5==2
      // batch segments under them FROM CHARACTERS, so unseen batch
      // words still segment (the dict join would drop them).
      "q134_bpe_incremental" -> ((s, dir) => {
        val docs = table(s, dir, "documents")
        graft.curation.Bpe.bpeSegmentStatsIncrement(
          docs.filter(pmod(col("doc_id"), lit(5L)) =!= 2),
          docs.filter(pmod(col("doc_id"), lit(5L)) === 2), steps = 8)
          .orderBy("source")
      }),

      // Drift-triggered tokenizer RETRAIN policy — the q197 control
      // loop applied to the BPE artifact: measure the batch's
      // fertility under the frozen landed merge table against the
      // landed corpus's own memoized baseline, trip on positive drift,
      // and either retrain over the grown corpus + publish the merge
      // table as a release + serve through the pin, or serve the
      // frozen q134 face publishing nothing. The oracle replays
      // measure + decide + BOTH serve chains with the final select
      // gated on the decision scalar — whichever branch the data
      // picks, Spark and DuckDB pick it together.
      "q207_tokenizer_policy" -> ((s, dir) => {
        val docs = table(s, dir, "documents")
        graft.curation.Bpe.tokenizerRebuildPolicy(
          docs.filter(pmod(col("doc_id"), lit(5L)) =!= 2),
          docs.filter(pmod(col("doc_id"), lit(5L)) === 2),
          docs, "tok-rel-1", maxDriftE6 = 0L, steps = 8)
          .orderBy("source")
      }),

      // Drift-triggered classifier RETRAIN policy — the q197/q207
      // control loop applied to the trained quality filter: the
      // batch's pass rate under the FROZEN landed weights vs the
      // landed corpus's own memoized baseline; |drift| over the bound
      // trips retrain-over-grown + publish the weight release + score
      // through the pin, else the frozen score publishing nothing.
      // The oracle replays two full unrolled GD chains and gates the
      // served rows on the decision scalar.
      "q208_classifier_policy" -> ((s, dir) => {
        val docs = table(s, dir, "documents")
        graft.curation.Curation.classifierRebuildPolicy(
          docs.filter(pmod(col("doc_id"), lit(4L)) =!= 2),
          docs.filter(pmod(col("doc_id"), lit(4L)) === 2),
          docs, "src0", "qc-rel-1", maxDriftPpm = 10000L)
          .orderBy("doc_id")
      }),
    )
  }

  /** q173's one-shot SQL, shared verbatim with q182 (whose input
    * slices union back to the full corpus — the oracle IS the merge
    * proof). */
  protected lazy val xsourceLmOracle: String =
    """WITH t AS (SELECT source src,
                      regexp_split_to_array(trim(text), '\s+') tk
                    FROM documents),
          bg AS (SELECT src, unnest(list_transform(range(1, len(tk)),
                   i -> array_to_string(tk[i:i+1], ' '))) g FROM t),
          bi AS (SELECT src, g, CAST(COUNT(*) AS BIGINT) cnt
                 FROM bg GROUP BY 1, 2),
          ctx AS (SELECT src, split_part(g, ' ', 1) a,
                    CAST(SUM(cnt) AS BIGINT) n_a
                  FROM bi GROUP BY 1, 2),
          lm AS (SELECT bi.src t_src, bi.g,
                   CAST(round(ln(CAST(bi.cnt AS DOUBLE) / ctx.n_a)
                     * 1000000, 0) AS BIGINT) lp
                 FROM bi JOIN ctx ON ctx.src = bi.src
                   AND ctx.a = split_part(bi.g, ' ', 1)),
          tot AS (SELECT src e_src, CAST(SUM(cnt) AS BIGINT) n_eval
                  FROM bi GROUP BY 1),
          cells AS (SELECT e.src e_src, lm.t_src,
                      CAST(SUM(e.cnt) AS BIGINT) n_covered,
                      CAST(SUM(e.cnt * lm.lp) AS BIGINT) sum_logp_e6
                    FROM bi e JOIN lm ON lm.g = e.g
                    GROUP BY 1, 2),
          srcs AS (SELECT DISTINCT src FROM bi)
          SELECT a.src e_src, b.src t_src, tot.n_eval,
                 CAST(COALESCE(c.n_covered, 0) AS BIGINT) n_covered,
                 COALESCE(c.n_covered, 0) * 1000000 // tot.n_eval
                   AS covered_ppm,
                 CAST(COALESCE(c.sum_logp_e6, 0) AS BIGINT) sum_logp_e6
          FROM srcs a CROSS JOIN srcs b
          LEFT JOIN cells c ON c.e_src = a.src AND c.t_src = b.src
          JOIN tot ON tot.e_src = a.src
          ORDER BY e_src, t_src"""

  /** The hybrid-retrieval oracle family (q187/q192): the shared
    * [[hybridChainCtes]] (BM25 + caller-supplied semantic chunk + RRF
    * fusion — hoisted to EntryHelpers so q196's staged
    * gate-then-serve oracle composes the same chain) with the
    * retrieval rows' top-5 final select. */
  protected def hybridOracle(semanticCtes: String): String =
    s"""WITH ${hybridChainCtes(semanticCtes)}
          SELECT q_id, rnk, doc_id, rrf_e9 FROM fr WHERE rnk <= 5
          ORDER BY q_id, rnk"""

  /** The two fused-pipeline oracles, shared by their own rows
    * (q187/q192) and the q195 audit that nests both. */
  protected lazy val hybridBruteOracle: String = hybridOracle(
    """qv AS (SELECT vec_id q_id, embedding::DOUBLE[] qv FROM embeddings
                 WHERE vec_id % 100 = 0),
          cv AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
          annr AS (SELECT q_id, vec_id AS doc_id, rnk FROM (
                     SELECT q_id, vec_id,
                            ROW_NUMBER() OVER (PARTITION BY q_id
                              ORDER BY round(list_dot_product(v, qv) /
                                (sqrt(list_dot_product(v, v)) *
                                 sqrt(list_dot_product(qv, qv))), 4)
                                DESC, vec_id) rnk
                     FROM cv, qv WHERE vec_id != q_id) a WHERE rnk <= 20)""")

  protected lazy val hybridServedOracle: String =
    hybridOracle(servedAnnrCtes())

  protected def curationOracles: Map[String, String] = Map(

    "q14_text_stats" ->
      s"""WITH $tokCte,
          f AS (SELECT doc_id,
                  CAST(len(tk) AS BIGINT) n_tokens,
                  CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT) n_alpha_chars,
                  CAST(len(list_filter(tk, x -> list_contains(
                    ['the','a','an','and','of','to','in','is','on','for','with'], x))) AS BIGINT) n_stop
                FROM toks)
          SELECT doc_id, n_tokens, n_alpha_chars,
                 round(n_alpha_chars::DOUBLE / n_tokens, 6) AS mean_token_len,
                 round(n_stop::DOUBLE / n_tokens, 6) AS stopword_ratio,
                 round((n_stop::DOUBLE / n_tokens) * 0.5 +
                       least((n_alpha_chars::DOUBLE / n_tokens) / 10.0, 1.0) * 0.5, 6)
                   AS quality_score
          FROM f ORDER BY doc_id""",

    "q15_text_langid" ->
      s"""WITH $tokCte,
          c AS (SELECT doc_id,
                  len(list_filter(tk, x -> list_contains(['the','and','of','is'], x))) en,
                  len(list_filter(tk, x -> list_contains(['der','die','und','ist'], x))) de,
                  len(list_filter(tk, x -> list_contains(['el','la','los','es'], x))) es,
                  len(list_filter(tk, x -> list_contains(['le','la','les','est'], x))) fr
                FROM toks)
          SELECT doc_id,
                 CASE WHEN en > 0 AND en >= greatest(en,de,es,fr) THEN 'en'
                      WHEN de > 0 AND de >= greatest(en,de,es,fr) THEN 'de'
                      WHEN es > 0 AND es >= greatest(en,de,es,fr) THEN 'es'
                      WHEN fr > 0 AND fr >= greatest(en,de,es,fr) THEN 'fr'
                      ELSE 'und' END AS lang_id
          FROM c ORDER BY doc_id""",

    "q16_text_fingerprint" ->
      """SELECT doc_id,
                md5(trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))) AS fp
         FROM documents ORDER BY doc_id""",

    // The q15 language CTE + the documented hash60 formula: the keep
    // decision is pure integer arithmetic, so the sample reproduces
    // exactly (rates as per-million thresholds).
    "q39_stratified_sample" ->
      s"""WITH $tokCte,
          c AS (SELECT doc_id,
                  len(list_filter(tk, x -> list_contains(['the','and','of','is'], x))) en,
                  len(list_filter(tk, x -> list_contains(['der','die','und','ist'], x))) de,
                  len(list_filter(tk, x -> list_contains(['el','la','los','es'], x))) es,
                  len(list_filter(tk, x -> list_contains(['le','la','les','est'], x))) fr
                FROM toks),
          l AS (SELECT doc_id,
                 CASE WHEN en > 0 AND en >= greatest(en,de,es,fr) THEN 'en'
                      WHEN de > 0 AND de >= greatest(en,de,es,fr) THEN 'de'
                      WHEN es > 0 AND es >= greatest(en,de,es,fr) THEN 'es'
                      WHEN fr > 0 AND fr >= greatest(en,de,es,fr) THEN 'fr'
                      ELSE 'und' END AS lang_id
                FROM c)
          SELECT doc_id, lang_id FROM l
          WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                  % 1000000
                < CASE WHEN lang_id = 'en' THEN 500000 ELSE 100000 END
          ORDER BY doc_id""",

    // Per-shard running token offset (window cumsum), fixed 2048-token
    // cuts; integer floor-division both sides.
    "q40_sequence_pack" ->
      """WITH t AS (SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
                  CAST(len(regexp_extract_all(lower(text),
                    '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_tokens
                FROM documents),
          f AS (SELECT * FROM t WHERE n_tokens > 0),
          -- CAST: DuckDB's SUM(BIGINT) widens to HUGEINT, which pandas
          -- renders as float64 — pin every derived column to BIGINT
          o AS (SELECT *, CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard
                  ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0) AS BIGINT) AS start_offset FROM f)
          SELECT doc_id, shard, n_tokens, start_offset,
                 CAST(start_offset // 2048 AS BIGINT) AS first_seq,
                 CAST((start_offset + n_tokens - 1) // 2048 AS BIGINT) AS last_seq,
                 CAST((start_offset + n_tokens - 1) // 2048
                   - start_offset // 2048 + 1 AS BIGINT) AS n_seqs
          FROM o ORDER BY doc_id""",

    // Longest equal run in the sorted bigram list = max bigram count;
    // ratios as exact-integer-over-integer doubles on both sides.
    "q41_repetition_stats" ->
      s"""WITH $tokCte,
          base AS (SELECT doc_id, len(tk) AS n, len(list_distinct(tk)) AS nd,
                     list_transform(range(1, len(tk)),
                       i -> array_to_string(tk[i:i+1], ' ')) AS gs
                   FROM toks),
          e AS (SELECT doc_id, unnest(gs) AS g FROM base),
          m AS (SELECT doc_id, MAX(c) AS mx FROM (
                  SELECT doc_id, g, COUNT(*) c FROM e GROUP BY 1, 2)
                GROUP BY doc_id)
          SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_words,
                 CAST(b.n - b.nd AS DOUBLE) / b.n AS dup_word_frac,
                 CASE WHEN b.n >= 2
                   THEN CAST(COALESCE(m.mx, 0) AS DOUBLE) / (b.n - 1)
                   ELSE 0.0 END AS top_bigram_share
          FROM base b LEFT JOIN m ON b.doc_id = m.doc_id
          ORDER BY b.doc_id""",

    // sh = the q18/q19 distinct 3-gram shingle table; hash60 per the
    // documented md5 formula so the join keys match Spark's exactly.
    "q42_decontaminate" ->
      s"""WITH $tokCte, $shingleCte,
          b AS (SELECT DISTINCT
                  ('0x' || substr(md5(shingle), 1, 15))::BIGINT g
                FROM sh WHERE sid % 97 = 0),
          d AS (SELECT sid, ('0x' || substr(md5(shingle), 1, 15))::BIGINT g
                FROM sh WHERE sid % 97 <> 0),
          j AS (SELECT sid, COUNT(*) AS n_grams,
                  SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS hits
                FROM d LEFT JOIN b ON d.g = b.g GROUP BY sid)
          SELECT sid AS doc_id, CAST(n_grams AS BIGINT) AS n_grams,
                 CAST(hits AS BIGINT) AS n_hits,
                 CAST(hits AS DOUBLE) / n_grams AS contamination
          FROM j WHERE hits > 0 ORDER BY doc_id""",

    // q194: the q42 chain with the batch slice narrowed to the %5==2
    // ingest residue (benchmark rows excluded) — the one-shot replay
    // of what the incremental screen computes through the memoized
    // bench-grams artifact.
    "q194_decontam_incremental" ->
      s"""WITH $tokCte, $shingleCte,
          b AS (SELECT DISTINCT
                  ('0x' || substr(md5(shingle), 1, 15))::BIGINT g
                FROM sh WHERE sid % 97 = 0),
          d AS (SELECT sid, ('0x' || substr(md5(shingle), 1, 15))::BIGINT g
                FROM sh WHERE sid % 5 = 2 AND sid % 97 <> 0),
          j AS (SELECT sid, COUNT(*) AS n_grams,
                  SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS hits
                FROM d LEFT JOIN b ON d.g = b.g GROUP BY sid)
          SELECT sid AS doc_id, CAST(n_grams AS BIGINT) AS n_grams,
                 CAST(hits AS BIGINT) AS n_hits,
                 CAST(hits AS DOUBLE) / n_grams AS contamination
          FROM j WHERE hits > 0 ORDER BY doc_id""",

    // q181: the q166 hash-order replay with a leading bucket key
    "q181_length_curriculum" ->
      """WITH t AS (SELECT doc_id,
                      CAST(len(regexp_split_to_array(trim(text), '\s+'))
                        AS BIGINT) len
                    FROM documents),
          f AS (SELECT doc_id, len,
                  LEAST(7, (len - 1) * 8 // 2048) bucket,
                  ('0x' || substr(md5(42 || ':' || doc_id), 1, 15))
                    ::BIGINT shuf_key
                FROM t WHERE len > 0)
          SELECT doc_id, len, CAST(bucket AS BIGINT) bucket, shuf_key,
                 CAST(row_number() OVER
                   (ORDER BY bucket, shuf_key, doc_id) AS BIGINT) pos
          FROM f ORDER BY pos""",

    // q178: q32's BPE-ish token device; the report is pure integer
    // arithmetic over the length histogram
    "q178_bucketed_pack" ->
      """WITH t AS (SELECT CAST(len(regexp_extract_all(lower(text),
                      '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) l
                    FROM documents),
          cls0 AS (SELECT l, CAST(COUNT(*) AS BIGINT) n FROM t
                   WHERE l > 0 GROUP BY l),
          cls AS (SELECT CASE WHEN l > 512 THEN -1 ELSE l END len,
                    CAST(SUM(n) AS BIGINT) n_docs,
                    CAST(SUM(n * l) AS BIGINT) tok
                  FROM cls0 GROUP BY 1),
          k AS (SELECT len, n_docs, tok,
                  CASE WHEN len > 0 THEN 512 // len ELSE 0 END k_per_seq
                FROM cls),
          sq AS (SELECT *, CASE WHEN len > 0
                    THEN (n_docs + k_per_seq - 1) // k_per_seq
                    ELSE 0 END n_seqs
                 FROM k)
          SELECT len, n_docs, CAST(k_per_seq AS BIGINT) k_per_seq,
                 CAST(n_seqs AS BIGINT) n_seqs,
                 CAST(CASE WHEN len > 0 THEN n_seqs * 512 - tok
                      ELSE 0 END AS BIGINT) padding_tokens,
                 CASE WHEN len > 0 THEN
                   CAST(tok * 1000000 // (n_seqs * 512) AS BIGINT)
                 END AS utilization_ppm
          FROM sq ORDER BY len""",

    // q173: the q55 micro-ln device per train source; unseen eval
    // bigrams excluded (intersection scoring) and priced by coverage
    "q173_cross_source_lm" ->
      xsourceLmOracle,

    // q182: the ONE-SHOT matrix over landed∪batch VERBATIM — counts
    // merge by plain sum before quantization, so the hash match is
    // the merge proof (the q104/q135 pattern)
    "q182_xsource_lm_incremental" -> xsourceLmOracle,

    // q172: the coverage fold + the orphan sentinel row, same slices
    "q172_embedding_coverage" ->
      """WITH d AS (SELECT doc_id, source FROM documents
                    WHERE doc_id % 7 != 3),
          v AS (SELECT DISTINCT vec_id doc_id FROM embeddings
                WHERE vec_id % 11 != 5),
          per AS (SELECT source,
                    CAST(COUNT(*) AS BIGINT) n_docs,
                    CAST(SUM(CASE WHEN v.doc_id IS NOT NULL
                        THEN 1 ELSE 0 END) AS BIGINT) n_embedded
                  FROM d LEFT JOIN v USING (doc_id) GROUP BY source),
          orph AS (SELECT CAST(COUNT(*) AS BIGINT) n FROM v
                   WHERE doc_id NOT IN (SELECT doc_id FROM d))
          SELECT source, n_docs, n_embedded,
                 n_docs - n_embedded AS n_missing,
                 n_embedded * 1000000 // n_docs AS embedded_ppm
          FROM per
          UNION ALL
          SELECT '(orphan vectors)', 0, 0, n, NULL FROM orph
          ORDER BY source""",

    // q168: both snapshots replayed by the same deterministic prep;
    // identity = raw md5, token counts ride q107's proven device.
    "q168_snapshot_diff" ->
      """WITH o AS (SELECT doc_id, source,
                  md5(CASE WHEN doc_id % 13 = 5
                      THEN substr(text, 1, 20) ELSE text END) fp,
                  CAST(len(regexp_split_to_array(trim(
                    CASE WHEN doc_id % 13 = 5
                    THEN substr(text, 1, 20) ELSE text END), '\s+'))
                    AS BIGINT) tk
                FROM documents WHERE doc_id % 17 != 3),
          nw AS (SELECT doc_id, source, md5(text) fp,
                   CAST(len(regexp_split_to_array(trim(text), '\s+'))
                     AS BIGINT) tk
                 FROM documents WHERE doc_id % 19 != 7),
          j AS (SELECT COALESCE(nw.source, o.source) source,
                  CASE WHEN o.doc_id IS NULL THEN 'added'
                       WHEN nw.doc_id IS NULL THEN 'removed'
                       WHEN o.fp IS DISTINCT FROM nw.fp THEN 'changed'
                       ELSE 'unchanged' END status,
                  COALESCE(o.tk, 0) otk, COALESCE(nw.tk, 0) ntk
                FROM o FULL OUTER JOIN nw ON o.doc_id = nw.doc_id)
          SELECT source, status, CAST(COUNT(*) AS BIGINT) n_docs,
                 CAST(SUM(otk) AS BIGINT) tokens_old,
                 CAST(SUM(ntk) AS BIGINT) tokens_new,
                 CAST(SUM(ntk) - SUM(otk) AS BIGINT) token_delta
          FROM j GROUP BY source, status ORDER BY source, status""",

    "q32_text_bpe_tokens" ->
      """WITH t AS (SELECT doc_id,
                regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]') tk
              FROM documents)
         SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_bpe_tokens,
                CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct
         FROM t ORDER BY doc_id""",

    // q17's dedup survivors x q14's quality features x q15's language id,
    // composed exactly as the Spark-side pipeline.
    "q36_curation_pipeline" ->
      s"""WITH $tokCte,
          k AS (SELECT MIN(doc_id) AS doc_id FROM documents
                GROUP BY md5(trim(regexp_replace(regexp_replace(lower(text),
                  '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g')))),
          f AS (SELECT doc_id,
                  CAST(len(tk) AS BIGINT) n_tokens,
                  CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT) n_chr,
                  CAST(len(list_filter(tk, x -> list_contains(
                    ['the','a','an','and','of','to','in','is','on','for','with'], x))) AS BIGINT) n_stop,
                  len(list_filter(tk, x -> list_contains(['the','and','of','is'], x))) en,
                  len(list_filter(tk, x -> list_contains(['der','die','und','ist'], x))) de,
                  len(list_filter(tk, x -> list_contains(['el','la','los','es'], x))) es,
                  len(list_filter(tk, x -> list_contains(['le','la','les','est'], x))) fr
                FROM toks),
          q AS (SELECT doc_id, n_tokens,
                  round((n_stop::DOUBLE / n_tokens) * 0.5 +
                        least((n_chr::DOUBLE / n_tokens) / 10.0, 1.0) * 0.5, 6)
                    AS quality_score,
                  CASE WHEN en > 0 AND en >= greatest(en,de,es,fr) THEN 'en'
                       WHEN de > 0 AND de >= greatest(en,de,es,fr) THEN 'de'
                       WHEN es > 0 AND es >= greatest(en,de,es,fr) THEN 'es'
                       WHEN fr > 0 AND fr >= greatest(en,de,es,fr) THEN 'fr'
                       ELSE 'und' END AS lang_id
                FROM f)
          SELECT q.doc_id, n_tokens, quality_score
          FROM q JOIN k USING(doc_id)
          WHERE quality_score >= 0.25 AND lang_id = 'en'
          ORDER BY doc_id""",

    "q44_vocab_topk" ->
      """WITH tok AS (SELECT doc_id,
                        unnest(regexp_split_to_array(trim(text), '\s+')) token
                      FROM documents),
          a AS (SELECT token, CAST(COUNT(*) AS BIGINT) freq,
                       CAST(COUNT(DISTINCT doc_id) AS BIGINT) df
                FROM tok GROUP BY token),
          r AS (SELECT *, row_number() OVER (ORDER BY freq DESC, token) rank
                FROM a)
          SELECT rank, token, freq, df FROM r WHERE rank <= 100
          ORDER BY rank""",

    // Integer rank selection (ceil(p·n) via basis points) — no float
    // ranks, no interpolation, so both engines pick the same row.
    "q45_length_percentiles" ->
      """WITH s AS (SELECT source, n_chars, doc_id,
                      row_number() OVER
                        (PARTITION BY source ORDER BY n_chars, doc_id) rn,
                      COUNT(*) OVER (PARTITION BY source) cnt
                    FROM documents),
          p AS (SELECT unnest([5000, 9000, 9900]) bp)
          SELECT source, CAST(bp AS DOUBLE) / 10000.0 AS pct,
                 n_chars AS value
          FROM s, p WHERE rn = (bp * cnt + 9999) // 10000
          ORDER BY source, pct""",

    "q67_percentile_normalize" ->
      """WITH r AS (SELECT doc_id, source, n_chars,
                      row_number() OVER (PARTITION BY source
                        ORDER BY n_chars, doc_id) rn,
                      COUNT(*) OVER (PARTITION BY source) cnt
                    FROM documents)
          SELECT doc_id, source, n_chars,
                 CASE WHEN cnt > 1
                   THEN CAST(rn - 1 AS DOUBLE) / (cnt - 1)
                   ELSE 0.0 END AS len_pctile
          FROM r ORDER BY doc_id""",

    // df folds the distinct (doc, gram) table; novelty = unique-gram
    // fraction, exact integers over integers. Grams are hashed to the
    // documented 60-bit md5 longs before the df join, mirroring the
    // Spark side's narrow exchange.
    "q68_ngram_novelty" ->
      s"""WITH $tokCte, $shingleCte,
          hs AS (SELECT sid,
                   ('0x' || substr(md5(shingle), 1, 15))::BIGINT g
                 FROM sh),
          d AS (SELECT g, COUNT(*) df FROM hs GROUP BY g)
          SELECT sid AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
                 CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unique,
                 CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   / CAST(COUNT(*) AS DOUBLE) AS novelty
          FROM hs JOIN d USING (g)
          GROUP BY sid ORDER BY doc_id""",

    // BM25 replay: identical double operation order term-by-term, each
    // per-term score rounded to micro-units pre-sum (the q55 ln device),
    // integer score sums, per-query rank with doc_id tie-break.
    "q71_bm25_topk" ->
      s"""WITH $tokCte,
          t AS (SELECT doc_id, unnest(tk) tok FROM toks),
          tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) tf
                 FROM t GROUP BY 1, 2),
          dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) dl
                 FROM t GROUP BY 1),
          st AS (SELECT CAST(COUNT(*) AS BIGINT) n_docs,
                        CAST(SUM(dl) AS BIGINT) total_len FROM dl),
          qq(query_id, tok) AS (VALUES (1, 'table'), (1, 'join'),
            (1, 'spark'), (2, 'window'), (2, 'stream'), (3, 'hash'),
            (3, 'merge'), (3, 'sort')),
          dfr AS (SELECT tok, CAST(COUNT(*) AS BIGINT) df
                  FROM tf GROUP BY 1),
          sc AS (SELECT qq.query_id, tf.doc_id,
                   CAST(round(
                     ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)
                         + 1.0)
                     * (tf * 2.2)
                     / (tf + 1.2 * (0.25 + 0.75 * dl /
                         (CAST(total_len AS DOUBLE) / n_docs)))
                     * 1000000, 0) AS BIGINT) s_e6
                 FROM qq JOIN tf USING (tok) JOIN dfr USING (tok)
                   JOIN dl ON tf.doc_id = dl.doc_id, st),
          agg AS (SELECT query_id, doc_id,
                    CAST(SUM(s_e6) AS BIGINT) score_e6
                  FROM sc GROUP BY 1, 2),
          r AS (SELECT query_id, doc_id, score_e6,
                  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY score_e6 DESC, doc_id) AS BIGINT) rnk
                FROM agg)
          SELECT query_id, rnk, doc_id, score_e6
          FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""",

    // q187: q71's BM25 chain with doc-derived query terms (8 rarest by
    // df asc, tok asc per ≡0-mod-100 doc) + q21's exact-cosine rank
    // chain, fused by integer RRF — floor division on both engines.
    "q187_hybrid_rrf" -> hybridBruteOracle,

    // q192: the SAME fusion over the SERVED semantic side — the shared
    // IVF-PQ chain (EntryHelpers.ivfPqChainCtes, the q133/q158/q193
    // generator) with full-corpus codebooks, nprobe 3, ADC shortlist ≤
    // depth·rerankFactor = 80, exact-cosine rerank, cut at depth 20.
    "q192_hybrid_served" -> hybridServedOracle,

    // q198: queries are independent, so the streaming replay's union
    // equals the one-shot batch serve — q192's oracle verbatim
    "q198_streaming_serve" -> hybridServedOracle,

    // q203: the same token-equality transform as a DuckDB list
    // transform — counts and scrubbed text both hash-checked
    "q203_lexicon_scrub" ->
      """WITH t AS (SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') tk
             FROM documents)
         SELECT doc_id,
                CAST(len(list_filter(tk,
                  x -> x IN ('customer', 'vector', 'spark'))) AS BIGINT)
                  AS n_hits,
                array_to_string(list_transform(tk,
                  x -> CASE WHEN x IN ('customer', 'vector', 'spark')
                       THEN '[REDACTED]' ELSE x END), ' ') AS scrubbed
         FROM t ORDER BY doc_id""",

    // q195: both fused pipelines nested as CTEs (the q189 nested-WITH
    // device), joined on (q_id, doc_id); overlap ppm via HUGEINT floor
    // division (Spark side: DECIMAL(38,0) div).
    "q195_hybrid_audit" ->
      s"""WITH bf AS ($hybridBruteOracle),
          sv AS ($hybridServedOracle),
          j AS (SELECT bf.q_id, CAST(COUNT(*) AS BIGINT) k_eval,
                  CAST(SUM(CASE WHEN sv.doc_id IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) n_overlap
                FROM bf LEFT JOIN sv ON sv.q_id = bf.q_id
                                    AND sv.doc_id = bf.doc_id
                GROUP BY bf.q_id)
          SELECT q_id, k_eval, n_overlap,
                 CAST(CAST(n_overlap AS HUGEINT) * 1000000 // k_eval
                   AS BIGINT) AS overlap_ppm
          FROM j ORDER BY q_id""",

    // Rank + running sum over the vocabulary ordered (count DESC, token);
    // integer sums, one double division at the end.
    "q70_vocab_coverage" ->
      s"""WITH $tokCte,
          t AS (SELECT unnest(tk) tok FROM toks),
          c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) cnt FROM t GROUP BY tok),
          r AS (SELECT cnt,
                  ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) rk,
                  CAST(SUM(cnt) OVER (ORDER BY cnt DESC, tok
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) cum,
                  CAST(SUM(cnt) OVER () AS BIGINT) total
                FROM c)
          SELECT rk AS k, cum AS covered, total,
                 CAST(cum AS DOUBLE) / total AS coverage
          FROM r WHERE rk IN (1, 5, 10, 25) ORDER BY k""",

    // Same RE2-safe patterns (no lookaround, so Java and RE2 agree),
    // same email→IP→phone replacement order, counts pre-redaction;
    // DuckDB regexp_replace needs the explicit 'g' flag to match
    // Spark's replace-all default.
    "q82_pii_redaction" ->
      """WITH salted AS (
           SELECT doc_id,
                  text || ' contact user' || doc_id || '@mail.example.com or 10.'
                       || (doc_id % 256) || '.0.' || (doc_id % 200)
                       || ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                       || '-1234 done' AS text
           FROM documents),
         red AS (
           SELECT doc_id,
                  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
                  len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
                  len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS n_phones,
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(text,
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS rtext
           FROM salted)
         SELECT doc_id,
                CAST(n_emails AS BIGINT) AS n_emails,
                CAST(n_ips AS BIGINT) AS n_ips,
                CAST(n_phones AS BIGINT) AS n_phones,
                md5(rtext) AS red_md5
         FROM red ORDER BY doc_id""",

    // √count weights quantized to integer micro-units pre-sum (float
    // sums are order-dependent; integer sums aren't), then one double
    // chain per stratum in the same op order as the Spark side.
    "q66_temperature_mix" ->
      """WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) cnt,
                      CAST(floor(sqrt(COUNT(*)) * 1000000) AS BIGINT) sq
                    FROM documents GROUP BY source),
          t AS (SELECT CAST(SUM(sq) AS BIGINT) sw,
                       CAST(SUM(cnt) AS BIGINT) n FROM c),
          r AS (SELECT source, least(1000000,
                  CAST(floor(0.25 * n * sq / sw / cnt * 1000000) AS BIGINT))
                  ppm
                FROM c, t)
          SELECT doc_id, source FROM documents JOIN r USING (source)
          WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                  % 1000000 < ppm
          ORDER BY doc_id""",

    // Same quality formula as q36's oracle, then a per-source cumsum
    // over the (quality DESC, doc_id) order; kept iff the running total
    // fits the quota.
    "q63_token_budget" ->
      """WITH t AS (SELECT doc_id, source,
                      regexp_split_to_array(trim(text), '\s+') tk, text
                    FROM documents),
          f AS (SELECT doc_id, source, CAST(len(tk) AS BIGINT) n_tokens,
                  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) n_chr,
                  CAST(len(list_filter(tk, x -> list_contains(
                    ['the','a','an','and','of','to','in','is','on','for','with'], x)))
                    AS BIGINT) n_stop
                FROM t),
          q AS (SELECT doc_id, source, n_tokens,
                  round((n_stop::DOUBLE / n_tokens) * 0.5 +
                        least((n_chr::DOUBLE / n_tokens) / 10.0, 1.0) * 0.5, 6) qs
                FROM f),
          w AS (SELECT doc_id, source, n_tokens,
                  SUM(n_tokens) OVER (PARTITION BY source ORDER BY qs DESC, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum_tokens,
                  row_number() OVER (PARTITION BY source ORDER BY qs DESC, doc_id)
                    rank_in_stratum
                FROM q)
          SELECT doc_id, source, n_tokens,
                 CAST(cum_tokens AS BIGINT) AS cum_tokens, rank_in_stratum
          FROM w WHERE cum_tokens <= 800
          ORDER BY source, rank_in_stratum""",

    // Composed corpus report: fingerprint, lang-id, vocabulary and the
    // q45-style integer-rank median, each a one-aggregate CTE.
    "q61_corpus_report" ->
      s"""WITH $tokCte,
          st AS (SELECT CAST(COUNT(*) AS BIGINT) n_docs,
                   CAST(COUNT(DISTINCT md5(trim(regexp_replace(regexp_replace(
                     lower(text), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))))
                     AS BIGINT) n_distinct_texts
                 FROM documents),
          lc AS (SELECT doc_id,
                   len(list_filter(tk, x -> list_contains(['the','and','of','is'], x))) en,
                   len(list_filter(tk, x -> list_contains(['der','die','und','ist'], x))) de,
                   len(list_filter(tk, x -> list_contains(['el','la','los','es'], x))) es,
                   len(list_filter(tk, x -> list_contains(['le','la','les','est'], x))) fr
                 FROM toks),
          eng AS (SELECT CAST(SUM(CASE WHEN en > 0 AND en >= greatest(en,de,es,fr)
                            THEN 1 ELSE 0 END) AS BIGINT) n_english FROM lc),
          vb AS (SELECT CAST(COUNT(DISTINCT t.t) AS BIGINT) vocab_size
                 FROM (SELECT unnest(tk) t FROM toks) t),
          md AS (SELECT n_chars AS median_n_chars FROM (
                   SELECT n_chars, row_number() OVER (ORDER BY n_chars, doc_id) rn,
                          COUNT(*) OVER () cnt
                   FROM documents) s
                 WHERE rn = (5000 * cnt + 9999) // 10000)
          SELECT n_docs, n_docs - n_distinct_texts AS n_exact_dups,
                 n_english, vocab_size, median_n_chars
          FROM st, eng, vb, md""",

    // Bigram MLE replay: ln of each integer count-ratio quantized to
    // micro-units before the per-doc integer sum; avg is (sum/1e6)/n in
    // that exact order on both engines.
    "q55_bigram_logprob" ->
      s"""WITH $tokCte,
          bg AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)),
                   i -> array_to_string(tk[i:i+1], ' '))) g FROM toks),
          cab AS (SELECT g, CAST(COUNT(*) AS BIGINT) n_ab FROM bg GROUP BY g),
          ca AS (SELECT split_part(g, ' ', 1) a, CAST(SUM(n_ab) AS BIGINT) n_a
                 FROM cab GROUP BY 1),
          sc AS (SELECT doc_id,
                   CAST(round(ln(CAST(n_ab AS DOUBLE) / n_a) * 1000000, 0)
                        AS BIGINT) lp
                 FROM bg JOIN cab USING (g)
                   JOIN ca ON split_part(g, ' ', 1) = a)
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                 CAST(SUM(lp) AS BIGINT) AS sum_logp_e6,
                 CAST(SUM(lp) AS BIGINT) / 1000000.0 / COUNT(*) AS avg_logp
          FROM sc GROUP BY doc_id ORDER BY doc_id""",

    // q55's exact integer scoring, then a per-source integer rank cut
    // (rn·10⁴ ≤ n·1000, doc-id tiebreak on the one trailing IEEE
    // division's order) — bottom decile flagged, same rows everywhere.
    "q89_perplexity_filter" ->
      s"""WITH $tokCte,
          bg AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)),
                   i -> array_to_string(tk[i:i+1], ' '))) g FROM toks),
          cab AS (SELECT g, CAST(COUNT(*) AS BIGINT) n_ab FROM bg GROUP BY g),
          ca AS (SELECT split_part(g, ' ', 1) a, CAST(SUM(n_ab) AS BIGINT) n_a
                 FROM cab GROUP BY 1),
          sc AS (SELECT doc_id,
                   CAST(round(ln(CAST(n_ab AS DOUBLE) / n_a) * 1000000, 0)
                        AS BIGINT) lp
                 FROM bg JOIN cab USING (g)
                   JOIN ca ON split_part(g, ' ', 1) = a),
          sco AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) n_bigrams,
                    CAST(SUM(lp) AS BIGINT) sum_logp_e6,
                    CAST(SUM(lp) AS BIGINT) / 1000000.0 / COUNT(*) avg_logp
                  FROM sc GROUP BY doc_id),
          j AS (SELECT d.doc_id, d.source, s.n_bigrams, s.sum_logp_e6,
                  row_number() OVER (PARTITION BY d.source
                    ORDER BY s.avg_logp, d.doc_id) rn,
                  COUNT(*) OVER (PARTITION BY d.source) cnt
                FROM documents d JOIN sco s USING (doc_id))
          SELECT doc_id, source, n_bigrams, sum_logp_e6,
                 CAST(CASE WHEN rn * 10000 <= cnt * 1000 THEN 1 ELSE 0 END
                      AS BIGINT) AS flagged
          FROM j ORDER BY doc_id""",

    // Integer `//` arithmetic with the ×1e6 products widened to HUGEINT
    // (the Spark side widens to DECIMAL(38,0)) — same truncating
    // division on positive values, so the report is bit-identical by
    // construction and never wraps at 100 TB token masses.
    "q90_mixture_weights" ->
      """WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) n_docs,
                        CAST(SUM(len(regexp_split_to_array(trim(text), '\s+')))
                             AS BIGINT) n_tokens
                      FROM documents GROUP BY source),
          tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) total_tokens,
                         CAST(COUNT(*) AS BIGINT) n_strata FROM per)
          SELECT source, n_docs, n_tokens,
                 CAST(CAST(n_tokens AS HUGEINT) * 1000000 // total_tokens
                      AS BIGINT) AS natural_share_e6,
                 total_tokens // n_strata AS target_tokens,
                 CAST(CAST(total_tokens // n_strata AS HUGEINT) * 1000000
                      // n_tokens AS BIGINT) AS weight_e6
          FROM per, tot ORDER BY source""",

    // Deterministic face of the q91 sketch verdict: scorable docs (≥2
    // tokens → ≥1 bigram) counted per source; the sketch threshold's
    // rank-band verdict is computed Spark-side and must be 1 everywhere
    // — an out-of-band percentile sketch hash-fails (q74's device).
    "q91_perplexity_sketch_cut" ->
      s"""WITH $tokCte
          SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(1 AS BIGINT) AS ok
          FROM documents d JOIN toks t ON d.doc_id = t.doc_id
          WHERE len(t.tk) >= 2
          GROUP BY d.source ORDER BY d.source""",

    // Chunk boundaries are pure arithmetic on length(text); range()
    // excludes the stop like sequence(0, n-1, stride) includes <= n-1.
    "q51_chunk_docs" ->
      """WITH d AS (SELECT doc_id, text, length(text) n FROM documents
                    WHERE length(text) > 0),
          g AS (SELECT doc_id, text, n, unnest(range(0, n, 400)) st FROM d)
          SELECT doc_id, st // 400 AS chunk_id, st AS start,
                 least(500, n - st) AS chunk_len,
                 md5(substr(text, CAST(st + 1 AS INT), 500)) AS chunk_fp
          FROM g ORDER BY doc_id, chunk_id""",

    // tf × micro-unit-quantized ln(N/df): the ln is rounded to integer
    // micro-units BEFORE the tf multiply (mirrors Curation.tfidfTopTerms)
    // so a 1-ulp libm divergence cannot flip a rank.
    "q50_tfidf_topterms" ->
      """WITH tok AS (SELECT doc_id,
                        unnest(regexp_split_to_array(trim(text), '\s+')) token
                      FROM documents),
          tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) tf
                 FROM tok GROUP BY doc_id, token),
          n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) n FROM documents),
          dfr AS (SELECT token, CAST(COUNT(*) AS BIGINT) df FROM tf GROUP BY token),
          sc AS (SELECT doc_id, t.token, t.tf, dfr.df,
                   t.tf * CAST(round(ln(n.n / dfr.df) * 1000000, 0) AS BIGINT)
                     AS score_e6
                 FROM tf t JOIN dfr USING (token), n),
          r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                  ORDER BY score_e6 DESC, token) rank FROM sc)
          SELECT doc_id, rank, token, tf, df, score_e6 FROM r
          WHERE rank <= 5 ORDER BY doc_id, rank""",

    // The plant rule (doc_id % 20 == 0 lines corrupted) IS the oracle:
    // a PERMISSIVE reader that drops, double-counts, or mis-attributes
    // a line disagrees with the rule's arithmetic.
    "q93_jsonl_malformed_rate" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) n_rows FROM documents
          WHERE doc_id % 20 != 0 GROUP BY source
          UNION ALL
          SELECT '__malformed__' AS source, CAST(COUNT(*) AS BIGINT) n_rows
          FROM documents WHERE doc_id % 20 = 0
          ORDER BY source""",

    // Integer cross-multiplied thresholds — both engines compare
    // products of exact BIGINTs, so no rounding can flip a verdict.
    "q94_quality_gate" ->
      """WITH f AS (SELECT doc_id,
                      CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) n_tok,
                      CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) n_chr,
                      CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                        x -> list_contains(['the','a','an','and','of','to','in','is','on','for','with'], x))) AS BIGINT) n_stop,
                      CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) n_uniq
                    FROM documents),
          g AS (SELECT doc_id, n_tok,
                  (CASE WHEN n_tok < 30 THEN 1 ELSE 0 END) +
                  (CASE WHEN n_chr*10 < n_tok*38 OR n_chr*10 > n_tok*50 THEN 2 ELSE 0 END) +
                  (CASE WHEN n_stop*20 < n_tok THEN 4 ELSE 0 END) +
                  (CASE WHEN n_uniq*5 < n_tok*2 THEN 8 ELSE 0 END) AS reasons
                FROM f)
          SELECT doc_id, n_tok AS n_tokens, CAST(reasons AS BIGINT) reasons,
                 CAST(CASE WHEN reasons = 0 THEN 1 ELSE 0 END AS BIGINT) keep
          FROM g ORDER BY doc_id""",

    // Micro-unit-ln KL numerator (q50's quantization device); the
    // numerator ships undivided — Spark `div` truncates toward zero,
    // DuckDB `//` floors, and a head-restricted sum can be negative.
    "q95_source_unigram_kl" ->
      """WITH tok AS (SELECT source,
                        unnest(regexp_split_to_array(trim(text), '\s+')) AS token
                      FROM documents),
          head AS (SELECT token, CAST(COUNT(*) AS BIGINT) c_t FROM tok
                   GROUP BY token ORDER BY c_t DESC, token LIMIT 200),
          ns AS (SELECT source, CAST(COUNT(*) AS BIGINT) n_s FROM tok
                 GROUP BY source),
          nc AS (SELECT CAST(COUNT(*) AS BIGINT) n_c FROM tok),
          st AS (SELECT t.source, t.token, CAST(COUNT(*) AS BIGINT) c_st,
                   MAX(h.c_t) c_t
                 FROM tok t JOIN head h USING (token)
                 GROUP BY t.source, t.token),
          sc AS (SELECT st.source, ns.n_s, st.c_st,
                   st.c_st * (CAST(round(ln(st.c_st)*1000000, 0) AS BIGINT)
                            - CAST(round(ln(ns.n_s)*1000000, 0) AS BIGINT)
                            - CAST(round(ln(st.c_t)*1000000, 0) AS BIGINT)
                            + CAST(round(ln(nc.n_c)*1000000, 0) AS BIGINT))
                     AS contrib
                 FROM st JOIN ns USING (source), nc)
          SELECT source, CAST(MAX(n_s) AS BIGINT) n_tokens,
                 CAST(SUM(c_st) AS BIGINT) head_tokens,
                 CAST(SUM(contrib) AS BIGINT) kl_num_e6
          FROM sc GROUP BY source ORDER BY source""",

    // The lnq(·) = round(ln·1e6) chain term by term; pairs below the
    // noise floor cut before the unigram joins, as on the Spark side.
    "q97_pmi_collocations" ->
      """WITH tok AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) t
                      FROM documents),
          toks2 AS (SELECT regexp_split_to_array(trim(text), '\s+') tk
                    FROM documents),
          bi AS (SELECT unnest(list_transform(range(1, len(tk)),
                   i -> tk[i] || ' ' || tk[i+1])) g
                 FROM toks2 WHERE len(tk) >= 2),
          cb AS (SELECT g, CAST(COUNT(*) AS BIGINT) c_xy FROM bi
                 GROUP BY g HAVING COUNT(*) >= 5),
          nb AS (SELECT CAST(COUNT(*) AS BIGINT) n_bi FROM bi),
          un AS (SELECT t, CAST(COUNT(*) AS BIGINT) c_t FROM tok GROUP BY t),
          nu AS (SELECT CAST(COUNT(*) AS BIGINT) n_uni FROM tok),
          j AS (SELECT cb.g, cb.c_xy, x.c_t c_x, y.c_t c_y
                FROM cb JOIN un x ON x.t = split_part(cb.g, ' ', 1)
                        JOIN un y ON y.t = split_part(cb.g, ' ', 2)),
          sc AS (SELECT g AS bigram, c_xy, c_x, c_y,
                   CAST(round(ln(c_xy) * 1000000, 0) AS BIGINT)
                   - CAST(round(ln(n_bi) * 1000000, 0) AS BIGINT)
                   - CAST(round(ln(c_x) * 1000000, 0) AS BIGINT)
                   - CAST(round(ln(c_y) * 1000000, 0) AS BIGINT)
                   + 2 * CAST(round(ln(n_uni) * 1000000, 0) AS BIGINT)
                     AS pmi_e6
                 FROM j, nb, nu)
          SELECT bigram, c_xy, c_x, c_y, CAST(pmi_e6 AS BIGINT) pmi_e6
          FROM sc ORDER BY pmi_e6 DESC, bigram LIMIT 25""",

    // The ONE-SHOT full-corpus computation (q90's SQL): the Spark side
    // folds two slice partials, so a hash match here IS the
    // merge ≡ recompute proof.
    "q104_mixture_merge" ->
      """WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) n_docs,
                        CAST(SUM(len(regexp_split_to_array(trim(text), '\s+')))
                             AS BIGINT) n_tokens
                      FROM documents GROUP BY source),
          tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) total_tokens,
                         CAST(COUNT(*) AS BIGINT) n_strata FROM per)
          SELECT source, n_docs, n_tokens,
                 CAST(CAST(n_tokens AS HUGEINT) * 1000000 // total_tokens
                      AS BIGINT) AS natural_share_e6,
                 total_tokens // n_strata AS target_tokens,
                 CAST(CAST(total_tokens // n_strata AS HUGEINT) * 1000000
                      // n_tokens AS BIGINT) AS weight_e6
          FROM per, tot ORDER BY source""",

    // hash60(doc_id) basis-point bands; the md5-derived hash is the
    // cross-engine replay device used by every sampling face.
    "q106_three_way_split" ->
      """WITH h AS (SELECT source,
                      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                        % 10000 hb
                    FROM documents),
          s AS (SELECT source,
                  CASE WHEN hb < 8000 THEN 'train'
                       WHEN hb < 9000 THEN 'val'
                       ELSE 'test' END AS split
                FROM h)
          SELECT source, split, CAST(COUNT(*) AS BIGINT) n_docs
          FROM s GROUP BY source, split ORDER BY source, split""",

    // bucket = length of the integer's binary rendering = floor(log2)+1,
    // exact on both engines (a float log would flip at powers of two).
    "q107_token_length_histogram" ->
      """WITH t AS (SELECT source,
                      CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) n
                    FROM documents),
          b AS (SELECT source,
                  CASE WHEN n <= 0 THEN 0
                       ELSE CAST(length(bin(n)) AS BIGINT) END AS bucket
                FROM t)
          SELECT source, bucket, CAST(COUNT(*) AS BIGINT) n_docs
          FROM b GROUP BY source, bucket ORDER BY source, bucket""",

    "q113_bpe_merges" -> bpeOracle(8),

    "q115_bpe_segment_stats" -> bpeApplyOracle(8),

    // q116's dedup lattice + q94's gate + q89's perplexity decile,
    // composed by doc id with first-rejecting-stage attribution, then
    // one (source, stage) integer aggregate.
    "q120_curation_funnel" ->
      s"""WITH RECURSIVE $tokCte, $shingleCte, $minhashPairCte,
          fp AS (SELECT doc_id,
                   md5(trim(regexp_replace(regexp_replace(lower(text),
                     '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))) fp
                 FROM documents),
          ex AS (SELECT doc_id FROM (
                   SELECT doc_id,
                          MIN(doc_id) OVER (PARTITION BY fp) keep_id
                   FROM fp WHERE fp IS NOT NULL) t
                 WHERE doc_id != keep_id),
          e AS (SELECT a_id u, b_id v FROM mhp
                UNION ALL SELECT b_id, a_id FROM mhp),
          walk(u, r) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT w.u, e.v FROM walk w JOIN e ON e.u = w.r),
          cl AS (SELECT u AS doc_id, MIN(r) AS cluster_id FROM walk GROUP BY u),
          emb AS (SELECT vec_id sid, embedding::DOUBLE[] v FROM embeddings),
          centc AS (SELECT sid c_id, v c_vec FROM emb WHERE sid % 25 = 7),
          crsc AS (SELECT sid g_id, v g_vec FROM emb WHERE sid % 125 = 7),
          rtc AS (SELECT c_id, g_id FROM (
                    SELECT c.c_id, g.g_id,
                           ROW_NUMBER() OVER (PARTITION BY c.c_id
                             ORDER BY round(list_dot_product(c.c_vec, g.g_vec) /
                               (sqrt(list_dot_product(c.c_vec, c.c_vec)) *
                                sqrt(list_dot_product(g.g_vec, g.g_vec))), 4)
                               DESC, g.g_id) rn
                    FROM centc c, crsc g) t WHERE rn = 1),
          cellsc AS (SELECT DISTINCT g_id, c_id FROM (
                       SELECT g_id, c_id FROM rtc
                       UNION ALL SELECT g_id, g_id FROM crsc)),
          vgc AS (SELECT sid, g_id FROM (
                    SELECT emb.sid, g.g_id,
                           ROW_NUMBER() OVER (PARTITION BY emb.sid
                             ORDER BY round(list_dot_product(emb.v, g.g_vec) /
                               (sqrt(list_dot_product(emb.v, emb.v)) *
                                sqrt(list_dot_product(g.g_vec, g.g_vec))), 4)
                               DESC, g.g_id) rn
                    FROM emb, crsc g) t WHERE rn = 1),
          asn AS (SELECT sid, c_id FROM (
                    SELECT emb.sid, cellsc.c_id,
                           ROW_NUMBER() OVER (PARTITION BY emb.sid
                             ORDER BY round(list_dot_product(emb.v, c.c_vec) /
                               (sqrt(list_dot_product(emb.v, emb.v)) *
                                sqrt(list_dot_product(c.c_vec, c.c_vec))), 4)
                               DESC, cellsc.c_id) rn
                    FROM emb JOIN vgc ON vgc.sid = emb.sid
                             JOIN cellsc ON cellsc.g_id = vgc.g_id
                             JOIN centc c ON c.c_id = cellsc.c_id) t
                  WHERE rn = 1),
          spr AS (SELECT a.sid a_id, b.sid b_id
                  FROM asn a JOIN asn b ON a.c_id = b.c_id AND a.sid < b.sid
                  JOIN emb x ON x.sid = a.sid JOIN emb y ON y.sid = b.sid
                  WHERE round(list_dot_product(x.v, y.v) /
                        (sqrt(list_dot_product(x.v, x.v)) *
                         sqrt(list_dot_product(y.v, y.v))), 4) >= 0.3),
          sed AS (SELECT a_id u, b_id v FROM spr
                  UNION ALL SELECT b_id, a_id FROM spr),
          swalk(u, r) AS (SELECT sid, sid FROM emb
                          UNION
                          SELECT w.u, sed.v FROM swalk w
                          JOIN sed ON sed.u = w.r),
          scl AS (SELECT u sid, MIN(r) lbl FROM swalk GROUP BY u),
          f AS (SELECT doc_id,
                  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) n_tok,
                  CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT) n_chr,
                  CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                    x -> list_contains(['the','a','an','and','of','to','in','is','on','for','with'], x))) AS BIGINT) n_stop,
                  CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) n_uniq
                FROM documents),
          g AS (SELECT doc_id, n_tok,
                  (CASE WHEN n_tok < 30 THEN 1 ELSE 0 END) +
                  (CASE WHEN n_chr*10 < n_tok*38 OR n_chr*10 > n_tok*50 THEN 2 ELSE 0 END) +
                  (CASE WHEN n_stop*20 < n_tok THEN 4 ELSE 0 END) +
                  (CASE WHEN n_uniq*5 < n_tok*2 THEN 8 ELSE 0 END) AS reasons
                FROM f),
          bg AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)),
                   i -> array_to_string(tk[i:i+1], ' '))) g FROM toks),
          cab AS (SELECT g, CAST(COUNT(*) AS BIGINT) n_ab FROM bg GROUP BY g),
          ca AS (SELECT split_part(g, ' ', 1) a, CAST(SUM(n_ab) AS BIGINT) n_a
                 FROM cab GROUP BY 1),
          sc AS (SELECT doc_id,
                   CAST(round(ln(CAST(n_ab AS DOUBLE) / n_a) * 1000000, 0)
                        AS BIGINT) lp
                 FROM bg JOIN cab USING (g)
                   JOIN ca ON split_part(g, ' ', 1) = a),
          sco AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) n_bigrams,
                    CAST(SUM(lp) AS BIGINT) / 1000000.0 / COUNT(*) avg_logp
                  FROM sc GROUP BY doc_id),
          j AS (SELECT d.doc_id,
                  row_number() OVER (PARTITION BY d.source
                    ORDER BY s.avg_logp, d.doc_id) rn,
                  COUNT(*) OVER (PARTITION BY d.source) cnt
                FROM documents d JOIN sco s USING (doc_id)),
          pf AS (SELECT doc_id,
                   CASE WHEN rn * 10000 <= cnt * 1000 THEN 1 ELSE 0 END flagged
                 FROM j),
          sel AS (SELECT d.doc_id, d.source,
                    CASE WHEN d.doc_id IN (SELECT doc_id FROM ex)
                           THEN 'exact_dup'
                         WHEN cl.cluster_id != d.doc_id THEN 'near_dup'
                         WHEN scl.lbl != scl.sid THEN 'semantic_dup'
                         WHEN g.reasons != 0 THEN 'quality_fail'
                         WHEN COALESCE(pf.flagged, 0) = 1 THEN 'ppl_cut'
                         ELSE 'keep' END stage,
                    g.n_tok
                  FROM documents d
                    JOIN cl ON cl.doc_id = d.doc_id
                    LEFT JOIN scl ON scl.sid = d.doc_id
                    JOIN g ON g.doc_id = d.doc_id
                    LEFT JOIN pf ON pf.doc_id = d.doc_id)
          SELECT source, stage, CAST(COUNT(*) AS BIGINT) n_docs,
                 CAST(SUM(n_tok) AS BIGINT) n_tokens
          FROM sel GROUP BY source, stage ORDER BY source, stage""",

    // Hashed-unigram importance weights in the micro-unit-ln BIGINT
    // device (order-independent integer sums), add-one smoothing over
    // 1024 buckets, per-source top-20% by integer rank.
    "q121_dsir_select" ->
      """WITH tok AS (SELECT doc_id, source,
                        unnest(regexp_split_to_array(trim(text), '\s+')) token
                      FROM documents),
          tb AS (SELECT doc_id, source,
                   ('0x' || substr(md5(token), 1, 15))::BIGINT % 1024 b
                 FROM tok),
          raw AS (SELECT b, CAST(COUNT(*) AS BIGINT) c_raw FROM tb GROUP BY b),
          tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) c_tgt FROM tb
                  WHERE source = 'src0' GROUP BY b),
          tot AS (SELECT CAST(COUNT(*) AS BIGINT) n_raw,
                    CAST(COUNT(*) FILTER (WHERE source = 'src0') AS BIGINT)
                      n_tgt
                  FROM tb),
          sc AS (SELECT tb.doc_id, tb.source,
                   CAST(round(ln(COALESCE(tgt.c_tgt, 0) + 1) * 1000000, 0)
                        AS BIGINT)
                   - CAST(round(ln(tot.n_tgt + 1024) * 1000000, 0) AS BIGINT)
                   - CAST(round(ln(raw.c_raw + 1) * 1000000, 0) AS BIGINT)
                   + CAST(round(ln(tot.n_raw + 1024) * 1000000, 0) AS BIGINT)
                     AS lp
                 FROM tb JOIN raw USING (b) LEFT JOIN tgt USING (b), tot),
          sco AS (SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) n_feat,
                    CAST(SUM(lp) AS BIGINT) logw_e6
                  FROM sc GROUP BY doc_id, source),
          j AS (SELECT doc_id, source, n_feat, logw_e6,
                  row_number() OVER (PARTITION BY source
                    ORDER BY logw_e6 DESC, doc_id) rn,
                  COUNT(*) OVER (PARTITION BY source) cnt
                FROM sco)
          SELECT doc_id, source, n_feat, logw_e6,
                 CAST(CASE WHEN rn * 10000 <= cnt * 2000 THEN 1 ELSE 0 END
                      AS BIGINT) selected
          FROM j ORDER BY doc_id""",

    "q123_quality_classifier" -> qcOracle(3),

    "q161_filter_agreement" -> qcAgreementOracle(3),

    "q165_quality_rep" -> qcClusterRepOracle(3),

    "q154_classifier_calibration" -> qcCalibrationOracle(3, 2000000L),
    "q155_classifier_auc" -> qcAucOracle(3),

    // q40's packing chain folded per shard; the digest is a per-term
    // mod 1e9+7 hash60 sum (HUGEINT-widened, order-independent).
    "q153_shard_manifest" ->
      """WITH t AS (SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
                  CAST(len(regexp_extract_all(lower(text),
                    '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_tokens
                FROM documents),
          f AS (SELECT * FROM t WHERE n_tokens > 0),
          o AS (SELECT *, CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard
                  ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0) AS BIGINT) AS start_offset FROM f)
          SELECT shard,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
                 CAST(MAX((start_offset + n_tokens - 1) // 2048) + 1
                   AS BIGINT) AS n_seqs,
                 MIN(doc_id) AS first_id, MAX(doc_id) AS last_id,
                 CAST(SUM(('0x' || substr(md5(doc_id || ':' || n_tokens),
                     1, 15))::BIGINT % 1000000007) % 1000000007
                   AS BIGINT) AS content_digest
          FROM o GROUP BY shard ORDER BY shard""",

    // q163: the q95 lnq chain with landed as the reference and batch as
    // the judged side; covers divided once, the alarm compared on the
    // SAME divided ppm integers both engines computed
    "q163_ingest_drift" ->
      """WITH lt AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) token
                     FROM documents WHERE doc_id % 4 != 2),
          bt AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) token
                 FROM documents WHERE doc_id % 4 = 2),
          head AS (SELECT token, CAST(COUNT(*) AS BIGINT) c_lt FROM lt
                   GROUP BY token ORDER BY c_lt DESC, token LIMIT 200),
          nl AS (SELECT CAST(COUNT(*) AS BIGINT) n_l FROM lt),
          nb AS (SELECT CAST(COUNT(*) AS BIGINT) n_b FROM bt),
          bc AS (SELECT token, CAST(COUNT(*) AS BIGINT) c_bt FROM bt
                 GROUP BY token),
          jj AS (SELECT CAST(COALESCE(SUM(c_bt), 0) AS BIGINT) head_b,
                        CAST(COALESCE(SUM(c_bt *
                          (CAST(round(ln(c_bt)*1000000, 0) AS BIGINT)
                         - CAST(round(ln(nb.n_b)*1000000, 0) AS BIGINT)
                         - CAST(round(ln(c_lt)*1000000, 0) AS BIGINT)
                         + CAST(round(ln(nl.n_l)*1000000, 0) AS BIGINT))), 0)
                          AS BIGINT) kl
                 FROM bc JOIN head USING (token), nl, nb),
          hl AS (SELECT CAST(SUM(c_lt) AS BIGINT) head_l FROM head),
          r AS (SELECT nl.n_l n_landed_tokens, nb.n_b n_batch_tokens,
                  CAST(CAST(hl.head_l AS HUGEINT) * 1000000 // nl.n_l
                    AS BIGINT) head_cover_landed_ppm,
                  CAST(CAST(jj.head_b AS HUGEINT) * 1000000 // nb.n_b
                    AS BIGINT) head_cover_batch_ppm,
                  jj.kl kl_num_e6
                FROM jj, hl, nl, nb)
          SELECT *, CAST(CASE WHEN head_cover_batch_ppm * 10 <
                          head_cover_landed_ppm * 9 THEN 1 ELSE 0 END
                    AS BIGINT) cover_alarm
          FROM r""",

    // the RESUMED-WRITER merge proof: the incremental fold must land on
    // q153's one-shot manifest over the union, column for column
    "q162_manifest_incremental" ->
      """WITH t AS (SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
                  CAST(len(regexp_extract_all(lower(text),
                    '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_tokens
                FROM documents),
          f AS (SELECT * FROM t WHERE n_tokens > 0),
          o AS (SELECT *, CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard
                  ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0) AS BIGINT) AS start_offset FROM f)
          SELECT shard,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
                 CAST(MAX((start_offset + n_tokens - 1) // 2048) + 1
                   AS BIGINT) AS n_seqs,
                 MIN(doc_id) AS first_id, MAX(doc_id) AS last_id,
                 CAST(SUM(('0x' || substr(md5(doc_id || ':' || n_tokens),
                     1, 15))::BIGINT % 1000000007) % 1000000007
                   AS BIGINT) AS content_digest
          FROM o GROUP BY shard ORDER BY shard""",

    // the one-shot replay IS the oracle: folding per-slice gradient
    // partials must land on the identical weight trajectory
    "q138_qc_merge" -> qcOracle(3),

    // Landed distributions + landed per-source top-20% thresholds
    // (θ = min selected landed weight), batch scored with left-joined
    // counts (unseen buckets contribute lnq(1)=0); batch strata with
    // no landed threshold select nothing.
    "q125_dsir_incremental" ->
      """WITH tl AS (SELECT doc_id, source,
                       unnest(regexp_split_to_array(trim(text), '\s+')) token
                     FROM documents WHERE doc_id % 4 != 2),
          tbl AS (SELECT doc_id, source,
                    ('0x' || substr(md5(token), 1, 15))::BIGINT % 1024 b
                  FROM tl),
          cnt AS (SELECT b, CAST(COUNT(*) AS BIGINT) c_raw,
                    CAST(COUNT(*) FILTER (WHERE source = 'src0') AS BIGINT)
                      c_tgt
                  FROM tbl GROUP BY b),
          tot AS (SELECT CAST(SUM(c_raw) AS BIGINT) n_raw,
                    CAST(SUM(c_tgt) AS BIGINT) n_tgt FROM cnt),
          lsc AS (SELECT tbl.doc_id, tbl.source,
                    CAST(round(ln(cnt.c_tgt + 1) * 1000000, 0) AS BIGINT)
                    - CAST(round(ln(tot.n_tgt + 1024) * 1000000, 0) AS BIGINT)
                    - CAST(round(ln(cnt.c_raw + 1) * 1000000, 0) AS BIGINT)
                    + CAST(round(ln(tot.n_raw + 1024) * 1000000, 0) AS BIGINT)
                      lp
                  FROM tbl JOIN cnt USING (b), tot),
          lsco AS (SELECT doc_id, source, CAST(SUM(lp) AS BIGINT) logw_e6
                   FROM lsc GROUP BY doc_id, source),
          lj AS (SELECT source, logw_e6,
                   row_number() OVER (PARTITION BY source
                     ORDER BY logw_e6 DESC, doc_id) rn,
                   COUNT(*) OVER (PARTITION BY source) cnt2
                 FROM lsco),
          th AS (SELECT source, CAST(MIN(logw_e6) AS BIGINT) logw_cut
                 FROM lj WHERE rn * 10000 <= cnt2 * 2000 GROUP BY source),
          tbb AS (SELECT doc_id, source,
                    ('0x' || substr(md5(token), 1, 15))::BIGINT % 1024 b
                  FROM (SELECT doc_id, source,
                          unnest(regexp_split_to_array(trim(text), '\s+'))
                            token
                        FROM documents WHERE doc_id % 4 = 2) t),
          bsc AS (SELECT tbb.doc_id, tbb.source,
                    CAST(round(ln(COALESCE(cnt.c_tgt, 0) + 1) * 1000000, 0)
                         AS BIGINT)
                    - CAST(round(ln(tot.n_tgt + 1024) * 1000000, 0) AS BIGINT)
                    - CAST(round(ln(COALESCE(cnt.c_raw, 0) + 1) * 1000000, 0)
                           AS BIGINT)
                    + CAST(round(ln(tot.n_raw + 1024) * 1000000, 0) AS BIGINT)
                      lp
                  FROM tbb LEFT JOIN cnt USING (b), tot),
          bsco AS (SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) n_feat,
                     CAST(SUM(lp) AS BIGINT) logw_e6
                   FROM bsc GROUP BY doc_id, source)
          SELECT b.doc_id, b.source, b.n_feat, b.logw_e6,
                 CAST(CASE WHEN th.logw_cut IS NOT NULL
                             AND b.logw_e6 >= th.logw_cut
                           THEN 1 ELSE 0 END AS BIGINT) selected
          FROM bsco b LEFT JOIN th USING (source)
          ORDER BY doc_id""",

    // KN with D=3/4 as exact integers: per-token
    // lnq((max(4c(ab)-3,0))·N + 3·N1+(a·)·N1+(·b)) − lnq(4·c(a)·N),
    // HUGEINT products (the Spark side widens to DECIMAL(38,0)).
    "q126_kneser_ney" ->
      s"""WITH $tokCte,
          bg AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)),
                   i -> array_to_string(tk[i:i+1], ' '))) g FROM toks),
          cab AS (SELECT g, CAST(COUNT(*) AS BIGINT) n_ab FROM bg GROUP BY g),
          ca AS (SELECT split_part(g, ' ', 1) a,
                   CAST(SUM(n_ab) AS BIGINT) n_a,
                   CAST(COUNT(*) AS BIGINT) fert_a
                 FROM cab GROUP BY 1),
          cb AS (SELECT split_part(g, ' ', 2) b,
                   CAST(COUNT(*) AS BIGINT) cont_b
                 FROM cab GROUP BY 1),
          nn AS (SELECT CAST(COUNT(*) AS BIGINT) nn FROM cab),
          sc AS (SELECT doc_id,
                   CAST(round(ln(CAST(greatest(4*cab.n_ab - 3, 0) AS HUGEINT)
                                   * nn.nn
                                 + CAST(3 AS HUGEINT) * ca.fert_a * cb.cont_b)
                              * 1000000, 0) AS BIGINT)
                   - CAST(round(ln(CAST(4 AS HUGEINT) * ca.n_a * nn.nn)
                                * 1000000, 0) AS BIGINT) lp
                 FROM bg JOIN cab USING (g)
                   JOIN ca ON split_part(g, ' ', 1) = ca.a
                   JOIN cb ON split_part(g, ' ', 2) = cb.b, nn)
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) n_bigrams,
                 CAST(SUM(lp) AS BIGINT) sum_knlogp_e6
          FROM sc GROUP BY doc_id ORDER BY doc_id""",

    // Landed bigram LM + landed per-source boundary ratio (the last
    // flagged landed doc's exact integer (sum, nb) pair), batch
    // scored over LM-known bigrams only, flag by integer
    // cross-multiplication — every comparison engine-exact.
    "q131_ppl_incremental" ->
      """WITH lbg AS (SELECT doc_id, source, unnest(list_transform(
                  range(1, len(tk)),
                  i -> array_to_string(tk[i:i+1], ' '))) g
                FROM (SELECT doc_id, source,
                        regexp_split_to_array(trim(text), '\s+') tk
                      FROM documents WHERE doc_id % 5 != 2) t),
         cab AS (SELECT g, CAST(COUNT(*) AS BIGINT) n_ab FROM lbg
                 GROUP BY g),
         ca AS (SELECT split_part(g, ' ', 1) a,
                  CAST(SUM(n_ab) AS BIGINT) n_a
                FROM cab GROUP BY 1),
         lsc AS (SELECT doc_id, source,
                   CAST(round(ln(CAST(n_ab AS DOUBLE) / n_a) * 1000000, 0)
                     AS BIGINT) lp
                 FROM lbg JOIN cab USING (g)
                   JOIN ca ON split_part(g, ' ', 1) = a),
         lsco AS (SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) nb,
                    CAST(SUM(lp) AS BIGINT) se
                  FROM lsc GROUP BY doc_id, source),
         lj AS (SELECT doc_id, source, nb, se,
                  row_number() OVER (PARTITION BY source
                    ORDER BY se / 1000000.0 / nb, doc_id) rn,
                  COUNT(*) OVER (PARTITION BY source) cnt
                FROM lsco),
         th AS (SELECT source, se th_sum, nb th_nb FROM (
                  SELECT source, se, nb,
                         ROW_NUMBER() OVER (PARTITION BY source
                           ORDER BY rn DESC) r2
                  FROM lj WHERE rn * 10000 <= cnt * 1000) t
                WHERE r2 = 1),
         bd AS (SELECT doc_id, source FROM documents WHERE doc_id % 5 = 2),
         bbg AS (SELECT doc_id, unnest(list_transform(
                   range(1, len(tk)),
                   i -> array_to_string(tk[i:i+1], ' '))) g
                 FROM (SELECT doc_id,
                         regexp_split_to_array(trim(text), '\s+') tk
                       FROM documents WHERE doc_id % 5 = 2) t),
         bsc AS (SELECT doc_id,
                   CAST(round(ln(CAST(n_ab AS DOUBLE) / n_a) * 1000000, 0)
                     AS BIGINT) lp
                 FROM bbg JOIN cab USING (g)
                   JOIN ca ON split_part(g, ' ', 1) = a),
         bsco AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) nb,
                    CAST(SUM(lp) AS BIGINT) se
                  FROM bsc GROUP BY doc_id)
         SELECT bd.doc_id, bd.source,
                COALESCE(s.nb, 0) AS n_bigrams,
                COALESCE(s.se, 0) AS sum_logp_e6,
                CAST(CASE WHEN th.th_sum IS NOT NULL AND s.se IS NOT NULL
                            AND s.se * th.th_nb <= th.th_sum * s.nb
                          THEN 1 ELSE 0 END AS BIGINT) AS flagged
         FROM bd LEFT JOIN bsco s USING (doc_id)
           LEFT JOIN th ON bd.source IS NOT DISTINCT FROM th.source
         ORDER BY bd.doc_id""",

    // The ONE-SHOT TF-IDF (q50's SQL with q50's rank aliased rnk):
    // the merged-partials path must reproduce it bit-for-bit.
    "q137_tfidf_merge" ->
      """WITH tok AS (SELECT doc_id,
                        unnest(regexp_split_to_array(trim(text), '\s+')) token
                      FROM documents),
          tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) tf
                 FROM tok GROUP BY doc_id, token),
          n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) n FROM documents),
          dfr AS (SELECT token, CAST(COUNT(*) AS BIGINT) df FROM tf GROUP BY token),
          sc AS (SELECT doc_id, t.token, t.tf, dfr.df,
                   t.tf * CAST(round(ln(n.n / dfr.df) * 1000000, 0) AS BIGINT)
                     AS score_e6
                 FROM tf t JOIN dfr USING (token), n),
          r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                  ORDER BY score_e6 DESC, token) rnk FROM sc)
          SELECT doc_id, rnk, token, tf, df, score_e6 FROM r
          WHERE rnk <= 5 ORDER BY doc_id, rnk""",

    // The ONE-SHOT sketch (q87's SQL verbatim): the merged-cells path
    // must reproduce it bit-for-bit.
    "q136_cms_merge" ->
      """WITH tok AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
                      FROM documents),
          cells AS (SELECT r,
                      ('0x' || substr(md5(CAST(r AS VARCHAR) || ' ' || token), 1, 15))::BIGINT
                        % 256 AS b,
                      CAST(COUNT(*) AS BIGINT) AS c
                    FROM tok CROSS JOIN range(4) t(r) GROUP BY 1, 2),
          top AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM tok
                  GROUP BY token ORDER BY freq DESC, token LIMIT 25),
          probes AS (SELECT token, freq, r,
                       ('0x' || substr(md5(CAST(r AS VARCHAR) || ' ' || token), 1, 15))::BIGINT
                         % 256 AS b
                     FROM top CROSS JOIN range(4) t(r)),
          e AS (SELECT token, MIN(freq) AS freq, MIN(c) AS est
                FROM probes JOIN cells USING (r, b) GROUP BY token)
          SELECT token, freq, est,
                 CAST(CASE WHEN est >= freq THEN 1 ELSE 0 END AS BIGINT) AS ok
          FROM e ORDER BY freq DESC, token""",

    // The ONE-SHOT corpus LM scorer (q55's SQL verbatim): the merged-
    // partials path must reproduce it bit-for-bit.
    "q135_lm_merge" ->
      s"""WITH $tokCte,
          bg AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)),
                   i -> array_to_string(tk[i:i+1], ' '))) g FROM toks),
          cab AS (SELECT g, CAST(COUNT(*) AS BIGINT) n_ab FROM bg GROUP BY g),
          ca AS (SELECT split_part(g, ' ', 1) a, CAST(SUM(n_ab) AS BIGINT) n_a
                 FROM cab GROUP BY 1),
          sc AS (SELECT doc_id,
                   CAST(round(ln(CAST(n_ab AS DOUBLE) / n_a) * 1000000, 0)
                        AS BIGINT) lp
                 FROM bg JOIN cab USING (g)
                   JOIN ca ON split_part(g, ' ', 1) = a)
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                 CAST(SUM(lp) AS BIGINT) AS sum_logp_e6,
                 CAST(SUM(lp) AS BIGINT) / 1000000.0 / COUNT(*) AS avg_logp
          FROM sc GROUP BY doc_id ORDER BY doc_id""",

    // Landed-trained merge rounds (the q113 CTE chain restricted to
    // the %5!=2 slice), then every BATCH word segmented FROM
    // CHARACTERS through the 8 merges in learned order — unseen batch
    // words segment too, matching the Spark face.
    "q134_bpe_incremental" -> {
      val batchSeg = (1 to 8).map { i =>
        s"""
      b$i AS (SELECT source, word,
                replace(seg, ' ' || m.lhs || ' ' || m.rhs || ' ',
                  ' ' || m.lhs || m.rhs || ' ') seg
              FROM b${i - 1}, m$i m)"""
      }.mkString(",")
      s"""WITH ${ingestBpeCtes},
      bw AS (SELECT source, w word FROM (
               SELECT source,
                 unnest(regexp_split_to_array(trim(text), '\\s+')) w
               FROM documents WHERE doc_id % 5 = 2) t
             WHERE regexp_matches(w, '^[a-z0-9]+$$')),
      b0 AS (SELECT source, word,
               ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') || '</w> ' seg
             FROM bw),$batchSeg
      SELECT source,
             CAST(COUNT(*) AS BIGINT) n_words,
             CAST(SUM(len(regexp_split_to_array(trim(seg), ' '))) AS BIGINT)
               n_subwords,
             CAST(SUM(len(word) + 1) AS BIGINT) n_symbols0,
             CAST(CAST(SUM(len(regexp_split_to_array(trim(seg), ' ')))
               AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT)
               subwords_per_mword,
             CAST(CAST(SUM(len(regexp_split_to_array(trim(seg), ' ')))
               AS HUGEINT) * 1000000 // SUM(len(word) + 1) AS BIGINT)
               compression_ppm
      FROM b8 GROUP BY source ORDER BY source"""
    },

    // q207: measure + decide + both serve chains, final select gated
    // on the decision scalar (the q197 device applied to the BPE
    // artifact)
    "q207_tokenizer_policy" -> tokenizerPolicyOracle,

    // q208: two unrolled GD chains (landed %4!=2, grown full) + the
    // pass-rate drift decision + both scoring branches gated on it
    "q208_classifier_policy" -> classifierPolicyOracle(10000L),
  )

  /** The q208 oracle: the q123 training chain twice ([[qcChainCtes]]
    * prefixed `l` over the landed slice, `g` over the grown corpus),
    * the batch's feature/label CTEs, its scores under EACH final
    * weight table, the pass-rate drift decision as a one-row scalar,
    * and both scoring branches UNION'd each gated on it — the q197
    * device applied to the trained classifier. */
  protected def classifierPolicyOracle(maxDriftPpm: Long): String = {
    def servedSel(zRel: String) =
      s"""SELECT z.doc_id, d.source, y.y AS label, z.z AS z_e6,
               CAST(CASE WHEN z.z >= 0 THEN 1 ELSE 0 END AS BIGINT)
                 predicted
         FROM $zRel z JOIN documents d USING (doc_id)
           JOIN byy y USING (doc_id)"""
    def rateSel(zRel: String) =
      s"""SELECT CAST(CAST(SUM(CASE WHEN z >= 0 THEN 1 ELSE 0 END)
               AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT) rate
         FROM $zRel"""
    s"""WITH RECURSIVE ${qcChainCtes(3, " WHERE doc_id % 4 != 2", "l")},
        ${qcChainCtes(3, "", "g")},
        btb AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) x FROM (
                 SELECT doc_id,
                   CAST(('0x' || substr(md5(token), 1, 15))::BIGINT % 64
                     AS INT) b
                 FROM (SELECT doc_id,
                         unnest(regexp_split_to_array(trim(text), '\\s+'))
                           token
                       FROM documents WHERE doc_id % 4 = 2) t) tt
               GROUP BY doc_id, b
               UNION ALL
               SELECT doc_id, CAST(64 AS INT), CAST(1 AS BIGINT)
               FROM documents WHERE doc_id % 4 = 2),
        byy AS (SELECT doc_id,
                 CASE WHEN source = 'src0' THEN CAST(1 AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END y
               FROM documents WHERE doc_id % 4 = 2),
        bzl AS (SELECT doc_id, CAST(SUM(w*x) AS BIGINT) z
               FROM btb JOIN lw3 USING (b) GROUP BY doc_id),
        bzg AS (SELECT doc_id, CAST(SUM(w*x) AS BIGINT) z
               FROM btb JOIN gw3 USING (b) GROUP BY doc_id),
        lrate AS (${rateSel("lzf")}),
        brate AS (${rateSel("bzl")}),
        dec AS (SELECT b.rate - l.rate AS drift_ppm,
                  CASE WHEN abs(b.rate - l.rate) > $maxDriftPpm
                       THEN 1 ELSE 0 END trip
                FROM brate b, lrate l)
        SELECT 'keep' AS "action", d.drift_ppm, s.doc_id, s.source,
               s.label, s.z_e6, s.predicted
        FROM (${servedSel("bzl")}) s, dec d WHERE d.trip = 0
        UNION ALL
        SELECT 'rebuild', d.drift_ppm, s.doc_id, s.source, s.label,
               s.z_e6, s.predicted
        FROM (${servedSel("bzg")}) s, dec d WHERE d.trip = 1
        ORDER BY doc_id"""
  }

  /** q123's logistic-regression training unrolled to `rounds` explicit
    * CTE rounds — exact integer dot products and gradients; the one
    * float op per round (σ) is e6-rounded the instant it appears, and
    * the weight update's double product/divide has the same IEEE
    * evaluation order as the Spark side, so every intermediate weight
    * table replays bit-identically. */
  /** One unrolled GD training chain of the q123 oracle family, every
    * CTE name prefixed with `p` and the training corpus restricted by
    * `docWhere`, so two chains (landed + grown, q208) can hang off one
    * WITH. Ends in `${p}zf(doc_id, z)` — the training docs' scores
    * under the final weights `${p}w<rounds>`. */
  private def qcChainCtes(rounds: Int, docWhere: String = "",
      p: String = ""): String = {
    val roundCtes = (1 to rounds).map { i =>
      s"""${p}z$i AS (SELECT doc_id, CAST(SUM(w*x) AS BIGINT) z
               FROM ${p}tb JOIN ${p}w${i - 1} USING (b) GROUP BY doc_id),
          ${p}r$i AS (SELECT z.doc_id,
                    CAST(round((1/(1 + exp(-CAST(z.z AS DOUBLE)/1000000))
                      - y.y)*1000000) AS BIGINT) r
                  FROM ${p}z$i z JOIN ${p}yy y USING (doc_id)),
          ${p}g$i AS (SELECT b, CAST(SUM(r*x) AS BIGINT) g
                  FROM ${p}tb JOIN ${p}r$i USING (doc_id) GROUP BY b),
          ${p}w$i AS (SELECT w.b,
                    w.w - CAST(round(CAST(COALESCE(g.g, 0) AS DOUBLE)
                      * 0.5 / nn.n) AS BIGINT) w
                  FROM ${p}w${i - 1} w LEFT JOIN ${p}g$i g USING (b),
                    ${p}nn nn)"""
    }.mkString(",\n          ")
    s"""${p}tb AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) x FROM (
                 SELECT doc_id,
                   CAST(('0x' || substr(md5(token), 1, 15))::BIGINT % 64
                     AS INT) b
                 FROM (SELECT doc_id,
                         unnest(regexp_split_to_array(trim(text), '\\s+'))
                           token
                       FROM documents$docWhere) t) tt
               GROUP BY doc_id, b
               UNION ALL
               SELECT doc_id, CAST(64 AS INT), CAST(1 AS BIGINT)
               FROM documents$docWhere),
        ${p}yy AS (SELECT doc_id,
                 CASE WHEN source = 'src0' THEN CAST(1 AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END y
               FROM documents$docWhere),
        ${p}nn AS (SELECT CAST(COUNT(*) AS BIGINT) n
               FROM documents$docWhere),
        ${p}w0 AS (SELECT CAST(t.b AS INT) b, CAST(0 AS BIGINT) w
               FROM range(65) t(b)),
        $roundCtes,
        ${p}zf AS (SELECT doc_id, CAST(SUM(w*x) AS BIGINT) z
               FROM ${p}tb JOIN ${p}w$rounds USING (b) GROUP BY doc_id)"""
  }

  private def qcOracleWith(rounds: Int, tail: String): String =
    s"""WITH RECURSIVE ${qcChainCtes(rounds)}
        $tail"""

  protected def qcOracle(rounds: Int): String =
    qcOracleWith(rounds,
      """SELECT d.doc_id, d.source, y.y AS label, zf.z AS z_e6,
               CAST(CASE WHEN zf.z >= 0 THEN 1 ELSE 0 END AS BIGINT)
                 predicted
        FROM documents d JOIN yy y USING (doc_id) JOIN zf USING (doc_id)
        ORDER BY d.doc_id""")

  /** q161: the q123 chain (zf) continued with the q94 gate features
    * and the q89 ppl-rank chain, folded to RAW per-method flags and
    * the 3-pair agreement matrix. CTE namespaces are disjoint by
    * construction (qc: tb/yy/nn/w·/z·/r·/g·/zf; gate: qf/qg; ppl:
    * toks/bg/cab/ca/psc/sco/pj). */
  protected def qcAgreementOracle(rounds: Int): String =
    qcOracleWith(rounds,
      s""", $tokCte,
        qf AS (SELECT doc_id,
                 CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) n_tok,
                 CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT) n_chr,
                 CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                   x -> list_contains(['the','a','an','and','of','to','in','is','on','for','with'], x))) AS BIGINT) n_stop,
                 CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) n_uniq
               FROM documents),
        qg AS (SELECT doc_id,
                 CASE WHEN (CASE WHEN n_tok < 30 THEN 1 ELSE 0 END) +
                   (CASE WHEN n_chr*10 < n_tok*38 OR n_chr*10 > n_tok*50 THEN 2 ELSE 0 END) +
                   (CASE WHEN n_stop*20 < n_tok THEN 4 ELSE 0 END) +
                   (CASE WHEN n_uniq*5 < n_tok*2 THEN 8 ELSE 0 END) != 0
                 THEN 1 ELSE 0 END fg
               FROM qf),
        bg AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)),
                 i -> array_to_string(tk[i:i+1], ' '))) g FROM toks),
        cab AS (SELECT g, CAST(COUNT(*) AS BIGINT) n_ab FROM bg GROUP BY g),
        ca AS (SELECT split_part(g, ' ', 1) a, CAST(SUM(n_ab) AS BIGINT) n_a
               FROM cab GROUP BY 1),
        psc AS (SELECT doc_id,
                  CAST(round(ln(CAST(n_ab AS DOUBLE) / n_a) * 1000000, 0)
                       AS BIGINT) lp
                FROM bg JOIN cab USING (g)
                  JOIN ca ON split_part(g, ' ', 1) = a),
        sco AS (SELECT doc_id,
                  CAST(SUM(lp) AS BIGINT) / 1000000.0 / COUNT(*) avg_logp
                FROM psc GROUP BY doc_id),
        pj AS (SELECT d.doc_id,
                 row_number() OVER (PARTITION BY d.source
                   ORDER BY s.avg_logp, d.doc_id) rn,
                 COUNT(*) OVER (PARTITION BY d.source) cnt
               FROM documents d JOIN sco s USING (doc_id)),
        flags AS (SELECT d.doc_id, qg.fg,
                    COALESCE(CASE WHEN pj.rn * 10000 <= pj.cnt * 1000
                      THEN 1 ELSE 0 END, 0) fp,
                    CASE WHEN zf.z >= 0 THEN 0 ELSE 1 END fc
                  FROM documents d JOIN qg USING (doc_id)
                  LEFT JOIN pj USING (doc_id) JOIN zf USING (doc_id)),
        t AS (SELECT CAST(SUM(fg) AS BIGINT) ng, CAST(SUM(fp) AS BIGINT) np,
                     CAST(SUM(fc) AS BIGINT) nc,
                     CAST(SUM(fg*fp) AS BIGINT) bgp,
                     CAST(SUM(fg*fc) AS BIGINT) bgc,
                     CAST(SUM(fp*fc) AS BIGINT) bpc FROM flags)
        SELECT m1, m2, n1, n2, n_both,
               CASE WHEN n1 + n2 - n_both > 0 THEN
                 CAST(n_both * 1000000 // (n1 + n2 - n_both) AS BIGINT)
               END AS jaccard_ppm
        FROM (SELECT 'gate' m1, 'ppl' m2, ng n1, np n2, bgp n_both FROM t
              UNION ALL SELECT 'gate', 'classifier', ng, nc, bgc FROM t
              UNION ALL SELECT 'ppl', 'classifier', np, nc, bpc FROM t)
        ORDER BY m1, m2""")

  /** q165: the q123 chain (zf) continued with q43's cluster walk; the
    * representative is the per-cluster rank-1 row under
    * (z DESC, doc_id) — exactly max_by(id, (z, -id)). */
  protected def qcClusterRepOracle(rounds: Int): String =
    qcOracleWith(rounds,
      s""", $tokCte, $shingleCte, $minhashPairCte,
        ce AS (SELECT a_id u, b_id v FROM mhp
               UNION ALL SELECT b_id, a_id FROM mhp),
        walk(u, r) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT w.u, ce.v FROM walk w JOIN ce ON ce.u = w.r),
        cl AS (SELECT u AS doc_id, MIN(r) AS cluster_id FROM walk GROUP BY u),
        cj AS (SELECT cl.cluster_id, cl.doc_id, zf.z
               FROM cl JOIN zf USING (doc_id)),
        cr AS (SELECT cluster_id, doc_id, z,
                 ROW_NUMBER() OVER (PARTITION BY cluster_id
                   ORDER BY z DESC, doc_id) rn
               FROM cj),
        cc AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) n_docs
               FROM cj GROUP BY cluster_id)
        SELECT cr.cluster_id, cc.n_docs, cr.doc_id AS rep_id,
               cr.z AS rep_z_e6
        FROM cr JOIN cc USING (cluster_id)
        WHERE rn = 1 ORDER BY cluster_id""")

  /** q154: the q123 chain's final scores σ-mapped (the training float-
    * once device) and folded into fixed-width z bins; both rate
    * divisions non-negative, the gap a plain subtraction. */
  protected def qcCalibrationOracle(rounds: Int, widthE6: Long): String =
    qcOracleWith(rounds,
      s"""SELECT bin, n, n_pos,
                CAST(n_pos * 1000000 // n AS BIGINT) AS pos_rate_ppm,
                CAST(sp // n AS BIGINT) AS avg_p_ppm,
                CAST(sp // n - n_pos * 1000000 // n AS BIGINT) AS gap_ppm
         FROM (SELECT CAST(floor(CAST(z AS DOUBLE) / $widthE6.0) AS BIGINT)
                        bin,
                      CAST(COUNT(*) AS BIGINT) n,
                      CAST(SUM(y) AS BIGINT) n_pos,
                      CAST(SUM(CAST(round((1/(1 + exp(-CAST(z AS DOUBLE)
                        /1000000)))*1000000) AS BIGINT)) AS BIGINT) sp
               FROM zf JOIN yy USING (doc_id) GROUP BY 1) t
         ORDER BY bin""")

  /** q155: Mann–Whitney AUC over the q123 chain's final scores — the
    * value-histogram rank-sum replayed as one global cumsum (the
    * two-level blocking on the Spark side is an execution detail; the
    * answer is block-width-independent, which this oracle proves).
    * U2 doubled to keep tied pairs integral; the ppm division
    * HUGEINT-widened exactly like the Spark side's DECIMAL(38,0). */
  protected def qcAucOracle(rounds: Int): String =
    qcOracleWith(rounds,
      """SELECT n_docs, n_pos, n_neg, n_correct, tie_pairs, u2,
               CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                 CAST(CAST(u2 AS HUGEINT) * 1000000
                      // (CAST(2 AS HUGEINT) * n_pos * n_neg) AS BIGINT)
               END AS auc_ppm,
               CAST(n_correct * 1000000 // n_docs AS BIGINT) AS acc_ppm
        FROM (
          SELECT CAST(SUM(n) AS BIGINT) n_docs,
                 CAST(SUM(pos) AS BIGINT) n_pos,
                 CAST(SUM(n - pos) AS BIGINT) n_neg,
                 CAST(SUM(CASE WHEN z >= 0 THEN pos ELSE n - pos END)
                   AS BIGINT) n_correct,
                 CAST(SUM(pos * (n - pos)) AS BIGINT) tie_pairs,
                 CAST(SUM(pos * (2*cum_neg + (n - pos))) AS BIGINT) u2
          FROM (
            SELECT z, n, pos,
                   CAST(COALESCE(SUM(n - pos) OVER (ORDER BY z
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS BIGINT) cum_neg
            FROM (SELECT z, CAST(COUNT(*) AS BIGINT) n,
                         CAST(SUM(y) AS BIGINT) pos
                  FROM zf JOIN yy USING (doc_id) GROUP BY z) h) c) t""")

  /** The q207 oracle: TWO unrolled BPE training chains (landed %5!=2,
    * prefixed `l`; grown full-corpus, prefixed `g`), the landed
    * baseline fertility (landed words dict-joined to the landed final
    * dict — the [[bpeApplyOracle]] device restricted to landed docs),
    * the batch segmented FROM CHARACTERS through each chain's merge
    * sequence (the q134 device, prefixed per chain), the drift
    * decision as a one-row scalar, and both serve branches' per-source
    * stats UNION'd with each side gated on the decision — measure +
    * decide + consequence all hash-checked together (the q197
    * device). */
  protected def tokenizerPolicyOracle: String = {
    def segChain(bp: String, mp: String) = (1 to 8).map { i =>
      s"""
      $bp$i AS (SELECT source, word,
                replace(seg, ' ' || m.lhs || ' ' || m.rhs || ' ',
                  ' ' || m.lhs || m.rhs || ' ') seg
              FROM $bp${i - 1}, ${mp}m$i m)"""
    }.mkString(",")
    def statsSel(rel: String) =
      s"""SELECT source,
             CAST(COUNT(*) AS BIGINT) n_words,
             CAST(SUM(len(regexp_split_to_array(trim(seg), ' '))) AS BIGINT)
               n_subwords,
             CAST(SUM(len(word) + 1) AS BIGINT) n_symbols0,
             CAST(CAST(SUM(len(regexp_split_to_array(trim(seg), ' ')))
               AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT)
               subwords_per_mword,
             CAST(CAST(SUM(len(regexp_split_to_array(trim(seg), ' ')))
               AS HUGEINT) * 1000000 // SUM(len(word) + 1) AS BIGINT)
               compression_ppm
           FROM $rel GROUP BY source"""
    s"""WITH ${bpeCtes(8, " WHERE doc_id % 5 != 2", "l")},
      ${bpeCtes(8, "", "g")},
      lwords AS (SELECT w word FROM (
               SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) w
               FROM documents WHERE doc_id % 5 != 2) t
             WHERE regexp_matches(w, '^[a-z0-9]+$$')),
      lnsub AS (SELECT word,
                 CAST(len(regexp_split_to_array(trim(seg), ' ')) AS BIGINT)
                   nsub
               FROM ld8),
      lbase AS (SELECT CAST(CAST(SUM(nsub) AS HUGEINT) * 1000000 // COUNT(*)
                  AS BIGINT) spw
                FROM lwords JOIN lnsub USING (word)),
      batw AS (SELECT source, w word FROM (
               SELECT source,
                 unnest(regexp_split_to_array(trim(text), '\\s+')) w
               FROM documents WHERE doc_id % 5 = 2) t
             WHERE regexp_matches(w, '^[a-z0-9]+$$')),
      fb0 AS (SELECT source, word,
               ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') || '</w> ' seg
             FROM batw),${segChain("fb", "l")},
      gb0 AS (SELECT source, word, seg FROM fb0),${segChain("gb", "g")},
      bspw AS (SELECT CAST(CAST(SUM(len(regexp_split_to_array(trim(seg),
                  ' '))) AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT) spw
               FROM fb8),
      dec AS (SELECT b.spw - l.spw AS drift_e6,
                     CASE WHEN b.spw - l.spw > 0 THEN 1 ELSE 0 END trip
              FROM bspw b, lbase l)
      SELECT 'keep' AS "action", d.drift_e6, s.*
      FROM (${statsSel("fb8")}) s, dec d WHERE d.trip = 0
      UNION ALL
      SELECT 'rebuild', d.drift_e6, s.*
      FROM (${statsSel("gb8")}) s, dec d WHERE d.trip = 1
      ORDER BY source"""
  }

  /** The BPE merge loop unrolled to `steps` explicit CTE rounds — the
    * oracle replays the identical word dict, character segmentation,
    * weighted pair count, (count desc, lhs, rhs) argmax, and greedy
    * left-to-right `replace` merge, then digests the full post-merge
    * dictionary state per step (Σ hash60(word|freq|seg) mod 1e9+7). */
  protected def bpeOracle(steps: Int): String = {
    val union = (1 to steps).map(i => s"SELECT * FROM g$i").mkString(" UNION ALL ")
    s"WITH ${bpeCtes(steps)} SELECT * FROM ($union) ORDER BY step"
  }

  /** q115: the q113 merge chain applied — per-source subword stats off
    * the final segmented dict d`steps`, ppm via HUGEINT (Spark side
    * DECIMAL(38,0)) so corpus-scale products cannot wrap BIGINT. */
  protected def bpeApplyOracle(steps: Int): String =
    s"""WITH ${bpeCtes(steps)},
      f AS (SELECT word,
              CAST(len(regexp_split_to_array(trim(seg), ' ')) AS BIGINT) nsub
            FROM d$steps),
      cw AS (SELECT source, w word FROM (
               SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) w
               FROM documents) t
             WHERE regexp_matches(w, '^[a-z0-9]+$$'))
      SELECT source,
             CAST(COUNT(*) AS BIGINT) n_words,
             CAST(SUM(nsub) AS BIGINT) n_subwords,
             CAST(SUM(len(word) + 1) AS BIGINT) n_symbols0,
             CAST(CAST(SUM(nsub) AS HUGEINT) * 1000000 // COUNT(*)
               AS BIGINT) subwords_per_mword,
             CAST(CAST(SUM(nsub) AS HUGEINT) * 1000000 // SUM(len(word) + 1)
               AS BIGINT) compression_ppm
      FROM cw JOIN f USING (word) GROUP BY source ORDER BY source"""

  /** Shared CTE chain of the BPE oracles: w0/d0 (word dict + character
    * segmentation) then `steps` unrolled merge rounds ending in
    * d`steps` (final dict) and g1..g`steps` (per-step merge rows). */
  /** q134's landed-slice training chain. */
  protected def ingestBpeCtes: String = bpeCtes(8, " WHERE doc_id % 5 != 2")

  protected def bpeCtes(steps: Int, docWhere: String = "",
      p: String = ""): String = {
    val base = s"""
      ${p}w0 AS (SELECT w word, CAST(COUNT(*) AS BIGINT) freq FROM (
               SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) w
               FROM documents$docWhere) t
             WHERE regexp_matches(w, '^[a-z0-9]+$$') GROUP BY w),
      ${p}d0 AS (SELECT word, freq,
               ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') || '</w> ' seg
             FROM ${p}w0)"""
    val rounds = (1 to steps).map { i =>
      s"""
      ${p}s$i AS (SELECT freq, regexp_split_to_array(trim(seg), ' ') sy
              FROM ${p}d${i - 1}),
      ${p}p$i AS (SELECT u['l'] lhs, u['r'] rhs, CAST(SUM(freq) AS BIGINT) c
              FROM (SELECT freq, unnest(list_transform(range(1, len(sy)),
                      k -> struct_pack(l := sy[k], r := sy[k + 1]))) u
                    FROM ${p}s$i) GROUP BY lhs, rhs),
      ${p}m$i AS (SELECT lhs, rhs, c FROM ${p}p$i
              ORDER BY c DESC, lhs, rhs LIMIT 1),
      ${p}d$i AS (SELECT word, freq,
                replace(seg, ' ' || m.lhs || ' ' || m.rhs || ' ',
                  ' ' || m.lhs || m.rhs || ' ') seg
              FROM ${p}d${i - 1}, ${p}m$i m),
      ${p}g$i AS (SELECT $i step, m.lhs, m.rhs, m.c pair_count,
                CAST(CAST(SUM(('0x' || substr(md5(word || '|' || freq ||
                    '|' || seg), 1, 15))::BIGINT) AS HUGEINT)
                  % 1000000007 AS BIGINT) vocab_digest
              FROM ${p}d$i, ${p}m$i m GROUP BY m.lhs, m.rhs, m.c)"""
    }.mkString(",")
    s"$base,$rounds"
  }

}
