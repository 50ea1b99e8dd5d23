package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Window
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan invariants for EVERY contract query — the scale
  * properties the per-operator scaladocs claim, asserted so a future
  * edit cannot silently regress them:
  *
  *  - no cartesian product anywhere (a missing join key plans one
  *    silently and works fine at sf0.01);
  *  - an unpartitioned window (single-reducer sort of its whole input)
  *    only where the input is provably tiny — q44 ranks k rows post
  *    top-k, q47's offset table is one row per range partition;
  *  - q01's predicate reaches the parquet scan (pushdown canary: if
  *    this breaks, every filter query is silently scanning full files).
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // queries whose unpartitioned window runs over a bounded-tiny input:
  // q44 ranks k rows post top-k; q47's offset table is one row per range
  // partition; q61's cumsum runs over the value HISTOGRAM (distinct
  // lengths), never the corpus
  private val tinyGlobalWindowOk =
    Set("q44_vocab_topk", "q47_global_rownum", "q61_corpus_report",
      // q166/q181 embed q47's numbering: the only unpartitioned window
      // is the O(partitions)-row offset cumsum
      "q166_epoch_shuffle", "q181_length_curriculum",
      // q155's only unpartitioned window is the per-BLOCK negative
      // cumsum (score-range/blockWidth rows — value-range-scale); the
      // per-score cumsum is partitioned by block
      "q155_classifier_auc",
      // q189's totals fold over the |sources|-row per-source aggregate
      "q189_mixture_shift",
      // q210's min folds over the same |sources|-row aggregate
      "q210_mixture_rebalance")

  /** Physical plan with the AQE wrapper peeled (its children are fields,
    * not `children`, so a bare `collect` sees nothing under it). */
  private def physical(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  // Each query's frame is CONSTRUCTED ONCE and audited by every test —
  // construction is the expensive part (the streaming rows q73/q185/
  // q190/q191 replay a whole stream to build their result frame;
  // re-constructing per test multiplied that by the test count).
  private lazy val frames: Seq[(String, DataFrame)] =
    SparkEntry.queries.toSeq.map { case (name, q) => name -> q(spark, dir) }

  test("no contract query plans a cartesian product") {
    for ((name, df) <- frames) {
      val s = physical(df).toString
      assert(!s.contains("CartesianProduct"),
        s"$name plans a cartesian product")
    }
  }

  // queries allowed a BroadcastNestedLoopJoin: their broadcast side is
  // tiny BY CONSTRUCTION (an ANN query batch, a centroid table, or a
  // one-row count), so the non-equi join is a fused scan, not a blowup
  private val tinyBnljOk = Set(
    "q21_ann_topk", "q37_ann_topk_ivf", "q49_ann_topk_quantized",
    "q56_centroid_confusion", "q50_tfidf_topterms", "q61_corpus_report",
    "q66_temperature_mix", // one-row totals table cross-joined broadcast
    "q71_bm25_topk", // one-row corpus stats (n_docs, total_len) broadcast
    "q72_embed_cohesion", // |labels| centroid rows broadcast, as q56
    "q86_hard_negatives", // the q21 ANN query batch (|corpus|/100), threshold-filtered
    "q90_mixture_weights", // one-row totals table cross-joined broadcast, as q66
    "q92_mg_heavy_hitters", // one-row token total cross-joined broadcast
    "q95_source_unigram_kl", // one-row corpus-N cross-joined broadcast
    "q97_pmi_collocations", // two one-row totals (N_bi, N_uni) broadcast
    "q104_mixture_merge", // one-row totals broadcast, as q90
    "q114_semantic_dedup", // stride-centroid table broadcast, as q37
    "q116_unified_dedup_verdict", // embeds q114's centroid broadcast
    "q117_semantic_incremental", // landed stride-centroid codebook broadcast
    "q118_semantic_dedup_2l", // coarse + fine codebook broadcasts, as q114
    "q120_curation_funnel", // embeds q116's centroid broadcast
    "q121_dsir_select", // one-row totals cross-joined broadcast, as q95
    "q122_semantic_inc_2l", // landed two-level codebook broadcast, as q117
    "q125_dsir_incremental", // one-row landed totals cross-joined, as q121
    "q126_kneser_ney", // one-row distinct-bigram total N cross-joined, as q95
    "q129_ingest_gate", // embeds q122's codebook + q125's totals broadcasts
    "q131_ppl_incremental", // per-stratum boundary-ratio rows, null-safe-joined broadcast
    "q132_ingest_gate_full", // q129's broadcasts + q131's boundary rows
    "q184_absorb_gate", // the gate-2 replay embeds q129's broadcasts over the absorbed artifacts (verified: the BNLJ build side is the one-row DSIR totals aggregate)
    "q187_hybrid_rrf", // embeds q21's broadcast ANN query batch + the one-row BM25 corpus-stats cross
    "q192_hybrid_served", // q187's one-row BM25 stats cross + q133's codebook broadcasts
    "q195_hybrid_audit", // both fused pipelines' broadcasts (q187 + q192)
    "q196_absorb_serve", // q184's gate broadcasts + q192's serve broadcasts over the absorbed kinds
    "q199_retract_gate", // q184's gate broadcasts over the retracted kinds
    "q213_retention_ageout", // q199's gate broadcasts over the age-retracted kinds (verified: the BNLJ build side is the one-row DSIR totals aggregate)
    "q200_churn_gate", // q184's gate-2 broadcasts over the churned (absorbed-then-retracted) kinds
    "q205_snapshot_migrate", // q184's gate broadcasts over the diff-migrated kinds
    "q206_migrate_serve", // q192's serve broadcasts over the diff-migrated kinds
    "q209_snapshot_chain", // q184's gate broadcasts over twice-migrated kinds
    "q202_churn_serve", // q196's gate + serve broadcasts over the churned kinds
    "q189_mixture_shift", // embeds q129's gate broadcasts + its own one-row totals cross
    "q210_mixture_rebalance", // embeds q129's gate broadcasts + the sources-sized rate broadcast
    "q133_ann_ivf_pq", // stride coarse-cell + PQ codebook broadcasts, as q37/q119
    "q158_ivfpq_incremental", // the same codebook broadcasts, landed-sourced
    "q193_codebook_rebuild", // q158's + q133's codebook broadcasts (before/after union)
    "q197_drift_policy", // the served chain's codebook broadcasts behind the drift decision
    "q159_served_ndcg", // q133's codebook broadcasts + q21's query batch
    "q160_codebook_drift", // stride codebook + one-row landed-total broadcasts
    "q163_ingest_drift", // headV-row landed head + one-row total broadcasts
    "q166_epoch_shuffle", // one-row corpus-N cross-joined broadcast, as q95
    "q169_semantic_sweep", // 2L codebook broadcasts (as q118) + one-row total
    "q173_cross_source_lm", // |sources|² pair frame: broadcast cross of two strata-scale sides, as q151
    "q182_xsource_lm_incremental", // the same pair frame over the folded partials
    "q176_semantic_safe_split", // rides the memoized 2L end table, as q118
    "q177_quality_loss", // embeds q116's verdict-table broadcasts
    "q179_sample_coverage", // 2L codebook broadcasts + one-row totals, as q169
    "q180_semantic_sample", // 2L codebook broadcasts, as q118
    "q167_threshold_sweep", // one-row totals cross-joined broadcast, as q66
    "q137_tfidf_merge", // one-row folded-N cross-joined broadcast, as q50
    "q139_hll_merge", // one-row estimate cross-joined onto 64 registers
    "q143_skew_plan", // one-row total cross-joined onto per-key counts
    "q183_skew_join_apply", // embeds q143's one-row-total broadcast; the join itself is hash equi
    "q145_ivfpq_recall", // q133's codebook broadcasts ×4 configs + q21's query batch
    "q146_power_iteration", // one-row max/sign anchors cross-joined onto d rows
    "q147_pca_project", // embeds q146's one-row anchor broadcasts
    "q149_variance_explained", // three one-row aggregates cross-joined
    "q151_source_jaccard", // strata×strata pair frame (human-scale)
    "q152_pca_second") // q146's one-row anchor/norm broadcasts ×2 chains

  test("broadcast nested-loop joins only where the broadcast side is tiny by construction") {
    for ((name, df) <- frames) {
      val s = physical(df).toString
      assert(!s.contains("BroadcastNestedLoopJoin") || tinyBnljOk(name),
        s"$name plans a BroadcastNestedLoopJoin outside the allow-list")
    }
  }

  test("unpartitioned windows only over provably tiny inputs") {
    for ((name, df) <- frames) {
      val global = df.queryExecution.optimizedPlan.collect {
        case w: Window if w.partitionSpec.isEmpty => w
      }
      // every query ends in orderBy for the oracle dump — that is a Sort,
      // not a Window; only rank-style global windows are flagged
      assert(global.isEmpty || tinyGlobalWindowOk(name),
        s"$name has an unpartitioned window over a non-tiny input")
    }
  }

  test("q01's filter reaches the parquet scan (pushdown canary)") {
    val plan = physical(
      frames.toMap.apply("q01_filter_passthrough"))
    val scans = plan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val pushed = scans.flatMap(_.dataFilters).mkString(";")
    assert(pushed.contains("event_type"), s"pushed filters: $pushed")
  }
}
