package graft.exec

import graft.compile.{AggPlan, RuleCompiler}
import graft.model._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-shot (batch) evaluation of a [[graft.model.Rule]] over a DataFrame.
  *
  * This is the batch face of the engine: the same compiled expressions the
  * streaming paths use, applied to a static table. Modes mirror the
  * reference's emission modes (`operator/DynamicQueryFunction.java:91-147`):
  *
  *  - passthrough (no aggregate requested, W4): filter + project;
  *  - global aggregate (no window): plain `groupBy` — the batch-SQL face;
  *  - tumbling (`frequency` absent or `> window`, W2) and
  *    sliding (`0 < frequency <= window`, W3): native `window()`;
  *  - per-event (`frequency == 0`, W1): for *every event*, the aggregate
  *    over the trailing `[t - window, t]` interval (inclusive both ends,
  *    reference `DynamicQueryFunction.java:277-280`) — in batch a range
  *    self-aggregation, executed as a bucketed self-join so it scales:
  *    each probe row touches exactly 2 time buckets instead of the whole
  *    table, and the shuffle is one hash exchange on (keys, bucket).
  *
  * All timestamp math is integer microseconds (`unix_micros`), never
  * doubles: at epoch magnitude a double's ulp is ~0.24 µs, which would make
  * window-boundary membership nondeterministic.
  */
object BatchExec {

  /** Evaluate `rule` over `df`. `tsCol` is the event-time column. */
  def run(rule: Rule, df: DataFrame, tsCol: String = "ts"): DataFrame = {
    val filtered = df.filter(RuleCompiler.filterColumn(rule, Some(df.schema)))
    val hasAgg = rule.isCount || rule.aggregatorFunctionType.isDefined
    if (!hasAgg) filtered
    else if (rule.isPassthrough) globalAgg(rule, filtered)
    else if (rule.isPerEventEmission) perEventSliding(rule, filtered, tsCol)
    else windowed(rule, filtered, tsCol)
  }

  private def finishAgg(rule: Rule, grouped: DataFrame, keep: Seq[Column],
      plan: AggPlan): DataFrame =
    grouped
      .select(keep :+ plan.finalExpr: _*)
      .filter(RuleCompiler.havingColumn(rule))

  /** Windowless aggregate — the plain batch `GROUP BY` face (the reference
    * always windows; batch tables don't have to). */
  private def globalAgg(rule: Rule, df: DataFrame): DataFrame = {
    val plan = RuleCompiler.aggPlan(rule)
    val keys = RuleCompiler.groupColumns(rule)
    val grouped = df.groupBy(keys: _*)
      .agg(plan.aggExprs.head, plan.aggExprs.tail: _*)
    finishAgg(rule, grouped, rule.groupingKeyNames.map(col), plan)
  }

  /** W2/W3: tumbling or sliding windows via Spark's native `window()`.
    * Output: grouping keys, `w_start` (epoch seconds), `agg_value`. */
  private def windowed(rule: Rule, df: DataFrame, tsCol: String): DataFrame = {
    val w = rule.windowMilliseconds.get
    val slide = rule.frequencyMilliseconds.filter(f => f > 0 && f <= w).getOrElse(w)
    val win = window(col(tsCol), s"$w milliseconds", s"$slide milliseconds")
    val plan = RuleCompiler.aggPlan(rule)
    val keys = RuleCompiler.groupColumns(rule)
    val grouped = df.groupBy(win +: keys: _*)
      .agg(plan.aggExprs.head, plan.aggExprs.tail: _*)
      .withColumn("w_start", unix_timestamp(col("window.start").cast("timestamp")))
    val keep = rule.groupingKeyNames.map(col) :+ col("w_start")
    finishAgg(rule, grouped, keep, plan)
  }

  /** W1 (batch analog): per-event trailing-window aggregate.
    *
    * Bucket both sides by `ts_us div window_us`; an event at time `t` only
    * sees rows in its own bucket or the previous one, so the build side is
    * duplicated into (bucket, bucket+1) and the join fans out to exactly 2
    * candidate buckets per probe row — a hash exchange on (keys, bucket)
    * that survives a 100× scale-up where a naive range self-join (cross
    * product per key) would not. Bounds `[t-w, t]` inclusive both ends. */
  private def perEventSliding(rule: Rule, df: DataFrame, tsCol: String): DataFrame = {
    val wUs = rule.windowMilliseconds.get * 1000L
    val keys = rule.groupingKeyNames
    val tsUs = unix_micros(col(tsCol).cast("timestamp"))

    val probe = df
      .withColumn("__ts_us", tsUs)
      .withColumn("__bucket", expr(s"__ts_us div ${wUs}L"))
    val aggField = if (rule.isCount) None else rule.aggregateFieldName
    val buildCols =
      (keys.map(col) :+ col("__ts_us").as("__b_ts_us")) ++
        aggField.map(f => col(f).as("__b_agg_in")).toSeq
    val build = df.withColumn("__ts_us", tsUs).select(buildCols: _*)
      .withColumn("__bucket",
        explode(array(expr(s"__b_ts_us div ${wUs}L"),
                      expr(s"__b_ts_us div ${wUs}L") + lit(1L))))

    val joinKeys = keys :+ "__bucket"
    val joined = probe.join(build, joinKeys, "inner")
      .filter(col("__b_ts_us") >= col("__ts_us") - lit(wUs) &&
              col("__b_ts_us") <= col("__ts_us"))

    // rebind the rule's aggregate onto the build-side column
    val boundRule =
      if (rule.isCount) rule
      else rule.copy(aggregateFieldName = Some("__b_agg_in"))
    val plan = RuleCompiler.aggPlan(boundRule)
    val eventCols = df.columns.map(col).toSeq
    val grouped = joined
      .groupBy(eventCols :+ col("__ts_us"): _*)
      .agg(plan.aggExprs.head, plan.aggExprs.tail: _*)
    finishAgg(rule, grouped, eventCols, plan)
  }

  /** D1: evaluate many windowed rules in one pass — the event×rule fan-out
    * (the reference's "implicit copy" broadcast pattern,
    * `DynamicKeyFunction.java:43-105`). One `(rule_id, group_key, w_start,
    * agg_value)` row per (rule, group, window); the per-rule filters are
    * compiled literals so the single event scan is shared and nothing but
    * matching rows is ever shuffled (filter-before-shuffle, the
    * reference's one hand-built optimization — Catalyst does it for us). */
  def runAll(rules: Seq[Rule], df: DataFrame, tsCol: String = "ts"): DataFrame = {
    require(rules.nonEmpty, "runAll needs at least one rule")
    rules.map { r =>
      require(!r.isPassthrough && !r.isPerEventEmission,
        s"runAll handles windowed rules; rule ${r.queryId} is not")
      run(r, df, tsCol)
        .withColumn("rule_id", lit(r.queryId.getOrElse(-1L)))
        .withColumn("group_key", RuleCompiler.keyStringColumn(r))
        .select("rule_id", "group_key", "w_start", RuleCompiler.AggAlias)
    }.reduce(_ unionByName _)
  }
}
