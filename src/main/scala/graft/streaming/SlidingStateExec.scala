package graft.streaming

import graft.model.{Alert, KeyedEvent, Rule}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.math.{BigDecimal => JBigDecimal}

/** W1: the per-event-emission sliding window — the one operator Spark's
  * native `window()` cannot express (it emits per *trigger*, not per
  * *event*). Mirrors the reference's manual keyed state design
  * (`operator/DynamicQueryFunction.java:42-51,69-204`) on Spark's
  * `flatMapGroupsWithState`:
  *
  *  - state per (ruleId, group key): a timestamp-bucketed store, but
  *    holding *incremental partial aggregates* per millisecond bucket
  *    (count/sum/min/max) instead of raw event sets — same results as the
  *    reference's full rescan (`DynamicQueryFunction.java:160-164`),
  *    asymptotically cheaper (SURVEY §2.3.2);
  *  - every arriving event inserts its bucket, evicts buckets older than
  *    `t − window` (W5 eviction, reference `:243-266`), merges the
  *    remaining partials over the *inclusive* `[t − w, t]` interval
  *    (reference `:277-280`), applies the HAVING comparison, and emits
  *    one [[Alert]] — emission cadence is data-driven, exactly one output
  *    per input event;
  *  - a processing-time timeout (reference's cleanup timer, `:156-157`)
  *    drops state for keys idle longer than the window.
  *
  * All arithmetic is exact `java.math.BigDecimal`, like the reference's
  * accumulators. Scale behavior: state size per key is O(distinct event
  * millis within the window) and the operator shuffles once on the group
  * key — identical exchange shape to the reference's `keyBy`.
  */
object SlidingStateExec {

  /** Per-bucket partial aggregate (decimal strings keep the state codec
    * simple and exact under Spark's product encoder). */
  final case class Bucket(cnt: Long, sum: String, min: String, max: String)
  final case class WinState(buckets: Map[Long, Bucket])

  /** @param timeout `ProcessingTimeTimeout` enables idle-key state GC
    *   (the reference's cleanup timer) but makes the query re-trigger
    *   forever, so `processAllAvailable` never returns — use it for
    *   long-running production queries; `NoTimeout` (default) for bounded
    *   runs and tests. Window eviction inside the function bounds state
    *   for *active* keys either way. */
  def run(keyed: Dataset[KeyedEvent], rules: Map[Long, Rule],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout()): Dataset[Alert] = {
    implicit val alertEnc = Encoders.product[Alert]
    implicit val stateEnc = Encoders.product[WinState]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    val timeoutEnabled = timeout == GroupStateTimeout.ProcessingTimeTimeout()

    keyed
      .groupByKey(e => (e.ruleId, e.key))
      .flatMapGroupsWithState[WinState, Alert](OutputMode.Append(), timeout) {
        case ((ruleId, key), events, state) =>
          if (state.hasTimedOut) {
            // reference's eviction timer path (`:243-266`): key idle past
            // its window — drop the whole store
            state.remove()
            Iterator.empty
          } else rules.get(ruleId) match {
            case None =>
              // rule no longer live (reference guard `DynamicQueryFunction
              // .java:85-88`): drop state, emit nothing
              if (state.exists) state.remove()
              Iterator.empty
            case Some(rule) =>
              val w = rule.windowMilliseconds.getOrElse(0L)
              val out = scala.collection.mutable.ArrayBuffer.empty[Alert]
              var buckets = state.getOption.map(_.buckets).getOrElse(Map.empty)
              // deterministic processing order within a micro-batch
              for (e <- events.toSeq.sortBy(ev => (ev.tsMillis, ev.payload))) {
                buckets = insert(buckets, e)
                buckets = buckets.filter { case (ts, _) => ts >= e.tsMillis - w }
                val agg = merge(rule, buckets, e.tsMillis - w, e.tsMillis)
                val passed = rule.applyLimit(BigDecimal(agg))
                out += Alert(ruleId, key, e.tsMillis, agg.toPlainString, passed, e.payload)
              }
              state.update(WinState(buckets))
              if (timeoutEnabled) state.setTimeoutDuration(math.max(w, 1000L))
              out.iterator
          }
      }
  }

  private def insert(buckets: Map[Long, Bucket], e: KeyedEvent): Map[Long, Bucket] = {
    val v = if (e.aggIn == null || e.aggIn.isEmpty) null else new JBigDecimal(e.aggIn)
    val b = buckets.get(e.tsMillis)
    val nb = b match {
      case None =>
        Bucket(1,
          if (v == null) "0" else v.toPlainString,
          if (v == null) "" else v.toPlainString,
          if (v == null) "" else v.toPlainString)
      case Some(old) =>
        if (v == null) old.copy(cnt = old.cnt + 1)
        else Bucket(
          old.cnt + 1,
          new JBigDecimal(old.sum).add(v).toPlainString,
          if (old.min.isEmpty || v.compareTo(new JBigDecimal(old.min)) < 0) v.toPlainString else old.min,
          if (old.max.isEmpty || v.compareTo(new JBigDecimal(old.max)) > 0) v.toPlainString else old.max)
    }
    buckets.updated(e.tsMillis, nb)
  }

  /** Merge partials over `[lo, hi]` (inclusive both ends) and render the
    * rule's aggregate. AVG uses the same defined rounding as the batch
    * path: HALF_UP at scale 6. */
  private[streaming] def merge(rule: Rule, buckets: Map[Long, Bucket],
      lo: Long, hi: Long): JBigDecimal = {
    import graft.model.AggregatorType._
    val in = buckets.collect { case (ts, b) if ts >= lo && ts <= hi => b }
    val cnt = in.iterator.map(_.cnt).sum
    if (rule.isCount) return new JBigDecimal(cnt)
    val agg = rule.aggregatorFunctionType.getOrElse(
      throw new IllegalArgumentException(s"rule ${rule.queryId}: no aggregator"))
    if (cnt == 0) return JBigDecimal.ZERO
    agg match {
      case Sum => in.iterator.map(b => new JBigDecimal(b.sum))
        .reduce(_ add _)
      case Avg =>
        val s = in.iterator.map(b => new JBigDecimal(b.sum)).reduce(_ add _)
        s.divide(new JBigDecimal(cnt), 6, java.math.RoundingMode.HALF_UP)
      case Min => in.iterator.filter(_.min.nonEmpty).map(b => new JBigDecimal(b.min))
        .reduceOption((a, b) => if (a.compareTo(b) <= 0) a else b)
        .getOrElse(JBigDecimal.ZERO)
      case Max => in.iterator.filter(_.max.nonEmpty).map(b => new JBigDecimal(b.max))
        .reduceOption((a, b) => if (a.compareTo(b) >= 0) a else b)
        .getOrElse(JBigDecimal.ZERO)
    }
  }
}
