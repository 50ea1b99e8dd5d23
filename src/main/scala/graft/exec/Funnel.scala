package graft.exec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence (funnel) analysis: which `to`-events were preceded by
  * a `from`-event of the same user within `withinMs` — the conversion
  * primitive of event analytics (click→purchase, view→signup).
  *
  * Shape: ONE running range-window per user — `max(from-event ts)` over
  * `RANGE BETWEEN withinMs PRECEDING AND CURRENT ROW` — then a filter;
  * one hash exchange on the user key, no self-join, no row
  * multiplication, which is the form that survives dense event streams
  * (a time-range self-join ships |from|·|to∩window| pairs; this ships
  * each event once). Same caveat as any window: a single user's history
  * sorts within one partition — user keys are the shard unit, fine
  * unless one user is a torrent (then pre-split by day first). */
object Funnel {
  /** Per-user conversion counts: total `to`-events and how many were
    * preceded by a `from`-event within the horizon. Conversions at the
    * exact same millisecond count (<=, the inclusive convention).
    * Output: (user, n_to, n_converted). */
  def conversions(events: DataFrame, userCol: String, tsMsCol: String,
      typeCol: String, from: String, to: String,
      withinMs: Long): DataFrame = {
    require(withinMs > 0, "withinMs must be positive")
    // the RANGE frame includes the current row, so with from == to every
    // to-event would count ITSELF as its preceding from-event and report
    // 100% conversion — a repeat-event funnel needs an exclusive frame
    require(from != to,
      "conversions: from and to must differ (the inclusive frame would " +
        "let every to-event match itself)")
    val w = Window.partitionBy(userCol).orderBy(col(tsMsCol))
      .rangeBetween(-withinMs, 0)
    events
      .select(col(userCol), col(tsMsCol), col(typeCol))
      .withColumn("__last_from",
        max(when(col(typeCol) === from, col(tsMsCol))).over(w))
      .filter(col(typeCol) === to)
      .groupBy(userCol)
      .agg(count(lit(1)).as("n_to"),
        sum(when(col("__last_from").isNotNull, 1L).otherwise(0L))
          .as("n_converted"))
  }
}
