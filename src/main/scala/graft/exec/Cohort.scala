package graft.exec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis: users grouped by the period of their first
  * activity (the cohort), counted again in every later period they
  * remain active — the table behind every retention curve.
  *
  * Two keyed shuffles, both narrow: (user → first period) is a groupBy
  * on the user key over (user, period) pairs; the join back is on the
  * same key (AQE broadcasts the cohort table when it fits); the final
  * count is a groupBy on (cohort, offset) — thousands of cells
  * regardless of event volume. Nothing wide ever shuffles: events
  * reduce to distinct (user, period) before anything else, so a user
  * with a million events in a week costs one row past the first
  * aggregate. */
object Cohort {
  /** Event-type transition counts (the first-order Markov table of user
    * behavior): for every consecutive pair of events of the same user —
    * ordered by (ts, event id), a total order, so the successor is
    * well-defined under same-ms ties — count (from_type, to_type). One
    * shuffle on the user key for the lag window, then a tiny
    * (|types|²-cell) aggregation; event payloads never shuffle, only
    * (user, ts, id, type). Output: (from_type, to_type, n). */
  def transitions(events: DataFrame, userCol: String, tsMsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(col(tsMsCol), col(idCol))
    events
      .select(col(userCol), col(tsMsCol), col(idCol), col(typeCol))
      .withColumn("to_type", lead(col(typeCol), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Output: (cohort, offset, n_users) — users first active in period
    * `cohort` (epoch-ms bucket floor) who were active again `offset`
    * periods later (offset 0 = the cohort size itself). */
  def retention(events: DataFrame, userCol: String, tsMsCol: String,
      periodMs: Long): DataFrame = {
    require(periodMs > 0, "periodMs must be positive")
    val active = events
      .select(col(userCol).as("u"),
        expr(s"CAST($tsMsCol AS BIGINT) div ${periodMs}L").as("p"))
      .distinct()
    val cohorts = active.groupBy("u").agg(min(col("p")).as("p0"))
    active.join(cohorts, "u")
      .groupBy((col("p0") * periodMs).as("cohort"),
        (col("p") - col("p0")).as("offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
