package graft.sinks

import graft.model.Alert
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Output surfaces (reference K1-K6, C8).
  *
  * Spark has no Flink-style side outputs; the equivalents here are
  * separate projections of the one alerts Dataset (multiplexed by the
  * caller in `foreachBatch`, SURVEY K2) plus `observe()` metrics that
  * replace the reference's gauges/meters (C8,
  * `DynamicQueryFunction.java:59-67`, `DynamicKeyFunction.java:36-40`).
  */
object Sinks {

  /** K2: the demo-sink CSV line, byte-format parity with the reference
    * (`DynamicQueryFunction.java:170-190`):
    * `Rule <id>,<key>,<tsMillis>,<aggregate>,<verdict>` — the reference
    * interleaves event fields (speed/lat/lon) that only exist for the
    * taxi schema; the generic engine emits the schema-independent core. */
  def demoCsvLine(alerts: Dataset[Alert]): DataFrame =
    alerts.select(concat_ws(",",
      concat(lit("Rule "), col("ruleId")),
      col("key"),
      col("tsMillis"),
      col("aggregate"),
      col("passed")).as("line"))

  /** K3/C8: attach observable metrics to an alerts Dataset — alert count,
    * fired count, max event-time lag vs wall clock (the reference's
    * per-event latency probe). Read them from a
    * `StreamingQueryListener`/`QueryExecutionListener` as
    * `observedMetrics("graft_alerts")`. */
  def observed(alerts: Dataset[Alert]): Dataset[Alert] =
    alerts.observe("graft_alerts",
      count(lit(1)).as("alerts"),
      sum(when(col("passed"), 1L).otherwise(0L)).as("fired"),
      max(unix_millis(current_timestamp()) - col("tsMillis")).as("max_lag_ms"))
}
