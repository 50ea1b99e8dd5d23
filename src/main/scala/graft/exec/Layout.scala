package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Physical-layout planning: the decisions a 100 TB table's maintenance
  * loop makes from metadata — which small files to coalesce into
  * target-sized outputs, which keys need salting before the next big
  * join — computed as plans over size/count tables, never by touching
  * payload bytes. Both planners are pure integer arithmetic over a
  * deterministic order, so a plan is reproducible anywhere (the
  * property that lets a driver, a metastore job, and an audit query
  * agree on the same bin boundaries). */
object Layout {

  /** Compaction planning per stratum: items (files, row groups, docs)
    * are packed in `orderCol` order into contiguous bins of ~`target`
    * size units — bin = (running total − own size) div target, the
    * streaming first-fit that never splits an item and overshoots a
    * bin by at most one item (the classic small-files compaction rule:
    * every bin except possibly the last holds ≥ target − max_item and
    * < target + max_item units). The running total is a per-stratum
    * window — strata (sources, dates, partitions) are the compaction
    * unit, so no global single-reducer cumsum exists; within a stratum
    * the plan is a prefix property of the (orderCol) order and append-
    * stable: adding items never re-bins earlier ones.
    *
    * Output: one row per planned output file —
    * (stratum, bin, n_items, size_units, first_id, last_id). */
  def compactionBins(items: DataFrame, stratum: String, orderCol: String,
      sizeCol: String, target: Long): DataFrame = {
    require(target > 0, "target must be positive")
    val w = Window.partitionBy(stratum).orderBy("__id")
    items
      .select(col(stratum), col(orderCol).as("__id"),
        col(sizeCol).cast("long").as("__sz"))
      .withColumn("__cum", sum(col("__sz")).over(w))
      .withColumn("bin", expr(s"(__cum - __sz) div ${target}L"))
      .groupBy(col(stratum), col("bin"))
      .agg(count(lit(1)).as("n_items"), sum(col("__sz")).as("size_units"),
        min(col("__id")).as("first_id"), max(col("__id")).as("last_id"))
  }

  /** Skew diagnosis + salting plan: per-key row counts against a
    * `target` rows-per-task budget; any key over budget gets salt
    * factor ⌈n/target⌉ = (n + target − 1) div target — the fan-out a
    * salted repartition or salted join would use so no single task
    * sees more than ~target rows of that key. Only flagged keys are
    * emitted (the salt table is broadcast-sized by construction: keys
    * over a 100 TB-scale budget are few, or the job has bigger
    * problems), with `share_ppm` locating the key's weight in the
    * total so the report ranks itself. One map-side-combined count
    * aggregate + a one-row total broadcast — the diagnosis never
    * shuffles payloads.
    *
    * Output: (key, n, salt, share_ppm), keys with salt > 1 only. */
  def skewPlan(df: DataFrame, key: Column, target: Long): DataFrame = {
    require(target > 0, "target must be positive")
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("__total"))
    counts.crossJoin(broadcast(tot))
      .withColumn("salt", expr(s"(n + ${target}L - 1) div ${target}L"))
      .filter(col("salt") > 1)
      .select(col("key"), col("n"), col("salt"),
        expr("n * 1000000 div __total").as("share_ppm"))
  }
}
