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
      sizeCol: String, target: Long): DataFrame =
    binAssignments(items, stratum, orderCol, sizeCol, target)
      .groupBy(col(stratum), col("bin"))
      .agg(count(lit(1)).as("n_items"), sum(col("__sz")).as("size_units"),
        min(col("__id")).as("first_id"), max(col("__id")).as("last_id"))

  /** Row-level face of [[compactionBins]]: every input row with its
    * planned `bin` (all payload columns preserved, plus the internal
    * `__id`/`__sz`/`bin` plan columns) — the join-free input both the
    * summary above and [[applyCompaction]] aggregate from. */
  private def binAssignments(items: DataFrame, stratum: String,
      orderCol: String, sizeCol: String, target: Long): DataFrame = {
    require(target > 0, "target must be positive")
    // ROWS frame, not the default RANGE: duplicate orderCol values
    // would otherwise be window PEERS sharing one combined cumulative
    // total, breaking the ≤-one-item overshoot invariant (ADVICE-r15).
    // Ties break by __sz so the cumsum is deterministic whenever
    // (orderCol, sizeCol) is unique; rows identical in both are
    // interchangeable, so the resulting bin shapes are well-defined
    // either way.
    val w = Window.partitionBy(stratum).orderBy(col("__id"), col("__sz"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    items
      .withColumn("__id", col(orderCol))
      .withColumn("__sz", col(sizeCol).cast("long"))
      .withColumn("__cum", sum(col("__sz")).over(w))
      .withColumn("bin", expr(s"(__cum - __sz) div ${target}L"))
      .drop("__cum")
  }

  /** EXECUTE a compaction plan: rewrite `items` under `outPath` as a
    * hive-partitioned parquet tree `stratum=…/bin=…/` holding exactly
    * ONE file per planned bin — the maintenance rewrite that turns a
    * small-files stratum into ~`target`-unit outputs.
    *
    * One shuffle total (the repartition on (stratum, bin)) — the
    * minimum any rewrite pays, since compaction IS data movement: hash
    * repartitioning co-locates each bin in exactly one task, and the
    * dynamic-partition writer emits one file per (stratum, bin)
    * directory per task that holds its rows, so the file inventory
    * equals the plan bin-for-bin. Bin payloads are ~target units by
    * construction, so tasks are balanced without salting. Answer
    * invariance (the q79 layout-neutrality property) holds because the
    * rewrite only moves rows between files; the compaction-apply
    * oracle row re-aggregates the compacted tree against the original
    * table to prove it.
    *
    * Returns the plan summary ([[compactionBins]] of the same input) —
    * the table an audit compares the written inventory against. */
  def applyCompaction(items: DataFrame, stratum: String, orderCol: String,
      sizeCol: String, target: Long, outPath: String): DataFrame = {
    val assigned = binAssignments(items, stratum, orderCol, sizeCol, target)
      .drop("__id", "__sz")
    assigned
      .repartition(col(stratum), col("bin"))
      .write.mode("overwrite")
      .partitionBy(stratum, "bin")
      .parquet(outPath)
    compactionBins(items, stratum, orderCol, sizeCol, target)
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
