package graft.exec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge tables — the operator family the
  * warehouse needs once its dedup graphs, transition tables, and
  * citation/link structures become first-class data: each algorithm is
  * a fixed number of join+aggregate rounds over an edge list, the shape
  * that distributes (edges hash-partitioned on the join key, ranks on
  * the node key; nothing corpus-wide beyond the edge table itself).
  *
  * Exactness (the repo's standard contract): all rank mass lives in
  * integer pico-units (e12) and every transfer is a floor division, so
  * both engines replay the identical trajectory — no float sum of
  * contributions exists anywhere, and the per-round tables are pure
  * functions of the edge multiset (aggregation order cannot matter on
  * integer sums). */
object Graph {

  /** Deterministic weighted PageRank with damping in basis points
    * (`dampBp` = 8500 → d = 0.85), `iters` synchronous rounds from the
    * uniform start 1e12 div N. Per round, node u sends
    * `pr(u)·w(u→v) div out_w(u)` pico-units along each out-edge
    * (DECIMAL(38,0)-widened product — corpus-scale weights cannot wrap
    * BIGINT), and every node restarts from the same teleport base
    * `((10000−dampBp)·(1e12 div N)) div 10000`:
    *
    *   pr'(v) = tele + (dampBp · Σ_u c(u→v)) div 10000
    *
    * Dangling nodes (no out-edges) keep receiving teleport mass but
    * forward nothing — their outflow mass leaks, the standard
    * simplification (documented rather than redistributed so the oracle
    * replay stays one join per round). Floor losses make Σpr drift a
    * few pico-units per round: deterministic, identical in both
    * engines, and irrelevant to ranking.
    *
    * Scale: each round is one src-keyed join (ranks ⋈ edges ⋈ out-
    * weights) and one dst-keyed sum — the textbook distributed-PageRank
    * exchange pair; the edge table and node set are read once
    * (localCheckpoint — single-node caveat: on a cluster persist to the
    * shuffle service or a parquet round-trip instead). At the
    * contract's 5 rounds the unrolled lazy plan is fine and keeps the
    * whole trajectory in one Catalyst tree; past plan-depth comfort
    * pass `checkpointEvery` > 0 to cut the lineage every k rounds
    * (values are bit-identical either way — checkpointing changes the
    * plan, never the trajectory). Node count N is the one driver-side
    * read (a scalar, as the classifier's corpus count).
    *
    * Output: (node, pr_e12) — one row per node, BIGINT pico-rank. */
  def pageRank(edges: DataFrame, src: String = "src", dst: String = "dst",
      wCol: String = "w", iters: Int = 5, dampBp: Int = 8500,
      checkpointEvery: Int = 0): DataFrame =
    pageRankTrajectory(edges, src, dst, wCol, iters, dampBp,
      checkpointEvery).last

  /** [[pageRank]]'s full trajectory: the UNIFORM START followed by the
    * rank table after every round (element 0 = start, element i =
    * after round i; the final element is what [[pageRank]] returns).
    * Exposed for [[pageRankDeltas]] and for spec-level round
    * pinning. */
  private def pageRankTrajectory(edges: DataFrame, src: String, dst: String,
      wCol: String, iters: Int, dampBp: Int,
      checkpointEvery: Int): Seq[DataFrame] = {
    require(iters >= 1, "iters must be positive")
    require(dampBp > 0 && dampBp < 10000, "dampBp in (0, 10000)")
    require(checkpointEvery >= 0, "checkpointEvery must be >= 0")
    val e = edges.select(col(src).as("src"), col(dst).as("dst"),
        col(wCol).cast("long").as("w"))
      .localCheckpoint(true)
    val outW = e.groupBy("src").agg(sum(col("w")).as("out_w"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "empty graph")
    val base = 1000000000000L / n
    val tele = (10000L - dampBp) * base / 10000L
    val start = nodes.withColumn("pr_e12", lit(base))
    var pr = start
    start +: (1 to iters).map { i =>
      val contrib = pr.join(e, col("node") === col("src"))
        .join(outW, "src")
        .select(col("dst"),
          expr("CAST((CAST(pr_e12 AS DECIMAL(38,0)) * w) div out_w" +
            " AS BIGINT)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("cin"))
      pr = nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(tele) + expr(s"($dampBp * coalesce(cin, 0L)) div 10000"))
            .as("pr_e12"))
      // cut the lineage every k rounds (never after the last — the
      // caller decides whether the final table materializes): the
      // cluster path for deep iters, where the unrolled join tree
      // would exceed plan-depth/codegen comfort
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        pr = pr.localCheckpoint(true)
      pr
    }
  }

  /** Per-round convergence report: max |Δpr| and Σ|Δpr| over all nodes
    * between consecutive [[pageRank]] rounds, in pico-units — the
    * stop-early dial (run a deep `iters`, read the first round whose
    * max delta is under tolerance, re-run [[pageRank]] at that depth —
    * or consume the trajectory directly on a cluster). Round 1 compares
    * against the uniform start. Integer maxima/sums of integer ranks:
    * engine-reproducible like the ranks themselves.
    *
    * Scale: one node-keyed self-join per round pair over the SAME
    * round tables [[pageRank]] builds (the trajectory is shared, not
    * recomputed) + a one-row aggregate each, unioned — rounds-many
    * rows total.
    *
    * Output: (round, max_delta_e12, sum_delta_e12), round = 1..iters. */
  def pageRankDeltas(edges: DataFrame, src: String = "src",
      dst: String = "dst", wCol: String = "w", iters: Int = 5,
      dampBp: Int = 8500, checkpointEvery: Int = 0): DataFrame = {
    // materialize EVERY round for the delta face (checkpointEvery = 1
    // unless the caller picked a cadence): round i's delta reads
    // rounds i−1 and i, so a lazy trajectory would re-execute the
    // whole prefix per round — O(iters²) join passes at deep iters
    // (round-16 review finding). Values are cadence-invariant.
    val traj = pageRankTrajectory(edges, src, dst, wCol, iters, dampBp,
      if (checkpointEvery > 0) checkpointEvery else 1)
    traj.sliding(2).zipWithIndex.map { case (pair, i) =>
      val prev = pair(0).select(col("node"), col("pr_e12").as("__p"))
      val cur = pair(1).select(col("node"), col("pr_e12").as("__c"))
      prev.join(cur, "node")
        .agg(max(abs(col("__c") - col("__p"))).as("max_delta_e12"),
          sum(abs(col("__c") - col("__p"))).as("sum_delta_e12"))
        .select(lit(i + 1).as("round"), col("max_delta_e12"),
          col("sum_delta_e12"))
    }.reduce(_ unionByName _)
  }
}
