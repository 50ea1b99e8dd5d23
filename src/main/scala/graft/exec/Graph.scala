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

  /** Per-node triangle count + local clustering coefficient over an
    * undirected pair list — the density report for a near-duplicate
    * candidate graph (a high-LCC node sits inside a tight clique of
    * mutual near-dups; a low-LCC high-degree node is a hub stitching
    * unrelated documents, the classic false-positive signature).
    *
    * Algorithm: degree-ordered node-iterator (Latapy, TCS 2008 — the
    * standard distributed formulation). Each undirected edge is
    * oriented from its lower endpoint to its higher endpoint under the
    * total order (degree, id); every triangle then has exactly one
    * source node with two out-edges, so counting (wedge ⋈ closing edge)
    * over the ORIENTED list counts each triangle once — and the
    * orientation bounds every out-degree by O(√m) regardless of hub
    * skew, which is what keeps the wedge self-join tractable when a
    * viral document drags in a million-edge star (an unoriented
    * neighbor self-join would square the hub's degree; the oriented one
    * squares √m). Wedges join on the shared source (one hash shuffle),
    * the closing check is an edge-keyed semi-join (second shuffle), and
    * per-node attribution explodes each triangle to its three corners.
    *
    * All counts are integer; `lcc_e6` = 2·T·1e6 div (d·(d−1)) uses the
    * repo's non-negative floor division, so both engines emit identical
    * rows. `vertices` supplies the full node set (isolated nodes report
    * zero degree/triangles/lcc — same contract as
    * [[graft.dedup.Dedup.connectedComponents]]'s singleton clusters;
    * degree-1 nodes also report lcc 0, the usual convention for the
    * undefined d(d−1) case).
    *
    * Input: `pairs(a_id, b_id)` (any orientation, self-loops dropped).
    * Output: (id, degree, triangles, lcc_e6) — one row per vertex. */
  def triangleCount(pairs: DataFrame, vertices: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val und = pairs
      .filter(col("a_id") =!= col("b_id"))
      .select(least(col("a_id"), col("b_id")).as("a"),
        greatest(col("a_id"), col("b_id")).as("b"))
      .distinct()
      .localCheckpoint(true)
    val deg = und.select(col("a").as("n"))
      .unionByName(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orient by (degree, id): u -> v iff (d(u), u) < (d(v), v)
    val withDeg = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
    val ori = withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
        struct(col("a").as("u"), col("b").as("v"),
          col("db").as("dv")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"),
          col("da").as("dv"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
      .localCheckpoint(true)
    // wedges at u between out-neighbors v < w (in the same total
    // order), closed iff the oriented edge v -> w exists
    val wedges = ori.select(col("u"), col("v"), col("dv"))
      .join(ori.select(col("u"), col("v").as("w"), col("dv").as("dw")), "u")
      .filter(struct(col("dv"), col("v")) < struct(col("dw"), col("w")))
    val closing = ori.select(col("u").as("v"), col("v").as("w"))
    val tris = wedges.join(closing, Seq("v", "w"), "leftsemi")
    val perNode = tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("t"))
    vertices.select(col(idCol).as("id")).distinct()
      .join(deg.withColumnRenamed("n", "id"), Seq("id"), "left")
      .join(perNode.withColumnRenamed("n", "id"), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("d"), lit(0L)).as("degree"),
        coalesce(col("t"), lit(0L)).as("triangles"),
        when(coalesce(col("d"), lit(0L)) >= 2,
          expr("2 * coalesce(t, 0L) * 1000000 div (d * (d - 1))"))
          .otherwise(lit(0L)).as("lcc_e6"))
  }
}
