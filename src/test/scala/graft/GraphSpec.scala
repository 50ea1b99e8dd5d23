package graft

import org.apache.spark.sql.functions._
import graft.exec.Graph

/** Deterministic integer PageRank: the exact pico-unit trajectory is
  * hand-computable round by round, so one round is asserted VALUE-exact
  * and five rounds assert the structural ranking. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // hub-and-spokes: a is the hub (everyone links in, a links out to
  // b and c); d is a pure source (dangling for in-links)
  private def edges =
    Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "a", 1L),
      ("c", "a", 1L), ("d", "a", 1L))
      .toDF("src", "dst", "w")

  test("one round replays the hand-computed pico-unit table exactly") {
    // N=4, base=250e9, tele=1500*base//10000=37.5e9; a receives the
    // full rank of b, c, d (750e9), b and c half of a's (125e9 each)
    val got = Graph.pageRank(edges, iters = 1)
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "a" -> 675000000000L, "b" -> 143750000000L,
      "c" -> 143750000000L, "d" -> 37500000000L), got.toString)
  }

  test("five rounds: hub dominates, symmetric spokes tie, source floors") {
    val got = Graph.pageRank(edges, iters = 5)
      .as[(String, Long)].collect().toMap
    assert(got("a") > got("b") && got("b") == got("c") &&
      got("c") > got("d"), got.toString)
    // d never receives an edge: its rank is exactly the teleport base
    assert(got("d") == 37500000000L, got.toString)
  }

  test("checkpointEvery cuts lineage without changing the trajectory") {
    // the cluster path for deep iters: values must be bit-identical
    // to the unrolled plan at every checkpoint cadence
    val plain = Graph.pageRank(edges, iters = 10)
      .as[(String, Long)].collect().toMap
    val ck2 = Graph.pageRank(edges, iters = 10, checkpointEvery = 2)
      .as[(String, Long)].collect().toMap
    val ck3 = Graph.pageRank(edges, iters = 10, checkpointEvery = 3)
      .as[(String, Long)].collect().toMap
    assert(ck2 == plain, s"ck2=$ck2 plain=$plain")
    assert(ck3 == plain, s"ck3=$ck3 plain=$plain")
  }

  test("pageRankDeltas: hand-computed round 1, shrinking tail, totality") {
    val d = Graph.pageRankDeltas(edges, iters = 6)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(d.map(_._1).toSeq == (1 to 6), d.mkString(","))
    // round 1 vs the uniform start (base=250e9): a moved +425e9,
    // b/c −106.25e9 each, d −212.5e9 → max 425e9, sum 850e9
    assert(d(0)._2 == 425000000000L, d(0).toString)
    assert(d(0)._3 == 850000000000L, d(0).toString)
    // synchronous PageRank on this graph oscillates toward the fixed
    // point: the delta after 6 rounds is well under round 1's
    assert(d(5)._2 < d(0)._2 / 2, d.mkString(","))
    // deltas are invariant to the checkpoint cadence too
    val dck = Graph.pageRankDeltas(edges, iters = 6, checkpointEvery = 2)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(dck.toSeq == d.toSeq)
  }

  test("weighted edges split proportionally, not per-edge") {
    // a sends 3/4 of its forwarded mass to b, 1/4 to c
    val e2 = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 1L),
      ("c", "a", 1L)).toDF("src", "dst", "w")
    val got = Graph.pageRank(e2, iters = 1)
      .as[(String, Long)].collect().toMap
    // N=3: base=333333333333, tele=1500*base//10000=49999999999 (floor)
    // a<-b+c: cin=2*base; b<-a: (base*3)//4; c<-a: base//4
    val base = 1000000000000L / 3
    val tele = 1500L * base / 10000L
    assert(got("a") == tele + 8500L * (2 * base) / 10000L, got.toString)
    assert(got("b") == tele + 8500L * (base * 3 / 4) / 10000L, got.toString)
    assert(got("c") == tele + 8500L * (base / 4) / 10000L, got.toString)
  }

  test("triangle count: hand graph, dup/reversed/self edges normalized") {
    // und = {1-2, 1-3, 2-3, 3-4}: one triangle {1,2,3}; 4 is a leaf;
    // 5 only self-loops (dropped); 6 is isolated
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (3L, 1L),
      (2L, 3L), (5L, 5L)).toDF("a_id", "b_id")
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val got = Graph.triangleCount(pairs, verts)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, d, t, l) => id -> ((d, t, l)) }.toMap
    assert(got == Map(
      1L -> ((2L, 1L, 1000000L)), 2L -> ((2L, 1L, 1000000L)),
      3L -> ((3L, 1L, 333333L)), 4L -> ((1L, 0L, 0L)),
      5L -> ((0L, 0L, 0L)), 6L -> ((0L, 0L, 0L))), got.toString)
  }

  test("triangle count: 4-clique — every node in C(3,2)=3 triangles") {
    val ids = Seq(10L, 11L, 12L, 13L)
    val pairs = (for { a <- ids; b <- ids if a < b } yield (a, b))
      .toDF("a_id", "b_id")
    val got = Graph.triangleCount(pairs, ids.toDF("doc_id"))
      .as[(Long, Long, Long, Long)].collect()
    assert(got.forall { case (_, d, t, l) =>
      d == 3L && t == 3L && l == 1000000L }, got.mkString(","))
  }
}
