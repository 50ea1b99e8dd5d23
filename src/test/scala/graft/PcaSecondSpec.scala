package graft

import graft.similarity.Similarity

/** Deflated second principal direction: an independent BigInt replay of
  * the documented trajectory (quantize → top chain → per-round
  * division-free orthogonalization → sign-safe renorm → A·w → anchor)
  * asserts BIT-identity with the distributed implementation, and a
  * rank-2 diagonal fixture pins the structural outcome (v̂₂ = the
  * deflated axis, max component anchored positive). */
class PcaSecondSpec extends SparkSpec {
  import spark.implicits._

  private def quantize(vecs: Seq[(Long, Seq[Double])]): Map[(Long, Int), BigInt] =
    (for { (id, v) <- vecs; (x, j) <- v.zipWithIndex }
      yield (id, j) -> BigInt(math.floor(x * 1000000 + 0.5).toLong)).toMap

  /** sign(y)·(|y|·1e6 div max|y|) over a dim-indexed vector. */
  private def renorm(y: Map[Int, BigInt]): Map[Int, BigInt] = {
    val my = y.values.map(_.abs).max
    y.map { case (j, v) => j -> (v.signum * (v.abs * 1000000 / my)) }
  }

  /** One application of A = Σxxᵀ to v, in exact integers. */
  private def applyA(q: Map[(Long, Int), BigInt],
      v: Map[Int, BigInt]): Map[Int, BigInt] = {
    val rids = q.keys.map(_._1).toSeq.distinct
    val dims = q.keys.map(_._2).toSeq.distinct
    val s = rids.map(r => r ->
      dims.map(j => q((r, j)) * v(j)).sum).toMap
    dims.map(j => j -> rids.map(r => q((r, j)) * s(r)).sum).toMap
  }

  private def anchor(y: Map[Int, BigInt]): Map[Int, BigInt] = {
    val my = y.values.map(_.abs).max
    val pj = y.filter(_._2.abs == my).keys.min
    val sgn = if (y(pj) < 0) -1 else 1
    renorm(y).map { case (j, v) => j -> v * sgn }
  }

  private def replay(vecs: Seq[(Long, Seq[Double])], iters: Int,
      itersTop: Int): Map[Int, Long] = {
    val q = quantize(vecs)
    val dims = q.keys.map(_._2).toSeq.distinct
    var v1 = dims.map(_ -> BigInt(1000000)).toMap
    (1 to itersTop).foreach(_ => v1 = anchor(applyA(q, v1)))
    val vv1 = v1.values.map(x => x * x).sum
    var u = dims.map(_ -> BigInt(1000000)).toMap
    (1 to iters).foreach { _ =>
      val c = dims.map(j => v1(j) * u(j)).sum
      val w = dims.map(j => j -> (u(j) * vv1 - v1(j) * c)).toMap
      u = anchor(applyA(q, renorm(w)))
    }
    u.map { case (j, v) => j -> v.toLong }
  }

  private val fixture: Seq[(Long, Seq[Double])] = Seq(
    1L -> Seq(0.9, 0.1, -0.2), 2L -> Seq(0.8, 0.2, -0.1),
    3L -> Seq(-0.1, 0.7, 0.3), 4L -> Seq(0.05, 0.65, 0.25),
    5L -> Seq(0.4, -0.3, 0.55))

  test("BigInt replay of the documented trajectory is bit-identical") {
    val df = fixture.map { case (id, v) => (id, v.toArray) }
      .toDF("vec_id", "embedding")
    val got = Similarity.powerIterationSecond(df, iters = 3, itersTop = 3)
      .as[(Int, Long)].collect().toMap
    val want = replay(fixture, iters = 3, itersTop = 3)
    assert(got == want, s"got=$got want=$want")
  }

  test("rank-2 diagonal fixture: deflation recovers the second axis") {
    // axis 0 dominates (two copies of 2·e0), axis 1 is the runner-up:
    // v̂₂'s max component must sit on axis 1, anchored positive, with
    // only the deflation residue on axis 0
    val df = Seq((1L, Array(2.0, 0.0)), (2L, Array(2.0, 0.0)),
      (3L, Array(0.0, 1.0))).toDF("vec_id", "embedding")
    val got = Similarity.powerIterationSecond(df, iters = 3, itersTop = 3)
      .as[(Int, Long)].collect().toMap
    assert(got(1) == 1000000L, got.toString)
    assert(math.abs(got(0)) < 20000L, got.toString)
    val want = replay(Seq(1L -> Seq(2.0, 0.0), 2L -> Seq(2.0, 0.0),
      3L -> Seq(0.0, 1.0)), iters = 3, itersTop = 3)
    assert(got == want.map { case (j, v) => j -> v }, s"got=$got want=$want")
  }

  test("rank-1 corpus fails loudly, never a silent NULL/empty result") {
    val rank1 = Seq((1L, Array(1.0, 0.0)), (2L, Array(0.5, 0.0)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.powerIterationSecond(rank1, iters = 1, itersTop = 1)
        .collect()
    }
    assert(e.getMessage.contains("rank-1"), e.getMessage)
  }
}
