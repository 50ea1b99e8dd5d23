package graft

import graft.functions.TextFunctions
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** Property-style invariants of the pipeline operator primitives, and
  * the mergeability proof behind every incremental/backfill pattern:
  * partial aggregates over disjoint halves must merge to the full-run
  * answer (decimal sums and HLL sketches are mergeable; that is what
  * makes per-partition partials and incremental recompute correct at
  * all). */
class OperatorPropSpec extends SparkSpec {
  import spark.implicits._

  test("quantizeI8 bounds every component in [-127, 127]; zero vector -> zeros") {
    val r = new scala.util.Random(3)
    val vecs = (1 to 200).map(i =>
      (i.toLong, Array.fill(16)((r.nextGaussian() * r.nextInt(1000)).toFloat))) :+
      (999L, Array.fill(16)(0f))
    val q = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), Similarity.quantizeI8(col("embedding")).as("q"))
      .as[(Long, Array[Long])].collect().toMap
    q.values.foreach(a => assert(a.forall(x => x >= -127 && x <= 127)))
    assert(q(999L).forall(_ == 0L))
    // the max-|v| component always quantizes to exactly +-127
    for ((id, v) <- vecs; if id != 999L) {
      val mx = v.map(math.abs).max
      val i = v.indexWhere(x => math.abs(x) == mx)
      assert(math.abs(q(id)(i)) == 127L, s"vec $id")
    }
  }

  test("shinglesOf yields exactly len - n + 1 grams (0 when short)") {
    for (len <- 0 to 6; n <- 2 to 4) {
      val text = (1 to len).map(i => s"w$i").mkString(" ")
      val got = Seq(Tuple1(text)).toDF("t")
        .select(size(TextFunctions.shingles(col("t"), n)))
        .as[Int].head()
      assert(got == math.max(0, len - n + 1), s"len=$len n=$n")
    }
  }

  test("partial aggregates over disjoint halves merge to the full answer") {
    val r = new scala.util.Random(9)
    val rows = (1 to 5000).map(i =>
      (i.toLong, (i % 977).toLong, BigDecimal(r.nextInt(100000)) / 100))
    val df = rows.toDF("id", "user", "v")
    def partial(part: org.apache.spark.sql.DataFrame) = part.agg(
      sum(col("v").cast("decimal(38,6)")).as("s"),
      count(lit(1)).as("n"),
      approx_count_distinct(col("user"), 0.02).as("d"))
    // halves merge: decimal sums add, counts add; HLL is merged by
    // re-aggregating the union (the sketch property the map-side
    // combine relies on) — compare against the one-shot full run
    val lo = df.filter(col("id") <= 2500)
    val hi = df.filter(col("id") > 2500)
    val full = partial(df).as[(BigDecimal, Long, Long)].head()
    val l = partial(lo).as[(BigDecimal, Long, Long)].head()
    val h = partial(hi).as[(BigDecimal, Long, Long)].head()
    assert(l._1 + h._1 == full._1)
    assert(l._2 + h._2 == full._2)
    // HLL merged via union equals (not approximately: same sketch
    // algorithm, same input set) the full-run estimate
    val merged = partial(lo.unionByName(hi)).as[(BigDecimal, Long, Long)].head()
    assert(merged == full)
  }
}
