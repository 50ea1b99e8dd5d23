package graft

import graft.exec.Joins
import org.apache.spark.sql.functions._

/** As-of and range joins vs their brute-force definitions on seeded
  * random time series (ties, missing keys, empty-prior-history cases). */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private val r = new scala.util.Random(7)
  // (id, key, ts) left probes; (key, ts, v) right values, deduped per (key, ts)
  private val left = (1 to 300).map(i =>
    (i.toLong, r.nextInt(5), 1000L + r.nextInt(200) * 10L))
  private val right = (1 to 200).map(_ =>
    (r.nextInt(6), 1000L + r.nextInt(200) * 10L, r.nextInt(1000).toDouble))
    .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq

  test("asOf matches brute force (greatest right ts <= left ts per key)") {
    val l = left.toDF("id", "key", "ts")
    val rr = right.toDF("key", "rts", "v")
    val got = Joins.asOf(l, rr, "key", "ts", "rts", "v")
      .select("id", "asof_value").as[(Long, Option[Double])].collect().toMap
    for ((id, k, ts) <- left) {
      val expect = right.filter(t => t._1 == k && t._2 <= ts)
        .sortBy(_._2).lastOption.map(_._3)
      assert(got(id) == expect, s"id=$id key=$k ts=$ts")
    }
  }

  test("rangeJoin matches brute force (|lts - rts| <= gap per key)") {
    val gap = 70L
    val l = left.toDF("id", "key", "ts")
    val rr = right.toDF("key", "rts", "v")
    val got = Joins.rangeJoin(l, rr, "key", "ts", "rts", gap, Seq("v"))
      .select("id", "__r_ts", "__r_v").as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    for ((id, k, ts) <- left) {
      val expect = right.filter(t =>
        t._1 == k && math.abs(t._2 - ts) <= gap).map(t => (t._2, t._3)).toSet
      assert(got.getOrElse(id, Set.empty) == expect, s"id=$id key=$k ts=$ts")
    }
  }

  test("bloomSemiJoin equals the plain left-semi join (false positives removed)") {
    val fact = left.toDF("id", "key", "ts")
    val dim = right.toDF("key", "rts", "v").filter(col("v") > 500)
    val got = Joins.bloomSemiJoin(fact, dim, "key", "key",
        expectedItems = 100L, fpp = 0.5) // high fpp to force FP removal to matter
      .select("id").as[Long].collect().sorted
    val want = fact.join(dim.select("key").distinct(), Seq("key"), "left_semi")
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(want))
    assert(got.nonEmpty)
  }

  test("saltedJoin is byte-identical to the plain equi-join") {
    val big = left.toDF("id", "key", "ts")
    val small = right.toDF("key", "rts", "v")
    val got = Joins.saltedJoin(big, small, "key", salt = 7,
        saltCols = Seq("id", "ts"))
      .select("id", "rts", "v").as[(Long, Long, Double)].collect().sorted
    val want = big.join(small, Seq("key"))
      .select("id", "rts", "v").as[(Long, Long, Double)].collect().sorted
    assert(got.sameElements(want))
    assert(got.nonEmpty)
  }

  test("applySkewPlan salts exactly the flagged keys and preserves the plain join") {
    // skewed fixture: key 0 is hot (2400 rows), keys 1-5 cold (40 each);
    // key 6 exists only in the dim (unmatched dim rows must not leak in)
    val hot = (1 to 2400).map(i => (i.toLong, 0, 1000L + i))
    val cold = for (k <- 1 to 5; i <- 1 to 40)
      yield ((k * 10000 + i).toLong, k, 2000L + i)
    val big = (hot ++ cold).toDF("id", "key", "ts")
    val small = (0 to 6).map(k => (k, s"dim$k")).toDF("key", "name")
    val target = 100L
    val plan = graft.exec.Layout.skewPlan(big, col("key"), target)
    // only the hot key is flagged, at exactly ceil(2400/100) = 24
    val factors = plan.select("key", "salt").as[(Int, Long)].collect().toMap
    assert(factors == Map(0 -> 24L))
    val got = Joins.applySkewPlan(big, small, "key", plan,
        saltCols = Seq("id", "ts"))
      .select("id", "name").as[(Long, String)].collect().sorted
    val want = big.join(small, Seq("key"))
      .select("id", "name").as[(Long, String)].collect().sorted
    assert(got.sameElements(want))
    assert(got.nonEmpty)
    // the task-side bound the plan promises: after salting, no
    // (key, salt-cell) holds more than ~target big-side rows (2x slack
    // for hash spread; unsalted, the hot key's one cell holds 2400)
    val maxCell = big
      .join(broadcast(plan.select(col("key"), col("salt"))), Seq("key"), "left")
      .withColumn("cell", when(col("salt").isNull, lit(0L))
        .otherwise(pmod(xxhash64(col("id"), col("ts")), col("salt"))))
      .groupBy("key", "cell").count()
      .agg(max("count")).as[Long].head()
    assert(maxCell <= 2 * target, s"largest post-salt cell: $maxCell rows")
  }
}
