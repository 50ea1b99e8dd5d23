package graft

import graft.exec.Funnel
import org.apache.spark.sql.functions._

/** Funnel conversions vs a brute-force scan on seeded random event
  * histories (same-ms ties, conversions at the exact horizon edge,
  * users with no from-events). */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  test("conversions matches brute force over random histories") {
    val r = new scala.util.Random(23)
    val types = Seq("click", "purchase", "view")
    val evs = (1 to 1500).map { i =>
      (r.nextInt(40).toLong, 100000L + r.nextInt(500) * 100L, types(r.nextInt(3)))
    }
    val within = 3000L
    val got = Funnel.conversions(evs.toDF("user_id", "tsm", "event_type"),
        "user_id", "tsm", "event_type", "click", "purchase", within)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val byUser = evs.groupBy(_._1)
    for ((u, es) <- byUser) {
      val purchases = es.filter(_._3 == "purchase")
      val clicks = es.filter(_._3 == "click").map(_._2)
      val converted = purchases.count(p =>
        clicks.exists(c => c <= p._2 && c >= p._2 - within))
      if (purchases.nonEmpty) {
        assert(got(u) == (purchases.size.toLong, converted.toLong), s"user $u")
      } else assert(!got.contains(u), s"user $u should be absent")
    }
  }

  test("Cohort.retention matches brute force; offset 0 equals cohort size") {
    val r = new scala.util.Random(31)
    val period = 1000L
    val evs = (1 to 800).map(_ =>
      (r.nextInt(30).toLong, 10000L + r.nextInt(20) * 500L))
    val got = graft.exec.Cohort.retention(evs.toDF("user_id", "tsm"),
        "user_id", "tsm", period)
      .as[(Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val byUser = evs.map { case (u, t) => (u, t / period) }.distinct
    val first = byUser.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = byUser
      .map { case (u, p) => (first(u) * period, p - first(u)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == want)
    // offset 0 rows cover every user exactly once
    assert(got.collect { case ((_, 0L), n) => n }.sum == first.size)
  }

  test("Cohort.transitions matches brute force; total = events - users") {
    val r = new scala.util.Random(41)
    val types = Seq("a", "b", "c")
    val evs = (1 to 900).map(i =>
      (r.nextInt(25).toLong, 5000L + r.nextInt(400) * 10L, i.toLong,
        types(r.nextInt(3))))
    val got = graft.exec.Cohort.transitions(
        evs.toDF("user_id", "tsm", "event_id", "event_type"),
        "user_id", "tsm", "event_id", "event_type")
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val want = evs.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._2, e._3)).map(_._4).sliding(2)
        .collect { case Seq(a, b) => (a, b) }
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == want)
    val nUsers = evs.map(_._1).distinct.size
    assert(got.values.sum == evs.size - nUsers)
  }
}
