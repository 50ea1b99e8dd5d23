package graft

import graft.exec.BatchExec
import graft.model._

/** Property-style test: the bucketed self-join per-event sliding aggregate
  * (W1 batch analog) equals the reference's brute-force definition
  * (`DynamicQueryFunction.java:277-297`) on randomized event sets
  * (deterministic seeds). */
case class PropEv(event_id: Long, user: Long, ts: java.sql.Timestamp, v: Double)

class BatchExecPropSpec extends SparkSpec {
  import spark.implicits._

  val rule = Rule(
    queryId = Some(1L),
    groupingKeyNames = Seq("user"),
    aggregateFieldName = Some("v"),
    aggregatorFunctionType = Some(AggregatorType.Sum),
    windowMilliseconds = Some(10000L),
    frequencyMilliseconds = Some(0L))

  test("per-event sliding SUM == brute force on random data (5 seeds)") {
    val base = 1700000000000L
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val evs = (0 until 60).map { i =>
        PropEv(i.toLong, rnd.nextInt(3).toLong,
          new java.sql.Timestamp(base + rnd.nextInt(50000).toLong),
          rnd.nextInt(10000) / 10.0)
      }
      val got = BatchExec.run(rule, evs.toDF(), "ts")
        .select($"event_id", $"agg_value".cast("string"))
        .as[(Long, String)].collect().toMap
      assert(got.size == evs.size)
      for (e <- evs) {
        val expect = evs.filter(x => x.user == e.user &&
            x.ts.getTime >= e.ts.getTime - 10000L && x.ts.getTime <= e.ts.getTime)
          .map(x => BigDecimal(x.v).setScale(6))
          .sum
        assert(BigDecimal(got(e.event_id)) == expect,
          s"seed $seed event ${e.event_id}: got ${got(e.event_id)}, want $expect")
      }
    }
  }

  test("window boundary is inclusive on both ends") {
    val base = 1700000000000L
    // exactly w apart: both must see each other's endpoint correctly
    val evs = Seq(
      PropEv(0, 1, new java.sql.Timestamp(base), 5.0),
      PropEv(1, 1, new java.sql.Timestamp(base + 10000L), 7.0))
    val got = BatchExec.run(rule, evs.toDF(), "ts")
      .select($"event_id", $"agg_value".cast("string"))
      .as[(Long, String)].collect().toMap
    assert(BigDecimal(got(0)) == BigDecimal("5.000000"))
    assert(BigDecimal(got(1)) == BigDecimal("12.000000")) // [t-w, t] inclusive
  }
}
