package graft

import graft.model._
import graft.streaming.{FanOut, SlidingStateExec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** W1/W5 semantics: per-event emission over MemoryStream, checked against
  * the reference's brute-force definition — "aggregate every event in
  * [t − w, t], inclusive both ends" (`DynamicQueryFunction.java:277-297`).
  */
class SlidingStateExecSpec extends SparkSpec {
  import spark.implicits._

  case class Ev(carId: Int, ts: java.sql.Timestamp, speed: Double)
  def ev(carId: Int, tsMs: Long, speed: Double) =
    Ev(carId, new java.sql.Timestamp(tsMs), speed)

  val rule = Rule(
    queryId = Some(7L),
    groupingKeyNames = Seq("carId"),
    aggregateFieldName = Some("speed"),
    aggregatorFunctionType = Some(AggregatorType.Avg),
    limitOperatorType = Some(CompareOp.Greater),
    limit = Some(BigDecimal(50)),
    windowMilliseconds = Some(10000L),
    frequencyMilliseconds = Some(0L))

  /** Brute force per the reference definition. */
  def brute(events: Seq[Ev], at: Ev): BigDecimal = {
    val w = rule.windowMilliseconds.get
    val in = events.filter(e => e.carId == at.carId &&
      e.ts.getTime >= at.ts.getTime - w && e.ts.getTime <= at.ts.getTime)
    val sum = in.map(e => BigDecimal(e.speed)).sum
    (sum / in.size).setScale(6, BigDecimal.RoundingMode.HALF_UP)
  }

  test("per-event emission matches brute force across micro-batches") {
    val base = 1700000000000L
    val batch1 = Seq(
      ev(1, base, 60), ev(1, base + 3000, 40), ev(2, base + 1000, 90))
    val batch2 = Seq(
      ev(1, base + 9000, 80),   // window still covers base
      ev(1, base + 14000, 20),  // base and base+3000 evicted
      ev(2, base + 20000, 10))  // all of batch1 for car 2 evicted

    val input = MemoryStream[Ev](spark)
    val keyed = FanOut.keyed(input.toDF(), Seq(rule), "ts")
    val alerts = SlidingStateExec.run(keyed, Map(7L -> rule))
    val q = alerts.writeStream.format("memory")
      .trigger(Trigger.ProcessingTime("1 second"))
      .queryName("w1_alerts").outputMode("append").start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("w1_alerts").as[Alert].collect()
      .map(a => (a.key, a.tsMillis) -> a).toMap
    val all = batch1 ++ batch2
    assert(got.size == all.size, "exactly one alert per input event")
    for (e <- all) {
      val a = got((s"{carId=${e.carId}}", e.ts.getTime))
      // per-key timestamps are strictly increasing here, so the visible
      // set at e is exactly the events with ts <= e.ts
      val expected = brute(all.filter(x => x.ts.getTime <= e.ts.getTime), e)
      assert(BigDecimal(a.aggregate) == expected,
        s"aggregate mismatch at ${e}: got ${a.aggregate}, want $expected")
      assert(a.passed == (expected > BigDecimal(50)))
    }
  }

  test("COUNT rule emits running in-window counts") {
    val cntRule = rule.copy(queryId = Some(8L),
      aggregateFieldName = Some(Rule.CountSentinel),
      aggregatorFunctionType = None,
      limitOperatorType = Some(CompareOp.GreaterEqual), limit = Some(BigDecimal(2)))
    val base = 1700000100000L
    val evs = Seq(ev(3, base, 1), ev(3, base + 1000, 1), ev(3, base + 12000, 1))
    val input = MemoryStream[Ev](spark)
    val alerts = SlidingStateExec.run(
      FanOut.keyed(input.toDF(), Seq(cntRule), "ts"), Map(8L -> cntRule))
    val q = alerts.writeStream.format("memory")
      .trigger(Trigger.ProcessingTime("1 second"))
      .queryName("w1_counts").outputMode("append").start()
    try { input.addData(evs: _*); q.processAllAvailable() } finally q.stop()
    val got = spark.table("w1_counts").as[Alert].collect()
      .sortBy(_.tsMillis).map(a => (a.aggregate.toDouble, a.passed)).toSeq
    // counts: 1 (no), 2 (yes), 1 (no — first two evicted at +12s)
    assert(got == Seq((1.0, false), (2.0, true), (1.0, false)))
  }
}
