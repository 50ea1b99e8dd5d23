package graft

import graft.model._
import graft.streaming.FanOut
import org.apache.spark.sql.functions._

/** The two fan-out kernels (compiled per-rule branches vs rules-as-data
  * broadcast) must be observationally identical: same KeyedEvents, byte
  * for byte, over mixed filter types, keys, COUNT sentinels and payload
  * rendering. */
case class FanOutEv(carId: Int, kind: String, ts: java.sql.Timestamp,
    speed: Double, n: Long)

class FanOutSpec extends SparkSpec {
  import spark.implicits._

  private def events = (1 to 200).map { i =>
    FanOutEv(i % 7, if (i % 3 == 0) "a" else "b",
      new java.sql.Timestamp(1700000000000L + i * 137L),
      (i % 50) * 1.7, i % 11)
  }.toDF()

  private val rules = Seq(
    Rule(queryId = Some(1L), groupingKeyNames = Seq("carId"),
      windowFilterRules = Seq(FilterSpec("kind", CompareOp.Equal, "a")),
      aggregateFieldName = Some("speed"),
      aggregatorFunctionType = Some(AggregatorType.Sum),
      windowMilliseconds = Some(1000L), frequencyMilliseconds = Some(0L)),
    Rule(queryId = Some(2L), groupingKeyNames = Seq("carId", "kind"),
      windowFilterRules = Seq(
        FilterSpec("speed", CompareOp.Greater, "20"),
        FilterSpec("n", CompareOp.LessEqual, "7")),
      aggregateFieldName = Some(Rule.CountSentinel),
      windowMilliseconds = Some(1000L), frequencyMilliseconds = Some(0L),
      // alertRules present -> payload JSON must render identically
      alertRules = Seq(Rule(queryId = Some(9L), groupingKeyNames = Seq("$carId")))),
    Rule(queryId = Some(3L), groupingKeyNames = Nil,
      windowFilterRules = Seq(FilterSpec("carId", CompareOp.Equal, "3")),
      aggregateFieldName = Some("n"),
      aggregatorFunctionType = Some(AggregatorType.Max),
      windowMilliseconds = Some(1000L), frequencyMilliseconds = Some(0L)),
    Rule(queryId = Some(4L), groupingKeyNames = Seq("kind"),
      windowFilterRules = Seq(FilterSpec("speed", CompareOp.NotEqual, "0")),
      aggregateFieldName = Some("speed"),
      aggregatorFunctionType = Some(AggregatorType.Avg),
      windowMilliseconds = Some(1000L), frequencyMilliseconds = Some(0L)))

  test("broadcast kernel == compiled kernel, byte for byte") {
    val a = FanOut.keyed(events, rules, "ts").collect().toSet
    val b = FanOut.keyedBroadcast(events, rules, "ts").collect().toSet
    assert(a == b)
    assert(a.nonEmpty && a.exists(_.payload.nonEmpty) && a.exists(_.key == "{}"))
  }

  test("auto switches to broadcast beyond the plan-size limit and agrees") {
    // 40 distinct rules (> CompiledRuleLimit): one per carId x threshold
    val many = (0 until 40).map { i =>
      Rule(queryId = Some(100L + i), groupingKeyNames = Seq("carId"),
        windowFilterRules = Seq(
          FilterSpec("carId", CompareOp.Equal, (i % 7).toString),
          FilterSpec("speed", CompareOp.GreaterEqual, (i * 2).toString)),
        aggregateFieldName = Some("speed"),
        aggregatorFunctionType = Some(AggregatorType.Sum),
        windowMilliseconds = Some(1000L), frequencyMilliseconds = Some(0L))
    }
    assert(many.size > FanOut.CompiledRuleLimit)
    val a = FanOut.keyed(events, many, "ts").collect().toSet
    val b = FanOut.auto(events, many, "ts").collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
