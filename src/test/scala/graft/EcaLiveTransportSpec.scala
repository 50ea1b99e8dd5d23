package graft

import graft.sources.RuleFileSource
import graft.streaming.DynamicActiveEngine
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The CONTINUOUS face of the ECA loop (C4/C5), pinned against the
  * oracle-checked replay: q185 proves spawn→fire semantics through the
  * per-batch replay harness; this spec runs the SAME fixture through
  * the live streaming engine — events as a real micro-batch stream
  * (engine.writer), the parent rule arriving over the line transport
  * (attachLines, the Kafka-face merge point) instead of a direct store
  * merge — and asserts the fired alert set is IDENTICAL to the q185
  * query's rows. Since q185's rows are DuckDB-oracle-matched every
  * round, equality here oracle-matches the live face transitively. */
class EcaLiveTransportSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("live engine + line-transport rule: spawn→fire alerts equal the q185 oracle-checked replay") {
    // expected: the oracle-checked replay face, at the same SF
    val expected = SparkEntry.queries("q185_eca_spawn_fire")(spark, dir)
      .as[(String, String, Long, Double)].collect().toSet
    assert(expected.nonEmpty, "q185 replay fired nothing at this SF")
    assert(expected.exists(_._1 == "child"), "q185 replay spawned no child")

    // the replay's exact feed: one event per (user_id, ms) — min
    // event_id wins — batched by week in ascending order
    val ms = (unix_micros(col("ts").cast("timestamp")) / lit(1000)).cast("long")
    val base = graft.sources.Tables.load(spark, dir, "events")
      .withColumn("__ms", ms)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("__ms")).orderBy(col("event_id"))))
      .filter(col("__rn") === 1)
      .withColumn("__wk", expr("__ms div 604800000"))
      .select(col("__wk"), col("user_id"), col("ts"), col("value"))
      .as[(Long, Long, java.sql.Timestamp, Double)].collect()
    val weekBatches = base.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.map(r => (r._2, r._3, r._4)).toSeq }

    val engine = new DynamicActiveEngine()
    val fired = scala.collection.mutable.ArrayBuffer.empty[graft.model.Alert]
    engine.onAlerts(as => fired.synchronized { fired ++= as })

    // the rule arrives over the line transport — the Kafka-face merge
    // point — not a driver-side store.merge
    val ruleIn = MemoryStream[String](spark)
    val ruleQ = RuleFileSource.attachLines(ruleIn.toDF(), engine.store,
      Trigger.ProcessingTime("100 milliseconds"))
    val evIn = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
    val q = engine.writer(
        evIn.toDF().toDF("user_id", "ts", "value"), "ts")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      ruleIn.addData(
        """{"queryId":4000,"groupingKeyNames":["user_id"],
           "aggregateFieldName":"value","aggregatorFunctionType":"SUM",
           "limitOperatorType":">","limit":250,
           "windowMilliseconds":86400000,
           "alertRules":[{"groupingKeyNames":["$user_id"],
             "aggregateFieldName":"value","aggregatorFunctionType":"SUM",
             "limitOperatorType":">","limit":50,
             "windowMilliseconds":21600000,"frequencyMilliseconds":0}]}"""
          .replaceAll("\n\\s*", ""))
      ruleQ.processAllAvailable()
      assert(engine.store.size == 1, "parent not merged over the transport")
      weekBatches.foreach { b =>
        evIn.addData(b: _*); q.processAllAvailable()
      }
    } finally { q.stop(); ruleQ.stop() }

    val got = fired.synchronized(fired.toList).map { a =>
      (if (a.ruleId == 4000L) "parent" else "child",
        a.key, a.tsMillis, BigDecimal(a.aggregate).toDouble)
    }.toSet
    assert(got == expected,
      s"live-face firings diverge from the oracle-checked replay: " +
        s"missing=${expected.diff(got).take(5)} extra=${got.diff(expected).take(5)}")
    // C5 on the live face: exactly one child instance per spawning user
    val children = engine.store.snapshot().filter(_.activeId.contains(4000L))
    val childFilters = children.map(_.windowFilterRules.map(f =>
      (f.field, f.value)).toSet)
    assert(childFilters.distinct.size == childFilters.size,
      "duplicate child instances for one user — C5 dedup broken on the live face")
  }
}
