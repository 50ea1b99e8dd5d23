package graft

import graft.model._
import graft.sinks.Sinks
import graft.streaming.ActiveEngine
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** W2/W3/W5/W8: native windowed continuous query with watermark
  * eviction, and the K2/C8 sink surfaces. */
class WindowedStreamSpec extends SparkSpec {
  import spark.implicits._

  case class Ev(user: Long, ts: java.sql.Timestamp, v: Double)
  def ev(user: Long, tsMs: Long, v: Double) = Ev(user, new java.sql.Timestamp(tsMs), v)

  test("session_window merges events exactly one gap apart (q38's oracle relies on it)") {
    import org.apache.spark.sql.functions._
    // Three users: one pair exactly 30 min apart (must MERGE -> end extends
    // to last+gap), one pair 1 s closer (also merges), one pair 1 s past
    // the gap (must SPLIT). Pins the boundary the DuckDB oracle mirrors
    // with a strictly-greater break condition. Input built from tuples:
    // a spec-inner case class has no usable Spark encoder for toDF.
    val gapMs = 30 * 60 * 1000L
    val t0 = 1700000000000L
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val df = Seq(
      (1L, ts(t0), 1.0), (1L, ts(t0 + gapMs), 1.0),         // exactly gap apart
      (2L, ts(t0), 1.0), (2L, ts(t0 + gapMs + 1000), 1.0),  // gap + 1 s
      (3L, ts(t0), 1.0), (3L, ts(t0 + gapMs - 1000), 1.0))  // gap - 1 s
      .toDF("user", "ts", "v")
    val sessions = df
      .groupBy(col("user"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user"), col("n")).as[(Long, Long)].collect().sorted
    assert(sessions.toSeq == Seq((1L, 2L), (2L, 1L), (2L, 1L), (3L, 2L)))
  }

  test("windowed streaming query finalizes windows past the watermark (W2/W5/W8)") {
    val rule = Rule(
      queryId = Some(1L),
      groupingKeyNames = Seq("user"),
      aggregateFieldName = Some("v"),
      aggregatorFunctionType = Some(AggregatorType.Sum),
      windowMilliseconds = Some(60000L)) // 1-min tumbling
    val engine = new ActiveEngine()
    val base = 1700000000000L - (1700000000000L % 60000L) // window-aligned
    val input = MemoryStream[Ev](spark)
    val out = engine.windowedQuery(input.toDF(), rule, "ts")
    val q = out.writeStream.format("memory").queryName("w2_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(ev(1, base + 1000, 10), ev(1, base + 2000, 5),
        ev(2, base + 3000, 7))
      q.processAllAvailable()
      // watermark still at 0 → nothing finalized
      assert(spark.table("w2_out").count() == 0)
      // jump 3 windows ahead: watermark = max(ts) - 60s passes window 0
      input.addData(ev(1, base + 180000, 1))
      q.processAllAvailable()
      input.addData(ev(1, base + 240000, 1)) // advance again to flush
      q.processAllAvailable()
      val rows = spark.table("w2_out")
        .select($"user", $"w_start", $"agg_value".cast("string"))
        .as[(Long, Long, String)].collect().toSet
      assert(rows.contains((1L, base / 1000, "15.000000")))
      assert(rows.contains((2L, base / 1000, "7.000000")))
    } finally q.stop()
  }

  test("streaming session window finalizes a closed session past the watermark") {
    val engine = new ActiveEngine()
    val gap = 60000L
    val base = 1700000000000L
    val input = MemoryStream[Ev](spark)
    val out = engine.sessionQuery(input.toDF(), Seq("user"), gap, "v", "ts")
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // burst of 3 events within one gap = one session
      input.addData(ev(1, base, 10), ev(1, base + 1000, 5), ev(1, base + 2000, 7))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0, "session still open")
      // jump event time far past the close: watermark finalizes it
      input.addData(ev(1, base + 10 * gap, 1))
      q.processAllAvailable()
      input.addData(ev(1, base + 11 * gap, 1)) // advance again to flush
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select($"user", $"s_start", $"s_end", $"n_events",
          $"agg_value".cast("string"))
        .as[(Long, Long, Long, Long, String)].collect().toSet
      assert(rows.contains((1L, base, base + 2000 + gap, 3L, "22.000000")),
        s"got $rows")
    } finally q.stop()
  }

  test("demo CSV sink formats the reference line (K2)") {
    val alerts = Seq(
      Alert(1L, "{carId=270}", 1700000000123L, "130.000000", passed = true, "{}"))
      .toDS()
    val line = Sinks.demoCsvLine(alerts).as[String].head()
    assert(line == "Rule 1,{carId=270},1700000000123,130.000000,true")
  }

  test("observe() metrics attach without changing results (C8)") {
    val alerts = Seq(
      Alert(1L, "a", 1L, "1", passed = true, "{}"),
      Alert(1L, "b", 2L, "2", passed = false, "{}")).toDS()
    val observed = Sinks.observed(alerts)
    assert(observed.collect().length == 2)
  }

  test("observed metrics report counts, fired and event-time lag (K3/C8)") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val now = System.currentTimeMillis()
    val alerts = Seq(
      Alert(1L, "a", now - 5000L, "10", passed = true, "{}"),
      Alert(1L, "b", now - 1000L, "3", passed = false, "{}"),
      Alert(2L, "c", now - 2000L, "7", passed = true, "{}")).toDS()
    @volatile var got: Option[org.apache.spark.sql.Row] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get("graft_alerts").foreach(r => got = Some(r))
      override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Sinks.observed(alerts).collect()
      // QueryExecutionListener delivery is async
      val deadline = System.currentTimeMillis() + 20000
      while (got.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      val m = got.getOrElse(fail("observed metrics never delivered"))
      assert(m.getAs[Long]("alerts") == 3L)
      assert(m.getAs[Long]("fired") == 2L)
      // the oldest alert is ~5 s behind wall clock at evaluation time
      val lag = m.getAs[Long]("max_lag_ms")
      assert(lag >= 5000L && lag < 120000L, s"lag $lag")
    } finally spark.listenerManager.unregister(listener)
  }
}
