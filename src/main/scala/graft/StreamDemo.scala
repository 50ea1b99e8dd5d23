package graft

import graft.rules.RuleCodec
import graft.streaming.ActiveEngine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** End-to-end streaming demo of the active engine: file-stream ingest →
  * rule fan-out → per-event sliding window (W1) → HAVING → alerts → ECA
  * rule spawning (C4), driven as a real Structured Streaming query.
  *
  * Usage: runMain graft.StreamDemo [sfDir]
  * Prints alert counts per batch and the rules spawned by the feedback
  * loop.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-stream-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // README-style parent rule: per-user AVG over a trailing day, emitting
    // per event; on firing, spawn a per-user COUNT monitor with a TTL.
    val parent = RuleCodec.decode(
      """{"queryId":1,"queryState":"ACTIVE",
          "windowFilterRules":[{"field":"event_type","operator":"=","value":"purchase"}],
          "groupingKeyNames":["user_id"],
          "aggregateFieldName":"value","aggregatorFunctionType":"AVG",
          "limitOperatorType":">","limit":60,
          "windowMilliseconds":86400000,"frequencyMilliseconds":0,
          "alertRules":[{"queryId":2,"queryState":"ACTIVE",
            "groupingKeyNames":["$user_id"],
            "aggregateFieldName":"COUNT_FLINK",
            "limitOperatorType":">","limit":3,
            "windowMilliseconds":3600000,"frequencyMilliseconds":0,
            "lastTime":600000}]}""")

    val engine = new ActiveEngine()
    engine.store.merge(parent)
    var fired = 0L
    engine.onAlerts(alerts => fired += alerts.size)

    // stream the events table as a file source (schema from a batch peek)
    val schema = graft.sources.Tables.load(spark, sfDir, "events").schema
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.readStream.schema(
      org.apache.spark.sql.types.StructType(schema.fields.map {
        case f if f.name == "ts" =>
          org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType)
        case f => f
      })).parquet {
        // the file stream source needs a directory: stage the events file
        val d = java.nio.file.Files.createTempDirectory("graft-demo-events")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$sfDir/events.parquet"),
          d.resolve("events.parquet"))
        d.toString
      }
    val events = raw.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))

    val q = engine.perEventWriter(events, "ts")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-demo-ckpt").toString)
      .start()
    q.awaitTermination()

    println(s"[demo] alerts fired: $fired")
    println(s"[demo] rules in store after ECA: ${engine.store.size}")
    engine.store.snapshot().filter(_.activeId.isDefined).take(3).foreach { r =>
      println(s"[demo] spawned: ${RuleCodec.encode(r)}")
    }
    spark.stop()
  }
}
