package graft.sources

import graft.active.RuleStore
import graft.rules.RuleCodec
import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** S1/S2: the streaming rule transport.
  *
  * The reference feeds rules either from a Kafka topic (`App.java:34-43`,
  * its deployment detail) or by tailing a JSON-lines file
  * (`rule/RuleFromFile.java:15-43`); either way each line is decoded and
  * broadcast to the operators. Here the same JSON lines arrive through
  * Spark's file stream source — every file dropped into `dir` is picked up
  * at the next trigger — and merge into the shared [[RuleStore]], which
  * the [[graft.streaming.DynamicActiveEngine]] re-snapshots per batch:
  * together they are the broadcast-state equivalent (SURVEY §3). Any
  * line-oriented streaming source (Kafka included) plugs in identically —
  * the merge point only needs lines.
  *
  * Decode is lenient: malformed lines are dropped, exactly the reference's
  * drop-on-error deserializer (S6, `RuleDeserializer.java:37-39`). Rules
  * are a human-scale control stream, not a data path, so the per-batch
  * `collect()` at the merge point is bounded by construction.
  */
object RuleFileSource {

  def attach(spark: SparkSession, store: RuleStore, dir: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    attachLines(spark.readStream.text(dir).toDF(), store, trigger)

  /** S1: the transport-agnostic merge point. Any line-oriented streaming
    * DataFrame plugs in — the first column is read as the JSON rule line.
    * The Kafka face of the reference (`App.java:34-43`) is exactly:
    * {{{
    * attachLines(
    *   spark.readStream.format("kafka")
    *     .option("kafka.bootstrap.servers", servers)
    *     .option("subscribe", rulesTopic).load()
    *     .selectExpr("CAST(value AS STRING)"),
    *   store)
    * }}}
    * (no broker runs in tests; the merge point itself is exercised with a
    * `MemoryStream[String]` standing in for the Kafka DataFrame —
    * DynamicEngineSpec "attachLines takes any line-shaped stream" — so
    * decode, upsert-merge and lenient drop are tested on exactly the
    * single-string-column shape the snippet produces). */
  def attachLines(lines: org.apache.spark.sql.DataFrame, store: RuleStore,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    lines
      .writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        batch.collect().iterator
          .map(_.getString(0))
          .filter(l => l != null && l.trim.nonEmpty)
          .flatMap(RuleCodec.decodeOption)
          .foreach(r => store.merge(r))
        ()
      }
      .start()
}
