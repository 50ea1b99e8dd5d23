package graft.streaming

import graft.compile.RuleCompiler
import graft.model.{KeyedEvent, Rule}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** D1-D3 for the streaming path: the event×rule fan-out.
  *
  * For every live rule, events passing the rule's filters are tagged with
  * (ruleId, composite key string) — the reference's "implicit copy"
  * pattern (`DynamicKeyFunction.java:43-105`) — and union the per-rule
  * branches. The rule set is tiny and the filters are compiled literals,
  * so Catalyst shares the single source scan across branches and only
  * matching rows ever reach the downstream shuffle (the reference's
  * hand-built filter-before-shuffle, free here).
  *
  * Output is the normalized [[KeyedEvent]]: event-time millis, aggregate
  * input as an exact decimal string, full event payload as JSON.
  */
object FanOut {

  def keyed(events: DataFrame, rules: Seq[Rule], tsCol: String = "ts"): Dataset[KeyedEvent] = {
    implicit val enc = Encoders.product[KeyedEvent]
    require(rules.nonEmpty, "fan-out needs at least one rule")
    rules.map { r =>
      val aggIn = r.aggregateFieldName match {
        case Some(f) if !Rule.isCountSentinel(f) =>
          col(f).cast(RuleCompiler.RuleDecimal).cast("string")
        case _ => lit("")
      }
      // the JSON payload is only consumed by ECA template binding — rules
      // with no alertRules skip the per-event render entirely
      val payload =
        if (r.alertRules.nonEmpty) to_json(struct(events.columns.map(col): _*))
        else lit("")
      events
        .filter(RuleCompiler.filterColumn(r, Some(events.schema)))
        .select(
          lit(r.queryId.getOrElse(-1L)).as("ruleId"),
          RuleCompiler.keyStringColumn(r).as("key"),
          (unix_micros(col(tsCol).cast("timestamp")) / lit(1000)).cast("long")
            .as("tsMillis"),
          coalesce(aggIn, lit("")).as("aggIn"),
          payload.as("payload"))
    }.reduce(_ unionByName _).as[KeyedEvent]
  }
}
