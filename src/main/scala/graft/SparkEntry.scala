package graft

import graft.exec.BatchExec
import graft.rules.RuleCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every oracle-checked query routes through the engine proper
  * ([[graft.rules.RuleCodec]] → [[graft.exec.BatchExec]]) where the
  * operator under test is part of the rule-engine surface; the star-schema
  * / document / embedding queries exercise the warehouse face directly.
  * Column names are aligned with `oracleSql` (the driver sorts columns by
  * name and hashes values).
  */
object SparkEntry {

  private def events(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.load(spark, dir, "events")
  private def table(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(spark, dir, name)

  /** Run a rule given as JSON — the full reference entry path (JSON rule →
    * codec → compiled Columns → execution), minus the Kafka transport. */
  private def rule(spark: SparkSession, dir: String, json: String): DataFrame =
    BatchExec.run(RuleCodec.decode(json), events(spark, dir), "ts")

  /** Flagship query on sf=0.001: multi-rule fan-out (D1) in the spirit of
    * the reference README's example queries. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val rules = Seq(
      """{"queryId":1,"windowFilterRules":[{"field":"event_type","operator":"=","value":"purchase"}],
         "groupingKeyNames":["user_id"],"aggregateFieldName":"value",
         "aggregatorFunctionType":"AVG","limitOperatorType":">","limit":0,
         "windowMilliseconds":86400000}""",
      """{"queryId":2,"windowFilterRules":[{"field":"value","operator":">","value":"50"}],
         "groupingKeyNames":["event_type"],"aggregateFieldName":"COUNT_FLINK",
         "limitOperatorType":">","limit":1,"windowMilliseconds":86400000}"""
    ).map(RuleCodec.decode)
    BatchExec.runAll(rules, events(spark, dir), "ts")
  }

  // ---------------------------------------------------------------------
  // Rule-engine surface (SURVEY §2): each entry names the operator ids it
  // exercises.
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P2/P3/P4/W4: dynamic conjunctive filter (string-eq + decimal ops),
    // raw passthrough mode.
    "q01_filter_passthrough" -> ((s, dir) =>
      rule(s, dir,
        """{"queryId":101,"windowFilterRules":[
             {"field":"event_type","operator":"=","value":"purchase"},
             {"field":"value","operator":">","value":"50"},
             {"field":"value","operator":"<=","value":"180"}]}""")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")),

    // A1+A8: exact-decimal SUM with HAVING.
    "q02_rule_sum_having" -> ((s, dir) =>
      rule(s, dir,
        """{"queryId":102,"windowFilterRules":[
             {"field":"event_type","operator":"=","value":"purchase"}],
           "groupingKeyNames":["user_id"],"aggregateFieldName":"value",
           "aggregatorFunctionType":"SUM","limitOperatorType":">","limit":500}""")
        .orderBy("user_id")),

    // A2: exact AVG (micro-unit integer arithmetic, ROUND_HALF_UP @ scale 6).
    "q03_rule_avg" -> ((s, dir) =>
      rule(s, dir,
        """{"queryId":103,"groupingKeyNames":["user_id"],
           "aggregateFieldName":"value","aggregatorFunctionType":"AVG"}""")
        .orderBy("user_id")),

    // A3: MIN.
    "q04_rule_min" -> ((s, dir) =>
      rule(s, dir,
        """{"queryId":104,"groupingKeyNames":["event_type"],
           "aggregateFieldName":"value","aggregatorFunctionType":"MIN"}""")
        .orderBy("event_type")),

    // A4: MAX.
    "q05_rule_max" -> ((s, dir) =>
      rule(s, dir,
        """{"queryId":105,"groupingKeyNames":["event_type"],
           "aggregateFieldName":"value","aggregatorFunctionType":"MAX"}""")
        .orderBy("event_type")),

    // A5+A8: COUNT via the reference's sentinel field, with HAVING.
    "q06_rule_count" -> ((s, dir) =>
      rule(s, dir,
        """{"queryId":106,"groupingKeyNames":["event_type"],
           "aggregateFieldName":"COUNT_FLINK",
           "limitOperatorType":">=","limit":10}""")
        .orderBy("event_type")),

    // W2: tumbling window (1 day), SUM per event_type.
    "q07_window_tumbling" -> ((s, dir) =>
      rule(s, dir,
        """{"queryId":107,"groupingKeyNames":["event_type"],
           "aggregateFieldName":"value","aggregatorFunctionType":"SUM",
           "windowMilliseconds":86400000}""")
        .orderBy("event_type", "w_start")),

    // W3: sliding window (1 h window, 15 min slide), SUM per event_type.
    "q08_window_sliding" -> ((s, dir) =>
      rule(s, dir,
        """{"queryId":108,"groupingKeyNames":["event_type"],
           "aggregateFieldName":"value","aggregatorFunctionType":"SUM",
           "windowMilliseconds":3600000,"frequencyMilliseconds":900000}""")
        .orderBy("event_type", "w_start")),

    // D1+D2+D3: multi-rule fan-out with composite key strings.
    "q09_rule_fanout" -> ((s, dir) => {
      val rules = Seq(
        """{"queryId":1,"windowFilterRules":[
             {"field":"event_type","operator":"=","value":"purchase"}],
           "groupingKeyNames":["user_id"],"aggregateFieldName":"value",
           "aggregatorFunctionType":"SUM","windowMilliseconds":86400000}""",
        """{"queryId":2,"windowFilterRules":[
             {"field":"value","operator":">","value":"100"}],
           "groupingKeyNames":["event_type"],"aggregateFieldName":"COUNT_FLINK",
           "windowMilliseconds":86400000}""",
        """{"queryId":3,"groupingKeyNames":[],
           "aggregateFieldName":"value","aggregatorFunctionType":"MAX",
           "windowMilliseconds":604800000}"""
      ).map(RuleCodec.decode)
      BatchExec.runAll(rules, events(s, dir), "ts")
        .orderBy("rule_id", "group_key", "w_start")
    }),

    // W1 (batch analog): per-event trailing-window aggregate (inclusive
    // bounds), bucketed self-join implementation.
    "q10_per_event_sliding" -> ((s, dir) =>
      rule(s, dir,
        """{"queryId":110,"windowFilterRules":[
             {"field":"value","operator":">","value":"5"}],
           "groupingKeyNames":["user_id"],"aggregateFieldName":"value",
           "aggregatorFunctionType":"SUM",
           "windowMilliseconds":21600000,"frequencyMilliseconds":0}""")
        .select("event_id", "agg_value")
        .orderBy("event_id")),

    // Warehouse face: broadcast dimension join (lineitem ⋈ part), revenue
    // per brand. The multiply happens in IEEE double (identical on any
    // engine), the SUM in exact decimal.
    "q11_join_revenue" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val p = table(s, dir, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(38,4)")).cast("decimal(38,4)").as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy("p_brand")
    }),

    // Warehouse face: top-k (sort + limit) with deterministic tiebreak.
    "q12_topk_orders" -> ((s, dir) =>
      table(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10)),

    // F9: JSON field extraction from the event props payload.
    "q13_json_extract" -> ((s, dir) =>
      events(s, dir)
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("k").agg(count(lit(1)).as("cnt"))
        .orderBy("k"))
  )

  // ---------------------------------------------------------------------
  // DuckDB oracles. Conventions for engine-agnostic exactness:
  //  * aggregate sums: per-value CAST to DECIMAL(38,6) then SUM (exact);
  //  * AVG: integer micro-units, (2s+n)//(2n) = ROUND_HALF_UP @ scale 6;
  //  * double arithmetic before a decimal cast is bit-identical IEEE;
  //  * window starts computed as integer epoch-seconds arithmetic.
  // ---------------------------------------------------------------------

  private val DEC = "DECIMAL(38,6)"
  private def sumDec(e: String) = s"CAST(SUM(CAST($e AS $DEC)) AS $DEC)"

  def oracleSql: Map[String, String] = Map(
    "q01_filter_passthrough" ->
      """SELECT event_id, user_id, event_type, value FROM events
         WHERE event_type = 'purchase' AND value > 50 AND value <= 180
         ORDER BY event_id""",

    "q02_rule_sum_having" ->
      s"""SELECT user_id, ${sumDec("value")} AS agg_value FROM events
          WHERE event_type = 'purchase' GROUP BY user_id
          HAVING ${sumDec("value")} > 500 ORDER BY user_id""",

    "q03_rule_avg" ->
      s"""WITH a AS (
            SELECT user_id,
                   SUM(CAST(CAST(value AS $DEC) * 1000000 AS BIGINT)) AS s,
                   COUNT(value) AS c
            FROM events GROUP BY user_id)
          SELECT user_id,
                 CAST(((2*s + c) // (2*c)) / 1000000.0 AS $DEC) AS agg_value
          FROM a ORDER BY user_id""",

    "q04_rule_min" ->
      s"""SELECT event_type, CAST(MIN(CAST(value AS $DEC)) AS $DEC) AS agg_value
          FROM events GROUP BY event_type ORDER BY event_type""",

    "q05_rule_max" ->
      s"""SELECT event_type, CAST(MAX(CAST(value AS $DEC)) AS $DEC) AS agg_value
          FROM events GROUP BY event_type ORDER BY event_type""",

    "q06_rule_count" ->
      s"""SELECT event_type, CAST(COUNT(*) AS $DEC) AS agg_value
          FROM events GROUP BY event_type
          HAVING COUNT(*) >= 10 ORDER BY event_type""",

    "q07_window_tumbling" ->
      s"""SELECT event_type,
                 CAST(floor(epoch(ts)/86400) AS BIGINT)*86400 AS w_start,
                 ${sumDec("value")} AS agg_value
          FROM events GROUP BY event_type, w_start
          ORDER BY event_type, w_start""",

    "q08_window_sliding" ->
      s"""SELECT event_type,
                 (CAST(floor(epoch(ts)/900) AS BIGINT) - k.k)*900 AS w_start,
                 ${sumDec("value")} AS agg_value
          FROM events, range(4) k(k)
          GROUP BY event_type, w_start
          ORDER BY event_type, w_start""",

    "q09_rule_fanout" ->
      s"""SELECT * FROM (
            SELECT 1 AS rule_id,
                   '{user_id=' || CAST(user_id AS VARCHAR) || '}' AS group_key,
                   CAST(floor(epoch(ts)/86400) AS BIGINT)*86400 AS w_start,
                   ${sumDec("value")} AS agg_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, w_start
          UNION ALL
            SELECT 2 AS rule_id,
                   '{event_type=' || event_type || '}' AS group_key,
                   CAST(floor(epoch(ts)/86400) AS BIGINT)*86400 AS w_start,
                   CAST(COUNT(*) AS $DEC) AS agg_value
            FROM events WHERE value > 100
            GROUP BY event_type, w_start
          UNION ALL
            SELECT 3 AS rule_id, '{}' AS group_key,
                   CAST(floor(epoch(ts)/604800) AS BIGINT)*604800 AS w_start,
                   CAST(MAX(CAST(value AS $DEC)) AS $DEC) AS agg_value
            FROM events GROUP BY w_start)
          ORDER BY rule_id, group_key, w_start""",

    "q10_per_event_sliding" ->
      s"""SELECT e.event_id, ${sumDec("b.value")} AS agg_value
          FROM events e JOIN events b
            ON b.user_id = e.user_id
           AND epoch_us(b.ts) >= epoch_us(e.ts) - 21600000000
           AND epoch_us(b.ts) <= epoch_us(e.ts)
          WHERE e.value > 5 AND b.value > 5
          GROUP BY e.event_id ORDER BY e.event_id""",

    "q11_join_revenue" ->
      """SELECT p_brand,
                CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,4)))
                     AS DECIMAL(38,4)) AS revenue,
                COUNT(*) AS cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",

    "q12_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

    "q13_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
                COUNT(*) AS cnt
         FROM events GROUP BY k ORDER BY k"""
  )
}
