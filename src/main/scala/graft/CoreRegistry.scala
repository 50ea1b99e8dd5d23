package graft

import graft.exec.BatchExec
import graft.rules.RuleCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The rule-engine core registry: dynamic filter/aggregate/window
  * queries (q01-q13), geo enrichment, the dynamic-engine replays, and
  * their DuckDB oracles. */
trait CoreRegistry extends EntryHelpers {

  protected def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
      aggDouble(rule(s, dir,
        """{"queryId":102,"windowFilterRules":[
             {"field":"event_type","operator":"=","value":"purchase"}],
           "groupingKeyNames":["user_id"],"aggregateFieldName":"value",
           "aggregatorFunctionType":"SUM","limitOperatorType":">","limit":500}"""))
        .orderBy("user_id")),

    // A2: exact AVG (micro-unit integer arithmetic, ROUND_HALF_UP @ scale 6).
    "q03_rule_avg" -> ((s, dir) =>
      aggDouble(rule(s, dir,
        """{"queryId":103,"groupingKeyNames":["user_id"],
           "aggregateFieldName":"value","aggregatorFunctionType":"AVG"}"""))
        .orderBy("user_id")),

    // A3: MIN.
    "q04_rule_min" -> ((s, dir) =>
      aggDouble(rule(s, dir,
        """{"queryId":104,"groupingKeyNames":["event_type"],
           "aggregateFieldName":"value","aggregatorFunctionType":"MIN"}"""))
        .orderBy("event_type")),

    // A4: MAX.
    "q05_rule_max" -> ((s, dir) =>
      aggDouble(rule(s, dir,
        """{"queryId":105,"groupingKeyNames":["event_type"],
           "aggregateFieldName":"value","aggregatorFunctionType":"MAX"}"""))
        .orderBy("event_type")),

    // A5+A8: COUNT via the reference's sentinel field, with HAVING.
    "q06_rule_count" -> ((s, dir) =>
      aggDouble(rule(s, dir,
        """{"queryId":106,"groupingKeyNames":["event_type"],
           "aggregateFieldName":"COUNT_FLINK",
           "limitOperatorType":">=","limit":10}"""))
        .orderBy("event_type")),

    // W2: tumbling window (1 day), SUM per event_type.
    "q07_window_tumbling" -> ((s, dir) =>
      aggDouble(rule(s, dir,
        """{"queryId":107,"groupingKeyNames":["event_type"],
           "aggregateFieldName":"value","aggregatorFunctionType":"SUM",
           "windowMilliseconds":86400000}"""))
        .orderBy("event_type", "w_start")),

    // W3: sliding window (1 h window, 15 min slide), SUM per event_type.
    "q08_window_sliding" -> ((s, dir) =>
      aggDouble(rule(s, dir,
        """{"queryId":108,"groupingKeyNames":["event_type"],
           "aggregateFieldName":"value","aggregatorFunctionType":"SUM",
           "windowMilliseconds":3600000,"frequencyMilliseconds":900000}"""))
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
      aggDouble(BatchExec.runAll(rules, events(s, dir), "ts"))
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
        .transform(aggDouble)
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
            .cast("decimal(38,4)")).cast("decimal(38,4)").cast("double")
            .as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy("p_brand")
    }),

    // Warehouse face: top-k (sort + limit) with deterministic tiebreak.
    "q12_topk_orders" -> ((s, dir) =>
      table(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10)),

    // Warehouse face: ROLLUP grouping sets (beyond the reference surface;
    // Catalyst native).
    "q26_rollup_revenue" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(38,6)")).cast("decimal(38,6)")
            .cast("double").as("sum_qty"),
          count(lit(1)).as("cnt"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // Warehouse face: CUBE grouping sets — all four (returnflag x
    // linestatus) marginal combinations in one pass (Catalyst expands to
    // a single aggregate over the grouping-set id; no multi-scan union).
    "q65_cube_revenue" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(38,6)")).cast("decimal(38,6)")
            .cast("double").as("sum_qty"),
          count(lit(1)).as("cnt"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // Warehouse face: ranking window function — latest order per customer.
    "q27_window_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_orderdate"), asc("o_orderkey"))
      table(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    }),

    // Warehouse face: set operations — high-value event types EXCEPT
    // error types, INTERSECT with purchase-capable users' types.
    "q28_set_ops" -> ((s, dir) => {
      val e = events(s, dir)
      val highValue = e.filter(col("value") > 150).select("event_type")
      val errors = e.filter(col("event_type") === "error").select("event_type")
      highValue.distinct()
        .except(errors.distinct())
        .unionByName(e.filter(col("value") > 199).select("event_type").distinct())
        .distinct()
        .orderBy("event_type")
    }),

    // Warehouse face: session windows (gaps-and-islands) — absent from
    // the reference (its windows are tumbling/sliding only, SURVEY §2.2).
    // Native session_window: adjacent [ts, ts+gap) intervals merge while
    // they touch (verified: exactly-gap-apart events DO merge, so the
    // oracle's break condition is strictly-greater). State per (user,
    // session), mergeable — scales as a single shuffle on user_id.
    "q38_session_window" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "6 hours"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(38,6)")).as("sv"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("sess_start"),
          unix_micros(col("session_window.end")).as("sess_end"),
          col("n_events"),
          col("sv").cast("double").as("sum_value"))
        .orderBy("user_id", "sess_start")),

    // F9: JSON field extraction from the event props payload.
    "q13_json_extract" -> ((s, dir) =>
      events(s, dir)
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("k").agg(count(lit(1)).as("cnt"))
        .orderBy("k")),

    // The DYNAMIC streaming engine itself, oracle-checked: replay the
    // events table through DynamicActiveEngine.processBatch in weekly
    // micro-batches (arrival order = event-time order) and emit the fired
    // alerts. q30 = W1 per-event trailing window (SUM, HAVING); q31 = W2
    // tumbling windows finalized when event time passes the window end.
    // Events are deduped to one per (user_id, ms) first so within-batch
    // processing order cannot affect trailing-window membership.
    "q30_dynamic_engine_replay" -> ((s, dir) =>
      dynamicReplay(s, dir,
        """{"queryId":300,"windowFilterRules":[
             {"field":"value","operator":">","value":"5"}],
           "groupingKeyNames":["user_id"],"aggregateFieldName":"value",
           "aggregatorFunctionType":"SUM","limitOperatorType":">","limit":100,
           "windowMilliseconds":21600000,"frequencyMilliseconds":0}""")),

    "q31_dynamic_periodic_replay" -> ((s, dir) =>
      dynamicReplay(s, dir,
        """{"queryId":310,"groupingKeyNames":["event_type"],
           "aggregateFieldName":"value","aggregatorFunctionType":"SUM",
           "windowMilliseconds":86400000}""")),

    // C4/C5 END-TO-END through the engine, oracle-checked (the
    // reference's headline ECA feature, DynamicQueryFunction.java:193-203
    // + KafkaSender.java:56-123): a periodic parent (daily SUM per user
    // > 250) fires, the engine's deliver step ECA-instantiates its
    // $user_id-bound per-event child (trailing 6 h SUM > 50, key bound
    // from the firing window's group key, an equality filter appended),
    // and the child fires on LATER batches' events. The oracle replays
    // both stages one-shot: a parent window finalizes at the first
    // weekly batch whose cumulative event-time max passes the window
    // end; each user's child evaluates exactly the events of weeks
    // STRICTLY AFTER that user's first parent firing — spawn happens
    // after the firing batch is processed, and a spawned rule's state
    // starts empty (reference semantics: a new rule sees only events
    // that reach the operator after it). Re-firings re-spawn
    // idempotently (C5: RuleStore.merge re-trigger on (filters,
    // activeId) reuses the live child instance).
    "q185_eca_spawn_fire" -> ((s, dir) =>
      dynamicReplayRaw(s, dir,
        """{"queryId":4000,"groupingKeyNames":["user_id"],
           "aggregateFieldName":"value","aggregatorFunctionType":"SUM",
           "limitOperatorType":">","limit":250,
           "windowMilliseconds":86400000,
           "alertRules":[{"groupingKeyNames":["$user_id"],
             "aggregateFieldName":"value","aggregatorFunctionType":"SUM",
             "limitOperatorType":">","limit":50,
             "windowMilliseconds":21600000,"frequencyMilliseconds":0}]}""")
        .select(
          when(col("ruleId") === 4000L, lit("parent"))
            .otherwise(lit("child")).as("stage"),
          col("group_key"), col("ts_ms"), col("agg_value"))
        .orderBy("stage", "group_key", "ts_ms")),

    // THE CONTINUOUS ECA FACE, oracle-checked (r18 verdict task #5):
    // the q185 fixture through the LIVE streaming engine over a real
    // transport — events as a micro-batch stream (engine.writer,
    // weekly batches in ascending order = the replay's exact feed),
    // the parent rule arriving over the line transport (attachLines,
    // the Kafka-face merge point) instead of a driver-side store
    // merge. Fired alerts emit as the replay's rows under the SAME
    // oracle as q185 — EcaLiveTransportSpec pinned this equality in
    // the unit suite; this row makes it driver-checked per round (the
    // q190/q191 replay-row device applied to the engine).
    "q212_eca_live" -> ((s, dir) => {
      import s.implicits._
      val ms = (unix_micros(col("ts").cast("timestamp")) / lit(1000))
        .cast("long")
      val base = events(s, dir)
        .withColumn("__ms", ms)
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"), col("__ms"))
            .orderBy(col("event_id"))))
        .filter(col("__rn") === 1)
        .withColumn("__wk", expr("__ms div 604800000"))
        .select(col("__wk"), col("user_id"), col("ts"), col("value"))
        .persist()
      // the harness feeds the engine from the driver (MemoryStream),
      // but per WEEK — one batch-sized collect per trigger instead of
      // a corpus-scale one (r19 verdict minor #3): the week slicing
      // pushes down to the persisted projection. The collect happens
      // INSIDE the feed loop (r20 verdict task #3), so peak driver
      // residency is ONE week's rows, not all ~52 weeks at once.
      val weeks = base.select("__wk").distinct()
        .as[Long].collect().sorted
      def weekBatch(w: Long): Seq[(Long, java.sql.Timestamp, Double)] =
        base.filter(col("__wk") === w)
          .select(col("user_id"), col("ts"), col("value"))
          .as[(Long, java.sql.Timestamp, Double)].collect().toSeq
      val engine = new graft.streaming.DynamicActiveEngine()
      val fired = scala.collection.mutable.ArrayBuffer
        .empty[graft.model.Alert]
      engine.onAlerts(as => fired.synchronized { fired ++= as; () })
      val ruleIn = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[String](s)
      // 0-ms triggers: the replay's ~52 weekly batches would otherwise
      // each pay up to 100 ms of trigger-tick dead wait (r19 finding)
      val ruleQ = graft.sources.RuleFileSource.attachLines(
        ruleIn.toDF(), engine.store,
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      // 32 input partitions: a bare MemoryStream plans each addData
      // block as ONE partition, so at 10× every weekly batch's fan-out
      // + persist materialized single-threaded inside the engine's
      // curMax agg — ProfileQ212 measured 60 s of the 70 s wall there
      // (12 s/trigger); the partitioned feed spreads it across the box
      val evIn = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp, Double)](s, 32)
      val q = engine.writer(
          evIn.toDF().toDF("user_id", "ts", "value"), "ts")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
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
        require(engine.store.size == 1,
          "q212: parent not merged over the transport")
        weeks.foreach { w =>
          evIn.addData(weekBatch(w): _*); q.processAllAvailable()
        }
      } finally { q.stop(); ruleQ.stop(); base.unpersist(); () }
      fired.synchronized(fired.toList).map { a =>
        (if (a.ruleId == 4000L) "parent" else "child",
          a.key, a.tsMillis, BigDecimal(a.aggregate).toDouble)
      }.toDF("stage", "group_key", "ts_ms", "agg_value")
        .orderBy("stage", "group_key", "ts_ms")
    }),

    // As-of join: for each purchase, the value of the user's latest click
    // at or before it — one union + running-window pass, no range explode
    // (oracle: DuckDB's native ASOF JOIN).
    "q34_asof_join" -> ((s, dir) => {
      val (purchases, clicks) = purchasesAndClicks(s, dir)
      graft.exec.Joins.asOf(purchases, clicks, "user_id", "tsm", "tsm", "cv")
        .filter(col("asof_value").isNotNull)
        .select("event_id", "asof_value")
        .orderBy("event_id")
    }),

    // Range (interval) join: clicks of the same user within ±30 min of a
    // purchase, aggregated per purchase — bucketed equi-join (3× fan-out
    // of the right side, never |L|·|R| per key).
    "q35_range_join" -> ((s, dir) => {
      val (purchases, clicks) = purchasesAndClicks(s, dir)
      aggDouble(graft.exec.Joins
        .rangeJoin(purchases, clicks, "user_id", "tsm", "tsm", 1800000L, Seq("cv"))
        .groupBy("event_id")
        .agg(count(lit(1)).as("n_near"),
          sum(col("__r_cv").cast(graft.compile.RuleCompiler.RuleDecimal))
            .cast(graft.compile.RuleCompiler.RuleDecimal).as("agg_value"))
        .orderBy("event_id"))
    }),

    // Z-order key: 16-bit user × 16-bit value-centi Morton interleave —
    // the multi-dimension data-skipping sort key, statically unrolled to
    // pure shift/mask arithmetic (codegen, exact, engine-reproducible).
    "q60_zorder_key" -> ((s, dir) => {
      val e = events(s, dir)
      e.select(col("event_id"),
          graft.exec.ZOrder.zValue(Seq(
            col("user_id").bitwiseAND(lit(65535L)),
            expr("CAST(floor(value * 100) AS BIGINT)").bitwiseAND(lit(65535L))),
            bits = 16).as("z"))
        .orderBy("event_id")
    }),

    // Warehouse face: pivot — weekly event-type activity matrix. Spark
    // pivots with an EXPLICIT value list (no extra distinct pass; plan
    // is one hash aggregate with conditional partials, map-side
    // combined — the at-scale form; an unlisted-values pivot adds a
    // driver-blocking distinct first).
    "q58_pivot_weekly" -> ((s, dir) => {
      val e = events(s, dir)
        .withColumn("week", expr("(unix_micros(ts) div 1000) div 604800000"))
      e.groupBy("week")
        .pivot("event_type", Seq("click", "purchase", "view", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("week")
    }),

    // Warehouse face: anti join — customers with no URGENT order.
    // Spark's left_anti is a broadcast/shuffled hash anti join, never a
    // correlated subquery per row.
    "q59_anti_join" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // 7-day trailing moving average of daily value totals per event
    // type: the raw stream first collapses to (type, day) partials —
    // event volume never reaches the window — then a RANGE frame over
    // day numbers averages the trailing week. Sums in exact decimal,
    // ONE double division per output row (micro-unit numerator over
    // day count) so both engines round identically.
    "q64_moving_average" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir)
        .groupBy(col("event_type"),
          expr("(unix_micros(ts) div 1000) div 86400000").as("day"))
        .agg(sum(col("value").cast("decimal(38,6)")).cast("decimal(38,6)")
          .as("day_sum"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rangeBetween(-6, 0)
      daily
        .withColumn("ma_num",
          sum((col("day_sum") * 1000000).cast("long")).over(w))
        .withColumn("ma_days", count(lit(1)).over(w))
        .select(col("event_type"), col("day"),
          col("day_sum").cast("double").as("day_sum"),
          (col("ma_num").cast("double") / col("ma_days") / 1e6).as("ma7"))
        .orderBy("event_type", "day")
    }),

    // First-order Markov transition matrix of user behavior: counts of
    // consecutive (from_type -> to_type) per user sequence, totally
    // ordered by (ts, event_id) so same-ms ties are deterministic.
    "q62_event_transitions" -> ((s, dir) => {
      val e = events(s, dir).withColumn("tsm", expr("unix_micros(ts) div 1000"))
      graft.exec.Cohort.transitions(e, "user_id", "tsm", "event_id", "event_type")
        .orderBy("from_type", "to_type")
    }),

    // Cohort retention: users bucketed by first-active week, counted in
    // every later week they return — distinct-first, so event volume
    // never reaches the wide aggregations.
    "q57_cohort_retention" -> ((s, dir) => {
      val e = events(s, dir).withColumn("tsm", expr("unix_micros(ts) div 1000"))
      graft.exec.Cohort.retention(e, "user_id", "tsm", periodMs = 604800000L)
        .orderBy("cohort", "offset")
    }),

    // Event funnel: purchases preceded by a click of the same user
    // within 1 h — one running range-window per user, no self-join.
    "q52_event_funnel" -> ((s, dir) => {
      val e = events(s, dir).withColumn("tsm", expr("unix_micros(ts) div 1000"))
      graft.exec.Funnel.conversions(e, "user_id", "tsm", "event_type",
          from = "click", to = "purchase", withinMs = 3600000L)
        .orderBy("user_id")
    }),

    // Bloom-pruned semi join: revenue of lineitems belonging to URGENT
    // orders. The broadcast Bloom filter over the urgent order keys drops
    // non-matching fact rows BEFORE the exchange (runtime-filter
    // pushdown); the left-semi join then removes false positives, so the
    // answer is exactly the plain semi join's.
    "q46_bloom_semi_join" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val urgent = table(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      graft.exec.Joins
        .bloomSemiJoin(li, urgent, "l_orderkey", "o_orderkey",
          expectedItems = 100000L)
        .groupBy("l_returnflag")
        .agg(
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(38,4)")).cast("decimal(38,4)").cast("double")
            .as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    }),

    // Salted skew join: lineitem ⋈ orders with the hot-key scatter (8
    // sub-keys per key, small side replicated 8×) — byte-identical to the
    // plain join, so the oracle is the plain join.
    "q48_salted_join" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val ords = table(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.exec.Joins.saltedJoin(li, ords, "l_orderkey", salt = 8,
          saltCols = Seq("l_linenumber", "l_partkey"))
        .groupBy("o_orderpriority")
        .agg(
          sum(col("l_quantity").cast("decimal(38,6)")).cast("decimal(38,6)")
            .cast("double").as("sum_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("o_orderpriority")
    })
  )

  /** The ECA two-stage SQL, shared by q185 (per-batch replay) and
    * q212 (the live engine over a real transport) — one definition so
    * the two faces' oracles can never drift. */
  private def ecaSpawnFireSql: String =
    s"""WITH e0 AS (SELECT *, epoch_us(ts)//1000 AS tsm FROM events),
          e1 AS (SELECT * FROM (
                   SELECT *, row_number() OVER
                     (PARTITION BY user_id, tsm ORDER BY event_id) rn FROM e0) t
                 WHERE rn = 1),
          e2 AS (SELECT *, tsm // 604800000 AS wk FROM e1),
          wkmax AS (SELECT wk, MAX(tsm) mx FROM e2 GROUP BY wk),
          wkcum AS (SELECT wk, MAX(mx) OVER (ORDER BY wk
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cmx
                    FROM wkmax),
          pw AS (SELECT user_id, (tsm // 86400000) * 86400000 AS wstart,
                   ${sumDec("value")} s
                 FROM e2 GROUP BY 1, 2),
          fw AS (SELECT p.user_id, p.wstart, CAST(p.s AS DOUBLE) agg_value,
                   MIN(w.wk) AS fire_wk
                 FROM pw p JOIN wkcum w ON w.cmx >= p.wstart + 86400000
                 WHERE p.s > 250
                 GROUP BY 1, 2, 3),
          smin AS (SELECT user_id, MIN(fire_wk) swk FROM fw GROUP BY 1),
          cf AS (SELECT c.user_id, c.tsm, ${sumDec("b.value")} s
                 FROM e2 c
                 JOIN smin m ON m.user_id = c.user_id AND c.wk > m.swk
                 JOIN e2 b ON b.user_id = c.user_id AND b.wk > m.swk
                   AND b.tsm >= c.tsm - 21600000 AND b.tsm <= c.tsm
                 GROUP BY 1, 2),
          eout AS (
            SELECT 'parent' AS stage,
                   '{user_id=' || user_id || '}' AS group_key,
                   wstart AS ts_ms, agg_value FROM fw
            UNION ALL
            SELECT 'child', '{user_id=' || user_id || '}', tsm,
                   CAST(s AS DOUBLE) FROM cf WHERE s > 50)
          SELECT stage, group_key, ts_ms, agg_value FROM eout
          ORDER BY stage, group_key, ts_ms"""

  protected def coreOracle: Map[String, String] = Map(
    "q01_filter_passthrough" ->
      """SELECT event_id, user_id, event_type, value FROM events
         WHERE event_type = 'purchase' AND value > 50 AND value <= 180
         ORDER BY event_id""",

    "q02_rule_sum_having" ->
      s"""SELECT user_id, ${sumDbl("value")} AS agg_value FROM events
          WHERE event_type = 'purchase' GROUP BY user_id
          HAVING ${sumDec("value")} > 500 ORDER BY user_id""",

    "q03_rule_avg" ->
      s"""WITH a AS (
            SELECT user_id,
                   SUM(CAST(CAST(value AS $DEC) * 1000000 AS BIGINT)) AS s,
                   COUNT(value) AS c
            FROM events GROUP BY user_id)
          SELECT user_id,
                 CAST(((2*s + c) // (2*c)) / 1000000.0 AS DOUBLE) AS agg_value
          FROM a ORDER BY user_id""",

    "q04_rule_min" ->
      s"""SELECT event_type, CAST(MIN(CAST(value AS $DEC)) AS DOUBLE) AS agg_value
          FROM events GROUP BY event_type ORDER BY event_type""",

    "q05_rule_max" ->
      s"""SELECT event_type, CAST(MAX(CAST(value AS $DEC)) AS DOUBLE) AS agg_value
          FROM events GROUP BY event_type ORDER BY event_type""",

    "q06_rule_count" ->
      s"""SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS agg_value
          FROM events GROUP BY event_type
          HAVING COUNT(*) >= 10 ORDER BY event_type""",

    "q07_window_tumbling" ->
      s"""SELECT event_type,
                 CAST(floor(epoch(ts)/86400) AS BIGINT)*86400 AS w_start,
                 ${sumDbl("value")} AS agg_value
          FROM events GROUP BY event_type, w_start
          ORDER BY event_type, w_start""",

    "q08_window_sliding" ->
      s"""SELECT event_type,
                 (CAST(floor(epoch(ts)/900) AS BIGINT) - k.k)*900 AS w_start,
                 ${sumDbl("value")} AS agg_value
          FROM events, range(4) k(k)
          GROUP BY event_type, w_start
          ORDER BY event_type, w_start""",

    "q09_rule_fanout" ->
      s"""SELECT * FROM (
            SELECT 1 AS rule_id,
                   '{user_id=' || CAST(user_id AS VARCHAR) || '}' AS group_key,
                   CAST(floor(epoch(ts)/86400) AS BIGINT)*86400 AS w_start,
                   ${sumDbl("value")} AS agg_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, w_start
          UNION ALL
            SELECT 2 AS rule_id,
                   '{event_type=' || event_type || '}' AS group_key,
                   CAST(floor(epoch(ts)/86400) AS BIGINT)*86400 AS w_start,
                   CAST(COUNT(*) AS DOUBLE) AS agg_value
            FROM events WHERE value > 100
            GROUP BY event_type, w_start
          UNION ALL
            SELECT 3 AS rule_id, '{}' AS group_key,
                   CAST(floor(epoch(ts)/604800) AS BIGINT)*604800 AS w_start,
                   CAST(MAX(CAST(value AS $DEC)) AS DOUBLE) AS agg_value
            FROM events GROUP BY w_start)
          ORDER BY rule_id, group_key, w_start""",

    "q10_per_event_sliding" ->
      s"""SELECT e.event_id, ${sumDbl("b.value")} AS agg_value
          FROM events e JOIN events b
            ON b.user_id = e.user_id
           AND epoch_us(b.ts) >= epoch_us(e.ts) - 21600000000
           AND epoch_us(b.ts) <= epoch_us(e.ts)
          WHERE e.value > 5 AND b.value > 5
          GROUP BY e.event_id ORDER BY e.event_id""",

    "q11_join_revenue" ->
      """SELECT p_brand,
                CAST(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,4)))
                     AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
                COUNT(*) AS cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",

    "q12_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

    "q26_rollup_revenue" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DECIMAL(38,6))
                     AS DOUBLE) AS sum_qty,
                COUNT(*) AS cnt
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "q65_cube_revenue" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DECIMAL(38,6))
                     AS DOUBLE) AS sum_qty,
                COUNT(*) AS cnt
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "q27_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT *, row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate DESC, o_orderkey) AS rnk
           FROM orders) t
         WHERE rnk = 1 ORDER BY o_custkey""",

    "q28_set_ops" ->
      """SELECT * FROM (
           SELECT event_type FROM (
             SELECT DISTINCT event_type FROM events WHERE value > 150
             EXCEPT
             SELECT DISTINCT event_type FROM events WHERE event_type = 'error')
           UNION
           SELECT DISTINCT event_type FROM events WHERE value > 199) u
         ORDER BY event_type""",

    // Gaps-and-islands replay of session_window: a session breaks only
    // when the gap is STRICTLY greater than 6 h (exactly-gap-apart events
    // merge in Spark — verified empirically); end = last event + gap.
    // All arithmetic on epoch_us longs so ns-vs-us truncation matches
    // the Spark side exactly.
    "q38_session_window" ->
      s"""WITH x AS (SELECT user_id, epoch_us(ts) tus, value FROM events),
          d AS (SELECT *, CASE WHEN tus - lag(tus) OVER
                  (PARTITION BY user_id ORDER BY tus) > 21600000000
                THEN 1 ELSE 0 END AS brk FROM x),
          g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY tus
                  ROWS UNBOUNDED PRECEDING) AS sess FROM d)
          SELECT user_id, MIN(tus) AS sess_start,
                 MAX(tus) + 21600000000 AS sess_end,
                 COUNT(*) AS n_events,
                 ${sumDbl("value")} AS sum_value
          FROM g GROUP BY user_id, sess
          ORDER BY user_id, sess_start""",

    "q13_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
                COUNT(*) AS cnt
         FROM events GROUP BY k ORDER BY k""",

    // W1 through the dynamic engine: one fired alert per surviving event,
    // aggregate = trailing 6 h SUM over the deduped (user_id, ms) space,
    // HAVING compared in exact decimal (engine: applyLimit on BigDecimal).
    "q30_dynamic_engine_replay" ->
      s"""WITH e0 AS (SELECT *, epoch_us(ts)//1000 AS tsm FROM events),
          e1 AS (SELECT * FROM (
                   SELECT *, row_number() OVER
                     (PARTITION BY user_id, tsm ORDER BY event_id) rn FROM e0) t
                 WHERE rn = 1),
          f AS (SELECT * FROM e1 WHERE value > 5),
          s AS (SELECT a.user_id, a.tsm, ${sumDec("b.value")} AS agg_dec
                FROM f a JOIN f b ON b.user_id = a.user_id
                  AND b.tsm >= a.tsm - 21600000 AND b.tsm <= a.tsm
                GROUP BY a.user_id, a.tsm)
          SELECT '{user_id=' || user_id || '}' AS group_key, tsm AS ts_ms,
                 CAST(agg_dec AS DOUBLE) AS agg_value
          FROM s WHERE agg_dec > 100 ORDER BY group_key, ts_ms""",

    // W2 through the dynamic engine: tumbling day windows, emitted once
    // their end passes the max seen event time (the engine's event-time
    // watermark); the trailing partial window is NOT emitted.
    "q31_dynamic_periodic_replay" ->
      s"""WITH e0 AS (SELECT *, epoch_us(ts)//1000 AS tsm FROM events),
          e1 AS (SELECT * FROM (
                   SELECT *, row_number() OVER
                     (PARTITION BY user_id, tsm ORDER BY event_id) rn FROM e0) t
                 WHERE rn = 1),
          m AS (SELECT max(tsm) mx FROM e1),
          w AS (SELECT event_type, (tsm // 86400000) * 86400000 AS ts_ms,
                  ${sumDbl("value")} AS agg_value
                FROM e1 GROUP BY event_type, ts_ms)
          SELECT '{event_type=' || event_type || '}' AS group_key, ts_ms, agg_value
          FROM w, m WHERE ts_ms + 86400000 <= m.mx
          ORDER BY group_key, ts_ms""",

    // The ECA two-stage oracle: stage 1 = parent daily windows with
    // their firing week (first weekly batch whose cumulative event-time
    // max passes the window end); stage 2 = each spawned child's
    // trailing-window evaluation over exactly the weeks after its
    // user's first parent firing. Engine tsMillis: window START for
    // periodic parents, event time for per-event children.
    "q185_eca_spawn_fire" -> ecaSpawnFireSql,

    // q212: the SAME oracle as q185 — the live engine over a real
    // transport must match the one-shot SQL replay exactly
    "q212_eca_live" -> ecaSpawnFireSql,

    // DuckDB's native ASOF JOIN is the oracle for the union+window as-of.
    "q34_asof_join" ->
      """WITH e0 AS (SELECT *, epoch_us(ts)//1000 tsm FROM events),
         p AS (SELECT event_id, user_id, tsm FROM e0 WHERE event_type = 'purchase'),
         c AS (SELECT user_id, tsm, MAX(value) cv FROM e0
               WHERE event_type = 'click' GROUP BY user_id, tsm)
         SELECT p.event_id, c.cv AS asof_value
         FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.tsm >= c.tsm
         ORDER BY event_id""",

    "q35_range_join" ->
      s"""WITH e0 AS (SELECT *, epoch_us(ts)//1000 tsm FROM events),
          p AS (SELECT event_id, user_id, tsm FROM e0 WHERE event_type = 'purchase'),
          c AS (SELECT user_id, tsm, MAX(value) cv FROM e0
                WHERE event_type = 'click' GROUP BY user_id, tsm)
          SELECT p.event_id, COUNT(*) AS n_near, ${sumDbl("c.cv")} AS agg_value
          FROM p JOIN c ON c.user_id = p.user_id
            AND c.tsm >= p.tsm - 1800000 AND c.tsm <= p.tsm + 1800000
          GROUP BY p.event_id ORDER BY event_id""",

    // The bloom filter is a pure pruning step (false positives removed by
    // the exact semi join), so the oracle is the plain semi join.
    "q46_bloom_semi_join" ->
      """SELECT l_returnflag,
                CAST(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,4)))
                     AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
                COUNT(*) AS cnt
         FROM lineitem
         WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                              WHERE o_orderpriority = '1-URGENT')
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q60_zorder_key" ->
      s"""WITH e AS (SELECT event_id,
             user_id & 65535 xu,
             CAST(floor(value * 100) AS BIGINT) & 65535 xv
           FROM events)
          SELECT event_id, ${duckZ(Seq("xu", "xv"), 16)} AS z
          FROM e ORDER BY event_id""",

    "q58_pivot_weekly" ->
      """SELECT (epoch_us(ts)//1000) // 604800000 AS week,
                CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                     AS BIGINT) AS click,
                CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                     AS BIGINT) AS purchase,
                CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                     AS BIGINT) AS "view",
                CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                     AS BIGINT) AS error
         FROM events GROUP BY week ORDER BY week""",

    "q59_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",

    // Daily decimal partials, then the same RANGE-over-days frame; the
    // average is micro-unit-numerator / day-count / 1e6 in that order.
    "q64_moving_average" ->
      """WITH d AS (SELECT event_type,
                      (epoch_us(ts)//1000) // 86400000 AS day,
                      CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,6))
                        day_sum
                    FROM events GROUP BY 1, 2),
          m AS (SELECT event_type, day, day_sum,
                  SUM(CAST(day_sum * 1000000 AS BIGINT)) OVER
                    (PARTITION BY event_type ORDER BY day
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) ma_num,
                  COUNT(*) OVER (PARTITION BY event_type ORDER BY day
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) ma_days
                FROM d)
          SELECT event_type, day, CAST(day_sum AS DOUBLE) AS day_sum,
                 CAST(ma_num AS DOUBLE) / ma_days / 1000000.0 AS ma7
          FROM m ORDER BY event_type, day""",

    "q62_event_transitions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts)//1000 tsm, event_id,
                      event_type FROM events),
          x AS (SELECT event_type from_type,
                  lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY tsm, event_id) to_type
                FROM e)
          SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM x WHERE to_type IS NOT NULL
          GROUP BY from_type, to_type ORDER BY from_type, to_type""",

    "q57_cohort_retention" ->
      """WITH a AS (SELECT DISTINCT user_id u,
                      (epoch_us(ts)//1000) // 604800000 p FROM events),
          c AS (SELECT u, MIN(p) p0 FROM a GROUP BY u)
          SELECT p0 * 604800000 AS cohort, p - p0 AS "offset",
                 CAST(COUNT(*) AS BIGINT) AS n_users
          FROM a JOIN c USING (u)
          GROUP BY 1, 2 ORDER BY cohort, "offset"""",

    // The same running range-window replayed; RANGE/CURRENT ROW peer
    // semantics (same-ms click counts) agree across engines.
    "q52_event_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(ts)//1000 tsm, event_type
                    FROM events),
          x AS (SELECT user_id, tsm, event_type,
                  max(CASE WHEN event_type = 'click' THEN tsm END) OVER
                    (PARTITION BY user_id ORDER BY tsm
                     RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
                    AS last_click
                FROM e)
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_to,
                 CAST(SUM(CASE WHEN last_click IS NOT NULL
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
          FROM x WHERE event_type = 'purchase'
          GROUP BY user_id ORDER BY user_id""",

    // Salting is result-invariant, so the oracle is the plain join.
    "q48_salted_join" ->
      """SELECT o_orderpriority,
                CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DECIMAL(38,6))
                     AS DOUBLE) AS sum_qty,
                COUNT(*) AS cnt
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority"""
  )

}
