package graft

import graft.exec.BatchExec
import graft.rules.RuleCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared plumbing of the [[SparkEntry]] registry family: table
  * loaders, the rule-execution entry path, exact-decimal rendering,
  * the as-of/range fixture pair, scratch-dir cleanup, and the DuckDB
  * oracle fragments every family's SQL composes. Split out of the
  * monolithic SparkEntry at round 16 (mechanical, zero-semantics). */
trait EntryHelpers {


  protected def events(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.load(spark, dir, "events")
  protected def table(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(spark, dir, name)

  /** Run a rule given as JSON — the full reference entry path (JSON rule →
    * codec → compiled Columns → execution), minus the Kafka transport. */
  protected def rule(spark: SparkSession, dir: String, json: String): DataFrame =
    BatchExec.run(RuleCodec.decode(json), events(spark, dir), "ts")

  /** Render the engine's exact-decimal aggregate as DOUBLE for the driver
    * compare. Internal arithmetic stays DECIMAL (exact, order-independent);
    * only the final value is converted. Both Spark (BigDecimal.doubleValue)
    * and DuckDB (verified empirically) produce the correctly-rounded double,
    * so the bits match — whereas a decimal column reaches the driver as
    * Decimal('2006.000000') on the Spark side but float64 2006.0 through
    * DuckDB's pandas conversion, hash-mismatching on rendering alone
    * (CORRECTNESS_r01 q02–q11/q26). */
  protected def aggDouble(df: DataFrame): DataFrame =
    df.withColumn("agg_value", col("agg_value").cast("double"))


  /** (purchases, deduped clicks) with ms timestamps — the two time series
    * the as-of/range join queries relate. Click ties at one (user, ms)
    * collapse to MAX(value), the determinism precondition both engines'
    * as-of semantics require. */
  protected def purchasesAndClicks(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = events(s, dir).withColumn("tsm",
      (unix_micros(col("ts").cast("timestamp")) / lit(1000)).cast("long"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "tsm")
    val clicks = e.filter(col("event_type") === "click")
      .groupBy("user_id", "tsm").agg(max(col("value")).as("cv"))
    (purchases, clicks)
  }

  /** Shared harness for q30/q31: dedup events to one per (user_id, ms),
    * replay week by week through a fresh [[graft.streaming.DynamicActiveEngine]],
    * return fired alerts as (group_key, ts_ms, agg_value). */
  protected def dynamicReplay(s: SparkSession, dir: String, ruleJson: String): DataFrame =
    dynamicReplayRaw(s, dir, ruleJson)
      .select(col("group_key"), col("ts_ms"), col("agg_value"))
      .orderBy("group_key", "ts_ms")

  /** [[dynamicReplay]] keeping per-alert rule identity — (ruleId,
    * group_key, ts_ms, agg_value), unordered. The ECA face (q185)
    * needs ruleId to tell parent firings from spawned-child firings;
    * ECA-spawned children fire through the same replay because the
    * engine's deliver step runs [[graft.active.EcaLoop.processAlerts]]
    * after every batch. */
  protected def dynamicReplayRaw(s: SparkSession, dir: String, ruleJson: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val engine = new graft.streaming.DynamicActiveEngine()
    engine.store.merge(RuleCodec.decode(ruleJson))
    val fired = scala.collection.mutable.ArrayBuffer.empty[graft.model.Alert]
    engine.onAlerts(as => fired.synchronized { fired ++= as })

    val ms = (unix_micros(col("ts").cast("timestamp")) / lit(1000)).cast("long")
    val base = events(s, dir)
      .withColumn("__ms", ms)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("user_id"), col("__ms")).orderBy(col("event_id"))))
      .filter(col("__rn") === 1)
      .withColumn("__wk", expr("__ms div 604800000"))
      .drop("__rn")
      .persist()
    try {
      val weeks = base.select(col("__wk")).distinct()
        .collect().map(_.getLong(0)).sorted
      weeks.foreach { wk =>
        engine.processBatch(base.filter(col("__wk") === wk).drop("__ms", "__wk"), "ts")
      }
    } finally base.unpersist()

    import s.implicits._
    fired.synchronized(fired.toSeq).toDF()
      .select(col("ruleId"), col("key").as("group_key"),
        col("tsMillis").as("ts_ms"),
        col("aggregate").cast("double").as("agg_value"))
  }

  // ---------------------------------------------------------------------
  // Training-data pipeline surface: dedup, similarity search, text
  // analysis over documents/embeddings.
  // ---------------------------------------------------------------------


  // ---------------------------------------------------------------------
  // DuckDB oracles. Conventions for engine-agnostic exactness:
  //  * aggregate sums: per-value CAST to DECIMAL(38,6) then SUM (exact);
  //  * AVG: integer micro-units, (2s+n)//(2n) = ROUND_HALF_UP @ scale 6;
  //  * double arithmetic before a decimal cast is bit-identical IEEE;
  //  * window starts computed as integer epoch-seconds arithmetic.
  // ---------------------------------------------------------------------


  protected val DEC = "DECIMAL(38,6)"
  protected def sumDec(e: String) = s"CAST(SUM(CAST($e AS $DEC)) AS $DEC)"
  // Final rendering of an exact-decimal aggregate: correctly-rounded
  // DOUBLE (bit-identical Spark ↔ DuckDB; a DECIMAL output column is
  // not — see aggDouble above).
  protected def sumDbl(e: String) = s"CAST(${sumDec(e)} AS DOUBLE)"


  /** One JVM-exit hook PER scratch base deleting the session's
    * /tmp/graft_<appId> tree — the corrupted-JSONL fixtures are per-run
    * artifacts, not outputs (review finding: they were never cleaned
    * up). Keyed by base path, not a one-shot boolean: two sessions in
    * one JVM (Verify then Bench under one sbt run) get different
    * applicationIds and each needs its own hook (ADVICE r13). */
  protected val tmpCleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  protected def registerTmpCleanup(base: java.io.File): Unit =
    if (tmpCleanupRegistered.add(base.getAbsolutePath)) {
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(base)
      }
      ()
    }


  protected val tokCte =
    """toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') tk,
                       text FROM documents)"""
  protected val shingleCte =
    """sh AS (SELECT DISTINCT doc_id sid, shingle FROM (
         SELECT doc_id, unnest(list_transform(range(1, len(tk)-1),
                i -> array_to_string(tk[i:i+2], ' '))) shingle FROM toks))"""

  /** q19's MinHash-LSH candidate pairs (16 hashes, 4 bands) as a CTE chain
    * ending in `mhp(a_id, b_id)` — shared by q19 and q43 so the cluster
    * oracle closes over exactly the pair set the pair oracle checks.
    * Expects `sh(sid, shingle)` ([[shingleCte]]) in scope. */
  protected val minhashPairCte =
    """h AS (SELECT sid,
              ('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647 hh
            FROM sh),
       mh AS (SELECT sid, i.i AS i,
                MIN(((1 + (i.i * 1000003) % 2147483647) * hh +
                     (12345 + i.i * 999983) % 2147483647) % 2147483647) mh
              FROM h, range(16) i(i) GROUP BY sid, i.i),
       bk AS (SELECT sid, i // 4 AS band,
                string_agg(mh::VARCHAR, ':' ORDER BY i) bkey
              FROM mh GROUP BY sid, i // 4),
       mhp AS (SELECT DISTINCT a.sid a_id, b.sid b_id
               FROM bk a JOIN bk b ON a.band = b.band AND a.bkey = b.bkey
                                  AND a.sid < b.sid)"""

  /** The same statically-unrolled Morton interleave as ZOrder.zValue,
    * rendered as DuckDB shift/mask arithmetic. */
  protected def duckZ(xs: Seq[String], bits: Int): String =
    (for { i <- 0 until bits; (x, j) <- xs.zipWithIndex }
      yield s"((($x >> $i) & 1) << ${i * xs.size + j})").mkString(" + ")

  /** The 4-band × 8-bit sign-LSH table over `e(sid, v)` — band j's bucket
    * is the sign pattern of dims j*8+1..j*8+8, bit i worth 2^i, exactly
    * [[graft.functions.VectorFunctions.signBucket]] with offset j*8. */
  protected val duckBandedCte: String =
    (0 until 4).map { j =>
      val bucket = (0 until 8).map(i =>
        s"(CASE WHEN v[${j * 8 + i + 1}] > 0 THEN ${1L << i} ELSE 0 END)")
        .mkString(" + ")
      s"SELECT sid, $j AS band, $bucket AS bucket FROM e"
    }.mkString("\n                 UNION ALL ")


}
