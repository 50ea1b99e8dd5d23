package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Parquet table loader for the engine's warehouse face.
  *
  * Spark 4 refuses parquet TIMESTAMP(NANOS) columns outright
  * (PARQUET_TYPE_ILLEGAL); the driver-generated `events.ts` column is
  * nanos. We read nanos as a raw long (legacy conf) and rebuild a proper
  * microsecond TimestampType column with integer arithmetic (`div 1000`,
  * truncation toward zero — same as DuckDB's `epoch_us` on the same data,
  * so oracle comparisons stay exact).
  */
object Tables {

  /** Columns that may arrive as parquet TIMESTAMP(NANOS). */
  private val NanosColumns = Set("ts")

  /** Write `df` hive-style partitioned by low-cardinality columns
    * (`path/col=value/…`). A predicate on a partition column then prunes
    * whole directories at planning time — the scan's `PartitionFilters`
    * — so a per-stratum query reads `|stratum| / |corpus|` of the bytes
    * instead of filtering after a full scan. The layout decision (which
    * columns, how many distinct values) is the caller's: thousands of
    * tiny partitions hurt (listing + small files) — partition on the
    * columns queries actually filter by (source, language, date), keep
    * high-cardinality keys in the data. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Write `df` as a parquet table bucketed (and sorted) on `bucketCol`.
    * Two tables bucketed the same way join WITHOUT any exchange — the
    * bucket layout IS the hash partitioning the join needs, persisted —
    * which turns every repeated fact⋈fact / fact⋈dim join on the bucket
    * key from a full shuffle of both sides into a local zip of bucket
    * files. The price is paid once at write (a shuffle into `buckets`
    * files per partition); the asserted-zero-exchange join is the payoff
    * every subsequent query collects. Registered in the session catalog
    * (`spark.table(name)`); bucket count should track data volume per
    * bucket (~128-512 MB each at scale), and both join sides must agree
    * on it. */
  def writeBucketed(df: DataFrame, name: String, bucketCol: String,
      buckets: Int, path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
    // explicit path → external table (data anchored there instead of the
    // session warehouse dir, which defaults to the process CWD)
    path.fold(w)(p => w.option("path", p)).saveAsTable(name)
  }

  /** Write `df` as JSON Lines — the interchange format training
    * pipelines actually emit and consume (one JSON object per line,
    * splittable, tool-agnostic). Parquet stays the warehouse format
    * (columnar pruning, stats); JSONL is the EXPORT face at the
    * pipeline boundary. One file per partition, no shuffle — at scale,
    * `repartition(n)` first to control output file count. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read JSON Lines with an EXPLICIT schema — never schema inference,
    * which costs a full extra pass over the data and silently widens
    * types (a driver-side sample deciding your longs are doubles is the
    * classic 100 TB ingest bug). Corrupt lines land in the default
    * PERMISSIVE null-row handling; count them against a threshold in a
    * real ingest. */
  def readJsonl(spark: SparkSession, path: String, schema: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** Ingest-robustness report over a JSONL drop: per-`srcCol` good-row
    * counts plus one `__malformed__` row counting lines the PERMISSIVE
    * parser rejected. This is the threshold a real 100 TB ingest gates
    * on — a feed whose malformed rate jumps is quarantined, not
    * crashed on (and not silently swallowed: the default null-row
    * behavior [[readJsonl]] documents is only safe if somebody counts).
    * The corrupt-record column exists only inside this aggregate; the
    * report is one scan + one tiny groupBy, the same cost as counting
    * by source. */
  def jsonlIngestStats(spark: SparkSession, path: String, schema: String,
      srcCol: String = "source"): DataFrame = {
    val df = spark.read
      .schema(schema + ", _corrupt STRING")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
    df.groupBy(
        when(col("_corrupt").isNotNull, lit("__malformed__"))
          .otherwise(col(srcCol)).as(srcCol))
      .agg(count(lit(1)).as("n_rows"))
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) {
      case (d, StructField(n, LongType, _, _)) if NanosColumns(n) =>
        d.withColumn(n, timestamp_micros(expr(s"$n div 1000")))
      // parquet TIMESTAMP(isAdjustedToUTC=false) arrives as
      // TimestampNTZType, on which the engine's integer-microsecond
      // clock (`unix_micros`) is a type error. The session timezone is
      // pinned to UTC everywhere in this engine, so casting NTZ →
      // TimestampType reinterprets the same wall-clock instant at the
      // same epoch micros DuckDB's epoch extraction yields on the same
      // file — timestamp semantics identical to data generations that
      // wrote adjusted-to-UTC micros.
      case (d, StructField(n, org.apache.spark.sql.types.TimestampNTZType, _, _)) =>
        d.withColumn(n, col(n).cast("timestamp"))
      case (d, _) => d
    }
  }
}
