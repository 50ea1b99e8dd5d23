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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) {
      case (d, StructField(n, LongType, _, _)) if NanosColumns(n) =>
        d.withColumn(n, timestamp_micros(expr(s"$n div 1000")))
      case (d, _) => d
    }
  }
}
