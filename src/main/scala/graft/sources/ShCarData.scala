package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S3/S6/P1/P4/F7: the Shanghai-taxi replay ingest, schema-fully.
  *
  * The reference hand-tokenizes 16 pipe-delimited columns, keeps indices
  * 0,9,10,11,12,13, injects a processing timestamp, drops known-dirty
  * dates, and parses event time as naive local time +8 h
  * (`source/CarDataFromFiles.java:24-69`, `source/CarDataParser.java:22-55`).
  * Here the same pipeline is a schema-ful CSV read plus Column
  * expressions — malformed rows drop via PERMISSIVE mode instead of
  * try/catch, and every step is visible to Catalyst (the projection
  * reaches the scan).
  */
object ShCarData {

  /** 16 raw pipe-delimited columns; only the 6 used ones get real names
    * (reference field mapping `CarDataFromFiles.java:42-59`). */
  val rawSchema: StructType = StructType(
    (0 until 16).map {
      case 0  => StructField("carId_raw", StringType)
      case 9  => StructField("eventTime_raw", StringType)
      case 10 => StructField("lon_raw", StringType)
      case 11 => StructField("lat_raw", StringType)
      case 12 => StructField("speed_raw", StringType)
      case 13 => StructField("angle_raw", StringType)
      case i  => StructField(s"c$i", StringType)
    })

  /** Dirty event-time strings dropped by the reference
    * (`CarDataFromFiles.java:47-49`). */
  val DirtyDates: Seq[String] = Seq("2010-01-01", "2016-08-01", "2016-08-02")

  /** The engine-side event schema (FIXTURES A1). */
  def parse(raw: DataFrame): DataFrame =
    raw
      .filter(!col("eventTime_raw").isin(DirtyDates: _*))
      .select(
        col("carId_raw").cast(IntegerType).as("carId"),
        // naive local-time strings are Asia/Shanghai: parse then shift to
        // UTC explicitly (the reference bakes +8h into parsing,
        // `CarDataParser.java:36-38`; we run sessions in UTC)
        (to_timestamp(col("eventTime_raw"), "yyyy-MM-dd HH:mm:ss")
          - expr("INTERVAL 8 HOURS")).as("eventTime"),
        current_timestamp().as("processTime"),
        col("lat_raw").cast(DoubleType).as("lat"),
        col("lon_raw").cast(DoubleType).as("lon"),
        col("angle_raw").cast(DoubleType).as("angle"),
        col("speed_raw").cast(DoubleType).as("speed"))
      .filter(col("carId").isNotNull && col("eventTime").isNotNull)

  /** Batch read of pipe-delimited replay files. */
  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.schema(rawSchema)
      .option("sep", "|").option("mode", "PERMISSIVE").csv(path))

  /** Streaming read — the replay source. Rate-limit with
    * `maxFilesPerTrigger` (the reference throttles 13,000 rows/s by
    * sleeping in the source thread, `CarDataFromFiles.java:63-68`). */
  def readStream(spark: SparkSession, path: String, maxFilesPerTrigger: Int = 1): DataFrame =
    parse(spark.readStream.schema(rawSchema)
      .option("sep", "|").option("maxFilesPerTrigger", maxFilesPerTrigger).csv(path))
}
