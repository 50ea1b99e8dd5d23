package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4/S5/F10: synthetic event generators, Spark-native.
  *
  * The reference's generators are source threads that sleep between
  * hand-built POJOs (`source/CarDataSource.java:14-50`,
  * `common/TaxiRideGenerator.java:22-61`); the Spark idiom is the `rate`
  * source (row id + timestamp at a configured rows/sec) with
  * *deterministic column expressions seeded by the row id* — the same
  * reproducibility contract as the reference's id-seeded generators
  * (`common/utils/DataGenerator.java:139-141`) without a custom source.
  */
object Synthetic {

  private def hash01(seed: org.apache.spark.sql.Column, salt: Int) =
    (abs(hash(seed, lit(salt))).cast("double") / lit(Int.MaxValue.toDouble))

  /** Car telemetry in the SHCarRide shape (carId, eventTime, processTime,
    * lat, lon, angle, speed) at `rowsPerSecond`. Deterministic per rate
    * row id. */
  def carRides(spark: SparkSession, rowsPerSecond: Int = 100, cars: Int = 20): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(
        (pmod(col("value"), lit(cars)) + 1000).cast("int").as("carId"),
        col("timestamp").as("eventTime"),
        current_timestamp().as("processTime"),
        (lit(31.15) + hash01(col("value"), 1) * lit(0.15)).as("lat"),
        (lit(121.4) + hash01(col("value"), 2) * lit(0.2)).as("lon"),
        (hash01(col("value"), 3) * lit(360.0)).as("angle"),
        (hash01(col("value"), 4) * lit(150.0)).as("speed"))

  /** NYC-taxi START/END event pairs with bounded disorder: each ride id
    * emits a START and, `delayRows` later, an END (the reference bounds
    * disorder with a PriorityQueue; here the bound is expressed directly
    * in event-time arithmetic, which watermarks then absorb). */
  def taxiRides(spark: SparkSession, rowsPerSecond: Int = 100,
      delayRows: Int = 5): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(
        (col("value") / 2).cast("long").as("rideId"),
        (pmod(col("value"), lit(2)) === 0).as("isStart"),
        when(pmod(col("value"), lit(2)) === 0, col("timestamp"))
          .otherwise(col("timestamp") - expr(s"INTERVAL ${delayRows} seconds"))
          .as("eventTime"),
        (lit(-74.05) + hash01(col("value"), 5) * lit(0.35)).as("startLon"),
        (lit(40.5) + hash01(col("value"), 6) * lit(0.5)).as("startLat"),
        (lit(-74.05) + hash01(col("value"), 7) * lit(0.35)).as("endLon"),
        (lit(40.5) + hash01(col("value"), 8) * lit(0.5)).as("endLat"),
        (pmod(col("value"), lit(4)) + 1).cast("short").as("passengerCnt"),
        (pmod(col("value"), lit(100)) + 2000).cast("long").as("taxiId"),
        (pmod(col("value"), lit(100)) + 3000).cast("long").as("driverId"))
}
