package graft.tools

import graft.functions.GeoFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for the q24 UDF path (local iteration). */
object ProfileQ24 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = graft.sources.Tables.load(spark, dir, "events")
      .withColumn("lon", lit(-74.05) + col("value") / lit(1000.0))
      .withColumn("lat", lit(40.5) + col("value") / lit(500.0))
      .withColumn("lon2", lit(-74.05) + (col("user_id") % 30).cast("double") / lit(100.0))
      .withColumn("lat2", lit(40.5) + (col("user_id") % 20).cast("double") / lit(50.0))
      .select("event_id", "lon", "lat", "lon2", "lat2")
      .persist()
    e.count()

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val seqUdf = GeoFunctions.mapToGridCellsOnWayUdf

    for (_ <- 1 to 2) {
      time("udf size+first") {
        e.select(col("event_id"),
          seqUdf(col("lon"), col("lat"), col("lon2"), col("lat2")).as("cells"))
          .select(col("event_id"), size(col("cells")), col("cells").getItem(0))
          .write.format("noop").mode("overwrite").save()
      }
      time("expr size+first") {
        e.select(col("event_id"),
          GeoFunctions.mapToGridCellsOnWay(
            col("lon"), col("lat"), col("lon2"), col("lat2")).as("cells"))
          .select(col("event_id"), size(col("cells")), col("cells").getItem(0))
          .write.format("noop").mode("overwrite").save()
      }
      time("expr with orderBy (q24 shape)") {
        e.select(col("event_id"),
          GeoFunctions.mapToGridCellsOnWay(
            col("lon"), col("lat"), col("lon2"), col("lat2")).as("cells"))
          .select(col("event_id"), size(col("cells")).as("n"), col("cells").getItem(0).as("f"))
          .orderBy("event_id")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
