package graft.tools

import org.apache.spark.sql.SparkSession

/** Replicates the driver's t1 smoke: SparkEntry.entry rows > 0. */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows = $n")
    require(n > 0, "entry() must return rows")
    spark.stop()
  }
}
