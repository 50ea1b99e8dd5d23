package graft

import graft.sources.Synthetic
import org.apache.spark.sql.streaming.Trigger

/** S4/S5: the rate-source generators stream real rows with the declared
  * shapes and deterministic value ranges. */
class SyntheticSourceSpec extends SparkSpec {
  import spark.implicits._

  test("carRides streams SHCarRide-shaped rows in range") {
    val q = Synthetic.carRides(spark, rowsPerSecond = 500)
      .writeStream.format("memory").queryName("synth_cars")
      .trigger(Trigger.ProcessingTime("250 milliseconds")).start()
    try {
      var n = 0L
      val deadline = System.currentTimeMillis() + 20000
      while (n < 10 && System.currentTimeMillis() < deadline) {
        Thread.sleep(300); n = spark.table("synth_cars").count()
      }
      assert(n >= 10, "rate source produced rows")
      val bad = spark.table("synth_cars").filter(
        !($"carId".between(1000, 1019) && $"speed".between(0, 150) &&
          $"lat".between(31.15, 31.30) && $"lon".between(121.4, 121.6))).count()
      assert(bad == 0)
    } finally q.stop()
  }

  test("taxiRides emits START/END pairs with bounded disorder") {
    val q = Synthetic.taxiRides(spark, rowsPerSecond = 500)
      .writeStream.format("memory").queryName("synth_taxi")
      .trigger(Trigger.ProcessingTime("250 milliseconds")).start()
    try {
      var n = 0L
      val deadline = System.currentTimeMillis() + 20000
      while (n < 20 && System.currentTimeMillis() < deadline) {
        Thread.sleep(300); n = spark.table("synth_taxi").count()
      }
      assert(n >= 20)
      val rows = spark.table("synth_taxi")
        .select($"rideId", $"isStart").as[(Long, Boolean)].collect()
      // consecutive rate ids pair into (START, END) per ride id
      val byRide = rows.groupBy(_._1).filter(_._2.length == 2)
      assert(byRide.nonEmpty)
      assert(byRide.values.forall(_.map(_._2).toSet == Set(true, false)))
    } finally q.stop()
  }
}
