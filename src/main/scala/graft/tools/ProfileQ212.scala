package graft.tools

import graft.SparkEntry
import graft.streaming.DynamicActiveEngine
import org.apache.spark.sql.SparkSession

/** q212 live-engine per-trigger-cost profiler (r19 verdict task #2):
  * the 10× reading was 87.7 s ≈ 17 s of q185-equivalent work + ~52
  * weekly triggers × ~1.3 s of per-micro-batch machinery. This runs
  * the q212 entry verbatim and splits the engine's per-batch bill via
  * [[DynamicActiveEngine]]'s phase counters:
  *
  *   fanout  — FanOut.auto plan construction (driver)
  *   maxAgg  — the curMax agg action (job 1 per trigger)
  *   plan    — alert-plan construction (driver, Catalyst un-analyzed)
  *   collect — collectFired (job 2 per trigger)
  *   tail    — newTail localCheckpoint (job 3 per trigger)
  *
  * plus the wall outside those (micro-batch machinery + feeder).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileQ212
  */
object ProfileQ212 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.useIdInClassName", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def jit: Long = Option(
      java.lang.management.ManagementFactory.getCompilationMXBean)
      .map(_.getTotalCompilationTime).getOrElse(0L)
    (1 to 3).foreach { i =>
      DynamicActiveEngine.resetMetrics()
      val t0 = System.nanoTime(); val j0 = jit
      SparkEntry.queries("q212_eca_live")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val inPhases = Seq(DynamicActiveEngine.fanoutNanos,
        DynamicActiveEngine.maxAggNanos, DynamicActiveEngine.planNanos,
        DynamicActiveEngine.collectNanos, DynamicActiveEngine.tailNanos)
        .map(_.get).sum / 1e9
      println(f"[q212] run$i wall=$wall%6.2f jit_ms=${jit - j0} " +
        DynamicActiveEngine.metricsString +
        f" other=${wall - inPhases}%6.2f")
    }
    spark.stop()
  }
}
