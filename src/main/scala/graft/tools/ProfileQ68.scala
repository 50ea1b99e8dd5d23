package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-transition profile for q68 (noveltyStats) across the scale
  * decades: the 30× materialized probe measured a 21× time step from
  * 1× to 10× but only 1.45× from 10× to 30× (3× data). Hypothesis:
  * the per-gram df table is broadcast at 1× (cheap map-side join) and
  * flips to a shuffle join once it crosses the broadcast threshold —
  * a one-time plan transition, not a scaling slope. This dumps the
  * executed join strategy at each materialized scale so the ledger's
  * attribution is evidence, not inference.
  *
  * Usage: runMain graft.tools.ProfileQ68 [scaleDir ...] — defaults to
  * the probe outputs /tmp/graft_scale10/docs{1,10} and
  * /tmp/graft_scale30/docs30.
  */
object ProfileQ68 {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft_scale10/docs1", "/tmp/graft_scale10/docs10",
        "/tmp/graft_scale30/docs30")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { d =>
      val docs = spark.read.parquet(d)
      val q = graft.curation.Curation.noveltyStats(docs)
      // drive THIS plan instance to completion so AQE finalizes the
      // join strategy on the object we then stringify (a separate
      // write action would plan and adapt its own copy)
      val qe = q.queryExecution
      val t0 = System.nanoTime()
      qe.executedPlan.execute().foreachPartition(_ => ())
      val secs = (System.nanoTime() - t0) / 1e9
      val plan = qe.executedPlan.toString
      val strategy =
        if (plan.contains("BroadcastHashJoin")) "BroadcastHashJoin"
        else if (plan.contains("SortMergeJoin")) "SortMergeJoin"
        else if (plan.contains("ShuffledHashJoin")) "ShuffledHashJoin"
        else "other"
      println(f"$d%-28s rows=${docs.count()}%8d time=$secs%7.2fs join=$strategy")
    }
    spark.stop()
  }
}
