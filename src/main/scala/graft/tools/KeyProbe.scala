package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: print the registry keys computed by the index phase in
  * this session vs the manifest in a store dir — pinpoints which key
  * PART drifts when a restore precedes the builds. */
object KeyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val store = if (args.length > 1) args(1) else "/tmp/graft_indexstore"
    val doRestore = args.contains("--restore")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (doRestore) {
      val n = graft.sources.IndexStore.restoreAll(spark, store)
      println(s"RESTORED $n")
    }
    // construct the builds (no counts — keys are computed at
    // construction time)
    graft.SparkEntry.indexBuildsProbe(spark, sfDir)
    val manifest = scala.io.Source.fromFile(s"$store/manifest")
      .getLines().filter(_.nonEmpty)
      .map(_.split("\t", 2)(1)).toSet
    val live = graft.util.CacheRegistry.entries.keySet
    println(s"MANIFEST ${manifest.size} LIVE ${live.size}")
    (live -- manifest).toSeq.sorted.take(6)
      .foreach(k => println(s"NEW  $k"))
    (manifest -- live).toSeq.sorted.take(6)
      .foreach(k => println(s"GONE $k"))
    spark.stop()
  }
}
