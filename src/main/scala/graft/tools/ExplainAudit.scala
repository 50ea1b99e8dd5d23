// Scratch explain audit — run via: sbt "runMain graft.tools.ExplainAudit"
// (kept under tools/ so it is not part of the library surface)
package graft.tools

import org.apache.spark.sql.SparkSession

object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q01_filter_passthrough", "q11_join_revenue",
        "q10_per_event_sliding", "q18_dedup_ngram_jaccard",
        "q22_embed_neardup_lsh", "q29_ann_topk_lsh")
    for (q <- qs) {
      println(s"==== $q ====")
      graft.SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
