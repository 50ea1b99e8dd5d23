package graft

import org.apache.spark.sql.functions._
import graft.exec.Layout

/** Layout planners: bin packing invariants and skew-plan arithmetic. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("compactionBins packs contiguously, never splits, append-stable") {
    val items = Seq(
      ("s", 1L, 7L), ("s", 2L, 7L), ("s", 3L, 7L), ("s", 4L, 7L),
      ("s", 5L, 20L), ("t", 1L, 1L))
      .toDF("source", "doc_id", "sz")
    val got = Layout.compactionBins(items, "source", "doc_id", "sz", 10L)
      .orderBy("source", "bin")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // s: cums 7,14,21,28,48 → bins (cum-sz)//10 = 0,0,1,2,2
    assert(got == Seq(
      ("s", 0L, 2L, 14L, 1L, 2L),
      ("s", 1L, 1L, 7L, 3L, 3L),
      ("s", 2L, 2L, 27L, 4L, 5L),
      ("t", 0L, 1L, 1L, 1L, 1L)), got.toString)
    // append-stability: a new item never re-bins earlier ones
    val grown = Layout.compactionBins(
        items.unionByName(Seq(("s", 6L, 3L)).toDF("source", "doc_id", "sz")),
        "source", "doc_id", "sz", 10L)
      .filter(col("last_id") < 6 || col("source") === "t")
      .orderBy("source", "bin")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(grown.filter(r => !(r._1 == "s" && r._2 == 2L)) ==
      got.filter(r => !(r._1 == "s" && r._2 == 2L)), grown.toString)
  }

  test("skewPlan flags exactly the over-budget keys with ceil salt") {
    val df = (Seq.fill(25)("hot") ++ Seq.fill(10)("warm") ++
      Seq.fill(3)("cold")).toDF("k")
    val got = Layout.skewPlan(df, col("k"), target = 10L)
      .orderBy("key")
      .as[(String, Long, Long, Long)].collect().toSeq
    // hot: ceil(25/10)=3, share 25/38 → 657894 ppm; warm/cold salt 1 → dropped
    assert(got == Seq(("hot", 25L, 3L, 25L * 1000000L / 38L)), got.toString)
  }
}
