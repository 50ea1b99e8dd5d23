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

  test("duplicate order keys get per-row cumsums (ROWS frame), not peer totals") {
    // two items share orderCol=1: under the default RANGE frame both
    // would read cum=16 and land in bin 1, splitting no-man's bin 0;
    // the ROWS frame packs them first-fit (ADVICE-r15)
    val items = Seq(("s", 1L, 7L), ("s", 1L, 9L), ("s", 2L, 4L))
      .toDF("source", "doc_id", "sz")
    val got = Layout.compactionBins(items, "source", "doc_id", "sz", 10L)
      .orderBy("source", "bin")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // cums (tie by sz: 7 then 9): 7,16,20 → bins 0,0,1
    assert(got == Seq(("s", 0L, 2L, 16L, 1L, 1L),
      ("s", 1L, 1L, 4L, 2L, 2L)), got.toString)
  }

  test("applyCompaction writes exactly one file per planned bin, rows intact") {
    val items = Seq(
      ("s", 1L, 7L, "a"), ("s", 2L, 7L, "b"), ("s", 3L, 7L, "c"),
      ("s", 4L, 7L, "d"), ("s", 5L, 20L, "e"), ("t", 1L, 1L, "f"))
      .toDF("source", "doc_id", "sz", "payload")
    val out = java.nio.file.Files
      .createTempDirectory("graft_compact").toString
    val plan = Layout.applyCompaction(items, "source", "doc_id", "sz",
        10L, out)
      .orderBy("source", "bin")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // file inventory == plan, bin for bin: one parquet file per
    // (source, bin) directory
    val binDirs = plan.map { case (s0, b, _, _, _, _) =>
      (s0, b, java.nio.file.Paths.get(out, s"source=$s0", s"bin=$b")) }
    binDirs.foreach { case (s0, b, p) =>
      assert(java.nio.file.Files.isDirectory(p), s"missing bin dir $p")
      val files = java.nio.file.Files.list(p).toArray.map(_.toString)
        .filter(_.endsWith(".parquet"))
      assert(files.length == 1,
        s"bin ($s0,$b): expected 1 file, got ${files.length}")
    }
    val nDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
      .toArray.map(_.toString).count(_.contains("bin="))
    // no EXTRA bin dirs beyond the plan (count includes files inside)
    assert(binDirs.map(_._3.toString).forall(d =>
      java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d))))
    // read-back: every row lands in its planned bin, payloads intact
    val back = spark.read.parquet(out)
    val perBin = back.groupBy("source", "bin")
      .agg(count(lit(1)).as("n"), sum(col("sz")).as("szsum"))
      .orderBy("source", "bin")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(perBin == plan.map(p => (p._1, p._2, p._3, p._4)),
      s"read-back $perBin vs plan $plan")
    assert(back.select("payload").as[String].collect().sorted.toSeq ==
      Seq("a", "b", "c", "d", "e", "f"))
    assert(nDirs > 0)
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
