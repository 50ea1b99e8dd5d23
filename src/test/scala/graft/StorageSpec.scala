package graft

import graft.sources.Tables
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Storage-layout faces: hive-style partition pruning and bucketed
  * zero-exchange joins — asserted on the physical plan, not just row
  * equality, because the layout only earns its cost if the plan actually
  * changes shape. */
class StorageSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("writePartitioned: stratum predicate becomes a PartitionFilter, not a row filter") {
    val docs = (1L to 400L)
      .map(i => (i, s"text $i", Seq("web", "book", "code", "chat")((i % 4).toInt)))
      .toDF("doc_id", "text", "source")
    val path = tmpDir("graft_part")
    Tables.writePartitioned(docs, path, Seq("source"))

    val read = spark.read.parquet(path).filter(col("source") === "book")
    val scans = read.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    // the predicate lands in partitionFilters (directory pruning) …
    assert(scans.head.partitionFilters.exists(_.references.exists(_.name == "source")))
    // … and only the matching directory's files are selected
    assert(scans.head.relation.location.inputFiles.length >
      scans.head.selectedPartitions.totalNumberOfFiles)
    assert(read.count() == 100)
    assert(read.select("doc_id").as[Long].collect().forall(_ % 4 == 1))
  }

  test("writeBucketed: same-bucket join plans with ZERO exchanges") {
    val a = (1L to 300L).map(i => (i % 50, i)).toDF("k", "va")
    val b = (1L to 200L).map(i => (i % 50, i * 10)).toDF("k", "vb")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.writeBucketed(a, "bk_a", "k", buckets = 4)
      Tables.writeBucketed(b, "bk_b", "k", buckets = 4)
      val j = spark.table("bk_a").join(spark.table("bk_b"), "k")
      val rows = j.count()
      // plain join would produce 300*4 = 1200 rows (each k joins 6*4 pairs):
      // 50 keys x 6 a-rows x 4 b-rows
      assert(rows == 50L * 6 * 4)
      val planStr = j.queryExecution.executedPlan.toString
      assert(!planStr.contains("Exchange"),
        s"bucketed join still shuffles:\n$planStr")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bk_a")
      spark.sql("DROP TABLE IF EXISTS bk_b")
    }
  }

  test("JSONL round-trips rows; corrupt lines land as PERMISSIVE null rows") {
    val dir = tmpDir("graft-jsonl")
    Tables.writeJsonl(
      Seq((1L, "a", "t one"), (2L, "b", "t two")).toDF("doc_id", "source", "text"),
      dir)
    // a corrupt line dropped into the dataset by some other producer
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir, "part-corrupt.json"), "not json at all\n")
    val back = Tables.readJsonl(spark, dir,
      "doc_id LONG, source STRING, text STRING")
    assert(back.count() == 3)
    assert(back.filter(col("doc_id").isNull).count() == 1,
      "corrupt line surfaces as a countable null row, not a job failure")
    val ok = back.filter(col("doc_id").isNotNull).orderBy("doc_id")
      .as[(Long, String, String)].collect().toSeq
    assert(ok == Seq((1L, "a", "t one"), (2L, "b", "t two")))
  }

  test("jsonlIngestStats: malformed lines counted once, good rows attributed") {
    val dir = tmpDir("graft-jsonl-stats")
    Tables.writeJsonl(
      Seq((1L, "a", "t1"), (2L, "a", "t2"), (3L, "a", "t3"),
        (4L, "b", "t4"), (5L, "b", "t5")).toDF("doc_id", "source", "text"),
      dir)
    // two corrupt lines from a sloppy upstream producer: invalid JSON
    // and a truncated object — both must land in __malformed__, neither
    // may abort the scan or leak into a source's count
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir, "part-corrupt.json"),
      "not json at all\n{\"doc_id\": 9, \"source\": \"a\", \"tex\n")
    val got = Tables.jsonlIngestStats(spark, dir,
        "doc_id LONG, source STRING, text STRING")
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("__malformed__", 2L), ("a", 3L), ("b", 2L)), got.toString)
  }
}
