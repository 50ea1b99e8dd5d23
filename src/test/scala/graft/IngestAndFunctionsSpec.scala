package graft

import graft.dedup.Dedup
import graft.functions.{GeoFunctions, TextFunctions}
import graft.sources.ShCarData
import org.apache.spark.sql.functions._

/** S3/S6/P1/P4/F7 ingest semantics + text/dedup/geo function sanity. */
class IngestAndFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("SHCarData parse: projection, dirty-date drop, +8h shift (S3/P4/F7)") {
    val lines = Seq(
      "00270|A|0|1|1|0|0|0|2016-08-01 13:00:00|2016-08-01 13:01:13|121.061075|31.401332|0.0|217.0|6|000",
      "00271|A|0|1|1|0|0|0|x|2010-01-01|121.0|31.0|10.0|20.0|6|000", // dirty
      "not|a|valid|row")
    val raw = spark.read.schema(ShCarData.rawSchema).option("sep", "|")
      .csv(lines.toDS())
    val parsed = ShCarData.parse(raw)
    val rows = parsed.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Int]("carId") == 270)
    // 2016-08-01 13:01:13 Asia/Shanghai = 05:01:13 UTC
    assert(r.getAs[java.sql.Timestamp]("eventTime").toInstant.toString
      == "2016-08-01T05:01:13Z")
    assert(math.abs(r.getAs[Double]("speed") - 0.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("angle") - 217.0) < 1e-9)
  }

  test("shingles: n-grams, short-text guard") {
    val df = Seq("a b c d", "a b").toDF("text")
    val got = df.select(TextFunctions.shingles($"text", 3).as("s"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq.empty)
  }

  test("hash60 is stable and matches the documented DuckDB formula") {
    val got = Seq("hello").toDF("s")
      .select(TextFunctions.hash60($"s")).as[Long].head()
    // ('0x'||substr(md5('hello'),1,15))::BIGINT == 419982666956583591
    assert(got == 419982666956583591L)
  }

  test("normalization collapses punctuation and case") {
    val got = Seq("Hello,   WORLD!!  1").toDF("t")
      .select(TextFunctions.normalized($"t")).as[String].head()
    assert(got == "hello world 1")
  }

  test("exact dedup groups identical normalized texts (dedup)") {
    val df = Seq((1L, "Hello World"), (2L, "hello, world!"), (3L, "other"))
      .toDF("doc_id", "text")
    val got = Dedup.exact(df).orderBy("keep_id")
      .select($"keep_id", $"dup_count").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("incremental dedup admits only fingerprints new to landed AND batch") {
    val landed = Seq((1L, "alpha text"), (2L, "beta text")).toDF("doc_id", "text")
    val incoming = Seq(
      (30L, "ALPHA  text!"),  // dup of landed 1 (normalized) → rejected
      (31L, "gamma text"),    // new → admitted
      (32L, "Gamma, TEXT"),   // within-batch dup of 31 → collapsed
      (33L, "delta text"))    // new → admitted
      .toDF("doc_id", "text")
    val got = Dedup.exactIncrement(landed, incoming)
      .select($"keep_id", $"batch_dups").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((31L, 2L), (33L, 1L)))
  }

  test("exactIncrementBloom ≡ exactIncrement on planted landed + batch dups") {
    // every admission path planted: landed dup, within-batch dup pair,
    // plain novel, and a landed dup that ALSO has a within-batch twin
    val landed = Seq((1L, "alpha text"), (2L, "beta text"), (3L, "beta TEXT"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (30L, "ALPHA  text!"),  // landed dup → rejected
      (31L, "gamma text"),    // novel → admitted
      (32L, "Gamma, TEXT"),   // within-batch dup of 31 → collapsed
      (33L, "delta text"),    // novel → admitted
      (34L, "beta text"),     // landed dup …
      (35L, "BETA text"))     // … with a batch twin — still rejected
      .toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"fp", $"keep_id", $"batch_dups")
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val exact = canon(Dedup.exactIncrement(landed, incoming))
    val bloom = canon(Dedup.exactIncrementBloom(landed, incoming))
    assert(bloom == exact, "Bloom gate changed the answer")
    assert(exact.map(t => (t._2, t._3)).toSet == Set((31L, 2L), (33L, 1L)))
    // an adversarially tiny filter (fpp → 1, every probe a maybe) only
    // moves rows to the verification join — answer still identical
    val tiny = canon(Dedup.exactIncrementBloom(landed, incoming,
      expectedItems = 1L, fpp = 0.5))
    assert(tiny == exact, "saturated Bloom filter changed the answer")
  }

  test("exactIncrementBloom: incoming scanned once; nulls dropped both sides") {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import org.apache.spark.sql.execution.LogicalRDD
    val landed = Seq((1L, Option("alpha text")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val incoming = Seq((10L, Option("alpha text")), (11L, Option("new text")),
      (12L, Option.empty[String])).toDF("doc_id", "text")
    val got = Dedup.exactIncrementBloom(landed, incoming)
    // the result plan reads ONLY materialized projections — the grouped
    // batch checkpoint (LogicalRDD, ×2 branches) + the registry-persisted
    // landed fps (InMemoryRelation) — so the raw incoming relation is
    // scanned exactly once, inside the checkpoint build, and
    // fingerprint() runs once per row (the r10 double-scan finding)
    val leaves = got.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.nonEmpty && leaves.forall(l =>
        l.isInstanceOf[InMemoryRelation] || l.isInstanceOf[LogicalRDD]),
      s"expected only materialized leaves, got:\n${got.queryExecution.optimizedPlan}")
    val rows = got.select($"keep_id", $"batch_dups").as[(Long, Long)]
      .collect().toSeq
    // null-text rows fingerprint to NULL and are excluded on both sides:
    // landed NULL must not poison the anti-join, incoming NULL not admitted
    assert(rows == Seq((11L, 1L)), s"got $rows")
    val exact = Dedup.exactIncrement(landed, incoming)
      .select($"keep_id", $"batch_dups").as[(Long, Long)].collect().toSeq
    assert(exact == rows, "null handling diverges between the two forms")
  }

  test("lineDedup keeps first occurrences in original order, drops repeats") {
    val doc = Seq(
      (1L, "nav bar\nreal content one\nnav bar\nreal content two\nnav bar"),
      (2L, "only line")).toDF("doc_id", "text")
    val got = Dedup.lineDedup(doc).orderBy("doc_id")
      .select($"doc_id", $"n_lines", $"n_kept", $"clean")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got(0) == ((1L, 5L, 3L, "nav bar\nreal content one\nreal content two")))
    assert(got(1) == ((2L, 1L, 1L, "only line")))
  }

  test("simhash of identical token multisets is identical; differs otherwise") {
    val df = Seq((1L, "x y z"), (2L, "z y x"), (3L, "p q r s t")).toDF("doc_id", "text")
    val got = Dedup.simHash(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == got(2L))
    assert(got(1L) != got(3L))
  }

  test("geo: grid cell round-trips through its center (F2/F4)") {
    val df = Seq((-73.9, 40.75)).toDF("lon", "lat")
    val cell = df.select(GeoFunctions.mapToGridCell($"lon", $"lat").as("c"))
    val c = cell.as[Int].head()
    val back = cell.select(
      GeoFunctions.gridCellCenterLon($"c").as("clon"),
      GeoFunctions.gridCellCenterLat($"c").as("clat"))
      .as[(Double, Double)].head()
    assert(math.abs(back._1 - -73.9) < GeoFunctions.DeltaLon)
    assert(math.abs(back._2 - 40.75) < GeoFunctions.DeltaLat)
    // and the center maps back to the same cell
    val c2 = df.select(GeoFunctions.mapToGridCell(lit(back._1), lit(back._2)))
      .as[Int].head()
    assert(c2 == c)
  }

  test("geo: isInNYC boundary semantics (F1)") {
    val df = Seq(
      (-73.9, 40.75, true), (-73.6, 40.75, false), (-73.9, 41.5, false))
      .toDF("lon", "lat", "want")
    val bad = df.filter(GeoFunctions.isInNYC($"lon", $"lat") =!= $"want").count()
    assert(bad == 0)
  }

  test("geo: cellsOnWay walk terminates, spans endpoints, stays short (F3)") {
    import GeoFunctions._
    def xi(lon: Double) = math.floor((math.abs(LonWest) - math.abs(lon)) / DeltaLon).toInt
    def yi(lat: Double) = math.floor((LatNorth - lat) / DeltaLat).toInt
    // a spread of segments: flat, vertical, steep up/down, reversed, and a
    // deterministic pseudo-random sample of the q24 coordinate space
    val segs = Seq(
      (-74.0, 40.6, -73.8, 40.6), (-73.9, 40.55, -73.9, 40.95),
      (-74.0, 40.95, -73.8, 40.55), (-73.8, 40.55, -74.0, 40.95),
      (-74.04, 40.51, -73.71, 40.99)) ++
      (0 until 200).map { i =>
        val r = new scala.util.Random(i)
        (-74.05 + r.nextDouble() * 0.2, 40.5 + r.nextDouble() * 0.4,
         -74.05 + r.nextDouble() * 0.3, 40.5 + r.nextDouble() * 0.4)
      }
    for ((lo1, la1, lo2, la2) <- segs) {
      val cells = cellsOnWay(lo1, la1, lo2, la2)
      val (xa, ya, xb, yb) = (xi(lo1), yi(la1), xi(lo2), yi(la2))
      val (sx, sy, ex, ey) =
        if (xa <= xb) (xa, ya, xb, yb) else (xb, yb, xa, ya)
      assert(cells.head == sx + sy * GridX)
      assert(cells.last == ex + ey * GridX)
      // the reference's dropped-else could take 100k steps; the fixed walk
      // is bounded by the Manhattan path length
      assert(cells.size <= math.abs(ex - sx) + math.abs(ey - sy) + 1,
        s"walk too long for ($lo1,$la1)->($lo2,$la2): ${cells.size}")
      // x never decreases along the walk
      val xs = cells.map(c => math.floorMod(c, GridX))
      assert(xs.zip(xs.tail).forall { case (a, b) => b >= a })
    }
  }
}
