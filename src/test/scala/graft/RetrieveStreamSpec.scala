package graft

import org.apache.spark.sql.functions._
import graft.curation.Curation
import graft.util.CacheRegistry

/** The continuous-serving face (q198): explicit-query hybrid retrieval
  * and its streaming wiring. Load-bearing properties: (1) a query
  * whose (id, text, embedding) equal a corpus row's gets EXACTLY the
  * corpus-stride face's answer (the stream tokenizes request text with
  * the same tokenizer bm25-stats indexed with, so the rarest-term
  * selection cannot drift); (2) queries are independent — however the
  * trigger slices the stream, the union of per-trigger outputs equals
  * the one-shot batch serve (the property that lets q198 reuse q192's
  * oracle verbatim); (3) serving creates no per-trigger registry
  * entries — the landed kinds are reused trigger over trigger. */
class RetrieveStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.sources.Tables.load(spark, dir, "documents")
  private def emb = graft.sources.Tables.load(spark, dir, "embeddings")

  test("explicit-query face ≡ corpus-stride face for corpus-row queries") {
    CacheRegistry.releaseAll()
    val qd = docs.filter(pmod(col("doc_id"), lit(100L)) === 0)
      .select(col("doc_id").as("q_id"), col("text"))
    val qe = emb.filter(pmod(col("vec_id"), lit(100L)) === 0)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val got = Curation.hybridRrfTopKServedQueries(docs, emb, qd, qe)
      .orderBy("q_id", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val want = Curation.hybridRrfTopKServed(docs, emb)
      .orderBy("q_id", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty, "no fused rows")
    assert(got == want,
      s"explicit ≠ stride: ${got.diff(want).take(3)} / ${want.diff(got).take(3)}")
    CacheRegistry.releaseAll()
  }

  test("streaming replay: union over triggers ≡ one-shot; no per-trigger registry entries") {
    CacheRegistry.releaseAll()
    val d = docs
    val e = emb
    val qd = d.filter(pmod(col("doc_id"), lit(100L)) === 0)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val qe = e.filter(pmod(col("vec_id"), lit(100L)) === 0)
      .select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toMap
    val records = qd.toSeq.flatMap { case (id, text) =>
      qe.get(id).map(v => (id, text, v)) }
    assert(records.size >= 4, "fixture too small to slice")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Seq[Float])](spark)
    val stream = input.toDF().toDF("doc_id", "text", "embedding")
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    var sizeAfterFirst = -1
    val q = graft.streaming.RetrieveStream.attach(stream, d, e) { (_, v) =>
      val rows = v.select("q_id", "rnk", "doc_id", "rrf_e9")
        .as[(Long, Long, Long, Long)].collect()
      got.synchronized { got ++= rows }
      if (sizeAfterFirst < 0) sizeAfterFirst = CacheRegistry.size
      ()
    }
    try {
      records.groupBy(_._1 % 2).toSeq.sortBy(_._1).foreach { case (_, rs) =>
        input.addData(rs.sortBy(_._1))
        q.processAllAvailable()
      }
    } finally q.stop()
    // the landed kinds were created on the first trigger and REUSED on
    // the second — a per-trigger leak would grow the registry
    assert(CacheRegistry.size == sizeAfterFirst,
      s"per-trigger registry growth: $sizeAfterFirst -> ${CacheRegistry.size}")
    val oneShot = Curation.hybridRrfTopKServedQueries(d, e,
        d.filter(pmod(col("doc_id"), lit(100L)) === 0)
          .select(col("doc_id").as("q_id"), col("text")),
        e.filter(pmod(col("vec_id"), lit(100L)) === 0)
          .select(col("vec_id").as("q_id"), col("embedding")))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.toSeq.sorted == oneShot.sorted,
      "stream union ≠ one-shot batch serve")
    CacheRegistry.releaseAll()
  }
}
