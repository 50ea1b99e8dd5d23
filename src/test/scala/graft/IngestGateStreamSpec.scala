package graft

import graft.streaming.IngestGateStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming face of the unified ingest gate: micro-batches gated
  * against the landed corpus, verdicts total per batch, and — the
  * landed-codebook contract — identical however the trigger slices
  * the stream. */
class IngestGateStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def landedDocs: DataFrame =
    graft.sources.Tables.load(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(5L)) =!= 2)
  private def landedEmb: DataFrame =
    graft.sources.Tables.load(spark, dir, "embeddings")
      .filter(pmod(col("vec_id"), lit(5L)) =!= 2)

  // the batch records: the %5==2 slice joined doc↔embedding, as an
  // ingest feed would deliver them
  private def batchRecords: Seq[(Long, String, String, Seq[Float])] = {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(5L)) === 2)
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      .filter(pmod(col("vec_id"), lit(5L)) === 2)
      .select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toMap
    docs.toSeq.map { case (id, src, text) =>
      (id, src, text, emb.getOrElse(id, Seq.fill(64)(0f)))
    }
  }

  private def runGate(slices: Seq[Seq[(Long, String, String, Seq[Float])]])
      : Map[Long, String] = {
    val input = MemoryStream[(Long, String, String, Seq[Float])](spark)
    val records = input.toDF()
      .toDF("doc_id", "source", "text", "embedding")
    val got = scala.collection.mutable.Map.empty[Long, String]
    val q = IngestGateStream.attach(records, landedDocs, landedEmb,
        "src0", full = true) { (_, verdicts) =>
      got ++= verdicts.as[(Long, String)].collect()
      ()
    }
    try {
      slices.foreach { s => input.addData(s); q.processAllAvailable() }
    } finally q.stop()
    got.toMap
  }

  test("gate verdicts total per batch; landed-evidence verdicts slice-invariant") {
    val recs = batchRecords
    assert(recs.nonEmpty)
    // one big batch vs two arbitrary slices of the same records
    val oneShot = runGate(Seq(recs))
    graft.util.CacheRegistry.releaseAll()
    val (a, b) = recs.splitAt(recs.size / 2)
    val sliced = runGate(Seq(a, b))
    assert(oneShot.keySet == recs.map(_._1).toSet, "one-shot not total")
    assert(sliced.keySet == oneShot.keySet, "sliced not total")
    val order = Seq("exact_landed_dup", "exact_batch_dup", "near_dup",
      "semantic_dup", "contained", "quality_fail", "ppl_cut",
      "not_selected", "admit")
    val idx = order.zipWithIndex.toMap
    assert(oneShot.values.toSet.subsetOf(order.toSet), oneShot.values.toSet)
    // The landed-codebook contract, stated precisely: every stage's
    // LANDED evidence is slicing-independent, while WITHIN-batch
    // evidence (the batch-dup side of exact/near/semantic) can only
    // shrink when a batch is split (a pair crossing the slice boundary
    // is lost; no new pair can appear). So a doc's verdict either
    // matches the one-shot run exactly, or moves to a strictly LATER
    // stage — never earlier, and never between two landed-evidence
    // stages.
    sliced.foreach { case (id, v) =>
      val os = oneShot(id)
      if (v != os) {
        assert(idx(v) > idx(os),
          s"doc $id moved EARLIER under slicing: $os -> $v")
        assert(Set("exact_batch_dup", "near_dup", "semantic_dup")(os),
          s"doc $id: landed-evidence verdict $os changed under slicing to $v")
      }
    }
  }
}
