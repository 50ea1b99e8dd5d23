package graft

import graft.streaming.IngestGateStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Crash/restart recovery for the streaming gate faces (r18 verdict
  * task #4): the grown landed corpus lives in driver-local state
  * backed by in-JVM localCheckpoint RDDs, so the durable truth is
  * (stream checkpoint, mutation journal, IndexStore). This spec kills
  * a churn stream after ≥2 mutating generations (an absorb and a
  * retract both land before the cut), wipes every in-memory artifact
  * (the registry), restores the generation-0 kinds through the
  * IndexStore, folds the journal back with
  * [[IngestGateStream.replayJournal]], and resumes the stream over the
  * SAME source + checkpointLocation — the resumed triggers' verdicts
  * must equal the uninterrupted run's, including the two state-proving
  * probes: a re-upload of a pre-kill admit must flag
  * `exact_landed_dup` (the absorbed generation survived) and a re-add
  * of a pre-kill deleted body must NOT (the retraction survived). */
class IngestGateRecoverySpec extends SparkSpec {
  import spark.implicits._

  // q184's admitting fixture (the %5 fixture admits nothing at this
  // scale): landed = id%100 outside the batch residues, batches from
  // the {2,22,47,67} slice, keepBp = 5000
  private val dirA = "/root/testdata/sf0.01"
  private val res1 = Seq(2L, 22L, 47L, 67L)

  private def landedDocsA: DataFrame =
    graft.sources.Tables.load(spark, dirA, "documents")
      .filter(!pmod(col("doc_id"), lit(100L)).isin(res1: _*))
  private def landedEmbA: DataFrame =
    graft.sources.Tables.load(spark, dirA, "embeddings")
      .filter(!pmod(col("vec_id"), lit(100L)).isin(res1: _*))

  private val recSchema = StructType(Seq(
    StructField("op", StringType), StructField("doc_id", LongType),
    StructField("source", StringType), StructField("text", StringType),
    StructField("embedding", ArrayType(FloatType))))

  type Rec = (String, Long, String, String, Seq[Float])

  private def writeTrigger(srcDir: String, recs: Seq[Rec]): Unit =
    recs.toDF("op", "doc_id", "source", "text", "embedding")
      .coalesce(1).write.mode("append").parquet(srcDir)

  test("churn stream: kill after ≥2 mutating generations, IndexStore+journal replay + checkpoint resume ≡ uninterrupted run") {
    graft.util.CacheRegistry.releaseAll()
    val batch: Seq[Rec] = {
      val docs = graft.sources.Tables.load(spark, dirA, "documents")
        .filter(pmod(col("doc_id"), lit(100L)).isin(res1: _*))
        .select("doc_id", "source", "text")
        .as[(Long, String, String)].collect()
      val emb = graft.sources.Tables.load(spark, dirA, "embeddings")
        .filter(pmod(col("vec_id"), lit(100L)).isin(res1: _*))
        .select("vec_id", "embedding")
        .as[(Long, Seq[Float])].collect().toMap
      docs.toSeq.sortBy(_._1).map { case (id, src, text) =>
        ("add", id, src, text, emb.getOrElse(id, Seq.fill(64)(0f)))
      }
    }
    assert(batch.size >= 8, s"fixture too small: ${batch.size}")
    val byId = batch.map(r => r._2 -> r).toMap
    // a landed victim off every codebook stride (id ≡ 14 mod 100 ⇒
    // id%25 = 14, id%50 = 14)
    val victim = landedDocsA
      .filter(pmod(col("doc_id"), lit(100L)) === 14)
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().minBy(_._1)
    def freshIdOf(id: Long): Long = {
      var nid = id + 1000003L
      while (nid % 25L == 7L || nid % 25L == 8L || nid % 50L == 11L)
        nid += 1L
      nid
    }
    val q = batch.size / 4
    val t1 = batch.take(q)
    val t2 = batch.slice(q, 2 * q) :+
      (("delete", victim._1, "", "", Seq.empty[Float]): Rec)
    // t3's probes are built AFTER phase 1 reports its admits (they
    // re-upload an actual t1 admit); t4 = the rest
    val t4 = batch.drop(3 * q)

    def runPhase(srcDir: String, cpDir: String, jDir: String,
        landedD: DataFrame, landedE: DataFrame,
        triggers: Seq[Seq[Rec]]): Seq[Map[Long, String]] = {
      // the file source requires the directory to exist at attach time
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
      val records = spark.readStream.schema(recSchema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val perEpoch = scala.collection.mutable.Buffer.empty[Map[Long, String]]
      val qy = IngestGateStream.attachChurn(records, landedD, landedE,
        "src0", keepBp = 5000, checkpointDir = Some(cpDir),
        journalDir = Some(jDir)) { (_, v) =>
        perEpoch.synchronized {
          perEpoch += v.as[(Long, String)].collect().toMap
        }
        ()
      }
      try triggers.foreach { t =>
        writeTrigger(srcDir, t)
        qy.processAllAvailable()
      } finally qy.stop()
      perEpoch.toSeq
    }

    val tmp = java.nio.file.Files.createTempDirectory("gate-recovery")
      .toString
    // trigger-1 admits, discovered with one plain batch gate (equal to
    // the stream's t1 verdicts by the foreachBatch contract — asserted
    // against ctrl(0) below)
    val admitted1 = {
      val t1df = t1.toDF("op", "doc_id", "source", "text", "embedding")
      graft.dedup.Dedup.ingestGate(landedDocsA,
        t1df.select(col("doc_id"), col("source"), col("text")),
        landedEmbA,
        t1df.select(col("doc_id").as("vec_id"), col("embedding")),
        "src0", keepBp = 5000, memoizeEvidence = false)
        .filter(col("gate") === "admit")
        .select("doc_id").as[Long].collect().toSeq.sorted
    }
    assert(admitted1.nonEmpty, "fixture admitted nothing in trigger 1")
    // the state probes: re-upload of a t1 admit (fresh id, same body)
    // and a re-add of the deleted victim's body (fresh id)
    val reup = {
      val (_, _, s, t, e) = byId(admitted1.head)
      ("add", freshIdOf(admitted1.head), s, t, e): Rec
    }
    val readd = {
      val vEmb = landedEmbA.filter(col("vec_id") === victim._1)
        .select("embedding").as[Seq[Float]].collect()(0)
      ("add", freshIdOf(victim._1), victim._2, victim._3, vEmb): Rec
    }
    val t3 = (batch.slice(2 * q, 3 * q) :+ reup) :+ readd
    // ---- control: the uninterrupted run over all four triggers ----
    graft.util.CacheRegistry.releaseAll()
    val ctrl = runPhase(s"$tmp/srcA", s"$tmp/cpA", s"$tmp/jA",
      landedDocsA, landedEmbA, Seq(t1, t2, t3, t4))
    assert(ctrl.size == 4, s"control ran ${ctrl.size} triggers")
    assert(ctrl(0).collect { case (id, "admit") => id }.toSeq.sorted
      == admitted1, "stream t1 admits diverged from the batch gate")
    assert(ctrl(1).valuesIterator.contains("deleted"),
      "trigger 2 must ack the delete")
    assert(ctrl(2)(reup._2) == "exact_landed_dup",
      s"control: re-upload must flag, got ${ctrl(2)(reup._2)}")
    assert(ctrl(2)(readd._2) != "exact_landed_dup",
      s"control: deleted body must not flag, got ${ctrl(2)(readd._2)}")

    // ---- the recovered run: kill after t2, wipe, restore, resume ----
    graft.util.CacheRegistry.releaseAll()
    val rec12 = runPhase(s"$tmp/srcB", s"$tmp/cpB", s"$tmp/jB",
      landedDocsA, landedEmbA, Seq(t1, t2))
    assert(rec12(0) == ctrl(0) && rec12(1) == ctrl(1),
      "pre-kill triggers diverged from control")
    // ≥2 mutating generations landed: t1's absorb + t2's retract(+absorb)
    val jRows = spark.read.parquet(s"$tmp/jB")
    assert(jRows.select("epoch").distinct().count() >= 2,
      "journal must span ≥2 mutating triggers before the kill")
    // durable gen-0 kinds, then the driver "dies": every in-memory
    // artifact goes away (localCheckpoint RDDs die with the session in
    // a real crash; releasing the whole registry is the in-JVM
    // equivalent — nothing the resume path reads survives outside
    // checkpoint + journal + store)
    val saved = graft.sources.IndexStore.saveAll(s"$tmp/store")
    assert(saved > 0, "nothing saved to the IndexStore")
    graft.util.CacheRegistry.releaseAll()
    val restored = graft.sources.IndexStore.restoreAll(spark, s"$tmp/store")
    assert(restored > 0, "nothing restored from the IndexStore")
    // fold the journal over generation 0 → the reconstructed corpus
    val (recD, recE) = IngestGateStream.replayJournal(
      landedDocsA, landedEmbA, s"$tmp/jB", "src0", keepBp = 5000)
    // resume over the SAME source + checkpoint: only t3, t4 process
    val resumed = runPhase(s"$tmp/srcB", s"$tmp/cpB", s"$tmp/jB",
      recD, recE, Seq(t3, t4))
    assert(resumed.size == 2,
      s"resume re-ran committed triggers: ${resumed.size} epochs")
    assert(resumed(0) == ctrl(2),
      s"trigger-3 verdicts diverged after recovery: " +
        s"${resumed(0).toSeq.diff(ctrl(2).toSeq).take(5)}")
    assert(resumed(1) == ctrl(3),
      s"trigger-4 verdicts diverged after recovery: " +
        s"${resumed(1).toSeq.diff(ctrl(3).toSeq).take(5)}")
    // the two state probes, stated explicitly
    assert(resumed(0)(reup._2) == "exact_landed_dup",
      "recovered stream lost the absorbed generation: re-upload " +
        s"verdicted ${resumed(0)(reup._2)}")
    assert(resumed(0)(readd._2) != "exact_landed_dup",
      "recovered stream lost the retraction: deleted body verdicted " +
        s"${resumed(0)(readd._2)}")
    graft.util.CacheRegistry.releaseAll()
  }
}
