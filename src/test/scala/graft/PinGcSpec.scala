package graft

import graft.similarity.Similarity
import graft.sources.IndexStore
import graft.util.CacheRegistry
import org.apache.spark.sql.functions._

/** Pin/release retention (the r17 verdict's GC ask): each rotation
  * persists a new "sem-split-pin" instance, so a long-lived corpus
  * accumulates one pin per release in the registry AND the IndexStore
  * manifest. [[Similarity.gcReleasePins]] keeps the last N releases
  * and drops the rest — safe because each rotation copies its
  * consulted pin's verdicts verbatim for its members (transitivity),
  * so the newest pin subsumes every earlier one. */
class PinGcSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = graft.sources.Tables.load(spark, dir, "embeddings")

  test("GC of intermediate pins: splits survive a cold restore; pin0 members keep their released side") {
    val store = java.nio.file.Files.createTempDirectory("graft-pin-gc").toString
    CacheRegistry.releaseAll()
    // release chain: pin0 (unnamed, l0) -> rel1 (g1) -> rel2 (full)
    val l0 = emb.filter(!pmod(col("vec_id"), lit(10L)).isin(3L, 7L))
    val g1 = emb.filter(pmod(col("vec_id"), lit(10L)) =!= 7)
    val pin0 = Similarity.pinnedSemanticSplit(l0, trainPct = 80)
    val pin0Rows = pin0.as[(Long, String)].collect().toMap
    val pin1 = Similarity.rotatePinnedSplit(g1, pin0, trainPct = 80,
      releaseId = "rel1")
    val pin2 = Similarity.rotatePinnedSplit(emb, pin1, trainPct = 80,
      releaseId = "rel2")
    val pin2Rows = pin2.orderBy("vec_id").as[(Long, String)].collect().toSeq
    assert(IndexStore.saveAll(store) >= 3, "expected all three pins staged")
    val pinKeys = CacheRegistry.entries.keySet
      .filter(_.startsWith("sem-split-pin:"))
    assert(pinKeys.size == 3, s"expected 3 live pins, got $pinKeys")

    // GC: keep only the serving release
    val released = Similarity.gcReleasePins(Set("rel2"), Some(store))
    assert(released == 2, s"expected pin0 + rel1 released, got $released")
    assert(CacheRegistry.entries.keySet
        .filter(_.startsWith("sem-split-pin:")).size == 1)
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$store/manifest")), "UTF-8")
    assert(manifest.contains(":rel2:"), "kept pin missing from manifest")
    assert(!manifest.contains(":rel1:"), "dropped pin still in manifest")

    // cold session: restore serves ONLY the kept pin, and the splits
    // are byte-identical to the pre-GC rotation
    CacheRegistry.releaseAll()
    assert(IndexStore.restoreAll(spark, store) >= 1)
    val restoredKey = CacheRegistry.entries.keySet
      .find(k => k.startsWith("sem-split-pin:") && k.contains(":rel2:"))
    assert(restoredKey.nonEmpty, "kept pin did not restore")
    val restored = CacheRegistry.entries(restoredKey.get)
      .orderBy("vec_id").as[(Long, String)].collect().toSeq
    assert(restored == pin2Rows, "restored pin diverges from pre-GC rotation")

    // TRANSITIVITY through the GC: every doc released under pin0 keeps
    // its side in the one surviving pin — dropping the intermediates
    // lost nothing
    val survivor = restored.toMap
    pin0Rows.foreach { case (id, split) =>
      assert(survivor.get(id).contains(split),
        s"doc $id lost its pin0 side through GC: $split -> ${survivor.get(id)}")
    }
    CacheRegistry.releaseAll()
  }

  test("GC before the kept pin is materialized: selfContain cuts the victim-file dependency") {
    // the daily-restart hazard (review finding): the consulted pin is a
    // RESTORED parquet read; the rotation is registered lazily and
    // still SCANS the consulted pin's staged file — GC must stage the
    // kept pin to its own file before deleting the victim's, or the
    // kept release bricks on first use
    val store = java.nio.file.Files.createTempDirectory("graft-pin-gc2").toString
    CacheRegistry.releaseAll()
    val l0 = emb.filter(!pmod(col("vec_id"), lit(10L)).isin(3L, 7L))
    Similarity.pinnedSemanticSplit(l0, trainPct = 80)
    assert(IndexStore.saveAll(store) >= 1)
    // "session 2": the consulted pin is store-backed
    CacheRegistry.releaseAll()
    assert(IndexStore.restoreAll(spark, store) >= 1)
    val pin0Key = CacheRegistry.entries.keySet
      .find(_.startsWith("sem-split-pin:")).get
    val pin0 = CacheRegistry.entries(pin0Key)
    // rotate — registered LAZY; its plan scans pin0's staged parquet
    Similarity.rotatePinnedSplit(emb, pin0, trainPct = 80,
      releaseId = "relA")
    // GC keeping relA WITHOUT materializing it first
    assert(Similarity.gcReleasePins(Set("relA"), Some(store)) == 1)
    val keptKey = CacheRegistry.entries.keySet
      .find(k => k.startsWith("sem-split-pin:") && k.contains(":relA:"))
    assert(keptKey.nonEmpty, "kept rotation lost from the registry")
    // the victim's file is gone; the kept pin must still serve
    val n = CacheRegistry.entries(keptKey.get).count()
    assert(n > 0, "kept pin unreadable after GC")
    // and survives a cold restore
    CacheRegistry.releaseAll()
    assert(IndexStore.restoreAll(spark, store) >= 1)
    val again = CacheRegistry.entries.keySet
      .find(k => k.startsWith("sem-split-pin:") && k.contains(":relA:"))
    assert(again.nonEmpty && CacheRegistry.entries(again.get).count() == n)
    CacheRegistry.releaseAll()
  }
}
