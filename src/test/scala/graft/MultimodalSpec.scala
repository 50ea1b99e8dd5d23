package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, deterministic stub decode, frame
  * explosion, partition preservation. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.syntheticMedia(
    Seq((1L, "hello world"), (2L, "abc"), (3L, "video payload"), (6L, "v2"))
      .toDF("id", "text"), "id", "text").cache()

  test("synthetic media matches the declared schema") {
    def shape(s: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
      s.fields.map(f => f.name -> f.dataType.simpleString).toSeq
    assert(shape(media.schema) == shape(Multimodal.mediaSchema))
    val kinds = media.select("media_id", "kind").as[(Long, String)].collect().toMap
    assert(kinds(3L) == "image" && kinds(1L) == "audio" && kinds(2L) == "video")
  }

  test("decode is deterministic and batch-shaped") {
    val a = Multimodal.decodeImages(media, 16).collect().sortBy(_.media_id)
    val b = Multimodal.decodeImages(media, 16).collect().sortBy(_.media_id)
    assert(a.map(_.features.toSeq).toSeq == b.map(_.features.toSeq).toSeq)
    assert(a.forall(_.features.length == 16))
    assert(a.forall(_.channels == 3))
    // different payloads → different features
    assert(a(0).features.toSeq != a(1).features.toSeq)
  }

  test("resize changes geometry and derivation but stays deterministic") {
    val r1 = Multimodal.resize(media, 224, 224, 8).collect().sortBy(_.media_id)
    val r2 = Multimodal.resize(media, 224, 224, 8).collect().sortBy(_.media_id)
    assert(r1.map(_.features.toSeq).toSeq == r2.map(_.features.toSeq).toSeq)
    assert(r1.forall(d => d.width == 224 && d.height == 224))
    val orig = Multimodal.decodeImages(media, 8).collect().sortBy(_.media_id)
    assert(r1(0).features.toSeq != orig(0).features.toSeq)
  }

  test("frame sampling explodes only videos, every stride-th frame") {
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    // videos: ids ≡ 2 mod 3 → 2L (n_frames=3) and... id 2: n_frames = 2%300+1 = 3 → frames 0,2
    val byId = frames.groupBy(_.media_id).view.mapValues(_.map(_.frame_idx).sorted).toMap
    assert(byId.keySet == Set(2L))
    assert(byId(2L).toSeq == Seq(0, 2))
    // frame payloads carry the frame tag (stub slice semantics)
    assert(frames.forall(f => new String(f.payload).endsWith("#" + f.frame_idx)))
  }

  test("decode preserves input partitioning (no shuffle introduced)") {
    val parted = media.repartition(3)
    val decoded = Multimodal.decodeImages(parted, 4)
    assert(decoded.rdd.getNumPartitions == 3)
  }

  test("audio decode explodes only audio clips into per-window feature rows") {
    val win = Multimodal.decodeAudio(media, featureDim = 5).collect()
    // audio: ids ≡ 1 mod 3 → 1L, n_frames = 1%300+1 = 2 → windows 0,1
    val byId = win.groupBy(_.media_id).view
      .mapValues(_.map(_.window_idx).sorted).toMap
    assert(byId.keySet == Set(1L))
    assert(byId(1L).toSeq == Seq(0, 1))
    assert(win.forall(w => w.sample_rate == 16000 && w.features.length == 5))
    // window salt differentiates features; decode is deterministic
    val w0 = win.find(_.window_idx == 0).get.features.toSeq
    val w1 = win.find(_.window_idx == 1).get.features.toSeq
    assert(w0 != w1)
    val again = Multimodal.decodeAudio(media, featureDim = 5).collect()
    assert(again.sortBy(_.window_idx).map(_.features.toSeq).toSeq ==
      win.sortBy(_.window_idx).map(_.features.toSeq).toSeq)
  }
}
