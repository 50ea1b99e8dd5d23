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

  test("ImageIOCodec decodes a real PNG through the decodeImages surface") {
    import java.awt.image.BufferedImage
    // two real PNGs encoded in-memory with the JDK, one corrupt payload
    def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
      val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    val red = png(4, 3)((_, _) => 0xff0000)            // solid red
    val grad = png(8, 1)((x, _) => x * 32 * 0x010101)  // left-dark gray ramp
    val rows = Seq(
      (10L, "image", red, (4, 3, 0, 1, "png")),
      (11L, "image", grad, (8, 1, 0, 1, "png")),
      (12L, "image", "not an image".getBytes("UTF-8"), (1, 1, 0, 1, "txt")))
    val df = rows.toDF("media_id", "kind", "payload", "m")
      .select(col("media_id"), col("kind"), col("payload"), struct(
        col("m._1").as("width"), col("m._2").as("height"),
        col("m._3").as("sample_rate"), col("m._4").as("n_frames"),
        col("m._5").as("format")).as("meta"))
    val out = Multimodal.decodeImages(df, 4, Multimodal.ImageIOCodec)
      .collect().sortBy(_.media_id)
    // corrupt payload dropped; geometry and channel count come from the
    // DECODED image, not the metadata
    assert(out.map(_.media_id).toSeq == Seq(10L, 11L))
    assert(out(0).width == 4 && out(0).height == 3 && out(0).channels == 3)
    // BT.601 integer luma of pure red = 255*299/1000 = 76
    assert(out(0).features.forall(f => math.abs(f - 76 / 255.0f) < 1e-6))
    // the gray ramp brightens left to right across the 4 buckets
    val g = out(1).features
    assert(out(1).width == 8 && g.length == 4 && g(0) < g(1) && g(1) < g(2) && g(2) < g(3))
    // and the oracle path is untouched: stub still decodes everything
    assert(Multimodal.decodeImages(df, 4).collect().length == 3)
  }

  test("JavaSoundCodec decodes real WAV PCM into sample-accurate windows") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // in-memory WAV writer: 16-bit signed little-endian PCM
    def wav(samples: Array[Short], rate: Float, channels: Int): Array[Byte] = {
      val data = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        data(2 * i) = (samples(i) & 0xff).toByte
        data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(rate, 16, channels, true, false)
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data),
        fmt, samples.length / channels)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // mono ramp: 1000 frames at 8 kHz; 50 ms windows → 400 frames/window
    // → windows of 400, 400, 200 (final partial emitted)
    val monoSamples = Array.tabulate[Short](1000)(i => ((i % 200 - 100) * 300).toShort)
    val mono = wav(monoSamples, 8000f, 1)
    // stereo: L/R averaged to mono; L = 12000, R = -4000 → mean 4000
    val stereoSamples = Array.tabulate[Short](160 * 2)(i =>
      if (i % 2 == 0) 12000.toShort else (-4000).toShort)
    val stereo = wav(stereoSamples, 16000f, 2)
    val rows = Seq(
      (20L, "audio", mono, (0, 0, 8000, 0, "wav")),
      (21L, "audio", stereo, (0, 0, 16000, 0, "wav")),
      (22L, "audio", "not a wav".getBytes("UTF-8"), (0, 0, 0, 0, "txt")))
    val df = rows.toDF("media_id", "kind", "payload", "m")
      .select(col("media_id"), col("kind"), col("payload"), struct(
        col("m._1").as("width"), col("m._2").as("height"),
        col("m._3").as("sample_rate"), col("m._4").as("n_frames"),
        col("m._5").as("format")).as("meta"))
    val out = Multimodal.decodeAudioPcm(df, windowMs = 50, featureDim = 4)
      .collect().sortBy(w => (w.media_id, w.window_idx))
    // corrupt payload dropped; window count and sample rate come from the
    // DECODED container, not the metadata
    val byId = out.groupBy(_.media_id)
    assert(byId.keySet == Set(20L, 21L))
    assert(byId(20L).map(_.window_idx).toSeq == Seq(0, 1, 2))
    assert(byId(20L).forall(_.sample_rate == 8000))
    // 16 kHz × 50 ms = 800 frames/window; the 160-frame clip is one
    // partial window
    assert(byId(21L).map(_.window_idx).toSeq == Seq(0))
    // sample accuracy: recompute the expected features with the same
    // bucketed mean-|amplitude| arithmetic from the known PCM values
    def expected(samples: Seq[Short], dim: Int): Seq[Float] = {
      val fl = samples.map(_ / 32768f)
      val sum = new Array[Float](dim); val cnt = new Array[Int](dim)
      val n = fl.length
      fl.zipWithIndex.foreach { case (v, i) =>
        val b = (i.toLong * dim / n).toInt
        sum(b) += math.abs(v); cnt(b) += 1
      }
      (0 until dim).map(j => if (cnt(j) > 0) sum(j) / cnt(j) else 0f)
    }
    val w2 = byId(20L).find(_.window_idx == 2).get // the 200-frame partial
    val exp2 = expected(monoSamples.slice(800, 1000).toSeq, 4)
    w2.features.toSeq.zip(exp2).foreach { case (a, e) =>
      assert(math.abs(a - e) < 1e-6f, s"partial-window feature $a vs $e") }
    val w0 = byId(20L).find(_.window_idx == 0).get
    val exp0 = expected(monoSamples.slice(0, 400).toSeq, 4)
    w0.features.toSeq.zip(exp0).foreach { case (a, e) =>
      assert(math.abs(a - e) < 1e-6f) }
    // stereo channel averaging: |mean(12000, -4000)| / 32768 everywhere
    val s0 = byId(21L).head
    assert(s0.features.forall(f => math.abs(f - 4000f / 32768f) < 1e-6f))
    // determinism: a second run reproduces the features bit-for-bit
    val again = Multimodal.decodeAudioPcm(df, windowMs = 50, featureDim = 4)
      .collect().sortBy(w => (w.media_id, w.window_idx))
    assert(again.map(_.features.toSeq).toSeq == out.map(_.features.toSeq).toSeq)
  }

  test("imageNearDup: hamming-2 pair merges, hamming-20 pair does not") {
    // Planted codec (payload byte selects the vector): ids 0 and 9
    // share the base pattern (high features at pos 0..29), id 3 flips
    // 2 bits of it, id 6 flips 20 — the pHash bits land exactly on the
    // high positions, so {0,3,9} must merge (hamming 0 and 2 ≤ 6,
    // 2 < bands=4 → pigeonhole-guaranteed candidates) and 6 must
    // survive alone (candidate via the empty bands, rejected at
    // hamming 20 by the exact verify).
    object PlantedCodec extends Multimodal.ImageCodec {
      def decode(payload: Array[Byte], meta: Multimodal.MediaMeta,
          dim: Int): Option[(Int, Int, Int, Array[Float])] = {
        val ks: Array[Int] = payload(0).toInt match {
          case 0 | 9 => Array.tabulate(60)(i => if (i < 30) 900 else 100)
          case 3 => Array.tabulate(60)(i =>
            if (i >= 2 && i < 30) 900 else 100)
          case _ => Array.tabulate(60)(i =>
            if (i >= 20 && i < 30) 900 else 100)
        }
        Some((1, 1, 3, ks.map(_ / 1000.0f)))
      }
    }
    val media = Seq(0L, 3L, 6L, 9L).map { id =>
      Multimodal.Media(id, "image", Array(id.toByte),
        Multimodal.MediaMeta(8, 8, 16000, 1, "stub"))
    }.toDF()
    val got = Multimodal.imageNearDup(media, codec = PlantedCodec)
      .orderBy("media_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, true), (3L, 0L, false), (6L, 6L, true), (9L, 0L, false)),
      got.toString)
  }

  test("imageNearDupIncrement: landed dup absorbs first; batch pairs keep min id") {
    // stub codec: only byte-identical payloads collide (hamming 0).
    // landed {0:"aaa", 3:"bbb"}; batch: 6 repeats "aaa" -> landed_dup;
    // 9 and 12 share "ccc" (fresh) -> {9 keep, 12 batch_dup}; 15 is
    // unique -> keep.
    def media(rows: Seq[(Long, String)]) = rows.map { case (id, s) =>
      Multimodal.Media(id, "image", s.getBytes("UTF-8"),
        Multimodal.MediaMeta(8, 8, 16000, 1, "stub"))
    }.toDF()
    val landed = media(Seq(0L -> "aaa", 3L -> "bbb"))
    val batch = media(Seq(6L -> "aaa", 9L -> "ccc", 12L -> "ccc",
      15L -> "unique"))
    val got = Multimodal.imageNearDupIncrement(landed, batch)
      .orderBy("media_id").as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (6L, "landed_dup"), (9L, "keep"), (12L, "batch_dup"),
      (15L, "keep")), got.toString)
    // batch-order independence: swapping which batch half arrives
    // cannot change the landed verdict — rerun with batch reversed
    val got2 = Multimodal.imageNearDupIncrement(landed,
        media(Seq(15L -> "unique", 12L -> "ccc", 9L -> "ccc",
          6L -> "aaa")))
      .orderBy("media_id").as[(Long, String)].collect().toSeq
    assert(got2 == got, got2.toString)
  }

  test("imageNearDupIncrement: non-image batch rows get no verdict row") {
    val landed = Seq(Multimodal.Media(0L, "image", "xx".getBytes,
      Multimodal.MediaMeta(8, 8, 16000, 1, "stub"))).toDF()
    val batch = Seq(
      Multimodal.Media(1L, "audio", "xx".getBytes,
        Multimodal.MediaMeta(8, 8, 16000, 1, "stub")),
      Multimodal.Media(2L, "image", "yy".getBytes,
        Multimodal.MediaMeta(8, 8, 16000, 1, "stub"))).toDF()
    val got = Multimodal.imageNearDupIncrement(landed, batch)
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "keep")), got.toString)
  }

  test("videoNearDup: shared-frame pairs with hand-checked Jaccard") {
    // ids ≡ 2 mod 3 are videos; n_frames = id+1, stride 2 samples:
    // id 2 → {0,2}, id 5 → {0,2,4}, id 11 → {0,2,...,10}; 2/5/11 share
    // footage ("t"), 8 is unrelated. Jaccard over nested frame sets:
    // (2,5) 2/3 ✓, (5,11) 3/6 = exactly the 0.5 threshold ✓ inclusive,
    // (2,11) 2/6 ✗ excluded.
    val vids = Multimodal.syntheticMedia(
      Seq((2L, "t"), (5L, "t"), (11L, "t"), (8L, "u"))
        .toDF("id", "text"), "id", "text")
    val got = Multimodal.videoNearDup(vids, stride = 2)
      .orderBy("a_id", "b_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (2L, 5L, 2L, 2L, 3L, 666666L),
      (5L, 11L, 3L, 3L, 6L, 500000L)), got.toString)
  }

  test("audioNearDup: window-fingerprint pairs over the audio kind only") {
    // ids ≡ 1 mod 3 are audio; 1="t" windows {0}, 4="t" {0,2,4} →
    // inter 1 of union 3; 10="u" unrelated; the video/image rows of
    // the same table must not leak in
    val media = Multimodal.syntheticMedia(
      Seq((1L, "t"), (4L, "t"), (10L, "u"), (2L, "t"))
        .toDF("id", "text"), "id", "text")
    val got = Multimodal.audioNearDup(media, stride = 2,
        minJaccardPpm = 300000)
      .orderBy("a_id", "b_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4L, 1L, 1L, 3L, 333333L)), got.toString)
  }

  test("audioNearDupIncrement: landed absorption, batch CC, keep") {
    val landed = Multimodal.syntheticMedia(
      Seq((1L, "t")).toDF("id", "text"), "id", "text")
    val batch = Multimodal.syntheticMedia(
      Seq((4L, "t"), (10L, "v"), (13L, "v"), (16L, "w"))
        .toDF("id", "text"), "id", "text")
    val got = Multimodal.audioNearDupIncrement(landed, batch,
        stride = 2, minJaccardPpm = 300000)
      .orderBy("media_id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (4L, "landed_dup"), (10L, "keep"),
      (13L, "batch_dup"), (16L, "keep")), got.toString)
  }

  test("videoNearDupIncrement: landed absorption, batch CC, keep") {
    // landed: 2="t" (frames {0,2}), 8="u"; batch: 5="t" → landed_dup
    // (2/3 = 666k), 11="v" and 14="v" → a batch pair (6/8 = 750k):
    // 11 is the representative, 14 batch_dup; 17="w" alone → keep
    val landed = Multimodal.syntheticMedia(
      Seq((2L, "t"), (8L, "u")).toDF("id", "text"), "id", "text")
    val batch = Multimodal.syntheticMedia(
      Seq((5L, "t"), (11L, "v"), (14L, "v"), (17L, "w"))
        .toDF("id", "text"), "id", "text")
    val got = Multimodal.videoNearDupIncrement(landed, batch, stride = 2)
      .orderBy("media_id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (5L, "landed_dup"), (11L, "keep"),
      (14L, "batch_dup"), (17L, "keep")), got.toString)
  }

  private def mediaDf(rows: Seq[(Long, String, Array[Byte], (Int, Int, Int, Int, String))]) =
    rows.toDF("media_id", "kind", "payload", "m")
      .select(col("media_id"), col("kind"), col("payload"), struct(
        col("m._1").as("width"), col("m._2").as("height"),
        col("m._3").as("sample_rate"), col("m._4").as("n_frames"),
        col("m._5").as("format")).as("meta"))

  test("perceptual video near-dup catches a brightness-shifted re-encode md5 misses") {
    import java.awt.image.BufferedImage
    def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
      val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    // structured frame: left half dark, right half bright; the
    // "re-encode" shifts every pixel +20 (a uniform brightness shift
    // moves every bucket mean AND the global mean — pHash bits are
    // exactly invariant); the third video has different structure
    def frame(shift: Int) = png(16, 4)((x, _) =>
      ((if (x < 8) 60 else 180) + shift) * 0x010101)
    val a = frame(0); val b = frame(20)
    val c = png(16, 4)((x, _) => (if (x % 2 == 0) 40 else 220) * 0x010101)
    assert(!java.util.Arrays.equals(a, b))
    val df = mediaDf(Seq(
      (1L, "video", a, (16, 4, 0, 20, "png")),
      (2L, "video", b, (16, 4, 0, 20, "png")),
      (3L, "video", c, (16, 4, 0, 20, "png"))))
    // md5 stand-in: no frame is byte-identical across videos → blind
    assert(Multimodal.videoNearDup(df, stride = 10).collect().isEmpty)
    // perceptual face: the re-encode collides on every sampled frame
    val pairs = Multimodal.videoNearDupPerceptual(df, stride = 10,
        featureDim = 8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), pairs.toString)
    // incremental: the re-encoded re-upload of landed footage is
    // absorbed, fresh footage keeps
    graft.util.CacheRegistry.releaseAll()
    val got = Multimodal.videoNearDupIncrementPerceptual(
        df.filter(col("media_id") === 1L),
        df.filter(col("media_id") =!= 1L), stride = 10, featureDim = 8)
      .orderBy("media_id").as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "landed_dup"), (3L, "keep")), got.toString)
    graft.util.CacheRegistry.releaseAll()
  }

  test("perceptual audio near-dup catches a volume-scaled re-encode md5 misses") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def wav(samples: Array[Short], rate: Float): Array[Byte] = {
      val data = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        data(2 * i) = (samples(i) & 0xff).toByte
        data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(rate, 16, 1, true, false)
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data),
        fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // 800 frames at 8 kHz (25 ms windows = 200 frames → 4 windows);
    // loud/quiet alternating every 25 frames — aligned with the 8
    // feature buckets. The "re-encode" halves the volume (scaling
    // moves every bucket mean and the global mean together); the
    // third clip has the inverted loud/quiet phase.
    val base = Array.tabulate[Short](800)(i =>
      if ((i / 25) % 2 == 0) 8000 else 1000)
    val half = base.map(s => (s / 2).toShort)
    val inverted = Array.tabulate[Short](800)(i =>
      if ((i / 25) % 2 == 1) 8000 else 1000)
    val df = mediaDf(Seq(
      (1L, "audio", wav(base, 8000f), (0, 0, 8000, 10, "wav")),
      (2L, "audio", wav(half, 8000f), (0, 0, 8000, 10, "wav")),
      (3L, "audio", wav(inverted, 8000f), (0, 0, 8000, 10, "wav"))))
    // md5 stand-in: byte-distinct payloads → blind
    assert(Multimodal.audioNearDup(df, stride = 5).collect().isEmpty)
    // perceptual face: the volume-scaled copy collides window for window
    val pairs = Multimodal.audioNearDupPerceptual(df, featureDim = 8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), pairs.toString)
    graft.util.CacheRegistry.releaseAll()
    val got = Multimodal.audioNearDupIncrementPerceptual(
        df.filter(col("media_id") === 1L),
        df.filter(col("media_id") =!= 1L), featureDim = 8)
      .orderBy("media_id").as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "landed_dup"), (3L, "keep")), got.toString)
    graft.util.CacheRegistry.releaseAll()
  }
}
