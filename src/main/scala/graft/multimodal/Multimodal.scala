package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support for training-data pipelines: image/audio/
  * video as opaque `BINARY` payloads with typed metadata, plus
  * decode / feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing is real — schemas, per-partition batch
  * iteration (the Scala analog of `mapInPandas`: one iterator in, one
  * iterator out, never materializing a partition), frame explosion with
  * even partitioning. The *codec* step is STUBBED: this container ships
  * no image/audio libraries, so [[StubCodec]] produces deterministic
  * pseudo-decodes derived from the payload bytes. Swapping in a real
  * codec changes only that object — every operator signature, schema and
  * shuffle stays as-is. On the Python surface the same operators are
  * `mapInPandas` with the identical batch contract (iterator of record
  * batches), which Arrow feeds zero-copy.
  */
object Multimodal {

  /** The media-table schema: payload plus typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("format", StringType))))))

  final case class MediaMeta(width: Int, height: Int, sample_rate: Int,
      n_frames: Int, format: String)
  final case class Media(media_id: Long, kind: String, payload: Array[Byte],
      meta: MediaMeta)
  final case class DecodedImage(media_id: Long, width: Int, height: Int,
      channels: Int, features: Array[Float])
  final case class Frame(media_id: Long, frame_idx: Int, payload: Array[Byte])

  /** The codec seam: decode a payload into geometry + a fixed-dim
    * feature vector, or None for an undecodable blob (real pipelines
    * drop corrupt media rather than fail the job). Implementations must
    * be serializable — they ride the `mapPartitions` closure to
    * executors. [[StubImageCodec]] is the deterministic oracle path
    * (q25's DuckDB-replayable hash features); [[ImageIOCodec]] is a
    * REAL decoder via the JDK's ImageIO (PNG/JPEG/BMP/GIF, zero added
    * dependencies). A native build (libjpeg-turbo, ffmpeg) would sit
    * behind this same trait in a provided-scoped module. */
  trait ImageCodec extends Serializable {
    def decode(payload: Array[Byte], meta: MediaMeta,
        dim: Int): Option[(Int, Int, Int, Array[Float])]
  }

  /** Oracle path: always decodes, geometry from metadata, features from
    * the payload hash — exactly [[StubCodec.decodeFeatures]]. */
  object StubImageCodec extends ImageCodec {
    def decode(payload: Array[Byte], meta: MediaMeta,
        dim: Int): Option[(Int, Int, Int, Array[Float])] =
      Some((meta.width, meta.height, 3, StubCodec.decodeFeatures(payload, dim)))
  }

  /** Real decoder over the JDK's `javax.imageio`: geometry and channel
    * count come from the DECODED image (not the metadata), features are
    * `dim` bucketed mean luminances over the raster in row-major order —
    * deterministic, library-stable arithmetic (integer BT.601 luma).
    * Undecodable payloads yield None and are dropped. */
  object ImageIOCodec extends ImageCodec {
    def decode(payload: Array[Byte], meta: MediaMeta,
        dim: Int): Option[(Int, Int, Int, Array[Float])] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: java.io.IOException => null }
      Option(img).map { im =>
        val w = im.getWidth; val h = im.getHeight
        val sum = new Array[Float](dim)
        val cnt = new Array[Int](dim)
        val n = w.toLong * h
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            val b = ((y.toLong * w + x) * dim / n).toInt
            sum(b) += lum / 255.0f
            cnt(b) += 1
            x += 1
          }
          y += 1
        }
        var i = 0
        while (i < dim) { if (cnt(i) > 0) sum(i) /= cnt(i); i += 1 }
        (w, h, im.getColorModel.getNumComponents, sum)
      }
    }
  }

  /** ======== STUB ======== deterministic fake codec. A real build links
    * an image/audio library here; everything else in this file is
    * production plumbing. Decode output is a pure function of the payload
    * bytes so tests and retries are reproducible. */
  object StubCodec {
    def decodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
      // FNV-1a rolling over the payload, expanded to `dim` floats
      var h = 0xcbf29ce484222325L
      payload.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      val out = new Array[Float](dim)
      var s = h
      var i = 0
      while (i < dim) {
        s = s * 6364136223846793005L + 1442695040888963407L
        out(i) = ((s >>> 40).toInt % 1000) / 1000.0f
        i += 1
      }
      out
    }
  }

  /** Build a synthetic media table from any table with an id and a string
    * column (payload = UTF-8 bytes) — the test/bench stand-in for real
    * blob columns. */
  def syntheticMedia(src: DataFrame, idCol: String, strCol: String): DataFrame =
    src.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col(strCol), "UTF-8").as("payload"),
      struct(
        (pmod(col(idCol).cast("long"), lit(640)) + 32).cast("int").as("width"),
        (pmod(col(idCol).cast("long"), lit(480)) + 32).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (pmod(col(idCol).cast("long"), lit(300)) + 1).cast("int").as("n_frames"),
        lit("stub").as("format")).as("meta"))

  /** THE canonical landed-media slice (media_id % 5 ≠ 2) shared by the
    * q130/q171/q175 index builds AND their exec entries — memoized
    * landed indexes key on the plan fingerprint, so one definition is
    * what guarantees the index phase and the query probe the SAME
    * cache entry (a drifting copy would silently rebuild the landed
    * index per query). */
  def landedMediaSlice(docs: DataFrame): DataFrame =
    syntheticMedia(docs, "doc_id", "text")
      .filter(pmod(col("media_id"), lit(5L)) =!= 2)

  /** The batch twin of [[landedMediaSlice]] (media_id % 5 = 2). */
  def batchMediaSlice(docs: DataFrame): DataFrame =
    syntheticMedia(docs, "doc_id", "text")
      .filter(pmod(col("media_id"), lit(5L)) === 2)

  /** Decode + feature-extract, batch-at-a-time per partition (the
    * `mapInPandas` contract: Iterator→Iterator, constant memory). The
    * work is embarrassingly parallel — no shuffle is introduced; Spark's
    * input partitioning carries straight through. */
  def decodeImages(media: DataFrame, featureDim: Int = 64,
      codec: ImageCodec = StubImageCodec): Dataset[DecodedImage] = {
    implicit val enc = Encoders.product[DecodedImage]
    implicit val mediaEnc = Encoders.product[Media]
    media.as[Media].mapPartitions { it =>
      it.flatMap { m =>
        codec.decode(m.payload, m.meta, featureDim).map {
          case (w, h, c, f) => DecodedImage(m.media_id, w, h, c, f)
        }
      }
    }
  }

  /** Perceptual near-duplicate detection over the IMAGE rows of a media
    * table — the dedup families extended to the binary modality, with
    * the pHash construction on the decoded feature vector: bit i is
    * "feature i above the vector's own mean" (mean-threshold, the
    * classic perceptual-hash step — scale/brightness shifts that move
    * all features together leave the bits alone), packed into
    * `bands` integer band values of featureDim/bands bits each. The
    * mean comparison is exact integers (features are k/1000 by stub
    * construction; `k·dim > Σk` needs no division), so fingerprints are
    * engine-reproducible.
    *
    * Candidate generation is the banded-LSH shape shared with q19/q22:
    * two fingerprints are compared only if they agree EXACTLY on at
    * least one band. Pigeonhole guarantee: any pair differing in fewer
    * than `bands` bits shares a clean band; pairs between `bands` and
    * `maxHamming` differing bits are recalled probabilistically (the
    * standard banding trade — raise `bands` to buy recall); survivors
    * verify at exact
    * hamming distance (Σ bit_count(xor) over the bands) and CC keeps
    * the minimum id per component. No all-pairs stage: candidates are
    * (band, value)-bucket joins, hamming is computed on `bands` small
    * ints per surviving pair, and feature vectors never shuffle.
    *
    * With a real codec the features are perceptual (DCT/embedding) and
    * this is image dedup; with [[StubImageCodec]] features are
    * payload-hash-derived, so only byte-identical payloads collide —
    * which is exactly what makes the full chain DuckDB-replayable
    * (q124's oracle replays FNV/LCG/fingerprint/hamming/CC end to
    * end). Output: (media_id, img_cluster, keep), one row per DECODED
    * image — a payload the codec rejects (None) is dropped, not
    * emitted (with the stub codec every payload decodes, so the
    * oracle face stays total over image rows). */
  /** The pHash band-fingerprint table of a media table's IMAGE rows —
    * (media_id, band, bval), `bands` rows per decoded image: decode,
    * mean-threshold bits, packed band integers (the [[imageNearDup]]
    * construction, factored out so the incremental face can memoize
    * the landed side). Decode is paid exactly once per row here;
    * everything downstream of this table works on `bands` small ints
    * per image and never re-touches payload bytes. */
  def imageBandTable(media: DataFrame, featureDim: Int = 60,
      bands: Int = 4, codec: ImageCodec = StubImageCodec): DataFrame = {
    require(featureDim % bands == 0, "featureDim must divide into bands")
    val bitsPerBand = featureDim / bands
    require(bitsPerBand <= 30, "band values must stay in integer range")
    val images = media.filter(col("kind") === "image")
    val dec = decodeImages(images, featureDim, codec).toDF()
    val ks = dec.select(col("media_id"), posexplode(col("features")))
      .withColumn("k", round(col("col").cast("double") * 1000).cast("long"))
      .select("media_id", "pos", "k")
    val tot = ks.groupBy("media_id").agg(sum("k").as("ksum"))
    ks.join(tot, "media_id")
      .withColumn("bit",
        when(col("k") * featureDim > col("ksum"), 1L).otherwise(0L))
      .groupBy(col("media_id"),
        expr(s"CAST(pos DIV $bitsPerBand AS INT)").as("band"))
      .agg(sum(col("bit") *
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pos % $bitsPerBand AS INT))"))
        .as("bval"))
  }

  /** The LANDED corpus's memoized image-fingerprint index (kind
    * "img-bands") — [[imageNearDupIncrement]]'s landed side, built
    * once per corpus (paying the landed decode once) and probed by
    * batch equi-joins batch over batch, exposed for an index-build
    * phase. */
  def landedImageBands(landed: DataFrame, featureDim: Int = 60,
      bands: Int = 4, codec: ImageCodec = StubImageCodec): DataFrame =
    graft.util.CacheRegistry.cache(
      graft.util.CacheRegistry.key(landed, "img-bands", featureDim, bands,
        codec.getClass.getName),
      imageBandTable(landed, featureDim, bands, codec))

  def imageNearDup(media: DataFrame, featureDim: Int = 60, bands: Int = 4,
      maxHamming: Int = 6,
      codec: ImageCodec = StubImageCodec): DataFrame = {
    val bandTable = imageBandTable(media, featureDim, bands, codec)
    val cand = bandTable.select(col("media_id").as("a_id"), col("band"),
        col("bval"))
      .join(bandTable.select(col("media_id").as("b_id"), col("band"),
        col("bval")), Seq("band", "bval"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val ham = cand
      .join(bandTable.select(col("media_id").as("a_id"), col("band"),
        col("bval").as("av")), "a_id")
      .join(bandTable.select(col("media_id").as("b_id"), col("band"),
        col("bval").as("bv")), Seq("b_id", "band"))
      .groupBy("a_id", "b_id")
      .agg(sum(bit_count(col("av").bitwiseXOR(col("bv")))).as("ham"))
    val pairs = ham.filter(col("ham") <= maxHamming).select("a_id", "b_id")
    // CC vertices are the DECODED rows: an image the codec rejects
    // (None — corrupt/truncated payload) gets no fingerprint, no
    // verdict, and no keep=true — real pipelines drop corrupt media,
    // they do not admit it unverified (with [[StubImageCodec]] every
    // payload decodes, so the stub-oracle face is unaffected). The
    // universe derives from the band table (distinct of its bands
    // rows per decoded image) so decode is paid ONCE, not re-run for
    // a second vertex-side plan (r15 review finding).
    val labels = graft.dedup.Dedup.connectedComponents(pairs,
      bandTable.select(col("media_id")).distinct(), "media_id")
    labels.select(col("id").as("media_id"), col("lbl").as("img_cluster"))
      .withColumn("keep", col("media_id") === col("img_cluster"))
  }

  /** Incremental perceptual image near-dup for append-only ingest —
    * the MEDIA cell of the incremental matrix (exact: q83/q88; near
    * text: q99; near embedding: q110; substring: q111; semantic:
    * q117/q122; selection: q125; containment: q128): an incoming
    * media batch is screened against the landed corpus's memoized
    * pHash fingerprint index ([[landedImageBands]], kind "img-bands"),
    * then against itself — [[graft.similarity.Similarity.lshIncrement]]'s
    * verdict lattice with the band-value bucket standing for the LSH
    * bucket and exact hamming (Σ bit_count(xor) over the `bands`
    * packed ints) standing for exact cosine.
    *
    * Landed-side work per batch: ZERO decode (the landed index is
    * `bands` small ints per image, built once per corpus) — the batch
    * pays its own decode once inside its band table and every
    * verification afterwards reads integers. Candidates form as ONE
    * (band, bval) equi-join of the batch band table against the
    * tagged union of both; verification is an integer aggregate over
    * the `bands` rows of each surviving pair; `landed_dup` wins
    * before any within-batch evidence (batch-order-independent: the
    * landed fingerprints cannot be moved by the batch); CC runs over
    * verified batch pairs among survivors only. Decoded-row universe:
    * one verdict row per DECODED batch image, as [[imageNearDup]] —
    * a payload the codec rejects gets no verdict.
    *
    * Durability caveat as the other incremental faces: the verified-
    * pair table is pinned with `localCheckpoint`, whose blocks cannot
    * be recomputed after an executor loss; a cluster deployment that
    * cannot tolerate a mid-batch retry should swap it for reliable
    * `checkpoint()`. Output: (media_id, verdict ∈ {landed_dup,
    * batch_dup, keep}). */
  def imageNearDupIncrement(landed: DataFrame, incoming: DataFrame,
      featureDim: Int = 60, bands: Int = 4, maxHamming: Int = 6,
      codec: ImageCodec = StubImageCodec): DataFrame = {
    val lb = landedImageBands(landed, featureDim, bands, codec)
    val ib = imageBandTable(incoming, featureDim, bands, codec)
    val allBands = ib
      .select(col("media_id"), col("band"), col("bval"), lit("batch").as("src"))
      .unionByName(lb
        .select(col("media_id"), col("band"), col("bval"),
          lit("landed").as("src")))
    val cand = ib.select(col("media_id").as("a_id"), col("band"), col("bval"))
      .join(allBands.select(col("media_id").as("b_id"), col("band"),
        col("bval"), col("src").as("side")), Seq("band", "bval"))
      .filter(col("side") === "landed" || col("a_id") < col("b_id"))
      .select("a_id", "b_id", "side").distinct()
    val bu = ib.unionByName(lb)
    val verified = cand
      .join(ib.select(col("media_id").as("a_id"), col("band"),
        col("bval").as("av")), "a_id")
      .join(bu.select(col("media_id").as("b_id"), col("band"),
        col("bval").as("bv")), Seq("b_id", "band"))
      .groupBy("a_id", "b_id", "side")
      .agg(sum(bit_count(col("av").bitwiseXOR(col("bv")))).as("ham"))
      .filter(col("ham") <= maxHamming)
      .select("a_id", "b_id", "side")
      .localCheckpoint(true) // single-node caveat: see scaladoc
    incrementVerdicts(verified, ib.select(col("media_id")).distinct())
  }

  /** The side-tagged incremental verdict lattice shared by the image
    * and video faces: landed absorption (`landed_dup`) > CC over
    * verified batch pairs among survivors (`batch_dup`) > `keep`.
    * `verified` = (a_id, b_id, side); `universe` = every incoming id
    * owed a verdict (UNCAPPED — a media whose evidence was df-capped
    * away still answers `keep`). */
  private def incrementVerdicts(verified: DataFrame,
      universe: DataFrame): DataFrame = {
    val landedDup = verified.filter(col("side") === "landed")
      .select(col("a_id").as("media_id")).distinct()
    val batchPairs = verified.filter(col("side") === "batch")
      .select("a_id", "b_id")
      .join(landedDup.select(col("media_id").as("a_id")), Seq("a_id"),
        "left_anti")
      .join(landedDup.select(col("media_id").as("b_id")), Seq("b_id"),
        "left_anti")
    val fresh = universe.join(landedDup, Seq("media_id"), "left_anti")
    val labels = graft.dedup.Dedup.connectedComponents(batchPairs, fresh,
      "media_id")
    universe
      .join(landedDup.withColumn("__ld", lit(1L)), Seq("media_id"), "left")
      .join(labels.select(col("id").as("media_id"), col("lbl")),
        Seq("media_id"), "left")
      .select(col("media_id"),
        when(col("__ld").isNotNull, lit("landed_dup"))
          .when(col("lbl") =!= col("media_id"), lit("batch_dup"))
          .otherwise(lit("keep")).as("verdict"))
  }

  /** Audio decode + fixed-window feature extraction (the MFCC-shaped
    * face): one feature row per `windowMs` window of the clip, so a long
    * recording becomes many distributable rows — the same
    * explode-then-decode shape as [[sampleFrames]], because per-window
    * DSP (the expensive part in a real build) must land AFTER the
    * explode to spread across executors. Window count = `meta.n_frames`
    * (the stub's duration proxy; a real build derives it from duration /
    * window length at `meta.sample_rate`); the STUB features are the
    * payload hash salted by the window index (deterministic,
    * engine-reproducible). No shuffle introduced. */
  final case class AudioWindow(media_id: Long, window_idx: Int,
      sample_rate: Int, features: Array[Float])

  def decodeAudio(media: DataFrame,
      featureDim: Int = 13): Dataset[AudioWindow] = {
    implicit val enc = Encoders.product[AudioWindow]
    implicit val rowEnc = Encoders.tuple(Encoders.scalaLong,
      Encoders.BINARY, Encoders.scalaInt, Encoders.scalaInt)
    media
      .filter(col("kind") === "audio")
      .select(col("media_id"), col("payload"),
        col("meta.sample_rate").as("sample_rate"),
        explode(sequence(lit(0), col("meta.n_frames") - 1)).as("window_idx"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, payload, rate, w) =>
          val salted = payload ++ Array((w & 0xff).toByte, ((w >> 8) & 0xff).toByte)
          AudioWindow(id, w, rate, StubCodec.decodeFeatures(salted, featureDim))
        }
      }
  }

  /** The audio codec seam, mirroring [[ImageCodec]]: `probe` parses the
    * container header into (sampleRate, totalPcmFrames); `decodeRange`
    * decodes frames `[start, start+len)` to channel-averaged mono floats
    * in [-1, 1]. The range form is the scale-relevant part of the
    * contract: PCM containers are frame-addressable, so a window's task
    * decodes ONLY its slice instead of the whole clip — per-window cost
    * stays O(window) no matter how long the recording is.
    * Implementations must be serializable (they ride the `mapPartitions`
    * closure). [[JavaSoundCodec]] is a REAL decoder over the JDK's
    * `javax.sound.sampled` (WAV/AU/AIFF PCM, zero added dependencies);
    * a native build (ffmpeg) would sit behind this same trait. */
  trait AudioCodec extends Serializable {
    def probe(payload: Array[Byte]): Option[(Int, Long)]
    def decodeRange(payload: Array[Byte], start: Long, len: Int): Option[Array[Float]]
  }

  /** Real PCM decoder via the JDK's `javax.sound.sampled` — the
    * [[ImageIOCodec]] move repeated for audio. Supports signed/unsigned
    * 8- and 16-bit PCM, any channel count (channels are averaged to
    * mono), both endiannesses. Undecodable or non-PCM payloads yield
    * None and are dropped, like corrupt media in a real pipeline. */
  object JavaSoundCodec extends AudioCodec {
    import javax.sound.sampled.{AudioFormat, AudioSystem}

    private def open(payload: Array[Byte]) =
      AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))

    def probe(payload: Array[Byte]): Option[(Int, Long)] =
      try {
        val s = open(payload)
        try {
          val n = s.getFrameLength
          if (n >= 0) Some((s.getFormat.getSampleRate.toInt, n)) else None
        } finally s.close()
      } catch { case _: Exception => None }

    def decodeRange(payload: Array[Byte], start: Long,
        len: Int): Option[Array[Float]] =
      try {
        val s = open(payload)
        try {
          val f = s.getFormat
          val signed = f.getEncoding == AudioFormat.Encoding.PCM_SIGNED
          val unsigned = f.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
          val bits = f.getSampleSizeInBits
          if ((!signed && !unsigned) || (bits != 8 && bits != 16)) None
          else {
            val ch = f.getChannels
            val fsz = f.getFrameSize
            // skip() may be partial (and may return 0 on some stream
            // stacks) — fall back to draining reads so a mid-file start
            // is still reached deterministically
            var toSkip = start * fsz
            val scratch = new Array[Byte](8192)
            while (toSkip > 0) {
              val sk = s.skip(toSkip)
              if (sk > 0) toSkip -= sk
              else {
                val r = s.read(scratch, 0, math.min(toSkip, scratch.length.toLong).toInt)
                if (r <= 0) toSkip = 0 else toSkip -= r
              }
            }
            val buf = new Array[Byte](len * fsz)
            var off = 0
            var eof = false
            while (off < buf.length && !eof) {
              val r = s.read(buf, off, buf.length - off)
              if (r < 0) eof = true else off += r
            }
            val nFrames = off / fsz
            val out = new Array[Float](nFrames)
            val big = f.isBigEndian
            val bytesPer = bits / 8
            var i = 0
            while (i < nFrames) {
              var sum = 0f
              var c = 0
              while (c < ch) {
                val base = i * fsz + c * bytesPer
                val v =
                  if (bits == 8) {
                    if (signed) buf(base) / 128f
                    else ((buf(base) & 0xff) - 128) / 128f
                  } else {
                    val b0 = buf(base) & 0xff
                    val b1 = buf(base + 1) & 0xff
                    val raw = if (big) (b0 << 8) | b1 else (b1 << 8) | b0
                    val sv = if (signed) raw.toShort.toInt else raw - 32768
                    sv / 32768f
                  }
                sum += v
                c += 1
              }
              out(i) = sum / ch
              i += 1
            }
            Some(out)
          }
        } finally s.close()
      } catch { case _: Exception => None }
  }

  /** Real-codec face of [[decodeAudio]]: fixed-length PCM windows
    * decoded from the payload itself (window length = `windowMs` at the
    * clip's OWN sample rate, from the container header — not the
    * metadata). Same explode-then-decode distribution as the stub path:
    * the probe is one cheap header parse per clip, the fan-out happens
    * relationally, and the per-window DSP (range decode + features)
    * lands after it — with [[AudioCodec.decodeRange]] seeking straight
    * to the window's frame offset, so each window's task touches
    * O(window) bytes. Features are `featureDim` bucketed mean absolute
    * amplitudes over the window (row-major buckets — the audio analog
    * of [[ImageIOCodec]]'s bucketed luma; deterministic arithmetic).
    * Undecodable payloads are dropped; a final partial window is
    * emitted (len < full window). No shuffle introduced. */
  def decodeAudioPcm(media: DataFrame, windowMs: Int = 25,
      featureDim: Int = 13,
      codec: AudioCodec = JavaSoundCodec): Dataset[AudioWindow] = {
    implicit val enc = Encoders.product[AudioWindow]
    implicit val mediaEnc = Encoders.product[Media]
    media.filter(col("kind") === "audio").as[Media].mapPartitions { it =>
      it.flatMap { m =>
        codec.probe(m.payload).iterator.flatMap { case (rate, total) =>
          val wlen = math.max(1L, rate.toLong * windowMs / 1000)
          val nWin = ((total + wlen - 1) / wlen).toInt
          (0 until nWin).iterator.flatMap { w =>
            val startF = w.toLong * wlen
            val lenF = math.min(wlen, total - startF).toInt
            codec.decodeRange(m.payload, startF, lenF).map { samples =>
              val sum = new Array[Float](featureDim)
              val cnt = new Array[Int](featureDim)
              val n = math.max(samples.length, 1)
              var i = 0
              while (i < samples.length) {
                val b = (i.toLong * featureDim / n).toInt
                sum(b) += math.abs(samples(i))
                cnt(b) += 1
                i += 1
              }
              var j = 0
              while (j < featureDim) { if (cnt(j) > 0) sum(j) /= cnt(j); j += 1 }
              AudioWindow(m.media_id, w, rate, sum)
            }
          }
        }
      }
    }
  }

  /** Resize: recompute features at the target geometry. STUB semantics:
    * features re-derived from payload + target size (deterministic);
    * real semantics: decode → resample → re-encode. Same plumbing. */
  def resize(media: DataFrame, w: Int, h: Int, featureDim: Int = 64): Dataset[DecodedImage] = {
    implicit val enc = Encoders.product[DecodedImage]
    implicit val mediaEnc = Encoders.product[Media]
    media.as[Media].mapPartitions { it =>
      it.map { m =>
        val salted = m.payload ++ Array(w.toByte, h.toByte)
        DecodedImage(m.media_id, w, h, 3, StubCodec.decodeFeatures(salted, featureDim))
      }
    }
  }

  /** Frame sampling for video payloads: one row per sampled frame index
    * (every `stride`-th of `meta.n_frames`). Pure relational explode —
    * the expensive per-frame decode happens after the explode, so frame
    * work distributes across the cluster instead of hiding inside one
    * row. Repartition by (media_id, frame_idx) hash when the decode is
    * heavy; here the explode keeps input partitioning. */
  def sampleFrames(media: DataFrame, stride: Int): Dataset[Frame] = {
    implicit val enc = Encoders.product[Frame]
    sampleSlices(media, stride, "video").as[Frame]
  }

  /** The kind-generic slice sampler behind [[sampleFrames]] (video
    * frames) and the audio window face: every stride-th index in
    * [0, meta.n_frames) explodes to its own row BEFORE any per-slice
    * work, so decode distributes. STUB: a real impl slices the
    * container at the index's offset; the stand-in tags the payload
    * with the index. */
  private def sampleSlices(media: DataFrame, stride: Int,
      kind: String): DataFrame =
    media
      .filter(col("kind") === kind)
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0), col("meta.n_frames") - 1,
          lit(stride))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx").cast("int"),
        concat(col("payload"), encode(concat(lit("#"), col("frame_idx")), "UTF-8"))
          .as("payload"))

  /** Video near-duplicate pairs via a frame-fingerprint inverted index
    * — the production video-dedup shape (re-uploads, re-encodes and
    * trims of the same footage share most frame hashes): sample frames
    * ([[sampleFrames]]), fingerprint each (md5 of the frame payload —
    * a real build puts a perceptual per-frame hash behind the codec
    * seam; the md5 stand-in keeps the PLUMBING — explode, df cap,
    * inverted join, integer Jaccard — bit-reproducible), then q18's
    * exact shape over frame sets: pairs form ONLY through shared
    * fingerprints, never all-pairs, and every shuffled row is narrow
    * (fingerprint + two ids).
    *
    * Scale guards, inherited from the text face: fingerprints with
    * document frequency > `maxDf` leave the similarity space before
    * the join (a frame shared by everything — black frames, intros —
    * carries no pair information and would go quadratic), and sizes /
    * intersections / Jaccard are all computed over the capped space so
    * the report is self-consistent. Output: (a_id, b_id, inter,
    * a_frames, b_frames, jaccard_ppm ≥ minJaccardPpm) — all integers,
    * jaccard_ppm a truncating division of non-negative longs. */
  def videoNearDup(media: DataFrame, stride: Int = 10, maxDf: Int = 1000,
      minJaccardPpm: Long = 500000): DataFrame =
    fingerprintJaccardPairs(
      frameFingerprints(media, stride, maxDf, "video"), minJaccardPpm)

  /** Audio near-duplicate pairs — [[videoNearDup]]'s inverted-index
    * shape over sampled audio WINDOWS (re-uploads and re-encodes of
    * the same recording share window fingerprints exactly as video
    * re-uploads share frame hashes; a real build puts a chromaprint-
    * style window hash behind the codec seam). Same df cap, same
    * integer Jaccard, same output columns. */
  def audioNearDup(media: DataFrame, stride: Int = 10, maxDf: Int = 1000,
      minJaccardPpm: Long = 500000): DataFrame =
    fingerprintJaccardPairs(
      frameFingerprints(media, stride, maxDf, "audio"), minJaccardPpm)

  /** q18's exact pair shape over a capped fingerprint table: pairs
    * form ONLY through shared fingerprints, sizes ride the rows,
    * integer cross-checked Jaccard threshold. */
  private def fingerprintJaccardPairs(capped: DataFrame,
      minJaccardPpm: Long): DataFrame =
    capped.select(col("media_id").as("a_id"), col("fp"),
        col("sz").as("a_sz"))
      .join(capped.select(col("media_id").as("b_id"), col("fp"),
        col("sz").as("b_sz")), "fp")
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("inter"),
        min("a_sz").as("a_frames"), min("b_sz").as("b_frames"))
      .withColumn("jaccard_ppm",
        expr("inter * 1000000 div (a_frames + b_frames - inter)"))
      .filter(col("jaccard_ppm") >= lit(minJaccardPpm))
      .select("a_id", "b_id", "inter", "a_frames", "b_frames",
        "jaccard_ppm")

  /** The df-capped per-media slice-fingerprint table (media_id, fp,
    * sz): sampled slices → md5 fingerprint → distinct → drop
    * fingerprints with document frequency > maxDf → per-media set size
    * over the CAPPED space (self-consistent, the q18 convention). One
    * definition shared by the one-shot pair faces and the incremental
    * index builders of BOTH time-sliced modalities. */
  private def frameFingerprints(media: DataFrame, stride: Int,
      maxDf: Int, kind: String): DataFrame =
    capFingerprints(
      sampleSlices(media, stride, kind)
        .select(col("media_id"), md5(col("payload")).as("fp")), maxDf)

  /** Pack the q124 pHash bits (mean-threshold over a decoded feature
    * vector — exact integers: k/1000 quantized luma, `k·dim > Σk`) into
    * a hex string usable as a frame fingerprint. Bit i lives at byte
    * i/8, position i%8. */
  private[multimodal] def pHashHex(features: Array[Float]): String = {
    val dim = features.length
    val ks = features.map(f => math.round(f * 1000.0).toLong)
    val tot = ks.sum
    val bytes = new Array[Byte]((dim + 7) / 8)
    var i = 0
    while (i < dim) {
      if (ks(i) * dim > tot) bytes(i / 8) = (bytes(i / 8) | (1 << (i % 8))).toByte
      i += 1
    }
    bytes.map("%02x".format(_)).mkString
  }

  /** PERCEPTUAL per-frame fingerprints — the real-codec face of
    * [[frameFingerprints]] (r16 verdict gap #4): each sampled frame
    * payload is decoded as an IMAGE ([[ImageIOCodec]] by default — a
    * video container's sampled frames arrive as encoded stills in the
    * MJPEG/keyframe-extract shape) and fingerprinted with the q124
    * pHash (bucketed-luma mean-threshold bits, [[pHashHex]]), so a
    * re-encoded, uniformly brightness-shifted or byte-shuffled copy of
    * the same footage COLLIDES where the md5 stand-in needs byte
    * identity (a constant luma shift moves every bucket mean and the
    * global mean together — the bits are exactly invariant short of
    * clipping). Undecodable frames are dropped, as corrupt media
    * everywhere else. Output schema identical to the md5 face:
    * (media_id, fp, sz) over the df-capped space — every downstream
    * consumer (pair face, incremental lattice) is fingerprint-agnostic.
    *
    * The md5 face stays the CONTRACT oracle twin: q170/q171's synthetic
    * payloads are not decodable media (UTF-8 text bytes), and a DuckDB
    * oracle cannot replay ImageIO rasters — byte-exact fingerprints are
    * what make the plumbing hash-checkable. MultimodalSpec plants a
    * real re-encoded dup and proves this face catches what md5 cannot. */
  def perceptualFrameFingerprints(media: DataFrame, stride: Int = 10,
      maxDf: Int = 1000, kind: String = "video", featureDim: Int = 60,
      codec: ImageCodec = ImageIOCodec): DataFrame = {
    implicit val rowEnc = Encoders.tuple(Encoders.scalaLong,
      Encoders.scalaInt, Encoders.BINARY)
    implicit val outEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    val noMeta = MediaMeta(0, 0, 0, 0, "")
    val fps = sampleSlices(media, stride, kind)
      .select(col("media_id"), col("frame_idx"), col("payload"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, _, payload) =>
          codec.decode(payload, noMeta, featureDim).map {
            case (_, _, _, f) => (id, pHashHex(f))
          }
        }
      }
      .toDF("media_id", "fp")
    capFingerprints(fps, maxDf)
  }

  /** The shared df-cap + per-media-size tail of every fingerprint
    * table: distinct (media_id, fp), drop fingerprints with df >
    * maxDf, attach the capped set size. */
  private def capFingerprints(fps: DataFrame, maxDf: Int): DataFrame =
    fps.distinct()
      .withColumn("df", count(lit(1)).over(Window.partitionBy("fp")))
      .filter(col("df") <= maxDf)
      .withColumn("sz", count(lit(1)).over(Window.partitionBy("media_id")))
      .select("media_id", "fp", "sz")

  /** PERCEPTUAL per-window audio fingerprints — the real-codec face of
    * the audio family ([[perceptualFrameFingerprints]]'s move repeated
    * over PCM): each [[decodeAudioPcm]] window's bucketed
    * mean-amplitude profile is mean-threshold-bit-packed
    * ([[pHashHex]]), so a VOLUME-SCALED or bit-depth re-encode of the
    * same recording collides (scaling multiplies every bucket mean and
    * the global mean together — the bits are invariant up to
    * quantization) where the md5 stand-in needs byte identity. Same
    * (media_id, fp, sz) contract; the md5 face stays the oracle twin
    * for the same reasons as video. */
  def perceptualAudioFingerprints(media: DataFrame, windowMs: Int = 25,
      maxDf: Int = 1000, featureDim: Int = 60,
      codec: AudioCodec = JavaSoundCodec): DataFrame = {
    implicit val outEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    val fps = decodeAudioPcm(media, windowMs, featureDim, codec)
      .map(w => (w.media_id, pHashHex(w.features)))
      .toDF("media_id", "fp")
    capFingerprints(fps, maxDf)
  }

  /** [[audioNearDup]] over PERCEPTUAL window fingerprints. */
  def audioNearDupPerceptual(media: DataFrame, windowMs: Int = 25,
      maxDf: Int = 1000, minJaccardPpm: Long = 500000,
      featureDim: Int = 60, codec: AudioCodec = JavaSoundCodec): DataFrame =
    fingerprintJaccardPairs(
      perceptualAudioFingerprints(media, windowMs, maxDf, featureDim,
        codec), minJaccardPpm)

  /** The landed corpus's memoized PERCEPTUAL audio-window index (kind
    * "aud-pwindows") — [[audioNearDupIncrementPerceptual]]'s landed
    * side. */
  def landedAudioWindowsPerceptual(landed: DataFrame, windowMs: Int = 25,
      maxDf: Int = 1000, featureDim: Int = 60,
      codec: AudioCodec = JavaSoundCodec): DataFrame =
    graft.util.CacheRegistry.cache(
      graft.util.CacheRegistry.key(landed, "aud-pwindows", windowMs, maxDf,
        featureDim, codec.getClass.getName),
      perceptualAudioFingerprints(landed, windowMs, maxDf, featureDim,
        codec))

  /** [[audioNearDupIncrement]] over PERCEPTUAL fingerprints: a
    * volume-scaled re-upload of landed audio verdicts `landed_dup`
    * with zero byte-identical windows. */
  def audioNearDupIncrementPerceptual(landed: DataFrame,
      incoming: DataFrame, windowMs: Int = 25, maxDf: Int = 1000,
      minJaccardPpm: Long = 500000, featureDim: Int = 60,
      codec: AudioCodec = JavaSoundCodec): DataFrame =
    fingerprintIncrement(
      landedAudioWindowsPerceptual(landed, windowMs, maxDf, featureDim,
        codec),
      perceptualAudioFingerprints(incoming, windowMs, maxDf, featureDim,
        codec),
      incoming.filter(col("kind") === "audio")
        .select(col("media_id")).distinct(),
      minJaccardPpm)

  /** [[videoNearDup]] over PERCEPTUAL frame fingerprints — catches
    * re-encodes and brightness shifts of the same footage, not just
    * bit-identical frames. Same df cap, same integer Jaccard, same
    * output columns. */
  def videoNearDupPerceptual(media: DataFrame, stride: Int = 10,
      maxDf: Int = 1000, minJaccardPpm: Long = 500000,
      featureDim: Int = 60, codec: ImageCodec = ImageIOCodec): DataFrame =
    fingerprintJaccardPairs(
      perceptualFrameFingerprints(media, stride, maxDf, "video",
        featureDim, codec), minJaccardPpm)

  /** The landed corpus's memoized PERCEPTUAL frame index (kind
    * "vid-pframes") — [[videoNearDupIncrementPerceptual]]'s landed
    * side; the real-codec twin of [[landedVideoFrames]]. */
  def landedVideoFramesPerceptual(landed: DataFrame, stride: Int = 10,
      maxDf: Int = 1000, featureDim: Int = 60,
      codec: ImageCodec = ImageIOCodec): DataFrame =
    graft.util.CacheRegistry.cache(
      graft.util.CacheRegistry.key(landed, "vid-pframes", stride, maxDf,
        featureDim, codec.getClass.getName),
      perceptualFrameFingerprints(landed, stride, maxDf, "video",
        featureDim, codec))

  /** [[videoNearDupIncrement]] over PERCEPTUAL fingerprints: an
    * incoming batch's re-encoded copies of landed footage verdict
    * `landed_dup` even when no frame is byte-identical. */
  def videoNearDupIncrementPerceptual(landed: DataFrame,
      incoming: DataFrame, stride: Int = 10, maxDf: Int = 1000,
      minJaccardPpm: Long = 500000, featureDim: Int = 60,
      codec: ImageCodec = ImageIOCodec): DataFrame =
    fingerprintIncrement(
      landedVideoFramesPerceptual(landed, stride, maxDf, featureDim, codec),
      perceptualFrameFingerprints(incoming, stride, maxDf, "video",
        featureDim, codec),
      incoming.filter(col("kind") === "video")
        .select(col("media_id")).distinct(),
      minJaccardPpm)

  /** The landed corpus's memoized frame-fingerprint index (kind
    * "vid-frames") — [[videoNearDupIncrement]]'s landed side, one
    * narrow row per sampled landed frame, reused batch over batch with
    * ZERO landed re-sampling (the video cell of the incremental
    * matrix). The df cap is WITHIN the landed corpus: the artifact
    * must be batch-independent or it could not be landed state. */
  def landedVideoFrames(landed: DataFrame, stride: Int = 10,
      maxDf: Int = 1000): DataFrame =
    graft.util.CacheRegistry.cache(
      graft.util.CacheRegistry.key(landed, "vid-frames", stride, maxDf),
      frameFingerprints(landed, stride, maxDf, "video"))

  /** The landed corpus's memoized audio window-fingerprint index (kind
    * "aud-windows") — [[audioNearDupIncrement]]'s landed side, the
    * audio twin of [[landedVideoFrames]]. */
  def landedAudioWindows(landed: DataFrame, stride: Int = 10,
      maxDf: Int = 1000): DataFrame =
    graft.util.CacheRegistry.cache(
      graft.util.CacheRegistry.key(landed, "aud-windows", stride, maxDf),
      frameFingerprints(landed, stride, maxDf, "audio"))

  /** Append-only video near-dup — the video family's incremental cell:
    * a batch samples + fingerprints only ITS OWN frames, probes the
    * memoized landed index through the shared-fingerprint join, and
    * verdicts land on the family lattice ([[incrementVerdicts]]):
    * ≥-threshold similar to some landed video → `landed_dup`;
    * otherwise CC over verified batch-batch pairs → `batch_dup` for
    * non-representatives; else `keep`. The threshold test is one
    * integer cross-check (inter·1e6 div union ≥ ppm) on the capped
    * frame-set sizes, the one-shot face's exact arithmetic.
    *
    * Scale: per batch = batch frames (explode + two narrow windows) +
    * one fingerprint-keyed join against the landed index — the landed
    * corpus is never re-decoded or re-sampled; cost follows batch
    * size, not landed size. Output: (media_id, verdict), one row per
    * incoming VIDEO (uncapped universe — totality). */
  def videoNearDupIncrement(landed: DataFrame, incoming: DataFrame,
      stride: Int = 10, maxDf: Int = 1000,
      minJaccardPpm: Long = 500000): DataFrame =
    fingerprintIncrement(
      landedVideoFrames(landed, stride, maxDf),
      frameFingerprints(incoming, stride, maxDf, "video"),
      incoming.filter(col("kind") === "video")
        .select(col("media_id")).distinct(),
      minJaccardPpm)

  /** Append-only audio near-dup — the audio cell of the incremental
    * matrix, [[videoNearDupIncrement]]'s contract verbatim over window
    * fingerprints: a batch samples only ITS OWN windows, probes the
    * memoized landed index, verdicts on the family lattice. */
  def audioNearDupIncrement(landed: DataFrame, incoming: DataFrame,
      stride: Int = 10, maxDf: Int = 1000,
      minJaccardPpm: Long = 500000): DataFrame =
    fingerprintIncrement(
      landedAudioWindows(landed, stride, maxDf),
      frameFingerprints(incoming, stride, maxDf, "audio"),
      incoming.filter(col("kind") === "audio")
        .select(col("media_id")).distinct(),
      minJaccardPpm)

  /** The shared incremental core of the time-sliced modalities:
    * side-tagged shared-fingerprint candidates, integer-Jaccard
    * verification, then the family verdict lattice
    * ([[incrementVerdicts]]). `lf`/`bf` are capped fingerprint tables
    * (landed memoized, batch fresh); `universe` = every incoming id
    * owed a verdict. */
  private def fingerprintIncrement(lf: DataFrame, bf: DataFrame,
      universe: DataFrame, minJaccardPpm: Long): DataFrame = {
    val all = bf.select(col("media_id"), col("fp"), col("sz"),
        lit("batch").as("src"))
      .unionByName(lf.select(col("media_id"), col("fp"), col("sz"),
        lit("landed").as("src")))
    val verified = bf.select(col("media_id").as("a_id"), col("fp"),
        col("sz").as("a_sz"))
      .join(all.select(col("media_id").as("b_id"), col("fp"),
        col("sz").as("b_sz"), col("src").as("side")), "fp")
      .filter(col("side") === "landed" || col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id", "side")
      .agg(count(lit(1)).as("inter"),
        min("a_sz").as("a_sz"), min("b_sz").as("b_sz"))
      .filter(expr(
        s"inter * 1000000 div (a_sz + b_sz - inter) >= $minJaccardPpm"))
      .select("a_id", "b_id", "side")
      .localCheckpoint(true) // single-node caveat as the image face
    incrementVerdicts(verified, universe)
  }
}
