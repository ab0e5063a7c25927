package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Images/audio/video are opaque `binary` columns with typed metadata
  * (mime, dims, duration). Decode is REAL for every modality this
  * container can carry without external deps: IMAGES via the JDK's
  * bundled `javax.imageio` (PNG/JPEG/GIF/BMP — [[decodeImage]],
  * [[imageStats]]), AUDIO via `javax.sound.sampled` (WAVE/AIFF/AU
  * signed-PCM16 — [[decodeAudio]], [[audioStats]]), and VIDEO as a
  * chunk-walking PNG-frame demux + per-frame ImageIO decode
  * ([[pngFrames]], [[videoFrameStats]]). Only compressed codecs
  * (JPEG2000, MP3, H.264, …) need external libraries; swapping those
  * in replaces one decode call without touching the plumbing.
  *
  * Scale notes: everything is a map-only pass (no shuffle); binaries
  * stay in the executors (never collected); `decodeBatched` amortizes
  * per-batch setup (model load, codec init) exactly like a Pandas-UDF
  * `mapInPandas` batch would.
  */
object Multimodal {

  /** Asset schema: the typed-metadata shape for opaque media columns. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Lift a text column into the asset shape (payload = UTF-8 bytes) —
    * the stand-in corpus for the binary pipeline in this offline
    * container. */
  def assetify(df: DataFrame, idCol: String, textCol: String,
               mime: String = "application/octet-stream"): DataFrame =
    df.select(col(idCol).cast("long").as("asset_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit(mime).as("mime"),
      lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))

  /** Deterministic fake features from a BINARY payload: seeded xxhash
    * mixes — the STUB for a real embedding/decode model. Expression-only
    * (codegen'd). */
  def fakeBinaryFeatures(payload: Column, n: Int): Column =
    array((0 until n).map(i =>
      (pmod(xxhash64(payload, lit(i)), lit(1000L)).cast("double") / 1000.0)): _*)

  /** Deterministic fake features from a TEXT column — ascii-mix formula
    * (engine-portable, used by the oracle-checked `mm_features`
    * query). */
  def fakeTextFeatures(text: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)), i =>
      ((ascii(text.substr(i * lit(5) + lit(1), lit(1))) * lit(31) +
        (i + lit(1)) * lit(7)) % lit(997)) / lit(997.0))

  /** Frame sampling: slice the payload into fixed-size "frames" at a
    * stride — the plumbing shape of video frame extraction. Returns
    * `array<binary>`; `substring` on binary is byte-addressed. */
  def frameSample(payload: Column, frameBytes: Int, stride: Int, maxFrames: Int): Column = {
    val total = length(payload)
    val n = least(ceil((total.cast("double")) / stride).cast("int"), lit(maxFrames))
    transform(sequence(lit(0), n - 1), i =>
      payload.substr(i * stride + 1, lit(frameBytes)))
  }

  /** "Resize": in the stub, re-stamp the metadata and truncate the
    * payload proportionally — keeps the schema contract of a real
    * resize. Superseded by the REAL [[resizeImage]]/[[resizeImages]]
    * decode-resample-reencode path; kept for the metadata-only shape. */
  def resizeStub(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("width", lit(w)).withColumn("height", lit(h))
      .withColumn("payload", col("payload").substr(lit(1), least(length(col("payload")), lit(w * h))))

  /** REAL image resize: ImageIO decode → nearest-neighbor resample →
    * PNG re-encode. Nearest-neighbor with the floor mapping
    * `src = out * in / outDim` (integer division) is chosen over
    * bilinear deliberately: every output pixel is an EXACT copy of a
    * source pixel, so the resized image's stats are closed-form
    * replayable by the cross-engine oracle (bilinear's rounding is
    * library-private). Returns None for undecodable payloads. */
  def resizeImage(bytes: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] = {
    require(outW > 0 && outH > 0, s"resize dims must be positive: $outW x $outH")
    if (bytes == null || bytes.isEmpty) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      val out = new java.awt.image.BufferedImage(outW, outH,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < outH) {
        val sy = y * h / outH
        var x = 0
        while (x < outW) {
          out.setRGB(x, y, img.getRGB(x * w / outW, sy) & 0xffffff)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      Some(bos.toByteArray)
    } catch { case _: Exception => None }
  }

  /** Distributed resize pass (same batched `mapInPandas` shape as
    * [[imageStats]]): map-only, binaries never leave the executors,
    * undecodable payloads keep their row with `ok = false` and a null
    * payload. Output: (asset_id, ok, payload). */
  def resizeImages(df: DataFrame, outW: Int, outH: Int,
                   batchSize: Int = 64): DataFrame = {
    val out = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    df.select(col("asset_id"), col("payload"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch init slot (codec warmup) — ImageIO is stateless
          batch.map { r =>
            val id = r.getLong(0)
            val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
            resizeImage(bytes, outW, outH) match {
              case Some(p) => Row(id, true, p)
              case None => Row(id, false, null)
            }
          }
        }
      }(enc)
  }

  /** Batched per-partition decode — the `mapInPandas` analogue. Image
    * payloads get a REAL ImageIO decode (feature = mean luminance in
    * [0,1]); audio payloads a REAL PCM decode (feature = RMS amplitude
    * in [0,1]); anything else falls back to a deterministic byte-hash
    * feature (documented fallback — compressed codecs don't ship in
    * the JDK). The batching shape (iterate a partition in `batchSize`
    * groups, amortizing per-batch init) is the contract a model call
    * plugs into. Output: (asset_id, n_bytes, feature). */
  def decodeBatched(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val out = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("feature", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    df.select(col("asset_id"), col("payload"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch init would happen here (codec/model load)
          batch.map { r =>
            val id = r.getLong(0)
            val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
            val feature = decodeImage(bytes) match {
              case Some(s) => (s.meanR + s.meanG + s.meanB) / (3.0 * 255.0)
              case None => decodeAudio(bytes) match {
                case Some(a) => a.rms
                case None => fallbackFeature(bytes)
              }
            }
            Row(id, bytes.length, feature)
          }
        }
      }(enc)
  }

  /** FALLBACK feature for payloads neither ImageIO nor the PCM decoder
    * accept (text stand-ins, compressed codecs): a deterministic byte
    * hash — a real deployment swaps this for the appropriate codec +
    * model call. */
  private def fallbackFeature(bytes: Array[Byte]): Double = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    (math.floorMod(h, 1000L)).toDouble / 1000.0
  }

  /** Decoded image shape + exact per-channel pixel means. */
  final case class ImageStats(width: Int, height: Int, channels: Int,
                              meanR: Double, meanG: Double, meanB: Double)

  /** REAL image decode via the JDK's bundled ImageIO (PNG/JPEG/GIF/BMP
    * — no external dependency). Returns None for null/empty/undecodable
    * payloads. Means are over the 8-bit RGB projection; for lossless
    * formats (PNG/BMP) they are exact, which is what makes them
    * oracle-checkable cross-engine. */
  def decodeImage(bytes: Array[Byte]): Option[ImageStats] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Some(ImageStats(w, h, img.getColorModel.getNumComponents,
          sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
      }
    } catch { case _: Exception => None }
  }

  /** Distributed image-stats pass: batched per-partition ImageIO decode
    * (same `mapInPandas` shape as [[decodeBatched]]), map-only, binaries
    * never leave the executors. Undecodable payloads keep their row with
    * `ok = false` and null stats — corrupt media must be countable, not
    * silently dropped. Output: (asset_id, ok, width, height, channels,
    * mean_r, mean_g, mean_b). */
  def imageStats(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val out = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("mean_r", DoubleType, nullable = true),
      StructField("mean_g", DoubleType, nullable = true),
      StructField("mean_b", DoubleType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    df.select(col("asset_id"), col("payload"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch init slot (codec warmup) — ImageIO is stateless
          batch.map { r =>
            val id = r.getLong(0)
            val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
            decodeImage(bytes) match {
              case Some(s) =>
                Row(id, true, s.width, s.height, s.channels, s.meanR, s.meanG, s.meanB)
              case None => Row(id, false, null, null, null, null, null, null)
            }
          }
        }
      }(enc)
  }

  /** Perceptual difference hash (dHash — the public
    * gradient-direction perceptual hash): decode, reduce to a 9×8
    * GRAYSCALE grid by exact integer block sums (NOT AWT interpolated
    * scaling, whose output is renderer-dependent — block sums are
    * bit-reproducible on any JVM and replayable in SQL), then 64 bits
    * of horizontal gradient: bit (j·8+i) set iff cell(i,j) averages
    * darker than cell(i+1,j). Per-pixel gray is the integer Rec.601
    * luma `(299r + 587g + 114b) / 1000`; the cell comparison
    * cross-multiplies sums by block sizes so no division ever happens
    * — exact, engine-portable arithmetic end to end.
    *
    * Near-identical images (recompression, resize artifacts, tiny
    * edits) land within a few bits; unrelated images differ in ~32 —
    * the image analogue of SimHash, and [[imageNearDups]] reuses
    * exactly that banding machinery. */
  def dHash(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < 9 || img.getHeight < 8) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sums = Array.ofDim[Long](9, 8)
        val counts = Array.ofDim[Long](9, 8)
        var y = 0
        while (y < h) {
          val j = y * 8 / h
          var x = 0
          while (x < w) {
            val i = x * 9 / w
            val p = img.getRGB(x, y)
            val gray = (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
              114 * (p & 0xff)) / 1000
            sums(i)(j) += gray
            counts(i)(j) += 1
            x += 1
          }
          y += 1
        }
        var hash = 0L
        var j = 0
        while (j < 8) {
          var i = 0
          while (i < 8) {
            // avg(i) < avg(i+1)  ⇔  sum(i)·n(i+1) < sum(i+1)·n(i)
            if (sums(i)(j) * counts(i + 1)(j) < sums(i + 1)(j) * counts(i)(j))
              hash |= 1L << (j * 8 + i)
            i += 1
          }
          j += 1
        }
        Some(hash)
      }
    } catch { case _: Exception => None }
  }

  /** Distributed dHash pass — same batched map-only shape as
    * [[imageStats]] (binaries never leave the executors; undecodable
    * or sub-9×8 payloads keep their row with `ok = false`). Output:
    * (asset_id, ok, dhash). */
  def imageDHashes(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val out = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("dhash", LongType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    df.select(col("asset_id"), col("payload"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
            dHash(bytes) match {
              case Some(hs) => Row(r.getLong(0), true, hs)
              case None => Row(r.getLong(0), false, null)
            }
          }
        }
      }(enc)
  }

  /** Perceptual image near-dup pairs: dHash fingerprints through the
    * SAME banded Hamming machinery as text SimHash
    * ([[graft.llm.Dedup.hammingNearDups]] — 4×16-bit chunk buckets,
    * caps, exact verify; no all-pairs join). Returns
    * (a, b, hamming). */
  def imageNearDups(df: DataFrame, maxHamming: Int = 3,
                    maxBucket: Int = 1000, batchSize: Int = 64): DataFrame =
    graft.llm.Dedup.hammingNearDups(
      imageDHashes(df, batchSize).where(col("ok"))
        .select(col("asset_id").as("doc_id"), col("dhash").as("fp")),
      maxHamming, maxBucket)

  /** Decoded audio shape + amplitude stats. Amplitudes are normalized
    * to [0,1] against the PCM16 full scale (32768). */
  final case class AudioStats(sampleRate: Int, channels: Int, nSamples: Long,
                              durationMs: Long, meanAbs: Double, rms: Double)

  /** REAL audio decode via the JDK's bundled `javax.sound.sampled`
    * (WAVE/AIFF/AU containers, signed PCM16 payloads — no external
    * dependency). Returns None for null/empty/undecodable payloads and
    * for encodings this offline container can't carry (compressed
    * codecs would need external libs — that swap point is the only
    * thing a production deployment changes). PCM is lossless, so the
    * amplitude sums are exact integers and the derived means are
    * oracle-checkable cross-engine (same IEEE division/sqrt order). */
  def decodeAudio(bytes: Array[Byte]): Option[AudioStats] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        return None
      val raw = ais.readAllBytes()
      val n = raw.length / 2
      if (n == 0) return None
      val little = !fmt.isBigEndian
      var sumAbs = 0L; var sumSq = 0L
      var i = 0
      while (i < n) {
        val s =
          if (little) (raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)
          else (raw(2 * i) << 8) | (raw(2 * i + 1) & 0xff)
        sumAbs += math.abs(s.toLong); sumSq += s.toLong * s
        i += 1
      }
      val ch = fmt.getChannels
      val frames = n / ch
      Some(AudioStats(fmt.getSampleRate.toInt, ch, n.toLong,
        frames * 1000L / fmt.getSampleRate.toLong,
        sumAbs.toDouble / n / 32768.0,
        math.sqrt(sumSq.toDouble / n) / 32768.0))
    } catch { case _: Exception => None }
  }

  /** Audio energy-gradient hash — the audio analogue of [[dHash]]:
    * decode PCM16, cut the sample stream into 65 blocks by the same
    * integer indexing (`block = i·65/n`), sum |amplitude| per block
    * (exact integers), 64 bits of energy gradient (bit k set iff
    * block k's mean |amplitude| < block k+1's, compared by
    * cross-multiplied sums — no division, engine-portable).
    * Re-encodes and level-preserving container changes keep the hash;
    * unrelated audio differs in ~32 bits; near-dups route through the
    * SAME banded Hamming machinery as image/text fingerprints.
    * Streams shorter than 65 samples have no gradient — None. */
  def audioHash(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        return None
      val raw = ais.readAllBytes()
      val n = raw.length / 2
      if (n < 65) return None
      val little = !fmt.isBigEndian
      val sums = new Array[Long](65)
      val counts = new Array[Long](65)
      var i = 0
      while (i < n) {
        val s =
          if (little) (raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)
          else (raw(2 * i) << 8) | (raw(2 * i + 1) & 0xff)
        val b = (i.toLong * 65 / n).toInt
        sums(b) += math.abs(s.toLong)
        counts(b) += 1
        i += 1
      }
      var hash = 0L
      var k = 0
      while (k < 64) {
        if (sums(k) * counts(k + 1) < sums(k + 1) * counts(k))
          hash |= 1L << k
        k += 1
      }
      Some(hash)
    } catch { case _: Exception => None }
  }

  /** Distributed [[audioHash]] pass (same shape as [[imageDHashes]]):
    * (asset_id, ok, ahash). */
  def audioHashes(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val out = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("ahash", LongType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    df.select(col("asset_id"), col("payload"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
            audioHash(bytes) match {
              case Some(hs) => Row(r.getLong(0), true, hs)
              case None => Row(r.getLong(0), false, null)
            }
          }
        }
      }(enc)
  }

  /** Per-frame perceptual hashes of a demuxed video (frames via
    * [[pngFrames]], hash via [[dHash]]); frameless payloads emit one
    * `ok = false` row (countable, not dropped). Output:
    * (asset_id, frame_idx, ok, dhash). */
  def videoDHashes(df: DataFrame, maxFrames: Int = 64,
                   batchSize: Int = 16): DataFrame = {
    val out = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("dhash", LongType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    df.select(col("asset_id"), col("payload"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { r =>
            val id = r.getLong(0)
            val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
            val frames = pngFrames(bytes, maxFrames)
            if (frames.isEmpty) Seq(Row(id, -1, false, null))
            else frames.zipWithIndex.map { case (fb, idx) =>
              dHash(fb) match {
                case Some(hs) => Row(id, idx, true, hs)
                case None => Row(id, idx, false, null)
              }
            }
          }
        }
      }(enc)
  }

  /** Video near-dup pairs by SHARED FRAME content: two videos pair
    * when ≥ `minShared` distinct frame dHashes coincide (clips,
    * re-encodes, frame-reordered copies all keep their frame hashes).
    * Shape: per-video distinct hash set → hash-keyed buckets (ids
    * only, capped at `maxBucket` — a hash shared by thousands of
    * videos is stock-footage noise, not a dup signal) → within-bucket
    * pairs → count per pair. One aggregation per stage, no all-pairs
    * join. Returns (a, b, n_shared). */
  def videoNearDups(df: DataFrame, minShared: Int = 2, maxFrames: Int = 64,
                    maxBucket: Int = 1000, batchSize: Int = 16): DataFrame = {
    val fh = videoDHashes(df, maxFrames, batchSize)
      .where(col("ok"))
      .select(col("asset_id"), col("dhash")).distinct()
    val buckets = fh.groupBy(col("dhash"))
      .agg(sort_array(collect_list(col("asset_id"))).as("ms"))
      .where(size(col("ms")).between(2, maxBucket))
    buckets.select(explode(flatten(
        transform(col("ms"), (m, i) =>
          transform(slice(col("ms"), i + 2, size(col("ms"))),
            other => struct(m.as("a"), other.as("b")))))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).cast("long").as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Distributed audio-stats pass: batched per-partition PCM decode,
    * same map-only / binaries-stay-on-executors shape as [[imageStats]].
    * Undecodable payloads keep their row with `ok = false` and null
    * stats. Output: (asset_id, ok, sample_rate, channels, n_samples,
    * duration_ms, mean_abs, rms). */
  def audioStats(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val out = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("n_samples", LongType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("mean_abs", DoubleType, nullable = true),
      StructField("rms", DoubleType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    df.select(col("asset_id"), col("payload"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch init slot (codec warmup) — javax.sound is stateless
          batch.map { r =>
            val id = r.getLong(0)
            val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
            decodeAudio(bytes) match {
              case Some(s) => Row(id, true, s.sampleRate, s.channels,
                s.nSamples, s.durationMs, s.meanAbs, s.rms)
              case None => Row(id, false, null, null, null, null, null, null)
            }
          }
        }
      }(enc)
  }

  /** Deterministic synthetic mono PCM16 WAV: sample i of asset `id` is
    * `((i*2653 + id*7919) mod 65536) - 32768`, so amplitude sums are
    * computable in closed form by any engine (the `mm_audio_stats`
    * oracle replays them in SQL). Encoded through AudioSystem itself,
    * so the round-trip exercises the real WAVE writer and reader. */
  def syntheticWav(id: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (math.floorMod(i.toLong * 2653 + id * 7919, 65536L) - 32768L).toInt
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic synthetic RGB PNG: channel values are linear mixes
    * of (x, y, id) mod 256, so per-channel means are computable in
    * closed form by any engine (the `mm_image_stats` oracle replays
    * them in SQL). PNG is lossless — decode recovers the exact pixels. */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((x * 7 + y * 13 + id * 31) % 256).toInt
        val g = ((x * 11 + y * 3 + id * 17) % 256).toInt
        val b = ((x * 5 + y * 19 + id * 23) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val PngMagic: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Container demux for the concatenated-PNG "video" format: walk each
    * PNG's chunk structure (4-byte big-endian length + type + data +
    * CRC) to its IEND boundary — frames are variable-length, so
    * fixed-stride [[frameSample]] can't cut them, and signature
    * scanning would mis-split if compressed data contained the magic.
    * Bounded by `maxFrames`. A truncated/corrupt tail is emitted as a
    * final frame (it decodes to an `ok = false` row downstream — corrupt
    * media stays countable); a payload not starting with the PNG magic
    * yields no frames. */
  def pngFrames(bytes: Array[Byte], maxFrames: Int): Seq[Array[Byte]] = {
    if (bytes == null) return Nil
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    var halt = false
    while (!halt && frames.length < maxFrames && pos + PngMagic.length <= bytes.length &&
           (0 until PngMagic.length).forall(m => bytes(pos + m) == PngMagic(m))) {
      var p = pos + PngMagic.length
      var end = -1
      var ok = true
      while (end < 0 && ok) {
        if (p + 8 > bytes.length) ok = false
        else {
          val len = ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
                    ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
          val isEnd = bytes(p + 4) == 'I' && bytes(p + 5) == 'E' &&
                      bytes(p + 6) == 'N' && bytes(p + 7) == 'D'
          // Long boundary: an adversarial len near 2^31 overflows Int
          // arithmetic to a negative `next` that slips both guards.
          val next = p.toLong + 12L + len.toLong
          if (len < 0 || next > bytes.length) ok = false
          else { if (isEnd) end = next.toInt; p = next.toInt }
        }
      }
      if (!ok) {
        frames += java.util.Arrays.copyOfRange(bytes, pos, bytes.length)
        halt = true
      } else {
        frames += java.util.Arrays.copyOfRange(bytes, pos, end)
        pos = end
      }
    }
    frames.toSeq
  }

  /** Deterministic synthetic "video": `nFrames` concatenated
    * [[syntheticPng]] frames whose per-frame pixel formulas are seeded
    * by `id * 100 + frameIdx` — per-frame channel means stay
    * closed-form for the `mm_video_frames` oracle. */
  def syntheticVideo(id: Long, nFrames: Int, w: Int, h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) { bos.write(syntheticPng(id * 100 + f, w, h)); f += 1 }
    bos.toByteArray
  }

  /** Distributed per-frame video decode: demux each payload into PNG
    * frames ([[pngFrames]]), then REAL-decode every frame via ImageIO —
    * the frame-sampling + decode composite a video pipeline needs.
    * Map-only (one input row expands to its frame rows inside the
    * executor; binaries never leave it). Undecodable frames keep their
    * row with `ok = false`; payloads with no frames emit a single
    * `frame_idx = -1, ok = false` row so corrupt media stays countable.
    * Output: (asset_id, frame_idx, ok, width, height, mean_r, mean_g,
    * mean_b). */
  def videoFrameStats(df: DataFrame, maxFrames: Int = 64,
                      batchSize: Int = 16): DataFrame = {
    val out = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("mean_r", DoubleType, nullable = true),
      StructField("mean_g", DoubleType, nullable = true),
      StructField("mean_b", DoubleType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    df.select(col("asset_id"), col("payload"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch init slot (codec warmup) — ImageIO is stateless
          batch.flatMap { r =>
            val id = r.getLong(0)
            val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
            val frames = pngFrames(bytes, maxFrames)
            if (frames.isEmpty) Seq(Row(id, -1, false, null, null, null, null, null))
            else frames.zipWithIndex.map { case (fb, idx) =>
              decodeImage(fb) match {
                case Some(s) => Row(id, idx, true, s.width, s.height,
                  s.meanR, s.meanG, s.meanB)
                case None => Row(id, idx, false, null, null, null, null, null)
              }
            }
          }
        }
      }(enc)
  }
}
