package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Images/audio/video are opaque `binary` columns with typed metadata
  * (mime, dims, duration). IMAGE decode is REAL: PNG/JPEG/GIF/BMP via
  * the JDK's bundled `javax.imageio` ([[decodeImage]], [[imageStats]],
  * and the image path of [[decodeBatched]]) — width/height/channel
  * count and exact per-channel pixel means, no external dependency.
  * Audio/video decode remains a clearly-marked deterministic fallback
  * (no codec libraries ship in this container); a production deployment
  * swaps the fallback for a codec call without touching the
  * surrounding plumbing.
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
    * resize. */
  def resizeStub(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("width", lit(w)).withColumn("height", lit(h))
      .withColumn("payload", col("payload").substr(lit(1), least(length(col("payload")), lit(w * h))))

  /** Batched per-partition decode — the `mapInPandas` analogue. Image
    * payloads get a REAL ImageIO decode (feature = mean luminance in
    * [0,1]); non-image payloads fall back to a deterministic byte-hash
    * feature (documented fallback — audio/video codecs don't ship in
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
              case None => fallbackFeature(bytes)
            }
            Row(id, bytes.length, feature)
          }
        }
      }(enc)
  }

  /** FALLBACK feature for payloads ImageIO can't decode (text stand-ins,
    * audio/video): a deterministic byte hash — a real deployment swaps
    * this for the appropriate codec + model call. */
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
}
