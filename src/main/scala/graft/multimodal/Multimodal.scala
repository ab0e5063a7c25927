package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Images/audio/video are opaque `binary` columns with typed metadata
  * (mime, dims, duration). The Spark-side plumbing — schema, batched
  * per-partition decode shape, frame sampling, feature columns — is
  * real and tested; the actual media DECODE is a clearly-marked
  * deterministic STUB (`decodeStub`), because no image/audio libraries
  * ship in this container. A production deployment swaps `decodeStub`
  * for a real codec call without touching any of the surrounding
  * plumbing.
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

  /** Batched per-partition decode — the `mapInPandas` analogue. The
    * decode itself is the STUB `decodeOne`; the batching shape (iterate
    * a partition in `batchSize` groups, amortizing per-batch init) is
    * the real contract a codec/model call plugs into. Output:
    * (asset_id, n_bytes, feature). */
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
            Row(id, bytes.length, decodeOne(bytes))
          }
        }
      }(enc)
  }

  /** STUB decode: a real implementation would decode the media and run
    * a feature extractor; this deterministic fake keeps tests hermetic. */
  private def decodeOne(bytes: Array[Byte]): Double = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    (math.floorMod(h, 1000L)).toDouble / 1000.0
  }
}
