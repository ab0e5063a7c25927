package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def assets = Multimodal.assetify(
    Seq((1L, "hello multimodal world"), (2L, "short")).toDF("id", "text"),
    "id", "text")

  test("assetify produces the asset schema with UTF-8 payloads") {
    assert(assets.schema.fieldNames.toSeq ==
      Multimodal.assetSchema.fieldNames.toSeq)
    val bytes = assets.where(col("asset_id") === 1L)
      .select("payload").as[Array[Byte]].head()
    assert(new String(bytes, "UTF-8") == "hello multimodal world")
  }

  test("fakeBinaryFeatures: deterministic, n-dim, in [0,1)") {
    val f1 = assets.select(Multimodal.fakeBinaryFeatures(col("payload"), 8).as("f"))
      .as[Seq[Double]].collect()
    val f2 = assets.select(Multimodal.fakeBinaryFeatures(col("payload"), 8).as("f"))
      .as[Seq[Double]].collect()
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(v => v.size == 8 && v.forall(x => x >= 0 && x < 1)))
  }

  test("frameSample slices payload bytes at the stride") {
    val df = Seq(("0123456789".getBytes("UTF-8"))).toDF("payload")
    val frames = df.select(Multimodal.frameSample(col("payload"), 4, 4, 10).as("f"))
      .as[Seq[Array[Byte]]].head()
    assert(frames.map(new String(_, "UTF-8")) == Seq("0123", "4567", "89"))
  }

  test("decodeBatched emits (asset_id, n_bytes, feature) via mapPartitions") {
    val out = Multimodal.decodeBatched(assets).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(out.length == 2)
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 == "hello multimodal world".getBytes("UTF-8").length)
    assert(out.forall(t => t._3 >= 0.0 && t._3 < 1.0))
    // deterministic
    val again = Multimodal.decodeBatched(assets).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("resizeStub restamps metadata and bounds payload") {
    val out = Multimodal.resizeStub(assets, 2, 3)
    val r = out.where(col("asset_id") === 1L).collect().head
    assert(r.getAs[Int]("width") == 2 && r.getAs[Int]("height") == 3)
    assert(r.getAs[Array[Byte]]("payload").length <= 6)
  }

  test("decodeImage: exact dims + channel means from a synthetic PNG") {
    val (w, h) = (12, 10)
    val bytes = Multimodal.syntheticPng(3L, w, h)
    val s = Multimodal.decodeImage(bytes).get
    assert(s.width == w && s.height == h && s.channels == 3)
    // PNG is lossless: means must equal the closed-form pixel sums
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      sr += (x * 7 + y * 13 + 3 * 31) % 256
      sg += (x * 11 + y * 3 + 3 * 17) % 256
      sb += (x * 5 + y * 19 + 3 * 23) % 256
    }
    val n = (w * h).toDouble
    assert(s.meanR == sr / n && s.meanG == sg / n && s.meanB == sb / n)
  }

  test("decodeImage: corrupt, empty and null payloads return None") {
    assert(Multimodal.decodeImage("junk bytes".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
    // a truncated PNG (header only) must not throw either
    assert(Multimodal.decodeImage(
      Multimodal.syntheticPng(1L, 4, 4).take(20)).isEmpty)
  }

  test("imageStats: distributed decode keeps corrupt rows with ok=false") {
    val df = Seq(
      (1L, Multimodal.syntheticPng(1L, 8, 8)),
      (2L, Multimodal.syntheticPng(2L, 16, 4)),
      (3L, "not an image".getBytes("UTF-8"))
    ).toDF("asset_id", "payload").repartition(3)
    val rows = Multimodal.imageStats(df, batchSize = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.size == 3)
    assert(rows(1L).getBoolean(1) && rows(1L).getInt(2) == 8 && rows(1L).getInt(3) == 8)
    assert(rows(2L).getBoolean(1) && rows(2L).getInt(2) == 16 && rows(2L).getInt(3) == 4)
    assert(!rows(3L).getBoolean(1) && rows(3L).isNullAt(2) && rows(3L).isNullAt(5))
  }

  test("decodeBatched: image payloads get the REAL decode (mean luminance)") {
    val png = Multimodal.syntheticPng(5L, 8, 8)
    val s = Multimodal.decodeImage(png).get
    val df = Seq((5L, png)).toDF("asset_id", "payload")
    val feature = Multimodal.decodeBatched(df).collect().head.getDouble(2)
    assert(feature == (s.meanR + s.meanG + s.meanB) / (3.0 * 255.0))
  }
}
