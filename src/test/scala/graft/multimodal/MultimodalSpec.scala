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
}
