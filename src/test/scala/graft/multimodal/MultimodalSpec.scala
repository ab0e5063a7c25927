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

  test("resizeImage: nearest-neighbor output pixels are exact source copies") {
    val (w, h) = (12, 10)
    val bytes = Multimodal.syntheticPng(3L, w, h)
    val resized = Multimodal.resizeImage(bytes, 5, 4).get
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(img.getWidth == 5 && img.getHeight == 4)
    for (y <- 0 until 4; x <- 0 until 5) {
      val (sx, sy) = (x * w / 5, y * h / 4)
      val expected = (((sx * 7 + sy * 13 + 3 * 31) % 256) << 16) |
        (((sx * 11 + sy * 3 + 3 * 17) % 256) << 8) |
        ((sx * 5 + sy * 19 + 3 * 23) % 256)
      assert((img.getRGB(x, y) & 0xffffff) == expected)
    }
    // undecodable and degenerate inputs
    assert(Multimodal.resizeImage("nope".getBytes, 5, 4).isEmpty)
    assert(Multimodal.resizeImage(null, 5, 4).isEmpty)
    intercept[IllegalArgumentException](Multimodal.resizeImage(bytes, 0, 4))
    // upscale works too (source pixels repeat)
    val up = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.resizeImage(bytes, 24, 10).get))
    assert(up.getWidth == 24 && (up.getRGB(0, 0) & 0xffffff) ==
      (up.getRGB(1, 0) & 0xffffff))
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

  test("decodeAudio: exact rate/length/amplitude stats from a synthetic WAV") {
    val n = 1000
    val wav = Multimodal.syntheticWav(7L, 8000, n)
    val a = Multimodal.decodeAudio(wav).get
    assert(a.sampleRate == 8000 && a.channels == 1 && a.nSamples == n)
    assert(a.durationMs == n * 1000L / 8000L)
    // PCM is lossless: stats must equal the closed-form sample sums
    var sumAbs = 0L; var sumSq = 0L
    for (i <- 0 until n) {
      val s = math.floorMod(i.toLong * 2653 + 7L * 7919, 65536L) - 32768L
      sumAbs += math.abs(s); sumSq += s * s
    }
    assert(a.meanAbs == sumAbs.toDouble / n / 32768.0)
    assert(a.rms == math.sqrt(sumSq.toDouble / n) / 32768.0)
  }

  test("dHash: deterministic, robust to re-encode + tiny edits, size-gated") {
    import graft.multimodal.Multimodal
    val png = Multimodal.syntheticPng(3L, 18, 16)
    val h1 = Multimodal.dHash(png).get
    // decode -> re-encode (lossless) -> identical hash
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(Multimodal.dHash(bos.toByteArray).get == h1)
    // one-pixel edit moves at most a couple of gradient bits
    val img2 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    img2.setRGB(0, 0, img2.getRGB(0, 0) ^ 0x0F)
    val bos2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img2, "png", bos2)
    val h2 = Multimodal.dHash(bos2.toByteArray).get
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 2)
    // different patterns are FAR apart
    val hOther = Multimodal.dHash(Multimodal.syntheticPng(7L, 18, 16)).get
    assert(java.lang.Long.bitCount(h1 ^ hOther) > 10)
    // gates: sub-9x8, corrupt, empty, null
    assert(Multimodal.dHash(Multimodal.syntheticPng(1L, 6, 5)).isEmpty)
    assert(Multimodal.dHash("junk".getBytes).isEmpty)
    assert(Multimodal.dHash(Array.emptyByteArray).isEmpty)
    assert(Multimodal.dHash(null).isEmpty)
    // the distributed near-dup pass recovers a perturbed copy within
    // the banded Hamming threshold
    val rows = ((0L until 6L).map(id =>
        (id, Multimodal.syntheticPng(id, 18, 16))) :+ ((1003L, bos2.toByteArray)))
    val df = spark.createDataFrame(rows).toDF("asset_id", "payload")
    val pairs = Multimodal.imageNearDups(df)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(pairs == Set((3L, 1003L)))
  }

  test("audioHash / videoNearDups: gradient hash stability, shared-frame pairs") {
    import graft.multimodal.Multimodal
    val wav = Multimodal.syntheticWav(5L, 8000, 520)
    val h1 = Multimodal.audioHash(wav).get
    // container round-trip (decode -> re-encode WAVE) keeps the hash
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    assert(Multimodal.audioHash(bos.toByteArray).get == h1)
    // different source audio is far away
    val h2 = Multimodal.audioHash(Multimodal.syntheticWav(9L, 8000, 520)).get
    assert(java.lang.Long.bitCount(h1 ^ h2) > 10)
    // gates
    assert(Multimodal.audioHash(Multimodal.syntheticWav(1L, 8000, 40)).isEmpty)
    assert(Multimodal.audioHash("junk".getBytes).isEmpty)
    assert(Multimodal.audioHash(null).isEmpty)
    // videoNearDups: a clip sharing ONE frame stays below minShared=2
    def video(ids: Seq[Long]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      ids.foreach(f => b.write(Multimodal.syntheticPng(f, 18, 16)))
      b.toByteArray
    }
    val df = spark.createDataFrame(Seq(
      (0L, video(Seq(1L, 2L, 3L))),
      (1L, video(Seq(3L, 7L, 8L))),   // one shared frame: no pair
      (2L, video(Seq(2L, 3L, 9L))))   // two shared with v0: pair
    ).toDF("asset_id", "payload")
    val pairs = Multimodal.videoNearDups(df, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((0L, 2L, 2L)))
  }

  test("decodeAudio: corrupt, empty and null payloads return None") {
    assert(Multimodal.decodeAudio("junk bytes".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeAudio(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeAudio(null).isEmpty)
    assert(Multimodal.decodeAudio(
      Multimodal.syntheticWav(1L, 8000, 100).take(30)).isEmpty)
  }

  test("audioStats: distributed decode keeps non-audio rows with ok=false") {
    val df = Seq(
      (1L, Multimodal.syntheticWav(1L, 8000, 400)),
      (2L, Multimodal.syntheticWav(2L, 16000, 1600)),
      (3L, "not audio".getBytes("UTF-8"))
    ).toDF("asset_id", "payload").repartition(3)
    val rows = Multimodal.audioStats(df, batchSize = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.size == 3)
    assert(rows(1L).getBoolean(1) && rows(1L).getInt(2) == 8000 &&
      rows(1L).getLong(4) == 400 && rows(1L).getLong(5) == 50L)
    assert(rows(2L).getBoolean(1) && rows(2L).getInt(2) == 16000 &&
      rows(2L).getLong(5) == 100L)
    assert(!rows(3L).getBoolean(1) && rows(3L).isNullAt(2) && rows(3L).isNullAt(6))
  }

  test("decodeBatched: audio payloads route through the REAL PCM decode (RMS)") {
    val wav = Multimodal.syntheticWav(9L, 8000, 500)
    val a = Multimodal.decodeAudio(wav).get
    val df = Seq((9L, wav)).toDF("asset_id", "payload")
    val feature = Multimodal.decodeBatched(df).collect().head.getDouble(2)
    assert(feature == a.rms)
  }

  test("pngFrames: chunk-walking demux recovers exact frame boundaries") {
    val f0 = Multimodal.syntheticPng(100L, 8, 6)
    val f1 = Multimodal.syntheticPng(101L, 8, 6)
    val f2 = Multimodal.syntheticPng(102L, 8, 6)
    val video = f0 ++ f1 ++ f2
    val frames = Multimodal.pngFrames(video, maxFrames = 10)
    assert(frames.map(_.toSeq) == Seq(f0.toSeq, f1.toSeq, f2.toSeq))
    // maxFrames bounds the demux
    assert(Multimodal.pngFrames(video, maxFrames = 2).length == 2)
    // non-PNG payloads yield no frames; truncated tail emitted as-is
    assert(Multimodal.pngFrames("junk".getBytes("UTF-8"), 10).isEmpty)
    assert(Multimodal.pngFrames(null, 10).isEmpty)
    val truncated = Multimodal.pngFrames(video.dropRight(10), 10)
    assert(truncated.length == 3 && truncated(2).length < f2.length)
    // adversarial chunk header: len near 2^31 used to overflow the Int
    // boundary arithmetic to a negative offset that slipped both
    // guards and threw AIOOBE — corrupt media must stay countable
    // (the payload comes back as one corrupt-tail frame, no throw)
    val evil = java.util.Arrays.copyOf(f0, 32)
    evil(8) = 0x7f.toByte; evil(9) = 0xff.toByte   // chunk length
    evil(10) = 0xff.toByte; evil(11) = 0xf0.toByte // = 0x7FFFFFF0
    val evilFrames = Multimodal.pngFrames(evil, 10)
    assert(evilFrames.length == 1 && evilFrames.head.length == 32)
  }

  test("videoFrameStats: per-frame REAL decode; frameless payloads stay countable") {
    val df = Seq(
      (1L, Multimodal.syntheticVideo(1L, 2, 8, 6)),
      (2L, "not a video".getBytes("UTF-8"))
    ).toDF("asset_id", "payload").repartition(2)
    val rows = Multimodal.videoFrameStats(df).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r).toMap
    assert(rows.size == 3)
    val expected0 = Multimodal.decodeImage(Multimodal.syntheticPng(100L, 8, 6)).get
    val r0 = rows((1L, 0))
    assert(r0.getBoolean(2) && r0.getInt(3) == 8 && r0.getInt(4) == 6 &&
      r0.getDouble(5) == expected0.meanR)
    assert(rows((1L, 1)).getBoolean(2))
    val bad = rows((2L, -1))
    assert(!bad.getBoolean(2) && bad.isNullAt(3))
  }
}
