package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PairsSpec extends SparkSpec {
  import spark.implicits._

  private val vOk = Seq(1.0f, 0.0f, 0.0f, 0.0f)
  private val vOrth = Seq(0.0f, 1.0f, 0.0f, 0.0f)
  private val enCap = "the quick brown fox jumps over the lazy dog again"

  private def pair(id: Long, payload: Array[Byte], caption: String,
                   txt: Seq[Float] = vOk) =
    (id, payload, caption, vOk, txt)

  private def png(id: Long, w: Int = 16, h: Int = 16) =
    Multimodal.syntheticPng(id, w, h)

  private def pairsDf(rows: Seq[(Long, Array[Byte], String, Seq[Float], Seq[Float])]) =
    rows.toDF("pair_id", "payload", "caption", "img_emb", "txt_emb")

  test("pairFilter: each gate drops exactly its violator") {
    val rows = Seq(
      pair(1L, png(1L), enCap),                        // survives
      pair(2L, png(2L, 4, 16), enCap),                 // too narrow
      pair(3L, png(3L, 48, 8), enCap),                 // aspect 6 > 3
      pair(4L, "junk".getBytes("UTF-8"), enCap),       // undecodable
      pair(5L, png(5L), "der und die das ist nicht"),  // not English
      pair(6L, png(6L), "two words"),                  // too short
      pair(7L, png(7L), enCap, vOrth))                 // cosine 0 < minAlign
    val kept = Pairs.pairFilter(pairsDf(rows),
        minWidth = 8, minHeight = 8, maxAspect = 3.0,
        langs = Seq("en"), minWords = 3, minAlign = 0.5)
      .select("pair_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("pairFilter: null embedding drops the pair (no no-signal keep)") {
    val rows = pairsDf(Seq(pair(1L, png(1L), enCap)))
      .unionByName(pairsDf(Seq(pair(2L, png(2L), enCap)))
        .withColumn("txt_emb", lit(null).cast("array<float>")))
    val kept = Pairs.pairFilter(rows, minAlign = 0.5, minWords = 3)
      .select("pair_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("pairFilter output carries the gate evidence columns") {
    val out = Pairs.pairFilter(pairsDf(Seq(pair(1L, png(1L), enCap))),
      minWords = 3, minAlign = 0.5)
    assert(out.columns.toSeq ==
      Seq("pair_id", "width", "height", "pred_lang", "n_words", "align"))
    val r = out.collect().head
    assert(r.getAs[Int]("width") == 16 && r.getAs[String]("pred_lang") == "en")
    assert(r.getAs[Double]("align") == 1.0)
  }

  test("audioPairFilter: duration, rate and decode gates each drop their violator") {
    def wav(id: Long, rate: Int = 8000, n: Int = 2000) =
      Multimodal.syntheticWav(id, rate, n)
    val rows = Seq(
      (1L, wav(1L), enCap, vOk, vOk),                   // survives (250 ms)
      (2L, wav(2L, n = 400), enCap, vOk, vOk),          // 50 ms: too short
      (3L, wav(3L, n = 80000), enCap, vOk, vOk),        // 10 s: too long
      (4L, wav(4L, rate = 4000), enCap, vOk, vOk),      // low sample rate
      (5L, "junk".getBytes("UTF-8"), enCap, vOk, vOk),  // undecodable
      (6L, wav(6L), enCap, vOk, vOrth))                 // misaligned
      .toDF("pair_id", "payload", "caption", "audio_emb", "txt_emb")
    val kept = Pairs.audioPairFilter(rows,
        minMs = 100, maxMs = 5000, minSampleRate = 8000,
        langs = Seq("en"), minWords = 3, minAlign = 0.5)
      .select("pair_id").as[Long].collect().toSet
    assert(kept == Set(1L))
    val r = Pairs.audioPairFilter(rows, minMs = 100, maxMs = 5000,
        minWords = 3, minAlign = 0.5)
      .where(col("pair_id") === 1L).collect().head
    assert(r.getAs[Int]("sample_rate") == 8000)
    assert(r.getAs[Long]("duration_ms") == 250L)
    assert(r.getAs[Double]("mean_abs") > 0.1) // synthetic signal, not silence
  }

  test("pairDedup: both sides must repeat; caption flip preserves the pair") {
    val rows = Seq(
      pair(1L, png(1L), enCap),
      pair(10L, png(1L), enCap),            // exact pair dup -> drops
      pair(11L, png(1L), "different text"), // same image, new caption -> kept
      pair(12L, png(2L), enCap),            // new image, same caption -> kept
      pair(100L, "junk".getBytes("UTF-8"), enCap)) // undecodable passes through
    val kept = Pairs.pairDedup(pairsDf(rows))
      .select("pair_id").as[Long].collect().toSet
    assert(kept == Set(1L, 11L, 12L, 100L))
    // image-only mode: the recaptioned copy collapses too
    val imgOnly = Pairs.pairDedup(pairsDf(rows), byCaption = false)
      .select("pair_id").as[Long].collect().toSet
    assert(imgOnly == Set(1L, 12L, 100L))
  }

  test("videoPairFilter: frame-count, resolution and decode gates") {
    def vid(id: Long, n: Int = 4, w: Int = 16) =
      Multimodal.syntheticVideo(id, n, w, 12)
    val rows = Seq(
      (1L, vid(1L), enCap, vOk, vOk),             // survives
      (2L, vid(2L, n = 1), enCap, vOk, vOk),      // too few frames
      (3L, vid(3L, w = 4), enCap, vOk, vOk),      // frames too narrow
      (4L, "junk".getBytes("UTF-8"), enCap, vOk, vOk), // undecodable
      (5L, vid(5L), enCap, vOk, vOrth))           // misaligned
      .toDF("pair_id", "payload", "caption", "video_emb", "txt_emb")
    val kept = Pairs.videoPairFilter(rows,
        minFrames = 2, minWidth = 8, minHeight = 8,
        langs = Seq("en"), minWords = 3, minAlign = 0.5)
      .select("pair_id").as[Long].collect().toSet
    assert(kept == Set(1L))
    val r = Pairs.videoPairFilter(rows, minFrames = 2, minWords = 3,
        minAlign = 0.5)
      .where(col("pair_id") === 1L).collect().head
    assert(r.getAs[Int]("n_frames") == 4 && r.getAs[Int]("width") == 16)
  }

  test("pairFunnel: monotone survival counts, one row per gate") {
    val rows = Seq(
      (1L, png(1L), enCap, vOk, vOk),
      (2L, "junk".getBytes("UTF-8"), enCap, vOk, vOk),
      (3L, png(3L), enCap, vOk, vOrth))
      .toDF("pair_id", "payload", "caption", "img_emb", "txt_emb")
    val f = Pairs.pairFunnel(rows, minWords = 3, minAlign = 0.5)
      .orderBy(col("stage_idx"))
      .select("stage", "n_pass").as[(String, Long)].collect().toSeq
    assert(f.map(_._1) ==
      Seq("input", "decode", "dims", "aspect", "lang", "words", "align"))
    assert(f.map(_._2) == f.map(_._2).sorted.reverse) // monotone funnel
    assert(f.head._2 == 3L && f.last._2 == 1L)
    assert(f(1)._2 == 2L) // the corrupt payload dies at decode
  }

  test("interleaveImages: best own-doc chunk wins; per-chunk cap holds") {
    val e1 = Seq(1.0f, 0.0f, 0.0f)
    val e2 = Seq(0.0f, 1.0f, 0.0f)
    val near2 = Seq(0.1f, 1.0f, 0.0f)
    val chunks = Seq(
      (1L, 0L, e1), (1L, 1L, e2),
      (2L, 0L, e2)) // doc 2 has an e2 chunk an own-doc image must prefer
      .toDF("doc_id", "chunk_idx", "chunk_emb")
    val images = Seq(
      (10L, 1L, e2),     // doc 1: lands on chunk 1
      (11L, 1L, near2),  // doc 1: also best at chunk 1, lower sim
      (12L, 2L, e1))     // doc 2: only chunk 0 available (own doc only)
      .toDF("asset_id", "doc_id", "img_emb")
    val out = Pairs.interleaveImages(chunks, images, maxPerChunk = 1)
      .select("doc_id", "chunk_idx", "asset_id")
      .as[(Long, Long, Long)].collect().toSet
    // asset 10 wins chunk (1,1); asset 11 loses the cap and is dropped
    // (greedy, no respill); asset 12 stays inside its own doc
    assert(out == Set((1L, 1L, 10L), (2L, 0L, 12L)))
    val capped2 = Pairs.interleaveImages(chunks, images, maxPerChunk = 2)
      .select("asset_id").as[Long].collect().toSet
    assert(capped2 == Set(10L, 11L, 12L))
  }

  test("decontaminatePairs: benchmark re-encodes flagged, rest untouched") {
    val pairs = Seq(
      (1L, png(1L), enCap, vOk, vOk),
      (2L, png(2L), enCap, vOk, vOk),
      (100L, "junk".getBytes("UTF-8"), enCap, vOk, vOk))
      .toDF("pair_id", "payload", "caption", "img_emb", "txt_emb")
    val bench = Seq((9000L, png(2L))).toDF("asset_id", "payload")
    val kept0 = Pairs.decontaminatePairs(pairs, bench, maxHamming = 0)
      .select("pair_id").as[Long].collect().toSet
    assert(kept0 == Set(1L, 100L)) // exact perceptual match dropped
    val kept3 = Pairs.decontaminatePairs(pairs, bench, maxHamming = 3)
      .select("pair_id").as[Long].collect().toSet
    assert(kept3 == Set(1L, 100L)) // hamming-0 match still within 3
    // input columns preserved for survivors
    assert(Pairs.decontaminatePairs(pairs, bench).columns.toSet ==
      Set("pair_id", "payload", "caption", "img_emb", "txt_emb"))
  }

  test("hardNegatives: nearest other image by text cosine, self excluded") {
    val e1 = Seq(1.0f, 0.0f, 0.0f)
    val e2 = Seq(0.9f, 0.1f, 0.0f)  // close to e1
    val e3 = Seq(0.0f, 0.0f, 1.0f)  // orthogonal-ish
    val pairs = Seq(
      (1L, e1, e1), (2L, e2, e2), (3L, e3, e3))
      .toDF("pair_id", "img_emb", "txt_emb")
    val negs = Pairs.hardNegatives(pairs, k = 1)
      .select("pair_id", "negative_id").as[(Long, Long)].collect().toMap
    assert(negs(1L) == 2L) // pair 2's image is pair 1's hardest negative
    assert(negs(2L) == 1L)
    assert(!Pairs.hardNegatives(pairs, k = 2).collect()
      .exists(r => r.getAs[Long]("pair_id") == r.getAs[Long]("negative_id")))
  }

  test("pairDedup keeps the min pair_id and preserves input columns") {
    val rows = Seq(pair(5L, png(1L), enCap), pair(3L, png(1L), enCap))
    val out = Pairs.pairDedup(pairsDf(rows))
    assert(out.columns.toSet ==
      Set("pair_id", "payload", "caption", "img_emb", "txt_emb"))
    assert(out.select("pair_id").as[Long].collect().toSeq == Seq(3L))
  }
}
