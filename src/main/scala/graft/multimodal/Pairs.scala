package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.{Dedup, Similarity, TextAnalysis}

/** Image-text PAIR curation — the published web-scale pair-dataset
  * recipe (LAION-5B, Schuhmann et al. 2022; DataComp, Gadre et al.
  * 2023): decode-gate the image, bound its resolution and aspect
  * ratio, gate the caption's language and length, threshold the
  * image↔text alignment score, then dedup at PAIR granularity.
  *
  * Division of labor at 100 TB: embedding INFERENCE (CLIP et al.) is a
  * GPU model pass that happens upstream of the engine — the pairs
  * frame arrives carrying `img_emb` / `txt_emb` columns the way the
  * `embeddings` table does. Everything the engine owns — the
  * distributed decode, the gates, the cosine, the dedup shuffle — is
  * real and oracle-checkable; nothing here pretends to run the model.
  *
  * Scale shape: [[pairFilter]] is ONE pass — the decode is a
  * per-partition batched `mapPartitions` appending (ok, width,
  * height) in place (no stats-side self-join: the payload column is
  * never shuffled), and every gate after it is a codegen'd predicate.
  * [[pairDedup]] adds the one hash shuffle exact dedup always costs,
  * on the (dhash, caption) key.
  */
object Pairs {

  /** Append (`__ok`, `__w`, `__h`) from a real image decode to every
    * row IN PLACE — the scan-once alternative to computing
    * [[Multimodal.imageStats]] separately and joining it back (which
    * would shuffle the payload bytes or read the input twice). */
  private def withDims(df: DataFrame, payloadCol: String,
                       batchSize: Int): DataFrame = {
    val out = StructType(df.schema.fields ++ Seq(
      StructField("__ok", BooleanType, nullable = false),
      StructField("__w", IntegerType, nullable = true),
      StructField("__h", IntegerType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    val pi = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { r =>
        val bytes = if (r.isNullAt(pi)) null else r.getAs[Array[Byte]](pi)
        Multimodal.decodeImage(bytes) match {
          case Some(s) => Row.fromSeq(r.toSeq ++ Seq(true, s.width, s.height))
          case None => Row.fromSeq(r.toSeq ++ Seq(false, null, null))
        }
      })
    }(enc)
  }

  /** Same shape for the perceptual hash: append (`__ok`, `__dhash`). */
  private def withDHash(df: DataFrame, payloadCol: String,
                        batchSize: Int): DataFrame = {
    val out = StructType(df.schema.fields ++ Seq(
      StructField("__ok", BooleanType, nullable = false),
      StructField("__dhash", LongType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    val pi = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { r =>
        val bytes = if (r.isNullAt(pi)) null else r.getAs[Array[Byte]](pi)
        Multimodal.dHash(bytes) match {
          case Some(h) => Row.fromSeq(r.toSeq ++ Seq(true, h))
          case None => Row.fromSeq(r.toSeq ++ Seq(false, null))
        }
      })
    }(enc)
  }

  /** The DataComp/LAION pair gate. Input columns: `pair_id`,
    * `payload` (image bytes), `caption`, `img_emb`, `txt_emb`.
    * Keeps pairs passing ALL of:
    *  - the image decodes, `width >= minWidth`, `height >= minHeight`,
    *    `max(w,h)/min(w,h) <= maxAspect` (compared cross-multiplied —
    *    no division, engine-exact);
    *  - the caption's predicted language is in `langs` (empty = any)
    *    and it has `>= minWords` normalized words;
    *  - `cosine(img_emb, txt_emb) >= minAlign`, 6-dp rounded before
    *    the comparison so the gate is engine-stable. Pairs missing
    *    either embedding are DROPPED — deliberately NOT the text
    *    family's keep-on-no-signal convention, because in the
    *    published recipes the alignment score is the load-bearing
    *    filter (DataComp's strongest baseline) and an unscored pair
    *    is an unscored liability, not a neutral row.
    *
    * Output: surviving pairs as (pair_id, width, height, pred_lang,
    * n_words, align). */
  def pairFilter(pairs: DataFrame,
                 minWidth: Int = 8, minHeight: Int = 8,
                 maxAspect: Double = 3.0,
                 langs: Seq[String] = Seq("en"), minWords: Int = 2,
                 minAlign: Double = 0.5,
                 batchSize: Int = 64): DataFrame =
    pairFilterAll(pairs, minWidth, minHeight, maxAspect, langs, minWords,
        minAlign, batchSize)
      .select(col("pair_id"), col("width"), col("height"),
        col("pred_lang"), col("n_words"), col("align"))

  /** [[pairFilter]] WITHOUT the evidence projection: surviving rows
    * keep every input column (payload, caption, embeddings, anything
    * the caller carried) plus the evidence columns (width, height,
    * pred_lang, n_words, align) — the form a streamed ingest needs,
    * where the ACCEPTED pair rows are the product, not just the gate
    * report. */
  def pairFilterAll(pairs: DataFrame,
                    minWidth: Int = 8, minHeight: Int = 8,
                    maxAspect: Double = 3.0,
                    langs: Seq[String] = Seq("en"), minWords: Int = 2,
                    minAlign: Double = 0.5,
                    batchSize: Int = 64): DataFrame = {
    val d = withDims(pairs, "payload", batchSize)
      .where(col("__ok"))
      .where(col("__w") >= minWidth && col("__h") >= minHeight)
      // max(w,h) <= maxAspect * min(w,h), cross-multiplied
      .where(greatest(col("__w"), col("__h")).cast("double") <=
        least(col("__w"), col("__h")).cast("double") * maxAspect)
    val langOk =
      if (langs.isEmpty) lit(true)
      else TextAnalysis.langId(col("caption")).isin(langs: _*)
    val nWords = size(filter(Dedup.wordsOf(col("caption")), w => w =!= ""))
    val align = round(Similarity.cosine(
      col("img_emb").cast("array<double>"),
      col("txt_emb").cast("array<double>")), 6)
    d.withColumn("pred_lang", TextAnalysis.langId(col("caption")))
      .withColumn("n_words", nWords.cast("long"))
      .withColumn("align", align)
      .where(langOk && col("n_words") >= minWords)
      .where(col("align").isNotNull && col("align") >= minAlign)
      .withColumn("width", col("__w"))
      .withColumn("height", col("__h"))
      .drop("__ok", "__w", "__h")
  }

  /** Per-gate funnel counts for [[pairFilter]] — the observability row
    * a pair-curation run ships with (the text chain's
    * `curation_funnel` at pair granularity): how many pairs survive
    * each successive gate, computed in ONE pass (the gates become
    * flag columns, one aggregation sums them — no per-stage jobs).
    * Returns (stage_idx, stage, n_pass) with stage 0 = input rows. */
  def pairFunnel(pairs: DataFrame,
                 minWidth: Int = 8, minHeight: Int = 8,
                 maxAspect: Double = 3.0,
                 langs: Seq[String] = Seq("en"), minWords: Int = 2,
                 minAlign: Double = 0.5,
                 batchSize: Int = 64): DataFrame = {
    val d = withDims(pairs, "payload", batchSize)
    val decodeOk = col("__ok")
    val dimsOk = decodeOk && col("__w") >= minWidth &&
      col("__h") >= minHeight
    val aspectOk = dimsOk &&
      greatest(col("__w"), col("__h")).cast("double") <=
        least(col("__w"), col("__h")).cast("double") * maxAspect
    val langOk = aspectOk && (if (langs.isEmpty) lit(true)
      else TextAnalysis.langId(col("caption")).isin(langs: _*))
    val nWords = size(filter(Dedup.wordsOf(col("caption")), w => w =!= ""))
    val wordsOk = langOk && nWords >= minWords
    val align = round(Similarity.cosine(
      col("img_emb").cast("array<double>"),
      col("txt_emb").cast("array<double>")), 6)
    val alignOk = wordsOk && align.isNotNull && align >= minAlign
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    val agg = d.agg(count(lit(1)).as("input"), cnt(decodeOk).as("decode"),
      cnt(dimsOk).as("dims"), cnt(aspectOk).as("aspect"),
      cnt(langOk).as("lang"), cnt(wordsOk).as("words"),
      cnt(alignOk).as("align"))
    val stages = Seq("input", "decode", "dims", "aspect", "lang",
      "words", "align")
    agg.select(explode(array(stages.zipWithIndex.map { case (st, i) =>
        struct(lit(i.toLong).as("stage_idx"), lit(st).as("stage"),
          col(st).as("n_pass"))
      }: _*)).as("s"))
      .select(col("s.stage_idx"), col("s.stage"), col("s.n_pass"))
  }

  /** The dedup key [[pairDedup]] groups on, exposed for ledger use:
    * the image's perceptual dHash (× the normalized caption when
    * `byCaption`), with undecodable payloads routed to per-row
    * sentinel keys. Appends it as `pair_key`. */
  def withPairKey(pairs: DataFrame, byCaption: Boolean = true,
                  batchSize: Int = 64): DataFrame = {
    val withH = withDHash(pairs, "payload", batchSize)
    val imgKey = col("__dhash").cast("string")
    val key =
      if (byCaption)
        concat(imgKey, lit("|"), Dedup.normalizeText(col("caption")))
      else imgKey
    withH.withColumn("pair_key", when(col("__ok"), key)
        .otherwise(concat(lit("__bad__"), col("pair_id").cast("string"))))
      .drop("__ok", "__dhash")
  }

  /** Append (`__ok`, `__rate`, `__ms`, `__meanAbs`) from a real audio
    * decode in place — the audio sibling of [[withDims]]. */
  private def withAudio(df: DataFrame, payloadCol: String,
                        batchSize: Int): DataFrame = {
    val out = StructType(df.schema.fields ++ Seq(
      StructField("__ok", BooleanType, nullable = false),
      StructField("__rate", IntegerType, nullable = true),
      StructField("__ms", LongType, nullable = true),
      StructField("__meanAbs", DoubleType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    val pi = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { r =>
        val bytes = if (r.isNullAt(pi)) null else r.getAs[Array[Byte]](pi)
        Multimodal.decodeAudio(bytes) match {
          case Some(s) => Row.fromSeq(r.toSeq ++
            Seq(true, s.sampleRate, s.durationMs, s.meanAbs))
          case None => Row.fromSeq(r.toSeq ++ Seq(false, null, null, null))
        }
      })
    }(enc)
  }

  /** The audio-text sibling of [[pairFilter]] — the published
    * speech-dataset gate set (Common Voice / LibriSpeech prep, the
    * Whisper data pipeline): the clip must decode, its duration must
    * sit in `[minMs, maxMs]`, its sample rate must reach
    * `minSampleRate`, and `meanAbs >= minMeanAbs` rejects silent or
    * near-silent payloads (PCM amplitude stats are exact-integer
    * sums, engine-portable). The transcript (`caption`) and the
    * carried audio↔text embedding columns get exactly the image
    * path's gates: language, length, 6-dp-rounded cosine threshold
    * (alignment inference upstream, same contract). Output:
    * (pair_id, sample_rate, duration_ms, mean_abs, pred_lang,
    * n_words, align). */
  def audioPairFilter(pairs: DataFrame,
                      minMs: Long = 500, maxMs: Long = 30L * 60 * 1000,
                      minSampleRate: Int = 8000, minMeanAbs: Double = 0.0,
                      langs: Seq[String] = Seq("en"), minWords: Int = 2,
                      minAlign: Double = 0.5,
                      batchSize: Int = 64): DataFrame = {
    val d = withAudio(pairs, "payload", batchSize)
      .where(col("__ok"))
      .where(col("__ms") >= minMs && col("__ms") <= maxMs)
      .where(col("__rate") >= minSampleRate)
      .where(col("__meanAbs") >= minMeanAbs)
    val langOk =
      if (langs.isEmpty) lit(true)
      else TextAnalysis.langId(col("caption")).isin(langs: _*)
    val nWords = size(filter(Dedup.wordsOf(col("caption")), w => w =!= ""))
    val align = round(Similarity.cosine(
      col("audio_emb").cast("array<double>"),
      col("txt_emb").cast("array<double>")), 6)
    d.withColumn("pred_lang", TextAnalysis.langId(col("caption")))
      .withColumn("n_words", nWords.cast("long"))
      .withColumn("align", align)
      .where(langOk && col("n_words") >= minWords)
      .where(col("align").isNotNull && col("align") >= minAlign)
      .select(col("pair_id"), col("__rate").as("sample_rate"),
        col("__ms").as("duration_ms"), col("__meanAbs").as("mean_abs"),
        col("pred_lang"), col("n_words"), col("align"))
  }

  /** Append (`__ok`, `__frames`, `__w`, `__h`) from a real video
    * demux + first-frame decode in place — the video sibling of
    * [[withDims]]. `__frames` counts demuxed frames (capped at
    * `maxFrames`); `__ok` requires at least one frame AND a decodable
    * first frame (dims come from it). */
  private def withVideo(df: DataFrame, payloadCol: String,
                        maxFrames: Int, batchSize: Int): DataFrame = {
    val out = StructType(df.schema.fields ++ Seq(
      StructField("__ok", BooleanType, nullable = false),
      StructField("__frames", IntegerType, nullable = true),
      StructField("__w", IntegerType, nullable = true),
      StructField("__h", IntegerType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    val pi = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { r =>
        val bytes = if (r.isNullAt(pi)) null else r.getAs[Array[Byte]](pi)
        val frames = Multimodal.pngFrames(bytes, maxFrames)
        frames.headOption.flatMap(Multimodal.decodeImage) match {
          case Some(s) => Row.fromSeq(r.toSeq ++
            Seq(true, frames.size, s.width, s.height))
          case None => Row.fromSeq(r.toSeq ++ Seq(false, null, null, null))
        }
      })
    }(enc)
  }

  /** The video-text sibling of [[pairFilter]] (video-caption dataset
    * prep — WebVid/HowTo-style gates): the clip must demux and its
    * first frame decode, carry `[minFrames, maxFrames]` frames, and
    * meet the frame-resolution floor; the caption and the carried
    * `video_emb`/`txt_emb` columns get the shared
    * language/length/alignment gates. Output: (pair_id, n_frames,
    * width, height, pred_lang, n_words, align). */
  def videoPairFilter(pairs: DataFrame,
                      minFrames: Int = 2, maxFrames: Int = 64,
                      minWidth: Int = 8, minHeight: Int = 8,
                      langs: Seq[String] = Seq("en"), minWords: Int = 2,
                      minAlign: Double = 0.5,
                      batchSize: Int = 16): DataFrame = {
    val d = withVideo(pairs, "payload", maxFrames, batchSize)
      .where(col("__ok"))
      .where(col("__frames") >= minFrames && col("__frames") <= maxFrames)
      .where(col("__w") >= minWidth && col("__h") >= minHeight)
    val langOk =
      if (langs.isEmpty) lit(true)
      else TextAnalysis.langId(col("caption")).isin(langs: _*)
    val nWords = size(filter(Dedup.wordsOf(col("caption")), w => w =!= ""))
    val align = round(Similarity.cosine(
      col("video_emb").cast("array<double>"),
      col("txt_emb").cast("array<double>")), 6)
    d.withColumn("pred_lang", TextAnalysis.langId(col("caption")))
      .withColumn("n_words", nWords.cast("long"))
      .withColumn("align", align)
      .where(langOk && col("n_words") >= minWords)
      .where(col("align").isNotNull && col("align") >= minAlign)
      .select(col("pair_id"), col("__frames").as("n_frames"),
        col("__w").as("width"), col("__h").as("height"),
        col("pred_lang"), col("n_words"), col("align"))
  }

  /** Interleaved-document assembly — the MMC4 recipe (Zhu et al.
    * 2023: images scraped with a page are PLACED into the page's text
    * by CLIP-similarity assignment, producing the image-text
    * interleaved sequences multimodal LMs train on): each image goes
    * to the most-similar text chunk OF ITS OWN DOCUMENT (ties → the
    * earliest chunk), and each chunk keeps at most `maxPerChunk`
    * images (best-first, ties → lowest asset id).
    *
    * Inputs carry upstream-inference embeddings (the pair-family
    * contract): `chunks` = (doc_id, chunk_idx, chunk_emb), `images` =
    * (asset_id, doc_id, img_emb). Similarities are 6-dp rounded
    * BEFORE ranking so placement is engine-stable.
    *
    * Scale shape: ONE hash join on doc_id (images meet only their own
    * page's chunks — never a corpus cross product); the two ranking
    * windows partition by asset and by (doc, chunk), both bounded by
    * per-page fan-out. Returns (doc_id, chunk_idx, asset_id, sim,
    * img_rank). */
  def interleaveImages(chunks: DataFrame, images: DataFrame,
                       maxPerChunk: Int = 1): DataFrame = {
    val scored = images.join(chunks, Seq("doc_id"))
      .withColumn("sim", round(Similarity.cosine(
        col("img_emb").cast("array<double>"),
        col("chunk_emb").cast("array<double>")), 6))
    val wImg = Window.partitionBy(col("asset_id"))
      .orderBy(col("sim").desc, col("chunk_idx"))
    val best = scored.withColumn("__r", row_number().over(wImg))
      .where(col("__r") === 1).drop("__r")
    val wChunk = Window.partitionBy(col("doc_id"), col("chunk_idx"))
      .orderBy(col("sim").desc, col("asset_id"))
    best.withColumn("img_rank", row_number().over(wChunk))
      .where(col("img_rank") <= maxPerChunk)
      .select(col("doc_id"), col("chunk_idx"), col("asset_id"),
        col("sim"), col("img_rank"))
  }

  /** Benchmark decontamination for PAIR corpora — the DataComp
    * hygiene step (training pairs near-duplicating eval-set imagery —
    * ImageNet & co. — leak the benchmark): drop corpus pairs whose
    * image sits within `maxHamming` gradient bits of ANY benchmark
    * image. `benchmark` carries (asset_id, payload).
    *
    * Scale shape: the benchmark side is eval-suite-sized, so its
    * (chunk, key, fp) probe set BROADCASTS (the text
    * decontamination's broadcast-gram convention at image
    * granularity); the corpus pays its fused decode plus one
    * broadcast join + an id anti-join — the corpus is never shuffled
    * and the benchmark never self-joined. The 4×16-bit chunk banding
    * guarantees recall to Hamming 3 (`maxHamming = 0` = exact
    * perceptual match, still via the shared banding path).
    * Undecodable corpus payloads pass through (they can't match
    * benchmark imagery); [[pairFilter]] owns validity. */
  def decontaminatePairs(pairs: DataFrame, benchmark: DataFrame,
                         maxHamming: Int = 0,
                         batchSize: Int = 64): DataFrame = {
    require(maxHamming <= 3,
      "4-chunk banding guarantees recall only to Hamming 3")
    def chunksOf(fp: Column) = explode(array((0 until 4).map(i =>
      struct(lit(i).as("chunk"),
        shiftright(fp, i * 16).bitwiseAND(lit(0xFFFFL)).as("key"))): _*))
    val bench = Multimodal.imageDHashes(
        benchmark.select(col("asset_id"), col("payload")), batchSize)
      .where(col("ok")).select(col("dhash").as("__bfp")).distinct()
      .select(col("__bfp"), chunksOf(col("__bfp")).as("c"))
      .select(col("c.chunk"), col("c.key"), col("__bfp"))
    val withH = withDHash(pairs, "payload", batchSize)
    val flagged = withH.where(col("__ok"))
      .select(col("pair_id"), col("__dhash"),
        chunksOf(col("__dhash")).as("c"))
      .select(col("pair_id"), col("__dhash"), col("c.chunk"), col("c.key"))
      .join(broadcast(bench), Seq("chunk", "key"))
      .where(Dedup.hamming(col("__dhash"), col("__bfp")) <= maxHamming)
      .select(col("pair_id").as("__graft_contam")).distinct()
    withH.join(flagged, col("pair_id") === col("__graft_contam"),
        "left_anti")
      .drop("__ok", "__dhash")
  }

  /** Hard-negative mining — the contrastive-training prep the pair
    * datasets feed (CLIP-style training improves when in-batch random
    * negatives are supplemented with MINED hard ones: for each pair's
    * TEXT, the most text-similar OTHER images): top-k over the
    * `img_emb` corpus by cosine against each pair's `txt_emb`, the
    * pair's own image excluded. A documented thin composition of
    * [[Similarity.bruteForceTopK]] (broadcast query side,
    * WindowGroupLimit top-k) — at corpus scale the IVF/PQ index paths
    * substitute the same way they do for `ann_*`. Returns
    * (pair_id, rank, negative_id, cosine). */
  def hardNegatives(pairs: DataFrame, k: Int = 5): DataFrame =
    Similarity.bruteForceTopK(
        pairs.select(col("pair_id"), col("txt_emb").as("embedding")),
        pairs.select(col("pair_id"), col("img_emb").as("embedding")), k,
        qIdCol = "pair_id", cIdCol = "pair_id")
      .select(col("query_id").as("pair_id"), col("rank"),
        col("neighbor_id").as("negative_id"), col("cosine"))

  /** PAIR-granularity exact dedup: a pair is a duplicate only when
    * BOTH sides repeat — its image's perceptual dHash AND its
    * normalized caption (`byCaption = false` drops the caption from
    * the key: image-only dedup, the DataComp convention). Keep-first
    * (min `pair_id`) per key; undecodable images pass through
    * unmatched (each forms its own group — dedup is not a validity
    * gate, [[pairFilter]] is). Exact re-encodes of the same pixels
    * share a dHash by construction (lossless decode → identical
    * gradient bits), so recompressed copies collapse; NEAR-duplicate
    * imagery is [[Multimodal.imageNearDups]]'s banded-Hamming job.
    *
    * One hash shuffle on the dedup key — the [[Dedup.exactDedup]]
    * cost shape with the decode fused into the same pass. */
  def pairDedup(pairs: DataFrame, byCaption: Boolean = true,
                batchSize: Int = 64): DataFrame = {
    val w = Window.partitionBy(col("pair_key"))
    withPairKey(pairs, byCaption, batchSize)
      .withColumn("__keep", min(col("pair_id")).over(w))
      .where(col("pair_id") === col("__keep"))
      .drop("pair_key", "__keep")
  }
}
