package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.UnigramEncode

/** Unigram-LM tokenizer (the SentencePiece unigram model, Kudo 2018,
  * "Subword Regularization"): learn a piece vocabulary with
  * probabilities by EM over corpus word counts, encode by Viterbi
  * segmentation ([[graft.plans.UnigramEncodeExpression]], native
  * codegen'd). The second trained-tokenizer family next to [[Bpe]] —
  * unigram vocabularies segment by likelihood rather than greedy merge
  * order, which is what T5/ALBERT/XLNet-style pipelines tokenize with.
  *
  * Scale shape — identical contract to [[Bpe.train]]:
  *  - the corpus is touched EXACTLY ONCE (one word-count aggregation,
  *    map-side partial, one shuffle on the word key, truncated to the
  *    `maxWords` most frequent words — Zipf makes that table orders of
  *    magnitude smaller than the corpus);
  *  - seeding + EM run on that BOUNDED table driver-side: hard-EM
  *    (Viterbi counts) per iteration costs O(maxWords × word len ×
  *    max piece len), seconds at the default caps regardless of
  *    corpus size;
  *  - encoding is map-only and shuffle-free; the piece table ships
  *    once per executor as a codegen reference object. Train once,
  *    persist ([[savePieces]]), encode forever.
  *
  * Determinism: word truncation orders by (count desc, word asc); seed
  * candidates by (count desc, piece asc); EM is hard (Viterbi) with the
  * expression's longer-piece tie-break; pruning keeps top pieces by
  * (count desc, piece asc); logprobs round to 10 dp before
  * serialization. Training is repartition-invariant and reproducible —
  * spec-pinned. */
object Unigram {

  /** Train a unigram piece table from a corpus.
    *
    * @param vocabSize   target piece count (single chars always kept)
    * @param maxWords    word-frequency table truncation
    * @param maxPieceLen longest candidate piece (chars)
    * @param emIters     hard-EM iterations
    * @return (piece, logprob) rows, logprob desc — bounded by
    *         `vocabSize` */
  def train(df: DataFrame, textCol: String, vocabSize: Int = 8000,
            maxWords: Int = 50000, maxPieceLen: Int = 8,
            emIters: Int = 4): Vector[(String, Double)] = {
    val wordCounts = df
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromWordCounts(wordCounts, vocabSize, maxPieceLen, emIters)
  }

  /** Driver-side EM over a bounded (word, freq) table — separated out
    * so specs can pin the algorithm without a session. */
  def trainFromWordCounts(wordCounts: Seq[(String, Long)], vocabSize: Int,
                          maxPieceLen: Int = 8,
                          emIters: Int = 4): Vector[(String, Double)] = {
    require(vocabSize >= 2, s"unigram: vocabSize must be >= 2, got $vocabSize")
    require(wordCounts.nonEmpty, "unigram: empty word-count table")
    // seed: every substring up to maxPieceLen, weighted by word freq;
    // single chars are the fallback alphabet and always survive
    val seedCounts = scala.collection.mutable.HashMap.empty[String, Long]
    wordCounts.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var j = i + 1
        val lim = math.min(w.length, i + maxPieceLen)
        while (j <= lim) {
          val p = w.substring(i, j)
          seedCounts.update(p, seedCounts.getOrElse(p, 0L) + f)
          j += 1
        }
        i += 1
      }
    }
    val chars = seedCounts.keysIterator.filter(_.length == 1).toVector.sorted
    val nMulti0 = math.max(0, math.min(vocabSize * 3, vocabSize + 2000))
    var pieces: Map[String, Double] = {
      val multi = seedCounts.iterator.filter(_._1.length > 1).toVector
        .sortBy { case (p, n) => (-n, p) }.take(nMulti0)
      val all = chars.map(c => c -> seedCounts(c)) ++ multi
      val tot = all.iterator.map(_._2).sum.toDouble
      all.map { case (p, n) => p -> math.log(n / tot) }.toMap
    }
    // hard-EM: Viterbi counts under the current table, then
    // re-estimate; final iteration prunes to the target vocab first
    (1 to emIters).foreach { it =>
      if (it == emIters && pieces.size > vocabSize) {
        // prune multi-char pieces by current logprob (desc, piece asc),
        // keep the whole single-char alphabet
        val keepMulti = pieces.iterator.filter(_._1.length > 1).toVector
          .sortBy { case (p, v) => (-v, p) }
          .take(math.max(0, vocabSize - chars.length)).map(_._1).toSet
        pieces = pieces.filter { case (p, _) =>
          p.length == 1 || keepMulti(p) }
      }
      val table = UnigramEncode.parse(UnigramEncode.serialize(
        pieces.toVector.sortBy(_._1)))
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      wordCounts.foreach { case (w, f) =>
        UnigramEncode.encode(w, table).foreach { t =>
          counts.update(t, counts.getOrElse(t, 0L) + f)
        }
      }
      // chars keep a count floor of 1: the fallback alphabet must
      // never vanish or log(0)
      val est = pieces.keysIterator.map { p =>
        val n = counts.getOrElse(p, 0L)
        p -> (if (p.length == 1) math.max(n, 1L) else n)
      }.filter { case (p, n) => n > 0 || p.length == 1 }.toVector
      val tot = est.iterator.map(_._2).sum.toDouble
      pieces = est.map { case (p, n) =>
        p -> math.log(math.max(n, 1L) / tot) }.toMap
    }
    pieces.toVector
      .map { case (p, v) =>
        (p, BigDecimal(v).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (p, v) => (-v, p) }
  }

  /** Token array column (native expression; caller must have run
    * `GraftExtensions.register`). */
  def encodeCol(c: Column, pieces: Seq[(String, Double)]): Column =
    call_function("graft_unigram_encode", c, lit(UnigramEncode.serialize(pieces)))

  /** Token count column — no array materialization. */
  def countCol(c: Column, pieces: Seq[(String, Double)]): Column =
    call_function("graft_unigram_count", c, lit(UnigramEncode.serialize(pieces)))

  /** `(doc_id, tokens, n_tokens)` over a corpus with a given table. */
  def encodeDf(df: DataFrame, idCol: String, textCol: String,
               pieces: Seq[(String, Double)]): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    df.select(col(idCol).as("doc_id"),
      encodeCol(col(textCol), pieces).as("tokens"),
      countCol(col(textCol), pieces).as("n_tokens"))
  }

  /** Persist / load the trained table as parquet (piece, logprob) —
    * train once, encode forever. */
  def savePieces(spark: org.apache.spark.sql.SparkSession,
                 pieces: Seq[(String, Double)], path: String): Unit = {
    import spark.implicits._
    pieces.toDF("piece", "logprob").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadPieces(spark: org.apache.spark.sql.SparkSession,
                 path: String): Vector[(String, Double)] =
    spark.read.parquet(path).select(col("piece"), col("logprob"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .sortBy { case (p, v) => (-v, p) }.toVector
}
