package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.BpeEncode

/** Learned byte-pair-encoding tokenizer: distributed merge-table
  * training plus native codegen'd encoding
  * ([[graft.plans.BpeEncodeExpression]]). Replaces the GPT-2-style
  * pre-tokenizer regex proxy ([[TextAnalysis.preTokenCount]]) with a
  * real corpus-trained tokenizer for the token budgets that feed
  * chunking, sequence packing, and quality monitoring.
  *
  * Scale shape (the 100 TB contract):
  *  - Training touches the corpus EXACTLY ONCE: one word-count
  *    aggregation (map-side partial, one shuffle on the word key),
  *    truncated to the `maxWords` most frequent words. Distinct words
  *    follow Zipf — the frequency table is orders of magnitude smaller
  *    than the corpus, and truncation at a bounded vocab is how
  *    production BPE trainers (Sennrich subword-nmt, HF tokenizers)
  *    bound the problem too.
  *  - Merge learning then runs on that BOUNDED table driver-side:
  *    O(maxWords × avg word length) per round, zero further cluster
  *    work. With the default 50 000-word cap a 1 000-merge ladder
  *    trains in seconds regardless of corpus size.
  *  - Encoding is map-only and shuffle-free (a native expression
  *    inside whole-stage codegen); the ladder ships once per executor
  *    as a codegen reference object. Train once, persist the ladder
  *    ([[saveLadder]]), encode forever — the build-once/encode-many
  *    shape of [[Similarity]]'s persistent IVF index.
  *
  * Determinism: word truncation orders by (count desc, word asc);
  * merge selection by (pair count desc, left asc, right asc). Training
  * is therefore repartition-invariant and reproducible — pinned by
  * property specs.
  */
object Bpe {

  /** Train a merge ladder from a corpus.
    *
    * @param numMerges  maximum ladder length (vocab grows by one symbol
    *                   per merge)
    * @param maxWords   word-frequency table truncation (bounds driver
    *                   memory and per-round cost)
    * @param minPairCount stop early when the best pair occurs fewer
    *                   times than this (a pair seen once gains nothing)
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 50000, minPairCount: Long = 2L): Vector[(String, String)] = {
    val wordCounts = df
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromWordCounts(wordCounts, numMerges, minPairCount)
  }

  /** Driver-side merge learning over a bounded (word, freq) table —
    * separated out so specs can pin the algorithm without a session. */
  def trainFromWordCounts(wordCounts: Seq[(String, Long)], numMerges: Int,
                          minPairCount: Long = 2L): Vector[(String, String)] = {
    // mutable vocab: each word as (symbol buffer, live length, freq)
    val vocab = wordCounts.map { case (w, f) =>
      val syms = codePoints(w)
      (syms, Array(syms.length), f)
    }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var continue = true
    while (round < numMerges && continue) {
      // count adjacent symbol pairs, weighted by word frequency
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, nRef, f) =>
        var i = 0
        while (i < nRef(0) - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) continue = false
      else {
        // deterministic pick: max count, ties to lexicographically
        // smallest (left, right)
        var best: (String, String) = null
        var bestN = Long.MinValue
        counts.foreach { case (p, n) =>
          if (n > bestN || (n == bestN && lexLt(p, best))) { best = p; bestN = n }
        }
        if (bestN < minPairCount) continue = false
        else {
          merges += best
          vocab.foreach { case (syms, nRef, _) =>
            nRef(0) = applyMergeInPlace(syms, nRef(0), best._1, best._2)
          }
          round += 1
        }
      }
    }
    merges.result()
  }

  private def lexLt(a: (String, String), b: (String, String)): Boolean =
    b == null || a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  private def codePoints(w: String): Array[String] = {
    val out = new Array[String](w.codePointCount(0, w.length))
    var i = 0
    var n = 0
    while (i < w.length) {
      val cc = Character.charCount(w.codePointAt(i))
      out(n) = w.substring(i, i + cc)
      n += 1
      i += cc
    }
    out
  }

  /** Same left-to-right non-overlapping application as the encode path
    * ([[graft.plans.BpeEncode]]) — training and encoding MUST agree on
    * merge semantics or learned ladders mis-apply. */
  private def applyMergeInPlace(syms: Array[String], n: Int,
                                a: String, b: String): Int = {
    var r = 0
    var w = 0
    while (r < n) {
      if (r + 1 < n && syms(r) == a && syms(r + 1) == b) {
        syms(w) = a + b; r += 2
      } else { syms(w) = syms(r); r += 1 }
      w += 1
    }
    w
  }

  /** Serialized ladder form consumed by the native expression. */
  def serialize(merges: Seq[(String, String)]): String =
    BpeEncode.serializeLadder(merges)

  def saveLadder(merges: Seq[(String, String)], path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      serialize(merges) + "\n")

  def loadLadder(path: String): Vector[(String, String)] = {
    val flat = BpeEncode.parseLadder(
      java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    flat.grouped(2).map(p => (p(0), p(1))).toVector
  }

  /** Token array column (native expression; caller must have run
    * `GraftExtensions.register`, or use [[encodeDf]]). */
  def encodeCol(c: Column, merges: Seq[(String, String)]): Column =
    call_function("graft_bpe_encode", c, lit(serialize(merges)))

  /** Token count column — no array materialization. */
  def countCol(c: Column, merges: Seq[(String, String)]): Column =
    call_function("graft_bpe_count", c, lit(serialize(merges)))

  /** `(doc_id, tokens, n_tokens)` over a corpus with a given ladder. */
  def encodeDf(df: DataFrame, idCol: String, textCol: String,
               merges: Seq[(String, String)]): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    df.select(col(idCol).as("doc_id"),
      encodeCol(col(textCol), merges).as("tokens"),
      countCol(col(textCol), merges).as("n_tokens"))
  }

  /** A small fixed English ladder for callers that want real-BPE token
    * counts without training a corpus-specific table first (and for
    * engine-portable oracle rows — the ladder is replayed in SQL as
    * chained literal `replace` calls). Hand-picked common English
    * merges, ordered most-frequent-first. */
  val defaultLadder: Vector[(String, String)] = Vector(
    "t" -> "h", "i" -> "n", "a" -> "n", "e" -> "r", "o" -> "n",
    "r" -> "e", "th" -> "e", "e" -> "n", "a" -> "t", "o" -> "r",
    "e" -> "s", "s" -> "t", "an" -> "d", "in" -> "g", "o" -> "u",
    "i" -> "t", "i" -> "s", "a" -> "l", "a" -> "r", "e" -> "d",
    "c" -> "o", "d" -> "e", "l" -> "e", "m" -> "a", "s" -> "e")
}
