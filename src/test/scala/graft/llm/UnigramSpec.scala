package graft.llm

import graft.SparkSpec
import graft.plans.UnigramEncode
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer ([[Unigram]] + native
  * [[graft.plans.UnigramEncodeExpression]]): Viterbi optimality,
  * training determinism, morpheme discovery, persistence. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def table(ps: (String, Double)*) =
    UnigramEncode.parse(UnigramEncode.serialize(ps))

  test("Viterbi picks the max-likelihood segmentation (hand-checked)") {
    // "abc": ab+c = ln(.4)+ln(.2) = -2.53 beats a+b+c = 3·ln(.2) = -4.83
    val t = table("ab" -> math.log(0.4), "a" -> math.log(0.2),
      "b" -> math.log(0.2), "c" -> math.log(0.2))
    assert(UnigramEncode.encode("abc", t).toSeq == Seq("ab", "c"))
    // two words segment independently
    assert(UnigramEncode.encode("abc ab", t).toSeq == Seq("ab", "c", "ab"))
  }

  test("Viterbi equals brute force on all short words over a random table") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    val pieces = (for {
      len <- 1 to 3
      s <- Seq.fill(20)((0 until len).map(_ => alphabet(rnd.nextInt(3))).mkString)
    } yield s).distinct ++ alphabet.map(_.toString)
    val lp = pieces.distinct.map(p => p -> math.log(rnd.nextDouble() * 0.9 + 0.05)).toMap
    val t = table(lp.toSeq: _*)
    def brute(w: String): Double = {
      if (w.isEmpty) 0.0
      else (1 to math.min(3, w.length)).map { k =>
        lp.get(w.take(k)) match {
          case Some(v) => v + brute(w.drop(k))
          case None if k == 1 => -1e9 + brute(w.drop(1))
          case None => Double.NegativeInfinity
        }
      }.max
    }
    val words = for (i <- 0 until 200)
      yield (0 to i % 6).map(_ => alphabet(rnd.nextInt(3))).mkString
    words.filter(_.nonEmpty).foreach { w =>
      val got = UnigramEncode.encode(w, t)
      assert(got.mkString("") == w) // lossless
      val score = got.map(p => lp.getOrElse(p, -1e9)).sum
      assert(math.abs(score - brute(w)) < 1e-9, s"word $w: $score vs ${brute(w)}")
    }
  }

  test("unknown characters fall back to single-char pieces, never fail") {
    val t = table("ab" -> math.log(0.5), "a" -> math.log(0.25),
      "b" -> math.log(0.25))
    assert(UnigramEncode.encode("axb", t).toSeq == Seq("a", "x", "b"))
    assert(UnigramEncode.encode("zz", t).toSeq == Seq("z", "z"))
  }

  test("training learns the planted morphemes and is deterministic") {
    // a corpus whose words are concatenations of 4 morphemes: the
    // learned multi-char pieces must include them
    val morphs = Vector("ing", "pre", "fix", "ed")
    val words = for {
      a <- morphs; b <- morphs if a != b
    } yield (a + b, 50L)
    val pieces = Unigram.trainFromWordCounts(words, vocabSize = 30,
      maxPieceLen = 4, emIters = 4)
    assert(pieces.size <= 30)
    val set = pieces.map(_._1).toSet
    morphs.foreach(m => assert(set.contains(m), s"morpheme $m not learned"))
    // logprobs normalized: sum of probs <= 1 + eps
    assert(pieces.map { case (_, v) => math.exp(v) }.sum <= 1.000001)
    // deterministic
    val again = Unigram.trainFromWordCounts(words, vocabSize = 30,
      maxPieceLen = 4, emIters = 4)
    assert(pieces == again)
    // segmentation uses the learned morphemes
    val t = table(pieces: _*)
    assert(UnigramEncode.encode("preing", t).toSeq == Seq("pre", "ing"))
  }

  test("train over a DataFrame is repartition-invariant; encodeDf roundtrips") {
    val docs = Seq((1L, "tokenize the corpus corpus"),
      (2L, "tokenize the the corpus"), (3L, "token corpus")).toDF("doc_id", "text")
    val a = Unigram.train(docs, "text", vocabSize = 40, maxPieceLen = 5, emIters = 3)
    val b = Unigram.train(docs.repartition(7), "text", vocabSize = 40,
      maxPieceLen = 5, emIters = 3)
    assert(a == b)
    val texts = Map(1L -> "tokenize the corpus corpus",
      2L -> "tokenize the the corpus", 3L -> "token corpus")
    val enc = Unigram.encodeDf(docs, "doc_id", "text", a)
      .orderBy("doc_id").collect()
    enc.foreach { r =>
      val toks = r.getSeq[String](1)
      // lossless per word: concatenating tokens restores the text
      // minus its spaces, and the count column matches the array
      assert(toks.mkString("") == texts(r.getLong(0)).replace(" ", ""))
      assert(r.getLong(2) == toks.size)
    }
  }

  test("savePieces/loadPieces roundtrip preserves the table") {
    val docs = Seq((1L, "persist the pieces table")).toDF("doc_id", "text")
    val trained = Unigram.train(docs, "text", vocabSize = 50, emIters = 2)
    val dir = java.nio.file.Files.createTempDirectory("unigram").toString + "/p"
    Unigram.savePieces(spark, trained, dir)
    assert(Unigram.loadPieces(spark, dir) == trained)
  }
}
