package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId detects language by stopwords / CJK charset") {
    val df = Seq(
      (1L, "the cat is on the mat and it was not a dog"),
      (2L, "der Hund ist nicht mit der Katze und dem Vogel"),
      (3L, "le chat est sur la table avec le chien et les oiseaux"),
      (4L, "el perro es un animal y la casa es grande con los gatos"),
      (5L, "这是一个中文句子"),
      (6L, "zzz qqq xxx")).toDF("id", "text")
    val out = df.select(col("id"), TextAnalysis.langId(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en"); assert(out(2L) == "de"); assert(out(3L) == "fr")
    assert(out(4L) == "es"); assert(out(5L) == "zh"); assert(out(6L) == "und")
  }

  test("token counts: whitespace, pre-tokens, learned BPE") {
    val df = Seq("Hello world, it's 42 degrees!").toDF("t")
    val ws = df.select(TextAnalysis.wsTokenCount(col("t"))).as[Int].head()
    assert(ws == 5)
    val pre = df.select(TextAnalysis.preTokenCount(col("t"))).as[Int].head()
    // Hello| world|,| it|'s| 42| degrees|! -> 8 pre-tokens
    assert(pre == 8)
    assert(df.sparkSession.range(1).select(
      TextAnalysis.wsTokenCount(lit(""))).as[Int].head() == 0)
    // real BPE with the default English ladder: merges compress letter
    // runs, so the count sits between word count and character count
    graft.plans.GraftExtensions.register(spark)
    val bpe = df.select(TextAnalysis.bpeTokenCount(col("t"))).as[Long].head()
    val chars = "Helloworld,it's42degrees!".length
    assert(bpe > ws && bpe < chars, s"bpe=$bpe ws=$ws chars=$chars")
  }

  test("qualityStats + qualityOk thresholds") {
    val good = "the quick brown fox jumps over the lazy dog again and again today"
    val short = "hi"
    val punct = "!!! ??? ;;; ### !!! ??? ;;; ### !!! ??? ;;; ###"
    val df = Seq((1L, good), (2L, short), (3L, punct)).toDF("id", "t")
      .withColumn("st", TextAnalysis.qualityStats(col("t")))
      .select(col("id"), TextAnalysis.qualityOk(col("st")).as("ok"))
    val m = df.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(m(1L)); assert(!m(2L)); assert(!m(3L))
  }

  test("gopherOk: each published rule fires on its counterexample") {
    // a passing doc: >= 50 words, mean len 3-10, no symbols/bullets,
    // alphabetic, >= 2 gopher stop words
    val good = (("the cat sat with the dog and that was fine to see " * 6)
      .trim.split(" ").take(60)).mkString(" ")
    def wordsN(n: Int, tag: String) =
      (0 until n).map(i => s"$tag${i % 7}ab").mkString(" ")
    val fewWords = "the cat sat with a dog" // < 50 words
    val hashy = (good.split(" ").map(w => w + " #")).mkString(" ") // hash ratio 0.5
    val elly = (good.split(" ").map(w => w + " ...")).mkString(" ")
    val bullets = (0 until 10).map(i => s"- item $i of the list with that")
      .mkString("\n") + "\nthe only non bullet line has the and with that"
    val ellLines = (0 until 10).map(i => s"the line $i trails off with that ...")
      .mkString("\n")
    val numeric = (wordsN(10, "w") + " " + (0 until 50).map(_ * 7).mkString(" ")) +
      " the of and that" // alpha fraction < 0.8
    val noStops = wordsN(60, "zq") // zero gopher stop words
    val df = Seq((1L, good), (2L, fewWords), (3L, hashy), (4L, elly),
      (5L, bullets), (6L, ellLines), (7L, numeric), (8L, noStops))
      .toDF("id", "t")
      .withColumn("st", TextAnalysis.qualityStats(col("t")))
      .select(col("id"), TextAnalysis.gopherOk(col("st")).as("ok"),
        col("st.bullet_line_frac").as("bf"),
        col("st.ellipsis_line_frac").as("ef"),
        col("st.stop_hits").as("sh"))
    val rows = df.collect().map(r => r.getLong(0) ->
      (r.getBoolean(1), r.getDouble(2), r.getDouble(3), r.getInt(4))).toMap
    assert(rows(1L)._1, s"good doc must pass: ${rows(1L)}")
    assert(!rows(2L)._1, "word-count rule")
    assert(!rows(3L)._1, "hash symbol-to-word rule")
    assert(!rows(4L)._1, "ellipsis symbol-to-word rule")
    assert(!rows(5L)._1 && rows(5L)._2 > 0.9, "bullet-line fraction rule")
    assert(!rows(6L)._1 && rows(6L)._3 > 0.3, "ellipsis-line fraction rule")
    assert(!rows(7L)._1, "alpha-word fraction rule")
    assert(!rows(8L)._1 && rows(8L)._4 == 0, "min stop-hits rule")
    // sanity: good doc has >= 2 distinct gopher stop words
    assert(rows(1L)._4 >= 2)
  }

  test("scrubPii redacts emails, ips, phones, long digit runs") {
    val df = Seq("write bob.smith+x@corp.example.org from 10.0.0.1 " +
      "or call +44 (20) 7946-0958 card 4111111111111111 but keep 42").toDF("t")
    val out = df.select(TextAnalysis.scrubPii(col("t"))).as[String].head()
    assert(out.contains("<EMAIL>") && out.contains("<IP>") &&
      out.contains("<PHONE>") && out.contains("<NUMBER>"))
    assert(!out.contains("@corp") && !out.contains("10.0.0.1") &&
      !out.contains("4111111111111111"))
    assert(out.contains("keep 42"))
    val st = df.select(TextAnalysis.piiStats(col("t")).as("s")).select("s.*").head()
    assert(st.getAs[Int]("emails") == 1 && st.getAs[Int]("ips") == 1)
  }

  test("repetitionStats: dup-2gram fraction and top-word share") {
    val df = Seq(
      (1L, "a b a b a b"),            // 5 grams, 2 distinct -> 0.6; 'a' 3/6
      (2L, "one two three four"),     // all grams distinct -> 0.0; 1/4
      (3L, "spam spam spam spam"),    // 3 grams, 1 distinct -> 2/3; 4/4
      (4L, "solo"),                   // <2 words -> 0.0; 1/1
      (5L, "")).toDF("id", "t")       // empty -> single empty word (0, 1.0)
      .select(col("id"), TextAnalysis.repetitionStats(col("t")).as("r"))
      .select(col("id"), col("r.dup_2gram_frac"), col("r.top_word_frac"))
    val m = df.collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(m(1L) == (0.6, 0.5))
    assert(m(2L) == (0.0, 0.25))
    assert(m(3L) == (0.6667, 1.0))
    assert(m(4L) == (0.0, 1.0))
    assert(m(5L) == (0.0, 1.0))
  }

  test("curationKeep equals the naive langId/qualityOk/repetition composition") {
    val docs = Seq(
      "the cat is on the mat and it was not a dog at all today here now",
      "der Hund ist nicht mit der Katze und dem Vogel im Haus heute",
      "spam spam spam spam spam spam spam spam spam spam spam spam",
      "the the the the the the the the the the of of of of it is",
      "hi", "",
      "the quick brown fox jumps over a lazy dog in the warm sun for fun",
      "!!! ??? ;;; ### !!! the of and a to in is it that for on with mat")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("id", "t")
    val naive = df
      .withColumn("st", TextAnalysis.qualityStats(col("t")))
      .withColumn("rep", TextAnalysis.repetitionStats(col("t")))
      .select(col("id"),
        (TextAnalysis.langId(col("t")) === "en" &&
          TextAnalysis.qualityOk(col("st")) &&
          col("rep.dup_2gram_frac") <= 0.2 &&
          col("rep.top_word_frac") <= 0.3).as("keep"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val fused = df.select(col("id"), TextAnalysis.curationKeep(col("t")).as("keep"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(fused == naive)
    assert(fused(0L))            // clean english text passes
    assert(!fused(1L))           // german fails the lang gate
    assert(!fused(2L))           // degenerate repetition fails
    assert(!fused(4L) && !fused(5L)) // too short / empty
  }

  test("fingerprint is deterministic and discriminating") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "alpha beta delta"))
      .toDF("id", "t")
    val fps = df.select(col("id"), TextAnalysis.fingerprint(col("t")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
    assert(fps.values.forall(v => v >= 0 && v < 1000000007L))
  }

  test("quantiles: exact interpolated percentiles of a column") {
    val df = (1 to 101).map(_.toDouble).toDF("v")
    val qs = TextAnalysis.quantiles(df, col("v"), Seq(0.0, 0.25, 0.5, 1.0))
      .orderBy("p").as[(Double, Double)].collect().toSeq
    // 101 values 1..101: position p*(n-1) lands on integers -> exact
    assert(qs == Seq((0.0, 1.0), (0.25, 26.0), (0.5, 51.0), (1.0, 101.0)))
    // interpolation between neighbors: median of 1..4 at 0.5 -> 2.5
    val m = TextAnalysis.quantiles((1 to 4).map(_.toDouble).toDF("v"),
      col("v"), Seq(0.5)).as[(Double, Double)].head()
    assert(m == ((0.5, 2.5)))
  }

  test("vocabulary counts totals and distinct-doc frequencies") {
    val docs = Seq((1L, "The cat and the dog"), (2L, "a CAT")).toDF("doc_id", "text")
    val v = TextAnalysis.vocabulary(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(v("the") == ((2L, 1L)))
    assert(v("cat") == ((2L, 2L)))
    assert(v("dog") == ((1L, 1L)))
    assert(v.size == 5)
  }

  test("topTerms ranks distinctive words above corpus-wide ones") {
    val docs = Seq(
      (1L, "apple apple common"),
      (2L, "banana common"),
      (3L, "cherry common")).toDF("doc_id", "text")
    val top1 = TextAnalysis.topTerms(docs, "doc_id", "text", k = 1)
      .as[(Long, String, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(top1 == Map(1L -> "apple", 2L -> "banana", 3L -> "cherry"))
    // exact rational score: apple = (2 * 3) / (3 * 1) = 2.0
    val s = TextAnalysis.topTerms(docs, "doc_id", "text", k = 1)
      .where($"word" === "apple").select("score").as[Double].head()
    assert(s == 2.0)
  }

  test("bigramCounts: adjacent pairs only; single-word docs contribute none") {
    val docs = Seq((1L, "a b a b"), (2L, "b"), (3L, "A  b")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    // doc1: "a b","b a","a b"; doc3 normalizes to "a b"; doc2: none
    assert(out == Map("a b" -> 3L, "b a" -> 1L))
  }

  test("chunkByTokens: coverage, overlap, no redundant tail, single-chunk doc") {
    val docs = Seq(
      (1L, "a b c d e f g"), // 7 tokens, chunk=3 stride=2 -> starts 0,2,4
      (2L, "x y")            // 2 tokens -> one chunk
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkByTokens(docs, "doc_id", "text",
        chunkTokens = 3, stride = 2)
      .as[(Long, Long, String, Long)].collect().toSet
    // enumeration stops at the window reaching the end: no chunk is a
    // sub-span of its predecessor (a "g"-only chunk would double-weight
    // the tail in downstream pooling)
    assert(out == Set(
      (1L, 0L, "a b c", 3L), (1L, 1L, "c d e", 3L),
      (1L, 2L, "e f g", 3L),
      (2L, 0L, "x y", 2L)))
  }

  test("chunkByTokens: doc shorter than one window stays a single chunk") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text") // 5 < 32
    val out = TextAnalysis.chunkByTokens(docs, "doc_id", "text", 32, 24)
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, 0L, "a b c d e", 5L)))
  }

  test("chunkByTokens: stride == chunkTokens is non-overlapping partition") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkByTokens(docs, "doc_id", "text", 2, 2)
      .as[(Long, Long, String, Long)].collect().sortBy(_._2).toSeq
    assert(out.map(_._3) == Seq("a b", "c d", "e"))
    // every token exactly once
    assert(out.map(_._4).sum == 5L)
  }

  test("scriptStats: per-script fractions over non-whitespace chars") {
    val rows = Seq(
      (1L, "Hello, World"), // 11 non-ws: 10 Latin letters + comma
      (2L, "Привет мир"),   // 9 non-ws, all Cyrillic
      (3L, "你好 ok"),       // 4 non-ws: 2 Han + 2 Latin
      (4L, ""),              // empty: zero fractions, no div-by-zero
      (5L, "ab cd　ef") // NBSP + ideographic space ARE whitespace
    ).toDF("doc_id", "text")
    val out = rows.select(col("doc_id"),
        TextAnalysis.scriptStats(col("text")).as("s"))
      .select(col("doc_id"), col("s.n_chars"), col("s.latin_frac"),
        col("s.cyrillic_frac"), col("s.han_frac"))
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 11L, 10.0 / 11, 0.0, 0.0)))
    assert(out(2L) == ((2L, 9L, 0.0, 1.0, 0.0)))
    assert(out(3L) == ((3L, 4L, 0.5, 0.0, 0.5)))
    assert(out(4L) == ((4L, 0L, 0.0, 0.0, 0.0)))
    assert(out(5L) == ((5L, 6L, 1.0, 0.0, 0.0)))
  }

  test("qualityBuckets: quantile bands ordered by cross-entropy") {
    // 12 docs with 12 distinct CE scores (doc i mixes the common base
    // with i copies of its own word — the scores differ but are NOT
    // monotone in i: unique12 appears 12 times, as often as the common
    // words, so doc 12 actually scores lowest and doc 3 highest)
    val common = "base words shared by every single document here"
    val docs = (1L to 12L).map(i =>
      (i, common + (s" unique$i " * i.toInt))).toDF("doc_id", "text")
    val out = TextAnalysis.qualityBuckets(docs, "doc_id", "text",
        nBuckets = 4)
      .as[(Long, Double, Int)].collect().sortBy(_._1)
    // bucket assignment is monotone in ce
    val byCe = out.sortBy(_._2)
    assert(byCe.map(_._3).toSeq == byCe.map(_._3).toSeq.sorted)
    assert(out.map(_._3).min == 1 && out.map(_._3).max == 4)
    // 12 distinct scores over 4 bands -> 3 per band
    assert(out.groupBy(_._3).view.mapValues(_.length).toMap
      .values.toSet == Set(3))
    intercept[IllegalArgumentException](
      TextAnalysis.qualityBuckets(docs, "doc_id", "text", nBuckets = 1))
  }

  test("unigramCrossEntropy: rare words raise the score; exact value") {
    // corpus: n(a)=7, n(rare)=1, N=8, |V|=2; add-one smoothing:
    // p(a) = 8/11, p(rare) = 2/11
    val docs = Seq((1L, "a a a a"), (2L, "a a a rare")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramCrossEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val ceCommon = -math.log(8.0 / 11.0)
    val ceMixed = (3 * -math.log(8.0 / 11.0) + -math.log(2.0 / 11.0)) / 4
    assert(out(1L)._1 == 4L && math.abs(out(1L)._2 - ceCommon) < 1e-9)
    assert(out(2L)._1 == 4L && math.abs(out(2L)._2 - ceMixed) < 1e-9)
    assert(out(2L)._2 > out(1L)._2)
  }

  test("crossEntropyAgainst: reference prices, OOV unseen price; exact values") {
    // reference: n(a)=3, n(b)=1 -> N=4, |V|=2; add-one prices:
    // p(a)=4/7, p(b)=2/7, unseen=1/7
    val ref = Seq((10L, "a a a b")).toDF("doc_id", "text")
    val tgt = Seq((1L, "a b"), (2L, "a zzz")).toDF("doc_id", "text")
    val out = TextAnalysis.crossEntropyAgainst(tgt, ref, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val ce1 = -(math.log(4.0 / 7) + math.log(2.0 / 7)) / 2
    val ce2 = -(math.log(4.0 / 7) + math.log(1.0 / 7)) / 2
    assert(out(1L)._1 == 2L && out(1L)._2 == 0L &&
      math.abs(out(1L)._3 - ce1) < 1e-9)
    assert(out(2L)._1 == 2L && out(2L)._2 == 1L &&
      math.abs(out(2L)._3 - ce2) < 1e-9)
    // out-of-domain costs more than in-domain under the reference LM
    assert(out(2L)._3 > out(1L)._3)
  }

  test("crossEntropyAgainst: self-scoring degenerates to unigramCrossEntropy") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet").limit(40)
    val self = TextAnalysis.crossEntropyAgainst(corpus, corpus,
        "doc_id", "text")
      .select(col("doc_id"), col("n_oov"),
        round(col("ce_against"), 9).as("ce"))
    assert(self.where(col("n_oov") =!= 0L).count() == 0L)
    val uni = TextAnalysis.unigramCrossEntropy(corpus, "doc_id", "text")
      .select(col("doc_id"), round(col("cross_entropy"), 9).as("ce"))
    assert(rowsOf(self.drop("n_oov")) == rowsOf(uni))
  }

  test("bigramCrossEntropy: exact value; shuffled text scores worse than fluent") {
    // corpus of one doc "a b a b": c(a)=2, c(b)=2, N=4, |V|=2;
    // bigrams: (a,b)x2, (b,a)x1. λ=0.7.
    // p(b|a) = .7*(2/2) + .3*(3/7);  p(a|b) = .7*(1/2) + .3*(3/7)
    val one = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val ce = TextAnalysis.bigramCrossEntropy(one, "doc_id", "text")
      .as[(Long, Long, Double)].collect().head
    val pAB = 0.7 * 1.0 + 0.3 * (3.0 / 7.0)
    val pBA = 0.7 * 0.5 + 0.3 * (3.0 / 7.0)
    val expected = -(2 * math.log(pAB) + math.log(pBA)) / 3
    assert(ce._2 == 3L && math.abs(ce._3 - expected) < 1e-9)

    // same word multiset, fluent repetition vs shuffled transitions:
    // the bigram LM separates them (a unigram LM cannot)
    val docs = Seq(
      (1L, "the cat sat the cat sat the cat sat"),
      (2L, "the the cat sat cat the sat sat cat")).toDF("doc_id", "text")
    val scores = TextAnalysis.bigramCrossEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(scores(2L) > scores(1L))
    val uni = TextAnalysis.unigramCrossEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(math.abs(uni(1L) - uni(2L)) < 1e-12)
  }

  test("bigramCrossEntropy: sub-2-word docs have no row; repartition-invariant") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "two words here")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramCrossEntropy(docs, "doc_id", "text")
    assert(out.select("doc_id").as[Long].collect().toSet == Set(3L))
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet").limit(40)
    val a = TextAnalysis.bigramCrossEntropy(corpus, "doc_id", "text")
    val b = TextAnalysis.bigramCrossEntropy(corpus.repartition(7), "doc_id", "text")
    assert(rowsOf(a) == rowsOf(b))
  }

  test("corpus_datacard: volumes reconcile with the corpus") {
    val card = graft.Queries.all.find(_.name == "corpus_datacard").get
      .fn(spark, sfDir)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val totals = card.agg(sum(col("n_docs")), sum(col("n_tokens"))).head()
    assert(totals.getLong(0) == docs.count())
    assert(totals.getLong(1) ==
      docs.agg(sum(TextAnalysis.wsTokenCount(col("text")))).head().getLong(0))
    // rates are rates
    val rows = card.collect()
    rows.foreach { r =>
      Seq("en_rate", "gopher_ok_rate", "dup_rate").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c=$v")
      }
    }
  }

  test("stripInvisible: zero-width junk vanishes, NBSP becomes a space") {
    def strip(s: String): String =
      Seq(s).toDF("t").select(TextAnalysis.stripInvisible(col("t")))
        .as[String].collect().head
    assert(strip("zero​width") == "zerowidth")
    assert(strip("join‌er‍!") == "joiner!")
    assert(strip("word⁠joiner bom﻿ soft­hyphen") ==
      "wordjoiner bom softhyphen")
    assert(strip("nb space") == "nb space")
    // plain text passes through untouched
    assert(strip("normal text stays") == "normal text stays")
    // the corruption this fixes: one visual word tokenizing as one word
    val n = Seq("a​b c").toDF("t")
      .select(TextAnalysis.wsTokenCount(TextAnalysis.stripInvisible(col("t"))))
      .as[Long].collect().head
    assert(n == 2L)
  }

  test("luhnValid / card redaction: checksum gates what counts as a card") {
    def luhn(s: String): Boolean =
      Seq(s).toDF("d").select(TextAnalysis.luhnValid(col("d")))
        .as[Boolean].collect().head
    // classic test numbers: Visa, Mastercard, Amex (15-digit) pass;
    // a one-digit corruption fails
    assert(luhn("4539148803436467"))
    assert(luhn("5555555555554444"))
    assert(luhn("378282246310005"))
    assert(!luhn("4539148803436468"))
    def scrub(s: String): String =
      Seq(s).toDF("t").select(TextAnalysis.scrubPiiStrict(col("t")))
        .as[String].collect().head
    def nCards(s: String): Int =
      Seq(s).toDF("t").select(TextAnalysis.piiCardCount(col("t")))
        .as[Int].collect().head
    // separator-formatted and bare forms both redact as <CARD>
    assert(scrub("pay 4539 1488 0343 6467 now") == "pay <CARD> now")
    assert(scrub("pay 4539-1488-0343-6467 now") == "pay <CARD> now")
    assert(scrub("pay 4539148803436467 now") == "pay <CARD> now")
    // a Luhn-failing digit run is NOT a card — the long-number rule
    // redacts it as <NUMBER> (order ids keep their distinct label)
    assert(scrub("ref 4539148803436468 ok") == "ref <NUMBER> ok")
    // too-short digit runs never match the card pattern
    assert(nCards("id 123456789012") == 0)
    assert(nCards("a 4539148803436467 b 4012888888881881") == 2)
    // emails/ips still scrub after the card pass
    assert(scrub("u@ex.com 4539148803436467") == "<EMAIL> <CARD>")
    // a valid card's digits EMBEDDED in a longer non-card run stay
    // untouched by the card pass — the long-number rule owns that run
    assert(scrub("ref 1234453914880343646788 ok") == "ref <NUMBER> ok")
    assert(nCards("ref 1234453914880343646788 ok") == 0)
  }

  test("vocabCoverage: per-doc OOV counts, no-word docs surface with zeros") {
    val docs = Seq(
      (1L, "known words here"),
      (2L, "known UNKNOWN zz9"),    // case-folds before the vocab probe
      (3L, ""),                     // no words: zeros, not a missing row
      (4L, "zz1 zz2 zz3 zz4")).toDF("doc_id", "text")
    val vocab = Seq("known", "words", "here").toDF("word")
    val out = TextAnalysis.vocabCoverage(docs, "doc_id", "text", vocab)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 0L, 0.0),
      (2L, 3L, 2L, 0.666667),
      (3L, 0L, 0L, 0.0),
      (4L, 4L, 4L, 1.0)))
    // the vocab side must be a broadcast hash join, never shuffled
    val plan = TextAnalysis.vocabCoverage(docs, "doc_id", "text", vocab)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("c4CleanLines: each published line rule fires on its own counterexample") {
    def clean(s: String): String =
      Seq(s).toDF("t").select(TextAnalysis.c4CleanLines(col("t")))
        .as[String].collect().head
    val kept = "this line ends with a period."
    // no terminal punctuation -> dropped
    assert(clean(kept + "\nno terminal punctuation on this line") == kept)
    // terminal ? ! and end-quote all count as terminal marks
    assert(clean("is this line long enough here?\nthis one is long enough too!\nhe said \"this is long enough.\"")
      .split("\n").length == 3)
    // fewer than 5 words -> dropped even with punctuation
    assert(clean(kept + "\ntoo short.") == kept)
    // the word javascript (any case) -> dropped
    assert(clean(kept + "\nplease enable JavaScript to continue viewing.") == kept)
    // threshold is parameterized
    assert(clean("one two three.") == "")
    assert(Seq("one two three.").toDF("t")
      .select(TextAnalysis.c4CleanLines(col("t"), minLineWords = 3))
      .as[String].collect().head == "one two three.")
  }

  test("c4PageOk: each published page rule fires on its own counterexample") {
    val goodCleaned = "one good sentence here now. two good sentences here now. three good sentences here now."
    def ok(raw: String, cleaned: String = goodCleaned,
           bad: Seq[String] = Nil): Boolean =
      Seq((raw, cleaned)).toDF("r", "c")
        .select(TextAnalysis.c4PageOk(col("r"), col("c"), badWords = bad))
        .as[Boolean].collect().head
    assert(ok("a perfectly fine page of text"))
    // curly brace anywhere on the RAW page -> dropped
    assert(!ok("function f() { return 1 }"))
    // lorem ipsum (case-insensitive) -> dropped
    assert(!ok("Lorem Ipsum dolor sit amet"))
    // fewer than minSentences sentences in the CLEANED text -> dropped
    assert(!ok("fine raw page", cleaned = "only two sentences. right here."))
    // bad words match on WORD boundaries of the raw page, not substrings
    assert(!ok("this page mentions dup once", bad = Seq("dup")))
    assert(ok("no holdup in this page", bad = Seq("dup")))
    // edge punctuation must not shield a blocklisted word...
    assert(!ok("they said dup.", bad = Seq("dup")))
    assert(!ok("(dup) appears parenthesized", bad = Seq("dup")))
    assert(!ok("she wrote \"dup\" in quotes", bad = Seq("dup")))
    // ...but word-INTERIOR punctuation still never matches
    assert(ok("the dup-licated hyphen stays safe", bad = Seq("dup")))
    // matching is case-insensitive via the normalized word split
    assert(!ok("this page mentions DUP once", bad = Seq("dup")))
    // the sentence count uses the LINE rule's terminal set: a page of
    // quote-terminated speech lines (kept by c4CleanLines, zero [.!?])
    // counts them as sentences instead of being wrongly dropped
    assert(ok("fine raw page", cleaned =
      "she said \"no way at all\"\nhe said \"not ever again\"\nthey said \"we shall see\""))
    // a quote right after [.!?] is the SAME terminal, not a second one
    assert(!ok("fine raw page", cleaned =
      "she said \"stop it now.\"\nhe said \"fine then.\""))
  }
}
