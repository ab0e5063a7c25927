package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance sampling ([[Importance]]): feature extraction,
  * likelihood-ratio direction, determinism, and selection mechanics. */
class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private val target = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "a cat and a dog sat together"),
    (3L, "the dog sat on the rug")).toDF("doc_id", "text")

  private val raw = Seq(
    (10L, "the cat sat on the mat"),        // verbatim target-like
    (11L, "cat dog sat mat rug"),           // target vocabulary
    (12L, "quantum flux capacitor array"),  // disjoint vocabulary
    (13L, "zzz qqq xxx www vvv uuu"),       // disjoint vocabulary
    (14L, "")).toDF("doc_id", "text")       // no features -> no row

  test("featureRows: unigrams + bigrams, empty docs drop") {
    val f = Importance.featureRows(
      Seq((1L, "a b c"), (2L, ""), (3L, "solo")).toDF("doc_id", "text"),
      "doc_id", "text")
    val counts = f.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    // "a b c" -> 3 unigrams + 2 bigrams; "solo" -> 1 unigram, no bigram
    assert(counts == Map(1L -> 5L, 3L -> 1L))
  }

  test("logWeights: target-like docs outweigh disjoint docs; empty docs absent") {
    val w = Importance.logWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.keySet == Set(10L, 11L, 12L, 13L))
    assert(w(10L) > w(12L) && w(10L) > w(13L))
    assert(w(11L) > w(12L))
  }

  test("logWeights is repartition-invariant") {
    val a = Importance.logWeights(raw, target, "doc_id", "text")
    val b = Importance.logWeights(raw.repartition(7), target.repartition(3),
      "doc_id", "text")
    assert(rowsOf(a) == rowsOf(b))
  }

  test("dsirSelect: k rows, scores sorted desc, gumbel preserves strong ordering") {
    val sel = Importance.dsirSelect(raw, target, "doc_id", "text", k = 3)
      .collect()
    assert(sel.length == 3)
    val scores = sel.map(_.getDouble(3))
    assert(scores.sameElements(scores.sortBy(-_)))
    // the verbatim target-like doc must beat the disjoint docs even
    // after Gumbel noise (weight gap >> noise range at this sf)
    assert(sel.map(_.getLong(0)).contains(10L))
  }

  test("seededWeights: nBuckets rows in [-1, 1), deterministic") {
    val w = Importance.seededWeights(spark, 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.size == 100)
    assert(w.values.forall(v => v >= -1.0 && v < 1.0))
    val again = Importance.seededWeights(spark, 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w == again)
  }

  test("classifierScore: sigmoid of mean feature weight; empty docs drop") {
    // constant weight table: every feature contributes 0.5, so the mean
    // is 0.5 and every scored doc gets sigmoid(0.5) regardless of length
    val wts = spark.range(10000)
      .select(col("id").as("bucket"), lit(0.5).as("weight"))
    val out = Importance.classifierScore(raw, wts, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_feats"), r.getAs[Double]("score")))
    val expected = BigDecimal(1.0 / (1.0 + math.exp(-0.5)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(_._1).toSet == Set(10L, 11L, 12L, 13L)) // doc 14 empty
    assert(out.forall(_._3 == expected))
    // "cat dog sat mat rug": 5 unigrams + 4 bigrams
    assert(out.find(_._1 == 11L).get._2 == 9L)
  }

  test("classifierScore is repartition-invariant under seeded weights") {
    val w = Importance.seededWeights(spark)
    val a = Importance.classifierScore(raw, w, "doc_id", "text")
    val b = Importance.classifierScore(raw.repartition(7), w, "doc_id", "text")
    assert(rowsOf(a) == rowsOf(b))
  }

  private def plantedText(v: Vector[String], seed: Int, len: Int): String =
    (0 until len).map(j => v((seed + j * 2) % v.size)).mkString(" ")
  private val posV = Vector("alpha", "bravo", "charlie", "delta", "echo")
  private val negV = Vector("zulu", "yankee", "xray", "whiskey", "victor")

  test("trainClassifier separates a planted fixture and generalizes to holdout") {
    val train = ((0 until 20).map(i => (i.toLong, plantedText(posV, i, 8), 1)) ++
        (0 until 20).map(i => ((i + 40).toLong, plantedText(negV, i, 8), 0)))
      .toDF("doc_id", "text", "label")
    val wts = Importance.trainClassifier(train, "doc_id", "text", "label",
      nBuckets = 2048, iters = 25)
    assert(wts.count() == 2048) // closed over the full bucket space
    // holdout: unseen word mixes from the same vocabularies
    val holdout = ((0 until 8).map(i =>
        ((i + 100).toLong, plantedText(posV, i + 2, 5), 1)) ++
        (0 until 8).map(i => ((i + 110).toLong, plantedText(negV, i + 2, 5), 0)))
      .toDF("doc_id", "text", "label")
    val scored = Importance.classifierScore(holdout, wts, "doc_id", "text",
        nBuckets = 2048)
      .join(holdout.select(col("doc_id"), col("label")), Seq("doc_id"))
      .select(col("label"), col("score")).as[(Int, Double)].collect()
    assert(scored.length == 16)
    assert(scored.forall { case (y, s) => (s >= 0.5) == (y == 1) })
    // separation is decisive, not marginal
    assert(scored.filter(_._1 == 1).map(_._2).min >
      scored.filter(_._1 == 0).map(_._2).max + 0.2)
  }

  test("trainClassifier is deterministic across input partitionings") {
    val train = ((0 until 12).map(i => (i.toLong, plantedText(posV, i, 6), 1)) ++
        (0 until 12).map(i => ((i + 40).toLong, plantedText(negV, i, 6), 0)))
      .toDF("doc_id", "text", "label")
    val a = Importance.trainClassifier(train, "doc_id", "text", "label",
      nBuckets = 512, iters = 10)
    val b = Importance.trainClassifier(train.repartition(7),
      "doc_id", "text", "label", nBuckets = 512, iters = 10)
    assert(rowsOf(a) == rowsOf(b))
  }

  test("trainClassifier sampleFraction: trains on the hash subset, still separates") {
    val train = ((0 until 40).map(i => (i.toLong, plantedText(posV, i, 8), 1)) ++
        (0 until 40).map(i => ((i + 100).toLong, plantedText(negV, i, 8), 0)))
      .toDF("doc_id", "text", "label")
    val wts = Importance.trainClassifier(train, "doc_id", "text", "label",
      nBuckets = 2048, iters = 20, sampleFraction = 0.5)
    // sampled training must equal training on the materialized sample
    val sampled = Mixing.deterministicSample(train, "doc_id", 0.5, "dsir_ts")
    assert(sampled.count() < 80) // the subset is real
    val direct = Importance.trainClassifier(sampled, "doc_id", "text", "label",
      nBuckets = 2048, iters = 20)
    assert(rowsOf(wts) == rowsOf(direct))
    // and the half-corpus model still separates the full corpus
    val scored = Importance.classifierScore(train, wts, "doc_id", "text", 2048)
      .join(train.select(col("doc_id"), col("label")), Seq("doc_id"))
      .select(col("label"), col("score")).as[(Int, Double)].collect()
    assert(scored.forall { case (y, s) => (s >= 0.5) == (y == 1) })
  }

  test("trained weights roundtrip through parquet into classifierScore") {
    val train = ((0 until 10).map(i => (i.toLong, plantedText(posV, i, 6), 1)) ++
        (0 until 10).map(i => ((i + 40).toLong, plantedText(negV, i, 6), 0)))
      .toDF("doc_id", "text", "label")
    val wts = Importance.trainClassifier(train, "doc_id", "text", "label",
      nBuckets = 512, iters = 10)
    val path = java.nio.file.Files.createTempDirectory("clfw").toString + "/w"
    wts.write.parquet(path)
    val direct = Importance.classifierScore(train, wts, "doc_id", "text", 512)
    val loaded = Importance.classifierScore(train,
      spark.read.parquet(path), "doc_id", "text", 512)
    assert(rowsOf(direct) == rowsOf(loaded))
  }

  test("classifierScoreCol (map-only) agrees exactly with classifierScore") {
    // both routes sum the same 12-dp weights exactly (decimal vs scaled
    // long), so the rounded scores must be bit-identical
    val wts = Importance.seededWeights(spark)
    val arr = Importance.weightArray(wts)
    val viaAgg = Importance.classifierScore(raw, wts, "doc_id", "text")
      .select(col("doc_id"), col("score"))
    val viaCol = raw.select(col("doc_id"),
        Importance.classifierScoreCol(col("text"), arr).as("score"))
      .where(col("score").isNotNull) // empty docs: no row vs null score
    assert(rowsOf(viaAgg) == rowsOf(viaCol))
    // trained weights route identically
    val train = ((0 until 8).map(i => (i.toLong, plantedText(posV, i, 5), 1)) ++
        (0 until 8).map(i => ((i + 40).toLong, plantedText(negV, i, 5), 0)))
      .toDF("doc_id", "text", "label")
    val tw = Importance.trainClassifier(train, "doc_id", "text", "label",
      nBuckets = 512, iters = 5)
    assert(rowsOf(
      Importance.classifierScore(train, tw, "doc_id", "text", 512)
        .select(col("doc_id"), col("score"))) ==
      rowsOf(train.select(col("doc_id"),
        Importance.classifierScoreCol(col("text"),
          Importance.weightArray(tw, 512)).as("score"))))
  }

  test("native graft_clf_score is bit-identical to the builtin scalar route") {
    graft.plans.GraftExtensions.register(spark)
    val wts = Importance.weightArray(Importance.seededWeights(spark))
    // adversarial normalization cases: tabs/newlines/multi-space,
    // unicode uppercase, single word, empty, punctuation-only token
    val docs = Seq(
      (1L, "The  Cat\tSat\n on the MAT"),
      (2L, "ÀLPHA Ünïcode ß cases"),
      (3L, "solo"),
      (4L, ""),
      (5L, "  leading and trailing  "),
      (6L, "a b c d e f g h i j k l m n o p")
    ).toDF("doc_id", "text")
    val builtin = docs.select(col("doc_id"),
      Importance.classifierScoreCol(col("text"), wts).as("score"))
    val native = docs.select(col("doc_id"),
      Importance.classifierScoreColNative(col("text"), wts).as("score"))
    assert(rowsOf(builtin) == rowsOf(native))
    // and across the corpus fixture
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(rowsOf(corpus.select(col("doc_id"),
        Importance.classifierScoreCol(col("text"), wts).as("score"))) ==
      rowsOf(corpus.select(col("doc_id"),
        Importance.classifierScoreColNative(col("text"), wts).as("score"))))
  }

  test("thresholdSweep: one-pass keep-rate curve, monotone, exact counts") {
    val scores = Seq(0.1, 0.2, 0.5, 0.5, 0.9).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("doc_id", "score")
    val out = Importance.thresholdSweep(scores, "score", Seq(0.2, 0.5, 0.8))
      .orderBy("threshold")
      .as[(Double, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (0.2, 5L, 4L, 0.8),
      (0.5, 5L, 3L, 0.6),
      (0.8, 5L, 1L, 0.2)))
    // keep-rate is monotone non-increasing in the threshold
    assert(out.map(_._4).zip(out.map(_._4).tail).forall { case (a, b) => a >= b })
    // empty input: zero counts, rate 0, no division blowup
    val empty = Importance.thresholdSweep(
      scores.where(col("score") > 10), "score", Seq(0.5))
      .as[(Double, Long, Long, Double)].collect().toSeq
    assert(empty == Seq((0.5, 0L, 0L, 0.0)))
  }

  test("gumbel draw is deterministic per key and bounded-tail") {
    val g = spark.range(1000)
      .select(Importance.gumbel(col("id"), "t").as("g"))
      .agg(min("g"), max("g")).head()
    // Gumbel(0,1): P(g < -2) ~ 6e-4, P(g > 10) ~ 4.5e-5
    assert(g.getDouble(0) > -3.0 && g.getDouble(1) < 15.0)
    val a = spark.range(100).select(Importance.gumbel(col("id"), "t").as("g"))
    val b = spark.range(100).repartition(9)
      .select(Importance.gumbel(col("id"), "t").as("g"))
    assert(rowsOf(a) == rowsOf(b))
  }
}
