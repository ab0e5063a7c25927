package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.llm.{Dedup, Similarity}

/** Direct unit coverage for the round-4 native expressions: each must be
  * value-equivalent to the builtin composition it replaces (graft_dot
  * BITWISE-equal — its accumulation order is part of the oracle
  * contract). */
class NativeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def registered() = GraftExtensions.register(spark)

  test("graft_dot is bitwise-equal to the zip_with/aggregate fold") {
    registered()
    val df = Seq(
      (Seq(1.0, 2.5, -3.25, 1e-7), Seq(4.0, -1.5, 2.0, 1e7)),
      (Seq(0.1, 0.2, 0.3), Seq(0.7, 0.8, 0.9)),
      (Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
    val rows = df.select(
      call_function("graft_dot", col("a"), col("b")).as("native"),
      Similarity.dot(col("a"), col("b")).as("fold")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // length mismatch and null element -> null (zip_with pad semantics)
    val bad = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
    assert(bad.select(call_function("graft_dot", col("a"), col("b"))).head().isNullAt(0))
    val withNull = Seq((Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0)))).toDF("a", "b")
    assert(withNull.select(call_function("graft_dot", col("a"), col("b"))).head().isNullAt(0))
  }

  test("graft_dot codegen COMPILES for non-nullable inputs (no interpreted fallback)") {
    registered()
    // literal-built arrays are non-nullable: before the nullable=true
    // override, nullSafeCodeGen's non-nullable path left `ev.isNull`
    // undeclared and janino rejected the class, silently degrading every
    // containing plan to interpreted eval. CODEGEN_ONLY turns that
    // silent fallback into a test failure.
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val r = spark.range(1).select(
        call_function("graft_dot",
          array(lit(1.0), lit(2.0)), array(lit(3.0), lit(4.0))).as("d"))
        .head().getDouble(0)
      assert(r == 11.0)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("graft_sorted_intersect_size matches array_intersect on sorted distinct arrays") {
    registered()
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)),
      (Seq(1L, 2L), Seq(3L, 4L)),
      (Seq.empty[Long], Seq(1L)),
      (Seq(-5L, 0L, 7L), Seq(-5L, 0L, 7L))).toDF("a", "b")
    val rows = df.select(
      call_function("graft_sorted_intersect_size", col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("graft_minhash_sig: identical sets -> identical signatures; est tracks jaccard") {
    registered()
    val df = Seq(
      (1L, Seq(10L, 20L, 30L, 40L)),
      (2L, Seq(10L, 20L, 30L, 40L)),   // identical to 1
      (3L, Seq(99L, 98L, 97L, 96L)))   // disjoint
      .toDF("id", "sh")
    val sigs = df.select(col("id"),
      call_function("graft_minhash_sig", col("sh"), lit(64)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L).size == 64)
    assert(sigs(1L) == sigs(2L))
    val agree = sigs(1L).zip(sigs(3L)).count { case (x, y) => x == y }
    assert(agree < 16, s"disjoint sets should share few signature positions, got $agree")
  }

  test("graft_simhash64: identical word lists -> identical fingerprints, near lists -> small hamming") {
    registered()
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val near = base.replace("dog", "cat")
    val far = "completely different words in this unrelated sentence here now ok"
    val df = Seq((1L, base), (2L, base), (3L, near), (4L, far)).toDF("id", "text")
    val fp = Dedup.simhashFingerprints(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(3L)) <= 16)
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(4L)) >
      java.lang.Long.bitCount(fp(1L) ^ fp(3L)))
  }

  test("graft_nfc composes decomposed forms; identity on normalized text; codegen compiles") {
    registered()
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val decomposed = "cafe\u0301" // 'e' + combining acute
      val composed = "caf\u00e9"    // precomposed
      val rows = Seq(
        (decomposed, composed),
        ("plain ascii", "plain ascii"),
        (composed, composed) // already NFC: identity
      ).toDF("in", "expected")
      val out = rows.selectExpr("graft_nfc(in) AS got", "expected")
        .as[(String, String)].collect()
      out.foreach { case (got, expected) => assert(got == expected) }
      // equality across forms holds only AFTER normalization
      assert(decomposed != composed)
      val eq = Seq((decomposed, composed)).toDF("a", "b")
        .selectExpr("graft_nfc(a) = graft_nfc(b) AS e")
        .as[Boolean].head()
      assert(eq)
      // null propagates
      val n = rows.limit(1).selectExpr("graft_nfc(CAST(NULL AS STRING)) AS g")
        .collect().head.isNullAt(0)
      assert(n)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("graft_deflate_len: order, types, nulls; codegen compiles") {
    registered()
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val rep = "spark " * 200                    // 1200 bytes, repetitive
      val rnd = (0 until 10).map(g =>             // 320 hex chars, ~random
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"x-$g".getBytes("UTF-8")).map("%02x".format(_)).mkString
      ).mkString
      val out = Seq((1L, rep), (2L, rnd)).toDF("id", "t")
        .selectExpr("id", "graft_deflate_len(t) AS dl",
          "octet_length(t) AS n")
        .as[(Long, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      val (repDl, repN) = out(1L)
      val (rndDl, rndN) = out(2L)
      // repetitive text deflates below 20% of raw; hex "noise" carries
      // 4 bits/char entropy, so deflate can never reach below 40%
      assert(repDl.toDouble / repN < 0.2, s"rep ratio ${repDl.toDouble / repN}")
      assert(rndDl.toDouble / rndN > 0.4, s"rnd ratio ${rndDl.toDouble / rndN}")
      // binary input accepted; equals the string form of the same bytes
      val b = Seq(Tuple1(rep.getBytes("UTF-8"))).toDF("b")
        .selectExpr("graft_deflate_len(b) AS dl").as[Long].head()
      assert(b == repDl)
      // null propagates; empty input deflates to a few header bytes
      assert(Seq(Tuple1(Option.empty[String])).toDF("t")
        .selectExpr("graft_deflate_len(t)").head().isNullAt(0))
      // compressionStats: flags on both tails, empty text -> null ratio
      val st = graft.llm.TextAnalysis.compressionStats(
          Seq((1L, rep), (2L, rnd), (3L, "")).toDF("doc_id", "text"),
          "doc_id", "text")
        .as[(Long, Long, Option[Double], Boolean, Boolean)]
        .collect().map(r => r._1 -> r).toMap
      assert(st(1L)._4 && !st(1L)._5)
      assert(!st(2L)._4 && st(2L)._5)
      assert(st(3L)._3.isEmpty && !st(3L)._4 && !st(3L)._5)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("graft_interpolate codegen COMPILES for nullable and non-nullable inputs") {
    registered()
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      // literal (non-nullable) inputs: the custom doGenCode must still
      // declare its isNull local (the graft_dot janino lesson)
      val lit1 = spark.range(1).select(
        call_function("graft_interpolate",
          lit("a %%k%% b"), map(lit("k"), lit("V"))).as("s"))
        .head().getString(0)
      assert(lit1 == "a V b")
      // nullable column inputs through the same CODEGEN_ONLY gate
      val df = Seq((Some("x %%a%%"), Option(Map("a" -> "1"))),
        (Option.empty[String], Option(Map("a" -> "1")))).toDF("s", "m")
      val out = df.select(call_function("graft_interpolate", col("s"), col("m"))).collect()
      assert(out(0).getString(0) == "x 1" && out(1).isNullAt(0))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("graft_unigram_encode/count codegen COMPILE; Viterbi segmentation") {
    registered()
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val pieces = graft.plans.UnigramEncode.serialize(Seq(
        "ab" -> math.log(0.4), "a" -> math.log(0.2),
        "b" -> math.log(0.2), "c" -> math.log(0.2)))
      val df = Seq("abc ab").toDF("t")
      val toks = df.select(
        call_function("graft_unigram_encode", col("t"), lit(pieces)))
        .head().getSeq[String](0)
      assert(toks == Seq("ab", "c", "ab"))
      val n = df.select(
        call_function("graft_unigram_count", col("t"), lit(pieces)))
        .head().getLong(0)
      assert(n == 3L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("graft_clf_score codegen COMPILES; nulls and featureless docs -> null") {
    registered()
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      // weights: bucket b has scaled weight b (tiny table keeps the
      // expected mean computable by hand below)
      val wts = (0 until 16).map(_.toLong).mkString(",")
      val df = Seq(Some("hello world"), Some(""), Option.empty[String])
        .toDF("t")
      val out = df.select(
        call_function("graft_clf_score", col("t"), lit(wts), lit("s"))).collect()
      assert(!out(0).isNullAt(0)) // 3 features, some score
      assert(out(1).isNullAt(0))  // featureless
      assert(out(2).isNullAt(0))  // null text
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }
  test("graft_greedy_pack: fold rule; codegen COMPILES") {
    registered()
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val out = Seq(Seq(4L, 5L, 6L, 12L, 3L, 7L, 10L)).toDF("t")
        .selectExpr("graft_greedy_pack(t, 10) AS p")
        .as[Seq[Int]].collect().head
      assert(out == Seq(0, 0, 1, 2, 3, 3, 4))
      // empty input, oversize-first, exact fit
      assert(Seq(Seq.empty[Long]).toDF("t")
        .selectExpr("graft_greedy_pack(t, 10) AS p")
        .as[Seq[Int]].collect().head.isEmpty)
      assert(Seq(Seq(99L, 1L)).toDF("t")
        .selectExpr("graft_greedy_pack(t, 10) AS p")
        .as[Seq[Int]].collect().head == Seq(0, 1))
      assert(Seq(Seq(10L, 10L)).toDF("t")
        .selectExpr("graft_greedy_pack(t, 10) AS p")
        .as[Seq[Int]].collect().head == Seq(0, 1))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("graft_pq_encode / graft_adc: hand values, codegen COMPILES, fail-fast dims") {
    registered()
    // m=2, dsub=2, k=2: subspace 0 centroids {(0,0),(10,10)},
    // subspace 1 centroids {(1,1),(-1,-1)}
    val books: Array[Array[Array[Double]]] = Array(
      Array(Array(0.0, 0.0), Array(10.0, 10.0)),
      Array(Array(1.0, 1.0), Array(-1.0, -1.0)))
    val m = PqKernel.serialize(2, 2, 2, books)
    // round-trip exactness of the plan-literal serialization
    val parsed = PqKernel.parse(m)
    assert(parsed.m == 2 && parsed.dsub == 2 && parsed.k == 2)
    assert(parsed.flat.toSeq == Seq(0.0, 0.0, 10.0, 10.0, 1.0, 1.0, -1.0, -1.0))
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val df = Seq((Seq(9.0, 9.5, -0.5, -0.9), Seq(1, 1))).toDF("v", "codes")
      // encode: (9,9.5) nearer (10,10); (-0.5,-0.9) nearer (-1,-1)
      val enc = df.select(call_function("graft_pq_encode", col("v"), lit(m)))
        .as[Seq[Int]].collect().head
      assert(enc == Seq(1, 1), enc.mkString(","))
      // ADC vs codes (1,1): (9-10)^2+(9.5-10)^2 + (-0.5+1)^2+(-0.9+1)^2
      val adc = df.select(
        call_function("graft_adc", col("v"), col("codes"), lit(m)))
        .as[Double].collect().head
      assert(math.abs(adc - (1.0 + 0.25 + 0.25 + 0.01)) < 1e-12)
      // ties -> lowest centroid index (the Similarity.nearest rule)
      val tie = Seq(Seq(5.0, 5.0, 0.0, 0.0)).toDF("v")
        .select(call_function("graft_pq_encode", col("v"), lit(m)))
        .as[Seq[Int]].collect().head
      assert(tie.head == 0, s"tie must go to centroid 0, got ${tie.head}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
    // fail-fast: wrong query dim / wrong code count / out-of-range code
    // surface descriptive errors, not a raw AIOOBE deep in a task
    def failsWith(df: org.apache.spark.sql.DataFrame, frag: String): Unit = {
      val e = intercept[Exception] { df.collect() }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: chain(t.getCause)
      assert(chain(e).exists(s => s != null && s.contains(frag)),
        s"expected '$frag' in: ${chain(e).mkString(" | ")}")
    }
    failsWith(Seq((Seq(1.0, 2.0), Seq(0, 0))).toDF("v", "c")
      .select(call_function("graft_adc", col("v"), col("c"), lit(m))),
      "2 dims but the PQ model expects 4")
    failsWith(Seq((Seq(1.0, 2.0, 3.0, 4.0), Seq(0))).toDF("v", "c")
      .select(call_function("graft_adc", col("v"), col("c"), lit(m))),
      "1 entries but the PQ model has m=2")
    failsWith(Seq((Seq(1.0, 2.0, 3.0, 4.0), Seq(0, 7))).toDF("v", "c")
      .select(call_function("graft_adc", col("v"), col("c"), lit(m))),
      "outside [0, 2)")
    failsWith(Seq(Seq(1.0, 2.0, 3.0)).toDF("v")
      .select(call_function("graft_pq_encode", col("v"), lit(m))),
      "3 dims but the PQ model expects 4")
  }
}
