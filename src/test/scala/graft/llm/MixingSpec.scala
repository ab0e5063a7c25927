package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MixingSpec extends SparkSpec {
  import spark.implicits._

  private def keys(n: Int) = (1L to n.toLong).toDF("k")

  test("deterministicSample: stable under repartitioning, rate is close, salts independent") {
    val df = keys(4000)
    val a = Mixing.deterministicSample(df, "k", 0.25).as[Long].collect().toSet
    val b = Mixing.deterministicSample(df.repartition(7), "k", 0.25)
      .as[Long].collect().toSet
    assert(a == b) // membership survives repartitioning (Spark sample's doesn't)
    assert(math.abs(a.size / 4000.0 - 0.25) < 0.03)
    val other = Mixing.deterministicSample(df, "k", 0.25, salt = "other")
      .as[Long].collect().toSet
    assert(other != a)
    // nesting: a 0.25 sample of the full set contains the 0.1 sample?
    // No — thresholds nest for the SAME salt: bucket < t(0.1) implies < t(0.25)
    val tighter = Mixing.deterministicSample(df, "k", 0.1).as[Long].collect().toSet
    assert(tighter.subsetOf(a))
  }

  test("hexThreshold boundaries: 0 drops all, 1 keeps even bucket ffffffff, monotone") {
    assert(Mixing.hexThreshold(0.0) == "00000000") // no bucket sorts below it
    assert(Mixing.hexThreshold(1.0) > "ffffffff")  // keep-all survives the max bucket
    assert(Mixing.hexThreshold(0.25) == "40000000")
    val ps = Seq(0.0, 0.1, 0.25, 0.5, 0.8, 0.999, 1.0)
    assert(ps.map(Mixing.hexThreshold) == ps.map(Mixing.hexThreshold).sorted)
  }

  test("mixStrata applies per-stratum rates with default for the rest") {
    val df = (1L to 3000L).toDF("k")
      .withColumn("s", when(col("k") % 3 === 0, "a")
        .when(col("k") % 3 === 1, "b").otherwise("c"))
    val out = Mixing.mixStrata(df, "s", "k",
      rates = Map("a" -> 0.0, "b" -> 1.0), defaultRate = 0.5)
    val byS = out.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(!byS.contains("a"))          // rate 0 -> nothing survives
    assert(byS("b") == 1000L)           // rate 1 -> everything survives
    assert(math.abs(byS("c") / 1000.0 - 0.5) < 0.06)
  }

  test("upsample emits floor(rate) or ceil(rate) copies, expected multiplicity ~ rate") {
    val out = Mixing.upsample(keys(2000), "k", 2.5)
    val per = out.groupBy("k").count().as[(Long, Long)].collect()
    assert(per.forall { case (_, c) => c == 2L || c == 3L })
    val mean = per.map(_._2).sum.toDouble / per.length
    assert(math.abs(mean - 2.5) < 0.05)
    assert(per.length == 2000) // rate >= 1 keeps every key
    // rate 0.4: only a bucket-selected subset survives, single copies
    val down = Mixing.upsample(keys(2000), "k", 0.4)
    val dper = down.groupBy("k").count().as[(Long, Long)].collect()
    assert(dper.forall(_._2 == 1L))
    assert(math.abs(dper.length / 2000.0 - 0.4) < 0.04)
  }

  test("topKPerStratum keeps k best per stratum with deterministic tie-break") {
    val df = Seq(
      (1L, "a", 10), (2L, "a", 30), (3L, "a", 30), (4L, "a", 5),
      (5L, "b", 7)).toDF("id", "s", "score")
    val out = Mixing.topKPerStratum(df, "s", col("score"), "id", k = 2)
      .select("id").as[Long].collect().toSet
    assert(out == Set(2L, 3L, 5L)) // ties at 30 break by id; b has only one row
    // the physical plan must carry the WindowGroupLimit pushdown (rank
    // filter applied during the per-stratum sort, not after it)
    val plan = Mixing.topKPerStratum(df, "s", col("score"), "id", k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("temperatureWeights: T=1 natural, large T near-uniform, weights sum to 1") {
    val df = (1L to 1000L).toDF("k")
      .withColumn("s", when(col("k") <= 900, "big").otherwise("small"))
    val t1 = Mixing.temperatureWeights(df, "s", 1.0)
      .as[(String, Long, Double)].collect().map(t => t._1 -> t._3).toMap
    assert(math.abs(t1("big") - 0.9) < 1e-9)
    val t100 = Mixing.temperatureWeights(df, "s", 100.0)
      .as[(String, Long, Double)].collect().map(t => t._1 -> t._3).toMap
    assert(math.abs(t100("big") - 0.5) < 0.01)
    assert(math.abs(t1.values.sum - 1.0) < 1e-9)
    assert(math.abs(t100.values.sum - 1.0) < 1e-9)
  }

  test("splitByHash: disjoint exhaustive splits, stable under growth") {
    val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val df = (1L to 2000L).toDF("k")
    val out = Mixing.splitByHash(df, "k", weights)
      .as[(Long, String)].collect().toMap
    // exhaustive: every key gets exactly one named split
    assert(out.size == 2000)
    assert(out.values.toSet.subsetOf(Set("train", "val", "test")))
    // proportions close to the weights
    val counts = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") / 2000.0 - 0.8) < 0.03)
    assert(math.abs(counts("val") / 2000.0 - 0.1) < 0.03)
    assert(math.abs(counts("test") / 2000.0 - 0.1) < 0.03)
    // stability: a key's split never changes when the corpus grows
    val grown = Mixing.splitByHash((1L to 4000L).toDF("k"), "k", weights)
      .as[(Long, String)].collect().toMap
    assert(out.forall { case (k, s) => grown(k) == s })
    // a different salt draws an independent assignment
    val other = Mixing.splitByHash(df, "k", weights, salt = "other")
      .as[(Long, String)].collect().toMap
    assert(out.exists { case (k, s) => other(k) != s })
    // invalid weights fail fast
    intercept[IllegalArgumentException](
      Mixing.splitByHash(df, "k", Seq("a" -> 0.5, "b" -> 0.6)))
    intercept[IllegalArgumentException](
      Mixing.splitByHash(df, "k", Seq("a" -> 0.5, "a" -> 0.5)))
  }

  test("tokenBudgetSample: budget honored with <= 1 doc overshoot per source") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val budget = 1500L
    val out = Mixing.tokenBudgetSample(docs, "doc_id", "text", "source", budget)
    val bySource = out.groupBy("source")
      .agg(sum("n_tokens").as("tot"), max("tok_before").as("maxBefore"),
        max("n_tokens").as("maxTok"))
      .collect()
    // every source in the corpus contributes
    assert(bySource.length ==
      docs.select("source").distinct().count().toInt)
    bySource.foreach { r =>
      // exclusive prefix of every admitted doc < budget...
      assert(r.getLong(2) < budget)
      // ...so the total overshoots by at most one document
      assert(r.getLong(1) - budget <= r.getLong(3))
    }
    // deterministic + repartition-invariant
    val again = Mixing.tokenBudgetSample(docs.repartition(13),
      "doc_id", "text", "source", budget)
    assert(rowsOf(out) == rowsOf(again))
  }

  test("tokenBudgetSample: exact admission order on a controlled corpus") {
    // one source; ranks order ids deterministically — replay the
    // md5-rank cumsum by hand and compare the admitted set exactly
    val docs = (1L to 20L).map(i => (i, "w " * i.toInt, "s"))
      .toDF("doc_id", "text", "source")
    val budget = 50L
    val ranked = (1L to 20L)
      .map(i => i -> java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
      .sortBy(_._2)
    val expected = scala.collection.mutable.Map.empty[Long, Long]
    var run = 0L
    ranked.foreach { case (i, _) =>
      if (run < budget) { expected(i) = run; run += i } // doc i has i tokens
    }
    val got = Mixing.tokenBudgetSample(docs, "doc_id", "text", "source", budget)
      .select($"doc_id", $"tok_before").as[(Long, Long)].collect().toMap
    // the admitted SET and each doc's exclusive running total — the
    // tok_before column is the one that silently corrupts if the
    // offsets branch and the join branch ever disagree on bucketing
    assert(got == expected.toMap)
  }

  test("tokenBudgetSampleEpochs: overshoot bound, cap, single-pass equivalence") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // budget ≈ several source passes with maxEpochs binding nowhere ↔
    // partial epoch biting: overshoot per source stays <= one document
    val budget = 1000L
    val out = Mixing.tokenBudgetSampleEpochs(docs, "doc_id", "text",
      "source", budget, maxEpochs = 5)
    val bySource = out.groupBy("source")
      .agg(sum("n_tokens").as("tot"), max("tok_before").as("maxBefore"),
        max("n_tokens").as("maxTok"), max("copy_idx").as("maxCopy"))
      .collect()
    bySource.foreach { r =>
      assert(r.getLong(2) < budget) // exclusive prefix of every admission
      assert(r.getLong(1) - budget <= r.getLong(3)) // <= 1-doc overshoot
      assert(r.getLong(4) < 5)
    }
    // huge budget -> the cap binds exactly: every doc appears maxEpochs
    // times and spend stops at maxEpochs source passes
    val capped = Mixing.tokenBudgetSampleEpochs(docs, "doc_id", "text",
      "source", budget = 100000000L, maxEpochs = 2)
    assert(capped.count() == docs.count() * 2)
    assert(capped.groupBy("doc_id").count().agg(max("count")).head.getLong(0) == 2)
    // maxEpochs = 1 IS the single-pass sampler (plus copy_idx = 0)
    val one = Mixing.tokenBudgetSampleEpochs(docs, "doc_id", "text",
      "source", budget, maxEpochs = 1)
    assert(one.agg(max("copy_idx")).head.getLong(0) == 0L)
    assert(rowsOf(one.select($"doc_id", $"source", $"n_tokens", $"tok_before")) ==
      rowsOf(Mixing.tokenBudgetSample(docs, "doc_id", "text", "source", budget)))
    // deterministic + repartition-invariant
    assert(rowsOf(out) == rowsOf(Mixing.tokenBudgetSampleEpochs(
      docs.repartition(17), "doc_id", "text", "source", budget, maxEpochs = 5)))
  }

  test("tokenBudgetSampleEpochs: exact epoch-major replay on a controlled corpus") {
    // 4 docs totalling 10 tokens; budget 26 = 2 full epochs + partial
    // third: replay by hand in epoch-major md5-rank order
    val sizes = Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L)
    val docs = sizes.toSeq.map { case (i, n) => (i, "w " * n.toInt, "s") }
      .toDF("doc_id", "text", "source")
    val ranked = sizes.keys.toSeq
      .map(i => i -> java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
      .sortBy(_._2).map(_._1)
    val expected = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    var run = 0L
    (0L until 3L).foreach { epoch =>
      ranked.foreach { i =>
        if (run < 26L) { expected += ((i, epoch, run)); run += sizes(i) }
      }
    }
    val got = Mixing.tokenBudgetSampleEpochs(docs, "doc_id", "text", "source",
        budget = 26L, maxEpochs = 3)
      .select($"doc_id", $"copy_idx", $"tok_before")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected.toSet)
  }

  test("tokenBudgetSample: tok_before stable across independent runs") {
    // the round-5 driver flake: two plan branches derived partition ids
    // from spark_partition_id and could disagree on recompute; the
    // bucket is now a pure function of the md5 rank, so any two runs —
    // any partitioning, any core count — must agree on every value
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val runs = Seq(
      Mixing.tokenBudgetSample(docs, "doc_id", "text", "source", 5000L),
      Mixing.tokenBudgetSample(docs.repartition(3), "doc_id", "text", "source", 5000L),
      Mixing.tokenBudgetSample(docs.repartition(29), "doc_id", "text", "source", 5000L)
    ).map(rowsOf)
    assert(runs.distinct.size == 1)
  }

  test("excessLossWeights: normalized, monotone in excess, eta=0 reduces to share") {
    // three domains with engineered loss structure: 'rep' is highly
    // repetitive (low bigram CE), 'mix' moderate, 'rnd' near-random
    // word soup (high CE) — the high-loss domain must upweight
    val words = ('a' to 'z').map(_.toString)
    def soup(seed: Int, n: Int): String =
      Seq.tabulate(n)(i => words((seed * 31 + i * 17 + i * i * 7) % 26))
        .mkString(" ")
    val docs = ((1L to 20L).map(i => (i, "rep", "x y " * 30 + "x y")) ++
      (21L to 40L).map(i => (i, "mix", soup(i.toInt, 20) + " x y x y x y")) ++
      (41L to 60L).map(i => (i, "rnd", soup(i.toInt * 7, 60))))
      .toDF("doc_id", "domain", "text")
    val out = Mixing.excessLossWeights(docs, "doc_id", "text", "domain",
      eta = 1.0).collect()
      .map(r => r.getAs[String]("domain") ->
        (r.getAs[Double]("mean_ce"), r.getAs[Double]("excess_ce"),
          r.getAs[Double]("weight"))).toMap
    // weights normalize
    assert(math.abs(out.values.map(_._3).sum - 1.0) < 1e-4)
    // loss ordering: repetitive < mixed < random
    assert(out("rep")._1 < out("mix")._1 && out("mix")._1 < out("rnd")._1)
    // the high-loss domain carries positive excess; the low-loss none
    assert(out("rnd")._2 > 0.0 && out("rep")._2 == 0.0)
    // eta = 0: weights collapse to pure token shares
    val flat = Mixing.excessLossWeights(docs, "doc_id", "text", "domain",
      eta = 0.0).collect()
      .map(r => (r.getAs[String]("domain"), r.getAs[Long]("n_trans"),
        r.getAs[Double]("weight")))
    val totTrans = flat.map(_._2).sum.toDouble
    flat.foreach { case (dom, nt, w) =>
      assert(math.abs(w - nt / totTrans) < 1e-4, s"$dom: $w vs ${nt / totTrans}")
    }
    // upweighting actually happened for the high-loss domain vs its share
    val rndShare = flat.find(_._1 == "rnd").get._3
    assert(out("rnd")._3 > rndShare)
    // rates: the most-upweighted domain saturates at 1.0; sampled
    // tokens land proportional to target weights (rate_i * share_i
    // proportional to w_i)
    val w = Mixing.excessLossWeights(docs, "doc_id", "text", "domain")
    val rates = Mixing.ratesForTargetWeights(w).collect()
      .map(r => (r.getAs[String]("domain"), r.getAs[Double]("share"),
        r.getAs[Double]("weight"), r.getAs[Double]("rate"))).toSeq
    assert(rates.map(_._4).max == 1.0)
    assert(rates.forall { case (_, _, _, rt) => rt > 0.0 && rt <= 1.0 })
    val props = rates.map { case (dom, sh, wt, rt) => (dom, sh * rt / wt) }
    // share*rate/weight constant across domains (sampled mass follows w)
    assert(props.map(_._2).max - props.map(_._2).min < 1e-3, props.toString)
  }

  test("excessLossWeightsIter: monotone reweighting of the max-loss domain; eta=0 fixed point") {
    // engineered domains: 'hard' is random soup (high bigram CE),
    // 'easy' is one repeated bigram (low CE)
    val docs = ((1L to 10L).map(i => (i, "easy", "x y " * 20 + "x y")) ++
      (11L to 20L).map(i => (i, "hard",
        Seq.tabulate(40)(j => ('a' + (i.toInt * 13 + j * 7) % 26).toChar.toString)
          .mkString(" "))))
      .toDF("doc_id", "domain", "text")
    def wAt(steps: Int): Map[String, Double] =
      Mixing.excessLossWeightsIter(docs, "doc_id", "text", "domain",
          steps = steps)
        .collect().map(r => r.getAs[String]("domain") ->
          r.getAs[Double]("weight")).toMap
    val w1 = wAt(1); val w2 = wAt(2); val w4 = wAt(4)
    // the max-CE domain's multiplicative factor dominates every other
    // domain's, so its normalized weight never decreases across steps
    assert(w2("hard") >= w1("hard"), s"$w1 -> $w2")
    assert(w4("hard") >= w2("hard"), s"$w2 -> $w4")
    // and it actually moved above its natural token share
    val row = Mixing.excessLossWeightsIter(docs, "doc_id", "text", "domain",
        steps = 1)
      .select(col("domain"), col("n_trans"), col("weight"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val tot = row.map(_._2).sum.toDouble
    val hardShare = row.find(_._1 == "hard").get._2 / tot
    assert(w1("hard") > hardShare)
    // weights always normalize (8-dp residue tolerance)
    Seq(w1, w2, w4).foreach(w =>
      assert(math.abs(w.values.sum - 1.0) < 1e-4, w.toString))
    // eta = 0: the tilt is identity, so ANY step count returns the
    // natural token shares — the loop's fixed point is exact
    val w0 = Mixing.excessLossWeightsIter(docs, "doc_id", "text", "domain",
        eta = 0.0, steps = 3)
      .collect().map(r => r.getAs[String]("domain") ->
        r.getAs[Double]("weight")).toMap
    assert(math.abs(w0("hard") - hardShare) < 1e-4, s"$w0 vs $hardShare")
  }

  test("mixReport: achieved shares vs targets, absent domains both ways") {
    // total 100 tokens: a 60, b 25, d 15; targets a 0.6 (exact),
    // b 0.3 (off by 0.05 — ties INSIDE tolerance), c 0.1 (domain
    // absent from the corpus — the silent-total-drop case), d
    // unconstrained (null target)
    val df = Seq(("a", 35L), ("a", 25L), ("b", 25L), ("d", 15L))
      .toDF("domain", "n")
    val out = Mixing.mixReport(df, "domain", col("n"),
        targets = Map("a" -> 0.6, "b" -> 0.3, "c" -> 0.1), tol = 0.05)
      .orderBy(col("domain"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getBoolean(4)))).toMap
    assert(out("a") == ((60L, 0.6, Some(0.6), true)))
    assert(out("b") == ((25L, 0.25, Some(0.3), true))) // |0.25-0.3| == tol
    assert(out("c") == ((0L, 0.0, Some(0.1), false)))  // silently dropped
    assert(out("d") == ((15L, 0.15, None, true)))      // unconstrained
    intercept[IllegalArgumentException](
      Mixing.mixReport(df, "domain", col("n"), Map("a" -> 0.6), tol = -1))
  }

  test("ratesForTargetWeights: zero-share row fails loudly, not by poisoning") {
    // a hand-set weights row with n_trans = 0 used to produce an
    // Infinite __ratio that silently collapsed every OTHER domain's
    // rate toward 0 — now it raises with the offending domain named
    val w = Seq(("a", 100L, 0.5), ("empty", 0L, 0.5))
      .toDF("domain", "n_trans", "weight")
    val e = intercept[Exception] {
      Mixing.ratesForTargetWeights(w).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("empty")),
      s"expected the offending domain in the error, got: ${msgs(e)}")
    // and the all-positive frame is unaffected by the guard
    val ok = Mixing.ratesForTargetWeights(
      Seq(("a", 100L, 0.5), ("b", 300L, 0.5)).toDF("domain", "n_trans", "weight"))
      .collect().map(r => r.getAs[String]("domain") -> r.getAs[Double]("rate"))
      .toMap
    assert(ok("a") == 1.0 && ok("b") > 0.0 && ok("b") < 1.0)
  }

  test("mixByExcessLoss: hard domain saturates, easy downsamples, eta=0 identity") {
    // the engineered corpus from the iter test: 'hard' (random soup,
    // high CE) gets upweighted -> its rate saturates at 1.0 and EVERY
    // hard row survives; 'easy' keeps proportionally less
    val docs = ((1L to 30L).map(i => (i, "easy", "x y " * 20 + "x y")) ++
      (31L to 60L).map(i => (i, "hard",
        Seq.tabulate(40)(j => ('a' + (i.toInt * 13 + j * 7) % 26).toChar.toString)
          .mkString(" "))))
      .toDF("doc_id", "domain", "text")
    val mixed = Mixing.mixByExcessLoss(docs, "doc_id", "text", "domain",
      steps = 2)
    val byDom = mixed.groupBy(col("domain")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom("hard") == 30L,
      s"the max-upweight domain must keep rate 1.0, got $byDom")
    assert(byDom.getOrElse("easy", 0L) < 30L,
      s"the low-loss domain must be downsampled, got $byDom")
    // survivors are a SUBSET decided per key: membership is stable
    // under repartitioning (the deterministic-sampling contract)
    val again = Mixing.mixByExcessLoss(docs.repartition(7), "doc_id",
      "text", "domain", steps = 2)
    assert(rowsOf(mixed) == rowsOf(again))
    // eta = 0: weights are the natural shares, every rate is 1.0 (up
    // to the 6-dp rounding of share/ratio), output ≡ input
    val id = Mixing.mixByExcessLoss(docs, "doc_id", "text", "domain",
      eta = 0.0, steps = 3)
    assert(id.count() == docs.count())
    // a domain with no scoreable doc (single word — no CE transition)
    // has no rate row and passes through at defaultRate 1.0
    val withMute = docs.unionByName(
      Seq((100L, "mute", "solo")).toDF("doc_id", "domain", "text"))
    val mixedMute = Mixing.mixByExcessLoss(withMute, "doc_id", "text",
      "domain", steps = 2)
    assert(mixedMute.where(col("domain") === "mute").count() == 1L,
      "unscoreable domain must pass through, not be dropped")
  }

  test("phasedMixSchedule: per-phase re-weighting lands, budgets bound, draws independent") {
    // 3 domains × 120 docs × 10 tokens — natural shares equal, so
    // target weights map straight to expected admitted shares
    val docs = (0L until 360L).map(i =>
        (i, s"d${i % 3}", "w " * 9 + "w"))
      .toDF("doc_id", "domain", "text")
    val phases = Seq(
      Mixing.MixPhase("p1", 600L, Map("d0" -> 0.45, "d1" -> 0.45, "d2" -> 0.1)),
      Mixing.MixPhase("p2", 600L, Map("d0" -> 0.1, "d1" -> 0.1, "d2" -> 0.8)))
    val out = Mixing.phasedMixSchedule(docs, "doc_id", "text", "domain",
      phases).localCheckpoint()
    // budget bound: per phase, tokens before the last admitted doc are
    // < budget and the total overshoots by at most one document
    val totals = out.groupBy(col("phase")).agg(
        sum(col("n_tokens")).as("t"), max(col("tok_before")).as("mb"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((ph, (t, mb)) <- totals) {
      assert(mb < 600L, s"$ph: tok_before must stay below the budget")
      assert(t >= 600L && t <= 610L, s"$ph: admitted $t tokens (budget 600)")
    }
    // the RE-WEIGHTING is what must land (the keep-bucket/rank salt
    // decorrelation — a shared salt over-admits downweighted domains):
    // p2 is d2-heavy, p1 is d2-light
    val share = out.groupBy(col("phase"), col("domain")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap.withDefaultValue(0L)
    val p1d2 = share(("p1", "d2")).toDouble /
      Seq("d0", "d1", "d2").map(d => share(("p1", d))).sum
    val p2d2 = share(("p2", "d2")).toDouble /
      Seq("d0", "d1", "d2").map(d => share(("p2", d))).sum
    assert(p2d2 > 0.6, s"anneal-style phase must be d2-heavy, got $p2d2")
    assert(p1d2 < 0.25, s"warmup-style phase must be d2-light, got $p1d2")
    // phases draw independently: p2's membership is not a subset of p1's
    val p1Ids = out.where(col("phase") === "p1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val p2Ids = out.where(col("phase") === "p2")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((p2Ids -- p1Ids).nonEmpty, "phases must be independent draws")
    // deterministic under repartitioning (the sampling contract)
    val again = Mixing.phasedMixSchedule(docs.repartition(7), "doc_id",
      "text", "domain", phases)
    assert(rowsOf(out) == rowsOf(again))
    // ledger shape: one row per (phase, domain); max-upweight saturates
    val ledger = Mixing.phaseRatesLedger(docs, "doc_id", "text", "domain",
      phases)
    assert(ledger.count() == 6)
    assert(ledger.where(col("phase") === "p2" && col("domain") === "d2")
      .select("rate").head().getDouble(0) == 1.0)
  }

  test("ablationLadder: rung membership nests and equals deterministicSample") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val rungs = Seq(0.01, 0.1, 0.5, 1.0)
    val ladder = Mixing.ablationLadder(docs, "doc_id", rungs)
    val byRung = ladder.select(col("doc_id"), col("rung")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // last rung 1.0 keeps every row
    assert(byRung.size == docs.count())
    // the rate-r ablation (rung <= r) IS deterministicSample(r) — the
    // shared-bucket nesting guarantee, checked for every rung
    rungs.foreach { r =>
      val viaLadder = byRung.collect { case (id, rg) if rg <= r => id }.toSet
      val viaSample = Mixing.deterministicSample(docs, "doc_id", r)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(viaLadder == viaSample, s"rung $r drifted from the sample")
    }
    // nesting is strict: each rung's cumulative set contains the previous
    val cums = rungs.map(r => byRung.collect {
      case (id, rg) if rg <= r => id }.toSet)
    cums.sliding(2).foreach { case Seq(a, b) => assert(a.subsetOf(b)) }
  }

  test("ablationLadder: rows beyond the largest rung are dropped") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val half = Mixing.ablationLadder(docs, "doc_id", Seq(0.1, 0.5))
    val sample = Mixing.deterministicSample(docs, "doc_id", 0.5)
    assert(half.count() == sample.count())
    assert(half.agg(max(col("rung"))).head().getDouble(0) == 0.5)
  }

  test("ablationLadder: validation rejects bad rung lists") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    intercept[IllegalArgumentException] {
      Mixing.ablationLadder(docs, "doc_id", Seq(0.5, 0.1)) }
    intercept[IllegalArgumentException] {
      Mixing.ablationLadder(docs, "doc_id", Seq(0.1, 0.1)) }
    intercept[IllegalArgumentException] {
      Mixing.ablationLadder(docs, "doc_id", Seq(0.0, 0.5)) }
    intercept[IllegalArgumentException] {
      Mixing.ablationLadder(docs, "doc_id", Seq.empty) }
  }

  test("ablationLadderStats: marginals sum to cumulative; tokens exact") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val ladder = Mixing.ablationLadder(docs, "doc_id", Seq(0.1, 0.5, 1.0))
    val stats = Mixing.ablationLadderStats(ladder,
      graft.llm.TextAnalysis.wsTokenCount(col("text")))
      .orderBy(col("rung")).collect()
    assert(stats.length == 3)
    var cd = 0L; var ct = 0L
    stats.foreach { r =>
      cd += r.getLong(1); ct += r.getLong(2)
      assert(r.getLong(3) == cd && r.getLong(4) == ct)
    }
    // the full-corpus rung's cumulative equals the corpus totals
    val totalDocs = docs.count()
    val totalToks = docs.agg(sum(graft.llm.TextAnalysis
      .wsTokenCount(col("text")).cast("long"))).head().getLong(0)
    assert(stats.last.getLong(3) == totalDocs)
    assert(stats.last.getLong(4) == totalToks)
  }

  test("phasedShards: per-phase generations, certified manifests, phase mix lands") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_phased_shards").toString
    val docs = (0L until 360L).map(i =>
        (i, s"d${i % 3}", "w " * 9 + "w"))
      .toDF("doc_id", "domain", "text")
    val phases = Seq(
      Mixing.MixPhase("p1", 600L, Map("d0" -> 0.45, "d1" -> 0.45, "d2" -> 0.1)),
      Mixing.MixPhase("p2", 600L, Map("d0" -> 0.1, "d1" -> 0.1, "d2" -> 0.8)))
    val summary = Packing.phasedShards(docs, "doc_id", "text", "domain",
      phases, packBudget = 64L, dir = dir, nShards = 2).localCheckpoint()
    // one generation dir per phase, each with a certified shard set
    for (i <- phases.indices) {
      val gen = f"$dir/phase-$i%04d"
      assert(new java.io.File(s"$gen/shards/manifest").exists, gen)
      assert(new java.io.File(s"$gen/assignment").exists, gen)
    }
    // the summary equals the schedule: per-phase token totals match
    val sched = Mixing.phasedMixSchedule(docs, "doc_id", "text", "domain",
      phases)
    val schedTok = sched.groupBy(col("phase_idx"))
      .agg(sum(col("n_tokens")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sumTok = summary.groupBy(col("phase_idx"))
      .agg(sum(col("sum_tokens")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sumTok == schedTok, s"shards $sumTok != schedule $schedTok")
    // the phase dimension leads and phases are re-weighted: p2 shards
    // carry mostly d2 docs (via the schedule membership)
    assert(summary.select("phase").distinct().count() == 2)
    intercept[IllegalArgumentException](
      Packing.phasedShards(docs, "doc_id", "text", "domain", phases,
        packBudget = 0L, dir = dir, nShards = 2))
  }
}
