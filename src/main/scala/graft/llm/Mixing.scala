package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and corpus-mixing operators for assembling
  * training mixes (per-source rates, temperature-scaled weights,
  * fractional upsampling).
  *
  * Selection is by md5 of (salt ++ key): reproducible across runs,
  * engines, partitionings, and cluster sizes — unlike Spark's
  * `DataFrame.sample`, which is partition-seeded and silently changes
  * membership whenever the input repartitions. Every sampling operator
  * here is map-only (the predicate is a plain codegen'd expression that
  * pushes toward the scan); at 100 TB a mix pass costs one read, no
  * shuffle.
  *
  * The first 8 md5 hex chars compared as lowercase-hex STRINGS are
  * order-isomorphic to the 32-bit bucket value, which keeps the
  * predicate expressible identically in any engine with md5 — that is
  * what makes these operators oracle-checkable cross-engine.
  */
object Mixing {

  /** Lowercase-hex threshold for a fraction in [0,1]: rows whose bucket
    * (first 8 md5 hex chars) sorts below it are kept. */
  private[llm] def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    val t = (fraction * 4294967296.0).round
    // rate 1.0 must keep EVERY row, including a bucket of exactly
    // "ffffffff" (p = 2^-32): "g" sorts above every hex char
    if (t >= 4294967296L) "g" else f"$t%08x"
  }

  /** 32-bit hash bucket of a key as 8 lowercase hex chars. */
  def hashBucket(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast("string"))), 1, 8)

  /** Deterministic Bernoulli-style sample: keeps exactly the rows whose
    * bucket falls below the fraction threshold. Changing `salt` draws an
    * independent sample; the same (key, salt) always decides the same
    * way. */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double,
                          salt: String = "graft"): DataFrame =
    df.where(hashBucket(col(keyCol), salt) < lit(hexThreshold(fraction)))

  /** PER-ROW-rate deterministic Bernoulli sample: keeps a row iff its
    * key's 32-bit md5 bucket falls below that row's OWN rate column —
    * [[deterministicSample]] generalized from one global fraction to a
    * rate each row carries (soft-dedup weights, per-doc quality-scaled
    * admission, any "sample under this column" composition). The
    * bucket is decoded to its integer value so the threshold can be a
    * runtime product (`rate * 2^32`) instead of a driver-side hex
    * literal; a rate ≥ 1 keeps the row always, ≤ 0 never, and the same
    * (key, salt, rate) always decides the same way. Map-only — the
    * predicate is one codegen'd expression, no shuffle, no join. */
  def weightedSample(df: DataFrame, keyCol: String, rateCol: Column,
                     salt: String = "graft"): DataFrame =
    df.where(conv(hashBucket(col(keyCol), salt), 16, 10).cast("long")
      < rateCol.cast("double") * 4294967296.0)

  /** Stratified mix-down: per-stratum sampling rates (e.g. language →
    * rate); strata absent from `rates` get `defaultRate`. One map-only
    * pass over the corpus — the per-row threshold is a small CASE
    * chain, not a join. */
  def mixStrata(df: DataFrame, stratumCol: String, keyCol: String,
                rates: Map[String, Double], defaultRate: Double = 1.0,
                salt: String = "graft"): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (s, r)) =>
        when(col(stratumCol) === s, lit(hexThreshold(r))).otherwise(acc)
    }
    df.where(hashBucket(col(keyCol), salt) < thr)
  }

  /** Deterministic fractional upsampling: each row is emitted
    * floor(rate) times, plus once more when its bucket falls below the
    * fractional part — expected multiplicity = rate, decided per key.
    * Map-side explode, no shuffle; `copy_idx` (1-based) disambiguates
    * the copies downstream. Rows drawing 0 copies are dropped (explode
    * of NULL). */
  def upsample(df: DataFrame, keyCol: String, rate: Double,
               salt: String = "graft"): DataFrame = {
    require(rate >= 0.0, s"rate must be >= 0, got $rate")
    val base = math.floor(rate).toLong
    val extra = when(
      hashBucket(col(keyCol), salt) < lit(hexThreshold(rate - base)), 1L)
      .otherwise(0L)
    val n = lit(base) + extra
    df.withColumn("copy_idx",
      explode(when(n >= 1L, sequence(lit(1L), n))))
  }

  /** Deterministic named partition of a corpus into train/val/test-style
    * splits: each key's bucket falls into exactly one band of the
    * cumulative-weight ladder, so the splits are disjoint, exhaustive,
    * reproducible across runs/partitionings/engines, and STABLE under
    * growth — a key keeps its split when more data arrives (the property
    * a held-out set needs; a per-run random split leaks). Adds
    * `splitCol`; weights must sum to 1. Map-only CASE chain, no shuffle.
    */
  def splitByHash(df: DataFrame, keyCol: String,
                  weights: Seq[(String, Double)], salt: String = "graft",
                  splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty, "splitByHash: no splits")
    require(weights.map(_._1).distinct.size == weights.size,
      "splitByHash: duplicate split names")
    require(weights.forall(_._2 >= 0.0), "splitByHash: negative weight")
    val total = weights.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"splitByHash: weights must sum to 1, got $total")
    val bucket = hashBucket(col(keyCol), salt)
    val cum = weights.map(_._2).scanLeft(0.0)(_ + _).tail
    // ascending first-match-wins ladder; the last split takes the rest
    // (incl. the "ffffffff" bucket), so rounding can't drop a row
    val assigned = weights.init.zip(cum.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), c)) =>
        val cond = bucket < lit(hexThreshold(c))
        Some(acc.fold(when(cond, lit(name)))(_.when(cond, lit(name))))
    }.fold(lit(weights.last._1))(_.otherwise(lit(weights.last._1)))
    df.withColumn(splitCol, assigned)
  }

  /** Scaling-law ablation ladder: NESTED deterministic subsamples from
    * one md5 rank — the data-ablation fixture every scaling-law /
    * data-mix study needs (train at 1%, 10%, 50%, 100% of the corpus
    * with the smaller runs strict subsets of the larger, so rung
    * deltas measure DATA added, not a resample). Each row gets the
    * SMALLEST rung rate whose threshold its bucket clears; consumers
    * take `rung <= r` for the rate-r ablation, and that membership is
    * EXACTLY [[deterministicSample]](r) under the same (key, salt) —
    * the nesting guarantee is the shared-bucket construction, not a
    * promise. Rows beyond the largest rung are dropped (the ladder
    * only materializes its largest ablation; a last rung of 1.0 keeps
    * every row). Map-only: one codegen'd CASE, no shuffle. */
  def ablationLadder(df: DataFrame, keyCol: String, rungs: Seq[Double],
                     salt: String = "graft",
                     rungCol: String = "rung"): DataFrame = {
    require(rungs.nonEmpty, "ablationLadder: no rungs")
    require(rungs == rungs.sorted && rungs.distinct.size == rungs.size,
      s"ablationLadder: rungs must be ascending and distinct, got $rungs")
    require(rungs.forall(r => r > 0.0 && r <= 1.0),
      s"ablationLadder: rungs must be in (0,1], got $rungs")
    val bucket = hashBucket(col(keyCol), salt)
    val assigned = rungs.foldLeft(Option.empty[Column]) { (acc, r) =>
      val cond = bucket < lit(hexThreshold(r))
      Some(acc.fold(when(cond, lit(r)))(_.when(cond, lit(r))))
    }.get // rungs is non-empty; unmatched rows fall through to null
    df.withColumn(rungCol, assigned).where(col(rungCol).isNotNull)
  }

  /** Per-rung datacard over an [[ablationLadder]] frame: marginal and
    * CUMULATIVE doc/token counts (cumulative = the rate-r ablation's
    * actual size — what the scaling-law axis plots). One exchange to
    * the rung key; the cumulative window runs over the one-row-per-rung
    * aggregate (bounded by the ladder's length — a driver-sized frame,
    * so the unpartitioned window is safe by construction). */
  def ablationLadderStats(ladder: DataFrame, tokenCount: Column,
                          rungCol: String = "rung"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(rungCol))
    ladder.groupBy(col(rungCol))
      .agg(count(lit(1)).as("docs"),
        sum(tokenCount.cast("long")).as("tokens"))
      .withColumn("cum_docs", sum(col("docs")).over(w))
      .withColumn("cum_tokens", sum(col("tokens")).over(w))
  }

  /** Deterministic best-k-per-stratum selection (e.g. keep the N
    * highest-quality documents per source/domain). Ties broken by
    * `keyCol` so the output is reproducible. One shuffle on the stratum
    * key; Catalyst executes the rank filter as WindowGroupLimit, which
    * drops below-k rows DURING the sort on the map side — the full
    * per-stratum sort never materializes, so a degenerate stratum costs
    * its top-k, not its size. */
  def topKPerStratum(df: DataFrame, stratumCol: String, scoreCol: Column,
                     keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(scoreCol.desc, col(keyCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__rk")
  }

  /** Deterministic per-source TOKEN-budget sampling — the trainer-mix
    * assembly step where each source contributes documents until its
    * token allowance is spent (not a document-count or a rate: token
    * budgets are what mixture specs are written in). Documents are
    * admitted in md5-rank order (reproducible on any cluster size,
    * auditable cross-engine) while the source's EXCLUSIVE running
    * token total is still below `budget` — so the first
    * budget-crossing document is admitted (overshoot ≤ one document,
    * and every source with a nonzero budget contributes at least one
    * document).
    *
    * Scale shape: the per-source running total is the TWO-PHASE prefix
    * sum from [[Packing.packSequences]] generalized to source groups —
    * bucket each row DETERMINISTICALLY by the first three hex digits of
    * its md5 rank (monotone in rank order, so buckets tile the
    * per-source rank range), per-(bucket, source) totals (a tiny
    * frame: 4096 × |sources| rows), per-source exclusive cumsum over
    * that frame only, broadcast back, then a bucket-LOCAL window — each
    * window partition sorts ~1/4096 of a source, so per-partition state
    * stays small even when one source is most of a 100 TB corpus. No
    * single-partition window touches data even when one source
    * dominates the corpus. The bucket is a pure function of the row
    * (NOT `spark_partition_id`), so the offsets branch and the join
    * branch always agree even when the two plan branches recompute the
    * shuffle independently (exchange-reuse miss, AQE re-plan, executor
    * loss). Output: `(doc_id, source, n_tokens, tok_before)`. */
  def tokenBudgetSample(df: DataFrame, idCol: String, textCol: String,
                        sourceCol: String, budget: Long,
                        salt: String = "graft"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    exclusiveTokenPrefix(tokenBase(df, idCol, textCol, sourceCol, salt))
      .where(col("__pref") < budget)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("__pref").as("tok_before"))
  }

  /** `(doc_id, source, n_tokens, __rank, __pid)` — the md5-rank frame
    * both budget samplers start from. */
  private def tokenBase(df: DataFrame, idCol: String, textCol: String,
                        sourceCol: String, salt: String): DataFrame =
    df.select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
        TextAnalysis.wsTokenCount(col(textCol)).cast("long").as("n_tokens"),
        md5(concat(lit(salt), col(idCol).cast("string"))).as("__rank"))
      .withColumn("__pid", conv(substring(col("__rank"), 1, 3), 16, 10)
        .cast("int"))

  /** The two-phase EXCLUSIVE per-source prefix sum over the md5-rank
    * order (see [[tokenBudgetSample]]'s scale-shape doc): adds
    * `__pref` to the base frame without any single-partition window. */
  private def exclusiveTokenPrefix(base: DataFrame): DataFrame = {
    val wPart = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("__pid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("__pid"), col("source"))
      .agg(sum(col("n_tokens")).as("__psum"))
      .withColumn("__poff", coalesce(sum(col("__psum")).over(wPart), lit(0L)))
      .select(col("__pid"), col("source"), col("__poff"))
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid"), col("source")).orderBy(col("__rank"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    base.join(broadcast(offsets), Seq("__pid", "source"))
      .withColumn("__pref",
        col("__poff") + coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
  }

  /** MULTI-EPOCH token-budget sampling: trainer mixes routinely spec a
    * source budget LARGER than the source ([[tokenBudgetSample]] stops
    * after one pass) — the standard remedy is looping the source
    * (epochs), which this composes with budget admission. Each source
    * cycles deterministically in epoch-major md5-rank order (`copy_idx`
    * = 0, 1, …): the source's exclusive running total continues across
    * copies, a doc-copy is admitted while that total is below
    * `budget`, and `maxEpochs` bounds the looping (budget beyond
    * `maxEpochs` source passes is left unspent). Same guarantees as
    * the single-pass form: overshoot ≤ one document per source, the
    * crossing copy is admitted, fully deterministic under any
    * partitioning. With `maxEpochs = 1` this IS [[tokenBudgetSample]]
    * plus a zero `copy_idx` (spec-asserted). Output:
    * `(doc_id, source, copy_idx, n_tokens, tok_before)`.
    *
    * Scale shape: ONE windowed prefix pass (the same two-phase sum —
    * epochs don't multiply the window work because every epoch shares
    * the per-epoch prefix), one tiny per-source totals aggregate
    * broadcast back, then map-only arithmetic: full epochs explode
    * `sequence(0, e_full−1)` per row (`e_full = budget div total`,
    * capped), and the single partial epoch reuses the prefix against
    * the residual budget. The corpus is never replicated `maxEpochs`×
    * and then filtered. Zero-token sources (`total = 0`) emit all
    * `maxEpochs` copies at `tok_before = 0` — every copy is
    * budget-admissible and the cap is what bounds them. */
  def tokenBudgetSampleEpochs(df: DataFrame, idCol: String, textCol: String,
                              sourceCol: String, budget: Long,
                              maxEpochs: Int,
                              salt: String = "graft"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val base = tokenBase(df, idCol, textCol, sourceCol, salt)
    // exact integer division (BIGINT div) on both engines — a double
    // floor(b/t) can cross an integer boundary at FP rounding
    val totals = base.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("__tot"))
      .withColumn("__efull",
        when(col("__tot") > 0,
          least(expr(s"${budget}L div __tot"), lit(maxEpochs.toLong)))
          .otherwise(lit(maxEpochs.toLong)))
    val x = exclusiveTokenPrefix(base).join(broadcast(totals), Seq("source"))
    val fullEpochs = x.where(col("__efull") >= 1)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("__tot"),
        col("__pref"),
        explode(sequence(lit(0L), col("__efull") - 1)).as("copy_idx"))
    val partialEpoch = x.where(col("__efull") < maxEpochs &&
        col("__pref") < lit(budget) - col("__efull") * col("__tot"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("__tot"),
        col("__pref"), col("__efull").as("copy_idx"))
    fullEpochs.unionByName(partialEpoch)
      .select(col("doc_id"), col("source"), col("copy_idx"),
        col("n_tokens"),
        (col("copy_idx") * col("__tot") + col("__pref")).as("tok_before"))
  }

  /** Temperature-scaled mixing weights from stratum counts:
    * w_i ∝ n_i^(1/T). T=1 reproduces the natural distribution; larger T
    * flattens toward uniform (the multilingual-sampling trick). Output
    * is one row per stratum; the normalizer is a broadcast one-row
    * aggregate, not a single-partition window. */
  def temperatureWeights(df: DataFrame, stratumCol: String,
                         temperature: Double): DataFrame = {
    require(temperature > 0.0, s"temperature must be > 0, got $temperature")
    val counts = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("__w", pow(col("n").cast("double"), 1.0 / temperature))
    val total = counts.agg(sum(col("__w")).as("__tot"))
    counts.join(broadcast(total))
      .select(col(stratumCol), col("n"),
        (col("__w") / col("__tot")).as("weight"))
  }

  /** Excess-loss domain reweighting — one multiplicative-weights step
    * of the DoReMi recipe (Xie et al. 2023: upweight domains whose
    * measured loss exceeds the reference) over the corpus's OWN
    * bigram-LM cross-entropy ([[TextAnalysis.bigramCrossEntropy]] as
    * the proxy-model loss): per domain, the token-weighted mean CE;
    * its excess over the corpus-wide mean; and the normalized tilt
    * `w ∝ share · (1 + eta · excess)`. The tilt is DoReMi's
    * exponentiated-gradient step linearized — chosen deliberately
    * because it keeps every number RATIONAL over the rounded inputs,
    * so the whole table replays bit-for-bit in SQL (a cross-engine
    * `exp()` is not ULP-stable; the published loop's constants live in
    * `eta`).
    *
    * Numeric discipline (the `doc_bigram_ce` pattern): per-doc CE
    * rounds to 4 dp, per-domain sums run in DECIMAL (shuffle-order-
    * proof), divisions happen once in double over exact numerators,
    * the tilt rounds to 8 dp before the exact-DECIMAL normalizer.
    * Shapes: one groupBy(domain), two broadcast one-row aggregates —
    * the corpus is scanned by the CE pass, never again. */
  def excessLossWeights(df: DataFrame, idCol: String, textCol: String,
                        domainCol: String, eta: Double = 1.0): DataFrame = {
    require(eta >= 0.0, s"excessLossWeights: eta must be >= 0, got $eta")
    val per = perDomainCe(df, idCol, textCol, domainCol)
    val global = per.agg(sum(col("__ceMass")).as("__gMass"),
      sum(col("n_trans")).as("__gTrans"))
    val tilted = per.join(broadcast(global))
      .withColumn("baseline_ce",
        round(col("__gMass").cast("double") / col("__gTrans"), 6))
      .withColumn("excess_ce",
        greatest(lit(0.0), round(col("mean_ce") - col("baseline_ce"), 6)))
      .withColumn("__tilt", round(
        (col("n_trans").cast("double") / col("__gTrans")) *
          (lit(1.0) + lit(eta) * col("excess_ce")), 8).cast("decimal(20,8)"))
    val norm = tilted.agg(sum(col("__tilt")).as("__z"))
    tilted.join(broadcast(norm))
      .select(col("domain"), col("n_docs"), col("n_trans"), col("mean_ce"),
        col("excess_ce"),
        round(col("__tilt").cast("double") / col("__z").cast("double"), 6)
          .as("weight"))
  }

  /** Per-domain token-weighted CE table shared by [[excessLossWeights]]
    * and [[excessLossWeightsIter]]: one CE pass over the corpus, then
    * (domain, n_docs, n_trans, __ceMass, mean_ce) with the
    * `doc_bigram_ce` numeric discipline (round per-doc CE to 4 dp,
    * DECIMAL mass sums, one double division rounded to 6 dp). */
  private def perDomainCe(df: DataFrame, idCol: String, textCol: String,
                          domainCol: String): DataFrame = {
    val ce = TextAnalysis.bigramCrossEntropy(df, idCol, textCol)
    df.select(col(idCol).as("doc_id"), col(domainCol).as("domain"))
      .join(ce, Seq("doc_id"))
      // exact integer-scaled CE mass: round first, then DECIMAL product
      .withColumn("__m", (round(col("bigram_ce"), 4).cast("decimal(18,4)") *
        col("n_trans").cast("decimal(18,0)")).cast("decimal(38,4)"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_trans")).as("n_trans"),
        sum(col("__m")).as("__ceMass"))
      .withColumn("mean_ce",
        round(col("__ceMass").cast("double") / col("n_trans"), 6))
  }

  /** MULTI-STEP excess-loss reweighting — the iterated DoReMi loop
    * ([[excessLossWeights]] is one multiplicative-weights step; the
    * published recipe iterates, re-pricing the reference loss under
    * the updated mix): starting from the natural token shares, each
    * step recomputes the baseline as the CURRENT-MIX-weighted mean CE
    * (`Σ wᵢ·ceᵢ / Σ wᵢ` — the w-sum denominator absorbs the 8-dp
    * normalization residue so the baseline stays a true weighted
    * mean), tilts `w ← w·(1 + eta·excess)`, and renormalizes. As the
    * mix shifts toward high-loss domains the baseline rises and the
    * excesses shrink — the fixed point is the mix under which no
    * domain's loss exceeds the mix-weighted reference.
    *
    * Same rational discipline as the single step (per-domain mean CE
    * fixed at 6 dp; weights held as 8-dp DECIMAL between steps;
    * products exact in DECIMAL; one double division per aggregate,
    * rounded), so a T-step run replays bit-for-bit in SQL as T
    * unrolled CTE layers (`mix_excess_weights_iter`). The iteration
    * state is ONE ROW PER DOMAIN — each step is two broadcast one-row
    * aggregates over a bounded frame, localCheckpoint'd so the plan
    * stays flat for any T; the corpus is scanned once by the CE pass
    * and never again. */
  def excessLossWeightsIter(df: DataFrame, idCol: String, textCol: String,
                            domainCol: String, eta: Double = 1.0,
                            steps: Int = 3): DataFrame = {
    require(eta >= 0.0, s"excessLossWeightsIter: eta must be >= 0, got $eta")
    require(steps >= 1, s"excessLossWeightsIter: steps must be >= 1, got $steps")
    val per = perDomainCe(df, idCol, textCol, domainCol).localCheckpoint()
    val gt = per.agg(sum(col("n_trans")).as("__gt"))
    var w = per.join(broadcast(gt))
      .select(col("domain"),
        round(col("n_trans").cast("double") / col("__gt").cast("double"), 8)
          .cast("decimal(20,8)").as("__w"))
      .localCheckpoint()
    for (_ <- 1 to steps) {
      val joined = per.select(col("domain"), col("mean_ce"))
        .join(w, Seq("domain"))
      val bl = joined.agg(
        sum((col("__w") * col("mean_ce").cast("decimal(18,6)"))
          .cast("decimal(38,14)")).as("__blMass"),
        sum(col("__w")).as("__wSum"))
      val stepped = joined.join(broadcast(bl))
        .withColumn("__baseline",
          round(col("__blMass").cast("double") / col("__wSum").cast("double"), 6))
        .withColumn("__excess",
          greatest(lit(0.0), round(col("mean_ce") - col("__baseline"), 6)))
        .withColumn("__tilt",
          round(col("__w").cast("double") *
            (lit(1.0) + lit(eta) * col("__excess")), 8).cast("decimal(20,8)"))
      val z = stepped.agg(sum(col("__tilt")).as("__z"))
      w = stepped.join(broadcast(z))
        .select(col("domain"),
          round(col("__tilt").cast("double") / col("__z").cast("double"), 8)
            .cast("decimal(20,8)").as("__w"))
        .localCheckpoint()
    }
    per.join(w, Seq("domain"))
      .select(col("domain"), col("n_docs"), col("n_trans"), col("mean_ce"),
        round(col("__w").cast("double"), 6).as("weight"))
  }

  /** The DoReMi trainer-mix stage as ONE operator — the published
    * two-phase recipe (Xie et al. 2023: train a proxy to measure
    * per-domain excess loss, then RESAMPLE the corpus under the
    * resulting weights) composed end to end: iterated excess-loss
    * weights over the corpus's own bigram-LM CE
    * ([[excessLossWeightsIter]]), weights → executable keep rates
    * ([[ratesForTargetWeights]]), rates → the map-only stratified
    * sample ([[mixStrata]]). This is the composition a curation chain
    * runs between dedup and packing; the `mix_excess` config kind
    * exposes it as a registry stage.
    *
    * The per-domain rates table is ONE ROW PER DOMAIN; collecting it
    * to the driver is the bounded-driver-table pattern (BPE merge
    * tables, k-means centroids), and turns the resample into a pure
    * codegen'd CASE predicate over the corpus — the corpus pays the
    * one CE scan [[excessLossWeightsIter]] already costs plus one
    * map-only filter pass, no join. Domains with no scoreable
    * document (< 2 words everywhere — no CE row, no natural share)
    * and null domains fall to `defaultRate` 1.0: a domain the proxy
    * cannot price is passed through, not silently dropped.
    *
    * NOTE for chain use: the input is scanned twice (CE pass +
    * filter pass) — stage wrappers over lazy multi-stage lineages
    * should materialize the input once first (the `mix_excess` kind
    * does, the `dedup_minhash` convention). */
  def mixByExcessLoss(df: DataFrame, idCol: String, textCol: String,
                      domainCol: String, eta: Double = 1.0,
                      steps: Int = 1, salt: String = "graft"): DataFrame = {
    val weights = excessLossWeightsIter(df, idCol, textCol, domainCol,
      eta, steps)
    val rates = ratesForTargetWeights(weights)
      .select(col("domain").cast("string").as("domain"), col("rate"))
      .collect()
      .filter(!_.isNullAt(0))
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    mixStrata(df, domainCol, idCol, rates, defaultRate = 1.0, salt)
  }

  /** Apply a PERSISTED per-domain rates ledger (the
    * [[ratesForTargetWeights]] layout the `excess_weights` config sink
    * writes) to a corpus — the production half of the published DoReMi
    * two-phase recipe (Xie et al. 2023: a PROXY run measures the
    * weights; the production run resamples under them). Stateless
    * given the ledger: the tiny one-row-per-domain frame is collected
    * to the driver (the bounded-driver-table pattern) and the resample
    * is one codegen'd map-only CASE predicate — which is exactly why
    * this composes into the STREAMED curation chain unchanged, where
    * the in-flight [[mixByExcessLoss]] (a global corpus measurement)
    * cannot. Domains absent from the ledger keep `defaultRate`: a
    * domain the proxy never saw is passed through, not dropped. */
  def applyRatesLedger(df: DataFrame, rates: DataFrame, domainCol: String,
                       keyCol: String, defaultRate: Double = 1.0,
                       salt: String = "graft"): DataFrame = {
    val m = rates
      .select(col("domain").cast("string").as("domain"),
        col("rate").cast("double").as("rate"))
      .collect()
      .filter(!_.isNullAt(0))
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    mixStrata(df, domainCol, keyCol, m, defaultRate, salt)
  }

  /** Achieved-vs-target mix report — the sanity check a trainer-mix
    * run ships with (DoReMi and the Dolma/Pile datacards report the
    * achieved per-domain token fractions next to the targets): per
    * domain, achieved tokens and share against the target weight,
    * flagged `ok = false` when |share − target| > `tol`. Target
    * domains absent from the corpus surface with 0 tokens (a silent
    * total drop is exactly what this catches); corpus domains without
    * a target carry a null target and are unconstrained (`ok`).
    * Shares are rounded to 6 dp BEFORE the tolerance comparison so the
    * flag is engine-stable.
    *
    * Scale shape: one aggregation on the bounded domain key (map-side
    * combined), a one-row total broadcast back, a full-outer join
    * against the (tiny, driver-literal) target table. */
  def mixReport(df: DataFrame, domainCol: String, tokensCol: Column,
                targets: Map[String, Double],
                tol: Double = 0.02): DataFrame = {
    require(tol >= 0.0, s"mixReport: tol must be >= 0, got $tol")
    val spark = df.sparkSession
    val achieved = df
      .groupBy(col(domainCol).cast("string").as("domain"))
      .agg(sum(tokensCol.cast("long")).as("tokens"))
    val total = achieved.agg(sum(col("tokens")).cast("double").as("__total"))
    val t = spark.createDataFrame(targets.toSeq.sortBy(_._1))
      .toDF("domain", "target")
    achieved.join(t, Seq("domain"), "full_outer")
      .na.fill(0L, Seq("tokens"))
      .crossJoin(broadcast(total))
      .select(col("domain"), col("tokens"),
        round(col("tokens") / col("__total"), 6).as("share"),
        col("target"),
        (col("target").isNull ||
          abs(round(col("tokens") / col("__total"), 6) - col("target"))
            <= lit(tol)).as("ok"))
  }

  /** One phase of an epoch-phase mix schedule: a token budget and the
    * per-domain target weights active until that budget is spent. */
  final case class MixPhase(name: String, tokenBudget: Long,
                            targets: Map[String, Double]) {
    require(name.nonEmpty, "MixPhase: empty name")
    require(tokenBudget > 0,
      s"MixPhase '$name': tokenBudget must be positive, got $tokenBudget")
    require(targets.nonEmpty, s"MixPhase '$name': no target weights")
  }

  /** Compile an EPOCH-PHASE MIX SCHEDULE into a phased rates ledger —
    * the published two-phase pretraining / mid-training recipes shift
    * the domain mix at token-budget boundaries (upweight high-quality
    * or instruction-dense data late); one declaration compiles EVERY
    * phase's target weights through [[ratesForTargetWeights]] against
    * the corpus's natural token shares, so the whole schedule becomes
    * one bounded (phases × domains) plan table a trainer run can audit
    * up front. The natural shares are measured ONCE (one aggregation
    * on the bounded domain key) and every phase's rate compilation is
    * driver-cheap arithmetic over that frame — the corpus never pays
    * per-phase scans here. Shares are taken over each phase's TARGET
    * domains (a phase's mix spec is exhaustive — domains it omits
    * don't dilute its shares). Returns (phase_idx, phase,
    * token_budget, domain, n_trans, share, weight, rate). */
  def phaseRatesLedger(df: DataFrame, idCol: String, textCol: String,
                       domainCol: String,
                       phases: Seq[MixPhase]): DataFrame = {
    require(phases.nonEmpty, "phaseRatesLedger: no phases")
    require(phases.map(_.name).distinct.size == phases.size,
      "phaseRatesLedger: duplicate phase names")
    val spark = df.sparkSession
    import spark.implicits._
    val nat = df.groupBy(col(domainCol).cast("string").as("domain"))
      .agg(sum(TextAnalysis.wsTokenCount(col(textCol)).cast("long"))
        .as("n_trans"))
      .localCheckpoint() // one row per domain; every phase reuses it
    phases.zipWithIndex.map { case (p, i) =>
      val tgt = p.targets.toSeq.sortBy(_._1).toDF("domain", "weight")
      ratesForTargetWeights(nat.join(tgt, Seq("domain")))
        .select(lit(i.toLong).as("phase_idx"), lit(p.name).as("phase"),
          lit(p.tokenBudget).as("token_budget"), col("domain"),
          col("n_trans"), col("share"), col("weight"), col("rate"))
    }.reduce(_ unionByName _)
  }

  /** EXECUTE an epoch-phase mix schedule: for each phase, one map-only
    * md5-bucket resample under the phase's compiled rates (salted by
    * phase name — phases draw INDEPENDENT samples, so the re-weighted
    * phase genuinely re-selects rather than subsetting the previous
    * phase), then GLOBAL token-budget admission in md5-rank order (the
    * [[tokenBudgetSample]] two-phase prefix machinery with a constant
    * source — overshoot ≤ one document per phase, the phase-boundary
    * token counts match the `mix_token_budget_epochs` arithmetic).
    * Domains outside a phase's targets drop for that phase (the spec
    * is exhaustive). Returns (phase_idx, phase, doc_id, domain,
    * n_tokens, tok_before).
    *
    * Scale shape per phase: the rates table is one driver row per
    * domain (bounded-driver-table pattern) turning the resample into a
    * codegen'd CASE predicate; the budget admission is the
    * already-probed two-phase prefix sum. The corpus pays one
    * measured-shares aggregation plus one sampled scan per phase —
    * phases are few (published schedules: 2–4). */
  def phasedMixSchedule(df: DataFrame, idCol: String, textCol: String,
                        domainCol: String, phases: Seq[MixPhase],
                        salt: String = "graft"): DataFrame = {
    val ledger = phaseRatesLedger(df, idCol, textCol, domainCol, phases)
      .localCheckpoint()
    phases.zipWithIndex.map { case (p, i) =>
      val rates = ledger.where(col("phase_idx") === i)
        .select(col("domain"), col("rate")).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val sampled = mixStrata(df, domainCol, idCol, rates,
        defaultRate = 0.0, salt = s"$salt#${p.name}")
      // the admission RANK must hash independently of the keep bucket:
      // a rate-r domain's survivors all carry buckets < r·2³², so
      // ranking by the SAME hash clusters them at the low end of the
      // admission order and the budget over-draws exactly the
      // downweighted domains (measured: the anneal phase came out
      // src2-heavy instead of src3-heavy) — '#rank' decorrelates them
      // and the admitted mix tracks the sampled mix
      tokenBudgetSample(sampled.withColumn("__sched", lit("_")),
          idCol, textCol, "__sched", p.tokenBudget,
          salt = s"$salt#${p.name}#rank")
        .select(col("doc_id"), col("n_tokens"), col("tok_before"))
        .join(df.select(col(idCol).as("doc_id"),
          col(domainCol).cast("string").as("domain")), "doc_id")
        .select(lit(i.toLong).as("phase_idx"), lit(p.name).as("phase"),
          col("doc_id"), col("domain"), col("n_tokens"), col("tok_before"))
    }.reduce(_ unionByName _)
  }

  /** Turn target mix weights into EXECUTABLE per-domain keep rates for
    * [[mixStrata]] — the step from "domain i should carry
    * weight w_i" ([[excessLossWeights]], or any hand-set target mix)
    * to a sampling plan a single map-only pass can apply: with
    * `share_i = n_trans_i / Σ n_trans` the natural token share,
    * `rate_i = (w_i / share_i) / max_j (w_j / share_j)` — the largest
    * upweight saturates at rate 1.0 (sampling cannot mint data; the
    * caller upsamples beyond 1.0 with [[upsample]]) and
    * every other domain keeps proportionally less, so SAMPLED tokens
    * land ∝ w_i exactly. One groupBy-less pass over the (tiny,
    * one-row-per-domain) weights frame; the max is a broadcast
    * one-row aggregate. Returns (domain, n_trans, share, weight,
    * rate), all 6-dp-rounded doubles over exact DECIMAL/BIGINT inputs
    * — replayable cross-engine. */
  def ratesForTargetWeights(weights: DataFrame,
                            domainCol: String = "domain",
                            transCol: String = "n_trans",
                            weightCol: String = "weight"): DataFrame = {
    val tot = weights.agg(sum(col(transCol).cast("decimal(38,0)")).as("__t"))
    val shared = weights.join(broadcast(tot))
      .withColumn("share",
        round(col(transCol).cast("double") / col("__t").cast("double"), 6))
      // fail-fast convention (cf. lshBucket's dim guard): a hand-set
      // weights row with n_trans = 0 has no natural share — dividing
      // through it poisons max(__ratio) with Infinity/null and
      // silently collapses every OTHER domain's rate toward 0. A
      // domain with no tokens cannot be upweighted by sampling; the
      // caller must drop the row or route it through upsample.
      .withColumn("__ratio",
        when(col("share") > 0d, round(col(weightCol) / col("share"), 6))
          .otherwise(raise_error(concat(
            lit("ratesForTargetWeights: domain '"),
            col(domainCol).cast("string"),
            lit(s"' has non-positive token share ($transCol = "),
            col(transCol).cast("string"),
            lit(") — drop the row or upsample it explicitly")))
            .cast("double")))
    val mx = shared.agg(max(col("__ratio")).as("__mx"))
    shared.join(broadcast(mx))
      .select(col(domainCol).as("domain"), col(transCol).as("n_trans"),
        col("share"), col(weightCol).as("weight"),
        round(col("__ratio") / col("__mx"), 6).as("rate"))
  }
}
