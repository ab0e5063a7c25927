package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023): score every raw document by how much more likely its
  * hashed n-gram bag is under a TARGET distribution (e.g. curated
  * wiki/books-like text) than under the RAW distribution, then resample
  * top-k under deterministic Gumbel noise.
  *
  * Reference behavior modeled: the published DSIR recipe (hashed
  * unigram+bigram features, bag-of-ngrams likelihood ratio, Gumbel
  * top-k); no reference-repo counterpart — this is part of the
  * training-data extension surface.
  *
  * Cross-engine determinism: features hash through the first 4 md5 hex
  * chars (pure substring arithmetic — the repo's standing portable-hash
  * trick, see [[Mixing.hashBucket]] / [[Packing]] digests), per-bucket
  * log-ratios are rounded to 12 dp BEFORE the per-doc sum and summed as
  * DECIMAL, and the Gumbel draw derives from an md5 bucket of the doc
  * id — every stage is reproducible across runs, engines, and
  * partitionings.
  *
  * Scale shape (100 TB): feature extraction is a map-side explode; the
  * two distribution estimates are bounded-key aggregations (`nBuckets`
  * rows out, map-side combinable); the weight table (`nBuckets` rows)
  * BROADCASTS into the per-doc join; the per-doc score is one doc-key
  * aggregation; top-k goes through TakeOrderedAndProject. Nothing
  * materializes more than corpus-linear rows, and the only corpus-sized
  * shuffle is the per-doc score aggregation.
  */
object Importance {

  /** 16-bit integer value of the first 4 md5 hex chars of
    * (salt ++ feature) — portable across engines as pure substring
    * arithmetic (no conv()/from_hex). */
  private def featBucket(feat: Column, salt: String, nBuckets: Int): Column =
    // md5 LET-BOUND: the four digit terms each reference the hash, and
    // only a lambda binding guarantees one evaluation per row
    Dedup.letBound(md5(concat(lit(salt), feat))) { h =>
      val v = (1 to 4).map { i =>
        (instr(lit("0123456789abcdef"), substring(h, i, 1)) - 1) *
          (1 << (4 * (4 - i)))
      }.reduce(_ + _)
      pmod(v, lit(nBuckets)).cast("long")
    }

  /** The unigram+bigram feature array of a text column (normalized
    * words ++ space-joined bigrams), shared by the exploding and the
    * scalar feature paths. Bigrams join with a single space, which
    * post-split words cannot contain — no collisions. */
  private[llm] def featsOf(textCol: Column): Column = {
    val ws = split(Dedup.normalizeText(textCol), " ")
    Dedup.letBound(filter(ws, w => w =!= "")) { w =>
      // sequence(a, b) counts DOWN when b < a -- guard the 0/1-word case
      val bigrams = when(size(w) >= 2,
        transform(sequence(lit(0), size(w) - 2),
          i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2))))
        .otherwise(array().cast("array<string>"))
      concat(w, bigrams)
    }
  }

  /** Hashed unigram+bigram feature occurrences: one row per feature
    * occurrence, `(doc_id, bucket)`. Map-only (explode). */
  def featureRows(df: DataFrame, idCol: String, textCol: String,
                  nBuckets: Int = 10000, salt: String = "dsir"): DataFrame =
    df.select(col(idCol).as("doc_id"), explode(featsOf(col(textCol))).as("feat"))
      .select(col("doc_id"), featBucket(col("feat"), salt, nBuckets).as("bucket"))

  /** Per-bucket add-one-smoothed log-likelihood ratio
    * `ln p_target(b) - ln p_raw(b)`, one row per bucket present in the
    * RAW corpus (raw documents can only contain raw-present buckets, so
    * the table is closed over everything the scoring join will look
    * up). Rounded to 12 dp so both engines sum identical decimals.
    * Output is at most `nBuckets` rows — broadcastable by
    * construction. */
  def bucketLogRatios(raw: DataFrame, target: DataFrame,
                      idCol: String, textCol: String,
                      nBuckets: Int = 10000, salt: String = "dsir"): DataFrame =
    ratiosFrom(
      featureRows(raw, idCol, textCol, nBuckets, salt)
        .groupBy(col("bucket")).agg(count(lit(1)).as("n")),
      featureRows(target, idCol, textCol, nBuckets, salt)
        .groupBy(col("bucket")).agg(count(lit(1)).as("nt")),
      nBuckets)

  /** ONE definition of the smoothed log-ratio arithmetic, shared by
    * [[bucketLogRatios]] and [[logWeights]] so they cannot drift. */
  private def ratiosFrom(rawC: DataFrame, tgtC: DataFrame,
                         nBuckets: Int): DataFrame = {
    val rawTot = rawC.agg(sum(col("n")).as("rt"))
    val tgtTot = tgtC.agg(sum(col("nt")).as("tt"))
    rawC.join(tgtC, Seq("bucket"), "left")
      .crossJoin(broadcast(rawTot)).crossJoin(broadcast(tgtTot))
      .select(col("bucket"),
        round(
          log((coalesce(col("nt"), lit(0L)) + 1).cast("double") /
              (col("tt") + nBuckets).cast("double")) -
          log((col("n") + 1).cast("double") /
              (col("rt") + nBuckets).cast("double")),
          12).as("log_ratio"))
  }

  /** Per-document DSIR log importance weight: the DECIMAL-routed sum of
    * its features' bucket log-ratios. Documents with no features
    * (empty/whitespace text) produce no row — callers decide their
    * fate explicitly. */
  def logWeights(raw: DataFrame, target: DataFrame,
                 idCol: String, textCol: String,
                 nBuckets: Int = 10000, salt: String = "dsir"): DataFrame = {
    // the raw feature frame feeds BOTH the raw distribution estimate
    // and the scoring join — cache it so the corpus pays one
    // extraction pass, and release as soon as the (corpus-linear,
    // 3-column) weight frame is materialized
    val rawFeats = featureRows(raw, idCol, textCol, nBuckets, salt).cache()
    val lr = ratiosFrom(
      rawFeats.groupBy(col("bucket")).agg(count(lit(1)).as("n")),
      featureRows(target, idCol, textCol, nBuckets, salt)
        .groupBy(col("bucket")).agg(count(lit(1)).as("nt")),
      nBuckets)
    val out = rawFeats
      .join(broadcast(lr), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"),
        sum(col("log_ratio").cast("decimal(27,12)")).cast("double")
          .as("log_weight"))
      .localCheckpoint(true)
    rawFeats.unpersist()
    out
  }

  /** Deterministic Gumbel draw for a key: `-ln(-ln(u))` with
    * `u = (bucket32 + 0.5) / 2^32` from the md5 bucket of
    * (salt ++ key) — u is exactly representable, so both engines take
    * ln of the same double. Rounded to 12 dp. */
  private[llm] def gumbel(key: Column, salt: String): Column =
    Dedup.letBound(md5(concat(lit(salt), key.cast("string")))) { h =>
      round(-log(-log(
        (Packing.rankDigest(h).cast("double") + 0.5) / 4294967296.0)), 12)
    }

  /** Deterministic pseudo-random weight table for
    * [[classifierScore]]: one row per bucket,
    * `weight = round(md5bucket32/2^32 * 2 - 1, 12)` in [-1, 1). Stands
    * in for trained fastText weights where no model artifact exists
    * (fixtures, smoke tests) — real deployments load their trained
    * `(bucket, weight)` table from parquet instead. */
  def seededWeights(spark: org.apache.spark.sql.SparkSession,
                    nBuckets: Int = 10000,
                    salt: String = "clfw"): DataFrame =
    spark.range(nBuckets.toLong).select(col("id").as("bucket"),
      round(Packing.rankDigest(md5(concat(lit(salt), col("id").cast("string"))))
          .cast("double") / 4294967296.0 * 2.0 - 1.0,
        12).as("weight"))

  /** fastText-style hashed linear classifier TRAINING (Joulin et al.,
    * "Bag of Tricks for Efficient Text Classification", EACL 2017):
    * full-batch logistic regression over the hashed unigram+bigram bag,
    * producing the `(bucket, weight)` table [[classifierScore]] loads.
    * The model is exactly the inference shape — `p = sigmoid(Σ_b w_b ·
    * cnt_db / n_d)` (mean feature weight) — so a trained table replays
    * bit-for-bit through the scoring path.
    *
    * Scale shape (100 TB): feature extraction runs ONCE — the per-doc
    * per-bucket count frame is hash-partitioned on the doc key and
    * cached, so each gradient iteration is (a) a BROADCAST join against
    * the ≤`nBuckets`-row weight table, (b) a per-doc margin aggregation
    * and error join that both REUSE the cached partitioning (no
    * exchange), and (c) one bounded-key gradient aggregation emitting
    * ≤`nBuckets` rows. Only the gradient (bounded by construction, like
    * the BPE merge table, [[Bpe]]) ever reaches the driver; the corpus
    * never does.
    *
    * Cross-engine determinism: per-row contributions are doubles of
    * 12-dp-rounded inputs, per-doc and per-bucket sums are
    * DECIMAL-routed (order-independent), the driver applies updates in
    * bucket order, and weights re-round to 12 dp every step — the same
    * run on any partitioning or cluster size yields the identical
    * weight table.
    *
    * @param labeled  frame with a 0/1 label column; `idCol` must be
    *                 unique
    * @param l2       ridge penalty (per-example scale)
    * @param sampleFraction train on a deterministic md5-sampled subset
    *                 (the 100 TB shape: each full-batch iteration is a
    *                 pass over the cached feature frame, and a quality
    *                 classifier saturates around ~10⁶ examples — hash
    *                 the training set down rather than paying
    *                 iters × corpus; sampling is by [[Mixing]]'s
    *                 engine-portable md5 predicate, so the subset is
    *                 reproducible anywhere)
    * @return all `nBuckets` rows `(bucket, weight)`; buckets unseen in
    *         training carry weight 0, so the table is closed over
    *         anything inference can hash to (same shape as
    *         [[seededWeights]]) */
  def trainClassifier(labeled: DataFrame, idCol: String, textCol: String,
                      labelCol: String, nBuckets: Int = 10000,
                      salt: String = "dsir", iters: Int = 30,
                      learnRate: Double = 2.0, l2: Double = 0.0,
                      sampleFraction: Double = 1.0): DataFrame = {
    require(iters > 0 && learnRate > 0.0,
      s"trainClassifier: iters/learnRate must be positive, got $iters/$learnRate")
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"trainClassifier: sampleFraction must be in (0, 1], got $sampleFraction")
    val train = if (sampleFraction >= 1.0) labeled
      else Mixing.deterministicSample(labeled, idCol, sampleFraction,
        salt + "_ts")
    val spark = labeled.sparkSession
    import spark.implicits._
    val dec = "decimal(27,12)"
    // partition count sized to the DATA, not the core count (guide §2:
    // driver-loop state must not pay a fixed 32-way exchange per
    // iteration when the training set is tiny, and must still fan out
    // on a real corpus). One cheap map-only count of the training rows
    // decides it; ~2k docs per partition keeps per-task feature rows in
    // the healthy range at any scale.
    val nTrain = train.count()
    val xParts = math.max(1, math.ceil(nTrain / 2048.0).toInt)
    // (doc_id, bucket, cnt, n, y) — one extraction pass, then
    // hash-partitioned on the doc key and cached so every iteration's
    // per-doc aggregation and error join are exchange-free
    val x = featureRows(train, idCol, textCol, nBuckets, salt)
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("n", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .join(labeled.select(col(idCol).as("doc_id"),
        col(labelCol).cast("double").as("y")), Seq("doc_id"))
      .repartition(xParts, col("doc_id"))
      .cache()
    val nDocs = x.select(col("doc_id")).distinct().count()
    require(nDocs > 0, "trainClassifier: no featured documents")

    val w = Array.fill(nBuckets)(0.0)
    (1 to iters).foreach { _ =>
      // weight lookup as an array LITERAL indexed per feature row —
      // the same values the former nBuckets-row broadcast join carried
      // (the table was dense over 0..nBuckets-1, so the inner join
      // matched every row exactly once), without paying a broadcast
      // build + exchange job per iteration
      val wCol = element_at(typedLit(w.toIndexedSeq),
        (col("bucket") + 1).cast("int"))
      // err_d = sigmoid(Σ w_b·cnt/n) - y, rounded for the gradient pass
      val err = x
        .groupBy(col("doc_id"), col("y"), col("n"))
        .agg(sum(round(wCol * col("cnt"), 12).cast(dec)).as("__s"))
        .select(col("doc_id"),
          round(lit(1.0) /
              (lit(1.0) + exp(-(col("__s").cast("double") / col("n")))) -
            col("y"), 12).as("err"))
      // g_b = Σ_d err_d · cnt_db / n_d  (≤ nBuckets rows out)
      val grad = x.join(err, Seq("doc_id"))
        .groupBy(col("bucket"))
        .agg(sum(round(col("err") * col("cnt") / col("n"), 12).cast(dec))
          .as("g"))
        .select(col("bucket"), col("g").cast("double"))
        .as[(Long, Double)].collect().sortBy(_._1)
      grad.foreach { case (b, g) =>
        val i = b.toInt
        w(i) = BigDecimal(w(i) - learnRate * (g / nDocs + l2 * w(i)))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    x.unpersist()
    w.toIndexedSeq.zipWithIndex
      .map { case (wt, b) => (b.toLong, wt) }.toDF("bucket", "weight")
  }

  /** fastText-style hashed linear classifier INFERENCE (Joulin et al.,
    * "Bag of Tricks for Efficient Text Classification", EACL 2017):
    * `score = sigmoid(mean weight of the doc's hashed unigram+bigram
    * features)` — the model-based quality-filter shape (GPT-3/LLaMA
    * pretraining used exactly this: a linear classifier over hashed
    * n-gram bags scoring web documents against a curated target).
    * Training is out of scope; `weights` is the trained per-bucket
    * table (or [[seededWeights]] for deterministic fixtures).
    *
    * Cross-engine determinism: features hash like [[featureRows]],
    * per-bucket weights are pre-rounded to 12 dp, the per-doc sum is
    * DECIMAL-routed, and the sigmoid is taken over the (exactly
    * representable) mean — both engines exponentiate the same double.
    *
    * Scale shape (100 TB): map-side explode, a BROADCAST join against
    * the ≤`nBuckets`-row weight table, and ONE corpus-sized shuffle
    * (the per-doc aggregation). Documents with no features produce no
    * row, mirroring [[logWeights]]. */
  def classifierScore(df: DataFrame, weights: DataFrame,
                      idCol: String, textCol: String,
                      nBuckets: Int = 10000, salt: String = "dsir"): DataFrame =
    featureRows(df, idCol, textCol, nBuckets, salt)
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"),
        (sum(col("weight").cast("decimal(27,12)")).cast("double") /
          count(lit(1)).cast("double")).as("__m"))
      .select(col("doc_id"), col("n_feats"),
        round(lit(1.0) / (lit(1.0) + exp(-col("__m"))), 6).as("score"))

  /** Keep-rate threshold sweep over a score frame — the calibration
    * report run BEFORE committing a quality-filter cutoff (a threshold
    * chosen blind either starves the corpus or keeps the junk; the
    * sweep shows the kept-fraction curve so the cutoff is a measured
    * decision). ONE aggregation pass computes every threshold's count
    * (map-side combined conditional sums — no per-threshold rescans,
    * no row explosion); the 1-row result unpivots driver-free into
    * (threshold, n_scored, n_kept, keep_rate). */
  def thresholdSweep(scores: DataFrame, scoreCol: String,
                     thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "thresholdSweep: no thresholds")
    val aggs = count(col(scoreCol)).as("__n") +: thresholds.zipWithIndex.map {
      case (t, i) =>
        sum(when(col(scoreCol) >= t, 1L).otherwise(0L)).as(s"__k$i")
    }
    val row = scores.agg(aggs.head, aggs.tail: _*)
    row.select(explode(array(thresholds.zipWithIndex.map { case (t, i) =>
        struct(lit(t).as("threshold"), col("__n").as("n_scored"),
          coalesce(col(s"__k$i"), lit(0L)).as("n_kept"))
      }: _*)).as("__s"))
      .select(col("__s.threshold"), col("__s.n_scored"), col("__s.n_kept"))
      .withColumn("keep_rate",
        when(col("n_scored") > 0,
          round(col("n_kept").cast("double") / col("n_scored"), 6))
          .otherwise(lit(0d)))
  }

  /** A `(bucket, weight)` table collected to a dense driver-side array
    * for [[classifierScoreCol]] — bounded by construction (≤ nBuckets
    * rows, the same budget the broadcast join carries). Missing buckets
    * default to weight 0. */
  def weightArray(weights: DataFrame, nBuckets: Int = 10000): IndexedSeq[Double] = {
    val w = Array.fill(nBuckets)(0.0)
    weights.select(col("bucket").cast("long"), col("weight").cast("double"))
      .collect().foreach(r => w(r.getLong(0).toInt) = r.getDouble(1))
    w.toIndexedSeq
  }

  /** MAP-ONLY classifier scoring: the same model as [[classifierScore]]
    * (sigmoid of the mean hashed-feature weight) evaluated as a scalar
    * column — the weight table rides along as an array LITERAL indexed
    * per feature, so scoring a corpus costs ZERO shuffles and composes
    * into any single-pass pipeline (the 100 TB curation shape: the
    * aggregation-and-join form pays one corpus shuffle per scoring
    * pass; this pays none).
    *
    * Cross-engine determinism: weights must be pre-rounded to 12 dp
    * (both [[seededWeights]] and [[trainClassifier]] are); each is
    * scaled to an exact 1e12-integer and summed as BIGINT over the
    * feature array — order-independent and exactly replayable as
    * DuckDB `SUM(BIGINT)`. Docs with no features score null. */
  def classifierScoreCol(textCol: Column, weights: IndexedSeq[Double],
                         salt: String = "dsir"): Column = {
    val scaledW = weights.map(w => math.round(w * 1e12))
    val scaled = typedLit(scaledW)
    // |sum| ≤ nFeats · max|w|: past this feature count a plain BIGINT
    // accumulator could wrap SILENTLY (DuckDB's BIGINT SUM errors
    // instead of wrapping, so a wrap here would also diverge from the
    // oracle). Docs beyond the cap — order 10M+ features — route
    // through an exact DECIMAL(38,0) sum; CaseWhen codegen evaluates
    // only the taken branch, so typical docs never pay the decimal.
    val safeFeats = Long.MaxValue / math.max(1L, scaledW.map(math.abs).max)
    Dedup.letBound(featsOf(textCol)) { feats =>
      def elemAt(f: Column) = element_at(scaled,
        (featBucket(f, salt, weights.size) + 1).cast("int"))
      val sLong = aggregate(feats, lit(0L), (acc, f) => acc + elemAt(f))
      val sDec = aggregate(feats, lit(0L).cast("decimal(38,0)"),
        (acc, f) => (acc + elemAt(f).cast("decimal(38,0)"))
          .cast("decimal(38,0)"))
      val s = when(size(feats) <= safeFeats, sLong.cast("double"))
        .otherwise(sDec.cast("double"))
      when(size(feats) > 0,
        round(lit(1.0) / (lit(1.0) +
          exp(-(s / 1e12 / size(feats)))), 6))
    }
  }

  /** [[classifierScoreCol]] as the fused NATIVE expression
    * (`graft_clf_score`, [[graft.plans.ClassifierScoreExpression]]):
    * one codegen'd pass over the text — no word/bigram/md5 intermediate
    * arrays — bit-identical scores (spec-asserted). Caller must have
    * run `GraftExtensions.register` on the session. */
  def classifierScoreColNative(textCol: Column, weights: IndexedSeq[Double],
                               salt: String = "dsir"): Column =
    call_function("graft_clf_score", textCol,
      lit(weights.map(w => math.round(w * 1e12)).mkString(",")),
      lit(salt))

  /** DSIR selection: Gumbel-top-k resampling over the log importance
    * weights (`score = log_weight + Gumbel(doc_id)`, take the k
    * largest) — the weighted-sampling-without-replacement construction
    * from the paper, made repartition-invariant by the deterministic
    * Gumbel draw. Top-k plans as TakeOrderedAndProject (no global
    * sort); ties break by doc_id. */
  def dsirSelect(raw: DataFrame, target: DataFrame,
                 idCol: String, textCol: String, k: Int,
                 nBuckets: Int = 10000, salt: String = "dsir"): DataFrame =
    logWeights(raw, target, idCol, textCol, nBuckets, salt)
      .select(col("doc_id"), col("n_feats"),
        round(col("log_weight"), 4).as("log_weight"),
        round(col("log_weight") + gumbel(col("doc_id"), salt + "_g"), 4)
          .as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
}
