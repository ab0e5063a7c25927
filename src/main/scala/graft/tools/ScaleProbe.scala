package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-shape probe: replicate the `documents` corpus k× (ids shifted
  * so replicas are distinct documents, texts perturbed with the replica
  * index so near-dup structure doesn't explode quadratically) and time
  * the heavy LLM passes at 1×, then each requested multiple. A
  * near-linear time curve is the evidence that the plan shapes
  * (bounded buckets, map-side partials, no global windows) hold as data
  * grows — the local stand-in for "would this survive 100×?".
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.ScaleProbe 1 4 10
  * SPARK_GRAFT_PROBE_OPS=a,b restricts to matching op labels (substring
  * match) — the 100× runs probe only the steep-curve suspects.
  */
object ScaleProbe {

  private val alpha = "abcdefghijklmnopqrstuvwxyz"

  private def replicate(docs: DataFrame, k: Int): DataFrame =
    (0 until k).map { i =>
      // rotate the alphabet per replica: replica texts become mutually
      // DISSIMILAR (cross-replica shingle overlap ~0), so the near-dup
      // pair count grows linearly with k and the timing measures the
      // engine, not a quadratic output blowup
      val rot = alpha.drop(i % 26) + alpha.take(i % 26)
      docs.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        translate(col("text"), alpha, rot).as("text"))
    }.reduce(_ unionByName _)

  /** Replica i's embeddings get a per-replica deterministic SIGN-FLIP
    * pattern (replica 0 is identity): magnitudes and within-replica
    * cosine structure are preserved exactly, while two different
    * patterns agree on ~half the positions so cross-replica cosine
    * structure vanishes — near-dup output grows linearly with k.
    * (The earlier rotate-by-i scheme collides once i reaches the
    * vector dimension — replicas 0 and 64 of a 64-dim table would be
    * identical — so it cannot drive a 100× probe.) */
  private def replicateEmb(emb: DataFrame, k: Int): DataFrame =
    (0 until k).map { i =>
      val v = col("embedding")
      val flipped = if (i == 0) v
        else transform(v, (x, j) =>
          when(pmod((j + 1) * lit(2654435761L) * lit(2L * i + 1), lit(97L))
            < 48, -x).otherwise(x))
      emb.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
        flipped.as("embedding"))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

    val opsFilter: Seq[String] = sys.env.get("SPARK_GRAFT_PROBE_OPS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    def time(label: String)(body: => Long): Unit =
      if (opsFilter.isEmpty || opsFilter.exists(label.contains)) {
        val t0 = System.nanoTime()
        val n = body
        println(f"[scale] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
      }

    ks.foreach { k =>
      val corpus = replicate(docs, k).localCheckpoint(true) // isolate gen cost
      val rows = corpus.count()
      println(s"[scale] === k=$k ($rows docs) ===")
      time(s"exact_dedup x$k") {
        graft.llm.Dedup.exactDupGroups(corpus, "doc_id", "text").count()
      }
      time(s"soft_dedup x$k") {
        // the same single hash shuffle as exact_dedup plus a map-only
        // weighted draw — the curve must match exact_dedup's
        graft.llm.Dedup.softDedupSample(corpus, "doc_id", "text").count()
      }
      time(s"minhash_neardup x$k") {
        graft.llm.Dedup.minhashNearDups(corpus, "doc_id", "text", threshold = 0.5).count()
      }
      time(s"simhash_neardup x$k") {
        graft.llm.Dedup.simhashNearDups(corpus, "doc_id", "text", maxHamming = 3).count()
      }
      time(s"pack_sequences x$k") {
        graft.llm.Packing.packSequences(corpus, "doc_id",
          graft.llm.TextAnalysis.wsTokenCount(col("text")), budget = 2048).count()
      }
      time(s"text_quality_stats x$k") {
        corpus.select(graft.llm.TextAnalysis.qualityStats(col("text")).as("q"))
          .agg(avg(col("q.stop_ratio"))).count()
      }
      time(s"decontaminate_bloom x$k") {
        // benchmark side fixed-size (every 50th doc of ONE replica):
        // the probe measures the corpus-side bloom scan growing with k
        // against a constant bitset
        graft.llm.Dedup.contaminatedBloom(corpus,
          corpus.where(col("doc_id") < 10000000L && col("doc_id") % 50 === 0),
          "doc_id", "text", n = 8).count()
      }
      time(s"mix_strata x$k") {
        graft.llm.Mixing.mixStrata(
          corpus.withColumn("s", (col("doc_id") % 5).cast("string")),
          "s", "doc_id", rates = Map("0" -> 0.1, "1" -> 0.9)).count()
      }
      time(s"mix_phase x$k") {
        // 2-phase schedule over the k×-growing corpus: one bounded
        // shares aggregation + per phase a codegen'd CASE resample and
        // the two-phase md5-rank prefix — must track the scan, with
        // the admitted row count FLAT (budget-bounded) at any k
        graft.llm.Mixing.phasedMixSchedule(
          corpus.withColumn("s", (col("doc_id") % 5).cast("string")),
          "doc_id", "text", "s", Seq(
            graft.llm.Mixing.MixPhase("p1", 20000L,
              Map("0" -> 0.4, "1" -> 0.4, "2" -> 0.2)),
            graft.llm.Mixing.MixPhase("p2", 8000L,
              Map("0" -> 0.2, "1" -> 0.2, "2" -> 0.6)))).count()
      }
      time(s"sft_chain x$k") {
        // conversations scale WITH the corpus (turns/conv constant at
        // ~20): the validate-gate + render chain is two conv-key
        // exchanges over bounded arrays — must track the scan
        // replica-aware derivation: doc ids are dense only WITHIN a
        // replica (offset 1e7 apart), so conv/turn indexes must come
        // from the local id or alternation breaks across replicas
        val nConv = math.max(1L, (rows / k) / 20L)
        val turns = corpus.select(
          (expr("doc_id div 10000000") * 100000L
            + (col("doc_id") % 10000000L) % nConv).as("conv_id"),
          expr(s"(doc_id % 10000000) div $nConv").as("turn_idx"),
          when(expr(s"(doc_id % 10000000) div $nConv") % 2 === 0, "user")
            .otherwise("assistant").as("role"),
          substring(col("text"), 1, 80).as("content"))
        val gated = turns.join(
          graft.llm.Sft.validateTurns(turns).where(col("ok"))
            .select(col("conv_id")), "conv_id")
        graft.llm.Sft.render(gated).count()
      }
      time(s"bitext_margin x$k") {
        // the margin-scoring TAIL over k×-growing kNN ledgers (the
        // piece that runs at corpus scale after index retrieval):
        // id-only aggregations + windows, must stay linear
        val fwd = corpus.select(col("doc_id").as("query_id"))
          .withColumn("rank", explode(array(lit(1), lit(2), lit(3), lit(4))))
          .withColumn("neighbor_id", pmod(col("query_id") * 37 + col("rank"), lit(1000000L)))
          .withColumn("cosine", pmod(col("query_id") * 31 + col("rank") * 7, lit(1000L)).cast("double") / 1000.0)
        val bwd = fwd.select(col("neighbor_id").as("query_id"), col("rank"),
          col("query_id").as("neighbor_id"), col("cosine"))
        graft.llm.Bitext.marginScore(fwd, bwd, threshold = 1.05).count()
      }
      time(s"pref_chain x$k") {
        // DPO prep chain over k×-growing pairs: validation/render are
        // projections, dedup one hash exchange — must track the scan
        val prs = corpus.select(col("doc_id").as("pair_id"),
          (col("doc_id") % 7).cast("string").as("source"),
          substring(col("text"), 1, 40).as("prompt"),
          substring(col("text"), 41, 60).as("chosen"),
          reverse(substring(col("text"), 41, 60)).as("rejected"))
        val gated = graft.llm.Preference.validatePairs(prs)
          .where(col("ok")).drop("ok", "reason")
        graft.llm.Preference.renderPairs(
          graft.llm.Preference.dedupPairs(gated)).count()
      }
      time(s"minhash_incremental x$k") {
        // fixed-size batch (500 docs of one replica) probed against the
        // k×-growing corpus: steady-state ingest cost should stay near
        // flat — the corpus contributes one map-only banding pass
        graft.llm.Dedup.minhashNearDupsAgainst(
          docs.limit(500).select((col("doc_id") + 900000000L).as("doc_id"),
            col("text")),
          corpus, "doc_id", "text", threshold = 0.5).count()
      }
      time(s"strip_repeated_lines x$k") {
        graft.llm.Dedup.stripRepeatedLines(corpus, "doc_id", "text",
          minDocs = 3).count()
      }
      time(s"chunk_by_tokens x$k") {
        graft.llm.TextAnalysis.chunkByTokens(corpus, "doc_id", "text",
          chunkTokens = 32, stride = 24).count()
      }
      time(s"vocabulary x$k") {
        graft.llm.TextAnalysis.vocabulary(corpus, "doc_id", "text").count()
      }
      time(s"ce_against x$k") {
        // fixed-size reference LM (one replica's %5 slice) pricing the
        // k×-growing target: the reference vocab aggregation is
        // constant, the pricing join is broadcast map-side — target
        // cost should grow linearly like doc_cross_entropy's
        graft.llm.TextAnalysis.crossEntropyAgainst(corpus,
          docs.where(col("doc_id") % 5 === 0), "doc_id", "text").count()
      }
      time(s"ce_apply x$k") {
        // the deployment path: the SAME scoring against a pre-built
        // price ledger — zero reference aggregations per run, so the
        // gap to ce_against is the build-once cost the two-phase saves
        val pricesDir = s"/tmp/graft_probe_ce_prices"
        if (k == ks.head)
          graft.llm.TextAnalysis.cePrices(
              docs.where(col("doc_id") % 5 === 0))
            .write.mode("overwrite").parquet(pricesDir)
        graft.llm.TextAnalysis.crossEntropyAgainstPrices(corpus,
          spark.read.parquet(pricesDir), "doc_id", "text").count()
      }
      // noop-sink evaluation for the two steep-curve suspects: under
      // count() Catalyst prunes the reassembled text / entropy columns
      // and the probe would time a cheaper plan than production runs
      time(s"spans_strip x$k") {
        graft.llm.Dedup.stripDuplicateSpans(corpus, "doc_id", "text",
          k = 8, minDocs = 5)
          .write.format("noop").mode("overwrite").save()
        0L
      }
      time(s"substr_runs x$k") {
        // variable-length exact substring census: rolling-hash gram
        // keys are map-only, so this should track the 16-byte-key
        // aggregation curve (translate() preserves within-replica
        // duplicated runs — output grows linearly with k)
        graft.llm.ExactSubstr.duplicateRuns(corpus, "doc_id", "text",
          L = 20).count()
      }
      time(s"substr_strip x$k") {
        graft.llm.ExactSubstr.stripDuplicateRuns(corpus, "doc_id", "text",
          L = 20)
          .write.format("noop").mode("overwrite").save()
        0L
      }
      time(s"cross_entropy x$k") {
        graft.llm.TextAnalysis.unigramCrossEntropy(corpus, "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
        0L
      }
      time(s"bpe_train x$k") {
        graft.llm.Bpe.train(corpus, "text", numMerges = 50,
          maxWords = 20000).size.toLong
      }
      time(s"bpe_count x$k") {
        graft.plans.GraftExtensions.register(spark)
        // collect the 1-row sum: under count() Catalyst prunes the sum
        // expression itself and the probe times an empty scan
        corpus.select(graft.llm.Bpe.countCol(col("text"),
            graft.llm.Bpe.defaultLadder).as("n"))
          .agg(sum(col("n")).as("s")).collect().head.getLong(0)
      }
      time(s"pack_materialize x$k") {
        graft.llm.Packing.packMaterialize(
            corpus.withColumn("__w",
              filter(split(trim(col("text")), "\\s+"), w => w =!= ""))
              .where(size(col("__w")) > 0),
            "doc_id", col("__w"), budget = 2048)
          .write.format("noop").mode("overwrite").save()
        0L
      }
      time(s"unigram_count x$k") {
        graft.plans.GraftExtensions.register(spark)
        // train on the FIXED 1× corpus (bounded, constant cost); the
        // probe measures the Viterbi encode scan growing with k
        val pieces = graft.llm.Unigram.train(docs, "text",
          vocabSize = 4000, maxPieceLen = 6, emIters = 2)
        corpus.select(graft.llm.Unigram.countCol(col("text"), pieces).as("n"))
          .agg(sum(col("n")).as("s")).collect().head.getLong(0)
      }
      time(s"dsir_logweights x$k") {
        // target = a fixed-size slice of one replica; weight table is
        // bucket-bounded so only the two linear feature passes grow
        graft.llm.Importance.logWeights(corpus,
          docs.limit(200), "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
        0L
      }
      time(s"winnow_neardup x$k") {
        graft.llm.Winnow.nearDupPairs(corpus, "doc_id", "text",
          minShared = 3).count()
      }
      time(s"bigram_ce x$k") {
        graft.llm.TextAnalysis.bigramCrossEntropy(corpus, "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
        0L
      }
      time(s"decontaminate_fuzzy x$k") {
        // fixed-size benchmark vs the k×-growing corpus: the corpus
        // pays one banding pass against constant-size indexed buckets
        graft.llm.Dedup.contaminatedFuzzy(corpus,
          docs.limit(200).select((col("doc_id") + 950000000L).as("doc_id"),
            col("text")),
          "doc_id", "text", threshold = 0.5).count()
      }
      time(s"token_budget x$k") {
        graft.llm.Mixing.tokenBudgetSample(
          corpus.withColumn("s", (col("doc_id") % 20).cast("string")),
          "doc_id", "text", "s", budget = 100000L).count()
      }
      time(s"classifier_score x$k") {
        graft.llm.Importance.classifierScore(corpus,
            graft.llm.Importance.seededWeights(spark), "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
        0L
      }
      time(s"classifier_score_col x$k") {
        // the map-only scoring path: the weight table rides as an array
        // literal, so this should track the raw scan curve
        corpus.select(col("doc_id"),
            graft.llm.Importance.classifierScoreCol(col("text"),
              graft.llm.Importance.weightArray(
                graft.llm.Importance.seededWeights(spark))).as("score"))
          .write.format("noop").mode("overwrite").save()
        0L
      }
      time(s"classifier_score_native x$k") {
        graft.plans.GraftExtensions.register(spark)
        corpus.select(col("doc_id"),
            graft.llm.Importance.classifierScoreColNative(col("text"),
              graft.llm.Importance.weightArray(
                graft.llm.Importance.seededWeights(spark))).as("score"))
          .write.format("noop").mode("overwrite").save()
        0L
      }
      time(s"classifier_train x$k") {
        // 3 fixed iterations: extraction (linear) + per-iteration cost
        // (broadcast + exchange-free aggs + bounded gradient collect)
        graft.llm.Importance.trainClassifier(
          corpus.withColumn("label", (col("doc_id") % 2).cast("int")),
          "doc_id", "text", "label", iters = 3).count()
      }
      time(s"pack_greedy x$k") {
        // no-split first-fit: two bounded prefix frames + one
        // docsPerGroup-bounded group fold (native kernel) — should
        // track the pack_sequences curve
        graft.llm.Packing.packGreedy(
          corpus.withColumn("__n", size(filter(
            split(trim(col("text")), "\\s+"), w => w =!= "")).cast("long")),
          "doc_id", col("__n"), budget = 2048).count()
      }
      time(s"url_filter x$k") {
        // 200-domain blocklist frame (broadcast hash anti-joins) + one
        // keyword over a derived url column: a pure scan-rate filter
        val url = concat(lit("https://site"),
          pmod(col("doc_id"), lit(1000L)).cast("string"),
          lit(".example/doc/"), col("doc_id").cast("string"))
        val bl = spark.range(200)
          .select(concat(lit("site"), col("id"), lit(".example")).as("domain"))
        graft.llm.UrlOps.filterByUrl(corpus.withColumn("url", url),
          "url", bl, blockedKeywords = Seq("casino")).count()
      }
      time(s"repetition_stats x$k") {
        // thirteen Gopher repetition fractions in one native pass —
        // map-only, must track the scan rate
        graft.plans.GraftExtensions.register(spark)
        corpus.select(col("doc_id"),
            graft.llm.TextAnalysis.repetitionStatsFull(col("text")).as("r"))
          .write.format("noop").mode("overwrite").save()
        0L
      }
      time(s"html_extract x$k") {
        // raw-crawl main-content extraction: single-pass linear kernel
        // inside WholeStageCodegen, map-only — must track the scan rate
        graft.plans.GraftExtensions.register(spark)
        val html = concat(
          lit("<html><head><title>T</title><script>var x=1;</script></head>" +
            "<body><nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
            "<h1>Overview</h1><p>"),
          col("text"),
          lit(" tail of prose that passes the density rule okay.</p>" +
            "<div><a href=\"/m\">Read more</a></div>" +
            "<footer>(c) example</footer></body></html>"))
        corpus.select(col("doc_id"),
            graft.functions.HtmlText.extractCol(html).as("t"))
          .write.format("noop").mode("overwrite").save()
        0L
      }
      time(s"url_dedup_incremental x$k") {
        // fixed-size crawl batch (500 canonical urls, half colliding
        // with corpus urls) against the k×-growing corpus URL ledger:
        // the ledger side is one map-side-combined distinct pass (at
        // steady state a pre-materialized frame that never rescans),
        // the anti-join + keep-first shuffle only the BATCH — ingest
        // cost should track the corpus scan, never the batch quadratic
        val canonOf = (idExpr: org.apache.spark.sql.Column) =>
          graft.llm.UrlOps.canonicalizeUrl(concat(
            lit("https://www.site"), pmod(idExpr, lit(1000L)).cast("string"),
            lit(".example/Doc/"), idExpr.cast("string"),
            lit("?utm_campaign=x")))
        val ledger = corpus.select(col("doc_id"),
          canonOf(col("doc_id")).as("canon"))
        // canon first, id shift second: a single select would resolve
        // the canon expression's doc_id to the shifted alias (LCA)
        // offset clears replica ids (k*1e7 + base) at ANY probe k —
        // 9e8 collided with replicas from k=90 up and zeroed survivors
        val batch = docs.limit(500)
          .select(col("doc_id"),
            canonOf(when(col("doc_id") % 2 === 0, col("doc_id"))
              .otherwise(col("doc_id") + 90000000000L)).as("canon"))
          .select((col("doc_id") + 90000000000L).as("doc_id"), col("canon"))
        graft.llm.Dedup.exactDedupAgainst(batch, ledger,
          "doc_id", "canon").count()
      }
      time(s"c4_clean x$k") {
        // line clean + page rules, map-only; noop sink so the cleaned
        // column is actually materialized
        val page = concat(col("text"), lit(" tail line one.\nshort.\nthis is a kept closing line."))
        corpus.select(col("doc_id"),
            graft.llm.TextAnalysis.c4CleanLines(page).as("c"))
          .write.format("noop").mode("overwrite").save()
        0L
      }
      time(s"token_budget_epochs x$k") {
        // budget 3x a source's 1x token mass: at k=1 every source loops
        // ~3 epochs; at larger k the same budget admits fewer copies —
        // either way the cost is the shared two-phase prefix pass plus
        // the bounded full-epoch explode, so the curve tracks the scan
        graft.llm.Mixing.tokenBudgetSampleEpochs(
          corpus.withColumn("s", (col("doc_id") % 20).cast("string")),
          "doc_id", "text", "s", budget = 300000L, maxEpochs = 4).count()
      }
      time(s"bucketed_pack x$k") {
        // bucket-then-pack: the lengthRanked two-phase machinery + the
        // per-(bucket, group) bounded fold — must track the
        // pack_greedy/pack_sequences curve, no extra knee from the
        // bucket dimension
        graft.llm.Packing.bucketedPackGreedy(
          corpus.withColumn("__n", size(filter(
            split(trim(col("text")), "\\s+"), w => w =!= "")).cast("long")),
          "doc_id", col("__n"), nBuckets = 16, budget = 2048).count()
      }
      time(s"excess_weights x$k") {
        // DoReMi step: dominated by the bigram-CE pass (linear); the
        // reweighting itself touches one row per domain
        graft.llm.Mixing.excessLossWeights(
          corpus.withColumn("s", (col("doc_id") % 20).cast("string")),
          "doc_id", "text", "s").count()
      }
      time(s"clusters_best x$k") {
        // the full keep-best composition: banded minhash pairs (linear
        // by construction under the dissimilar-replica corpus), label
        // propagation over bounded clusters, then the arg-max struct
        // aggregation against a score frame
        val pairs = graft.llm.Dedup.minhashNearDups(corpus, "doc_id",
          "text", threshold = 0.5)
        graft.llm.Dedup.nearDupClustersBest(pairs,
          corpus.select(col("doc_id"),
            (col("doc_id") % 97).cast("double").as("score")),
          "doc_id", "score").count()
      }
      // steady-state ANN ingest: the index grows with k, the append
      // batch is FIXED (500 vectors of one replica, ids shifted) —
      // append cost = batch x bounded centroids + one partitioned
      // write, so it should stay near flat as the index grows. The
      // build happens OUTSIDE the timer: the probe measures ingest,
      // not (re)build.
      locally {
        // same label-contains-token convention as time()
        val wantIvf = opsFilter.isEmpty ||
          opsFilter.exists(t => s"ivf_append x$k".contains(t))
        if (wantIvf) {
          val embK = replicateEmb(emb, k).localCheckpoint(true)
          val dir = s"/tmp/graft_probe/ivf_x$k"
          // stale generations from a previous probe run would shadow
          // the fresh flat build (reindex probe below commits gens)
          val dp = new org.apache.hadoop.fs.Path(dir)
          dp.getFileSystem(spark.sessionState.newHadoopConf())
            .delete(dp, true)
          graft.llm.Similarity.buildIvfIndex(embK, dir, nCentroids = 16)
          embK.unpersist()
          time(s"ivf_append x$k") {
            graft.llm.Similarity.appendIvfIndex(spark,
              emb.limit(500).select((col("vec_id") + 900000000L).as("vec_id"),
                col("embedding")), dir)
            spark.read.parquet(s"$dir/assignments").count()
          }
          // drift-triggered REINDEX on the k×-growing index: refit +
          // re-assign + partitioned rewrite — expected ~linear in k
          // (one corpus read, one fit, one write). The SWAP the serving
          // stream sees is the resolve below: one listStatus + marker
          // probe, constant regardless of corpus size — reindex cost
          // scales with the corpus, serving downtime is zero.
          time(s"ivf_reindex x$k") {
            val gen = graft.llm.Similarity.reindexIvf(spark, dir,
              nCentroids = 16)
            spark.read.parquet(s"$gen/assignments").count()
          }
          time(s"reindex_resolve x$k") {
            graft.llm.Similarity.resolveIndexRoot(spark, dir).length.toLong
          }
        }
      }
      // SEGMENT-COMPACTION payoff on the k×-growing index: a long
      // low-drift append history (24 fixed-size batches, each landing
      // its own files per cluster dir) fragments the layout; the probe
      // battery pays the per-file opens. Compaction folds the history
      // (one index read + one cluster-shuffled write — tracks the
      // INDEX, never the corpus) and the same battery re-runs over one
      // file per cluster. serve_fragmented vs serve_compacted is the
      // payoff; ivf_compact is the cost.
      locally {
        val want = opsFilter.isEmpty ||
          opsFilter.exists(t => s"ivf_compact x$k".contains(t))
        if (want) {
          val embK = replicateEmb(emb, k).localCheckpoint(true)
          val dir = s"/tmp/graft_probe/ivfc_x$k"
          val dp = new org.apache.hadoop.fs.Path(dir)
          dp.getFileSystem(spark.sessionState.newHadoopConf())
            .delete(dp, true)
          graft.llm.Similarity.buildIvfIndex(embK, dir, nCentroids = 16)
          embK.unpersist()
          for (i <- 0 until 24)
            graft.llm.Similarity.appendIvfIndex(spark,
              emb.limit(100).select(
                (col("vec_id") + lit(900000000L + i * 1000L)).as("vec_id"),
                col("embedding")), dir)
          val battery = emb.limit(8)
            .select((col("vec_id") + lit(800000L)).as("vec_id"),
              col("embedding"))
            .localCheckpoint(true)
          time(s"ivf_serve_fragmented x$k") {
            graft.llm.Similarity.ivfQueryIndex(spark, dir, battery, k = 5)
              .count()
          }
          time(s"ivf_compact x$k") {
            graft.llm.Similarity.compactVectorIndex(spark, dir).count()
          }
          graft.llm.Similarity.vacuumIndex(spark, dir)
          time(s"ivf_serve_compacted x$k") {
            graft.llm.Similarity.ivfQueryIndex(spark, dir, battery, k = 5)
              .count()
          }
        }
      }
      time(s"vocab_coverage x$k") {
        // vocab fixed (corpus words >= 100 at 1x scale), coverage scan
        // grows with k: broadcast hash join + map-side-combined doc agg
        val vocab = graft.llm.TextAnalysis.vocabulary(docs, "doc_id", "text")
          .where(col("n_total") >= 100).select(col("word"))
          .localCheckpoint(true)
        graft.llm.TextAnalysis.vocabCoverage(corpus, "doc_id", "text", vocab)
          .write.format("noop").mode("overwrite").save()
        0L
      }
      time(s"length_bucket x$k") {
        // same two-phase prefix machinery as pack_sequences — must
        // track its curve
        graft.llm.Packing.lengthBucketBatches(corpus, "doc_id",
          graft.llm.TextAnalysis.wsTokenCount(col("text")),
          nBuckets = 32, batchSize = 32).count()
      }
      // IVF-PQ: the one-time index build runs OUTSIDE the timer (same
      // discipline as ivf_append below); the timed figure is QUERY
      // latency against a k×-growing index — probed clusters grow with
      // k but the scan is partition-pruned and code-compressed
      locally {
        val want = opsFilter.isEmpty ||
          opsFilter.exists(t => s"ivfpq_query x$k".contains(t))
        if (want) {
          val embK = replicateEmb(emb, k).localCheckpoint(true)
          val dir = s"/tmp/graft_probe/ivfpq_x$k"
          graft.llm.Similarity.buildIvfPqIndex(embK, dir, nCentroids = 16)
          time(s"ivfpq_query x$k") {
            val n = graft.llm.Similarity.ivfPqQueryIndex(spark, dir,
              emb.limit(20), embK, k = 5).count()
            embK.unpersist()
            n
          }
        }
      }
      time(s"lsh_h2_topk x$k") {
        // Hamming-2 multiprobe against a k×-growing corpus: the probe
        // list is a closed form of nBits (79 literals at 12 bits), so
        // cost should track the bucket-join scan, not the probe count
        val embK = replicateEmb(emb, k).localCheckpoint(true)
        val n = graft.llm.Similarity.lshTopK(emb.limit(5), embK, k = 5,
          probeBits = 2).count()
        embK.unpersist()
        n
      }
      time(s"bitext_indexed x$k") {
        // the CORPUS-SCALE bitext path: FIXED persisted IVF indexes,
        // k×-growing query sides — per-mine cost must track the query
        // batches (partition-pruned probes), not the indexed corpora
        val embK = replicateEmb(emb, k).localCheckpoint(true)
        val dir = s"/tmp/graft_probe_bitext"
        if (k == ks.min) {
          val src = emb.where(col("vec_id") % 2 === 0)
          val tgt = emb.where(col("vec_id") % 2 === 1)
            .select((col("vec_id") + 10000000L).as("vec_id"),
              col("embedding"))
          graft.llm.Similarity.buildIvfIndex(src, s"$dir/src")
          graft.llm.Similarity.buildIvfIndex(tgt, s"$dir/tgt")
        }
        val qSrc = embK.select((col("vec_id") + 500000000L).as("vec_id"),
          col("embedding"))
        val qTgt = embK.select((col("vec_id") + 600000000L).as("vec_id"),
          col("embedding"))
        val n = graft.llm.Bitext.mineBitextIndexed(spark, s"$dir/src",
          s"$dir/tgt", qSrc, qTgt, k = 4, threshold = 1.05).count()
        embK.unpersist()
        n
      }
      time(s"semantic_order x$k") {
        // ICLM chaining on the k×-growing embedding table: the
        // two-phase group machinery + one bounded O(G²·dim) kernel
        // pass per group — per-row cost constant, must track the scan
        val embK = replicateEmb(emb, k).localCheckpoint(true)
        val n = graft.llm.Packing.semanticChainOrder(
          embK.select(col("vec_id").as("doc_id"), col("embedding")),
          docsPerGroup = 64).count()
        embK.unpersist()
        n
      }
      time(s"diversity_prune x$k") {
        // D4 pruning on the k×-growing embedding table: quantizer
        // assignment + one broadcast-centroid cosine projection + one
        // bounded-key percentile — must track the scan, no pair work
        val embK = replicateEmb(emb, k).localCheckpoint(true)
        val n = graft.llm.Similarity.diversityPrune(embK, 0.8,
          nClusters = 16).count()
        embK.unpersist()
        n
      }
      time(s"recall_audit_truth x$k") {
        // the audit's ground-truth pass: brute-force top-k of a FIXED
        // query set against the k×-growing corpus — one broadcast
        // product + WindowGroupLimit, linear in k by construction
        val embK = replicateEmb(emb, k).localCheckpoint(true)
        val n = graft.llm.Similarity.bruteForceTopK(emb.limit(5), embK,
          k = 5).count()
        embK.unpersist()
        n
      }
      time(s"pq_encode x$k") {
        // PQ corpus compression: codebooks fit on a BOUNDED sample
        // (constant cost), encode is map-only O(m*k*dsub) per row —
        // must track the scan rate
        val embK = replicateEmb(emb, k).localCheckpoint(true)
        val model = graft.llm.Similarity.fitPq(embK)
        val n = graft.llm.Similarity.pqEncode(embK, model).count()
        embK.unpersist()
        n
      }
      time(s"semdedup x$k") {
        // the 100 TB regime: cluster COUNT scales with the corpus (so
        // cluster sizes stay bounded) while the quantizer fits on a
        // constant-size sample — fit cost constant, assignment map-only,
        // within-cluster pairwise linear in k
        val embK = replicateEmb(emb, k).localCheckpoint(true)
        // fitFraction is auto-derived (≈50 sample points per centroid,
        // driver-local two-level fit): 1/k starves the quantizer at
        // large K — ~1 sample per cluster degenerates the partition and
        // the skewed clusters blow up the pairwise term
        val n = graft.llm.Similarity.semDedup(embK, threshold = 0.95,
          nClusters = 16 * k).count()
        embK.unpersist()
        n
      }
      // PAIR-CURATION probes: k×-growing pair table cycling a bounded
      // driver-side PNG set (decode cost per row is what's measured;
      // identical bytes across replicas don't change it) and broadcast
      // embedding joins — both ops must track the scan: the filter is
      // decode + codegen'd gates, the dedup adds one hash shuffle
      if (opsFilter.isEmpty || opsFilter.exists(f =>
          Seq("pair_filter", "pair_dedup", "pair_decontaminate",
            "pair_interleave").exists(_.contains(f)))) {
        val pngs = (0L until 64L).map(i =>
          (i, graft.multimodal.Multimodal.syntheticPng(i, 18, 16)))
        val pngDf = spark.createDataFrame(pngs).toDF("png_id", "payload")
        val pairs = corpus
          .select(col("doc_id").as("pair_id"), col("text").as("caption"),
            pmod(col("doc_id"), lit(64L)).as("png_id"),
            pmod(col("doc_id"), lit(500L)).as("emb_id"))
          .join(broadcast(pngDf), "png_id")
          .join(broadcast(emb.select(col("vec_id").as("emb_id"),
            col("embedding").as("img_emb"))), "emb_id")
          .withColumn("txt_emb", col("img_emb"))
          .drop("png_id", "emb_id")
        time(s"pair_filter x$k") {
          graft.multimodal.Pairs.pairFilter(pairs, minAlign = 0.9).count()
        }
        time(s"pair_dedup x$k") {
          graft.multimodal.Pairs.pairDedup(pairs).count()
        }
        time(s"pair_decontaminate x$k") {
          // FIXED benchmark probe set (broadcast) vs the k×-growing
          // pair table: cost must track the corpus decode, the
          // broadcast join adds nothing that grows with k
          val bench = spark.createDataFrame((200L until 216L).map(i =>
              (i, graft.multimodal.Multimodal.syntheticPng(i % 64, 18, 16))))
            .toDF("asset_id", "payload")
          graft.multimodal.Pairs.decontaminatePairs(pairs, bench,
            maxHamming = 0).count()
        }
        time(s"pair_interleave x$k") {
          // interleave over the k×-growing corpus: one doc_id hash
          // join + two bounded windows — linear in pages
          val chunks = corpus.select(col("doc_id"),
              pmod(col("doc_id"), lit(4L)).as("chunk_idx"),
              pmod(col("doc_id"), lit(500L)).as("emb_id"))
            .join(broadcast(emb.select(col("vec_id").as("emb_id"),
              col("embedding").as("chunk_emb"))), "emb_id").drop("emb_id")
          val imgs = corpus.select(
              (col("doc_id") + 500000000L).as("asset_id"), col("doc_id"),
              pmod(col("doc_id") + 7, lit(500L)).as("emb_id"))
            .join(broadcast(emb.select(col("vec_id").as("emb_id"),
              col("embedding").as("img_emb"))), "emb_id").drop("emb_id")
          graft.multimodal.Pairs.interleaveImages(chunks, imgs).count()
        }
      }
      // LINK-GRAPH probe: replicate events by SHIFTING USER IDS (each
      // replica's walks stay intact, so transitions grow linearly with
      // k) over the FIXED 100-page node set — the web shape, where the
      // event log dwarfs the graph. The transitions window + edge
      // aggregation must track the scan; the 3 PageRank sweeps run
      // over the saturating distinct-edge list (≤ nodes², constant
      // here), so their cost must go FLAT as k grows — evidence the
      // iteration never touches the event log
      if (opsFilter.isEmpty || opsFilter.exists(f =>
          Seq("graph_prior", "graph_edges").exists(_.contains(f)))) {
        val evK = (0 until k).map { i =>
          spark.read.parquet(s"$sfDir/events.parquet")
            .select((col("user_id") + lit(i.toLong * 10000000L))
                .as("user_id"),
              (col("event_id") + lit(i.toLong * 1000000000L))
                .as("event_id"),
              col("ts"), col("props"))
        }.reduce(_ unionByName _).localCheckpoint(true)
        val edgesLazy = graft.llm.LinkGraph.sessionTransitions(evK,
          get_json_object(col("props"), "$.k").cast("long"),
          gapMinutes = 240)
        var edges: DataFrame = null
        time(s"graph_edges x$k") {
          edges = edgesLazy.localCheckpoint(true)
          edges.count()
        }
        // an opsFilter of just graph_prior skips the graph_edges timer
        // (label filter) — materialize untimed so pageRank still runs
        if (edges == null) edges = edgesLazy.localCheckpoint(true)
        time(s"graph_prior x$k") {
          graft.llm.LinkGraph.hostPrior(
            graft.llm.LinkGraph.pageRank(edges, iters = 3),
            concat(lit("src"), (col("node") % 20).cast("string"))).count()
        }
        evK.unpersist()
      }
      // INCREMENTAL RANK REFRESH probe: here the GRAPH grows with k
      // (nodes ∝ k, out-degree 24 — the edges ≫ nodes web shape where
      // the per-sweep edge shuffle is the cost the refresh removes)
      // while the delta is FIXED at 50 edge-weight bumps among the
      // first 100 nodes — the epoch-boundary shape where a day's
      // transitions touch a sliver of the web graph. graph_rank_full
      // re-shuffles every edge per sweep; graph_rank_refresh's
      // per-sweep shuffle is the delta's bounded 3-hop reach, so its
      // residual cost is the node-frame patch I/O, not the edge joins
      if (opsFilter.isEmpty || opsFilter.exists(f =>
          Seq("graph_rank_full", "graph_rank_refresh").exists(_.contains(f)))) {
        val nNodes = 20000L * k
        val synth = spark.range(nNodes * 24).select(
            (col("id") % nNodes).as("src"),
            ((col("id") * 7 + 1) % nNodes).as("dst"),
            ((col("id") % 3) + 1).as("weight"))
          .localCheckpoint(true)
        val tdir = s"/tmp/graft_scaleprobe/rank_trace_x$k"
        val tp = new org.apache.hadoop.fs.Path(tdir)
        tp.getFileSystem(spark.sessionState.newHadoopConf())
          .delete(tp, true)
        time(s"graph_rank_full x$k") {
          graft.llm.LinkGraph.pageRankTrace(synth, iters = 3, tdir).count()
        }
        // an opsFilter of just graph_rank_refresh label-skips the full
        // trace above — materialize it untimed so the refresh has a
        // committed generation to chain from (the graph_edges fix)
        if (opsFilter.nonEmpty &&
            !opsFilter.exists(s"graph_rank_full x$k".contains))
          graft.llm.LinkGraph.pageRankTrace(synth, iters = 3, tdir).count()
        val delta = spark.range(50).select(
          (col("id") % 100L).as("src"),
          ((col("id") * 3 + 1) % 100L).as("dst"),
          lit(1L).as("weight"))
        time(s"graph_rank_refresh x$k") {
          graft.llm.LinkGraph.pageRankRefresh(spark, tdir, delta).count()
        }
        synth.unpersist()
      }
      time(s"bm25_battery x$k") {
        // FIXED 8-query battery against the k×-growing corpus: the
        // postings explode+aggregate (|tokens| rows) and the scoring
        // join must track the scan; the query side is broadcast and
        // constant. Top-k per query is WindowGroupLimit — never a
        // global sort
        val battery = docs.limit(8).select(col("doc_id").as("qid"),
          col("text"))
        graft.llm.Search.bm25JoinTopK(corpus, battery, k = 5).count()
      }
      // TWO-PHASE split of the same battery: the build pays the corpus
      // aggregations once (tracks the scan); the serve pays a
      // term-pruned postings read + one broadcast join — the per-run
      // cost a growing eval suite actually re-pays, which must be a
      // small fraction of the inline battery and scale with the
      // battery's term set, not the corpus aggregation
      if (opsFilter.isEmpty || opsFilter.exists(f =>
          Seq("bm25_build", "bm25_serve").exists(_.contains(f)))) {
        val ixDir = s"/tmp/graft_scaleprobe/bm25_ix"
        val ixp = new org.apache.hadoop.fs.Path(ixDir)
        ixp.getFileSystem(spark.sessionState.newHadoopConf())
          .delete(ixp, true)
        time(s"bm25_build x$k") {
          graft.llm.Search.buildPostings(corpus, ixDir)
          spark.read.parquet(
            s"${graft.llm.Search.servingRoot(spark, ixDir)}/postings")
            .count()
        }
        // serve/append need the index even when the build timer is
        // label-skipped by the opsFilter — build untimed then
        if (opsFilter.nonEmpty &&
            !opsFilter.exists(s"bm25_build x$k".contains))
          graft.llm.Search.buildPostings(corpus, ixDir)
        time(s"bm25_serve x$k") {
          val battery = docs.limit(8).select(col("doc_id").as("qid"),
            col("text"))
          graft.llm.Search.bm25ServeJoinTopK(spark, ixDir, battery,
            k = 5).count()
        }
        // FIXED 200-doc append onto the k×-growing index: postings
        // for just the batch + one df merge + a stats patch — must
        // stay ~flat as the indexed corpus grows (the df merge is the
        // only index-sized term, a vocabulary-bounded partial agg)
        time(s"bm25_append x$k") {
          val fresh = docs.limit(200).select(
            (col("doc_id") + lit(900000000L)).as("doc_id"), col("text"))
          graft.llm.Search.appendPostings(spark, ixDir, fresh)
          graft.llm.Search.servingDf(spark, ixDir).count()
        }
        // compaction folds the event log into one generation: ONE
        // live-postings read + re-shard write, no tokenize — must
        // track the index size and stay well under the build
        time(s"bm25_compact x$k") {
          graft.llm.Search.compactPostings(spark, ixDir).count()
        }
      }
      // HYBRID RETRIEVAL split: a FIXED 4-query two-representation
      // battery against the k×-growing corpus. The inline fusion
      // re-pays the corpus tokenize/aggregate AND a full embedding
      // scan per battery — it must track the scan. The indexed fusion
      // answers from the persisted postings (term-pruned read) and an
      // IVF whose cluster COUNT scales with the corpus (sizes stay
      // bounded — the 100 TB regime), so its per-battery cost must
      // stay ~flat; the builds pay the corpus once (tracked separately)
      if (opsFilter.isEmpty || opsFilter.exists(f =>
          Seq("hybrid_inline", "hybrid_build", "hybrid_indexed")
            .exists(_.contains(f)))) {
        val embK = replicateEmb(emb, k).localCheckpoint(true)
        val bench = docs.limit(4)
          .join(broadcast(emb.select(col("vec_id").as("doc_id"),
            col("embedding"))), "doc_id")
          .select((col("doc_id") + lit(900000000L)).as("qid"),
            col("text"), col("embedding"))
          .localCheckpoint(true)
        time(s"hybrid_inline x$k") {
          graft.llm.Search.hybridRetrieve(corpus, embK, bench,
            k = 5, kPerSignal = 10).count()
        }
        val hdir = s"/tmp/graft_scaleprobe/hybrid_ix"
        val hp = new org.apache.hadoop.fs.Path(hdir)
        hp.getFileSystem(spark.sessionState.newHadoopConf())
          .delete(hp, true)
        time(s"hybrid_build x$k") {
          graft.llm.Search.buildPostings(corpus, s"$hdir/bm25")
          graft.llm.Similarity.buildIvfIndex(embK, s"$hdir/ann",
            nCentroids = 16 * k)
          graft.llm.Search.servingDf(spark, s"$hdir/bm25").count()
        }
        if (opsFilter.nonEmpty &&
            !opsFilter.exists(s"hybrid_build x$k".contains)) {
          graft.llm.Search.buildPostings(corpus, s"$hdir/bm25")
          graft.llm.Similarity.buildIvfIndex(embK, s"$hdir/ann",
            nCentroids = 16 * k)
        }
        time(s"hybrid_indexed x$k") {
          graft.llm.Search.hybridRetrieveIndexed(spark, s"$hdir/bm25",
            s"$hdir/ann", bench, k = 5, kPerSignal = 10,
            nProbe = 4).count()
        }
        // the COMPRESSED semantic side (family ivfpq): coarse probe
        // over residual PQ codes + ADC shortlist + exact re-rank —
        // the layout the 100 TB corpus actually fits in. Cluster
        // count scales with the corpus (bounded cluster sizes), so
        // the per-battery cost must stay ~flat like the IVF form;
        // the build is paid once (untimed here — tracked by
        // hybrid_build's corpus curve)
        if (opsFilter.isEmpty ||
            opsFilter.exists(s"hybrid_indexed_pq x$k".contains)) {
          graft.llm.Similarity.buildIvfPqIndex(embK, s"$hdir/annpq",
            nCentroids = math.min(16 * k, 64))
          time(s"hybrid_indexed_pq x$k") {
            graft.llm.Search.hybridRetrieveIndexed(spark, s"$hdir/bm25",
              s"$hdir/annpq", bench, k = 5, kPerSignal = 10,
              nProbe = 4, family = "ivfpq", rerank = Some(embK),
              shortlist = 50).count()
          }
        }
        embK.unpersist()
      }
      time(s"ablation_ladder x$k") {
        // map-only CASE + one rung-key exchange over a ≤4-row frame:
        // must track the token-count scan exactly
        graft.llm.Mixing.ablationLadderStats(
          graft.llm.Mixing.ablationLadder(corpus, "doc_id",
            Seq(0.01, 0.1, 0.5, 1.0)),
          graft.llm.TextAnalysis.wsTokenCount(col("text"))).count()
      }
      // SERVING probe: per-batch answer cost must track the QUERY
      // batch (k×-growing), not the fixed index it probes
      if (opsFilter.isEmpty || opsFilter.exists("ivf_serve".contains(_))) {
        val sdir = s"/tmp/graft_scaleprobe/serve_ix"
        val sp = new org.apache.hadoop.fs.Path(sdir)
        sp.getFileSystem(spark.sessionState.newHadoopConf()).delete(sp, true)
        graft.llm.Similarity.buildIvfIndex(emb, sdir)
        time(s"ivf_serve_queries x$k") {
          val qk = replicateEmb(emb, k).localCheckpoint(true)
          val n = graft.llm.Similarity.ivfQueryIndex(spark, sdir, qk,
            k = 5, nProbe = 2).count()
          qk.unpersist()
          n
        }
      }
      // TAKEDOWN probes: a FIXED 5-doc opt-out list against the
      // k×-growing corpus. rematerialize is the baseline the
      // incremental refresh must beat — it grows with the corpus;
      // retract is ledger-column anti-joins; refresh rebuilds at most
      // 5 of 512 shard partitions regardless of k (setup — the
      // packSequences seed write — is outside the timers)
      if (opsFilter.isEmpty || opsFilter.exists(f =>
          Seq("retract", "refresh", "rematerialize").exists(_.contains(f)))) {
        val rdir = s"/tmp/graft_scaleprobe/retract_k$k"
        val rp = new org.apache.hadoop.fs.Path(rdir)
        rp.getFileSystem(spark.sessionState.newHadoopConf()).delete(rp, true)
        val rtoks = filter(split(trim(col("text")), "\\s+"), w => w =!= "")
        graft.llm.Packing.packSequences(corpus, "doc_id",
            size(rtoks).cast("long"), budget = 2048)
          .write.mode("overwrite").parquet(s"$rdir/assign")
        time(s"rematerialize x$k") {
          graft.llm.Packing.materializeShardsFromAssignment(spark,
            s"$rdir/assign", corpus, "doc_id", rtoks, s"$rdir/out",
            nShards = 512).count()
        }
        time(s"retract_fixed x$k") {
          graft.streaming.IndexIngest.retractFromCuratedPack(spark, rdir,
            corpus.orderBy(col("doc_id")).limit(5).select(col("doc_id")),
            "doc_id").count()
        }
        time(s"refresh_affected x$k") {
          graft.llm.Packing.refreshRetractedShards(spark, rdir, corpus,
            "doc_id", rtoks, s"$rdir/out", nShards = 512).count()
        }
        time(s"audit_shards x$k") {
          // the pre-training read-only gate: one bounded-state
          // aggregation over the k×-growing shard files — should track
          // the two-column data scan, nothing else
          graft.llm.Packing.auditShards(spark, s"$rdir/out").count()
        }
        time(s"compliance x$k") {
          // the legal gate: broadcast semi-join on the id-only
          // assignment scan + two metadata counts — near-flat in k
          graft.streaming.IndexIngest.retractionCompliance(spark, rdir,
            corpus.orderBy(col("doc_id")).limit(5).select(col("doc_id")),
            "doc_id").count()
        }
      }
    }
    spark.stop()
  }
}
