package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based bitext mining — the published parallel-corpus
  * construction recipe (Artetxe & Schwenk, "Margin-based Parallel
  * Corpus Mining with Multilingual Sentence Embeddings", ACL 2019;
  * the CCMatrix / LASER pipeline shape): score each cross-lingual
  * candidate pair by its cosine RELATIVE to the average cosine of
  * each side's k nearest neighbors (the "ratio" margin), so hub
  * vectors — points that are near everything — don't flood the mined
  * corpus the way a raw cosine threshold lets them.
  *
  * Candidate retrieval here is the exact broadcast scan
  * ([[crossTopK]]); at corpus scale the IVF/PQ index paths
  * ([[Similarity.ivfQueryIndex]] / [[Similarity.pqQueryIndex]])
  * substitute for candidate generation unchanged — they return the
  * same (query_id, neighbor_id, cosine) contract [[marginScore]]
  * consumes, which is exactly how CCMatrix mines at billions of
  * sentences (index-approximate kNN, exact margin re-score). The
  * scoring tail is id-only: two hash aggregations (one per side's
  * kNN mean), one candidate join, two id-partitioned windows — no
  * payload columns, no all-pairs work past retrieval.
  *
  * No counterpart in the reference (PHP WP-ETL has no vector ops);
  * extension surface per the training-data-pipeline mandate.
  */
object Bitext {

  /** Exact cross-corpus top-k: like [[Similarity.bruteForceTopK]] but
    * WITHOUT the self-pair exclusion — source and target are distinct
    * corpora, so `query_id == neighbor_id` is a legitimate pair (id
    * spaces may legitimately collide across languages).
    * `queries` is broadcast (must be driver-small — the audit shape);
    * `corpus` is scanned once. Returns (query_id, rank, neighbor_id,
    * cosine), rank 1 = best, ties broken by neighbor id. */
  def crossTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                qIdCol: String = "vec_id", cIdCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    Similarity.registered(corpus)
    // per-side norms precomputed before the pair scan — see
    // Similarity.bruteForceTopK; bit-identical values (pure CSE)
    val q = queries.select(col(qIdCol).as("query_id"),
      Similarity.asDouble(col(vecCol)).as("__qv"))
      .withColumn("__qn", Similarity.nNorm(col("__qv")))
    val c = corpus.select(col(cIdCol).as("neighbor_id"),
      Similarity.asDouble(col(vecCol)).as("__cv"))
      .withColumn("__cn", Similarity.nNorm(col("__cv")))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine", Similarity.nDot(col("__qv"), col("__cv"))
        / (col("__qn") * col("__cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Rank-ordered-fold mean of each query's kNN cosines — the margin
    * denominator halves. The fold accumulates in RANK order (not
    * partition order), so the sum is a deterministic function of the
    * neighbor list and the DuckDB oracle replays it bit-for-bit with
    * the same sequential `list_reduce` — no rounding tolerance needed
    * anywhere in the margin chain. */
  private def knnMean(knn: DataFrame, idOut: String, avgOut: String): DataFrame =
    knn.groupBy(col("query_id").as(idOut))
      .agg(collect_list(struct(col("rank"), col("cosine"))).as("__cs"))
      .select(col(idOut),
        (aggregate(transform(array_sort(col("__cs")), x => x("cosine")),
          lit(0.0), (acc, v) => acc + v) / size(col("__cs"))).as(avgOut))

  /** The margin-scoring tail, factored so exact and index-approximate
    * retrieval share it. `fwd` = source-side kNN (query_id = src id,
    * neighbor_id = tgt id), `bwd` = target-side kNN (query_id = tgt
    * id, neighbor_id = src id), both in [[crossTopK]]'s
    * (query_id, rank, neighbor_id, cosine) contract.
    *
    * margin(x, y) = cos(x, y) / ((meanK(x) + meanK(y)) / 2)  — the
    * paper's "ratio" margin. Retrieval strategy is the paper's
    * strictest ("intersection"): a pair is mined only when it is BOTH
    * x's best-margin candidate and y's best-margin candidate and the
    * margin clears `threshold` — mutual argmax makes the mined set
    * one-to-one and order-free (no greedy sequencing to replay).
    * Returns (src_id, tgt_id, cosine, margin). */
  def marginScore(fwd: DataFrame, bwd: DataFrame,
                  threshold: Double): DataFrame = {
    val af = knnMean(fwd, "src_id", "__af")
    val ab = knnMean(bwd, "tgt_id", "__ab")
    // forward and backward cosines of the same pair are bit-identical
    // (elementwise products commute; the norm product commutes), so
    // the distinct collapses double-retrieved pairs exactly
    val cand = fwd.select(col("query_id").as("src_id"),
        col("neighbor_id").as("tgt_id"), col("cosine"))
      .unionByName(bwd.select(col("neighbor_id").as("src_id"),
        col("query_id").as("tgt_id"), col("cosine")))
      .distinct()
    val scoredAll = cand.join(af, "src_id").join(ab, "tgt_id")
      .withColumn("margin",
        col("cosine") / ((col("__af") + col("__ab")) / lit(2.0)))
    val ws = Window.partitionBy(col("src_id"))
      .orderBy(col("margin").desc, col("tgt_id").asc)
    val wt = Window.partitionBy(col("tgt_id"))
      .orderBy(col("margin").desc, col("src_id").asc)
    scoredAll
      .withColumn("__rs", row_number().over(ws))
      .withColumn("__rt", row_number().over(wt))
      .where(col("__rs") === 1 && col("__rt") === 1 &&
        col("margin") >= threshold)
      .select(col("src_id"), col("tgt_id"), col("cosine"), col("margin"))
  }

  /** Mine translation pairs from two embedded monolingual corpora with
    * EXACT retrieval: forward kNN of every source vector in the
    * target corpus, backward kNN of every target vector in the source
    * corpus, then [[marginScore]]. Output (src_id, tgt_id, cosine,
    * margin) — the mined bitext, one-to-one.
    *
    * Both [[crossTopK]] calls broadcast the query side — correct
    * while one corpus is driver-small (the recall-audit shape). For
    * two large corpora, generate `fwd`/`bwd` with the persisted index
    * probes instead and call [[marginScore]] directly. */
  def mineBitext(src: DataFrame, tgt: DataFrame, k: Int = 4,
                 threshold: Double = 1.3,
                 srcIdCol: String = "vec_id", tgtIdCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val fwd = crossTopK(src, tgt, k, srcIdCol, tgtIdCol, vecCol)
    val bwd = crossTopK(tgt, src, k, tgtIdCol, srcIdCol, vecCol)
    marginScore(fwd, bwd, threshold)
  }

  /** Mine with INDEX-APPROXIMATE retrieval — the corpus-scale path
    * (CCMatrix's actual recipe: FAISS-style index kNN, exact margin
    * re-score). Each side's kNN comes from the OTHER side's persisted
    * IVF index ([[Similarity.buildIvfIndex]]), so the corpus scans are
    * partition-pruned to the probed clusters and neither corpus is
    * ever broadcast; the scoring tail is [[marginScore]] unchanged.
    *
    * Requires DISJOINT id spaces across the two corpora: the index
    * probe excludes `query_id == neighbor_id` pairs (the
    * within-corpus self-match rule), which would silently drop
    * legitimate cross-lingual pairs under colliding ids. */
  def mineBitextIndexed(spark: org.apache.spark.sql.SparkSession,
                        srcIndexDir: String, tgtIndexDir: String,
                        src: DataFrame, tgt: DataFrame, k: Int = 4,
                        threshold: Double = 1.3, nProbe: Int = 4,
                        srcIdCol: String = "vec_id",
                        tgtIdCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val fwd = Similarity.ivfQueryIndex(spark, tgtIndexDir, src, k, nProbe,
      srcIdCol, vecCol)
    val bwd = Similarity.ivfQueryIndex(spark, srcIndexDir, tgt, k, nProbe,
      tgtIdCol, vecCol)
    marginScore(fwd, bwd, threshold)
  }
}
