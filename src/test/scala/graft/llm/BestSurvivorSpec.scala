package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Dedup.nearDupClustersBest]] / [[Similarity.semDedupBest]] —
  * quality-aware survivor selection: max score per cluster, ties to
  * the lowest id, deterministic under any partitioning. */
class BestSurvivorSpec extends SparkSpec {
  import spark.implicits._

  private def pairsOf(ps: (Long, Long)*) = ps.toDF("a", "b")

  test("max-score member survives; transitive clusters; tie -> lowest id") {
    // component {1,2,3} (chain), component {10,11}; scores make 2 the
    // best of the first, 10/11 tie in the second
    val pairs = pairsOf((1L, 2L), (2L, 3L), (10L, 11L))
    val scores = Seq((1L, 0.2), (2L, 0.9), (3L, 0.5),
      (10L, 0.7), (11L, 0.7)).toDF("doc_id", "score")
    val out = Dedup.nearDupClustersBest(pairs, scores)
    assert(rowsOf(out) == Set(
      "[1,1,2,false]", "[2,1,2,true]", "[3,1,2,false]",
      "[10,10,10,true]", "[11,10,10,false]"))
  }

  test("docs missing a score row rank below every scored doc") {
    val pairs = pairsOf((1L, 2L), (5L, 6L))
    val scores = Seq((2L, 0.1), (5L, 0.0), (6L, 0.0))
      .toDF("doc_id", "score") // doc 1 unscored; 5/6 tie at 0.0
    val out = Dedup.nearDupClustersBest(pairs, scores)
    assert(rowsOf(out) == Set(
      "[1,1,2,false]", "[2,1,2,true]",
      "[5,5,5,true]", "[6,5,5,false]"))
  }

  test("deterministic under repartitioning (the MixingSpec contract)") {
    val pairs = pairsOf((1L to 40L).map(i => (i, i + 100L)): _*)
      .union(pairsOf((1L, 101L), (3L, 103L))) // some chained components
    val scores = (1L to 200L).map(i => (i, (i * 37 % 11) / 10.0))
      .toDF("doc_id", "score")
    val a = rowsOf(Dedup.nearDupClustersBest(pairs, scores))
    val b = rowsOf(Dedup.nearDupClustersBest(
      pairs.repartition(13), scores.repartition(7)))
    assert(a == b && a.nonEmpty)
  }

  test("semDedupBest keeps best-scored twin, keep-first twin differs") {
    // two exact-duplicate embedding groups + independent vectors; the
    // higher id has the better score, so semDedup (keep-first) and
    // semDedupBest (keep-best) must disagree exactly there
    val dup = Seq(1.0, 0.0, 0.0, 0.0)
    val dup2 = Seq(0.0, 1.0, 0.0, 0.0)
    val rows = Seq(
      (1L, dup), (2L, dup), // group A
      (10L, dup2), (11L, dup2), (12L, dup2), // group B
      (20L, Seq(0.0, 0.0, 1.0, 0.0)), (21L, Seq(0.0, 0.0, 0.0, 1.0)))
    val df = rows.toDF("vec_id", "embedding")
    val scores = Seq((1L, 0.1), (2L, 0.9), (10L, 0.5), (11L, 0.8),
      (12L, 0.2), (20L, 0.0), (21L, 0.0)).toDF("vec_id", "score")
    val best = Similarity.semDedupBest(df, scores, threshold = 0.99,
        nClusters = 2, maxCluster = 100)
      .select(col("vec_id")).as[Long].collect().toSet
    assert(best == Set(2L, 11L, 20L, 21L)) // best of each group + singletons
    val first = Similarity.semDedup(df, threshold = 0.99, nClusters = 2,
        maxCluster = 100)
      .select(col("vec_id")).as[Long].collect().toSet
    assert(first == Set(1L, 10L, 20L, 21L)) // keep-first for contrast
  }
}
