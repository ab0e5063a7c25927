package graft.llm

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Generative properties for the rank sweeps over arbitrary small
  * weighted digraphs — invariants the example-based spec's fixed
  * graphs can't cover: rank bounds, mass conservation (≤ 1, leak only
  * through dangling nodes), PageRank against a driver-side reference
  * implementation, TrustRank's zero-on-unreachable guarantee, and
  * orderedFold ≡ partial-sum agreement. */
class LinkGraphPropSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, minTests: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, s"property failed: ${res.status}")
  }

  private val genEdges: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(2, 8) // nodes 0..n-1
    m <- Gen.choose(1, 14)
    es <- Gen.listOfN(m, for {
      s <- Gen.choose(0L, n - 1L)
      t <- Gen.choose(0L, n - 1L)
      w <- Gen.choose(1L, 5L)
    } yield (s, t, w))
  } yield es.groupBy(e => (e._1, e._2))
    .map { case ((s, t), g) => (s, t, g.map(_._3).sum) }.toList

  /** Driver-side reference: the same recurrence, plain doubles. */
  private def refPageRank(edges: List[(Long, Long, Long)], iters: Int,
                          d: Double = 0.85): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outW = edges.groupBy(_._1).map { case (s, g) => s -> g.map(_._3).sum }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val mass = edges.groupBy(_._2).map { case (t, g) =>
        t -> g.sortBy(_._1).map(e => (r(e._1) / outW(e._1)) * e._3).sum
      }
      r = nodes.map(v => v -> ((1.0 - d) / n + d * mass.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("pageRank agrees with the driver-side reference; bounds hold") {
    check(Prop.forAll(genEdges) { es =>
      val df = es.toDF("src", "dst", "weight")
      val got = LinkGraph.pageRank(df, iters = 3, orderedFold = true)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val ref = refPageRank(es, 3)
      val n = ref.size
      got.keySet == ref.keySet &&
        got.forall { case (k, v) => math.abs(v - ref(k)) < 1e-12 } &&
        got.values.sum <= 1.0 + 1e-9 && // mass leaks only via dangling
        got.values.forall(v => v >= (1.0 - 0.85) / n - 1e-12) // teleport floor
    }, minTests = 12)
  }

  test("orderedFold and partial-sum ranks agree to 1e-12 on random graphs") {
    check(Prop.forAll(genEdges) { es =>
      val df = es.toDF("src", "dst", "weight").repartition(4)
      val a = LinkGraph.pageRank(df, iters = 2, orderedFold = true)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val b = LinkGraph.pageRank(df, iters = 2, orderedFold = false)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      a.keySet == b.keySet &&
        a.forall { case (k, v) => math.abs(v - b(k)) < 1e-12 }
    }, minTests = 8)
  }

  test("hostPrior: fold and partial-sum priors agree to 1e-12; " +
      "default plan has no per-host list") {
    check(Prop.forAll(genEdges) { es =>
      val df = es.toDF("src", "dst", "weight").repartition(4)
      val ranks = LinkGraph.pageRank(df, iters = 2, orderedFold = true)
      val hostOf = concat(lit("h"), (col("node") % 3).cast("string"))
      val a = LinkGraph.hostPrior(ranks, hostOf, orderedFold = true)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val b = LinkGraph.hostPrior(ranks, hostOf)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      a.keySet == b.keySet &&
        a.forall { case (k, v) => math.abs(v - b(k)) < 1e-12 }
    }, minTests = 8)
    // the production default never materializes a member-page array
    val ranks = Seq((1L, 0.5), (2L, 0.25)).toDF("node", "rank")
    val plan = LinkGraph.hostPrior(ranks,
        concat(lit("h"), (col("node") % 2).cast("string")))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("collect_list"), s"default hostPrior folds:\n$plan")
  }

  test("pageRankRefresh ≡ full recompute on random graphs and random deltas") {
    val genCase = for {
      es <- genEdges
      nodes = (es.map(_._1) ++ es.map(_._2)).distinct
      m <- Gen.choose(1, 4)
      ds <- Gen.listOfN(m, for {
        s <- Gen.oneOf(nodes)
        t <- Gen.oneOf(nodes) // existing endpoints: the incremental path
        w <- Gen.choose(1L, 3L)
      } yield (s, t, w))
    } yield (es, ds)
    check(Prop.forAll(genCase) { case (es, ds) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft_rank_prop").toString
      val e = es.toDF("src", "dst", "weight")
        .groupBy(col("src"), col("dst"))
        .agg(sum(col("weight")).as("weight"))
      LinkGraph.pageRankTrace(e, iters = 3, dir, orderedFold = true)
      val delta = ds.toDF("src", "dst", "weight")
      val merged = e.unionByName(delta).groupBy(col("src"), col("dst"))
        .agg(sum(col("weight")).as("weight"))
      val refreshed = LinkGraph.pageRankRefresh(spark, dir, delta)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val full = LinkGraph.pageRank(merged, iters = 3, orderedFold = true)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      refreshed == full // BIT equality, not tolerance
    }, minTests = 8)
  }

  test("trustRank: nodes unreachable from the seed set hold exactly 0") {
    check(Prop.forAll(genEdges) { es =>
      val df = es.toDF("src", "dst", "weight")
      val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
      val seed = nodes.min
      // driver-side reachability from the seed
      val adj = es.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).toSet }
      var reach = Set(seed); var grew = true
      while (grew) {
        val next = reach ++ reach.flatMap(v => adj.getOrElse(v, Set.empty))
        grew = next.size > reach.size; reach = next
      }
      val got = LinkGraph.trustRank(df, Seq(seed).toDF("node"), iters = 3)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      nodes.forall { v =>
        if (reach(v)) got(v) >= 0.0 else got(v) == 0.0
      } && got(seed) > 0.0
    }, minTests = 10)
  }
}
