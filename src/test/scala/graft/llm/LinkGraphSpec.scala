package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Link-graph priors ([[LinkGraph]]): transition extraction honors the
  * session gap, the rank recurrence hits its known fixed points
  * bit-exactly, ordered-fold and partial-sum modes agree, and the host
  * gate keeps exactly the documents whose host clears the prior. */
class LinkGraphSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("sessionTransitions: gap bound splits sessions; edges aggregate") {
    // user 1: A(0) -> B(5) -> [70min gap] -> C(80) -> C(85)
    // user 2: B(0) -> A(10)
    val events = Seq(
      (1L, 10L, ts(0), "A"), (1L, 11L, ts(5), "B"),
      (1L, 12L, ts(80), "C"), (1L, 13L, ts(85), "C"),
      (2L, 20L, ts(0), "B"), (2L, 21L, ts(10), "A")
    ).toDF("user_id", "event_id", "ts", "page")
    val edges = LinkGraph.sessionTransitions(events, col("page"),
      gapMinutes = 30)
    assert(rowsOf(edges) === Set("[A,B,1]", "[C,C,1]", "[B,A,1]"))
  }

  test("sessionTransitions: same-ts ties break by tieCol") {
    val events = Seq(
      (1L, 1L, ts(0), "A"), (1L, 2L, ts(0), "B"), (1L, 3L, ts(0), "C")
    ).toDF("user_id", "event_id", "ts", "page")
    val edges = LinkGraph.sessionTransitions(events, col("page"))
    assert(rowsOf(edges) === Set("[A,B,1]", "[B,C,1]"))
  }

  test("pageRank: two-node cycle fixed point is exactly 1/2 each") {
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L))
      .toDF("src", "dst", "weight")
    // each sweep maps 0.5 -> (1-d)/2 + d*0.5 = 0.5 EXACTLY in binary64:
    // (1.0 - d) is exact (Sterbenz), and halving is exact scaling
    val ranks = LinkGraph.pageRank(edges, iters = 3).collect()
    assert(ranks.length === 2)
    ranks.foreach(r => assert(r.getDouble(1) === 0.5))
  }

  test("pageRank: source-only node holds the teleport base; sink gains") {
    // c -> a, a <-> b: c has no in-edges so rank(c) = (1-d)/3 after
    // every sweep; a receives c's mass so at the fixed point
    // rank(a) > rank(b) > rank(c) — the a/b split oscillates from the
    // uniform start, so run enough sweeps to settle the ordering
    val edges = Seq(("c", "a", 1L), ("a", "b", 1L), ("b", "a", 1L))
      .toDF("src", "dst", "weight")
    val r = LinkGraph.pageRank(edges, iters = 20).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("c") === (1.0 - 0.85) / 3)
    assert(r("a") > r("b") && r("b") > r("c"))
  }

  test("pageRank: out-weight normalizes — heavier edge carries more") {
    // a splits 3:1 between b and c; b,c return everything to a
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L),
      ("b", "a", 1L), ("c", "a", 1L)).toDF("src", "dst", "weight")
    val r = LinkGraph.pageRank(edges, iters = 6).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("b") > r("c"))
    assert(r("a") > r("b"))
  }

  test("pageRank: orderedFold and partial-sum modes agree to 1e-12") {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val edges = LinkGraph.sessionTransitions(events,
      get_json_object(col("props"), "$.k").cast("long"), gapMinutes = 240)
    val a = LinkGraph.pageRank(edges, iters = 3, orderedFold = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = LinkGraph.pageRank(edges, iters = 3, orderedFold = false)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12,
      s"node $k: $v vs ${b(k)}") }
    // mass sanity: sum of ranks is at most 1 (dangling leak only)
    val total = a.values.sum
    assert(total <= 1.0 + 1e-9 && total > 0.5)
  }

  test("degreeStats: exact counts, absent side coalesces to zero") {
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 2L))
      .toDF("src", "dst", "weight")
    val r = rowsOf(LinkGraph.degreeStats(edges))
    assert(r === Set(
      "[a,2,4,1,2]",  // out: a->b,a->c (w 4); in: b->a (w 2)
      "[b,1,2,1,3]",
      "[c,0,0,1,1]"))
  }

  test("hostPrior + priorGate: gate keeps exactly the clearing hosts") {
    val ranks = Seq((0L, 0.30), (20L, 0.25), (1L, 0.10), (21L, 0.05),
      (2L, 0.30)).toDF("node", "rank")
    val priors = LinkGraph.hostPrior(ranks,
      concat(lit("src"), (col("node") % 20).cast("string")))
    val p = priors.collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(p("src0")._2 === 2L && math.abs(p("src0")._1 - 0.55) < 1e-15)
    assert(p("src2") === ((0.30, 1L)))
    val docs = Seq((1L, "src0"), (2L, "src1"), (3L, "src2"), (4L, "src9"))
      .toDF("doc_id", "source")
    val kept = LinkGraph.priorGate(docs, priors, "source", minPrior = 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // src0 (0.55) and src2 (0.30) clear; src1 (0.15) and absent src9 drop
    assert(kept === Set(1L, 3L))
  }

  test("pageRankRefresh: delta-frontier refresh equals the full recompute, chains generations") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rank_trace").toString
    // a 12-node graph, key-unique like a real transitions edge list
    val e1 = (0L until 24L).map(i =>
        (i % 12L, (i * 5 + 1) % 12L, (i % 3) + 1L))
      .toDF("src", "dst", "weight")
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("weight")).as("weight"))
    val full0 = LinkGraph.pageRankTrace(e1, iters = 3, dir,
      orderedFold = true)
    assert(rowsOf(full0) ==
      rowsOf(LinkGraph.pageRank(e1, iters = 3, orderedFold = true)))
    // delta 1: weight bumps + a NEW edge between existing nodes
    val d1 = Seq((0L, 1L, 2L), (5L, 9L, 4L)).toDF("src", "dst", "weight")
    val m1 = e1.unionByName(d1).groupBy(col("src"), col("dst"))
      .agg(sum(col("weight")).as("weight"))
    val refreshed1 = LinkGraph.pageRankRefresh(spark, dir, d1)
    assert(rowsOf(refreshed1) ==
      rowsOf(LinkGraph.pageRank(m1, iters = 3, orderedFold = true)),
      "refresh must equal the full recompute bit-for-bit")
    // delta 2 chains on the refreshed generation
    val d2 = Seq((3L, 4L, 1L)).toDF("src", "dst", "weight")
    val m2 = m1.unionByName(d2).groupBy(col("src"), col("dst"))
      .agg(sum(col("weight")).as("weight"))
    val refreshed2 = LinkGraph.pageRankRefresh(spark, dir, d2)
    assert(rowsOf(refreshed2) ==
      rowsOf(LinkGraph.pageRank(m2, iters = 3, orderedFold = true)))
    val gens = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("gen-")).sorted
    assert(gens.toSeq == Seq("gen-0000", "gen-0001", "gen-0002"))
    // a delta introducing a NEW node changes N: full fallback, still
    // exact, still a new committed generation
    val d3 = Seq((11L, 99L, 1L)).toDF("src", "dst", "weight")
    val m3 = m2.unionByName(d3).groupBy(col("src"), col("dst"))
      .agg(sum(col("weight")).as("weight"))
    val refreshed3 = LinkGraph.pageRankRefresh(spark, dir, d3)
    assert(rowsOf(refreshed3) ==
      rowsOf(LinkGraph.pageRank(m3, iters = 3, orderedFold = true)))
    assert(refreshed3.count() == 13L)
    // validation: non-positive delta and missing trace reject
    intercept[IllegalArgumentException](LinkGraph.pageRankRefresh(spark,
      dir, Seq((0L, 1L, 0L)).toDF("src", "dst", "weight")))
    intercept[IllegalArgumentException](LinkGraph.pageRankRefresh(spark,
      "/tmp/graft_no_such_trace", d1))
    // vacuum: retired generations delete, the serving one survives,
    // and the next refresh still chains from it
    val removed = LinkGraph.vacuumRankTrace(spark, dir)
    assert(removed.size == 3 &&
      removed.forall(r => !r.endsWith("gen-0003")), removed.toString)
    val gensLeft = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("gen-")).toSeq
    assert(gensLeft == Seq("gen-0003"))
    val d4 = Seq((4L, 5L, 1L)).toDF("src", "dst", "weight")
    val m4 = m3.unionByName(d4).groupBy(col("src"), col("dst"))
      .agg(sum(col("weight")).as("weight"))
    assert(rowsOf(LinkGraph.pageRankRefresh(spark, dir, d4)) ==
      rowsOf(LinkGraph.pageRank(m4, iters = 3, orderedFold = true)))
    assert(LinkGraph.vacuumRankTrace(spark, "/tmp/graft_no_such_trace")
      .isEmpty)
  }

  test("trustRank: trust flows from seeds only; unreachable nodes at 0") {
    // s -> a -> b ; spam ring c <-> d linking densely but unreachable
    // from the seed: TrustRank must leave c,d at exactly 0.0
    val edges = Seq(("s", "a", 1L), ("a", "b", 1L),
      ("c", "d", 5L), ("d", "c", 5L)).toDF("src", "dst", "weight")
    val seeds = Seq("s").toDF("node")
    val r = LinkGraph.trustRank(edges, seeds, iters = 4).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("c") === 0.0 && r("d") === 0.0)
    assert(r("s") === (1.0 - 0.85)) // |S| = 1, no in-links: teleport only
    assert(r("a") > r("b") && r("b") > 0.0)
    // contrast: PageRank rewards the ring's density
    val pr = LinkGraph.pageRank(edges, iters = 4).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(pr("c") > pr("a"), "the ring inflates PageRank")
  }

  test("trustRank: seeds absent from the graph are ignored; none fails") {
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L))
      .toDF("src", "dst", "weight")
    val r = LinkGraph.trustRank(edges,
      Seq("a", "ghost").toDF("node"), iters = 2).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r.keySet === Set("a", "b")) // |S ∩ V| = 1
    assert(r("a") > r("b"))
    intercept[IllegalArgumentException] {
      LinkGraph.trustRank(edges, Seq("ghost").toDF("node"), iters = 2)
        .collect()
    }
  }

  test("trustRank: orderedFold and partial-sum modes agree to 1e-12") {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val edges = LinkGraph.sessionTransitions(events,
      get_json_object(col("props"), "$.k").cast("long"), gapMinutes = 240)
    val seeds = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .where(col("node") < 10).distinct()
    val a = LinkGraph.trustRank(edges, seeds, iters = 3, orderedFold = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = LinkGraph.trustRank(edges, seeds, iters = 3, orderedFold = false)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12) }
    // total trust bounded by 1 (teleport + dangling leak only shrink it)
    assert(a.values.sum <= 1.0 + 1e-9)
  }

  test("trustRankTrace + refresh: seed-base refresh equals the full recompute, chains, falls back") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_trust_trace").toString
    val e1 = (0L until 24L).map(i =>
        (i % 12L, (i * 5 + 1) % 12L, (i % 3) + 1L))
      .toDF("src", "dst", "weight")
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("weight")).as("weight"))
    val seeds = Seq(0L, 1L, 2L).toDF("node")
    val full0 = LinkGraph.trustRankTrace(e1, seeds, iters = 3, dir,
      orderedFold = true)
    assert(rowsOf(full0) ==
      rowsOf(LinkGraph.trustRank(e1, seeds, iters = 3, orderedFold = true)))
    // incremental path: weight bumps among existing nodes
    val d1 = Seq((0L, 1L, 2L), (5L, 9L, 4L)).toDF("src", "dst", "weight")
    val m1 = e1.unionByName(d1).groupBy(col("src"), col("dst"))
      .agg(sum(col("weight")).as("weight"))
    assert(rowsOf(LinkGraph.pageRankRefresh(spark, dir, d1)) ==
      rowsOf(LinkGraph.trustRank(m1, seeds, iters = 3, orderedFold = true)),
      "trust refresh must equal the full seed-base recompute bit-for-bit")
    // chains a second epoch on the refreshed generation
    val d2 = Seq((3L, 4L, 1L)).toDF("src", "dst", "weight")
    val m2 = m1.unionByName(d2).groupBy(col("src"), col("dst"))
      .agg(sum(col("weight")).as("weight"))
    assert(rowsOf(LinkGraph.pageRankRefresh(spark, dir, d2)) ==
      rowsOf(LinkGraph.trustRank(m2, seeds, iters = 3, orderedFold = true)))
    // a NEW node falls back to a full re-trace with the PERSISTED seeds
    val d3 = Seq((11L, 99L, 1L)).toDF("src", "dst", "weight")
    val m3 = m2.unionByName(d3).groupBy(col("src"), col("dst"))
      .agg(sum(col("weight")).as("weight"))
    val refreshed3 = LinkGraph.pageRankRefresh(spark, dir, d3)
    assert(rowsOf(refreshed3) ==
      rowsOf(LinkGraph.trustRank(m3, seeds, iters = 3, orderedFold = true)))
    assert(refreshed3.count() == 13L)
  }

  test("pageRankRefresh: an oversized delta takes the full-retrace fallback, still exact") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rank_gate").toString
    val e1 = (0L until 24L).map(i =>
        (i % 12L, (i * 5 + 1) % 12L, (i % 3) + 1L))
      .toDF("src", "dst", "weight")
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("weight")).as("weight"))
    LinkGraph.pageRankTrace(e1, iters = 3, dir, orderedFold = true)
    // 2 distinct delta keys > limit 1 — must route to the shuffle-merge
    // + full-trace fallback and still equal the full recompute
    val d1 = Seq((0L, 1L, 2L), (5L, 9L, 4L)).toDF("src", "dst", "weight")
    val m1 = e1.unionByName(d1).groupBy(col("src"), col("dst"))
      .agg(sum(col("weight")).as("weight"))
    assert(rowsOf(LinkGraph.pageRankRefresh(spark, dir, d1,
        deltaBroadcastLimit = 1)) ==
      rowsOf(LinkGraph.pageRank(m1, iters = 3, orderedFold = true)))
    // the fallback committed a new generation the next refresh chains on
    val gens = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("gen-")).sorted.toSeq
    assert(gens == Seq("gen-0000", "gen-0001"))
    intercept[IllegalArgumentException](
      LinkGraph.pageRankRefresh(spark, dir, d1, deltaBroadcastLimit = 0))
  }

  test("vacuumRankTrace: young uncommitted generations survive the grace window") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rank_vacuum").toString
    val e1 = Seq((0L, 1L, 1L), (1L, 0L, 1L)).toDF("src", "dst", "weight")
    LinkGraph.pageRankTrace(e1, iters = 2, dir, orderedFold = true)
    LinkGraph.pageRankRefresh(spark, dir,
      Seq((0L, 1L, 1L)).toDF("src", "dst", "weight"))
    // an in-flight refresh: uncommitted, freshly written
    val inflight = new java.io.File(s"$dir/gen-0099/edges")
    inflight.mkdirs()
    val removed = LinkGraph.vacuumRankTrace(spark, dir)
    // the retired committed gen goes; the serving and the young
    // uncommitted straggler stay
    assert(removed.size == 1 && removed.head.endsWith("gen-0000"))
    val left = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("gen-")).sorted.toSeq
    assert(left == Seq("gen-0001", "gen-0099"))
    // past the grace the straggler is reclaimed
    val removed2 = LinkGraph.vacuumRankTrace(spark, dir,
      uncommittedGraceMs = 0L)
    assert(removed2.size == 1 && removed2.head.endsWith("gen-0099"))
  }

  test("pageRank: dangling redistribution conserves mass; default leaks it") {
    // a -> b, b -> c: c is a sink (no out-edges)
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L))
      .toDF("src", "dst", "weight")
    val leaky = LinkGraph.pageRank(edges, iters = 8, orderedFold = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(leaky.values.sum < 1.0 - 1e-3, "sink mass leaks by default")
    val conserved = LinkGraph.pageRank(edges, iters = 8,
        orderedFold = true, redistributeDangling = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(conserved.values.sum - 1.0) < 1e-9,
      s"redistribution keeps the simplex: ${conserved.values.sum}")
    // hand-check one sweep on the 3-node line from the uniform start:
    // dm = rank(c) = 1/3; rank(a) = (1-d)/3 + d*(1/3)/3
    val one = LinkGraph.pageRank(edges, iters = 1, orderedFold = true,
        redistributeDangling = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expA = (1.0 - 0.85) / 3 + 0.85 * ((1.0 / 3) / 3)
    assert(one("a") === expA)
    val expB = (1.0 - 0.85) / 3 + 0.85 * (1.0 / 3 + (1.0 / 3) / 3)
    assert(one("b") === expB)
  }

  test("spamMass: untrusted popularity flags; trusted hosts clear") {
    val priors = Seq(("h1", 0.4, 2L), ("h2", 0.4, 2L), ("h3", 0.2, 1L))
      .toDF("host", "prior", "n_pages")
    // h1 fully trusted, h2 untrusted (a link farm), h3 half-trusted
    val trust = Seq(("h1", 0.5, 2L), ("h3", 0.1, 1L))
      .toDF("host", "prior", "n_pages")
    val r = LinkGraph.spamMass(priors, trust, threshold = 0.5).collect()
      .map(x => x.getString(0) -> ((x.getDouble(3), x.getBoolean(4)))).toMap
    assert(r("h2") === ((1.0, true)))   // no trust row -> mass 1, flagged
    assert(!r("h1")._2)                 // more trust than popularity
    assert(r("h1")._1 < 0.0)
    assert(r("h3")._1 === 0.5 && !r("h3")._2) // exactly at threshold: kept
  }
}
