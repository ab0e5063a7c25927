package graft

import org.apache.spark.sql.functions._

/** CANARY for the `curate_to_shards_*` near-dedup oracle equivalence
  * (round-11 ADVICE): the banded MinHash stage equals the exact
  * all-pairs DuckDB replay only while the corpus keeps its measured
  * Jaccard gap — every organic survivor pair is either ≥ 0.79 (where
  * the seeded 16-band/4-row scheme's miss probability is < 3e-4 and
  * the concrete outcome is oracle-verified) or well below the 0.75
  * threshold. A fixture/SF change that plants an organic pair INSIDE
  * [0.75, 0.79) could be missed by banding while the exact oracle
  * finds it — failing the funnel checksum with no code bug. This spec
  * makes that violation fail HERE, with a message naming the pair,
  * instead of as an opaque hash mismatch.
  *
  * Ground truth is exact all-pairs 5-gram Jaccard
  * ([[graft.llm.Dedup.ngramJaccardPairs]] with one constant block —
  * the same xxhash64-hashed-shingle arithmetic the MinHash stage
  * verifies candidates with), over the exact frame entering the
  * near-dedup stage (replayed THROUGH the config registry via
  * [[Queries.shardsChainThrough]]).
  */
class ShardsChainGapSpec extends SparkSpec {

  test("banded detection COVERS the exact ≥-threshold pair set (the oracle-equality invariant)") {
    // Round-13 correction to this canary: the original form asserted
    // the gap [0.75, 0.79) is EMPTY — but emptiness is not what
    // equality needs, and it is false at sf0.1 (organic pair
    // (2862, 3329) at j = 0.7733, which banding DETECTS, so the funnel
    // oracles stayed green). The load-bearing invariant is inclusion:
    // every pair the exact all-pairs oracle finds at ≥ threshold must
    // be DETECTED by the banded stage — a missed one fails the funnel
    // checksum with no code bug. Assert exactly that, with the missed
    // pairs named.
    val entering = Queries.shardsChainThrough(spark, sfDir, "dedup_exact")
      .select(col("doc_id"), col("main_text"))
      .localCheckpoint()
    val exact = graft.llm.Dedup.ngramJaccardPairs(entering, "doc_id",
        "main_text", blockCols = Seq(lit(1)), n = 5, threshold = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val detected = graft.llm.Dedup.minhashNearDups(entering, "doc_id",
        "main_text", threshold = 0.75)
      .select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = exact.filterNot(p => detected((p._1, p._2)))
    assert(missed.isEmpty,
      "exact ≥0.75 pair(s) the banded MinHash stage MISSED — the " +
        "curate_to_shards oracles will fail WITHOUT a code bug " +
        "(re-seat the banding params or the fixture): " +
        missed.map(p => s"(${p._1}, ${p._2}, j=${p._3})").mkString("; "))
    assert(exact.nonEmpty,
      "no exact ≥0.75 pairs at all — the invariant binds nothing " +
        "(planted anchors gone?)")
  }

  test("planted near-dup pairs sit at Jaccard 1.0 (detection-guaranteed anchors)") {
    val entering = Queries.shardsChainThrough(spark, sfDir, "dedup_exact")
      .select(col("doc_id"), col("main_text"))
    // planted ids live in the dedicated 1M+ plantedsrc range (see
    // warcResponseFixture): period-1 repeated-word texts share their
    // entire distinct 5-gram set, so each pair's Jaccard is exactly 1.0
    val planted = graft.llm.Dedup.ngramJaccardPairs(
        entering.where(col("doc_id") >= 1000000L), "doc_id", "main_text",
        blockCols = Seq(lit(1)), n = 5, threshold = 0.95)
    assert(planted.count() > 0,
      "no planted pair at Jaccard ~1.0 — the fixture's detection anchors " +
        "are gone; the near-dedup stage is no longer guaranteed to bind")
  }
}
