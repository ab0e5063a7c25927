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

  test("no survivor pair with true Jaccard inside the banding gap [0.75, 0.79)") {
    val entering = Queries.shardsChainThrough(spark, sfDir, "dedup_exact")
      .select(col("doc_id"), col("main_text"))
    val inGap = graft.llm.Dedup.ngramJaccardPairs(entering, "doc_id",
        "main_text", blockCols = Seq(lit(1)), n = 5, threshold = 0.75)
      .where(col("jaccard") < 0.79)
      .collect()
    assert(inGap.isEmpty,
      "survivor pair(s) with true 5-gram Jaccard inside [0.75, 0.79) — " +
        "the banded MinHash stage may miss these while the exact " +
        "all-pairs oracle finds them, so the curate_to_shards oracles " +
        "can fail WITHOUT a code bug. Re-seat the fixture or the " +
        "threshold. Pairs: " +
        inGap.map(r => s"(${r.get(0)}, ${r.get(1)}, j=${r.get(2)})")
          .mkString("; "))
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
