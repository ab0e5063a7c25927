package graft

import org.apache.spark.sql.execution.FormattedMode

/** Mechanical plan-shape regression gate — turns the per-round manual
  * `graft.Plans` audit into assertions. A CartesianProduct or
  * BroadcastNestedLoopJoin appearing in a gated product plan is a
  * scale regression (row-pair explosion at 100 TB), not a style
  * issue; likewise a parquet scan that stops pushing filters or
  * starts reading pruned columns. Static plans (pre-AQE) are asserted
  * — AQE only narrows exchanges at runtime, it never introduces a
  * cartesian the static plan lacked. */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String = {
    val q = Queries.all.find(_.name == name)
      .getOrElse(fail(s"unknown query: $name"))
    q.fn(spark, sfDir).queryExecution.explainString(FormattedMode)
  }

  /** Product plans that must never pair-explode. Deliberately spans
    * the join/agg/dedup/mix/events/url/decon families; fixture-heavy
    * queries (seeds, stream drains, shard writes at build time) are
    * out of scope — their plan shapes are audited in PLANS.md. */
  private val noPairExplosion = Seq(
    "q1_agg", "q3_topn", "q5_region_join", "s6_posts_reader",
    "s8_users_filter", "dedup_exact", "dedup_minhash",
    "dedup_ngram_jaccard", "mix_strata", "events_asof",
    "url_filter_psl", "decontaminate", "chunk_by_tokens",
    "lang_id", "token_counts", "events_sessionize", "events_funnel",
    "events_retention", "embed_neardup", "pii_scrub", "c4_clean",
    "warc_response_scan", "dedup_urls", "mix_sample", "html_extract",
    "text_stats", "repetition_stats", "nfc_normalize",
    "doc_fingerprint", "vocab_coverage",
    "dedup_soft_weights", "dedup_soft_sample", "mm_pair_filter",
    "mm_pair_dedup",
    "sft_validate", "sft_render", "sft_spans", "sft_dedup",
    "sft_validate_nested", "sft_spans_nested",
    "pref_validate", "pref_dedup", "pref_length_bias", "pref_render",
    "quality_routed",
    "graph_transitions", "graph_degrees", "graph_prior_gate",
    "ablation_ladder", "ablation_ladder_stats",
    "bm25_topk", "bm25_decontaminate", "mix_split_grouped",
    "bm25_gate", "bm25_build_serve", "bm25_serve_gate",
    "bm25_retract_serve",
    "dedup_rate_curve")

  /** BNLJ-allowlisted: k7_upsert crosses a ONE-ROW max-id aggregate
    * into the insert branch (bounded by construction); ann_bruteforce
    * IS the exhaustive baseline the ANN family is measured against;
    * bitext_mine / contrastive_triplets broadcast the query side by
    * design (the audit shape — the persisted index probes substitute
    * at corpus scale and carry no cross join); the mix_phase pair
    * crosses ONE-ROW total/max aggregates through
    * ratesForTargetWeights (the k7_upsert class — one row per domain,
    * bounded by construction). */
  private val bnljAllowed = Seq("k7_upsert", "ann_bruteforce",
    "bitext_mine", "contrastive_triplets", "mine_triplets_kind",
    "mix_phase_rates", "mix_phase_schedule",
    // the hybrid pair carries bruteForceTopK's broadcast query cross
    // (the exhaustive-baseline class); the fused tail itself is
    // battery-bounded joins. The INDEXED twin crosses only the
    // broadcast bounded-centroid frame (the IVF probe shape); the
    // ivfpq twin additionally crosses the broadcast codebook-bounded
    // centroid frame for the residual probe — same bounded class
    "hybrid_retrieve", "hybrid_retrieve_planted",
    "hybrid_retrieve_indexed", "hybrid_retrieve_pq")

  test("gated product plans have no cartesian or nested-loop join") {
    noPairExplosion.foreach { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct"),
        s"$n: CartesianProduct entered the plan")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$n: BroadcastNestedLoopJoin entered the plan")
    }
  }

  test("BNLJ-allowlisted plans still have no CartesianProduct") {
    bnljAllowed.foreach { n =>
      assert(!plan(n).contains("CartesianProduct"),
        s"$n: CartesianProduct entered the plan")
    }
  }

  test("filters reach the parquet scans (pushdown)") {
    // customer-segment and order/ship-date predicates must appear as
    // PushedFilters on the scans, not as post-scan Filter-only nodes
    val q3 = plan("q3_topn")
    assert(q3.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)"),
      "q3_topn: segment filter no longer pushed to the customer scan")
    assert(q3.contains("LessThan(o_orderdate"),
      "q3_topn: order-date filter no longer pushed")
    val s8 = plan("s8_users_filter")
    assert("PushedFilters: \\[[^\\]]".r.findFirstIn(s8).isDefined,
      "s8_users_filter: no non-empty PushedFilters on any scan")
  }

  test("unused columns are pruned from the scans") {
    // q1 aggregates a handful of lineitem columns; a scan that starts
    // reading l_comment (the widest column) lost its pruning
    assert(!plan("q1_agg").contains("l_comment"),
      "q1_agg: lineitem scan reads l_comment")
    assert(!plan("q3_topn").contains("l_comment"),
      "q3_topn: lineitem scan reads l_comment")
  }

  test("host-prior gate joins by broadcast (map-only on the corpus side)") {
    // the gate's contract is zero new exchanges ahead of the funnel: the
    // one-row-per-host prior frame must enter as a BroadcastHashJoin,
    // never a shuffle join on the corpus
    val p = plan("graph_prior_gate")
    assert(p.contains("BroadcastHashJoin"),
      "graph_prior_gate: prior join is not broadcast")
    assert(!p.contains("SortMergeJoin"),
      "graph_prior_gate: corpus-side shuffle join entered the gate plan")
  }

  test("tombstone-served BM25 keeps the pruned scan and a broadcast anti-join") {
    // the takedown must not cost the serve path its scale shape: the
    // postings scan stays term-pruned (isin pushdown) and the
    // tombstone suppression enters as a broadcast LeftAnti, never a
    // shuffle join against the takedown list
    val p = plan("bm25_retract_serve")
    assert(p.contains("isin") || p.contains("PushedFilters"),
      "bm25_retract_serve: postings scan lost its term pruning")
    assert(p.contains("LeftAnti"),
      "bm25_retract_serve: tombstone anti-join missing from the plan")
    assert(p.contains("BroadcastHashJoin"),
      "bm25_retract_serve: no broadcast join in the serve plan")
  }

  test("whole-stage codegen spans the hot aggregation path") {
    // codegen ids only appear on the FINAL adaptive plan — execute,
    // then explain
    Seq("q1_agg", "dedup_exact").foreach { n =>
      val df = Queries.all.find(_.name == n).get.fn(spark, sfDir)
      df.collect()
      assert(df.queryExecution.explainString(FormattedMode)
          .contains("codegen id"),
        s"$n: no WholeStageCodegen span in the executed plan")
    }
  }
}
