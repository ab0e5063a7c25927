package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Link-graph quality priors — the crawl-side signal family every
  * large-scale web-curation pipeline keeps next to its content
  * filters: build a weighted page graph from user navigation (or
  * hyperlinks), run a fixed number of damped PageRank sweeps over it,
  * aggregate page scores to a host-level prior, and gate documents on
  * that prior ahead of the content funnel (the "seed quality" /
  * host-reputation stage of Common-Crawl-derived corpora — cf. Brin &
  * Page 1998 for the rank recurrence; curation pipelines consume a
  * TRUNCATED fixed-iteration sweep because the prior only needs a
  * stable ordering, not the stationary distribution).
  *
  * Physical shapes, sized for the 100 TB case:
  *  - [[sessionTransitions]] is one window over (user ORDER BY ts) —
  *    a single hash exchange on the user key, frames bounded by
  *    events-per-user — followed by one edge aggregation. The edge
  *    list it emits is the ONLY corpus-sized frame the rest of the
  *    family touches.
  *  - [[pageRank]] iterates join(edges, ranks on src) →
  *    groupBy(dst): per sweep, one hash join against a one-row-per-
  *    node rank frame and one partially-aggregated exchange on dst.
  *    Iterations are FIXED (published priors use 3–10 sweeps), and
  *    each sweep's rank frame is `localCheckpoint`-pinned so lineage
  *    stays flat and AQE re-plans per sweep. Edges are checkpointed
  *    once and reused by every sweep — the corpus-sized scan happens
  *    once, not per iteration.
  *  - No dangling-mass redistribution: sinks leak their damped mass
  *    (the Brin–Page simplification most engine implementations ship,
  *    e.g. GraphX's `staticPageRank`). The prior needs ordering
  *    stability, not a probability simplex; documented so the oracle
  *    replays the same recurrence.
  *  - [[hostPrior]] folds the one-row-per-page rank frame onto the
  *    host key — bounded by pages-per-host; [[priorGate]] is a
  *    broadcast join (the prior frame is one row per HOST) plus a
  *    map-only predicate, so the gate adds zero exchanges to the
  *    document funnel.
  *
  * Determinism: `orderedFold = true` accumulates each node's in-mass
  * in src-rank order (sorted collect + left fold), making every sweep
  * bit-exact under any partitioning — the oracle-replay mode, safe
  * while in-degree is bounded (collected list is one entry per
  * in-neighbor). At web scale hub pages have unbounded in-degree, so
  * production runs keep the default partially-aggregated `sum`
  * (order-nondeterministic in the last ulps, never materializes a
  * per-node list).
  *
  * No counterpart in the reference (PHP WP-ETL has no graph ops);
  * extension surface per the training-data-pipeline mandate.
  */
object LinkGraph {

  /** Weighted transition edges from an event stream: consecutive
    * events of the same user (ordered by `tsCol`, ties by `tieCol`)
    * whose gap is ≤ `gapMinutes` emit one (prev page → page) edge;
    * edges are aggregated to (src, dst, weight = transition count).
    * Self-loops (page refresh / same-page actions) are kept — they are
    * real transitions and the rank recurrence handles them. One
    * window exchange on the user key + one edge aggregation. */
  def sessionTransitions(events: DataFrame, pageKey: Column,
                         userCol: String = "user_id",
                         tsCol: String = "ts",
                         tieCol: String = "event_id",
                         gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    events
      // project to exactly the four window inputs BEFORE the exchange:
      // the page expression (often a JSON parse) evaluates once
      // map-side, and the window shuffles 4 narrow columns instead of
      // the full event row (measured 21.7 s → ~4 s at a 1M-row probe)
      .select(col(userCol), col(tsCol), col(tieCol), pageKey.as("__page"))
      .withColumn("__prev_page", lag(col("__page"), 1).over(byUser))
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(byUser))
      .where(col("__prev_page").isNotNull &&
        unix_micros(col(tsCol).cast("timestamp")) -
          unix_micros(col("__prev_ts").cast("timestamp")) <=
          gapMinutes.toLong * 60L * 1000000L)
      .groupBy(col("__prev_page").as("src"), col("__page").as("dst"))
      .agg(count(lit(1)).as("weight"))
  }

  /** Per-node degree/weight stats over a (src, dst, weight) edge list
    * — the hub/spam-detection datacard row (a page with huge in-weight
    * and no out-edges is a rank sink; the reverse is a link farm).
    * Two partial aggregations + one outer join on the node key; counts
    * are exact longs. */
  def degreeStats(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_edges"), sum(col("weight")).as("out_weight"))
    val in = edges.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_edges"), sum(col("weight")).as("in_weight"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_edges"), lit(0L)).as("out_edges"),
        coalesce(col("out_weight"), lit(0L)).as("out_weight"),
        coalesce(col("in_edges"), lit(0L)).as("in_edges"),
        coalesce(col("in_weight"), lit(0L)).as("in_weight"))
  }

  /** Sorted-by-key left fold of doubles — bit-exact accumulation under
    * any partitioning (the Bitext kNN-mean trick). Bounded by the
    * group's fan-in: use only where that is bounded by construction. */
  private def orderedFoldSum(key: Column, value: Column): Column =
    aggregate(
      transform(array_sort(collect_list(struct(key.as("k"), value.as("v")))),
        x => x("v")),
      lit(0.0), (acc, v) => acc + v)

  /** Shared sweep loop: `rank(v) = base(v) + d · Σ in-mass(v)` for
    * `iters` sweeps over a checkpointed edge list. `withBase` carries
    * (node, __base, rank) — uniform base = PageRank, seed-only base =
    * TrustRank; the teleport VECTOR is the only thing the two differ
    * by (Gyöngyi et al. 2004 §3). With `redistributeDangling` the
    * damped mass a sink node (no out-edges) would otherwise leak is
    * folded back uniformly: per sweep one SCALAR aggregate over the
    * (static) dangling node set — the rank sum, ordered-folded in the
    * oracle-replay mode — divides by `nTotal` and joins every node's
    * new rank as a literal. Bounded driver traffic: one double per
    * sweep. */
  private def rankSweeps(e: DataFrame, withBase: DataFrame, iters: Int,
                         damping: Double, orderedFold: Boolean,
                         onSweep: (Int, DataFrame) => Unit =
                           (_, _) => (),
                         redistributeDangling: Boolean = false,
                         nTotal: Long = 0L): DataFrame = {
    val outW = e.groupBy(col("src"))
      .agg(sum(col("__w")).as("__ow")).localCheckpoint()
    // the dangling set is a property of the edge list — compute once
    val dangling =
      if (redistributeDangling)
        withBase.select(col("node"))
          .join(outW.select(col("src").as("node")), Seq("node"), "left_anti")
          .localCheckpoint()
      else null
    // edges ⋈ out-weights is loop-INVARIANT — hoisted out of the sweep
    // loop and checkpointed hash-partitioned on the join key, so each
    // sweep pays ONE exchange of the (small) rank frame instead of
    // re-shuffling the edge list every iteration (guide §2.4: two
    // operations keyed the same way share one exchange; localCheckpoint
    // preserves the partitioning in the logical plan). Per-sweep
    // arithmetic is unchanged — (rank / __ow) · __w with the original
    // column values — so orderedFold results stay bit-identical.
    val eOw = e.join(outW, "src")
      .repartition(col("src"))
      .localCheckpoint()
    var ranks = withBase
    onSweep(0, ranks.select(col("node"), col("rank")))
    for (t <- 1 to iters) {
      val contribs = eOw
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .select(col("dst"), col("src"),
          ((col("rank") / col("__ow")) * col("__w")).as("__contrib"))
      val mass =
        if (orderedFold)
          contribs.groupBy(col("dst"))
            .agg(orderedFoldSum(col("src"), col("__contrib")).as("__mass"))
        else
          contribs.groupBy(col("dst"))
            .agg(sum(col("__contrib")).as("__mass"))
      val newRank =
        if (redistributeDangling) {
          val dRanks = ranks.join(dangling, Seq("node"), "left_semi")
          val dmRow =
            (if (orderedFold)
               dRanks.agg(orderedFoldSum(col("node"), col("rank")).as("s"))
             else dRanks.agg(sum(col("rank")).as("s"))).head()
          val dm = if (dmRow.isNullAt(0)) 0.0 else dmRow.getDouble(0)
          col("__base") + lit(damping) *
            (coalesce(col("__mass"), lit(0.0)) + lit(dm / nTotal))
        } else
          col("__base") + lit(damping) * coalesce(col("__mass"), lit(0.0))
      ranks = withBase
        .join(mass.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"), col("__base"), newRank.as("rank"))
        .localCheckpoint() // pin the sweep: flat lineage, AQE re-plan
      onSweep(t, ranks.select(col("node"), col("rank")))
    }
    ranks.select(col("node"), col("rank"))
  }

  private def checkpointedEdges(edges: DataFrame): DataFrame =
    // edges are re-joined every sweep — checkpoint ONCE so the source
    // scan (the only corpus-sized read) doesn't replay per iteration
    edges.select(col("src"), col("dst"),
      col("weight").cast("long").as("__w")).localCheckpoint()

  private def nodesOf(e: DataFrame): DataFrame =
    e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()

  /** `iters` sweeps of the damped rank recurrence
    * `rank(v) = (1-d)/N + d * Σ_{(u,v) ∈ E} rank(u) · w(u,v) / W(u)`
    * over a weighted (src, dst, weight) edge list; `W(u)` is u's total
    * out-weight (exact long sum). Returns one (node, rank) row per
    * node (nodes = src ∪ dst); nodes with no in-edges hold the
    * teleport base. Dangling mass is NOT redistributed by default (see
    * object doc — the ordering-stability simplification); pass
    * `redistributeDangling = true` for the probability-simplex form:
    * each sweep folds the sink nodes' damped mass back uniformly
    * (`rank(v) = (1-d)/N + d·(in-mass(v) + Σ_sinks rank(s)/N)`) at the
    * cost of one scalar aggregate per sweep — sink-heavy graphs (paper
    * dumps, leaf-page crawls) keep a comparable total mass either way
    * the prior consumer normalizes. `orderedFold = true` is the
    * oracle-exact accumulation mode — see object doc for the in-degree
    * caveat. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
               orderedFold: Boolean = false,
               redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"pageRank: damping must be in (0,1), got $damping")
    val e = checkpointedEdges(edges)
    val nodes = nodesOf(e)
    val n = nodes.count() // bounded driver scalar: one row per node
    require(n > 0, "pageRank: empty edge list")
    val withBase = nodes.select(col("node"),
      lit((1.0 - damping) / n).as("__base"), lit(1.0 / n).as("rank"))
    rankSweeps(e, withBase, iters, damping, orderedFold,
      redistributeDangling = redistributeDangling, nTotal = n)
  }

  /** TrustRank (Gyöngyi, Garcia-Molina & Pedersen, "Combating Web
    * Spam with TrustRank", VLDB 2004): the same damped recurrence with
    * the teleport vector CONCENTRATED on a vetted seed set — trust
    * flows out from seeds along links and decays with distance, so
    * hosts unreachable from any seed end at (near-)zero no matter how
    * densely they link each other. The spam-demotion prior crawl
    * pipelines keep next to raw popularity: a link farm inflates
    * PageRank but not TrustRank. `seeds` is one `node` column
    * (broadcast — seed lists are vetted and small by construction);
    * seeds absent from the graph are ignored. Init and teleport are
    * the published §4.3 form: 1/|S| on seeds, 0 elsewhere. Same
    * physical shapes and `orderedFold` contract as [[pageRank]]. */
  def trustRank(edges: DataFrame, seeds: DataFrame, iters: Int,
                damping: Double = 0.85,
                orderedFold: Boolean = false): DataFrame = {
    require(iters >= 1, s"trustRank: iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"trustRank: damping must be in (0,1), got $damping")
    val e = checkpointedEdges(edges)
    val nodes = nodesOf(e)
    val flagged = nodes
      .join(broadcast(seeds.select(col("node")).distinct()
        .withColumn("__seed", lit(1))), Seq("node"), "left")
      .select(col("node"), coalesce(col("__seed"), lit(0)).as("__seed"))
      .localCheckpoint()
    val nSeeds = flagged.where(col("__seed") === 1).count()
    require(nSeeds > 0, "trustRank: no seed is present in the graph")
    val withBase = flagged.select(col("node"),
      when(col("__seed") === 1, lit((1.0 - damping) / nSeeds))
        .otherwise(lit(0.0)).as("__base"),
      when(col("__seed") === 1, lit(1.0 / nSeeds))
        .otherwise(lit(0.0)).as("rank"))
    rankSweeps(e, withBase, iters, damping, orderedFold)
  }

  /** Host-level prior from page ranks: `hostOf` maps the `node` column
    * to a host key; the prior is the sum of member-page ranks. The
    * default is the partially-aggregated `sum` — map-side combine,
    * never a per-host list, safe for hosts with 10⁷ member pages.
    * `orderedFold = true` accumulates in page order instead (bit-exact
    * under any partitioning — the oracle-replay mode, same contract as
    * [[pageRank]]; it materializes one array entry per member page, so
    * use only where pages-per-host is bounded). One exchange on the
    * host key; the result is one row per host. */
  def hostPrior(ranks: DataFrame, hostOf: Column,
                orderedFold: Boolean = false): DataFrame =
    ranks.withColumn("host", hostOf)
      .groupBy(col("host"))
      .agg((if (orderedFold) orderedFoldSum(col("node"), col("rank"))
            else sum(col("rank"))).as("prior"),
        count(lit(1)).as("n_pages"))

  /** Relative spam mass (Gyöngyi, Garcia-Molina & Pedersen, "Link Spam
    * Detection Based on Mass Estimation", VLDB 2006, simplified to the
    * two priors this family already computes): the fraction of a
    * host's popularity NOT backed by trust,
    * `spam_mass = (prior - trust) / prior` — near 1 for hosts whose
    * PageRank comes from link structure no trusted seed can reach,
    * near 0 (or negative) for hosts the seeds vouch for more than raw
    * popularity does. `priors` and `trust` are [[hostPrior]] frames
    * over [[pageRank]] and [[trustRank]] respectively; both are one
    * row per host, so this is bounded-frame arithmetic — zero
    * corpus-sized work. Hosts above `threshold` are flagged (the
    * demotion list a crawl frontier consumes). */
  def spamMass(priors: DataFrame, trust: DataFrame,
               threshold: Double = 0.5): DataFrame =
    priors.select(col("host"), col("prior"))
      .join(trust.select(col("host"), col("prior").as("__t")),
        Seq("host"), "left")
      .select(col("host"), col("prior"),
        coalesce(col("__t"), lit(0.0)).as("trust"))
      .withColumn("spam_mass",
        (col("prior") - col("trust")) / col("prior"))
      .withColumn("flagged", col("spam_mass") > threshold)

  // ---- incremental rank refresh: per-sweep trace + delta frontier ----

  private val TraceCommit = "_graft_trace_committed"

  private def traceFs(spark: org.apache.spark.sql.SparkSession,
                      dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Latest COMMITTED generation under `dir`, by PARSED generation
    * number — past the %04d padding `gen-10000` must outrank
    * `gen-9999` (a lexical sort would silently chain refreshes off a
    * stale generation); non-numeric names are ignored, matching
    * [[nextTraceGen]]'s numeric parse. */
  private def latestTraceGen(spark: org.apache.spark.sql.SparkSession,
                             dir: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = traceFs(spark, dir)
    if (!fs.exists(p)) return None
    val gens = fs.listStatus(p)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen-")
        && st.getPath.getName.stripPrefix("gen-").forall(_.isDigit)
        && st.getPath.getName.stripPrefix("gen-").nonEmpty
        && fs.exists(new org.apache.hadoop.fs.Path(st.getPath, TraceCommit)))
    if (gens.isEmpty) None
    else Some(gens.maxBy(
      _.getPath.getName.stripPrefix("gen-").toInt).getPath.toString)
  }

  /** Overlapped trace-artifact writes (optimization guide §2.6): a
    * traced run's persisted artifacts (edges/outw/base/meta and each
    * sweep's rank frame) are consumed only by LATER maintenance runs,
    * never by the in-flight computation — every frame handed here is
    * already localCheckpoint'd, so writing it on a side thread
    * overlaps the (driver-gap-dominated) sweep loop instead of
    * serializing behind it. Crash-safety is preserved: [[await]]
    * rethrows the first failure and MUST be called before the commit
    * marker, so a failed write leaves an uncommitted (invisible)
    * generation exactly as the sequential form did. */
  private class AsyncWrites(threads: Int = 2) {
    private val pool =
      java.util.concurrent.Executors.newFixedThreadPool(threads)
    private val futs = collection.mutable.ArrayBuffer
      .empty[java.util.concurrent.Future[_]]
    def submit(f: => Unit): Unit =
      futs += pool.submit(new Runnable { def run(): Unit = f })
    def await(): Unit =
      try futs.foreach { fu =>
        try fu.get()
        catch { case e: java.util.concurrent.ExecutionException =>
          throw e.getCause }
      } finally pool.shutdown()
  }

  private def nextTraceGen(spark: org.apache.spark.sql.SparkSession,
                           dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = traceFs(spark, dir)
    val next = if (!fs.exists(p)) 0
      else fs.listStatus(p).map(_.getPath.getName)
        .filter(n => n.startsWith("gen-")
          && n.stripPrefix("gen-").nonEmpty
          && n.stripPrefix("gen-").forall(_.isDigit))
        .map(_.stripPrefix("gen-").toInt).foldLeft(-1)(math.max) + 1
    f"$dir/gen-$next%04d"
  }

  /** Shared trace writer behind [[pageRankTrace]] / [[trustRankTrace]]:
    * both recurrences differ ONLY in the teleport vector (Gyöngyi et
    * al. 2004 §3), so the trace persists the base frame itself —
    * `gen/base` (node, __base) — plus the seed set for TrustRank, and
    * [[pageRankRefresh]] refreshes either one from the same epoch
    * delta without knowing which recurrence it is replaying. */
  private def runTrace(edges: DataFrame, iters: Int, traceDir: String,
                       damping: Double, orderedFold: Boolean,
                       mode: String, seeds: Option[DataFrame])
      : DataFrame = {
    require(iters >= 1, s"${mode}Trace: iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"${mode}Trace: damping must be in (0,1), got $damping")
    val spark = edges.sparkSession
    // normalize to ONE row per (src, dst): the refresh's broadcast
    // merge patches by key, so duplicate keys would each absorb the
    // delta (sessionTransitions output is already key-unique — this
    // is a no-op pass there)
    val e = checkpointedEdges(edges
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("weight")).as("weight")))
    val nodes = nodesOf(e)
    val n = nodes.count()
    require(n > 0, s"${mode}Trace: empty edge list")
    val seedFrame = seeds.map(_.select(col("node")).distinct()
      .localCheckpoint())
    val withBase = (mode match {
      case "trustrank" =>
        val flagged = nodes
          .join(broadcast(seedFrame.get.withColumn("__seed", lit(1))),
            Seq("node"), "left")
          .select(col("node"),
            coalesce(col("__seed"), lit(0)).as("__seed"))
          .localCheckpoint()
        val nSeeds = flagged.where(col("__seed") === 1).count()
        require(nSeeds > 0, "trustRankTrace: no seed is present in the graph")
        flagged.select(col("node"),
          when(col("__seed") === 1, lit((1.0 - damping) / nSeeds))
            .otherwise(lit(0.0)).as("__base"),
          when(col("__seed") === 1, lit(1.0 / nSeeds))
            .otherwise(lit(0.0)).as("rank"))
      case _ =>
        nodes.select(col("node"),
          lit((1.0 - damping) / n).as("__base"), lit(1.0 / n).as("rank"))
    }).localCheckpoint()
    val gen = nextTraceGen(spark, traceDir)
    // every artifact below derives from checkpointed frames and is
    // read only by later maintenance runs — write them on the side
    // pool so the sweep loop never waits on a parquet commit; the
    // await-before-marker keeps the crash contract (see AsyncWrites)
    val w = new AsyncWrites()
    w.submit(e.select(col("src"), col("dst"), col("__w").as("weight"))
      .write.mode("overwrite").parquet(s"$gen/edges"))
    w.submit(e.groupBy(col("src")).agg(sum(col("__w")).as("__ow"))
      .write.mode("overwrite").parquet(s"$gen/outw"))
    w.submit(withBase.select(col("node"), col("__base"))
      .write.mode("overwrite").parquet(s"$gen/base"))
    seedFrame.foreach(sf =>
      w.submit(sf.write.mode("overwrite").parquet(s"$gen/seeds")))
    w.submit(spark.range(1).select(lit(iters).as("iters"),
        lit(damping).as("damping"), lit(n).as("n"),
        lit(orderedFold).as("ordered_fold"), lit(mode).as("mode"))
      .coalesce(1).write.mode("overwrite").parquet(s"$gen/meta"))
    val out = rankSweeps(e, withBase, iters, damping, orderedFold,
      (t, r) =>
        w.submit(r.write.mode("overwrite").parquet(f"$gen/sweep-$t%04d")))
    w.await()
    val m = new org.apache.hadoop.fs.Path(gen, TraceCommit)
    traceFs(spark, traceDir).create(m, true).close()
    out
  }

  /** [[pageRank]] with a PERSISTED PER-SWEEP TRACE — the build half of
    * incremental rank maintenance: each sweep's full (node, rank)
    * frame, the checkpointed edge list, the base (teleport) frame and
    * the run constants land under a new committed generation of
    * `traceDir` (data first, commit marker last — the index-lifecycle
    * atomic-swap shape), so a later [[pageRankRefresh]] can re-derive
    * ONLY the delta-reached nodes per sweep and copy everything else.
    * Trace cost: iters + 2 node-frame writes + one edge write on top
    * of the plain run. */
  def pageRankTrace(edges: DataFrame, iters: Int, traceDir: String,
                    damping: Double = 0.85,
                    orderedFold: Boolean = false): DataFrame =
    runTrace(edges, iters, traceDir, damping, orderedFold, "pagerank",
      None)

  /** [[trustRank]] with a persisted per-sweep trace — the seed-base
    * twin of [[pageRankTrace]], so the spam-demotion chain
    * (TrustRank → host trust prior → spam mass) refreshes from the
    * SAME epoch delta as the popularity prior instead of re-running
    * full sweeps per epoch. The generation persists the seed-derived
    * base frame and the seed set itself (the fallback re-trace needs
    * it); [[pageRankRefresh]] serves both modes. New nodes in a delta
    * do NOT move existing TrustRank bases (teleport depends on |S|,
    * not N), but they change the node frame — the refresh keeps the
    * documented full-fallback contract for them. */
  def trustRankTrace(edges: DataFrame, seeds: DataFrame, iters: Int,
                     traceDir: String, damping: Double = 0.85,
                     orderedFold: Boolean = false): DataFrame =
    runTrace(edges, iters, traceDir, damping, orderedFold, "trustrank",
      Some(seeds))

  /** INCREMENTAL RANK REFRESH — fold only what the delta can reach.
    * `delta` is a (src, dst, weight) frame of POSITIVE edge-weight
    * ADDITIONS since the traced run (exactly what aggregating the
    * transitions ledger's NEW event-id buckets produces — the stream
    * sink's append-only contract). Per sweep t, the only nodes whose
    * rank can differ from the traced sweep are those reachable from a
    * changed-out-weight source within t hops:
    * `frontier_t = dst(edges, src ∈ S ∪ frontier_(t-1))` with S the
    * delta's source set — so each sweep recomputes the recurrence for
    * the frontier ONLY (full in-edge fold per frontier node, so
    * recomputed values are BIT-equal to a full traced run under
    * orderedFold) and patches it into the previous trace's sweep
    * frame. Per-sweep shuffle volume tracks the delta's reach, never
    * the graph; the linear passes (edge merge, out-weight re-agg) run
    * once, not per sweep. A delta that introduces NEW nodes changes
    * N — every node's teleport base moves — so it falls back to a
    * full [[pageRankTrace]] over the merged edges (the documented
    * fallback). A delta LARGER than `deltaBroadcastLimit` distinct
    * edge keys takes the same fallback via a plain shuffle merge —
    * the broadcast-merge shape assumes an epoch-sized delta, and a
    * bulk-load epoch must not become a driver/executor-memory hazard
    * (the frontier frames are bounded by the delta's t-hop reach, so
    * gating the delta gates them too). Either way the result lands as
    * the NEXT committed trace generation (refreshes chain) and EQUALS
    * the full recurrence over the merged edges exactly (spec-bound).
    *
    * Serves BOTH recurrences: a [[trustRankTrace]] generation carries
    * its seed base frame and refreshes identically — only the copied
    * base differs (mode and base are read from the generation). */
  def pageRankRefresh(spark: org.apache.spark.sql.SparkSession,
                      traceDir: String, delta: DataFrame,
                      deltaBroadcastLimit: Long = 2000000L): DataFrame = {
    require(deltaBroadcastLimit >= 1,
      s"pageRankRefresh: deltaBroadcastLimit must be >= 1, got " +
        deltaBroadcastLimit)
    val gen = latestTraceGen(spark, traceDir).getOrElse(
      throw new IllegalArgumentException(
        s"pageRankRefresh: no committed trace generation under $traceDir" +
          " — run pageRankTrace first"))
    val meta = spark.read.parquet(s"$gen/meta").head()
    val iters = meta.getAs[Int]("iters")
    val damping = meta.getAs[Double]("damping")
    val n = meta.getAs[Long]("n")
    val orderedFold = meta.getAs[Boolean]("ordered_fold")
    // pre-mode traces (no `mode` column / base frame) are uniform-base
    val mode = if (meta.schema.fieldNames.contains("mode"))
      meta.getAs[String]("mode") else "pagerank"
    val fs = traceFs(spark, traceDir)
    def genHas(name: String): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(s"$gen/$name"))
    def fullTrace(merged: DataFrame): DataFrame = mode match {
      case "trustrank" =>
        trustRankTrace(merged, spark.read.parquet(s"$gen/seeds"), iters,
          traceDir, damping, orderedFold)
      case _ =>
        pageRankTrace(merged, iters, traceDir, damping, orderedFold)
    }
    val edgesOld = spark.read.parquet(s"$gen/edges")
    val deltaAgg = delta
      .select(col("src"), col("dst"), col("weight").cast("long").as("__dw"))
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("__dw")).as("__dw")).localCheckpoint()
    // positivity guard + size gate in ONE aggregation job over the
    // checkpointed delta (min > 0 over a non-empty frame is exactly
    // the former where(__dw <= 0).isEmpty check)
    val dRow = deltaAgg.agg(count(lit(1)).as("c"), min(col("__dw")).as("m"))
      .head()
    require(dRow.getLong(0) == 0L || dRow.getLong(1) > 0L,
      "pageRankRefresh: delta must be positive weight additions " +
        "(the append-only transitions-ledger contract)")
    // size gate: an oversized delta (bulk load, long-gapped epoch)
    // must not ride the broadcast-merge shape — merge by one ordinary
    // key shuffle and re-trace (the same documented fallback as new
    // nodes; everything below this point may assume a bounded delta)
    if (dRow.getLong(0) > deltaBroadcastLimit)
      return fullTrace(edgesOld
        .unionByName(deltaAgg.select(col("src"), col("dst"),
          col("__dw").as("weight")))
        .groupBy(col("src"), col("dst"))
        .agg(sum(col("weight")).as("weight")))
    // ZERO edge shuffles in the merge: the delta broadcasts, the old
    // edge list is only SCANNED — updated rows via a broadcast left
    // join, brand-new edge keys via two delta-sized joins (the matched
    // old keys are a subset of the delta, so both sides stay tiny)
    val matchedKeys = edgesOld
      .join(broadcast(deltaAgg.select(col("src"), col("dst"))),
        Seq("src", "dst"), "left_semi")
      .localCheckpoint()
    val newEdges = deltaAgg
      .join(broadcast(matchedKeys.select(col("src"), col("dst"))),
        Seq("src", "dst"), "left_anti")
      .select(col("src"), col("dst"), col("__dw").as("weight"))
    val merged = edgesOld
      .join(broadcast(deltaAgg), Seq("src", "dst"), "left")
      .select(col("src"), col("dst"),
        (col("weight") + coalesce(col("__dw"), lit(0L))).as("weight"))
      .unionByName(newEdges)
      .localCheckpoint()
    // a delta endpoint absent from the traced node set: for the
    // uniform base every teleport term moves (N changed); for the
    // seed base the bases hold but the node/sweep frames don't cover
    // the newcomer — either way nothing is copyable: full fallback
    val oldNodes = spark.read.parquet(f"$gen/sweep-0000")
      .select(col("node"))
    val newNodes = deltaAgg.select(col("src").as("node"))
      .unionByName(deltaAgg.select(col("dst").as("node")))
      .distinct().join(oldNodes, Seq("node"), "left_anti")
    if (!newNodes.isEmpty)
      return fullTrace(merged)
    // out-weights PATCH from the persisted table — per-src delta sums
    // broadcast onto a scan, never an edge aggregation
    val deltaOw = deltaAgg.groupBy(col("src"))
      .agg(sum(col("__dw")).as("__dow")).localCheckpoint()
    val outwOld = spark.read.parquet(s"$gen/outw")
    // a delta src that existed only as a DST has no old out-weight row
    // — surface it via the same broadcast-semi/anti shape as the edges
    val matchedOw = outwOld
      .join(broadcast(deltaOw.select(col("src"))), Seq("src"), "left_semi")
      .localCheckpoint()
    val freshOw = deltaOw
      .join(broadcast(matchedOw.select(col("src"))), Seq("src"),
        "left_anti")
      .select(col("src"), col("__dow").as("__ow"))
    val outW = outwOld
      .join(broadcast(deltaOw), Seq("src"), "left")
      .select(col("src"),
        (col("__ow") + coalesce(col("__dow"), lit(0L))).as("__ow"))
      .unionByName(freshOw)
      .localCheckpoint()
    val sources = deltaAgg.select(col("src").as("node")).distinct()
      .localCheckpoint()
    val base = (1.0 - damping) / n
    val genNew = nextTraceGen(spark, traceDir)
    // the generation's carried artifacts and per-sweep frames are read
    // only by LATER refreshes (each sweep below reads the OLD gen's
    // frames and its own checkpointed `patched`) — write them on the
    // side pool so the frontier loop never blocks on a parquet commit;
    // await-before-marker preserves the crash contract (AsyncWrites)
    val w = new AsyncWrites()
    w.submit(merged.write.mode("overwrite").parquet(s"$genNew/edges"))
    w.submit(outW.write.mode("overwrite").parquet(s"$genNew/outw"))
    w.submit(spark.read.parquet(s"$gen/meta")
      .write.mode("overwrite").parquet(s"$genNew/meta"))
    // the base frame / seed set are properties of the node set, which
    // this path did not change — carry them so refreshes keep chaining
    if (genHas("base"))
      w.submit(spark.read.parquet(s"$gen/base")
        .write.mode("overwrite").parquet(s"$genNew/base"))
    if (genHas("seeds"))
      w.submit(spark.read.parquet(s"$gen/seeds")
        .write.mode("overwrite").parquet(s"$genNew/seeds"))
    val baseDf = if (mode == "trustrank")
      spark.read.parquet(s"$gen/base") else null
    var patched = spark.read.parquet(f"$gen/sweep-0000").localCheckpoint()
    // snapshot the var before handing it to the by-name submit — the
    // loop below reassigns `patched`, and a deferred by-name read
    // would write whichever frame the var holds at RUN time
    val sweep0 = patched
    w.submit(sweep0.write.mode("overwrite").parquet(f"$genNew/sweep-0000"))
    var frontier = spark.emptyDataFrame
    for (t <- 1 to iters) {
      val influencers = (if (t == 1) sources
        else sources.unionByName(frontier).distinct()).localCheckpoint()
      val affected = merged
        .join(broadcast(influencers.withColumnRenamed("node", "src")),
          Seq("src"))
        .select(col("dst").as("node")).distinct().localCheckpoint()
      // frontier-first join order: the filtered in-edge frame is
      // frontier × in-degree (eagerly checkpointed so AQE sees its
      // true size and broadcasts it) — the out-weight and rank node
      // frames are then only SCANNED, never shuffled
      val filtered = merged
        .join(broadcast(affected.withColumnRenamed("node", "dst")),
          Seq("dst"))
        .localCheckpoint()
      val contribs = filtered
        .join(outW, Seq("src"))
        .join(patched.select(col("node").as("src"), col("rank")), Seq("src"))
        .select(col("dst"), col("src"),
          ((col("rank") / col("__ow")) * col("weight").cast("long"))
            .as("__contrib"))
      val mass =
        if (orderedFold)
          contribs.groupBy(col("dst"))
            .agg(orderedFoldSum(col("src"), col("__contrib")).as("__mass"))
        else
          contribs.groupBy(col("dst"))
            .agg(sum(col("__contrib")).as("__mass"))
      val massed = affected
        .join(mass.withColumnRenamed("dst", "node"), Seq("node"), "left")
      // uniform base stays a literal (the scalar from meta — the
      // bit-exact pagerank shape); the seed base joins the persisted
      // base frame, broadcast-driven by the bounded `affected` side
      val recomputed =
        if (mode == "trustrank")
          massed.join(baseDf, Seq("node"))
            .select(col("node"),
              (col("__base") +
                lit(damping) * coalesce(col("__mass"), lit(0.0)))
                .as("__new"))
        else
          massed.select(col("node"),
            (lit(base) + lit(damping) * coalesce(col("__mass"), lit(0.0)))
              .as("__new"))
      patched = spark.read.parquet(f"$gen/sweep-$t%04d")
        .join(recomputed, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("__new"), col("rank")).as("rank"))
        .localCheckpoint()
      val done = patched
      w.submit(done.write.mode("overwrite").parquet(f"$genNew/sweep-$t%04d"))
      frontier = affected
    }
    w.await()
    val m = new org.apache.hadoop.fs.Path(genNew, TraceCommit)
    traceFs(spark, traceDir).create(m, true).close()
    patched
  }

  /** Garbage-collect RETIRED trace generations — each one is a full
    * copy of the edge list plus iters + 1 node frames, so a
    * long-running refresh chain vacuums after the new generation has
    * soaked (the [[graft.llm.Similarity.vacuumIndex]] trade: rollback
    * after a vacuum means re-tracing, not marker deletion). Deletes
    * every RETIRED generation: committed ones older than the serving
    * generation unconditionally, and UNCOMMITTED stragglers only once
    * they are older than `uncommittedGraceMs` (by the newest
    * modification time among the directory and its direct children) —
    * an uncommitted generation younger than the grace window may be a
    * refresh/trace currently writing, and a concurrent vacuum must
    * not destroy it mid-run; a genuinely crashed straggler ages past
    * the grace and is reclaimed on the next vacuum. The serving
    * generation is untouched and the next [[pageRankRefresh]] chains
    * from it unchanged. Returns the deleted roots. */
  def vacuumRankTrace(spark: org.apache.spark.sql.SparkSession,
                      dir: String,
                      uncommittedGraceMs: Long = 6L * 3600L * 1000L)
      : Seq[String] = {
    require(uncommittedGraceMs >= 0,
      s"vacuumRankTrace: uncommittedGraceMs must be >= 0, got " +
        uncommittedGraceMs)
    val serving = latestTraceGen(spark, dir).getOrElse(return Nil)
    val servingName = new org.apache.hadoop.fs.Path(serving).getName
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = traceFs(spark, dir)
    val now = System.currentTimeMillis()
    def newestMtime(st: org.apache.hadoop.fs.FileStatus): Long =
      (st.getModificationTime +:
        fs.listStatus(st.getPath).map(_.getModificationTime).toSeq).max
    val deleted = collection.mutable.ArrayBuffer.empty[String]
    fs.listStatus(p)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen-")
        && st.getPath.getName != servingName)
      .foreach { st =>
        val committed = fs.exists(
          new org.apache.hadoop.fs.Path(st.getPath, TraceCommit))
        if (committed || now - newestMtime(st) > uncommittedGraceMs) {
          fs.delete(st.getPath, true)
          deleted += st.getPath.toString
        }
      }
    deleted.toSeq
  }

  /** Gate a document frame on its host's prior: keep rows whose host
    * prior is ≥ `minPrior`. The prior frame is one row per host —
    * broadcast by construction — so the gate is a broadcast hash join
    * + map-side predicate: zero new exchanges ahead of the funnel. */
  def priorGate(docs: DataFrame, priors: DataFrame, docHostCol: String,
                minPrior: Double): DataFrame =
    docs.join(broadcast(priors.select(col("host"), col("prior"))),
        docs(docHostCol) === col("host"))
      .where(col("prior") >= minPrior)
      .drop("host")
}
