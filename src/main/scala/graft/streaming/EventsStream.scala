package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension over the `events` table shape
  * (`TESTDATA.md`): the reference is batch-only (SURVEY §2.8), so this
  * is the forward-looking streaming surface a large-scale pipeline
  * needs — watermarked windowed aggregation and stateful
  * sessionization via `flatMapGroupsWithState`.
  *
  * The same transformations run on a batch frame (unit-testable) and a
  * `readStream` frame — both paths are exercised in StreamingSpec.
  */
object EventsStream {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String, value: Double)

  final case class SessionState(nEvents: Long, nSessions: Long, lastTsMicros: Long)

  final case class UserSessionStats(user_id: Long, n_sessions: Long, n_events: Long)

  /** Watermarked per-hour per-type counts. On a stream: late events
    * beyond 2 hours are dropped; state is bounded by the watermark. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"))

  /** Windowed per-source corpus-quality monitor — the ingest-time
    * watchdog a continuously-fed training pipeline needs: a source that
    * starts emitting empty/short/junk documents shows up within one
    * window instead of one training run. Per (event-time window,
    * source): doc count, exact token sum, and how many docs fall under
    * `minTokens`. All signals are map-only expressions feeding ONE
    * watermarked windowed aggregation — state is bounded by the
    * watermark, integer sums are shuffle-order-proof, and the identical
    * function serves the batch path (oracle-checked as
    * `docs_quality_monitor`). */
  def qualityMonitor(docs: DataFrame, tsCol: String = "ts",
                     sourceCol: String = "source", textCol: String = "text",
                     windowLen: String = "1 hour", delay: String = "2 hours",
                     minTokens: Int = 5): DataFrame = {
    // null text = 0 tokens: an extractor flipping to all-NULL is the
    // classic upstream failure and MUST register as short docs, not
    // silently fall out of both aggregates
    val toks = coalesce(
      graft.llm.TextAnalysis.wsTokenCount(col(textCol)), lit(0))
    docs
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(toks).as("sum_tokens"),
        sum(when(toks < minTokens, 1L).otherwise(0L)).as("n_short"))
      .select(col("w.start").as("window_start"), col(sourceCol),
        col("n_docs"), col("sum_tokens"), col("n_short"))
  }

  /** Streaming exact-dedup: drop duplicate keys with bounded state —
    * duplicates arriving within the watermark delay are suppressed,
    * state for expired keys is evicted (the streaming counterpart of
    * `Dedup.exactDedup` for continuous ingestion). */
  def dedupStream(events: DataFrame, idCols: Seq[String],
                  watermarkCol: String = "ts", delay: String = "1 hour"): DataFrame =
    events.withWatermark(watermarkCol, delay)
      .dropDuplicatesWithinWatermark(idCols)

  /** Stream-static enrichment join: a (possibly unbounded) event
    * stream joined against a static dimension frame. Stream-static
    * inner joins are STATELESS in Structured Streaming — every
    * micro-batch joins against the static side and no join state
    * accumulates — so with a broadcast-able dimension this is the
    * 100 TB/day-safe shape for ingest-time enrichment (the static side
    * is re-broadcast per batch, the stream side never shuffles for the
    * join). The identical function serves the batch path, where the
    * driver's DuckDB oracle checks it (`events_enriched`). */
  def enrich(events: DataFrame, dim: DataFrame,
             eventKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey))

  /** Stream-stream event-time range join (click attribution): each
    * view event joined to the same user's click events within
    * `withinMinutes` after it. Both sides carry watermarks and the join
    * condition bounds event time in BOTH directions, which is what lets
    * Structured Streaming evict join state: a buffered view is dropped
    * once the click-side watermark passes `view_ts + within`, and a
    * buffered click once the view-side watermark passes `click_ts` —
    * without the range predicate, stream-stream join state grows
    * without bound. The same function serves the batch path, where the
    * DuckDB oracle checks it (`events_attribution`). */
  def attributeClicks(views: DataFrame, clicks: DataFrame,
                      withinMinutes: Int = 30,
                      delay: String = "1 hour"): DataFrame = {
    val v = (if (views.isStreaming) views.withWatermark("ts", delay) else views)
      .select(col("event_id").as("view_id"), col("ts").as("view_ts"),
        col("user_id"))
    val c = (if (clicks.isStreaming) clicks.withWatermark("ts", delay) else clicks)
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"),
        col("user_id").as("__cu"))
    v.join(c, col("user_id") === col("__cu") &&
        col("click_ts") > col("view_ts") &&
        col("click_ts") <= col("view_ts") +
          expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("view_id"), col("click_id"), col("user_id"),
        col("view_ts"), col("click_ts"))
  }

  final case class AsOfMatch(left_id: Long, user_id: Long,
                             left_ts: java.sql.Timestamp,
                             right_id: Option[Long],
                             right_ts: Option[java.sql.Timestamp])

  final case class AsOfState(rightId: Long, rightTs: java.sql.Timestamp)

  /** Full-precision event-time micros (Timestamp.getTime is
    * ms-truncated; the sub-ms part lives in getNanos). */
  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** Streaming as-of enrichment — the continuous counterpart of
    * [[graft.operators.AsOf.asOfJoin]]: every `left` event is matched
    * to the most recent at-or-before `right` event of the same user,
    * with per-key state bounded to ONE (id, ts) pair (the latest right
    * seen) plus event-time TTL eviction — this is the latest-value
    * cache shape, not an unbounded event buffer.
    *
    * Semantics contract: within a micro-batch, rows process in
    * event-time order (right before left at equal timestamps, ties to
    * the greater id — identical ordering to the batch operator), so on
    * a BATCH input (one group pass) the result is EXACTLY the batch
    * as-of join (equivalence is spec-tested). On a stream, a right
    * event arriving in a LATER micro-batch than a left it should have
    * matched cannot retroactively re-match it — the precision limit of
    * any single-pass enrichment; bound it operationally with the
    * upstream watermark delay. */
  def asOfEnrich(left: Dataset[Event], right: Dataset[Event],
                 stateTtl: String = "2 hours"): Dataset[AsOfMatch] = {
    import left.sparkSession.implicits._
    val streaming = left.isStreaming || right.isStreaming
    // side 0 = right, 1 = left: right rows at an equal timestamp are
    // visible to left rows (at-or-before), matching AsOf.asOfJoin
    val l = left.select(col("user_id"), col("ts"), col("event_id"),
      lit(1).as("side"))
    val r = right.select(col("user_id"), col("ts"), col("event_id"),
      lit(0).as("side"))
    val merged0 = l.unionByName(r)
      .as[(Long, java.sql.Timestamp, Long, Int)]
    val merged = if (streaming) merged0.withWatermark("ts", stateTtl)
      .as[(Long, java.sql.Timestamp, Long, Int)] else merged0
    merged.groupByKey(_._1)
      .flatMapGroupsWithState[AsOfState, AsOfMatch](
        OutputMode.Append,
        if (streaming) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[(Long, java.sql.Timestamp, Long, Int)],
         state: GroupState[AsOfState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = batch.toSeq.sortBy { case (_, ts, id, side) =>
              (micros(ts), side, id)
            }
            var st = state.getOption
            val out = Seq.newBuilder[AsOfMatch]
            sorted.foreach { case (_, ts, id, side) =>
              if (side == 0) {
                if (st.forall(s => micros(ts) > micros(s.rightTs) ||
                    (micros(ts) == micros(s.rightTs) && id > s.rightId)))
                  st = Some(AsOfState(id, ts))
              } else {
                // an out-of-order left (later micro-batch, earlier ts)
                // must not receive a FUTURE-dated match from newer state;
                // the correct older right was superseded, so emit no
                // match rather than a wrong one (in batch order this
                // branch never fires)
                val valid = st.filter(s => micros(s.rightTs) <= micros(ts))
                out += AsOfMatch(id, userId, ts,
                  valid.map(_.rightId), valid.map(_.rightTs))
              }
            }
            st.foreach(state.update)
            if (streaming && st.isDefined) {
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(
                math.max(micros(st.get.rightTs) / 1000L, wm + 1L), stateTtl)
            }
            out.result().iterator
          }
      }
  }

  /** Stateful sessionization: a new session starts after `gapMinutes`
    * of inactivity per user. Emits running per-user totals on every
    * update (OutputMode.Update semantics). State is one small struct
    * per user AND evicted once the event-time watermark passes
    * `stateTtl` beyond the user's last event (EventTimeTimeout) — a
    * long-running stream does not accumulate state for users that
    * stopped arriving, and eviction is data-driven (no wall-clock
    * batches). A user reappearing after eviction restarts their
    * running totals. Batch executions never time out, so the batch
    * path is unaffected. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
                 stateTtl: String = "2 hours"): Dataset[UserSessionStats] = {
    import events.sparkSession.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", stateTtl) else events
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessionStats](
        OutputMode.Update,
        if (streaming) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption.getOrElse(SessionState(0L, 0L, Long.MinValue))
            sorted.foreach { e =>
              val tsMicros = e.ts.getTime * 1000L
              val newSession = st.lastTsMicros == Long.MinValue ||
                tsMicros - st.lastTsMicros > gapMicros
              st = SessionState(st.nEvents + 1,
                st.nSessions + (if (newSession) 1L else 0L), tsMicros)
            }
            state.update(st)
            if (streaming) {
              // evict at lastEvent + ttl, floored above the current
              // watermark (a fully-late group may trail it)
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(
                math.max(st.lastTsMicros / 1000L, wm + 1L), stateTtl)
            }
            Iterator.single(UserSessionStats(userId, st.nSessions, st.nEvents))
          }
      }
  }

  final case class PageEvent(user_id: Long, event_id: Long,
                             ts: java.sql.Timestamp, page: Long)
  final case class TransState(lastTsMicros: Long, lastEventId: Long,
                              lastPage: Long)
  final case class TransitionHit(user_id: Long, event_id: Long,
                                 src: Long, dst: Long)

  /** Streamed click-transition mining — the continuous half of the
    * link-graph prior ([[graft.llm.LinkGraph]]): page events arrive as
    * micro-batches; per-user state carries the LAST (ts, page) across
    * batches so a transition spanning a batch boundary is still
    * emitted. Each qualifying consecutive pair (gap ≤ `gapMinutes`)
    * emits one [[TransitionHit]] keyed by the LATER event's id — the
    * idempotence key the ledger sink anti-joins on, so at-least-once
    * redelivery cannot double-count an edge. State is one small struct
    * per user, evicted once the event-time watermark passes `stateTtl`
    * beyond the user's last event (the [[sessionize]] eviction
    * contract). Equal to [[graft.llm.LinkGraph.sessionTransitions]]
    * when per-user arrival order matches event-time order (the
    * watermark drops later-than-ttl stragglers in production;
    * spec-bound on ordered fixtures). */
  def transitionsStream(events: Dataset[PageEvent], gapMinutes: Int = 30,
                        stateTtl: String = "2 hours")
      : Dataset[TransitionHit] = {
    import events.sparkSession.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", stateTtl) else events
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, TransitionHit](OutputMode.Append,
        if (streaming) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[PageEvent],
         state: GroupState[TransState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            val out = Seq.newBuilder[TransitionHit]
            var st = state.getOption
              .getOrElse(TransState(Long.MinValue, Long.MinValue,
                Long.MinValue))
            sorted.foreach { e =>
              val t = micros(e.ts)
              // only STRICTLY newer (ts, event_id) advance the walk: a
              // redelivered or out-of-order-late event must neither
              // regress state nor fabricate a backward edge (caught
              // live: replaying batch 1 after batch 2 emitted a bogus
              // last-page -> first-page transition)
              val newer = t > st.lastTsMicros ||
                (t == st.lastTsMicros && e.event_id > st.lastEventId)
              if (newer) {
                if (st.lastTsMicros != Long.MinValue &&
                    t - st.lastTsMicros <= gapMicros)
                  out += TransitionHit(userId, e.event_id, st.lastPage,
                    e.page)
                st = TransState(t, e.event_id, e.page)
              }
            }
            state.update(st)
            if (streaming) {
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(
                math.max(st.lastTsMicros / 1000L, wm + 1L), stateTtl)
            }
            out.result().iterator
          }
      }
  }

  /** Idempotent ledger sink for [[transitionsStream]]: each
    * micro-batch's hits anti-join the ledger's own (user_id, event_id)
    * before appending, so redelivered batches are absorbed.
    *
    * The ledger directory is partitioned by an event-id bucket
    * (`__bucket = event_id / bucketSize`): a hit keyed by event E can
    * only collide with a ledger row in E's bucket, so the anti-join
    * reads ONLY the partitions covering the batch's own id span
    * (directory pruning via the partition-column `isin`). Per-batch
    * cost therefore tracks batch size + redelivery horizon, never
    * ledger lifetime — without this the full-ledger re-read grows
    * quadratic over the stream's life. The bucket list is collected
    * driver-side but bounded by the batch's id span / bucketSize.
    *
    * LEGACY LEDGERS: a directory written by the pre-bucketing flat
    * sink has no `__bucket` column; restarting over one detects that
    * from the existing schema and keeps the FLAT layout for that
    * directory (unpruned anti-join, plain appends) — mixing partition
    * directories into a flat ledger would corrupt partition discovery,
    * and a missing-column filter would kill the stream. Bucketed
    * pruning applies to ledgers born under this sink. */
  def transitionsLedgerSink(hits: Dataset[TransitionHit], outDir: String,
                            bucketSize: Long = 10000000L)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(hits.isStreaming, "transitionsLedgerSink: expected a stream")
    require(bucketSize >= 1, s"bucketSize must be >= 1, got $bucketSize")
    // a ledger's layout is decided at its birth and never changes
    // (mixing would corrupt partition discovery — see the scaladoc),
    // so the legacy probe resolves ONCE per sink instance instead of
    // paying a parquet footer read every micro-batch; it stays
    // unresolved only until the directory first exists
    val legacyKnown =
      new java.util.concurrent.atomic.AtomicReference[Option[Boolean]](None)
    hits.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[TransitionHit], _: Long) =>
        val spark = batch.sparkSession
        val conf = spark.sparkContext.hadoopConfiguration
        val outPath = new org.apache.hadoop.fs.Path(outDir)
        val exists = outPath.getFileSystem(conf).exists(outPath)
        // schema probe, not a scan: parquet footer of the ledger
        val legacyFlat = legacyKnown.get().getOrElse {
          val v = exists &&
            !spark.read.parquet(outDir).columns.contains("__bucket")
          if (exists) legacyKnown.set(Some(v))
          v
        }
        val withBucket = (if (legacyFlat) batch.toDF()
          else batch.toDF().withColumn("__bucket",
            floor(col("event_id") / lit(bucketSize)).cast("long")))
          .localCheckpoint(true) // one pass over the batch source
        val fresh = (if (exists) {
            val ledger = spark.read.parquet(outDir)
            val pruned = if (legacyFlat) ledger else {
              val buckets = withBucket.select(col("__bucket")).distinct()
                .collect().map(_.getLong(0)).toSeq
              ledger.where(col("__bucket").isin(buckets: _*)) // dir pruning
            }
            withBucket.join(
              pruned.select(col("user_id"), col("event_id")).distinct(),
              Seq("user_id", "event_id"), "left_anti")
          } else withBucket)
          .localCheckpoint(true) // sever lineage from the ledger dir
        if (!fresh.isEmpty) {
          val w = fresh.write.mode("append")
          (if (legacyFlat) w else w.partitionBy("__bucket")).parquet(outDir)
        }
      }.start()
  }

  /** Epoch-boundary finalization of a [[transitionsStream]] ledger:
    * aggregate hits to the (src, dst, weight) edge list — EXACTLY
    * [[graft.llm.LinkGraph.sessionTransitions]]'s output over the
    * union of the streamed batches (spec-bound), ready for
    * [[graft.llm.LinkGraph.pageRank]]/[[graft.llm.LinkGraph.trustRank]].
    * The defensive dropDuplicates is a no-op when the sink's anti-join
    * ran (kept so a hand-assembled ledger cannot double-count). */
  def finalizeTransitionsLedger(spark: org.apache.spark.sql.SparkSession,
                                ledgerDir: String): DataFrame =
    finalizeTransitions(spark.read.parquet(ledgerDir))

  /** Frame form of [[finalizeTransitionsLedger]] — also the
    * `finalize_transitions` config kind (ledger extract → edges). */
  def finalizeTransitions(hits: DataFrame): DataFrame =
    hits.dropDuplicates("user_id", "event_id")
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("weight"))
}
