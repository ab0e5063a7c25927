package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.llm.{Packing, Similarity}
import EventsStream.Event

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  // base offset one day above epoch: the streaming late-row filter drops
  // events with ts <= watermark, and the INITIAL watermark is epoch 0 —
  // an event at exactly t=0 would be discarded before reaching the
  // stateful operator
  private val baseMin = 24L * 60L
  private def ts(minutes: Long): Timestamp = new Timestamp((baseMin + minutes) * 60000L)

  private val eventsData = Seq(
    Event(1, ts(0), 1, "view", 1.0),
    Event(2, ts(10), 1, "click", 1.0),   // same session (gap 10 < 30)
    Event(3, ts(100), 1, "view", 1.0),   // new session (gap 90)
    Event(4, ts(5), 2, "view", 1.0))     // one session for user 2

  test("sessionize (batch Dataset path): gap starts a new session") {
    val out = EventsStream.sessionize(eventsData.toDS(), gapMinutes = 30)
      .collect().map(s => s.user_id -> ((s.n_sessions, s.n_events))).toMap
    assert(out(1L) == ((2L, 3L)))
    assert(out(2L) == ((1L, 1L)))
  }

  test("hourlyCounts over a MemoryStream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val counts = EventsStream.hourlyCounts(mem.toDF())
    val q = counts.writeStream
      .format("memory").queryName("hourly_test").outputMode("append")
      .start()
    try {
      mem.addData(eventsData: _*)
      q.processAllAvailable()
      // append mode holds windows open until the watermark passes; push
      // a late-enough event to close the first windows
      mem.addData(Event(9, ts(400), 9, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_test")
        .select(col("hour"), col("event_type"), col("n")).collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2)))
        .toSet
      // hour 0: view(2: ids 1,4) + click(1); hour 1 (min 60-120): view(1)
      assert(rows.contains((baseMin, "view", 2L)))
      assert(rows.contains((baseMin, "click", 1L)))
      assert(rows.contains((baseMin + 60L, "view", 1L)))
    } finally q.stop()
  }

  test("qualityMonitor over a MemoryStream: windowed per-source signals") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, String)]
    val mon = EventsStream.qualityMonitor(
      mem.toDF().toDF("ts", "source", "text"))
    val q = mon.writeStream
      .format("memory").queryName("quality_test").outputMode("append")
      .start()
    try {
      mem.addData(
        (ts(0), "srcA", "one two three four five six"), // 6 tokens
        (ts(10), "srcA", "short doc"),                  // 2 tokens -> short
        (ts(20), "srcB", ""),                           // 0 tokens -> short
        (ts(25), "srcB", null),    // null text = the broken-extractor
                                   // case: counts as a short doc
        (ts(70), "srcA", "next window tokens here now")) // hour 1, 5 tokens
      q.processAllAvailable()
      // close the first windows past the 2h watermark
      mem.addData((ts(400), "srcZ", "late closer"))
      q.processAllAvailable()
      val rows = spark.table("quality_test")
        .collect().map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1),
          r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      assert(rows.contains((baseMin, "srcA", 2L, 8L, 1L)))
      assert(rows.contains((baseMin, "srcB", 2L, 0L, 2L)))
      assert(rows.contains((baseMin + 60L, "srcA", 1L, 5L, 0L)))
    } finally q.stop()
  }

  test("classifierScoreCol composes into a stream: map-only ingest-time scoring") {
    // the scalar classifier (weights as an array literal) is a pure
    // column expression, so model-based quality filtering works
    // unchanged at ingest time — no aggregation state, no shuffle
    implicit val sqlCtx = spark.sqlContext
    val wts = graft.llm.Importance.weightArray(
      graft.llm.Importance.seededWeights(spark))
    val mem = MemoryStream[(Long, String)]
    val scored = mem.toDF().toDF("doc_id", "text")
      .withColumn("score",
        graft.llm.Importance.classifierScoreCol(col("text"), wts))
    assert(scored.isStreaming)
    val q = scored.writeStream
      .format("memory").queryName("clf_stream_test").outputMode("append")
      .start()
    try {
      mem.addData((1L, "the cat sat on the mat"), (2L, ""), (3L, "solo"))
      q.processAllAvailable()
      val rows = spark.table("clf_stream_test")
        .collect().map(r => r.getLong(0) ->
          Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
      // scores equal the batch path exactly; featureless docs score null
      val batch = Seq((1L, "the cat sat on the mat"), (3L, "solo"))
        .toDF("doc_id", "text")
        .select(col("doc_id"),
          graft.llm.Importance.classifierScoreCol(col("text"), wts).as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(rows(1L).contains(batch(1L)))
      assert(rows(3L).contains(batch(3L)))
      assert(rows(2L).isEmpty)
    } finally q.stop()
  }

  test("enrich: stream-static join is stateless and enriches each micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "ALPHA"), (2L, "BETA")).toDF("c_custkey", "n_name")
    val mem = MemoryStream[Event]
    val enriched = EventsStream.enrich(mem.toDF(), dim, "user_id", "c_custkey")
      .select(col("event_id"), col("n_name"))
    assert(enriched.isStreaming)
    val q = enriched.writeStream
      .format("memory").queryName("enrich_test").outputMode("append")
      .start()
    try {
      mem.addData(eventsData: _*)
      q.processAllAvailable()
      // second batch: join state must not be needed — a fresh batch
      // still enriches (stream-static joins keep no state)
      mem.addData(Event(9, ts(400), 2, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("enrich_test")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows == Set((1L, "ALPHA"), (2L, "ALPHA"), (3L, "ALPHA"),
        (4L, "BETA"), (9L, "BETA")))
      // inner join: user 3 (no dim row) would be dropped — streaming
      // batch equivalence for that case is covered by the batch query's
      // DuckDB oracle (events_enriched)
    } finally q.stop()
  }

  test("attributeClicks: stream-stream range join attributes only in-window clicks") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val joined = EventsStream.attributeClicks(
      views.toDF(), clicks.toDF(), withinMinutes = 30)
    assert(joined.isStreaming)
    val q = joined.writeStream
      .format("memory").queryName("attr_test").outputMode("append")
      .start()
    try {
      views.addData(Event(1, ts(0), 1, "view", 1.0))
      clicks.addData(
        Event(10, ts(10), 1, "click", 1.0),  // in window
        Event(11, ts(60), 1, "click", 1.0),  // outside 30-min window
        Event(12, ts(5), 2, "click", 1.0))   // other user
      q.processAllAvailable()
      val rows = spark.table("attr_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((1L, 10L)))
      // a view in a LATER batch still joins a click buffered earlier
      views.addData(Event(2, ts(3), 2, "view", 1.0))
      q.processAllAvailable()
      val rows2 = spark.table("attr_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows2 == Set((1L, 10L), (2L, 12L)))
    } finally q.stop()
  }

  test("asOfEnrich (batch path) equals the batch as-of join exactly") {
    val ev = graft.Queries.readEvents(spark, sfDir)
      .withColumn("value", lit(1.0))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event]
    val views = ev.filter(_.event_type == "view")
    val clicks = ev.filter(_.event_type == "click")
    val got = EventsStream.asOfEnrich(clicks, views)
      .collect().map(m => (m.left_id, m.right_id, m.right_ts)).toSet
    val expected = graft.operators.AsOf.asOfJoin(
        clicks.toDF().select($"user_id", $"ts", $"event_id".as("click_id")),
        views.toDF().select($"user_id", $"ts", $"event_id".as("view_id")),
        Seq("user_id"), "ts", Seq("view_id"), tieCol = "view_id")
      .select($"click_id", $"view_id", $"matched_ts")
      .as[(Long, Option[Long], Option[Timestamp])]
      .collect().map(t => (t._1, t._2, t._3)).toSet
    assert(got == expected)
    assert(got.size == clicks.count())
  }

  test("asOfEnrich on a stream: latest-value state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val out = EventsStream.asOfEnrich(clicks.toDS(), views.toDS())
    assert(out.isStreaming)
    val q = out.writeStream
      .format("memory").queryName("asof_test").outputMode("append")
      .start()
    try {
      views.addData(Event(100, ts(0), 1, "view", 1.0))
      q.processAllAvailable()
      clicks.addData(Event(1, ts(5), 1, "click", 1.0),  // matches 100
        Event(2, ts(6), 2, "click", 1.0))               // no view for user 2
      q.processAllAvailable()
      // a newer view arrives; only SUBSEQUENT clicks see it
      views.addData(Event(101, ts(10), 1, "view", 1.0))
      clicks.addData(Event(3, ts(20), 1, "click", 1.0))
      q.processAllAvailable()
      // an out-of-order left (earlier ts than the state's right) must
      // NOT receive the future-dated match; it emits no match
      clicks.addData(Event(4, ts(2), 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("asof_test")
        .select($"left_id", $"right_id").as[(Long, Option[Long])]
        .collect().toMap
      assert(rows == Map(1L -> Some(100L), 2L -> None, 3L -> Some(101L),
        4L -> None))
    } finally q.stop()
  }

  test("dedupStream suppresses duplicate ids across batches within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventsStream.dedupStream(mem.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_test").outputMode("append")
      .start()
    try {
      mem.addData(Event(1, ts(0), 1, "view", 1.0), Event(1, ts(1), 1, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Event(1, ts(2), 1, "view", 1.0), Event(2, ts(3), 1, "click", 1.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("event_id").as[Long].collect().toSeq
      assert(ids.sorted == Seq(1L, 2L)) // the three id=1 events collapse to one
    } finally q.stop()
  }

  test("sessionize runs as a streaming query with state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventsStream.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_test").outputMode("update")
      .start()
    try {
      mem.addData(Event(1, ts(0), 1, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Event(2, ts(100), 1, "view", 1.0)) // second batch, new session
      q.processAllAvailable()
      val last = spark.table("sessions_test")
        .collect().map(r => (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events")))
      // state persisted across batches: final update reports 2 sessions, 2 events
      assert(last.contains((2L, 2L)))
    } finally q.stop()
  }

  test("sessionize evicts idle state once the watermark passes the ttl") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventsStream.sessionize(mem.toDS(), gapMinutes = 30, stateTtl = "1 hour")
      .writeStream.format("memory").queryName("sessions_ttl_test").outputMode("update")
      .start()
    try {
      mem.addData(Event(1, ts(0), 1, "view", 1.0))
      q.processAllAvailable()
      // user 2 far in the future advances the watermark (t=600 - 60min)
      // beyond user 1's eviction point (t=0 + 60min)
      mem.addData(Event(2, ts(600), 2, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Event(3, ts(601), 2, "view", 1.0)) // triggers timeout processing
      q.processAllAvailable()
      // user 1 reappears AFTER eviction: totals restart at 1/1 instead
      // of continuing 2/2
      mem.addData(Event(4, ts(610), 1, "view", 1.0))
      q.processAllAvailable()
      val updatesForUser1 = spark.table("sessions_ttl_test")
        .where(col("user_id") === 1)
        .collect().map(r => (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events")))
      assert(updatesForUser1.contains((1L, 1L)))
      assert(updatesForUser1.length == 2) // initial + post-eviction restart
      assert(updatesForUser1.last == ((1L, 1L)))
    } finally q.stop()
  }

  test("incremental packing over a stream: per-batch append with carried offset ≡ one-shot repack") {
    // the streaming trainer-format story: each micro-batch continues
    // the token stream via packSequencesAppend with the offset carried
    // across batches (in production, in the ingestion ledger); the
    // concatenation of per-batch assignments must equal packing the
    // whole corpus at once — including packs straddling batch
    // boundaries
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    var offset = 0L
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val sink: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => {
        val asg = graft.llm.Packing.packSequencesAppend(
          batch.toDF("doc_id", "t"), "doc_id", col("t"),
          budget = 6, startOffset = offset)
        val rows = asg.orderBy("doc_id")
          .as[(Long, Long, Long, Long)](
            org.apache.spark.sql.Encoders.product[(Long, Long, Long, Long)])
          .collect()
        results ++= rows
        offset += rows.map(_._2).sum
      }
    val q = mem.toDF().writeStream.foreachBatch(sink).start()
    try {
      mem.addData((1L, 3L), (2L, 4L)); q.processAllAvailable()
      mem.addData((3L, 2L), (4L, 5L)); q.processAllAvailable()
      mem.addData((5L, 1L), (6L, 7L)); q.processAllAvailable()
    } finally q.stop()
    val full = graft.llm.Packing.packSequences(
        Seq((1L, 3L), (2L, 4L), (3L, 2L), (4L, 5L), (5L, 1L), (6L, 7L))
          .toDF("doc_id", "t"), "doc_id", col("t"), budget = 6)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(results.sortBy(_._1).toSeq == full)
  }

  test("raw-crawl streaming ingest: WARC file stream + per-batch ledger dedup") {
    // the continuous-crawl shape: a crawler drops WARC segments into a
    // landing dir; each micro-batch parses responses, gates
    // status/media, extracts main content, dedups against the
    // accumulated content ledger, and appends its survivors to it —
    // so a page recrawled in a LATER segment never re-enters
    graft.plans.GraftExtensions.register(spark)
    val work = java.nio.file.Files.createTempDirectory("graft_warc_stream")
      .toFile.getPath
    val landing = s"$work/landing"
    val ledger = s"$work/ledger"
    new java.io.File(landing).mkdirs()
    def rec(uri: String, status: String, prose: String): String = {
      val http = s"HTTP/1.1 $status\nContent-Type: text/html"
      val html = s"<html><body><p>$prose</p></body></html>"
      s"WARC/1.0\nWARC-Type: response\nWARC-Target-URI: $uri\n" +
        s"WARC-Date: 2026-04-04T00:00:00Z\n" +
        s"Content-Length: ${http.length + 2 + html.length}\n\n$http\n\n$html"
    }
    val p1 = "segment one page with plenty of ordinary prose words here."
    val p2 = "another page with plenty of distinct prose words in it today."
    val p3 = "a third page with its own plenty of fresh prose words now."
    def writeSeg(name: String, recs: Seq[String]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$landing/$name"),
        (recs.mkString("\n") + "\n").getBytes("UTF-8"))
    // seed the ledger empty-but-present so every batch can read it
    Seq.empty[(String, String)].toDF("url", "text")
      .write.mode("overwrite").parquet(ledger)
    val parsed = graft.sources.Sources.readWarcResponsesStream(spark, landing)
      .where(col("http_status") === 200 && col("content_type") === "text/html")
      .select(col("url"),
        graft.functions.HtmlText.extractCol(col("html")).as("text"))
    assert(parsed.isStreaming)
    val q = parsed.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val fresh = graft.llm.Dedup.exactDedupAgainst(batch,
          batch.sparkSession.read.parquet(ledger), "url", "text")
          .localCheckpoint(true) // sever lineage before overwriting source
        val all = fresh.unionByName(
          batch.sparkSession.read.parquet(ledger).localCheckpoint(true))
        all.write.mode("overwrite").parquet(ledger)
        ()
    }.start()
    try {
      writeSeg("seg1.warc", Seq(
        rec("https://a.example/1", "200 OK", p1),
        rec("https://a.example/err", "404 Not Found", p2)))
      q.processAllAvailable()
      writeSeg("seg2.warc", Seq(
        rec("https://b.example/recrawl", "200 OK", p1), // known content
        rec("https://b.example/2", "200 OK", p2),
        rec("https://b.example/3", "200 OK", p3)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(ledger)
      .select("url", "text").as[(String, String)].collect().toMap
    // recrawled content never re-entered; the 404 never extracted
    assert(rows.keySet == Set("https://a.example/1",
      "https://b.example/2", "https://b.example/3"))
    assert(rows("https://a.example/1") == p1)
    assert(rows("https://b.example/2") == p2)
  }

  test("streaming PQ index append ≡ batch append; replayed ids never re-enter") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val base = emb.where(col("vec_id") % 3 === 0)
    val b1 = emb.where(col("vec_id") % 3 === 1)
      .as[(Long, Seq[Float])].collect().toSeq
    val b2 = emb.where(col("vec_id") % 3 === 2)
      .as[(Long, Seq[Float])].collect().toSeq
    val dirS = java.nio.file.Files.createTempDirectory("graft_pq_s").toFile.getPath
    val dirB = java.nio.file.Files.createTempDirectory("graft_pq_b").toFile.getPath
    Similarity.buildPqIndex(base, dirS)
    Similarity.buildPqIndex(base, dirB)
    // stream path: two micro-batches, each polluted with rows the
    // ledger must drop — an already-indexed base id in batch 1, an
    // in-batch duplicate, and a batch-1 replay inside batch 2
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = IndexIngest.appendPqIndexStream(
      mem.toDF().toDF("vec_id", "embedding"), dirS)
    try {
      val indexedBase = base.as[(Long, Seq[Float])].head()
      mem.addData(b1 ++ Seq(indexedBase, b1.head))
      q.processAllAvailable()
      mem.addData(b2 :+ b1.head)
      q.processAllAvailable()
    } finally q.stop()
    // batch path on the clean batches
    Similarity.appendPqIndex(spark, b1.toDF("vec_id", "embedding"), dirB)
    Similarity.appendPqIndex(spark, b2.toDF("vec_id", "embedding"), dirB)
    def codes(dir: String) = spark.read.parquet(s"$dir/codes")
      .orderBy("vec_id").as[(Long, Seq[Int])].collect().toSeq
    val streamed = codes(dirS)
    assert(streamed == codes(dirB))
    // every id exactly once despite the replays
    assert(streamed.map(_._1) == streamed.map(_._1).distinct)
    assert(streamed.map(_._1).toSet == emb.select("vec_id").as[Long].collect().toSet)
  }

  test("streaming IVF index append ≡ batch append on the same batches") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val base = emb.where(col("vec_id") % 3 === 0)
    val b1 = emb.where(col("vec_id") % 3 === 1)
      .as[(Long, Seq[Float])].collect().toSeq
    val b2 = emb.where(col("vec_id") % 3 === 2)
      .as[(Long, Seq[Float])].collect().toSeq
    val dirS = java.nio.file.Files.createTempDirectory("graft_ivf_s").toFile.getPath
    val dirB = java.nio.file.Files.createTempDirectory("graft_ivf_b").toFile.getPath
    Similarity.buildIvfIndex(base, dirS)
    Similarity.buildIvfIndex(base, dirB)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = IndexIngest.appendIvfIndexStream(
      mem.toDF().toDF("vec_id", "embedding"), dirS)
    try {
      mem.addData(b1 :+ b1.head) // in-batch duplicate
      q.processAllAvailable()
      mem.addData(b2 :+ b1.head) // cross-batch replay
      q.processAllAvailable()
    } finally q.stop()
    Similarity.appendIvfIndex(spark, b1.toDF("vec_id", "embedding"), dirB)
    Similarity.appendIvfIndex(spark, b2.toDF("vec_id", "embedding"), dirB)
    def assigned(dir: String) = spark.read.parquet(s"$dir/assignments")
      .select(col("neighbor_id"), col("cluster"))
      .orderBy("neighbor_id").as[(Long, Int)].collect().toSeq
    val streamed = assigned(dirS)
    assert(streamed == assigned(dirB))
    assert(streamed.map(_._1) == streamed.map(_._1).distinct)
  }

  test("streaming IVF append with semantic dedup: indexed twins refused, novel lands") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val base = emb.where(col("vec_id") % 3 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_sd")
      .toFile.getPath
    Similarity.buildIvfIndex(base, dir)
    // ε-twin of an INDEXED vector (new id, cosine ~1) + a genuinely
    // novel vector (vec_id % 3 === 1 — not near-identical to anything
    // in the base set)
    def twinOf(id: Long, newId: Long): (Long, Seq[Float]) = {
      val v = base.where(col("vec_id") === id)
        .as[(Long, Seq[Float])].head()._2
      newId -> ((v.head + 0.001f) +: v.tail)
    }
    val novel = emb.where(col("vec_id") % 3 === 1).limit(1)
      .as[(Long, Seq[Float])].head()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = IndexIngest.appendIvfIndexStream(
      mem.toDF().toDF("vec_id", "embedding"), dir,
      semanticDedupThreshold = Some(0.98))
    try {
      mem.addData(twinOf(0L, 7001L), novel)
      q.processAllAvailable()
      // second epoch: an ε-twin of the just-landed NOVEL vector must
      // now drop too (the index grew), and an exact-id replay drops
      // via the ledger as before
      mem.addData((7002L, (novel._2.head + 0.001f) +: novel._2.tail),
        novel)
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.read.parquet(s"$dir/assignments")
      .select("neighbor_id").as[Long].collect().toSet
    assert(!ids.contains(7001L), "twin of an indexed vector must be refused")
    assert(!ids.contains(7002L), "twin of a streamed-in vector must be refused")
    assert(ids.contains(novel._1), "the novel vector must land")
    // with the option OFF the same twin is admitted (opt-in semantics)
    val mem2 = MemoryStream[(Long, Seq[Float])]
    val q2 = IndexIngest.appendIvfIndexStream(
      mem2.toDF().toDF("vec_id", "embedding"), dir)
    try {
      mem2.addData(twinOf(0L, 7003L)); q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(s"$dir/assignments")
      .where(col("neighbor_id") === 7003L).count() == 1L)
  }

  test("appendPairStream: gates + three dedup layers; streamed ≡ batch store") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pairstream")
      .toFile.getPath
    val vOk = Seq(1.0f, 0.0f, 0.0f)
    val cap = "the quick brown fox jumps over the lazy dog"
    def png(id: Long) = graft.multimodal.Multimodal.syntheticPng(id, 16, 16)
    def pair(id: Long, imgSeed: Long, caption: String = cap) =
      (id, png(imgSeed), caption, vOk, vOk)
    // seed: pair 1 accepted batch-side
    val seed = Seq(pair(1L, 1L))
      .toDF("pair_id", "payload", "caption", "img_emb", "txt_emb")
    IndexIngest.seedPairStore(seed, dir, minWords = 3, minAlign = 0.5)
    assert(spark.read.parquet(s"$dir/accepted").count() == 1L)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Byte], String, Seq[Float], Seq[Float])]
    val q = IndexIngest.appendPairStream(
      mem.toDF().toDF("pair_id", "payload", "caption", "img_emb", "txt_emb"),
      dir, minWords = 3, minAlign = 0.5)
    try {
      // batch 1: a novel pair, a re-crawl of the SEEDED pair's content
      // under a new id (cross-batch dedup must refuse), an in-batch
      // duplicate pair (keep-min), and a gate-failing caption
      mem.addData(
        pair(10L, 10L),
        pair(11L, 1L),                 // same pixels+caption as seed 1
        pair(12L, 12L), pair(13L, 12L), // in-batch content twins
        pair(14L, 14L, "too short"))
      q.processAllAvailable()
      // batch 2: full redelivery of batch 1 plus one novel pair
      mem.addData(pair(10L, 10L), pair(11L, 1L), pair(12L, 12L),
        pair(13L, 12L), pair(14L, 14L, "too short"), pair(20L, 20L))
      q.processAllAvailable()
    } finally q.stop()
    val acc = spark.read.parquet(s"$dir/accepted")
    val ids = acc.select("pair_id").as[Long].collect().toSet
    assert(ids == Set(1L, 10L, 12L, 20L),
      s"seed kept, novel landed, re-crawl + twin + gated refused: $ids")
    // accepted rows carry the full pair payload + evidence + key
    assert(acc.columns.toSet.contains("payload") &&
      acc.columns.toSet.contains("pair_key") &&
      acc.columns.toSet.contains("align"))
    // streamed store == one-shot batch curation over the union
    val union = seed.unionByName(Seq(pair(10L, 10L), pair(11L, 1L),
        pair(12L, 12L), pair(13L, 12L), pair(14L, 14L, "too short"),
        pair(20L, 20L))
      .toDF("pair_id", "payload", "caption", "img_emb", "txt_emb"))
    val batchIds = graft.multimodal.Pairs.pairFilterAll(
        graft.multimodal.Pairs.pairDedup(union), minWords = 3,
        minAlign = 0.5)
      .select("pair_id").as[Long].collect().toSet
    assert(batchIds == ids, s"streamed $ids != batch $batchIds")
  }

  test("searchIvfStream: streamed answers ≡ batch probe; replays never re-answer") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_serve")
      .toFile.getPath
    Similarity.buildIvfIndex(emb, s"$dir/index")
    val queries = emb.where(col("vec_id") < 6)
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = IndexIngest.searchIvfStream(
      mem.toDF().toDF("vec_id", "embedding"), s"$dir/index",
      s"$dir/results", k = 3)
    val b1 = queries.where(col("vec_id") < 5003L)
      .as[(Long, Seq[Float])].collect().toSeq
    val b2 = queries.where(col("vec_id") >= 5003L)
      .as[(Long, Seq[Float])].collect().toSeq
    try {
      mem.addData(b1 :+ b1.head: _*) // in-batch duplicate query
      q.processAllAvailable()
      mem.addData(b2 ++ b1: _*)      // full batch-1 redelivery
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$dir/results")
      .select(col("query_id"), col("rank").cast("long"), col("neighbor_id"))
      .orderBy(col("query_id"), col("rank"))
      .as[(Long, Long, Long)].collect().toSeq
    val batch = Similarity.ivfQueryIndex(spark, s"$dir/index", queries,
        k = 3, nProbe = 2)
      .select(col("query_id"), col("rank").cast("long"), col("neighbor_id"))
      .orderBy(col("query_id"), col("rank"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(streamed == batch)
    // exactly one answer set per query id: the redelivery was refused
    assert(streamed.map(_._1).distinct.size == 6)
    assert(streamed.size == 18)
  }

  test("bm25SearchStream: streamed battery ≡ one-shot serve; replays never re-answer") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .limit(400).localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_serve")
      .toFile.getPath
    graft.llm.Search.buildPostings(docs, s"$dir/index", shards = 4)
    val battery = Seq((1L, "hash join merge"), (2L, "sort spill disk"),
      (3L, "columnar scan"), (4L, "zzz nothing"))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = IndexIngest.bm25SearchStream(
      mem.toDF().toDF("qid", "text"), s"$dir/index", s"$dir/results",
      k = 3)
    val (b1, b2) = battery.splitAt(2)
    try {
      mem.addData(b1 :+ b1.head: _*) // in-batch duplicate query
      q.processAllAvailable()
      mem.addData(b2 ++ b1: _*)      // full batch-1 redelivery
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$dir/results")
      .orderBy(col("qid"), col("rank")).collect().map(_.toString).toSeq
    val oneShot = graft.llm.Search.bm25ServeJoinTopK(spark, s"$dir/index",
        battery.toDF("qid", "text"), k = 3)
      .orderBy(col("qid"), col("rank")).collect().map(_.toString).toSeq
    assert(streamed == oneShot)
    // exactly one answer set per answered qid; the no-overlap query
    // answers nothing (and its absence doesn't block the ledger)
    assert(spark.read.parquet(s"$dir/results")
      .select("qid").distinct().count() == 3)
  }

  test("searchIvfStream: reindex swap between micro-batches — serving continuity, new generation serves") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_reix")
      .toFile.getPath
    Similarity.buildIvfIndex(emb, s"$dir/index")
    val queries = emb.where(col("vec_id") < 6)
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
    val b1 = queries.where(col("vec_id") < 5003L)
      .as[(Long, Seq[Float])].collect().toSeq
    val b2 = queries.where(col("vec_id") >= 5003L)
      .as[(Long, Seq[Float])].collect().toSeq
    // expected answers per generation, computed OUTSIDE the stream:
    // batch 1 against the original build, batch 2 against the reindexed
    // generation (different nCentroids — a genuinely different quantizer)
    def expect(qs: Seq[(Long, Seq[Float])]) =
      Similarity.ivfQueryIndex(spark, s"$dir/index",
          qs.toDF("vec_id", "embedding"), k = 3, nProbe = 2)
        .select(col("query_id"), col("rank").cast("long"),
          col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
        .as[(Long, Long, Long)].collect().toSeq
    val want1 = expect(b1)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = IndexIngest.searchIvfStream(
      mem.toDF().toDF("vec_id", "embedding"), s"$dir/index",
      s"$dir/results", k = 3, nProbe = 2)
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      // the swap, mid-stream: reindex commits gen-0001 and the retired
      // flat layout is vacuumed, so batch 2 can ONLY be answered from
      // the new generation — continuity is observable, not assumed
      Similarity.reindexIvf(spark, s"$dir/index", nCentroids = 8)
      Similarity.vacuumIndex(spark, s"$dir/index")
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val want2 = expect(b2) // resolves gen-0001 now
    val got = spark.read.parquet(s"$dir/results")
      .select(col("query_id"), col("rank").cast("long"),
        col("neighbor_id"))
      .orderBy(col("query_id"), col("rank"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == (want1 ++ want2).sorted,
      s"stream answers != per-generation batch answers")
    // every query answered exactly once; the stream was never restarted
    assert(got.map(_._1).distinct.size == 6 && got.size == 18)
  }

  test("mineBitextStream + finalize ≡ one-shot mineBitextIndexed; replays refused") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val src = emb.where(col("vec_id") % 10 === 0)
    val tgt = emb.where(col("vec_id") % 20 === 0).select(
        (col("vec_id") + 500000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x))
          .as("embedding"))
      .unionByName(emb.where(col("vec_id") % 10 === 3)
        .select((col("vec_id") + 700000L).as("vec_id"), col("embedding")))
    val dir = java.nio.file.Files.createTempDirectory("graft_bitext_s")
      .toFile.getPath
    Similarity.buildIvfIndex(src, s"$dir/src")
    Similarity.buildIvfIndex(tgt, s"$dir/tgt")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = IndexIngest.mineBitextStream(
      mem.toDF().toDF("vec_id", "embedding"), s"$dir/tgt", s"$dir/fwd")
    val b1 = src.where(col("vec_id") < 200)
      .as[(Long, Seq[Float])].collect().toSeq
    val b2 = src.where(col("vec_id") >= 200)
      .as[(Long, Seq[Float])].collect().toSeq
    try {
      mem.addData(b1 :+ b1.head: _*)      // in-batch duplicate
      q.processAllAvailable()
      mem.addData(b2 ++ b1.take(3): _*)   // cross-batch redelivery
      q.processAllAvailable()
    } finally q.stop()
    // ledger idempotence: one fwd row set per source id
    val fwd = spark.read.parquet(s"$dir/fwd")
    assert(fwd.groupBy("query_id", "rank").count()
      .where(col("count") > 1).isEmpty, "replayed ids re-probed")
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("src_id"), col("tgt_id"), col("cosine"), col("margin"))
      .collect().map(_.toString).toSet
    val streamed = snap(IndexIngest.finalizeBitextLedger(spark,
      s"$dir/fwd", s"$dir/src", tgt, k = 4, threshold = 1.3))
    val oneShot = snap(graft.llm.Bitext.mineBitextIndexed(spark,
      s"$dir/src", s"$dir/tgt", src, tgt, k = 4, threshold = 1.3))
    assert(streamed == oneShot && streamed.nonEmpty,
      "streamed candidates + epoch finalize must equal the one-shot mine")
  }

  test("mineTripletsStream + finalize ≡ one-shot mineTripletsIndexed; cross-batch adjacency held") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val chunks = emb.select(col("vec_id").as("chunk_id"),
      expr("vec_id div 4").as("doc_id"),
      (col("vec_id") % 4).as("chunk_idx"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft_trip_s")
      .toFile.getPath
    Similarity.buildIvfIndex(chunks, s"$dir/idx", cIdCol = "chunk_id")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Seq[Float])]
    val q = IndexIngest.mineTripletsStream(
      mem.toDF().toDF("chunk_id", "doc_id", "chunk_idx", "embedding"),
      s"$dir/idx", s"$dir/fwd")
    // batch boundary INSIDE doc 25 (chunks 100..103 split 100,101 /
    // 102,103): chunk 101's positive (102) arrives in batch 2
    val b1 = chunks.where(col("chunk_id") < 102)
      .as[(Long, Long, Long, Seq[Float])].collect().toSeq
    val b2 = chunks.where(col("chunk_id") >= 102)
      .as[(Long, Long, Long, Seq[Float])].collect().toSeq
    try {
      mem.addData(b1 :+ b1.head: _*)
      q.processAllAvailable()
      mem.addData(b2 ++ b1.take(3): _*)
      q.processAllAvailable()
    } finally q.stop()
    val fwd = spark.read.parquet(s"$dir/fwd")
    assert(fwd.groupBy("query_id", "rank").count()
      .where(col("count") > 1).isEmpty, "replayed ids re-probed")
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("pos_id"), col("neg_rank"),
        col("neg_id"), col("neg_cosine"))
      .collect().map(_.toString).toSet
    val streamed = snap(IndexIngest.finalizeTripletsLedger(spark,
      s"$dir/fwd", chunks))
    val oneShot = snap(Similarity.mineTripletsIndexed(spark,
      s"$dir/idx", chunks))
    assert(streamed == oneShot && streamed.nonEmpty)
    // the cross-boundary adjacency is present: chunk 101 mined with
    // positive 102 even though 102 arrived a batch later
    assert(streamed.exists(_.startsWith("[101,102,")),
      "cross-batch adjacency (101 -> 102) missing from the finalize")
  }

  test("appendIvfIndexStream across a reindex swap: batches land in the serving generation, ledger holds") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val base = emb.where(col("vec_id") % 3 === 0)
    val b1 = emb.where(col("vec_id") % 3 === 1)
      .as[(Long, Seq[Float])].collect().toSeq
    val b2 = emb.where(col("vec_id") % 3 === 2)
      .as[(Long, Seq[Float])].collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_swapp")
      .toFile.getPath
    Similarity.buildIvfIndex(base, dir)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = IndexIngest.appendIvfIndexStream(
      mem.toDF().toDF("vec_id", "embedding"), dir)
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      // swap mid-stream; retire the flat layout so batch 2 can ONLY
      // have landed in (and deduped against) the new generation
      Similarity.reindexIvf(spark, dir, nCentroids = 8)
      Similarity.vacuumIndex(spark, dir)
      mem.addData(b2 ++ b1.take(3): _*) // batch-1 replay ACROSS the swap
      q.processAllAvailable()
    } finally q.stop()
    val root = Similarity.resolveIndexRoot(spark, dir)
    assert(root.endsWith("/gen-0001"))
    val ids = spark.read.parquet(s"$root/assignments")
      .select(col("neighbor_id").as[Long]).collect().toSeq
    // everything present exactly once: base + b1 (carried through the
    // reindex) + b2 (appended post-swap); the replayed b1 rows were
    // refused by the NEW generation's ledger probe
    assert(ids.sorted == emb.select(col("vec_id").as[Long])
      .collect().toSeq.sorted)
  }

  test("mine: stream-job sink via YAML — epoch-drain candidates, finalize ≡ one-shot") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val src = emb.where(col("vec_id") % 10 === 0)
    val tgt = emb.where(col("vec_id") % 20 === 0).select(
        (col("vec_id") + 500000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x))
          .as("embedding"))
      .unionByName(emb.where(col("vec_id") % 10 === 3)
        .select((col("vec_id") + 700000L).as("vec_id"), col("embedding")))
    val dir = java.nio.file.Files.createTempDirectory("graft_mine_yaml")
      .toFile.getPath
    Similarity.buildIvfIndex(src, s"$dir/src")
    Similarity.buildIvfIndex(tgt, s"$dir/tgt")
    // the landing dir: epoch 1 lands half the source corpus, drain;
    // epoch 2 lands the rest PLUS a re-delivered epoch-1 file
    src.where(col("vec_id") < 200).write.parquet(s"$dir/landing")
    val yaml =
      s"""jobs:
         |  - name: mine_bitext
         |    stream:
         |      source:
         |        kind: parquet_stream
         |        options: {path: $dir/landing}
         |      mine:
         |        kind: bitext
         |        tgtIndexDir: $dir/tgt
         |        outDir: $dir/fwd
         |      availableNow: true
         |""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/streams.yaml"), yaml)
    val specs = graft.pipeline.ConfigLoader.parseStreamsYamlFile(
      s"$dir/streams.yaml")
    assert(specs.size == 1 && specs.head.availableNow)
    graft.pipeline.ConfigLoader.runStreamOnce(spark, specs.head)
    src.where(col("vec_id") >= 200).write.mode("append")
      .parquet(s"$dir/landing")
    src.where(col("vec_id") < 30).write.mode("append")
      .parquet(s"$dir/landing") // redelivery
    graft.pipeline.ConfigLoader.runStreamOnce(spark, specs.head)
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("src_id"), col("tgt_id"), col("cosine"), col("margin"))
      .collect().map(_.toString).toSet
    val streamed = snap(IndexIngest.finalizeBitextLedger(spark,
      s"$dir/fwd", s"$dir/src", tgt, k = 4, threshold = 1.3))
    val oneShot = snap(graft.llm.Bitext.mineBitextIndexed(spark,
      s"$dir/src", s"$dir/tgt", src, tgt, k = 4, threshold = 1.3))
    assert(streamed == oneShot && streamed.nonEmpty)
  }

  test("streaming IVF-PQ index append ≡ batch append on the same batches") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val base = emb.where(col("vec_id") % 3 === 0)
    val b1 = emb.where(col("vec_id") % 3 === 1)
      .as[(Long, Seq[Float])].collect().toSeq
    val b2 = emb.where(col("vec_id") % 3 === 2)
      .as[(Long, Seq[Float])].collect().toSeq
    val dirS = java.nio.file.Files.createTempDirectory("graft_ivfpq_s").toFile.getPath
    val dirB = java.nio.file.Files.createTempDirectory("graft_ivfpq_b2").toFile.getPath
    Similarity.buildIvfPqIndex(base, dirS)
    Similarity.buildIvfPqIndex(base, dirB)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = IndexIngest.appendIvfPqIndexStream(
      mem.toDF().toDF("vec_id", "embedding"), dirS)
    try {
      mem.addData(b1 :+ b1.head) // in-batch duplicate
      q.processAllAvailable()
      mem.addData(b2 :+ b1.head) // cross-batch replay
      q.processAllAvailable()
    } finally q.stop()
    Similarity.appendIvfPqIndex(spark, b1.toDF("vec_id", "embedding"), dirB)
    Similarity.appendIvfPqIndex(spark, b2.toDF("vec_id", "embedding"), dirB)
    def codes(dir: String) = spark.read.parquet(s"$dir/codes")
      .select(col("vec_id"), col("cluster"), col("codes"))
      .orderBy("vec_id").as[(Long, Int, Seq[Int])].collect().toSeq
    val streamed = codes(dirS)
    assert(streamed == codes(dirB))
    assert(streamed.map(_._1) == streamed.map(_._1).distinct)
  }

  test("streaming pack continuation ≡ one-shot packSequences over the union") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pack_stream")
      .toFile.getPath + "/assignment"
    def doc(id: Long, n: Int): (Long, String) =
      id -> Seq.fill(n)("w").mkString(" ")
    // seed: initial corpus packed batch-side (the ledger-present
    // convention); budget 10 so packs straddle batch boundaries
    val seed = Seq(doc(1, 4), doc(2, 3)).toDF("doc_id", "text")
    Packing.packSequences(seed, "doc_id",
        size(filter(split(trim(col("text")), "\\s+"), w => w =!= "")).cast("long"),
        budget = 10)
      .write.mode("overwrite").parquet(dir)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = IndexIngest.appendPackStream(
      mem.toDF().toDF("doc_id", "text"), dir, "doc_id", "text", budget = 10)
    try {
      // batch 1 carries a replay of seed doc 2 and an in-batch dup
      mem.addData(doc(3, 5), doc(4, 6), doc(2, 3), doc(3, 5))
      q.processAllAvailable()
      // batch 2 replays doc 3 from batch 1
      mem.addData(doc(5, 2), doc(3, 5))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(dir)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    // one-shot reference over the union of all unique docs
    val union = Seq(doc(1, 4), doc(2, 3), doc(3, 5), doc(4, 6), doc(5, 2))
      .toDF("doc_id", "text")
    val oneShot = Packing.packSequences(union, "doc_id",
        size(filter(split(trim(col("text")), "\\s+"), w => w =!= "")).cast("long"),
        budget = 10)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(streamed == oneShot)
    // replays never re-entered: each id exactly once
    assert(streamed.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L))
    // the partial pack kept filling across the stream boundary:
    // doc 3 (offset 7) starts inside pack 0
    assert(streamed.find(_._1 == 3L).get._4 == 0L)
  }

  test("epoch boundary: materialize_shards over a streamed assignment ≡ one-shot pack+shards") {
    val work = java.nio.file.Files.createTempDirectory("graft_pack_epoch")
      .toFile.getPath
    val dir = s"$work/assignment"
    def doc(id: Long, n: Int): (Long, String) =
      id -> Seq.fill(n)(s"w$id").mkString(" ")
    val nToks = size(filter(split(trim(col("text")), "\\s+"),
      w => w =!= "")).cast("long")
    // seed epoch + one streamed epoch
    val seed = Seq(doc(1, 4), doc(2, 3)).toDF("doc_id", "text")
    Packing.packSequences(seed, "doc_id", nToks, budget = 10)
      .write.mode("overwrite").parquet(dir)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = IndexIngest.appendPackStream(
      mem.toDF().toDF("doc_id", "text"), dir, "doc_id", "text", budget = 10)
    try {
      mem.addData(doc(3, 5), doc(4, 6), doc(5, 2))
      q.processAllAvailable()
    } finally q.stop()
    // the epoch boundary: certified shards from the assignment ledger
    val union = Seq(doc(1, 4), doc(2, 3), doc(3, 5), doc(4, 6), doc(5, 2))
      .toDF("doc_id", "text")
    Packing.materializeShardsFromAssignment(spark, dir, union,
      "doc_id", filter(split(trim(col("text")), "\\s+"), w => w =!= ""),
      s"$work/streamed", nShards = 2)
    // reference: one-shot materialize + shards over the union
    Packing.writeTrainingShards(
      Packing.packMaterialize(union, "doc_id",
        filter(split(trim(col("text")), "\\s+"), w => w =!= ""), budget = 10),
      "pack_id", s"$work/oneshot", nShards = 2)
    def snapshot(d: String) = spark.read.parquet(s"$d/data")
      .select(col("shard").cast("long"), col("pack_id"), col("n_docs"),
        col("n_tokens"), col("tokens"))
      .as[(Long, Long, Long, Long, Seq[String])].collect().sortBy(_._2).toSeq
    assert(snapshot(s"$work/streamed") == snapshot(s"$work/oneshot"))
    val manifests = Seq("streamed", "oneshot").map(v =>
      spark.read.parquet(s"$work/$v/manifest")
        .as[(Long, Long, Long, String, String)].collect().toSet)
    assert(manifests(0) == manifests(1))
    // handoff drift fails loudly: a store missing an assigned doc...
    val e1 = intercept[Exception] {
      Packing.materializeShardsFromAssignment(spark, dir,
        union.where(col("doc_id") =!= 3),
        "doc_id", filter(split(trim(col("text")), "\\s+"), w => w =!= ""),
        s"$work/broken1", nShards = 2)
    }
    assert(exceptionChain(e1).exists(m =>
      m.contains("missing from the document store")), exceptionChain(e1))
    // ...or a retokenized store (token counts drifted from assignment)
    val e2 = intercept[Exception] {
      Packing.materializeShardsFromAssignment(spark, dir,
        union.withColumn("text", concat(col("text"), lit(" extra"))),
        "doc_id", filter(split(trim(col("text")), "\\s+"), w => w =!= ""),
        s"$work/broken2", nShards = 2)
    }
    assert(exceptionChain(e2).exists(m => m.contains("drifted")),
      exceptionChain(e2))
  }

  test("epoch boundary SHUFFLED: streamed assignment + epochSalt ≡ one-shot; salts independent") {
    val work = java.nio.file.Files.createTempDirectory("graft_pack_shuf")
      .toFile.getPath
    def doc(id: Long, n: Int): (Long, String) =
      id -> Seq.fill(n)(s"w$id").mkString(" ")
    val nToks = size(filter(split(trim(col("text")), "\\s+"),
      w => w =!= "")).cast("long")
    val toks = filter(split(trim(col("text")), "\\s+"), w => w =!= "")
    val seed = Seq(doc(1, 4), doc(2, 3)).toDF("doc_id", "text")
    val union = Seq(doc(1, 4), doc(2, 3), doc(3, 5), doc(4, 6), doc(5, 2))
      .toDF("doc_id", "text")
    // streamed ledger: seed + one real micro-batch
    Packing.packSequences(seed, "doc_id", nToks, budget = 10)
      .write.mode("overwrite").parquet(s"$work/streamed_assign")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = IndexIngest.appendPackStream(
      mem.toDF().toDF("doc_id", "text"), s"$work/streamed_assign",
      "doc_id", "text", budget = 10)
    try {
      mem.addData(doc(3, 5), doc(4, 6), doc(5, 2))
      q.processAllAvailable()
    } finally q.stop()
    // one-shot ledger over the union
    Packing.packSequences(union, "doc_id", nToks, budget = 10)
      .write.mode("overwrite").parquet(s"$work/oneshot_assign")
    // shuffled materialize from EACH ledger with the same epoch salt —
    // the shuffled path consumes only membership + token counts, so
    // streamed ≡ one-shot byte-for-byte
    Packing.materializeShardsFromAssignment(spark, s"$work/streamed_assign",
      union, "doc_id", toks, s"$work/streamed", nShards = 2,
      epochSalt = Some("e1"), epochBudget = 10)
    Packing.materializeShardsFromAssignment(spark, s"$work/oneshot_assign",
      union, "doc_id", toks, s"$work/oneshot", nShards = 2,
      epochSalt = Some("e1"), epochBudget = 10)
    def snapshot(d: String) = spark.read.parquet(s"$d/data")
      .select(col("shard").cast("long"), col("pack_id"), col("n_docs"),
        col("n_tokens"), col("tokens"))
      .as[(Long, Long, Long, Long, Seq[String])].collect().sortBy(_._2).toSeq
    assert(snapshot(s"$work/streamed") == snapshot(s"$work/oneshot"))
    // the salt actually reorders: epoch-2 shards pack a different
    // stream than epoch-1 (token totals conserved), and re-running the
    // same salt reproduces epoch 1 exactly
    Packing.materializeShardsFromAssignment(spark, s"$work/streamed_assign",
      union, "doc_id", toks, s"$work/epoch2", nShards = 2,
      epochSalt = Some("e2"), epochBudget = 10)
    val e1s = snapshot(s"$work/streamed"); val e2s = snapshot(s"$work/epoch2")
    assert(e1s.map(_._5) != e2s.map(_._5),
      "different epoch salts must draw different pack orders")
    assert(e1s.map(_._4).sum == e2s.map(_._4).sum,
      "token totals must be conserved across epoch reshuffles")
    Packing.materializeShardsFromAssignment(spark, s"$work/streamed_assign",
      union, "doc_id", toks, s"$work/epoch1b", nShards = 2,
      epochSalt = Some("e1"), epochBudget = 10)
    assert(snapshot(s"$work/epoch1b") == e1s)
    // epochSalt without a budget fails loudly
    val e = intercept[IllegalArgumentException] {
      Packing.materializeShardsFromAssignment(spark, s"$work/streamed_assign",
        union, "doc_id", toks, s"$work/bad", nShards = 2,
        epochSalt = Some("e3"))
    }
    assert(e.getMessage.contains("epochBudget"))
  }

  test("compactCuratedPack: ledgers fold row-identically; post-compaction dedup decisions unchanged") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft_pack_compact")
      .toFile.getPath
    def doc(id: Long, n: Int): (Long, String) =
      id -> Seq.fill(n)(s"w$id").mkString(" ")
    def rep(tok: String, n: Int): String = Seq.fill(n)(tok).mkString(" ")
    val dir = s"$work/led"
    val seed = Seq(doc(1, 8), doc(2, 6), 5L -> rep("ndtok", 50), doc(6, 9))
    IndexIngest.seedCuratedPack(seed.toDF("doc_id", "text"), dir,
      "doc_id", "text", budget = 10, nearDupThreshold = Some(0.7))
    implicit val sqlCtx = spark.sqlContext
    def drain(rows: Seq[(Long, String)]): Unit = {
      val mem = MemoryStream[(Long, String)]
      val q = IndexIngest.appendCuratedPackStream(
        mem.toDF().toDF("doc_id", "text"), dir, "doc_id", "text",
        budget = 10, nearDupThreshold = Some(0.7))
      try { mem.addData(rows: _*); q.processAllAvailable() }
      finally q.stop()
    }
    drain(Seq(doc(40, 6), doc(41, 7)))
    drain(Seq(doc(50, 6)))
    // a retraction populates the fourth ledger (the takedown queue)
    IndexIngest.retractFromCuratedPack(spark, dir,
      Seq(2L).toDF("doc_id"), "doc_id")
    def snap(sub: String): Set[String] =
      spark.read.parquet(s"$dir/$sub").collect().map(_.toString).toSet
    val pre = Seq("assign", "hashes", "sigs", "retracted")
      .map(s => s -> snap(s)).toMap
    val audit = IndexIngest.compactCuratedPack(spark, dir, shards = 1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // every ledger reported, folded to one file, rows preserved
    assert(audit.keySet == Set("assign", "hashes", "sigs", "retracted"))
    audit.foreach { case (sub, (before, after, rows)) =>
      assert(after == 1L && after <= before, s"$sub: $before -> $after")
      assert(rows == pre(sub).size, s"$sub rows drifted")
    }
    // content row-identical through the fold
    Seq("assign", "hashes", "sigs", "retracted").foreach { sub =>
      assert(snap(sub) == pre(sub), s"$sub content changed")
    }
    // the restarted stream still dedups against the FOLDED ledgers:
    // an exact re-text of 6, a near-dup of the ndtok clique, and a
    // replayed id must all drop; an organic doc lands
    drain(Seq(doc(80, 5), 86L -> seed.find(_._1 == 6L).get._2,
      85L -> rep("ndtok", 52), doc(40, 6)))
    val ids = spark.read.parquet(s"$dir/assign").select("doc_id")
      .as[Long].collect().toSet
    assert(ids.contains(80L) && !ids.contains(86L) && !ids.contains(85L))
    assert(ids.count(_ == 40L) <= 1)
  }

  test("compactLedgerDir: flat answer ledgers coalesce; bucketed transitions ledgers fold per partition") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft_ledger_dir")
      .toFile.getPath
    // flat ledger: two append batches → two file sets → one file
    val flat = s"$work/answers"
    Seq((1L, 10L), (2L, 20L)).toDF("qid", "doc_id")
      .coalesce(2).write.mode("append").parquet(flat)
    Seq((3L, 30L)).toDF("qid", "doc_id")
      .coalesce(1).write.mode("append").parquet(flat)
    val preFlat = spark.read.parquet(flat).collect()
      .map(_.toString).toSet
    val a1 = IndexIngest.compactLedgerDir(spark, flat, shards = 1).head()
    assert(a1.getAs[String]("partitioned_by") == "")
    assert(a1.getAs[Long]("files_after") == 1L
      && a1.getAs[Long]("files_before") >= 2L, a1.toString)
    assert(a1.getAs[Long]("rows") == 3L)
    assert(spark.read.parquet(flat).collect().map(_.toString).toSet
      == preFlat)
    // bucketed ledger: partition dirs preserved, folded per partition
    val part = s"$work/trans"
    def land(rows: Seq[(Long, Long, Long)]): Unit =
      rows.toDF("user_id", "event_id", "__bucket").repartition(2)
        .write.partitionBy("__bucket").mode("append").parquet(part)
    land(Seq((1L, 5L, 0L), (2L, 15L, 1L)))
    land(Seq((3L, 6L, 0L), (4L, 16L, 1L)))
    val prePart = spark.read.parquet(part)
      .select("user_id", "event_id", "__bucket").collect()
      .map(_.toString).toSet
    val a2 = IndexIngest.compactLedgerDir(spark, part).head()
    assert(a2.getAs[String]("partitioned_by") == "__bucket")
    assert(a2.getAs[Long]("files_after") < a2.getAs[Long]("files_before"),
      a2.toString)
    val dirs = new java.io.File(part).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("__bucket=0", "__bucket=1"), dirs.toString)
    assert(spark.read.parquet(part)
      .select("user_id", "event_id", "__bucket").collect()
      .map(_.toString).toSet == prePart)
    // a pruned read still prunes after the fold (one partition dir)
    assert(spark.read.parquet(part).where(col("__bucket") === 0L)
      .count() == 2L)
    intercept[IllegalArgumentException](
      IndexIngest.compactLedgerDir(spark, s"$work/nope"))
  }

  test("streamed curation ≡ batch funnel: curate stages + exact/near dedup ledgers inside the pack stream") {
    val work = java.nio.file.Files.createTempDirectory("graft_cur_stream")
      .toFile.getPath
    def doc(id: Long, n: Int): (Long, String) =
      id -> Seq.fill(n)(s"w$id").mkString(" ")
    def rep(tok: String, n: Int): String = Seq.fill(n)(tok).mkString(" ")
    // seed: organic docs + a near-dup clique canonical (5) + a doc (6)
    // whose text later batches duplicate exactly + a too-short doc (7)
    val seed = Seq(doc(1, 8), doc(2, 6), doc(4, 7),
      5L -> rep("ndtok", 50), doc(6, 9), doc(7, 3))
    // batch 1: organic + clique member (45) + exact copy of 6's text
    // (46) + a too-short doc (47) + an IN-BATCH near-dup pair (48, 49)
    val b1 = Seq(doc(40, 6), 45L -> rep("ndtok", 51),
      46L -> seed.find(_._1 == 6L).get._2, doc(47, 2),
      48L -> rep("btok", 50), 49L -> rep("btok", 51))
    // batch 2: organic + clique member (85 — near-dups the LEDGER, not
    // this batch) + another exact copy of 6 (86) + REPLAYED b1 rows
    val b2Unique = Seq(doc(80, 5), 85L -> rep("ndtok", 52),
      86L -> seed.find(_._1 == 6L).get._2)
    val b2 = b2Unique ++ b1.take(2)
    // curation THROUGH the config registry (counting a parallel
    // reimplementation would bind nothing)
    val curate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      graft.pipeline.ConfigLoader.transformKinds("quality_filter")(Map(
        "column" -> "text", "minWords" -> "5", "minMeanWordLen" -> "0",
        "maxMeanWordLen" -> "1000", "maxPunctRatio" -> "1.0"))
    val dir = s"$work/led"
    IndexIngest.seedCuratedPack(seed.toDF("doc_id", "text"), dir,
      "doc_id", "text", budget = 10, curate = curate,
      nearDupThreshold = Some(0.7))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = IndexIngest.appendCuratedPackStream(
      mem.toDF().toDF("doc_id", "text"), dir, "doc_id", "text",
      budget = 10, curate = curate, nearDupThreshold = Some(0.7))
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    // batch twin: the one-shot funnel over the union of unique docs
    val union = (seed ++ b1 ++ b2Unique).toDF("doc_id", "text")
    val gated = graft.llm.Dedup.exactDedup(curate(union), "doc_id", "text")
      .localCheckpoint(true)
    val losers = graft.llm.Dedup.nearDupClusters(
        graft.llm.Dedup.minhashNearDups(gated, "doc_id", "text", 0.7))
      .where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("__l"))
    val survivors = gated.join(losers, col("doc_id") === col("__l"),
      "left_anti")
    val nToks = size(filter(split(trim(col("text")), "\\s+"),
      w => w =!= "")).cast("long")
    val ref = Packing.packSequences(survivors, "doc_id", nToks, budget = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    val streamed = spark.read.parquet(s"$dir/assign")
      .select(col("doc_id"), col("n_tokens"), col("token_offset"),
        col("pack_id"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == ref,
      s"streamed-curated assignment diverged from the batch funnel:\n" +
        s"streamed-only: ${streamed -- ref}\nbatch-only: ${ref -- streamed}")
    // the dedup decisions the fixture engineered, stated explicitly
    val ids = streamed.map(_._1)
    assert(!ids.contains(45L) && !ids.contains(85L),
      "clique near-dups must drop against the signature ledger across batches")
    assert(!ids.contains(46L) && !ids.contains(86L),
      "exact re-texts must drop against the content-hash ledger")
    assert(ids.contains(48L) && !ids.contains(49L),
      "in-batch near-dup pair must keep its min-id survivor")
    assert(!ids.contains(7L) && !ids.contains(47L),
      "the curation gate must drop short docs in seed and stream alike")
    // ledgers hold exactly the accepted corpus state
    val sigIds = spark.read.parquet(s"$dir/sigs").select(col("doc_id"))
      .as[Long].collect().toSet
    assert(sigIds == ids, s"sig ledger drifted: $sigIds vs $ids")
    assert(spark.read.parquet(s"$dir/hashes").distinct().count() ==
      ids.size.toLong)
    // a fully-duplicate resubmission batch is a no-op (ledger
    // idempotence across ALL three ledgers)
    val mem2 = MemoryStream[(Long, String)]
    val q2 = IndexIngest.appendCuratedPackStream(
      mem2.toDF().toDF("doc_id", "text"), dir, "doc_id", "text",
      budget = 10, curate = curate, nearDupThreshold = Some(0.7))
    try {
      mem2.addData(Seq(85L -> rep("ndtok", 52),
        86L -> seed.find(_._1 == 6L).get._2): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val after = spark.read.parquet(s"$dir/assign")
      .select(col("doc_id"), col("n_tokens"), col("token_offset"),
        col("pack_id"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(after == streamed, "resubmitted near/exact dups must not re-pack")
  }

  test("ce_apply composes into the pack stream: ledgered CCNet filter per micro-batch") {
    val work = java.nio.file.Files.createTempDirectory("graft_ce_stream")
      .toFile.getPath
    // reference LM built ONCE (the deployment shape) — in-vocab text
    // prices strictly below the sentinel unseen price, so an all-OOV
    // junk doc scores exactly the unseen price and any cutoff between
    // the two separates them deterministically
    val ref = Seq((100L, "the cat sat on the mat and the dog sat too"))
      .toDF("doc_id", "text")
    graft.llm.TextAnalysis.cePrices(ref)
      .write.mode("overwrite").parquet(s"$work/prices")
    val fluent = Seq(1L -> "the cat sat on the mat",
      2L -> "the dog sat on the mat", 40L -> "the cat and the dog sat",
      80L -> "the mat and the cat sat")
    val junk = Seq(7L -> "zzz qqq xxx www vvv uuu",
      47L -> "jjj kkk lll mmm nnn ooo")
    val prices = spark.read.parquet(s"$work/prices")
    val cut = graft.llm.TextAnalysis.crossEntropyAgainstPrices(
        fluent.toDF("doc_id", "text"), prices, "doc_id", "text")
      .agg(max(round(col("ce_against"), 4))).as[Double].head()
    val curate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      graft.pipeline.ConfigLoader.transformKinds("ce_apply")(Map(
        "pricesDir" -> s"$work/prices", "idCol" -> "doc_id",
        "textCol" -> "text", "maxCe" -> cut.toString))
    val dir = s"$work/led"
    IndexIngest.seedCuratedPack(
      Seq(fluent.head, junk.head).toDF("doc_id", "text"), dir,
      "doc_id", "text", budget = 12, curate = curate)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = IndexIngest.appendCuratedPackStream(
      mem.toDF().toDF("doc_id", "text"), dir, "doc_id", "text",
      budget = 12, curate = curate)
    try {
      mem.addData(fluent(1), fluent(2), junk(1))
      q.processAllAvailable()
      mem.addData(fluent(3)); q.processAllAvailable()
    } finally q.stop()
    val ids = spark.read.parquet(s"$dir/assign")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 40L, 80L),
      s"junk must drop against the price ledger in seed and stream alike: $ids")
    // streamed-curated assignment ≡ the one-shot batch twin
    val batchDir = s"$work/batch"
    IndexIngest.seedCuratedPack(
      (fluent ++ junk).toDF("doc_id", "text"), batchDir,
      "doc_id", "text", budget = 12, curate = curate)
    def rows(d: String) = spark.read.parquet(s"$d/assign")
      .select(col("doc_id"), col("n_tokens"), col("token_offset"),
        col("pack_id")).as[(Long, Long, Long, Long)].collect().toSet
    assert(rows(dir) == rows(batchDir),
      "streamed ce_apply curation diverged from the one-shot seed")
  }

  test("streamed mix: a persisted rates ledger resamples inside the pack stream ≡ batch") {
    // the DoReMi two-phase across the batch/stream boundary: a PROXY
    // corpus measures the weights once (excess_weights sink), then the
    // CONTINUOUS chain applies them per micro-batch through the
    // stateless mix_apply kind — the global in-flight measurement
    // (mix_excess) could never run inside a stream
    val work = java.nio.file.Files.createTempDirectory("graft_mix_stream")
      .toFile.getPath
    import spark.implicits._
    val proxy = ((1001L to 1030L).map(i => (i, "a", "x y " * 20 + "x y")) ++
      (1031L to 1060L).map(i => (i, "b",
        Seq.tabulate(40)(j => ('a' + (i.toInt * 13 + j * 7) % 26).toChar.toString)
          .mkString(" "))))
      .toDF("doc_id", "domain", "text")
    graft.sinks.Sinks.runChain(proxy, Seq(
      graft.pipeline.ConfigLoader.loadKinds("excess_weights")(Map(
        "idCol" -> "doc_id", "textCol" -> "text", "domainCol" -> "domain",
        "steps" -> "2", "dir" -> s"$work/rates"))))
    val rates = spark.read.parquet(s"$work/rates")
      .select("domain", "rate").as[(String, Double)].collect().toMap
    assert(rates("b") == 1.0 && rates("a") < 1.0,
      s"high-loss domain must saturate at rate 1.0: $rates")
    // production corpus: fresh ids, both domains, one too-short doc
    // per-id distinct texts: identical texts would (correctly) fall to
    // the stream's content-hash ledger, which the batch twin here
    // deliberately omits — exact dedup has its own equivalence case
    def prod(id: Long, dom: String): (Long, String, String) =
      (id, dom, if (dom == "a") "u v " * 10 + s"u$id v$id"
                else Seq.tabulate(24)(j =>
                  ('a' + (id.toInt * 11 + j * 5) % 26).toChar.toString)
                  .mkString(" "))
    val seed = (1L to 8L).map(prod(_, "a")) ++ (9L to 12L).map(prod(_, "b"))
    val b1 = (21L to 28L).map(prod(_, "a")) ++ (29L to 32L).map(prod(_, "b")) :+
      ((33L, "a", "too short"))
    val curate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => graft.pipeline.ConfigLoader.transformKinds("mix_apply")(Map(
        "ratesDir" -> s"$work/rates", "domainCol" -> "domain",
        "keyCol" -> "doc_id"))(
        graft.pipeline.ConfigLoader.transformKinds("quality_filter")(Map(
          "column" -> "text", "minWords" -> "5", "minMeanWordLen" -> "0",
          "maxMeanWordLen" -> "1000", "maxPunctRatio" -> "1.0"))(df))
    val dir = s"$work/led"
    IndexIngest.seedCuratedPack(seed.toDF("doc_id", "domain", "text"), dir,
      "doc_id", "text", budget = 10, curate = curate)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val q = IndexIngest.appendCuratedPackStream(
      mem.toDF().toDF("doc_id", "domain", "text"), dir, "doc_id", "text",
      budget = 10, curate = curate)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    // batch twin: one-shot curate + pack over the union
    val union = (seed ++ b1).toDF("doc_id", "domain", "text")
    val nToks = size(filter(split(trim(col("text")), "\\s+"),
      w => w =!= "")).cast("long")
    val ref = Packing.packSequences(curate(union), "doc_id", nToks,
        budget = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    val streamed = spark.read.parquet(s"$dir/assign")
      .select(col("doc_id"), col("n_tokens"), col("token_offset"),
        col("pack_id"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == ref,
      s"streamed mix diverged from the batch twin:\n" +
        s"streamed-only: ${streamed -- ref}\nbatch-only: ${ref -- streamed}")
    val ids = streamed.map(_._1)
    assert((9L to 12L).toSet ++ (29L to 32L).toSet subsetOf ids,
      "rate-1.0 domain must keep every doc")
    assert(((1L to 8L) ++ (21L to 28L)).exists(id => !ids.contains(id)),
      "the down-rated domain must actually thin")
    assert(!ids.contains(33L), "quality gate must compose ahead of the mix")
  }

  private def exceptionChain(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x =>
      Option(x.getMessage).toSeq ++ exceptionChain(x.getCause))

  test("pack stream survives restart: a NEW query on the same dir continues cleanly") {
    // the crash-recovery story: foreachBatch is at-least-once, and on
    // restart the new query's first batch may replay rows the dead
    // query already appended — the index-as-ledger anti-join must make
    // that harmless with NO checkpoint state at all
    val dir = java.nio.file.Files.createTempDirectory("graft_pack_restart")
      .toFile.getPath + "/assignment"
    def doc(id: Long, n: Int): (Long, String) =
      id -> Seq.fill(n)("w").mkString(" ")
    Packing.packSequences(Seq(doc(1, 4)).toDF("doc_id", "text"), "doc_id",
        size(filter(split(trim(col("text")), "\\s+"), w => w =!= "")).cast("long"),
        budget = 10)
      .write.mode("overwrite").parquet(dir)
    implicit val sqlCtx = spark.sqlContext
    val mem1 = MemoryStream[(Long, String)]
    val q1 = IndexIngest.appendPackStream(
      mem1.toDF().toDF("doc_id", "text"), dir, "doc_id", "text", budget = 10)
    try {
      mem1.addData(doc(2, 3), doc(3, 5))
      q1.processAllAvailable()
    } finally q1.stop() // "crash"
    // restart: fresh query, fresh source; first batch replays docs 2-3
    val mem2 = MemoryStream[(Long, String)]
    val q2 = IndexIngest.appendPackStream(
      mem2.toDF().toDF("doc_id", "text"), dir, "doc_id", "text", budget = 10)
    try {
      mem2.addData(doc(2, 3), doc(3, 5), doc(4, 6))
      q2.processAllAvailable()
    } finally q2.stop()
    val streamed = spark.read.parquet(dir)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    val oneShot = Packing.packSequences(
        Seq(doc(1, 4), doc(2, 3), doc(3, 5), doc(4, 6)).toDF("doc_id", "text"),
        "doc_id",
        size(filter(split(trim(col("text")), "\\s+"), w => w =!= "")).cast("long"),
        budget = 10)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(streamed == oneShot)
  }

  test("continuous trainer ingest end to end: WARC stream -> extract -> filter -> dedup ledger -> pack continuation") {
    // the streaming analogue of curate_to_shards: raw crawl segments
    // land, main text extracts, URLs gate, recrawled content drops via
    // the corpus ledger, and survivors CONTINUE the global pack
    // assignment — all per micro-batch, no stream state anywhere
    val root = java.nio.file.Files.createTempDirectory("graft_stream_e2e")
      .toFile.getPath
    val landing = s"$root/landing"
    val ledger = s"$root/ledger"
    val packs = s"$root/assignment"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landing))
    def rec(id: Long, host: String, body: String): String = {
      val html = s"<html><body><nav><a href='/'>Home</a> <a href='/a'>A</a> " +
        s"<a href='/b'>B</a></nav><h1>Overview</h1><p>$body</p>" +
        "<footer>(c) x</footer></body></html>"
      val http = "HTTP/1.1 200 OK\nContent-Type: text/html"
      s"WARC/1.0\nWARC-Type: response\nWARC-Target-URI: https://$host/doc/$id\n" +
        s"WARC-Date: 2026-05-05T00:00:00Z\n" +
        s"Content-Length: ${http.length + 2 + html.length}\n\n$http\n\n$html"
    }
    def writeSeg(name: String, recs: Seq[String]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$landing/$name"),
        (recs.mkString("\n") + "\n").getBytes("UTF-8"))
    val p1 = "segment one page with plenty of ordinary prose words here today."
    val p2 = "another page holding plenty of distinct prose words in it now."
    val p3 = "a third page with its own plenty of fresh prose words tonight."
    // seed empty ledger + empty pack assignment (ledger-present rule)
    Seq.empty[(Long, String)].toDF("doc_id", "text")
      .write.mode("overwrite").parquet(ledger)
    spark.read.parquet(ledger)
      .select(col("doc_id"), lit(0L).as("n_tokens"),
        lit(0L).as("token_offset"), lit(0L).as("pack_id"))
      .write.mode("overwrite").parquet(packs)
    val curated = graft.sources.Sources.readWarcResponsesStream(spark, landing)
      .where(col("http_status") === 200 && col("content_type") === "text/html")
      .select(
        regexp_extract(col("url"), "doc/([0-9]+)", 1).cast("long").as("doc_id"),
        col("url"),
        graft.functions.HtmlText.extractCol(col("html")).as("text"))
      .where(graft.llm.UrlOps.urlOk(col("url"), Seq("bad.example")))
    val q = curated.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val sess = batch.sparkSession
        // content-level dedup against everything already ingested
        val fresh = graft.llm.Dedup.exactDedupAgainst(batch,
            sess.read.parquet(ledger), "doc_id", "text")
          .localCheckpoint(true)
        fresh.select("doc_id", "text").unionByName(
            sess.read.parquet(ledger).localCheckpoint(true))
          .write.mode("overwrite").parquet(ledger)
        // survivors continue the global pack assignment
        val existing = sess.read.parquet(packs)
        val start = graft.llm.Packing.assignedTokenTotal(existing)
        graft.llm.Packing.packSequencesAppend(
            fresh.select("doc_id", "text"), "doc_id",
            size(filter(split(trim(col("text")), "\\s+"), w => w =!= ""))
              .cast("long"),
            budget = 16, startOffset = start)
          .localCheckpoint(true)
          .write.mode("append").parquet(packs)
        ()
    }.start()
    try {
      writeSeg("seg1.warc", Seq(
        rec(1, "good.example", p1),
        rec(2, "bad.example", p2)))     // domain-blocked
      q.processAllAvailable()
      writeSeg("seg2.warc", Seq(
        rec(3, "good.example", p1),     // recrawl of doc 1's content
        rec(4, "good.example", p2),
        rec(5, "good.example", p3)))
      q.processAllAvailable()
    } finally q.stop()
    val asg = spark.read.parquet(packs).where(col("n_tokens") > 0)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    // survivors: 1 (first crawl), 4, 5 — 2 URL-blocked, 3 content-dup
    assert(asg.map(_._1) == Seq(1L, 4L, 5L))
    // the token stream is CONTINUOUS across micro-batches: offsets
    // tile with no gaps, doc 4 continues where doc 1's batch stopped
    assert(asg.map(_._3) == asg.map(_._2).scanLeft(0L)(_ + _).init)
  }

  test("web front-end filters compose into a stream: url + c4 at ingest time") {
    // urlOk (literal lists) and the C4 rules are pure column
    // expressions, so the web-curation front end runs unchanged on a
    // stream — documents are kept or dropped at ingest, no state
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val filtered = mem.toDF().toDF("doc_id", "url", "page")
      .where(graft.llm.UrlOps.urlOk(col("url"),
        Seq("bad.example"), Seq("casino")))
      .withColumn("cleaned", graft.llm.TextAnalysis.c4CleanLines(col("page")))
      .where(graft.llm.TextAnalysis.c4PageOk(col("page"), col("cleaned"),
        minSentences = 1))
    assert(filtered.isStreaming)
    val q = filtered.writeStream
      .format("memory").queryName("web_stream_test").outputMode("append")
      .start()
    try {
      val goodPage = "a perfectly fine sentence with enough words here."
      mem.addData(
        (1L, "https://good.example/a", goodPage),
        (2L, "https://bad.example/b", goodPage),      // domain-blocked
        (3L, "https://good.example/casino", goodPage), // keyword-blocked
        (4L, "https://good.example/d", "code { here.")) // page rule
      q.processAllAvailable()
      assert(spark.table("web_stream_test").select("doc_id")
        .as[Long].collect().toSeq == Seq(1L))
      // the surviving row carries the cleaned text, same as batch
      assert(spark.table("web_stream_test").select("cleaned")
        .as[String].collect().head == goodPage)
    } finally q.stop()
  }

  test("ledger compaction: fewer files, identical content, stream continues cleanly") {
    val work = java.nio.file.Files.createTempDirectory("graft_compact")
      .toFile.getPath
    val dir = s"$work/led"
    def doc(id: Long, n: Int): (Long, String) =
      id -> Seq.fill(n)(s"w$id").mkString(" ")
    def rep(tok: String, n: Int): String = Seq.fill(n)(tok).mkString(" ")
    IndexIngest.seedCuratedPack(
      Seq(doc(1, 8), doc(2, 6), 5L -> rep("ndtok", 50)).toDF("doc_id", "text"),
      dir, "doc_id", "text", budget = 10, nearDupThreshold = Some(0.7))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = IndexIngest.appendCuratedPackStream(
      mem.toDF().toDF("doc_id", "text"), dir, "doc_id", "text",
      budget = 10, nearDupThreshold = Some(0.7))
    try {
      mem.addData(doc(10, 7), doc(11, 9)); q.processAllAvailable()
      mem.addData(doc(20, 6), 21L -> rep("ndtok", 51)); q.processAllAvailable()
    } finally q.stop()
    def ledger(sub: String) = spark.read.parquet(s"$dir/$sub")
    def rows(sub: String) = {
      val df = ledger(sub)
      df.select(df.columns.map(c => col(c).cast("string")): _*)
        .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    }
    def files(sub: String) = new java.io.File(s"$dir/$sub").list()
      .count(_.startsWith("part-"))
    val before = Seq("assign", "hashes", "sigs").map(s => s -> rows(s)).toMap
    val filesBefore = Seq("assign", "hashes", "sigs").map(files)
    // seed write + 2 appended batches -> multiple files per ledger
    assert(filesBefore.forall(_ >= 3), s"fixture too small: $filesBefore")
    val report = IndexIngest.compactLedgers(spark, dir)
    assert(report.keySet == Set("assign", "hashes", "sigs"))
    Seq("assign", "hashes", "sigs").foreach { s =>
      assert(files(s) == 1, s"$s should compact to one file, got ${files(s)}")
      assert(rows(s) == before(s), s"$s content changed under compaction")
      assert(report(s)._1 >= 3 && report(s)._2 == 1, s"report off: $report")
    }
    // the stream continues against the compacted ledgers: dups still
    // drop, a novel doc extends the assignment with a carried offset
    val offsetBefore = Packing.assignedTokenTotal(ledger("assign"))
    val mem2 = MemoryStream[(Long, String)]
    val q2 = IndexIngest.appendCuratedPackStream(
      mem2.toDF().toDF("doc_id", "text"), dir, "doc_id", "text",
      budget = 10, nearDupThreshold = Some(0.7))
    try {
      mem2.addData(doc(20, 6), 22L -> rep("ndtok", 52), doc(30, 4))
      q2.processAllAvailable()
    } finally q2.stop()
    val after = ledger("assign").select("doc_id", "token_offset")
      .as[(Long, Long)].collect().toMap
    assert(!after.contains(22L), "near-dup must still drop post-compaction")
    assert(after.keySet.size == before("assign").size + 1 &&
        after.contains(30L),
      "exactly the novel doc must append")
    assert(after(30L) == offsetBefore,
      "appended doc must carry the pre-compaction token offset")
    // absent subdir: compacting a dir without sigs reports only what exists
    val dir2 = s"$work/led2"
    IndexIngest.seedCuratedPack(Seq(doc(1, 8)).toDF("doc_id", "text"),
      dir2, "doc_id", "text", budget = 10)
    assert(IndexIngest.compactLedgers(spark, dir2).keySet ==
      Set("assign", "hashes"))
  }

  test("retraction scrub: offsets hold, tombstones refuse re-admission, forget re-admits") {
    val work = java.nio.file.Files.createTempDirectory("graft_retract")
      .toFile.getPath
    val dir = s"$work/led"
    def doc(id: Long, n: Int): (Long, String) =
      id -> Seq.fill(n)(s"w$id").mkString(" ")
    def rep(tok: String, n: Int): String = Seq.fill(n)(tok).mkString(" ")
    val seed = Seq(doc(1, 8), doc(2, 6), doc(3, 7), 5L -> rep("ndtok", 50),
      doc(6, 9))
    IndexIngest.seedCuratedPack(seed.toDF("doc_id", "text"), dir,
      "doc_id", "text", budget = 10, nearDupThreshold = Some(0.7))
    def assign = spark.read.parquet(s"$dir/assign")
    val beforeRows = assign
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val totalBefore = Packing.assignedTokenTotal(assign)
    // takedown list includes an id (99) that was never ingested
    val report = IndexIngest.retractFromCuratedPack(spark, dir,
        Seq(2L, 5L, 99L).toDF("doc_id"), "doc_id")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(report == Map("assign" -> ((5L, 2L, 3L))),
      s"scrub report off (and no-forget must not touch hashes/sigs): $report")
    val afterRows = assign
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(afterRows.keySet == Set(1L, 3L, 6L))
    // scrub: every surviving row byte-identical (holes, nothing moves)
    afterRows.foreach { case (id, r) => assert(r == beforeRows(id),
      s"scrub moved doc $id: $r vs ${beforeRows(id)}") }
    // tombstones: an exact re-text (fresh id) and a near-copy of the
    // retracted docs must be REFUSED re-admission by the normal stream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = IndexIngest.appendCuratedPackStream(
      mem.toDF().toDF("doc_id", "text"), dir, "doc_id", "text",
      budget = 10, nearDupThreshold = Some(0.7))
    try {
      mem.addData(42L -> seed.find(_._1 == 2L).get._2, // exact re-text of 2
        43L -> rep("ndtok", 51),                       // near-copy of 5
        doc(44, 4))                                    // novel
      q.processAllAvailable()
    } finally q.stop()
    val ids1 = assign.select("doc_id").as[Long].collect().toSet
    assert(ids1 == Set(1L, 3L, 6L, 44L),
      s"tombstones must refuse 42/43, novel 44 must land: $ids1")
    assert(assign.where(col("doc_id") === 44L).select("token_offset")
        .as[Long].head() == totalBefore,
      "scrub must not move the stream's carried offset")
    // forget: erase the retracted docs' hash/sig tombstone rows too
    val nHashes = spark.read.parquet(s"$dir/hashes").count()
    val report2 = IndexIngest.retractFromCuratedPack(spark, dir,
        Seq(2L, 5L).toDF("doc_id"), "doc_id",
        forgetDocs = Some(seed.toDF("doc_id", "text")))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(report2("assign") == ((4L, 0L, 4L)), s"second scrub: $report2")
    assert(report2("hashes") == ((nHashes, 2L, nHashes - 2)) &&
        report2("sigs")._2 == 2L, s"forget must erase 2 rows each: $report2")
    val mem2 = MemoryStream[(Long, String)]
    val q2 = IndexIngest.appendCuratedPackStream(
      mem2.toDF().toDF("doc_id", "text"), dir, "doc_id", "text",
      budget = 10, nearDupThreshold = Some(0.7))
    try {
      mem2.addData(52L -> seed.find(_._1 == 2L).get._2,
        53L -> rep("ndtok", 51))
      q2.processAllAvailable()
    } finally q2.stop()
    val ids2 = assign.select("doc_id").as[Long].collect().toSet
    assert(ids2 == Set(1L, 3L, 6L, 44L, 52L, 53L),
      s"after forget the content must re-admit: $ids2")
  }

  test("retraction repack: ledger identical to never-ingested; budget required") {
    val work = java.nio.file.Files.createTempDirectory("graft_retract_rp")
      .toFile.getPath
    def doc(id: Long, n: Int): (Long, String) =
      id -> Seq.fill(n)(s"w$id").mkString(" ")
    val all = Seq(doc(1, 8), doc(2, 6), doc(3, 7), doc(5, 5), doc(6, 9))
    IndexIngest.seedCuratedPack(all.toDF("doc_id", "text"), s"$work/a",
      "doc_id", "text", budget = 10)
    intercept[IllegalArgumentException] {
      IndexIngest.retractFromCuratedPack(spark, s"$work/a",
        Seq(2L).toDF("doc_id"), "doc_id", repack = true)
    }
    IndexIngest.retractFromCuratedPack(spark, s"$work/a",
      Seq(2L, 5L).toDF("doc_id"), "doc_id", repack = true, budget = 10)
    IndexIngest.seedCuratedPack(
      all.filterNot(d => d._1 == 2L || d._1 == 5L).toDF("doc_id", "text"),
      s"$work/b", "doc_id", "text", budget = 10)
    def rows(p: String) = spark.read.parquet(p)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(rows(s"$work/a/assign") == rows(s"$work/b/assign"),
      "repack must be bit-identical to never having ingested the docs")
    // by design the hash tombstones REMAIN under repack-without-forget
    assert(spark.read.parquet(s"$work/a/hashes").count() == 5 &&
      spark.read.parquet(s"$work/b/hashes").count() == 3)
  }

  test("incremental shard refresh rewrites only affected shards, drains queue, rejects repack") {
    val work = java.nio.file.Files.createTempDirectory("graft_refresh")
      .toFile.getPath
    val dir = s"$work/led"
    def doc(id: Long, n: Int): (Long, String) =
      id -> Seq.fill(n)(s"w$id").mkString(" ")
    // budget 10, ten 10-token docs -> pack i-1 == doc i (ten packs)
    val docs = (1L to 10L).map(doc(_, 10))
    val df = docs.toDF("doc_id", "text")
    val toks = filter(split(trim(col("text")), "\\s+"), w => w =!= "")
    IndexIngest.seedCuratedPack(df, dir, "doc_id", "text", budget = 10)
    Packing.materializeShardsFromAssignment(spark, s"$dir/assign", df,
      "doc_id", toks, s"$work/out", nShards = 4)
    def shardFiles(): Map[String, Set[String]] =
      new java.io.File(s"$work/out/data").listFiles()
        .filter(_.getName.startsWith("shard=")).map(d =>
          d.getName -> d.listFiles().map(_.getName)
            .filter(_.endsWith(".parquet")).toSet).toMap
    val before = shardFiles()
    // retract doc 7 (pack 6) — only its shard may be rewritten
    val affectedShard = Packing.shardShuffle(
        Seq(6L).toDF("pack_id"), "pack_id", 4)
      .select("shard").as[Long].head()
    IndexIngest.retractFromCuratedPack(spark, dir,
      Seq(7L).toDF("doc_id"), "doc_id")
    assert(spark.read.parquet(s"$dir/retracted")
      .select("doc_id", "pack_id", "mode").as[(Long, Long, String)]
      .collect().toSeq == Seq((7L, 6L, "scrub")))
    Packing.refreshRetractedShards(spark, dir, df, "doc_id", toks,
      s"$work/out", nShards = 4)
    val after = shardFiles()
    val untouched = before.keySet - s"shard=$affectedShard"
    untouched.foreach { sh => assert(after(sh) == before(sh),
      s"$sh was rewritten but holds no affected pack") }
    assert(after(s"shard=$affectedShard") != before(s"shard=$affectedShard"),
      "the affected shard must be rewritten")
    // refreshed state == full re-materialize from the same assignment
    Packing.materializeShardsFromAssignment(spark, s"$dir/assign", df,
      "doc_id", toks, s"$work/ref", nShards = 4)
    def snapshot(out: String) = {
      val d = spark.read.parquet(s"$out/data")
        .select(col("shard").cast("long"), col("pack_id"), col("n_docs"),
          col("n_tokens"), col("rank"), concat_ws(" ", col("tokens")))
        .collect().map(_.toSeq).toSet
      val m = spark.read.parquet(s"$out/manifest")
        .collect().map(_.toSeq).toSet
      (d, m)
    }
    assert(snapshot(s"$work/out") == snapshot(s"$work/ref"),
      "incremental refresh diverged from a full re-materialize")
    // the queue drained into the audit trail
    assert(!new java.io.File(s"$dir/retracted").exists())
    assert(spark.read.parquet(s"$dir/retracted_applied").count() == 1)
    // second refresh: nothing queued -> no-op, no files touched
    val files2 = shardFiles()
    Packing.refreshRetractedShards(spark, dir, df, "doc_id", toks,
      s"$work/out", nShards = 4)
    assert(shardFiles() == files2)
    // a shard whose every pack is retracted disappears (data + manifest)
    val dir2 = s"$work/led2"
    val two = Seq(doc(1, 10), doc(2, 10)).toDF("doc_id", "text")
    IndexIngest.seedCuratedPack(two, dir2, "doc_id", "text", budget = 10)
    Packing.materializeShardsFromAssignment(spark, s"$dir2/assign", two,
      "doc_id", toks, s"$work/out2", nShards = 8)
    val goneShard = Packing.shardShuffle(
        Seq(0L).toDF("pack_id"), "pack_id", 8)
      .select("shard").as[Long].head()
    IndexIngest.retractFromCuratedPack(spark, dir2,
      Seq(1L).toDF("doc_id"), "doc_id")
    Packing.refreshRetractedShards(spark, dir2, two, "doc_id", toks,
      s"$work/out2", nShards = 8)
    assert(!new java.io.File(s"$work/out2/data/shard=$goneShard").exists(),
      "a fully-retracted shard's data dir must be deleted")
    assert(!spark.read.parquet(s"$work/out2/manifest").select("shard")
      .as[Long].collect().contains(goneShard))
    // repack-mode queue rows are rejected loudly
    val dir3 = s"$work/led3"
    IndexIngest.seedCuratedPack(two, dir3, "doc_id", "text", budget = 10)
    IndexIngest.retractFromCuratedPack(spark, dir3,
      Seq(1L).toDF("doc_id"), "doc_id", repack = true, budget = 10)
    intercept[IllegalArgumentException] {
      Packing.refreshRetractedShards(spark, dir3, two, "doc_id", toks,
        s"$work/out2", nShards = 8)
    }
  }

  test("un-retraction restores the exact rows and round-trips the shards") {
    val work = java.nio.file.Files.createTempDirectory("graft_unretract")
      .toFile.getPath
    val dir = s"$work/led"
    def doc(id: Long, n: Int): (Long, String) =
      id -> Seq.fill(n)(s"w$id").mkString(" ")
    val df = (1L to 10L).map(doc(_, 10)).toDF("doc_id", "text")
    val toks = filter(split(trim(col("text")), "\\s+"), w => w =!= "")
    IndexIngest.seedCuratedPack(df, dir, "doc_id", "text", budget = 10,
      nearDupThreshold = Some(0.7))
    Packing.materializeShardsFromAssignment(spark, s"$dir/assign", df,
      "doc_id", toks, s"$work/out", nShards = 4)
    def dataSnap() = spark.read.parquet(s"$work/out/data")
      .select(col("shard").cast("long"), col("pack_id"), col("n_docs"),
        col("n_tokens"), col("rank"), concat_ws(" ", col("tokens")))
      .collect().map(_.toSeq).toSet
    def manifestSnap() = spark.read.parquet(s"$work/out/manifest")
      .collect().map(_.toSeq).toSet
    def assignRows() = spark.read.parquet(s"$dir/assign")
      .as[(Long, Long, Long, Long)].collect().toSet
    val (origData, origManifest) = (dataSnap(), manifestSnap())
    val origAssign = assignRows()
    val origHashes = spark.read.parquet(s"$dir/hashes").count()
    // retract {3, 7} WITH forget (hash/sig tombstones erased too)
    IndexIngest.retractFromCuratedPack(spark, dir,
      Seq(3L, 7L).toDF("doc_id"), "doc_id", forgetDocs = Some(df))
    Packing.refreshRetractedShards(spark, dir, df, "doc_id", toks,
      s"$work/out", nShards = 4)
    assert(assignRows().map(_._1) == origAssign.map(_._1) -- Set(3L, 7L))
    assert(spark.read.parquet(s"$dir/hashes").count() == origHashes - 2)
    // restore them (an unknown id 99 in the list is a no-op)
    val report = IndexIngest.unretractFromCuratedPack(spark, dir,
        Seq(3L, 7L, 99L).toDF("doc_id"), "doc_id", forgetDocs = Some(df))
      .as[(String, Long)].collect().toMap
    assert(report == Map("assign" -> 2L, "hashes" -> 2L, "sigs" -> 2L),
      s"restore report off: $report")
    Packing.refreshRetractedShards(spark, dir, df, "doc_id", toks,
      s"$work/out", nShards = 4)
    // byte-exact round trip: assignment, hashes, shards, manifest
    assert(assignRows() == origAssign,
      "restored assignment must be the exact pre-takedown rows")
    assert(spark.read.parquet(s"$dir/hashes").count() == origHashes)
    assert(dataSnap() == origData && manifestSnap() == origManifest,
      "shards must round-trip through retract + unretract")
    // idempotence: restoring again matches nothing
    val again = IndexIngest.unretractFromCuratedPack(spark, dir,
        Seq(3L).toDF("doc_id"), "doc_id")
      .as[(String, Long)].collect().toMap
    assert(again("assign") == 0L)
    // repack history cannot be restored
    val dir2 = s"$work/led2"
    IndexIngest.seedCuratedPack(df, dir2, "doc_id", "text", budget = 10)
    IndexIngest.retractFromCuratedPack(spark, dir2,
      Seq(3L).toDF("doc_id"), "doc_id", repack = true, budget = 10)
    intercept[IllegalArgumentException] {
      IndexIngest.unretractFromCuratedPack(spark, dir2,
        Seq(3L).toDF("doc_id"), "doc_id")
    }
    // no retraction history at all fails loudly
    val dir3 = s"$work/led3"
    IndexIngest.seedCuratedPack(df, dir3, "doc_id", "text", budget = 10)
    intercept[IllegalArgumentException] {
      IndexIngest.unretractFromCuratedPack(spark, dir3,
        Seq(3L).toDF("doc_id"), "doc_id")
    }
  }

  test("retroactive decontamination retracts exactly the accepted gram-sharing docs") {
    val work = java.nio.file.Files.createTempDirectory("graft_retract_dc")
      .toFile.getPath
    val dir = s"$work/led"
    val phrase = "alpha bravo charlie delta echo foxtrot golf hotel"
    val corpus = Seq(
      1L -> "one uno eins un yksi jeden egy unu den ena",
      2L -> "two dos zwei deux kaksi dwa ketto doua dyo dio",
      3L -> s"prefix words here $phrase suffix words there",
      4L -> "four cuatro vier quatre nelja cztery negy patru tessera quattro")
    // doc 9 shares the phrase but was never accepted — must be a no-op
    val store = (corpus :+ (9L -> s"unaccepted copy $phrase end"))
      .toDF("doc_id", "text")
    IndexIngest.seedCuratedPack(corpus.toDF("doc_id", "text"), dir,
      "doc_id", "text", budget = 10)
    val bench = Seq(s"question stem $phrase answer choices").toDF("text")
    val report = IndexIngest.retractContaminated(spark, dir, store,
        "doc_id", "text", bench, n = 8)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(report("assign") == ((4L, 1L, 3L)), s"report off: $report")
    val ids = spark.read.parquet(s"$dir/assign").select("doc_id")
      .as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 4L), s"exactly doc 3 must be retracted: $ids")
    // forget=true default: contaminated is not banned — hash row erased
    assert(report("hashes")._2 == 1L &&
      spark.read.parquet(s"$dir/hashes").count() == 3)
  }

  test("retractionCompliance: violation, pending queue, drained history") {
    val work = java.nio.file.Files.createTempDirectory("graft_comply")
      .toFile.getPath
    val dir = s"$work/led"
    def doc(id: Long, n: Int): (Long, String) =
      id -> Seq.fill(n)(s"w$id").mkString(" ")
    val seed = Seq(doc(1, 8), doc(2, 6), doc(3, 7), doc(4, 9))
    IndexIngest.seedCuratedPack(seed.toDF("doc_id", "text"), dir,
      "doc_id", "text", budget = 12)
    val toks = filter(split(trim(col("text")), "\\s+"), w => w =!= "")
    Packing.materializeShardsFromAssignment(spark, s"$dir/assign",
      seed.toDF("doc_id", "text"), "doc_id", toks,
      s"$work/out", nShards = 2)
    def report(optOut: Seq[Long]): Map[String, (Long, Boolean)] =
      IndexIngest.retractionCompliance(spark, dir,
          optOut.toDF("doc_id"), "doc_id")
        .as[(String, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    // pre-takedown: an opt-out id still assigned is a VIOLATION
    val pre = report(Seq(2L))
    assert(pre("assigned_optout") == ((1L, false)) &&
      pre("pending_refresh") == ((0L, true)) &&
      pre("applied_history") == ((0L, true)), s"pre: $pre")
    // retract but do NOT refresh: ledgers clean, shards stale -> pending
    IndexIngest.retractFromCuratedPack(spark, dir,
      Seq(2L).toDF("doc_id"), "doc_id")
    val mid = report(Seq(2L))
    assert(mid("assigned_optout") == ((0L, true)) &&
      mid("pending_refresh") == ((1L, false)) &&
      mid("applied_history") == ((0L, true)), s"mid: $mid")
    // the failOnViolation kind raises while the queue is pending
    val err = intercept[IllegalArgumentException] {
      graft.pipeline.ConfigLoader.loadKinds("retraction_compliance")(Map(
        "dir" -> dir, "idCol" -> "doc_id",
        "failOnViolation" -> "true")) match {
        case graft.sinks.Sinks.Write(_, f) => f(Seq(2L).toDF("doc_id"))
        case other => fail(s"unexpected step: $other")
      }
    }
    assert(err.getMessage.contains("1 aspect(s) failed"))
    // drain: refresh the shards -> fully compliant, history = 1 row
    Packing.refreshRetractedShards(spark, dir,
      seed.toDF("doc_id", "text"), "doc_id", toks,
      s"$work/out", nShards = 2)
    val post = report(Seq(2L))
    assert(post("assigned_optout") == ((0L, true)) &&
      post("pending_refresh") == ((0L, true)) &&
      post("applied_history") == ((1L, true)), s"post: $post")
  }

  test("retract-all empties the shards cleanly and unretract-all restores them") {
    val work = java.nio.file.Files.createTempDirectory("graft_retract_all")
      .toFile.getPath
    val dir = s"$work/led"
    def doc(id: Long, n: Int): (Long, String) =
      id -> Seq.fill(n)(s"w$id").mkString(" ")
    val df = (1L to 4L).map(doc(_, 10)).toDF("doc_id", "text")
    val toks = filter(split(trim(col("text")), "\\s+"), w => w =!= "")
    IndexIngest.seedCuratedPack(df, dir, "doc_id", "text", budget = 10)
    Packing.materializeShardsFromAssignment(spark, s"$dir/assign", df,
      "doc_id", toks, s"$work/out", nShards = 4)
    def dataSnap() = spark.read.parquet(s"$work/out/data")
      .select(col("shard").cast("long"), col("pack_id"), col("n_docs"),
        col("n_tokens"), col("rank"), concat_ws(" ", col("tokens")))
      .collect().map(_.toSeq).toSet
    val orig = dataSnap()
    assert(orig.nonEmpty)
    IndexIngest.retractFromCuratedPack(spark, dir,
      (1L to 4L).toDF("doc_id"), "doc_id")
    Packing.refreshRetractedShards(spark, dir, df, "doc_id", toks,
      s"$work/out", nShards = 4)
    // every shard dir deleted, manifest empty, assignment empty
    assert(!new java.io.File(s"$work/out/data").listFiles()
      .exists(_.getName.startsWith("shard=")),
      "all shard dirs must be deleted when every pack is retracted")
    assert(spark.read.parquet(s"$work/out/manifest").count() == 0)
    assert(spark.read.parquet(s"$dir/assign").count() == 0)
    // full restore round-trips to the original bytes
    IndexIngest.unretractFromCuratedPack(spark, dir,
      (1L to 4L).toDF("doc_id"), "doc_id")
    Packing.refreshRetractedShards(spark, dir, df, "doc_id", toks,
      s"$work/out", nShards = 4)
    assert(dataSnap() == orig,
      "unretract-all + refresh must restore the exact original shards")
  }
  test("nested SFT validate+render compose into a stream: streamed == batch") {
    // the nested conversation ops are pure projections (no collect, no
    // state), so SFT curation of the HuggingFace messages shape runs at
    // ingest time unchanged -- the streamed-curation counterpart for
    // post-training data
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[(String, String)])]
    val df = mem.toDF().toDF("conv_id", "raw")
      .withColumn("messages", transform(col("raw"),
        x => struct(x("_1").as("role"), x("_2").as("content"))))
      .drop("raw")
    val out = graft.llm.Sft.renderNested(
      graft.llm.Sft.validateNested(df))
    assert(out.isStreaming)
    val q = out.writeStream.format("memory")
      .queryName("sft_nested_stream").outputMode("append").start()
    val convs = Seq(
      (1L, Seq("user" -> "hi", "assistant" -> "hello")),
      (2L, Seq("assistant" -> "backwards", "user" -> "x")),
      (3L, Seq("system" -> "s", "user" -> "q", "assistant" -> "a")))
    try {
      mem.addData(convs: _*)
      q.processAllAvailable()
      val streamed = spark.table("sft_nested_stream")
        .select("conv_id", "ok", "reason", "text")
        .collect().map(r => r.getLong(0) ->
          (r.getBoolean(1), Option(r.getString(2)), r.getString(3))).toMap
      val batchDf = convs.toDF("conv_id", "raw")
        .withColumn("messages", transform(col("raw"),
          x => struct(x("_1").as("role"), x("_2").as("content"))))
        .drop("raw")
      val batch = graft.llm.Sft.renderNested(
          graft.llm.Sft.validateNested(batchDf))
        .select("conv_id", "ok", "reason", "text")
        .collect().map(r => r.getLong(0) ->
          (r.getBoolean(1), Option(r.getString(2)), r.getString(3))).toMap
      assert(streamed == batch)
      assert(streamed(1L)._1 && streamed(3L)._1)
      assert(streamed(2L)._2.contains("role_order"))
      assert(streamed(1L)._3 ==
        "<|user|>hi<|end|><|assistant|>hello<|end|>")
    } finally q.stop()
  }

  test("transitionsStream: cross-batch state + redelivery; finalize ≡ batch sessionTransitions") {
    implicit val sqlCtx = spark.sqlContext
    import EventsStream.PageEvent
    // per-user page walks engineered to cross the batch boundary:
    // user 1: 10 -> 11 (batch 1) -> 12 (batch 2, gap ok) -> 13 (gap too big)
    // user 2: 20 (batch 1) -> 20 (batch 2) self-loop; user 3 singleton
    val b1 = Seq(
      PageEvent(1L, 100L, ts(0), 10L), PageEvent(1L, 101L, ts(5), 11L),
      PageEvent(2L, 200L, ts(3), 20L), PageEvent(3L, 300L, ts(4), 30L))
    val b2 = Seq(
      PageEvent(1L, 102L, ts(20), 12L),   // 15 min after 101: edge 11->12
      PageEvent(1L, 103L, ts(100), 13L),  // 80 min gap: NO edge
      PageEvent(2L, 201L, ts(25), 20L))   // self-loop 20->20
    val dir = java.nio.file.Files
      .createTempDirectory("graft_trans_stream").toString + "/ledger"
    val mem = MemoryStream[PageEvent]
    val q = EventsStream.transitionsLedgerSink(
      EventsStream.transitionsStream(mem.toDS(), gapMinutes = 30), dir)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable() // redelivery absorbed
    } finally q.stop()
    val streamed = EventsStream.finalizeTransitionsLedger(spark, dir)
    val batch = graft.llm.LinkGraph.sessionTransitions(
      (b1 ++ b2).toDF(), col("page"), gapMinutes = 30)
    assert(rowsOf(streamed) == rowsOf(batch))
    // the cross-batch edge is present — state carried 11 over the boundary
    assert(rowsOf(streamed).contains("[11,12,1]"))
    assert(rowsOf(streamed).contains("[20,20,1]"))
  }

  test("transitionsLedgerSink: bucket-partitioned ledger prunes the " +
      "anti-join and still absorbs cross-bucket redelivery") {
    implicit val sqlCtx = spark.sqlContext
    import EventsStream.PageEvent
    // event ids straddle bucket boundaries at bucketSize=100: ids 95..
    // 105 land in buckets 0 and 1 — a redelivered batch must anti-join
    // against BOTH partitions it touches
    val b1 = Seq(
      PageEvent(1L, 95L, ts(0), 10L), PageEvent(1L, 98L, ts(5), 11L),
      PageEvent(1L, 103L, ts(10), 12L), PageEvent(2L, 205L, ts(3), 20L))
    val b2 = Seq(
      PageEvent(1L, 110L, ts(20), 13L), PageEvent(2L, 210L, ts(8), 21L))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_trans_bucket").toString + "/ledger"
    val mem = MemoryStream[PageEvent]
    val q = EventsStream.transitionsLedgerSink(
      EventsStream.transitionsStream(mem.toDS(), gapMinutes = 30), dir,
      bucketSize = 100L)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable() // redelivery absorbed
      mem.addData((b1 ++ b2): _*); q.processAllAvailable()
    } finally q.stop()
    // on-disk layout is partitioned by the id bucket (pruning surface)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("__bucket=")).map(_.getName).sorted
    assert(parts.toSeq == Seq("__bucket=0", "__bucket=1", "__bucket=2"),
      s"unexpected ledger layout: ${parts.toSeq}")
    val streamed = EventsStream.finalizeTransitionsLedger(spark, dir)
    val batch = graft.llm.LinkGraph.sessionTransitions(
      (b1 ++ b2).toDF(), col("page"), gapMinutes = 30)
    assert(rowsOf(streamed) == rowsOf(batch))
    // idempotent under redelivery: each hit key appears exactly once
    val hits = spark.read.parquet(dir)
    assert(hits.count() ==
      hits.select("user_id", "event_id").distinct().count())
  }

  test("transitionsLedgerSink: restart over a LEGACY flat ledger keeps the flat layout and dedups") {
    implicit val sqlCtx = spark.sqlContext
    import EventsStream.PageEvent
    val b1 = Seq(
      PageEvent(1L, 100L, ts(0), 10L), PageEvent(1L, 101L, ts(5), 11L),
      PageEvent(2L, 200L, ts(3), 20L))
    val b2 = Seq(
      PageEvent(1L, 102L, ts(20), 12L), PageEvent(2L, 201L, ts(8), 21L))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_trans_legacy").toString + "/ledger"
    // a ledger written by the pre-bucketing sink: flat files, no
    // __bucket column — exactly what a restart finds on disk (batch
    // 1's only hit is user 1's 10 -> 11 transition at event 101)
    Seq(EventsStream.TransitionHit(1L, 101L, 10L, 11L)).toDF()
      .write.parquet(dir)
    assert(!spark.read.parquet(dir).columns.contains("__bucket"))
    val mem = MemoryStream[PageEvent]
    val q = EventsStream.transitionsLedgerSink(
      EventsStream.transitionsStream(mem.toDS(), gapMinutes = 30), dir)
    try {
      // redelivery of batch 1 must anti-join the legacy rows (not
      // crash on a missing __bucket filter), batch 2 appends flat
      mem.addData((b1 ++ b2): _*); q.processAllAvailable()
    } finally q.stop()
    // layout stayed flat: no partition directories were mixed in
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("__bucket=")).map(_.getName)
    assert(parts.isEmpty, s"partition dirs mixed into a flat ledger: ${parts.toSeq}")
    assert(!spark.read.parquet(dir).columns.contains("__bucket"))
    val streamed = EventsStream.finalizeTransitionsLedger(spark, dir)
    val batch = graft.llm.LinkGraph.sessionTransitions(
      (b1 ++ b2).toDF(), col("page"), gapMinutes = 30)
    assert(rowsOf(streamed) == rowsOf(batch))
    val hits = spark.read.parquet(dir)
    assert(hits.count() ==
      hits.select("user_id", "event_id").distinct().count())
  }

  test("transitionsStream finalize ≡ batch on real events split mid-stream") {
    implicit val sqlCtx = spark.sqlContext
    import EventsStream.PageEvent
    val ev = graft.Queries.readEvents(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"),
        get_json_object(col("props"), "$.k").cast("long").as("page"))
      .as[PageEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = ev.splitAt(ev.length / 2) // global ts order → per-user order
    val dir = java.nio.file.Files
      .createTempDirectory("graft_trans_real").toString + "/ledger"
    val mem = MemoryStream[PageEvent]
    val q = EventsStream.transitionsLedgerSink(
      EventsStream.transitionsStream(mem.toDS(), gapMinutes = 240,
        stateTtl = "48 hours"), dir)
    try {
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = EventsStream.finalizeTransitionsLedger(spark, dir)
    val batch = graft.llm.LinkGraph.sessionTransitions(
      graft.Queries.readEvents(spark, sfDir),
      get_json_object(col("props"), "$.k").cast("long"), gapMinutes = 240)
    assert(rowsOf(streamed) == rowsOf(batch))
    // and the downstream rank is therefore identical too
    val rs = graft.llm.LinkGraph.pageRank(streamed, 2, orderedFold = true)
    val rb = graft.llm.LinkGraph.pageRank(batch, 2, orderedFold = true)
    assert(rowsOf(rs) == rowsOf(rb))
  }
}
