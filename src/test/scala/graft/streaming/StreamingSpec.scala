package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import EventsStream.Event

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

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
      assert(rows.contains((0L, "view", 2L)))
      assert(rows.contains((0L, "click", 1L)))
      assert(rows.contains((60L, "view", 1L)))
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
}
