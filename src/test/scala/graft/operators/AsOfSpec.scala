package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  // right: (key, ts, id); left: (key, ts, click)
  private lazy val right = Seq(
    (1L, ts(0), 100L), (1L, ts(10), 101L), (1L, ts(10), 102L), (1L, ts(40), 103L),
    (2L, ts(5), 200L)
  ).toDF("user_id", "ts", "view_id")

  private lazy val left = Seq(
    (1L, ts(10), 900L),  // equal-ts: non-strict matches 102 (max tie), strict matches 100
    (1L, ts(30), 901L),  // matches 102 (latest at 10:10, max id)
    (1L, ts(50), 902L),  // matches 103
    (2L, ts(4), 903L),   // before any right row -> null
    (3L, ts(30), 904L)   // key absent on right -> null
  ).toDF("user_id", "ts", "click_id")

  test("asOfJoin matches most recent at-or-before, max-tie deterministic") {
    val out = AsOf.asOfJoin(left, right, Seq("user_id"), "ts",
      Seq("view_id"), tieCol = "view_id")
      .select($"click_id", $"view_id", $"matched_ts").as[(Long, Option[Long], Option[java.sql.Timestamp])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(900L) == ((Some(102L), Some(ts(10)))))
    assert(out(901L) == ((Some(102L), Some(ts(10)))))
    assert(out(902L) == ((Some(103L), Some(ts(40)))))
    assert(out(903L) == ((None, None)))
    assert(out(904L) == ((None, None)))
  }

  test("null-timestamp right rows are ignored, not carried as matches") {
    // a null right ts sorts nulls-first and would be carried by
    // last(ignoreNulls) as a bogus "match" with null matched_ts for
    // early left rows — they must be dropped before the union
    val rightWithNull = right.unionByName(
      Seq((2L, Option.empty[java.sql.Timestamp], 299L))
        .toDF("user_id", "ts", "view_id"))
    val out = AsOf.asOfJoin(left, rightWithNull, Seq("user_id"), "ts",
      Seq("view_id"), tieCol = "view_id")
      .select($"click_id", $"view_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out(903L) == None) // still no match before any real right row
    assert(out(900L) == Some(102L)) // unchanged elsewhere
  }

  test("strict mode excludes equal-timestamp right rows") {
    val out = AsOf.asOfJoin(left, right, Seq("user_id"), "ts",
      Seq("view_id"), tieCol = "view_id", strict = true)
      .select($"click_id", $"view_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out(900L) == Some(100L)) // 10:10 rows invisible, falls back to 10:00
    assert(out(901L) == Some(102L)) // strictly-before still sees 10:10
  }

  test("tolerance discards matches older than the lookback bound") {
    val out = AsOf.asOfJoin(left, right, Seq("user_id"), "ts",
      Seq("view_id"), tieCol = "view_id",
      tolerance = Some(expr("INTERVAL 15 MINUTES")))
      .select($"click_id", $"view_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out(900L) == Some(102L)) // 0 minutes back
    assert(out(901L) == None)       // 20 minutes back > 15
    assert(out(902L) == Some(103L)) // 10 minutes back
  }

  test("left rows and columns are preserved exactly once") {
    val out = AsOf.asOfJoin(left, right, Seq("user_id"), "ts",
      Seq("view_id"), tieCol = "view_id")
    assert(out.count() == left.count())
    assert(out.columns.toSeq == Seq("user_id", "ts", "click_id", "view_id", "matched_ts"))
  }

  test("matches brute-force oracle on the sf0.001 events table") {
    val ev = graft.Queries.readEvents(spark, sfDir)
    val clicks = ev.where($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"))
    val views = ev.where($"event_type" === "view")
      .select($"user_id", $"ts", $"event_id".as("view_id"))
    val got = AsOf.asOfJoin(clicks, views, Seq("user_id"), "ts",
      Seq("view_id"), tieCol = "view_id")
      .select($"click_id", $"view_id", $"matched_ts")
    // brute force: pair join + max-ts then max-id reduction
    val best = clicks.join(views.withColumnRenamed("ts", "vts"), Seq("user_id"))
      .where($"vts" <= $"ts")
      .groupBy($"click_id").agg(max(struct($"vts", $"view_id")).as("m"))
      .select($"click_id", $"m.view_id".as("view_id"), $"m.vts".as("matched_ts"))
    val expected = clicks.select($"click_id").join(best, Seq("click_id"), "left")
      .select($"click_id", $"view_id", $"matched_ts")
    assert(rowsOf(got) == rowsOf(expected))
    assert(got.count() == clicks.count())
  }

  test("events ts adapter handles both µs-timestamp and nanos-long encodings") {
    // the driver has regenerated events.parquet with different ts
    // physical types across rounds (TIMESTAMP(NANOS) read as long vs
    // TIMESTAMP_MICROS); normalizeEventTs must yield identical values
    // for the same instants regardless of encoding
    val dir = java.nio.file.Files.createTempDirectory("events-enc").toString
    val base = Seq(
      (1L, ts(0), 10L, "view", 1.0), (2L, ts(10), 10L, "click", 2.0),
      (3L, ts(5), 11L, "view", 3.0), (4L, ts(30), 11L, "click", 4.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    base.write.parquet(s"$dir/micros/events.parquet")
    // nanos-as-long: what the legacy TIMESTAMP(NANOS) fixture reads as
    base.withColumn("ts", unix_micros($"ts") * 1000L)
      .write.parquet(s"$dir/nanos/events.parquet")

    val micros = graft.Queries.readEvents(spark, s"$dir/micros")
    val nanos = graft.Queries.readEvents(spark, s"$dir/nanos")
    assert(micros.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(nanos.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(rowsOf(micros.orderBy($"event_id")) ==
      rowsOf(nanos.orderBy($"event_id")))

    def asof(ev: org.apache.spark.sql.DataFrame) = AsOf.asOfJoin(
      ev.where($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id".as("click_id")),
      ev.where($"event_type" === "view")
        .select($"user_id", $"ts", $"event_id".as("view_id")),
      Seq("user_id"), "ts", Seq("view_id"), tieCol = "view_id")
    assert(rowsOf(asof(micros)) == rowsOf(asof(nanos)))
  }
}
