package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  // (user, minute, type)
  private lazy val ev = Seq(
    (1L, 0, "view"), (1L, 5, "click"), (1L, 9, "buy"),    // full funnel
    (2L, 0, "view"), (2L, 5, "click"),                    // stops at 2
    (3L, 5, "view"), (3L, 0, "click"),                    // click BEFORE view -> stage 1
    (4L, 0, "view"), (4L, 40, "click"),                   // click outside 10-min bound
    (5L, 3, "click")                                      // never views -> absent
  ).map { case (u, m, t) => (u, ts(m), t) }.toDF("user_id", "ts", "event_type")

  test("funnel: ordered stages, time bound, out-of-order and absent users") {
    val stages = Seq("view", "click", "buy")
    val bounded = EventAnalytics.funnel(ev, "user_id", "ts", "event_type",
        stages, within = Some(expr("INTERVAL 10 MINUTES")))
      .as[(Long, Int)].collect().toMap
    assert(bounded == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 1))
    val unbounded = EventAnalytics.funnel(ev, "user_id", "ts", "event_type",
        stages)
      .as[(Long, Int)].collect().toMap
    assert(unbounded == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 2))
  }

  test("funnel: two-stage form and stage-count validation") {
    val two = EventAnalytics.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click")).as[(Long, Int)].collect().toMap
    assert(two == Map(1L -> 2, 2L -> 2, 3L -> 1, 4L -> 2))
    intercept[IllegalArgumentException](
      EventAnalytics.funnel(ev, "user_id", "ts", "event_type", Seq("view")))
  }

  test("retention: weekly cohort triangle") {
    def w(d: Int) = java.sql.Timestamp.valueOf(f"2026-01-$d%02d 12:00:00")
    // weeks start Monday; 2026-01-05 is a Monday
    val e = Seq(
      (1L, w(5)), (1L, w(12)),          // cohort w1, active offsets 0 and 1
      (2L, w(5)), (2L, w(6)),           // cohort w1, two events SAME week
      (3L, w(12))                       // cohort w2, offset 0
    ).toDF("user_id", "ts")
    val out = EventAnalytics.retention(e, "user_id", "ts")
      .as[(java.sql.Date, Long, Long)].collect()
      .map { case (c, o, n) => (c.toString, o, n) }.toSet
    assert(out == Set(
      ("2026-01-05", 0L, 2L), ("2026-01-05", 1L, 1L), ("2026-01-12", 0L, 1L)))
  }

  test("retention: day grain derives its own period; bad unit fails fast") {
    def d(day: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2026-01-$day%02d $h%02d:00:00")
    val e = Seq(
      (1L, d(5, 9)), (1L, d(5, 21)), // same day: one distinct period
      (1L, d(7, 9)),                 // offset 2 days
      (2L, d(6, 9))                  // cohort day 2, offset 0
    ).toDF("user_id", "ts")
    val out = EventAnalytics.retention(e, "user_id", "ts", unit = "day")
      .as[(java.sql.Date, Long, Long)].collect()
      .map { case (c, o, n) => (c.toString, o, n) }.toSet
    assert(out == Set(
      ("2026-01-05", 0L, 1L), ("2026-01-05", 2L, 1L), ("2026-01-06", 0L, 1L)))
    intercept[IllegalArgumentException](
      EventAnalytics.retention(e, "user_id", "ts", unit = "month"))
  }
}
