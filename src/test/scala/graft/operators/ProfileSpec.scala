package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("b"), Some(2.5)),
    (2L, None, Some(1.5)),
    (3L, Some("a"), None),
    (4L, Some("a"), Some(9.0))
  ).toDF("id", "s", "v")

  test("profile: one row per column with exact stats") {
    val out = Profile.profile(df, Seq("id", "s", "v"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("id") == (("id", 4L, 0L, 4L, Some("1"), Some("4"))))
    assert(out("s") == (("s", 4L, 1L, 2L, Some("a"), Some("b"))))
    assert(out("v") == (("v", 4L, 1L, 3L, Some("1.5"), Some("9.0"))))
  }

  test("profile: approx mode agrees on small cardinalities") {
    val out = Profile.profile(df, Seq("id", "s"), approx = true)
      .select("col_name", "n_distinct").as[(String, Long)].collect().toMap
    assert(out == Map("id" -> 4L, "s" -> 2L))
  }

  test("profile: unknown column fails fast") {
    val e = intercept[IllegalArgumentException](Profile.profile(df, Seq("nope")))
    assert(e.getMessage.contains("nope"))
  }

  test("profile: all-null column yields null min/max") {
    val nd = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "s")
    val out = Profile.profile(nd, Seq("s"))
      .as[(String, Long, Long, Long, Option[String], Option[String])].head()
    assert(out == (("s", 2L, 2L, 0L, None, None)))
  }

  test("histogram: width_bucket semantics incl. under/overflow buckets") {
    val vals = Seq(-5.0, 0.0, 0.5, 9.9, 10.0, 49.9, 50.0, 99.9, 100.0, 250.0)
    val out = Profile.histogram(vals.toDF("v"), "v", lo = 0.0, hi = 100.0,
        nBuckets = 10)
      .as[(Long, Long)].collect().toMap
    // -5 -> underflow 0; {0, 0.5, 9.9} -> 1; 10.0 -> 2; 49.9 -> 5;
    // 50.0 -> 6; 99.9 -> 10; {100, 250} -> overflow 11
    assert(out == Map(0L -> 1L, 1L -> 3L, 2L -> 1L, 5L -> 1L, 6L -> 1L,
      10L -> 1L, 11L -> 2L))
    // nulls and NaN are excluded, not bucketed (NaN has no position;
    // width_bucket would emit a contract-less null bucket for it)
    val withNull = Seq(Some(1.0), None, Some(Double.NaN)).toDF("v")
    assert(Profile.histogram(withNull, "v", 0.0, 10.0, 2)
      .as[(Long, Long)].collect().toMap == Map(1L -> 1L))
    intercept[IllegalArgumentException](
      Profile.histogram(vals.toDF("v"), "v", 5.0, 5.0, 10))
  }
}
