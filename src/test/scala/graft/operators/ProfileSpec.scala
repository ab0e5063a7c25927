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
}
