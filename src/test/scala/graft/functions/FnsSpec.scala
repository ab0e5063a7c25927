package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FnsSpec extends SparkSpec {
  import spark.implicits._
  import Fns._

  private def slugOf(s: String): String =
    Seq(s).toDF("v").select(toSlug($"v")).collect().head.getString(0)

  test("toSlug basics") {
    assert(slugOf("Hello World") == "hello-world")
    assert(slugOf("  Crème Brûlée!  ") == "creme-brulee")
    assert(slugOf("<b>Bold</b> move") == "bold-move")
    assert(slugOf("a__b--c  d") == "a-b-c-d")
    assert(slugOf("--edge--") == "edge")
  }

  test("toSlug with prefix") {
    val r = Seq("News").toDF("v").select(toSlug($"v", "cat-")).collect().head.getString(0)
    assert(r == "cat-news")
  }

  test("explodeToArray splits on literal delimiter and trims") {
    val r = Seq("a, b ,c").toDF("v")
      .select(explodeToArray($"v", ",")).collect().head.getSeq[String](0)
    assert(r == Seq("a", "b", "c"))
    // literal (regex-quoted) delimiter
    val r2 = Seq("a|b").toDF("v")
      .select(explodeToArray($"v", "|")).collect().head.getSeq[String](0)
    assert(r2 == Seq("a", "b"))
  }

  test("compareSetNull nulls matching values only") {
    val r = Seq("N/A", "x").toDF("v").select(compareSetNull($"v", "N/A")).collect()
    assert(r(0).isNullAt(0) && r(1).getString(0) == "x")
  }

  test("stringToNull hits every string column, leaves others") {
    val df = Seq(("none", "keep", 7)).toDF("a", "b", "n")
    val r = stringToNull(df, "none").collect().head
    assert(r.isNullAt(0) && r.getString(1) == "keep" && r.getInt(2) == 7)
  }

  test("normalizeDate accepts mysql + iso formats, falls back to now") {
    val df = Seq("2024-03-05 10:00:00", "2024-03-05T10:00:00", "garbage").toDF("v")
      .select(normalizeDate($"v").as("ts"))
    val rs = df.collect()
    assert(rs(0).getTimestamp(0).toInstant.toString.startsWith("2024-03-05T10:00"))
    assert(rs(1).getTimestamp(0).toInstant.toString.startsWith("2024-03-05T10:00"))
    assert(rs(2).getTimestamp(0) != null) // now() fallback
  }

  test("toIso8601 formats UTC with offset") {
    val r = Seq("2024-03-05 10:00:00").toDF("v")
      .select(toIso8601(to_timestamp($"v"))).collect().head.getString(0)
    assert(r == "2024-03-05T10:00:00Z")
  }

  test("sanitizeTextField strips tags, octets, collapses whitespace") {
    val r = Seq("  <b>hi</b>\n\t the%20re  ").toDF("v")
      .select(sanitizeTextField($"v")).collect().head.getString(0)
    assert(r == "hi there")
  }

  test("sanitizeKey keeps [a-z0-9_-]") {
    val r = Seq("My Key!2_x-").toDF("v").select(sanitizeKey($"v")).collect().head.getString(0)
    assert(r == "mykey2_x-")
  }

  test("ksesPost removes scripts with content, keeps allowed tags") {
    val in = """<p>ok</p><script>evil()</script><iframe src="x"></iframe><b onclick="p()">b</b>"""
    val r = Seq(in).toDF("v").select(ksesPost($"v")).collect().head.getString(0)
    assert(r.contains("<p>ok</p>"))
    assert(!r.contains("script") && !r.contains("evil"))
    assert(!r.contains("iframe"))
    assert(!r.contains("onclick"))
    assert(r.contains("<b"))
  }

  test("absInt") {
    val r = Seq("-7").toDF("v").select(absInt($"v")).collect().head.getLong(0)
    assert(r == 7L)
  }

  test("sanitizeEmail lowers valid, empties invalid") {
    val rs = Seq("A@B.Co", "not-an-email").toDF("v").select(sanitizeEmail($"v")).collect()
    assert(rs(0).getString(0) == "a@b.co")
    assert(rs(1).getString(0) == "")
  }

  test("escUrlRaw passes schemes, prefixes bare hosts") {
    val rs = Seq("https://x.co/a?b=1", "example.com/x", "/rel/path").toDF("v")
      .select(escUrlRaw($"v")).collect()
    assert(rs(0).getString(0) == "https://x.co/a?b=1")
    assert(rs(1).getString(0) == "http://example.com/x")
    assert(rs(2).getString(0) == "/rel/path")
  }

  test("escUrlRaw keeps ALL non-ASCII (CJK/arrows), not just U+0080-U+00FF") {
    // regression: PHP's byte-wise [\x80-\xff] keeps every multibyte char;
    // the old Java class stripped anything past U+00FF
    val rs = Seq("https://例え.jp/パス?q=値", "https://x.co/a→b/ü").toDF("v")
      .select(escUrlRaw($"v")).collect()
    assert(rs(0).getString(0) == "https://例え.jp/パス?q=値")
    assert(rs(1).getString(0) == "https://x.co/a→b/ü")
  }

  test("numeric preservation: tags + typed casts") {
    val df = Seq("12", "1.5", "abc").toDF("v")
    val tags = df.select(numericTag($"v")).collect().map(_.getString(0)).toSeq
    assert(tags == Seq("long", "double", "string"))
    val longs = df.select(asLongIfIntegral($"v")).collect()
    assert(longs(0).getLong(0) == 12L && longs(1).isNullAt(0))
  }

  test("replaceTokens folds static %%token%% substitutions") {
    val df = Seq(("see %%media.hero.url%% and %%id%%", "http://u", 42))
      .toDF("tpl", "url", "id")
    val r = df.select(replaceTokens($"tpl",
      Map("media.hero.url" -> $"url", "id" -> $"id"))).collect().head.getString(0)
    assert(r == "see http://u and 42")
  }

  test("interpolate resolves from a per-row map; unresolved -> empty") {
    graft.plans.GraftExtensions.register(spark)
    val df = Seq(("x %%a%% y %%missing%%", Map("a" -> "A"))).toDF("s", "m")
    val r = df.select(interpolate($"s", $"m")).collect().head.getString(0)
    assert(r == "x A y ")
  }

  test("native interpolate == UDF reference on adversarial templates") {
    graft.plans.GraftExtensions.register(spark)
    val cases = Seq(
      "plain, no tokens",
      "%%a%%", "x %%a%% y %%b%% z", "%%missing%%",
      "%%%a%%",        // stray % before a valid open
      "%%%%",          // empty token: literal
      "%% a%%",        // space breaks the token: literal
      "%%a%%%%b%%",    // adjacent tokens
      "%%a.b_c9%% ok", // full token alphabet
      "trailing open %%a", "%%", "%", "",
      "%%a%%b%%",      // token then dangling %%
      "a%%%%%a%%")     // %%%%%a%% — first open fails, second matches
    val df = cases.map(s => (s, Map("a" -> "[A]", "b" -> "[B]", "a.b_c9" -> "[C]")))
      .toDF("s", "m")
    val rows = df.select(interpolate($"s", $"m").as("native"),
      interpolateUdf($"s", $"m").as("ref")).collect()
    cases.zip(rows).foreach { case (c, r) =>
      assert(r.getString(0) == r.getString(1),
        s"template '$c': native='${r.getString(0)}' ref='${r.getString(1)}'")
    }
    // null string -> null; null map -> tokens resolve to empty
    val edge = Seq((Option.empty[String], Option(Map("a" -> "A"))),
      (Some("x %%a%% y"), Option.empty[Map[String, String]])).toDF("s", "m")
    val e = edge.select(interpolate($"s", $"m")).collect()
    assert(e(0).isNullAt(0) && e(1).getString(0) == "x  y")
  }

  test("repairText drops control chars then sanitizes") {
    val r = Seq("bad<i>name</i>� here").toDF("v")
      .select(repairText($"v")).collect().head.getString(0)
    assert(r == "badname here")
  }
}
