package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlTextSpec extends SparkSpec {
  import spark.implicits._

  private def x(html: String): String = HtmlText.extractMainText(html)

  private val prose =
    "This is a reasonably long paragraph of ordinary body prose words."

  test("keeps prose, drops link-dense navigation and short boilerplate") {
    val html =
      s"""<html><head><title>T</title><script>var x = "</p>";</script>
         |<style>.a { color: red }</style></head><body>
         |<nav><a href="/">Home</a> <a href="/a">About</a></nav>
         |<p>$prose</p>
         |<div><a href="/m">Read more</a></div>
         |<footer>(c) corp</footer>
         |</body></html>""".stripMargin
    assert(x(html) == prose)
  }

  test("headings kept only when they introduce kept content") {
    assert(x(s"<h1>Section One</h1><p>$prose</p>") == s"Section One\n\n$prose")
    // heading followed by a dropped block is itself dropped
    assert(x("<h1>Lonely Heading</h1><p>short</p>") == "")
    // heading followed by another heading does not keep
    assert(x(s"<h2>A</h2><h2>B</h2><p>$prose</p>") == s"B\n\n$prose")
  }

  test("short prose rule: >=5 words with terminal punctuation, no links") {
    assert(x("<p>Five words ending in period.</p>") ==
      "Five words ending in period.")
    assert(x("<p>Five words no terminal here</p>") == "")
    // link-dense short line is boilerplate even with a period
    assert(x("<p><a href='x'>Five linked words ending here.</a></p>") == "")
  }

  test("entities decode; whitespace collapses; inline tags do not split blocks") {
    assert(x(s"<p>A &amp; B &lt;tag&gt; &#65; &#x42;   and <em>more</em> " +
      s"prose words to pass the rule.</p>") ==
      "A & B <tag> A B and more prose words to pass the rule.")
    // astral-plane references need surrogate PAIRS — a char truncation
    // would emit mojibake that poisons dedup hashes downstream
    assert(x("<p>Great post &#128512; thanks a lot everyone here today.</p>") ==
      "Great post 😀 thanks a lot everyone here today.")
    assert(x("<p>Hex form &#x1F600; also decodes in prose this long okay.</p>") ==
      "Hex form 😀 also decodes in prose this long okay.")
    // surrogate-range and out-of-range references pass through literally
    assert(x("<p>Bad ref &#xD800; stays literal in prose this long okay.</p>")
      .contains("&#xD800;"))
  }

  test("anchors are inline boundaries: no word gluing across <a> edges") {
    assert(x("<p>Contact us at<a href='/x'>this page</a>for help with ten words here ok.</p>") ==
      "Contact us at this page for help with ten words here ok.")
  }

  test("script/style/comment/CDATA contents never leak") {
    val html = s"<!-- $prose --><script>$prose</script>" +
      s"<![CDATA[$prose]]><STYLE>$prose</STYLE><p>$prose</p>"
    assert(x(html) == prose)
  }

  test("plain text passthrough: prose-shaped input is one kept block") {
    assert(x(prose) == prose)
    assert(x("tiny") == "")
    assert(x(null) == null)
  }

  test("table/list boilerplate drops; long list prose survives") {
    assert(x("<ul><li><a href='1'>One</a></li><li><a href='2'>Two</a></li></ul>") == "")
    assert(x(s"<ul><li>$prose</li></ul>") == prose)
  }

  test("column form matches the kernel and stays codegen'd") {
    graft.plans.GraftExtensions.register(spark)
    val df = Seq(s"<h1>Hed</h1><p>$prose</p>").toDF("h")
      .select(HtmlText.extractCol(col("h")).as("t"))
    assert(df.as[String].collect().head == s"Hed\n\n$prose")
    // native expression, not a UDF: no BatchEvalPython / ScalaUDF node
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"))
  }
}
