package graft.functions

import graft.SparkSpec

class HtmlBlocksSpec extends SparkSpec {
  import HtmlBlocks._

  test("paragraph, heading, list, quote, separator, image mapping") {
    val html =
      """<p>Hello <b>there</b></p><h2>Title</h2><ul><li>a</li><li>b</li></ul>""" +
        """<ol><li>1</li></ol><blockquote>q</blockquote><hr/>""" +
        """<img src="http://x/i.png" alt="pic">"""
    val out = convert(html)
    assert(out.contains("<!-- wp:paragraph -->"))
    assert(out.contains("<p>Hello <b>there</b></p>"))
    assert(out.contains("""<!-- wp:heading {"level":2} -->"""))
    assert(out.contains("""<h2 class="wp-block-heading">Title</h2>"""))
    assert(out.contains("""<!-- wp:list {"ordered":false} -->"""))
    assert(out.contains("""<!-- wp:list {"ordered":true} -->"""))
    assert(out.contains("<!-- wp:quote -->"))
    assert(out.contains("""<hr class="wp-block-separator" />"""))
    assert(out.contains("""<!-- wp:image {"url":"http://x/i.png","alt":"pic"} /-->"""))
  }

  test("unknown tags wrap in freeform; empty paragraphs dropped") {
    val out = convert("<div>stuff</div><p></p><p>  </p>")
    assert(out.contains("<!-- wp:freeform -->"))
    assert(out.contains("<div>stuff</div>"))
    assert(!out.contains("wp:paragraph"))
  }

  test("nested same-tag elements close at the right depth") {
    val out = convert("<div>a<div>b</div>c</div><p>after</p>")
    assert(out.contains("<div>a<div>b</div>c</div>"))
    assert(out.contains("<p>after</p>"))
  }

  test("null-safe") { assert(convert(null) == null) }

  test("udf works over a DataFrame") {
    import spark.implicits._
    val r = Seq("<p>x</p>").toDF("html")
      .select(htmlToBlocks($"html")).collect().head.getString(0)
    assert(r.startsWith("<!-- wp:paragraph -->"))
  }

  test("blockPattern looks up registry by name") {
    import spark.implicits._
    val f = blockPattern(Map("hero" -> "<!-- wp:group -->...<!-- /wp:group -->")) _
    val r = Seq("hero", "nope").toDF("name").select(f($"name")).collect()
    assert(r(0).getString(0).startsWith("<!-- wp:group"))
    assert(r(1).isNullAt(0))
  }

  test("converts a 1000-element document quickly (linear-time scan)") {
    val html = (1 to 1000).map(i => s"<p>para $i with <b>markup</b></p>").mkString
    val t0 = System.nanoTime()
    val out = convert(html)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(out.split("<!-- wp:paragraph -->").length == 1001)
    assert(elapsedMs < 1000, s"topLevel scan took $elapsedMs ms for 1000 elements")
  }

  test("self-closing nested tags do not break depth tracking") {
    val out = convert("<div><div/>inner</div><p>after</p>")
    assert(out.contains("<div><div/>inner</div>"))
    assert(out.contains("<p>after</p>"))
  }
}
