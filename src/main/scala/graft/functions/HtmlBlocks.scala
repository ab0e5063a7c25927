package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import scala.collection.mutable.ArrayBuffer
import scala.util.matching.Regex

/** F23 — HTML → Gutenberg blocks (one of the few genuine UDFs in the
  * engine; the transformation is a per-string parse no builtin composes).
  *
  * Semantics follow the reference's converter
  * (`lib/Utils/WithSimpleHtmlBlockConverter.php:21-236`): top-level
  * elements map to core blocks —
  *   p → core/paragraph (dropped when text-empty),
  *   h1-h6 → core/heading {"level":N} (text re-wrapped with
  *     class="wp-block-heading"),
  *   ul/ol → core/list {"ordered":bool},
  *   blockquote → core/quote,
  *   img → core/image {"url","alt"} (empty innerHTML),
  *   hr → core/separator (canonical `<hr class="wp-block-separator" />`),
  *   anything else → core/freeform classic block (empty `<p></p>` dropped).
  * Output is WP `serialize_blocks` format:
  * `<!-- wp:NAME ATTRS_JSON -->INNER<!-- /wp:NAME -->`.
  *
  * The parser is a lightweight top-level tokenizer (offline container has
  * no DOM library); nested markup inside a mapped element is preserved
  * verbatim in innerHTML, matching the reference's outerHtml() use.
  */
object HtmlBlocks {

  final case class Block(blockName: String, attrsJson: String, innerHTML: String)

  private val voidTags = Set("img", "hr", "br", "input", "meta", "link")
  private val openTag: Regex = "(?is)<([a-zA-Z][a-zA-Z0-9]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)/?>".r

  /** Split html into top-level (tag, attrs, innerHTML, outerHTML) elements
    * plus bare-text runs (returned with tag "").
    *
    * Linear-time: both the open-tag and close-tag scans drive a single
    * `java.util.regex.Matcher` over the ORIGINAL string via `find(pos)` —
    * no substring copies of the document tail (a 100 MB content column
    * through the old substring form was O(n²)). Self-closing nested tags
    * (`<div><div/></div>`) do not bump the depth counter.
    */
  private[functions] def topLevel(html: String): Seq[(String, String, String, String)] = {
    val out = ArrayBuffer.empty[(String, String, String, String)]
    val s = html
    val om = openTag.pattern.matcher(s)
    var i = 0
    var textStart = 0
    def flushText(until: Int): Unit = {
      val t = s.substring(textStart, until)
      if (t.trim.nonEmpty) out += (("", "", t, t))
    }
    var done = false
    while (!done && i < s.length && om.find(i)) {
      val tag = om.group(1).toLowerCase
      val attrs = Option(om.group(2)).getOrElse("")
      val start = om.start
      val afterOpen = om.end
      val matched = s.substring(start, afterOpen)
      flushText(start)
      if (voidTags(tag) || matched.endsWith("/>")) {
        out += ((tag, attrs, "", matched))
        i = afterOpen; textStart = i
      } else {
        // find the matching close tag at the same nesting depth
        val closeRe = java.util.regex.Pattern.compile(
          "(?is)<(/?)" + java.util.regex.Pattern.quote(tag) + "\\b[^>]*?(/?)>")
        val cm = closeRe.matcher(s)
        var depth = 1
        var pos = afterOpen
        var closeStart = -1
        var closeEnd = -1
        while (depth > 0 && cm.find(pos)) {
          val isClose = cm.group(1) == "/"
          val isSelfClose = cm.group(2) == "/"
          if (isClose) depth -= 1 else if (!isSelfClose) depth += 1
          pos = cm.end
          if (depth == 0) { closeStart = cm.start; closeEnd = cm.end }
        }
        if (closeStart < 0) { // unclosed: treat rest as inner
          out += ((tag, attrs, s.substring(afterOpen), s.substring(start)))
          i = s.length; textStart = i
          done = true
        } else {
          out += ((tag, attrs, s.substring(afterOpen, closeStart), s.substring(start, closeEnd)))
          i = closeEnd; textStart = i
        }
      }
    }
    flushText(s.length)
    out.toSeq
  }

  private def stripTags(s: String): String = s.replaceAll("(?s)<[^>]*>", "").trim

  private def attr(attrs: String, name: String): Option[String] = {
    val re = ("(?i)\\b" + name + "\\s*=\\s*(\"([^\"]*)\"|'([^']*)'|([^\\s>]+))").r
    re.findFirstMatchIn(attrs).map(m =>
      Option(m.group(2)).orElse(Option(m.group(3))).getOrElse(m.group(4)))
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private[functions] def mapNode(tag: String, attrs: String, inner: String, outer: String): Option[Block] =
    tag match {
      case "p" =>
        if (stripTags(inner).isEmpty) None
        else Some(Block("core/paragraph", "", outer))
      case t if t.length == 2 && t(0) == 'h' && t(1) >= '1' && t(1) <= '6' =>
        val lvl = t(1) - '0'
        val html = s"<$t class=\"wp-block-heading\">${stripTags(inner)}</$t>"
        Some(Block("core/heading", s"""{"level":$lvl}""", html))
      case "ul" => Some(Block("core/list", """{"ordered":false}""", outer))
      case "ol" => Some(Block("core/list", """{"ordered":true}""", outer))
      case "blockquote" => Some(Block("core/quote", "", outer))
      case "img" =>
        val url = attr(attrs, "src").getOrElse("")
        val alt = attr(attrs, "alt")
        val attrsJson = "{" + s""""url":${jsonStr(url)}""" +
          alt.map(a => s""","alt":${jsonStr(a)}""").getOrElse("") + "}"
        Some(Block("core/image", attrsJson, ""))
      case "hr" =>
        Some(Block("core/separator", "", "<hr class=\"wp-block-separator\" />"))
      case _ =>
        if (outer.trim == "<p></p>" || outer.trim.isEmpty) None
        else Some(Block("core/freeform", "", outer))
    }

  private[functions] def serialize(b: Block): String = {
    val name = b.blockName.stripPrefix("core/")
    val attrs = if (b.attrsJson.nonEmpty && b.attrsJson != "{}") b.attrsJson + " " else ""
    if (b.innerHTML.isEmpty)
      s"<!-- wp:$name $attrs/-->"
    else
      s"<!-- wp:$name $attrs-->\n${b.innerHTML}\n<!-- /wp:$name -->"
  }

  def convert(html: String): String =
    if (html == null) null
    else topLevel(html)
      .flatMap { case (t, a, in, out) => mapNode(t, a, in, out) }
      .map(serialize)
      .mkString("\n\n")

  /** Column form: `htmlToBlocks($"legacy.content")`. */
  val htmlToBlocksUdf = udf(convert _)
  def htmlToBlocks(c: Column): Column = htmlToBlocksUdf(c)

  // ------------------------------------------------------------------
  // F24 — block pattern lookup: registered pattern content by name via a
  // broadcast-able constant map. Reference: lib/Utils/WithBlockPatterns
  // .php:28-48 (fetches from the WP pattern registry; here the registry
  // is supplied by the caller, the WP runtime being absent).
  // ------------------------------------------------------------------
  def blockPattern(registry: Map[String, String])(c: Column): Column = {
    import org.apache.spark.sql.functions._
    val pairs = registry.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    if (pairs.isEmpty) lit(null).cast("string")
    else element_at(map(pairs: _*), c)
  }
}
