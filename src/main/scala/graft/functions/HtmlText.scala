package graft.functions

import scala.collection.mutable.ArrayBuffer

/** HTML → main-content text extraction — the step that turns a raw
  * crawl (WARC `response` records, HTML payloads) into the clean text
  * column every downstream curation stage consumes. The reference
  * pipelines start from WET (Common Crawl's pre-extracted text);
  * starting from raw WARC needs this boilerplate-removal pass.
  *
  * The heuristics are the published densitometric family (Kohlschütter
  * et al., "Boilerplate Detection using Shallow Text Features", WSDM
  * 2010; Pomikálek's jusText): segment the document into text blocks at
  * block-level tag boundaries, score each block on word count and LINK
  * DENSITY (fraction of characters inside <a> — navigation, footers
  * and related-links boxes are link-dense; body prose is not), keep
  * prose-shaped blocks, and keep headings only when they introduce kept
  * content. Deterministic, single-pass, linear time — no DOM is built
  * (offline container has no parser library, and a 100 TB HTML column
  * cannot afford one): the same tokenizer discipline as
  * [[HtmlBlocks]], which handles the Gutenberg (F23) direction.
  *
  * Rules (fixed constants, stated here because the oracle derivations
  * and specs pin behaviour to them):
  *   - `<script> <style> <noscript> <template>` contents, comments,
  *     doctype and CDATA are skipped entirely;
  *   - a block is flushed at every block-level tag open/close (p, div,
  *     headings, list/table elements, semantic HTML5 sectioning tags,
  *     br, hr);
  *   - block text is entity-decoded (named basics + numeric) and
  *     whitespace-collapsed;
  *   - a CONTENT block is kept when words ≥ 10 and link density ≤ 1/3,
  *     or words ≥ 5, link density ≤ 0.2 and it ends in terminal
  *     punctuation (short prose, same terminal set as C4 line rule);
  *   - a HEADING block (h1-h6) is kept when non-empty, link density
  *     ≤ 1/3 and the NEXT block is a kept content block;
  *   - kept blocks join with a blank line.
  */
object HtmlText {

  /** Column form via the native expression (caller's session needs
    * `GraftExtensions.register`; see [[graft.plans.HtmlExtractExpression]]). */
  def extractCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("graft_html_extract", c)

  private val skipContent = Set("script", "style", "noscript", "template")
  private val blockTags = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li",
    "table", "thead", "tbody", "tfoot", "tr", "td", "th", "blockquote",
    "pre", "br", "hr", "section", "article", "header", "footer", "nav",
    "aside", "main", "figure", "figcaption", "form", "fieldset", "dl",
    "dt", "dd", "title", "body", "html", "head")
  private val headingTags = Set("h1", "h2", "h3", "h4", "h5", "h6")
  private val terminalChars = Set('.', '!', '?', '…', '"', '”', '’')

  private final case class Block(text: String, words: Int,
                                 linkDensity: Double, heading: Boolean)

  /** Extract the main-content text of an HTML document (see object doc
    * for the rules). Null-safe passthrough; a plain-text input (no
    * tags) is one block and kept iff it is prose-shaped. */
  def extractMainText(html: String): String = {
    if (html == null) return null
    val blocks = segment(html)
    val kept = new Array[Boolean](blocks.length)
    var i = 0
    while (i < blocks.length) {
      val b = blocks(i)
      if (!b.heading) {
        kept(i) = (b.words >= 10 && b.linkDensity <= 1.0 / 3) ||
          (b.words >= 5 && b.linkDensity <= 0.2 && b.text.nonEmpty &&
            terminalChars(b.text.charAt(b.text.length - 1)))
      }
      i += 1
    }
    // headings keep only when they introduce kept content (next block)
    i = 0
    while (i < blocks.length) {
      val b = blocks(i)
      if (b.heading && b.words >= 1 && b.linkDensity <= 1.0 / 3 &&
          i + 1 < blocks.length && kept(i + 1) && !blocks(i + 1).heading)
        kept(i) = true
      i += 1
    }
    val out = new java.lang.StringBuilder
    i = 0
    while (i < blocks.length) {
      if (kept(i)) {
        if (out.length > 0) out.append("\n\n")
        out.append(blocks(i).text)
      }
      i += 1
    }
    out.toString
  }

  /** One linear scan: tag tokenizer + block accumulator. Text chars
    * append to the current block; chars inside <a> also count toward
    * the link tally; block-level tags flush. */
  private def segment(html: String): ArrayBuffer[Block] = {
    val s = html
    val n = s.length
    val blocks = ArrayBuffer.empty[Block]
    val buf = new java.lang.StringBuilder
    var rawChars = 0
    var linkChars = 0
    var linkDepth = 0
    var curHeading = false
    var lastWasSpace = true // collapse leading whitespace

    def flush(): Unit = {
      // trim trailing collapsed space
      var end = buf.length
      while (end > 0 && buf.charAt(end - 1) == ' ') end -= 1
      val text = buf.substring(0, end)
      if (text.nonEmpty) {
        var words = 1
        var j = 0
        while (j < text.length) {
          if (text.charAt(j) == ' ') words += 1
          j += 1
        }
        val ld = if (rawChars > 0) linkChars.toDouble / rawChars else 0.0
        blocks += Block(text, words, ld, curHeading)
      }
      buf.setLength(0)
      rawChars = 0
      linkChars = 0
      lastWasSpace = true
    }

    def appendChar(c: Char): Unit = {
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
          c == '\u00a0') {
        if (!lastWasSpace) { buf.append(' '); lastWasSpace = true }
      } else {
        buf.append(c); lastWasSpace = false
        rawChars += 1
        if (linkDepth > 0) linkChars += 1
      }
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val close = s.indexOf("-->", i + 4)
          i = if (close >= 0) close + 3 else n
        } else if (s.startsWith("<![CDATA[", i)) {
          val close = s.indexOf("]]>", i + 9)
          i = if (close >= 0) close + 3 else n
        } else if (i + 1 < n && (s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
          val close = s.indexOf('>', i + 1)
          i = if (close >= 0) close + 1 else n
        } else {
          // tag name (with optional leading /)
          var j = i + 1
          val closing = j < n && s.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && (s.charAt(j).isLetterOrDigit)) j += 1
          val name = s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
          if (name.isEmpty) {
            // stray '<' — literal text
            appendChar('<'); i += 1
          } else {
            // skip to '>' respecting quoted attribute values
            var k = j
            var quote: Char = 0
            var done = false
            while (k < n && !done) {
              val ch = s.charAt(k)
              if (quote != 0) { if (ch == quote) quote = 0 }
              else if (ch == '"' || ch == '\'') quote = ch
              else if (ch == '>') done = true
              k += 1
            }
            if (!closing && skipContent(name)) {
              // skip the element's entire content — case-insensitive
              // close-tag scan in place (lowercasing the whole string
              // here would be O(n) per script/style occurrence)
              val close = indexOfIgnoreCase(s, "</" + name, k)
              if (close >= 0) {
                val gt = s.indexOf('>', close)
                i = if (gt >= 0) gt + 1 else n
              } else i = n
            } else {
              if (name == "a") {
                if (closing) { if (linkDepth > 0) linkDepth -= 1 }
                else if (k > j && s.charAt(k - 2) == '/') () // <a/> no-op
                else linkDepth += 1
                // anchors are inline boundaries like any other inline
                // tag: "at<a>this page</a>for" must not glue words
                if (!lastWasSpace) { buf.append(' '); lastWasSpace = true }
              } else if (blockTags(name)) {
                flush()
                curHeading = !closing && headingTags(name)
              } else if (!lastWasSpace) {
                // inline tag boundary acts as whitespace (e.g. <em>)
                buf.append(' '); lastWasSpace = true
              }
              i = k
            }
          }
        }
      } else if (c == '&') {
        val (decoded, next) = entity(s, i)
        decoded.foreach(appendChar)
        i = next
      } else {
        appendChar(c)
        i += 1
      }
    }
    flush()
    blocks
  }

  /** ASCII case-insensitive indexOf (the needle is a lowercase tag). */
  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length
    val m = needle.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        val a = s.charAt(i + j)
        val low = if (a >= 'A' && a <= 'Z') (a + 32).toChar else a
        if (low != needle.charAt(j)) ok = false
        j += 1
      }
      if (ok) return i
      i += 1
    }
    -1
  }

  /** Decode one entity at `s(i) == '&'`; returns (decoded chars, next
    * index). Unknown entities pass through literally. */
  private def entity(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return ("&", i + 1)
    val body = s.substring(i + 1, semi)
    val out = body match {
      case "amp" => "&"
      case "lt" => "<"
      case "gt" => ">"
      case "quot" => "\""
      case "apos" => "'"
      case "nbsp" => " "
      // Character.toChars, not toChar: astral code points (&#128512;,
      // emoji and CJK-B live above U+FFFF) need surrogate pairs — a
      // char truncation would emit mojibake that then poisons dedup
      // hashes and token stats
      case b if b.startsWith("#x") || b.startsWith("#X") =>
        try codePoint(Integer.parseInt(b.substring(2), 16))
        catch { case _: Exception => null }
      case b if b.startsWith("#") =>
        try codePoint(Integer.parseInt(b.substring(1)))
        catch { case _: Exception => null }
      case _ => null
    }
    if (out == null) ("&", i + 1) else (out, semi + 1)
  }

  /** Valid code point → its String (surrogate pair above the BMP);
    * invalid/surrogate-range references → null (entity passes
    * through literally). */
  private def codePoint(cp: Int): String =
    if (Character.isValidCodePoint(cp) &&
        !(cp >= Character.MIN_SURROGATE && cp <= Character.MAX_SURROGATE))
      new String(Character.toChars(cp))
    else null
}
