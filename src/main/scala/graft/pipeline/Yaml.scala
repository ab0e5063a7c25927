package graft.pipeline

import java.io.File
import java.nio.file.Files

import scala.collection.immutable.VectorMap

/** Hand-rolled YAML-subset parser with `!include` composition — the
  * reference's entire user interface is YAML job files with include
  * tags (`lib/Classes/Config/YamlWithIncludes.php:41-65`,
  * `README.md:35-94`). The container ships no YAML library, so this
  * implements exactly the subset those configs use:
  *
  *  - block maps (`key: value` / `key:` + indented block)
  *  - block lists (`- value`, `- key: value` inline-map items, `-` +
  *    indented block); one-line flow lists `[a, b]` and flow maps
  *    `{k: v, ...}`, nesting allowed (`[{a: 1}, [2, 3]]`); a
  *    half-open flow collection fails loudly instead of degrading to
  *    a string scalar
  *  - scalars: unquoted, 'single'- and "double"-quoted; `true/false`,
  *    `null`/`~`, integers, floats; everything else is a string
  *  - comments: full-line `# ...` and unquoted trailing ` # ...`
  *  - `!include path` anywhere a value can appear: parses the referenced
  *    file (relative to the INCLUDING file's directory, falling back to
  *    the root config directory — the reference's FileLocator) and
  *    splices its tree in. Circular includes fail fast.
  *
  * List items must use two-space `- ` markers with continuation lines
  * aligned under the first key (the layout every reference config
  * uses). Maps preserve key order ([[VectorMap]]).
  */
object Yaml {

  final class YamlException(msg: String) extends RuntimeException(msg)

  /** Parse a YAML file (resolving `!include` recursively). */
  def parseFile(path: String): Any = {
    val f = new File(path).getAbsoluteFile
    parseFile(f, rootDir = f.getParentFile, seen = Set.empty)
  }

  /** Parse a YAML document string (includes resolved against `baseDir`,
    * or disabled when absent). */
  def parse(text: String, baseDir: Option[File] = None): Any =
    new Parser(preprocess(text), include(baseDir, baseDir, Set.empty)).parseDocument()

  private def parseFile(f: File, rootDir: File, seen: Set[String]): Any = {
    val canonical = f.getCanonicalPath
    if (seen(canonical))
      throw new YamlException(s"circular !include: $canonical (via ${seen.mkString(" -> ")})")
    if (!f.isFile) throw new YamlException(s"!include target not found: $f")
    val text = new String(Files.readAllBytes(f.toPath), "UTF-8")
    new Parser(preprocess(text),
      include(Some(f.getParentFile), Some(rootDir), seen + canonical)).parseDocument()
  }

  /** Include resolver: relative to the including file's dir, then the
    * root config dir. */
  private def include(baseDir: Option[File], rootDir: Option[File],
                      seen: Set[String]): String => Any = { target =>
    baseDir match {
      case None => throw new YamlException(s"!include '$target' not allowed without a base directory")
      case Some(base) =>
        val candidates = Seq(new File(base, target)) ++ rootDir.map(new File(_, target))
        val hit = candidates.find(_.isFile).getOrElse(candidates.head)
        parseFile(hit, rootDir.getOrElse(base), seen)
    }
  }

  // ---- lexing ------------------------------------------------------------

  private final case class Line(indent: Int, text: String, num: Int)

  private def preprocess(text: String): Vector[Line] =
    text.linesIterator.zipWithIndex.flatMap { case (raw, i) =>
      val noComment = stripComment(raw)
      val t = noComment.trim
      if (t.isEmpty || t == "---") None
      else Some(Line(noComment.indexWhere(_ != ' '), t, i + 1))
    }.toVector

  /** Remove a full-line or unquoted trailing ` #` comment. An escaped
    * `\"` inside a double-quoted scalar does not close the string (so a
    * ` # ` after it is still string content, not a comment). */
  private def stripComment(s: String): String = {
    var inS = false; var inD = false; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' if inD  => i += 1 // skip the escaped char
        case '\'' if !inD => inS = !inS
        case '"' if !inS  => inD = !inD
        case '#' if !inS && !inD && (i == 0 || s.charAt(i - 1) == ' ') =>
          return s.substring(0, i)
        case _ =>
      }
      i += 1
    }
    s
  }

  // ---- parsing -----------------------------------------------------------

  private final class Parser(lines: Vector[Line], resolveInclude: String => Any) {
    private var pos = 0
    private def done: Boolean = pos >= lines.length
    private def peek: Line = lines(pos)

    def parseDocument(): Any = {
      if (done) return VectorMap.empty[String, Any]
      val v = parseNode(peek.indent)
      if (!done)
        throw new YamlException(s"line ${peek.num}: unexpected content '${peek.text}' " +
          "after document (check indentation)")
      v
    }

    private def isListItem(t: String): Boolean = t == "-" || t.startsWith("- ")

    private def parseNode(indent: Int): Any =
      if (done || peek.indent < indent) null
      else if (isListItem(peek.text)) parseList(peek.indent)
      else parseMap(peek.indent)

    private def parseList(indent: Int): Vector[Any] = {
      val out = Vector.newBuilder[Any]
      while (!done && peek.indent == indent && isListItem(peek.text)) {
        val ln = peek
        val rest = if (ln.text == "-") "" else ln.text.drop(2).trim
        if (rest.isEmpty) { // `-` with a nested block
          pos += 1
          if (done || peek.indent <= indent)
            throw new YamlException(s"line ${ln.num}: empty list item")
          out += parseNode(peek.indent)
        } else if (rest.startsWith("{") || rest.startsWith("[")) {
          // `- {kind: x, ...}` / `- [a, b]`: a flow collection item —
          // splitKey would otherwise split at the first colon INSIDE
          // the braces and mangle it into an inline block map
          pos += 1
          out += scalar(rest, ln)
        } else splitKey(rest) match {
          case Some((k, v)) => // `- key: ...` starts an inline map item
            out += parseMapFrom(k, v, ln, indent + 2)
          case None =>
            pos += 1
            out += scalar(rest, ln)
        }
      }
      out.result()
    }

    private def parseMap(indent: Int): VectorMap[String, Any] = {
      var out = VectorMap.empty[String, Any]
      while (!done && peek.indent == indent && !isListItem(peek.text)) {
        val ln = peek
        val (k, v) = splitKey(ln.text).getOrElse(
          throw new YamlException(s"line ${ln.num}: expected 'key: value', got '${ln.text}'"))
        out = out.updated(k, entryValue(v, ln, indent))
      }
      out
    }

    /** A list item of the form `- key: v` — the map's first entry is on
      * the marker line; continuation keys sit at `indent` (aligned under
      * `key`, i.e. marker indent + 2). */
    private def parseMapFrom(k: String, v: String, ln: Line, indent: Int): VectorMap[String, Any] = {
      var out = VectorMap(k -> entryValue(v, ln, indent))
      while (!done && peek.indent == indent && !isListItem(peek.text)) {
        val l2 = peek
        val (k2, v2) = splitKey(l2.text).getOrElse(
          throw new YamlException(s"line ${l2.num}: expected 'key: value', got '${l2.text}'"))
        out = out.updated(k2, entryValue(v2, l2, indent))
      }
      out
    }

    /** Value of one map entry whose key line is `ln` at `indent`;
      * advances past the entry. */
    private def entryValue(inline: String, ln: Line, indent: Int): Any = {
      pos += 1
      if (inline.nonEmpty) scalar(inline, ln)
      else if (!done && peek.indent > indent) parseNode(peek.indent)
      else null
    }

    /** Split `key: value` at the first unquoted `: ` (or trailing `:`).
      * None if the text is not a map entry. */
    private def splitKey(t: String): Option[(String, String)] = {
      var inS = false; var inD = false; var i = 0
      while (i < t.length) {
        t.charAt(i) match {
          case '\\' if inD  => i += 1 // escaped char never closes the string
          case '\'' if !inD => inS = !inS
          case '"' if !inS  => inD = !inD
          case ':' if !inS && !inD && (i == t.length - 1 || t.charAt(i + 1) == ' ') =>
            val key = unquote(t.substring(0, i).trim)
            return Some(key -> t.substring(i + 1).trim)
          case _ =>
        }
        i += 1
      }
      None
    }

    private val IntRe = "^-?\\d+$".r
    private val FloatRe = "^-?\\d+\\.\\d+([eE][+-]?\\d+)?$".r

    /** Quote- and bracket-aware comma split for flow collections: a
      * comma inside a quoted scalar (`['hello, world', x]`) or inside
      * a NESTED flow collection (`[[1, 2], {a: 3, b: 4}]`) is content,
      * not a separator — nested elements come back whole and recurse
      * through [[scalar]]. Doubled `''` inside single quotes is the
      * YAML quote escape and must not close the scalar. A quote char
      * only OPENS a quoted scalar at the start of an element (first
      * non-space char) — a plain scalar may contain quotes after the
      * first character (`[it's fine, x]`), which are literal content
      * per YAML. */
    private def splitFlow(body: String, ln: Line): Vector[String] = {
      val out = Vector.newBuilder[String]
      val cur = new StringBuilder
      var quote: Char = 0
      var depth = 0
      var i = 0
      def atElementStart: Boolean = cur.forall(_.isWhitespace)
      // flow-MAP elements carry a `key: ` prefix, so a quoted VALUE's
      // opening quote sits mid-element (`{name: 'a, b'}`) — it opens
      // right after a `: ` separator
      def atValueStart: Boolean = {
        val t = cur.toString
        t.endsWith(" ") && t.trim.endsWith(":")
      }
      while (i < body.length) {
        val c = body.charAt(i)
        if (quote == 0 && (c == '\'' || c == '"') &&
            (atElementStart || atValueStart)) {
          quote = c; cur.append(c)
        }
        else if (quote == '\'' && c == '\'' && i + 1 < body.length &&
                 body.charAt(i + 1) == '\'') { cur.append("''"); i += 1 }
        else if (quote != 0 && c == quote) { quote = 0; cur.append(c) }
        else if (quote == '"' && c == '\\' && i + 1 < body.length) {
          cur.append(c).append(body.charAt(i + 1)); i += 1
        }
        else if (quote == 0 && (c == '[' || c == '{')) {
          depth += 1; cur.append(c)
        }
        else if (quote == 0 && (c == ']' || c == '}')) {
          depth -= 1
          if (depth < 0) throw new YamlException(
            s"line ${ln.num}: unbalanced '$c' in flow collection")
          cur.append(c)
        }
        else if (quote == 0 && depth == 0 && c == ',') {
          out += cur.result(); cur.clear()
        }
        else cur.append(c)
        i += 1
      }
      if (quote != 0)
        throw new YamlException(s"line ${ln.num}: unclosed quote in flow list")
      if (depth != 0)
        throw new YamlException(
          s"line ${ln.num}: unbalanced brackets in flow collection")
      out += cur.result()
      out.result()
    }

    private def scalar(t: String, ln: Line): Any = t match {
      case s if s.startsWith("!include") =>
        resolveInclude(unquote(s.stripPrefix("!include").trim))
      case s if s.startsWith("[") && s.endsWith("]") => // one-line flow list
        val body = s.substring(1, s.length - 1).trim
        if (body.isEmpty) Vector.empty[Any]
        else splitFlow(body, ln).map(x => scalar(x.trim, ln))
      case s if s.startsWith("{") && s.endsWith("}") => // one-line flow map
        // Symfony YAML (the reference's config layer,
        // GlobalConfig.php:90-107) accepts flow mappings, so a
        // reference-shaped `options: {budget: 512}` must parse as a
        // MAP — before round 11 it silently fell through to the
        // string "{budget: 512}" and degraded downstream
        val body = s.substring(1, s.length - 1).trim
        if (body.isEmpty) VectorMap.empty[String, Any]
        else VectorMap.from(splitFlow(body, ln).map { e =>
          splitKey(e.trim).getOrElse(throw new YamlException(
            s"line ${ln.num}: flow mapping entry '${e.trim}' is not " +
              "'key: value' (a space after the colon is required)")) match {
            case (k, v) => k -> scalar(v, ln)
          }
        })
      case s if s.startsWith("{") || s.startsWith("[") =>
        // fail loudly on a half-open flow collection instead of
        // producing a garbage string scalar
        throw new YamlException(
          s"line ${ln.num}: unterminated flow collection '$s'")
      case "null" | "~" | "" => null
      case "true" | "True"   => true
      case "false" | "False" => false
      case s if s.startsWith("'") || s.startsWith("\"") => unquote(s)
      case IntRe()   => t.toLong
      case FloatRe(_) => t.toDouble
      case s => s
    }

    private def unquote(s: String): String =
      if (s.length >= 2 && s.startsWith("'") && s.endsWith("'"))
        s.substring(1, s.length - 1).replace("''", "'")
      else if (s.length >= 2 && s.startsWith("\"") && s.endsWith("\"")) {
        // single left-to-right pass: chained String.replace mis-handles
        // `\\n` (backslash-escape first, so the surviving `\n` pair reads
        // as a newline escape — the YAML meaning is literal `\` + `n`)
        val body = s.substring(1, s.length - 1)
        val b = new StringBuilder(body.length)
        var i = 0
        while (i < body.length) {
          val c = body.charAt(i)
          if (c == '\\' && i + 1 < body.length) {
            body.charAt(i + 1) match {
              case 'n'   => b.append('\n')
              case 't'   => b.append('\t')
              case '"'   => b.append('"')
              case '\\'  => b.append('\\')
              case other => b.append('\\').append(other) // unknown escape kept verbatim
            }
            i += 2
          } else { b.append(c); i += 1 }
        }
        b.result()
      } else s
  }
}
