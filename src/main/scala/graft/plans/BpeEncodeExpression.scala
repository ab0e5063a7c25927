package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization as a native codegen'd expression:
  * `graft_bpe_encode(text, ladder)` → array<string> of tokens,
  * `graft_bpe_count(text, ladder)` → bigint token count (no array
  * materialization — the 100 TB shape when only the count feeds
  * downstream chunking/packing/quality passes).
  *
  * The `ladder` is a learned merge table serialized one merge per line
  * as `left right` (see [[graft.llm.Bpe]] for training). Encoding is
  * the original Sennrich apply-in-learned-order scheme: words are split
  * on whitespace, each word starts as its code-point sequence, and each
  * merge in ladder order replaces adjacent symbol pairs left-to-right,
  * non-overlapping. Because a later merge can only produce symbols that
  * did not exist when earlier merges were learned, ladder-order
  * application is equivalent to the rank-greedy encode.
  *
  * Semantics are engine-portable by construction: the exact token
  * stream is reproducible in plain SQL by replaying the ladder as
  * chained literal `replace` calls over a separator-wrapped character
  * string (each symbol wrapped in chr(31), pairs separated by a doubled
  * separator) — the registered oracle rows do exactly that in DuckDB,
  * and a property spec pins the Scala scan to the string-replace
  * reference on random inputs.
  *
  * Map-only, shuffle-free; cost is O(ladder × word length) per row,
  * one monomorphic static call inside whole-stage codegen (the merge
  * table rides along as a codegen reference object, deserialized once
  * per executor, never per row).
  *
  * Reference parity: the reference engine has no tokenizer; this
  * replaces the GPT-2-style pre-tokenizer regex proxy with real BPE for
  * the LLM-pipeline extension surface (token budgets for
  * `chunk_by_tokens`/`pack_sequences`, quality stats).
  */
case class BpeEncodeExpression(child: Expression, ladder: String,
                               countOnly: Boolean)
    extends UnaryExpression {

  @transient private lazy val flat: Array[String] = BpeEncode.parseLadder(ladder)

  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    if (countOnly) LongType else ArrayType(StringType, containsNull = false)
  override def prettyName: String =
    if (countOnly) "graft_bpe_count" else "graft_bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (countOnly) BpeEncode.count(s, flat) else BpeEncode.encodeArray(s, flat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeLadder", flat, "java.lang.String[]")
    if (countOnly)
      defineCodeGen(ctx, ev, c => s"graft.plans.BpeEncode.count($c, $ref)")
    else
      defineCodeGen(ctx, ev, c => s"graft.plans.BpeEncode.encodeArray($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpression =
    copy(child = newChild)
}

object BpeEncode {
  /** Ladder wire format: one merge per line, `left right` (symbols
    * never contain whitespace — words are split on it first). */
  def parseLadder(ladder: String): Array[String] = {
    val out = Array.newBuilder[String]
    ladder.split("\n").foreach { line =>
      val t = line.trim
      if (t.nonEmpty) {
        val sp = t.indexOf(' ')
        require(sp > 0 && sp < t.length - 1,
          s"bpe ladder line must be 'left right': '$t'")
        out += t.substring(0, sp) += t.substring(sp + 1)
      }
    }
    out.result()
  }

  def serializeLadder(merges: Seq[(String, String)]): String =
    merges.map { case (a, b) => s"$a $b" }.mkString("\n")

  /** Apply one merge over a symbol buffer, left-to-right,
    * non-overlapping: after a merge at i the merged symbol is not
    * re-examined as a left side (string-replace semantics — the exact
    * behavior of chained literal `replace` over the separator-wrapped
    * form, which is what the SQL oracle replays). In-place compaction:
    * `w` is the write cursor. Returns the new symbol count. */
  private def applyMerge(syms: Array[String], n: Int, a: String, b: String): Int = {
    var r = 0
    var w = 0
    while (r < n) {
      if (r + 1 < n && syms(r).equals(a) && syms(r + 1).equals(b)) {
        syms(w) = a + b
        r += 2
      } else {
        syms(w) = syms(r)
        r += 1
      }
      w += 1
    }
    w
  }

  /** Tokenize one whitespace-free word with the flat ladder
    * `[a0,b0,a1,b1,...]`; appends tokens to `out`, returns the count. */
  private def wordTokens(word: String, flat: Array[String],
                         out: java.util.ArrayList[String]): Int = {
    // initial symbols: one per code point
    var n = 0
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val cc = Character.charCount(cp)
      syms(n) = word.substring(i, i + cc)
      n += 1
      i += cc
    }
    var m = 0
    while (m < flat.length && n > 1) {
      n = applyMerge(syms, n, flat(m), flat(m + 1))
      m += 2
    }
    if (out != null) { i = 0; while (i < n) { out.add(syms(i)); i += 1 } }
    n
  }

  /** ASCII `\s` exactly — the same class Java/Spark `split("\\s+")`
    * and DuckDB/RE2 `\s` match, so word boundaries agree across the
    * engine and the SQL oracle replay (Character.isWhitespace would
    * additionally split on U+2028 etc. and diverge). */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def forEachWord(text: String)(f: String => Unit): Unit = {
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(text.charAt(i))) i += 1
      if (i > start) f(text.substring(start, i))
    }
  }

  def count(u: UTF8String, flat: Array[String]): Long = {
    var total = 0L
    forEachWord(u.toString)(w => total += wordTokens(w, flat, null))
    total
  }

  def tokens(text: String, flat: Array[String]): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]()
    forEachWord(text)(w => wordTokens(w, flat, out))
    out
  }

  def encodeArray(u: UTF8String, flat: Array[String]): ArrayData = {
    val toks = tokens(u.toString, flat)
    val arr = new Array[Any](toks.size())
    var i = 0
    while (i < arr.length) { arr(i) = UTF8String.fromString(toks.get(i)); i += 1 }
    new GenericArrayData(arr)
  }
}
