package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) tokenization as a native codegen'd
  * expression: `graft_unigram_encode(text, pieces)` → array<string> of
  * tokens, `graft_unigram_count(text, pieces)` → bigint token count.
  * The `pieces` table is the trained vocabulary serialized one piece
  * per line as `piece<TAB>logprob` (see [[graft.llm.Unigram]] for the
  * EM training); each whitespace word segments independently by
  * VITERBI — the max-total-logprob segmentation, ties broken toward
  * the LONGER trailing piece then deterministically by the dynamic
  * program's fixed scan order.
  *
  * Characters outside the vocabulary fall back to single-char pieces
  * at (min logprob − 10): unknown input degrades to character
  * tokenization instead of failing, SentencePiece's byte-fallback
  * convention.
  *
  * Map-only, shuffle-free; cost is O(word length × max piece length)
  * per word via the bounded-lookback dynamic program. The piece table
  * rides along as a codegen reference object, deserialized once per
  * executor. */
case class UnigramEncodeExpression(child: Expression, pieces: String,
                                   countOnly: Boolean)
    extends UnaryExpression {

  @transient private lazy val table: UnigramEncode.Table =
    UnigramEncode.parse(pieces)

  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    if (countOnly) LongType else ArrayType(StringType, containsNull = false)
  override def prettyName: String =
    if (countOnly) "graft_unigram_count" else "graft_unigram_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = UnigramEncode.encode(input.asInstanceOf[UTF8String].toString, table)
    if (countOnly) toks.length.toLong
    else new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramEncode.Table].getName)
    if (countOnly)
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.UnigramEncode.encode($c.toString(), $tbl).length")
    else
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.UnigramEncode.toArrayData(" +
          s"graft.plans.UnigramEncode.encode($c.toString(), $tbl))")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeExpression =
    copy(child = newChild)
}

object UnigramEncode {

  /** Parsed piece table: logprob lookup + max piece length + the
    * unknown-character fallback logprob. Values are boxed
    * java.lang.Double ON PURPOSE: a scala.Double-valued java map
    * auto-unboxes a missing key's null to 0.0 and every absent piece
    * would silently score logprob 0 (= probability 1). */
  final class Table(val lp: java.util.HashMap[String, java.lang.Double],
                    val maxLen: Int, val unk: Double) extends Serializable

  def parse(s: String): Table = {
    val lp = new java.util.HashMap[String, java.lang.Double]()
    var maxLen = 1
    var minLp = 0.0
    s.split('\n').foreach { line =>
      if (line.nonEmpty) {
        val t = line.indexOf('\t')
        require(t > 0, s"unigram table line without tab: '$line'")
        val piece = line.substring(0, t)
        val v = java.lang.Double.parseDouble(line.substring(t + 1))
        lp.put(piece, v)
        if (piece.length > maxLen) maxLen = piece.length
        if (v < minLp) minLp = v
      }
    }
    require(!lp.isEmpty, "unigram table is empty")
    new Table(lp, maxLen, minLp - 10.0)
  }

  def serialize(pieces: Seq[(String, Double)]): String =
    pieces.map { case (p, v) => s"$p\t$v" }.mkString("\n")

  def toArrayData(toks: Array[String]): ArrayData =
    new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any))

  /** Whitespace-split words, each Viterbi-segmented independently. */
  def encode(text: String, table: Table): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    val n = text.length
    while (i < n) {
      if (Character.isWhitespace(text.charAt(i))) i += 1
      else {
        var j = i
        while (j < n && !Character.isWhitespace(text.charAt(j))) j += 1
        segment(text.substring(i, j), table, out)
        i = j
      }
    }
    out.result()
  }

  /** Viterbi over one word: best[i] = max over piece endings at i.
    * The scan tries the LONGEST lookback first and requires a strictly
    * greater score to replace, so equal-score ties resolve toward the
    * longer trailing piece — fully deterministic. */
  private def segment(word: String, table: Table,
                      out: scala.collection.mutable.Builder[String, Array[String]]): Unit = {
    val n = word.length
    if (n == 0) return
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1) // start index of the piece ending at i
    java.util.Arrays.fill(best, 1, n + 1, Double.NegativeInfinity)
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - table.maxLen)
      while (j < i) {
        if (best(j) > Double.NegativeInfinity || j == 0) {
          val piece = word.substring(j, i)
          val lp = table.lp.get(piece)
          val score =
            if (lp != null) best(j) + lp.doubleValue()
            else if (i - j == 1) best(j) + table.unk // single-char fallback
            else Double.NegativeInfinity
          if (score > best(i)) { best(i) = score; back(i) = j }
        }
        j += 1
      }
      i += 1
    }
    // reconstruct
    val rev = scala.collection.mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) { rev += word.substring(back(k), k); k = back(k) }
    var r = rev.length - 1
    while (r >= 0) { out += rev(r); r -= 1 }
  }
}
