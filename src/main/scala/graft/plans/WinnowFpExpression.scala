package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection fused into ONE native codegen'd
  * pass: `graft_winnow_fps(text, k, w, salt)` → array<long> of encoded
  * selected grams, bit-identical to the builtin composition in
  * [[graft.llm.Winnow.fingerprintArray]] (normalize → k-gram join →
  * md5-prefix hash → `hash·2³¹ + (2³¹−1−pos)` encoding → per-window
  * min → distinct, first-occurrence order).
  *
  * The builtin route materializes the word array, the gram array, one
  * md5 UTF8String per gram, and a w-slice per window (O(n·w) min
  * scans). This expression walks the text once and selects window
  * minima with a MONOTONIC DEQUE — O(n) total, no intermediate
  * arrays. Same engine-portable hash (integer of the first 8 md5 hex
  * chars of salt ++ gram), same rightmost-min tie rule carried by the
  * encoding. */
case class WinnowFpExpression(child: Expression, k: Int, w: Int,
                              salt: String) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fps"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_winnow_fps requires STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(WinnowFp.select(
      input.asInstanceOf[UTF8String], k, w, salt))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.WinnowFp.select($c, $k, $w, ${ctx.addReferenceObj("wfpSalt", salt, "java.lang.String")}))")

  override protected def withNewChildInternal(newChild: Expression): WinnowFpExpression =
    copy(child = newChild)
}

object WinnowFp {

  private val POS_BASE = 2147483648L // 2^31
  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** One-pass winnowing selection. Returns the distinct encoded
    * fingerprints in first-occurrence order (matching
    * array_distinct over the builtin's window scan). */
  def select(text: UTF8String, k: Int, w: Int, salt: String): Array[Long] = {
    val norm = ws.matcher(text.toLowerCase.toString).replaceAll(" ")
    // split on single spaces, dropping the (edge-only) empties —
    // identical to filter(split(normalizeText, " "), _ =!= "")
    val words = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    val n = norm.length
    while (i < n) {
      if (norm.charAt(i) == ' ') i += 1
      else {
        var j = i
        while (j < n && norm.charAt(j) != ' ') j += 1
        words += norm.substring(i, j)
        i = j
      }
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    def enc(gram: String, pos: Int): Long = {
      md.reset()
      val d = md.digest((salt + gram).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      h * POS_BASE + (POS_BASE - 1L - pos)
    }
    val nw = words.length
    if (nw < k) {
      // short doc: its single joined form (the builtin's otherwise arm)
      return Array(enc(words.mkString(" "), 0))
    }
    val nGrams = nw - k + 1
    val encs = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      val sb = new java.lang.StringBuilder()
      var t = 0
      while (t < k) {
        if (t > 0) sb.append(' ')
        sb.append(words(g + t))
        t += 1
      }
      encs(g) = enc(sb.toString, g)
      g += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (nGrams < w) {
      var m = encs(0); var x = 1
      while (x < nGrams) { if (encs(x) < m) m = encs(x); x += 1 }
      out.add(m)
    } else {
      // monotonic deque of indices: front = min of the current window
      val dq = new Array[Int](nGrams)
      var head = 0; var tail = 0 // [head, tail)
      var x = 0
      while (x < nGrams) {
        while (tail > head && encs(dq(tail - 1)) >= encs(x)) tail -= 1
        dq(tail) = x; tail += 1
        if (dq(head) <= x - w) head += 1
        if (x >= w - 1) out.add(encs(dq(head)))
        x += 1
      }
    }
    val res = new Array[Long](out.size)
    val it = out.iterator()
    var r = 0
    while (it.hasNext) { res(r) = it.next().longValue(); r += 1 }
    res
  }
}
