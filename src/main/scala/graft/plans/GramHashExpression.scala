package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** All k-token-window rolling hashes of a text in ONE O(n) native
  * pass: `graft_gram_hashes(text, k, seed)` → array<long> with element
  * i = a 64-bit polynomial hash of normalized tokens [i, i+k) — the
  * gram-key primitive behind variable-length exact-substring dedup
  * ([[graft.llm.ExactSubstr]]), where k is the minimum duplicated-run
  * length (k = 50 in Lee et al. 2022, arXiv:2107.06499).
  *
  * Why native: building each k-token gram STRING and hashing it costs
  * O(n·k) — at k = 50 that's 50× the scan cost, the reason the naive
  * "suffix grouping by length-k prefix" is avoided at corpus scale.
  * The Rabin-Karp rolling form pays O(n) total: hash each token once
  * (XXH64 over its UTF-8 bytes, seeded), then slide
  * `H(i+1) = (H(i) − t_i·B^(k−1))·B + t_(i+k)` in wrapping 64-bit
  * arithmetic (odd base B ⇒ multiplication by B is a bijection mod
  * 2^64, so no entropy collapses). Two calls with independent seeds
  * give a 128-bit pair key — same collision-horizon argument as
  * [[graft.llm.Dedup.stripDuplicateSpans]]' xxhash64 pair.
  *
  * Normalization mirrors the dedup-family contract exactly
  * (`lower` → `\s+` collapse → trim → single-space split), identical
  * to [[WinnowFp.select]] / [[ClassifierScore.score]]. Documents with
  * fewer than k tokens return an EMPTY array (no window fits — the
  * "runs ≥ k only" semantics), so posexplode drops them naturally. */
case class GramHashExpression(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_gram_hashes requires STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(GramHash.hashes(
      input.asInstanceOf[UTF8String], k, seed))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.GramHash.hashes($c, $k, ${seed}L))")

  override protected def withNewChildInternal(newChild: Expression): GramHashExpression =
    copy(child = newChild)
}

object GramHash {

  /** Odd multiplier (golden-ratio constant) — odd ⇒ invertible mod
    * 2^64, so the polynomial combine loses no entropy to the wrap. */
  private val B = 0x9e3779b97f4a7c15L

  private val ws = java.util.regex.Pattern.compile("\\s+")

  private def tokenHash(tok: String, seed: Long): Long = {
    val b = tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, seed)
  }

  // hash internals exposed for the rolling-vs-direct recompute spec
  private[graft] def tokenHashForTest(tok: String, seed: Long): Long =
    tokenHash(tok, seed)
  private[graft] val BForTest: Long = B

  /** Rolling hashes of every k-token window; empty for < k tokens. */
  def hashes(text: UTF8String, k: Int, seed: Long): Array[Long] = {
    val norm = ws.matcher(text.toLowerCase.toString).replaceAll(" ")
    // single-space split, empties only at edges (post-collapse) — the
    // WinnowFp.select tokenization, shared family contract
    val toks = new scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    val n = norm.length
    while (i < n) {
      if (norm.charAt(i) == ' ') i += 1
      else {
        var j = i
        while (j < n && norm.charAt(j) != ' ') j += 1
        toks += tokenHash(norm.substring(i, j), seed)
        i = j
      }
    }
    val nt = toks.length
    if (nt < k) return Array.emptyLongArray
    // powB = B^(k-1) for the outgoing-token subtraction
    var powB = 1L
    var p = 1
    while (p < k) { powB *= B; p += 1 }
    val out = new Array[Long](nt - k + 1)
    var h = 0L
    var t = 0
    while (t < k) { h = h * B + toks(t); t += 1 }
    out(0) = h
    var g = 1
    while (g <= nt - k) {
      h = (h - toks(g - 1) * powB) * B + toks(g + k - 1)
      out(g) = h
      g += 1
    }
    out
  }
}
