package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** fastText-style hashed-linear classifier scoring fused into ONE
  * native codegen'd pass: `graft_clf_score(text, weights, salt)` →
  * sigmoid of the mean hashed unigram+bigram feature weight, or null
  * for featureless docs.
  *
  * The builtin-composition route ([[graft.llm.Importance.classifierScoreCol]])
  * stacks lower → regexp_replace → trim → split → filter → transform →
  * sequence → concat → aggregate, materializing the word array, the
  * bigram array, their concatenation, and one md5 UTF8String per
  * feature. This expression walks the normalized text once, hashing
  * each word and each bigram as it goes — no intermediate arrays, one
  * monomorphic static call inside whole-stage codegen. The weight
  * table (12-dp weights scaled to exact 1e12 longs, the
  * order-independent sum convention) rides along as a literal,
  * deserialized once per executor.
  *
  * Bit-for-bit equal to the builtin route (spec-asserted) and to the
  * DuckDB oracle: same Unicode lowercase (UTF8String.toLowerCase, what
  * Spark's `lower` calls), same `\s+` collapse, same md5-prefix bucket
  * arithmetic, same scaled-long sum, same HALF_UP 6-dp round. */
case class ClassifierScoreExpression(child: Expression, weights: String,
                                     salt: String) extends UnaryExpression {

  @transient private lazy val scaled: Array[Long] =
    ClassifierScore.parseWeights(weights)

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // featureless docs score null
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_clf_score"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_clf_score requires STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    ClassifierScore.score(input.asInstanceOf[UTF8String], scaled, salt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("clfWeights", scaled, "long[]")
    val s = ctx.addReferenceObj("clfSalt", salt, "java.lang.String")
    val boxed = ctx.freshName("clfScore")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double $boxed = graft.plans.ClassifierScore.score($c, $w, $s);
      if ($boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $boxed.doubleValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): ClassifierScoreExpression =
    copy(child = newChild)
}

object ClassifierScore {

  private[plans] def parseWeights(s: String): Array[Long] =
    s.split(',').map(_.toLong)

  private[plans] def serializeWeights(scaled: Seq[Long]): String =
    scaled.mkString(",")

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** One-pass score. Normalization mirrors Spark's
    * `trim(regexp_replace(lower(text), "\\s+", " "))` exactly:
    * UTF8String.toLowerCase is what the `lower` expression calls, and
    * after the `\s+`→" " collapse only plain spaces can remain at the
    * edges, so space-trim ≡ Spark's trim. */
  def score(text: UTF8String, scaled: Array[Long], salt: String): java.lang.Double = {
    val norm = ws.matcher(text.toLowerCase.toString).replaceAll(" ")
    val md = java.security.MessageDigest.getInstance("MD5")
    val nBuckets = scaled.length
    // Long accumulation with exact promotion: a pathological doc (order
    // 10M+ same-sign features) could wrap a plain BIGINT silently, the
    // one divergence mode from the DECIMAL-routed aggregation path.
    // Overflow is detected per add (Math.addExact's sign rule) and the
    // running total promotes to BigInteger — still an exact integer
    // sum, so the order-independent-sum convention holds.
    var sum = 0L
    var big: java.math.BigInteger = null
    var nFeats = 0L
    def add(w: Long): Unit =
      if (big != null) big = big.add(java.math.BigInteger.valueOf(w))
      else {
        val s = sum + w
        if (((sum ^ s) & (w ^ s)) < 0)
          big = java.math.BigInteger.valueOf(sum)
            .add(java.math.BigInteger.valueOf(w))
        else sum = s
      }
    var prev: String = null
    var i = 0
    val n = norm.length
    while (i <= n) {
      if (i == n || norm.charAt(i) == ' ') {
        // token boundary: [start, i) — spaces are single post-collapse,
        // so empty tokens only occur at the (trimmed-equivalent) edges
        i += 1
      } else {
        var j = i
        while (j < n && norm.charAt(j) != ' ') j += 1
        val word = norm.substring(i, j)
        add(scaled(bucket(md, salt, word, nBuckets)))
        nFeats += 1
        if (prev != null) {
          add(scaled(bucket(md, salt, prev + " " + word, nBuckets)))
          nFeats += 1
        }
        prev = word
        i = j
      }
    }
    if (nFeats == 0) null
    else {
      val exact = if (big != null) new java.math.BigDecimal(big).doubleValue()
                  else sum.toDouble
      val m = exact / 1e12 / nFeats
      val score = 1.0 / (1.0 + math.exp(-m))
      java.lang.Double.valueOf(BigDecimal(score)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  /** 16-bit integer of the first 2 md5 bytes of (salt ++ feat), mod
    * nBuckets — identical to the md5-hex-prefix arithmetic in
    * [[graft.llm.Importance]] (first 4 hex chars ARE the first 2 bytes
    * big-endian). */
  private def bucket(md: java.security.MessageDigest, salt: String,
                     feat: String, nBuckets: Int): Int = {
    md.reset()
    val d = md.digest((salt + feat).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % nBuckets
  }
}
