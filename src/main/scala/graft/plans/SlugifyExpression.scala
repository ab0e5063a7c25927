package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Fns

/** F7 as a single-pass native expression. `Fns.toSlug` is six chained
  * regexp passes (each a full scan + intermediate string); a 100 TB
  * content column pays that 6× cost per row. [[Slugify.slugify]] does
  * one tag-strip pass and one classify-fold-collapse pass; the spec
  * proves byte equality with the regex chain over generated corpora.
  * Codegen'd via `doGenCode` (no UDF plumbing). */
case class SlugifyExpression(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_slugify"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_slugify requires STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Slugify.slugify(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.plans.Slugify.slugify($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): SlugifyExpression =
    copy(child = newChild)
}

object Slugify {

  /** Linear-time slug, byte-equal to the `Fns.toSlug` regex chain:
    * strip `<...>` tags, lowercase, fold accents, keep [a-z0-9],
    * collapse whitespace/_/- runs to single dashes, no leading or
    * trailing dash. Other characters vanish WITHOUT breaking a dash
    * run (matching the chain's remove-then-collapse order). */
  def slugify(input: String): String = {
    if (input == null) return null
    // pass 1: strip complete tags (the regex <[^>]*> leaves an
    // unmatched '<' in place)
    val noTags = new java.lang.StringBuilder(input.length)
    var i = 0
    val n = input.length
    while (i < n) {
      val c = input.charAt(i)
      if (c == '<') {
        val close = input.indexOf('>', i + 1)
        if (close >= 0) i = close + 1
        else { noTags.append(c); i += 1 }
      } else { noTags.append(c); i += 1 }
    }
    val lowered = noTags.toString.toLowerCase(java.util.Locale.ROOT)
    // pass 2: fold + classify + collapse
    val out = new java.lang.StringBuilder(lowered.length)
    var pendingDash = false
    var j = 0
    while (j < lowered.length) {
      val raw = lowered.charAt(j)
      val ch = Fns.accentMap.getOrElse(raw, raw)
      if ((ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9')) {
        if (pendingDash && out.length > 0) out.append('-')
        pendingDash = false
        out.append(ch)
      } else if (ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' ||
                 ch == '\f' || ch == '\r' || ch == '_' || ch == '-') {
        pendingDash = true
      } // anything else is dropped and does not interrupt a dash run
      j += 1
    }
    out.toString
  }
}
