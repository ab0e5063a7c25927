package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.HtmlText

/** HTML main-content extraction as a native expression (SQL
  * `graft_html_extract`) — the raw-WARC front end's hot path. Same
  * preference order as [[HtmlToBlocksExpression]]: a per-string parse
  * no builtin composes, so a native `Expression` with `doGenCode`
  * keeps it inside WholeStageCodegen with no UDF plumbing. The
  * extractor itself ([[HtmlText.extractMainText]]) is single-pass
  * linear time. */
case class HtmlExtractExpression(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_extract"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_html_extract requires STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      HtmlText.extractMainText(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.HtmlText.extractMainText($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): HtmlExtractExpression =
    copy(child = newChild)
}
