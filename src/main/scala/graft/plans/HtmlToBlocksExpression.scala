package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.HtmlBlocks

/** F23 as a NATIVE Catalyst expression (the preference order for custom
  * scalar work: builtin composition > native `Expression` with
  * `doGenCode` > UDF). Compared to the `udf(...)` form this stays
  * inside WholeStageCodegen — no UDF invocation plumbing, no
  * Row⇄Scala conversion, null handling generated inline — while
  * evaluating the same linear-time converter.
  *
  * Registered as SQL function `graft_html_to_blocks` either via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (cluster config)
  * or [[GraftExtensions.register]] on a live session.
  */
case class HtmlToBlocksExpression(child: Expression)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_to_blocks"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_html_to_blocks requires STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(HtmlBlocks.convert(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.HtmlBlocks.convert($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): HtmlToBlocksExpression =
    copy(child = newChild)
}

/** Session-extension entry point: `--conf
  * spark.sql.extensions=graft.plans.GraftExtensions` injects the
  * function at session build; [[register]] adds it to an existing
  * session's registry (tests, notebooks). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def unary(name: String, cls: Class[_],
                    build: Expression => Expression):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(cls.getName, name),
    (children: Seq[Expression]) => {
      require(children.size == 1, s"$name takes exactly one argument")
      build(children.head)
    })

  private[plans] val functions = Seq(
    unary("graft_html_to_blocks", classOf[HtmlToBlocksExpression], HtmlToBlocksExpression(_)),
    unary("graft_slugify", classOf[SlugifyExpression], SlugifyExpression(_)))

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
