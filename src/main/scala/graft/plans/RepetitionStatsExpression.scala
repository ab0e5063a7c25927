package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Repetition

/** The full Gopher repetition signal set as ONE native expression
  * (SQL `graft_repetition_stats`): thirteen fractions in a single
  * kernel pass ([[Repetition.stats]]) — a builtin composition would
  * need per-n exploded n-gram frames (nine shuffling aggregations per
  * document batch) or repeated higher-order-function scans; this stays
  * map-only inside WholeStageCodegen. Returns `array<double>` in
  * [[Repetition.fieldNames]] order; `TextAnalysis.repetitionStatsFull`
  * re-labels it as a named struct in the plan. */
case class RepetitionStatsExpression(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_repetition_stats"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_repetition_stats requires STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      Repetition.stats(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.Repetition.stats($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpression =
    copy(child = newChild)
}
