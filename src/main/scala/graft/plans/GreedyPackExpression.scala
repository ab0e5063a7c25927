package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Sequential greedy first-fit over a bounded group of token counts in
  * ONE O(n) native pass: `graft_greedy_pack(array<bigint>, budget)` →
  * array<int> with element i = the LOCAL pack index of document i —
  * the per-group kernel of no-split packing
  * ([[graft.llm.Packing.packGreedy]]), where documents must land
  * wholly inside one context window and a pack closes when the next
  * document in stream order does not fit.
  *
  * The fold rule (replayed literally by the DuckDB oracle's lockstep
  * recursion):
  *  - oversize doc (t > budget): gets a pack of its own — close the
  *    open pack if it holds anything, emit, then open a fresh pack;
  *  - doesn't fit (running + t > budget, running > 0): close, open
  *    next pack with the doc;
  *  - fits: join the open pack.
  * Emitted indexes are DENSE from 0 within the group (an open pack
  * that never receives a doc is never emitted), so per-group pack
  * counts are max+1 and a tiny per-group prefix sum yields globally
  * dense pack ids.
  *
  * Why native: the fold is inherently sequential, and expressing it
  * with the `aggregate` higher-order function copies the accumulator
  * array per element — O(n²) per group. This loop is O(n) with zero
  * allocation beyond the output. */
case class GreedyPackExpression(child: Expression, budget: Long)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_greedy_pack"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_greedy_pack requires ARRAY<BIGINT>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    GreedyPack.assign(input.asInstanceOf[ArrayData], budget)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GreedyPack.assign($c, ${budget}L)")

  override protected def withNewChildInternal(newChild: Expression): GreedyPackExpression =
    copy(child = newChild)
}

object GreedyPack {

  /** First-fit local pack indexes for `tokens` in order; see the rule
    * table on [[GreedyPackExpression]]. */
  def assign(tokens: ArrayData, budget: Long): GenericArrayData = {
    val n = tokens.numElements()
    val out = new Array[Int](n)
    var local = 0      // index of the currently open pack
    var running = 0L   // tokens already in the open pack
    var i = 0
    while (i < n) {
      // a null element (null text upstream of a size()) counts as a
      // zero-token doc rather than reading undefined memory
      val t = if (tokens.isNullAt(i)) 0L else tokens.getLong(i)
      if (t > budget) {
        // oversize: its own pack; close the open one if non-empty
        if (running > 0) local += 1
        out(i) = local
        local += 1
        running = 0L
      } else if (running > 0 && running + t > budget) {
        local += 1
        out(i) = local
        running = t
      } else {
        out(i) = local
        running += t
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
