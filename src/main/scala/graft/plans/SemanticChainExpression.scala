package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Greedy nearest-neighbor visiting order over a bounded group of
  * embedding vectors in one native pass:
  * `graft_semantic_chain(array<array<double>>)` → array<int> with
  * element i = the CHAIN POSITION of vector i — the per-group kernel
  * of In-Context-Pretraining document ordering
  * ([[graft.llm.Packing.semanticChainOrder]]; Shi et al. 2023 build
  * context windows from a greedy traversal of the document similarity
  * graph so each window holds RELATED documents instead of random
  * ones).
  *
  * The traversal rule (deterministic, stated for the oracle/spec):
  * start at index 0; at each step move to the unvisited vector with
  * the highest cosine to the CURRENT one, strict ties broken by the
  * LOWEST index (so equal vectors visit in input order). A null or
  * zero-norm vector scores cosine -2 against everything — visited
  * last, never preferred.
  *
  * Why native: the traversal is inherently sequential with O(G²·dim)
  * work per group; expressing it through higher-order functions would
  * copy the visited-set accumulator per step. Group size is bounded by
  * the caller's docsPerGroup (the [[GreedyPackExpression]]
  * convention), so per-row cost is a constant independent of corpus
  * size. */
case class SemanticChainExpression(child: Expression)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_semantic_chain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ArrayType(DoubleType, _), _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_semantic_chain requires ARRAY<ARRAY<DOUBLE>>, got " +
        other.catalogString)
  }

  override protected def nullSafeEval(input: Any): Any =
    SemanticChain.order(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SemanticChain.order($c)")

  override protected def withNewChildInternal(newChild: Expression): SemanticChainExpression =
    copy(child = newChild)
}

object SemanticChain {

  /** Chain positions for `vecs`; see the rule table on
    * [[SemanticChainExpression]]. */
  def order(vecs: ArrayData): GenericArrayData = {
    val n = vecs.numElements()
    val out = new Array[Int](n)
    if (n == 0) return new GenericArrayData(out)
    val vs = new Array[Array[Double]](n)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (!vecs.isNullAt(i)) {
        val a = vecs.getArray(i)
        val m = a.numElements()
        val v = new Array[Double](m)
        var s = 0.0
        var j = 0
        while (j < m) {
          val x = if (a.isNullAt(j)) 0.0 else a.getDouble(j)
          v(j) = x; s += x * x; j += 1
        }
        vs(i) = v; norms(i) = math.sqrt(s)
      } else { vs(i) = new Array[Double](0); norms(i) = 0.0 }
      i += 1
    }
    val visited = new Array[Boolean](n)
    var cur = 0
    visited(0) = true
    out(0) = 0
    var step = 1
    while (step < n) {
      var best = -1
      var bestCos = Double.NegativeInfinity
      var j = 0
      while (j < n) {
        if (!visited(j)) {
          val c =
            if (norms(cur) == 0.0 || norms(j) == 0.0) -2.0
            else {
              val a = vs(cur); val b = vs(j)
              val m = math.min(a.length, b.length)
              var dp = 0.0
              var t = 0
              while (t < m) { dp += a(t) * b(t); t += 1 }
              dp / (norms(cur) * norms(j))
            }
          if (c > bestCos) { bestCos = c; best = j }
        }
        j += 1
      }
      visited(best) = true
      out(best) = step
      cur = best
      step += 1
    }
    new GenericArrayData(out)
  }
}
