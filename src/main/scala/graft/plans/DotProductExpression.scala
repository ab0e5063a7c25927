package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two `array<double>` columns as ONE native codegen'd
  * loop — `acc = ((0 + a₀b₀) + a₁b₁) + ...` in ascending index order,
  * bit-identical to the `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * fold it replaces (the sequential evaluation order is part of the
  * contract: the DuckDB oracles reproduce it exactly).
  *
  * Why not the higher-order-function fold? Interpreted HOF eval sites
  * go megamorphic over a long multi-query JVM session and degrade ~4×;
  * a similarity pass computes O(nBits + k) dots per row, making it the
  * worst hit. This is a few lines of monomorphic generated code.
  *
  * Null semantics match the fold: null array → null; any null element →
  * null; length mismatch → null (zip_with pads with nulls). Registered
  * in SQL as `graft_dot(a, b)`. */
case class DotProductExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  // ALWAYS nullable: length mismatch / null element -> null even when both
  // child arrays are non-nullable. Without this, nullSafeCodeGen takes its
  // non-nullable path for non-null children and never declares `ev.isNull`
  // — the `${ev.isNull} = true` below then references an undeclared local,
  // janino fails ("isNull_N is not an rvalue"), and every plan containing
  // the expression silently falls back to interpreted eval.
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two ARRAY<DOUBLE>, got ${left.dataType.catalogString} " +
        s"and ${right.dataType.catalogString}")

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var j = 0
    while (j < n) {
      if (a.isNullAt(j) || b.isNullAt(j)) return null
      acc += a.getDouble(j) * b.getDouble(j)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $acc = 0.0;
         |if (!$bad) {
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($a.isNullAt($j) || $b.isNullAt($j)) { $bad = true; break; }
         |    $acc += $a.getDouble($j) * $b.getDouble($j);
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProductExpression =
    copy(left = newLeft, right = newRight)
}
