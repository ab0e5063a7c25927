package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as ONE native expression: `sig[i] = min over h in
  * shingleHashes of xxh64(h, seed = i)`, i < k — a single tight loop in
  * generated code.
  *
  * Why not compose builtins? Both composition routes degrade at this
  * width (k = 64):
  *  - `explode` + k `min(xxhash64)` aggregates multiplies rows by the
  *    shingle count, shuffles, and makes janino compile a k-wide
  *    aggregate class;
  *  - k × `array_min(transform(...))` runs as interpreted higher-order
  *    functions, whose megamorphic eval call sites degrade ~4× over a
  *    long multi-query JVM session.
  * This expression is map-only, shuffle-free, and a few lines of
  * monomorphic generated code (`XXH64.hashLong` is the same primitive
  * Spark's own `xxhash64` codegen calls). Used by `Dedup.minhash*`;
  * registered in SQL as `graft_minhash_sig(arr, k)`. */
case class MinHashSignatureExpression(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0, s"graft_minhash_sig: k must be positive, got $k")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig requires ARRAY<BIGINT>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val h = XXH64.hashLong(arr.getLong(j), i.toLong)
        if (h < m) m = h
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      s"""
         |final int $n = $c.numElements();
         |final long[] $out = new long[$k];
         |for (int $i = 0; $i < $k; $i++) {
         |  long $m = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $n; $j++) {
         |    final long $h = $xxh.hashLong($c.getLong($j), (long) $i);
         |    if ($h < $m) $m = $h;
         |  }
         |  $out[$i] = $m;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpression =
    copy(child = newChild)
}
