package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels as NATIVE codegen'd expressions — the
  * two per-row hot loops of the PQ ANN path (`graft.llm.Similarity`):
  *
  *  - `graft_pq_encode(vec, model)` — nearest codebook centroid per
  *    subspace; runs once per CORPUS row at index build/append time.
  *  - `graft_adc(qv, codes, model)` — asymmetric distance (query
  *    subvector vs reconstructed centroid, summed squared diffs); runs
  *    per (code-row × query) over the FULL codes frame at query time —
  *    the one corpus-wide scan of the PQ path, whose whole argument is
  *    scan rate.
  *
  * These replace Scala `udf`s: a UDF breaks WholeStageCodegen at the
  * exact operator doing the corpus-wide work (interpreted eval + a
  * Row⇄Scala conversion per row) — the same constant-factor tax
  * `graft_dot` / `graft_clf_score` were introduced to remove (the
  * scalar classifier route measured 6× at 100×). Results are
  * BIT-IDENTICAL to the UDF forms: same subspace/element loop order,
  * same strict `<` ties-to-lowest-index centroid walk, double
  * arithmetic end to end (the planted `ann_pq*`/`ann_ivfpq*` oracles
  * pin this).
  *
  * The codebook tensor rides the plan as ONE string literal (m × k ×
  * dsub doubles, `java.lang.Double.toString` round-trip exact — the
  * BPE-ladder convention) and is parsed ONCE per task into a flat
  * `double[]` carried on the codegen references array — the exact
  * `PslRules` pattern (`RegistrableDomainExpression`). ADC in residual
  * space (IVF-PQ) is the same arithmetic over residual inputs, so ONE
  * expression serves both the flat-PQ and IVF-PQ paths.
  *
  * Both kernels FAIL FAST with descriptive errors on dimension
  * mismatch (query/vector length ≠ m × dsub, codes length ≠ m, code
  * out of [0, k)) AND on null array elements (an UnsafeArrayData
  * null slot would otherwise read silently as 0.0, diverging from the
  * former Seq[Double] UDF's NPE) — the `lshBucket` convention; silent
  * wrong-position
  * reads or a raw ArrayIndexOutOfBoundsException deep in a task are
  * both worse than an immediate message. */
final class PqKernel(val m: Int, val dsub: Int, val k: Int,
                     val flat: Array[Double]) extends Serializable {
  def dim: Int = m * dsub

  /** Asymmetric distance: Σ_s ||qv[s·dsub..)−codebook_s[codes(s)]||².
    * `qv` is the query vector (flat PQ) or query residual (IVF-PQ). */
  def adc(qv: ArrayData, codes: ArrayData): Double = {
    val nq = qv.numElements()
    if (nq != dim) throw new IllegalArgumentException(
      s"graft_adc: query vector has $nq dims but the PQ model expects " +
        s"${dim} (m=$m × dsub=$dsub)")
    val nc = codes.numElements()
    if (nc != m) throw new IllegalArgumentException(
      s"graft_adc: codes array has $nc entries but the PQ model has m=$m subspaces")
    var d = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) throw new IllegalArgumentException(
        s"graft_adc: null code at subspace $s")
      val c = codes.getInt(s)
      if (c < 0 || c >= k) throw new IllegalArgumentException(
        s"graft_adc: code $c at subspace $s outside [0, $k) — codes were " +
          "encoded with a different codebook")
      val base = (s * k + c) * dsub
      val qBase = s * dsub
      var j = 0
      while (j < dsub) {
        if (qv.isNullAt(qBase + j)) throw new IllegalArgumentException(
          s"graft_adc: null element at query-vector position ${qBase + j}")
        val diff = qv.getDouble(qBase + j) - flat(base + j)
        d += diff * diff
        j += 1
      }
      s += 1
    }
    d
  }

  /** Per-subspace nearest-centroid encode (squared L2, ties → lowest
    * index — `Similarity.nearest`'s rule, bit-identical). */
  def encode(v: ArrayData): ArrayData = {
    val n = v.numElements()
    if (n != dim) throw new IllegalArgumentException(
      s"graft_pq_encode: vector has $n dims but the PQ model expects " +
        s"${dim} (m=$m × dsub=$dsub)")
    var p = 0
    while (p < n) {
      if (v.isNullAt(p)) throw new IllegalArgumentException(
        s"graft_pq_encode: null element at vector position $p")
      p += 1
    }
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val qBase = s * dsub
      var best = 0
      var bestD = Double.MaxValue
      var i = 0
      while (i < k) {
        val base = (s * k + i) * dsub
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val t = v.getDouble(qBase + j) - flat(base + j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = i }
        i += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }
}

object PqKernel {
  /** `m dsub k;v0,v1,...` — flat [subspace][centroid][dim] order;
    * `Double.toString`/`parseDouble` round-trips every finite double
    * exactly, so serialization is lossless. */
  def serialize(m: Int, dsub: Int, k: Int,
                codebooks: Array[Array[Array[Double]]]): String = {
    val sb = new java.lang.StringBuilder(m * k * dsub * 22 + 16)
    sb.append(m).append(' ').append(dsub).append(' ').append(k).append(';')
    var first = true
    var s = 0
    while (s < m) {
      var i = 0
      while (i < k) {
        val ctr = codebooks(s)(i)
        var j = 0
        while (j < dsub) {
          if (!first) sb.append(',')
          sb.append(ctr(j))
          first = false
          j += 1
        }
        i += 1
      }
      s += 1
    }
    sb.toString
  }

  def parse(s: String): PqKernel = {
    val semi = s.indexOf(';')
    require(semi > 0, "PqKernel: malformed model string (no ';')")
    val head = s.substring(0, semi).split(' ')
    require(head.length == 3, "PqKernel: malformed model header")
    val m = head(0).toInt
    val dsub = head(1).toInt
    val k = head(2).toInt
    val parts = s.substring(semi + 1).split(',')
    require(parts.length == m * k * dsub,
      s"PqKernel: expected ${m * k * dsub} values, got ${parts.length}")
    val flat = new Array[Double](parts.length)
    var i = 0
    while (i < flat.length) { flat(i) = java.lang.Double.parseDouble(parts(i)); i += 1 }
    new PqKernel(m, dsub, k, flat)
  }
}

/** `graft_adc(qv array<double>, codes array<int>, model)` — see
  * [[PqKernel.adc]]. */
case class PqAdcExpression(left: Expression, right: Expression,
                           modelStr: String) extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc"

  @transient private lazy val kernel: PqKernel = PqKernel.parse(modelStr)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_adc requires (ARRAY<DOUBLE>, ARRAY<INT>), got ${l.catalogString} " +
        s"and ${r.catalogString}")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    kernel.adc(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the PARSED kernel rides the codegen references array (parsed
    // once per task), never the raw string per row
    val ref = ctx.addReferenceObj("pqKernel", kernel, classOf[PqKernel].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.adc($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqAdcExpression =
    copy(left = newLeft, right = newRight)
}

/** `graft_pq_encode(vec array<double>, model)` — see
  * [[PqKernel.encode]]. Output `array<int>` of length m, never null
  * elements. */
case class PqEncodeExpression(child: Expression, modelStr: String)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  @transient private lazy val kernel: PqKernel = PqKernel.parse(modelStr)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode requires ARRAY<DOUBLE>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqKernel", kernel, classOf[PqKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpression =
    copy(child = newChild)
}
