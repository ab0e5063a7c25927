package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** zlib-deflated byte length as a native codegen'd expression —
  * `graft_deflate_len(str|binary)`. The compression ratio
  * (deflated / raw bytes) is a classic one-number corpus-quality
  * signal: highly repetitive machine-generated text compresses far
  * below natural prose, while random/encrypted/binary junk doesn't
  * compress at all, so both tails of the ratio distribution flag
  * documents to drop (the heuristic family popularized by the Gopher
  * quality rules). Works on `binary` too, which makes it a cheap
  * corrupt-blob probe for multimodal columns.
  *
  * Map-only and shuffle-free; the deflate itself is the cost (a few
  * hundred MB/s/core at level 6), which at 100 TB argues for running
  * it fused into an existing scan pass — it composes into
  * [[graft.llm.TextAnalysis.qualityStats]]-style single-pass selects.
  * Deterministic for a given JDK's bundled zlib; scored thresholds,
  * not raw lengths, are the portable surface (the registered query's
  * oracle states engine-independent booleans on controlled inputs).
  */
case class DeflateLenExpression(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_deflate_len"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType || child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_len requires STRING or BINARY, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => DeflateLen.len(s.getBytes)
    case b: Array[Byte] => DeflateLen.len(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"graft.plans.DeflateLen.len($c.getBytes())")
      case _ =>
        defineCodeGen(ctx, ev, c => s"graft.plans.DeflateLen.len($c)")
    }

  override protected def withNewChildInternal(newChild: Expression): DeflateLenExpression =
    copy(child = newChild)
}

object DeflateLen {
  // one native zlib stream per executor thread, reset() between rows —
  // allocating/ending a Deflater per row costs on the order of the
  // deflate itself for typical document sizes
  private val local: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() =>
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true))

  /** Raw-deflate (nowrap — no zlib header/checksum, so the length
    * reflects only the entropy coding) at the default level 6.
    * Deterministic for a given input regardless of stream reuse. */
  def len(bytes: Array[Byte]): Long = {
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
