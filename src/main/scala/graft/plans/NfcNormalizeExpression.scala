package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — a
  * standard corpus-cleaning pass (web text mixes composed `é` with
  * decomposed `e`+U+0301; exact dedup, fingerprints and equality joins
  * all break across the two forms unless the corpus is normalized
  * first). Spark has no builtin for it; a Scala UDF would leave every
  * plan containing it interpreted. Registered in SQL as
  * `graft_nfc(str)`; DuckDB's `nfc_normalize` is the cross-engine
  * oracle.
  *
  * The common case (already-NFC ASCII/Latin text) is cheap:
  * `Normalizer.isNormalized` is a quick-check scan that avoids
  * allocating for strings that need no work. */
case class NfcNormalizeExpression(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NfcNormalize.nfc(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.plans.NfcNormalize.nfc($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpression =
    copy(child = newChild)
}

object NfcNormalize {
  def nfc(s: String): String =
    if (s == null) null
    else if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
}
