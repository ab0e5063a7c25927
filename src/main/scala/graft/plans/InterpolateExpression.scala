package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** F12 `%%token%%` interpolation as a native codegen'd expression —
  * `graft_interpolate(str, map<string,string>)`. Replaces the UDF form
  * (`Fns.interpolateUdf`): same semantics (unknown tokens become the
  * empty string, a lone `%%` with no valid token stays literal, null
  * string → null, null map = no tokens), but evaluated as one
  * monomorphic static call inside whole-stage codegen — no UDF
  * invocation plumbing, no Scala Map conversion per row, no regex
  * engine (a single manual scan). K15 placeholder substitution
  * (`WPMediaLoader.php:529-551`) is the hot caller: one body-sized
  * string scan per row instead of the UDF's row boxing + regex.
  *
  * Token grammar matches the UDF's `%%([A-Za-z0-9_.]+)%%`, scanned
  * left-to-right with single-char advance on failed opens (regex
  * backtracking semantics) — pinned to the UDF by a property spec.
  */
case class InterpolateExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  // always-nullable: nullSafeCodeGen-style isNull locals are declared
  // unconditionally, so janino never sees `boolean false = ...` (the
  // graft_dot non-nullable fallback bug); CODEGEN_ONLY spec pins it
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_interpolate"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, MapType(StringType, StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_interpolate requires (STRING, MAP<STRING,STRING>), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val s = left.eval(input)
    if (s == null) null
    else {
      val m = right.eval(input) // null map = no tokens resolve
      Interpolate.run(s.asInstanceOf[UTF8String], m.asInstanceOf[MapData])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val mapCls = classOf[MapData].getName
    val utf8 = classOf[UTF8String].getName
    val mv = ctx.freshName("interpMap")
    ev.copy(code = code"""
      ${l.code}
      boolean ${ev.isNull} = ${l.isNull};
      $utf8 ${ev.value} = null;
      if (!${ev.isNull}) {
        ${r.code}
        $mapCls $mv = ${r.isNull} ? null : ${r.value};
        ${ev.value} = graft.plans.Interpolate.run(${l.value}, $mv);
      }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): InterpolateExpression =
    copy(left = newLeft, right = newRight)
}

object Interpolate {
  private def isTokenChar(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '_' || c == '.'

  /** Linear scan over the (small) token map — placeholder maps carry a
    * handful of entries; a per-row hash map build would cost more than
    * the lookups it saves. */
  private def lookup(m: MapData, s: String, from: Int, to: Int): String = {
    if (m == null) return ""
    val keys = m.keyArray()
    val vals = m.valueArray()
    var i = 0
    val len = to - from
    while (i < m.numElements()) {
      val k = keys.getUTF8String(i)
      if (k != null && k.numChars() == len && k.toString == s.substring(from, to))
        return if (vals.isNullAt(i)) "" else vals.getUTF8String(i).toString
      i += 1
    }
    ""
  }

  def run(u: UTF8String, m: MapData): UTF8String = {
    val s = u.toString
    if (s.indexOf("%%") < 0) return u
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && s.charAt(i) == '%' && s.charAt(i + 1) == '%') {
        var j = i + 2
        while (j < n && isTokenChar(s.charAt(j))) j += 1
        if (j > i + 2 && j + 1 < n && s.charAt(j) == '%' && s.charAt(j + 1) == '%') {
          sb.append(lookup(m, s, i + 2, j))
          i = j + 2
        } else { sb.append('%'); i += 1 } // failed open: advance one char
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }
}
