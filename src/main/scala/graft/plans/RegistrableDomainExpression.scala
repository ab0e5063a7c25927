package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Public-suffix-aware registrable-domain extraction as a native
  * expression (SQL name `graft_registrable_domain(host, rules)`).
  *
  * The naive "last two labels" column form (`UrlOps.urlDomain`) is
  * wrong for ccSLD hosts: `www.example.co.uk` → `co.uk`, so a
  * blocklist entry `example.co.uk` matches the apex host but misses
  * every subdomain — and UT1-style blocklists are full of ccSLD
  * domains. This expression implements the publicsuffix.org matching
  * algorithm over a caller-supplied rule table (plain rules, `*.`
  * wildcard rules, `!` exception rules; `//` comments and blank lines
  * tolerated so a verbatim PSL file slice parses).
  *
  * Scale shape: the PSL is a BOUNDED static table (~10k lines, ~240 KB
  * for the full public list), so it rides into the plan as one string
  * literal — the same convention as the BPE merge ladder
  * ([[BpeEncodeExpression]]) — and each task parses it once into hash
  * sets ([[PslRules]] caches lazily). Per row the walk is
  * O(labels) with O(1) set probes, fully inside WholeStageCodegen: no
  * join, no shuffle, no per-row linear scan of the rule list (an
  * `array_contains` over a 10k literal array would be O(rules) per
  * row). This beats the 4-way broadcast-left-join formulation — the
  * only other shuffle-free shape — by keeping the scan map-only and
  * single-pass.
  *
  * Matching semantics (publicsuffix.org/list/ algorithm): exception
  * rules prevail over everything; otherwise the rule with the most
  * labels wins; if no rule matches, the implicit `*` rule makes the
  * last label the public suffix (so an EMPTY rule set reproduces the
  * naive last-two-labels form exactly). The registrable domain is the
  * public suffix plus one label; a host that IS a public suffix passes
  * through unchanged (it still blocklist-matches via the host join).
  */
case class RegistrableDomainExpression(child: Expression, rulesStr: String)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_registrable_domain"

  @transient private lazy val rules: PslRules = PslRules.parse(rulesStr)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_registrable_domain requires STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      rules.registrable(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the PARSED rules ride the codegen references array (parsed once
    // per task), not the raw string re-parsed per row
    val ref = ctx.addReferenceObj("pslRules", rules, classOf[PslRules].getName)
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"$ref.registrable($c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): RegistrableDomainExpression =
    copy(child = newChild)
}

/** Parsed public-suffix rule table with O(1) per-suffix membership.
  * Serializable: shipped inside the codegen references array / task
  * closure, parsed once per executor task, shared across rows. */
final class PslRules(
    val plain: Set[String],
    val wildcardBases: Set[String],
    val exceptions: Set[String]) extends Serializable {

  /** Longest rule length bounds the suffix walk: no point assembling
    * suffixes longer than any rule could match (+1 for wildcards,
    * whose public suffix is one label longer than the stored base). */
  private val maxRuleLabels: Int = {
    def labels(s: Set[String]) = if (s.isEmpty) 0 else s.iterator.map(_.count(_ == '.') + 1).max
    math.max(math.max(labels(plain), labels(wildcardBases) + 1), labels(exceptions))
  }

  /** publicsuffix.org algorithm; see [[RegistrableDomainExpression]].
    * Input is expected lowercase (callers feed `urlHost`, which
    * lowers); lowercased defensively since set probes are case-exact. */
  def registrable(hostRaw: String): String = {
    if (hostRaw == null) return null
    val host =
      if (hostRaw.exists(c => c >= 'A' && c <= 'Z'))
        host2Lower(hostRaw)
      else hostRaw
    if (host.isEmpty) return host
    val parts = host.split('.')
    val n = parts.length
    // one right-to-left pass: build each suffix incrementally, probe
    // all three rule classes; `prev` (the k-1 suffix) is the wildcard
    // base for a k-label public suffix
    var suffix: String = null
    var prev: String = null
    var psLen = 1 // the implicit "*" rule: last label is a public suffix
    var exception: String = null
    var k = 1
    val kMax = math.min(n, maxRuleLabels + 1)
    while (k <= kMax) {
      prev = suffix
      suffix = if (k == 1) parts(n - 1) else parts(n - k) + "." + suffix
      if (exception == null && exceptions.contains(suffix)) exception = suffix
      if (plain.contains(suffix)) psLen = math.max(psLen, k)
      if (k >= 2 && wildcardBases.contains(prev)) psLen = math.max(psLen, k)
      k += 1
    }
    // exception rule prevails: its public suffix is the rule minus the
    // leftmost label, so the registrable domain is the rule itself
    if (exception != null) return exception
    if (n <= psLen) host // host IS a public suffix
    else {
      val sb = new java.lang.StringBuilder(host.length)
      var i = n - psLen - 1
      while (i < n) {
        if (sb.length > 0) sb.append('.')
        sb.append(parts(i))
        i += 1
      }
      sb.toString
    }
  }

  private def host2Lower(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      i += 1
    }
    sb.toString
  }
}

object PslRules {
  /** Parse PSL-file syntax: one rule per line; `//` comments and blank
    * lines skipped; `!rule` → exception, `*.base` → wildcard (base
    * stored), else plain. Rules are lowercased (PSL files are ASCII
    * lowercase already; defensive). */
  def parse(text: String): PslRules = {
    val plain = Set.newBuilder[String]
    val wild = Set.newBuilder[String]
    val exc = Set.newBuilder[String]
    text.split('\n').foreach { raw =>
      val line = raw.trim.toLowerCase(java.util.Locale.ROOT)
      if (line.nonEmpty && !line.startsWith("//")) {
        if (line.startsWith("!")) exc += line.substring(1)
        else if (line.startsWith("*.")) wild += line.substring(2)
        else plain += line
      }
    }
    new PslRules(plain.result(), wild.result(), exc.result())
  }
}
