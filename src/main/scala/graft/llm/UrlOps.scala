package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level filtering — the FIRST stage of the published web-corpus
  * curation pipelines (RefinedWeb arXiv:2306.01116 §3.1 "URL
  * filtering"; FineWeb): documents are kept or dropped on their source
  * URL alone, before any text is read — domain blocklists (adult/
  * fraud/spam lists run to millions of entries), URL-substring keyword
  * rules, and scheme checks.
  *
  * Scale shape: everything here is map-only column work except the
  * blocklist membership, which is a broadcast HASH anti-join in
  * [[filterByUrl]] (one per match key — an OR'd join condition would
  * degrade to a nested-loop against the broadcast, so host and
  * registrable-domain membership are two successive equi anti-joins).
  * At 100 TB this is the cheapest filter in the pipeline — a short
  * column scan with zero shuffles — which is exactly why the published
  * pipelines run it first.
  */
object UrlOps {

  /** A URL has an OPAQUE scheme (mailto:, javascript:, tel:) when a
    * scheme prefix is present without the `//` authority marker — such
    * URLs have no host at all. Expressed as two rlikes, NOT a
    * lookahead: the oracle replays this in RE2 (DuckDB), which has no
    * lookahead. Note an RFC-3986 quirk this inherits: "host:port/x"
    * without a scheme parses as opaque (the host reads as a scheme). */
  private val schemePrefixRe = "^[a-zA-Z][a-zA-Z0-9+.-]*:"
  private val schemeAuthRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://"
  private def isOpaque(c: Column): Column =
    c.rlike(schemePrefixRe) && !c.rlike(schemeAuthRe)

  /** Lowercased host of a URL: strips scheme, userinfo, port, path,
    * query, fragment; keeps subdomains. Scheme-less and
    * protocol-relative (`//host/…`) inputs resolve to their leading
    * authority; opaque-scheme URLs (no `//`) have no host → empty
    * string. Pure regexp — codegen'd. */
  def urlHost(c: Column): Column =
    when(isOpaque(c), lit(""))
      .otherwise(lower(regexp_extract(c,
        "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://|//)?(?:[^/@?#]*@)?([^/:?#]+)", 1)))

  /** Naive registrable domain: the last two labels of the host
    * ("a.b.example.com" → "example.com"; single-label hosts pass
    * through). Deliberately NOT public-suffix-aware — a PSL lookup
    * needs a broadcast table and belongs in the blocklist frame of
    * [[filterByUrl]]; this column form is the cheap in-plan
    * approximation the substring rules compose with. */
  def urlDomain(host: Column): Column =
    Dedup.letBound(split(host, "\\.")) { parts =>
      when(size(parts) >= 2,
        concat_ws(".", element_at(parts, -2), element_at(parts, -1)))
        .otherwise(host)
    }

  /** Public-suffix-aware registrable domain
    * ([[graft.plans.RegistrableDomainExpression]], SQL
    * `graft_registrable_domain`): `www.example.co.uk` → `example.co.uk`
    * when the rule table holds `co.uk`. `psl` is PSL-file syntax (plain
    * rules, `*.` wildcards, `!` exceptions; `//` comments tolerated) —
    * a BOUNDED static table (~10k lines for the full public list) that
    * rides the plan as one literal, parsed once per task into hash
    * sets: O(host labels) per row with O(1) probes, inside
    * WholeStageCodegen, zero joins. An empty rule table reproduces
    * [[urlDomain]]'s naive last-two-labels exactly (the implicit `*`
    * rule). Caller's session needs `GraftExtensions.register`. */
  def registrableDomain(host: Column, psl: Seq[String]): Column =
    call_function("graft_registrable_domain", host, lit(psl.mkString("\n")))

  /** A bundled VERBATIM excerpt of the real Public Suffix List
    * (publicsuffix.org, MPL-2.0 — see the resource header), covering
    * the rule classes production lists exercise: ccSLD plain rules
    * (`co.uk`, `co.jp`, `com.au`), the wildcard ccTLD `*.ck` with its
    * exception `!www.ck`, gTLDs, comments, blank lines. This is what
    * config-driven pipelines get by default when they ask for
    * PSL-aware URL filtering without supplying their own list; swap in
    * the full ~250 KB list the same way (it is still one bounded plan
    * literal). */
  lazy val bundledPsl: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_slice.dat")
    require(in != null, "graft/public_suffix_slice.dat missing from resources")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    finally in.close()
  }

  /** Scheme is http(s), protocol-relative, or absent (crawl corpora
    * are http(s)); opaque schemes (mailto:, javascript:, tel:) and
    * other authority schemes (ftp://) are dropped. */
  def urlSchemeOk(c: Column): Column =
    !isOpaque(c) &&
      Dedup.letBound(lower(regexp_extract(c,
        "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))) { s =>
        s === "" || s === "http" || s === "https"
      }

  /** Literal-list keep decision for config-driven use with SMALL lists:
    * scheme ok, host and registrable domain not in `blockedDomains`,
    * and no `blockedKeywords` substring in the lowercased URL. For
    * million-entry lists use [[filterByUrl]] (broadcast anti-join)
    * instead of a literal array.
    *
    * `psl`: public-suffix rules for the domain key, exactly as on
    * [[filterByUrl]] — with rules, a blocklisted ccSLD entry
    * (`example.co.uk`) blocks its subdomain hosts via
    * [[registrableDomain]]; empty keeps the naive last-two-labels key.
    * Callers passing `psl` need `GraftExtensions.register`. */
  def urlOk(c: Column, blockedDomains: Seq[String] = Nil,
            blockedKeywords: Seq[String] = Nil,
            psl: Seq[String] = Nil): Column = {
    val host = urlHost(c)
    val base = urlSchemeOk(c)
    val domRule =
      if (blockedDomains.isEmpty) lit(true)
      else {
        val bad = array(blockedDomains.map(d => lit(d.toLowerCase)): _*)
        val domKey: Column => Column =
          if (psl.isEmpty) urlDomain else registrableDomain(_, psl)
        Dedup.letBound(host) { h =>
          !array_contains(bad, h) && !array_contains(bad, domKey(h))
        }
      }
    val kwRule = blockedKeywords
      .map(k => !lower(c).contains(k.toLowerCase))
      .reduceOption(_ && _).getOrElse(lit(true))
    base && domRule && kwRule
  }

  /** Tracking query parameters stripped by [[canonicalizeUrl]]: the
    * analytics/click-id keys that make one page crawl as many URLs
    * (the reason URL-level dedup needs canonicalization first). */
  private val trackingParamRe =
    "(?:utm_[a-z]+|fbclid|gclid|msclkid|mc_cid|mc_eid|ref|igshid)"

  /** Canonical form of a URL for URL-LEVEL DEDUP — the step before
    * exact-dedup on the URL column collapses the same page crawled
    * under many addresses: lowercase scheme+host, drop the fragment,
    * strip tracking query parameters ([[trackingParamRe]]; a query
    * left empty loses its `?`), drop a trailing `/` on a non-root
    * path. Pure regexp chain — codegen'd, map-only, RE2-replayable
    * (no lookbehind). Path and retained query keep their case (they
    * are case-significant per RFC 3986). */
  def canonicalizeUrl(c: Column): Column = {
    // case-fold ONLY the scheme://authority prefix (path/query are
    // case-significant per RFC 3986): extract it, lower it, re-attach
    // the remainder by length
    val auth = regexp_extract(c, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    val canon0 = Dedup.letBound(auth) { a =>
      concat(lower(a), substring(c, length(a) + 1, lit(Int.MaxValue)))
    }
    // drop fragment
    val noFrag = regexp_replace(canon0, "#.*$", "")
    // strip tracking params wherever they sit in the query, then tidy
    // separators: "?&" -> "?", "&&" -> "&", trailing "?"/"&" dropped
    val noTrack = regexp_replace(noFrag,
      s"([?&])$trackingParamRe=[^&#]*", "$1")
    val tidied = regexp_replace(
      regexp_replace(regexp_replace(noTrack, "\\?&+", "?"), "&&+", "&"),
      "[?&]+$", "")
    // trailing slash on a non-root path (keep "https://h/" as-is)
    regexp_replace(tidied, "(://[^/?#]+/.+?)/$", "$1")
  }

  /** The scale path: drop every row whose URL host OR registrable
    * domain appears in the blocklist FRAME (UT1-style lists are
    * millions of domains — too big for a literal, right-sized for a
    * broadcast), plus the keyword and scheme rules. Two successive
    * broadcast hash anti-joins (host, then domain) — never an OR'd
    * join condition, which would forfeit the hash join.
    *
    * `psl`: public-suffix rules for the domain key. UT1-style lists
    * are full of ccSLD domains (`example.co.uk`), which the naive
    * last-two-labels key can never subdomain-match (`www.example.co.uk`
    * keys as `co.uk`); with a PSL the key is the true registrable
    * domain ([[registrableDomain]] — still map-only column work, so
    * the plan stays exactly two broadcast hash anti-joins). Empty
    * `psl` keeps the naive key. Callers passing `psl` need
    * `GraftExtensions.register` on the session. */
  def filterByUrl(df: DataFrame, urlCol: String, blocklist: DataFrame,
                  domainCol: String = "domain",
                  blockedKeywords: Seq[String] = Nil,
                  psl: Seq[String] = Nil): DataFrame = {
    val bl = broadcast(
      blocklist.select(lower(col(domainCol)).as("__graft_bad")).distinct())
    val kwRule = blockedKeywords
      .map(k => !lower(col(urlCol)).contains(k.toLowerCase))
      .reduceOption(_ && _).getOrElse(lit(true))
    val domKey =
      if (psl.isEmpty) urlDomain(col("__graft_host"))
      else registrableDomain(col("__graft_host"), psl)
    df.withColumn("__graft_host", urlHost(col(urlCol)))
      .withColumn("__graft_dom", domKey)
      .where(urlSchemeOk(col(urlCol)) && kwRule)
      .join(bl, col("__graft_host") === col("__graft_bad"), "left_anti")
      .join(bl, col("__graft_dom") === col("__graft_bad"), "left_anti")
      .drop("__graft_host", "__graft_dom")
  }
}
