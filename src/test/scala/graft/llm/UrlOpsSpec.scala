package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def host(u: String): String =
    Seq(u).toDF("u").select(UrlOps.urlHost(col("u"))).as[String].collect().head
  private def domain(u: String): String =
    Seq(u).toDF("u").select(UrlOps.urlDomain(UrlOps.urlHost(col("u"))))
      .as[String].collect().head

  test("urlHost: scheme, userinfo, port, path, query, case, bare host") {
    assert(host("https://Example.COM/path?q=1") == "example.com")
    assert(host("http://user:pw@example.com:8080/p") == "example.com")
    assert(host("example.com/path") == "example.com")
    assert(host("//cdn.example.com/x.js") == "cdn.example.com")
    assert(host("ftp://files.example.com") == "files.example.com")
    assert(host("https://example.com#frag") == "example.com")
    assert(host("") == "")
  }

  test("urlDomain: registrable = last two labels; single label passes through") {
    assert(domain("https://a.b.example.com/x") == "example.com")
    assert(domain("https://example.com") == "example.com")
    assert(domain("http://localhost:9000") == "localhost")
  }

  test("registrableDomain: PSL plain/wildcard/exception rules, ccSLDs") {
    graft.plans.GraftExtensions.register(spark)
    val psl = Seq("co.uk", "org.uk", "*.ck", "!www.ck", "// comment", "")
    def reg(h: String): String =
      Seq(h).toDF("h").select(UrlOps.registrableDomain(col("h"), psl))
        .as[String].collect().head
    // ccSLD: registrable is THREE labels, subdomains collapse onto it
    assert(reg("www.example.co.uk") == "example.co.uk")
    assert(reg("a.b.example.co.uk") == "example.co.uk")
    assert(reg("example.co.uk") == "example.co.uk")
    // a host that IS a public suffix passes through
    assert(reg("co.uk") == "co.uk")
    // unlisted TLD falls back to the implicit '*' rule (= naive last-two)
    assert(reg("a.b.example.com") == "example.com")
    assert(reg("localhost") == "localhost")
    // wildcard *.ck: any x.ck is a public suffix → registrable has 3 labels
    assert(reg("www.shop.foo.ck") == "shop.foo.ck")
    // exception !www.ck prevails over *.ck: registrable IS www.ck
    assert(reg("www.ck") == "www.ck")
    assert(reg("sub.www.ck") == "www.ck")
    // defensive case-folding
    assert(reg("WWW.Example.CO.UK") == "example.co.uk")
    // empty rule table reproduces the naive form exactly
    def regEmpty(h: String): String =
      Seq(h).toDF("h").select(UrlOps.registrableDomain(col("h"), Nil))
        .as[String].collect().head
    assert(regEmpty("www.example.co.uk") == "co.uk")
    assert(regEmpty("single") == "single")
  }

  test("bundledPsl: VERBATIM production rules — ccSLDs, *.ck wildcard, !www.ck exception") {
    graft.plans.GraftExtensions.register(spark)
    val psl = UrlOps.bundledPsl
    // the resource is a verbatim PSL-syntax excerpt: comments, blanks,
    // a wildcard, an exception, plain rules — all must parse
    assert(psl.exists(_.startsWith("//")) && psl.contains("*.ck") &&
      psl.contains("!www.ck") && psl.contains("co.uk") && psl.contains("com.au"))
    def reg(h: String): String =
      Seq(h).toDF("h").select(UrlOps.registrableDomain(col("h"), psl))
        .as[String].collect().head
    // production ccSLD rules
    assert(reg("www.example.co.uk") == "example.co.uk")
    assert(reg("deep.sub.example.co.uk") == "example.co.uk")
    assert(reg("shop.example.com.au") == "example.com.au")
    assert(reg("www.example.co.jp") == "example.co.jp")
    // plain 1-label rules: com/net/org behave like the naive key
    assert(reg("a.b.example.com") == "example.com")
    // wildcard *.ck: <anything>.ck is a public suffix
    assert(reg("x.a.example.ck") == "a.example.ck")
    // exception !www.ck prevails over the wildcard
    assert(reg("www.ck") == "www.ck")
    assert(reg("sub.www.ck") == "www.ck")
    // a TLD with both a bare rule and ccSLD rules: apex under .au
    // (bare 'au' rule) vs under com.au
    assert(reg("example.au") == "example.au")
    // unlisted TLD falls back to the implicit '*' rule
    assert(reg("a.example.zz") == "example.zz")
  }

  test("filterByUrl with PSL: blocklisted ccSLD domain blocks subdomain hosts") {
    graft.plans.GraftExtensions.register(spark)
    val docs = Seq(
      (1L, "https://keep.example/a"),
      (2L, "https://www.example.co.test/b"),   // registrable hit via PSL
      (3L, "https://deep.sub.example.co.test/c"), // ditto, deeper
      (4L, "https://other.co.test/d")          // same ccSLD, different apex
    ).toDF("id", "url")
    val bl = Seq("example.co.test").toDF("domain")
    // WITHOUT a PSL the naive key is 'co.test' → every hit is missed
    val naive = UrlOps.filterByUrl(docs, "url", bl)
    assert(naive.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
    // with the PSL the registrable key is 'example.co.test' → blocked
    val out = UrlOps.filterByUrl(docs, "url", bl, psl = Seq("co.test"))
    assert(out.select("id").as[Long].collect().toSet == Set(1L, 4L))
    // plan shape is unchanged: two broadcast HASH anti-joins
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("urlOk with PSL: blocklisted ccSLD entry blocks subdomain hosts on the literal path") {
    graft.plans.GraftExtensions.register(spark)
    def ok(u: String, psl: Seq[String]): Boolean =
      Seq(u).toDF("u").select(UrlOps.urlOk(col("u"),
        Seq("example.co.test"), Nil, psl = psl)).as[Boolean].collect().head
    // naive key misses the subdomain (domain key = 'co.test')
    assert(ok("https://www.example.co.test/x", Nil))
    // with the PSL the registrable key is 'example.co.test' -> blocked
    assert(!ok("https://www.example.co.test/x", Seq("co.test")))
    assert(!ok("https://example.co.test/x", Seq("co.test")))
    assert(ok("https://other.co.test/x", Seq("co.test")))
  }

  test("urlOk: scheme, literal domain list (host AND registrable), keywords") {
    def ok(u: String, dom: Seq[String] = Nil, kw: Seq[String] = Nil): Boolean =
      Seq(u).toDF("u").select(UrlOps.urlOk(col("u"), dom, kw))
        .as[Boolean].collect().head
    assert(ok("https://good.example/x"))
    // non-http(s) schemes drop; opaque schemes have no host at all
    assert(!ok("ftp://good.example/x"))
    assert(!ok("javascript:alert(1)") && host("javascript:alert(1)") == "")
    assert(!ok("mailto:a@example.com") && host("mailto:a@example.com") == "")
    // exact host match
    assert(!ok("https://bad.example/x", dom = Seq("bad.example")))
    // registrable-domain match catches unlisted subdomains
    assert(!ok("https://sub.bad.example/x", dom = Seq("bad.example")))
    // but a listed SUBDOMAIN does not block its parent domain
    assert(ok("https://bad.example/x", dom = Seq("sub.bad.example")))
    // keyword is a case-insensitive substring of the full url
    assert(!ok("https://fine.example/play?game=CASINO", kw = Seq("casino")))
    // blocklist matching is case-insensitive on both sides
    assert(!ok("https://BAD.Example/x", dom = Seq("Bad.EXAMPLE")))
  }

  test("filterByUrl: broadcast anti-join on host and domain + keywords; plan is hash-join") {
    val docs = Seq(
      (1L, "https://keep.example/a"),
      (2L, "https://bad.example/b"),          // exact domain hit
      (3L, "https://x.bad.example/c"),        // registrable-domain hit
      (4L, "https://keep.example/casino"),    // keyword hit
      (5L, "ftp://keep.example/d"),           // scheme hit
      (6L, "https://listedhost.keep.example/e") // exact HOST hit
    ).toDF("id", "url")
    val bl = Seq("bad.example", "listedhost.keep.example").toDF("domain")
    val out = UrlOps.filterByUrl(docs, "url", bl,
      blockedKeywords = Seq("casino"))
    assert(out.select("id").as[Long].collect().toSet == Set(1L))
    assert(out.columns.toSeq == Seq("id", "url"))
    // the anti-joins must be broadcast HASH joins, not nested loops
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("canonicalizeUrl: each rule on its own case") {
    def canon(u: String): String =
      Seq(u).toDF("u").select(UrlOps.canonicalizeUrl(col("u")))
        .as[String].collect().head
    // authority case-folds; path/query case is preserved
    assert(canon("HTTPS://WWW.Example.COM/Path?Q=V") ==
      "https://www.example.com/Path?Q=V")
    // fragment dropped
    assert(canon("https://h.example/a#frag") == "https://h.example/a")
    // tracking params stripped wherever they sit; real params survive
    assert(canon("https://h.example/a?utm_source=x&id=1") ==
      "https://h.example/a?id=1")
    assert(canon("https://h.example/a?id=1&fbclid=zzz") ==
      "https://h.example/a?id=1")
    assert(canon("https://h.example/a?utm_a=1&utm_b=2&id=3") ==
      "https://h.example/a?id=3")
    // an only-tracking query disappears entirely (no dangling '?')
    assert(canon("https://h.example/a?utm_campaign=x") ==
      "https://h.example/a")
    // trailing slash dropped on a non-root path, kept at root
    assert(canon("https://h.example/a/b/") == "https://h.example/a/b")
    assert(canon("https://h.example/") == "https://h.example/")
    // params merely PREFIXED by a tracking name are untouched
    assert(canon("https://h.example/a?reftest=1&xref=2") ==
      "https://h.example/a?reftest=1&xref=2")
    // everything at once
    assert(canon("HTTPS://H.Example/a/?utm_source=f#x") ==
      "https://h.example/a")
  }

  test("curation_funnel cross-checks curate_web: survivor sum == row count") {
    def q(n: String) = graft.Queries.all.find(_.name == n).get.fn(spark, sfDir)
    val funnel = q("curation_funnel").select(
      sum(col("n_survived")), sum(col("n_quality_ok")), sum(col("n_docs")))
      .as[(Long, Long, Long)].collect().head
    assert(funnel._1 == q("curate_web").count())
    // funnel is monotone: each stage can only lose documents
    assert(funnel._1 <= funnel._2 && funnel._2 <= funnel._3)
  }
}
