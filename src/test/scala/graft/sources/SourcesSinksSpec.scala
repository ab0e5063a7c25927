package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sinks.Sinks

class SourcesSinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_spec").toFile.getPath

  test("csv roundtrip preserves values (S1/K2)") {
    val dir = tmp() + "/csv"
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5)).toDF("id", "name", "x")
    Sinks.writeCsv(df, dir)
    val back = Sources.readCsv(spark, dir)
      .select(col("id").cast("long"), col("name"), col("x").cast("double"))
    assert(rowsOf(back) == rowsOf(df))
  }

  test("single-file json writer produces exactly one file at the path (K1)") {
    val path = tmp() + "/out.json"
    Sinks.writeJsonSingle(Seq((1, "a"), (2, "b")).toDF("id", "v"), path)
    val f = new java.io.File(path)
    assert(f.isFile)
    val lines = scala.io.Source.fromFile(f).getLines().toList
    assert(lines.size == 2 && lines.forall(_.startsWith("{")))
  }

  test("pretty json writes an indented array (K1 flags)") {
    val path = tmp() + "/pretty.json"
    Sinks.writeJsonSingle(Seq((1, "a")).toDF("id", "v"), path, pretty = true)
    val body = scala.io.Source.fromFile(path).mkString
    assert(body.startsWith("[\n") && body.endsWith("\n]"))
  }

  test("destination naming: overwrite vs timestamped (K1 dest)") {
    assert(Sinks.destination("/d", "f.json", overwrite = true) == "/d/f.json")
    assert(Sinks.destination("/d", "f.json", overwrite = false, timestamp = 42L)
      == "/d/f-42.json")
  }

  test("xml reader extracts node-path rows with union-of-children columns (S3)") {
    val dir = tmp()
    val f = new java.io.File(dir, "feed.xml")
    Files.write(f.toPath,
      ("<rss><channel><item><a>1</a><b>x</b></item>" +
        "<item><a>2</a><c>y</c></item></channel></rss>").getBytes("UTF-8"))
    val df = Sources.readXml(spark, f.getPath)
    assert(df.columns.toSet == Set("a", "b", "c"))
    val rows = df.collect().map(r =>
      (r.getAs[String]("a"), r.getAs[String]("b"), r.getAs[String]("c"))).toSet
    assert(rows == Set(("1", "x", null), ("2", null, "y")))
  }

  test("distributed xml reader matches the driver-side parse (S3 scale path)") {
    val dir = tmp()
    val f = new java.io.File(dir, "big.xml")
    Files.write(f.toPath,
      ("<rss><channel>" +
        "<item><a>1</a><b>x &amp; y</b></item>" +
        "<item><a>2</a><c>z</c></item>" +
        "<item><a>3</a><b>q&lt;r</b><c>w</c></item>" +
        "</channel></rss>").getBytes("UTF-8"))
    val dist = Sources.readXmlDistributed(spark, f.getPath)
    assert(dist.columns.toSet == Set("a", "b", "c"))
    val rows = dist.collect().map(r =>
      (r.getAs[String]("a"), r.getAs[String]("b"), r.getAs[String]("c"))).toSet
    // entity unescape + union-of-children with nulls, as readXml
    assert(rows == Set(("1", "x & y", null), ("2", null, "z"), ("3", "q<r", "w")))
    val direct = Sources.readXml(spark, f.getPath)
    assert(rowsOf(direct.select("a", "b", "c")) == rowsOf(dist.select("a", "b", "c")))
  }

  test("distributed xml reader unwraps CDATA literally and ignores its tags (S3)") {
    val dir = tmp()
    val f = new java.io.File(dir, "cdata.xml")
    Files.write(f.toPath,
      ("<rss><channel>" +
        "<item><title>t1</title><body><![CDATA[<p>html &amp; stays</p>]]></body></item>" +
        "<item><title>t &amp; 2</title><body>plain &lt;escaped&gt;</body></item>" +
        "</channel></rss>").getBytes("UTF-8"))
    val dist = Sources.readXmlDistributed(spark, f.getPath)
    // <p> inside CDATA must NOT become a column
    assert(dist.columns.toSet == Set("title", "body"))
    val rows = dist.collect().map(r =>
      (r.getAs[String]("title"), r.getAs[String]("body"))).toSet
    // CDATA payload literal (entities NOT decoded); non-CDATA unescaped
    assert(rows == Set(
      ("t1", "<p>html &amp; stays</p>"),
      ("t & 2", "plain <escaped>")))
    // same semantics as the driver-side parser
    val direct = Sources.readXml(spark, f.getPath)
    assert(rowsOf(direct.select("title", "body")) == rowsOf(dist.select("title", "body")))
  }

  test("rss reader caches by md5(url) and rereads from cache (S4)") {
    val dir = tmp()
    val f = new java.io.File(dir, "feed.xml")
    Files.write(f.toPath,
      "<rss><channel><item><t>hello</t></item></channel></rss>".getBytes("UTF-8"))
    val cacheDir = tmp()
    val url = f.toURI.toString
    val df1 = Sources.readRss(spark, url, cacheDir)
    assert(df1.select("t").as[String].head() == "hello")
    assert(Sources.cachePath(cacheDir, url).exists())
    // source file deleted -> served from cache
    f.delete()
    val df2 = Sources.readRss(spark, url, cacheDir)
    assert(df2.select("t").as[String].head() == "hello")
  }

  test("rss multi-source fans out pages and merges by name (S5)") {
    val dir = tmp()
    for (p <- 1 to 2) {
      Files.write(new java.io.File(dir, s"p$p.xml").toPath,
        s"<rss><channel><item><v>$p</v></item></channel></rss>".getBytes("UTF-8"))
    }
    val cacheDir = tmp()
    val df = Sources.readRssMultiSource(spark,
      new java.io.File(dir, "p%d.xml").toURI.toString.replace("p%25d", "p%d"),
      cacheDir, start = 1, maxPages = 2)
    assert(df.select("v").as[String].collect().toSet == Set("1", "2"))
  }

  test("ledger write + glob-latest read-back (K16/S10)") {
    val dir = tmp()
    val df = Seq(("u1", 1L, "ok"), ("u2", 2L, "ok"))
      .toDF("etl.uid", "ledger.id", "ledger.status")
    Sinks.writeLedger(df, dir, "job", "001")
    Sinks.writeLedger(df.limit(1), dir, "job", "002") // later run wins
    val back = Sources.ledgerLatest(spark, dir, "job")
    assert(back.count() == 1)
    assert(back.columns.toSet == Set("etl_uid", "id", "status"))
  }

  test("file finder searches subdirectories (S11)") {
    val dir = tmp()
    val sub = new java.io.File(dir, "a/b"); sub.mkdirs()
    val f = new java.io.File(sub, "target.csv")
    Files.write(f.toPath, "x".getBytes)
    assert(Sources.findFile(dir, "target.csv").map(_.getName).contains("target.csv"))
    assert(Sources.findFile(dir, "absent.csv").isEmpty)
  }

  test("runChain: enrichment output feeds later sinks (K6 row-mutation)") {
    val df = Seq((1, "a")).toDF("id", "v")
    var seen: Option[Set[String]] = None
    val out = Sinks.runChain(df, Seq(
      Sinks.Enrich("add-id", d => d.withColumn("gen_id", col("id") + 100)),
      Sinks.Write("capture", d => seen = Some(d.columns.toSet))))
    assert(seen.contains(Set("id", "v", "gen_id")))
    assert(out.columns.contains("gen_id"))
  }

  test("bucketed tables join without a shuffle exchange on either side") {
    import org.apache.spark.sql.functions.col
    // stale managed-table locations survive the (per-JVM, in-memory)
    // metastore — clear both catalog entries and directories first
    Seq("bspec_a", "bspec_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(loc)
    }
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Sinks.writeBucketed(a, "bspec_a", Seq("k"), numBuckets = 4)
    Sinks.writeBucketed(b, "bspec_b", Seq("k"), numBuckets = 4)
    val joined = spark.table("bspec_a").join(spark.table("bspec_b"), "k")
    // force a sort-merge plan so the bucket layout (not a broadcast)
    // carries the join, then assert no shuffle exchange anywhere
    val smj = joined.hint("merge")
    smj.collect()
    val plan = smj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
  }

  test("expandComposite expands wp_post_all in fixed order with dedup (K17)") {
    val out = Sinks.expandComposite(Seq("wp_post_media", "wp_post_all", "ledger"))
    assert(out == Seq("wp_post_media", "wp_post", "wp_post_meta", "wp_post_terms", "ledger"))
  }

  test("compactParquet merges small files, preserves data, swaps atomically") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toFile.getPath + "/t"
    spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v"))
      .repartition(20).write.parquet(dir)
    def parts = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts == 20)
    val n = Sinks.compactParquet(spark, dir, targetRowsPerFile = 500)
    assert(n == 2 && parts == 2)
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    assert(back.agg(org.apache.spark.sql.functions.sum(col("v"))).head().getLong(0)
      == (0L until 1000L).map(_ * 2).sum)
    // no leftover staging/old dirs
    val siblings = new java.io.File(dir).getParentFile.listFiles().map(_.getName).toSet
    assert(siblings == Set("t"), siblings.toString)
  }

  test("writePartitioned lays out col=value dirs; filtered scan prunes partitions") {
    import spark.implicits._
    val dir = "/tmp/graft_test/part_write/t"
    val df = Seq((1L, "en", 10L), (2L, "de", 20L), (3L, "en", 30L), (4L, "fr", 40L))
      .toDF("doc_id", "lang", "n")
    Sinks.writePartitioned(df, dir, Seq("lang"))
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == Set("lang=en", "lang=de", "lang=fr"))
    val scan = spark.read.parquet(dir).where(col("lang") === "en")
    // pruning is a PartitionFilter on the scan node, not a data filter
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert("PartitionFilters: \\[[^\\]]*lang[^\\]]*\\]".r.findFirstIn(plan).isDefined, plan)
    assert(scan.select("doc_id", "n").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (3L, 30L)))
  }

  test("zValue interleaves bits; writeZOrdered yields disjoint per-file z-ranges") {
    import spark.implicits._
    // reference interleave on the driver
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, j) =>
        acc | (((x >> j) & 1L) << (j * 2)) | (((y >> j) & 1L) << (j * 2 + 1))
      }
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (170L, 85L))
    val got = samples.toDF("x", "y")
      .select(Sinks.zValue(Seq(col("x"), col("y")), bits = 8).as("z"))
      .as[Long].collect().toSeq
    assert(got == samples.map { case (x, y) => ref(x, y, 8) })
    // layout: z-ranges of distinct files must not overlap
    val dir = "/tmp/graft_test/zorder/t"
    val df = (0L until 1024L).map(i => (i % 32, (i * 7) % 32)).toDF("a", "b")
    Sinks.writeZOrdered(df, dir, Seq("a", "b"), bits = 5, numFiles = 4)
    val byFile = spark.read.parquet(dir)
      .select(Sinks.zValue(Seq(col("a"), col("b")), 5).as("z"))
      .withColumn("f", input_file_name())
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(byFile.length > 1)
    byFile.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("writeZOrdered rescales out-of-range domains instead of aliasing") {
    import spark.implicits._
    intercept[IllegalArgumentException](Sinks.zValue(Seq(col("a")), bits = 0))
    // negatives and values >> 2^bits; b constant, so the z-order is the
    // order of rescaled a — per-file a-ranges must still be disjoint
    val dir = "/tmp/graft_test/zorder/rescale"
    val df = (0L until 512L).map(i => (i * 1000000L - 256000000L, 1L))
      .toDF("a", "b")
    Sinks.writeZOrdered(df, dir, Seq("a", "b"), bits = 5, numFiles = 4)
    val byFile = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy("f").agg(min("a").as("lo"), max("a").as("hi"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(byFile.length > 1)
    byFile.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
    // a pre-existing __z0 column survives the write untouched
    val dir2 = "/tmp/graft_test/zorder/zcol"
    val df2 = (0L until 64L).map(i => (i, i * 2)).toDF("__z0", "v")
    Sinks.writeZOrdered(df2, dir2, Seq("v"), bits = 5, numFiles = 2)
    val back = spark.read.parquet(dir2)
    assert(back.columns.toSet == Set("__z0", "v"))
    assert(back.agg(sum("__z0")).as[Long].head() == (0L until 64L).sum)
  }

  test("orc write/read roundtrip preserves rows and schema") {
    import spark.implicits._
    val dir = "/tmp/graft_test/orc_rt/t"
    val df = Seq((1L, "a", 1.5), (2L, "b", -2.25)).toDF("id", "s", "v")
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    // read-back schema is nullable-relaxed; names and types must hold
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.as[(Long, String, Double)].collect().toSet ==
      Set((1L, "a", 1.5), (2L, "b", -2.25)))
  }

  test("readWarcWet: record framing, type filter, headers, len_ok") {
    val work = tmp()
    // one file mixing: a warcinfo record (dropped), an \n-framed
    // conversion record, a \r\n-framed one, an empty-payload one, and
    // a CORRUPTED one whose payload contains the record marker — the
    // split truncates it and len_ok must flag that instead of silently
    // passing truncated text downstream
    val wet = Seq(
      "WARC/1.0",
      "WARC-Type: warcinfo",
      "Software: test",
      "",
      "ignored payload",
      "WARC/1.0",
      "WARC-Type: conversion",
      "WARC-Target-URI: https://a.example/1",
      "WARC-Date: 2026-01-02T03:04:05Z",
      "Content-Length: 11",
      "",
      "hello world",
      "WARC/1.0\r",
      "WARC-Type: conversion\r",
      "WARC-Target-URI: https://b.example/2\r",
      "WARC-Date: 2026-01-02T03:04:06Z\r",
      "Content-Length: 8\r",
      "\r",
      "crlf doc",
      "WARC/1.0",
      "WARC-Type: conversion",
      "WARC-Target-URI: https://c.example/3",
      "WARC-Date: 2026-01-02T03:04:07Z",
      "Content-Length: 0",
      "",
      "WARC/1.0",
      "WARC-Type: conversion",
      "WARC-Target-URI: https://d.example/4",
      "WARC-Date: 2026-01-02T03:04:08Z",
      "Content-Length: 26",
      "",
      "first line",
      "WARC/1.0 appears mid-text"
    ).mkString("\n") + "\n"
    Files.write(new java.io.File(work, "seg.wet").toPath, wet.getBytes("UTF-8"))
    val out = graft.sources.Sources.readWarcWet(spark, s"$work/seg.wet")
      .orderBy("url")
      .as[(String, String, Long, String, Boolean)].collect().toSeq
    assert(out == Seq(
      ("https://a.example/1", "2026-01-02T03:04:05Z", 11L, "hello world", true),
      ("https://b.example/2", "2026-01-02T03:04:06Z", 8L, "crlf doc", true),
      ("https://c.example/3", "2026-01-02T03:04:07Z", 0L, "", true),
      // the corrupted record surfaces TRUNCATED (the marker split it)
      // with len_ok=false; the bogus trailing chunk has no WARC-Type
      // header and is dropped
      ("https://d.example/4", "2026-01-02T03:04:08Z", 26L, "first line", false)))
  }

  test("readWarcWet: payload legitimately ending in newline keeps it (len_ok)") {
    val work = tmp()
    // Content-Length 12 counts the payload's own trailing \n; the
    // record framing before the next marker adds one more newline.
    // Stripping EVERY trailing newline would shorten the payload to 11
    // and raise a false truncation alarm — Content-Length must
    // disambiguate the strip depth.
    val wet = "WARC/1.0\n" +
      "WARC-Type: conversion\n" +
      "WARC-Target-URI: https://nl.example/1\n" +
      "WARC-Date: 2026-01-02T00:00:00Z\n" +
      "Content-Length: 12\n" +
      "\n" +
      "ends with n\n" +
      "\n" +
      "WARC/1.0\n" +
      "WARC-Type: conversion\n" +
      "WARC-Target-URI: https://nl.example/2\n" +
      "WARC-Date: 2026-01-02T00:00:01Z\n" +
      "Content-Length: 5\n" +
      "\n" +
      "plain\n"
    Files.write(new java.io.File(work, "nl.wet").toPath, wet.getBytes("UTF-8"))
    val rows = graft.sources.Sources.readWarcWet(spark, s"$work/nl.wet")
      .orderBy("url")
      .as[(String, String, Long, String, Boolean)].collect().toSeq
    assert(rows == Seq(
      ("https://nl.example/1", "2026-01-02T00:00:00Z", 12L, "ends with n\n", true),
      ("https://nl.example/2", "2026-01-02T00:00:01Z", 5L, "plain", true)))
  }

  test("readWarcResponses: http parse, type/status/media columns, framing") {
    val work = tmp()
    def rec(uri: String, status: String, ctype: String, body: String,
            clOverride: Long = -1): String = {
      val http = s"HTTP/1.1 $status\nContent-Type: $ctype\nServer: t"
      val cl = if (clOverride >= 0) clOverride
        else http.length + 2 + body.length
      s"WARC/1.0\nWARC-Type: response\nWARC-Target-URI: $uri\n" +
        s"WARC-Date: 2026-02-02T00:00:00Z\nContent-Length: $cl\n\n" +
        http + "\n\n" + body
    }
    // a spec-standard CRLF-framed record: Content-Length counts the
    // 4-char header/body separator, and the recovered html must NOT
    // carry a trailing \r\n (the WARC headers' own line endings tell
    // the reader which framing the record uses)
    def recCrlf(uri: String, body: String): String = {
      val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nServer: t"
      val cl = http.length + 4 + body.length
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"WARC-Date: 2026-02-02T00:00:00Z\r\nContent-Length: $cl\r\n\r\n" +
        http + "\r\n\r\n" + body
    }
    val warc = Seq(
      // a request record the type filter must drop
      "WARC/1.0\nWARC-Type: request\nWARC-Target-URI: https://r.example/\n\nGET / HTTP/1.1",
      rec("https://a.example/1", "200 OK", "text/html; charset=UTF-8",
        "<html><body><p>hi</p></body></html>"),
      rec("https://b.example/2", "404 Not Found", "text/html", "<html>gone</html>"),
      rec("https://c.example/3", "200 OK", "application/pdf", "%PDF-1.4 junk"),
      // truncation: declared length exceeds what framing recovered
      rec("https://d.example/4", "200 OK", "text/html", "<p>cut", clOverride = 99999),
      recCrlf("https://e.example/5", "<html><body>crlf page</body></html>")
    ).mkString("\n") + "\n"
    Files.write(new java.io.File(work, "seg.warc").toPath, warc.getBytes("UTF-8"))
    val rows = graft.sources.Sources.readWarcResponses(spark, s"$work/seg.warc")
      .orderBy("url")
      .select("url", "http_status", "content_type", "html", "len_ok")
      .as[(String, Int, String, String, Boolean)].collect().toSeq
    assert(rows == Seq(
      ("https://a.example/1", 200, "text/html", "<html><body><p>hi</p></body></html>", true),
      ("https://b.example/2", 404, "text/html", "<html>gone</html>", true),
      ("https://c.example/3", 200, "application/pdf", "%PDF-1.4 junk", true),
      ("https://d.example/4", 200, "text/html", "<p>cut", false),
      ("https://e.example/5", 200, "text/html", "<html><body>crlf page</body></html>", true)))
  }

  test("readWarcWet: gzipped segments (the format WET actually ships in)") {
    // Common Crawl distributes .warc.wet.gz; Hadoop's codec layer
    // decompresses transparently for the text reader (per-file,
    // non-splittable — parallelism comes from the many segment files,
    // which is exactly how CC shards its crawls)
    val work = tmp()
    val wet = Seq(
      "WARC/1.0",
      "WARC-Type: conversion",
      "WARC-Target-URI: https://gz.example/1",
      "WARC-Date: 2026-01-02T00:00:00Z",
      "Content-Length: 10",
      "",
      "gzipped ok").mkString("\n") + "\n"
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$work/seg.wet.gz"))
    out.write(wet.getBytes("UTF-8")); out.close()
    val rows = graft.sources.Sources.readWarcWet(spark, s"$work/seg.wet.gz")
      .as[(String, String, Long, String, Boolean)].collect().toSeq
    assert(rows == Seq(
      ("https://gz.example/1", "2026-01-02T00:00:00Z", 10L, "gzipped ok", true)))
  }
}
