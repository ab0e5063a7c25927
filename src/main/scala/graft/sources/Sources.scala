package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, length, regexp_replace, when}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.security.MessageDigest

import graft.columns.ColumnNs

/** Sources S1-S5, S9-S11 (SURVEY.md §2.1).
  *
  * File readers are the Spark builtins (distributed, splittable). XML
  * has two paths: [[readXml]] is a driver-side `scala.xml` parse (the
  * container ships no spark-xml) — the right cost model for the
  * reference's KB-MB RSS/config inputs (`AdapterFactory.php:152-169`) —
  * and [[readXmlDistributed]] is the scale path: item-delimited
  * splittable text input + codegen'd regex field extraction, for
  * exports too large for any single machine.
  */
object Sources {

  /** S1 — CSV scan (`AdapterFactory.php:63-72`). */
  def readCsv(spark: SparkSession, path: String, header: Boolean = true,
              delimiter: String = ",", inferSchema: Boolean = true): DataFrame =
    spark.read
      .option("header", header)
      .option("delimiter", delimiter)
      .option("inferSchema", inferSchema)
      .csv(path)

  /** S2 — JSON scan; reference JSON files are arrays of objects
    * (`AdapterFactory.php:80-89`), hence multiLine. Set
    * `multiLine=false` for JSONL at scale (splittable). */
  def readJson(spark: SparkSession, path: String, multiLine: Boolean = true): DataFrame =
    spark.read.option("multiLine", multiLine).json(path)

  /** S3 — XML scan with node path (default `rss/channel/item`,
    * `AdapterFactory.php:159`). Every emitted row has one string column
    * per child element of the node; the column set is the union over all
    * nodes (missing children are null), matching the row-merge union
    * semantics (`Extract/Orchestrator.php:216-227`). */
  def readXml(spark: SparkSession, path: String,
              nodePath: String = "rss/channel/item"): DataFrame = {
    val root = scala.xml.XML.loadFile(path)
    val segs = nodePath.split("/").filter(_.nonEmpty).toList
    val rel = if (segs.nonEmpty && segs.head == root.label) segs.tail else segs
    val nodes = rel.foldLeft(Seq[scala.xml.Node](root)) { (acc, seg) =>
      acc.flatMap(n => (n \ seg))
    }
    val rowsData: Seq[Map[String, String]] = nodes.map { n =>
      n.child.collect {
        case e: scala.xml.Elem => e.label -> e.text
      }.toMap
    }
    val colNames = rowsData.foldLeft(Vector.empty[String]) { (acc, m) =>
      acc ++ m.keys.filterNot(acc.contains)
    }
    val schema = StructType(colNames.map(c => StructField(c, StringType, nullable = true)))
    val rows = rowsData.map(m => Row.fromSeq(colNames.map(c => m.get(c).orNull)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toList), schema)
  }

  /** S3 at scale — DISTRIBUTED XML item reader: the file is split into
    * records on the closing item tag (`lineSep` — splittable Hadoop
    * text input, so a 100 GB export fans out across executors), and
    * fields are extracted with codegen'd regexes. Handles the flat
    * `<item><a>..</a><b>..</b></item>` element shape the reference
    * consumes (RSS items, WXR-style exports), including CDATA-wrapped
    * fields (unwrapped literally, not entity-unescaped; a CDATA payload
    * containing the field's own closing tag or `</item>` is NOT
    * supported — use [[readXml]] for config-scale documents needing a
    * full parser, likewise for attributes or nested same-name tags).
    * Missing children are null (union-of-columns
    * semantics, as [[readXml]]); the five XML entities are unescaped.
    * Tag discovery is one distributed pass whose DISTINCT tag set (not
    * data) is collected — the same shape as Spark's own schema
    * inference. */
  def readXmlDistributed(spark: SparkSession, path: String,
                         itemTag: String = "item"): DataFrame = {
    import org.apache.spark.sql.functions._
    val body = spark.read.option("lineSep", s"</$itemTag>").text(path)
      .select(regexp_extract(col("value"), s"(?s)<$itemTag(?:\\s[^>]*)?>(.*)", 1).as("__body"))
      .where(col("__body") =!= "")
    // discovery ignores CDATA payloads: HTML tags inside a CDATA field
    // must not become columns
    val tags = body.select(regexp_replace(col("__body"),
          "(?s)<!\\[CDATA\\[.*?\\]\\]>", "").as("__nocdata"))
      .select(explode(expr(
        "regexp_extract_all(__nocdata, '<([A-Za-z_][A-Za-z0-9_.-]*)(?:\\\\s[^>]*)?>', 1)")).as("t"))
      .distinct().collect().map(_.getString(0)).sorted
    def unescape(c: org.apache.spark.sql.Column) =
      Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'", "&amp;" -> "&")
        .foldLeft(c) { case (acc, (e, ch)) => regexp_replace(acc, e, ch) }
    // CDATA-wrapped fields (the common RSS shape for HTML payloads) are
    // unwrapped WITHOUT entity unescaping — CDATA content is literal, as
    // a real parser (and readXml) treats it
    def fieldValue(raw: org.apache.spark.sql.Column) =
      when(raw.rlike("^\\s*<!\\[CDATA\\["),
        regexp_extract(raw, "(?s)^\\s*<!\\[CDATA\\[(.*)\\]\\]>\\s*$", 1))
        .otherwise(unescape(raw))
    val cols = tags.map { t =>
      when(col("__body").rlike(s"<$t(?:\\s[^>]*)?>"),
        fieldValue(regexp_extract(col("__body"), s"(?s)<$t(?:\\s[^>]*)?>(.*?)</$t>", 1)))
        .as(t)
    }
    require(cols.nonEmpty, s"readXmlDistributed: no <$itemTag> elements found in $path")
    body.select(cols.toIndexedSeq: _*)
  }

  /** S4 — RSS-over-HTTP with disk cache: body cached at
    * `cacheDir/md5(url).xml` (`AdapterFactory.php:97-144`), then the S3
    * reader. Supports file:// URLs (tests / offline). */
  def readRss(spark: SparkSession, url: String, cacheDir: String,
              nodePath: String = "rss/channel/item",
              timeoutMs: Int = 60000): DataFrame = {
    val cached = cachePath(cacheDir, url)
    if (!cached.exists()) {
      cached.getParentFile.mkdirs()
      val conn = new java.net.URL(url).openConnection()
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      val in = conn.getInputStream
      try Files.copy(in, cached.toPath, StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
    }
    readXml(spark, cached.getPath, nodePath)
  }

  private[sources] def cachePath(cacheDir: String, url: String): File = {
    val md5 = MessageDigest.getInstance("MD5").digest(url.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    new File(cacheDir, s"$md5.xml")
  }

  /** S5 — RSS multi-source fan-out: iterate `url?page=N`
    * (`RSSMultiSourceIterator.php:41-88`), read each page, merge with
    * union-by-name (distributed — no driver collect, unlike the
    * reference's `to_array` merge). Stops at the first empty page or
    * `maxPages`. */
  def readRssMultiSource(spark: SparkSession, urlPattern: String,
                         cacheDir: String, start: Int = 1, increment: Int = 1,
                         maxPages: Int = 10,
                         nodePath: String = "rss/channel/item"): DataFrame = {
    val pages = Iterator.iterate(start)(_ + increment)
      .take(maxPages)
      .map(p => readRss(spark, urlPattern.replace("%d", p.toString), cacheDir, nodePath))
      .takeWhile(df => !df.isEmpty)
      .toSeq
    require(pages.nonEmpty, s"readRssMultiSource: no pages read from $urlPattern")
    ColumnNs.mergeAll(pages)
  }

  /** S9 — in-memory scan (`from_array`). */
  def fromRows(spark: SparkSession, schema: StructType, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toList), schema)

  /** S10 — ledger scan: glob `name-ledger-*.json`, pick the latest
    * (lexicographically greatest — run ids are sortable timestamps),
    * read as a DataFrame (`LedgerRegistry.php:93-129`). */
  def ledgerLatest(spark: SparkSession, dir: String, name: String): DataFrame = {
    val files = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(s"$name-ledger-") && f.getName.endsWith(".json"))
    require(files.nonEmpty, s"ledgerLatest: no '$name-ledger-*.json' under $dir")
    val latest = files.maxBy(_.getName)
    spark.read.json(latest.getPath)
  }

  /** WARC/WET text-extraction reader — the Common Crawl WET format a
    * 100 TB web-corpus pipeline actually ingests. The file is split on
    * the `WARC/1.0` record marker (`lineSep` — splittable Hadoop text
    * input, so a multi-GB WET segment fans out across executors like
    * [[readXmlDistributed]]), headers and payload separated on the
    * first blank line, and only `WARC-Type: conversion` records (the
    * extracted text; warcinfo/request/response records are dropped)
    * surface as rows `(url, warc_date, content_length, text, len_ok)`.
    * Handles both `\n` and `\r\n` header conventions. Only the RECORD
    * FRAMING is stripped from the payload tail — at most two trailing
    * newline units (the WARC spec's two CRLFs before the next record
    * marker; single-`\n` framing sheds its one unit the same way). A
    * payload that legitimately ends in newline(s) counted in
    * Content-Length keeps them — stripping every trailing newline
    * would flag such records `len_ok=false`, a false truncation
    * alarm.
    *
    * Delimiter-split framing cannot honor Content-Length the way a
    * sequential reader can, so a payload CONTAINING the record marker
    * on a line would split early; `len_ok` compares the payload length
    * against the declared Content-Length (chars == bytes for ASCII
    * corpora) exactly so such truncation is detectable downstream
    * rather than silent. */
  def readWarcWet(spark: SparkSession, path: String): DataFrame =
    parseWarcWet(spark.read.option("lineSep", "WARC/1.0").text(path))

  /** Streaming twin of [[readWarcWet]]: the same parse over a
    * file-stream source, so a landing directory of WET segments feeds
    * Structured Streaming ingestion with identical row semantics
    * (record parsing is pure column work — no state). */
  def readWarcWetStream(spark: SparkSession, dir: String): DataFrame =
    parseWarcWet(spark.readStream.option("lineSep", "WARC/1.0").text(dir))

  private def parseWarcWet(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    raw
      // get(), not getItem(): a chunk with no blank line (the empty
      // leading split before a file's first record marker, or header
      // junk) yields a 1-element split, and getItem(1) THROWS under
      // ANSI mode once CollapseProject folds this into the same stage
      // as the filter below
      .select(split(col("value"), "\\r?\\n\\r?\\n", 2).as("p"))
      .select(col("p").getItem(0).as("h"),
        coalesce(get(col("p"), lit(1)), lit("")).as("body0"))
      .where(col("h").rlike("(?m)^WARC-Type: conversion\\r?$"))
      // empty-safe cast (nullif): subexpression elimination can fold
      // the collapsed projection's casts INTO the filter stage, where
      // they run on records the type filter would drop (warcinfo has
      // no Content-Length; ANSI mode throws on casting '')
      .select(
        regexp_extract(col("h"), "(?m)^WARC-Target-URI: (\\S+)", 1).as("url"),
        regexp_extract(col("h"), "(?m)^WARC-Date: (\\S+)", 1).as("warc_date"),
        nullif(regexp_extract(col("h"), "(?m)^Content-Length: (\\d+)", 1),
          lit("")).cast("long").as("content_length"),
        col("body0"))
      .withColumn("text", framedPayload(col("body0"), col("content_length")))
      .withColumn("len_ok", length(col("text")) === col("content_length"))
      .drop("body0")
  }

  /** Raw WARC `response`-record reader — the step BEFORE WET exists: a
    * crawler's archive holds HTTP responses (status line + headers +
    * HTML payload), not extracted text. Same splittable `lineSep`
    * framing as [[readWarcWet]]; each record splits into three
    * blank-line-separated parts (WARC headers, HTTP headers, body) and
    * only `WARC-Type: response` records surface, as
    * `(url, warc_date, content_length, http_status, content_type,
    * html, len_ok)`.
    *
    * `content_length` is the WARC header's count — it covers the HTTP
    * block AND the body, so `len_ok` accepts either header/body
    * separator width (`\n\n` or `\r\n\r\n`). Feed `html` to
    * `graft_html_extract` ([[graft.functions.HtmlText]]) for the
    * main-content text that replaces a WET `conversion` payload;
    * gate on `http_status = 200` and `content_type = 'text/html'`
    * first (crawls carry redirects, errors, and non-HTML media). */
  def readWarcResponses(spark: SparkSession, path: String): DataFrame =
    parseWarcResponses(spark.read.option("lineSep", "WARC/1.0").text(path))

  /** Streaming twin of [[readWarcResponses]] (see
    * [[readWarcWetStream]]): a crawler drops finished WARC segments
    * into a landing directory; the stream picks each file up once and
    * parses with identical semantics. */
  def readWarcResponsesStream(spark: SparkSession, dir: String): DataFrame =
    parseWarcResponses(spark.readStream.option("lineSep", "WARC/1.0").text(dir))

  private def parseWarcResponses(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    raw
      .select(split(col("value"), "\\r?\\n\\r?\\n", 3).as("p"))
      .select(col("p").getItem(0).as("h"),
        coalesce(get(col("p"), lit(1)), lit("")).as("http"),
        coalesce(get(col("p"), lit(2)), lit("")).as("body0"))
      .where(col("h").rlike("(?m)^WARC-Type: response\\r?$"))
      // nullif-guarded casts: see the note in [[readWarcWet]]
      .select(
        regexp_extract(col("h"), "(?m)^WARC-Target-URI: (\\S+)", 1).as("url"),
        regexp_extract(col("h"), "(?m)^WARC-Date: (\\S+)", 1).as("warc_date"),
        nullif(regexp_extract(col("h"), "(?m)^Content-Length: (\\d+)", 1),
          lit("")).cast("long").as("content_length"),
        nullif(regexp_extract(col("http"), "^HTTP/[0-9.]+ (\\d{3})", 1),
          lit("")).cast("int").as("http_status"),
        lower(trim(regexp_extract(col("http"),
          "(?mi)^Content-Type:\\s*([^;\\r\\n]+)", 1))).as("content_type"),
        // the separator the 3-way split consumed is 2 chars (LF
        // convention) or 4 (the spec's CRLF): a record's framing is
        // consistent, and the multi-line WARC header block always
        // carries the convention's line endings (the HTTP block can be
        // a single line and carry none) — guessing a fixed width would
        // hand CRLF records an html column with a trailing \r\n while
        // len_ok still passed
        when(col("h").contains("\r"), lit(4)).otherwise(lit(2)).as("__sep"),
        col("http"), col("body0"))
      .withColumn("html", framedPayload(col("body0"),
        col("content_length") - length(col("http")) - col("__sep")))
      .withColumn("len_ok",
        length(col("http")) + col("__sep") + length(col("html"))
          === col("content_length"))
      .drop("http", "body0", "__sep")
  }

  /** Recover a record payload from its delimiter-split chunk: the
    * chunk carries the record FRAMING (up to two trailing newline
    * units per the WARC spec) that is NOT part of Content-Length.
    * Content-Length is the authoritative byte count the delimiter
    * split lost, so it disambiguates payloads that legitimately end in
    * newlines: prefer the strip depth (2, 1, then 0 units) whose
    * length matches the declared count; when none does (real
    * truncation, or a non-ASCII corpus where chars != bytes), fall
    * back to full framing strip and let `len_ok` flag the row. */
  private def framedPayload(body: Column, contentLength: Column): Column = {
    // \z, not $: Java's non-multiline $ ALSO matches before a final
    // newline, so an anchored strip-one pattern would eat two
    val strip2 = regexp_replace(body, "(\\r?\\n){1,2}\\z", "")
    val strip1 = regexp_replace(body, "\\r?\\n\\z", "")
    when(length(strip2) === contentLength, strip2)
      .when(length(strip1) === contentLength, strip1)
      .when(length(body) === contentLength, body)
      .otherwise(strip2)
  }

  /** S11 — local file finder: resolve `file` under `base`, searching
    * subdirectories (`LocalFileSystemExtractor.php:44-91`). */
  def findFile(base: String, file: String): Option[File] = {
    val direct = new File(base, file)
    if (direct.isFile) Some(direct)
    else {
      val stack = scala.collection.mutable.Stack(new File(base))
      var found: Option[File] = None
      while (found.isEmpty && stack.nonEmpty) {
        val d = stack.pop()
        val kids = Option(d.listFiles()).getOrElse(Array.empty)
        found = kids.find(f => f.isFile && f.getName == file)
        kids.filter(_.isDirectory).foreach(stack.push)
      }
      found
    }
  }
}
