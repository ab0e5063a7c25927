package graft.pipeline

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Sources

class ConfigLoaderSpec extends SparkSpec {
  import spark.implicits._

  private def writeConfig(work: String, csvPath: String): String = {
    val cfg =
      s"""{"jobs": [{
         |  "name": "wp_posts",
         |  "extract": [{"kind": "csv", "path": "$csvPath"}],
         |  "transform": [
         |    {"kind": "post_pipeline",
         |     "options": {"titleCol": "legacy.title", "contentCol": "legacy.content"}},
         |    {"kind": "with_uid"}],
         |  "load": [
         |    {"kind": "json", "dir": "$work", "file": "posts.json",
         |     "prefixes": "post.", "strip": "true"},
         |    {"kind": "ledger", "dir": "$work", "name": "wp_posts", "runId": "t1"}]
         |}]}""".stripMargin
    val p = new java.io.File(work, "migration.json")
    Files.write(p.toPath, cfg.getBytes("UTF-8"))
    p.getPath
  }

  test("config-driven migration runs end to end (the reference's YAML UX)") {
    val work = Files.createTempDirectory("graft_cfg").toFile.getPath
    val csv = new java.io.File(work, "in.csv")
    Files.write(csv.toPath,
      "Title,Content\nFirst Post,<p>a</p>\nAnother One,<p>b</p>\n".getBytes("UTF-8"))
    val jobs = ConfigLoader.parseFile(writeConfig(work, csv.getPath))
    assert(jobs.size == 1 && jobs.head.name == "wp_posts")
    Pipeline.run(spark, jobs)
    val out = Sources.readJson(spark, s"$work/posts.json", multiLine = false)
    assert(out.count() == 2)
    assert(out.select("post_name").as[String].collect().toSet ==
      Set("first-post", "another-one"))
    assert(Sources.ledgerLatest(spark, work, "wp_posts").count() == 2)
  }

  test("mixing transform kinds drive curation steps from config") {
    import graft.pipeline.ConfigLoader.transformKinds
    val df = (1L to 1000L).toDF("k")
      .withColumn("s", when(col("k") % 2 === 0, "en").otherwise("de"))
      .withColumn("score", col("k") % 7)
    val sampled = transformKinds("sample")(
      Map("keyCol" -> "k", "fraction" -> "0.5"))(df)
    assert(math.abs(sampled.count() / 1000.0 - 0.5) < 0.06)
    val mixed = transformKinds("mix_strata")(
      Map("stratumCol" -> "s", "keyCol" -> "k",
        "rates" -> "en=0.0,de=1.0"))(df)
    assert(mixed.select("s").distinct().as[String].collect().toSeq == Seq("de"))
    val up = transformKinds("upsample")(
      Map("keyCol" -> "k", "rate" -> "2.0"))(df)
    assert(up.count() == 2000L)
    val top = transformKinds("top_k_per_stratum")(
      Map("stratumCol" -> "s", "scoreCol" -> "score", "keyCol" -> "k",
        "k" -> "3"))(df)
    assert(top.groupBy("s").count().as[(String, Long)].collect()
      .forall(_._2 == 3L))
  }

  test("dedup_minhash and regexp_extract kinds: near-dedup + id recovery from config") {
    import graft.pipeline.ConfigLoader.transformKinds
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep green forest tonight with friends"
    val docs = Seq(
      (10L, prose),
      (11L, prose + " extra"),                        // near-dup of 10
      (12L, prose.replace("quick", "rapid")),         // near-dup of 10
      (20L, "completely different words about ships sailing across wide " +
        "oceans under bright starry skies tonight forever onward we go"),
      (30L, "short unrelated text that matches nothing else at all here " +
        "truly nothing shared with any other document in this set")
    ).toDF("doc_id", "text")
    val out = transformKinds("dedup_minhash")(
      Map("idCol" -> "doc_id", "textCol" -> "text", "threshold" -> "0.5"))(docs)
    // cluster {10, 11, 12} keeps its min id; singletons pass through
    assert(out.select("doc_id").as[Long].collect().toSet == Set(10L, 20L, 30L))
    // regexp_extract: recover a numeric id from a crawl URL, cast long
    val urls = Seq("https://a.example/doc/42?x=1", "https://b.example/doc/7")
      .toDF("url")
    val ids = transformKinds("regexp_extract")(
      Map("column" -> "url", "pattern" -> "doc/([0-9]+)",
        "outCol" -> "doc_id", "castTo" -> "long"))(urls)
    assert(ids.schema("doc_id").dataType.typeName == "long")
    assert(ids.select("doc_id").as[Long].collect().toSet == Set(42L, 7L))
  }

  test("decontaminate kind: benchmark table from path, filtered and renamed") {
    import graft.pipeline.ConfigLoader.transformKinds
    val prose = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = Seq(
      (1L, prose),                                     // = benchmark doc 7
      (2L, "totally disjoint words with no overlap of any benchmark gram " +
        "at all in this row of plain filler text here")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("decon_kind").toString
    // benchmark names its text column differently + carries a split
    // column the benchWhere must honor (only eval rows count)
    Seq((7L, prose, "eval"), (8L, "totally disjoint words with no overlap " +
        "of any benchmark gram at all in this row of plain filler text here",
        "train"))
      .toDF("bench_id", "prompt", "split")
      .write.mode("overwrite").parquet(s"$dir/bench.parquet")
    val kept = transformKinds("decontaminate")(Map(
      "idCol" -> "doc_id", "textCol" -> "text",
      "benchmarkPath" -> s"$dir/bench.parquet",
      "benchWhere" -> "split = 'eval'", "benchTextCol" -> "prompt"))(corpus)
    // doc 1 shares 8-grams with the eval row -> dropped; doc 2 matches
    // only the train row, which benchWhere excludes -> kept
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(2L))
  }

  test("bpe_token_count kind: persisted ladder drives config-based counting") {
    import graft.pipeline.ConfigLoader.transformKinds
    val work = Files.createTempDirectory("graft_bpe_cfg").toFile.getPath
    // with the mini ladder, "low low" -> [low][low] = 2 tokens
    graft.llm.Bpe.saveLadder(Seq("l" -> "o", "lo" -> "w"), s"$work/ladder.txt")
    val df = Seq((1L, "low low"), (2L, "xy")).toDF("id", "text")
    val out = transformKinds("bpe_token_count")(
      Map("textCol" -> "text", "ladderPath" -> s"$work/ladder.txt"))(df)
      .select(col("id"), col("n_tokens")).as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 2L))
    // absent ladderPath -> default ladder, custom out column
    val d = transformKinds("bpe_token_count")(
      Map("textCol" -> "text", "outCol" -> "nt"))(df)
    assert(d.columns.contains("nt") && d.count() == 2)
  }

  test("line-dedup, chunking, and partitioned-write kinds drive from config") {
    import graft.pipeline.ConfigLoader.{transformKinds, loadKinds}
    val docs = Seq((1L, "BOILER\nkeep a"), (2L, "BOILER\nkeep b"),
      (3L, "BOILER\nkeep c")).toDF("doc_id", "text")
    val stripped = transformKinds("strip_repeated_lines")(
      Map("idCol" -> "doc_id", "textCol" -> "text", "minDocs" -> "2"))(docs)
    assert(stripped.orderBy("doc_id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "keep a"), (2L, "keep b"), (3L, "keep c")))
    val chunked = transformKinds("chunk_tokens")(
      Map("idCol" -> "doc_id", "textCol" -> "text", "chunkTokens" -> "1"))(docs)
    assert(chunked.count() == 9L) // 3 ws-tokens per doc, one chunk each
    // nfc_normalize: registers graft_nfc on the df's session, quotes the
    // column name, rewrites in place (e + combining acute -> é)
    val accented = Seq((1L, "cafe\u0301")).toDF("doc_id", "text")
    val nfc = transformKinds("nfc_normalize")(Map("column" -> "text"))(accented)
    assert(nfc.select("text").as[String].head() == "caf\u00e9")
    // strip_duplicate_spans and split drive from config too
    val spanned = transformKinds("strip_duplicate_spans")(
      Map("idCol" -> "doc_id", "textCol" -> "text", "k" -> "2"))(
      Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text"))
    assert(spanned.orderBy("doc_id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "c"), (2L, "d")))
    val split = transformKinds("split")(
      Map("keyCol" -> "doc_id", "weights" -> "train=0.9,val=0.1"))(docs)
    assert(split.columns.contains("split"))
    assert(split.select("split").distinct().as[String].collect()
      .forall(Set("train", "val")))
    // strip_invisible + length_bucket kinds
    val inv = transformKinds("strip_invisible")(Map("column" -> "text"))(
      Seq((1L, "a\u200bb c")).toDF("doc_id", "text"))
      .select("text").as[String].collect().head
    assert(inv == "ab c")
    val lb = transformKinds("length_bucket")(
      Map("idCol" -> "doc_id", "textCol" -> "text", "nBuckets" -> "2",
        "batchSize" -> "2"))(
      Seq((1L, "a"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d"))
        .toDF("doc_id", "text"))
    assert(lb.columns.toSeq == Seq("doc_id", "n_tokens", "bucket", "batch_id"))
    assert(lb.select("bucket").distinct().count() == 2)
    // repetition_filter: the full Gopher repetition rule set from
    // config; the boilerplate doc (half its lines one repeat) drops,
    // prose survives, an override loosens the rule
    val rdocs = Seq(
      (1L, (1 to 40).map(i => s"w$i").mkString(" ")),
      (2L, "same line\nsame line\nother one\nlast line")).toDF("doc_id", "text")
    val rkept = transformKinds("repetition_filter")(
      Map("column" -> "text"))(rdocs)
    assert(rkept.select("doc_id").as[Long].collect().toSet == Set(1L))
    val rloose = transformKinds("repetition_filter")(
      Map("column" -> "text", "dup_line_frac" -> "0.6",
        "dup_line_char_frac" -> "0.9", "top_2gram_char_frac" -> "1.0",
        "top_3gram_char_frac" -> "1.0", "top_4gram_char_frac" -> "1.0"))(rdocs)
    assert(rloose.count() == 2)
    // semdedup drives from config: the exact-duplicate embedding drops
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (1001L, Seq(1.0f, 0.0f, 0.0f, 0.0f))) // duplicate of 1
      .toDF("vec_id", "embedding")
    val semKept = transformKinds("semdedup")(
      Map("threshold" -> "0.99", "nClusters" -> "2"))(vecs)
    assert(semKept.select("vec_id").as[Long].collect().toSet == Set(1L, 2L))
    // pair_filter / pair_dedup kinds drive the multimodal pair ops
    val vOk = Seq(1.0f, 0.0f, 0.0f)
    val ppairs = Seq(
      (1L, graft.multimodal.Multimodal.syntheticPng(1L, 16, 16),
        "the quick brown fox jumps over the dog", vOk, vOk),
      (2L, graft.multimodal.Multimodal.syntheticPng(2L, 4, 16),
        "the quick brown fox jumps over the dog", vOk, vOk))
      .toDF("pair_id", "payload", "caption", "img_emb", "txt_emb")
    val pKept = transformKinds("pair_filter")(
      Map("minWidth" -> "8", "minAlign" -> "0.5", "minWords" -> "3"))(ppairs)
    assert(pKept.select("pair_id").as[Long].collect().toSet == Set(1L))
    val pdup = transformKinds("pair_dedup")(Map())(
      ppairs.unionByName(ppairs.limit(1)
        .withColumn("pair_id", lit(10L))))
    assert(pdup.select("pair_id").as[Long].collect().toSet == Set(1L, 2L))
    // dedup_soft: sample=false annotates every row with the flattening
    // weight; the default sampling mode always keeps weight-1 uniques
    val sdocs = Seq((1L, "same text"), (2L, "SAME   text"),
      (3L, "unique content")).toDF("doc_id", "text")
    val softAnn = transformKinds("dedup_soft")(
      Map("idCol" -> "doc_id", "textCol" -> "text", "sample" -> "false"))(sdocs)
    assert(softAnn.count() == 3)
    assert(softAnn.where(col("doc_id") === 3L)
      .select("weight").as[Double].head() == 1.0)
    assert(softAnn.where(col("doc_id") === 1L)
      .select("dup_count").as[Long].head() == 2L)
    val softSampled = transformKinds("dedup_soft")(
      Map("idCol" -> "doc_id", "textCol" -> "text"))(sdocs)
    assert(softSampled.columns.toSet == Set("doc_id", "text"))
    assert(softSampled.select("doc_id").as[Long].collect().toSet.contains(3L))
    // classifier_filter loads weights from parquet; no-feature docs are
    // kept regardless of threshold (no-signal convention)
    val wdir = "/tmp/graft_test/cfg_clf_weights"
    spark.range(10000)
      .select(col("id").as("bucket"), lit(1.0).as("weight"))
      .write.mode("overwrite").parquet(wdir)
    val cdocs = Seq((1L, "alpha beta gamma"), (2L, "")).toDF("doc_id", "text")
    val clfKeep = transformKinds("classifier_filter")(
      Map("idCol" -> "doc_id", "textCol" -> "text",
        "weightsPath" -> wdir, "minScore" -> "0.5"))(cdocs)
    // every feature weighs 1.0 -> score sigmoid(1) ~ 0.73 >= 0.5
    assert(clfKeep.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    val clfStrict = transformKinds("classifier_filter")(
      Map("idCol" -> "doc_id", "textCol" -> "text",
        "weightsPath" -> wdir, "minScore" -> "0.9"))(cdocs)
    assert(clfStrict.select("doc_id").as[Long].collect().toSet == Set(2L))
    // quality_bucket_filter drops the worst cross-entropy band: the doc
    // stuffed with hapax tokens scores worst and goes
    val qdocs = ((1L to 8L).map(i => (i, "shared base words here" +
      (if (i == 8L) " zzz qqq xxx www vvv uuu ttt" else ""))) :+
      (9L, "")).toDF("doc_id", "text") // unscoreable: no CE row
    val qkept = transformKinds("quality_bucket_filter")(
      Map("idCol" -> "doc_id", "textCol" -> "text",
        "nBuckets" -> "4", "keepBuckets" -> "3"))(qdocs)
    val qids = qkept.select("doc_id").as[Long].collect().toSet
    assert(!qids.contains(8L)) // the junk tail goes
    assert(qids.contains(9L))  // no-signal docs are kept, not dropped
    assert(qkept.count() >= 7)
    // ce_filter_against keeps the most reference-like keepFraction:
    // the junk doc prices entirely at the reference LM's unseen price
    // and lands above the p80 threshold; ties at the threshold keep
    val refDir = "/tmp/graft_test/cfg_ce_ref"
    Seq((100L, "the cat sat on the mat and the dog sat too"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(refDir)
    val cedocs = ((1L to 5L).map(i => (i, "the cat sat on the mat")) :+
      (6L, "zzz qqq xxx www vvv uuu") :+ (7L, "")).toDF("doc_id", "text")
    val cekept = transformKinds("ce_filter_against")(
      Map("idCol" -> "doc_id", "textCol" -> "text",
        "refPath" -> refDir, "keepFraction" -> "0.8"))(cedocs)
    val ceids = cekept.select("doc_id").as[Long].collect().toSet
    assert(ceids == Set(1L, 2L, 3L, 4L, 5L, 7L)) // junk out, no-signal kept
    // two-phase twin: persist the reference LM once (ce_prices sink),
    // score statelessly against the ledger (ce_apply) — the parquet
    // round-trip must not move a score vs the in-flight measurement
    val pricesDir = "/tmp/graft_test/cfg_ce_prices"
    loadKinds("ce_prices")(Map("dir" -> pricesDir)) match {
      case graft.sinks.Sinks.Write(_, f) =>
        f(spark.read.parquet(refDir))
      case other => fail(s"unexpected step: $other")
    }
    val inflight = graft.llm.TextAnalysis.crossEntropyAgainst(
      cedocs, spark.read.parquet(refDir), "doc_id", "text")
    val ledgered = graft.llm.TextAnalysis.crossEntropyAgainstPrices(
      cedocs, spark.read.parquet(pricesDir), "doc_id", "text")
    assert(rowsOf(inflight) == rowsOf(ledgered))
    // the junk doc scores above any real-word doc; cut between them
    val cut = ledgered.where(col("doc_id") === 1L)
      .select(round(col("ce_against"), 4)).as[Double].head()
    val applied = transformKinds("ce_apply")(Map(
      "pricesDir" -> pricesDir, "idCol" -> "doc_id",
      "textCol" -> "text", "maxCe" -> cut.toString))(cedocs)
    assert(applied.select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L, 5L, 7L)) // ties kept, junk out, no-signal kept
    // mix_report kind: the datacard row + the failOnOff gate
    val mrDir = "/tmp/graft_test/cfg_mix_report"
    val mrDocs = Seq(("a", "x y z"), ("b", "x y")).toDF("domain", "text")
    def runMixReport(opts: Map[String, String]): Unit =
      loadKinds("mix_report")(opts) match {
        case graft.sinks.Sinks.Write(_, f) => f(mrDocs)
        case other => fail(s"unexpected step: $other")
      }
    runMixReport(Map("domainCol" -> "domain", "textCol" -> "text",
      "reportDir" -> mrDir, "targets" -> "a:0.6,b:0.4",
      "failOnOff" -> "true")) // shares are exactly 0.6/0.4 -> passes
    val mrRows = spark.read.parquet(mrDir)
      .select("domain", "share", "ok").as[(String, Double, Boolean)]
      .collect().toSet
    assert(mrRows == Set(("a", 0.6, true), ("b", 0.4, true)))
    val mrErr = intercept[IllegalArgumentException](runMixReport(Map(
      "domainCol" -> "domain", "textCol" -> "text",
      "reportDir" -> mrDir, "targets" -> "a:0.9,b:0.4",
      "failOnOff" -> "true")))
    assert(mrErr.getMessage.contains("1 domain(s) outside tolerance"))
    intercept[IllegalArgumentException](runMixReport(Map(
      "domainCol" -> "domain", "textCol" -> "text",
      "reportDir" -> mrDir, "targets" -> "garbage")))
    // compression_filter drops the repetitive tail, keeps prose-like text
    val comp = Seq((1L, "spark " * 300), (2L, "the quick brown fox " +
      "jumped over one lazy dog while twelve boxers drank quarts"))
      .toDF("doc_id", "text")
    val kept = transformKinds("compression_filter")(
      Map("textCol" -> "text", "minRatio" -> "0.2", "maxRatio" -> "0.9"))(comp)
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(2L))
    val dir = "/tmp/graft_test/cfg_partitioned/t"
    loadKinds("partitioned")(Map("path" -> dir, "partCols" -> "doc_id")) match {
      case graft.sinks.Sinks.Write(_, f) => f(docs)
      case other => fail(s"unexpected step: $other")
    }
    assert(new java.io.File(dir).listFiles().map(_.getName)
      .count(_.startsWith("doc_id=")) == 3)
    // the train/val export shape: split kind -> partitioned kind
    // composes into split=train/ and split=val/ directories
    val many = (1L to 200L).toDF("doc_id")
      .withColumn("text", concat(lit("doc "), col("doc_id")))
    val splitDir = "/tmp/graft_test/cfg_partitioned/splits"
    val splitted = transformKinds("split")(
      Map("keyCol" -> "doc_id", "weights" -> "train=0.8,val=0.2"))(many)
    loadKinds("partitioned")(
      Map("path" -> splitDir, "partCols" -> "split")) match {
      case graft.sinks.Sinks.Write(_, f) => f(splitted)
      case other => fail(s"unexpected step: $other")
    }
    val back = spark.read.parquet(splitDir)
    assert(new java.io.File(splitDir).listFiles().map(_.getName)
      .filter(_.startsWith("split=")).toSet == Set("split=train", "split=val"))
    assert(back.count() == 200L)
    // membership is the hash ladder's, not file-layout-dependent
    val expectTrain = transformKinds("split")(
      Map("keyCol" -> "doc_id", "weights" -> "train=0.8,val=0.2"))(many)
      .where(col("split") === "train").count()
    assert(back.where(col("split") === "train").count() == expectTrain)
  }

  test("unknown kinds and missing fields are rejected with clear messages") {
    val badKind = """{"jobs":[{"name":"x","extract":[{"kind":"ftp","path":"p"}]}]}"""
    val e1 = intercept[Pipeline.ValidationException](ConfigLoader.parse(badKind))
    assert(e1.getMessage.contains("unknown source kind 'ftp'"))
    val noName = """{"jobs":[{"extract":[]}]}"""
    val e2 = intercept[Pipeline.ValidationException](ConfigLoader.parse(noName))
    assert(e2.getMessage.contains("missing 'name'"))
    val noKind = """{"jobs":[{"name":"x","extract":[{"path":"p"}]}]}"""
    val e3 = intercept[Pipeline.ValidationException](ConfigLoader.parse(noKind))
    assert(e3.getMessage.contains("missing 'kind'"))
  }

  test("quality_filter_routed rejects malformed minWordsByLang entries") {
    import spark.implicits._
    import graft.pipeline.ConfigLoader.transformKinds
    val df = Seq((1L, "en", "some text here")).toDF("doc_id", "lang", "text")
    // missing '=', extra '=', non-numeric count: each must surface as a
    // ValidationException naming the entry, not a MatchError/NFE
    for (bad <- Seq("en", "en=50=x", "en=abc")) {
      val e = intercept[Pipeline.ValidationException](
        transformKinds("quality_filter_routed")(Map(
          "column" -> "text", "langCol" -> "lang",
          "minWordsByLang" -> bad))(df))
      assert(e.getMessage.contains(s"bad minWordsByLang entry '$bad'"))
    }
    // and a well-formed spec still builds
    val ok = transformKinds("quality_filter_routed")(Map(
      "column" -> "text", "langCol" -> "lang",
      "minWordsByLang" -> "en=2, zh=1"))(df)
    assert(ok.count() == 1)
  }

  test("reindex_index kind: ivf reindexes from its own assignments, pq re-encodes the job frame") {
    import java.nio.file.Files
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val dir = Files.createTempDirectory("graft_reix_kind").toFile.getPath
    graft.llm.Similarity.buildIvfIndex(emb, s"$dir/ivf")
    graft.llm.Similarity.buildPqIndex(emb, s"$dir/pq")
    graft.llm.Similarity.buildIvfPqIndex(emb, s"$dir/ivfpq")
    emb.write.mode("overwrite").parquet(s"$dir/corpus")
    val yaml =
      s"""jobs:
         |  - name: reindex_ivf
         |    extract:
         |      - kind: parquet
         |        path: $dir/corpus
         |        prefix: ""
         |    load:
         |      - kind: reindex_index
         |        options: {dir: $dir/ivf, family: ivf, nCentroids: '8'}
         |  - name: reindex_pq
         |    extract:
         |      - kind: parquet
         |        path: $dir/corpus
         |        prefix: ""
         |    load:
         |      - kind: reindex_index
         |        options: {dir: $dir/pq, family: pq}
         |  - name: reindex_ivfpq
         |    extract:
         |      - kind: parquet
         |        path: $dir/corpus
         |        prefix: ""
         |    load:
         |      - kind: reindex_index
         |        options: {dir: $dir/ivfpq, family: ivfpq, nCentroids: '8'}
         |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$dir/reindex.yaml"), yaml)
    Pipeline.run(spark, ConfigLoader.parseYamlFile(s"$dir/reindex.yaml"),
      progress = _ => ())
    // ivf: new committed generation serves, genuinely refit at 8
    val ivfRoot = graft.llm.Similarity.resolveIndexRoot(spark, s"$dir/ivf")
    assert(ivfRoot.endsWith("/gen-0001"))
    assert(spark.read.parquet(s"$ivfRoot/centroids").count() == 8)
    // pq: the job frame was re-encoded into the new generation
    val pqRoot = graft.llm.Similarity.resolveIndexRoot(spark, s"$dir/pq")
    assert(pqRoot.endsWith("/gen-0001"))
    assert(spark.read.parquet(s"$pqRoot/codes").count() == emb.count())
    // ivfpq: refit coarse level + residual re-encode in the new gen
    val cRoot = graft.llm.Similarity.resolveIndexRoot(spark, s"$dir/ivfpq")
    assert(cRoot.endsWith("/gen-0001"))
    assert(spark.read.parquet(s"$cRoot/centroids").count() == 8)
    assert(spark.read.parquet(s"$cRoot/codes").count() == emb.count())
    // unknown family fails loudly at run time
    val e = intercept[Pipeline.ValidationException](
      graft.sinks.Sinks.runChain(emb, Seq(
        ConfigLoader.loadKinds("reindex_index")(Map(
          "dir" -> s"$dir/ivf", "family" -> "hnsw")))))
    assert(e.getMessage.contains("unknown family 'hnsw'"))
  }

  test("reindex_if_drifted kind: healthy skips, breach reindexes, maintenance ledger appends") {
    import java.nio.file.Files
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val dir = Files.createTempDirectory("graft_autoreix").toFile.getPath
    graft.llm.Similarity.buildIvfIndex(emb, s"$dir/ivf")
    // probe set: exact copies — recall@1 is exactly 1.0 on any
    // correct index, so both decision branches are deterministic
    emb.where(col("vec_id") < 3)
      .select((col("vec_id") + 7000L).as("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$dir/probes")
    def run(floor: String): Unit =
      graft.sinks.Sinks.runChain(emb, Seq(
        ConfigLoader.loadKinds("reindex_if_drifted")(Map(
          "dir" -> s"$dir/ivf", "queriesPath" -> s"$dir/probes",
          "k" -> "1", "recallFloor" -> floor, "nCentroids" -> "8"))))
    run("0.5")  // healthy: 1.0 >= 0.5 — no reindex
    run("1.01") // forced breach: reindex into gen-0001
    val rep = spark.read.parquet(s"$dir/ivf/maintenance")
      .select(col("reindexed"), col("generation"),
        col("recall_before"), col("recall_after"))
      .as[(Boolean, String, Double, Double)].collect().toSet
    assert(rep == Set((false, "flat", 1.0, 1.0),
      (true, "gen-0001", 1.0, 1.0)), rep.toString)
    assert(graft.llm.Similarity.resolveIndexRoot(spark, s"$dir/ivf")
      .endsWith("/gen-0001"))
  }

  test("reindex_if_drifted kind, family ivfpq: both branches + ledger; bad family rejects") {
    import java.nio.file.Files
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val dir = Files.createTempDirectory("graft_autoreix_pq").toFile.getPath
    graft.llm.Similarity.buildIvfPqIndex(emb, s"$dir/ix")
    emb.where(col("vec_id") < 3)
      .select((col("vec_id") + 7000L).as("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$dir/probes")
    def run(floor: String): Unit =
      graft.sinks.Sinks.runChain(emb, Seq(
        ConfigLoader.loadKinds("reindex_if_drifted")(Map(
          "family" -> "ivfpq", "dir" -> s"$dir/ix",
          "queriesPath" -> s"$dir/probes", "k" -> "1",
          "recallFloor" -> floor, "nCentroids" -> "8", "m" -> "4"))))
    run("0.5")  // healthy: 1.0 >= 0.5 — no reindex
    run("1.01") // forced breach: refit into gen-0001
    val rep = spark.read.parquet(s"$dir/ix/maintenance")
      .select(col("reindexed"), col("generation"),
        col("recall_before"), col("recall_after"))
      .as[(Boolean, String, Double, Double)].collect().toSet
    assert(rep == Set((false, "flat", 1.0, 1.0),
      (true, "gen-0001", 1.0, 1.0)), rep.toString)
    assert(graft.llm.Similarity.resolveIndexRoot(spark, s"$dir/ix")
      .endsWith("/gen-0001"))
    intercept[Pipeline.ValidationException](
      graft.sinks.Sinks.runChain(emb, Seq(
        ConfigLoader.loadKinds("reindex_if_drifted")(Map(
          "family" -> "nope", "dir" -> s"$dir/ix",
          "queriesPath" -> s"$dir/probes", "recallFloor" -> "0.5")))))
  }

  test("bitext_mine / mine_triplets kinds: indexed mode routes through persisted indexes; bad modes rejected") {
    import java.nio.file.Files
    import graft.pipeline.ConfigLoader.transformKinds
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // bitext: planted ε-translations (the bitext_mine fixture shape)
    val src = emb.where(col("vec_id") % 10 === 0)
      .select(col("vec_id"), lit("en").as("lang"), col("embedding"))
    val tgt = emb.where(col("vec_id") % 20 === 0).select(
        (col("vec_id") + 500000).as("vec_id"), lit("de").as("lang"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x))
          .as("embedding"))
      .unionByName(emb.where(col("vec_id") % 10 === 3)
        .select((col("vec_id") + 700000).as("vec_id"),
          lit("de").as("lang"), col("embedding")))
    val dir = Files.createTempDirectory("graft_mine_kinds").toFile.getPath
    graft.llm.Similarity.buildIvfIndex(src, s"$dir/src")
    graft.llm.Similarity.buildIvfIndex(tgt, s"$dir/tgt")
    val minedIdx = transformKinds("bitext_mine")(Map(
      "langCol" -> "lang", "srcLang" -> "en", "tgtLang" -> "de",
      "mode" -> "indexed", "srcIndexDir" -> s"$dir/src",
      "tgtIndexDir" -> s"$dir/tgt"))(src.unionByName(tgt))
    // every planted translation mined (twin shares its query's nearest
    // cluster; margin ~1.7 beats the organic ceiling)
    val planted = minedIdx.where(col("src_id") % 20 === 0)
      .select(col("src_id"), col("tgt_id"))
      .as[(Long, Long)].collect().toSet
    val expected = emb.where(col("vec_id") % 20 === 0)
      .select(col("vec_id"), col("vec_id") + 500000)
      .as[(Long, Long)].collect().toSet
    assert(planted == expected)
    // triplets: indexed kind ≡ library call on the same persisted index
    val chunks = emb.select(col("vec_id").as("chunk_id"),
      expr("vec_id div 4").as("doc_id"),
      (col("vec_id") % 4).as("chunk_idx"), col("embedding"))
    graft.llm.Similarity.buildIvfIndex(chunks, s"$dir/chunks",
      cIdCol = "chunk_id")
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("pos_id"), col("neg_rank"),
        col("neg_id")).as[(Long, Long, Int, Long)].collect().toSet
    val viaKind = snap(transformKinds("mine_triplets")(Map(
      "mode" -> "indexed", "indexDir" -> s"$dir/chunks"))(chunks))
    val viaLib = snap(graft.llm.Similarity.mineTripletsIndexed(
      spark, s"$dir/chunks", chunks))
    assert(viaKind == viaLib && viaKind.nonEmpty)
    // unknown modes fail loudly
    val e1 = intercept[Pipeline.ValidationException](
      transformKinds("bitext_mine")(Map("langCol" -> "lang",
        "srcLang" -> "en", "tgtLang" -> "de", "mode" -> "faiss"))(src))
    assert(e1.getMessage.contains("unknown mode 'faiss'"))
    val e2 = intercept[Pipeline.ValidationException](
      transformKinds("mine_triplets")(Map("mode" -> "hnsw"))(chunks))
    assert(e2.getMessage.contains("unknown mode 'hnsw'"))
  }

  test("strict mode rejects unknown keys and missing destinations; lenient passes") {
    // typo'd job key: lenient silently ignores (dependson != dependsOn),
    // strict rejects — exactly the failure --strict exists to catch
    val typo = """{"jobs":[{"name":"x","dependson":["y"],"extract":[{"kind":"parquet","path":"p"}]}]}"""
    assert(ConfigLoader.parse(typo).head.dependsOn.isEmpty)
    val e1 = intercept[Pipeline.ValidationException](
      ConfigLoader.parse(typo, strict = true))
    assert(e1.getMessage.contains("unknown job key(s): dependson"))
    // unknown root key
    val rootTypo = """{"jobz":[],"jobs":[{"name":"x"}]}"""
    val e2 = intercept[Pipeline.ValidationException](
      ConfigLoader.parse(rootTypo, strict = true))
    assert(e2.getMessage.contains("unknown root key(s): jobz"))
    // json load step with no file: lenient defers the failure to write
    // time; strict fails at validate time
    val noDest = """{"jobs":[{"name":"x","load":[{"kind":"json","dir":"/tmp"}]}]}"""
    assert(ConfigLoader.parse(noDest).head.load.size == 1)
    val e3 = intercept[Pipeline.ValidationException](
      ConfigLoader.parse(noDest, strict = true))
    assert(e3.getMessage.contains("missing destination option(s): file"))
    // ledger needs dir AND name
    val noLedger = """{"jobs":[{"name":"x","load":[{"kind":"ledger","dir":"/tmp"}]}]}"""
    val e4 = intercept[Pipeline.ValidationException](
      ConfigLoader.parse(noLedger, strict = true))
    assert(e4.getMessage.contains("missing destination option(s): name"))
    // a fully-specified config passes strict unchanged; the reference
    // root keys (version/slug/ledger/...) are known
    val ok = """{"version":1,"slug":"m","jobs":[{"name":"x","skip":true,
      "load":[{"kind":"json","dir":"/tmp","file":"out.json"}]}]}"""
    assert(ConfigLoader.parse(ok, strict = true).head.name == "x")
    // YAML flow-map options survive strict validation: since round 11
    // `options: {budget: 512}` parses as a real map (not the string
    // "{budget: 512}"), so the flattened option keys are the KNOWN
    // ones and strict mode passes — and a half-open flow map fails in
    // the parser, never reaching validation as a silent string
    val f = Files.createTempFile("graft_strict_flow", ".yaml")
    Files.writeString(f,
      """jobs:
        |  - name: flow
        |    transform:
        |      - kind: pack_materialize
        |        options: {idCol: doc_id, textCol: text, budget: 512}
        |""".stripMargin)
    assert(ConfigLoader.parseYamlFile(f.toString, strict = true)
      .head.name == "flow")
    val half = Files.createTempFile("graft_strict_flow_bad", ".yaml")
    Files.writeString(half,
      """jobs:
        |  - name: flow
        |    transform:
        |      - kind: pack_materialize
        |        options: {idCol: doc_id
        |""".stripMargin)
    assert(intercept[Yaml.YamlException](
      ConfigLoader.parseYamlFile(half.toString, strict = true))
      .getMessage.contains("unterminated flow collection"))
  }

  test("reference-shaped YAML migration with !include ports verbatim (README.md:35-94)") {
    val work = Files.createTempDirectory("graft_yaml_cfg").toFile.getPath
    val confDir = new java.io.File(work, "config"); confDir.mkdirs()
    val csv = new java.io.File(work, "in.csv")
    Files.write(csv.toPath,
      "Title,Content\nFirst Post,<p>a</p>\nAnother One,<p>b</p>\n".getBytes("UTF-8"))
    // the job file — reference wp_posts.yaml structure: adapter/args,
    // pipeline FQCN transform, loader with destination + options.flags
    Files.write(new java.io.File(confDir, "wp_posts.yaml").toPath,
      s"""name: wp_posts
         |skip: false
         |description: Extract, Transform, and Load posts into a JSON file.
         |extract:
         |  - name: wp_posts_extract
         |    prefix: 'legacy.'  # Prefix all fields with 'legacy.'.
         |    adapter: csv
         |    args:
         |      path: ${csv.getPath}
         |transform:
         |  - name: wp_posts_transform
         |    pipeline: PluginNamespace\\TransformationPipelines\\WPPostsPipeline
         |load:
         |  - name: wp_posts_to_json
         |    loader: JSON
         |    prefix: post.
         |    destination:
         |      path: $work
         |      file: posts.yaml.json
         |    options:
         |      flags:
         |        - JSON_PRETTY_PRINT
         |        - JSON_INVALID_UTF8_SUBSTITUTE
         |""".stripMargin.getBytes("UTF-8"))
    // the top-level migration file — reference migration.yaml structure
    Files.write(new java.io.File(work, "migration.yaml").toPath,
      """version: 1
        |name: Example Migration
        |slug: example_migration
        |ledger:
        |  path: 'output/ledgers'
        |migration:
        |  - !include "config/wp_posts.yaml"
        |""".stripMargin.getBytes("UTF-8"))
    val jobs = ConfigLoader.parseYamlFile(s"$work/migration.yaml")
    assert(jobs.size == 1 && jobs.head.name == "wp_posts")
    Pipeline.run(spark, jobs)
    // JSON_PRETTY_PRINT -> an indented JSON array file
    val text = new String(Files.readAllBytes(
      new java.io.File(work, "posts.yaml.json").toPath), "UTF-8")
    assert(text.startsWith("[\n"))
    val out = spark.read.option("multiLine", "true").json(s"$work/posts.yaml.json")
    assert(out.count() == 2)
    assert(out.select("post_name").as[String].collect().toSet ==
      Set("first-post", "another-one"))
    // the load-side prefix scoped the output to post.* (stripped)
    assert(out.columns.forall(!_.startsWith("legacy")))
  }

  test("cli: dry-run, analyze, extract partial stage") {
    val work = Files.createTempDirectory("graft_cli").toFile.getPath
    val csv = new java.io.File(work, "in.csv")
    Files.write(csv.toPath, "A,B\n1,x\n2,y\n3,z\n".getBytes("UTF-8"))
    val cfgPath = new java.io.File(work, "m.json")
    Files.write(cfgPath.toPath,
      s"""{"jobs":[{"name":"j1","extract":[{"kind":"csv","path":"${csv.getPath}"}]}]}"""
        .getBytes("UTF-8"))
    val jobs = ConfigLoader.parseFile(cfgPath.getPath)
    // dry-run + analyze paths (no exceptions, no loads)
    graft.Cli.run(spark, "process", jobs, Map("dry-run" -> "true"))
    graft.Cli.run(spark, "analyze", jobs, Map.empty)
    // extract stage writes a single json file
    graft.Cli.run(spark, "extract", jobs, Map("job" -> "j1", "out" -> work))
    val out = Sources.readJson(spark, s"$work/j1.json", multiLine = false)
    assert(out.count() == 3)
    assert(out.columns.toSet == Set("legacy.a", "legacy.b"))
  }

  test("tokenizer-aware trainer format: bpe_encode feeds pack_materialize from config") {
    val work = Files.createTempDirectory("graft_bpe_pack").toFile.getPath
    // mini ladder: l+o -> lo, lo+w -> low; "low low" -> [low, low]
    graft.llm.Bpe.saveLadder(Seq("l" -> "o", "lo" -> "w"),
      s"$work/ladder.txt")
    // BPE token counts (not whitespace!): doc 1 = [low, low] (2), doc
    // 2 = [x, y] (2), doc 3 = [low, x] (2); budget 4 -> docs 1+2 share
    // pack 0, doc 3 opens pack 1
    Seq((1L, "low low"), (2L, "xy"), (3L, "low x"))
      .toDF("doc_id", "text").write.parquet(s"$work/docs.parquet")
    val yaml =
      s"""jobs:
         |  - name: bpe_pack
         |    extract:
         |      - kind: parquet
         |        path: $work/docs.parquet
         |        prefix: ""
         |    transform:
         |      - kind: bpe_encode
         |        options:
         |          textCol: text
         |          piecesPath: $work/ladder.txt
         |          outCol: toks
         |      - kind: pack_materialize
         |        options:
         |          idCol: doc_id
         |          tokensCol: toks
         |          budget: 4
         |    load:
         |      - kind: training_shards
         |        options:
         |          idCol: pack_id
         |          dir: $work/out
         |          nShards: 2
         |""".stripMargin
    Files.write(new java.io.File(work, "migration.yaml").toPath,
      yaml.getBytes("UTF-8"))
    Pipeline.run(spark, ConfigLoader.parseYamlFile(s"$work/migration.yaml"),
      progress = _ => ())
    val packs = spark.read.parquet(s"$work/out/data")
    // the packed stream is BPE pieces, not whitespace words
    assert(packs.select(explode(col("tokens"))).as[String].collect().sorted
      .toSeq == Seq("low", "low", "low", "x", "x", "y"))
    assert(packs.select(col("pack_id"), col("n_docs"), col("n_tokens"))
      .as[(Long, Long, Long)].collect()
      .map { case (p, d2, t) => p -> ((d2, t)) }.toMap
      == Map(0L -> ((2L, 4L)), 1L -> ((1L, 2L))))
  }

  test("excess_weights load kind: measured domain rates persist as a reusable table") {
    import graft.pipeline.ConfigLoader.loadKinds
    val work = Files.createTempDirectory("graft_ew_cfg").toFile.getPath
    val docs = ((1L to 10L).map(i => (i, "a", "x y " * 20 + "x y")) ++
      (11L to 20L).map(i => (i, "b",
        Seq.tabulate(40)(j => ('a' + (i.toInt * 13 + j * 7) % 26).toChar.toString)
          .mkString(" "))))
      .toDF("doc_id", "domain", "text")
    val step = loadKinds("excess_weights")(Map("idCol" -> "doc_id",
      "textCol" -> "text", "domainCol" -> "domain",
      "dir" -> s"$work/weights"))
    graft.sinks.Sinks.runChain(docs, Seq(step))
    val tbl = spark.read.parquet(s"$work/weights")
      .select("domain", "weight", "rate")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // the random-soup domain carries higher loss -> higher weight; the
    // max upweight saturates at rate 1.0
    assert(tbl("b")._1 > tbl("a")._1)
    assert(tbl.values.map(_._2).max == 1.0)
  }

  test("mix_apply kind: persisted two-phase == in-flight mix_excess; unseen domains pass through") {
    import graft.pipeline.ConfigLoader.{loadKinds, transformKinds}
    val work = Files.createTempDirectory("graft_mixapply_cfg").toFile.getPath
    val docs = ((1L to 30L).map(i => (i, "a", "x y " * 20 + "x y")) ++
      (31L to 60L).map(i => (i, "b",
        Seq.tabulate(40)(j => ('a' + (i.toInt * 13 + j * 7) % 26).toChar.toString)
          .mkString(" "))))
      .toDF("doc_id", "domain", "text")
    // phase 1: measure 2 iterated steps on the corpus, persist rates
    graft.sinks.Sinks.runChain(docs, Seq(loadKinds("excess_weights")(Map(
      "idCol" -> "doc_id", "textCol" -> "text", "domainCol" -> "domain",
      "steps" -> "2", "dir" -> s"$work/rates"))))
    // phase 2 over the SAME corpus must equal the in-flight kind with
    // the same steps — the ledger round-trip changes nothing
    val applied = transformKinds("mix_apply")(Map(
      "ratesDir" -> s"$work/rates", "domainCol" -> "domain",
      "keyCol" -> "doc_id"))(docs)
      .select("doc_id").as[Long].collect().sorted
    val inflight = transformKinds("mix_excess")(Map(
      "idCol" -> "doc_id", "textCol" -> "text", "domainCol" -> "domain",
      "steps" -> "2"))(docs)
      .select("doc_id").as[Long].collect().sorted
    assert(applied.sameElements(inflight))
    assert(applied.nonEmpty)
    // a domain the proxy never priced keeps defaultRate 1.0 — every
    // row of the unseen domain survives
    val unseen = (100L to 110L).map(i => (i, "zz", "fresh domain text"))
      .toDF("doc_id", "domain", "text")
    val kept = transformKinds("mix_apply")(Map(
      "ratesDir" -> s"$work/rates", "domainCol" -> "domain",
      "keyCol" -> "doc_id"))(unseen).count()
    assert(kept == 11L)
    // ... and defaultRate 0.0 inverts that to "drop unpriced domains"
    val dropped = transformKinds("mix_apply")(Map(
      "ratesDir" -> s"$work/rates", "domainCol" -> "domain",
      "keyCol" -> "doc_id", "defaultRate" -> "0.0"))(unseen).count()
    assert(dropped == 0L)
  }

  test("unigram_encode kind: persisted pieces drive Viterbi segmentation from config") {
    import graft.pipeline.ConfigLoader.transformKinds
    val work = Files.createTempDirectory("graft_uni_cfg").toFile.getPath
    // pieces strongly favor "ab" as one token; chars carry low mass
    graft.llm.Unigram.savePieces(spark,
      Seq("ab" -> -0.5, "a" -> -4.0, "b" -> -4.0, "c" -> -4.0),
      s"$work/pieces")
    val df = Seq((1L, "ab c")).toDF("id", "text")
    val out = transformKinds("unigram_encode")(
      Map("textCol" -> "text", "piecesPath" -> s"$work/pieces",
        "outCol" -> "toks"))(df)
    assert(out.select(explode(col("toks"))).as[String].collect().toSeq
      == Seq("ab", "c"))
  }

  test("full curation vocabulary composes in ONE config: clean -> gate -> dedup -> near-dedup -> tokenize -> pack -> shards") {
    val work = Files.createTempDirectory("graft_full_cfg").toFile.getPath
    graft.llm.Bpe.saveLadder(Seq("l" -> "o", "lo" -> "w"),
      s"$work/ladder.txt")
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep green forest tonight with friends"
    val docs = Seq(
      (1L, prose),
      (2L, prose),                                 // exact dup of 1
      (3L, prose + " extra"),                      // near-dup of 1
      (4L, "low low​ low entirely different content about mountains " +
        "rivers and valleys under a pale morning sky with seven birds"),
        // ^ zero-width junk inside; unrelated prose so it survives
      (5L, "too short")                            // fails minWords
    ).toDF("doc_id", "text")
    docs.write.parquet(s"$work/docs.parquet")
    val yaml =
      s"""jobs:
         |  - name: full_curate
         |    extract:
         |      - kind: parquet
         |        path: $work/docs.parquet
         |        prefix: ""
         |    transform:
         |      - kind: strip_invisible
         |        options:
         |          column: text
         |      - kind: quality_filter
         |        options:
         |          column: text
         |          minWords: 5
         |          minMeanWordLen: 0
         |          maxMeanWordLen: 1000
         |          maxPunctRatio: 1.0
         |      - kind: dedup_exact
         |        options:
         |          idCol: doc_id
         |          textCol: text
         |      - kind: dedup_minhash
         |        options:
         |          idCol: doc_id
         |          textCol: text
         |          threshold: '0.5'
         |      - kind: bpe_encode
         |        options:
         |          textCol: text
         |          piecesPath: $work/ladder.txt
         |          outCol: toks
         |      - kind: pack_materialize
         |        options:
         |          idCol: doc_id
         |          tokensCol: toks
         |          budget: 64
         |    load:
         |      - kind: training_shards
         |        options:
         |          idCol: pack_id
         |          dir: $work/out
         |          nShards: 2
         |""".stripMargin
    Files.write(new java.io.File(work, "migration.yaml").toPath,
      yaml.getBytes("UTF-8"))
    Pipeline.run(spark, ConfigLoader.parseYamlFile(s"$work/migration.yaml"),
      progress = _ => ())
    val packs = spark.read.parquet(s"$work/out/data")
    val tokens = packs.select(explode(col("tokens"))).as[String].collect()
    // doc 5 gated, doc 2 exact-dropped, doc 3 near-dropped -> survivors
    // are docs 1 and 4; doc 4's BPE pieces include the merged "low"s
    // (the invisible char was stripped BEFORE near-dedup/tokenize)
    assert(tokens.count(_ == "low") == 3)
    assert(!tokens.exists(_.contains("​")))
    // packed token mass reconciles with the materialized streams
    val total = packs.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(total == tokens.length.toLong)
    assert(spark.read.parquet(s"$work/out/manifest").count() > 0)
  }

  test("trainer-format YAML pipeline: tokenize -> pack -> certified shards") {
    val work = Files.createTempDirectory("graft_trainer_cfg").toFile.getPath
    // budget 4: doc 1 fills pack 0 exactly; doc 2 (3 toks, offset 4)
    // opens pack 1; doc 4 (5 toks, offset 7) straddles and stays in its
    // STARTING pack 1 (packSequences' straddle convention); the empty
    // doc 3 is dropped by the pack_materialize kind
    Seq((1L, "a b c d"), (2L, "e f g"), (3L, ""), (4L, "h i j k l"))
      .toDF("doc_id", "text").write.parquet(s"$work/docs.parquet")
    val yaml =
      s"""jobs:
         |  - name: trainer_format
         |    extract:
         |      - kind: parquet
         |        path: $work/docs.parquet
         |        prefix: ""
         |    transform:
         |      - kind: pack_materialize
         |        options:
         |          idCol: doc_id
         |          textCol: text
         |          budget: 4
         |    load:
         |      - kind: training_shards
         |        options:
         |          idCol: pack_id
         |          dir: $work/out
         |          nShards: 2
         |""".stripMargin
    Files.write(new java.io.File(work, "migration.yaml").toPath,
      yaml.getBytes("UTF-8"))
    val jobs = ConfigLoader.parseYamlFile(s"$work/migration.yaml")
    assert(jobs.size == 1 && jobs.head.name == "trainer_format")
    Pipeline.run(spark, jobs, progress = _ => ())
    // layout: one shard=N dir per shard under data/, manifest alongside
    val dataDirs = new java.io.File(s"$work/out/data").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dataDirs.nonEmpty && dataDirs.forall(_.startsWith("shard=")))
    val packs = spark.read.parquet(s"$work/out/data")
    // pack contents: every token of every non-empty doc lands exactly once
    assert(packs.select(explode(col("tokens"))).as[String].collect().sorted
      .toSeq == Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l"))
    // pack shape: {0 -> (1 doc, 4 toks), 1 -> (2 docs, 8 toks)}
    assert(packs.select(col("pack_id"), col("n_docs"), col("n_tokens"))
      .as[(Long, Long, Long)].collect()
      .map { case (p, d2, t) => p -> ((d2, t)) }.toMap
      == Map(0L -> ((1L, 4L)), 1L -> ((2L, 8L))))
    // the manifest certifies what landed: per-shard row counts and rank
    // ranges agree with a re-read of the written files
    val manifest = spark.read.parquet(s"$work/out/manifest")
      .select(col("shard"), col("n_rows"), col("min_rank"), col("max_rank"))
      .as[(Long, Long, String, String)].collect().toSet
    val rederived = packs
      .groupBy(col("shard").cast("long"))
      .agg(count(lit(1)), min(col("rank")), max(col("rank")))
      .as[(Long, Long, String, String)].collect().toSet
    assert(manifest == rederived)
  }

  test("pack_greedy kind: no-split assignment from config options") {
    import graft.pipeline.ConfigLoader.transformKinds
    val docs = Seq((1L, "a b c d"), (2L, "e f g"), (3L, "h i")).toDF("doc_id", "text")
    // budget 4: doc1 fills pack0; doc2 opens pack1; doc3 (2 toks) does
    // not fit with doc2 (3+2>4) -> pack2
    val out = transformKinds("pack_greedy")(
      Map("idCol" -> "doc_id", "textCol" -> "text", "budget" -> "4"))(docs)
      .orderBy("doc_id").select("pack_id").as[Long].collect().toSeq
    assert(out == Seq(0L, 1L, 2L))
  }

  test("round-7 kinds: strip_duplicate_runs, token_budget, pack_greedy_materialize") {
    import graft.pipeline.ConfigLoader.transformKinds
    // strip_duplicate_runs: a 4-token run shared by docs 1 and 2 is
    // removed from both; unique text survives
    val docs = Seq((1L, "u1 u2 a b c d v1"), (2L, "w1 a b c d w2"),
      (3L, "x y z q")).toDF("doc_id", "text")
    val stripped = transformKinds("strip_duplicate_runs")(
      Map("idCol" -> "doc_id", "textCol" -> "text", "L" -> "4"))(docs)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(stripped == Seq((1L, "u1 u2 v1"), (2L, "w1 w2"), (3L, "x y z q")))
    // token_budget: STABLE schema — copy_idx is present at every
    // maxEpochs value (always the epochs sampler; tuning a config
    // between 1 and N epochs must not change columns under a sink)
    val src = Seq((1L, "a b", "s"), (2L, "c d", "s")).toDF("doc_id", "text", "src")
    val single = transformKinds("token_budget")(
      Map("idCol" -> "doc_id", "textCol" -> "text", "sourceCol" -> "src",
        "budget" -> "100"))(src)
    assert(single.columns.contains("copy_idx") && single.count() == 2)
    assert(single.select("copy_idx").as[Long].collect().forall(_ == 0L))
    val multi = transformKinds("token_budget")(
      Map("idCol" -> "doc_id", "textCol" -> "text", "sourceCol" -> "src",
        "budget" -> "8", "maxEpochs" -> "2"))(src)
    assert(multi.columns.contains("copy_idx") && multi.count() == 4)
    assert(multi.columns.toSeq == single.columns.toSeq)
    // url_canonicalize: in-place tracking-param strip from config
    val canon = transformKinds("url_canonicalize")(Map("column" -> "text"))(
      Seq((1L, "HTTPS://H.Example/a?utm_source=f&id=1")).toDF("doc_id", "text"))
      .select("text").as[String].collect().head
    assert(canon == "https://h.example/a?id=1")
    // pack_greedy_materialize: streams with EOS from config
    val mat = transformKinds("pack_greedy_materialize")(
      Map("idCol" -> "doc_id", "textCol" -> "text", "budget" -> "4",
        "docSep" -> "<eos>"))(docs.where(col("doc_id") === 3))
      .select("tokens").as[Seq[String]].collect().head
    assert(mat == Seq("x", "y", "z", "q", "<eos>"))
  }

  test("pq_index / ivfpq_index load kinds build queryable indexes") {
    import graft.pipeline.ConfigLoader.loadKinds
    val work = Files.createTempDirectory("graft_idx_cfg").toFile.getPath
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    loadKinds("pq_index")(Map("dir" -> s"$work/pq")) match {
      case graft.sinks.Sinks.Write(_, f) => f(emb)
    }
    val model = graft.llm.Similarity.loadPqModel(spark, s"$work/pq")
    assert(model.m == 8 && spark.read.parquet(s"$work/pq/codes").count() == emb.count())
    loadKinds("ivfpq_index")(Map("dir" -> s"$work/ivfpq", "nCentroids" -> "4")) match {
      case graft.sinks.Sinks.Write(_, f) => f(emb)
    }
    val got = graft.llm.Similarity.ivfPqQueryIndex(spark, s"$work/ivfpq",
      emb.where(col("vec_id") === 3)
        .select((col("vec_id") + 900000).as("vec_id"), col("embedding")),
      emb, k = 1).collect().head
    assert(got.getAs[Long]("neighbor_id") == 3L)
  }

  test("web-curation YAML pipeline: WET -> url -> c4 -> quality -> dedup") {
    val work = Files.createTempDirectory("graft_web_cfg").toFile.getPath
    // five WET conversion records: a keeper, its exact duplicate under
    // a later url (dedup drops it), a blocked domain, a casino-keyword
    // url, and a too-short page (quality filter drops it)
    val body = "the quick brown fox jumps over the lazy dog again today."
    def rec(url: String, text: String) = Seq(
      "WARC/1.0", "WARC-Type: conversion", s"WARC-Target-URI: $url",
      "WARC-Date: 2026-01-03T00:00:00Z", s"Content-Length: ${text.length}",
      "", text).mkString("\n")
    val wet = Seq(
      rec("https://good.example/a", body),
      rec("https://zgood.example/dupe", body),
      rec("https://bad.example/b", body),
      rec("https://fine.example/casino-night", body),
      rec("https://fine.example/short", "tiny page is too short.")
    ).mkString("\n") + "\n"
    new java.io.File(s"$work/wet").mkdirs()
    Files.write(new java.io.File(s"$work/wet/seg.wet").toPath,
      wet.getBytes("UTF-8"))
    val yaml =
      s"""jobs:
         |  - name: web_curate
         |    extract:
         |      - kind: warc_wet
         |        path: $work/wet
         |        prefix: ""
         |    transform:
         |      - kind: url_filter
         |        options:
         |          column: url
         |          blockedDomains: bad.example
         |          blockedKeywords: casino
         |      - kind: c4_filter
         |        options:
         |          column: text
         |          minLineWords: 3
         |          minSentences: 1
         |      - kind: quality_filter
         |        options:
         |          column: text
         |          minWords: 8
         |      - kind: dedup_exact
         |        options:
         |          idCol: url
         |          textCol: text
         |    load:
         |      - kind: json_dir
         |        options:
         |          path: $work/out
         |""".stripMargin
    Files.write(new java.io.File(work, "migration.yaml").toPath,
      yaml.getBytes("UTF-8"))
    Pipeline.run(spark, ConfigLoader.parseYamlFile(s"$work/migration.yaml"),
      progress = _ => ())
    val out = spark.read.json(s"$work/out")
    // only the keeper survives: dupe deduped (url-ordered first-wins),
    // bad.example domain-blocked, casino keyword-blocked, short page
    // quality-dropped
    assert(out.select("url").as[String].collect().toSeq ==
      Seq("https://good.example/a"))
    assert(out.select("text").as[String].collect().head == body)
  }

  test("raw-crawl YAML pipeline: responses -> extract -> psl url filter -> ledger dedup") {
    val work = Files.createTempDirectory("graft_raw_cfg").toFile.getPath
    val p1 = "first keeper page with plenty of ordinary prose words here."
    val p2 = "previously ingested page text with plenty of prose words here."
    val p3 = "second keeper page with plenty of ordinary prose words here."
    def rec(url: String, status: String, ctype: String, prose: String) = {
      val http = s"HTTP/1.1 $status\nContent-Type: $ctype"
      val html = "<html><body><nav><a href=\"/\">Home</a> <a href=\"/b\">About</a></nav>" +
        s"<p>$prose</p></body></html>"
      s"WARC/1.0\nWARC-Type: response\nWARC-Target-URI: $url\n" +
        s"WARC-Date: 2026-03-03T00:00:00Z\n" +
        s"Content-Length: ${http.length + 2 + html.length}\n\n$http\n\n$html"
    }
    val warc = Seq(
      rec("https://good.example/a", "200 OK", "text/html", p1),
      // blocklist entry blocked.co.fake matches this SUBDOMAIN host
      // only through the PSL (naive last-two key would be co.fake)
      rec("https://www.blocked.co.fake/x", "200 OK", "text/html", p1),
      rec("https://gone.example/y", "404 Not Found", "text/html", p1),
      rec("https://media.example/z", "200 OK", "application/pdf", p1),
      // extracted text already in the ingestion ledger -> dropped
      rec("https://good.example/old", "200 OK", "text/html", p2),
      rec("https://good.example/b", "200 OK", "text/html", p3)
    ).mkString("\n") + "\n"
    new java.io.File(s"$work/warc").mkdirs()
    Files.write(new java.io.File(s"$work/warc/seg.warc").toPath,
      warc.getBytes("UTF-8"))
    Files.write(new java.io.File(s"$work/psl.dat").toPath,
      "// test rules\nco.fake\n".getBytes("UTF-8"))
    Seq("blocked.co.fake").toDF("domain")
      .write.parquet(s"$work/blocklist")
    Seq((0L, p2)).toDF("url_id", "text").write.parquet(s"$work/ledger")
    val yaml =
      s"""jobs:
         |  - name: raw_curate
         |    extract:
         |      - kind: warc_responses
         |        path: $work/warc
         |        prefix: ""
         |        status: "200"
         |        contentType: text/html
         |    transform:
         |      - kind: html_extract
         |        options:
         |          column: html
         |          outCol: text
         |      - kind: url_filter
         |        options:
         |          column: url
         |          blocklistPath: $work/blocklist
         |          pslPath: $work/psl.dat
         |      - kind: dedup_exact_against
         |        options:
         |          idCol: url
         |          textCol: text
         |          ledgerPath: $work/ledger
         |    load:
         |      - kind: json_dir
         |        options:
         |          path: $work/out
         |""".stripMargin
    Files.write(new java.io.File(work, "migration.yaml").toPath,
      yaml.getBytes("UTF-8"))
    Pipeline.run(spark, ConfigLoader.parseYamlFile(s"$work/migration.yaml"),
      progress = _ => ())
    val out = spark.read.json(s"$work/out")
    assert(out.select("url").as[String].collect().toSeq.sorted ==
      Seq("https://good.example/a", "https://good.example/b"))
    // boilerplate gone, prose extracted
    assert(out.where(col("url") === "https://good.example/a")
      .select("text").as[String].collect().head == p1)
  }

  // ---- resumable stage cache (`cache:` job key / StageCache) -------------

  private def cacheCfg(work: String, out: String, minWords: Int = 5,
                       budget: Int = 64): String = {
    val cfg =
      s"""{"jobs": [{
         |  "name": "cached_curation",
         |  "cache": "$work/cache",
         |  "extract": [{"kind": "parquet", "path": "$work/docs", "prefix": ""}],
         |  "transform": [
         |    {"kind": "quality_filter",
         |     "options": {"column": "text", "minWords": "$minWords",
         |       "minMeanWordLen": "0", "maxMeanWordLen": "1000",
         |       "maxPunctRatio": "1.0"}},
         |    {"kind": "dedup_exact", "options": {"idCol": "doc_id", "textCol": "text"}},
         |    {"kind": "pack_materialize",
         |     "options": {"idCol": "doc_id", "textCol": "text", "budget": "$budget"}}],
         |  "load": [{"kind": "training_shards",
         |    "options": {"idCol": "pack_id", "dir": "$out", "nShards": "2"}}]
         |}]}""".stripMargin
    val p = new java.io.File(work, s"cache_${minWords}_$budget.json")
    Files.write(p.toPath, cfg.getBytes("UTF-8"))
    p.getPath
  }

  private def cacheDocs(n: Long) = (1L to n).map { i =>
    // ids ≡ 2 (mod 10) are exact re-keyed copies of i-1 (dedup prey);
    // ids ≡ 0 (mod 7) are two-word shorts the quality gate drops
    val text =
      if (i % 7 == 0) "too short"
      else if (i % 10 == 2) (1 to 12).map(w => s"w${(i - 1) % 97}x$w").mkString(" ")
      else (1 to 12).map(w => s"w${i % 97}x$w").mkString(" ")
    (i, text)
  }.toDF("doc_id", "text")

  private def shardTotals(out: String): Seq[(Long, Long, Long)] =
    spark.read.parquet(s"$out/data")
      .groupBy(col("shard").cast("long"))
      .agg(sum("n_tokens").cast("long"), sum("n_docs").cast("long"))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)

  test("stage cache resumes unchanged stages; edits invalidate exactly downstream") {
    val work = Files.createTempDirectory("graft_stagecache").toFile.getPath
    val cache = s"$work/cache"
    cacheDocs(60).write.mode("overwrite").parquet(s"$work/docs")
    // uncached twin first: the ground truth the cached runs must equal
    val plainCfg = cacheCfg(work, s"$work/out_plain")
    val plainJobs = ConfigLoader.parse(
      new String(Files.readAllBytes(new java.io.File(plainCfg).toPath), "UTF-8")
        .replace(s""""cache": "$work/cache",""", ""))
    Pipeline.run(spark, plainJobs, progress = _ => ())
    val truth = shardTotals(s"$work/out_plain")

    // run 1 (cold): every stage computes
    Pipeline.run(spark,
      ConfigLoader.parseFile(cacheCfg(work, s"$work/out1")), progress = _ => ())
    val r1 = StageCache.lastReport(cache).get
    assert(r1.computedSteps == Seq(0, 1, 2) && r1.reusedSteps.isEmpty)
    assert(shardTotals(s"$work/out1") == truth)

    // run 2 (warm, identical config): every stage resumes from disk
    Pipeline.run(spark,
      ConfigLoader.parseFile(cacheCfg(work, s"$work/out2")), progress = _ => ())
    val r2 = StageCache.lastReport(cache).get
    assert(r2.reusedSteps == Seq(0, 1, 2) && r2.computedSteps.isEmpty)
    assert(shardTotals(s"$work/out2") == truth)

    // run 3: pack budget edited -> ONLY the pack stage recomputes
    Pipeline.run(spark,
      ConfigLoader.parseFile(cacheCfg(work, s"$work/out3", budget = 32)),
      progress = _ => ())
    val r3 = StageCache.lastReport(cache).get
    assert(r3.reusedSteps == Seq(0, 1) && r3.computedSteps == Seq(2))

    // run 4: quality gate edited -> everything downstream recomputes
    Pipeline.run(spark,
      ConfigLoader.parseFile(cacheCfg(work, s"$work/out4", minWords = 3)),
      progress = _ => ())
    val r4 = StageCache.lastReport(cache).get
    assert(r4.computedSteps == Seq(0, 1, 2) && r4.reusedSteps.isEmpty)

    // fingerprints chain: run 3 shares stages 0-1 with run 1, differs at 2
    assert(r3.entries.take(2).map(_.fingerprint) ==
      r1.entries.take(2).map(_.fingerprint))
    assert(r3.entries(2).fingerprint != r1.entries(2).fingerprint)
  }

  test("stage cache invalidates when an input file changes") {
    val work = Files.createTempDirectory("graft_stagecache_in").toFile.getPath
    cacheDocs(40).write.mode("overwrite").parquet(s"$work/docs")
    Pipeline.run(spark,
      ConfigLoader.parseFile(cacheCfg(work, s"$work/out1")), progress = _ => ())
    assert(StageCache.lastReport(s"$work/cache").get.computedSteps == Seq(0, 1, 2))
    // same config, regenerated input -> the chain must NOT resume
    cacheDocs(41).write.mode("overwrite").parquet(s"$work/docs")
    Pipeline.run(spark,
      ConfigLoader.parseFile(cacheCfg(work, s"$work/out2")), progress = _ => ())
    val r = StageCache.lastReport(s"$work/cache").get
    assert(r.computedSteps == Seq(0, 1, 2) && r.reusedSteps.isEmpty)
  }

  test("stage cache prune deletes only unreachable stage dirs") {
    val work = Files.createTempDirectory("graft_stagecache_pr").toFile.getPath
    val cache = s"$work/cache"
    cacheDocs(40).write.mode("overwrite").parquet(s"$work/docs")
    Pipeline.run(spark,
      ConfigLoader.parseFile(cacheCfg(work, s"$work/out1")), progress = _ => ())
    Pipeline.run(spark,
      ConfigLoader.parseFile(cacheCfg(work, s"$work/out2", budget = 32)),
      progress = _ => ())
    val dirs = new java.io.File(cache).list().toSeq.filter(_.startsWith("stage_"))
    assert(dirs.length == 4) // stages 0,1 shared; two pack variants
    // prune against the budget=32 chain: the budget=64 pack dir dies
    val steps = Seq(
      ConfigLoader.StepConfig("quality_filter", Map("column" -> "text",
        "minWords" -> "5", "minMeanWordLen" -> "0", "maxMeanWordLen" -> "1000",
        "maxPunctRatio" -> "1.0")),
      ConfigLoader.StepConfig("dedup_exact",
        Map("idCol" -> "doc_id", "textCol" -> "text")),
      ConfigLoader.StepConfig("pack_materialize", Map("idCol" -> "doc_id",
        "textCol" -> "text", "budget" -> "32")))
    val extract = Seq(ConfigLoader.StepConfig("parquet",
      Map("path" -> s"$work/docs", "prefix" -> "")))
    val deleted = StageCache.prune(spark, cache, extract, steps)
    assert(deleted.length == 1 && deleted.head.contains("pack_materialize"))
    // the surviving chain still resumes fully
    Pipeline.run(spark,
      ConfigLoader.parseFile(cacheCfg(work, s"$work/out3", budget = 32)),
      progress = _ => ())
    val r = StageCache.lastReport(cache).get
    assert(r.reusedSteps == Seq(0, 1, 2))
  }

  // ---- `stream:` jobs (config-driven continuous curation) ----------------

  test("stream job parse: batch planner skips it, stream parser binds it, malformed fails loudly") {
    val work = Files.createTempDirectory("graft_streamcfg").toFile.getPath
    def write(yaml: String): String = {
      val p = new java.io.File(work, "s.yaml")
      Files.write(p.toPath, yaml.getBytes("UTF-8")); p.getPath
    }
    val good = write(
      s"""jobs:
         |  - name: seed
         |    extract:
         |      - kind: parquet
         |        path: $work/docs
         |        prefix: ""
         |    load:
         |      - kind: seed_curated_pack
         |        options: {idCol: doc_id, textCol: text, budget: '64', dir: $work/led}
         |  - name: cont
         |    stream:
         |      source:
         |        kind: parquet_stream
         |        path: $work/in
         |      curate:
         |        - kind: quality_filter
         |          options: {column: text, minWords: '3', minMeanWordLen: '0', maxMeanWordLen: '1000', maxPunctRatio: '1.0'}
         |      pack: {dir: $work/led, idCol: doc_id, textCol: text, budget: '64'}
         |      availableNow: true
         |""".stripMargin)
    // one file, two surfaces: the batch planner sees ONLY the seed job
    assert(ConfigLoader.parseYamlFile(good).map(_.name) == Seq("seed"))
    val specs = ConfigLoader.parseStreamsYamlFile(good)
    assert(specs.map(_.name) == Seq("cont"))
    val sp = specs.head
    assert(sp.source.kind == "parquet_stream" &&
      sp.source.options("path") == s"$work/in")
    assert(sp.curate.map(_.kind) == Seq("quality_filter") &&
      sp.curate.head.options("minWords") == "3")
    assert(sp.pack("budget") == "64" && sp.availableNow)
    // loud failures: unknown stream key / missing source / missing pack
    def streamYaml(body: String) = write(
      s"""jobs:
         |  - name: bad
         |    stream:
         |$body
         |""".stripMargin)
    intercept[Pipeline.ValidationException](ConfigLoader.parseStreamsYamlFile(
      streamYaml("      sauce: {kind: parquet_stream, path: /x}\n      pack: {dir: /y}")))
    intercept[Pipeline.ValidationException](ConfigLoader.parseStreamsYamlFile(
      streamYaml("      pack: {dir: /y, idCol: a, textCol: b, budget: '1'}")))
    intercept[Pipeline.ValidationException](ConfigLoader.parseStreamsYamlFile(
      streamYaml("      source: {kind: parquet_stream, path: /x}")))
    // unknown source kind surfaces at run time with the known list
    val badKind = ConfigLoader.StreamSpec("b",
      ConfigLoader.StepConfig("nope", Map("path" -> "/x")), Nil,
      Map("dir" -> "/y", "idCol" -> "a", "textCol" -> "b", "budget" -> "1"),
      availableNow = true)
    intercept[Pipeline.ValidationException](ConfigLoader.runStream(spark, badKind))
  }

  test("stream job with index sink: one-config continuous vector-store ingest") {
    val work = Files.createTempDirectory("graft_streamix").toFile.getPath
    // base index: 3 well-separated unit-ish vectors
    val base = Seq((0L, Seq(1.0f, 0.0f, 0.0f)), (1L, Seq(0.0f, 1.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    graft.llm.Similarity.buildIvfIndex(base, s"$work/ix", nCentroids = 2)
    // landing dir: an ε-twin of indexed vec 0 (new id) + a novel
    // diagonal vector + a null-id row the curate stage must drop
    new java.io.File(s"$work/in").mkdirs()
    Seq((Some(100L), Seq(0.999f, 0.001f, 0.0f)),
      (Some(7L), Seq(0.6f, 0.6f, 0.5f)),
      (Option.empty[Long], Seq(0.1f, 0.1f, 0.1f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$work/in")
    val p = new java.io.File(work, "ix.yaml")
    Files.write(p.toPath,
      s"""jobs:
         |  - name: vecs
         |    stream:
         |      source:
         |        kind: parquet_stream
         |        path: $work/in
         |      curate:
         |        - kind: where
         |          options: {column: vec_id, matches: '.'}
         |      index:
         |        dir: $work/ix
         |        kind: ivf
         |        semanticDedupThreshold: '0.98'
         |      availableNow: true
         |""".stripMargin.getBytes("UTF-8"))
    val spec = ConfigLoader.parseStreamsYamlFile(p.getPath).head
    assert(spec.index("kind") == "ivf" && spec.pack.isEmpty)
    ConfigLoader.runStreamOnce(spark, spec)
    val ids = spark.read.parquet(s"$work/ix/assignments")
      .select("neighbor_id").as[Long].collect().toSet
    assert(ids == Set(0L, 1L, 2L, 7L),
      s"twin refused, novel landed, base intact: $ids")
    // drain is idempotent by the ledger: a second run adds nothing
    ConfigLoader.runStreamOnce(spark, spec)
    assert(spark.read.parquet(s"$work/ix/assignments").count() == 4L)
    // exactly one of pack/index, and unknown index kinds fail loudly
    def streamYaml(body: String): String = {
      val f = new java.io.File(work, "bad.yaml")
      Files.write(f.toPath,
        s"""jobs:
           |  - name: bad
           |    stream:
           |$body
           |""".stripMargin.getBytes("UTF-8"))
      f.getPath
    }
    intercept[Pipeline.ValidationException](ConfigLoader.parseStreamsYamlFile(
      streamYaml("      source: {kind: parquet_stream, path: /x}\n" +
        "      pack: {dir: /y}\n      index: {dir: /z}")))
    val badKind = ConfigLoader.parseStreamsYamlFile(streamYaml(
      "      source: {kind: parquet_stream, path: " + s"$work/in}\n" +
        "      index: {dir: /z, kind: hnsw}")).head
    intercept[Pipeline.ValidationException](
      ConfigLoader.runStream(spark, badKind))
  }

  test("stream job with search sink: one-config continuous serving") {
    val work = Files.createTempDirectory("graft_streamsv").toFile.getPath
    val base = Seq((0L, Seq(1.0f, 0.0f, 0.0f)), (1L, Seq(0.0f, 1.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    graft.llm.Similarity.buildIvfIndex(base, s"$work/ix", nCentroids = 2)
    // query landing dir: near-twins of vecs 0 and 2, plus a null-id
    // row the curate stage must drop
    new java.io.File(s"$work/q").mkdirs()
    Seq((Some(500L), Seq(0.99f, 0.01f, 0.0f)),
      (Some(501L), Seq(0.0f, 0.01f, 0.99f)),
      (Option.empty[Long], Seq(0.5f, 0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$work/q")
    val p = new java.io.File(work, "serve.yaml")
    Files.write(p.toPath,
      s"""jobs:
         |  - name: serve
         |    stream:
         |      source:
         |        kind: parquet_stream
         |        path: $work/q
         |      curate:
         |        - kind: where
         |          options: {column: vec_id, matches: '.'}
         |      search:
         |        indexDir: $work/ix
         |        outDir: $work/answers
         |        k: 1
         |      availableNow: true
         |""".stripMargin.getBytes("UTF-8"))
    val spec = ConfigLoader.parseStreamsYamlFile(p.getPath).head
    assert(spec.search("outDir") == s"$work/answers" && spec.pack.isEmpty)
    ConfigLoader.runStreamOnce(spark, spec)
    val top = spark.read.parquet(s"$work/answers")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(top == Map(500L -> 0L, 501L -> 2L))
    // re-drain answers nothing twice (answer ledger idempotence)
    ConfigLoader.runStreamOnce(spark, spec)
    assert(spark.read.parquet(s"$work/answers").count() == 2L)
    // search + pack together is rejected
    val bad = new java.io.File(work, "bad.yaml")
    Files.write(bad.toPath,
      s"""jobs:
         |  - name: bad
         |    stream:
         |      source: {kind: parquet_stream, path: /x}
         |      pack: {dir: /y}
         |      search: {indexDir: /i, outDir: /o}
         |""".stripMargin.getBytes("UTF-8"))
    intercept[Pipeline.ValidationException](
      ConfigLoader.parseStreamsYamlFile(bad.getPath))
  }

  test("stream job with pairs sink: one-config continuous pair ingest") {
    val work = Files.createTempDirectory("graft_streampairs").toFile.getPath
    val vOk = Seq(1.0f, 0.0f, 0.0f)
    val cap = "the quick brown fox jumps over the lazy dog"
    new java.io.File(s"$work/in").mkdirs()
    Seq(
      (1L, graft.multimodal.Multimodal.syntheticPng(1L, 16, 16), cap, vOk, vOk),
      (2L, graft.multimodal.Multimodal.syntheticPng(1L, 16, 16), cap, vOk, vOk), // content twin
      (3L, graft.multimodal.Multimodal.syntheticPng(3L, 4, 16), cap, vOk, vOk))  // too narrow
      .toDF("pair_id", "payload", "caption", "img_emb", "txt_emb")
      .write.mode("overwrite").parquet(s"$work/in")
    val p = new java.io.File(work, "pairs.yaml")
    Files.write(p.toPath,
      s"""jobs:
         |  - name: pairs
         |    stream:
         |      source:
         |        kind: parquet_stream
         |        path: $work/in
         |      pairs:
         |        dir: $work/store
         |        minWidth: '8'
         |        minWords: '3'
         |        minAlign: '0.5'
         |      availableNow: true
         |""".stripMargin.getBytes("UTF-8"))
    val spec = ConfigLoader.parseStreamsYamlFile(p.getPath).head
    assert(spec.pairs("dir") == s"$work/store" && spec.pack.isEmpty)
    ConfigLoader.runStreamOnce(spark, spec)
    val ids = spark.read.parquet(s"$work/store/accepted")
      .select("pair_id").as[Long].collect().toSet
    assert(ids == Set(1L), s"twin + narrow refused: $ids")
    // re-drain adds nothing
    ConfigLoader.runStreamOnce(spark, spec)
    assert(spark.read.parquet(s"$work/store/accepted").count() == 1L)
  }

  test("config-driven WARC stream: crawl landing dir -> extract -> gate -> ledger pack, one config") {
    graft.plans.GraftExtensions.register(spark)
    val work = Files.createTempDirectory("graft_warccfg").toFile.getPath
    new java.io.File(s"$work/landing").mkdirs()
    def rec(uri: String, status: String, prose: String): String = {
      val http = s"HTTP/1.1 $status\nContent-Type: text/html"
      val html = s"<html><body><p>$prose</p></body></html>"
      s"WARC/1.0\nWARC-Type: response\nWARC-Target-URI: $uri\n" +
        s"WARC-Date: 2026-04-04T00:00:00Z\n" +
        s"Content-Length: ${http.length + 2 + html.length}\n\n$http\n\n$html"
    }
    val p1 = "segment one page with plenty of ordinary prose words here."
    val p2 = "short."
    // seed ledgers from one batch doc
    Seq(("https://seed.example/0",
        "the seed page text with plenty of ordinary words in it."))
      .toDF("url", "text")
      .write.mode("overwrite").parquet(s"$work/seed")
    Pipeline.run(spark, ConfigLoader.parse(
      s"""{"jobs": [{"name": "seed",
         |  "extract": [{"kind": "parquet", "path": "$work/seed", "prefix": ""}],
         |  "load": [{"kind": "seed_curated_pack",
         |    "options": {"idCol": "url", "textCol": "text", "budget": "16",
         |      "dir": "$work/led"}}]}]}""".stripMargin), progress = _ => ())
    val yaml =
      s"""jobs:
         |  - name: crawl
         |    stream:
         |      source:
         |        kind: warc_responses_stream
         |        path: $work/landing
         |        status: 200
         |        contentType: text/html
         |      curate:
         |        - kind: html_extract
         |          options: {column: html, outCol: text}
         |        - kind: quality_filter
         |          options: {column: text, minWords: '5', minMeanWordLen: '0', maxMeanWordLen: '1000', maxPunctRatio: '1.0'}
         |      pack: {dir: $work/led, idCol: url, textCol: text, budget: '16'}
         |      availableNow: true
         |""".stripMargin
    Files.write(new java.io.File(work, "crawl.yaml").toPath,
      yaml.getBytes("UTF-8"))
    Files.write(new java.io.File(s"$work/landing", "seg1.warc").toPath,
      (Seq(rec("https://a.example/1", "200 OK", p1),
        rec("https://a.example/err", "404 Not Found", p1),
        rec("https://a.example/2", "200 OK", p2)).mkString("\n") + "\n")
        .getBytes("UTF-8"))
    val spec = ConfigLoader.parseStreamsYamlFile(s"$work/crawl.yaml").head
    ConfigLoader.runStreamOnce(spark, spec)
    val ids = spark.read.parquet(s"$work/led/assign").select("doc_id")
      .as[String].collect().toSet
    // 404 gated at the source, short page gated by quality, seed intact
    assert(ids == Set("https://seed.example/0", "https://a.example/1"))
    // a second drain re-reads seg1 — ledger idempotence, no re-pack
    ConfigLoader.runStreamOnce(spark, spec)
    assert(spark.read.parquet(s"$work/led/assign").count() == 2L)
  }

  test("cli stream verb: drains the config's stream jobs; fails loudly with none") {
    val work = Files.createTempDirectory("graft_clistream").toFile.getPath
    (1L to 6L).map(i => (i, (1 to 8).map(w => s"w${i}x$w").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$work/seed")
    new java.io.File(s"$work/in").mkdirs()
    val cfg =
      s"""jobs:
         |  - name: seed
         |    extract:
         |      - kind: parquet
         |        path: $work/seed
         |        prefix: ""
         |    load:
         |      - kind: seed_curated_pack
         |        options: {idCol: doc_id, textCol: text, budget: '16', dir: $work/led}
         |  - name: cont
         |    stream:
         |      source:
         |        kind: parquet_stream
         |        path: $work/in
         |        schemaFrom: $work/seed
         |      pack: {dir: $work/led, idCol: doc_id, textCol: text, budget: '16'}
         |      availableNow: true
         |""".stripMargin
    val p = new java.io.File(work, "c.yaml")
    Files.write(p.toPath, cfg.getBytes("UTF-8"))
    Pipeline.run(spark, ConfigLoader.parseYamlFile(p.getPath), progress = _ => ())
    // land one file, drain through the CLI verb
    (10L to 12L).map(i => (i, (1 to 8).map(w => s"w${i}x$w").mkString(" ")))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$work/tmp")
    val part = new java.io.File(s"$work/tmp").listFiles()
      .find(_.getName.startsWith("part-")).get
    java.nio.file.Files.move(part.toPath,
      new java.io.File(s"$work/in/b1.parquet").toPath)
    graft.Cli.runStreams(spark, p.getPath, Map.empty)
    assert(spark.read.parquet(s"$work/led/assign").count() == 9L)
    // --job selects by name; a miss lists the candidates
    val miss = intercept[IllegalArgumentException](
      graft.Cli.runStreams(spark, p.getPath, Map("job" -> "nope")))
    assert(miss.getMessage.contains("cont"))
    // a config without stream jobs fails loudly
    val batchOnly = new java.io.File(work, "b.json")
    Files.write(batchOnly.toPath,
      s"""{"jobs": [{"name": "j", "extract": [{"kind": "parquet", "path": "$work/seed"}]}]}"""
        .getBytes("UTF-8"))
    intercept[IllegalArgumentException](
      graft.Cli.runStreams(spark, batchOnly.getPath, Map.empty))
  }

  test("where kind: equals / in / matches / not; loud on zero or two predicates") {
    import graft.pipeline.ConfigLoader.transformKinds
    val df = Seq((1L, "src3", "alpha"), (2L, "src17", "beta"),
      (3L, "src30", "gamma"), (4L, "other", "delta"))
      .toDF("id", "source", "txt")
    def ids(o: Map[String, String]) = transformKinds("where")(o)(df)
      .select("id").as[Long].collect().toSet
    assert(ids(Map("column" -> "source", "equals" -> "src3")) == Set(1L))
    assert(ids(Map("column" -> "source", "in" -> "src3, src17")) ==
      Set(1L, 2L))
    // `in` is exact membership, not a prefix match: src30 stays out
    assert(ids(Map("column" -> "source", "matches" -> "^src(3|17)$")) ==
      Set(1L, 2L))
    assert(ids(Map("column" -> "source", "in" -> "src3,src17",
      "not" -> "true")) == Set(3L, 4L))
    intercept[Pipeline.ValidationException] {
      transformKinds("where")(Map("column" -> "source"))(df)
    }
    intercept[Pipeline.ValidationException] {
      transformKinds("where")(Map("column" -> "source",
        "equals" -> "a", "in" -> "b"))(df)
    }
  }

  test("pack_curriculum kind packs in (score, id) order from config") {
    import graft.pipeline.ConfigLoader.transformKinds
    val df = Seq((1L, 2L, "a b c d e"), (2L, 5L, "a b c d e f g h i"),
      (3L, 2L, "a b c"), (4L, 1L, "a b c d e f g"))
      .toDF("doc_id", "score", "text")
    val out = transformKinds("pack_curriculum")(Map(
        "idCol" -> "doc_id", "scoreCol" -> "score",
        "textCol" -> "text", "budget" -> "10"))(df)
      .select("doc_id", "token_offset")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(4L -> 0L, 1L -> 7L, 3L -> 12L, 2L -> 15L), s"got $out")
  }

  test("one-config STREAMING SFT curation: nested convs stream -> gate -> render -> ledger pack") {
    // the nested SFT kinds are pure projections, so they slot into a
    // stream job's curate: list unchanged — continuous post-training
    // data curation with zero new streaming machinery
    val work = Files.createTempDirectory("graft_sftstream").toFile.getPath
    new java.io.File(s"$work/landing").mkdirs()
    def conv(id: Long, msgs: Seq[(String, String)]) = (id, msgs)
    // seed ledgers from one valid batch conversation
    Seq(conv(0L, Seq("user" -> "seed prompt", "assistant" -> "seed answer")))
      .toDF("conv_id", "raw")
      .withColumn("messages", transform(col("raw"),
        x => struct(x("_1").as("role"), x("_2").as("content"))))
      .drop("raw")
      .write.mode("overwrite").parquet(s"$work/seedconvs")
    Pipeline.run(spark, ConfigLoader.parse(
      s"""{"jobs": [{"name": "seed",
         |  "extract": [{"kind": "parquet", "path": "$work/seedconvs", "prefix": ""}],
         |  "transform": [
         |    {"kind": "sft_validate_nested"}, {"kind": "sft_render_nested"}],
         |  "load": [{"kind": "seed_curated_pack",
         |    "options": {"idCol": "conv_id", "textCol": "text",
         |      "budget": "64", "dir": "$work/led"}}]}]}""".stripMargin),
      progress = _ => ())
    // landing batch: one valid conv, one malformed (assistant-first)
    Seq(conv(1L, Seq("user" -> "hi there", "assistant" -> "hello you")),
        conv(2L, Seq("assistant" -> "backwards", "user" -> "x")))
      .toDF("conv_id", "raw")
      .withColumn("messages", transform(col("raw"),
        x => struct(x("_1").as("role"), x("_2").as("content"))))
      .drop("raw")
      .write.mode("overwrite").parquet(s"$work/landing")
    val yaml =
      s"""jobs:
         |  - name: sft_stream
         |    stream:
         |      source:
         |        kind: parquet_stream
         |        path: $work/landing
         |      curate:
         |        - kind: sft_validate_nested
         |        - kind: sft_render_nested
         |      pack: {dir: $work/led, idCol: conv_id, textCol: text, budget: '64'}
         |      availableNow: true
         |""".stripMargin
    Files.write(new java.io.File(work, "sft.yaml").toPath,
      yaml.getBytes("UTF-8"))
    val spec = ConfigLoader.parseStreamsYamlFile(s"$work/sft.yaml").head
    ConfigLoader.runStreamOnce(spark, spec)
    val ids = spark.read.parquet(s"$work/led/assign").select("doc_id")
      .as[Long].collect().toSet
    // malformed conv 2 gated in-stream; valid conv 1 packed; seed intact
    assert(ids == Set(0L, 1L))
    // re-drain: ledger idempotence holds for the SFT shape too
    ConfigLoader.runStreamOnce(spark, spec)
    assert(spark.read.parquet(s"$work/led/assign").count() == 2L)
  }

  test("sft kinds: validate-gate -> dedup -> render as chain stages") {
    import graft.pipeline.ConfigLoader.transformKinds
    val turns = Seq(
      // conv 1 valid; conv 2 a case-variant duplicate of 1; conv 3
      // malformed (assistant-first) — the gate drops it before dedup
      (1L, 0L, "user", "Hi there"), (1L, 1L, "assistant", "hello"),
      (2L, 0L, "user", "hi  THERE"), (2L, 1L, "assistant", "Hello"),
      (3L, 0L, "assistant", "x"), (3L, 1L, "user", "y"))
      .toDF("conv_id", "turn_idx", "role", "content")
    val gated = transformKinds("sft_validate")(Map())(turns)
    assert(gated.select("conv_id").distinct().as[Long].collect().toSet
      == Set(1L, 2L))
    val deduped = transformKinds("sft_dedup")(Map())(gated)
    assert(deduped.select("conv_id").distinct().as[Long].collect().toSet
      == Set(1L))
    val rendered = transformKinds("sft_render")(Map())(deduped)
      .as[(Long, Long, String)].collect()
    assert(rendered.toSeq ==
      Seq((1L, 2L, "<|user|>Hi there<|end|><|assistant|>hello<|end|>")))
    // annotate mode keeps malformed turns, tagged
    val annotated = transformKinds("sft_validate")(
      Map("annotate" -> "true"))(turns)
    assert(annotated.where(col("conv_id") === 3)
      .select("reason").distinct().as[String].collect().toSeq
      == Seq("role_order"))
  }

  test("link-graph + ablation kinds: kind paths equal the library calls") {
    import ConfigLoader.transformKinds
    val events = graft.Queries.readEvents(spark, sfDir)
    // transitions -> pagerank -> host_prior through the registry
    val edgesK = transformKinds("graph_transitions")(
      Map("gapMinutes" -> "240"))(events)
    val edgesL = graft.llm.LinkGraph.sessionTransitions(events,
      get_json_object(col("props"), "$.k").cast("long"), gapMinutes = 240)
    assert(rowsOf(edgesK) == rowsOf(edgesL))
    val ranksK = transformKinds("pagerank")(
      Map("orderedFold" -> "true"))(edgesK)
    val ranksL = graft.llm.LinkGraph.pageRank(edgesL, iters = 3,
      orderedFold = true)
    assert(rowsOf(ranksK) == rowsOf(ranksL))
    val priorsK = transformKinds("host_prior")(Map())(ranksK)
    val priorsL = graft.llm.LinkGraph.hostPrior(ranksL,
      concat(lit("src"), (col("node") % 20).cast("string")))
    assert(rowsOf(priorsK) == rowsOf(priorsL))
    // gate through priorsPath (the two-phase handoff)
    val work = Files.createTempDirectory("graft_graph_kind").toString
    priorsK.write.mode("overwrite").parquet(s"$work/priors")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val gatedK = transformKinds("host_prior_gate")(
      Map("priorsPath" -> s"$work/priors", "minPrior" -> "0.05"))(docs)
    val gatedL = graft.llm.LinkGraph.priorGate(docs, priorsL,
      "source", minPrior = 0.05)
    assert(rowsOf(gatedK) == rowsOf(gatedL))
    // ablation ladder kind == operator; rung column present
    val ladK = transformKinds("ablation_ladder")(
      Map("keyCol" -> "doc_id", "rungs" -> "0.1,0.5,1.0"))(docs)
    val ladL = graft.llm.Mixing.ablationLadder(docs, "doc_id",
      Seq(0.1, 0.5, 1.0))
    assert(rowsOf(ladK) == rowsOf(ladL))
  }

  test("ablation_ladder kind: malformed rung lists fail as ValidationException") {
    import ConfigLoader.transformKinds
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // non-numeric entry
    val e1 = intercept[Pipeline.ValidationException](
      transformKinds("ablation_ladder")(
        Map("keyCol" -> "doc_id", "rungs" -> "0.1,abc"))(docs))
    assert(e1.getMessage.contains("abc"))
    // operator invariants surface as the config failure type too
    val e2 = intercept[Pipeline.ValidationException](
      transformKinds("ablation_ladder")(
        Map("keyCol" -> "doc_id", "rungs" -> "0.5,0.1"))(docs))
    assert(e2.getMessage.contains("ascending"))
  }

  test("bm25_gate kind equals the library gate") {
    import ConfigLoader.transformKinds
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val viaKind = transformKinds("bm25_gate")(
      Map("query" -> "hash join merge", "minScore" -> "0.9"))(docs)
    val viaLib = graft.llm.Search.bm25Gate(docs, "hash join merge", 0.9)
    assert(rowsOf(viaKind) == rowsOf(viaLib))
    assert(viaKind.count() > 0 && viaKind.count() < docs.count())
  }

  test("BM25 two-phase kinds: build_postings sink + bm25_serve / " +
      "bm25_gate(indexPath) equal the inline paths") {
    import ConfigLoader.{loadKinds, transformKinds}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val work = Files.createTempDirectory("graft_bm25_kind").toString
    // build through the sink registry
    loadKinds("build_postings")(Map("path" -> s"$work/ix")) match {
      case graft.sinks.Sinks.Write(_, f) => f(docs)
      case other => fail(s"expected a Write sink, got $other")
    }
    // serve battery through the transform registry == inline battery
    import spark.implicits._
    val bench = Seq((1L, "hash join merge"), (2L, "sort spill"))
      .toDF("qid", "text")
    val servedK = transformKinds("bm25_serve")(
      Map("indexPath" -> s"$work/ix", "k" -> "4"))(bench)
    val inline = graft.llm.Search.bm25JoinTopK(docs, bench, k = 4)
    assert(rowsOf(servedK) == rowsOf(inline))
    // gate with indexPath == inline gate
    val gateK = transformKinds("bm25_gate")(
      Map("indexPath" -> s"$work/ix", "query" -> "hash join merge",
        "minScore" -> "0.9"))(docs)
    val gateL = graft.llm.Search.bm25Gate(docs, "hash join merge", 0.9)
    assert(rowsOf(gateK) == rowsOf(gateL))
  }

  test("pagerank_trace / pagerank_refresh kinds equal the library paths") {
    import ConfigLoader.transformKinds
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_rank_kind").toString
    val edges = (0L until 30L).map(i =>
        (i % 10L, (i * 3 + 1) % 10L, (i % 2) + 1L))
      .toDF("src", "dst", "weight")
      .groupBy(col("src"), col("dst")).agg(sum(col("weight")).as("weight"))
    val traced = transformKinds("pagerank_trace")(Map(
      "traceDir" -> s"$dir/trace", "iters" -> "3",
      "orderedFold" -> "true"))(edges)
    assert(rowsOf(traced) ==
      rowsOf(graft.llm.LinkGraph.pageRank(edges, 3, orderedFold = true)))
    val delta = Seq((0L, 1L, 2L)).toDF("src", "dst", "weight")
    val merged = edges.unionByName(delta)
      .groupBy(col("src"), col("dst")).agg(sum(col("weight")).as("weight"))
    val refreshed = transformKinds("pagerank_refresh")(Map(
      "traceDir" -> s"$dir/trace"))(delta)
    assert(rowsOf(refreshed) ==
      rowsOf(graft.llm.LinkGraph.pageRank(merged, 3, orderedFold = true)))
  }

  test("phased_shards kind: routes to the operator; malformed phases reject") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_phased_kind").toString
    val docs = (0L until 90L).map(i => (i, s"d${i % 3}", "w " * 9 + "w"))
      .toDF("doc_id", "domain", "text")
    graft.sinks.Sinks.runChain(docs, Seq(
      ConfigLoader.loadKinds("phased_shards")(Map(
        "idCol" -> "doc_id", "textCol" -> "text", "domainCol" -> "domain",
        "phases" -> "p1=200:d0=0.5,d1=0.5;p2=100:d2=1.0",
        "budget" -> "64", "dir" -> s"$dir/out", "nShards" -> "2"))))
    assert(new java.io.File(s"$dir/out/phase-0000/shards/manifest").exists)
    assert(new java.io.File(s"$dir/out/phase-0001/shards/manifest").exists)
    val e = intercept[Pipeline.ValidationException](
      graft.sinks.Sinks.runChain(docs, Seq(
        ConfigLoader.loadKinds("phased_shards")(Map(
          "idCol" -> "doc_id", "textCol" -> "text",
          "domainCol" -> "domain", "phases" -> "p1:d0=x",
          "budget" -> "64", "dir" -> s"$dir/bad", "nShards" -> "2")))))
    assert(e.getMessage.contains("phased_shards"))
  }

  test("append_postings / rebuild_postings_if_stale kinds: library paths + ledger") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_bm25_maint").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(300)
    graft.sinks.Sinks.runChain(docs.where(col("doc_id") % 3 =!= 0), Seq(
      ConfigLoader.loadKinds("build_postings")(
        Map("path" -> s"$dir/ix", "shards" -> "4"))))
    // append the held-out third through the kind
    graft.sinks.Sinks.runChain(docs.where(col("doc_id") % 3 === 0), Seq(
      ConfigLoader.loadKinds("append_postings")(
        Map("path" -> s"$dir/ix"))))
    // the append landed its post-event stats in a committed delta dir
    // under the build's committed generation
    assert(spark.read.parquet(s"$dir/ix/gen-0000/delta-0000/stats").head()
      .getAs[Long]("n") == docs.count())
    // healthy maintenance pass appends a no-rebuild audit row
    graft.sinks.Sinks.runChain(docs, Seq(
      ConfigLoader.loadKinds("rebuild_postings_if_stale")(
        Map("path" -> s"$dir/ix", "staleFloor" -> "0.5"))))
    val audit = spark.read.parquet(s"$dir/ix/maintenance")
      .select("rebuilt", "drift").as[(Boolean, Double)].collect().toSeq
    assert(audit == Seq((false, 0.0)), audit.toString)
  }

  test("hybrid_retrieve kind equals the library fusion") {
    import ConfigLoader.transformKinds
    import spark.implicits._
    val work = Files.createTempDirectory("graft_hybrid_kind").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    docs.write.parquet(s"$work/docs")
    embs.write.parquet(s"$work/embs")
    val bench = docs.where(col("doc_id") === 11L)
      .select((col("doc_id") + 9000L).as("qid"), col("text"))
      .join(embs.select((col("vec_id") + 9000L).as("qid"),
        col("embedding")), Seq("qid"))
    val viaKind = transformKinds("hybrid_retrieve")(
      Map("docsPath" -> s"$work/docs", "embPath" -> s"$work/embs",
        "k" -> "4", "kPerSignal" -> "6"))(bench)
    val viaLib = graft.llm.Search.hybridRetrieve(docs, embs, bench,
      k = 4, kPerSignal = 6)
    assert(rowsOf(viaKind) == rowsOf(viaLib) && viaKind.count() == 4)
  }

  test("hybrid_retrieve kind: indexed pair routes to the index fusion; half a pair rejects") {
    import ConfigLoader.transformKinds
    val work = Files.createTempDirectory("graft_hybrid_ix_kind").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    graft.llm.Search.buildPostings(docs, s"$work/bm25", shards = 4)
    graft.llm.Similarity.buildIvfIndex(embs, s"$work/ann")
    val bench = docs.where(col("doc_id") === 11L)
      .select((col("doc_id") + 9000L).as("qid"), col("text"))
      .join(embs.select((col("vec_id") + 9000L).as("qid"),
        col("embedding")), Seq("qid"))
    val viaKind = transformKinds("hybrid_retrieve")(
      Map("bm25IndexPath" -> s"$work/bm25", "annIndexPath" -> s"$work/ann",
        "k" -> "4", "kPerSignal" -> "6", "nProbe" -> "16"))(bench)
    val viaLib = graft.llm.Search.hybridRetrieveIndexed(spark,
      s"$work/bm25", s"$work/ann", bench, k = 4, kPerSignal = 6,
      nProbe = 16)
    assert(rowsOf(viaKind) == rowsOf(viaLib) && viaKind.count() == 4)
    val e = intercept[Pipeline.ValidationException](
      transformKinds("hybrid_retrieve")(
        Map("bm25IndexPath" -> s"$work/bm25"))(bench).count())
    assert(e.getMessage.contains("pair"))
  }

  test("hybrid_retrieve kind: family ivfpq serves the compressed index via rerankPath") {
    import ConfigLoader.transformKinds
    val work = Files.createTempDirectory("graft_hybrid_pq_kind").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    embs.write.parquet(s"$work/embs")
    graft.llm.Search.buildPostings(docs, s"$work/bm25", shards = 4)
    graft.llm.Similarity.buildIvfPqIndex(embs, s"$work/ann",
      nCentroids = 4, m = 4, k = 8)
    val bench = docs.where(col("doc_id") === 11L)
      .select((col("doc_id") + 9000L).as("qid"), col("text"))
      .join(embs.select((col("vec_id") + 9000L).as("qid"),
        col("embedding")), Seq("qid"))
    val viaKind = transformKinds("hybrid_retrieve")(
      Map("bm25IndexPath" -> s"$work/bm25", "annIndexPath" -> s"$work/ann",
        "k" -> "4", "kPerSignal" -> "6", "nProbe" -> "4",
        "family" -> "ivfpq", "rerankPath" -> s"$work/embs",
        "shortlist" -> "64"))(bench)
    val viaLib = graft.llm.Search.hybridRetrieveIndexed(spark,
      s"$work/bm25", s"$work/ann", bench, k = 4, kPerSignal = 6,
      nProbe = 4, family = "ivfpq",
      rerank = Some(spark.read.parquet(s"$work/embs")), shortlist = 64)
    assert(rowsOf(viaKind) == rowsOf(viaLib) && viaKind.count() == 4)
  }

  test("retract_postings / retract_vector_index kinds scrub their stores") {
    val work = Files.createTempDirectory("graft_retract_kinds").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    graft.llm.Search.buildPostings(docs, s"$work/bm25", shards = 4)
    graft.llm.Similarity.buildIvfIndex(embs, s"$work/ann")
    val optOut = docs.where(col("doc_id") % 9 === 2).select(col("doc_id"))
    graft.sinks.Sinks.runChain(optOut, Seq(
      ConfigLoader.loadKinds("retract_postings")(
        Map("dir" -> s"$work/bm25", "idCol" -> "doc_id")),
      ConfigLoader.loadKinds("retract_vector_index")(
        Map("dir" -> s"$work/ann", "idCol" -> "doc_id"))))
    // lexical: serving equals a rebuild over the survivors
    val fresh = Files.createTempDirectory("graft_retract_kinds_f").toString
    graft.llm.Search.buildPostings(docs.where(col("doc_id") % 9 =!= 2),
      fresh, shards = 4)
    import spark.implicits._
    val bench = Seq((1L, "hash join merge")).toDF("qid", "text")
    assert(graft.llm.Search.bm25ServeJoinTopK(spark, s"$work/bm25",
        bench, 5).orderBy("rank").collect().map(_.toString).toSeq ==
      graft.llm.Search.bm25ServeJoinTopK(spark, fresh, bench, 5)
        .orderBy("rank").collect().map(_.toString).toSeq)
    // vector: the scrubbed ids left the assignments ledger
    val left = spark.read.parquet(s"$work/ann/assignments")
      .select(col("neighbor_id")).collect().map(_.getLong(0)).toSet
    val out = optOut.collect().map(_.getLong(0)).toSet
    assert(left.intersect(out).isEmpty && left.nonEmpty)
  }

  test("compact_postings kind folds the event log; serving unchanged") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft_compact_kind").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
    graft.llm.Search.buildPostings(docs.where(col("doc_id") % 3 =!= 0),
      s"$work/ix", shards = 2)
    graft.llm.Search.appendPostings(spark,
      s"$work/ix", docs.where(col("doc_id") % 3 === 0))
    val bench = Seq((1L, "hash join merge")).toDF("qid", "text")
    val before = graft.llm.Search.bm25ServeJoinTopK(spark, s"$work/ix",
      bench, 5).orderBy("rank").collect().map(_.toString).toSeq
    graft.sinks.Sinks.runChain(docs, Seq(
      ConfigLoader.loadKinds("compact_postings")(
        Map("path" -> s"$work/ix", "shards" -> "2"))))
    // build = gen-0000, compaction = gen-0001; the vacuum kind (zero
    // grace for the test) reclaims the retired build generation
    assert(new java.io.File(s"$work/ix/gen-0001").exists)
    graft.sinks.Sinks.runChain(docs, Seq(
      ConfigLoader.loadKinds("vacuum_postings")(
        Map("path" -> s"$work/ix", "graceMs" -> "0"))))
    assert(!new java.io.File(s"$work/ix/gen-0000").exists)
    assert(!new java.io.File(s"$work/ix/postings").exists)
    assert(graft.llm.Search.bm25ServeJoinTopK(spark, s"$work/ix",
      bench, 5).orderBy("rank").collect().map(_.toString).toSeq == before)
  }

  test("compact_vector_index kind folds appended segments; serving unchanged") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft_vcompact_kind").toString
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    graft.llm.Similarity.buildIvfIndex(
      embs.where(col("vec_id") % 5 =!= 0), s"$work/ann")
    graft.llm.Similarity.appendIvfIndex(spark,
      embs.where(col("vec_id") % 5 === 0), s"$work/ann")
    val q = embs.where(col("vec_id") < 3)
    val before = graft.llm.Similarity.ivfQueryIndex(spark, s"$work/ann",
      q, k = 2).orderBy("query_id", "rank").collect()
      .map(_.toString).toSeq
    graft.sinks.Sinks.runChain(embs, Seq(
      ConfigLoader.loadKinds("compact_vector_index")(
        Map("dir" -> s"$work/ann"))))
    assert(new java.io.File(s"$work/ann/gen-0001").exists)
    assert(graft.llm.Similarity.ivfQueryIndex(spark, s"$work/ann",
      q, k = 2).orderBy("query_id", "rank").collect()
      .map(_.toString).toSeq == before)
  }

  test("trustrank_trace kind traces; pagerank_refresh serves the trust generation; vacuum_rank_trace reclaims") {
    import ConfigLoader.transformKinds
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_trust_kind").toString
    val edges = (0L until 30L).map(i =>
        (i % 10L, (i * 3 + 1) % 10L, (i % 2) + 1L))
      .toDF("src", "dst", "weight")
      .groupBy(col("src"), col("dst")).agg(sum(col("weight")).as("weight"))
    Seq(0L, 1L).toDF("node").write.parquet(s"$dir/seeds")
    val seeds = spark.read.parquet(s"$dir/seeds")
    val traced = transformKinds("trustrank_trace")(Map(
      "traceDir" -> s"$dir/trace", "seedsPath" -> s"$dir/seeds",
      "iters" -> "3", "orderedFold" -> "true"))(edges)
    assert(rowsOf(traced) ==
      rowsOf(graft.llm.LinkGraph.trustRank(edges, seeds, 3,
        orderedFold = true)))
    val delta = Seq((0L, 1L, 2L)).toDF("src", "dst", "weight")
    val merged = edges.unionByName(delta)
      .groupBy(col("src"), col("dst")).agg(sum(col("weight")).as("weight"))
    val refreshed = transformKinds("pagerank_refresh")(Map(
      "traceDir" -> s"$dir/trace"))(delta)
    assert(rowsOf(refreshed) ==
      rowsOf(graft.llm.LinkGraph.trustRank(merged, seeds, 3,
        orderedFold = true)))
    graft.sinks.Sinks.runChain(delta, Seq(
      ConfigLoader.loadKinds("vacuum_rank_trace")(
        Map("dir" -> s"$dir/trace"))))
    val gens = new java.io.File(s"$dir/trace").listFiles()
      .map(_.getName).filter(_.startsWith("gen-")).toSeq
    assert(gens == Seq("gen-0001"))
  }

  test("pagerank kind: redistributeDangling routes to the library option") {
    import ConfigLoader.transformKinds
    import spark.implicits._
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L))
      .toDF("src", "dst", "weight")
    val viaKind = transformKinds("pagerank")(Map("iters" -> "4",
      "orderedFold" -> "true", "redistributeDangling" -> "true"))(edges)
    assert(rowsOf(viaKind) == rowsOf(graft.llm.LinkGraph.pageRank(edges,
      4, orderedFold = true, redistributeDangling = true)))
    val total = viaKind.agg(sum(col("rank"))).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9)
  }

  test("stream search kind 'bm25' routes; unknown search kind rejects") {
    val d = Files.createTempDirectory("graft_bm25_streamcfg").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
    graft.llm.Search.buildPostings(docs, s"$d/ix", shards = 2)
    // land a FLAT part file (the file-stream source does not recurse)
    spark.read.parquet(s"$sfDir/documents.parquet").limit(3)
      .select(col("doc_id").as("qid"), col("text"))
      .coalesce(1).write.parquet(s"$d/tmp")
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$d/in"))
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$d/tmp"))
      .map(_.getPath).find(_.getName.startsWith("part-")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$d/in/b1.parquet"))
    docs.limit(1).select(col("doc_id").as("qid"), col("text"))
      .write.mode("overwrite").parquet(s"$d/schema")
    val yaml =
      s"""jobs:
         |  - name: bm25_serving
         |    stream:
         |      source:
         |        kind: parquet_stream
         |        path: $d/in
         |        schemaFrom: $d/schema
         |      search:
         |        kind: bm25
         |        indexDir: $d/ix
         |        outDir: $d/answers
         |        k: '3'
         |      availableNow: true
         |""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$d/cfg.yaml"), yaml)
    val specs = ConfigLoader.parseStreamsYamlFile(s"$d/cfg.yaml")
    // schemaFrom carries the full documents schema; queries project it
    val bad = yaml.replace("kind: bm25", "kind: nope")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$d/bad.yaml"), bad)
    intercept[Pipeline.ValidationException](
      ConfigLoader.runStreamOnce(spark,
        ConfigLoader.parseStreamsYamlFile(s"$d/bad.yaml").head))
    ConfigLoader.runStreamOnce(spark, specs.head)
    val answers = spark.read.parquet(s"$d/answers")
    assert(answers.select("qid").distinct().count() == 3)
    assert(answers.columns.toSeq ==
      Seq("qid", "rank", "doc_id", "matched_terms", "sum_tf", "dl"))
  }
}
