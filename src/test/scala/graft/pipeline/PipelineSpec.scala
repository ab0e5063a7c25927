package graft.pipeline

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.columns.ColumnNs
import graft.sinks.Sinks
import graft.sources.Sources

class PipelineSpec extends SparkSpec {
  import Pipeline._
  import spark.implicits._

  private def job(name: String, deps: String*) = JobSpec(name, deps)

  test("validate accepts a legal DAG") {
    Pipeline.validate(Seq(job("a"), job("b", "a"), job("c", "a", "b")))
  }

  test("validate rejects unknown dependency") {
    val e = intercept[ValidationException] {
      Pipeline.validate(Seq(job("a", "ghost")))
    }
    assert(e.getMessage.contains("unknown job 'ghost'"))
  }

  test("validate rejects forward (declared-after) dependency") {
    val e = intercept[ValidationException] {
      Pipeline.validate(Seq(job("a", "b"), job("b")))
    }
    assert(e.getMessage.contains("declared after"))
  }

  test("validate rejects duplicate names") {
    intercept[ValidationException] {
      Pipeline.validate(Seq(job("a"), job("a")))
    }
  }

  test("validate rejects self-dependency as a cycle") {
    intercept[ValidationException] {
      Pipeline.validate(Seq(JobSpec("a", Seq("a"))))
    }
  }

  test("end-to-end §7.3 slice: csv -> normalize -> post pipeline -> json + ledger") {
    val work = Files.createTempDirectory("graft_e2e").toFile.getPath
    // fixture csv, reference README wp_posts.yaml shape
    val csv = new java.io.File(work, "in.csv")
    Files.write(csv.toPath,
      "Title,Content\nHello World,<p>Body</p><script>x</script>\nSecond Post,<b>ok</b>\n"
        .getBytes("UTF-8"))

    val jobs = Seq(JobSpec(
      name = "wp_posts",
      extract = Seq(SourceSpec(s => Sources.readCsv(s, csv.getPath))),
      transform = Seq(
        WpPipelines.postPipeline(WpPipelines.PostPipelineOpts(
          titleCol = "legacy.title", contentCol = "legacy.content")),
        df => df.withColumn("etl.uid",
          sha2(graft.columns.ColumnNs.q("post.post_name"), 256)),
        df => df.withColumn("ledger.post_name", graft.columns.ColumnNs.q("post.post_name"))),
      load = Seq(
        Sinks.Write("json", df => Sinks.prefixScoped(df, Seq("post."), removePrefix = true)(
          d => Sinks.writeJsonSingle(d.drop("post_date"), s"$work/out.json"))),
        Sinks.Write("ledger", df => Sinks.writeLedger(df, work, "wp_posts", "r1")))))

    val res = Pipeline.run(spark, jobs)
    assert(res.contains("wp_posts"))

    val out = Sources.readJson(spark, s"$work/out.json", multiLine = false)
    assert(out.count() == 2)
    val titles = out.select("post_title").as[String].collect().toSet
    assert(titles == Set("Hello World", "Second Post"))
    val slugs = out.select("post_name").as[String].collect().toSet
    assert(slugs == Set("hello-world", "second-post"))
    // kses stripped the script tag
    val contents = out.select("post_content").as[String].collect().mkString
    assert(!contents.contains("script"))

    val ledger = Sources.ledgerLatest(spark, work, "wp_posts")
    assert(ledger.count() == 2)
    assert(ledger.columns.toSet == Set("etl_uid", "post_name"))
  }

  test("analyze mode counts without loading") {
    val jobs = Seq(JobSpec(
      name = "counts",
      extract = Seq(SourceSpec(s => s.read.parquet(s"$sfDir/region.parquet"),
        prefix = None)),
      load = Seq(Sinks.Write("never", _ => fail("load must not run in analyze")))))
    val res = Pipeline.run(spark, jobs, analyze = true)
    assert(res("counts").rows.contains(5L))
  }

  test("process consumes the analyze manifest: per-job progress fractions") {
    val work = Files.createTempDirectory("graft_manifest").toFile.getPath
    def srcJob(name: String, table: String) = JobSpec(name,
      extract = Seq(SourceSpec(s => s.read.parquet(s"$sfDir/$table.parquet"),
        prefix = None)))
    val jobs = Seq(srcJob("regions", "region"), srcJob("nations", "nation"),
      srcJob("unanalyzed", "region"))
    // analyze persists the manifest (region=5, nation=25)...
    val analyzed = Pipeline.run(spark, jobs.take(2), analyze = true)
    Pipeline.writeAnalyzeManifest(spark, analyzed, s"$work/manifest.json")
    assert(Pipeline.readAnalyzeManifest(spark, s"$work/manifest.json") ==
      Map("regions" -> 5L, "nations" -> 25L))
    // ...process pre-reads it and reports cumulative fractions
    // (ProcessCommand.php:107-140); the job with no analysis data is
    // called out up front instead of silently skewing the total
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    Pipeline.run(spark, jobs, manifestPath = Some(s"$work/manifest.json"),
      progress = lines += _)
    assert(lines.exists(_.contains("analysis data missing for: unanalyzed")))
    assert(lines.exists(_.contains("regions: 5 row(s) expected; cumulative 5/30 (16%)")))
    assert(lines.exists(_.contains("nations: 25 row(s) expected; cumulative 30/30 (100%)")))
    // absent manifest file -> empty map, run proceeds without fractions
    assert(Pipeline.readAnalyzeManifest(spark, s"$work/nope.json").isEmpty)
  }

  test("only filter pulls in the transitive dependency closure") {
    def regionJob(name: String, deps: String*) = JobSpec(name, deps,
      extract = Seq(SourceSpec(s => s.read.parquet(s"$sfDir/region.parquet"), None)))
    val jobs = Seq(regionJob("a"), regionJob("b", "a"), regionJob("c", "b"),
      regionJob("unrelated"))
    val res = Pipeline.run(spark, jobs, only = Set("c"), analyze = true)
    assert(res.keySet == Set("a", "b", "c")) // dep-of-dep included, unrelated not
  }

  test("skip filter drops jobs") {
    val jobs = Seq(
      JobSpec("a", extract = Seq(SourceSpec(s => s.read.parquet(s"$sfDir/region.parquet"), None))),
      JobSpec("b", skip = true,
        extract = Seq(SourceSpec(_ => fail("skipped job must not extract")))))
    val res = Pipeline.run(spark, jobs, analyze = true)
    assert(res.keySet == Set("a"))
  }
}
