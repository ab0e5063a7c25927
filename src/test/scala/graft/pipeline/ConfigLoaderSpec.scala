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
}
