package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.{ConfigLoader, Pipeline}
import graft.sinks.Sinks

/** CLI — the `wp etl <command>` surface
  * (`lib/CommandRegistrar.php:25-37`):
  *
  *   process   <config.json> [--job a,b] [--skip c] [--dry-run]
  *   extract   <config.json> --job x --out dir [--mode json|csv]
  *   transform <config.json> --job x --out dir [--mode json|csv]
  *   analyze   <config.json>
  *   config    <config.json>          (validate only)
  *
  * `process --dry-run` previews the plan without running
  * (`ProcessCommand.php:149-152`); `analyze` counts rows per job
  * (`ProcessCommand.php:403-494`); `extract`/`transform` run partial
  * stages and write the frame (`ExtractCommand.php:62-119`,
  * `TransformCommand.php:92-118`).
  */
object Cli {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, usage)
    val command = args(0)
    val configPath = args(1)
    val flags = parseFlags(args.drop(2))
    // janitor's positional argument is the entity parquet path, not a
    // config file; yaml configs route through the !include-aware parser.
    // --strict (ConfigCommand.php:58-67): unknown-key + missing-
    // destination rejection on top of the lenient kind checks
    val strict = command == "config" && flags.contains("strict")
    val jobs =
      if (command == "janitor") Nil
      else if (configPath.endsWith(".yaml") || configPath.endsWith(".yml"))
        ConfigLoader.parseYamlFile(configPath, strict)
      else ConfigLoader.parseFile(configPath, strict)

    if (command == "config") {
      Pipeline.validate(jobs)
      println(s"config OK${if (strict) " (strict)" else ""}: " +
        s"${jobs.size} job(s): ${jobs.map(_.name).mkString(", ")}")
      return
    }
    if (command == "janitor") {
      runJanitor(configPath, flags)
      return
    }

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-etl")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      if (command == "stream") runStreams(spark, configPath, flags)
      else run(spark, command, jobs, flags)
    } finally spark.stop()
  }

  /** `stream` verb: run the config's `stream:` jobs — the continuous
    * curation surface. A job with `availableNow: true` (or `--drain`)
    * drains what its source has landed and stops (the epoch mode;
    * idempotent across invocations by the ledger contract); otherwise
    * the query runs until terminated. `--job a,b` selects by name. */
  private[graft] def runStreams(spark: SparkSession, configPath: String,
                                flags: Map[String, String]): Unit = {
    val only = flags.get("job").map(_.split(",").toSet).getOrElse(Set.empty)
    val all = ConfigLoader.parseStreamsFile(configPath)
    val specs = if (only.isEmpty) all else all.filter(s => only(s.name))
    require(specs.nonEmpty,
      if (all.isEmpty) s"no stream: jobs in $configPath"
      else s"--job matched none of: ${all.map(_.name).mkString(", ")}")
    specs.foreach { sp =>
      if (sp.availableNow || flags.contains("drain")) {
        ConfigLoader.runStreamOnce(spark, sp)
        println(s"[stream] ${sp.name}: drained")
      } else {
        val q = ConfigLoader.runStream(spark, sp)
        println(s"[stream] ${sp.name}: running until terminated")
        q.awaitTermination()
      }
    }
  }

  private[graft] def run(spark: SparkSession, command: String,
                         jobs: Seq[Pipeline.JobSpec],
                         flags: Map[String, String]): Unit = {
    val only = flags.get("job").map(_.split(",").toSet).getOrElse(Set.empty)
    val skip = flags.get("skip").map(_.split(",").toSet).getOrElse(Set.empty)
    command match {
      case "process" if flags.contains("dry-run") =>
        Pipeline.validate(jobs)
        jobs.filterNot(_.skip).foreach { j =>
          println(s"[dry-run] job ${j.name}: ${j.extract.size} source(s), " +
            s"${j.transform.size} transform(s), ${j.load.size} load step(s)" +
            (if (j.dependsOn.nonEmpty) s", depends on ${j.dependsOn.mkString(", ")}" else ""))
        }
      case "process" =>
        // --snapshot-dir: reference parity (ProcessCommand.php:349-362)
        // — snapshot the output tree before the run, restore on fatal.
        // --manifest: consume a prior analyze's manifest for progress
        // fractions (ProcessCommand.php:107-140)
        def go(): Map[String, Pipeline.JobResult] =
          Pipeline.run(spark, jobs, only = only, skip = skip,
            manifestPath = flags.get("manifest"))
        val res = flags.get("snapshot-dir") match {
          case Some(dir) => graft.sinks.Staging.withSnapshot(spark, dir)(go())
          case None => go()
        }
        res.foreach { case (n, _) => println(s"[process] job $n done") }
      case "analyze" =>
        val res = Pipeline.run(spark, jobs, only = only, skip = skip, analyze = true)
        res.foreach { case (n, r) => println(s"[analyze] $n: ${r.rows.getOrElse(-1L)} rows") }
        // persist the manifest a later `process --manifest` consumes
        flags.get("manifest").foreach(p =>
          Pipeline.writeAnalyzeManifest(spark, res, p))
      case "extract" | "transform" =>
        val name = flags.getOrElse("job", sys.error(s"$command requires --job"))
        val out = flags.getOrElse("out", sys.error(s"$command requires --out"))
        val mode = flags.getOrElse("mode", "json")
        Pipeline.validate(jobs)
        val job = jobs.find(_.name == name)
          .getOrElse(sys.error(s"unknown job '$name'"))
        val extracted = Pipeline.runExtract(spark, job)
        val frame =
          if (command == "extract") extracted
          else job.transform.foldLeft(extracted)((df, st) => st(df))
        val dest = Sinks.destination(out, s"$name.$mode", overwrite = true)
        mode match {
          case "json" => Sinks.writeJsonSingle(frame, dest)
          case "csv"  => Sinks.writeCsvSingle(frame, dest)
          case other  => sys.error(s"unknown --mode '$other'")
        }
        println(s"[$command] $name: ${frame.count()} rows -> $dest")
      case other => sys.error(s"unknown command '$other'\n$usage")
    }
  }

  /** `wp etl janitor` equivalent: rewrite an entity parquet table
    * without the rows matching `--post-type a,b` and/or the ids in
    * `--ledger-dir/--name`'s latest ledger. Staged write — a failure
    * leaves the table untouched. */
  private def runJanitor(path: String, flags: Map[String, String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-janitor")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val types = flags.get("post-type").map(_.split(",").toSeq).getOrElse(Nil)
      val ledger = flags.get("ledger-dir").map { dir =>
        graft.sources.Sources.ledgerLatest(spark,
          dir, flags.getOrElse("name", sys.error("janitor --ledger-dir requires --name")))
      }
      require(types.nonEmpty || ledger.nonEmpty,
        "janitor requires --post-type and/or --ledger-dir/--name")
      val (before, after) = graft.operators.Janitor.cleanParquet(spark, path, { df =>
        val afterTypes =
          if (types.isEmpty) df
          else graft.operators.Janitor.emptyPosts(df, types,
            typeCol = flags.getOrElse("type-col", "post_type"))
        ledger.fold(afterTypes)(l => graft.operators.Janitor.deleteByLedger(afterTypes, l,
          entityIdCol = flags.getOrElse("id-col", "id")))
      })
      println(s"[janitor] $path: $before -> $after rows (${before - after} deleted)")
    } finally spark.stop()
  }

  private def parseFlags(args: Array[String]): Map[String, String] = {
    val out = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      require(a.startsWith("--"), s"unexpected argument '$a'\n$usage")
      val key = a.stripPrefix("--")
      if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
        out(key) = args(i + 1); i += 2
      } else { out(key) = "true"; i += 1 }
    }
    out.toMap
  }

  private val usage: String =
    """usage: graft.Cli <process|extract|transform|analyze|config|janitor|stream> <config.json|.yaml|parquet>
      |  process   [--job a,b] [--skip c] [--dry-run] [--snapshot-dir dir] [--manifest path]
      |  analyze   [--job a,b] [--manifest path]
      |  extract   --job x --out dir [--mode json|csv]
      |  transform --job x --out dir [--mode json|csv]
      |  config    [--strict]
      |  janitor   <entity.parquet> [--post-type a,b] [--ledger-dir d --name n] [--id-col id]
      |  stream    [--job a,b] [--drain]   (run the config's stream: jobs)
      |""".stripMargin
}
