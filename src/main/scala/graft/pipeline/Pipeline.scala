package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.columns.ColumnNs
import graft.sinks.Sinks

/** Job / Migration planner — the driver-side equivalent of the
  * reference's `Pipeline` (`lib/Classes/Pipeline/Pipeline.php:69-221`)
  * and `PipelineJob` (`PipelineJob.php:100-134`).
  *
  * A migration is an ordered list of jobs; each job declares
  * extract sources, transform stages, and load steps. Validation
  * mirrors the reference exactly: dependency existence, declaration
  * ordering (a job may only depend on jobs declared BEFORE it), and
  * DFS cycle detection (`Pipeline.php:130-221`). Skipped jobs are
  * dropped at build time (`Pipeline.php:75-77`).
  *
  * Execution model (SURVEY §3.1 mapping): extract = read + merge +
  * normalize (all lazy), transform = chained `Stage`s (lazy), load =
  * the K6 enrichment/write chain — the single place actions run.
  * Results are registered so dependent jobs can look them up (the
  * ledger-based cross-job dependency, `PipelineJob.php:142-156`).
  */
object Pipeline {

  type Stage = DataFrame => DataFrame

  /** One extraction: produces a DataFrame; `prefix` applies the
    * DataNormalizer convention (snake_case + control strip + prefix,
    * `DataNormalizer.php:32-53`). */
  final case class SourceSpec(read: SparkSession => DataFrame,
                              prefix: Option[String] = Some("legacy."))

  final case class JobSpec(name: String,
                           dependsOn: Seq[String] = Nil,
                           skip: Boolean = false,
                           extract: Seq[SourceSpec] = Nil,
                           transform: Seq[Stage] = Nil,
                           load: Seq[Sinks.LoadStep] = Nil)

  final case class JobResult(name: String, frame: DataFrame, rows: Option[Long])

  final class ValidationException(msg: String) extends IllegalArgumentException(msg)

  /** Mirrors Pipeline.php:130-221: existence, declaration order, and
    * cycles (DFS with an on-stack set). Throws on the first violation. */
  def validate(jobs: Seq[JobSpec]): Unit = {
    val names = jobs.map(_.name)
    val dup = names.diff(names.distinct).distinct
    if (dup.nonEmpty)
      throw new ValidationException(s"duplicate job name(s): ${dup.mkString(", ")}")
    val index = names.zipWithIndex.toMap
    jobs.zipWithIndex.foreach { case (j, i) =>
      j.dependsOn.foreach { d =>
        index.get(d) match {
          case None =>
            throw new ValidationException(s"job '${j.name}' depends on unknown job '$d'")
          case Some(di) if di >= i =>
            throw new ValidationException(
              s"job '${j.name}' depends on '$d' which is declared after it")
          case _ =>
        }
      }
    }
    // DFS cycle detection (declaration-order rule already excludes
    // cycles, but the reference checks both; keep the explicit pass)
    val adj = jobs.map(j => j.name -> j.dependsOn).toMap
    val visited = scala.collection.mutable.Set.empty[String]
    val onStack = scala.collection.mutable.Set.empty[String]
    def dfs(n: String, path: List[String]): Unit = {
      if (onStack(n))
        throw new ValidationException(
          s"dependency cycle: ${(n :: path.takeWhile(_ != n) ::: List(n)).reverse.mkString(" -> ")}")
      if (!visited(n)) {
        visited += n; onStack += n
        adj.getOrElse(n, Nil).foreach(d => dfs(d, n :: path))
        onStack -= n
      }
    }
    names.foreach(dfs(_, Nil))
  }

  /** Extract phase for one job: read each source, apply the normalize
    * convention, merge heterogeneous sources by name
    * (`Extract/Orchestrator.php:216-227` — distributed here). */
  def runExtract(spark: SparkSession, job: JobSpec): DataFrame = {
    require(job.extract.nonEmpty, s"job '${job.name}' has no extract sources")
    val frames = job.extract.map { src =>
      val df = src.read(spark)
      src.prefix.fold(df)(p => ColumnNs.normalize(df, p))
    }
    ColumnNs.mergeAll(frames)
  }

  /** Persist the analyze manifest across runs — the reference stores
    * per-job counts in `wp_options` (`ProcessCommand.php:458-469`);
    * single-file JSON equivalent, re-readable as a frame. */
  def writeAnalyzeManifest(spark: SparkSession,
                           results: Map[String, JobResult], path: String): Unit = {
    import spark.implicits._
    val df = results.values.toSeq.sortBy(_.name)
      .map(r => (r.name, r.rows.getOrElse(-1L))).toDF("job", "n_rows")
    Sinks.writeJsonSingle(df, path)
  }

  /** Pre-read of the persisted analyze manifest — the reference sizes
    * its progress bar from the per-job counts `analyze` stored
    * (`ProcessCommand.php:107-140`). Absent file → empty map (process
    * still runs, just without fractions). */
  def readAnalyzeManifest(spark: SparkSession, path: String): Map[String, Long] =
    if (!new java.io.File(path).exists()) Map.empty
    else spark.read.json(path) // writeJsonSingle emits JSON-lines
      .select("job", "n_rows").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Run the full migration. `analyze = true` mirrors
    * `ProcessCommand.analyze` (`ProcessCommand.php:403-494`): count
    * rows per job (the only action) without running loads.
    *
    * `manifestPath` (process mode) consumes the manifest a prior
    * `analyze` persisted: per-job expected counts and cumulative
    * progress fractions go through `progress`, jobs missing analysis
    * data are called out up front, and an all-zero total warns —
    * the reference's progress-bar pre-read
    * (`ProcessCommand.php:107-140`). */
  def run(spark: SparkSession, jobs: Seq[JobSpec],
          only: Set[String] = Set.empty, skip: Set[String] = Set.empty,
          analyze: Boolean = false,
          manifestPath: Option[String] = None,
          progress: String => Unit = println): Map[String, JobResult] = {
    validate(jobs)
    // `only` pulls in the TRANSITIVE dependency closure of the selected
    // jobs (a selected job's dep-of-dep must still run first)
    val wanted: Set[String] =
      if (only.isEmpty) jobs.map(_.name).toSet
      else {
        val byName = jobs.map(j => j.name -> j).toMap
        val seen = scala.collection.mutable.Set.empty[String]
        def visit(n: String): Unit =
          if (!seen(n)) { seen += n; byName.get(n).foreach(_.dependsOn.foreach(visit)) }
        only.foreach(visit)
        seen.toSet
      }
    val selected = jobs
      .filterNot(_.skip)
      .filterNot(j => skip.contains(j.name))
      .filter(j => wanted.contains(j.name))
    // progress-bar pre-read (ProcessCommand.php:107-140): expected
    // counts from the persisted manifest, missing-analysis call-out,
    // zero-total warning
    val manifest: Map[String, Long] =
      if (analyze) Map.empty
      else manifestPath.map(readAnalyzeManifest(spark, _)).getOrElse(Map.empty)
    val totalExpected = selected.flatMap(j => manifest.get(j.name)).sum
    if (manifestPath.nonEmpty && !analyze) {
      val missing = selected.map(_.name).filterNot(manifest.contains)
      if (missing.nonEmpty)
        progress(s"[process] analysis data missing for: ${missing.mkString(", ")}" +
          " — run analyze to refresh the manifest")
      if (totalExpected == 0L)
        progress("[process] no rows found to process in analysis")
    }
    var doneExpected = 0L
    val results = scala.collection.mutable.LinkedHashMap.empty[String, JobResult]
    selected.foreach { job =>
      job.dependsOn.foreach { d =>
        if (!results.contains(d) && !jobs.exists(j => j.name == d && j.skip))
          require(results.contains(d),
            s"job '${job.name}': dependency '$d' has not produced a result")
      }
      val extracted = runExtract(spark, job)
      val transformed = job.transform.foldLeft(extracted)((df, st) => st(df))
      if (analyze) {
        results(job.name) = JobResult(job.name, transformed, Some(transformed.count()))
      } else {
        val loaded =
          if (job.load.isEmpty) transformed
          else Sinks.runChain(transformed, job.load)
        results(job.name) = JobResult(job.name, loaded, None)
        manifest.get(job.name).foreach { exp =>
          doneExpected += exp
          val pct =
            if (totalExpected > 0) s"${doneExpected * 100 / totalExpected}%"
            else "n/a"
          progress(s"[process] ${job.name}: $exp row(s) expected; " +
            s"cumulative $doneExpected/$totalExpected ($pct)")
        }
      }
    }
    results.toMap
  }
}
