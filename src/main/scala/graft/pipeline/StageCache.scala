package graft.pipeline

import java.security.MessageDigest

import scala.collection.mutable.ListBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.ConfigLoader.StepConfig

/** Resumable, fingerprint-keyed stage materialization for config
  * chains — the "don't redo the decontamination pass because the pack
  * budget changed" feature every long curation funnel needs at scale.
  *
  * A job that declares `cache: <dir>` has each TRANSFORM stage's
  * output written to a parquet directory keyed by the md5 chain
  * fingerprint of everything that could change that output:
  *
  *   fp(0)   = md5(extract kinds + canonical options + referenced
  *             input-file stats (path, length, mtime))
  *   fp(i+1) = md5(fp(i) | stage kind | canonical options | stats of
  *             any file/dir option the stage reads)
  *
  * On a re-run, a stage whose directory already exists (`_SUCCESS`
  * present) is read back instead of recomputed — and because the
  * fingerprint chains, editing stage k's options (or any input file)
  * invalidates exactly stages k..n while stages 0..k-1 resume from
  * disk. This is the published dev loop on 100 TB corpora: curation
  * stages upstream of the tweak are the expensive ones (extraction,
  * near-dedup, decontamination), and a downstream packing change must
  * not re-price them. The cache directory doubles as the restart
  * point after a mid-chain failure: completed stages resume, the
  * failed stage recomputes.
  *
  * Correctness stance: stage outputs in this library are
  * deterministic (md5-keyed sampling/ranking, DECIMAL-routed
  * aggregates) and parquet-representable, so resume ≡ recompute —
  * `curate_resume_shards` binds that equivalence to the DuckDB
  * oracle, and ConfigLoaderSpec proves cached ≡ uncached byte-for-
  * byte plus the exact invalidation frontier per tweak.
  *
  * Scale: the extra cost of a cold cached run is one parquet
  * write+read per stage boundary — the stage-boundary materialization
  * real pipelines already do (the `dedup_minhash` chain stage
  * materializes its input regardless). Reads are columnar and
  * pruned; fingerprints hash file METADATA (name, length, mtime),
  * never file contents, so fingerprinting a 100 TB input costs one
  * namenode listing.
  */
object StageCache {

  final case class Entry(step: Int, kind: String, fingerprint: String,
                         reused: Boolean)
  final case class Report(cacheDir: String, entries: Seq[Entry]) {
    def reusedSteps: Seq[Int] = entries.filter(_.reused).map(_.step)
    def computedSteps: Seq[Int] = entries.filterNot(_.reused).map(_.step)
  }

  /** Last completed run per cache dir — spec/query observability for
    * "which stages resumed". Keyed by cacheDir so concurrent suites
    * exercising different chains cannot race each other's reports. */
  private val reports =
    new java.util.concurrent.ConcurrentHashMap[String, Report]()
  def lastReport(cacheDir: String): Option[Report] =
    Option(reports.get(cacheDir))

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Option keys whose VALUES name files/directories the step reads —
    * their on-disk state (not contents: name, length, mtime per file)
    * folds into the fingerprint so editing an input invalidates the
    * stages that consumed it. `cacheDir` is excluded: it names a
    * cache the read itself populates (the RSS disk cache), so hashing
    * it would self-invalidate every warm run. */
  private def isPathKey(k: String): Boolean =
    k != "cacheDir" && (k == "path" || k == "dir" || k == "file" ||
      k.endsWith("Path") || k.endsWith("Dir") || k.endsWith("File"))

  /** Deterministic stat digest of everything under `loc` (one
    * recursive listing; files sorted by path). Absent paths hash as
    * a distinct marker so "file appears" also invalidates. */
  private def fileStats(spark: SparkSession, loc: String): String = {
    val p = new Path(loc)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) s"absent:$loc"
    else {
      val it = fs.listFiles(p, true)
      val b = ListBuffer.empty[String]
      while (it.hasNext) {
        val st = it.next()
        b += s"${st.getPath.toUri.getPath}:${st.getLen}:${st.getModificationTime}"
      }
      b.sorted.mkString(";")
    }
  }

  private def canonical(spark: SparkSession, step: StepConfig): String = {
    val opts = step.options.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString("|")
    val files = step.options.toSeq.filter(t => isPathKey(t._1)).sortBy(_._1)
      .map { case (k, v) => s"$k@${fileStats(spark, v)}" }.mkString("|")
    s"${step.kind}|$opts|$files"
  }

  /** The chain's base fingerprint: every extract step's kind, options,
    * and referenced input-file stats. Computed at RUN time (first
    * wrapped stage), so fixture files written after config parse still
    * fingerprint correctly. */
  private def sourceFingerprint(spark: SparkSession,
                                extract: Seq[StepConfig]): String =
    md5Hex(extract.map(canonical(spark, _)).mkString("&"))

  private def stageDir(cacheDir: String, step: Int, kind: String,
                       fp: String): String =
    f"$cacheDir/stage_$step%02d_${kind}_${fp.take(16)}"

  /** Wrap `stages` (resolved from `transform`) with fingerprint-keyed
    * parquet materialization under `cacheDir`. Stages run sequentially
    * inside one job fold, so the chain fingerprint threads through a
    * per-wrap var. */
  def wrap(cacheDir: String,
           extract: Seq[StepConfig],
           transform: Seq[StepConfig],
           stages: Seq[Pipeline.Stage]): Seq[Pipeline.Stage] = {
    require(transform.length == stages.length,
      s"stage cache: ${transform.length} step configs vs ${stages.length} stages")
    var chainFp: String = null
    val entries = ListBuffer.empty[Entry]
    stages.zipWithIndex.map { case (stage, i) =>
      (df: DataFrame) => {
        val spark = df.sparkSession
        if (i == 0) { chainFp = sourceFingerprint(spark, extract); entries.clear() }
        chainFp = md5Hex(s"$chainFp>${canonical(spark, transform(i))}")
        val dir = stageDir(cacheDir, i, transform(i).kind, chainFp)
        val success = new Path(dir, "_SUCCESS")
        val fs = success.getFileSystem(spark.sessionState.newHadoopConf())
        val hit = fs.exists(success)
        if (!hit) stage(df).write.mode("overwrite").parquet(dir)
        entries += Entry(i, transform(i).kind, chainFp, reused = hit)
        if (i == stages.length - 1)
          reports.put(cacheDir, Report(cacheDir, entries.toList))
        spark.read.parquet(dir)
      }
    }
  }

  /** Janitor: delete stage directories under `cacheDir` that the
    * CURRENT chain (extract + transform, with live file stats) can no
    * longer reach — the dead fingerprints left behind by config
    * iteration. Returns the deleted directory names. */
  def prune(spark: SparkSession, cacheDir: String,
            extract: Seq[StepConfig],
            transform: Seq[StepConfig]): Seq[String] = {
    var fp = sourceFingerprint(spark, extract)
    val live = transform.zipWithIndex.map { case (step, i) =>
      fp = md5Hex(s"$fp>${canonical(spark, step)}")
      new Path(stageDir(cacheDir, i, step.kind, fp)).getName
    }.toSet
    val root = new Path(cacheDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("stage_") &&
        !live(st.getPath.getName))
      .map { st => fs.delete(st.getPath, true); st.getPath.getName }
      .sorted
  }
}
