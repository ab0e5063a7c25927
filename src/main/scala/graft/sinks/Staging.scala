package graft.sinks

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** Snapshot-before / rollback-on-fatal — the reference snapshots the
  * database before `process` and restores it on a fatal error
  * (`ProcessCommand.php:349-362` `db export` / `db import`;
  * `BaseCommand.php:79-88` calls `rollback()` from `handle_error`).
  *
  * Two Spark-native equivalents over an output directory tree:
  *
  *  - [[stagedWrite]] — the SCALE path: write into a staging dir and
  *    atomically swap it in only on success. The target is never in a
  *    half-written state and a failure costs no restore copy. This is
  *    the default `process` protection.
  *  - [[withSnapshot]] — reference parity: copy the target aside
  *    before the run and restore it if the body throws (`db export`
  *    semantics). Pays a full copy — only for reference-scale outputs.
  *
  * Rename-based swap assumes a filesystem with atomic directory rename
  * (local FS, HDFS). On object stores swap the reference via a
  * catalog/manifest instead.
  */
object Staging {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Run `write` against a staging path, then atomically swap it into
    * `target`: target -> target.__old__, staging -> target, drop
    * __old__. On failure the staging dir is removed and `target` is
    * untouched. */
  def stagedWrite(spark: SparkSession, target: String)(write: String => Unit): Unit = {
    val dest = new Path(target)
    val f = fs(spark, dest)
    val staging = new Path(target + ".__staging__")
    val old = new Path(target + ".__old__")
    f.delete(staging, true)
    try {
      write(staging.toString)
      if (!f.exists(staging))
        sys.error(s"stagedWrite: write completed but produced nothing at $staging")
      if (f.exists(old) && !f.delete(old, true))
        sys.error(s"stagedWrite: cannot clear $old")
      val hadTarget = f.exists(dest)
      if (hadTarget && !f.rename(dest, old))
        sys.error(s"stagedWrite: cannot move $dest aside")
      if (!f.rename(staging, dest)) {
        // put the original back before failing — and if THAT also
        // fails, say where the data actually is instead of implying
        // the target was left untouched
        if (hadTarget && !f.rename(old, dest))
          sys.error(s"stagedWrite: cannot swap $staging into $dest AND " +
            s"restore failed — original data is at $old")
        sys.error(s"stagedWrite: cannot swap $staging into $dest")
      }
      f.delete(old, true)
    } catch {
      case e: Throwable =>
        f.delete(staging, true)
        throw e
    }
  }

  /** Reference-parity snapshot: copy `dir` aside, run `body`, restore
    * the copy if `body` throws (then rethrow), drop it on success.
    * Returns body's value. */
  def withSnapshot[A](spark: SparkSession, dir: String)(body: => A): A = {
    val target = new Path(dir)
    val f = fs(spark, target)
    val snap = new Path(dir + ".__snapshot__")
    val conf = spark.sparkContext.hadoopConfiguration
    f.delete(snap, true)
    val had = f.exists(target)
    if (had && !FileUtil.copy(f, target, f, snap, false, conf))
      sys.error(s"withSnapshot: cannot snapshot $dir")
    try {
      val r = body
      f.delete(snap, true)
      r
    } catch {
      case e: Throwable =>
        f.delete(target, true)
        if (had && !f.rename(snap, target))
          System.err.println(s"[staging] RESTORE FAILED: snapshot left at $snap")
        throw e
    }
  }

  /** Manual rollback: restore `dir` from a leftover snapshot (the
    * explicit `wp etl rollback` escape hatch). Returns true if a
    * snapshot existed and was restored. */
  def rollback(spark: SparkSession, dir: String): Boolean = {
    val target = new Path(dir)
    val f = fs(spark, target)
    val snap = new Path(dir + ".__snapshot__")
    if (!f.exists(snap)) false
    else {
      f.delete(target, true)
      if (!f.rename(snap, target)) sys.error(s"rollback: cannot restore $snap -> $dir")
      true
    }
  }
}
