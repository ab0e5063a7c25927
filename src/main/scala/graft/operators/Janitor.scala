package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.columns.ColumnNs.q
import graft.sinks.Staging

/** `wp etl janitor` — batched cleanup of migrated entities
  * (`lib/Commands/JanitorCommand.php:122-137` deletes all posts of the
  * given types in `batch-size` chunks of per-row `wp_delete_post`
  * calls).
  *
  * Set-oriented equivalent: one anti-join / filter pass that REWRITES
  * the entity table without the matching rows — no per-row deletes, no
  * batch loop; Spark's partition parallelism replaces `--batch-size`.
  * The rewrite goes through [[Staging.stagedWrite]] so a failed clean
  * leaves the original table untouched (delete is the one operation
  * you cannot re-run your way out of).
  */
object Janitor {

  /** JanitorCommand `empty-posts`: drop every row whose `post_type` is
    * in `postTypes`. */
  def emptyPosts(posts: DataFrame, postTypes: Seq[String],
                 typeCol: String = "post_type"): DataFrame =
    posts.where(!q(typeCol).isin(postTypes: _*))

  /** Delete-where-ledger-matches: remove entities recorded in a
    * migration ledger (the "undo this migration's inserts" cleanup).
    * Anti-join on the id — the ledger side is migration-sized and
    * broadcast; the entity table is never collected. */
  def deleteByLedger(entities: DataFrame, ledger: DataFrame,
                     entityIdCol: String = "id",
                     ledgerIdCol: String = "id"): DataFrame =
    entities.join(
      broadcast(ledger.select(q(ledgerIdCol).as("__lid")).dropDuplicates("__lid")),
      q(entityIdCol) === col("__lid"), "left_anti")

  /** Orphaned-meta cleanup: meta rows whose parent entity no longer
    * exists (the follow-up pass after `empty-posts`). */
  def orphanMeta(meta: DataFrame, entities: DataFrame,
                 metaEntityCol: String = "entity_id",
                 entityIdCol: String = "id"): DataFrame =
    meta.join(entities.select(q(entityIdCol).as("__eid")).dropDuplicates("__eid"),
      q(metaEntityCol) === col("__eid"), "left_semi")

  /** Apply a cleanup to a parquet table IN PLACE via staged write +
    * atomic swap. Returns (rowsBefore, rowsAfter). On any failure the
    * original table is untouched. */
  def cleanParquet(spark: SparkSession, path: String,
                   clean: DataFrame => DataFrame): (Long, Long) = {
    val before = spark.read.parquet(path)
    val nBefore = before.count()
    var nAfter = 0L
    Staging.stagedWrite(spark, path) { staging =>
      val cleaned = clean(spark.read.parquet(path))
      cleaned.write.mode("overwrite").parquet(staging)
      nAfter = spark.read.parquet(staging).count()
    }
    (nBefore, nAfter)
  }
}
