package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.columns.ColumnNs.q

/** K7/K8/K10/K11/K13 core — the set-oriented upsert pattern.
  *
  * The reference resolves existence per row with point queries
  * (`lib/Classes/Load/Loaders/WordPressPostLoader.php:172-194` posts by
  * `(post_name, post_type)`; `WordPressTermLoader.php:118-145` terms by
  * slug/name; `WPUserLoader.php:83-90` users by email/login) and then
  * update-merges with existing values or insert-merges with defaults
  * (`WPPostsLoader.php:119-146`). Set-oriented equivalent: one left-outer
  * join of the incoming batch against the target table on the natural
  * key, per-field `coalesce(incoming, existing, default)`, and
  * deterministic sequential ID assignment for unmatched rows.
  *
  * Scale notes (100 TB): the join shuffles both sides by the natural key
  * (or broadcasts the incoming batch when it is small — pass
  * `broadcastIncoming = true`); ID assignment uses a range-partitioned
  * sort + `zipWithIndex` rather than a single-partition
  * `row_number()` window, so no stage ever funnels through one task.
  */
object Upsert {

  /** Deterministic sequential IDs `startAt, startAt+1, ...` in
    * `orderCols` order, WITHOUT a single-partition window:
    * `orderBy` is a range-partitioned sort and `zipWithIndex` adds
    * per-partition offsets — every stage stays distributed. */
  def withSequentialIds(df: DataFrame, idCol: String, startAt: Long,
                        orderCols: Seq[String]): DataFrame = {
    val sorted = df.orderBy(orderCols.map(c => q(c).asc): _*)
    val schema = StructType(
      StructField(idCol, LongType, nullable = false) +: sorted.schema.fields)
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq((startAt + i) +: r.toSeq)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Enrich `incoming` with the upsert-merged field values and resolved
    * IDs (the K8/K11 "row mutation" — `WordPressPostLoader.php:104-106`
    * adds `post.ID` for downstream loaders).
    *
    * - matched rows: `idCol` from target; fields `coalesce(in, existing, default)`
    * - new rows: `idCol` = max(target id) + 1, 2, ... assigned in
    *   `keys` order; fields `coalesce(in, default)`
    *
    * Output columns: `idCol`, keys, then the union of incoming/target/
    * default field names.
    */
  def upsert(incoming: DataFrame, target: DataFrame, keys: Seq[String],
             idCol: String, defaults: Map[String, Column] = Map.empty,
             broadcastIncoming: Boolean = false,
             keepLastBy: Option[Column] = None): DataFrame = {
    // Reference parity for duplicate natural keys within ONE batch: rows
    // are processed sequentially there, so a later row UPDATES the row
    // an earlier one inserted — i.e. last-wins per key. Spark frames
    // are unordered, so the caller supplies the ordering column
    // (ingest sequence, timestamp); with `keepLastBy` set we keep the
    // max-ordered row per key before the join.
    val dedupedIncoming = keepLastBy match {
      case None => incoming
      case Some(ord) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(keys.map(q): _*).orderBy(ord.desc)
        incoming.withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1).drop("__rn")
    }
    upsertDeduped(dedupedIncoming, target, keys, idCol, defaults, broadcastIncoming)
  }

  private def upsertDeduped(incoming: DataFrame, target: DataFrame, keys: Seq[String],
                            idCol: String, defaults: Map[String, Column],
                            broadcastIncoming: Boolean): DataFrame = {
    val tPrefix = "__t__"
    val tFields = target.columns.filterNot(c => keys.contains(c))
    val tRenamed = target.select(
      (keys.map(q) ++ tFields.map(c => q(c).as(tPrefix + c))).toIndexedSeq: _*)
    val inc = if (broadcastIncoming) broadcast(incoming) else incoming
    val joined = inc.join(tRenamed, keys.toIndexedSeq, "left_outer")

    val incFields = incoming.columns.filterNot(c => keys.contains(c) || c == idCol)
    val targetOnly = tFields.filterNot(c => incFields.contains(c) || c == idCol)
    val defaultOnly = defaults.keys.toSeq
      .filterNot(c => incFields.contains(c) || tFields.contains(c) || keys.contains(c) || c == idCol)
      .sorted

    def merged(c: String): Column = {
      val parts = Seq(
        if (incFields.contains(c)) Some(q(c)) else None,
        if (tFields.contains(c)) Some(q(tPrefix + c)) else None,
        defaults.get(c)
      ).flatten
      coalesce(parts: _*).as(c)
    }
    val fieldCols = (incFields ++ targetOnly ++ defaultOnly).map(merged)
    // K7 honors an ID already present on the incoming row
    // (`WPPostsLoader.php:119` update-by-ID path) before the natural-key
    // match result.
    val existingId = coalesce(
      (if (incoming.columns.contains(idCol)) Seq(q(idCol)) else Nil) ++
      (if (tFields.contains(idCol)) Seq(q(tPrefix + idCol)) else Nil) :+
      lit(null).cast(LongType): _*)
    val base = joined.select(
      (Seq(existingId.as(idCol)) ++ keys.map(q) ++ fieldCols).toIndexedSeq: _*)

    val matchedRows = base.where(q(idCol).isNotNull)
    val newRows = base.where(q(idCol).isNull).drop(idCol)
    // max(existing id) stays in-plan as a broadcast scalar — no driver
    // collect; zipWithIndex assigns 0..n-1 and the max is added after.
    // The max ranges over BOTH target ids and any id carried on an
    // incoming row (the honored update-by-ID path): an incoming id
    // absent from the target and > max(target id) must not collide with
    // a freshly assigned one.
    val idPool =
      if (incoming.columns.contains(idCol))
        target.select(q(idCol).cast(LongType).as("__i"))
          .unionAll(incoming.select(q(idCol).cast(LongType).as("__i")))
      else target.select(q(idCol).cast(LongType).as("__i"))
    val maxDf = idPool.agg(coalesce(max(col("__i")), lit(0L)).as("__maxid"))
    val seqd = withSequentialIds(newRows, "__seq", 1L, keys)
    val assigned = seqd.crossJoin(broadcast(maxDf))
      .withColumn(idCol, col("__maxid") + col("__seq"))
      .drop("__seq", "__maxid")
    val outCols = base.columns
    matchedRows.select(outCols.map(q).toIndexedSeq: _*)
      .unionByName(assigned.select(outCols.map(q).toIndexedSeq: _*))
  }

  /** K8 existence probe (`WordPressPostLoader.php:172-194` `post_exists`
    * by `(post_name, post_type)`): marks each incoming row with whether a
    * target row matches the natural key. */
  def markExists(incoming: DataFrame, target: DataFrame, keys: Seq[String],
                 flag: String = "exists"): DataFrame = {
    val probe = target.select(keys.map(q).toIndexedSeq: _*).dropDuplicates(keys)
      .withColumn(flag, lit(true))
    incoming.join(probe, keys.toIndexedSeq, "left_outer")
      .withColumn(flag, coalesce(col(flag), lit(false)))
  }

  /** Apply an upsert to the target table itself: unmatched target rows
    * pass through, matched/new rows come from [[upsert]]. This is the
    * full MERGE result for rewriting an entity table. */
  def applyUpsert(incoming: DataFrame, target: DataFrame, keys: Seq[String],
                  idCol: String, defaults: Map[String, Column] = Map.empty): DataFrame = {
    val up = upsert(incoming, target, keys, idCol, defaults)
    val untouched = target.join(
      incoming.select(keys.map(q).toIndexedSeq: _*).dropDuplicates(keys),
      keys.toIndexedSeq, "left_anti")
    untouched.unionByName(up, allowMissingColumns = true)
  }
}
