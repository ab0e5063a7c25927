package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, attach the single most
  * recent right row with the same key whose timestamp is at-or-before
  * (or strictly before) the left row's timestamp — the classic
  * point-in-time lookup (price as of trade time, last view before a
  * click). The reference engine has no such operator (its joins are
  * equi-joins via lookups, SURVEY §2.6); this is part of the
  * forward-looking analytics surface, alongside the range join in
  * [[graft.streaming.EventsStream.attributeClicks]].
  *
  * Null keys: window partitioning groups null keys together (an
  * equi-join would drop them) — filter null-keyed rows first if the
  * input may contain them.
  *
  * Spark-first shape: NOT a range join. A range join materializes every
  * (left, candidate) pair and then aggregates the max — at 100 TB a
  * dense key can explode quadratically. Instead both sides are unioned
  * and sorted once per key (tagged so right rows sort before left rows
  * at equal timestamps — after them in strict mode), and the matched
  * row is a running `last(non-null)` carry-forward over that order:
  * ONE hash shuffle on the key + an in-partition sort, the same cost
  * as one side of a sort-merge join, with zero pair explosion. Ties
  * (several right rows sharing the match timestamp) break
  * deterministically to the greatest `tieCol`.
  */
object AsOf {

  /** @param left        probe side; must contain `keys` and `tsCol`
    * @param right       build side; must contain `keys`, `tsCol` and
    *                    `rightPayload` — rename payload columns before
    *                    the call so they don't clash with left columns
    * @param keys        equi-join key column names (both sides)
    * @param tsCol       event-time column name (both sides)
    * @param rightPayload right columns carried onto matched left rows
    *                    (null when no match — left-join semantics)
    * @param tieCol      column in `rightPayload` that uniquely orders
    *                    right rows within (keys, tsCol); the greatest
    *                    value wins the tie
    * @param strict      true = match strictly-before (right.ts < left.ts);
    *                    false = at-or-before (right.ts <= left.ts)
    * @param tolerance   optional max lookback interval (e.g.
    *                    `expr("INTERVAL 30 MINUTES")`): matches older
    *                    than `left.ts - tolerance` are discarded. The
    *                    streaming analog of this bound is what keeps
    *                    as-of state finite; in batch it bounds how stale
    *                    a carried match may be.
    * @param matchedTsCol output column name for the matched right
    *                    row's timestamp
    */
  def asOfJoin(left: DataFrame, right: DataFrame,
               keys: Seq[String], tsCol: String,
               rightPayload: Seq[String], tieCol: String,
               strict: Boolean = false,
               tolerance: Option[Column] = None,
               matchedTsCol: String = "matched_ts"): DataFrame = {
    require(rightPayload.contains(tieCol),
      s"asOfJoin: tieCol '$tieCol' must be one of rightPayload")
    val clashes = (rightPayload :+ matchedTsCol).filter(left.columns.contains)
    require(clashes.isEmpty,
      s"asOfJoin: output columns ${clashes.mkString(", ")} already exist on " +
        "the left side — rename the right payload (or matchedTsCol) first")
    val side = "__graft_asof_side"
    val rs   = "__graft_asof_r"
    // right rows must be visible to an equal-timestamp left row iff
    // non-strict — encode visibility in the sort order of the side tag
    val (rightTag, leftTag) = if (strict) (1, 0) else (0, 1)
    // right rows with a null timestamp would sort first (nulls-first
    // asc) and be carried as a bogus "match" with null matched_ts for
    // early left rows — they can never be a legitimate as-of match, so
    // drop them before the union
    val r = right.where(col(tsCol).isNotNull).select(
      keys.map(col) ++ Seq(
        col(tsCol),
        struct(col(tsCol).as("__ts") +: rightPayload.map(col): _*).as(rs),
        lit(rightTag).as(side)): _*)
    val l = left.withColumn(side, lit(leftTag))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(side).asc, col(rs).getField("__ts").asc,
        col(rs).getField(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn(rs, last(col(rs), ignoreNulls = true).over(w))
      .where(col(side) === lit(leftTag))
    val bounded = tolerance match {
      case Some(tol) => carried.withColumn(rs,
        when(col(rs).getField("__ts") >= col(tsCol) - tol, col(rs)))
      case None => carried
    }
    bounded.select(
      left.columns.map(col) ++
        (rightPayload.map(p => col(rs).getField(p).as(p)) :+
          col(rs).getField("__ts").as(matchedTsCol)): _*)
  }
}
