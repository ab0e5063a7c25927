package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P8 / §7.4-2 — per-row continue-on-error as data, not exceptions.
  *
  * The reference catches loader exceptions per row, warns, and
  * continues (`SynchronousPipelineLoader.php:40-64`,
  * `WordPressPostLoader.php:97-101`). Exceptions-as-control-flow
  * doesn't survive executors; instead validity predicates become an
  * `errors` column, invalid rows route to a rejects output, and counts
  * report like `ProcessCommand` stats.
  */
object Validation {

  /** Add `errors` (array of failed rule names, empty when valid) and
    * `is_valid`. Rules are (name, predicate-that-must-hold). */
  def validate(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val errs = array(rules.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name)).otherwise(lit(null).cast("string"))
    }: _*)
    df.withColumn("errors", filter(errs, e => e.isNotNull))
      .withColumn("is_valid", size(col("errors")) === 0)
  }

  /** Split a validated frame into (valid, rejects). */
  def partitionValid(validated: DataFrame): (DataFrame, DataFrame) =
    (validated.where(col("is_valid")).drop("errors", "is_valid"),
      validated.where(!col("is_valid")))

  /** ProcessCommand-style stats: total / valid / rejected (+ per-rule
    * counts). One aggregation pass. */
  def stats(validated: DataFrame, ruleNames: Seq[String]): DataFrame = {
    val perRule = ruleNames.map(n =>
      sum(when(array_contains(col("errors"), n), 1L).otherwise(0L)).as(s"n_$n"))
    val aggs = Seq(
      sum(when(col("is_valid"), 1L).otherwise(0L)).as("valid"),
      sum(when(col("is_valid"), 0L).otherwise(1L)).as("rejected")) ++ perRule
    validated.agg(count(lit(1)).as("total"), aggs: _*)
  }
}
