package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality census a pipeline runs before
  * and after a migration (the reference's `analyze` mode counts rows
  * per job, `ProcessCommand.php:458-469`; this is the per-column
  * extension): row count, null count, distinct count, min/max per
  * column, one output row per column.
  *
  * Scale shape: ONE scan. All per-column aggregates run in a single
  * `agg` (Catalyst plans the multi-distinct via Expand — the scan is
  * read once, rows are replicated per distinct aggregate in-memory,
  * combinable partials throughout). For corpus-scale profiling where
  * exact distinct counts don't matter, `approx = true` swaps
  * `count_distinct` for HyperLogLog++ `approx_count_distinct`, which
  * removes the Expand entirely — one plain aggregation pass.
  */
object Profile {

  /** @param cols columns to profile (min/max are rendered as strings in
    *             each column's native ordering — cast floating-point
    *             columns to DECIMAL first if the profile feeds a
    *             cross-engine comparison, so the string form is stable)
    * @param approx use approx_count_distinct (no Expand — the 100 TB
    *             path; n_distinct becomes an HLL++ estimate) */
  def profile(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: no such columns: ${missing.mkString(", ")}")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__${c}__nulls"),
      (if (approx) approx_count_distinct(col(c)) else count_distinct(col(c)))
        .as(s"__${c}__nd"),
      min(col(c)).cast("string").as(s"__${c}__min"),
      max(col(c)).cast("string").as(s"__${c}__max"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
          lit(c).as("col_name"),
          col("__n").as("n_rows"),
          col(s"__${c}__nulls").as("n_nulls"),
          col(s"__${c}__nd").as("n_distinct"),
          col(s"__${c}__min").as("min_val"),
          col(s"__${c}__max").as("max_val"))): _*)).as("p"))
      .select(col("p.*"))
  }

  /** Equi-width histogram of a numeric column over [lo, hi): the
    * distribution view `profile`'s min/max can't give (skew, modes,
    * heavy tails — the shape checks a curation threshold is chosen
    * from). `width_bucket` semantics: bucket 0 collects values below
    * `lo`, bucket `nBuckets + 1` values at/above `hi`, so no VALUE is
    * silently dropped; nulls and NaN carry no position on the line and
    * are excluded (width_bucket would emit a contract-less null bucket
    * for NaN otherwise); empty buckets are omitted (at 100 TB a dense
    * bucket list is the caller's join-with-`sequence` problem, not a
    * row-explosion here). One map-only bucket assignment + ONE
    * aggregation on the (bounded) bucket key. */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
                nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"histogram: nBuckets must be >= 1, got $nBuckets")
    require(lo < hi, s"histogram: need lo < hi, got [$lo, $hi)")
    df.where(col(valueCol).isNotNull &&
        !isnan(col(valueCol).cast("double")))
      .select(width_bucket(col(valueCol).cast("double"), lit(lo), lit(hi),
        lit(nBuckets)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
  }
}
