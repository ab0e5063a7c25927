package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the primitive behind incremental
  * training-data pipelines: given yesterday's corpus and today's,
  * emit only what changed (added / removed / changed by content hash)
  * so every downstream stage (dedup, decontamination, re-embedding,
  * shard rebuild) processes the delta instead of the full 100 TB.
  * Complements the incremental dedup variants (`Dedup.exactDedupAgainst`,
  * `Dedup.minhashNearDupsAgainst`), which answer "is the new batch a
  * dup of the corpus"; this answers "what IS the new batch".
  *
  * Scale shape: one hash projection per side (map-only), then a single
  * full-outer sort-merge join on the id — the minimum possible work
  * for a diff. With both snapshots bucketed on the id
  * (`Sinks.writeBucketed`) the join reads co-located buckets and the
  * exchanges disappear entirely. Only non-`unchanged` rows flow out,
  * so the output is delta-sized, not corpus-sized. Presence is
  * tracked with explicit flags, NOT hash nullness — a document whose
  * text is NULL still exists on its side and must not be misread as
  * added/removed.
  */
object Snapshot {

  /** Diff two snapshots by `idCol` identity and `textCol` content
    * hash. Output: (id, status ∈ added|removed|changed, old_md5,
    * new_md5) — `unchanged` rows are filtered out (the common case at
    * scale; keep the output delta-sized). Rows with NULL text on both
    * sides compare equal (null-safe `<=>`), matching the exact-dedup
    * convention that null contents form one content group. */
  def corpusDiff(prev: DataFrame, cur: DataFrame,
                 idCol: String, textCol: String): DataFrame = {
    val p = prev.select(col(idCol).as("id"),
      md5(col(textCol)).as("old_md5"), lit(true).as("__in_old"))
    val c = cur.select(col(idCol).as("id"),
      md5(col(textCol)).as("new_md5"), lit(true).as("__in_new"))
    p.join(c, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(!(col("old_md5") <=> col("new_md5")), lit("changed"))
          .otherwise(lit("unchanged")))
      .where(col("status") =!= "unchanged")
      .select(col("id"), col("status"), col("old_md5"), col("new_md5"))
  }

  /** One-row-per-status census of a diff — the monitoring signal an
    * incremental pipeline alerts on (e.g. "removed spiked to 40%").
    * Bounded output (≤3 rows), one map-side-combinable aggregation. */
  def diffSummary(diff: DataFrame): DataFrame =
    diff.groupBy(col("status")).agg(count(lit(1)).as("n"))
}
