package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Variable-length EXACT substring dedup — "any shared token run of
  * length ≥ L" granularity (Lee et al., "Deduplicating Training Data
  * Makes Language Models Better", arXiv:2107.06499, the ExactSubstr
  * construction; they use L = 50 BPE tokens — here L counts the
  * dedup-family's whitespace tokens).
  *
  * The key reduction: the set of token positions covered by SOME
  * duplicated run of length ≥ L equals the union cover of duplicated
  * L-grams — a run [p, p+m) with m ≥ L contains, for every position
  * it covers, an L-window inside the run that starts at most L−1
  * before that position; conversely every duplicated L-gram IS a
  * shared run of length L. So "suffix-array group detection at ≥ L"
  * ≡ grouping suffixes by their length-L prefix — an L-gram census.
  * This is NOT [[Dedup.duplicateSpans]]' fixed-k census semantics:
  * there, admission is k-gram frequency with k ≪ L (a popular 8-gram
  * inside otherwise-unique text over-triggers, and an L−1-token shared
  * run is found because its 8-grams repeat); here a shared run
  * shorter than L is invisible BY CONTRACT (no duplicated L-window
  * fits inside it, at ANY alignment) and nothing shorter than L can
  * trigger, however frequent.
  *
  * Why this scales where naive L-gram census wouldn't: materializing
  * L-token gram STRINGS costs O(n·L) bytes hashed and shuffled (L=50
  * ⇒ 50× the corpus). [[graft.plans.GramHashExpression]] computes all
  * L-window keys as Rabin-Karp ROLLING hashes in O(n) per doc,
  * map-only; the census shuffles 16-byte key pairs (two independent
  * seeds — the [[Dedup.stripDuplicateSpans]] collision-horizon
  * argument: a single 64-bit key first-collides at ~5·10⁹ distinct
  * grams; the pair pushes that past 10¹⁸). Census admission counts
  * TOTAL occurrences (`minOcc`, default 2) — a run repeated within
  * ONE document is duplicated text too (the Lee et al. convention),
  * unlike the ≥-minDocs-distinct-documents contract of the
  * line/k-gram operators. */
object ExactSubstr {

  private def gramHashes(textCol: Column, L: Int, seed: Long): Column =
    call_function("graft_gram_hashes", textCol, lit(L), lit(seed))

  /** One row per L-window start: `(doc_id, pos, __h1, __h2)`.
    * Map-only (per-row rolling hash + posexplode); docs shorter than
    * L tokens contribute nothing. */
  private def gramKeys(df: DataFrame, idCol: String, textCol: String,
                       L: Int): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    df.select(col(idCol).as("doc_id"),
        posexplode(arrays_zip(
          gramHashes(col(textCol), L, 1L).as("h1"),
          gramHashes(col(textCol), L, 2L).as("h2"))).as(Seq("pos", "__g")))
      .select(col("doc_id"), col("pos"),
        col("__g.h1").as("__h1"), col("__g.h2").as("__h2"))
  }

  /** Starts of duplicated L-windows: `(doc_id, pos)` where the window
    * at `pos` occurs ≥ `minOcc` times corpus-wide (any doc, any
    * alignment, self-repeats included). One aggregation on the 16-byte
    * pair key + one semi-join back — no pair expansion. */
  private def dupStarts(df: DataFrame, idCol: String, textCol: String,
                        L: Int, minOcc: Int): DataFrame = {
    val g = gramKeys(df, idCol, textCol, L)
    val dup = g.groupBy(col("__h1"), col("__h2"))
      .agg(count(lit(1)).as("__n"))
      .where(col("__n") >= minOcc)
      .select(col("__h1"), col("__h2"))
    g.join(dup, Seq("__h1", "__h2"), "left_semi")
      .select(col("doc_id"), col("pos"))
  }

  /** Census of maximal duplicated runs: per document, the maximal
    * intervals of token positions covered by duplicated-run content —
    * `(doc_id, run_start, run_end, n_tokens)`, positions inclusive,
    * `n_tokens = run_end − run_start + 1 ≥ L`. Overlapping or
    * touching covered windows merge (the union cover), so one row is
    * one maximal duplicated region, whatever mix of partners produced
    * it.
    *
    * Scale shape: the interval merge runs on the SPARSE duplicated-
    * start frame only (≤ one row per duplicated window start, nothing
    * corpus-sized): covered windows all have length L, so after the
    * doc-key sort a new run begins exactly when a start exceeds
    * `prev_start + L` (gap in the union cover) — one lag + one
    * running-sum window over the same partitioning, then one
    * aggregation per (doc, run). */
  def duplicateRuns(df: DataFrame, idCol: String, textCol: String,
                    L: Int = 50, minOcc: Int = 2): DataFrame = {
    require(L >= 2, s"duplicateRuns: L must be >= 2, got $L")
    require(minOcc >= 2, s"duplicateRuns: minOcc must be >= 2, got $minOcc")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    dupStarts(df, idCol, textCol, L, minOcc)
      .withColumn("__new",
        when(lag(col("pos"), 1).over(w).isNull ||
          col("pos") > lag(col("pos"), 1).over(w) + L, 1).otherwise(0))
      .withColumn("__run", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("__run"))
      .agg(min(col("pos")).as("run_start"),
        (max(col("pos")) + L - 1).as("run_end"))
      .select(col("doc_id"), col("run_start"), col("run_end"),
        (col("run_end") - col("run_start") + 1).as("n_tokens"))
  }

  /** Rewrite each document with duplicated-run content removed: every
    * token inside some shared run ≥ L tokens is dropped (ALL copies —
    * the released ExactSubstr tooling's convention), survivors keep
    * their original form and order re-joined by single spaces, and
    * every document keeps its row (a fully-duplicated one becomes "").
    * Documents shorter than L tokens are never modified.
    *
    * Scale shape: the covered-position set explodes from the MERGED
    * runs (exactly one row per covered token — exploding per-window
    * starts would inflate overlapping covers L×), left-joins the
    * corpus token frame on (doc, pos), and reassembly is the one
    * corpus aggregation on the doc key — the
    * [[Dedup.stripDuplicateSpans]] shape with the window-cover mark
    * replaced by the run join. */
  def stripDuplicateRuns(df: DataFrame, idCol: String, textCol: String,
                         L: Int = 50, minOcc: Int = 2): DataFrame = {
    val covered = duplicateRuns(df, idCol, textCol, L, minOcc)
      .select(col("doc_id"),
        explode(sequence(col("run_start"), col("run_end"))).as("pos"))
      .withColumn("__c", lit(1))
    df.select(col(idCol).as("doc_id"),
        posexplode(split(trim(coalesce(col(textCol), lit(""))), "\\s+"))
          .as(Seq("pos", "tok")))
      .join(covered, Seq("doc_id", "pos"), "left")
      .groupBy(col("doc_id"))
      .agg(array_join(transform(
        filter(sort_array(collect_list(
            struct(col("pos"), col("tok"), col("__c")))),
          _.getField("__c").isNull),
        _.getField("tok")), " ").as("text"))
      .select(col("doc_id"), col("text"))
  }
}
