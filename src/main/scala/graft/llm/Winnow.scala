package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003): hash every k-word gram, slide a window of `w` consecutive
  * gram hashes, and keep each window's minimal hash (rightmost
  * occurrence on ties). The selected set is position-robust — any
  * shared run of at least `w + k - 1` words between two documents is
  * guaranteed to contribute at least one IDENTICAL fingerprint to both
  * — which is what makes it the classic copy-detection primitive
  * (MOSS). Complements MinHash (whole-doc resemblance) with
  * local/partial-overlap detection.
  *
  * Reference behavior modeled: the published winnowing scheme; no
  * reference-repo counterpart — part of the training-data extension
  * surface.
  *
  * Scale shape (100 TB): fingerprint selection is ENTIRELY per-row
  * array arithmetic — a map-only pass, no explode-then-window, no
  * shuffle. The near-dup pair pass shuffles id-only rows on the
  * 32-bit fingerprint key with a hot-fingerprint cap (boilerplate
  * fingerprints are dropped, exactly like the LSH bucket cap in
  * [[Dedup]]), so pair expansion is bounded by `maxBucket`².
  *
  * Hashes are the integer value of the first 8 md5 hex chars of
  * (salt ++ gram) — the repo's standing engine-portable hash — and the
  * rightmost-min tie rule is encoded arithmetically:
  * `enc = hash * 2^31 + (2^31 - 1 - pos)`, so `array_min` picks the
  * smallest hash and, among equal hashes, the LARGEST position. Fits
  * a signed 64-bit exactly (max value = 2^63 - 1).
  */
object Winnow {

  private val POS_BASE = 2147483648L // 2^31

  /** Encoded gram hashes for a bound words array: one long per k-gram,
    * `hash * 2^31 + (2^31 - 1 - pos)`. Documents shorter than k words
    * contribute their single joined form (same convention as
    * [[Dedup.shinglesFromWords]]). */
  private def encodedGrams(wv: Column, k: Int, salt: String): Column = {
    val grams = when(size(wv) >= k,
      transform(sequence(lit(0), size(wv) - k),
        i => array_join(slice(wv, i + 1, lit(k)), " ")))
      .otherwise(array(array_join(wv, " ")))
    transform(grams, (g, i) =>
      // md5 LET-BOUND inside the lambda: rankDigest references its
      // argument 8 times, and only a binding stops 8 hash evaluations
      Dedup.letBound(md5(concat(lit(salt), g))) { h =>
        Packing.rankDigest(h) * POS_BASE + (lit(POS_BASE - 1) - i)
      })
  }

  /** The winnowed fingerprint set of a text column as an array of
    * encoded longs — decode with `/ 2^31` (hash) and
    * `2^31 - 1 - (x % 2^31)` (gram position). Pure per-row expression:
    * words, grams, and encoded hashes are each let-bound so nothing
    * re-evaluates per window. */
  def fingerprintArray(textCol: Column, k: Int = 4, w: Int = 4,
                       salt: String = "wfp"): Column =
    Dedup.letBound(filter(split(Dedup.normalizeText(textCol), " "),
        x => x =!= "")) { wv =>
      Dedup.letBound(encodedGrams(wv, k, salt)) { ev =>
        when(size(ev) >= w,
          array_distinct(transform(sequence(lit(0), size(ev) - w),
            j => array_min(slice(ev, j + 1, lit(w))))))
          .otherwise(array(array_min(ev)))
      }
    }

  /** [[fingerprintArray]] as the fused NATIVE expression
    * (`graft_winnow_fps`, [[graft.plans.WinnowFpExpression]]): one
    * codegen'd pass with an O(n) monotonic-deque window minimum —
    * bit-identical output (spec-asserted). */
  def fingerprintArrayNative(textCol: Column, k: Int = 4, w: Int = 4,
                             salt: String = "wfp"): Column =
    call_function("graft_winnow_fps", textCol, lit(k), lit(w), lit(salt))

  /** Per-document fingerprints, one row per selected gram:
    * `(doc_id, pos, fp_hash)`. Map-only (per-row native selection +
    * explode). */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 4, w: Int = 4, salt: String = "wfp"): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    df.select(col(idCol).as("doc_id"),
        explode(fingerprintArrayNative(col(textCol), k, w, salt)).as("__enc"))
      .select(col("doc_id"),
        (lit(POS_BASE - 1) - pmod(col("__enc"), lit(POS_BASE))).as("pos"),
        // shiftright, NOT double division: enc/2^31 as a double rounds
        // the pos-0 fraction (1 - 4.6e-10) up to the next hash
        shiftright(col("__enc"), 31).as("fp_hash"))
  }

  /** Near-duplicate pairs by shared winnowed fingerprints: documents
    * sharing at least `minShared` distinct fingerprint hashes, after
    * dropping fingerprints present in more than `maxBucket` documents
    * (boilerplate guard — identical role to the LSH bucket cap).
    * Output `(doc_a, doc_b, n_shared)`, doc_a < doc_b.
    *
    * Scale shape: distinct (doc, hash) pairs shuffle once on the hash
    * key carrying ids only; the self-join fans out at most
    * maxBucket²/2 pairs per fingerprint; the pair count is one more
    * bounded aggregation. No all-pairs comparison anywhere. */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 4, w: Int = 4, minShared: Int = 5,
                   maxBucket: Int = 16, salt: String = "wfp"): DataFrame = {
    // cache the (id, hash) frame: the count filter and BOTH sides of
    // the self-join reference it — without the cache each reference
    // re-runs the full fingerprint scan. Fixed-width 16-byte rows, and
    // released as soon as the pair result is materialized (the repo's
    // cache-then-localCheckpoint discipline, Dedup.minhashNearDups).
    val fps = fingerprints(df, idCol, textCol, k, w, salt)
      .select(col("doc_id"), col("fp_hash")).distinct().cache()
    val out = pairsFrom(fps, minShared, maxBucket).localCheckpoint(true)
    fps.unpersist()
    out
  }

  /** The pair pass over a materialized distinct (doc_id, fp_hash)
    * frame — shared by [[nearDupPairs]] and [[nearDupSpans]]. */
  private def pairsFrom(fps: DataFrame, minShared: Int,
                        maxBucket: Int): DataFrame = {
    val rare = fps.join(
      fps.groupBy(col("fp_hash")).agg(count(lit(1)).as("__n"))
        .where(col("__n") <= maxBucket)
        .select(col("fp_hash")),
      Seq("fp_hash"))
    rare.as("a").join(rare.as("b"),
        col("a.fp_hash") === col("b.fp_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** [[nearDupPairs]] + [[overlapSpans]] fused over ONE fingerprint
    * extraction: the per-row winnowing selection (the md5-heavy map
    * pass) is the dominant cost, and running the two stages separately
    * pays it twice — the composed audit query measured ~2× this form.
    * Output is exactly [[overlapSpans]]' schema. */
  def nearDupSpans(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 4, w: Int = 4, minShared: Int = 5,
                   maxBucket: Int = 16, salt: String = "wfp"): DataFrame = {
    val fp = fingerprints(df, idCol, textCol, k, w, salt).cache()
    val pairs = pairsFrom(fp.select(col("doc_id"), col("fp_hash")).distinct(),
      minShared, maxBucket)
    val env = fp.groupBy(col("doc_id"), col("fp_hash"))
      .agg(min(col("pos")).as("p_min"), max(col("pos")).as("p_max"))
    val out = spansFrom(env, pairs).localCheckpoint(true)
    fp.unpersist()
    out
  }

  /** Localize the shared content behind near-dup pairs: for each
    * `(doc_a, doc_b)` pair, join the two documents' fingerprints on
    * hash and report the matched gram-position envelope in EACH doc —
    * the "where is the copied region" answer a dedup auditor needs
    * after [[nearDupPairs]] says "these overlap". Output:
    * `(doc_a, doc_b, n_matched, a_min_pos, a_max_pos, b_min_pos,
    * b_max_pos)`.
    *
    * Scale shape: fingerprints are first reduced per (doc, hash) to a
    * min/max-position envelope (one bounded aggregation), then
    * restricted to documents that actually appear in `pairs` via
    * broadcast-friendly semi-joins — the corpus-sized fingerprint
    * frame never joins itself; only pair-participating docs' envelopes
    * reach the hash join. */
  def overlapSpans(df: DataFrame, idCol: String, textCol: String,
                   pairs: DataFrame, k: Int = 4, w: Int = 4,
                   salt: String = "wfp"): DataFrame = {
    val env = fingerprints(df, idCol, textCol, k, w, salt)
      .groupBy(col("doc_id"), col("fp_hash"))
      .agg(min(col("pos")).as("p_min"), max(col("pos")).as("p_max"))
    spansFrom(env, pairs)
  }

  /** The span-envelope join over a per-(doc, hash) envelope frame —
    * shared by [[overlapSpans]] and [[nearDupSpans]]. */
  private def spansFrom(env: DataFrame, pairs: DataFrame): DataFrame = {
    val envA = env.join(pairs.select(col("doc_a").as("doc_id")).distinct(),
      Seq("doc_id"), "left_semi")
    val envB = env.join(pairs.select(col("doc_b").as("doc_id")).distinct(),
      Seq("doc_id"), "left_semi")
    pairs.select(col("doc_a"), col("doc_b"))
      .join(envA.select(col("doc_id").as("doc_a"), col("fp_hash"),
        col("p_min").as("a_lo"), col("p_max").as("a_hi")), Seq("doc_a"))
      .join(envB.select(col("doc_id").as("doc_b"), col("fp_hash"),
        col("p_min").as("b_lo"), col("p_max").as("b_hi")),
        Seq("doc_b", "fp_hash"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_matched"),
        min(col("a_lo")).as("a_min_pos"), max(col("a_hi")).as("a_max_pos"),
        min(col("b_lo")).as("b_min_pos"), max(col("b_hi")).as("b_max_pos"))
  }
}
