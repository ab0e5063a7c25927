package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-OBJECTIVE example construction — turning curated documents
  * into the (input, target) pairs a denoising pretraining objective
  * consumes (T5 span corruption, Raffel et al. 2020 §3.1.4; the UL2
  * R/X-denoiser family is the same construction at other
  * density/length settings).
  *
  * The "randomness" is the repo's deterministic md5-bucket convention
  * (the [[Mixing.mixStrata]] machinery): a span group is masked iff
  * `md5(salt || id || ':' || group)`'s first 8 hex chars fall below
  * the density threshold — so the corruption is a pure function of
  * (doc id, salt), reproducible across runs/engines and exactly
  * SQL-replayable. Deviation from the paper stated honestly: T5 draws
  * span LENGTHS from a mean-3 distribution; here spans are fixed
  * `spanLen`-token groups (aligned, last group ragged), which keeps
  * the expected corruption density exact and the construction
  * map-only — no per-row RNG state, no shuffle.
  */
object Objectives {

  /** T5-style span corruption: returns
    * (idCol, n_tokens, n_masked_spans, input_text, target_text) where
    * `input_text` is the document with each masked span replaced by
    * its `<extra_id_K>` sentinel (K dense from 0 in document order)
    * and `target_text` is the sentinels followed by the spans they
    * mask — the exact seq2seq pair the objective trains on. Map-only:
    * one codegen'd projection over the token array, nothing shuffles.
    *
    * Whitespace tokens; empty/blank docs produce empty input and
    * target (kept, not dropped — filtering is upstream's job). */
  def spanCorrupt(df: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", spanLen: Int = 3,
                  density: Double = 0.15,
                  salt: String = "graft"): DataFrame = {
    require(spanLen > 0, s"spanCorrupt: spanLen must be positive, got $spanLen")
    require(density >= 0 && density <= 1,
      s"spanCorrupt: density must be in [0,1], got $density")
    val thr = Mixing.hexThreshold(density)
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => t =!= "")
    val nGrp = ceil(size(col("__toks")).cast("double") / spanLen).cast("int")
    def grpMasked(g: Column): Column =
      substring(md5(concat(lit(salt), col(idCol).cast("string"),
        lit(":"), g.cast("string"))), 1, 8) < lit(thr)
    df.withColumn("__toks", toks)
      .withColumn("__masked",
        when(size(col("__toks")) === 0, array().cast("array<int>"))
          .otherwise(filter(sequence(lit(0), nGrp - 1), g => grpMasked(g))))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(col("__masked")).cast("long").as("n_masked_spans"),
        array_join(filter(transform(col("__toks"), (t, i) => {
          val g = (i / spanLen).cast("int")
          val pos = array_position(col("__masked"), g)
          when(pos.isNull || pos === 0, t) // unmasked group: keep token
            .when(i % spanLen === 0, // masked group start: sentinel
              concat(lit("<extra_id_"), (pos - 1).cast("string"), lit(">")))
            .otherwise(lit(null)) // masked continuation: dropped
        }), t => t.isNotNull), " ").as("input_text"),
        array_join(transform(col("__masked"), (g, k) =>
          concat(lit("<extra_id_"), k.cast("string"), lit("> "),
            array_join(slice(col("__toks"), g * spanLen + 1, lit(spanLen)),
              " "))),
          " ").as("target_text"))
  }
}
