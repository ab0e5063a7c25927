package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-OBJECTIVE example construction — turning curated documents
  * into the (input, target) pairs a denoising pretraining objective
  * consumes (T5 span corruption, Raffel et al. 2020 §3.1.4; the UL2
  * mixture-of-denoisers, Tay et al. 2022, is the same construction at
  * several density/length settings plus the prefix-LM split, with a
  * mode token telling the model which denoiser an example came from).
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

  private def wsToks(textCol: String): Column =
    filter(split(trim(col(textCol)), "\\s+"), t => t =!= "")

  /** Masked span-group indexes for one (spanLen, density) setting —
    * empty for an empty document (never `sequence(0, -1)`). */
  private def maskedGroups(id: Column, toksCol: Column, spanLen: Int,
                           density: Double, salt: String): Column = {
    val thr = Mixing.hexThreshold(density)
    val nGrp = ceil(size(toksCol).cast("double") / spanLen).cast("int")
    when(size(toksCol) === 0, array().cast("array<int>"))
      .otherwise(filter(sequence(lit(0), nGrp - 1), g =>
        substring(md5(concat(lit(salt), id.cast("string"),
          lit(":"), g.cast("string"))), 1, 8) < lit(thr)))
  }

  private def corruptInput(toksCol: Column, maskedCol: Column,
                           spanLen: Int): Column =
    array_join(filter(transform(toksCol, (t, i) => {
      val g = (i / spanLen).cast("int")
      val pos = array_position(maskedCol, g)
      when(pos.isNull || pos === 0, t) // unmasked group: keep token
        .when(i % spanLen === 0, // masked group start: sentinel
          concat(lit("<extra_id_"), (pos - 1).cast("string"), lit(">")))
        .otherwise(lit(null)) // masked continuation: dropped
    }), t => t.isNotNull), " ")

  private def corruptTarget(toksCol: Column, maskedCol: Column,
                            spanLen: Int): Column =
    array_join(transform(maskedCol, (g, k) =>
      concat(lit("<extra_id_"), k.cast("string"), lit("> "),
        array_join(slice(toksCol, g * spanLen + 1, lit(spanLen)), " "))),
      " ")

  /** Deterministic uniform split point over 1..n-1 (n for n < 2). */
  private def splitPoint(id: Column, toksCol: Column,
                         salt: String): Column = {
    val n = size(toksCol)
    val digest = conv(substring(md5(concat(lit(salt),
      id.cast("string"), lit(":split"))), 1, 8), 16, 10).cast("long")
    when(n >= 2, lit(1) + pmod(digest, (n - 1).cast("long")).cast("int"))
      .otherwise(n)
  }

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
    df.withColumn("__toks", wsToks(textCol))
      .withColumn("__masked",
        maskedGroups(col(idCol), col("__toks"), spanLen, density, salt))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(col("__masked")).cast("long").as("n_masked_spans"),
        corruptInput(col("__toks"), col("__masked"), spanLen)
          .as("input_text"),
        corruptTarget(col("__toks"), col("__masked"), spanLen)
          .as("target_text"))
  }

  /** Prefix-LM split (the UL2 S-denoiser / PaLM prefix objective):
    * each document splits at a DETERMINISTIC token boundary — uniform
    * over 1..n-1 via the md5 digest of (salt, id) — into
    * (input_text = the prefix, target_text = the continuation).
    * Documents with fewer than 2 tokens emit an empty target (the
    * whole text is the input). Map-only; the digest arithmetic is the
    * shard-rank convention, so the oracle replays the exact split
    * point. Returns (idCol, n_tokens, split_at, input_text,
    * target_text). */
  def prefixLmSplit(df: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text",
                    salt: String = "graft"): DataFrame = {
    val n = size(col("__toks"))
    df.withColumn("__toks", wsToks(textCol))
      .withColumn("__sp", splitPoint(col(idCol), col("__toks"), salt))
      .select(col(idCol), n.cast("long").as("n_tokens"),
        col("__sp").cast("long").as("split_at"),
        array_join(slice(col("__toks"), lit(1), col("__sp")), " ")
          .as("input_text"),
        array_join(slice(col("__toks"), col("__sp") + 1,
          greatest(n - col("__sp"), lit(0))), " ").as("target_text"))
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022 — the
    * code-model objective): a deterministic `rate` fraction of
    * documents is rewritten into the PSM layout
    * `<|fim_pre|> prefix <|fim_suf|> suffix <|fim_mid|> middle`
    * (SPM swaps the first two segments when `spm = true`); the rest
    * pass through verbatim — exactly the paper's 50/50 recipe at
    * rate 0.5. The two cut points are md5-digest uniform over token
    * boundaries 0..n (p1 ≤ p2 by sorting the draws, the paper's
    * construction), so the transform is a pure function of (id, salt)
    * and exactly SQL-replayable. Map-only, nothing shuffles.
    * Returns (idCol, fim, text). */
  def fimTransform(df: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", rate: Double = 0.5,
                   spm: Boolean = false,
                   salt: String = "graft"): DataFrame = {
    require(rate >= 0 && rate <= 1,
      s"fimTransform: rate must be in [0,1], got $rate")
    val id = col(idCol)
    val thr = Mixing.hexThreshold(rate)
    val selected =
      substring(md5(concat(lit(salt), id.cast("string"), lit(":fim"))),
        1, 8) < lit(thr)
    def draw(tag: String, n: Column): Column =
      pmod(conv(substring(md5(concat(lit(salt), id.cast("string"),
        lit(tag))), 1, 8), 16, 10).cast("long"), (n + 1).cast("long"))
        .cast("int")
    val toks = col("__toks")
    val n = size(toks)
    val d1 = draw(":fim1", n)
    val d2 = draw(":fim2", n)
    val p1 = least(d1, d2)
    val p2 = greatest(d1, d2)
    val pre = array_join(slice(toks, lit(1), p1), " ")
    val mid = array_join(slice(toks, p1 + 1, p2 - p1), " ")
    val suf = array_join(slice(toks, p2 + 1, greatest(n - p2, lit(0))), " ")
    val fimText =
      if (spm) concat(lit("<|fim_suf|> "), suf, lit(" <|fim_pre|> "), pre,
        lit(" <|fim_mid|> "), mid)
      else concat(lit("<|fim_pre|> "), pre, lit(" <|fim_suf|> "), suf,
        lit(" <|fim_mid|> "), mid)
    df.withColumn("__toks", wsToks(textCol))
      .select(id, selected.as("fim"),
        when(selected, fimText).otherwise(col(textCol)).as("text"))
  }

  /** The UL2 MIXTURE of denoisers (Tay et al. 2022): every document is
    * deterministically assigned one denoiser — R (regular spans:
    * spanLen 3, density 0.15), X (extreme: spanLen 12, density 0.5),
    * or S (the prefix-LM split) — by md5 bucket thirds, and its input
    * carries the paper's mode token (`[R] ` / `[X] ` / `[S] `). ONE
    * scan: all three constructions are codegen'd branches of the same
    * projection, selected per row. Returns
    * (idCol, denoiser, n_tokens, input_text, target_text). */
  def ul2Mixture(df: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text",
                 salt: String = "graft"): DataFrame = {
    val id = col(idCol)
    val bucket = substring(md5(concat(lit(salt), id.cast("string"),
      lit(":mix"))), 1, 8)
    val den = when(bucket < "55555555", "R")
      .when(bucket < "aaaaaaab", "X").otherwise("S")
    val toks = col("__toks")
    val n = size(toks)
    df.withColumn("__toks", wsToks(textCol))
      .withColumn("__mR", maskedGroups(id, toks, 3, 0.15, salt))
      .withColumn("__mX", maskedGroups(id, toks, 12, 0.5, salt))
      .withColumn("__sp", splitPoint(id, toks, salt))
      .withColumn("__den", den)
      .select(id, col("__den").as("denoiser"),
        n.cast("long").as("n_tokens"),
        concat(lit("["), col("__den"), lit("] "),
          when(col("__den") === "R", corruptInput(toks, col("__mR"), 3))
            .when(col("__den") === "X", corruptInput(toks, col("__mX"), 12))
            .otherwise(array_join(slice(toks, lit(1), col("__sp")), " ")))
          .as("input_text"),
        when(col("__den") === "R", corruptTarget(toks, col("__mR"), 3))
          .when(col("__den") === "X", corruptTarget(toks, col("__mX"), 12))
          .otherwise(array_join(slice(toks, col("__sp") + 1,
            greatest(n - col("__sp"), lit(0))), " "))
          .as("target_text"))
  }
}
