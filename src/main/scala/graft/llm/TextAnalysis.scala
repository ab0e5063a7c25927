package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, document fingerprinting. All pure
  * builtin-expression compositions (codegen'd, no UDF, no shuffle) —
  * they scale as a map-only pass over the corpus.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def wsTokenCount(c: Column): Column =
    when(trim(c) === "", 0).otherwise(size(split(trim(c), "\\s+")))

  /** Pre-token count: a GPT-2-style pre-tokenizer regex (contraction
    * suffixes / letter runs / digit runs / punctuation runs / spaces).
    * A cheap upper-structure proxy; for real token counts use
    * [[bpeTokenCount]] (learned merge-table BPE). */
  private val bpeRe = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+"
  def preTokenCount(c: Column): Column = regexp_count(c, lit(bpeRe))

  /** Real BPE token count via the learned merge-table tokenizer
    * ([[Bpe]]) — native codegen'd expression, map-only. Defaults to
    * [[Bpe.defaultLadder]]; pass a corpus-trained ladder from
    * [[Bpe.train]] for production counts. Caller must have run
    * `GraftExtensions.register` on the session (every `Bpe.encodeDf` /
    * query entry point does). */
  def bpeTokenCount(c: Column,
                    merges: Seq[(String, String)] = Bpe.defaultLadder): Column =
    Bpe.countCol(c, merges)

  /** License classification from header markers — the code-corpus
    * licensing gate (The Stack, Kocetkov et al. 2022, keeps
    * permissive-licensed files only). Detection order is fixed and
    * conservative: an SPDX identifier wins outright (it is the
    * machine-readable ground truth); otherwise the distinctive phrase
    * of each license family, checked copyleft-first so a file carrying
    * both GPL text and an MIT lib header classifies as the RESTRICTIVE
    * license (the safe direction for a keep-allowlist). RE2-safe
    * case-insensitive regexes, map-only. Returns one of 'mit',
    * 'apache-2.0', 'bsd', 'gpl', 'unknown'. */
  def licenseDetect(c: Column): Column = {
    def has(re: String) = lower(c).rlike(re)
    when(has("spdx-license-identifier:\\s*mit\\b"), "mit")
      .when(has("spdx-license-identifier:\\s*apache-2"), "apache-2.0")
      .when(has("spdx-license-identifier:\\s*bsd"), "bsd")
      .when(has("spdx-license-identifier:\\s*(gpl|agpl|lgpl)"), "gpl")
      .when(has("gnu (general|lesser|affero) public license"), "gpl")
      .when(has("apache license,? version 2"), "apache-2.0")
      .when(has("redistribution and use in source and binary forms"), "bsd")
      .when(has("permission is hereby granted, free of charge"), "mit")
      .otherwise("unknown")
  }

  /** Tokenizer FERTILITY per group — subword tokens per whitespace
    * word, the published tokenizer-equity audit (XLM-R §5, the BLOOM
    * data card): a language whose fertility is far above the corpus
    * mean is poorly served by the tokenizer (more tokens per word =
    * less effective context and higher training cost for the same
    * text). One partial-aggregated groupBy on the bounded group key;
    * both counts are exact integers, so the ratio replays bit-for-bit.
    * Returns (groupCol, n_docs, words, tokens, fertility — null for a
    * wordless group). */
  def tokenizerFertility(df: org.apache.spark.sql.DataFrame,
                         groupCol: String = "lang",
                         textCol: String = "text",
                         merges: Seq[(String, String)] = Bpe.defaultLadder)
      : org.apache.spark.sql.DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(wsTokenCount(col(textCol)).cast("long")).as("words"),
        sum(bpeTokenCount(col(textCol), merges).cast("long")).as("tokens"))
      .select(col(groupCol), col("n_docs"), col("words"), col("tokens"),
        when(col("words") > 0,
          col("tokens").cast("double") / col("words").cast("double"))
          .as("fertility"))
  }

  // public: SparkEntry mirrors these lists into the DuckDB oracle SQL
  val enStop = Seq("the", "of", "and", "a", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "this", "was", "are", "be",
    "or", "an", "not", "but", "from", "they", "his", "her", "she", "he", "we")
  val deStop = Seq("der", "die", "das", "und", "ist", "ich", "nicht",
    "ein", "eine", "mit", "für", "auf", "des", "dem", "den", "von", "zu", "im")
  val frStop = Seq("le", "la", "les", "et", "est", "je", "ne", "pas",
    "un", "une", "avec", "pour", "sur", "des", "du", "de", "en", "dans", "que")
  val esStop = Seq("el", "la", "los", "las", "y", "es", "yo", "no",
    "un", "una", "con", "para", "en", "por", "del", "se", "que", "su", "al")

  private def words(c: Column): Column = split(Dedup.normalizeText(c), " ")

  private def stopHits(ws: Column, stops: Seq[String]): Column = {
    val set = array(stops.map(lit): _*)
    size(array_intersect(ws, set))
  }

  /** Per-language stopword hit scores (distinct stopwords present). */
  def langScores(c: Column): Column = {
    val ws = array_distinct(words(c))
    struct(
      stopHits(ws, enStop).as("en"), stopHits(ws, deStop).as("de"),
      stopHits(ws, frStop).as("fr"), stopHits(ws, esStop).as("es"),
      // zh: character-level — CJK codepoint count dominates
      regexp_count(c, lit("[\\x{4e00}-\\x{9fff}]")).as("zh"))
  }

  /** Language ID by stopword/charset heuristic; deterministic tie-break
    * order en > de > es > fr > zh, 'und' (undetermined) when no signal. */
  def langId(c: Column): Column = {
    val s = langScores(c)
    val (en, de, fr, es, zh) =
      (s.getField("en"), s.getField("de"), s.getField("fr"), s.getField("es"),
        s.getField("zh"))
    val mx = greatest(en, de, fr, es, zh)
    when(mx === 0, "und")
      .when(zh === mx, "zh")
      .when(en === mx, "en")
      .when(de === mx, "de")
      .when(es === mx, "es")
      .otherwise("fr")
  }

  /** Unicode-script composition of a document: fraction of its
    * non-whitespace characters in each major script (Latin, Cyrillic,
    * CJK ideographs, Arabic) — the signal that catches mixed-script
    * spam, mojibake, and wrong-language routing that a stopword-based
    * [[langId]] can't see (it has no stopword table for most scripts).
    * Map-only regexp counts over one let-bound length; returns a
    * struct of `n_chars` + the four fractions (0 for empty text).
    * "Whitespace" is ASCII `\s` plus Unicode space separators (`\p{Zs}`
    * — NBSP, ideographic space: web text is full of them, and counting
    * them as content would dilute every fraction); the class is stated
    * this way because both Java regex and RE2 accept it verbatim. */
  def scriptStats(c: Column): Column =
    Dedup.letBound(
      length(regexp_replace(c, "[\\s\\p{Zs}]", "")).cast("double")) { n =>
      def frac(pattern: String) =
        when(n > 0, regexp_count(c, lit(pattern)).cast("double") / n)
          .otherwise(0d)
      struct(n.cast("long").as("n_chars"),
        frac("\\p{script=Latin}").as("latin_frac"),
        frac("\\p{script=Cyrillic}").as("cyrillic_frac"),
        frac("\\p{script=Han}").as("han_frac"),
        frac("\\p{script=Arabic}").as("arabic_frac"))
    }

  /** Count of the most frequent element of a string array, via a
    * sorted-run scan: O(n log n) sort + one linear fold, vs the naive
    * O(distinct·n) filter-per-distinct-element loop (which on a
    * 100k-word document would be 10^10 comparisons). */
  private def maxRunCount(ws: Column): Column =
    aggregate(array_sort(ws),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, w) => {
        val run = when(w === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(w.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      _.getField("best"))

  /** Gopher-style repetition signals: the duplicate word-2-gram
    * fraction and the most-frequent-word share. High values flag
    * boilerplate and degenerate generations (the standard repetition
    * filters alongside [[qualityStats]]). Map-only; the top-word pass
    * is an O(n log n) sorted-run count per document ([[maxRunCount]]).
    * The word split is let-bound (computed once per row; see
    * `Dedup.letBound`). An empty text normalizes to the single empty
    * word, giving (0, 1.0) — consistent in both engines. */
  def repetitionStats(c: Column): Column =
    Dedup.letBound(words(c)) { ws =>
      val n = size(ws)
      val grams = transform(sequence(lit(0), n - 2),
        i => array_join(slice(ws, i + 1, lit(2)), " "))
      val dupG = when(n >= 2,
          round(lit(1d) - size(array_distinct(grams)).cast("double") /
            (n - 1).cast("double"), 4))
        .otherwise(0d)
      val topW = when(n > 0,
          round(maxRunCount(ws).cast("double") / n.cast("double"), 4))
        .otherwise(0d)
      struct(dupG.as("dup_2gram_frac"), topW.as("top_word_frac"))
    }

  /** The COMPLETE Gopher repetition signal set (Rae et al. 2021 Table
    * A1; [[graft.functions.Repetition]] kernel, one native pass via
    * `graft_repetition_stats`): duplicate line/paragraph fractions
    * (count and character weighted), top 2/3/4-gram character
    * fractions, and greedy duplicate 5..10-gram character fractions —
    * the thirteen published signals, where [[repetitionStats]] keeps
    * only its two legacy approximations. Returns a named struct;
    * caller's session needs `GraftExtensions.register`. Map-only. */
  def repetitionStatsFull(c: Column): Column = {
    val arr = call_function("graft_repetition_stats", c)
    Dedup.letBound(arr) { a =>
      struct(graft.functions.Repetition.fieldNames.zipWithIndex.map {
        case (name, i) => element_at(a, i + 1).as(name)
      }: _*)
    }
  }

  /** Keep decision over [[repetitionStatsFull]] with the PUBLISHED
    * thresholds (each overridable): a document survives only when
    * every fraction is at or below its bound. */
  def repetitionOk(stats: Column,
                   overrides: Map[String, Double] = Map.empty): Column =
    graft.functions.Repetition.gopherThresholds.map { case (name, bound) =>
      stats.getField(name) <= lit(overrides.getOrElse(name, bound))
    }.reduce(_ && _)

  /** Exact interpolated quantiles of a numeric column — the thresholds
    * a curation pass derives BEFORE filtering (e.g. "drop below-p05 /
    * above-p99 length documents"). One aggregation, one row out per
    * requested probability. Spark's exact `percentile` shares DuckDB
    * `quantile_cont`'s (n−1)·p linear-interpolation definition, so the
    * thresholds are oracle-checkable; a 100 TB run swaps
    * `percentile_approx` in at the call site for bounded executor
    * memory with the same plan shape. */
  def quantiles(df: org.apache.spark.sql.DataFrame, valueCol: Column,
                probs: Seq[Double]): org.apache.spark.sql.DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1))
    val pArr = array(probs.map(lit): _*)
    df.agg(percentile(valueCol, pArr).as("__qs"))
      .select(posexplode(col("__qs")).as(Seq("__i", "q")))
      .select(element_at(pArr, col("__i") + 1).as("p"), col("q"))
  }

  /** Compression-ratio quality signal (Gopher-family heuristic): the
    * zlib-deflated/raw byte ratio via the native
    * [[graft.plans.DeflateLenExpression]]. Both tails flag junk —
    * `too_repetitive` (machine-generated loops, boilerplate walls)
    * compresses far below natural prose, `too_random`
    * (base64/hex/binary spill) barely compresses at all. Map-only,
    * shuffle-free, fuses into any existing scan pass. Raw deflate
    * lengths are zlib-build-specific; the flags are the portable
    * surface. Empty/null text yields a null ratio and false flags. */
  def compressionStats(df: DataFrame, idCol: String, textCol: String,
                       minRatio: Double = 0.2,
                       maxRatio: Double = 0.4): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    df.select(col(idCol).as("doc_id"),
        octet_length(col(textCol)).cast("long").as("n_bytes"),
        compressionRatio(col(textCol)).as("ratio"))
      .withColumn("too_repetitive",
        coalesce(col("ratio") < minRatio, lit(false)))
      .withColumn("too_random",
        coalesce(col("ratio") > maxRatio, lit(false)))
  }

  /** deflated/raw byte ratio, null for empty/null text (ANSI-safe — no
    * division by zero). Requires `GraftExtensions.register` on the
    * session. */
  def compressionRatio(c: Column): Column =
    Dedup.letBound(octet_length(c).cast("long")) { raw =>
      when(raw > 0,
        call_function("graft_deflate_len", c).cast("double") /
          raw.cast("double"))
    }

  /** Keep predicate for the compression-ratio filter: inside
    * [minRatio, maxRatio], with no-signal (empty/null) texts kept. The
    * ratio is let-bound so the (dominant-cost) deflate runs ONCE per
    * row even though the predicate references it three times. */
  def compressionOk(c: Column, minRatio: Double = 0.2,
                    maxRatio: Double = 0.4): Column =
    Dedup.letBound(compressionRatio(c)) { r =>
      r.isNull || (r >= minRatio && r <= maxRatio)
    }

  // ---- C4 cleaning (Raffel et al. 2020, arXiv:1910.10683 §2.2) ----------

  /** A line "ends in a terminal punctuation mark" per the published C4
    * heuristic: period, exclamation mark, question mark, or end
    * quotation mark, allowing trailing whitespace. */
  private val c4TerminalRe = "[.!?\"]\\s*$"

  /** C4 LINE-level cleaning (Raffel et al. 2020 §2.2): keep only lines
    * that end in a terminal punctuation mark, contain at least
    * `minLineWords` whitespace words, and do not contain the word
    * "javascript" (case-insensitive — the paper's rule targets cookie/
    * JS boilerplate lines). Returns the surviving lines re-joined with
    * `\n`. Map-only (split + filter + join inside codegen); at 100 TB
    * this is a pure scan transform with zero data movement. */
  def c4CleanLines(c: Column, minLineWords: Int = 5): Column = {
    val kept = filter(split(c, "\n"), l =>
      l.rlike(c4TerminalRe) &&
        size(filter(split(trim(l), "\\s+"), w => w =!= "")) >= minLineWords &&
        !lower(l).contains("javascript"))
    array_join(kept, "\n")
  }

  /** C4 PAGE-level keep decision (Raffel et al. 2020 §2.2): drop pages
    * whose RAW text contains a curly brace (code), the phrase "lorem
    * ipsum" (placeholder boilerplate), or any word from `badWords`
    * (the paper uses a public blocklist; parameterized here — matched
    * against the normalized word split, not substrings, so "class"
    * never matches "ass"); and drop pages whose CLEANED text (pass
    * [[c4CleanLines]] output) has fewer than `minSentences` sentences
    * (terminal-mark count, the paper's heuristic).
    *
    * The sentence count uses the SAME terminal set as the line rule
    * ([[c4TerminalRe]]): `[.!?]` anywhere, PLUS a line-ending `"` not
    * already preceded by one of them (quoted speech — the line rule
    * keeps `he said "no way"`, so the page rule must count it, or a
    * page of such lines is wrongly dropped). Expressed without
    * lookahead so the DuckDB (RE2) oracles replay it. Map-only. */
  def c4PageOk(raw: Column, cleaned: Column, minSentences: Int = 3,
               badWords: Seq[String] = Nil): Column = {
    val sentences = regexp_count(cleaned, lit("[.!?]")) +
      regexp_count(cleaned, lit("[^.!?]\"[ \\t]*(\\n|$)"))
    val base = !raw.contains("{") &&
      !lower(raw).contains("lorem ipsum") &&
      sentences >= minSentences
    if (badWords.isEmpty) base
    else {
      // strip edge punctuation from each word before matching: the
      // normalized split keeps punctuation attached, and a blocklist
      // must hit "badword." / "(badword" / '"badword"' — word-interior
      // punctuation still never matches ("class" vs "ass" stays safe)
      val stripped = transform(words(raw),
        w => regexp_replace(w, "^\\p{Punct}+|\\p{Punct}+$", ""))
      base && !arrays_overlap(stripped,
        array(badWords.map(w => lit(w.toLowerCase)): _*))
    }
  }

  /** The eight Gopher stop words (Rae et al. 2021, "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher",
    * arXiv:2112.11446, §A1.1): a document must contain at least TWO
    * of these to pass the published filter. Distinct from [[enStop]]
    * (the language-ID list) on purpose — the published rule names
    * exactly these words. */
  val gopherStop = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Characters that open a bullet line for the Gopher bullet-line
    * rule ("90% of lines starting with a bullet point"): the bullet
    * glyphs plus the ASCII markers Markdown-ish corpora actually use. */
  private val bulletStartRe = "^\\s*[•‣▶*-]"
  private val ellipsisEndRe = "(\\.\\.\\.|…)\\s*$"

  /** Quality-signal columns — the COMPLETE Gopher rule-set inputs
    * (Rae et al. 2021 §A1.1) plus the repo's extra ratios
    * (punct/digit/upper). Word-level signals come from the normalized
    * word split; line-level signals (bullet/ellipsis fractions) from
    * the RAW text's newline structure (normalization collapses
    * newlines, so it cannot see lines). Returns a struct; `qualityOk`
    * (legacy relaxed bounds) or `gopherOk` (published constants)
    * flatten it to a keep decision. */
  def qualityStats(c: Column): Column = {
    val ws = words(c)
    val nWords = size(ws).cast("double")
    val nChars = length(c).cast("double")
    val meanWordLen = when(nWords > 0,
      aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") / nWords)
      .otherwise(0d)
    val punct = regexp_count(c, lit("[\\p{Punct}]")).cast("double")
    val digits = regexp_count(c, lit("[0-9]")).cast("double")
    val upper = regexp_count(c, lit("[A-Z]")).cast("double")
    val stop = stopHits(ws, enStop).cast("double")
    // Gopher symbol-to-word ratios: hashes and ellipses counted
    // separately (the published rule thresholds EACH at 0.1)
    val hashes = regexp_count(c, lit("#")).cast("double")
    val ellipses = regexp_count(c, lit("(\\.\\.\\.|…)")).cast("double")
    val lines = split(c, "\n")
    val nLines = size(lines).cast("double")
    val bulletLines = size(filter(lines, l => l.rlike(bulletStartRe)))
    val ellipsisLines = size(filter(lines, l => l.rlike(ellipsisEndRe)))
    val alphaWords = size(filter(ws, w => w.rlike("[a-zA-Z]"))).cast("double")
    struct(
      size(ws).as("n_words"),
      round(meanWordLen, 4).as("mean_word_len"),
      round(when(nChars > 0, punct / nChars).otherwise(0d), 4).as("punct_ratio"),
      round(when(nChars > 0, digits / nChars).otherwise(0d), 4).as("digit_ratio"),
      round(when(nChars > 0, upper / nChars).otherwise(0d), 4).as("upper_ratio"),
      round(when(nWords > 0, stop / nWords).otherwise(0d), 4).as("stop_ratio"),
      round(when(nWords > 0, hashes / nWords).otherwise(0d), 4)
        .as("hash_word_ratio"),
      round(when(nWords > 0, ellipses / nWords).otherwise(0d), 4)
        .as("ellipsis_word_ratio"),
      round(when(nLines > 0, bulletLines.cast("double") / nLines)
        .otherwise(0d), 4).as("bullet_line_frac"),
      round(when(nLines > 0, ellipsisLines.cast("double") / nLines)
        .otherwise(0d), 4).as("ellipsis_line_frac"),
      round(when(nWords > 0, alphaWords / nWords).otherwise(0d), 4)
        .as("alpha_word_frac"),
      stopHits(ws, gopherStop).as("stop_hits"))
  }

  /** Gopher-ish keep decision over [[qualityStats]] — the repo's
    * legacy RELAXED bounds (length/word-len/punct only), kept stable
    * because [[curationKeep]] and its oracles compose exactly these
    * rules. The full published rule set is [[gopherOk]]. */
  def qualityOk(stats: Column,
                minWords: Int = 10, maxWords: Int = 100000,
                minMeanWordLen: Double = 2.0, maxMeanWordLen: Double = 12.0,
                maxPunctRatio: Double = 0.3): Column =
    stats.getField("n_words").between(minWords, maxWords) &&
      stats.getField("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
      stats.getField("punct_ratio") <= maxPunctRatio

  /** [[qualityOk]] with a PER-ROW routed word floor — the FineWeb-2
    * multilingual shape: one pipeline, per-language thresholds,
    * because word counts are not comparable across scripts (a 20-word
    * zh doc carries the content of a 50-word en doc). `minWords` is a
    * Column (typically a CASE over the language column); the other
    * bounds stay corpus-wide scalars. Same codegen'd struct-field
    * predicate as [[qualityOk]]. */
  def qualityOkRouted(stats: Column, minWords: Column,
                      maxWords: Int = 100000,
                      minMeanWordLen: Double = 2.0,
                      maxMeanWordLen: Double = 12.0,
                      maxPunctRatio: Double = 0.3): Column =
    stats.getField("n_words") >= minWords &&
      stats.getField("n_words") <= lit(maxWords) &&
      stats.getField("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
      stats.getField("punct_ratio") <= maxPunctRatio

  /** The COMPLETE published Gopher quality filter (Rae et al. 2021
    * §A1.1) over [[qualityStats]] — every default is the paper's
    * constant: 50–100,000 words; mean word length 3–10; symbol-to-word
    * ratio ≤ 0.1 for hashes AND for ellipses (each separately); ≤ 90%
    * of lines starting with a bullet; ≤ 30% of lines ending with an
    * ellipsis; ≥ 80% of words containing an alphabetic character; and
    * ≥ 2 of the eight [[gopherStop]] words present. Drop-in comparable
    * with published Gopher-rule implementations; every threshold is a
    * parameter for corpus-specific tuning. */
  def gopherOk(stats: Column,
               minWords: Int = 50, maxWords: Int = 100000,
               minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
               maxSymbolWordRatio: Double = 0.1,
               maxBulletLineFrac: Double = 0.9,
               maxEllipsisLineFrac: Double = 0.3,
               minAlphaWordFrac: Double = 0.8,
               minStopHits: Int = 2): Column =
    stats.getField("n_words").between(minWords, maxWords) &&
      stats.getField("mean_word_len")
        .between(minMeanWordLen, maxMeanWordLen) &&
      stats.getField("hash_word_ratio") <= maxSymbolWordRatio &&
      stats.getField("ellipsis_word_ratio") <= maxSymbolWordRatio &&
      stats.getField("bullet_line_frac") <= maxBulletLineFrac &&
      stats.getField("ellipsis_line_frac") <= maxEllipsisLineFrac &&
      stats.getField("alpha_word_frac") >= minAlphaWordFrac &&
      stats.getField("stop_hits") >= minStopHits

  /** Single-pass keep decision for the composed curation filter:
    * language match + Gopher quality bounds + repetition bounds, all
    * signals derived from ONE let-bound word split (and one let-bound
    * distinct). Composing [[langId]]/[[qualityOk]]/[[repetitionStats]]
    * as separate columns re-evaluates `split(normalizeText(...))`
    * ~20× per row once CollapseProject inlines them into the Filter —
    * measured 8.7 s vs 1.7 s for the full curation pass at sf0.1.
    * Semantics are EXACTLY the composition (spec-asserted). */
  def curationKeep(c: Column, lang: String = "en",
                   minWords: Int = 10, maxWords: Int = 100000,
                   minMeanWordLen: Double = 2.0, maxMeanWordLen: Double = 12.0,
                   maxPunctRatio: Double = 0.3,
                   maxDup2gramFrac: Double = 0.2,
                   maxTopWordFrac: Double = 0.3): Column =
    Dedup.letBound(words(c)) { ws =>
      Dedup.letBound(array_distinct(ws)) { dws =>
        val n = size(ws)
        val nd = n.cast("double")
        val nChars = length(c).cast("double")
        def hits(stops: Seq[String]) =
          size(array_intersect(dws, array(stops.map(lit): _*)))
        val (en, de, fr, es) = (hits(enStop), hits(deStop), hits(frStop), hits(esStop))
        val zh = regexp_count(c, lit("[\\x{4e00}-\\x{9fff}]"))
        val mx = greatest(en, de, fr, es, zh)
        val predicted = when(mx === 0, "und").when(zh === mx, "zh")
          .when(en === mx, "en").when(de === mx, "de").when(es === mx, "es")
          .otherwise("fr")
        val meanWordLen = round(when(n > 0,
          aggregate(ws, lit(0L), (a, w) => a + length(w)).cast("double") / nd)
          .otherwise(0d), 4)
        val punct = round(when(nChars > 0,
          regexp_count(c, lit("[\\p{Punct}]")).cast("double") / nChars)
          .otherwise(0d), 4)
        val grams = transform(sequence(lit(0), n - 2),
          i => array_join(slice(ws, i + 1, lit(2)), " "))
        val dup2 = when(n >= 2,
            round(lit(1d) - size(array_distinct(grams)).cast("double") /
              (n - 1).cast("double"), 4))
          .otherwise(0d)
        val topw = when(n > 0,
            round(maxRunCount(ws).cast("double") / nd, 4))
          .otherwise(0d)
        predicted === lang &&
          n.between(minWords, maxWords) &&
          meanWordLen.between(minMeanWordLen, maxMeanWordLen) &&
          punct <= maxPunctRatio &&
          dup2 <= maxDup2gramFrac && topw <= maxTopWordFrac
      }
    }

  // PII scrubbing: redact emails / phone-ish numbers / IPv4 / long
  // digit runs (card/ssn-ish). Pure regexp_replace chain (codegen'd);
  // patterns are deliberately conservative (recall over precision, the
  // usual stance for training-data scrubbing).
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val phoneRe = "\\+?\\d[\\d ()-]{7,}\\d"
  private val longDigitsRe = "\\b\\d{9,}\\b"

  def scrubPii(c: Column): Column = {
    // long digit runs BEFORE phones: a 16-digit card number would
    // otherwise match the looser phone pattern first
    val noEmail = regexp_replace(c, emailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, ipRe, "<IP>")
    val noLong = regexp_replace(noIp, longDigitsRe, "<NUMBER>")
    regexp_replace(noLong, phoneRe, "<PHONE>")
  }

  /** Invisible/zero-width characters web text accumulates (tracking
    * pixels' alt text, CMS artifacts, RTL-boundary junk): zero-width
    * space/non-joiner/joiner, word joiner, BOM-as-ZWNBSP, soft
    * hyphen. They corrupt tokenization (one visual word becomes
    * several), dedup (visually identical docs hash apart) and n-gram
    * stats — strip them BEFORE any of those. NBSP normalizes to a
    * plain space (it is a real separator, not junk). Pure
    * regexp_replace — map-only, codegen'd, RE2-replayable. */
  private val invisibleRe = "[\\u200B\\u200C\\u200D\\u2060\\uFEFF\\u00AD]"

  /** Strip invisible characters and normalize NBSP (see
    * [[invisibleRe]]). */
  def stripInvisible(c: Column): Column =
    regexp_replace(regexp_replace(c, invisibleRe, ""), "\\u00A0", " ")

  /** Candidate payment-card pattern: 13-19 digits with optional
    * single space/dash separators, word-bounded. Raw digit runs also
    * hit phone numbers and ids — [[luhnValid]] is the discriminator. */
  private val cardRe = "\\b(?:\\d[ -]?){12,18}\\d\\b"

  /** Luhn checksum (ISO/IEC 7812 — the public mod-10 algorithm every
    * payment card number satisfies) over a digit-string column, in
    * PURE column ops so the DuckDB oracle replays it: from the
    * rightmost digit, double every second one (subtracting 9 on
    * overflow) and require the sum ≡ 0 mod 10. The Luhn gate is what
    * separates card PII from ordinary long numbers — a raw
    * digit-run rule either over-redacts ids or under-redacts cards. */
  def luhnValid(digits: Column): Column =
    Dedup.letBound(reverse(digits)) { r =>
      val contrib = transform(sequence(lit(1), length(r)), i =>
        Dedup.letBound(r.substr(i, lit(1)).cast("int")) { dg =>
          when(i % 2 === 0,
            when(dg * 2 > 9, dg * 2 - 9).otherwise(dg * 2)).otherwise(dg)
        })
      aggregate(contrib, lit(0), (a, x) => a + x) % 10 === 0
    }

  /** Count of Luhn-valid card numbers in the text. Map-only. */
  def piiCardCount(c: Column): Column =
    size(filter(
      transform(regexp_extract_all(c, lit(cardRe), lit(0)),
        m => regexp_replace(m, "[ -]", "")),
      d => length(d).between(13, 19) && luhnValid(d)))

  /** Redact Luhn-valid card numbers (separator-tolerant): each VALID
    * candidate is replaced literally with `<CARD>`; Luhn-failing
    * digit runs (order ids, tracking numbers) are left alone. Run
    * BEFORE [[scrubPii]] — its long-digit rule would otherwise eat
    * card numbers into indistinct `<NUMBER>`s. */
  def scrubCards(c: Column): Column =
    Dedup.letBound(
      filter(regexp_extract_all(c, lit(cardRe), lit(0)),
        m => Dedup.letBound(regexp_replace(m, "[ -]", "")) { d =>
          length(d).between(13, 19) && luhnValid(d)
        })) { cands =>
      // digit-boundary-anchored regex replace, not a literal one: a
      // valid card's digits appearing as a SUBSTRING of a longer
      // non-card run (a 22-digit tracking id) must stay untouched for
      // the long-number rule. Candidates contain only digits, spaces
      // and dashes (cardRe), so they embed into a regex verbatim.
      aggregate(cands, c, (acc, cand) => regexp_replace(acc,
        concat(lit("(?<![0-9])"), cand, lit("(?![0-9])")), lit("<CARD>")))
    }

  /** [[scrubCards]] then [[scrubPii]] — the strict redaction pass. */
  def scrubPiiStrict(c: Column): Column = scrubPii(scrubCards(c))

  /** Count of PII hits per kind (for filtering decisions without
    * rewriting the text). */
  def piiStats(c: Column): Column = struct(
    regexp_count(c, lit(emailRe)).as("emails"),
    regexp_count(c, lit(ipRe)).as("ips"),
    regexp_count(c, lit(phoneRe)).as("phones"),
    regexp_count(c, lit(longDigitsRe)).as("long_numbers"))

  /** Rolling-hash document fingerprint: left fold of a polynomial hash
    * over per-word codes, mod 1e9+7 (stays well inside int64 —
    * acc < P, acc*131 + code < 2^63). Deterministic and
    * engine-portable (same fold is expressible in ANSI SQL reducers). */
  def fingerprint(c: Column): Column = {
    val P = 1000000007L
    val ws = words(c)
    val codes = transform(ws, w =>
      (coalesce(ascii(substring(w, 1, 1)).cast("long"), lit(0L)) * 31L +
        length(w).cast("long") * 17L) % P)
    aggregate(codes, lit(0L), (acc, x) => (acc * 131L + x) % P)
  }

  /** One (doc_id, word) row per normalized word occurrence — the
    * word-extraction contract shared by [[vocabulary]] and [[topTerms]]
    * (and mirrored SQL-side by the oracle's word CTE): normalize,
    * split on single spaces, drop empties. */
  private def wordRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(split(Dedup.normalizeText(col(textCol)), " ")).as("word"))
      .where(col("word") =!= "")

  /** Tokenizer-vocabulary coverage report — the QA pass run before
    * committing a tokenizer to a corpus (and after ingesting a new
    * source): per-document token count, out-of-vocabulary count, and
    * OOV rate against a vocabulary FRAME. High OOV rates flag
    * wrong-language slices, encoding corruption, or a vocab trained on
    * the wrong distribution.
    *
    * Scale shape: the vocab is bounded (a tokenizer vocabulary —
    * broadcast hash join against the exploded word stream), the
    * per-doc aggregation partially combines map-side (explode keeps a
    * doc's words in one partition, so the shuffle carries ~one row per
    * doc), and docs with no words surface with zero counts (rate 0.0,
    * the no-signal convention) rather than vanishing. */
  def vocabCoverage(df: DataFrame, idCol: String, textCol: String,
                    vocab: DataFrame, wordCol: String = "word"): DataFrame = {
    val v = broadcast(vocab.select(lower(col(wordCol)).as("__w")).distinct()
      .withColumn("__in", lit(1)))
    val counts = df
      .select(col(idCol).as("doc_id"),
        explode(split(Dedup.normalizeText(col(textCol)), " ")).as("__w"))
      .where(col("__w") =!= "")
      .join(v, Seq("__w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
    df.select(col(idCol).as("doc_id")).distinct()
      .join(counts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("oov_rate", when(col("n_tokens") > 0,
        round(col("n_oov").cast("double") / col("n_tokens"), 6))
        .otherwise(lit(0d)))
  }

  /** CCNet-style statistical LM quality score: per-document unigram
    * cross-entropy against the corpus's own word distribution, with
    * add-one smoothing — `-mean(ln((n_w + 1) / (N + |V| + 1)))` in
    * nats. Documents full of rare/garbage tokens score high; dull
    * boilerplate scores low; both tails are curation candidates (the
    * distributed stand-in for CCNet's wiki-LM perplexity bucketing —
    * same selection mechanics, corpus-self-trained instead of an
    * external LM).
    *
    * Scale shape: one vocabulary aggregation (vocabulary-sized output —
    * broadcastable at realistic vocab sizes; swap the hint for a plain
    * shuffle join if |V| outgrows executors), the per-word log computed
    * ONCE per vocab entry (not per occurrence), one doc-key aggregation
    * for the mean. Log-sums route through DECIMAL so partial-merge
    * order cannot change results. */
  def unigramCrossEntropy(df: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val ws = wordRows(df, idCol, textCol)
    val freqs = ws.groupBy(col("word")).agg(count(lit(1)).as("__n"))
    val totals = freqs.agg(sum(col("__n")).as("__total"),
      count(lit(1)).as("__v"))
    val worded = freqs.crossJoin(broadcast(totals))
      .select(col("word"), (-log((col("__n") + 1).cast("double") /
        (col("__total") + col("__v") + 1).cast("double"))).as("__nlp"))
    ws.join(broadcast(worded), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        (sum(col("__nlp").cast("decimal(27,12)")).cast("double") /
          count(lit(1))).as("cross_entropy"))
  }

  /** CCNet's published selection shape: per-document unigram
    * cross-entropy of a TARGET corpus priced by a REFERENCE corpus's
    * word distribution — the wiki-trained LM scoring CommonCrawl
    * (Wenzek et al., arXiv:1911.00359 §4.3). Add-one smoothing on the
    * reference: `p(w) = (n_ref(w)+1) / (N_ref+|V_ref|+1)`; target
    * words outside the reference vocabulary take the constant unseen
    * price `-ln(1/(N_ref+|V_ref|+1))`. [[unigramCrossEntropy]] is the
    * self-trained stand-in; this is the cross-corpus scoring CCNet
    * actually runs (low = reference-like prose, high = junk OR
    * out-of-domain — both tails reviewed before dropping). Returns
    * one row per scoreable target doc:
    * (doc_id, n_words, n_oov, ce_against).
    *
    * Scale shape: ONE reference vocabulary aggregation (vocab-sized
    * output — broadcastable at realistic vocab sizes; swap the hint
    * for a shuffle join if |V_ref| outgrows executors), the per-word
    * price computed once per vocab entry, a broadcast LEFT pricing
    * join (misses = OOV pay the unseen price), one doc-key
    * aggregation for the mean. Reference scanned once, target once;
    * log-sums route through DECIMAL so merge order cannot move a
    * score. */
  def crossEntropyAgainst(target: DataFrame, reference: DataFrame,
                          idCol: String, textCol: String,
                          refTextCol: String = "text"): DataFrame =
    crossEntropyAgainstPrices(target, cePrices(reference, refTextCol),
      idCol, textCol)

  /** The reference LM as a PERSISTABLE price table — the build-once
    * artifact of the CCNet deployment shape (the wiki LM is trained
    * once and shipped; scoring is stateless given it): one
    * `(word, nlp)` row per reference-vocabulary word plus ONE sentinel
    * row (`word = ''` — the normalizer never emits an empty word, so
    * the key cannot collide) carrying the unseen price. Vocab-sized;
    * write it to parquet and feed [[crossEntropyAgainstPrices]] — the
    * `ce_prices` sink / `ce_apply` transform pair, mirroring the
    * excess_weights → mix_apply two-phase convention. */
  def cePrices(reference: DataFrame,
               refTextCol: String = "text"): DataFrame = {
    val refFreqs = reference
      .select(explode(split(Dedup.normalizeText(col(refTextCol)), " "))
        .as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("__n"))
    val totals = refFreqs.agg(sum(col("__n")).as("__total"),
      count(lit(1)).as("__v"))
    refFreqs.crossJoin(broadcast(totals))
      .select(col("word"), (-log((col("__n") + 1).cast("double") /
        (col("__total") + col("__v") + 1).cast("double"))).as("nlp"))
      .unionByName(totals.select(lit("").as("word"),
        (-log(lit(1.0) /
          (col("__total") + col("__v") + 1).cast("double"))).as("nlp")))
  }

  /** Stateless scoring against a [[cePrices]] table: one broadcast
    * LEFT pricing join (misses pay the sentinel unseen price) and the
    * doc-key mean — no aggregation over the reference, so it composes
    * into the streamed curation chain per micro-batch where the
    * in-flight [[crossEntropyAgainst]] measurement cannot run. */
  def crossEntropyAgainstPrices(target: DataFrame, prices: DataFrame,
                                idCol: String,
                                textCol: String): DataFrame = {
    val vocab = prices.where(col("word") =!= "")
      .select(col("word"), col("nlp").as("__nlp"))
    val unseen = prices.where(col("word") === "")
      .select(col("nlp").as("__unseen"))
    wordRows(target, idCol, textCol)
      .join(broadcast(vocab), Seq("word"), "left")
      .crossJoin(broadcast(unseen))
      .select(col("doc_id"),
        when(col("__nlp").isNull, 1L).otherwise(0L).as("__oov"),
        coalesce(col("__nlp"), col("__unseen")).as("__p"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__oov")).as("n_oov"),
        (sum(col("__p").cast("decimal(27,12)")).cast("double") /
          count(lit(1))).as("ce_against"))
  }

  /** Per-document word-transition rows `(doc_id, w1, w2)` — one row
    * per consecutive word pair. Docs with fewer than two words produce
    * no row. Map-only (let-bound split + explode). */
  private def transitionRows(df: DataFrame, idCol: String,
                             textCol: String): DataFrame = {
    val pairs = Dedup.letBound(
        filter(split(Dedup.normalizeText(col(textCol)), " "),
          x => x =!= "")) { w =>
      when(size(w) >= 2,
        transform(sequence(lit(0), size(w) - 2),
          i => struct(element_at(w, i + 1).as("w1"),
            element_at(w, i + 2).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    }
    df.select(col(idCol).as("doc_id"), explode(pairs).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
  }

  /** Interpolated bigram LM cross-entropy — one rung up the n-gram
    * ladder from [[unigramCrossEntropy]] toward CCNet's 5-gram KenLM:
    * `p(w2|w1) = λ·c(w1,w2)/c(w1) + (1−λ)·(c(w2)+1)/(N+|V|+1)`,
    * per-document score `-mean(ln p)` over its transitions in nats.
    * Fluent prose rides high-probability transitions; shuffled or
    * garbage text falls back to the unigram floor and scores high.
    * The conditional context count approximates "occurrences of w1
    * followed by anything" with the plain unigram count (standard
    * corpus-LM shortcut; deterministic on both engines). Docs with
    * fewer than two words have no score row.
    *
    * Scale shape: one bigram-key aggregation (vocab-pair-bounded,
    * corpus-sublinear in practice) joined — ONCE PER DISTINCT BIGRAM,
    * not per occurrence — against the broadcast unigram table (same
    * realistic-vocab caveat as [[unigramCrossEntropy]]: at an extreme
    * corpus vocabulary, drop the hint and let it shuffle-join) to price
    * each transition; the corpus transition rows then shuffle once on
    * the bigram key to pick up the price and once on doc_id for the
    * mean. The bigram price table is deliberately NOT broadcast (it
    * grows with corpus vocabulary; AQE may still choose to). Prices
    * are rounded to 12 dp before the DECIMAL-routed per-doc sum, so
    * partial-merge order and libm ulps cannot move a score. */
  def bigramCrossEntropy(df: DataFrame, idCol: String, textCol: String,
                         lambda: Double = 0.7): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0,
      s"bigramCrossEntropy: lambda must be in (0,1), got $lambda")
    // cached: the bigram-count aggregation AND the pricing join both
    // read the transition frame -- uncached, the corpus-sized
    // normalize-split-explode extraction runs twice (the standing
    // cache-then-release discipline; released after materialization)
    val trs = transitionRows(df, idCol, textCol).cache()
    val uni = wordRows(df, idCol, textCol)
      .groupBy(col("word")).agg(count(lit(1)).as("__n"))
    val totals = uni.agg(sum(col("__n")).as("__total"),
      count(lit(1)).as("__v"))
    val bi = trs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__nb"))
    val priced = bi
      .join(broadcast(uni.select(col("word").as("w1"), col("__n").as("__n1"))),
        Seq("w1"))
      .join(broadcast(uni.select(col("word").as("w2"), col("__n").as("__n2"))),
        Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"),
        round(-log(
          lit(lambda) * col("__nb").cast("double") / col("__n1").cast("double") +
          lit(1.0 - lambda) * (col("__n2") + 1).cast("double") /
            (col("__total") + col("__v") + 1).cast("double")), 12).as("__nlp"))
    val out = trs.join(priced, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trans"),
        (sum(col("__nlp").cast("decimal(27,12)")).cast("double") /
          count(lit(1))).as("bigram_ce"))
      .localCheckpoint(true)
    trs.unpersist()
    out
  }

  /** CCNet's selection step: bucket the corpus into `nBuckets`
    * quantile bands of the unigram cross-entropy score (head = most
    * fluent, tail = junk — CCNet keeps the head/middle and drops the
    * tail). Scores AND the interpolated thresholds are rounded to 4
    * decimals before comparison on both engines: rounding only the
    * scores is not enough — with densely packed scores a last-ulp
    * difference in the percentile INTERPOLATION itself moves real
    * documents across a band (seen at sf0.1: ~100 docs flipped bands
    * between engines until the thresholds were rounded too). Returns one row per document:
    * (doc_id, ce, bucket 1..nBuckets); ties at a threshold go to the
    * LOWER band — with a heavily modal score distribution the
    * thresholds themselves equal the mode, and a ties-up rule would
    * dump the entire modal mass into the worst band. Documents that
    * produce no words (null/empty/whitespace-only text) have no score
    * and no output row — callers filtering on buckets must decide
    * their fate explicitly (the `quality_bucket_filter` config kind
    * keeps them).
    *
    * Scale shape: the CE pass (linear), ONE exact-percentile
    * aggregation for the thresholds (swap `percentile_approx` in at
    * corpus scale, same plan shape), the (nBuckets-1)-long threshold
    * array broadcast back as a one-row frame, and a map-only band
    * assignment — no ntile, no global sort, no single-partition
    * window. */
  def qualityBuckets(df: DataFrame, idCol: String, textCol: String,
                     nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2, s"qualityBuckets: need >= 2 buckets, got $nBuckets")
    val ce = unigramCrossEntropy(df, idCol, textCol)
      .select(col("doc_id"), round(col("cross_entropy"), 4).as("ce"))
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val ths = quantiles(ce, col("ce"), probs)
      .agg(sort_array(collect_list(round(col("q"), 4))).as("__ths"))
    ce.crossJoin(broadcast(ths))
      .select(col("doc_id"), col("ce"),
        (aggregate(col("__ths"), lit(1),
          (acc, t) => acc + when(col("ce") > t, 1).otherwise(0)))
          .as("bucket"))
  }

  /** Corpus vocabulary census: one row per normalized word with total
    * occurrences and distinct-document frequency — the heavy-hitter /
    * stopword / tokenizer-coverage analysis pass. Scale shape: explode
    * + ONE aggregation on the word key; the single distinct aggregate
    * (`n_docs`) plans as a two-phase partial distinct (no Expand), so
    * partials combine map-side on both counts. */
  def vocabulary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    wordRows(df, idCol, textCol)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_total"), count_distinct(col("doc_id")).as("n_docs"))

  /** Per-document top-k characteristic terms by a TF-IDF-style score —
    * keyword/topic tagging for corpus curation. The score is the exact
    * rational `(term_count × n_docs) / (doc_len × doc_freq)` (raw
    * inverse document frequency, no log damping): every factor is an
    * integer and the one double division is IEEE-correctly-rounded, so
    * the score is bit-identical across engines — a log-damped variant
    * would hash-differ cross-engine in the last ulp (libm ln is not
    * bit-specified). Ranking is unchanged by the missing log within a
    * document when frequencies tie; ties break on the word.
    *
    * Scale shape: one corpus aggregation to (doc, word) counts, a
    * doc-length join on doc_id, a vocabulary-sized doc-frequency join
    * (broadcastable), the corpus count as a broadcast one-row
    * aggregate, and a WindowGroupLimit top-k per doc — no global
    * sort, no driver-side state. */
  def topTerms(df: DataFrame, idCol: String, textCol: String,
               k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wc = wordRows(df, idCol, textCol).groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("__c"))
    val dlen = wc.groupBy(col("doc_id")).agg(sum(col("__c")).as("__len"))
    val dfreq = wc.groupBy(col("word")).agg(count(lit(1)).as("__df"))
    val n = df.agg(count(lit(1)).as("__n"))
    val scored = wc.join(dlen, Seq("doc_id")).join(dfreq, Seq("word"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("__c") * col("__n")).cast("double") / (col("__len") * col("__df")))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word"))
    scored.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .select(col("doc_id"), col("word"), col("score"))
  }

  /** Adjacent-pair (bigram) census — the counting step at the core of
    * BPE/WordPiece tokenizer training (find the most frequent adjacent
    * pair, merge, repeat): one row per adjacent normalized-word pair
    * with its total count. Same scale shape as [[vocabulary]]: a
    * map-only pair expansion, then ONE combinable aggregation on the
    * pair key. */
  def bigramCounts(df: DataFrame, textCol: String): DataFrame =
    // the word split is let-bound: its four references below (two sizes,
    // two element_ats per pair) must not re-run the split
    df.select(explode(
        Dedup.letBound(split(Dedup.normalizeText(col(textCol)), " ")) { ws =>
          when(size(ws) >= 2,
            transform(sequence(lit(1), size(ws) - 1),
              i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
            .otherwise(array().cast("array<string>"))
        }).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))

  /** Sliding-window token chunking for embedding/context prep: each
    * document splits into whitespace-token windows of `chunkTokens`
    * starting every `stride` tokens (overlap = chunkTokens - stride;
    * the final window may be shorter). Chunk ids are 0-based in
    * document order, so [[Similarity.meanPool]] can pool chunk
    * embeddings back to documents by `doc_id`.
    *
    * Enumeration stops at the first window that reaches the document
    * end — a shorter tail window is emitted only when the tokens past
    * the last full window are not already covered (no chunk is ever a
    * sub-span of its predecessor, which would double-weight tail
    * tokens in downstream pooling).
    *
    * Scale shape: map-only — tokenize, enumerate starts, slice; no
    * shuffle, no UDF; the explode multiplies rows by
    * ~n_tokens / stride, the unavoidable output size. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkByTokens: chunkTokens must be > 0, got $chunkTokens")
    require(stride > 0 && stride <= chunkTokens,
      s"chunkByTokens: stride must be in 1..chunkTokens, got $stride")
    val ws = split(trim(col(textCol)), "\\s+")
    // last start = stride * ceil((n - chunkTokens) / stride), floored at
    // 0 — the first start whose window reaches the end of the doc
    val lastStart = greatest(lit(0),
      floor((size(col("__ws")) - chunkTokens + stride - 1).cast("double") / stride)
        .cast("int")) * stride
    df.select(col(idCol).as("doc_id"), ws.as("__ws"))
      .select(col("doc_id"), posexplode(transform(
          sequence(lit(0), lastStart, lit(stride)),
          s => slice(col("__ws"), s + 1, lit(chunkTokens))))
        .as(Seq("chunk_id", "__chunk")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        array_join(col("__chunk"), " ").as("chunk"),
        size(col("__chunk")).cast("long").as("n_tokens"))
  }
}
