package graft.functions

/** The COMPLETE Gopher repetition rule set (Rae et al. 2021, "Scaling
  * Language Models: Methods, Analysis & Insights from Training
  * Gopher", arXiv:2112.11446, Table A1 "Repetition removal") — the
  * sub-table `TextAnalysis.repetitionStats`' two signals (dup-2-gram,
  * top-word) only sample. Semantics follow the published table and the
  * de-facto-standard open reimplementation of its counting rules
  * (the greedy non-overlapping dup-n-gram walk):
  *
  *  - duplicate line / paragraph fraction: elements whose content was
  *    already seen (occurrences beyond each first), over total
  *    elements; the `_char` variants weight by element characters over
  *    total text characters. Lines split on `\n`, paragraphs on
  *    `\n\n+`, both over the stripped RAW text (normalization destroys
  *    the line structure these measure).
  *  - top n-gram character fraction (n = 2..4): characters of the most
  *    frequent word n-gram times its count, over the NORMALIZED text
  *    length — only when that count ≥ 2; ties break to the gram that
  *    ATTAINS the winning count first in scan order (deterministic
  *    under any map iteration).
  *  - duplicate n-gram character fraction (n = 5..10): a greedy left
  *    scan; a gram seen before contributes its characters once and
  *    jumps the scan n words forward (non-overlapping coverage — the
  *    published counting rule; summing every repeated occurrence would
  *    double-count overlapping positions).
  *
  * Words are the engine's normalized split (lower, `\s+` → single
  * space, trim — `Dedup.normalizeText`), so the stats compose with
  * every other text operator's word semantics. All thirteen signals
  * compute in ONE pass over the words per n (O(words × 9) gram
  * probes), no regex backtracking, no quadratic substring scans.
  */
object Repetition {

  /** Threshold table as published (Table A1): a document is removed
    * when any fraction EXCEEDS its bound. */
  val gopherThresholds: Seq[(String, Double)] = Seq(
    "dup_line_frac" -> 0.30,
    "dup_para_frac" -> 0.30,
    "dup_line_char_frac" -> 0.20,
    "dup_para_char_frac" -> 0.20,
    "top_2gram_char_frac" -> 0.20,
    "top_3gram_char_frac" -> 0.18,
    "top_4gram_char_frac" -> 0.16,
    "dup_5gram_char_frac" -> 0.15,
    "dup_6gram_char_frac" -> 0.14,
    "dup_7gram_char_frac" -> 0.13,
    "dup_8gram_char_frac" -> 0.12,
    "dup_9gram_char_frac" -> 0.11,
    "dup_10gram_char_frac" -> 0.10)

  /** Field order of the returned struct / array. */
  val fieldNames: Seq[String] = gopherThresholds.map(_._1)

  /** Compute all thirteen fractions; null-safe. Order = [[fieldNames]]. */
  def stats(text: String): Array[Double] = {
    if (text == null) return null
    val out = new Array[Double](13)
    val stripped = text.trim
    val rawLen = stripped.length.toDouble
    if (rawLen > 0) {
      val lines = stripped.split("\n", -1)
      val paras = stripped.split("\n\n+", -1)
      val (dl, dlc) = dupElements(lines)
      val (dp, dpc) = dupElements(paras)
      out(0) = dl.toDouble / lines.length
      out(1) = dp.toDouble / paras.length
      out(2) = dupParaCharFrac(dlc, rawLen)
      out(3) = dupParaCharFrac(dpc, rawLen)
    }
    val words = normalizedWords(stripped)
    if (words.nonEmpty) {
      // normalized text length = word chars + single separators
      var normLen = words.length - 1
      words.foreach(normLen += _.length)
      var n = 2
      while (n <= 4) {
        out(2 + n) = topGramChars(words, n) / normLen
        n += 1
      }
      n = 5
      while (n <= 10) {
        out(2 + n) = dupGramChars(words, n) / normLen
        n += 1
      }
    }
    out
  }

  private def dupParaCharFrac(chars: Long, total: Double): Double =
    if (total > 0) chars / total else 0.0

  /** (elements beyond each first occurrence, their summed characters). */
  private def dupElements(xs: Array[String]): (Int, Long) = {
    val seen = new java.util.HashSet[String]()
    var count = 0
    var chars = 0L
    var i = 0
    while (i < xs.length) {
      if (!seen.add(xs(i))) { count += 1; chars += xs(i).length }
      i += 1
    }
    (count, chars)
  }

  /** Chars of the most frequent n-gram × its count (0 unless count ≥ 2);
    * ties to the gram attaining the count first in scan order. */
  private def topGramChars(words: Array[String], n: Int): Double = {
    if (words.length < n) return 0.0
    val counts = new java.util.HashMap[String, Int]()
    var bestCount = 1 // require >= 2: start the bar at 1
    var bestChars = 0
    var i = 0
    val limit = words.length - n
    while (i <= limit) {
      val g = gram(words, i, n)
      val c = counts.merge(g, 1, Integer.sum)
      if (c > bestCount) { bestCount = c; bestChars = g.length }
      i += 1
    }
    if (bestCount >= 2) bestChars.toDouble * bestCount else 0.0
  }

  /** Greedy non-overlapping duplicated-n-gram character count. */
  private def dupGramChars(words: Array[String], n: Int): Double = {
    if (words.length < n) return 0.0
    val seen = new java.util.HashSet[String]()
    var chars = 0L
    var i = 0
    val limit = words.length - n
    while (i <= limit) {
      val g = gram(words, i, n)
      if (seen.add(g)) i += 1
      else { chars += g.length; i += n }
    }
    chars.toDouble
  }

  private def gram(words: Array[String], start: Int, n: Int): String = {
    val sb = new java.lang.StringBuilder
    var j = start
    while (j < start + n) {
      if (j > start) sb.append(' ')
      sb.append(words(j))
      j += 1
    }
    sb.toString
  }

  /** Mirror of `Dedup.normalizeText` + split: lowercase, collapse
    * whitespace runs, trim, split on the single spaces. */
  private[functions] def normalizedWords(s: String): Array[String] = {
    val sb = new java.lang.StringBuilder(s.length)
    var lastSpace = true
    var i = 0
    while (i < s.length) {
      val c0 = s.charAt(i)
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar
        else Character.toLowerCase(c0)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\u000b' ||
          c == '\f' || c == '\r') {
        if (!lastSpace) { sb.append(' '); lastSpace = true }
      } else { sb.append(c); lastSpace = false }
      i += 1
    }
    var end = sb.length
    while (end > 0 && sb.charAt(end - 1) == ' ') end -= 1
    val norm = sb.substring(0, end)
    if (norm.isEmpty) Array.empty else norm.split(" ")
  }
}
