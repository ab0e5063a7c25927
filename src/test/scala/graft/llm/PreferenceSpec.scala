package graft.llm

import graft.SparkSpec

/** Preference-pair prep ([[Preference]]): hand-computed verdicts,
  * dedup normalization, bias arithmetic, template render. */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: (Long, String, String, String, String)*) =
    rows.toDF("pair_id", "source", "prompt", "chosen", "rejected")

  test("validatePairs: first-failure reasons in fixed order") {
    val df = pairs(
      (1L, "a", "q", "good", "bad"),
      (2L, "a", "", "good", "bad"),
      (3L, "a", "q", "", "bad"),
      (4L, "a", "q", "good", ""),
      // tie modulo case/whitespace
      (5L, "a", "q", "Same  answer", "same answer "),
      // empty prompt wins over the tie it also has
      (6L, "a", "", "x", "x"))
    val got = Preference.validatePairs(df)
      .select("pair_id", "ok", "reason")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), Option(r.getString(2)))).toMap
    assert(got(1L) == (true, None))
    assert(got(2L) == (false, Some("empty_prompt")))
    assert(got(3L) == (false, Some("empty_side")))
    assert(got(4L) == (false, Some("empty_side")))
    assert(got(5L) == (false, Some("tie")))
    assert(got(6L) == (false, Some("empty_prompt")))
  }

  test("dedupPairs collapses normalized triples, keeps lowest id") {
    val df = pairs(
      (1L, "a", "Q one", "yes", "no"),
      (2L, "b", " q  ONE ", "Yes", "NO"), // dup of 1
      (3L, "a", "q one", "yes", "maybe")) // rejected differs
    val kept = Preference.dedupPairs(df)
      .select("pair_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("lengthBias: exact sums, gap and fraction") {
    val df = pairs(
      (1L, "s", "q", "aaaa", "aa"),   // chosen longer by 2
      (2L, "s", "q", "bb", "bbbb"),   // rejected longer by 2
      (3L, "s", "q", "ccc", "c"))     // chosen longer by 2
    val r = Preference.lengthBias(df).collect().head
    assert(r.getLong(1) == 3L)            // n_pairs
    assert(r.getLong(2) == 9L)            // chosen_len_sum
    assert(r.getLong(3) == 7L)            // rejected_len_sum
    assert(r.getDouble(4) == 2.0 / 3.0)   // mean_len_gap
    assert(r.getDouble(5) == 2.0 / 3.0)   // chosen_longer_frac
  }

  test("renderPairs emits both texts under the shared template") {
    val df = pairs((1L, "s", "q", "win", "lose"))
    val r = Preference.renderPairs(df)
      .select("text_chosen", "text_rejected").collect().head
    assert(r.getString(0) == "<|user|>q<|end|><|assistant|>win<|end|>")
    assert(r.getString(1) == "<|user|>q<|end|><|assistant|>lose<|end|>")
  }
}
