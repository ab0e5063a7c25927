package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def statsMap(text: String): Map[String, Double] =
    Repetition.fieldNames.zip(Repetition.stats(text)).toMap

  test("duplicate line / paragraph fractions, count and char weighted") {
    val m = statsMap("a\na\nb")
    assert(m("dup_line_frac") == 1.0 / 3)
    assert(m("dup_line_char_frac") == 1.0 / 5) // the second 'a' over 5 raw chars
    assert(m("dup_para_frac") == 0.0)
    val p = statsMap("p one\n\np one\n\np two")
    assert(p("dup_para_frac") == 1.0 / 3)
    assert(p("dup_para_char_frac") == 5.0 / 19)
    // blank separator lines are elements too: the repeated paragraph
    // AND the second blank line both count (2 of 5)
    assert(p("dup_line_frac") == 2.0 / 5)
  }

  test("top n-gram char fraction: most frequent gram, count >= 2, scan-order ties") {
    val m = statsMap("x y x y x y")
    // (x y) x3 beats (y x) x2; chars 3 * len("x y") = 9 over norm len 11
    assert(m("top_2gram_char_frac") == 9.0 / 11)
    // no repeated 3-gram reaching count 2? (x y x) x2 actually:
    // grams: (x y x)(y x y)(x y x)(y x y) -> both reach 2; first to
    // ATTAIN 2 in scan order is (x y x) at index 2; chars 2*5
    assert(m("top_3gram_char_frac") == 10.0 / 11)
    // a single occurrence never counts
    assert(statsMap("a b c d")("top_2gram_char_frac") == 0.0)
  }

  test("duplicate n-gram char fraction: greedy non-overlapping walk") {
    // [a b c d e] x3 + unique tail; the walk hits the repeat at idx 5
    // and 10, jumping 5 each time: 2 * len("a b c d e") = 18
    val text = "a b c d e a b c d e a b c d e u v w x y"
    val m = statsMap(text)
    assert(m("dup_5gram_char_frac") == 18.0 / 39)
    // shorter-than-n texts are 0
    assert(statsMap("a b c")("dup_5gram_char_frac") == 0.0)
    // degenerate single-word repetition: (a a a a a) walk covers
    // floor((20-5)/5)+... greedy: add idx0, repeat at 1? seen -> jump
    val deg = statsMap(("a " * 20).trim)
    assert(deg("dup_5gram_char_frac") > 0.3)
  }

  test("empty / null / whitespace-only inputs") {
    assert(Repetition.stats(null) == null)
    assert(Repetition.stats("").forall(_ == 0.0))
    assert(Repetition.stats("   \n  ").forall(_ == 0.0))
  }

  test("the oracle fixture page: every constant the query states") {
    // the same derivation repetition_stats uses; doc_id = 42
    val L = "alpha beta gamma delta echo"
    val tail = "tail u42a u42b u42c u42d."
    val page = s"$L\n$L\n$L\n\n$tail"
    val m = statsMap(page)
    val normLen = (s"$L $L $L $tail").length.toDouble
    val rawLen = page.length.toDouble
    assert(m("dup_line_frac") == 2.0 / 5)
    assert(m("dup_para_frac") == 0.0)
    assert(m("dup_line_char_frac") == 54.0 / rawLen)
    assert(m("dup_para_char_frac") == 0.0)
    assert(m("top_2gram_char_frac") == 30.0 / normLen)
    assert(m("top_3gram_char_frac") == 48.0 / normLen)
    assert(m("top_4gram_char_frac") == 66.0 / normLen)
    assert(m("dup_5gram_char_frac") == 54.0 / normLen)
    assert(m("dup_6gram_char_frac") == 33.0 / normLen)
    assert(m("dup_7gram_char_frac") == 38.0 / normLen)
    assert(m("dup_8gram_char_frac") == 44.0 / normLen)
    assert(m("dup_9gram_char_frac") == 50.0 / normLen)
    assert(m("dup_10gram_char_frac") == 55.0 / normLen)
  }

  test("repetitionOk: published thresholds, each violable on its own") {
    graft.plans.GraftExtensions.register(spark)
    def keep(text: String, over: Map[String, Double] = Map.empty): Boolean =
      Seq(text).toDF("t")
        .select(graft.llm.TextAnalysis.repetitionOk(
          graft.llm.TextAnalysis.repetitionStatsFull(col("t")), over))
        .as[Boolean].collect().head
    val prose = (1 to 40).map(i => s"w$i").mkString(" ")
    assert(keep(prose))
    // dup_line_frac > 0.30: 2 of 4 lines repeated
    assert(!keep("same line\nsame line\nother one\nlast line"))
    // top_2gram_char_frac > 0.20
    assert(!keep("spark rocks spark rocks spark rocks " + prose.take(20)))
    // overrides loosen a single rule
    assert(keep("same line\nsame line\nother one\nlast line",
      over = Map("dup_line_frac" -> 0.6, "dup_line_char_frac" -> 0.9,
        "top_2gram_char_frac" -> 1.0, "top_3gram_char_frac" -> 1.0,
        "top_4gram_char_frac" -> 1.0)))
  }

  test("column form matches the kernel and stays native") {
    graft.plans.GraftExtensions.register(spark)
    val texts = Seq("a\na\nb", "x y x y x y", "", "alpha beta gamma")
    val df = texts.toDF("t").select(
      graft.llm.TextAnalysis.repetitionStatsFull(col("t")).as("r"))
    val rows = df.collect()
    texts.zip(rows).foreach { case (t, row) =>
      val s = row.getStruct(0)
      val expect = Repetition.stats(t)
      Repetition.fieldNames.zipWithIndex.foreach { case (_, i) =>
        assert(s.getDouble(i) == expect(i), s"text=$t field=$i")
      }
    }
    assert(!df.queryExecution.executedPlan.toString.contains("UDF"))
  }
}
