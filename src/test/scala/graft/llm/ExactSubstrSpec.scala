package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[ExactSubstr]] — variable-length exact substring dedup. The load-
  * bearing tests are the two fixed-k-census counterexamples this
  * operator exists to fix:
  *   1. an L-token shared run is found at ANY alignment offset (the
  *      run occupies different positions in each doc), with exact
  *      boundaries;
  *   2. a shared run of L−1 tokens is INVISIBLE (no duplicated
  *      L-window fits inside it), however rare its boundaries;
  *   3. a short gram repeated in many documents never triggers,
  *      however popular.
  * Plus: within-doc self-repeats count toward minOcc, touching covers
  * merge into one maximal run, strip removes exactly the covered
  * tokens from all copies, and the rolling gram hash matches a direct
  * per-window recompute. */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  private def uniq(tag: String, n: Int, from: Int = 0): Seq[String] =
    (from until from + n).map(i => s"$tag$i")

  private val RUN = (0 until 20).map(i => s"shared$i") // the planted L-run

  test("planted L-token run found at ANY alignment, exact boundaries") {
    // doc 1: run at pos 5; doc 2: run at pos 13 — different alignments,
    // unique filler everywhere else (rare boundaries)
    val d1 = (uniq("a", 5) ++ RUN ++ uniq("b", 7)).mkString(" ")
    val d2 = (uniq("c", 13) ++ RUN ++ uniq("d", 3)).mkString(" ")
    val df = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val runs = ExactSubstr.duplicateRuns(df, "doc_id", "text", L = 20)
      .orderBy("doc_id").collect()
    assert(runs.map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSeq == Seq((1L, 5, 24, 20), (2L, 13, 32, 20)))
  }

  test("L-1-token shared run with rare boundaries is invisible (contract)") {
    val run19 = RUN.take(19)
    val d1 = (uniq("a", 6) ++ run19 ++ uniq("b", 8)).mkString(" ")
    val d2 = (uniq("c", 9) ++ run19 ++ uniq("d", 5)).mkString(" ")
    val df = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    assert(ExactSubstr.duplicateRuns(df, "doc_id", "text", L = 20).isEmpty)
  }

  test("popular short gram inside unique text never over-triggers") {
    // the same 8-gram planted in 10 otherwise-unique docs — the fixed-k
    // census (k=8, minDocs=2) fires on every copy; ≥L semantics: silence
    val gram8 = (0 until 8).map(i => s"pop$i")
    val df = (1 to 10).map { d =>
      (d.toLong, (uniq(s"u${d}x", 10) ++ gram8 ++ uniq(s"u${d}y", 10)).mkString(" "))
    }.toDF("doc_id", "text")
    assert(ExactSubstr.duplicateRuns(df, "doc_id", "text", L = 20).isEmpty)
    val fixedK = Dedup.duplicateSpans(df, "doc_id", "text", k = 8, minDocs = 2)
    assert(fixedK.count() == 1) // the counterexample this family documents
  }

  test("within-doc self-repeat counts toward minOcc; touching runs merge") {
    // one doc, run at pos 0 and again at pos 20 (touching): the union
    // cover [0,39] merges into ONE maximal run of 40 tokens
    val d = (RUN ++ RUN ++ uniq("z", 6)).mkString(" ")
    val df = Seq((7L, d)).toDF("doc_id", "text")
    val runs = ExactSubstr.duplicateRuns(df, "doc_id", "text", L = 20).collect()
    assert(runs.map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSeq == Seq((7L, 0, 39, 40)))
  }

  test("strip removes exactly the covered tokens from all copies") {
    val d1 = (uniq("a", 3) ++ RUN ++ uniq("b", 2)).mkString(" ")
    val d2 = (RUN ++ uniq("c", 4)).mkString(" ")
    val d3 = uniq("e", 9).mkString(" ") // untouched bystander
    val df = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val out = ExactSubstr.stripDuplicateRuns(df, "doc_id", "text", L = 20)
    assert(rowsOf(out) == Set(
      s"[1,${(uniq("a", 3) ++ uniq("b", 2)).mkString(" ")}]",
      s"[2,${uniq("c", 4).mkString(" ")}]",
      s"[3,${uniq("e", 9).mkString(" ")}]"))
  }

  test("matching is case- and whitespace-insensitive, original form kept") {
    val d1 = (uniq("a", 2) ++ RUN.map(_.toUpperCase)).mkString("  ")
    val d2 = (RUN ++ uniq("b", 2)).mkString(" ")
    val df = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val runs = ExactSubstr.duplicateRuns(df, "doc_id", "text", L = 20)
      .orderBy("doc_id").collect()
    assert(runs.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 2), (2L, 0)))
    val out = ExactSubstr.stripDuplicateRuns(df, "doc_id", "text", L = 20)
    assert(rowsOf(out) == Set(
      s"[1,${uniq("a", 2).mkString(" ")}]",
      s"[2,${uniq("b", 2).mkString(" ")}]"))
  }

  test("rolling gram hash = direct per-window recompute (native, codegen)") {
    graft.plans.GraftExtensions.register(spark)
    val texts = Seq("the quick brown fox jumps over the lazy dog today",
      "a b a b a b a b a b", "  Mixed  CASE  and   runs of WS here x ")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val k = 3
    val rolled = df.select(col("doc_id"),
      call_function("graft_gram_hashes", col("text"), lit(k), lit(1L)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // direct recompute: per-window polynomial over token hashes
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      val direct = toks.sliding(k).filter(_.length == k).map { w =>
        w.map(graft.plans.GramHash.tokenHashForTest(_, 1L))
          .foldLeft(0L)((acc, th) => acc * graft.plans.GramHash.BForTest + th)
      }.toSeq
      val want = if (toks.length < k) Seq.empty[Long] else direct
      assert(rolled(i.toLong) == want, s"doc $i")
    }
    // codegen compiles (no interpreted fallback): force a projection
    val n = df.select(call_function("graft_gram_hashes", col("text"),
      lit(k), lit(2L)).as("h")).selectExpr("size(h)").collect()
    assert(n.map(_.getInt(0)).sum > 0)
  }

  test("short and null docs: no grams; strip keeps every row") {
    val df = Seq((1L, "only three tokens"), (2L, null.asInstanceOf[String]),
      (3L, "")).toDF("doc_id", "text")
    assert(ExactSubstr.duplicateRuns(df, "doc_id", "text", L = 20).isEmpty)
    val out = ExactSubstr.stripDuplicateRuns(df, "doc_id", "text", L = 20)
    assert(out.count() == 3)
    assert(rowsOf(out) == Set("[1,only three tokens]", "[2,]", "[3,]"))
  }
}
