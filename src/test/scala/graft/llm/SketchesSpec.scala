package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // srcA and srcB share half their content; srcC is disjoint
    (1L, "A", "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "A", "pack my box with five dozen liquor jugs for the trip"),
    (3L, "B", "the quick brown fox jumps over the lazy dog tonight"),
    (4L, "B", "sphinx of black quartz judge my vow in the old museum"),
    (5L, "C", "completely different tokens live here apart from everything else")
  ).toDF("doc_id", "source", "text")

  test("groupSignatures: partitioning-invariant (mergeable aggregate)") {
    def sigs(parts: Int) =
      Sketches.groupSignatures(docs.repartition(parts), "source", "text")
        .as[(String, Seq[Long])].collect().toMap
    assert(sigs(1) == sigs(7))
  }

  test("groupSimilarity: identical groups estimate exactly 1.0") {
    val cloned = docs.unionByName(
      docs.where(col("source") === "A")
        .select(col("doc_id") + 100, lit("Z").as("source"), col("text"))
        .toDF("doc_id", "source", "text"))
    val est = Sketches.groupSimilarity(cloned, "source", "text")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(est(("A", "Z")) == 1.0)
  }

  test("groupSimilarity tracks groupJaccardExact within sketch error") {
    val est = Sketches.groupSimilarity(docs, "source", "text", k = 128)
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val exact = Sketches.groupJaccardExact(docs, "source", "text")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // A and B share one document of two -> jaccard ~ 1/3 of shingles
    assert(exact(("A", "B")) > 0.2 && exact(("A", "B")) < 0.6)
    // k=128 -> se ~ 0.044; allow 4 sigma
    assert(math.abs(est(("A", "B")) - exact(("A", "B"))) < 0.2)
    // the disjoint source never shares a signature position by more
    // than chance; exact inner join omits zero-overlap pairs entirely
    assert(!exact.contains(("A", "C")) || exact(("A", "C")) == 0.0)
    assert(est.getOrElse(("A", "C"), 0.0) < 0.15)
  }

  test("mergeSignatureFrames: merge(sig(A), sig(B)) == sig(A ∪ B) exactly") {
    // NOT planted copies — genuinely different halves of the corpus;
    // element-wise min associativity makes the equality exact despite
    // the seeded hashes
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text")).limit(200)
      .localCheckpoint(true)
    val a = docs.where(col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 2 =!= 0)
    def sigs(df: org.apache.spark.sql.DataFrame) =
      Sketches.groupSignatures(df, "source", "text")
    val merged = Sketches.mergeSignatureFrames(sigs(a), sigs(b))
      .as[(String, Seq[Long])].collect().toMap
    val full = sigs(docs).as[(String, Seq[Long])].collect().toMap
    assert(merged.keySet == full.keySet)
    full.foreach { case (g, sig) => assert(merged(g) == sig, s"group $g") }
    // a group present on only ONE side passes through unchanged
    val lone = Seq((1L, "onlyA", "some words here")).toDF("doc_id", "source", "text")
    val m2 = Sketches.mergeSignatureFrames(sigs(a), sigs(lone))
      .as[(String, Seq[Long])].collect().toMap
    val loneSig = sigs(lone).as[(String, Seq[Long])].collect().toMap
    assert(m2("onlyA") == loneSig("onlyA"))
    // k is part of the persisted-frame contract: frames built with
    // different numHashes must be rejected, not positionally merged
    // into malformed signatures
    intercept[IllegalArgumentException] {
      Sketches.mergeSignatureFrames(sigs(a),
        Sketches.groupSignatures(b, "source", "text", k = 32))
    }
  }
}
