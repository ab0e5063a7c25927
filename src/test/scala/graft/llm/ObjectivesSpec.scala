package graft.llm

import graft.SparkSpec

/** Span corruption ([[Objectives.spanCorrupt]]): the round-trip
  * invariant (input ∘ target reconstructs the document), density
  * determinism, and degenerate inputs. */
class ObjectivesSpec extends SparkSpec {
  import spark.implicits._

  test("input and target reconstruct the original document exactly") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").limit(50)
    val out = Objectives.spanCorrupt(docs, spanLen = 3, density = 0.25)
      .join(docs, "doc_id").collect()
    assert(out.nonEmpty)
    var sawMasked = false
    for (r <- out) {
      val (input, target, text) =
        (r.getString(3), r.getString(4), r.getString(5))
      // parse target into sentinel -> span
      val spans = "<extra_id_(\\d+)> ?".r.split(target).drop(1)
      val ks = "<extra_id_(\\d+)>".r.findAllMatchIn(target)
        .map(_.group(1).toInt).toSeq
      val m = ks.zip(spans.map(_.trim)).toMap
      if (m.nonEmpty) sawMasked = true
      val rebuilt = input.split(" ").filter(_.nonEmpty).toSeq.flatMap { t =>
        "<extra_id_(\\d+)>".r.findFirstMatchIn(t) match {
          case Some(g) =>
            m(g.group(1).toInt).split(" ").filter(_.nonEmpty).toSeq
          case None => Seq(t)
        }
      }
      val orig = text.trim.split("\\s+").filter(_.nonEmpty)
      assert(rebuilt.toSeq == orig.toSeq,
        s"doc ${r.getLong(0)}: round-trip mismatch")
      // sentinels dense from 0 in both input and target
      assert(ks == ks.indices.toSeq)
    }
    assert(sawMasked, "density 0.25 over 50 docs masked nothing")
  }

  test("determinism and the density dial") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").limit(100)
    def masked(density: Double): Long =
      Objectives.spanCorrupt(docs, density = density)
        .agg(org.apache.spark.sql.functions.sum("n_masked_spans"))
        .head().getLong(0)
    assert(masked(0.25) == masked(0.25)) // pure function of (id, salt)
    assert(masked(0.0) == 0L)
    assert(masked(1.0) > masked(0.25))
  }

  test("prefixLmSplit: prefix + continuation reconstruct the document") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").limit(50)
    val out = Objectives.prefixLmSplit(docs).join(docs, "doc_id").collect()
    for (r <- out) {
      val (n, sp) = (r.getLong(1), r.getLong(2))
      val joined = (r.getString(3) + " " + r.getString(4)).trim
      val orig = r.getString(5).trim.split("\\s+").filter(_.nonEmpty)
      assert(joined.split("\\s+").filter(_.nonEmpty).toSeq == orig.toSeq)
      assert(sp >= 1 || n < 2)
      assert(sp <= math.max(n - 1, n.min(1)) || n < 2)
    }
  }

  test("ul2Mixture: mode token matches the bucket, all three appear") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").limit(200)
    val out = Objectives.ul2Mixture(docs).collect()
    val byDen = out.groupBy(_.getString(1))
    assert(byDen.keySet == Set("R", "X", "S"),
      s"denoisers seen: ${byDen.keySet}")
    for (r <- out)
      assert(r.getString(3).startsWith(s"[${r.getString(1)}] "))
  }

  test("fimTransform: PSM segments reconstruct the doc; rate 0 is identity") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").limit(100)
    val out = Objectives.fimTransform(docs).join(
      docs.withColumnRenamed("text", "orig"), "doc_id").collect()
    assert(out.exists(_.getBoolean(1)) && out.exists(!_.getBoolean(1)))
    val seg = "<\\|fim_(pre|suf|mid)\\|>".r
    for (r <- out if r.getBoolean(1)) {
      val parts = seg.split(r.getString(2)).map(_.trim)
      // parts: "", pre, suf, mid — reassembled pre+mid+suf = original
      val rebuilt = (parts(1) + " " + parts(3) + " " + parts(2))
        .split("\\s+").filter(_.nonEmpty).toSeq
      val orig = r.getString(3).trim.split("\\s+").filter(_.nonEmpty).toSeq
      assert(rebuilt == orig, s"doc ${r.getLong(0)} FIM round-trip")
    }
    for (r <- out if !r.getBoolean(1))
      assert(r.getString(2) == r.getString(3))
    val id0 = Objectives.fimTransform(docs, rate = 0.0).collect()
    assert(id0.forall(!_.getBoolean(1)))
  }

  test("blank and empty docs produce empty pairs, not nulls") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "one two three four"))
      .toDF("doc_id", "text")
    val out = Objectives.spanCorrupt(docs, density = 1.0).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(3),
        r.getString(4))).toMap
    assert(out(1L) == ((0L, "", "")))
    assert(out(2L) == ((0L, "", "")))
    // density 1: everything masked, input is only sentinels
    assert(out(3L)._2 == "<extra_id_0> <extra_id_1>")
    assert(out(3L)._3 == "<extra_id_0> one two three <extra_id_1> four")
  }
}
