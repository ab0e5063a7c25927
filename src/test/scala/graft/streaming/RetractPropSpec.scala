package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec

/** Property tests for the retraction arithmetic on random corpora and
  * random takedown sets — shapes the example specs can't enumerate:
  * retract sets straddling pack boundaries, retracting the first/last
  * doc of the stream, oversize docs spanning packs, empty and
  * everything sets.
  *
  *  - scrub leaves EXACTLY the survivor rows, byte-identical (holes);
  *  - scrub → unretract is the identity on the assignment;
  *  - repack-retract ≡ seeding without the retracted docs.
  */
class RetractPropSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, minTests: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, s"property failed: ${res.status}")
  }

  /** (doc_id, n_tokens) corpus + a random retraction subset (which may
    * be empty, everything, or include never-ingested ids). */
  private val caseGen: Gen[(Seq[(Long, Long)], Set[Long])] = for {
    n <- Gen.chooseNum(1, 22)
    toks <- Gen.listOfN(n, Gen.chooseNum(1L, 15L))
    sub <- Gen.someOf(1L to n.toLong)
    stranger <- Gen.oneOf(Seq.empty[Long], Seq(999L)) // no-op id
  } yield ((1L to n.toLong).zip(toks), sub.toSet ++ stranger)

  private def assignRows(path: String): Set[(Long, Long, Long, Long)] =
    spark.read.parquet(path)
      .select("doc_id", "n_tokens", "token_offset", "pack_id")
      .as[(Long, Long, Long, Long)].collect().toSet

  test("property: scrub holes + unretract identity + repack == never-ingested") {
    val prop = Prop.forAll(caseGen) { case (docs, retractSet) =>
      val work = java.nio.file.Files
        .createTempDirectory("graft_rprop").toFile.getPath
      val df = docs.map { case (id, n) =>
        (id, Seq.fill(n.toInt)(s"w$id").mkString(" ")) }
        .toDF("doc_id", "text")
      val rdf = retractSet.toSeq.toDF("doc_id")
      // scrub leg
      IndexIngest.seedCuratedPack(df, s"$work/a", "doc_id", "text",
        budget = 7)
      val before = assignRows(s"$work/a/assign")
      IndexIngest.retractFromCuratedPack(spark, s"$work/a", rdf, "doc_id")
      val scrubbed = assignRows(s"$work/a/assign")
      val scrubOk = scrubbed == before.filterNot(r => retractSet(r._1))
      // unretract identity (skip when nothing was ever queued — the
      // no-history case fails loudly by contract)
      val restoredOk = if (before.exists(r => retractSet(r._1))) {
        IndexIngest.unretractFromCuratedPack(spark, s"$work/a", rdf,
          "doc_id")
        assignRows(s"$work/a/assign") == before
      } else true
      // repack leg ≡ fresh seed without the retracted docs
      IndexIngest.seedCuratedPack(df, s"$work/b", "doc_id", "text",
        budget = 7)
      IndexIngest.retractFromCuratedPack(spark, s"$work/b", rdf,
        "doc_id", repack = true, budget = 7)
      IndexIngest.seedCuratedPack(
        df.where(!org.apache.spark.sql.functions.col("doc_id")
          .isin(retractSet.toSeq: _*)),
        s"$work/c", "doc_id", "text", budget = 7)
      val repackOk =
        assignRows(s"$work/b/assign") == assignRows(s"$work/c/assign")
      scrubOk && restoredOk && repackOk
    }
    check(prop, 8)
  }

  /** The full takedown loop holds on ANY corpus and ANY takedown set
    * (including empty and everything): after retract → incremental
    * refresh, the shard-integrity audit reports every shard ok and the
    * compliance report is clean — the two read-only gates certify the
    * exact state the arithmetic invariants above prove. */
  test("property: retract -> refresh leaves audit and compliance clean") {
    import org.apache.spark.sql.functions.{col, filter, split, trim}
    val toks = filter(split(trim(col("text")), "\\s+"),
      w => w =!= "")
    val prop = Prop.forAll(caseGen) { case (docs, retractSet) =>
      val work = java.nio.file.Files
        .createTempDirectory("graft_rprop2").toFile.getPath
      val df = docs.map { case (id, n) =>
        (id, Seq.fill(n.toInt)(s"w$id").mkString(" ")) }
        .toDF("doc_id", "text")
      IndexIngest.seedCuratedPack(df, s"$work/led", "doc_id", "text",
        budget = 7)
      graft.llm.Packing.materializeShardsFromAssignment(spark,
        s"$work/led/assign", df, "doc_id", toks, s"$work/out",
        nShards = 3)
      IndexIngest.retractFromCuratedPack(spark, s"$work/led",
        retractSet.toSeq.toDF("doc_id"), "doc_id")
      graft.llm.Packing.refreshRetractedShards(spark, s"$work/led", df,
        "doc_id", toks, s"$work/out", nShards = 3)
      val audit = graft.llm.Packing.auditShards(spark, s"$work/out")
        .select("status").as[String].collect()
      val comply = IndexIngest.retractionCompliance(spark, s"$work/led",
          retractSet.toSeq.toDF("doc_id"), "doc_id")
        .select("aspect", "ok").as[(String, Boolean)].collect().toMap
      audit.forall(_ == "ok") && comply.values.forall(identity)
    }
    check(prop, 6)
  }
}
