package graft.llm

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec

/** Property tests for the round-7 web/packing operators: the
  * canonicalization and cleaning transforms are IDEMPOTENT (a second
  * application is a no-op — the defining property of a normal form),
  * and distributed greedy packing matches the sequential reference on
  * arbitrary token streams. */
class WebPackPropSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, minTests: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, s"property failed: ${res.status}")
  }

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("https://", "http://", "HTTPS://", "")
    host <- Gen.oneOf("Example.COM", "a.b.example", "H.example")
    path <- Gen.oneOf("", "/", "/Path", "/a/b", "/a/b/")
    q <- Gen.oneOf("", "?id=1", "?utm_source=x", "?utm_a=1&id=2",
      "?id=1&fbclid=z", "?utm_a=1&utm_b=2", "?reftest=1")
    frag <- Gen.oneOf("", "#frag", "#")
  } yield s"$scheme$host$path$q$frag"

  test("property: canonicalizeUrl is idempotent") {
    // batch the sampled URLs into ONE Spark job per property pass
    check(Prop.forAll(Gen.listOfN(30, urlGen)) { urls =>
      urls.isEmpty || {
        val once = urls.toDF("u")
          .select(UrlOps.canonicalizeUrl(col("u"))).as[String].collect()
        val twice = once.toSeq.toDF("u")
          .select(UrlOps.canonicalizeUrl(col("u"))).as[String].collect()
        once.toSeq == twice.toSeq
      }
    }, minTests = 5)
  }

  private val lineGen: Gen[String] = Gen.oneOf(
    "this line has enough words to survive.",
    "short.",
    "no terminal punctuation at all here",
    "please enable javascript to continue reading.",
    "is this one long enough to keep?",
    "bullet point fragment",
    "")
  private val pageGen: Gen[String] =
    Gen.listOfN(6, lineGen).map(_.mkString("\n"))

  test("property: c4CleanLines is idempotent") {
    check(Prop.forAll(Gen.listOfN(20, pageGen)) { pages =>
      pages.isEmpty || {
        val once = pages.toDF("p")
          .select(TextAnalysis.c4CleanLines(col("p"))).as[String].collect()
        val twice = once.toSeq.toDF("p")
          .select(TextAnalysis.c4CleanLines(col("p"))).as[String].collect()
        once.toSeq == twice.toSeq
      }
    }, minTests = 5)
  }

  /** Sequential first-fit reference (duplicated from PackingSpec's
    * greedyRef on purpose: two independent statements of the rule). */
  private def greedyRef(tokens: Seq[Long], budget: Long): Seq[Int] = {
    var local = 0; var running = 0L
    tokens.map { t =>
      if (t > budget) {
        if (running > 0) local += 1
        val e = local; local += 1; running = 0L; e
      } else if (running > 0 && running + t > budget) {
        local += 1; running = t; local
      } else { running += t; local }
    }
  }

  test("property: packGreedy single-group == sequential reference on random streams") {
    val tokensGen = Gen.listOfN(40, Gen.chooseNum(0L, 15L))
    check(Prop.forAll(tokensGen) { toks =>
      toks.isEmpty || {
        val docs = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "t")
        val got = Packing.packGreedy(docs, "doc_id", col("t"),
            budget = 10, docsPerGroup = 1000)
          .orderBy("doc_id").select("pack_id").as[Long].collect().toSeq
        got == greedyRef(toks, 10).map(_.toLong)
      }
    }, minTests = 8)
  }

  test("property: bucketedPackGreedy invariants on random streams") {
    // for ANY token-length stream, bucket count, and group size:
    // conservation (every doc exactly once, mass intact), in-bucket
    // packs only, dense pack ids, budget respected for non-oversize
    // packs, and determinism under repartitioning
    val streamGen = for {
      n <- Gen.choose(1, 120)
      toks <- Gen.listOfN(n, Gen.choose(1L, 30L))
      nBuckets <- Gen.choose(1, 6)
      grp <- Gen.oneOf(3, 7, 64)
    } yield (toks, nBuckets, grp)
    check(Prop.forAll(streamGen) { case (toks, nBuckets, grp) =>
      val df = toks.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "t")
      val out = Packing.bucketedPackGreedy(df, "doc_id", col("t"),
        nBuckets = nBuckets, budget = 20, docsPerGroup = grp)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("bucket"), r.getAs[Long]("pack_id"),
          r.getAs[Boolean]("oversize")))
      val conserved = out.map(_._1).sorted.toSeq == toks.indices.map(_.toLong) &&
        out.map(_._2).sum == toks.sum
      val inBucket = out.groupBy(_._4).values
        .forall(rows => rows.map(_._3).distinct.length == 1)
      val ids = out.map(_._4).distinct.sorted
      val dense = ids.isEmpty || (ids.head == 0L && ids.last == ids.length - 1)
      val budgetOk = out.groupBy(_._4).values.forall { rows =>
        rows.exists(_._5) || rows.map(_._2).sum <= 20
      }
      val again = Packing.bucketedPackGreedy(df.repartition(5), "doc_id",
        col("t"), nBuckets = nBuckets, budget = 20, docsPerGroup = grp)
        .orderBy("doc_id").collect().map(_.toSeq)
      val deterministic =
        out.sortBy(_._1).map(r => Seq(r._1, r._2, r._3, r._4, r._5)).toSeq ==
          again.toSeq.map(_.toSeq)
      conserved && inBucket && dense && budgetOk && deterministic
    }, minTests = 8)
  }
}
