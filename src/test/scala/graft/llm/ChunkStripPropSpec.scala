package graft.llm

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec

/** Property tests for the round-4 text operators against driver-side
  * brute-force oracles: chunking coverage/shape invariants for
  * arbitrary (n_tokens, chunk, stride), and repeated-line stripping vs
  * a literal recount — shapes the example specs can't enumerate. */
class ChunkStripPropSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, minTests: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("chunkByTokens: coverage, monotonic ids, end reach, count formula") {
    val gen = for {
      n <- Gen.choose(1, 40)
      c <- Gen.choose(1, 8)
      s <- Gen.choose(1, c)
    } yield (n, c, s)
    val prop = Prop.forAll(gen) { case (n, c, s) =>
      val text = (0 until n).map(i => s"t$i").mkString(" ")
      val chunks = TextAnalysis.chunkByTokens(
          Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", c, s)
        .as[(Long, Long, String, Long)].collect().sortBy(_._2)
      val m = chunks.length
      val expectedM = 1 + math.max(0, (n - c + s - 1) / s)
      val idsOk = chunks.map(_._2).toSeq == (0L until m.toLong)
      // every chunk is the exact slice at its start offset
      val slicesOk = chunks.forall { case (_, id, chunk, len) =>
        val start = id.toInt * s
        val want = (start until math.min(start + c, n)).map(i => s"t$i")
        chunk == want.mkString(" ") && len == want.length
      }
      // the last chunk reaches the end of the document
      val endOk = chunks.last._2.toInt * s + chunks.last._4 == n
      m == expectedM && idsOk && slicesOk && endOk
    }
    check(prop, 50)
  }

  test("stripRepeatedLines matches a brute-force recount on random corpora") {
    val linePool = Vector("alpha", "beta", "gamma", "", "x y", "BOILER", "tail")
    val genDocs = for {
      nDocs <- Gen.choose(1, 10)
      docs <- Gen.listOfN(nDocs,
        Gen.choose(0, 5).flatMap(k =>
          Gen.listOfN(k, Gen.choose(0, linePool.size - 1))))
    } yield docs.zipWithIndex.map { case (ids, i) =>
      (i.toLong, ids.map(linePool).mkString("\n"))
    }
    val prop = Prop.forAll(genDocs, Gen.choose(2, 4)) { (docs, minDocs) =>
      // brute force: lines (len >= 1) in >= minDocs distinct docs
      val rep = docs.flatMap { case (id, t) => t.split("\n", -1).map(id -> _) }
        .filter(_._2.nonEmpty).distinct
        .groupBy(_._2).collect { case (l, xs) if xs.size >= minDocs => l }.toSet
      val expected = docs.map { case (id, t) =>
        id -> t.split("\n", -1).filterNot(rep).mkString("\n")
      }.toMap
      val got = Dedup.stripRepeatedLines(
          docs.toDF("doc_id", "text"), "doc_id", "text", minDocs)
        .as[(Long, String)].collect().toMap
      got == expected
    }
    check(prop, 40)
  }

  test("stripDuplicateSpans matches a brute-force mark-and-cover oracle") {
    // small token alphabet (mixed case to exercise the lowercased key)
    // forces duplicated k-grams, overlapping spans, and full coverage
    val tokPool = Vector("a", "B", "c", "d", "E")
    val genDocs = for {
      nDocs <- Gen.choose(1, 8)
      docs <- Gen.listOfN(nDocs,
        Gen.choose(0, 12).flatMap(k =>
          Gen.listOfN(k, Gen.choose(0, tokPool.size - 1))))
    } yield docs.zipWithIndex.map { case (ids, i) =>
      (i.toLong, ids.map(tokPool).mkString(" "))
    }
    val prop = Prop.forAll(genDocs, Gen.choose(2, 3), Gen.choose(2, 4)) {
      (docs, k, minDocs) =>
        def toks(t: String): Array[String] =
          t.trim.split("\\s+") // "" -> Array("") — one empty token
        // brute-force census on lowercased grams
        val allGrams = docs.flatMap { case (id, t) =>
          val w = toks(t)
          (0 to w.length - k).map(p =>
            (id, w.slice(p, p + k).mkString(" ").toLowerCase))
        }
        val dup = allGrams.distinct.groupBy(_._2)
          .collect { case (g, xs) if xs.size >= minDocs => g }.toSet
        val expected = docs.map { case (id, t) =>
          val w = toks(t)
          val starts = (0 to w.length - k)
            .filter(p => dup(w.slice(p, p + k).mkString(" ").toLowerCase))
          val covered = starts.flatMap(p => p until p + k).toSet
          id -> w.indices.filterNot(covered).map(w).mkString(" ")
        }.toMap
        val got = Dedup.stripDuplicateSpans(
            docs.toDF("doc_id", "text"), "doc_id", "text", k, minDocs)
          .as[(Long, String)].collect().toMap
        got == expected
    }
    check(prop, 40)
  }
}
