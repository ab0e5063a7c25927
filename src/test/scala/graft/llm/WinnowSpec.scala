package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Winnowing fingerprints ([[Winnow]]): selection mechanics, the
  * published coverage guarantee, and near-dup pair detection. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprints: deterministic, repartition-invariant, positions valid") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    val a = Winnow.fingerprints(df, "doc_id", "text")
    val b = Winnow.fingerprints(df.repartition(7), "doc_id", "text")
    assert(rowsOf(a) == rowsOf(b))
    val bad = a.where(col("pos") < 0 ||
      col("fp_hash") < 0 || col("fp_hash") > 4294967295L).count()
    assert(bad == 0)
  }

  test("guarantee: a shared run of >= w+k-1 words yields a shared fingerprint") {
    // k=4, w=4 -> any shared 7-word run must contribute >= 1 identical
    // fingerprint to both docs. Build docs agreeing ONLY on a 7-word run.
    val shared = "alpha bravo charlie delta echo foxtrot golf"
    val df = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven eight nine ten $shared eleven twelve")).toDF("doc_id", "text")
    val fp = Winnow.fingerprints(df, "doc_id", "text")
      .select("doc_id", "fp_hash").distinct()
    val common = fp.where(col("doc_id") === 1).select("fp_hash")
      .intersect(fp.where(col("doc_id") === 2).select("fp_hash"))
    assert(common.count() >= 1)
  }

  test("rightmost-min tie rule: repeated grams select the latest position") {
    // one doc of one repeated word: every gram identical -> every window
    // min is the same hash; rightmost rule keeps the LAST window's tail
    val df = Seq((1L, Seq.fill(10)("rep").mkString(" "))).toDF("doc_id", "text")
    val fps = Winnow.fingerprints(df, "doc_id", "text").collect()
    // 7 grams, 4 windows, all the same hash: each window's rightmost
    // min is a NEW occurrence (pos 3,4,5,6) — winnowing records each
    // occurrence, so 4 fingerprints sharing one hash
    assert(fps.map(_.getLong(1)).sorted.sameElements(Array(3L, 4L, 5L, 6L)))
    assert(fps.map(_.getLong(2)).distinct.length == 1)
  }

  test("short docs (< k words) fingerprint their joined form") {
    val df = Seq((1L, "tiny doc"), (2L, "tiny doc"), (3L, "other text"))
      .toDF("doc_id", "text")
    val fp = Winnow.fingerprints(df, "doc_id", "text")
    assert(fp.count() == 3)
    val hashes = fp.select("doc_id", "fp_hash").as[(Long, Long)]
      .collect().toMap
    assert(hashes(1L) == hashes(2L) && hashes(1L) != hashes(3L))
  }

  test("native graft_winnow_fps is bit-identical to the builtin composition") {
    graft.plans.GraftExtensions.register(spark)
    val docs = (Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "short doc"),
      (3L, ""),
      (4L, "  Tabs\tAnd\nNewlines   collapse  here  like THIS  "),
      (5L, "w x y z"), // exactly k words -> one gram, < w windows
      (6L, "a a a a a a a a a a") // repeated grams exercise ties
    ) ++ (0 until 50).map(i =>
      (100L + i, s"filler words number $i repeat some shared tail content " * 3)))
      .toDF("doc_id", "text")
    val builtin = docs.select(col("doc_id"),
      Winnow.fingerprintArray(col("text")).as("fps"))
    val native = docs.select(col("doc_id"),
      Winnow.fingerprintArrayNative(col("text")).as("fps"))
    assert(rowsOf(builtin) == rowsOf(native))
    // and across the corpus fixture
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(rowsOf(corpus.select(col("doc_id"),
        Winnow.fingerprintArray(col("text")).as("fps"))) ==
      rowsOf(corpus.select(col("doc_id"),
        Winnow.fingerprintArrayNative(col("text")).as("fps"))))
  }

  test("nearDupSpans equals the two-stage nearDupPairs + overlapSpans") {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(200)
    val planted = base.select((col("doc_id") + 100000L).as("doc_id"),
      concat(lit("zq qz "), col("text")).as("text"))
    val corpus = base.unionByName(planted)
    val pairs = Winnow.nearDupPairs(corpus, "doc_id", "text", minShared = 3)
    val twoStage = Winnow.overlapSpans(corpus, "doc_id", "text", pairs)
    val fused = Winnow.nearDupSpans(corpus, "doc_id", "text", minShared = 3)
    assert(rowsOf(twoStage) == rowsOf(fused))
  }

  test("nearDupPairs: planted perturbed copies are found, disjoint docs are not") {
    // synthetic corpus with NO cross-doc vocabulary overlap (testdata
    // documents contain genuine near-dups — found while writing this
    // test — which make exact-set assertions corpus-dependent)
    val base = (1 to 30).map { i =>
      (i.toLong, (1 to 20).map(j => s"a${i}b$j").mkString(" "))
    }.toDF("doc_id", "text")
    val planted = base.select((col("doc_id") + 1000L).as("doc_id"),
      concat(lit("zq qz "), col("text")).as("text"))
    // minShared = 2: disjoint vocabularies cannot share even one
    // fingerprint, while a 20-word doc yields ~5-15 distinct
    // fingerprints of which the perturbed copy shares most (but can
    // dip below 5 when one small hash dominates many windows)
    val pairs = Winnow.nearDupPairs(base.union(planted), "doc_id", "text",
        minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (1 to 30).map(i => (i.toLong, i + 1000L)).toSet
    assert(pairs == expected)
  }

  test("overlapSpans localizes the copied region of a partial-overlap pair") {
    // doc 2 copies doc 1's TAIL (words 11-20) into its own head: the
    // matched envelope must sit late in doc 1 and early in doc 2
    val sharedRun = (11 to 20).map(i => s"s$i").mkString(" ")
    val df = Seq(
      (1L, (1 to 10).map(i => s"a$i").mkString(" ") + " " + sharedRun),
      (2L, sharedRun + " " + (1 to 10).map(i => s"b$i").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Winnow.nearDupPairs(df, "doc_id", "text", minShared = 1)
    val spans = Winnow.overlapSpans(df, "doc_id", "text", pairs).collect()
    assert(spans.length == 1)
    val r = spans.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L && r.getLong(2) >= 1L)
    // doc 1 has 17 grams (0-16), shared run is grams 10-16;
    // doc 2's copy sits at grams 0-6
    assert(r.getLong(3) >= 10L && r.getLong(4) <= 16L) // a-side envelope
    assert(r.getLong(5) >= 0L && r.getLong(6) <= 6L)   // b-side envelope
  }

  test("hot-fingerprint cap drops boilerplate buckets") {
    // 20 docs sharing one boilerplate sentence + unique tails: with
    // maxBucket below 20 the boilerplate fingerprints can't pair them
    val docs = (1 to 20).map { i =>
      (i.toLong, s"all rights reserved contact the webmaster for details " +
        s"unique$i tail$i words$i here$i now$i")
    }.toDF("doc_id", "text")
    val capped = Winnow.nearDupPairs(docs, "doc_id", "text",
      minShared = 2, maxBucket = 10)
    assert(capped.count() == 0)
    val uncapped = Winnow.nearDupPairs(docs, "doc_id", "text",
      minShared = 2, maxBucket = 100)
    assert(uncapped.count() > 0)
  }
}
