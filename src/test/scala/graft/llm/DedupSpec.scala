package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val baseText = ("the quick brown fox jumps over the lazy dog " * 8).trim
  private val nearText = baseText.replace("lazy dog", "sleepy dog")
  private val otherText = ("completely different content about spark engines " * 8).trim

  private def docs = Seq(
    (1L, baseText), (2L, baseText.toUpperCase), // exact dup after normalize
    (3L, nearText), (4L, otherText)
  ).toDF("doc_id", "text")

  test("exactDedup keeps the min-id row per normalized-content group") {
    val kept = Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("exactDupGroups reports group sizes") {
    val g = Dedup.exactDupGroups(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_dupes")).toMap
    assert(g(1L) == 2L && g(3L) == 1L && g(4L) == 1L)
  }

  test("softDedupWeights: every row survives with 1/group-size weight") {
    val soft = Dedup.softDedupWeights(docs, "doc_id", "text")
    val byId = soft.select("doc_id", "dup_count", "weight")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, w) => id -> ((n, w)) }.toMap
    assert(byId.keySet == Set(1L, 2L, 3L, 4L)) // nobody dropped
    assert(byId(1L) == ((2L, 0.5)) && byId(2L) == ((2L, 0.5)))
    assert(byId(3L) == ((1L, 1.0)) && byId(4L) == ((1L, 1.0)))
    // per-group weights sum to ~1: the flattening property
    val sums = soft.groupBy(Dedup.normalizeText(col("text")))
      .agg(round(sum(col("weight")), 9).as("s"))
      .select("s").as[Double].collect()
    assert(sums.forall(_ == 1.0))
  }

  test("softDedupSample: uniques always survive; draw is deterministic") {
    val a = Dedup.softDedupSample(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val b = Dedup.softDedupSample(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)                  // same (key, salt) ⇒ same survivors
    assert(a.contains(3L) && a.contains(4L)) // weight-1 rows always kept
    // a different salt may draw a different dup-group survivor set but
    // still keeps every unique
    val c = Dedup.softDedupSample(docs, "doc_id", "text", salt = "other")
      .select("doc_id").as[Long].collect().toSet
    assert(c.contains(3L) && c.contains(4L))
  }

  test("weightedSample: rate 1 keeps all, rate 0 keeps none") {
    val all = Mixing.weightedSample(docs, "doc_id", lit(1.0)).count()
    val none = Mixing.weightedSample(docs, "doc_id", lit(0.0)).count()
    assert(all == 4L && none == 0L)
  }

  test("minhash near-dups finds the near pair, not the unrelated one") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L)) || pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("minhash est_jaccard approximates true jaccard for identical docs") {
    val est = Dedup.minhashCandidates(docs, "doc_id", "text")
      .where(col("a") === 1L && col("b") === 2L)
      .select("est_jaccard").as[Double].collect()
    assert(est.nonEmpty && est.head == 1.0) // identical after normalize
  }

  test("incremental minhash: batch matches corpus, corpus never self-pairs") {
    // corpus holds a near-dup pair (1,3) internally; the batch holds an
    // exact copy of doc 1 (id 10) and an unrelated doc (id 11)
    val corpus = docs
    val batch = Seq((10L, baseText), (11L, "nothing like anything here at all"))
      .toDF("doc_id", "text")
    val out = Dedup.minhashNearDupsAgainst(batch, corpus, "doc_id", "text",
        threshold = 0.5)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    // the copy matches its original (and its normalize-dup and near-dup)
    assert(out.contains((10L, 1L)))
    // unrelated batch doc matches nothing
    assert(!out.exists(_._1 == 11L))
    // every pair is batch-vs-corpus: the corpus-internal (1,3)/(1,2)
    // near-dups never appear — the corpus was not self-joined
    assert(out.forall { case (n, c) => n >= 10L && c < 10L })
  }

  test("incremental minhash: re-submitted id matches itself at jaccard 1") {
    val corpus = docs
    val batch = Seq((1L, baseText)).toDF("doc_id", "text")
    val out = Dedup.minhashNearDupsAgainst(batch, corpus, "doc_id", "text",
        threshold = 0.9)
      .where(col("corpus_id") === 1L)
      .select("new_id", "corpus_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(out.contains((1L, 1L, 1.0)))
  }

  test("simhash: identical docs hamming 0; near docs within 3 bits; pairs found") {
    val fps = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("jaccard of sets") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(Dedup.jaccard(col("x"), col("y"))).as[Double].head()
    assert(math.abs(j - 0.5) < 1e-12)
  }

  test("ngramJaccardPairs blocks by key and respects threshold") {
    val d = Seq((1L, "k", baseText), (2L, "k", nearText), (3L, "other", baseText))
      .toDF("doc_id", "blk", "text")
    val pairs = Dedup.ngramJaccardPairs(d, "doc_id", "text",
        blockCols = Seq(col("blk")), n = 1, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // (1,3) share text but are in different blocks -> excluded by design
    assert(pairs == Set((1L, 2L)))
  }

  test("contaminated flags docs sharing n-grams with the benchmark only") {
    val corpus = Seq((1L, baseText), (2L, otherText), (3L, nearText))
      .toDF("doc_id", "text")
    val benchmark = Seq((100L, baseText)).toDF("doc_id", "text")
    val flagged = Dedup.contaminated(corpus, benchmark, "doc_id", "text", n = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(flagged.contains(1L))        // identical to benchmark doc
    assert(!flagged.contains(2L))       // disjoint content
    assert(flagged.contains(3L))        // shares most 8-grams
  }

  test("decontaminate drops exactly the contaminated docs, keeping full rows") {
    val corpus = Seq((1L, baseText), (2L, otherText), (3L, nearText))
      .toDF("doc_id", "text")
    val benchmark = Seq((100L, baseText)).toDF("doc_id", "text")
    val kept = Dedup.decontaminate(corpus, benchmark, "doc_id", "text", n = 8)
    assert(kept.columns.toSeq == Seq("doc_id", "text")) // payload intact
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(2L))
    // empty benchmark: nothing removed
    assert(Dedup.decontaminate(corpus, benchmark.limit(0), "doc_id", "text",
      n = 8).count() == 3L)
  }

  test("contaminatedBloom matches contaminated exactly, even with a tiny FP-heavy bitset") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val exact = Dedup.contaminated(docs, bench, "doc_id", "text", n = 8)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // 2^10 bits with 5 probes over thousands of grams -> near-saturated
    // bitset, so virtually every corpus gram passes the prefilter; the
    // exact verify join must still reduce it to the exact answer
    val fpHeavy = Dedup.contaminatedBloom(docs, bench, "doc_id", "text", n = 8,
        bloomBits = 1 << 10)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fpHeavy == exact)
    // and a realistically-sized bitset agrees too
    val sized = Dedup.contaminatedBloom(docs, bench, "doc_id", "text", n = 8)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sized == exact)
    assert(exact.nonEmpty)
    // empty benchmark: all-zero bitset, nothing flagged (and the
    // densify path must not trip ANSI element_at on an empty array)
    assert(Dedup.contaminatedBloom(docs, bench.limit(0), "doc_id", "text",
      n = 8).count() == 0L)
  }

  test("contaminatedFuzzy catches PERTURBED benchmark copies exact overlap misses less") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    // benchmark = perturbed copies (two words prepended) of docs % 40
    val bench = docs.filter(col("doc_id") % 40 === 0)
      .select((col("doc_id") + 500000).as("doc_id"),
        concat(lit("zq qz "), col("text")).as("text"))
    val expected = docs.filter(col("doc_id") % 40 === 0)
      .select("doc_id").as[Long].collect().toSet
    val flagged = Dedup.contaminatedFuzzy(docs, bench, "doc_id", "text",
        threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    // every perturbed source doc flagged; jaccard < 1 (it IS perturbed)
    assert(expected.subsetOf(flagged))
    val j = Dedup.contaminatedFuzzy(docs, bench, "doc_id", "text",
        threshold = 0.5)
      .agg(max(col("jaccard")), min(col("jaccard"))).head()
    assert(j.getDouble(0) < 1.0 && j.getDouble(1) >= 0.5)
    // and the filtering counterpart removes exactly the flagged ids
    val clean = Dedup.decontaminateFuzzy(docs, bench, "doc_id", "text",
        threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == docs.select("doc_id").as[Long].collect().toSet -- flagged)
  }

  test("nearDupClusters: transitive chains, stars, separate components, empty edges") {
    // chain 1-2-3-4 (label must travel 3 hops), star 10-(11,12,13),
    // isolated pair 20-21
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (10L, 13L), (20L, 21L)).toDF("a", "b")
    val out = Dedup.nearDupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L, 21L -> 20L))
    // composes with a near-dup pass: planted exact copies cluster together
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(50)
    val planted = docs.unionByName(
      docs.select((col("doc_id") + 1000L).as("doc_id"), col("text")))
    val clusters = Dedup.nearDupClusters(
      Dedup.minhashNearDups(planted, "doc_id", "text", threshold = 0.9))
    val m = clusters.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0 until 50).forall(i => m.get(i + 1000L).forall(_ == m(i.toLong))))
    // empty input converges immediately to an empty labeling
    assert(Dedup.nearDupClusters(Seq.empty[(Long, Long)].toDF("a", "b"))
      .count() == 0L)
  }

  test("shingles produce distinct n-grams; short texts fall back to joined form") {
    val sh = Seq("a b c d e f").toDF("t")
      .select(Dedup.shingles(col("t"), 5).as("s")).as[Seq[String]].head()
    assert(sh == Seq("a b c d e", "b c d e f"))
    val short = Seq("a b").toDF("t")
      .select(Dedup.shingles(col("t"), 5).as("s")).as[Seq[String]].head()
    assert(short == Seq("a b"))
  }

  test("repeatedLines counts distinct docs; short lines never counted") {
    val docs = Seq(
      (1L, "COOKIE BANNER\nunique alpha\n\nCOOKIE BANNER"), // twice in one doc = 1 doc
      (2L, "COOKIE BANNER\nunique beta\n"),
      (3L, "unique gamma\nNAV BAR"),
      (4L, "NAV BAR\n")
    ).toDF("doc_id", "text")
    val rep = Dedup.repeatedLines(docs, "doc_id", "text", minDocs = 2)
      .as[(String, Long)].collect().toMap
    // the blank line occurs in 3 docs but minChars=1 exempts it
    assert(rep == Map("COOKIE BANNER" -> 2L, "NAV BAR" -> 2L))
  }

  test("stripRepeatedLines preserves order, keeps empty lines, keeps all docs") {
    val docs = Seq(
      (1L, "BOILER\nkeep one\n\nkeep two\nBOILER"),
      (2L, "BOILER\nother text"),
      (3L, "BOILER") // fully boilerplate -> empty text, row kept
    ).toDF("doc_id", "text")
    val out = Dedup.stripRepeatedLines(docs, "doc_id", "text", minDocs = 2)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "keep one\n\nkeep two")
    assert(out(2L) == "other text")
    assert(out(3L) == "")
    assert(out.size == 3)
  }

  test("paragraph grain: a multi-line block is ONE unit; strip round-trips") {
    val banner = "This site uses cookies.\nBy continuing you agree."
    val docs = Seq(
      (1L, s"own prose one\n\n$banner"),
      (2L, s"$banner\n\nown prose two"),
      (3L, s"own prose three\n\n$banner\n\nmore prose"),
      (4L, "untouched text")
    ).toDF("doc_id", "text")
    // the two-LINE banner counts as one paragraph unit in 3 docs...
    val rep = Dedup.repeatedParagraphs(docs, "doc_id", "text", minDocs = 3)
      .as[(String, Long)].collect().toMap
    assert(rep == Map(banner -> 3L))
    // ...while at the LINE grain its constituent lines are separate
    val lines = Dedup.repeatedLines(docs, "doc_id", "text", minDocs = 3)
      .as[(String, Long)].collect().toMap
    assert(lines.keySet == Set("This site uses cookies.",
      "By continuing you agree."))
    // stripping removes the whole block and re-joins with blank lines
    val out = Dedup.stripRepeatedParagraphs(docs, "doc_id", "text",
      minDocs = 3).as[(Long, String)].collect().toMap
    assert(out(1L) == "own prose one")
    assert(out(2L) == "own prose two")
    assert(out(3L) == "own prose three\n\nmore prose")
    assert(out(4L) == "untouched text")
  }

  test("stripRepeatedLines keeps a null-text doc as an empty-text row") {
    val docs = Seq((1L, "BOILER\nkeep"), (2L, "BOILER\nx"), (3L, null))
      .toDF("doc_id", "text")
    val out = Dedup.stripRepeatedLines(docs, "doc_id", "text", minDocs = 2)
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "keep", 2L -> "x", 3L -> ""))
  }

  test("stripRepeatedLines with minDocs above max frequency is identity") {
    val docs = Seq((1L, "a\nb"), (2L, "a\nc")).toDF("doc_id", "text")
    val out = Dedup.stripRepeatedLines(docs, "doc_id", "text", minDocs = 3)
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a\nb", 2L -> "a\nc"))
  }

  test("exactDedupAgainst drops corpus matches, keeps first within batch") {
    val corpus = Seq((1L, "Existing Doc"), (2L, "other text")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "existing   DOC"),  // normalizes to a corpus match -> drop
      (11L, "brand new"),       // novel -> keep
      (12L, "brand  NEW"),      // within-batch dup of 11 -> drop
      (13L, "also fresh")       // novel -> keep
    ).toDF("doc_id", "text")
    val out = Dedup.exactDedupAgainst(batch, corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(11L, 13L))
  }

  test("exactDedupAgainst dedups null-text rows like any content group") {
    // a null-text doc already in the corpus must not be re-admitted
    // (sha2(null)=null and plain equality would never match), and two
    // null-text batch rows keep only the first — same grouping
    // semantics as exactDedup's window
    val corpus = Seq((1L, Some("kept")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, Option.empty[String]), // corpus already has a null-text doc -> drop
      (11L, Some("novel"))
    ).toDF("doc_id", "text")
    assert(Dedup.exactDedupAgainst(batch, corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet == Set(11L))
    // with no null in the corpus, batch-internal nulls keep-first
    val corpus2 = Seq((1L, Some("kept"))).toDF("doc_id", "text")
    val batch2 = Seq((10L, Option.empty[String]), (11L, Option.empty[String]),
      (12L, Some("novel"))).toDF("doc_id", "text")
    assert(Dedup.exactDedupAgainst(batch2, corpus2, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet == Set(10L, 12L))
  }

  test("minhashCandidates releases its signature cache before returning") {
    spark.catalog.clearCache() // isolate from earlier tests' caches
    Dedup.minhashCandidates(docs, "doc_id", "text").collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "minhashCandidates left a frame in the cache manager")
  }

  test("duplicateSpans finds shared k-grams with doc and occurrence counts") {
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x a b c d y"),
      (3L, "p q r s t"),
      (4L, "a b c d a b c d") // same gram twice within one doc
    ).toDF("doc_id", "text")
    val rows = Dedup.duplicateSpans(docs, "doc_id", "text", k = 4, minDocs = 2)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // "a b c d": docs 1, 2, 4; 4 occurrences (twice in doc 4). Doc 4's
    // rotated grams live in one doc only, so minDocs filters them.
    assert(rows == Map("a b c d" -> ((3L, 4L))))
  }

  test("stripDuplicateSpans removes covered tokens, keeps order and rows") {
    val docs = Seq(
      (1L, "a b c d e f"),  // span at 0..3 -> "e f"
      (2L, "x a b c d y"),  // span at 1..4 -> "x y"
      (3L, "p q r s t"),    // untouched
      (4L, "a b c d"),      // fully duplicated -> "" but row kept
      (5L, "a b c")         // shorter than k: never modified
    ).toDF("doc_id", "text")
    val out = Dedup.stripDuplicateSpans(docs, "doc_id", "text",
        k = 4, minDocs = 2)
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "e f", 2L -> "x y", 3L -> "p q r s t",
      4L -> "", 5L -> "a b c"))
  }

  test("stripDuplicateSpans: overlapping grams cover a longer shared span") {
    // the shared span is 5 tokens = two overlapping 4-grams; all five
    // positions must go in both docs
    val docs = Seq((1L, "a b c d e tail1"), (2L, "a b c d e tail2"))
      .toDF("doc_id", "text")
    val out = Dedup.stripDuplicateSpans(docs, "doc_id", "text",
        k = 4, minDocs = 2)
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "tail1", 2L -> "tail2"))
  }

  test("duplicate spans match across case and whitespace variants") {
    // same span: different case, line-wrapped, tab-separated — all one
    // gram key; surviving tokens keep their ORIGINAL form
    val docs = Seq(
      (1L, "The Quick Brown Fox ends"),
      (2L, "prefix the quick\nbrown\tfox"),
      (3L, "unrelated words entirely here")
    ).toDF("doc_id", "text")
    val census = Dedup.duplicateSpans(docs, "doc_id", "text",
        k = 4, minDocs = 2)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(census == Map("the quick brown fox" -> 2L))
    val out = Dedup.stripDuplicateSpans(docs, "doc_id", "text",
        k = 4, minDocs = 2)
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "ends", 2L -> "prefix",
      3L -> "unrelated words entirely here"))
  }
}
