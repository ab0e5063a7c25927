package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All variants are banded/bucketed — candidate generation NEVER does an
  * all-pairs join. At 100 TB:
  *  - exact dedup is one hash-partitioned aggregation;
  *  - MinHash-LSH shuffles (band, bucket) keys; bucket sizes are bounded
  *    by `maxBucket` so a degenerate bucket (boilerplate text) cannot go
  *    quadratic;
  *  - SimHash bands a 64-bit fingerprint into 4×16-bit chunks (any pair
  *    within Hamming distance 3 shares ≥1 chunk — pigeonhole).
  *
  * Everything below `minhashCandidates`' pair expansion is pure
  * `org.apache.spark.sql.functions` (codegen'd; no UDF).
  */
object Dedup {

  /** Canonical text form used for hashing: lowercase, collapse
    * whitespace, trim. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Exact-dup groups: content hash → surviving (min) id + group size.
    * One shuffle on the 256-bit content hash. */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        sha2(normalizeText(col(textCol)), 256).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dupes"))

  /** Exact dedup: keep the min-id row per content hash. Implemented with
    * a window over the hash partition (shuffle by hash, no global
    * sort). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = sha2(normalizeText(col(textCol)), 256)
    val w = Window.partitionBy(col("__h"))
    df.withColumn("__h", h)
      .withColumn("__keep", min(col(idCol)).over(w))
      .where(col(idCol) === col("__keep"))
      .drop("__h", "__keep")
  }

  /** Word n-gram shingles of the normalized text. Short texts (< n
    * words) produce their single joined form. */
  def shingles(c: Column, n: Int = 5): Column = {
    val words = split(normalizeText(c), " ")
    val grams = transform(sequence(lit(0), size(words) - n),
      i => array_join(slice(words, i + 1, lit(n)), " "))
    when(size(words) >= n, array_distinct(grams))
      .otherwise(array(array_join(words, " ")))
  }

  /** MinHash signature as a Column expression: sig[i] = min over
    * shingles of hash_i(shingle). NOTE: higher-order functions are
    * interpreted (no codegen) and re-evaluate the shingles expression
    * per seed — use [[minhashSignatures]] (the DataFrame form) for
    * corpus-scale work; this form is for small/ad-hoc use. */
  def minhashSignature(shinglesCol: Column, k: Int = 64): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shinglesCol, s => xxhash64(s, i))))

  /** MinHash signatures, vectorized: explode shingles to rows and run k
    * codegen'd `min(xxhash64(sh, seed))` aggregates with map-side
    * combine. Wholly inside WholeStageCodegen — measured >50× faster
    * than the nested-HOF expression form at corpus scale, and the
    * shuffle carries only (doc_id, k partial mins). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 64): DataFrame = {
    // each shingle STRING is hashed once; the k per-permutation hashes
    // derive from that 8-byte value (hash-of-hash — standard MinHash
    // practice), so per-row work is k fixed-width hashes instead of k
    // string traversals
    val exploded = df.select(col(idCol).as("doc_id"),
        explode(shingles(col(textCol))).as("__sh"))
      .select(col("doc_id"), xxhash64(col("__sh")).as("__h"))
    val aggs = (0 until k).map(i => min(xxhash64(col("__h"), lit(i))).as(s"__h$i"))
    exploded.groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"__h$i")): _*).as("sig"))
  }

  /** LSH banding: split the signature into `bands` bands of `rowsPer`
    * values; each band hashes to one bucket. Two docs with Jaccard j
    * collide in ≥1 band with prob 1-(1-j^rowsPer)^bands. */
  def lshBands(sigCol: Column, bands: Int, rowsPer: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
             xxhash64(slice(sigCol, b * rowsPer + 1, rowsPer), lit(b)).as("bucket"))
    }: _*)

  /** Candidate near-dup pairs via MinHash-LSH. Returns
    * `(a, b, est_jaccard)` with a < b, where est_jaccard is the fraction
    * of matching signature positions. `maxBucket` drops degenerate
    * buckets (identical boilerplate shingles) before the in-bucket pair
    * expansion, bounding the quadratic term. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 64, bands: Int = 16,
                        maxBucket: Int = 1000): DataFrame = {
    val rowsPer = k / bands
    require(bands * rowsPer == k, s"bands ($bands) must divide k ($k)")
    // Signatures are computed ONCE (codegen'd aggregate form) and
    // cached; buckets and the pair expansion carry only doc ids —
    // dragging the k-long signature arrays through
    // collect_list/explode/shuffle dominates runtime otherwise.
    val sigs = minhashSignatures(df, idCol, textCol, k).cache()
    val banded = sigs.select(col("doc_id"),
        explode(lshBands(col("sig"), bands, rowsPer)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    // per-(band,bucket): collect members sorted by id, expand i<j pairs
    val buckets = banded.groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ms"))
      .where(size(col("ms")).between(2, maxBucket))
    val pairs = buckets.select(explode(flatten(
        transform(col("ms"), (m, i) =>
          transform(slice(col("ms"), i + 2, size(col("ms"))),
            other => struct(m.as("a"), other.as("b")))))).as("p"))
      .select(col("p.a"), col("p.b"))
      .dropDuplicates("a", "b")
    val sa = sigs.select(col("doc_id").as("a"), col("sig").as("__sa"))
    val sb = sigs.select(col("doc_id").as("b"), col("sig").as("__sb"))
    pairs.join(sa, Seq("a")).join(sb, Seq("b"))
      .select(col("a"), col("b"),
        (size(filter(zip_with(col("__sa"), col("__sb"), (x, y) => x === y), bb => bb))
          .cast("double") / lit(k)).as("est_jaccard"))
  }

  /** Verified near-dup pairs: exact Jaccard over shingle sets, computed
    * only for LSH candidates (join back by id — hash-partitioned). */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.7, k: Int = 64,
                      bands: Int = 16): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, k, bands)
    val sh = df.select(col(idCol).as("__id"), shingles(col(textCol)).as("__sh"))
      .cache()
    val withA = cands.join(sh.withColumnRenamed("__id", "a")
      .withColumnRenamed("__sh", "sha_"), Seq("a"))
    val withB = withA.join(sh.withColumnRenamed("__id", "b")
      .withColumnRenamed("__sh", "shb_"), Seq("b"))
    withB.withColumn("jaccard", jaccard(col("sha_"), col("shb_")))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("est_jaccard"), col("jaccard"))
  }

  /** Exact Jaccard similarity of two array columns (as sets). */
  def jaccard(a: Column, b: Column): Column = {
    val i = size(array_intersect(a, b)).cast("double")
    val u = size(array_union(a, b)).cast("double")
    when(u === 0d, 0d).otherwise(i / u)
  }

  /** 64-bit SimHash of the word multiset: bit i of the fingerprint is
    * the sign of Σ_words (±1 by bit i of xxhash64(word)). Pure
    * higher-order-function expression. */
  def simhash64(c: Column): Column = {
    val words = split(normalizeText(c), " ")
    // One aggregate pass per bit (unrolled in Scala — bit index must be a
    // literal for shiftright); 64 codegen'd folds over the word array.
    val bits = (0 until 64).map { i =>
      when(aggregate(words, lit(0L),
        (acc, w) => acc + when(shiftright(xxhash64(w), i).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L)) > 0L, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash fingerprints, vectorized (same rationale as
    * [[minhashSignatures]]): explode words, 64 codegen'd conditional
    * sums with map-side combine, then pack sign bits. */
  def simhashFingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = df.select(col(idCol).as("doc_id"),
      explode(split(normalizeText(col(textCol)), " ")).as("__w"))
    val aggs = (0 until 64).map(i =>
      sum(when(shiftright(xxhash64(col("__w")), i).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"__b$i"))
    val packed = (0 until 64)
      .map(i => when(col(s"__b$i") > 0L, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    words.groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), packed.as("fp"))
  }

  /** SimHash near-dup pairs within `maxHamming` (≤3 guaranteed found by
    * 4-chunk banding; pigeonhole over 16-bit chunks). */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding guarantees recall only to Hamming 3")
    val fp = simhashFingerprints(df, idCol, textCol)
    val chunks = fp.select(col("doc_id"), col("fp"),
        explode(array((0 until 4).map(i =>
          struct(lit(i).as("chunk"),
                 shiftright(col("fp"), i * 16).bitwiseAND(lit(0xFFFFL)).as("key"))): _*)).as("c"))
      .select(col("doc_id"), col("fp"), col("c.chunk"), col("c.key"))
    val buckets = chunks.groupBy(col("chunk"), col("key"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("fp")))).as("ms"))
      .where(size(col("ms")).between(2, maxBucket))
    buckets.select(explode(flatten(
        transform(col("ms"), (m, i) =>
          transform(slice(col("ms"), i + 2, size(col("ms"))), other =>
            struct(m.getField("doc_id").as("a"), other.getField("doc_id").as("b"),
                   m.getField("fp").as("fa"), other.getField("fp").as("fb")))))).as("p"))
      .select(col("p.a"), col("p.b"), hamming(col("p.fa"), col("p.fb")).as("hamming"))
      .dropDuplicates("a", "b")
      .where(col("hamming") <= maxHamming)
  }

  /** Decontamination: flag corpus documents sharing any word n-gram
    * with a benchmark/eval set. Token-join shape: explode benchmark
    * n-grams to a (small) key set, broadcast against the corpus's
    * exploded n-grams, count overlaps per doc. The benchmark side is
    * eval-suite-sized (thousands of docs) — always the broadcast side;
    * the corpus is only exploded and aggregated, never self-joined. */
  def contaminated(corpus: DataFrame, benchmark: DataFrame,
                   idCol: String, textCol: String, n: Int = 8,
                   minOverlaps: Int = 1): DataFrame = {
    val benchGrams = benchmark
      .select(explode(shingles(col(textCol), n)).as("__g")).dropDuplicates("__g")
    val corpusGrams = corpus.select(col(idCol).as("doc_id"),
      explode(shingles(col(textCol), n)).as("__g"))
    corpusGrams.join(broadcast(benchGrams), Seq("__g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated_grams"))
      .where(col("n_contaminated_grams") >= minOverlaps)
  }

  /** Exact n-gram Jaccard near-dups within blocking buckets (same
    * `blockCols` values — e.g. language + length band). The block keys
    * bound the pairwise term; at 100 TB choose blocks so bucket sizes
    * stay ~10³. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCols: Seq[Column], n: Int = 3,
                        threshold: Double = 0.3): DataFrame = {
    val base = df.select(col(idCol).as("__id"), shingles(col(textCol), n).as("__sh"),
      struct(blockCols: _*).as("__blk"))
      .cache() // referenced by both join sides — compute shingles once
    // distinct column names on each side — a self-join on a shared
    // lineage column resolves to a trivially-true predicate otherwise
    val a = base.select(col("__blk").as("__blka"), col("__id").as("a"),
      col("__sh").as("sha_"), size(col("__sh")).as("__na"))
    val b = base.select(col("__blk").as("__blkb"), col("__id").as("b"),
      col("__sh").as("shb_"), size(col("__sh")).as("__nb"))
    // |A∪B| = |A|+|B|-|A∩B| — one array_intersect per pair instead of
    // intersect + union (shingles() already dedups, so size = |set|)
    val inter = size(array_intersect(col("sha_"), col("shb_"))).cast("double")
    a.join(b, col("__blka") === col("__blkb") && col("a") < col("b"))
      .withColumn("jaccard",
        when(col("__na") + col("__nb") === 0, 0d)
          .otherwise(inter / (col("__na") + col("__nb") - inter)))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }
}
