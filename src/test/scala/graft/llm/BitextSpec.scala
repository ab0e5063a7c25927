package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bitext mining ([[Bitext]]): planted-translation recovery, the
  * one-to-one guarantee of intersection retrieval, and the hub
  * suppression the ratio margin exists for. */
class BitextSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def perturbed(df: org.apache.spark.sql.DataFrame, offset: Long) =
    df.select((col("vec_id") + offset).as("vec_id"),
      transform(col("embedding"),
        (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x))
        .as("embedding"))

  test("planted translations are mined exactly, one-to-one") {
    val src = emb.where(col("vec_id") % 10 === 0)
    val tgt = perturbed(emb.where(col("vec_id") % 20 === 0), 500000L)
      .unionByName(emb.where(col("vec_id") % 10 === 3)
        .select((col("vec_id") + 700000).as("vec_id"), col("embedding")))
    val mined = Bitext.mineBitext(src, tgt, k = 4, threshold = 1.3)
      .select(col("src_id"), col("tgt_id"), col("margin")).collect()

    val planted = emb.where(col("vec_id") % 20 === 0)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val minedPairs = mined.map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted pair is recovered...
    for (v <- planted)
      assert(minedPairs.contains((v, v + 500000L)),
        s"planted pair ($v, ${v + 500000L}) not mined")
    // ...with a margin far above the noise floor
    for (r <- mined if planted.contains(r.getLong(0)))
      assert(r.getDouble(2) > 1.5, s"planted margin ${r.getDouble(2)} weak")
    // intersection retrieval is one-to-one by construction
    assert(mined.map(_.getLong(0)).distinct.length == mined.length)
    assert(mined.map(_.getLong(1)).distinct.length == mined.length)
  }

  test("a hub target near many sources is suppressed by the margin") {
    import spark.implicits._
    // src = 8 well-separated one-hot-ish directions. Targets: a hub
    // (the all-ones direction — cos ≈ 0.4 to EVERY source, the classic
    // hubness failure a raw-cosine threshold admits), one true
    // translation of src 0, and one moderate decoy per source (cos
    // ≈ 0.9) so each side's kNN mean reflects a realistic neighborhood.
    val dim = 8
    def oneHot(i: Int): Seq[Float] =
      Seq.tabulate(dim)(j => if (i == j) 1.0f else 0.05f)
    def decoy(i: Int): Seq[Float] =
      Seq.tabulate(dim)(j => if (i == j) 1.0f else 0.22f)
    val src = (0 until dim).map(i => (i.toLong, oneHot(i))).toDF(
      "vec_id", "embedding")
    val tgt = ((100L, Seq.fill(dim)(0.6f)) +:
        (101L, oneHot(0).updated(1, 0.06f)) +:
        (0 until dim).map(i => (200L + i, decoy(i))))
      .toDF("vec_id", "embedding")
    val mined = Bitext.mineBitext(src, tgt, k = 2, threshold = 1.05)
      .collect()
    val pairs = mined.map(r => (r.getLong(0), r.getLong(1))).toSet
    // the hub's raw cosine to every source beats the threshold shape a
    // cosine filter would use, but its margin ≈ 1 (its OWN kNN mean is
    // as high as any single cosine to it) — never mined
    assert(!mined.map(_.getLong(1)).contains(100L),
      s"hub mined: ${pairs.mkString(", ")}")
    // the true translation outranks src 0's decoy and is mined
    assert(pairs.contains((0L, 101L)), s"mined: ${pairs.mkString(", ")}")
  }

  test("crossTopK keeps cross-corpus pairs with colliding ids") {
    import spark.implicits._
    val q = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val c = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val top = Bitext.crossTopK(q, c, k = 1).collect()
    assert(top.length == 1)
    // id 1 == id 1 across corpora is a legitimate pair (no
    // self-exclusion), and it is the exact match
    assert(top.head.getLong(2) == 1L)
    assert(math.abs(top.head.getDouble(3) - 1.0) < 1e-12)
  }
}
