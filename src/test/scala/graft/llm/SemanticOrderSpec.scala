package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ICLM semantic ordering ([[Packing.semanticChainOrder]] over the
  * native `graft_semantic_chain` kernel): exact hand-computed chains,
  * tie determinism, degenerate vectors, and group boundedness. */
class SemanticOrderSpec extends SparkSpec {
  import spark.implicits._

  private def chain(vecs: Seq[Seq[Double]]): Seq[Int] = {
    graft.plans.GraftExtensions.register(spark)
    spark.createDataFrame(Seq(Tuple1(vecs))).toDF("vs")
      .select(expr("graft_semantic_chain(vs)")).as[Seq[Int]]
      .collect().head
  }

  test("two cliques chain to exhaustion: exact hand-computed order") {
    // A-clique at indexes 0..2, B-clique at 3..5. From 0 the chain
    // walks A (0,1,2), jumps to B at its nearest member 5, then 4, 3.
    val a = Seq(Seq(1.0, 0.0), Seq(0.99, 0.01), Seq(0.98, 0.02))
    val b = Seq(Seq(0.0, 1.0), Seq(0.01, 0.99), Seq(0.02, 0.98))
    // element i = chain position of vector i
    assert(chain(a ++ b) == Seq(0, 1, 2, 5, 4, 3))
  }

  test("exact duplicates visit in input order (lowest index wins ties)") {
    val v = Seq(1.0, 1.0)
    assert(chain(Seq(v, v, v, v)) == Seq(0, 1, 2, 3))
  }

  test("zero-norm vectors chain last") {
    val out = chain(Seq(Seq(1.0, 0.0), Seq(0.0, 0.0), Seq(0.9, 0.1)))
    assert(out == Seq(0, 2, 1)) // the zero vector gets the final slot
  }

  test("semanticChainOrder: groups bounded, ranks dense and disjoint") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val out = Packing.semanticChainOrder(emb, docsPerGroup = 16)
    val rows = out.collect()
    assert(rows.length == emb.count())
    // positions within each group are a dense 0..size-1 permutation
    val byGrp = rows.groupBy(_.getLong(1))
    for ((_, g) <- byGrp) {
      val ps = g.map(_.getLong(2)).sorted
      assert(ps.head == 0L && ps.last == ps.length - 1L
        && ps.distinct.length == ps.length)
      assert(g.length <= 16)
    }
    // semantic_rank is unique corpus-wide (safe for packByScore)
    assert(rows.map(_.getLong(3)).distinct.length == rows.length)
  }

  test("chain order is repartition-invariant") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("doc_id"), col("embedding"))
      .limit(100)
    def ranks(parts: Int) = Packing
      .semanticChainOrder(emb.repartition(parts), docsPerGroup = 8)
      .select("doc_id", "semantic_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ranks(1) == ranks(7))
  }
}
