package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CANARY for the `curate_pipeline_full` oracle-determinism invariant
  * (see the comment above that query in Queries.scala): the Spark side
  * semdedups WITHIN k-means clusters while the DuckDB oracle computes
  * all-pairs cosine, so oracle equality requires every cosine ≥ 0.9
  * pair in the driver testdata to be co-clustered under ANY clustering.
  * That holds iff every such pair is an exact-duplicate vector
  * (identical vectors always share an assignment) — and in the current
  * testdata it holds VACUOUSLY: no pair reaches 0.9 at all.
  *
  * This spec brute-forces all pairs at sf0.001 and fails loudly if a
  * regenerated testdata ever plants a non-exact pair ≥ 0.9 — the
  * condition under which `curate_pipeline_full` would start flaking
  * nondeterministically with clustering shifts. */
class EmbeddingInvariantSpec extends SparkSpec {

  test("testdata invariant: no non-exact embedding pair has cosine >= 0.9") {
    val ev = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        md5(col("embedding").cast("string")).as("h"))
    val a = ev.select(col("vec_id").as("ai"), col("v").as("va"), col("h").as("ha"))
    val b = ev.select(col("vec_id").as("bi"), col("v").as("vb"), col("h").as("hb"))
    // all-pairs is the POINT here (exhaustive canary at the smallest SF,
    // ~1.3k vectors → ~800k pairs); production paths never do this
    val worst = a.join(b, col("ai") < col("bi"))
      .where(col("ha") =!= col("hb"))
      .select(Similarity.cosine(col("va"), col("vb")).as("cosine"))
      .agg(max(col("cosine"))).head.getDouble(0)
    assert(worst < 0.9,
      s"\nTESTDATA DRIFT: a NON-exact embedding pair reached cosine $worst >= 0.9." +
        "\nThe curate_pipeline_full oracle (all-pairs) is only deterministic vs" +
        "\nthe cluster-bounded Spark semdedup when every qualifying pair is an" +
        "\nexact duplicate (co-clustered by construction). Either re-plant the" +
        "\nfixture or bound the oracle to the cluster rule before trusting it.")
  }
}
