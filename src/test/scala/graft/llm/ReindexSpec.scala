package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Index-generation lifecycle ([[Similarity.reindexIvf]] /
  * [[Similarity.reindexPq]] / [[Similarity.reindexIvfPq]] /
  * [[Similarity.resolveIndexRoot]] / [[Similarity.vacuumIndex]]):
  * resolution rules, atomic-commit visibility, append routing after a
  * swap, all-generation retraction, and planted recovery through the
  * reindexed generations. The oracle-bound twins are
  * `ann_reindex_planted` / `ann_reindex_drift`; this spec pins the
  * generation MECHANICS those queries ride on. */
class ReindexSpec extends SparkSpec {

  import spark.implicits._

  private def emb: DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toFile.getPath

  /** ε-twins of the first `n` corpus vectors (ids + 100000): each
    * twin's true rank-1 neighbor is its base. */
  private def twins(n: Int): DataFrame =
    emb.filter(col("vec_id") < n).select(
      (col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"),
        (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x))
        .as("embedding"))

  private def top1Bases(dir: String, n: Int): Seq[(Long, Long)] =
    Similarity.ivfQueryIndex(spark, dir, twins(n), k = 1)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSeq.sorted

  test("resolveIndexRoot: flat, committed generations win, uncommitted invisible and never reused") {
    val dir = tmp("graft_gen_resolve")
    Similarity.buildIvfIndex(emb, dir)
    assert(Similarity.resolveIndexRoot(spark, dir) == dir)
    val g1 = Similarity.reindexIvf(spark, dir, nCentroids = 8)
    assert(g1.endsWith("/gen-0001"))
    assert(Similarity.resolveIndexRoot(spark, dir).endsWith("/gen-0001"))
    // idempotent: a generation dir resolves to itself
    assert(Similarity.resolveIndexRoot(spark, g1) == g1)
    val g2 = Similarity.reindexIvf(spark, dir, nCentroids = 4)
    assert(g2.endsWith("/gen-0002"))
    assert(Similarity.resolveIndexRoot(spark, dir).endsWith("/gen-0002"))
    // a crashed (uncommitted) generation: invisible to readers, its
    // number never reused by the retry
    assert(new java.io.File(s"$dir/gen-0003").mkdirs())
    assert(Similarity.resolveIndexRoot(spark, dir).endsWith("/gen-0002"))
    val g4 = Similarity.reindexIvf(spark, dir, nCentroids = 4)
    assert(g4.endsWith("/gen-0004"))
    assert(Similarity.resolveIndexRoot(spark, dir).endsWith("/gen-0004"))
  }

  test("reindex refits on the append-inclusive corpus; post-swap appends land in the new generation only") {
    val dir = tmp("graft_gen_append")
    Similarity.buildIvfIndex(emb.where(col("vec_id") % 7 =!= 0), dir)
    Similarity.appendIvfIndex(spark, emb.where(col("vec_id") % 7 === 0), dir)
    val n = emb.count()
    assert(spark.read.parquet(s"$dir/assignments").count() == n)
    val g1 = Similarity.reindexIvf(spark, dir, nCentroids = 8)
    // every vector — built AND appended — made it into the new gen
    assert(spark.read.parquet(s"$g1/assignments").count() == n)
    // the new generation genuinely refit: 8 centroids, not the 16 built
    assert(spark.read.parquet(s"$g1/centroids").count() == 8)
    // a post-swap append extends the new generation, not the retired one
    val novel = emb.where(col("vec_id") === 0)
      .select(lit(999999L).as("vec_id"), col("embedding"))
    Similarity.appendIvfIndex(spark, novel, dir)
    assert(spark.read.parquet(s"$dir/assignments").count() == n)
    assert(spark.read.parquet(s"$g1/assignments").count() == n + 1)
    // and serving finds it: an ε-twin of the novel vector recovers it
    val q = novel.select((col("vec_id") + 1).as("vec_id"),
      transform(col("embedding"),
        (x, i) => when(i === 0, x + lit(0.0001f)).otherwise(x))
        .as("embedding"))
    val hit = Similarity.ivfQueryIndex(spark, dir, q, k = 2)
      .where(col("rank") === 1).select("neighbor_id")
      .as[Long].collect().toSeq
    // rank-1 is the base (id 0) or the twin-source 999999 — both are
    // the same vector; 999999 present at all proves the new-gen append
    val near = Similarity.ivfQueryIndex(spark, dir, q, k = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(near.contains(999999L), s"post-swap append not served: $near ($hit)")
  }

  test("retractFromVectorIndex scrubs every generation, not just the serving one") {
    val dir = tmp("graft_gen_retract")
    Similarity.buildIvfIndex(emb, dir)
    Similarity.reindexIvf(spark, dir, nCentroids = 8)
    val report = graft.streaming.IndexIngest.retractFromVectorIndex(
      spark, dir, Seq(0L, 1L).toDF("vec_id"), "vec_id")
      .select(col("ledger"), col("rows_removed"))
      .as[(String, Long)].collect().toMap
    assert(report("assignments") == 2L)
    assert(report("gen-0001/assignments") == 2L)
    for (root <- Seq(dir, s"$dir/gen-0001")) {
      val left = spark.read.parquet(s"$root/assignments")
        .where(col("neighbor_id").isin(0L, 1L)).count()
      assert(left == 0L, s"retracted ids survive in $root")
    }
  }

  test("vacuumIndex removes retired data, keeps serving; flat-only is a no-op") {
    val dir = tmp("graft_gen_vacuum")
    Similarity.buildIvfIndex(emb, dir)
    assert(Similarity.vacuumIndex(spark, dir).isEmpty)
    val expected = top1Bases(dir, 3)
    Similarity.reindexIvf(spark, dir, nCentroids = 8)
    Similarity.reindexIvf(spark, dir, nCentroids = 4)
    val deleted = Similarity.vacuumIndex(spark, dir)
    assert(deleted.exists(_.endsWith("/assignments")), deleted.toString)
    assert(deleted.exists(_.endsWith("/gen-0001")), deleted.toString)
    assert(!new java.io.File(s"$dir/assignments").exists())
    assert(!new java.io.File(s"$dir/gen-0001").exists())
    assert(Similarity.resolveIndexRoot(spark, dir).endsWith("/gen-0002"))
    // the index still answers — and only the serving generation can
    assert(top1Bases(dir, 3) == expected)
  }

  test("vacuumIndex grace window: young retired + uncommitted surfaces survive, zero-grace reclaims") {
    val dir = tmp("graft_gen_vacuum_grace")
    Similarity.buildIvfIndex(emb, dir)
    Similarity.reindexIvf(spark, dir, nCentroids = 8)
    // an uncommitted generation: possibly a reindex mid-write
    assert(new java.io.File(s"$dir/gen-0099/assignments").mkdirs())
    // the serving swap has NOT soaked past a day-long grace — the
    // retired flat base, and the young uncommitted gen, all survive
    assert(Similarity.vacuumIndex(spark, dir,
      graceMs = 24L * 3600 * 1000).isEmpty)
    assert(new java.io.File(s"$dir/assignments").exists())
    assert(new java.io.File(s"$dir/gen-0099").exists())
    // zero grace: historical immediate-reclaim behavior
    val deleted = Similarity.vacuumIndex(spark, dir)
    assert(deleted.exists(_.endsWith("/assignments")), deleted.toString)
    assert(deleted.exists(_.endsWith("/gen-0099")), deleted.toString)
    assert(Similarity.resolveIndexRoot(spark, dir).endsWith("/gen-0001"))
  }

  test("reindexIvf to a HIERARCHICAL quantizer: two-level gen serves, twins recovered") {
    // reindex can change the quantizer CLASS: a flat 16-centroid build
    // refit at 96 centroids crosses the hierarchical threshold (64) —
    // the new generation must persist its coarse level and the query
    // path must reconstruct the two-level probe from the gen dir
    val dir = tmp("graft_gen_hier")
    Similarity.buildIvfIndex(emb, dir, nCentroids = 16)
    val g1 = Similarity.reindexIvf(spark, dir, nCentroids = 96)
    assert(new java.io.File(s"$g1/coarse").exists(),
      "hierarchical generation must persist its coarse level")
    Similarity.vacuumIndex(spark, dir)
    assert(top1Bases(dir, 3) ==
      Seq((100000L, 0L), (100001L, 1L), (100002L, 2L)))
    // and appends keep following the hierarchical assignment rule
    val novel = emb.where(col("vec_id") === 1)
      .select(lit(888888L).as("vec_id"), col("embedding"))
    Similarity.appendIvfIndex(spark, novel, dir)
    val near = Similarity.ivfQueryIndex(spark, dir,
        novel.select((col("vec_id") + 1).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, x + lit(0.0001f)).otherwise(x))
            .as("embedding")), k = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(near.contains(888888L), s"hierarchical post-swap append lost: $near")
  }

  test("compactVectorIndex: IVF segment fold serves identically with the quantizer copied verbatim") {
    val dir = tmp("graft_gen_compact")
    Similarity.buildIvfIndex(emb.where(col("vec_id") % 7 =!= 0), dir)
    Similarity.appendIvfIndex(spark, emb.where(col("vec_id") % 14 === 0), dir)
    Similarity.appendIvfIndex(spark, emb.where(col("vec_id") % 14 === 7), dir)
    val before = Similarity.ivfQueryIndex(spark, dir, twins(5), k = 3)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val audit = Similarity.compactVectorIndex(spark, dir).head()
    assert(audit.getAs[String]("kind") == "ivf")
    assert(audit.getAs[String]("generation") == "gen-0001")
    // the fold genuinely folded: fewer data files than the append
    // history accumulated, same row population
    assert(audit.getAs[Long]("segments_after")
      < audit.getAs[Long]("segments_before"), audit.toString)
    assert(audit.getAs[Long]("rows") == emb.count())
    // no refit: the centroid table is copied value for value
    val oldC = spark.read.parquet(s"$dir/centroids")
      .collect().map(_.toString).sorted.toSeq
    val newC = spark.read.parquet(s"$dir/gen-0001/centroids")
      .collect().map(_.toString).sorted.toSeq
    assert(newC == oldC)
    // serving is identical row for row through the atomic swap
    assert(Similarity.ivfQueryIndex(spark, dir, twins(5), k = 3)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
      == before)
    // reclaim via the existing vacuum; serving unchanged after it
    Similarity.vacuumIndex(spark, dir)
    assert(!new java.io.File(s"$dir/assignments").exists())
    assert(Similarity.ivfQueryIndex(spark, dir, twins(5), k = 3)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
      == before)
    // post-compaction appends extend the compacted generation
    val novel = emb.where(col("vec_id") === 0)
      .select(lit(777777L).as("vec_id"), col("embedding"))
    Similarity.appendIvfIndex(spark, novel, dir)
    assert(spark.read.parquet(s"$dir/gen-0001/assignments").count()
      == emb.count() + 1)
  }

  test("compactVectorIndex: PQ and IVF-PQ code folds serve identically") {
    val e = emb
    // flat PQ codes: coalesce fold, codebooks copied
    val dirP = tmp("graft_gen_compact_pq")
    Similarity.buildPqIndex(e.where(col("vec_id") % 7 =!= 0), dirP)
    Similarity.appendPqIndex(spark, e.where(col("vec_id") % 14 === 0), dirP)
    Similarity.appendPqIndex(spark, e.where(col("vec_id") % 14 === 7), dirP)
    val beforeP = Similarity.pqQueryIndex(spark, dirP, twins(3), e, k = 1)
      .orderBy("query_id").collect().map(_.toString).toSeq
    val auditP = Similarity.compactVectorIndex(spark, dirP, shards = 1)
      .head()
    assert(auditP.getAs[String]("kind") == "pq")
    assert(auditP.getAs[Long]("segments_after")
      < auditP.getAs[Long]("segments_before"), auditP.toString)
    assert(Similarity.pqQueryIndex(spark, dirP, twins(3), e, k = 1)
      .orderBy("query_id").collect().map(_.toString).toSeq == beforeP)
    // IVF-PQ: cluster-partitioned residual codes, centroids+codebooks
    // copied
    val dirC = tmp("graft_gen_compact_ivfpq")
    Similarity.buildIvfPqIndex(e.where(col("vec_id") % 7 =!= 0), dirC)
    Similarity.appendIvfPqIndex(spark, e.where(col("vec_id") % 14 === 0),
      dirC)
    Similarity.appendIvfPqIndex(spark, e.where(col("vec_id") % 14 === 7),
      dirC)
    val beforeC = Similarity.ivfPqQueryIndex(spark, dirC, twins(3), e,
        k = 1).orderBy("query_id").collect().map(_.toString).toSeq
    val auditC = Similarity.compactVectorIndex(spark, dirC).head()
    assert(auditC.getAs[String]("kind") == "ivfpq")
    assert(auditC.getAs[Long]("segments_after")
      < auditC.getAs[Long]("segments_before"), auditC.toString)
    Similarity.vacuumIndex(spark, dirC)
    assert(Similarity.ivfPqQueryIndex(spark, dirC, twins(3), e, k = 1)
      .orderBy("query_id").collect().map(_.toString).toSeq == beforeC)
    // an empty directory fails loudly, not with a half-built gen
    intercept[IllegalArgumentException](
      Similarity.compactVectorIndex(spark, tmp("graft_gen_compact_no")))
  }

  test("reindexIvfPq and reindexPq: planted recovery through the new generation") {
    val e = emb
    // IVF-PQ: build on 6/7, append the rest, reindex from the full
    // corpus, vacuum — twins must recover their bases via gen-0001
    val dirC = tmp("graft_gen_ivfpq")
    Similarity.buildIvfPqIndex(e.where(col("vec_id") % 7 =!= 0), dirC)
    Similarity.appendIvfPqIndex(spark, e.where(col("vec_id") % 7 === 0), dirC)
    val gc = Similarity.reindexIvfPq(spark, dirC, e, nCentroids = 8)
    assert(gc.endsWith("/gen-0001"))
    Similarity.vacuumIndex(spark, dirC)
    val gotC = Similarity.ivfPqQueryIndex(spark, dirC, twins(3), e, k = 1)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(gotC == Seq((100000L, 0L), (100001L, 1L), (100002L, 2L)), gotC)
    // PQ: same shape, codes-only layout
    val dirP = tmp("graft_gen_pq")
    Similarity.buildPqIndex(e.where(col("vec_id") % 7 =!= 0), dirP)
    Similarity.appendPqIndex(spark, e.where(col("vec_id") % 7 === 0), dirP)
    val gp = Similarity.reindexPq(spark, dirP, e)
    assert(gp.endsWith("/gen-0001"))
    Similarity.vacuumIndex(spark, dirP)
    assert(spark.read.parquet(s"$gp/codes").count() == e.count())
    val gotP = Similarity.pqQueryIndex(spark, dirP, twins(3), e, k = 1)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(gotP == Seq((100000L, 0L), (100001L, 1L), (100002L, 2L)), gotP)
  }
}
