package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of known vectors") {
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0)), (Seq(1.0, 1.0), Seq(1.0, 1.0)))
      .toDF("a", "b")
    val cs = df.select(Similarity.cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(cs(0)) < 1e-12)
    assert(math.abs(cs(1) - 1.0) < 1e-12)
  }

  test("bruteForceTopK returns k ranked neighbors excluding self") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val out = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 2), emb, k = 3)
    val grouped = out.collect().groupBy(_.getAs[Long]("query_id"))
    assert(grouped.keySet == Set(0L, 1L))
    grouped.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3))
      // descending cosine within the group
      val cos = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (x, y) => x >= y })
      assert(!rows.exists(r => r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id")))
    }
  }

  test("lshTopK recall vs brute force on clustered vectors") {
    // clustered corpus: LSH recall is only meaningful when true near
    // neighbors exist (uniform-random vectors have none)
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(10)(Array.fill(64)(rnd.nextGaussian()))
    val points = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 20
    } yield ((ci * 20 + j).toLong, c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq)
    val corpus = points.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") % 20 === 0) // one per cluster
    val exact = Similarity.bruteForceTopK(queries, corpus, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // probeBits = 1 PINNED: this is the H1 opt-out's floor — on
    // corpora with real near-dup structure one-flip probing already
    // recalls >= 0.8 at a fraction of the H2 candidate volume, which
    // is exactly when opting out of the probeBits = 2 default is sane
    val approx = Similarity.lshTopK(queries, corpus, k = 5, nBits = 8,
        probeBits = 1).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall too low on clustered data: $recall")
    // the DEFAULT (H2 since round 11) probes a superset of H1's
    // buckets, so it can only do better on the same corpus
    val dflt = Similarity.lshTopK(queries, corpus, k = 5, nBits = 8).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val dfltRecall = exact.intersect(dflt).size.toDouble / exact.size
    assert(dfltRecall >= recall,
      s"default (H2) recall $dfltRecall below explicit H1 $recall")
  }

  test("ivfTopKSweep: one fit, per-depth results identical to ivfTopK") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 3)
    val sweep = Similarity.ivfTopKSweep(queries, emb, k = 5,
      nProbes = Seq(1, 4))
    sweep.foreach { case (np, res) =>
      val direct = Similarity.ivfTopK(queries, emb, k = 5, nProbe = np)
        .orderBy("query_id", "rank")
        .as[(Long, Int, Long, Double)].collect().toSeq
      val got = res.orderBy("query_id", "rank")
        .as[(Long, Int, Long, Double)].collect().toSeq
      assert(got == direct, s"sweep diverged from ivfTopK at nProbe=$np")
    }
  }

  test("lshTopK Hamming-2 multiprobe: candidate superset, recall never drops") {
    // the ann_recall_audit remedy: two-flip probing must dominate
    // one-flip on ANY corpus (its probe set is a strict superset), and
    // on the hard uniform corpus it must actually find more truth
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 5)
    val truth = Similarity.bruteForceTopK(queries, emb, k = 5)
    def hits(probeBits: Int): Long =
      Similarity.recallRow(
        Similarity.lshTopK(queries, emb, k = 5, nBits = 6,
          probeBits = probeBits),
        truth, "lsh", 5).collect().head.getAs[Long]("hits")
    val h1 = hits(1)
    val h2 = hits(2)
    assert(h2 >= h1, s"two-flip probing lost recall: $h2 < $h1")
    assert(h2 > 0, "Hamming-2 multiprobe found no truth on the uniform corpus")
    // a planted exact twin is found at rank 1 under either probe depth
    val twin = emb.where(col("vec_id") === 3)
      .select((col("vec_id") + 900000).as("vec_id"), col("embedding"))
    val withTwin = emb.unionByName(twin)
    Seq(1, 2).foreach { pb =>
      val got = Similarity.lshTopK(twin, withTwin, k = 1, nBits = 6,
        probeBits = pb).collect().head
      assert(got.getAs[Long]("neighbor_id") == 3L)
    }
  }

  test("recallRow: duplicate result pairs don't inflate, empty truth is NULL recall") {
    val truth = Seq((1L, 10L), (1L, 11L)).toDF("query_id", "neighbor_id")
    // the same hit listed twice (un-ranked candidate lists do this) —
    // before the distinct, the left join fanned out to n_truth=3 hits=2
    val result = Seq((1L, 10L), (1L, 10L)).toDF("query_id", "neighbor_id")
    val r = Similarity.recallRow(result, truth, "t", 2).collect().head
    assert(r.getAs[Long]("n_truth") == 2L && r.getAs[Long]("hits") == 1L)
    assert(r.getAs[Double]("recall") == 0.5)
    // empty truth: recall@k over zero truth pairs is undefined -> NULL
    val empty = truth.where(lit(false))
    val e = Similarity.recallRow(result, empty, "t", 2).collect().head
    assert(e.getAs[Long]("n_truth") == 0L && e.isNullAt(e.fieldIndex("recall")))
  }

  test("ivfTopK recall vs brute force on clustered vectors") {
    val rnd = new scala.util.Random(11)
    val centers = Seq.fill(8)(Array.fill(64)(rnd.nextGaussian()))
    val points = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 25
    } yield ((ci * 25 + j).toLong, c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq)
    val corpus = points.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") % 25 === 0)
    val exact = Similarity.bruteForceTopK(queries, corpus, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Similarity.ivfTopK(queries, corpus, k = 5, nCentroids = 8, nProbe = 2)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall too low on clustered data: $recall")
  }

  test("l2Normalize yields unit vectors, keeps zero vectors; meanPool averages element-wise") {
    val df = Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val normed = df.select(col("vec_id"),
        Similarity.l2Normalize(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(normed(1L) == Seq(0.6, 0.8))
    assert(normed(2L) == Seq(0.0, 0.0)) // zero vector passes through
    val pooled = Similarity.meanPool(
      Seq((10L, Seq(1.0f, 2.0f)), (10L, Seq(3.0f, 6.0f)), (11L, Seq(5.0f, 5.0f)))
        .toDF("grp", "embedding"), "grp", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(pooled == Seq((10L, Seq(2.0, 4.0), 2L), (11L, Seq(5.0, 5.0), 1L)))
  }

  test("embeddingNearDups finds an exact duplicate vector") {
    val v = Seq.tabulate(64)(i => math.sin(i).toFloat)
    val w = Seq.tabulate(64)(i => math.cos(i * 2).toFloat)
    val df = Seq((1L, v), (2L, v), (3L, w)).toDF("vec_id", "embedding")
    spark.catalog.clearCache() // isolate from earlier tests' caches
    val pairs = Similarity.embeddingNearDups(df, threshold = 0.99, nBits = 4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
    // the vector cache is released before the call returns — a
    // long-lived session must not accumulate pinned executor storage
    assert(spark.sharedState.cacheManager.isEmpty,
      "embeddingNearDups left a frame in the cache manager")
  }

  test("quantizeInt8 roundtrips within scale/2; zero vectors stay zero") {
    val v = Seq.tabulate(64)(i => (math.sin(i) * 3).toFloat)
    val df = Seq((1L, v), (2L, Seq.fill(64)(0.0f))).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(df)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getSeq[Int](2))))
      .toMap
    val (scale, qv) = q(1L)
    assert(qv.forall(x => x >= -127 && x <= 127))
    assert(qv.map(math.abs).max == 127) // the max component pins the range
    v.map(_.toDouble).zip(qv).foreach { case (orig, qi) =>
      assert(math.abs(orig - qi * scale) <= scale / 2 + 1e-12)
    }
    val (zScale, zQv) = q(2L)
    assert(zScale == 0.0 && zQv.forall(_ == 0))
    // dequantize inverts up to the bound
    val deq = Similarity.quantizeInt8(df).select(col("vec_id"),
        Similarity.dequantizeInt8(col("q"), col("scale")).as("d"))
      .where(col("vec_id") === 1L)
      .select(explode(col("d"))).as[Double].collect()
    deq.zip(v).foreach { case (d, orig) =>
      assert(math.abs(d - orig) <= scale / 2 + 1e-12)
    }
  }

  test("centroidOutliers ranks a planted corrupt vector worst") {
    // 30 vectors near a common direction + one negated (anti-centroid)
    val base = Seq.tabulate(64)(i => math.sin(i * 0.3) + 2.0)
    val rows = (1L to 30L).map { k =>
      (k, base.zipWithIndex.map { case (x, i) =>
        (x + 0.01 * math.cos(i + k)).toFloat })
    } :+ (99L, base.map(x => (-x).toFloat))
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.centroidOutliers(df, k = 3)
      .as[(Long, Double)].collect()
    assert(out.head._1 == 99L)
    assert(out.head._2 < -0.8) // planted vector is anti-aligned
    assert(out.tail.forall(_._2 > 0.9)) // the rest hug the centroid
  }

  test("persisted IVF index returns exactly the inline ivfTopK results") {
    val vecs = (1L to 60L).map { i =>
      val c = (i % 3).toInt
      (i, Seq.tabulate(16)(j =>
        (math.sin(j * 2.1 + c * 40) + 0.05 * math.cos(i + j)).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.where(col("vec_id") <= 3)
    val inline = Similarity.ivfTopK(queries, df, k = 4, nCentroids = 3)
      .collect().map(_.toString).toSet
    val dir = "/tmp/graft_test/ivf_index/t"
    Similarity.buildIvfIndex(df, dir, nCentroids = 3)
    val viaIndex = Similarity.ivfQueryIndex(spark, dir, queries, k = 4)
      .collect().map(_.toString).toSet
    assert(viaIndex == inline)
    // the on-disk layout is cluster-partitioned (per-probe pruning)
    val dirs = new java.io.File(s"$dir/assignments").listFiles()
      .map(_.getName).filter(_.startsWith("cluster="))
    assert(dirs.length == 3)
  }

  test("appendIvfIndex: planted results == rebuild-from-union; layout appended") {
    val vecs = (1L to 80L).map { i =>
      val c = (i % 4).toInt
      (i, Seq.tabulate(16)(j =>
        (math.sin(j * 1.7 + c * 30) + 0.05 * math.cos(i + j)).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val built = df.where(col("vec_id") % 5 =!= 0)
    val batch = df.where(col("vec_id") % 5 === 0)
    // planted queries: ε-copies of vectors from BOTH populations
    val queries = df.where(col("vec_id") <= 6)
      .select((col("vec_id") + 9000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x)).as("embedding"))
    val dirA = "/tmp/graft_test/ivf_append/a"
    Similarity.buildIvfIndex(built, dirA, nCentroids = 4)
    // layout before append: snapshot per-cluster file counts
    def clusterFiles(dir: String): Map[String, Int] =
      new java.io.File(s"$dir/assignments").listFiles()
        .filter(_.getName.startsWith("cluster=")).map(d =>
          d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
        .toMap
    val before = clusterFiles(dirA)
    Similarity.appendIvfIndex(spark, batch, dirA)
    val after = clusterFiles(dirA)
    // nothing rewritten: every pre-existing cluster dir keeps at least
    // its old files; appended clusters gained files
    assert(after.keySet == before.keySet)
    assert(before.forall { case (k, n) => after(k) >= n })
    assert(after.values.sum > before.values.sum)
    // every corpus row present exactly once after the append
    val ids = spark.read.parquet(s"$dirA/assignments")
      .select(col("neighbor_id")).as[Long].collect().sorted
    assert(ids.toSeq == (1L to 80L))
    val viaAppend = Similarity.ivfQueryIndex(spark, dirA, queries, k = 1)
      .collect().map(_.toString).toSet
    val dirB = "/tmp/graft_test/ivf_append/b"
    Similarity.buildIvfIndex(df, dirB, nCentroids = 4)
    val viaRebuild = Similarity.ivfQueryIndex(spark, dirB, queries, k = 1)
      .collect().map(_.toString).toSet
    assert(viaAppend == viaRebuild && viaAppend.size == 6)
    // each planted query's rank-1 is its base (bases on both sides)
    viaAppend.foreach { s => assert(s.contains(",1,")) }
  }

  test("appendIvfIndex through the hierarchical path (nCentroids > 64)") {
    val rnd = new scala.util.Random(41)
    val centers = Seq.fill(12)(Array.fill(16)(rnd.nextGaussian()))
    val base = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 30
    } yield ((ci * 30 + j).toLong,
      c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq)
    val df = base.toDF("vec_id", "embedding")
    val built = df.where(col("vec_id") % 3 =!= 0)
    val batch = df.where(col("vec_id") % 3 === 0)
    val queries = df.where(col("vec_id") % 90 === 0) // all appended bases
      .select((col("vec_id") + 9000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x)).as("embedding"))
    val dir = "/tmp/graft_test/ivf_append/h"
    Similarity.buildIvfIndex(built, dir, nCentroids = 80)
    Similarity.appendIvfIndex(spark, batch, dir)
    val got = Similarity.ivfQueryIndex(spark, dir, queries, k = 1, nProbe = 4)
      .select(col("query_id"), col("neighbor_id")).as[(Long, Long)]
      .collect().toMap
    // an appended exact-twin base must be reachable: the append used
    // the SAME two-level assignment rule the probe replays
    got.foreach { case (q, n) => assert(n == q - 9000, s"query $q -> $n") }
    assert(got.size == queries.count())
  }

  test("diversityPrune: prototypical point dropped, diverse kept; exact 1-cluster case") {
    // mean of {(1,0),(0,1),(0.7,0.7)} points along (1,1): c rides the
    // mean direction (cos 1.0), a and b sit at cos ~0.707; the 2/3
    // quantile threshold lands between them -> c (most prototypical)
    // is the one dropped
    val df = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(0.7, 0.7))).toDF("vec_id", "embedding")
    val kept = Similarity.diversityPrune(df, keepFraction = 2.0 / 3,
      nClusters = 1).select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
    // keepFraction = 1 is the identity
    assert(Similarity.diversityPrune(df, 1.0, nClusters = 1)
      .count() == 3L)
    // clustered path: two orthogonal blobs, each loses its most
    // prototypical third; result deterministic and repartition-proof
    val blobs = Seq(
      (10L, Seq(1.0, 0.0, 0.0)), (11L, Seq(0.9, 0.1, 0.0)),
      (12L, Seq(0.95, 0.05, 0.0)),
      (20L, Seq(0.0, 1.0, 0.0)), (21L, Seq(0.0, 0.9, 0.1)),
      (22L, Seq(0.0, 0.95, 0.05))).toDF("vec_id", "embedding")
    val k1 = Similarity.diversityPrune(blobs, 2.0 / 3, nClusters = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(k1.size == 4 && k1.count(_ < 20L) == 2,
      s"each blob keeps its diverse 2/3: $k1")
    val k2 = Similarity.diversityPrune(blobs.repartition(5), 2.0 / 3,
      nClusters = 2).select("vec_id").as[Long].collect().toSet
    assert(k1 == k2, "diversityPrune must be repartition-invariant")
    intercept[IllegalArgumentException](
      Similarity.diversityPrune(df, 0.0, nClusters = 1))
  }

  test("semDedupPairs finds planted near-dups within clusters; semDedup keeps first") {
    val rnd = new scala.util.Random(13)
    val centers = Seq.fill(4)(Array.fill(32)(rnd.nextGaussian()))
    val base = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 10
    } yield ((ci * 10 + j).toLong,
      c.map(x => (x + rnd.nextGaussian() * 0.3).toFloat).toSeq)
    val corpus = base.toDF("vec_id", "embedding")
    // near-exact copies of each cluster's first member at ids +1000
    val planted = corpus.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x)).as("embedding"))
    val all = corpus.unionByName(planted)
    // in-cluster noise 0.3 keeps base-pair cosine ~0.9; only the
    // ε-copies clear 0.99, and each lands in its base's cluster
    val pairs = Similarity.semDedupPairs(all, threshold = 0.99, nClusters = 4)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(pairs == Set((0L, 1000L), (10L, 1010L), (20L, 1020L), (30L, 1030L)))
    val kept = Similarity.semDedup(all, threshold = 0.99, nClusters = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == base.map(_._1).toSet) // originals survive, copies drop
    // the maxCluster cap bounds the pairwise term: cap 1 -> no pairs
    assert(Similarity.semDedupPairs(all, 0.99, 4, maxCluster = 1).isEmpty)
  }

  test("hierarchical quantizer (large nClusters): planted twins co-cluster, deterministic") {
    // nClusters > 64 takes the two-level driver-local path. EXACT
    // copies are assignment-invariant (identical vector -> identical
    // two-level choice), so their recall must be 1.0; ε-copies can
    // straddle a fine sub-cluster boundary (the paper accepts
    // cross-cluster misses), so they carry a recall FLOOR instead.
    val rnd = new scala.util.Random(29)
    val centers = Seq.fill(12)(Array.fill(32)(rnd.nextGaussian()))
    val base = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 25
    } yield ((ci * 25 + j).toLong,
      c.map(x => (x + rnd.nextGaussian() * 0.3).toFloat).toSeq)
    val corpus = base.toDF("vec_id", "embedding")
    val exact = corpus.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val eps = corpus.filter(col("vec_id") % 25 === 1)
      .select((col("vec_id") + 2000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x)).as("embedding"))
    val all = corpus.unionByName(exact).unionByName(eps)
    val pairs = Similarity.semDedupPairs(all, threshold = 0.99, nClusters = 100)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    // every exact twin MUST surface; no non-planted pair may (noise 0.3
    // keeps base-pair cosine well under 0.99)
    val exactPairs = (0 until 12).map(ci => (ci * 25L, ci * 25L + 1000L)).toSet
    val epsPairs = (0 until 12).map(ci => (ci * 25L + 1, ci * 25L + 2001L)).toSet
    assert(exactPairs.subsetOf(pairs))
    assert(pairs.subsetOf(exactPairs ++ epsPairs))
    assert((pairs & epsPairs).size >= 9) // ε recall floor: >= 9 of 12
    // determinism: a different input partitioning yields identical pairs
    val again = Similarity.semDedupPairs(all.repartition(13),
        threshold = 0.99, nClusters = 100)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(again == pairs)
    // keep-set drops exactly the b-side of the found pairs
    val kept = Similarity.semDedup(all, threshold = 0.99, nClusters = 100)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == (base.map(_._1).toSet ++ epsPairs.map(_._2)) -- pairs.map(_._2))
  }

  test("ivfTopK recall through the hierarchical path (nCentroids > 64)") {
    val rnd = new scala.util.Random(31)
    val centers = Seq.fill(10)(Array.fill(24)(rnd.nextGaussian()))
    val corpus = (for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 30
    } yield ((ci * 30 + j).toLong,
      c.map(x => (x + rnd.nextGaussian() * 0.25).toFloat).toSeq))
      .toDF("vec_id", "embedding")
    // exact copies as queries: the probe rule force-includes the
    // query's own two-level assignment, so the base vector (same
    // cluster by construction) is always reachable -> rank-1 = base
    val queries = corpus.where(col("vec_id") % 60 === 0)
      .select((col("vec_id") + 5000).as("vec_id"), col("embedding"))
    val got = Similarity.ivfTopK(queries, corpus, k = 1, nCentroids = 80,
        nProbe = 4)
      .select(col("query_id"), col("neighbor_id")).as[(Long, Long)]
      .collect().toMap
    (0 until 5).foreach { i =>
      assert(got(i * 60L + 5000L) == i * 60L)
    }
    // the persisted index must keep the two-level probe: an index built
    // at the same nCentroids returns the same rank-1 neighbors (the
    // coarse level + kf persist alongside the flat centroid list)
    val dir = java.nio.file.Files.createTempDirectory("ivf-hier").toString
    Similarity.buildIvfIndex(corpus, dir, nCentroids = 80)
    val viaIndex = Similarity.ivfQueryIndex(spark, dir, queries, k = 1,
        nProbe = 4)
      .select(col("query_id"), col("neighbor_id")).as[(Long, Long)]
      .collect().toMap
    assert(viaIndex == got)
  }

  test("quantized brute-force ANN: bounded ranking drift vs full precision") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val deq = Similarity.quantizeInt8(emb)
      .select(col("vec_id"),
        Similarity.dequantizeInt8(col("q"), col("scale")).as("embedding"))
    val queries = emb.filter(col("vec_id") < 5)
    val full = Similarity.bruteForceTopK(queries, emb, k = 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val quant = Similarity.bruteForceTopK(
        Similarity.quantizeInt8(queries).select(col("vec_id"),
          Similarity.dequantizeInt8(col("q"), col("scale")).as("embedding")),
        deq, k = 5).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("neighbor_id")).toSet }
    // int8 reconstruction error (<= scale/2 per dim) must not push the
    // true top-1 neighbor out of the quantized top-5
    full.foreach { case (q, n1) =>
      assert(quant(q).contains(n1), s"query $q lost $n1 in ${quant(q)}")
    }
  }

  test("product quantization: deterministic codes, recall with exact re-rank") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val model = Similarity.fitPq(emb)
    // determinism: same corpus -> same codebooks -> same codes under
    // any partitioning (the hash-sampled, id-sorted fit contract)
    val c1 = Similarity.pqEncode(emb, model).orderBy("vec_id")
      .as[(Long, Seq[Int])].collect().toSeq
    val model2 = Similarity.fitPq(emb.repartition(7))
    val c2 = Similarity.pqEncode(emb.repartition(13), model2).orderBy("vec_id")
      .as[(Long, Seq[Int])].collect().toSeq
    assert(c1 == c2)
    // codes are m subspace indices in [0, k)
    assert(c1.forall { case (_, cs) =>
      cs.length == model.m && cs.forall(c => c >= 0 && c < model.k) })
    // recall through ADC + exact re-rank. This corpus is the WORST
    // case for ADC — i.i.d. random vectors have no neighbor structure,
    // so all cosines crowd ~0 and quantization error rivals the gaps.
    // Measured at (m=8, k=32, shortlist=100): per-query overlap with
    // the true top-10 is 8..10 of 10; assert >= 7 with margin.
    // (Everything is seeded/deterministic — this bound cannot flake;
    // real embedding corpora, manifold-clustered, do far better.)
    val fine = Similarity.fitPq(emb, m = 8, k = 32)
    val queries = emb.filter(col("vec_id") < 5)
    val top10 = Similarity.bruteForceTopK(queries, emb, k = 10).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val pq = Similarity.pqTopK(queries, emb, fine, k = 10, shortlist = 100)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("neighbor_id")).toSet }
    top10.foreach { case (q, t) =>
      assert((t intersect pq(q)).size >= 7,
        s"query $q kept only ${(t intersect pq(q)).size} of its true top-10")
    }
    // an exact twin planted in the corpus is always recovered at rank 1
    // with cosine ~1 (its codes are identical to the base's)
    val twin = emb.where(col("vec_id") === 7)
      .select((col("vec_id") + 900000).as("vec_id"), col("embedding"))
    val withTwin = emb.select("vec_id", "embedding").unionByName(twin)
    val got = Similarity.pqTopK(twin, withTwin, model, k = 1).collect().head
    assert(got.getAs[Long]("neighbor_id") == 7L)
    assert(math.abs(got.getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("PQ persisted index: append == encode-union with the same model") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_idx")
      .toFile.getPath
    val base = emb.where(col("vec_id") % 7 =!= 0)
    val batch = emb.where(col("vec_id") % 7 === 0)
    val model = Similarity.buildPqIndex(base, dir)
    Similarity.appendPqIndex(spark, batch, dir)
    // the reloaded model is the built one, bit for bit
    val reloaded = Similarity.loadPqModel(spark, dir)
    assert(reloaded.m == model.m && reloaded.dsub == model.dsub)
    assert(reloaded.codebooks.flatten.flatten.toSeq ==
      model.codebooks.flatten.flatten.toSeq)
    // appended codes frame == encoding the union with the SAME model
    val stored = spark.read.parquet(s"$dir/codes").orderBy("vec_id")
      .as[(Long, Seq[Int])].collect().toSeq
    val direct = Similarity.pqEncode(emb, model).orderBy("vec_id")
      .as[(Long, Seq[Int])].collect().toSeq
    assert(stored == direct)
    // queries through the stored index == the inline path on the union
    val queries = emb.filter(col("vec_id") < 3)
    val viaIndex = Similarity.pqQueryIndex(spark, dir, queries, emb, k = 5)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    val inline = Similarity.pqTopK(queries, emb, model, k = 5)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(viaIndex == inline)
  }

  test("PQ append drift: recall vs brute force stays above floor after appends") {
    // the ann_recall_audit failure mode made concrete: codebooks are
    // fitted ONCE on the base corpus, then batches append with no
    // refit (appendPqIndex's documented trade). The recall floor here
    // is the regression tripwire — if encode-with-stale-codebooks
    // degrades beyond the documented creep, this fails before the
    // audit row quietly drifts.
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_drift")
      .toFile.getPath
    // base = one third of the corpus; two appended batches make the
    // index 3x its fitted size
    val base = emb.where(col("vec_id") % 3 === 0)
    Similarity.buildPqIndex(base, dir, m = 8, k = 32)
    Similarity.appendPqIndex(spark, emb.where(col("vec_id") % 3 === 1), dir)
    Similarity.appendPqIndex(spark, emb.where(col("vec_id") % 3 === 2), dir)
    // every id is indexed exactly once
    assert(spark.read.parquet(s"$dir/codes").select("vec_id").distinct().count()
      == emb.count())
    val queries = emb.filter(col("vec_id") < 5)
    val truth = Similarity.bruteForceTopK(queries, emb, k = 10)
    val viaIndex = Similarity.pqQueryIndex(spark, dir, queries, emb, k = 10,
      shortlist = 100)
    val row = Similarity.recallRow(viaIndex, truth, "pq_appended", 10)
      .collect().head
    val recall = row.getAs[Double]("recall")
    // floor: the full-corpus fit measures 8..10 of 10 per query on
    // this worst-case uniform corpus; a third-of-corpus fit costs a
    // little quantization error but must stay well above chance
    assert(recall >= 0.6, s"post-append recall collapsed to $recall")
  }

  test("IVF-PQ append == encode-union with the frozen centroids and codebooks") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val base = emb.where(col("vec_id") % 5 =!= 0)
    val batch = emb.where(col("vec_id") % 5 === 0)
    val dirA = java.nio.file.Files.createTempDirectory("graft_ivfpq_a")
      .toFile.getPath
    val dirB = java.nio.file.Files.createTempDirectory("graft_ivfpq_b")
      .toFile.getPath
    Similarity.buildIvfPqIndex(base, dirA)
    Similarity.buildIvfPqIndex(base, dirB)
    Similarity.appendIvfPqIndex(spark, batch, dirA)
    // reference: append the WHOLE union against dirB's frozen tables —
    // base rows must re-derive their build-time cluster + codes exactly
    // (the append rule replays the build rule), so union-append equals
    // build+batch-append row-for-row
    spark.read.parquet(s"$dirB/codes").count() // materialize layout
    Similarity.appendIvfPqIndex(spark,
      emb.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")),
      dirB)
    val appended = spark.read.parquet(s"$dirA/codes")
      .select(col("vec_id"), col("cluster"), col("codes"))
      .orderBy("vec_id").as[(Long, Int, Seq[Int])].collect().toSeq
    val unionDerived = spark.read.parquet(s"$dirB/codes")
      .where(col("vec_id") >= 1000000L)
      .select((col("vec_id") - 1000000L).as("vec_id"), col("cluster"),
        col("codes"))
      .orderBy("vec_id").as[(Long, Int, Seq[Int])].collect().toSeq
    assert(appended == unionDerived)
    // planted twin whose base arrived BY APPEND is recovered at rank 1
    val twinBase = batch.limit(1)
    val twin = twinBase.select((col("vec_id") + 900000L).as("vec_id"),
      transform(col("embedding"),
        (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x)).as("embedding"))
    val got = Similarity.ivfPqQueryIndex(spark, dirA, twin, emb, k = 1)
      .collect().head
    assert(got.getAs[Long]("neighbor_id") ==
      twinBase.select("vec_id").as[Long].collect().head)
  }

  test("PQ scan plan: native kernels inside WholeStageCodegen, no UDF") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val model = Similarity.fitPq(emb)
    val queries = emb.filter(col("vec_id") < 3)
    // the corpus-wide scans of the PQ path (encode at build time, ADC
    // at query time) must run as native codegen'd expressions — a
    // ScalaUDF would break WholeStageCodegen at exactly the operator
    // whose argument is scan rate
    // `*(n)` is the executed-plan notation for a WholeStageCodegen
    // span; under AQE it only appears once the final plan has
    // materialized, so execute first, then read the plan
    def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    val encPlan = finalPlan(Similarity.pqEncode(emb, model))
    assert(encPlan.contains("graft_pq_encode"), encPlan.take(2000))
    assert(!encPlan.contains("UDF"), encPlan.take(2000))
    assert(encPlan.contains("*(1)"), encPlan.take(2000))
    val qPlan = finalPlan(Similarity.pqTopK(queries, emb, model, k = 5))
    assert(qPlan.contains("graft_adc"), qPlan.take(2000))
    assert(!qPlan.contains("UDF"), qPlan.take(2000))
    assert(qPlan.contains("*("), qPlan.take(2000))
  }

  test("IVF-PQ: cluster-partitioned codes, residual ADC, exact-twin recovery") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq")
      .toFile.getPath
    Similarity.buildIvfPqIndex(emb, dir, nCentroids = 8, m = 8, k = 32)
    // layout: codes live under cluster= partition dirs (the probe's
    // partition pruning surface), one per coarse cell
    val dirs = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.getName.startsWith("cluster=")).map(_.getName).sorted
    assert(dirs.length == 8, dirs.mkString(","))
    // every indexed vector has m codes in [0, k)
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.count() == emb.count())
    // an exact twin: same cluster, same residual codes -> always
    // shortlisted in its own probed cluster, re-ranked to rank 1
    val twin = emb.where(col("vec_id") === 7)
      .select((col("vec_id") + 900000).as("vec_id"), col("embedding"))
    val got = Similarity.ivfPqQueryIndex(spark, dir, twin, emb, k = 1)
      .collect().head
    assert(got.getAs[Long]("neighbor_id") == 7L)
    assert(math.abs(got.getAs[Double]("cosine") - 1.0) < 1e-9)
    // recall on the worst-case random corpus: probing half the cells
    // with a 100-wide shortlist keeps most of the true top-10
    val queries = emb.filter(col("vec_id") < 5)
    val top10 = Similarity.bruteForceTopK(queries, emb, k = 10).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val got10 = Similarity.ivfPqQueryIndex(spark, dir, queries, emb, k = 10,
        nProbe = 4, shortlist = 100).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val hits = top10.map { case (q, t) => (t intersect got10(q)).size }
    // IVF probing bounds recall by cluster coverage (~nProbe/K of the
    // corpus reaches ADC at all); assert a conservative floor — the
    // run is fully seeded, so whatever it measures, it measures forever
    assert(hits.forall(_ >= 3), hits.toSeq.sorted.mkString(","))
  }

  test("centroidOutliers flags zero and null vectors first (sentinel -2)") {
    val good = Seq.tabulate(8)(i => (i + 1).toFloat)
    val rows = Seq(
      (1L, Some(good)),
      (2L, Some(good.map(x => (x * 1.1f)))),
      (3L, Some(Seq.fill(8)(0.0f))), // zero vector: undefined cosine
      (4L, None)                     // null embedding
    )
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.centroidOutliers(df, k = 2)
      .as[(Long, Double)].collect().toMap
    assert(out == Map(3L -> -2.0, 4L -> -2.0))
  }

  test("retractFromVectorIndex: IVF assignments + PQ codes scrubbed, layout kept, search forgets") {
    val vecs = (1L to 60L).map { i =>
      val c = (i % 3).toInt
      (i, Seq.tabulate(16)(j =>
        (math.sin(j * 2.1 + c * 40) + 0.05 * math.cos(i + j)).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val ivfDir = "/tmp/graft_test/retract_ivf/t"
    Similarity.buildIvfIndex(df, ivfDir, nCentroids = 3)
    // planted probe: ε-copy of vec 5 — rank-1 is 5 until retraction
    val q = df.where(col("vec_id") === 5L)
      .select((col("vec_id") + 9000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x))
          .as("embedding"))
    assert(Similarity.ivfQueryIndex(spark, ivfDir, q, k = 1)
      .select("neighbor_id").as[Long].head() == 5L)
    // the list includes a never-indexed id (999) — a no-op row
    val report = graft.streaming.IndexIngest.retractFromVectorIndex(
        spark, ivfDir, Seq(5L, 6L, 999L).toDF("vec_id"), "vec_id")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(report == Map("assignments" -> ((60L, 2L, 58L))), s"report: $report")
    // the cluster-partitioned layout survives the rewrite (the probe
    // path's partition pruning depends on it)
    assert(new java.io.File(s"$ivfDir/assignments").listFiles()
      .exists(_.getName.startsWith("cluster=")))
    val ids = spark.read.parquet(s"$ivfDir/assignments")
      .select("neighbor_id").as[Long].collect().toSet
    assert(!ids.contains(5L) && !ids.contains(6L) && ids.size == 58)
    val afterTop = Similarity.ivfQueryIndex(spark, ivfDir, q, k = 1)
      .select("neighbor_id").as[Long].head()
    assert(afterTop != 5L && afterTop != 6L,
      s"search must no longer return retracted vectors, got $afterTop")
    // PQ codes leg (flat layout, id column vec_id)
    val pqDir = "/tmp/graft_test/retract_pq/t"
    Similarity.buildPqIndex(df, pqDir, m = 4, k = 8)
    val rep2 = graft.streaming.IndexIngest.retractFromVectorIndex(
        spark, pqDir, Seq(5L).toDF("vec_id"), "vec_id")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(rep2 == Seq(("codes", 60L, 1L, 59L)), s"pq report: $rep2")
    assert(!spark.read.parquet(s"$pqDir/codes").select("vec_id")
      .as[Long].collect().contains(5L))
    // a dir that is not a vector index fails loudly
    intercept[IllegalArgumentException] {
      graft.streaming.IndexIngest.retractFromVectorIndex(spark,
        "/tmp/graft_test/retract_ivf/nonexistent",
        Seq(1L).toDF("vec_id"), "vec_id")
    }
  }
}
