package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences: exclusive offsets, boundary straddle keeps starting pack") {
    val df = Seq((1L, 10L), (2L, 90L), (3L, 30L), (4L, 100L), (5L, 1L))
      .toDF("doc_id", "n")
    val out = Packing.packSequences(df, "doc_id", col("n"), budget = 100)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // offsets: 0, 10, 100, 130, 230; packs of 100 tokens
    assert(out.toSeq == Seq(
      (1L, 0L, 0L),
      (2L, 10L, 0L),   // spans the 100 boundary -> keeps pack 0
      (3L, 100L, 1L),
      (4L, 130L, 1L),  // 130..229 spans packs 1-2 -> keeps pack 1
      (5L, 230L, 2L)))
  }

  test("packSequences: result independent of input partitioning, no global window") {
    val df = spark.range(1, 501).select(col("id").as("doc_id"),
      (col("id") % 37 + 1).as("n"))
    val a = Packing.packSequences(df, "doc_id", col("n"), budget = 256, numParts = 7)
    val b = Packing.packSequences(df.repartition(13), "doc_id", col("n"),
      budget = 256, numParts = 3)
    assert(rowsOf(a) == rowsOf(b))
    // total stream length conservation: last doc's offset + tokens = sum
    val last = a.orderBy(col("doc_id").desc).limit(1)
      .select(col("token_offset") + col("n_tokens")).head().getLong(0)
    assert(last == df.agg(sum("n")).head().getLong(0))
    // the data-bearing windows are partitioned by __pid: no Window node
    // over the full input without partitioning (the only unpartitioned
    // window runs over the numParts-row offsets frame)
    val plan = a.queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(__pid"))
  }

  test("packSequences: offsets identical across repeated independent runs") {
    // the two-branch __pid shape corrupts token_offset if the offsets
    // aggregation and the final join ever observe different partition
    // assignments; base is localCheckpoint-pinned, so repeated runs
    // (fresh plans, no exchange reuse between them) must agree exactly
    val df = spark.range(1, 2001).select(col("id").as("doc_id"),
      (col("id") % 53 + 1).as("n"))
    val runs = (1 to 3).map { i =>
      rowsOf(Packing.packSequences(df.repartition(5 + i), "doc_id",
        col("n"), budget = 512, numParts = 11))
    }
    assert(runs.distinct.size == 1)
  }

  test("packMaterialize: stream order, conservation, straddle keeps starting pack") {
    val df = Seq(
      (1L, Seq("a", "b", "c")),          // offset 0, pack 0
      (2L, Seq("d", "e")),               // offset 3, pack 0 (straddles 4)
      (3L, Seq("f")),                    // offset 5, pack 1
      (4L, Seq("g", "h", "i", "j"))      // offset 6, pack 1 (straddles 8)
    ).toDF("doc_id", "toks")
    val out = Packing.packMaterialize(df, "doc_id", col("toks"), budget = 4)
      .orderBy("pack_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[String](3).toList))
    assert(out.toSeq == Seq(
      (0L, 2L, 5L, List("a", "b", "c", "d", "e")),
      (1L, 2L, 5L, List("f", "g", "h", "i", "j"))))
    // conservation across any partitioning
    val big = spark.range(1, 301).select(col("id").as("doc_id"),
      array_repeat(concat(lit("t"), col("id")), (col("id") % 7 + 1).cast("int"))
        .as("toks"))
    val packs = Packing.packMaterialize(big.repartition(11), "doc_id",
      col("toks"), budget = 64)
    val total = big.select(sum(size(col("toks")))).head().getLong(0)
    assert(packs.agg(sum(col("n_tokens"))).head().getLong(0) == total)
    assert(packs.agg(sum(size(col("tokens")))).head().getLong(0) == total)
  }

  test("packSequences: empty and single-row inputs") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "n")
    assert(Packing.packSequences(empty, "doc_id", col("n"), 100).count() == 0)
    val one = Packing.packSequences(Seq((7L, 5L)).toDF("doc_id", "n"),
      "doc_id", col("n"), 100).head()
    assert((one.getLong(2), one.getLong(3)) == (0L, 0L))
  }

  test("shardShuffle: stable shard/rank, bounded range, ~uniform balance") {
    val df = spark.range(0, 1000).select(col("id").as("doc_id"))
    val out = Packing.shardShuffle(df, "doc_id", nShards = 8).cache()
    // deterministic: same input -> identical assignment
    assert(rowsOf(out) == rowsOf(Packing.shardShuffle(df.repartition(13), "doc_id", 8)))
    val shards = out.groupBy("shard").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shards.keySet.forall(s => s >= 0 && s < 8))
    // the 8-hex-digit (2^32) key is exactly uniform for power-of-two
    // nShards; md5 balance over 1000 ids stays within a loose band
    assert(shards.values.forall(c => c > 60 && c < 190), shards.toString)
    // rank is the md5 hex of the id
    val row = out.where(col("doc_id") === 42).head()
    assert(row.getAs[String]("rank") ==
      java.security.MessageDigest.getInstance("MD5").digest("42".getBytes)
        .map("%02x".format(_)).mkString)
    // shard = first 8 hex digits of rank, mod nShards — the documented
    // cross-engine contract (replayable from the rank column alone)
    val all = out.collect()
    all.foreach { r =>
      val expected = java.lang.Long.parseLong(
        r.getAs[String]("rank").substring(0, 8), 16) % 8
      assert(r.getAs[Long]("shard") == expected)
    }
    out.unpersist()
  }

  test("shardShuffle: epoch salts give independent deterministic orders") {
    val df = spark.range(0, 500).select(col("id").as("doc_id"))
    def ranks(salt: String) = Packing.shardShuffle(df, "doc_id", 8, salt)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    // deterministic per salt…
    assert(ranks("epoch1") == ranks("epoch1"))
    // …but different across salts (a real reshuffle), and the default
    // salt is the identity (byte-compatible with persisted manifests)
    assert(ranks("epoch1") != ranks("epoch2"))
    assert(ranks("") == Packing.shardShuffle(df, "doc_id", 8)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq)
    // salted shard membership still respects the documented contract
    val r = Packing.shardShuffle(df, "doc_id", 8, "epoch1")
      .where(col("doc_id") === 42).head()
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest("epoch142".getBytes).map("%02x".format(_)).mkString
    assert(r.getAs[String]("rank") == md5)
    assert(r.getAs[Long]("shard") ==
      java.lang.Long.parseLong(md5.substring(0, 8), 16) % 8)
  }

  test("shardShuffle: nShards beyond 256 (skew bound at 4096 shards)") {
    // the former two-hex-digit key capped nShards at 256 — a 100 TB
    // corpus at ~1 GB/shard wants ~1e5; verify the lifted cap keeps
    // the load within the documented uniformity bound
    val n = 20000
    val df = spark.range(0, n).select(col("id").as("doc_id"))
    val counts = Packing.shardShuffle(df, "doc_id", nShards = 4096)
      .groupBy("shard").count().collect().map(_.getLong(1))
    // expectation ~4.9 rows/shard; the structural skew of the 2^32 key
    // (<= nShards/2^32) is invisible next to sampling noise — just
    // bound the max against a Poisson-tail envelope
    assert(counts.max <= 20, s"max shard load ${counts.max}")
    assert(counts.sum == n)
    // the cap itself: 2^20 accepted, beyond rejected
    Packing.shardShuffle(df.limit(1), "doc_id", 1 << 20).head()
    intercept[IllegalArgumentException] {
      Packing.shardShuffle(df, "doc_id", (1 << 20) + 1)
    }
  }

  test("writeShards: one dir per shard, identical output at different parallelism") {
    import graft.sinks.Sinks
    val df = spark.range(0, 500).select(col("id").as("doc_id"),
      (col("id") * 3).as("payload"))
    val d1 = java.nio.file.Files.createTempDirectory("graft_sh1").toFile.getPath
    val d2 = java.nio.file.Files.createTempDirectory("graft_sh2").toFile.getPath
    Sinks.writeShards(df, "doc_id", d1, nShards = 4)
    Sinks.writeShards(df.repartition(17), "doc_id", d2, nShards = 4)
    val r1 = spark.read.parquet(d1)
    assert(r1.select("shard").distinct().count() == 4)
    assert(new java.io.File(d1).listFiles().count(_.getName.startsWith("shard=")) == 4)
    // reproducibility: same shards and in-shard rank order either way
    def dump(p: String) = spark.read.parquet(p)
      .select("shard", "rank", "doc_id", "payload")
      .orderBy("shard", "rank").collect().toSeq
    assert(dump(d1) == dump(d2))
    assert(r1.count() == 500)
  }

  test("writeTrainingShards: manifest certifies the on-disk shards") {
    val df = spark.range(0, 400).select(col("id").as("doc_id"),
      concat(lit("doc "), col("id")).as("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft_tsh").toFile.getPath
    val manifest = Packing.writeTrainingShards(df, "doc_id", dir, nShards = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(manifest.size == 4)
    assert(manifest.values.map(_.getLong(1)).sum == 400)
    // the persisted manifest equals an independent recomputation from
    // the written files
    val recomputed = spark.read.parquet(s"$dir/data")
      .groupBy(col("shard").cast("long"))
      .agg(count(lit(1)), sum(Packing.rankDigest(col("rank"))))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    manifest.foreach { case (sh, r) =>
      assert(recomputed(sh) == ((r.getLong(1), r.getLong(2))))
    }
    // a tampered shard no longer matches its manifest checksum
    val tampered = spark.read.parquet(s"$dir/data")
      .where(col("shard") === 0).limit(1)
    val missingOne = spark.read.parquet(s"$dir/data").where(col("shard") === 0)
      .join(tampered.select(col("doc_id").as("gone")),
        col("doc_id") === col("gone"), "left_anti")
      .agg(sum(Packing.rankDigest(col("rank")))).collect().head.getLong(0)
    assert(missingOne != manifest(0L).getLong(2))
  }

  test("auditShards: corruption taxonomy — ok, missing, unexpected, mismatch") {
    import java.nio.file.{Files, Paths}
    val df = spark.range(0, 400).select(col("id").as("doc_id"),
      concat(lit("doc "), col("id")).as("text"))
    val dir = Files.createTempDirectory("graft_audit").toFile.getPath
    Packing.writeTrainingShards(df, "doc_id", dir, nShards = 4)
    def statuses(): Map[Long, String] =
      Packing.auditShards(spark, dir)
        .select(col("shard"), col("status")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    // undamaged layout: every shard ok
    assert(statuses() == (0L to 3L).map(_ -> "ok").toMap)
    // failOnBad kind passes on a clean layout
    graft.pipeline.ConfigLoader.loadKinds("audit_shards")(Map(
      "dir" -> dir, "failOnBad" -> "true")) match {
      case graft.sinks.Sinks.Write(_, f) => f(df)
      case other => fail(s"unexpected step: $other")
    }
    // stray partition: copy shard=3's files in as shard=9
    val s3 = Paths.get(s"$dir/data/shard=3")
    val s9 = Paths.get(s"$dir/data/shard=9")
    Files.createDirectories(s9)
    Files.list(s3).forEach(p =>
      Files.copy(p, s9.resolve(p.getFileName.toString)))
    assert(statuses() == ((0L to 3L).map(_ -> "ok").toMap + (9L -> "unexpected")))
    // missing partition: delete shard=1's directory
    Files.list(Paths.get(s"$dir/data/shard=1")).forEach(Files.delete(_))
    Files.delete(Paths.get(s"$dir/data/shard=1"))
    assert(statuses()(1L) == "missing")
    // doctored manifest: +1 row on shard 0 -> mismatch
    val doctored = spark.read.parquet(s"$dir/manifest")
      .withColumn("n_rows", when(col("shard") === 0,
        col("n_rows") + 1).otherwise(col("n_rows")))
      .localCheckpoint(true)
    doctored.coalesce(1).write.mode("overwrite").parquet(s"$dir/manifest")
    val st = statuses()
    assert(st(0L) == "mismatch" && st(1L) == "missing" &&
      st(2L) == "ok" && st(9L) == "unexpected")
    // failOnBad raises with the bad-shard count
    val err = intercept[IllegalArgumentException] {
      graft.pipeline.ConfigLoader.loadKinds("audit_shards")(Map(
        "dir" -> dir, "failOnBad" -> "true")) match {
        case graft.sinks.Sinks.Write(_, f) => f(df)
        case other => fail(s"unexpected step: $other")
      }
    }
    assert(err.getMessage.contains("3 shard(s) failed"))
    // catastrophic: EVERY data partition lost -> still a report (all
    // manifest rows missing), not a parquet schema-inference failure
    val conf = spark.sessionState.newHadoopConf()
    val dataPath = new org.apache.hadoop.fs.Path(s"$dir/data")
    val hfs = dataPath.getFileSystem(conf)
    hfs.delete(dataPath, true)
    hfs.mkdirs(dataPath)
    assert(statuses().values.toSet == Set("missing"))
  }

  test("readShard: partition-pruned to one shard directory") {
    val df = spark.range(0, 300).select(col("id").as("doc_id"))
    val dir = java.nio.file.Files.createTempDirectory("graft_rsh").toFile.getPath
    val manifest = Packing.writeTrainingShards(df, "doc_id", dir, nShards = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val one = Packing.readShard(spark, dir, 2)
    assert(one.count() == manifest(2L))
    assert(one.select(col("shard").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // the shard filter must prune at planning time, not post-scan
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("shard"))
    val scanned = one.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }.sum
    assert(scanned == 1, s"expected 1 pruned partition, scanned $scanned")
  }

  test("ngramJaccardPairs maxBlock drops oversized blocks only") {
    val docs = Seq(
      (1L, "aa bb cc dd", "x"), (2L, "aa bb cc dd", "x"), (3L, "aa bb cc ee", "x"),
      (4L, "zz yy ww vv", "y"), (5L, "zz yy ww vv", "y")).toDF("doc_id", "text", "blk")
    def pairs(maxBlock: Int) =
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", Seq(col("blk")),
          n = 1, threshold = 0.5, maxBlock = maxBlock)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // unguarded: both blocks pair
    assert(pairs(0) == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
    // block "x" (3 docs) exceeds maxBlock=2 and is dropped; "y" survives
    assert(pairs(2) == Set((4L, 5L)))
  }

  /** Reference sequential first-fit (the whole stream as one group). */
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

  test("packGreedy: fold rule, oversize isolation, dense ids") {
    // budget 10: [4,5] fill pack0; 6 opens pack1; 12 oversize -> own
    // pack2 (closing pack1); 3,7 fill pack3; 10 exact-fit opens pack4
    val docs = Seq(4L, 5L, 6L, 12L, 3L, 7L, 10L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "t")
    val out = Packing.packGreedy(docs, "doc_id", col("t"), budget = 10,
        docsPerGroup = 100)
      .orderBy("doc_id")
      .select("doc_id", "pack_id", "oversize")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((0L, 0L, false), (1L, 0L, false), (2L, 1L, false),
      (3L, 2L, true), (4L, 3L, false), (5L, 3L, false), (6L, 4L, false)))
    // invariant: no non-oversize pack exceeds the budget; ids dense
    val packs = Packing.packGreedy(docs, "doc_id", col("t"), 10, 100)
    val sums = packs.groupBy("pack_id")
      .agg(sum(col("n_tokens")).as("s"), max(col("oversize")).as("o"))
      .as[(Long, Long, Boolean)].collect()
    assert(sums.forall { case (_, s, o) => o || s <= 10 })
    assert(sums.map(_._1).sorted.toSeq == (0L until sums.length).toSeq)
  }

  test("packGreedy: single group ≡ sequential reference; bounded groups conserve docs") {
    val tokens = Seq(3L, 9L, 2L, 2L, 2L, 15L, 1L, 8L, 8L, 1L, 4L, 4L, 4L, 0L, 6L)
    val docs = tokens.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "t")
    val one = Packing.packGreedy(docs, "doc_id", col("t"), budget = 10,
        docsPerGroup = 1000)
      .orderBy("doc_id").select("pack_id").as[Long].collect().toSeq
    assert(one == greedyRef(tokens, 10).map(_.toLong))
    // small groups: same doc set exactly once, every pack still legal,
    // at most one underfull pack per group boundary (ids differ)
    val small = Packing.packGreedy(docs, "doc_id", col("t"), budget = 10,
      docsPerGroup = 4)
    assert(small.select("doc_id").as[Long].collect().sorted.toSeq ==
      tokens.indices.map(_.toLong))
    val sums = small.groupBy("pack_id")
      .agg(sum(col("n_tokens")).as("s"), max(col("oversize")).as("o"))
      .as[(Long, Long, Boolean)].collect()
    assert(sums.forall { case (_, s, o) => o || s <= 10 })
  }

  test("packSequencesAppend: append ≡ repack-of-union; partial pack keeps filling") {
    val docs = Seq((1L, 3L), (2L, 4L), (3L, 2L), (4L, 5L), (5L, 1L), (6L, 7L))
      .toDF("doc_id", "t")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().toSeq
    val full = Packing.packSequences(docs, "doc_id", col("t"), budget = 6)
    val first = Packing.packSequences(
      docs.where(col("doc_id") <= 3), "doc_id", col("t"), budget = 6)
    val start = Packing.assignedTokenTotal(first)
    assert(start == 9L)
    val appended = Packing.packSequencesAppend(
      docs.where(col("doc_id") > 3), "doc_id", col("t"),
      budget = 6, startOffset = start)
    assert(rows(first.unionByName(appended)) == rows(full))
    // the batch's first doc landed mid-pack (offset 9 -> pack 1), not
    // at a fresh pack boundary — the partial pack kept filling
    assert(appended.orderBy("doc_id").select("pack_id").as[Long]
      .collect().head == 1L)
    // empty-assignment total is 0 (first batch of a new corpus)
    assert(Packing.assignedTokenTotal(full.where(col("doc_id") < 0)) == 0L)
    // the append-equals-repack precondition is CHECKED when the caller
    // supplies the corpus max id: an interleaving batch throws instead
    // of silently corrupting the stream
    intercept[IllegalArgumentException] {
      Packing.packSequencesAppend(
        docs.where(col("doc_id") > 2), "doc_id", col("t"),
        budget = 6, startOffset = start, minBatchIdExclusive = Some(3L))
    }
    // a conforming batch passes the guard with identical output
    val guarded = Packing.packSequencesAppend(
      docs.where(col("doc_id") > 3), "doc_id", col("t"),
      budget = 6, startOffset = start, minBatchIdExclusive = Some(3L))
    assert(rows(guarded) == rows(appended))
    // an empty batch is vacuously ordered
    assert(Packing.packSequencesAppend(
      docs.where(col("doc_id") < 0), "doc_id", col("t"),
      budget = 6, startOffset = start,
      minBatchIdExclusive = Some(3L)).count() == 0L)
  }

  test("lengthBucketBatches: NTILE semantics, determinism, measured padding win") {
    val df = spark.range(0, 1000)
      .select(col("id").as("doc_id"),
        (pmod(col("id") * 37 + 11, lit(500L)) + 1).as("t"))
    val out = Packing.lengthBucketBatches(df, "doc_id", col("t"),
      nBuckets = 8, batchSize = 16).cache()
    // equal-count buckets (1000 = 8 x 125), 1-based like SQL NTILE
    val sizes = out.groupBy("bucket").count().orderBy("bucket")
      .as[(Long, Long)].collect().toSeq
    assert(sizes == (1L to 8L).map(b => b -> 125L))
    // batches are full (batchSize) except possibly each bucket's last
    val batchSizes = out.groupBy("bucket", "batch_id").count()
      .as[(Long, Long, Long)].collect()
    assert(batchSizes.forall(_._3 <= 16))
    assert(batchSizes.count(_._3 < 16) <= 8)
    // deterministic under any input partitioning
    val again = Packing.lengthBucketBatches(df.repartition(13), "doc_id",
      col("t"), nBuckets = 8, batchSize = 16)
    assert(out.orderBy("doc_id").collect().toSeq ==
      again.orderBy("doc_id").collect().toSeq)
    // bucketing must actually cut pad-to-max waste vs id-order batches
    val bucketedPad = Packing.lengthBucketPadding(df, "doc_id", col("t"),
        nBuckets = 8, batchSize = 16)
      .agg(sum(col("padding_tokens"))).head().getLong(0)
    val idOrderPad = df
      .withColumn("batch", floor(col("doc_id") / 16))
      .groupBy("batch")
      .agg((max(col("t")) * count(lit(1)) - sum(col("t"))).as("pad"))
      .agg(sum(col("pad"))).head().getLong(0)
    assert(bucketedPad < idOrderPad / 2,
      s"bucketed=$bucketedPad idOrder=$idOrderPad")
    out.unpersist()
  }

  test("bucketedPackGreedy: packs stay in-bucket, dense ids, measured padding win") {
    val df = spark.range(0, 1000)
      .select(col("id").as("doc_id"),
        (pmod(col("id") * 37 + 11, lit(500L)) + 1).as("t"))
    val out = Packing.bucketedPackGreedy(df, "doc_id", col("t"),
      nBuckets = 8, budget = 600, docsPerGroup = 64).cache()
    // conservation: every doc exactly once, token counts intact
    assert(out.count() == 1000)
    assert(out.agg(sum(col("n_tokens"))).head().getLong(0) ==
      df.agg(sum(col("t"))).head().getLong(0))
    // pack ids dense from 0
    val ids = out.select("pack_id").distinct().as[Long].collect().sorted
    assert(ids.head == 0L && ids.last == ids.length - 1)
    // a pack never crosses a bucket boundary
    assert(out.groupBy("pack_id")
      .agg(countDistinct(col("bucket")).as("nb"))
      .where(col("nb") > 1).count() == 0)
    // no pack exceeds the budget (no oversize docs at these lengths)
    assert(out.where(col("oversize")).count() == 0)
    assert(out.groupBy("pack_id").agg(sum(col("n_tokens")).as("pt"))
      .where(col("pt") > 600).count() == 0)
    // deterministic under any input partitioning
    val again = Packing.bucketedPackGreedy(df.repartition(13), "doc_id",
      col("t"), nBuckets = 8, budget = 600, docsPerGroup = 64)
    assert(out.orderBy("doc_id").collect().toSeq ==
      again.orderBy("doc_id").collect().toSeq)
    // the whole point: tighter packs than stream-order greedy on the
    // same corpus/budget/groups (length-sorted neighbors fill packs)
    def padding(asg: org.apache.spark.sql.DataFrame): Long = asg
      .groupBy("pack_id").agg(sum(col("n_tokens")).as("pt"))
      .agg(sum(lit(600L) - col("pt"))).head().getLong(0)
    val streamPad = padding(Packing.packGreedy(df, "doc_id", col("t"),
      budget = 600, docsPerGroup = 64))
    val bucketedPad = padding(out)
    assert(bucketedPad < streamPad,
      s"bucketed=$bucketedPad stream=$streamPad")
    out.unpersist()
  }

  test("packMaterialize docSep: (doc + EOS)* stream, separator-free accounting") {
    val docs = Seq((1L, Seq("a", "b")), (2L, Seq("c")), (3L, Seq("d", "e")))
      .toDF("doc_id", "toks")
    val out = Packing.packMaterialize(docs, "doc_id", col("toks"),
        budget = 3, docSep = Some("<eos>"))
      .orderBy("pack_id")
      .select("pack_id", "n_tokens", "tokens")
      .as[(Long, Long, Seq[String])].collect().toSeq
    // budget 3: docs 1+2 fill pack 0 (3 tokens), doc 3 opens pack 1;
    // n_tokens stays the DOC sum, the stream carries one <eos> per doc
    assert(out == Seq(
      (0L, 3L, Seq("a", "b", "<eos>", "c", "<eos>")),
      (1L, 2L, Seq("d", "e", "<eos>"))))
    // no separator -> the round-6 behavior, unchanged
    val plain = Packing.packMaterialize(docs, "doc_id", col("toks"), budget = 3)
      .orderBy("pack_id").select("tokens").as[Seq[String]].collect().toSeq
    assert(plain == Seq(Seq("a", "b", "c"), Seq("d", "e")))
  }

  test("packGreedyMaterialize: no-split streams in member order, oversize flagged") {
    val docs = Seq(
      (1L, Seq("a", "b")), (2L, Seq("c")), (3L, Seq("d", "e", "f", "g")),
      (4L, Seq("h", "i"))).toDF("doc_id", "toks")
    // budget 3: docs 1+2 fill pack 0; doc 3 (4 toks) oversize -> own
    // pack 1; doc 4 opens pack 2
    val out = Packing.packGreedyMaterialize(docs, "doc_id", col("toks"),
        budget = 3, docsPerGroup = 100, docSep = Some("<eos>"))
      .orderBy("pack_id")
      .select("pack_id", "n_docs", "oversize", "tokens")
      .as[(Long, Long, Boolean, Seq[String])].collect().toSeq
    assert(out == Seq(
      (0L, 2L, false, Seq("a", "b", "<eos>", "c", "<eos>")),
      (1L, 1L, true, Seq("d", "e", "f", "g", "<eos>")),
      (2L, 1L, false, Seq("h", "i", "<eos>"))))
  }

  test("packGreedy: deterministic across input partitioning") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("t"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packGreedy(df, "doc_id", col("t"), budget = 256,
          docsPerGroup = 16)
        .orderBy("doc_id").collect().toSeq
    assert(run(docs) == run(docs.repartition(7)))
  }

  test("packByScore: curriculum order, tie falls back to id, negative score trips") {
    import org.apache.spark.sql.functions._
    // (id, score, tokens): curriculum order by (score, id) is
    // 4 (s=1), 1 (s=2), 3 (s=2), 2 (s=5) -> offsets 0, 7, 12, 15
    val df = Seq((1L, 2L, 5L), (2L, 5L, 9L), (3L, 2L, 3L), (4L, 1L, 7L))
      .toDF("doc_id", "score", "n")
    val out = Packing.packByScore(df, "doc_id", col("score"), col("n"),
        budget = 10)
      .select("doc_id", "token_offset", "pack_id")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(4L -> ((0L, 0L)), 1L -> ((7L, 0L)),
      3L -> ((12L, 1L)), 2L -> ((15L, 1L))), s"got $out")
    val ex = intercept[Exception] {
      Packing.packByScore(
        Seq((1L, -1L, 5L)).toDF("doc_id", "score", "n"),
        "doc_id", col("score"), col("n"), budget = 10).collect()
    }
    assert(ex.getMessage != null)
  }
}
