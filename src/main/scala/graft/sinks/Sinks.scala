package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}

import graft.columns.ColumnNs

/** Sinks K1-K6, K16, K17 (SURVEY.md §2.2).
  *
  * The reference writes exactly ONE JSON/CSV file per sink with an
  * optional timestamped name (`Load/Factories/AdapterFactory.php:
  * 101-146`). Single-file outputs use `coalesce(1)` ONLY at the
  * terminal sink (never mid-plan — SURVEY §7.4-6); the partitioned
  * variants (`writeJson`/`writeCsv` without `singleFile`) are the scale
  * path.
  */
object Sinks {

  /** Destination naming (`AdapterFactory.php:128-146`): `dir/file.ext`
    * when overwriting, `dir/file-<timestamp>.ext` otherwise. */
  def destination(dir: String, file: String, overwrite: Boolean,
                  timestamp: Long = System.currentTimeMillis() / 1000): String = {
    val (base, ext) = file.lastIndexOf('.') match {
      case -1 => (file, "")
      case i  => (file.substring(0, i), file.substring(i))
    }
    if (overwrite) s"$dir/$base$ext" else s"$dir/$base-$timestamp$ext"
  }

  /** K1 — JSON writer (JSONL; splittable, the at-scale format). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** K2 — CSV writer. */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header).csv(path)

  /** K1 single-file form: one `.json` file at exactly `path` (reference
    * parity). `pretty` rewrites the file as an indented JSON array —
    * driver-side, so only for reference-scale outputs. */
  def writeJsonSingle(df: DataFrame, path: String, pretty: Boolean = false): Unit = {
    writeSingle(df, path, "json")(d => d.write.mode(SaveMode.Overwrite).json(_))
    if (pretty) prettify(df.sparkSession, path)
  }

  /** K2 single-file form. */
  def writeCsvSingle(df: DataFrame, path: String, header: Boolean = true): Unit =
    writeSingle(df, path, "csv")(d => p =>
      d.write.mode(SaveMode.Overwrite).option("header", header).csv(p))

  private def writeSingle(df: DataFrame, path: String, ext: String)
                         (w: DataFrame => String => Unit): Unit = {
    val tmp = path + ".__tmp__"
    w(df.coalesce(1))(tmp)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(tmp), conf)
    val part = fs.globStatus(new Path(tmp, s"part-*"))
      .headOption.getOrElse(sys.error(s"writeSingle: no part file under $tmp"))
    val dest = new Path(path)
    // check both return values: a silent failed delete (dest is a
    // non-empty dir) or failed rename would leave no output and no error
    if (fs.exists(dest) && !fs.delete(dest, false))
      sys.error(s"writeSingle: cannot delete existing $dest")
    Option(dest.getParent).foreach(fs.mkdirs(_))
    if (!fs.rename(part.getPath, dest))
      sys.error(s"writeSingle: rename failed: ${part.getPath} -> $dest")
    fs.delete(new Path(tmp), true)
  }

  /** Reference `flags: pretty` (`AdapterFactory.php:102-107`): JSONL →
    * indented JSON array. Driver-side single-file transform. */
  private def prettify(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    val lines = try src.getLines().filter(_.nonEmpty).toList finally src.close()
    val body = lines.map(l => "  " + l).mkString("[\n", ",\n", "\n]")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      body.getBytes("UTF-8"))
    // the in-place rewrite bypasses Hadoop's ChecksumFileSystem: drop the
    // .crc sidecar (renamed along with the part file) or any checksummed
    // re-read of this file fails
    val f = new java.io.File(path)
    val crc = new java.io.File(f.getParentFile, "." + f.getName + ".crc")
    if (crc.exists()) crc.delete()
  }

  /** K3 — collect-to-array (`to_array`); driver-side by definition. */
  def toArray(df: DataFrame): Array[org.apache.spark.sql.Row] = df.collect()

  /** K4 — debug output (`to_output`). */
  def debug(df: DataFrame, n: Int = 20): Unit = df.show(n, truncate = false)

  /** K5 — prefix-scoped sink wrapper (`AdapterFactory.php:157-170`):
    * project to `prefix.*` (optionally stripping) before any write. */
  def prefixScoped(df: DataFrame, prefixes: Seq[String], removePrefix: Boolean)
                  (write: DataFrame => Unit): Unit =
    write(ColumnNs.selectPrefix(df, prefixes, removePrefix))

  /** K16 — ledger writer: `ledger.*` fields (stripped) + the row uid,
    * one JSON file `dir/name-ledger-<runId>.json`
    * (`LedgerLoader.php:47-60`, `WithLedger.php:81-104`). */
  def writeLedger(df: DataFrame, dir: String, name: String, runId: String,
                  uidCol: String = "etl.uid"): Unit = {
    val cols = graft.columns.ColumnNs.q(uidCol).as("etl_uid") +:
      df.columns.filter(_.startsWith("ledger.")).toSeq
        .map(c => graft.columns.ColumnNs.q(c).as(c.stripPrefix("ledger.")))
    writeJsonSingle(df.select(cols: _*), s"$dir/$name-ledger-$runId.json")
  }

  // ------------------------------------------------------------------
  // K6 — synchronous multi-loader chain with row-mutation hand-off
  // (`SynchronousPipelineLoader.php:40-64`): loaders that generate IDs
  // (posts/terms/media) enrich the batch consumed by later loaders
  // (meta/terms/ledger). Modeled as an ordered list of enrichment
  // stages and terminal writes over one cached DataFrame (SURVEY
  // §7.4-1).
  // ------------------------------------------------------------------
  sealed trait LoadStep
  /** A loader that mutates rows (adds IDs): DataFrame => DataFrame. */
  final case class Enrich(name: String, f: DataFrame => DataFrame) extends LoadStep
  /** A pure sink. */
  final case class Write(name: String, f: DataFrame => Unit) extends LoadStep

  /** Run the chain; the frame is cached at each enrichment boundary so
    * downstream sinks reuse the computed batch instead of recomputing
    * the lineage (the reference streams each batch through all loaders
    * once — caching is the set-oriented equivalent). Returns the final
    * enriched frame. */
  def runChain(df: DataFrame, steps: Seq[LoadStep]): DataFrame = {
    var cur = df.cache()
    steps.foreach {
      case Enrich(_, f) =>
        val next = f(cur).cache()
        cur.unpersist()
        cur = next
      case Write(_, f) => f(cur)
    }
    cur
  }

  /** Bucketed table writer — the co-located-join scale path: two
    * tables bucketed on the same key with the same bucket count join
    * WITHOUT a shuffle on either side (SortMergeJoin reads the bucket
    * files directly). At 100 TB this is how entity tables and their
    * meta/relationship tables should be laid out so every upsert /
    * embedding join skips both exchanges. Requires a catalog table
    * (`saveAsTable`) — bucketing metadata lives in the metastore. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int = 32): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** K17 — composite `WP_Post_All` expansion: the macro loader expands
    * to media → post → meta → terms in that fixed order, deduping
    * members already listed explicitly
    * (`Load/Orchestrator.php:115-147`). */
  def expandComposite(steps: Seq[String],
                      composites: Map[String, Seq[String]] = Map(
                        "wp_post_all" -> Seq("wp_post_media", "wp_post", "wp_post_meta", "wp_post_terms")
                      )): Seq[String] = {
    val out = steps.flatMap(s => composites.getOrElse(s.toLowerCase, Seq(s)))
    out.distinct
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ceil(rows / targetRowsPerFile) evenly-sized files. The cure for
    * the accumulation of tiny part-files that incremental jobs leave
    * behind — at 100 TB a scan over millions of KB-sized files is
    * scheduler-bound, not IO-bound. Staged write + atomic swap
    * ([[Staging.stagedWrite]]): readers never observe a partial
    * directory; failure leaves the input untouched. The file count is
    * a driver-side scalar decision (it parameterizes `repartition`,
    * like AQE's own partition sizing), not data flowing through the
    * driver. Returns the new file count. */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, dir: String,
                     targetRowsPerFile: Long): Int = {
    require(targetRowsPerFile > 0)
    val rows = spark.read.parquet(dir).count()
    val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    Staging.stagedWrite(spark, dir) { staging =>
      // round-robin repartition: even file sizes without a shuffle key
      spark.read.parquet(dir).repartition(nFiles)
        .write.mode(SaveMode.Overwrite).parquet(staging)
    }
    nFiles
  }

  /** Training-shard export: deterministic md5-rank shuffle
    * ([[graft.llm.Packing.shardShuffle]]) materialized as one directory
    * per shard (`shard=N/part-*`), rows ordered by rank within each
    * shard. Assignment and order are functions of the key alone, so the
    * SAME shards come out at any parallelism on any cluster — the
    * reproducibility contract a training run needs for resumable data
    * loading. One shuffle (repartition by shard), sort local to each
    * shard. */
  def writeShards(df: DataFrame, keyCol: String, dir: String, nShards: Int,
                  format: String = "parquet"): Unit =
    graft.llm.Packing.shardShuffle(df, keyCol, nShards)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("rank"))
      .write.partitionBy("shard").format(format)
      .mode(SaveMode.Overwrite).save(dir)

  /** Z-order (Morton) interleave of `cols` — the multi-dimensional
    * clustering key behind z-ordered table layouts: rows close in ALL
    * dimensions land close in the one-dimensional sort, so per-file
    * min/max ranges stay tight in every dimension and a scan filtering
    * on ANY subset of the z-columns can skip most files (a plain sort
    * only serves its leading column). Bit j of column i lands at
    * position `j * n + i`. Pure codegen'd long arithmetic.
    *
    * Inputs must be non-negative and < 2^bits (hash or bucketize
    * first for arbitrary domains — [[writeZOrdered]] rescales into this
    * range automatically); `n * bits` must fit a signed long. */
  def zValue(cols: Seq[org.apache.spark.sql.Column], bits: Int = 21): org.apache.spark.sql.Column = {
    val n = cols.size
    require(n >= 1, "zValue: no columns")
    require(bits >= 1, s"zValue: bits must be >= 1, got $bits")
    require(n * bits <= 63, s"zValue: $n cols × $bits bits exceeds a long")
    (0 until bits).flatMap { j =>
      cols.zipWithIndex.map { case (c, i) =>
        shiftleft(shiftright(c.cast("long"), j).bitwiseAND(lit(1L)), j * n + i)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Z-ordered rewrite: rescale each clustering column into
    * [0, 2^bits) from its observed min/max (one column-pruned aggregate
    * scan — makes zValue's domain precondition hold for ANY numeric
    * column, negatives included, instead of silently aliasing rows that
    * exceed 2^bits), then range-partition on the interleaved key and
    * sort within partitions — every output file covers a tight z-range
    * (tight min/max in every z dimension). One stats scan + one range
    * shuffle; the clustering column itself is dropped from the output.
    * Nulls sort first (rescaled to 0). */
  def writeZOrdered(df: DataFrame, dir: String, zCols: Seq[String],
                    bits: Int = 21, numFiles: Int = 0): Unit = {
    val maxZ = (1L << bits) - 1
    val aggs = zCols.flatMap(c => Seq(min(col(c).cast("double")),
      max(col(c).cast("double"))))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val scaled = zCols.zipWithIndex.map { case (c, i) =>
      if (stats.isNullAt(2 * i)) lit(0L) // empty input / all-null column
      else {
        val (lo, hi) = (stats.getDouble(2 * i), stats.getDouble(2 * i + 1))
        val v = coalesce(col(c).cast("double"), lit(lo))
        if (hi == lo) lit(0L)
        // span fits the bit budget: exact shift-by-min, no FP rounding
        else if (hi - lo <= maxZ) (v - lit(lo)).cast("long")
        else floor((v - lit(lo)) / lit(hi - lo) * maxZ).cast("long")
      }
    }
    val zc = Iterator.from(0).map(i => s"__z$i")
      .find(nm => !df.columns.contains(nm)).get
    val keyed = df.withColumn(zc, zValue(scaled, bits))
    val n = if (numFiles > 0) numFiles
      else df.sparkSession.sessionState.conf.numShufflePartitions
    keyed.repartitionByRange(n, col(zc))
      .sortWithinPartitions(col(zc))
      .drop(zc)
      .write.mode(SaveMode.Overwrite).parquet(dir)
  }

  /** Hive-style partitioned layout (`col=value/` directories): the
    * standard at-rest organization for a multi-tenant / multi-language
    * corpus — a reader filtering on a partition column scans ONLY the
    * matching directories (partition pruning, visible as
    * `PartitionFilters` on the scan node with no partition-column
    * `PushedFilters` needed). Rows are pre-shuffled on the partition
    * columns so each partition directory is written by few tasks
    * (without this, every task can emit a file into every partition —
    * tasks × partitions small files). */
  def writePartitioned(df: DataFrame, dir: String, partCols: Seq[String],
                       format: String = "parquet"): Unit = {
    require(partCols.nonEmpty, "writePartitioned: no partition columns")
    df.repartition(partCols.map(col): _*)
      .write.partitionBy(partCols: _*).format(format)
      .mode(SaveMode.Overwrite).save(dir)
  }
}
