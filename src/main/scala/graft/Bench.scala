package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Accumulates shuffle bytes across completed stages — the measured
  * counterpart of PLANS.md's "map-only / one shuffle" claims. Listener
  * events arrive asynchronously; [[settle]] polls until the counters
  * are quiescent so per-query deltas attribute correctly in a
  * sequential bench. */
private class ShuffleTally extends SparkListener {
  val read = new java.util.concurrent.atomic.AtomicLong
  val write = new java.util.concurrent.atomic.AtomicLong
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val m = sc.stageInfo.taskMetrics
    if (m != null) {
      read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }
  }
  def snapshot(): (Long, Long) = (read.get(), write.get())
  def settle(maxMs: Long = 2000): Unit = {
    var last = snapshot(); var stableFor = 0L; val t0 = System.nanoTime()
    while (stableFor < 200 && (System.nanoTime() - t0) / 1e6 < maxMs) {
      Thread.sleep(50)
      val cur = snapshot()
      if (cur == last) stableFor += 50 else { stableFor = 0; last = cur }
    }
  }
}

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line. Failures are explicit: the failed query
  * reports -1 timing AND lands in the "errors" object with its message
  * (a failed query must never be mistaken for a fast one). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the session (executor threads, codegen, parquet footer
    // reads, the hash-aggregate/sort/decimal classes the first real
    // query would otherwise be charged for) so measurements start at
    // steady state
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(2000)
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("l_quantity").cast("decimal(18,2)")))
      .orderBy("l_returnflag")
      .write.format("noop").mode("overwrite").save()
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    // this container shows bursty host-level CPU steal (BASELINE.md
    // variance caveat); measuring each query `runs` times and keeping
    // the FLOOR reports steady-state engine time instead of whichever
    // burst a single sample landed in
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    // optional comma-separated name filter for targeted re-floors of a
    // single query (e.g. confirming whether a per-query regression is
    // real or host-steal noise) without paying the full-suite wall time
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val selected = filter match {
      case Some(names) => Queries.all.filter(q => names(q.name))
      case None => Queries.all
    }
    // SPARK_GRAFT_BENCH_METRICS=1 adds a per-query shuffle-bytes pass
    // AFTER the timing runs (the listener's settle-polling must not
    // perturb the timed measurements): one extra evaluation per query,
    // reported as "shuffle":{name:[readBytes,writeBytes]}
    val wantMetrics = sys.env.get("SPARK_GRAFT_BENCH_METRICS").contains("1")
    val tally = new ShuffleTally
    if (wantMetrics) spark.sparkContext.addSparkListener(tally)
    val shuffles = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
    val results = selected.map { q =>
      val times = (1 to runs).map { _ =>
        // operator-internal caches (LSH signatures etc.) must not leak
        // into the next query's measurement
        spark.catalog.clearCache()
        // checkpoint-heavy queries pin localCheckpoint RDD blocks the
        // catalog cache clear does not touch; across 330+ queries × 3
        // runs in one JVM the accumulated blocks are a plausible
        // driver of the documented late-suite floor aging — release
        // them between measurements (async: eviction cost must not be
        // charged to the next query's timer)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime()
        // noop sink: evaluates EVERY output column and final sort, unlike
        // count() (Catalyst prunes projections and eliminates sorts under
        // a count aggregate, which under-measures projection-heavy queries)
        val ok = try { q.fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            errors(q.name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
            false
          }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      if (wantMetrics && !times.contains(-1.0)) {
        spark.catalog.clearCache()
        tally.settle()
        val (r0, w0) = tally.snapshot()
        try {
          q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          tally.settle()
          val (r1, w1) = tally.snapshot()
          shuffles(q.name) = (r1 - r0, w1 - w0)
        } catch { case _: Throwable => () }
      }
      q.name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val sh = if (shuffles.isEmpty) ""
      else ""","shuffle":""" + shuffles.map { case (k, (r, w)) =>
        jstr(k) + s":[$r,$w]" }.mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es$sh,"runs":$runs,"sf":${jstr(sfDir)}}"""
    println(line)
    // also persist the metric line to a file: a truncated stdout capture
    // (the r4 BENCH artifact lost its tail) must not lose the round's
    // numbers
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: ${e.getMessage}") }
    // an UNFILTERED floor-of-3+ run is a bench of record — also land it
    // at a dedicated path no default sweep targets, so a later runs=2
    // or filtered spot-check can never overwrite the round's record
    // (the failure mode three rounds of verdicts flagged)
    if (runs >= 3 && filter.isEmpty)
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_RECORD.json"), line + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[bench] write BENCH_RECORD.json failed: ${e.getMessage}") }
    spark.stop()
  }
}
