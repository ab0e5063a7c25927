package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job wall-clock profiler for the optimization rounds (guide §1:
  * measure first). Runs the named queries once each under the bench's
  * exact session config and prints every Spark job's duration with the
  * callsite of its final stage — i.e. WHICH builder/action inside a
  * composite query (index build, stream drain, serve join, summary
  * read) the time actually went to. Measurement-only tooling; never on
  * any query path. */
object Prof {
  private case class JobRec(id: Int, start: Long, var end: Long = -1L,
                            var site: String = "")

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
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(2000)
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("l_quantity").cast("decimal(18,2)")))
      .orderBy("l_returnflag")
      .write.format("noop").mode("overwrite").save()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // all distinct stage callsites, so broadcast-future jobs (whose
        // last stage is an anonymous CompletableFuture frame) still
        // reveal which operator's subtree they executed
        val site = js.stageInfos.map(_.name).distinct.mkString(" | ")
        jobs.put(js.jobId, JobRec(js.jobId, js.time, site = site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val r = jobs.get(je.jobId)
        if (r != null) r.end = je.time
      }
    })

    val names = args.toSeq
    val selected = graft.Queries.all.filter(q => names.contains(q.name))
    selected.foreach { q =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      jobs.clear()
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val recs = jobs.values.asScala.toSeq.filter(_.end > 0)
        .sortBy(r => -(r.end - r.start))
      println(f"== ${q.name}: total $total%.2f s, ${recs.size} jobs ==")
      recs.take(40).foreach { r =>
        println(f"  ${(r.end - r.start) / 1e3}%7.3f s  job ${r.id}%4d  ${r.site.take(220)}")
      }
      val accounted = recs.map(r => r.end - r.start).sum / 1e3
      println(f"  [sum of job times: $accounted%.2f s  (gaps = driver/planning time)]")
    }
    spark.stop()
  }
}
