package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for named queries to files — the
  * optimization rounds' plan-evidence capture (`plans/r16/<q>_{before,
  * after}.txt`). Runs each query fn (side-effect builds included, so
  * the final frame's plan resolves against real index layouts), then
  * writes the formatted plan of the RETURNED frame. Usage:
  *   runMain graft.tools.ExplainDump <outDir> <suffix> <query...>
  * Measurement-only tooling; never on any query path. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    graft.Queries.all.filter(q => names.contains(q.name)).foreach { q =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val df = q.fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${q.name}_$suffix.txt"), plan)
      println(s"[explain] wrote $outDir/${q.name}_$suffix.txt")
    }
    spark.stop()
  }
}
