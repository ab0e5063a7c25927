package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: time named registered queries in a fresh session. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    args.foreach { name =>
      val q = graft.Queries.all.find(_.name == name).getOrElse(sys.error(s"unknown $name"))
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = q.fn(spark, sfDir).count()
      println(f"[time] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    spark.stop()
  }
}
