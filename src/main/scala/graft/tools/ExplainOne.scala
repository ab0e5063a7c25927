package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: dump the formatted physical plan of a registered
  * query (plan-shape audits for PLANS.md). */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val q = graft.Queries.all.find(_.name == name)
        .getOrElse(sys.error(s"unknown $name"))
      println(s"==== $name ====")
      q.fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
