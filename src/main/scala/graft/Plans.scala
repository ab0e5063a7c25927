package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan for selected
  * registered queries so pushdown / pruning / broadcast / codegen can
  * be reviewed (`runMain graft.Plans [names...]`). */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q3_topn", "q5_region_join", "k7_upsert",
        "s6_posts_reader", "dedup_exact", "dedup_minhash", "ann_bruteforce")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      Queries.all.find(_.name == n) match {
        case Some(q) =>
          println(s"\n===================== $n =====================")
          try println(q.fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
          catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
