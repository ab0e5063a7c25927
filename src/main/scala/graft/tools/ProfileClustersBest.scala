package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: stage-by-stage timing of the dedup_clusters_best
  * composition (pair generation / label propagation / scoring / final
  * arg-max) to attribute its bench floor. */
object ProfileClustersBest {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.plans.GraftExtensions.register(spark)
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (1 to 2).foreach { pass =>
      println(s"=== pass $pass ===")
      val pairs = time("pairs (plan+materialize)") {
        graft.llm.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          blockCols = Seq(col("lang"), floor(col("n_chars") / 50)),
          n = 1, threshold = 0.5).localCheckpoint(true)
      }
      println(s"  pairs rows: ${pairs.count()}")
      val clusters = time("nearDupClusters") {
        graft.llm.Dedup.nearDupClusters(pairs).localCheckpoint(true)
      }
      println(s"  cluster rows: ${clusters.count()}")
      val wts = graft.llm.Importance.weightArray(
        graft.llm.Importance.seededWeights(spark))
      val scores = time("scores materialize") {
        docs.select(col("doc_id"),
          graft.llm.Importance.classifierScoreColNative(col("text"), wts)
            .as("score")).localCheckpoint(true)
      }
      time("full nearDupClustersBest") {
        graft.llm.Dedup.nearDupClustersBest(pairs, scores).count()
      }
    }
    spark.stop()
  }
}
