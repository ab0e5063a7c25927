package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.llm.{Dedup, TextAnalysis}

/** Dev diagnostic: per-stage timings for the curation pass. */
object ProfileCurate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    time("filter_only")(docs.filter(TextAnalysis.curationKeep(col("text")))
      .select(col("doc_id")))
    time("scrub_only")(docs.select(col("doc_id"),
      TextAnalysis.scrubPii(col("text")).as("clean")))
    time("dedup_only")(Dedup.exactDedup(docs, "doc_id", "text")
      .select(col("doc_id")))
    time("rep_stats_noop")(docs.select(col("doc_id"),
      TextAnalysis.repetitionStats(col("text")).as("r")).select(col("r.*")))
    time("quality_noop")(docs.select(col("doc_id"),
      TextAnalysis.qualityStats(col("text")).as("q")).select(col("q.*")))
    time("langid_noop")(docs.select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("l")))
    spark.stop()
  }
}
