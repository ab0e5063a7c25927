package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Dev diagnostic: stage-by-stage timing of the MinHash near-dup path,
  * to locate where wall-clock goes at a given SF. Not part of the
  * library surface. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$sfDir/documents.parquet")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    time("warmup")(spark.range(100).count())
    time("docs count")(df.count())
    time("shingles only") {
      df.select(Dedup.shingles(col("text")).as("sh")).selectExpr("sum(size(sh))").collect()
    }
    val sigs = time("signatures") {
      val s = Dedup.minhashSignatures(df, "doc_id", "text").cache()
      s.count(); s
    }
    time("banded+buckets+pairs") {
      // replicate candidate internals up to the pair expansion
      val banded = sigs.select(col("doc_id"),
        explode(Dedup.lshBands(col("sig"), 16, 4)).as("bb"))
        .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
      val buckets = banded.groupBy(col("band"), col("bucket"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ms"))
        .where(size(col("ms")).between(2, 1000))
      buckets.select(explode(flatten(
          transform(col("ms"), (m, i) =>
            transform(slice(col("ms"), i + 2, size(col("ms"))),
              other => struct(m.as("a"), other.as("b")))))).as("p"))
        .select(col("p.a"), col("p.b")).dropDuplicates("a", "b").count()
    }
    time("candidates e2e") {
      Dedup.minhashCandidates(df, "doc_id", "text").count()
    }
    spark.catalog.clearCache()
    time("nearDups e2e") {
      Dedup.minhashNearDups(df, "doc_id", "text", threshold = 0.5).count()
    }
    spark.stop()
  }
}
