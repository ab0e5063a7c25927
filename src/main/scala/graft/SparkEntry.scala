package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual inventory lives in [[Queries.all]]; this object adapts it
  * to the driver's Map-based shape.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.all.find(_.name == "q3_topn").get.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose hashes/UDF details
    * are engine-specific (driver records a rows-only check; ScalaTest
    * covers their semantics). */
  def oracleSql: Map[String, String] =
    Queries.all.collect { case Queries.QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
