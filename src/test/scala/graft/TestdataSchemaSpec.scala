package graft

import org.apache.spark.sql.types._

/** CANARY: pins the driver-generated testdata schemas this library's
  * queries assume. The round-5 regeneration silently changed
  * `events.ts` from TIMESTAMP(NANOS)-as-long to TIMESTAMP_MICROS and
  * 9 queries + 2 specs broke with opaque analysis errors; this spec
  * turns the NEXT drift into one loud, named failure. A failure here
  * means the testdata changed shape — fix the adapter (see
  * Queries.readEvents for the pattern), then re-pin. */
class TestdataSchemaSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampNTZType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType))

  expected.foreach { case (table, cols) =>
    test(s"testdata schema pin: $table") {
      val got = spark.read.parquet(s"$sfDir/$table.parquet").schema
        .map(f => f.name -> f.dataType)
      val want = cols.map { case (n, t) => (n, t: DataType) }
      assert(got == want,
        s"\nDRIVER TESTDATA DRIFT for '$table'.\n  was: $want\n  now: $got\n" +
          "Queries reading this table may now fail analysis or silently " +
          "change semantics — adapt the reader (branch on the observed " +
          "schema, see Queries.readEvents / normalizeEventTs), then " +
          "re-pin this spec.")
    }
  }
}
