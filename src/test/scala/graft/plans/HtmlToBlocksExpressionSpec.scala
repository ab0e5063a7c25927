package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.HtmlBlocks

class HtmlToBlocksExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("native expression matches the UDF/Scala converter exactly") {
    GraftExtensions.register(spark)
    val samples = Seq(
      "<p>Hello <b>x</b></p><h2>T</h2>",
      "<ul><li>a</li></ul><hr/><img src=\"u\" alt=\"a\">",
      "<div>free</div><p></p>",
      "")
    val df = samples.toDF("html")
    val out = df.selectExpr("html", "graft_html_to_blocks(html) AS native").collect()
    out.foreach { r =>
      assert(r.getString(1) == HtmlBlocks.convert(r.getString(0)))
    }
  }

  test("expression is codegen'd (no ScalaUDF in the plan) and null-safe") {
    GraftExtensions.register(spark)
    val df = Seq(Some("<p>x</p>"), None).toDF("html")
      .selectExpr("graft_html_to_blocks(html) AS b")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"UDF found in plan:\n$plan")
    val rows = df.collect().map(r => Option(r.getString(0)))
    assert(rows.exists(_.isDefined) && rows.contains(None))
  }

  test("registered via SparkSessionExtensions entry point class") {
    // the class is instantiable and applies without error (cluster-side
    // spark.sql.extensions contract)
    val ext = new GraftExtensions()
    assert(ext.isInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit])
  }
}
