package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Fns

class SlugifyExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val edgeCases = Seq(
    "Hello World", "  padded  ", "a!b", "a ! b", "a__b--c  d",
    "<b>Bold Title</b>", "unclosed < tag", "multi <i>one</i> <i>two</i>",
    "Éclair über Señor", "ŁÓDŹ żółć", "--lead-trail--", "___", "", "42 Things",
    "tabs\tand\nnewlines", "mixed<br/>breaks", "ümlaut_Ünder", "ab",
    "ümlaut!@#$%^&*()chars", "ça c'est ça")

  test("native slugify is byte-equal to the Fns.toSlug regex chain") {
    val corpus = (edgeCases ++
      (1 to 200).map { i =>
        val rnd = new scala.util.Random(i)
        (0 until rnd.nextInt(40)).map(_ =>
          "abzABZ019 -_<>/!éüßñ\t.".charAt(rnd.nextInt(22))).mkString
      }).toDF("s")
    val viaChain = corpus.select(col("s"), Fns.toSlug(col("s")).as("chain")).collect()
    viaChain.foreach { r =>
      val in = r.getString(0)
      val expected = Option(r.getString(1)).getOrElse("")
      assert(Slugify.slugify(in) == expected,
        s"mismatch for ${in.take(60).replace("\n", "\\n")}: " +
          s"native='${Slugify.slugify(in)}' chain='$expected'")
    }
  }

  test("registered SQL function matches and stays codegen'd") {
    GraftExtensions.register(spark)
    val df = edgeCases.toDF("s")
      .selectExpr("s", "graft_slugify(s) AS native")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    df.collect().foreach(r =>
      assert(r.getString(1) == Slugify.slugify(r.getString(0))))
  }

  test("null propagates") {
    GraftExtensions.register(spark)
    val out = Seq(Option("x"), None).toDF("s")
      .selectExpr("graft_slugify(s) AS v").collect().map(r => Option(r.getString(0)))
    assert(out.toSet == Set(Some("x"), None))
  }
}
