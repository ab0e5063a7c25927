package graft.columns

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec
import graft.functions.Fns

/** Property tests (SURVEY §5-2): name-op round trips and sanitizer
  * algebra, via raw ScalaCheck (the scalatest bridge isn't in the
  * offline cache). Spark-evaluated properties batch their samples into
  * one DataFrame per property for speed. */
class ColumnNsPropSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, minTests: Int = 30): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, s"property failed: ${res.status}")
  }

  private val simpleName: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(12))

  test("property: prefixAll then selectPrefix(strip) is identity on names") {
    check(Prop.forAll(Gen.nonEmptyListOf(simpleName).map(_.distinct)) { names =>
      names.isEmpty || {
        val df = spark.range(1).select(names.map(n => lit(1).as(n)): _*)
        val back = ColumnNs.selectPrefix(
          ColumnNs.prefixAll(df, "legacy."), Seq("legacy."), removePrefix = true)
        back.columns.toSeq == names
      }
    }, minTests = 15)
  }

  test("property: snakeCase is idempotent") {
    val nameChars = Gen.listOf(Gen.oneOf(Gen.alphaChar, Gen.oneOf(' ', '-', '_')))
      .map(_.mkString)
    check(Prop.forAll(nameChars) { s =>
      val once = ColumnNs.snakeCase(s)
      ColumnNs.snakeCase(once) == once
    }, minTests = 100)
  }

  test("property: nestDotted then flattenNested round-trips dotted names") {
    val segs = Gen.nonEmptyListOf(simpleName).map(_.distinct.take(3))
    check(Prop.forAll(segs, segs) { (as, bs) =>
      as.isEmpty || bs.isEmpty || {
        val names = as.map(a => s"x.$a") ++ bs.map(b => s"y.$b")
        val df = spark.range(1).select(names.map(n => lit(n.length).as(n)): _*)
        val round = ColumnNs.flattenNested(ColumnNs.nestDotted(df))
        round.columns.sorted.toSeq == names.sorted &&
          round.collect().head.toSeq == round.columns.toSeq.map(_.length)
      }
    }, minTests = 15)
  }

  private val freeTexts: Seq[String] = {
    // deterministic corpus of awkward strings, one Spark job for all
    val gen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '-', '_', '<', '>', '/', '!', 'é', 'Ü', '.')))
      .map(_.mkString.take(40))
    val seed = org.scalacheck.rng.Seed(42L)
    Iterator.iterate((seed, List.empty[String])) { case (sd, acc) =>
      val next = gen.pureApply(Gen.Parameters.default, sd)
      (sd.next, next :: acc)
    }.drop(200).next()._2
  }

  test("property: toSlug is idempotent and emits only [a-z0-9-]") {
    val out = freeTexts.toDF("s")
      .select(Fns.toSlug(col("s")).as("one"))
      .select(col("one"), Fns.toSlug(col("one")).as("two"))
      .collect()
    out.foreach { r =>
      val (one, two) = (r.getString(0), r.getString(1))
      assert(one == two, s"not idempotent: '$one' -> '$two'")
      assert(one.matches("[a-z0-9-]*"), s"bad chars in '$one'")
    }
  }

  test("property: sanitizeKey idempotent; stringToNull only nulls exact matches") {
    val keys = freeTexts.toDF("s")
      .select(Fns.sanitizeKey(col("s")).as("k"))
      .select(col("k"), Fns.sanitizeKey(col("k")).as("k2")).collect()
    keys.foreach(r => assert(r.getString(0) == r.getString(1)))

    val needle = freeTexts.find(_.nonEmpty).getOrElse("x")
    val nulled = Fns.stringToNull(freeTexts.toDF("s"), needle)
      .collect().map(_.getString(0))
    nulled.zip(freeTexts).foreach { case (outV, in) =>
      if (in == needle) assert(outV == null) else assert(outV == in)
    }
  }
}
