package graft.llm

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Property tests for the Luhn column against a reference
  * implementation: the column form must agree with driver-side Luhn on
  * arbitrary digit strings, and appending the COMPUTED check digit to
  * any prefix must always validate (the generative direction the
  * example-based spec's fixed test numbers can't cover). */
class LuhnPropSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, minTests: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, s"property failed: ${res.status}")
  }

  /** Reference Luhn (ISO/IEC 7812): from the rightmost digit, double
    * every second, subtract 9 on overflow, sum ≡ 0 mod 10. */
  private def refLuhn(s: String): Boolean = {
    val digits = s.map(_ - '0').reverse
    val total = digits.zipWithIndex.map { case (d, i) =>
      if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
    }.sum
    total % 10 == 0
  }

  /** The check digit that makes prefix+digit Luhn-valid. */
  private def checkDigit(prefix: String): Int = {
    val want = (0 to 9).find(d => refLuhn(prefix + d))
    want.get // always exists: the sum walks all residues mod 10
  }

  private def columnLuhn(inputs: Seq[String]): Seq[Boolean] =
    inputs.toDF("d")
      .select(TextAnalysis.luhnValid(col("d"))).as[Boolean].collect().toSeq

  private val digitsGen: Gen[String] =
    Gen.chooseNum(12, 18).flatMap(n =>
      Gen.listOfN(n, Gen.numChar).map(_.mkString))

  test("column Luhn agrees with the reference on arbitrary digit strings") {
    // batch the property: collect generated cases, evaluate in one plan
    val cases = Gen.listOfN(200, digitsGen).sample.get
    val got = columnLuhn(cases)
    cases.zip(got).foreach { case (s, g) =>
      assert(g == refLuhn(s), s"disagreement on $s")
    }
  }

  test("prefix + computed check digit always validates; +1 never does") {
    val prefixes = Gen.listOfN(200, digitsGen).sample.get
    val valid = prefixes.map(p => p + checkDigit(p))
    val corrupt = prefixes.map { p =>
      val cd = checkDigit(p); p + ((cd + 1) % 10)
    }
    assert(columnLuhn(valid).forall(identity))
    assert(columnLuhn(corrupt).forall(v => !v))
    // and the card scrub respects exactly that boundary
    val texts = valid.take(20).map(v => s"pay $v now") ++
      corrupt.take(20).map(c => s"pay $c now")
    val scrubbed = texts.toDF("t")
      .select(TextAnalysis.scrubPiiStrict(col("t"))).as[String].collect()
    assert(scrubbed.take(20).forall(_ == "pay <CARD> now"))
    assert(scrubbed.drop(20).forall(_ == "pay <NUMBER> now"))
  }
}
