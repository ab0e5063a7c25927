package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property test: [[AsOf.asOfJoin]] (union + sorted carry-forward)
  * agrees with a driver-side brute-force oracle on arbitrary random
  * inputs — dense timestamp ties on both sides, keys missing on either
  * side, strict and non-strict — shapes the example spec can't
  * enumerate. */
class AsOfPropSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, minTests: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, s"property failed: ${res.status}")
  }

  private def ts(m: Int) = new java.sql.Timestamp(86400000L + m * 60000L)

  // small key/time domains force heavy collisions
  private val genRows: Gen[(List[(Long, Int)], List[(Long, Int)])] = for {
    nL <- Gen.choose(0, 25)
    nR <- Gen.choose(0, 25)
    l <- Gen.listOfN(nL, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0, 8)))
    r <- Gen.listOfN(nR, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0, 8)))
  } yield (l, r)

  /** Driver-side oracle: best right row for each left row. */
  private def brute(left: Seq[(Long, Long, Int)], right: Seq[(Long, Long, Int)],
                    strict: Boolean): Map[Long, Option[Long]] =
    left.map { case (lid, k, lt) =>
      val cands = right.filter { case (_, rk, rt) =>
        rk == k && (if (strict) rt < lt else rt <= lt)
      }
      lid -> (if (cands.isEmpty) None
        else Some(cands.maxBy { case (rid, _, rt) => (rt, rid) }._1))
    }.toMap

  test("asOfJoin matches brute force under dense ties (strict and non-strict)") {
    val prop = Prop.forAll(genRows, Gen.oneOf(true, false)) { case ((l, r), strict) =>
      // unique ids encode (index); ts collisions come from the tiny domain
      val left = l.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val right = r.zipWithIndex.map { case ((k, t), i) => (1000L + i, k, t) }
      val expected = brute(left, right, strict)
      val lDf = left.map { case (id, k, t) => (k, ts(t), id) }
        .toDF("user_id", "ts", "left_id")
      val rDf = right.map { case (id, k, t) => (k, ts(t), id) }
        .toDF("user_id", "ts", "right_id")
      val got = AsOf.asOfJoin(lDf, rDf, Seq("user_id"), "ts",
          Seq("right_id"), tieCol = "right_id", strict = strict)
        .select($"left_id", $"right_id").as[(Long, Option[Long])]
        .collect().toMap
      got == expected
    }
    check(prop, 40)
  }
}
