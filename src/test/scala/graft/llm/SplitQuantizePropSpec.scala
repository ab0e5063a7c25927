package graft.llm

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec

/** Property tests against driver-side brute-force mirrors for the
  * session's deterministic operators: the splitByHash cumulative
  * ladder (vs a literal md5 re-derivation), int8 quantization bounds,
  * and histogram bucketing (vs a plain Scala fold). */
class SplitQuantizePropSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, minTests: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, s"property failed: ${res.status}")
  }

  private def md5bucket(salt: String, key: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest((salt + key.toString).getBytes("UTF-8"))
    d.take(4).map("%02x".format(_)).mkString
  }

  test("splitByHash matches a literal md5-ladder re-derivation") {
    // integer weight parts keep the double sum within the 1e-9 gate
    val genWeights = for {
      k <- Gen.choose(2, 5)
      parts <- Gen.listOfN(k, Gen.choose(1, 10))
    } yield {
      val total = parts.sum.toDouble
      parts.zipWithIndex.map { case (p, i) => s"s$i" -> (p / total) }
    }
    val prop = Prop.forAll(genWeights, Gen.choose(0L, 10000L)) { (ws, base) =>
      val keys = (base until base + 50L)
      val got = Mixing.splitByHash(keys.toDF("k"), "k", ws)
        .as[(Long, String)].collect().toMap
      // brute force: first band whose cumulative threshold exceeds
      // the bucket; the last band takes the remainder
      val cum = ws.map(_._2).scanLeft(0.0)(_ + _).tail
      val expected = keys.map { k =>
        val b = md5bucket("graft", k)
        val hit = ws.init.zip(cum.init).collectFirst {
          case ((name, _), c)
            if b < f"${(c * 4294967296.0).round}%08x" => name
        }
        k -> hit.getOrElse(ws.last._1)
      }.toMap
      got == expected
    }
    check(prop, 30)
  }

  test("quantizeInt8: range, pinned max, reconstruction bound") {
    val genVec = Gen.choose(2, 32).flatMap(d =>
      Gen.listOfN(d, Gen.choose(-1000, 1000).map(_ / 7.0f)))
    val prop = Prop.forAll(genVec) { v =>
      val df = Seq((1L, v)).toDF("vec_id", "embedding")
      val r = Similarity.quantizeInt8(df).head()
      val scale = r.getDouble(1)
      val q = r.getSeq[Int](2)
      val inRange = q.forall(x => x >= -127 && x <= 127)
      val maxAbs = v.map(x => math.abs(x.toDouble)).max
      val pinned = if (maxAbs == 0.0) scale == 0.0 && q.forall(_ == 0)
        else q.map(math.abs).max == 127
      val bounded = v.map(_.toDouble).zip(q).forall { case (orig, qi) =>
        math.abs(orig - qi * scale) <= scale / 2 + 1e-12
      }
      inRange && pinned && bounded
    }
    check(prop, 40)
  }

  test("histogram matches a plain fold over the same values") {
    val gen = for {
      n <- Gen.choose(1, 60)
      vals <- Gen.listOfN(n, Gen.choose(-150, 250).map(_.toDouble))
      buckets <- Gen.choose(1, 12)
    } yield (vals, buckets)
    val prop = Prop.forAll(gen) { case (vals, nb) =>
      val (lo, hi) = (0.0, 200.0)
      val got = graft.operators.Profile.histogram(
          vals.toDF("v"), "v", lo, hi, nb)
        .as[(Long, Long)].collect().toMap
      val expected = vals.groupBy { v =>
        if (v < lo) 0L
        else if (v >= hi) nb + 1L
        else math.floor((v - lo) / ((hi - lo) / nb)).toLong + 1L
      }.map { case (b, xs) => b -> xs.size.toLong }
      got == expected
    }
    check(prop, 30)
  }
}
