package graft
import org.scalatest.funsuite.AnyFunSuite
class EntrySmokeSpec extends SparkSpec {
  test("driver contract: entry returns rows on sf0.001") {
    val n = SparkEntry.entry(spark).count()
    assert(n > 0)
  }
}
