package graft.llm

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec

/** Property test: [[Dedup.nearDupClusters]] (distributed min-label
  * propagation) agrees with a reference union-find on arbitrary random
  * graphs — including long chains, self-loops, duplicate edges, and
  * disconnected pieces, shapes the example-based spec can't enumerate. */
class DedupClustersPropSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, minTests: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, s"property failed: ${res.status}")
  }

  /** Driver-side union-find ground truth: node -> min id of its
    * component. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private val edgeGen: Gen[(Long, Long)] = for {
    a <- Gen.chooseNum(0L, 40L)
    b <- Gen.chooseNum(0L, 40L)
  } yield (a, b)

  test("property: nearDupClusters == union-find min labels on random graphs") {
    // few samples, each a full Spark job with an iterative loop — keep
    // the graph small and the sample count modest
    check(Prop.forAll(Gen.listOfN(25, edgeGen)) { edges =>
      edges.isEmpty || {
        val expected = unionFind(edges)
        // default path (driver-local union-find under the edge cap)
        val got = Dedup.nearDupClusters(edges.toDF("a", "b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // maxLocalEdges = 0 forces the distributed iterative loop —
        // both paths must be bit-identical to the ground truth
        val gotLoop = Dedup.nearDupClusters(edges.toDF("a", "b"),
            maxLocalEdges = 0L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == expected && gotLoop == expected
      }
    }, minTests = 8)
  }
}
