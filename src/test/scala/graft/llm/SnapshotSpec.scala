package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def diffMap(prev: Seq[(Long, String)], cur: Seq[(Long, String)]) =
    Snapshot.corpusDiff(prev.toDF("doc_id", "text"), cur.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("corpusDiff classifies added / removed / changed and drops unchanged") {
    val d = diffMap(
      prev = Seq((1L, "a"), (2L, "b"), (3L, "c")),
      cur = Seq((1L, "a"), (2L, "B2"), (4L, "d")))
    assert(d == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("corpusDiff: null text is presence, not absence") {
    val prev = Seq((1L, null), (2L, "x"), (3L, null)).asInstanceOf[Seq[(Long, String)]]
    val cur = Seq((1L, null), (2L, null), (4L, null)).asInstanceOf[Seq[(Long, String)]]
    val d = diffMap(prev, cur)
    // 1: null -> null is unchanged (dropped); 2: content -> null is
    // changed, NOT removed; 3: removed; 4: added even with null text
    assert(d == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("diffSummary censuses the delta; result repartition-invariant") {
    val prev = (0L until 100L).map(i => (i, s"doc $i"))
    val cur = (0L until 100L).filter(_ % 10 != 0)
      .map(i => (i, if (i % 3 == 0) s"doc $i v2" else s"doc $i")) ++
      (200L until 205L).map(i => (i, s"new $i"))
    val diff = Snapshot.corpusDiff(
      prev.toDF("doc_id", "text").repartition(7),
      cur.toDF("doc_id", "text").repartition(3), "doc_id", "text")
    val sum = Snapshot.diffSummary(diff).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val changed = (0L until 100L).count(i => i % 10 != 0 && i % 3 == 0)
    assert(sum == Map("added" -> 5L, "removed" -> 10L, "changed" -> changed.toLong))
  }
}
