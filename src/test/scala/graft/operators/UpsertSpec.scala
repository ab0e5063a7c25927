package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("upsert merges existing rows and assigns sequential ids to new ones") {
    val target = Seq((10L, "a", "old-a", "live"), (20L, "b", "old-b", "live"))
      .toDF("id", "name", "title", "status")
    val incoming = Seq(("a", "new-a"), ("z", "new-z"), ("y", "new-y"))
      .toDF("name", "title")
    val out = Upsert.upsert(incoming, target, Seq("name"), "id",
      defaults = Map("status" -> lit("draft")))
    val rows = out.collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[String]("name"), r.getAs[String]("title"),
        r.getAs[String]("status"))).toSet
    // matched: keeps target id + status, takes incoming title
    assert(rows.contains((10L, "a", "new-a", "live")))
    // new rows: max(20)+1=21 for "y", 22 for "z" (assigned in name order)
    assert(rows.contains((21L, "y", "new-y", "draft")))
    assert(rows.contains((22L, "z", "new-z", "draft")))
    assert(out.count() == 3)
  }

  test("keepLastBy collapses duplicate incoming keys last-wins (reference batch semantics)") {
    val target = Seq((1L, "a", "old")).toDF("id", "name", "title")
    val incoming = Seq(("a", "v1", 1), ("a", "v2", 2), ("b", "w1", 1), ("b", "w2", 2))
      .toDF("name", "title", "seq")
    val out = Upsert.upsert(incoming, target, Seq("name"), "id",
        keepLastBy = Some(col("seq")))
      .drop("seq")
    assert(out.count() == 2)
    val byName = out.collect().map(r => r.getAs[String]("name") -> r.getAs[String]("title")).toMap
    assert(byName == Map("a" -> "v2", "b" -> "w2"))
  }

  test("upsert honors an id already present on the incoming row") {
    val target = Seq((5L, "a", "old")).toDF("id", "name", "title")
    val incoming = Seq((99L, "missing-name", "forced")).toDF("id", "name", "title")
    val out = Upsert.upsert(incoming, target, Seq("name"), "id")
    assert(out.select("id").as[Long].collect().toSeq == Seq(99L))
  }

  test("applyUpsert keeps untouched target rows") {
    val target = Seq((1L, "a", "ta"), (2L, "b", "tb")).toDF("id", "name", "title")
    val incoming = Seq(("b", "nb")).toDF("name", "title")
    val out = Upsert.applyUpsert(incoming, target, Seq("name"), "id")
    assert(out.count() == 2)
    val byName = out.collect().map(r => r.getAs[String]("name") -> r.getAs[String]("title")).toMap
    assert(byName("a") == "ta" && byName("b") == "nb")
  }

  test("markExists flags natural-key matches") {
    val target = Seq(("a", 1), ("b", 2)).toDF("name", "x")
    val incoming = Seq("a", "c").toDF("name")
    val out = Upsert.markExists(incoming, target, Seq("name"))
    val m = out.collect().map(r => r.getAs[String]("name") -> r.getAs[Boolean]("exists")).toMap
    assert(m == Map("a" -> true, "c" -> false))
  }

  test("withSequentialIds is dense, ordered, and deterministic") {
    val df = Seq("c", "a", "b").toDF("k")
    val out = Upsert.withSequentialIds(df, "id", 100L, Seq("k"))
    assert(out.orderBy("id").select("k").as[String].collect().toSeq == Seq("a", "b", "c"))
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(100L, 101L, 102L))
  }

  test("unpivotMeta emits (id, key, value, mode) with .add parsed and nulls dropped") {
    val df = Seq((1L, "v1", null.asInstanceOf[String], "x"))
      .toDF("id", "meta.k1", "meta.k2", "meta.k3.add")
    val out = WpLoad.unpivotMeta(df, "id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(out == Set((1L, "k1", "v1", "update"), (1L, "k3", "x", "add")))
  }

  test("explodeTaxTerms handles scalar and array tax columns") {
    val df = Seq((1L, Seq("x", "y"), "solo")).toDF("id", "tax.tags", "tax.cat")
    val out = WpLoad.explodeTaxTerms(df, "id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set((1L, "tags", "x"), (1L, "tags", "y"), (1L, "cat", "solo")))
  }

  test("missingParents finds only absent (taxonomy, slug) pairs") {
    val incoming = Seq(("n1", "p1", "cat"), ("n2", "p2", "cat"), ("n3", null, "cat"))
      .toDF("name", "parent_slug", "taxonomy")
    val target = Seq(("p1", "cat")).toDF("slug", "taxonomy")
    val out = WpLoad.missingParents(incoming, target).collect()
      .map(r => (r.getAs[String]("taxonomy"), r.getAs[String]("slug"), r.getAs[String]("name")))
    assert(out.toSet == Set(("cat", "p2", "p2")))
  }
}
