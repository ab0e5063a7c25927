package graft.columns

import graft.SparkSpec
import org.apache.spark.sql.types.StructType

class ColumnNsSpec extends SparkSpec {
  import spark.implicits._
  import ColumnNs._

  private def df3 = Seq((1, "a", 2.0)).toDF("post.id", "post.title", "meta.score")

  test("prefixAll prepends to every column") {
    val d = prefixAll(Seq((1, 2)).toDF("a", "b"), "legacy.")
    assert(d.columns.toSeq == Seq("legacy.a", "legacy.b"))
  }

  test("selectPrefix keeps matching, optionally strips") {
    val kept = selectPrefix(df3, Seq("post."))
    assert(kept.columns.toSeq == Seq("post.id", "post.title"))
    val stripped = selectPrefix(df3, Seq("post."), removePrefix = true)
    assert(stripped.columns.toSeq == Seq("id", "title"))
    assert(stripped.as[(Int, String)].collect().head == ((1, "a")))
  }

  test("selectPrefix fails fast on post-strip collisions") {
    val d = Seq((1, 2)).toDF("meta.x", "tax.x")
    val e = intercept[IllegalArgumentException] {
      selectPrefix(d, Seq("meta.", "tax."), removePrefix = true)
    }
    assert(e.getMessage.contains("x"))
  }

  test("q escapes embedded backticks") {
    val d = Seq(1).toDF("we`ird")
    assert(d.select(q("we`ird")).collect().head.getInt(0) == 1)
  }

  test("reduceOnPrefix normalizes trailing dot — postmeta.* not matched by 'post'") {
    val d = Seq((1, "x", "y")).toDF("post.id", "postmeta.k", "poster")
    val r = reduceOnPrefix(d, "post")
    assert(r.columns.toSeq == Seq("id"))
    assert(reduceOnPrefix(d, "post...").columns.toSeq == Seq("id"))
  }

  test("stripControlChars removes all non-ASCII (PHP byte-wise parity)") {
    val d = Seq(1).toDF("nameé中")
    assert(stripControlChars(d).columns.toSeq == Seq("name"))
  }

  test("snakeCaseAll") {
    val d = Seq((1, 2, 3)).toDF("Post Title", "postDate", "GUID")
    assert(snakeCaseAll(d).columns.toSeq == Seq("post_title", "post_date", "guid"))
  }

  test("normalize = snake + strip + prefix") {
    val d = normalize(Seq(1).toDF("Post Title"), "legacy.")
    assert(d.columns.toSeq == Seq("legacy.post_title"))
  }

  test("nestDotted builds struct trees") {
    val n = nestDotted(df3)
    val schema = n.schema
    assert(schema.fieldNames.toSeq == Seq("post", "meta"))
    val post = schema("post").dataType.asInstanceOf[StructType]
    assert(post.fieldNames.toSeq == Seq("id", "title"))
    val row = n.collect().head
    assert(row.getStruct(0).getInt(0) == 1)
  }

  test("nestDotted refuses leaf/branch collisions") {
    intercept[IllegalArgumentException] {
      nestDotted(Seq((1, 2)).toDF("a", "a.b"))
    }
    intercept[IllegalArgumentException] {
      nestDotted(Seq((1, 2)).toDF("a.b", "a"))
    }
  }

  test("merge unions by name, tolerating missing columns") {
    val a = Seq((1, "x")).toDF("id", "name")
    val b = Seq((2, true)).toDF("id", "flag")
    val m = merge(a, b)
    assert(m.columns.toSet == Set("id", "name", "flag"))
    assert(m.count() == 2)
  }
}
