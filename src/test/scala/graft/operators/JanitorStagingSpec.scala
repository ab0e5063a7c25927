package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sinks.Staging

class JanitorStagingSpec extends SparkSpec {
  import spark.implicits._

  private def posts() = Seq(
    (1L, "post", "a"), (2L, "page", "b"), (3L, "post", "c"),
    (4L, "attachment", "d"), (5L, "page", "e"))
    .toDF("id", "post_type", "title")

  test("emptyPosts drops all rows of the given types") {
    val left = Janitor.emptyPosts(posts(), Seq("post", "attachment"))
    assert(rowsOf(left.select("id")) == rowsOf(Seq(2L, 5L).toDF("id")))
  }

  test("deleteByLedger removes ledger-listed entities; orphanMeta keeps only live parents") {
    val ledger = Seq(1L, 3L, 99L).toDF("id")
    val kept = Janitor.deleteByLedger(posts(), ledger)
    assert(rowsOf(kept.select("id")) == rowsOf(Seq(2L, 4L, 5L).toDF("id")))
    val meta = Seq((1L, "k1"), (2L, "k2"), (99L, "k3")).toDF("entity_id", "meta_key")
    val live = Janitor.orphanMeta(meta, kept)
    assert(rowsOf(live.select("entity_id")) == rowsOf(Seq(2L).toDF("entity_id")))
  }

  test("cleanParquet rewrites in place via staged swap; failure leaves table untouched") {
    val dir = Files.createTempDirectory("graft_janitor").toFile.getPath
    val table = s"$dir/posts.parquet"
    posts().write.parquet(table)
    val (before, after) = Janitor.cleanParquet(spark, table,
      df => Janitor.emptyPosts(df, Seq("post")))
    assert(before == 5L && after == 3L)
    assert(spark.read.parquet(table).count() == 3L)
    // a failing clean must not damage the (already cleaned) table
    intercept[RuntimeException] {
      Janitor.cleanParquet(spark, table, _ => sys.error("boom"))
    }
    assert(spark.read.parquet(table).count() == 3L)
    assert(!new java.io.File(table + ".__staging__").exists())
  }

  test("stagedWrite: success swaps atomically; failure leaves target untouched") {
    val dir = Files.createTempDirectory("graft_staging").toFile.getPath
    val target = s"$dir/out"
    Staging.stagedWrite(spark, target) { staging =>
      Seq(1, 2, 3).toDF("v").write.parquet(staging)
    }
    assert(spark.read.parquet(target).count() == 3)
    // failed second write: v stays at 3 rows, no leftover staging dir
    intercept[RuntimeException] {
      Staging.stagedWrite(spark, target) { staging =>
        Seq(9).toDF("v").write.parquet(staging)
        sys.error("fatal mid-write")
      }
    }
    assert(spark.read.parquet(target).count() == 3)
    assert(!new java.io.File(target + ".__staging__").exists())
    assert(!new java.io.File(target + ".__old__").exists())
  }

  test("withSnapshot restores the output tree on fatal error (ProcessCommand parity)") {
    val dir = Files.createTempDirectory("graft_snap").toFile.getPath
    val out = s"$dir/output"
    Seq("original").toDF("v").write.parquet(s"$out/t.parquet")
    intercept[RuntimeException] {
      Staging.withSnapshot(spark, out) {
        // a job half-corrupts the tree, then dies
        Seq("corrupt").toDF("v").write.mode("overwrite").parquet(s"$out/t.parquet")
        sys.error("fatal")
      }
    }
    assert(spark.read.parquet(s"$out/t.parquet").as[String].collect().toSeq ==
      Seq("original"))
    // success path drops the snapshot
    Staging.withSnapshot(spark, out) {
      Seq("v2").toDF("v").write.mode("overwrite").parquet(s"$out/t.parquet")
    }
    assert(spark.read.parquet(s"$out/t.parquet").as[String].collect().toSeq == Seq("v2"))
    assert(!new java.io.File(out + ".__snapshot__").exists())
    // manual rollback with no snapshot is a no-op
    assert(!Staging.rollback(spark, out))
  }
}
