package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MediaValidationSpec extends SparkSpec {
  import spark.implicits._

  test("resolveAttachments: exact and suffix-variant hits, new ids for misses") {
    val attachments = Seq((10L, "hero.jpg"), (11L, "banner-1.jpg"))
      .toDF("attachment_id", "filename")
    val media = Seq(
      (1L, "http://x/a/hero.jpg"),          // exact hit
      (2L, "http://x/b/banner.jpg?w=300"),  // hits banner-1.jpg probe, query stripped
      (3L, "http://x/c/fresh.jpg"),         // miss -> new id 12
      (4L, "http://x/c/fresh.jpg"))         // same url -> SAME new id
      .toDF("entity_id", "url")
    val out = Media.resolveAttachments(media, attachments).collect()
      .map(r => (r.getAs[Long]("entity_id"), r.getAs[Long]("attachment_id"),
        r.getAs[Boolean]("is_new"))).toSet
    assert(out == Set((1L, 10L, false), (2L, 11L, false), (3L, 12L, true), (4L, 12L, true)))
  }

  test("exact filename match wins over suffix variants") {
    val attachments = Seq((1L, "img.jpg"), (2L, "img-1.jpg"))
      .toDF("attachment_id", "filename")
    val media = Seq((1L, "http://x/img.jpg")).toDF("entity_id", "url")
    val id = Media.resolveAttachments(media, attachments)
      .select("attachment_id").as[Long].head()
    assert(id == 1L)
  }

  test("withThumbnails: resolved attachment id lands in featured_media and _thumbnail_id meta") {
    val attachments = Seq((10L, "hero.jpg")).toDF("attachment_id", "filename")
    val posts = Seq(
      (1L, "With hero", Some("http://x/a/hero.jpg")),   // resolves to 10
      (2L, "With fresh", Some("http://x/b/fresh.jpg")), // new id 11
      (3L, "No media", Option.empty[String]))           // passes through
      .toDF("post.ID", "post.post_title", "meta._remote_featured_media")
    val out = WpLoad.withThumbnails(posts, attachments, "post.ID")
    val byId = out.collect().map(r => r.getAs[Long]("post.ID") -> r).toMap
    assert(byId(1L).getAs[Long]("post.featured_media") == 10L)
    assert(byId(1L).getAs[String]("meta._thumbnail_id") == "10")
    assert(byId(2L).getAs[Long]("post.featured_media") == 11L)
    assert(byId(3L).isNullAt(byId(3L).fieldIndex("post.featured_media")))
    // the K9 unpivot then writes set_post_thumbnail's meta row — and
    // only for posts that had media (null meta values drop)
    val meta = WpLoad.unpivotMeta(out, "post.ID")
      .where(col("meta_key") === "_thumbnail_id").collect()
      .map(r => r.getAs[Long]("entity_id") ->
        ((r.getAs[String]("meta_value"), r.getAs[String]("mode")))).toMap
    assert(meta == Map(1L -> (("10", "update")), 2L -> (("11", "update"))))
  }

  test("fetchNew fetches each distinct new url once via mapPartitions") {
    val attachments = Seq((10L, "hero.jpg")).toDF("attachment_id", "filename")
    val media = Seq((1L, "http://x/hero.jpg"), (2L, "http://x/new.bin"),
      (3L, "http://x/new.bin")).toDF("entity_id", "url")
    val resolved = Media.resolveAttachments(media, attachments)
    val fetched = Media.fetchNew(resolved, url => url.getBytes("UTF-8")).collect()
    assert(fetched.length == 1)
    assert(new String(fetched.head.getAs[Array[Byte]]("payload"), "UTF-8") == "http://x/new.bin")
  }

  test("validate + partitionValid + stats") {
    val df = Seq((1L, 5, "ok"), (2L, -1, "ok"), (3L, 5, null.asInstanceOf[String]))
      .toDF("id", "qty", "status")
    val rules = Seq("qty_pos" -> (col("qty") > 0), "has_status" -> col("status").isNotNull)
    val validated = Validation.validate(df, rules)
    val errs = validated.collect()
      .map(r => r.getAs[Long]("id") ->
        r.getAs[scala.collection.Seq[String]]("errors").toList).toMap
    assert(errs(1L).isEmpty)
    assert(errs(2L) == List("qty_pos"))
    assert(errs(3L) == List("has_status"))
    val (valid, rejects) = Validation.partitionValid(validated)
    assert(valid.select("id").as[Long].collect().toSet == Set(1L))
    assert(rejects.count() == 2)
    val st = Validation.stats(validated, rules.map(_._1)).collect().head
    assert(st.getAs[Long]("total") == 3 && st.getAs[Long]("valid") == 1 &&
      st.getAs[Long]("rejected") == 2 && st.getAs[Long]("n_qty_pos") == 1 &&
      st.getAs[Long]("n_has_status") == 1)
  }

  test("null predicate counts as failed (null-hostile rule inputs)") {
    val df = Seq((1L, null.asInstanceOf[java.lang.Integer])).toDF("id", "qty")
    val validated = Validation.validate(df, Seq("qty_pos" -> (col("qty") > 0)))
    assert(!validated.select("is_valid").as[Boolean].head())
  }

  test("saltedJoin equals the plain join while spreading hot keys") {
    val big = (1 to 5000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "payload") // key 1 is a heavy hitter (500 rows)
    val small = Seq((1L, "hot"), (2L, "cold"), (7L, "seven")).toDF("k", "label")
    val plain = big.join(small, Seq("k")).select("k", "payload", "label")
    val salted = Skew.saltedJoin(big, small, Seq("k"), salts = 8)
      .select("k", "payload", "label")
    assert(rowsOf(salted) == rowsOf(plain))
    assert(salted.count() == plain.count())
  }
}
