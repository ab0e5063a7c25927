package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WpReadersSpec extends SparkSpec {
  import spark.implicits._

  private def posts = Seq(
    (1L, "post", "publish", 10L, "First"),
    (2L, "post", "draft", 10L, "Second"),
    (3L, "page", "publish", 11L, "Third"))
    .toDF("id", "post_type", "post_status", "post_author", "post_title")

  test("readPosts filters type/status and embeds the author struct") {
    val users = Seq((10L, "alice"), (11L, "bob")).toDF("id", "display_name")
    val out = WpReaders.readPosts(posts, users = Some(users),
      opts = WpReaders.PostsOpts(withAuthor = true))
    val rows = out.select(col("id"), col("author.display_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(rows.toSeq == Seq(1L -> "alice")) // only post+publish survives
  }

  test("readPosts meta embedding folds duplicate keys into value arrays") {
    val meta = Seq((1L, "color", "red"), (1L, "color", "blue"), (1L, "size", "xl"))
      .toDF("post_id", "meta_key", "meta_value")
    val out = WpReaders.readPosts(posts, meta = Some(meta),
      opts = WpReaders.PostsOpts(withMeta = true))
    val m = out.where(col("id") === 1L)
      .select("meta").as[Map[String, Seq[String]]].head()
    assert(m("color") == Seq("blue", "red")) // sorted values
    assert(m("size") == Seq("xl"))
  }

  test("readPosts taxonomy embedding groups sorted term structs per taxonomy") {
    val rel = Seq((1L, 100L), (1L, 101L), (1L, 200L)).toDF("post_id", "term_id")
    val terms = Seq((100L, "News", "news", "category"),
      (101L, "Tech", "tech", "category"), (200L, "red", "red", "post_tag"))
      .toDF("term_id", "name", "slug", "taxonomy")
    val out = WpReaders.readPosts(posts, termRel = Some(rel), terms = Some(terms),
      opts = WpReaders.PostsOpts(withTaxonomies = true))
    val tax = out.where(col("id") === 1L)
      .select(map_keys(col("taxonomies")).as("ks")).as[Seq[String]].head()
    assert(tax.toSet == Set("category", "post_tag"))
    val cats = out.where(col("id") === 1L)
      .select(element_at(col("taxonomies"), "category").getField("slug").as("s"))
      .as[Seq[String]].head()
    assert(cats == Seq("news", "tech"))
  }

  test("readTerms resolves parent ids to parent slugs; roots get ''") {
    val terms = Seq((1L, "Root", "root", null.asInstanceOf[java.lang.Long]),
      (2L, "Child", "child", java.lang.Long.valueOf(1L)))
      .toDF("term_id", "name", "slug", "parent")
    val out = WpReaders.readTerms(terms).collect()
      .map(r => r.getAs[String]("slug") -> r.getAs[String]("parent_slug")).toMap
    assert(out == Map("root" -> "", "child" -> "root"))
  }

  test("readUsers applies role/include/exclude/search filters") {
    val users = Seq(
      (1L, "alice", "alice@x.com", "editor"),
      (2L, "bob", "bob@x.com", "editor"),
      (3L, "carol-needle", "carol@x.com", "author"),
      (4L, "dan", "needle@x.com", "editor"))
      .toDF("id", "user_login", "user_email", "role")
    val byRole = WpReaders.readUsers(users, roleIn = Seq("editor"))
      .select("id").as[Long].collect().toSet
    assert(byRole == Set(1L, 2L, 4L))
    val searched = WpReaders.readUsers(users, search = Some("needle"))
      .select("id").as[Long].collect().toSet
    assert(searched == Set(3L, 4L)) // login OR email contains
    val excluded = WpReaders.readUsers(users, exclude = Seq(1L, 2L))
      .select("id").as[Long].collect().toSet
    assert(excluded == Set(3L, 4L))
  }
}
