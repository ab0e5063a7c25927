package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WpPipelinesSpec extends SparkSpec {
  import spark.implicits._

  test("postPipeline produces the full post.* chain; missing sources degrade to defaults") {
    val df = Seq(("My <b>Title</b>", "<p>Body</p><script>x</script>"))
      .toDF("legacy.title", "legacy.content")
    val out = WpPipelines.postPipeline()(df).collect().head
    assert(out.getAs[String]("post.post_type") == "post")
    assert(out.getAs[String]("post.post_title") == "My Title")
    assert(out.getAs[String]("post.post_name") == "my-title")
    assert(!out.getAs[String]("post.post_content").contains("script"))
    assert(out.getAs[String]("post.post_status") == "publish")
    assert(out.getAs[java.sql.Timestamp]("post.post_date") != null)
    assert(out.getAs[String]("meta.etl_pipeline") == "WordPressPostPipeline")
  }

  test("postPipeline with block conversion emits serialized Gutenberg blocks") {
    val df = Seq(("T", "<p>hello</p>")).toDF("legacy.title", "legacy.content")
    val out = WpPipelines.postPipeline(WpPipelines.PostPipelineOpts(
      convertBlocks = true))(df).collect().head
    assert(out.getAs[String]("post.post_content").contains("<!-- wp:paragraph -->"))
  }

  test("termPipeline repairs names and slugs; optional parent slug") {
    val df = Seq(("  Dirty <i>Name</i> ", "Parent Cat")).toDF("n", "p")
    val out = WpPipelines.termPipeline("n", "category", Some("p"))(df).collect().head
    assert(out.getAs[String]("term.name") == "Dirty Name")
    assert(out.getAs[String]("term.slug") == "dirty-name")
    assert(out.getAs[String]("term.taxonomy") == "category")
    assert(out.getAs[String]("term.parent_slug") == "parent-cat")
  }

  test("userPipeline sanitizes login/email and stamps roles") {
    val df = Seq(("<b>Ann</b>!", "Ann.O'Neil@Example.COM")).toDF("l", "e")
    val out = WpPipelines.userPipeline("l", "e")(df).collect().head
    assert(out.getAs[String]("user.user_login") == "Ann")
    assert(out.getAs[String]("user.user_email") == "ann.o'neil@example.com")
    assert(out.getAs[scala.collection.Seq[String]]("user.roles") == Seq("subscriber"))
  }

  test("mediaPipeline seeds remote_url list and cleans the url") {
    val df = Seq(("http://x/img 1.png", "A Pic"), (null, "No Url"))
      .toDF("u", "t")
    val rows = WpPipelines.mediaPipeline("u", Some("t"))(df).collect()
    val withUrl = rows.find(_.getAs[String]("media.title") == "A Pic").get
    assert(withUrl.getAs[scala.collection.Seq[String]]("media.remote_url")
      == Seq("http://x/img 1.png"))
    assert(withUrl.getAs[String]("media.url") == "http://x/img1.png")
    val noUrl = rows.find(_.getAs[String]("media.title") == "No Url").get
    assert(noUrl.getAs[scala.collection.Seq[String]]("media.remote_url").isEmpty)
  }
}
