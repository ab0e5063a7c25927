package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.columns.ColumnNs.q
import graft.functions.{Fns, HtmlBlocks}

/** Transform-pipeline templates — the template-method chains of the
  * reference (`lib/Classes/Transform/TransformationPipelines/
  * WordPressPostPipeline.php:121-140` runs post_type → post_title →
  * post_name → post_content → post_status → post_date → meta →
  * tax_terms, each appending a `withEntry` expression). Each step here
  * is an overridable `Stage`; `run` chains them in the same order.
  *
  * All steps are pure column expressions (codegen'd); a pipeline is a
  * zero-shuffle projection pass.
  */
object WpPipelines {
  import Pipeline.Stage

  /** Post pipeline options: which `legacy.*` columns feed which
    * `post.*` fields. */
  final case class PostPipelineOpts(
      titleCol: String = "legacy.title",
      contentCol: String = "legacy.content",
      dateCol: Option[String] = None,
      postType: String = "post",
      postStatus: String = "publish",
      slugPrefix: String = "",
      convertBlocks: Boolean = false,
      etlPipeline: String = "WordPressPostPipeline")

  /** The WordPressPostPipeline chain. Missing source columns degrade
    * to null (the reference's entry factory yields null entries). */
  def postPipeline(opts: PostPipelineOpts = PostPipelineOpts()): Stage = { df =>
    def src(c: String): Column =
      if (df.columns.contains(c)) q(c) else lit(null).cast("string")
    val title = Fns.sanitizeTextField(src(opts.titleCol))
    val content =
      if (opts.convertBlocks) HtmlBlocks.htmlToBlocks(src(opts.contentCol))
      else Fns.ksesPost(src(opts.contentCol))
    val date = opts.dateCol.map(c => Fns.normalizeDate(src(c)))
      .getOrElse(current_timestamp())
    df.withColumn("post.post_type", lit(opts.postType))
      .withColumn("post.post_title", title)
      .withColumn("post.post_name", Fns.toSlug(title, opts.slugPrefix))
      .withColumn("post.post_content", content)
      .withColumn("post.post_status", lit(opts.postStatus))
      .withColumn("post.post_date", date)
      .withColumn("meta.etl_pipeline", lit(opts.etlPipeline))
  }

  /** WordPressTermPipeline (`WordPressTermPipeline.php:73-75`):
    * term.name / term.slug / term.taxonomy. */
  def termPipeline(nameCol: String, taxonomy: String,
                   parentSlugCol: Option[String] = None): Stage = { df =>
    val name = Fns.repairText(q(nameCol))
    val base = df.withColumn("term.name", name)
      .withColumn("term.slug", Fns.toSlug(name))
      .withColumn("term.taxonomy", lit(taxonomy))
    parentSlugCol.fold(base)(p => base.withColumn("term.parent_slug", Fns.toSlug(q(p))))
  }

  /** WordPressUserPipeline (`WordPressUserPipeline.php:145-176`):
    * sanitize login/email, constant etl marker. */
  def userPipeline(loginCol: String, emailCol: String,
                   roles: Seq[String] = Seq("subscriber")): Stage = { df =>
    df.withColumn("user.user_login", Fns.sanitizeUser(q(loginCol)))
      .withColumn("user.user_email", Fns.sanitizeEmail(q(emailCol)))
      .withColumn("user.roles", array(roles.map(lit): _*))
      .withColumn("user.user_registered", current_timestamp())
      .withColumn("meta.etl_pipeline", lit("WordPressUserPipeline"))
  }

  /** WordPressMediaPipeline (`WordPressMediaPipeline.php:76`): init the
    * remote-url list column and per-media fields. */
  def mediaPipeline(urlCol: String, titleCol: Option[String] = None): Stage = { df =>
    val base = df.withColumn("media.remote_url",
        when(q(urlCol).isNotNull, array(q(urlCol)))
          .otherwise(array().cast("array<string>")))
      .withColumn("media.url", Fns.escUrlRaw(q(urlCol)))
    titleCol.fold(base)(t =>
      base.withColumn("media.title", Fns.sanitizeTextField(q(t))))
  }
}
