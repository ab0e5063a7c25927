package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S6-S8 — WP entity readers, set-oriented.
  *
  * The reference's extractors page through `WP_Query` / `get_terms` /
  * `get_users` and, PER POST, fetch meta, taxonomy terms, and author
  * (`WPPostsExtractor.php:37-167`). Over relational tables
  * (`wp_posts`-shaped parquet/JDBC) those per-row fetches are joins:
  *
  * - meta embedding   = groupBy(entity) + `map_from_entries(collect_list)`
  * - taxonomy structs = rel ⋈ terms, grouped per post per taxonomy
  * - author struct    = broadcast join on the (small) users dim
  *
  * Scale notes: meta/taxonomy aggregation shuffles by entity id once and
  * the subsequent join is co-partitioned on the same key; the users dim
  * is broadcast. Filters (`post_type`, `post_status`, role…) are plain
  * `.filter` so Catalyst pushes them into the scan.
  */
object WpReaders {

  /** Options mirror the extractor's builders
    * (`WPPostsExtractor.php:169-229`). */
  final case class PostsOpts(
      postType: Option[String] = Some("post"),
      postStatus: Option[String] = Some("publish"),
      orderBy: String = "id", order: String = "asc",
      limit: Option[Int] = None,
      withMeta: Boolean = false,
      withTaxonomies: Boolean = false,
      withAuthor: Boolean = false)

  /** S6 — posts reader. `posts` must have columns `id, post_type,
    * post_status, post_author, ...`; `meta(post_id, meta_key,
    * meta_value)`; `termRel(post_id, term_id)`; `terms(term_id, name,
    * slug, taxonomy)`; `users(id, ...)`. */
  def readPosts(posts: DataFrame,
                meta: Option[DataFrame] = None,
                termRel: Option[DataFrame] = None,
                terms: Option[DataFrame] = None,
                users: Option[DataFrame] = None,
                opts: PostsOpts = PostsOpts()): DataFrame = {
    var df = posts
    opts.postType.foreach(t => df = df.filter(col("post_type") === t))
    opts.postStatus.foreach(s => df = df.filter(col("post_status") === s))

    if (opts.withMeta) {
      val m = meta.getOrElse(sys.error("readPosts: withMeta requires meta table"))
      // map<key, array<value>> like get_post_meta (single=false returns
      // ALL values per key — WPPostsExtractor.php:59); two-level
      // aggregation so duplicate keys fold into the value array.
      // Pre-partition on post_id alone: hashpartitioning(post_id)
      // satisfies BOTH groupBys' distributions, so the corpus-sized
      // meta table crosses the wire ONCE instead of twice (the
      // (post_id, meta_key) partial combine it forfeits is ~no-op —
      // that pair is nearly unique in a meta table).
      val metaMap = m.repartition(col("post_id"))
        .groupBy(col("post_id"), col("meta_key"))
        .agg(sort_array(collect_list(col("meta_value"))).as("__vals"))
        .groupBy(col("post_id"))
        .agg(map_from_entries(collect_list(struct(col("meta_key"), col("__vals"))))
          .as("meta"))
      df = df.join(metaMap, df("id") === metaMap("post_id"), "left_outer")
        .drop("post_id")
    }
    if (opts.withTaxonomies) {
      val rel = termRel.getOrElse(sys.error("readPosts: withTaxonomies requires termRel"))
      val t = terms.getOrElse(sys.error("readPosts: withTaxonomies requires terms"))
      // taxonomy -> sorted array<struct<term_id,name,slug>> per post
      // (WPPostsExtractor.php:120-145); sort_array makes the embedding
      // deterministic (collect_list order is not).
      // same single-exchange shape as the meta map above
      val joined = rel.join(t, Seq("term_id"))
        .repartition(col("post_id"))
        .groupBy(col("post_id"), col("taxonomy"))
        .agg(sort_array(collect_list(struct(col("term_id"), col("name"), col("slug"))))
          .as("terms"))
        .groupBy(col("post_id"))
        .agg(map_from_entries(collect_list(struct(col("taxonomy"), col("terms"))))
          .as("taxonomies"))
      df = df.join(joined, df("id") === joined("post_id"), "left_outer").drop("post_id")
    }
    if (opts.withAuthor) {
      val u = users.getOrElse(sys.error("readPosts: withAuthor requires users"))
      val authorStruct = u.select(col("id").as("__author_id"),
        struct(u.columns.map(col).toIndexedSeq: _*).as("author"))
      df = df.join(broadcast(authorStruct),
        df("post_author") === col("__author_id"), "left_outer").drop("__author_id")
    }
    val sortCol = if (opts.order.equalsIgnoreCase("desc")) col(opts.orderBy).desc
                  else col(opts.orderBy).asc
    df = df.orderBy(sortCol)
    opts.limit.foreach(n => df = df.limit(n))
    df
  }

  /** S7 — terms reader: resolve `parent` term-id to the PARENT'S SLUG
    * (`WPTermExtractor.php:111`) via a self-join (broadcast — term dims
    * are small relative to fact tables). */
  def readTerms(terms: DataFrame, taxonomy: Option[String] = None): DataFrame = {
    var df = terms
    taxonomy.foreach(t => df = df.filter(col("taxonomy") === t))
    val parents = terms.select(col("term_id").as("__pid"), col("slug").as("parent_slug"))
    df.join(broadcast(parents), df("parent") === col("__pid"), "left_outer")
      .drop("__pid")
      .withColumn("parent_slug", coalesce(col("parent_slug"), lit("")))
  }

  /** S8 — users reader with the extractor's filter set
    * (`WPUserExtractor.php:48-93`): role membership, include/exclude id
    * lists, login/email substring search. */
  def readUsers(users: DataFrame,
                roleIn: Seq[String] = Nil, roleNotIn: Seq[String] = Nil,
                include: Seq[Long] = Nil, exclude: Seq[Long] = Nil,
                search: Option[String] = None,
                limit: Option[Int] = None): DataFrame = {
    var df = users
    if (roleIn.nonEmpty) df = df.filter(col("role").isin(roleIn: _*))
    if (roleNotIn.nonEmpty) df = df.filter(!col("role").isin(roleNotIn: _*))
    if (include.nonEmpty) df = df.filter(col("id").isin(include: _*))
    if (exclude.nonEmpty) df = df.filter(!col("id").isin(exclude: _*))
    search.foreach(s => df = df.filter(
      col("user_login").contains(s) || col("user_email").contains(s)))
    df = df.orderBy(col("id").asc)
    limit.foreach(n => df = df.limit(n))
    df
  }
}
