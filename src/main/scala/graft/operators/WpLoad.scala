package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.columns.ColumnNs.q

/** Set-oriented forms of the WP load-side operators (K9, K10, K12, K15).
  *
  * The reference iterates rows and calls `update_post_meta` /
  * `wp_set_object_terms` per row; at scale these become unpivots and
  * explodes producing normalized relation tables that a single
  * partitioned write (or MERGE) persists.
  */
object WpLoad {

  /** K9 — meta unpivot. Every `meta.<key>[.add]` column becomes rows
    * `(entity_id, meta_key, meta_value, mode)`; `.add` selects
    * append-vs-update mode (`WPPostMetaLoader.php:114-131`). Null values
    * are dropped (no meta row is written for an absent value). The
    * unpivot is a single projection + `explode` — map-side only, no
    * shuffle. */
  def unpivotMeta(df: DataFrame, idCol: String, prefix: String = "meta.",
                  outIdCol: String = "entity_id"): DataFrame = {
    val metaCols = df.columns.filter(_.startsWith(prefix))
    require(metaCols.nonEmpty, s"unpivotMeta: no '$prefix*' columns present")
    val entries = metaCols.map { c =>
      val rawKey = c.stripPrefix(prefix)
      val mode = if (rawKey.endsWith(".add")) "add" else "update"
      val key = rawKey.stripSuffix(".add")
      struct(lit(key).as("meta_key"),
             q(c).cast(StringType).as("meta_value"),
             lit(mode).as("mode"))
    }
    df.select(q(idCol).as(outIdCol), explode(array(entries.toIndexedSeq: _*)).as("m"))
      .select(col(outIdCol), col("m.meta_key"), col("m.meta_value"), col("m.mode"))
      .where(col("meta_value").isNotNull)
  }

  /** Thumbnail composite — the reference's featured-media step
    * (`WordPressPostLoader.php:109-116` sideloads
    * `meta._remote_featured_media` and calls `set_post_thumbnail`;
    * `WithSideLoadMedia.php:23` probes the library by filename first):
    * rows carrying a featured-media URL resolve it against the
    * attachments table via the K14 resolver ([[Media.resolveAttachments]]
    * — filename probe variants, dedup-before-fetch, new ids allocated
    * per distinct URL) and gain BOTH `post.featured_media` (the row
    * mutation the reference applies) and `meta._thumbnail_id`, which
    * the K9 unpivot ([[unpivotMeta]]) then writes as
    * `set_post_thumbnail`'s meta row. Rows without a URL pass through
    * with nulls (no meta row — unpivot drops null values).
    *
    * Scale shape: resolution runs on DISTINCT URLs only; the join back
    * to the batch is on the entity id. The attachments side is a dim
    * table — broadcastable when small; the batch is never collected. */
  def withThumbnails(df: DataFrame, attachments: DataFrame, idCol: String,
                     urlCol: String = "meta._remote_featured_media"): DataFrame = {
    require(df.columns.contains(urlCol),
      s"withThumbnails: column '$urlCol' not present")
    val media = df.where(q(urlCol).isNotNull)
      .select(q(idCol).as("entity_id"), q(urlCol).as("url"))
    val resolved = Media.resolveAttachments(media, attachments)
      .select(col("entity_id"), col("attachment_id").as("__thumb_id"))
    df.join(resolved, q(idCol) === col("entity_id"), "left_outer")
      .drop("entity_id")
      .withColumn("post.featured_media", col("__thumb_id"))
      .withColumn("meta._thumbnail_id", col("__thumb_id").cast(StringType))
      .drop("__thumb_id")
  }

  /** K12 — post↔terms explode. Every `tax.<taxonomy>` column (scalar or
    * array — `WPPostTermsLoader.php:112-145` accepts both) becomes rows
    * `(entity_id, taxonomy, term)`. Replace semantics of
    * `wp_set_object_terms` are achieved by overwriting the relationship
    * partition for the loaded entity ids. */
  def explodeTaxTerms(df: DataFrame, idCol: String, prefix: String = "tax.",
                      outIdCol: String = "entity_id"): DataFrame = {
    val taxCols = df.columns.filter(_.startsWith(prefix))
    require(taxCols.nonEmpty, s"explodeTaxTerms: no '$prefix*' columns present")
    val entries = taxCols.map { c =>
      val taxonomy = c.stripPrefix(prefix)
      val arr = df.schema(c).dataType match {
        case _: ArrayType => q(c).cast(ArrayType(StringType))
        case _            => array(q(c).cast(StringType))
      }
      struct(lit(taxonomy).as("taxonomy"), arr.as("terms"))
    }
    df.select(q(idCol).as(outIdCol), explode(array(entries.toIndexedSeq: _*)).as("t"))
      .select(col(outIdCol), col("t.taxonomy"), explode(col("t.terms")).as("term"))
      .where(col("term").isNotNull && trim(col("term")) =!= "")
  }

  /** K10 pass 1 — ensure parent terms exist. Distinct parent slugs
    * missing from the target term table become create-rows (the
    * reference creates a parent by slug/name when absent,
    * `WPTermsLoader.php:180-221`). Left-anti join, then the caller
    * appends/upserts the result before loading children. */
  def missingParents(incoming: DataFrame, target: DataFrame,
                     parentSlugCol: String = "parent_slug",
                     targetSlugCol: String = "slug",
                     taxonomyCol: String = "taxonomy"): DataFrame = {
    val wanted = incoming
      .where(q(parentSlugCol).isNotNull && trim(q(parentSlugCol)) =!= "")
      .select(q(taxonomyCol).as("taxonomy"), q(parentSlugCol).as("slug"))
      .dropDuplicates("taxonomy", "slug")
    wanted.join(
        target.select(q(taxonomyCol).as("taxonomy"), q(targetSlugCol).as("slug")),
        Seq("taxonomy", "slug"), "left_anti")
      .withColumn("name", col("slug"))
  }

  /** K15 — media placeholder substitution, set-oriented. `resolved` is
    * the media-loader result `(entity_id, token, value)` (K14's output);
    * every string column of `df` gets its `%%token%%` occurrences
    * replaced from that row's token map. One groupBy builds the per-row
    * map, a broadcast-or-shuffle join attaches it, and the interpolate
    * UDF substitutes (`WordPressMediaLoader.php:96-148`). */
  def substitutePlaceholders(df: DataFrame, idCol: String,
                             resolved: DataFrame,
                             stringCols: Seq[String]): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession) // graft_interpolate
    val maps = resolved.groupBy(col("entity_id"))
      .agg(map_from_entries(collect_list(struct(col("token"), col("value"))))
        .as("__tokens"))
    val joined = df.join(maps, q(idCol) === col("entity_id"), "left_outer")
      .drop("entity_id")
    val subbed = stringCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c, when(col("__tokens").isNotNull,
        graft.functions.Fns.interpolate(q(c), col("__tokens"))).otherwise(q(c)))
    }
    subbed.drop("__tokens")
  }
}
