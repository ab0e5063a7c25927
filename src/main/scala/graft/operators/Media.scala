package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** K14 — media sideload loader, set-oriented core.
  *
  * The reference resolves each media URL per row: find an existing
  * attachment by filename — probing the WP rename-on-collision suffix
  * variants (`img.jpg` may exist as `img-1.jpg`/`img-2.jpg`,
  * `WPMediaLoader.php:354-426`, probe count `:360`) — else download and
  * create a new attachment (`:452-503`).
  *
  * Set-oriented: build the 3 probe filenames per URL, explode, join
  * once against the attachments table, keep the best-ranked probe hit;
  * unmatched URLs get deterministic new attachment ids. Downloads
  * happen at most once per distinct URL (dedup-before-fetch), inside
  * `mapPartitions` with per-batch connection reuse — never on the
  * driver.
  */
object Media {

  /** Filename from a URL: last path segment, query stripped, lowered. */
  def filenameOf(url: Column): Column =
    lower(regexp_extract(regexp_replace(url, "[?#].*$", ""), "[^/]+$", 0))

  /** The reference's suffix probe variants for one filename
    * (`WPMediaLoader.php:360`): `f.ext`, `f-1.ext`, `f-2.ext`. */
  def probeVariants(filename: Column): Column = {
    val base = regexp_replace(filename, "\\.[^.]*$", "")
    val ext = regexp_extract(filename, "(\\.[^.]*)$", 1)
    array(
      struct(lit(0).as("probe"), filename.as("fname")),
      struct(lit(1).as("probe"), concat(base, lit("-1"), ext).as("fname")),
      struct(lit(2).as("probe"), concat(base, lit("-2"), ext).as("fname")))
  }

  /** Resolve `(entity_id, url)` rows against an
    * `attachments(attachment_id, filename)` table. Returns
    * `(entity_id, url, filename, attachment_id, is_new)`; new ids are
    * max(existing)+1.. assigned in url order (distributed — sorted
    * zipWithIndex, no single-partition window), one id per DISTINCT
    * url (the dedup-before-fetch semantics: equal URLs share one
    * attachment). */
  def resolveAttachments(media: DataFrame, attachments: DataFrame,
                         entityIdCol: String = "entity_id",
                         urlCol: String = "url"): DataFrame = {
    val withName = media.select(col(entityIdCol).as("entity_id"),
      col(urlCol).as("url"), filenameOf(col(urlCol)).as("filename"))
    val distinctUrls = withName.select(col("url"), col("filename")).dropDuplicates("url")
    val probed = distinctUrls.select(col("url"), col("filename"),
        explode(probeVariants(col("filename"))).as("p"))
      .select(col("url"), col("filename"), col("p.probe"), col("p.fname"))
    val att = attachments.select(col("attachment_id"),
      lower(col("filename")).as("fname"))
    val hits = probed.join(att, Seq("fname"), "left_outer")
      .where(col("attachment_id").isNotNull)
      .groupBy(col("url"))
      .agg(min(struct(col("probe"), col("attachment_id"))).as("best"))
      .select(col("url"), col("best.attachment_id").as("attachment_id"))
    val resolved = distinctUrls.join(hits, Seq("url"), "left_outer")
    val unmatched = resolved.where(col("attachment_id").isNull)
      .select(col("url"), col("filename"))
    val maxDf = attachments.agg(
      coalesce(max(col("attachment_id")).cast(LongType), lit(0L)).as("__maxid"))
    val assigned = Upsert.withSequentialIds(unmatched, "__seq", 1L, Seq("url"))
      .crossJoin(broadcast(maxDf))
      .select(col("url"),
        (col("__maxid") + col("__seq")).as("attachment_id"), lit(true).as("is_new"))
    val perUrl = resolved.where(col("attachment_id").isNotNull)
      .select(col("url"), col("attachment_id").cast(LongType).as("attachment_id"),
        lit(false).as("is_new"))
      .unionByName(assigned)
    withName.join(perUrl, Seq("url"))
      .select(col("entity_id"), col("url"), col("filename"),
        col("attachment_id"), col("is_new"))
  }

  /** Fetch-on-executors shape (`WPMediaLoader.php:452-472` downloads):
    * only `is_new` URLs are fetched, each DISTINCT url exactly once,
    * inside mapPartitions (per-partition client reuse; bounded
    * batches). `fetch` is pluggable — tests pass a deterministic stub;
    * production passes a real HTTP client call. */
  def fetchNew(resolved: DataFrame, fetch: String => Array[Byte],
               batchSize: Int = 32): DataFrame = {
    val spark = resolved.sparkSession
    val out = StructType(Seq(
      StructField("url", StringType, nullable = false),
      StructField("attachment_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    resolved.where(col("is_new"))
      .select(col("url"), col("attachment_id")).dropDuplicates("url")
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch client init would happen here
          batch.map(r => Row(r.getString(0), r.getLong(1), fetch(r.getString(0))))
        }
      }(enc)
  }
}
