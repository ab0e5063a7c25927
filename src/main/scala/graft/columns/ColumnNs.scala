package graft.columns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-namespace utilities.
  *
  * The reference uses flat column names with dot-separated prefixes as
  * namespaces (`legacy.`, `post.`, `meta.`, `tax.`, ... — see
  * `lib/Classes/Extract/Normalizers/DataNormalizer.php:49-53` and
  * `lib/Classes/Load/Loaders/BaseLoader.php:109-154` in the reference).
  * We keep the same flat dotted-name model: these are all pure column-name
  * manipulations (`select`/`toDF`), so Catalyst's column pruning and
  * predicate pushdown compose through them untouched — no struct
  * reshaping, no shuffle, no UDFs.
  */
object ColumnNs {

  /** Backtick-quote a dotted column name for safe resolution. Embedded
    * backticks are escaped by doubling, per Spark's identifier rules. */
  def q(name: String): Column = col("`" + name.replace("`", "``") + "`")

  /** P4 `prefix_ref`: prepend `prefix` to every column name.
    * Reference: RenameWithPrefixAllEntriesTransformer.php:34-44.
    */
  def prefixAll(df: DataFrame, prefix: String): DataFrame =
    df.toDF(df.columns.map(prefix + _).toIndexedSeq: _*)

  /** P5 `select_prefix`: keep only columns starting with one of the
    * prefixes; optionally strip the prefix from the kept names.
    * Reference: SelectPrefixTransformer.php:31-68.
    */
  def selectPrefix(df: DataFrame, prefixes: Seq[String],
                   removePrefix: Boolean = false): DataFrame = {
    val kept = df.columns.filter(c => prefixes.exists(c.startsWith))
    val outNames = kept.map { c =>
      if (removePrefix)
        prefixes.find(c.startsWith).map(p => c.stripPrefix(p)).getOrElse(c)
      else c
    }
    // Stripping different prefixes can alias distinct inputs onto one output
    // name (`meta.x` and `tax.x` both -> `x`); that DataFrame only fails much
    // later at resolution, so fail fast here with the offenders named.
    val dups = outNames.groupBy(identity).collect { case (n, g) if g.length > 1 => n }
    require(dups.isEmpty,
      s"selectPrefix: stripping prefixes ${prefixes.mkString(",")} collides on " +
        s"output name(s): ${dups.mkString(", ")}")
    val cols = kept.zip(outNames).map { case (c, out) => q(c).as(out) }
    df.select(cols.toIndexedSeq: _*)
  }

  def selectPrefix(df: DataFrame, prefix: String): DataFrame =
    selectPrefix(df, Seq(prefix))

  /** P3 `rename_regex`: regex-rewrite all column names. The reference uses
    * this to strip control / non-ASCII bytes from header-derived names
    * (RenameRegexReplaceAllEntriesTransformer.php:38-48).
    */
  def renameRegex(df: DataFrame, pattern: String, replacement: String): DataFrame =
    df.toDF(df.columns.map(_.replaceAll(pattern, replacement)).toIndexedSeq: _*)

  /** Strip control chars + non-ASCII from all column names
    * (DataNormalizer.php:36 — `/[\x00-\x1F\x80-\xFF]/`). PHP's regex is
    * byte-wise, so every byte of a multibyte UTF-8 char matches [\x80-\xFF]
    * and the whole char vanishes; parity therefore means stripping ALL
    * non-ASCII code points, not just U+0080-U+00FF. */
  def stripControlChars(df: DataFrame): DataFrame =
    renameRegex(df, "[\\x00-\\x1F]|[^\\x00-\\x7F]", "")

  /** snake_case one name: `Post Title` -> `post_title`, `postTitle` ->
    * `post_title`. Reference: `renameAllStyle('snake')`
    * (DataNormalizer.php:34). */
  def snakeCase(name: String): String = {
    val spaced = name.trim
      .replaceAll("([a-z0-9])([A-Z])", "$1_$2")
      .replaceAll("[\\s\\-]+", "_")
    spaced.toLowerCase
  }

  /** P2: snake_case all column names. */
  def snakeCaseAll(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(snakeCase).toIndexedSeq: _*)

  /** Full extract normalization: snake_case names, strip control chars
    * from names, then prefix everything. Reference:
    * DataNormalizer.php:32-53. */
  def normalize(df: DataFrame, prefix: String): DataFrame =
    prefixAll(stripControlChars(snakeCaseAll(df)), prefix)

  /** P6: drop named columns (missing names ignored, like the reference's
    * remove-entries which no-ops on absent entries). */
  def dropColumns(df: DataFrame, names: Seq[String]): DataFrame =
    df.drop(names.toIndexedSeq: _*)

  /** P7 `reduce_row_on_prefix` (flat form): scope to `prefix.*`, strip the
    * prefix. The prefix is normalized to end with exactly one dot (the
    * reference does rtrim($prefix,'.').'.' — BaseLoader.php:109-141), so
    * `reduceOnPrefix(df, "post")` matches `post.*` but NOT `postmeta.x`,
    * and stripped names never start with a dot. */
  def reduceOnPrefix(df: DataFrame, prefix: String): DataFrame = {
    val p = prefix.replaceAll("\\.+$", "") + "."
    selectPrefix(df, Seq(p), removePrefix = true)
  }

  /** P7 with `unpack = true`: additionally re-nest dotted names into
    * struct trees (`a.b.c` -> struct a{ struct b{ c }}), mirroring the
    * recursive array nesting at BaseLoader.php:142-177. Applied at sink
    * boundaries only. */
  def nestDotted(df: DataFrame): DataFrame = {
    // Build a trie of name segments -> leaf column.
    sealed trait Node
    case class Leaf(colName: String) extends Node
    case class Branch(children: scala.collection.mutable.LinkedHashMap[String, Node]) extends Node

    val root = Branch(scala.collection.mutable.LinkedHashMap.empty)
    df.columns.foreach { c =>
      val parts = c.split("\\.")
      var cur = root
      parts.zipWithIndex.foreach { case (p, i) =>
        if (i == parts.length - 1) {
          // A name that is both a leaf and a branch prefix (`a` and `a.b`)
          // would silently drop one of the two at a sink boundary; refuse.
          require(!cur.children.get(p).exists(_.isInstanceOf[Branch]),
            s"nestDotted: column '$c' collides with nested columns under '$c.'")
          cur.children(p) = Leaf(c)
        } else cur.children.get(p) match {
          case Some(b: Branch) => cur = b
          case Some(_: Leaf) =>
            throw new IllegalArgumentException(
              s"nestDotted: column '$c' collides with plain column '${parts.take(i + 1).mkString(".")}'")
          case None =>
            val b = Branch(scala.collection.mutable.LinkedHashMap.empty)
            cur.children(p) = b; cur = b
        }
      }
    }
    def build(n: Node): Column = n match {
      case Leaf(c)    => q(c)
      case Branch(ch) => struct(ch.toSeq.map { case (k, v) => build(v).as(k) }: _*)
    }
    val cols = root.children.toSeq.map { case (k, v) => build(v).as(k) }
    df.select(cols: _*)
  }

  /** Inverse of [[nestDotted]]: flatten nested struct columns back to
    * dotted names (`a.b.c`), recursively. Round-trips with nestDotted
    * (property-tested). */
  def flattenNested(df: DataFrame): DataFrame = {
    def expand(prefix: String, dt: DataType, c: Column): Seq[(String, Column)] = dt match {
      case st: StructType =>
        st.fields.toSeq.flatMap(f => expand(s"$prefix.${f.name}", f.dataType, c.getField(f.name)))
      case _ => Seq(prefix -> c)
    }
    val cols = df.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case st: StructType => expand(f.name, st, q(f.name))
        case _              => Seq(f.name -> q(f.name))
      }
    }
    df.select(cols.map { case (n, c) => c.as(n) }: _*)
  }

  /** A5 `merge_states`: union two heterogeneous frames tolerating missing
    * columns on either side (the reference collects both sides and
    * `array_merge`s row arrays — Extract/Orchestrator.php:216-227 — which
    * is union-by-name; we stay distributed). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)

  def mergeAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduceLeft(merge)
}
