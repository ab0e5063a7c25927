package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable sketch aggregates — the custom `Aggregator` (UDAF)
  * extension surface SURVEY §2.9/§7.5 reserves for beyond-reference
  * work. The first resident: a MinHash-UNION sketch, which turns
  * "how similar are these two CORPUS SLICES" (sources, languages,
  * snapshots — billions of documents a side at 100 TB) into one
  * aggregation pass carrying k longs per group, instead of a
  * distinct-shingle shuffle proportional to the corpus.
  */
object Sketches {

  /** Element-wise-min union of MinHash signatures: the signature of a
    * UNION of shingle sets is the element-wise min of the sets'
    * signatures, so this aggregate is commutative, associative, and
    * idempotent — partial buffers merge in any order on the map side
    * and the result is partitioning-invariant (SketchesSpec proves
    * repartition invariance). Null inputs are skipped; the empty
    * buffer is the identity. Inputs must share one k (fails fast
    * otherwise). */
  class MinHashUnion extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.empty

    private def minInto(b: Array[Long], a: Seq[Long]): Array[Long] =
      if (b.isEmpty) a.toArray
      else {
        require(b.length == a.length,
          s"MinHashUnion: mixed signature widths ${b.length} vs ${a.length}")
        var i = 0
        while (i < b.length) { if (a(i) < b(i)) b(i) = a(i); i += 1 }
        b
      }

    override def reduce(b: Array[Long], a: Seq[Long]): Array[Long] =
      if (a == null) b else minInto(b, a)

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
      if (b2.isEmpty) b1 else minInto(b1, b2.toSeq)

    override def finish(r: Array[Long]): Seq[Long] = r.toSeq

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** Per-group MinHash signature of the group's shingle-set UNION:
    * map-only per-document signatures ([[Dedup.minhashSignatures]] —
    * the ONE definition of a document's signature, shared with the
    * dedup paths so sketches stay comparable with them) feed ONE
    * [[MinHashUnion]] aggregation — the shuffle carries k longs per
    * group (map-side combined), never a shingle. */
  def groupSignatures(df: DataFrame, groupCol: String, textCol: String,
                      k: Int = 64, n: Int = 5): DataFrame = {
    val perDoc = Dedup.minhashSignatures(df, groupCol, textCol, k, n)
      .select(col("doc_id").as("group_key"), col("sig").as("__sig"))
    val union = udaf(new MinHashUnion)
    perDoc.groupBy(col("group_key"))
      .agg(union(col("__sig")).as("sig"))
  }

  /** INCREMENTAL sketch maintenance — fold a new batch's group
    * signatures into a PERSISTED signature frame without rescanning
    * the corpus (the observability analogue of `exactDedupAgainst` /
    * `packSequencesAppend`): element-wise min is associative,
    * commutative and idempotent, so
    * `merge(sig(A), sig(B)) == sig(A ∪ B)` EXACTLY — spec-proven on
    * corpus slices and oracle-bound by the planted
    * `sketch_merge_planted` row. Shape: union → one bounded
    * (group, pos) aggregation (k rows per group) → re-assemble; groups
    * absent from one side pass through unchanged (min over one side).
    * At 100 TB the stored frame is G × k longs — megabytes — and each
    * daily batch pays only its own scan.
    *
    * `k` (the signature length) is part of the persisted frame's
    * contract and is VALIDATED before merging: signatures built with
    * different `numHashes` are incomparable, and the positional merge
    * would otherwise silently emit malformed signatures (the longer
    * side's extra positions passing through un-merged). The guard is
    * one min/max aggregate over the two frames — trivial against
    * sketch-sized inputs. */
  def mergeSignatureFrames(a: DataFrame, b: DataFrame,
                           groupCol: String = "group_key",
                           sigCol: String = "sig"): DataFrame = {
    val ks = a.select(size(col(sigCol)).as("__k"))
      .unionByName(b.select(size(col(sigCol)).as("__k")))
      .agg(min(col("__k")), max(col("__k"))).head()
    if (!ks.isNullAt(0))
      require(ks.getInt(0) == ks.getInt(1),
        s"mergeSignatureFrames: signature lengths differ across inputs " +
          s"(${ks.getInt(0)} vs ${ks.getInt(1)}) — frames built with " +
          "different numHashes are incomparable")
    a.select(col(groupCol), col(sigCol))
      .unionByName(b.select(col(groupCol), col(sigCol)))
      .select(col(groupCol), posexplode(col(sigCol)).as(Seq("__pos", "__h")))
      .groupBy(col(groupCol), col("__pos")).agg(min(col("__h")).as("__h"))
      .groupBy(col(groupCol))
      .agg(transform(
        sort_array(collect_list(struct(col("__pos"), col("__h")))),
        m => m.getField("__h")).as(sigCol))
  }

  /** Estimated content-Jaccard between every pair of groups (a < b):
    * the fraction of matching signature positions — an unbiased
    * estimator of the Jaccard of the groups' shingle-set unions, with
    * standard error ~1/sqrt(k). Pairwise work is G²/2 over GROUPS (a
    * handful of sources/languages), never over documents. */
  def groupSimilarity(df: DataFrame, groupCol: String, textCol: String,
                      k: Int = 64, n: Int = 5): DataFrame = {
    val sigs = groupSignatures(df, groupCol, textCol, k, n)
    val l = sigs.select(col("group_key").as("a"), col("sig").as("__sa"))
    val r = sigs.select(col("group_key").as("b"), col("sig").as("__sb"))
    l.join(r, col("a") < col("b"))
      .select(col("a"), col("b"),
        Dedup.sigAgreement(col("__sa"), col("__sb"), k).as("est_jaccard"))
  }

  /** EXACT content-Jaccard between group shingle-set unions — the
    * ground truth [[groupSimilarity]] estimates, at the cost the
    * sketch exists to avoid (a distinct-(group, shingle) shuffle plus
    * a shingle-key self-join). Cross-engine checkable, and the scale
    * warning is the point: at 100 TB run the sketch, keep this for
    * audits of a few groups. */
  def groupJaccardExact(df: DataFrame, groupCol: String, textCol: String,
                        n: Int = 5): DataFrame = {
    val ss = df.select(col(groupCol).as("g"),
        explode(Dedup.shingles(col(textCol), n)).as("sh"))
      .distinct()
    val sizes = ss.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val inter = ss.select(col("g").as("a"), col("sh"))
      .join(ss.select(col("g").as("b"), col("sh")), Seq("sh"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("__i"))
    inter
      .join(sizes.select(col("g").as("a"), col("n").as("__na")), Seq("a"))
      .join(sizes.select(col("g").as("b"), col("n").as("__nb")), Seq("b"))
      .select(col("a"), col("b"),
        (col("__i").cast("double") /
          (col("__na") + col("__nb") - col("__i")).cast("double"))
          .as("jaccard"))
  }
}
