package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference-pair (RLHF / DPO) data preparation — the reward-model /
  * direct-preference half of post-training data hygiene: each row is
  * (prompt, chosen, rejected) and the published data cards (HH-RLHF,
  * UltraFeedback, the DPO paper's appendix) describe the same three
  * steps every time: structural validation, pair-grain dedup, and the
  * length-bias audit (preference sets notoriously encode "longer =
  * better"; a trainer that doesn't measure that bias ships it).
  *
  * Validation and rendering are map-only (codegen'd projections — no
  * exchange at all); dedup is one hash exchange on the normalized
  * pair key; the bias audit is one partial-aggregated groupBy on the
  * bounded source key. Nothing here scales worse than the scan.
  *
  * No counterpart in the reference; extension surface per the
  * training-data-pipeline mandate. Sibling of [[Sft]] (conversation
  * grain) — preference pairs are flat rows, so no per-group arrays
  * are needed anywhere.
  */
object Preference {

  /** Structural validation, map-only: appends (ok, reason) with the
    * FIRST failing rule in a fixed order —
    *  1. `empty_prompt`   — null/empty prompt;
    *  2. `empty_side`     — null/empty chosen or rejected completion;
    *  3. `tie`            — chosen and rejected identical after
    *                        whitespace-collapse + case-fold (a pair
    *                        that expresses no preference trains
    *                        nothing and destabilizes the DPO loss). */
  def validatePairs(pairs: DataFrame, promptCol: String = "prompt",
                    chosenCol: String = "chosen",
                    rejectedCol: String = "rejected"): DataFrame = {
    def empty(c: Column) = c.isNull || length(c) === 0
    val reason =
      when(empty(col(promptCol)), lit("empty_prompt"))
        .when(empty(col(chosenCol)) || empty(col(rejectedCol)),
          lit("empty_side"))
        .when(norm(col(chosenCol)) === norm(col(rejectedCol)), lit("tie"))
    pairs.withColumn("ok", reason.isNull).withColumn("reason", reason)
  }

  private def norm(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Pair-grain exact dedup, keep-first: pairs whose normalized
    * (prompt, chosen, rejected) triples match collapse to the lowest
    * id. One hash exchange on the md5 key ([[Dedup.exactDedup]]'s
    * plan); returns surviving rows, columns untouched. */
  def dedupPairs(pairs: DataFrame, idCol: String = "pair_id",
                 promptCol: String = "prompt", chosenCol: String = "chosen",
                 rejectedCol: String = "rejected"): DataFrame = {
    val key = md5(concat(norm(col(promptCol)), lit("\u001f"),
      norm(col(chosenCol)), lit("\u001f"), norm(col(rejectedCol))))
    val w = Window.partitionBy(key).orderBy(col(idCol).asc)
    pairs.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Length-bias audit, one row per group: n_pairs, summed chosen /
    * rejected char lengths, the mean gap (mean chosen len − mean
    * rejected len), and the fraction of pairs where chosen is longer —
    * the two numbers the published bias analyses report. Integer
    * length sums are exact (no float accumulation), so the oracle
    * replays the doubles bit-for-bit from the same operands. */
  def lengthBias(pairs: DataFrame, groupCol: String = "source",
                 chosenCol: String = "chosen",
                 rejectedCol: String = "rejected"): DataFrame =
    pairs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_pairs"),
        sum(length(col(chosenCol)).cast("long")).as("chosen_len_sum"),
        sum(length(col(rejectedCol)).cast("long")).as("rejected_len_sum"),
        sum(when(length(col(chosenCol)) > length(col(rejectedCol)), 1L)
          .otherwise(0L)).as("chosen_longer"))
      .select(col(groupCol), col("n_pairs"),
        col("chosen_len_sum"), col("rejected_len_sum"),
        ((col("chosen_len_sum") - col("rejected_len_sum")).cast("double")
          / col("n_pairs")).as("mean_len_gap"),
        (col("chosen_longer").cast("double") / col("n_pairs"))
          .as("chosen_longer_frac"))

  /** Render each pair into the two training texts a DPO trainer
    * consumes — prompt+chosen and prompt+rejected under [[Sft]]'s chat
    * template. Map-only. */
  def renderPairs(pairs: DataFrame, promptCol: String = "prompt",
                  chosenCol: String = "chosen",
                  rejectedCol: String = "rejected"): DataFrame = {
    def rendered(completion: Column) = concat(
      lit(Sft.RoleOpen + "user" + Sft.RoleClose), col(promptCol),
      lit(Sft.TurnEnd),
      lit(Sft.RoleOpen + "assistant" + Sft.RoleClose), completion,
      lit(Sft.TurnEnd))
    pairs.withColumn("text_chosen", rendered(col(chosenCol)))
      .withColumn("text_rejected", rendered(col(rejectedCol)))
  }
}
