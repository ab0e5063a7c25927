package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-analytics operators over an (entity, event-time, event-type)
  * stream: ordered funnels and cohort retention. Extensions beyond the
  * reference's batch surface (SURVEY §2.7) — the aggregations an
  * events table is actually interrogated with.
  */
object EventAnalytics {

  /** Ordered, optionally time-bounded funnel: for each entity, stage k
    * is reached when an event of `stages(k)` occurs strictly after the
    * entity's FIRST stage-(k-1) event (and within `within` of it, when
    * given). Returns one row per entity that reached stage 1:
    * `(keyCol, stage)` with stage in 1..stages.length.
    *
    * Scale shape: one filtered conditional-min aggregation per stage —
    * k small grouped passes joined on the entity key, never an
    * events×events self-join per stage (the naive pairing explodes on
    * active entities). Stage frames shrink monotonically, so later
    * passes get cheaper and AQE broadcasts them into the joins. */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
             typeCol: String, stages: Seq[String],
             within: Option[Column] = None): DataFrame = {
    require(stages.size >= 2, s"funnel: need >= 2 stages, got ${stages.size}")
    val first = events.where(col(typeCol) === stages.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("__ts0"))
    // fold: each stage's first-qualifying timestamp frame
    val stageFrames = stages.tail.zipWithIndex.scanLeft(first) {
      case (prev, (stage, i)) =>
        val prevTs = col(s"__ts$i")
        val bound = within match {
          case Some(w) => col(tsCol) > prevTs && col(tsCol) <= prevTs + w
          case None    => col(tsCol) > prevTs
        }
        events.where(col(typeCol) === stage)
          .join(prev.select(col(keyCol), prevTs), Seq(keyCol))
          .where(bound)
          .groupBy(col(keyCol)).agg(min(col(tsCol)).as(s"__ts${i + 1}"))
    }
    // stage reached = count of frames the entity appears in
    stageFrames.tail.zipWithIndex.foldLeft(
        stageFrames.head.select(col(keyCol), lit(1).as("stage"))) {
      case (acc, (f, i)) =>
        acc.join(f.select(col(keyCol), lit(1).as(s"__s$i")), Seq(keyCol), "left")
          .withColumn("stage",
            col("stage") + coalesce(col(s"__s$i"), lit(0)))
          .drop(s"__s$i")
    }
  }

  /** Cohort retention: entities bucketed by first-activity period
    * (`date_trunc(unit)`); each (cohort, offset) cell counts entities
    * active `offset` periods after their cohort period. Two grouped
    * passes over distinct (entity, period) — no per-period self-joins.
    *
    * `unit` is "day" or "week" (fixed-length periods, so the offset is
    * an exact datediff division); month-grain retention needs
    * months_between and is deliberately not supported here. */
  def retention(events: DataFrame, keyCol: String, tsCol: String,
                unit: String = "week"): DataFrame = {
    val periodDays = unit match {
      case "day"  => 1
      case "week" => 7
      case other  => throw new IllegalArgumentException(
        s"retention: unit must be 'day' or 'week', got '$other'")
    }
    val uw = events
      .select(col(keyCol), date_trunc(unit, col(tsCol)).as("__w"))
      .distinct()
    val cohort = uw.groupBy(col(keyCol)).agg(min(col("__w")).as("__cw"))
    uw.join(cohort, Seq(keyCol))
      .select(col("__cw").cast("date").as("cohort"),
        (datediff(col("__w"), col("__cw")) / periodDays).cast("long")
          .as("offset"))
      .groupBy(col("cohort"), col("offset"))
      .agg(count(lit(1)).as("n"))
  }
}
