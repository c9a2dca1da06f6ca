package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation over recurring-event gaps — "how long
  * until a customer orders again, accounting for the ones who haven't
  * yet". The gap between consecutive orders is an observed event; the
  * open-ended gap from each customer's LAST order to the end of the
  * observation window is a right-censored duration (dropping it would
  * bias survival low — exactly the mistake KM exists to fix). This is
  * the churn/retention readout an analyst runs on the mirrored orders
  * table (reference target: the ClickHouse warehouse,
  * docker-compose.yml:38-53).
  *
  * Estimator: S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over distinct event times
  * tᵢ, with dᵢ = events at tᵢ and nᵢ = at-risk (all durations ≥ tᵢ,
  * censored ties included — the standard convention: a unit censored AT
  * tᵢ was still at risk when the tᵢ events occurred).
  *
  * Determinism: durations are exact integer day counts (microsecond
  * floor-division); dᵢ/nᵢ are exact int64 counts; the product is
  * exp(Σ ln(1−dᵢ/nᵢ)) over a FIXED ascending-tᵢ order with an explicit
  * absorbed-at-zero guard (if any prefix term has nᵢ = dᵢ, survival is
  * exactly 0.0 from there on — never ln(0)), rounded to 6dp.
  *
  * Scale shape: one per-customer lag window (shuffle on the customer
  * key — the same partitioning every per-customer pass uses), one
  * map-side-combined groupBy to the DURATION grain, then windows over
  * the distinct-duration frame (hundreds of rows regardless of row
  * volume). No self-joins; the at-risk counts come from a cumulative
  * sum over that tiny frame, not from re-scanning the fact table per
  * duration. Output per distinct EVENT duration: duration_days, n_risk,
  * n_events, n_censored (censored exactly at that duration), survival.
  */
object Survival {

  def kaplanMeier(orders: DataFrame, idCol: String, tsCol: String): DataFrame =
    // the single-curve form IS the segmented estimator with one constant
    // segment — one implementation carries the subtle invariants (at-risk
    // tie arithmetic, the absorbed guard) instead of two drifting copies;
    // the constant-partition windows run over the tiny duration grain
    kaplanMeierBySegment(
      orders.withColumn("__seg", lit(0)), idCol, tsCol, "__seg")
      .drop("__seg")

  /** [[kaplanMeier]] per segment — one survival curve per cohort, the
    * "which customer segment churns faster" comparison. Identical
    * estimator; every window gains the segment partition, the at-risk
    * totals come from a segment-partitioned window over the tiny
    * (segment × duration) grain frame, and censoring still ends at the
    * GLOBAL observation horizon (the study window is shared — censoring
    * each segment at its own last order would bias late-quiet segments).
    *
    * Scale shape unchanged: one (segment, customer) lag window, one
    * map-side-combined groupBy to (segment, duration), windows over that
    * grain. Skewed segments are ordinary window-key skew.
    */
  def kaplanMeierBySegment(orders: DataFrame, idCol: String, tsCol: String,
                           segCol: String): DataFrame = {
    val base = orders.select(col(segCol).as("seg"), col(idCol).as("u"),
      col(tsCol).cast("timestamp").as("ts"))
    val horizon = base.agg(max(unix_micros(col("ts"))).as("h_us"))
    val byU = Window.partitionBy(col("seg"), col("u"))
      .orderBy(col("ts"), col("us"))
    val durs = base
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("nxt", lead(col("us"), 1).over(byU))
      .crossJoin(broadcast(horizon))
      .select(col("seg"),
        when(col("nxt").isNotNull, expr("(nxt - us) DIV 86400000000"))
          .otherwise(expr("(h_us - us) DIV 86400000000")).as("t"),
        when(col("nxt").isNotNull, 1L).otherwise(0L).as("ev"))
    val grain = durs.groupBy(col("seg"), col("t"))
      .agg(sum(col("ev")).as("d"), sum(lit(1L) - col("ev")).as("c"))
    val seg = Window.partitionBy(col("seg"))
    val asc = seg.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stepped = grain
      .withColumn("n_total", sum(col("d") + col("c")).over(
        seg.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("ended_upto", sum(col("d") + col("c")).over(asc))
      .withColumn("n_risk", col("n_total") - col("ended_upto") + col("d") + col("c"))
      .withColumn("term",
        when(col("d") < col("n_risk"),
          log((col("n_risk") - col("d")).cast("double") /
            col("n_risk").cast("double"))).otherwise(lit(0.0)))
      .withColumn("ln_s", sum(col("term")).over(asc))
      .withColumn("absorbed",
        max(when(col("d") >= col("n_risk"), 1L).otherwise(0L)).over(asc))
    stepped.where(col("d") > 0)
      .select(col("seg").as(segCol), col("t").as("duration_days"),
        col("n_risk"), col("d").as("n_events"), col("c").as("n_censored"),
        when(col("absorbed") === 1L, lit(0.0))
          .otherwise(round(exp(col("ln_s")), 6)).as("survival"))
      .orderBy(col(segCol), col("duration_days"))
  }
}
