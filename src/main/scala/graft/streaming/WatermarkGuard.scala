package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.catalyst.plans.logical.{EventTimeWatermark, Filter}

/** Guard against the filter-below-watermark Catalyst hazard.
  *
  * The hazard (first hit in [[DriftStream.abDrift]], see its inline note):
  * Spark's event-time clock advances from the rows that flow THROUGH the
  * `EventTimeWatermark` operator at runtime. A row filter written after
  * `withWatermark` is routinely pushed BELOW that operator by the
  * optimizer (`PushPredicateThroughNonJoin` pushes any deterministic
  * predicate that does not reference the event-time column), so rows the
  * filter drops stop advancing the clock. On a feed where only filtered
  * rows arrive for a while — heartbeats, non-arm events, low-quality
  * spam — windowed aggregations never close, event-time timeouts never
  * fire, and watermark-evicted state grows without bound. Nothing errors;
  * the stream just silently stops making progress. That failure shape is
  * why this guard exists as BOTH a lint and a fix:
  *
  *  - [[filtersBelowWatermark]] / [[assertClockSafe]] lint a plan
  *    (OPTIMIZED, not analyzed — the hazard is created by optimization,
  *    the user-written order is innocent);
  *  - [[clockSafeFilter]] applies a row filter that stays ABOVE the
  *    watermark at runtime.
  *
  * WatermarkGuardSpec runs the lint over every streaming entry point in
  * this package and pins that the lint actually catches a planted
  * offender.
  */
object WatermarkGuard {

  /** The (optimized-plan) filters sitting below an `EventTimeWatermark`
    * node of `df` — each one a predicate whose dropped rows cannot advance
    * the event-time clock. Empty means clock-safe. Filters pushed all the
    * way into a data source are invisible here (pre-start streaming
    * relations don't accept pushdown, so entry-point lints are complete).
    */
  def filtersBelowWatermark(df: Dataset[_]): Seq[String] = {
    // the optimizer is invoked directly on the ANALYZED plan: a streaming
    // frame refuses the batch `optimizedPlan` accessor (checkForBatch),
    // but the predicate-pushdown rules that create the hazard are the
    // same ones the micro-batch planner re-runs per batch
    val optimized = df.sparkSession.sessionState.optimizer
      .execute(df.queryExecution.analyzed)
    val out = Seq.newBuilder[String]
    optimized.foreach {
      case w: EventTimeWatermark =>
        w.child.foreach {
          case f: Filter => out += f.condition.sql
          case _ => ()
        }
      case _ => ()
    }
    out.result()
  }

  /** Fail loudly when [[filtersBelowWatermark]] finds an offender. */
  def assertClockSafe(df: Dataset[_]): Unit = {
    val bad = filtersBelowWatermark(df)
    require(bad.isEmpty,
      "filter(s) below EventTimeWatermark would stall the event-time " +
        s"clock when they drop every row of a batch: ${bad.mkString("; ")} " +
        "— keep row filters above the watermark (WatermarkGuard.clockSafeFilter)")
  }

  /** `df.where(pred)` pinned ABOVE any upstream watermark: the predicate
    * is wrapped in [[graft.expressions.ClockSafeBarrier]], an identity
    * that reports itself non-deterministic — Catalyst refuses to push or
    * fold non-deterministic predicates, so every row, kept or dropped,
    * still flows through (and advances) the watermark operator. Exactly
    * equivalent to `df.where(pred)` row-wise; see the barrier's scaladoc
    * for why the simpler tricks (`monotonically_increasing_id`, `rand()`
    * terms) don't survive streaming checks / the optimizer.
    */
  def clockSafeFilter(df: DataFrame, pred: Column): DataFrame =
    df.where(org.apache.spark.sql.graft.bridge.column(
      graft.expressions.ClockSafeBarrier(
        org.apache.spark.sql.graft.bridge.expression(pred))))
}
