package graft.streaming

import graft.operators.StatTests
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Live A/B drift detection over the event stream: the streaming twin of
  * `StatTests.abTTest` — the monitor a CDC mirror runs to catch "the value
  * distribution of arm A just diverged from arm B" while it happens,
  * rather than in tomorrow's batch scan (ClickHouse users run
  * `welchTTest` over a materialized view for the same job).
  *
  * Architecture: the six exact int64 moment aggregates
  * (`StatTests.abMoments`) are plain partial-aggregable sums, so they run
  * unchanged inside a watermarked event-time window aggregation — state
  * per (window, bucket) is six longs, merged map-side, evicted by the
  * watermark. The t statistics are evaluated from the same fixed scalar
  * tree as the batch path (`tStatsFromMoments`), so streamed and batch
  * answers agree EXACTLY by construction — DriftStreamSpec pins the
  * equality. Nothing row-scale is ever held in state.
  */
object DriftStream {

  /** Per-(event-time window, bucket) Welch/Student t statistics between
    * `condA` and `condB` rows of a streaming frame. `cents` must be an
    * integral-valued measurement column (same contract as the batch op).
    * Append mode emits each window once its watermark closes; windows
    * where a side has < 2 samples or variance vanishes never emit
    * (undefined statistic — same drop rule as batch).
    */
  def abDrift(events: DataFrame, tsCol: String, bucket: Column,
              condA: Column, condB: Column, cents: Column,
              windowDur: String, watermarkDelay: String): DataFrame = {
    // Deliberately NO pre-aggregation row filter on (a OR b): Catalyst
    // pushes such a filter BELOW the EventTimeWatermark node, so events
    // matching neither arm would stop advancing the stream's clock and
    // windows would never close on arm-quiet feeds (heartbeat events must
    // keep time moving). Non-arm rows instead contribute zeros to every
    // moment — same shuffle shape, and arm-less windows drop at the
    // undefined-statistic gate.
    val moments = events
      .withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol).as("__ts"), bucket.as("bucket"),
        condA.as("a"), condB.as("b"), cents.cast("long").as("y"))
      .groupBy(window(col("__ts"), windowDur).as("win"), col("bucket"))
      .agg(StatTests.abMoments.head, StatTests.abMoments.tail: _*)
    StatTests.tStatsFromMoments(moments)
      .select(col("win.start").as("win_start"), col("bucket"),
        col("na"), col("nb"), col("mean_a"), col("mean_b"),
        col("welch_t"), col("welch_df"), col("student_t"), col("student_df"))
  }
}
