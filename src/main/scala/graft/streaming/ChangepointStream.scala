package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.{MaterializedAgg, Profiler}
import graft.streaming.CdcStream.Change

/** Live CUSUM changepoint monitor over the event stream — the streaming
  * twin of `Profiler.changepointCusum`, completing the live-guard family
  * (DriftStream's t-test, SrmStream's ratio guard, MsprtStream's
  * always-valid p): "which hour did this feed's level SHIFT", answered
  * while the feed runs instead of in tomorrow's batch scan.
  *
  * Unlike the windowed guards, the CUSUM statistic is a whole-history
  * readout (the grand mean, std, and running sum span every hour seen so
  * far), so the stream maintains the HOURLY GRAIN, not windows: a
  * [[MaterializedAgg]] at (group, hour) holds the exact integer/decimal
  * moments (count, decimal(18,2) value sum) — additive, replay-safe via
  * its batch high-water mark, generation-compacted — and each readout
  * runs the SAME scalar tail as the batch operator
  * (`Profiler.changepointFromHourly`, the `srmColumns` idiom) over that
  * grain. Streamed and batch answers agree EXACTLY by construction:
  * maintained (count, sum) moments equal the batch aggregation of the
  * same rows (exact addition is associative), and everything downstream
  * is shared code. State is hours×groups rows — calendar-bounded, never
  * row-scale.
  */
object ChangepointStream {

  /** Wire the monitor onto a change feed: per microbatch, fold the
    * batch's rows into the maintained hourly grain. `prepare` maps the
    * raw change rows to (group, ts, value) — it sees the batch AFTER
    * newest-per-key collapse, non-deleted rows only (deletes carry no
    * event semantics on an append-shaped feed). Call [[readout]] at any
    * time for the current changepoint per group.
    */
  def monitor(changes: Dataset[Change], checkpointDir: String,
              agg: MaterializedAgg,
              prepare: DataFrame => DataFrame,
              groupCol: String = "g", tsCol: String = "ts",
              valueCol: String = "v",
              deleteOp: String = "delete",
              trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Update())
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Change], batchId: Long) =>
        if (!batch.isEmpty) {
          val rows = prepare(
            graft.operators.CdcOps.latestSnapshot(batch.toDF(),
                Seq("key"), "version")
              .withColumn("is_deleted", col("op") === deleteOp)
              .where(!col("is_deleted")))
          val grain = rows.select(col(groupCol).as("g"),
            date_trunc("hour", col(tsCol)).as("h"),
            col(valueCol).cast("decimal(18,2)").as("sv"))
          // insert-only fold: the maintained (g, h) moments are additive
          // and the live-before side is empty (events never retract);
          // refreshBatch's replay mark absorbs at-least-once redelivery
          val dec = grain.withColumn("__del", lit(false))
          agg.refreshBatch(batchId, dec.limit(0), dec, Seq("g", "h"),
            deletedCol = "__del")
          ()
        }
      }
      .start()

  /** The current changepoint per group — bit-equal to running the batch
    * `Profiler.changepointCusum` over every row fed so far.
    */
  def readout(agg: MaterializedAgg, groupOut: String): DataFrame =
    Profiler.changepointFromHourly(
      agg.read().select(col("g"), col("h"), col("n_rows").as("hn"),
        col("sum_sv").as("sv")),
      groupOut)
}
