package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.StatTests
import graft.streaming.DriftStream

/** The drift monitor's contract: streamed per-window t statistics equal
  * the batch `StatTests.abTTest` over the same rows grouped the same way —
  * the moments are the identical int64 sums, the scalar tree is shared.
  */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._
  import DriftStreamSpec.Ev

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val batch1 = Seq(
    // window [00:00, 01:00): A = {10,12,14,16}, B = {20,24,28}
    Ev(ts("2024-01-01 00:00:10"), "a", 10L),
    Ev(ts("2024-01-01 00:10:00"), "a", 12L),
    Ev(ts("2024-01-01 00:20:00"), "a", 14L),
    Ev(ts("2024-01-01 00:30:00"), "a", 16L),
    Ev(ts("2024-01-01 00:05:00"), "b", 20L),
    Ev(ts("2024-01-01 00:15:00"), "b", 24L),
    Ev(ts("2024-01-01 00:25:00"), "b", 28L),
    Ev(ts("2024-01-01 00:26:00"), "x", 999L)) // neither arm — ignored
  private val batch2 = Seq(
    // window [01:00, 02:00): shifted distributions
    Ev(ts("2024-01-01 01:00:10"), "a", 30L),
    Ev(ts("2024-01-01 01:10:00"), "a", 34L),
    Ev(ts("2024-01-01 01:20:00"), "a", 38L),
    Ev(ts("2024-01-01 01:05:00"), "b", 31L),
    Ev(ts("2024-01-01 01:15:00"), "b", 33L),
    // window [02:00, 03:00): only one B row → must never emit
    Ev(ts("2024-01-01 02:01:00"), "a", 5L),
    Ev(ts("2024-01-01 02:02:00"), "a", 7L),
    Ev(ts("2024-01-01 02:03:00"), "b", 6L),
    // watermark pusher far ahead so earlier windows close
    Ev(ts("2024-01-01 09:00:00"), "x", 0L))

  test("streamed window t-stats equal the batch computation; short windows never emit") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = DriftStream.abDrift(input.toDF(), "ts", lit(0L),
      col("arm") === "a", col("arm") === "b", col("y"),
      windowDur = "1 hour", watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("drift_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("drift_out")
        .select("win_start", "na", "nb", "mean_a", "mean_b",
          "welch_t", "welch_df", "student_t", "student_df")
        .as[(java.sql.Timestamp, Long, Long, Double, Double, Double, Double, Double, Long)]
        .collect().sortBy(_._1.getTime).toSeq

      // the [02:00, 03:00) window (nb = 1) must have been dropped
      assert(streamed.map(_._1).forall(_.getTime < ts("2024-01-01 02:00:00").getTime))
      assert(streamed.length == 2, s"got $streamed")

      // batch anchor: same rows, bucket = the hour → identical statistics
      val all = (batch1 ++ batch2).toDF()
      val batch = StatTests.abTTest(all,
          date_trunc("hour", col("ts")).cast("timestamp"),
          col("arm") === "a", col("arm") === "b", col("y"))
        .as[(java.sql.Timestamp, Long, Long, Double, Double, Double, Double, Double, Long)]
        .collect().sortBy(_._1.getTime).toSeq
        .filter(_._1.getTime < ts("2024-01-01 02:00:00").getTime)
      assert(streamed == batch, s"\nstream: $streamed\nbatch:  $batch")

      // hand anchor for the first window (same fixture as StatTestsSpec)
      val w0 = streamed.head
      assert(w0._2 == 4 && w0._3 == 3)
      val se2 = 20.0 / 3 / 4 + 16.0 / 3
      assert(math.abs(w0._6 - (13.0 - 24.0) / math.sqrt(se2)) < 1e-5)
    } finally q.stop()
  }

  test("state is bounded: six longs per (window, bucket), watermark-evicted") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = DriftStream.abDrift(input.toDF(), "ts", lit(0L),
        col("arm") === "a", col("arm") === "b", col("y"),
        windowDur = "1 hour", watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("drift_state")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val progress = q.lastProgress
      val state = progress.stateOperators
      assert(state.nonEmpty)
      // after the watermark passed 02:00+, closed windows must be evicted:
      // remaining keys are the still-open tail windows, not all four
      assert(state.map(_.numRowsTotal).sum <= 3,
        s"state rows not evicted: ${state.map(_.numRowsTotal).mkString(",")}")
    } finally q.stop()
  }
}

object DriftStreamSpec {
  case class Ev(ts: java.sql.Timestamp, arm: String, y: Long)
}
