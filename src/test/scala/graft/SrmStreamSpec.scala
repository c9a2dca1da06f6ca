package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.StatTests
import graft.streaming.SrmStream

/** The live SRM guard's contract: streamed per-window unit-split readouts
  * equal the batch `StatTests.srmCheck` over the same rows grouped the
  * same way — unit dedup first (multi-event units count once), then the
  * shared z/p/alarm tree.
  */
class SrmStreamSpec extends SparkSpec {
  import spark.implicits._
  import SrmStreamSpec.Ev

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val batch1 = Seq(
    // window [00:00, 01:00): units a = {2, 4, 6} (unit 2 emits THREE
    // events — must count once), b = {1} → z = 1.0
    Ev(ts("2024-01-01 00:00:10"), 2L),
    Ev(ts("2024-01-01 00:10:00"), 2L),
    Ev(ts("2024-01-01 00:20:00"), 2L),
    Ev(ts("2024-01-01 00:30:00"), 4L),
    Ev(ts("2024-01-01 00:40:00"), 6L),
    Ev(ts("2024-01-01 00:05:00"), 1L))
  private val batch2 = Seq(
    // window [01:00, 02:00): a badly broken split — 16 even units, 0 odd
    // → z = 4.0, p ≈ 6.3e-5 < 0.001 (z = 3 would sit at p = .0027,
    // ABOVE the conventional alarm line — the guard is deliberately
    // conservative)
    (1 to 16).map(i =>
      Ev(ts(f"2024-01-01 01:${i}%02d:00"), 2L * i + 8L)) :+
    // watermark pusher far ahead so earlier windows close
    Ev(ts("2024-01-01 09:00:00"), 99L): _*)

  test("streamed SRM equals batch; multi-event units count once; alarm fires") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = SrmStream.srm(input.toDF(), "ts", lit(0L), col("u"),
      col("u") % 2 === 0, windowDur = "1 hour",
      watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("srm_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("srm_out")
        .select("win_start", "n_a", "n_b", "z", "p", "srm_alarm")
        .as[(java.sql.Timestamp, Long, Long, Double, Double, Boolean)]
        .collect().sortBy(_._1.getTime).toSeq
      assert(streamed.length == 2, s"got $streamed")
      assert(streamed(0)._2 == 3L && streamed(0)._3 == 1L &&
        streamed(0)._4 == 1.0 && !streamed(0)._6)
      assert(streamed(1)._2 == 16L && streamed(1)._3 == 0L &&
        streamed(1)._4 == 4.0 && streamed(1)._6, s"got ${streamed(1)}")

      // batch anchor: same rows, bucket = the hour → identical readouts
      val closed = (batch1 ++ batch2)
        .filter(_.ts.getTime < ts("2024-01-01 02:00:00").getTime)
      val batch = StatTests.srmCheck(closed.toDF(),
          date_trunc("hour", col("ts")).cast("timestamp"),
          col("u"), col("u") % 2 === 0)
        .as[(java.sql.Timestamp, Long, Long, Double, Double, Boolean)]
        .collect().sortBy(_._1.getTime).toSeq
      assert(streamed.map(r => (r._1, r._2, r._3, r._4, r._5, r._6)) ==
        batch, s"\nstream: $streamed\nbatch:  $batch")

      // BOTH stateful operators (unit dedup + windowed counts) must evict
      // closed windows — the dedup state holds one row per live
      // (window, unit), so an unevicted run would carry all 21 units here
      val state = q.lastProgress.stateOperators
      assert(state.length >= 2, s"expected 2 stateful ops, got ${state.length}")
      assert(state.map(_.numRowsTotal).sum <= 6,
        s"state rows not evicted: ${state.map(_.numRowsTotal).mkString(",")}")
    } finally q.stop()
  }
}

object SrmStreamSpec {
  case class Ev(ts: java.sql.Timestamp, u: Long)
}
