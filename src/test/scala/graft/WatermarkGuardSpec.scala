package graft

import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{CdcStream, CurationStream, DriftStream, FunnelStream, SrmStream, WatermarkGuard}

/** The filter-below-watermark Catalyst hazard, pinned as a lint over every
  * streaming entry point (see [[graft.streaming.WatermarkGuard]]'s
  * scaladoc for the failure shape): a row filter pushed below
  * `EventTimeWatermark` stops dropped rows from advancing the event-time
  * clock — windows never close, timeouts never fire, state never evicts.
  * The spec also proves the lint has TEETH (a planted offender is caught)
  * and that the clock-safe filter both fixes the plant and preserves
  * row-wise semantics.
  */
class WatermarkGuardSpec extends SparkSpec {
  import spark.implicits._

  private def eventsStream = {
    implicit val sqlCtx = spark.sqlContext
    MemoryStream[(java.sql.Timestamp, String, String, Long)].toDF()
      .toDF("ts", "bucket", "arm", "cents")
  }

  test("every watermarked streaming entry point is clock-safe") {
    // DriftStream: the original hazard site (deliberately unfiltered)
    WatermarkGuard.assertClockSafe(DriftStream.abDrift(
      eventsStream, "ts", col("bucket"), col("arm") === "a",
      col("arm") === "b", col("cents"), "10 minutes", "5 minutes"))

    // CurationStream: quality gate rides the clock-safe filter
    implicit val sqlCtx = spark.sqlContext
    val docs = MemoryStream[(java.sql.Timestamp, String)].toDF()
      .toDF("ts", "text")
    WatermarkGuard.assertClockSafe(
      CurationStream.curate(docs, "text", "ts", minQuality = 0.5))

    // CdcStream.normalize: watermark + dropDuplicates, no row filter
    val changes = MemoryStream[(java.sql.Timestamp, Long, Long)].toDF()
      .toDF("ts", "key", "version")
    WatermarkGuard.assertClockSafe(
      CdcStream.normalize(changes, "ts", "key", "version"))

    // SrmStream: watermark + chained dedup/aggregate, no row filter
    WatermarkGuard.assertClockSafe(SrmStream.srm(
      eventsStream, "ts", col("bucket"), col("cents"),
      col("arm") === "a", "10 minutes", "5 minutes"))

    // FunnelStream: typed watermark + stateful levels
    val funnel = MemoryStream[FunnelStream.FunnelEvent].toDS()
    WatermarkGuard.assertClockSafe(FunnelStream.levels(
      FunnelStream.withEventTimeWatermark(funnel, Duration.ofMinutes(5)),
      Seq("signup", "click"), maxGapMicros = 3600000000L,
      stateTtl = Some(Duration.ofHours(1))))
  }

  test("the lint catches a planted offender; clockSafeFilter repairs it") {
    // the hazard in one line: a plain post-watermark filter on a
    // non-event-time column — Catalyst pushes it below the watermark
    val planted = eventsStream
      .withWatermark("ts", "5 minutes")
      .where(col("arm") === "a" || col("arm") === "b")
      .groupBy(window(col("ts"), "10 minutes"), col("bucket"))
      .count()
    val offenders = WatermarkGuard.filtersBelowWatermark(planted)
    assert(offenders.nonEmpty, "lint missed the pushed-down filter")
    assert(intercept[IllegalArgumentException](
      WatermarkGuard.assertClockSafe(planted))
      .getMessage.contains("EventTimeWatermark"))

    // same predicate through the guard: stays above the watermark
    val safe = WatermarkGuard.clockSafeFilter(
        eventsStream.withWatermark("ts", "5 minutes"),
        col("arm") === "a" || col("arm") === "b")
      .groupBy(window(col("ts"), "10 minutes"), col("bucket"))
      .count()
    assert(WatermarkGuard.filtersBelowWatermark(safe).isEmpty)
  }

  test("clockSafeFilter is row-wise identical to a plain where") {
    val df = Seq(("a", 1L), ("b", 2L), ("c", 3L), (null, 4L))
      .toDF("arm", "v")
    val plain = df.where(col("arm") === "a" || col("arm") === "b")
      .select("v").as[Long].collect().sorted.toSeq
    val safe = WatermarkGuard.clockSafeFilter(df,
        col("arm") === "a" || col("arm") === "b")
      .select("v").as[Long].collect().sorted.toSeq
    assert(plain == safe && safe == Seq(1L, 2L))
  }
}
