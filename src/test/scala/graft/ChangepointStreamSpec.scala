package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{MaterializedAgg, Profiler}
import graft.streaming.{CdcStream, ChangepointStream}
import graft.streaming.CdcStream.Change

/** The live changepoint monitor's contract: a stream fed hour-batches
  * reads out BIT-EQUAL to the batch `Profiler.changepointCusum` over the
  * same rows (shared scalar tail + exact additive hourly moments), and a
  * replayed batch folds exactly once.
  */
class ChangepointStreamSpec extends SparkSpec {
  import spark.implicits._

  // a planted level shift on one feed: type "a" runs hours 0..5 at mean
  // ~10 then jumps to ~30; type "b" stays flat. Values vary within the
  // hour so the decimal means exercise real division.
  private val rows: Seq[(String, Long, Double)] =
    (0 until 6).flatMap { h =>
      Seq(("a", h.toLong, 9.5 + h % 2), ("a", h.toLong, 10.5),
        ("b", h.toLong, 5.0))
    } ++ (6 until 12).flatMap { h =>
      Seq(("a", h.toLong, 29.5 + h % 3), ("a", h.toLong, 30.5),
        ("b", h.toLong, 5.0))
    }

  private def ts(h: Long, i: Int) =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(h * 3600L + i))

  private def batchFrame(sub: Seq[(String, Long, Double)]): DataFrame =
    sub.zipWithIndex.map { case ((g, h, v), i) => (g, ts(h, i % 60), v) }
      .toDF("event_type", "ts", "value")

  private val prep: DataFrame => DataFrame = df => df
    .select(col("payload").substr(lit(1), lit(1)).as("g"),
      col("ts"),
      expr("CAST(substring(payload, 3) AS DOUBLE)").as("v"))

  test("streamed readout equals the batch changepoint bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_cpstream")
    val agg = MaterializedAgg.create(spark,
      Seq.empty[(String, java.sql.Timestamp, java.math.BigDecimal)]
        .toDF("g", "h", "sv")
        .select(col("g"), col("h"), col("sv").cast("decimal(18,2)").as("sv")),
      Seq("g", "h"), Seq("sv"), base.resolve("agg").toString)

    val input = MemoryStream[Change]
    val q = ChangepointStream.monitor(input.toDS(),
      base.resolve("ckpt").toString, agg, prep,
      groupCol = "g", tsCol = "ts", valueCol = "v",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      // feed in two batches split mid-series
      rows.grouped(30).zipWithIndex.foreach { case (chunk, ci) =>
        input.addData(chunk.zipWithIndex.map { case ((g, h, v), i) =>
          Change((ci * 1000 + i).toLong, (ci * 1000 + i).toLong, "insert",
            ts(h, i % 60), s"$g $v")
        }: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = ChangepointStream.readout(agg, "event_type")
      .as[(String, Long, java.sql.Timestamp, Double)].collect()
      .sortBy(_._1).toSeq
    val batch = Profiler.changepointCusum(batchFrame(rows), "event_type",
        "ts", "value")
      .as[(String, Long, java.sql.Timestamp, Double)].collect()
      .sortBy(_._1).toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"\nstream: $streamed\nbatch:  $batch")
    // the planted shift: feed "a" peaks at the last pre-shift hour
    val aRow = streamed.find(_._1 == "a").get
    assert(aRow._3.toInstant.getEpochSecond == 5L * 3600L)
    // flat feed "b" has zero variance → filtered by the shared tail
    assert(!streamed.exists(_._1 == "b"))
  }

  test("replayed batch ids fold exactly once; restart-safe reopen") {
    val base = Files.createTempDirectory("graft_cpfold")
    val dec = batchFrame(rows.take(30))
      .select(col("event_type").as("g"), date_trunc("hour", col("ts")).as("h"),
        col("value").cast("decimal(18,2)").as("sv"))
      .withColumn("__del", lit(false))
    val agg = MaterializedAgg.create(spark, dec.limit(0).drop("__del"),
      Seq("g", "h"), Seq("sv"), base.resolve("agg").toString)
    assert(agg.refreshBatch(1L, dec.limit(0), dec, Seq("g", "h"), "__del"))
    val once = agg.read().collect().toSet
    assert(!agg.refreshBatch(1L, dec.limit(0), dec, Seq("g", "h"), "__del"))
    assert(agg.read().collect().toSet == once)
    val reopened = MaterializedAgg.open(spark,
      base.resolve("agg").toString, Seq("g", "h"), Seq("sv"))
    assert(reopened.lastBatch == 1 && reopened.read().collect().toSet == once)
  }
}
