package graft.streaming

import graft.operators.StatTests
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Live sample-ratio-mismatch guard over the event stream — the streaming
  * twin of `StatTests.srmCheck`, and the alarm an experimentation
  * platform wants WHILE the experiment runs (a broken assignment caught
  * tomorrow has already burned the traffic): per event-time window, does
  * the realized unit split match 50/50?
  *
  * Architecture: two chained stateful operators, both watermark-evicted.
  * First `dropDuplicates` keyed on (window, bucket, unit, arm) reduces
  * the stream to the UNIT grain — event-count imbalance is expected, unit
  * imbalance is the bug, exactly the batch contract — with state one row
  * per live (window, unit), never row-scale. Then a windowed count
  * aggregation folds the two exact int64 arm counts, and the z/p/alarm
  * scalar tree is the SAME expression the batch path evaluates
  * (`StatTests.srmColumns`), so streamed and batch answers agree exactly
  * — SrmStreamSpec pins the equality.
  */
object SrmStream {

  /** Per-(event-time window, bucket) SRM readout of a streaming frame.
    * Append mode emits each window once its watermark closes.
    */
  def srm(events: DataFrame, tsCol: String, bucket: Column, unit: Column,
          condA: Column, windowDur: String,
          watermarkDelay: String): DataFrame = {
    val units = events
      .withWatermark(tsCol, watermarkDelay)
      .select(window(col(tsCol), windowDur).as("win"),
        bucket.as("bucket"), unit.as("u"), condA.as("a"))
      .dropDuplicates("win", "bucket", "u", "a")
    val counts = units
      .groupBy(col("win"), col("bucket"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("nb"))
    StatTests.srmColumns(counts)
      .select(col("win.start").as("win_start"), col("bucket"),
        col("na").as("n_a"), col("nb").as("n_b"),
        col("z"), col("p"), col("srm_alarm"))
  }
}
