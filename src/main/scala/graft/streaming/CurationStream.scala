package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming training-data curation: the document-side twin of the CDC
  * capture loop. A landing stream of raw documents is quality-gated and
  * exact-deduplicated on a content fingerprint, continuously — the batch
  * curation ops (`docs_quality_filter`, `dedup_exact`) re-expressed as one
  * Structured Streaming stage, so a corpus fed by continuous syncs stays
  * curated without re-scanning the lake.
  *
  * Scale: the quality gate is stateless and columnar. Dedup state is
  * bounded by the watermark — a duplicate arriving within `dupWindow` of
  * the first copy is dropped and state older than the watermark is evicted
  * (`dropDuplicatesWithinWatermark`), so state size tracks the ingest
  * window, never the corpus. Cross-window duplicates are the lake-side
  * exact dedup's job: the stream handles the torrent, the batch op the
  * archive.
  */
object CurationStream {

  /** Quality-gate then first-seen content dedup. Emits the surviving rows
    * with their `fp` fingerprint column (the dedup key) attached.
    *
    * The quality gate goes through [[WatermarkGuard.clockSafeFilter]]: a
    * plain `where` here is pushed below the watermark by Catalyst, so a
    * garbage-only stretch of the feed (exactly when a curation stream
    * earns its keep) would stop advancing the event-time clock and the
    * dedup state would never evict.
    */
  def curate(docs: DataFrame, textCol: String, tsCol: String,
             minQuality: Double, dupWindow: String = "10 minutes"): DataFrame =
    WatermarkGuard.clockSafeFilter(
        docs.withWatermark(tsCol, dupWindow),
        TextFunctions.qualityScore(col(textCol)) >= minQuality)
      .withColumn("fp", TextFunctions.fingerprint(col(textCol)))
      .dropDuplicatesWithinWatermark("fp")
}
