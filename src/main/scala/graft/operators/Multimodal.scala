package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) travels through the
  * pipeline as an opaque `binary` payload plus a typed metadata struct, and
  * per-item "decode / feature extraction" runs as a columnar transform over
  * that payload.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): `fakeDecodeStats` derives deterministic pseudo-features from
  * the payload bytes. Everything around it — schema, batch shape,
  * partitioning, group-level aggregation — is the real Spark plumbing a
  * decode UDF would plug into: swap `fakeDecodeStats` for a
  * `mapInPandas`/`mapPartitions` codec and nothing else changes.
  */
object Multimodal {

  /** Attach a synthetic binary payload + typed metadata to each document —
    * stands in for reading (path, bytes, metadata) from a lake of media
    * files. Deterministic: payload = utf8 bytes of the text, metadata
    * derived from the id.
    */
  def withMediaColumns(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        (lit(64) + pmod(col(idCol), lit(448)).cast("int")).as("width"),
        (lit(64) + pmod(col(idCol) * 7, lit(448)).cast("int")).as("height"),
        concat(lit("img/"), pmod(col(idCol), lit(3)).cast("string")).as("media_type"))
        .as("meta"))

  /** STUB decode: deterministic pseudo-features of the payload (length and a
    * byte checksum stand in for decoded pixel stats). Replace with a real
    * codec via mapInPandas/mapPartitions at deployment.
    */
  def fakeDecodeStats(media: DataFrame): DataFrame =
    media.withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("pixels", (col("meta.width") * col("meta.height")).cast("long"))
      .withColumn("aspect_pct",
        (col("meta.width") * 100L).cast("long") / col("meta.height").cast("long"))

  /** Per-media-type rollup of decoded stats — the typical post-decode
    * aggregation (one map-side-combined shuffle on the tiny type key).
    */
  def mediaTypeStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    fakeDecodeStats(withMediaColumns(docs, idCol, textCol))
      .groupBy(col("meta.media_type").as("media_type"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("pixels")).as("total_pixels"),
        min(col("meta.width")).as("min_width"),
        max(col("meta.height")).as("max_height"))
}
