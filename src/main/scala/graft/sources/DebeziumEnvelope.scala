package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Adapter from the public Debezium change-event envelope (the de-facto
  * CDC interchange format PeerDB's Postgres source is an alternative to —
  * reference quickstart feeds PG WAL straight to PeerDB, but every
  * Kafka-transported CDC stack ships this JSON shape) into graft's
  * normalized change-log contract: one row per change with key + payload
  * columns, a monotone `_version`, an `_is_deleted` flag and the event
  * timestamp — exactly what [[graft.operators.CdcOps.latestSnapshot]],
  * [[graft.streaming.CdcStream.normalize]] and the mirror merge consume.
  *
  * Handled envelope variants (all public Debezium behavior):
  *  - with or without the `payload` wrapper (`converter.schemas.enable`
  *    true/false) — detected per row, mixed feeds are fine;
  *  - `op` ∈ c / u / r (create, update, snapshot read → upsert from
  *    `after`) and d (delete → key + last image from `before`,
  *    `_is_deleted` = true);
  *  - `_version` = `source.lsn` when present (Postgres WAL position — the
  *    true total order), else the event `ts_ms` promoted to microsecond
  *    scale. Which source won is surfaced per row as `_version_scale`
  *    (`"lsn"` / `"ts_ms"`): the two scales are NOT comparable (a 2024
  *    epoch-ms promotes to ~1.7e15, far above any real LSN), so a feed
  *    that mixes them has no usable total order — count the scales with
  *    [[scaleCounts]] on every batch, or gate hard with
  *    [[requireUniformScale]];
  *  - an event carrying NEITHER `source.lsn` nor `ts_ms` has no position
  *    in the change order at all: it dead-letters (a null `_version` would
  *    otherwise sort nowhere and silently lose the change in the collapse);
  *  - Kafka compaction tombstones (null value) are dropped silently: they
  *    carry no data and follow a `d` event that already flagged the key;
  *  - anything else unparseable lands in the DEAD-LETTER frame untouched,
  *    never silently dropped — count it, alert on it, replay it.
  *
  * Everything is columnar `from_json` + field access: zero shuffles, zero
  * UDFs, streaming-safe (use the same call on a `readStream` frame).
  */
object DebeziumEnvelope {

  /** Normalized changes + the dead-letter frame (original rows). */
  final case class Parsed(changes: DataFrame, deadLetter: DataFrame)

  private val sourceSchema = StructType(Seq(
    StructField("lsn", LongType),
    StructField("ts_ms", LongType),
    StructField("db", StringType),
    StructField("schema", StringType),
    StructField("table", StringType),
    StructField("snapshot", StringType)))

  private def envelopeSchema(row: StructType): StructType = {
    val core = StructType(Seq(
      StructField("before", row),
      StructField("after", row),
      StructField("source", sourceSchema),
      StructField("op", StringType),
      StructField("ts_ms", LongType)))
    core.add(StructField("payload", core))
  }

  /** Parse `raw(jsonCol)` Debezium events of a table with `rowSchema`.
    * Emits every `rowSchema` column (from `after`, or `before` on deletes)
    * plus `_version`, `_is_deleted`, `_event_ts`, `_source_table`.
    */
  def parse(raw: DataFrame, jsonCol: String, rowSchema: StructType): Parsed = {
    val parsed = raw.withColumn("__env",
      from_json(col(jsonCol), envelopeSchema(rowSchema)))
    // unwrap per row: schemas.enable=true nests the same fields under
    // `payload`; a row is whichever layer actually carries an op
    def f(name: String): Column =
      coalesce(col(s"__env.payload.$name"), col(s"__env.$name"))
    val op = f("op")
    val version = coalesce(f("source.lsn"), f("ts_ms") * 1000L)
    // version.isNotNull: an event with neither lsn nor ts_ms has no place
    // in the change order — dead-letter it rather than emit a null that
    // every max_by / orderBy would drop or sort arbitrarily
    val valid = op.isin("c", "u", "r", "d") &&
      when(op === "d", f("before").isNotNull).otherwise(f("after").isNotNull) &&
      version.isNotNull
    val tombstone = col(jsonCol).isNull
    val image = when(op === "d", f("before")).otherwise(f("after"))
    val scale = when(f("source.lsn").isNotNull, lit("lsn")).otherwise(lit("ts_ms"))
    val rowCols = rowSchema.fieldNames.toSeq.map(n => image.getField(n).as(n))
    val changes = parsed.where(!tombstone && valid)
      .select(rowCols ++ Seq(
        version.as("_version"),
        (op === "d").as("_is_deleted"),
        timestamp_millis(f("ts_ms")).as("_event_ts"),
        f("source.table").as("_source_table"),
        scale.as("_version_scale")): _*)
    val dead = parsed.where(!tombstone && !coalesce(valid, lit(false)))
      .drop("__env")
    Parsed(changes, dead)
  }

  /** Rows per `_version_scale` — the per-batch health counter a feed
    * monitor alerts on. Two rows out means the feed is mixing real LSNs
    * with ts_ms fallbacks and its `_version` order is meaningless across
    * the two groups. Streaming-safe inside `foreachBatch`.
    */
  def scaleCounts(changes: DataFrame): DataFrame =
    changes.groupBy(col("_version_scale")).agg(count(lit(1)).as("n"))

  /** Hard gate for batch ingestion: throws if `changes` mixes version
    * scales (see [[scaleCounts]]); returns `changes` unchanged for
    * chaining otherwise. The collected RESULT is bounded at two rows, but
    * computing it scans (and so re-parses) the whole feed — on a large
    * batch, persist `changes` before gating so the downstream sink action
    * reuses the parse instead of running it twice.
    */
  def requireUniformScale(changes: DataFrame): DataFrame = {
    val scales = scaleCounts(changes).collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}")
    if (scales.length > 1)
      throw new IllegalStateException(
        s"mixed _version scales in one feed (${scales.sorted.mkString(", ")}): " +
          "LSNs and promoted ts_ms are not comparable; split the feed or fix the source")
    changes
  }
}
