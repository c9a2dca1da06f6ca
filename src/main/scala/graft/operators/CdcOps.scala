package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC-log operators: the engine half of the reference pipeline.
  *
  * The reference replicates a PostgreSQL WAL into ClickHouse
  * `ReplacingMergeTree` tables decorated with PeerDB metadata columns
  * (`_peerdb_version`, `_peerdb_is_deleted`, `_peerdb_synced_at`,
  * `_peerdb_batch_id`); reading the target collapses each key to its newest
  * version and hides soft-deleted rows. Here the change log is any DataFrame
  * with (key, version, op) columns and the collapse/metadata/history/stats
  * operators are plain `DataFrame => DataFrame` transforms.
  *
  * Scale notes (100 TB): `latestSnapshot` is a single hash-shuffle on the key
  * with map-side partial aggregation (`max_by` over a packed struct) — no
  * global sort, no per-key window sort, skew handled by AQE. The SCD-2 and
  * sessionization operators genuinely need per-key ordering and use a window
  * over the same key partitioning (one shuffle, sort within partitions only).
  */
object CdcOps {

  /** ReplacingMergeTree-FINAL semantics: newest row per key.
    *
    * One shuffle on `keys`; partial `max_by` runs map-side so the shuffle
    * carries one packed row per key per mapper, not the whole log.
    *
    * Version ties break DETERMINISTICALLY toward the tombstone: when the log
    * carries a delete flag (`_peerdb_is_deleted` / the streaming path's
    * `is_deleted`), the ordering key is (version, flag), so two rows at the
    * same version cannot nondeterministically resurrect a deleted key — the
    * window [[graft.sources.Incremental.reconcileDeletes]] documents (a
    * replayed pre-delete batch re-merging the exact version a sweep flagged)
    * now converges immediately instead of waiting for the next sweep.
    * ClickHouse ReplacingMergeTree breaks the same tie by `is_deleted` when
    * the column is declared (SURVEY §1). Logs without a flag column order by
    * version alone, unchanged.
    */
  def latestSnapshot(log: DataFrame, keys: Seq[String], versionCol: String): DataFrame = {
    val payload = log.columns.filterNot(keys.contains)
    val delFlag = Seq("_peerdb_is_deleted", "is_deleted").find(log.columns.contains)
      .map(f => coalesce(col(f).cast("int"), lit(0)))
    val ordKey = delFlag.map(f => struct(col(versionCol), f)).getOrElse(col(versionCol))
    val packed = struct(col(versionCol) +: payload.filterNot(_ == versionCol).map(col): _*)
    val picked = log.groupBy(keys.map(col): _*)
      .agg(max_by(packed, ordKey).as("_latest"))
    val unpacked = keys.map(col) ++
      (versionCol +: payload.filterNot(_ == versionCol)).map(c => col(s"_latest.$c").as(c))
    // restore the caller's column order
    picked.select(unpacked: _*).select(log.columns.map(col): _*)
  }

  /** Snapshot with soft-deleted keys removed: a key whose newest op satisfies
    * `isDelete` is dropped, like filtering `_peerdb_is_deleted = 0`.
    */
  def softDeleteSnapshot(log: DataFrame, keys: Seq[String], versionCol: String,
                         isDelete: Column): DataFrame =
    latestSnapshot(log, keys, versionCol).where(!isDelete)

  /** Decorate raw change rows with PeerDB-style mirror metadata columns —
    * all four the reference mirror carries: `_peerdb_version`,
    * `_peerdb_is_deleted`, `_peerdb_batch_id`, `_peerdb_synced_at`
    * (reference: peerdb_config.yaml mirror tables; the monitor's lag view
    * reads the synced-at timestamp).
    *
    * @param syncedAt wall-clock sync stamp; defaults to the session's
    *                 `current_timestamp()` (per-query constant), pass a
    *                 derived column for reproducible pipelines/tests.
    */
  def withMirrorMeta(log: DataFrame, keys: Seq[String], versionCol: String,
                     isDelete: Column, batchCol: Column,
                     syncedAt: Column = current_timestamp()): DataFrame =
    log.withColumn("_peerdb_version", col(versionCol).cast("long"))
      .withColumn("_peerdb_is_deleted", when(isDelete, 1).otherwise(0))
      .withColumn("_peerdb_batch_id", batchCol)
      .withColumn("_peerdb_synced_at", syncedAt.cast("timestamp"))

  /** SCD-2 history: every change becomes a validity interval
    * [valid_from, valid_to) per key, newest row open-ended (null valid_to).
    */
  def scd2History(log: DataFrame, keys: Seq[String], tsCol: String,
                  versionCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol))
    log.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", lead(col(tsCol), 1).over(w).isNull)
  }

  /** Per-batch sync statistics — the monitor's "rows synced per batch" view.
    * One shuffle on the batch id; all aggregates combine map-side.
    */
  def batchStats(log: DataFrame, batchCol: Column, keys: Seq[String],
                 opCol: Column, deleteOp: Column): DataFrame =
    log.groupBy(batchCol.as("batch_id"))
      .agg(
        count(lit(1)).as("rows_synced"),
        countDistinct(col(keys.head), keys.tail.map(col): _*).as("distinct_keys"),
        sum(when(opCol === deleteOp, 1L).otherwise(0L)).as("delete_rows"))

  /** Per-key change fan-out: how many versions each key accumulated. */
  def versionCounts(log: DataFrame, keys: Seq[String], versionCol: String): DataFrame =
    log.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_changes"), max(col(versionCol)).as("max_version"))

  /** Per-key change-rate profile: event count plus exact inter-change gap
    * stats in integer MICROSECONDS (`unix_micros`/`epoch_us` agree across
    * engines; float seconds would not sum deterministically). The hot-key /
    * idle-key signal a CDC monitor uses for throttling and slot sizing.
    * One shuffle on the key; the lag window and the aggregation share it.
    */
  def changeRates(log: DataFrame, keyCol: String, tsCol: String,
                  versionCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(versionCol))
    val us = graft.functions.TimeCols.micros(col(tsCol))
    val gap = us - lag(us, 1).over(byKey)
    log.withColumn("gap_us", gap)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_changes"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        sum(col("gap_us")).as("sum_gap_us"))
  }

  /** Per-op totals and share of the log — the monitor's event-type table. */
  def opRates(log: DataFrame, opCol: Column): DataFrame = {
    val counts = log.groupBy(opCol.as("op")).agg(count(lit(1)).as("n"))
    // total via a scalar broadcast join (tiny), keeping everything one job
    counts.crossJoin(broadcast(log.agg(count(lit(1)).as("total"))))
      .select(col("op"), col("n"),
        ((col("n") * lit(1000000L)) / col("total")).as("share_ppm"))
  }

  /** Gap-based sessionization: a new session starts when the key was idle for
    * more than `gapSeconds`. Single shuffle on the key; session ids are a
    * running sum of boundary flags within the per-key sort.
    */
  def sessionize(log: DataFrame, keys: Seq[String], tsCol: String,
                 gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val prevTs = lag(col(tsCol), 1).over(byKey)
    val sec = graft.functions.TimeCols.seconds _
    val newSession = when(prevTs.isNull
      .or(sec(col(tsCol)) - sec(prevTs) > gapSeconds), 1L).otherwise(0L)
    log.withColumn("session_seq", sum(newSession).over(
      byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Audit diff between the mirror's states at two version cutoffs: what a
    * replication pipeline answers when asked "what changed between sync v1
    * and sync v2?" (the reference exposes the same question through
    * `_peerdb_version` ranges on the ClickHouse target). Each key is
    * classified by comparing its latest ≤`v1Max` row against its latest
    * ≤`v2Max` row:
    *
    *   - `added`     absent (or soft-deleted) at v1, live at v2
    *   - `removed`   live at v1, soft-deleted at v2
    *   - `changed`   live at both with different latest versions
    *   - `unchanged` live at both with the same latest version
    *
    * Keys dead at both cutoffs are omitted (they are invisible in both
    * snapshots). Rows are immutable per version in a CDC log, so "same
    * latest version" IS "same row" — no payload comparison needed.
    *
    * ONE shuffle on the keys over a single `version <= v2Max` scan: both
    * cutoff states come out of the same grouped aggregation (`max_by`
    * skips null ordering keys, so the v1 aggregate simply ignores rows
    * past v1), never two scans joined — at 100 TB the log is read once,
    * the filter is pushed into the scan, and partial aggregation runs
    * map-side.
    */
  def snapshotDiff(log: DataFrame, keys: Seq[String], versionCol: String,
                   v1Max: Long, v2Max: Long, isDelete: Column): DataFrame = {
    require(v1Max <= v2Max, s"snapshotDiff cutoffs out of order: $v1Max > $v2Max")
    val ver = col(versionCol)
    val packed = struct(ver.as("ver"), isDelete.cast("boolean").as("del"))
    val g = log.where(ver <= lit(v2Max))
      .groupBy(keys.map(col): _*)
      .agg(max_by(packed, when(ver <= lit(v1Max), ver)).as("_s1"),
        max_by(packed, ver).as("_s2"))
    val live1 = col("_s1").isNotNull && !col("_s1.del")
    val live2 = !col("_s2.del")
    g.where(live1 || live2)
      .select(keys.map(col) ++ Seq(
        col("_s1.ver").as("v1_version"), col("_s2.ver").as("v2_version"),
        when(!live1, "added")
          .when(!live2, "removed")
          .when(col("_s1.ver") === col("_s2.ver"), "unchanged")
          .otherwise("changed").as("change")): _*)
  }

  /** Traffic-spike days in the change log: days whose event count exceeds
    * `num/den` × the event type's daily average — the load-anomaly check a
    * monitor runs over the mirrored log (the reference's monitor tracks
    * per-table ops/sec and flags deviations). The comparison is kept in
    * MULTIPLIED-OUT integer form (`cnt · days · den > num · total`), so
    * the result is exact and engine-comparable — no float division, no
    * stddev whose summation order differs between engines.
    *
    * Shape: two grouped aggregations (daily counts, then per-type totals —
    * both map-side partial) and a join against the per-type frame, which
    * is one row per event type at ANY scale factor, so it broadcasts.
    */
  def trafficSpikes(events: DataFrame, tsCol: String, typeCol: String,
                    num: Int = 11, den: Int = 10): DataFrame = {
    require(num > 0 && den > 0, s"bad spike factor $num/$den")
    val daily = events
      .groupBy(col(typeCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val perType = daily.groupBy(col(typeCol))
      .agg(sum(col("cnt")).as("total"), count(lit(1)).as("days"))
    daily.join(broadcast(perType), typeCol)
      .where(col("cnt") * col("days") * den > lit(num.toLong) * col("total"))
      .select(col(typeCol), col("day"), col("cnt"))
  }
}
