package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.SyncManifest
import graft.streaming.CdcStream

/** Incrementally-maintained JOIN view — the denormalized-mirror sibling of
  * [[MaterializedAgg]]: keep `view = A ⋈ B ON A.fk = B.key` current under
  * CDC upsert/delete batches on EITHER side without ever re-running the
  * full join (the ClickHouse-materialized-view / PeerDB denormalized-
  * target use case the reference stack serves with a warehouse view).
  *
  * Layout under `root` (all manifest-committed bucketed mirrors sharing
  * [[CdcStream.upsertBatch]]'s commit protocol):
  *  - `a_by_key`  — A's rows, bucketed by A's key (the primary mirror);
  *  - `a_by_fk`   — the SAME rows bucketed by the foreign key: the JOIN
  *    INDEX. A ΔB batch finds the A rows it affects by reading ONLY the
  *    fk-buckets its keys hash to — delta-proportional IO, never an
  *    A-scan. When a row's fk changes, its old bucket keeps a stale
  *    lower-version copy (bucket-local merges); every index read is
  *    therefore VERSION-VERIFIED against `a_by_key` before use, and
  *    [[vacuumIndex]] rewrites the index clean.
  *  - `b_by_key`  — B's rows, bucketed by B's key;
  *  - `view`      — the joined rows, keyed and bucketed by A's key, with
  *    tombstones where the join pair dissolved.
  *
  * Maintenance per batch (all delta-proportional):
  *  1. upsert the deltas into their mirrors (ΔA into both A copies);
  *  2. affected = ΔA's keys ∪ keys of index rows in ΔB's fk-buckets
  *     (version-verified);
  *  3. recompute exactly the affected keys: newest live A rows, inner
  *     join against the newest live B rows for just their fks (both reads
  *     bucket-pruned); affected keys with no surviving pair tombstone;
  *  4. upsert the recomputed rows into `view` at the batch's version.
  *
  * Replay-idempotent end to end: re-applying a batch re-upserts identical
  * versions and recomputes identical rows. The gold correctness contract
  * (spec-pinned after every batch): `read(view) ≡ FINAL(A) ⋈ FINAL(B)`
  * recomputed from scratch.
  *
  * B-side payload columns that collide with A-side names land prefixed
  * `b_`; the B key column lands as the fk column's value (join equality).
  */
object MaterializedJoin {

  /** `aKey`/`bKey`: primary key column of each side; `fk`: A's column
    * joined to `bKey`. Delta frames carry payload + `versionCol` +
    * `is_deleted`.
    */
  final case class Config(aKey: String, fk: String, bKey: String,
                          nBuckets: Int = 16, versionCol: String = "_version")

  private def dirs(root: String) =
    (s"$root/a_by_key", s"$root/a_by_fk", s"$root/b_by_key", s"$root/view")

  private def bucketOf(c: String, n: Int) = pmod(hash(col(c)), lit(n))

  /** Newest live rows of a bucketed mirror, pruned to the buckets the
    * `probe` keys hash to, then semi-joined to the probe — delta-
    * proportional reads (the touched-bucket pattern of upsertBatch).
    */
  private def prunedNewest(spark: SparkSession, dir: String, keyCol: String,
                           versionCol: String, probe: DataFrame,
                           probeKey: String, n: Int): DataFrame = {
    if (!CdcStream.hasVisibleParquet(spark, dir))
      return spark.emptyDataFrame
    import spark.implicits._
    val buckets = probe
      .select(pmod(hash(col(probeKey)), lit(n)).as("b")).distinct()
      .as[Int].collect()
    // schema-preserving empty result: downstream column refs must resolve
    if (buckets.isEmpty)
      return CdcOps.latestSnapshot(
        SyncManifest.readCommitted(spark, dir).limit(0), Seq(keyCol),
        versionCol)
    val pruned = SyncManifest.readCommitted(spark, dir)
      .where(col("bucket").isin(buckets.toSeq: _*))
      .join(probe.select(col(probeKey).as(keyCol)).distinct(), Seq(keyCol),
        "left_semi")
    CdcOps.latestSnapshot(pruned, Seq(keyCol), versionCol)
  }

  /** Apply one CDC batch (either delta may be empty) at `batchVersion` —
    * strictly increasing across batches; replaying a version is a no-op
    * by convergence.
    */
  def applyBatch(spark: SparkSession, root: String, cfg: Config,
                 deltaA: Option[DataFrame], deltaB: Option[DataFrame],
                 batchVersion: Long): Unit = {
    val (aKeyDir, aFkDir, bKeyDir, viewDir) = dirs(root)
    // each delta is consumed several times (two mirror upserts, the
    // affected-key set, emptiness probes) — pin it once, delta-sized
    val pinned = (deltaA.toSeq ++ deltaB.toSeq).map(
      _.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    try {
      applyBatchPinned(spark, root, cfg,
        deltaA.map(_ => pinned.head), deltaB.map(_ => pinned.last),
        batchVersion, aKeyDir, aFkDir, bKeyDir, viewDir)
    } finally pinned.foreach(_.unpersist(false))
  }

  private def applyBatchPinned(spark: SparkSession, root: String, cfg: Config,
                               deltaA: Option[DataFrame],
                               deltaB: Option[DataFrame], batchVersion: Long,
                               aKeyDir: String, aFkDir: String,
                               bKeyDir: String, viewDir: String): Unit = {
    val dA = deltaA.filter(d => !d.isEmpty)
    val dB = deltaB.filter(d => !d.isEmpty)
    if (dA.isEmpty && dB.isEmpty) return

    // fk/bKey Spark types must MATCH exactly: `hash()` is type-sensitive
    // (hash(10: int) ≠ hash(10L: long)), so a silently-cast mismatch would
    // prune the WRONG index buckets and the view would go permanently
    // stale with no error. Loud beats wrong.
    val fkType = dA.map(_.schema(cfg.fk).dataType).orElse(
      if (CdcStream.hasVisibleParquet(spark, aKeyDir))
        Some(SyncManifest.readCommitted(spark, aKeyDir).schema(cfg.fk).dataType)
      else None)
    val bKeyType = dB.map(_.schema(cfg.bKey).dataType).orElse(
      if (CdcStream.hasVisibleParquet(spark, bKeyDir))
        Some(SyncManifest.readCommitted(spark, bKeyDir).schema(cfg.bKey).dataType)
      else None)
    for (f <- fkType; b <- bKeyType)
      require(f == b, s"MaterializedJoin: fk '${cfg.fk}' is $f but B key " +
        s"'${cfg.bKey}' is $b — hash bucketing is type-sensitive; align the " +
        "delta schemas before applyBatch")

    // 1. mirror upserts (ΔA lands in both the primary and the join index)
    dA.foreach { d =>
      CdcStream.upsertBatch(spark, d, Seq(cfg.aKey), cfg.versionCol,
        aKeyDir, cfg.nBuckets)
      CdcStream.upsertBatch(spark, d, Seq(cfg.aKey), cfg.versionCol,
        aFkDir, cfg.nBuckets, bucketCols = Seq(cfg.fk))
    }
    dB.foreach(d => CdcStream.upsertBatch(spark, d, Seq(cfg.bKey),
      cfg.versionCol, bKeyDir, cfg.nBuckets))

    // 2. affected A keys
    val fromA = dA.map(_.select(col(cfg.aKey))).toSeq
    val fromB = dB.toSeq.flatMap { d =>
      if (!CdcStream.hasVisibleParquet(spark, aFkDir)) Nil
      else {
        import spark.implicits._
        val fkBuckets = d
          .select(pmod(hash(col(cfg.bKey)), lit(cfg.nBuckets)).as("b"))
          .distinct().as[Int].collect()
        if (fkBuckets.isEmpty) Nil
        else Seq(SyncManifest.readCommitted(spark, aFkDir)
          .where(col("bucket").isin(fkBuckets.toSeq: _*))
          .join(d.select(col(cfg.bKey).as(cfg.fk)).distinct(), Seq(cfg.fk),
            "left_semi")
          .select(col(cfg.aKey)))
      }
    }
    val affectedParts = fromA ++ fromB
    if (affectedParts.isEmpty) return
    val affected = affectedParts.reduce(_ unionByName _).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      recomputeAffected(spark, cfg, affected, aKeyDir, bKeyDir, viewDir,
        batchVersion)
    } finally affected.unpersist(false)
  }

  private def recomputeAffected(spark: SparkSession, cfg: Config,
                                affected: DataFrame, aKeyDir: String,
                                bKeyDir: String, viewDir: String,
                                batchVersion: Long): Unit = {
    // e.g. a ΔB touching keys nothing references: mirrors updated, no
    // view work
    if (affected.isEmpty) return

    // 3. recompute exactly the affected keys. Index hits are implicitly
    // version-verified here: the newest row comes from the PRIMARY mirror,
    // so a stale old-fk index copy only ever costs a redundant (correct)
    // recompute, never a wrong row.
    val aNewest = prunedNewest(spark, aKeyDir, cfg.aKey, cfg.versionCol,
      affected, cfg.aKey, cfg.nBuckets)
    val aLive = aNewest.where(!isDeletedCol(aNewest))
    val aMeta = Set(cfg.versionCol, "is_deleted", "_is_deleted", "bucket",
      "_batch_id")
    val aPayload = aLive.columns.filterNot(aMeta).toSeq // includes aKey, fk
    val aRows = aLive.select(aPayload.map(col): _*)
    val bNewest = prunedNewest(spark, bKeyDir, cfg.bKey, cfg.versionCol,
      aRows.select(col(cfg.fk)).where(col(cfg.fk).isNotNull), cfg.fk,
      cfg.nBuckets)
    val bLive =
      if (bNewest.columns.isEmpty) bNewest
      else bNewest.where(!isDeletedCol(bNewest))
    val joined =
      if (bLive.columns.isEmpty) aRows.limit(0) // no B yet: nothing joins
      else {
        val bPayload = bLive.columns.filterNot(aMeta).toSeq
        val renamed = bPayload.foldLeft(bLive.select(bPayload.map(col): _*)) {
          (df, c) =>
            if (c != cfg.bKey && aPayload.contains(c))
              df.withColumnRenamed(c, s"b_$c")
            else df
        }
        aRows.join(renamed, aRows(cfg.fk) === renamed(cfg.bKey), "inner")
          .drop(renamed(cfg.bKey))
      }
    // affected keys with no surviving pair dissolve into tombstones
    val tombs = affected
      .join(joined.select(col(cfg.aKey)), Seq(cfg.aKey), "left_anti")
      .withColumn("is_deleted", lit(true))
    val upserts = joined.withColumn("is_deleted", lit(false))
      .unionByName(tombs, allowMissingColumns = true)
      .withColumn(cfg.versionCol, lit(batchVersion))

    // 4. commit the view delta
    CdcStream.upsertBatch(spark, upserts, Seq(cfg.aKey), cfg.versionCol,
      viewDir, cfg.nBuckets)
  }

  private def isDeletedCol(df: DataFrame) =
    Seq("is_deleted", "_is_deleted").find(df.columns.contains)
      .map(c => coalesce(col(c), lit(false))).getOrElse(lit(false))

  /** The view's FINAL read: newest version per A key, tombstones dropped.
    * A view that never saw a joinable batch (e.g. B-only bootstrap) reads
    * as a zero-column empty frame.
    */
  def read(spark: SparkSession, root: String, cfg: Config): DataFrame = {
    val (_, _, _, viewDir) = dirs(root)
    if (!CdcStream.hasVisibleParquet(spark, viewDir))
      return spark.emptyDataFrame
    CdcOps.softDeleteSnapshot(SyncManifest.readCommitted(spark, viewDir),
      Seq(cfg.aKey), cfg.versionCol, col("is_deleted"))
      .drop("bucket", "_batch_id")
  }

  /** Continuous maintenance from ONE multiplexed change stream — the
    * shape a multi-table CDC capture emits (both tables' changes in one
    * ordered feed, rows tagged by `tableCol`): each microbatch splits into
    * ΔA/ΔB by tag, projects each side's columns, and applies at the
    * BATCH id as the view version — replayed batches re-apply the same
    * version and converge, so the checkpoint contract is the usual
    * foreachBatch idempotency. The stream's schema is the by-name union
    * of both sides (each row nulls the other side's columns).
    */
  def mirrorChanges(changes: DataFrame, tableCol: String,
                    aName: String, bName: String,
                    aCols: Seq[String], bCols: Seq[String],
                    root: String, cfg: Config, checkpointDir: String,
                    trigger: org.apache.spark.sql.streaming.Trigger =
                      org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = changes.sparkSession
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val dA = batch.where(col(tableCol) === aName)
            .select(aCols.map(col): _*)
          val dB = batch.where(col(tableCol) === bName)
            .select(bCols.map(col): _*)
          applyBatch(spark, root, cfg, Some(dA), Some(dB),
            batchVersion = batchId)
        }
      }
      .start()
  }

  /** Rewrite the join index clean from the primary mirror — drops the
    * stale old-fk copies bucket-local merges leave behind (fk-churn
    * bounded; run on the compaction cadence).
    */
  def vacuumIndex(spark: SparkSession, root: String, cfg: Config): Unit = {
    val (aKeyDir, aFkDir, _, _) = dirs(root)
    if (!CdcStream.hasVisibleParquet(spark, aKeyDir)) return
    val newest = CdcOps.latestSnapshot(
      SyncManifest.readCommitted(spark, aKeyDir), Seq(cfg.aKey),
      cfg.versionCol).drop("bucket")
    val withBucket = newest
      .withColumn("bucket", bucketOf(cfg.fk, cfg.nBuckets))
    CdcStream.commitBuckets(spark, withBucket, aFkDir, 0 until cfg.nBuckets)
  }
}
