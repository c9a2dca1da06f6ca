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
  * Maintenance per batch (all delta-proportional, and the mirror commits
  * overlap the view work — see applyBatch):
  *  1. upsert the deltas into their mirrors (ΔA into both A copies from
  *     one materialized pass, all three mirror commits concurrent);
  *  2. affected = ΔA's keys ∪ keys of index rows in ΔB's fk-buckets
  *     (version-verified);
  *  3. recompute exactly the affected keys from (committed generation ∪
  *     pinned delta): newest live A rows, inner join against the newest
  *     live B rows for just their fks (both reads bucket-pruned);
  *     affected keys with no surviving pair tombstone;
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

  /** Newest rows for the probe's keys, merged from the mirror's COMMITTED
    * generation (pruned to the buckets the probe keys hash to) and the
    * batch's own pinned delta — the recompute's source of truth, which
    * deliberately does NOT depend on this batch's mirror commits having
    * landed (see applyBatch's concurrency note). The union can carry up
    * to two generations of a key (mirror + delta), so the newest-per-key
    * collapse applies here; both inputs are delta/affected-sized.
    */
  private def mergedNewest(spark: SparkSession, dir: String, keyCol: String,
                           versionCol: String, delta: Option[DataFrame],
                           probe: DataFrame, probeKey: String,
                           n: Int): DataFrame = {
    import spark.implicits._
    val buckets = probe
      .select(pmod(hash(col(probeKey)), lit(n)).as("b")).distinct()
      .as[Int].collect().toSeq
    mergedNewestAt(spark, dir, keyCol, versionCol, delta, probe, probeKey,
      buckets)
  }

  /** [[mergedNewest]] with the probe's bucket set already collected —
    * callers that need the same set elsewhere (e.g. the view commit's
    * touched buckets) collect it once and share.
    *
    * The newest-per-key collapse is the windowed [[CdcOps.latestSnapshot]]
    * on purpose: the measured alternative (pin the delta collapsed, then
    * merge with a broadcast anti-join instead of the window) swapped one
    * ~delta-sized sort for two extra broadcast builds per merge and a
    * window over each pin, and benched ~70% SLOWER on batches whose delta
    * is comparable to the touched mirror slice — the CDC lifecycle shape
    * this operator serves. The window's sort cost tracks the probed slice
    * (delta-proportional), so it also scales fine.
    */
  private def mergedNewestAt(spark: SparkSession, dir: String, keyCol: String,
                             versionCol: String, delta: Option[DataFrame],
                             probe: DataFrame, probeKey: String,
                             buckets: Seq[Int]): DataFrame = {
    val mirror =
      if (!CdcStream.hasVisibleParquet(spark, dir)) None
      // schema-preserving empty: downstream column refs must resolve
      else if (buckets.isEmpty)
        Some(SyncManifest.readCommitted(spark, dir).limit(0))
      else Some(SyncManifest.readCommitted(spark, dir)
        .where(col("bucket").isin(buckets: _*)))
    val parts = mirror.toSeq ++ delta.toSeq
    if (parts.isEmpty) return spark.emptyDataFrame
    val base = parts.reduce(_.unionByName(_, allowMissingColumns = true))
    // left_semi dedups inherently — no distinct() exchange on the probe.
    // The probe is key-only and delta/affected-sized (the bounded-batch
    // CDC contract), so it broadcasts: the semi filter then runs BEFORE
    // the collapse's key exchange, which ships only surviving rows —
    // strictly fewer rows moved than sort-merging base against the probe
    val probed = base.join(
      broadcast(probe.select(col(probeKey).as(keyCol))),
      Seq(keyCol), "left_semi")
    CdcOps.latestSnapshot(probed, Seq(keyCol), versionCol)
  }

  /** [[mergedNewestAt]] with the mirror's bucket prune done by a
    * broadcast (key, bucket) semi-join instead of a pre-collected bucket
    * list — the probe-side bucket id is `pmod(hash(key), n)`, identical
    * to the mirror's layout, and dynamic partition pruning reuses the
    * broadcast to restrict the scan to the probed buckets. Same
    * delta-proportional IO as the isin prune, zero driver actions.
    */
  private def mergedNewestProbed(spark: SparkSession, dir: String,
                                 keyCol: String, versionCol: String,
                                 delta: Option[DataFrame], probe: DataFrame,
                                 probeKey: String, n: Int): DataFrame = {
    val keyed = probe.select(col(probeKey).as(keyCol))
    val mirror =
      if (!CdcStream.hasVisibleParquet(spark, dir)) None
      else Some(SyncManifest.readCommitted(spark, dir)
        .join(broadcast(keyed.withColumn("bucket",
          pmod(hash(col(keyCol)), lit(n)))), Seq(keyCol, "bucket"),
          "left_semi"))
    // the delta is in-memory (nothing to prune): plain key semi-join
    val deltaProbed = delta.map(_.join(broadcast(keyed), Seq(keyCol),
      "left_semi"))
    val parts = mirror.toSeq ++ deltaProbed.toSeq
    if (parts.isEmpty) return spark.emptyDataFrame
    val base = parts.reduce(_.unionByName(_, allowMissingColumns = true))
    CdcOps.latestSnapshot(base, Seq(keyCol), versionCol)
  }

  /** Apply one CDC batch (either delta may be empty) at `batchVersion` —
    * strictly increasing across batches; replaying a version is a no-op
    * by convergence.
    */
  def applyBatch(spark: SparkSession, root: String, cfg: Config,
                 deltaA: Option[DataFrame], deltaB: Option[DataFrame],
                 batchVersion: Long): Unit = {
    // MAINTENANCE SESSION: the batch runs in an isolated child session
    // (shared SparkContext, cache, and catalog; own SQLConf) with AQE
    // off and bucket-sized shuffle parallelism. Rationale, measured: AQE
    // materializes every exchange of every maintenance plan as its own
    // driver job — ~50 jobs for one warm-mirror batch vs ~10 structural
    // ones — and at high batch cadence the batch cost IS that driver
    // latency chain, not data volume (the per-job win AQE buys, runtime
    // coalescing, matters on multi-GB exchanges, which delta-proportional
    // maintenance never has). The caller's own session and its AQE
    // settings are untouched.
    val maint = spark.newSession()
    maint.conf.set("spark.sql.adaptive.enabled", "false")
    // enough tasks to spread a big delta's merge, few enough that tiny
    // lifecycle batches aren't 32 tasks per stage; callers can override
    val parts = spark.conf.getOption("graft.mjoin.maintenancePartitions")
      .map(_.toInt).getOrElse(math.max(cfg.nBuckets, 8))
    maint.conf.set("spark.sql.shuffle.partitions", parts.toString)
    def rebind(df: DataFrame): DataFrame =
      org.apache.spark.sql.graft.bridge.ofRows(maint, df.queryExecution.logical)
    val (aKeyDir, aFkDir, bKeyDir, viewDir) = dirs(root)
    // each delta is consumed several times (two mirror upserts, the
    // affected-key set, emptiness probes) — pin it once, delta-sized
    val pinned = (deltaA.toSeq ++ deltaB.toSeq).map(d =>
      rebind(d).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    try {
      applyBatchPinned(maint, root, cfg,
        deltaA.map(_ => pinned.head), deltaB.map(_ => pinned.last),
        batchVersion, aKeyDir, aFkDir, bKeyDir, viewDir)
    } finally pinned.foreach(_.unpersist(false))
  }

  private def applyBatchPinned(spark: SparkSession, root: String, cfg: Config,
                               deltaA: Option[DataFrame],
                               deltaB: Option[DataFrame], batchVersion: Long,
                               aKeyDir: String, aFkDir: String,
                               bKeyDir: String, viewDir: String): Unit = {
    // no up-front isEmpty probes: an empty delta flows through as an
    // empty frame — its mirror upserts commit nothing (touched empty) and
    // the affected-bucket gate below ends the batch — saving two Spark
    // jobs per batch on the common non-empty path
    val dA = deltaA
    val dB = deltaB

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

    // 0. the batch's ONLY sequential driver collect: materialize the
    // affected-key frame into cache and collect its bucket set in one
    // job. The probe reads the PRE-batch committed join index (strictly
    // before this batch's commits launch), which is complete for its
    // purpose: it only surfaces EXISTING rows referencing ΔB's keys, and
    // ΔA's own rows enter `affected` directly. The mirror lanes collect
    // their own touched sets INSIDE their concurrent futures (step 1) —
    // off the critical path, which at high batch cadence IS the
    // sequential driver-action chain: it is now collect → recompute+
    // commit, two actions per batch.
    import spark.implicits._
    def mark(label: String, t0: Long): Unit =
      if (sys.env.contains("SPARK_GRAFT_MJ_TIMING"))
        System.err.println(f"[mj] $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    val tA0 = System.nanoTime()
    val fromA = dA.map(_.select(col(cfg.aKey))).toSeq
    val fromB = dB.toSeq.flatMap { d =>
      if (!CdcStream.hasVisibleParquet(spark, aFkDir)) Nil
      else {
        // the fk-bucket prune can't use a collected list here (this IS
        // the collecting job), so the probe joins on (fk, bucket) with
        // the bucket id recomputed from the delta: index bucket =
        // pmod(hash(fk), n) by construction, the probe keys are
        // broadcast (delta-key-sized), and dynamic partition pruning
        // reuses that broadcast to prune the index READ to the probed
        // buckets — same delta-proportional IO as the isin prune,
        // without the extra driver action that produced the list
        val probe = broadcast(d.select(col(cfg.bKey).as(cfg.fk),
          pmod(hash(col(cfg.bKey)), lit(cfg.nBuckets)).as("bucket"))
          .distinct())
        Seq(SyncManifest.readCommitted(spark, aFkDir)
          .join(probe, Seq(cfg.fk, "bucket"), "left_semi")
          .select(col(cfg.aKey)))
      }
    }
    val affectedParts = fromA ++ fromB
    val affected =
      if (affectedParts.isEmpty) None
      else Some(affectedParts.reduce(_ unionByName _).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val affBuckets: Seq[Int] = affected.toSeq.flatMap(
      _.select(bucketOf(cfg.aKey, cfg.nBuckets).as("b")).distinct()
        .as[Int].collect().toSeq)
    mark("A0 affected", tA0)

    // 1. mirror upserts — ΔA lands in both the primary and the join index
    // from the same cached delta; ΔB's independent mirror rides the same
    // concurrent round. Each lane collects its own touched set and runs
    // its merge+commit write. The futures are awaited at the
    // END of the batch: the view recompute below reads (pre-commit
    // generation ∪ pinned delta), never the post-commit mirrors, so it
    // runs CONCURRENTLY with these commits — the batch's wall-clock is
    // max(mirror round, view round), not their sum. Either side of the
    // manifest-swap race is correct: a read that lands post-commit just
    // unions the delta in twice and the newest-per-key collapse converges
    // on identical rows; a pre-commit read's generation stays on disk
    // under the one-sync vacuum grace.
    import scala.concurrent.{Await, ExecutionContext, Future}
    implicit val ec: ExecutionContext = ExecutionContext.global
    val mirrorCommits =
      dA.toSeq.flatMap(d => Seq(
        Future(CdcStream.upsertOneTarget(spark, d, Seq(cfg.aKey),
          cfg.versionCol, CdcStream.UpsertTarget(aKeyDir, cfg.nBuckets))),
        Future(CdcStream.upsertOneTarget(spark, d, Seq(cfg.aKey),
          cfg.versionCol,
          CdcStream.UpsertTarget(aFkDir, cfg.nBuckets, Seq(cfg.fk)))))) ++
      dB.map(d => Future(CdcStream.upsertOneTarget(spark, d, Seq(cfg.bKey),
        cfg.versionCol, CdcStream.UpsertTarget(bKeyDir, cfg.nBuckets))))

    try {
      // 2. the affected frame is already cached and its bucket set
      // already collected by the job above; an empty set means no view
      // work (e.g. a ΔB touching keys nothing references: mirrors
      // updated above, nothing joins).
      affected.foreach { aff =>
        try {
          if (affBuckets.nonEmpty) {
            val tV = System.nanoTime()
            recomputeAffected(spark, cfg, aff, affBuckets, dA, dB, aKeyDir,
              bKeyDir, viewDir, batchVersion)
            mark("view round", tV)
          }
        } finally aff.unpersist(false)
      }
    } finally {
      // the NEXT batch (and the caller's read) must observe the committed
      // mirrors — and a commit failure must fail the batch loudly
      val tM = System.nanoTime()
      Await.result(Future.sequence(mirrorCommits),
        scala.concurrent.duration.Duration.Inf)
      mark("mirror await", tM)
    }
  }

  /** `affBuckets` (the affected keys' bucket set, collected by the fused
    * batch job) serves three uses here: pruning the A-side read, and the
    * view commit's touched set (the view upserts carry exactly one row
    * per affected key under the same bucketing, so the sets coincide);
    * the caller already used it as the emptiness gate.
    */
  private def recomputeAffected(spark: SparkSession, cfg: Config,
                                affected: DataFrame, affBuckets: Seq[Int],
                                dA: Option[DataFrame],
                                dB: Option[DataFrame], aKeyDir: String,
                                bKeyDir: String, viewDir: String,
                                batchVersion: Long): Unit = {
    def mark(label: String, t0: Long): Unit =
      if (sys.env.contains("SPARK_GRAFT_MJ_TIMING"))
        System.err.println(f"[mj] $label ${(System.nanoTime() - t0) / 1e9}%.3f s")

    // 3. recompute exactly the affected keys from (committed generation ∪
    // pinned delta) — independent of this batch's in-flight mirror
    // commits. Index hits are implicitly version-verified here: the
    // newest row comes from the primary merge, so a stale old-fk index
    // copy only ever costs a redundant (correct) recompute, never a
    // wrong row.
    val aNewest = mergedNewestAt(spark, aKeyDir, cfg.aKey, cfg.versionCol,
      dA, affected, cfg.aKey, affBuckets)
    val aLive = aNewest.where(!isDeletedCol(aNewest))
    val aMeta = Set(cfg.versionCol, "is_deleted", "_is_deleted", "bucket",
      "_batch_id")
    val aPayload = aLive.columns.filterNot(aMeta).toSeq // includes aKey, fk
    // pinned: the A-side newest-row plan (manifest read + merge window)
    // feeds BOTH the B-side probe and the join below — caching it
    // executes that plan once instead of twice
    val aRows = aLive.select(aPayload.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // B-side prune WITHOUT a driver action: the probe (aRows' fks) is
      // broadcast and the mirror semi-joins on (key, bucket) with the
      // bucket id recomputed probe-side — dynamic partition pruning
      // reuses the broadcast to restrict the B read to the probed
      // buckets, so the whole recompute+commit is ONE driver action
      // (aRows' cache materializes inside it and is shared by the three
      // subplans referencing it)
      val bNewest = mergedNewestProbed(spark, bKeyDir, cfg.bKey,
        cfg.versionCol, dB,
        aRows.select(col(cfg.fk)).where(col(cfg.fk).isNotNull), cfg.fk,
        cfg.nBuckets)
      val bLive =
        if (bNewest.columns.isEmpty) bNewest
        else bNewest.where(!isDeletedCol(bNewest))
      // ONE left-join chain builds live rows AND tombstones together: an
      // affected key whose A row died (left miss on aRows) or whose fk
      // finds no live B (left miss on the B side) lands with a null B
      // key, which IS the tombstone condition. The previous shape
      // (inner join + anti-join tombstones + union) evaluated the A⋈B
      // join twice — once for the union leg, once as the anti-join's
      // build side. Both right sides are delta-proportional (newest rows
      // of affected keys / their fks — the bounded-batch CDC contract),
      // so they broadcast: no exchange anywhere in the upsert plan until
      // the commit's bucket clustering.
      val base = affected.join(broadcast(aRows), Seq(cfg.aKey), "left")
      val upserts0 =
        if (bLive.columns.isEmpty)
          base.withColumn("is_deleted", lit(true)) // no B yet: all dissolve
        else {
          val bPayload = bLive.columns.filterNot(aMeta).toSeq
          // the B key is aliased to a fresh internal name: both sides can
          // share attribute lineage (the deltas may come from ONE
          // multiplexed batch frame — see mirrorChanges — and the merge
          // unions them in), and an alias mints a new expression id, so
          // the join condition and the drop below stay unambiguous where
          // a same-name reference would silently self-resolve
          val bk = "__graft_b_key"
          val renamed = bPayload.foldLeft(bLive.select(bPayload.map(c =>
            if (c == cfg.bKey) col(c).as(bk) else col(c)): _*)) {
            (df, c) =>
              if (c != cfg.bKey && aPayload.contains(c))
                df.withColumnRenamed(c, s"b_$c")
              else df
          }
          base.join(broadcast(renamed), col(cfg.fk) === col(bk), "left")
            .withColumn("is_deleted", col(bk).isNull)
            .drop(bk)
        }
      val upserts = upserts0
        .withColumn(cfg.versionCol, lit(batchVersion))
        .withColumn("bucket", bucketOf(cfg.aKey, cfg.nBuckets))

      // 4. commit the view delta. The touched set is affBuckets (every
      // upsert row's key is an affected key), so the merge-commit needs
      // no extra collect; the CACHED affected frame doubles as the
      // anti-join build side (its keys ARE the upsert keys: joined ∪
      // tombs partition `affected`), so the expensive upsert plan
      // streams once into the union instead of also being re-evaluated
      // for a key projection.
      val tA4 = System.nanoTime()
      CdcStream.mergeCommitTouched(spark, upserts, Seq(cfg.aKey),
        cfg.versionCol, viewDir, affBuckets,
        // one row per affected key at the batch's (strictly increasing)
        // version ⇒ anti-join replace, no newest-per-key sort
        newWins = true, newKeys = Some(affected.select(col(cfg.aKey))))
      mark("A4 view commit", tA4)
    } finally aRows.unpersist(false)
  }

  private def isDeletedCol(df: DataFrame) =
    Seq("is_deleted", "_is_deleted").find(df.columns.contains)
      .map(c => coalesce(col(c), lit(false))).getOrElse(lit(false))

  /** The view's FINAL read: live rows, tombstones dropped. No
    * newest-per-key collapse is needed — every view commit rewrites its
    * touched buckets fully merged (one newest row per key, see
    * [[CdcStream.mergeCommitTouched]]) and a key's bucket never changes,
    * so the committed content IS the newest snapshot by construction.
    * A view that never saw a joinable batch (e.g. B-only bootstrap) reads
    * as a zero-column empty frame.
    */
  def read(spark: SparkSession, root: String, cfg: Config): DataFrame = {
    val (_, _, _, viewDir) = dirs(root)
    if (!CdcStream.hasVisibleParquet(spark, viewDir))
      return spark.emptyDataFrame
    val v = SyncManifest.readCommitted(spark, viewDir)
    v.where(!coalesce(col("is_deleted"), lit(false)))
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
