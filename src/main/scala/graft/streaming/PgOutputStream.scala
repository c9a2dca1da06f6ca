package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.PgOutput
import graft.sources.PgOutput.{Relation, RelationAt, XLogData}

/** Continuous pgoutput capture: the flow-worker loop the reference runs
  * against a replication slot (docker-compose.yml:21-28), re-expressed as a
  * Structured Streaming `foreachBatch` over a landing stream of raw
  * replication frames — decode ([[PgOutput.parse]]) → dead-letter →
  * mirror upsert ([[CdcStream.upsertBatch]], newest `_version` = LSN per
  * key), with the relation-schema registry persisted ACROSS batches:
  * pgoutput sends `Relation` only on change or reconnect, so a microbatch
  * of bare DML must decode under schemas learned batches ago.
  *
  * The registry file reuses the WIRE format itself (length-prefixed
  * Relation frames, written with [[PgOutput.Fixture.relation]] and read
  * back through [[PgOutput.decodeFrame]]) — durable state goes through the
  * same decoder the stream does, so there is no second serialization
  * format to drift. Single-file temp+rename swap, crash-safe the same way
  * as the poll-state file: a torn write leaves the old registry, and a
  * replayed batch re-learns its own Relation messages from its frames.
  *
  * Ordering contract: the registry is written AFTER the mirror commit.
  * Either crash window converges on replay — the mirror upsert is
  * replay-idempotent, and the batch's own Relation frames re-merge into
  * the registry.
  */
object PgOutputStream {

  /** Start the capture loop. `frames` is a streaming DataFrame whose
    * `dataCol` holds raw replication frames (one CopyData payload per
    * row); `deadDir`, when set, accumulates undecodable frames as parquet
    * (frame + reason + batch id) for replay.
    */
  def mirrorFrames(frames: DataFrame, dataCol: String, table: String,
                   keys: Seq[String], targetDir: String, checkpointDir: String,
                   deadDir: Option[String] = None, nBuckets: Int = 64,
                   trigger: Trigger = Trigger.AvailableNow(),
                   healToast: Boolean = true): StreamingQuery = {
    val spark = frames.sparkSession
    frames.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          syncTableBatch(spark, batch, dataCol, table, keys, targetDir,
            deadDir, nBuckets, healToast, batchId)
      }
      .start()
  }

  /** One mirrored table of a multiplexed capture stream. */
  final case class TableSpec(table: String, keys: Seq[String], nBuckets: Int = 64)

  /** Multi-table capture from ONE multiplexed frame stream — a postgres
    * publication usually carries several tables over a single slot, and
    * running [[mirrorFrames]] per table would decode every frame once PER
    * TABLE. Here each microbatch is tagged in a single decode pass
    * ([[PgOutput.tagRelids]]): every DML/Relation frame learns the one
    * relid it belongs to (TRUNCATE its list), transaction-control frames
    * belong to all tables, and the driver resolves table names to relid
    * sets from the batch's own Relation frames plus each table's
    * persisted registry. Each table then syncs from its OWN frame subset
    * (its relids + the shared control frames) through the exact
    * single-table body ([[syncTableBatch]]): per-table mirror under
    * `targetDir/<table>`, per-table registry, per-table dead-letter under
    * `deadRoot/<table>`, per-table confirmed-flush LSN. The per-table
    * syncs touch disjoint directories and run CONCURRENTLY, the
    * [[graft.operators.MaterializedJoin]] pattern.
    *
    * A DML frame whose relid maps to NO named table is counted and logged
    * per batch (and dead-lettered under `deadRoot/_unmatched_relid` when a
    * deadRoot is set) — unlike the single-table loop, where other tables'
    * DML is explicitly out of scope, a multi-table spec NAMES the full
    * intended capture set, so unmatched DML here usually means a typo'd
    * table name silently losing a whole table's changes while its LSN
    * still advances via control frames. Broken frames reach EVERY table's
    * dead-letter (loud beats lost).
    */
  def mirrorFramesMulti(frames: DataFrame, dataCol: String,
                        tables: Seq[TableSpec], targetDir: String,
                        checkpointDir: String,
                        deadRoot: Option[String] = None,
                        trigger: Trigger = Trigger.AvailableNow(),
                        healToast: Boolean = true): StreamingQuery = {
    require(tables.nonEmpty, "mirrorFramesMulti needs at least one table")
    require(tables.map(_.table).distinct.size == tables.size,
      s"duplicate table names in ${tables.map(_.table)}")
    val spark = frames.sparkSession
    frames.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val tagged = PgOutput.tagRelids(batch, dataCol)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            // name → relids: the batch's own Relation frames (one small
            // collect over the pinned tagged batch) + each persisted
            // registry (pgoutput re-describes a relation only on change
            // or reconnect — bare-DML batches resolve via the registry)
            val batchPairs = tagged.where(col("rel_name").isNotNull)
              .select(col("rel_name"), element_at(col("relids"), 1).as("relid"))
              .distinct().collect()
              .map(r => (r.getString(0), r.getInt(1)))
            import scala.concurrent.{Await, ExecutionContext, Future}
            implicit val ec: ExecutionContext = ExecutionContext.global
            val perTable = tables.map { t =>
              t -> (batchPairs.collect { case (n, r) if n == t.table => r } ++
                readRegistry(spark, targetDir, t.table).map(_.relid)).toSet
            }
            // misconfiguration tripwire: DML whose relid matches NO
            // configured table would otherwise vanish while the LSN still
            // advances — count it, log it, and dead-letter it when a dead
            // root exists (its own subdir: the reason schema differs from
            // the parse dead-letter's)
            val allRelids = perTable.flatMap(_._2).toSet
            val unmatched = tagged.where(col("rel_name").isNull &&
              size(col("relids")) > 0 &&
              (if (allRelids.isEmpty) lit(true)
               else !arrays_overlap(col("relids"),
                 lit(allRelids.toArray.sorted))))
            val nUnmatched = unmatched.count()
            if (nUnmatched > 0) {
              System.err.println(s"[mirrorFramesMulti] batch $batchId: " +
                s"$nUnmatched DML frame(s) match no configured table " +
                s"(configured: ${tables.map(_.table).mkString(",")}) — " +
                "check the table specs for typos" +
                deadRoot.fold("")(d => s"; dead-lettered under $d/_unmatched_relid"))
              deadRoot.foreach { d =>
                unmatched
                  .select(col(dataCol), col("relids"),
                    lit("unmatched_relid").as("_reason"),
                    lit(batchId).as("_batch_id"))
                  .write.mode("append").parquet(s"$d/_unmatched_relid")
              }
            }
            val work = perTable.map { case (t, relids) =>
              if (relids.isEmpty)
                // never-described table: no frames can be its, and parse
                // (rightly) refuses to run without a Relation — its LSN
                // simply doesn't advance this batch, the safe direction
                Future.successful(())
              else {
                val subset = tagged
                  .where(size(col("relids")) === 0 ||
                    arrays_overlap(col("relids"), lit(relids.toArray.sorted)))
                  .select(col(dataCol))
                Future(syncTableBatch(spark, subset, dataCol, t.table, t.keys,
                  s"$targetDir/${t.table}",
                  deadRoot.map(d => s"$d/${t.table}"), t.nBuckets,
                  healToast, batchId, stateDirOpt = Some(targetDir)))
              }
            }
            Await.result(Future.sequence(work),
              scala.concurrent.duration.Duration.Inf)
            ()
          } finally tagged.unpersist(false)
        }
      }
      .start()
  }

  /** One table's batch sync — the body both capture loops share: parse,
    * dead-letter, TOAST heal, truncate tombstones, mirror upsert, registry
    * write, then (only when nothing was lost) the confirmed-flush LSN
    * advance. `batch` carries this table's frames plus the stream's
    * transaction-control frames.
    */
  private[graft] def syncTableBatch(spark: SparkSession, batch: DataFrame,
                                    dataCol: String, table: String,
                                    keys: Seq[String], targetDir: String,
                                    deadDir: Option[String], nBuckets: Int,
                                    healToast: Boolean, batchId: Long,
                                    stateDirOpt: Option[String] = None): Unit = {
        {
          // single-table loop: registry + LSN live beside the mirror;
          // multi-table: they share the ROOT (one registry store for the
          // stream) while each table's mirror lives in its own subdir
          val stateDir = stateDirOpt.getOrElse(targetDir)
          val prior = readRegistry(spark, stateDir, table)
          val parsed = PgOutput.parse(batch, dataCol, table, prior)
          deadDir.foreach { d =>
            val dead = parsed.deadLetter.withColumn("_batch_id", lit(batchId))
            if (!parsed.deadLetter.isEmpty)
              dead.write.mode("append").parquet(d)
          }
          // unchanged-TOAST repair against earlier same-batch rows + the
          // committed mirror's newest image — BEFORE the upsert, so the
          // mirror only ever stores healed rows (a toasted null must not
          // win the FINAL merge over the real prior value)
          val healedChanges =
            if (!healToast) parsed.changes
            else PgOutput.healUnchangedToast(parsed.changes, keys,
              mirror = if (CdcStream.hasVisibleParquet(spark, targetDir))
                Some(graft.sources.SyncManifest.readCommitted(spark, targetDir))
              else None)
          val batchDf = healedChanges
            .withColumn("is_deleted", col("_is_deleted"))
            .withColumn("_batch_id", lit(batchId))
          // committed TRUNCATE: no per-key tombstones exist on the wire, so
          // synthesize them — every key the committed mirror holds below
          // the truncate LSN gets a tombstone AT that LSN (a same-batch
          // reinsert carries a higher LSN and wins the FINAL merge), and
          // batch changes at-or-below it are wiped history. Replay-safe:
          // regenerated tombstones upsert idempotently, and keys already
          // at-or-past the LSN are untouched by the newest-version merge.
          val upserts = parsed.truncates match {
            case Nil => batchDf
            case ts =>
              val lsn = ts.map(_.walStart).max
              val survivors = PgOutput.applyTruncates(batchDf, ts)
              if (!CdcStream.hasVisibleParquet(spark, targetDir)) survivors
              else {
                val tomb = graft.sources.SyncManifest
                  .readCommitted(spark, targetDir)
                  .where(col("_version") <= lsn)
                  .select(keys.map(col) ++ Seq(
                    lit(lsn).as("_version"), lit(true).as("_is_deleted"),
                    lit(true).as("is_deleted"),
                    lit(table).as("_source_table"),
                    lit(batchId).as("_batch_id")): _*)
                survivors.unionByName(tomb, allowMissingColumns = true)
              }
          }
          CdcStream.upsertBatch(spark, upserts,
            keys, "_version", targetDir, nBuckets)
          writeRegistry(spark, stateDir, table, parsed.relations)
          // feedback bookkeeping LAST (after the mirror + registry are
          // durable): the confirmed-flush LSN advances to the batch's max
          // frame walEnd, but ONLY when nothing was lost — dead-lettered
          // frames count as landed only if deadDir persisted them. A crash
          // between the mirror commit and this write re-acks the OLD
          // (lower) LSN on restart: the server resends the tail and the
          // replay-idempotent upsert converges — never the reverse
          // (acking WAL that never landed).
          // Gate on frame-COUNT emptiness, not on the max-walEnd peek:
          // frameWalEnd returns None for frames shorter than 9 bytes or
          // with an outer tag other than w/k, so a batch whose only dead
          // frames are peekless would pass a peek-based guard and let the
          // confirmed-flush LSN advance past WAL that landed nowhere.
          val deadSafe = deadDir.isDefined || parsed.deadLetter.isEmpty
          if (deadSafe)
            PgOutput.maxFrameWalEnd(batch, dataCol)
              .foreach(advanceConfirmedLsn(spark, stateDir, table, _))
        }
  }

  // ── replication-slot feedback (Standby Status Update bookkeeping) ────

  private def confirmedLsnPath(targetDir: String, table: String) =
    new Path(targetDir, s"_pg_confirmed_lsn_$table.bin")

  /** The confirmed-flush LSN this mirror can safely report to the server
    * (0 = nothing confirmed yet). Durable across restarts — the value the
    * resumed capture loop's first Standby Status Update carries, which is
    * where the server resumes the slot.
    */
  def readConfirmedLsn(spark: SparkSession, targetDir: String,
                       table: String): Long = {
    val p = confirmedLsnPath(targetDir, table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0L
    val in = fs.open(p)
    try in.readLong() finally in.close()
  }

  /** Monotonically advance the confirmed-flush LSN (temp+rename, same
    * crash contract as the registry). Re-acking an already-confirmed LSN
    * is a no-op — the crash-replay path re-processes a batch whose LSN was
    * already confirmed and must not regress or churn the file.
    *
    * @return true when the stored LSN actually advanced
    */
  def advanceConfirmedLsn(spark: SparkSession, targetDir: String,
                          table: String, lsn: Long): Boolean = {
    val current = readConfirmedLsn(spark, targetDir, table)
    if (lsn <= current) return false
    val dst = confirmedLsnPath(targetDir, table)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = dst.suffix(".tmp")
    val out = fs.create(tmp, true)
    try out.writeLong(lsn) finally out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst)) throw new java.io.IOException(s"rename $tmp -> $dst failed")
    true
  }

  /** The Standby Status Update this mirror should send right now: all
    * three LSNs report the durable confirmed-flush position (the
    * conservative single-position form — the mirror applies at commit, so
    * written = flushed = applied).
    */
  def feedback(spark: SparkSession, targetDir: String, table: String,
               clientTsMicros: Long,
               replyRequested: Boolean = false): Array[Byte] = {
    val lsn = readConfirmedLsn(spark, targetDir, table)
    PgOutput.standbyStatusUpdate(PgOutput.StandbyStatus(
      lsn, lsn, lsn, clientTsMicros, replyRequested))
  }

  /** The socket loop's per-frame reply contract: a server keepalive with
    * the reply-requested bit set (the server's liveness deadline — unmet,
    * it drops the connection) MUST be answered immediately with the
    * current status; every other frame needs no inline reply (the loop
    * acks in batch cadence via [[feedback]] after each commit).
    */
  def replyTo(frame: Array[Byte], spark: SparkSession, targetDir: String,
              table: String, clientTsMicros: Long): Option[Array[Byte]] =
    PgOutput.decodeFrame(frame) match {
      case Right(PgOutput.Keepalive(_, _, true)) =>
        Some(feedback(spark, targetDir, table, clientTsMicros))
      case _ => None
    }

  /** The mirror's FINAL read: newest LSN per key, soft-deletes dropped. */
  def readFinal(spark: SparkSession, targetDir: String, keys: Seq[String]): DataFrame =
    graft.operators.CdcOps.softDeleteSnapshot(
      graft.sources.SyncManifest.readCommitted(spark, targetDir),
      keys, "_version", col("is_deleted"))

  /** The initial-load→CDC handoff — PeerDB's snapshot phase for the frame
    * path: seed the mirror from a snapshot read pinned at the slot's
    * consistent point (the LSN `CREATE_REPLICATION_SLOT` reports; its
    * exported snapshot is what `snapshot` should have been read under),
    * then stream from EXACTLY there. Every snapshot row lands versioned
    * AT `consistentLsn`; every post-snapshot WAL commit carries a higher
    * LSN, so its image wins the FINAL merge — updates and deletes of
    * snapshot rows apply, and re-sent WAL the snapshot already contains
    * converges idempotently.
    *
    * Crash contract: the mirror commit lands BEFORE the confirmed-flush
    * LSN file. A crash between the two leaves `readConfirmedLsn` at 0 —
    * the recovery path is to re-run bootstrap (the upsert replays the
    * same rows at the same version and converges; `advanceConfirmedLsn`
    * is monotone) and only then start the socket loop, which handshakes
    * at the consistent point. Never the reverse order: an LSN written
    * first would let a crash skip the snapshot entirely while the server
    * believes it delivered.
    */
  def bootstrapSnapshot(spark: SparkSession, snapshot: DataFrame,
                        keys: Seq[String], consistentLsn: Long,
                        targetDir: String, table: String,
                        nBuckets: Int = 16): Unit = {
    require(consistentLsn > 0, s"bad consistent point $consistentLsn")
    val confirmed = readConfirmedLsn(spark, targetDir, table)
    require(confirmed == 0L || confirmed == consistentLsn,
      s"mirror at $targetDir already confirmed ${confirmed} — bootstrap " +
        "would rewind an active capture; use a fresh target or resume the " +
        "stream instead")
    val seeded = snapshot
      .withColumn("_version", lit(consistentLsn))
      .withColumn("is_deleted", lit(false))
      .withColumn("_source_table", lit(table))
    CdcStream.upsertBatch(spark, seeded, keys, "_version", targetDir,
      nBuckets)
    advanceConfirmedLsn(spark, targetDir, table, consistentLsn)
  }

  private def registryPath(targetDir: String, table: String) =
    new Path(targetDir, s"_pg_relations_$table.bin")

  /** Load the persisted relation registry (empty on first batch). Frames
    * that fail to decode throw — a corrupt registry must stop the capture
    * loop loudly, not silently decode rows under a wrong schema.
    */
  def readRegistry(spark: SparkSession, targetDir: String,
                   table: String): Seq[RelationAt] = {
    val p = registryPath(targetDir, table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    val in = fs.open(p)
    val bytes =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](64 * 1024)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toByteArray
      } finally in.close()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = Seq.newBuilder[RelationAt]
    while (bb.remaining() >= 4) {
      val len = bb.getInt
      require(len > 0 && len <= bb.remaining(), s"corrupt registry $p")
      val frame = new Array[Byte](len)
      bb.get(frame)
      PgOutput.decodeFrame(frame) match {
        case Right(XLogData(walStart, _, _, Relation(relid, _, name, _, cols)))
          if name == table => out += RelationAt(walStart, relid, cols)
        case other => throw new IllegalStateException(
          s"corrupt registry $p: unexpected entry $other")
      }
    }
    out.result()
  }

  private def writeRegistry(spark: SparkSession, targetDir: String,
                            table: String, rels: Seq[RelationAt]): Unit = {
    val dst = registryPath(targetDir, table)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = dst.suffix(".tmp")
    val out = fs.create(tmp, true)
    try {
      val bb = new java.io.DataOutputStream(out)
      rels.sortBy(_.walStart).foreach { r =>
        val frame = PgOutput.Fixture.relation(r.walStart, r.relid, "", table, r.cols)
        bb.writeInt(frame.length)
        bb.write(frame)
      }
      bb.flush()
    } finally out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst)) throw new java.io.IOException(s"rename $tmp -> $dst failed")
  }
}
