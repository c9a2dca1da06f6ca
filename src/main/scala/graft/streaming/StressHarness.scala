package graft.streaming

import graft.sources.Incremental
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Churn/stress harness — the reference's load-generation + analysis
  * surface re-expressed as a library: `insert.ps1` drives seeded batches of
  * row operations against the live source while the CDC pipeline replicates
  * them, logging per-batch duration/throughput (insert.ps1:10-14 params
  * `RecordCount`/`BatchSize`/`DelayBetweenBatches`; :259-343 the batch loop
  * with per-batch ms + running success/failed counts; :345-390 the summary
  * with ops/sec and avg/min/max batch time), and the monitor's
  * `Get-CDCOperationsAnalysis` (peerdb_psql_clickhouse_monitor.ps1:796-851)
  * reconciles the generator's own op accounting against live source/target
  * counts and the sync difference.
  *
  * graft's version goes one step further than the reference: the generator
  * maintains an exact in-memory REFERENCE STATE (key → newest row) of what
  * the source must contain after every committed batch, so a stress run is
  * also a CORRECTNESS check — the mirror's FINAL read must equal the
  * generator's reference state bit-for-bit, not just match a row count.
  * The reference's script can only compare counts (monitor.ps1:840
  * `$syncDiff = $sourceCount - $targetCount`); a count can match while rows
  * are wrong.
  *
  * == Determinism ==
  * The op sequence is a pure function of ([[ChurnConfig.seed]], config):
  * one `java.util.Random` drawn in a fixed order decides each op's type,
  * target key, and payload. Re-running the same config replays the same
  * workload — the property that makes a stress regression bisectable.
  * A FAILED batch rolls the RNG back along with the reference state, so
  * the very next [[ChurnGenerator.runBatch]] regenerates the identical
  * ops (a deterministic retry); note that [[ChurnConfig.recordCount]]
  * counts ATTEMPTED ops — a permanently failing batch consumes its slice
  * of the budget rather than looping forever (failures land in the
  * per-batch stats and [[ChurnGenerator.failures]]).
  *
  * == Scale posture ==
  * The generator itself is driver-side JDBC by design — it IMPERSONATES the
  * OLTP application (exactly like insert.ps1's psql loop), it is not a data
  * path. The data path under test (snapshot/poll/reconcile/sink) is the
  * distributed mirror machinery; the reference state is bounded by the live
  * key count of the driven table (a test-sized workload), never corpus
  * scale.
  */
final case class ChurnConfig(
    table: String,
    recordCount: Int = 5000,
    batchSize: Int = 500,
    delayBetweenBatchesMs: Long = 0L,
    insertWeight: Int = 8,
    updateWeight: Int = 1,
    deleteWeight: Int = 1,
    seed: Long = 42L) {
  require(table.nonEmpty, "table must be non-empty")
  require(recordCount > 0, s"recordCount must be positive, got $recordCount")
  require(batchSize > 0, s"batchSize must be positive, got $batchSize")
  require(insertWeight > 0, "insertWeight must be positive (a churn run " +
    "that can never insert has nothing to update or delete)")
  require(updateWeight >= 0 && deleteWeight >= 0, "op weights must be >= 0")
}

/** One committed generator batch — the per-batch line of the stress log
  * (insert.ps1:324 "Batch N completed: rows, ms, Total Success, Total
  * Failed").
  */
final case class ChurnBatchStat(batch: Int, inserts: Long, updates: Long,
                                deletes: Long, failed: Long, durationMs: Long) {
  def ops: Long = inserts + updates + deletes
  def rowsPerSec: Double =
    if (durationMs <= 0) ops.toDouble * 1000.0 else ops * 1000.0 / durationMs
}

/** One drawn churn op — the transport-agnostic workload unit shared by
  * the JDBC generator ([[ChurnGenerator]], the insert.ps1 impersonation)
  * and the pgoutput-frame generator ([[FrameChurnGenerator]], the
  * replication-slot impersonation): one seed → one op stream → two
  * transports, so the two paths' final states are comparable row for row.
  */
sealed trait ChurnOp extends Serializable
object ChurnOp {
  final case class Insert(key: Long, seq: Long, qty: Int, payload: String)
    extends ChurnOp
  final case class Update(key: Long, seq: Long, qty: Int, payload: String)
    extends ChurnOp
  final case class Delete(key: Long) extends ChurnOp
}

/** The seeded churn state machine both generators share: the RNG, the
  * live-key set, the exact in-memory reference state, and the monotone
  * key/version sequences. [[drawOps]] mutates the state as it draws (an
  * update targets a key chosen among the keys live at that instant);
  * [[snapshot]]/[[restore]] give the transports batch-atomic rollback —
  * including the RNG position, so a failed batch's retry draws the
  * identical ops (r17 advice).
  */
private[streaming] final class ChurnState(cfg: ChurnConfig) {
  private var rng = new java.util.Random(cfg.seed)
  private[streaming] val live = mutable.ArrayBuffer.empty[Long]
  private[streaming] val state = mutable.LongMap.empty[(Long, Int, String)]
  private var nextKey = 1L
  private var nextSeq = 1L
  private val totalW = cfg.insertWeight + cfg.updateWeight + cfg.deleteWeight

  def maxSeq: Long = nextSeq - 1

  final class Snapshot private[ChurnState] (
      private[ChurnState] val live0: mutable.ArrayBuffer[Long],
      private[ChurnState] val state0: mutable.LongMap[(Long, Int, String)],
      private[ChurnState] val key0: Long,
      private[ChurnState] val seq0: Long,
      private[ChurnState] val rng0: java.util.Random)

  def snapshot(): Snapshot = {
    val rngCopy = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(rng); oos.close()
      new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
        .readObject().asInstanceOf[java.util.Random]
    }
    new Snapshot(live.clone(), state.clone(), nextKey, nextSeq, rngCopy)
  }

  def restore(s: Snapshot): Unit = {
    live.clear(); live ++= s.live0
    state.clear(); s.state0.foreach { case (k, v) => state(k) = v }
    nextKey = s.key0; nextSeq = s.seq0; rng = s.rng0
  }

  /** Highest version among LIVE rows (0 when empty) — what a capture can
    * actually reach: a deleted row's higher seq is invisible forever. */
  def maxLiveSeq: Long =
    if (state.isEmpty) 0L else state.valuesIterator.map(_._1).max

  /** Draw `n` ops, advancing the reference state with each draw. */
  def drawOps(n: Int): Seq[ChurnOp] = {
    val ops = Seq.newBuilder[ChurnOp]
    var i = 0
    while (i < n) {
      val draw = rng.nextInt(totalW)
      val qty = 1 + rng.nextInt(100)
      val seq = nextSeq; nextSeq += 1
      if (draw < cfg.insertWeight || live.isEmpty) {
        val k = nextKey; nextKey += 1
        val payload = s"p${k}_$seq"
        ops += ChurnOp.Insert(k, seq, qty, payload)
        live += k; state(k) = (seq, qty, payload)
      } else if (draw < cfg.insertWeight + cfg.updateWeight) {
        val k = live(rng.nextInt(live.size))
        val payload = s"u${k}_$seq"
        ops += ChurnOp.Update(k, seq, qty, payload)
        state(k) = (seq, qty, payload)
      } else {
        val idx = rng.nextInt(live.size)
        val k = live(idx)
        live(idx) = live.last; live.remove(live.size - 1) // swap-remove
        ops += ChurnOp.Delete(k)
        state.remove(k)
      }
      i += 1
    }
    ops.result()
  }

  /** The reference state as a DataFrame (id, seq, qty, payload). */
  def expectedFinal(spark: SparkSession): DataFrame = {
    val rows = state.toSeq.map { case (k, (seq, qty, payload)) =>
      Row(k, seq, qty, payload)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("id", LongType), StructField("seq", LongType),
        StructField("qty", IntegerType), StructField("payload", StringType))))
  }
}

/** What the stress analysis needs from a workload generator, whatever its
  * transport (JDBC statements or pgoutput frames). */
trait ChurnSource {
  def cfg: ChurnConfig
  def batchStats: Seq[ChurnBatchStat]
  def failures: Seq[String]
  def maxSeq: Long
  def liveRows: Long
  def expectedFinal(spark: SparkSession): DataFrame
}

/** Seeded mixed-op workload generator against a live JDBC source table.
  * The table must have the harness schema: `id BIGINT PRIMARY KEY,
  * seq BIGINT NOT NULL, qty INT, payload VARCHAR` (the reference's
  * `orders(id, order_date, purchaser, quantity, product_id)` shape reduced
  * to what the CDC contract needs: a key, a monotone version, payload).
  * Keys are never reused; every op takes the next version from one
  * monotone sequence, so watermark polling captures every surviving image
  * and the hard-delete sweep reconciles the rest.
  */
final class ChurnGenerator(url: String, val cfg: ChurnConfig)
    extends ChurnSource {

  private val churn = new ChurnState(cfg)
  private var batchNo = 0
  private var generated = 0L
  private val stats = mutable.ArrayBuffer.empty[ChurnBatchStat]
  private val errors = mutable.ArrayBuffer.empty[String]

  /** Ops generated so far — counts ATTEMPTED ops (a failed batch consumes
    * its slice of the budget; see the determinism note in the class doc).
    */
  def generatedOps: Long = generated
  def batchStats: Seq[ChurnBatchStat] = stats.toSeq
  def failures: Seq[String] = errors.toSeq
  /** Highest version handed out — the watermark the capture must reach. */
  def maxSeq: Long = churn.maxSeq
  /** Live rows the source must contain right now. */
  def liveRows: Long = churn.state.size.toLong

  /** Generate and commit ONE batch of up to `cfg.batchSize` ops (fewer on
    * the final partial batch), in generation order over one JDBC statement
    * batch. Returns the batch's stat line. A failed commit counts the whole
    * batch as failed (insert.ps1:302-307's accounting) and rolls the
    * reference state back — the source didn't change, so neither must the
    * expectation.
    */
  def runBatch(): ChurnBatchStat = {
    require(generated < cfg.recordCount, "workload already fully generated")
    batchNo += 1
    val n = math.min(cfg.batchSize.toLong, cfg.recordCount - generated).toInt
    // snapshot for rollback on a failed commit — INCLUDING the RNG
    // position: without it a failed batch desynced the draw stream from
    // the documented same-seed-same-workload contract (r17 advice), and a
    // retry of the batch drew different ops than the ones that failed
    val pre = churn.snapshot()
    val ops = churn.drawOps(n)
    val sqls = mutable.ArrayBuffer.empty[String]
    var (ins, upd, del) = (0L, 0L, 0L)
    // consecutive inserts coalesce into ONE multi-row INSERT (order within
    // the batch is preserved — only adjacent inserts merge). This is the
    // reference's own statement shape (insert.ps1:289-292 builds one
    // VALUES (...), (...) statement per batch) and what lets the apply
    // side clear its ~900 rows/s anchor instead of paying per-statement
    // round-trip cost per row.
    val pendingInserts = mutable.ArrayBuffer.empty[String]
    def flushInserts(): Unit = if (pendingInserts.nonEmpty) {
      sqls += s"INSERT INTO ${cfg.table} VALUES ${pendingInserts.mkString(", ")}"
      pendingInserts.clear()
    }
    ops.foreach {
      case ChurnOp.Insert(k, seq, qty, payload) =>
        pendingInserts += s"($k, $seq, $qty, '$payload')"; ins += 1
      case ChurnOp.Update(k, seq, qty, payload) =>
        flushInserts()
        sqls += s"UPDATE ${cfg.table} SET seq = $seq, qty = $qty, " +
          s"payload = '$payload' WHERE id = $k"
        upd += 1
      case ChurnOp.Delete(k) =>
        flushInserts()
        sqls += s"DELETE FROM ${cfg.table} WHERE id = $k"
        del += 1
    }
    flushInserts()
    val t0 = System.nanoTime()
    val stat = try {
      // one transaction per batch: a failed batch must leave the source
      // UNCHANGED so the rolled-back reference state stays truthful
      // (insert.ps1's multi-row INSERT is atomic for the same reason)
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        conn.setAutoCommit(false)
        try {
          val st = conn.createStatement()
          try { sqls.foreach(st.addBatch); st.executeBatch() }
          finally st.close()
          conn.commit()
        } catch { case e: Exception => conn.rollback(); throw e }
      } finally conn.close()
      ChurnBatchStat(batchNo, ins, upd, del, 0L,
        (System.nanoTime() - t0) / 1000000L)
    } catch { case e: Exception =>
      // the source didn't change: restore the expectation (including the
      // RNG position — the retry draws the identical ops), count failures
      churn.restore(pre)
      errors += s"batch $batchNo: ${e.getMessage}"
      ChurnBatchStat(batchNo, 0L, 0L, 0L, n.toLong,
        (System.nanoTime() - t0) / 1000000L)
    }
    generated += n
    stats += stat
    stat
  }

  def hasMore: Boolean = generated < cfg.recordCount

  /** The generator's reference state as a DataFrame — what the mirror's
    * FINAL read must equal after the pipeline converges.
    */
  def expectedFinal(spark: SparkSession): DataFrame = churn.expectedFinal(spark)

  /** Per-batch stat lines as a DataFrame (the stress log's batch table). */
  def batchFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    stats.toSeq.toDF()
  }
}

/** The REPLICATION-SLOT dual of [[ChurnGenerator]]: the same seeded op
  * stream rendered as pgoutput FRAMES (the [[graft.sources.PgOutput
  * .Fixture]] writer — the decode path's dual) and landed as parquet files
  * of raw frame bytes — a synthetic stand-in for the slot socket that is
  * the reference's PRODUCTION transport (docker-compose.yml:21-28 wires
  * PeerDB to a pgoutput publication; insert.ps1 churns against that path,
  * while the JDBC generator impersonates only the polling lane). Each
  * batch is one transaction — Begin, the DML images in generation order,
  * Commit, all at monotone LSNs — written as ONE parquet file under
  * `landingDir`; [[MirrorRunner.runFrames]] over a file `readStream` of
  * that directory is the capture side. The first batch carries the
  * Relation frame; later batches are bare DML resolving through the
  * persisted registry, exactly like a reconnected slot. Same seed ⇒ same
  * final state as the JDBC generator, row for row (spec-pinned).
  */
final class FrameChurnGenerator(spark: SparkSession, val cfg: ChurnConfig,
                                val landingDir: String,
                                relid: Int = 4242,
                                namespace: String = "public")
    extends ChurnSource {
  import graft.sources.PgOutput.{Fixture, RelCol, VNull, VText}

  private val churn = new ChurnState(cfg)
  private var batchNo = 0
  private var generated = 0L
  private var lsn = 10L
  private var relationSent = false // true once a landed batch carried it
  private val stats = mutable.ArrayBuffer.empty[ChurnBatchStat]
  private val errors = mutable.ArrayBuffer.empty[String]

  private val relCols = Seq(
    RelCol("id", 20, -1, isKey = true), RelCol("seq", 20, -1, isKey = false),
    RelCol("qty", 23, -1, isKey = false),
    RelCol("payload", 25, -1, isKey = false))

  def generatedOps: Long = generated
  def batchStats: Seq[ChurnBatchStat] = stats.toSeq
  def failures: Seq[String] = errors.toSeq
  def maxSeq: Long = churn.maxSeq
  def maxLiveSeq: Long = churn.maxLiveSeq
  def liveRows: Long = churn.state.size.toLong
  def expectedFinal(spark: SparkSession): DataFrame = churn.expectedFinal(spark)
  def hasMore: Boolean = generated < cfg.recordCount

  /** Generate ONE transaction of up to `cfg.batchSize` ops and land it as
    * one parquet frame file. A failed landing write rolls the reference
    * state (and RNG) back, same contract as the JDBC generator's failed
    * commit — the lake didn't change, so neither must the expectation.
    */
  def runBatch(): ChurnBatchStat = {
    require(generated < cfg.recordCount, "workload already fully generated")
    batchNo += 1
    val n = math.min(cfg.batchSize.toLong, cfg.recordCount - generated).toInt
    val pre = churn.snapshot()
    val preLsn = lsn
    val ops = churn.drawOps(n)
    var (ins, upd, del) = (0L, 0L, 0L)
    val ts = 1700000000000000L + batchNo * 1000000L
    val xid = 1000L + batchNo
    val frames = mutable.ArrayBuffer.empty[Array[Byte]]
    if (!relationSent)
      frames += Fixture.relation(lsn, relid, namespace, cfg.table, relCols)
    val base = lsn
    val commitLsn = base + n + 1
    frames += Fixture.begin(base, commitLsn, ts, xid)
    ops.zipWithIndex.foreach { case (op, i) =>
      val at = base + 1 + i
      op match {
        case ChurnOp.Insert(k, seq, qty, payload) =>
          frames += Fixture.insert(at, relid, Seq(VText(k.toString),
            VText(seq.toString), VText(qty.toString), VText(payload)))
          ins += 1
        case ChurnOp.Update(k, seq, qty, payload) =>
          frames += Fixture.update(at, relid, Seq(VText(k.toString),
            VText(seq.toString), VText(qty.toString), VText(payload)))
          upd += 1
        case ChurnOp.Delete(k) =>
          frames += Fixture.delete(at, relid,
            Seq(VText(k.toString), VNull, VNull, VNull))
          del += 1
      }
    }
    frames += Fixture.commit(commitLsn, commitLsn, commitLsn + 1, ts)
    lsn = commitLsn + 2
    val t0 = System.nanoTime()
    val stat = try {
      val rows = frames.toSeq.map(b => Row(b: Any))
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
          StructType(Seq(StructField("data", BinaryType))))
        .write.mode("append").parquet(landingDir)
      relationSent = true
      ChurnBatchStat(batchNo, ins, upd, del, 0L,
        (System.nanoTime() - t0) / 1000000L)
    } catch { case e: Exception =>
      churn.restore(pre)
      lsn = preLsn
      errors += s"batch $batchNo: ${e.getMessage}"
      ChurnBatchStat(batchNo, 0L, 0L, 0L, n.toLong,
        (System.nanoTime() - t0) / 1000000L)
    }
    generated += n
    stats += stat
    stat
  }
}

object StressHarness {

  /** The monitor's operations-analysis row (monitor.ps1:830-845: op
    * breakdown, source vs target counts, sync difference, failed ops) plus
    * graft's throughput accounting (insert.ps1:364-367 ops/sec; :369-376
    * avg/min/max batch ms) and the end-to-end number the reference's stress
    * logs report per run.
    */
  final case class OperationsAnalysis(
      table: String,
      inserts: Long, updates: Long, deletes: Long, failedOps: Long,
      sourceRows: Long, mirrorRows: Long, sinkRows: Option[Long],
      syncDifference: Long,
      sourceMaxSeq: Long, mirrorWatermark: Long, versionLag: Long,
      applyRowsPerSec: Double,     // source-side: ops / Σ batch time
      endToEndRowsPerSec: Double,  // ops / wall-clock incl. capture rounds
      avgBatchMs: Double, minBatchMs: Long, maxBatchMs: Long) {
    def converged: Boolean = syncDifference == 0L && versionLag == 0L
  }

  final case class StressResult(gen: ChurnSource,
                                batches: Seq[ChurnBatchStat],
                                analysis: OperationsAnalysis,
                                wallMs: Long,
                                resources: Map[String, Long] = Map.empty) {
    /** The stress log's summary block, rendered (insert.ps1:345-390), with
      * the resource-usage totals the reference logs per run
      * (insert.ps1:180-257 `Write-ResourceUsage`, via [[ResourceMonitor]]
      * instead of `docker stats`).
      */
    def report: String = {
      val a = analysis
      val ops = a.inserts + a.updates + a.deletes
      val res = if (resources.isEmpty) "" else
        "\n  Engine Resources: " + resources.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
      f"""CDC STRESS TEST RESULTS — ${a.table}
         |  Total Operations: $ops%d (I=${a.inserts}%d U=${a.updates}%d D=${a.deletes}%d, failed=${a.failedOps}%d)
         |  Source Rows: ${a.sourceRows}%d | Mirror Rows: ${a.mirrorRows}%d | Sync Difference: ${a.syncDifference}%d
         |  Version Watermark: source=${a.sourceMaxSeq}%d mirror=${a.mirrorWatermark}%d lag=${a.versionLag}%d
         |  Apply Throughput: ${a.applyRowsPerSec}%.1f ops/s | End-to-End: ${a.endToEndRowsPerSec}%.1f ops/s
         |  Batch Time: avg=${a.avgBatchMs}%.1f ms min=${a.minBatchMs}%d ms max=${a.maxBatchMs}%d ms
         |  Wall Clock: ${wallMs / 1000.0}%.2f s""".stripMargin + res
    }
  }

  /** Drive a full seeded workload against `runner`'s source while the
    * mirror syncs: every `syncEveryBatches` generator batches runs one
    * capture round (the reference's pipeline replicating DURING load, not
    * after), then a final round (plus reconcile when configured) converges
    * the tail. Returns per-batch stats + the operations analysis. The
    * workload table must be one of the runner's configured tables.
    */
  def run(spark: SparkSession, sourceUrl: String, churn: ChurnConfig,
          runner: MirrorRunner, syncEveryBatches: Int = 5,
          props: java.util.Properties = new java.util.Properties()): StressResult = {
    require(syncEveryBatches > 0, s"bad syncEveryBatches $syncEveryBatches")
    require(runner.cfg.tables.exists(_.name == churn.table),
      s"table ${churn.table} is not configured in mirror ${runner.cfg.mirror}")
    val gen = new ChurnGenerator(sourceUrl, churn)
    // the Write-ResourceUsage analog: per-stage task/CPU/shuffle/spill
    // accounting over the run's engine work (the reference samples docker
    // stats per batch; the engine-side equivalent is the stage ledger)
    val res = ResourceMonitor.attach(spark)
    val t0 = System.nanoTime()
    try {
      var b = 0
      while (gen.hasMore) {
        gen.runBatch()
        b += 1
        if (b % syncEveryBatches == 0) runner.runOnce()
        if (churn.delayBetweenBatchesMs > 0 && gen.hasMore)
          Thread.sleep(churn.delayBetweenBatchesMs)
      }
      runner.runOnce() // converge the tail (poll + reconcile when configured)
      val wallMs = (System.nanoTime() - t0) / 1000000L
      StressResult(gen, gen.batchStats,
        analyze(spark, sourceUrl, gen, runner, wallMs, props), wallMs,
        resources = res.totals)
    } finally spark.sparkContext.removeSparkListener(res)
  }

  /** The FRAME-PATH twin of [[run]]: the same seeded workload rendered as
    * pgoutput frames through [[FrameChurnGenerator]] and captured by
    * [[MirrorRunner.runFrames]] — the reference's PRODUCTION transport
    * (the replication slot, docker-compose.yml:21-28), where [[run]]
    * covers the JDBC polling lane. Every `syncEveryBatches` generator
    * transactions one AvailableNow capture round drains the landed
    * frames; a final round converges the tail. Same row-for-row
    * reference-state guarantee (callers assert `gen.expectedFinal`
    * equality against [[MirrorRunner.readFramesFinal]] — see StressSpec).
    */
  def runFrames(spark: SparkSession, churn: ChurnConfig,
                runner: MirrorRunner,
                syncEveryBatches: Int = 5): StressResult = {
    require(syncEveryBatches > 0, s"bad syncEveryBatches $syncEveryBatches")
    require(runner.cfg.tables.exists(_.name == churn.table),
      s"table ${churn.table} is not configured in mirror ${runner.cfg.mirror}")
    val landingDir = s"${runner.cfg.targetDir}/frames_landing"
    // create up front (r18 advice): if every generator batch before the
    // first sync failed its landing write, the readStream below would
    // otherwise throw path-not-found and mask the generator failures
    val landingPath = new org.apache.hadoop.fs.Path(landingDir)
    landingPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .mkdirs(landingPath)
    val gen = new FrameChurnGenerator(spark, churn, landingDir)
    def frameStream: DataFrame = spark.readStream
      .schema(StructType(Seq(StructField("data", BinaryType))))
      .parquet(landingDir)
    val res = ResourceMonitor.attach(spark)
    val t0 = System.nanoTime()
    try {
      var b = 0
      while (gen.hasMore) {
        gen.runBatch()
        b += 1
        if (b % syncEveryBatches == 0)
          runner.runFrames(frameStream).awaitTermination()
        if (churn.delayBetweenBatchesMs > 0 && gen.hasMore)
          Thread.sleep(churn.delayBetweenBatchesMs)
      }
      runner.runFrames(frameStream).awaitTermination() // converge the tail
      val wallMs = (System.nanoTime() - t0) / 1000000L
      StressResult(gen, gen.batchStats,
        analyzeFrames(spark, gen, runner, wallMs), wallMs,
        resources = res.totals)
    } finally spark.sparkContext.removeSparkListener(res)
  }

  /** See [[MirrorRunner.nothingCapturedYet]] — shared with the production
    * audit verb, which hits the same mid-first-commit window.
    */
  private def nothingCapturedYet(
      e: org.apache.spark.sql.AnalysisException): Boolean =
    MirrorRunner.nothingCapturedYet(e)

  /** [[analyze]]'s frame-path twin: the generator IS the source (its
    * reference state is the live table), the mirror is the frame-path
    * namespace, and the version watermark is the mirror FINAL's max seq
    * against the highest LIVE source version.
    */
  def analyzeFrames(spark: SparkSession, gen: FrameChurnGenerator,
                    runner: MirrorRunner, wallMs: Long): OperationsAnalysis = {
    import org.apache.spark.sql.functions.{col, max}
    val table = gen.cfg.table
    // an absent mirror dir is "nothing captured yet", not an error — the
    // sustained sampler thread calls this WHILE the first capture round
    // races it (the r19 `analyze` fix, applied to the frame lane)
    val (mirrorRows, wm) =
      try {
        val fin = runner.readFramesFinal(table)
        val rows = fin.count()
        val w = fin.agg(max(col("seq"))).collect()(0) match {
          case r if r.isNullAt(0) => 0L
          case r => r.getLong(0)
        }
        (rows, w)
      } catch {
        case e: org.apache.spark.sql.AnalysisException
            if nothingCapturedYet(e) => (0L, 0L)
      }
    val sourceMaxSeq = gen.maxLiveSeq
    val stats = gen.batchStats
    val okStats = stats.filter(_.failed == 0L)
    val applyMs = math.max(1L, okStats.map(_.durationMs).sum)
    val ops = okStats.map(_.ops).sum
    OperationsAnalysis(
      table = table,
      inserts = okStats.map(_.inserts).sum,
      updates = okStats.map(_.updates).sum,
      deletes = okStats.map(_.deletes).sum,
      failedOps = stats.map(_.failed).sum,
      sourceRows = gen.liveRows, mirrorRows = mirrorRows, sinkRows = None,
      syncDifference = gen.liveRows - mirrorRows,
      sourceMaxSeq = sourceMaxSeq, mirrorWatermark = wm,
      versionLag = math.max(0L, sourceMaxSeq - wm),
      applyRowsPerSec = ops * 1000.0 / applyMs,
      endToEndRowsPerSec = ops * 1000.0 / math.max(1L, wallMs),
      avgBatchMs =
        if (okStats.isEmpty) 0.0
        else okStats.map(_.durationMs).sum.toDouble / okStats.size,
      minBatchMs = if (okStats.isEmpty) 0L else okStats.map(_.durationMs).min,
      maxBatchMs = if (okStats.isEmpty) 0L else okStats.map(_.durationMs).max)
  }

  /** The `Get-CDCOperationsAnalysis` analog over a finished (or paused)
    * workload: generator accounting vs live source count vs mirror FINAL
    * count vs (when a sink is configured) warehouse count, with version
    * watermark lag. Unlike the reference's count-only compare, callers
    * should ALSO assert `gen.expectedFinal` equality — see StressSpec.
    */
  def analyze(spark: SparkSession, sourceUrl: String, gen: ChurnGenerator,
              runner: MirrorRunner, wallMs: Long,
              props: java.util.Properties = new java.util.Properties()): OperationsAnalysis = {
    val table = gen.cfg.table
    val src = spark.read.jdbc(sourceUrl, table, props)
    val sourceRows = src.count()
    // the live source's max version — NOT the generator's handed-out max:
    // a row written with the highest seq and then deleted is invisible to
    // watermark capture forever (the hard-delete sweep reconciles the ROW;
    // no capture can advance past a version that no longer exists)
    val sourceMaxSeq = src.agg(org.apache.spark.sql.functions.max(
      org.apache.spark.sql.functions.col("SEQ"))).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    // an absent mirror dir is "nothing captured yet", not an error: the
    // convergence pollers (StressSpec's lagZero loops) call analyze WHILE
    // MirrorRunner.start's first round races them, and on a loaded box the
    // first capture commit can land after the first poll
    val mirrorRows =
      try runner.readFinal(table).count()
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if nothingCapturedYet(e) => 0L
      }
    val sinkRows = runner.cfg.sinkUrl.map { sink =>
      val target = runner.cfg.tables.find(_.name == table).get.target
      spark.read.jdbc(sink, target, props).count()
    }
    val wm = Incremental
      .readState(spark, s"${runner.cfg.targetDir}/$table")
      .map(_.watermark).getOrElse(0L)
    val stats = gen.batchStats
    val okStats = stats.filter(_.failed == 0L)
    val applyMs = math.max(1L, okStats.map(_.durationMs).sum)
    val ops = okStats.map(_.ops).sum
    OperationsAnalysis(
      table = table,
      inserts = okStats.map(_.inserts).sum,
      updates = okStats.map(_.updates).sum,
      deletes = okStats.map(_.deletes).sum,
      failedOps = stats.map(_.failed).sum,
      sourceRows = sourceRows, mirrorRows = mirrorRows, sinkRows = sinkRows,
      syncDifference = sourceRows - mirrorRows,
      sourceMaxSeq = sourceMaxSeq, mirrorWatermark = wm,
      versionLag = math.max(0L, sourceMaxSeq - wm),
      applyRowsPerSec = ops * 1000.0 / applyMs,
      endToEndRowsPerSec = ops * 1000.0 / math.max(1L, wallMs),
      avgBatchMs =
        if (okStats.isEmpty) 0.0
        else okStats.map(_.durationMs).sum.toDouble / okStats.size,
      minBatchMs = if (okStats.isEmpty) 0L else okStats.map(_.durationMs).min,
      maxBatchMs = if (okStats.isEmpty) 0L else okStats.map(_.durationMs).max)
  }

  /** The monitor's operation-statistics table as a frame: one row per op
    * type with generator count, mirror-side count, failed (monitor.ps1:832
    * `Write-TableHeader "Operation" "Source" "ClickHouse" "Failed"`).
    */
  def analysisFrame(spark: SparkSession, a: OperationsAnalysis): DataFrame = {
    import spark.implicits._
    Seq(
      ("INSERT", a.inserts, a.mirrorRows + a.deletes, a.failedOps),
      ("UPDATE", a.updates, a.updates, 0L),
      ("DELETE", a.deletes, a.deletes, 0L)
    ).toDF("operation", "source_ops", "target_acct", "failed")
  }
}
