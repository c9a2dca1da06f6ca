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

/** Seeded mixed-op workload generator against a live JDBC source table.
  * The table must have the harness schema: `id BIGINT PRIMARY KEY,
  * seq BIGINT NOT NULL, qty INT, payload VARCHAR` (the reference's
  * `orders(id, order_date, purchaser, quantity, product_id)` shape reduced
  * to what the CDC contract needs: a key, a monotone version, payload).
  * Keys are never reused; every op takes the next version from one
  * monotone sequence, so watermark polling captures every surviving image
  * and the hard-delete sweep reconciles the rest.
  */
final class ChurnGenerator(url: String, val cfg: ChurnConfig) {

  private val rng = new java.util.Random(cfg.seed)
  private val live = mutable.ArrayBuffer.empty[Long] // keys alive in source
  private val state = mutable.LongMap.empty[(Long, Int, String)] // key → (seq, qty, payload)
  private var nextKey = 1L
  private var nextSeq = 1L
  private var batchNo = 0
  private var generated = 0L
  private val stats = mutable.ArrayBuffer.empty[ChurnBatchStat]
  private val errors = mutable.ArrayBuffer.empty[String]

  private val totalW = cfg.insertWeight + cfg.updateWeight + cfg.deleteWeight

  /** Ops generated so far (== recordCount once [[runAll]] finishes). */
  def generatedOps: Long = generated
  def batchStats: Seq[ChurnBatchStat] = stats.toSeq
  def failures: Seq[String] = errors.toSeq
  /** Highest version handed out — the watermark the capture must reach. */
  def maxSeq: Long = nextSeq - 1
  /** Live rows the source must contain right now. */
  def liveRows: Long = state.size.toLong

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
    // snapshot for rollback on a failed commit
    val preLive = live.clone()
    val preState = state.clone()
    val (preKey, preSeq) = (nextKey, nextSeq)
    var i = 0
    while (i < n) {
      val draw = rng.nextInt(totalW)
      val qty = 1 + rng.nextInt(100)
      val seq = nextSeq; nextSeq += 1
      if (draw < cfg.insertWeight || live.isEmpty) {
        val k = nextKey; nextKey += 1
        val payload = s"p${k}_$seq"
        pendingInserts += s"($k, $seq, $qty, '$payload')"
        live += k; state(k) = (seq, qty, payload); ins += 1
      } else if (draw < cfg.insertWeight + cfg.updateWeight) {
        flushInserts()
        val k = live(rng.nextInt(live.size))
        val payload = s"u${k}_$seq"
        sqls += s"UPDATE ${cfg.table} SET seq = $seq, qty = $qty, " +
          s"payload = '$payload' WHERE id = $k"
        state(k) = (seq, qty, payload); upd += 1
      } else {
        flushInserts()
        val idx = rng.nextInt(live.size)
        val k = live(idx)
        live(idx) = live.last; live.remove(live.size - 1) // swap-remove
        sqls += s"DELETE FROM ${cfg.table} WHERE id = $k"
        state.remove(k); del += 1
      }
      i += 1
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
      // the source didn't change: restore the expectation, count failures
      live.clear(); live ++= preLive
      state.clear(); preState.foreach { case (k, v) => state(k) = v }
      nextKey = preKey; nextSeq = preSeq
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
  def expectedFinal(spark: SparkSession): DataFrame = {
    val rows = state.toSeq.map { case (k, (seq, qty, payload)) =>
      Row(k, seq, qty, payload)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("id", LongType), StructField("seq", LongType),
        StructField("qty", IntegerType), StructField("payload", StringType))))
  }

  /** Per-batch stat lines as a DataFrame (the stress log's batch table). */
  def batchFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    stats.toSeq.toDF()
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

  final case class StressResult(gen: ChurnGenerator,
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
    val mirrorRows = runner.readFinal(table).count()
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
