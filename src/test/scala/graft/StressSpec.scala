package graft

import graft.streaming.{ChurnConfig, ChurnGenerator, MirrorRunner, StressHarness}
import java.nio.file.Files
import java.util.Properties
import org.apache.spark.sql.functions.col

/** The churn/stress harness (insert.ps1 + Get-CDCOperationsAnalysis analog)
  * end-to-end against a LIVE embedded Derby source under MirrorRunner:
  * seeded mixed INSERT/UPDATE/DELETE batches replicate while the workload
  * runs, the mirror FINAL must equal the generator's exact reference state
  * (stronger than the reference's count-only compare), and the per-batch /
  * summary accounting must agree with the mirror's own lag report.
  */
class StressSpec extends SparkSpec {

  private lazy val dbHome = {
    val home = Files.createTempDirectory("graft_stressderby").toString
    System.setProperty("derby.system.home", home)
    home
  }
  private lazy val url = { dbHome; s"jdbc:derby:stressdb;create=true" }
  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }
  private def exec(sqls: String*): Unit = jdbcExec(url, sqls: _*)

  private def createChurnTable(name: String): Unit =
    exec(s"CREATE TABLE $name (id BIGINT PRIMARY KEY, seq BIGINT NOT NULL, " +
      "qty INT, payload VARCHAR(64))")

  private def writeConfig(root: String, table: String, sink: Option[String]): String = {
    val cfgPath = s"$root/mirror.yaml"
    val sinkLines = sink.map(t =>
      s"""sink_url: "$url"
         |sink_dual: derby
         |""".stripMargin).getOrElse("")
    val targetLine = sink.map(t => s"    target: $t\n").getOrElse("")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(cfgPath),
      s"""mirror: stress_test
         |source_url: "$url"
         |target_dir: $root/mirror
         |reconcile_deletes: true
         |$sinkLines
         |tables:
         |  - name: $table
         |    keys: [ID]
         |    version_col: SEQ
         |    buckets: 4
         |$targetLine""".stripMargin)
    cfgPath
  }

  test("seeded workload is deterministic: same seed replays the same op " +
    "sequence and reference state") {
    createChurnTable("churn_det_a")
    createChurnTable("churn_det_b")
    val mk = (t: String) => new ChurnGenerator(url,
      ChurnConfig(t, recordCount = 300, batchSize = 50,
        insertWeight = 6, updateWeight = 2, deleteWeight = 2, seed = 7L))
    val (ga, gb) = (mk("churn_det_a"), mk("churn_det_b"))
    while (ga.hasMore) ga.runBatch()
    while (gb.hasMore) gb.runBatch()
    assert(ga.batchStats.map(s => (s.inserts, s.updates, s.deletes)) ===
      gb.batchStats.map(s => (s.inserts, s.updates, s.deletes)))
    val rows = (g: ChurnGenerator) => g.expectedFinal(spark)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getString(3))).toSet
    assert(rows(ga) === rows(gb))
    assert(rows(ga).nonEmpty)
    // and the source actually holds that state
    val src = spark.read.jdbc(url, "churn_det_a", props)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getString(3))).toSet
    assert(src === rows(ga))
  }

  test("mixed-op stress under MirrorRunner: mirror FINAL equals the " +
    "generator's exact reference state; analysis converges and agrees " +
    "with the mirror's lag report; sink delivers") {
    val root = Files.createTempDirectory("stressroot").toString
    createChurnTable("churn_e2e")
    exec("CREATE TABLE wh_churn (id BIGINT PRIMARY KEY, seq BIGINT, " +
      "qty INT, payload VARCHAR(64), \"_peerdb_version\" BIGINT)")
    val cfgPath = writeConfig(root, "churn_e2e", Some("wh_churn"))
    val runner = MirrorRunner.load(spark, cfgPath, props)

    val churn = ChurnConfig("churn_e2e", recordCount = 1200, batchSize = 100,
      insertWeight = 7, updateWeight = 2, deleteWeight = 1, seed = 42L)
    val result = StressHarness.run(spark, url, churn, runner,
      syncEveryBatches = 3, props = props)
    val a = result.analysis

    // op accounting: every generated op committed, none failed
    assert(a.inserts + a.updates + a.deletes === 1200L)
    assert(a.failedOps === 0L)
    assert(a.deletes > 0L && a.updates > 0L, "the mix must exercise all ops")

    // convergence: count-level (the reference's own check)...
    assert(a.syncDifference === 0L, s"sync difference: $a")
    assert(a.versionLag === 0L, s"version lag: $a")
    assert(a.converged)
    assert(a.sourceRows === a.inserts - a.deletes)

    // ...and row-level (graft's stronger contract): FINAL == the
    // generator's exact reference state == the live source, row-for-row
    val fin = runner.readFinal("churn_e2e")
      .select(col("ID").cast("long"), col("SEQ").cast("long"),
        col("QTY").cast("int"), col("PAYLOAD"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getString(3))).toSet
    val ref = result.gen.expectedFinal(spark)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getString(3))).toSet
    val src = spark.read.jdbc(url, "churn_e2e", props)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getString(3))).toSet
    assert(fin === ref, "mirror FINAL must equal the reference state")
    assert(src === ref, "the source must equal the reference state")
    assert(fin.size.toLong === a.mirrorRows)

    // the harness's analysis agrees with the mirror's own lag report
    val lag = runner.lag().collect()(0)
    assert(lag.getAs[Long]("lag_rows") === 0L)
    assert(lag.getAs[String]("sync_status") === "SYNCED")
    assert(lag.getAs[Long]("src_rows") === a.sourceRows)

    // warehouse delivery: live rows only (tombstones became DELETEs)
    assert(a.sinkRows === Some(a.sourceRows))

    // per-batch stats cover the whole run; throughput numbers are sane
    assert(result.batches.size === 12)
    assert(result.batches.map(_.ops).sum === 1200L)
    assert(a.applyRowsPerSec > 0.0 && a.endToEndRowsPerSec > 0.0)
    assert(a.maxBatchMs >= a.minBatchMs)
    assert(result.report.contains("Sync Difference: 0"))
    info(f"sustained end-to-end: ${a.endToEndRowsPerSec}%.0f ops/s " +
      f"(apply ${a.applyRowsPerSec}%.0f ops/s) over ${result.wallMs} ms")

    // the Write-ResourceUsage analog: stage-ledger totals captured over
    // the run's engine work and rendered in the report
    assert(result.resources.getOrElse("stages", 0L) > 0L)
    assert(result.resources.contains("shuffle_read_bytes"))
    assert(result.report.contains("Engine Resources:"))

    // the monitor-style op table renders one row per op type
    val frame = StressHarness.analysisFrame(spark, a)
    assert(frame.count() === 3L)
    assert(frame.where(col("operation") === "INSERT")
      .select("source_ops").collect()(0).getLong(0) === a.inserts)
  }

  test("continuous-mode stress: churn runs WHILE MirrorRunner.start's " +
    "loop replicates; the pipeline converges under live load") {
    val root = Files.createTempDirectory("stressloop").toString
    createChurnTable("churn_live")
    val cfgPath = writeConfig(root, "churn_live", None)
    val runner = MirrorRunner.load(spark, cfgPath, props)
    val churn = ChurnConfig("churn_live", recordCount = 600, batchSize = 60,
      delayBetweenBatchesMs = 50L, insertWeight = 8, updateWeight = 1,
      deleteWeight = 1, seed = 9L)
    val gen = new ChurnGenerator(url, churn)
    runner.start(150L) // capture loop runs CONCURRENTLY with the workload
    try {
      while (gen.hasMore) gen.runBatch()
      // wait for the loop to converge on the final state
      val deadline = System.currentTimeMillis() + 60000
      def lagZero(): Boolean = {
        val a = StressHarness.analyze(spark, url, gen, runner, 1L, props)
        a.syncDifference == 0L && a.versionLag == 0L
      }
      while (System.currentTimeMillis() < deadline && !lagZero())
        Thread.sleep(200)
      assert(lagZero(), "continuous loop did not converge on the workload")
      assert(runner.lastRoundError.isEmpty,
        s"rounds failed under load: ${runner.lastRoundError}")
    } finally runner.stop()
    // row-level convergence, not just counts
    val fin = runner.readFinal("churn_live")
      .select(col("ID").cast("long"), col("SEQ").cast("long"),
        col("QTY").cast("int"), col("PAYLOAD"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getString(3))).toSet
    val ref = gen.expectedFinal(spark)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getString(3))).toSet
    assert(fin === ref,
      "FINAL must equal the reference state after live-load convergence")
  }

  test("max-rate live load: unpaced batches against the continuous loop " +
    "converge row-for-row (regression: the unfenced single-scan poll " +
    "watermark lost concurrent updates at this rate)") {
    // the r18 sustained harness found a REAL lost-update race here: at
    // ~1600 committed ops/s a READ_COMMITTED poll scan saw a
    // late-committed high version while missing an earlier-positioned
    // row's lower-version update, advanced the watermark past it, and the
    // mirror held a stale row forever (527 of 59 868 rows after 75k ops)
    // while counts AND version lag both read green. The fenced two-pass
    // poll fixes it; this pins the fix at a test-sized rate.
    val root = Files.createTempDirectory("stressmaxrate").toString
    createChurnTable("churn_maxrate")
    val cfgPath = writeConfig(root, "churn_maxrate", None)
    val runner = MirrorRunner.load(spark, cfgPath, props)
    val churn = ChurnConfig("churn_maxrate", recordCount = 12000,
      batchSize = 400, insertWeight = 6, updateWeight = 3, deleteWeight = 1,
      seed = 11L) // update-heavy: the race needs updates below the fence
    val gen = new ChurnGenerator(url, churn)
    runner.start(100L) // capture rounds race the unpaced commit stream
    try {
      while (gen.hasMore) gen.runBatch() // NO pacing — max commit rate
      val deadline = System.currentTimeMillis() + 90000
      def converged(): Boolean = {
        val a = StressHarness.analyze(spark, url, gen, runner, 1L, props)
        a.syncDifference == 0L && a.versionLag == 0L
      }
      while (System.currentTimeMillis() < deadline && !converged())
        Thread.sleep(300)
      assert(converged(), "did not converge at max rate")
    } finally runner.stop()
    val fin = runner.readFinal("churn_maxrate")
      .select(col("ID").cast("long"), col("SEQ").cast("long"),
        col("QTY").cast("int"), col("PAYLOAD"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getString(3))).toSet
    val ref = gen.expectedFinal(spark)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getString(3))).toSet
    val stale = (fin -- ref).size
    assert(fin === ref,
      s"$stale stale mirror rows — the poll watermark fence regressed")
  }

  test("frame-path stress: the same seeded workload over pgoutput frames " +
    "(the replication-slot transport) converges row-for-row and lands in " +
    "the same final state as the JDBC polling path") {
    val root = Files.createTempDirectory("stressframes").toString
    val cfgPath = s"$root/mirror.yaml"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(cfgPath),
      s"""mirror: stress_frames
         |source_url: "$url"
         |target_dir: $root/mirror
         |tables:
         |  - name: churn_frames
         |    keys: [id]
         |    version_col: seq
         |    buckets: 4
         |""".stripMargin)
    val runner = MirrorRunner.load(spark, cfgPath, props)
    val churn = ChurnConfig("churn_frames", recordCount = 1000,
      batchSize = 100, insertWeight = 7, updateWeight = 2, deleteWeight = 1,
      seed = 42L)
    val result = StressHarness.runFrames(spark, churn, runner,
      syncEveryBatches = 3)
    val a = result.analysis
    assert(a.inserts + a.updates + a.deletes === 1000L)
    assert(a.failedOps === 0L)
    assert(a.deletes > 0L && a.updates > 0L, "the mix must exercise all ops")
    assert(a.syncDifference === 0L, s"sync difference: $a")
    assert(a.versionLag === 0L, s"version lag: $a")
    assert(a.converged)

    // row-level convergence: frame-path FINAL == exact reference state
    val fin = runner.readFramesFinal("churn_frames")
      .select(col("id").cast("long"), col("seq").cast("long"),
        col("qty").cast("int"), col("payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getString(3))).toSet
    val ref = result.gen.expectedFinal(spark)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getString(3))).toSet
    assert(fin === ref,
      "frame-path FINAL must equal the generator's reference state")
    assert(fin.size.toLong === a.mirrorRows)

    // cross-transport equality: the JDBC generator with the SAME seed and
    // mix ends in the SAME state — one op stream, two transports
    createChurnTable("churn_xport")
    val jdbcGen = new ChurnGenerator(url, churn.copy(table = "churn_xport"))
    while (jdbcGen.hasMore) jdbcGen.runBatch()
    val viaJdbc = jdbcGen.expectedFinal(spark)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getString(3))).toSet
    assert(viaJdbc === ref,
      "the two transports must replay the identical workload")
  }

  test("exists-but-empty mirror dir reads as 'nothing captured yet': the " +
    "mid-first-commit window (dir created, no committed footer) that " +
    "failed the r19 full-suite run, pinned DETERMINISTICALLY — no race " +
    "needed") {
    val root = Files.createTempDirectory("stressemptydir").toString
    createChurnTable("churn_emptydir")
    val cfgPath = writeConfig(root, "churn_emptydir", None)
    val runner = MirrorRunner.load(spark, cfgPath, props)
    // open the window by hand: the capture round mkdirs the mirror dir
    // before its first parquet commit lands — UNABLE_TO_INFER_SCHEMA, a
    // different condition than the absent-dir PATH_NOT_FOUND the r19
    // catch covered
    Files.createDirectories(
      java.nio.file.Paths.get(s"$root/mirror/churn_emptydir"))
    Files.createDirectories(
      java.nio.file.Paths.get(s"$root/mirror/frames/churn_emptydir"))
    val churn = ChurnConfig("churn_emptydir", recordCount = 20,
      batchSize = 10, seed = 3L)
    val gen = new ChurnGenerator(url, churn)
    while (gen.hasMore) gen.runBatch() // source has rows; mirror has none
    // the polling-lane poller path
    val a = StressHarness.analyze(spark, url, gen, runner, 1L, props)
    assert(a.mirrorRows === 0L)
    assert(a.syncDifference === a.sourceRows)
    // the frame-lane poller path (the sustained sampler's call)
    val fgen = new graft.streaming.FrameChurnGenerator(spark, churn,
      s"$root/landing")
    val fa = StressHarness.analyzeFrames(spark, fgen, runner, 1L)
    assert(fa.mirrorRows === 0L)
    // the production audit verb hits the same window from a monitor loop:
    // src-vs-empty must FLAG (honest), not throw
    val audit = runner.audit("churn_emptydir").collect()
    assert(audit.nonEmpty)
    assert(audit.forall(!_.getAs[Boolean]("ok")),
      "a populated source audited against an empty mirror must flag")
    assert(audit.map(_.getAs[Long]("mirror_rows")).sum === 0L)
  }

  test("a failed batch is atomic: accounting records it, the reference " +
    "state and source stay unchanged") {
    createChurnTable("churn_fail")
    // plant the first key the generator will try to insert → PK violation
    exec("INSERT INTO churn_fail VALUES (1, 999, 1, 'planted')")
    val gen = new ChurnGenerator(url,
      ChurnConfig("churn_fail", recordCount = 60, batchSize = 20, seed = 1L))
    while (gen.hasMore) gen.runBatch()
    // every batch re-collides on key 1 (keys roll back with the state)
    assert(gen.batchStats.map(_.failed).sum === 60L)
    assert(gen.failures.nonEmpty)
    assert(gen.liveRows === 0L, "reference state must roll back")
    // the source still holds ONLY the planted row — batches were atomic
    val src = spark.read.jdbc(url, "churn_fail", props).collect()
    assert(src.length === 1 && src(0).getString(3) === "planted")
  }

  test("a failed batch rolls the RNG back: the retry draws the identical " +
    "ops, so the committed workload matches an unobstructed run") {
    createChurnTable("churn_retry")
    // plant the first key → batch 1 fails; clear it → batch 2 is the RETRY
    exec("INSERT INTO churn_retry VALUES (1, 999, 1, 'planted')")
    val gen = new ChurnGenerator(url,
      ChurnConfig("churn_retry", recordCount = 40, batchSize = 20, seed = 7L))
    val failed = gen.runBatch()
    assert(failed.failed === 20L)
    exec("DELETE FROM churn_retry WHERE id = 1")
    val retried = gen.runBatch()
    assert(retried.failed === 0L)
    // the retried batch must equal batch 1 of an unobstructed same-seed
    // run — row for row, because the RNG position rolled back with the
    // reference state
    createChurnTable("churn_clean")
    val clean = new ChurnGenerator(url,
      ChurnConfig("churn_clean", recordCount = 20, batchSize = 20, seed = 7L))
    clean.runBatch()
    val got = spark.read.jdbc(url, "churn_retry", props).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
      .toSet
    val want = spark.read.jdbc(url, "churn_clean", props).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
      .toSet
    assert(got === want)
    assert((retried.inserts, retried.updates, retried.deletes) ===
      (clean.batchStats.head.inserts, clean.batchStats.head.updates,
        clean.batchStats.head.deletes))
  }
}
