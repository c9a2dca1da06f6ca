package graft

import graft.sources.{Incremental, TableConfig}
import java.nio.file.Files
import java.sql.DriverManager
import java.util.Properties

/** The JDBC capture seam against a REAL database: embedded Apache Derby
  * (shipped with Spark for the Hive metastore) stands in for the Postgres
  * instance the reference tails (quickstart_prepare_peers.sh:24-78 creates
  * customers/products/orders with serial keys). Proves the two properties a
  * paper-only assembly of `spark.read.jdbc` can't: the watermark predicate
  * actually reaches the database (as a pushed filter / inlined WHERE, so a
  * poll streams only the delta instead of the table), and the
  * snapshot → insert → poll cycle drains a live table to lag 0.
  */
class JdbcCaptureSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dbHome = {
    val home = Files.createTempDirectory("graft_derby").toString
    System.setProperty("derby.system.home", home)
    home
  }
  private lazy val url = { dbHome; s"jdbc:derby:graftdb;create=true" }
  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  private def exec(sqls: String*): Unit = jdbcExec(url, sqls: _*)

  private def mkTable(name: String, rows: Seq[(Long, Long, String)]): Unit =
    exec((s"CREATE TABLE $name (id BIGINT PRIMARY KEY, seq BIGINT NOT NULL, " +
      "payload VARCHAR(64))") +:
      rows.map { case (id, seq, p) =>
        s"INSERT INTO $name VALUES ($id, $seq, '$p')"
      }: _*)

  private def jdbcTable(name: String) = spark.read.jdbc(url, name, props)

  test("jdbcIncrement inlines the watermark WHERE so the database streams only the delta") {
    mkTable("inc_t", (1L to 50L).map(i => (i, i, s"p$i")))
    val delta = Incremental.jdbcIncrement(spark, url, "inc_t", "seq", 40L, props)
    // the WHERE travels inside the dbtable subquery — visible in the scan's
    // relation, meaning Derby (not Spark) filters the 40 below-watermark rows
    val scan = delta.queryExecution.executedPlan.toString
    assert(scan.contains("WHERE seq > 40"), s"watermark WHERE not in the JDBC relation:\n$scan")
    assert(delta.select("ID").as[Long].collect().toSet == (41L to 50L).toSet)
  }

  test("a plain jdbc source pushes the poll's watermark filter down to the database") {
    mkTable("push_t", (1L to 30L).map(i => (i, i, s"p$i")))
    // poll's internal shape: full-table jdbc relation + seq > watermark —
    // Spark must push the predicate into the JDBC scan (PushedFilters), the
    // exact mechanism that keeps a 100 TB-source poll delta-sized
    val delta = jdbcTable("push_t")
      .where(org.apache.spark.sql.functions.col("seq").cast("long") > 25L)
    val scan = delta.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(SEQ,25)"),
      s"watermark filter not pushed to JDBC:\n$scan")
    assert(delta.count() == 5L)
  }

  test("snapshot + polls drain a live Derby table to lag 0, state resumed from disk") {
    mkTable("customers", (1L to 20L).map(i => (i, i, s"c$i")))
    val dir = Files.createTempDirectory("graft_jdbc_mirror").toString + "/customers"
    val cfg = TableConfig("customers", Seq("ID"), "SEQ", nBuckets = 4)

    val st0 = Incremental.snapshot(jdbcTable("customers"), cfg, dir)
    assert(st0.watermark == 20L)

    // live writes: two inserts and one update, all above the watermark
    exec(
      "INSERT INTO customers VALUES (21, 21, 'c21')",
      "INSERT INTO customers VALUES (22, 22, 'c22')",
      "UPDATE customers SET seq = 23, payload = 'u5' WHERE id = 5")

    val before = Incremental.lagReport(jdbcTable("customers"),
        graft.sources.Mirror.readCommitted(spark, dir), cfg)
      .select("lag_rows", "lag_seq", "sync_status")
      .as[(Long, Long, String)].collect()(0)
    assert(before == ((2L, 3L, "NEAR_SYNC")))

    val r1 = Incremental.poll(jdbcTable("customers"), cfg, dir)
    assert(r1.rowsSynced == 3L && r1.state.watermark == 23L && r1.state.batchId == 1L)

    val fin = graft.sources.Mirror.readFinal(spark, dir, "ID")
      .select("ID", "SEQ", "PAYLOAD").as[(Long, Long, String)].collect().toSet
    val truth = jdbcRows(url, "SELECT id, seq, payload FROM customers")(r =>
      (r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(fin == truth)

    val after = Incremental.lagReport(jdbcTable("customers"),
        graft.sources.Mirror.readCommitted(spark, dir), cfg)
      .select("lag_rows", "lag_seq", "sync_status")
      .as[(Long, Long, String)].collect()(0)
    assert(after == ((0L, 0L, "SYNCED")))

    // an idle poll against the live table is a no-op
    val idle = Incremental.poll(jdbcTable("customers"), cfg, dir)
    assert(idle.rowsSynced == 0L && idle.state == r1.state)
  }

  test("sinkMirror lands the mirror FINAL in a live Derby warehouse, delta-sized and replay-safe") {
    import graft.sinks.JdbcSink
    mkTable("wh_src", (1L to 15L).map(i => (i, i, s"w$i")))
    exec("CREATE TABLE wh_tgt (id BIGINT PRIMARY KEY, seq BIGINT, " +
      "payload VARCHAR(64), \"_peerdb_version\" BIGINT)")
    val dir = Files.createTempDirectory("graft_jdbc_sink").toString + "/wh_src"
    val cfg = TableConfig("wh_src", Seq("ID"), "SEQ", nBuckets = 4)
    Incremental.snapshot(jdbcTable("wh_src"), cfg, dir)

    def target(): Set[(Long, Long, String, Long)] =
      jdbcRows(url, "SELECT id, seq, payload, \"_peerdb_version\" FROM wh_tgt")(r =>
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))).toSet
    def mirrorFinal(): Set[(Long, Long, String, Long)] =
      graft.sources.Mirror.readFinal(spark, dir, "ID")
        .select("ID", "SEQ", "PAYLOAD", "_peerdb_version")
        .as[(Long, Long, String, Long)].collect().toSet

    val r1 = JdbcSink.sinkMirror(spark, dir, url, "wh_tgt", Seq("ID"), props,
      dual = JdbcSink.DerbyDual)
    assert(r1.applied && r1.batchId == 0L && r1.rowsChanged == 15L)
    assert(target() == mirrorFinal())

    // nothing new committed: the delta is empty and nothing is executed
    val idle = JdbcSink.sinkMirror(spark, dir, url, "wh_tgt", Seq("ID"), props,
      dual = JdbcSink.DerbyDual)
    assert(!idle.applied && idle.rowsChanged == 0L)

    // live insert + update + hard delete, then poll + sweep, then ONE sink
    // call delivers exactly the three changed keys (delta-sized, not a
    // mirror rewrite) — including the tombstone as a warehouse DELETE
    exec(
      "INSERT INTO wh_src VALUES (16, 16, 'w16')",
      "UPDATE wh_src SET seq = 17, payload = 'u3' WHERE id = 3",
      "DELETE FROM wh_src WHERE id = 7")
    Incremental.poll(jdbcTable("wh_src"), cfg, dir)
    Incremental.reconcileDeletes(jdbcTable("wh_src"), cfg, dir)
    // two committed syncs the warehouse hasn't seen: the monitor row says so
    def lag() = JdbcSink.deliveryLag(spark, dir, url, "wh_tgt", props)
      .select("mirror_batch", "delivered_batch", "pending_batches", "delivery_status")
      .as[(Long, Long, Long, String)].collect()(0)
    assert(lag() == ((2L, 0L, 2L, "PENDING")), lag().toString)
    val r3 = JdbcSink.sinkMirror(spark, dir, url, "wh_tgt", Seq("ID"), props,
      dual = JdbcSink.DerbyDual)
    assert(r3.applied && r3.rowsChanged == 3L, r3.toString)
    assert(target() == mirrorFinal())
    assert(!target().exists(_._1 == 7L), "hard delete must reach the warehouse")

    // replaying a delivered batch id is a no-op BEFORE any row is touched
    val replay = JdbcSink.sinkBatch(
      graft.sources.Mirror.readCommitted(spark, dir), url, "wh_tgt", Seq("ID"),
      r3.batchId, props, dual = JdbcSink.DerbyDual)
    assert(!replay.applied && target() == mirrorFinal())

    // ... and DELIVERED with zero pending right after the sink round
    assert(lag() == ((2L, 2L, 0L, "DELIVERED")), lag().toString)

    // a STALE row under a fresh batch id: the ledger admits it, the
    // (keys, _peerdb_version) MERGE guard rejects it row-by-row
    val stale = Seq((3L, 1L, "stale", 1L, 0))
      .toDF("ID", "SEQ", "PAYLOAD", "_peerdb_version", "_peerdb_is_deleted")
    val r4 = JdbcSink.sinkBatch(stale, url, "wh_tgt", Seq("ID"), 999L, props,
      dual = JdbcSink.DerbyDual)
    assert(r4.applied && r4.rowsChanged == 0L,
      s"version guard must reject the stale replay: $r4")
    assert(target() == mirrorFinal())
    // ... and a stale TOMBSTONE cannot delete a newer row either
    val staleDel = Seq((3L, 1L, "gone", 1L, 1))
      .toDF("ID", "SEQ", "PAYLOAD", "_peerdb_version", "_peerdb_is_deleted")
    val r5 = JdbcSink.sinkBatch(staleDel, url, "wh_tgt", Seq("ID"), 1000L, props,
      dual = JdbcSink.DerbyDual)
    assert(r5.applied && r5.rowsChanged == 0L && target() == mirrorFinal())
  }

  test("a delivery that dies between partition commits converges on re-sink, ledger exactly once") {
    import graft.sinks.JdbcSink
    // the sink commits per key-partition and records the ledger LAST; a
    // crash mid-delivery must leave a retriable (not corrupt) state. The
    // injection: a narrow VARCHAR target plus one oversized payload — the
    // poisoned key's partition aborts on its own JDBC batch while the
    // other partitions' transactions commit independently.
    exec("CREATE TABLE crash_tgt (\"ID\" BIGINT PRIMARY KEY, " +
      "\"PAYLOAD\" VARCHAR(8), \"_peerdb_version\" BIGINT)")
    val good = (1L to 12L).map(i => (i, s"p$i", 1L, 0))
    def df(rows: Seq[(Long, String, Long, Int)]) =
      rows.toDF("ID", "PAYLOAD", "_peerdb_version", "_peerdb_is_deleted")
    val poisoned = good :+ ((99L, "x" * 64, 1L, 0)) // VARCHAR(8) overflow
    intercept[org.apache.spark.SparkException](
      JdbcSink.sinkBatch(df(poisoned), url, "crash_tgt", Seq("ID"), 7L, props,
        dual = JdbcSink.DerbyDual, stmtBatch = 1))
    def ledger() = jdbcRows(url,
      "SELECT batch_id FROM crash_tgt_sink_state")(_.getLong(1))
    def target() = jdbcRows(url,
      "SELECT \"ID\", \"PAYLOAD\", \"_peerdb_version\" FROM crash_tgt")(r =>
      (r.getLong(1), r.getString(2), r.getLong(3))).toSet
    // the batch is ABSENT from the ledger (recorded strictly after every
    // partition commits), so the delivery stays retriable...
    assert(ledger().isEmpty, s"crashed batch must not reach the ledger: ${ledger()}")
    // ...and the target holds SOME partitions' commits — a legal partial
    // state, always a subset of the batch's final image, never garbage
    val fixedRows = good :+ ((99L, "fixed", 1L, 0))
    val finalImage = fixedRows.map { case (id, p, v, _) => (id, p, v) }.toSet
    assert(target().subsetOf(finalImage), s"partial state not a subset: ${target()}")
    // re-sinking the corrected batch under the SAME id converges: the
    // version-guarded MERGE re-applies the already-committed partitions
    // idempotently and completes the missing ones
    val r = JdbcSink.sinkBatch(df(fixedRows), url, "crash_tgt", Seq("ID"), 7L,
      props, dual = JdbcSink.DerbyDual)
    assert(r.applied, r.toString)
    assert(target() == finalImage, s"re-sink did not converge: ${target()}")
    assert(ledger() == Seq(7L), s"ledger must record exactly once: ${ledger()}")
    // and a further replay of the recovered batch id is a pre-row no-op
    val replay = JdbcSink.sinkBatch(df(fixedRows), url, "crash_tgt", Seq("ID"),
      7L, props, dual = JdbcSink.DerbyDual)
    assert(!replay.applied && target() == finalImage && ledger() == Seq(7L))
  }

  test("appendBatch lands raw versioned rows ClickHouse-style; FINAL over the target dedups") {
    import graft.sinks.JdbcSink
    import org.apache.spark.sql.functions.col
    exec("CREATE TABLE ap_tgt (\"id\" BIGINT, \"payload\" VARCHAR(64), " +
      "\"_peerdb_version\" BIGINT, \"_peerdb_is_deleted\" INTEGER, " +
      "\"_peerdb_batch_id\" BIGINT)")
    def meta(rows: Seq[(Long, String, Long, Int, Long)]) = rows.toDF(
      "id", "payload", "_peerdb_version", "_peerdb_is_deleted", "_peerdb_batch_id")
    val r0 = JdbcSink.appendBatch(
      meta(Seq((1L, "a", 1L, 0, 0L), (2L, "b", 2L, 0, 0L))), url, "ap_tgt", 0L, props)
    assert(r0.applied && r0.rowsChanged == 2L)
    // batch 1: update key 1, tombstone key 2 — appended, never updated in place
    val b1 = meta(Seq((1L, "a2", 3L, 0, 1L), (2L, "b", 4L, 1, 1L)))
    assert(JdbcSink.appendBatch(b1, url, "ap_tgt", 1L, props).applied)
    // the streaming-recovery replay of a delivered batch appends NOTHING
    val replay = JdbcSink.appendBatch(b1, url, "ap_tgt", 1L, props)
    assert(!replay.applied && replay.rowsChanged == 0L)
    val raw = spark.read.jdbc(url, "ap_tgt", props)
    assert(raw.count() == 4L, "append-only: every change row is retained")
    // the warehouse-side FINAL (ReplacingMergeTree semantics): newest
    // version per key, tombstones dropped
    val fin = graft.operators.CdcOps
      .latestSnapshot(raw, Seq("id"), "_peerdb_version")
      .where(col("_peerdb_is_deleted") === 0)
      .select("id", "payload").as[(Long, String)].collect().toSet
    assert(fin == Set((1L, "a2")))
  }

  test("foreachBatch lands a CDC stream in Derby; a recovery replay is a no-op") {
    import graft.sinks.JdbcSink
    import graft.streaming.CdcStream.Change
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    exec("CREATE TABLE st_tgt (\"key\" BIGINT PRIMARY KEY, \"version\" BIGINT, " +
      "\"op\" VARCHAR(16), \"ts\" TIMESTAMP, \"payload\" VARCHAR(64))")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def target(): Set[(Long, Long, String)] =
      jdbcRows(url, "SELECT \"key\", \"version\", \"payload\" FROM st_tgt")(r =>
        (r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val sink = JdbcSink.foreachBatch(url, "st_tgt", Seq("key"), props,
      versionCol = "version", deletedCol = "is_deleted", dual = JdbcSink.DerbyDual)
    val input = MemoryStream[Change]
    val ckpt = Files.createTempDirectory("graft_sink_ckpt").toString
    val q = input.toDS().toDF()
      .withColumn("is_deleted", (col("op") === "delete").cast("int"))
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(sink)
      .start()
    try {
      input.addData(
        Change(1L, 1L, "insert", ts("2024-01-01 00:00:00"), "v1"),
        Change(2L, 1L, "insert", ts("2024-01-01 00:00:10"), "w1"),
        Change(1L, 2L, "update", ts("2024-01-01 00:01:00"), "v2"))
      q.processAllAvailable()
      assert(target() == Set((1L, 2L, "v2"), (2L, 1L, "w1")))
      input.addData(Change(2L, 2L, "delete", ts("2024-01-01 00:02:00"), "w1"))
      q.processAllAvailable()
      assert(target() == Set((1L, 2L, "v2")))
    } finally q.stop()
    // the recovery contract: Structured Streaming re-runs the last batch id
    // after a crash; the ledger makes the replay a no-op even with the
    // batch's content long gone from the target
    val replayed = Seq((2L, 1L, "insert", ts("2024-01-01 00:00:10"), "w1", 0))
      .toDF("key", "version", "op", "ts", "payload", "is_deleted")
    sink(replayed, 0L)
    assert(target() == Set((1L, 2L, "v2")),
      "a replayed delivered batch must not resurrect rows")
  }

  test("hard DELETEs drain to lag 0 via key reconciliation and survive re-insert") {
    mkTable("accounts", (1L to 10L).map(i => (i, i, s"a$i")))
    val dir = Files.createTempDirectory("graft_jdbc_del").toString + "/accounts"
    val cfg = TableConfig("accounts", Seq("ID"), "SEQ", nBuckets = 4)
    val st0 = Incremental.snapshot(jdbcTable("accounts"), cfg, dir)
    assert(st0.watermark == 10L)

    // a physical purge: no change row, invisible to the versionCol tail
    exec("DELETE FROM accounts WHERE id IN (3, 7)")
    val poll0 = Incremental.poll(jdbcTable("accounts"), cfg, dir)
    assert(poll0.rowsSynced == 0L, "the seq tail must not see hard deletes")
    val before = Incremental.lagReport(jdbcTable("accounts"),
        graft.sources.Mirror.readCommitted(spark, dir), cfg)
      .select("lag_rows", "sync_status").as[(Long, String)].collect()(0)
    assert(before == ((-2L, "NEAR_SYNC")), "phantom negative lag before the sweep")

    val r1 = Incremental.reconcileDeletes(jdbcTable("accounts"), cfg, dir)
    assert(r1.rowsSynced == 2L && r1.state.watermark == st0.watermark
      && r1.state.batchId == st0.batchId + 1)
    val fin1 = graft.sources.Mirror.readFinal(spark, dir, "ID")
      .select("ID").as[Long].collect().toSet
    assert(fin1 == ((1L to 10L).toSet -- Set(3L, 7L)), "deleted keys vanish from FINAL")
    val after = Incremental.lagReport(jdbcTable("accounts"),
        graft.sources.Mirror.readCommitted(spark, dir), cfg)
      .select("lag_rows", "sync_status").as[(Long, String)].collect()(0)
    assert(after == ((0L, "SYNCED")))

    // a sweep with nothing to reconcile is a no-op (state untouched)
    val idle = Incremental.reconcileDeletes(jdbcTable("accounts"), cfg, dir)
    assert(idle.rowsSynced == 0L && idle.state == r1.state)

    // re-insert of a deleted key: its fresh seq outranks the tombstone
    exec("INSERT INTO accounts VALUES (3, 11, 'back')")
    val r2 = Incremental.poll(jdbcTable("accounts"), cfg, dir)
    assert(r2.rowsSynced == 1L && r2.state.watermark == 11L)
    val fin2 = graft.sources.Mirror.readFinal(spark, dir, "ID")
      .select("ID", "SEQ", "PAYLOAD").as[(Long, Long, String)].collect().toSet
    assert(fin2.contains((3L, 11L, "back")) && fin2.size == 9)
    val synced = Incremental.lagReport(jdbcTable("accounts"),
        graft.sources.Mirror.readCommitted(spark, dir), cfg)
      .select("lag_rows", "sync_status").as[(Long, String)].collect()(0)
    assert(synced == ((0L, "SYNCED")))
  }

  test("jdbcSnapshotPartitioned: chunked parallel load, correct mirror, frozen watermark") {
    mkTable("psnap_t", (1L to 97L).map(i => (i, i, s"s$i")))
    val dir = Files.createTempDirectory("graft_psnap").toString + "/psnap_t"
    val cfg = TableConfig("psnap_t", Seq("ID"), "SEQ", nBuckets = 4)

    // the probe computes bounds + watermark inside the database
    val b = Incremental.probeSnapshotBounds(spark, url, "psnap_t", "id", "seq", props)
    assert(b == Incremental.SnapshotBounds(1L, 97L, 97L, empty = false))

    // the partitioned scan really is chunked: Spark plans `chunks` range
    // partitions over the key column
    val chunked = spark.read.jdbc(url, "psnap_t", "id", b.lower, b.upper, 4, props)
    assert(chunked.rdd.getNumPartitions == 4)

    val st = Incremental.jdbcSnapshotPartitioned(spark, url, cfg, dir, "id", 4, props)
    assert(st.watermark == 97L)
    val fin = graft.sources.Mirror.readFinal(spark, dir, "ID")
      .select("ID", "SEQ", "PAYLOAD").as[(Long, Long, String)].collect().toSet
    assert(fin == (1L to 97L).map(i => (i, i, s"s$i")).toSet)

    // and the tail continues exactly from the frozen watermark
    exec("INSERT INTO psnap_t VALUES (98, 98, 's98')")
    val r = Incremental.poll(jdbcTable("psnap_t"), cfg, dir)
    assert(r.rowsSynced == 1L && r.state.watermark == 98L)
  }

  test("jdbcSnapshotPartitioned heals a mid-snapshot mutation at the first poll") {
    mkTable("torn_t", (1L to 30L).map(i => (i, i, s"t$i")))
    val dir = Files.createTempDirectory("graft_torn").toString + "/torn_t"
    val cfg = TableConfig("torn_t", Seq("ID"), "SEQ", nBuckets = 4)

    // freeze the probe, THEN mutate — deterministically reproducing a row
    // that changes while the chunk reads stream (the torn-snapshot window)
    val b = Incremental.probeSnapshotBounds(spark, url, "torn_t", "id", "seq", props)
    exec("UPDATE torn_t SET seq = 40, payload = 'torn-post' WHERE id = 7",
      "INSERT INTO torn_t VALUES (31, 41, 'mid-insert')")

    val st = Incremental.jdbcSnapshotPartitioned(spark, url, cfg, dir, "id", 3,
      props, probed = Some(b))
    // the chunk reads saw the post-images, but the watermark stayed frozen
    // at the pre-mutation probe — so the mutations are still "in the tail"
    assert(st.watermark == 30L)

    // first poll re-captures both mutated rows; the FINAL merge heals any
    // torn chunk images (newest version wins, replay is idempotent)
    val r = Incremental.poll(jdbcTable("torn_t"), cfg, dir)
    assert(r.rowsSynced == 2L && r.state.watermark == 41L)
    val fin = graft.sources.Mirror.readFinal(spark, dir, "ID")
      .select("ID", "SEQ", "PAYLOAD").as[(Long, Long, String)].collect().toSet
    val truth = jdbcRows(url, "SELECT id, seq, payload FROM torn_t")(x =>
      (x.getLong(1), x.getLong(2), x.getString(3))).toSet
    assert(fin == truth)
  }

  test("jdbcSnapshotPartitioned of an empty table bootstraps a pollable mirror") {
    exec("CREATE TABLE empty_t (id BIGINT PRIMARY KEY, seq BIGINT NOT NULL, " +
      "payload VARCHAR(64))")
    val dir = Files.createTempDirectory("graft_esnap").toString + "/empty_t"
    val cfg = TableConfig("empty_t", Seq("ID"), "SEQ", nBuckets = 2)
    val st = Incremental.jdbcSnapshotPartitioned(spark, url, cfg, dir, "id", 4, props)
    assert(st.watermark == Long.MinValue)
    exec("INSERT INTO empty_t VALUES (1, 1, 'first')")
    val r = Incremental.poll(jdbcTable("empty_t"), cfg, dir)
    assert(r.rowsSynced == 1L && r.state.watermark == 1L)
  }

  test("excludeCols keeps PII columns out of the mirror across snapshot and poll") {
    exec("CREATE TABLE excl_t (id BIGINT PRIMARY KEY, seq BIGINT NOT NULL, " +
      "payload VARCHAR(64), ssn VARCHAR(16))",
      "INSERT INTO excl_t VALUES (1, 1, 'p1', '111-11-1111')",
      "INSERT INTO excl_t VALUES (2, 2, 'p2', '222-22-2222')")
    val dir = Files.createTempDirectory("graft_excl").toString + "/excl_t"
    // case-insensitive match: Derby folds to SSN, the config says ssn
    val cfg = TableConfig("excl_t", Seq("ID"), "SEQ", nBuckets = 2,
      excludeCols = Seq("ssn"))
    Incremental.snapshot(jdbcTable("excl_t"), cfg, dir)
    val snapCols = graft.sources.Mirror.readFinal(spark, dir, "ID").columns
    assert(!snapCols.exists(_.equalsIgnoreCase("ssn")),
      s"excluded column landed on disk: ${snapCols.mkString(",")}")

    exec("INSERT INTO excl_t VALUES (3, 3, 'p3', '333-33-3333')")
    val r = Incremental.poll(jdbcTable("excl_t"), cfg, dir)
    assert(r.rowsSynced == 1L)
    val fin = graft.sources.Mirror.readFinal(spark, dir, "ID")
    assert(!fin.columns.exists(_.equalsIgnoreCase("ssn")))
    assert(fin.select("ID").as[Long].collect().toSet == Set(1L, 2L, 3L))

    // the capture contract cannot be excluded away
    intercept[IllegalArgumentException](
      TableConfig("excl_t", Seq("ID"), "SEQ", excludeCols = Seq("id")))
    intercept[IllegalArgumentException](
      TableConfig("excl_t", Seq("ID"), "SEQ", excludeCols = Seq("SEQ")))
  }

  test("sink-side schema evolution ADDs drifted columns before delivery") {
    import graft.sinks.JdbcSink
    exec("CREATE TABLE ev_tgt (\"id\" BIGINT PRIMARY KEY, " +
      "\"payload\" VARCHAR(64), \"_peerdb_version\" BIGINT)")
    val b1 = Seq((1L, "a", 1L), (2L, "b", 1L))
      .toDF("id", "payload", "_peerdb_version")
    val r1 = JdbcSink.sinkBatch(b1, url, "ev_tgt", Seq("id"), 1L, props,
      dual = JdbcSink.DerbyDual)
    assert(r1.applied && r1.rowsChanged == 2L)
    // drift: the mirror gained a column the warehouse lacks
    val b2 = Seq((3L, "c", 2L, 77L))
      .toDF("id", "payload", "_peerdb_version", "extra")
    // without evolve, delivery refuses loudly (the database rejects the
    // unknown column) and the ledger records nothing
    intercept[Exception](JdbcSink.sinkBatch(b2, url, "ev_tgt", Seq("id"),
      2L, props, dual = JdbcSink.DerbyDual))
    // with evolve, the column is ADDED, the batch lands, pre-drift rows
    // take the NULL fill
    val r2 = JdbcSink.sinkBatch(b2, url, "ev_tgt", Seq("id"), 2L, props,
      dual = JdbcSink.DerbyDual, evolve = true)
    assert(r2.applied && r2.rowsChanged == 1L)
    val got = jdbcRows(url, "SELECT \"id\", \"extra\" FROM ev_tgt")(r =>
      (r.getLong(1), Option(r.getObject(2)).map(_.toString))).toSet
    assert(got == Set((1L, None), (2L, None), (3L, Some("77"))))
    // agreeing schemas are a no-op; drops/renames never propagate (the
    // narrower batch simply writes the columns it has)
    assert(JdbcSink.evolveTarget(url, "ev_tgt",
      org.apache.spark.sql.types.StructType(
        b2.schema.filterNot(_.name == "payload")), props).isEmpty)
  }
}
