package graft

import graft.sources.{Incremental, MultiTableMirror, TableConfig}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Incremental capture: snapshot + polling watermark tail + lag metric —
  * the engine half of the reference's continuous flow-worker loop.
  */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def state(n: Int, extra: Seq[(Long, Long, String)] = Nil): DataFrame =
    ((1L to n.toLong).map(i => (i, i, s"p$i")) ++ extra)
      .toDF("key", "seq", "payload")

  private def finalRows(dir: String): Set[(Long, Long, String)] =
    graft.sources.Mirror.readFinal(spark, dir, "key")
      .select("key", "seq", "payload").as[(Long, Long, String)].collect().toSet

  private def srcRows(df: DataFrame): Set[(Long, Long, String)] =
    df.as[(Long, Long, String)].collect().toSet

  test("snapshot + polls tail the source to zero lag, resuming from disk state") {
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val dir = Files.createTempDirectory("graft_tail").toString + "/orders"
    val cfg = TableConfig("orders", Seq("key"), "seq", nBuckets = 4)

    val v0 = state(100)
    val st0 = Incremental.snapshot(v0, cfg, dir)
    assert(st0.watermark == 100L && st0.batchId == 0L)
    assert(Incremental.readState(spark, dir).contains(st0))
    assert(finalRows(dir) == srcRows(v0))

    // idle poll: nothing new, watermark/batch unchanged
    val idle = Incremental.poll(v0, cfg, dir)
    assert(idle.rowsSynced == 0L && idle.state == st0)

    // increment 1: keys 1..10 updated (seq 101..110), keys 101..105 inserted
    val v1 = ((11L to 100L).map(i => (i, i, s"p$i")) ++
      (1L to 10L).map(i => (i, 100L + i, s"u$i")) ++
      (101L to 105L).map(i => (i, 110L + i - 100L, s"n$i"))) // seq 111..115
      .toDF("key", "seq", "payload")

    // before the poll the lag report must show the drift, graded by the
    // monitor's thresholds (0 SYNCED / <=5 NEAR_SYNC / else LAG)
    val before = Incremental.lagReport(v1, graft.sources.Mirror.readCommitted(spark, dir), cfg)
      .select("src_rows", "dst_rows", "lag_rows", "lag_seq", "sync_status")
      .as[(Long, Long, Long, Long, String)].collect()(0)
    assert(before == ((105L, 100L, 5L, 15L, "NEAR_SYNC")))
    assert(Incremental.lagReport(v1, graft.sources.Mirror.readCommitted(spark, dir), cfg, nearSyncRows = 4)
      .select("sync_status").as[String].collect()(0) == "LAG")

    val r1 = Incremental.poll(v1, cfg, dir)
    assert(r1.rowsSynced == 15L && r1.state.watermark == 115L && r1.state.batchId == 1L)
    assert(finalRows(dir) == srcRows(v1))

    // ... and zero after it
    val after = Incremental.lagReport(v1, graft.sources.Mirror.readCommitted(spark, dir), cfg)
      .select("lag_rows", "lag_seq", "sync_status")
      .as[(Long, Long, String)].collect()(0)
    assert(after == ((0L, 0L, "SYNCED")))

    // increment 2 drains too (state resumed purely from the state file)
    val v2 = v1.where($"key" =!= 50L)
      .unionByName(Seq((50L, 116L, "u50")).toDF("key", "seq", "payload"))
    val r2 = Incremental.poll(v2, cfg, dir)
    assert(r2.rowsSynced == 1L && r2.state.watermark == 116L && r2.state.batchId == 2L)
    assert(finalRows(dir) == srcRows(v2))
    val lag2 = Incremental.lagReport(v2, graft.sources.Mirror.readCommitted(spark, dir), cfg)
      .select("lag_rows", "lag_seq").as[(Long, Long)].collect()(0)
    assert(lag2 == ((0L, 0L)))
    // polls cache the delta and the merge internally; both must be released
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore
    assert(leaked.isEmpty, s"poll/upsert left cached blocks pinned: $leaked")
  }

  test("snapshot of an empty source bootstraps on the first poll") {
    val dir = Files.createTempDirectory("graft_tail_empty").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 4)
    val empty = state(0)
    Incremental.snapshot(empty, cfg, dir)
    // the snapshot wrote no parquet footers: the first poll must treat the
    // existing-but-empty dir as first batch instead of wedging on read
    val v1 = state(20)
    val r = Incremental.poll(v1, cfg, dir)
    assert(r.rowsSynced == 20L && r.state.watermark == 20L)
    assert(finalRows(dir) == srcRows(v1))
  }

  test("soft deletes propagate through polls and vanish from the FINAL read") {
    val dir = Files.createTempDirectory("graft_tail_del").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 4)
    Incremental.snapshot(state(10).withColumn("op", lit("upsert")), cfg, dir,
      isDelete = col("op") === "delete")
    // key 3 deleted, key 11 inserted
    val feed = Seq((3L, 11L, "p3", "delete"), (11L, 12L, "p11", "upsert"))
      .toDF("key", "seq", "payload", "op")
      .unionByName(state(10).withColumn("op", lit("upsert")))
    val r = Incremental.poll(feed, cfg, dir, isDelete = col("op") === "delete")
    assert(r.rowsSynced == 2L)
    val fin = graft.sources.Mirror.readFinal(spark, dir, "key")
      .select("key").as[Long].collect().toSet
    assert(fin == ((1L to 10L).toSet - 3L + 11L))
    // the tombstone row is retained in the mirror (versioned), just hidden
    assert(graft.sources.Mirror.readCommitted(spark, dir).where($"key" === 3L)
      .where($"_peerdb_is_deleted" === 1).count() == 1L)
  }

  test("the watermark predicate pushes into the parquet scan") {
    val base = Files.createTempDirectory("graft_tail_push")
    val src = base.toString + "/src"
    val dir = base.toString + "/mirror"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 4)
    state(1000).write.parquet(src)
    val source = spark.read.parquet(src)
    Incremental.snapshot(source, cfg, dir)
    // the poll's scan of the source must carry seq > watermark as a pushed
    // filter — at 100 TB this is what turns a poll into a footer-pruned
    // delta read instead of a full table scan
    val delta = source.where(col(cfg.versionCol).cast("long") > lit(1000L))
    val scan = delta.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(seq,1000)"),
      s"watermark filter not pushed:\n$scan")
  }

  test("MultiTableMirror mirrors three tables under one config through snapshot + increments") {
    val root = Files.createTempDirectory("graft_multi").toString
    val cfgs = Seq(
      TableConfig("customers", Seq("key"), "seq", nBuckets = 4),
      TableConfig("products", Seq("key"), "seq", nBuckets = 2),
      TableConfig("orders", Seq("key"), "seq", nBuckets = 8))
    val current = scala.collection.mutable.Map(
      "customers" -> state(30), "products" -> state(10), "orders" -> state(50))
    val mirror = new MultiTableMirror(spark, cfgs, current(_), root)

    val snaps = mirror.snapshotAll()
    assert(snaps.keySet == Set("customers", "products", "orders"))
    assert(snaps("orders").watermark == 50L)

    // mutate two of the three tables, then one poll round
    current("customers") = state(30, Seq((31L, 31L, "n31")))
    current("orders") = state(50).where($"key" =!= 7L)
      .unionByName(Seq((7L, 51L, "u7")).toDF("key", "seq", "payload"))
    val polled = mirror.pollAll()
    assert(polled("customers").rowsSynced == 1L)
    assert(polled("products").rowsSynced == 0L)
    assert(polled("orders").rowsSynced == 1L)

    for (t <- cfgs.map(_.table))
      assert(srcRows(current(t)) ==
        mirror.readFinal(t).select("key", "seq", "payload")
          .as[(Long, Long, String)].collect().toSet, s"mirror drift on $t")

    // the whole Lag table: one row per table, all drained
    val lag = mirror.lagAll()
      .select("table_name", "lag_rows", "lag_seq")
      .as[(String, Long, Long)].collect().toSet
    assert(lag == Set(("customers", 0L, 0L), ("products", 0L, 0L), ("orders", 0L, 0L)))

    // one warehouse-delivery round: every table's delta lands in its own
    // JDBC target (the reference's per-table ClickHouse tables under one
    // target database), concurrently, under the same round deadline
    val url = "jdbc:derby:memory:graftmulti;create=true"
    jdbcExec(url, cfgs.map(c =>
      s"""CREATE TABLE wh_${c.table} ("key" BIGINT PRIMARY KEY, """ +
        """"seq" BIGINT, "payload" VARCHAR(64), "_peerdb_version" BIGINT)"""): _*)
    val sunk = mirror.sinkAll(url, targetOf = "wh_" + _,
      dual = graft.sinks.JdbcSink.DerbyDual)
    assert(sunk.keySet == Set("customers", "products", "orders")
      && sunk.values.forall(_.applied))
    def whRows(t: String): Set[(Long, Long, String)] =
      jdbcRows(url, s"""SELECT "key", "seq", "payload" FROM wh_$t""")(r =>
        (r.getLong(1), r.getLong(2), r.getString(3))).toSet
    for (t <- cfgs.map(_.table))
      assert(whRows(t) == srcRows(current(t)), s"warehouse drift on $t")
    // a second delivery round with nothing new is a no-op for every table
    assert(mirror.sinkAll(url, targetOf = "wh_" + _,
      dual = graft.sinks.JdbcSink.DerbyDual).values.forall(!_.applied))
    // mapping two mirrors onto one warehouse table is refused (a shared
    // ledger would silently starve the slower table's deliveries)
    intercept[IllegalArgumentException](mirror.sinkAll(url, targetOf = _ => "wh_one"))
  }

  test("a wedged source fails the round in bounded time; healthy tables commit and re-poll") {
    val root = Files.createTempDirectory("graft_wedge").toString
    val cfgs = Seq(
      TableConfig("good", Seq("key"), "seq", nBuckets = 4),
      TableConfig("bad", Seq("key"), "seq", nBuckets = 4),
      TableConfig("broken", Seq("key"), "seq", nBuckets = 4))
    val wedge = new java.util.concurrent.CountDownLatch(1)
    @volatile var wedged = false
    val current = scala.collection.mutable.Map(
      "good" -> state(10), "bad" -> state(10), "broken" -> state(10))
    def src(t: String): DataFrame = {
      if (t == "bad" && wedged) wedge.await() // a hung JDBC connect, forever
      if (t == "broken" && wedged)
        throw new IllegalStateException("auth expired for broken")
      current(t)
    }
    val mirror = new MultiTableMirror(spark, cfgs, src, root,
      roundTimeout = scala.concurrent.duration.Duration(20, "s"))
    mirror.snapshotAll()

    // wedge "bad", break "broken", advance the sources, run one poll round
    wedged = true
    current("good") = state(10, Seq((11L, 11L, "g11")))
    current("bad") = state(10, Seq((11L, 11L, "b11")))
    val t0 = System.nanoTime
    val boom = intercept[java.util.concurrent.TimeoutException](mirror.pollAll())
    val elapsedSec = (System.nanoTime - t0) / 1e9
    assert(elapsedSec < 120, f"round not bounded: $elapsedSec%.1f s")
    assert(boom.getMessage.contains("bad") && boom.getMessage.contains("good"),
      boom.getMessage)
    // the timed-out round must surface broken's REAL failure, not bury it
    // behind the timeout
    assert(boom.getMessage.contains("auth expired"), boom.getMessage)
    assert(boom.getSuppressed.exists(_.getMessage.contains("auth expired")))
    wedge.countDown() // release the stranded (interrupted) thread

    // the healthy table committed its sync inside the failed round; the
    // wedged table kept its previous durable state
    assert(Incremental.readState(spark, s"$root/good").get.watermark == 11L)
    assert(Incremental.readState(spark, s"$root/bad").get.watermark == 10L)

    // the source recovers: the next round drains the wedged table from its
    // old watermark, nothing lost, nothing double-applied
    wedged = false
    val r = mirror.pollAll()
    assert(r("bad").rowsSynced == 1L && r("good").rowsSynced == 0L
      && r("broken").rowsSynced == 0L)
    for (t <- Seq("good", "bad", "broken"))
      assert(srcRows(current(t)) ==
        mirror.readFinal(t).select("key", "seq", "payload")
          .as[(Long, Long, String)].collect().toSet, s"mirror drift on $t")
  }

  test("reconcileDeletes refuses a transient wipe and resurrects after a forced one") {
    val dir = Files.createTempDirectory("graft_wipe").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 4)
    val v0 = state(10)
    val st0 = Incremental.snapshot(v0, cfg, dir)

    // a transient EMPTY source read (permissions / wrong view returning zero
    // rows) must refuse instead of tombstoning the whole mirror
    val boom = intercept[IllegalStateException] {
      Incremental.reconcileDeletes(state(0), cfg, dir)
    }
    assert(boom.getMessage.contains("refusing"))
    assert(finalRows(dir) == srcRows(v0), "refused sweep must leave the mirror intact")
    assert(Incremental.readState(spark, dir).contains(st0),
      "refused sweep must not advance state")

    // a partial read missing 7 of 10 keys trips the 0.5 default too
    intercept[IllegalStateException] {
      Incremental.reconcileDeletes(state(3), cfg, dir)
    }

    // a delete volume under the threshold proceeds normally (2 of 10)
    val ok = Incremental.reconcileDeletes(v0.where($"key" <= 8L), cfg, dir)
    assert(ok.rowsSynced == 2L)
    assert(finalRows(dir) == srcRows(v0.where($"key" <= 8L)))

    // a legitimate mass delete goes through with the explicit opt-in
    val forced = Incremental.reconcileDeletes(state(3), cfg, dir,
      maxDeleteFraction = 1.0)
    assert(forced.rowsSynced == 5L)
    assert(finalRows(dir) == srcRows(state(3)))

    // resurrect=false leaves tombstones alone even when keys reappear
    val stay = Incremental.reconcileDeletes(state(8), cfg, dir, resurrect = false)
    assert(stay.rowsSynced == 0L)
    assert(finalRows(dir) == srcRows(state(3)))

    // the source recovers keys 4..8: the sweep RESURRECTS them in place —
    // their versions sit at/below the watermark, so the poll tail alone
    // could never re-land them
    val healed = Incremental.reconcileDeletes(state(8), cfg, dir)
    assert(healed.rowsSynced == 5L)
    assert(finalRows(dir) == srcRows(state(8)))
  }

  test("resurrection never touches keys soft-deleted by explicit delete events") {
    val dir = Files.createTempDirectory("graft_soft_res").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 4)
    Incremental.snapshot(state(5).withColumn("op", lit("upsert")), cfg, dir,
      isDelete = col("op") === "delete")
    // logical-delete pattern: a delete EVENT for key 2 while the row stays
    // physically present at the source
    val feed = Seq((2L, 6L, "p2", "delete")).toDF("key", "seq", "payload", "op")
      .unionByName(state(5).withColumn("op", lit("upsert")))
    Incremental.poll(feed, cfg, dir, isDelete = col("op") === "delete")
    assert(finalRows(dir).map(_._1) == Set(1L, 3L, 4L, 5L))
    // key 2's tombstone carries the EVENT's seq (6), never equal to the
    // still-present source row's own seq (2) — the sweep must NOT resurrect
    val sweep = Incremental.reconcileDeletes(state(5), cfg, dir)
    assert(sweep.rowsSynced == 0L)
    assert(finalRows(dir).map(_._1) == Set(1L, 3L, 4L, 5L))
  }

  test("a replayed pre-delete batch cannot resurrect a reconciled key between sweeps") {
    val dir = Files.createTempDirectory("graft_replay_tomb").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 4)
    val v0 = state(5)
    Incremental.snapshot(v0, cfg, dir)

    // key 3 hard-deleted at the source; the sweep flags its mirror row IN
    // PLACE at its original version (3)
    Incremental.reconcileDeletes(v0.where($"key" =!= 3L), cfg, dir)
    assert(finalRows(dir).map(_._1) == Set(1L, 2L, 4L, 5L))

    // at-least-once redelivery of the PRE-delete batch: key 3 re-merges at
    // the exact version the tombstone carries — a max_by tie. The
    // (version, is_deleted) ordering key must keep the tombstone on top
    // immediately, not leave the winner to partition order until the next
    // sweep re-flags it.
    val replay = graft.operators.CdcOps.withMirrorMeta(
      v0, Seq("key"), "seq", lit(false), lit(1L))
    graft.streaming.CdcStream.upsertBatch(spark, replay, Seq("key"),
      "_peerdb_version", dir, cfg.nBuckets)
    assert(finalRows(dir).map(_._1) == Set(1L, 2L, 4L, 5L),
      "replayed pre-delete batch resurrected a reconciled key")
    // the collapsed mirror keeps exactly one row for key 3: the tombstone,
    // carrying the sweep's provenance marker
    val k3 = graft.sources.Mirror.readCommitted(spark, dir).where($"key" === 3L)
      .select("_peerdb_version", "_peerdb_is_deleted")
      .as[(Long, Int)].collect().toSeq
    assert(k3 == Seq((3L, Incremental.SweepFlag)))
  }

  test("resurrection never touches a flag-column soft delete, even at equal seq") {
    // the OTHER logical-delete pattern: the source keeps the row physically
    // present with a deleted flag column; marking it deleted bumps its seq,
    // so the tombstone's version EQUALS the still-present source row's seq —
    // the seq-equality heuristic alone would mistake it for a bad sweep.
    // Provenance (sweep flag 2 vs poll flag 1) must keep it deleted.
    val dir = Files.createTempDirectory("graft_flagcol").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 4)
    val del = col("deleted") === true
    Incremental.snapshot(state(5).withColumn("deleted", lit(false)), cfg, dir,
      isDelete = del)
    // the source soft-deletes key 2 in place: same row, deleted=true, seq 6
    val v1 = state(5).where($"key" =!= 2L).withColumn("deleted", lit(false))
      .unionByName(Seq((2L, 6L, "p2", true)).toDF("key", "seq", "payload", "deleted"))
    Incremental.poll(v1, cfg, dir, isDelete = del)
    assert(finalRows(dir).map(_._1) == Set(1L, 3L, 4L, 5L))
    // sweeps (any number) must not resurrect key 2 — it is logically
    // deleted, not sweep-tombstoned, however bad-sweep-like its seq looks
    for (_ <- 1 to 2) {
      val r = Incremental.reconcileDeletes(v1, cfg, dir)
      assert(r.rowsSynced == 0L)
      assert(finalRows(dir).map(_._1) == Set(1L, 3L, 4L, 5L),
        "sweep resurrected a flag-column soft delete")
    }
  }

  test("a sync under a stale bucket-count config is refused, not merged") {
    val dir = Files.createTempDirectory("graft_stale_cfg").toString + "/t"
    val cfg4 = TableConfig("t", Seq("key"), "seq", nBuckets = 4)
    Incremental.snapshot(state(10), cfg4, dir)
    val cfg8 = Incremental.rebucket(spark, cfg4, dir, 8)
    // a restarted process still holding the old config (the bucket count
    // now lives in the state file, like the watermark)
    for (op <- Seq(
      () => Incremental.poll(state(11), cfg4, dir),
      () => Incremental.reconcileDeletes(state(10), cfg4, dir),
      () => Incremental.rebucket(spark, cfg4, dir, 16))) {
      val boom = intercept[IllegalStateException](op())
      assert(boom.getMessage.contains("rebucket"), boom.getMessage)
    }
    // the correct config keeps working
    assert(Incremental.poll(state(11), cfg8, dir).rowsSynced == 1L)
    assert(finalRows(dir) == srcRows(state(11)))

    // snapshot() REDEFINES the layout, so it accepts any config — but must
    // retire the ENTIRE old (wider) layout, not just its own bucket range,
    // or mod-8 residue buckets would stay live beside the mod-4 snapshot
    val st = Incremental.snapshot(state(3), cfg4, dir)
    assert(st.nBuckets == 4)
    assert(finalRows(dir) == srcRows(state(3)),
      "re-snapshot under a narrower config left wide-layout rows live")
    assert(Incremental.poll(state(3, Seq((12L, 12L, "p12"))), cfg4, dir).rowsSynced == 1L)
  }

  test("a legacy state without a bucket count is layout-probed before syncing") {
    val dir = Files.createTempDirectory("graft_legacy_state").toString + "/t"
    val cfg8 = TableConfig("t", Seq("key"), "seq", nBuckets = 8)
    Incremental.snapshot(state(20), cfg8, dir)
    // rewrite the state as the pre-upgrade format (no nBuckets field)
    val st = Incremental.readState(spark, dir).get
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(dir, "_graft_sync_state.json"), true)
    try out.write(
      s"""{"watermark":${st.watermark},"batchId":${st.batchId},"syncedAtMs":${st.syncedAtMs}}"""
        .getBytes("UTF-8"))
    finally out.close()
    // a too-small config is caught by the layout probe (live ids >= count)
    val boom = intercept[IllegalStateException] {
      Incremental.poll(state(21), TableConfig("t", Seq("key"), "seq", nBuckets = 4), dir)
    }
    assert(boom.getMessage.contains("occupies bucket ids"), boom.getMessage)
    // even an IDLE poll under the matching config persists the adopted
    // count immediately — the layout probe's listing must not re-run on
    // every poll of a quiet table
    assert(Incremental.poll(state(20), cfg8, dir).rowsSynced == 0L)
    assert(Incremental.readState(spark, dir).get.nBuckets == 8)
    // and data-bearing syncs keep working
    assert(Incremental.poll(state(21), cfg8, dir).rowsSynced == 1L)
    assert(Incremental.readState(spark, dir).get.nBuckets == 8)
  }

  test("a sweep over a footerless empty mirror is a no-op, not a read failure") {
    val dir = Files.createTempDirectory("graft_sweep_empty").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 4)
    Incremental.snapshot(state(0), cfg, dir)
    val r = Incremental.reconcileDeletes(state(0), cfg, dir)
    assert(r.rowsSynced == 0L)
  }

  test("state survives a crash between the delete and the rename of the swap") {
    val dir = Files.createTempDirectory("graft_swap").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 2)
    val st = Incremental.snapshot(state(5), cfg, dir)

    // simulate the crash window: main file deleted, complete tmp left behind
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val main = new org.apache.hadoop.fs.Path(dir, "_graft_sync_state.json")
    val tmp = new org.apache.hadoop.fs.Path(dir, "_graft_sync_state.json.tmp")
    org.apache.hadoop.fs.FileUtil.copy(fs, main, fs, tmp, false,
      spark.sparkContext.hadoopConfiguration)
    fs.delete(main, false)

    // readState falls back to the tmp — capture resumes, never re-snapshots
    assert(Incremental.readState(spark, dir).contains(st))
    val r = Incremental.poll(state(5, Seq((6L, 6L, "p6"))), cfg, dir)
    assert(r.rowsSynced == 1L && r.state.watermark == 6L)
    assert(finalRows(dir) == srcRows(state(5, Seq((6L, 6L, "p6")))))

    // a torn tmp with no main file = torn first-ever write: genuinely no state
    fs.delete(main, false); fs.delete(tmp, false)
    val torn = fs.create(tmp, true)
    try torn.write("""{"watermark":12""".getBytes("UTF-8")) finally torn.close()
    assert(Incremental.readState(spark, dir).isEmpty)
  }
}
