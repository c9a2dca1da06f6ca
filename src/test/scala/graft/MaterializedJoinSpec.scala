package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.MaterializedJoin
import graft.operators.MaterializedJoin.Config
import graft.sources.SyncManifest

/** Incrementally-maintained join view. The gold contract checked after
  * EVERY batch: the maintained view equals the from-scratch inner join of
  * both sides' FINAL snapshots.
  */
class MaterializedJoinSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = Config("oid", "cid", "cid", nBuckets = 4)

  private def dA(rows: (Long, Long, String, Long, Boolean)*): DataFrame =
    rows.toDF("oid", "cid", "item", "_version", "is_deleted")

  private def dB(rows: (Long, String, Long, Boolean)*): DataFrame =
    rows.toDF("cid", "cname", "_version", "is_deleted")

  /** From-scratch recompute over the primary mirrors — the oracle. */
  private def recompute(root: String): Seq[(Long, Long, String, String)] = {
    import graft.operators.CdcOps
    def fin(dir: String, key: String) =
      CdcOps.softDeleteSnapshot(SyncManifest.readCommitted(spark, dir),
        Seq(key), "_version", coalesce(col("is_deleted"), lit(false)))
    val a = fin(s"$root/a_by_key", "oid").select("oid", "cid", "item")
    val b = fin(s"$root/b_by_key", "cid").select("cid", "cname")
    a.join(b, "cid").select("oid", "cid", "item", "cname")
      .as[(Long, Long, String, String)].collect().sortBy(_._1).toSeq
  }

  private def readView(root: String): Seq[(Long, Long, String, String)] = {
    val df = MaterializedJoin.read(spark, root, cfg)
    if (!df.columns.contains("oid")) Nil // view never saw a joinable batch
    else df.select("oid", "cid", "item", "cname")
      .as[(Long, Long, String, String)].collect().sortBy(_._1).toSeq
  }

  test("join view tracks inserts, updates on both sides, fk changes, deletes") {
    val root = java.nio.file.Files.createTempDirectory("mjoin").toString

    // batch 1: two customers, two orders
    MaterializedJoin.applyBatch(spark, root, cfg,
      Some(dA((1L, 10L, "ax", 1L, false), (2L, 20L, "by", 1L, false))),
      Some(dB((10L, "ann", 1L, false), (20L, "bob", 1L, false))),
      batchVersion = 1L)
    assert(readView(root) == Seq((1L, 10L, "ax", "ann"), (2L, 20L, "by", "bob")))
    assert(readView(root) == recompute(root))

    // batch 2: B-side update only — must propagate via the join index
    // (no ΔA at all)
    MaterializedJoin.applyBatch(spark, root, cfg,
      None, Some(dB((10L, "ANN", 2L, false))), batchVersion = 2L)
    assert(readView(root) == Seq((1L, 10L, "ax", "ANN"), (2L, 20L, "by", "bob")))
    assert(readView(root) == recompute(root))

    // batch 3: fk CHANGE — order 1 re-points from customer 10 to 20; a
    // later update of customer 10 must NOT resurrect the old pair
    MaterializedJoin.applyBatch(spark, root, cfg,
      Some(dA((1L, 20L, "ax2", 3L, false))), None, batchVersion = 3L)
    assert(readView(root) == Seq((1L, 20L, "ax2", "bob"), (2L, 20L, "by", "bob")))
    MaterializedJoin.applyBatch(spark, root, cfg,
      None, Some(dB((10L, "ann3", 4L, false))), batchVersion = 4L)
    assert(readView(root) == Seq((1L, 20L, "ax2", "bob"), (2L, 20L, "by", "bob")))
    assert(readView(root) == recompute(root))

    // batch 5: delete customer 20 → both join rows dissolve (inner join)
    MaterializedJoin.applyBatch(spark, root, cfg,
      None, Some(dB((20L, null.asInstanceOf[String], 5L, true))),
      batchVersion = 5L)
    assert(readView(root) == Nil)
    assert(readView(root) == recompute(root))

    // batch 6: customer 20 returns, plus an order with a dangling fk and
    // one with a NULL fk — neither may surface
    val nullFkRow = Seq((4L, "dz", 6L, false))
      .toDF("oid", "item", "_version", "is_deleted")
      .withColumn("cid", lit(null).cast("long"))
    MaterializedJoin.applyBatch(spark, root, cfg,
      Some(dA((3L, 99L, "cz", 6L, false)).unionByName(nullFkRow)),
      Some(dB((20L, "bob2", 6L, false))), batchVersion = 6L)
    assert(readView(root) == Seq((1L, 20L, "ax2", "bob2"), (2L, 20L, "by", "bob2")))
    assert(readView(root) == recompute(root))

    // batch 7: the dangling fk heals — customer 99 arrives
    MaterializedJoin.applyBatch(spark, root, cfg,
      None, Some(dB((99L, "zed", 7L, false))), batchVersion = 7L)
    assert(readView(root).map(_._1).contains(3L))
    assert(readView(root) == recompute(root))

    // batch 8: A-side delete
    MaterializedJoin.applyBatch(spark, root, cfg,
      Some(dA((2L, 20L, null.asInstanceOf[String], 8L, true))), None,
      batchVersion = 8L)
    assert(readView(root).map(_._1).sorted == Seq(1L, 3L))
    assert(readView(root) == recompute(root))

    // vacuum drops stale old-fk index copies; the view is unchanged
    MaterializedJoin.vacuumIndex(spark, root, cfg)
    val before = readView(root)
    MaterializedJoin.applyBatch(spark, root, cfg,
      None, Some(dB((10L, "ann9", 9L, false))), batchVersion = 9L)
    assert(readView(root) == before) // nothing references 10 anymore
    assert(readView(root) == recompute(root))
  }

  test("streaming maintenance: one multiplexed change feed keeps the view current") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("mjoin3").toString
    val ckpt = s"$root/ckpt"
    // union schema: (table, oid, cid, item, cname, _version, is_deleted)
    case class Chg(table: String, oid: java.lang.Long, cid: java.lang.Long,
                   item: String, cname: String, _version: Long,
                   is_deleted: Boolean)
    val input = MemoryStream[(String, java.lang.Long, java.lang.Long, String,
      String, Long, Boolean)]
    def runBatch(): Unit = {
      val q = MaterializedJoin.mirrorChanges(
        input.toDF().toDF("table", "oid", "cid", "item", "cname",
          "_version", "is_deleted"),
        "table", "orders", "customers",
        aCols = Seq("oid", "cid", "item", "_version", "is_deleted"),
        bCols = Seq("cid", "cname", "_version", "is_deleted"),
        root, cfg, ckpt)
      q.awaitTermination()
    }
    input.addData(
      ("customers", null, 10L: java.lang.Long, null, "ann", 1L, false),
      ("orders", 1L: java.lang.Long, 10L: java.lang.Long, "ax", null, 1L, false))
    runBatch()
    assert(readView(root) == Seq((1L, 10L, "ax", "ann")))
    // second microbatch (fresh query run over the same checkpoint):
    // B-side rename propagates, a second order arrives
    input.addData(
      ("customers", null, 10L: java.lang.Long, null, "ANN", 2L, false),
      ("orders", 2L: java.lang.Long, 10L: java.lang.Long, "by", null, 2L, false))
    runBatch()
    assert(readView(root) ==
      Seq((1L, 10L, "ax", "ANN"), (2L, 10L, "by", "ANN")))
    assert(readView(root) == recompute(root))
  }

  test("replaying a batch is a no-op; B-only bootstrap then A arrival") {
    val root = java.nio.file.Files.createTempDirectory("mjoin2").toString
    // B arrives before any A exists
    MaterializedJoin.applyBatch(spark, root, cfg,
      None, Some(dB((10L, "ann", 1L, false))), batchVersion = 1L)
    assert(readView(root).isEmpty)
    val a1 = dA((1L, 10L, "ax", 2L, false))
    MaterializedJoin.applyBatch(spark, root, cfg, Some(a1), None, 2L)
    val v = readView(root)
    assert(v == Seq((1L, 10L, "ax", "ann")))
    // replay the same batch: converges to the same view
    MaterializedJoin.applyBatch(spark, root, cfg, Some(a1), None, 2L)
    assert(readView(root) == v)
    assert(readView(root) == recompute(root))
  }

  test("warm-mirror batch runs a bounded driver-job chain (the latency budget)") {
    // at high batch cadence on a real cluster the batch cost is the
    // SEQUENTIAL driver-action chain, not data volume — pin the job count
    // the way ShuffleShapeSpec pins exchanges. Budget for a both-sides
    // batch over warm mirrors: 1 fused bucket-collect (A0: all three
    // mirror touched sets + the index probe's fk prune in ONE cache-local
    // job), 1 affected collect, 1 A-side merge + B-bucket collect, 1 view
    // commit write, 3 concurrent mirror merge writes — 7 structural jobs,
    // plus the broadcast-relation builds the merge joins run as their own
    // jobs (bounded by plan shape, not data): measured steady state is 15.
    // Before this budget existed the same batch ran ~50 jobs (per-target
    // bucket collects + AQE materializing every exchange of every tiny
    // maintenance plan as its own job — why applyBatch now runs in an
    // AQE-off child session). The assert carries headroom over 15 so a
    // Spark version bump doesn't flake it, while still catching either
    // regression class (each re-adds 3+ jobs at once).
    val root = java.nio.file.Files.createTempDirectory("mjoin_jobs").toString
    MaterializedJoin.applyBatch(spark, root, cfg,
      Some(dA((1L, 10L, "a1", 1L, false), (2L, 11L, "a2", 1L, false))),
      Some(dB((10L, "ann", 1L, false), (11L, "bob", 1L, false))), 1L)
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      MaterializedJoin.applyBatch(spark, root, cfg,
        Some(dA((1L, 11L, "a1x", 2L, false), (3L, 10L, "a3", 2L, false))),
        Some(dB((11L, "bea", 2L, false))), 2L)
      // listener events are posted asynchronously; give the bus a moment
      // (job STARTS all precede applyBatch's return — only delivery lags)
      Thread.sleep(500)
    } finally spark.sparkContext.removeSparkListener(listener)
    val jobs = counter.get()
    assert(jobs <= 20, s"warm-mirror applyBatch ran $jobs driver jobs — " +
      "the driver-latency budget (7 structural + broadcast builds, " +
      "measured 15) has regressed")
    assert(readView(root) == recompute(root))
  }

  test("mismatched fk/bKey Spark types fail loudly instead of pruning wrong buckets") {
    val root = java.nio.file.Files.createTempDirectory("mjoin4").toString
    val aInt = Seq((1, 10, "ax", 1L, false))
      .toDF("oid", "cid", "item", "_version", "is_deleted") // cid: INT
    val bLong = dB((10L, "ann", 1L, false)) // cid: LONG
    val e = intercept[IllegalArgumentException] {
      MaterializedJoin.applyBatch(spark, root,
        Config("oid", "cid", "cid", nBuckets = 4),
        Some(aInt), Some(bLong), batchVersion = 1L)
    }
    assert(e.getMessage.contains("type-sensitive"))
  }
}
