package graft

import graft.sources.Mirror
import graft.streaming.CdcStream
import graft.streaming.CdcStream.Change
import graft.streaming.Monitor
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MirrorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("fullLoad + readFinal round-trips with mirror metadata") {
    val dir = Files.createTempDirectory("graft_full").toString + "/t"
    val src = Seq((1L, "a"), (2L, "b")).toDF("key", "payload")
    Mirror.fullLoad(src, dir, "key", lit(0L))
    val back = Mirror.readFinal(spark, dir, "key")
    assert(back.count() == 2)
    assert(back.columns.contains("_peerdb_version"))
    assert(back.where($"_peerdb_is_deleted" === 0).count() == 2)
  }

  test("a fullLoad over a live mirror is reader-atomic, like a re-snapshot") {
    val dir = Files.createTempDirectory("graft_full_reload").toString + "/t"
    Mirror.fullLoad(Seq((1L, "a"), (2L, "b")).toDF("key", "payload"),
      dir, "key", lit(0L), nBuckets = 4)
    val pinned = Mirror.readFinal(spark, dir, "key").select("key", "payload")
    // re-load with fresh content: the old generation must stay on disk for
    // the pinned reader (append + manifest swap, not a torn overwrite)
    Mirror.fullLoad(Seq((2L, "b2"), (3L, "c")).toDF("key", "payload"),
      dir, "key", lit(1L), nBuckets = 4)
    assert(Mirror.readFinal(spark, dir, "key").select("key", "payload")
      .as[(Long, String)].collect().toSet == Set((2L, "b2"), (3L, "c")))
    assert(pinned.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")),
      "pinned reader torn by fullLoad re-load")

    // a re-load with a SMALLER bucket count must retire the whole old
    // layout, not just buckets 0 until the new count
    Mirror.fullLoad(Seq((4L, "d")).toDF("key", "payload"),
      dir, "key", lit(2L), nBuckets = 2)
    assert(Mirror.readFinal(spark, dir, "key").select("key", "payload")
      .as[(Long, String)].collect().toSet == Set((4L, "d")),
      "narrower re-load left wide-layout rows live")
  }

  test("upsertBatch evaluates a non-deterministic batch exactly once") {
    // a live JDBC tail handed straight to upsertBatch: every evaluation
    // yields a different row. Without the batch materialization the touched
    // collect and the append could disagree, writing a row into a bucket
    // the manifest never adopts — silent loss.
    val dir = Files.createTempDirectory("graft_nd_upsert").toString + "/t"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("version",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.StringType)))
    val rdd = spark.sparkContext.parallelize(0 until 1, 1).mapPartitions { _ =>
      val n = MirrorSpec.evals.incrementAndGet()
      Iterator(org.apache.spark.sql.Row(100L + n, 1L, s"v$n"))
    }
    CdcStream.upsertBatch(spark, spark.createDataFrame(rdd, schema),
      Seq("key"), "version", dir, nBuckets = 8)
    assert(MirrorSpec.evals.get() == 1,
      s"batch evaluated ${MirrorSpec.evals.get()} times, want 1")
    // the one evaluated row is committed and visible
    assert(Mirror.readCommitted(spark, dir).select("key", "payload")
      .as[(Long, String)].collect().toSeq == Seq((101L, "v1")))
  }

  test("full load then incremental merge applies updates on top of the snapshot") {
    val dir = Files.createTempDirectory("graft_incr").toString + "/t"
    val snapshot = Seq(
      (1L, 0L, "insert", ts("2024-01-01 00:00:00"), "v0", false),
      (2L, 0L, "insert", ts("2024-01-01 00:00:00"), "w0", false)
    ).toDF("key", "version", "op", "ts", "payload", "is_deleted")
      .withColumn("_batch_id", lit(0L))
      .withColumn("bucket", pmod(hash(col("key")), lit(4)))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    snapshot.write.mode("overwrite").partitionBy("bucket").parquet(dir)

    val batch = Seq(Change(1L, 5L, "update", ts("2024-01-02 00:00:00"), "v5")).toDS()
    CdcStream.mergeBatch(spark, batch, dir, nBuckets = 4, deleteOp = "delete", batchId = 1L)

    val rows = Mirror.readCommitted(spark, dir).select("key", "version", "payload")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 5L, "v5"), (2L, 0L, "w0")))
  }

  test("mergeBatch is idempotent under batch replay") {
    val dir = Files.createTempDirectory("graft_replay").toString + "/t"
    val batch = Seq(
      Change(1L, 1L, "insert", ts("2024-01-01 00:00:00"), "v1"),
      Change(2L, 1L, "insert", ts("2024-01-01 00:00:10"), "w1")).toDS()
    CdcStream.mergeBatch(spark, batch, dir, 4, "delete", 1L)
    val first = Mirror.readCommitted(spark, dir).orderBy("key")
      .select("key", "version", "payload").as[(Long, Long, String)].collect().toSeq
    // replay the exact same batch (at-least-once delivery after a restart)
    CdcStream.mergeBatch(spark, batch, dir, 4, "delete", 1L)
    val second = Mirror.readCommitted(spark, dir).orderBy("key")
      .select("key", "version", "payload").as[(Long, Long, String)].collect().toSeq
    assert(first == second)
  }

  test("upsertBatch evolves the mirror schema when the source adds a column") {
    val dir = Files.createTempDirectory("graft_evolve").toString + "/t"
    val v1 = Seq((1L, 1L, "a")).toDF("key", "version", "payload")
    CdcStream.upsertBatch(spark, v1, Seq("key"), "version", dir, 4)
    // source gained a column; old mirror rows must read null for it
    val v2 = Seq((2L, 1L, "b", "extra-val")).toDF("key", "version", "payload", "extra")
    CdcStream.upsertBatch(spark, v2, Seq("key"), "version", dir, 4)

    val out = Mirror.readCommitted(spark, dir).orderBy("key")
      .select("key", "payload", "extra").as[(Long, String, Option[String])].collect().toSeq
    assert(out == Seq((1L, "a", None), (2L, "b", Some("extra-val"))))
  }

  test("parquet landing zone streams incrementally into the mirror via checkpoint") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft_landing")
    val landing = base.resolve("landing"); Files.createDirectory(landing)
    val target = base.resolve("mirror").toString
    val ckpt = base.resolve("ckpt").toString

    val changes = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id").as("key"), col("event_id").as("version"),
        col("event_type").as("op"), col("ts"), col("props").as("payload"))

    def land(chunk: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = base.resolve(s"stage_$name").toString
      chunk.coalesce(1).write.parquet(tmp)
      java.nio.file.Files.list(java.nio.file.Paths.get(tmp)).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach(p => Files.copy(p, landing.resolve(s"$name.parquet")))
    }
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(changes.schema).parquet(landing.toString)
        .as[Change](implicitly)
      CdcStream.mirrorToParquet(stream, target, ckpt, nBuckets = 4, deleteOp = "error")
        .awaitTermination()
    }

    land(changes.where(col("version") < 500), "c1")
    runOnce()
    assert(Mirror.readCommitted(spark, target).count() ==
      changes.where(col("version") < 500).select("key").distinct().count())

    land(changes.where(col("version") >= 500), "c2")
    runOnce()

    val mirror = Mirror.readCommitted(spark, target)
      .select("key", "version").as[(Long, Long)].collect().toMap
    val batch = operators.CdcOps.latestSnapshot(
        Tables.load(spark, "/root/testdata/sf0.001", "events"), Seq("user_id"), "event_id")
      .select(col("user_id"), col("event_id")).as[(Long, Long)].collect().toMap
    assert(mirror == batch)
  }

  test("ResourceMonitor captures stage metrics including shuffle bytes") {
    import org.apache.spark.sql.functions._
    val m = graft.streaming.ResourceMonitor.attach(spark)
    try {
      // a job with a real shuffle
      spark.range(0, 100000, 1, 4)
        .groupBy(pmod(col("id"), lit(97))).count().count()
      // listener bus is async — poll until the metrics land
      val deadline = System.currentTimeMillis() + 10000
      while (m.totals("shuffle_read_bytes") == 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val t = m.totals
      assert(t("stages") >= 2 && t("tasks") > 0)
      assert(t("shuffle_write_bytes") > 0 && t("shuffle_read_bytes") > 0)
    } finally spark.sparkContext.removeSparkListener(m)
  }

  test("Monitor records per-batch rows and throughput from streaming progress") {
    implicit val sqlCtx = spark.sqlContext
    val m = Monitor.attach(spark)
    val input = MemoryStream[Change]
    val q = CdcStream.runningLatest(input.toDS())
      .writeStream.format("memory").queryName("mon_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    try {
      input.addData(
        Change(1L, 1L, "insert", ts("2024-01-01 00:00:00"), "a"),
        Change(2L, 1L, "insert", ts("2024-01-01 00:00:01"), "b"))
      q.processAllAvailable()
      spark.streams.removeListener(m)
      // listener delivery is async; progress may land just after processAllAvailable
      val deadline = System.currentTimeMillis() + 10000
      while (m.totalRowsSynced < 2 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(m.totalRowsSynced >= 2)
      assert(m.batches.nonEmpty)
      assert(m.batches.forall(_.durationMs >= 0))
    } finally q.stop()
  }

  test("Monitor surfaces per-operator state rows for a stateful stream") {
    import graft.streaming.FunnelStream
    import graft.streaming.FunnelStream.FunnelEvent
    implicit val sqlCtx = spark.sqlContext
    val m = Monitor.attach(spark)
    val input = MemoryStream[FunnelEvent]
    val q = FunnelStream.levels(input.toDS(), Seq("signup", "click"),
        maxGapMicros = 3600L * 1000000)
      .writeStream.format("memory").queryName("mon_state_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    try {
      // three keys enter the funnel → three live state-store rows
      input.addData(
        FunnelEvent(1L, "signup", 1000), FunnelEvent(2L, "signup", 2000),
        FunnelEvent(3L, "signup", 3000))
      q.processAllAvailable()
      spark.streams.removeListener(m)
      val deadline = System.currentTimeMillis() + 10000
      def rows = m.latestStateRows.collectFirst {
        case ((qn, _), n) if qn == "mon_state_out" => n
      }
      while (!rows.exists(_ >= 3) && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(rows.contains(3L), s"stateOps=${m.stateOps}")
      // the flatMapGroupsWithState operator identifies itself by name, and
      // the batch updated exactly the three keys
      val latest = m.stateOps.filter(_.queryName == "mon_state_out")
        .maxBy(_.batchId)
      assert(latest.operatorName.nonEmpty)
      assert(latest.numRowsUpdated == 3)
    } finally q.stop()
  }

  test("Monitor surfaces the event-time clock: watermark, max event, lag") {
    import graft.streaming.DriftStream
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, lit}
    val m = Monitor.attach(spark)
    val input = MemoryStream[(java.sql.Timestamp, String, Long)]
    val q = DriftStream.abDrift(input.toDF().toDF("ts", "arm", "y"), "ts",
        lit(0L), col("arm") === "a", col("arm") === "b", col("y"),
        windowDur = "1 hour", watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("mon_clock_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:00"), "a", 1L), (ts("2024-01-01 00:00:10"), "b", 2L))
      q.processAllAvailable()
      // second batch: watermark derives from batch 1's max (00:00:10 - 10m),
      // freshest event now 01:00:00 -> lag is defined and positive
      input.addData((ts("2024-01-01 01:00:00"), "a", 3L))
      q.processAllAvailable()
      spark.streams.removeListener(m)
      val deadline = System.currentTimeMillis() + 10000
      def lag = m.latestEventTimeLag.get("mon_clock_out")
      while (!lag.exists(_ > 0) && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(lag.exists(_ > 0), s"clockStats=${m.clockStats}")
      // the latest DATA batch defines the reading; no-data batches (max
      // undefined) must have been skipped by the accessor
      val cs = m.clockStats.filter(c =>
        c.queryName == "mon_clock_out" && c.eventTimeLagMs >= 0).maxBy(_.batchId)
      assert(cs.maxEventTimeMs >= cs.watermarkMs)
      assert(cs.eventTimeLagMs == cs.maxEventTimeMs - cs.watermarkMs)
      assert(lag.contains(cs.eventTimeLagMs))
    } finally q.stop()
  }
}

object MirrorSpec {
  /** Evaluation counter for the non-deterministic-batch fixture. */
  val evals = new java.util.concurrent.atomic.AtomicInteger()
}
