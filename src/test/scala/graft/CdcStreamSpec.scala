package graft

import graft.streaming.CdcStream
import graft.streaming.CdcStream.{Change, Latest}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.nio.file.Files

class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("runningLatest emits only when a key's newest version advances") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val q = CdcStream.runningLatest(input.toDS())
      .writeStream.format("memory").queryName("latest_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Change(1L, 1L, "insert", ts("2024-01-01 00:00:00"), "v1"),
        Change(1L, 2L, "update", ts("2024-01-01 00:01:00"), "v2"),
        Change(2L, 1L, "insert", ts("2024-01-01 00:00:30"), "w1"))
      q.processAllAvailable()
      // stale + duplicate deliveries must not emit
      input.addData(
        Change(1L, 1L, "insert", ts("2024-01-01 00:00:00"), "v1"),
        Change(2L, 1L, "insert", ts("2024-01-01 00:00:30"), "w1"))
      q.processAllAvailable()
      input.addData(Change(2L, 3L, "delete", ts("2024-01-01 00:02:00"), "w3"))
      q.processAllAvailable()

      val out = spark.table("latest_out").as[Latest].collect()
      assert(out.length == 3) // (1,v2), (2,w1), (2,w3-delete); stale batch emitted nothing
      val last = out.filter(_.key == 2L).maxBy(_.version)
      assert(last.isDeleted && last.version == 3L)
      assert(out.filter(_.key == 1L).map(_.version).toSeq == Seq(2L))
    } finally q.stop()
  }

  test("streamed runningLatest converges to the batch latestSnapshot on real events") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id").as("key"), col("event_id").as("version"),
        col("event_type").as("op"), col("ts"), col("props").as("payload"))
      .as[Change].collect().sortBy(_.version)

    val input = MemoryStream[Change]
    val q = CdcStream.runningLatest(input.toDS(), deleteOp = "error")
      .writeStream.format("memory").queryName("golden_out")
      .outputMode(OutputMode.Update()).start()
    try {
      events.grouped(events.length / 3 + 1).foreach { chunk =>
        input.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      // final state per key = newest emitted row per key
      val streamed = spark.table("golden_out").as[Latest].collect()
        .groupBy(_.key).map { case (k, rows) => k -> rows.maxBy(_.version) }
      val batch = operators.CdcOps.latestSnapshot(
        Tables.load(spark, "/root/testdata/sf0.001", "events"),
        Seq("user_id"), "event_id")
        .select(col("user_id"), col("event_id"), col("event_type"))
        .as[(Long, Long, String)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap

      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (k, l) =>
        assert((l.version, l.op) == batch(k), s"key $k diverged")
      }
    } finally q.stop()
  }

  test("normalize dedups redelivered (key, version) pairs inside the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val q = CdcStream.normalize(input.toDF(), "ts", "key", "version")
      .writeStream.format("memory").queryName("norm_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Change(1L, 1L, "insert", ts("2024-01-01 00:00:00"), "a"),
        Change(1L, 1L, "insert", ts("2024-01-01 00:00:00"), "a"),
        Change(1L, 2L, "update", ts("2024-01-01 00:01:00"), "b"))
      q.processAllAvailable()
      assert(spark.table("norm_out").count() == 2)
    } finally q.stop()
  }

  test("streaming session windows close after the gap and match batch sessionization") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val input = MemoryStream[Change]
    val sessions = input.toDF().withWatermark("ts", "10 minutes")
      .groupBy(col("key"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("key"), col("session_window.start").as("s_start"), col("n_events"))
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Change(1L, 1L, "click", ts("2024-01-01 00:00:00"), "a"),
        Change(1L, 2L, "view", ts("2024-01-01 00:10:00"), "b"),  // same session
        Change(1L, 3L, "click", ts("2024-01-01 01:00:00"), "c")) // gap > 30m → new session
      q.processAllAvailable()
      // advance the watermark far enough to close both sessions
      input.addData(Change(2L, 9L, "click", ts("2024-01-01 06:00:00"), "z"))
      q.processAllAvailable()
      val rows = spark.table("sess_out").where(col("key") === 1L)
        .select("s_start", "n_events").as[(java.sql.Timestamp, Long)].collect().toMap
      assert(rows == Map(ts("2024-01-01 00:00:00") -> 2L, ts("2024-01-01 01:00:00") -> 1L))
      // agrees with the batch operator on the same data
      val batch = operators.CdcOps.sessionize(
          Seq((1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:10:00")),
            (1L, ts("2024-01-01 01:00:00"))).toDF("key", "t"),
          Seq("key"), "t", 1800L)
        .groupBy(col("key")).agg(max(col("session_seq")).as("n")).as[(Long, Long)].head()
      assert(batch == (1L, 2L))
    } finally q.stop()
  }

  test("stream-stream interval join pairs events within the time bound") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val purchases = MemoryStream[Change]
    val clicks = MemoryStream[Change]
    val joined = purchases.toDF().withWatermark("ts", "1 hour")
      .select(col("key").as("p_key"), col("version").as("p_version"), col("ts").as("p_ts"))
      .join(
        clicks.toDF().withWatermark("ts", "1 hour")
          .select(col("key").as("c_key"), col("version").as("c_version"), col("ts").as("c_ts")),
        expr("""p_key = c_key AND c_ts <= p_ts AND c_ts >= p_ts - INTERVAL 30 MINUTES"""))
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(
        Change(1L, 10L, "click", ts("2024-01-01 00:00:00"), "c1"),
        Change(1L, 11L, "click", ts("2024-01-01 02:00:00"), "c2"), // too old for the purchase below? no — later
        Change(2L, 12L, "click", ts("2024-01-01 00:00:00"), "c3"))
      purchases.addData(
        Change(1L, 20L, "purchase", ts("2024-01-01 00:10:00"), "p1"), // pairs with c1 only
        Change(2L, 21L, "purchase", ts("2024-01-01 01:00:00"), "p2")) // c3 is 60min old → no pair
      q.processAllAvailable()
      val rows = spark.table("ssj_out")
        .select("p_version", "c_version").as[(Long, Long)].collect().toSet
      assert(rows == Set((20L, 10L)))
    } finally q.stop()
  }

  test("windowed streaming aggregation honors the watermark (late rows dropped)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val input = MemoryStream[Change]
    val agg = input.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("op"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("op"), col("n"))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Change(1L, 1L, "insert", ts("2024-01-01 00:05:00"), "a"),
        Change(2L, 2L, "insert", ts("2024-01-01 00:40:00"), "b"))
      q.processAllAvailable()
      // advance watermark far past the first window, then send a late row into it
      input.addData(Change(3L, 3L, "insert", ts("2024-01-01 03:00:00"), "c"))
      q.processAllAvailable()
      input.addData(Change(4L, 4L, "insert", ts("2024-01-01 00:10:00"), "late"))
      q.processAllAvailable()
      input.addData(Change(5L, 5L, "insert", ts("2024-01-01 05:00:00"), "d"))
      q.processAllAvailable()

      val rows = spark.table("win_out")
        .select("ws", "n").as[(java.sql.Timestamp, Long)].collect().toMap
      // first window closed with exactly 2 rows; the late row never reopened it
      assert(rows(ts("2024-01-01 00:00:00")) == 2L)
    } finally q.stop()
  }

  test("mirrorToParquet maintains newest-version-per-key across microbatches") {
    implicit val sqlCtx = spark.sqlContext
    val target = Files.createTempDirectory("graft_mirror").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val input = MemoryStream[Change]
    input.addData(
      Change(1L, 1L, "insert", ts("2024-01-01 00:00:00"), "v1"),
      Change(2L, 1L, "insert", ts("2024-01-01 00:00:10"), "w1"))
    val q1 = CdcStream.mirrorToParquet(input.toDS(), target, ckpt, nBuckets = 4)
    q1.awaitTermination()
    input.addData(
      Change(1L, 2L, "update", ts("2024-01-01 00:01:00"), "v2"),
      Change(3L, 1L, "insert", ts("2024-01-01 00:01:30"), "x1"))
    val q2 = CdcStream.mirrorToParquet(input.toDS(), target, ckpt, nBuckets = 4)
    q2.awaitTermination()

    val mirror = graft.sources.Mirror.readCommitted(spark, target)
      .select("key", "version", "payload").as[(Long, Long, String)]
      .collect().sortBy(_._1)
    assert(mirror.toSeq == Seq((1L, 2L, "v2"), (2L, 1L, "w1"), (3L, 1L, "x1")))
  }

  test("a streamed mirror adopts the polled lifecycle; the sweep then drops hard-deleted keys") {
    implicit val sqlCtx = spark.sqlContext
    val target = Files.createTempDirectory("graft_adopt").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_adopt_ckpt").toString
    val input = MemoryStream[Change]
    input.addData(
      Change(1L, 1L, "insert", ts("2024-01-01 00:00:00"), "a"),
      Change(2L, 2L, "insert", ts("2024-01-01 00:00:01"), "b"),
      Change(3L, 3L, "insert", ts("2024-01-01 00:00:02"), "c"),
      Change(2L, 4L, "delete", ts("2024-01-01 00:00:03"), "b"), // logical delete
      Change(1L, 5L, "update", ts("2024-01-01 00:00:04"), "a2"))
    CdcStream.mirrorToParquet(input.toDS(), target, ckpt, nBuckets = 4)
      .awaitTermination()
    val cfg = graft.sources.TableConfig("t", Seq("key"), "version", nBuckets = 4)

    // un-adopted, the sweep refuses with the adoption contract by name —
    // a streamed mirror previously had NO hard-delete reconciliation story
    val live = Seq((1L, 5L)).toDF("key", "version")
    val err = intercept[IllegalStateException](
      graft.sources.Incremental.reconcileDeletes(live, cfg, target))
    assert(err.getMessage.contains("adoptMirror"), err.getMessage)

    val st = graft.sources.Incremental.adoptMirror(spark, target, cfg)
    assert(st.watermark == 5L && st.nBuckets == 4)
    // the conversion preserved FINAL semantics: key 2's logical delete holds
    def finalKeys() = graft.sources.Mirror.readFinal(spark, target, "key")
      .select("key").as[Long].collect().toSet
    assert(finalKeys() == Set(1L, 3L))

    // hard delete at the source: key 3 vanishes with no change row; the
    // sweep flags it and FINAL drops it
    val r = graft.sources.Incremental.reconcileDeletes(live, cfg, target)
    assert(r.rowsSynced == 1L)
    assert(finalKeys() == Set(1L))

    // and the synthesized watermark resumes the poll tail exactly: only
    // rows above version 5 land
    val src = Seq(
      (1L, 5L, "update", ts("2024-01-01 00:00:04"), "a2"), // at watermark: skip
      (4L, 6L, "insert", ts("2024-01-01 00:00:05"), "d"))
      .toDF("key", "version", "op", "ts", "payload")
    val p = graft.sources.Incremental.poll(src, cfg, target)
    assert(p.rowsSynced == 1L && p.state.watermark == 6L)
    assert(finalKeys() == Set(1L, 4L))

    // adopting twice is refused — it is a polled mirror now
    val dup = intercept[IllegalStateException](
      graft.sources.Incremental.adoptMirror(spark, target, cfg))
    assert(dup.getMessage.contains("already has capture state"), dup.getMessage)
  }

  test("first batch succeeds over debris from a failed first write") {
    // a part file under _temporary (failed-job leftover) has no footer that
    // spark.read.parquet would ever read — it must count as "no data files",
    // or every retry of the first batch wedges on it
    val target = Files.createTempDirectory("graft_debris").toString + "/t"
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val junk = new org.apache.hadoop.fs.Path(
      target, "_temporary/0/task_0/part-00000.parquet")
    val out = fs.create(junk, true)
    try out.write(Array[Byte](1, 2, 3)) finally out.close()

    val batch = Seq((1L, 1L, "v1"), (2L, 1L, "w1")).toDF("key", "version", "payload")
    CdcStream.upsertBatch(spark, batch, Seq("key"), "version", target, nBuckets = 2)
    val mirror = graft.sources.Mirror.readCommitted(spark, target)
      .select("key", "version", "payload").as[(Long, Long, String)]
      .collect().sortBy(_._1)
    assert(mirror.toSeq == Seq((1L, 1L, "v1"), (2L, 1L, "w1")))
  }
}
