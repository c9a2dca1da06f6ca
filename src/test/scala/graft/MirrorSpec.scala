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

    val rows = spark.read.parquet(dir).select("key", "version", "payload")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 5L, "v5"), (2L, 0L, "w0")))
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
}
