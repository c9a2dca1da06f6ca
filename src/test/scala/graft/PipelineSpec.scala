package graft

import graft.operators.CdcOps
import graft.streaming.{CdcStream, Monitor}
import graft.streaming.CdcStream.Change
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The whole reference pipeline, end to end: initial snapshot load (batch
  * 0), streamed incremental batches, ReplacingMergeTree-FINAL reads with
  * soft deletes, and monitoring — equivalent to PeerDB initial-load +
  * CDC mirror + monitor against the events change log.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot + streamed increments converge to the batch soft-delete snapshot") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_pipeline")
    val target = base.resolve("mirror").toString
    val ckpt = base.resolve("ckpt").toString

    val changes = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id").as("key"), col("event_id").as("version"),
        col("event_type").as("op"), col("ts"), col("props").as("payload"))
      .as[Change]

    // phase 1: initial snapshot = latest state of the first 60% of the log,
    // applied as batch 0 (how PeerDB seeds the target before tailing WAL)
    val snapshot = CdcOps.latestSnapshot(
      changes.where(col("version") < 600).toDF(), Seq("key"), "version").as[Change]
    CdcStream.mergeBatch(spark, snapshot, target, nBuckets = 8,
      deleteOp = "error", batchId = 0L)

    // phase 2: tail the rest as two streamed microbatches, monitored
    val monitor = Monitor.attach(spark)
    val input = MemoryStream[Change]
    val tail = changes.where(col("version") >= 600).collect().sortBy(_.version)
    input.addData(tail.take(tail.length / 2).toIndexedSeq)
    CdcStream.mirrorToParquet(input.toDS(), target, ckpt, nBuckets = 8,
      deleteOp = "error").awaitTermination()
    input.addData(tail.drop(tail.length / 2).toIndexedSeq)
    CdcStream.mirrorToParquet(input.toDS(), target, ckpt, nBuckets = 8,
      deleteOp = "error").awaitTermination()
    spark.streams.removeListener(monitor)

    // FINAL read with soft deletes == batch soft-delete snapshot of the log
    val mirrorFinal = spark.read.parquet(target)
      .where(!col("is_deleted"))
      .select(col("key"), col("version")).as[(Long, Long)].collect().toMap
    val expected = CdcOps.softDeleteSnapshot(
        Tables.load(spark, "/root/testdata/sf0.001", "events"),
        Seq("user_id"), "event_id", col("event_type") === "error")
      .select(col("user_id"), col("event_id")).as[(Long, Long)].collect().toMap
    assert(mirrorFinal == expected)

    // the monitor saw every streamed row; >= because restarting the stream
    // replays the last uncommitted batch (at-least-once, idempotent merge)
    val deadline = System.currentTimeMillis() + 10000
    while (monitor.totalRowsSynced < tail.length && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(monitor.totalRowsSynced >= tail.length)
    assert(monitor.batches.count(_.numInputRows > 0) >= 2)
  }
}
