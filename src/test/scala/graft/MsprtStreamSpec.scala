package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.StatTests
import graft.streaming.MsprtStream

/** The live always-valid monitor's contract: a stream fed day-batches
  * emits readouts BIT-EQUAL to the batch `StatTests.msprt` day rows —
  * same exact cumulative integers, same scalar tree — and a replayed
  * batch id folds exactly once.
  */
class MsprtStreamSpec extends SparkSpec {
  import spark.implicits._
  import MsprtStreamSpec.Ev

  // the StatTestsSpec msprt fixture, split into its three days
  private val days = Seq(
    Seq((0L, 100L), (2L, 200L), (1L, 400L)),
    Seq((4L, 300L), (3L, 500L), (5L, 100L)),
    Seq((6L, 250L), (7L, 50L)))

  private def dayTs(d: Long) =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(d * 86400L))

  test("streamed msprt readouts equal the batch day rows bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("msprt_stream")
    val input = MemoryStream[Ev]
    val q = MsprtStream.monitor(input.toDF(), dir.toString,
      dir.resolve("ckpt").toString, col("u"), col("y"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      days.foreach { d =>
        input.addData(d.map { case (u, y) => Ev(u, y) }: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = MsprtStream.readouts(spark, dir.toString)
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().sortBy(_._1).map(r => (r._2, r._3, r._4, r._5, r._6, r._7))
      .toSeq
    val ev = days.zipWithIndex.flatMap { case (d, i) =>
      d.map { case (u, y) => (u, dayTs(i.toLong + 1), y) }
    }.toDF("u", "ts", "y")
    val batch = StatTests.msprt(ev, col("u"), col("y"), col("ts"))
      .as[(java.sql.Date, Long, Long, Double, Double, Double, Double)]
      .collect().sortBy(_._1.getTime)
      .map(r => (r._2, r._3, r._4, r._5, r._6, r._7)).toSeq
    assert(streamed.length == 3)
    assert(streamed == batch, s"\nstream: $streamed\nbatch:  $batch")
  }

  test("foldBatch is idempotent on batch id; undefined triggers emit none") {
    val dir = java.nio.file.Files.createTempDirectory("msprt_fold")
    // batch 0: arm A only → state recorded, NO readout (test undefined)
    val only = Seq((0L, 100L), (2L, 300L)).toDF("u", "y")
    MsprtStream.foldBatch(dir.toString, only, 0L, col("u"), col("y"), 10.0)
    assert(MsprtStream.readouts(spark, dir.toString).count() == 0)
    // batch 1: arm B arrives → defined readout
    val b = Seq((1L, 400L), (3L, 200L)).toDF("u", "y")
    MsprtStream.foldBatch(dir.toString, b, 1L, col("u"), col("y"), 10.0)
    val r1 = MsprtStream.readouts(spark, dir.toString)
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect()
    assert(r1.length == 1 && r1(0)._2 == 2L && r1(0)._3 == 2L)
    // replaying batch 1 (at-least-once delivery) must change NOTHING
    MsprtStream.foldBatch(dir.toString, b, 1L, col("u"), col("y"), 10.0)
    val r2 = MsprtStream.readouts(spark, dir.toString)
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect()
    assert(r2.toSeq == r1.toSeq)
  }
}

object MsprtStreamSpec {
  case class Ev(u: Long, y: Long)
}
