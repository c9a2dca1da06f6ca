package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.StatTests
import graft.streaming.BootstrapStream

/** The live bootstrap monitor's contract: at every trigger its readout is
  * BIT-EQUAL to `StatTests.poissonBootstrapCi` run on everything streamed
  * SO FAR (deterministic weights make replicate sums additive — the
  * property the monitor exists to exploit); a replayed batch id folds
  * exactly once, including its first-seen units delta; restart resumes
  * from the durable state.
  */
class BootstrapStreamSpec extends SparkSpec {
  import spark.implicits._
  import BootstrapStreamSpec.Ev

  private val B = 40

  // three batches; unit 3 spans batches (first-seen logic must not
  // double-weigh it), unit 5 repeats inside one batch
  private val batches = Seq(
    Seq((1L, 100L), (2L, 250L), (3L, 40L)),
    Seq((3L, 60L), (4L, 500L), (5L, 90L), (5L, 10L)),
    Seq((6L, 330L), (7L, 70L), (8L, 210L), (9L, 55L)))

  private def batchCi(upTo: Int) = {
    val ev = batches.take(upTo).flatten.map { case (u, y) => ("g", u, y) }
      .toDF("g", "u", "y")
    StatTests.poissonBootstrapCi(ev, col("g"), col("u"), col("y"),
      b = B, alphaPermille = 25)
      .select(col("n_units"), col("mean"), col("ci_lo"), col("ci_hi"))
      .as[(Long, Double, Double, Double)].collect().head
  }

  test("streamed readouts equal the batch bootstrap at every prefix") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("boot_stream")
    val input = MemoryStream[Ev]
    val q = BootstrapStream.monitor(input.toDF(), dir.toString,
      dir.resolve("ckpt").toString, col("u"), col("y"), b = B,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      batches.foreach { d =>
        input.addData(d.map { case (u, y) => Ev(u, y) }: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = BootstrapStream.readouts(spark, dir.toString)
      .as[(Long, Long, Double, Double, Double)]
      .collect().sortBy(_._1).map(r => (r._2, r._3, r._4, r._5)).toSeq
    assert(streamed.length == 3)
    streamed.zipWithIndex.foreach { case (got, i) =>
      assert(got == batchCi(i + 1), s"prefix ${i + 1}")
    }
  }

  test("foldBatch replay folds once; restart resumes from durable state") {
    val dir = java.nio.file.Files.createTempDirectory("boot_fold")
    def fold(i: Int): Unit = BootstrapStream.foldBatch(dir.toString,
      batches(i).toDF("u", "y"), i.toLong, col("u"), col("y"), B, 25)
    fold(0)
    val r1 = BootstrapStream.readouts(spark, dir.toString)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(r1.length == 1 && r1.head._2 == 3L)
    // at-least-once replay: nothing changes — not the readout, not the
    // units relation, not the scalar sums feeding later batches
    fold(0)
    assert(BootstrapStream.readouts(spark, dir.toString)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq == r1)
    // "restart": a fresh fold call reloads everything from disk
    fold(1)
    fold(2)
    val fin = BootstrapStream.readouts(spark, dir.toString)
      .as[(Long, Long, Double, Double, Double)]
      .collect().sortBy(_._1).last
    assert((fin._2, fin._3, fin._4, fin._5) == batchCi(3))
  }
}

object BootstrapStreamSpec {
  case class Ev(u: Long, y: Long)
}
