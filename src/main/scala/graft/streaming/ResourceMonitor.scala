package graft.streaming

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Batch-side resource accounting — the analog of the reference monitor's
  * per-container resource logs (`peerdb-resource-usage-*.log` in
  * `testing-results/`), sourced from Spark's scheduler events instead of
  * docker stats: per completed stage, task counts, CPU/run time, shuffle
  * bytes in/out, and memory spill. Bounded ring buffer on the driver.
  */
final class ResourceMonitor(retain: Int = 4096) extends SparkListener {

  case class StageStat(stageId: Int, name: String, numTasks: Int,
                       runTimeMs: Long, cpuTimeNs: Long,
                       shuffleReadBytes: Long, shuffleWriteBytes: Long,
                       spillBytes: Long)

  private val stats = new ConcurrentLinkedQueue[StageStat]()

  override def onStageCompleted(event: SparkListenerStageCompleted): Unit = {
    val info = event.stageInfo
    val m = info.taskMetrics
    stats.add(StageStat(info.stageId, info.name.takeWhile(_ != '\n'), info.numTasks,
      m.executorRunTime, m.executorCpuTime,
      m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
      m.memoryBytesSpilled + m.diskBytesSpilled))
    while (stats.size() > retain) stats.poll()
  }

  /** Completed-stage stats, oldest first. */
  def stages: Seq[StageStat] = stats.asScala.toSeq

  /** Headline totals across retained stages. */
  def totals: Map[String, Long] = Map(
    "stages" -> stages.size.toLong,
    "tasks" -> stages.map(_.numTasks.toLong).sum,
    "run_time_ms" -> stages.map(_.runTimeMs).sum,
    "shuffle_read_bytes" -> stages.map(_.shuffleReadBytes).sum,
    "shuffle_write_bytes" -> stages.map(_.shuffleWriteBytes).sum,
    "spill_bytes" -> stages.map(_.spillBytes).sum)
}

object ResourceMonitor {
  /** Attach to the session's SparkContext. */
  def attach(spark: SparkSession, retain: Int = 4096): ResourceMonitor = {
    val m = new ResourceMonitor(retain)
    spark.sparkContext.addSparkListener(m)
    m
  }
}
