package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Pipeline monitoring — the Spark twin of the reference's
  * `peerdb_psql_clickhouse_monitor.ps1`, which polls per-mirror batch ids,
  * rows synced, and docker resource usage. Here the signal comes from
  * Structured Streaming's progress events: one [[BatchStat]] per microbatch
  * with rows in, processing time, and rows/sec, retained in a bounded
  * in-memory ring (the driver-side footprint is O(retain), independent of
  * stream length).
  */
final class Monitor(retain: Int = 1024) extends StreamingQueryListener {

  /** One microbatch's sync statistics. */
  case class BatchStat(queryName: String, batchId: Long, numInputRows: Long,
                       inputRowsPerSecond: Double, processedRowsPerSecond: Double,
                       durationMs: Long)

  /** One stateful operator's store footprint in one microbatch — the lag
    * table's analog for state (the stateful ops: funnel levels, streaming
    * dedup, session windows, interval joins). `numRowsTotal` is the live
    * store size; watch it level off (TTL working) or grow without bound
    * (missing watermark/TTL — the classic streaming leak).
    */
  case class StateStat(queryName: String, batchId: Long, operatorName: String,
                       numRowsTotal: Long, numRowsUpdated: Long,
                       numRowsRemoved: Long, memoryUsedBytes: Long)

  /** Event-time clock position of one microbatch: the watermark and the
    * max event time the batch saw, both as epoch millis (−1 when absent —
    * stateless queries carry no watermark), plus the EVENT-TIME LAG
    * `maxEventTime − watermark`: how far the emitted-results clock trails
    * the freshest data. A lag that grows batch over batch means closed
    * windows are falling further behind the live edge — the event-time
    * twin of the row-lag table.
    */
  case class ClockStat(queryName: String, batchId: Long, watermarkMs: Long,
                       maxEventTimeMs: Long, eventTimeLagMs: Long)

  private val stats = new ConcurrentLinkedQueue[BatchStat]()
  private val states = new ConcurrentLinkedQueue[StateStat]()
  private val clocks = new ConcurrentLinkedQueue[ClockStat]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    stats.add(BatchStat(
      name, p.batchId, p.numInputRows,
      safe(p.inputRowsPerSecond), safe(p.processedRowsPerSecond),
      p.durationMs.asScala.values.map(_.longValue).sum))
    while (stats.size() > retain) stats.poll()
    p.stateOperators.foreach { so =>
      states.add(StateStat(name, p.batchId,
        Option(so.operatorName).getOrElse(""), so.numRowsTotal,
        so.numRowsUpdated, so.numRowsRemoved, so.memoryUsedBytes))
    }
    while (states.size() > retain) states.poll()
    val et = Option(p.eventTime).map(_.asScala)
      .getOrElse(scala.collection.mutable.Map.empty[String, String])
    if (et.nonEmpty) {
      val wm = parseIsoMs(et.get("watermark"))
      val mx = parseIsoMs(et.get("max"))
      clocks.add(ClockStat(name, p.batchId, wm, mx,
        if (wm >= 0 && mx >= 0) mx - wm else -1L))
      while (clocks.size() > retain) clocks.poll()
    }
  }

  private def parseIsoMs(s: Option[String]): Long =
    s.flatMap(v => scala.util.Try(java.time.Instant.parse(v).toEpochMilli).toOption)
      .getOrElse(-1L)

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  private def safe(d: Double) = if (d.isNaN || d.isInfinite) 0.0 else d

  /** Snapshot of retained batch stats, oldest first. */
  def batches: Seq[BatchStat] = stats.asScala.toSeq

  /** Total rows synced across retained batches (monitor's headline number). */
  def totalRowsSynced: Long = batches.map(_.numInputRows).sum

  /** Mean processed-rows/sec over retained non-empty batches. */
  def meanThroughput: Double = {
    val bs = batches.filter(_.numInputRows > 0)
    if (bs.isEmpty) 0.0 else bs.map(_.processedRowsPerSecond).sum / bs.size
  }

  /** Snapshot of retained per-operator state stats, oldest first. */
  def stateOps: Seq[StateStat] = states.asScala.toSeq

  /** Latest live state-store row count per (query, operator) — the number
    * an alert compares against its expected keyspace.
    */
  def latestStateRows: Map[(String, String), Long] =
    stateOps.groupBy(s => (s.queryName, s.operatorName))
      .view.mapValues(_.maxBy(_.batchId).numRowsTotal).toMap

  /** Snapshot of retained event-time clock stats, oldest first. */
  def clockStats: Seq[ClockStat] = clocks.asScala.toSeq

  /** Latest DEFINED event-time lag (max event − watermark, millis) per
    * query. No-data batches advance the watermark but see no events (no
    * `max`), so their lag is undefined — the latest batch that actually
    * carried data is the operationally meaningful reading. Queries that
    * never established both clocks are absent.
    */
  def latestEventTimeLag: Map[String, Long] =
    clockStats.filter(_.eventTimeLagMs >= 0).groupBy(_.queryName)
      .view.mapValues(_.maxBy(_.batchId).eventTimeLagMs).toMap
}

object Monitor {
  /** Attach a monitor to the session's streams. */
  def attach(spark: SparkSession, retain: Int = 1024): Monitor = {
    val m = new Monitor(retain)
    spark.streams.addListener(m)
    m
  }
}
