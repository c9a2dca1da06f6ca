package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** LIVE funnel levels over a CDC event stream — the streaming twin of
  * [[graft.operators.Behavior.sequenceLevels]], for the monitor table that
  * shows "how deep is each user in the signup→click→purchase sequence
  * RIGHT NOW" without rescanning the log per refresh.
  *
  * The per-key state IS the batch DP's reach vector: `reach(i)` = the
  * latest timestamp at which some chain with per-hop gaps ≤ `maxGapMicros`
  * completed step i+1. Each event updates it in O(k); emitted level =
  * deepest set entry. Processing events per key in event-time order makes
  * the result EXACTLY equal the batch `sequenceLevels` over everything
  * delivered (spec-pinned): within a microbatch the group iterator is
  * sorted here; across microbatches the mirror feed is time-ordered by
  * construction, and a straggler older than an already-applied later
  * event can only under-advance (never corrupt) the DP — the documented
  * at-least-once posture, same as the batch twin re-run on a reordered
  * prefix.
  *
  * State is k longs per key, forever (funnels are typically bounded-life:
  * expire keys with `stateTtl` — event-time timeout against the
  * watermark — when the keyspace is unbounded).
  */
object FunnelStream {

  /** One funnel-relevant event. `tsMicros` = exact event-time micros. */
  case class FunnelEvent(key: Long, op: String, tsMicros: Long)

  /** Emitted whenever a key's level deepens. */
  case class FunnelLevel(key: Long, level: Int)

  /** Apply one equal-timestamp group of events: reads see the snapshot,
    * writes land after. The `snapshot(i−1) < e.tsMicros` STRICT comparison
    * carries the batch DP's strictly-before frame across microbatch
    * boundaries too (a prior-batch reach at the same instant must not
    * complete the hop) and rejects stragglers older than an
    * already-applied reach (a negative gap is not a chain). An op may
    * appear at SEVERAL step positions (A,B,A funnels): every matching
    * index advances independently, exactly as the batch DP evaluates each
    * `__reach_i` column on its own.
    */
  private def applyGroup(group: Seq[FunnelEvent], reach: Array[Long],
                         steps: Seq[String], maxGapMicros: Long): Unit = {
    val snapshot = reach.clone()
    group.foreach { e =>
      var i = 0
      while (i < steps.size) {
        if (steps(i) == e.op) {
          if (i == 0) reach(0) = math.max(reach(0), e.tsMicros)
          else if (snapshot(i - 1) != Long.MinValue &&
              snapshot(i - 1) < e.tsMicros &&
              e.tsMicros - snapshot(i - 1) <= maxGapMicros)
            reach(i) = math.max(reach(i), e.tsMicros)
        }
        i += 1
      }
    }
  }

  /** Set an event-time watermark on a funnel stream from its `tsMicros` —
    * REQUIRED before [[levels]] with `stateTtl` (event-time timeouts only
    * run against a watermark; without one the query fails at start).
    * Derives a timestamp column, marks it, and returns the typed view.
    */
  def withEventTimeWatermark(events: Dataset[FunnelEvent],
                             delay: java.time.Duration): Dataset[FunnelEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("__ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.col("tsMicros")))
      .withWatermark("__ts", s"${delay.toMillis} milliseconds")
      .as[FunnelEvent]
  }

  /** Build the update-mode levels stream. `events` may be a streaming or
    * batch Dataset; with `stateTtl` set, keys idle past the TTL (by
    * watermark — set one with [[withEventTimeWatermark]]) are dropped from
    * the state store.
    */
  def levels(events: Dataset[FunnelEvent], steps: Seq[String],
             maxGapMicros: Long,
             stateTtl: Option[java.time.Duration] = None): Dataset[FunnelLevel] = {
    require(steps.size >= 2, "need at least two funnel steps")
    require(maxGapMicros > 0, s"bad maxGapMicros=$maxGapMicros")
    val spark = events.sparkSession
    import spark.implicits._
    implicit val stateEnc: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    val k = steps.size
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout

    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update(), timeout) {
        (key: Long, it: Iterator[FunnelEvent], state: GroupState[Seq[Long]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val reach = state.getOption.map(_.toArray)
              .getOrElse(Array.fill(k)(Long.MinValue))
            def levelOf: Int = reach.lastIndexWhere(_ != Long.MinValue) + 1
            val before = levelOf
            // event-time order within the batch (the DP is order-
            // sensitive), and equal-timestamp events read the PRE-
            // timestamp state — the batch DP's strictly-before frame
            val sorted = it.toSeq.sortBy(e => (e.tsMicros, e.op))
            var rest = sorted
            while (rest.nonEmpty) {
              val (grp, tail) = rest.span(_.tsMicros == rest.head.tsMicros)
              applyGroup(grp, reach, steps, maxGapMicros)
              rest = tail
            }
            // skip the write for keys that never touched the funnel: a
            // high-cardinality noise stream must not pin an all-empty
            // reach vector per key in the state store forever
            if (state.exists || reach.exists(_ != Long.MinValue))
              state.update(reach.toSeq)
            if (state.exists) stateTtl.foreach { ttl =>
              // clamp to the watermark: a straggler's event time may lie
              // behind it, and a timeout below the watermark is rejected
              // by the state store (killing the query)
              val lastMs = sorted.lastOption.map(_.tsMicros / 1000L).getOrElse(0L)
              val base = math.max(lastMs, state.getCurrentWatermarkMs())
              state.setTimeoutTimestamp(base + ttl.toMillis)
            }
            val after = levelOf
            if (after > before) Iterator.single(FunnelLevel(key, after))
            else Iterator.empty
          }
      }
  }
}
