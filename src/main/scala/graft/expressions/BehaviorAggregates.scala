package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** SQL-surface aggregate forms of the ClickHouse behavior suite — the
  * shapes ClickHouse users type (`windowFunnel(w)(ts, cond…)`,
  * `sequenceMatch(…)`, `retention(cond…)`), registered in
  * [[GraftExtensions]] next to `media_info` so `spark.sql` reaches them
  * directly:
  *
  *   SELECT user_id, window_funnel(21600000000, ts,
  *            event_type = 'signup', event_type = 'click',
  *            event_type = 'purchase') AS funnel_level
  *   FROM events GROUP BY user_id
  *
  * Semantics are pinned to the library DataFrame twins
  * ([[graft.operators.Behavior]]): the eval step runs the SAME max-start /
  * max-reach DP over the group's time-sorted events, with equal-timestamp
  * rows reading the strictly-before snapshot — SqlSurfaceSpec asserts
  * answer equality on both paths.
  *
  * Scale posture, honestly stated: the funnel/sequence aggregates BUFFER
  * the group's (ts, condition-bitmask) pairs (12 bytes per event that
  * matches ≥1 condition) and sort at eval — the same per-key cost class as
  * ClickHouse's own windowFunnel implementation. That is the right shape
  * for GROUP BY user aggregation (per-key logs are human-scale); the
  * library window-DP form remains the one-shuffle whole-log scale path.
  * `retention` keeps a single Long bitmask — no buffering at all.
  */
object BehaviorAggregates {

  /** Evaluate `ts` (timestamp/ntz/long — all carry Long micros internally)
    * and the condition bitmask of one input row; empty mask rows are
    * dropped at update (they cannot advance any DP).
    */
  private[expressions] def rowEvent(ts: Expression, conds: Seq[Expression],
                                    input: InternalRow): Option[(Long, Int)] = {
    val t = ts.eval(input)
    if (t == null) return None
    var mask = 0
    var i = 0
    while (i < conds.length) {
      if (conds(i).eval(input) == true) mask |= 1 << i
      i += 1
    }
    if (mask == 0) None else Some((t.asInstanceOf[Long], mask))
  }

  /** The shared chain DP over time-sorted (ts, mask) events. `chainStart =
    * true` runs windowFunnel (starts carry the CHAIN start; the window
    * bounds last-step-to-start), false runs sequenceMatch/Levels (reaches
    * carry the row's OWN ts; the bound applies per hop). Equal-timestamp
    * groups read the pre-group snapshot — the strictly-before frame.
    * Returns the deepest level any row completes (0..k).
    */
  private[expressions] def chainLevel(events: ArrayBuffer[Long], k: Int,
                                      boundMicros: Long,
                                      chainStart: Boolean): Int = {
    val n = events.length / 2
    if (n == 0) return 0
    // sort pairs by ts: indices into the flat (ts, mask) buffer
    val order = Array.range(0, n)
    val sorted = order.sortBy(i => events(2 * i))
    val best = Array.fill(k)(Long.MinValue) // max start/reach over strictly-earlier rows
    val groupBest = new Array[Long](k)
    var level = 0
    var gi = 0
    while (gi < n) {
      val groupTs = events(2 * sorted(gi))
      var ge = gi
      java.util.Arrays.fill(groupBest, Long.MinValue)
      while (ge < n && events(2 * sorted(ge)) == groupTs) {
        val mask = events(2 * sorted(ge) + 1).toInt
        var s = 0
        while (s < k) {
          if ((mask & (1 << s)) != 0) {
            val v =
              if (s == 0) groupTs
              else if (best(s - 1) != Long.MinValue &&
                best(s - 1) >= groupTs - boundMicros) {
                if (chainStart) best(s - 1) else groupTs
              } else Long.MinValue
            if (v != Long.MinValue) {
              if (s + 1 > level) level = s + 1
              if (v > groupBest(s)) groupBest(s) = v
            }
          }
          s += 1
        }
        ge += 1
      }
      var s = 0
      while (s < k) {
        if (groupBest(s) > best(s)) best(s) = groupBest(s)
        s += 1
      }
      gi = ge
    }
    level
  }

  private[expressions] def serializeBuffer(buf: ArrayBuffer[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  private[expressions] def deserializeBuffer(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new ArrayBuffer[Long](bytes.length / 8)
    while (bb.remaining() >= 8) out += bb.getLong
    out
  }
}

/** Base of the buffered chain aggregates: collects (ts, mask) per row,
  * concatenates on merge, runs [[BehaviorAggregates.chainLevel]] at eval.
  */
abstract class ChainAgg extends TypedImperativeAggregate[ArrayBuffer[Long]] {
  def boundMicros: Long
  def ts: Expression
  def conds: Seq[Expression]
  def chainStart: Boolean

  // NOTE: arity/range validation lives in the GraftExtensions builders, not
  // here — a constructor-body require would also run inside Java's
  // serialization constructor, where the fields are still null (executor
  // deserialization would NPE)

  override def children: Seq[Expression] = ts +: conds
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ArrayBuffer[Long] = new ArrayBuffer[Long]()

  override def update(buffer: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    BehaviorAggregates.rowEvent(ts, conds, input).foreach { case (t, m) =>
      buffer += t += m.toLong
    }
    buffer
  }

  override def merge(buffer: ArrayBuffer[Long], other: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    buffer ++= other
    buffer
  }

  override def serialize(buffer: ArrayBuffer[Long]): Array[Byte] =
    BehaviorAggregates.serializeBuffer(buffer)

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] =
    BehaviorAggregates.deserializeBuffer(bytes)

  protected def level(buffer: ArrayBuffer[Long]): Int =
    BehaviorAggregates.chainLevel(buffer, conds.size, boundMicros, chainStart)
}

/** `window_funnel(window_micros, ts, cond1, …, condk)` → deepest step
  * (bigint, 0..k) some window-bounded strictly-ordered chain reaches —
  * the SQL twin of [[graft.operators.Behavior.windowFunnel]].
  */
case class WindowFunnelAgg(boundMicros: Long, ts: Expression, conds: Seq[Expression],
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0) extends ChainAgg {
  override def chainStart: Boolean = true
  override def dataType: DataType = LongType
  override def eval(buffer: ArrayBuffer[Long]): Any = level(buffer).toLong
  override def prettyName: String = "window_funnel"
  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ts = newChildren.head, conds = newChildren.tail)
}

/** `window_funnel_dedup(window_micros, ts, cond1, …, condk)` → the
  * ClickHouse `'strict_dedup'` funnel mode in SQL: a repeat of a condition
  * already matched in the active chain interrupts it (a first-condition
  * repeat restarts the chain at that event); result is the best level any
  * chain reached. Same buffered (ts, mask) state as the chain family;
  * eval sorts by (ts, mask) — a TOTAL order, so same-instant collisions
  * are deterministic (the DataFrame twin
  * [[graft.operators.Behavior.windowFunnelStrictDedup]] breaks ties by op
  * STRING instead; the two agree whenever per-key timestamps are
  * distinct, which SqlSurfaceSpec pins). An event matching several
  * conditions tries to ADVANCE first, then interrupt — advance wins.
  */
case class WindowFunnelDedupAgg(boundMicros: Long, ts: Expression,
                                conds: Seq[Expression],
                                mutableAggBufferOffset: Int = 0,
                                inputAggBufferOffset: Int = 0) extends ChainAgg {
  override def chainStart: Boolean = true // unused: custom eval below
  override def dataType: DataType = LongType

  override def eval(buffer: ArrayBuffer[Long]): Any = {
    val n = buffer.length / 2
    if (n == 0) return 0L
    val k = conds.size
    val order = Array.range(0, n).sortBy(i => (buffer(2 * i), buffer(2 * i + 1)))
    var lvl = 0
    var st = 0L
    var best = 0L
    var gi = 0
    while (gi < n) {
      val t = buffer(2 * order(gi))
      val mask = buffer(2 * order(gi) + 1).toInt
      if (lvl < k && ((mask >> lvl) & 1) == 1 &&
          (lvl == 0 || t - st <= boundMicros)) {
        if (lvl == 0) st = t
        lvl += 1
        if (lvl == k) { best = k.toLong; lvl = 0 }
        else if (lvl > best) best = lvl
      } else if (lvl > 0 && (mask & ((1 << lvl) - 1)) != 0) {
        // repeat of a matched condition: dedup interruption
        if (lvl > best) best = lvl
        if ((mask & 1) == 1) { lvl = 1; st = t } else lvl = 0
      } else if (lvl > 0 && lvl < k && ((mask >> lvl) & 1) == 1) {
        // the next expected condition, outside the window: chain expired
        if (lvl > best) best = lvl
        lvl = 0
      }
      gi += 1
    }
    best
  }

  override def prettyName: String = "window_funnel_dedup"
  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ts = newChildren.head, conds = newChildren.tail)
}

/** `sequence_level(gap_micros, ts, cond1, …)` → deepest per-hop-gap-bounded
  * step (bigint); `sequence_match` is `level == k` (boolean). SQL twins of
  * [[graft.operators.Behavior.sequenceLevels]] / `sequenceMatch`.
  */
case class SequenceLevelAgg(boundMicros: Long, ts: Expression, conds: Seq[Expression],
                            matched: Boolean,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0) extends ChainAgg {
  override def chainStart: Boolean = false
  override def dataType: DataType = if (matched) BooleanType else LongType
  override def eval(buffer: ArrayBuffer[Long]): Any =
    if (matched) level(buffer) == conds.size else level(buffer).toLong
  override def prettyName: String = if (matched) "sequence_match" else "sequence_level"
  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ts = newChildren.head, conds = newChildren.tail)
}

/** `window_funnel_strict(window_micros, ts, cond1, …, condk)` → deepest
  * step under strict ordering: steps must occur on CONSECUTIVE events of
  * the group's timeline — ANY intervening event breaks the chain, whether
  * it matches none of the funnel conditions or a different (out-of-order)
  * one. This is deliberately stricter than ClickHouse's documented
  * `'strict_order'` example (which only shows an unrelated event D
  * breaking A→B→C): an A,C,B,C stream scores level 1 here, because the
  * C between A and B is itself an intervention. The consecutive-events
  * rule is simpler to reason about and partition-deterministic; the
  * out-of-order-condition case is pinned by test. SQL twin of
  * [[graft.operators.Behavior.windowFunnelStrictOrder]]. Unlike the other
  * chain aggregates, NON-MATCHING rows must be buffered too (they are
  * what breaks chains), so update keeps every timestamped row including
  * mask 0. Eval mirrors the library's lag formulation: each event's
  * reachable chain-start vector derives only from the IMMEDIATELY
  * preceding event's vector (window bound on the chain start); total
  * (ts, mask) eval order keeps ties partitioning-deterministic.
  */
case class WindowFunnelStrictAgg(boundMicros: Long, ts: Expression,
                                 conds: Seq[Expression],
                                 mutableAggBufferOffset: Int = 0,
                                 inputAggBufferOffset: Int = 0) extends ChainAgg {
  override def chainStart: Boolean = true // unused: custom update/eval below

  override def update(buffer: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    // strict_order must SEE non-matching rows — they break chains — so
    // mask-0 events buffer too (the one chain aggregate that keeps them)
    val t = ts.eval(input)
    if (t != null) {
      var mask = 0
      var i = 0
      while (i < conds.length) {
        if (conds(i).eval(input) == true) mask |= 1 << i
        i += 1
      }
      buffer += t.asInstanceOf[Long] += mask.toLong
    }
    buffer
  }

  override def dataType: DataType = LongType

  override def eval(buffer: ArrayBuffer[Long]): Any = {
    val n = buffer.length / 2
    if (n == 0) return 0L
    val k = conds.size
    val order = Array.range(0, n).sortBy(i => (buffer(2 * i), buffer(2 * i + 1)))
    val none = Long.MinValue
    var prev = Array.fill(k + 1)(none)
    var cur = Array.fill(k + 1)(none)
    var best = 0L
    var gi = 0
    while (gi < n) {
      val t = buffer(2 * order(gi))
      val mask = buffer(2 * order(gi) + 1).toInt
      java.util.Arrays.fill(cur, none)
      if ((mask & 1) == 1) cur(1) = t
      var i = 2
      while (i <= k) {
        if (((mask >> (i - 1)) & 1) == 1 && prev(i - 1) != none &&
            prev(i - 1) >= t - boundMicros)
          cur(i) = prev(i - 1)
        i += 1
      }
      var lvl = k
      while (lvl >= 1 && cur(lvl) == none) lvl -= 1
      if (lvl > best) best = lvl
      val tmp = prev; prev = cur; cur = tmp
      gi += 1
    }
    best
  }

  override def prettyName: String = "window_funnel_strict"
  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ts = newChildren.head, conds = newChildren.tail)
}

/** `sequence_count(gap_micros, ts, cond1, …, condk)` → how many DISJOINT
  * per-hop-gap-bounded chains of the conditions the group's timeline
  * contains (bigint) — the ClickHouse `sequenceCount` shape, SQL twin of
  * [[graft.operators.Behavior.sequenceCount]]. Same greedy automaton:
  * an event matching the next expected condition inside the gap advances
  * (a completed chain counts and resets), a repeat of the just-matched
  * condition refreshes the gap clock to the later occurrence (never worse
  * — the exchange argument), anything matching the FIRST condition
  * restarts a dead chain at that event; priority advance > refresh >
  * restart when an event's mask matches several. Eval sorts the buffered
  * (ts, mask) pairs — a TOTAL order, so same-instant collisions are
  * partitioning-deterministic (the DataFrame twin breaks ties by op
  * string; the two agree on tie-free logs, which SqlSurfaceSpec pins).
  */
case class SequenceCountAgg(boundMicros: Long, ts: Expression,
                            conds: Seq[Expression],
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0) extends ChainAgg {
  override def chainStart: Boolean = false // unused: custom eval below
  override def dataType: DataType = LongType

  override def eval(buffer: ArrayBuffer[Long]): Any = {
    val n = buffer.length / 2
    if (n == 0) return 0L
    val k = conds.size
    val order = Array.range(0, n).sortBy(i => (buffer(2 * i), buffer(2 * i + 1)))
    var lvl = 0
    var lastTs = 0L
    var count = 0L
    var gi = 0
    while (gi < n) {
      val t = buffer(2 * order(gi))
      val mask = buffer(2 * order(gi) + 1).toInt
      if (lvl < k && ((mask >> lvl) & 1) == 1 &&
          (lvl == 0 || t - lastTs <= boundMicros)) {
        lvl += 1; lastTs = t
        if (lvl == k) { count += 1; lvl = 0 }
      } else if (lvl > 0 && ((mask >> (lvl - 1)) & 1) == 1) {
        lastTs = t // refresh to the later occurrence
      } else if ((mask & 1) == 1) {
        lvl = 1; lastTs = t // dead chain; restart here
      }
      gi += 1
    }
    count
  }

  override def prettyName: String = "sequence_count"
  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ts = newChildren.head, conds = newChildren.tail)
}

/** `sequence_match_pattern('(?1)(?t>=X)(?t<=Y)(?2)…', ts, cond1, …)` →
  * boolean — ClickHouse's literal `sequenceMatch` call shape with the
  * FULL pattern grammar, SQL twin of
  * [[graft.operators.Behavior.sequenceMatchPattern]]. The pattern is
  * parsed ONCE at registration (it must be a string literal); `hops`
  * carries (step index, loMicros, hiMicros) per ref. Eval sweeps the
  * buffered (ts, mask) events in time order keeping, per hop, the sorted
  * list of reach timestamps; a hop fires when binary search finds any
  * predecessor reach inside `[t − hi, t − lo]`. Because the intervals are
  * over timestamp VALUES with lo ≥ 1, same-instant events can never feed
  * each other — the answer is tie-independent and agrees with the
  * DataFrame twin's range-frame DP on ANY log, not just tie-free ones.
  * O(n log n · hops) per group.
  */
case class SequencePatternAgg(hops: Seq[(Int, Long, Long)], ts: Expression,
                              conds: Seq[Expression],
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0) extends ChainAgg {
  override def boundMicros: Long = 0L // unused: per-hop bounds in `hops`
  override def chainStart: Boolean = false // unused: custom eval below
  override def dataType: DataType = BooleanType

  override def eval(buffer: ArrayBuffer[Long]): Any = {
    val n = buffer.length / 2
    if (n == 0) return false
    val order = Array.range(0, n).sortBy(i => buffer(2 * i))
    val m = hops.size
    val reaches = Array.fill(m + 1)(new ArrayBuffer[Long]())
    // any predecessor reach inside [t - hi, t - lo]?
    def existsIn(list: ArrayBuffer[Long], t: Long, lo: Long, hi: Long): Boolean = {
      val floor = if (hi == Long.MaxValue) Long.MinValue else t - hi
      val ceil = t - lo
      if (ceil < floor) return false
      // lower bound of floor
      var a = 0; var b = list.length
      while (a < b) {
        val mid = (a + b) >>> 1
        if (list(mid) < floor) a = mid + 1 else b = mid
      }
      a < list.length && list(a) <= ceil
    }
    var gi = 0
    while (gi < n) {
      val t = buffer(2 * order(gi))
      val mask = buffer(2 * order(gi) + 1).toInt
      // compute every hop against the PRE-event lists, then insert — one
      // event can never satisfy two consecutive hops of the same chain
      var fired = 0L // bitset of hops this event reaches
      var i = m
      while (i >= 2) {
        val (step, lo, hi) = hops(i - 1)
        if (((mask >> step) & 1) == 1 && existsIn(reaches(i - 1), t, lo, hi))
          fired |= 1L << i
        i -= 1
      }
      if (((mask >> hops.head._1) & 1) == 1) fired |= 1L << 1
      if (((fired >> m) & 1L) == 1L) return true
      i = 1
      while (i <= m) {
        if (((fired >> i) & 1L) == 1L) reaches(i) += t
        i += 1
      }
      gi += 1
    }
    false
  }

  override def prettyName: String = "sequence_match_pattern"
  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ts = newChildren.head, conds = newChildren.tail)
}

/** `retention(cond0, cond1, …)` → array<boolean>: r(0) = cond0 held on any
  * row, r(i) = cond0 AND condi each held on some row (order-free) — the
  * ClickHouse retention array, SQL twin of
  * [[graft.operators.Behavior.retention]]'s per-key flags. State is ONE
  * Long bitmask; fully map-side combinable.
  */
case class RetentionAgg(conds: Seq[Expression],
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  // arity validation lives in the GraftExtensions builder (see ChainAgg note)

  override def children: Seq[Expression] = conds
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(BooleanType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array(0L)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    var i = 0
    while (i < conds.length) {
      if (conds(i).eval(input) == true) buffer(0) |= 1L << i
      i += 1
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    buffer(0) |= other(0)
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    val m = buffer(0)
    val c0 = (m & 1L) != 0
    new GenericArrayData(Array.tabulate(conds.size) { i =>
      if (i == 0) c0 else c0 && (m & (1L << i)) != 0
    })
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8)
    bb.putLong(buffer(0))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    Array(ByteBuffer.wrap(bytes).getLong)

  override def prettyName: String = "retention"
  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(conds = newChildren)
}
