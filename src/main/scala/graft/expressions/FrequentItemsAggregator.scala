package graft.expressions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch (the algorithm behind ClickHouse's
  * `topK()`): tracks at most `k` counters; any item whose true frequency
  * exceeds n/(k+1) is guaranteed to survive, and reported counts
  * underestimate true counts by at most n/(k+1).
  *
  * Spark ships no top-K-frequent aggregate; the exact formulation
  * (explode → groupBy → global sort) shuffles every distinct item. This
  * aggregator's state is a bounded k-entry map with map-side combine —
  * shuffle volume is k entries per partition regardless of corpus size,
  * which is the whole point at 100 TB.
  *
  * Merge follows Agarwal et al. ("Mergeable Summaries", PODS 2012): add
  * counters, then subtract the (k+1)-th largest count from all and drop
  * non-positive entries.
  */
class FrequentItemsAggregator(k: Int)
  extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < k => buf.updated(item, 1L)
      case None => // decrement-all step: drop items hitting zero
        buf.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    FrequentItemsAggregator.mergeCounters(a, b, k)

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (w, c) => (-c, w) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

/** WEIGHTED Misra-Gries — ClickHouse `topKWeighted(k)(item, weight)`:
  * each occurrence carries an integral weight (bytes, cents, counts) and
  * the guarantee is over TOTAL WEIGHT W: any item with true weight
  * > W/(k+1) survives, and reported weights underestimate by at most
  * W/(k+1). The insert step generalizes decrement-all: a new item under a
  * full sketch subtracts min(w, smallest counter) from every counter —
  * every subtracted unit accounts (k+1) units of total weight, which is
  * what preserves the bound. Merge is unchanged (the PODS-2012 counter
  * merge is already weight-agnostic). Non-positive weights are ignored.
  */
class WeightedFrequentItemsAggregator(k: Int)
  extends Aggregator[(String, Long), Map[String, Long], Seq[(String, Long)]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long],
                      in: (String, Long)): Map[String, Long] = {
    val (item, w) = in
    if (w <= 0) return buf
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + w)
      case None if buf.size < k => buf.updated(item, w)
      case None =>
        val m = buf.values.min
        if (w > m)
          buf.view.mapValues(_ - m).filter(_._2 > 0).toMap.updated(item, w - m)
        else buf.view.mapValues(_ - w).filter(_._2 > 0).toMap
    }
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    FrequentItemsAggregator.mergeCounters(a, b, k)

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (w, c) => (-c, w) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

object FrequentItemsAggregator {
  /** The PODS-2012 mergeable-summaries counter merge, shared with the
    * maintained [[graft.operators.TopKAgg]]'s state folder.
    */
  def mergeCounters(a: Map[String, Long], b: Map[String, Long],
                    k: Int): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (m, (w, c)) =>
      m.updated(w, m.getOrElse(w, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      val cut = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
      combined.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }
}

/** Folds ALREADY-SKETCHED Misra-Gries states (the `(item, count)` arrays a
  * [[FrequentItemsAggregator]] generation persists) into one state — the
  * union half of the maintained top-K pattern, exactly as `hll_union_agg`
  * is to `hll_sketch_agg`. Same mergeable-summaries bound: error grows to
  * at most n/(k+1) over the TOTAL weight n, regardless of merge order.
  */
class FreqStateMerger(k: Int)
  extends Aggregator[Seq[(String, Long)], Map[String, Long], Seq[(String, Long)]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long],
                      state: Seq[(String, Long)]): Map[String, Long] =
    FrequentItemsAggregator.mergeCounters(buf, state.toMap, k)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    FrequentItemsAggregator.mergeCounters(a, b, k)

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (w, c) => (-c, w) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
