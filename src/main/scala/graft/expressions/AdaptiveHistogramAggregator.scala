package graft.expressions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** ClickHouse `histogram(maxBins)`-style ADAPTIVE histogram: a bounded
  * set of bins that places itself where the data is (a streaming
  * merge-closest-pair scheme, Ben-Haim & Tom-Tov's streaming-decision-tree
  * histogram), vs the fixed-width grid of the exact `value_histogram`
  * query. State is ≤ `maxBins` bins of (min, max, centroid, count): O(k)
  * per group at any corpus size, map-side combinable.
  *
  * Tracking per-bin min/max (ClickHouse does the same) makes the reported
  * bounds EXACT containment bounds, so two contracts hold regardless of
  * merge order: heights sum to the true row count (mass conservation),
  * and every ingested value lies inside its bin's [lower, upper]. Bin
  * PLACEMENT, like ClickHouse's, is merge-order-dependent — the
  * deterministic contracts are what the spec pins, the one-partition case
  * is exactly reproducible.
  *
  * Output: (lower, upper, height) triples ordered by centroid.
  */
class AdaptiveHistogramAggregator(maxBins: Int)
  extends Aggregator[Double, Vector[(Double, Double, Double, Long)],
    Seq[(Double, Double, Long)]] {
  require(maxBins >= 2, s"bad maxBins=$maxBins")

  type Bins = Vector[(Double, Double, Double, Long)] // (min, max, centroid, n)

  override def zero: Bins = Vector.empty

  /** Merge the two adjacent bins with the closest centroids until the
    * budget holds; `bins` must be centroid-sorted.
    */
  private def compress(bins: Bins): Bins =
    if (bins.size <= maxBins) bins
    else {
      var bestI = 0
      var bestGap = Double.MaxValue
      var i = 0
      while (i < bins.size - 1) {
        val gap = bins(i + 1)._3 - bins(i)._3
        if (gap < bestGap) { bestGap = gap; bestI = i }
        i += 1
      }
      val (lo1, hi1, c1, n1) = bins(bestI)
      val (lo2, hi2, c2, n2) = bins(bestI + 1)
      val merged = (math.min(lo1, lo2), math.max(hi1, hi2),
        (c1 * n1 + c2 * n2) / (n1 + n2), n1 + n2)
      compress(bins.patch(bestI, Seq(merged), 2))
    }

  override def reduce(buf: Bins, v: Double): Bins = {
    val i = buf.indexWhere(_._3 >= v)
    val at = if (i < 0) buf.size else i
    compress(buf.patch(at, Seq((v, v, v, 1L)), 0))
  }

  override def merge(a: Bins, b: Bins): Bins =
    compress((a ++ b).sortBy(_._3))

  override def finish(buf: Bins): Seq[(Double, Double, Long)] =
    buf.map { case (lo, hi, _, n) => (lo, hi, n) }

  override def bufferEncoder: Encoder[Bins] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Bins]()
  override def outputEncoder: Encoder[Seq[(Double, Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Double, Long)]]()
}
