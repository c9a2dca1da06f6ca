package graft.expressions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One (id, score) candidate. */
case class ScoredId(id: Long, score: Double)

/** Typed top-k-by-score aggregator with deterministic ordering
  * (score desc, id asc).
  *
  * Replaces the `row_number() OVER (ORDER BY score)` formulation for
  * per-group top-k: a window sorts and shuffles EVERY candidate row to its
  * group's partition, O(n log n) rows over the wire; an aggregator keeps a
  * bounded k-buffer and combines map-side, so each mapper ships at most k
  * rows per group — the difference between shuffling the corpus and
  * shuffling the answer at 100 TB.
  *
  * The buffer is trimmed lazily at 4k elements to amortize sorting.
  */
class TopKAggregator(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private def trim(buf: Seq[ScoredId]): Seq[ScoredId] =
    buf.sortBy(s => (-s.score, s.id)).take(k)

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] = {
    val next = buf :+ in
    if (next.size >= 4 * k) trim(next) else next
  }

  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] = trim(a ++ b)

  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] = trim(buf)

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] = bufferEncoder
}
