package graft.expressions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** ClickHouse `uniqUpTo(N)`: the EXACT distinct count while it is ≤ N,
  * and N+1 (read: "more than N") once it exceeds N — with aggregation
  * state hard-capped at N+1 items.
  *
  * The point is the bound: Spark's `countDistinct` shuffles and holds
  * every distinct value; when a pipeline only needs "distinct ≤ N?"
  * (cardinality guards, "show exact count up to 100, then 100+") the
  * state per group never exceeds N+1 entries regardless of the true
  * cardinality, and merges stay capped too. Items are compared as
  * strings (cast before aggregating).
  */
class UniqUpToAggregator(n: Int)
  extends Aggregator[String, Set[String], Long] {
  require(n > 0, s"bad n=$n")

  override def zero: Set[String] = Set.empty

  override def reduce(buf: Set[String], item: String): Set[String] =
    // NULLs are not values: count(DISTINCT) and ClickHouse uniqUpTo skip
    // them, and the DuckDB oracle would otherwise disagree on dirty data
    if (item == null || buf.size > n || buf.contains(item)) buf else buf + item

  override def merge(a: Set[String], b: Set[String]): Set[String] = {
    // union, abandoned as soon as the cap is crossed
    if (a.size > n) a
    else if (b.size > n) b
    else {
      var m = a
      val it = b.iterator
      while (it.hasNext && m.size <= n) m = m + it.next()
      m
    }
  }

  override def finish(buf: Set[String]): Long = math.min(buf.size, n + 1).toLong

  override def bufferEncoder: Encoder[Set[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Set[String]]()
  override def outputEncoder: Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}
