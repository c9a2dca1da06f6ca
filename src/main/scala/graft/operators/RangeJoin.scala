package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-range join: all (left, right) pairs with equal keys and
  * `r.ts ∈ [l.ts − before, l.ts + after]` — the batch twin of a
  * watermarked stream-stream interval join, and ClickHouse's
  * "JOIN ... ON ... BETWEEN" pattern.
  *
  * The naive formulation (`key equal AND ts BETWEEN …`) plans as an
  * equi-join with a residual range predicate — fine — but Spark must carry
  * every per-key pair through the filter, and for hot keys that is the
  * per-key cross product. This implementation bucketizes time at the window
  * span: each right row lands in exactly one (key, bucket); each left row
  * probes only the ≤2 buckets its window can overlap. The join becomes a
  * hash equi-join on (key, bucket) with bounded fan-out, then the exact
  * range filter. Pairs cannot duplicate — a right row has one bucket.
  */
object RangeJoin {

  /** @param beforeSec window reach into the past of each left row (≥ 0)
    * @param afterSec  window reach into the future of each left row (≥ 0)
    */
  def byKeyAndTime(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   beforeSec: Long, afterSec: Long,
                   rightPrefix: String = "r_"): DataFrame = {
    require(beforeSec >= 0 && afterSec >= 0 && beforeSec + afterSec > 0,
      "window must be non-empty")
    val width = beforeSec + afterSec
    val lEpoch = graft.functions.TimeCols.seconds(col(leftTs))

    val l = left.withColumn("_rj_bucket",
      explode(sequence(
        floor((lEpoch - beforeSec) / width).cast("long"),
        floor((lEpoch + afterSec) / width).cast("long"))))
    val r = right.select(
      keys.map(col) ++ right.columns.filterNot(keys.contains)
        .map(c => col(c).as(s"$rightPrefix$c")): _*)
      .withColumn("_rj_bucket",
        floor(graft.functions.TimeCols.seconds(col(s"$rightPrefix$rightTs")) / width)
        .cast("long"))

    val rTsP = graft.functions.TimeCols.seconds(col(s"$rightPrefix$rightTs"))
    l.join(r, keys :+ "_rj_bucket")
      .where(rTsP >= lEpoch - beforeSec && rTsP <= lEpoch + afterSec)
      .drop("_rj_bucket")
  }
}
