package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scale-safe global ranking / exact ntile.
  *
  * `ntile(n).over(Window.orderBy(...))` with no partition key moves every row
  * through a single partition — fine at test scale, a scale-killer on a real
  * cluster. This operator computes the identical result with bounded
  * per-partition work:
  *
  *   1. range-repartition on the sort key (each partition holds a contiguous
  *      key range; partition count scales with the cluster, not the data),
  *   2. count rows per partition (an O(#partitions) driver-side array — the
  *      same cardinality as any Spark job's task-status table),
  *   3. rank within each partition (`row_number` over a partition-local
  *      window) and add the prefix-sum offset of the partitions before it,
  *   4. map the exact global rank to its ntile bucket with the standard
  *      "first (total mod n) buckets get one extra row" rule.
  *
  * The range-partitioned frame is persisted before step 2 so the partition
  * ids observed by the count and by the ranking come from the same physical
  * partitioning (a re-evaluated range exchange may re-sample boundaries).
  *
  * Matches ClickHouse/ANSI `ntile` semantics as exercised by the reference's
  * quartile reports (reference: peerdb_psql_clickhouse_monitor.ps1 summary
  * percentile tables).
  */
object Ranking {

  /** (ranked frame, total rows). `order` must be a total order (include a
    * unique tiebreak column) or ranks at partition boundaries are undefined.
    */
  private def rankWithTotal(df: DataFrame, order: Seq[Column],
                            rankCol: String): (DataFrame, Long) = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    // materialize the input once: the range exchange makes TWO passes over
    // its child (boundary sampling, then the shuffle itself), which would
    // recompute an expensive upstream aggregation twice
    val input = df.localCheckpoint(true)
    val ranged = input.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    // empty partitions don't appear in `counts`; they contribute 0 to every
    // prefix sum, so skipping them leaves the offsets unchanged.
    val counts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("__pid")).collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    val total = counts.map(_._2).sum
    val offsets = counts.scanLeft(0L)(_ + _._2).zip(counts).map {
      case (off, (pid, _)) => (pid, off)
    }
    val offsetDf = df.sparkSession.createDataFrame(offsets.toSeq)
      .toDF("__pid", "__offset")
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val ranked = ranged
      .join(broadcast(offsetDf), "__pid")
      .withColumn(rankCol, row_number().over(w).cast("bigint") + col("__offset"))
      .drop("__pid", "__offset")
    (ranked, total)
  }

  /** df extended with `rankCol` = exact 1-based global rank under `order`. */
  def withGlobalRank(df: DataFrame, order: Seq[Column], rankCol: String): DataFrame =
    rankWithTotal(df, order, rankCol)._1

  /** df extended with `bucketCol` = exact `ntile(n)` bucket (1..n) under
    * `order`, computed without a single-partition global window.
    */
  def exactNtile(df: DataFrame, n: Int, order: Seq[Column], bucketCol: String): DataFrame = {
    require(n > 0, s"ntile bucket count must be positive, got $n")
    val rankCol = "__global_rank"
    val (ranked, total) = rankWithTotal(df, order, rankCol)
    val base = total / n
    val extra = total % n
    // cumulative bucket boundaries: first `extra` buckets hold base+1 rows
    val cums = (1 to n).scanLeft(0L)((acc, i) => acc + base + (if (i <= extra) 1L else 0L)).tail
    val bucket = cums.init.zipWithIndex.foldRight(lit(n): Column) {
      case ((cum, i), elseExpr) => when(col(rankCol) <= cum, lit(i + 1)).otherwise(elseExpr)
    }
    ranked.withColumn(bucketCol, bucket.cast("bigint")).drop(rankCol)
  }
}
