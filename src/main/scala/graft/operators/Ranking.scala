package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{JoinedRow, SpecificInternalRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scale-safe global ranking / exact ntile.
  *
  * `ntile(n).over(Window.orderBy(...))` with no partition key moves every row
  * through a single partition — fine at test scale, a scale-killer on a real
  * cluster. This operator computes the identical result with bounded
  * per-partition work, the classic zipWithIndex construction:
  *
  *   1. global sort (range exchange + in-partition sort; partition count
  *      scales with the cluster, not the data),
  *   2. one job counting rows per partition (an O(#partitions) driver-side
  *      array — the same cardinality as any job's task-status table),
  *   3. a second pass appending each row's partition-offset-plus-local-index
  *      as its exact global rank,
  *   4. map the exact global rank to its ntile bucket with the standard
  *      "first (total mod n) buckets get one extra row" rule.
  *
  * Nothing is persisted or checkpointed: both passes are jobs over the SAME
  * physical RDD (the Dataset's memoized `toRdd`), so the sort's shuffle map
  * stage — and every shuffle upstream of it, e.g. an expensive input
  * aggregation — runs once and is reused from shuffle files by the later
  * jobs. The partitioning observed by the count and by the rank pass is
  * therefore byte-identical by construction, with zero cached blocks left
  * behind (`getPersistentRDDs` stays empty).
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
    val spark = df.sparkSession
    val sorted = df.sort(order: _*)
    // memoized physical RDD: jobs below share one shuffle, no persist needed
    val rdd = bridge.toInternalRdd(sorted)
    val counts = rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      Iterator.single(pid -> n)
    }.collect().sortBy(_._1).map(_._2)
    val total = counts.sum
    val offsets = spark.sparkContext.broadcast(counts.scanLeft(0L)(_ + _))
    val ranked = rdd.mapPartitionsWithIndex { (pid, it) =>
      var rank = offsets.value(pid)
      val rankRow = new SpecificInternalRow(Seq(LongType))
      val joined = new JoinedRow
      it.map { row =>
        rank += 1
        rankRow.setLong(0, rank)
        joined(row, rankRow): InternalRow
      }
    }
    val schema = StructType(sorted.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    (bridge.internalCreateDataFrame(spark, ranked, schema), total)
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
