package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{JoinedRow, SpecificInternalRow}
import org.apache.spark.sql.expressions.Window
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

  /** df extended with exact global RUNNING SUMS (inclusive prefix sums) of
    * the long columns `sumCols` under `order` — the cumsum sibling of
    * [[withGlobalRank]], same two-pass construction: global sort, one job
    * collecting per-partition column totals (an O(#partitions × #cols)
    * driver array), broadcast exclusive offsets, second pass accumulating
    * within each partition. No single-partition window anywhere; both
    * passes share the sort's shuffle files via the memoized physical RDD.
    * `order` must be a total order for boundary determinism; nulls in a
    * summed column count as 0.
    */
  def withRunningSums(df: DataFrame, order: Seq[Column], sumCols: Seq[String],
                      outCols: Seq[String]): DataFrame = {
    require(sumCols.nonEmpty && sumCols.size == outCols.size,
      s"sumCols/outCols must align, got $sumCols vs $outCols")
    val spark = df.sparkSession
    val idx = sumCols.map { c =>
      val i = df.schema.fieldIndex(c)
      require(df.schema(i).dataType == LongType,
        s"running-sum column $c must be bigint, got ${df.schema(i).dataType}")
      i
    }
    val k = idx.size
    val sorted = df.sort(order: _*)
    val rdd = bridge.toInternalRdd(sorted)
    val partTotals = rdd.mapPartitionsWithIndex { (pid, it) =>
      val acc = new Array[Long](k)
      while (it.hasNext) {
        val row = it.next()
        var j = 0
        while (j < k) {
          if (!row.isNullAt(idx(j))) acc(j) += row.getLong(idx(j))
          j += 1
        }
      }
      Iterator.single(pid -> acc)
    }.collect().sortBy(_._1).map(_._2)
    // exclusive per-partition offsets, column-major
    val offsets = partTotals.scanLeft(new Array[Long](k)) { (a, b) =>
      Array.tabulate(k)(j => a(j) + b(j))
    }
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val summed = rdd.mapPartitionsWithIndex { (pid, it) =>
      val acc = bOffsets.value(pid).clone()
      val sumRow = new SpecificInternalRow(Seq.fill(k)(LongType))
      val joined = new JoinedRow
      it.map { row =>
        var j = 0
        while (j < k) {
          if (!row.isNullAt(idx(j))) acc(j) += row.getLong(idx(j))
          sumRow.setLong(j, acc(j))
          j += 1
        }
        joined(row, sumRow): InternalRow
      }
    }
    val schema = StructType(sorted.schema.fields ++
      outCols.map(c => StructField(c, LongType, nullable = false)))
    bridge.internalCreateDataFrame(spark, summed, schema)
  }

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

  /** Exact WEIGHTED percentiles — ClickHouse `quantileExactWeighted`: the
    * p-th weighted percentile is the smallest value v whose cumulative
    * weight (all rows with value ≤ v) reaches ⌈p/100 · W⌉, computed in
    * integer arithmetic so the cut row is engine-exact. Rows with null
    * values or non-positive weights are dropped; weights are truncated to
    * longs (pass integer-valued weights).
    *
    * Scale shape — no global sort, no single-partition window:
    *   1. one aggregate for (min, max, ΣW) — 1 row;
    *   2. values bin into `fanout` uniform cells of [min, max] (cell id is
    *      monotone in v); one map-side-combined aggregation gives per-cell
    *      weights — a bounded `fanout`-row collect turns them into prefix
    *      offsets, and each requested percentile resolves driver-side to
    *      (owning cell, remaining target) — O(fanout) arithmetic;
    *   3. ONLY the owning cells' rows (≤ percents.size of them, predicate
    *      pushed to the scan) flow into a per-cell running-sum window
    *      (~N/fanout rows per partition; ties handled by the RANGE frame,
    *      which accumulates whole value-groups) and a grouped min picks
    *      each answer.
    * Value skew concentrates cells (uniform split of the RANGE, not the
    * mass) — raise `fanout` for heavy-tailed domains; correctness never
    * depends on the binning, only per-cell row counts do.
    */
  def weightedPercentiles(df: DataFrame, valueCol: String, weightCol: String,
                          percents: Seq[Int], fanout: Int = 256): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in [1,100]: $percents")
    require(fanout > 0 && fanout <= 10000, s"fanout=$fanout out of range")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(valueCol).cast("double").as("v"),
        col(weightCol).cast("long").as("wt"))
      .where(col("v").isNotNull && col("wt") > 0)
    val head = rows.agg(min(col("v")), max(col("v")), sum(col("wt"))).head()
    if (head.isNullAt(2) || head.getLong(2) == 0L)
      return Seq.empty[(Long, Double)].toDF("pct", "v")
    val (vmin, vmax, totW) = (head.getDouble(0), head.getDouble(1), head.getLong(2))
    val width = (vmax - vmin) / fanout
    val cell =
      if (width == 0) lit(0) // constant column: everything in cell 0
      else least(lit(fanout - 1),
        floor((col("v") - vmin) / width)).cast("int")
    val binned = rows.withColumn("__cell", cell)
    val cellW = new Array[Long](fanout)
    binned.groupBy(col("__cell")).agg(sum(col("wt")).as("w"))
      .as[(Int, Long)].collect().foreach { case (c, w) => cellW(c) = w }
    val prefix = cellW.scanLeft(0L)(_ + _) // prefix(c) = weight before cell c
    // per percentile: ceil target, owning cell, weight remaining inside it
    val targetRows = percents.distinct.sorted.map { p =>
      val t = (totW * p + 99L) / 100L
      val c = prefix.indexWhere(_ >= t) - 1 // last cell whose prefix < t
      (p.toLong, c, t - prefix(c))
    }
    val targets = targetRows.toDF("pct", "__cell", "__local_target")
    val cum = Window.partitionBy(col("__cell")).orderBy(col("v"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    binned.where(col("__cell").isin(targetRows.map(_._2): _*))
      .withColumn("__cum", sum(col("wt")).over(cum))
      .join(broadcast(targets), "__cell")
      .where(col("__cum") >= col("__local_target"))
      .groupBy(col("pct")).agg(min(col("v")).as("v"))
  }

  /** ClickHouse `quantileTiming`-style fixed-resolution latency quantiles
    * per group: millisecond values bucketize on the timing grid — exact
    * below 1024 ms, 16 ms buckets below 30720 ms, 512 ms buckets above.
    * The two lower zones follow the public quantileTiming resolution
    * scheme (human-latency ranges stay exact, the tail coarsens); the
    * >30720 ms zone INTENTIONALLY diverges from ClickHouse, which clamps
    * everything above ~30 s to 30000 ms — 512 ms buckets keep the long
    * tail rankable instead of flattening it. Each requested quantile is
    * the SMALLEST grid value whose cumulative count reaches `⌈q·n⌉`
    * (lower-bound rule). Everything is integer arithmetic over the
    * (group, grid value) grain — one hash aggregation, then a window over
    * DISTINCT grid values (≤ 1024 + 1856 + tail buckets per group,
    * bounded by the grid, not the data), so the result is deterministic
    * and exactly DuckDB-mirrorable: the fixed-state sketch semantic
    * without the sketch.
    *
    * Negative values clamp to 0 (ClickHouse stores timings unsigned).
    * Output: one row per (group, q) with the grid-value quantile.
    *
    * `clampToClickHouse = true` restores drop-in ClickHouse parity for the
    * tail: every value above 30720 ms clamps to 30000 ms (ClickHouse's
    * documented "considered an error" sentinel), instead of this
    * implementation's default 512 ms tail buckets. Default off — the
    * rankable tail is strictly more informative; flip it only when
    * migrating dashboards that assert the 30000 sentinel.
    */
  def timingQuantiles(df: DataFrame, grpCol: String, msCol: Column,
                      qs: Seq[Int], clampToClickHouse: Boolean = false): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 100),
      s"bad percentiles $qs")
    val ms = greatest(msCol.cast("long"), lit(0L))
    val grid = when(ms < 1024, ms)
      .when(ms < 30720, (ms / 16).cast("long") * 16)
      .otherwise(if (clampToClickHouse) lit(30000L)
                 else (ms / 512).cast("long") * 512)
    val perVal = df.select(col(grpCol).as("g"), grid.as("v"))
      .where(col("v").isNotNull)
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val byV = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val totals = perVal.groupBy(col("g")).agg(sum(col("c")).as("n"))
    val cum = perVal.withColumn("cum", sum(col("c")).over(byV))
      .join(broadcast(totals), "g")
    val spark = df.sparkSession
    import spark.implicits._
    val qDf = broadcast(qs.distinct.sorted.toDF("pct"))
    cum.crossJoin(qDf)
      // lower-bound rule: ⌈q·n/100⌉ without floats
      .where(col("cum") * 100 >= col("pct") * col("n"))
      .groupBy(col("g"), col("pct"))
      .agg(min(col("v")).as("ms"))
      .select(col("g").as(grpCol), col("pct"), col("ms"))
  }
}
