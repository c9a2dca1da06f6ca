package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the DESCRIBE/data-quality surface (null rates,
  * cardinalities, ranges) a replication pipeline runs against source and
  * target to validate a sync, and a training-data pipeline runs to catch
  * drift.
  *
  * One pass over the table: every per-column statistic is an aggregate in a
  * single `agg(...)`, so the scan happens once and all stats combine
  * map-side; the per-column rows are then unpivoted from the single result
  * row (driver-side width, not data volume).
  */
object Profiler {

  /** Profile `cols` of `df`: one output row per column with
    * (column, n_rows, n_null, n_distinct, min_str, max_str). Min/max are
    * stringified so mixed column types fit one frame.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__null"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("column"), col("__rows").as("n_rows"),
        col(s"${c}__null").as("n_null"), col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_str"), col(s"${c}__max").as("max_str"))
    }
    one.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }

  /** Referential-integrity audit for one child→parent relationship: one row
    * (relation, child_rows, orphan_rows) where an orphan is a child row
    * whose key (including a NULL key) matches no parent. The cross-table
    * check a replication pipeline runs after a multi-table sync — FK
    * consistency is exactly what can break when tables sync independently
    * (the reference mirrors each table on its own slot cursor).
    *
    * Shape: the total is one map-side count; orphans are a LEFT ANTI join
    * against the parent PROJECTED TO ITS KEY (column pruning reaches the
    * scan, the dedup is free inside the join), shuffled on the key with
    * AQE free to broadcast a small parent. The two one-row aggregates then
    * cross-join — driver-free, no collect.
    */
  def referentialOrphans(child: DataFrame, childKey: String,
                         parent: DataFrame, parentKey: String,
                         relation: String): DataFrame = {
    val total = child.agg(count(lit(1)).as("child_rows"))
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("orphan_rows"))
    total.crossJoin(orphans)
      .select(lit(relation).as("relation"), col("child_rows"), col("orphan_rows"))
  }

  /** Per-group Shannon entropy of a categorical column — the diversity/
    * drift monitor of a corpus pipeline (a source whose language entropy
    * collapses has turned monolingual; a mirror whose op-type entropy
    * spikes is seeing an unusual change mix). Returns one row per group:
    * (group, n_rows, n_values, entropy_bits).
    *
    * H = log2(T) − (Σ c·log2 c)/T over the per-(group, value) counts —
    * two grouped aggregations, both map-side combined; the float summands
    * are identical on any engine and the result is rounded to 4dp, below
    * which partial-sum ordering cannot reach for realistic cardinalities.
    */
  def groupEntropy(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("_c"))
    counts.groupBy(col(groupCol))
      .agg(sum(col("_c")).as("n_rows"), count(lit(1)).as("n_values"),
        sum(col("_c").cast("double") * log2(col("_c").cast("double"))).as("_sclc"))
      .select(col(groupCol), col("n_rows"), col("n_values"),
        round(log2(col("n_rows").cast("double"))
          - col("_sclc") / col("n_rows"), 4).as("entropy_bits"))
  }

  /** Herfindahl–Hirschman concentration of `valueCol` within each
    * `groupCol` — Σ pᵥ² over the value shares (1/n_values = perfectly
    * even, 1 = single value), the diversity screen dual to
    * [[groupEntropy]]. HHI = Σc² / (Σc)² with both sums exact longs, so
    * the single final division is engine-reproducible bit-for-bit. Two
    * map-side-combined aggregations, no window.
    */
  def groupHhi(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("_c"))
    counts.groupBy(col(groupCol))
      .agg(sum(col("_c")).as("n_rows"), count(lit(1)).as("n_values"),
        sum(col("_c") * col("_c")).as("_s2"))
      .select(col(groupCol), col("n_rows"), col("n_values"),
        (col("_s2").cast("double")
          / (col("n_rows").cast("double") * col("n_rows").cast("double")))
          .as("hhi"))
  }

  /** Schema drift between two frames (e.g. a source snapshot and its
    * mirror, or yesterday's and today's landing): one row per differing
    * column — `added` (only in `b`), `removed` (only in `a`), `retyped`
    * (both, different types). Pure driver-side metadata — schemas never
    * touch executors — so it composes with any monitoring query for free.
    * The empty result (identical schemas) is the healthy case.
    */
  def schemaDrift(a: DataFrame, b: DataFrame): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val at = a.schema.map(f => (f.name, f.dataType.simpleString))
    val bt = b.schema.map(f => (f.name, f.dataType.simpleString))
    val am = at.toMap
    val bm = bt.toMap
    val rows =
      at.collect { case (n, t) if !bm.contains(n) => (n, "removed", t, null: String) } ++
      bt.collect { case (n, t) if !am.contains(n) => (n, "added", null: String, t) } ++
      at.collect { case (n, t) if bm.get(n).exists(_ != t) => (n, "retyped", t, bm(n)) }
    rows.toDF("column", "change", "from_type", "to_type")
  }

  /** First-significant-digit distribution of a positive measure — the
    * Benford's-law screen fraud/data-quality audits run over financial
    * columns: natural growth-process data follows share(d) ≈ log10(1+1/d);
    * fabricated or truncated data visibly doesn't.
    *
    * The digit is extracted arithmetically — `floor(v / 10^floor(log10 v))`
    * — not by string formatting, so the result is engine-comparable IEEE
    * math (both sides correctly round `log10` at exact powers of ten; a
    * float within 1 ulp of a power of ten is itself exact in fixed-decimal
    * data). Non-positive values are excluded, counted in nothing. One
    * grouped aggregation; the share then normalizes over the aggregated
    * frame, which is AT MOST NINE ROWS at any scale — the global window
    * runs on those nine rows, never the input.
    */
  def benfordFirstDigit(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val digit = floor(v / pow(lit(10.0), floor(log10(v)))).cast("long")
    df.where(v > 0.0)
      .groupBy(digit.as("digit")).agg(count(lit(1)).as("n"))
      .select(col("digit"), col("n"),
        (col("n") / sum(col("n")).over()).as("share"))
  }

  /** CUSUM changepoint candidate per group — the level-shift detector a
    * CDC monitor runs over a feed's hourly means (did the value
    * distribution move mid-stream?): standardized hourly deviations from
    * the group's grand mean accumulate in hour order, and the hour where
    * |CUSUM| peaks is the classic changepoint estimate (Page 1954's
    * cumulative-sum idea in its offline scan form).
    *
    * Engine-exactness: hourly means round to DECIMAL(18,6) (exact moment
    * sums per group), grand mean/std derive from those exact sums, the
    * running CUSUM adds doubles in a FIXED order (hour ascending — IEEE
    * addition is deterministic given order), the peak ranks on the
    * 4dp-rounded |CUSUM| with the hour as tie-break, and single-hour or
    * zero-variance groups are filtered by exact counts before ranking.
    * ONE shuffle to the (group, hour) grain; the per-group windows share
    * the group partitioning.
    *
    * Output: (group, n_hours, cp_hour, cusum) — one row per group.
    */
  def changepointCusum(df: DataFrame, groupCol: String, tsCol: String,
                       valueCol: String): DataFrame = {
    val grain = df.groupBy(col(groupCol).as("g"),
        date_trunc("hour", col(tsCol)).as("h"))
      .agg(count(lit(1)).as("hn"),
        sum(col(valueCol).cast("decimal(18,2)")).as("sv"))
    changepointFromHourly(grain, groupCol)
  }

  /** The shared scalar tail of [[changepointCusum]] over an already
    * hour-grained frame (g, h, hn, sv) — the ONE formulation both the
    * batch operator and the live [[graft.streaming.ChangepointStream]]
    * evaluate, so their answers agree exactly by construction (the
    * `srmColumns` idiom): hourly means round to decimal(18,6) from the
    * EXACT (count, decimal-sum) moments, the CUSUM folds doubles in
    * fixed hour order, the peak ranks on the 4dp-rounded |CUSUM| with
    * the hour tie-break.
    */
  private[graft] def changepointFromHourly(grain: DataFrame,
                                           groupOut: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = grain
      .withColumn("m",
        round(col("sv").cast("double") / col("hn"), 6).cast("decimal(18,6)"))
    val byG = Window.partitionBy(col("g"))
    val n = count(lit(1)).over(byG).cast("double")
    val sx = sum(col("m")).over(byG).cast("double")
    val sxx = sum(col("m") * col("m")).over(byG).cast("double")
    val grand = sx / n
    val std = sqrt((n * sxx - sx * sx) / (n * n))
    val run = Window.partitionBy(col("g")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = hourly
      .withColumn("n_hours", count(lit(1)).over(byG))
      .withColumn("__grand", grand)
      .withColumn("__std", std)
      // window expressions cannot sit in WHERE — materialize, then filter
      .where(col("n_hours") > 1 && col("__std") > 0)
      .withColumn("dev",
        (col("m").cast("double") - col("__grand")) / col("__std"))
      .withColumn("cusum", round(sum(col("dev")).over(run), 4))
      .withColumn("rn", row_number().over(Window.partitionBy(col("g"))
        .orderBy(abs(col("cusum")).desc, col("h"))))
    scored.where(col("rn") === 1)
      .select(col("g").as(groupOut), col("n_hours"),
        col("h").as("cp_hour"), col("cusum"))
  }

  /** ONE-pass pairwise Pearson correlation matrix over `cols` — the
    * profiling companion of the single-pair per-group corr: every moment
    * the k(k−1)/2 pairs need (k sums + k(k+1)/2 cross-products + one
    * count) comes from ONE map-side-combined aggregation over ONE scan,
    * never a pass per pair. Moments accumulate in DECIMAL (exact, so the
    * result is independent of partitioning — the engine's stat-moment
    * convention) and only the final ratio runs in doubles, rounded to
    * `decimals` for engine-exact comparison. The pair explosion happens on
    * the single aggregated row (an `explode` of k(k−1)/2 structs), so the
    * scan executes once no matter how many pairs are requested.
    *
    * Output: (col_a, col_b, n, corr) for every a < b in `cols` order.
    * Scale: shuffle carries one moments row; k² terms are map-side state —
    * k is a column-list, never data-scale.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String],
                 decimals: Int = 6): DataFrame = {
    require(cols.size >= 2, s"corrMatrix needs >= 2 columns, got $cols")
    val k = cols.size
    def dec(i: Int) = col(cols(i)).cast("decimal(18,2)")
    val sums = cols.indices.map(i => sum(dec(i)).as(s"s_$i"))
    val prods = for (i <- cols.indices; j <- i until k)
      yield sum(dec(i) * dec(j)).as(s"p_${i}_$j")
    val aggs = (count(lit(1)).as("n") +: (sums ++ prods)).toSeq
    val m = df.agg(aggs.head, aggs.tail: _*)
    val n = col("n").cast("double")
    def sd(i: Int) = col(s"s_$i").cast("double")
    def pd(i: Int, j: Int) = col(s"p_${i}_$j").cast("double")
    val pairs = for (i <- cols.indices; j <- (i + 1) until k) yield struct(
      lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
      col("n").as("n"),
      round((n * pd(i, j) - sd(i) * sd(j)) /
        sqrt((n * pd(i, i) - sd(i) * sd(i)) *
             (n * pd(j, j) - sd(j) * sd(j))), decimals).as("corr"))
    m.select(explode(array(pairs: _*)).as("pr")).select(col("pr.*"))
  }

  /** Tukey-fence bucket outliers: time buckets whose per-group total falls
    * outside [q1 − 1.5·IQR, q3 + 1.5·IQR] of that group's bucket-total
    * distribution — the box-plot anomaly screen (Tukey 1977), the
    * distribution-shaped sibling of
    * [[graft.operators.CdcOps.trafficSpikes]]'s mean-ratio test.
    *
    * Exactness: totals are exact int64 cents; quartiles are ORDER
    * STATISTICS (value at rank ⌊(n−1)·q⌋+1 of the ascending bucket totals
    * — the "lower" empirical quantile, no interpolation), and the fence
    * comparison is multiplied out to deci-cents (`10·total < 10·q1 −
    * fence·IQR`, fence = 15 ≙ 1.5) so no float division or rounding exists
    * anywhere — any engine reproduces the row set bit-for-bit.
    *
    * Shape: one map-side-combined grouped pass to the (group, bucket)
    * grain, then rank/quartile windows over that CALENDAR-BOUNDED frame
    * (≤ groups × buckets rows at any corpus size) and a broadcast join of
    * the per-group quartile row back onto it. Ties on total need no
    * tie-break: the value AT a rank is tie-invariant.
    *
    * Output: (group, bucket_ts, total_cents, side∈{low,high}).
    */
  def tukeyOutliers(events: DataFrame, groupCol: String,
                    bucket: org.apache.spark.sql.Column,
                    cents: org.apache.spark.sql.Column,
                    fenceTenths: Int = 15): DataFrame = {
    require(fenceTenths >= 1, s"bad fenceTenths=$fenceTenths")
    import org.apache.spark.sql.expressions.Window
    val daily = events.where(cents.isNotNull)
      .groupBy(col(groupCol), bucket.as("bucket_ts"))
      .agg(sum(cents).cast("long").as("total_cents"))
    val w = Window.partitionBy(col(groupCol))
    val ranked = daily
      .withColumn("rn", row_number().over(w.orderBy(col("total_cents"))))
      .withColumn("n", count(lit(1)).over(w))
    val quart = ranked.groupBy(col(groupCol)).agg(
      // DIV, not `/`: SQL division is fractional even on integers, and a
      // fractional rank would match no row_number
      max(when(col("rn") === expr("(n - 1) DIV 4 + 1"),
        col("total_cents"))).as("q1"),
      max(when(col("rn") === expr("((n - 1) * 3) DIV 4 + 1"),
        col("total_cents"))).as("q3"))
    val t10 = col("total_cents") * 10
    val iqr = col("q3") - col("q1")
    val f = lit(fenceTenths.toLong)
    daily.join(broadcast(quart), groupCol)
      .where(t10 < col("q1") * 10 - f * iqr || t10 > col("q3") * 10 + f * iqr)
      .select(col(groupCol), col("bucket_ts"), col("total_cents"),
        when(t10 < col("q1") * 10 - f * iqr, lit("low"))
          .otherwise(lit("high")).as("side"))
  }
}
