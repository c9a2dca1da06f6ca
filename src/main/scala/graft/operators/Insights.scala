package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-row "insight" analytics — market-basket association, Pareto
  * frontiers, ABC / RFM segmentation, concentration (Gini) — the
  * warehouse-report layer a replicated target serves once the mirror is
  * live (reference: the ClickHouse-side analytics the PeerDB stack
  * replicates INTO, quickstart_prepare_peers.sh:80's published tables).
  *
  * Shared scale shape: every operator aggregates the fact table down to a
  * DIMENSION-sized frame first (brands, parts, suppliers, customers) in
  * one map-side-combined shuffle, and only then applies the cross-row
  * step (self-join, cumulative window, ntile) to that small frame — the
  * fact table is never self-joined or globally sorted. The global windows
  * below therefore sort dimension cardinality, not data volume; at a
  * dimension too big for one task, each has a documented decomposition
  * (noted per method).
  */
object Insights {

  /** Market-basket pair association at `itemCol` granularity: for every
    * unordered item pair {a, b} co-occurring in at least one basket,
    * (n_ab, support, confidence P(b|a), lift). Baskets are `basketCol`
    * groups; multiplicity within a basket is ignored (set semantics).
    *
    * Plan (r20, the coOccurrenceEdges idiom — guide §2.3/§2.4): ONE
    * basket-keyed aggregation collects each basket's DISTINCT item set
    * (the old distinct + basket-key self-join in one exchange), and pair
    * enumeration is a narrow double `explode` of the set — the pair
    * multiset never crosses a join. Marginals and the basket total read
    * the same checkpointed basket-set frame. Pair multiset identical:
    * per basket every unordered pair of distinct non-NULL items once
    * (collect_set drops NULLs, which the old `<` also never paired; a
    * NULL basket keeps counting in totals/marginals but pairs nothing,
    * exactly like the old NULL-key join). Per-group aggregation state is
    * bounded by the basket's distinct item count — the same per-key
    * bound the old self-join's fan-out imposed.
    */
  /** One row per basket with its DISTINCT item set (collect_set drops
    * NULL items; a NULL basket keeps its row). The explicit basket-key
    * exchange satisfies the aggregate's required distribution (the
    * sizedDistinctPairs plan contract — coalescing-exempt, so the set
    * build never fuses into a single-split scan task), and the frame is
    * checkpoint-materialized once for its three consumers (marginals,
    * totals, pair fan-out).
    */
  private def basketItemSets(df: DataFrame, basketCol: String,
                             itemCol: String): DataFrame =
    df.select(col(basketCol).as("_bk"), col(itemCol).as("_it"))
      .repartition(graft.GraftSession.parallelismFloor(df.sparkSession),
        col("_bk"))
      .groupBy(col("_bk")).agg(collect_set(col("_it")).as("_items"))
      .localCheckpoint(true)

  def marketBasket(df: DataFrame, basketCol: String, itemCol: String): DataFrame = {
    val sets = basketItemSets(df, basketCol, itemCol)
    val marginals = sets.select(explode(col("_items")).as("_it"))
      .groupBy(col("_it")).agg(count(lit(1)).as("_n"))
    val totals = sets.agg(count(lit(1)).as("_nb"))
    sets.where(col("_bk").isNotNull)
      .select(explode(col("_items")).as("item_a"), col("_items"))
      .select(col("item_a"), explode(col("_items")).as("item_b"))
      .where(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b")).agg(count(lit(1)).as("n_ab"))
      .join(broadcast(marginals.select(col("_it").as("item_a"), col("_n").as("_na"))), Seq("item_a"))
      .join(broadcast(marginals.select(col("_it").as("item_b"), col("_n").as("_nb_i"))), Seq("item_b"))
      .crossJoin(broadcast(totals))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        round(col("n_ab").cast("double") / col("_nb").cast("double"), 6).as("support"),
        round(col("n_ab").cast("double") / col("_na").cast("double"), 6).as("confidence"),
        round(col("n_ab").cast("double") * col("_nb").cast("double")
          / (col("_na").cast("double") * col("_nb_i").cast("double")), 6).as("lift"))
  }

  /** 2-D skyline (Pareto frontier): rows not dominated by any other row,
    * where `better` = strictly higher `maxCol` or strictly lower `minCol`
    * with the other no worse (the standard weak-dominance skyline;
    * duplicate points both survive).
    *
    * Sort-based exactness without a self-join: collapse to one row per
    * distinct `maxCol` value (its best `minCol`), then two cumulative
    * windows over that frame ordered by `maxCol` DESC give, per value,
    * the best `minCol` at `maxCol` ≥ v (`_mge`) and at `maxCol` > v
    * (`_mgt`); a row is dominated iff `_mge < min` (someone no-worse-x is
    * strictly-better-y) or `_mgt ≤ min` (someone strictly-better-x is
    * no-worse-y). The windows sort DISTINCT x values — dimension-sized by
    * construction when `df` is a per-group aggregate. For a frontier over
    * raw fact rows at extreme scale, prefilter with a partition-local
    * skyline first (mapPartitions; the global step is unchanged).
    */
  def skyline2d(df: DataFrame, maxCol: String, minCol: String): DataFrame = {
    val lv = df.groupBy(col(maxCol)).agg(min(col(minCol)).as("_md"))
    val wGe = Window.orderBy(col(maxCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wGt = Window.orderBy(col(maxCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cm = lv.select(col(maxCol),
      min(col("_md")).over(wGe).as("_mge"),
      min(col("_md")).over(wGt).as("_mgt"))
    df.join(cm, Seq(maxCol))
      .where(!(col("_mge") < col(minCol) ||
        (col("_mgt").isNotNull && col("_mgt") <= col(minCol))))
      .drop("_mge", "_mgt")
  }

  /** ABC (Pareto) classification: rank units by a measure DESC, classify
    * by cumulative share — A ≤ 80%, B ≤ 95%, C the tail — and report one
    * row per class (n_units, class total). `measure` must be an exact
    * (decimal/integer) column: the class cut compares `cum·20 ≤ total·16`
    * and `cum·20 ≤ total·19` in exact arithmetic, so the boundary is
    * engine-reproducible — no floating-point share ever materializes.
    *
    * The cumulative window sorts the per-unit aggregate (dimension-sized;
    * `idCol` breaks measure ties deterministically). A unit dimension too
    * large for one task partitions by measure range first (the cumsum
    * then composes from per-range totals).
    */
  def abcClasses(perUnit: DataFrame, idCol: String, measureCol: String): DataFrame = {
    val w = Window.orderBy(col(measureCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = perUnit.agg(sum(col(measureCol)).as("_tot"))
    perUnit
      .withColumn("_cum", sum(col(measureCol)).over(w))
      .crossJoin(broadcast(total))
      .withColumn("abc_class",
        when(col("_cum") * 20 <= col("_tot") * 16, "A")
          .when(col("_cum") * 20 <= col("_tot") * 19, "B")
          .otherwise("C"))
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_units"),
        sum(col(measureCol)).cast("double").as("class_total"))
  }

  /** Gini concentration coefficient of `weightCol` across `keyCol`
    * members, one row per `groupCol` value: 0 = evenly spread, →1 = all
    * weight on one member. Exact integer rank-sum form
    * `G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ)` over members sorted by
    * (weight, key) — every term is exact integer arithmetic; the single
    * final division is the only floating-point step, so the value is
    * engine-reproducible bit-for-bit.
    *
    * The rank window partitions by group — parallel across groups; within
    * a group it sorts member cardinality (dimension-sized).
    */
  def giniByGroup(perKey: DataFrame, groupCol: String, keyCol: String,
                  weightCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(weightCol), col(keyCol))
    perKey
      .withColumn("_i", row_number().over(w).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_keys"),
        sum(col(weightCol)).as("_sx"),
        sum(col("_i") * col(weightCol)).as("_six"))
      .select(col(groupCol), col("n_keys"),
        ((lit(2.0) * col("_six").cast("double")
          - (col("n_keys") + 1).cast("double") * col("_sx").cast("double"))
          / (col("n_keys").cast("double") * col("_sx").cast("double")))
          .as("gini"))
  }

  /** Cohort lifetime value: customers cohorted by their FIRST order
    * month, revenue rolled up per (cohort, months-since-cohort), and the
    * cumulative spend per cohort customer (LTV curve) accumulated across
    * ages. Months index as `year·12 + month` — exact integer arithmetic,
    * engine-reproducible. Revenue sums in exact decimal; the per-customer
    * division at the end is the only float (6dp).
    *
    * The fact table shuffles twice (first-order pass, cohort-age rollup);
    * the cumulative window runs per cohort over its ages —
    * dimension-sized and parallel across cohorts.
    */
  def cohortLtv(orders: DataFrame, custCol: String, dateCol: String,
                amountCol: String): DataFrame = {
    val mi = (year(col(dateCol)) * 12 + month(col(dateCol))).cast("long")
    val perCust = orders.groupBy(col(custCol)).agg(min(mi).as("_cohort"))
    val sized = perCust.groupBy(col("_cohort")).agg(count(lit(1)).as("n_cohort"))
    val aged = orders
      .select(col(custCol), mi.as("_m"),
        col(amountCol).cast("decimal(18,2)").as("_amt"))
      .join(perCust, Seq(custCol))
      .groupBy(col("_cohort"), (col("_m") - col("_cohort")).as("age_months"))
      .agg(sum(col("_amt")).as("_rev"),
        count_distinct(col(custCol)).as("n_active"))
    val w = Window.partitionBy(col("_cohort")).orderBy(col("age_months"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    aged.withColumn("_cum", sum(col("_rev")).over(w))
      .join(broadcast(sized), Seq("_cohort"))
      .select(col("_cohort").as("cohort_month"), col("age_months"),
        col("n_active"), col("_rev").cast("double").as("revenue"),
        round(col("_cum").cast("double") / col("n_cohort").cast("double"), 6)
          .as("cum_ltv_per_customer"))
  }

  /** RFM segmentation: per customer recency (latest order), frequency
    * (order count), monetary (exact decimal total) → quintile scores
    * (ntile(5); 5 = most recent / most frequent / highest spend, ties
    * broken by the key for determinism) → one row per (r, f, m) cell with
    * customer count and the cell's exact total spend.
    *
    * Three [[Ranking.exactNtile]] passes over the customer-sized
    * aggregate (the fact table shuffles once, map-side combined) — exact
    * window-ntile semantics WITHOUT a single-partition global sort; the
    * chained sorts reuse each predecessor's shuffle files.
    */
  def rfmCells(orders: DataFrame, custCol: String, dateCol: String,
               amountCol: String): DataFrame = {
    val perCust = orders.groupBy(col(custCol))
      .agg(max(col(dateCol)).as("_rec"), count(lit(1)).as("_freq"),
        sum(col(amountCol).cast("decimal(18,2)")).as("_mon"))
    val scored = Seq(("_rec", "r_score"), ("_freq", "f_score"),
      ("_mon", "m_score")).foldLeft(perCust) { case (df, (c, s)) =>
        Ranking.exactNtile(df, 5, Seq(col(c), col(custCol)), s)
      }
    scored
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("_mon")).cast("double").as("total_spend"))
  }

  /** One-row inter-purchase cadence summary: day gaps between each
    * customer's CONSECUTIVE orders (lag over (date, key) — the key breaks
    * same-day ties deterministically), then repeat-customer count, gap
    * count, mean, min/max, and interpolated quartiles + p90 over all
    * gaps. The per-customer lag window partitions on the customer key —
    * per-partition state is one row, never a sort of the whole fact
    * table — and the final percentile is one scalar aggregate whose
    * interpolation convention (linear, like `quantile_cont`) both engines
    * share. Gap of 0 days (same-day repeat orders) counts: cadence
    * includes bursts.
    */
  def interpurchaseGaps(orders: DataFrame, custCol: String, dateCol: String,
                        keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(custCol))
      .orderBy(col(dateCol), col(keyCol))
    val gaps = orders
      .withColumn("_gap",
        datediff(col(dateCol), lag(col(dateCol), 1).over(w)))
      .where(col("_gap").isNotNull)
      .select(col(custCol).as("c"), col("_gap").cast("double").as("g"))
    gaps.agg(
      count_distinct(col("c")).as("repeat_customers"),
      count(lit(1)).as("n_gaps"),
      round(avg(col("g")), 6).as("avg_gap_days"),
      min(col("g")).cast("long").as("min_gap_days"),
      max(col("g")).cast("long").as("max_gap_days"),
      percentile(col("g"),
        array(lit(0.25), lit(0.5), lit(0.75), lit(0.9))).as("_q"))
      .select(col("repeat_customers"), col("n_gaps"), col("avg_gap_days"),
        col("min_gap_days"), col("max_gap_days"),
        round(element_at(col("_q"), 1), 6).as("p25"),
        round(element_at(col("_q"), 2), 6).as("p50"),
        round(element_at(col("_q"), 3), 6).as("p75"),
        round(element_at(col("_q"), 4), 6).as("p90"))
  }

  /** ClickHouse `sparkBar` analog: per group, a fixed-width unicode bar
    * chart of activity over `nSlots` integer slots (e.g. hour-of-day) as
    * a string — plus the total and the deterministic peak slot (lowest
    * slot on count ties). Dense slot grid: every group × every slot, so
    * flat groups render flat instead of collapsing.
    *
    * Bar levels are INTEGER arithmetic only — level = ⌈cnt·8 / max⌉ via
    * `(cnt*8 + max - 1) DIV max` — so the glyph string is engine-exact
    * (no float rounding at level boundaries). Shape: one slot-grain
    * aggregate with map-side combine, then a group-grain sort of ≤nSlots
    * elements inside `array_sort` — no window over the raw rows.
    */
  def sparkbar(df: DataFrame, groupCol: Column, slotCol: Column,
               nSlots: Int): DataFrame = {
    require(nSlots >= 1 && nSlots <= 1024, s"bad nSlots=$nSlots")
    val blocks = "▁▂▃▄▅▆▇█"
    val cnt = df.select(groupCol.as("g"), slotCol.cast("int").as("slot"))
      .groupBy(col("g"), col("slot")).agg(count(lit(1)).as("cnt"))
    val dense = cnt.select(col("g")).distinct()
      .withColumn("slot", explode(sequence(lit(0), lit(nSlots - 1))))
      .join(cnt, Seq("g", "slot"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    dense
      .withColumn("mx", max(col("cnt")).over(Window.partitionBy(col("g"))))
      .withColumn("ch", when(col("cnt") === 0, lit(" "))
        .otherwise(expr(s"substr('$blocks', CAST((cnt * 8 + mx - 1) DIV mx AS INT), 1)")))
      .groupBy(col("g"))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("slot"),
          col("ch")))), x => x.getField("ch")), "").as("bar"),
        sum(col("cnt")).as("total"),
        min(when(col("cnt") === col("mx"), col("slot"))).as("peak_slot"))
  }

  /** Lorenz concentration curve of a per-key weight — the curve behind
    * [[giniByGroup]]'s scalar: per decile of KEYS (users ranked ascending
    * by weight, NTILE bucket rule: the first n%10 deciles hold the extra
    * key), the cumulative share of total weight — "the bottom 80% of
    * users generate 12% of events" read directly.
    *
    * Scale shape: the fact table collapses to the key grain BEFORE this;
    * deciles come from [[Ranking.exactNtile]] (the zipWithIndex global
    * rank — no single-partition window over the key dimension); the
    * cumulative fold then runs on the 10-row decile frame. Exact int64
    * sums until the final share ratio.
    */
  def lorenzCurve(perKey: DataFrame, keyCol: String,
                  weightCol: String): DataFrame = {
    val bucketed = Ranking.exactNtile(
      perKey.select(col(keyCol).as("k"), col(weightCol).cast("long").as("x")),
      10, Seq(col("x"), col("k")), "decile")
    val byDecile = bucketed.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_keys"), sum(col("x")).as("sx"))
    val tiny = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = byDecile.agg(sum(col("sx")).as("total"))
    byDecile.crossJoin(broadcast(tot))
      .where(col("total") > 0)
      .select(col("decile"),
        sum(col("n_keys")).over(tiny).as("n_keys_cum"),
        sum(col("sx")).over(tiny).as("weight_cum"),
        round(sum(col("sx")).over(tiny).cast("double") /
          col("total").cast("double"), 6).as("share"))
      .orderBy(col("decile"))
  }

  /** Measure-weighted Herfindahl–Hirschman concentration per group: how
    * concentrated is `measure` (an exact integer column — cents) across
    * the `key` dimension inside each `group` — HHI = Σᵢ sᵢ²/S², plus the
    * key count and the single largest share (CR1). The revenue-weighted
    * dual of [[graft.operators.Profiler.groupHhi]]'s count-based HHI.
    *
    * Exactness: per-key totals are exact integer sums; Σsᵢ² rides
    * decimal(38,0) cross products (the StatTests xprod convention — a
    * cents total squared exceeds int64 long before it exceeds
    * decimal(38,0), and decimal overflow nulls LOUDLY rather than
    * wrapping), so HHI is one double division of two exact integers —
    * engine-reproducible. One map-side-combined aggregation to the
    * (group, key) grain, one to the group grain: no windows, no joins.
    */
  def revenueHhi(df: DataFrame, groupCol: String, keyCol: String,
                 cents: Column): DataFrame = {
    def xp(c: Column): Column =
      c.cast("decimal(19,0)") * c.cast("decimal(19,0)")
    val perKey = df.groupBy(col(groupCol), col(keyCol))
      .agg(sum(cents.cast("long")).as("m"))
    perKey.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("m").cast("decimal(38,0)")).as("s"),
        sum(xp(col("m"))).as("s2"), max(col("m")).as("mx"))
      .where(col("s") > 0)
      .select(col(groupCol), col("n_keys"),
        round(col("s2").cast("double") /
          (col("s").cast("double") * col("s").cast("double")), 6).as("hhi"),
        round(col("mx").cast("double") / col("s").cast("double"), 6)
          .as("top_share"))
  }

  /** Monthly unit-value price index against the frame's FIRST month
    * (Laspeyres-family, matched-items form): for every month m, the
    * ratio of the matched-item unit value (Σ revenue / Σ quantity over
    * items traded in BOTH m and the base month) to the base month's —
    * the "are prices drifting" readout a replicated order book serves.
    * Matching per month removes the composition artifact (a month that
    * happens to ship luxury items would otherwise read as inflation).
    *
    * Exactness: all four component sums are exact integer aggregates at
    * the (month, item) grain; the index is ONE fixed double tree over
    * them — engine-reproducible. One grain aggregation, one item-key
    * join against the base-month slice (co-partitioned on the item
    * dimension), one month-grain rollup. Output (month, n_items, index).
    */
  def unitValueIndex(df: DataFrame, dateCol: Column, itemCol: Column,
                     qtyCol: Column, cents: Column): DataFrame = {
    // r20 NOTE — measured and left alone: grain feeds three consumers
    // (min-month broadcast, base filter, index join) and re-executes in
    // each, but both materialization cures cost MORE wall than the
    // duplicate scans here: an eager localCheckpoint serialized the
    // formerly-CONCURRENT branches (1.27 → 1.74 s), and a lazy
    // MEMORY_AND_DISK persist paid columnar cache build + decompression
    // dearer still (→ 3.2 s). The re-executed subplan is scan+one
    // map-side-combined aggregate — cheap relative to a cache round-trip
    // of the item×month grain.
    val grain = df
      .select(date_trunc("MONTH", dateCol).as("m"), itemCol.as("k"),
        qtyCol.cast("long").as("q"), cents.cast("long").as("e"))
      .groupBy(col("m"), col("k"))
      .agg(sum(col("q")).as("q"), sum(col("e")).as("e"))
    val base = grain
      .crossJoin(broadcast(grain.agg(min(col("m")).as("m0"))))
      .where(col("m") === col("m0"))
      .select(col("k"), col("q").as("q0"), col("e").as("e0"))
    def d(c: Column): Column = c.cast("double")
    grain.join(base, Seq("k"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_items"), sum(col("e")).as("se"),
        sum(col("q")).as("sq"), sum(col("e0")).as("se0"),
        sum(col("q0")).as("sq0"))
      .where(col("sq") > 0 && col("sq0") > 0 && col("se0") > 0)
      .select(col("m").as("month"), col("n_items"),
        round((d(col("se")) / d(col("sq")))
          / (d(col("se0")) / d(col("sq0"))), 6).as("price_index"))
  }

  /** Croston's method (1972) per item over the monthly demand series —
    * the forecasting member built for INTERMITTENT demand (many
    * zero-demand months, where exponential smoothing of the raw series
    * chases zeros): two EMAs, one over nonzero demand SIZES (z) and one
    * over the INTERVALS between demands (p), forecast = z/p demand per
    * period. α = 1/2, dyadic on purpose — every IEEE step of the fold is
    * order-determined (the hourlyHolt argument), so a DuckDB recursive
    * CTE replays the recurrence over every item in lockstep and
    * hash-matches bit-for-bit.
    *
    * Init: z = the first nonzero demand, p = its 1-based position in the
    * item's dense month series (periods waited for the first demand);
    * later demands after a q-month gap fold z' = x/2 + z/2,
    * p' = q/2 + p/2. Items with no demand at all cannot exist (they have
    * no rows); single-demand items report their init state.
    *
    * Scale shape: one (item, month) grain aggregation, a month-spine
    * join (dense per item over the GLOBAL span — intermittency is the
    * point), one collect-to-array per item (series length = calendar
    * months, bounded), and the per-item fold runs as a higher-order
    * aggregate inside the projection — no iterative joins, no windows
    * over the fact table.
    */
  def crostonForecast(df: DataFrame, dateCol: Column, itemCol: Column,
                      qtyCol: Column): DataFrame = {
    val grain = df
      .select(date_trunc("MONTH", dateCol).as("m"), itemCol.as("k"),
        qtyCol.cast("long").as("x"))
      .groupBy(col("m"), col("k")).agg(sum(col("x")).as("x"))
    val spine = grain
      .agg(min(col("m")).as("m0"), max(col("m")).as("m1"))
      .select(explode(sequence(col("m0"), col("m1"),
        expr("INTERVAL 1 MONTH"))).as("m"))
    // r20: EXPLICIT repartition BEFORE the item-key distinct — the AQE
    // single-task coalescing trap (the jaccardPairsPrefix note): the
    // distinct item keys are byte-wise tiny, AQE coalesced the distinct's
    // ENSURE_REQUIREMENTS exchange to ONE partition, and the ×months
    // cross-join fan-out plus the per-item Croston fold then ran serially
    // in that task (measured: a 2.87 s single-task job, ~60% of the
    // query's wall). The user exchange on the same key satisfies the
    // distinct aggregate's required distribution (the sizedDistinctPairs
    // plan contract), so Catalyst plans no further exchange — and a
    // user-specified repartition is EXEMPT from coalescing, keeping the
    // fan-out parallel. A repartition placed ABOVE the distinct is
    // removed as redundant and the trap returns (measured both ways).
    val dense = grain.select(col("k"))
      .repartition(graft.GraftSession.parallelismFloor(df.sparkSession),
        col("k"))
      .distinct()
      .crossJoin(spine)
      .join(grain, Seq("k", "m"), "left")
      .select(col("k"), col("m"), coalesce(col("x"), lit(0L)).as("x"))
    dense
      .groupBy(col("k"))
      .agg(array_sort(collect_list(struct(col("m"), col("x")))).as("s"))
      .select(col("k"), size(col("s")).cast("long").as("n_months"),
        expr("""aggregate(
            transform(s, e -> CAST(e.x AS DOUBLE)),
            named_struct('z', CAST(0.0 AS DOUBLE), 'p', CAST(0.0 AS DOUBLE),
                         'q', CAST(0.0 AS DOUBLE), 'nd', CAST(0 AS BIGINT)),
            (acc, x) -> CASE
              WHEN x <= 0.0D THEN named_struct('z', acc.z, 'p', acc.p,
                'q', acc.q + 1.0D, 'nd', acc.nd)
              WHEN acc.nd = 0 THEN named_struct('z', x, 'p', acc.q + 1.0D,
                'q', CAST(0.0 AS DOUBLE), 'nd', CAST(1 AS BIGINT))
              ELSE named_struct(
                'z', 0.5D * x + 0.5D * acc.z,
                'p', 0.5D * (acc.q + 1.0D) + 0.5D * acc.p,
                'q', CAST(0.0 AS DOUBLE), 'nd', acc.nd + 1)
            END)""").as("st"))
      .where(col("st.nd") > 0L)
      .select(col("k"), col("n_months"), col("st.nd").as("n_demands"),
        round(col("st.z"), 6).as("demand_size"),
        round(col("st.p"), 6).as("demand_interval"),
        round(col("st.z") / col("st.p"), 6).as("forecast_per_month"))
  }

  /** Daily open-order backlog: how many orders are placed but not yet
    * fully shipped on each calendar day — the classic interval sweep
    * (+1 at the order date, −1 the day AFTER the last lineitem ships,
    * one cumulative sum over the day-grain delta frame; the
    * `events_max_concurrent` shape applied to the order book). All
    * integers; the window sorts calendar days, never orders.
    */
  def openBacklog(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val spans = orders.join(lineitem,
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(min(date_trunc("DAY", col("o_orderdate"))).as("d0"),
        max(date_trunc("DAY", col("l_shipdate"))).as("d1"))
    val deltas = spans.select(col("d0").as("d"), lit(1L).as("delta"))
      .union(spans.select(expr("d1 + INTERVAL 1 DAY"), lit(-1L)))
      .groupBy(col("d")).agg(sum(col("delta")).as("delta"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .select(col("d").as("day"), sum(col("delta")).over(w).as("open_orders"))
  }

  /** Directed association rules a → b at `itemCol` granularity — the
    * ordered-rule readout over [[marketBasket]]'s unordered pair support:
    * for every ordered pair with co-support ≥ `minN` baskets,
    * confidence P(b|a), lift, leverage (P(ab) − P(a)P(b)) and conviction
    * ((1 − P(b)) / (1 − conf); NULL for exact rules where conf = 1 —
    * infinite conviction reported loudly as absence, not as a sentinel).
    * Same plan shape as [[marketBasket]] (r20): pair enumeration is a
    * double `explode` of the checkpointed per-basket distinct item set —
    * no basket-key self-join; marginals and the basket total are
    * broadcast; every statistic is a fixed scalar tree over exact
    * integer counts.
    */
  def basketRules(df: DataFrame, basketCol: String, itemCol: String,
                  minN: Long = 1L): DataFrame = {
    val sets = basketItemSets(df, basketCol, itemCol)
    val marginals = sets.select(explode(col("_items")).as("_it"))
      .groupBy(col("_it")).agg(count(lit(1)).as("_n"))
    val totals = sets.agg(count(lit(1)).as("_nb"))
    def d(c: Column): Column = c.cast("double")
    val conf = d(col("n_ab")) / d(col("_na"))
    sets.where(col("_bk").isNotNull)
      .select(explode(col("_items")).as("antecedent"), col("_items"))
      .select(col("antecedent"), explode(col("_items")).as("consequent"))
      .where(col("antecedent") =!= col("consequent"))
      .groupBy(col("antecedent"), col("consequent"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minN)
      .join(broadcast(marginals.select(col("_it").as("antecedent"),
        col("_n").as("_na"))), Seq("antecedent"))
      .join(broadcast(marginals.select(col("_it").as("consequent"),
        col("_n").as("_nc"))), Seq("consequent"))
      .crossJoin(broadcast(totals))
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        round(conf, 6).as("confidence"),
        round(d(col("n_ab")) * d(col("_nb"))
          / (d(col("_na")) * d(col("_nc"))), 6).as("lift"),
        round(d(col("n_ab")) / d(col("_nb"))
          - d(col("_na")) / d(col("_nb")) * (d(col("_nc")) / d(col("_nb"))),
          6).as("leverage"),
        when(col("n_ab") < col("_na"),
          round((lit(1.0) - d(col("_nc")) / d(col("_nb")))
            / (lit(1.0) - conf), 6)).as("conviction"))
  }
}
