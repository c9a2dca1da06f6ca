package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OLAP analytics over the replicated target — the query side of the
  * reference pipeline (what a user points at ClickHouse once PeerDB has
  * mirrored the tables): grouped aggregation, star-schema joins, selective
  * scans, semi-joins, windowed ranking.
  *
  * Scale notes: joins against the *bounded* dimensions (region=5 rows,
  * nation=25 rows at every scale factor) are explicitly `broadcast(...)`;
  * dimensions whose cardinality grows with the scale factor (customer,
  * supplier, part) are left to Catalyst/AQE, which broadcasts them while
  * they fit and falls back to a shuffle join at 100 TB where a forced
  * broadcast would OOM the executors. Monetary math is done in
  * DECIMAL(18,2) so results are exact and order-independent (safe under
  * any partitioning / AQE re-plan).
  */
object Analytics {

  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** Cast the named (decimal) output columns to DOUBLE in a final projection.
    * All monetary math stays DECIMAL internally (exact, order-independent);
    * only the *emitted* column converts, so results are engine-comparable —
    * consumers reading the result as float64 see identical bits regardless
    * of which engine produced it.
    */
  private def emitDouble(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("double")))

  /** TPC-H Q1-style pricing summary: wide grouped aggregation over the
    * biggest fact table. Single shuffle on the tiny (flag,status) key space;
    * all aggregates combine map-side.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    emitDouble(
      lineitem
        .where(col("l_shipdate") <= lit("1999-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec("l_quantity")).as("sum_qty"),
          sum(dec("l_extendedprice")).as("sum_base_price"),
          sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      "sum_qty", "sum_base_price", "sum_disc_price")

  /** TPC-H Q3-style: revenue of unshipped orders per (order, date, priority).
    * customer is broadcast; orders⋈lineitem shuffles on the order key only.
    */
  def unshippedRevenue(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem.where(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .join(orders.where(col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.where(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
        .cast("double").as("revenue"))

  /** TPC-H Q5-style: local-supplier volume per nation within one region.
    * All four dims broadcast; the only shuffles are fact⋈fact on l_orderkey
    * and the final tiny groupBy.
    */
  def regionVolume(region: DataFrame, nation: DataFrame, customer: DataFrame,
                   supplier: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val natInRegion = nation
      .join(broadcast(region.where(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
    lineitem
      .join(orders.where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1999-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(natInRegion), col("s_nationkey") === col("n_nationkey"))
      .join(customer, col("o_custkey") === col("c_custkey")
        && col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
        .cast("double").as("revenue"))
  }

  /** TPC-H Q6-style: selective filter + single sum. The filters are plain
    * comparisons so they push down into the parquet scan (`PushedFilters`),
    * and only 3 columns are read.
    */
  def revenueDelta(lineitem: DataFrame): DataFrame =
    lineitem
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_discount").between(0.05, 0.07)
        && col("l_quantity") < 24)
      .agg(sum(dec("l_extendedprice") * dec("l_discount")).cast("double").as("revenue"))

  /** TPC-H Q4-style: order counts per priority for orders with at least one
    * late lineitem — a left-semi join, which shuffles only the keys.
    */
  def prioritySemiJoin(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders.where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .join(lineitem.where(col("l_shipdate") > lit("1996-06-01").cast("timestamp")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))

  /** Big-spender customers: per-customer order revenue with a HAVING cut. */
  def topCustomers(customer: DataFrame, orders: DataFrame, minRevenue: Double): DataFrame =
    orders.groupBy(col("o_custkey"))
      .agg(sum(dec("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .where(col("revenue") > lit(minRevenue))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"),
        col("revenue").cast("double").as("revenue"), col("n_orders"))

  /** Revenue rank of customers within their nation — windowed ranking over an
    * already-aggregated (hence small) frame; rank ties are exact because the
    * ranking key is a DECIMAL sum.
    */
  def nationRevenueRank(customer: DataFrame, orders: DataFrame, nation: DataFrame): DataFrame = {
    val perCust = orders.groupBy(col("o_custkey"))
      .agg(sum(dec("o_totalprice")).as("revenue"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("revenue").desc, col("c_custkey"))
    perCust.select(col("n_name"), col("c_custkey"),
        col("revenue").cast("double").as("revenue"), // rank ties stay DECIMAL-exact above
        rank().over(w).cast("bigint").as("rev_rank")) // bigint: rank() is int64 in DuckDB
      .where(col("rev_rank") <= 3)
  }

  /** Top-n orders per nation WITHOUT a window: the bounded
    * [[graft.expressions.TopKAggregator]] over the raw fact rows. A
    * `row_number()` window here would shuffle EVERY order row to its
    * nation's partition and sort it; the aggregator combines map-side and
    * ships at most n rows per nation per mapper — shuffling the answer,
    * not the corpus (the same lever the ANN top-k paths use, applied to a
    * plain analytics ranking). Ties break by order key, matching the
    * oracle's `row_number() OVER (... DESC, o_orderkey)` exactly.
    */
  def topOrdersPerNation(customer: DataFrame, orders: DataFrame,
                         nation: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.Encoders
    val topk = udaf(new graft.expressions.TopKAggregator(n),
      Encoders.product[graft.expressions.ScoredId])
    orders
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(topk(col("o_orderkey"), col("o_totalprice")).as("top"))
      .select(col("n_name"), posexplode(col("top")))
      .select(col("n_name"), col("col.id").as("o_orderkey"),
        col("col.score").as("o_totalprice"),
        (col("pos") + 1).cast("bigint").as("rk"))
  }

  /** TPC-H Q22-style: well-funded customers with no orders — an anti-join.
    * The "above average balance" threshold is evaluated as
    * `balance × N > ΣbalancesN` (all DECIMAL/integer math) so the cut is
    * exact under any aggregation order; the scalar aggregate broadcasts.
    */
  def idleCustomers(customer: DataFrame, orders: DataFrame): DataFrame = {
    val totals = customer.where(col("c_acctbal") > 0)
      .agg(sum(dec("c_acctbal")).as("bal_sum"), count(lit(1)).as("bal_n"))
    customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(broadcast(totals))
      .where(dec("c_acctbal") * col("bal_n") > col("bal_sum"))
      .select(col("c_custkey"), col("c_name"), dec("c_acctbal").cast("double").as("acctbal"))
  }

  /** TPC-H Q13-style: distribution of orders-per-customer including
    * zero-order customers — left outer join, then a two-level aggregation.
    */
  def orderCountDistribution(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  /** TPC-H Q18-style: orders whose total lineitem quantity exceeds the
    * threshold, with customer context — HAVING over a join aggregate. The
    * quantity rollup happens before the customer join, so only qualifying
    * orders reach it.
    */
  def largeOrders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                  minQty: Int): DataFrame = {
    val bigOrders = lineitem.groupBy(col("l_orderkey"))
      .agg(sum(dec("l_quantity")).as("total_qty"))
      .where(col("total_qty") > minQty)
    orders.join(bigOrders, col("o_orderkey") === col("l_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("total_qty").cast("double").as("total_qty"))
  }

  /** TPC-H Q7-style: shipping volume between two nations, both directions,
    * per year.
    *
    * The nation predicate is pushed *into* supplier and customer before any
    * fact join: at 25 nations the two qualifying ones keep ~8% of each dim,
    * so the lineitem⋈supplier join prunes ~92% of the big fact before the
    * fact⋈fact shuffle on the order key — instead of joining everything and
    * discarding 92% at the end. The direction filter (A→B or B→A) still runs
    * last because a row's direction needs both sides.
    */
  def nationVolume(supplier: DataFrame, lineitem: DataFrame, orders: DataFrame,
                   customer: DataFrame, nation: DataFrame,
                   nationA: String, nationB: String): DataFrame = {
    val twoNations = nation.where(col("n_name").isin(nationA, nationB))
    val supp = supplier
      .join(broadcast(twoNations.select(col("n_nationkey").as("supp_nk"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("supp_nk"))
      .select(col("s_suppkey"), col("supp_nation"))
    val cust = customer
      .join(broadcast(twoNations.select(col("n_nationkey").as("cust_nk"),
        col("n_name").as("cust_nation"))), col("c_nationkey") === col("cust_nk"))
      .select(col("c_custkey"), col("cust_nation"))
    lineitem
      .join(supp, col("l_suppkey") === col("s_suppkey")) // AQE broadcasts the pruned dim while it fits
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .where((col("supp_nation") === nationA && col("cust_nation") === nationB)
        || (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("bigint").as("l_year")) // bigint: year() is int64 in DuckDB
      .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
        .cast("double").as("revenue"))
  }

  /** Rolling 7-day revenue: aggregate to days first (map-side combined
    * shuffle on ~thousands of keys), then a RANGE-frame window over the
    * tiny daily series. Ordering a single window over pre-aggregated days
    * is deliberate — the frame holds day rows, not fact rows, so the
    * "global" sort is over a few thousand rows at any scale factor.
    */
  def rollingRevenue(orders: DataFrame): DataFrame = {
    val daily = orders.groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(dec("o_totalprice")).as("day_revenue"))
      .withColumn("day_num", datediff(col("day"), lit("1995-01-01").cast("date")).cast("bigint"))
    val w = Window.orderBy(col("day_num")).rangeBetween(-6, 0)
    daily.select(col("day"), col("day_revenue").cast("double").as("day_revenue"),
      sum(col("day_revenue")).over(w).cast("double").as("rev_7d"))
  }

  /** Promo-share-style conditional aggregation per part type prefix. */
  def partTypeShare(part: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        sum(when(col("p_type").startsWith("PROMO"),
          dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .otherwise(lit("0.0000").cast("decimal(38,4)")))
          .cast("double").as("promo_revenue"),
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .cast("double").as("total_revenue"))

  private def vol = dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))

  /** TPC-H Q19-style disjunctive-predicate revenue: an OR of three
    * (brand, part-size range, line-quantity range) conjunct groups over the
    * part⋈lineitem join, summed into one discounted-revenue row. The classic
    * optimizer exercise: the disjunction itself cannot be pushed anywhere,
    * but its per-side envelopes can.
    *
    * Shape: each scan is pre-cut to its branch-union envelope — lineitem to
    * the quantity hull, part to the three brands and the size hull — BEFORE
    * the join (both reach the parquet scan as pushed filters), so the join
    * sees only candidate rows and the filtered brand slice broadcasts. The
    * residual OR runs once, codegen'd, over the joined candidates.
    */
  def disjunctiveRevenue(part: DataFrame, lineitem: DataFrame): DataFrame = {
    def branch(brand: String, sizeHi: Int, qtyLo: Int, qtyHi: Int) =
      col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(qtyLo, qtyHi)
    val brands = Seq("Brand#12", "Brand#23", "Brand#24")
    lineitem
      .where(col("l_quantity").between(1, 30))
      .join(part.select(col("p_partkey"), col("p_brand"), col("p_size"))
        .where(col("p_brand").isin(brands: _*) && col("p_size").between(1, 15)),
        col("l_partkey") === col("p_partkey"))
      .where(branch("Brand#12", 5, 1, 11) ||
        branch("Brand#23", 10, 10, 20) ||
        branch("Brand#24", 15, 20, 30))
      .agg(sum(vol).cast("double").as("revenue"), count(lit(1)).as("n_items"))
  }

  /** TPC-H Q8-style national market share: per order year, the target
    * nation's supplier revenue vs all suppliers' revenue for one part type
    * sold into one region. Emits numerator and denominator instead of their
    * quotient so the result stays exact decimal math (engine-comparable).
    *
    * Shape: the part filter cuts the fact FIRST (the most selective join),
    * bounded dims (region-restricted nations, supplier nations) broadcast,
    * customer/supplier ride Catalyst/AQE, final groupBy is per-year tiny.
    */
  def marketShare(region: DataFrame, nation: DataFrame, customer: DataFrame,
                  supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
                  part: DataFrame, targetNation: String, partType: String,
                  regionName: String): DataFrame = {
    val custNations = nation
      .join(broadcast(region.where(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cust_natkey"))
    val suppNations = nation
      .select(col("n_nationkey").as("supp_natkey"), col("n_name").as("supp_nation"))
    lineitem
      .join(part.where(col("p_type") === partType),
        col("l_partkey") === col("p_partkey"))
      .join(orders.where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNations), col("c_nationkey") === col("cust_natkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNations), col("s_nationkey") === col("supp_natkey"))
      .groupBy(year(col("o_orderdate")).cast("bigint").as("o_year")) // int64: year() is int32, DuckDB's is int64
      .agg(
        sum(when(col("supp_nation") === targetNation, vol)
          .otherwise(lit("0.0000").cast("decimal(38,4)")))
          .cast("double").as("nation_revenue"),
        sum(vol).cast("double").as("total_revenue"))
  }

  /** TPC-H Q9-style product-type profit by supplier nation and order year,
    * ADAPTED to this schema's lack of `partsupp` (reference quickstart
    * ships no ps_supplycost): unit cost is proxied by `p_retailprice`, the
    * reference-price column the part table does carry, so profit =
    * Σ(l_extendedprice·(1−l_discount) − p_retailprice·l_quantity) over
    * parts whose name contains `nameToken`. The join SHAPE is the classic
    * q9 — the fact table shuffles on its own join keys, nation broadcast,
    * part/supplier/orders AQE-decided — which is the point of carrying
    * the query; all money math stays DECIMAL-exact.
    */
  def productProfit(nation: DataFrame, supplier: DataFrame, part: DataFrame,
                    orders: DataFrame, lineitem: DataFrame,
                    nameToken: String): DataFrame = {
    val one = lit(1).cast("decimal(18,2)")
    val profit = dec("l_extendedprice") * (one - dec("l_discount")) -
      dec("p_retailprice") * dec("l_quantity")
    lineitem
      .join(part.where(col("p_name").contains(nameToken)),
        col("l_partkey") === col("p_partkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("bigint").as("o_year"))
      .agg(sum(profit).cast("double").as("profit"))
  }

  /** Repeat-purchase distribution: how many customers placed exactly k
    * orders, with each cohort's share — the retention-health readout of
    * the mirrored orders table. Two map-side-combined grouped passes
    * (customer grain, then the ≤dozens-row order-count grain) and a 1-row
    * broadcast total.
    */
  def repeatRate(orders: DataFrame): DataFrame = {
    val perCust = orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    val byCount = perCust.groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
    val total = byCount.agg(sum(col("n_customers")).as("n_all"))
    byCount.crossJoin(broadcast(total))
      .select(col("n_orders"), col("n_customers"),
        round(col("n_customers").cast("double") /
          col("n_all").cast("double"), 6).as("share"))
      .orderBy(col("n_orders"))
  }

  /** TPC-H Q10-style returned-item reporting: revenue a customer's returned
    * lineitems cost in one quarter, with the customer's nation. Group keys
    * are the customer attributes, so the aggregation shuffles once on the
    * customer key; nation broadcasts.
    */
  def returnedItems(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                    nation: DataFrame): DataFrame =
    lineitem.where(col("l_returnflag") === "R")
      .join(orders.where(col("o_orderdate") >= lit("1996-07-01").cast("timestamp")
        && col("o_orderdate") < lit("1996-10-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"),
        dec("c_acctbal").as("acctbal"), col("n_name"))
      .agg(sum(vol).cast("double").as("revenue"))
      .withColumn("acctbal", col("acctbal").cast("double"))

  /** TPC-H Q17-style small-quantity revenue: average yearly revenue lost if
    * orders below 20% of a part's average quantity were no longer taken,
    * for one brand. The per-part average is the classic correlated scalar
    * subquery; here it is a per-part (sum, count) aggregate joined back,
    * and the 20%-of-average cut is evaluated in MULTIPLIED-OUT form
    * (`qty * 5 * cnt < sum`) so the comparison stays exact decimal/integer
    * math — no engine-specific decimal-division semantics in the predicate.
    * Only the final divide-by-7 runs in double, after the exact sum.
    */
  def smallQuantityRevenue(part: DataFrame, lineitem: DataFrame,
                           brand: String): DataFrame = {
    // part grows with the scale factor: no broadcast hint (module policy —
    // AQE broadcasts the brand slice while it fits, shuffles at 100 TB)
    val li = lineitem.join(
      part.where(col("p_brand") === brand).select(col("p_partkey")),
      col("l_partkey") === col("p_partkey"))
    val perPart = li.groupBy(col("l_partkey").as("agg_partkey"))
      .agg(sum(dec("l_quantity")).as("qty_sum"), count(lit(1)).as("qty_cnt"))
    li.join(perPart, col("l_partkey") === col("agg_partkey"))
      .where(dec("l_quantity") * lit(5) * col("qty_cnt") < col("qty_sum"))
      .agg((sum(dec("l_extendedprice")).cast("double") / lit(7.0)).as("avg_yearly"))
  }

  /** TPC-H Q14-style promotion effect: the share of one shipping month's
    * revenue that promo-type parts earned. Emits numerator and denominator
    * (exact DECIMAL sums, cast only at the boundary) instead of the
    * `100 * x / y` percentage, the same engine-comparable convention as
    * [[marketShare]].
    *
    * Shape: the month predicate pushes into the lineitem scan (one month ≈
    * 1/84 of the fact); part is a scale-factor dimension, so no broadcast
    * hint — AQE broadcasts it while it fits and shuffles at 100 TB. The
    * final aggregate is a single row, all partial map-side.
    */
  def promoRevenue(part: DataFrame, lineitem: DataFrame,
                   monthStart: String = "1996-09-01",
                   monthEnd: String = "1996-10-01"): DataFrame =
    lineitem
      .where(col("l_shipdate") >= lit(monthStart).cast("timestamp")
        && col("l_shipdate") < lit(monthEnd).cast("timestamp"))
      .join(part.select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", vol)
          .otherwise(lit("0.0000").cast("decimal(38,4)")))
          .cast("double").as("promo_revenue"),
        sum(vol).cast("double").as("total_revenue"))

  /** TPC-H Q15-style top supplier: per-supplier revenue over one quarter,
    * keeping every supplier that ties the maximum — the scalar-subquery
    * pattern, expressed as a 1-row broadcast join against the max of the
    * same aggregate. The two aggregate subtrees are canonically identical,
    * so Catalyst/AQE exchange reuse computes the stage once; either way the
    * underlying scan is the pushed-down quarter slice, not the full fact.
    */
  def topSupplier(supplier: DataFrame, lineitem: DataFrame): DataFrame = {
    // the explicit null-key filter keeps BOTH uses of `revenue` canonically
    // identical (the equi-join pushes IsNotNull into its side anyway; the
    // max side wouldn't get it, which would break exchange reuse and scan
    // the quarter twice)
    val revenue = lineitem
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-04-01").cast("timestamp")
        && col("l_suppkey").isNotNull)
      .groupBy(col("l_suppkey"))
      .agg(sum(vol).as("total_rev"))
    val maxRev = revenue.agg(max(col("total_rev")).as("max_rev"))
    supplier.join(revenue, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(maxRev), col("total_rev") === col("max_rev"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
  }

  /** Order-fulfillment latency distribution: days from order placement to
    * each line item's ship date, summarized per order priority — the SLA
    * view an operations dashboard reads off the replicated target (count,
    * mean, exact median/p95, max).
    *
    * The fact joins the order dates on the fact's own key (one shuffle
    * each side, AQE free to pick the strategy); both sides are pruned to
    * two columns before the join, so the shuffle carries (key, date), not
    * the tables. The percentile aggregation groups into the handful of
    * priority buckets — partial map-side, exact within each small group.
    */
  def fulfillmentLatency(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val days = datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
    lineitem.select(col("l_orderkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderpriority"),
        col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        avg(days).as("avg_days"),
        expr("percentile(datediff(cast(l_shipdate as date), cast(o_orderdate as date)), 0.5)").as("p50_days"),
        expr("percentile(datediff(cast(l_shipdate as date), cast(o_orderdate as date)), 0.95)").as("p95_days"),
        max(days).cast("long").as("max_days"))
  }
}
