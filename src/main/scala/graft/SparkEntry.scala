package graft

import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every entry binds a library operator (graft.operators.* / functions.*) to
  * the test tables; `oracleSql` holds the DuckDB-equivalent SQL for the
  * exact-verifiable ones (approximate/hash-seeded ops are rows-only).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String) = Tables.load(s, dir, name)

  /** |lineitem| by sf dir, memoized for the JVM's lifetime:
    * supplier_best_partner sizes its pre-distinct shuffle from the join's
    * known output volume (= |lineitem|; see bipartiteBestPartner), which
    * is a parquet metadata-only count — cheap, but an ACTION, and paying
    * it inside every timed bench rep shifted that query's timings
    * relative to pre-r19 rounds (r19 ADVICE). The test dirs are
    * immutable; if a caller's dir mutates, the sizing is advisory (it
    * only shapes a shuffle), never a correctness input.
    */
  private val lineitemRowsByDir =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Scratch root for the driver-entry index lifecycle: ONE per JVM,
    * removed on exit — repeated Verify/Bench runs must not strand sf-sized
    * index trees under /tmp. Each invocation gets a FRESH subdirectory
    * (counter suffix) so concurrent evaluation, or re-evaluating a frame
    * returned by an earlier invocation after a later create(), never races
    * on the same index files. Trees older than the last FOUR are reclaimed
    * at mint time, not just at exit (a long-lived JVM evaluating indexed
    * queries repeatedly must not fill /tmp). The four-tree grace covers
    * the driver's SEQUENTIAL evaluation (Verify/Bench, including min-of-2
    * re-evaluation) and up to four in-flight invocations; a service
    * evaluating more indexed queries concurrently than that should call
    * the index lifecycles with its own scratch dirs instead.
    */
  private lazy val indexScratchRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft_jidx_drv")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(root)))
    root
  }
  private def deleteTree(p: java.nio.file.Path): Unit =
    try {
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
    } catch { case _: Throwable => () }
  private val indexScratchSeq = new java.util.concurrent.atomic.AtomicLong(0)
  private def indexScratch: String = {
    val n = indexScratchSeq.getAndIncrement()
    if (n >= 4) deleteTree(indexScratchRoot.resolve("idx" + (n - 4)))
    indexScratchRoot.toString + "/idx" + n
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.pricingSummary(
      Tables.load(spark, "/root/testdata/sf0.001", "lineitem"))

  private val isDelete = col("event_type") === "error"

  /** Map literal that REFUSES duplicate keys — a repeated query name must
    * fail the build, not silently shadow the earlier entry (a real r16
    * near-miss: a second `events_delta_sum` hid the round-12 one). */
  private def uniqueMap[V](entries: (String, V)*): Map[String, V] = {
    val dups = entries.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    entries.toMap
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = uniqueMap(
    // ---- analytics on the replicated target -------------------------------
    "q1_pricing_summary" -> ((s, d) => Analytics.pricingSummary(t(s, d, "lineitem"))),
    "q3_unshipped_revenue" -> ((s, d) =>
      Analytics.unshippedRevenue(t(s, d, "customer"), t(s, d, "orders"), t(s, d, "lineitem"))),
    "q5_region_volume" -> ((s, d) =>
      Analytics.regionVolume(t(s, d, "region"), t(s, d, "nation"), t(s, d, "customer"),
        t(s, d, "supplier"), t(s, d, "orders"), t(s, d, "lineitem"))),
    "q6_revenue_delta" -> ((s, d) => Analytics.revenueDelta(t(s, d, "lineitem"))),
    "q4_priority_semijoin" -> ((s, d) =>
      Analytics.prioritySemiJoin(t(s, d, "orders"), t(s, d, "lineitem"))),
    "top_customers" -> ((s, d) =>
      Analytics.topCustomers(t(s, d, "customer"), t(s, d, "orders"), 3000000.0)),
    "nation_revenue_rank" -> ((s, d) =>
      Analytics.nationRevenueRank(t(s, d, "customer"), t(s, d, "orders"), t(s, d, "nation"))),
    // grouped top-k over RAW fact rows via the bounded aggregator (ships k
    // rows per group per mapper, never the fact table — window-free)
    "top_orders_per_nation" -> ((s, d) =>
      Analytics.topOrdersPerNation(t(s, d, "customer"), t(s, d, "orders"),
        t(s, d, "nation"), 3)),
    "part_type_share" -> ((s, d) =>
      Analytics.partTypeShare(t(s, d, "part"), t(s, d, "lineitem"))),
    "q22_idle_customers" -> ((s, d) =>
      // "idle" = no order since 1999 (every customer has *some* order)
      Analytics.idleCustomers(t(s, d, "customer"),
        t(s, d, "orders").where(col("o_orderdate") >= lit("1999-01-01").cast("timestamp")))),
    "q13_order_distribution" -> ((s, d) =>
      Analytics.orderCountDistribution(t(s, d, "customer"), t(s, d, "orders"))),
    "q18_large_orders" -> ((s, d) =>
      Analytics.largeOrders(t(s, d, "customer"), t(s, d, "orders"), t(s, d, "lineitem"), 150)),
    "q7_nation_volume" -> ((s, d) =>
      Analytics.nationVolume(t(s, d, "supplier"), t(s, d, "lineitem"), t(s, d, "orders"),
        t(s, d, "customer"), t(s, d, "nation"), "NATION_3", "NATION_7")),
    "rolling_revenue" -> ((s, d) => Analytics.rollingRevenue(t(s, d, "orders"))),
    "q8_market_share" -> ((s, d) =>
      Analytics.marketShare(t(s, d, "region"), t(s, d, "nation"), t(s, d, "customer"),
        t(s, d, "supplier"), t(s, d, "orders"), t(s, d, "lineitem"), t(s, d, "part"),
        "NATION_3", "STANDARD", "ASIA")),
    // q9 adapted: retail price proxies the missing ps_supplycost — the
    // join SHAPE (fact on its own keys, nation broadcast) is the point
    "q9_product_profit" -> ((s, d) =>
      Analytics.productProfit(t(s, d, "nation"), t(s, d, "supplier"),
        t(s, d, "part"), t(s, d, "orders"), t(s, d, "lineitem"), "red")),
    "q10_returned_items" -> ((s, d) =>
      Analytics.returnedItems(t(s, d, "customer"), t(s, d, "orders"),
        t(s, d, "lineitem"), t(s, d, "nation"))),
    // repeat-purchase cohorts of the mirrored orders table
    "orders_repeat_rate" -> ((s, d) =>
      Analytics.repeatRate(t(s, d, "orders"))),
    "q14_promo_revenue" -> ((s, d) =>
      Analytics.promoRevenue(t(s, d, "part"), t(s, d, "lineitem"))),
    "q15_top_supplier" -> ((s, d) =>
      Analytics.topSupplier(t(s, d, "supplier"), t(s, d, "lineitem"))),
    "q17_small_qty_revenue" -> ((s, d) =>
      Analytics.smallQuantityRevenue(t(s, d, "part"), t(s, d, "lineitem"), "Brand#1")),

    // ---- CDC core ---------------------------------------------------------
    "cdc_latest_snapshot" -> ((s, d) =>
      CdcOps.latestSnapshot(t(s, d, "events"), Seq("user_id"), "event_id")),
    "cdc_soft_delete" -> ((s, d) =>
      CdcOps.softDeleteSnapshot(t(s, d, "events"), Seq("user_id"), "event_id", isDelete)),
    "cdc_mirror_meta" -> ((s, d) =>
      // syncedAt derived from ts (not wall clock) so the oracle can reproduce
      CdcOps.withMirrorMeta(t(s, d, "events"), Seq("user_id"), "event_id", isDelete,
        to_date(col("ts")), syncedAt = col("ts"))),
    "cdc_scd2_history" -> ((s, d) =>
      CdcOps.scd2History(t(s, d, "events"), Seq("user_id"), "ts", "event_id")),
    "cdc_batch_stats" -> ((s, d) =>
      CdcOps.batchStats(t(s, d, "events"), to_date(col("ts")), Seq("user_id"),
        col("event_type"), lit("error"))),
    "cdc_version_counts" -> ((s, d) =>
      CdcOps.versionCounts(t(s, d, "events"), Seq("user_id"), "event_id")),
    "cdc_event_type_rates" -> ((s, d) => CdcOps.opRates(t(s, d, "events"), col("event_type"))),
    "stream_windowed_counts" -> ((s, d) =>
      t(s, d, "events").groupBy(
          date_trunc("HOUR", col("ts")).as("window_start"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))),
    // gap-filled time series (ClickHouse ORDER BY ... WITH FILL): every
    // hour of the global span present per type, missing hours zero-counted,
    // the hourly sum carried forward LOCF-style. The only corpus-scale work
    // is the hourly aggregation; the hour spine (span-bounded) and type dim
    // are broadcast-sized
    // ClickHouse ORDER BY … WITH FILL INTERPOLATE: the hourly grid again,
    // but gaps LINEARLY interpolated between the bracketing observed
    // points (trailing gaps LOCF, leading gaps stay null). Integer-cent
    // hourly sums and integer epoch-hours make the interpolation a fixed
    // scalar tree over exact ints — engine-deterministic
    "events_gapfill_interp" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events")
      val hourly = ev.groupBy(col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000").as("hr"))
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      val spine = ev
        .agg(min(expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000")).as("h0"),
          max(expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000")).as("h1"))
        .select(explode(sequence(col("h0"), col("h1"))).as("hr"))
      val back = W.partitionBy(col("event_type")).orderBy(col("hr"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val fwd = W.partitionBy(col("event_type")).orderBy(col("hr"))
        .rowsBetween(W.currentRow, W.unboundedFollowing)
      val grid = ev.select(col("event_type")).distinct()
        .crossJoin(broadcast(spine))
        .join(hourly, Seq("event_type", "hr"), "left")
      val prevV = last(col("cents"), ignoreNulls = true).over(back)
      val prevH = last(when(col("cents").isNotNull, col("hr")), ignoreNulls = true).over(back)
      val nextV = first(col("cents"), ignoreNulls = true).over(fwd)
      val nextH = first(when(col("cents").isNotNull, col("hr")), ignoreNulls = true).over(fwd)
      val interp = prevV.cast("double") +
        (nextV.cast("double") - prevV.cast("double")) *
          (col("hr") - prevH).cast("double") / (nextH - prevH).cast("double")
      grid.select(col("event_type"), col("hr"),
        col("cents").isNotNull.as("observed"),
        round(when(col("cents").isNotNull, col("cents").cast("double"))
          .when(prevV.isNotNull && nextV.isNotNull, interp)
          .when(prevV.isNotNull, prevV.cast("double"))
          .otherwise(lit(null).cast("double")), 6).as("filled_cents"))
    }),
    // ClickHouse groupArrayLast(3): each user's three newest values
    // (ts, id DESC) as a newest-first CSV — one (key, ts) shuffle, rank
    // cutoff before the collect so only 3 rows per key reach the rollup
    "events_last_n" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val byRecency = W.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"),
          row_number().over(byRecency).as("rn"))
        .where(col("rn") <= 3)
        .groupBy(col("user_id"))
        .agg(array_join(transform(array_sort(collect_list(
            struct(col("rn"), col("cents")))), x => x("cents").cast("string")), ",")
          .as("last_values"))
    }),
    "events_gapfill_1h" -> ((s, d) => {
      val ev = t(s, d, "events")
      val hourly = ev.groupBy(col("event_type"),
          date_trunc("HOUR", col("ts")).as("window_start"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      val spine = ev
        .agg(date_trunc("HOUR", min(col("ts"))).as("h0"),
          date_trunc("HOUR", max(col("ts"))).as("h1"))
        .select(explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("window_start"))
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy(col("event_type")).orderBy(col("window_start"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      ev.select(col("event_type")).distinct()
        .crossJoin(broadcast(spine))
        .join(hourly, Seq("event_type", "window_start"), "left")
        .select(col("event_type"), col("window_start"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          last(col("sum_value"), ignoreNulls = true).over(w).as("sum_value_locf"))
    }),
    "events_sessionization" -> ((s, d) =>
      CdcOps.sessionize(t(s, d, "events"), Seq("user_id"), "ts", 1800L)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), max(col("session_seq")).as("n_sessions"))),
    "events_traffic_spikes" -> ((s, d) =>
      CdcOps.trafficSpikes(t(s, d, "events"), "ts", "event_type")),
    // Tukey box-plot fences over per-type hourly revenue: the exact
    // order-statistic quartile screen beside the mean-ratio spike test (r16)
    "events_tukey_outliers" -> ((s, d) =>
      Profiler.tukeyOutliers(t(s, d, "events"), "event_type",
        date_trunc("hour", col("ts")),
        floor(col("value") * 100 + 0.5).cast("long"))),
    // hot/idle-key profile: exact integer-microsecond inter-change gaps
    "cdc_change_rates" -> ((s, d) =>
      CdcOps.changeRates(t(s, d, "events"), "user_id", "ts", "event_id")),
    // materialized-view maintenance: snapshot -> one sync batch of partial
    // aggregates (retractions negated) -> collapsed read; equals the full
    // re-aggregation of the final live state, which is what the oracle runs
    // the maintained DENORMALIZED mirror, driver-checked: replay
    // orders ⋈ customer as CDC batches through MaterializedJoin (even
    // orders + all customers, then the odd half as a delta plus a
    // customer re-upsert propagated via the join index), read the view
    // FINAL; DuckDB recomputes the whole join from scratch — any
    // maintenance bug (missed propagation, stale index row, wrong
    // tombstone) hash-mismatches
    "cdc_materialized_join" -> ((s, d) => {
      // nBuckets=4 for the bench slice: the in-query lifecycle commits 4
      // mirrors × 2 batches, so file count (and manifest listing) scales
      // with nBuckets — 4 keeps the same maintenance semantics at half
      // the small-file overhead (production sizing stays the caller's)
      val cfg = MaterializedJoin.Config("o_orderkey", "o_custkey",
        "c_custkey", nBuckets = 4)
      val root = indexScratch
      // a 20% key-slice keeps the in-query rebuild bench-cheap; the
      // maintenance semantics (two batches, index propagation, re-upsert)
      // are unchanged and the oracle mirrors the slice
      val orders = t(s, d, "orders")
        .where(pmod(col("o_orderkey"), lit(5)) === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val cust = t(s, d, "customer").select(col("c_custkey"), col("c_name"))
      def stamp(df: DataFrame, v: Long) = df
        .withColumn("_version", lit(v)).withColumn("is_deleted", lit(false))
      MaterializedJoin.applyBatch(s, root, cfg,
        Some(stamp(orders.where(pmod(col("o_orderkey"), lit(2)) === 0), 1L)),
        Some(stamp(cust, 1L)), batchVersion = 1L)
      MaterializedJoin.applyBatch(s, root, cfg,
        Some(stamp(orders.where(pmod(col("o_orderkey"), lit(2)) === 1), 2L)),
        Some(stamp(cust.where(pmod(col("c_custkey"), lit(7)) === 0), 2L)),
        batchVersion = 2L)
      MaterializedJoin.read(s, root, cfg)
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
          col("o_totalprice"))
    }),
    "cdc_materialized_agg" -> ((s, d) => {
      val ev = t(s, d, "events")
        .withColumn("cents", floor(col("value") * 100).cast("long"))
      val cut = ev.agg(max(col("event_id"))).collect()(0).getLong(0) * 9 / 10
      val mirror0 = CdcOps.softDeleteSnapshot(
        ev.where(col("event_id") <= cut), Seq("user_id"), "event_id", isDelete)
      val upserts = CdcOps.latestSnapshot(
        ev.where(col("event_id") > cut), Seq("user_id"), "event_id")
        .withColumn("is_del", isDelete)
      val agg = MaterializedAgg.create(s, mirror0, Seq("event_type"),
        Seq("cents"), indexScratch)
      agg.refreshFromUpsert(mirror0, upserts, Seq("user_id"), "is_del")
      agg.read()
    }),
    "fuzzy_part_names" -> ((s, d) => {
      // q-gram prefix blocking (guaranteed recall, Fuzzy.editPairs): the
      // block key is (brand, type, rare-first gram) — its cardinality grows
      // with the corpus, unlike the raw fixed-cardinality (brand, type) key
      val p = t(s, d, "part").select(col("p_partkey"), col("p_brand"),
        col("p_type"), col("p_name"))
      Fuzzy.editPairs(p, "p_partkey", "p_name", 3, Seq("p_brand", "p_type"))
        .select(col("id_a").as("key_a"), col("id_b").as("key_b"),
          col("dist").as("edit_dist"))
    }),
    "value_histogram" -> ((s, d) =>
      t(s, d, "events").groupBy(
          width_bucket(col("value"), lit(0.0), lit(100.0), lit(20)).as("bucket"))
        .agg(count(lit(1)).as("n"))),
    "user_funnel" -> ((s, d) =>
      Behavior.funnelLevels(t(s, d, "events"), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))),
    // ClickHouse retention(signup, click, purchase): order-free retained-key
    // counts — of the users who ever signed up, how many also clicked /
    // purchased (at any time)
    "events_retention" -> ((s, d) =>
      Behavior.retention(t(s, d, "events"), "user_id",
        Seq(col("event_type") === "signup", col("event_type") === "click",
          col("event_type") === "purchase"))),
    // ClickHouse windowFunnel(6h): every chain start counts, all steps
    // within the window of the chain's FIRST event, strict time order
    "events_window_funnel" -> ((s, d) =>
      Behavior.windowFunnel(t(s, d, "events"), "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"), windowMicros = 6L * 3600 * 1000000)),
    // ClickHouse windowFunnel(24h, 'strict_order'): any intervening event
    // of another type breaks the chain — steps must be consecutive rows
    "events_funnel_strict" -> ((s, d) =>
      Behavior.windowFunnelStrictOrder(t(s, d, "events"), "user_id",
        "event_type", "ts", Seq("signup", "click", "purchase"),
        windowMicros = 24L * 3600 * 1000000)),
    // the same strict_order mode through the SQL surface (ties break by
    // condition bitmask; the oracle mirrors that order) — completes the
    // funnel-mode family in SQL: default, strict_order, strict_dedup
    "events_funnel_strict_sql" -> ((s, d) => {
      org.apache.spark.sql.graft.bridge.registerFunctions(s)
      t(s, d, "events").groupBy(col("user_id"))
        .agg(expr("window_funnel_strict(86400000000, ts, " +
          "event_type = 'signup', event_type = 'click', " +
          "event_type = 'purchase')").as("funnel_level"))
    }),
    // ClickHouse sequenceMatch('(?1)(?t<=2h)(?2)(?t<=2h)(?3)'): every
    // consecutive hop bounded separately, not the whole chain
    "events_sequence_match" -> ((s, d) =>
      Behavior.sequenceMatch(t(s, d, "events"), "user_id", "event_type",
        "ts", Seq("signup", "click", "purchase"),
        maxGapMicros = 2L * 3600 * 1000000)),
    // the FULL sequenceMatch pattern grammar, incl. a MINIMUM gap — a hop
    // the running-max DP cannot express; each hop's predecessor window is
    // a range frame [ts-hi, ts-lo] and existence inside it advances
    // ("click between 10 minutes and 2 hours after a view")
    "events_sequence_pattern" -> ((s, d) =>
      Behavior.sequenceMatchPattern(t(s, d, "events"), "user_id",
        "event_type", "ts", "(?1)(?t>=600000000)(?t<=7200000000)(?2)",
        Seq("view", "click"))),
    // the same pattern through ClickHouse's literal SQL call shape; the
    // value-interval semantics are tie-independent, so both forms share
    // the oracle verbatim
    "events_sequence_pattern_sql" -> ((s, d) => {
      org.apache.spark.sql.graft.bridge.registerFunctions(s)
      t(s, d, "events").groupBy(col("user_id"))
        .agg(expr("sequence_match_pattern(" +
          "'(?1)(?t>=600000000)(?t<=7200000000)(?2)', ts, " +
          "event_type = 'view', event_type = 'click')").as("matched"))
    }),
    // the level form of sequenceMatch (and the streaming funnel's batch
    // anchor): deepest gap-bounded step reached per user
    "events_sequence_levels" -> ((s, d) =>
      Behavior.sequenceLevels(t(s, d, "events"), "user_id", "event_type",
        "ts", Seq("signup", "click", "purchase"),
        maxGapMicros = 2L * 3600 * 1000000)),
    // ClickHouse sequenceCount: disjoint view→click chains per user (an
    // event feeds at most one chain) — sequential per key, secondary-sort
    // mapPartitions; oracled as a DuckDB recursive CTE stepping the same
    // automaton row-by-row (BehaviorSpec additionally pins a random-log
    // equality against an independent single-machine reference)
    "events_sequence_count" -> ((s, d) =>
      Behavior.sequenceCount(t(s, d, "events"), "user_id", "event_type",
        "ts", Seq("view", "click"), maxGapMicros = 2L * 3600 * 1000000)),
    // the same disjoint-chain automaton through the SQL surface
    // (sequence_count aggregate; ties break by condition bitmask, which
    // the oracle mirrors with a CASE tie-break)
    "events_sequence_count_sql" -> ((s, d) => {
      org.apache.spark.sql.graft.bridge.registerFunctions(s)
      t(s, d, "events").groupBy(col("user_id").cast("string").as("key"))
        .agg(expr("sequence_count(7200000000, ts, event_type = 'view', " +
          "event_type = 'click')").as("n_chains"))
    }),
    // ClickHouse uniqUpTo(3): exact distinct event types per user while
    // <= 3, else 4 ("more than 3") — aggregation state capped at 4 items
    "events_uniq_upto" -> ((s, d) => {
      val agg = udaf(new graft.expressions.UniqUpToAggregator(3),
        org.apache.spark.sql.Encoders.STRING)
      t(s, d, "events").groupBy(col("user_id"))
        .agg(agg(col("event_type")).as("uniq_upto"))
    }),
    // ClickHouse deltaSum: positive-delta totals of each user's value
    // series — counter-rate accounting tolerant of resets
    "events_delta_sum" -> ((s, d) =>
      Behavior.deltaSum(t(s, d, "events"), "user_id", "ts", "value", "event_id")
        .select(col("user_id"), round(col("delta_sum"), 4).as("delta_sum"))),
    // ClickHouse boundingRatio: (last value − first value) / elapsed
    // seconds per key, first/last by time order — the average rate a
    // monitor derives from a counter series; one grouped max_by/min_by
    // pass, no window sort
    "events_bounding_ratio" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          max_by(col("value"), struct(col("ts"), col("event_id"))).as("v_last"),
          min_by(col("value"), struct(col("ts"), col("event_id"))).as("v_first"),
          (graft.functions.TimeCols.micros(max(col("ts"))) -
            graft.functions.TimeCols.micros(min(col("ts")))).as("span_us"))
        .where(col("span_us") > 0)
        .select(col("user_id"),
          round((col("v_last") - col("v_first")) * 1000000.0 / col("span_us"), 8)
            .as("rate_per_sec"))),
    // ClickHouse groupArrayMovingAvg(5): trailing 5-row mean of each
    // user's value series — one (key, ts) shuffle, rows frame
    "events_moving_avg" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-4, 0)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          round(avg(col("value")).over(w), 4).as("mov_avg"))
    }),
    // ClickHouse groupArrayMovingSum(5): trailing 5-row sum — same single
    // (key, ts) shuffle as the moving average, shared by Catalyst
    "events_moving_sum" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-4, 0)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          round(sum(col("value")).over(w), 4).as("mov_sum"))
    }),
    // the ClickHouse -If combinator family (countIf/sumIf/avgIf/minIf/
    // maxIf) in one grouped pass: conditional aggregates are plain
    // when()-guarded aggregates in Spark — map-side combined, one shuffle
    "events_cond_aggs" -> ((s, d) =>
      t(s, d, "events").groupBy(col("user_id"))
        .agg(
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
          round(coalesce(sum(when(col("event_type") === "purchase", col("value"))),
            lit(0.0)), 4).as("sum_purchase"),
          round(avg(when(col("event_type") === "click", col("value"))), 4)
            .as("avg_click"),
          min(when(col("event_type") === "view", col("value"))).as("min_view"),
          max(when(col("event_type") === "view", col("value"))).as("max_view"))),
    // ClickHouse sequenceNextNode(forward, first_match): the event AFTER
    // the key's first consecutive view→click pair — two lead() passes over
    // ONE (key, ts) shuffle, then min_by(first hit) per key; keys without
    // a match keep a null next_op (every key emits one row)
    "events_next_after_chain" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("__l1", lead(col("event_type"), 1).over(w))
        .withColumn("__l2", lead(col("event_type"), 2).over(w))
        .withColumn("__hit",
          when(col("event_type") === "view" && col("__l1") === "click",
            struct(col("ts").as("t"), col("event_id").as("e"),
              col("__l2").as("nxt"))))
        .groupBy(col("user_id"))
        .agg(min(col("__hit")).as("__first"))
        .select(col("user_id"), col("__first.nxt").as("next_op"))
    }),
    // ClickHouse runningAccumulate: per-user cumulative value sum in
    // (ts, id) order — same single (key, ts) shuffle as the moving
    // family; incremental frame evaluation both engines share makes the
    // float cumsum order-identical
    "events_running_total" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          round(sum(col("value")).over(w), 4).as("running_total"))
    }),
    // ClickHouse GROUPING SETS (the rollup/cube sibling with hand-picked
    // cells): priority×status lattice over DECIMAL-exact revenue in ONE
    // grouped pass — Catalyst expands the sets map-side, no per-set scans
    "grouping_sets_revenue" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderpriority").as("priority"),
          col("o_orderstatus").as("status"),
          col("o_totalprice").cast("decimal(18,2)").as("p"))
        .groupingSets(
          Seq(Seq(col("priority"), col("status")), Seq(col("priority")),
            Seq(col("status")), Seq()),
          col("priority"), col("status"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("p")).cast("double").as("revenue"))),
    // ClickHouse exponentialMovingAverage (event-order smoothing; pandas
    // ewm(adjust=False)): sequential recurrence on the secondary-sort
    // mapPartitions rung — one shuffle, one EMA row per event. α = 0.5
    // keeps both recurrence multiplies exact; the add is the single
    // correctly-rounded op per row, so DuckDB's recursive-CTE stepping
    // reproduces identical bits
    "events_ema" -> ((s, d) =>
      Behavior.exponentialMovingAvg(t(s, d, "events"),
          "user_id", "event_id", "value", "ts", alpha = 0.5)
        .select(col("key").as("user_id"), col("id").as("event_id"),
          col("ema"))),
    // ClickHouse exponentialTimeDecayedAvg (1h half-life): decay
    // quantizes to whole half-lives so every 2^(−k) multiply is an exact
    // exponent shift — the float recurrence hash-matches cross-engine
    // (Behavior.timeDecayedAvg scaladoc)
    "events_ema_time" -> ((s, d) =>
      Behavior.timeDecayedAvg(t(s, d, "events"),
          "user_id", "event_id", "value", "ts",
          halfLifeMicros = 3600000000L)
        .select(col("key").as("user_id"), col("id").as("event_id"),
          col("ema_t"))),
    // ClickHouse intervalLengthSum: per-user union-of-spans active time —
    // each event covers [ts, ts + value·1s); overlaps merge via the
    // island sweep (one (key, start) shuffle, integer micros, exact)
    "events_interval_union" -> ((s, d) =>
      Behavior.intervalUnionLength(t(s, d, "events"), "user_id", "ts",
          floor(col("value") * lit(1000000.0)).cast("long"))
        .select(col("k").as("user_id"), col("covered_micros"),
          col("n_islands"))),
    // ClickHouse SAMPLE clause: deterministic consistent hash-sampling on
    // the key — the same ~10% of USERS (never a row-level coin flip) on
    // any engine, any partitioning, any run. Multiplicative integer hash
    // both engines evaluate exactly; the scan reads only the sampled
    // stripe before any aggregation (at scale: the predicate prunes at
    // the source, and a keyed layout prunes whole buckets)
    "events_sampled" -> ((s, d) =>
      t(s, d, "events")
        .where(pmod(col("user_id") * lit(1000003L) + lit(7L), lit(97L)) < 10)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("sampled_rows"),
          countDistinct(col("user_id")).as("sampled_users"))),
    // ClickHouse groupUniqArray: per-user sorted distinct event-type set,
    // emitted as a canonical CSV string (engine-portable array encoding) —
    // one grouped pass, map-side-combined set union
    "events_type_sets" -> ((s, d) =>
      t(s, d, "events").groupBy(col("user_id"))
        .agg(array_join(array_sort(collect_set(col("event_type"))), ",")
          .as("type_set"))),
    // ClickHouse studentTTest + welchTTest: did 'view' and 'click' value
    // distributions diverge, per hour-of-day? Six exact integer
    // cent-moments per bucket in one map-side-combined pass, then both t
    // statistics from the same fixed scalar tree (StatTests scaladoc)
    "events_ab_ttest" -> ((s, d) =>
      StatTests.abTTest(t(s, d, "events"),
        expr("(unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000) % 24"),
        col("event_type") === "view", col("event_type") === "click",
        floor(col("value") * 100 + 0.5))),
    // ClickHouse mannWhitneyUTest: the rank-based sibling — doubled
    // average ranks at the (bucket, distinct cents) grain keep the rank
    // sum, U, and the tie-correction term exact int64s. binScale = 4
    // exercises the cardinality valve END-TO-END against the unbinned
    // oracle (r17 verdict task 6): ×4 on integer cents is injective and
    // IEEE-exact (< 2^53), and rank statistics are invariant under
    // injective monotone maps — so binned ≡ exact is pinned by the same
    // hash-green row, with the valve's multiply+floor in the hot path
    "events_mann_whitney" -> ((s, d) =>
      StatTests.mannWhitneyU(t(s, d, "events"),
        expr("(unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000) % 24"),
        col("event_type") === "view", col("event_type") === "click",
        floor(col("value") * 100 + 0.5), binScale = 4.0)),
    // ClickHouse cramersV/theilsU groundwork: the χ² contingency
    // decomposition of event_type × hour-of-day at cell grain — every
    // value a fixed scalar over exact counts (V itself is pinned in
    // StatTestsSpec; a summed statistic would float-order-depend)
    "events_contingency" -> ((s, d) =>
      StatTests.contingencyChi2(t(s, d, "events"), col("event_type"),
        expr("(unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000) % 24"))),
    // ClickHouse theilsU: how much of the TYPE's entropy does knowing
    // the hour remove — the asymmetric association readout (r16)
    "events_theils_u" -> ((s, d) =>
      StatTests.theilsU(t(s, d, "events"), col("event_type"),
        expr("(unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000) % 24"))),
    // ClickHouse cramersV + cramersVBiasCorrected: the symmetric headline
    // scalar over the same contingency cells (r16)
    "events_cramers_v" -> ((s, d) =>
      StatTests.cramersV(t(s, d, "events"), col("event_type"),
        expr("(unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000) % 24"))),
    // G-test of independence over the same cells: the log-likelihood-ratio
    // twin of events_contingency's Pearson χ² (r16 s5)
    "events_gtest" -> ((s, d) =>
      StatTests.gTest(t(s, d, "events"), col("event_type"),
        expr("(unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000) % 24"))),
    // ClickHouse quantilesExactWeighted: exact weighted value quantiles
    // per event type, weights = a deterministic per-user importance
    // (user_id mod 7 + 1) — all-integer accumulate-until-threshold (r16 s5)
    "events_weighted_quantiles" -> ((s, d) =>
      StatTests.weightedQuantiles(t(s, d, "events"), col("event_type"),
        floor(col("value") * 100 + 0.5), pmod(col("user_id"), lit(7)) + 1,
        Seq(250, 500, 750, 900, 990))),
    // Ljung–Box white-noise portmanteau over the dense daily count series
    // — the "is any autocorrelation left" gate beside events_autocorr's
    // per-lag profile (r16 s5)
    "events_ljung_box" -> ((s, d) =>
      StatTests.ljungBoxDaily(t(s, d, "events"), "ts", 7)),
    // two-feature closed-form OLS (hour-of-day + epoch-day-mod-7 → value
    // cents) per event type — the deterministic cousin of ClickHouse
    // stochasticLinearRegression, Cramer's rule over ten exact moments
    // (r16 s5)
    "events_multi_linreg" -> ((s, d) =>
      StatTests.multiLinReg(t(s, d, "events"), col("event_type"),
        expr("(unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000) % 24"),
        expr("(unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000) % 7"),
        floor(col("value") * 100 + 0.5))),
    // DETERMINISTIC Poisson bootstrap (Chamandy 2012): 200 replicate
    // means per event type from engine-replayable Poisson(1) weights
    // (61-bit Mersenne-prime mix, exact decimal arithmetic) — a bootstrap
    // CI the DuckDB oracle hash-matches draw for draw (r16 s5)
    "events_bootstrap_ci" -> ((s, d) =>
      StatTests.poissonBootstrapCi(t(s, d, "events"), col("event_type"),
        col("user_id"), floor(col("value") * 100 + 0.5))),
    // ClickHouse kolmogorovSmirnovTest: CDF supremum between 'view' and
    // 'click' value distributions per day-of-month — the gap max runs over
    // exact integer cross-scaled counts at distinct-value grain, the
    // asymptotic p is a fixed 3-term Kolmogorov series (StatTests scaladoc)
    "events_ks_test" -> ((s, d) =>
      StatTests.ksTest(t(s, d, "events"),
        expr("(unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000) % 31"),
        col("event_type") === "view", col("event_type") === "click",
        floor(col("value") * 100 + 0.5), binScale = 4.0)),
    // ClickHouse rankCorr: Spearman ρ between value and event time per
    // event type — doubled average ranks at distinct-value grain keep all
    // five rank moments exact int64s. binScale = 4 (see
    // events_mann_whitney): injective + IEEE-exact on both integer inputs
    // (micros ×4 < 2^53), result invariant, valve exercised end-to-end
    "events_rank_corr" -> ((s, d) =>
      StatTests.spearmanCorr(t(s, d, "events"), col("event_type"),
        floor(col("value") * 100 + 0.5),
        expr("unix_micros(CAST(ts AS TIMESTAMP))"), binScale = 4.0)),
    // ClickHouse simpleLinearRegression + R²: value-cents on hour index
    // per event type from five exact int64 moments in one combinable pass
    "events_linreg" -> ((s, d) =>
      StatTests.linReg(t(s, d, "events"), col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000"),
        floor(col("value") * 100 + 0.5))),
    // ClickHouse quantileTiming: fixed-resolution latency quantiles on the
    // timing grid (exact <1024 ms, 16 ms buckets <30720, 512 ms above) —
    // the fixed-state sketch semantic, deterministic and exactly oracled
    // (Ranking.timingQuantiles scaladoc)
    // ClickHouse argMin/argMax: the value carried by each group's earliest
    // and latest event — deterministic under ts ties via the (ts,
    // event_id) composite order (event_id unique), one map-side-combined
    // min_by/max_by pass
    "events_arg_extremes" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tm"),
          col("event_id"), floor(col("value") * 100 + 0.5).as("cents"))
        .groupBy(col("event_type"))
        .agg(
          min_by(col("cents"), struct(col("tm"), col("event_id")))
            .as("first_cents"),
          max_by(col("cents"), struct(col("tm"), col("event_id")))
            .as("last_cents"),
          count(lit(1)).as("n"))),
    // ClickHouse windowFunnel 'strict_dedup': a repeat of an
    // already-matched condition interrupts the chain (one key shuffle +
    // O(1) automaton; Behavior.windowFunnelStrictDedup scaladoc)
    "events_funnel_dedup" -> ((s, d) =>
      Behavior.windowFunnelStrictDedup(t(s, d, "events"), "user_id",
        "event_type", "ts", Seq("signup", "click", "purchase"),
        24L * 3600000000L)),
    "events_quantile_timing" -> ((s, d) =>
      Ranking.timingQuantiles(t(s, d, "events"), "event_type",
        floor(col("value") * 1000), Seq(50, 90, 99))),
    // ClickHouse analysisOfVariance: one-way ANOVA F of value-cents across
    // event types per day bucket — exact int64 group moments; the one
    // cross-group float sum runs as a group-key-ordered running sum so the
    // additions sequence identically on any engine (StatTests scaladoc)
    "events_anova" -> ((s, d) =>
      StatTests.anovaF(t(s, d, "events"),
        expr("(unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000) % 7"),
        col("event_type"), floor(col("value") * 100 + 0.5))),
    // the F-test's precondition: are group variances even equal (r16)
    "events_bartlett" -> ((s, d) =>
      StatTests.bartlett(t(s, d, "events"),
        expr("(unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000) % 7"),
        col("event_type"), floor(col("value") * 100 + 0.5))),
    // ClickHouse maxIntersections(Position): peak concurrent open spans
    // per user ([ts, ts+value·1s) half-open) and the earliest sweep point
    // attaining it — one (key, point) shuffle, integer micros
    "events_max_concurrent" -> ((s, d) =>
      Behavior.maxIntersections(t(s, d, "events"), "user_id", "ts",
          floor(col("value") * lit(1000000.0)).cast("long"))
        .select(col("k").as("user_id"), col("max_concurrent"),
          col("peak_at_micros"))),
    // ClickHouse sumMap: per-user event_type → Σcents map, emitted as the
    // canonical sorted "type:cents" CSV (engine-portable map encoding) —
    // two map-side-combined grouped passes, integer cents exact
    "events_sum_map" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
        .groupBy(col("user_id"))
        .agg(array_join(sort_array(collect_list(
            concat_ws(":", col("event_type"), col("cents")))), ",")
          .as("value_map"))),
    // ClickHouse largestTriangleThreeBuckets(12): per-type series
    // downsampled to 12 visually-representative points (y in integer
    // cents so every bucket average and triangle area is
    // engine-deterministic) — sequential selection on the secondary-sort
    // rung, oracled by a DuckDB recursive CTE stepping the identical rule
    "events_lttb" -> ((s, d) =>
      Behavior.lttbDownsample(t(s, d, "events"), "event_type", "event_id",
          "ts", floor(col("value") * 100 + 0.5), 12)
        .select(col("key").as("event_type"), col("id").as("event_id"),
          col("x"), col("y"))),
    // ClickHouse histogram(10): adaptive equi-height bins beside the exact
    // fixed-width value_histogram twin — rows-only (bin placement is
    // merge-order-dependent; the spec pins mass/bounds contracts)
    "value_histogram_adaptive" -> ((s, d) => {
      val agg = udaf(new graft.expressions.AdaptiveHistogramAggregator(10),
        org.apache.spark.sql.Encoders.scalaDouble)
      t(s, d, "events").groupBy(col("event_type"))
        .agg(agg(col("value")).as("bins"))
        .select(col("event_type"), explode(col("bins")).as("b"))
        .select(col("event_type"), col("b._1").as("lower"),
          col("b._2").as("upper"), col("b._3").as("height"))
    }),
    "cohort_retention" -> ((s, d) =>
      Behavior.cohortRetention(t(s, d, "events"), "user_id", "ts")),
    // ClickHouse quantileExactWeighted: quantity-weighted unit-spend
    // percentiles — exact smallest-value-reaching-⌈p·W/100⌉, no global sort
    "price_weighted_percentiles" -> ((s, d) =>
      Ranking.weightedPercentiles(t(s, d, "lineitem"),
        "l_extendedprice", "l_quantity", Seq(50, 90, 99))),
    "customer_quartiles" -> ((s, d) => {
      val perCust = t(s, d, "orders").groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("revenue"))
      // exact ntile without a single-partition global window (Ranking.scala)
      Ranking.exactNtile(perCust, 4,
          Seq(col("revenue").desc, col("o_custkey")), "quartile")
        .select(col("o_custkey"), col("revenue").cast("double").as("revenue"),
          col("quartile"))
    }),
    "mirror_validation" -> ((s, d) => {
      val ev = t(s, d, "events")
      graft.sources.Mirror.validateCounts(ev,
        CdcOps.latestSnapshot(ev, Seq("user_id"), "event_id"), Seq("user_id"))
    }),
    "mirror_lag" -> ((s, d) => {
      // the monitor's per-table Lag row over a fully synced mirror of the
      // events log (synced_at derived from ts so the oracle can reproduce)
      val ev = t(s, d, "events")
      val mirror = CdcOps.latestSnapshot(
        CdcOps.withMirrorMeta(ev, Seq("user_id"), "event_id", isDelete,
          lit(0L), syncedAt = col("ts")),
        Seq("user_id"), "_peerdb_version")
      graft.sources.Incremental.lagReport(ev, mirror,
        graft.sources.TableConfig("events", Seq("user_id"), "event_id"))
    }),

    // ---- extended analytics ----------------------------------------------
    // runs through the custom planner path (AsOfJoinPlan → AsOfJoinExec);
    // the window formulation is its in-repo equivalence oracle (AsOfJoinSpec)
    "asof_purchase_click" -> ((s, d) =>
      AsOfJoin.backwardExec(
        t(s, d, "events").where(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"), col("value")),
        t(s, d, "events").where(col("event_type") === "click")
          .select(col("user_id"), col("event_id"), col("ts"), col("value")),
        Seq("user_id"), "ts", "ts")),
    // forward as-of with tolerance: click → NEXT purchase within 30 min
    // (conversion attribution); pandas merge_asof(direction='forward',
    // tolerance=30m) / QuestDB ASOF TOLERANCE semantics
    "asof_click_next_purchase" -> ((s, d) =>
      AsOfJoin.forward(
        t(s, d, "events").where(col("event_type") === "click")
          .select(col("user_id"), col("event_id"), col("ts"), col("value")),
        t(s, d, "events").where(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"), col("value")),
        Seq("user_id"), "ts", "ts", toleranceMicros = Some(1800L * 1000000))),
    "range_join_events" -> ((s, d) =>
      RangeJoin.byKeyAndTime(
        t(s, d, "events").where(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts")),
        t(s, d, "events").where(col("event_type") === "click")
          .select(col("user_id"), col("event_id"), col("ts")),
        Seq("user_id"), "ts", "ts", beforeSec = 1800L, afterSec = 0L)
        .select(col("user_id"), col("event_id"), col("r_event_id"))),
    "events_pivot" -> ((s, d) =>
      t(s, d, "events").groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1))).na.fill(0L)),
    "rollup_revenue" -> ((s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))),
    "value_percentiles" -> ((s, d) =>
      t(s, d, "events").groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.95)").as("p95"))),
    // z-score anomaly flags from the same DECIMAL-exact moment trick as
    // lineitem_corr: per-type mean/std derive from exact sums, the 3σ cut
    // compares identical doubles on both engines. The moment table is
    // type-cardinality-sized and broadcast back into the row-level filter
    "events_value_outliers" -> ((s, d) => {
      val dv = col("value").cast("decimal(18,2)")
      val m = t(s, d, "events").groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(dv).as("sv"), sum(dv * dv).as("svv"))
        .select(col("event_type"),
          (col("sv").cast("double") / col("n").cast("double")).as("mean"),
          sqrt(col("svv").cast("double") / col("n").cast("double")
            - (col("sv").cast("double") / col("n").cast("double"))
            * (col("sv").cast("double") / col("n").cast("double"))).as("std"))
      t(s, d, "events").join(broadcast(m), "event_type")
        .where(abs(col("value") - col("mean")) > lit(3.0) * col("std"))
        .select(col("event_id"), col("event_type"), col("value"),
          round((col("value") - col("mean")) / col("std"), 4).as("z"))
    }),
    // Pareto 80/20: suppliers ranked by DECIMAL-exact gross revenue with
    // the cumulative share (window cumsum stays DECIMAL; only the final
    // share division is double), cut at 80%. The window is over the
    // supplier DIM (already aggregated), never the fact table
    "supplier_pareto" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val rev = t(s, d, "lineitem").groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("revenue"))
      val w = W.orderBy(col("revenue").desc, col("l_suppkey"))
      val total = rev.agg(sum(col("revenue")).as("total"))
      val share = round(sum(col("revenue"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double") / col("total").cast("double"), 6)
      rev.crossJoin(broadcast(total))
        .select(col("l_suppkey"), col("revenue").cast("double").as("revenue"),
          share.as("cum_share"),
          row_number().over(w).cast("bigint").as("rk"))
        .where(col("cum_share") <= 0.8)
    }),
    // Pearson correlation from DECIMAL-exact moments: the five sums are
    // exact under any aggregation order, both engines round the identical
    // decimals to the identical doubles, and the closed-form combination
    // is the same double expression — so a float statistic hash-matches
    // cross-engine (native corr() would not: its running-update order
    // varies). One corpus pass, map-side combinable
    // the matrix form beside the single-pair twin: 6 pairs from ONE scan
    "lineitem_corr_matrix" -> ((s, d) =>
      Profiler.corrMatrix(t(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),
    "lineitem_corr" -> ((s, d) => {
      val dx = col("l_quantity").cast("decimal(18,2)")
      val dy = col("l_extendedprice").cast("decimal(18,2)")
      val m = t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(dx).as("sx"), sum(dy).as("sy"),
          sum(dx * dy).as("sxy"), sum(dx * dx).as("sxx"), sum(dy * dy).as("syy"))
      val (n, sx, sy, sxy, sxx, syy) = (col("n").cast("double"),
        col("sx").cast("double"), col("sy").cast("double"),
        col("sxy").cast("double"), col("sxx").cast("double"),
        col("syy").cast("double"))
      m.select(col("l_returnflag"), col("n"),
        round((n * sxy - sx * sy) /
          sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
          .as("corr_qty_price"))
    }),
    // the maintained-sketch path beside the exact twin above: three sync
    // generations of KLL sketches, read = fold + quantile. rows-only
    // (randomized KLL compaction); QuantileAggSpec pins the rank contract
    "value_quantiles_maintained" -> ((s, d) => {
      val ev = t(s, d, "events")
      def part(i: Int) = ev.where(pmod(col("event_id"), lit(3)) === i)
        .select(col("event_type"), col("value"))
      val agg = QuantileAgg.create(s, part(0), Seq("event_type"),
        Seq("value"), indexScratch)
      agg.refresh(part(1))
      agg.refresh(part(2))
      agg.read(Seq(0.5, 0.95))
    }),
    "events_json_extract" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))),
    "set_ops_users" -> ((s, d) => {
      // day-scoped so the difference is non-trivial on the dense test data
      val day = t(s, d, "events").where(to_date(col("ts")) === lit("2024-01-05").cast("date"))
      day.where(col("event_type") === "click").select(col("user_id"))
        .except(day.where(col("event_type") === "purchase").select(col("user_id")))
    }),
    "uniq_users_hll" -> ((s, d) =>
      t(s, d, "events").groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))),
    // audience overlap: |users(a) ∩ users(b)| for every unordered pair of
    // event types — the exact twin anchoring the theta-sketch variant
    "users_overlap_exact" -> ((s, d) => {
      val u = t(s, d, "events")
        .select(col("event_type"), col("user_id")).distinct()
      u.as("a").join(u.as("b"), Seq("user_id"))
        .where(col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_users"))
    }),
    // the same table WITHOUT the user-level join: one theta sketch per
    // type (KB-scale), pairs intersected sketch-against-sketch — at 100 TB
    // the exact form joins the distinct-user relation against itself,
    // this one broadcasts 5 sketches. rows-only (approximate by design);
    // SetSketchSpec pins equality with the exact twin while the sketches
    // are below their nominal-entries exact mode
    "users_overlap_theta" -> ((s, d) => {
      val sk = t(s, d, "events").groupBy(col("event_type"))
        .agg(theta_sketch_agg(col("user_id")).as("sk"))
      sk.as("a").join(sk.as("b"),
          col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"),
          theta_sketch_estimate(
            theta_intersection(col("a.sk"), col("b.sk"))).as("n_users"))
    }),

    // ---- text analysis ----------------------------------------------------
    "text_repetition" -> ((s, d) =>
      TextFunctions.repetitionSignals(t(s, d, "documents"), "doc_id", "text")),
    "docs_quality_filter" -> ((s, d) =>
      t(s, d, "documents")
        .where(TextFunctions.qualityScore(col("text")) >= 0.5
          && TextFunctions.tokenCount(col("text")) >= 20)
        .select(col("doc_id"), col("lang"), col("n_chars"))),
    // the published Gopher rule set (integer-exact verdicts per rule)
    "docs_gopher_rules" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TextFunctions.gopherSignals(col("text")).as("g"))
        .select(col("doc_id"), col("g.n_words"), col("g.ok_word_count"),
          col("g.ok_mean_word_len"), col("g.ok_symbol_ratio"),
          col("g.ok_alpha_words"), col("g.ok_stopwords"), col("g.keep"))),
    "docs_oov_rate" -> ((s, d) =>
      Vocabulary.oovStats(t(s, d, "documents"), "doc_id", "text", 1000)),
    "docs_tfidf_top_terms" -> ((s, d) =>
      Vocabulary.tfidfTopTerms(t(s, d, "documents"), "doc_id", "text", 3)),
    "docs_unigram_logprob" -> ((s, d) =>
      Vocabulary.unigramLogprob(t(s, d, "documents"), "doc_id", "text")),
    // the order-sensitive sibling: add-one bigram LM over the corpus' own
    // bigrams — scrambled/templated text scores low even with a normal
    // unigram mix (Vocabulary.bigramLogprob scaladoc)
    "docs_bigram_logprob" -> ((s, d) =>
      Vocabulary.bigramLogprob(t(s, d, "documents"), "doc_id", "text")),
    // corpus health profile: vocabulary size, hapax fraction, fitted Zipf
    // slope over the top-1000 ranks (Vocabulary.zipfStats scaladoc)
    "docs_zipf_hapax" -> ((s, d) =>
      Vocabulary.zipfStats(t(s, d, "documents"), "text", 1000)),
    // BPE tokenizer training (Sennrich 2016): the corpus' top-24 merges in
    // learned priority order — each iteration is a narrow map + one
    // combinable pair aggregation over the WORD-FREQUENCY table (never the
    // corpus), only the argmax pair reaching the driver. Hash-green as of
    // r18: the oracle unrolls all 24 steps in DuckDB with a list_reduce
    // leftmost-scan fold (bpeOracleCtes); BpeSpec's textbook fixture and
    // partitioning-invariance check still pin the engine side.
    "docs_bpe_merges" -> ((s, d) =>
      Bpe.mergeTable(s, t(s, d, "documents"), "text", 24)),
    // the apply half: greedy priority-order inference with the corpus' own
    // learned merges — per-doc subword counts (the REAL tokens-per-doc
    // signal the ~4-chars heuristic approximates). Hash-green as of r18
    // (same unrolled replay, applied per word + per-doc sums); inference
    // exactness is also pinned by BpeSpec's composed-unit encoding test.
    "docs_bpe_token_stats" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Bpe.encodeStats(docs, "doc_id", "text",
        Bpe.learnMerges(docs, "text", 24))
    }),
    // domain-shift signal: Jensen-Shannon divergence of each language
    // slice's unigram distribution from the whole corpus blend
    // (Vocabulary.jsDivergence scaladoc)
    "docs_js_divergence" -> ((s, d) =>
      Vocabulary.jsDivergence(t(s, d, "documents"), "lang", "text")),
    // CCNet perplexity bucketing (Wenzek et al. 2020): head/middle/tail
    // corpus tertiles by unigram-LM average log-prob — the standard
    // quality stratification before sampling. Exact ntile WITHOUT a
    // single-partition global window (Ranking.exactNtile's two-pass
    // shared-shuffle rank); 4dp-rounded scores + doc_id tiebreak make the
    // order engine-total
    "docs_ppl_buckets" -> ((s, d) => {
      val scored = Vocabulary.unigramLogprob(t(s, d, "documents"),
        "doc_id", "text")
      Ranking.exactNtile(scored, 3,
          Seq(col("avg_logprob").desc, col("doc_id")), "tertile")
        .select(col("doc_id"), col("avg_logprob"),
          when(col("tertile") === 1, "head")
            .when(col("tertile") === 2, "middle")
            .otherwise("tail").as("ppl_bucket"))
    }),
    // DSIR importance weights (Xie et al. 2023): hashed char-bigram LLR
    // against the English-docs target distribution, frozen to integer
    // micro-nats so per-doc totals are exact int64 sums (Importance
    // scaladoc) — the resampling score a domain-targeted pretraining mix
    // ranks by
    "docs_dsir_weights" -> ((s, d) =>
      Importance.dsirWeights(t(s, d, "documents"), "doc_id", "text",
        col("lang") === "en")),
    // ---- full-text search --------------------------------------------------
    "docs_bm25_topk" -> ((s, d) =>
      TextSearch.bm25TopK(t(s, d, "documents"), "doc_id", "text",
        "spark window dup", 10)),
    // the same search served by the PERSISTED inverted index (TextIndex):
    // nine tenths → create, the "freshly landed" tenth → add, then probe —
    // must equal the one-shot oracle over the whole corpus exactly
    "docs_bm25_indexed" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val idx = TextIndex.create(
        docs.where(pmod(col("doc_id"), lit(10)) =!= 0), "doc_id", "text",
        indexScratch, parts = 16)
      idx.add(docs.where(pmod(col("doc_id"), lit(10)) === 0), "doc_id", "text")
      idx.searchTopK("spark window dup", 10)
    }),
    "docs_boolean_search" -> ((s, d) =>
      TextSearch.booleanSearch(t(s, d, "documents"), "doc_id", "text",
        Seq("spark", "window"), Seq("slow"))),
    "docs_phrase_search" -> ((s, d) =>
      TextSearch.phraseSearch(t(s, d, "documents"), "doc_id", "text",
        "spark window")),
    "orders_profile" -> ((s, d) =>
      Profiler.profile(t(s, d, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))),
    "text_regex_tokens" -> ((s, d) =>
      t(s, d, "documents").groupBy(col("lang"))
        .agg(sum(TextFunctions.bpeRegexTokens(col("text"))).as("total_pieces"))),
    "docs_train_test_split" -> ((s, d) =>
      Sampling.splitByKey(t(s, d, "documents"), col("doc_id"), 0.1)
        .groupBy(col("lang"), col("is_test")).agg(count(lit(1)).as("n_docs"))),
    "docs_stratified_sample" -> ((s, d) =>
      Sampling.stratifiedSample(t(s, d, "documents"), Seq("lang"), col("doc_id"), 0.2)
        .select(col("lang"), col("doc_id"))),
    // mixture curation: 2000 whitespace-tokens per language, hash-ordered
    "docs_token_budget_mix" -> ((s, d) =>
      Sampling.tokenBudgetMix(t(s, d, "documents"), Seq("lang"), col("doc_id"),
          TextFunctions.tokenCount(col("text")), budget = 2000L)
        .select(col("lang"), col("doc_id"), col("n_tokens"), col("cum_tokens"))),
    // epoch-deterministic corpus shuffle: dense position + round-robin shard
    "docs_global_shuffle" -> ((s, d) =>
      Sampling.globalShuffle(t(s, d, "documents"), col("doc_id"), seed = 7L,
          numShards = 8)
        .select(col("doc_id"), col("pos"), col("shard"))),
    // quality-weighted sampling: keep probability = quality score, key-stable
    "docs_quality_sample" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("q_score", TextFunctions.qualityScore(col("text")))
        .where(Sampling.keyBucket(col("doc_id")) < col("q_score") * 10000)
        .select(col("doc_id"), col("lang"), col("q_score"))),
    // corpus profile: token-length histogram in width-10 integer bins
    "docs_length_histogram" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("nt", TextFunctions.tokenCount(col("text")).cast("long"))
        .groupBy((col("nt") - col("nt") % 10).as("bin_lo"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("total_tokens"))),
    // training-reader manifest: per-shard doc/token totals + position range
    "docs_shard_stats" -> ((s, d) =>
      Sampling.globalShuffle(t(s, d, "documents"), col("doc_id"), seed = 7L,
          numShards = 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("long")).as("total_tokens"),
          min(col("pos")).as("first_pos"), max(col("pos")).as("last_pos"))),
    "docs_contamination" -> ((s, d) => {
      val tagged = Sampling.splitByKey(t(s, d, "documents"), col("doc_id"), 0.1)
      Contamination.report(
        tagged.where(!col("is_test")), tagged.where(col("is_test")),
        "doc_id", "text")
    }),
    // the 100 TB shape of the same check: a broadcast Bloom filter over the
    // eval side's shingles cuts train shingles at the scan — EXACT result
    // (no false negatives; the equi-join drops fp riders), same oracle
    "docs_contamination_bloom" -> ((s, d) => {
      val tagged = Sampling.splitByKey(t(s, d, "documents"), col("doc_id"), 0.1)
      Contamination.reportBloom(
        tagged.where(!col("is_test")), tagged.where(col("is_test")),
        "doc_id", "text")
    }),
    "text_token_stats" -> ((s, d) =>
      t(s, d, "documents").groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("long")).as("total_tokens"),
          sum(TextFunctions.bpeTokenEstimate(col("text"))).as("total_bpe_est"))),
    "text_quality" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextFunctions.punctCount(col("text")).cast("long").as("n_punct"),
        TextFunctions.stopwordCount(col("text")).cast("long").as("n_stop"),
        TextFunctions.qualityScore(col("text")).as("q_score"))),
    "text_lang_id" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("lang"), TextFunctions.langId(col("text")).as("predicted"))
        .groupBy(col("lang"), col("predicted")).agg(count(lit(1)).as("n_docs"))),
    "text_fingerprint" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"))),
    "text_winnow_fp" -> ((s, d) =>
      Dedup.winnowPairs(t(s, d, "documents"), "doc_id", "text")),
    "top_words_exact" -> ((s, d) => {
      val words = t(s, d, "documents")
        .select(explode(split(lower(col("text")), " ")).as("word"))
      val total = words.agg(count(lit(1)).as("total"))
      words.groupBy(col("word")).agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(total))
        .where(col("n") * 50 > col("total")) // > 2% of all tokens
        .select(col("word"), col("n"))
    }),
    // ClickHouse topKWeighted(20)(user, cents): heaviest spenders by
    // TOTAL WEIGHT under bounded state — shuffle carries ≤20 counters per
    // partition whatever the log size; the exact twin for the contract is
    // a plain grouped sum (rows-only; the spec pins the W/(k+1) bound)
    "top_spenders_sketch" -> ((s, d) => {
      val agg = udaf(new graft.expressions.WeightedFrequentItemsAggregator(20),
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.scalaLong))
      t(s, d, "events")
        .select(col("user_id").cast("string").as("u"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .agg(agg(col("u"), col("cents")).as("top"))
        .select(explode(col("top")).as("e"))
        .select(col("e._1").as("user_id"), col("e._2").as("approx_cents"))
    }),
    "top_words_sketch" -> ((s, d) => {
      // Misra-Gries bounded-state heavy hitters (ClickHouse topK) — rows-only
      val agg = udaf(new graft.expressions.FrequentItemsAggregator(20),
        org.apache.spark.sql.Encoders.STRING)
      t(s, d, "documents")
        .select(explode(split(lower(col("text")), " ")).as("word"))
        .agg(agg(col("word")).as("top"))
        .select(explode(col("top")).as("e"))
        .select(col("e._1").as("word"), col("e._2").as("approx_n"))
    }),
    // the MAINTAINED sketch path beside the one-shot twin above: three sync
    // generations of Misra-Gries states per source, read = fold + rank.
    // rows-only (counter values are merge-order artifacts); TopKAggSpec
    // pins the heavy-hitter survival + count-band contract
    "top_words_maintained" -> ((s, d) => {
      val words = t(s, d, "documents")
        .select(col("doc_id"),
          explode(split(lower(col("text")), " ")).as("word"))
      def part(i: Int) = words.where(pmod(col("doc_id"), lit(3)) === i)
        .withColumn("grp", lit("all")).select(col("grp"), col("word"))
      val agg = operators.TopKAgg.create(s, part(0), Seq("grp"), "word", 20,
        indexScratch)
      agg.refresh(part(1))
      agg.refresh(part(2))
      agg.read(10).select(col("item").as("word"), col("est_count"), col("rank"))
    }),

    // context-length-bounded training chunks: 64-word windows, 16 overlap
    "docs_chunks" -> ((s, d) =>
      Chunking.wordChunks(t(s, d, "documents"), "doc_id", "text", 64, 16)),
    // chunks packed into 256-word training sequences across 8 shards
    "docs_packed" -> ((s, d) =>
      Chunking.packChunks(
        Chunking.wordChunks(t(s, d, "documents"), "doc_id", "text", 64, 16),
        "doc_id", "chunk_idx", "n_words", budget = 256, shards = 8)),

    // ---- dedup ------------------------------------------------------------
    "dedup_exact" -> ((s, d) => Dedup.exact(t(s, d, "documents"), "doc_id", "text")),
    // exact-substring dedup signal: per-doc fraction of 8-token spans that
    // recur anywhere in the corpus
    "docs_dup_ngram_spans" -> ((s, d) =>
      Dedup.duplicatedSpanStats(t(s, d, "documents"), "doc_id", "text")),
    // fastText/CCNet-style learned quality filter: hashed bag-of-words
    // logistic regression trained in-query on a weak label (is-English —
    // the learnable stand-in for CCNet's wiki-vs-crawl signal), then one
    // stateless scoring pass. Training is iters x one treeAggregate of
    // the dense gradient — corpus never collected (QualityModel scaladoc)
    "docs_quality_model" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val labeled = docs.withColumn("y", (col("lang") === "en").cast("int"))
      val model = QualityModel.train(labeled, "text", "y",
        dim = 1 << 15, iters = 8)
      QualityModel.score(docs, "doc_id", "text", model)
        .select(col("doc_id"), round(col("quality_prob"), 4).as("quality_prob"))
    }),
    // the REMOVAL transform over the same signal (Lee et al. 2022): first
    // occurrence survives corpus-wide, later ones excised, fragments
    // re-joined — the cleaned text itself is the oracle check
    "docs_drop_dup_spans" -> ((s, d) =>
      Dedup.dropDupSpans(t(s, d, "documents"), "doc_id", "text")),
    // subset duplicates: directed full-containment pairs (every distinct
    // token of a occurs in the same-lang doc b) — the signal Jaccard
    // misses for short-inside-long duplication
    "dedup_containment" -> ((s, d) =>
      Dedup.containmentPairs(t(s, d, "documents"), "doc_id", "text", "lang")),
    // prefix-filtered (guaranteed recall, vocabulary-sized block space):
    // the oracle-verified scalable path; the lang-blocked variant remains
    // available as Dedup.ngramJaccardPairs for caller-chosen blocking
    "dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.jaccardPairsPrefix(t(s, d, "documents"), "doc_id", "text", 0.8)),
    // per-source survivorship governance report: exact + near stages,
    // keep rates that set downstream mix weights (r16)
    "dedup_loss_report" -> ((s, d) =>
      Dedup.lossReport(t(s, d, "documents"), "doc_id", "text", "source")),
    // continuous-pipeline dedup: a "freshly landed" tenth of the corpus is
    // checked against the rest, probe-only (no corpus self-join)
    "dedup_incremental" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.jaccardPairsIncremental(
        docs.where(pmod(col("doc_id"), lit(10)) === 0),
        docs.where(pmod(col("doc_id"), lit(10)) =!= 0),
        "doc_id", "text", 0.8)
    }),
    // the same split served by the PERSISTED index lifecycle (JaccardIndex):
    // corpus → create, landed batch → probeAndAdd — the shape a continuous
    // pipeline runs per sync, O(batch) compute + partition-pruned index scans
    "dedup_incremental_indexed" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // parts=8 for the bench slice: the in-query lifecycle writes all
      // three relations, and file count scales with the partition grain —
      // 8 keeps the same pruning semantics at an eighth of the
      // small-file overhead (production sizing stays the caller's; the
      // r16 probe now overlaps the commit wave, so the write lanes' file
      // overhead is the remaining floor)
      JaccardIndex.createWithFirstSync(
        docs.where(pmod(col("doc_id"), lit(10)) =!= 0),
        docs.where(pmod(col("doc_id"), lit(10)) === 0),
        "doc_id", "text", 0.8, indexScratch, parts = 8)._2
    }),
    // probabilistic screen over the same measure (rows-only; its recall
    // relative to the exact prefix path is spec-pinned in DedupSpec)
    "dedup_jaccard_banded" -> ((s, d) =>
      Dedup.jaccardPairsBanded(t(s, d, "documents"), "doc_id", "text", 0.8)),
    "dedup_minhash_lsh" -> ((s, d) =>
      Dedup.minhashLsh(t(s, d, "documents"), "doc_id", "text")),
    "dedup_simhash" -> ((s, d) => Dedup.simhash(t(s, d, "documents"), "doc_id", "text")),
    // corpus-scale simhash pairing: MinHash band pre-block composed with the
    // pigeonhole hamming screen (rows-only; recall + candidate-cut pinned in
    // DedupSpec)
    "dedup_simhash_blocked" -> ((s, d) =>
      Dedup.simhashPairsBlocked(t(s, d, "documents"), "doc_id", "text")),
    // low threshold (the test embeddings are near-orthogonal) ⇒ shallow
    // bands, many of them: recall ≈ 0.97 at cos 0.2 (spec-pinned vs brute
    // force); near-dup thresholds use the deeper defaults instead.
    // Hash-green as of r18: the full murmur-hyperplane + banded-candidate
    // + CosineSim pipeline replays in DuckDB bit-for-bit, raw doubles
    // included (every float op is order-pinned IEEE)
    "dedup_embedding" -> ((s, d) =>
      Dedup.embeddingPairs(t(s, d, "embeddings"), "vec_id", "embedding", 0.2,
        bitsPerBand = 4, bands = 32)),
    // SemDeDup: cluster-then-exact-compare semantic dedup; same 0.2 cut as
    // dedup_embedding so the two scale paths anchor each other.
    // Hash-green as of r18: the fixed-point k-means makes training an
    // engine-reproducible pure function, and the oracle replays the whole
    // loop (xxhash64 init, 3 Lloyd steps, cosine argmax assignment)
    "dedup_semantic" -> ((s, d) =>
      Dedup.semanticPairs(t(s, d, "embeddings"), "vec_id", "embedding", 0.2,
        k = 8, iters = 3)),
    // distributed spherical k-means fit surfaced as a query: cluster sizes
    // + centroid summary. Hash-green as of r19: the r18 fixed-point Lloyd
    // made training an engine-reproducible pure function — the oracle
    // replays the loop (shared with dedup_semantic) and reads out the
    // final codebook's norms + member counts
    "emb_kmeans" -> ((s, d) =>
      Similarity.kmeansFit(t(s, d, "embeddings"), "vec_id", "embedding",
          k = 8, iters = 3)
        .select(col("centroid_id"), col("n_members"),
          round(VectorFunctions.l2Norm(col("centroid")), 4).as("centroid_norm"))),
    "dedup_clusters" -> ((s, d) => {
      // realistic pipeline order: sparse LSH candidates → clusters → keep-best
      val docs = t(s, d, "documents")
      Dedup.keepCanonical(docs,
        Dedup.minhashLsh(docs, "doc_id", "text"),
        "doc_id", TextFunctions.qualityScore(col("text")))
    }),

    // ---- similarity search ------------------------------------------------
    // exact top-8 covariance eigenpairs of the embedding corpus — the
    // whitening/decorrelation stage ahead of cosine dedup; one treeAggregate
    // scatter pass + driver Jacobi (rows-only: float accumulation is
    // merge-order dependent; SimilaritySpec pins recovery/orthonormality)
    "emb_pca" -> ((s, d) =>
      Similarity.pcaTopK(t(s, d, "embeddings"), "embedding", 8)
        .select(col("component"), round(col("eigenvalue"), 4).as("eigenvalue"),
          round(col("explained_var"), 4).as("explained_var"))),
    "knn_brute_force" -> ((s, d) => {
      val embs = t(s, d, "embeddings")
      Similarity.bruteForceTopK(embs, embs.where(col("vec_id") < 10), "vec_id", "embedding", 5)
    }),
    // hash-green as of r18: the oracle re-derives the murmur hyperplanes,
    // the bucket join, the CosineSim IEEE fold, and the TopK total order
    "ann_lsh" -> ((s, d) => {
      val embs = t(s, d, "embeddings")
      Similarity.lshTopK(embs, embs.where(col("vec_id") < 10), "vec_id", "embedding", 5)
    }),
    // the PERSISTED lifecycle of the LSH search (LshIndex): fixed-seed
    // signatures give exactly the one-shot lshTopK's candidate sets
    // (equality spec-pinned on the float store); the default int8-packed
    // postings cut probe IO 4x, and probes read only the queries' th=J
    // bucket partitions. Hash-green as of r18: the oracle replays the
    // PackInt8 quantization + Int8CosineSim fold bit-for-bit
    "ann_lsh_indexed" -> ((s, d) => {
      val embs = t(s, d, "embeddings")
      LshIndex.create(embs, "vec_id", "embedding", indexScratch)
        .probe(embs.where(col("vec_id") < 10), "vec_id", "embedding", 5)
    }),
    // hash-green as of r18: xxhash64 centroid pick + NearestCentroids
    // kernel + CosineSim fold, all re-derived in the DuckDB oracle
    "ann_ivf" -> ((s, d) => {
      val embs = t(s, d, "embeddings")
      Similarity.ivfTopK(embs, embs.where(col("vec_id") < 10), "vec_id", "embedding", 5)
    }),
    // the PERSISTED IVFADC lifecycle: IVF prunes the probed lists, ADC
    // scores m-byte PQ codes off the frozen sub-codebooks — 8 bytes per
    // posting (32x vs float), probe IO independent of corpus size.
    // Hash-green as of r19 at pqRotate=false (classic residual IVFADC,
    // Jégou §IV-A): coarse refine + residual sub-k-means + PqEncode +
    // PqResidualCosineSim are all ordered folds the oracle replays; the
    // OPQ-rotated lifecycle ships as ann_pq_indexed_opq below
    "ann_pq_indexed" -> ((s, d) => {
      val embs = t(s, d, "embeddings")
      val idx = IvfIndex.create(embs, "vec_id", "embedding", indexScratch,
        numCentroids = 32, kmeansIters = 2, pqM = 8, pqRotate = false)
      idx.probe(embs.where(col("vec_id") < 10), "vec_id", "embedding", 5,
        nProbe = 8)
    }),
    // the same persisted IVFADC with the fmt-6 default OPQ-lite rotation
    // (codes quantize the ROTATED residual; probes rotate once) —
    // rows-only: the rotation is a Jacobi eigensolve (see ann_pq_opq);
    // rotated-recall >= unrotated + reload bit-equality spec-pinned
    "ann_pq_indexed_opq" -> ((s, d) => {
      val embs = t(s, d, "embeddings")
      val idx = IvfIndex.create(embs, "vec_id", "embedding", indexScratch,
        numCentroids = 32, kmeansIters = 2, pqM = 8)
      idx.probe(embs.where(col("vec_id") < 10), "vec_id", "embedding", 5,
        nProbe = 8)
    }),
    // product quantization (Jégou PQ/ADC): corpus compressed to m=8 bytes
    // per 64-dim vector (32x vs float), candidates scored via per-query
    // lookup tables — m adds per candidate, never a dim-length dot; the
    // only shuffle is the nq·k rank merge. Hash-green as of r19 (plain
    // unrotated PQ — every float op is an ordered fold the oracle
    // replays: sub-k-means training, encode, LUT build, ADC score);
    // the OPQ-rotated variant ships as ann_pq_opq below
    "ann_pq" -> ((s, d) => {
      val embs = t(s, d, "embeddings")
      Similarity.pqTopK(embs, embs.where(col("vec_id") < 10), "vec_id",
        "embedding", 5, rotate = false)
    }),
    // the OPQ-lite variant (Ge CVPR 2013 reduced to its PCA special case):
    // the training sample's principal axes interleaved across subspaces
    // before the split — same ADC kernels on rotated inputs (rows-only:
    // the rotation is a driver-side Jacobi eigensolve, not an ordered
    // fold; rotated-recall >= unrotated-recall is spec-pinned)
    "ann_pq_opq" -> ((s, d) => {
      val embs = t(s, d, "embeddings")
      Similarity.pqTopK(embs, embs.where(col("vec_id") < 10), "vec_id",
        "embedding", 5)
    }),
    // the PERSISTED lifecycle of the same search (IvfIndex): create freezes
    // a k-means-refined codebook (recall >= the sampled pick, spec-pinned)
    // + int8-packed per-centroid assignment lists once; probe reads only
    // the probed c=J partitions — a standing corpus queried for weeks never
    // re-assigns per call. Hash-green as of r19: the refinement Lloyd runs
    // driver-sequentially over the hash-ordered sample, so the oracle
    // replays it with ORDER-PINNED float folds (create → refine → int8
    // pack → probe, end to end)
    "ann_ivf_indexed" -> ((s, d) => {
      val embs = t(s, d, "embeddings")
      IvfIndex.create(embs, "vec_id", "embedding", indexScratch)
        .probe(embs.where(col("vec_id") < 10), "vec_id", "embedding", 5)
    }),

    // ---- multimodal -------------------------------------------------------
    "mm_meta_stats" -> ((s, d) => Multimodal.mediaTypeStats(t(s, d, "documents"), "doc_id", "text")),
    "mm_frame_sample" -> ((s, d) =>
      Multimodal.frameSampleStub(
          Multimodal.withMediaColumns(t(s, d, "documents"), "doc_id", "text"),
          "doc_id", frameBytes = 64, stride = 4)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(octet_length(col("frame")).cast("long")).as("sampled_bytes"))),
    // real WAV headers synthesized from doc_id, probed by the REAL RIFF
    // parser, aggregated per stream shape — the oracle re-derives every
    // field from doc_id arithmetic, so a parser offset bug hash-mismatches
    "mm_audio_probe" -> ((s, d) =>
      Multimodal.probeHeaders(
          Multimodal.withAudioPayloads(t(s, d, "documents"), "doc_id"))
        .toDF()
        .groupBy(col("channels").cast("long").as("channels"),
          col("sampleRateHz").cast("long").as("sample_rate_hz"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("durationMs")).as("sum_duration_ms"),
          max(col("format")).as("format"))),
    // real STREAMINFO bit-field decode: 20-bit rate / 3-bit channels /
    // 36-bit sample count unpacked from the FLAC container bytes
    "mm_flac_probe" -> ((s, d) =>
      Multimodal.probeHeaders(
          Multimodal.withFlacPayloads(t(s, d, "documents"), "doc_id"))
        .toDF()
        .groupBy(col("channels").cast("long").as("channels"),
          col("sampleRateHz").cast("long").as("sample_rate_hz"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("durationMs")).as("sum_duration_ms"),
          max(col("format")).as("format"))),
    // MP3 frame walk: ID3v2 skip + complete-frame count from real
    // header arithmetic; oracle re-derives every field from doc_id (r16)
    "mm_mp3_probe" -> ((s, d) =>
      Multimodal.probeHeaders(
          Multimodal.withMp3Payloads(t(s, d, "documents"), "doc_id"))
        .toDF()
        .groupBy(col("channels").cast("long").as("channels"),
          col("sampleRateHz").cast("long").as("sample_rate_hz"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("durationMs")).as("sum_duration_ms"),
          max(col("format")).as("format"))),
    // TIFF IFD walk: both byte orders, SHORT and LONG dimension entries,
    // tag-skipping across the 4-entry IFD; oracle re-derives dimensions
    // from doc_id (r16 s5)
    "mm_tiff_probe" -> ((s, d) =>
      Multimodal.probeHeaders(
          Multimodal.withTiffPayloads(t(s, d, "documents"), "doc_id"))
        .toDF()
        .groupBy(col("width").cast("long").as("width"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("height").cast("long")).as("sum_height"),
          max(col("format")).as("format"))),
    // REAL payload decode: 16-bit PCM samples read back out of each WAV's
    // data chunk (MediaHeader.wavPcmStats) — peak / clip-count / RMS per
    // item. The samples are id-derived, so the oracle regenerates the
    // exact stream with range() and integer arithmetic: a sample-layout
    // or sign-extension bug hash-mismatches immediately
    "mm_audio_stats" -> ((s, d) =>
      Multimodal.audioStats(
          Multimodal.withPcmAudioPayloads(t(s, d, "documents"), "doc_id"))
        .toDF()
        .select(col("doc_id"), col("n_samples"), col("peak"), col("n_clipped"),
          round(sqrt(col("sum_squares").cast("double") / col("n_samples")), 4)
            .as("rms"))),
    // REAL G.711 telephony decode: µ-law (even ids) and A-law (odd ids)
    // WAVs expand through the CCITT reference formulas — pure integer bit
    // math, so the oracle regenerates both the code stream AND the
    // expansion arithmetically; an expansion or sign bug hash-mismatches
    "mm_audio_g711" -> ((s, d) =>
      Multimodal.audioStats(
          Multimodal.withG711Payloads(t(s, d, "documents"), "doc_id"))
        .toDF()),
    // REAL pixel decode: 24-bit BMP pixel arrays read back out of each
    // payload (MediaHeader.bmpPixelStats — BGR order, padded stride,
    // bottom-up AND top-down layouts) into exact channel sums + the peak
    // BT.601 integer luminance. Pixels are id-derived, so the oracle
    // regenerates every channel with range() arithmetic: a stride,
    // channel-order, or row-order bug hash-mismatches immediately
    "mm_image_stats" -> ((s, d) =>
      Multimodal.imageStats(
          Multimodal.withBmpPayloads(t(s, d, "documents"), "doc_id"))
        .toDF()),
    // REAL compressed-image decode: synthesize PNGs through the full
    // pipeline (per-row filters cycling all five types, deflate,
    // alternating RGBA) and decode them back — inflate + Paeth-family
    // filter reconstruction + BT.601 luma. Pixels are id-derived, so the
    // oracle regenerates every channel arithmetically: a filter
    // reconstruction, inflate, or alpha-handling bug hash-mismatches
    "mm_png_stats" -> ((s, d) =>
      Multimodal.pngStats(
          Multimodal.withPngPayloads(t(s, d, "documents"), "doc_id"))
        .toDF()),
    // REAL LZW decode: synthesize GIFs through genuine LZW compression
    // (dictionary growth, variable code widths, clears) and decode them
    // back via the GIF-variant LZW + palette mapping. Pixels and palette
    // are id-derived, so the oracle regenerates both arithmetically
    "mm_gif_stats" -> ((s, d) =>
      Multimodal.gifStats(
          Multimodal.withGifPayloads(t(s, d, "documents"), "doc_id"))
        .toDF()),
    // REAL baseline-JPEG entropy decode: synthesize JPEGs through the
    // writer dual (Annex-K DC Huffman, byte stuffing) and decode them
    // back — canonical Huffman tables + EXTEND + DPCM DC. Diffs are
    // id-derived, so the oracle regenerates the prefix-summed DC values
    // with range() arithmetic; a table, stuffing, or sign bug mismatches
    "mm_jpeg_dc" -> ((s, d) =>
      Multimodal.jpegDcStats(
          Multimodal.withJpegPayloads(t(s, d, "documents"), "doc_id"))
        .toDF()),

    // ---- audit / data-quality surface -------------------------------------
    // "what changed between sync v1 and sync v2" over the events CDC log;
    // cutoffs derive from the log itself so the same query text scales
    // across sf dirs (the oracle computes them with scalar subqueries)
    "cdc_snapshot_diff" -> ((s, d) => {
      val events = t(s, d, "events")
      val vMax = events.agg(max(col("event_id"))).head.getLong(0)
      CdcOps.snapshotDiff(events, Seq("user_id"), "event_id",
        vMax / 2, vMax, isDelete)
    }),
    "dedup_survivors" -> ((s, d) =>
      Dedup.exactSurvivors(t(s, d, "documents"), "doc_id", "text")),
    "ri_orphans" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      Profiler.referentialOrphans(li, "l_orderkey", t(s, d, "orders"), "o_orderkey",
          "lineitem->orders")
        .unionAll(Profiler.referentialOrphans(li, "l_partkey", t(s, d, "part"),
          "p_partkey", "lineitem->part"))
        .unionAll(Profiler.referentialOrphans(li, "l_suppkey", t(s, d, "supplier"),
          "s_suppkey", "lineitem->supplier"))
        .unionAll(Profiler.referentialOrphans(t(s, d, "orders"), "o_custkey",
          t(s, d, "customer"), "c_custkey", "orders->customer"))
    }),
    // CUSUM level-shift candidate per type: the drift detector a CDC
    // monitor runs over a feed's hourly means
    "events_changepoint" -> ((s, d) =>
      Profiler.changepointCusum(t(s, d, "events"), "event_type", "ts", "value")),
    "benford_prices" -> ((s, d) =>
      Profiler.benfordFirstDigit(t(s, d, "orders"), "o_totalprice")),
    // per-source PII scan (the synthetic corpus is clean — the counts are
    // honest zeros; PiiSpec pins detection + redaction on a seeded fixture)
    "docs_pii_scan" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("source"), TextFunctions.piiCounts(col("text")).as("pii"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("docs"),
          sum(when(col("pii.email") + col("pii.ssn") + col("pii.ipv4")
            + col("pii.phone") > 0, 1L).otherwise(0L)).as("docs_with_pii"),
          sum(col("pii.email")).as("emails"), sum(col("pii.ssn")).as("ssns"),
          sum(col("pii.ipv4")).as("ipv4s"), sum(col("pii.phone")).as("phones"))),
    "events_seasonality" -> ((s, d) =>
      // decimal-cast measure ⇒ exact sum ⇒ engine-reproducible mean
      Behavior.hourOfWeekProfile(t(s, d, "events"), "ts",
        col("value").cast("decimal(18,2)"))),
    "events_value_scaled" -> ((s, d) =>
      Behavior.minMaxScaled(t(s, d, "events"), "event_type", "value")
        .select(col("event_id"), col("event_type"), col("value"), col("scaled"))),
    "order_latency" -> ((s, d) =>
      Analytics.fulfillmentLatency(t(s, d, "orders"), t(s, d, "lineitem"))),
    // α=1/2 temperature mixing across the 20 sources (integer-exact
    // allocations ∝ ⌊√tokens⌋, deterministic hash fill per stratum)
    "docs_temperature_mix" -> ((s, d) =>
      Sampling.temperatureMix(t(s, d, "documents"), Seq("source"), col("doc_id"),
          TextFunctions.tokenCount(col("text")), totalBudget = 20000L)
        .select(col("source"), col("doc_id"), col("n_tokens"),
          col("cum_tokens"), col("alloc_tokens"))),
    "docs_lang_diversity" -> ((s, d) =>
      Profiler.groupEntropy(t(s, d, "documents"), "source", "lang")),
    "events_value_deciles" -> ((s, d) =>
      Behavior.quantileBuckets(
        t(s, d, "events").select(col("event_id"), col("value")), "value", 10)),
    // robust median/MAD outlier screen — the heavy-tail-safe twin of
    // events_value_outliers' 3σ z-score cut
    "events_value_mad" -> ((s, d) =>
      Behavior.madOutliers(
        t(s, d, "events").select(col("event_id"), col("event_type"), col("value")),
        "event_type", "value", 2.0)),
    "q19_brand_revenue" -> ((s, d) =>
      Analytics.disjunctiveRevenue(t(s, d, "part"), t(s, d, "lineitem"))),
    "cube_revenue" -> ((s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .cube(col("n_name"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))),
    "docs_top_bigrams" -> ((s, d) => {
      val bg = t(s, d, "documents")
        .select(explode(TextFunctions.bigrams(lower(col("text")))).as("bigram"))
      val total = bg.agg(count(lit(1)).as("total"))
      bg.groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(total))
        .where(col("n") * 800 > col("total")) // > 0.125% of all bigrams
        .select(col("bigram"), col("n"))
    }),
    // the exact Lloyd assignment step as a query — the ORACLED anchor of
    // the vector family (the ANN paths are rows-only by design)
    "emb_centroid_assign" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.centroidAssign(e, e.where(col("vec_id") < 8), "vec_id", "embedding")
    }),
    // embedding-space stratified sample: cap every mode at 20 vectors,
    // picked in deterministic hash order — assignment + pick both oracled
    // per-cluster distance outliers: the embedding-space quality screen
    "emb_outlier_dist" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.clusterOutliers(e, e.where(col("vec_id") < 8), "vec_id",
        "embedding")
    }),
    "emb_balanced_sample" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.balancedSample(e, e.where(col("vec_id") < 8), "vec_id",
        "embedding", perCluster = 20)
    }),
    // centroid-silhouette cluster quality per label — exact micro-grid
    // centroid sums, multiplied-out integer distance numerators (r16)
    "emb_silhouette" -> ((s, d) =>
      ClusterEval.centroidSilhouette(t(s, d, "embeddings"), "vec_id",
        "embedding", "label")),
    // 24h sliding distinct users per hour anchor: each (hour, user) pair is
    // exploded into the <=24 anchors whose window covers it (bounded fan-out,
    // no nested-loop range join), anchors clipped to observed hours
    "events_sliding_users" -> ((s, d) => {
      val hu = t(s, d, "events")
        .select(date_trunc("HOUR", col("ts")).as("h"), col("user_id")).distinct()
      val hours = hu.select(col("h").as("h0")).distinct()
      hu.withColumn("h0", explode(sequence(col("h"),
          col("h") + expr("INTERVAL 23 HOURS"), expr("INTERVAL 1 HOUR"))))
        .join(broadcast(hours), Seq("h0"), "left_semi")
        .groupBy(col("h0"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }),
    // signup→purchase conversion latency, exact integer microseconds
    "funnel_latency" -> ((s, d) => {
      val lat = t(s, d, "events").groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "signup", col("ts"))).as("s"),
          min(when(col("event_type") === "purchase", col("ts"))).as("p"))
        .where(col("p").isNotNull && col("s").isNotNull && col("p") > col("s"))
        .select((graft.functions.TimeCols.micros(col("p")) -
          graft.functions.TimeCols.micros(col("s"))).as("lat_us"))
      lat.agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(lat_us, 0.5)"), 4).as("p50_us"),
        round(expr("percentile(lat_us, 0.9)"), 4).as("p90_us"))
    }),
    // market-basket association at brand granularity: which brand pairs
    // co-occur in an order beyond chance (support/confidence/lift)
    "basket_brand_pairs" -> ((s, d) => {
      val items = t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part").select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("p_brand"))
      Insights.marketBasket(items, "l_orderkey", "p_brand")
    }),
    // supplier Pareto frontier: max revenue at min average discount —
    // sort-based exact 2D skyline, no self-join
    "supplier_skyline" -> ((s, d) => {
      val per = t(s, d, "lineitem").groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")
            * (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"),
          (sum(col("l_discount").cast("decimal(18,2)")).cast("double")
            / count(lit(1)).cast("double")).as("avg_disc"))
      Insights.skyline2d(per, "revenue", "avg_disc")
        .select(col("l_suppkey"), col("revenue"), col("avg_disc"))
    }),
    // ABC inventory classification of parts by revenue share (A<=80%,
    // B<=95%, C tail) — exact-decimal boundary, engine-reproducible
    "part_abc_classes" -> ((s, d) => {
      val per = t(s, d, "lineitem").groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")
            * (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .as("rev"))
      Insights.abcClasses(per, "l_partkey", "rev")
    }),
    // concentration of activity: Gini of per-user event counts per type
    "events_user_gini" -> ((s, d) => {
      val per = t(s, d, "events").groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n_ev"))
      Insights.giniByGroup(per, "event_type", "user_id", "n_ev")
    }),
    // RFM quintile segmentation of the customer base from the order log
    "customer_rfm" -> ((s, d) =>
      Insights.rfmCells(t(s, d, "orders"), "o_custkey", "o_orderdate",
        "o_totalprice")),
    // first-order Markov transition matrix between event types
    "events_markov" -> ((s, d) =>
      Behavior.markovTransitions(t(s, d, "events"), "user_id", "event_type",
        "ts", "event_id")),
    // lag-1/24/168h autocorrelation of the dense hourly traffic series
    "events_autocorr" -> ((s, d) =>
      Behavior.hourlyAutocorr(t(s, d, "events"), "ts", Seq(1, 24, 168))
        .withColumnRenamed("lag", "lag_h")),
    // per-user time-weighted mean gauge value (step-function holds)
    "events_time_weighted" -> ((s, d) =>
      Behavior.timeWeightedAvg(t(s, d, "events"), "user_id", "ts",
        "event_id", "value")),
    // cohort LTV curve: cumulative spend per cohort customer by age
    "orders_cohort_ltv" -> ((s, d) =>
      Insights.cohortLtv(t(s, d, "orders"), "o_custkey", "o_orderdate",
        "o_totalprice")),
    // Goh–Barabási burstiness of each user's inter-event gaps
    "events_burstiness" -> ((s, d) =>
      Behavior.burstiness(t(s, d, "events"), "user_id", "ts", "event_id")),
    // language concentration per source (HHI, the entropy screen's dual)
    "docs_source_hhi" -> ((s, d) =>
      Profiler.groupHhi(t(s, d, "documents"), "source", "lang")),
    // k-NN majority-vote classification over the embedding space, labels
    // synthesized as vec_id mod 4 (the exact-oracle anchor; ANN paths
    // swap in for the neighbor step)
    "emb_knn_classify" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.knnClassify(e.withColumn("label", pmod(col("vec_id"), lit(4))),
        e.where(col("vec_id") < 10), "vec_id", "embedding", "label", 5)
    }),
    // interpolated Kneser-Ney bigram signal (D=0.75), the smoothing the
    // CCNet-style quality buckets actually want; add-one twin above
    "docs_bigram_kn" -> ((s, d) =>
      Vocabulary.bigramKnLogprob(t(s, d, "documents"), "doc_id", "text")),
    // top session journeys: first-5-step paths with session/user counts
    "events_session_paths" -> ((s, d) =>
      Behavior.sessionPaths(t(s, d, "events"), "user_id", "event_type",
        "ts", "event_id", 1800L)),
    // exact tie-averaged ROC-AUC: does value predict a purchase event.
    // value is a CONTINUOUS double, so the score is binned (×16) before
    // the score-grain cumulative window — without it distinct-score
    // cardinality ≈ row count and the window degenerates to one task at
    // scale; the oracle bins with the identical IEEE floor(s·16)
    "events_value_auc" -> ((s, d) =>
      StatTests.binaryAuc(t(s, d, "events"), col("value"),
        col("event_type") === "purchase", binScale = 16.0)),
    // decile lift table for the same classifier framing
    "events_purchase_lift" -> ((s, d) =>
      StatTests.liftTable(t(s, d, "events"), col("value"),
        col("event_type") === "purchase", col("event_id"))),
    // fixed-point integer PageRank over the supplier co-order graph —
    // deterministic nano-unit ranks that hash-match an independent
    // engine (float PageRank never could)
    "supplier_pagerank" -> ((s, d) => {
      // guarded co-occurrence build: a hub order would otherwise fan the
      // pair self-join out quadratically (TPC-H orders hold <= 7 lineitems,
      // so the cap never fires here — the guard is for hub-shaped data)
      val edges = Graph.coOccurrenceEdges(t(s, d, "lineitem"),
        "l_orderkey", "l_suppkey")
      Graph.pageRankFixedPoint(edges, "src", "dst", 5)
    }),
    // Heaps'-law vocabulary growth exponent: the corpus-health dual of
    // docs_zipf_hapax, exact growth curve via the first-occurrence trick
    "docs_heaps_law" -> ((s, d) =>
      Vocabulary.heapsLaw(t(s, d, "documents"), "doc_id", "text")),
    // last-touch attribution: which channel gets credit for a purchase
    // (24h window), composed from the engine's own backward as-of join
    "events_last_touch" -> ((s, d) =>
      Behavior.lastTouchAttribution(t(s, d, "events"), "user_id",
        "event_type", "ts", "value", "purchase", 86400000000L)),
    // ClickHouse sequenceNextNode('forward','first_match'): where users go
    // right after their first consecutive view→click adjacency (r16)
    "events_sequence_next_node" -> ((s, d) =>
      Behavior.sequenceNextNode(t(s, d, "events"), "user_id", "event_type",
        "ts", "event_id", Seq("view", "click"))),
    // ClickHouse deltaSum per event type: positive increments of each
    // user's value counter, exact cents (r16) — distinct from the
    // per-user `events_delta_sum`, which this must not shadow
    "events_delta_sum_by_type" -> ((s, d) =>
      Behavior.deltaSumCents(t(s, d, "events"), "event_type", "user_id",
        floor(col("value") * 100 + 0.5), "ts", "event_id")),
    // exact pairwise 3-gram Jaccard between corpus sources — the
    // multi-source overlap readout before choosing mix weights (r16)
    "docs_source_overlap" -> ((s, d) =>
      Vocabulary.groupShingleOverlap(t(s, d, "documents"), "source", "text")),
    // per-source bigram Shannon entropy: the repetitiveness/diversity
    // readout beside the overlap matrix (r16)
    "docs_bigram_entropy" -> ((s, d) =>
      Vocabulary.bigramEntropy(t(s, d, "documents"), "source", "text")),
    // daily new vs returning actives: a user's first-seen day marks them
    // new exactly once; the day grain keeps every frame day×user-bounded
    "events_new_vs_returning" -> ((s, d) => {
      val du = t(s, d, "events")
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val first = du.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
      du.join(first, Seq("user_id"))
        .groupBy(col("day"))
        .agg(sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
          .as("new_users"),
          sum(when(col("day") =!= col("first_day"), 1L).otherwise(0L))
            .as("returning_users"))
    }),
    // DAU / 7-day WAU / 30-day MAU + stickiness per day: each (day, user)
    // explodes into the <=30 trailing anchors it keeps active (bounded
    // fan-out, the events_sliding_users shape), anchors clipped to
    // observed days
    "events_dau_mau" -> ((s, d) => {
      val du = t(s, d, "events")
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val days = du.select(col("day").as("d0")).distinct()
      val anchored = du.withColumn("d0",
          explode(sequence(col("day"), date_add(col("day"), 29),
            expr("INTERVAL 1 DAY"))))
        .join(broadcast(days), Seq("d0"), "left_semi")
      anchored.groupBy(col("d0").as("day"))
        .agg(
          count_distinct(when(col("d0") === col("day"), col("user_id")))
            .as("dau"),
          count_distinct(when(datediff(col("d0"), col("day")) < 7,
            col("user_id"))).as("wau"),
          count_distinct(col("user_id")).as("mau"))
        .select(col("day"), col("dau"), col("wau"), col("mau"),
          round(col("dau").cast("double") / col("mau").cast("double"), 6)
            .as("stickiness"))
    }),
    // Dickey-Fuller stationarity of the hourly traffic series — the
    // unit-root companion of events_autocorr on the same dense grid
    "events_adf_test" -> ((s, d) =>
      Behavior.hourlyAdf(t(s, d, "events"), "ts")),
    // event-mix diversity as a TIME SERIES: Shannon entropy of the type
    // mix per day (the drift signal a feed monitor charts)
    "events_daily_entropy" -> ((s, d) =>
      Profiler.groupEntropy(
        t(s, d, "events").withColumn("day", to_date(col("ts"))),
        "day", "event_type")),
    // how seasonal IS the load: R² of the hour-of-week profile (share
    // of value variance the 168 seasonal means explain) — one row, all
    // moments exact decimal, per-cell terms fold over the 168-cell frame
    "events_seasonal_strength" -> ((s, d) => {
      val dv = col("value").cast("decimal(18,2)")
      val cells = t(s, d, "events")
        .groupBy((weekday(col("ts")) + 1).as("dow"), hour(col("ts")).as("hod"))
        .agg(count(lit(1)).as("n"), sum(dv).as("sy"), sum(dv * dv).as("syy"))
      cells.agg(sum(col("n")).as("n_all"), sum(col("sy")).as("s_all"),
          sum(col("syy")).as("ss_all"),
          sum(col("sy").cast("double") * col("sy").cast("double")
            / col("n").cast("double")).as("ss_cells"))
        .select(col("n_all"),
          round(lit(1.0)
            - (col("ss_all").cast("double") - col("ss_cells"))
            / (col("ss_all").cast("double")
              - col("s_all").cast("double") * col("s_all").cast("double")
                / col("n_all").cast("double")), 6).as("seasonal_r2"))
    }),
    // full supplier-nation × customer-nation trade-flow matrix (q7 is
    // the two-nation slice): star join, nation dims broadcast, exact
    // decimal revenue
    "nation_trade_matrix" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer").select(col("c_custkey"),
          col("c_nationkey").as("cust_nk")),
          col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "supplier").select(col("s_suppkey"),
          col("s_nationkey").as("supp_nk")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation").select(
          col("n_nationkey").as("supp_nk"), col("n_name").as("supp_nation"))),
          Seq("supp_nk"))
        .join(broadcast(t(s, d, "nation").select(
          col("n_nationkey").as("cust_nk"), col("n_name").as("cust_nation"))),
          Seq("cust_nk"))
        .groupBy(col("supp_nation"), col("cust_nation"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(18,2)")
            * (lit(1).cast("decimal(18,2)")
              - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"))),
    // isolation-forest anomaly screen over (value, hour): driver-held
    // seeded trees compiled into when() expression columns — rows-only
    // (no SQL oracle for the randomized forest; determinism, planted-
    // outlier separation, and partitioning-independence are spec-pinned)
    "events_iforest" -> ((s, d) => {
      val ev = t(s, d, "events")
        .withColumn("hod", hour(col("ts")).cast("double"))
      val m = IsolationForest.train(ev, "event_id", Seq("value", "hod"))
      m.score(ev, "iforest_score")
        .select(col("event_id"), col("iforest_score"))
        .orderBy(col("iforest_score").desc, col("event_id")).limit(50)
    }),
    // MMR diversity re-rank of each query's top-20 pool (λ=0.75 — both
    // weights exact binary doubles, so the score expression is literal-
    // identical cross-engine); integer-only output
    "emb_mmr_diversify" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.mmrDiversify(e, e.where(col("vec_id") < 10), "vec_id",
        "embedding", poolK = 20, select = 5, lambda = 0.75)
    }),
    // topology profile of the same graph: exact-moment assortativity
    "supplier_graph_stats" -> ((s, d) => {
      val edges = Graph.coOccurrenceEdges(t(s, d, "lineitem"),
        "l_orderkey", "l_suppkey")
      Graph.degreeStats(edges, "src", "dst")
    }),
    // exact triangle census + local clustering of the promo-part
    // co-order graph (the supplier co-order graph is near-complete at
    // this SF — deliberately the sparse slice): compact-forward
    // orientation caps wedge fan-out at O(m^1.5) where the naive Σdeg²
    // wedge join melts on hubs
    "part_triangles" -> ((s, d) => {
      val promo = t(s, d, "part").where(col("p_type").startsWith("PROMO"))
        .select(col("p_partkey"))
      val items = t(s, d, "lineitem")
        .join(promo, col("l_partkey") === col("p_partkey"), "left_semi")
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = Graph.coOccurrenceEdges(items, "l_orderkey", "l_partkey")
      Graph.triangleStats(edges, "src", "dst")
        .withColumnRenamed("node", "p_partkey")
    }),
    // ClickHouse skewPop/kurtPop moment family: distribution shape per
    // event type from four exact integer power sums, one shuffle
    "events_moments" -> ((s, d) =>
      StatTests.momentStats(t(s, d, "events"), col("event_type"),
        floor(col("value") * 100 + 0.5))
        .withColumnRenamed("g", "event_type")),
    // CUPED variance-reduced A/B readout: pre-period spend as the control
    // variate, variants keyed user_id % 2, split at the span midpoint
    "events_cuped" -> ((s, d) =>
      StatTests.cuped(t(s, d, "events"), col("user_id"),
        floor(col("value") * 100 + 0.5), expr("unix_micros(ts)"))),
    // Benjamini–Hochberg step-up over per-event-type Welch z-tests
    // (even vs odd user cohorts) — FDR-controlled "which types differ"
    "events_bh_fdr" -> ((s, d) =>
      StatTests.bhFdr(t(s, d, "events"), col("event_type"),
        col("user_id") % 2 === 0, floor(col("value") * 100 + 0.5))
        .withColumnRenamed("g", "event_type")),
    // SRM guardrail: realized unit split vs 50/50, alarm at p < 0.001
    "events_srm_check" -> ((s, d) =>
      StatTests.srmCheck(t(s, d, "events"),
        expr("(unix_micros(ts) DIV 3600000000) % 24"),
        col("user_id"), col("user_id") % 2 === 0)
        .withColumnRenamed("g", "bucket")),
    // CCNet-style corpus-frequency sentence dedup (boilerplate removal)
    "docs_sentence_dedup" -> ((s, d) =>
      Dedup.sentenceDedup(t(s, d, "documents"), "doc_id", "text")),
    // novelty curve: share of each doc's 4-gram shingles first seen there
    "docs_ngram_novelty" -> ((s, d) =>
      Contamination.noveltyCurve(t(s, d, "documents"), "doc_id", "text")),
    // persisted boilerplate-index lifecycle: bootstrap 90%, clean the 10%
    // sync batch against accumulated ∪ batch piece frequencies — equals
    // the one-shot pass over everything, restricted to the batch
    "docs_boiler_indexed" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val idx = BoilerplateIndex.create(s, indexScratch, minDocs = 3)
      idx.add(docs.where(pmod(col("doc_id"), lit(10)) =!= 0),
        "doc_id", "text") // bootstrap: counts only, nothing to clean
      idx.cleanAndAdd(docs.where(pmod(col("doc_id"), lit(10)) === 0),
        "doc_id", "text")
    }),
    // ClickHouse proportionsZTest: purchase-rate z/p/CI per hour bucket
    "events_prop_ztest" -> ((s, d) =>
      StatTests.proportionsZTest(t(s, d, "events"),
        expr("(unix_micros(ts) DIV 3600000000) % 24"),
        col("user_id") % 2 === 0, col("event_type") === "purchase")
        .withColumnRenamed("g", "bucket")),
    // within-subject change across the span midpoint, same-unit pairing
    "events_ttest_paired" -> ((s, d) =>
      StatTests.pairedTTest(t(s, d, "events"), col("user_id"),
        floor(col("value") * 100 + 0.5), expr("unix_micros(ts)"))),
    // mixture-SPRT always-valid sequential readout: the peeking-safe
    // daily p-curve beside the fixed-horizon tests (r16)
    "events_msprt" -> ((s, d) =>
      StatTests.msprt(t(s, d, "events"), col("user_id"),
        floor(col("value") * 100 + 0.5), col("ts"))),
    // delta-method ratio-metric test: purchases per view, the CTR-shaped
    // readout the per-user t-test gets wrong (r16)
    "events_ratio_ztest" -> ((s, d) =>
      StatTests.ratioZTest(t(s, d, "events"), col("user_id"),
        (col("event_type") === "purchase").cast("long"),
        (col("event_type") === "view").cast("long"))),
    // does a monotone trend EXIST (Theil–Sen's hypothesis-test sibling)
    "events_mann_kendall" -> ((s, d) =>
      Behavior.dailyMannKendall(t(s, d, "events"), "ts")),
    // nonparametric within-subject change: signed ranks of post−pre
    // diffs, the paired t's fat-tail-proof sibling (r16)
    "events_wilcoxon" -> ((s, d) =>
      StatTests.wilcoxonSignedRank(t(s, d, "events"), col("user_id"),
        floor(col("value") * 100 + 0.5), expr("unix_micros(ts)"))),
    // multi-touch linear attribution: exact integer basis points split
    // across the conversion's lookback path (r16)
    "events_attribution_linear" -> ((s, d) =>
      Behavior.linearAttribution(t(s, d, "events"), "user_id",
        "event_type", "ts", "event_id", "purchase", 86400000000L)),
    // do views LEAD purchases: cross-correlation of the two hourly
    // count series at 0..24h lags on the shared dense grid (r16)
    "events_crosscorr" -> ((s, d) =>
      Behavior.hourlyCrossCorr(t(s, d, "events"), "ts", "event_type",
        "view", "purchase", Seq(0, 1, 2, 3, 4, 6, 8, 12, 24))),
    // the hour-of-day seasonal PROFILE: centered 2x24-MA detrend, exact
    // integer numerators end to end (r16)
    "events_seasonal_decompose" -> ((s, d) =>
      Behavior.seasonalDecompose(t(s, d, "events"), "ts")),
    // compression-ratio quality profile per source (Gopher/RefinedWeb
    // lineage): codegen'd raw-deflate size, integer basis-point ratios.
    // rows-only by design: no SQL oracle can recompute zlib (r16)
    "docs_quality_compression" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("source"),
          octet_length(col("text")).cast("long").as("nb"),
          graft.expressions.NativeFunctions.deflateSize(col("text")).as("zb"))
        .where(col("nb") > 0)
        .withColumn("ratio_bp", expr("(zb * 10000) DIV nb"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ratio_bp")).as("sum_ratio_bp"),
          min(col("ratio_bp")).as("min_ratio_bp"),
          max(col("ratio_bp")).as("max_ratio_bp"),
          sum(when(col("ratio_bp") < 3000, 1L).otherwise(0L))
            .as("n_over_compressible"))),
    // is day-to-day traffic random around its level, or regime-sticky
    "events_runs_test" -> ((s, d) =>
      Behavior.dailyRunsTest(t(s, d, "events"), "ts")),
    // Lorenz concentration curve over per-user event counts (the curve
    // behind events_user_gini's scalar), NTILE decile rule
    "events_lorenz" -> ((s, d) =>
      Insights.lorenzCurve(
        t(s, d, "events").groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_ev")),
        "user_id", "n_ev")),
    // is per-user activity Poisson: exponential MLE + one-sample KS
    "events_interarrival_fit" -> ((s, d) =>
      StatTests.interarrivalExpFit(t(s, d, "events"), col("user_id"),
        col("ts"), col("event_id"))),
    // robust central tendency: exact integer trimmed mean, 10% each tail
    "events_trimmed_mean" -> ((s, d) =>
      StatTests.trimmedMean(t(s, d, "events"), col("event_type"),
        floor(col("value") * 100 + 0.5))
        .withColumnRenamed("g", "event_type")),
    // continuous-metric A/B duration planner from observed variance
    "events_min_sample_means" -> ((s, d) =>
      StatTests.minSampleSizeMeans(t(s, d, "events"), col("event_type"),
        floor(col("value") * 100 + 0.5), 0.05)
        .withColumnRenamed("g", "event_type")),
    // inter-purchase cadence: day gaps between consecutive orders per
    // customer, summarized with exact counts + interpolated quantiles
    "orders_interpurchase" -> ((s, d) =>
      Insights.interpurchaseGaps(t(s, d, "orders"), "o_custkey",
        "o_orderdate", "o_orderkey")),
    // Kaplan–Meier time-to-next-order: inter-order gaps observed, the
    // final open gap right-censored at the window edge
    "orders_survival_km" -> ((s, d) =>
      Survival.kaplanMeier(t(s, d, "orders"), "o_custkey", "o_orderdate")),
    // one survival curve per market segment, shared observation horizon
    "orders_survival_by_segment" -> ((s, d) =>
      Survival.kaplanMeierBySegment(
        t(s, d, "orders").join(
          t(s, d, "customer").select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey")),
        "o_custkey", "o_orderdate", "c_mktsegment")),
    // BFS blast radius over the strong co-order supplier graph (≥2 shared
    // orders keeps the graph sparse at every scale factor)
    "supplier_bfs_hops" -> ((s, d) => {
      val e = Graph.coOccurrenceEdges(t(s, d, "lineitem"),
          "l_orderkey", "l_suppkey")
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
        .where(col("w") >= 2)
      Graph.bfsHops(e, "src", "dst", 4)
    }),
    // 3-core of the strong co-order graph: the mutually-reinforcing
    // supplier backbone no single removal breaks — iterative peel,
    // hash-matching a 12-round unrolled-peel oracle (r16)
    "supplier_kcore" -> ((s, d) => {
      val e = Graph.coOccurrenceEdges(t(s, d, "lineitem"),
          "l_orderkey", "l_suppkey")
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
        .where(col("w") >= 2).select(col("src"), col("dst"))
      Graph.kCore(e, "src", "dst", 3)
    }),
    // deterministic label propagation (min-label tie-break, 4 pinned
    // synchronous rounds) over the PROMO-part co-order graph — the
    // emerging-community readout beside part_triangles' clustering; the
    // labels hash-match a 4-round unrolled-CTE oracle (r16 s5)
    "part_communities" -> ((s, d) => {
      val promo = t(s, d, "part").where(col("p_type").startsWith("PROMO"))
        .select(col("p_partkey"))
      val items = t(s, d, "lineitem")
        .join(promo, col("l_partkey") === col("p_partkey"), "left_semi")
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = Graph.coOccurrenceEdges(items, "l_orderkey", "l_partkey")
      Graph.labelPropagation(edges, "src", "dst", 4)
    }),
    // collaborative-filtering link prediction: each supplier's best
    // partner by common-customer evidence (integer argmax) with the
    // Adamic-Adar score as payload — wedges through the naturally
    // bounded customer side, hub customers loudly excluded (r16 s5)
    "supplier_best_partner" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val rel = t(s, d, "orders")
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey"), col("l_suppkey"))
      // relRows: each lineitem row joins exactly one order, so the join's
      // output volume is |lineitem| — a column-less parquet count,
      // memoized per dir so reps 2+ skip the extra action (r19 ADVICE).
      // Sizes the pre-distinct (c, s) shuffle (r19; see bipartiteBestPartner)
      Graph.bipartiteBestPartner(rel, "o_custkey", "l_suppkey",
        relRows = lineitemRowsByDir.getOrElseUpdate(d, li.count()))
    }),
    // directed association rules over the order->brand baskets: the
    // ordered (confidence/lift/leverage/conviction) readout beside
    // basket_brand_pairs' unordered support (r16 s5)
    "basket_rules" -> ((s, d) => {
      val items = t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part").select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("p_brand"))
      Insights.basketRules(items, "l_orderkey", "p_brand", minN = 2L)
    }),
    // revenue-weighted supplier concentration per nation: exact-integer
    // HHI + CR1 from decimal cross products (r16 s5)
    "nation_supplier_hhi" -> ((s, d) =>
      Insights.revenueHhi(
        t(s, d, "lineitem")
          .join(broadcast(t(s, d, "supplier")
            .join(broadcast(t(s, d, "nation")),
              col("s_nationkey") === col("n_nationkey"))
            .select(col("s_suppkey"), col("n_name"))),
            col("l_suppkey") === col("s_suppkey")),
        "n_name", "s_suppkey", floor(col("l_extendedprice") * 100 + 0.5))),
    // matched-items unit-value price index per ship month vs the first
    // month — composition-artifact-free price drift (r16 s5)
    "monthly_price_index" -> ((s, d) =>
      Insights.unitValueIndex(t(s, d, "lineitem"), col("l_shipdate"),
        col("l_partkey"), col("l_quantity"),
        floor(col("l_extendedprice") * 100 + 0.5))),
    // Croston's intermittent-demand forecast per part over the monthly
    // series — dyadic two-EMA fold, bit-replayed by a recursive-CTE
    // oracle over every part in lockstep (r16 s5)
    "part_croston_forecast" -> ((s, d) =>
      Insights.crostonForecast(t(s, d, "lineitem"), col("l_shipdate"),
        col("l_partkey"), col("l_quantity"))
        .withColumnRenamed("k", "p_partkey")),
    // daily open-order backlog: the interval sweep over the order book
    // (r16 s5)
    "orders_open_backlog" -> ((s, d) =>
      Insights.openBacklog(t(s, d, "orders"), t(s, d, "lineitem"))),
    // ClickHouse meanZTest parity: two-sample z with KNOWN design
    // variances (4000²/3500² cents²) per day-of-week bucket (r16 s5)
    "events_mean_ztest" -> ((s, d) =>
      StatTests.meanZTest(t(s, d, "events"),
        expr("(unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000) % 7"),
        pmod(col("user_id"), lit(2)) === 0,
        pmod(col("user_id"), lit(2)) === 1,
        floor(col("value") * 100 + 0.5),
        varA = 16000000.0, varB = 12250000.0)),
    // two-sample Poisson rate test per event type: exposure-adjusted
    // arrival-rate drift between user-parity arms, 30-day design
    // exposure per unit (r16 s5)
    "events_rate_test" -> ((s, d) =>
      StatTests.poissonRateTest(t(s, d, "events"), col("event_type"),
        pmod(col("user_id"), lit(2)) === 0, col("user_id"),
        spanUnits = 30.0)),
    // mean segmental type-token ratio per source: length-robust lexical
    // diversity over complete 50-token segments (r16 s5)
    "docs_msttr" -> ((s, d) =>
      Vocabulary.msttr(t(s, d, "documents"), "doc_id", "text", "source")),
    // brand-switching chain: the behavior Markov matrix applied to each
    // customer's consecutive brand purchases (r16 s5)
    "customer_brand_markov" -> ((s, d) => {
      // the testdata lineitem is TPC-H-ISH: (orderkey, linenumber) is NOT
      // unique (45832/60000 distinct at sf0.01) — the deterministic
      // tie-break needs the full 4-column key, passed as a struct (window
      // order on a struct = lexicographic, the oracle's multi-column
      // ORDER BY)
      val purchases = t(s, d, "orders")
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, d, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("o_custkey"), col("p_brand"), col("o_orderdate"),
          struct(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey")).as("li_id"))
      Behavior.markovTransitions(purchases, "o_custkey", "p_brand",
        "o_orderdate", "li_id")
    }),
    // 7-day trailing rolling median of the daily count series — the
    // EXACT lower-median order statistic, all integers (r16 s5)
    "events_rolling_median" -> ((s, d) => {
      val observed = t(s, d, "events")
        .groupBy(date_trunc("DAY", col("ts")).as("dy"))
        .agg(count(lit(1)).as("x"))
      val spine = observed
        .agg(min(col("dy")).as("d0"), max(col("dy")).as("d1"))
        .select(explode(sequence(col("d0"), col("d1"),
          expr("INTERVAL 1 DAY"))).as("dy"))
      val series = spine.join(observed, Seq("dy"), "left")
        .select(col("dy"), coalesce(col("x"), lit(0L)).as("x"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("dy"))
        .rowsBetween(-6, 0)
      series
        .withColumn("win", array_sort(collect_list(col("x")).over(w)))
        .select(col("dy").as("day"), size(col("win")).cast("long").as("n_days"),
          element_at(col("win"), ((size(col("win")) + 1) / 2).cast("int"))
            .as("median_count"))
    }),
    // per-brand return rate with the Wilson score interval — the
    // proportion CI that behaves at small n and extreme rates (r16 s5)
    "brand_return_rate" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
      val m = li.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("returns"))
      def dd(c: Column): Column = c.cast("double")
      val (nd, p) = (dd(col("n")), dd(col("returns")) / dd(col("n")))
      val z2 = lit(1.959963984540054 * 1.959963984540054)
      val center = p + z2 / (lit(2.0) * nd)
      val half = lit(1.959963984540054) *
        sqrt(p * (lit(1.0) - p) / nd + z2 / (lit(4.0) * nd * nd))
      val denom = lit(1.0) + z2 / nd
      m.select(col("p_brand"), col("n"), col("returns"),
        round(p, 6).as("return_rate"),
        round((center - half) / denom, 6).as("wilson_lo"),
        round((center + half) / denom, 6).as("wilson_hi"))
    }),
    // entropy rate of the behavior chain: H(next | current) over
    // consecutive event-type pairs, theilsU's pinned folds (r16 s5)
    "events_entropy_rate" -> ((s, d) =>
      Behavior.entropyRate(t(s, d, "events"), "user_id", "event_type",
        "ts", "event_id")),
    // WebP RIFF probe: VP8L bit-packed and VP8 start-code dimension
    // layouts by id parity; oracle re-derives dims from doc_id (r16 s5)
    "mm_webp_probe" -> ((s, d) =>
      Multimodal.probeHeaders(
          Multimodal.withWebpPayloads(t(s, d, "documents"), "doc_id"))
        .toDF()
        .groupBy(col("width").cast("long").as("width"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("height").cast("long")).as("sum_height"),
          max(col("format")).as("format"))),
    // RAKE keyword extraction: stopword-bounded candidate runs, exact
    // deg/freq stats, position-ordered score folds (r16 s5)
    "docs_rake_keywords" -> ((s, d) =>
      Vocabulary.rakeKeywords(t(s, d, "documents"), "doc_id", "text",
        Seq("a", "the"), minWords = 2, maxWords = 4, minCount = 2L)),
    // DBSCAN core/border/noise classification on the exact quantized
    // grid — the brute-force density anchor beside knn_brute_force
    // (r16 s5)
    "emb_dbscan_core" -> ((s, d) =>
      ClusterEval.dbscanClassify(t(s, d, "embeddings"), "vec_id",
        "embedding", eps2 = 1550000L, minPts = 5)),
    // additive Holt–Winters: hourlyHolt + the 24-slot seasonal state,
    // bit-replayed by the oracle's recursive CTE
    "events_holt_winters" -> ((s, d) =>
      Behavior.hourlyHoltWinters(t(s, d, "events"), "ts")),
    // Efraimidis–Spirakis exact-k weighted sample, length-proportional
    "docs_weighted_sample" -> ((s, d) =>
      Sampling.weightedSample(t(s, d, "documents"), col("doc_id"),
        greatest(col("n_chars"), lit(1L)), 100)
        .select(col("doc_id"), col("lang"), col("n_chars"))),
    // per-source weighted draw: k docs per stratum ∝ length — the
    // training-mix primitive (quotas × A-ES) (r16)
    "docs_stratified_weighted" -> ((s, d) =>
      Sampling.weightedSamplePerGroup(
        t(s, d, "documents").select(col("doc_id"), col("source"),
          col("n_chars")),
        col("source"), col("doc_id"), greatest(col("n_chars"), lit(1L)), 10)),
    // maintained A-ES reservoir: create on 90%, refresh the rest, read —
    // bit-equal to the one-shot draw over the whole corpus (r16)
    "docs_sample_maintained" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val w = greatest(col("n_chars"), lit(1L))
      val agg = graft.operators.SampleAgg.create(s,
        docs.where(pmod(col("doc_id"), lit(10)) =!= 0), "doc_id", w, 100,
        indexScratch)
      agg.refresh(docs.where(pmod(col("doc_id"), lit(10)) === 0), w)
      agg.read()
    }),
    // Flesch reading ease per doc — counts from the fused one-pass native
    // kernel (TextStats; ≡ the regex formulation, property-pinned), the
    // formula tree unchanged so the oracle is untouched
    "text_readability" -> ((s, d) => {
      val st = graft.expressions.NativeFunctions.textStats(col("text"))
      val w = st(0).cast("double"); val sn = st(1).cast("double")
      val sy = st(2).cast("double")
      t(s, d, "documents").select(col("doc_id"),
        st(0).as("n_words"), st(1).as("n_sentences"),
        st(2).as("n_syllables"),
        when(w > 0.0, round(lit(206.835) - lit(1.015) * (w / sn) -
          lit(84.6) * (sy / w), 4)).as("flesch"))
    }),
    // encoding-damage screen: U+FFFD / control chars / UTF-8-as-Latin-1
    // digraph markers, flagged above 1 per mille of the doc's chars
    "docs_mojibake" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TextFunctions.mojibakeCounts(col("text")).as("mc"),
          col("n_chars"))
        .select(col("doc_id"),
          col("mc.n_replacement").as("n_replacement"),
          col("mc.n_control").as("n_control"),
          col("mc.n_latin1_marks").as("n_latin1_marks"),
          (((col("mc.n_replacement") + col("mc.n_control") +
            col("mc.n_latin1_marks")).cast("double") * lit(1000.0)) /
            greatest(col("n_chars"), lit(1L)).cast("double") > lit(1.0))
            .as("damaged"))),
    // ClickHouse sparkBar: hour-of-day activity bar per event type —
    // integer-only glyph levels, so the string is engine-exact
    "events_sparkbar" -> ((s, d) =>
      Insights.sparkbar(t(s, d, "events"), col("event_type"),
        hour(col("ts")), 24)
        .withColumnRenamed("g", "event_type")),
    // Holt linear-trend smoothing of the dense hourly series: the
    // sequential recurrence folds over the time-grained array with the
    // Catalyst higher-order aggregate; dyadic α=β=1/2 keeps every step
    // bit-reproducible cross-engine
    "events_holt" -> ((s, d) =>
      Behavior.hourlyHolt(t(s, d, "events"), "ts")),
    // Theil–Sen robust daily trend: median pairwise slope + intercept —
    // pair count is day-span-bounded, independent of row volume
    "events_theil_sen" -> ((s, d) =>
      Behavior.dailyTheilSen(t(s, d, "events"), "ts")),
    // ClickHouse minSampleSizeConversion: per-type A/B run-length
    // planner at MDE = 1pp (α=0.05 two-sided, power 0.8)
    "events_min_sample_size" -> ((s, d) =>
      StatTests.minSampleSize(t(s, d, "events"), col("event_type"), 0.01)
        .withColumnRenamed("g", "event_type")),
    // ClickHouse minMap/maxMap: per-user event_type → (min,max) cents,
    // canonical sorted CSV (the events_sum_map encoding)
    "events_minmax_map" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(floor(col("value") * 100 + 0.5).cast("long")).as("mn"),
          max(floor(col("value") * 100 + 0.5).cast("long")).as("mx"))
        .groupBy(col("user_id"))
        .agg(array_join(sort_array(collect_list(
            concat_ws(":", col("event_type"), col("mn"), col("mx")))), ",")
          .as("minmax_map"))),
    // seriesPeriodDetectFFT intent via the autocorrelation sweep (exact
    // integer moments per lag, deterministic argmax — no FFT floats):
    // dominant period of hourly traffic over lags 2..48h
    "events_period_detect" -> ((s, d) =>
      Behavior.periodDetect(t(s, d, "events"), "ts", 2, 48)),
  )

  private val rev = "CAST(l_extendedprice AS DECIMAL(18,2)) * " +
    "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  private val bm25Oracle =
    """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
       stats AS (SELECT count(*) AS n_docs,
                        CAST(sum(len(w)) AS DOUBLE) / count(*) AS avgdl FROM toks),
       tf AS (SELECT doc_id, len(w) AS dl, term, count(*) AS tf
              FROM (SELECT doc_id, w, unnest(w) AS term FROM toks)
              WHERE term IN ('spark', 'window', 'dup')
              GROUP BY doc_id, dl, term),
       df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       scored AS (
         SELECT doc_id,
                round(sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                      * t.tf * 2.2 / (t.tf + 1.2 * (0.25 + 0.75 * t.dl / s.avgdl))), 4) AS bm25
         FROM tf t JOIN df d USING (term) CROSS JOIN stats s
         GROUP BY doc_id)
       SELECT doc_id, bm25, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rk
       FROM scored QUALIFY rk <= 10"""

  private val incrementalOracle =
    """WITH d AS (SELECT doc_id AS id,
                         list_distinct(string_split(lower(text), ' ')) AS words
                  FROM documents),
       tok AS (SELECT id, unnest(words) AS w, len(words) AS n FROM d),
       f AS (SELECT w, count(*) AS df FROM tok GROUP BY w),
       pfx AS (SELECT id, w FROM (
                 SELECT t.id, t.w, t.n,
                        row_number() OVER (PARTITION BY t.id ORDER BY f.df, t.w) AS rn
                 FROM tok t JOIN f USING (w))
               WHERE rn <= n - ceil(n * 0.8) + 1),
       cand AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b
                FROM pfx l JOIN pfx r ON l.w = r.w AND l.id < r.id)
       SELECT c.id_a, c.id_b,
              CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
                / len(list_distinct(list_concat(a.words, b.words))) AS jaccard
       FROM cand c JOIN d a ON c.id_a = a.id JOIN d b ON c.id_b = b.id
       WHERE CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
               / len(list_distinct(list_concat(a.words, b.words))) >= 0.8
         AND (c.id_a % 10 = 0 OR c.id_b % 10 = 0)"""

  /** Unrolled BPE-training CTE chain for the `docs_bpe_*` oracles (r18):
    * an INDEPENDENT DuckDB replay of Sennrich ACL-2016 merge learning.
    * `wf` = the word-frequency table (same tokenization as every text
    * oracle); `v0` = words split to code-point symbols + the `</w>`
    * marker; then per step k: `pk` counts adjacent pairs weighted by
    * word freq, `mk` takes the argmax under the engine's total tie-break
    * (freq desc, left, right — DuckDB's binary VARCHAR order = UTF-8
    * byte order = code-point order, the same order Spark's UTF8String
    * sort induces), and `vk` applies the merge with the textbook
    * LEFTMOST-NON-OVERLAPPING scan, expressed as a `list_reduce` fold
    * whose string accumulator is `out || chr(1) || pending` (pending =
    * the symbol awaiting its right neighbor; a chr(31)-joined out). A
    * plain string replace() would NOT be that scan — consecutive matches
    * share a boundary, and runs of identical symbols pair differently —
    * so the fold is the only faithful SQL expression. `lastV` names the
    * final vocabulary CTE for the token-stats oracle.
    *
    * PRECONDITION (r18 advice, documented like dedup_simhash's ASCII
    * note): the fold uses chr(1)/chr(31) as out/pending sentinels and
    * '</w>' as the end-of-word marker, so corpus text containing
    * U+0001 or U+001F code points, or a literal '</w>' substring inside
    * a token, would silently corrupt the replay. The test corpus
    * satisfies all three by construction (verified: printable-ASCII
    * tokens only, no angle brackets); a hostile corpus needs
    * out-of-alphabet sentinels (e.g. per-symbol integer lists instead
    * of joined strings).
    */
  private def bpeOracleCtes(nMerges: Int, withFinalVocab: Boolean): String = {
    val head =
      """wf AS MATERIALIZED (
           SELECT w, CAST(count(*) AS BIGINT) AS freq
           FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
                 FROM documents)
           WHERE len(w) > 0 GROUP BY 1),
         v0 AS MATERIALIZED (
           SELECT freq, w, list_append(
             list_transform(range(1, len(w)+1), i -> w[i:i]), '</w>') AS syms
           FROM wf)"""
    def applyMerge(prev: String, m: String): String =
      s"""SELECT freq, w,
             list_filter(string_split(
               CASE WHEN split_part(acc, chr(1), 2) = ''
                    THEN split_part(acc, chr(1), 1)
                    ELSE split_part(acc, chr(1), 1) || chr(31)
                         || split_part(acc, chr(1), 2) END,
               chr(31)), s -> s <> '') AS syms
           FROM (
             SELECT freq, w,
               list_reduce(list_prepend(chr(1), syms),
                 (acc, x) -> CASE
                   WHEN split_part(acc, chr(1), 2) = $m.l AND x = $m.r
                     THEN split_part(acc, chr(1), 1) || chr(31)
                          || $m.l || $m.r || chr(1)
                   WHEN split_part(acc, chr(1), 2) = ''
                     THEN split_part(acc, chr(1), 1) || chr(1) || x
                   ELSE split_part(acc, chr(1), 1) || chr(31)
                        || split_part(acc, chr(1), 2) || chr(1) || x
                 END) AS acc
             FROM $prev, $m)"""
    val steps = (1 to nMerges).map { k =>
      val vk = if (k < nMerges || withFinalVocab)
        s",\n         v$k AS MATERIALIZED (${applyMerge(s"v${k - 1}", s"m$k")})"
      else ""
      s"""p$k AS (
           SELECT p.l AS l, p.r AS r, sum(freq) AS pf
           FROM (SELECT freq,
                   unnest(list_transform(range(1, len(syms)),
                     i -> {'l': syms[i], 'r': syms[i+1]})) AS p
                 FROM v${k - 1} WHERE len(syms) >= 2)
           GROUP BY 1, 2),
         m$k AS MATERIALIZED (
           SELECT $k AS step, l, r, CAST(pf AS BIGINT) AS pf
           FROM p$k ORDER BY pf DESC, l, r LIMIT 1)$vk"""
    }.mkString(",\n         ")
    s"$head,\n         $steps"
  }

  /** Spark Murmur3_x86_32.hashInt as staged DuckDB SQL (r18): nested
    * selects computing `t = hashInt(inp, seed)` over 32-bit wrapping
    * arithmetic (BIGINT lanes, HUGEINT for the multiplies, `xor()` +
    * rotation via disjoint shift halves), carrying `cols` through. Powers
    * the hyperplane-LSH replay: the engine's plane weights are
    * murmur-derived (HyperplaneLsh.scala), so the oracle re-derives the
    * identical planes with no shared code.
    */
  private def murmurSql(inp: String, seed: String, cols: Seq[String],
                        src: String): String = {
    val M = "4294967296"
    val c = cols.mkString(", ")
    val steps = Seq(
      s"CAST((CAST($inp AS HUGEINT) * 3432918353) % $M AS BIGINT) AS t",
      s"((t * 32768) % $M) + (t // 131072) AS t",
      s"CAST((CAST(t AS HUGEINT) * 461845907) % $M AS BIGINT) AS t",
      s"xor(CAST($seed AS BIGINT), t) AS t",
      s"((t * 8192) % $M) + (t // 524288) AS t",
      s"(t * 5 + 3864292196) % $M AS t",
      "xor(t, 4::BIGINT) AS t",
      "xor(t, t // 65536) AS t",
      s"CAST((CAST(t AS HUGEINT) * 2246822507) % $M AS BIGINT) AS t",
      "xor(t, t // 8192) AS t",
      s"CAST((CAST(t AS HUGEINT) * 3266489909) % $M AS BIGINT) AS t",
      "xor(t, t // 65536) AS t")
    steps.foldLeft(src)((q, s) => s"(SELECT $c, $s FROM $q)")
  }

  /** Shared CTE text for the hyperplane-LSH replays: `w` = the engine's
    * murmur-derived plane weights (hi = hash(i,42) per dimension, then
    * hash(b,hi)/2^31 per plane — signed-int semantics restored from the
    * uint lanes), `wl` = each plane's weights as an ascending-dimension
    * list, `e` = the embeddings, `dots` = the per-(vector, plane) dot as
    * the engine's exact IEEE fold (0.0-prepended list_reduce in ascending
    * dimension order — HyperplaneBands.scala accumulates per-plane dots
    * over ascending i identically).
    */
  private def lshPlaneCtes(dim: Int, planes: Int): String = {
    val M = "4294967296"
    val hiQ = murmurSql("i", "42", Seq("i"),
      s"(SELECT unnest(range(0, $dim)) AS i)")
    val wQ = murmurSql("b", "hi", Seq("i", "b", "hi"),
      s"(SELECT i, t AS hi, unnest(range(0, $planes)) AS b FROM $hiQ)")
    s"""w AS MATERIALIZED (
           SELECT i, b,
             (CASE WHEN t >= 2147483648 THEN t - $M ELSE t END)
               / 2147483648.0 AS w
           FROM $wQ),
         wl AS MATERIALIZED (
           SELECT b, list(w ORDER BY i) AS wl FROM w GROUP BY b),
         e AS MATERIALIZED (
           SELECT vec_id AS id, embedding AS v FROM embeddings),
         dots AS (
           SELECT e.id, wl.b,
             list_reduce(
               list_prepend(0.0, list_transform(range(1, ${dim + 1}),
                 i -> CAST(e.v[i] AS DOUBLE) * wl.wl[i])),
               (a, x) -> a + x) AS d
           FROM e CROSS JOIN wl)"""
  }

  /** Spark XxHash64 of a LongType column (seed 42) as staged DuckDB SQL —
    * one 8-byte lane + the avalanche, 64-bit wrapping arithmetic via
    * 32-bit-limb modular multiplies (the dedup_simhash oracle precedent).
    * Produces `t` = the UNSIGNED hash as HUGEINT; callers restore the
    * signed order for ORDER BY.
    *
    * PRECONDITION (r18 advice, documented like dedup_simhash's ASCII
    * note): `inp` must be a NON-NEGATIVE BIGINT. The limb split
    * (`x % 2^32`, `x // 2^32`) and the `% 2^64` reductions assume the
    * unsigned 64-bit value equals the signed one, which holds only for
    * x >= 0 — a negative id's two's-complement bits would hash
    * differently here than in the engine's XxHash64. Every caller feeds
    * a key column (`vec_id`, `doc_id`), all >= 0 in the test corpus by
    * construction (verified); a signed corpus needs
    * `CASE WHEN x < 0 THEN x + 2^64 END` normalization ahead of the
    * first limb split.
    */
  private def xxhashSql(inp: String, src: String, cols: Seq[String]): String = {
    val M64 = BigInt(2).pow(64).toString
    val (p1, p2, p3, p4, p5) = ("11400714785074694791", "14029467366897019727",
      "1609587929392839161", "9650029242287828579", BigInt("2870177450012600261"))
    def mul64(x: String, c: String) =
      s"(CAST($x % 4294967296 AS HUGEINT) * $c + " +
        s"((CAST($x // 4294967296 AS HUGEINT) * $c) % 4294967296) " +
        s"* 4294967296) % $M64"
    def rotl64(x: String, r: Int) =
      s"((${mul64(x, (BigInt(1) << r).toString)}) + " +
        s"(CAST($x AS HUGEINT) // ${BigInt(1) << (64 - r)})) % $M64"
    val accInit = (p5 + 42 + 8).toString // seed + PRIME5 + length
    val c = cols.mkString(", ")
    val steps = Seq(
      s"CAST(${mul64(s"CAST($inp AS HUGEINT)", p2)} AS HUGEINT) AS t",
      s"CAST(${rotl64("t", 31)} AS HUGEINT) AS t",
      s"CAST(${mul64("t", p1)} AS HUGEINT) AS t",
      s"CAST(xor(CAST($accInit AS UBIGINT), CAST(t AS UBIGINT)) AS HUGEINT) AS t",
      s"CAST(${rotl64("t", 27)} AS HUGEINT) AS t",
      s"CAST((${mul64("t", p1)} + $p4) % $M64 AS HUGEINT) AS t",
      "CAST(xor(CAST(t AS UBIGINT), CAST(t // 8589934592 AS UBIGINT)) AS HUGEINT) AS t",
      s"CAST(${mul64("t", p2)} AS HUGEINT) AS t",
      "CAST(xor(CAST(t AS UBIGINT), CAST(t // 536870912 AS UBIGINT)) AS HUGEINT) AS t",
      s"CAST(${mul64("t", p3)} AS HUGEINT) AS t",
      "CAST(xor(CAST(t AS UBIGINT), CAST(t // 4294967296 AS UBIGINT)) AS HUGEINT) AS t")
    steps.foldLeft(src)((q, s) => s"(SELECT $c, $s FROM $q)")
  }

  /** The CosineSim kernel's dot as SQL: the identical-order IEEE fold over
    * ascending dimensions with the engine's 0.0 initial accumulator. */
  private def cosFold(l: String, r: String, dim: Int): String =
    s"""list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}),
       i -> CAST($l.v[i] AS DOUBLE) * CAST($r.v[i] AS DOUBLE))),
       (a, x) -> a + x)"""

  /** The r18 fixed-point Lloyd replay, factored (r19) so dedup_semantic
    * and emb_kmeans share it: CTE text re-deriving the ENTIRE
    * kmeansCentroids training loop over `embeddings` — the
    * xxhash64-ordered k-sample init (centroid ids 0..k-1 in pick order),
    * `iters` unrolled Lloyd steps where assignment is the
    * NearestCentroids cosine argmax (ties to the lower cid, its
    * insertion order) and the mean update is the engine's FIXED-POINT
    * coordinate sum (exact order-free longs of floor(x·2^40 + 0.5), then
    * the same two-division double tree), empty clusters keeping their
    * previous centroid. Emits CTEs: `hx` (signed xxhash64 of vec_id),
    * `c0` (init codebook), `e` (corpus + norms), per-step s/a/u/c chains,
    * `sf` (final sims) and `af` (the final assignment). Bit-exact — every
    * float op is order-pinned IEEE.
    */
  private def kmeansReplayCtes(dim: Int, k: Int, iters: Int): String = {
    val M64 = "18446744073709551616"
    val q = (1L << 40).toString + ".0"
    val xxq = xxhashSql("vec_id", "(SELECT vec_id FROM embeddings)",
      Seq("vec_id"))
    def simsCte(cents: String, name: String) =
      s"""$name AS (
         SELECT e.id, c.cid,
           list_reduce(list_prepend(0.0,
             list_transform(range(1, ${dim + 1}),
               i -> CAST(e.v[i] AS DOUBLE) * c.cv[i])),
             (a, x) -> a + x) / (e.vn * c.nc) AS sim
         FROM e CROSS JOIN
           (SELECT cid, cv,
              sqrt(list_reduce(list_prepend(0.0,
                list_transform(range(1, ${dim + 1}), i -> cv[i] * cv[i])),
                (a, x) -> a + x)) AS nc
            FROM $cents) c)"""
    val steps = (1 to iters).map { it =>
      s"""${simsCte(s"c${it - 1}", s"s$it")},
         a$it AS (
           SELECT id, cid FROM (
             SELECT id, cid, row_number() OVER (PARTITION BY id
               ORDER BY sim DESC, cid) AS rn FROM s$it) WHERE rn = 1),
         u$it AS (
           SELECT a.cid, u.pos,
             CAST(CAST(sum(CAST(floor(CAST(e.v[u.pos] AS DOUBLE) * $q + 0.5)
               AS BIGINT)) AS DOUBLE) / $q AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS c
           FROM a$it a JOIN e ON e.id = a.id,
                unnest(range(1, ${dim + 1})) u(pos)
           GROUP BY 1, 2),
         c$it AS MATERIALIZED (
           SELECT g.cid, list(COALESCE(u.c, g.pc) ORDER BY g.pos) AS cv
           FROM (SELECT p.cid, pp.pos, p.cv[pp.pos] AS pc
                 FROM c${it - 1} p, unnest(range(1, ${dim + 1})) pp(pos)) g
           LEFT JOIN u$it u ON u.cid = g.cid AND u.pos = g.pos
           GROUP BY g.cid)"""
    }.mkString(",\n         ")
    s"""hx AS (SELECT vec_id,
             CASE WHEN t >= 9223372036854775808
                  THEN CAST(t - $M64 AS BIGINT)
                  ELSE CAST(t AS BIGINT) END AS h
           FROM $xxq),
         c0 AS MATERIALIZED (
           SELECT CAST(row_number() OVER (ORDER BY hx.h, e.vec_id) - 1
                    AS BIGINT) AS cid,
                  list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS cv
           FROM embeddings e JOIN hx ON e.vec_id = hx.vec_id
           ORDER BY hx.h, e.vec_id LIMIT $k),
         e AS MATERIALIZED (
           SELECT vec_id AS id, embedding AS v,
             sqrt(list_reduce(list_prepend(0.0,
               list_transform(range(1, ${dim + 1}),
                 i -> CAST(embedding[i] AS DOUBLE)
                    * CAST(embedding[i] AS DOUBLE))),
               (a, x) -> a + x)) AS vn
           FROM embeddings),
         $steps,
         ${simsCte(s"c$iters", "sf")},
         af AS MATERIALIZED (
           SELECT id, cid FROM (
             SELECT id, cid, row_number() OVER (PARTITION BY id
               ORDER BY sim DESC, cid) AS rn FROM sf) WHERE rn = 1)"""
  }


  /** One 0.0-seeded left fold — THE IEEE-order primitive the ANN replays
    * build on (CosineSim / NearestCentroids / PqEncode / the driver-side
    * Lloyd loops all accumulate ascending from a 0.0 init). */
  private def fold0(items: String): String =
    s"""list_reduce(list_prepend(0.0, $items), (ac, x) -> ac + x)"""

  /** The engine's l2-norm fold over a codebook column `$l.cv`. */
  private def normFoldSql(l: String, dim: Int): String =
    s"sqrt(${fold0(s"list_transform(range(1, ${dim + 1}), i -> $l.cv[i] * $l.cv[i])")})"

  /** PqEncode's squared-L2 fold between subvector `$s.sv` and code `$p.cv`. */
  private def pqD2Fold(dsub: Int, s: String, p: String): String =
    fold0(s"""list_transform(range(1, ${dsub + 1}),
       d -> ($s.sv[d] - $p.cv[d]) * ($s.sv[d] - $p.cv[d]))""")

  /** Shared CTE text for the ANN replays (r19): `hx` = signed xxhash64 of
    * vec_id; `smp` = the corpus in the engine's hash order with rank `rn`
    * — the order IvfIndex.create/pqTrain freeze their training sample
    * from AND the order their driver-sequential accumulations visit rows
    * in — plus double-cast vectors and the ascending norm fold `vn`. */
  private def embSampleCtes(dim: Int): String = {
    val M64 = "18446744073709551616"
    val xxq = xxhashSql("vec_id", "(SELECT vec_id FROM embeddings)",
      Seq("vec_id"))
    s"""hx AS (SELECT vec_id,
             CASE WHEN t >= 9223372036854775808
                  THEN CAST(t - $M64 AS BIGINT)
                  ELSE CAST(t AS BIGINT) END AS h
           FROM $xxq),
         smp AS MATERIALIZED (
           SELECT e.vec_id AS id,
             list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v,
             sqrt(list_reduce(list_prepend(0.0,
               list_transform(range(1, ${dim + 1}),
                 i -> CAST(e.embedding[i] AS DOUBLE)
                    * CAST(e.embedding[i] AS DOUBLE))), (ac, x) -> ac + x))
               AS vn,
             row_number() OVER (ORDER BY hx.h, e.vec_id) AS rn
           FROM embeddings e JOIN hx ON e.vec_id = hx.vec_id)"""
  }

  /** IvfIndex.create's coarse k-means refinement as CTE text (r19):
    * `iters` Lloyd steps over `smp` starting from codebook CTE `k0`
    * (cid, cv) — cosine argmax assignment (ties to the lower cid), then
    * ORDER-PINNED member-sum float folds by sample rank (the engine loop
    * is driver-sequential in hash order), empty clusters keeping their
    * vector. Callers read `k$iters`. */
  private def ivfCoarseSteps(dim: Int, iters: Int): String = {
    val rng = s"range(1, ${dim + 1})"
    (1 to iters).map { it =>
      s"""n$it AS (SELECT cid, cv, ${normFoldSql(s"k${it - 1}", dim)} AS nc
             FROM k${it - 1}),
         s$it AS (
           SELECT m.rn, c.cid,
             ${fold0(s"list_transform($rng, i -> m.v[i] * c.cv[i])")}
               / (m.vn * c.nc) AS sim
           FROM smp m CROSS JOIN n$it c),
         a$it AS (
           SELECT rn, cid FROM (
             SELECT rn, cid, row_number() OVER (PARTITION BY rn
               ORDER BY sim DESC, cid) AS rk FROM s$it) WHERE rk = 1),
         u$it AS (
           SELECT a.cid, p.pos,
             ${fold0("list(m.v[p.pos] ORDER BY m.rn)")}
               / CAST(count(*) AS DOUBLE) AS c
           FROM a$it a JOIN smp m USING (rn), unnest($rng) p(pos)
           GROUP BY 1, 2),
         k$it AS MATERIALIZED (
           SELECT g.cid, list(COALESCE(u.c, g.pc) ORDER BY g.pos) AS cv
           FROM (SELECT p.cid, pp.pos, p.cv[pp.pos] AS pc
                 FROM k${it - 1} p, unnest($rng) pp(pos)) g
           LEFT JOIN u$it u ON u.cid = g.cid AND u.pos = g.pos
           GROUP BY g.cid)"""
    }.mkString(",\n         ")
  }

  /** pqFit's per-subspace sub-k-means as CTE text (r19): `iters` Lloyd
    * steps over subvector CTE `sub` (rn, id, j, sv) from init `p0`
    * (j, c, cv) — L2 d2 folds with strict-< lowest-code ties, ordered
    * member-sum folds by sample rank, empty codes keeping their vector.
    * Callers read `p$iters`. */
  private def pqFitSteps(dsub: Int, iters: Int): String = {
    val rs = s"range(1, ${dsub + 1})"
    (1 to iters).map { it =>
      s"""d$it AS (
           SELECT s.rn, s.j, p.c, ${pqD2Fold(dsub, "s", "p")} AS d2
           FROM sub s JOIN p${it - 1} p ON p.j = s.j),
         b$it AS (
           SELECT rn, j, c FROM (
             SELECT rn, j, c, row_number() OVER (PARTITION BY rn, j
               ORDER BY d2, c) AS rk FROM d$it) WHERE rk = 1),
         m$it AS (
           SELECT b.j, b.c, p.pos,
             ${fold0("list(s.sv[p.pos] ORDER BY s.rn)")}
               / CAST(count(*) AS DOUBLE) AS m
           FROM b$it b JOIN sub s ON s.rn = b.rn AND s.j = b.j,
                unnest($rs) p(pos)
           GROUP BY 1, 2, 3),
         p$it AS MATERIALIZED (
           SELECT g.j, g.c, list(COALESCE(m.m, g.pc) ORDER BY g.pos) AS cv
           FROM (SELECT p.j, p.c, pp.pos, p.cv[pp.pos] AS pc
                 FROM p${it - 1} p, unnest($rs) pp(pos)) g
           LEFT JOIN m$it m ON m.j = g.j AND m.c = g.c AND m.pos = g.pos
           GROUP BY g.j, g.c)"""
    }.mkString(",\n         ")
  }

  def oracleSql: Map[String, String] = uniqueMap(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum($rev) AS DOUBLE) AS sum_disc_price,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q3_unshipped_revenue" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         CAST(sum($rev) AS DOUBLE) AS revenue
         FROM lineitem, orders, customer
         WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
           AND c_mktsegment = 'BUILDING'
           AND l_shipdate > TIMESTAMP '1998-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority""",
    "q5_region_volume" ->
      s"""SELECT n_name, CAST(sum($rev) AS DOUBLE) AS revenue
         FROM lineitem, orders, supplier, nation, region, customer
         WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA' AND o_custkey = c_custkey
           AND c_nationkey = s_nationkey
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1999-01-01'
         GROUP BY n_name""",
    "q6_revenue_delta" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q4_priority_semijoin" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1996-06-01')
         GROUP BY o_orderpriority""",
    "top_customers" ->
      """SELECT c_custkey, c_name, CAST(revenue AS DOUBLE) AS revenue, n_orders
         FROM (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue,
                      count(*) AS n_orders
               FROM orders GROUP BY o_custkey) o, customer
         WHERE o_custkey = c_custkey AND revenue > 3000000""",
    "nation_revenue_rank" ->
      """SELECT n_name, c_custkey, CAST(revenue AS DOUBLE) AS revenue, rev_rank FROM (
           SELECT n_name, c_custkey, revenue,
                  rank() OVER (PARTITION BY n_name ORDER BY revenue DESC, c_custkey) AS rev_rank
           FROM (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
                 FROM orders GROUP BY o_custkey) o, customer, nation
           WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey)
         WHERE rev_rank <= 3""",
    "top_orders_per_nation" ->
      """SELECT n_name, o_orderkey, o_totalprice, rk FROM (
           SELECT n_name, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY n_name
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders, customer, nation
           WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey)
         WHERE rk <= 3""",
    "q8_market_share" ->
      s"""SELECT year(o_orderdate) AS o_year,
         CAST(sum(CASE WHEN n2.n_name = 'NATION_3' THEN $rev
                       ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE) AS nation_revenue,
         CAST(sum($rev) AS DOUBLE) AS total_revenue
         FROM lineitem, part, orders, customer, supplier, nation n1, nation n2, region
         WHERE l_partkey = p_partkey AND p_type = 'STANDARD'
           AND l_orderkey = o_orderkey AND o_custkey = c_custkey
           AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
           AND r_name = 'ASIA' AND l_suppkey = s_suppkey
           AND s_nationkey = n2.n_nationkey
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY year(o_orderdate)""",
    "q9_product_profit" ->
      s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
         CAST(sum($rev
                  - CAST(p_retailprice AS DECIMAL(18,2))
                    * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
         FROM lineitem, part, supplier, orders, nation
         WHERE l_partkey = p_partkey AND p_name LIKE '%red%'
           AND l_suppkey = s_suppkey AND l_orderkey = o_orderkey
           AND s_nationkey = n_nationkey
         GROUP BY n_name, year(o_orderdate)""",
    "orders_repeat_rate" ->
      """WITH pc AS (SELECT o_custkey, count(*) AS n_orders
                     FROM orders GROUP BY o_custkey),
         bc AS (SELECT n_orders, count(*) AS n_customers
                FROM pc GROUP BY n_orders),
         t AS (SELECT CAST(sum(n_customers) AS BIGINT) AS n_all FROM bc)
         SELECT n_orders, n_customers,
                round(CAST(n_customers AS DOUBLE) / CAST(n_all AS DOUBLE), 6)
                  AS share
         FROM bc CROSS JOIN t ORDER BY n_orders""",
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal,
         n_name, CAST(sum($rev) AS DOUBLE) AS revenue
         FROM lineitem, orders, customer, nation
         WHERE l_returnflag = 'R' AND l_orderkey = o_orderkey
           AND o_custkey = c_custkey AND c_nationkey = n_nationkey
           AND o_orderdate >= TIMESTAMP '1996-07-01'
           AND o_orderdate < TIMESTAMP '1996-10-01'
         GROUP BY c_custkey, c_name, CAST(c_acctbal AS DECIMAL(18,2)), n_name""",
    "q14_promo_revenue" ->
      s"""SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN $rev
                        ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE) AS promo_revenue,
         CAST(sum($rev) AS DOUBLE) AS total_revenue
         FROM lineitem, part
         WHERE l_partkey = p_partkey
           AND l_shipdate >= TIMESTAMP '1996-09-01'
           AND l_shipdate < TIMESTAMP '1996-10-01'""",
    "q15_top_supplier" ->
      s"""WITH revenue AS (
           SELECT l_suppkey, sum($rev) AS total_rev
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1996-04-01'
             AND l_suppkey IS NOT NULL
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
         FROM supplier, revenue
         WHERE s_suppkey = l_suppkey
           AND total_rev = (SELECT max(total_rev) FROM revenue)""",
    "docs_chunks" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS words
                    FROM documents WHERE len(trim(text)) > 0),
              s AS (SELECT doc_id, words,
                           unnest(range(0, greatest(len(words) - 16, 1), 48)) AS start
                    FROM d)
         SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_idx,
                array_to_string(list_slice(words, start + 1, start + 64), ' ')
                  AS chunk_text,
                CAST(least(64, len(words) - start) AS BIGINT) AS n_words
         FROM s""",
    "docs_packed" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS words
                    FROM documents WHERE len(trim(text)) > 0),
              s AS (SELECT doc_id, words,
                           unnest(range(0, greatest(len(words) - 16, 1), 48)) AS start
                    FROM d),
              c AS (SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_idx,
                           CAST(least(64, len(words) - start) AS BIGINT) AS n_words
                    FROM s)
         SELECT doc_id, chunk_idx, n_words,
                CAST(((doc_id % 8) + 8) % 8 AS BIGINT) AS shard,
                CAST(COALESCE(sum(n_words) OVER (
                       PARTITION BY ((doc_id % 8) + 8) % 8 ORDER BY doc_id, chunk_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     // 256 AS BIGINT) AS seq_id
         FROM c""",
    "q17_small_qty_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
             AS avg_yearly
         FROM lineitem,
              (SELECT l_partkey AS agg_partkey,
                      sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_sum,
                      count(*) AS qty_cnt
               FROM lineitem, part
               WHERE l_partkey = p_partkey AND p_brand = 'Brand#1'
               GROUP BY l_partkey) pa,
              part
         WHERE l_partkey = p_partkey AND p_brand = 'Brand#1'
           AND l_partkey = agg_partkey
           AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * qty_cnt < qty_sum""",
    "part_type_share" ->
      s"""SELECT p_brand,
         CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN $rev ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
         CAST(sum($rev) AS DOUBLE) AS total_revenue
         FROM lineitem, part WHERE l_partkey = p_partkey
         GROUP BY p_brand""",
    "q22_idle_customers" ->
      """SELECT c_custkey, c_name, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
         FROM customer, (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bal_sum,
                                count(*) AS bal_n
                         FROM customer WHERE c_acctbal > 0) t
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                           AND o_orderdate >= TIMESTAMP '1999-01-01')
           AND CAST(c_acctbal AS DECIMAL(18,2)) * bal_n > bal_sum""",
    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
           GROUP BY c_custkey)
         GROUP BY c_count""",
    "q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate,
                CAST(total_qty AS DOUBLE) AS total_qty
         FROM orders, customer,
              (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
               FROM lineitem GROUP BY l_orderkey HAVING total_qty > 150) b
         WHERE o_orderkey = b.l_orderkey AND o_custkey = c_custkey""",
    "q7_nation_volume" ->
      s"""SELECT supp_nation, cust_nation, l_year, CAST(sum(volume) AS DOUBLE) AS revenue FROM (
           SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                  year(l_shipdate) AS l_year, $rev AS volume
           FROM lineitem, orders, supplier, customer, nation n1, nation n2
           WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
             AND o_custkey = c_custkey AND s_nationkey = n1.n_nationkey
             AND c_nationkey = n2.n_nationkey
             AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
               OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')))
         GROUP BY supp_nation, cust_nation, l_year""",
    "rolling_revenue" ->
      """SELECT day, CAST(day_revenue AS DOUBLE) AS day_revenue,
                CAST(sum(day_revenue) OVER (ORDER BY day_num
                  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_7d
         FROM (SELECT CAST(o_orderdate AS DATE) AS day,
                      sum(CAST(o_totalprice AS DECIMAL(18,2))) AS day_revenue,
                      date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day_num
               FROM orders GROUP BY 1, 3)""",
    "asof_purchase_click" ->
      """SELECT p.user_id, p.event_id, p.ts, p.value,
                c.event_id AS r_event_id, c.ts AS r_ts, c.value AS r_value
         FROM (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase') p
         ASOF JOIN (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'click') c
           ON p.user_id = c.user_id AND p.ts >= c.ts""",
    // DuckDB ASOF with <= picks the earliest later row; the tolerance is a
    // post-filter on the matched gap (the picked row is the nearest, so no
    // other candidate could pass when it fails)
    "asof_click_next_purchase" ->
      """SELECT * FROM (
           SELECT c.user_id, c.event_id, c.ts, c.value,
                  p.event_id AS r_event_id, p.ts AS r_ts, p.value AS r_value
           FROM (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'click') c
           ASOF JOIN (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase') p
             ON c.user_id = p.user_id AND c.ts <= p.ts)
         WHERE epoch_us(r_ts) - epoch_us(ts) <= 1800000000""",
    "range_join_events" ->
      """SELECT p.user_id, p.event_id, c.event_id AS r_event_id
         FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p,
              (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
         WHERE p.user_id = c.user_id
           AND epoch(c.ts) >= epoch(p.ts) - 1800 AND epoch(c.ts) <= epoch(p.ts)""",
    "events_pivot" ->
      """SELECT user_id,
                CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
                CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
                CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
                CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
                CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
         FROM events GROUP BY user_id""",
    "rollup_revenue" ->
      """SELECT r_name, n_name,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                count(*) AS n_orders
         FROM orders, customer, nation, region
         WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
           AND n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name)""",
    "events_value_outliers" ->
      """WITH m AS (
           SELECT event_type,
                  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                    / CAST(count(*) AS DOUBLE) AS mean,
                  sqrt(CAST(sum(CAST(value AS DECIMAL(18,2))
                              * CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE)
                       - (CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                            / CAST(count(*) AS DOUBLE))
                       * (CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                            / CAST(count(*) AS DOUBLE))) AS std
           FROM events GROUP BY 1)
         SELECT event_id, e.event_type, value,
                round((value - mean) / std, 4) AS z
         FROM events e JOIN m ON e.event_type = m.event_type
         WHERE abs(value - mean) > 3.0 * std""",
    "supplier_pareto" ->
      """WITH rev AS (SELECT l_suppkey,
                             sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS revenue
                      FROM lineitem GROUP BY 1),
         tot AS (SELECT sum(revenue) AS total FROM rev),
         c AS (SELECT l_suppkey, revenue,
                      sum(revenue) OVER (ORDER BY revenue DESC, l_suppkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                      row_number() OVER (ORDER BY revenue DESC, l_suppkey) AS rk
               FROM rev)
         SELECT l_suppkey, CAST(revenue AS DOUBLE) AS revenue,
                round(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6) AS cum_share,
                rk
         FROM c CROSS JOIN tot
         WHERE round(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6) <= 0.8""",
    "lineitem_corr_matrix" ->
      """WITH m AS (SELECT count(*) AS n,
                  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s_0,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s_1,
                  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s_2,
                  CAST(sum(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS s_3,
                  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS p_0_0,
                  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS p_0_1,
                  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS p_0_2,
                  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS p_0_3,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS p_1_1,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS p_1_2,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS p_1_3,
                  CAST(sum(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS p_2_2,
                  CAST(sum(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS p_2_3,
                  CAST(sum(CAST(l_tax AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS p_3_3
           FROM lineitem)
           SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, n,
                  round((CAST(n AS DOUBLE) * p_0_1 - s_0 * s_1)
                        / sqrt((CAST(n AS DOUBLE) * p_0_0 - s_0 * s_0)
                             * (CAST(n AS DOUBLE) * p_1_1 - s_1 * s_1)), 6) AS corr
           FROM m
           UNION ALL
           SELECT 'l_quantity' AS col_a, 'l_discount' AS col_b, n,
                  round((CAST(n AS DOUBLE) * p_0_2 - s_0 * s_2)
                        / sqrt((CAST(n AS DOUBLE) * p_0_0 - s_0 * s_0)
                             * (CAST(n AS DOUBLE) * p_2_2 - s_2 * s_2)), 6) AS corr
           FROM m
           UNION ALL
           SELECT 'l_quantity' AS col_a, 'l_tax' AS col_b, n,
                  round((CAST(n AS DOUBLE) * p_0_3 - s_0 * s_3)
                        / sqrt((CAST(n AS DOUBLE) * p_0_0 - s_0 * s_0)
                             * (CAST(n AS DOUBLE) * p_3_3 - s_3 * s_3)), 6) AS corr
           FROM m
           UNION ALL
           SELECT 'l_extendedprice' AS col_a, 'l_discount' AS col_b, n,
                  round((CAST(n AS DOUBLE) * p_1_2 - s_1 * s_2)
                        / sqrt((CAST(n AS DOUBLE) * p_1_1 - s_1 * s_1)
                             * (CAST(n AS DOUBLE) * p_2_2 - s_2 * s_2)), 6) AS corr
           FROM m
           UNION ALL
           SELECT 'l_extendedprice' AS col_a, 'l_tax' AS col_b, n,
                  round((CAST(n AS DOUBLE) * p_1_3 - s_1 * s_3)
                        / sqrt((CAST(n AS DOUBLE) * p_1_1 - s_1 * s_1)
                             * (CAST(n AS DOUBLE) * p_3_3 - s_3 * s_3)), 6) AS corr
           FROM m
           UNION ALL
           SELECT 'l_discount' AS col_a, 'l_tax' AS col_b, n,
                  round((CAST(n AS DOUBLE) * p_2_3 - s_2 * s_3)
                        / sqrt((CAST(n AS DOUBLE) * p_2_2 - s_2 * s_2)
                             * (CAST(n AS DOUBLE) * p_3_3 - s_3 * s_3)), 6) AS corr
           FROM m""",
    "lineitem_corr" ->
      """WITH m AS (
           SELECT l_returnflag, count(*) AS n,
                  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                         * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
                  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                         * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, n,
                round((CAST(n AS DOUBLE) * sxy - sx * sy)
                      / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                           * (CAST(n AS DOUBLE) * syy - sy * sy)), 6)
                  AS corr_qty_price
         FROM m""",
    "value_percentiles" ->
      """SELECT event_type, quantile_cont(value, 0.5) AS p50,
                quantile_cont(value, 0.95) AS p95
         FROM events GROUP BY event_type""",
    "events_json_extract" ->
      """SELECT event_type, count(*) AS n,
                CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
                max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
         FROM events GROUP BY event_type""",
    "set_ops_users" ->
      """SELECT user_id FROM events
         WHERE event_type = 'click' AND CAST(ts AS DATE) = DATE '2024-01-05'
         EXCEPT
         SELECT user_id FROM events
         WHERE event_type = 'purchase' AND CAST(ts AS DATE) = DATE '2024-01-05'""",
    "users_overlap_exact" ->
      """WITH u AS (SELECT DISTINCT event_type, user_id FROM events)
         SELECT a.event_type AS type_a, b.event_type AS type_b,
                count(*) AS n_users
         FROM u a JOIN u b USING (user_id)
         WHERE a.event_type < b.event_type
         GROUP BY 1, 2""",
    "cdc_latest_snapshot" ->
      """SELECT event_id, ts, user_id, event_type, value, props FROM events
         QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1""",
    "cdc_soft_delete" ->
      """SELECT * FROM (
           SELECT event_id, ts, user_id, event_type, value, props FROM events
           QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
         WHERE event_type <> 'error'""",
    "cdc_mirror_meta" ->
      """SELECT event_id, ts, user_id, event_type, value, props,
                CAST(event_id AS BIGINT) AS _peerdb_version,
                CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS _peerdb_is_deleted,
                CAST(ts AS DATE) AS _peerdb_batch_id,
                ts AS _peerdb_synced_at
         FROM events""",
    "cdc_scd2_history" ->
      """SELECT event_id, ts, user_id, event_type, value, props,
                ts AS valid_from,
                lead(ts) OVER w AS valid_to,
                (lead(ts) OVER w IS NULL) AS is_current
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)""",
    "cdc_batch_stats" ->
      """SELECT CAST(ts AS DATE) AS batch_id, count(*) AS rows_synced,
                count(DISTINCT user_id) AS distinct_keys,
                CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS delete_rows
         FROM events GROUP BY CAST(ts AS DATE)""",
    "cdc_version_counts" ->
      """SELECT user_id, count(*) AS n_changes, max(event_id) AS max_version
         FROM events GROUP BY user_id""",
    "cdc_event_type_rates" ->
      """SELECT event_type AS op, count(*) AS n,
                count(*) * 1000000 / (SELECT count(*) FROM events) AS share_ppm
         FROM events GROUP BY event_type""",
    "stream_windowed_counts" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
                count(*) AS n_events,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY date_trunc('hour', ts), event_type""",
    // identical windows and the identical interpolation scalar tree over
    // exact integer cents / epoch-hours
    "events_gapfill_interp" ->
      """WITH hourly AS (
           SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
                  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
           FROM events GROUP BY 1, 2),
         bounds AS (SELECT min(epoch_us(ts) // 3600000000) AS h0,
                           max(epoch_us(ts) // 3600000000) AS h1 FROM events),
         spine AS (SELECT unnest(range(h0, h1 + 1)) AS hr FROM bounds),
         types AS (SELECT DISTINCT event_type FROM events),
         grid AS (
           SELECT t.event_type, s.hr, h.cents
           FROM types t CROSS JOIN spine s
           LEFT JOIN hourly h ON h.event_type = t.event_type AND h.hr = s.hr),
         w AS (
           SELECT event_type, hr, cents,
                  last_value(cents IGNORE NULLS) OVER (
                    PARTITION BY event_type ORDER BY hr
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                  last_value(CASE WHEN cents IS NOT NULL THEN hr END
                    IGNORE NULLS) OVER (
                    PARTITION BY event_type ORDER BY hr
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
                  first_value(cents IGNORE NULLS) OVER (
                    PARTITION BY event_type ORDER BY hr
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                  first_value(CASE WHEN cents IS NOT NULL THEN hr END
                    IGNORE NULLS) OVER (
                    PARTITION BY event_type ORDER BY hr
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
           FROM grid)
         SELECT event_type, hr, cents IS NOT NULL AS observed,
                round(CASE WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
                           WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                             CAST(pv AS DOUBLE)
                               + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
                                 * CAST(hr - ph AS DOUBLE)
                                 / CAST(nh - ph AS DOUBLE)
                           WHEN pv IS NOT NULL THEN CAST(pv AS DOUBLE)
                           ELSE NULL END, 6) AS filled_cents
         FROM w""",
    "events_last_n" ->
      """WITH o AS (
           SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
           FROM events)
         SELECT user_id,
                string_agg(CAST(cents AS VARCHAR), ',' ORDER BY rn)
                  AS last_values
         FROM o WHERE rn <= 3 GROUP BY user_id""",
    "events_gapfill_1h" ->
      """WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS window_start,
                  count(*) AS n_events,
                  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           FROM events GROUP BY 1, 2),
         bounds AS (SELECT date_trunc('hour', min(ts)) AS h0,
                           date_trunc('hour', max(ts)) AS h1 FROM events),
         spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
                     AS window_start FROM bounds),
         types AS (SELECT DISTINCT event_type FROM events)
         SELECT t.event_type, s.window_start,
                CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events,
                last_value(h.sum_value IGNORE NULLS) OVER (
                  PARTITION BY t.event_type ORDER BY s.window_start
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS sum_value_locf
         FROM types t CROSS JOIN spine s
         LEFT JOIN hourly h ON h.event_type = t.event_type
                           AND h.window_start = s.window_start""",
    "events_sessionization" ->
      """SELECT user_id, count(*) AS n_events, CAST(sum(new_s) AS BIGINT) AS n_sessions FROM (
           SELECT user_id,
                  CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_s
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts))
         GROUP BY user_id""",
    "docs_gopher_rules" ->
      """SELECT doc_id, n_words, ok_word_count, ok_mean_word_len, ok_symbol_ratio,
                ok_alpha_words, ok_stopwords,
                (ok_word_count AND ok_mean_word_len AND ok_symbol_ratio
                 AND ok_alpha_words AND ok_stopwords) AS keep
         FROM (
           SELECT doc_id, n_words,
                  n_words BETWEEN 50 AND 100000 AS ok_word_count,
                  sl >= n_words * 3 AND sl <= n_words * 10 AS ok_mean_word_len,
                  sym * 10 < n_words AS ok_symbol_ratio,
                  aw * 10 >= n_words * 8 AS ok_alpha_words,
                  st >= 2 AS ok_stopwords
           FROM (
             SELECT doc_id,
                    CAST(len(ws) AS BIGINT) AS n_words,
                    CAST(list_sum(list_transform(ws, w -> len(w))) AS BIGINT) AS sl,
                    CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS aw,
                    CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT) AS sym,
                    len(list_intersect(list_distinct(ws),
                        ['the','a','an','and','of','to','in','is'])) AS st
             FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)))""",
    "docs_oov_rate" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
           FROM documents),
         tok2 AS (SELECT doc_id, w FROM tok WHERE len(w) > 0),
         vocab AS (
           SELECT w FROM (
             SELECT w, count(*) AS freq FROM tok2 GROUP BY w
             ORDER BY freq DESC, w LIMIT 1000)),
         oov AS (
           SELECT doc_id, count(*) AS oov_tokens FROM tok2
           WHERE w NOT IN (SELECT w FROM vocab) GROUP BY doc_id)
         SELECT d.doc_id,
                CAST(len(list_filter(string_split(lower(d.text), ' '),
                     x -> len(x) > 0)) AS BIGINT) AS n_tokens,
                CAST(COALESCE(o.oov_tokens, 0) AS BIGINT) AS oov_tokens
         FROM documents d LEFT JOIN oov o ON d.doc_id = o.doc_id""",
    "docs_tfidf_top_terms" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
                      FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
                WHERE len(term) > 0 GROUP BY doc_id, term),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         n AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (
           SELECT doc_id, term,
                  round(t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df), 4) AS tfidf
           FROM tf t JOIN df d USING (term) CROSS JOIN n)
         SELECT doc_id, term, tfidf,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rk
         FROM scored QUALIFY rk <= 3""",
    // tf-weighted formulation on BOTH engines: the float summands are the
    // identical multiset (tf·lp per distinct term), so 4dp rounding agrees
    "docs_unigram_logprob" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
                      FROM documents),
         tf AS (SELECT doc_id, w, count(*) AS tf FROM tok
                WHERE len(w) > 0 GROUP BY doc_id, w),
         cnt AS (SELECT w, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY w),
         tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n_tok,
                        CAST(count(*) AS DOUBLE) AS v FROM cnt)
         SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
                round(sum(tf * ln((c.c + 1) / (s.n_tok + s.v))) / sum(tf), 4)
                  AS avg_logprob
         FROM tf t JOIN cnt c USING (w) CROSS JOIN tot s
         GROUP BY doc_id""",
    // the identical bigram tf/count tables and scalar tree (DuckDB lists
    // are 1-based: a[i], a[i+1] over i ∈ range(1, len) pairs neighbors)
    "docs_bigram_logprob" ->
      """WITH arr AS (
           SELECT doc_id,
                  list_filter(string_split(lower(text), ' '),
                    w -> len(w) > 0) AS a
           FROM documents),
         bg AS (
           SELECT doc_id, a[i] AS w1, a[i + 1] AS w2
           FROM arr, unnest(range(1, len(a))) AS t(i)
           WHERE len(a) >= 2),
         tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg
                GROUP BY doc_id, w1, w2),
         c2 AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c2 FROM tf
                GROUP BY w1, w2),
         c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1),
         vb AS (
           SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v
           FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
                 FROM documents) WHERE len(w) > 0)
         SELECT t.doc_id, CAST(sum(t.tf) AS BIGINT) AS n_bigrams,
                round(sum(t.tf * ln((c2.c2 + 1) / (c1.c1 + vb.v)))
                  / sum(t.tf), 4) AS avg_logprob
         FROM tf t JOIN c2 ON c2.w1 = t.w1 AND c2.w2 = t.w2
         JOIN c1 ON c1.w1 = t.w1 CROSS JOIN vb
         GROUP BY t.doc_id""",
    // the identical present-pairs-only JS decomposition and scalar tree
    "docs_js_divergence" ->
      """WITH tok AS (
           SELECT lang AS g, unnest(string_split(lower(text), ' ')) AS w
           FROM documents),
         tf AS (SELECT g, w, CAST(count(*) AS BIGINT) AS c FROM tok
                WHERE len(w) > 0 GROUP BY g, w),
         gw AS (SELECT w, CAST(sum(c) AS BIGINT) AS cg FROM tf GROUP BY w),
         gt AS (SELECT g, CAST(sum(c) AS BIGINT) AS ng FROM tf GROUP BY g),
         tot AS (SELECT CAST(sum(cg) AS DOUBLE) AS nn FROM gw),
         j AS (
           SELECT tf.g, gt.ng,
                  CAST(tf.c AS DOUBLE) / CAST(gt.ng AS DOUBLE) AS p,
                  CAST(gw.cg AS DOUBLE) / tot.nn AS q
           FROM tf JOIN gw USING (w) JOIN gt USING (g) CROSS JOIN tot)
         SELECT g AS lang, max(ng) AS n_tokens,
                round(ln(2.0) / 2.0 + sum((p * ln(2.0 * p / (p + q))
                  + q * ln(2.0 * q / (p + q)) - q * ln(2.0)) / 2.0), 4)
                  AS js_div
         FROM j GROUP BY g""",
    // the identical capped rank table and OLS scalar tree
    "docs_zipf_hapax" ->
      """WITH cnt AS (
           SELECT w, CAST(count(*) AS BIGINT) AS c
           FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
                 FROM documents)
           WHERE len(w) > 0 GROUP BY w),
         tot AS (
           SELECT CAST(count(*) AS BIGINT) AS vocab_size,
                  CAST(sum(c) AS BIGINT) AS n_tokens,
                  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_hapax
           FROM cnt),
         top AS (
           SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rk
           FROM cnt ORDER BY c DESC, w LIMIT 1000),
         xy AS (
           SELECT ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
           FROM top),
         fit AS (
           SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
                  sum(x * y) AS sxy, sum(x * x) AS sxx
           FROM xy)
         SELECT vocab_size, n_tokens, n_hapax,
                round(CAST(n_hapax AS DOUBLE) / vocab_size, 6) AS hapax_frac,
                round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
                  AS zipf_slope
         FROM tot CROSS JOIN fit""",
    // independent BPE-training replay (r18): 24 unrolled merge steps —
    // see bpeOracleCtes for the leftmost-scan fold the replay rides
    "docs_bpe_merges" -> {
      val union = (1 to 24)
        .map(k => s"SELECT step, l, r, pf FROM m$k")
        .mkString("\n           UNION ALL ")
      s"""WITH ${bpeOracleCtes(24, withFinalVocab = false)}
         SELECT CAST(step AS INT) AS step, l AS "left", r AS "right",
                pf AS freq
         FROM ($union) ORDER BY step"""
    },
    // the apply half: every word encoded by the same 24 merges in
    // priority order (v24 IS that encoding — training's final vocabulary
    // equals greedy inference with the learned table applied in learned
    // order, both being the identical leftmost scan per step), then
    // per-doc sums; end-markers excluded from the payload length exactly
    // as the engine counts them
    "docs_bpe_token_stats" ->
      s"""WITH ${bpeOracleCtes(24, withFinalVocab = true)},
         ws AS MATERIALIZED (
           SELECT w, CAST(len(syms) AS BIGINT) AS ns,
             CAST(list_sum(list_transform(syms,
               s -> len(s) - CASE WHEN ends_with(s, '</w>')
                             THEN 4 ELSE 0 END)) AS BIGINT) AS nc
           FROM v24),
         dw AS (
           SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  unnest(string_split(lower(coalesce(text, '')), ' ')) AS w
           FROM documents WHERE doc_id IS NOT NULL)
         SELECT d.doc_id,
                CAST(coalesce(sum(j.ns), 0) AS BIGINT) AS n_subwords,
                CAST(coalesce(sum(j.nc), 0) AS BIGINT) AS n_chars_encoded
         FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
               WHERE doc_id IS NOT NULL) d
         LEFT JOIN (SELECT dw.doc_id, ws.ns, ws.nc
                    FROM dw JOIN ws USING (w) WHERE len(dw.w) > 0) j
           USING (doc_id)
         GROUP BY 1""",
    // the unigram-logprob oracle wrapped in an exact front-loaded tertile:
    // cum boundaries ceil(n/3) / ceil(2n/3) match exactNtile's layout
    "docs_ppl_buckets" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
                      FROM documents),
         tf AS (SELECT doc_id, w, count(*) AS tf FROM tok
                WHERE len(w) > 0 GROUP BY doc_id, w),
         cnt AS (SELECT w, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY w),
         tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n_tok,
                        CAST(count(*) AS DOUBLE) AS v FROM cnt),
         scored AS (
           SELECT doc_id,
                  round(sum(tf * ln((c.c + 1) / (s.n_tok + s.v))) / sum(tf), 4)
                    AS avg_logprob
           FROM tf t JOIN cnt c USING (w) CROSS JOIN tot s
           GROUP BY doc_id),
         r AS (
           SELECT doc_id, avg_logprob,
                  row_number() OVER (ORDER BY avg_logprob DESC, doc_id) AS rk,
                  count(*) OVER () AS n
           FROM scored)
         SELECT doc_id, avg_logprob,
                CASE WHEN rk <= (n + 2) // 3 THEN 'head'
                     WHEN rk <= (2 * n + 2) // 3 THEN 'middle'
                     ELSE 'tail' END AS ppl_bucket
         FROM r""",
    // same hashed-bigram buckets, same add-one LLR frozen to integer
    // micro-nats, same exact int64 per-doc totals. ord() here is
    // DELIBERATELY code-point semantics — the engine's CharBigramBuckets
    // hashes codePointAt, NOT UTF-8 bytes (unlike the token-hash family,
    // which the r19 byte lift rewrote over encode()): do not "fix" this
    // to the hex-pair idiom
    "docs_dsir_weights" ->
      """WITH pos AS (
           SELECT doc_id, lang, text,
                  unnest(range(1, length(text))) AS i
           FROM documents WHERE length(text) >= 2),
         big AS (
           SELECT doc_id, lang = 'en' AS tgt,
                  (ord(substring(text, CAST(i AS INTEGER), 1)) * 131 +
                   ord(substring(text, CAST(i AS INTEGER) + 1, 1))) % 64 AS b
           FROM pos),
         pd AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS cnt
                FROM big GROUP BY doc_id, b),
         gl AS (SELECT b,
                       CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ctg,
                       CAST(count(*) AS BIGINT) AS cr
                FROM big GROUP BY b),
         tot AS (SELECT CAST(sum(ctg) AS BIGINT) AS tt,
                        CAST(sum(cr) AS BIGINT) AS tr FROM gl),
         lr AS (SELECT b,
                       CAST(floor(ln(CAST((ctg + 1) * (tr + 64) AS DOUBLE)
                         / CAST((cr + 1) * (tt + 64) AS DOUBLE))
                         * 1000000.0) AS BIGINT) AS lr_micro
                FROM gl CROSS JOIN tot)
         SELECT pd.doc_id, CAST(sum(pd.cnt) AS BIGINT) AS n_bigrams,
                CAST(sum(pd.cnt * lr.lr_micro) AS BIGINT) AS w_micro_nats,
                round(CAST(sum(pd.cnt * lr.lr_micro) AS DOUBLE)
                  / (1000000.0 * CAST(sum(pd.cnt) AS DOUBLE)), 6) AS avg_lognat
         FROM pd JOIN lr ON lr.b = pd.b
         GROUP BY pd.doc_id""",
    // identical BM25 expression (operand order included) on both engines,
    // scores rounded to 4 decimals BEFORE ranking, ties broken by doc_id —
    // serves both the one-shot and the TextIndex lifecycle query
    "docs_bm25_topk" -> bm25Oracle,
    "docs_bm25_indexed" -> bm25Oracle,
    "docs_boolean_search" ->
      """SELECT doc_id FROM documents
         WHERE list_contains(string_split(lower(text), ' '), 'spark')
           AND list_contains(string_split(lower(text), ' '), 'window')
           AND NOT list_contains(string_split(lower(text), ' '), 'slow')""",
    "docs_phrase_search" ->
      """SELECT doc_id FROM documents
         WHERE contains(' ' || lower(text) || ' ', ' spark window ')""",
    "events_traffic_spikes" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
           FROM events GROUP BY 1, 2),
         per_type AS (
           SELECT event_type, CAST(sum(cnt) AS BIGINT) AS total,
                  count(*) AS days
           FROM daily GROUP BY 1)
         SELECT d.event_type, d.day, d.cnt
         FROM daily d JOIN per_type p ON d.event_type = p.event_type
         WHERE d.cnt * p.days * 10 > 11 * p.total""",
    // quartiles as order statistics (rank floor((n-1)q)+1, no
    // interpolation); deci-cent multiplied-out fences — all integer
    "events_tukey_outliers" ->
      """WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
                  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_cents
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         r AS (SELECT *,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY total_cents) AS rn,
                      count(*) OVER (PARTITION BY event_type) AS n
               FROM hourly),
         q AS (SELECT event_type,
                      max(CASE WHEN rn = (n - 1) // 4 + 1
                               THEN total_cents END) AS q1,
                      max(CASE WHEN rn = ((n - 1) * 3) // 4 + 1
                               THEN total_cents END) AS q3
               FROM r GROUP BY 1)
         SELECT h.event_type, h.bucket_ts, h.total_cents,
                CASE WHEN 10 * h.total_cents
                          < 10 * q.q1 - 15 * (q.q3 - q.q1)
                     THEN 'low' ELSE 'high' END AS side
         FROM hourly h JOIN q USING (event_type)
         WHERE 10 * h.total_cents < 10 * q.q1 - 15 * (q.q3 - q.q1)
            OR 10 * h.total_cents > 10 * q.q3 + 15 * (q.q3 - q.q1)""",
    "fuzzy_part_names" ->
      """SELECT l.p_partkey AS key_a, r.p_partkey AS key_b,
                CAST(levenshtein(l.p_name, r.p_name) AS INT) AS edit_dist
         FROM part l, part r
         WHERE l.p_brand = r.p_brand AND l.p_type = r.p_type
           AND l.p_partkey < r.p_partkey
           AND levenshtein(l.p_name, r.p_name) <= 3""",
    "value_histogram" ->
      """SELECT CASE WHEN value < 0 THEN 0 WHEN value >= 100 THEN 21
                     ELSE CAST(floor(value / 5.0) AS BIGINT) + 1 END AS bucket,
                count(*) AS n
         FROM events GROUP BY bucket""",
    "user_funnel" ->
      """SELECT user_id,
                CAST(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
                               AND t2 IS NOT NULL AND t2 > t1 THEN 3
                          WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0 THEN 2
                          WHEN t0 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS funnel_level
         FROM (SELECT user_id,
                      min(CASE WHEN event_type = 'view' THEN ts END) AS t0,
                      min(CASE WHEN event_type = 'click' THEN ts END) AS t1,
                      min(CASE WHEN event_type = 'purchase' THEN ts END) AS t2
               FROM events GROUP BY user_id)""",
    // same integer-ceil target + smallest-value-reaching-it semantics as
    // Ranking.weightedPercentiles; the picked value is an EXISTING row
    // value (no interpolation), so doubles compare bit-exact
    "price_weighted_percentiles" ->
      """WITH w AS (SELECT l_extendedprice AS v, CAST(l_quantity AS BIGINT) AS wt
                    FROM lineitem
                    WHERE l_extendedprice IS NOT NULL AND CAST(l_quantity AS BIGINT) > 0),
         tot AS (SELECT sum(wt) AS tw FROM w),
         g AS (SELECT v, sum(wt) AS gw FROM w GROUP BY v),
         c AS (SELECT v, sum(gw) OVER (ORDER BY v) AS cum FROM g)
         SELECT CAST(p.pct AS BIGINT) AS pct,
                (SELECT min(c.v) FROM c, tot
                 WHERE c.cum >= (tot.tw * p.pct + 99) // 100) AS v
         FROM (VALUES (50), (90), (99)) AS p(pct)""",
    // same DP as the Spark side: start_i = best chain start of an i-chain
    // ending at the row (max over strictly-earlier starts, window-gated);
    // integer-microsecond arithmetic end-to-end so both engines agree
    "events_window_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsl, event_type AS op FROM events),
         s1 AS (SELECT *, CASE WHEN op = 'signup' THEN tsl END AS start1 FROM e),
         p1 AS (SELECT *, max(start1) OVER (PARTITION BY user_id ORDER BY tsl
                  RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev1 FROM s1),
         s2 AS (SELECT *, CASE WHEN op = 'click'
                  AND prev1 >= tsl - 21600000000 THEN prev1 END AS start2 FROM p1),
         p2 AS (SELECT *, max(start2) OVER (PARTITION BY user_id ORDER BY tsl
                  RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev2 FROM s2),
         s3 AS (SELECT *, CASE WHEN op = 'purchase'
                  AND prev2 >= tsl - 21600000000 THEN prev2 END AS start3 FROM p2)
         SELECT user_id,
                CAST(coalesce(max(CASE WHEN start3 IS NOT NULL THEN 3
                                       WHEN start2 IS NOT NULL THEN 2
                                       WHEN start1 IS NOT NULL THEN 1 END), 0)
                     AS BIGINT) AS funnel_level
         FROM s3 GROUP BY user_id""",
    "events_uniq_upto" ->
      """SELECT user_id,
                LEAST(count(DISTINCT event_type), 4) AS uniq_upto
         FROM events GROUP BY user_id""",
    "events_moving_avg" ->
      """SELECT user_id, event_id,
                round(avg(value) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS mov_avg
         FROM events""",
    "events_moving_sum" ->
      """SELECT user_id, event_id,
                round(sum(value) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS mov_sum
         FROM events""",
    "events_cond_aggs" ->
      """SELECT user_id,
                count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
                round(coalesce(sum(CASE WHEN event_type = 'purchase' THEN value END),
                  0.0), 4) AS sum_purchase,
                round(avg(CASE WHEN event_type = 'click' THEN value END), 4)
                  AS avg_click,
                min(CASE WHEN event_type = 'view' THEN value END) AS min_view,
                max(CASE WHEN event_type = 'view' THEN value END) AS max_view
         FROM events GROUP BY user_id""",
    "events_next_after_chain" ->
      """WITH o AS (SELECT user_id, ts, event_id, event_type,
                           lead(event_type, 1) OVER w AS l1,
                           lead(event_type, 2) OVER w AS l2
                    FROM events
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         h AS (SELECT user_id, l2,
                      row_number() OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS rn
               FROM o WHERE event_type = 'view' AND l1 = 'click'),
         u AS (SELECT DISTINCT user_id FROM events)
         SELECT u.user_id, h.l2 AS next_op
         FROM u LEFT JOIN h ON u.user_id = h.user_id AND h.rn = 1""",
    "events_running_total" ->
      """SELECT user_id, event_id,
                round(sum(value) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                  AS running_total
         FROM events""",
    "grouping_sets_revenue" ->
      """SELECT o_orderpriority AS priority, o_orderstatus AS status,
                count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DOUBLE) AS revenue
         FROM orders
         GROUP BY GROUPING SETS ((priority, status), (priority),
           (status), ())""",
    // steps the identical α·v + (1−α)·prev recurrence in the identical
    // (ts, event_id) order — bit-equal doubles by IEEE determinism
    "events_ema" ->
      """WITH RECURSIVE o AS (
           SELECT user_id, event_id, value,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS rn
           FROM events),
         r AS (
           SELECT user_id, event_id, value AS ema, rn FROM o WHERE rn = 1
           UNION ALL
           SELECT o.user_id, o.event_id, 0.5 * o.value + 0.5 * r.ema, o.rn
           FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1)
         SELECT user_id, event_id, ema FROM r""",
    // steps the identical num/den recurrence; pow(2, −whole-half-lives)
    // is an exact power of two on any engine, so the doubles match bits
    "events_ema_time" ->
      """WITH RECURSIVE o AS (
           SELECT user_id, event_id, value, epoch_us(ts) AS t,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS rn
           FROM events),
         r AS (
           SELECT user_id, event_id, rn, t,
                  value AS num, CAST(1.0 AS DOUBLE) AS den
           FROM o WHERE rn = 1
           UNION ALL
           SELECT o.user_id, o.event_id, o.rn, o.t,
                  o.value + r.num * pow(2.0, -CAST(least(
                    (o.t - r.t) // 3600000000, 2000) AS DOUBLE)),
                  1.0 + r.den * pow(2.0, -CAST(least(
                    (o.t - r.t) // 3600000000, 2000) AS DOUBLE))
           FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1)
         SELECT user_id, event_id, num / den AS ema_t FROM r""",
    "events_interval_union" ->
      """WITH s AS (
           SELECT user_id, epoch_us(ts) AS s,
                  epoch_us(ts) + greatest(
                    CAST(floor(value * 1000000.0) AS BIGINT), 0) AS e
           FROM events),
         m AS (
           SELECT user_id, s, e,
                  max(e) OVER (PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS prev_max
           FROM s),
         f AS (
           SELECT user_id, s, e,
                  CASE WHEN prev_max IS NULL OR s > prev_max
                       THEN 1 ELSE 0 END AS new_island
           FROM m),
         isl AS (
           SELECT user_id, s, e,
                  sum(new_island) OVER (PARTITION BY user_id
                    ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS island
           FROM f),
         per AS (
           SELECT user_id, island, max(e) - min(s) AS len
           FROM isl GROUP BY user_id, island)
         SELECT user_id, CAST(sum(len) AS BIGINT) AS covered_micros,
                count(*) AS n_islands
         FROM per GROUP BY user_id""",
    // steps the identical LTTB rule: same integer bucket split, same
    // exact-integer-sum averages, same area product of exactly-
    // representable differences, same earlier-point tie-break
    "events_lttb" ->
      """WITH RECURSIVE pts AS (
           SELECT event_type AS k, epoch_us(ts) AS x,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS y,
                  event_id AS eid,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY ts, event_id) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS len
           FROM events),
         mid AS (
           SELECT k, x, y, eid, rn, len,
                  CAST(((rn - 2) * 10) // (len - 2) AS BIGINT) AS b
           FROM pts WHERE rn > 1 AND rn < len AND len > 12),
         bavg AS (
           SELECT k, b, CAST(sum(x) AS DOUBLE) / count(*) AS ax,
                  CAST(sum(y) AS DOUBLE) / count(*) AS ay
           FROM mid GROUP BY k, b),
         lastp AS (SELECT k, x, y FROM pts WHERE rn = len),
         nxt AS (
           SELECT m.k, m.b, coalesce(ba.ax, CAST(lp.x AS DOUBLE)) AS xn,
                  coalesce(ba.ay, CAST(lp.y AS DOUBLE)) AS yn
           FROM (SELECT DISTINCT k, b FROM mid) m
           JOIN lastp lp ON lp.k = m.k
           LEFT JOIN bavg ba ON ba.k = m.k AND ba.b = m.b + 1),
         small AS (SELECT k, eid, x, y FROM pts WHERE len <= 12),
         r AS (
           SELECT k, CAST(-1 AS BIGINT) AS b, rn, x, y, eid
           FROM pts WHERE rn = 1 AND len > 12
           UNION ALL
           SELECT r.k, r.b + 1, c.rn, c.x, c.y, c.eid
           FROM r JOIN LATERAL (
             SELECT m.rn, m.x, m.y, m.eid
             FROM mid m JOIN nxt nx ON nx.k = r.k AND nx.b = r.b + 1
             WHERE m.k = r.k AND m.b = r.b + 1
             ORDER BY abs((CAST(r.x AS DOUBLE) - nx.xn) * CAST(m.y - r.y AS DOUBLE)
               - CAST(r.x - m.x AS DOUBLE) * (nx.yn - CAST(r.y AS DOUBLE))) DESC,
               m.rn ASC
             LIMIT 1) c ON true
           WHERE r.b + 1 <= 9)
         SELECT k AS event_type, eid AS event_id, x, y FROM r
         UNION ALL
         SELECT k, eid, x, y FROM pts WHERE rn = len AND len > 12
         UNION ALL
         SELECT k, eid, x, y FROM small""",
    "events_sampled" ->
      """SELECT event_type, count(*) AS sampled_rows,
                count(DISTINCT user_id) AS sampled_users
         FROM events
         WHERE (user_id * 1000003 + 7) % 97 < 10
         GROUP BY event_type""",
    "events_type_sets" ->
      """SELECT user_id,
                string_agg(DISTINCT event_type, ','
                  ORDER BY event_type) AS type_set
         FROM events GROUP BY user_id""",
    // mirrors the exact integer cent-moments and the identical scalar
    // expression trees — both t statistics are bit-deterministic from the
    // six int64 sums
    "events_ab_ttest" ->
      """WITH m AS (
           SELECT (epoch_us(ts) // 3600000000) % 24 AS bucket,
                  event_type = 'view' AS a, event_type = 'click' AS b,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
           FROM events WHERE event_type IN ('view', 'click')),
         g AS (
           SELECT bucket,
                  CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na,
                  CAST(sum(CASE WHEN a THEN y ELSE 0 END) AS BIGINT) AS s1a,
                  CAST(sum(CASE WHEN a THEN y * y ELSE 0 END) AS BIGINT) AS s2a,
                  CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS nb,
                  CAST(sum(CASE WHEN b THEN y ELSE 0 END) AS BIGINT) AS s1b,
                  CAST(sum(CASE WHEN b THEN y * y ELSE 0 END) AS BIGINT) AS s2b
           FROM m GROUP BY bucket
           HAVING na >= 2 AND nb >= 2),
         v AS (
           SELECT bucket, na, nb,
                  CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd,
                  CAST(s1a AS DOUBLE) / CAST(na AS DOUBLE) AS ma,
                  CAST(s1b AS DOUBLE) / CAST(nb AS DOUBLE) AS mb,
                  (CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE)
                     / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0) AS va,
                  (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE)
                     / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0) AS vb
           FROM g),
         w AS (
           SELECT bucket, na, nb, nad, nbd, ma, mb, va, vb,
                  va / nad AS vna, vb / nbd AS vnb
           FROM v),
         f AS (
           SELECT bucket, na, nb, nad, nbd, ma, mb, va, vb, vna, vnb,
                  vna + vnb AS se2,
                  ((nad - 1.0) * va + (nbd - 1.0) * vb) / (nad + nbd - 2.0) AS sp2
           FROM w)
         SELECT bucket, na, nb,
                round(ma / 100.0, 6) AS mean_a, round(mb / 100.0, 6) AS mean_b,
                round((ma - mb) / sqrt(se2), 6) AS welch_t,
                round(se2 * se2 / (vna * vna / (nad - 1.0)
                  + vnb * vnb / (nbd - 1.0)), 6) AS welch_df,
                round((ma - mb) / sqrt(sp2 * (1.0 / nad + 1.0 / nbd)), 6)
                  AS student_t,
                na + nb - 2 AS student_df
         FROM f WHERE se2 > 0 AND sp2 > 0""",
    // doubled average ranks at the (bucket, distinct cents) grain: rank
    // sum, U and the tie term are exact int64s; z from the same tree
    "events_mann_whitney" ->
      """WITH m AS (
           SELECT (epoch_us(ts) // 3600000000) % 24 AS bucket,
                  event_type = 'view' AS a, event_type = 'click' AS b,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
           FROM events WHERE event_type IN ('view', 'click')),
         pv AS (
           SELECT bucket, y,
                  CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                  CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS cb
           FROM m GROUP BY bucket, y),
         r AS (
           SELECT bucket, ca, cb, ca + cb AS cn,
                  2 * coalesce(sum(ca + cb) OVER (PARTITION BY bucket
                    ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) + (ca + cb) + 1 AS r2
           FROM pv),
         g AS (
           SELECT bucket, CAST(sum(ca) AS BIGINT) AS n1,
                  CAST(sum(cb) AS BIGINT) AS n2,
                  CAST(sum(ca * r2) AS BIGINT) AS r1x2,
                  CAST(sum(cn * cn * cn - cn) AS BIGINT) AS tsum
           FROM r GROUP BY bucket
           HAVING n1 >= 1 AND n2 >= 1),
         f AS (
           SELECT bucket, n1, n2,
                  CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
                  CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
                  CAST(tsum AS DOUBLE) AS tsumd
           FROM g),
         q AS (
           SELECT bucket, n1, n2, n1d, n2d, u1,
                  n1d * n2d / 12.0 * ((n1d + n2d + 1.0)
                    - tsumd / ((n1d + n2d) * (n1d + n2d - 1.0))) AS sigma2
           FROM f)
         SELECT bucket, n1, n2, u1,
                round((u1 - n1d * n2d / 2.0) / sqrt(sigma2), 6) AS z
         FROM q WHERE sigma2 > 0""",
    // integer 2x24-MA numerators on the dense grid; edge hours without a
    // full window drop via the frame-count check
    "events_seasonal_decompose" ->
      """WITH observed AS (
           SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1),
         bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM observed),
         spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
                     AS h FROM bounds),
         series AS (
           SELECT spine.h, coalesce(observed.x, 0) AS x
           FROM spine LEFT JOIN observed ON observed.h = spine.h),
         ma AS (
           SELECT h, x,
                  CAST(sum(x) OVER (ORDER BY h ROWS BETWEEN 12 PRECEDING
                    AND 11 FOLLOWING) AS BIGINT) AS na,
                  count(*) OVER (ORDER BY h ROWS BETWEEN 12 PRECEDING
                    AND 11 FOLLOWING) AS ca,
                  CAST(sum(x) OVER (ORDER BY h ROWS BETWEEN 11 PRECEDING
                    AND 12 FOLLOWING) AS BIGINT) AS nb,
                  count(*) OVER (ORDER BY h ROWS BETWEEN 11 PRECEDING
                    AND 12 FOLLOWING) AS cb
           FROM series),
         d AS (
           SELECT date_part('hour', h) AS hod, 48 * x - (na + nb) AS d48, x
           FROM ma WHERE ca = 24 AND cb = 24)
         SELECT CAST(hod AS BIGINT) AS hod,
                CAST(count(*) AS BIGINT) AS n_hours,
                round(CAST(sum(d48) AS DOUBLE)
                  / (48.0 * CAST(count(*) AS DOUBLE)), 6) AS seasonal,
                round(CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
                  AS raw_mean
         FROM d GROUP BY 1""",
    // same nested fixed-order chi2 fold as theilsU; the V/V+ scalar
    // trees mirror Spark's op order exactly
    "events_cramers_v" ->
      """WITH cells AS (
           SELECT event_type AS r, (epoch_us(ts) // 3600000000) % 24 AS c,
                  CAST(count(*) AS BIGINT) AS o
           FROM events GROUP BY 1, 2),
         ncx AS (SELECT CAST(count(DISTINCT c) AS BIGINT) AS nc FROM cells),
         st AS (
           SELECT r, c, o,
                  CAST(sum(o) OVER (PARTITION BY r) AS BIGINT) AS rm,
                  CAST(sum(o) OVER (PARTITION BY c) AS BIGINT) AS cm,
                  CAST(sum(o) OVER () AS BIGINT) AS nn
           FROM cells),
         pr AS (
           SELECT r, max(nn) AS nn, max(nc) AS nc,
                  arg_max(chi_cum, c) AS chir
           FROM (SELECT st.r, st.c, st.nn, ncx.nc,
                        sum((CAST(o AS DOUBLE) - CAST(rm AS DOUBLE)
                               * CAST(cm AS DOUBLE) / CAST(nn AS DOUBLE))
                            * (CAST(o AS DOUBLE) - CAST(rm AS DOUBLE)
                               * CAST(cm AS DOUBLE) / CAST(nn AS DOUBLE))
                            / (CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE)
                               / CAST(nn AS DOUBLE)))
                          OVER (PARTITION BY st.r ORDER BY st.c
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS chi_cum
                 FROM st CROSS JOIN ncx)
           GROUP BY r),
         f AS (
           SELECT max(nn) AS n, CAST(count(*) AS BIGINT) AS nr,
                  max(nc) AS ncl, arg_max(cum, r) AS chi2
           FROM (SELECT r, nn, nc,
                        sum(chir) OVER (ORDER BY r ROWS BETWEEN UNBOUNDED
                          PRECEDING AND CURRENT ROW) AS cum
                 FROM pr)
           HAVING nr >= 2 AND ncl >= 2),
         g AS (
           SELECT n, nr, ncl, chi2, CAST(n AS DOUBLE) AS nd,
                  CAST(nr AS DOUBLE) AS rd, CAST(ncl AS DOUBLE) AS cd
           FROM f)
         SELECT n, nr AS r_levels, ncl AS c_levels,
                round(chi2, 6) AS chi2,
                round(sqrt(chi2 / (nd * (least(rd, cd) - 1.0))), 6) AS v,
                round(sqrt(greatest(0.0, chi2 / nd
                      - (rd - 1.0) * (cd - 1.0) / (nd - 1.0))
                    / (least(rd - (rd - 1.0) * (rd - 1.0) / (nd - 1.0),
                             cd - (cd - 1.0) * (cd - 1.0) / (nd - 1.0))
                       - 1.0)), 6) AS v_corrected
         FROM g""",
    // the same nested fixed-order fold as cramersV, with the G term
    // o·ln(o·N/(rm·cm)) in place of the χ² deviation term
    "events_gtest" ->
      """WITH cells AS (
           SELECT event_type AS r, (epoch_us(ts) // 3600000000) % 24 AS c,
                  CAST(count(*) AS BIGINT) AS o
           FROM events GROUP BY 1, 2),
         ncx AS (SELECT CAST(count(DISTINCT c) AS BIGINT) AS nc FROM cells),
         st AS (
           SELECT r, c, o,
                  CAST(sum(o) OVER (PARTITION BY r) AS BIGINT) AS rm,
                  CAST(sum(o) OVER (PARTITION BY c) AS BIGINT) AS cm,
                  CAST(sum(o) OVER () AS BIGINT) AS nn
           FROM cells),
         pr AS (
           SELECT r, max(nn) AS nn, max(nc) AS nc,
                  arg_max(g_cum, c) AS gr
           FROM (SELECT st.r, st.c, st.nn, ncx.nc,
                        sum(CAST(o AS DOUBLE)
                            * ln(CAST(o AS DOUBLE) * CAST(nn AS DOUBLE)
                                 / (CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE))))
                          OVER (PARTITION BY st.r ORDER BY st.c
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS g_cum
                 FROM st CROSS JOIN ncx)
           GROUP BY r),
         f AS (
           SELECT max(nn) AS n, CAST(count(*) AS BIGINT) AS nr,
                  max(nc) AS ncl, arg_max(cum, r) AS gsum
           FROM (SELECT r, nn, nc,
                        sum(gr) OVER (ORDER BY r ROWS BETWEEN UNBOUNDED
                          PRECEDING AND CURRENT ROW) AS cum
                 FROM pr)
           HAVING nr >= 2 AND ncl >= 2)
         SELECT n, nr AS r_levels, ncl AS c_levels,
                (nr - 1) * (ncl - 1) AS dof,
                round(2.0 * gsum, 6) AS g_stat
         FROM f""",
    // the identical integer accumulate-until-threshold pick at the
    // (group, distinct value) grain
    "events_weighted_quantiles" ->
      """WITH m AS (
           SELECT event_type AS g,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
                  (user_id % 7) + 1 AS w
           FROM events WHERE value IS NOT NULL),
         gv AS (SELECT g, v, CAST(sum(w) AS BIGINT) AS w
                FROM m WHERE w > 0 GROUP BY g, v),
         c AS (SELECT g, v, w,
                      CAST(sum(w) OVER (PARTITION BY g ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cumw,
                      CAST(sum(w) OVER (PARTITION BY g) AS BIGINT) AS tw
               FROM gv),
         q AS (SELECT * FROM (VALUES (250), (500), (750), (900), (990))
                 AS t(q_permille))
         SELECT g, CAST(q_permille AS BIGINT) AS q_permille, v AS v_cents
         FROM c CROSS JOIN q
         WHERE cumw * 1000 >= q_permille * tw
           AND (cumw - w) * 1000 < q_permille * tw""",
    // the identical day-grain spine, exact pair sums per lag, and the
    // identical rho/Q scalar trees (fixed-denominator ACF convention)
    "events_ljung_box" ->
      """WITH observed AS (
           SELECT date_trunc('day', ts) AS dy, CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1),
         bounds AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM observed),
         spine AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))
                     AS dy FROM bounds),
         series AS (
           SELECT spine.dy, coalesce(observed.x, 0) AS x
           FROM spine LEFT JOIN observed ON observed.dy = spine.dy),
         lagged AS (
           SELECT x,
                  lag(x, 1) OVER (ORDER BY dy) AS l1,
                  lag(x, 2) OVER (ORDER BY dy) AS l2,
                  lag(x, 3) OVER (ORDER BY dy) AS l3,
                  lag(x, 4) OVER (ORDER BY dy) AS l4,
                  lag(x, 5) OVER (ORDER BY dy) AS l5,
                  lag(x, 6) OVER (ORDER BY dy) AS l6,
                  lag(x, 7) OVER (ORDER BY dy) AS l7
           FROM series),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
                  CAST(sum(x * x) AS BIGINT) AS sxx,
                  CAST(count(l1) AS BIGINT) AS m1,
                  CAST(sum(CASE WHEN l1 IS NOT NULL THEN x END) AS BIGINT) AS sx1,
                  CAST(sum(l1) AS BIGINT) AS sy1,
                  CAST(sum(x * l1) AS BIGINT) AS sxy1,
                  CAST(count(l2) AS BIGINT) AS m2,
                  CAST(sum(CASE WHEN l2 IS NOT NULL THEN x END) AS BIGINT) AS sx2,
                  CAST(sum(l2) AS BIGINT) AS sy2,
                  CAST(sum(x * l2) AS BIGINT) AS sxy2,
                  CAST(count(l3) AS BIGINT) AS m3,
                  CAST(sum(CASE WHEN l3 IS NOT NULL THEN x END) AS BIGINT) AS sx3,
                  CAST(sum(l3) AS BIGINT) AS sy3,
                  CAST(sum(x * l3) AS BIGINT) AS sxy3,
                  CAST(count(l4) AS BIGINT) AS m4,
                  CAST(sum(CASE WHEN l4 IS NOT NULL THEN x END) AS BIGINT) AS sx4,
                  CAST(sum(l4) AS BIGINT) AS sy4,
                  CAST(sum(x * l4) AS BIGINT) AS sxy4,
                  CAST(count(l5) AS BIGINT) AS m5,
                  CAST(sum(CASE WHEN l5 IS NOT NULL THEN x END) AS BIGINT) AS sx5,
                  CAST(sum(l5) AS BIGINT) AS sy5,
                  CAST(sum(x * l5) AS BIGINT) AS sxy5,
                  CAST(count(l6) AS BIGINT) AS m6,
                  CAST(sum(CASE WHEN l6 IS NOT NULL THEN x END) AS BIGINT) AS sx6,
                  CAST(sum(l6) AS BIGINT) AS sy6,
                  CAST(sum(x * l6) AS BIGINT) AS sxy6,
                  CAST(count(l7) AS BIGINT) AS m7,
                  CAST(sum(CASE WHEN l7 IS NOT NULL THEN x END) AS BIGINT) AS sx7,
                  CAST(sum(l7) AS BIGINT) AS sy7,
                  CAST(sum(x * l7) AS BIGINT) AS sxy7
           FROM lagged
           HAVING count(*) >= 9),
         f AS (
           SELECT *, CAST(n AS DOUBLE) AS nd,
                  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xb
           FROM m),
         r AS (
           SELECT nd, n,
             (CAST(sxy1 AS DOUBLE) - xb * (CAST(sx1 AS DOUBLE) + CAST(sy1 AS DOUBLE)) + CAST(m1 AS DOUBLE) * xb * xb) / (CAST(sxx AS DOUBLE) - nd * xb * xb) AS r1,
             (CAST(sxy2 AS DOUBLE) - xb * (CAST(sx2 AS DOUBLE) + CAST(sy2 AS DOUBLE)) + CAST(m2 AS DOUBLE) * xb * xb) / (CAST(sxx AS DOUBLE) - nd * xb * xb) AS r2,
             (CAST(sxy3 AS DOUBLE) - xb * (CAST(sx3 AS DOUBLE) + CAST(sy3 AS DOUBLE)) + CAST(m3 AS DOUBLE) * xb * xb) / (CAST(sxx AS DOUBLE) - nd * xb * xb) AS r3,
             (CAST(sxy4 AS DOUBLE) - xb * (CAST(sx4 AS DOUBLE) + CAST(sy4 AS DOUBLE)) + CAST(m4 AS DOUBLE) * xb * xb) / (CAST(sxx AS DOUBLE) - nd * xb * xb) AS r4,
             (CAST(sxy5 AS DOUBLE) - xb * (CAST(sx5 AS DOUBLE) + CAST(sy5 AS DOUBLE)) + CAST(m5 AS DOUBLE) * xb * xb) / (CAST(sxx AS DOUBLE) - nd * xb * xb) AS r5,
             (CAST(sxy6 AS DOUBLE) - xb * (CAST(sx6 AS DOUBLE) + CAST(sy6 AS DOUBLE)) + CAST(m6 AS DOUBLE) * xb * xb) / (CAST(sxx AS DOUBLE) - nd * xb * xb) AS r6,
             (CAST(sxy7 AS DOUBLE) - xb * (CAST(sx7 AS DOUBLE) + CAST(sy7 AS DOUBLE)) + CAST(m7 AS DOUBLE) * xb * xb) / (CAST(sxx AS DOUBLE) - nd * xb * xb) AS r7
           FROM f
           WHERE CAST(sxx AS DOUBLE) - nd * xb * xb > 0.0)
         SELECT CAST(1 AS BIGINT) AS lag, n, round(r1, 6) AS rho,
                round(nd * (nd + 2.0) * (r1 * r1 / (nd - 1.0)), 6) AS q_cum FROM r
         UNION ALL SELECT 2, n, round(r2, 6),
                round(nd * (nd + 2.0) * (r1 * r1 / (nd - 1.0) + r2 * r2 / (nd - 2.0)), 6) FROM r
         UNION ALL SELECT 3, n, round(r3, 6),
                round(nd * (nd + 2.0) * (r1 * r1 / (nd - 1.0) + r2 * r2 / (nd - 2.0) + r3 * r3 / (nd - 3.0)), 6) FROM r
         UNION ALL SELECT 4, n, round(r4, 6),
                round(nd * (nd + 2.0) * (r1 * r1 / (nd - 1.0) + r2 * r2 / (nd - 2.0) + r3 * r3 / (nd - 3.0) + r4 * r4 / (nd - 4.0)), 6) FROM r
         UNION ALL SELECT 5, n, round(r5, 6),
                round(nd * (nd + 2.0) * (r1 * r1 / (nd - 1.0) + r2 * r2 / (nd - 2.0) + r3 * r3 / (nd - 3.0) + r4 * r4 / (nd - 4.0) + r5 * r5 / (nd - 5.0)), 6) FROM r
         UNION ALL SELECT 6, n, round(r6, 6),
                round(nd * (nd + 2.0) * (r1 * r1 / (nd - 1.0) + r2 * r2 / (nd - 2.0) + r3 * r3 / (nd - 3.0) + r4 * r4 / (nd - 4.0) + r5 * r5 / (nd - 5.0) + r6 * r6 / (nd - 6.0)), 6) FROM r
         UNION ALL SELECT 7, n, round(r7, 6),
                round(nd * (nd + 2.0) * (r1 * r1 / (nd - 1.0) + r2 * r2 / (nd - 2.0) + r3 * r3 / (nd - 3.0) + r4 * r4 / (nd - 4.0) + r5 * r5 / (nd - 5.0) + r6 * r6 / (nd - 6.0) + r7 * r7 / (nd - 7.0)), 6) FROM r""",
    // identical exact counts/unit-distincts, the fixed 30-day exposure,
    // the Wald rate z and the pinned A&S p tree
    "events_rate_test" ->
      """WITH m AS (
           SELECT event_type AS bucket, user_id % 2 = 0 AS a, user_id AS u
           FROM events),
         g AS (SELECT bucket,
                      CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT)
                        AS ka,
                      CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT)
                        AS kb,
                      CAST(count(DISTINCT CASE WHEN a THEN u END)
                        AS BIGINT) AS ua,
                      CAST(count(DISTINCT CASE WHEN NOT a THEN u END)
                        AS BIGINT) AS ub
               FROM m GROUP BY 1
               HAVING ua >= 1 AND ub >= 1 AND ka + kb > 0),
         f AS (SELECT bucket, ka, kb, ua, ub,
                      CAST(ua AS DOUBLE) * 30.0 AS ta,
                      CAST(ub AS DOUBLE) * 30.0 AS tb
               FROM g),
         w AS (SELECT bucket, ka, kb, ua, ub, ta, tb,
                      (CAST(ka AS DOUBLE) / ta - CAST(kb AS DOUBLE) / tb)
                        / sqrt(CAST(ka AS DOUBLE) / (ta * ta)
                               + CAST(kb AS DOUBLE) / (tb * tb)) AS z
               FROM f)
         SELECT bucket, ka AS n_a, kb AS n_b, ua AS units_a, ub AS units_b,
                round(CAST(ka AS DOUBLE) / ta, 6) AS rate_a,
                round(CAST(kb AS DOUBLE) / tb, 6) AS rate_b,
                round(z, 6) AS z,
                round(2.0 * (exp(abs(z) * abs(z) * -0.5)
                             * 0.3989422804014327)
                      * ((1.0 / (1.0 + 0.2316419 * abs(z)))
                         * (0.319381530 + (1.0 / (1.0 + 0.2316419 * abs(z)))
                            * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * abs(z)))
                               * (1.781477937 + (1.0 / (1.0 + 0.2316419 * abs(z)))
                                  * (-1.821255978 + (1.0 / (1.0 + 0.2316419 * abs(z)))
                                     * 1.330274429))))), 6) AS p
         FROM w""",
    // identical raw-split positions (0-based here, 1-based there: pos-1),
    // complete-segment filter, exact distinct counts
    "docs_msttr" ->
      """WITH tok AS (
           SELECT doc_id AS doc, source,
                  unnest(string_split(lower(text), ' ')) AS w,
                  generate_subscripts(string_split(lower(text), ' '), 1)
                    AS pos
           FROM documents),
         seg AS (SELECT doc, source, (pos - 1) // 50 AS seg,
                        CAST(count(*) AS BIGINT) AS n_tok,
                        CAST(count(DISTINCT w) AS BIGINT) AS types
                 FROM tok WHERE w <> '' GROUP BY 1, 2, 3
                 HAVING count(*) = 50)
         SELECT source, CAST(count(*) AS BIGINT) AS n_segments,
                round(CAST(sum(types) AS DOUBLE)
                  / (CAST(count(*) AS DOUBLE) * 50.0), 6) AS msttr
         FROM seg GROUP BY 1""",
    // the identical consecutive-purchase lead over (custkey, orderdate,
    // lineitem id) and row-normalized transition counts
    "customer_brand_markov" ->
      """WITH purchases AS (
           SELECT o_custkey AS k, p_brand AS op, o_orderdate AS ts,
                  l_orderkey, l_linenumber, l_partkey, l_suppkey
           FROM orders
           JOIN lineitem ON l_orderkey = o_orderkey
           JOIN part ON p_partkey = l_partkey),
         seq AS (SELECT op AS from_op,
                        lead(op) OVER (PARTITION BY k
                          ORDER BY ts, l_orderkey, l_linenumber,
                            l_partkey, l_suppkey) AS to_op
                 FROM purchases),
         pairs AS (SELECT from_op, to_op, CAST(count(*) AS BIGINT) AS n
                   FROM seq WHERE to_op IS NOT NULL GROUP BY 1, 2)
         SELECT from_op, to_op, n,
                CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_op)
                  AS DOUBLE) AS p
         FROM pairs""",
    // the identical dense day spine and the exact lower-median pick
    // (1-based element (len+1)//2 of the sorted trailing window)
    "events_rolling_median" ->
      """WITH observed AS (
           SELECT date_trunc('day', ts) AS dy, CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1),
         bounds AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM observed),
         spine AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))
                     AS dy FROM bounds),
         series AS (SELECT spine.dy, coalesce(observed.x, 0) AS x
                    FROM spine LEFT JOIN observed ON observed.dy = spine.dy),
         win AS (SELECT dy,
                        list_sort(list(x) OVER (ORDER BY dy ROWS BETWEEN
                          6 PRECEDING AND CURRENT ROW)) AS w
                 FROM series)
         SELECT dy AS day, CAST(len(w) AS BIGINT) AS n_days,
                CAST(w[CAST((len(w) + 1) // 2 AS BIGINT)] AS BIGINT)
                  AS median_count
         FROM win""",
    // exact counts; the Wilson trees mirror Spark's op order
    "brand_return_rate" ->
      """WITH m AS (
           SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS returns
           FROM lineitem JOIN part ON p_partkey = l_partkey
           GROUP BY 1),
         f AS (SELECT p_brand, n, returns, CAST(n AS DOUBLE) AS nd,
                      CAST(returns AS DOUBLE) / CAST(n AS DOUBLE) AS p,
                      1.959963984540054 * 1.959963984540054 AS z2
               FROM m)
         SELECT p_brand, n, returns, round(p, 6) AS return_rate,
                round((p + z2 / (2.0 * nd)
                       - 1.959963984540054
                         * sqrt(p * (1.0 - p) / nd + z2 / (4.0 * nd * nd)))
                      / (1.0 + z2 / nd), 6) AS wilson_lo,
                round((p + z2 / (2.0 * nd)
                       + 1.959963984540054
                         * sqrt(p * (1.0 - p) / nd + z2 / (4.0 * nd * nd)))
                      / (1.0 + z2 / nd), 6) AS wilson_hi
         FROM f""",
    // the identical Mersenne-prime mix (HUGEINT mirror of the decimal
    // lane), identical Poisson thresholds, identical order-statistic pick
    "events_bootstrap_ci" ->
      """WITH pu AS (
           SELECT event_type AS g, user_id AS u,
                  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS x
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         reps AS (SELECT g, u, x, r.range AS rep
                  FROM pu CROSS JOIN range(200) r),
         k1 AS (SELECT g, rep, x,
                  (CAST(u * 200 + rep AS HUGEINT) * 1203983748297848573
                     + 1111111111111111111) % 2305843009213693951 AS z1
                FROM reps),
         k2 AS (SELECT g, rep, x,
                  (z1 * z1 + 555555555555555555) % 2305843009213693951 AS z2
                FROM k1),
         k3 AS (SELECT g, rep, x,
                  (z2 * 989812716073141251) % 2305843009213693951 AS z3
                FROM k2),
         uu AS (SELECT g, rep, x,
                  CAST((z3 - z3 % 256) // 256 AS DOUBLE)
                    / 9007199254740992.0 AS uv
                FROM k3),
         ww AS (SELECT g, rep, x,
                  CASE WHEN uv < 0.36787944117144233 THEN 0
                       WHEN uv < 0.7357588823428847 THEN 1
                       WHEN uv < 0.9196986029286058 THEN 2
                       WHEN uv < 0.9810118431238463 THEN 3
                       WHEN uv < 0.9963401531726563 THEN 4
                       WHEN uv < 0.9994058151824183 THEN 5
                       WHEN uv < 0.999916758850712 THEN 6
                       ELSE 7 END AS w
                FROM uu),
         mm AS (SELECT g, rep, CAST(sum(w) AS BIGINT) AS sw,
                       CAST(sum(w * x) AS BIGINT) AS swx
                FROM ww GROUP BY 1, 2 HAVING sum(w) > 0),
         ms AS (SELECT g, rep,
                       CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE) AS m
                FROM mm),
         rr AS (SELECT g, m,
                       row_number() OVER (PARTITION BY g ORDER BY m, rep)
                         AS rn
                FROM ms),
         ci AS (SELECT g, min(CASE WHEN rn = 6 THEN m END) AS lo,
                       min(CASE WHEN rn = 195 THEN m END) AS hi
                FROM rr GROUP BY g),
         obs AS (SELECT g, CAST(count(*) AS BIGINT) AS n_units,
                        CAST(sum(x) AS BIGINT) AS sx
                 FROM pu GROUP BY g)
         SELECT obs.g, n_units,
                round(CAST(sx AS DOUBLE) / CAST(n_units AS DOUBLE)
                  / 100.0, 6) AS mean,
                round(lo / 100.0, 6) AS ci_lo,
                round(hi / 100.0, 6) AS ci_hi
         FROM obs JOIN ci ON ci.g = obs.g""",
    // the identical ten exact moments and Cramer's-rule scalar trees
    "events_multi_linreg" ->
      """WITH m AS (
           SELECT event_type AS g,
                  (epoch_us(ts) // 3600000000) % 24 AS a,
                  (epoch_us(ts) // 86400000000) % 7 AS b,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
           FROM events WHERE value IS NOT NULL),
         s AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(a) AS BIGINT) AS s1, CAST(sum(b) AS BIGINT) AS s2,
                  CAST(sum(y) AS BIGINT) AS sy,
                  CAST(sum(a * a) AS BIGINT) AS s11,
                  CAST(sum(a * b) AS BIGINT) AS s12,
                  CAST(sum(b * b) AS BIGINT) AS s22,
                  CAST(sum(a * y) AS BIGINT) AS s1y,
                  CAST(sum(b * y) AS BIGINT) AS s2y,
                  CAST(sum(y * y) AS BIGINT) AS syy
           FROM m GROUP BY g HAVING count(*) >= 4),
         f AS (
           SELECT g, n, CAST(n AS DOUBLE) AS nd,
                  CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
                  CAST(sy AS DOUBLE) AS sy, CAST(s11 AS DOUBLE) AS s11,
                  CAST(s12 AS DOUBLE) AS s12, CAST(s22 AS DOUBLE) AS s22,
                  CAST(s1y AS DOUBLE) AS s1y, CAST(s2y AS DOUBLE) AS s2y,
                  CAST(syy AS DOUBLE) AS syy
           FROM s),
         dets AS (
           SELECT g, n, nd, sy, s1y, s2y, syy,
                  nd * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
                    + s2 * (s1 * s12 - s11 * s2) AS det,
                  sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
                    + s2 * (s1y * s12 - s11 * s2y) AS det0,
                  nd * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
                    + s2 * (s1 * s2y - s1y * s2) AS det1,
                  nd * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
                    + sy * (s1 * s12 - s11 * s2) AS det2
           FROM f WHERE nd * (s11 * s22 - s12 * s12)
                    - s1 * (s1 * s22 - s12 * s2)
                    + s2 * (s1 * s12 - s11 * s2) <> 0.0),
         b AS (
           SELECT g, n, sy, s1y, s2y, syy, nd,
                  det0 / det AS b0, det1 / det AS b1, det2 / det AS b2
           FROM dets)
         SELECT g, n, round(b0 / 100.0, 6) AS b0, round(b1 / 100.0, 6) AS b1,
                round(b2 / 100.0, 6) AS b2,
                CASE WHEN syy - sy * sy / nd > 0.0
                  THEN round(1.0 - (syy - (b0 * sy + b1 * s1y + b2 * s2y))
                             / (syy - sy * sy / nd), 6) END AS r2
         FROM b""",
    // same nested fixed-order entropy folds (per-r over c, then over r);
    // natural log; u computed from the unrounded entropies
    "events_theils_u" ->
      """WITH cells AS (
           SELECT event_type AS r, (epoch_us(ts) // 3600000000) % 24 AS c,
                  CAST(count(*) AS BIGINT) AS o
           FROM events GROUP BY 1, 2),
         st AS (
           SELECT r, c, o,
                  CAST(sum(o) OVER (PARTITION BY c) AS BIGINT) AS cm,
                  CAST(sum(o) OVER () AS BIGINT) AS nn
           FROM cells),
         pr AS (
           SELECT r, max(nn) AS nn, arg_max(hr_cum, c) AS hr
           FROM (SELECT r, c, nn,
                        sum((CAST(o AS DOUBLE) / CAST(nn AS DOUBLE))
                            * ln(CAST(o AS DOUBLE) / CAST(cm AS DOUBLE)))
                          OVER (PARTITION BY r ORDER BY c
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS hr_cum
                 FROM st)
           GROUP BY r),
         hxy AS (
           SELECT max(nn) AS n, arg_max(hxy_cum, r) AS neg_hxy
           FROM (SELECT r, nn,
                        sum(hr) OVER (ORDER BY r ROWS BETWEEN UNBOUNDED
                          PRECEDING AND CURRENT ROW) AS hxy_cum
                 FROM pr)),
         rm AS (
           SELECT r, CAST(sum(o) AS BIGINT) AS rm FROM cells GROUP BY r),
         rm2 AS (
           SELECT r, rm, CAST(sum(rm) OVER () AS BIGINT) AS nn FROM rm),
         hx AS (
           SELECT arg_max(hx_cum, r) AS neg_hx
           FROM (SELECT r,
                        sum((CAST(rm AS DOUBLE) / CAST(nn AS DOUBLE))
                            * ln(CAST(rm AS DOUBLE) / CAST(nn AS DOUBLE)))
                          OVER (ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS hx_cum
                 FROM rm2)),
         f AS (
           SELECT n, 0.0 - neg_hx AS h_x, 0.0 - neg_hxy AS h_x_given_y
           FROM hxy CROSS JOIN hx)
         SELECT n, round(h_x, 6) AS h_x,
                round(h_x_given_y, 6) AS h_x_given_y,
                round((h_x - h_x_given_y) / h_x, 6) AS theils_u
         FROM f WHERE h_x > 0.0""",
    "events_contingency" ->
      """WITH cells AS (
           SELECT event_type AS r, (epoch_us(ts) // 3600000000) % 24 AS c,
                  CAST(count(*) AS BIGINT) AS observed
           FROM events GROUP BY 1, 2),
         rt AS (SELECT r, CAST(sum(observed) AS BIGINT) AS rt
                FROM cells GROUP BY r),
         ct AS (SELECT c, CAST(sum(observed) AS BIGINT) AS ct
                FROM cells GROUP BY c),
         n AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM cells),
         j AS (
           SELECT cells.r, cells.c, cells.observed,
                  CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)
                    / CAST(n.n AS DOUBLE) AS e
           FROM cells JOIN rt ON rt.r = cells.r
           JOIN ct ON ct.c = cells.c CROSS JOIN n)
         SELECT r, c, observed, round(e, 6) AS expected,
                round((CAST(observed AS DOUBLE) - e)
                  * (CAST(observed AS DOUBLE) - e) / e, 6) AS chi2_term
         FROM j""",
    // the identical integer gap-max at distinct-value grain + the same
    // fixed 3-term Kolmogorov series scalar tree
    "events_ks_test" ->
      """WITH m AS (
           SELECT (epoch_us(ts) // 86400000000) % 31 AS bucket,
                  event_type = 'view' AS a, event_type = 'click' AS b,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
           FROM events WHERE event_type IN ('view', 'click')),
         pv AS (
           SELECT bucket, y,
                  CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                  CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS cb
           FROM m GROUP BY bucket, y),
         tot AS (
           SELECT bucket, CAST(sum(ca) AS BIGINT) AS n1,
                  CAST(sum(cb) AS BIGINT) AS n2
           FROM pv GROUP BY bucket
           HAVING n1 >= 1 AND n2 >= 1),
         cum AS (
           SELECT bucket, y,
                  sum(ca) OVER (PARTITION BY bucket ORDER BY y
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
                  sum(cb) OVER (PARTITION BY bucket ORDER BY y
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
           FROM pv),
         g AS (
           SELECT cum.bucket, max(tot.n1) AS n1, max(tot.n2) AS n2,
                  max(abs(cum.cuma * tot.n2 - cum.cumb * tot.n1)) AS maxgap
           FROM cum JOIN tot ON tot.bucket = cum.bucket
           GROUP BY cum.bucket),
         f AS (
           SELECT bucket, n1, n2, CAST(n1 AS DOUBLE) AS n1d,
                  CAST(n2 AS DOUBLE) AS n2d,
                  CAST(maxgap AS DOUBLE)
                    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS dd
           FROM g),
         l AS (
           SELECT bucket, n1, n2, dd,
                  sqrt(n1d * n2d / (n1d + n2d)) * dd AS lam
           FROM f),
         l2 AS (SELECT bucket, n1, n2, dd, lam * lam AS lam2 FROM l)
         SELECT bucket, n1, n2, round(dd, 6) AS ks_d,
                round(least(1.0, greatest(0.0,
                  2.0 * (exp(-2.0 * lam2) - exp(-8.0 * lam2)
                    + exp(-18.0 * lam2)))), 6) AS p_asymp
         FROM l2""",
    // the identical doubled-average-rank maps joined back per row, then
    // the same exact five-moment scalar tree
    "events_rank_corr" ->
      """WITH base AS (
           SELECT event_type AS bucket,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS x,
                  epoch_us(ts) AS y
           FROM events),
         rx AS (
           SELECT bucket, x,
                  2 * coalesce(sum(count(*)) OVER (PARTITION BY bucket
                    ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) + count(*) + 1 AS r2x
           FROM base GROUP BY bucket, x),
         ry AS (
           SELECT bucket, y,
                  2 * coalesce(sum(count(*)) OVER (PARTITION BY bucket
                    ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) + count(*) + 1 AS r2y
           FROM base GROUP BY bucket, y),
         j AS (
           SELECT base.bucket, base.x, base.y, rx.r2x, ry.r2y
           FROM base JOIN rx ON rx.bucket = base.bucket AND rx.x = base.x
           JOIN ry ON ry.bucket = base.bucket AND ry.y = base.y),
         g AS (
           SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(r2x) AS BIGINT) AS sx,
                  CAST(sum(r2y) AS BIGINT) AS sy,
                  CAST(sum(r2x * r2y) AS BIGINT) AS sxy,
                  CAST(sum(r2x * r2x) AS BIGINT) AS sxx,
                  CAST(sum(r2y * r2y) AS BIGINT) AS syy
           FROM j GROUP BY bucket
           HAVING count(*) >= 2 AND min(x) <> max(x) AND min(y) <> max(y)),
         f AS (
           SELECT bucket, n,
                  CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
                  CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
                  CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
           FROM g)
         SELECT bucket, n, round(cov / sqrt(vx * vy), 6) AS rho
         FROM f""",
    // the identical five exact integer moments and coefficient tree
    "events_linreg" ->
      """WITH m AS (
           SELECT event_type AS bucket,
                  epoch_us(ts) // 3600000000 AS x,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
           FROM events),
         g AS (
           SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                  CAST(sum(x * y) AS BIGINT) AS sxy,
                  CAST(sum(x * x) AS BIGINT) AS sxx,
                  CAST(sum(y * y) AS BIGINT) AS syy,
                  min(x) AS xmin, max(x) AS xmax,
                  min(y) AS ymin, max(y) AS ymax
           FROM m GROUP BY bucket
           HAVING count(*) >= 2 AND min(x) <> max(x)),
         f AS (
           SELECT bucket, n, ymin, ymax,
                  CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
                  CAST(sy AS DOUBLE) AS syd,
                  CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
                  CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
                  CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
           FROM g),
         s AS (SELECT bucket, n, ymin, ymax, cov, vx, vy, syd, sxd, nd,
                      cov / vx AS slope FROM f)
         SELECT bucket, n, round(slope / 100.0, 6) AS slope,
                round(((syd - slope * sxd) / nd) / 100.0, 6) AS intercept,
                CASE WHEN ymin <> ymax
                  THEN round(cov * cov / (vx * vy), 6) END AS r2
         FROM s""",
    // the identical composite-ordered extremes
    "events_arg_extremes" ->
      """WITH m AS (
           SELECT event_type, epoch_us(ts) AS tm, event_id,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events),
         r AS (
           SELECT event_type, cents,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY tm, event_id) AS ra,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY tm DESC, event_id DESC) AS rd
           FROM m)
         SELECT event_type,
                max(CASE WHEN ra = 1 THEN cents END) AS first_cents,
                max(CASE WHEN rd = 1 THEN cents END) AS last_cents,
                CAST(count(*) AS BIGINT) AS n
         FROM r GROUP BY event_type""",
    // the identical (lvl, start_ts, best) strict-dedup automaton stepped
    // per (ts, event_type)-ordered event by a recursive CTE
    "events_funnel_dedup" ->
      """WITH RECURSIVE ev AS (
           SELECT CAST(user_id AS VARCHAR) AS k, epoch_us(ts) AS t,
                  event_type AS o,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY ts, event_type) AS rn
           FROM events),
         s AS (
           SELECT k, 0 AS rn, 0 AS lvl, CAST(0 AS BIGINT) AS st,
                  CAST(0 AS BIGINT) AS best
           FROM (SELECT DISTINCT k FROM ev)
           UNION ALL
           SELECT e.k, e.rn,
             CASE WHEN s.lvl = 0 AND e.o = 'signup' THEN 1
                  WHEN s.lvl = 1 AND e.o = 'click'
                   AND e.t - s.st <= 86400000000 THEN 2
                  WHEN s.lvl = 2 AND e.o = 'purchase'
                   AND e.t - s.st <= 86400000000 THEN 0
                  WHEN s.lvl >= 1 AND e.o = 'signup' THEN 1
                  WHEN s.lvl = 2 AND e.o = 'click' THEN 0
                  WHEN s.lvl = 1 AND e.o = 'click' THEN 0
                  WHEN s.lvl = 2 AND e.o = 'purchase' THEN 0
                  ELSE s.lvl END,
             CASE WHEN e.o = 'signup' THEN e.t ELSE s.st END,
             greatest(s.best,
               CASE WHEN s.lvl = 2 AND e.o = 'purchase'
                     AND e.t - s.st <= 86400000000 THEN 3
                    WHEN s.lvl = 0 AND e.o = 'signup' THEN 1
                    WHEN s.lvl = 1 AND e.o = 'click'
                     AND e.t - s.st <= 86400000000 THEN 2
                    ELSE s.lvl END)
           FROM s JOIN ev e ON e.k = s.k AND e.rn = s.rn + 1)
         SELECT k AS key, CAST(max(best) AS BIGINT) AS funnel_level
         FROM s GROUP BY k""",
    // the identical timing grid and lower-bound rule, integers throughout
    "events_quantile_timing" ->
      """WITH m AS (
           SELECT event_type AS g,
                  greatest(CAST(floor(value * 1000) AS BIGINT), 0) AS ms
           FROM events),
         gr AS (
           SELECT g, CASE WHEN ms < 1024 THEN ms
                          WHEN ms < 30720 THEN (ms // 16) * 16
                          ELSE (ms // 512) * 512 END AS v
           FROM m),
         pv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM gr
                GROUP BY g, v),
         tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM pv GROUP BY g),
         cum AS (
           SELECT g, v, sum(c) OVER (PARTITION BY g ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM pv),
         q AS (SELECT unnest([50, 90, 99]) AS pct)
         SELECT cum.g AS event_type, q.pct, CAST(min(cum.v) AS BIGINT) AS ms
         FROM cum JOIN tot ON tot.g = cum.g CROSS JOIN q
         WHERE cum.cum * 100 >= q.pct * tot.n
         GROUP BY cum.g, q.pct""",
    // the identical exact group moments; the cross-group float term sum
    // mirrors the group-key-ordered running-sum sequence via arg_max
    "events_anova" ->
      """WITH m AS (
           SELECT (epoch_us(ts) // 86400000000) % 7 AS bucket,
                  event_type AS grp,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
           FROM events),
         g AS (
           SELECT bucket, grp, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS sy,
                  CAST(sum(y * y) AS BIGINT) AS syy
           FROM m GROUP BY bucket, grp),
         c AS (
           SELECT bucket, grp, n, sy, syy,
                  sum(CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                      / CAST(n AS DOUBLE))
                    OVER (PARTITION BY bucket ORDER BY grp
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumt
           FROM g),
         a AS (
           SELECT bucket, CAST(count(*) AS BIGINT) AS k,
                  CAST(sum(n) AS BIGINT) AS nn,
                  CAST(sum(sy) AS BIGINT) AS syt,
                  CAST(sum(syy) AS BIGINT) AS syyt,
                  arg_max(cumt, grp) AS tsum
           FROM c GROUP BY bucket
           HAVING k >= 2 AND nn > k),
         f AS (
           SELECT bucket, k, nn,
                  tsum - CAST(syt AS DOUBLE) * CAST(syt AS DOUBLE)
                    / CAST(nn AS DOUBLE) AS ssb,
                  CAST(syyt AS DOUBLE) - tsum AS ssw,
                  CAST(k AS DOUBLE) - 1.0 AS dfb,
                  CAST(nn AS DOUBLE) - CAST(k AS DOUBLE) AS dfw
           FROM a)
         SELECT bucket, k, nn AS n,
                round((ssb / dfb) / (ssw / dfw), 6) AS f_stat,
                k - 1 AS df_between, nn - k AS df_within
         FROM f WHERE ssw > 0""",
    // same grp-ordered cumulative folds as anova; the chi2 scalar tree
    // mirrors Spark's op order exactly
    "events_bartlett" ->
      """WITH m AS (
           SELECT (epoch_us(ts) // 86400000000) % 7 AS bucket,
                  event_type AS grp,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
           FROM events),
         g AS (
           SELECT bucket, grp, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS sy,
                  CAST(sum(y * y) AS BIGINT) AS syy
           FROM m GROUP BY bucket, grp),
         s AS (
           SELECT bucket, grp, n,
                  (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                     * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                    / (CAST(n AS DOUBLE) - 1.0) AS sv
           FROM g),
         c AS (
           SELECT bucket, grp, n, sv,
                  CASE WHEN n >= 2 AND sv > 0.0 THEN 1 ELSE 0 END AS ok,
                  sum((CAST(n AS DOUBLE) - 1.0) * sv) OVER w AS ca,
                  sum(CASE WHEN sv > 0.0
                        THEN (CAST(n AS DOUBLE) - 1.0) * ln(sv) END)
                    OVER w AS cb,
                  sum(1.0 / (CAST(n AS DOUBLE) - 1.0)) OVER w AS cc
           FROM s
           WINDOW w AS (PARTITION BY bucket ORDER BY grp
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         a AS (
           SELECT bucket, CAST(count(*) AS BIGINT) AS k,
                  CAST(sum(n) AS BIGINT) AS nn, min(ok) AS allok,
                  arg_max(ca, grp) AS a, arg_max(cb, grp) AS b,
                  arg_max(cc, grp) AS c
           FROM c GROUP BY bucket
           HAVING allok = 1 AND k >= 2 AND nn > k),
         f AS (
           SELECT bucket, k, nn,
                  CAST(nn AS DOUBLE) - CAST(k AS DOUBLE) AS nk,
                  a, b, c, CAST(k AS DOUBLE) AS kd
           FROM a)
         SELECT bucket, k, nn AS n,
                round((nk * ln(a / nk) - b)
                  / (1.0 + (c - 1.0 / nk) / (3.0 * (kd - 1.0))), 6) AS chi2,
                k - 1 AS df
         FROM f""",
    // the identical sweep: ±1 deltas in (point, delta) order, running sum,
    // earliest point attaining the max — integer micros throughout
    "events_max_concurrent" ->
      """WITH sp AS (
           SELECT user_id AS k, epoch_us(ts) AS s,
                  epoch_us(ts) + greatest(
                    CAST(floor(value * 1000000.0) AS BIGINT), 0) AS e
           FROM events),
         de AS (
           SELECT k, s AS p, 1 AS delta FROM sp
           UNION ALL
           SELECT k, e AS p, -1 AS delta FROM sp),
         sw AS (
           SELECT k, p, sum(delta) OVER (PARTITION BY k ORDER BY p, delta
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS active
           FROM de),
         mx AS (SELECT k, max(active) AS m FROM sw GROUP BY k)
         SELECT sw.k AS user_id, CAST(mx.m AS BIGINT) AS max_concurrent,
                min(sw.p) FILTER (WHERE sw.active = mx.m) AS peak_at_micros
         FROM sw JOIN mx ON mx.k = sw.k
         GROUP BY sw.k, mx.m""",
    "events_sum_map" ->
      """WITH s AS (
           SELECT user_id, event_type,
                  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
           FROM events GROUP BY user_id, event_type)
         SELECT user_id,
                string_agg(event_type || ':' || cents, ','
                  ORDER BY event_type) AS value_map
         FROM s GROUP BY user_id""",
    "events_bounding_ratio" ->
      """WITH o AS (SELECT user_id, value, ts,
                           row_number() OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS rn_a,
                           row_number() OVER (PARTITION BY user_id
                             ORDER BY ts DESC, event_id DESC) AS rn_d
                    FROM events),
         g AS (SELECT user_id,
                      max(CASE WHEN rn_d = 1 THEN value END) AS v_last,
                      max(CASE WHEN rn_a = 1 THEN value END) AS v_first,
                      epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us
               FROM o GROUP BY user_id)
         SELECT user_id,
                round((v_last - v_first) * 1000000.0 / span_us, 8) AS rate_per_sec
         FROM g WHERE span_us > 0""",
    "events_delta_sum" ->
      """WITH o AS (SELECT user_id, value,
                           lag(value) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS prev
                    FROM events)
         SELECT user_id,
                round(sum(CASE WHEN value > prev THEN value - prev
                               ELSE 0 END), 4) AS delta_sum
         FROM o GROUP BY user_id""",
    "events_retention" ->
      """WITH k AS (SELECT user_id,
                           max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS c0,
                           max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
                           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
                    FROM events GROUP BY user_id)
         SELECT CAST(sum(c0) AS BIGINT) AS r0,
                CAST(sum(c0 * c1) AS BIGINT) AS r1,
                CAST(sum(c0 * c2) AS BIGINT) AS r2
         FROM k""",
    "events_sequence_match" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsl, event_type AS op FROM events),
         s1 AS (SELECT *, CASE WHEN op = 'signup' THEN tsl END AS reach1 FROM e),
         p1 AS (SELECT *, max(reach1) OVER (PARTITION BY user_id ORDER BY tsl
                  RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best1 FROM s1),
         s2 AS (SELECT *, CASE WHEN op = 'click'
                  AND best1 >= tsl - 7200000000 THEN tsl END AS reach2 FROM p1),
         p2 AS (SELECT *, max(reach2) OVER (PARTITION BY user_id ORDER BY tsl
                  RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best2 FROM s2),
         s3 AS (SELECT *, CASE WHEN op = 'purchase'
                  AND best2 >= tsl - 7200000000 THEN tsl END AS reach3 FROM p2)
         SELECT user_id, count(reach3) > 0 AS matched
         FROM s3 GROUP BY user_id""",
    // the pattern form: the hop's gap interval is the range frame itself
    // ([tsl-2h, tsl-10min]) — existence inside it advances
    "events_sequence_pattern" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsl, event_type AS op FROM events),
         r1 AS (SELECT *, CASE WHEN op = 'view' THEN tsl END AS reach1 FROM e),
         r2 AS (SELECT *, CASE WHEN op = 'click' AND max(reach1) OVER (
                  PARTITION BY user_id ORDER BY tsl
                  RANGE BETWEEN 7200000000 PRECEDING AND 600000000 PRECEDING)
                  IS NOT NULL THEN tsl END AS reach2 FROM r1)
         SELECT user_id, count(reach2) > 0 AS matched FROM r2 GROUP BY user_id""",
    // the SQL aggregate form: same value-interval semantics, same oracle
    "events_sequence_pattern_sql" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsl, event_type AS op FROM events),
         r1 AS (SELECT *, CASE WHEN op = 'view' THEN tsl END AS reach1 FROM e),
         r2 AS (SELECT *, CASE WHEN op = 'click' AND max(reach1) OVER (
                  PARTITION BY user_id ORDER BY tsl
                  RANGE BETWEEN 7200000000 PRECEDING AND 600000000 PRECEDING)
                  IS NOT NULL THEN tsl END AS reach2 FROM r1)
         SELECT user_id, count(reach2) > 0 AS matched FROM r2 GROUP BY user_id""",
    "events_sequence_levels" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsl, event_type AS op FROM events),
         s1 AS (SELECT *, CASE WHEN op = 'signup' THEN tsl END AS reach1 FROM e),
         p1 AS (SELECT *, max(reach1) OVER (PARTITION BY user_id ORDER BY tsl
                  RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best1 FROM s1),
         s2 AS (SELECT *, CASE WHEN op = 'click'
                  AND best1 >= tsl - 7200000000 THEN tsl END AS reach2 FROM p1),
         p2 AS (SELECT *, max(reach2) OVER (PARTITION BY user_id ORDER BY tsl
                  RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best2 FROM s2),
         s3 AS (SELECT *, CASE WHEN op = 'purchase'
                  AND best2 >= tsl - 7200000000 THEN tsl END AS reach3 FROM p2)
         SELECT user_id,
                CAST(CASE WHEN count(reach3) > 0 THEN 3
                          WHEN count(reach2) > 0 THEN 2
                          WHEN count(reach1) > 0 THEN 1
                          ELSE 0 END AS BIGINT) AS seq_level
         FROM s3 GROUP BY user_id""",
    // the disjoint-chain automaton stepped row-by-row as a recursive CTE:
    // state (lvl, last_ts, cnt) advances per (ts, event_type)-ordered event,
    // exactly the mapPartitions scan — counts are engine-exact integers
    "events_sequence_count" ->
      """WITH RECURSIVE ev AS (
           SELECT CAST(user_id AS VARCHAR) AS k, epoch_us(ts) AS t, event_type AS o,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_type) AS rn
           FROM events),
         s AS (
           SELECT k, 0 AS rn, 0 AS lvl, CAST(0 AS BIGINT) AS last_ts,
                  CAST(0 AS BIGINT) AS cnt
           FROM (SELECT DISTINCT k FROM ev)
           UNION ALL
           SELECT e.k, e.rn,
                  CASE WHEN s.lvl = 0 AND e.o = 'view' THEN 1
                       WHEN s.lvl = 1 AND e.o = 'click'
                        AND e.t - s.last_ts <= 7200000000 THEN 0
                       ELSE s.lvl END,
                  CASE WHEN s.lvl = 0 AND e.o = 'view' THEN e.t
                       WHEN s.lvl = 1 AND e.o = 'view' THEN e.t
                       ELSE s.last_ts END,
                  s.cnt + CASE WHEN s.lvl = 1 AND e.o = 'click'
                                AND e.t - s.last_ts <= 7200000000 THEN 1 ELSE 0 END
           FROM s JOIN ev e ON e.k = s.k AND e.rn = s.rn + 1)
         SELECT k AS key, CAST(max(cnt) AS BIGINT) AS n_chains FROM s GROUP BY k""",
    // same automaton, but ties ordered by condition BITMASK (view=1,
    // click=2) — the SQL aggregate's total (ts, mask) eval order; events
    // matching no condition never touch the automaton, so their tie
    // position is irrelevant
    "events_sequence_count_sql" ->
      """WITH RECURSIVE ev AS (
           SELECT CAST(user_id AS VARCHAR) AS k, epoch_us(ts) AS t, event_type AS o,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts,
                    CASE o WHEN 'view' THEN 1 WHEN 'click' THEN 2 ELSE 3 END) AS rn
           FROM events),
         s AS (
           SELECT k, 0 AS rn, 0 AS lvl, CAST(0 AS BIGINT) AS last_ts,
                  CAST(0 AS BIGINT) AS cnt
           FROM (SELECT DISTINCT k FROM ev)
           UNION ALL
           SELECT e.k, e.rn,
                  CASE WHEN s.lvl = 0 AND e.o = 'view' THEN 1
                       WHEN s.lvl = 1 AND e.o = 'click'
                        AND e.t - s.last_ts <= 7200000000 THEN 0
                       ELSE s.lvl END,
                  CASE WHEN s.lvl = 0 AND e.o = 'view' THEN e.t
                       WHEN s.lvl = 1 AND e.o = 'view' THEN e.t
                       ELSE s.last_ts END,
                  s.cnt + CASE WHEN s.lvl = 1 AND e.o = 'click'
                                AND e.t - s.last_ts <= 7200000000 THEN 1 ELSE 0 END
           FROM s JOIN ev e ON e.k = s.k AND e.rn = s.rn + 1)
         SELECT k AS key, CAST(max(cnt) AS BIGINT) AS n_chains FROM s GROUP BY k""",
    // same lag construction, ties ordered by condition bitmask — the SQL
    // aggregate's total (ts, mask) eval order
    "events_funnel_strict_sql" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsl, event_type AS op,
                CASE op WHEN 'signup' THEN 1 WHEN 'click' THEN 2
                        WHEN 'purchase' THEN 4 ELSE 0 END AS mask
         FROM events),
         s1 AS (SELECT *, CASE WHEN op = 'signup' THEN tsl END AS start1 FROM e),
         p1 AS (SELECT *, lag(start1) OVER (PARTITION BY user_id
                  ORDER BY tsl, mask) AS prev1 FROM s1),
         s2 AS (SELECT *, CASE WHEN op = 'click'
                  AND prev1 >= tsl - 86400000000 THEN prev1 END AS start2 FROM p1),
         p2 AS (SELECT *, lag(start2) OVER (PARTITION BY user_id
                  ORDER BY tsl, mask) AS prev2 FROM s2),
         s3 AS (SELECT *, CASE WHEN op = 'purchase'
                  AND prev2 >= tsl - 86400000000 THEN prev2 END AS start3 FROM p2)
         SELECT user_id,
                CAST(coalesce(max(CASE WHEN start3 IS NOT NULL THEN 3
                                       WHEN start2 IS NOT NULL THEN 2
                                       WHEN start1 IS NOT NULL THEN 1 END), 0)
                     AS BIGINT) AS funnel_level
         FROM s3 GROUP BY user_id""",
    "events_funnel_strict" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsl, event_type AS op FROM events),
         s1 AS (SELECT *, CASE WHEN op = 'signup' THEN tsl END AS start1 FROM e),
         p1 AS (SELECT *, lag(start1) OVER (PARTITION BY user_id ORDER BY tsl) AS prev1 FROM s1),
         s2 AS (SELECT *, CASE WHEN op = 'click'
                  AND prev1 >= tsl - 86400000000 THEN prev1 END AS start2 FROM p1),
         p2 AS (SELECT *, lag(start2) OVER (PARTITION BY user_id ORDER BY tsl) AS prev2 FROM s2),
         s3 AS (SELECT *, CASE WHEN op = 'purchase'
                  AND prev2 >= tsl - 86400000000 THEN prev2 END AS start3 FROM p2)
         SELECT user_id,
                CAST(coalesce(max(CASE WHEN start3 IS NOT NULL THEN 3
                                       WHEN start2 IS NOT NULL THEN 2
                                       WHEN start1 IS NOT NULL THEN 1 END), 0)
                     AS BIGINT) AS funnel_level
         FROM s3 GROUP BY user_id""",
    "cohort_retention" ->
      """SELECT c.cohort_week, date_trunc('week', e.ts) AS active_week,
                count(DISTINCT e.user_id) AS active_keys
         FROM events e,
              (SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
               FROM events GROUP BY user_id) c
         WHERE e.user_id = c.user_id
         GROUP BY c.cohort_week, active_week""",
    "customer_quartiles" ->
      """SELECT o_custkey, CAST(revenue AS DOUBLE) AS revenue,
                ntile(4) OVER (ORDER BY revenue DESC, o_custkey) AS quartile
         FROM (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
               FROM orders GROUP BY o_custkey)""",
    "mirror_validation" ->
      """SELECT s.src_rows, s.src_keys, d.dst_rows, d.dst_keys,
                (s.src_keys = d.dst_keys) AS keys_match
         FROM (SELECT count(*) AS src_rows, count(DISTINCT user_id) AS src_keys FROM events) s,
              (SELECT count(*) AS dst_rows, count(DISTINCT user_id) AS dst_keys FROM (
                 SELECT user_id FROM events
                 QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)) d""",
    "text_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
         wc AS (SELECT doc_id, wd, count(*) AS n
                FROM (SELECT doc_id, unnest(ws) AS wd FROM w) GROUP BY doc_id, wd),
         wordstats AS (SELECT doc_id,
                              CAST(max(n) AS DOUBLE) / sum(n) AS top_word_fraction,
                              CAST(count(*) AS DOUBLE) / sum(n) AS distinct_word_ratio
                       FROM wc GROUP BY doc_id),
         bg AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
                  i -> ws[i] || ' ' || ws[i+1])) AS b FROM w),
         bc AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY doc_id, b),
         bigstats AS (SELECT doc_id,
                             CAST(max(n) AS DOUBLE) / sum(n) AS top_bigram_fraction
                      FROM bc GROUP BY doc_id)
         SELECT s.doc_id, s.top_word_fraction, s.distinct_word_ratio,
                b2.top_bigram_fraction
         FROM wordstats s LEFT JOIN bigstats b2 USING (doc_id)""",
    "mirror_lag" ->
      """SELECT 'events' AS table_name, src_rows, dst_rows,
                src_rows - dst_rows AS lag_rows,
                src_max_seq, dst_max_seq, src_max_seq - dst_max_seq AS lag_seq,
                last_synced_at,
                CASE WHEN src_rows - dst_rows = 0 THEN 'SYNCED'
                     WHEN abs(src_rows - dst_rows) <= 5 THEN 'NEAR_SYNC'
                     ELSE 'LAG' END AS sync_status
         FROM (SELECT count(*) AS src_rows, CAST(max(event_id) AS BIGINT) AS src_max_seq
               FROM events) s,
              (SELECT count(*) AS dst_rows, CAST(max(event_id) AS BIGINT) AS dst_max_seq,
                      max(ts) AS last_synced_at
               FROM (SELECT * FROM events
                     QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
               WHERE event_type <> 'error') d""",
    "docs_quality_filter" ->
      """SELECT doc_id, lang, n_chars FROM (
           SELECT doc_id, lang, n_chars,
                  len(string_split(text, ' ')) AS nt,
                  (CAST(len(list_filter(string_split(text, ' '),
                       x -> x IN ('the','a','an','and','of','to','in','is'))) AS DOUBLE)
                     / len(string_split(text, ' '))
                   + CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 0.5 ELSE 0.0 END)
                   - CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                     / length(text) AS q
           FROM documents)
         WHERE q >= 0.5 AND nt >= 20""",
    "docs_train_test_split" ->
      """SELECT lang, (doc_id * 2654435761) % 10000 < 1000 AS is_test,
                count(*) AS n_docs
         FROM documents GROUP BY lang, is_test""",
    "docs_stratified_sample" ->
      """SELECT lang, doc_id FROM (
           SELECT lang, doc_id,
                  row_number() OVER (PARTITION BY lang
                    ORDER BY (doc_id * 2654435761) % 10000, doc_id) AS rn,
                  count(*) OVER (PARTITION BY lang) AS m
           FROM documents)
         WHERE rn <= ceil(m * 0.2)""",
    "docs_token_budget_mix" ->
      """SELECT lang, doc_id, n_tokens, cum_tokens FROM (
           SELECT lang, doc_id, n_tokens,
                  CAST(sum(n_tokens) OVER (PARTITION BY lang
                    ORDER BY (doc_id * 2654435761) % 10000, doc_id) AS BIGINT)
                    AS cum_tokens
           FROM (SELECT lang, doc_id,
                        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                 FROM documents))
         WHERE cum_tokens <= 2000""",
    "docs_global_shuffle" ->
      """SELECT doc_id, pos, pos % 8 AS shard FROM (
           SELECT doc_id,
                  row_number() OVER (
                    ORDER BY ((doc_id + 7) * 2654435761) % 10000, doc_id) - 1 AS pos
           FROM documents)""",
    "docs_quality_sample" ->
      """SELECT doc_id, lang, q AS q_score FROM (
           SELECT doc_id, lang,
                  (CAST(len(list_filter(string_split(text, ' '),
                       x -> x IN ('the','a','an','and','of','to','in','is'))) AS DOUBLE)
                     / len(string_split(text, ' '))
                   + CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 0.5 ELSE 0.0 END)
                   - CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                     / length(text) AS q
           FROM documents)
         WHERE (doc_id * 2654435761) % 10000 < q * 10000""",
    "docs_length_histogram" ->
      """SELECT nt - nt % 10 AS bin_lo, count(*) AS n_docs,
                CAST(sum(nt) AS BIGINT) AS total_tokens
         FROM (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
               FROM documents)
         GROUP BY 1""",
    "docs_shard_stats" ->
      """SELECT pos % 8 AS shard, count(*) AS n_docs,
                CAST(sum(nt) AS BIGINT) AS total_tokens,
                min(pos) AS first_pos, max(pos) AS last_pos
         FROM (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
                      row_number() OVER (
                        ORDER BY ((doc_id + 7) * 2654435761) % 10000, doc_id) - 1 AS pos
               FROM documents)
         GROUP BY 1""",
    "cdc_change_rates" ->
      """SELECT user_id, count(*) AS n_changes,
                min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us,
                CAST(sum(gap_us) AS BIGINT) AS sum_gap_us
         FROM (SELECT user_id,
                      epoch_us(ts) - epoch_us(lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
               FROM events)
         GROUP BY user_id""",
    // the maintained aggregate must equal the full re-aggregation of the
    // final live snapshot — which is exactly what the oracle computes
    "cdc_materialized_join" ->
      """SELECT o_orderkey, o_custkey, c_name, o_totalprice
         FROM orders JOIN customer ON c_custkey = o_custkey
         WHERE o_orderkey % 5 = 0""",
    "cdc_materialized_agg" ->
      """SELECT event_type, count(*) AS n_rows,
                CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM (SELECT event_type, value FROM events
               QUALIFY row_number() OVER (
                 PARTITION BY user_id ORDER BY event_id DESC) = 1)
         WHERE event_type <> 'error'
         GROUP BY event_type""",
    "docs_contamination" ->
      """WITH d AS (SELECT doc_id, (doc_id * 2654435761) % 10000 < 1000 AS is_test,
                           string_split(lower(text), ' ') AS ws
                    FROM documents),
         sh AS (SELECT doc_id, is_test,
                       unnest(list_distinct(list_transform(range(1, len(ws) - 2),
                         i -> array_to_string(list_slice(ws, i, i + 3), ' ')))) AS s
                FROM d WHERE len(ws) >= 4),
         rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 100)
         SELECT a.doc_id AS train_id, b.doc_id AS test_id,
                count(*) AS n_shared
         FROM (SELECT * FROM sh WHERE NOT is_test AND s IN (SELECT s FROM rare)) a
         JOIN (SELECT * FROM sh WHERE is_test) b ON a.s = b.s
         GROUP BY 1, 2 HAVING count(*) >= 3""",
    // bit-identical to docs_contamination by construction (Bloom has no
    // false negatives; the exact equi-join drops false positives)
    "docs_contamination_bloom" ->
      """WITH d AS (SELECT doc_id, (doc_id * 2654435761) % 10000 < 1000 AS is_test,
                           string_split(lower(text), ' ') AS ws
                    FROM documents),
         sh AS (SELECT doc_id, is_test,
                       unnest(list_distinct(list_transform(range(1, len(ws) - 2),
                         i -> array_to_string(list_slice(ws, i, i + 3), ' ')))) AS s
                FROM d WHERE len(ws) >= 4),
         rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 100)
         SELECT a.doc_id AS train_id, b.doc_id AS test_id,
                count(*) AS n_shared
         FROM (SELECT * FROM sh WHERE NOT is_test AND s IN (SELECT s FROM rare)) a
         JOIN (SELECT * FROM sh WHERE is_test) b ON a.s = b.s
         GROUP BY 1, 2 HAVING count(*) >= 3""",
    "orders_profile" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .map(c =>
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           count(DISTINCT $c) AS n_distinct,
           CAST(min($c) AS VARCHAR) AS min_str, CAST(max($c) AS VARCHAR) AS max_str
           FROM orders""").mkString(" UNION ALL "),
    "text_regex_tokens" ->
      """SELECT lang,
                CAST(sum(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT)
                  AS total_pieces
         FROM documents GROUP BY lang""",
    "text_token_stats" ->
      """SELECT lang, count(*) AS n_docs,
                CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
                CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT) AS total_bpe_est
         FROM documents GROUP BY lang""",
    "text_quality" ->
      """SELECT doc_id,
                len(string_split(text, ' ')) AS n_tokens,
                length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
                len(list_filter(string_split(text, ' '),
                    x -> x IN ('the','a','an','and','of','to','in','is'))) AS n_stop,
                (CAST(len(list_filter(string_split(text, ' '),
                     x -> x IN ('the','a','an','and','of','to','in','is'))) AS DOUBLE)
                   / len(string_split(text, ' '))
                 + CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 0.5 ELSE 0.0 END)
                 - CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                   / length(text) AS q_score
         FROM documents""",
    "text_lang_id" ->
      """WITH scored AS (
           SELECT lang,
             len(list_filter(string_split(text,' '), x -> x IN ('the','a','and','of','is'))) AS s_en,
             len(list_filter(string_split(text,' '), x -> x IN ('le','la','et','les','des'))) AS s_fr,
             len(list_filter(string_split(text,' '), x -> x IN ('der','die','und','das','ist'))) AS s_de,
             len(list_filter(string_split(text,' '), x -> x IN ('el','los','las','una','es'))) AS s_es
           FROM documents)
         SELECT lang, predicted, count(*) AS n_docs FROM (
           SELECT lang, CASE WHEN greatest(s_en,s_fr,s_de,s_es) = 0 THEN 'und'
                             WHEN s_en = greatest(s_en,s_fr,s_de,s_es) THEN 'en'
                             WHEN s_fr = greatest(s_en,s_fr,s_de,s_es) THEN 'fr'
                             WHEN s_de = greatest(s_en,s_fr,s_de,s_es) THEN 'de'
                             ELSE 'es' END AS predicted
           FROM scored)
         GROUP BY lang, predicted""",
    "text_fingerprint" ->
      """SELECT doc_id,
                md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fp
         FROM documents""",
    "top_words_exact" ->
      """SELECT word, n FROM (
           SELECT word, count(*) AS n,
                  (SELECT count(*) FROM (SELECT unnest(string_split(lower(text), ' ')) FROM documents)) AS total
           FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
           GROUP BY word)
         WHERE n * 50 > total""",
    "dedup_exact" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fp,
                min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents GROUP BY fp""",
    // exact stage = min-id per fingerprint group; near stage = the prefix
    // pair set (guaranteed recall both engines) at 0.9 over exact
    // survivors, pair-grain min-id drop rule
    "dedup_loss_report" ->
      """WITH d AS (SELECT doc_id AS id, source,
                           list_distinct(string_split(lower(text), ' '))
                             AS words
                    FROM documents),
         f AS (SELECT *, md5(array_to_string(list_sort(words), ' ')) AS fp
               FROM d),
         k AS (SELECT fp, min(id) AS keep_id FROM f GROUP BY fp),
         t AS (SELECT f.id, f.source, f.words, f.id <> k.keep_id AS exact_dup
               FROM f JOIN k USING (fp)),
         s AS (SELECT * FROM t WHERE NOT exact_dup),
         tok AS (SELECT id, unnest(words) AS w, len(words) AS n FROM s),
         dfq AS (SELECT w, count(*) AS df FROM tok GROUP BY w),
         pfx AS (SELECT id, w FROM (
                   SELECT t2.id, t2.w, t2.n,
                          row_number() OVER (PARTITION BY t2.id
                            ORDER BY q.df, t2.w) AS rn
                   FROM tok t2 JOIN dfq q USING (w))
                 WHERE rn <= n - ceil(n * 0.9) + 1),
         cand AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b
                  FROM pfx l JOIN pfx r ON l.w = r.w AND l.id < r.id),
         near AS (SELECT DISTINCT c.id_b AS id
                  FROM cand c JOIN s a ON c.id_a = a.id
                  JOIN s b ON c.id_b = b.id
                  WHERE CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
                          / len(list_distinct(list_concat(a.words, b.words)))
                        >= 0.9)
         SELECT t.source, count(*) AS n_docs,
                CAST(sum(CASE WHEN t.exact_dup THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_exact_dropped,
                CAST(sum(CASE WHEN NOT t.exact_dup AND n.id IS NOT NULL
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dropped,
                CAST(sum(CASE WHEN NOT t.exact_dup AND n.id IS NULL
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                round(CAST(sum(CASE WHEN NOT t.exact_dup AND n.id IS NULL
                                    THEN 1 ELSE 0 END) AS DOUBLE)
                      / count(*), 6) AS keep_rate
         FROM t LEFT JOIN near n USING (id)
         GROUP BY 1""",
    // incremental = the complete pair set restricted to pairs touching the
    // "new" split (both engines have guaranteed recall, so the sets match);
    // the indexed variant runs the identical semantics through the persisted
    // JaccardIndex lifecycle, so it shares the oracle verbatim
    "dedup_incremental" -> incrementalOracle,
    "dedup_incremental_indexed" -> incrementalOracle,
    "dedup_containment" ->
      """WITH d AS (SELECT doc_id, lang,
                           list_distinct(string_split(lower(text), ' ')) AS words
                    FROM documents),
         tok AS (SELECT doc_id, lang, len(words) AS n, unnest(words) AS w FROM d)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS n_a,
                count(*) AS shared
         FROM tok a JOIN tok b ON a.lang = b.lang AND a.w = b.w
                              AND a.doc_id <> b.doc_id
         GROUP BY 1, 2, 3
         HAVING count(*) * 1 >= a.n * 1""",
    // full cosine-LSH replay (r18): the engine's murmur-derived hyperplane
    // weights re-derived in staged 32-bit SQL (murmurSql — hi = hash(i,42)
    // per dimension, w = hash(b,hi)/2^31 per (dim, plane), the
    // HyperplaneLsh.scala chain), the per-(vector, plane) dot as a
    // list_reduce fold in ascending-dimension order with a 0.0-prepended
    // accumulator (the engine's exact IEEE sequence), sign-bit band
    // buckets, the same 2..4096 bucket valve, candidate pairs, and the
    // CosineSim kernel — dot/(√na·√nb), three identical-order folds — at
    // the 0.2 cut. Bit-exact including the raw double payload: every
    // operation is order-pinned IEEE, so no rounding is needed anywhere.
    // DIM=64 matches the testdata embeddings (the engine reads min(len)).
    "dedup_embedding" -> {
      val dim = 64; val bits = 4; val bands = 32
      def fold(l: String, r: String) = cosFold(l, r, dim)
      s"""WITH ${lshPlaneCtes(dim, bits * bands)},
         bk AS MATERIALIZED (
           SELECT id, CAST(b // $bits AS INT) AS band,
             -- NOT isnan: Java's `dot >= 0.0` is FALSE for NaN while
             -- DuckDB orders NaN above all values (r18 advice) — explicit
             -- so a NaN embedding buckets identically in both engines
             CAST(sum(CASE WHEN d >= 0 AND NOT isnan(d)
               THEN (1 << CAST(b % $bits AS INT)) ELSE 0 END) AS INT)
               AS bucket
           FROM dots GROUP BY 1, 2),
         sz AS (SELECT band, bucket, count(*) AS n FROM bk GROUP BY 1, 2),
         okb AS (SELECT band, bucket FROM sz WHERE n BETWEEN 2 AND 4096),
         cand AS MATERIALIZED (
           SELECT DISTINCT a.id AS id_a, x.id AS id_b
           FROM bk a JOIN okb USING (band, bucket)
                JOIN bk x ON a.band = x.band AND a.bucket = x.bucket
                         AND a.id < x.id),
         scored AS (
           SELECT c.id_a, c.id_b,
             ${fold("l", "r")} / (sqrt(${fold("l", "l")})
               * sqrt(${fold("r", "r")})) AS cos_sim
           FROM cand c JOIN e l ON c.id_a = l.id JOIN e r ON c.id_b = r.id)
         SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= 0.2"""
    },
    // the one-shot LSH top-k replay (r18): 6 sign bits / 1 table over the
    // same murmur-derived planes, bucket-join candidates, the CosineSim
    // kernel, and the TopKAggregator's total order (-score, id) as a
    // row_number — integer output (query, neighbor, rank) pinned by the
    // bit-exact float ordering underneath
    // SemDeDup replay (r18): the ENTIRE training loop re-derived — the
    // xxhash64-ordered k=8 init (centroid ids are 0..7 in pick order, the
    // NearestCentroids tie-break order), THREE unrolled Lloyd steps where
    // assignment is the NearestCentroids cosine argmax and the mean
    // update is the engine's r18 FIXED-POINT coordinate sum (exact
    // order-free longs of floor(x·2^40 + 0.5), then the same two-division
    // double tree — this is what made distributed k-means an
    // engine-reproducible pure function), empty clusters keeping their
    // previous centroid, then within-cluster pairs at the round-4 cosine
    // ≥ 0.2 cut. Bit-exact including the cosine payload.
    "dedup_semantic" -> {
      val dim = 64; val k = 8; val iters = 3
      def f(l: String, r: String) = cosFold(l, r, dim)
      s"""WITH ${kmeansReplayCtes(dim, k, iters)},
         sz AS (SELECT cid, count(*) AS n FROM af GROUP BY 1),
         keep AS (SELECT cid FROM sz WHERE n BETWEEN 2 AND 65536),
         pairs AS (
           SELECT a.id AS id_a, b.id AS id_b,
             round(${f("l", "r")} / (sqrt(${f("l", "l")})
               * sqrt(${f("r", "r")})), 4) AS cos_sim
           FROM af a JOIN keep USING (cid)
                JOIN af b ON a.cid = b.cid AND a.id < b.id
                JOIN e l ON l.id = a.id JOIN e r ON r.id = b.id)
         SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.2"""
    },
    // the PERSISTED IVF lifecycle's replay (r19): the ENTIRE create →
    // refine → pack → probe chain re-derived. The codebook init is the
    // xxhash64-ordered 256-sample (ann_ivf's pick); 4 Lloyd refinement
    // iterations run DRIVER-SEQUENTIALLY in the engine (IvfIndex.create:
    // s(i) += v(i) over the sample in hash order), so the oracle's mean
    // update is an ORDER-PINNED float fold over members by sample rank —
    // the ordered-fold idiom, where the distributed kmeansCentroids
    // needed fixed-point. Assignment is the NearestCentroids cosine
    // argmax (ties to the lower id); postings are PackInt8 codes
    // (scale = max|x|/127 — order-free max — then Java Math.round's
    // floor(x/scale + 0.5)); probes take the top-nProbe=4 lists and score
    // through the Int8CosineSim fold; the TopKAggregator total order
    // (-score, id) pins rk. Every float op is order-pinned IEEE.
    // PRECONDITIONS (r19 advice, documented like ann_pq's): (1) corpus
    // fits IvfIndex.create's numCentroids*32-row hash-ordered training
    // sample — this oracle trains over the whole smp, which coincides
    // with the engine only while |corpus| <= sample budget (true at the
    // verify SF; a larger corpus needs the oracle to replicate the
    // sample cut first); (2) no all-zero embedding — the scored CTE's
    // norm product would divide by zero here while the engine's
    // Int8CosineSim folds to NaN (test embeddings are non-degenerate by
    // construction).
    "ann_ivf_indexed" -> {
      val dim = 64; val nc = 256; val iters = 4; val nProbe = 4; val k = 5
      val rng = s"range(1, ${dim + 1})"
      def foldc(expr: String) = fold0(s"list_transform($rng, i -> $expr)")
      s"""WITH ${embSampleCtes(dim)},
         k0 AS MATERIALIZED (
           SELECT id AS cid, v AS cv FROM smp WHERE rn <= $nc),
         ${ivfCoarseSteps(dim, iters)},
         nf AS (SELECT cid, cv, ${normFoldSql(s"k$iters", dim)} AS nc
             FROM k$iters),
         simf AS MATERIALIZED (
           SELECT m.id, c.cid,
             ${foldc("m.v[i] * c.cv[i]")} / (m.vn * c.nc) AS sim
           FROM smp m CROSS JOIN nf c),
         asg AS MATERIALIZED (
           SELECT id AS corpus_id, cid AS c FROM (
             SELECT id, cid, row_number() OVER (PARTITION BY id
               ORDER BY sim DESC, cid) AS rk FROM simf) WHERE rk = 1),
         pr AS (
           SELECT id AS query_id, cid AS c FROM (
             SELECT id, cid, row_number() OVER (PARTITION BY id
               ORDER BY sim DESC, cid) AS rk FROM simf WHERE id < 10)
           WHERE rk <= $nProbe),
         q8 AS MATERIALIZED (
           SELECT id,
             CASE WHEN mx = 0.0
                  THEN list_transform(v, x -> 0.0)
                  ELSE list_transform(v, x -> floor(x / (mx / 127.0) + 0.5))
             END AS cd
           FROM (SELECT id, v, list_max(list_transform(v, x -> abs(x))) AS mx
                 FROM smp)),
         scored AS (
           SELECT p.query_id, a.corpus_id,
             ${foldc("ce.cd[i] * qe.v[i]")}
               / (sqrt(${foldc("ce.cd[i] * ce.cd[i]")})
                  * sqrt(${foldc("qe.v[i] * qe.v[i]")})) AS cos_sim
           FROM pr p JOIN asg a USING (c)
                JOIN smp qe ON qe.id = p.query_id
                JOIN q8 ce ON ce.id = a.corpus_id
           WHERE p.query_id <> a.corpus_id),
         r AS (SELECT query_id, corpus_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, corpus_id) AS rk
               FROM scored)
         SELECT query_id, corpus_id, rk FROM r WHERE rk <= $k"""
    },
    // the k-means READOUT itself (r19): the same shared Lloyd replay as
    // dedup_semantic, then per-centroid member counts off the final
    // assignment (empty clusters keep a 0 via the left join — kmeansFit's
    // coalesce) and the engine's l2Norm fold over the final codebook
    "emb_kmeans" -> {
      val dim = 64
      s"""WITH ${kmeansReplayCtes(dim, 8, 3)},
         sz AS (SELECT cid, count(*) AS n FROM af GROUP BY 1)
         SELECT c.cid AS centroid_id,
                CAST(coalesce(sz.n, 0) AS BIGINT) AS n_members,
                round(sqrt(list_reduce(list_prepend(0.0,
                  list_transform(range(1, ${dim + 1}),
                    i -> c.cv[i] * c.cv[i])),
                  (a, x) -> a + x)), 4) AS centroid_norm
         FROM c3 c LEFT JOIN sz ON sz.cid = c.cid"""
    },
    "ann_lsh" -> {
      val dim = 64; val bits = 6
      s"""WITH ${lshPlaneCtes(dim, bits)},
         bk AS MATERIALIZED (
           SELECT id, CAST(sum(CASE WHEN d >= 0 AND NOT isnan(d)
             THEN (1 << CAST(b AS INT)) ELSE 0 END) AS INT) AS bucket
           FROM dots GROUP BY 1),
         scored AS (
           SELECT q.id AS query_id, c.id AS corpus_id,
             ${cosFold("ce", "qe", dim)}
               / (sqrt(${cosFold("ce", "ce", dim)})
                  * sqrt(${cosFold("qe", "qe", dim)})) AS cos_sim
           FROM bk q JOIN bk c ON q.bucket = c.bucket AND q.id <> c.id
                JOIN e qe ON qe.id = q.id JOIN e ce ON ce.id = c.id
           WHERE q.id < 10),
         r AS (SELECT query_id, corpus_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, corpus_id) AS rk
               FROM scored)
         SELECT query_id, corpus_id, rk FROM r WHERE rk <= 5"""
    },
    // the PERSISTED LSH lifecycle's replay (r18): same murmur planes and
    // candidate sets as ann_lsh (tables=1, bits=6 — equality spec-pinned),
    // but scored off the index's int8-PACKED postings: scale = max|x|/127
    // (order-free max), code_i = floor(x/scale + 0.5) (Java Math.round's
    // exact definition), then the Int8CosineSim fold — codes as doubles
    // against the float query, same ascending-order IEEE sequence. The
    // parquet round-trip of the binary codes is exact, so the whole probe
    // is a pure function the oracle re-derives
    "ann_lsh_indexed" -> {
      val dim = 64; val bits = 6
      def foldc(expr: String) =
        s"""list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}),
           i -> $expr)), (a, x) -> a + x)"""
      s"""WITH ${lshPlaneCtes(dim, bits)},
         bk AS MATERIALIZED (
           SELECT id, CAST(sum(CASE WHEN d >= 0 AND NOT isnan(d)
             THEN (1 << CAST(b AS INT)) ELSE 0 END) AS INT) AS bucket
           FROM dots GROUP BY 1),
         q8 AS MATERIALIZED (
           SELECT id,
             CASE WHEN mx = 0.0
                  THEN list_transform(v, x -> 0.0)
                  ELSE list_transform(v, x ->
                    floor(CAST(x AS DOUBLE) / (mx / 127.0) + 0.5)) END AS cd
           FROM (SELECT id, v,
                   list_max(list_transform(v,
                     x -> abs(CAST(x AS DOUBLE)))) AS mx
                 FROM e)),
         scored AS (
           SELECT q.id AS query_id, c.id AS corpus_id,
             ${foldc("ce.cd[i] * CAST(qe.v[i] AS DOUBLE)")}
               / (sqrt(${foldc("ce.cd[i] * ce.cd[i]")})
                  * sqrt(${foldc(
                    "CAST(qe.v[i] AS DOUBLE) * CAST(qe.v[i] AS DOUBLE)")}))
               AS cos_sim
           FROM bk q JOIN bk c ON q.bucket = c.bucket AND q.id <> c.id
                JOIN e qe ON qe.id = q.id JOIN q8 ce ON ce.id = c.id
           WHERE q.id < 10),
         r AS (SELECT query_id, corpus_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, corpus_id) AS rk
               FROM scored)
         SELECT query_id, corpus_id, rk FROM r WHERE rk <= 5"""
    },
    // IVF replay (r18): the deterministic centroid pick re-derives Spark's
    // xxhash64(long) in staged 64-bit SQL (xxhashSql — one 8-byte lane +
    // avalanche, 32-bit-limb modular multiplies, SIGNED order restored for
    // the ORDER BY), then the NearestCentroids kernel (cosine argmax over
    // the 256-entry codebook, ties to the lower id, ascending-dimension
    // IEEE folds), nProbe=4 probing, and the same CosineSim + TopK total
    // order as ann_lsh. Integer output pinned by bit-exact floats beneath.
    "ann_ivf" -> {
      val dim = 64; val nc = 256; val nProbe = 4; val k = 5
      val M64 = "18446744073709551616"
      val xxq = xxhashSql("vec_id", "(SELECT vec_id FROM embeddings)",
        Seq("vec_id"))
      def f(l: String, r: String) = cosFold(l, r, dim)
      s"""WITH hx AS (SELECT vec_id,
             CASE WHEN t >= 9223372036854775808
                  THEN CAST(t - $M64 AS BIGINT)
                  ELSE CAST(t AS BIGINT) END AS h
           FROM $xxq),
         cents AS MATERIALIZED (
           SELECT e.vec_id AS cid,
                  list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS cv
           FROM embeddings e JOIN hx ON e.vec_id = hx.vec_id
           ORDER BY hx.h, e.vec_id LIMIT $nc),
         cnorm AS MATERIALIZED (
           SELECT cid, cv,
             sqrt(list_reduce(list_prepend(0.0,
               list_transform(range(1, ${dim + 1}), i -> cv[i] * cv[i])),
               (a, x) -> a + x)) AS nc
           FROM cents),
         e AS MATERIALIZED (
           SELECT vec_id AS id, embedding AS v,
             sqrt(list_reduce(list_prepend(0.0,
               list_transform(range(1, ${dim + 1}),
                 i -> CAST(embedding[i] AS DOUBLE)
                    * CAST(embedding[i] AS DOUBLE))),
               (a, x) -> a + x)) AS vn
           FROM embeddings),
         sims AS MATERIALIZED (
           SELECT e.id, c.cid,
             list_reduce(list_prepend(0.0,
               list_transform(range(1, ${dim + 1}),
                 i -> CAST(e.v[i] AS DOUBLE) * c.cv[i])),
               (a, x) -> a + x) / (e.vn * c.nc) AS sim
           FROM e CROSS JOIN cnorm c),
         assigned AS MATERIALIZED (
           SELECT id AS corpus_id, cid AS cent_id FROM (
             SELECT id, cid, row_number() OVER (PARTITION BY id
               ORDER BY sim DESC, cid) AS rn FROM sims) WHERE rn = 1),
         probes AS (
           SELECT id AS query_id, cid AS cent_id FROM (
             SELECT id, cid, row_number() OVER (PARTITION BY id
               ORDER BY sim DESC, cid) AS rn FROM sims WHERE id < 10)
           WHERE rn <= $nProbe),
         scored AS (
           SELECT p.query_id, a.corpus_id,
             ${f("ce", "qe")} / (sqrt(${f("qe", "qe")})
               * sqrt(${f("ce", "ce")})) AS cos_sim
           FROM probes p JOIN assigned a USING (cent_id)
                JOIN e qe ON qe.id = p.query_id
                JOIN e ce ON ce.id = a.corpus_id
           WHERE p.query_id <> a.corpus_id),
         r AS (SELECT query_id, corpus_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, corpus_id) AS rk FROM scored)
         SELECT query_id, corpus_id, rk FROM r WHERE rk <= $k"""
    },
    // plain-PQ ADC replay (r19): the ENTIRE pqTopK pipeline at
    // rotate=false re-derived — the xxhash64-ordered training sample
    // (sampleN=1024 >= corpus, so it is the whole corpus in hash order),
    // per-subspace sub-k-means (init = first ksub sample subvectors in
    // hash order; 5 Lloyd steps with the L2 d2 fold, strict < → lowest
    // code on ties, ORDER-PINNED member-sum folds by sample rank — the
    // driver loop is sequential, the ann_ivf_indexed idiom), PqEncode's
    // identical argmin over the frozen codebooks, the per-query LUT
    // sub-dot folds, the ADC score s/(‖q‖·√Σ‖cb‖²) with its
    // denom-positive guard, and the TopKAggregator total order.
    "ann_pq" -> {
      val m = 8; val ksub = 16; val dsub = 8; val iters = 5; val k = 5
      val dim = m * dsub
      val rs = s"range(1, ${dsub + 1})"
      s"""WITH ${embSampleCtes(dim)},
         sub AS MATERIALIZED (
           SELECT rn, id, j,
             list_transform($rs, d -> v[j * $dsub + d]) AS sv
           FROM smp, unnest(range(0, $m)) jj(j)),
         p0 AS MATERIALIZED (
           SELECT j, rn - 1 AS c, sv AS cv FROM sub WHERE rn <= $ksub),
         ${pqFitSteps(dsub, iters)},
         enc AS MATERIALIZED (
           SELECT rn, id, j, c FROM (
             SELECT s.rn, s.id, s.j, p.c,
               row_number() OVER (PARTITION BY s.rn, s.j
                 ORDER BY ${pqD2Fold(dsub, "s", "p")}, p.c) AS rk
             FROM sub s JOIN p$iters p ON p.j = s.j) WHERE rk = 1),
         cn2 AS (
           SELECT j, c,
             ${fold0(s"list_transform($rs, d -> cv[d] * cv[d])")} AS n2
           FROM p$iters),
         lut AS MATERIALIZED (
           SELECT q.id AS qid, p.j, p.c,
             ${fold0(s"list_transform($rs, d -> q.v[p.j * $dsub + d] * p.cv[d])")}
               AS s
           FROM (SELECT id, v FROM smp WHERE id < 10) q
           CROSS JOIN p$iters p),
         sc AS (
           SELECT l.qid AS query_id, e.id AS corpus_id,
             ${fold0("list(l.s ORDER BY l.j)")} AS dot,
             ${fold0("list(n.n2 ORDER BY e.j)")} AS recon2
           FROM enc e JOIN lut l ON l.j = e.j AND l.c = e.c
                JOIN cn2 n ON n.j = e.j AND n.c = e.c
           WHERE l.qid <> e.id
           GROUP BY 1, 2),
         scored AS (
           SELECT query_id, corpus_id,
             CASE WHEN qe.vn * sqrt(recon2) > 0
                  THEN dot / (qe.vn * sqrt(recon2)) ELSE 0.0 END AS cos_sim
           FROM sc JOIN smp qe ON qe.id = sc.query_id),
         r AS (SELECT query_id, corpus_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, corpus_id) AS rk
               FROM scored)
         SELECT query_id, corpus_id, rk FROM r WHERE rk <= $k"""
    },
    // residual-IVFADC replay (r19): ann_pq_indexed at pqRotate=false,
    // end to end — the 32-centroid coarse codebook with 2 driver-
    // sequential refinement iterations (the ann_ivf_indexed chain), every
    // vector's residual against its FROZEN assigned centroid, the
    // per-subspace sub-k-means trained ON those residuals (pqFit: the
    // ann_pq chain), PqEncode's argmin codes, the top-nProbe=8 probed
    // lists, and PqResidualCosineSim's flat ascending fold over
    // x̂ = centroid + coded residual: dot/(‖q‖·‖x̂‖), TopK total order.
    // PRECONDITION (r19 advice, mirroring ann_pq's): the coarse and PQ
    // codebooks here train over the whole smp, which coincides with the
    // engine's numCentroids*32-row / sampleN=1024 hash-ordered training
    // cuts only while the corpus fits inside them (true at the verify
    // SF; a larger corpus needs the oracle to replicate the cuts first).
    "ann_pq_indexed" -> {
      val dim = 64; val nc = 32; val cIters = 2; val m = 8; val ksub = 16
      val dsub = 8; val pIters = 5; val nProbe = 8; val k = 5
      val rng = s"range(1, ${dim + 1})"
      def foldc(expr: String) = fold0(s"list_transform($rng, i -> $expr)")
      s"""WITH ${embSampleCtes(dim)},
         k0 AS MATERIALIZED (
           SELECT id AS cid, v AS cv FROM smp WHERE rn <= $nc),
         ${ivfCoarseSteps(dim, cIters)},
         nf AS (SELECT cid, cv, ${normFoldSql(s"k$cIters", dim)} AS nc
             FROM k$cIters),
         simf AS MATERIALIZED (
           SELECT m.id, c.cid,
             ${foldc("m.v[i] * c.cv[i]")} / (m.vn * c.nc) AS sim
           FROM smp m CROSS JOIN nf c),
         asg AS MATERIALIZED (
           SELECT id AS corpus_id, cid AS c FROM (
             SELECT id, cid, row_number() OVER (PARTITION BY id
               ORDER BY sim DESC, cid) AS rk FROM simf) WHERE rk = 1),
         pr AS (
           SELECT id AS query_id, cid AS c FROM (
             SELECT id, cid, row_number() OVER (PARTITION BY id
               ORDER BY sim DESC, cid) AS rk FROM simf WHERE id < 10)
           WHERE rk <= $nProbe),
         rsd AS MATERIALIZED (
           SELECT s.rn, s.id,
             list_transform($rng, i -> s.v[i] - kc.cv[i]) AS v
           FROM smp s JOIN asg ag ON ag.corpus_id = s.id
                JOIN k$cIters kc ON kc.cid = ag.c),
         sub AS MATERIALIZED (
           SELECT rn, id, j,
             list_transform(range(1, ${dsub + 1}), d -> v[j * $dsub + d])
               AS sv
           FROM rsd, unnest(range(0, $m)) jj(j)),
         p0 AS MATERIALIZED (
           SELECT j, rn - 1 AS c, sv AS cv FROM sub WHERE rn <= $ksub),
         ${pqFitSteps(dsub, pIters)},
         enc AS MATERIALIZED (
           SELECT rn, id, j, c FROM (
             SELECT s.rn, s.id, s.j, p.c,
               row_number() OVER (PARTITION BY s.rn, s.j
                 ORDER BY ${pqD2Fold(dsub, "s", "p")}, p.c) AS rk
             FROM sub s JOIN p$pIters p ON p.j = s.j) WHERE rk = 1),
         rv AS MATERIALIZED (
           SELECT e.id, flatten(list(p.cv ORDER BY e.j)) AS rv
           FROM enc e JOIN p$pIters p ON p.j = e.j AND p.c = e.c
           GROUP BY e.id),
         xh AS MATERIALIZED (
           SELECT a.corpus_id, a.c,
             list_transform($rng, i -> kc.cv[i] + rv.rv[i]) AS xv
           FROM asg a JOIN k$cIters kc ON kc.cid = a.c
                JOIN rv ON rv.id = a.corpus_id),
         scored AS (
           SELECT p.query_id, xr.corpus_id,
             ${foldc("qe.v[i] * xr.xv[i]")}
               / (qe.vn * sqrt(${foldc("xr.xv[i] * xr.xv[i]")})) AS cos_sim
           FROM pr p JOIN xh xr USING (c)
                JOIN smp qe ON qe.id = p.query_id
           WHERE p.query_id <> xr.corpus_id),
         r AS (SELECT query_id, corpus_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, corpus_id) AS rk
               FROM scored)
         SELECT query_id, corpus_id, rk FROM r WHERE rk <= $k"""
    },
    "docs_dup_ngram_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         pos AS (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i
                 FROM toks WHERE len(w) >= 8),
         grams AS (SELECT doc_id, array_to_string(w[i:i+7], ' ') AS gram FROM pos),
         cnt AS (SELECT gram, count(*) AS c FROM grams GROUP BY gram)
         SELECT g.doc_id, count(*) AS n_grams,
                CAST(sum(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams,
                round(CAST(sum(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                      / count(*), 4) AS dup_frac
         FROM grams g JOIN cnt c USING (gram)
         GROUP BY g.doc_id""",
    // the same window enumeration, then reconstruction: a token goes iff
    // some non-first occurrence's 8-token window covers it
    "docs_drop_dup_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         pos AS (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i
                 FROM toks WHERE len(w) >= 8),
         grams AS (SELECT doc_id, i, array_to_string(w[i:i+7], ' ') AS gram FROM pos),
         ranked AS (SELECT doc_id, i,
                           row_number() OVER (PARTITION BY gram
                             ORDER BY doc_id, i) AS rn,
                           count(*) OVER (PARTITION BY gram) AS c
                    FROM grams),
         removed AS (SELECT doc_id, i FROM ranked WHERE c > 1 AND rn > 1),
         tokpos AS (SELECT doc_id, unnest(w) AS tok,
                           unnest(range(1, len(w) + 1)) AS p
                    FROM toks),
         kept AS (SELECT t.doc_id, t.tok, t.p,
                         EXISTS (SELECT 1 FROM removed r
                                 WHERE r.doc_id = t.doc_id
                                   AND t.p BETWEEN r.i AND r.i + 7) AS gone
                  FROM tokpos t)
         SELECT doc_id,
                coalesce(string_agg(CASE WHEN NOT gone THEN tok END,
                         ' ' ORDER BY p), '') AS clean_text,
                CAST(sum(CASE WHEN gone THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
         FROM kept GROUP BY doc_id""",
    // prefix filtering has guaranteed recall on both engines, so both sides
    // compute the complete J >= 0.8 pair set — the oracle needs no blocking
    // assumptions beyond the same prefix bound
    // deterministic replay of the full signature pipeline: the PolyHash64
    // token hash (B=1000003 polynomial + splitmix64, pure mod-2^64
    // arithmetic) re-expressed in DuckDB HUGEINT modular arithmetic —
    // 64-bit wrapping multiplies via 32-bit limb splits — then the
    // Charikar bit votes and the band prefix. The croston/bootstrap
    // precedent: a deterministic kernel needs no rows-only exemption.
    // r19 (the r18-verdict task 6): the replay now hashes UTF-8 BYTES —
    // hex(encode(tok)) enumerated as hex pairs (strpos-decoded to the
    // exact unsigned byte values Java's `getBytes` + `& 0xff` produce) —
    // so the former ASCII-only precondition is LIFTED: the byte
    // enumeration equals the engine's on any text, multibyte included
    // (PropertySpec pins engine kernels == byte-level plain-Scala
    // replicas of this formulation on an accented/CJK/emoji corpus).
    // Remaining precondition: the pows table carries B^0..B^4096, so a
    // single token past 4096 BYTES would drop leading terms through the
    // p = L-1-j join (max token in the corpus: 8 bytes).
    "dedup_simhash" ->
      """WITH RECURSIVE pows(p, v) AS (
           SELECT 0, CAST(1 AS HUGEINT)
           UNION ALL
           SELECT p + 1, (v * 1000003) % 18446744073709551616::HUGEINT
           FROM pows WHERE p < 4096
         ),
         toks AS (
           SELECT doc_id, t.tok
           FROM documents, unnest(string_split(lower(text), ' ')) AS t(tok)
         ),
         dtok AS (SELECT DISTINCT tok FROM toks),
         chars AS (
           SELECT tok, u.j AS j,
                  CAST(strpos('0123456789ABCDEF', substr(hx, CAST(u.j AS INT) * 2 + 1, 1)) * 16
                     + strpos('0123456789ABCDEF', substr(hx, CAST(u.j AS INT) * 2 + 2, 1)) - 17 AS HUGEINT) AS b,
                  nb AS L
           FROM (SELECT tok, hex(encode(tok)) AS hx,
                        octet_length(encode(tok)) AS nb FROM dtok) tb,
                unnest(range(nb)) u(j)
         ),
         rawh AS (
           SELECT tok,
                  CAST(sum(b * p1.v) % 18446744073709551616::HUGEINT AS HUGEINT) AS h
           FROM chars JOIN pows p1 ON p1.p = L - 1 - j
           GROUP BY tok, L
         ),
         rawall AS (
           SELECT dtok.tok, coalesce(rawh.h, CAST(0 AS HUGEINT)) AS h
           FROM dtok LEFT JOIN rawh USING (tok)
         ),
         s1 AS (SELECT tok, CAST((h + 11400714819323198485::HUGEINT) % 18446744073709551616::HUGEINT AS UBIGINT) AS x FROM rawall),
         s2 AS (SELECT tok, CAST(xor(x, x >> 30) AS HUGEINT) AS x FROM s1),
         s3 AS (SELECT tok, CAST(((x % 4294967296::HUGEINT) * 13787848793156543929::HUGEINT
                 + (((x // 4294967296::HUGEINT) * 13787848793156543929::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT)
                % 18446744073709551616::HUGEINT AS UBIGINT) AS x FROM s2),
         s4 AS (SELECT tok, CAST(xor(x, x >> 27) AS HUGEINT) AS x FROM s3),
         s5 AS (SELECT tok, CAST(((x % 4294967296::HUGEINT) * 10723151780598845931::HUGEINT
                 + (((x // 4294967296::HUGEINT) * 10723151780598845931::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT)
                % 18446744073709551616::HUGEINT AS UBIGINT) AS x FROM s4),
         th AS (SELECT tok, xor(x, x >> 31) AS th FROM s5),
         votes AS (
           SELECT toks.doc_id, bt.b AS bit,
                  sum(CASE WHEN (th.th >> CAST(bt.b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
           FROM toks JOIN th USING (tok), unnest(range(64)) bt(b)
           GROUP BY toks.doc_id, bt.b
         ),
         sh AS (
           SELECT doc_id,
                  CAST(sum(CASE WHEN v > 0 THEN (1::HUGEINT << CAST(bit AS INT)) ELSE 0::HUGEINT END) AS HUGEINT) AS su
           FROM votes GROUP BY doc_id
         )
         SELECT doc_id AS id,
                CAST(CASE WHEN su >= 9223372036854775808::HUGEINT
                     THEN su - 18446744073709551616::HUGEINT ELSE su END AS BIGINT) AS simhash,
                CAST(su >> 48 AS BIGINT) AS band
         FROM sh""",
    // the MOSS winnowing pipeline replayed exactly: direct 16-byte k-gram
    // polynomial hashes (equal to the engine's rolling form in the mod-2^64
    // ring), splitmix64 via 32-bit limb modular multiplies, signed-long
    // window minima, distinct fingerprints, df-pruned pair counts.
    "text_winnow_fp" ->
      """WITH RECURSIVE pows(p, v) AS (
           SELECT 0, CAST(1 AS HUGEINT)
           UNION ALL
           SELECT p + 1, (v * 1000003) % 18446744073709551616::HUGEINT
           FROM pows WHERE p < 16
         ),
         docs AS (SELECT doc_id, hex(encode(text)) AS hx,
                         octet_length(encode(text)) AS n FROM documents),
         chars AS (
           SELECT doc_id, u.j AS pos,
                  CAST(strpos('0123456789ABCDEF', substr(hx, CAST(u.j AS INT) * 2 + 1, 1)) * 16
                     + strpos('0123456789ABCDEF', substr(hx, CAST(u.j AS INT) * 2 + 2, 1)) - 17 AS HUGEINT) AS b, n
           FROM docs, unnest(range(n)) u(j)
         ),
         rawg AS (
           SELECT doc_id, pos - p1.p_rev AS gpos,
                  CAST(sum(b * p1.v) % 18446744073709551616::HUGEINT AS HUGEINT) AS h
           FROM chars
           JOIN (SELECT p, v, 15 - p AS p_rev FROM pows WHERE p <= 15) p1 ON true
           WHERE pos - p1.p_rev >= 0 AND pos - p1.p_rev <= n - 16
           GROUP BY doc_id, pos - p1.p_rev
         ),
         s1 AS (SELECT doc_id, gpos, CAST((h + 11400714819323198485::HUGEINT) % 18446744073709551616::HUGEINT AS UBIGINT) AS x FROM rawg),
         s2 AS (SELECT doc_id, gpos, CAST(xor(x, x >> 30) AS HUGEINT) AS x FROM s1),
         s3 AS (SELECT doc_id, gpos, CAST(((x % 4294967296::HUGEINT) * 13787848793156543929::HUGEINT
                 + (((x // 4294967296::HUGEINT) * 13787848793156543929::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT)
                % 18446744073709551616::HUGEINT AS UBIGINT) AS x FROM s2),
         s4 AS (SELECT doc_id, gpos, CAST(xor(x, x >> 27) AS HUGEINT) AS x FROM s3),
         s5 AS (SELECT doc_id, gpos, CAST(((x % 4294967296::HUGEINT) * 10723151780598845931::HUGEINT
                 + (((x // 4294967296::HUGEINT) * 10723151780598845931::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT)
                % 18446744073709551616::HUGEINT AS UBIGINT) AS x FROM s4),
         grams AS (
           SELECT doc_id, gpos,
                  CAST(CASE WHEN xor(x, x >> 31) >= 9223372036854775808::UBIGINT
                       THEN CAST(xor(x, x >> 31) - 9223372036854775808::UBIGINT AS BIGINT) + (-9223372036854775807 - 1)
                       ELSE CAST(xor(x, x >> 31) AS BIGINT) END AS BIGINT) AS g,
                  max(gpos) OVER (PARTITION BY doc_id) + 1 AS ngrams
           FROM s5
         ),
         wins AS (
           SELECT doc_id, gpos, ngrams,
                  min(g) OVER (PARTITION BY doc_id ORDER BY gpos
                               ROWS BETWEEN CURRENT ROW AND 31 FOLLOWING) AS wmin
           FROM grams
         ),
         fps AS (
           SELECT DISTINCT doc_id, wmin AS fp
           FROM wins WHERE ngrams > 32 AND gpos <= ngrams - 32
           UNION
           SELECT doc_id, min(g) AS fp FROM grams WHERE ngrams <= 32 GROUP BY doc_id
         ),
         dfc AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) BETWEEN 2 AND 50),
         pruned AS (SELECT doc_id, fp FROM fps JOIN dfc USING (fp))
         SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS n_shared
         FROM pruned l JOIN pruned r ON l.fp = r.fp AND l.doc_id < r.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 3""",
    // the TokenMinHash kernel (FNV-1a token/shingle hashes, 64 universal
    // permutations, banded FNV digests) is pure mod-2^64 arithmetic, so the
    // whole LSH pipeline replays in DuckDB: the recursive CTE folds FNV
    // byte-by-byte over the distinct vocabulary, shingles fold w token
    // hashes inline, and the band-bucket join reproduces the candidate set
    // exactly. FNV's multiplier is ~2^40, so HUGEINT holds the product
    // directly (no limb split needed).
    "dedup_minhash_lsh" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, u.i AS tpos,
                  list_extract(string_split(lower(text), ' '), CAST(u.i AS INT) + 1) AS tok,
                  len(string_split(lower(text), ' ')) AS n
           FROM documents, unnest(range(len(string_split(lower(text), ' ')))) u(i)
         ),
         dtok AS (SELECT DISTINCT tok FROM toks),
         -- FNV-1a over token bytes: recursive fold, all tokens advance one byte per step
         fnv(tok, hx, nb, i, h) AS (
           SELECT tok, hex(encode(tok)), octet_length(encode(tok)), 0,
                  14695981039346656037::UBIGINT FROM dtok
           UNION ALL
           SELECT tok, hx, nb, i + 1,
                  CAST((CAST(xor(h, CAST(strpos('0123456789ABCDEF', substr(hx, i * 2 + 1, 1)) * 16
                        + strpos('0123456789ABCDEF', substr(hx, i * 2 + 2, 1)) - 17 AS UBIGINT)) AS HUGEINT)
                        * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT)
           FROM fnv WHERE i < nb
         ),
         th AS (SELECT tok, h FROM fnv WHERE i = nb),
         tokh AS (
           SELECT t.doc_id, t.tpos, t.n, th.h
           FROM toks t JOIN th USING (tok)
         ),
         -- shingle fold over w=3 token hashes (i+j < n guard), order-sensitive
         sh0 AS (
           SELECT doc_id, tpos, n, h AS h1,
                  lead(h, 1) OVER (PARTITION BY doc_id ORDER BY tpos) AS h2,
                  lead(h, 2) OVER (PARTITION BY doc_id ORDER BY tpos) AS h3
           FROM tokh
         ),
         shingles AS (
           SELECT doc_id,
                  CAST(( CASE WHEN h3 IS NOT NULL THEN
                      CAST((CAST(xor(
                        CAST((CAST(xor(
                          CAST((CAST(xor(14695981039346656037::UBIGINT, h1) AS HUGEINT) * 1099511628211)
                               % 18446744073709551616::HUGEINT AS UBIGINT),
                          h2) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT),
                        h3) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT)
                    WHEN h2 IS NOT NULL THEN
                      CAST((CAST(xor(
                        CAST((CAST(xor(14695981039346656037::UBIGINT, h1) AS HUGEINT) * 1099511628211)
                             % 18446744073709551616::HUGEINT AS UBIGINT),
                        h2) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT)
                    ELSE
                      CAST((CAST(xor(14695981039346656037::UBIGINT, h1) AS HUGEINT) * 1099511628211)
                           % 18446744073709551616::HUGEINT AS UBIGINT)
                  END ) & 2147483647::UBIGINT AS BIGINT) AS sh
           FROM sh0
           WHERE tpos <= greatest(n - 3, 0)
         ),
         -- k=64 permutation minima per doc
         perms AS (
           SELECT doc_id, pp.p AS p,
                  min((sh * (2 * pp.p + 1) + pp.p * 2654435769) % 2147483647) AS mn
           FROM shingles, unnest(range(64)) pp(p)
           GROUP BY doc_id, pp.p
         ),
         -- band digests: FNV fold over each band's 4 minima in p order
         bandvals AS (
           SELECT doc_id, CAST(p // 4 AS INT) AS band, list(mn ORDER BY p) AS l
           FROM perms GROUP BY doc_id, CAST(p // 4 AS INT)
         ),
         digs AS (
           SELECT doc_id, band,
           CAST((CAST(xor(
             CAST((CAST(xor(
               CAST((CAST(xor(
                 CAST((CAST(xor(
                   xor(14695981039346656037::UBIGINT, CAST(band AS UBIGINT)),
                   CAST(l[1] AS UBIGINT)) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT),
                 CAST(l[2] AS UBIGINT)) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT),
               CAST(l[3] AS UBIGINT)) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT),
             CAST(l[4] AS UBIGINT)) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT) AS dig
           FROM bandvals
         ),
         buckets AS (
           SELECT band, dig, list(doc_id) AS ids
           FROM digs GROUP BY band, dig
           HAVING len(list(doc_id)) BETWEEN 2 AND 1000
         ),
         pairs AS (
           SELECT a.id_a, b.id_b
           FROM (SELECT band, dig, unnest(ids) AS id_a FROM buckets) a
           JOIN (SELECT band, dig, unnest(ids) AS id_b FROM buckets) b
             ON a.band = b.band AND a.dig = b.dig AND a.id_a < b.id_b
         )
         SELECT id_a, id_b, count(*) AS n_shared_bands
         FROM pairs GROUP BY 1, 2""",
    // same FNV machinery at shingle width 1, then the exact-Jaccard verify
    // over distinct token sets (hashing is injective on the vocabulary, so
    // hashed-set Jaccard equals token-set Jaccard - the dedup_ngram_jaccard
    // equivalence)
    "dedup_jaccard_banded" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, u.i AS tpos,
                  list_extract(string_split(lower(text), ' '), CAST(u.i AS INT) + 1) AS tok,
                  len(string_split(lower(text), ' ')) AS n
           FROM documents, unnest(range(len(string_split(lower(text), ' ')))) u(i)
         ),
         dtok AS (SELECT DISTINCT tok FROM toks),
         fnv(tok, hx, nb, i, h) AS (
           SELECT tok, hex(encode(tok)), octet_length(encode(tok)), 0,
                  14695981039346656037::UBIGINT FROM dtok
           UNION ALL
           SELECT tok, hx, nb, i + 1,
                  CAST((CAST(xor(h, CAST(strpos('0123456789ABCDEF', substr(hx, i * 2 + 1, 1)) * 16
                        + strpos('0123456789ABCDEF', substr(hx, i * 2 + 2, 1)) - 17 AS UBIGINT)) AS HUGEINT)
                        * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT)
           FROM fnv WHERE i < nb
         ),
         th AS (SELECT tok, h FROM fnv WHERE i = nb),
         -- w=1 shingles: one FNV step per token occurrence
         shingles AS (
           SELECT t.doc_id,
                  CAST(CAST((CAST(xor(14695981039346656037::UBIGINT, th.h) AS HUGEINT) * 1099511628211)
                       % 18446744073709551616::HUGEINT AS UBIGINT) & 2147483647::UBIGINT AS BIGINT) AS sh
           FROM toks t JOIN th USING (tok)
         ),
         perms AS (
           SELECT doc_id, pp.p AS p,
                  min((sh * (2 * pp.p + 1) + pp.p * 2654435769) % 2147483647) AS mn
           FROM shingles, unnest(range(64)) pp(p)
           GROUP BY doc_id, pp.p
         ),
         bandvals AS (
           SELECT doc_id, CAST(p // 4 AS INT) AS band, list(mn ORDER BY p) AS l
           FROM perms GROUP BY doc_id, CAST(p // 4 AS INT)
         ),
         digs AS (
           SELECT doc_id, band,
           CAST((CAST(xor(
             CAST((CAST(xor(
               CAST((CAST(xor(
                 CAST((CAST(xor(
                   xor(14695981039346656037::UBIGINT, CAST(band AS UBIGINT)),
                   CAST(l[1] AS UBIGINT)) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT),
                 CAST(l[2] AS UBIGINT)) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT),
               CAST(l[3] AS UBIGINT)) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT),
             CAST(l[4] AS UBIGINT)) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT) AS dig
           FROM bandvals
         ),
         buckets AS (
           SELECT band, dig, list(doc_id) AS ids
           FROM digs GROUP BY band, dig
           HAVING len(list(doc_id)) BETWEEN 2 AND 1000
         ),
         cands AS (
           SELECT DISTINCT a.id_a, b.id_b
           FROM (SELECT band, dig, unnest(ids) AS id_a FROM buckets) a
           JOIN (SELECT band, dig, unnest(ids) AS id_b FROM buckets) b
             ON a.band = b.band AND a.dig = b.dig AND a.id_a < b.id_b
         ),
         wsets AS (
           SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS words
           FROM documents
         )
         SELECT c.id_a, c.id_b,
                CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.words, b.words))) AS jaccard
         FROM cands c JOIN wsets a ON c.id_a = a.doc_id JOIN wsets b ON c.id_b = b.doc_id
         WHERE CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.words, b.words))) >= 0.8""",
    // minhash band-bucket candidates intersected with the hamming ball:
    // the pigeonhole band condition is IMPLIED at hamming <= maxDist (any
    // such pair shares some pigeonhole band bit-exactly), so the oracle
    // needs only the minhash block + bit_count filter over the PolyHash64
    // simhash signatures
    "dedup_simhash_blocked" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, u.i AS tpos,
                  list_extract(string_split(lower(text), ' '), CAST(u.i AS INT) + 1) AS tok,
                  len(string_split(lower(text), ' ')) AS n
           FROM documents, unnest(range(len(string_split(lower(text), ' ')))) u(i)
         ),
         dtok AS (SELECT DISTINCT tok FROM toks),
         -- FNV-1a over token bytes: recursive fold, all tokens advance one byte per step
         fnv(tok, hx, nb, i, h) AS (
           SELECT tok, hex(encode(tok)), octet_length(encode(tok)), 0,
                  14695981039346656037::UBIGINT FROM dtok
           UNION ALL
           SELECT tok, hx, nb, i + 1,
                  CAST((CAST(xor(h, CAST(strpos('0123456789ABCDEF', substr(hx, i * 2 + 1, 1)) * 16
                        + strpos('0123456789ABCDEF', substr(hx, i * 2 + 2, 1)) - 17 AS UBIGINT)) AS HUGEINT)
                        * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT)
           FROM fnv WHERE i < nb
         ),
         th AS (SELECT tok, h FROM fnv WHERE i = nb),
         tokh AS (
           SELECT t.doc_id, t.tpos, t.n, th.h
           FROM toks t JOIN th USING (tok)
         ),
         -- shingle fold over w=3 token hashes (i+j < n guard), order-sensitive
         sh0 AS (
           SELECT doc_id, tpos, n, h AS h1,
                  lead(h, 1) OVER (PARTITION BY doc_id ORDER BY tpos) AS h2,
                  lead(h, 2) OVER (PARTITION BY doc_id ORDER BY tpos) AS h3
           FROM tokh
         ),
         shingles AS (
           SELECT doc_id,
                  CAST(( CASE WHEN h3 IS NOT NULL THEN
                      CAST((CAST(xor(
                        CAST((CAST(xor(
                          CAST((CAST(xor(14695981039346656037::UBIGINT, h1) AS HUGEINT) * 1099511628211)
                               % 18446744073709551616::HUGEINT AS UBIGINT),
                          h2) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT),
                        h3) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT)
                    WHEN h2 IS NOT NULL THEN
                      CAST((CAST(xor(
                        CAST((CAST(xor(14695981039346656037::UBIGINT, h1) AS HUGEINT) * 1099511628211)
                             % 18446744073709551616::HUGEINT AS UBIGINT),
                        h2) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT)
                    ELSE
                      CAST((CAST(xor(14695981039346656037::UBIGINT, h1) AS HUGEINT) * 1099511628211)
                           % 18446744073709551616::HUGEINT AS UBIGINT)
                  END ) & 2147483647::UBIGINT AS BIGINT) AS sh
           FROM sh0
           WHERE tpos <= greatest(n - 3, 0)
         ),
         -- k=64 permutation minima per doc
         perms AS (
           SELECT doc_id, pp.p AS p,
                  min((sh * (2 * pp.p + 1) + pp.p * 2654435769) % 2147483647) AS mn
           FROM shingles, unnest(range(64)) pp(p)
           GROUP BY doc_id, pp.p
         ),
         -- band digests: FNV fold over each band's 4 minima in p order
         bandvals AS (
           SELECT doc_id, CAST(p // 4 AS INT) AS band, list(mn ORDER BY p) AS l
           FROM perms GROUP BY doc_id, CAST(p // 4 AS INT)
         ),
         digs AS (
           SELECT doc_id, band,
           CAST((CAST(xor(
             CAST((CAST(xor(
               CAST((CAST(xor(
                 CAST((CAST(xor(
                   xor(14695981039346656037::UBIGINT, CAST(band AS UBIGINT)),
                   CAST(l[1] AS UBIGINT)) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT),
                 CAST(l[2] AS UBIGINT)) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT),
               CAST(l[3] AS UBIGINT)) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT),
             CAST(l[4] AS UBIGINT)) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT) AS dig
           FROM bandvals
         ),
         
         sdocs AS (
           SELECT doc_id, t.tok FROM documents, unnest(string_split(lower(text), ' ')) AS t(tok)
         ),
         sdtok AS (SELECT DISTINCT tok FROM sdocs),
         ppows(p, v) AS (
           SELECT 0, CAST(1 AS HUGEINT)
           UNION ALL
           SELECT p + 1, (v * 1000003) % 18446744073709551616::HUGEINT FROM ppows WHERE p < 4096
         ),
         schars AS (
           SELECT tok, u.j AS j,
                  CAST(strpos('0123456789ABCDEF', substr(hx, CAST(u.j AS INT) * 2 + 1, 1)) * 16
                     + strpos('0123456789ABCDEF', substr(hx, CAST(u.j AS INT) * 2 + 2, 1)) - 17 AS HUGEINT) AS b,
                  nb AS L
           FROM (SELECT tok, hex(encode(tok)) AS hx,
                        octet_length(encode(tok)) AS nb FROM sdtok) tb,
                unnest(range(nb)) u(j)
         ),
         spows AS (SELECT p, v FROM ppows),
         srawh AS (
           SELECT tok, CAST(sum(b * sp.v) % 18446744073709551616::HUGEINT AS HUGEINT) AS h
           FROM schars JOIN spows sp ON sp.p = L - 1 - j
           GROUP BY tok, L
         ),
         srawall AS (SELECT sdtok.tok, coalesce(srawh.h, CAST(0 AS HUGEINT)) AS h FROM sdtok LEFT JOIN srawh USING (tok)),
         ss1 AS (SELECT tok, CAST((h + 11400714819323198485::HUGEINT) % 18446744073709551616::HUGEINT AS UBIGINT) AS x FROM srawall),
         ss2 AS (SELECT tok, CAST(xor(x, x >> 30) AS HUGEINT) AS x FROM ss1),
         ss3 AS (SELECT tok, CAST(((x % 4294967296::HUGEINT) * 13787848793156543929::HUGEINT
                 + (((x // 4294967296::HUGEINT) * 13787848793156543929::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT)
                % 18446744073709551616::HUGEINT AS UBIGINT) AS x FROM ss2),
         ss4 AS (SELECT tok, CAST(xor(x, x >> 27) AS HUGEINT) AS x FROM ss3),
         ss5 AS (SELECT tok, CAST(((x % 4294967296::HUGEINT) * 10723151780598845931::HUGEINT
                 + (((x // 4294967296::HUGEINT) * 10723151780598845931::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT)
                % 18446744073709551616::HUGEINT AS UBIGINT) AS x FROM ss4),
         sth AS (SELECT tok, xor(x, x >> 31) AS th FROM ss5),
         svotes AS (
           SELECT sdocs.doc_id, bt.b AS bit,
                  sum(CASE WHEN (sth.th >> CAST(bt.b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
           FROM sdocs JOIN sth USING (tok), unnest(range(64)) bt(b)
           GROUP BY sdocs.doc_id, bt.b
         ),
         ssig AS (
           SELECT doc_id,
                  CAST(sum(CASE WHEN v > 0 THEN (1::UBIGINT << CAST(bit AS INT)) ELSE 0::UBIGINT END) AS UBIGINT) AS sh
           FROM svotes GROUP BY doc_id
         ),
         cands AS (
           SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           FROM digs a JOIN digs b ON a.band = b.band AND a.dig = b.dig AND a.doc_id < b.doc_id
         )
         SELECT c.id_a, c.id_b, CAST(bit_count(xor(sa.sh, sb.sh)) AS INTEGER) AS hamming_dist
         FROM cands c JOIN ssig sa ON c.id_a = sa.doc_id JOIN ssig sb ON c.id_b = sb.doc_id
         WHERE bit_count(xor(sa.sh, sb.sh)) <= 8""",
    // minhash candidates -> connected components (recursive reachability
    // closure; component label = min reachable id, the fixpoint of the
    // engine's min-label propagation regardless of its round structure) ->
    // per-component quality argmax (q desc, id asc - Spark's
    // max_by(id, struct(q, -id))). Quality is the docs_quality_filter twin.
    "dedup_clusters" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, u.i AS tpos,
                  list_extract(string_split(lower(text), ' '), CAST(u.i AS INT) + 1) AS tok,
                  len(string_split(lower(text), ' ')) AS n
           FROM documents, unnest(range(len(string_split(lower(text), ' ')))) u(i)
         ),
         dtok AS (SELECT DISTINCT tok FROM toks),
         -- FNV-1a over token bytes: recursive fold, all tokens advance one byte per step
         fnv(tok, hx, nb, i, h) AS (
           SELECT tok, hex(encode(tok)), octet_length(encode(tok)), 0,
                  14695981039346656037::UBIGINT FROM dtok
           UNION ALL
           SELECT tok, hx, nb, i + 1,
                  CAST((CAST(xor(h, CAST(strpos('0123456789ABCDEF', substr(hx, i * 2 + 1, 1)) * 16
                        + strpos('0123456789ABCDEF', substr(hx, i * 2 + 2, 1)) - 17 AS UBIGINT)) AS HUGEINT)
                        * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT)
           FROM fnv WHERE i < nb
         ),
         th AS (SELECT tok, h FROM fnv WHERE i = nb),
         tokh AS (
           SELECT t.doc_id, t.tpos, t.n, th.h
           FROM toks t JOIN th USING (tok)
         ),
         -- shingle fold over w=3 token hashes (i+j < n guard), order-sensitive
         sh0 AS (
           SELECT doc_id, tpos, n, h AS h1,
                  lead(h, 1) OVER (PARTITION BY doc_id ORDER BY tpos) AS h2,
                  lead(h, 2) OVER (PARTITION BY doc_id ORDER BY tpos) AS h3
           FROM tokh
         ),
         shingles AS (
           SELECT doc_id,
                  CAST(( CASE WHEN h3 IS NOT NULL THEN
                      CAST((CAST(xor(
                        CAST((CAST(xor(
                          CAST((CAST(xor(14695981039346656037::UBIGINT, h1) AS HUGEINT) * 1099511628211)
                               % 18446744073709551616::HUGEINT AS UBIGINT),
                          h2) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT),
                        h3) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT)
                    WHEN h2 IS NOT NULL THEN
                      CAST((CAST(xor(
                        CAST((CAST(xor(14695981039346656037::UBIGINT, h1) AS HUGEINT) * 1099511628211)
                             % 18446744073709551616::HUGEINT AS UBIGINT),
                        h2) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT)
                    ELSE
                      CAST((CAST(xor(14695981039346656037::UBIGINT, h1) AS HUGEINT) * 1099511628211)
                           % 18446744073709551616::HUGEINT AS UBIGINT)
                  END ) & 2147483647::UBIGINT AS BIGINT) AS sh
           FROM sh0
           WHERE tpos <= greatest(n - 3, 0)
         ),
         -- k=64 permutation minima per doc
         perms AS (
           SELECT doc_id, pp.p AS p,
                  min((sh * (2 * pp.p + 1) + pp.p * 2654435769) % 2147483647) AS mn
           FROM shingles, unnest(range(64)) pp(p)
           GROUP BY doc_id, pp.p
         ),
         -- band digests: FNV fold over each band's 4 minima in p order
         bandvals AS (
           SELECT doc_id, CAST(p // 4 AS INT) AS band, list(mn ORDER BY p) AS l
           FROM perms GROUP BY doc_id, CAST(p // 4 AS INT)
         ),
         digs AS (
           SELECT doc_id, band,
           CAST((CAST(xor(
             CAST((CAST(xor(
               CAST((CAST(xor(
                 CAST((CAST(xor(
                   xor(14695981039346656037::UBIGINT, CAST(band AS UBIGINT)),
                   CAST(l[1] AS UBIGINT)) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT),
                 CAST(l[2] AS UBIGINT)) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT),
               CAST(l[3] AS UBIGINT)) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT),
             CAST(l[4] AS UBIGINT)) AS HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT AS UBIGINT) AS dig
           FROM bandvals
         ),
         buckets AS (
           SELECT band, dig, list(doc_id) AS ids
           FROM digs GROUP BY band, dig
           HAVING len(list(doc_id)) BETWEEN 2 AND 1000
         ),
         pairs AS (
           SELECT a.id_a, b.id_b
           FROM (SELECT band, dig, unnest(ids) AS id_a FROM buckets) a
           JOIN (SELECT band, dig, unnest(ids) AS id_b FROM buckets) b
             ON a.band = b.band AND a.dig = b.dig AND a.id_a < b.id_b
         ),
         edges AS (
           SELECT id_a AS a, id_b AS b FROM pairs
           UNION
           SELECT id_b AS a, id_a AS b FROM pairs
         ),
         reach(id, m) AS (
           SELECT a, a FROM edges
           UNION
           SELECT e.b, r.m FROM reach r JOIN edges e ON e.a = r.id
         ),
         comps AS (SELECT id, min(m) AS comp FROM reach GROUP BY id),
         quality AS (
           SELECT doc_id,
                  (CAST(len(list_filter(string_split(text, ' '),
                       x -> x IN ('the','a','an','and','of','to','in','is'))) AS DOUBLE)
                     / len(string_split(text, ' '))
                   + CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 0.5 ELSE 0.0 END)
                   - CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                     / length(text) AS q
           FROM documents
         ),
         scored AS (
           SELECT q.doc_id AS id, q.q, coalesce(c.comp, q.doc_id) AS component
           FROM quality q LEFT JOIN comps c ON q.doc_id = c.id
         ),
         ranked AS (
           SELECT id, component, q,
                  row_number() OVER (PARTITION BY component ORDER BY q DESC, id ASC) AS rn
           FROM scored
         )
         SELECT s.id, s.component, (s.id = w.id) AS keep
         FROM scored s
         JOIN (SELECT component, id FROM ranked WHERE rn = 1) w USING (component)""",
    "dedup_ngram_jaccard" ->
      """WITH d AS (SELECT doc_id AS id,
                           list_distinct(string_split(lower(text), ' ')) AS words
                    FROM documents),
         tok AS (SELECT id, unnest(words) AS w, len(words) AS n FROM d),
         f AS (SELECT w, count(*) AS df FROM tok GROUP BY w),
         pfx AS (SELECT id, w FROM (
                   SELECT t.id, t.w, t.n,
                          row_number() OVER (PARTITION BY t.id ORDER BY f.df, t.w) AS rn
                   FROM tok t JOIN f USING (w))
                 WHERE rn <= n - ceil(n * 0.8) + 1),
         cand AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b
                  FROM pfx l JOIN pfx r ON l.w = r.w AND l.id < r.id)
         SELECT c.id_a, c.id_b,
                CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.words, b.words))) AS jaccard
         FROM cand c JOIN d a ON c.id_a = a.id JOIN d b ON c.id_b = b.id
         WHERE CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.words, b.words))) >= 0.8""",
    "knn_brute_force" ->
      """SELECT query_id, corpus_id, rk FROM (
           SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
                  row_number() OVER (PARTITION BY q.vec_id
                    ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rk
           FROM embeddings c, embeddings q
           WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id)
         WHERE rk <= 5""",
    "mm_frame_sample" ->
      """SELECT doc_id,
                CAST(ceil(floor(octet_length(encode(text)) / 64) / 4.0) AS BIGINT) AS n_sampled,
                CAST(ceil(floor(octet_length(encode(text)) / 64) / 4.0) AS BIGINT) * 64 AS sampled_bytes
         FROM documents
         WHERE octet_length(encode(text)) >= 64""",
    "mm_meta_stats" ->
      """SELECT 'img/' || CAST(doc_id % 3 AS VARCHAR) AS media_type,
                count(*) AS n_items,
                CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
                CAST(sum((64 + doc_id % 448) * (64 + (doc_id * 7) % 448)) AS BIGINT) AS total_pixels,
                min(CAST(64 + doc_id % 448 AS INT)) AS min_width,
                max(CAST(64 + (doc_id * 7) % 448 AS INT)) AS max_height
         FROM documents GROUP BY media_type""",
    "mm_audio_probe" ->
      """WITH p AS (SELECT doc_id,
                           1 + (doc_id % 2) AS channels,
                           8000 + (doc_id % 3) * 4000 AS sample_rate_hz,
                           4000 + (doc_id % 5) * 1000 AS data_len
                    FROM documents)
         SELECT channels, sample_rate_hz, count(*) AS n_items,
                CAST(sum((data_len * 1000) // (sample_rate_hz * channels * 2)) AS BIGINT)
                  AS sum_duration_ms,
                'wav' AS format
         FROM p GROUP BY 1, 2""",
    // the probe's decoded fields re-derived from the id arithmetic the
    // payload builder used — duration floors exactly like the decoder
    "mm_flac_probe" ->
      """WITH p AS (SELECT doc_id,
                           1 + (doc_id % 2) AS channels,
                           8000 + (doc_id % 5) * 8000 AS sample_rate_hz,
                           10000 + (doc_id % 7) * 4410 AS total_samples
                    FROM documents)
         SELECT channels, sample_rate_hz, count(*) AS n_items,
                CAST(sum((total_samples * 1000) // sample_rate_hz) AS BIGINT)
                  AS sum_duration_ms,
                'flac' AS format
         FROM p GROUP BY 1, 2""",
    // dimensions re-derived from the id arithmetic the TIFF builder used;
    // a byte-order or value-layout bug would shift widths and mismatch
    "mm_tiff_probe" ->
      """WITH p AS (SELECT doc_id, 16 + (doc_id % 64) AS w,
                           16 + ((doc_id // 3) % 48) AS h
                    FROM documents)
         SELECT CAST(w AS BIGINT) AS width,
                count(*) AS n_items,
                CAST(sum(h) AS BIGINT) AS sum_height,
                'tiff' AS format
         FROM p GROUP BY 1""",
    // duration = frames·1152000 // rate with the same table lookups the
    // payload builder used; the walk itself is pinned by counting right
    "mm_mp3_probe" ->
      """WITH rates AS (SELECT * FROM (VALUES (0, 44100), (1, 48000),
                  (2, 32000)) AS r(ri, rate)),
         p AS (SELECT doc_id, 1 + (doc_id % 2) AS channels,
                      doc_id % 3 AS ri, 5 + (doc_id % 9) AS frames
               FROM documents)
         SELECT p.channels, CAST(r.rate AS BIGINT) AS sample_rate_hz,
                count(*) AS n_items,
                CAST(sum((p.frames * 1152000) // r.rate) AS BIGINT)
                  AS sum_duration_ms,
                'mp3' AS format
         FROM p JOIN rates r ON r.ri = p.ri
         GROUP BY 1, 2""",
    // regenerate the deterministic PCM stream and fold the same stats the
    // decoder reads out of the payload bytes; all-integer until the final
    // RMS, whose sqrt both engines compute on the identical double
    "mm_audio_stats" ->
      """WITH n AS (SELECT doc_id, 200 + (doc_id % 5) * 50 AS ns FROM documents),
         s AS (SELECT doc_id, ns, unnest(range(0, ns)) AS i FROM n),
         v AS (SELECT doc_id, ns, ((doc_id * 31 + i * 7919) % 65536) - 32768 AS x FROM s)
         SELECT doc_id, CAST(max(ns) AS BIGINT) AS n_samples,
                CAST(max(abs(x)) AS BIGINT) AS peak,
                CAST(sum(CASE WHEN x >= 32767 OR x <= -32768 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_clipped,
                round(sqrt(CAST(sum(x * x) AS BIGINT) / max(ns)), 4) AS rms
         FROM v GROUP BY doc_id""",
    // the G.711 expansions re-run as integer bit math in SQL (µ-law:
    // complement, mantissa<<3 + 0x84 shifted by the segment; A-law:
    // xor 0x55, segment-0/1 offsets then shifts) — the exact CCITT
    // reference formulas the decoder implements
    "mm_audio_g711" ->
      """WITH d AS (SELECT doc_id, 150 + (doc_id % 4) * 50 AS n,
                           doc_id % 2 = 0 AS ulaw
                    FROM documents),
         codes AS (SELECT doc_id, ulaw, (doc_id * 13 + i.i * 97) % 256 AS c
                   FROM d, unnest(range(0, d.n)) AS i(i)),
         u AS (SELECT doc_id, 255 - c AS u FROM codes WHERE ulaw),
         udec AS (SELECT doc_id, CASE WHEN u >= 128 THEN 132 - t ELSE t - 132 END AS v
                  FROM (SELECT doc_id, u,
                          ((u % 16) * 8 + 132) * (1 << ((u % 128) // 16)) AS t
                        FROM u)),
         a AS (SELECT doc_id, xor(c, 85) AS a FROM codes WHERE NOT ulaw),
         adec AS (SELECT doc_id, CASE WHEN a >= 128 THEN t ELSE -t END AS v
                  FROM (SELECT doc_id, a,
                          CASE WHEN (a % 128) // 16 = 0 THEN (a % 16) * 16 + 8
                               WHEN (a % 128) // 16 = 1 THEN (a % 16) * 16 + 264
                               ELSE ((a % 16) * 16 + 264)
                                    * (1 << ((a % 128) // 16 - 1)) END AS t
                        FROM a)),
         allv AS (SELECT * FROM udec UNION ALL SELECT * FROM adec)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
                CAST(max(abs(v)) AS BIGINT) AS peak,
                CAST(sum(CASE WHEN v >= 32767 OR v <= -32768 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_clipped,
                CAST(sum(v * v) AS BIGINT) AS sum_squares
         FROM allv GROUP BY doc_id""",
    // the identical id-derived pixel field re-generated arithmetically —
    // channel sums and the BT.601 peak are row-order-invariant, so one
    // formula covers the bottom-up and top-down halves of the lake
    "mm_image_stats" ->
      """WITH d AS (SELECT doc_id, 2 + doc_id % 6 AS w, 1 + doc_id % 4 AS h
                    FROM documents),
         px AS (
           SELECT d.doc_id,
                  (d.doc_id * 7 + x.x * 13 + y.y * 31) % 256 AS r,
                  (d.doc_id * 11 + x.x * 17 + y.y * 37) % 256 AS g,
                  (d.doc_id * 13 + x.x * 19 + y.y * 41) % 256 AS b2
           FROM d, unnest(range(0, d.w)) AS x(x),
                unnest(range(0, d.h)) AS y(y))
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pixels,
                CAST(sum(r) AS BIGINT) AS sum_r,
                CAST(sum(g) AS BIGINT) AS sum_g,
                CAST(sum(b2) AS BIGINT) AS sum_b,
                CAST(max(299 * r + 587 * g + 114 * b2) AS BIGINT) AS peak_luma
         FROM px GROUP BY doc_id""",
    // the GIF lake's id-derived palette + index field, regenerated
    // arithmetically — the decode ran genuine LZW to get here, the oracle
    // never touches a byte of it
    "mm_gif_stats" ->
      """WITH d AS (SELECT doc_id, 3 + doc_id % 6 AS w, 2 + doc_id % 4 AS h
                    FROM documents),
         px AS (
           SELECT d.doc_id,
                  (d.doc_id + x.x * 5 + y.y * 17) % 256 AS idx
           FROM d, unnest(range(0, d.w)) AS x(x),
                unnest(range(0, d.h)) AS y(y)),
         rgb AS (
           SELECT doc_id,
                  (doc_id * 3 + idx * 7) % 256 AS r,
                  (doc_id * 5 + idx * 11) % 256 AS g,
                  (doc_id * 7 + idx * 13) % 256 AS b2
           FROM px)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pixels,
                CAST(sum(r) AS BIGINT) AS sum_r,
                CAST(sum(g) AS BIGINT) AS sum_g,
                CAST(sum(b2) AS BIGINT) AS sum_b,
                CAST(max(299 * r + 587 * g + 114 * b2) AS BIGINT) AS peak_luma
         FROM rgb GROUP BY doc_id""",
    // the PNG lake's id-derived pixel field, regenerated arithmetically —
    // the decode ran inflate + filter reconstruction to get here, the
    // oracle never touches a byte of it
    "mm_png_stats" ->
      """WITH d AS (SELECT doc_id, 2 + doc_id % 5 AS w, 1 + doc_id % 3 AS h
                    FROM documents),
         px AS (
           SELECT d.doc_id,
                  (d.doc_id * 5 + x.x * 11 + y.y * 23) % 256 AS r,
                  (d.doc_id * 7 + x.x * 13 + y.y * 29) % 256 AS g,
                  (d.doc_id * 9 + x.x * 17 + y.y * 31) % 256 AS b2
           FROM d, unnest(range(0, d.w)) AS x(x),
                unnest(range(0, d.h)) AS y(y))
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pixels,
                CAST(sum(r) AS BIGINT) AS sum_r,
                CAST(sum(g) AS BIGINT) AS sum_g,
                CAST(sum(b2) AS BIGINT) AS sum_b,
                CAST(max(299 * r + 587 * g + 114 * b2) AS BIGINT) AS peak_luma
         FROM px GROUP BY doc_id""",
    "cdc_snapshot_diff" ->
      """WITH vm AS (SELECT max(event_id) AS v2 FROM events),
         s1 AS (SELECT user_id, max(event_id) AS ver,
                       arg_max(event_type, event_id) = 'error' AS del
                FROM events, vm WHERE event_id <= v2 // 2 GROUP BY user_id),
         s2 AS (SELECT user_id, max(event_id) AS ver,
                       arg_max(event_type, event_id) = 'error' AS del
                FROM events, vm WHERE event_id <= v2 GROUP BY user_id)
         SELECT s2.user_id, s1.ver AS v1_version, s2.ver AS v2_version,
                CASE WHEN s1.user_id IS NULL OR s1.del THEN 'added'
                     WHEN s2.del THEN 'removed'
                     WHEN s1.ver = s2.ver THEN 'unchanged'
                     ELSE 'changed' END AS change
         FROM s2 LEFT JOIN s1 USING (user_id)
         WHERE (s1.user_id IS NOT NULL AND NOT s1.del) OR NOT s2.del""",
    "dedup_survivors" ->
      """SELECT doc_id, text, lang, source, n_chars, n_copies FROM (
           SELECT *, count(*) OVER (PARTITION BY fp) AS n_copies,
                  row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
           FROM (SELECT *, md5(array_to_string(list_sort(list_distinct(
                    string_split(lower(text), ' '))), ' ')) AS fp
                 FROM documents))
         WHERE rn = 1""",
    "ri_orphans" ->
      """SELECT 'lineitem->orders' AS relation,
                (SELECT count(*) FROM lineitem) AS child_rows,
                (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                   (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS orphan_rows
         UNION ALL
         SELECT 'lineitem->part',
                (SELECT count(*) FROM lineitem),
                (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                   (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
         UNION ALL
         SELECT 'lineitem->supplier',
                (SELECT count(*) FROM lineitem),
                (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                   (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
         UNION ALL
         SELECT 'orders->customer',
                (SELECT count(*) FROM orders),
                (SELECT count(*) FROM orders o WHERE NOT EXISTS
                   (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))""",
    "events_changepoint" ->
      """WITH hourly AS (
           SELECT event_type AS g, date_trunc('hour', ts) AS h, count(*) AS hn,
                  CAST(round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                             / count(*), 6) AS DECIMAL(18,6)) AS m
           FROM events GROUP BY 1, 2),
         st AS (
           SELECT g, h, m,
                  count(*) OVER (PARTITION BY g) AS n_hours,
                  CAST(count(*) OVER (PARTITION BY g) AS DOUBLE) AS n,
                  CAST(sum(m) OVER (PARTITION BY g) AS DOUBLE) AS sx,
                  CAST(sum(m * m) OVER (PARTITION BY g) AS DOUBLE) AS sxx
           FROM hourly),
         dev AS (
           SELECT g, h, n_hours,
                  (CAST(m AS DOUBLE) - sx / n)
                    / sqrt((n * sxx - sx * sx) / (n * n)) AS dev
           FROM st
           WHERE n > 1 AND sqrt((n * sxx - sx * sx) / (n * n)) > 0),
         cs AS (
           SELECT g, h, n_hours,
                  round(sum(dev) OVER (PARTITION BY g ORDER BY h
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cusum
           FROM dev),
         r AS (SELECT g, h, n_hours, cusum,
                      row_number() OVER (PARTITION BY g
                                         ORDER BY abs(cusum) DESC, h) AS rn
               FROM cs)
         SELECT g AS event_type, n_hours, h AS cp_hour, cusum
         FROM r WHERE rn = 1""",
    "benford_prices" ->
      """SELECT CAST(floor(o_totalprice / power(10, floor(log10(o_totalprice)))) AS BIGINT) AS digit,
                count(*) AS n,
                count(*) / sum(count(*)) OVER () AS share
         FROM orders WHERE o_totalprice > 0
         GROUP BY 1""",
    "docs_pii_scan" ->
      """SELECT source, count(*) AS docs,
                CAST(sum(CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                            + len(regexp_extract_all(text, '[0-9]{3}-[0-9]{2}-[0-9]{4}'))
                            + len(regexp_extract_all(text, '([0-9]{1,3}\.){3}[0-9]{1,3}'))
                            + len(regexp_extract_all(text, '\+?[0-9][0-9() -]{6,}[0-9]')) > 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
                CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS emails,
                CAST(sum(len(regexp_extract_all(text, '[0-9]{3}-[0-9]{2}-[0-9]{4}'))) AS BIGINT) AS ssns,
                CAST(sum(len(regexp_extract_all(text, '([0-9]{1,3}\.){3}[0-9]{1,3}'))) AS BIGINT) AS ipv4s,
                CAST(sum(len(regexp_extract_all(text, '\+?[0-9][0-9() -]{6,}[0-9]'))) AS BIGINT) AS phones
         FROM documents GROUP BY source""",
    "events_seasonality" ->
      """SELECT CAST(date_part('isodow', ts) AS BIGINT) AS dow,
                CAST(date_part('hour', ts) AS BIGINT) AS hod,
                count(*) AS n_events,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
         FROM events GROUP BY 1, 2""",
    "events_value_scaled" ->
      """SELECT event_id, event_type, value,
                CASE WHEN mx = mn THEN 0.5
                     ELSE (value - mn) / (mx - mn) END AS scaled
         FROM (SELECT event_id, event_type, value,
                      min(value) OVER (PARTITION BY event_type) AS mn,
                      max(value) OVER (PARTITION BY event_type) AS mx
               FROM events)""",
    "docs_temperature_mix" ->
      """WITH tok AS (SELECT source, doc_id,
                             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                      FROM documents),
         st AS (SELECT source,
                       CAST(floor(sqrt(CAST(sum(n_tokens) AS DOUBLE))) AS BIGINT) AS w
                FROM tok GROUP BY source),
         a AS (SELECT source,
                      CAST((20000 * w) // (SELECT CAST(sum(w) AS BIGINT) FROM st) AS BIGINT)
                        AS alloc_tokens
               FROM st),
         c AS (SELECT source, doc_id, n_tokens,
                      CAST(sum(n_tokens) OVER (PARTITION BY source
                        ORDER BY (doc_id * 2654435761) % 10000, doc_id) AS BIGINT)
                        AS cum_tokens
               FROM tok)
         SELECT c.source, c.doc_id, c.n_tokens, c.cum_tokens, a.alloc_tokens
         FROM c JOIN a USING (source)
         WHERE cum_tokens <= alloc_tokens""",
    "docs_lang_diversity" ->
      """WITH c AS (SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2)
         SELECT source, CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_values,
                round(log2(CAST(sum(c) AS DOUBLE))
                      - sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)))
                        / CAST(sum(c) AS BIGINT), 4) AS entropy_bits
         FROM c GROUP BY source""",
    "events_value_deciles" ->
      """WITH b AS (SELECT quantile_cont(value,
                      [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
                    FROM events)
         SELECT event_id, value,
                CAST(len(list_filter(b.bs, x -> value > x)) AS BIGINT) AS bucket
         FROM events, b""",
    "events_value_mad" ->
      """WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                    FROM events GROUP BY 1),
         d AS (SELECT e.event_type, quantile_cont(abs(value - med), 0.5) AS mad
               FROM events e JOIN m USING (event_type) GROUP BY 1)
         SELECT event_id, e.event_type, value, med, mad,
                CASE WHEN mad <> 0
                     THEN round((value - med) / mad, 4) END AS m_score
         FROM events e JOIN m USING (event_type) JOIN d USING (event_type)
         WHERE abs(value - med) > 2.0 * mad""",
    "q19_brand_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                  AS DOUBLE) AS revenue,
                count(*) AS n_items
         FROM lineitem, part
         WHERE l_partkey = p_partkey
           AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                 AND l_quantity BETWEEN 1 AND 11)
             OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                 AND l_quantity BETWEEN 10 AND 20)
             OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
                 AND l_quantity BETWEEN 20 AND 30))""",
    "cube_revenue" ->
      """SELECT n_name, year(CAST(o_orderdate AS DATE)) AS o_year,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                count(*) AS n_orders
         FROM orders, customer, nation
         WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
         GROUP BY CUBE(n_name, o_year)""",
    "docs_top_bigrams" ->
      """WITH w AS (SELECT string_split(lower(text), ' ') AS l FROM documents),
         b AS (SELECT unnest(list_transform(range(1, len(l)),
                               i -> l[i] || ' ' || l[i + 1])) AS bigram
               FROM w),
         c AS (SELECT bigram, count(*) AS n, (SELECT count(*) FROM b) AS total
               FROM b GROUP BY bigram)
         SELECT bigram, n FROM c WHERE n * 800 > total""",
    "emb_centroid_assign" ->
      """WITH c AS (SELECT vec_id AS centroid_id, embedding AS kv
                    FROM embeddings WHERE vec_id < 8),
         d AS (SELECT e.vec_id, c.centroid_id,
                      list_sum(list_transform(range(1, len(e.embedding) + 1),
                        i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.kv[i] AS DOUBLE))
                           * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.kv[i] AS DOUBLE))))
                        AS d2
               FROM embeddings e, c),
         r AS (SELECT vec_id, centroid_id, d2,
                      row_number() OVER (PARTITION BY vec_id
                                         ORDER BY d2, centroid_id) AS rn
               FROM d)
         SELECT vec_id, centroid_id, round(d2, 4) AS d2 FROM r WHERE rn = 1""",
    "emb_outlier_dist" ->
      """WITH c AS (SELECT vec_id AS centroid_id, embedding AS kv
                    FROM embeddings WHERE vec_id < 8),
         d AS (SELECT e.vec_id, c.centroid_id,
                      list_sum(list_transform(range(1, len(e.embedding) + 1),
                        i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.kv[i] AS DOUBLE))
                           * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.kv[i] AS DOUBLE))))
                        AS d2
               FROM embeddings e, c),
         r AS (SELECT vec_id, centroid_id, d2,
                      row_number() OVER (PARTITION BY vec_id
                                         ORDER BY d2, centroid_id) AS rn
               FROM d),
         a AS (SELECT vec_id, centroid_id,
                      CAST(round(sqrt(round(d2, 4)), 6) AS DECIMAL(18,6)) AS dist
               FROM r WHERE rn = 1),
         m AS (SELECT vec_id, centroid_id, dist,
                      CAST(count(*) OVER (PARTITION BY centroid_id) AS DOUBLE) AS n,
                      CAST(sum(dist) OVER (PARTITION BY centroid_id) AS DOUBLE) AS sx,
                      CAST(sum(dist * dist) OVER (PARTITION BY centroid_id) AS DOUBLE) AS sxx
               FROM a)
         SELECT vec_id, centroid_id, CAST(dist AS DOUBLE) AS dist,
                CASE WHEN n > 1 AND sqrt((n * sxx - sx * sx) / (n * n)) > 0
                     THEN round((CAST(dist AS DOUBLE) - sx / n)
                                / sqrt((n * sxx - sx * sx) / (n * n)), 4)
                END AS z,
                coalesce(CASE WHEN n > 1 AND sqrt((n * sxx - sx * sx) / (n * n)) > 0
                              THEN round((CAST(dist AS DOUBLE) - sx / n)
                                         / sqrt((n * sxx - sx * sx) / (n * n)), 4) >= 2.0
                         END, false) AS is_outlier
         FROM m""",
    "emb_balanced_sample" ->
      """WITH c AS (SELECT vec_id AS centroid_id, embedding AS kv
                    FROM embeddings WHERE vec_id < 8),
         d AS (SELECT e.vec_id, c.centroid_id,
                      list_sum(list_transform(range(1, len(e.embedding) + 1),
                        i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.kv[i] AS DOUBLE))
                           * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.kv[i] AS DOUBLE))))
                        AS d2
               FROM embeddings e, c),
         r AS (SELECT vec_id, centroid_id, d2,
                      row_number() OVER (PARTITION BY vec_id
                                         ORDER BY d2, centroid_id) AS rn
               FROM d),
         a AS (SELECT vec_id, centroid_id, round(d2, 4) AS d2 FROM r WHERE rn = 1),
         p AS (SELECT vec_id, centroid_id, d2,
                      row_number() OVER (PARTITION BY centroid_id
                        ORDER BY (vec_id * 2654435761) % 10000, vec_id) AS pick
               FROM a)
         SELECT vec_id, centroid_id, d2 FROM p WHERE pick <= 20""",
    "events_sliding_users" ->
      """WITH hu AS (SELECT DISTINCT date_trunc('hour', ts) AS h, user_id
                     FROM events),
         hrs AS (SELECT DISTINCT h AS h0 FROM hu)
         SELECT t.h0, count(DISTINCT hu.user_id) AS n_users
         FROM hu JOIN hrs t ON t.h0 BETWEEN hu.h AND hu.h + INTERVAL 23 HOUR
         GROUP BY t.h0""",
    "funnel_latency" ->
      """WITH u AS (SELECT user_id,
                           min(CASE WHEN event_type = 'signup' THEN ts END) AS s,
                           min(CASE WHEN event_type = 'purchase' THEN ts END) AS p
                    FROM events GROUP BY 1),
         l AS (SELECT epoch_us(p) - epoch_us(s) AS lat_us FROM u
               WHERE p IS NOT NULL AND s IS NOT NULL AND p > s)
         SELECT count(*) AS n_converted,
                round(quantile_cont(lat_us, 0.5), 4) AS p50_us,
                round(quantile_cont(lat_us, 0.9), 4) AS p90_us
         FROM l""",
    "order_latency" ->
      """SELECT o_orderpriority, count(*) AS n_items,
                avg(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS avg_days,
                quantile_cont(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)), 0.5) AS p50_days,
                quantile_cont(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)), 0.95) AS p95_days,
                CAST(max(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS BIGINT) AS max_days
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority""",
    "basket_brand_pairs" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS bk, p_brand AS it
                        FROM lineitem JOIN part ON l_partkey = p_partkey),
         marg AS (SELECT it, count(*) AS n FROM items GROUP BY 1),
         tot AS (SELECT count(DISTINCT bk) AS nb FROM items),
         pairs AS (SELECT a.it AS item_a, b.it AS item_b, count(*) AS n_ab
                   FROM items a JOIN items b ON a.bk = b.bk AND a.it < b.it
                   GROUP BY 1, 2)
         SELECT item_a, item_b, n_ab,
                round(CAST(n_ab AS DOUBLE) / CAST(nb AS DOUBLE), 6) AS support,
                round(CAST(n_ab AS DOUBLE) / CAST(ma.n AS DOUBLE), 6) AS confidence,
                round(CAST(n_ab AS DOUBLE) * CAST(nb AS DOUBLE)
                      / (CAST(ma.n AS DOUBLE) * CAST(mb.n AS DOUBLE)), 6) AS lift
         FROM pairs JOIN marg ma ON ma.it = item_a
                    JOIN marg mb ON mb.it = item_b CROSS JOIN tot""",
    "supplier_skyline" ->
      ("""WITH per AS (SELECT l_suppkey, CAST(sum(""" + rev + """) AS DOUBLE) AS revenue,
                CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) AS avg_disc
              FROM lineitem GROUP BY 1),
         lv AS (SELECT revenue, min(avg_disc) AS md FROM per GROUP BY 1),
         cm AS (SELECT revenue,
                  min(md) OVER (ORDER BY revenue DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mge,
                  min(md) OVER (ORDER BY revenue DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mgt
                FROM lv)
         SELECT p.l_suppkey, p.revenue, p.avg_disc
         FROM per p JOIN cm USING (revenue)
         WHERE NOT (cm.mge < p.avg_disc
                    OR (cm.mgt IS NOT NULL AND cm.mgt <= p.avg_disc))"""),
    "part_abc_classes" ->
      ("""WITH per AS (SELECT l_partkey, sum(""" + rev + """) AS rev
              FROM lineitem GROUP BY 1),
         tot AS (SELECT sum(rev) AS t FROM per),
         c AS (SELECT rev, sum(rev) OVER (ORDER BY rev DESC, l_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM per),
         cls AS (SELECT CASE WHEN cum * 20 <= t * 16 THEN 'A'
                             WHEN cum * 20 <= t * 19 THEN 'B'
                             ELSE 'C' END AS abc_class, rev
                 FROM c CROSS JOIN tot)
         SELECT abc_class, count(*) AS n_units,
                CAST(sum(rev) AS DOUBLE) AS class_total
         FROM cls GROUP BY 1"""),
    "events_user_gini" ->
      """WITH per AS (SELECT event_type, user_id, count(*) AS n_ev
                      FROM events GROUP BY 1, 2),
         r AS (SELECT event_type, n_ev, row_number() OVER (
                 PARTITION BY event_type ORDER BY n_ev, user_id) AS i FROM per)
         SELECT event_type, count(*) AS n_keys,
                (2.0 * CAST(sum(i * n_ev) AS DOUBLE)
                 - CAST(count(*) + 1 AS DOUBLE) * CAST(sum(n_ev) AS DOUBLE))
                / (CAST(count(*) AS DOUBLE) * CAST(sum(n_ev) AS DOUBLE)) AS gini
         FROM r GROUP BY 1""",
    "customer_rfm" ->
      """WITH per AS (SELECT o_custkey, max(o_orderdate) AS rec, count(*) AS freq,
                sum(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
              FROM orders GROUP BY 1),
         sc AS (SELECT CAST(ntile(5) OVER (ORDER BY rec, o_custkey) AS BIGINT) AS r_score,
                       CAST(ntile(5) OVER (ORDER BY freq, o_custkey) AS BIGINT) AS f_score,
                       CAST(ntile(5) OVER (ORDER BY mon, o_custkey) AS BIGINT) AS m_score,
                       mon
                FROM per)
         SELECT r_score, f_score, m_score, count(*) AS n_customers,
                CAST(sum(mon) AS DOUBLE) AS total_spend
         FROM sc GROUP BY 1, 2, 3""",
    "events_markov" ->
      """WITH seq AS (SELECT event_type AS from_op,
                lead(event_type) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS to_op
              FROM events),
         pairs AS (SELECT from_op, to_op, count(*) AS n FROM seq
                   WHERE to_op IS NOT NULL GROUP BY 1, 2),
         m AS (SELECT from_op, sum(n) AS tot FROM pairs GROUP BY 1)
         SELECT from_op, to_op, n, CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS p
         FROM pairs JOIN m USING (from_op)""",
    "events_autocorr" ->
      """WITH obs AS (SELECT date_trunc('hour', ts) AS h, count(*) AS x
                      FROM events GROUP BY 1),
         sp AS (SELECT unnest(generate_series(min(h), max(h),
                  INTERVAL 1 HOUR)) AS h FROM obs),
         ser AS (SELECT sp.h, coalesce(obs.x, 0) AS x
                 FROM sp LEFT JOIN obs ON sp.h = obs.h),
         l AS (SELECT x, lag(x, 1) OVER w AS l1, lag(x, 24) OVER w AS l24,
                      lag(x, 168) OVER w AS l168
               FROM ser WINDOW w AS (ORDER BY h)),
         m AS (SELECT 1 AS lag_h, count(l1) AS n,
                      sum(CASE WHEN l1 IS NOT NULL THEN x END) AS sx,
                      sum(l1) AS sy, sum(x * l1) AS sxy,
                      sum(CASE WHEN l1 IS NOT NULL THEN x * x END) AS sxx,
                      sum(l1 * l1) AS syy FROM l
               UNION ALL
               SELECT 24, count(l24),
                      sum(CASE WHEN l24 IS NOT NULL THEN x END),
                      sum(l24), sum(x * l24),
                      sum(CASE WHEN l24 IS NOT NULL THEN x * x END),
                      sum(l24 * l24) FROM l
               UNION ALL
               SELECT 168, count(l168),
                      sum(CASE WHEN l168 IS NOT NULL THEN x END),
                      sum(l168), sum(x * l168),
                      sum(CASE WHEN l168 IS NOT NULL THEN x * x END),
                      sum(l168 * l168) FROM l)
         SELECT lag_h, n,
                round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
                  AS autocorr
         FROM m""",
    "events_time_weighted" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t,
                CAST(value AS DECIMAL(18,2)) AS v, event_id FROM events),
         h AS (SELECT user_id, v,
                 lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t
                   AS hold
               FROM e)
         SELECT user_id, count(*) AS n_holds,
                round(CAST(sum(v * hold) AS DOUBLE)
                      / CAST(sum(hold) AS DOUBLE), 6) AS twa_value
         FROM h WHERE hold IS NOT NULL
         GROUP BY 1 HAVING sum(hold) > 0""",
    "orders_cohort_ltv" ->
      """WITH o AS (SELECT o_custkey,
                CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
                CAST(o_totalprice AS DECIMAL(18,2)) AS amt
              FROM orders),
         pc AS (SELECT o_custkey, min(m) AS cohort FROM o GROUP BY 1),
         sz AS (SELECT cohort, count(*) AS n_cohort FROM pc GROUP BY 1),
         aged AS (SELECT cohort, m - cohort AS age_months, sum(amt) AS rev,
                         count(DISTINCT o.o_custkey) AS n_active
                  FROM o JOIN pc USING (o_custkey) GROUP BY 1, 2),
         c AS (SELECT cohort, age_months, n_active, rev,
                      sum(rev) OVER (PARTITION BY cohort ORDER BY age_months
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM aged)
         SELECT cohort AS cohort_month, age_months, n_active,
                CAST(rev AS DOUBLE) AS revenue,
                round(CAST(cum AS DOUBLE) / CAST(n_cohort AS DOUBLE), 6)
                  AS cum_ltv_per_customer
         FROM c JOIN sz USING (cohort)""",
    "events_burstiness" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id FROM events),
         g AS (SELECT user_id,
                 lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t
                   AS gap
               FROM e),
         m AS (SELECT user_id, count(*) AS n_gaps, sum(gap) AS sg,
                      sum(CAST(gap AS DECIMAL(38,0)) * gap) AS sg2
               FROM g WHERE gap IS NOT NULL
               GROUP BY 1 HAVING count(*) >= 2 AND sum(gap) > 0)
         SELECT user_id, n_gaps,
                round((sqrt(CAST(sg2 AS DOUBLE) / CAST(n_gaps AS DOUBLE)
                            - (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                              * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)))
                       - CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                      / (sqrt(CAST(sg2 AS DOUBLE) / CAST(n_gaps AS DOUBLE)
                              - (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                                * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)))
                         + CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)), 6)
                  AS burstiness
         FROM m""",
    "docs_source_hhi" ->
      """WITH c AS (SELECT source, lang, count(*) AS c FROM documents
                    GROUP BY 1, 2)
         SELECT source, CAST(sum(c) AS BIGINT) AS n_rows,
                count(*) AS n_values,
                CAST(sum(c * c) AS DOUBLE)
                  / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)) AS hhi
         FROM c GROUP BY 1""",
    "emb_knn_classify" ->
      """WITH knn AS (SELECT query_id, corpus_id FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
                    row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY list_cosine_similarity(q.embedding, c.embedding)
                        DESC, c.vec_id) AS rk
             FROM embeddings c, embeddings q
             WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id)
           WHERE rk <= 5),
         v AS (SELECT query_id, corpus_id % 4 AS pred_label, count(*) AS votes
               FROM knn GROUP BY 1, 2)
         SELECT query_id, pred_label, votes FROM v
         QUALIFY row_number() OVER (PARTITION BY query_id
           ORDER BY votes DESC, pred_label) = 1""",
    "docs_bigram_kn" ->
      """WITH arr AS (
           SELECT doc_id,
                  list_filter(string_split(lower(text), ' '),
                    w -> len(w) > 0) AS a
           FROM documents),
         bg AS (
           SELECT doc_id, a[i] AS w1, a[i + 1] AS w2
           FROM arr, unnest(range(1, len(a))) AS t(i)
           WHERE len(a) >= 2),
         tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg
                GROUP BY doc_id, w1, w2),
         c2 AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c2 FROM tf
                GROUP BY w1, w2),
         l AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1,
                      count(*) AS n1l FROM c2 GROUP BY w1),
         r AS (SELECT w2, count(*) AS nc FROM c2 GROUP BY w2),
         tt AS (SELECT CAST(count(*) AS DOUBLE) AS tt FROM c2)
         SELECT t.doc_id, CAST(sum(t.tf) AS BIGINT) AS n_bigrams,
                round(sum(t.tf * ln(
                    (greatest(c2.c2 - 0.75, 0.0)
                     + 0.75 * l.n1l * (r.nc / tt.tt)) / l.c1))
                  / sum(t.tf), 4) AS avg_kn_logprob
         FROM tf t JOIN c2 ON c2.w1 = t.w1 AND c2.w2 = t.w2
         JOIN l ON l.w1 = t.w1 JOIN r ON r.w2 = t.w2 CROSS JOIN tt
         GROUP BY t.doc_id""",
    "events_session_paths" ->
      """WITH b AS (SELECT user_id, ts, event_id, event_type,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                     THEN 1 ELSE 0 END AS new_s
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
               FROM b),
         p AS (SELECT user_id, array_to_string(list_slice(
                 list(event_type ORDER BY ts, event_id), 1, 5), '>') AS path
               FROM s GROUP BY user_id, seq)
         SELECT path, count(*) AS n_sessions,
                count(DISTINCT user_id) AS n_users
         FROM p GROUP BY 1""",
    "events_value_auc" ->
      """WITH s AS (SELECT floor(CAST(value AS DOUBLE) * CAST(16.0 AS DOUBLE)) AS s,
                CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
              FROM events WHERE value IS NOT NULL),
         g AS (SELECT s, count(*) AS c, CAST(sum(y) AS BIGINT) AS p
               FROM s GROUP BY 1),
         r AS (SELECT *, coalesce(sum(c) OVER (ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
               FROM g)
         SELECT CAST(sum(p) AS BIGINT) AS n_pos,
                CAST(sum(c) - sum(p) AS BIGINT) AS n_neg,
                CAST(sum(p * (2 * cb + c + 1))
                     - sum(p) * (sum(p) + 1) AS DOUBLE)
                  / (2.0 * CAST(sum(p) AS DOUBLE)
                     * CAST(sum(c) - sum(p) AS DOUBLE)) AS auc
         FROM r""",
    "events_purchase_lift" ->
      """WITH s AS (SELECT value AS s, event_id AS i,
                CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
              FROM events WHERE value IS NOT NULL),
         dd AS (SELECT y, CAST(ntile(10) OVER (ORDER BY s DESC, i)
                  AS BIGINT) AS decile FROM s),
         tot AS (SELECT count(*) AS n_all,
                        CAST(sum(y) AS BIGINT) AS p_all FROM s)
         SELECT decile, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
                round(CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
                  AS pos_rate,
                round((CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE))
                      / (CAST(p_all AS DOUBLE) / CAST(n_all AS DOUBLE)), 6)
                  AS lift
         FROM dd CROSS JOIN tot GROUP BY decile, p_all, n_all""",
    "supplier_pagerank" -> {
      // the five damping iterations unroll as chained CTEs, each the same
      // integer-exact grouped left join the Spark loop runs
      def it(k: Int): String =
        s"""w$k AS (SELECT n.node,
             CAST(coalesce(150000000
               + (sum(w.p // d.deg) * 850) // 1000, 150000000)
               AS BIGINT) AS p
           FROM n
           LEFT JOIN e ON e.dst = n.node
           LEFT JOIN w${k - 1} w ON w.node = e.src
           LEFT JOIN deg d ON d.src = e.src
           GROUP BY n.node)"""
      """WITH pairs AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s
                        FROM lineitem),
         e AS (SELECT DISTINCT a.s AS src, b.s AS dst
               FROM pairs a JOIN pairs b ON a.ok = b.ok AND a.s <> b.s),
         deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
         n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         w0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS p FROM n),
         """ + (1 to 5).map(it).mkString(",\n         ") + """
         SELECT node, p AS rank_nano FROM w5"""
    },
    "events_seasonal_strength" ->
      """WITH cells AS (
           SELECT date_part('isodow', ts) AS dow, date_part('hour', ts) AS hod,
                  count(*) AS n, sum(CAST(value AS DECIMAL(18,2))) AS sy,
                  sum(CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2))) AS syy
           FROM events GROUP BY 1, 2)
         SELECT CAST(sum(n) AS BIGINT) AS n_all,
                round(1.0
                  - (CAST(sum(syy) AS DOUBLE)
                     - sum(CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                           / CAST(n AS DOUBLE)))
                  / (CAST(sum(syy) AS DOUBLE)
                     - CAST(sum(sy) AS DOUBLE) * CAST(sum(sy) AS DOUBLE)
                       / CAST(sum(n) AS DOUBLE)), 6) AS seasonal_r2
         FROM cells""",
    "nation_trade_matrix" ->
      ("""SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                count(*) AS n_items,
                CAST(sum(""" + rev + """) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ns ON ns.n_nationkey = s_nationkey
         JOIN nation nc ON nc.n_nationkey = c_nationkey
         GROUP BY 1, 2"""),
    "events_daily_entropy" ->
      """WITH c AS (SELECT CAST(ts AS DATE) AS day, event_type,
                           count(*) AS c
                    FROM events GROUP BY 1, 2)
         SELECT day, CAST(sum(c) AS BIGINT) AS n_rows,
                count(*) AS n_values,
                round(log2(CAST(sum(c) AS DOUBLE))
                      - sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)))
                        / CAST(sum(c) AS BIGINT), 4) AS entropy_bits
         FROM c GROUP BY day""",
    "events_adf_test" ->
      """WITH obs AS (SELECT date_trunc('hour', ts) AS h, count(*) AS x
                      FROM events GROUP BY 1),
         sp AS (SELECT unnest(generate_series(min(h), max(h),
                  INTERVAL 1 HOUR)) AS h FROM obs),
         ser AS (SELECT sp.h, coalesce(obs.x, 0) AS x
                 FROM sp LEFT JOIN obs ON sp.h = obs.h),
         lg AS (SELECT x - lag(x) OVER (ORDER BY h) AS y,
                       lag(x) OVER (ORDER BY h) AS z
                FROM ser),
         m AS (SELECT count(*) AS n, CAST(sum(z * y) AS BIGINT) AS szy,
                      CAST(sum(z * z) AS BIGINT) AS szz,
                      CAST(sum(y * y) AS BIGINT) AS syy
               FROM lg WHERE z IS NOT NULL)
         SELECT n,
                round(CAST(szy AS DOUBLE) / CAST(szz AS DOUBLE), 6) AS gamma,
                round((CAST(szy AS DOUBLE) / CAST(szz AS DOUBLE))
                      / sqrt(((CAST(syy AS DOUBLE)
                               - (CAST(szy AS DOUBLE) / CAST(szz AS DOUBLE))
                                 * CAST(szy AS DOUBLE))
                              / (CAST(n AS DOUBLE) - 1.0))
                             / CAST(szz AS DOUBLE)), 6) AS df_t
         FROM m WHERE szz > 0 AND n > 1""",
    "events_new_vs_returning" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
                     FROM events),
         f AS (SELECT user_id, min(day) AS first_day FROM du GROUP BY 1)
         SELECT day,
                CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
                  AS BIGINT) AS new_users,
                CAST(sum(CASE WHEN day <> first_day THEN 1 ELSE 0 END)
                  AS BIGINT) AS returning_users
         FROM du JOIN f USING (user_id) GROUP BY 1""",
    "events_dau_mau" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
                     FROM events),
         days AS (SELECT DISTINCT day AS d0 FROM du),
         a AS (SELECT d.d0, du.day, du.user_id FROM du JOIN days d
               ON d.d0 >= du.day AND d.d0 <= du.day + INTERVAL 29 DAY)
         SELECT d0 AS day,
                count(DISTINCT CASE WHEN d0 = a.day THEN user_id END) AS dau,
                count(DISTINCT CASE WHEN d0 - a.day < 7 THEN user_id END)
                  AS wau,
                count(DISTINCT user_id) AS mau,
                round(CAST(count(DISTINCT CASE WHEN d0 = a.day
                        THEN user_id END) AS DOUBLE)
                      / CAST(count(DISTINCT user_id) AS DOUBLE), 6)
                  AS stickiness
         FROM a GROUP BY 1""",
    "events_last_touch" ->
      """WITH j AS (
           SELECT p.v, t.event_type AS channel,
                  epoch_us(p.ts) - epoch_us(t.ts) AS gap
           FROM (SELECT user_id, ts, CAST(value AS DECIMAL(18,2)) AS v
                 FROM events WHERE event_type = 'purchase') p
           ASOF JOIN (SELECT user_id, ts, event_type FROM events
                      WHERE event_type <> 'purchase') t
             ON p.user_id = t.user_id AND p.ts >= t.ts)
         SELECT channel, count(*) AS n_conversions,
                CAST(sum(v) AS DOUBLE) AS attributed_value
         FROM j WHERE gap <= 86400000000 GROUP BY 1""",
    "events_sequence_next_node" ->
      """WITH o AS (SELECT user_id AS k, event_type AS op,
                lead(event_type, 1) OVER w AS l1,
                coalesce(lead(event_type, 2) OVER w, '(end)') AS nxt,
                row_number() OVER w AS rn
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         m AS (SELECT k, arg_min(nxt, rn) AS next_type FROM o
               WHERE op = 'view' AND l1 = 'click' GROUP BY k)
         SELECT next_type, count(*) AS n_keys FROM m GROUP BY 1""",
    "events_delta_sum_by_type" ->
      """WITH s AS (SELECT event_type AS g, user_id AS k, ts, event_id,
                CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
              FROM events WHERE value IS NOT NULL),
         d AS (SELECT g, k, c, lag(c) OVER (PARTITION BY g, k
                 ORDER BY ts, event_id) AS p FROM s),
         e AS (SELECT g, k, CASE WHEN c > p THEN c - p ELSE 0 END AS dd
               FROM d WHERE p IS NOT NULL)
         SELECT g AS event_type, CAST(count(DISTINCT k) AS BIGINT) AS n_keys,
                CAST(sum(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_increments,
                CAST(sum(dd) AS DOUBLE) / 100.0 AS delta_sum
         FROM e GROUP BY 1""",
    "docs_source_overlap" ->
      """WITH t AS (SELECT source AS g, string_split(lower(text), ' ') AS tk
                    FROM documents),
         s AS (SELECT DISTINCT g,
                 tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS sh
               FROM t, LATERAL (SELECT unnest(range(1, len(tk) - 1)) AS i) u
               WHERE len(tk) >= 3),
         z AS (SELECT g, count(*) AS n FROM s GROUP BY 1),
         x AS (SELECT a.g AS ga, b.g AS gb, count(*) AS n_inter
               FROM s a JOIN s b ON a.sh = b.sh AND a.g < b.g GROUP BY 1, 2)
         SELECT ga, gb, za.n AS na, zb.n AS nb, n_inter,
                round(CAST(n_inter AS DOUBLE)
                  / CAST(za.n + zb.n - n_inter AS DOUBLE), 6) AS jaccard
         FROM x JOIN z za ON za.g = x.ga JOIN z zb ON zb.g = x.gb""",
    "docs_bigram_entropy" ->
      """WITH arr AS (
           SELECT source AS g,
                  list_filter(string_split(lower(text), ' '),
                    w -> len(w) > 0) AS a
           FROM documents),
         bg AS (
           SELECT g, a[i] AS w1, a[i + 1] AS w2
           FROM arr, unnest(range(1, len(a))) AS t(i)
           WHERE len(a) >= 2),
         c AS (SELECT g, w1, w2, count(*) AS c FROM bg GROUP BY 1, 2, 3)
         SELECT g AS source, CAST(sum(c) AS BIGINT) AS n_bigrams,
                count(*) AS n_types,
                round(log2(CAST(sum(c) AS DOUBLE))
                  - sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)))
                    / CAST(sum(c) AS DOUBLE), 4) AS bigram_entropy_bits
         FROM c GROUP BY 1""",
    "emb_silhouette" ->
      """WITH base AS (
           SELECT vec_id AS id, CAST(label AS BIGINT) AS lbl,
                  list_transform(embedding, x ->
                    CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
           FROM embeddings
           WHERE label IS NOT NULL AND embedding IS NOT NULL),
         px AS (SELECT id, lbl, i AS d, v[i] AS x
                FROM base, unnest(range(1, len(v) + 1)) AS t(i)),
         cent AS (SELECT lbl, d, CAST(sum(x) AS BIGINT) AS s
                  FROM px GROUP BY 1, 2),
         nn AS (SELECT lbl, count(*) AS n FROM base GROUP BY 1),
         dist AS (SELECT p.id, p.lbl AS own, c.lbl AS cl,
                         sqrt(CAST(sum(
                             (CAST(n.n AS HUGEINT) * p.x - c.s)
                           * (CAST(n.n AS HUGEINT) * p.x - c.s)) AS DOUBLE))
                           / CAST(n.n AS DOUBLE) AS dv
                  FROM px p
                  JOIN cent c ON c.d = p.d
                  JOIN nn n ON n.lbl = c.lbl
                  GROUP BY p.id, p.lbl, c.lbl, n.n),
         ab AS (SELECT id, own,
                       max(CASE WHEN cl = own THEN dv END) AS a,
                       min(CASE WHEN cl <> own THEN dv END) AS b
                FROM dist GROUP BY 1, 2),
         sm AS (SELECT own AS label,
                       CASE WHEN greatest(a, b) = 0 THEN CAST(0 AS BIGINT)
                            ELSE CAST(floor((b - a) / greatest(a, b)
                                   * 1000000 + 0.5) AS BIGINT)
                       END AS s
                FROM ab)
         SELECT label, count(*) AS n_points,
                round(CAST(sum(s) AS DOUBLE) / count(*) / 1000000.0, 6)
                  AS mean_silhouette
         FROM sm GROUP BY 1""",
    "emb_mmr_diversify" -> {
      // the greedy selection unrolls: each step scores the remaining pool
      // against the union of prior picks and takes the per-query max
      def sel(k: Int): String = {
        val prior = (1 until k).map(j => s"SELECT * FROM s$j")
          .mkString(" UNION ALL ")
        s"""s$k AS (SELECT query_id, CAST($k AS BIGINT) AS step,
             corpus_id AS selected_id FROM (
           SELECT t.query_id, t.corpus_id,
                  row_number() OVER (PARTITION BY t.query_id
                    ORDER BY 0.75 * t.qsim - 0.25 * p.pen DESC,
                             t.corpus_id) AS rn
           FROM top t
           JOIN (SELECT ps.query_id, ps.ca AS corpus_id,
                        max(ps.sim) AS pen
                 FROM ps JOIN ($prior) s
                   ON s.query_id = ps.query_id
                  AND s.selected_id = ps.cb
                 GROUP BY 1, 2) p
             ON p.query_id = t.query_id AND p.corpus_id = t.corpus_id
           WHERE NOT EXISTS (SELECT 1 FROM ($prior) s2
             WHERE s2.query_id = t.query_id
               AND s2.selected_id = t.corpus_id))
           WHERE rn = 1)"""
      }
      """WITH top AS (SELECT query_id, corpus_id, qsim, rk FROM (
           SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
                  list_cosine_similarity(q.embedding, c.embedding) AS qsim,
                  row_number() OVER (PARTITION BY q.vec_id
                    ORDER BY list_cosine_similarity(q.embedding, c.embedding)
                      DESC, c.vec_id) AS rk
           FROM embeddings c, embeddings q
           WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id)
         WHERE rk <= 20),
         ps AS (SELECT a.query_id, a.corpus_id AS ca, b.corpus_id AS cb,
                       list_cosine_similarity(ea.embedding, eb.embedding)
                         AS sim
                FROM top a JOIN top b ON a.query_id = b.query_id
                  AND a.corpus_id <> b.corpus_id
                JOIN embeddings ea ON ea.vec_id = a.corpus_id
                JOIN embeddings eb ON eb.vec_id = b.corpus_id),
         s1 AS (SELECT query_id, CAST(1 AS BIGINT) AS step,
                       corpus_id AS selected_id
                FROM top WHERE rk = 1),
         """ + (2 to 5).map(sel).mkString(",\n         ") + """
         SELECT * FROM s1 UNION ALL SELECT * FROM s2
         UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
         UNION ALL SELECT * FROM s5"""
    },
    "docs_heaps_law" ->
      """WITH tok AS (SELECT doc_id AS d, unnest(list_filter(
                string_split(lower(text), ' '), w -> len(w) > 0)) AS w
              FROM documents),
         pd AS (SELECT d, count(*) AS toks FROM tok GROUP BY 1),
         fo AS (SELECT d, count(*) AS news FROM
                  (SELECT w, min(d) AS d FROM tok GROUP BY 1) GROUP BY 1),
         curve AS (SELECT pd.d, pd.toks, coalesce(fo.news, 0) AS news
                   FROM pd LEFT JOIN fo ON fo.d = pd.d),
         c AS (SELECT sum(toks) OVER win AS t, sum(news) OVER win AS v
               FROM curve WINDOW win AS (ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         pts AS (SELECT ln(CAST(t AS DOUBLE)) AS x,
                        ln(CAST(v AS DOUBLE)) AS y, t, v
                 FROM c WHERE t > 0 AND v > 0)
         SELECT count(*) AS n_docs, CAST(max(t) AS BIGINT) AS total_tokens,
                CAST(max(v) AS BIGINT) AS vocab_size,
                round((CAST(count(*) AS DOUBLE) * sum(x * y)
                       - sum(x) * sum(y))
                      / (CAST(count(*) AS DOUBLE) * sum(x * x)
                         - sum(x) * sum(x)), 4) AS heaps_beta
         FROM pts""",
    "supplier_graph_stats" ->
      """WITH pairs AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s
                        FROM lineitem),
         e AS (SELECT DISTINCT a.s AS src, b.s AS dst
               FROM pairs a JOIN pairs b ON a.ok = b.ok AND a.s <> b.s),
         deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
         p AS (SELECT ds.deg AS x, dd.deg AS y
               FROM e JOIN deg ds ON ds.src = e.src
                      LEFT JOIN deg dd ON dd.src = e.dst
               WHERE dd.deg IS NOT NULL),
         m AS (SELECT count(*) AS n,
                      CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                      sum(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS sxy,
                      sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS sxx,
                      sum(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS syy
               FROM p),
         nn AS (SELECT count(*) AS n_nodes FROM
                  (SELECT src AS v FROM e UNION SELECT dst FROM e)),
         ne AS (SELECT count(*) AS n_edges FROM e),
         md AS (SELECT CAST(max(deg) AS BIGINT) AS max_out_deg FROM deg)
         SELECT n_nodes, n_edges, max_out_deg,
                CASE WHEN sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) = 0
                     THEN NULL
                     ELSE round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
                END AS assortativity
         FROM m CROSS JOIN nn CROSS JOIN ne CROSS JOIN md""",
    // same compact-forward construction: orient low→high under (deg, id),
    // wedge self-join on the shared source, close with one more join —
    // each triangle found exactly once at its lowest-order vertex
    "part_triangles" ->
      """WITH promo AS (SELECT p_partkey FROM part WHERE p_type LIKE 'PROMO%'),
         items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS k
                   FROM lineitem SEMI JOIN promo ON l_partkey = p_partkey),
         e AS (SELECT DISTINCT least(a.k, b.k) AS a, greatest(a.k, b.k) AS b
               FROM items a JOIN items b ON a.ok = b.ok AND a.k <> b.k),
         deg AS (SELECT v, count(*) AS deg FROM
                   (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
                 GROUP BY 1),
         o AS (SELECT CASE WHEN da.deg < db.deg
                             OR (da.deg = db.deg AND e.a < e.b)
                           THEN e.a ELSE e.b END AS src,
                      CASE WHEN da.deg < db.deg
                             OR (da.deg = db.deg AND e.a < e.b)
                           THEN e.b ELSE e.a END AS dst,
                      CASE WHEN da.deg < db.deg
                             OR (da.deg = db.deg AND e.a < e.b)
                           THEN db.deg ELSE da.deg END AS dd
               FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b),
         w AS (SELECT o1.src AS u, o1.dst AS v, o2.dst AS w
               FROM o o1 JOIN o o2 ON o1.src = o2.src
               WHERE o1.dd < o2.dd OR (o1.dd = o2.dd AND o1.dst < o2.dst)),
         tri AS (SELECT u, v, w FROM w SEMI JOIN o ON w.v = o.src AND w.w = o.dst),
         pern AS (SELECT node, count(*) AS triangles FROM
                    (SELECT u AS node FROM tri
                     UNION ALL SELECT v FROM tri
                     UNION ALL SELECT w FROM tri)
                  GROUP BY 1)
         SELECT deg.v AS p_partkey, deg.deg AS degree,
                COALESCE(pern.triangles, 0) AS triangles,
                CASE WHEN deg.deg >= 2 THEN
                  round(2.0 * CAST(COALESCE(pern.triangles, 0) AS DOUBLE)
                    / (CAST(deg.deg AS DOUBLE) * (CAST(deg.deg AS DOUBLE) - 1.0)), 6)
                END AS clustering
         FROM deg LEFT JOIN pern ON pern.node = deg.v""",
    // the four exact integer power sums (Σy int64; Σy²/Σy³/Σy⁴ as
    // decimal(19,0)-factor products) then one fixed scalar tree — the
    // binomial central-moment expansion, skew = m3/(m2·√m2),
    // kurt = m4/m2² (ClickHouse non-excess convention)
    "events_moments" ->
      """WITH m AS (SELECT event_type,
                           CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
                    FROM events WHERE value IS NOT NULL),
         g AS (SELECT event_type, count(*) AS n,
                      CAST(sum(y) AS BIGINT) AS s1,
                      sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS s2,
                      sum(CAST(y * y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS s3,
                      sum(CAST(y * y AS DECIMAL(19,0)) * CAST(y * y AS DECIMAL(19,0))) AS s4
               FROM m GROUP BY 1 HAVING count(*) >= 2),
         f AS (SELECT event_type, n,
                      CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                      CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
                      CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
                      CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
               FROM g),
         c AS (SELECT event_type, n, mu,
                      r2 - mu * mu AS m2,
                      r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
                      r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
                         - 3.0 * mu * mu * mu * mu AS m4
               FROM f)
         SELECT event_type, n, round(mu / 100.0, 6) AS mean,
                round(sqrt(m2) / 100.0, 6) AS stddev_pop,
                round(m3 / (m2 * sqrt(m2)), 6) AS skew_pop,
                round(m4 / (m2 * m2), 6) AS kurt_pop,
                round(m4 / (m2 * m2) - 3.0, 6) AS kurt_excess
         FROM c WHERE m2 > 0.0""",
    // CUPED: exact int64/decimal moments at unit then variant grain; the
    // scalar trees below mirror the Spark expressions operation-for-operation
    "events_cuped" ->
      """WITH base AS (SELECT user_id AS u,
                              CAST(floor(value * 100 + 0.5) AS BIGINT) AS y,
                              epoch_us(ts) AS us
                       FROM events WHERE value IS NOT NULL),
         mid AS (SELECT (min(us) + max(us)) // 2 AS mid_us FROM base),
         units AS (
           SELECT u,
                  CAST(sum(CASE WHEN us < mid_us THEN y ELSE 0 END) AS BIGINT) AS x,
                  CAST(sum(CASE WHEN us >= mid_us THEN y ELSE 0 END) AS BIGINT) AS yv,
                  u % 2 AS variant
           FROM base CROSS JOIN mid GROUP BY u
           HAVING max(CASE WHEN us >= mid_us THEN 1 ELSE 0 END) = 1),
         byv AS (
           SELECT variant, count(*) AS n,
                  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
                  sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
                  sum(CAST(x AS DECIMAL(19,0)) * CAST(yv AS DECIMAL(19,0))) AS sxy,
                  sum(CAST(yv AS DECIMAL(19,0)) * CAST(yv AS DECIMAL(19,0))) AS syy
           FROM units GROUP BY variant),
         pooled AS (SELECT CAST(sum(n) AS DOUBLE) AS n_all,
                           CAST(sum(sx) AS DOUBLE) AS gx,
                           CAST(sum(sy) AS DOUBLE) AS gy,
                           CAST(sum(sxx) AS DOUBLE) AS gxx,
                           CAST(sum(sxy) AS DOUBLE) AS gxy FROM byv),
         th AS (SELECT gx / n_all AS gmx,
                       CASE WHEN (gxx - gx * gx / n_all) / n_all > 0.0
                            THEN ((gxy - gx * gy / n_all) / n_all)
                               / ((gxx - gx * gx / n_all) / n_all)
                            ELSE 0.0 END AS theta FROM pooled),
         v AS (SELECT variant, n, CAST(n AS DOUBLE) AS nd,
                      CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
                      CAST(sxx AS DOUBLE) AS sxxd, CAST(sxy AS DOUBLE) AS sxyd,
                      CAST(syy AS DOUBLE) AS syyd FROM byv)
         SELECT variant, n AS n_units,
                round((syd / nd) / 100.0, 6) AS mean_raw,
                round((syd / nd - theta * (sxd / nd - gmx)) / 100.0, 6)
                  AS mean_cuped,
                round(((syyd - syd * syd / nd) / nd) / 10000.0, 6) AS var_raw,
                round(((syyd - syd * syd / nd) / nd
                       - 2.0 * theta * ((sxyd - sxd * syd / nd) / nd)
                       + theta * theta * ((sxxd - sxd * sxd / nd) / nd))
                      / 10000.0, 6) AS var_cuped,
                round(theta, 6) AS theta
         FROM v CROSS JOIN th ORDER BY variant""",
    // BH step-up on 6dp-rounded Welch-z p-values (A&S 26.2.17 Φ), ranked
    // (p, group) ascending; p_adj = suffix-min of m·p/i capped at 1
    "events_bh_fdr" ->
      """WITH m AS (SELECT event_type AS g, user_id % 2 = 0 AS a,
                           CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
                    FROM events WHERE value IS NOT NULL),
         g AS (SELECT g,
                      CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na,
                      CAST(sum(CASE WHEN a THEN y ELSE 0 END) AS BIGINT) AS s1a,
                      sum(CASE WHEN a THEN CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))
                               ELSE CAST(0 AS DECIMAL(38,0)) END) AS s2a,
                      CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS nb,
                      CAST(sum(CASE WHEN a THEN 0 ELSE y END) AS BIGINT) AS s1b,
                      sum(CASE WHEN a THEN CAST(0 AS DECIMAL(38,0))
                               ELSE CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)) END) AS s2b
               FROM m GROUP BY 1 HAVING na >= 2 AND nb >= 2),
         w AS (SELECT g, na, nb,
                      (CAST(s1a AS DOUBLE) / CAST(na AS DOUBLE)
                       - CAST(s1b AS DOUBLE) / CAST(nb AS DOUBLE))
                      / sqrt((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE)
                                / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0)
                               / CAST(na AS DOUBLE)
                             + (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE)
                                / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0)
                               / CAST(nb AS DOUBLE)) AS z
               FROM g
               WHERE sqrt((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE)
                             / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0)
                            / CAST(na AS DOUBLE)
                          + (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE)
                             / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0)
                            / CAST(nb AS DOUBLE)) > 0.0),
         p AS (SELECT g, na, nb, round(w.z, 6) AS z,
                      round(2.0 * (exp(abs(w.z) * abs(w.z) * -0.5) * 0.3989422804014327)
                            * ((1.0 / (1.0 + 0.2316419 * abs(w.z)))
                               * (0.319381530 + (1.0 / (1.0 + 0.2316419 * abs(w.z)))
                                  * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * abs(w.z)))
                                     * (1.781477937 + (1.0 / (1.0 + 0.2316419 * abs(w.z)))
                                        * (-1.821255978 + (1.0 / (1.0 + 0.2316419 * abs(w.z)))
                                           * 1.330274429))))), 6) AS p
               FROM w),
         r AS (SELECT g, na, nb, z, p,
                      row_number() OVER (ORDER BY p, g) AS i,
                      count(*) OVER () AS m_tests
               FROM p),
         adj AS (SELECT g, na, nb, z, p,
                        round(least(min(p * CAST(m_tests AS DOUBLE)
                                        / CAST(i AS DOUBLE))
                          OVER (ORDER BY p DESC, g DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                          1.0), 6) AS p_adj
                 FROM r)
         SELECT g AS event_type, na AS n_a, nb AS n_b, z, p, p_adj,
                p_adj <= 0.05 AS reject
         FROM adj ORDER BY event_type""",
    // SRM: unit-grain distinct, exact counts, the same A&S Φ p as bh_fdr
    "events_srm_check" ->
      """WITH units AS (SELECT DISTINCT (epoch_us(ts) // 3600000000) % 24 AS g,
                               user_id AS u, user_id % 2 = 0 AS a
                        FROM events),
         m AS (SELECT g,
                      CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na,
                      CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS nb
               FROM units GROUP BY g HAVING na + nb >= 1),
         w AS (SELECT g, na, nb,
                      (CAST(na AS DOUBLE) - CAST(nb AS DOUBLE))
                        / sqrt(CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) AS z
               FROM m),
         p AS (SELECT g, na, nb, round(w.z, 6) AS z,
                      round(2.0 * (exp(abs(w.z) * abs(w.z) * -0.5)
                                   * 0.3989422804014327)
                            * ((1.0 / (1.0 + 0.2316419 * abs(w.z)))
                               * (0.319381530 + (1.0 / (1.0 + 0.2316419 * abs(w.z)))
                                  * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * abs(w.z)))
                                     * (1.781477937 + (1.0 / (1.0 + 0.2316419 * abs(w.z)))
                                        * (-1.821255978 + (1.0 / (1.0 + 0.2316419 * abs(w.z)))
                                           * 1.330274429))))), 6) AS p
               FROM w)
         SELECT g AS bucket, na AS n_a, nb AS n_b, z, p,
                p < 0.001 AS srm_alarm
         FROM p""",
    // incremental ≡ one-shot (spec-pinned), so the oracle is the whole-
    // corpus pass restricted to the sync batch
    "docs_boiler_indexed" ->
      """WITH s AS (SELECT doc_id,
                           unnest(string_split(text, '. ')) AS piece,
                           unnest(generate_series(1,
                             len(string_split(text, '. ')))) AS pos
                    FROM documents),
         b AS (SELECT piece FROM s GROUP BY piece
               HAVING count(DISTINCT doc_id) >= 3),
         f AS (SELECT s.doc_id, s.pos, s.piece,
                      b.piece IS NOT NULL AS dropped
               FROM s LEFT JOIN b ON s.piece = b.piece)
         SELECT doc_id, count(*) AS n_sentences,
                CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_removed,
                COALESCE(string_agg(CASE WHEN NOT dropped THEN piece END,
                  '. ' ORDER BY pos), '') AS clean_text
         FROM f WHERE doc_id % 10 = 0 GROUP BY doc_id""",
    // the contamination shingle convention; first-seen = min doc_id
    "docs_ngram_novelty" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
                    FROM documents),
         sh AS (SELECT doc_id,
                       unnest(list_distinct(list_transform(
                         range(1, len(ws) - 2),
                         i -> array_to_string(list_slice(ws, i, i + 3), ' '))))
                         AS s
                FROM d WHERE len(ws) >= 4),
         fs AS (SELECT s, min(doc_id) AS first_id FROM sh GROUP BY s)
         SELECT sh.doc_id, count(*) AS n_shingles,
                CAST(sum(CASE WHEN fs.first_id = sh.doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_novel,
                round(CAST(sum(CASE WHEN fs.first_id = sh.doc_id
                                    THEN 1 ELSE 0 END) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE), 6) AS novelty
         FROM sh JOIN fs ON sh.s = fs.s GROUP BY sh.doc_id""",
    // pieces exploded with positions; boilerplate = piece in ≥3 distinct
    // docs; rebuild preserves order (string_agg skips the dropped NULLs)
    "docs_sentence_dedup" ->
      """WITH s AS (SELECT doc_id,
                           unnest(string_split(text, '. ')) AS piece,
                           unnest(generate_series(1,
                             len(string_split(text, '. ')))) AS pos
                    FROM documents),
         b AS (SELECT piece FROM s GROUP BY piece
               HAVING count(DISTINCT doc_id) >= 3),
         f AS (SELECT s.doc_id, s.pos, s.piece,
                      b.piece IS NOT NULL AS dropped
               FROM s LEFT JOIN b ON s.piece = b.piece)
         SELECT doc_id, count(*) AS n_sentences,
                CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_removed,
                COALESCE(string_agg(CASE WHEN NOT dropped THEN piece END,
                  '. ' ORDER BY pos), '') AS clean_text
         FROM f GROUP BY doc_id""",
    // pooled-variance proportion z; p via the same A&S Φ tree as bh_fdr;
    // unpooled CI with the exact z_{α/2} literal
    "events_prop_ztest" ->
      """WITH m AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS g,
                           user_id % 2 = 0 AS a,
                           event_type = 'purchase' AS s
                    FROM events),
         g AS (SELECT g,
                      CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na,
                      CAST(sum(CASE WHEN a AND s THEN 1 ELSE 0 END) AS BIGINT) AS xa,
                      CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS nb,
                      CAST(sum(CASE WHEN NOT a AND s THEN 1 ELSE 0 END) AS BIGINT) AS xb
               FROM m GROUP BY 1 HAVING na >= 1 AND nb >= 1),
         v AS (SELECT g, na, nb,
                      CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd,
                      CAST(xa AS DOUBLE) / CAST(na AS DOUBLE) AS pa,
                      CAST(xb AS DOUBLE) / CAST(nb AS DOUBLE) AS pb,
                      (CAST(xa AS DOUBLE) + CAST(xb AS DOUBLE))
                        / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) AS pp
               FROM g),
         w AS (SELECT g, na, nb, pa, pb,
                      (pa - pb) / sqrt(pp * (1.0 - pp)
                                       * (1.0 / nad + 1.0 / nbd)) AS z,
                      sqrt(pa * (1.0 - pa) / nad
                           + pb * (1.0 - pb) / nbd) AS seci
               FROM v WHERE pp > 0.0 AND pp < 1.0)
         SELECT g AS bucket, na AS n_a, nb AS n_b,
                round(pa, 6) AS p_a, round(pb, 6) AS p_b,
                round(w.z, 6) AS z,
                round(2.0 * (exp(abs(w.z) * abs(w.z) * -0.5)
                             * 0.3989422804014327)
                      * ((1.0 / (1.0 + 0.2316419 * abs(w.z)))
                         * (0.319381530 + (1.0 / (1.0 + 0.2316419 * abs(w.z)))
                            * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * abs(w.z)))
                               * (1.781477937 + (1.0 / (1.0 + 0.2316419 * abs(w.z)))
                                  * (-1.821255978 + (1.0 / (1.0 + 0.2316419 * abs(w.z)))
                                     * 1.330274429))))), 6) AS p_value,
                round(pa - pb - 1.9599639845400545 * seci, 6) AS ci_lo,
                round(pa - pb + 1.9599639845400545 * seci, 6) AS ci_hi
         FROM w""",
    // per-unit post-minus-pre diffs across the exact integer midpoint
    "events_ttest_paired" ->
      """WITH base AS (SELECT user_id AS u,
                              CAST(floor(value * 100 + 0.5) AS BIGINT) AS y,
                              epoch_us(ts) AS us
                       FROM events WHERE value IS NOT NULL),
         mid AS (SELECT (min(us) + max(us)) // 2 AS mid_us FROM base),
         units AS (
           SELECT u,
                  CAST(sum(CASE WHEN us >= mid_us THEN y ELSE 0 END) AS BIGINT)
                  - CAST(sum(CASE WHEN us < mid_us THEN y ELSE 0 END) AS BIGINT)
                    AS dd
           FROM base CROSS JOIN mid GROUP BY u
           HAVING max(CASE WHEN us >= mid_us THEN 1 ELSE 0 END) = 1
              AND max(CASE WHEN us < mid_us THEN 1 ELSE 0 END) = 1),
         f AS (SELECT count(*) AS n, CAST(sum(dd) AS BIGINT) AS s1,
                      sum(CAST(dd AS DECIMAL(19,0)) * CAST(dd AS DECIMAL(19,0))) AS s2
               FROM units HAVING count(*) >= 2),
         v AS (SELECT n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
                      (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                         / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS sv
               FROM f)
         SELECT n AS n_units, round(mean / 100.0, 6) AS mean_diff,
                round(mean / sqrt(sv / CAST(n AS DOUBLE)), 6) AS t
         FROM v WHERE sv > 0.0""",
    // same pairing as ttest_paired; distinct-|d| doubled midranks, exact
    // hugeint W+/tie sums, one fixed scalar tree in Spark's op order
    "events_wilcoxon" ->
      """WITH base AS (SELECT user_id AS u,
                              CAST(floor(value * 100 + 0.5) AS BIGINT) AS y,
                              epoch_us(ts) AS us
                       FROM events WHERE value IS NOT NULL),
         mid AS (SELECT (min(us) + max(us)) // 2 AS mid_us FROM base),
         units AS (
           SELECT u,
                  CAST(sum(CASE WHEN us >= mid_us THEN y ELSE 0 END) AS BIGINT)
                  - CAST(sum(CASE WHEN us < mid_us THEN y ELSE 0 END) AS BIGINT)
                    AS dd
           FROM base CROSS JOIN mid GROUP BY u
           HAVING max(CASE WHEN us >= mid_us THEN 1 ELSE 0 END) = 1
              AND max(CASE WHEN us < mid_us THEN 1 ELSE 0 END) = 1),
         nz AS (SELECT abs(dd) AS ad,
                       CASE WHEN dd > 0 THEN 1 ELSE 0 END AS pos
                FROM units WHERE dd <> 0),
         grain AS (SELECT ad, CAST(sum(pos) AS BIGINT) AS cp,
                          CAST(sum(1 - pos) AS BIGINT) AS cm
                   FROM nz GROUP BY ad),
         r AS (SELECT ad, cp, cp + cm AS cn,
                      2 * coalesce(sum(cp + cm) OVER (ORDER BY ad
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) + (cp + cm) + 1 AS r2
               FROM grain),
         f AS (SELECT CAST(sum(cn) AS BIGINT) AS n,
                      sum(CAST(cp AS HUGEINT) * r2) AS w2,
                      sum(CAST(cn AS HUGEINT) * cn * cn - cn) AS tsum
               FROM r HAVING sum(cn) >= 2)
         SELECT n AS n_units, CAST(w2 AS DOUBLE) / 2.0 AS w_plus,
                round((CAST(w2 AS DOUBLE) / 2.0
                    - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0)
                  / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                      * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
                    - CAST(tsum AS DOUBLE) / 48.0), 6) AS z
         FROM f""",
    // per-conversion lookback join, (ts,id)-desc rank, exact integer
    // basis points with the remainder on the last touch
    "events_attribution_linear" ->
      """WITH conv AS (SELECT user_id AS k, epoch_us(ts) AS cts,
                              event_id AS cid
                       FROM events WHERE event_type = 'purchase'),
         touch AS (SELECT user_id AS k, epoch_us(ts) AS tts,
                          event_id AS tid, event_type AS channel
                   FROM events WHERE event_type <> 'purchase'),
         j AS (SELECT c.k, c.cid, t.channel, t.tts, t.tid
               FROM conv c JOIN touch t ON t.k = c.k
                AND t.tts <= c.cts AND t.tts >= c.cts - 86400000000),
         r AS (SELECT k, cid, channel,
                      row_number() OVER (PARTITION BY k, cid
                        ORDER BY tts DESC, tid DESC) AS rn,
                      count(*) OVER (PARTITION BY k, cid) AS n
               FROM j)
         SELECT channel,
                CAST(count(DISTINCT cid) AS BIGINT) AS n_conversions,
                CAST(count(*) AS BIGINT) AS n_touches,
                CAST(sum(10000 // n
                  + CASE WHEN rn = 1 THEN 10000 % n ELSE 0 END) AS BIGINT)
                  AS credit_bp
         FROM r GROUP BY 1""",
    // shared dense hourly grid, per-lag exact integer moments, the
    // corr-family double expression in Spark's op order
    "events_crosscorr" ->
      """WITH bt AS (SELECT date_trunc('hour', ts) AS h,
                  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
                  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
           FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1),
         bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM bt),
         spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
                     AS h FROM bounds),
         s AS (SELECT spine.h, coalesce(bt.x, 0) AS x, coalesce(bt.y, 0) AS y
               FROM spine LEFT JOIN bt ON bt.h = spine.h),
         lags AS (SELECT unnest([0, 1, 2, 3, 4, 6, 8, 12, 24]) AS lag),
         p AS (SELECT g.lag, a.x, b.y
               FROM lags g, s a, s b
               WHERE b.h = a.h + g.lag * INTERVAL 1 HOUR),
         m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(x) AS BIGINT) AS sx,
                      CAST(sum(y) AS BIGINT) AS sy,
                      CAST(sum(x * y) AS BIGINT) AS sxy,
                      CAST(sum(x * x) AS BIGINT) AS sxx,
                      CAST(sum(y * y) AS BIGINT) AS syy
               FROM p GROUP BY lag)
         SELECT lag, n,
                round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
                  AS crosscorr
         FROM m""",
    // unit-grain exact moments, per-arm delta-method variance, shared
    // A&S p polynomial — every double op in Spark's order
    "events_ratio_ztest" ->
      """WITH base AS (SELECT user_id AS u,
                              CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END AS n,
                              CASE WHEN event_type = 'view'
                                   THEN 1 ELSE 0 END AS dd
                       FROM events),
         units AS (SELECT u % 2 AS v, CAST(sum(n) AS BIGINT) AS n,
                          CAST(sum(dd) AS BIGINT) AS dn
                   FROM base GROUP BY u),
         byv AS (SELECT v, count(*) AS k, CAST(sum(n) AS BIGINT) AS sn,
                        CAST(sum(dn) AS BIGINT) AS sd,
                        sum(CAST(n AS HUGEINT) * n) AS snn,
                        sum(CAST(n AS HUGEINT) * dn) AS snd,
                        sum(CAST(dn AS HUGEINT) * dn) AS sdd
                 FROM units GROUP BY v),
         st AS (SELECT v, k,
                       CAST(sn AS DOUBLE) / CAST(sd AS DOUBLE) AS r,
                       CAST(snn AS DOUBLE) / CAST(k AS DOUBLE)
                         - (CAST(sn AS DOUBLE) / CAST(k AS DOUBLE))
                           * (CAST(sn AS DOUBLE) / CAST(k AS DOUBLE)) AS vn,
                       CAST(sdd AS DOUBLE) / CAST(k AS DOUBLE)
                         - (CAST(sd AS DOUBLE) / CAST(k AS DOUBLE))
                           * (CAST(sd AS DOUBLE) / CAST(k AS DOUBLE)) AS vd,
                       CAST(snd AS DOUBLE) / CAST(k AS DOUBLE)
                         - (CAST(sn AS DOUBLE) / CAST(k AS DOUBLE))
                           * (CAST(sd AS DOUBLE) / CAST(k AS DOUBLE)) AS cnd,
                       CAST(sd AS DOUBLE) / CAST(k AS DOUBLE) AS dbar
                FROM byv WHERE k >= 2 AND sd > 0),
         vr AS (SELECT v, k, r,
                       (vn - 2.0 * r * cnd + r * r * vd)
                         / (CAST(k AS DOUBLE) * dbar * dbar) AS vv
                FROM st),
         j AS (SELECT max(CASE WHEN v = 0 THEN k END) AS ka,
                      max(CASE WHEN v = 1 THEN k END) AS kb,
                      max(CASE WHEN v = 0 THEN r END) AS ra,
                      max(CASE WHEN v = 1 THEN r END) AS rb,
                      max(CASE WHEN v = 0 THEN vv END) AS va,
                      max(CASE WHEN v = 1 THEN vv END) AS vb
               FROM vr),
         w AS (SELECT ka, kb, ra, rb,
                      (rb - ra) / sqrt(va + vb) AS z
               FROM j
               WHERE ka IS NOT NULL AND kb IS NOT NULL AND va + vb > 0.0)
         SELECT ka AS k_a, kb AS k_b,
                round(ra, 6) AS ratio_a, round(rb, 6) AS ratio_b,
                round(rb - ra, 6) AS diff, round(z, 6) AS z,
                round(2.0 * (exp(abs(w.z) * abs(w.z) * -0.5)
                             * 0.3989422804014327)
                      * ((1.0 / (1.0 + 0.2316419 * abs(w.z)))
                         * (0.319381530 + (1.0 / (1.0 + 0.2316419 * abs(w.z)))
                            * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * abs(w.z)))
                               * (1.781477937 + (1.0 / (1.0 + 0.2316419 * abs(w.z)))
                                  * (-1.821255978 + (1.0 / (1.0 + 0.2316419 * abs(w.z)))
                                     * 1.330274429))))), 6) AS p_value
         FROM w""",
    // cumulative exact moments on the day grid; lnΛ scalar tree mirrors
    // Spark term-for-term; p rounded 6dp BEFORE the running min
    "events_msprt" ->
      """WITH base AS (SELECT CAST(ts AS DATE) AS day, user_id % 2 AS v,
                              CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
                       FROM events WHERE value IS NOT NULL),
         daily AS (SELECT day, v, count(*) AS n,
                          CAST(sum(y) AS BIGINT) AS s,
                          CAST(sum(y * y) AS BIGINT) AS ss
                   FROM base GROUP BY 1, 2),
         cum AS (SELECT day, v,
                        CAST(sum(n) OVER w AS BIGINT) AS cn,
                        CAST(sum(s) OVER w AS BIGINT) AS cs,
                        CAST(sum(ss) OVER w AS BIGINT) AS css
                 FROM daily
                 WINDOW w AS (PARTITION BY v ORDER BY day
                              ROWS UNBOUNDED PRECEDING)),
         j AS (SELECT a.day, a.cn AS na, a.cs AS sa, a.css AS ssa,
                      b.cn AS nb, b.cs AS sb, b.css AS ssb
               FROM cum a JOIN cum b ON a.day = b.day
               WHERE a.v = 0 AND b.v = 1),
         sc AS (SELECT day, na, nb,
                       CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)
                         - CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS dc,
                       ((CAST(ssa AS DOUBLE)
                           - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                             / CAST(na AS DOUBLE))
                        + (CAST(ssb AS DOUBLE)
                           - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
                             / CAST(nb AS DOUBLE)))
                       / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) AS s2
                FROM j),
         sv AS (SELECT day, na, nb, dc,
                       s2 * (1.0 / CAST(na AS DOUBLE)
                             + 1.0 / CAST(nb AS DOUBLE)) AS vc
                FROM sc),
         lr AS (SELECT day, na, nb, dc, vc,
                       0.5 * ln(vc / (vc + 100.0))
                         + dc * dc * 100.0
                           / (2.0 * vc * (vc + 100.0)) AS llr
                FROM sv WHERE vc > 0.0),
         pv AS (SELECT day, na, nb, dc, llr,
                       round(least(1.0, exp(-llr)), 6) AS p_av
                FROM lr)
         SELECT day, na AS n_a, nb AS n_b,
                round(dc / 100.0, 6) AS mean_delta,
                round(llr, 6) AS llr, p_av AS p_always_valid,
                min(p_av) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                  AS p_running
         FROM pv""",
    // exact sign-pair S, integer tie term, continuity-corrected z, A&S p
    "events_mann_kendall" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d, count(*) AS x
                        FROM events GROUP BY 1),
         idx AS (SELECT date_diff('day', (SELECT min(d) FROM daily), d)
                   AS t, x FROM daily),
         sp AS (SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
                                     WHEN b.x < a.x THEN -1
                                     ELSE 0 END) AS BIGINT) AS s
                FROM idx a JOIN idx b ON a.t < b.t),
         tie AS (SELECT CAST(COALESCE(sum(tk * (tk - 1) * (2 * tk + 5)), 0)
                   AS BIGINT) AS tie_term
                 FROM (SELECT count(*) AS tk FROM idx GROUP BY x)),
         nn AS (SELECT count(*) AS n_days FROM idx),
         v AS (SELECT n_days, s,
                      CAST(n_days * (n_days - 1) * (2 * n_days + 5)
                           - tie_term AS DOUBLE) / 18.0 AS var_s
               FROM nn CROSS JOIN sp CROSS JOIN tie
               WHERE n_days >= 3
                 AND CAST(n_days * (n_days - 1) * (2 * n_days + 5)
                          - tie_term AS DOUBLE) / 18.0 > 0.0),
         zz AS (SELECT n_days, s,
                       CASE WHEN s > 0
                            THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(var_s)
                            WHEN s < 0
                            THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(var_s)
                            ELSE 0.0 END AS z
                FROM v),
         pp AS (SELECT n_days, s, round(zz.z, 6) AS z,
                       round(2.0 * (exp(abs(zz.z) * abs(zz.z) * -0.5)
                                    * 0.3989422804014327)
                             * ((1.0 / (1.0 + 0.2316419 * abs(zz.z)))
                                * (0.319381530 + (1.0 / (1.0 + 0.2316419 * abs(zz.z)))
                                   * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * abs(zz.z)))
                                      * (1.781477937 + (1.0 / (1.0 + 0.2316419 * abs(zz.z)))
                                         * (-1.821255978 + (1.0 / (1.0 + 0.2316419 * abs(zz.z)))
                                            * 1.330274429))))), 6) AS p
                FROM zz)
         SELECT n_days, s, z, p,
                CAST(CASE WHEN p >= 0.05 THEN 0
                          WHEN s > 0 THEN 1
                          WHEN s < 0 THEN -1 ELSE 0 END AS BIGINT) AS trend
         FROM pp""",
    // run breaks via lag over the day frame; exact integer E[R]/Var(R)
    // terms in one fixed double tree
    "events_runs_test" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d, count(*) AS x
                        FROM events GROUP BY 1),
         med AS (SELECT quantile_cont(CAST(x AS DOUBLE), 0.5) AS m
                 FROM daily),
         signed AS (SELECT d, CAST(x AS DOUBLE) > m AS up
                    FROM daily CROSS JOIN med
                    WHERE CAST(x AS DOUBLE) <> m),
         runs AS (SELECT up,
                         CASE WHEN lag(up) OVER (ORDER BY d) IS NULL
                                OR lag(up) OVER (ORDER BY d) <> up
                              THEN 1 ELSE 0 END AS brk
                  FROM signed),
         agg AS (SELECT count(*) AS n_days,
                        CAST(sum(CASE WHEN up THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                        CAST(sum(CASE WHEN up THEN 0 ELSE 1 END) AS BIGINT) AS n2,
                        CAST(sum(brk) AS BIGINT) AS r
                 FROM runs
                 HAVING n1 >= 1 AND n2 >= 1 AND n1 + n2 >= 3),
         v AS (SELECT n_days, n1, n2, r,
                      CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d
               FROM agg),
         w AS (SELECT n_days, n1, n2, r,
                      (CAST(r AS DOUBLE)
                       - (2.0 * n1d * n2d / (n1d + n2d) + 1.0))
                        / sqrt(2.0 * n1d * n2d
                               * (2.0 * n1d * n2d - n1d - n2d)
                               / ((n1d + n2d) * (n1d + n2d)
                                  * ((n1d + n2d) - 1.0))) AS z,
                      2.0 * n1d * n2d * (2.0 * n1d * n2d - n1d - n2d)
                        / ((n1d + n2d) * (n1d + n2d)
                           * ((n1d + n2d) - 1.0)) AS var_r
               FROM v)
         SELECT n_days, n1 AS n_above, n2 AS n_below, r AS n_runs,
                round(w.z, 6) AS z,
                round(2.0 * (exp(abs(w.z) * abs(w.z) * -0.5)
                             * 0.3989422804014327)
                      * ((1.0 / (1.0 + 0.2316419 * abs(w.z)))
                         * (0.319381530 + (1.0 / (1.0 + 0.2316419 * abs(w.z)))
                            * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * abs(w.z)))
                               * (1.781477937 + (1.0 / (1.0 + 0.2316419 * abs(w.z)))
                                  * (-1.821255978 + (1.0 / (1.0 + 0.2316419 * abs(w.z)))
                                     * 1.330274429))))), 6) AS p
         FROM w WHERE var_r > 0.0""",
    // NTILE deciles over (count, user) asc, cumulative int64 sums
    "events_lorenz" ->
      """WITH pk AS (SELECT user_id AS k, count(*) AS x
                     FROM events GROUP BY user_id),
         b AS (SELECT k, x, ntile(10) OVER (ORDER BY x, k) AS decile
               FROM pk),
         g AS (SELECT decile, count(*) AS n_keys,
                      CAST(sum(x) AS BIGINT) AS sx
               FROM b GROUP BY decile),
         t AS (SELECT CAST(sum(sx) AS BIGINT) AS total FROM g)
         SELECT CAST(decile AS BIGINT) AS decile,
                CAST(sum(n_keys) OVER w AS BIGINT) AS n_keys_cum,
                CAST(sum(sx) OVER w AS BIGINT) AS weight_cum,
                round(CAST(sum(sx) OVER w AS DOUBLE)
                      / CAST(total AS DOUBLE), 6) AS share
         FROM g CROSS JOIN t
         WHERE total > 0
         WINDOW w AS (ORDER BY decile
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY decile""",
    // per-user lag gaps pooled at the distinct-second grain; λ̂ = n/Σg;
    // the sup checks both CDF step sides per value
    "events_interarrival_fit" ->
      """WITH base AS (SELECT user_id AS k, epoch_us(ts) AS us, event_id AS e
                       FROM events),
         lagd AS (SELECT k, us,
                         lag(us) OVER (PARTITION BY k ORDER BY us, e) AS prev
                  FROM base),
         gaps AS (SELECT (us - prev) // 1000000 AS g
                  FROM lagd WHERE prev IS NOT NULL),
         grain AS (SELECT g, count(*) AS c FROM gaps GROUP BY g),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                        CAST(sum(g * CAST(c AS DECIMAL(19,0))) AS DOUBLE) AS sgd,
                        CAST(sum(c) AS DOUBLE) AS nd
                 FROM grain HAVING sum(g * CAST(c AS DECIMAL(19,0))) > 0),
         st AS (SELECT g, c, n, nd / sgd AS lam,
                       CAST(sum(c) OVER (ORDER BY g
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS BIGINT) AS cum
                FROM grain CROSS JOIN tot),
         f AS (SELECT n, lam,
                      CAST(cum AS DOUBLE) / CAST(n AS DOUBLE) AS f_at,
                      (CAST(cum AS DOUBLE) - CAST(c AS DOUBLE))
                        / CAST(n AS DOUBLE) AS f_before,
                      1.0 - exp((-lam) * CAST(g AS DOUBLE)) AS f_exp
               FROM st)
         SELECT max(n) AS n_gaps, round(max(lam), 6) AS lambda_per_sec,
                round(max(greatest(abs(f_at - f_exp),
                                   abs(f_before - f_exp))), 6) AS ks_d
         FROM f HAVING max(n) IS NOT NULL""",
    // distinct-value-grain trim: integer clamp of per-value kept copies,
    // exact Σ kept·y / Σ kept — no row windows, no interpolation
    "events_trimmed_mean" ->
      """WITH m AS (SELECT event_type AS g,
                           CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
                    FROM events WHERE value IS NOT NULL),
         vals AS (SELECT g, y, count(*) AS c FROM m GROUP BY g, y),
         st AS (SELECT g, y, c,
                       CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n,
                       CAST(sum(c) OVER (PARTITION BY g ORDER BY y
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS BIGINT) AS upto
                FROM vals),
         kk AS (SELECT g, y, c, n, upto - c AS below, n - upto AS above,
                       CAST(floor(CAST(n AS DOUBLE) * 0.1) AS BIGINT) AS k
                FROM st),
         kept AS (SELECT g, y, c, n, k,
                         c - greatest(CAST(0 AS BIGINT), least(k - below, c))
                           - greatest(CAST(0 AS BIGINT), least(k - above, c))
                           AS kept
                  FROM kk)
         SELECT g AS event_type, CAST(max(n) AS BIGINT) AS n,
                CAST(max(k) AS BIGINT) AS n_trimmed_each,
                round(CAST(sum(greatest(CAST(0 AS BIGINT), kept)
                                * CAST(y AS DECIMAL(19,0))) AS DOUBLE)
                      / CAST(sum(greatest(CAST(0 AS BIGINT), kept)) AS DOUBLE)
                      / 100.0, 6) AS mean_trimmed,
                round(CAST(sum(CAST(y AS DECIMAL(19,0)) * c) AS DOUBLE)
                      / CAST(max(n) AS DOUBLE) / 100.0, 6) AS mean_raw
         FROM kept GROUP BY g HAVING sum(greatest(CAST(0 AS BIGINT), kept)) > 0""",
    // mean-metric planner: observed σ² from exact moments; z quantiles and
    // mde² stay DOUBLE products (the min_sample_size pitfall)
    "events_min_sample_means" ->
      """WITH m AS (SELECT event_type AS g,
                           CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
                    FROM events WHERE value IS NOT NULL),
         g AS (SELECT g, count(*) AS n, CAST(sum(y) AS BIGINT) AS s1,
                      sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS s2
               FROM m GROUP BY 1 HAVING count(*) >= 2),
         v AS (SELECT g, n,
                      (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                         / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS v
               FROM g)
         SELECT g AS event_type, n, round(sqrt(v) / 100.0, 6) AS stddev,
                CAST(ceil(2.0 * (1.9599639845400545 + 0.8416212335729143)
                          * (1.9599639845400545 + 0.8416212335729143) * v
                          / ((0.05 * 100.0) * (0.05 * 100.0))) AS BIGINT)
                  AS min_n_per_arm
         FROM v WHERE v > 0.0""",
    // KM: exact integer day durations; survival = exp(Σ ln((n−d)/n)) over
    // ascending event times, absorbed-at-zero guarded — same tree as Spark
    "orders_survival_km" ->
      """WITH base AS (SELECT o_custkey AS u, epoch_us(o_orderdate) AS us
                       FROM orders),
         h AS (SELECT max(us) AS h_us FROM base),
         lagd AS (SELECT u, us, lead(us) OVER (PARTITION BY u ORDER BY us)
                    AS nxt FROM base),
         durs AS (SELECT CASE WHEN nxt IS NOT NULL
                              THEN (nxt - us) // 86400000000
                              ELSE (h_us - us) // 86400000000 END AS t,
                         CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev
                  FROM lagd CROSS JOIN h),
         grain AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d,
                          CAST(sum(1 - ev) AS BIGINT) AS c
                   FROM durs GROUP BY t),
         tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n_total FROM grain),
         s1 AS (SELECT t, d, c,
                       CAST(n_total - sum(d + c) OVER (ORDER BY t
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         + d + c AS BIGINT) AS n_risk
                FROM grain CROSS JOIN tot),
         s2 AS (SELECT t, d, c, n_risk,
                       sum(CASE WHEN d < n_risk
                                THEN ln(CAST(n_risk - d AS DOUBLE)
                                        / CAST(n_risk AS DOUBLE))
                                ELSE 0.0 END)
                         OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS ln_s,
                       max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
                         OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS absorbed
                FROM s1)
         SELECT t AS duration_days, n_risk, d AS n_events, c AS n_censored,
                CASE WHEN absorbed = 1 THEN 0.0
                     ELSE round(exp(ln_s), 6) END AS survival
         FROM s2 WHERE d > 0 ORDER BY 1""",
    // the KM SQL with every window partitioned by segment; global horizon
    "orders_survival_by_segment" ->
      """WITH base AS (SELECT c.c_mktsegment AS seg, o.o_custkey AS u,
                              epoch_us(o.o_orderdate) AS us
                       FROM orders o JOIN customer c
                         ON o.o_custkey = c.c_custkey),
         h AS (SELECT max(us) AS h_us FROM base),
         lagd AS (SELECT seg, u, us,
                         lead(us) OVER (PARTITION BY seg, u ORDER BY us)
                           AS nxt FROM base),
         durs AS (SELECT seg,
                         CASE WHEN nxt IS NOT NULL
                              THEN (nxt - us) // 86400000000
                              ELSE (h_us - us) // 86400000000 END AS t,
                         CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev
                  FROM lagd CROSS JOIN h),
         grain AS (SELECT seg, t, CAST(sum(ev) AS BIGINT) AS d,
                          CAST(sum(1 - ev) AS BIGINT) AS c
                   FROM durs GROUP BY seg, t),
         s1 AS (SELECT seg, t, d, c,
                       CAST(sum(d + c) OVER (PARTITION BY seg)
                            - sum(d + c) OVER (PARTITION BY seg ORDER BY t
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            + d + c AS BIGINT) AS n_risk
                FROM grain),
         s2 AS (SELECT seg, t, d, c, n_risk,
                       sum(CASE WHEN d < n_risk
                                THEN ln(CAST(n_risk - d AS DOUBLE)
                                        / CAST(n_risk AS DOUBLE))
                                ELSE 0.0 END)
                         OVER (PARTITION BY seg ORDER BY t
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS ln_s,
                       max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
                         OVER (PARTITION BY seg ORDER BY t
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS absorbed
                FROM s1)
         SELECT seg AS c_mktsegment, t AS duration_days, n_risk,
                d AS n_events, c AS n_censored,
                CASE WHEN absorbed = 1 THEN 0.0
                     ELSE round(exp(ln_s), 6) END AS survival
         FROM s2 WHERE d > 0 ORDER BY 1, 2""",
    // level-synchronous reachability: UNION-dedup keeps STATES (node,hop),
    // never paths; min(hop) per node is the BFS distance
    "supplier_bfs_hops" ->
      """WITH RECURSIVE pairs AS (
           SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
         e AS (SELECT a.sk AS src, b.sk AS dst
               FROM pairs a JOIN pairs b USING (ok)
               WHERE a.sk <> b.sk
               GROUP BY 1, 2 HAVING count(*) >= 2),
         seed AS (SELECT min(src) AS s FROM e),
         walk(node, hop) AS (
           SELECT s, 0 FROM seed
           UNION
           SELECT e.dst, w.hop + 1
           FROM walk w JOIN e ON e.src = w.node WHERE w.hop < 4),
         best AS (SELECT node, min(hop) AS hop FROM walk GROUP BY node)
         SELECT CAST(hop AS BIGINT) AS hop, count(*) AS n_nodes
         FROM best GROUP BY hop ORDER BY hop""",
    // 12 unrolled peel rounds — the Spark side iterates to the fixed
    // point and THROWS if 12 rounds don't reach it, so both engines
    // evaluate the same converged core
    "supplier_kcore" -> {
      val peels = (1 to 12).map { i =>
        s"""d$i AS (SELECT e.src AS node, count(*) AS deg FROM e
           JOIN a${i - 1} x ON x.node = e.src
           JOIN a${i - 1} y ON y.node = e.dst GROUP BY 1),
         a$i AS (SELECT node FROM d$i WHERE deg >= 3)"""
      }.mkString(",\n         ")
      s"""WITH pairs AS MATERIALIZED (
           SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
         e AS MATERIALIZED (SELECT a.sk AS src, b.sk AS dst
               FROM pairs a JOIN pairs b USING (ok)
               WHERE a.sk <> b.sk
               GROUP BY 1, 2 HAVING count(*) >= 2),
         a0 AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         $peels
         SELECT node, deg AS core_degree FROM d12 WHERE deg >= 3"""
    },
    // 4 unrolled synchronous LPA rounds: per-round vote = most frequent
    // in-neighbor label, min-label tie-break (row_number mirror of
    // Spark's all-integer max_by pick); no-in-edge nodes keep their label
    "part_communities" -> {
      val rounds = (1 to 4).map { i =>
        s"""v$i AS (SELECT node, lbl FROM (
             SELECT e.dst AS node, l.lbl AS lbl, count(*) AS c,
                    row_number() OVER (PARTITION BY e.dst
                      ORDER BY count(*) DESC, l.lbl) AS rn
             FROM e JOIN l${i - 1} l ON l.node = e.src
             GROUP BY e.dst, l.lbl) WHERE rn = 1),
         l$i AS (SELECT l.node, coalesce(v.lbl, l.lbl) AS lbl
                 FROM l${i - 1} l LEFT JOIN v$i v ON v.node = l.node)"""
      }.mkString(",\n         ")
      s"""WITH pairs AS MATERIALIZED (
           SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_type LIKE 'PROMO%'),
         e AS MATERIALIZED (SELECT DISTINCT a.pk AS src, b.pk AS dst
               FROM pairs a JOIN pairs b USING (ok) WHERE a.pk <> b.pk),
         l0 AS (SELECT node, node AS lbl
                FROM (SELECT src AS node FROM e UNION SELECT dst FROM e)),
         $rounds
         SELECT node, lbl AS label FROM l4"""
    },
    // identical wedge enumeration through in-play customers, identical
    // fixed-point AA quantization floor(1e6/ln(deg)) summed as exact
    // integers (order-independent — the r18 spill-band fix), and the
    // all-integer (cn, min partner) pick
    "supplier_best_partner" ->
      """WITH b AS MATERIALIZED (
           SELECT DISTINCT o_custkey AS c, l_suppkey AS s
           FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         deg AS (SELECT c, CAST(count(*) AS BIGINT) AS degc
                 FROM b GROUP BY c),
         ip AS (SELECT b.c, b.s,
                  CAST(floor(1e6 / ln(CAST(degc AS DOUBLE))) AS BIGINT) AS w
                FROM b JOIN deg USING (c)
                WHERE degc BETWEEN 2 AND 4096),
         p AS (SELECT a.s AS s1, x.s AS s2,
                      CAST(count(*) AS BIGINT) AS cn,
                      CAST(sum(a.w) AS BIGINT) AS aaq
               FROM ip a JOIN ip x ON a.c = x.c AND a.s < x.s
               GROUP BY 1, 2),
         m AS (SELECT s1 AS node, s2 AS partner, cn, aaq FROM p
               UNION ALL SELECT s2, s1, cn, aaq FROM p),
         r AS (SELECT node, partner, cn, aaq,
                      row_number() OVER (PARTITION BY node
                        ORDER BY cn DESC, partner) AS rn
               FROM m)
         SELECT node, partner, cn AS common_neighbors,
                round(CAST(aaq AS DOUBLE) / 1e6, 6) AS adamic_adar
         FROM r WHERE rn = 1""",
    // ordered twin of basket_brand_pairs; every statistic the same
    // fixed tree over exact counts; exact rules report NULL conviction
    "basket_rules" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS bk, p_brand AS it
                        FROM lineitem JOIN part ON l_partkey = p_partkey),
         marg AS (SELECT it, CAST(count(*) AS BIGINT) AS n
                  FROM items GROUP BY 1),
         tot AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS nb FROM items),
         pairs AS (SELECT a.it AS antecedent, b.it AS consequent,
                          CAST(count(*) AS BIGINT) AS n_ab
                   FROM items a JOIN items b ON a.bk = b.bk AND a.it <> b.it
                   GROUP BY 1, 2 HAVING count(*) >= 2)
         SELECT antecedent, consequent, n_ab,
                round(CAST(n_ab AS DOUBLE) / CAST(na.n AS DOUBLE), 6)
                  AS confidence,
                round(CAST(n_ab AS DOUBLE) * CAST(nb AS DOUBLE)
                    / (CAST(na.n AS DOUBLE) * CAST(nc.n AS DOUBLE)), 6)
                  AS lift,
                round(CAST(n_ab AS DOUBLE) / CAST(nb AS DOUBLE)
                    - CAST(na.n AS DOUBLE) / CAST(nb AS DOUBLE)
                      * (CAST(nc.n AS DOUBLE) / CAST(nb AS DOUBLE)), 6)
                  AS leverage,
                CASE WHEN n_ab < na.n THEN
                  round((1.0 - CAST(nc.n AS DOUBLE) / CAST(nb AS DOUBLE))
                      / (1.0 - CAST(n_ab AS DOUBLE) / CAST(na.n AS DOUBLE)),
                    6) END AS conviction
         FROM pairs
         JOIN marg na ON na.it = antecedent
         JOIN marg nc ON nc.it = consequent
         CROSS JOIN tot""",
    // exact integer per-supplier revenue totals; HHI/CR1 as single
    // divisions of exact sums (HUGEINT mirror of the decimal(38,0) lane)
    "nation_supplier_hhi" ->
      """WITH pk AS (
           SELECT n_name, l_suppkey AS k,
                  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
                    AS BIGINT)) AS BIGINT) AS m
           FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           GROUP BY 1, 2),
         g AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n_keys,
                      CAST(sum(m) AS HUGEINT) AS s,
                      sum(CAST(m AS HUGEINT) * CAST(m AS HUGEINT)) AS s2,
                      max(m) AS mx
               FROM pk GROUP BY 1 HAVING sum(m) > 0)
         SELECT n_name, n_keys,
                round(CAST(s2 AS DOUBLE)
                  / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)), 6) AS hhi,
                round(CAST(mx AS DOUBLE) / CAST(s AS DOUBLE), 6)
                  AS top_share
         FROM g""",
    // identical (month, part) integer grain, base-month matched join,
    // and the one unit-value double tree
    "monthly_price_index" ->
      """WITH g AS (
           SELECT date_trunc('month', l_shipdate) AS m, l_partkey AS k,
                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
                  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
                    AS BIGINT)) AS BIGINT) AS e
           FROM lineitem GROUP BY 1, 2),
         b AS (SELECT k, q AS q0, e AS e0 FROM g
               WHERE m = (SELECT min(m) FROM g)),
         j AS (SELECT m, CAST(count(*) AS BIGINT) AS n_items,
                      CAST(sum(e) AS BIGINT) AS se,
                      CAST(sum(q) AS BIGINT) AS sq,
                      CAST(sum(e0) AS BIGINT) AS se0,
                      CAST(sum(q0) AS BIGINT) AS sq0
               FROM g JOIN b USING (k) GROUP BY m
               HAVING sum(q) > 0 AND sum(q0) > 0 AND sum(e0) > 0)
         SELECT m AS month, n_items,
                round((CAST(se AS DOUBLE) / CAST(sq AS DOUBLE))
                  / (CAST(se0 AS DOUBLE) / CAST(sq0 AS DOUBLE)), 6)
                  AS price_index
         FROM j""",
    // the identical per-field CASE recurrence replayed over every part
    // in lockstep by one recursive CTE (the holt_winters argument,
    // multi-series form)
    "part_croston_forecast" ->
      """WITH RECURSIVE grain AS (
           SELECT date_trunc('month', l_shipdate) AS m, l_partkey AS k,
                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x
           FROM lineitem GROUP BY 1, 2),
         bounds AS (SELECT min(m) AS m0, max(m) AS m1 FROM grain),
         spine AS (SELECT unnest(generate_series(m0, m1, INTERVAL 1 MONTH))
                     AS m FROM bounds),
         ks AS (SELECT DISTINCT k FROM grain),
         dense AS (SELECT ks.k, spine.m, coalesce(grain.x, 0) AS x
                   FROM ks CROSS JOIN spine
                   LEFT JOIN grain ON grain.k = ks.k AND grain.m = spine.m),
         ser AS (SELECT k, row_number() OVER (PARTITION BY k ORDER BY m)
                          AS i,
                        CAST(x AS DOUBLE) AS x
                 FROM dense),
         nm AS (SELECT k, CAST(count(*) AS BIGINT) AS n_months
                FROM ser GROUP BY k),
         rec AS (
           SELECT k, 0 AS i, CAST(0.0 AS DOUBLE) AS z,
                  CAST(0.0 AS DOUBLE) AS p, CAST(0.0 AS DOUBLE) AS q,
                  CAST(0 AS BIGINT) AS nd
           FROM ks
           UNION ALL
           SELECT s.k, s.i,
                  CASE WHEN s.x <= 0.0 THEN r.z
                       WHEN r.nd = 0 THEN s.x
                       ELSE 0.5 * s.x + 0.5 * r.z END,
                  CASE WHEN s.x <= 0.0 THEN r.p
                       WHEN r.nd = 0 THEN r.q + 1.0
                       ELSE 0.5 * (r.q + 1.0) + 0.5 * r.p END,
                  CASE WHEN s.x <= 0.0 THEN r.q + 1.0 ELSE 0.0 END,
                  CASE WHEN s.x <= 0.0 THEN r.nd ELSE r.nd + 1 END
           FROM rec r JOIN ser s ON s.k = r.k AND s.i = r.i + 1),
         fin AS (SELECT r.k, r.z, r.p, r.nd
                 FROM rec r JOIN nm ON nm.k = r.k AND r.i = nm.n_months)
         SELECT fin.k AS p_partkey, nm.n_months, fin.nd AS n_demands,
                round(z, 6) AS demand_size,
                round(p, 6) AS demand_interval,
                round(z / p, 6) AS forecast_per_month
         FROM fin JOIN nm ON nm.k = fin.k WHERE fin.nd > 0""",
    // the identical +1/-1 interval sweep at day grain
    "orders_open_backlog" ->
      """WITH spans AS (
           SELECT o_orderkey, min(date_trunc('day', o_orderdate)) AS d0,
                  max(date_trunc('day', l_shipdate)) AS d1
           FROM orders JOIN lineitem ON l_orderkey = o_orderkey
           GROUP BY 1),
         deltas AS (
           SELECT d, CAST(sum(delta) AS BIGINT) AS delta
           FROM (SELECT d0 AS d, 1 AS delta FROM spans
                 UNION ALL SELECT d1 + INTERVAL 1 DAY, -1 FROM spans)
           GROUP BY d)
         SELECT d AS day,
                CAST(sum(delta) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) AS open_orders
         FROM deltas""",
    // identical exact mean sums, the fixed known variances, and the
    // pinned A&S p tree
    "events_mean_ztest" ->
      """WITH m AS (
           SELECT (epoch_us(ts) // 86400000000) % 7 AS bucket,
                  user_id % 2 = 0 AS a,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
           FROM events),
         g AS (SELECT bucket,
                      CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT)
                        AS na,
                      CAST(sum(CASE WHEN a THEN y ELSE 0 END) AS BIGINT)
                        AS sa,
                      CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT)
                        AS nb,
                      CAST(sum(CASE WHEN NOT a THEN y ELSE 0 END)
                        AS BIGINT) AS sb
               FROM m GROUP BY 1 HAVING na >= 1 AND nb >= 1),
         v AS (SELECT bucket, na, nb,
                      CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd,
                      CAST(sa AS DOUBLE) AS sad, CAST(sb AS DOUBLE) AS sbd
               FROM g),
         w AS (SELECT bucket, na, nb, nad, nbd, sad, sbd,
                      sad / nad - sbd / nbd AS diff,
                      sqrt(16000000.0 / nad + 12250000.0 / nbd) AS se
               FROM v)
         SELECT bucket, na AS n_a, nb AS n_b,
                round(sad / nad / 100.0, 6) AS mean_a,
                round(sbd / nbd / 100.0, 6) AS mean_b,
                round(diff / se, 6) AS z,
                round(2.0 * (exp(abs(diff / se) * abs(diff / se) * -0.5)
                             * 0.3989422804014327)
                      * ((1.0 / (1.0 + 0.2316419 * abs(diff / se)))
                         * (0.319381530 + (1.0 / (1.0 + 0.2316419 * abs(diff / se)))
                            * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * abs(diff / se)))
                               * (1.781477937 + (1.0 / (1.0 + 0.2316419 * abs(diff / se)))
                                  * (-1.821255978 + (1.0 / (1.0 + 0.2316419 * abs(diff / se)))
                                     * 1.330274429))))), 6) AS p,
                round((diff - 1.959963984540054 * se) / 100.0, 6) AS ci_lo,
                round((diff + 1.959963984540054 * se) / 100.0, 6) AS ci_hi
         FROM w""",
    // consecutive-pair build + the theilsU fold body verbatim (X = next
    // type, Y = current type)
    "events_entropy_rate" ->
      """WITH seq AS (
           SELECT event_type AS from_op,
                  lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS to_op
           FROM events),
         cells AS (
           SELECT to_op AS r, from_op AS c, CAST(count(*) AS BIGINT) AS o
           FROM seq WHERE to_op IS NOT NULL GROUP BY 1, 2),
         st AS (
           SELECT r, c, o,
                  CAST(sum(o) OVER (PARTITION BY c) AS BIGINT) AS cm,
                  CAST(sum(o) OVER () AS BIGINT) AS nn
           FROM cells),
         pr AS (
           SELECT r, max(nn) AS nn, arg_max(hr_cum, c) AS hr
           FROM (SELECT r, c, nn,
                        sum((CAST(o AS DOUBLE) / CAST(nn AS DOUBLE))
                            * ln(CAST(o AS DOUBLE) / CAST(cm AS DOUBLE)))
                          OVER (PARTITION BY r ORDER BY c
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS hr_cum
                 FROM st)
           GROUP BY r),
         hxy AS (
           SELECT max(nn) AS n, arg_max(hxy_cum, r) AS neg_hxy
           FROM (SELECT r, nn,
                        sum(hr) OVER (ORDER BY r ROWS BETWEEN UNBOUNDED
                          PRECEDING AND CURRENT ROW) AS hxy_cum
                 FROM pr)),
         rm AS (
           SELECT r, CAST(sum(o) AS BIGINT) AS rm FROM cells GROUP BY r),
         rm2 AS (
           SELECT r, rm, CAST(sum(rm) OVER () AS BIGINT) AS nn FROM rm),
         hx AS (
           SELECT arg_max(hx_cum, r) AS neg_hx
           FROM (SELECT r,
                        sum((CAST(rm AS DOUBLE) / CAST(nn AS DOUBLE))
                            * ln(CAST(rm AS DOUBLE) / CAST(nn AS DOUBLE)))
                          OVER (ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS hx_cum
                 FROM rm2)),
         f AS (
           SELECT n, 0.0 - neg_hx AS h_x, 0.0 - neg_hxy AS h_x_given_y
           FROM hxy CROSS JOIN hx)
         SELECT n AS n_transitions, round(h_x, 6) AS h_next,
                round(h_x_given_y, 6) AS h_rate,
                round((h_x - h_x_given_y) / h_x, 6) AS predictability
         FROM f WHERE h_x > 0.0""",
    // dimensions re-derived from the WebP builder's id arithmetic
    "mm_webp_probe" ->
      """WITH p AS (SELECT doc_id, 16 + (doc_id % 50) AS w,
                           16 + ((doc_id // 7) % 40) AS h
                    FROM documents)
         SELECT CAST(w AS BIGINT) AS width,
                count(*) AS n_items,
                CAST(sum(h) AS BIGINT) AS sum_height,
                'webp' AS format
         FROM p GROUP BY 1""",
    // identical tokenization, stop-run construction, exact deg/freq,
    // and position-ordered score folds
    "docs_rake_keywords" ->
      """WITH tok0 AS (
           SELECT doc_id AS doc,
                  unnest(string_split(lower(text), ' ')) AS w,
                  generate_subscripts(string_split(lower(text), ' '), 1)
                    AS pos
           FROM documents),
         tok AS (SELECT doc, w, pos, (w IN ('a', 'the')) AS stop
                 FROM tok0 WHERE w <> ''),
         runs AS (SELECT doc, w, pos, stop,
                    sum(CASE WHEN stop THEN 1 ELSE 0 END)
                      OVER (PARTITION BY doc ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS run
                  FROM tok),
         members AS (SELECT doc, run, pos, w FROM runs WHERE NOT stop),
         phrases AS (SELECT doc, run, CAST(count(*) AS BIGINT) AS len,
                            string_agg(w, ' ' ORDER BY pos) AS phrase
                     FROM members GROUP BY doc, run
                     HAVING count(*) BETWEEN 2 AND 4),
         kept AS (SELECT m.doc, m.run, m.pos, m.w, p.len, p.phrase
                  FROM members m
                  JOIN phrases p ON p.doc = m.doc AND p.run = m.run),
         stats AS (SELECT w, CAST(count(*) AS BIGINT) AS freq,
                          CAST(sum(len) AS BIGINT) AS deg
                   FROM kept GROUP BY w),
         occ AS (SELECT doc, run, max(phrase) AS phrase,
                        arg_max(cum, pos) AS score
                 FROM (SELECT k.doc, k.run, k.pos, k.phrase,
                              sum(CAST(s.deg AS DOUBLE)
                                  / CAST(s.freq AS DOUBLE))
                                OVER (PARTITION BY k.doc, k.run
                                  ORDER BY k.pos ROWS BETWEEN UNBOUNDED
                                  PRECEDING AND CURRENT ROW) AS cum
                       FROM kept k JOIN stats s ON s.w = k.w)
                 GROUP BY doc, run)
         SELECT phrase, CAST(count(DISTINCT doc) AS BIGINT) AS n_docs,
                CAST(count(*) AS BIGINT) AS n_occurrences,
                round(max(score), 6) AS score
         FROM occ GROUP BY phrase HAVING count(*) >= 2""",
    // identical quantized grid, exact integer distance test, and the
    // core/border/noise resolution
    "emb_dbscan_core" ->
      """WITH e AS (
           SELECT vec_id,
                  list_transform(embedding, x -> CAST(floor(
                    CAST(x AS DOUBLE) * 1024 + 0.5) AS BIGINT)) AS q
           FROM embeddings),
         p AS (SELECT a.vec_id AS a, b.vec_id AS b
               FROM e a JOIN e b ON a.vec_id < b.vec_id
               WHERE (SELECT sum((z.u - z.v) * (z.u - z.v))
                      FROM (SELECT unnest(a.q) AS u, unnest(b.q) AS v) z)
                     <= 1550000),
         m AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
         cnt AS (SELECT e.vec_id,
                        1 + CAST(coalesce(t.nb, 0) AS BIGINT)
                          AS n_neighbors
                 FROM e LEFT JOIN (SELECT a, count(*) AS nb
                                   FROM m GROUP BY a) t
                   ON t.a = e.vec_id),
         core AS (SELECT vec_id FROM cnt WHERE n_neighbors >= 5),
         border AS (SELECT DISTINCT m.a AS vec_id
                    FROM m JOIN core ON core.vec_id = m.b)
         SELECT c.vec_id, c.n_neighbors,
                CASE WHEN co.vec_id IS NOT NULL THEN 'core'
                     WHEN bo.vec_id IS NOT NULL THEN 'border'
                     ELSE 'noise' END AS cls
         FROM cnt c
         LEFT JOIN core co ON co.vec_id = c.vec_id
         LEFT JOIN border bo ON bo.vec_id = c.vec_id""",
    // Holt–Winters: exact integer init (sums of counts in doubles), then
    // the order-determined recurrence replayed step-for-step; the seasonal
    // list updates by slicing, lnew bound once in the inner subquery (the
    // VALUE matches Spark's textually-repeated tree)
    "events_holt_winters" ->
      """WITH RECURSIVE obs AS (
           SELECT date_trunc('hour', ts) AS h, count(*) AS x
           FROM events GROUP BY 1),
         bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM obs),
         spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
                     AS h FROM bounds),
         ser AS (SELECT row_number() OVER (ORDER BY s.h) AS i,
                        CAST(COALESCE(o.x, 0) AS DOUBLE) AS x
                 FROM spine s LEFT JOIN obs o ON o.h = s.h),
         par AS (SELECT count(*) AS n FROM ser),
         m AS (SELECT sum(x) FILTER (WHERE i <= 24) / 24.0 AS m1,
                      CASE WHEN (SELECT n FROM par) >= 48
                           THEN (sum(x) FILTER (WHERE i > 24 AND i <= 48)
                                   / 24.0
                                 - sum(x) FILTER (WHERE i <= 24) / 24.0)
                                / 24.0
                           ELSE 0.0 END AS b0
               FROM ser),
         s0 AS (SELECT list(x - (SELECT m1 FROM m) ORDER BY i) AS s
                FROM ser WHERE i <= 24),
         rec AS (
           SELECT 24 AS i, (SELECT m1 FROM m) AS l, (SELECT b0 FROM m) AS b,
                  (SELECT s FROM s0) AS s
           FROM par WHERE n >= 24
           UNION ALL
           SELECT t.i, t.lnew,
                  0.5 * (t.lnew - t.l) + 0.5 * t.b,
                  t.s[1:t.sl-1]
                    || [0.5 * (t.x - t.lnew) + 0.5 * t.sv]
                    || t.s[t.sl+1:24]
           FROM (SELECT sr.i AS i, r.l AS l, r.b AS b, r.s AS s, sr.x AS x,
                        (r.i % 24) + 1 AS sl,
                        r.s[(r.i % 24) + 1] AS sv,
                        0.5 * (sr.x - r.s[(r.i % 24) + 1])
                          + 0.5 * (r.l + r.b) AS lnew
                 FROM rec r JOIN ser sr ON sr.i = r.i + 1) t),
         fin AS (SELECT i, l, b, s FROM rec ORDER BY i DESC LIMIT 1)
         SELECT CAST(h AS BIGINT) AS h,
                round(l + CAST(h AS DOUBLE) * b
                      + s[((i + h - 1) % 24) + 1], 6) AS forecast
         FROM fin CROSS JOIN
              (SELECT unnest(generate_series(1, 24)) AS h) hs""",
    // A-ES keys replayed verbatim: ln of the same hash-uniform over the
    // same weight; the (es, doc_id) ordering is unique so LIMIT is stable
    "docs_weighted_sample" ->
      """SELECT doc_id, lang, n_chars FROM (
           SELECT doc_id, lang, n_chars,
                  ln(CAST((doc_id * 2654435761) % 10000 + 1 AS DOUBLE)
                     / 10001.0)
                    / CAST(greatest(n_chars, 1) AS DOUBLE) AS es
           FROM documents
           ORDER BY es DESC, doc_id LIMIT 100)""",
    // the same A-ES key formula ranked per source
    "docs_stratified_weighted" ->
      """SELECT doc_id, source, n_chars FROM (
           SELECT doc_id, source, n_chars,
                  row_number() OVER (PARTITION BY source ORDER BY
                    ln(CAST((doc_id * 2654435761) % 10000 + 1 AS DOUBLE)
                       / 10001.0)
                      / CAST(greatest(n_chars, 1) AS DOUBLE) DESC,
                    doc_id) AS rk
           FROM documents) WHERE rk <= 10""",
    // the maintained reservoir's exactness contract IS the one-shot draw:
    // same oracle as docs_weighted_sample
    "docs_sample_maintained" ->
      """SELECT doc_id, lang, n_chars FROM (
           SELECT doc_id, lang, n_chars,
                  ln(CAST((doc_id * 2654435761) % 10000 + 1 AS DOUBLE)
                     / 10001.0)
                    / CAST(greatest(n_chars, 1) AS DOUBLE) AS es
           FROM documents
           ORDER BY es DESC, doc_id LIMIT 100)""",
    // Flesch over exact counts; vowel-run syllables + all-consonant words
    "text_readability" ->
      """SELECT doc_id, n_words, n_sentences, n_syllables,
                CASE WHEN n_words > 0 THEN
                  round(206.835
                        - 1.015 * (CAST(n_words AS DOUBLE)
                                   / CAST(n_sentences AS DOUBLE))
                        - 84.6 * (CAST(n_syllables AS DOUBLE)
                                  / CAST(n_words AS DOUBLE)), 4)
                END AS flesch
         FROM (SELECT doc_id,
                      CAST(len(regexp_extract_all(text, '[A-Za-z]+'))
                        AS BIGINT) AS n_words,
                      CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                        AS BIGINT) AS n_sentences,
                      CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                           + len(list_filter(
                               regexp_extract_all(lower(text), '[a-z]+'),
                               w -> NOT regexp_matches(w, '[aeiouy]')))
                        AS BIGINT) AS n_syllables
               FROM documents)""",
    "docs_mojibake" ->
      """SELECT doc_id, n_replacement, n_control, n_latin1_marks,
                (CAST(n_replacement + n_control + n_latin1_marks AS DOUBLE)
                 * 1000.0) / CAST(greatest(n_chars, 1) AS DOUBLE) > 1.0
                  AS damaged
         FROM (SELECT doc_id, n_chars,
                      CAST(len(regexp_extract_all(text, '\x{FFFD}'))
                        AS BIGINT) AS n_replacement,
                      CAST(len(regexp_extract_all(text,
                          '[\x00-\x08\x0B\x0C\x0E-\x1F]')) AS BIGINT)
                        AS n_control,
                      CAST(len(regexp_extract_all(text,
                          '\x{00C3}[\x{0080}-\x{00BF}]|\x{00E2}\x{20AC}|\x{00C2}[\x{00A0}-\x{00BF}]'))
                        AS BIGINT) AS n_latin1_marks
               FROM documents)""",
    // lag over (date, key) per customer; quantile_cont matches Spark
    // percentile's linear interpolation on the integer day gaps
    "orders_interpurchase" ->
      """WITH g AS (
           SELECT o_custkey AS c,
                  date_diff('day',
                    CAST(lag(o_orderdate) OVER win AS DATE),
                    CAST(o_orderdate AS DATE)) AS gap
           FROM orders
           WINDOW win AS (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey)),
         k AS (SELECT c, CAST(gap AS DOUBLE) AS g FROM g WHERE gap IS NOT NULL)
         SELECT CAST(count(DISTINCT c) AS BIGINT) AS repeat_customers,
                count(*) AS n_gaps,
                round(avg(g), 6) AS avg_gap_days,
                CAST(min(g) AS BIGINT) AS min_gap_days,
                CAST(max(g) AS BIGINT) AS max_gap_days,
                round(quantile_cont(g, 0.25), 6) AS p25,
                round(quantile_cont(g, 0.5), 6) AS p50,
                round(quantile_cont(g, 0.75), 6) AS p75,
                round(quantile_cont(g, 0.9), 6) AS p90
         FROM k""",
    // integer-only glyph levels: level = ceil(cnt·8/max) via
    // (cnt*8 + max - 1) // max — no float at the level boundaries
    "events_sparkbar" ->
      """WITH cnt AS (SELECT event_type AS g,
                             CAST(hour(ts) AS INT) AS slot,
                             count(*) AS cnt
                      FROM events GROUP BY 1, 2),
         grid AS (SELECT g, r.range AS slot
                  FROM (SELECT DISTINCT g FROM cnt) CROSS JOIN range(0, 24) r),
         dense AS (SELECT grid.g, CAST(grid.slot AS INT) AS slot,
                          COALESCE(cnt.cnt, 0) AS cnt
                   FROM grid LEFT JOIN cnt
                     ON cnt.g = grid.g AND cnt.slot = grid.slot),
         mx AS (SELECT g, max(cnt) AS mx FROM dense GROUP BY 1),
         ch AS (SELECT dense.g, slot, cnt, mx.mx,
                       CASE WHEN cnt = 0 THEN ' '
                            ELSE substr('▁▂▃▄▅▆▇█',
                              CAST((cnt * 8 + mx.mx - 1) // mx.mx AS INT), 1)
                       END AS ch
                FROM dense JOIN mx ON mx.g = dense.g)
         SELECT g AS event_type,
                string_agg(ch, '' ORDER BY slot) AS bar,
                CAST(sum(cnt) AS BIGINT) AS total,
                CAST(min(CASE WHEN cnt = mx THEN slot END) AS INT) AS peak_slot
         FROM ch GROUP BY 1""",
    // the recurrence runs row-by-row in a recursive CTE — the same
    // sequential order as the engine's aggregate() fold, so with dyadic
    // α=β every IEEE step matches bit-for-bit
    "events_holt" ->
      """WITH RECURSIVE obs AS (
           SELECT date_trunc('hour', ts) AS h, count(*) AS x
           FROM events GROUP BY 1),
         bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM obs),
         spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
                     AS h FROM bounds),
         ser AS (SELECT row_number() OVER (ORDER BY s.h) AS i,
                        COALESCE(o.x, 0) AS x
                 FROM spine s LEFT JOIN obs o ON o.h = s.h),
         rec AS (
           SELECT i, CAST(x AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b
           FROM ser WHERE i = 1
           UNION ALL
           SELECT s.i,
                  0.5 * CAST(s.x AS DOUBLE) + 0.5 * (r.l + r.b),
                  0.5 * ((0.5 * CAST(s.x AS DOUBLE) + 0.5 * (r.l + r.b)) - r.l)
                    + 0.5 * r.b
           FROM rec r JOIN ser s ON s.i = r.i + 1),
         fin AS (SELECT l, b FROM rec ORDER BY i DESC LIMIT 1)
         SELECT (SELECT count(*) FROM ser) AS n_hours,
                round(l, 6) AS level, round(b, 6) AS trend,
                round(l + b, 6) AS forecast_1h,
                round(l + 24.0 * b, 6) AS forecast_24h
         FROM fin""",
    // slopes are integer rationals in one double division each; median
    // via quantile_cont ≡ percentile
    "events_theil_sen" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d, count(*) AS x
                        FROM events GROUP BY 1),
         dmin AS (SELECT min(d) AS d0 FROM daily),
         idx AS (SELECT date_diff('day', dmin.d0, daily.d) AS t, daily.x
                 FROM daily CROSS JOIN dmin),
         p AS (SELECT CAST(b.x - a.x AS DOUBLE) / CAST(b.t - a.t AS DOUBLE)
                 AS slope
               FROM idx a JOIN idx b ON a.t < b.t),
         s AS (SELECT count(*) AS n_pairs, quantile_cont(slope, 0.5) AS m
               FROM p)
         SELECT (SELECT count(*) FROM idx) AS n_days, n_pairs,
                round(m, 6) AS slope,
                (SELECT round(quantile_cont(
                   CAST(x AS DOUBLE) - s.m * CAST(t AS DOUBLE), 0.5), 6)
                 FROM idx) AS intercept
         FROM s""",
    // mde² as a DOUBLE product and explicit double z literals: the whole
    // scalar tree is then literal-identical to the engine's
    "events_min_sample_size" ->
      """WITH cnt AS (SELECT event_type AS g, count(*) AS n
                      FROM events GROUP BY 1),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_all FROM cnt),
         f AS (SELECT g, n, CAST(n AS DOUBLE) / CAST(n_all AS DOUBLE) AS p
               FROM cnt CROSS JOIN tot),
         e AS (SELECT g, n, p,
                      p + CAST(0.01 AS DOUBLE) AS p2,
                      (p + (p + CAST(0.01 AS DOUBLE))) / 2.0 AS pbar
               FROM f
               WHERE p + CAST(0.01 AS DOUBLE) < 1.0),
         z AS (SELECT g, n, p,
                      CAST(1.9599639845400545 AS DOUBLE)
                        * sqrt(2.0 * pbar * (1.0 - pbar))
                      + CAST(0.8416212335729143 AS DOUBLE)
                        * sqrt(p * (1.0 - p) + p2 * (1.0 - p2)) AS se
               FROM e)
         SELECT g AS event_type, n, round(p, 6) AS share,
                CAST(ceil(se * se
                  / (CAST(0.01 AS DOUBLE) * CAST(0.01 AS DOUBLE))) AS BIGINT)
                  AS min_n_per_arm
         FROM z""",
    "events_minmax_map" ->
      """WITH s AS (
           SELECT user_id, event_type,
                  min(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS mn,
                  max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS mx
           FROM events GROUP BY user_id, event_type)
         SELECT user_id,
                string_agg(event_type || ':' || mn || ':' || mx, ','
                  ORDER BY event_type) AS minmax_map
         FROM s GROUP BY user_id""",
    // the 47-lag autocorrelation sweep by index join (same exact integer
    // moments as events_autocorr's window form), then the deterministic
    // (autocorr DESC, lag) argmax
    "events_period_detect" ->
      """WITH obs AS (SELECT date_trunc('hour', ts) AS h, count(*) AS x
                      FROM events GROUP BY 1),
         sp AS (SELECT unnest(generate_series(min(h), max(h),
                  INTERVAL 1 HOUR)) AS h FROM obs),
         ser AS (SELECT row_number() OVER (ORDER BY sp.h) AS i,
                        coalesce(obs.x, 0) AS x
                 FROM sp LEFT JOIN obs ON sp.h = obs.h),
         lags AS (SELECT CAST(range AS INT) AS k FROM range(2, 49)),
         p AS (SELECT l.k, b.x AS x, a.x AS y
               FROM lags l JOIN ser a ON TRUE JOIN ser b ON b.i = a.i + l.k),
         m AS (SELECT k, count(*) AS n,
                      CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                      CAST(sum(x * y) AS BIGINT) AS sxy,
                      CAST(sum(x * x) AS BIGINT) AS sxx,
                      CAST(sum(y * y) AS BIGINT) AS syy
               FROM p GROUP BY k),
         r AS (SELECT k, n,
                      round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                            / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                 * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
                        AS autocorr
               FROM m)
         SELECT k AS period_hours, n, autocorr
         FROM r ORDER BY autocorr DESC NULLS LAST, k LIMIT 1""",
    // regenerates the id-derived DC diffs and their DPCM prefix sums in
    // pure range() arithmetic — the decoder's Huffman/EXTEND/stuffing
    // path must reproduce them exactly from the entropy-coded bytes
    "mm_jpeg_dc" ->
      """WITH blk AS (
           SELECT doc_id, CAST(r.range AS BIGINT) AS b,
                  (doc_id * 31 + CAST(r.range AS BIGINT) * 17) % 65 - 32
                    AS diff
           FROM documents CROSS JOIN range(0, 8) r
           WHERE r.range < 1 + doc_id % 8),
         dc AS (
           SELECT doc_id, b,
                  CAST(sum(diff) OVER (PARTITION BY doc_id ORDER BY b
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS dc
           FROM blk)
         SELECT doc_id,
                CAST(8 * (1 + doc_id % 8) AS INT) AS width,
                count(*) AS n_blocks,
                CAST(sum(dc) AS BIGINT) AS dc_sum,
                CAST(min(dc) AS BIGINT) AS dc_min,
                CAST(max(dc) AS BIGINT) AS dc_max
         FROM dc GROUP BY doc_id""",
  )
}
