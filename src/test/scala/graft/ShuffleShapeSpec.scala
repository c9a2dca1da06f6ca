package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Behavior, CdcOps}

/** Enforced scale contracts: each headline operator's Scaladoc claims a
  * shuffle budget ("ONE shuffle of the event log, then k−1 linear
  * passes"); this spec pins those budgets on the REAL events table so a
  * formulation change that sneaks in an extra exchange fails the suite
  * instead of only showing up as a benchmark regression at scale. Counts
  * come from the final adaptive plan ([[SparkSpec.shuffles]]).
  */
class ShuffleShapeSpec extends SparkSpec {

  private lazy val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
  private val steps = Seq("signup", "click", "purchase")
  private val H = 3600L * 1000000

  test("CDC collapse is one shuffle") {
    assert(shuffles(CdcOps.latestSnapshot(ev, Seq("user_id"), "event_id")) == 1)
  }

  test("funnel family shares one (key, ts) shuffle across all passes") {
    assert(shuffles(Behavior.windowFunnel(ev, "user_id", "event_type", "ts",
      steps, 6 * H)) == 1)
    assert(shuffles(Behavior.windowFunnelStrictOrder(ev, "user_id",
      "event_type", "ts", steps, 24 * H)) == 1)
    assert(shuffles(Behavior.sequenceMatch(ev, "user_id", "event_type", "ts",
      steps, 2 * H)) == 1)
    assert(shuffles(Behavior.sequenceCount(ev, "user_id", "event_type", "ts",
      Seq("view", "click"), 2 * H)) == 1)
  }

  test("per-key ordered aggregations reuse the window partitioning") {
    assert(shuffles(Behavior.deltaSum(ev, "user_id", "ts", "value",
      "event_id")) == 1)
    assert(shuffles(CdcOps.sessionize(ev, Seq("user_id"), "ts", 1800L)) == 1)
    assert(shuffles(CdcOps.changeRates(ev, "user_id", "ts", "event_id")) == 1)
  }

  test("retention is a grouped pass plus one scalar fold") {
    assert(shuffles(Behavior.retention(ev, "user_id",
      Seq(col("event_type") === "signup", col("event_type") === "click",
        col("event_type") === "purchase"))) == 2)
  }

  test("sequential per-key operators ride one key shuffle") {
    assert(shuffles(Behavior.exponentialMovingAvg(ev, "user_id", "event_id",
      "value", "ts", 0.5)) == 1)
    assert(shuffles(Behavior.timeDecayedAvg(ev, "user_id", "event_id",
      "value", "ts", H)) == 1)
    assert(shuffles(Behavior.lttbDownsample(ev, "event_type", "event_id",
      "ts", floor(col("value") * 100 + 0.5), 12)) == 1)
  }

  test("t-test moments fold in one map-side-combined grouped pass") {
    assert(shuffles(graft.operators.StatTests.abTTest(ev,
      expr("(unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000) % 24"),
      col("event_type") === "view", col("event_type") === "click",
      floor(col("value") * 100 + 0.5))) == 1)
  }

  test("Mann-Whitney ranks distinct values, not rows: value-grain agg + one bucket window") {
    // (bucket, y) aggregation, then the bucket window + final bucket agg
    // share the bucket partitioning — budget 2, the raw log shuffles once
    assert(shuffles(graft.operators.StatTests.mannWhitneyU(ev,
      expr("(unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000) % 24"),
      col("event_type") === "view", col("event_type") === "click",
      floor(col("value") * 100 + 0.5))) <= 2)
  }

  test("round-13 stat family: moment passes stay lean, rank/CDF ops stay at distinct grain") {
    val b = expr("(unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000) % 24")
    val cents = floor(col("value") * 100 + 0.5)
    // five exact moments in ONE combinable pass
    assert(shuffles(graft.operators.StatTests.linReg(ev, col("event_type"),
      expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000"), cents)) == 1)
    // group moments + the ordered cross-group running sum share grain
    assert(shuffles(graft.operators.StatTests.anovaF(ev, b,
      col("event_type"), cents)) <= 2)
    // KS: raw log shuffles ONCE into the distinct-value grain; the
    // remaining exchanges move distinct-grain relations only
    assert(shuffles(graft.operators.StatTests.ksTest(ev, b,
      col("event_type") === "view", col("event_type") === "click",
      cents)) <= 3)
    // Spearman: two rank maps + their joins, all at distinct-value grain
    assert(shuffles(graft.operators.StatTests.spearmanCorr(ev,
      col("event_type"), cents,
      expr("unix_micros(CAST(ts AS TIMESTAMP))"))) <= 4)
  }

  test("max-intersections sweep is one (key, point) shuffle plus the rollup") {
    assert(shuffles(Behavior.maxIntersections(ev, "user_id", "ts",
      floor(col("value") * lit(1000000.0)).cast("long"))) <= 2)
  }

  test("interval union: both window passes and the island agg share shuffles") {
    // one (key, start) exchange feeds both windows; the island aggregation
    // re-keys on (k, island) and the final per-key rollup reuses that
    // partitioning's prefix — budget 3, never the event log twice
    assert(shuffles(Behavior.intervalUnionLength(ev, "user_id", "ts",
      lit(1000000L))) <= 3)
  }

  test("as-of join is one shuffle over the unioned sides") {
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    assert(shuffles(AsOfJoin.backward(purchases, clicks, Seq("user_id"),
      "pts", "ts")) == 1)
  }

  test("round-15 insight layer keeps its shuffle budgets") {
    // markov: lead window (1) + pair aggregate (1) + the normalization
    // window over the type×type matrix itself (answer-sized)
    assert(shuffles(Behavior.markovTransitions(ev, "user_id", "event_type",
      "ts", "event_id")) <= 3)
    // time-weighted mean / burstiness: window + grouped pass share the
    // key partitioning — the window's exchange is the only one
    assert(shuffles(Behavior.timeWeightedAvg(ev, "user_id", "ts",
      "event_id", "value")) == 1)
    assert(shuffles(Behavior.burstiness(ev, "user_id", "ts",
      "event_id")) == 1)
    // gini: per-key aggregate, rank window reusing its partitioning
    // prefix, group rollup
    val perKey = ev.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n_ev"))
    assert(shuffles(graft.operators.Insights.giniByGroup(perKey,
      "event_type", "user_id", "n_ev")) <= 3)
    // autocorr runs on the hour-grained aggregate: one grain shuffle, the
    // spine join + ordered window + final fold over ~thousands of rows
    assert(shuffles(Behavior.hourlyAutocorr(ev, "ts", Seq(1, 24))) <= 4)
  }

  test("round-15 additions: moment/map/cadence/series ops stay lean") {
    val cents = floor(col("value") * 100 + 0.5)
    // four power sums in ONE map-side-combined grouped pass
    assert(shuffles(graft.operators.StatTests.momentStats(ev,
      col("event_type"), cents)) == 1)
    // group counts + a 1-row broadcast total
    assert(shuffles(graft.operators.StatTests.minSampleSize(ev,
      col("event_type"), 0.01)) <= 2)
    // customer-key lag window + the one-row summary fold — the orders
    // table never globally sorts
    assert(shuffles(graft.operators.Insights.interpurchaseGaps(
      ev.select(col("user_id"), col("ts"), col("event_id")),
      "user_id", "ts", "event_id")) <= 3)
    // slot-grain aggregate, dense-grid join, group window, final rollup —
    // all at group×slot grain, the raw log shuffles once
    assert(shuffles(graft.operators.Insights.sparkbar(ev, col("event_type"),
      hour(col("ts")), 24)) <= 5)
    // Holt folds over the hour-grained array: the raw log shuffles once
    // into the hour grain; everything after is spine-sized
    assert(shuffles(Behavior.hourlyHolt(ev, "ts")) <= 4)
  }

  test("session-3 additions: experimentation/survival/graph ops stay lean") {
    import graft.operators.{Graph, StatTests, Survival}
    val cents = floor(col("value") * 100 + 0.5)
    // midpoint fold + unit grain + variant grain + pooled fold + ordered
    // output — everything past the unit grain exchanges ≤2-row frames;
    // the raw log itself shuffles ONCE (to the unit grain)
    assert(shuffles(StatTests.cuped(ev, col("user_id"), cents,
      expr("unix_micros(ts)"))) <= 6)
    // one grouped moment pass; every window after runs on the m-row frame
    assert(shuffles(StatTests.bhFdr(ev, col("event_type"),
      col("user_id") % 2 === 0, cents)) <= 5)
    // customer lag window + duration grain + tiny-frame windows: the
    // orders-shaped log shuffles once on the customer key
    assert(shuffles(Survival.kaplanMeier(
      ev.select(col("user_id"), col("ts")), "user_id", "ts")) <= 6)
    // per BFS round: one edge-vs-frontier join + one anti-join, nothing
    // re-shuffles the edge list wholesale beyond its one build
    val edges = ev.select(col("user_id").as("src"),
      (col("user_id") + 1).as("dst")).distinct()
    assert(shuffles(Graph.bfsHops(edges, "src", "dst", 2)) <= 4)
  }

  test("session-3 second batch: dedup/guardrail/planner ops stay lean") {
    import graft.operators.{Dedup, StatTests}
    val cents = floor(col("value") * 100 + 0.5)
    val docs = ev.select(col("event_id").as("doc_id"),
      col("props").as("text"))
    // explode is narrow; piece-grain count-distinct + the doc regroup are
    // the only wide steps (plus the piece-frequency hash join)
    assert(shuffles(Dedup.sentenceDedup(docs, "doc_id", "text")) <= 4)
    // unit-grain distinct + group counts
    assert(shuffles(StatTests.srmCheck(ev, col("event_type"),
      col("user_id"), col("user_id") % 2 === 0)) <= 2)
    // one grouped pass of four int64 cells
    assert(shuffles(StatTests.proportionsZTest(ev, col("event_type"),
      col("user_id") % 2 === 0, col("value") > 100)) <= 1)
    // midpoint fold + unit grain + the 1-row moment fold
    assert(shuffles(StatTests.pairedTTest(ev, col("user_id"), cents,
      expr("unix_micros(ts)"))) <= 4)
    // one moment pass
    assert(shuffles(StatTests.minSampleSizeMeans(ev, col("event_type"),
      cents, 0.05)) <= 1)
  }

  test("round-16 operators stay inside their documented budgets") {
    import graft.operators.{ClusterEval, Profiler, StatTests, Vocabulary}
    val cents = floor(col("value") * 100 + 0.5)
    // one grouped pass to the (type, hour) grain; rank/quartile windows
    // and the broadcast quartile join run on the calendar-bounded frame
    assert(shuffles(Profiler.tukeyOutliers(ev, "event_type",
      date_trunc("hour", col("ts")), cents.cast("long"))) <= 3)
    // exploded bigram pass + the two group grains, plus the r20 widen
    // round-robin that un-fuses the tokenize explode from a single-split
    // scan (a no-op exchange on at-scale inputs already ≥ the
    // parallelism floor — this test frame is below it)
    val docs = ev.select(col("event_id").as("doc_id"),
      col("props").as("text"), col("event_type").as("source"))
    assert(shuffles(Vocabulary.bigramEntropy(docs, "source", "text")) <= 3)
    // one (day, variant) moment pass; cumulative + running-min windows
    // sort the day grid only
    assert(shuffles(StatTests.msprt(ev, col("user_id"), cents,
      col("ts"))) <= 4)
    // codebook collect feeds a literal: the returned SCORING plan is one
    // scan + one label-grain aggregate — nothing else may exchange
    val emb = ev.limit(64).select(col("event_id").as("vec_id"),
      array(col("value").cast("float"),
        (col("value") * 2).cast("float")).as("embedding"),
      (col("user_id") % 3).cast("int").as("label"))
    assert(shuffles(ClusterEval.centroidSilhouette(emb, "vec_id",
      "embedding", "label")) <= 1)
  }

  test("round-16 session-4 additions stay inside their budgets") {
    val cents = floor(col("value") * 100 + 0.5)
    // unit-grain diff pass + distinct-|d| grain + its ordered window +
    // the 1-row fold; the raw log shuffles once
    assert(shuffles(graft.operators.StatTests.wilcoxonSignedRank(ev,
      col("user_id"), cents, expr("unix_micros(ts)"))) <= 4)
    // key-equi join (conv and touch sides share the key exchange), the
    // (key, conversion) rank window, the channel rollup, the guard agg
    assert(shuffles(Behavior.linearAttribution(ev, "user_id",
      "event_type", "ts", "event_id", "purchase", 86400000000L)) <= 5)
    // hour-grain aggregate + spine join + one hour-ordered window + the
    // single-row moment fold — event-sized data shuffles once
    assert(shuffles(Behavior.hourlyCrossCorr(ev, "ts", "event_type",
      "view", "purchase", Seq(0, 1, 2))) <= 4)
    // one (bucket, grp) moment pass; the grp-ordered cumulative windows
    // and the bucket rollup run on the tiny grouped frame
    assert(shuffles(graft.operators.StatTests.bartlett(ev,
      expr("(unix_micros(ts) DIV 86400000000) % 7"), col("event_type"),
      cents)) <= 3)
    // cell-grain aggregate; margins/folds ride windows over cells
    assert(shuffles(graft.operators.StatTests.theilsU(ev,
      col("event_type"), expr("(unix_micros(ts) DIV 3600000000) % 24"))) <= 8)
    assert(shuffles(graft.operators.StatTests.cramersV(ev,
      col("event_type"), expr("(unix_micros(ts) DIV 3600000000) % 24"))) <= 8)
    // hour-grain aggregate + spine join + grid windows + the hod rollup
    assert(shuffles(Behavior.seasonalDecompose(ev, "ts")) <= 4)
  }

  test("round-16 session-5 additions stay inside their budgets") {
    import graft.operators.{Graph, Insights, StatTests}
    val cents = floor(col("value") * 100 + 0.5)
    val hod = expr("(unix_micros(ts) DIV 3600000000) % 24")
    // (group, distinct value) grain + its ordered window; the broadcast
    // level join adds no exchange — the raw log shuffles once
    assert(shuffles(StatTests.weightedQuantiles(ev, col("event_type"),
      cents, pmod(col("user_id"), lit(7)) + 1, Seq(500, 900))) <= 2)
    // the cramersV/theilsU cell-fold shape with the G term
    assert(shuffles(StatTests.gTest(ev, col("event_type"), hod)) <= 8)
    // day-grain aggregate + spine join + day-ordered lag windows + the
    // 1-row moment fold + the lag-ordered Q fold
    assert(shuffles(StatTests.ljungBoxDaily(ev, "ts", 3)) <= 5)
    // ten exact moments in ONE map-side-combined grouped pass
    assert(shuffles(StatTests.multiLinReg(ev, col("event_type"), hod,
      expr("(unix_micros(ts) DIV 86400000000) % 7"), cents)) == 1)
    // unit-grain pass + the bounded xB fan-out's (group, rep) aggregate
    // + the B-row window + the broadcast obs/ci join
    assert(shuffles(StatTests.poissonBootstrapCi(ev, col("event_type"),
      col("user_id"), cents, b = 40)) <= 5)
    // bipartite wedge: distinct relation + degree join + the pair-grain
    // window/agg + the mirror union's pick — never an event self-join
    val rel = ev.select(col("user_id").as("c"),
      (col("event_id") % 20).as("s"))
    assert(shuffles(Graph.bipartiteBestPartner(rel, "c", "s")) <= 6)
    // ordered-rule twin of marketBasket: basket-grain dedup, the pair
    // join's two basket-key exchanges, the pair-grain agg, and the two
    // broadcast-side marginal/total grains — all dedup-frame-sized; the
    // raw log itself exchanges once (into the dedup)
    assert(shuffles(Insights.basketRules(ev.select(
      col("user_id").as("bk"), col("event_type").as("it")),
      "bk", "it")) <= 6)
    // two map-side-combined grouped passes, no windows or joins
    assert(shuffles(Insights.revenueHhi(ev, "event_type", "user_id",
      cents)) <= 2)
  }

  test("round-16 session-5 second batch stays inside its budgets") {
    import graft.operators.{Behavior, ClusterEval, Insights, Vocabulary}
    val cents = floor(col("value") * 100 + 0.5)
    // (month, item) grain, the base-month slice + matched item join,
    // the month rollup — the fact table shuffles once into the grain
    assert(shuffles(Insights.unitValueIndex(ev, col("ts"), col("user_id"),
      col("event_id") % 5 + 1, cents)) <= 5)
    // one key-partitioned lead window; everything after runs at the
    // type-by-type cell grain (theilsU's pinned folds)
    assert(shuffles(Behavior.entropyRate(ev, "user_id", "event_type",
      "ts", "event_id")) <= 9)
    // doc-position window + (doc,run) grain + vocabulary-grain stats
    // join + the phrase rollup — nothing pairwise
    val docs = ev.select(col("event_id").as("doc_id"),
      col("props").as("text"))
    assert(shuffles(Vocabulary.rakeKeywords(docs, "doc_id", "text",
      Seq("a"), minCount = 1L)) <= 7)
    // the exact-anchor pair join + neighbor-count agg + the core/border
    // joins — quantized frame localCheckpointed once, read by all
    val emb = ev.limit(48).select(col("event_id").as("vec_id"),
      array(col("value").cast("float"),
        (col("value") * 2).cast("float")).as("embedding"))
    assert(shuffles(ClusterEval.dbscanClassify(emb, "vec_id", "embedding",
      1000000L, 3)) <= 8)
    // (item, month) grain + spine cross + per-item collect fold — the
    // fact table shuffles once into the grain
    assert(shuffles(Insights.crostonForecast(ev, col("ts"),
      col("user_id"), col("event_id") % 3)) <= 5)
    // one order-key grain + the day-grain delta union + one day window
    val ords = ev.select(col("event_id").as("o_orderkey"),
      col("ts").as("o_orderdate"))
    val li = ev.select(col("event_id").as("l_orderkey"),
      col("ts").as("l_shipdate"))
    assert(shuffles(Insights.openBacklog(ords, li)) <= 5)
    // one map-side-combined grouped pass, fixed scalar tree after
    assert(shuffles(graft.operators.StatTests.meanZTest(ev,
      col("event_type"), col("user_id") % 2 === 0,
      col("user_id") % 2 === 1, cents, 1.0e6, 1.0e6)) == 1)
    // one grouped pass (the distinct-unit counts ride the same agg,
    // possibly expanded — budget 2 covers the expand variant)
    assert(shuffles(graft.operators.StatTests.poissonRateTest(ev,
      col("event_type"), col("user_id") % 2 === 0, col("user_id"),
      30.0)) <= 2)
    // tokenize + (doc, segment) grain + the source rollup
    val sdocs = ev.select(col("event_id").as("doc_id"),
      col("props").as("text"), col("event_type").as("source"))
    assert(shuffles(graft.operators.Vocabulary.msttr(sdocs, "doc_id",
      "text", "source")) <= 3)
  }

  test("round-17: heaps_law growth curve runs with NO single-partition " +
    "window (the r16 weak mark) and its running sums are exact") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val hl = graft.operators.Vocabulary.heapsLaw(docs, "doc_id", "text")
    assert(globalWindows(hl) === 0,
      "heaps_law must not move the doc-grain curve through one task")
    // the two-pass running sums equal a driver-side sequential cumsum
    import graft.operators.Ranking
    val df = spark.range(0, 1000).selectExpr("id AS d",
      "(id % 7) AS a", "CAST(id % 3 AS BIGINT) AS b").repartition(8)
    val got = Ranking.withRunningSums(df, Seq(col("d")), Seq("a", "b"),
      Seq("ca", "cb")).orderBy("d")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    var (sa, sb) = (0L, 0L)
    got.foreach { case (d, ca, cb) =>
      sa += d % 7; sb += d % 3
      assert(ca === sa && cb === sb, s"cumsum mismatch at d=$d")
    }
    assert(globalWindows(Ranking.withRunningSums(df, Seq(col("d")),
      Seq("a"), Seq("ca"))) === 0)
  }

  test("best_partner pre-distinct keyed shuffle (r19): the distinct's " +
    "partial+final aggregates BOTH run post-shuffle — exactly the one " +
    "explicit exchange, none added by the aggregate") {
    val raw = ev.select(col("user_id").cast("long").as("c"),
      col("event_id").cast("long").as("s"))
    // a producer-volume hint big enough to clear the parallelism floor
    val (d, sized) = graft.operators.Graph.sizedDistinctPairs(raw,
      relRows = 400L * 1000 * 1000, targetBytes = 16L << 20,
      floorParts = GraftSession.parallelismFloor(spark))
    assert(sized, "the hint must clear the floor in this test")
    assert(shuffles(d) == 1,
      "the fragment must carry ONLY the explicit hash(c, s) exchange — " +
        "a second exchange means the aggregate was not planned post-shuffle")
    // the identity path (no hint) computes the same distinct set
    val (d0, sized0) = graft.operators.Graph.sizedDistinctPairs(raw,
      relRows = -1L, targetBytes = 16L << 20,
      floorParts = GraftSession.parallelismFloor(spark))
    assert(!sized0)
    assert(d.collect().toSet === d0.collect().toSet)
  }
}
