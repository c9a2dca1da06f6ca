package graft

import graft.operators.{Behavior, Insights}
import org.apache.spark.sql.functions._

/** Hand-verified contracts for the insight layer — association rules,
  * skyline, ABC/RFM segmentation, Gini, Markov transitions,
  * autocorrelation, time-weighted means.
  */
class InsightsSpec extends SparkSpec {
  import spark.implicits._

  test("marketBasket: counts, support, confidence, lift on a hand case") {
    // baskets: {a,b}, {a,b}, {a,c}, {b} → pairs: (a,b)=2, (a,c)=1
    val df = Seq((1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c"),
      (4, "b"), (2, "a") /* dup in-basket: set semantics */)
      .toDF("bk", "it")
    val got = Insights.marketBasket(df, "bk", "it")
      .orderBy("item_a", "item_b").collect()
    assert(got.length === 2)
    val ab = got(0)
    assert((ab.getString(0), ab.getString(1), ab.getLong(2)) === ("a", "b", 2L))
    assert(ab.getDouble(3) === 0.5)      // support 2/4
    assert(ab.getDouble(4) === 0.666667) // confidence 2/n(a)=3, round 6
    assert(ab.getDouble(5) === 0.888889) // lift n_ab·N/(n_a·n_b) = 8/9
    val ac = got(1)
    assert((ac.getString(0), ac.getString(1), ac.getLong(2)) === ("a", "c", 1L))
  }

  test("skyline2d keeps exactly the non-dominated rows, duplicates survive") {
    // max x, min y. frontier: (5,1), (9,3); dominated: (4,2) by (5,1),
    // (5,4) by (5,1) [tie-x, worse y], (3,1) by (5,1) [worse x, tie-y].
    // (9,3) has the best x so only a lower-y tie-x could dominate it.
    val df = Seq((1, 5.0, 1.0), (2, 9.0, 3.0), (3, 4.0, 2.0), (4, 5.0, 4.0),
      (5, 3.0, 1.0), (6, 5.0, 1.0) /* duplicate of id 1 */)
      .toDF("id", "x", "y")
    val got = Insights.skyline2d(df, "x", "y")
      .select("id").as[Int].collect().toSet
    assert(got === Set(1, 2, 6))
  }

  test("abcClasses: exact-decimal 80/95 boundaries, ties id-broken") {
    // measures 50, 30, 15, 5 (total 100): cum 50(A), 80(A: 80% EXACTLY),
    // 95(B: 95% exactly), 100(C)
    val df = Seq((1, 50), (2, 30), (3, 15), (4, 5))
      .toDF("id", "m").select(col("id"), col("m").cast("decimal(18,2)").as("m"))
    val got = Insights.abcClasses(df, "id", "m")
      .orderBy("abc_class")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq(("A", 2L, 80.0), ("B", 1L, 15.0), ("C", 1L, 5.0)))
  }

  test("giniByGroup: 0 when uniform, (n-1)/n when one key holds all") {
    val uniform = Seq(("g", "a", 5L), ("g", "b", 5L), ("g", "c", 5L),
      ("h", "a", 9L), ("h", "b", 1L), ("h", "c", 1L), ("h", "d", 1L))
      .toDF("grp", "k", "w")
    val got = Insights.giniByGroup(uniform, "grp", "k", "w")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("g") === 0.0)
    // h: sorted w = 1,1,1,9 → Σi·x = 1+2+3+36 = 42, n=4, Σx=12
    // G = (2·42 − 5·12)/(4·12) = 24/48 = 0.5
    assert(got("h") === 0.5)
    // degenerate concentration: all weight on one of n keys → (n−1)/n
    val all = Seq(("z", "a", 0L), ("z", "b", 0L), ("z", "c", 12L))
      .toDF("grp", "k", "w")
    // Σx=12, Σi·x=36, n=3 → (72 − 48)/36 = 2/3
    val g = Insights.giniByGroup(all, "grp", "k", "w").collect()(0).getDouble(2)
    assert(math.abs(g - 2.0 / 3) < 1e-12)
  }

  test("rfmCells equals the single-window ntile formulation") {
    val orders = (1 to 40).flatMap { c =>
      (1 to (c % 4 + 1)).map(i =>
        (c, java.sql.Date.valueOf(f"1997-${c % 12 + 1}%02d-15"), c * 10.0 + i))
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = Insights.rfmCells(orders, "o_custkey", "o_orderdate", "o_totalprice")
    val W = org.apache.spark.sql.expressions.Window
    val per = orders.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("r"), count(lit(1)).as("f"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("m"))
    val ref = per
      .withColumn("r_score", ntile(5).over(W.orderBy(col("r"), col("o_custkey"))).cast("long"))
      .withColumn("f_score", ntile(5).over(W.orderBy(col("f"), col("o_custkey"))).cast("long"))
      .withColumn("m_score", ntile(5).over(W.orderBy(col("m"), col("o_custkey"))).cast("long"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"), sum(col("m")).cast("double").as("total_spend"))
    assert(got.unionAll(ref).distinct().count() === ref.count())
    // every customer lands in exactly one cell
    assert(got.agg(sum(col("n_customers"))).collect()(0).getLong(0) === 40L)
  }

  test("markovTransitions: row-normalized counts of consecutive pairs") {
    val ev = Seq(
      ("u1", "a", 1L, 1L), ("u1", "b", 2L, 2L), ("u1", "a", 3L, 3L),
      ("u1", "b", 4L, 4L),
      ("u2", "a", 1L, 5L), ("u2", "a", 2L, 6L), ("u2", "c", 3L, 7L))
      .toDF("u", "op", "tsl", "id")
      .select(col("u"), col("op"), timestamp_seconds(col("tsl")).as("ts"), col("id"))
    val got = Behavior.markovTransitions(ev, "u", "op", "ts", "id")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // from a: a→b ×2, a→a ×1, a→c ×1 (4 total)
    assert(got(("a", "b")) === (2L, 0.5))
    assert(got(("a", "a")) === (1L, 0.25))
    assert(got(("a", "c")) === (1L, 0.25))
    // from b: b→a ×1 (the trailing b has no successor)
    assert(got(("b", "a")) === (1L, 1.0))
    assert(!got.contains(("c", "a")))
  }

  test("hourlyAutocorr: period-2 series has lag-2 r = 1, lag-1 r = −1") {
    // hours 0..9 alternating 10,2,10,2,… — all hours observed
    val ev = (0 until 10).flatMap { h =>
      val n = if (h % 2 == 0) 10 else 2
      (1 to n).map(i => (h * 3600L + i, i))
    }.toDF("tsl", "i").select(timestamp_seconds(col("tsl")).as("ts"))
    val got = Behavior.hourlyAutocorr(ev, "ts", Seq(1, 2))
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(got(1) === -1.0)
    assert(got(2) === 1.0)
  }

  test("periodDetect: period-2 series wins at lag 2, lag tie-break low") {
    val ev = (0 until 10).flatMap { h =>
      val n = if (h % 2 == 0) 10 else 2
      (1 to n).map(i => (h * 3600L + i, i))
    }.toDF("tsl", "i").select(timestamp_seconds(col("tsl")).as("ts"))
    val r = Behavior.periodDetect(ev, "ts", 2, 5).collect()(0)
    // lags 2 and 4 both hit r = 1.0 on a period-2 series → lowest wins
    assert(r.getInt(0) === 2 && r.getDouble(2) === 1.0)
  }

  test("hourlyAutocorr densifies gaps: absent hours count zero") {
    // events only at hours 0 and 2 — the spine inserts hour 1 with x=0,
    // so lag-1 sees pairs (x0,·),(0,x0),(x2,0) instead of pairing the two
    // observed hours as adjacent
    val ev = Seq(10L, 2 * 3600L + 10L).toDF("tsl")
      .select(timestamp_seconds(col("tsl")).as("ts"))
    val got = Behavior.hourlyAutocorr(ev, "ts", Seq(1)).collect()(0)
    assert(got.getLong(1) === 2L) // two lag-1 pairs over the 3-hour spine
  }

  test("hourlyHolt: hand-folded dyadic recurrence over a gapped series") {
    // hours 0..3 with counts 4, (gap→0), 2, 6. α=β=1/2 hand fold:
    // l₁=4 b₁=0 → (2,−1) → (1.5,−0.75) → (3.375, 0.5625). All dyadic —
    // every assertion is exact, no tolerance.
    val ev = ((1 to 4).map(i => 0L * 3600 + i) ++
      (1 to 2).map(i => 2L * 3600 + i) ++ (1 to 6).map(i => 3L * 3600 + i))
      .toDF("tsl").select(timestamp_seconds(col("tsl")).as("ts"))
    val r = Behavior.hourlyHolt(ev, "ts").collect()(0)
    assert(r.getLong(0) === 4L)
    assert(r.getDouble(1) === 3.375 && r.getDouble(2) === 0.5625)
    assert(r.getDouble(3) === 3.9375)  // level + trend
    assert(r.getDouble(4) === 16.875)  // level + 24·trend
    // single observed hour: fold is just the init state
    val one = Seq(5L).toDF("tsl")
      .select(timestamp_seconds(col("tsl")).as("ts"))
    val r1 = Behavior.hourlyHolt(one, "ts").collect()(0)
    assert(r1.getLong(0) === 1L && r1.getDouble(1) === 1.0
      && r1.getDouble(2) === 0.0)
  }

  test("hourlyHoltWinters: hand-folded seasonal recurrence, period 2") {
    // hourly counts [1, 3, 2, 6], p=2: m1=2 m2=4 → l=2 b=1 s=[−1,1].
    // x=2 slot0: l=3 b=1 s=[−1,1]; x=6 slot1: l=4.5 b=1.25 s=[−1,1.25].
    // forecasts: h=1 slot0 → 4.5+1.25−1 = 4.75; h=2 slot1 → 4.5+2.5+1.25
    // = 8.25. All dyadic — exact assertions.
    val ev = ((1 to 1).map(i => 0L * 3600 + i) ++
      (1 to 3).map(i => 1L * 3600 + i) ++
      (1 to 2).map(i => 2L * 3600 + i) ++
      (1 to 6).map(i => 3L * 3600 + i))
      .toDF("tsl").select(timestamp_seconds(col("tsl")).as("ts"))
    val r = Behavior.hourlyHoltWinters(ev, "ts", period = 2, horizon = 2)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(r === Seq((1L, 4.75), (2L, 8.25)))
    // shorter than one period → empty frame, loudly nothing to init from
    val one = Seq(5L).toDF("tsl")
      .select(timestamp_seconds(col("tsl")).as("ts"))
    assert(Behavior.hourlyHoltWinters(one, "ts", period = 2).count() == 0)
  }

  test("dailyTheilSen: median pairwise slope over observed (gapped) days") {
    // days 0, 1, 3 with counts 1, 5, 3: slopes 4, 2/3, −1 → median 2/3;
    // residuals vs the 2/3 line: 1, 13/3, 1 → median 1
    val ev = (Seq.fill(1)(0) ++ Seq.fill(5)(1) ++ Seq.fill(3)(3))
      .zipWithIndex.map { case (d, i) => (d * 86400L + i, i) }
      .toDF("tsl", "i").select(timestamp_seconds(col("tsl")).as("ts"))
    val r = Behavior.dailyTheilSen(ev, "ts").collect()(0)
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L)
    assert(r.getDouble(2) === 0.666667 && r.getDouble(3) === 1.0)
  }

  test("minSampleSize: textbook 50% baseline, 10pp MDE → 388 per arm") {
    import graft.operators.StatTests
    val df = (Seq.fill(50)("a") ++ Seq.fill(50)("b")).toDF("g")
    val got = StatTests.minSampleSize(df, col("g"), 0.1).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    // classic two-proportion result for p₁=0.5, p₂=0.6, α=.05, power=.8
    assert(got("a") === ((50L, 0.5, 388L)))
    assert(got("b") === ((50L, 0.5, 388L)))
    intercept[IllegalArgumentException] {
      StatTests.minSampleSize(df, col("g"), 0.0)
    }
  }

  test("minSampleSize: saturated groups (p + mde >= 1) drop, not NaN") {
    import graft.operators.StatTests
    // "big" holds 99 of 100 rows → p = 0.99; with mde = 0.02 the target
    // p2 = 1.01 is not a proportion — the group must DROP (the planning
    // question is unanswerable), never emit a NaN/null min_n_per_arm
    val df = (Seq.fill(99)("big") ++ Seq.fill(1)("small")).toDF("g")
    val got = StatTests.minSampleSize(df, col("g"), 0.02).collect()
    assert(got.map(_.getString(0)).toSeq === Seq("small"))
    assert(!got(0).isNullAt(3) && got(0).getLong(3) > 0L)
  }

  test("binaryAuc: binScale quantizes identically to a pre-floored score") {
    import graft.operators.StatTests
    // continuous scores; binScale=4 must equal running the exact AUC over
    // floor(s*4) — the documented contract that lets the oracle bin too
    val rows = Seq((0.11, true), (0.13, false), (0.37, true), (0.62, false),
      (0.88, true), (0.91, true), (0.40, false), (0.05, false))
    val binned = StatTests.binaryAuc(rows.toDF("s", "y"), col("s"), col("y"),
      binScale = 4.0).collect()(0)
    val manual = StatTests.binaryAuc(
      rows.map { case (s, y) => (math.floor(s * 4.0), y) }.toDF("s", "y"),
      col("s"), col("y")).collect()(0)
    assert(binned.getDouble(2) === manual.getDouble(2))
    assert(binned.getLong(0) === 4L && binned.getLong(1) === 4L)
    // and binning coarsens ties: 0.11 vs 0.13 land in the same bin, so
    // the binned AUC differs from the exact one (sanity that the knob acts)
    val exact = StatTests.binaryAuc(rows.toDF("s", "y"), col("s"), col("y"))
      .collect()(0).getDouble(2)
    assert(binned.getDouble(2) !== exact)
  }

  test("cohortLtv: cumulative per-customer spend by cohort age") {
    // cohort 1997-01 (custs 1,2), cohort 1997-02 (cust 3)
    val orders = Seq(
      (1, "1997-01-10", 10.0), (1, "1997-02-11", 30.0),
      (2, "1997-01-20", 20.0),
      (3, "1997-02-05", 50.0), (3, "1997-04-01", 70.0))
      .toDF("o_custkey", "d", "o_totalprice")
      .select(col("o_custkey"), to_date(col("d")).as("o_orderdate"),
        col("o_totalprice"))
    val got = Insights.cohortLtv(orders, "o_custkey", "o_orderdate",
        "o_totalprice")
      .orderBy("cohort_month", "age_months").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    val c1 = 1997L * 12 + 1
    // cohort1 age0: rev 30, ltv 15; age1: rev 30, cum 60, ltv 30
    // cohort2 age0: rev 50, ltv 50; age2: rev 70, cum 120, ltv 120
    assert(got.toSeq === Seq(
      (c1, 0L, 2L, 30.0, 15.0), (c1, 1L, 1L, 30.0, 30.0),
      (c1 + 1, 0L, 1L, 50.0, 50.0), (c1 + 1, 2L, 1L, 70.0, 120.0)))
  }

  test("burstiness: metronome → −1, and the two-gap hand case") {
    val ev = Seq(
      // u1: gaps 10s, 10s, 10s → σ=0 → B = −1
      ("u1", 0L, 1L), ("u1", 10L, 2L), ("u1", 20L, 3L), ("u1", 30L, 4L),
      // u2: gaps 10s, 30s → μ=20, σ=10 → B = (10−20)/(10+20) = −1/3
      ("u2", 0L, 5L), ("u2", 10L, 6L), ("u2", 40L, 7L))
      .toDF("u", "tsl", "id")
      .select(col("u"), timestamp_seconds(col("tsl")).as("ts"), col("id"))
    val got = graft.operators.Behavior.burstiness(ev, "u", "ts", "id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got("u1") === ((3L, -1.0)))
    assert(got("u2") === ((2L, -0.333333)))
  }

  test("groupHhi: single value → 1, even split → 1/n") {
    val df = Seq(("s1", "en"), ("s1", "en"), ("s1", "en"),
      ("s2", "en"), ("s2", "de"), ("s2", "fr"), ("s2", "it"))
      .toDF("source", "lang")
    val got = graft.operators.Profiler.groupHhi(df, "source", "lang")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("s1") === ((3L, 1L, 1.0)))
    assert(got("s2") === ((4L, 4L, 0.25)))
  }

  test("knnClassify: majority vote with smallest-label tie-break") {
    // query 100 at origin-ish; corpus: two label-0 and two label-1
    // vectors near it, one far label-2. k=4 → 2 vs 2 tie → label 0.
    val rows = Seq(
      (100L, Array(1.0f, 0.0f), 9L),      // query (label col present, unused)
      (0L, Array(0.9f, 0.1f), 0L), (4L, Array(0.8f, 0.2f), 0L),
      (1L, Array(0.7f, 0.3f), 1L), (5L, Array(0.6f, 0.4f), 1L),
      (2L, Array(-1.0f, 0.0f), 2L))
      .toDF("vec_id", "embedding", "label")
    val got = graft.operators.Similarity.knnClassify(rows,
      rows.where(col("vec_id") === 100), "vec_id", "embedding", "label", 4)
      .collect()
    assert(got.length === 1)
    assert((got(0).getLong(0), got(0).getLong(1), got(0).getLong(2))
      === ((100L, 0L, 2L)))
  }

  test("bigramKnLogprob: hand-computed Kneser-Ney probabilities") {
    // corpus: d1 = "a b a b" (bigrams ab, ba, ab), d2 = "a c"
    // c2: ab=2 ba=1 ac=1; left a: c1=3 n1l=2; left b: c1=1 n1l=1
    // cont: a=1 b=1 c=1 of 3 types
    // P(b|a) = (2−.75 + .75·2/3)/3 = 1.75/3; P(a|b) = .25+.25 = .5
    // P(c|a) = (.25 + .5)/3 = .25
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = graft.operators.Vocabulary
      .bigramKnLogprob(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val d1 = (2 * math.log(1.75 / 3) + math.log(0.5)) / 3
    assert(got(1L) === ((3L, math.rint(d1 * 1e4) / 1e4)))
    assert(got(2L) === ((1L, math.rint(math.log(0.25) * 1e4) / 1e4)))
  }

  test("sessionPaths: gap splitting, step cap, tie-deterministic order") {
    val ev = Seq(
      // u1 session 1: view>click; session 2 (gap > 30 min): purchase
      ("u1", 0L, 1L, "view"), ("u1", 10L, 2L, "click"),
      ("u1", 4000L, 3L, "purchase"),
      // u2: six events in one session → path truncates to 5 steps;
      // two share ts=1 → event_id breaks the tie (ids 5 then 6)
      ("u2", 1L, 5L, "a"), ("u2", 1L, 6L, "b"), ("u2", 2L, 7L, "c"),
      ("u2", 3L, 8L, "d"), ("u2", 4L, 9L, "e"), ("u2", 5L, 10L, "f"))
      .toDF("u", "tsl", "id", "op")
      .select(col("u"), timestamp_seconds(col("tsl")).as("ts"), col("id"),
        col("op"))
    val got = graft.operators.Behavior
      .sessionPaths(ev, "u", "op", "ts", "id", 1800L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === Map(
      "view>click" -> ((1L, 1L)), "purchase" -> ((1L, 1L)),
      "a>b>c>d>e" -> ((1L, 1L))))
  }

  test("binaryAuc: perfect ranking 1.0, constant score 0.5, ties half") {
    import graft.operators.StatTests
    def auc(rows: Seq[(Double, Boolean)]): Double =
      StatTests.binaryAuc(rows.toDF("s", "y"), col("s"), col("y"))
        .collect()(0).getDouble(2)
    // positives strictly above negatives
    assert(auc(Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))) === 1.0)
    // constant score: every pair is a tie → 0.5
    assert(auc(Seq((7.0, true), (7.0, false), (7.0, true), (7.0, false))) === 0.5)
    // hand case with a tie: pos at 3, 2; neg at 2, 1 →
    // pairs (3>2)=1, (3>1)=1, (2=2)=.5, (2>1)=1 → 3.5/4
    assert(auc(Seq((3.0, true), (2.0, true), (2.0, false), (1.0, false))) === 0.875)
  }

  test("liftTable: deciles partition rows, lifts average to 1") {
    import graft.operators.StatTests
    // 100 rows, score = id desc ⇒ decile = ceil(id/10) reversed; positives
    // concentrated at high scores (id > 80 → label true)
    val rows = (1 to 100).map(i => (i.toDouble, i.toLong, i > 80))
      .toDF("s", "i", "y")
    val got = StatTests.liftTable(rows, col("s"), col("y"), col("i"))
      .orderBy("decile").collect()
    assert(got.length === 10)
    assert(got.map(_.getLong(1)).sum === 100L) // all rows land in a decile
    // decile 1 = scores 91..100 → all positive → pos_rate 1.0, lift 5.0
    assert(got(0).getDouble(3) === 1.0 && got(0).getDouble(4) === 5.0)
    // decile 2 = scores 81..90 → pos_rate 1.0; deciles 3+ all zero
    assert(got(1).getDouble(3) === 1.0)
    assert(got.drop(2).forall(_.getLong(2) === 0L))
  }

  test("coOccurrenceEdges: pairs per group; planted hub group is guarded") {
    import graft.operators.Graph
    // groups: g1 = {a,b} → 2 directed edges; g2 = {c} → none;
    // hub = {h1..h5} exceeds maxGroupSize=4 → excluded with a loud WARN
    // (failOnOversized=true upgrades it to a throw)
    val rows = Seq(("g1", "a"), ("g1", "b"), ("g1", "b") /* dup */,
      ("g2", "c")) ++ (1 to 5).map(i => ("hub", s"h$i"))
    val df = rows.toDF("grp", "item")
    val got = Graph.coOccurrenceEdges(df, "grp", "item", maxGroupSize = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("a", "b"), ("b", "a")))
    intercept[IllegalStateException] {
      Graph.coOccurrenceEdges(df, "grp", "item", maxGroupSize = 4,
        failOnOversized = true).collect()
    }
    // under the cap everything pairs: 5·4 hub edges + 2
    assert(Graph.coOccurrenceEdges(df, "grp", "item", maxGroupSize = 5)
      .count() === 22L)
  }

  test("pageRankFixedPoint: hand-computed path graph and floor case") {
    import graft.operators.Graph
    // undirected path a—b—c (both directions): after two iterations
    // p_a = p_c = 936250000, p_b = 1127500000 (hand-derived nano-units)
    val path = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
      .toDF("src", "dst")
    val got = Graph.pageRankFixedPoint(path, "src", "dst", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 936250000L, "b" -> 1127500000L,
      "c" -> 936250000L))
    // a node with no in-edges drops to the bare damping floor
    val oneWay = Seq(("x", "y")).toDF("src", "dst")
    val g2 = Graph.pageRankFixedPoint(oneWay, "src", "dst", 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g2("x") === 150000000L)
    assert(g2("y") === 150000000L + 850000000L) // full rank of x flows in
    // the long and decimal damping lanes are bit-equal: force the decimal
    // lane (longLaneMaxNodes = 0) and demand identical ranks
    val viaDecimal = Graph
      .pageRankFixedPoint(path, "src", "dst", 2, longLaneMaxNodes = 0L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaDecimal === got)
  }

  test("triangleStats: K4-minus-an-edge hand census, dedup, deg-1 node") {
    import graft.operators.Graph
    // K4 on {a,b,c,d} minus edge a–d, plus pendant d–e. Triangles: abc,
    // bcd. Per node: a:1 b:2 c:2 d:1 e:0. Degrees: a2 b3 c3 d3 e1.
    // Input deliberately messy: duplicates, both directions, a self-loop.
    val e = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("b", "c"), ("b", "d"),
      ("c", "d"), ("d", "c") /* dup reversed */, ("d", "e"), ("a", "a"))
      .toDF("src", "dst")
    val got = Graph.triangleStats(e, "src", "dst").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_ => r.getDouble(3)))))
      .toMap
    assert(got("a") === ((2L, 1L, Some(1.0))))
    assert(got("b") === ((3L, 2L, Some(0.666667))))
    assert(got("c") === ((3L, 2L, Some(0.666667))))
    assert(got("d") === ((3L, 1L, Some(0.333333))))
    // degree-1 node: clustering undefined → NULL, loudly not 0
    assert(got("e") === ((1L, 0L, None)))
    // triangle-free graph: all zeros, nobody dropped
    val star = Seq(("h", "x"), ("h", "y"), ("h", "z")).toDF("src", "dst")
    val s = Graph.triangleStats(star, "src", "dst").collect()
    assert(s.length === 4 && s.forall(_.getLong(2) === 0L))
  }

  test("interpurchaseGaps: hand gaps incl. same-day ties and lone buyers") {
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-${1 + d}%02d 00:00:00")
    // cust 1: gaps 2, 8; cust 2: single order (no gap); cust 3: same-day
    // repeat (gap 0, key-ordered) then +5
    val orders = Seq((1L, 10L, ts(0)), (1L, 11L, ts(2)), (1L, 12L, ts(10)),
      (2L, 20L, ts(4)), (3L, 30L, ts(1)), (3L, 31L, ts(1)), (3L, 32L, ts(6)))
      .toDF("c", "k", "dt")
    val r = Insights.interpurchaseGaps(orders, "c", "dt", "k").collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === 4L)   // repeat custs, gaps
    assert(r.getDouble(2) === 3.75)                       // mean of 0,2,5,8
    assert(r.getLong(3) === 0L && r.getLong(4) === 8L)
    // linear interpolation over sorted {0,2,5,8}
    assert(r.getDouble(5) === 1.5 && r.getDouble(6) === 3.5)
    assert(r.getDouble(7) === 5.75 && r.getDouble(8) === 7.1)
  }

  test("sparkbar: integer glyph levels, dense grid, deterministic peak") {
    val df = Seq.fill(4)(("g", 0)) ++ Seq(("g", 1)) ++ Seq.fill(2)(("g", 3)) ++
      Seq(("h", 2)) // flat single-slot group
    val got = Insights.sparkbar(df.toDF("grp", "slot"), col("grp"),
      col("slot"), 4).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getInt(3))))
      .toMap
    // levels: 4/4→8 '█', 1/4→⌈2⌉ '▂', missing slot ' ', 2/4→4 '▄'
    assert(got("g") === (("█▂ ▄", 7L, 0)))
    assert(got("h") === (("  █ ", 1L, 2)))
  }

  test("kCore: clique survives, pendant chain peels, degrees are in-core") {
    import graft.operators.Graph
    // K4 on {a,b,c,d} plus a pendant chain d—e—f—g, both directions.
    // k=3: round 1 peels e, f, g (degrees 2, 2, 1); the K4 is the 3-core
    // with in-core degree 3 each — d's degree drops from 4 to 3 once the
    // chain is gone, which is exactly the in-core (not original) contract.
    val und = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"), ("d", "e"), ("e", "f"), ("f", "g"))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.kCore(e, "src", "dst", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
  }

  test("kCore: cascading peel to an empty core, loud non-convergence") {
    import graft.operators.Graph
    // path v1—…—v5 at k=2 peels endpoints inward: rounds shrink
    // 5→3→1→0, fixed point at round 4 with an EMPTY 2-core
    val und = Seq(("v1", "v2"), ("v2", "v3"), ("v3", "v4"), ("v4", "v5"))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    assert(Graph.kCore(e, "src", "dst", 2, maxRounds = 4).count() === 0)
    // the same peel truncated at 3 rounds has not converged: must THROW
    // (the oracle unrolls a fixed depth — silence would diverge from it)
    val ex = intercept[IllegalStateException](
      Graph.kCore(e, "src", "dst", 2, maxRounds = 3))
    assert(ex.getMessage.contains("maxRounds"))
    // empty edge list → empty core, no throw
    val none = Seq.empty[(String, String)].toDF("src", "dst")
    assert(Graph.kCore(none, "src", "dst", 2).count() === 0)
  }

  test("degreeStats: hand graph assortativity and counts") {
    import graft.operators.Graph
    // directed: a→b, a→c, b→a, c→a (a is the hub, out-deg 2; b, c out-deg 1)
    // pairs (x=deg(src), y=deg(dst)): (2,1), (2,1), (1,2), (1,2) →
    // perfect anti-correlation r = −1 (hubs link to leaves)
    val e = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"))
      .toDF("src", "dst")
    val got = Graph.degreeStats(e, "src", "dst").collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2))
      === ((3L, 4L, 2L)))
    assert(got.getDouble(3) === -1.0)
  }

  test("insight operators accept empty and degenerate inputs") {
    import graft.operators.{Graph, Insights}
    val noEdges = Seq.empty[(String, String)].toDF("src", "dst")
    assert(Graph.pageRankFixedPoint(noEdges, "src", "dst", 2).count() === 0)
    val noBaskets = Seq.empty[(Long, String)].toDF("bk", "it")
    assert(Insights.marketBasket(noBaskets, "bk", "it").count() === 0)
    val noPoints = Seq.empty[(Double, Double)].toDF("x", "y")
    assert(Insights.skyline2d(noPoints, "x", "y").count() === 0)
    // single-key group: gini = (2·1·x − 2x)/(1·x) = 0 (a lone member
    // holds everything evenly by definition)
    val lone = Seq(("g", "k", 5L)).toDF("grp", "k", "w")
    assert(Insights.giniByGroup(lone, "grp", "k", "w")
      .collect()(0).getDouble(2) === 0.0)
    // single-event users produce no gaps/holds: empty, not an error
    val oneEvent = Seq(("u", 0L, 1L, 1.0)).toDF("u", "tsl", "id", "v")
      .select(col("u"), timestamp_seconds(col("tsl")).as("ts"), col("id"),
        col("v"))
    assert(graft.operators.Behavior.burstiness(oneEvent, "u", "ts", "id")
      .count() === 0)
    assert(graft.operators.Behavior
      .timeWeightedAvg(oneEvent, "u", "ts", "id", "v").count() === 0)
  }

  test("heapsLaw: exact growth curve, hand-checked OLS slope") {
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val got = graft.operators.Vocabulary.heapsLaw(docs, "doc_id", "text")
      .collect()(0)
    // curve: (t,v) = (2,2), (4,3), (8,4) — doubling tokens adds one type
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) === ((3L, 8L, 4L)))
    val xs = Seq(2.0, 4.0, 8.0).map(math.log)
    val ys = Seq(2.0, 3.0, 4.0).map(math.log)
    val n = 3.0
    val beta = (n * xs.zip(ys).map { case (a, b) => a * b }.sum
      - xs.sum * ys.sum) / (n * xs.map(a => a * a).sum - xs.sum * xs.sum)
    assert(got.getDouble(3) === math.rint(beta * 1e4) / 1e4)
  }

  test("mmrDiversify matches a direct greedy reference on a hand pool") {
    import graft.operators.Similarity
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum)
        * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val vecs = Map(
      100L -> Array(1f, 0f, 0f),          // the query
      1L -> Array(0.95f, 0.31f, 0f),      // closest
      2L -> Array(0.95f, 0.31f, 0f),      // exact duplicate of 1
      3L -> Array(0.9f, -0.43f, 0f),      // close but opposite flank
      4L -> Array(0.5f, 0f, 0.86f),       // off-plane
      5L -> Array(-1f, 0f, 0f))           // anti-query
    val df = vecs.toSeq.map { case (id, v) => (id, v) }
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrDiversify(df, df.where(col("vec_id") === 100),
        "vec_id", "embedding", poolK = 5, select = 3, lambda = 0.75)
      .orderBy("step").collect().map(r => (r.getLong(1), r.getLong(2)))
    // direct greedy reference over the same pool
    val q = vecs(100L)
    val pool = vecs.keys.filter(_ != 100L).toSeq.sorted
    var sel = Seq(pool.maxBy(id => (cos(q, vecs(id)), -id)))
    for (_ <- 2 to 3) {
      val rem = pool.filterNot(sel.contains)
      val next = rem.maxBy { id =>
        val pen = sel.map(s => cos(vecs(id), vecs(s))).max
        (0.75 * cos(q, vecs(id)) - 0.25 * pen, -id)
      }
      sel = sel :+ next
    }
    assert(got.map(_._2).toSeq === sel)
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L))
    // the duplicate of the first pick must NOT be chosen while a
    // non-redundant candidate remains
    assert(!sel.take(3).contains(2L) || sel.indexOf(2L) > sel.indexOf(3L))
  }

  test("lastTouchAttribution: latest touch wins, window expires") {
    val ev = Seq(
      // u1: view@0, click@100 → purchase@200 (40.0): click gets credit
      ("u1", 0L, "view", 0.0), ("u1", 100L, "click", 0.0),
      ("u1", 200L, "purchase", 40.0),
      // u2: view@0 → purchase@999999 (60.0): outside the 1000s window
      ("u2", 0L, "view", 0.0), ("u2", 999999L, "purchase", 60.0),
      // u3: purchase with no touches at all → unattributed (dropped)
      ("u3", 5L, "purchase", 10.0))
      .toDF("u", "tsl", "op", "v")
      .select(col("u"), timestamp_seconds(col("tsl")).as("ts"), col("op"),
        col("v"))
    val got = graft.operators.Behavior.lastTouchAttribution(
        ev, "u", "op", "ts", "v", "purchase", 1000L * 1000000L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got === Map("click" -> ((1L, 40.0))))
  }

  test("linearAttribution: equal split, remainder to the last touch, " +
    "window expiry, unattributed drop") {
    val ev = Seq(
      // u1: a@1, b@2, c@3 → purchase@4 (id 104): n=3, 3333 each,
      //     remainder 1 to c (the (ts,id)-latest)
      ("u1", 1L, 1L, "a", ""), ("u1", 2L, 2L, "b", ""),
      ("u1", 3L, 3L, "c", ""), ("u1", 4L, 104L, "purchase", ""),
      // u1 second purchase@10 with a 7s window: only c@3 is inside
      //     [3, 10] → c takes the whole 10000
      ("u1", 10L, 110L, "purchase", ""),
      // u2: purchase with no touches → unattributed (dropped)
      ("u2", 5L, 205L, "purchase", ""))
      .toDF("u", "tsl", "id", "op", "x")
      .select(col("u"), timestamp_seconds(col("tsl")).as("ts"), col("id"),
        col("op"))
    val got = graft.operators.Behavior.linearAttribution(
        ev, "u", "op", "ts", "id", "purchase", 7L * 1000000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      "a" -> ((1L, 1L, 3333L)),
      "b" -> ((1L, 1L, 3333L)),
      "c" -> ((2L, 2L, 3334L + 10000L))))
    // every attributed conversion distributes exactly 10000 bp
    assert(got.values.map(_._3).sum == 20000L)
  }

  test("linearAttribution: same-ts remainder tie-breaks by id; hub-key " +
    "guard excludes loudly or throws") {
    val ev = Seq(
      ("u1", 5L, 1L, "x"), ("u1", 5L, 2L, "y"), ("u1", 5L, 3L, "zz"),
      ("u1", 6L, 9L, "purchase"))
      .toDF("u", "tsl", "id", "op")
      .select(col("u"), timestamp_seconds(col("tsl")).as("ts"), col("id"),
        col("op"))
    val got = graft.operators.Behavior.linearAttribution(
        ev, "u", "op", "ts", "id", "purchase", 1000000000L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got === Map("x" -> 3333L, "y" -> 3333L, "zz" -> 3334L))
    // guard: u1 has 3 touches > maxKeyTouches=2 → excluded entirely
    val guarded = graft.operators.Behavior.linearAttribution(
      ev, "u", "op", "ts", "id", "purchase", 1000000000L,
      maxKeyTouches = 2)
    assert(guarded.count() == 0)
    intercept[IllegalStateException] {
      graft.operators.Behavior.linearAttribution(
        ev, "u", "op", "ts", "id", "purchase", 1000000000L,
        maxKeyTouches = 2, failOnOversized = true).count()
    }
  }

  test("hourlyCrossCorr: planted one-hour lead reads r = 1 at lag 1") {
    // x (type v) hours 0..3 = [1,2,0,3]; y (type p) = x shifted +1h →
    // grid spans hours 0..4: x=[1,2,0,3,0], y=[0,1,2,0,3].
    // lag 1 pairs x[0..3] vs y[1..4] = identical vectors → r = 1.
    val xs = Seq((0, 1), (1, 2), (3, 3)).flatMap { case (h, n) =>
      (1 to n).map(i => (h * 3600L + i, "v")) }
    val ys = Seq((1, 1), (2, 2), (4, 3)).flatMap { case (h, n) =>
      (1 to n).map(i => (h * 3600L + i, "p")) }
    val ev = (xs ++ ys).toDF("tsl", "op")
      .select(timestamp_seconds(col("tsl")).as("ts"), col("op"))
    val got = graft.operators.Behavior.hourlyCrossCorr(
        ev, "ts", "op", "v", "p", Seq(0, 1, 2))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got(1) === ((4L, 1.0)))
    assert(got(0)._1 === 5L)
    assert(got(2)._1 === 3L)
    assert(got(1)._2 > got(0)._2 && got(1)._2 > got(2)._2)
  }

  test("seasonalDecompose: planted square-wave day reads exact ±4 seasonal") {
    // 4 days of a perfectly periodic pattern: 10 events/hour for hod<12,
    // 2 for hod>=12 (S = 144, mean 6). Any 24-consecutive-hour sum is S,
    // so the 2x24 MA numerator is exactly 2S and seasonal_h = p_h − 6.
    // Interior hours with full windows are 12..83 → 3 per hod.
    val ev = (0 until 96).flatMap { h =>
      val n = if (h % 24 < 12) 10 else 2
      (1 to n).map(i => h * 3600L + i)
    }.toDF("tsl").select(timestamp_seconds(col("tsl")).as("ts"))
    val got = graft.operators.Behavior.seasonalDecompose(ev, "ts")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.size == 24)
    for (hod <- 0L until 24L) {
      val (n, seasonal, rawMean) = got(hod)
      assert(n == 3L, s"hod $hod")
      assert(seasonal == (if (hod < 12) 4.0 else -4.0), s"hod $hod")
      assert(rawMean == (if (hod < 12) 10.0 else 2.0), s"hod $hod")
    }
  }

  test("isolation forest: planted outlier scores highest, deterministic") {
    import graft.operators.IsolationForest
    // inlier grid in [0,1]² plus one far point
    val inliers = (1 to 400).map { i =>
      (i.toLong, (i % 20) / 20.0, (i / 20) / 20.0)
    }
    val all = (inliers :+ (999L, 50.0, 50.0)).toDF("id", "x", "y")
    val m = IsolationForest.train(all, "id", Seq("x", "y"),
      nTrees = 10, sampleSize = 64, seed = 7L)
    val scored = m.score(all, "s")
    val top = scored.orderBy(col("s").desc, col("id")).limit(1)
      .collect()(0)
    assert(top.getLong(0) === 999L)
    val sOut = top.getDouble(3)
    val sInMax = scored.where(col("id") =!= 999L).agg(max(col("s")))
      .collect()(0).getDouble(0)
    assert(sOut > sInMax + 0.03, s"outlier $sOut vs inlier max $sInMax")
    // same model, any partitioning → identical scores (pure expressions)
    val re = m.score(all.repartition(7, col("y")), "s")
      .select("id", "s").collect().map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    val base = scored.select("id", "s").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(re === base)
    // retrain with the same seed on a reshuffled frame → same model
    val m2 = IsolationForest.train(all.repartition(5), "id", Seq("x", "y"),
      nTrees = 10, sampleSize = 64, seed = 7L)
    val re2 = m2.score(all, "s").select("id", "s").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(re2 === base)
  }

  test("iforest path sum: hand-traced trees, NULL features route right") {
    // two hand-built trees over one feature (r20 native-expression pin):
    //   t0: root f0<5 ? leaf 1.0 : leaf 2.0
    //   t1: root f0<3 ? leaf 10.0 : (f0<7 ? leaf 20.0 : leaf 30.0)
    import graft.expressions.NativeFunctions
    val feats = Array(0, -1, -1, 0, -1, 0, -1, -1)
    val thr = Array(5.0, 0, 0, 3.0, 0, 7.0, 0, 0)
    val lefts = Array(1, -1, -1, 4, -1, 6, -1, -1)
    val rights = Array(2, -1, -1, 5, -1, 7, -1, -1)
    val leafs = Array(0.0, 1.0, 2.0, 0.0, 10.0, 0.0, 20.0, 30.0)
    val roots = Array(0, 3)
    val df = Seq((1L, Some(1.0)), (2L, Some(6.0)), (3L, Some(9.0)),
      (4L, None)).toDF("id", "x")
    val got = df.withColumn("s", NativeFunctions.iforestPathSum(
        Seq(col("x")), feats, thr, lefts, rights, leafs, roots))
      .orderBy("id").select("s").as[Double].collect()
    // x=1 → 1+10; x=6 → 2+20; x=9 → 2+30; NULL → right,right → 2+30
    assert(got.toSeq === Seq(11.0, 22.0, 32.0, 32.0))
  }

  test("hourlyAdf: alternating series strongly rejects a unit root") {
    // 10,2,10,2,... → Δx = −γ·x-ish mean reversion: γ = Σzy/Σz²
    val ev = (0 until 20).flatMap { h =>
      val n = if (h % 2 == 0) 10 else 2
      (1 to n).map(i => (h * 3600L + i, i))
    }.toDF("tsl", "i").select(timestamp_seconds(col("tsl")).as("ts"))
    val got = graft.operators.Behavior.hourlyAdf(ev, "ts").collect()(0)
    assert(got.getLong(0) === 19L)
    // hand moments: pairs (z=10,y=−8) ×10? — compute directly instead
    val xs = (0 until 20).map(h => if (h % 2 == 0) 10L else 2L)
    val pairs = xs.sliding(2).map(p => (p(0), p(1) - p(0))).toSeq
    val szy = pairs.map { case (z, y) => z * y }.sum.toDouble
    val szz = pairs.map { case (z, _) => z * z }.sum.toDouble
    val syy = pairs.map { case (_, y) => y * y }.sum.toDouble
    val g = szy / szz
    val se = math.sqrt(((syy - g * szy) / 18.0) / szz)
    assert(got.getDouble(1) === math.rint(g * 1e6) / 1e6)
    assert(got.getDouble(2) === math.rint(g / se * 1e6) / 1e6)
    assert(got.getDouble(2) < -2.86) // deep in the stationary region
  }

  test("timeWeightedAvg: step-function mean, last value carries no weight") {
    // u1: v=10 held 2s, v=20 held 1s, v=99 last (no weight)
    // → (10·2e6 + 20·1e6) / 3e6 = 13.333333
    val ev = Seq(("u1", 0L, 10.0, 1L), ("u1", 2L, 20.0, 2L),
      ("u1", 3L, 99.0, 3L), ("u2", 5L, 7.0, 4L))
      .toDF("u", "tsl", "v", "id")
      .select(col("u"), timestamp_seconds(col("tsl")).as("ts"), col("v"), col("id"))
    val got = Behavior.timeWeightedAvg(ev, "u", "ts", "id", "v").collect()
    assert(got.length === 1) // u2 has a single event → no holds → dropped
    assert(got(0).getString(0) === "u1")
    assert(got(0).getLong(1) === 2L)
    assert(got(0).getDouble(2) === 13.333333)
  }

  test("lorenzCurve: hand deciles, cumulative shares, NTILE extras rule") {
    val perKey = ((1L to 9L).map((_, 1L)) :+ (10L, 91L)).toDF("u", "n")
    val r = graft.operators.Insights.lorenzCurve(perKey, "u", "n")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getDouble(3))).toSeq
    assert(r === (1L to 9L).map(d => (d, d, d, d * 0.01)) :+
      (10L, 10L, 100L, 1.0))
    // 12 keys: NTILE gives the first two deciles 2 keys each
    val r12 = graft.operators.Insights.lorenzCurve(
      (1L to 12L).map((_, 1L)).toDF("u", "n"), "u", "n")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(r12.take(3) == Seq((1L, 2L), (2L, 4L), (3L, 5L)))
  }

  test("dailyMannKendall: monotone series detected, all-tied series drops") {
    // daily counts 1,2,3,4,5 → S = 10, no ties: Var = 5·4·15/18,
    // z = 9/sqrt(Var); expected p via the same A&S replica
    def mk(counts: Seq[Int]) = {
      val ev = counts.zipWithIndex.flatMap { case (k, day) =>
        (1 to k).map(j => day.toLong * 86400 + j) }
        .toDF("tsl").select(timestamp_seconds(col("tsl")).as("ts"))
      Behavior.dailyMannKendall(ev, "ts").collect()
    }
    val r = mk(Seq(1, 2, 3, 4, 5))(0)
    def rnd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val varS = 5.0 * 4.0 * 15.0 / 18.0
    val z = 9.0 / math.sqrt(varS)
    val k = 1.0 / (1.0 + 0.2316419 * z)
    val poly = k * (0.319381530 + k * (-0.356563782 + k * (1.781477937 +
      k * (-1.821255978 + k * 1.330274429))))
    val pv = 2.0 * (math.exp(z * z * -0.5) * 0.3989422804014327) * poly
    assert(r.getLong(0) == 5L && r.getLong(1) == 10L)
    assert(r.getDouble(2) == rnd(z) && r.getDouble(3) == rnd(pv))
    assert(r.getLong(4) == (if (rnd(pv) < 0.05) 1L else 0L))
    // flat series: the tie term swallows the variance → dropped loudly
    assert(mk(Seq(2, 2, 2)).isEmpty)
  }

  test("dailyRunsTest: oscillation vs regimes, hand E[R]/Var(R)") {
    def rt(counts: Seq[Int]) = {
      val ev = counts.zipWithIndex.flatMap { case (k, day) =>
        (1 to k).map(j => day.toLong * 86400 + j) }
        .toDF("tsl").select(timestamp_seconds(col("tsl")).as("ts"))
      Behavior.dailyRunsTest(ev, "ts").collect()
    }
    def rnd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 1,9,1,9,1,9 (median 5): 6 runs of 3+3 → z = (6−4)/√1.2
    val osc = rt(Seq(1, 9, 1, 9, 1, 9))(0)
    assert(osc.getLong(0) == 6L && osc.getLong(3) == 6L)
    assert(osc.getDouble(4) == rnd(2.0 / math.sqrt(1.2)))
    // 1,1,1,9,9,9: two regimes → z = −(same magnitude)
    val reg = rt(Seq(1, 1, 1, 9, 9, 9))(0)
    assert(reg.getLong(3) == 2L)
    assert(reg.getDouble(4) == rnd(-2.0 / math.sqrt(1.2)))
    // a day sitting exactly on the median is excluded from the sequence
    val excl = rt(Seq(1, 9, 5, 1, 9))(0) // median 5 → 4 signed days
    assert(excl.getLong(0) == 4L)
  }

  test("groupShingleOverlap: exact pairwise 3-gram Jaccard; short docs skip") {
    import graft.operators.Vocabulary
    // A: "a b c d" -> shingles {a b c, b c d}; B: "a b c" -> {a b c};
    // C: "x y" too short -> contributes nothing and pairs with nobody
    val docs = Seq(("A", "a b c d"), ("B", "a b c"), ("C", "x y"))
      .toDF("src", "text")
    val got = Vocabulary.groupShingleOverlap(docs, "src", "text")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq === Seq(("A", "B", 2L, 1L, 1L, 0.5)))
  }

  test("labelPropagation: triangle converges to min label; a detached " +
    "pair oscillates back to self-labels at even rounds") {
    import graft.operators.Graph
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.labelPropagation(e, "src", "dst", 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 11L))
    // directed: a node with no in-edges keeps its own label
    val d1 = Graph.labelPropagation(Seq((1L, 2L)).toDF("src", "dst"),
      "src", "dst", 1).as[(Long, Long)].collect().toMap
    assert(d1 == Map(1L -> 1L, 2L -> 1L))
  }

  test("labelPropagation is partitioning-invariant (all-integer votes)") {
    import graft.operators.Graph
    val und = (1L to 40L).flatMap(i => Seq((i, i % 7 + 100L),
      (i % 7 + 100L, i)))
    val e = und.toDF("src", "dst")
    val a = Graph.labelPropagation(e.repartition(1), "src", "dst", 3)
      .collect().toSet
    val b = Graph.labelPropagation(e.repartition(13), "src", "dst", 3)
      .collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("bipartiteBestPartner: hand wedges, fixed-point AA sum, cn tie " +
    "by min partner, hub exclusion") {
    import graft.operators.Graph
    val rel = Seq((100L, 1L), (100L, 2L), (200L, 1L), (200L, 2L),
      (200L, 3L), (300L, 2L), (300L, 3L), (400L, 3L) // deg-1: wedgeless
    ).toDF("c", "s")
    val got = Graph.bipartiteBestPartner(rel, "c", "s")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // quantized AA: floor(1e6/ln(deg)) micro-units per wedge center,
    // exact integer sum, /1e6 at the readout (order-independent)
    def w(deg: Int) = math.floor(1e6 / math.log(deg.toDouble)).toLong
    val aa12 = (w(2) + w(3)).toDouble / 1e6 // centers c=100 (deg2), c=200 (deg3)
    val aa23 = (w(3) + w(2)).toDouble / 1e6 // centers c=200 (deg3), c=300 (deg2)
    assert(got.toSeq == Seq((1L, 2L, 2L, aa12), (2L, 1L, 2L, aa12),
      (3L, 2L, 2L, aa23)))
    // planted hub: a left node past the cap is excluded, result unchanged
    val hub = (1L to 60L).map(s => (999L, s)).toDF("c", "s")
    val capped = Graph.bipartiteBestPartner(rel.union(hub), "c", "s",
      maxLeftDegree = 50).as[(Long, Long, Long, Double)].collect()
      .sortBy(_._1).toSeq
    assert(capped == got.toSeq)
  }

  test("bipartiteBestPartner AA quantization: no floor boundary within " +
    "1e-7 across the whole deg domain (libm-ulp-proof oracle contract)") {
    // the oracle replays floor(1e6/ln(deg)) in DuckDB's libm; a 1-ulp
    // ln disagreement shifts the quotient by ~2e-10 relative (~3e-4
    // absolute at deg=2), so the floor only flips if the exact quotient
    // sits within that slack of an integer — pin that the whole 4095-entry
    // table keeps a 5e-5 margin (the measured min fractional distance is
    // 1.04e-4 at deg 609, ~10⁵× the ulp slack)
    val close = (2 to 4096).filter { d =>
      val q = 1e6 / math.log(d.toDouble)
      val frac = q - math.floor(q)
      frac < 5e-5 || frac > 1 - 5e-5
    }
    assert(close.isEmpty, s"degs at a floor boundary: $close")
  }

  test("basketRules: hand confidences, lift, leverage, NULL conviction " +
    "for exact rules") {
    val df = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (3L, "A"),
      (4L, "B"), (4L, "C")).toDF("bk", "it")
    val got = Insights.basketRules(df, "bk", "it").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = got(("A", "B"))
    assert(ab.getLong(2) == 2 && ab.getDouble(3) == 0.666667 &&
      ab.getDouble(4) == 0.888889 && ab.getDouble(5) == -0.0625 &&
      ab.getDouble(6) == 0.75)
    val cb = got(("C", "B"))
    assert(cb.getLong(2) == 1 && cb.getDouble(3) == 1.0 &&
      cb.getDouble(4) == 1.333333 && cb.getDouble(5) == 0.0625 &&
      cb.isNullAt(6))
    // minN filters by co-support
    assert(Insights.basketRules(df, "bk", "it", minN = 2L)
      .collect().length == 2) // only A->B and B->A
  }

  test("unitValueIndex: hand months, matched-items discipline, base = 1") {
    def ts(month: Int) = java.sql.Timestamp.valueOf(f"2024-$month%02d-01 00:00:00")
    // part 1 trades in all months; part 2 only in month 2 (must be
    // EXCLUDED from every index — unmatched against base); part 3 only
    // in base (contributes to no later month)
    val rows = Seq(
      (ts(1), 1L, 10L, 1000L), (ts(1), 3L, 5L, 250L),
      (ts(2), 1L, 10L, 1200L), (ts(2), 2L, 99L, 99999L),
      (ts(3), 1L, 20L, 2000L))
      .toDF("d", "k", "q", "e")
    val got = Insights.unitValueIndex(rows, col("d"), col("k"), col("q"),
      col("e")).as[(java.sql.Timestamp, Long, Double)].collect()
      .sortBy(_._1.getTime)
    assert(got.length == 3)
    // base month: index 1 by construction (matched = itself)
    assert(got(0)._2 == 2 && got(0)._3 == 1.0)
    // month 2: matched = part 1 only; (1200/10)/(1000/10) = 1.2
    assert(got(1)._2 == 1 && got(1)._3 == 1.2)
    // month 3: (2000/20)/(1000/10) = 1.0
    assert(got(2)._2 == 1 && got(2)._3 == 1.0)
  }

  test("entropyRate: deterministic chain reads 0; uniform chain reads " +
    "ln k") {
    def ev(rows: Seq[(Long, String)]) = rows.zipWithIndex
      .map { case ((u, op), i) => (u, op, i.toLong, i.toLong) }
      .toDF("u", "op", "tm", "id")
      .select(col("u"), col("op"),
        timestamp_micros(col("tm") * 1000000L).as("ts"), col("id"))
    // a -> b -> a -> b ...: next is a FUNCTION of current → H(next|cur)=0
    val det = ev((1 to 20).map(i => (1L, if (i % 2 == 0) "a" else "b")))
    val r1 = Behavior.entropyRate(det, "u", "op", "ts", "id").collect()(0)
    assert(r1.getLong(0) == 19 && r1.getDouble(2) == 0.0 &&
      r1.getDouble(3) == 1.0)
    // a,b,a,a,b,b,... engineered so each of the 4 transitions appears
    // equally often from each state: H(next|cur) = ln 2 = H(next)
    val uni = ev(Seq(1L -> "a", 1L -> "a", 1L -> "b", 1L -> "b")
      .flatMap { case (u, op) => Seq((u, op)) } ++
      Seq((2L, "a"), (2L, "b"), (2L, "a"), (2L, "b"), (2L, "a")))
    val r2 = Behavior.entropyRate(uni, "u", "op", "ts", "id").collect()(0)
    // mixed-structure sanity: 0 < h_rate <= h_next
    assert(r2.getDouble(2) > 0.0 && r2.getDouble(2) <= r2.getDouble(1) + 1e-12)
  }

  test("crostonForecast: hand-folded two-EMA recurrence, dense-gap " +
    "interval accounting, single-demand init") {
    def ts(month: Int) = java.sql.Timestamp.valueOf(f"2024-$month%02d-15 00:00:00")
    // part A over the 6-month global span: [5,0,0,7,0,3]
    //   init z=5 p=1; demand after 2-gap: z=6 p=(0.5·3+0.5·1)=2;
    //   after 1-gap: z=4.5 p=2 → forecast 2.25
    // part B: [0,0,4,0,0,0] → z=4, p=3 (waited 3 periods), nd=1
    val rows = Seq((ts(1), "A", 5L), (ts(4), "A", 7L), (ts(6), "A", 3L),
      (ts(3), "B", 4L)).toDF("d", "k", "q")
    val got = Insights.crostonForecast(rows, col("d"), col("k"), col("q"))
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("A") == (("A", 6L, 3L, 4.5, 2.0, 2.25)))
    assert(got("B") == (("B", 6L, 1L, 4.0, 3.0, 1.333333)))
  }

  test("openBacklog: hand interval sweep, overlap peak, drain to zero") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 00:00:00")
    val orders = Seq((1L, ts(0)), (2L, ts(1)))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq((1L, ts(2)), (1L, ts(0)), (2L, ts(1)))
      .toDF("l_orderkey", "l_shipdate")
    val got = Insights.openBacklog(orders, li)
      .as[(java.sql.Timestamp, Long)].collect().sortBy(_._1.getTime)
      .map(_._2).toSeq
    // day0: +o1 = 1; day1: +o2 = 2; day2: -o2 = 1; day3: -o1 = 0
    assert(got == Seq(1L, 2L, 1L, 0L))
  }

  test("revenueHhi: hand shares, duplicate key rows merge, single key " +
    "reads 1.0") {
    val df = Seq(("g", 1L, 100L), ("g", 1L, 200L), ("g", 2L, 100L),
      ("solo", 9L, 50L)).toDF("grp", "k", "cents")
    val got = Insights.revenueHhi(df, "grp", "k", col("cents"))
      .as[(String, Long, Double, Double)].collect().sortBy(_._1).toSeq
    // g: s = {300, 100} → HHI = (90000 + 10000)/160000 = 0.625, CR1 0.75
    assert(got == Seq(("g", 2L, 0.625, 0.75), ("solo", 1L, 1.0, 1.0)))
  }
}
