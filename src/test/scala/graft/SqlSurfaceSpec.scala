package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Behavior

/** The behavior suite's SQL surface (`window_funnel`, `sequence_match`,
  * `sequence_level`, `retention` registered via GraftExtensions): every
  * form must answer EXACTLY what the library DataFrame twin answers on the
  * same log — including under ties and arbitrary partitioning (which
  * exercises partial aggregation: update/serialize/merge/eval all run).
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000000 // 1h in micros
  private val steps = Seq("signup", "click", "purchase")

  /** Seeded random log: 60 users × ~40 events, coarse timestamps so
    * same-instant collisions actually occur.
    */
  private lazy val events: DataFrame = {
    val rnd = new scala.util.Random(4242)
    val ops = Seq("view", "signup", "click", "purchase", "error")
    val rows = for {
      u <- 1L to 60L
      _ <- 1 to (20 + rnd.nextInt(40))
    } yield (u, ops(rnd.nextInt(ops.size)),
      // 10-minute grid over ~3 days → plenty of per-user ties
      (rnd.nextInt(72 * 6).toLong * 10 * 60 * 1000000))
    val df = rows.toDF("user_id", "event_type", "us")
      .withColumn("t", timestamp_micros(col("us")))
      .repartition(7, col("us")) // deliberately NOT keyed by user
      .cache()
    df.count()
    df.createOrReplaceTempView("sql_surface_events")
    df
  }

  test("window_funnel in SQL equals Behavior.windowFunnel") {
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    events // force view registration
    val viaSql = spark.sql(
      s"""SELECT user_id, window_funnel(${6 * H}, t,
         |         event_type = 'signup', event_type = 'click',
         |         event_type = 'purchase') AS funnel_level
         |FROM sql_surface_events GROUP BY user_id""".stripMargin)
      .as[(Long, Long)].collect().toMap
    val viaLib = Behavior.windowFunnel(events, "user_id", "event_type", "t",
      steps, windowMicros = 6 * H).as[(Long, Long)].collect().toMap
    assert(viaSql == viaLib)
    assert(viaSql.values.exists(_ > 0), "degenerate fixture: nobody funneled")
  }

  test("sequence_match and sequence_level in SQL equal the library DP") {
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    events
    val viaSql = spark.sql(
      s"""SELECT user_id,
         |       sequence_level(${2 * H}, t, event_type = 'signup',
         |         event_type = 'click', event_type = 'purchase') AS lvl,
         |       sequence_match(${2 * H}, t, event_type = 'signup',
         |         event_type = 'click', event_type = 'purchase') AS ok
         |FROM sql_surface_events GROUP BY user_id""".stripMargin)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val lvls = Behavior.sequenceLevels(events, "user_id", "event_type", "t",
      steps, maxGapMicros = 2 * H).as[(Long, Long)].collect().toMap
    val match_ = Behavior.sequenceMatch(events, "user_id", "event_type", "t",
      steps, maxGapMicros = 2 * H).as[(Long, Boolean)].collect().toMap
    assert(viaSql.view.mapValues(_._1).toMap == lvls)
    assert(viaSql.view.mapValues(_._2).toMap == match_)
    // match is definitionally level == k on both paths
    viaSql.values.foreach { case (l, m) => assert(m == (l == steps.size)) }
  }

  test("retention in SQL rolls up to Behavior.retention's counts") {
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    events
    val viaSql = spark.sql(
      """WITH k AS (SELECT user_id,
        |             retention(event_type = 'signup', event_type = 'click',
        |               event_type = 'purchase') AS r
        |           FROM sql_surface_events GROUP BY user_id)
        |SELECT sum(CASE WHEN r[0] THEN 1 ELSE 0 END) AS r0,
        |       sum(CASE WHEN r[1] THEN 1 ELSE 0 END) AS r1,
        |       sum(CASE WHEN r[2] THEN 1 ELSE 0 END) AS r2
        |FROM k""".stripMargin).as[(Long, Long, Long)].head()
    val viaLib = Behavior.retention(events, "user_id",
        Seq(col("event_type") === "signup", col("event_type") === "click",
          col("event_type") === "purchase"))
      .as[(Long, Long, Long)].head()
    assert(viaSql == viaLib)
    assert(viaSql._1 > 0)
  }

  test("chain aggregates honor the strictly-before frame on ties") {
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    // signup and click at the same instant: no hop (both paths agree)
    Seq((1L, "signup", 1000L), (1L, "click", 1000L), (2L, "signup", 1000L),
      (2L, "click", 2000L))
      .toDF("user_id", "event_type", "us")
      .withColumn("t", timestamp_micros(col("us")))
      .createOrReplaceTempView("tie_events")
    val r = spark.sql(
      s"""SELECT user_id,
         |       window_funnel($H, t, event_type = 'signup',
         |         event_type = 'click') AS wf,
         |       sequence_level($H, t, event_type = 'signup',
         |         event_type = 'click') AS sl
         |FROM tie_events GROUP BY user_id""".stripMargin)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(r == Map(1L -> ((1L, 1L)), 2L -> ((2L, 2L))))
  }

  test("bad arguments fail loudly, not silently") {
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    events
    // non-literal window
    assertThrows[Exception] {
      spark.sql("""SELECT window_funnel(us, t, event_type = 'a',
                   event_type = 'b') FROM sql_surface_events""").collect()
    }
    // single condition
    assertThrows[Exception] {
      spark.sql("""SELECT retention(event_type = 'a')
                   FROM sql_surface_events""").collect()
    }
  }

  test("stat-test SQL aggregates equal the library operators and carry real p-values") {
    import graft.operators.StatTests
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    val rnd = new scala.util.Random(99)
    val rows = for (i <- 1 to 500) yield
      (i % 6L, if (rnd.nextBoolean()) "a" else "b",
        (rnd.nextInt(40) + (i % 6) * 3).toLong) // coarse values force rank ties
    val df = rows.toDF("bucket", "arm", "y").repartition(7)
    df.createOrReplaceTempView("stat_events")
    val sql = spark.sql(
      """SELECT bucket,
                welch_ttest(y, arm = 'a', arm = 'b') AS w,
                student_ttest(y, arm = 'a', arm = 'b') AS s,
                mann_whitney_u(y, arm = 'a', arm = 'b') AS m
         FROM stat_events GROUP BY bucket""")
      .selectExpr("bucket", "w.t", "w.df", "w.p_value", "s.t", "s.df",
        "s.p_value", "m.u1", "m.z", "m.p_value")
      .as[(Long, Double, Double, Double, Double, Double, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap

    val lib = StatTests.abTTest(df, col("bucket"), col("arm") === "a",
        col("arm") === "b", col("y"))
      .as[(Long, Long, Long, Double, Double, Double, Double, Double, Long)]
      .collect().map(r => r._1 -> r).toMap
    val mw = StatTests.mannWhitneyU(df, col("bucket"), col("arm") === "a",
        col("arm") === "b", col("y"))
      .as[(Long, Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap

    assert(sql.keySet == lib.keySet && sql.keySet == mw.keySet)
    sql.foreach { case (k, r) =>
      val l = lib(k)
      assert(math.abs(r._2 - l._6) < 1e-6, s"welch t bucket $k") // lib rounds 6dp
      assert(math.abs(r._3 - l._7) < 1e-6, s"welch df bucket $k")
      assert(math.abs(r._5 - l._8) < 1e-6, s"student t bucket $k")
      assert(r._6 == l._9.toDouble, s"student df bucket $k")
      val m = mw(k)
      assert(r._8 == m._4, s"u1 bucket $k") // exact half-integer
      assert(math.abs(r._9 - m._5) < 1e-6, s"z bucket $k")
      // p-values are genuine probabilities, consistent with their statistic
      assert(r._4 > 0 && r._4 <= 1 && r._7 > 0 && r._7 <= 1 && r._10 > 0 && r._10 <= 1)
      assert(math.abs(r._4 -
        graft.expressions.StatMath.tTwoSidedP(r._2, r._3)) < 1e-12)
    }
  }

  test("stat-test SQL aggregates return NULL for undefined groups") {
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    Seq((1L, "a", 10L), (1L, "b", 20L), (1L, "b", 30L)) // n_a = 1
      .toDF("bucket", "arm", "y").createOrReplaceTempView("stat_tiny")
    val r = spark.sql(
      """SELECT welch_ttest(y, arm = 'a', arm = 'b') AS w,
                student_ttest(y, arm = 'a', arm = 'b') AS s
         FROM stat_tiny GROUP BY bucket""").collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
    // all-tied values: z undefined -> NULL
    Seq((1L, "a", 5L), (1L, "a", 5L), (1L, "b", 5L))
      .toDF("bucket", "arm", "y").createOrReplaceTempView("stat_tied")
    val m = spark.sql(
      """SELECT mann_whitney_u(y, arm = 'a', arm = 'b') AS m
         FROM stat_tied GROUP BY bucket""").collect()(0)
    assert(m.isNullAt(0))
  }

  test("association SQL aggregates: textbook anchors, contracts, bit-determinism") {
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    // the StatTestsSpec 2x2: rows (x: 30|10), (y: 20|40) -> chi2 = 50/3
    val rows = Seq.fill(30)(("x", "0")) ++ Seq.fill(10)(("x", "1")) ++
      Seq.fill(20)(("y", "0")) ++ Seq.fill(40)(("y", "1"))
    rows.toDF("a", "b").repartition(7).createOrReplaceTempView("assoc_t")
    val r = spark.sql(
      """SELECT cramers_v(a, b) AS v, cramers_v_bias_corrected(a, b) AS vc,
                theils_u(a, b) AS u
         FROM assoc_t""").as[(Double, Double, Double)].collect()(0)
    assert(math.abs(r._1 - math.sqrt(1.0 / 6)) < 1e-12, s"V = ${r._1}")
    assert(r._2 < r._1 && r._2 >= 0, s"corrected ${r._2} vs ${r._1}")
    // hand U(a|b): H(a) with p = .4/.6; H(a|b) from the four cells
    def h(ps: Seq[Double]) = -ps.filter(_ > 0).map(p => p * math.log(p)).sum
    val ha = h(Seq(0.4, 0.6))
    val hab = 0.5 * h(Seq(0.6, 0.4)) + 0.5 * h(Seq(0.2, 0.8))
    assert(math.abs(r._3 - (ha - hab) / ha) < 1e-12, s"U = ${r._3}")

    // determinism: identical bits under any partitioning (sorted-cell eval)
    rows.toDF("a", "b").coalesce(1).createOrReplaceTempView("assoc_t1")
    val r1 = spark.sql("SELECT cramers_v(a, b), theils_u(a, b) FROM assoc_t1")
      .as[(Double, Double)].collect()(0)
    assert(r1 == ((r._1, r._3)))

    // independence -> V = 0, U = 0; determinism a = f(b) -> U = 1
    val indep = (for (a <- Seq("p", "q"); b <- Seq("0", "1"); _ <- 1 to 10)
      yield (a, b)).toDF("a", "b")
    indep.createOrReplaceTempView("assoc_ind")
    val ri = spark.sql("SELECT cramers_v(a, b), theils_u(a, b) FROM assoc_ind")
      .as[(Double, Double)].collect()(0)
    assert(math.abs(ri._1) < 1e-12 && math.abs(ri._2) < 1e-12)
    val det = Seq(("u", "0"), ("v", "1"), ("u", "0"), ("v", "1"))
      .toDF("a", "b")
    det.createOrReplaceTempView("assoc_det")
    val rd = spark.sql("SELECT theils_u(a, b) FROM assoc_det")
      .as[Double].collect()(0)
    assert(math.abs(rd - 1.0) < 1e-12)

    // degenerate: constant column -> NULL, not NaN
    Seq(("k", "0"), ("k", "1")).toDF("a", "b").createOrReplaceTempView("assoc_const")
    val rc = spark.sql(
      "SELECT cramers_v(a, b), theils_u(a, b) FROM assoc_const").collect()(0)
    assert(rc.isNullAt(0) && rc.isNullAt(1))
  }

  test("cramers_v recomposes from the contingencyChi2 cell decomposition") {
    import graft.operators.StatTests
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    events.createOrReplaceTempView("assoc_events")
    val viaSql = spark.sql(
      """SELECT cramers_v(event_type, CAST((us DIV 600000000) % 5 AS STRING)) FROM assoc_events""")
      .as[Double].collect()(0)
    val cells = StatTests.contingencyChi2(events, col("event_type"),
        expr("(us DIV 600000000) % 5").cast("string"))
      .as[(String, String, Long, Double, Double)].collect()
    val chi2 = cells.map(_._5).sum
    val n = cells.map(_._3).sum.toDouble
    val k = math.min(cells.map(_._1).distinct.size, cells.map(_._2).distinct.size) - 1
    assert(math.abs(viaSql - math.sqrt(chi2 / n / k)) < 1e-4) // cells round 6dp
  }

  test("ks / rank_corr / simple_linreg / anova_f SQL forms equal the library operators") {
    import graft.operators.StatTests
    import graft.expressions.StatMath
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    val rnd = new scala.util.Random(123)
    val rows = for (i <- 1 to 600) yield
      (i % 5L, if (rnd.nextBoolean()) "a" else "b",
        (rnd.nextInt(30) + (i % 5) * 2).toLong, // coarse y: rank ties
        (i % 97).toLong) // x co-variate
    val df = rows.toDF("bucket", "arm", "y", "x").repartition(7)
    df.createOrReplaceTempView("stat_events2")
    val sql = spark.sql(
      """SELECT bucket,
                kolmogorov_smirnov(y, arm = 'a', arm = 'b') AS k,
                rank_corr(x, y) AS rho,
                simple_linreg(x, y) AS lr,
                anova_f(y, arm) AS af
         FROM stat_events2 GROUP BY bucket""")
      .selectExpr("bucket", "k.d", "k.p_value", "rho", "lr.slope",
        "lr.intercept", "lr.r2", "af.f", "af.df_between", "af.df_within",
        "af.p_value")
      .as[(Long, Double, Double, Double, Double, Double, Double, Double,
        Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap

    val ks = StatTests.ksTest(df, col("bucket"), col("arm") === "a",
        col("arm") === "b", col("y"))
      .as[(Long, Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    val sp = StatTests.spearmanCorr(df, col("bucket"), col("x"), col("y"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val lr = StatTests.linReg(df, col("bucket"), col("x"), col("y"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).toMap
    val av = StatTests.anovaF(df, col("bucket"), col("arm"), col("y"))
      .as[(Long, Long, Long, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val tt = StatTests.abTTest(df, col("bucket"), col("arm") === "a",
        col("arm") === "b", col("y"))
      .as[(Long, Long, Long, Double, Double, Double, Double, Double, Long)]
      .collect().map(r => r._1 -> r).toMap

    assert(sql.keySet == ks.keySet)
    sql.foreach { case (b, r) =>
      // KS: identical exact D; p is the convergent Kolmogorov tail at the
      // same λ (the library emits the oracle-constrained 3-term form)
      assert(math.abs(r._2 - ks(b)._4) < 1e-6, s"ks d bucket $b")
      val (n1, n2) = (ks(b)._2.toDouble, ks(b)._3.toDouble)
      val lam = math.sqrt(n1 * n2 / (n1 + n2)) * r._2
      assert(math.abs(r._3 - StatMath.kolmogorovQ(lam)) < 1e-12)
      // Spearman: same ρ (library rounds 6dp)
      assert(math.abs(r._4 - sp(b)._3) < 1e-6, s"rho bucket $b")
      // linreg: the library reports in y/100 units (cents convention)
      assert(math.abs(r._5 / 100.0 - lr(b)._1) < 5e-7, s"slope bucket $b")
      assert(math.abs(r._6 / 100.0 - lr(b)._2) < 5e-7, s"intercept bucket $b")
      assert(math.abs(r._7 - lr(b)._3) < 1e-6, s"r2 bucket $b")
      // ANOVA: same F and dfs; with two groups F = t² of the pooled t-test
      // and the F tail equals the two-sided t tail EXACTLY (same incomplete
      // beta) — the textbook identity, pinned bit-tight
      assert(math.abs(r._8 - av(b)._4) < 1e-6, s"f bucket $b")
      assert(r._9 == av(b)._5 && r._10 == av(b)._6, s"dfs bucket $b")
      val st = tt(b)._8 // student t
      assert(math.abs(r._8 - st * st) < 1e-5 * math.max(1.0, st * st))
      // (st carries the library's 6dp rounding, which propagates ~1e-7)
      assert(math.abs(r._11 - StatMath.tTwoSidedP(st, tt(b)._9.toDouble)) < 1e-6)
    }
  }

  test("window_funnel_dedup in SQL equals the library automaton on tie-free logs") {
    import graft.operators.Behavior
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    val H = 3600L * 1000000
    // tie-FREE per-key timestamps: the SQL form breaks same-instant ties
    // by condition bitmask, the library op by op string — they coincide
    // exactly when per-key instants are distinct
    val rnd = new scala.util.Random(31)
    val ops = Seq("view", "signup", "click", "purchase")
    val rows = (for (u <- 1L to 50L) yield {
      val ts = rnd.shuffle((1 to 2000).toList).take(30)
      ts.map(t => (u, ops(rnd.nextInt(4)), t.toLong * 60L * 1000000))
    }).flatten
    val df = rows.toDF("u", "op", "tm").repartition(7)
      .select(col("u"), col("op"),
        org.apache.spark.sql.functions.timestamp_micros(col("tm")).as("ts"))
    df.createOrReplaceTempView("funnel_dedup_events")
    val sql = spark.sql(
      s"""SELECT CAST(u AS STRING) AS key,
                 window_funnel_dedup(${24 * H}, ts,
                   op = 'signup', op = 'click', op = 'purchase') AS lvl
          FROM funnel_dedup_events GROUP BY u""")
      .as[(String, Long)].collect().toMap
    val lib = Behavior.windowFunnelStrictDedup(df, "u", "op", "ts",
      Seq("signup", "click", "purchase"), 24 * H)
      .as[(String, Long)].collect().toMap
    assert(sql == lib)
    // the hand interrupt case survives the SQL path too
    val hand = Seq((9L, "signup", 0L), (9L, "click", H),
      (9L, "click", 2 * H), (9L, "purchase", 3 * H))
      .toDF("u", "op", "tm")
      .select(col("u"), col("op"),
        org.apache.spark.sql.functions.timestamp_micros(col("tm")).as("ts"))
    hand.createOrReplaceTempView("funnel_dedup_hand")
    assert(spark.sql(s"""SELECT window_funnel_dedup(${24 * H}, ts,
        op = 'signup', op = 'click', op = 'purchase')
      FROM funnel_dedup_hand""").head().getLong(0) == 2L)
    // with ties present the SQL form is still partitioning-deterministic
    // (total (ts, mask) order at eval)
    val tied = (1 to 300).map(i => (i % 9L, ops(i % 4),
      (i % 11L) * 600L * 1000000))
    val tdf = tied.toDF("u", "op", "tm")
      .select(col("u"), col("op"),
        org.apache.spark.sql.functions.timestamp_micros(col("tm")).as("ts"))
    def runTied(np: Int) = {
      tdf.repartition(np).createOrReplaceTempView("funnel_dedup_tied")
      spark.sql(s"""SELECT u, window_funnel_dedup(${24 * H}, ts,
          op = 'signup', op = 'click', op = 'purchase') AS lvl
        FROM funnel_dedup_tied GROUP BY u""")
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    }
    assert(runTied(1) == runTied(13))
  }

  test("window_funnel_strict in SQL equals the library lag formulation on tie-free logs") {
    import graft.operators.Behavior
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    val H = 3600L * 1000000
    val rnd = new scala.util.Random(53)
    val ops = Seq("view", "signup", "click", "purchase")
    val rows = (for (u <- 1L to 50L) yield {
      val ts = rnd.shuffle((1 to 2000).toList).take(35)
      ts.map(t => (u, ops(rnd.nextInt(4)), t.toLong * 60L * 1000000))
    }).flatten
    val df = rows.toDF("u", "op", "tm").repartition(7)
      .select(col("u"), col("op"),
        org.apache.spark.sql.functions.timestamp_micros(col("tm")).as("ts"))
    df.createOrReplaceTempView("strict_funnel_events")
    val sql = spark.sql(
      s"""SELECT CAST(u AS STRING) AS key,
                 window_funnel_strict(${24 * H}, ts,
                   op = 'signup', op = 'click', op = 'purchase') AS lvl
          FROM strict_funnel_events GROUP BY u""")
      .as[(String, Long)].collect().toMap
    val lib = Behavior.windowFunnelStrictOrder(df, "u", "op", "ts",
      Seq("signup", "click", "purchase"), 24 * H)
      .select(col("u").cast("string"), col("funnel_level"))
      .as[(String, Long)].collect().toMap
    assert(sql == lib)
    // hand case: an intervening unrelated event breaks the chain
    val hand = Seq(
      (1L, "signup", 0L), (1L, "view", H), (1L, "click", 2 * H),
      (2L, "signup", 0L), (2L, "click", H), (2L, "purchase", 2 * H))
      .toDF("u", "op", "tm")
      .select(col("u"), col("op"),
        org.apache.spark.sql.functions.timestamp_micros(col("tm")).as("ts"))
    hand.createOrReplaceTempView("strict_funnel_hand")
    val got = spark.sql(s"""SELECT u, window_funnel_strict(${24 * H}, ts,
        op = 'signup', op = 'click', op = 'purchase') AS lvl
      FROM strict_funnel_hand GROUP BY u""")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 3L))
    // partitioning-deterministic under ties (total (ts, mask) order)
    val tied = (1 to 300).map(i => (i % 9L, ops(i % 4),
      (i % 11L) * 600L * 1000000))
    val tdf = tied.toDF("u", "op", "tm")
      .select(col("u"), col("op"),
        org.apache.spark.sql.functions.timestamp_micros(col("tm")).as("ts"))
    def runTied(np: Int) = {
      tdf.repartition(np).createOrReplaceTempView("strict_funnel_tied")
      spark.sql(s"""SELECT u, window_funnel_strict(${24 * H}, ts,
          op = 'signup', op = 'click', op = 'purchase') AS lvl
        FROM strict_funnel_tied GROUP BY u""")
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    }
    assert(runTied(1) == runTied(13))
  }

  test("sequence_count in SQL equals the library automaton on tie-free logs") {
    import graft.operators.Behavior
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    val H = 3600L * 1000000
    // tie-free per-key instants: the SQL form breaks same-instant ties by
    // condition bitmask, the library op by op string — they coincide
    // exactly when per-key timestamps are distinct
    val rnd = new scala.util.Random(47)
    val ops = Seq("view", "signup", "click", "purchase")
    val rows = (for (u <- 1L to 50L) yield {
      val ts = rnd.shuffle((1 to 2000).toList).take(40)
      ts.map(t => (u, ops(rnd.nextInt(4)), t.toLong * 60L * 1000000))
    }).flatten
    val df = rows.toDF("u", "op", "tm").repartition(7)
      .select(col("u"), col("op"),
        org.apache.spark.sql.functions.timestamp_micros(col("tm")).as("ts"))
    df.createOrReplaceTempView("seq_count_events")
    val sql = spark.sql(
      s"""SELECT CAST(u AS STRING) AS key,
                 sequence_count(${6 * H}, ts,
                   op = 'signup', op = 'click', op = 'purchase') AS n
          FROM seq_count_events GROUP BY u""")
      .as[(String, Long)].collect().toMap
    val lib = Behavior.sequenceCount(df, "u", "op", "ts",
      Seq("signup", "click", "purchase"), 6 * H)
      .as[(String, Long)].collect().toMap
    assert(sql == lib)
    // hand case: two disjoint chains; the middle 'signup' repeat
    // refreshes the gap clock, making the second chain possible
    val hand = Seq(
      (1L, "signup", 0L), (1L, "click", H), (1L, "purchase", 2 * H),
      (1L, "signup", 3 * H), (1L, "signup", 9 * H),
      (1L, "click", 13 * H), (1L, "purchase", 14 * H))
      .toDF("u", "op", "tm")
      .select(col("u"), col("op"),
        org.apache.spark.sql.functions.timestamp_micros(col("tm")).as("ts"))
    hand.createOrReplaceTempView("seq_count_hand")
    assert(spark.sql(s"""SELECT sequence_count(${6 * H}, ts,
        op = 'signup', op = 'click', op = 'purchase')
      FROM seq_count_hand""").head().getLong(0) == 2L)
    // with ties present the SQL form is still partitioning-deterministic
    // (total (ts, mask) order at eval)
    val tied = (1 to 300).map(i => (i % 9L, ops(i % 4),
      (i % 11L) * 600L * 1000000))
    val tdf = tied.toDF("u", "op", "tm")
      .select(col("u"), col("op"),
        org.apache.spark.sql.functions.timestamp_micros(col("tm")).as("ts"))
    def runTied(np: Int) = {
      tdf.repartition(np).createOrReplaceTempView("seq_count_tied")
      spark.sql(s"""SELECT u, sequence_count(${6 * H}, ts,
          op = 'signup', op = 'click', op = 'purchase') AS n
        FROM seq_count_tied GROUP BY u""")
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    }
    assert(runTied(1) == runTied(13))
  }

  test("sequence_match_pattern in SQL equals the DataFrame range-frame DP, ties included") {
    import graft.operators.Behavior
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    val H = 3600L * 1000000
    // value-interval semantics (lo >= 1) make the answer tie-INDEPENDENT,
    // so equality is pinned on a log WITH same-instant collisions
    val rnd = new scala.util.Random(97)
    val ops = Seq("view", "signup", "click", "purchase")
    val rows = (for (u <- 1L to 60L) yield {
      (0 until 30).map(_ => (u, ops(rnd.nextInt(4)),
        rnd.nextInt(200).toLong * 600L * 1000000)) // coarse grid: many ties
    }).flatten
    val df = rows.toDF("u", "op", "tm").repartition(7)
      .select(col("u"), col("op"),
        org.apache.spark.sql.functions.timestamp_micros(col("tm")).as("ts"))
    df.createOrReplaceTempView("seq_pattern_events")
    val pattern = s"(?1)(?t>=${H / 2})(?t<=${6 * H})(?2).*(?3)"
    val viaSql = spark.sql(
      s"""SELECT u, sequence_match_pattern('$pattern', ts,
            op = 'signup', op = 'click', op = 'purchase') AS matched
          FROM seq_pattern_events GROUP BY u""")
      .as[(Long, Boolean)].collect().toMap
    val viaLib = Behavior.sequenceMatchPattern(df, "u", "op", "ts", pattern,
        Seq("signup", "click", "purchase"))
      .as[(Long, Boolean)].collect().toMap
    assert(viaSql == viaLib)
    assert(viaSql.values.exists(identity) && viaSql.values.exists(!_),
      "degenerate fixture: all keys agree")
    // hand min-gap case through SQL
    Seq((1L, "signup", 0L), (1L, "click", H / 4), // too close: no match
      (2L, "signup", 0L), (2L, "click", H)) // inside [30min, 6h]: match
      .toDF("u", "op", "tm")
      .select(col("u"), col("op"),
        org.apache.spark.sql.functions.timestamp_micros(col("tm")).as("ts"))
      .createOrReplaceTempView("seq_pattern_hand")
    val hand = spark.sql(
      s"""SELECT u, sequence_match_pattern('(?1)(?t>=${H / 2})(?t<=${6 * H})(?2)',
            ts, op = 'signup', op = 'click') AS matched
          FROM seq_pattern_hand GROUP BY u""")
      .as[(Long, Boolean)].collect().toMap
    assert(hand == Map(1L -> false, 2L -> true))
    // bad patterns fail loudly at registration
    val e = intercept[Exception](spark.sql(
      """SELECT sequence_match_pattern('(?1)(?9)', ts, op = 'a', op = 'b')
         FROM seq_pattern_hand""").collect())
    assert(e.getMessage.contains("outside"))
  }

  test("stat aggregates reject non-integral measurement columns at analysis") {
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    Seq((1.5, true, 2L)).toDF("yd", "c", "x")
      .createOrReplaceTempView("stat_type_guard")
    // a DoubleType measurement would be silently truncated toward zero by
    // the cents-convention longValue coercion — must fail loudly instead
    for (q <- Seq(
      "SELECT welch_ttest(yd, c, NOT c) FROM stat_type_guard",
      "SELECT student_ttest(yd, c, NOT c) FROM stat_type_guard",
      "SELECT mann_whitney_u(yd, c, NOT c) FROM stat_type_guard",
      "SELECT kolmogorov_smirnov(yd, c, NOT c) FROM stat_type_guard",
      "SELECT rank_corr(x, yd) FROM stat_type_guard",
      "SELECT simple_linreg(x, yd) FROM stat_type_guard",
      "SELECT anova_f(yd, x) FROM stat_type_guard")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(q).collect())
      assert(e.getMessage.contains("integral-valued"), s"query: $q → ${e.getMessage}")
    }
    // non-boolean condition also rejected
    val e2 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT welch_ttest(x, x, x) FROM stat_type_guard").collect())
    assert(e2.getMessage.contains("boolean"))
  }

  test("squared-moment overflow fails loudly instead of wrapping") {
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    // y ≈ 3.1e9 ⇒ y² ≈ 9.6e18 > Long.MaxValue: a wrapping sum would
    // return a plausible-but-wrong slope; the exact ops must throw
    Seq((1L, 3100000000L), (2L, 3100000001L), (3L, 3100000002L))
      .toDF("x", "y").createOrReplaceTempView("stat_overflow")
    val e = intercept[Exception](
      spark.sql("SELECT simple_linreg(x, y) FROM stat_overflow").collect())
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.isInstanceOf[ArithmeticException]),
      s"expected ArithmeticException in cause chain, got $e")
  }

  test("anova_f groups binary columns by content, not identity") {
    import spark.implicits._
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    // two logical groups, every row a FRESH byte array: an identity-keyed
    // (toString) map would see one group per row → wrong F / null
    val rows = (1 to 40).map(i => (if (i % 2 == 0) "g1" else "g2", (i % 7 + 1).toLong))
    rows.toDF("g", "y").selectExpr("CAST(g AS BINARY) AS g", "y")
      .createOrReplaceTempView("anova_binary")
    rows.toDF("g", "y").createOrReplaceTempView("anova_string")
    val viaBin = spark.sql(
      "SELECT anova_f(y, g) AS af FROM anova_binary")
      .selectExpr("af.f", "af.df_between", "af.df_within").collect()(0)
    val viaStr = spark.sql(
      "SELECT anova_f(y, g) AS af FROM anova_string")
      .selectExpr("af.f", "af.df_between", "af.df_within").collect()(0)
    assert(viaBin.getLong(1) == 1L && viaBin.getLong(2) == 38L)
    assert(viaBin.getDouble(0) == viaStr.getDouble(0))
  }

  test("text_stats SQL scalar equals the Column kernel; media_info reads FLAC") {
    import spark.implicits._
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    Seq((1L, "Hello world. This is great stuff!"), (2L, "xyz 123"))
      .toDF("id", "text").createOrReplaceTempView("ts_docs")
    val viaSql = spark.sql(
      "SELECT id, text_stats(text) AS st FROM ts_docs ORDER BY id")
      .selectExpr("st[0]", "st[1]", "st[2]")
      .as[(Long, Long, Long)].collect().toSeq
    assert(viaSql == Seq((6L, 2L, 7L), (1L, 1L, 1L)))
    // the media_info scalar dispatches through the same parse chain the
    // probe uses — a FLAC payload resolves without any new SQL surface
    val flac = graft.operators.MediaHeader.flacHeader(16000, 2, 16, 32000L)
    Seq(Tuple1(flac)).toDF("payload").createOrReplaceTempView("ts_flac")
    val mi = spark.sql(
      """SELECT media_info(payload).format AS f,
                media_info(payload).channels AS ch,
                media_info(payload).sample_rate_hz AS r,
                media_info(payload).duration_ms AS d
         FROM ts_flac""").collect()(0)
    assert(mi.getString(0) == "flac" && mi.getInt(1) == 2 &&
      mi.getInt(2) == 16000 && mi.getLong(3) == 2000L)
  }
}
