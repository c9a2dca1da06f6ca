package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample hypothesis tests and association measures — the ClickHouse
  * `studentTTest` / `welchTTest` / `mannWhitneyUTest` / `cramersV` family
  * (reference target: the ClickHouse warehouse the mirror feeds;
  * docker-compose.yml:38-53), re-expressed as single grouped Spark passes.
  * These are the drift detectors a CDC mirror runs against its source: "did
  * the value distribution of A/B arms diverge", "is event mix independent
  * of hour-of-day".
  *
  * Cross-engine determinism strategy (the `lineitem_corr` decimal-moment
  * pattern): every sum the shuffle performs is an exact integer sum —
  * counts and first moments in int64, squared/cross moments in
  * decimal(38,0) (see [[xprod]]) so no product can wrap — of
  * integer-encoded values (cents, doubled ranks, tie cubes, cell counts),
  * which is order-independent by construction; the statistic itself is one
  * fixed scalar expression tree over those exact sums, so any IEEE-754
  * engine reproduces the same doubles bit-for-bit. Nothing order-dependent
  * is ever summed in floating point, which is what lets a DuckDB oracle
  * hash-match the distributed answer.
  *
  * Scale shape: t-tests are ONE map-side-combined `groupBy(bucket)` over
  * six conditional integer moments (state = 6 longs per bucket);
  * Mann-Whitney compresses the log to the (bucket, distinct value) grain
  * FIRST — one hash aggregation — and only then ranks, so the window sort
  * is over distinct values, not rows; the contingency table aggregates
  * once at cell grain and joins broadcast margins. No self-joins, no
  * per-row windows over the raw log.
  */
object StatTests {

  private def d(c: Column): Column = c.cast("double")

  /** Exact wide-integer product for squared/cross moments. A long×long
    * product can reach ~8.5e37 — past int64 but always inside
    * decimal(38,0) — so casting both factors to decimal(19,0) FIRST makes
    * the multiply exact by construction, and the decimal sum stays an
    * exact order-independent integer until ~1e38 (where Spark nulls the
    * sum rather than wrapping — loud, not wrong). This is what keeps the
    * squared moments honest at 100 TB row counts where a raw int64
    * Σy² wraps silently (e.g. cents-scale values overflow int64 past
    * ~1e5 rows/group).
    */
  private def xprod(a: Column, b: Column): Column =
    a.cast("decimal(19,0)") * b.cast("decimal(19,0)")

  /** The rank-family cardinality valve ([[binaryAuc]]'s `binScale` idiom,
    * shared by [[mannWhitneyU]] / [[ksTest]] / [[spearmanCorr]]): 0 keeps
    * the exact integral value; > 0 bins it as `floor(v·binScale)` — an
    * exact IEEE multiply+floor, so any engine bins identically — bounding
    * the per-bucket distinct-value grain the rank windows sort at
    * (value range)·binScale for near-continuous measurements.
    */
  private def binned(v: Column, binScale: Double): Column = {
    require(binScale >= 0.0, s"binScale must be >= 0, got $binScale")
    if (binScale > 0) floor(v.cast("double") * lit(binScale)).cast("long")
    else v.cast("long")
  }

  /** Student's (pooled) and Welch's (unpooled) two-sample t-test between
    * rows matching `condA` and rows matching `condB`, per `bucket` —
    * ClickHouse `studentTTest(value, sample_index)` /
    * `welchTTest(value, sample_index)` with a GROUP BY.
    *
    * `cents` must be an integral-valued column (scaled measurements):
    * the aggregation sums it and its square as exact int64 moments, then
    * evaluates both statistics from the six moments. Means are reported on
    * the cents scale / 100. Buckets where either side has < 2 samples, or
    * where both sample variances vanish, are dropped (the statistic is
    * undefined there).
    */
  def abTTest(events: DataFrame, bucket: Column, condA: Column, condB: Column,
              cents: Column): DataFrame =
    tStatsFromMoments(
      events
        .select(bucket.as("bucket"), condA.as("a"), condB.as("b"),
          cents.cast("long").as("y"))
        // null measurements carry no moment — dropping the row keeps n and
        // Σy consistent (a null inside sum() would skip Σy but not n)
        .where((col("a") || col("b")) && col("y").isNotNull)
        .groupBy(col("bucket"))
        .agg(abMoments.head, abMoments.tail: _*))

  /** The six conditional integer-moment aggregates (n, Σy, Σy² per arm)
    * the t statistics derive from — exact int64 partial-aggregable sums,
    * usable in a batch `groupBy` and, unchanged, in a watermarked
    * streaming window aggregation (see `streaming/DriftStream`). Input
    * frame must carry `a`, `b`, `y` columns.
    */
  def abMoments: Seq[Column] = Seq(
    sum(when(col("a"), 1L).otherwise(0L)).as("na"),
    sum(when(col("a"), col("y")).otherwise(0L)).as("s1a"),
    sum(when(col("a"), xprod(col("y"), col("y")))
      .otherwise(lit(0).cast("decimal(38,0)"))).as("s2a"),
    sum(when(col("b"), 1L).otherwise(0L)).as("nb"),
    sum(when(col("b"), col("y")).otherwise(0L)).as("s1b"),
    sum(when(col("b"), xprod(col("y"), col("y")))
      .otherwise(lit(0).cast("decimal(38,0)"))).as("s2b"))

  /** Evaluates both t statistics from a frame of exact integer moments
    * (`na,s1a,s2a,nb,s1b,s2b`; any other columns pass through as the
    * grouping identity) — the fixed scalar tree shared by the batch
    * [[abTTest]] and the streaming drift monitor, so both paths agree by
    * construction. Rows where either side has < 2 samples or a variance
    * vanishes are dropped (the statistic is undefined there).
    */
  def tStatsFromMoments(moments: DataFrame): DataFrame = {
    val momentCols = Set("na", "s1a", "s2a", "nb", "s1b", "s2b")
    val keep = moments.columns.filterNot(momentCols).map(col).toSeq
    val m = moments.where(col("na") >= 2 && col("nb") >= 2)
    val na = d(col("na")); val nb = d(col("nb"))
    val ma = d(col("s1a")) / na
    val mb = d(col("s1b")) / nb
    // sample variance from exact moments: (Σy² − (Σy)²/n) / (n−1), every
    // operand an exact integer cast once to double
    val va = (d(col("s2a")) - d(col("s1a")) * d(col("s1a")) / na) / (na - lit(1.0))
    val vb = (d(col("s2b")) - d(col("s1b")) * d(col("s1b")) / nb) / (nb - lit(1.0))
    val vna = va / na
    val vnb = vb / nb
    val se2 = vna + vnb
    val welchT = (ma - mb) / sqrt(se2)
    val welchDf = se2 * se2 /
      (vna * vna / (na - lit(1.0)) + vnb * vnb / (nb - lit(1.0)))
    val sp2 = ((na - lit(1.0)) * va + (nb - lit(1.0)) * vb) /
      (na + nb - lit(2.0))
    val studentT = (ma - mb) / sqrt(sp2 * (lit(1.0) / na + lit(1.0) / nb))
    m.where(se2 > 0 && sp2 > 0)
      .select(keep ++ Seq(col("na"), col("nb"),
        round(ma / 100.0, 6).as("mean_a"),
        round(mb / 100.0, 6).as("mean_b"),
        round(welchT, 6).as("welch_t"),
        round(welchDf, 6).as("welch_df"),
        round(studentT, 6).as("student_t"),
        (col("na") + col("nb") - 2L).as("student_df")): _*)
  }

  /** Mann-Whitney U rank-sum test (two-sided normal approximation with
    * tie correction) between `condA` and `condB` rows per `bucket` —
    * ClickHouse `mannWhitneyUTest(value, sample_index)` with a GROUP BY.
    *
    * Rank bookkeeping happens at the (bucket, distinct value) grain:
    * doubled average ranks `2·r̄ = 2·(count before) + ties + 1` are exact
    * integers, so the rank sum, U, and the tie term Σ(t³−t) are all exact
    * int64 sums. `u1` is the U statistic of the A side (a half-integer);
    * `z` is `(U₁ − n₁n₂/2) / σ` with
    * `σ² = n₁n₂/12 · ((n+1) − Σ(t³−t)/(n(n−1)))`. Buckets where either
    * side is empty or σ = 0 (all values tied) are dropped.
    *
    * CARDINALITY CONTRACT: the rank window runs per (bucket, DISTINCT
    * value) — bounded-range integer measurements (cents) keep it far
    * below row count, but a near-continuous measurement makes one
    * bucket's value grain approach its row count and that bucket's sort
    * lands on one task. `binScale` is the [[binaryAuc]] idiom for that
    * case: when > 0 the value becomes `floor(y·binScale)` (an exact IEEE
    * multiply+floor — any engine bins identically), bounding the grain at
    * (value range)·binScale; binning = coarser ties, handled by the tie
    * correction. 0 (default) keeps the exact ungrouped test.
    */
  def mannWhitneyU(events: DataFrame, bucket: Column, condA: Column,
                   condB: Column, cents: Column,
                   binScale: Double = 0.0): DataFrame = {
    val perVal = events
      .select(bucket.as("bucket"), condA.as("a"), condB.as("b"),
        binned(cents, binScale).as("y"))
      .where((col("a") || col("b")) && col("y").isNotNull)
      .groupBy(col("bucket"), col("y"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("b"), 1L).otherwise(0L)).as("cb"))
      .withColumn("cn", col("ca") + col("cb"))
    val byY = Window.partitionBy(col("bucket")).orderBy(col("y"))
    val cumBefore = coalesce(
      sum(col("cn")).over(byY.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val agg = perVal
      .withColumn("__r2", lit(2L) * cumBefore + col("cn") + lit(1L))
      .groupBy(col("bucket"))
      .agg(sum(col("ca")).as("n1"), sum(col("cb")).as("n2"),
        sum(xprod(col("ca"), col("__r2"))).as("r1x2"),
        // cube in decimal: (12,0)³ → (38,0), exact below 1e12 ties per
        // value (beyond that the cast nulls loudly rather than wrapping)
        sum(col("cn").cast("decimal(12,0)") * col("cn").cast("decimal(12,0)")
          * col("cn").cast("decimal(12,0)") - col("cn")).as("tsum"))
      .where(col("n1") >= 1 && col("n2") >= 1)
    val n1 = d(col("n1")); val n2 = d(col("n2")); val n = n1 + n2
    // U₁ = R₁ − n₁(n₁+1)/2, carried doubled to stay integral
    val u1x2 = col("r1x2") - xprod(col("n1"), col("n1") + lit(1L))
    val u1 = d(u1x2) / 2.0
    val sigma2 = n1 * n2 / lit(12.0) *
      ((n + lit(1.0)) - d(col("tsum")) / (n * (n - lit(1.0))))
    val z = (u1 - n1 * n2 / lit(2.0)) / sqrt(sigma2)
    agg.where(sigma2 > 0)
      .select(col("bucket"), col("n1"), col("n2"), u1.as("u1"),
        round(z, 6).as("z"))
  }

  /** Two-sample Kolmogorov-Smirnov test between `condA` and `condB` rows
    * per `bucket` — ClickHouse `kolmogorovSmirnovTest(value, sample_index)`
    * with a GROUP BY.
    *
    * Exactness: the supremum is taken over INTEGER cross-scaled CDF gaps —
    * at each distinct value, `|cumA·n₂ − cumB·n₁|` is an exact int64
    * (max |gap| ≤ n₁·n₂), so `max()` is order-independent and
    * D = max_gap / (n₁·n₂) is one deterministic division. The p-value is
    * the standard asymptotic Kolmogorov series at fixed depth 3,
    * `p ≈ 2(e^{−2λ²} − e^{−8λ²} + e^{−18λ²})` with
    * `λ = √(n₁n₂/(n₁+n₂))·D`, clamped to [0,1] — a fixed scalar tree any
    * IEEE engine reproduces bit-for-bit.
    *
    * Scale shape: same as [[mannWhitneyU]] — compress to the (bucket,
    * distinct value) grain FIRST (one map-side-combined hash aggregation),
    * then the window sort runs over distinct values, not rows, and the
    * same cardinality contract applies: `binScale > 0` bins the value
    * (`floor(y·binScale)`, exact IEEE) for near-continuous measurements
    * whose distinct grain approaches row count — the CDF steps coarsen,
    * D is computed on the binned distributions (a documented
    * approximation); 0 keeps the exact test.
    */
  def ksTest(events: DataFrame, bucket: Column, condA: Column, condB: Column,
             cents: Column, binScale: Double = 0.0): DataFrame = {
    val perVal = events
      .select(bucket.as("bucket"), condA.as("a"), condB.as("b"),
        binned(cents, binScale).as("y"))
      .where((col("a") || col("b")) && col("y").isNotNull)
      .groupBy(col("bucket"), col("y"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("b"), 1L).otherwise(0L)).as("cb"))
    val byY = Window.partitionBy(col("bucket")).orderBy(col("y"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // the gap needs the bucket totals, which the window pass doesn't have
    // yet — so take the max AFTER joining totals back at distinct-value
    // grain (broadcast: one row per bucket)
    val totals = perVal.groupBy(col("bucket"))
      .agg(sum(col("ca")).as("n1"), sum(col("cb")).as("n2"))
      .where(col("n1") >= 1 && col("n2") >= 1)
    val gaps = perVal
      .withColumn("__cuma", sum(col("ca")).over(byY))
      .withColumn("__cumb", sum(col("cb")).over(byY))
      .join(broadcast(totals), "bucket")
      .groupBy(col("bucket"))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(abs(xprod(col("__cuma"), col("n2"))
          - xprod(col("__cumb"), col("n1")))).as("maxgap"))
    val n1 = d(col("n1")); val n2 = d(col("n2"))
    val dStat = d(col("maxgap")) / (n1 * n2)
    val lambda = sqrt(n1 * n2 / (n1 + n2)) * dStat
    val l2 = lambda * lambda
    val p = lit(2.0) * (exp(lit(-2.0) * l2) - exp(lit(-8.0) * l2)
      + exp(lit(-18.0) * l2))
    gaps.select(col("bucket"), col("n1"), col("n2"),
      round(dStat, 6).as("ks_d"),
      round(least(lit(1.0), greatest(lit(0.0), p)), 6).as("p_asymp"))
  }

  /** Spearman rank correlation between two integral-valued columns per
    * `bucket` — ClickHouse `rankCorr(x, y)` with a GROUP BY, ties handled
    * by average ranks (the fractional variant).
    *
    * Rank bookkeeping rides the [[mannWhitneyU]] doubled-average-rank
    * trick at the (bucket, distinct value) grain — `2·r̄` is an exact
    * integer — and each row picks up its two doubled ranks via joins
    * against the two rank maps. All five rank moments are exact int64
    * sums of doubled-rank products (the ×4 scale cancels in ρ), so the
    * statistic is one fixed scalar tree over exact integers.
    *
    * Scale shape: two hash aggregations at distinct-value grain + two
    * shuffle joins on the value columns + one map-side-combined moment
    * aggregation. No per-row global sort — but the per-bucket rank
    * windows carry the family's cardinality contract: `binScale > 0`
    * bins BOTH variables (`floor(v·binScale)`, exact IEEE) when a
    * near-continuous measurement would push one bucket's distinct grain
    * toward its row count; binning = coarser rank ties (averaged, the
    * fractional variant's own semantics). 0 keeps the exact statistic.
    */
  def spearmanCorr(events: DataFrame, bucket: Column, xInt: Column,
                   yInt: Column, binScale: Double = 0.0): DataFrame = {
    val base = events
      .select(bucket.as("bucket"), binned(xInt, binScale).as("x"),
        binned(yInt, binScale).as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
    def rankMap(c: String): DataFrame = {
      val byV = Window.partitionBy(col("bucket")).orderBy(col(c))
      val cumBefore = coalesce(
        sum(col("cn")).over(byV.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L))
      base.groupBy(col("bucket"), col(c))
        .agg(count(lit(1)).as("cn"))
        .withColumn(s"__r2$c", lit(2L) * cumBefore + col("cn") + lit(1L))
        .drop("cn")
    }
    val ranked = base
      .join(rankMap("x"), Seq("bucket", "x"))
      .join(rankMap("y"), Seq("bucket", "y"))
    val m = ranked.groupBy(col("bucket")).agg(
      count(lit(1)).as("n"),
      sum(col("__r2x")).as("sx"), sum(col("__r2y")).as("sy"),
      sum(xprod(col("__r2x"), col("__r2y"))).as("sxy"),
      sum(xprod(col("__r2x"), col("__r2x"))).as("sxx"),
      sum(xprod(col("__r2y"), col("__r2y"))).as("syy"),
      // zero-variance guard via exact extremes — a product guard like
      // n·Σr² ≠ (Σr)² overflows int64 at scale
      min(col("x")).as("xmin"), max(col("x")).as("xmax"),
      min(col("y")).as("ymin"), max(col("y")).as("ymax"))
      .where(col("n") >= 2 &&
        col("xmin") =!= col("xmax") && col("ymin") =!= col("ymax"))
    val n = d(col("n"))
    val cov = n * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val vx = n * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val vy = n * d(col("syy")) - d(col("sy")) * d(col("sy"))
    m.select(col("bucket"), col("n"),
      round(cov / sqrt(vx * vy), 6).as("rho"))
  }

  /** Per-bucket simple linear regression of `cents` on `xInt` — ClickHouse
    * `simpleLinearRegression(x, y)` with a GROUP BY, plus R². Five exact
    * int64 moments (Σx, Σy, Σxy, Σx², Σy²) per bucket in ONE map-side-
    * combined aggregation; slope/intercept/R² are a fixed scalar tree over
    * them. Buckets with < 2 points or zero x-variance are dropped.
    */
  def linReg(events: DataFrame, bucket: Column, xInt: Column,
             cents: Column): DataFrame = {
    val m = events
      .select(bucket.as("bucket"), xInt.cast("long").as("x"),
        cents.cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .groupBy(col("bucket")).agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(xprod(col("x"), col("y"))).as("sxy"),
        sum(xprod(col("x"), col("x"))).as("sxx"),
        sum(xprod(col("y"), col("y"))).as("syy"),
        // zero-variance guards via exact extremes — a product guard like
        // n·Σx² ≠ (Σx)² overflows int64 at scale
        min(col("x")).as("xmin"), max(col("x")).as("xmax"),
        min(col("y")).as("ymin"), max(col("y")).as("ymax"))
      .where(col("n") >= 2 && col("xmin") =!= col("xmax"))
    val n = d(col("n"))
    val cov = n * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val vx = n * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val vy = n * d(col("syy")) - d(col("sy")) * d(col("sy"))
    val slope = cov / vx
    val intercept = (d(col("sy")) - slope * d(col("sx"))) / n
    // cents scale divides out once at the end: both coefficients report in
    // value units (slope = value units per x unit)
    m.select(col("bucket"), col("n"),
      round(slope / 100.0, 6).as("slope"),
      round(intercept / 100.0, 6).as("intercept"),
      when(col("ymin") =!= col("ymax"),
        round(cov * cov / (vx * vy), 6)).as("r2"))
  }

  /** One-way ANOVA per `bucket` across the groups of `grp` — ClickHouse
    * `analysisOfVariance(value, group)` with a GROUP BY (F statistic and
    * both degrees of freedom; the p-value needs the F distribution's
    * incomplete beta and is intentionally not emitted).
    *
    * Per-(bucket, group) moments (n, Σy, Σy²) are exact int64s; the one
    * float reduction across groups — Σ_g (Σy_g)²/n_g — runs as a window
    * running sum in GROUP-KEY ORDER, so the float additions happen in the
    * same fixed sequence on any engine/partitioning (the cross-engine
    * determinism rule: nothing order-dependent is ever hash-aggregated in
    * floating point). Buckets with < 2 groups, no residual df, or zero
    * within-group variance are dropped.
    */
  def anovaF(events: DataFrame, bucket: Column, grp: Column,
             cents: Column): DataFrame = {
    val g = events
      .select(bucket.as("bucket"), grp.as("grp"), cents.cast("long").as("y"))
      .where(col("y").isNotNull)
      .groupBy(col("bucket"), col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(xprod(col("y"), col("y"))).as("syy"))
    val byG = Window.partitionBy(col("bucket")).orderBy(col("grp"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val withCum = g.withColumn("cumt",
      sum(d(col("sy")) * d(col("sy")) / d(col("n"))).over(byG))
    val agg = withCum.groupBy(col("bucket")).agg(
      count(lit(1)).as("k"), sum(col("n")).as("nn"),
      sum(col("sy")).as("syt"), sum(col("syy")).as("syyt"),
      max_by(col("cumt"), col("grp")).as("tsum"))
      .where(col("k") >= 2 && col("nn") > col("k"))
    val nN = d(col("nn"))
    val ssb = col("tsum") - d(col("syt")) * d(col("syt")) / nN
    val ssw = d(col("syyt")) - col("tsum")
    val dfb = d(col("k")) - lit(1.0)
    val dfw = nN - d(col("k"))
    agg.where(ssw > 0)
      .select(col("bucket"), col("k"), col("nn").as("n"),
        round((ssb / dfb) / (ssw / dfw), 6).as("f_stat"),
        (col("k") - 1L).as("df_between"),
        (col("nn") - col("k")).as("df_within"))
  }

  /** Bartlett's test of variance homogeneity across groups per bucket —
    * [[anovaF]]'s precondition check (the F-test assumes equal group
    * variances; Bartlett is the classic readout of whether that holds):
    * χ² = [(N−k)·ln s_p² − Σ(nᵢ−1)·ln sᵢ²] / C with
    * C = 1 + (Σ 1/(nᵢ−1) − 1/(N−k)) / (3(k−1)), df = k−1.
    *
    * Determinism: per-(bucket, group) moments are exact integers in one
    * map-side-combined pass; the three cross-group double folds (weighted
    * variances, weighted log-variances, reciprocal dfs) each accumulate
    * in a CUMULATIVE window ordered by the group key — [[anovaF]]'s
    * fixed-order idiom, IEEE-deterministic — finished by `max_by(·, grp)`.
    * Buckets where ANY group is degenerate (n < 2 or zero variance — ln
    * undefined) drop whole and loudly in the row count rather than
    * silently re-weighting the test over a group subset. Output: bucket,
    * k, n, chi2 (6dp), df.
    */
  def bartlett(events: DataFrame, bucket: Column, grp: Column,
               cents: Column): DataFrame = {
    val g = events
      .select(bucket.as("bucket"), grp.as("grp"), cents.cast("long").as("y"))
      .where(col("y").isNotNull)
      .groupBy(col("bucket"), col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(xprod(col("y"), col("y"))).as("syy"))
    val nd = d(col("n"))
    val sv = (d(col("syy")) - d(col("sy")) * d(col("sy")) / nd) / (nd - 1.0)
    val staged = g.withColumn("sv", sv)
      .withColumn("ok", col("n") >= 2 && col("sv") > 0.0)
    val byG = Window.partitionBy(col("bucket")).orderBy(col("grp"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val withCum = staged
      .withColumn("ca", sum((nd - 1.0) * col("sv")).over(byG))
      .withColumn("cb", sum((nd - 1.0) * log(col("sv"))).over(byG))
      .withColumn("cc", sum(lit(1.0) / (nd - 1.0)).over(byG))
    val agg = withCum.groupBy(col("bucket")).agg(
      count(lit(1)).as("k"), sum(col("n")).as("nn"),
      min(col("ok").cast("int")).as("allok"),
      max_by(col("ca"), col("grp")).as("a"),
      max_by(col("cb"), col("grp")).as("b"),
      max_by(col("cc"), col("grp")).as("c"))
      .where(col("allok") === 1 && col("k") >= 2 &&
        col("nn") > col("k"))
    val nk = d(col("nn")) - d(col("k"))
    val chi = (nk * log(col("a") / nk) - col("b")) /
      (lit(1.0) + (col("c") - lit(1.0) / nk) /
        (lit(3.0) * (d(col("k")) - 1.0)))
    agg.select(col("bucket"), col("k"), col("nn").as("n"),
      round(chi, 6).as("chi2"), (col("k") - 1L).as("df"))
  }

  /** Pearson χ² contingency decomposition between two categorical
    * columns — the table behind ClickHouse `cramersV(a, b)` /
    * `theilsU(a, b)`, kept at cell grain so every output value is a fixed
    * scalar expression over exact integer counts (a single summed χ² or V
    * would order-depend on float addition across cells; the per-cell
    * decomposition is deterministic AND more useful operationally — it
    * shows WHICH cell drifted). Cramér's V is Σ chi2_term over this frame
    * divided by n·(min(r,c)−1), square-rooted — see StatTestsSpec.
    *
    * One hash aggregation at cell grain; row/column margins re-aggregate
    * from the cells (margin grain, tiny) and join back broadcast.
    */
  def contingencyChi2(events: DataFrame, rowC: Column, colC: Column): DataFrame = {
    val cells = events.groupBy(rowC.as("r"), colC.as("c"))
      .agg(count(lit(1)).as("observed"))
    val rowTot = cells.groupBy(col("r")).agg(sum(col("observed")).as("rt"))
    val colTot = cells.groupBy(col("c")).agg(sum(col("observed")).as("ct"))
    val tot = cells.agg(sum(col("observed")).as("n"))
    val expected = d(col("rt")) * d(col("ct")) / d(col("n"))
    val dev = d(col("observed")) - expected
    cells.join(broadcast(rowTot), "r").join(broadcast(colTot), "c")
      .crossJoin(broadcast(tot))
      .select(col("r"), col("c"), col("observed"),
        round(expected, 6).as("expected"),
        round(dev * dev / expected, 6).as("chi2_term"))
  }

  /** Cramér's V — ClickHouse `cramersV(x, y)` / `cramersVBiasCorrected`:
    * the SYMMETRIC association scalar over [[contingencyChi2]]'s cells,
    * V = √(χ²/(N·(min(R,C)−1))), plus the Bergsma bias-corrected variant
    * (φ²₊ = max(0, φ² − (R−1)(C−1)/(N−1)) over shrunk level counts) that
    * doesn't inflate on sparse tables. The per-cell decomposition
    * ([[contingencyChi2]]) stays the drill-down; this is the headline
    * number a dashboard thresholds.
    *
    * Exact integer cells/margins; the χ² fold is an order-sensitive
    * double sum, so it rides the same NESTED fixed-order cumulative
    * windows as [[theilsU]] (per-r over c, then over r — scalar max_by
    * keys, oracle-mirrorable). Output one row: n, r_levels, c_levels,
    * chi2, v, v_corrected (6dp). Single-level inputs drop loudly.
    */
  def cramersV(events: DataFrame, rowC: Column, colC: Column): DataFrame = {
    val cells = events.groupBy(rowC.as("r"), colC.as("c"))
      .agg(count(lit(1)).as("o"))
    val byR = Window.partitionBy(col("r"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val byC = Window.partitionBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val term = {
      val e = d(col("rm")) * d(col("cm")) / d(col("nn"))
      (d(col("o")) - e) * (d(col("o")) - e) / e
    }
    val nCols = cells.agg(count_distinct(col("c")).as("nc"))
    val perR = cells
      .withColumn("rm", sum(col("o")).over(byR))
      .withColumn("cm", sum(col("o")).over(byC))
      .withColumn("nn", sum(col("o")).over(all))
      .crossJoin(broadcast(nCols))
      .withColumn("chi_cum", sum(term).over(
        Window.partitionBy(col("r")).orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("r"))
      .agg(max(col("nn")).as("nn"), max(col("nc")).as("nc"),
        max_by(col("chi_cum"), col("c")).as("chir"))
    val folded = perR
      .withColumn("cum", sum(col("chir")).over(
        Window.orderBy(col("r")).rowsBetween(Window.unboundedPreceding, 0)))
      .agg(max(col("nn")).as("n"), count(lit(1)).as("nr"),
        max(col("nc")).as("ncl"), max_by(col("cum"), col("r")).as("chi2"))
      .where(col("nr") >= 2 && col("ncl") >= 2)
    val nd = d(col("n"))
    val rd = d(col("nr"))
    val cd = d(col("ncl"))
    val v = sqrt(col("chi2") / (nd * (least(rd, cd) - 1.0)))
    val phi2 = col("chi2") / nd
    val phi2p = greatest(lit(0.0),
      phi2 - (rd - 1.0) * (cd - 1.0) / (nd - 1.0))
    val rT = rd - (rd - 1.0) * (rd - 1.0) / (nd - 1.0)
    val cT = cd - (cd - 1.0) * (cd - 1.0) / (nd - 1.0)
    folded.select(col("n"), col("nr").as("r_levels"),
      col("ncl").cast("long").as("c_levels"),
      round(col("chi2"), 6).as("chi2"), round(v, 6).as("v"),
      round(sqrt(phi2p / (least(rT, cT) - 1.0)), 6).as("v_corrected"))
  }

  /** Theil's uncertainty coefficient U(X|Y) — ClickHouse `theilsU(x, y)`:
    * the ASYMMETRIC association readout [[contingencyChi2]]'s scaladoc
    * promises — what fraction of X's entropy does knowing Y remove,
    * U = (H(X) − H(X|Y)) / H(X) ∈ [0, 1]. Unlike Cramér's V it tells you
    * the DIRECTION of predictability (hour may predict event type while
    * type says little about hour).
    *
    * Exact integer cell/margin counts from one cell-grain aggregation;
    * the two entropy folds are order-sensitive double sums, so each rides
    * a CUMULATIVE window in a FIXED key order (the [[anovaF]] idiom) —
    * H(X|Y) over cells ordered by (r, c), H(X) over the row margins
    * ordered by r — finished by `max_by`. Output one row: n, h_x,
    * h_x_given_y, theils_u (6dp, natural log). Degenerate inputs (H(X)=0:
    * one distinct X) drop loudly.
    */
  def theilsU(events: DataFrame, rowC: Column, colC: Column): DataFrame = {
    val cells = events.groupBy(rowC.as("r"), colC.as("c"))
      .agg(count(lit(1)).as("o"))
    val byC = Window.partitionBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    // H(X|Y) = −Σ_{r,c} (o/N)·ln(o/cm) — two NESTED fixed-order folds
    // (per-r over c, then over r), every max_by key scalar so the oracle
    // mirrors with plain arg_max
    val perR = cells
      .withColumn("cm", sum(col("o")).over(byC))
      .withColumn("nn", sum(col("o")).over(all))
      .withColumn("hr_cum", sum((d(col("o")) / d(col("nn"))) *
        log(d(col("o")) / d(col("cm"))))
        .over(Window.partitionBy(col("r")).orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("r"))
      .agg(max(col("nn")).as("nn"), max_by(col("hr_cum"), col("c")).as("hr"))
    val folded = perR
      .withColumn("hxy_cum", sum(col("hr")).over(
        Window.orderBy(col("r")).rowsBetween(Window.unboundedPreceding, 0)))
      .agg(max(col("nn")).as("n"),
        max_by(col("hxy_cum"), col("r")).as("neg_hxy"))
    // H(X) = −Σ_r (rm/N)·ln(rm/N) — fold over row margins ordered by r
    val rm = cells.groupBy(col("r")).agg(sum(col("o")).as("rm"))
      .withColumn("nn", sum(col("rm")).over(all))
      .withColumn("hx_cum", sum((d(col("rm")) / d(col("nn"))) *
        log(d(col("rm")) / d(col("nn"))))
        .over(Window.orderBy(col("r")).rowsBetween(Window.unboundedPreceding, 0)))
    val hx = rm.agg(max_by(col("hx_cum"), col("r")).as("neg_hx"))
    folded.crossJoin(broadcast(hx))
      .select(col("n"), (lit(0.0) - col("neg_hx")).as("h_x"),
        (lit(0.0) - col("neg_hxy")).as("h_x_given_y"))
      .where(col("h_x") > 0.0)
      .select(col("n"), round(col("h_x"), 6).as("h_x"),
        round(col("h_x_given_y"), 6).as("h_x_given_y"),
        round((col("h_x") - col("h_x_given_y")) / col("h_x"), 6)
          .as("theils_u"))
  }

  /** Exact ROC-AUC of a binary classifier — P(score of a random positive
    * > random negative), ties counting half: the rank-sum (Mann–Whitney)
    * form with AVERAGE ranks, kept integer throughout. Grouping by the
    * DISTINCT score gives per-score (count, positives); one cumulative
    * window over that score-grained frame yields each group's doubled
    * average rank `2·below + c + 1` exactly, so
    * `AUC = (2·Σ_pos rank − nPos(nPos+1)) / (2·nPos·nNeg)` is a single
    * division of exact integers — engine-reproducible bit-for-bit.
    *
    * The window sorts DISTINCT scores (score-cardinality, not row count —
    * real-world scores repeat heavily); at extreme score cardinality, bin
    * the score first and the formula is unchanged (binning = coarser
    * ties). One grouped pass over the rows, everything after is
    * score-grained.
    *
    * `binScale` applies that binning HERE instead of trusting every
    * caller to remember: when > 0 the score becomes
    * `floor(score · binScale)` (an exact IEEE multiply+floor, so any
    * engine bins identically), bounding the window's cardinality at
    * (score range)·binScale regardless of row count — the continuous-
    * double-score case where distinct-score cardinality approaches row
    * count and the unpartitioned cumulative window would otherwise
    * collapse to ONE task at scale. 0 (default) keeps the exact
    * ungrouped-score AUC for already-discrete scores.
    */
  def binaryAuc(df: DataFrame, score: Column, label: Column,
                binScale: Double = 0.0): DataFrame = {
    val sc = if (binScale > 0) floor(score.cast("double") * lit(binScale))
      else score
    val s = df.select(sc.as("s"), when(label, 1L).otherwise(0L).as("y"))
      .where(col("s").isNotNull)
    val g = s.groupBy(col("s"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("p"))
    val below = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cb", coalesce(sum(col("c")).over(below), lit(0L)))
      .agg(sum(col("p")).as("n_pos"),
        (sum(col("c")) - sum(col("p"))).as("n_neg"),
        sum(col("p") * (lit(2) * col("cb") + col("c") + 1)).as("_r2"))
      .select(col("n_pos"), col("n_neg"),
        ((col("_r2") - col("n_pos") * (col("n_pos") + 1)).cast("double")
          / (lit(2.0) * d(col("n_pos")) * d(col("n_neg")))).as("auc"))
  }

  /** Decile lift table of a binary classifier: rows ranked by score DESC
    * into ten exact deciles ([[Ranking.exactNtile]] — no single-partition
    * window), per decile the positive rate and its lift over the global
    * rate. Counts exact; the two divisions compose one double expression,
    * rounded 6dp. `idCol` breaks score ties deterministically.
    */
  def liftTable(df: DataFrame, score: Column, label: Column,
                idCol: Column): DataFrame = {
    val s = df.select(score.as("s"), idCol.as("i"),
      when(label, 1L).otherwise(0L).as("y")).where(col("s").isNotNull)
    val deciled = Ranking.exactNtile(s, 10, Seq(col("s").desc, col("i")),
      "decile")
    val tot = s.agg(count(lit(1)).as("n_all"), sum(col("y")).as("p_all"))
    deciled.groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n"), col("n_pos"),
        round(d(col("n_pos")) / d(col("n")), 6).as("pos_rate"),
        round((d(col("n_pos")) / d(col("n")))
          / (d(col("p_all")) / d(col("n_all"))), 6).as("lift"))
  }

  /** Per-group distribution-shape moments — the ClickHouse `skewPop` /
    * `kurtPop` family as ONE grouped pass over exact integer power sums.
    * `cents` must be an integral-valued column (scaled measurements);
    * skewness and kurtosis are scale-invariant, so the cent scaling
    * cancels and only the reported mean/stddev divide by 100.
    *
    * The four sums: Σy (int64), Σy² / Σy³ / Σy⁴ via [[xprod]] (y² is an
    * exact int64 for |y| < 3e9, then decimal(19,0)×decimal(19,0) products
    * keep y³/y⁴ exact in decimal(38,0) — a cents-scale y⁴ wraps int64 at
    * ONE row, so the wide sums are load-bearing, not defensive). From the
    * exact sums, one fixed scalar tree: mₖ central moments via the
    * binomial expansion, skew_pop = m₃/(m₂·√m₂), kurt_pop = m₄/m₂²
    * (ClickHouse's non-excess convention), kurt_excess = kurt_pop − 3.
    * Groups with n < 2 or zero variance are dropped (shape undefined).
    * State per group = 4 numbers → map-side combine does almost all the
    * work; one shuffle total.
    */
  /** ClickHouse `minSampleSizeConversion`: per group, the minimum per-arm
    * sample size for a two-proportion z-test to detect an absolute `mde`
    * shift in the group's observed share — the "how long must this A/B
    * run" planner. n = (z_{α/2}·√(2·p̄·(1−p̄)) + z_β·√(p(1−p) +
    * p₂(1−p₂)))² / mde², p the group's exact count share, p₂ = p + mde,
    * p̄ their midpoint. The z quantiles arrive as exact double literals
    * (defaults: α=0.05 two-sided, power 0.8) and mde² is computed as a
    * DOUBLE product (never a decimal literal — a decimal 0.0001 casts to
    * a different double than the 0.01² product), so the whole scalar
    * tree is engine-identical over exact counts; one shuffle + a 1-row
    * broadcast total.
    */
  def minSampleSize(df: DataFrame, group: Column, mde: Double,
                    zAlpha: Double = 1.9599639845400545,
                    zBeta: Double = 0.8416212335729143): DataFrame = {
    require(mde > 0 && mde < 1, s"bad mde=$mde")
    val cnt = df.select(group.as("g")).groupBy(col("g"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt.agg(sum(col("n")).as("n_all"))
    val p = d(col("n")) / d(col("n_all"))
    val p2 = p + lit(mde)
    val pbar = (p + p2) / lit(2.0)
    val se = lit(zAlpha) * sqrt(lit(2.0) * pbar * (lit(1.0) - pbar)) +
      lit(zBeta) * sqrt(p * (lit(1.0) - p) + p2 * (lit(1.0) - p2))
    cnt.crossJoin(broadcast(tot))
      // a group whose observed share already satisfies p + mde >= 1 has no
      // valid target proportion p2 < 1 to plan for: p2(1-p2) goes negative,
      // sqrt yields NaN, and min_n_per_arm would silently emit NaN — DROP
      // such groups instead (the proportionsZTest zero-variance convention:
      // an unanswerable planning question produces no row, not a NaN row)
      .where(p + lit(mde) < 1.0)
      .select(col("g"), col("n"), round(p, 6).as("share"),
        ceil(se * se / (lit(mde) * lit(mde))).as("min_n_per_arm"))
  }

  /** CUPED variance reduction for an A/B readout (Deng et al., WSDM'13 —
    * the standard trick every large experimentation platform runs): use
    * each unit's PRE-period metric X as a control variate for its
    * post-period metric Y, reporting the adjusted mean
    * ȳᵥ − θ·(x̄ᵥ − x̄) per variant with θ = cov(X,Y)/var(X) pooled over
    * all units (variant-blind, so the adjustment is unbiased under
    * randomization). The reference stack would run this as a ClickHouse
    * query over the mirrored events table; here it is two grouped passes.
    *
    * Determinism: the experiment window splits at the exact integer
    * microsecond midpoint of the observed span; units are keyed by
    * `unit`, variants by `unit % 2`; X/Y are exact int64 sums of
    * `cents`; all second moments go through [[xprod]] (decimal(38,0),
    * overflow-loud); θ and every output is one fixed scalar tree over
    * those exact sums — engine-identical.
    *
    * Scale shape: shuffle 1 collapses the raw log to the UNIT grain
    * (map-side combined conditional sums); shuffle 2 collapses units to
    * the 2-row variant grain; the pooled moments come from those 2 rows
    * (no third pass over data) and join back broadcast. No per-row
    * windows, no self-joins — the same shape at 10⁹ units as at 10³.
    * Output: variant, n_units, mean_raw, mean_cuped, var_raw, var_cuped,
    * theta (cents scale /100; 6dp).
    */
  def cuped(events: DataFrame, unit: Column, cents: Column,
            ts: Column): DataFrame = {
    val base = events.select(unit.as("u"), cents.cast("long").as("y"),
      ts.cast("long").as("us")).where(col("y").isNotNull)
    val mid = base.agg((min(col("us")) + max(col("us"))).as("mm"))
      .select(expr("mm DIV 2").as("mid_us"))
    // unit grain: pre-period sum X (0 if absent), post-period sum Y;
    // units with no post activity carry no readout and drop out
    val units = base.crossJoin(broadcast(mid))
      .groupBy(col("u"))
      .agg(sum(when(col("us") < col("mid_us"), col("y")).otherwise(0L)).as("x"),
        sum(when(col("us") >= col("mid_us"), col("y")).otherwise(0L)).as("yy"),
        max(when(col("us") >= col("mid_us"), 1L).otherwise(0L)).as("has_post"))
      .where(col("has_post") === 1L)
      .select(col("u"), col("x"), col("yy").as("y"),
        (col("u") % 2).cast("long").as("variant"))
    val byV = units.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(xprod(col("x"), col("x"))).as("sxx"),
        sum(xprod(col("x"), col("y"))).as("sxy"),
        sum(xprod(col("y"), col("y"))).as("syy"))
    // pooled moments over all units = exact sums of the 2 variant rows
    val pooled = byV.agg(sum(col("n")).as("n_all"), sum(col("sx")).as("gx"),
      sum(col("sy")).as("gy"), sum(col("sxx")).as("gxx"),
      sum(col("sxy")).as("gxy"))
    val nAll = d(col("n_all"))
    val covXY = (d(col("gxy")) - d(col("gx")) * d(col("gy")) / nAll) / nAll
    val varX = (d(col("gxx")) - d(col("gx")) * d(col("gx")) / nAll) / nAll
    val withTheta = pooled.select(col("n_all"),
      (d(col("gx")) / nAll).as("gmx"),
      when(varX > 0.0, covXY / varX).otherwise(lit(0.0)).as("theta"))
    val nv = d(col("n"))
    val mx = d(col("sx")) / nv
    val my = d(col("sy")) / nv
    val vy = (d(col("syy")) - d(col("sy")) * d(col("sy")) / nv) / nv
    val vx = (d(col("sxx")) - d(col("sx")) * d(col("sx")) / nv) / nv
    val cxy = (d(col("sxy")) - d(col("sx")) * d(col("sy")) / nv) / nv
    // var(Y − θX) = var(Y) − 2θ·cov(X,Y) + θ²·var(X), per variant
    val vAdj = vy - lit(2.0) * col("theta") * cxy +
      col("theta") * col("theta") * vx
    byV.crossJoin(broadcast(withTheta))
      .select(col("variant"), col("n").as("n_units"),
        round(my / 100.0, 6).as("mean_raw"),
        round((my - col("theta") * (mx - col("gmx"))) / 100.0, 6)
          .as("mean_cuped"),
        round(vy / 10000.0, 6).as("var_raw"),
        round(vAdj / 10000.0, 6).as("var_cuped"),
        round(col("theta"), 6).as("theta"))
      .orderBy(col("variant"))
  }

  /** Benjamini–Hochberg FDR correction over a family of per-group Welch
    * z-tests — "which event types ACTUALLY differ between the two user
    * cohorts, at a controlled false-discovery rate" instead of the
    * per-test p < .05 that multiplies false positives across groups.
    * p_adj(i) = min_{j ≥ i}(m·p(j)/j) over the p-ascending ranking,
    * capped at 1 — the step-up procedure verbatim.
    *
    * Cross-engine determinism: z is a fixed scalar tree over exact
    * integer moments ([[welch z]]); Φ(|z|) uses the Abramowitz–Stegun
    * 26.2.17 five-term polynomial — the SAME explicit formula the oracle
    * SQL spells out, with one `exp` whose argument is the bit-identical
    * z² (a last-ulp libm divergence would have to cross a 5e-7 rounding
    * boundary to surface; p is rounded to 6dp BEFORE the BH ranking so
    * both engines rank identical keys, tie-broken by group).
    *
    * Scale shape: ONE map-side-combined groupBy over six conditional
    * integer moments, then windows over the m-row group frame (m = #
    * groups, never row count). Output per group: n_a, n_b, z, p, p_adj,
    * reject (q = 0.05).
    */
  def bhFdr(events: DataFrame, group: Column, condA: Column,
            cents: Column, q: Double = 0.05): DataFrame = {
    val base = events.select(group.as("g"), condA.as("a"),
      cents.cast("long").as("y")).where(col("y").isNotNull)
    val m = base.groupBy(col("g")).agg(
      sum(when(col("a"), 1L).otherwise(0L)).as("na"),
      sum(when(col("a"), col("y")).otherwise(0L)).as("s1a"),
      sum(when(col("a"), xprod(col("y"), col("y"))).otherwise(lit(0).cast("decimal(38,0)"))).as("s2a"),
      sum(when(!col("a"), 1L).otherwise(0L)).as("nb"),
      sum(when(!col("a"), col("y")).otherwise(0L)).as("s1b"),
      sum(when(!col("a"), xprod(col("y"), col("y"))).otherwise(lit(0).cast("decimal(38,0)"))).as("s2b"))
      .where(col("na") >= 2 && col("nb") >= 2)
    val nad = d(col("na")); val nbd = d(col("nb"))
    val ma = d(col("s1a")) / nad; val mb = d(col("s1b")) / nbd
    val va = (d(col("s2a")) - d(col("s1a")) * d(col("s1a")) / nad) / (nad - 1.0)
    val vb = (d(col("s2b")) - d(col("s1b")) * d(col("s1b")) / nbd) / (nbd - 1.0)
    val se = sqrt(va / nad + vb / nbd)
    val z = (ma - mb) / se
    val p = round(normalTwoSidedP(z), 6)
    val tested = m.where(se > 0.0)
      .select(col("g"), col("na"), col("nb"), round(z, 6).as("z"), p.as("p"))
    val ord = Window.orderBy(col("p"), col("g"))
    val suffix = Window.orderBy(col("p").desc, col("g").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tested
      .crossJoin(broadcast(tested.agg(count(lit(1)).as("m_tests"))))
      .withColumn("i", row_number().over(ord))
      .withColumn("p_adj", round(least(min(col("p") * d(col("m_tests")) /
        d(col("i"))).over(suffix), lit(1.0)), 6))
      .select(col("g"), col("na").as("n_a"), col("nb").as("n_b"),
        col("z"), col("p"), col("p_adj"),
        (col("p_adj") <= lit(q)).as("reject"))
      .orderBy(col("g"))
  }

  /** Φ(|z|)'s upper tail doubled — the two-sided normal p-value via the
    * Abramowitz–Stegun 26.2.17 five-term polynomial (max abs error
    * 7.5e-8, far under the 6dp the callers round to). One fixed scalar
    * tree over `z`, spelled out identically in every oracle SQL.
    */
  private[operators] def normalTwoSidedP(z: Column): Column = {
    val az = abs(z)
    val k = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = k * (lit(0.319381530) + k * (lit(-0.356563782) +
      k * (lit(1.781477937) + k * (lit(-1.821255978) +
        k * lit(1.330274429)))))
    lit(2.0) * (exp(az * az * lit(-0.5)) * lit(0.3989422804014327)) * poly
  }

  /** ClickHouse `proportionsZTest`: two-sample proportion z-test per
    * group between the two cohorts — pooled-variance z, two-sided p
    * ([[twoSidedP]]), and the unpooled 95% CI for p_a − p_b. "Success" is
    * `success`; every row is a trial. Exact int64 counts only — the four
    * cells per group fold in ONE map-side-combined pass and every output
    * is a fixed scalar tree over them (engine-identical). Groups missing
    * a cohort, or with a pooled proportion of 0 or 1 (zero variance),
    * drop loudly. Output: g, n_a, n_b, p_a, p_b, z, p_value, ci_lo,
    * ci_hi (6dp).
    */
  def proportionsZTest(events: DataFrame, group: Column, condA: Column,
                       success: Column): DataFrame = {
    val base = events.select(group.as("g"), condA.as("a"),
      success.cast("boolean").as("s"))
    val m = base.groupBy(col("g")).agg(
      sum(when(col("a"), 1L).otherwise(0L)).as("na"),
      sum(when(col("a") && col("s"), 1L).otherwise(0L)).as("xa"),
      sum(when(!col("a"), 1L).otherwise(0L)).as("nb"),
      sum(when(!col("a") && col("s"), 1L).otherwise(0L)).as("xb"))
      .where(col("na") >= 1 && col("nb") >= 1)
    val nad = d(col("na")); val nbd = d(col("nb"))
    val pa = d(col("xa")) / nad
    val pb = d(col("xb")) / nbd
    val pp = (d(col("xa")) + d(col("xb"))) / (nad + nbd)
    val se0 = sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / nad + lit(1.0) / nbd))
    val z = (pa - pb) / se0
    val seCi = sqrt(pa * (lit(1.0) - pa) / nad + pb * (lit(1.0) - pb) / nbd)
    val zq = lit(1.9599639845400545)
    m.withColumn("pp", pp).where(col("pp") > 0.0 && col("pp") < 1.0)
      .select(col("g"), col("na").as("n_a"), col("nb").as("n_b"),
        round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
        round(z, 6).as("z"), round(normalTwoSidedP(z), 6).as("p_value"),
        round(pa - pb - zq * seCi, 6).as("ci_lo"),
        round(pa - pb + zq * seCi, 6).as("ci_hi"))
  }

  /** Sample-ratio-mismatch guardrail — the FIRST check any experimentation
    * platform runs before reading an A/B test: does the realized unit
    * split match the designed 50/50? A mismatch means broken assignment
    * (redirect loops, bot filters firing asymmetrically) and invalidates
    * every downstream readout. Per group: z = (n_a − n_b)/√(n_a + n_b)
    * (the 1-df χ² in z form), two-sided p via [[twoSidedP]], alarm at the
    * conventional p < 0.001. UNITS are counted (each distinct `unit`
    * once), not events — event-count imbalance is expected; unit-count
    * imbalance is the bug. Two map-side-combined grouped passes (unit
    * grain, then group grain); exact int64 counts.
    */
  def srmCheck(events: DataFrame, group: Column, unit: Column,
               condA: Column): DataFrame = {
    val units = events.select(group.as("g"), unit.as("u"), condA.as("a"))
      .distinct()
    val m = units.groupBy(col("g")).agg(
      sum(when(col("a"), 1L).otherwise(0L)).as("na"),
      sum(when(!col("a"), 1L).otherwise(0L)).as("nb"))
      .where(col("na") + col("nb") >= 1)
    srmColumns(m).select(col("g"), col("na").as("n_a"), col("nb").as("n_b"),
      col("z"), col("p"), col("srm_alarm"))
  }

  /** Shared z/p/alarm scalar tree over `na`/`nb` count columns — the one
    * formulation both [[srmCheck]] and the streaming
    * [[graft.streaming.SrmStream]] evaluate, so their answers agree
    * exactly by construction.
    */
  private[graft] def srmColumns(counts: DataFrame): DataFrame = {
    val z = (d(col("na")) - d(col("nb"))) / sqrt(d(col("na")) + d(col("nb")))
    counts.withColumn("z", round(z, 6))
      .withColumn("p", round(normalTwoSidedP(z), 6))
      .withColumn("srm_alarm", round(normalTwoSidedP(z), 6) < lit(0.001))
  }

  /** Paired t-test on each unit's post-minus-pre metric change across the
    * span midpoint — the within-subject sibling of [[abTTest]] (same
    * units observed twice beats two independent cohorts whenever
    * between-unit variance dominates). Units need activity in BOTH
    * halves; d = post-sum − pre-sum of `cents` per unit. One unit-grain
    * grouped pass (exact int64 diffs, decimal(38,0) squares) + a 1-row
    * fold. Output: n_units, mean_diff (value scale), t (6dp).
    */
  def pairedTTest(events: DataFrame, unit: Column, cents: Column,
                  ts: Column): DataFrame = {
    val base = events.select(unit.as("u"), cents.cast("long").as("y"),
      ts.cast("long").as("us")).where(col("y").isNotNull)
    val mid = base.agg((min(col("us")) + max(col("us"))).as("mm"))
      .select(expr("mm DIV 2").as("mid_us"))
    val diffs = base.crossJoin(broadcast(mid))
      .groupBy(col("u"))
      .agg(sum(when(col("us") >= col("mid_us"), col("y")).otherwise(0L)).as("post"),
        sum(when(col("us") < col("mid_us"), col("y")).otherwise(0L)).as("pre"),
        max(when(col("us") >= col("mid_us"), 1L).otherwise(0L)).as("hp"),
        max(when(col("us") < col("mid_us"), 1L).otherwise(0L)).as("hq"))
      .where(col("hp") === 1L && col("hq") === 1L)
      .select((col("post") - col("pre")).as("dd"))
    val f = diffs.agg(count(lit(1)).as("n"), sum(col("dd")).as("s1"),
      sum(xprod(col("dd"), col("dd"))).as("s2"))
      .where(col("n") >= 2)
    val nd = d(col("n"))
    val mean = d(col("s1")) / nd
    val sv = (d(col("s2")) - d(col("s1")) * d(col("s1")) / nd) / (nd - 1.0)
    f.withColumn("sv", sv).where(col("sv") > 0.0)
      .select(col("n").as("n_units"),
        round(mean / 100.0, 6).as("mean_diff"),
        round(mean / sqrt(col("sv") / nd), 6).as("t"))
  }

  /** Per-group sample-size planner for a CONTINUOUS metric — the
    * [[minSampleSize]] sibling for means: n per arm =
    * ⌈2·(z_{α/2}+z_β)²·σ²/mde²⌉ with σ² the group's OBSERVED population
    * variance from exact integer moments and `mde` an absolute shift on
    * the value scale (converted to cents as a DOUBLE product — the
    * [[minSampleSize]] decimal-literal pitfall). One map-side-combined
    * grouped pass; zero-variance groups drop (nothing to power against).
    */
  def minSampleSizeMeans(df: DataFrame, group: Column, cents: Column,
                         mde: Double,
                         zAlpha: Double = 1.9599639845400545,
                         zBeta: Double = 0.8416212335729143): DataFrame = {
    require(mde > 0, s"bad mde=$mde")
    val base = df.select(group.as("g"), cents.cast("long").as("y"))
      .where(col("y").isNotNull)
    val m = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("s1"),
        sum(xprod(col("y"), col("y"))).as("s2"))
      .where(col("n") >= 2)
    val nd = d(col("n"))
    val varPop = (d(col("s2")) - d(col("s1")) * d(col("s1")) / nd) / nd
    val zsum = lit(zAlpha + zBeta)
    val mdeCents = lit(mde) * lit(100.0)
    m.withColumn("v", varPop).where(col("v") > 0.0)
      .select(col("g"), col("n"),
        round(sqrt(col("v")) / 100.0, 6).as("stddev"),
        ceil(lit(2.0) * zsum * zsum * col("v") / (mdeCents * mdeCents))
          .as("min_n_per_arm"))
  }

  /** Exact trimmed mean per group — drop the ⌊n·p⌋ smallest and largest
    * observations, average the rest: the robust central-tendency readout
    * (a fat-finger order or a bot burst drags the mean, not this).
    *
    * Computed at the DISTINCT-VALUE grain, the [[mannWhitneyU]] shape —
    * never a per-row rank window: aggregate to (group, value, count),
    * then per boundary value integer-clamp how many of its copies fall
    * inside the trim (`kept = c − clamp(k − below, 0, c) − clamp(k −
    * above, 0, c)`), and the trimmed mean is an EXACT integer
    * Σ kept·y / Σ kept — ties at the trim boundary contribute identical
    * values, so the multiset kept (and the sum) is well-defined without
    * any tie-break. Groups where the trim swallows everything
    * (2·⌊n·p⌋ ≥ n) drop loudly. Output: g, n, n_trimmed_each,
    * mean_trimmed, mean_raw (value scale, 6dp).
    */
  def trimmedMean(df: DataFrame, group: Column, cents: Column,
                  p: Double = 0.1): DataFrame = {
    require(p > 0 && p < 0.5, s"bad trim fraction p=$p")
    val vals = df.select(group.as("g"), cents.cast("long").as("y"))
      .where(col("y").isNotNull)
      .groupBy(col("g"), col("y")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("g")).orderBy(col("y"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val staged = vals
      .withColumn("n", sum(col("c")).over(tot))
      .withColumn("upto", sum(col("c")).over(w))
      .withColumn("below", col("upto") - col("c"))
      .withColumn("above", col("n") - col("upto"))
      .withColumn("k", floor(col("n").cast("double") * lit(p)).cast("long"))
      .withColumn("kept", col("c") -
        greatest(lit(0L), least(col("k") - col("below"), col("c"))) -
        greatest(lit(0L), least(col("k") - col("above"), col("c"))))
    staged.groupBy(col("g"))
      .agg(max(col("n")).as("n"), max(col("k")).as("n_trimmed_each"),
        sum(greatest(col("kept"), lit(0L))).as("kn"),
        sum(xprod(greatest(col("kept"), lit(0L)), col("y"))).as("ks"),
        sum(xprod(col("y"), col("c"))).as("s1"))
      .where(col("kn") > 0)
      .select(col("g"), col("n"), col("n_trimmed_each"),
        round(d(col("ks")) / d(col("kn")) / 100.0, 6).as("mean_trimmed"),
        round(d(col("s1")) / d(col("n")) / 100.0, 6).as("mean_raw"))
  }

  /** Exponential fit of the per-key inter-arrival gaps — "is activity a
    * Poisson process": λ̂ = n/Σgaps (the MLE) plus the one-sample
    * Kolmogorov–Smirnov distance between the empirical gap CDF and
    * Exponential(λ̂). A large D says bursty/periodic, not memoryless —
    * the arrival-model check behind capacity planning and anomaly
    * thresholds.
    *
    * Per-KEY gaps (a key-partitioned lag window — never a global total
    * order over the log), pooled at the DISTINCT-SECOND grain: the CDF
    * sup runs over distinct gap values ([[ksTest]]'s shape), λ̂ comes
    * from exact integer sums (gap·count products via [[xprod]]), and the
    * one float per distinct value is exp(−λ̂·g). Both CDF step sides are
    * compared at each value (the sup of a step function against a
    * continuous one is attained at a step edge). Output one row: n_gaps,
    * lambda_per_sec, ks_d (6dp).
    */
  def interarrivalExpFit(events: DataFrame, key: Column, ts: Column,
                         tie: Column): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("us"), col("e"))
    val gaps = events
      .select(key.as("k"), ts.cast("timestamp").as("t"), tie.as("e"))
      .withColumn("us", unix_micros(col("t")))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(expr("(us - prev) DIV 1000000").as("g"))
    val grain = gaps.groupBy(col("g")).agg(count(lit(1)).as("c"))
    val tot = grain.agg(sum(col("c")).as("n"),
      sum(xprod(col("g"), col("c"))).as("sg"))
      .where(col("sg") > 0)
      .select(col("n"), (d(col("n")) / d(col("sg"))).as("lam"))
    val byG = Window.orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stepped = grain.crossJoin(broadcast(tot))
      .withColumn("cum", sum(col("c")).over(byG))
      .withColumn("f_at", d(col("cum")) / d(col("n")))
      .withColumn("f_before", (d(col("cum")) - d(col("c"))) / d(col("n")))
      .withColumn("f_exp", lit(1.0) - exp((lit(0.0) - col("lam")) * d(col("g"))))
    stepped
      .agg(max(col("n")).as("n_gaps"),
        round(max(col("lam")), 6).as("lambda_per_sec"),
        round(max(greatest(abs(col("f_at") - col("f_exp")),
          abs(col("f_before") - col("f_exp")))), 6).as("ks_d"))
      .where(col("n_gaps").isNotNull)
  }

  def momentStats(df: DataFrame, group: Column, cents: Column): DataFrame = {
    // |y| <= floor(sqrt(Long.MaxValue)) keeps y*y an exact int64; past it
    // the square would wrap SILENTLY in non-ANSI mode, corrupting s3/s4 —
    // so fail loudly instead (the file's exact-or-loud convention; routing
    // y2 through xprod would instead null on the decimal(19,0) cast-back,
    // which is the same silent corruption with extra steps)
    val base = df.select(group.as("g"), cents.cast("long").as("y"))
      .where(col("y").isNotNull)
      .withColumn("y2",
        when(abs(col("y")) > lit(3037000499L),
          raise_error(format_string(
            "momentStats: |cents|=%d exceeds the exact int64 square bound" +
              " (3037000499); pre-scale the measurement", abs(col("y")))))
          .otherwise(col("y") * col("y")))
    val m = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("s1"),
        sum(xprod(col("y"), col("y"))).as("s2"),
        sum(xprod(col("y2"), col("y"))).as("s3"),
        sum(xprod(col("y2"), col("y2"))).as("s4"))
      .where(col("n") >= 2)
    val nd = d(col("n"))
    val mu = d(col("s1")) / nd
    val r2 = d(col("s2")) / nd
    val r3 = d(col("s3")) / nd
    val r4 = d(col("s4")) / nd
    val m2 = r2 - mu * mu
    val m3 = r3 - lit(3.0) * mu * r2 + lit(2.0) * mu * mu * mu
    val m4 = r4 - lit(4.0) * mu * r3 + lit(6.0) * mu * mu * r2 -
      lit(3.0) * mu * mu * mu * mu
    m.withColumn("m2", m2).where(col("m2") > 0.0)
      .select(col("g"), col("n"),
        round(mu / 100.0, 6).as("mean"),
        round(sqrt(col("m2")) / 100.0, 6).as("stddev_pop"),
        round(m3 / (col("m2") * sqrt(col("m2"))), 6).as("skew_pop"),
        round(m4 / (col("m2") * col("m2")), 6).as("kurt_pop"),
        round(m4 / (col("m2") * col("m2")) - 3.0, 6).as("kurt_excess"))
  }

  /** Ratio-metric z-test via the delta method (Deng, Knoblich & Lu,
    * KDD'18 "Applying the Delta Method in Metric Analytics"): the test
    * for CTR-shaped metrics R = Σnum/Σden where BOTH totals vary per
    * unit — the per-user t-test is wrong there (units are the
    * randomization grain, events are not independent), and the naive
    * proportion test ignores the denominator's variance.
    *
    * Var(R) ≈ (var(n) − 2R·cov(n,d) + R²·var(d)) / (k·d̄²) per variant
    * (population moments at the unit grain), z = (R_b − R_a)/√(V_a+V_b),
    * two-sided p via the shared Φ polynomial.
    *
    * Exact int64/decimal moments at unit then variant grain (two
    * map-side-combined shuffles — the [[cuped]] shape); the variant
    * frames align by conditional aggregation (no self-join); the scalar
    * tree is fixed doubles rounded 6dp. Variants missing units, with a
    * zero denominator total, or with zero combined variance drop loudly
    * (empty frame, never a fake p).
    *
    * Output one row: k_a, k_b, ratio_a, ratio_b, diff, z, p_value.
    */
  def ratioZTest(events: DataFrame, unit: Column, num: Column,
                 den: Column): DataFrame = {
    val base = events.select(unit.as("u"),
      coalesce(num.cast("long"), lit(0L)).as("n"),
      coalesce(den.cast("long"), lit(0L)).as("dd"))
    val units = base.groupBy(col("u"))
      .agg(sum(col("n")).as("n"), sum(col("dd")).as("dn"))
      .select((col("u") % 2).cast("long").as("v"), col("n"), col("dn"))
    val byV = units.groupBy(col("v"))
      .agg(count(lit(1)).as("k"), sum(col("n")).as("sn"),
        sum(col("dn")).as("sd"),
        sum(xprod(col("n"), col("n"))).as("snn"),
        sum(xprod(col("n"), col("dn"))).as("snd"),
        sum(xprod(col("dn"), col("dn"))).as("sdd"))
    def arm(v: Int, c: String) = max(when(col("v") === v, col(c)))
    val cols = Seq("k", "sn", "sd", "snn", "snd", "sdd")
    val j = byV.agg(
      cols.map(c => arm(0, c).as(c + "a")).head,
      (cols.map(c => arm(0, c).as(c + "a")).tail ++
        cols.map(c => arm(1, c).as(c + "b"))): _*)
      .where(col("ka").isNotNull && col("kb").isNotNull &&
        col("ka") >= 2 && col("kb") >= 2 &&
        col("sda") > 0L && col("sdb") > 0L)
    def varR(s: String) = {
      val k = d(col("k" + s)); val sn = d(col("sn" + s))
      val sd = d(col("sd" + s)); val snn = d(col("snn" + s))
      val snd = d(col("snd" + s)); val sdd = d(col("sdd" + s))
      val r = sn / sd
      val varN = snn / k - (sn / k) * (sn / k)
      val varD = sdd / k - (sd / k) * (sd / k)
      val covND = snd / k - (sn / k) * (sd / k)
      val dbar = sd / k
      (r, (varN - lit(2.0) * r * covND + r * r * varD)
        / (k * dbar * dbar))
    }
    val (ra, va) = varR("a")
    val (rb, vb) = varR("b")
    val z = (rb - ra) / sqrt(va + vb)
    j.where(va + vb > 0.0)
      .select(col("ka").as("k_a"), col("kb").as("k_b"),
        round(ra, 6).as("ratio_a"), round(rb, 6).as("ratio_b"),
        round(rb - ra, 6).as("diff"), round(z, 6).as("z"),
        round(normalTwoSidedP(z), 6).as("p_value"))
  }

  /** Always-valid sequential mean-difference test — mixture SPRT (Johari,
    * Pekelis & Walsh: "Peeking at A/B tests", KDD'17): at each DAY, the
    * cumulative log likelihood ratio of the even-vs-odd-unit mean
    * difference against the H0-centered normal mixture with variance τ²,
    * and the always-valid p = running min of min(1, Λ⁻¹). This is the
    * number an experimenter may read EVERY day and stop on without
    * inflating false positives — the fixed-horizon tests in this file are
    * valid only at their one preplanned n.
    *
    * ln Λ = ½·ln(V/(V+τ²)) + Δ²τ² / (2V(V+τ²)), with Δ the cumulative
    * mean difference and V = σ̂²(1/n_a + 1/n_b) from the pooled population
    * variance of cumulative exact moments. Emitting the LOG ratio keeps a
    * strong effect from overflowing exp; p comes via exp(−lnΛ), which
    * underflows gracefully to 0.
    *
    * Determinism: per-(day, variant) moments are exact int64/decimal
    * sums; the cumulative windows sum those exact integers over the
    * CALENDAR-BOUNDED day grid (windows sort the grid, never events — the
    * binaryAuc lesson applied by construction); each day's scalar tree
    * (one ln, one exp) then evaluates on bit-identical inputs in any
    * engine, rounded 6dp BEFORE the running min so both engines take
    * minima over identical keys. Days where an arm has no cumulative
    * history yet or σ̂² = 0 carry no readout (dropped, loud in the row
    * count: a silent p = 1 would read as evidence of no effect).
    *
    * Scale: ONE map-side-combined groupBy to the (day, variant) grain;
    * everything downstream runs on ≤ 2·days rows.
    */
  def msprt(events: DataFrame, unit: Column, cents: Column, ts: Column,
            tauCents: Double = 10.0): DataFrame = {
    require(tauCents > 0, s"bad tauCents=$tauCents")
    import org.apache.spark.sql.expressions.Window
    val base = events.select(
        to_date(graft.functions.TimeCols.ltz(ts)).as("day"),
        (unit % 2).cast("long").as("v"), cents.cast("long").as("y"))
      .where(col("y").isNotNull)
    val daily = base.groupBy(col("day"), col("v"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("s"),
        sum(xprod(col("y"), col("y"))).as("ss"))
    val w = Window.partitionBy(col("v")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily.select(col("day"), col("v"),
      sum(col("n")).over(w).as("cn"), sum(col("s")).over(w).as("cs"),
      sum(col("ss")).over(w).as("css"))
    // arm alignment WITHOUT a self-join: one conditional aggregation to
    // the day grain (an arm's columns are null on days it saw no new
    // data — those days drop, the inner-join semantics at one exchange
    // less). The readout advances on days where BOTH arms observed data;
    // each surviving row still carries full cumulative history.
    def arm(v: Int, c: String) = max(when(col("v") === v, col(c)))
    val j = cum.groupBy(col("day"))
      .agg(arm(0, "cn").as("na"), arm(0, "cs").as("sa"),
        arm(0, "css").as("ssa"), arm(1, "cn").as("nb"),
        arm(1, "cs").as("sb"), arm(1, "css").as("ssb"))
      .where(col("na").isNotNull && col("nb").isNotNull)
    val delta = d(col("sb")) / d(col("nb")) - d(col("sa")) / d(col("na"))
    val sigma2 = (((d(col("ssa")) - d(col("sa")) * d(col("sa")) / d(col("na")))
      + (d(col("ssb")) - d(col("sb")) * d(col("sb")) / d(col("nb"))))
      / (d(col("na")) + d(col("nb"))))
    val vv = sigma2 * (lit(1.0) / d(col("na")) + lit(1.0) / d(col("nb")))
    val tau2 = lit(tauCents * tauCents)
    val llr = lit(0.5) * log(col("vc") / (col("vc") + tau2)) +
      col("dc") * col("dc") * tau2 /
        (lit(2.0) * col("vc") * (col("vc") + tau2))
    val scored = j.withColumn("dc", delta).withColumn("vc", vv)
      .where(col("vc") > 0.0)
      .withColumn("llr", llr)
      .withColumn("p_av",
        round(least(lit(1.0), exp(-col("llr"))), 6))
    scored
      .withColumn("p_running", min(col("p_av")).over(
        Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("day"), col("na").as("n_a"), col("nb").as("n_b"),
        round(col("dc") / 100.0, 6).as("mean_delta"),
        round(col("llr"), 6).as("llr"),
        col("p_av").as("p_always_valid"), col("p_running"))
  }

  /** Wilcoxon signed-rank test on each unit's post-minus-pre change
    * across the span midpoint — the NONPARAMETRIC sibling of
    * [[pairedTTest]] (same within-subject pairing, no normality
    * assumption: a handful of whale users can hand the paired t a fat
    * tail it has no business averaging; the signed-rank statistic only
    * consumes the ORDER of |d|).
    *
    * Pairing is [[pairedTTest]]'s exactly: units active in both halves,
    * d = post-sum − pre-sum of `cents`. Zero diffs drop (the standard
    * Wilcoxon convention — a zero carries no sign information). Ranking
    * runs at the DISTINCT-|d| grain ([[mannWhitneyU]]'s shape — never a
    * per-row rank window): aggregate to (|d|, positives, negatives),
    * midranks arrive DOUBLED as exact integers from one cumulative
    * window over distinct values, W⁺ = Σ pos·rank via [[xprod]], and the
    * tie correction Σ(t³−t) accumulates in decimal(38,0). The normal
    * approximation z = (W⁺ − n(n+1)/4) / √(n(n+1)(2n+1)/24 − Σ(t³−t)/48)
    * is one fixed scalar tree over those exact sums, so a DuckDB oracle
    * reproduces it bit-for-bit. σ² > 0 always holds for n ≥ 1 (even one
    * all-tied group leaves n(n+1)²/16), so the only drops are n < 2.
    *
    * Scale: one unit-grain grouped pass, one distinct-|d| aggregation,
    * one window over distinct |d| values. Output one row: n_units
    * (nonzero diffs), w_plus, z (6dp).
    */
  def wilcoxonSignedRank(events: DataFrame, unit: Column, cents: Column,
                         ts: Column): DataFrame = {
    val base = events.select(unit.as("u"), cents.cast("long").as("y"),
      ts.cast("long").as("us")).where(col("y").isNotNull)
    val mid = base.agg((min(col("us")) + max(col("us"))).as("mm"))
      .select(expr("mm DIV 2").as("mid_us"))
    val diffs = base.crossJoin(broadcast(mid))
      .groupBy(col("u"))
      .agg(sum(when(col("us") >= col("mid_us"), col("y")).otherwise(0L)).as("post"),
        sum(when(col("us") < col("mid_us"), col("y")).otherwise(0L)).as("pre"),
        max(when(col("us") >= col("mid_us"), 1L).otherwise(0L)).as("hp"),
        max(when(col("us") < col("mid_us"), 1L).otherwise(0L)).as("hq"))
      .where(col("hp") === 1L && col("hq") === 1L)
      .select((col("post") - col("pre")).as("dd"))
      .where(col("dd") =!= 0L)
    val grain = diffs
      .select(abs(col("dd")).as("ad"),
        when(col("dd") > 0L, 1L).otherwise(0L).as("pos"))
      .groupBy(col("ad"))
      .agg(sum(col("pos")).as("cp"), sum(lit(1L) - col("pos")).as("cm"))
      .withColumn("cn", col("cp") + col("cm"))
    val w = Window.orderBy(col("ad"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // doubled midrank of this tie group: 2·(count below) + (count in) + 1
    val ranked = grain
      .withColumn("r2",
        lit(2L) * (sum(col("cn")).over(w) - col("cn")) + col("cn") + 1L)
    val f = ranked.agg(sum(col("cn")).as("n"),
      sum(xprod(col("cp"), col("r2"))).as("w2"),
      sum(xprod(col("cn"), col("cn")) * col("cn").cast("decimal(19,0)") -
        col("cn").cast("decimal(38,0)")).as("tsum"))
      .where(col("n") >= 2)
    val nd = d(col("n"))
    val wPlus = d(col("w2")) / 2.0
    val mu = nd * (nd + 1.0) / 4.0
    val sigma2 = nd * (nd + 1.0) * (lit(2.0) * nd + 1.0) / 24.0 -
      d(col("tsum")) / 48.0
    f.select(col("n").as("n_units"), wPlus.as("w_plus"),
      round((wPlus - mu) / sqrt(sigma2), 6).as("z"))
  }

  /** Exact weighted quantiles — ClickHouse
    * `quantilesExactWeighted(q…)(value, weight)` with a GROUP BY: for each
    * requested per-mille level q the reported value is the SMALLEST
    * distinct value whose cumulative weight w≤ satisfies
    * `1000·w≤ ≥ q·W` (W = the group's total weight) — the
    * accumulate-until-threshold convention, kept entirely in integers so
    * the pick is a set membership test, not a float comparison.
    *
    * Scale shape: the raw log compresses to the (group, distinct value)
    * grain FIRST (one map-side-combined aggregation — the [[mannWhitneyU]]
    * idiom), the cumulative window then sorts DISTINCT values per group,
    * and the q levels join as a broadcast literal table, so the heavy
    * pass is one hash aggregation regardless of how many levels are
    * asked. Weights must be ≥ 0; zero-total groups drop (no quantile is
    * defined on zero mass). Output one row per (group, q_permille):
    * (g, q_permille, v_cents).
    */
  def weightedQuantiles(df: DataFrame, group: Column, cents: Column,
                        weight: Column, qPermille: Seq[Int]): DataFrame = {
    require(qPermille.nonEmpty && qPermille.forall(q => q >= 1 && q <= 1000),
      s"bad qPermille=$qPermille")
    val spark = df.sparkSession
    import spark.implicits._
    val grain = df
      .select(group.as("g"), cents.cast("long").as("v"),
        weight.cast("long").as("w"))
      .where(col("v").isNotNull && col("w") > 0L)
      .groupBy(col("g"), col("v")).agg(sum(col("w")).as("w"))
    val byG = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = grain
      .withColumn("cumw", sum(col("w")).over(byG))
      .withColumn("tw", sum(col("w")).over(tot))
    val qs = qPermille.toDF("q_permille")
    cum.join(broadcast(qs),
        col("cumw") * 1000L >= col("q_permille") * col("tw") &&
        (col("cumw") - col("w")) * 1000L < col("q_permille") * col("tw"))
      .select(col("g"), col("q_permille").cast("long").as("q_permille"),
        col("v").as("v_cents"))
  }

  /** G-test of independence (log-likelihood-ratio χ² twin) over the same
    * contingency cells as [[contingencyChi2]]:
    * G = 2·Σ_{r,c} O·ln(O·N / (R·C)), df = (R−1)(C−1). Preferred over
    * Pearson's χ² when any cell is small — the statistic the reference
    * warehouse computes as `2 * sum(o * ln(o/e))` in its data-quality
    * dashboards.
    *
    * Exact integer cells and margins from one cell-grain aggregation;
    * the G fold is an order-sensitive double sum, so it rides the same
    * NESTED fixed-order cumulative windows as [[theilsU]] (per-r over c,
    * then over r — empty cells contribute exactly 0 by construction and
    * never appear, so the fold order is the (r, c) lexicographic order on
    * OBSERVED cells both here and in the oracle). Output one row: n,
    * r_levels, c_levels, dof, g_stat (6dp). Single-level inputs drop
    * loudly (df = 0 ⇒ statistic meaningless).
    */
  def gTest(events: DataFrame, rowC: Column, colC: Column): DataFrame = {
    val cells = events.groupBy(rowC.as("r"), colC.as("c"))
      .agg(count(lit(1)).as("o"))
    val byR = Window.partitionBy(col("r"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val byC = Window.partitionBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val nCols = cells.agg(count_distinct(col("c")).as("nc"))
    val term = d(col("o")) *
      log(d(col("o")) * d(col("nn")) / (d(col("rm")) * d(col("cm"))))
    val perR = cells
      .withColumn("rm", sum(col("o")).over(byR))
      .withColumn("cm", sum(col("o")).over(byC))
      .withColumn("nn", sum(col("o")).over(all))
      .crossJoin(broadcast(nCols))
      .withColumn("g_cum", sum(term).over(
        Window.partitionBy(col("r")).orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("r"))
      .agg(max(col("nn")).as("nn"), max(col("nc")).as("nc"),
        max_by(col("g_cum"), col("c")).as("gr"))
    perR
      .withColumn("cum", sum(col("gr")).over(
        Window.orderBy(col("r")).rowsBetween(Window.unboundedPreceding, 0)))
      .agg(max(col("nn")).as("n"), count(lit(1)).as("nr"),
        max(col("nc")).cast("long").as("ncl"),
        max_by(col("cum"), col("r")).as("gsum"))
      .where(col("nr") >= 2 && col("ncl") >= 2)
      .select(col("n"), col("nr").as("r_levels"), col("ncl").as("c_levels"),
        ((col("nr") - 1L) * (col("ncl") - 1L)).as("dof"),
        round(lit(2.0) * col("gsum"), 6).as("g_stat"))
  }

  /** Ljung–Box portmanteau test on the dense daily event-count series:
    * Q(h) = n(n+2)·Σ_{k=1..h} ρ̂_k²/(n−k), the "is there ANY
    * autocorrelation left" readout that complements the per-lag
    * [[graft.operators.Behavior.hourlyAutocorr]] profile — the standard
    * white-noise gate a forecasting pipeline runs on its residuals.
    *
    * The series is the day-grained count on the sequence-densified grid
    * (absent days count 0 — a lag is a real k-day step). Counts are
    * integers, so for every lag the five pair sums (Σx_t, Σx_{t−k},
    * Σx_t·x_{t−k}, pair count) and the two global sums (Σx, Σx²) are
    * exact int64s from ONE aggregate over the lag-shifted frame; each
    * ρ̂_k = (Σx_t·x_{t−k} − x̄(Σx_t + Σx_{t−k}) + (n−k)x̄²)/(Σx² − n·x̄²)
    * (fixed-denominator ACF convention, global mean x̄ = Σx/n) is a fixed
    * scalar tree over them, and Q_cum(k) is a fixed k-term sum — all
    * engine-reproducible bit-for-bit. Output one row per lag: (lag, n,
    * rho (6dp), q_cum (6dp)); series shorter than max lag + 2 days drop.
    *
    * Scale: the window sorts DAYS, not events — the series is an
    * aggregate; the lag shift is h window lags over the day frame.
    */
  def ljungBoxDaily(events: DataFrame, tsCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 32, s"bad maxLag=$maxLag")
    val lags = 1 to maxLag
    val observed = events
      .groupBy(date_trunc("DAY", col(tsCol)).as("dy"))
      .agg(count(lit(1)).as("x"))
    val spine = observed
      .agg(min(col("dy")).as("d0"), max(col("dy")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"),
        expr("INTERVAL 1 DAY"))).as("dy"))
    val series = spine.join(observed, Seq("dy"), "left")
      .select(col("dy"), coalesce(col("x"), lit(0L)).as("x"))
    val w = Window.orderBy(col("dy"))
    val lagged = lags.foldLeft(series) { (df, k) =>
      df.withColumn(s"_l$k", lag(col("x"), k).over(w))
    }
    val perLag = lags.map { k =>
      val y = col(s"_l$k")
      Seq(count(y).as(s"m$k"),
        sum(when(y.isNotNull, col("x"))).as(s"sx$k"), sum(y).as(s"sy$k"),
        sum(xprod(col("x"), y)).as(s"sxy$k"))
    }
    val aggs = Seq(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(xprod(col("x"), col("x"))).as("sxx")) ++ perLag.flatten
    val m = lagged.agg(aggs.head, aggs.tail: _*)
      .where(col("n") >= maxLag + 2)
    val nd = d(col("n"))
    val xbar = d(col("sx")) / nd
    val denom = d(col("sxx")) - nd * xbar * xbar
    def rho(k: Int): Column =
      (d(col(s"sxy$k")) - xbar * (d(col(s"sx$k")) + d(col(s"sy$k"))) +
        d(col(s"m$k")) * xbar * xbar) / denom
    // Q_cum rides a fixed-order cumulative window over the h exploded
    // lag rows (Σ adds t₁, t₂, … left-associatively — the exact order the
    // oracle's literal k-term sums use); inlining qCum(k) as a closed
    // expression instead re-substitutes every rho tree O(h²) times and
    // blows the generated projection past janino's method limit.
    val rows = lags.map { k =>
      struct(lit(k.toLong).as("lag"), col("n").as("n"), rho(k).as("rho_raw"))
    }
    val wl = Window.orderBy(col("lag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ndOut = col("n").cast("double")
    m.where(denom > 0.0)
      .select(explode(array(rows: _*)).as("s"))
      .select(col("s.lag").as("lag"), col("s.n").as("n"),
        col("s.rho_raw").as("rho_raw"))
      .withColumn("term", col("rho_raw") * col("rho_raw") /
        (ndOut - col("lag").cast("double")))
      .withColumn("cum", sum(col("term")).over(wl))
      .select(col("lag"), col("n"), round(col("rho_raw"), 6).as("rho"),
        round(ndOut * (ndOut + 2.0) * col("cum"), 6).as("q_cum"))
  }

  /** Two-sample z-test for means with KNOWN population variances —
    * ClickHouse `meanZTest(pop_var_x, pop_var_y, confidence)(value,
    * index)` parity, per bucket: z = (x̄_a − x̄_b)/√(σ²_a/n_a + σ²_b/n_b),
    * the two-sided normal p ([[normalTwoSidedP]]'s pinned A&S tree), and
    * the mean-difference CI at the caller's critical value. Variances
    * are PARAMETERS (the test's defining feature — when they're
    * estimated, use [[abTTest]]); means come from exact integer sums, so
    * the whole readout is one fixed scalar tree per bucket. Buckets
    * missing either arm drop. `varA`/`varB` are on the cents² scale;
    * means report as cents/100.
    */
  def meanZTest(events: DataFrame, bucket: Column, condA: Column,
                condB: Column, cents: Column, varA: Double, varB: Double,
                zCrit: Double = 1.959963984540054): DataFrame = {
    require(varA > 0 && varB > 0 && zCrit > 0,
      s"bad meanZTest params varA=$varA varB=$varB zCrit=$zCrit")
    val y = cents.cast("long")
    val m = events
      .groupBy(bucket.as("bucket"))
      .agg(sum(when(condA, 1L).otherwise(0L)).as("na"),
        sum(when(condA, y).otherwise(0L)).as("sa"),
        sum(when(condB, 1L).otherwise(0L)).as("nb"),
        sum(when(condB, y).otherwise(0L)).as("sb"))
      .where(col("na") >= 1L && col("nb") >= 1L)
    val (na, nb) = (d(col("na")), d(col("nb")))
    val diff = d(col("sa")) / na - d(col("sb")) / nb
    val se = sqrt(lit(varA) / na + lit(varB) / nb)
    m.select(col("bucket"), col("na").as("n_a"), col("nb").as("n_b"),
      round(d(col("sa")) / na / 100.0, 6).as("mean_a"),
      round(d(col("sb")) / nb / 100.0, 6).as("mean_b"),
      round(diff / se, 6).as("z"),
      round(normalTwoSidedP(diff / se), 6).as("p"),
      round((diff - lit(zCrit) * se) / 100.0, 6).as("ci_lo"),
      round((diff + lit(zCrit) * se) / 100.0, 6).as("ci_hi"))
  }

  /** Two-sample Poisson rate test (Wald form) per bucket: are events
    * arriving FASTER in arm A than arm B, exposure-adjusted —
    * z = (λ̂₁ − λ̂₂) / √(k₁/T₁² + k₂/T₂²) with λ̂ = k/T, the event-count
    * analogue of [[proportionsZTest]] (counts instead of trials; the
    * rate statistic a CDC monitor wants for "did this feed's arrival
    * rate change"). Exposure T per (bucket, arm) = unit count × the
    * caller's per-unit observation span — supplied as `spanUnits` so
    * the test is explicit about its exposure model rather than
    * guessing one from the data. Counts and unit counts are exact
    * integers from ONE map-side-combined pass; z and the A&S p are
    * fixed scalar trees. Arms with zero events on both sides drop
    * (zero variance).
    */
  def poissonRateTest(events: DataFrame, bucket: Column, condA: Column,
                      unit: Column, spanUnits: Double): DataFrame = {
    require(spanUnits > 0, s"bad spanUnits=$spanUnits")
    val m = events
      .select(bucket.as("bucket"), condA.as("a"), unit.as("u"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("ka"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("kb"),
        count_distinct(when(col("a"), col("u"))).as("ua"),
        count_distinct(when(!col("a"), col("u"))).as("ub"))
      .where(col("ua") >= 1L && col("ub") >= 1L &&
        col("ka") + col("kb") > 0L)
    val ta = d(col("ua")) * spanUnits
    val tb = d(col("ub")) * spanUnits
    val z = (d(col("ka")) / ta - d(col("kb")) / tb) /
      sqrt(d(col("ka")) / (ta * ta) + d(col("kb")) / (tb * tb))
    m.select(col("bucket"), col("ka").as("n_a"), col("kb").as("n_b"),
      col("ua").as("units_a"), col("ub").as("units_b"),
      round(d(col("ka")) / ta, 6).as("rate_a"),
      round(d(col("kb")) / tb, 6).as("rate_b"),
      round(z, 6).as("z"), round(normalTwoSidedP(z), 6).as("p"))
  }

  /** Deterministic uniform in [0, 1) from an integer key — the PRNG under
    * [[poissonBootstrapCi]], chosen so an INDEPENDENT SQL engine can
    * replay every draw bit-for-bit: two congruential rounds plus a
    * QUADRATIC round (affine maps compose to affine — the square is what
    * breaks the lattice) over the Mersenne prime p = 2⁶¹−1, all in
    * decimal(38,0) arithmetic — the largest intermediate, z², is
    * (2⁶¹)² ≈ 5.3·10³⁶ < 10³⁸, so nothing can round or wrap on any
    * engine and no wrap-semantics assumption (ANSI or not) is needed.
    * The final value takes the high 53 bits (`⌊z/256⌋ / 2⁵³` — exactly
    * representable as a double on both sides). Keys must be non-negative
    * and < p.
    *
    * Evaluation rides the native codegen scalar
    * [[graft.expressions.BootstrapU01]] (64-bit Mersenne-fold arithmetic
    * via Math.multiplyHigh — value-identical to the decimal tree above,
    * reference-draw-pinned): the decimal(38,0) formulation is exact but
    * BigDecimal-bound, measured 8.9 → 1.4 s on the sf0.1 bootstrap.
    */
  private[graft] def mixU01(key: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.expressions.BootstrapU01(
        org.apache.spark.sql.graft.bridge.expression(key.cast("long"))))

  /** The decimal(38,0) formulation of [[mixU01]] — kept as the
    * cross-checkable twin (it is the exact tree the DuckDB oracle's
    * HUGEINT arithmetic mirrors); StatTestsSpec pins lane equality.
    */
  private[graft] def mixU01Decimal(key: Column): Column = {
    def dec(v: Long): Column = lit(v).cast("decimal(38,0)")
    val p = dec(2305843009213693951L) // 2^61 - 1
    val z1 = pmod(key.cast("decimal(38,0)") * dec(1203983748297848573L) +
      dec(1111111111111111111L), p)
    val z2 = pmod(z1 * z1 + dec(555555555555555555L), p)
    val z3 = pmod(z2 * dec(989812716073141251L), p)
    // (z3 - z3 % 256) / 256: integral value, exact in decimal at any
    // scale — a bare z3/256 would ROUND at the result scale and break
    // the floor near integer boundaries
    ((z3 - pmod(z3, dec(256L))) / dec(256L)).cast("double") /
      9007199254740992.0
  }

  /** Poisson(1) bootstrap weight from a uniform draw: the inverse-CDF
    * walk over the cumulative Poisson(1) probabilities as FIXED double
    * literals (identical strings in the oracle), capped at 7
    * (P(w ≥ 7) ≈ 8·10⁻⁵ — the standard truncation).
    */
  private[graft] def poissonW(u: Column): Column =
    when(u < 0.36787944117144233, 0L)
      .when(u < 0.7357588823428847, 1L)
      .when(u < 0.9196986029286058, 2L)
      .when(u < 0.9810118431238463, 3L)
      .when(u < 0.9963401531726563, 4L)
      .when(u < 0.9994058151824183, 5L)
      .when(u < 0.999916758850712, 6L)
      .otherwise(7L)

  /** Percentile-bootstrap confidence interval for the per-unit mean,
    * via the POISSON bootstrap (Chamandy et al., "Estimating Uncertainty
    * for Massive Data Streams", Google 2012) — the resampling scheme
    * that works distributed: instead of drawing n units with replacement
    * (which needs global coordination), each unit enters replicate b
    * with an independent Poisson(1) weight. Every weight here is
    * DETERMINISTIC ([[mixU01]] on key = unit·B + b), so the whole
    * procedure — all B replicate means and the order-statistic CI — is
    * engine-reproducible and the DuckDB oracle hash-matches it: a
    * bootstrap you can ASSERT on, not eyeball.
    *
    * CI convention: replicate means sorted ascending (ties broken by
    * replicate id), lo = the (⌊B·α⌋+1)-th smallest, hi = the (B−⌊B·α⌋)-th
    * smallest, α = alphaPermille/1000 per side. Output one row per
    * group: n_units, mean (observed, cents/100), ci_lo, ci_hi (6dp).
    *
    * Scale shape: one map-side-combined aggregation to the (group, unit)
    * grain, a bounded ×B literal fan-out, one (group, b) aggregation
    * (means are ratios of exact integer sums — xprod weights), and a
    * final window over B rows per group. The raw log is never windowed
    * or self-joined; B is a constant.
    */
  def poissonBootstrapCi(events: DataFrame, group: Column, unit: Column,
                         cents: Column, b: Int = 200,
                         alphaPermille: Int = 25): DataFrame = {
    require(b >= 20 && b <= 10000, s"bad b=$b")
    require(alphaPermille >= 1 && alphaPermille * 2 < 1000,
      s"bad alphaPermille=$alphaPermille")
    val spark = events.sparkSession
    import spark.implicits._
    val perUnit = events
      .select(group.as("g"), unit.cast("long").as("u"),
        cents.cast("long").as("y"))
      .where(col("y").isNotNull)
      .groupBy(col("g"), col("u")).agg(sum(col("y")).as("x"))
    val reps = perUnit
      .select(col("g"), col("u"), col("x"),
        explode(sequence(lit(0L), lit(b.toLong - 1L))).as("rep"))
      .withColumn("w", poissonW(mixU01(col("u") * b.toLong + col("rep"))))
      .groupBy(col("g"), col("rep"))
      .agg(sum(col("w")).as("sw"), sum(xprod(col("w"), col("x"))).as("swx"))
      .where(col("sw") > 0L)
      .select(col("g"), col("rep"), (d(col("swx")) / d(col("sw"))).as("m"))
    val wOrd = Window.partitionBy(col("g")).orderBy(col("m"), col("rep"))
    val loRn = b * alphaPermille / 1000 + 1
    val hiRn = b - b * alphaPermille / 1000
    val ci = reps.withColumn("rn", row_number().over(wOrd))
      .groupBy(col("g"))
      .agg(min(when(col("rn") === loRn, col("m"))).as("lo"),
        min(when(col("rn") === hiRn, col("m"))).as("hi"))
    val obs = perUnit.groupBy(col("g"))
      .agg(count(lit(1)).as("n_units"), sum(col("x")).as("sx"))
    obs.join(ci, Seq("g"))
      .select(col("g"), col("n_units"),
        round(d(col("sx")) / d(col("n_units")) / 100.0, 6).as("mean"),
        round(col("lo") / 100.0, 6).as("ci_lo"),
        round(col("hi") / 100.0, 6).as("ci_hi"))
  }

  /** Two-feature ordinary least squares with intercept — the deterministic
    * closed-form cousin of ClickHouse `stochasticLinearRegression`:
    * y = b0 + b1·x1 + b2·x2 fitted per group by solving the 3×3 normal
    * equations with Cramer's rule. One map-side-combined grouped pass
    * collects the ten moments (n, Σx1, Σx2, Σy, Σx1², Σx1x2, Σx2²,
    * Σx1y, Σx2y, Σy²) as exact integers — the squared/cross sums ride
    * [[xprod]]'s decimal(38,0) so no product can wrap (the momentStats
    * loud-overflow convention) — and every coefficient is one fixed
    * scalar tree over them, so a DuckDB oracle hash-matches.
    *
    * Output per group: n, b0/b1/b2 on the cents/100 scale (6dp), r2
    * (6dp, NULL when y is constant). Groups with a singular design
    * (|det| = 0: either regressor constant or collinear) drop loudly —
    * a pseudo-inverse answer would be arbitrary, not wrong-but-stable.
    */
  def multiLinReg(events: DataFrame, group: Column, x1: Column, x2: Column,
                  cents: Column): DataFrame = {
    val base = events.select(group.as("g"), x1.cast("long").as("a"),
      x2.cast("long").as("b"), cents.cast("long").as("y"))
      .where(col("a").isNotNull && col("b").isNotNull && col("y").isNotNull)
    val m = base.groupBy(col("g")).agg(
      count(lit(1)).as("n"),
      sum(col("a")).as("s1"), sum(col("b")).as("s2"), sum(col("y")).as("sy"),
      sum(xprod(col("a"), col("a"))).as("s11"),
      sum(xprod(col("a"), col("b"))).as("s12"),
      sum(xprod(col("b"), col("b"))).as("s22"),
      sum(xprod(col("a"), col("y"))).as("s1y"),
      sum(xprod(col("b"), col("y"))).as("s2y"),
      sum(xprod(col("y"), col("y"))).as("syy"))
      .where(col("n") >= 4)
    val (nd, s1, s2, sy) = (d(col("n")), d(col("s1")), d(col("s2")), d(col("sy")))
    val (s11, s12, s22) = (d(col("s11")), d(col("s12")), d(col("s22")))
    val (s1y, s2y, syy) = (d(col("s1y")), d(col("s2y")), d(col("syy")))
    // Cramer's rule on [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]]·β = [sy,s1y,s2y]
    val det = nd * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)
    val det1 = nd * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val det2 = nd * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)
    val (b0, b1, b2) = (det0 / det, det1 / det, det2 / det)
    val sse = syy - (b0 * sy + b1 * s1y + b2 * s2y)
    val sst = syy - sy * sy / nd
    m.where(det =!= 0.0)
      .select(col("g"), col("n"),
        round(b0 / 100.0, 6).as("b0"),
        round(b1 / 100.0, 6).as("b1"),
        round(b2 / 100.0, 6).as("b2"),
        when(sst > 0.0, round(lit(1.0) - sse / sst, 6)).as("r2"))
  }
}
