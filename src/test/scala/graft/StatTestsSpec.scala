package graft

import graft.operators.{Behavior, StatTests}
import org.apache.spark.sql.functions._

class StatTestsSpec extends SparkSpec {
  import spark.implicits._

  // fixture: arm A = {10, 12, 14, 16}, arm B = {20, 24, 28} (cents),
  // one bucket. Hand math:
  //   n_a=4 mean_a=13 var_a = ((100+144+196+256) - 52²/4)/3 = (696-676)/3
  //     = 20/3; n_b=3 mean_b=24 var_b = ((400+576+784) - 72²/3)/2
  //     = (1760-1728)/2 = 16
  //   welch: se2 = 20/12 + 16/3 = 7, t = -11/sqrt(7)
  //   student: sp2 = (3·20/3 + 2·16)/5 = 52/5, t = -11/sqrt(52/5 · 7/12)
  private val abRows = Seq(
    (1L, "a", 10L), (1L, "a", 12L), (1L, "a", 14L), (1L, "a", 16L),
    (1L, "b", 20L), (1L, "b", 24L), (1L, "b", 28L),
    (1L, "x", 999L) // neither arm: must be ignored
  ).toDF("bucket", "arm", "y")

  test("abTTest matches hand-computed Welch and Student statistics") {
    val r = StatTests.abTTest(abRows, col("bucket"),
      col("arm") === "a", col("arm") === "b", col("y"))
      .as[(Long, Long, Long, Double, Double, Double, Double, Double, Long)]
      .collect()
    assert(r.length == 1)
    val (_, na, nb, ma, mb, wt, wdf, st, sdf) = r.head
    assert(na == 4 && nb == 3)
    assert(ma == 0.13 && mb == 0.24) // cents/100
    val se2 = 20.0 / 3 / 4 + 16.0 / 3
    assert(math.abs(wt - (0.13 - 0.24) * 100 / math.sqrt(se2)) < 1e-6)
    val vna = 20.0 / 3 / 4; val vnb = 16.0 / 3
    val expectDf = se2 * se2 / (vna * vna / 3 + vnb * vnb / 2)
    assert(math.abs(wdf - expectDf) < 1e-6)
    val sp2 = (3 * (20.0 / 3) + 2 * 16.0) / 5
    assert(math.abs(st - (-11.0) / math.sqrt(sp2 * (1.0 / 4 + 1.0 / 3))) < 1e-6)
    assert(sdf == 5)
  }

  test("abTTest drops undefined buckets: tiny samples and zero variance") {
    val bad = Seq(
      (1L, "a", 10L), (1L, "b", 20L), (1L, "b", 21L), // n_a = 1
      (2L, "a", 5L), (2L, "a", 5L), (2L, "b", 5L), (2L, "b", 5L) // var 0
    ).toDF("bucket", "arm", "y")
    val r = StatTests.abTTest(bad, col("bucket"),
      col("arm") === "a", col("arm") === "b", col("y")).collect()
    assert(r.isEmpty)
  }

  // Mann-Whitney with ties, hand-computed: A = {1, 2, 2}, B = {2, 3}.
  // Sorted: 1(r=1), 2,2,2 (avg rank 3), 3 (r=5).
  //   R1 = 1 + 3 + 3 = 7; U1 = 7 − 3·4/2 = 1
  //   ties: one group of 3 → T = 27 − 3 = 24; n=5
  //   σ² = (3·2/12)·((5+1) − 24/(5·4)) = 0.5·4.8 = 2.4
  //   z = (1 − 3)/√2.4
  test("mannWhitneyU matches hand-computed U and tie-corrected z") {
    val rows = Seq(
      (1L, "a", 1L), (1L, "a", 2L), (1L, "a", 2L),
      (1L, "b", 2L), (1L, "b", 3L)
    ).toDF("bucket", "arm", "y")
    val r = StatTests.mannWhitneyU(rows, col("bucket"),
      col("arm") === "a", col("arm") === "b", col("y"))
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(r.length == 1)
    val (_, n1, n2, u1, z) = r.head
    assert(n1 == 3 && n2 == 2)
    assert(u1 == 1.0)
    assert(math.abs(z - (1.0 - 3.0) / math.sqrt(2.4)) < 1e-6)
  }

  test("mannWhitneyU is invariant to partitioning and drops all-tied buckets") {
    val rows = (1 to 40).map(i =>
      (i % 3L, if (i % 2 == 0) "a" else "b", (i * 7 % 11).toLong)) ++
      Seq((9L, "a", 5L), (9L, "b", 5L)) // bucket 9: every value tied → σ=0
    val df1 = rows.toDF("bucket", "arm", "y").repartition(7)
    val df2 = rows.toDF("bucket", "arm", "y").coalesce(1)
    def run(df: org.apache.spark.sql.DataFrame) =
      StatTests.mannWhitneyU(df, col("bucket"), col("arm") === "a",
        col("arm") === "b", col("y"))
        .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    val a = run(df1)
    assert(a == run(df2))
    assert(!a.exists(_._1 == 9L), "all-tied bucket must be dropped")
  }

  test("contingencyChi2 cells recompose to the textbook Cramér's V") {
    // 2×2 with known margins: rows (x: 30|10), (y: 20|40)
    val rows = Seq.fill(30)(("x", 0L)) ++ Seq.fill(10)(("x", 1L)) ++
      Seq.fill(20)(("y", 0L)) ++ Seq.fill(40)(("y", 1L))
    val cells = StatTests.contingencyChi2(rows.toDF("r", "c"),
      col("r"), col("c"))
      .as[(String, Long, Long, Double, Double)].collect()
    assert(cells.length == 4)
    assert(cells.map(_._3).sum == 100)
    // expected counts from margins: rt(x)=40, rt(y)=60, ct(0)=50, ct(1)=50
    val byCell = cells.map(c => (c._1, c._2) -> c).toMap
    assert(byCell(("x", 0L))._4 == 20.0 && byCell(("y", 1L))._4 == 30.0)
    val chi2 = cells.map(_._5).sum
    // hand χ²: Σ(o−e)²/e = 100/20+100/20+100/30+100/30 = 50/3
    assert(math.abs(chi2 - 50.0 / 3) < 1e-4)
    val v = math.sqrt(chi2 / (100.0 * (math.min(2, 2) - 1)))
    assert(math.abs(v - math.sqrt(1.0 / 6)) < 1e-4)
  }

  test("maxIntersections: overlap peak, first-attained position, half-open ends") {
    val spans = Seq(
      // key 1: [0,10), [5,15), [10,20) → peak 2 first at t=5
      (1L, 0L, 10L), (1L, 5L, 10L), (1L, 10L, 10L),
      // key 2: touching spans never overlap: [0,5), [5,5) zero-len, [5,10)
      (2L, 0L, 5L), (2L, 5L, 0L), (2L, 5L, 5L),
      // key 3: three nested spans → peak 3 at the innermost start
      (3L, 0L, 100L), (3L, 10L, 50L), (3L, 20L, 10L)
    ).toDF("k", "start_us", "dur_us")
      .select(col("k"), timestamp_micros(col("start_us")).as("t"), col("dur_us"))
    val r = Behavior.maxIntersections(spans, "k", "t", col("dur_us"))
      .as[(Long, Long, Long)].collect().map(x => x._1 -> (x._2, x._3)).toMap
    assert(r(1L) == (2L, 5L), s"got ${r(1L)}")
    assert(r(2L) == (1L, 0L), s"touching spans must not stack: ${r(2L)}")
    assert(r(3L) == (3L, 20L), s"got ${r(3L)}")
  }

  test("null measurements drop whole (n and moments stay consistent); null durations are zero spans") {
    val rows = Seq(
      (1L, "a", Some(10L)), (1L, "a", Some(12L)), (1L, "a", None),
      (1L, "b", Some(20L)), (1L, "b", Some(24L)), (1L, "b", None)
    ).toDF("bucket", "arm", "y")
    val t = StatTests.abTTest(rows, col("bucket"),
        col("arm") === "a", col("arm") === "b", col("y"))
      .as[(Long, Long, Long, Double, Double, Double, Double, Double, Long)]
      .collect()
    assert(t.length == 1 && t.head._2 == 2 && t.head._3 == 2,
      s"null rows must not count toward n: ${t.toSeq}")
    assert(!t.head._6.isNaN && !t.head._8.isNaN)
    val m = StatTests.mannWhitneyU(rows, col("bucket"),
        col("arm") === "a", col("arm") === "b", col("y"))
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(m.length == 1 && m.head._2 == 2 && m.head._3 == 2)

    val spans = Seq((1L, 0L, Some(10L)), (1L, 5L, None), (1L, 20L, Some(5L)))
      .toDF("k", "s", "d")
      .select(col("k"), timestamp_micros(col("s")).as("t"), col("d"))
    val r = Behavior.maxIntersections(spans, "k", "t", col("d"))
      .as[(Long, Long, Long)].collect()
    assert(r.length == 1 && r.head._2 == 1L,
      s"null duration must be a zero span: ${r.toSeq}")
  }

  test("maxIntersections is partitioning-invariant") {
    val rnd = new scala.util.Random(7)
    val spans = (1 to 300).map(_ =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(50).toLong))
    def run(np: Int) = {
      val df = spans.toDF("k", "s", "d")
        .repartition(np)
        .select(col("k"), timestamp_micros(col("s")).as("t"), col("d"))
      Behavior.maxIntersections(df, "k", "t", col("d"))
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    }
    assert(run(1) == run(13))
  }

  // A = {1,2,3}, B = {2,3,4}: cum gaps |cumA·n₂ − cumB·n₁| over distinct
  // values = 3,3,3,0 → D = 3/9 = 1/3; λ² = (9/6)·(1/9) = 1/6 and the
  // 3-term series 2(e^{−1/3} − e^{−4/3} + e^{−3}) ≈ 1.005 clamps to 1
  test("ksTest matches the hand-computed supremum and clamps the series") {
    val rows = Seq(
      (1L, "a", 1L), (1L, "a", 2L), (1L, "a", 3L),
      (1L, "b", 2L), (1L, "b", 3L), (1L, "b", 4L),
      (1L, "x", 99L) // neither arm: ignored
    ).toDF("bucket", "arm", "y")
    val r = StatTests.ksTest(rows, col("bucket"),
      col("arm") === "a", col("arm") === "b", col("y"))
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(r.length == 1)
    val (_, n1, n2, d, p) = r.head
    assert(n1 == 3 && n2 == 3)
    assert(d == 0.333333)
    assert(p == 1.0)
  }

  test("ksTest: identical samples give D = 0, disjoint give D = 1; partitioning-invariant") {
    val same = Seq((1L, "a", 5L), (1L, "a", 7L), (1L, "b", 5L), (1L, "b", 7L))
      .toDF("bucket", "arm", "y")
    val sr = StatTests.ksTest(same, col("bucket"),
      col("arm") === "a", col("arm") === "b", col("y"))
      .select("ks_d").as[Double].collect()
    assert(sr.toSeq == Seq(0.0))
    val rnd = new scala.util.Random(11)
    val big = (1 to 500).map(_ => (rnd.nextInt(3).toLong,
      if (rnd.nextBoolean()) "a" else "b", rnd.nextInt(40).toLong))
    def run(np: Int) = {
      val df = big.toDF("bucket", "arm", "y").repartition(np)
      StatTests.ksTest(df, col("bucket"), col("arm") === "a",
        col("arm") === "b", col("y"))
        .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    }
    assert(run(1) == run(13))
    val disj = Seq((1L, "a", 1L), (1L, "a", 2L), (1L, "b", 10L), (1L, "b", 11L))
      .toDF("bucket", "arm", "y")
    assert(StatTests.ksTest(disj, col("bucket"), col("arm") === "a",
      col("arm") === "b", col("y")).select("ks_d").as[Double].head() == 1.0)
  }

  // x ties {1,1,2} → average ranks (1.5, 1.5, 3) against y ranks (1,2,3):
  // Pearson over ranks = 1.5/√(1.5·2) = √3/2
  test("spearmanCorr: monotone ±1, tie-averaged ranks, zero-variance dropped") {
    val mono = Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 40L),
      (2L, 1L, 9L), (2L, 2L, 5L), (2L, 3L, 1L), // anti-monotone
      (3L, 4L, 4L), (3L, 4L, 7L)) // x all tied: dropped
      .toDF("bucket", "x", "y")
    val r = StatTests.spearmanCorr(mono, col("bucket"), col("x"), col("y"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(r == Seq((1L, 3L, 1.0), (2L, 3L, -1.0)))
    val tied = Seq((9L, 1L, 5L), (9L, 1L, 6L), (9L, 2L, 7L))
      .toDF("bucket", "x", "y")
    val rho = StatTests.spearmanCorr(tied, col("bucket"), col("x"), col("y"))
      .select("rho").as[Double].head()
    assert(math.abs(rho - math.sqrt(3.0) / 2) < 1e-6)
  }

  // groups {10,20,30} vs {40,50,60}: tsum = 1200+7500, SSB = 8700−7350 =
  // 1350, SSW = 9100−8700 = 400 → F = 1350/(400/4) = 13.5
  test("anovaF matches the hand-computed F; degenerate buckets drop") {
    val rows = Seq(
      (1L, "a", 10L), (1L, "a", 20L), (1L, "a", 30L),
      (1L, "b", 40L), (1L, "b", 50L), (1L, "b", 60L),
      (2L, "a", 5L), (2L, "a", 6L), // single group: dropped
      (3L, "a", 7L), (3L, "b", 9L)) // zero within-group variance: dropped
      .toDF("bucket", "grp", "y")
    val r = StatTests.anovaF(rows, col("bucket"), col("grp"), col("y"))
      .as[(Long, Long, Long, Double, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 2L, 6L, 13.5, 1L, 4L)))
  }

  test("anovaF is partitioning-invariant") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 400).map(_ => (rnd.nextInt(3).toLong,
      s"g${rnd.nextInt(4)}", rnd.nextInt(50).toLong))
    def run(np: Int) =
      StatTests.anovaF(rows.toDF("bucket", "grp", "y").repartition(np),
        col("bucket"), col("grp"), col("y"))
        .as[(Long, Long, Long, Double, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(1) == run(13))
  }

  test("linReg recovers an exact line; zero x-variance dropped; constant y has null R²") {
    val rows = Seq(
      (1L, 1L, 100L), (1L, 2L, 200L), (1L, 3L, 300L), // y = x (in cents)
      (2L, 5L, 70L), (2L, 5L, 90L), // no x variance: dropped
      (3L, 1L, 40L), (3L, 2L, 40L), (3L, 3L, 40L)) // flat: r2 undefined
      .toDF("bucket", "x", "y")
    val r = StatTests.linReg(rows, col("bucket"), col("x"), col("y"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
        x.getDouble(3), if (x.isNullAt(4)) None else Some(x.getDouble(4))))
      .sortBy(_._1).toSeq
    assert(r == Seq(
      (1L, 3L, 1.0, 0.0, Some(1.0)),
      (3L, 3L, 0.0, 0.4, None)))
  }

  test("momentStats: hand moments; degenerate groups dropped; order-free") {
    // g: cents {1,2,3} → mean 0.02, m2 = 2/3, skew 0 (symmetric),
    //    kurt_pop = m4/m2² = (2/3)/(4/9) = 1.5, excess −1.5
    // h: skewed {0,0,0,4} → mu=1, m2=3, m3=(−1·3+27)/4=6,
    //    skew = 6/(3√3) = 1.154701; m4=(3+81)/4=21, kurt=21/9=2.333333
    // z: constant (m2=0) dropped; w: single row (n<2) dropped
    val rows = Seq(("g", 1L), ("g", 2L), ("g", 3L),
      ("h", 0L), ("h", 0L), ("h", 0L), ("h", 4L),
      ("z", 7L), ("z", 7L), ("w", 9L)).toDF("grp", "y")
    def run(np: Int) =
      StatTests.momentStats(rows.repartition(np), col("grp"), col("y"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(4), r.getDouble(5), r.getDouble(6))).sortBy(_._1).toSeq
    val got = run(1)
    assert(got === Seq(
      ("g", 3L, 0.02, 0.0, 1.5, -1.5),
      ("h", 4L, 0.01, 1.154701, 2.333333, -0.666667)))
    // exact integer sums → identical on any partitioning
    assert(run(7) === got)
  }

  test("momentStats: |cents| past the exact-square bound fails LOUDLY") {
    // y² wraps int64 past |y| = 3037000499 — the exact-or-loud convention
    // demands raise_error, never a silently corrupted s3/s4
    val bad = Seq(("g", 3037000500L), ("g", 1L), ("g", 2L)).toDF("grp", "y")
    val e = intercept[Exception] {
      StatTests.momentStats(bad, col("grp"), col("y")).collect()
    }
    assert(e.getMessage.contains("exact int64 square bound") ||
      Option(e.getCause).exists(_.getMessage.contains("exact int64 square bound")))
    // the bound itself is still exact and fine
    val ok = Seq(("g", 3037000499L), ("g", 0L), ("g", -3037000499L))
      .toDF("grp", "y")
    assert(StatTests.momentStats(ok, col("grp"), col("y")).count() === 1L)
  }

  test("cuped: hand-computed theta/means; pre-only units dropped; order-free") {
    // mid = (0+90)/2 = 45; units 1..4 carry (x,y) = (10,20)(20,10)(30,40)
    // (40,30); unit 5 is pre-only and drops. Pooled: x̄=25 ȳ=25,
    // cov=75 varX=125 → θ=0.6. Variant 1 (u1,u3): ȳ=30 x̄=20 →
    // adj = 30 − 0.6·(20−25) = 33; variant 0: 20 − 0.6·5 = 17.
    // var_cuped both arms: 100 − 2·0.6·100 + 0.36·100 = 16.
    val ev = Seq(
      (1L, 0L, 10L), (1L, 60L, 20L),
      (2L, 10L, 20L), (2L, 70L, 10L),
      (3L, 20L, 30L), (3L, 80L, 40L),
      (4L, 30L, 40L), (4L, 90L, 30L),
      (5L, 5L, 99L)).toDF("u", "us", "y")
    def run(np: Int) =
      StatTests.cuped(ev.repartition(np), col("u"), col("y"), col("us"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
        .toSeq
    val got = run(1)
    assert(got === Seq(
      (0L, 2L, 0.2, 0.17, 0.01, 0.0016, 0.6),
      (1L, 2L, 0.3, 0.33, 0.01, 0.0016, 0.6)))
    assert(run(7) === got)
  }

  test("bhFdr: step-up adjusted p, one-sided reject; degenerate groups drop") {
    // g1: a={0,0,2,2} b={10,10,12,12} → z = −10/√(2/3) = −12.247449,
    //   p≈0; g2: identical arms → z=0, p≈1. BH with m=2: p_adj(g1)=0
    //   (reject), p_adj(g2)=p₂ (keep). g3 has one-sided data and drops;
    //   g4 has zero variance (se=0) and drops.
    val ev = Seq(
      ("g1", true, 0L), ("g1", true, 0L), ("g1", true, 2L), ("g1", true, 2L),
      ("g1", false, 10L), ("g1", false, 10L), ("g1", false, 12L), ("g1", false, 12L),
      ("g2", true, 5L), ("g2", true, 5L), ("g2", true, 5L), ("g2", true, 7L),
      ("g2", false, 5L), ("g2", false, 5L), ("g2", false, 5L), ("g2", false, 7L),
      ("g3", true, 1L), ("g3", true, 2L),
      ("g4", true, 3L), ("g4", true, 3L), ("g4", false, 3L), ("g4", false, 3L))
      .toDF("g", "a", "y")
    val r = StatTests.bhFdr(ev, col("g"), col("a"), col("y"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getDouble(4), x.getDouble(5), x.getBoolean(6)))
      .toSeq
    assert(r.map(_._1) == Seq("g1", "g2"))
    val g1 = r(0); val g2 = r(1)
    assert(g1._2 == 4L && g1._3 == 4L && g1._4 == -12.247449)
    assert(g1._5 == 0.0 && g1._6 == 0.0 && g1._7)
    assert(g2._4 == 0.0 && g2._5 > 0.9 && g2._6 == g2._5 && !g2._7)
  }

  test("proportionsZTest: pooled z, A&S p, unpooled CI vs a direct replica") {
    // one bucket: cohort a = 2/4 successes, cohort b = 1/4
    val ev = Seq(
      (0L, true, true), (0L, true, true), (0L, true, false), (0L, true, false),
      (0L, false, true), (0L, false, false), (0L, false, false), (0L, false, false))
      .toDF("g", "a", "s")
    val r = StatTests.proportionsZTest(ev, col("g"), col("a"), col("s"))
      .collect()(0)
    def rnd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (pa, pb, pp) = (0.5, 0.25, 3.0 / 8.0)
    val z = (pa - pb) / math.sqrt(pp * (1.0 - pp) * (1.0 / 4.0 + 1.0 / 4.0))
    val k = 1.0 / (1.0 + 0.2316419 * math.abs(z))
    val poly = k * (0.319381530 + k * (-0.356563782 + k * (1.781477937 +
      k * (-1.821255978 + k * 1.330274429))))
    val pv = 2.0 * (math.exp(math.abs(z) * math.abs(z) * -0.5)
      * 0.3989422804014327) * poly
    val seci = math.sqrt(pa * (1 - pa) / 4.0 + pb * (1 - pb) / 4.0)
    assert(r.getLong(1) == 4L && r.getLong(2) == 4L)
    assert(r.getDouble(3) == 0.5 && r.getDouble(4) == 0.25)
    assert(r.getDouble(5) == rnd(z) && r.getDouble(6) == rnd(pv))
    assert(r.getDouble(7) == rnd(pa - pb - 1.9599639845400545 * seci))
    assert(r.getDouble(8) == rnd(pa - pb + 1.9599639845400545 * seci))
    // all-success pooled proportion = 1 → zero variance → dropped
    val flat = Seq((0L, true, true), (0L, false, true)).toDF("g", "a", "s")
    assert(StatTests.proportionsZTest(flat, col("g"), col("a"), col("s"))
      .count() == 0)
  }

  test("pairedTTest: within-unit diffs; one-sided units drop") {
    // mid = (0+100)/2 = 50. diffs: u1 = 20−10 = 10, u2 = 25−30 = −5,
    // u3 = 20−5 = 15; u4 (post-only) drops.
    val ev = Seq(
      (1L, 0L, 10L), (1L, 60L, 20L), (2L, 10L, 30L), (2L, 70L, 25L),
      (3L, 20L, 5L), (3L, 80L, 20L), (4L, 90L, 99L)).toDF("u", "us", "y")
    val r = StatTests.pairedTTest(ev, col("u"), col("y"), col("us"))
      .collect()(0)
    def rnd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mean = 20.0 / 3.0
    val sv = ((100.0 + 25.0 + 225.0) - 20.0 * 20.0 / 3.0) / 2.0
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == rnd(mean / 100.0))
    assert(r.getDouble(2) == rnd(mean / math.sqrt(sv / 3.0)))
  }

  test("cramersV: textbook 2x2 V = 0.5, Bergsma correction, level drop") {
    // cells 30/10/10/30: margins all 40, e = 20, chi2 = 4·(100/20) = 20,
    // V = sqrt(20/80) = 0.5; phi2+ = 0.25 − 1/79, rT = cT = 2 − 1/79
    val rows = (Seq.fill(30)(("a", 0)) ++ Seq.fill(10)(("a", 1)) ++
      Seq.fill(10)(("b", 0)) ++ Seq.fill(30)(("b", 1))).toDF("x", "y")
    val r = StatTests.cramersV(rows, col("x"), col("y")).collect()(0)
    def rnd(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) == 80L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 20.0 && r.getDouble(4) == 0.5)
    val phi2p = 0.25 - 1.0 / 79.0
    val shrunk = 2.0 - 1.0 / 79.0
    assert(math.abs(r.getDouble(5) - rnd(math.sqrt(phi2p / (shrunk - 1.0))))
      <= 1e-6)
    // a single-level column → no row
    val flat = Seq(("a", 0), ("a", 1)).toDF("x", "y")
    assert(StatTests.cramersV(flat, col("x"), col("y")).count() == 0)
  }

  test("theilsU: hand entropies, perfect knowledge = 1, degenerate drop") {
    // cells: (a,0)=2 (a,1)=2 (b,0)=4; N=8. H(X)=ln2;
    // H(X|Y) = 0.25·ln3 + 0.5·ln1.5; U = 1 − H(X|Y)/ln2
    val rows = (Seq.fill(2)(("a", 0)) ++ Seq.fill(2)(("a", 1)) ++
      Seq.fill(4)(("b", 0))).toDF("x", "y")
    val r = StatTests.theilsU(rows, col("x"), col("y")).collect()(0)
    def rnd(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val hxy = 0.25 * math.log(3.0) + 0.5 * math.log(1.5)
    assert(r.getLong(0) == 8L)
    assert(math.abs(r.getDouble(1) - rnd(math.log(2.0))) <= 1e-6)
    assert(math.abs(r.getDouble(2) - rnd(hxy)) <= 1e-6)
    assert(math.abs(r.getDouble(3) -
      rnd((math.log(2.0) - hxy) / math.log(2.0))) <= 1e-6)
    // Y determines X exactly → U = 1
    val perfect = (Seq.fill(3)(("a", 0)) ++ Seq.fill(5)(("b", 1)))
      .toDF("x", "y")
    assert(StatTests.theilsU(perfect, col("x"), col("y"))
      .collect()(0).getDouble(3) == 1.0)
    // one distinct X → H(X) = 0 → no row, never a division blowup
    val flat = Seq(("a", 0), ("a", 1), ("a", 0)).toDF("x", "y")
    assert(StatTests.theilsU(flat, col("x"), col("y")).count() == 0)
  }

  test("bartlett matches the hand-computed statistic; degenerate buckets " +
    "drop whole") {
    // bucket 1 = the abTTest fixture: s²_a = 20/3 (n=4), s²_b = 16 (n=3)
    // a = 3·20/3 + 2·16 = 52, s_p² = 52/5, c = 1/3 + 1/2,
    // C = 1 + (5/6 − 1/5)/3, χ² = (5·ln(10.4) − b)/C
    // degenerate buckets drop WHOLE: bucket 1's 'x' arm is a singleton
    // (n=1), bucket 2's 'a' arm has zero variance — neither may emit
    val rows = abRows.union(Seq(
      (2L, "a", 5L), (2L, "a", 5L), (2L, "b", 1L), (2L, "b", 9L)
    ).toDF("bucket", "arm", "y"))
    assert(StatTests.bartlett(rows, col("bucket"), col("arm"), col("y"))
      .count() == 0)
    val clean = abRows.where(col("arm") =!= "x")
    val got = StatTests.bartlett(clean, col("bucket"), col("arm"), col("y"))
      .collect()
    assert(got.length == 1)
    val b = 3.0 * math.log(20.0 / 3.0) + 2.0 * math.log(16.0)
    val cc = 1.0 / 3.0 + 1.0 / 2.0
    val corr = 1.0 + (cc - 1.0 / 5.0) / 3.0
    val want = (5.0 * math.log(52.0 / 5.0) - b) / corr
    def rnd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0).getLong(1) == 2L && got(0).getLong(2) == 7L)
    assert(math.abs(got(0).getDouble(3) - rnd(want)) <= 1e-6)
    assert(got(0).getLong(4) == 1L)
  }

  test("wilcoxonSignedRank: hand-computed midranks, ties, zero-diff drop") {
    // mid = (0+100)/2 = 50. diffs: u1 = +10, u2 = −5, u3 = +15,
    // u4 = +10, u5 = 0 (drops), u6 one-sided (drops). |d| order:
    // 5(neg, r=1), {10,10}(pos, midrank 2.5), 15(pos, r=4) →
    // W+ = 2.5+2.5+4 = 9; n=4, μ = 5; tie group of 2 → Σ(t³−t) = 6;
    // σ² = 4·5·9/24 − 6/48 = 7.375
    val ev = Seq(
      (1L, 0L, 10L), (1L, 60L, 20L), (2L, 10L, 30L), (2L, 70L, 25L),
      (3L, 20L, 5L), (3L, 80L, 20L), (4L, 30L, 8L), (4L, 90L, 18L),
      (5L, 40L, 7L), (5L, 95L, 7L), (6L, 100L, 99L)).toDF("u", "us", "y")
    val r = StatTests.wilcoxonSignedRank(ev, col("u"), col("y"), col("us"))
      .collect()(0)
    def rnd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 9.0)
    assert(r.getDouble(2) == rnd(4.0 / math.sqrt(7.375)))
  }

  test("wilcoxonSignedRank: fewer than two nonzero diffs yields no row") {
    // both units diff to zero → n = 0; then one nonzero diff → n = 1
    val allZero = Seq((1L, 0L, 5L), (1L, 100L, 5L),
      (2L, 10L, 9L), (2L, 90L, 9L)).toDF("u", "us", "y")
    assert(StatTests.wilcoxonSignedRank(allZero, col("u"), col("y"),
      col("us")).count() == 0)
    val one = Seq((1L, 0L, 5L), (1L, 100L, 8L),
      (2L, 10L, 9L), (2L, 90L, 9L)).toDF("u", "us", "y")
    assert(StatTests.wilcoxonSignedRank(one, col("u"), col("y"),
      col("us")).count() == 0)
  }

  test("minSampleSizeMeans: observed-variance planner; flat groups drop") {
    // g: cents {100, 200} → σ²_pop = 2500 (σ = $0.50); z: constant drops
    val ev = Seq(("g", 100L), ("g", 200L), ("z", 7L), ("z", 7L))
      .toDF("grp", "y")
    val r = StatTests.minSampleSizeMeans(ev, col("grp"), col("y"), 0.05)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getDouble(2),
        x.getLong(3))).toSeq
    val zs = 1.9599639845400545 + 0.8416212335729143
    val want = math.ceil(2.0 * zs * zs * 2500.0 / ((0.05 * 100.0) * (0.05 * 100.0))).toLong
    assert(r === Seq(("g", 2L, 0.5, want)))
  }

  test("srmCheck counts UNITS, not events; alarm fires on a broken split") {
    // bucket 0: units a = {2,4,6} (user 2 has 3 events — still one unit),
    // b = {1} → z = 2/√4 = 1.0, no alarm. bucket 1: 100 a-units, 0 b →
    // z = 10, p ≈ 0 → alarm.
    val ev = (Seq((0L, 2L), (0L, 2L), (0L, 2L), (0L, 4L), (0L, 6L), (0L, 1L))
      ++ (1 to 100).map(i => (1L, 2L * i.toLong + 100L)))
      .toDF("g", "u")
    val r = StatTests.srmCheck(ev, col("g"), col("u"), col("u") % 2 === 0)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getBoolean(5))).sortBy(_._1).toSeq
    assert(r(0) == ((0L, 3L, 1L, 1.0, false)))
    assert(r(1)._2 == 100L && r(1)._3 == 0L && r(1)._4 == 10.0 && r(1)._5)
  }

  test("trimmedMean: exact integer trim at distinct-value grain, ties clamp") {
    // g: {0, 2..9, 100} — k=1 drops the 0 and the 100: mean 44/8 = 5.5
    // cents vs raw 14.4; h (p=0.25): {1,1,2,3} k=1 → drop one 1 and the
    // 3, keep {1,2} → 1.5 cents
    val g = (Seq(0L, 100L) ++ (2L to 9L)).map(("g", _))
    val h = Seq(("h", 1L), ("h", 1L), ("h", 2L), ("h", 3L))
    def run(df: org.apache.spark.sql.DataFrame, p: Double, np: Int) =
      StatTests.trimmedMean(df.repartition(np), col("grp"), col("y"), p)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4))).sortBy(_._1).toSeq
    val got = run(g.toDF("grp", "y"), 0.1, 1)
    assert(got === Seq(("g", 10L, 1L, 0.055, 0.144)))
    assert(run(g.toDF("grp", "y"), 0.1, 7) === got)
    assert(run(h.toDF("grp", "y"), 0.25, 1) ===
      Seq(("h", 4L, 1L, 0.015, 0.0175)))
  }

  test("interarrivalExpFit matches a direct replica on hand gaps") {
    // one user at seconds {0,1,3,7} → gaps {1,2,4}: λ = 3/7, KS vs the
    // fitted exponential computed by an independent replica
    val ev = Seq((1L, 0L, 1L), (1L, 1000000L, 2L), (1L, 3000000L, 3L),
      (1L, 7000000L, 4L), (2L, 5000000L, 5L)) // lone event: no gap
      .toDF("u", "us", "eid")
      .select(col("u"), timestamp_micros(col("us")).as("ts"), col("eid"))
    val r = StatTests.interarrivalExpFit(ev, col("u"), col("ts"),
      col("eid")).collect()(0)
    def rnd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lam = 3.0 / 7.0
    val gaps = Seq(1L, 2L, 4L)
    val d = gaps.zipWithIndex.flatMap { case (g, i) =>
      val fExp = 1.0 - math.exp(-lam * g.toDouble)
      Seq(math.abs((i + 1) / 3.0 - fExp), math.abs(i / 3.0 - fExp))
    }.max
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == rnd(lam) && r.getDouble(2) == rnd(d))
    // all-zero gaps: λ undefined → empty, loudly
    val burst = Seq((1L, 0L, 1L), (1L, 0L, 2L)).toDF("u", "us", "eid")
      .select(col("u"), timestamp_micros(col("us")).as("ts"), col("eid"))
    assert(StatTests.interarrivalExpFit(burst, col("u"), col("ts"),
      col("eid")).count() == 0)
  }

  test("ratioZTest matches a plain-Scala delta-method replica") {
    // unit totals — arm A (even u): (1,4) (2,6) (0,5); arm B: (2,4) (3,5)
    val rows = Seq(
      (0L, 1L, 4L), (2L, 2L, 6L), (4L, 0L, 5L),
      (1L, 2L, 4L), (3L, 3L, 5L))
    val ev = rows.flatMap { case (u, n, dd) =>
      Seq.fill(n.toInt)((u, 1L, 0L)) ++ Seq.fill(dd.toInt)((u, 0L, 1L))
    }.toDF("u", "n", "dd")
    val got = StatTests.ratioZTest(ev, col("u"), col("n"), col("dd"))
      .as[(Long, Long, Double, Double, Double, Double, Double)].head()
    def rnd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def stats(arm: Seq[(Long, Long)]): (Double, Double) = {
      val k = arm.size.toDouble
      val sn = arm.map(_._1).sum.toDouble
      val sd = arm.map(_._2).sum.toDouble
      val snn = arm.map(t => t._1 * t._1).sum.toDouble
      val snd = arm.map(t => t._1 * t._2).sum.toDouble
      val sdd = arm.map(t => t._2 * t._2).sum.toDouble
      val r = sn / sd
      val vn = snn / k - (sn / k) * (sn / k)
      val vd = sdd / k - (sd / k) * (sd / k)
      val cnd = snd / k - (sn / k) * (sd / k)
      val dbar = sd / k
      (r, (vn - 2.0 * r * cnd + r * r * vd) / (k * dbar * dbar))
    }
    val (ra, va) = stats(rows.filter(_._1 % 2 == 0).map(t => (t._2, t._3)))
    val (rb, vb) = stats(rows.filter(_._1 % 2 == 1).map(t => (t._2, t._3)))
    val z = (rb - ra) / math.sqrt(va + vb)
    assert(got._1 == 3L && got._2 == 2L)
    assert(got._3 == rnd(ra) && got._4 == rnd(rb))
    assert(got._6 == rnd(z))
    assert(got._7 > 0.0 && got._7 <= 1.0)
    // an arm with a zero denominator total has no ratio: empty, loudly
    val noDen = Seq((0L, 1L, 0L), (2L, 2L, 0L), (1L, 1L, 3L), (3L, 0L, 2L))
      .toDF("u", "n", "dd")
    assert(StatTests.ratioZTest(noDen, col("u"), col("n"), col("dd"))
      .count() == 0)
  }

  test("msprt matches a plain-Scala replica day by day; p_running monotone") {
    // three days, arms by user parity (even=A, odd=B); values in cents
    val rows = Seq(
      // day 1: A {100, 200}, B {400}
      (0L, 1L, 100L), (2L, 1L, 200L), (1L, 1L, 400L),
      // day 2: A {300}, B {500, 100}
      (4L, 2L, 300L), (3L, 2L, 500L), (5L, 2L, 100L),
      // day 3: A {250}, B {50}
      (6L, 3L, 250L), (7L, 3L, 50L))
    val ev = rows.toDF("u", "d", "y")
      .select(col("u"),
        timestamp_micros(col("d") * 86400000000L).as("ts"), col("y"))
    val got = StatTests.msprt(ev, col("u"), col("y"), col("ts"))
      .as[(java.sql.Date, Long, Long, Double, Double, Double, Double)]
      .collect().sortBy(_._1.getTime)
    def rnd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // replica: cumulative moments per arm, lnΛ per day
    val byDay = rows.groupBy(_._2).toSeq.sortBy(_._1)
    var (na, sa, ssa, nb, sb, ssb) = (0L, 0L, 0L, 0L, 0L, 0L)
    val exp0 = byDay.map { case (_, rs) =>
      rs.foreach { case (u, _, y) =>
        if (u % 2 == 0) { na += 1; sa += y; ssa += y * y }
        else { nb += 1; sb += y; ssb += y * y }
      }
      val dc = sb.toDouble / nb - sa.toDouble / na
      val s2 = ((ssa - sa.toDouble * sa / na) + (ssb - sb.toDouble * sb / nb)) / (na + nb)
      val vc = s2 * (1.0 / na + 1.0 / nb)
      val llr = 0.5 * math.log(vc / (vc + 100.0)) +
        dc * dc * 100.0 / (2.0 * vc * (vc + 100.0))
      (na, nb, rnd(dc / 100.0), rnd(llr), rnd(math.min(1.0, math.exp(-llr))))
    }
    assert(got.length == 3)
    got.zip(exp0).foreach { case (g, e) =>
      assert((g._2, g._3, g._4, g._5, g._6) === e, s"day ${g._1}")
    }
    // always-valid p never rises
    val runs = got.map(_._7)
    assert(runs.zip(runs.drop(1)).forall { case (a, b) => b <= a })
    assert(runs.zip(got.map(_._6)).forall { case (r, p) => r <= p })
  }

  test("msprt drops zero-variance prefixes loudly, not as fake p = 1") {
    // day 1: both arms constant at 100 → σ̂² = 0, no readout; day 2 adds
    // spread → exactly one row
    val ev = Seq((0L, 1L, 100L), (1L, 1L, 100L), (2L, 2L, 300L),
      (3L, 2L, 500L)).toDF("u", "d", "y")
      .select(col("u"),
        timestamp_micros(col("d") * 86400000000L).as("ts"), col("y"))
    val got = StatTests.msprt(ev, col("u"), col("y"), col("ts")).collect()
    assert(got.length == 1)
  }

  test("weightedQuantiles: accumulate-until-threshold picks, weight " +
    "merging, zero-weight drop") {
    // g=a: v=1 w=1, v=2 w=2 (two rows merged), v=3 w=1 → W=4
    //   q=250: thr 1000 = cumw(1)·1000 → v=1 (prev 0 < 1000)
    //   q=500: cumw(2)=3 → 3000 ≥ 2000, prev 1000 < 2000 → v=2
    //   q=1000: v=3
    val rows = Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 2L, 1L),
      ("a", 3L, 1L), ("a", 9L, 0L) // zero weight: invisible
    ).toDF("g", "v", "w")
    val got = StatTests.weightedQuantiles(rows, col("g"), col("v"),
      col("w"), Seq(250, 500, 1000))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(got.toSeq == Seq(("a", 250L, 1L), ("a", 500L, 2L),
      ("a", 1000L, 3L)))
  }

  test("weightedQuantiles is partitioning-invariant") {
    val rows = (1L to 40L).map(i => ("g" + (i % 2), i % 7, i % 5 + 1))
      .toDF("g", "v", "w")
    val a = StatTests.weightedQuantiles(rows.repartition(1), col("g"),
      col("v"), col("w"), Seq(500, 900)).collect().toSet
    val b = StatTests.weightedQuantiles(rows.repartition(13), col("g"),
      col("v"), col("w"), Seq(500, 900)).collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("gTest matches the hand-computed log-likelihood ratio; single-" +
    "level inputs drop") {
    // 2×2: [[10, 20], [20, 10]] → margins all 30, N = 60,
    // G = 2·(10·ln(10·60/900) + 20·ln(20·60/900)) · 2
    val rows = (Seq.fill(10)(("x", 0L)) ++ Seq.fill(20)(("x", 1L)) ++
      Seq.fill(20)(("y", 0L)) ++ Seq.fill(10)(("y", 1L))).toDF("r", "c")
    val got = StatTests.gTest(rows, col("r"), col("c"))
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.length == 1)
    val (n, rl, cl, dof, g) = got.head
    assert(n == 60 && rl == 2 && cl == 2 && dof == 1)
    val expect = 2.0 * 2.0 *
      (10.0 * math.log(10.0 * 60 / 900) + 20.0 * math.log(20.0 * 60 / 900))
    assert(math.abs(g - expect) < 1e-5)
    // one row level → undefined, dropped loudly-by-absence
    assert(StatTests.gTest(rows.where(col("r") === "x"), col("r"),
      col("c")).collect().isEmpty)
  }

  test("gTest is partitioning-invariant (fixed-order fold)") {
    val rows = (1L to 300L).map(i => ("r" + (i % 5), i % 24))
      .toDF("r", "c")
    val a = StatTests.gTest(rows.repartition(1), col("r"), col("c"))
      .collect().toSeq
    val b = StatTests.gTest(rows.repartition(17), col("r"), col("c"))
      .collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("ljungBoxDaily matches a plain-Scala replica on a hand series") {
    val xs = Seq(5, 3, 8, 2, 7, 7, 1, 4, 6, 2)
    val ev = xs.zipWithIndex.flatMap { case (x, day) =>
      (0 until x).map(j => (day.toLong * 86400000000L + j * 1000L, 1L))
    }.toDF("us", "one")
      .select(timestamp_micros(col("us")).as("ts"))
    val got = StatTests.ljungBoxDaily(ev, "ts", 3)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.length == 3 && got.forall(_._2 == xs.length))
    val n = xs.length.toDouble
    val xbar = xs.sum / n
    val denom = xs.map(x => x.toDouble * x).sum - n * xbar * xbar
    def rho(k: Int): Double = {
      val pairs = xs.drop(k).zip(xs.dropRight(k))
      (pairs.map { case (a, b) => a.toDouble * b }.sum
        - xbar * (pairs.map(_._1.toDouble).sum + pairs.map(_._2.toDouble).sum)
        + pairs.length * xbar * xbar) / denom
    }
    var q = 0.0
    (1 to 3).foreach { k =>
      q += rho(k) * rho(k) / (n - k)
      val row = got(k - 1)
      assert(math.abs(row._3 - rho(k)) < 1e-5, s"rho lag $k")
      assert(math.abs(row._4 - n * (n + 2.0) * q) < 1e-4, s"q lag $k")
    }
  }

  test("ljungBoxDaily: series shorter than maxLag + 2 yields no rows") {
    val ev = Seq(0L, 86400000000L).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    assert(StatTests.ljungBoxDaily(ev, "ts", 3).collect().isEmpty)
  }

  test("multiLinReg recovers an exact plane; collinear and constant-y " +
    "designs behave") {
    // y = 300 + 200·x1 + 500·x2 cents, exact fit → b/100 and r2 = 1
    val plane = for (a <- 0L to 3L; b <- 0L to 2L)
      yield ("fit", a, b, 300L + 200L * a + 500L * b)
    // x2 ≡ x1: singular design, must drop
    val coll = (0L to 5L).map(i => ("collinear", i, i, 100L * i))
    // constant y: fits, but r2 undefined → NULL
    val const = for (a <- 0L to 2L; b <- 0L to 2L)
      yield ("const", a, b, 500L)
    val got = StatTests.multiLinReg((plane ++ coll ++ const)
        .toDF("g", "a", "b", "y"),
      col("g"), col("a"), col("b"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!got.contains("collinear"))
    val f = got("fit")
    assert(f.getLong(1) == 12 && f.getDouble(2) == 3.0 &&
      f.getDouble(3) == 2.0 && f.getDouble(4) == 5.0 &&
      f.getDouble(5) == 1.0)
    val c = got("const")
    assert(c.getDouble(2) == 5.0 && c.getDouble(3) == 0.0 &&
      c.getDouble(4) == 0.0 && c.isNullAt(5))
  }

  test("poissonRateTest: hand Wald z, exposure from distinct units; " +
    "one-armed buckets drop") {
    // A: units {2,4}, 6 events; B: unit {1}, 1 event; span 10 →
    // T_a = 20, T_b = 10, z = (0.3 − 0.1)/√(6/400 + 1/100)
    val rows = (Seq.fill(3)((1L, 2L)) ++ Seq.fill(3)((1L, 4L)) ++
      Seq((1L, 1L)) ++ Seq((2L, 2L))) // bucket 2: A only → drops
      .zipWithIndex.map { case ((b, u), _) => (b, u) }
      .toDF("bucket", "u")
    val got = StatTests.poissonRateTest(rows, col("bucket"),
      col("u") % 2 === 0, col("u"), spanUnits = 10.0).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(1) == 6 && r.getLong(2) == 1 &&
      r.getLong(3) == 2 && r.getLong(4) == 1)
    assert(r.getDouble(5) == 0.3 && r.getDouble(6) == 0.1)
    val z = 0.2 / math.sqrt(6.0 / 400 + 1.0 / 100)
    assert(math.abs(r.getDouble(7) - z) < 1e-6)
  }

  test("meanZTest: hand z with known variances; one-armed buckets drop") {
    // A = {100, 200} mean 150; B = {300}; σ²_a = 100, σ²_b = 400
    // se = √(100/2 + 400/1) = √450; z = −150/√450
    val rows = Seq((1L, "a", 100L), (1L, "a", 200L), (1L, "b", 300L),
      (2L, "a", 10L)).toDF("bucket", "arm", "y")
    val got = StatTests.meanZTest(rows, col("bucket"),
      col("arm") === "a", col("arm") === "b", col("y"),
      varA = 100.0, varB = 400.0)
      .collect()
    assert(got.length == 1) // bucket 2 has no B arm
    val r = got.head
    assert(r.getLong(1) == 2 && r.getLong(2) == 1)
    assert(r.getDouble(3) == 1.5 && r.getDouble(4) == 3.0)
    val z = -150.0 / math.sqrt(450.0)
    assert(math.abs(r.getDouble(5) - z) < 1e-6)
    // CI brackets the difference at the default critical value
    val se = math.sqrt(450.0)
    assert(math.abs(r.getDouble(7) - (-150.0 - 1.959963984540054 * se) / 100.0) < 1e-6)
    assert(math.abs(r.getDouble(8) - (-150.0 + 1.959963984540054 * se) / 100.0) < 1e-6)
  }

  test("mixU01 replays the reference draws; poissonW hits the literal " +
    "thresholds") {
    // reference values computed by an independent (python, arbitrary-
    // precision) implementation of the same mix — pins the decimal
    // arithmetic lane against off-by-one, rounding, and scale bugs
    val expect = Map(0L -> 0.6312014379045888, 1L -> 0.47991339841475267,
      2L -> 0.09136266541427462, 12345L -> 0.9043818082550305,
      99999999L -> 0.4039051255281201)
    val got = expect.keys.toSeq.toDF("k")
      .select(col("k"), StatTests.mixU01(col("k")).as("u"),
        StatTests.poissonW(StatTests.mixU01(col("k"))).as("w"))
      .as[(Long, Double, Long)].collect()
    got.foreach { case (k, u, w) =>
      assert(u == expect(k), s"key $k")
      assert(u >= 0.0 && u < 1.0)
      // w is the count of thresholds below u
      val th = Seq(0.36787944117144233, 0.7357588823428847,
        0.9196986029286058, 0.9810118431238463, 0.9963401531726563,
        0.9994058151824183, 0.999916758850712)
      assert(w == th.count(_ <= u), s"key $k")
    }
    // the native 64-bit Mersenne-fold lane and the decimal(38,0) lane
    // (the tree the DuckDB oracle mirrors) are bit-equal draw for draw
    val lanes = (0L until 5000L).map(k => k * 4099L + 7L).toDF("k")
      .select(StatTests.mixU01(col("k")).as("a"),
        StatTests.mixU01Decimal(col("k")).as("b"))
      .as[(Double, Double)].collect()
    assert(lanes.forall { case (x, y) => x == y })
    // weight distribution sanity over many keys: ~e^-1 zeros, mean ~1
    val ws = (0L until 20000L).toDF("k")
      .select(StatTests.poissonW(StatTests.mixU01(col("k"))).as("w"))
      .as[Long].collect()
    val zeroFrac = ws.count(_ == 0L).toDouble / ws.length
    assert(math.abs(zeroFrac - 0.3679) < 0.02)
    assert(math.abs(ws.sum.toDouble / ws.length - 1.0) < 0.03)
  }

  test("poissonBootstrapCi: deterministic, partitioning-invariant, CI " +
    "brackets the mean and respects the order-statistic convention") {
    val rows = (1L to 400L).map(i => ("g", i, (i * 13) % 500))
      .toDF("g", "u", "y")
    val a = StatTests.poissonBootstrapCi(rows.repartition(1), col("g"),
      col("u"), col("y"), b = 100).collect().toSeq
    val bb = StatTests.poissonBootstrapCi(rows.repartition(7), col("g"),
      col("u"), col("y"), b = 100).collect().toSeq
    assert(a == bb && a.length == 1)
    val r = a.head
    val (n, mean, lo, hi) = (r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4))
    assert(n == 400 && lo < mean && mean < hi)
    // 95% CI at n=400: half-width a small fraction of the mean
    assert((hi - lo) / mean < 0.3)
  }

  test("multiLinReg is order-free: exact moments, fixed scalar tree") {
    val rows = (1L to 200L).map(i =>
      ("g", i % 24, i % 7, (i * 37) % 1000)).toDF("g", "a", "b", "y")
    val x = StatTests.multiLinReg(rows.repartition(1), col("g"), col("a"),
      col("b"), col("y")).collect().toSeq
    val y = StatTests.multiLinReg(rows.repartition(11), col("g"), col("a"),
      col("b"), col("y")).collect().toSeq
    assert(x == y && x.nonEmpty)
  }

  test("rank-family binScale: a planted high-cardinality input bins as " +
    "documented — injective binning is EXACT, coarse binning bounds the " +
    "grain and approximates") {
    // 20k rows, one bucket, every value distinct (the near-continuous
    // measurement the cardinality contract is about): arm A uniform on
    // [0, 20000) cents, arm B shifted by +1500 — all values ≡ 0 (mod 4)
    // so a binScale of 1/4 is INJECTIVE on the data
    val rows = (0 until 20000).map { i =>
      val a = i % 2 == 0
      val v = if (a) (i / 2) * 4L else (i / 2) * 4L + 1500L * 4L
      ("g", a, !a, v)
    }.toDF("g", "a", "b", "y")
    val exactMw = StatTests.mannWhitneyU(rows, col("g"), col("a"), col("b"),
      col("y")).collect()(0)
    // injective binning (each bin holds exactly one distinct value):
    // identical statistic bit-for-bit — binning only coarsens TIES
    val injMw = StatTests.mannWhitneyU(rows, col("g"), col("a"), col("b"),
      col("y"), binScale = 0.25).collect()(0)
    assert(injMw.getDouble(3) === exactMw.getDouble(3)) // u1
    assert(injMw.getDouble(4) === exactMw.getDouble(4)) // z
    // coarse binning (1/400 → ~215 bins for an 86k-value range) bounds the
    // distinct grain at (range)·binScale and approximates the exact z
    val coarseMw = StatTests.mannWhitneyU(rows, col("g"), col("a"), col("b"),
      col("y"), binScale = 1.0 / 400).collect()(0)
    assert(math.abs(coarseMw.getDouble(4) - exactMw.getDouble(4)) <
      math.abs(exactMw.getDouble(4)) * 0.05,
      s"coarse-binned z ${coarseMw.getDouble(4)} strayed from " +
        s"${exactMw.getDouble(4)}")

    val exactKs = StatTests.ksTest(rows, col("g"), col("a"), col("b"),
      col("y")).collect()(0)
    val injKs = StatTests.ksTest(rows, col("g"), col("a"), col("b"),
      col("y"), binScale = 0.25).collect()(0)
    assert(injKs.getDouble(3) === exactKs.getDouble(3)) // ks_d
    val coarseKs = StatTests.ksTest(rows, col("g"), col("a"), col("b"),
      col("y"), binScale = 1.0 / 400).collect()(0)
    // D on binned CDFs can move by at most one bin's mass per side
    assert(math.abs(coarseKs.getDouble(3) - exactKs.getDouble(3)) < 0.03)

    val xy = (0 until 20000).map { i =>
      ("g", i * 4L, i * 4L + (i % 97) * 8L) // monotone-ish, all distinct
    }.toDF("g", "x", "y")
    val exactSp = StatTests.spearmanCorr(xy, col("g"), col("x"), col("y"))
      .collect()(0)
    val injSp = StatTests.spearmanCorr(xy, col("g"), col("x"), col("y"),
      binScale = 0.25).collect()(0)
    assert(injSp.toSeq === exactSp.toSeq)
    val coarseSp = StatTests.spearmanCorr(xy, col("g"), col("x"), col("y"),
      binScale = 1.0 / 400).collect()(0)
    val rhoIdx = exactSp.length - 1
    assert(math.abs(coarseSp.getDouble(rhoIdx) - exactSp.getDouble(rhoIdx))
      < 0.02)
    intercept[IllegalArgumentException] {
      StatTests.mannWhitneyU(rows, col("g"), col("a"), col("b"), col("y"),
        binScale = -1.0)
    }
  }
}
