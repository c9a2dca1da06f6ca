package graft

import graft.expressions.StatMath

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form anchors for the special-function kernel behind the SQL
  * stat aggregates' p-values. No reference library exists in this
  * sandbox, so the pins are exact identities: Student's t with 1 df is
  * Cauchy (p = 1 − (2/π)·arctan|t|), with 2 df has the elementary CDF
  * (p = 1 − t/√(t²+2)), and the large-df limit is the normal tail.
  */
class StatAggregatesSpec extends AnyFunSuite {

  test("logGamma matches exact factorials and the half-integer identity") {
    for (n <- 1 to 12)
      assert(math.abs(StatMath.logGamma(n + 1.0) -
        math.log((1L to n).map(_.toDouble).product)) < 1e-10, s"n=$n")
    // Γ(1/2) = √π
    assert(math.abs(StatMath.logGamma(0.5) - 0.5 * math.log(math.Pi)) < 1e-12)
    // Γ(3/2) = √π/2
    assert(math.abs(StatMath.logGamma(1.5) -
      (0.5 * math.log(math.Pi) - math.log(2.0))) < 1e-12)
  }

  test("regIncBeta: bounds, symmetry, and the uniform special case") {
    assert(StatMath.regIncBeta(0.0, 2, 3) == 0.0)
    assert(StatMath.regIncBeta(1.0, 2, 3) == 1.0)
    // I_x(1,1) = x (Beta(1,1) is uniform)
    for (x <- Seq(0.1, 0.25, 0.5, 0.9))
      assert(math.abs(StatMath.regIncBeta(x, 1, 1) - x) < 1e-12, s"x=$x")
    // symmetry: I_x(a,b) = 1 − I_{1−x}(b,a)
    for ((x, a, b) <- Seq((0.3, 2.5, 4.0), (0.7, 1.0, 0.5), (0.12, 6.0, 2.0)))
      assert(math.abs(StatMath.regIncBeta(x, a, b) -
        (1.0 - StatMath.regIncBeta(1.0 - x, b, a))) < 1e-12)
    // I_x(1,b) = 1 − (1−x)^b (closed form)
    assert(math.abs(StatMath.regIncBeta(0.4, 1.0, 3.0) -
      (1.0 - math.pow(0.6, 3))) < 1e-12)
  }

  test("tTwoSidedP: Cauchy and 2-df closed forms, normal limit, shape") {
    // df=1: two-sided p = 1 − (2/π)·arctan|t|
    for (t <- Seq(0.5, 1.0, 2.0, 12.7062))
      assert(math.abs(StatMath.tTwoSidedP(t, 1.0) -
        (1.0 - 2.0 / math.Pi * math.atan(t))) < 1e-9, s"t=$t df=1")
    // df=2: two-sided p = 1 − t/√(t²+2)
    for (t <- Seq(0.5, 1.0, 4.3027))
      assert(math.abs(StatMath.tTwoSidedP(t, 2.0) -
        (1.0 - t / math.sqrt(t * t + 2.0))) < 1e-9, s"t=$t df=2")
    // classic critical values: p(12.7062, df=1) ≈ 0.05, p(4.3027, df=2) ≈ 0.05
    assert(math.abs(StatMath.tTwoSidedP(12.7062, 1.0) - 0.05) < 1e-4)
    assert(math.abs(StatMath.tTwoSidedP(4.3027, 2.0) - 0.05) < 1e-4)
    // big-df limit → normal two-sided tail
    assert(math.abs(StatMath.tTwoSidedP(1.959964, 1e7) - 0.05) < 1e-4)
    // shape: p(0) = 1, symmetric, monotone decreasing in |t|
    assert(StatMath.tTwoSidedP(0.0, 5.0) == 1.0)
    assert(StatMath.tTwoSidedP(2.0, 5.0) == StatMath.tTwoSidedP(-2.0, 5.0))
    assert(StatMath.tTwoSidedP(1.0, 5.0) > StatMath.tTwoSidedP(2.0, 5.0))
  }

  test("erfc / zTwoSidedP: textbook normal quantiles") {
    assert(math.abs(StatMath.erfc(0.0) - 1.0) < 1e-7)
    assert(math.abs(StatMath.zTwoSidedP(1.959964) - 0.05) < 1e-5)
    assert(math.abs(StatMath.zTwoSidedP(2.575829) - 0.01) < 1e-5)
    assert(math.abs(StatMath.zTwoSidedP(0.674490) - 0.5) < 1e-5)
    // odd symmetry: erfc(−x) = 2 − erfc(x)
    assert(math.abs(StatMath.erfc(-1.0) - (2.0 - StatMath.erfc(1.0))) < 1e-12)
  }

  test("kolmogorovQ: critical values, bounds, monotonicity") {
    // textbook KS critical values: Q(1.358) ≈ 0.05, Q(1.628) ≈ 0.01
    assert(math.abs(StatMath.kolmogorovQ(1.358) - 0.05) < 5e-4)
    assert(math.abs(StatMath.kolmogorovQ(1.628) - 0.01) < 2e-4)
    assert(StatMath.kolmogorovQ(0.0) == 1.0)
    assert(StatMath.kolmogorovQ(1e-6) == 1.0) // tiny λ clamps at 1
    assert(StatMath.kolmogorovQ(0.5) > StatMath.kolmogorovQ(1.0))
    assert(StatMath.kolmogorovQ(5.0) < 1e-10)
  }
}
