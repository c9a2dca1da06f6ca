package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.types._

/** Input-type guards shared by the stat SQL aggregates: measurement
  * columns must be INTEGRAL (the cents convention — a DoubleType child
  * would be silently truncated toward zero by `Number.longValue`, quietly
  * changing the statistic; loud beats wrong), condition columns boolean.
  */
private[expressions] object StatInputChecks {
  def integral(name: String, what: String, e: Expression): Option[String] =
    e.dataType match {
      case ByteType | ShortType | IntegerType | LongType | NullType => None
      case other => Some(s"$name requires an integral-valued $what column " +
        s"(scale measurements to cents first; got ${other.catalogString})")
    }
  def boolean(name: String, what: String, e: Expression): Option[String] =
    e.dataType match {
      case BooleanType | NullType => None
      case other => Some(s"$name requires a boolean $what column " +
        s"(got ${other.catalogString})")
    }
  def check(problems: Option[String]*): TypeCheckResult =
    problems.flatten.headOption match {
      case Some(msg) => TypeCheckResult.TypeCheckFailure(msg)
      case None => TypeCheckResult.TypeCheckSuccess
    }
}

/** Special-function kernel behind the SQL stat aggregates' p-values —
  * standard public formulas (Lanczos log-Γ; the regularized incomplete
  * beta via its modified-Lentz continued fraction; the A&S 7.1.26 erfc
  * bound for the normal tail), implemented from the math, not from any
  * library source. Accuracy: the beta CF converges to ~1e-14 relative;
  * erfc7126 is ~1.5e-7 absolute — both far inside what a p-value is used
  * for. StatAggregatesSpec pins closed-form anchors (t with 1 df is
  * Cauchy, with 2 df has an elementary CDF; the large-df limit is
  * normal).
  */
object StatMath {

  // Lanczos approximation, g = 7, 9 coefficients (public constants)
  private val lanczos = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  def logGamma(xIn: Double): Double = {
    require(xIn > 0, s"logGamma domain: $xIn")
    val x = xIn - 1.0
    var a = lanczos(0)
    var i = 1
    while (i < lanczos.length) { a += lanczos(i) / (x + i); i += 1 }
    val t = x + 7.5
    0.5 * math.log(2 * math.Pi) + (x + 0.5) * math.log(t) - t + math.log(a)
  }

  /** The continued fraction of the incomplete beta (modified Lentz). */
  private def betaCf(x: Double, a: Double, b: Double): Double = {
    val tiny = 1e-300
    var c = 1.0
    var d = 1.0 - (a + b) * x / (a + 1.0)
    if (math.abs(d) < tiny) d = tiny
    d = 1.0 / d
    var h = d
    var m = 1
    while (m <= 300) {
      val m2 = 2 * m
      // even step: d_{2m} = m(b−m)x / ((a+2m−1)(a+2m))
      var aa = m * (b - m) * x / ((a + m2 - 1.0) * (a + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < tiny) d = tiny
      c = 1.0 + aa / c
      if (math.abs(c) < tiny) c = tiny
      d = 1.0 / d
      h *= d * c
      // odd step: d_{2m+1} = −(a+m)(a+b+m)x / ((a+2m)(a+2m+1))
      aa = -(a + m) * (a + b + m) * x / ((a + m2) * (a + m2 + 1.0))
      d = 1.0 + aa * d
      if (math.abs(d) < tiny) d = tiny
      c = 1.0 + aa / c
      if (math.abs(c) < tiny) c = tiny
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < 1e-14) return h
      m += 1
    }
    h // converged enough for any p-value use
  }

  /** Regularized incomplete beta I_x(a, b). */
  def regIncBeta(x: Double, a: Double, b: Double): Double = {
    if (x <= 0) return 0.0
    if (x >= 1) return 1.0
    val lnBt = logGamma(a + b) - logGamma(a) - logGamma(b) +
      a * math.log(x) + b * math.log(1.0 - x)
    val bt = math.exp(lnBt)
    if (x < (a + 1.0) / (a + b + 2.0)) bt * betaCf(x, a, b) / a
    else 1.0 - bt * betaCf(1.0 - x, b, a) / b
  }

  /** Two-sided p-value of Student's t with `df` degrees of freedom:
    * `I_{df/(df+t²)}(df/2, 1/2)`.
    */
  def tTwoSidedP(t: Double, df: Double): Double =
    if (df <= 0 || t.isNaN) Double.NaN
    else regIncBeta(df / (df + t * t), df / 2.0, 0.5)

  /** erfc via Abramowitz & Stegun 7.1.26 (~1.5e-7 absolute). */
  def erfc(x: Double): Double = {
    val z = math.abs(x)
    val t = 1.0 / (1.0 + 0.5 * z)
    val ans = t * math.exp(-z * z - 1.26551223 + t * (1.00002368 +
      t * (0.37409196 + t * (0.09678418 + t * (-0.18628806 +
        t * (0.27886807 + t * (-1.13520398 + t * (1.48851587 +
          t * (-0.82215223 + t * 0.17087277)))))))))
    if (x >= 0) ans else 2.0 - ans
  }

  /** Two-sided p of a standard-normal z. */
  def zTwoSidedP(z: Double): Double = erfc(math.abs(z) / math.sqrt(2.0))

  /** Kolmogorov distribution tail `Q(λ) = 2 Σ_{k≥1} (−1)^{k−1} e^{−2k²λ²}`
    * (the KS asymptotic p-value), clamped to [0,1]. The alternating series
    * converges hopelessly slowly for small λ, so below the standard
    * crossover the dual theta-function form of the CDF is used instead
    * (`P(λ) = √(2π)/λ · Σ e^{−(2k−1)²π²/(8λ²)}`) — both series are the
    * public Jacobi-theta identities for this distribution.
    */
  def kolmogorovQ(lambda: Double): Double = {
    if (lambda <= 0) return 1.0
    val q =
      if (lambda < 1.18) {
        val u = math.exp(-math.Pi * math.Pi / (8.0 * lambda * lambda))
        1.0 - math.sqrt(2.0 * math.Pi) / lambda *
          (u + math.pow(u, 9) + math.pow(u, 25) + math.pow(u, 49))
      } else {
        val v = math.exp(-2.0 * lambda * lambda)
        2.0 * (v - math.pow(v, 4) + math.pow(v, 9) - math.pow(v, 16))
      }
    math.min(1.0, math.max(0.0, q))
  }
}

/** Shared moment bookkeeping of the two-sample t SQL aggregates: six
  * exact int64 sums (n, Σy, Σy² per arm) — the same moments as
  * [[graft.operators.StatTests.abMoments]], so SQL and DataFrame paths
  * agree by construction. Rows where `y` is null or neither arm holds
  * are ignored; a row matching BOTH arms counts in both (caller's
  * conditions decide).
  */
abstract class TTestAgg extends TypedImperativeAggregate[Array[Long]] {
  def y: Expression
  def isA: Expression
  def isB: Expression
  def welch: Boolean

  override def children: Seq[Expression] = Seq(y, isA, isB)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("t", DoubleType), StructField("df", DoubleType),
    StructField("p_value", DoubleType)))

  override def checkInputDataTypes(): TypeCheckResult = StatInputChecks.check(
    StatInputChecks.integral(prettyName, "measurement", y),
    StatInputChecks.boolean(prettyName, "condition", isA),
    StatInputChecks.boolean(prettyName, "condition", isB))

  override def createAggregationBuffer(): Array[Long] = new Array[Long](6)

  // exact arithmetic throughout: a wrapped Σy² silently corrupts the
  // variance, so the moment sums fail loudly at int64 instead
  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val yv = y.eval(input)
    if (yv != null) {
      val v = yv.asInstanceOf[Number].longValue()
      val v2 = Math.multiplyExact(v, v)
      if (isA.eval(input) == true) {
        buf(0) += 1
        buf(1) = Math.addExact(buf(1), v)
        buf(2) = Math.addExact(buf(2), v2)
      }
      if (isB.eval(input) == true) {
        buf(3) += 1
        buf(4) = Math.addExact(buf(4), v)
        buf(5) = Math.addExact(buf(5), v2)
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 6) { buf(i) = Math.addExact(buf(i), other(i)); i += 1 }
    buf
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(48)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(6)(bb.getLong)
  }

  override def eval(buf: Array[Long]): Any = {
    val na = buf(0).toDouble; val nb = buf(3).toDouble
    if (buf(0) < 2 || buf(3) < 2) return null
    val ma = buf(1) / na; val mb = buf(4) / nb
    val va = (buf(2) - buf(1).toDouble * buf(1) / na) / (na - 1.0)
    val vb = (buf(5) - buf(4).toDouble * buf(4) / nb) / (nb - 1.0)
    val (t, df) =
      if (welch) {
        val vna = va / na; val vnb = vb / nb
        val se2 = vna + vnb
        if (se2 <= 0) return null
        ((ma - mb) / math.sqrt(se2),
          se2 * se2 / (vna * vna / (na - 1.0) + vnb * vnb / (nb - 1.0)))
      } else {
        val sp2 = ((na - 1.0) * va + (nb - 1.0) * vb) / (na + nb - 2.0)
        if (sp2 <= 0) return null
        ((ma - mb) / math.sqrt(sp2 * (1.0 / na + 1.0 / nb)), na + nb - 2.0)
      }
    new GenericInternalRow(Array[Any](t, df, StatMath.tTwoSidedP(t, df)))
  }
}

/** `welch_ttest(y, cond_a, cond_b)` → struct(t, df, p_value) — the
  * ClickHouse `welchTTest(value, sample_index)` call shape (conditions
  * instead of a 0/1 index; `y` integral-valued). NULL when a side has
  * < 2 samples or the variance vanishes.
  */
case class WelchTTestAgg(y: Expression, isA: Expression, isB: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0) extends TTestAgg {
  override def welch: Boolean = true
  override def prettyName: String = "welch_ttest"
  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(y = newChildren(0), isA = newChildren(1), isB = newChildren(2))
}

/** `student_ttest(y, cond_a, cond_b)` → struct(t, df, p_value) — the
  * pooled-variance ClickHouse `studentTTest` shape.
  */
case class StudentTTestAgg(y: Expression, isA: Expression, isB: Expression,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0) extends TTestAgg {
  override def welch: Boolean = false
  override def prettyName: String = "student_ttest"
  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(y = newChildren(0), isA = newChildren(1), isB = newChildren(2))
}

/** `mann_whitney_u(y, cond_a, cond_b)` → struct(u1, z, p_value) — the
  * ClickHouse `mannWhitneyUTest` call shape. Buffers the group's
  * (y, arm) pairs (16 bytes per arm row — ClickHouse's own cost class
  * for this test; the value-grain library operator
  * [[graft.operators.StatTests.mannWhitneyU]] is the whole-log scale
  * path), sorts at eval, average ranks with ties, tie-corrected normal
  * approximation. NULL when a side is empty or every value ties.
  */
case class MannWhitneyUAgg(y: Expression, isA: Expression, isB: Expression,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] {

  override def children: Seq[Expression] = Seq(y, isA, isB)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("u1", DoubleType), StructField("z", DoubleType),
    StructField("p_value", DoubleType)))

  override def checkInputDataTypes(): TypeCheckResult = StatInputChecks.check(
    StatInputChecks.integral(prettyName, "measurement", y),
    StatInputChecks.boolean(prettyName, "condition", isA),
    StatInputChecks.boolean(prettyName, "condition", isB))

  override def createAggregationBuffer(): ArrayBuffer[Long] = new ArrayBuffer[Long]()

  override def update(buf: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    val yv = y.eval(input)
    if (yv != null) {
      val v = yv.asInstanceOf[Number].longValue()
      val a = isA.eval(input) == true
      val b = isB.eval(input) == true
      if (a) buf += v += 0L
      if (b) buf += v += 1L
    }
    buf
  }

  override def merge(buf: ArrayBuffer[Long], other: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    buf ++= other
    buf
  }

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] =
    BehaviorAggregates.serializeBuffer(buf)

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] =
    BehaviorAggregates.deserializeBuffer(bytes)

  override def eval(buf: ArrayBuffer[Long]): Any = {
    val n = buf.length / 2
    if (n == 0) return null
    val order = Array.range(0, n).sortBy(i => buf(2 * i))
    var n1 = 0L; var n2 = 0L
    var r1x2 = 0L // doubled rank sum of arm A
    var tieSum = 0L // Σ(t³ − t)
    var i = 0
    var rankBefore = 0L
    while (i < n) {
      val v = buf(2 * order(i))
      var j = i
      var ca = 0L; var cb = 0L
      while (j < n && buf(2 * order(j)) == v) {
        if (buf(2 * order(j) + 1) == 0L) ca += 1 else cb += 1
        j += 1
      }
      val cn = ca + cb
      val r2 = 2 * rankBefore + cn + 1 // doubled average rank of this value
      // exact ops: a wrapped rank sum or tie cube silently corrupts U/σ
      r1x2 = Math.addExact(r1x2, Math.multiplyExact(ca, r2))
      tieSum = Math.addExact(tieSum,
        Math.multiplyExact(Math.multiplyExact(cn, cn), cn) - cn)
      n1 += ca; n2 += cb
      rankBefore += cn
      i = j
    }
    if (n1 == 0 || n2 == 0) return null
    val u1 = (r1x2 - Math.multiplyExact(n1, n1 + 1)).toDouble / 2.0
    val n1d = n1.toDouble; val n2d = n2.toDouble; val nd = n1d + n2d
    val sigma2 = n1d * n2d / 12.0 *
      ((nd + 1.0) - tieSum / (nd * (nd - 1.0)))
    if (sigma2 <= 0) return null
    val z = (u1 - n1d * n2d / 2.0) / math.sqrt(sigma2)
    new GenericInternalRow(Array[Any](u1, z, StatMath.zTwoSidedP(z)))
  }

  override def prettyName: String = "mann_whitney_u"
  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(y = newChildren(0), isA = newChildren(1), isB = newChildren(2))
}

/** `kolmogorov_smirnov(y, cond_a, cond_b)` → struct(d, p_value) — the
  * ClickHouse `kolmogorovSmirnovTest` call shape. Buffers the group's
  * (y, arm) pairs (the [[MannWhitneyUAgg]] cost class; the value-grain
  * library operator [[graft.operators.StatTests.ksTest]] is the whole-log
  * scale path); the supremum walks INTEGER cross-scaled CDF gaps, and the
  * p-value is the Kolmogorov distribution tail summed to convergence —
  * richer than the oracle-constrained 3-term series of the DataFrame op.
  * NULL when a side is empty.
  */
case class KolmogorovSmirnovAgg(y: Expression, isA: Expression, isB: Expression,
                                mutableAggBufferOffset: Int = 0,
                                inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] {

  override def children: Seq[Expression] = Seq(y, isA, isB)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType), StructField("p_value", DoubleType)))

  override def checkInputDataTypes(): TypeCheckResult = StatInputChecks.check(
    StatInputChecks.integral(prettyName, "measurement", y),
    StatInputChecks.boolean(prettyName, "condition", isA),
    StatInputChecks.boolean(prettyName, "condition", isB))

  override def createAggregationBuffer(): ArrayBuffer[Long] = new ArrayBuffer[Long]()

  override def update(buf: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    val yv = y.eval(input)
    if (yv != null) {
      val v = yv.asInstanceOf[Number].longValue()
      if (isA.eval(input) == true) buf += v += 0L
      if (isB.eval(input) == true) buf += v += 1L
    }
    buf
  }

  override def merge(buf: ArrayBuffer[Long], other: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    buf ++= other; buf
  }

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] =
    BehaviorAggregates.serializeBuffer(buf)

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] =
    BehaviorAggregates.deserializeBuffer(bytes)

  override def eval(buf: ArrayBuffer[Long]): Any = {
    val n = buf.length / 2
    if (n == 0) return null
    val order = Array.range(0, n).sortBy(i => buf(2 * i))
    var n1 = 0L; var n2 = 0L
    var i = 0
    while (i < n) {
      if (buf(2 * order(i) + 1) == 0L) n1 += 1 else n2 += 1
      i += 1
    }
    if (n1 == 0 || n2 == 0) return null
    var cumA = 0L; var cumB = 0L; var maxGap = 0L
    i = 0
    while (i < n) {
      val v = buf(2 * order(i))
      // consume the whole tie run before evaluating the gap
      while (i < n && buf(2 * order(i)) == v) {
        if (buf(2 * order(i) + 1) == 0L) cumA += 1 else cumB += 1
        i += 1
      }
      val gap = math.abs(Math.subtractExact(
        Math.multiplyExact(cumA, n2), Math.multiplyExact(cumB, n1)))
      if (gap > maxGap) maxGap = gap
    }
    val d = maxGap.toDouble / (n1.toDouble * n2.toDouble)
    val lambda = math.sqrt(n1.toDouble * n2.toDouble / (n1 + n2).toDouble) * d
    new GenericInternalRow(Array[Any](d, StatMath.kolmogorovQ(lambda)))
  }

  override def prettyName: String = "kolmogorov_smirnov"
  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(y = newChildren(0), isA = newChildren(1), isB = newChildren(2))
}

/** `rank_corr(x, y)` → double — the ClickHouse `rankCorr` call shape:
  * Spearman ρ with tie-averaged (fractional) ranks. Buffers the group's
  * (x, y) pairs; ranks and the Pearson moments evaluate single-node at
  * the group grain (ClickHouse's own cost class; the distinct-value-grain
  * library operator [[graft.operators.StatTests.spearmanCorr]] is the
  * whole-log scale path). NULL when n < 2 or either side is constant.
  */
case class RankCorrAgg(x: Expression, yE: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] {

  override def children: Seq[Expression] = Seq(x, yE)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = StatInputChecks.check(
    StatInputChecks.integral(prettyName, "x", x),
    StatInputChecks.integral(prettyName, "y", yE))

  override def createAggregationBuffer(): ArrayBuffer[Long] = new ArrayBuffer[Long]()

  override def update(buf: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    val xv = x.eval(input); val yv = yE.eval(input)
    if (xv != null && yv != null)
      buf += xv.asInstanceOf[Number].longValue() +=
        yv.asInstanceOf[Number].longValue()
    buf
  }

  override def merge(buf: ArrayBuffer[Long], other: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    buf ++= other; buf
  }

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] =
    BehaviorAggregates.serializeBuffer(buf)

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] =
    BehaviorAggregates.deserializeBuffer(bytes)

  /** Doubled tie-averaged ranks of `vals` (exact integers). */
  private def doubledRanks(vals: Array[Long]): Array[Long] = {
    val n = vals.length
    val order = Array.range(0, n).sortBy(vals)
    val r2 = new Array[Long](n)
    var i = 0
    var before = 0L
    while (i < n) {
      val v = vals(order(i))
      var j = i
      while (j < n && vals(order(j)) == v) j += 1
      val cn = (j - i).toLong
      val rank2 = 2 * before + cn + 1
      var k = i
      while (k < j) { r2(order(k)) = rank2; k += 1 }
      before += cn
      i = j
    }
    r2
  }

  override def eval(buf: ArrayBuffer[Long]): Any = {
    val n = buf.length / 2
    if (n < 2) return null
    val xs = Array.tabulate(n)(i => buf(2 * i))
    val ys = Array.tabulate(n)(i => buf(2 * i + 1))
    if (xs.min == xs.max || ys.min == ys.max) return null
    val rx = doubledRanks(xs); val ry = doubledRanks(ys)
    // exact int64 rank moments — a float accumulation here would depend
    // on buffer (merge) order past 2^53; these instead fail loudly at
    // ~1.3M rows per group (4n³ > int64), which beats a silently wrong ρ
    var sx = 0L; var sy = 0L; var sxy = 0L; var sxx = 0L; var syy = 0L
    var i = 0
    while (i < n) {
      val a = rx(i); val b = ry(i)
      sx = Math.addExact(sx, a); sy = Math.addExact(sy, b)
      sxy = Math.addExact(sxy, Math.multiplyExact(a, b))
      sxx = Math.addExact(sxx, Math.multiplyExact(a, a))
      syy = Math.addExact(syy, Math.multiplyExact(b, b))
      i += 1
    }
    val nd = n.toDouble
    val cov = nd * sxy - sx.toDouble * sy
    val vx = nd * sxx - sx.toDouble * sx
    val vy = nd * syy - sy.toDouble * sy
    cov / math.sqrt(vx * vy)
  }

  override def prettyName: String = "rank_corr"
  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(x = newChildren(0), yE = newChildren(1))
}

/** `simple_linreg(x, y)` → struct(slope, intercept, r2) — the ClickHouse
  * `simpleLinearRegression` call shape over integral-valued columns.
  * Fixed 10-long buffer (five exact moments + min/max variance guards) —
  * fully map-side combinable, O(1) state. Coefficients report in the
  * caller's own y units (the DataFrame op [[graft.operators.StatTests.linReg]]
  * additionally divides its cents convention out). NULL when n < 2 or x
  * is constant; `r2` NULL when y is constant.
  */
case class SimpleLinRegAgg(x: Expression, yE: Expression,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(x, yE)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("slope", DoubleType), StructField("intercept", DoubleType),
    StructField("r2", DoubleType)))

  override def checkInputDataTypes(): TypeCheckResult = StatInputChecks.check(
    StatInputChecks.integral(prettyName, "x", x),
    StatInputChecks.integral(prettyName, "y", yE))

  // n, sx, sy, sxy, sxx, syy, xmin, xmax, ymin, ymax
  override def createAggregationBuffer(): Array[Long] = {
    val b = new Array[Long](10)
    b(6) = Long.MaxValue; b(7) = Long.MinValue
    b(8) = Long.MaxValue; b(9) = Long.MinValue
    b
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val xv = x.eval(input); val yv = yE.eval(input)
    if (xv != null && yv != null) {
      val a = xv.asInstanceOf[Number].longValue()
      val b = yv.asInstanceOf[Number].longValue()
      // exact ops: a wrapped Σy² (cents-scale y hits int64 past ~1e5
      // rows/group) silently corrupts slope/R² — fail loudly instead
      buf(0) += 1
      buf(1) = Math.addExact(buf(1), a)
      buf(2) = Math.addExact(buf(2), b)
      buf(3) = Math.addExact(buf(3), Math.multiplyExact(a, b))
      buf(4) = Math.addExact(buf(4), Math.multiplyExact(a, a))
      buf(5) = Math.addExact(buf(5), Math.multiplyExact(b, b))
      if (a < buf(6)) buf(6) = a
      if (a > buf(7)) buf(7) = a
      if (b < buf(8)) buf(8) = b
      if (b > buf(9)) buf(9) = b
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 6) { buf(i) = Math.addExact(buf(i), other(i)); i += 1 }
    buf(6) = math.min(buf(6), other(6)); buf(7) = math.max(buf(7), other(7))
    buf(8) = math.min(buf(8), other(8)); buf(9) = math.max(buf(9), other(9))
    buf
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(80)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(10)(bb.getLong)
  }

  override def eval(buf: Array[Long]): Any = {
    if (buf(0) < 2 || buf(6) == buf(7)) return null
    val n = buf(0).toDouble
    val cov = n * buf(3).toDouble - buf(1).toDouble * buf(2).toDouble
    val vx = n * buf(4).toDouble - buf(1).toDouble * buf(1).toDouble
    val vy = n * buf(5).toDouble - buf(2).toDouble * buf(2).toDouble
    val slope = cov / vx
    val intercept = (buf(2).toDouble - slope * buf(1).toDouble) / n
    val r2: Any = if (buf(8) == buf(9)) null else cov * cov / (vx * vy)
    new GenericInternalRow(Array[Any](slope, intercept, r2))
  }

  override def prettyName: String = "simple_linreg"
  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(x = newChildren(0), yE = newChildren(1))
}

/** `anova_f(y, grp)` → struct(f, df_between, df_within, p_value) — the
  * ClickHouse `analysisOfVariance` call shape: one-way ANOVA of
  * integral-valued `y` across the groups of `grp`, with the F tail from
  * the regularized incomplete beta. State is one (n, Σy, Σy²) triple per
  * DISTINCT group — map-side combinable, bounded by group cardinality
  * (loud failure past 100k groups: an ANOVA over that many groups is a
  * mis-specified query, not a workload). Rows with a null y or group are
  * ignored. NULL when < 2 groups, no residual df, or zero within-group
  * variance.
  */
case class AnovaFAgg(yE: Expression, grp: Expression,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Array[Long]]] {

  private type Buf = scala.collection.mutable.HashMap[String, Array[Long]]

  override def children: Seq[Expression] = Seq(yE, grp)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("f", DoubleType), StructField("df_between", LongType),
    StructField("df_within", LongType), StructField("p_value", DoubleType)))

  override def createAggregationBuffer(): Buf = new Buf()

  override def checkInputDataTypes(): TypeCheckResult = StatInputChecks.check(
    StatInputChecks.integral(prettyName, "measurement", yE))

  private def add(buf: Buf, k: String, n: Long, sy: Long, syy: Long): Unit = {
    val cell = buf.getOrElseUpdate(k, new Array[Long](3))
    cell(0) += n
    cell(1) = Math.addExact(cell(1), sy)
    cell(2) = Math.addExact(cell(2), syy)
    require(buf.size <= 100000,
      "anova_f: more than 100000 distinct groups — mis-specified grouping")
  }

  /** Type-normalized group key: internal values don't all stringify by
    * content — a BinaryType group arrives as `Array[Byte]`, whose
    * `toString` is identity-hash gibberish that would make every ROW its
    * own group. Strings copy out of their (possibly reused) UTF8String
    * backing; binary encodes as hex; primitives stringify by value.
    */
  private def keyOf(gv: Any): String = gv match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.toString
    case b: Array[Byte] =>
      val sb = new java.lang.StringBuilder(2 + b.length * 2)
      sb.append("0x")
      b.foreach(x => sb.append(f"${x & 0xff}%02x"))
      sb.toString
    case other => other.toString
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val yv = yE.eval(input); val gv = grp.eval(input)
    if (yv != null && gv != null) {
      val v = yv.asInstanceOf[Number].longValue()
      add(buf, keyOf(gv), 1L, v, Math.multiplyExact(v, v))
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach { case (k, c) => add(buf, k, c(0), c(1), c(2)) }
    buf
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val entries = buf.toSeq
    val keyBytes = entries.map(_._1.getBytes("UTF-8"))
    val size = 4 + keyBytes.map(_.length + 4 + 24).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.size)
    entries.zip(keyBytes).foreach { case ((_, c), kb) =>
      bb.putInt(kb.length); bb.put(kb)
      bb.putLong(c(0)); bb.putLong(c(1)); bb.putLong(c(2))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buf()
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      val c = new Array[Long](3)
      c(0) = bb.getLong; c(1) = bb.getLong; c(2) = bb.getLong
      buf.put(new String(kb, "UTF-8"), c)
      i += 1
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val k = buf.size
    if (k < 2) return null
    var nn = 0L; var syt = 0L; var syyt = 0L
    var tsum = 0.0
    // deterministic float accumulation: groups in sorted-key order
    buf.toSeq.sortBy(_._1).foreach { case (_, c) =>
      nn += c(0)
      syt = Math.addExact(syt, c(1))
      syyt = Math.addExact(syyt, c(2))
      tsum += c(1).toDouble * c(1).toDouble / c(0).toDouble
    }
    if (nn <= k) return null
    val nd = nn.toDouble
    val ssb = tsum - syt.toDouble * syt.toDouble / nd
    val ssw = syyt.toDouble - tsum
    if (ssw <= 0) return null
    val dfb = (k - 1).toDouble
    val dfw = (nn - k).toDouble
    val f = (ssb / dfb) / (ssw / dfw)
    // P(F_{dfb,dfw} > f) = I_{dfw/(dfw + dfb·f)}(dfw/2, dfb/2)
    val p = StatMath.regIncBeta(dfw / (dfw + dfb * f), dfw / 2.0, dfb / 2.0)
    new GenericInternalRow(Array[Any](f, (k - 1).toLong, nn - k, p))
  }

  override def prettyName: String = "anova_f"
  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(yE = newChildren(0), grp = newChildren(1))
}
