package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** The deterministic bootstrap uniform (`StatTests.mixU01`'s contract) as
  * a native codegen scalar: two congruential rounds plus a quadratic
  * round over the Mersenne prime p = 2⁶¹−1, then the high 53 bits as a
  * double in [0, 1).
  *
  * The decimal(38,0) formulation of the same mix is exact but runs on
  * BigDecimal — measured ~8.9 s for the 200-replicate bootstrap at
  * sf0.1, all of it decimal multiply/mod. This expression computes the
  * identical values in 64-bit arithmetic: the 122-bit products go
  * through `Math.multiplyHigh` and a Mersenne fold (2⁶¹ ≡ 1 mod p, so a
  * 128-bit value h·2⁶⁴+l reduces as (l mod 2⁶¹) + (l»61 | h«3), minus p
  * at most twice) — exact by construction, bit-equal to the decimal lane
  * (spec-pinned against independently computed reference draws), and
  * whole-stage-codegen friendly. Keys must be non-negative.
  */
case class BootstrapU01(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"bootstrap_u01 needs a long child, got ${child.dataType}")
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(input: Any): Any =
    BootstrapU01.mix(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.BootstrapU01.mix($c);")

  override protected def withNewChildInternal(newChild: Expression): BootstrapU01 =
    copy(child = newChild)

  override def prettyName: String = "bootstrap_u01"
}

object BootstrapU01 {

  final val P: Long = (1L << 61) - 1
  final val A1: Long = 1203983748297848573L
  final val C1: Long = 1111111111111111111L
  final val C2: Long = 555555555555555555L
  final val A2: Long = 989812716073141251L

  /** (a·b) mod (2⁶¹−1) for 0 ≤ a, b < 2⁶¹, exactly: product < 2¹²², its
    * 128-bit halves fold via 2⁶¹ ≡ 1 (mod p). `hi < 2⁵⁸` so `hi << 3`
    * cannot collide with `lo >>> 61` (3 bits), and the folded sum is
    * < 2⁶² = 2p + 2, so two conditional subtractions complete the
    * reduction.
    */
  def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var s = (lo & P) + ((lo >>> 61) | (hi << 3))
    if (s >= P) s -= P
    if (s >= P) s -= P
    s
  }

  /** The mix itself — value-identical to the decimal(38,0) tree in
    * `StatTests.mixU01`'s scaladoc (pinned by StatTestsSpec's reference
    * draws): z₁ = (A1·k + C1) mod p, z₂ = (z₁² + C2) mod p,
    * z₃ = A2·z₂ mod p, u = ⌊z₃/256⌋ / 2⁵³.
    */
  def mix(key: Long): Double = {
    require(key >= 0, s"bootstrap_u01 key must be non-negative, got $key")
    var z = mulmod(key % P, A1) + C1
    if (z >= P) z -= P
    z = mulmod(z, z) + C2
    if (z >= P) z -= P
    z = mulmod(z, A2)
    (z >>> 8).toDouble / 9007199254740992.0
  }
}
