package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Native random-hyperplane LSH bucket id for an embedding column: bit b of
  * the bucket is the sign of ⟨v, w_b⟩ where w_b's components are derived
  * from murmur3(i, b) — bit-identical to the
  * `VectorFunctions.hyperplaneBit` higher-order formulation (same hash,
  * same seed chain: h = murmur(seed=42, i) then murmur(h, b)), but one
  * primitive loop per row instead of bits × dim interpreted lambda calls.
  */
case class HyperplaneLsh(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneLsh.compute(input.asInstanceOf[ArrayData], bits, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HyperplaneLsh.compute($c, $bits, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLsh =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_lsh"
}

/** Banded random-hyperplane signatures: `bands` independent bucket ids of
  * `bitsPerBand` sign bits each, in one pass over the vector. Band j's bit
  * k is global hyperplane index j·bitsPerBand+k under the SAME murmur seed
  * chain as [[HyperplaneLsh]] (band 0 of `HyperplaneBands(v, r, 1)` ==
  * `HyperplaneLsh(v, r)`), so every band uses disjoint hyperplanes — the
  * OR-across-bands construction of cosine LSH (recall 1−(1−p^r)^b for
  * per-bit agreement p = 1 − θ/π).
  */
case class HyperplaneBands(child: Expression, bitsPerBand: Int, bands: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneBands.compute(input.asInstanceOf[ArrayData], bitsPerBand, bands, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HyperplaneBands.compute($c, $bitsPerBand, $bands, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_bands"
}

object HyperplaneBands {
  def compute(v: ArrayData, bitsPerBand: Int, bands: Int, isFloat: Boolean): ArrayData = {
    val n = v.numElements()
    val total = bands * bitsPerBand
    // dimension-major accumulation: the per-dimension seed hash
    // murmur(i, 42) and the element load happen once per dimension instead
    // of once per (band, bit, dimension) — half the murmur calls in a
    // kernel that runs bands × bits × dim per row. Each bucket's dot still
    // sums over i in ascending order, so signatures are bit-identical to
    // the bit-major loop (and to HyperplaneLsh — the spec pins band 0).
    val dots = new Array[Double](total)
    var i = 0
    while (i < n) {
      val hi = Murmur3_x86_32.hashInt(i, 42)
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      var b = 0
      while (b < total) {
        val w = Murmur3_x86_32.hashInt(b, hi).toDouble / 2147483648.0
        dots(b) += x * w
        b += 1
      }
      i += 1
    }
    val out = new Array[Int](bands)
    var band = 0
    while (band < bands) {
      var bucket = 0
      var k = 0
      while (k < bitsPerBand) {
        if (dots(band * bitsPerBand + k) >= 0) bucket |= (1 << k)
        k += 1
      }
      out(band) = bucket
      band += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object HyperplaneLsh {
  def compute(v: ArrayData, bits: Int, isFloat: Boolean): Int = {
    val n = v.numElements()
    // dimension-major, same as HyperplaneBands.compute: murmur(i, 42) and
    // the element load once per dimension, per-bit dots accumulated in
    // ascending-i order (bit-identical to the bit-major formulation)
    val dots = new Array[Double](bits)
    var i = 0
    while (i < n) {
      val hi = Murmur3_x86_32.hashInt(i, 42)
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      var b = 0
      while (b < bits) {
        val w = Murmur3_x86_32.hashInt(b, hi).toDouble / 2147483648.0
        dots(b) += x * w
        b += 1
      }
      i += 1
    }
    var bucket = 0
    var b = 0
    while (b < bits) {
      if (dots(b) >= 0) bucket |= (1 << b)
      b += 1
    }
    bucket
  }
}
