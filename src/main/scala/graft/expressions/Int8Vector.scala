package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Symmetric int8 quantization of an embedding, PACKED: one byte per
  * component in a single `binary` value plus a `double` scale —
  * `struct(scale, codes)` where `x_i ≈ scale · codes(i)`,
  * `scale = max|x|/127`. The packed form is what the ANN posting stores
  * persist: a parquet `binary` of exactly `dim` bytes replaces the
  * 4·dim-byte float array, the 4× candidate-IO cut that makes a 100 TB
  * probe affordable. Same math as
  * `VectorFunctions.quantizeInt8` (round-half-up, zero vectors get scale 0
  * and all-zero codes); only the storage shape differs.
  */
case class PackInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PackInt8.Schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pack_int8 needs an array<float|double> input, got $other")
    }

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    PackInt8.compute(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.PackInt8.compute($c, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): PackInt8 =
    copy(child = newChild)

  override def prettyName: String = "pack_int8"
}

object PackInt8 {
  val Schema: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("codes", BinaryType, nullable = false)))

  def compute(v: ArrayData, isFloat: Boolean): InternalRow = {
    val n = v.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val a = math.abs(x)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127.0
    val codes = new Array[Byte](n)
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        // |x/scale| <= 127 by construction, so the rounded long fits a byte
        codes(i) = java.lang.Math.round(x / scale).toByte
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, codes))
  }
}

/** One-pass cosine similarity of a PACKED int8 code vector ([[PackInt8]]'s
  * `codes` binary) against a float/double query vector. Cosine is invariant
  * to any positive per-vector scale, so the stored `scale` is NOT needed to
  * score: `cos(scale·codes, q) = cos(codes, q)` — the probe reads one
  * `binary` column per candidate and nothing else. Accumulation order and
  * the zero-norm case (NaN) match [[CosineSim]] exactly, so quantized and
  * float scoring differ only by the rounding of the codes themselves.
  */
case class Int8CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val rOk = right.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (left.dataType == BinaryType && rOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"int8_cosine_sim needs (binary, array<float|double>), got " +
        s"${left.dataType}, ${right.dataType}")
  }

  private def rightIsFloat = right.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Int8CosineSim.compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[ArrayData],
      rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.Int8CosineSim.compute($a, $b, $rightIsFloat);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Int8CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "int8_cosine_sim"
}

object Int8CosineSim {
  /** One-pass dot + norms, codes read as signed bytes. */
  def compute(codes: Array[Byte], q: ArrayData, qFloat: Boolean): Double = {
    val n = math.min(codes.length, q.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = codes(i).toDouble
      val y = if (qFloat) q.getFloat(i).toDouble else q.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
