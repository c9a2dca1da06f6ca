package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels for the persisted ANN store (Jégou et al.,
  * TPAMI 2011 — public): [[PqEncode]] compresses a vector to `m` one-byte
  * sub-codes against frozen per-subspace codebooks (the posting payload:
  * `m` bytes instead of `4·dim` float or `dim` int8 — the IO lever past
  * int8), and [[PqCosineSim]] scores a coded candidate against a query
  * vector asymmetrically — the candidate is never reconstructed into a
  * float array; its norm comes exactly from the per-code sub-norms
  * (subspaces concatenate) and the dot from the query against the coded
  * sub-centroids. Both are native codegen'd expressions with the codebook
  * embedded as a reference object, the [[NearestCentroids]] pattern — the
  * probe stays inside WholeStageCodegen with zero per-row allocation
  * beyond the code array itself.
  *
  * Encoding must agree bit-for-bit with
  * [[graft.operators.Similarity.pqEncode]]: same double math, same
  * squared-euclidean argmin, ties to the lower code.
  */
case class PqEncode(child: Expression, codebooks: Array[Double],
                    m: Int, ksub: Int, dsub: Int) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_encode needs an array<float|double> input, got $other")
    }

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  def evalFor(v: ArrayData): Array[Byte] =
    PqEncode.compute(v, isFloat, codebooks, m, ksub, dsub)

  override protected def nullSafeEval(input: Any): Any =
    evalFor(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalFor($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

/** `R·v` against a frozen row-major `dim×dim` orthogonal matrix — the
  * OPQ-lite rotation applied before subspace split (Ge et al., "Optimized
  * Product Quantization", CVPR 2013 — public: a rotation aligned with the
  * principal axes materially improves PQ recall at equal m on correlated
  * dims; this is the PCA-rotation special case, not the full alternating
  * optimization). Orthogonality makes the rotation free at SCORING time:
  * dot products and norms are invariant, so the probe kernels run
  * unchanged on rotated inputs. Native codegen'd expression, the
  * [[PqEncode]] reference-object pattern; O(dim²) per row — paid once at
  * encode and once per probe-side row, both the small/delta sides.
  */
case class RotateVector(child: Expression, mat: Array[Double], dim: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rotate_vector needs an array<float|double> input, got $other")
    }

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  def evalFor(v: ArrayData): ArrayData = {
    val fl = isFloat
    val out = new Array[Double](dim)
    var r = 0
    while (r < dim) {
      var s = 0.0
      val row = r * dim
      var c = 0
      while (c < dim) {
        s += mat(row + c) * (if (fl) v.getFloat(c).toDouble else v.getDouble(c))
        c += 1
      }
      out(r) = s
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    evalFor(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rotateVector", this, classOf[RotateVector].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalFor($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RotateVector =
    copy(child = newChild)

  override def prettyName: String = "rotate_vector"
}

object PqEncode {
  def compute(v: ArrayData, isFloat: Boolean, cb: Array[Double],
              m: Int, ksub: Int, dsub: Int): Array[Byte] = {
    val n = v.numElements()
    require(n == m * dsub, s"vector dim $n != pq dim ${m * dsub}")
    val codes = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val base = j * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val off = (j * ksub + c) * dsub
        var d2 = 0.0
        var d = 0
        while (d < dsub) {
          val x = if (isFloat) v.getFloat(base + d).toDouble else v.getDouble(base + d)
          val diff = x - cb(off + d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      codes(j) = best.toByte
      j += 1
    }
    codes
  }
}

/** Asymmetric (ADC) cosine of PQ codes against a float/double query:
  * `cos = Σⱼ q_j · cb[j][code_j] / (‖q‖ · √Σⱼ ‖cb[j][code_j]‖²)`. The
  * per-code sub-norms are precomputed once per plan (they depend only on
  * the frozen codebook), so scoring reads `m` bytes per candidate and
  * touches the codebook rows the codes name — never a stored vector.
  */
/** Residual-ADC cosine (classic IVFADC, Jégou et al. TPAMI 2011 §IV-A):
  * the codes quantize the RESIDUAL `x − c` of the candidate against its
  * list's centroid, so the reconstruction is `x̂ = c + cb[j][code]` — the
  * centroid adds back in here. Same O(dim)-per-row cost class as
  * [[PqCosineSim]] (which already walks the query's dims), same codegen
  * shape; `cos = dot(q, x̂) / (‖q‖·‖x̂‖)` with every term accumulated in
  * one pass over the dims.
  */
case class PqResidualCosineSim(first: Expression, second: Expression,
                               third: Expression,
                               codebooks: Array[Double], m: Int, ksub: Int,
                               dsub: Int)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def vec(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (first.dataType == BinaryType && vec(second.dataType) && vec(third.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pq_residual_cosine_sim needs (binary codes, array query, array centroid), got " +
        s"${first.dataType}, ${second.dataType}, ${third.dataType}")
  }

  private def isFloat(e: Expression) = e.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  def evalFor(codes: Array[Byte], q: ArrayData, cv: ArrayData): Double = {
    val qF = isFloat(second); val cF = isFloat(third)
    var dot = 0.0; var recon2 = 0.0; var qn2 = 0.0
    var j = 0
    while (j < m) {
      val code = codes(j) & 0xff
      val off = (j * ksub + code) * dsub
      val base = j * dsub
      var d = 0
      while (d < dsub) {
        val qv = if (qF) q.getFloat(base + d).toDouble else q.getDouble(base + d)
        val cd = if (cF) cv.getFloat(base + d).toDouble else cv.getDouble(base + d)
        val xd = cd + codebooks(off + d) // reconstruction: centroid + residual code
        dot += qv * xd
        recon2 += xd * xd
        qn2 += qv * qv
        d += 1
      }
      j += 1
    }
    dot / (math.sqrt(qn2) * math.sqrt(recon2))
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    evalFor(a.asInstanceOf[Array[Byte]], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqResCosineSim", this,
      classOf[PqResidualCosineSim].getName)
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"${ev.value} = $ref.evalFor($a, $b, $c);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqResidualCosineSim =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "pq_residual_cosine_sim"
}

case class PqCosineSim(left: Expression, right: Expression,
                       codebooks: Array[Double], m: Int, ksub: Int,
                       dsub: Int) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val rOk = right.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (left.dataType == BinaryType && rOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pq_cosine_sim needs (binary, array<float|double>), got " +
        s"${left.dataType}, ${right.dataType}")
  }

  private def rightIsFloat = right.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  // per-(j, code) squared sub-norms: frozen with the codebook, shared by
  // every row this expression scores
  @transient private lazy val subNorm2: Array[Double] = {
    val out = new Array[Double](m * ksub)
    var jc = 0
    while (jc < m * ksub) {
      var s = 0.0
      var d = 0
      while (d < dsub) { val x = codebooks(jc * dsub + d); s += x * x; d += 1 }
      out(jc) = s
      jc += 1
    }
    out
  }

  def evalFor(codes: Array[Byte], q: ArrayData): Double = {
    var recon2 = 0.0
    var dot = 0.0
    var qn2 = 0.0
    var j = 0
    while (j < m) {
      val code = codes(j) & 0xff
      recon2 += subNorm2(j * ksub + code)
      val off = (j * ksub + code) * dsub
      val base = j * dsub
      var d = 0
      while (d < dsub) {
        val qv = if (rightIsFloat) q.getFloat(base + d).toDouble
                 else q.getDouble(base + d)
        dot += qv * codebooks(off + d)
        qn2 += qv * qv
        d += 1
      }
      j += 1
    }
    dot / (math.sqrt(qn2) * math.sqrt(recon2))
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    evalFor(a.asInstanceOf[Array[Byte]], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCosineSim", this, classOf[PqCosineSim].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.evalFor($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqCosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_cosine_sim"
}
