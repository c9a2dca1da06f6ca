package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native top-`n` nearest-centroid lookup for IVF indexing: the codebook
  * (bounded — thousands of centroids even at 100 TB) rides inside the
  * expression as flat primitive arrays, so centroid assignment is a pure
  * projection over the corpus — no crossJoin, no shuffle of embedding
  * vectors, one `centroids × dim` primitive loop per row inside codegen.
  *
  * Returns the ids of the `n` centroids with highest cosine similarity,
  * ties broken by smaller id (deterministic).
  */
case class NearestCentroids(child: Expression, centroidIds: Array[Long],
                            centroidsFlat: Array[Double], dim: Int, n: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  // centroid norms, computed once per (deserialized) expression instance
  @transient private lazy val norms: Array[Double] = {
    val k = centroidIds.length
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      var s = 0.0
      var i = 0
      while (i < dim) { val x = centroidsFlat(c * dim + i); s += x * x; i += 1 }
      out(c) = math.sqrt(s)
      c += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(NearestCentroids.compute(
      input.asInstanceOf[ArrayData], centroidIds, centroidsFlat, norms, dim, n, isFloat))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroids", this,
      classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData)" +
        s"$ref.evalFor($c);")
  }

  /** Codegen entry point (avoids re-exposing the private members). */
  def evalFor(input: ArrayData): GenericArrayData =
    new GenericArrayData(NearestCentroids.compute(
      input, centroidIds, centroidsFlat, norms, dim, n, isFloat))

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroids"
}

object NearestCentroids {
  def compute(v: ArrayData, ids: Array[Long], flat: Array[Double],
              norms: Array[Double], dim: Int, n: Int, isFloat: Boolean): Array[Long] = {
    val k = ids.length
    val d = math.min(dim, v.numElements())
    var vn = 0.0
    val vv = new Array[Double](d)
    var i = 0
    while (i < d) {
      vv(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      vn += vv(i) * vv(i)
      i += 1
    }
    vn = math.sqrt(vn)
    // top-n by cosine with deterministic ties — insertion into small arrays
    val topSim = Array.fill(n)(Double.NegativeInfinity)
    val topId = new Array[Long](n)
    var c = 0
    while (c < k) {
      var dot = 0.0
      i = 0
      while (i < d) { dot += vv(i) * flat(c * dim + i); i += 1 }
      val sim = dot / (vn * norms(c))
      val id = ids(c)
      var pos = -1
      var j = n - 1
      while (j >= 0 && (sim > topSim(j) || (sim == topSim(j) && id < topId(j)))) {
        pos = j; j -= 1
      }
      if (pos >= 0) {
        j = n - 1
        while (j > pos) { topSim(j) = topSim(j - 1); topId(j) = topId(j - 1); j -= 1 }
        topSim(pos) = sim; topId(pos) = id
      }
      c += 1
    }
    topId.take(math.min(n, k))
  }
}
