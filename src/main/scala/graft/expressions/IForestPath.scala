package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Sum of isolation-forest path lengths over every tree for one row —
  * the native form of the unrolled `when(feature < thr, L).otherwise(R)`
  * tree expressions [[graft.operators.IsolationForest.Model.score]] used
  * to emit (r20): 20 trees × up to 2^depth nodes made a ~10k-node
  * expression whose ANALYSIS + OPTIMIZATION cost ~1.2 s per evaluation of
  * the query plan — far more than executing it. The traversal here is
  * bit-identical: at each internal node, `value < threshold` descends
  * left, anything else — including a NULL feature, exactly like the
  * `when`'s null-condition falling through to `otherwise` — descends
  * right; leaf values accumulate in tree order (the same left-to-right
  * fold as the old `reduce(_ + _)`), so the summed doubles are the same
  * IEEE values in the same order.
  *
  * Trees ride in flattened parallel arrays (feature index per node, −1
  * for leaves; threshold; left/right child indices; leaf value; one root
  * index per tree) — plain constructor data, not literals, so the plan
  * holds ONE expression node regardless of forest size. Evaluation is
  * [[CodegenFallback]]: a compiled JVM loop per row beats generating and
  * janino-compiling thousands of nested conditionals, and the scoring
  * column feeds a top-k, never a tight inner join.
  */
case class IForestPathSum(children: Seq[Expression], feats: Array[Int],
                          thr: Array[Double], lefts: Array[Int],
                          rights: Array[Int], leafs: Array[Double],
                          roots: Array[Int])
  extends Expression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == DoubleType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"iforest_path_sum needs double features, got ${children.map(_.dataType)}")

  override def eval(input: InternalRow): Any = {
    val n = children.size
    val vals = new Array[Double](n)
    val nulls = new Array[Boolean](n)
    var f = 0
    while (f < n) {
      val v = children(f).eval(input)
      if (v == null) nulls(f) = true
      else vals(f) = v.asInstanceOf[Double]
      f += 1
    }
    var s = 0.0
    var t = 0
    while (t < roots.length) {
      var i = roots(t)
      while (feats(i) >= 0) {
        val fi = feats(i)
        i = if (!nulls(fi) && vals(fi) < thr(i)) lefts(i) else rights(i)
      }
      s += leafs(i)
      t += 1
    }
    s
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): IForestPathSum =
    copy(children = newChildren)

  override def prettyName: String = "iforest_path_sum"
}
