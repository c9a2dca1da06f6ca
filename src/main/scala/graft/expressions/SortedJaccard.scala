package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression computing the Jaccard similarity of two
  * SORTED `array<long>` element-set columns with a two-pointer merge —
  * |a ∩ b| / (|a| + |b| − |a ∩ b|) — no per-pair set or array allocation.
  *
  * Exists because `size(array_intersect(a,b))` / `size(array_union(a,b))`
  * builds hash sets and result arrays per comparison; on an O(candidates)
  * pair stream (millions of pairs after blocking) that allocation dominates
  * the runtime. Inputs must be distinct-element sorted arrays (e.g.
  * `array_sort(array_distinct(...))`), computed once per row upstream.
  */
case class SortedJaccard(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedJaccard.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.SortedJaccard.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_jaccard"
}

object SortedJaccard {
  /** Two-pointer intersection count over sorted long arrays. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }
}
