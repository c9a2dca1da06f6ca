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
  *
  * With `threshold` > 0 the merge early-exits — returning −1 — as soon as
  * the best still-achievable similarity falls below it (position filtering,
  * as in PPJoin's verification): maxInter = inter + min(remaining a,
  * remaining b), and J ≥ t ⟺ inter·(1+t) ≥ t·(|a|+|b|), so the abort test
  * is one multiply-compare per step with no division. On a candidate
  * stream where most pairs sit far below the threshold (the typical LSH /
  * prefix-filter verification workload) this cuts the merge work several-
  * fold; qualifying pairs still get their exact value.
  */
case class SortedJaccard(left: Expression, right: Expression,
                         threshold: Double = -1.0) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedJaccard.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.SortedJaccard.compute($a, $b, $threshold);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_jaccard"
}

object SortedJaccard {
  /** Two-pointer intersection count over sorted long arrays; −1 when a
    * positive `t` is given and J provably cannot reach it.
    */
  def compute(a: ArrayData, b: ArrayData, t: Double): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    // abort when maxInter * (1+t) < t * (na+nb); the 1e-6 slack keeps the
    // bound conservative under floating-point rounding (achievable values
    // are ≥ 1+t ≥ 1 apart, so the slack can never mask a true abort) — the
    // final exact `jac >= t` comparison decides boundary cases
    val tn = t * (na + nb) - 1e-6
    val t1 = 1.0 + t
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      if (t > 0) {
        val maxInter = inter + math.min(na - i, nb - j)
        if (maxInter * t1 < tn) return -1.0
      }
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    val jac = if (union == 0) 1.0 else inter.toDouble / union
    if (t > 0 && jac < t) -1.0 else jac
  }
}
