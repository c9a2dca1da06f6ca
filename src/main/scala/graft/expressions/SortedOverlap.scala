package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression counting the overlap |a ∩ b| of two SORTED
  * `array<long>` element-set columns with a two-pointer merge — the
  * containment-verification companion of [[SortedJaccard]] (containment is
  * |a ∩ b| / |a|, so the verifier needs the raw intersection count, not a
  * symmetric ratio).
  *
  * `required` is a per-row abort bound (PPJoin-style position filtering):
  * when the best still-achievable overlap — count so far + min(remaining a,
  * remaining b) — falls below it, the merge exits early and returns −1.
  * On a prefix-filtered candidate stream most pairs die in the first few
  * steps; qualifying pairs still get their exact count. Pass `required`
  * ≤ 0 to always compute the full count.
  */
case class SortedOverlap(first: Expression, second: Expression,
                         third: Expression) extends TernaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any, r: Any): Any =
    SortedOverlap.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, r) =>
      s"${ev.value} = graft.expressions.SortedOverlap.compute($a, $b, $r);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SortedOverlap =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "sorted_overlap"
}

object SortedOverlap {
  /** Two-pointer intersection count over sorted long arrays; −1 when a
    * positive `required` provably cannot be reached.
    */
  def compute(a: ArrayData, b: ArrayData, required: Long): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0L
    while (i < na && j < nb) {
      if (required > 0 && inter + math.min(na - i, nb - j) < required)
        return -1L
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    if (required > 0 && inter < required) -1L else inter
  }
}
