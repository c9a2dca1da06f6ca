package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Identity over a boolean predicate that REPORTS itself non-deterministic
  * — the pushdown barrier behind
  * [[graft.streaming.WatermarkGuard.clockSafeFilter]]. Catalyst refuses to
  * move or fold non-deterministic predicates, so a filter wrapped in this
  * stays exactly where it was written — above an `EventTimeWatermark`, in
  * the hazard this exists for. Nothing else can express that pin:
  * `monotonically_increasing_id()` is banned from streaming plans, and
  * `rand()`-based always-false terms get folded away by the optimizer's
  * rand-bounds reasoning. Evaluation and codegen delegate to the child
  * unchanged (row-wise identical, stays inside WholeStageCodegen); only
  * the `deterministic` flag lies — in the safe direction.
  */
case class ClockSafeBarrier(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BooleanType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"clock_safe_barrier needs a boolean predicate, got ${child.dataType}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): ClockSafeBarrier =
    copy(child = newChild)

  override def prettyName: String = "clock_safe_barrier"
}
