package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — ClickHouse `ASOF JOIN` semantics: each left row
  * pairs with the newest right row of the same key whose timestamp is
  * `<=` the left row's timestamp.
  *
  * Spark has no built-in as-of operator, and the naive formulation
  * (`l JOIN r ON l.key = r.key AND r.ts <= l.ts` + argmax) explodes the
  * whole history per left row before discarding it. This implementation is
  * the merge formulation instead: union both sides, one hash shuffle on the
  * key, per-key sort on (ts, side), and a running `last(right, ignoreNulls)`
  * window — every right row is carried forward to the left rows it matches,
  * O(|L| + |R|) rows total, no fan-out. Ties at equal timestamps match
  * (right sorts before left at the same instant).
  */
object AsOfJoin {

  /** @param left      probe side; one output row per matched left row
    * @param right     build side providing the "most recent state"
    * @param keys      equi-join key columns (present in both sides)
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param rightPrefix prefix for right payload columns in the output
    * @param inner     true drops unmatched left rows (ClickHouse default);
    *                  false keeps them with null right columns
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightPrefix: String = "r_", inner: Boolean = true): DataFrame = {
    val lPayload = left.columns.filterNot(keys.contains)
    val rPayload = right.columns.filterNot(keys.contains)

    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_asof_ts"), lit(1).as("_asof_side"),
        struct(lPayload.map(col): _*).as("_asof_l"),
        lit(null).cast(right.select(struct(rPayload.map(col): _*)).schema.head.dataType)
          .as("_asof_r")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_asof_ts"), lit(0).as("_asof_side"),
        lit(null).cast(left.select(struct(lPayload.map(col): _*)).schema.head.dataType)
          .as("_asof_l"),
        struct(rPayload.map(col): _*).as("_asof_r")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_ts"), col("_asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r)
      .withColumn("_asof_match", last(col("_asof_r"), ignoreNulls = true).over(w))
      .where(col("_asof_side") === 1)

    val filtered = if (inner) matched.where(col("_asof_match").isNotNull) else matched
    filtered.select(
      keys.map(col) ++
        lPayload.map(c => col(s"_asof_l.$c").as(c)) ++
        rPayload.map(c => col(s"_asof_match.$c").as(s"$rightPrefix$c")): _*)
  }

  /** Same semantics through the custom planner path
    * ([[graft.plans.AsOfJoinPlan]] → [[graft.plans.AsOfJoinExec]]): a
    * dedicated sort-merge physical operator instead of the union+window
    * formulation — no struct packing, no window buffer, one retained right
    * row per key. Registers the strategy on the session (idempotent).
    */
  def backwardExec(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   rightPrefix: String = "r_", inner: Boolean = true): DataFrame = {
    import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy, PushFilterThroughAsOfJoin}
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsOfJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsOfJoin
    // prefix-rename the whole right side: distinct output names AND fresh
    // expr ids, so self-joins (left and right from the same scan) resolve
    val renamedRight = right.select(
      right.columns.map(c => col(c).as(s"$rightPrefix$c")): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = renamedRight.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val plan = AsOfJoinPlan(lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(k => attr(rPlan, s"$rightPrefix$k")),
      attr(lPlan, leftTs), attr(rPlan, s"$rightPrefix$rightTs"), inner)
    org.apache.spark.sql.graft.bridge.ofRows(spark, plan)
      .drop(keys.map(k => s"$rightPrefix$k"): _*)
  }
}
