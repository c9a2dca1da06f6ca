package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — ClickHouse `ASOF JOIN` semantics: each left row pairs
  * with the newest right row of the same key whose timestamp is `<=` the
  * left row's timestamp ([[AsOfJoin.backward]]), or the earliest one `>=`
  * it ([[AsOfJoin.forward]]), optionally bounded by a max time gap
  * (pandas `merge_asof` direction/tolerance).
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
    * @param toleranceMicros max allowed staleness (pandas `merge_asof
    *                  tolerance` / QuestDB `TOLERANCE`): a match older than
    *                  `leftTs − tolerance` is treated as NO match. Defined
    *                  for timestamp ts columns. None = unbounded.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightPrefix: String = "r_", inner: Boolean = true,
               toleranceMicros: Option[Long] = None): DataFrame =
    merged(left, right, keys, leftTs, rightTs, rightPrefix, inner,
      toleranceMicros, forward = false)

  /** Forward as-of: each left row pairs with the EARLIEST right row of the
    * same key at or after its timestamp — "what happened next": click →
    * next purchase, alert → next deploy. Same merge shape as [[backward]]
    * with the scan order reversed; `toleranceMicros` bounds how far ahead.
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String,
              rightPrefix: String = "r_", inner: Boolean = true,
              toleranceMicros: Option[Long] = None): DataFrame =
    merged(left, right, keys, leftTs, rightTs, rightPrefix, inner,
      toleranceMicros, forward = true)

  private def merged(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String, rightPrefix: String,
                     inner: Boolean, toleranceMicros: Option[Long],
                     forward: Boolean): DataFrame = {
    require(toleranceMicros.forall(_ > 0),
      s"tolerance must be positive: $toleranceMicros")
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

    // backward scans time ascending (carry the newest earlier right row
    // forward); forward scans descending (carry the earliest later right
    // row backward). Either way right (side 0) sorts before left at equal
    // instants, so same-timestamp rows match in both directions.
    val ord = if (forward) col("_asof_ts").desc else col("_asof_ts").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord, col("_asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r)
      .withColumn("_asof_match", last(col("_asof_r"), ignoreNulls = true).over(w))
      .where(col("_asof_side") === 1)

    // a match farther than the tolerance is NO match (pandas semantics):
    // the picked row is the NEAREST in the scan direction, so no other
    // candidate could be closer
    val gated = toleranceMicros match {
      case None => matched
      case Some(tol) =>
        val us = graft.functions.TimeCols.micros _
        val gap =
          if (forward)
            us(col(s"_asof_match.$rightTs")) - us(col("_asof_ts"))
          else
            us(col("_asof_ts")) - us(col(s"_asof_match.$rightTs"))
        matched.withColumn("_asof_match",
          when(gap <= tol, col("_asof_match")))
    }

    val filtered = if (inner) gated.where(col("_asof_match").isNotNull) else gated
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
