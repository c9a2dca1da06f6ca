package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ExpressionUtils => EU}

/** Bridge into Spark's `private[sql]` Column ⇄ catalyst Expression
  * converters, so graft's native expressions can surface as `Column`s.
  * Placed under `org.apache.spark.sql` (the standard extension-library
  * pattern) to satisfy the access qualifier; no Spark internals are
  * modified.
  */
object bridge {
  def column(e: Expression): Column = EU.column(e)
  def expression(c: Column): Expression = EU.expression(c)

  /** Build a DataFrame from a raw logical plan (library-extension entry
    * into the private[sql] Dataset factory, cf. public examples like
    * Qbeast's DatasetFactory).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register graft's SQL functions on an already-running session (the
    * `spark.sql.extensions` config path only applies at session build).
    */
  def registerFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    graft.expressions.GraftExtensions.functions.foreach { case (id, info, builder) =>
      classic.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
  }
}
