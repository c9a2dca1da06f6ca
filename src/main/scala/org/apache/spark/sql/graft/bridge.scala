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

  /** A child session sharing the SparkContext/cache but with a COPY of
    * the parent's session state — runtime SQLConf, temp views, registered
    * functions — so per-operator conf overrides (AQE off inside iterative
    * loops) don't lose the caller's runtime settings the way a bare
    * `newSession()` does (that one starts from startup defaults).
    */
  def cloneSession(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** The physical `RDD[InternalRow]` behind a DataFrame (memoized by the
    * Dataset's QueryExecution, so repeated jobs over it reuse its shuffle
    * output instead of recomputing the plan).
    */
  def toInternalRdd(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.toRdd

  /** Wrap an `RDD[InternalRow]` as a DataFrame without a round-trip through
    * external rows (library-extension entry into the private[sql] factory).
    */
  def internalCreateDataFrame(spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Free the cache blocks behind an eager `localCheckpoint` result NOW,
    * instead of when a GC notices the RDD became unreachable (r20, the
    * SCALING rep-2 heap-aging fix): a checkpointed Dataset's analyzed
    * plan is a `LogicalRDD` over the persisted internal RDD, and dropping
    * the blocks means unpersisting THAT rdd — `Dataset.unpersist` cannot
    * do it, it consults only the relation cache manager, which holds no
    * entry for a checkpoint. Safe no-op for non-checkpoint plans. The
    * blocks are droppable once every downstream frame that read them has
    * materialized via its own checkpoint.
    */
  def dropCheckpoint(df: org.apache.spark.sql.DataFrame,
                     blocking: Boolean = false): Unit =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(blocking)
      case _ => ()
    }

  /** ACTUAL storage footprint of a materialized frame (r20, the
    * iteration-parallelism sizing input): for an eager `localCheckpoint`
    * result, the persisted RDD's block bytes from the block manager; for
    * a `persist`ed frame, the post-materialization InMemoryRelation
    * statistics (re-resolved through the cache manager on a fresh plan
    * copy, because the original Dataset's QueryExecution was memoized
    * before materialization). −1 when unknown — callers must treat that
    * as "don't tune".
    */
  def materializedBytes(df: org.apache.spark.sql.DataFrame): Long =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        df.sparkSession.sparkContext.getRDDStorageInfo
          .find(_.id == l.rdd.id)
          .map(i => i.memSize + i.diskSize).getOrElse(-1L)
      case _ =>
        try {
          val s = ofRows(df.sparkSession, df.queryExecution.logical)
            .queryExecution.optimizedPlan.stats.sizeInBytes
          if (s.isValidLong) s.toLong else -1L
        } catch { case _: Throwable => -1L }
    }

  /** Sum of the ACTUAL bytes behind a plan's leaves (r20): materialized
    * block bytes for checkpointed `LogicalRDD` leaves, statistics for
    * file-source leaves. A cheap pre-materialization size signal for
    * sizing an iteration session's exchanges; 0 when nothing is known.
    */
  def leafInputBytes(df: org.apache.spark.sql.DataFrame): Long =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed.collectLeaves().map {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          df.sparkSession.sparkContext.getRDDStorageInfo
            .find(_.id == l.rdd.id)
            .map(i => i.memSize + i.diskSize).getOrElse(0L)
        case leaf =>
          try {
            val s = leaf.stats.sizeInBytes
            if (s.isValidLong) s.toLong else 0L
          } catch { case _: Throwable => 0L }
      }.sum

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
