package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, key-stable sampling and splitting for training-data
  * pipelines. Unlike `df.sample` (seeded per partition — results change
  * with partitioning and Spark version), these derive the decision from the
  * key alone: the same row lands in the same split on every run, on every
  * cluster layout, and rows sharing a key never straddle a split (no
  * train/test leakage across a document's duplicates).
  *
  * The decider is a multiplicative hash of the key modulo 10_000 — plain
  * integer arithmetic, reproducible in any engine (the DuckDB oracle runs
  * the same formula verbatim).
  */
object Sampling {

  private final val Prime = 2654435761L // Knuth multiplicative constant

  /** Pseudo-random but deterministic bucket in [0, 10000) from a numeric key. */
  def keyBucket(key: Column): Column =
    pmod(key.cast("long") * Prime, lit(10000L))

  /** Keep ~`rate` of rows, stably by key. */
  def stableSample(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.where(keyBucket(key) < (rate * 10000).toLong)

  /** Tag rows with a train/test split, stably by key. */
  def splitByKey(df: DataFrame, key: Column, testFraction: Double): DataFrame =
    df.withColumn("is_test", keyBucket(key) < (testFraction * 10000).toLong)

  /** Exact-count stratified sample: within each stratum keep exactly
    * ⌈fraction · stratum size⌉ rows, chosen deterministically by hash order
    * (ties broken by the key, so the pick is total and reproducible in any
    * engine). Rate-based sampling drifts per stratum at small sizes; this
    * hits the quota exactly — the usual requirement when balancing language
    * or domain mixes in a training set.
    *
    * One shuffle keyed by the strata; within each stratum a window sort
    * (per-group work bounded by stratum size — for giant strata combine
    * with [[stableSample]] to pre-thin before exact balancing).
    */
  def stratifiedSample(df: DataFrame, strata: Seq[String], key: Column,
                       fraction: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byStratum = Window.partitionBy(strata.map(col): _*)
    val picked = byStratum.orderBy(keyBucket(key), key)
    df.withColumn("__rn", row_number().over(picked))
      .withColumn("__m", count(lit(1)).over(byStratum))
      .where(col("__rn") <= ceil(col("__m") * lit(fraction)))
      .drop("__rn", "__m")
  }
}
