package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers. AQE's skew-join splitting covers sort-merge
  * joins at runtime; these cover the cases it does not:
  * a single hot grouping key that overwhelms one reducer, and broadcast-side
  * replication for a skewed join against a small-but-not-tiny table.
  */
object Skew {

  /** Two-phase (salted) aggregation for algebraic aggregates: phase 1
    * aggregates on (keys, salt) spreading a hot key over `saltBuckets`
    * reducers; phase 2 re-aggregates to the final keys. `aggs` maps output
    * column name → (phase-1 aggregate of an input column, phase-2
    * re-aggregate of the phase-1 result) — e.g. sum/sum, count/sum,
    * min/min, max/max.
    *
    * Spark's hash aggregate already does map-side partial combine, which
    * handles most skew; salting matters when the *post-combine* per-key
    * load is still unbalanced (huge distinct groups, or sketches like HLL
    * where partial states are large).
    */
  /** One salted aggregate: `name` in the output, phase-1 over `input`,
    * phase-2 over the phase-1 column. sum→sum, count→sum, min→min, max→max.
    */
  case class SaltedAggSpec(name: String, input: Column,
                           phase1: Column => Column, phase2: Column => Column)

  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                aggs: Seq[SaltedAggSpec]): DataFrame = {
    val salt = pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets))
    val p1 = df.withColumn("_salt", salt)
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(aggs.head.phase1(aggs.head.input).as(aggs.head.name),
        aggs.tail.map(a => a.phase1(a.input).as(a.name)): _*)
    p1.groupBy(keys.map(col): _*)
      .agg(aggs.head.phase2(col(aggs.head.name)).as(aggs.head.name),
        aggs.tail.map(a => a.phase2(col(a.name)).as(a.name)): _*)
  }

  /** Salted equi-join for a skewed left side: left rows get a random-ish
    * salt in [0, saltBuckets); the right side is replicated once per salt
    * value, so a hot key's rows spread over `saltBuckets` tasks instead of
    * one. Right side grows ×saltBuckets — use when right is modest and AQE
    * cannot help (e.g. the join must be shuffle-hash).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltBuckets: Int): DataFrame = {
    val salted = left.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }
}
