package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.{FreqStateMerger, FrequentItemsAggregator}

/** Incrementally maintained APPROXIMATE TOP-K (heavy hitters) — the
  * ClickHouse `topKState` + AggregatingMergeTree analog, completing the
  * maintained quartet (exact sums in [[MaterializedAgg]], distinct counts
  * in [[DistinctAgg]], quantiles in [[QuantileAgg]], frequent items here).
  * Partial generations hold one Misra-Gries counter state per group
  * ([[FrequentItemsAggregator]], the algorithm behind `topK()`); reads
  * fold the live generations' states ([[FreqStateMerger]]) and emit the
  * surviving items.
  *
  * Mergeability (Agarwal et al., "Mergeable Summaries", PODS 2012) is the
  * 100 TB lever: per-sync IO is one ≤k-entry counter array per touched
  * group — never the corpus, never the exploded items — and the merged
  * error bound holds for ANY merge tree: every item with true frequency
  * > n/(k+1) of the group's TOTAL weight survives, and every reported
  * count c satisfies c ≤ true ≤ c + n/(k+1). Unlike the HLL union, the
  * merge is not bit-associative (counter values depend on merge order), so
  * the pinned guarantee is that contract, not state equality — the same
  * stance as [[QuantileAgg]]'s rank-error pin.
  *
  * INSERT-ONLY (counters cannot forget); deletion feeds re-[[create]] or
  * use the exact formulation. Same lifecycle as the family: generations,
  * replay-safe batch ids, compaction with one-cycle reader grace,
  * tmp+rename meta commits.
  */
final class TopKAgg private (spark: SparkSession, val dir: String,
                             val groupCols: Seq[String], val itemCol: String,
                             val k: Int,
                             @volatile private var committedGens: Int,
                             @volatile private var liveBase: Int,
                             @volatile private var appliedBatch: Int) {
  import TopKAgg._

  /** Generations committed so far (including the creating aggregation). */
  def gens: Int = committedGens

  /** First live generation: readers scan `base <= b < gens`. */
  def base: Int = liveBase

  /** Highest applied external batch id (−1 until the first). */
  def lastBatch: Int = appliedBatch

  private def sketchAgg: Column =
    udaf(new FrequentItemsAggregator(k), Encoders.STRING)(col(itemCol))

  private def unionAgg: Column =
    udaf(new FreqStateMerger(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]())(
      col("mg_state"))

  /** One folded counter state per group over the live generations. */
  private def states(): DataFrame = {
    val live = (liveBase until committedGens).map(g => s"$dir/b=$g")
    spark.read.parquet(live: _*)
      .groupBy(groupCols.map(col): _*)
      .agg(unionAgg.as("mg_state"))
  }

  private def commitGeneration(insert: DataFrame, batch: Int): Unit = synchronized {
    val g = committedGens
    insert.groupBy(groupCols.map(col): _*)
      .agg(sketchAgg.as("mg_state"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/b=$g")
    committedGens = g + 1
    appliedBatch = batch
    writeMeta(spark, dir, groupCols, itemCol, k, committedGens, liveBase, appliedBatch)
  }

  /** Append one delta-sized counter generation for an insert batch. */
  def refresh(insert: DataFrame): Unit = commitGeneration(insert, appliedBatch)

  /** Replay-safe [[refresh]] for at-least-once feeds (see
    * [[DistinctAgg.refreshBatch]]); returns whether the batch was applied.
    */
  def refreshBatch(batchId: Long, insert: DataFrame): Boolean = synchronized {
    require(batchId >= 0 && batchId <= Int.MaxValue, s"bad batch id $batchId")
    if (batchId.toInt <= appliedBatch) return false
    commitGeneration(insert, batchId.toInt)
    true
  }

  /** Per-group top items: group keys + (item, est_count, rank ≤ `n`),
    * ranked by estimated count (ties by item for determinism). Estimated
    * counts are Misra-Gries LOWER bounds (true ≤ est + total/(k+1)).
    */
  def read(n: Int): DataFrame = {
    require(n > 0 && n <= k, s"bad n=$n for k=$k")
    val exploded = states().select(
      groupCols.map(col) :+ explode(col("mg_state")).as("e"): _*)
      .select(groupCols.map(col) :+ col("e._1").as("item") :+
        col("e._2").as("est_count"): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("est_count").desc, col("item"))
    exploded.withColumn("rank", row_number().over(w))
      .where(col("rank") <= n)
  }

  /** Cross-group top items WITHOUT rescanning anything: one more counter
    * merge over the per-group states.
    */
  def global(n: Int): DataFrame = {
    require(n > 0 && n <= k, s"bad n=$n for k=$k")
    states().agg(unionAgg.as("mg_state"))
      .select(explode(col("mg_state")).as("e"))
      .select(col("e._1").as("item"), col("e._2").as("est_count"))
      .orderBy(col("est_count").desc, col("item"))
      .limit(n)
  }

  /** Fold the live generations into one (the mergeable-summaries bound is
    * unchanged — it depends on total weight, not merge order). Superseded
    * dirs keep one compact cycle of reader grace, vacuumed by the NEXT
    * compact.
    */
  def compact(): Unit = synchronized {
    val g = committedGens
    if (g - liveBase <= 1) return
    IvfIndex.vacuumBelow(spark, dir, liveBase)
    states().repartition(1).write.mode("overwrite").parquet(s"$dir/b=$g")
    liveBase = g
    committedGens = g + 1
    writeMeta(spark, dir, groupCols, itemCol, k, committedGens, liveBase, appliedBatch)
  }
}

object TopKAgg {

  private val Fmt = 1
  private val MetaFile = "_graft_topk.json"

  private def specHash(groupCols: Seq[String], itemCol: String, k: Int): Int =
    (groupCols.mkString(",") + "|" + itemCol + "|" + k).hashCode

  private def writeMeta(spark: SparkSession, dir: String, groupCols: Seq[String],
                        itemCol: String, k: Int, gens: Int, base: Int,
                        batch: Int): Unit =
    IndexMeta.commit(spark, dir, MetaFile,
      s"""{"fmt":$Fmt,"gens":$gens,"base":$base,"batch":$batch,""" +
        s""""spec":${specHash(groupCols, itemCol, k)}}""")

  /** Bootstrap from the initial corpus/mirror state (any previous contents
    * of `dir` are discarded).
    */
  def create(spark: SparkSession, initial: DataFrame, groupCols: Seq[String],
             itemCol: String, k: Int, dir: String): TopKAgg = {
    require(groupCols.nonEmpty && k > 0, "need group columns and k > 0")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val agg = new TopKAgg(spark, dir, groupCols, itemCol, k, 0, 0, -1)
    agg.refresh(initial)
    agg
  }

  /** Attach to an existing maintained sketch set; the spec must match. */
  def open(spark: SparkSession, dir: String, groupCols: Seq[String],
           itemCol: String, k: Int): TopKAgg = {
    val Seq(gens, base, batch, spec) =
      IndexMeta.load(spark, dir, MetaFile, Fmt, "topk-agg",
        Seq("gens", "base", "batch", "spec"))
    require(spec == specHash(groupCols, itemCol, k),
      s"top-k aggregate under $dir was created with a different spec — " +
        "rebuild with create()")
    new TopKAgg(spark, dir, groupCols, itemCol, k, gens, base, batch)
  }
}
