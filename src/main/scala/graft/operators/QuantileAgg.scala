package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained APPROXIMATE QUANTILES — the ClickHouse
  * `quantileState` + AggregatingMergeTree analog, completing the maintained
  * trio of [[MaterializedAgg]] (exact sums) and [[DistinctAgg]] (distinct
  * counts): per-sync generations hold one Datasketches KLL sketch per
  * (group, tracked double column); reads merge the live generations'
  * sketches and evaluate quantiles.
  *
  * Mergeability is the 100 TB lever, as everywhere in the family: per-sync
  * IO is one KB-scale sketch per touched group, and a cross-generation read
  * is a fold over batch-count sketches — never a corpus re-scan. Unlike
  * HLL, KLL compaction is RANDOMIZED — Datasketches draws fresh random
  * bits on every merge, so even two back-to-back reads of the same
  * committed layout can differ within the error band. The guarantee —
  * and what the spec pins, for reads, reopened handles, and post-compact
  * state alike — is the KLL rank-error contract: every returned estimate's
  * true rank is within ±ε of the requested quantile (ε ≈ 1.65 % at the
  * default k = 200).
  *
  * INSERT-ONLY by nature (a KLL sketch cannot forget), same caveat and
  * remedies as [[DistinctAgg]]. Same lifecycle as the index family:
  * generations, replay-safe batch ids, compaction with one-cycle reader
  * grace, tmp + rename meta commits.
  */
final class QuantileAgg private (spark: SparkSession, val dir: String,
                                 val groupCols: Seq[String],
                                 val valueCols: Seq[String],
                                 @volatile private var committedGens: Int,
                                 @volatile private var liveBase: Int,
                                 @volatile private var appliedBatch: Int) {
  import QuantileAgg._

  /** Generations committed so far (including the creating aggregation). */
  def gens: Int = committedGens

  /** First live generation: readers scan `base <= b < gens`. */
  def base: Int = liveBase

  /** Highest applied external batch id (−1 until the first). */
  def lastBatch: Int = appliedBatch

  /** Fold-merge of a collected sketch-blob array (merge is associative up
    * to the rank-error contract; order does not matter to the guarantee).
    */
  private def foldMerge(ss: Column): Column =
    aggregate(slice(ss, lit(2), size(ss) - 1), element_at(ss, 1),
      (acc, x) => kll_sketch_merge_double(acc, x))

  /** One merged sketch row per group over the live generations. */
  private def sketches(): DataFrame = {
    val live = (liveBase until committedGens).map(g => s"$dir/b=$g")
    val collected = valueCols.map(c => collect_list(col(s"kll_$c")).as(s"ss_$c"))
    spark.read.parquet(live: _*)
      .groupBy(groupCols.map(col): _*)
      .agg(collected.head, collected.tail: _*)
      .select(groupCols.map(col) ++
        valueCols.map(c => foldMerge(col(s"ss_$c")).as(s"kll_$c")): _*)
  }

  private def commitGeneration(insert: DataFrame, batch: Int): Unit = synchronized {
    val g = committedGens
    val aggs = valueCols.map(c =>
      kll_sketch_agg_double(col(c).cast("double")).as(s"kll_$c"))
    insert.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/b=$g")
    committedGens = g + 1
    appliedBatch = batch
    writeMeta(spark, dir, groupCols, valueCols, committedGens, liveBase, appliedBatch)
  }

  /** Append one delta-sized sketch generation for an insert batch. */
  def refresh(insert: DataFrame): Unit = commitGeneration(insert, appliedBatch)

  /** Replay-safe [[refresh]] for at-least-once feeds; a batch id at or
    * below the committed mark is skipped (re-feeding the same values would
    * double their weight in the sketch). Returns whether it was applied.
    */
  def refreshBatch(batchId: Long, insert: DataFrame): Boolean = synchronized {
    require(batchId >= 0 && batchId <= Int.MaxValue, s"bad batch id $batchId")
    if (batchId.toInt <= appliedBatch) return false
    commitGeneration(insert, batchId.toInt)
    true
  }

  /** Per-group quantile estimates: group keys + `p<pct>_<col>` per tracked
    * column and requested quantile (e.g. `p50_value`, `p95_value`).
    */
  def read(quantiles: Seq[Double]): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall(q => q > 0 && q < 1),
      s"bad quantiles $quantiles")
    val ests = for (c <- valueCols; q <- quantiles)
      yield kll_sketch_get_quantile_double(col(s"kll_$c"), lit(q))
        .as(s"p${math.round(q * 100)}_$c")
    sketches().select(groupCols.map(col) ++ ests: _*)
  }

  /** Cross-group rollup: one more fold over the per-group sketches — a
    * global quantile WITHOUT rescanning anything (quantiles are not
    * summable across groups; the sketches are mergeable).
    */
  def global(quantiles: Seq[Double]): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall(q => q > 0 && q < 1),
      s"bad quantiles $quantiles")
    val collected = valueCols.map(c => collect_list(col(s"kll_$c")).as(s"ss_$c"))
    val ests = for (c <- valueCols; q <- quantiles)
      yield kll_sketch_get_quantile_double(col(s"kll_$c"), lit(q))
        .as(s"p${math.round(q * 100)}_$c")
    sketches()
      .agg(collected.head, collected.tail: _*)
      .select(valueCols.map(c => foldMerge(col(s"ss_$c")).as(s"kll_$c")): _*)
      .select(ests: _*)
  }

  /** Fold the live generations' sketches into one generation. Estimates
    * stay within the KLL rank-error contract (the merge itself is
    * randomized, so they are not bit-frozen across a compact). Superseded
    * dirs keep one compact cycle of reader grace, vacuumed by the NEXT
    * compact.
    */
  def compact(): Unit = synchronized {
    val g = committedGens
    if (g - liveBase <= 1) return
    IvfIndex.vacuumBelow(spark, dir, liveBase)
    sketches().repartition(1).write.mode("overwrite").parquet(s"$dir/b=$g")
    liveBase = g
    committedGens = g + 1
    writeMeta(spark, dir, groupCols, valueCols, committedGens, liveBase, appliedBatch)
  }
}

object QuantileAgg {

  private val Fmt = 1
  private val MetaFile = "_graft_quant.json"

  private def specHash(groupCols: Seq[String], valueCols: Seq[String]): Int =
    (groupCols.mkString(",") + "|" + valueCols.mkString(",")).hashCode

  private def writeMeta(spark: SparkSession, dir: String,
                        groupCols: Seq[String], valueCols: Seq[String],
                        gens: Int, base: Int, batch: Int): Unit =
    IndexMeta.commit(spark, dir, MetaFile,
      s"""{"fmt":$Fmt,"gens":$gens,"base":$base,"batch":$batch,""" +
        s""""spec":${specHash(groupCols, valueCols)}}""")

  /** Bootstrap from the initial corpus/mirror state (any previous contents
    * of `dir` are discarded).
    */
  def create(spark: SparkSession, initial: DataFrame, groupCols: Seq[String],
             valueCols: Seq[String], dir: String): QuantileAgg = {
    require(groupCols.nonEmpty && valueCols.nonEmpty,
      "need group and value columns")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val agg = new QuantileAgg(spark, dir, groupCols, valueCols, 0, 0, -1)
    agg.refresh(initial)
    agg
  }

  /** Attach to an existing maintained sketch set; the spec must match. */
  def open(spark: SparkSession, dir: String, groupCols: Seq[String],
           valueCols: Seq[String]): QuantileAgg = {
    val Seq(gens, base, batch, spec) =
      IndexMeta.load(spark, dir, MetaFile, Fmt, "quantile-agg",
        Seq("gens", "base", "batch", "spec"))
    require(spec == specHash(groupCols, valueCols),
      s"quantile aggregate under $dir was created with a different " +
        "group/value spec — rebuild with create()")
    new QuantileAgg(spark, dir, groupCols, valueCols, gens, base, batch)
  }
}
