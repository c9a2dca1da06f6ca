package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained APPROXIMATE DISTINCT counts — the ClickHouse
  * `uniqState` + AggregatingMergeTree analog (a materialized view keeps a
  * mergeable uniq state per group; reads finalize it). Partial generations
  * hold one Datasketches HLL sketch per (group, tracked column); reads
  * union the live generations' sketches and estimate.
  *
  * Mergeability is the 100 TB lever: per-sync IO is one KB-scale sketch
  * per touched group (never the corpus, never the raw ids), the union is
  * commutative and associative, so the maintained estimate EXACTLY equals
  * the one-shot sketch estimate over the full history — spec-pinned, not
  * hoped. The same property powers [[global]]: a cross-group rollup is a
  * union of the group sketches, no re-scan.
  *
  * INSERT-ONLY by nature: an HLL sketch cannot forget, so deletion /
  * update-retraction feeds need either a re-[[DistinctAgg.create]] or the
  * exact [[MaterializedAgg]]. Same lifecycle as the index family:
  * generations, replay-safe batch ids, compaction with one-cycle reader
  * grace, tmp+rename meta commits.
  */
final class DistinctAgg private (spark: SparkSession, val dir: String,
                                 val groupCols: Seq[String],
                                 val uniques: Seq[String],
                                 @volatile private var committedGens: Int,
                                 @volatile private var liveBase: Int,
                                 @volatile private var appliedBatch: Int) {
  import DistinctAgg._

  /** Generations committed so far (including the creating aggregation). */
  def gens: Int = committedGens

  /** First live generation: readers scan `base <= b < gens`. */
  def base: Int = liveBase

  /** Highest applied external batch id (−1 until the first). */
  def lastBatch: Int = appliedBatch

  private def sketchAggs(of: String => org.apache.spark.sql.Column) =
    uniques.map(c => of(c).as(s"hll_$c"))

  /** One collapsed sketch row per group over the live generations. */
  private def sketches(): DataFrame = {
    val live = (liveBase until committedGens).map(g => s"$dir/b=$g")
    val aggs = sketchAggs(c => hll_union_agg(col(s"hll_$c")))
    spark.read.parquet(live: _*)
      .groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def commitGeneration(insert: DataFrame, batch: Int): Unit = synchronized {
    val g = committedGens
    val aggs = sketchAggs(c => hll_sketch_agg(col(c)))
    insert.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/b=$g")
    committedGens = g + 1
    appliedBatch = batch
    writeMeta(spark, dir, groupCols, uniques, committedGens, liveBase, appliedBatch)
  }

  /** Append one delta-sized sketch generation for an insert batch. */
  def refresh(insert: DataFrame): Unit = commitGeneration(insert, appliedBatch)

  /** Replay-safe [[refresh]] for at-least-once feeds: HLL union IS
    * idempotent for identical items, but a redelivered batch may differ
    * from the original attempt (at-least-once sources can reorder or
    * extend), so the skip keeps the "applied exactly the committed
    * batches" bookkeeping honest. Returns whether the batch was applied.
    */
  def refreshBatch(batchId: Long, insert: DataFrame): Boolean = synchronized {
    require(batchId >= 0 && batchId <= Int.MaxValue, s"bad batch id $batchId")
    if (batchId.toInt <= appliedBatch) return false
    commitGeneration(insert, batchId.toInt)
    true
  }

  /** Per-group approximate distinct counts: group keys +
    * `approx_distinct_<c>` per tracked column.
    */
  def read(): DataFrame = {
    val ests = uniques.map(c =>
      hll_sketch_estimate(col(s"hll_$c")).as(s"approx_distinct_$c"))
    sketches().select(groupCols.map(col) ++ ests: _*)
  }

  /** Cross-group rollup WITHOUT rescanning anything: one more union over
    * the per-group sketches (a distinct count is not summable across
    * groups — the sketches are).
    */
  def global(): DataFrame = {
    val aggs = sketchAggs(c => hll_union_agg(col(s"hll_$c")))
    val ests = uniques.map(c =>
      hll_sketch_estimate(col(s"hll_$c")).as(s"approx_distinct_$c"))
    sketches().agg(aggs.head, aggs.tail: _*).select(ests: _*)
  }

  /** Fold the live generations' sketches into one — estimates are
    * byte-for-byte unaffected (union associativity). Superseded dirs keep
    * one compact cycle of reader grace, vacuumed by the NEXT compact.
    */
  def compact(): Unit = synchronized {
    val g = committedGens
    if (g - liveBase <= 1) return
    IvfIndex.vacuumBelow(spark, dir, liveBase)
    sketches().repartition(1).write.mode("overwrite").parquet(s"$dir/b=$g")
    liveBase = g
    committedGens = g + 1
    writeMeta(spark, dir, groupCols, uniques, committedGens, liveBase, appliedBatch)
  }
}

object DistinctAgg {

  private val Fmt = 1
  private val MetaFile = "_graft_uniq.json"

  private def specHash(groupCols: Seq[String], uniques: Seq[String]): Int =
    (groupCols.mkString(",") + "|" + uniques.mkString(",")).hashCode

  private def writeMeta(spark: SparkSession, dir: String,
                        groupCols: Seq[String], uniques: Seq[String],
                        gens: Int, base: Int, batch: Int): Unit =
    IndexMeta.commit(spark, dir, MetaFile,
      s"""{"fmt":$Fmt,"gens":$gens,"base":$base,"batch":$batch,""" +
        s""""spec":${specHash(groupCols, uniques)}}""")

  /** Bootstrap from the initial corpus/mirror state (any previous contents
    * of `dir` are discarded).
    */
  def create(spark: SparkSession, initial: DataFrame, groupCols: Seq[String],
             uniques: Seq[String], dir: String): DistinctAgg = {
    require(groupCols.nonEmpty && uniques.nonEmpty, "need group and unique columns")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val agg = new DistinctAgg(spark, dir, groupCols, uniques, 0, 0, -1)
    agg.refresh(initial)
    agg
  }

  /** Attach to an existing maintained sketch set; the spec must match. */
  def open(spark: SparkSession, dir: String, groupCols: Seq[String],
           uniques: Seq[String]): DistinctAgg = {
    val Seq(gens, base, batch, spec) =
      IndexMeta.load(spark, dir, MetaFile, Fmt, "distinct-agg",
        Seq("gens", "base", "batch", "spec"))
    require(spec == specHash(groupCols, uniques),
      s"distinct aggregate under $dir was created with a different " +
        "group/unique spec — rebuild with create()")
    new DistinctAgg(spark, dir, groupCols, uniques, gens, base, batch)
  }
}
