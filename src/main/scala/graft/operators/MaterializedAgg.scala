package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained aggregate over a CDC mirror — the Spark
  * re-expression of the reference target's materialized-view pattern: a
  * ClickHouse SummingMergeTree fed by a materialized view keeps partial
  * aggregate states in parts, collapses them at read, and folds them at
  * merge (the natural companion of the replicated tables
  * quickstart_prepare_peers.sh:84-91 creates). Here the parts are `b=K`
  * partial-aggregate generations under one directory:
  *
  *  - [[MaterializedAgg.create]]: one full aggregation of the initial
  *    mirror state → generation 0.
  *  - [[refresh]]: ONE delta-sized partial generation per sync — inserts
  *    enter positive, retracted rows (the pre-image of updated/deleted
  *    keys) enter NEGATED. The corpus is never rescanned: maintenance IO
  *    tracks the delta, which is what makes the pattern viable at 100 TB.
  *  - [[read]]: collapse the live generations (sum of partials, groups
  *    whose row count nets to zero vanish). Read cost tracks the number of
  *    generations until—
  *  - [[compact]]: folds all live generations into one, with the same
  *    one-cycle reader grace as the persisted index family (superseded
  *    `b=K` dirs are vacuumed by the NEXT compact, so a read planned
  *    against the previous meta keeps evaluating).
  *
  * Additive aggregates only (row count + per-column sums): exactly the
  * retractable class — a min/max cannot be maintained under deletion
  * without the full data. Averages divide the two at read. A negative
  * net `n_rows` means a retraction arrived without its matching insert
  * (caller bug); [[read]] surfaces it rather than masking it.
  *
  * Single-writer like the index family: create/refresh/compact are
  * serialized per instance; readers pin generations via the meta.
  */
final class MaterializedAgg private (spark: SparkSession, val dir: String,
                                     val groupCols: Seq[String],
                                     val sums: Seq[String],
                                     @volatile private var committedGens: Int,
                                     @volatile private var liveBase: Int,
                                     @volatile private var appliedBatch: Int) {
  import MaterializedAgg._

  /** Generations committed so far (including the creating aggregation). */
  def gens: Int = committedGens

  /** First live generation: readers scan `base <= b < gens`. */
  def base: Int = liveBase

  /** Highest externally supplied batch id applied via [[refreshBatch]]
    * (−1 until the first); the replay-dedup high-water mark.
    */
  def lastBatch: Int = appliedBatch

  private def sumCols(sign: Int) =
    sum(lit(sign.toLong)).as("n_rows") +:
      sums.map(c => sum(col(c) * lit(sign.toLong)).as(s"sum_$c"))

  /** Delta-sized partial: inserts positive, retractions negated, merged to
    * one row per touched group.
    */
  private def partial(insert: DataFrame, retract: DataFrame): DataFrame = {
    def side(df: DataFrame, sign: Int) = {
      val aggs = sumCols(sign)
      df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
    val merged = side(insert, 1).unionByName(side(retract, -1))
    val total = sum(col("n_rows")).as("n_rows") +:
      sums.map(c => sum(col(s"sum_$c")).as(s"sum_$c"))
    merged.groupBy(groupCols.map(col): _*).agg(total.head, total.tail: _*)
  }

  /** Append one partial generation for a sync batch: `insert` = the rows
    * the batch adds to the live mirror state, `retract` = the pre-image
    * rows it replaces or deletes. Both frames are delta-sized; so is the
    * written generation (one file — partials are group-cardinality-bounded
    * and a guaranteed footer keeps an all-retracted generation readable).
    */
  def refresh(insert: DataFrame, retract: DataFrame): Unit =
    commitGeneration(insert, retract, appliedBatch)

  private def commitGeneration(insert: DataFrame, retract: DataFrame,
                               batch: Int): Unit = synchronized {
    val g = committedGens
    partial(insert, retract).repartition(1)
      .write.mode("overwrite").parquet(s"$dir/b=$g")
    committedGens = g + 1
    appliedBatch = batch
    writeMeta(spark, dir, groupCols, sums, committedGens, liveBase, appliedBatch)
  }

  /** CDC-shaped refresh: `upserts` is the sync batch collapsed to its
    * newest row per key (with `deletedCol` marking delete-final keys),
    * `mirrorLiveBefore` the live mirror rows BEFORE the batch applied.
    * Retraction = the pre-image of every touched key; insert = the
    * batch's surviving rows.
    */
  def refreshFromUpsert(mirrorLiveBefore: DataFrame, upserts: DataFrame,
                        keys: Seq[String], deletedCol: String): Unit = {
    val touched = upserts.select(keys.map(col): _*).distinct()
    val retract = mirrorLiveBefore.join(touched, keys, "left_semi")
    val insert = upserts.where(!col(deletedCol))
    refresh(insert, retract)
  }

  /** Replay-safe [[refreshFromUpsert]] for at-least-once feeds (Structured
    * Streaming `foreachBatch`): a batch id at or below the high-water mark
    * is the redelivery of an already-applied batch and is SKIPPED — the
    * partials are additive, so without this guard every replay would
    * double-count. The id advances only after the generation's data is
    * committed (a crash between data and meta write re-applies the batch,
    * overwriting the same generation dir — idempotent). Returns whether
    * the batch was applied.
    */
  def refreshBatch(batchId: Long, mirrorLiveBefore: DataFrame,
                   upserts: DataFrame, keys: Seq[String],
                   deletedCol: String): Boolean = synchronized {
    require(batchId >= 0 && batchId <= Int.MaxValue, s"bad batch id $batchId")
    if (batchId.toInt <= appliedBatch) return false
    val touched = upserts.select(keys.map(col): _*).distinct()
    val retract = mirrorLiveBefore.join(touched, keys, "left_semi")
    val insert = upserts.where(!col(deletedCol))
    commitGeneration(insert, retract, batchId.toInt)
    true
  }

  /** The maintained aggregate as of the last committed generation: group
    * keys + `n_rows` + `sum_<c>` per sum column. Groups that net to zero
    * rows have been fully retracted and vanish; a NEGATIVE `n_rows` is
    * deliberately surfaced (it means retract-without-insert — a caller
    * accounting bug that filtering `> 0` would silently absorb).
    */
  def read(): DataFrame = {
    val live = (liveBase until committedGens).map(g => s"$dir/b=$g")
    val total = sum(col("n_rows")).as("n_rows") +:
      sums.map(c => sum(col(s"sum_$c")).as(s"sum_$c"))
    spark.read.parquet(live: _*)
      .groupBy(groupCols.map(col): _*).agg(total.head, total.tail: _*)
      .where(col("n_rows") =!= 0L)
  }

  /** Fold every live generation into one — the part-merge. Zero-net groups
    * are dropped (they can only reappear via a future insert). Superseded
    * generation dirs are retained one compact cycle and vacuumed by the
    * NEXT compact, so reads planned against the previous meta keep
    * evaluating (the index family's reader grace).
    */
  def compact(): Unit = synchronized {
    val g = committedGens
    if (g - liveBase <= 1) return // already a single (or no) live generation
    IvfIndex.vacuumBelow(spark, dir, liveBase)
    read().repartition(1).write.mode("overwrite").parquet(s"$dir/b=$g")
    liveBase = g
    committedGens = g + 1
    writeMeta(spark, dir, groupCols, sums, committedGens, liveBase, appliedBatch)
  }
}

object MaterializedAgg {

  private val Fmt = 1
  private val MetaFile = "_graft_agg.json"

  private def specHash(groupCols: Seq[String], sums: Seq[String]): Int =
    (groupCols.mkString(",") + "|" + sums.mkString(",")).hashCode

  private def writeMeta(spark: SparkSession, dir: String,
                        groupCols: Seq[String], sums: Seq[String],
                        gens: Int, base: Int, batch: Int): Unit =
    IndexMeta.commit(spark, dir, MetaFile,
      s"""{"fmt":$Fmt,"gens":$gens,"base":$base,"batch":$batch,""" +
        s""""spec":${specHash(groupCols, sums)}}""")

  /** Bootstrap: aggregate the initial mirror state into generation 0. Any
    * previous contents of `dir` are discarded (create is a full rebuild,
    * not a sync).
    */
  def create(spark: SparkSession, initial: DataFrame, groupCols: Seq[String],
             sums: Seq[String], dir: String): MaterializedAgg = {
    require(groupCols.nonEmpty && sums.nonEmpty, "need group and sum columns")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val agg = new MaterializedAgg(spark, dir, groupCols, sums, 0, 0, -1)
    agg.refresh(initial, initial.limit(0))
    agg
  }

  /** Attach to an existing maintained aggregate; the spec must match the
    * one it was created with (a different grouping needs a rebuild —
    * partials of one spec cannot serve another).
    */
  def open(spark: SparkSession, dir: String, groupCols: Seq[String],
           sums: Seq[String]): MaterializedAgg = {
    val Seq(gens, base, batch, spec) =
      IndexMeta.load(spark, dir, MetaFile, Fmt, "materialized-agg",
        Seq("gens", "base", "batch", "spec"))
    require(spec == specHash(groupCols, sums),
      s"materialized aggregate under $dir was created with a different " +
        "group/sum spec — rebuild with create()")
    new MaterializedAgg(spark, dir, groupCols, sums, gens, base, batch)
  }
}
