package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained WEIGHTED SAMPLE — the streaming/maintained
  * twin of [[Sampling.weightedSample]], completing the maintained family
  * (exact sums in [[MaterializedAgg]], distinct counts in [[DistinctAgg]],
  * quantiles in [[QuantileAgg]], heavy hitters in [[TopKAgg]], and the
  * training-data reservoir here). A live corpus feed needs "give me k
  * docs drawn ∝ weight, NOW" without rescanning 100 TB per request; this
  * keeps that draw current at per-batch top-k cost.
  *
  * The lever is that Efraimidis–Spirakis A-ES is a PURE top-k over
  * per-row draw keys ln(u)/w ([[Sampling.esKey]]; u is the deterministic
  * keyBucket uniform, so the draw is replayable): each row's key depends
  * on nothing but the row, hence top-k(A ∪ B) = top-k(top-k(A) ∪
  * top-k(B)). Unlike the Misra-Gries merge, this makes the maintained
  * answer EXACTLY equal to the one-shot [[Sampling.weightedSample]] over
  * the concatenated batches — pinned by spec, not just bounded. Per-sync
  * IO is one ≤k-row generation (the batch's own top-k), never the corpus.
  *
  * INSERT-ONLY over the fed row stream (the [[TopKAgg]] stance):
  * at-least-once REPLAY of the same batch is absorbed by [[refreshBatch]]
  * batch marks, but a semantic re-insert of the same key counts again —
  * exactly as it would in the one-shot over the concatenated log.
  * Deletion/re-weighting feeds re-[[SampleAgg.create]]. Same lifecycle as
  * the family: generations, replay-safe batch ids, compaction with
  * one-cycle reader grace, tmp+rename meta commits.
  *
  * Reference anchor: the training-data sampling stage of the LLM
  * pipeline family (SURVEY §2 sampling/layout) — this is the piece that
  * lets the sampled mix ride a live mirror instead of a nightly rescan.
  */
final class SampleAgg private (spark: SparkSession, val dir: String,
                               val keyCol: String, val k: Int,
                               @volatile private var committedGens: Int,
                               @volatile private var liveBase: Int,
                               @volatile private var appliedBatch: Int) {
  import SampleAgg._

  /** Generations committed so far (including the creating draw). */
  def gens: Int = committedGens

  /** First live generation: readers scan `base <= b < gens`. */
  def base: Int = liveBase

  /** Highest applied external batch id (−1 until the first). */
  def lastBatch: Int = appliedBatch

  private def live(): DataFrame = {
    val dirs = (liveBase until committedGens).map(g => s"$dir/b=$g")
    spark.read.parquet(dirs: _*)
  }

  private def commitGeneration(insert: DataFrame, weight: Column,
                               batch: Int): Unit = synchronized {
    val g = committedGens
    insert.withColumn(EsCol, Sampling.esKey(col(keyCol), weight))
      .orderBy(col(EsCol).desc, col(keyCol))
      .limit(k)
      .write.mode("overwrite").parquet(s"$dir/b=$g")
    committedGens = g + 1
    appliedBatch = batch
    writeMeta(spark, dir, keyCol, k, committedGens, liveBase, appliedBatch)
  }

  /** Append one ≤k-row generation holding the insert batch's own top-k
    * draw (the batch rows that could possibly enter the global sample).
    */
  def refresh(insert: DataFrame, weight: Column): Unit =
    commitGeneration(insert, weight, appliedBatch)

  /** Replay-safe [[refresh]] for at-least-once feeds: a batch id at or
    * below the durable high-water mark is a no-op (returns false), so a
    * crashed-and-replayed foreachBatch converges instead of
    * double-counting its rows.
    */
  def refreshBatch(batchId: Long, insert: DataFrame,
                   weight: Column): Boolean = synchronized {
    require(batchId >= 0 && batchId <= Int.MaxValue, s"bad batch id $batchId")
    if (batchId.toInt <= appliedBatch) return false
    commitGeneration(insert, weight, batchId.toInt)
    true
  }

  /** The current k-row sample: the global top-k by (es desc, key) over
    * the live generations — bit-equal to the one-shot
    * [[Sampling.weightedSample]] over everything fed so far. Cost is a
    * TakeOrdered over ≤ gens·k persisted rows, corpus-size-independent.
    */
  def read(): DataFrame =
    live().orderBy(col(EsCol).desc, col(keyCol)).limit(k).drop(EsCol)

  /** Fold the live generations into one ≤k-row generation (exactness is
    * unchanged — the fold IS the top-k the read computes). Superseded
    * dirs keep one compact cycle of reader grace, vacuumed by the NEXT
    * compact ([[IvfIndex.vacuumBelow]]).
    */
  def compact(): Unit = synchronized {
    val g = committedGens
    if (g - liveBase <= 1) return
    IvfIndex.vacuumBelow(spark, dir, liveBase)
    live().orderBy(col(EsCol).desc, col(keyCol)).limit(k)
      .write.mode("overwrite").parquet(s"$dir/b=$g")
    liveBase = g
    committedGens = g + 1
    writeMeta(spark, dir, keyCol, k, committedGens, liveBase, appliedBatch)
  }
}

object SampleAgg {

  private val Fmt = 1
  private val MetaFile = "_graft_sample.json"
  private[operators] val EsCol = "__es"

  private def specHash(keyCol: String, k: Int): Int =
    (keyCol + "|" + k).hashCode

  private def writeMeta(spark: SparkSession, dir: String, keyCol: String,
                        k: Int, gens: Int, base: Int, batch: Int): Unit =
    IndexMeta.commit(spark, dir, MetaFile,
      s"""{"fmt":$Fmt,"gens":$gens,"base":$base,"batch":$batch,""" +
        s""""spec":${specHash(keyCol, k)}}""")

  /** Bootstrap from the initial corpus/mirror state (any previous
    * contents of `dir` are discarded). Every later [[SampleAgg.refresh]]
    * must feed the SAME schema and the same weight rule — the draw keys
    * of different weight rules are not comparable.
    */
  def create(spark: SparkSession, initial: DataFrame, keyCol: String,
             weight: Column, k: Int, dir: String): SampleAgg = {
    require(k > 0, s"k=$k")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val agg = new SampleAgg(spark, dir, keyCol, k, 0, 0, -1)
    agg.refresh(initial, weight)
    agg
  }

  /** Attach to an existing maintained sample; the spec must match. */
  def open(spark: SparkSession, dir: String, keyCol: String,
           k: Int): SampleAgg = {
    val Seq(gens, base, batch, spec) =
      IndexMeta.load(spark, dir, MetaFile, Fmt, "sample-agg",
        Seq("gens", "base", "batch", "spec"))
    require(spec == specHash(keyCol, k),
      s"maintained sample under $dir was created with a different spec — " +
        "rebuild with create()")
    new SampleAgg(spark, dir, keyCol, k, gens, base, batch)
  }
}
