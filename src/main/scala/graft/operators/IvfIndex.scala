package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted-file (IVF) ANN index — the index-lifecycle companion
  * of [[Similarity.ivfTopK]], the same split [[JaccardIndex]] gives the
  * exact-Jaccard path. The one-shot form re-selects the codebook and
  * re-assigns the whole corpus on every call; a training pipeline queries
  * the same corpus for weeks, so this class persists both once and serves
  * probes from PARTITION-PRUNED scans of the assignment lists — a probe
  * reads only the `nProbe` centroid partitions its queries hash to, never
  * the corpus.
  *
  * == On-disk layout ==
  * {{{
  *   dir/_graft_ivf_index.json  {"fmt":2,"dim":D,"centroids":N,"batches":K,"q":0|1}
  *   dir/centroids/             (cent_id, v)            the codebook, written once
  *   dir/assigned/b=K/c=J/      (corpus_id, scale, codes)   q=1 (default): int8
  *   dir/assigned/b=K/c=J/      (corpus_id, cv)             q=0: raw float copy
  * }}}
  * Batches append under fresh `b=K` dirs and the meta commits last via
  * tmp + rename, exactly the [[JaccardIndex]] protocol (readers filter
  * `b < batches`, a crash mid-append leaves invisible debris, a torn meta
  * commit falls back to the complete tmp). Single writer per index dir;
  * probes only read.
  *
  * == Codebook quality (k-means refinement) ==
  * [[IvfIndex.create]] starts from the deterministic hash-ordered sample
  * [[Similarity.ivfTopK]] uses, then runs `kmeansIters` Lloyd iterations
  * over a bounded, disk-pinned corpus sample (assign → per-dimension means
  * — all DataFrame ops; empty clusters keep their previous position)
  * before freezing the codebook. The codebook is frozen at create and
  * every probe forever pays its quality: refined centroids track the
  * corpus' actual density, balancing list sizes and improving
  * recall-per-nProbe over raw sampled points (SimilaritySpec pins refined
  * recall ≥ sampled recall on a clusterable fixture). Per iteration the
  * driver materializes exactly one codebook (≤ centroids × dim values —
  * the same arrays every probe already embeds in
  * [[graft.expressions.NearestCentroids]]); the corpus itself is touched
  * only by the one bounded TakeOrdered sample, never shuffled.
  *
  * == Quantized posting store ==
  * With `quantizedStore` (the default) the assignment lists carry each
  * vector as [[graft.expressions.PackInt8]] output — a `dim`-byte binary
  * plus one double scale — instead of a float array: 4× less posting IO,
  * and at 100 TB probe IO is the product's whole cost. Scoring stays
  * native and one-pass ([[graft.expressions.Int8CosineSim]]; cosine is
  * scale-invariant, so only the `codes` column is read) and differs from
  * float scoring only by the int8 rounding — top-k overlap ≥ 0.95 is
  * spec-pinned.
  *
  * == Equivalence ==
  * With `kmeansIters = 0` and `quantizedStore = false` the index picks the
  * codebook exactly as [[Similarity.ivfTopK]] does and [[probe]] scores
  * through the same kernels, so a probe against a fresh index EQUALS the
  * one-shot call on the same corpus, queries, k, and nProbe — pinned by
  * SimilaritySpec. The defaults deliberately trade that bit-equality for
  * better recall-per-nProbe (k-means) and 4× less probe IO (int8).
  *
  * == Scale (100 TB) ==
  * Create pays one corpus pass (assignment is a pure projection against the
  * broadcast-embedded codebook — the vectors are never shuffled except by
  * the `c` repartition that lays them out for pruning). Every probe then
  * costs: nProbe nearest-centroid projections per query (driver-free), and
  * a columnar scan of ONLY the probed `c=J` directories — per-probe IO
  * tracks the probed lists, not the corpus. Partition pruning adapts to the
  * probe-batch size: up to `maxPrunedKeys` distinct probed centroids are
  * collected into a literal partition filter (file listing skips non-probed
  * dirs); past the cap the collect is abandoned (never more than
  * `maxPrunedKeys + 1` rows reach the driver) and the same key set prunes
  * via a broadcast semi-join instead — a million-query probe batch costs
  * the driver nothing. `add` appends O(batch) assignment rows; the codebook
  * is frozen at create (the standard IVF contract — rebuild periodically to
  * re-center drifted clusters, the same re-canonicalization note as
  * [[JaccardIndex]]).
  */
final class IvfIndex private (spark: SparkSession, val dir: String,
                              val dim: Int, val centroids: Int,
                              @volatile private var committedBatches: Int,
                              val quantized: Boolean,
                              centIds: Array[Long], flat: Array[Double]) {

  /** Number of batches committed so far (including the creating corpus). */
  def batches: Int = committedBatches

  private def nearest(v: Column, n: Int): Column =
    IvfIndex.nearestCol(v, centIds, flat, dim, n)

  /** Assign `batch` to its nearest centroids and append the assignment
    * lists under the next `b=K`; O(batch) compute, no corpus-side read.
    */
  def add(batch: DataFrame, idCol: String, vecCol: String): Unit = synchronized {
    val b = committedBatches
    val assigned = batch.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      element_at(nearest(col(vecCol), 1), 1).as("c"))
    val rows =
      if (quantized) assigned
        .withColumn("q8", graft.expressions.NativeFunctions.packInt8(col("cv")))
        .select(col("corpus_id"), col("q8.scale").as("scale"),
          col("q8.codes").as("codes"), col("c"))
      else assigned
    rows
      .repartition(col("c")) // ≈ one file per centroid dir, not one per task
      .write.mode("overwrite").partitionBy("c").parquet(s"$dir/assigned/b=$b")
    committedBatches = b + 1
    IvfIndex.writeMeta(spark, dir, dim, centroids, committedBatches, quantized)
  }

  /** Approximate top-k for each query against the committed index: each
    * query probes its `nProbe` nearest centroid lists, candidates are
    * scored (natively, straight off the stored form) and ranked with the
    * bounded top-k aggregator. The queries frame is evaluated twice (the
    * centroid-pruning side and the returned plan) — hand in a
    * deterministic frame (file-backed or literal), not a live tail.
    *
    * @param maxPrunedKeys partition-pruning cap: at most this many distinct
    *                      probed centroid ids are collected into a literal
    *                      partition filter; larger probe batches fall back
    *                      to an equivalent broadcast semi-join on `c` with
    *                      zero driver-side weight
    */
  def probe(queries: DataFrame, idCol: String, vecCol: String, k: Int,
            nProbe: Int = 4, maxPrunedKeys: Int = 10000): DataFrame = {
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(nearest(col(vecCol), nProbe)).as("c"))
    val base = spark.read.parquet(s"$dir/assigned")
      .where(col("b") < lit(committedBatches))
    val assigned = IvfIndex.pruneKeys(base, probes, "c", maxPrunedKeys)
    val score =
      if (quantized) graft.expressions.NativeFunctions.int8CosineSim(col("codes"), col("qv"))
      else graft.functions.VectorFunctions.cosine(col("qv"), col("cv"))
    Similarity.rankTopK(
      assigned.join(broadcast(probes), "c")
        .where(col("query_id") =!= col("corpus_id"))
        .select(col("query_id"), col("corpus_id"), score.as("cos_sim")),
      k)
  }
}

object IvfIndex {
  private val MetaFile = "_graft_ivf_index.json"
  private val FormatVersion = 2

  private[operators] def nearestCol(v: Column, centIds: Array[Long],
                                    flat: Array[Double], dim: Int, n: Int): Column =
    org.apache.spark.sql.graft.bridge.column(graft.expressions.NearestCentroids(
      org.apache.spark.sql.graft.bridge.expression(v), centIds, flat, dim, n))

  /** Shared probe-scan pruning for the persisted ANN indexes: collect up to
    * `cap` distinct values of the probes' partition-key column into a
    * literal `isin` partition filter (file listing then skips every
    * non-probed `key=J` dir); if the collect would overflow the cap —
    * detected with a `limit(cap + 1)`, so the driver never holds more than
    * `cap + 1` keys no matter the probe-batch size — fall back to a
    * broadcast semi-join on the key, which filters executor-side with no
    * driver-bound term at all.
    */
  private[operators] def pruneKeys(base: DataFrame, probes: DataFrame,
                                   keyCol: String, cap: Int): DataFrame = {
    val keyDf = probes.select(col(keyCol)).distinct()
    val keys = keyDf.limit(cap + 1).collect().map(_.getLong(0))
    if (keys.length <= cap) base.where(col(keyCol).isin(keys.toSeq: _*))
    else base.join(broadcast(keyDf), Seq(keyCol), "leftsemi")
  }

  /** Build a fresh index over `corpus` at `dir` (replacing any previous
    * index there). The codebook starts as the deterministic hash-ordered
    * sample [[Similarity.ivfTopK]] uses, then `kmeansIters` Lloyd
    * iterations over a bounded disk-pinned sample refine it before it is
    * frozen; `quantizedStore` packs the assignment lists to int8 (see the
    * class doc for both trades). `kmeansIters = 0, quantizedStore = false`
    * reproduces the one-shot path bit-for-bit.
    */
  def create(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
             numCentroids: Int = 256, kmeansIters: Int = 4,
             quantizedStore: Boolean = true): IvfIndex = {
    require(kmeansIters >= 0, s"bad kmeansIters=$kmeansIters")
    val spark = corpus.sparkSession
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    // write-then-read pins ONE evaluation of the hash-ordered sample on
    // disk: the codebook (its first numCentroids rows) and every Lloyd
    // iteration see the same rows, even over a non-deterministic corpus
    // source. Bounded: the sort+limit plans as TakeOrderedAndProject.
    val sampleCap = if (kmeansIters > 0) numCentroids * 32 else numCentroids
    corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<double>").as("v"))
      .orderBy(xxhash64(col("id")), col("id")) // ivfTopK's deterministic pick
      .limit(sampleCap)
      .write.parquet(s"$dir/_sample")
    val sample = spark.read.parquet(s"$dir/_sample")
    var centRows: Array[(Long, Array[Double])] = sample
      .orderBy(xxhash64(col("id")), col("id")).limit(numCentroids)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(centRows.nonEmpty, "cannot build an IVF index over an empty corpus")
    val dim = centRows.head._2.length
    for (_ <- 1 to kmeansIters) {
      // one Lloyd step: assign the pinned sample to its nearest current
      // centroid, recompute each centroid as the per-dimension mean of its
      // members. The collect is bounded by centroids × dim — the codebook
      // size itself, which create hands the driver anyway.
      val ids = centRows.map(_._1)
      val fl = centRows.flatMap(_._2)
      val means = sample
        .select(element_at(nearestCol(col("v"), ids, fl, dim, 1), 1).as("c"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("c"), col("pos")).agg(avg(col("x")).as("m"))
        .collect()
      val byCent = means.groupBy(_.getLong(0))
      centRows = centRows.map { case (cid, old) =>
        byCent.get(cid) match {
          case Some(rows) =>
            val nv = new Array[Double](dim)
            rows.foreach(r => nv(r.getInt(1)) = r.getDouble(2))
            (cid, nv)
          case None => (cid, old) // empty cluster: keep its position
        }
      }
    }
    // freeze the (possibly refined) codebook; centroid ids stay the sample
    // ids, so load()'s hash-order re-sort reproduces this array order
    {
      import spark.implicits._
      centRows.toSeq.toDF("id", "v").coalesce(1).write.parquet(s"$dir/centroids")
    }
    fs.delete(new Path(s"$dir/_sample"), true)
    val idx = new IvfIndex(spark, dir, dim, centRows.length, 0, quantizedStore,
      centRows.map(_._1), centRows.flatMap(_._2))
    idx.add(corpus, idCol, vecCol)
    idx
  }

  /** Open the committed index at `dir`; meta protocol (fmt skew vs
    * corruption, torn-commit tmp fallback) shared via [[IndexMeta]].
    */
  def load(spark: SparkSession, dir: String): IvfIndex = {
    val Seq(dim, cents, batches, q) = IndexMeta.load(spark, dir, MetaFile,
      FormatVersion, "IVF", Seq("dim", "centroids", "batches", "q"))
    val centRows = spark.read.parquet(s"$dir/centroids")
      .orderBy(xxhash64(col("id")), col("id")).collect()
    new IvfIndex(spark, dir, dim, cents, batches, q != 0,
      centRows.map(_.getLong(0)), centRows.flatMap(_.getSeq[Double](1)))
  }

  private def writeMeta(spark: SparkSession, dir: String, dim: Int,
                        centroids: Int, batches: Int, quantized: Boolean): Unit =
    IndexMeta.commit(spark, dir, MetaFile,
      s"""{"fmt":$FormatVersion,"dim":$dim,"centroids":$centroids,""" +
        s""""batches":$batches,"q":${if (quantized) 1 else 0}}""")
}
