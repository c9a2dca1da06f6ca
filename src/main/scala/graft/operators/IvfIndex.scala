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
  *   dir/_graft_ivf_index.json  {"fmt":1,"dim":D,"centroids":N,"batches":K}
  *   dir/centroids/             (cent_id, v)      the codebook, written once
  *   dir/assigned/b=K/c=J/      (corpus_id, cv)   J = nearest centroid id
  * }}}
  * Batches append under fresh `b=K` dirs and the meta commits last via
  * tmp + rename, exactly the [[JaccardIndex]] protocol (readers filter
  * `b < batches`, a crash mid-append leaves invisible debris, a torn meta
  * commit falls back to the complete tmp). Single writer per index dir;
  * probes only read.
  *
  * == Equivalence ==
  * [[IvfIndex.create]] picks the codebook exactly as [[Similarity.ivfTopK]]
  * does (deterministic hash-ordered sample, capped at `numCentroids`) and
  * [[probe]] scores and ranks through the same kernels
  * ([[graft.expressions.NearestCentroids]], [[Similarity.rankTopK]]), so a
  * probe against a fresh index EQUALS the one-shot call on the same corpus,
  * queries, k, and nProbe — pinned by SimilaritySpec.
  *
  * == Scale (100 TB) ==
  * Create pays one corpus pass (assignment is a pure projection against the
  * broadcast-embedded codebook — the vectors are never shuffled except by
  * the `c` repartition that lays them out for pruning). Every probe then
  * costs: nProbe nearest-centroid projections per query (driver-free),
  * one bounded collect of the probed centroid ids (≤ min(queries × nProbe,
  * N)), and a columnar scan of ONLY those `c=J` directories — per-probe IO
  * tracks the probed lists, not the corpus. `add` appends O(batch)
  * assignment rows; the codebook is frozen at create (the standard IVF
  * contract — rebuild periodically to re-center drifted clusters, the same
  * re-canonicalization note as [[JaccardIndex]]).
  */
final class IvfIndex private (spark: SparkSession, val dir: String,
                              val dim: Int, val centroids: Int,
                              @volatile private var committedBatches: Int,
                              centIds: Array[Long], flat: Array[Double]) {

  /** Number of batches committed so far (including the creating corpus). */
  def batches: Int = committedBatches

  private def nearest(v: Column, n: Int): Column =
    org.apache.spark.sql.graft.bridge.column(graft.expressions.NearestCentroids(
      org.apache.spark.sql.graft.bridge.expression(v), centIds, flat, dim, n))

  /** Assign `batch` to its nearest centroids and append the assignment
    * lists under the next `b=K`; O(batch) compute, no corpus-side read.
    */
  def add(batch: DataFrame, idCol: String, vecCol: String): Unit = synchronized {
    val b = committedBatches
    batch.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
        element_at(nearest(col(vecCol), 1), 1).as("c"))
      .repartition(col("c")) // ≈ one file per centroid dir, not one per task
      .write.mode("overwrite").partitionBy("c").parquet(s"$dir/assigned/b=$b")
    committedBatches = b + 1
    IvfIndex.writeMeta(spark, dir, dim, centroids, committedBatches)
  }

  /** Approximate top-k for each query against the committed index: each
    * query probes its `nProbe` nearest centroid lists, candidates are
    * scored exactly and ranked with the bounded top-k aggregator. The
    * queries frame is evaluated twice (the centroid-pruning collect and
    * the returned plan) — hand in a deterministic frame (file-backed or
    * literal), not a live tail.
    */
  def probe(queries: DataFrame, idCol: String, vecCol: String, k: Int,
            nProbe: Int = 4): DataFrame = {
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(nearest(col(vecCol), nProbe)).as("c"))
    // bounded collect: ≤ min(queries × nProbe, centroids) distinct ids —
    // these prune the assigned SCAN to matching c=J partition dirs
    val cvals = probes.select(col("c")).distinct().collect().map(_.getLong(0)).toSeq
    val assigned = spark.read.parquet(s"$dir/assigned")
      .where(col("b") < lit(committedBatches) && col("c").isin(cvals: _*))
    Similarity.rankTopK(
      assigned.join(broadcast(probes), "c")
        .where(col("query_id") =!= col("corpus_id"))
        .select(col("query_id"), col("corpus_id"),
          graft.functions.VectorFunctions.cosine(col("qv"), col("cv")).as("cos_sim")),
      k)
  }
}

object IvfIndex {
  private val MetaFile = "_graft_ivf_index.json"
  private val FormatVersion = 1

  /** Build a fresh index over `corpus` at `dir` (replacing any previous
    * index there). The codebook is the same deterministic hash-ordered
    * sample as [[Similarity.ivfTopK]] — at production scale, k-means
    * centroids from a sampled training pass slot in unchanged.
    */
  def create(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
             numCentroids: Int = 256): IvfIndex = {
    val spark = corpus.sparkSession
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    // write-then-read pins ONE evaluation of the sample on disk: the
    // instance's codebook always equals the persisted one, even over a
    // non-deterministic corpus source
    corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<double>").as("v"))
      .orderBy(xxhash64(col("id")), col("id")) // ivfTopK's deterministic pick
      .limit(numCentroids)
      .write.parquet(s"$dir/centroids")
    val centRows = spark.read.parquet(s"$dir/centroids")
      .orderBy(xxhash64(col("id")), col("id")).collect()
    require(centRows.nonEmpty, "cannot build an IVF index over an empty corpus")
    val dim = centRows.head.getSeq[Double](1).length
    val idx = new IvfIndex(spark, dir, dim, centRows.length, 0,
      centRows.map(_.getLong(0)), centRows.flatMap(_.getSeq[Double](1)))
    idx.add(corpus, idCol, vecCol)
    idx
  }

  /** Open the committed index at `dir`; meta protocol (fmt skew vs
    * corruption, torn-commit tmp fallback) shared via [[IndexMeta]].
    */
  def load(spark: SparkSession, dir: String): IvfIndex = {
    val Seq(dim, cents, batches) = IndexMeta.load(spark, dir, MetaFile,
      FormatVersion, "IVF", Seq("dim", "centroids", "batches"))
    val centRows = spark.read.parquet(s"$dir/centroids")
      .orderBy(xxhash64(col("id")), col("id")).collect()
    new IvfIndex(spark, dir, dim, cents, batches,
      centRows.map(_.getLong(0)), centRows.flatMap(_.getSeq[Double](1)))
  }

  private def writeMeta(spark: SparkSession, dir: String, dim: Int,
                        centroids: Int, batches: Int): Unit =
    IndexMeta.commit(spark, dir, MetaFile,
      s"""{"fmt":$FormatVersion,"dim":$dim,"centroids":$centroids,"batches":$batches}""")
}
