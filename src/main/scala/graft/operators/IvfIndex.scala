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
  *   dir/_graft_ivf_index.json  {"fmt":6,"dim":D,"centroids":N,"batches":K,"base":B,"q":0|1|2,"applied":A,"pq_res":0|1,"pq_rot":0|1[,"pq_m","pq_ksub"]}
  *   dir/centroids/             (cent_id, v)            the codebook, written once
  *   dir/pq/                    (m, ksub, dsub, cb, rot)  q=2: frozen sub-codebooks + OPQ rotation
  *   dir/assigned/b=K/c=J/      (corpus_id, scale, codes)   q=1 (default): int8
  *   dir/assigned/b=K/c=J/      (corpus_id, codes)          q=2: m-byte PQ codes
  *   dir/assigned/b=K/c=J/      (corpus_id, cv)             q=0: raw float copy
  * }}}
  * Batches append under fresh `b=K` dirs and the meta commits last via
  * tmp + rename, exactly the [[JaccardIndex]] protocol (readers filter
  * `base <= b < batches`, a crash mid-append/mid-compact leaves invisible
  * debris, a torn meta commit falls back to the complete tmp). [[compact]]
  * folds the live generations into one when append-fragmentation builds
  * up. Single writer per index dir; probes only read.
  *
  * == Codebook quality (k-means refinement) ==
  * [[IvfIndex.create]] starts from the deterministic hash-ordered sample
  * [[Similarity.ivfTopK]] uses, then runs `kmeansIters` Lloyd iterations
  * (assign → per-dimension means; empty clusters keep their position)
  * before freezing the codebook. The codebook is frozen at create and
  * every probe forever pays its quality: refined centroids track the
  * corpus' actual density, balancing list sizes and improving
  * recall-per-nProbe over raw sampled points (SimilaritySpec pins refined
  * recall ≥ sampled recall on a clusterable fixture). The refinement input
  * is ONE bounded TakeOrdered collect (≤ 32× the codebook the driver
  * already embeds in [[graft.expressions.NearestCentroids]]; the corpus is
  * never shuffled), and the iterations run driver-side through the same
  * assignment kernel probes use — sequential, deterministic, no
  * per-iteration job or codegen cost.
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
  * == PQ posting store (IVFADC) ==
  * `pqM > 0` stores each posting as `pqM` one-byte product-quantization
  * sub-codes instead — `pqM` bytes per vector (64 dims at m=8: 32× less
  * than float, 8× less than int8), the full IVFADC shape: IVF prunes the
  * lists, ADC scores the codes. Sub-codebooks train at create on the SAME
  * bounded hash-ordered sample as the centroid refinement
  * ([[Similarity.pqFit]] — the `pqTopK` kernel) and freeze beside the
  * centroids; encode and probe run the native codegen'd
  * [[graft.expressions.PqEncode]] / [[graft.expressions.PqCosineSim]]
  * kernels `Similarity.pqEncode`/`pqTopK` score with — one shared code
  * path, so batch and indexed PQ agree by construction. Recall and
  * reload-bit-equality are spec-pinned; the rougher quantization trades
  * recall for IO — size `pqM`/`pqKsub` to the corpus as the PQ
  * literature does. Since fmt 6 the PQ path defaults to an OPQ-lite
  * PCA rotation before the subspace split ([[Similarity.opqRotation]]:
  * principal axes interleaved across subspaces) — codes quantize the
  * rotated residual, probes rotate their side once; orthogonality keeps
  * every cosine identical to what the unrotated kernel would compute on
  * the same reconstruction, and the rotated-recall ≥ unrotated-recall
  * claim is spec-pinned on a correlated-dims fixture.
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
                              @volatile private var liveBase: Int,
                              val store: Int, // 0 float, 1 int8, 2 PQ
                              centIds: Array[Long], flat: Array[Double],
                              pqModel: Option[Similarity.PqModel] = None,
                              @volatile private var appliedBatch: Int = -1,
                              val pqResidual: Boolean = false,
                              val pqRot: Option[Array[Double]] = None)
  extends VectorIndexWriter {

  /** Broadcastable (centroid id, centroid vector) frame — the join side
    * residual encode/score needs (k rows; built once from the codebook
    * the driver already holds).
    */
  @transient private lazy val centroidFrame: org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    centIds.indices
      .map(i => (centIds(i), flat.slice(i * dim, (i + 1) * dim).toSeq))
      .toDF("c", "cvec")
  }

  /** [[centroidFrame]] with the OPQ rotation applied (identity when no
    * rotation): residual PROBES join this one, so the scoring kernel sees
    * c̃ = R·c and x̂̃ = c̃ + decode(codes) = R·x̂ — orthogonality keeps the
    * cosine exactly what the unrotated kernel would compute on x̂.
    */
  @transient private lazy val centroidFrameScore: org.apache.spark.sql.DataFrame =
    pqRot match {
      case None => centroidFrame
      case Some(r) =>
        import spark.implicits._
        centIds.indices.map { i =>
          val c = flat.slice(i * dim, (i + 1) * dim)
          val out = new Array[Double](dim)
          var ri = 0
          while (ri < dim) {
            var s = 0.0; var ci = 0
            while (ci < dim) { s += r(ri * dim + ci) * c(ci); ci += 1 }
            out(ri) = s; ri += 1
          }
          (centIds(i), out.toSeq)
        }.toDF("c", "cvec")
    }

  private def rotated(v: Column): Column = pqRot match {
    case None => v.cast("array<double>")
    case Some(r) => org.apache.spark.sql.graft.bridge.column(
      graft.expressions.RotateVector(
        org.apache.spark.sql.graft.bridge.expression(v), r, dim))
  }

  private val reads = new IndexMeta.CachedReads(spark)

  /** int8-packed posting store (the fmt-3 `q=1` layout). */
  def quantized: Boolean = store == IvfIndex.StoreInt8

  /** Number of batches committed so far (including the creating corpus). */
  def batches: Int = committedBatches

  /** First live generation: readers scan `base <= b < batches`. Advanced by
    * [[compact]]; 0 until then.
    */
  def base: Int = liveBase

  /** Live generation count — see [[VectorIndexWriter.liveGenerations]]. */
  override def liveGenerations: Int = committedBatches - liveBase

  /** Highest applied EXTERNAL batch id (−1 until [[addBatch]] is used). */
  def lastBatch: Int = appliedBatch

  private def nearest(v: Column, n: Int): Column =
    IvfIndex.nearestCol(v, centIds, flat, dim, n)

  /** Assign `batch` to its nearest centroids and append the assignment
    * lists under the next `b=K`; O(batch) compute, no corpus-side read.
    */
  def add(batch: DataFrame, idCol: String, vecCol: String): Unit =
    synchronized { addWithMark(batch, idCol, vecCol, appliedBatch) }

  /** Replay-safe [[add]] for at-least-once feeds (the streaming rider,
    * mirroring [[TextIndex.addBatch]]): a batch id at or below the
    * committed high-water mark is skipped — re-adding the same vectors
    * would double their postings. Returns whether the batch was applied.
    */
  def addBatch(batchId: Long, batch: DataFrame, idCol: String,
               vecCol: String): Boolean = synchronized {
    require(batchId >= 0 && batchId <= Int.MaxValue, s"bad batch id $batchId")
    if (batchId.toInt <= appliedBatch) return false
    addWithMark(batch, idCol, vecCol, batchId.toInt)
    true
  }

  /** Write the generation FIRST, then flip mark + meta in one commit — a
    * failure mid-write leaves the mark unadvanced (the orphan `b=K` dir is
    * invisible debris, the standard protocol).
    */
  private def addWithMark(batch: DataFrame, idCol: String, vecCol: String,
                          newApplied: Int): Unit = {
    val b = committedBatches
    val assigned = batch.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      element_at(nearest(col(vecCol), 1), 1).as("c"))
    val rows = store match {
      case IvfIndex.StoreInt8 => assigned
        .withColumn("q8", graft.expressions.NativeFunctions.packInt8(col("cv")))
        .select(col("corpus_id"), col("q8.scale").as("scale"),
          col("q8.codes").as("codes"), col("c"))
      case IvfIndex.StorePq =>
        val mdl = pqModel.get
        // residual mode (classic IVFADC): the codes quantize x − centroid,
        // not x — the centroid joins in broadcast (k rows) and the
        // subtraction is a codegen'd zip_with
        val src =
          if (!pqResidual) assigned
            .withColumn("enc", col("cv").cast("array<double>"))
          else assigned.join(broadcast(centroidFrame), "c")
            .withColumn("enc", expr(
              "zip_with(CAST(cv AS ARRAY<DOUBLE>), cvec, (a, b) -> a - b)"))
        // OPQ-lite: codes quantize the ROTATED residual/vector — the
        // rotation composes before the subspace split (identity when the
        // index was built without one)
        src.select(col("corpus_id"),
          org.apache.spark.sql.graft.bridge.column(graft.expressions.PqEncode(
            org.apache.spark.sql.graft.bridge.expression(rotated(col("enc"))),
            mdl.codebooks, mdl.m, mdl.ksub, mdl.dsub)).as("codes"),
          col("c"))
      case _ => assigned
    }
    // r20: EXPLICIT partition count — `repartition(col("c"))` alone is
    // subject to AQE coalescing, and a byte-wise small batch collapsed to
    // 2 tasks that then created the ~`centroids` partition dirs/files
    // SERIALLY (measured 2.4 s of ann_ivf_indexed's 4.5 s; file-system
    // metadata ops, not data, are the cost). An explicit count is exempt
    // from coalescing; the parallelism floor spreads the per-dir committer
    // work across the executors (one-task-per-centroid was ALSO measured:
    // 256 tasks × ~0.13 s fixed writer setup is slower than 32 tasks × a
    // few dirs each). Layout unchanged: each centroid still hashes to
    // exactly one task ⇒ one file per centroid dir per batch.
    rows
      .repartition(graft.GraftSession.parallelismFloor(batch.sparkSession),
        col("c"))
      .write.mode("overwrite").partitionBy("c").parquet(s"$dir/assigned/b=$b")
    committedBatches = b + 1
    appliedBatch = newApplied
    IvfIndex.writeMeta(spark, dir, dim, centroids, committedBatches, liveBase,
      store, appliedBatch, pqModel, pqResidual, pqRot.isDefined)
  }

  /** Fold every live generation into ONE — the file-count lever of a
    * frequently-appended index. Each [[add]] lays its batch out as its own
    * `b=K` generation (≈ one file per touched centroid dir per batch), so
    * a corpus grown by thousands of appends fragments each probed list
    * into thousands of small files; compacting rewrites the live postings
    * as a single generation (one corpus-sized pass — schedule off-peak)
    * and flips `base`/`batches` in one atomic meta commit.
    *
    * Readers get the [[graft.sources.SyncManifest]] grace contract: the
    * superseded generation dirs are NOT deleted by the compact that
    * retires them — a probe planned against the previous meta keeps
    * reading them — and are vacuumed by the NEXT compact, by which point
    * they have been invisible for a full cycle. Single writer per index
    * dir, as everywhere in the family.
    */
  def compact(): Unit = synchronized {
    val b = committedBatches
    if (b - liveBase <= 1) return // already a single (or no) live generation
    // vacuum generations the PREVIOUS compact retired (grace expired)
    IvfIndex.vacuumBelow(spark, s"$dir/assigned", liveBase)
    reads.parquet("assigned", s"$dir/assigned")
      .where(col("b") >= lit(liveBase) && col("b") < lit(b))
      .drop("b")
      // same explicit task count as addWithMark (AQE-coalescing exemption)
      .repartition(graft.GraftSession.parallelismFloor(spark), col("c"))
      .write.mode("overwrite").partitionBy("c").parquet(s"$dir/assigned/b=$b")
    liveBase = b
    committedBatches = b + 1
    IvfIndex.writeMeta(spark, dir, dim, centroids, committedBatches, liveBase,
      store, appliedBatch, pqModel, pqResidual, pqRot.isDefined)
  }

  /** Per-centroid live posting counts — the index-health row of the
    * monitor story: recall-per-nProbe and probe cost both track list
    * balance (what k-means refinement buys down and codebook drift erodes),
    * so this is the signal for "rebuild the codebook". One aggregation
    * whose scan reads ONLY the partition columns — column pruning keeps
    * vector data out of it entirely.
    */
  def listStats(): DataFrame =
    reads.parquet("assigned", s"$dir/assigned")
      .where(col("b") >= lit(liveBase) && col("b") < lit(committedBatches))
      .groupBy(col("c")).agg(count(lit(1)).as("postings"))

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
    // list selection always runs in the ORIGINAL space (the codebook is
    // unrotated); PQ scoring consumes the pre-rotated `qvr` — computed
    // once per probe row here, the small side, never per candidate
    val probes0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(nearest(col(vecCol), nProbe)).as("c"))
    val probes =
      if (store == IvfIndex.StorePq)
        probes0.withColumn("qvr", rotated(col("qv")))
      else probes0
    val live = reads.parquet("assigned", s"$dir/assigned")
      .where(col("b") >= lit(liveBase) && col("b") < lit(committedBatches))
    val assigned = IvfIndex.pruneKeys(live, probes, "c", maxPrunedKeys)
    val score = store match {
      case IvfIndex.StoreInt8 =>
        graft.expressions.NativeFunctions.int8CosineSim(col("codes"), col("qv"))
      case IvfIndex.StorePq if pqResidual =>
        val mdl = pqModel.get
        org.apache.spark.sql.graft.bridge.column(
          graft.expressions.PqResidualCosineSim(
            org.apache.spark.sql.graft.bridge.expression(col("codes")),
            org.apache.spark.sql.graft.bridge.expression(
              col("qvr").cast("array<double>")),
            org.apache.spark.sql.graft.bridge.expression(col("cvec")),
            mdl.codebooks, mdl.m, mdl.ksub, mdl.dsub))
      case IvfIndex.StorePq =>
        val mdl = pqModel.get
        org.apache.spark.sql.graft.bridge.column(graft.expressions.PqCosineSim(
          org.apache.spark.sql.graft.bridge.expression(col("codes")),
          org.apache.spark.sql.graft.bridge.expression(
            col("qvr").cast("array<double>")),
          mdl.codebooks, mdl.m, mdl.ksub, mdl.dsub))
      case _ => graft.functions.VectorFunctions.cosine(col("qv"), col("cv"))
    }
    // residual scoring reconstructs x̂ = centroid + coded residual, so the
    // probed rows pick their list's centroid vector up broadcast
    val candidates0 = assigned.join(broadcast(probes), "c")
    val candidates =
      if (store == IvfIndex.StorePq && pqResidual)
        // rotated centroids when the index carries a rotation: the kernel
        // then reconstructs R·x̂ against R·q — cosines identical
        candidates0.join(broadcast(centroidFrameScore), "c")
      else candidates0
    Similarity.rankTopK(
      candidates
        .where(col("query_id") =!= col("corpus_id"))
        .select(col("query_id"), col("corpus_id"), score.as("cos_sim")),
      k)
  }
}

object IvfIndex {
  private val MetaFile = "_graft_ivf_index.json"
  private val FormatVersion = 6
  private[operators] val StoreFloat = 0
  private[operators] val StoreInt8 = 1
  private[operators] val StorePq = 2

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
             quantizedStore: Boolean = true, pqM: Int = 0,
             pqKsub: Int = 16, pqResidual: Boolean = true,
             pqRotate: Boolean = true): IvfIndex = {
    require(kmeansIters >= 0, s"bad kmeansIters=$kmeansIters")
    require(pqM >= 0 && pqKsub > 1 && pqKsub <= 256,
      s"bad pqM=$pqM pqKsub=$pqKsub (codes are one byte)")
    val spark = corpus.sparkSession
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    // ONE evaluation of the deterministic hash-ordered sample, collected:
    // the sort+limit plans as TakeOrderedAndProject (each partition ships
    // at most sampleCap rows, never the corpus), and the driver already
    // holds the codebook by design (it rides inside the probe expression)
    // — the refinement sample is a bounded 32× of that. Lloyd then runs
    // driver-side through the SAME NearestCentroids kernel probes use
    // (cosine, smaller-id ties): sequential and deterministic, with no
    // per-iteration job or codegen cost.
    val sampleCap =
      if (kmeansIters > 0 || pqM > 0) numCentroids * 32 else numCentroids
    val sampleRows: Array[(Long, Array[Double])] = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<double>").as("v"))
      .orderBy(xxhash64(col("id")), col("id")) // ivfTopK's deterministic pick
      .limit(sampleCap)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(sampleRows.nonEmpty, "cannot build an IVF index over an empty corpus")
    var centRows = sampleRows.take(numCentroids)
    val dim = centRows.head._2.length
    for (_ <- 1 to kmeansIters) {
      val k = centRows.length
      val ids = centRows.map(_._1)
      val flat = new Array[Double](k * dim)
      val norms = new Array[Double](k)
      var c = 0
      while (c < k) {
        val v = centRows(c)._2
        var s = 0.0
        var i = 0
        while (i < dim) { flat(c * dim + i) = v(i); s += v(i) * v(i); i += 1 }
        norms(c) = math.sqrt(s)
        c += 1
      }
      val idxOf = ids.zipWithIndex.toMap
      // one Lloyd step: assign every sample vector to its nearest current
      // centroid, recompute each centroid as the per-dimension mean of its
      // members; an empty cluster keeps its position
      val sums = Array.ofDim[Double](k, dim)
      val counts = new Array[Long](k)
      sampleRows.foreach { case (_, v) =>
        val nearest = graft.expressions.NearestCentroids.compute(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(v),
          ids, flat, norms, dim, 1, isFloat = false)
        val ci = idxOf(nearest(0))
        val s = sums(ci)
        var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        counts(ci) += 1
      }
      centRows = centRows.zipWithIndex.map { case ((cid, old), i) =>
        if (counts(i) == 0) (cid, old)
        else (cid, sums(i).map(_ / counts(i)))
      }
    }
    // freeze the (possibly refined) codebook; centroid ids stay the sample
    // ids, so load()'s hash-order re-sort reproduces this array order
    {
      import spark.implicits._
      centRows.toSeq.toDF("id", "v").coalesce(1).write.parquet(s"$dir/centroids")
    }
    // PQ store: train the sub-codebooks on the SAME bounded hash-ordered
    // sample the centroid refinement uses (Similarity.pqFit — the one
    // kernel pqTrain wraps), freeze them beside the centroids. In
    // residual mode (classic IVFADC, Jégou §IV-A — the default) the
    // training vectors are the sample's residuals against the FROZEN
    // refined codebook, the same quantity the codes later carry: residual
    // magnitudes are far smaller than raw coordinates, so the same m
    // bytes buy materially finer quantization (recall-at-equal-m spec).
    val pqModel =
      if (pqM > 0) {
        require(dim % pqM == 0, s"dim=$dim not divisible by pqM=$pqM")
        val trainVecs =
          if (!pqResidual) sampleRows.map(_._2)
          else {
            val k = centRows.length
            val ids = centRows.map(_._1)
            val flat = new Array[Double](k * dim)
            val norms = new Array[Double](k)
            var c = 0
            while (c < k) {
              val v = centRows(c)._2
              var s = 0.0; var i = 0
              while (i < dim) { flat(c * dim + i) = v(i); s += v(i) * v(i); i += 1 }
              norms(c) = math.sqrt(s)
              c += 1
            }
            val idxOf = ids.zipWithIndex.toMap
            sampleRows.map { case (_, v) =>
              val nearest = graft.expressions.NearestCentroids.compute(
                new org.apache.spark.sql.catalyst.util.GenericArrayData(v),
                ids, flat, norms, dim, 1, isFloat = false)
              val ci = idxOf(nearest(0))
              Array.tabulate(dim)(d => v(d) - flat(ci * dim + d))
            }
          }
        // OPQ-lite (fmt 6): PCA rotation of the TRAINING quantity (the
        // residuals in residual mode — their correlation structure is
        // what the sub-codebooks must fit), interleaved across subspaces;
        // codes then quantize rotated vectors, probes rotate their side
        // once — see Similarity.opqRotation for the allocation argument
        val rot: Option[Array[Double]] =
          if (pqRotate) Some(Similarity.opqRotation(trainVecs, pqM)) else None
        val fitVecs = rot match {
          case None => trainVecs
          case Some(r) => trainVecs.map { v =>
            Array.tabulate(dim) { ri =>
              var s = 0.0; var ci = 0
              while (ci < dim) { s += r(ri * dim + ci) * v(ci); ci += 1 }
              s
            }
          }
        }
        val mdl = Similarity.pqFit(fitVecs, pqM, pqKsub, dim / pqM, iters = 5)
        import spark.implicits._
        Seq((mdl.m, mdl.ksub, mdl.dsub, mdl.codebooks.toSeq,
            rot.map(_.toSeq).getOrElse(Seq.empty[Double])))
          .toDF("m", "ksub", "dsub", "cb", "rot")
          .coalesce(1).write.parquet(s"$dir/pq")
        Some((mdl, rot))
      } else None
    val store =
      if (pqM > 0) StorePq else if (quantizedStore) StoreInt8 else StoreFloat
    val idx = new IvfIndex(spark, dir, dim, centRows.length, 0, 0, store,
      centRows.map(_._1), centRows.flatMap(_._2), pqModel.map(_._1),
      pqResidual = pqM > 0 && pqResidual,
      pqRot = pqModel.flatMap(_._2))
    idx.add(corpus, idCol, vecCol)
    idx
  }

  /** Open the committed index at `dir`; meta protocol (fmt skew vs
    * corruption, torn-commit tmp fallback) shared via [[IndexMeta]].
    * Fmt-2 layouts (pre-streaming-adds) open in place: data dirs are
    * identical, only the `applied` batch mark is new — default −1 ("no
    * external batch applied"), exactly a fresh create()'s state.
    */
  def load(spark: SparkSession, dir: String): IvfIndex = {
    val Seq(dim, cents, batches, base, q, applied, pqRes, pqRotF) =
      IndexMeta.load(
        spark, dir, MetaFile, FormatVersion, "IVF",
        Seq("dim", "centroids", "batches", "base", "q", "applied", "pq_res",
          "pq_rot"),
        // fmt 2 predates the streaming-batch mark; fmt 3 predates the PQ
        // store (q was 0/1 only); fmt 4 predates residual PQ (codes always
        // quantized raw vectors); fmt 5 predates the OPQ rotation (codes
        // quantized unrotated vectors) — all four layouts open in place
        compat = Map(2 -> Map("applied" -> -1, "pq_res" -> 0, "pq_rot" -> 0),
          3 -> Map("pq_res" -> 0, "pq_rot" -> 0),
          4 -> Map("pq_res" -> 0, "pq_rot" -> 0),
          5 -> Map("pq_rot" -> 0)))
    val centRows = spark.read.parquet(s"$dir/centroids")
      .orderBy(xxhash64(col("id")), col("id")).collect()
    val (pqModel, pqRot) =
      if (q == StorePq) {
        val pq = spark.read.parquet(s"$dir/pq")
        val r = pq.head()
        val mdl = Some(Similarity.PqModel(r.getInt(0), r.getInt(1), r.getInt(2),
          r.getSeq[Double](3).toArray))
        // the meta flag is authoritative; a fmt-6 store with the flag off
        // has an empty rot column (and pre-fmt-6 stores have none at all)
        val rot =
          if (pqRotF == 1 && pq.columns.contains("rot")) {
            val arr = r.getSeq[Double](pq.columns.indexOf("rot")).toArray
            require(arr.length == dim * dim,
              s"corrupt PQ rotation at $dir: ${arr.length} values, dim $dim")
            Some(arr)
          } else None
        (mdl, rot)
      } else (None, None)
    new IvfIndex(spark, dir, dim, cents, batches, base, q,
      centRows.map(_.getLong(0)), centRows.flatMap(_.getSeq[Double](1)),
      pqModel, applied, pqResidual = pqRes == 1, pqRot = pqRot)
  }

  /** Delete `b=K` generation dirs below `base` under `parent` — retired by
    * a compact one full cycle ago, so no reader grace can still cover
    * them. Shared with [[LshIndex]] and [[JaccardIndex]].
    */
  private[operators] def vacuumBelow(spark: SparkSession, parent: String,
                                     base: Int): Unit = {
    val p = new Path(parent)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      fs.listStatus(p).foreach { st =>
        val name = st.getPath.getName // b=K
        if (name.startsWith("b=") &&
          scala.util.Try(name.drop(2).toInt).toOption.exists(_ < base))
          fs.delete(st.getPath, true)
      }
  }

  private def writeMeta(spark: SparkSession, dir: String, dim: Int,
                        centroids: Int, batches: Int, base: Int,
                        store: Int, applied: Int,
                        pq: Option[Similarity.PqModel],
                        pqResidual: Boolean, pqRotated: Boolean): Unit =
    IndexMeta.commit(spark, dir, MetaFile,
      s"""{"fmt":$FormatVersion,"dim":$dim,"centroids":$centroids,""" +
        s""""batches":$batches,"base":$base,"q":$store,""" +
        s""""applied":$applied,"pq_res":${if (pqResidual) 1 else 0},""" +
        s""""pq_rot":${if (pqRotated) 1 else 0}""" +
        pq.map(m => s""","pq_m":${m.m},"pq_ksub":${m.ksub}""").getOrElse("") +
        "}")
}
