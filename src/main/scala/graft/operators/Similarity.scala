package graft.operators

import graft.expressions.{ScoredId, TopKAggregator}
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three paths, as a production pipeline would ship them:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the corpus, score every pair. The correctness oracle.
  *  - [[lshTopK]]: random-hyperplane LSH — corpus and queries bucketed by a
  *    k-bit signature, candidates from an equi-join on the bucket.
  *  - [[ivfTopK]]: inverted-file (IVF) — corpus assigned to its nearest
  *    centroid, queries probe their `nProbe` closest centroid lists.
  *
  * All three rank with [[TopKAggregator]], not a `row_number` window: the
  * aggregator keeps a bounded k-buffer with map-side combine, so each
  * mapper ships at most k rows per query instead of shuffling and sorting
  * the full candidate set — the difference between shuffling the corpus
  * and shuffling the answer at 100 TB.
  */
object Similarity {

  /** Per-query top-k over a (query_id, corpus_id, cos_sim) candidate frame.
    * Shared with [[IvfIndex]] — the persisted-index probe ranks identically.
    */
  private[operators] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAggregator(k), Encoders.product[ScoredId])
    scored.groupBy(col("query_id"))
      .agg(topk(col("corpus_id"), col("cos_sim")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("corpus_id"),
        (col("pos") + 1).cast("bigint").as("rk")) // bigint: row_number() is int64 in DuckDB
  }

  /** Exact nearest-centroid assignment — one Lloyd step surfaced as a
    * first-class query (the building block [[IvfIndex]]'s k-means
    * refinement iterates, and the hard clustering step of any corpus
    * partitioning job). Every corpus vector is scored against every
    * centroid by squared euclidean distance; ties break toward the lower
    * centroid id. Emits (vec_id, centroid_id, d2) with `d2` rounded to 4dp.
    *
    * Scale shape: `centroids` is k-bounded and broadcast; the n×k scoring
    * runs inside codegen over the corpus scan, and the arg-min is a
    * `min(struct(d2, id))` aggregate — map-side combinable, so the shuffle
    * carries one row per corpus vector, never the n×k cross product.
    */
  def centroidAssign(corpus: DataFrame, centroids: DataFrame,
                     idCol: String, vecCol: String): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
    val k = centroids.select(col(idCol).as("centroid_id"), col(vecCol).as("kv"))
    c.crossJoin(broadcast(k))
      .select(col("vec_id"), col("centroid_id"),
        VectorFunctions.sqDist(col("v"), col("kv")).as("d2"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("centroid_id"))).as("best"))
      .select(col("vec_id"), col("best.centroid_id").as("centroid_id"),
        round(col("best.d2"), 4).as("d2"))
  }

  /** Per-cluster distance outliers — the embedding-space quality screen of
    * a curation pipeline (vectors far from every mode are mislabeled,
    * corrupt, or off-distribution; SemDeDup-adjacent housekeeping): assign
    * each vector to its nearest centroid ([[centroidAssign]]), then score
    * each vector's distance against its OWN cluster's distribution —
    * `z = (d − mean_c) / std_c` — and flag `z ≥ zCut`.
    *
    * Engine-exactness (the stat-moment convention): the distance
    * `d = √d2` rounds to DECIMAL(18,6) BEFORE aggregation, so the
    * per-cluster moment sums are exact integers-in-decimal and the
    * mean/std/z doubles derive from exact sums identically on any
    * partitioning and any engine; z rounds to 4dp and the flag compares
    * the ROUNDED z. A singleton cluster (std 0) reports z null and never
    * flags. One broadcast-codebook projection + ONE shuffle keyed by
    * centroid (the moments aggregate + the window share it).
    */
  def clusterOutliers(corpus: DataFrame, centroids: DataFrame, idCol: String,
                      vecCol: String, zCut: Double = 2.0): DataFrame = {
    val assigned = centroidAssign(corpus, centroids, idCol, vecCol)
      .withColumn("dist", round(sqrt(col("d2")), 6).cast("decimal(18,6)"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("centroid_id"))
    val n = count(lit(1)).over(w).cast("double")
    val sx = sum(col("dist")).over(w).cast("double")
    val sxx = sum(col("dist") * col("dist")).over(w).cast("double")
    val mean = sx / n
    val variance = (n * sxx - sx * sx) / (n * n)
    val std = sqrt(variance)
    // n > 1 gates out singletons robustly: their variance is an exact 0 in
    // theory but ulp noise in double space (sum-of-squares vs squared-sum
    // cast orders differ), so the count — exact — is the reliable gate
    val z = when(n > 1 && std > 0,
      round((col("dist").cast("double") - mean) / std, 4))
    assigned.select(col("vec_id"), col("centroid_id"),
      col("dist").cast("double").as("dist"), z.as("z"),
      coalesce(z >= zCut, lit(false)).as("is_outlier"))
  }

  /** Cluster-balanced corpus sample: assign each vector to its nearest
    * centroid ([[centroidAssign]] — broadcast-codebook projection, the
    * corpus is never shuffled to assign), then keep exactly
    * min(`perCluster`, cluster size) vectors per cluster in deterministic
    * hash order (`Sampling.keyBucket`, ties by id — reproducible on any
    * layout and in any engine). This is the embedding-space stratified
    * sample a curation pipeline uses to cap dominant modes: a web corpus
    * where one template cluster is 100× the median would otherwise drown
    * the mixture.
    *
    * One shuffle keyed by centroid; per-group work is bounded by cluster
    * size — for giant clusters pre-thin with [[Sampling.stableSample]]
    * before balancing, the same guidance as `stratifiedSample`.
    */
  def balancedSample(corpus: DataFrame, centroids: DataFrame, idCol: String,
                     vecCol: String, perCluster: Int): DataFrame = {
    require(perCluster > 0, s"bad perCluster=$perCluster")
    val assigned = centroidAssign(corpus, centroids, idCol, vecCol)
    val picked = Window.partitionBy(col("centroid_id"))
      .orderBy(Sampling.keyBucket(col("vec_id")), col("vec_id"))
    assigned.withColumn("__rn", row_number().over(picked))
      .where(col("__rn") <= perCluster)
      .drop("__rn")
  }

  /** Exact top-k by cosine for each query vector. `queries` must be small
    * enough to broadcast (it is the "probe" side by construction).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    rankTopK(
      c.crossJoin(broadcast(q))
        .where(col("query_id") =!= col("corpus_id"))
        .select(col("query_id"), col("corpus_id"),
          VectorFunctions.cosine(col("qv"), col("cv")).as("cos_sim")),
      k)
  }

  /** Maximal-Marginal-Relevance diversified retrieval (Carbonell &
    * Goldstein 1998): from each query's `poolK` cosine-nearest
    * candidates, greedily select `select` results maximizing
    * `λ·sim(q,c) − (1−λ)·max_{s∈selected} sim(c,s)` — the standard
    * redundancy-penalized re-rank of a RAG/retrieval stage. Output
    * (query_id, step, selected_id): integer-only, so it hash-matches an
    * independent engine wherever the cosine ORDERING agrees (the
    * `knn_brute_force` precedent); ties break to the smaller id.
    *
    * Fully relational — the greedy loop unrolls into `select−1` rounds of
    * [pool anti-join selected] ⋈ [candidate-pair sims where the partner
    * is selected] → per-query max-score window. The pair-sim frame is
    * poolK²-per-query (bounded, built once); no driver loop state, no
    * UDAF — every round is ordinary joins over query-keyed frames. The
    * scale path swaps [[lshTopK]]/[[IvfIndex]] probes in for the pool
    * step unchanged.
    */
  def mmrDiversify(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, poolK: Int, select: Int,
                   lambda: Double = 0.7): DataFrame = {
    require(select >= 1 && poolK >= select, s"bad poolK=$poolK select=$select")
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val top = bruteForceTopK(corpus, queries, idCol, vecCol, poolK)
    // pool with its query similarity re-attached (rank order came from
    // the same expression, so rk==1 IS the max-qsim candidate).
    // Checkpointed eagerly: the pool (queries·poolK rows) and its pair
    // sims (·poolK² rows) feed EVERY unrolled round — without the cut,
    // each round would re-run the corpus-wide top-k underneath.
    val pool = top.join(c, Seq("corpus_id")).join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("corpus_id"), col("rk"),
        VectorFunctions.cosine(col("qv"), col("cv")).as("qsim"), col("cv"))
      .localCheckpoint(true)
    val psim = pool.select(col("query_id"), col("corpus_id").as("a"), col("cv"))
      .join(pool.select(col("query_id"), col("corpus_id").as("b"),
        col("cv").as("bv")), Seq("query_id"))
      .where(col("a") =!= col("b"))
      .select(col("query_id"), col("a"), col("b"),
        VectorFunctions.cosine(col("cv"), col("bv")).as("sim"))
      .localCheckpoint(true)
    val slim = pool.select(col("query_id"), col("corpus_id"), col("qsim"))
    var selected = pool.where(col("rk") === 1)
      .select(col("query_id"), lit(1L).as("step"),
        col("corpus_id").as("selected_id"))
    for (i <- 2 to select) {
      val pen = psim
        .join(selected.select(col("query_id"), col("selected_id").as("b")),
          Seq("query_id", "b"))
        .groupBy(col("query_id"), col("a")).agg(max(col("sim")).as("pen"))
      val remaining = slim
        .join(selected.select(col("query_id"),
          col("selected_id").as("corpus_id")), Seq("query_id", "corpus_id"),
          "left_anti")
      val byScore = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy((lit(lambda) * col("qsim")
          - lit(1.0 - lambda) * col("pen")).desc, col("corpus_id"))
      val pick = remaining
        .join(pen.withColumnRenamed("a", "corpus_id"),
          Seq("query_id", "corpus_id"))
        .withColumn("_rn", row_number().over(byScore))
        .where(col("_rn") === 1)
        .select(col("query_id"), lit(i.toLong).as("step"),
          col("corpus_id").as("selected_id"))
      // each round's result is consumed by every LATER round (penalty ∪
      // anti-join ∪ output) — materialize the queries-sized pick so the
      // lineage doesn't branch exponentially across rounds
      selected = selected.unionByName(pick).localCheckpoint(true)
    }
    selected
  }

  /** k-NN majority-vote classification: each query takes the most common
    * `labelCol` among its k cosine-nearest corpus vectors (ties break to
    * the smallest label — deterministic). Output (query_id, pred_label,
    * votes). Built on [[bruteForceTopK]] — the exact-oracle anchor of the
    * classification family; the scale path swaps in [[lshTopK]] /
    * [[IvfIndex]] probes for the neighbor step unchanged, since the vote
    * only consumes (query_id, corpus_id) pairs. The corpus streams
    * against the BROADCAST neighbor list (queries·k rows) for the label
    * attach — no corpus shuffle; the vote window partitions by query.
    */
  def knnClassify(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, labelCol: String, k: Int): DataFrame = {
    val knn = bruteForceTopK(corpus, queries, idCol, vecCol, k)
    val labels = corpus.select(col(idCol).as("corpus_id"),
      col(labelCol).as("_lbl"))
    val votes = labels.join(broadcast(knn), Seq("corpus_id"))
      .groupBy(col("query_id"), col("_lbl")).agg(count(lit(1)).as("votes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("votes").desc, col("_lbl"))
    votes.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select(col("query_id"), col("_lbl").as("pred_label"), col("votes"))
  }

  /** LSH-bucketed approximate top-k: equi-join on the signature bucket, then
    * exact scoring + ranking over the candidate set only.
    *
    * @param tables number of independent hash tables (OR-amplification,
    *               the standard recall lever of hyperplane LSH): a
    *               candidate qualifies by colliding in ANY table, lifting
    *               recall from p^bits to 1−(1−p^bits)^tables per neighbor
    *               at `tables`× the bucketing cost — each table uses
    *               disjoint hyperplanes of one shared one-pass signature
    *               ([[graft.expressions.HyperplaneBands]], whose table 0 is
    *               bit-identical to the single-table bucket). The default 1
    *               keeps the old single-table semantics and skips the
    *               candidate dedup.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, bits: Int = 6,
              tables: Int = 1): DataFrame = {
    require(tables >= 1, s"bad tables=$tables")
    def sig(v: Column): Column =
      graft.expressions.NativeFunctions.hyperplaneBands(v, bits, tables)
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      posexplode(sig(col(vecCol))).as(Seq("table", "bucket")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      posexplode(sig(col(vecCol))).as(Seq("table", "bucket")))
    val scored = c.join(broadcast(q), Seq("table", "bucket"))
      .where(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        VectorFunctions.cosine(col("qv"), col("cv")).as("cos_sim"))
    // a pair colliding in several tables must occupy ONE top-k slot; the
    // dedup shuffles (query, corpus, score) triples only, never vectors
    rankTopK(if (tables == 1) scored else scored.dropDuplicates(
      "query_id", "corpus_id"), k)
  }

  /** IVF approximate top-k. Centroids are a deterministic hash-ordered
    * sample of the corpus itself, capped at `numCentroids` — at production
    * scale, k-means centroids from a sampled training pass slot in
    * unchanged. The cap keeps the codebook O(numCentroids) regardless of
    * corpus size (the sort+limit plans as TakeOrderedAndProject: each
    * partition ships at most `numCentroids` rows, never the corpus), so the
    * one driver-side collect is constant-sized at any scale factor.
    *
    * The bounded codebook is embedded in the native
    * [[graft.expressions.NearestCentroids]] expression: centroid assignment
    * and query probing are then pure projections — the corpus embeddings
    * are never shuffled or crossJoined, and the only shuffles are the
    * bounded cent_id equi-join and the final top-k aggregation.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              numCentroids: Int = 256, nProbe: Int = 4): DataFrame = {
    val centRows = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<double>").as("v"))
      .orderBy(xxhash64(col("id")), col("id")) // deterministic pseudo-random pick
      .limit(numCentroids)
      .collect()
    if (centRows.isEmpty) // empty/filtered-out corpus: nothing to probe
      return bruteForceTopK(corpus, queries, idCol, vecCol, k)
    val centIds = centRows.map(_.getLong(0))
    val dim = centRows.head.getSeq[Double](1).length
    val flat = centRows.flatMap(_.getSeq[Double](1))
    def nearest(v: org.apache.spark.sql.Column, n: Int) =
      org.apache.spark.sql.graft.bridge.column(graft.expressions.NearestCentroids(
        org.apache.spark.sql.graft.bridge.expression(v), centIds, flat, dim, n))

    val assigned = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      element_at(nearest(col(vecCol), 1), 1).as("cent_id"))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(nearest(col(vecCol), nProbe)).as("cent_id"))

    rankTopK(
      assigned.join(broadcast(probes), "cent_id")
        .where(col("query_id") =!= col("corpus_id"))
        .select(col("query_id"), col("corpus_id"),
          VectorFunctions.cosine(col("qv"), col("cv")).as("cos_sim")),
      k)
  }

  /** Distributed spherical k-means (cosine assignment — the metric every
    * other vector op here ranks by — with per-cluster coordinate means):
    * the clustering step of SemDeDup-style semantic dedup and of corpus
    * partitioning jobs. Deterministic init: the same hash-ordered k-sample
    * [[ivfTopK]] freezes. Returns (centroidIds 0..k-1, flat row-major
    * centroid matrix, dim).
    *
    * Scale shape per iteration: assignment is a PROJECTION — the k-bounded
    * codebook rides inside the native [[graft.expressions.NearestCentroids]]
    * expression, so corpus vectors are never shuffled or joined for it —
    * and the mean recomputation is one `posexplode` + (cid, pos) grouped
    * sum whose result is ≤ k·dim rows, collected driver-side (the bounded
    * collect every distributed k-means makes; MLlib's does the same).
    * Clusters that lose all members keep their previous centroid.
    * Round 18: the per-iteration coordinate sums run in FIXED-POINT
    * integer (2^-40 units, see the inline note), so the whole training
    * loop is an engine-reproducible pure function of (corpus, k, iters)
    * on any partitioning — the dedup_semantic DuckDB oracle replays it
    * bit-for-bit. Quality contracts (assignment agreement, inertia)
    * continue to hold trivially: the quantization error is 2^-40 per
    * coordinate.
    */
  private[operators] def kmeansCentroids(corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, iters: Int): (Array[Long], Array[Double], Int) = {
    require(k > 0 && iters >= 0, s"bad k=$k iters=$iters")
    val init = corpus
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .where(col("v").isNotNull)
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(k)
      .collect()
    require(init.nonEmpty, "kmeansCentroids: empty corpus")
    val dim = init.head.getSeq[Double](1).length
    val ids = Array.tabulate(init.length)(_.toLong)
    var flat = init.flatMap(_.getSeq[Double](1)).toArray
    for (_ <- 1 to iters) {
      // FIXED-POINT coordinate sums (r18, the pageRank/Adamic-Adar
      // determinism idiom): a float `sum(x)` across partitions is a
      // shuffle-order-dependent reduction, so centroid bits used to vary
      // between runs. Quantizing each coordinate to 2^-40 units
      // (x·2^40 is EXACT — power-of-two multiply — and floor(·+0.5) is
      // Java Math.round's definition) makes the per-cluster sum an exact
      // order-independent long; the mean is then a fixed two-division
      // double tree. Quantization error ≤ 2^-40 per coordinate — far
      // below any quality contract — and the whole training loop becomes
      // an engine-reproducible pure function (the dedup_semantic oracle
      // replays it).
      val q = 1L << 40
      val assigned = corpus
        .select(element_at(nearestOf(col(vecCol), ids, flat, dim, 1), 1).as("cid"),
          posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      val stats = assigned.groupBy(col("cid"), col("pos"))
        .agg(sum(floor(col("x") * lit(q.toDouble) + lit(0.5)).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect() // ≤ k·dim rows by construction
      val next = flat.clone() // empty clusters keep their centroid
      stats.foreach { r =>
        val (cid, pos) = (r.getLong(0).toInt, r.getInt(1))
        next(cid * dim + pos) = (r.getLong(2).toDouble / q) / r.getLong(3)
      }
      flat = next
    }
    (ids, flat, dim)
  }

  /** Nearest-centroid ids of `v` against a driver-side codebook. */
  private[operators] def nearestOf(v: Column, ids: Array[Long],
      flat: Array[Double], dim: Int, n: Int): Column =
    org.apache.spark.sql.graft.bridge.column(graft.expressions.NearestCentroids(
      org.apache.spark.sql.graft.bridge.expression(v), ids, flat, dim, n))

  /** Product-quantization model: `m` subspaces of `dsub` dims, `ksub`
    * centroids each, codebooks flat row-major `[j][c][d]`. Trained by
    * [[pqTrain]]; `dim = m * dsub`; a coded vector is `m` bytes.
    */
  final case class PqModel(m: Int, ksub: Int, dsub: Int,
                           codebooks: Array[Double]) extends Serializable {
    def dim: Int = m * dsub
    /** codebook entry (j, c) starts at this flat offset */
    @inline def off(j: Int, c: Int): Int = (j * ksub + c) * dsub
  }

  /** Train a product quantizer (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011 — public): split the dim into
    * `m` subspaces and k-means each independently, so a corpus vector
    * compresses to `m` BYTES (64 float dims at m=8 → 32× smaller than
    * float, 8× smaller than the int8 store) while ADC probing still scores
    * against real float sub-centroids.
    *
    * Deterministic, driver-side, bounded: the training set is the same
    * hash-ordered sample [[ivfTopK]] freezes its codebook from (one
    * TakeOrdered collect of ≤ `sampleN` rows — never a corpus shuffle),
    * sub-k-means inits from the sample's first `ksub` rows in hash order
    * and runs `iters` Lloyd steps sequentially per subspace (sampleN·ksub·
    * dsub flops — microseconds at any corpus scale, since sampleN is
    * capped). Empty clusters keep their centroid, ties break to the lower
    * code — the same conventions as [[kmeansCentroids]].
    */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
              m: Int, ksub: Int, sampleN: Int = 1024,
              iters: Int = 5): PqModel =
    pqTrainRotated(corpus, idCol, vecCol, m, ksub, sampleN, iters,
      rotate = false)._1

  /** [[pqTrain]] with the OPQ-lite option: when `rotate`, the returned
    * rotation was applied to the training vectors before the subspace
    * split and MUST be applied to everything later encoded or LUT'd
    * against the model (see [[opqRotation]]).
    */
  def pqTrainRotated(corpus: DataFrame, idCol: String, vecCol: String,
                     m: Int, ksub: Int, sampleN: Int = 1024,
                     iters: Int = 5,
                     rotate: Boolean = true): (PqModel, Option[Array[Double]]) = {
    require(m > 0 && ksub > 1 && ksub <= 256,
      s"bad m=$m ksub=$ksub (codes are one byte)")
    val sample = corpus
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .where(col("v").isNotNull)
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(sampleN)
      .collect()
    require(sample.nonEmpty, "pqTrain: empty corpus")
    val dim = sample.head.getSeq[Double](1).length
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val dsub = dim / m
    val vecs = sample.map(_.getSeq[Double](1).toArray)
    val rot = if (rotate) Some(opqRotation(vecs, m)) else None
    val fitVecs = rot match {
      case None => vecs
      case Some(r) => vecs.map(rotateVec(r, _))
    }
    (pqFit(fitVecs, m, ksub, dsub, iters), rot)
  }

  private[operators] def rotateVec(r: Array[Double],
                                   v: Array[Double]): Array[Double] = {
    val d = v.length
    Array.tabulate(d) { ri =>
      var s = 0.0; var ci = 0
      while (ci < d) { s += r(ri * d + ci) * v(ci); ci += 1 }
      s
    }
  }

  /** The driver-side sub-k-means fit behind [[pqTrain]], on an
    * already-collected sample — shared with [[IvfIndex]]'s PQ store, which
    * trains on the same bounded sample its codebook refinement uses.
    */
  private[operators] def pqFit(vecs: Array[Array[Double]], m: Int, ksub: Int,
                               dsub: Int, iters: Int): PqModel = {
    val cb = new Array[Double](m * ksub * dsub)
    val model = PqModel(m, ksub, dsub, cb)
    for (j <- 0 until m) {
      val base = j * dsub
      // init: first ksub sample subvectors in hash order (wrap if fewer)
      for (c <- 0 until ksub; d <- 0 until dsub)
        cb(model.off(j, c) + d) = vecs(c % vecs.length)(base + d)
      for (_ <- 1 to iters) {
        val sums = new Array[Double](ksub * dsub)
        val counts = new Array[Long](ksub)
        vecs.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < ksub) {
            var d2 = 0.0; var d = 0
            while (d < dsub) {
              val diff = v(base + d) - cb(model.off(j, c) + d)
              d2 += diff * diff; d += 1
            }
            if (d2 < bestD) { bestD = d2; best = c }
            c += 1
          }
          counts(best) += 1
          var d = 0
          while (d < dsub) { sums(best * dsub + d) += v(base + d); d += 1 }
        }
        for (c <- 0 until ksub if counts(c) > 0; d <- 0 until dsub)
          cb(model.off(j, c) + d) = sums(c * dsub + d) / counts(c)
      }
    }
    model
  }

  /** OPQ-lite rotation for the PQ subspace split (Ge et al., CVPR 2013's
    * observation, reduced to its PCA special case): the row-major dim×dim
    * orthogonal matrix whose rows are the training set's principal axes,
    * INTERLEAVED across the `m` subspaces (component ranked t lands in
    * subspace t mod m) — plain descending order would concentrate the
    * variance in subspace 0 and starve the rest, the imbalance Ge's
    * eigenvalue allocation corrects; round-robin is its cheap
    * deterministic approximation. Driver-side on the bounded training
    * sample (sampleN·dim² flops + one O(dim³) Jacobi solve — microseconds
    * at dim 64). Orthogonality means scoring kernels run unchanged on
    * rotated inputs (dots and norms invariant), so the rotation costs
    * only the encode/probe-side O(dim²) projections.
    */
  private[operators] def opqRotation(vecs: Array[Array[Double]],
                                     m: Int): Array[Double] = {
    val d = vecs.head.length
    val n = vecs.length
    // covariance about the sample mean
    val mean = new Array[Double](d)
    vecs.foreach { v => var i = 0; while (i < d) { mean(i) += v(i); i += 1 } }
    var i = 0
    while (i < d) { mean(i) /= n; i += 1 }
    val cov = new Array[Double](d * d)
    vecs.foreach { v =>
      var a = 0
      while (a < d) {
        val va = v(a) - mean(a)
        var b = 0
        while (b < d) { cov(a * d + b) += va * (v(b) - mean(b)); b += 1 }
        a += 1
      }
    }
    i = 0
    while (i < d * d) { cov(i) /= n; i += 1 }
    val (eig, evecs) = jacobiEigen(cov, d) // eigenvector j in COLUMN j
    val order = (0 until d).sortBy(j => -eig(j))
    // interleave: rank-t component → subspace t % m, slot t / m
    val dsub = d / m
    val rot = new Array[Double](d * d)
    var t = 0
    while (t < d) {
      val row = (t % m) * dsub + t / m
      val ej = order(t)
      var c = 0
      while (c < d) { rot(row * d + c) = evecs(c * d + ej); c += 1 }
      t += 1
    }
    rot
  }

  /** Encode the corpus to PQ codes: (corpus_id, codes BINARY(m)) — one
    * stateless pass against the broadcast codebooks, nothing shuffled.
    * This is the posting payload an IVF-PQ index would persist: probe IO
    * per candidate is `m` bytes instead of `4·dim` (float) or `dim`
    * (int8).
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               model: PqModel,
               rot: Option[Array[Double]] = None): DataFrame = {
    val vec = col(vecCol).cast("array<double>")
    val enc = rot match {
      case None => org.apache.spark.sql.graft.bridge.expression(vec)
      case Some(r) => graft.expressions.RotateVector(
        org.apache.spark.sql.graft.bridge.expression(vec), r, model.dim)
    }
    corpus.select(col(idCol).cast("long").as("corpus_id"),
      org.apache.spark.sql.graft.bridge.column(graft.expressions.PqEncode(
        enc, model.codebooks, model.m, model.ksub, model.dsub)).as("codes"))
  }

  /** PQ approximate top-k by cosine — asymmetric distance computation
    * (ADC): each query precomputes an m×ksub lookup table of sub-dots
    * against the codebooks (driver-side — queries are the small probe side
    * by construction, and the LUTs are nq·m·ksub doubles), then ONE
    * mapPartitions pass over the coded corpus scores every candidate with
    * m table lookups instead of dim multiplies, keeping a bounded
    * per-query k-heap per partition — the map-side combine that ships
    * ≤ nq·k rows per partition into the same [[rankTopK]] merge every
    * other ANN path uses. `cos ≈ Σⱼ lut[j][code] / (‖q‖·‖x̂‖)` with
    * `‖x̂‖² = Σⱼ ‖cb[j][code]‖²` (subspaces concatenate, so the
    * reconstruction norm is exact for the code).
    *
    * The heap's total order is [[TopKAggregator]]'s (score desc, id asc),
    * so per-partition pre-filtering never changes the global answer —
    * deterministic on any partitioning.
    *
    * Scale: corpus never shuffled (the only shuffle is the nq·k-row rank
    * merge); compose with IVF pruning (probe the coded postings of
    * `nProbe` lists) for the full IVFADC shape once lists outgrow a scan.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, m: Int = 8, ksub: Int = 16,
             sampleN: Int = 1024, iters: Int = 5,
             rotate: Boolean = true): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val nonEmpty = corpus.select(col(idCol)).limit(1).count() > 0
    if (!nonEmpty) return bruteForceTopK(corpus, queries, idCol, vecCol, k)
    // OPQ-lite rotation by default (see opqRotation): orthogonal, so the
    // ADC math below is IDENTICAL on rotated inputs — only the
    // quantization cells align better with the data's principal axes.
    // `rotate = false` is plain Jégou PQ — every float op then derives
    // from pure ordered folds (no Jacobi eigensolve), which is what lets
    // the ann_pq DuckDB oracle replay the whole pipeline bit-for-bit.
    val (mdl, rot) = pqTrainRotated(corpus, idCol, vecCol, m, ksub,
      sampleN, iters, rotate)
    val qRows = queries
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .where(col("v").isNotNull)
      .collect()
    val qIds = qRows.map(_.getLong(0))
    val nq = qIds.length
    // per-query sub-dot LUTs + shared reconstruction-norm LUT
    val dots = new Array[Double](nq * m * ksub)
    val qNorm = new Array[Double](nq)
    val cNorm2 = new Array[Double](m * ksub)
    for (j <- 0 until m; c <- 0 until ksub) {
      var n2 = 0.0
      var d = 0
      while (d < mdl.dsub) {
        val x = mdl.codebooks(mdl.off(j, c) + d); n2 += x * x; d += 1
      }
      cNorm2(j * ksub + c) = n2
    }
    for (qi <- 0 until nq) {
      val v0 = qRows(qi).getSeq[Double](1).toArray
      require(v0.length == mdl.dim, s"query dim ${v0.length} != ${mdl.dim}")
      val v = rot.map(rotateVec(_, v0)).getOrElse(v0)
      var n2 = 0.0
      var i = 0
      while (i < v.length) { n2 += v(i) * v(i); i += 1 }
      qNorm(qi) = math.sqrt(n2)
      for (j <- 0 until m; c <- 0 until ksub) {
        var s = 0.0; var d = 0
        while (d < mdl.dsub) {
          s += v(j * mdl.dsub + d) * mdl.codebooks(mdl.off(j, c) + d); d += 1
        }
        dots((qi * m + j) * ksub + c) = s
      }
    }
    val dotsB = spark.sparkContext.broadcast(dots)
    val qNormB = spark.sparkContext.broadcast(qNorm)
    val cNorm2B = spark.sparkContext.broadcast(cNorm2)
    val qIdsB = spark.sparkContext.broadcast(qIds)
    val ksubL = ksub; val mL = m; val kL = k
    val partials = pqEncode(corpus, idCol, vecCol, mdl, rot)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val luts = dotsB.value; val qn = qNormB.value
        val cn2 = cNorm2B.value; val ids = qIdsB.value
        // per-query bounded buffers in TopKAggregator's total order
        val heaps = Array.fill(ids.length)(
          scala.collection.mutable.ArrayBuffer.empty[(Long, Double)])
        def offer(qi: Int, id: Long, score: Double): Unit = {
          val h = heaps(qi)
          h += ((id, score))
          if (h.length >= 4 * kL) {
            val trimmed = h.sortBy(e => (-e._2, e._1)).take(kL)
            h.clear(); h ++= trimmed
          }
        }
        rows.foreach { case (cid, codes) =>
          var recon2 = 0.0
          var j = 0
          while (j < mL) {
            recon2 += cn2(j * ksubL + (codes(j) & 0xff)); j += 1
          }
          val rnorm = math.sqrt(recon2)
          var qi = 0
          while (qi < ids.length) {
            if (ids(qi) != cid) {
              var s = 0.0
              var jj = 0
              while (jj < mL) {
                s += luts((qi * mL + jj) * ksubL + (codes(jj) & 0xff)); jj += 1
              }
              val denom = qn(qi) * rnorm
              offer(qi, cid, if (denom > 0) s / denom else 0.0)
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.sortBy(e => (-e._2, e._1)).take(kL)
            .map { case (id, sc) => (qIdsB.value(qi), id, sc) }
        }
      }.toDF("query_id", "corpus_id", "cos_sim")
    rankTopK(partials, k)
  }

  /** [[kmeansCentroids]] as a query surface: (centroid_id, centroid,
    * n_members) — fit then one assignment pass for the member counts.
    */
  def kmeansFit(corpus: DataFrame, idCol: String, vecCol: String,
                k: Int, iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (ids, flat, dim) = kmeansCentroids(corpus, idCol, vecCol, k, iters)
    val cents = ids.map(i =>
      (i, flat.slice(i.toInt * dim, (i.toInt + 1) * dim).toSeq))
      .toSeq.toDF("centroid_id", "centroid")
    val sizes = corpus
      .select(element_at(nearestOf(col(vecCol), ids, flat, dim, 1), 1).as("centroid_id"))
      .groupBy(col("centroid_id")).agg(count(lit(1)).as("n_members"))
    cents.join(sizes, Seq("centroid_id"), "left_outer")
      .select(col("centroid_id"), col("centroid"),
        coalesce(col("n_members"), lit(0L)).as("n_members"))
  }

  /** Exact top-k PCA of the embedding corpus (covariance eigenpairs) — the
    * decorrelation/whitening stage in front of cosine dedup (SemDeDup-style
    * pipelines) and the rotation init of OPQ-style quantizers.
    *
    * Distribution shape — the classic "big n, small d" covariance: ONE
    * `treeAggregate` pass folds every vector into a per-partition
    * (n, Σx, Σxxᵀ) accumulator (d=64 → ~33 KB), partials merge by
    * addition, and the driver receives ONE d×d scatter regardless of
    * corpus size. The eigen-solve is driver-side cyclic Jacobi on the
    * symmetric d×d covariance — O(d³), microseconds at d=64. Float
    * accumulation is merge-order dependent, so callers pin QUALITY
    * (direction recovery, orthonormality, eigenvalue order — SimilaritySpec),
    * not bits: the [[kmeansCentroids]] convention.
    *
    * Sign convention: each component's largest-|loading| coordinate is made
    * positive (first such index on exact ties), so directions are stable up
    * to float noise. Returns one row per component:
    * (component 1..k, eigenvalue, explained_var, loadings array<double>).
    */
  def pcaTopK(corpus: DataFrame, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"bad k=$k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.select(col(vecCol).cast("array<double>").as("v"))
      .where(col("v").isNotNull)
      .as[Seq[Double]].rdd.map(_.toArray)
    // acc = (n, sum(d), scatter(d*d)); dim fixed by the first vector seen
    val zero = (0L, Array.emptyDoubleArray, Array.emptyDoubleArray)
    val (n, s, ss) = vecs.treeAggregate(zero)(
      seqOp = { case ((n0, s0, ss0), x) =>
        val d = x.length
        val s1 = if (s0.isEmpty) new Array[Double](d) else s0
        val ss1 = if (ss0.isEmpty) new Array[Double](d * d) else ss0
        require(s1.length == d, s"mixed embedding dims: ${s1.length} vs $d")
        var i = 0
        while (i < d) {
          s1(i) += x(i)
          var j = 0
          val row = i * d
          while (j < d) { ss1(row + j) += x(i) * x(j); j += 1 }
          i += 1
        }
        (n0 + 1, s1, ss1)
      },
      combOp = { case ((na, sa, ssa), (nb, sb, ssb)) =>
        if (sa.isEmpty) (nb, sb, ssb)
        else if (sb.isEmpty) (na, sa, ssa)
        else {
          require(sa.length == sb.length,
            s"mixed embedding dims: ${sa.length} vs ${sb.length}")
          var i = 0
          while (i < sa.length) { sa(i) += sb(i); i += 1 }
          i = 0
          while (i < ssa.length) { ssa(i) += ssb(i); i += 1 }
          (na + nb, sa, ssa)
        }
      })
    require(n >= 2, s"pcaTopK needs at least 2 vectors, got $n")
    val d = s.length
    require(k <= d, s"k=$k exceeds embedding dim $d")
    // covariance C = Σxxᵀ/n − μμᵀ
    val cov = new Array[Double](d * d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        cov(i * d + j) = ss(i * d + j) / n - (s(i) / n) * (s(j) / n)
        j += 1
      }
      i += 1
    }
    val trace = (0 until d).map(i => cov(i * d + i)).sum
    val (eig, vecsM) = Similarity.jacobiEigen(cov, d)
    val order = (0 until d).sortBy(i => -eig(i)).take(k)
    val rows = order.zipWithIndex.map { case (ei, rank) =>
      val loadings = Array.tabulate(d)(r => vecsM(r * d + ei))
      // sign: largest-|loading| coordinate positive
      var best = 0
      var bi = 0
      while (bi < d) {
        if (math.abs(loadings(bi)) > math.abs(loadings(best))) best = bi
        bi += 1
      }
      val signed = if (loadings(best) < 0) loadings.map(-_) else loadings
      (rank + 1, eig(ei), if (trace > 0) eig(ei) / trace else 0.0,
        signed.toSeq)
    }
    rows.toDF("component", "eigenvalue", "explained_var", "loadings")
  }

  /** Cyclic Jacobi eigen-decomposition of a symmetric d×d matrix
    * (row-major, DESTROYED). Returns (eigenvalues, eigenvector matrix
    * row-major with eigenvector j in COLUMN j). Textbook two-sided
    * rotations; converges quadratically, bounded at 100 sweeps.
    */
  private[graft] def jacobiEigen(a: Array[Double], d: Int): (Array[Double], Array[Double]) = {
    val v = Array.tabulate(d * d)(idx => if (idx / d == idx % d) 1.0 else 0.0)
    var sweep = 0
    var converged = false
    while (sweep < 100 && !converged) {
      var off = 0.0
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) { off += a(p * d + q) * a(p * d + q); q += 1 }
        p += 1
      }
      if (off < 1e-20) converged = true
      else {
        p = 0
        while (p < d) {
          var q = p + 1
          while (q < d) {
            val apq = a(p * d + q)
            if (math.abs(apq) > 1e-300) {
              val theta = (a(q * d + q) - a(p * d + p)) / (2.0 * apq)
              val t = (if (theta >= 0) 1.0 else -1.0) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
              val c = 1.0 / math.sqrt(t * t + 1.0)
              val sn = t * c
              var i = 0
              while (i < d) { // column rotation: A·J
                val aip = a(i * d + p); val aiq = a(i * d + q)
                a(i * d + p) = c * aip - sn * aiq
                a(i * d + q) = sn * aip + c * aiq
                i += 1
              }
              i = 0
              while (i < d) { // row rotation: Jᵀ·A
                val api = a(p * d + i); val aqi = a(q * d + i)
                a(p * d + i) = c * api - sn * aqi
                a(q * d + i) = sn * api + c * aqi
                i += 1
              }
              i = 0
              while (i < d) { // accumulate V·J
                val vip = v(i * d + p); val viq = v(i * d + q)
                v(i * d + p) = c * vip - sn * viq
                v(i * d + q) = sn * vip + c * viq
                i += 1
              }
            }
            q += 1
          }
          p += 1
        }
        sweep += 1
      }
    }
    (Array.tabulate(d)(i => a(i * d + i)), v)
  }
}
