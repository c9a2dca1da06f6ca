package graft.operators

import graft.expressions.{ScoredId, TopKAggregator}
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, Encoders}
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

  /** Per-query top-k over a (query_id, corpus_id, cos_sim) candidate frame. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAggregator(k), Encoders.product[ScoredId])
    scored.groupBy(col("query_id"))
      .agg(topk(col("corpus_id"), col("cos_sim")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("corpus_id"),
        (col("pos") + 1).cast("bigint").as("rk")) // bigint: row_number() is int64 in DuckDB
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

  /** LSH-bucketed approximate top-k: equi-join on the signature bucket, then
    * exact scoring + ranking over the candidate set only.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, bits: Int = 6): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      VectorFunctions.lshBucket(col(vecCol), bits).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorFunctions.lshBucket(col(vecCol), bits).as("bucket"))
    rankTopK(
      c.join(broadcast(q), "bucket")
        .where(col("query_id") =!= col("corpus_id"))
        .select(col("query_id"), col("corpus_id"),
          VectorFunctions.cosine(col("qv"), col("cv")).as("cos_sim")),
      k)
  }

  /** IVF approximate top-k. Centroids are a deterministic hash-sample of the
    * corpus itself (every `centroidStride`-th id — at production scale,
    * k-means centroids from a sampled training pass slot in unchanged).
    *
    * The codebook is bounded by construction, so it is collected once and
    * embedded in the native [[graft.expressions.NearestCentroids]]
    * expression: centroid assignment and query probing are then pure
    * projections — the corpus embeddings are never shuffled or crossJoined,
    * and the only shuffles are the bounded cent_id equi-join and the final
    * top-k aggregation.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              centroidStride: Int = 50, nProbe: Int = 4): DataFrame = {
    val centRows = corpus
      .where(pmod(col(idCol), lit(centroidStride)) === 0)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
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
}
