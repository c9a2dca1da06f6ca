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
    * Corpus vectors join their single nearest centroid's inverted list;
    * each query probes its `nProbe` nearest lists. The only shuffles are
    * the bounded centroid-id equi-join and the final top-k aggregation.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              centroidStride: Int = 50, nProbe: Int = 4): DataFrame = {
    val cents = corpus
      .where(pmod(col(idCol), lit(centroidStride)) === 0)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"))

    // assign every corpus vector to its nearest centroid (centroids broadcast)
    val assigned = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
      .crossJoin(broadcast(cents))
      .select(col("corpus_id"), col("cv"), col("cent_id"),
        VectorFunctions.cosine(col("cv"), col("cent_vec")).as("sim"))
      .groupBy(col("corpus_id"))
      .agg(first(col("cv")).as("cv"), max_by(col("cent_id"), col("sim")).as("cent_id"))

    // each query probes its nProbe nearest centroids
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cents))
      .select(col("query_id"), col("qv"), col("cent_id"),
        VectorFunctions.cosine(col("qv"), col("cent_vec")).as("sim"))
      .groupBy(col("query_id"))
      .agg(first(col("qv")).as("qv"),
        udaf(new TopKAggregator(nProbe), Encoders.product[ScoredId])
          (col("cent_id"), col("sim")).as("cents"))
      .select(col("query_id"), col("qv"), explode(col("cents.id")).as("cent_id"))

    rankTopK(
      assigned.join(broadcast(probes), "cent_id")
        .where(col("query_id") =!= col("corpus_id"))
        .select(col("query_id"), col("corpus_id"),
          VectorFunctions.cosine(col("qv"), col("cv")).as("cos_sim")),
      k)
  }
}
