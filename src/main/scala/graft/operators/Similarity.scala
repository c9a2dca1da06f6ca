package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths, as a production pipeline would ship them:
  *  - `bruteForceTopK`: exact cosine top-k — broadcast the (small) query set
  *    against the corpus, rank per query. The corpus side never shuffles its
  *    vectors; only (query_id, corpus_id, score) triples move, and the per-
  *    query top-k is a window over that narrow frame. The correctness oracle.
  *  - `lshTopK`: random-hyperplane LSH — corpus and queries are bucketed by
  *    a k-bit signature, candidates come from an equi-join on the bucket, and
  *    only candidates are scored. This is the 100 TB path: the bucket join is
  *    a hash shuffle with bounded fan-out instead of a cross product.
  */
object Similarity {

  /** Exact top-k by cosine for each query vector. `queries` must be small
    * enough to broadcast (it is the "probe" side by construction).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        VectorFunctions.cosine(col("qv"), col("cv")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("corpus_id"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("query_id"), col("corpus_id"), col("rk"))
  }

  /** LSH-bucketed approximate top-k: equi-join on the signature bucket, then
    * exact scoring + per-query ranking over the candidate set only.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, bits: Int = 6): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      VectorFunctions.lshBucket(col(vecCol), bits).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorFunctions.lshBucket(col(vecCol), bits).as("bucket"))
    val cand = c.join(broadcast(q), "bucket")
      .where(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        VectorFunctions.cosine(col("qv"), col("cv")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("corpus_id"))
    cand.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("query_id"), col("corpus_id"), col("rk"))
  }
}
