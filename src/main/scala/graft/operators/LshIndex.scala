package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted random-hyperplane LSH ANN index — the index-lifecycle
  * companion of [[Similarity.lshTopK]], completing the persisted-ANN story
  * next to [[IvfIndex]]. The one-shot form re-signs the whole corpus on
  * every call; this class persists each document's (table, bucket)
  * postings once and serves probes from PARTITION-PRUNED scans of exactly
  * the buckets the queries hash to.
  *
  * == On-disk layout ==
  * {{{
  *   dir/_graft_lsh_index.json  {"fmt":1,"bits":B,"tables":T,"batches":K}
  *   dir/assigned/b=K/th=J/     (corpus_id, cv)   J = table·2^bits + bucket
  * }}}
  * Batches append under fresh `b=K` dirs, meta commits last via tmp +
  * rename — the [[JaccardIndex]] protocol (readers filter `b < batches`;
  * crash debris is invisible; a torn meta commit falls back to the
  * complete tmp). Single writer per index dir; probes only read. Each doc
  * stores `tables` postings rows (the standard multi-table LSH storage
  * trade for its OR-amplified recall).
  *
  * == Equivalence ==
  * The hyperplanes are derived from a FIXED murmur seed chain
  * ([[graft.expressions.HyperplaneBands]]) — independent of the corpus —
  * so unlike IVF there is no frozen-codebook drift at all:
  * `create(A); add(B); probe(q)` EQUALS the one-shot
  * `lshTopK(A ∪ B, q)` exactly, batch split irrelevant. Pinned by
  * SimilaritySpec.
  *
  * == Scale (100 TB) ==
  * Create/add pay one pass over the batch (the signature kernel is a
  * native codegen'd expression; the only shuffle is the `th` repartition
  * that lays postings out for pruning). A probe costs: one signature
  * projection per query, a bounded collect of the probed (table, bucket)
  * keys (≤ queries × tables), and a columnar scan of ONLY those `th=J`
  * directories — per-probe IO tracks the probed buckets, never the corpus.
  */
final class LshIndex private (spark: SparkSession, val dir: String,
                              val bits: Int, val tables: Int,
                              @volatile private var committedBatches: Int) {

  /** Number of batches committed so far (including the creating corpus). */
  def batches: Int = committedBatches

  /** (table, bucket) composed into the single partition key th. */
  private def postings(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
        posexplode(graft.expressions.NativeFunctions
          .hyperplaneBands(col(vecCol), bits, tables)).as(Seq("table", "bucket")))
      .select(col("corpus_id"), col("cv"),
        (col("table").cast("long") * (1L << bits) + col("bucket")).as("th"))

  /** Sign `batch` and append its bucket postings under the next `b=K`;
    * O(batch) compute, no corpus-side read.
    */
  def add(batch: DataFrame, idCol: String, vecCol: String): Unit = synchronized {
    val b = committedBatches
    postings(batch, idCol, vecCol)
      .repartition(col("th")) // ≈ one file per bucket dir, not one per task
      .write.mode("overwrite").partitionBy("th").parquet(s"$dir/assigned/b=$b")
    committedBatches = b + 1
    LshIndex.writeMeta(spark, dir, bits, tables, committedBatches)
  }

  /** Approximate top-k for each query against the committed index:
    * candidates come from the queries' own buckets across every table,
    * deduped across tables, scored exactly, ranked with the bounded top-k
    * aggregator — the same pipeline as [[Similarity.lshTopK]]. The queries
    * frame is evaluated twice (the bucket-pruning collect and the returned
    * plan) — hand in a deterministic frame, not a live tail.
    */
  def probe(queries: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        posexplode(graft.expressions.NativeFunctions
          .hyperplaneBands(col(vecCol), bits, tables)).as(Seq("table", "bucket")))
      .select(col("query_id"), col("qv"),
        (col("table").cast("long") * (1L << bits) + col("bucket")).as("th"))
    // an index built over an empty (or entirely filtered-out) corpus holds
    // no postings files at all — serve the empty result instead of failing
    // parquet schema inference
    if (!graft.streaming.CdcStream.hasVisibleParquet(spark, s"$dir/assigned"))
      // same schema as the non-empty path: rankTopK emits corpus_id/rk as
      // bigint regardless of the id column's own type
      return q.select(col("query_id"), col("query_id").cast("long").as("corpus_id"),
        lit(1L).as("rk")).limit(0)
    // bounded collect: ≤ queries × tables distinct bucket keys — these
    // prune the postings SCAN to matching th=J partition dirs
    val tvals = q.select(col("th")).distinct().collect().map(_.getLong(0)).toSeq
    val assigned = spark.read.parquet(s"$dir/assigned")
      .where(col("b") < lit(committedBatches) && col("th").isin(tvals: _*))
    val scored = assigned.join(broadcast(q), "th")
      .where(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        graft.functions.VectorFunctions.cosine(col("qv"), col("cv")).as("cos_sim"))
    // a pair colliding in several tables must occupy ONE top-k slot
    Similarity.rankTopK(
      if (tables == 1) scored else scored.dropDuplicates("query_id", "corpus_id"), k)
  }
}

object LshIndex {
  private val MetaFile = "_graft_lsh_index.json"
  private val FormatVersion = 1

  /** Build a fresh index over `corpus` at `dir` (replacing any previous
    * index there). `bits`/`tables` are frozen into the meta — every probe
    * and add signs with the same hyperplanes.
    */
  def create(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
             bits: Int = 6, tables: Int = 1): LshIndex = {
    require(bits > 0 && bits <= 24 && tables >= 1,
      s"bad bits=$bits tables=$tables")
    val spark = corpus.sparkSession
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val idx = new LshIndex(spark, dir, bits, tables, 0)
    idx.add(corpus, idCol, vecCol)
    idx
  }

  /** Open the committed index at `dir`; meta protocol (fmt skew vs
    * corruption, torn-commit tmp fallback) shared via [[IndexMeta]].
    */
  def load(spark: SparkSession, dir: String): LshIndex = {
    val Seq(bits, tables, batches) = IndexMeta.load(spark, dir, MetaFile,
      FormatVersion, "LSH", Seq("bits", "tables", "batches"))
    new LshIndex(spark, dir, bits, tables, batches)
  }

  private def writeMeta(spark: SparkSession, dir: String, bits: Int,
                        tables: Int, batches: Int): Unit =
    IndexMeta.commit(spark, dir, MetaFile,
      s"""{"fmt":$FormatVersion,"bits":$bits,"tables":$tables,"batches":$batches}""")
}
