package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *   dir/_graft_lsh_index.json  {"fmt":2,"bits":B,"tables":T,"batches":K,"base":G,"q":0|1}
  *   dir/assigned/b=K/th=J/     (corpus_id, scale, codes)  q=1 (default): int8
  *   dir/assigned/b=K/th=J/     (corpus_id, cv)            q=0: raw float copy
  *   (J = table·2^bits + bucket)
  * }}}
  * Batches append under fresh `b=K` dirs, meta commits last via tmp +
  * rename — the [[JaccardIndex]] protocol (readers filter
  * `base <= b < batches`; crash debris is invisible; a torn meta commit
  * falls back to the complete tmp). [[compact]] folds the live
  * generations into one when append-fragmentation builds up. Single
  * writer per index dir; probes only read. Each doc
  * stores `tables` postings rows (the standard multi-table LSH storage
  * trade for its OR-amplified recall) — which is exactly why the postings
  * are int8-packed by default ([[graft.expressions.PackInt8]]): the
  * `tables`-fold vector copies are the store's dominant cost, and the
  * packed form cuts them 4× while scoring stays native and one-pass
  * ([[graft.expressions.Int8CosineSim]]; cosine is scale-invariant, so
  * probes read only the `codes` binary). Top-k overlap vs float scoring
  * ≥ 0.95 is spec-pinned.
  *
  * == Equivalence ==
  * The hyperplanes are derived from a FIXED murmur seed chain
  * ([[graft.expressions.HyperplaneBands]]) — independent of the corpus —
  * so unlike IVF there is no frozen-codebook drift at all: with
  * `quantizedStore = false`, `create(A); add(B); probe(q)` EQUALS the
  * one-shot `lshTopK(A ∪ B, q)` exactly, batch split irrelevant (pinned by
  * SimilaritySpec). The default int8 store keeps the same candidate sets
  * (bucketing always signs the ORIGINAL vector) and differs only by
  * rounding in the final scores.
  *
  * == Scale (100 TB) ==
  * Create/add pay one pass over the batch (the signature kernel is a
  * native codegen'd expression; the only shuffle is the `th` repartition
  * that lays postings out for pruning). A probe costs: one signature
  * projection per query and a columnar scan of ONLY the probed `th=J`
  * directories — per-probe IO tracks the probed buckets, never the corpus.
  * Partition pruning adapts to the probe-batch size exactly as in
  * [[IvfIndex]]: ≤ `maxPrunedKeys` distinct probed (table, bucket) keys
  * become a literal partition filter; past the cap (detected with a
  * bounded `limit(cap+1)` collect) the same key set prunes via a broadcast
  * semi-join instead, so a million-query probe batch never builds a
  * driver-side predicate.
  */
final class LshIndex private (spark: SparkSession, val dir: String,
                              val bits: Int, val tables: Int,
                              @volatile private var committedBatches: Int,
                              @volatile private var liveBase: Int,
                              val quantized: Boolean,
                              @volatile private var appliedBatch: Int = -1)
  extends VectorIndexWriter {

  private val reads = new IndexMeta.CachedReads(spark)

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

  /** (table, bucket) composed into the single partition key th; the stored
    * vector is packed to int8 BEFORE the per-table explode, so the
    * quantization kernel runs once per doc, not once per posting.
    */
  private def postings(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val base = df.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
        posexplode(graft.expressions.NativeFunctions
          .hyperplaneBands(col(vecCol), bits, tables)).as(Seq("table", "bucket")))
      .select(col("corpus_id"), col("cv"),
        (col("table").cast("long") * (1L << bits) + col("bucket")).as("th"))
    if (quantized) base
      .withColumn("q8", graft.expressions.NativeFunctions.packInt8(col("cv")))
      .select(col("corpus_id"), col("q8.scale").as("scale"),
        col("q8.codes").as("codes"), col("th"))
    else base
  }

  /** Sign `batch` and append its bucket postings under the next `b=K`;
    * O(batch) compute, no corpus-side read.
    */
  def add(batch: DataFrame, idCol: String, vecCol: String): Unit =
    synchronized { addWithMark(batch, idCol, vecCol, appliedBatch) }

  /** Replay-safe [[add]] for at-least-once feeds (the streaming rider;
    * the [[IvfIndex.addBatch]] contract): a batch id at or below the
    * committed high-water mark is skipped. Returns whether applied.
    */
  def addBatch(batchId: Long, batch: DataFrame, idCol: String,
               vecCol: String): Boolean = synchronized {
    require(batchId >= 0 && batchId <= Int.MaxValue, s"bad batch id $batchId")
    if (batchId.toInt <= appliedBatch) return false
    addWithMark(batch, idCol, vecCol, batchId.toInt)
    true
  }

  private def addWithMark(batch: DataFrame, idCol: String, vecCol: String,
                          newApplied: Int): Unit = {
    val b = committedBatches
    postings(batch, idCol, vecCol)
      // r20: explicit count — coalescing-exempt (the IvfIndex.addWithMark
      // note: AQE folded the byte-wise-small write to 1-2 tasks that then
      // created every bucket dir serially); each th still hashes to one
      // task ⇒ one file per bucket dir per batch
      .repartition(graft.GraftSession.parallelismFloor(batch.sparkSession),
        col("th"))
      .write.mode("overwrite").partitionBy("th").parquet(s"$dir/assigned/b=$b")
    committedBatches = b + 1
    appliedBatch = newApplied
    LshIndex.writeMeta(spark, dir, bits, tables, committedBatches, liveBase,
      quantized, appliedBatch)
  }

  /** Fold every live generation into ONE — the file-count lever of a
    * frequently-appended index (each add leaves ≈ one file per touched
    * bucket dir, ×`tables` postings per doc). One live-postings pass,
    * then an atomic `base`/`batches` meta flip; superseded generation dirs
    * are retained for one compact cycle (the [[graft.sources.SyncManifest]]
    * reader grace) and vacuumed by the NEXT compact. Single writer per
    * index dir.
    */
  def compact(): Unit = synchronized {
    val b = committedBatches
    if (b - liveBase <= 1) return // already a single (or no) live generation
    IvfIndex.vacuumBelow(spark, s"$dir/assigned", liveBase)
    if (graft.streaming.CdcStream.hasVisibleParquet(spark, s"$dir/assigned")) {
      reads.parquet("assigned", s"$dir/assigned")
        .where(col("b") >= lit(liveBase) && col("b") < lit(b))
        .drop("b")
        .repartition(graft.GraftSession.parallelismFloor(spark), col("th"))
        .write.mode("overwrite").partitionBy("th").parquet(s"$dir/assigned/b=$b")
    }
    liveBase = b
    committedBatches = b + 1
    LshIndex.writeMeta(spark, dir, bits, tables, committedBatches, liveBase,
      quantized, appliedBatch)
  }

  /** Per-bucket live posting counts, keyed by the composed `th` — the
    * index-health row: a hot bucket (too few bits for the corpus size)
    * shows up here long before probes slow down. Scan reads only the
    * partition columns; an index over an empty corpus reports zero rows.
    */
  def bucketStats(): DataFrame = {
    if (!graft.streaming.CdcStream.hasVisibleParquet(spark, s"$dir/assigned"))
      return spark.range(0).select(col("id").as("th"), col("id").as("postings"))
    reads.parquet("assigned", s"$dir/assigned")
      .where(col("b") >= lit(liveBase) && col("b") < lit(committedBatches))
      .groupBy(col("th")).agg(count(lit(1)).as("postings"))
  }

  /** Approximate top-k for each query against the committed index:
    * candidates come from the queries' own buckets across every table,
    * deduped across tables, scored (natively, straight off the stored
    * form), ranked with the bounded top-k aggregator — the same pipeline
    * as [[Similarity.lshTopK]]. The queries frame is evaluated twice (the
    * bucket-pruning side and the returned plan) — hand in a deterministic
    * frame, not a live tail.
    *
    * @param maxPrunedKeys partition-pruning cap, as in [[IvfIndex.probe]]
    */
  def probe(queries: DataFrame, idCol: String, vecCol: String, k: Int,
            maxPrunedKeys: Int = 10000): DataFrame = {
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
    val live = reads.parquet("assigned", s"$dir/assigned")
      .where(col("b") >= lit(liveBase) && col("b") < lit(committedBatches))
    val assigned = IvfIndex.pruneKeys(live, q, "th", maxPrunedKeys)
    val score =
      if (quantized) graft.expressions.NativeFunctions.int8CosineSim(col("codes"), col("qv"))
      else graft.functions.VectorFunctions.cosine(col("qv"), col("cv"))
    val scored = assigned.join(broadcast(q), "th")
      .where(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), score.as("cos_sim"))
    // a pair colliding in several tables must occupy ONE top-k slot
    Similarity.rankTopK(
      if (tables == 1) scored else scored.dropDuplicates("query_id", "corpus_id"), k)
  }
}

object LshIndex {
  private val MetaFile = "_graft_lsh_index.json"
  private val FormatVersion = 3

  /** Build a fresh index over `corpus` at `dir` (replacing any previous
    * index there). `bits`/`tables` are frozen into the meta — every probe
    * and add signs with the same hyperplanes. `quantizedStore = false`
    * keeps raw float postings (bit-equal scoring to the one-shot, 4× the
    * IO — see the class doc).
    */
  def create(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
             bits: Int = 6, tables: Int = 1,
             quantizedStore: Boolean = true): LshIndex = {
    require(bits > 0 && bits <= 24 && tables >= 1,
      s"bad bits=$bits tables=$tables")
    val spark = corpus.sparkSession
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val idx = new LshIndex(spark, dir, bits, tables, 0, 0, quantizedStore)
    idx.add(corpus, idCol, vecCol)
    idx
  }

  /** Open the committed index at `dir`; meta protocol (fmt skew vs
    * corruption, torn-commit tmp fallback) shared via [[IndexMeta]].
    * Fmt-2 layouts (pre-streaming-adds) open in place with `applied`
    * defaulted to −1 — see [[IvfIndex.load]].
    */
  def load(spark: SparkSession, dir: String): LshIndex = {
    val Seq(bits, tables, batches, base, q, applied) = IndexMeta.load(spark, dir,
      MetaFile, FormatVersion, "LSH",
      Seq("bits", "tables", "batches", "base", "q", "applied"),
      compat = Map(2 -> Map("applied" -> -1)))
    new LshIndex(spark, dir, bits, tables, batches, base, q != 0, applied)
  }

  private def writeMeta(spark: SparkSession, dir: String, bits: Int,
                        tables: Int, batches: Int, base: Int,
                        quantized: Boolean, applied: Int): Unit =
    IndexMeta.commit(spark, dir, MetaFile,
      s"""{"fmt":$FormatVersion,"bits":$bits,"tables":$tables,""" +
        s""""batches":$batches,"base":$base,"q":${if (quantized) 1 else 0},""" +
        s""""applied":$applied}""")
}
