package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted, additively maintained prefix-filtering index for continuous
  * exact-Jaccard dedup — the index-lifecycle companion of
  * [[Dedup.jaccardPairsIncremental]]. The one-shot form recomputes document
  * frequency and corpus postings over corpus ∪ batch on every call, which is
  * the right shape for a single ad-hoc probe but a full corpus rescan per
  * sync batch in a continuous pipeline (the reference's premise: PeerDB
  * mirrors run forever, landing batch after batch — peerdb_config.yaml's
  * perpetual mirror definitions). This class persists the two corpus-side
  * relations next to the mirror and updates them ADDITIVELY per batch, so a
  * landed batch pays O(batch) compute plus pruned columnar scans of the
  * index — never a re-tokenize, re-aggregate, or re-window of the corpus.
  *
  * == On-disk layout ==
  * {{{
  *   dir/_graft_jaccard_index.json   {"threshold":…,"batches":N}
  *   dir/tokens/b=K/    (w, odf)     append-only vocabulary with order keys
  *   dir/postings/b=K/  (id, w, rn, n)  prefix postings of batch K's docs
  *   dir/sets/b=K/      (id, wh)     sorted word-hash set per doc
  * }}}
  * Each batch writes its three additions under fresh `b=K` directories and
  * then commits the meta file via tmp + rename (the same single-file swap as
  * [[graft.sources.Incremental]]'s capture state). Readers filter `b <
  * committed batches`, so a crash mid-append leaves invisible stray files
  * that the next add simply overwrites — the index is never read torn.
  *
  * == Soundness of the frozen token order ==
  * Prefix filtering is sound under ANY fixed total order on tokens: if both
  * sets' prefixes (first n − ⌈t·n⌉ + 1 tokens under that order) are taken
  * under the SAME order, any pair with J ≥ t shares a prefix token
  * (Chaudhuri 2006; Bayardo 2007 — df-ascending is only a bucket-size
  * heuristic, not a correctness requirement). The index therefore freezes
  * each token's order key `odf` ONCE, at the token's first appearance (its
  * document frequency at that moment); later batches may shift true dfs but
  * never an assigned key, so the global order `(odf, w)` is consistently
  * EXTENDED — never permuted — and postings written in batch 0 remain valid
  * prefixes under the order batch K probes with. Recall is exact forever;
  * the only drift is bucket-size quality (a token that later becomes common
  * keeps its rare-looking key, so its posting bucket can grow hot). Rebuild
  * with [[JaccardIndex.create]] periodically to re-canonicalize order keys;
  * every emitted pair is exact-verified regardless, so staleness can never
  * produce a false positive either.
  *
  * == Scale (100 TB) ==
  * Per-batch work: tokenize/window the BATCH only; the corpus is touched by
  * (a) a postings scan pruned with a semi-join on the batch's prefix tokens
  * and (b) a sets scan pruned by the surviving posting ids — both columnar
  * scans whose join sides are batch-derived and broadcastable in the CDC
  * regime (AQE picks broadcast at runtime), so no corpus-sized shuffle
  * recurs per batch. Index storage is one posting row per prefix token
  * (≈ (1−t) of the corpus token count) plus one hash-set row per doc — the
  * same order as the mirrored text itself. Single writer per index dir
  * (same contract as the capture state file).
  */
final class JaccardIndex private (spark: SparkSession, val dir: String,
                                  val threshold: Double,
                                  @volatile private var committedBatches: Int) {
  import JaccardIndex._

  /** Number of batches committed so far (including the creating corpus). */
  def batches: Int = committedBatches

  private def rel(name: String): String = s"$dir/$name"

  /** Committed rows of one index relation; `fallback` supplies the empty
    * schema before the first commit (and pins the id type to the caller's).
    */
  private def readRel(name: String, fallback: => DataFrame): DataFrame =
    if (committedBatches == 0) fallback.limit(0)
    else spark.read.parquet(rel(name))
      .where(col("b") < lit(committedBatches)).drop("b")

  /** Batch-side derivations, shared by probe and add so both sides of
    * `probeAndAdd` agree on new-token order keys by construction.
    */
  private case class Prepared(newTokens: DataFrame, post: DataFrame, sets: DataFrame)

  private def prepare(batch: DataFrame, idCol: String, textCol: String): Prepared = {
    val words = Dedup.widen(batch).select(col(idCol).as("id"),
      array_distinct(split(lower(col(textCol)), " ")).as("words"))
    val tok = words.select(col("id"), size(col("words")).as("n"),
      explode(col("words")).as("w"))
    val known = readRel("tokens", tok.select(col("w"), lit(0L).as("odf")))
    // a token unseen by every committed batch gets its order key HERE — its
    // df within this batch — and keeps it forever (see class doc)
    val newTokens = tok.join(known, Seq("w"), "left_anti")
      .groupBy(col("w")).agg(count(lit(1)).as("odf"))
    val vocab = known.unionByName(newTokens)
    val post = tok.join(vocab, "w")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("odf"), col("w"))))
      .where(col("rn") <= col("n") - ceil(col("n") * lit(threshold)) + 1)
      .select(col("id"), col("w"), col("rn").cast("int").as("rn"),
        col("n").cast("int").as("n"))
    val sets = words.select(col("id"),
      sort_array(array_distinct(transform(col("words"), t => xxhash64(t)))).as("wh"))
    Prepared(newTokens, post, sets)
  }

  /** All J ≥ threshold pairs touching `batch` — (batch × indexed corpus) ∪
    * (batch × batch) — WITHOUT modifying the index. Ids must be disjoint
    * from every previously indexed id. Returns (id_a, id_b, jaccard),
    * id_a < id_b; recall is guaranteed (frozen-order prefix filtering) and
    * every pair is exact-verified, so the result EQUALS the one-shot
    * [[Dedup.jaccardPairsIncremental]] on the same inputs.
    */
  def probe(batch: DataFrame, idCol: String, textCol: String): DataFrame =
    probeWith(prepare(batch, idCol, textCol))

  private def probeWith(p: Prepared): DataFrame = {
    val parts = spark.sessionState.conf.numShufflePartitions
    val bp = p.post
    // prune the corpus postings scan to the batch's prefix tokens — only
    // postings that can produce a candidate survive; the semi-join side is
    // batch-vocabulary-sized (broadcast in the CDC regime)
    val cp = readRel("postings", bp)
      .join(bp.select(col("w")).distinct(), Seq("w"), "left_semi")
    // attach each doc's hash set BEFORE the candidate join so thresholded
    // verification runs inline in the join's codegen pipeline (the shape of
    // jaccardPairsPrefix); the corpus sets join is pruned by the surviving
    // posting ids through the inner join itself
    val bv = bp.join(p.sets, "id")
    val cv = cp.join(readRel("sets", p.sets), "id")
    val all = cv.unionByName(bv)
    val ubound = (lit(1) + least(col("l.n") - col("l.rn"), col("r.n") - col("r.rn")))
      .cast("double") * lit(1.0 + threshold)
    val positional =
      ubound >= (col("l.n") + col("r.n")).cast("double") * lit(threshold) - lit(1e-6)
    val jac = graft.expressions.NativeFunctions.sortedJaccard(col("l.wh"), col("r.wh"), threshold)
    // explicit repartition of the probe side — the AQE single-task
    // coalescing trap, same as jaccardPairsIncremental
    bv.repartition(parts, col("id")).as("l").join(all.as("r"),
        col("l.w") === col("r.w") && col("l.id") =!= col("r.id") && positional)
      .select(least(col("l.id"), col("r.id")).as("id_a"),
        greatest(col("l.id"), col("r.id")).as("id_b"), jac.as("jaccard"))
      .where(col("jaccard") >= threshold)
      .distinct()
  }

  /** Append `batch` to the index (new tokens + its postings + its sets) and
    * commit. O(batch) compute; the only corpus-side read is the vocabulary
    * anti-join (token-relation-sized, not corpus-sized).
    */
  def add(batch: DataFrame, idCol: String, textCol: String): Unit =
    addWith(prepare(batch, idCol, textCol))

  private def addWith(p: Prepared): Unit = synchronized {
    val b = committedBatches
    p.newTokens.write.mode("overwrite").parquet(rel(s"tokens/b=$b"))
    p.post.write.mode("overwrite").parquet(rel(s"postings/b=$b"))
    p.sets.write.mode("overwrite").parquet(rel(s"sets/b=$b"))
    committedBatches = b + 1
    writeMeta(spark, dir, threshold, committedBatches)
  }

  /** Probe first, then commit the batch — the per-sync step of a continuous
    * pipeline. The returned pairs are lazy but pinned to the pre-add index
    * state (reads filter on the batch count captured at probe time), so
    * consuming them after the add still yields exactly the probe-time
    * result.
    */
  def probeAndAdd(batch: DataFrame, idCol: String, textCol: String): DataFrame = {
    val p = prepare(batch, idCol, textCol)
    val pairs = probeWith(p)
    addWith(p)
    pairs
  }
}

object JaccardIndex {
  private val MetaFile = "_graft_jaccard_index.json"

  /** Build a fresh index over `corpus` at `dir` (replacing any previous
    * index there) — also the periodic re-canonicalization path that resets
    * drifted order keys to current document frequencies.
    */
  def create(corpus: DataFrame, idCol: String, textCol: String,
             threshold: Double, dir: String): JaccardIndex = {
    val spark = corpus.sparkSession
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val idx = new JaccardIndex(spark, dir, threshold, 0)
    idx.add(corpus, idCol, textCol)
    idx
  }

  /** Open the committed index at `dir`. */
  def load(spark: SparkSession, dir: String): JaccardIndex = {
    val metaP = new Path(dir, MetaFile)
    val fs = metaP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(metaP))
      throw new IllegalStateException(s"no Jaccard index under $dir — run create() first")
    val in = fs.open(metaP)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    def field(k: String): String =
      """"%s"\s*:\s*(-?[\d.Ee+-]+)""".format(k).r.findFirstMatchIn(txt)
        .getOrElse(throw new IllegalStateException(s"corrupt $metaP: $txt")).group(1)
    new JaccardIndex(spark, dir, field("threshold").toDouble, field("batches").toInt)
  }

  private def writeMeta(spark: SparkSession, dir: String, threshold: Double,
                        batches: Int): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir, MetaFile + ".tmp")
    val dst = new Path(dir, MetaFile)
    val out = fs.create(tmp, true)
    try out.write(s"""{"threshold":$threshold,"batches":$batches}""".getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst)) throw new java.io.IOException(s"rename $tmp -> $dst failed")
  }
}
