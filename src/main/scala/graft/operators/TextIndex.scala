package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted text index — the index-lifecycle companion of
  * [[TextSearch]], completing the family ([[JaccardIndex]], [[IvfIndex]],
  * [[LshIndex]]): ClickHouse's experimental full-text index re-expressed as
  * a term-partitioned parquet layout. The one-shot [[TextSearch.bm25TopK]]
  * re-tokenizes the corpus per query; a training pipeline searches the same
  * corpus continuously, so this class tokenizes each batch ONCE and serves
  * every later search from PARTITION-PRUNED scans of the postings — a query
  * reads only the `p = hash(term) mod parts` directories its terms hash to,
  * never the corpus.
  *
  * == On-disk layout ==
  * {{{
  *   dir/_graft_text_index.json  {"fmt":3,"parts":P,"batches":N,"base":B,"batch":M}
  *   dir/postings/b=K/p=J/  (doc_id, dl, term, tf, positions)  J = hash(term) mod P
  *   dir/stats/b=K/         (n_docs, sum_dl)                    one row per batch
  * }}}
  * Document length `dl` is denormalized into every posting row (Lucene
  * stores norms with postings for the same reason): BM25 scoring then needs
  * no corpus-sized doc-length join — the probe touches postings dirs and
  * the batch-count-sized stats relation only. Batches append under fresh
  * `b=K` dirs, the meta commits last via tmp + rename, readers filter
  * `base <= b < batches` — the whole [[JaccardIndex]] protocol, including
  * [[compact]]'s one-cycle reader grace and single-writer contract.
  *
  * == Equivalence ==
  * A probe equals the one-shot [[TextSearch]] answer on the union of every
  * batch fed, exactly (spec-pinned): document frequencies fall out of the
  * postings (one row per doc × distinct term), corpus stats are the sum of
  * the per-batch rows, and scoring reuses [[TextSearch]]'s single canonical
  * expression. Assumes batches partition the corpus (re-adding a doc id
  * would double-count it — the mirror feeding the index upserts upstream).
  *
  * == Scale (100 TB) ==
  * Create/add pay one tokenize + one shuffle (the term-hash repartition
  * that lays postings out for pruning) over the BATCH only. A search costs:
  * a partition-pruned postings scan (its query's `p` dirs — file listing
  * skips the rest; the key list is computed from the query terms, bounded
  * by |query|), a term-bounded df aggregate, and the bounded-top-k rollup.
  * Probe IO tracks the searched terms' posting lists, never the corpus.
  * Storage is one row per (doc, distinct term) — the same order as the
  * corpus token count, ~tf-compressed.
  */
final class TextIndex private (spark: SparkSession, val dir: String,
                               val parts: Int,
                               @volatile private var committedBatches: Int,
                               @volatile private var liveBase: Int,
                               @volatile private var appliedBatch: Int) {
  import TextIndex._

  private val reads = new IndexMeta.CachedReads(spark)

  /** Number of batches committed so far (including the creating corpus). */
  def batches: Int = committedBatches

  /** First live generation: readers scan `base <= b < batches`. */
  def base: Int = liveBase

  /** Highest applied EXTERNAL batch id (−1 until [[addBatch]] is used). */
  def lastBatch: Int = appliedBatch

  private def partOf(c: org.apache.spark.sql.Column) =
    pmod(xxhash64(c), lit(parts)).cast("int")

  /** Tokenize `batch` and append its postings + stats row under the next
    * `b=K`; O(batch) compute, no corpus-side read.
    */
  def add(batch: DataFrame, idCol: String, textCol: String): Unit =
    synchronized { commitGeneration(batch, idCol, textCol, appliedBatch) }

  /** Replay-safe [[add]] for at-least-once feeds (the streaming rider):
    * a batch id at or below the committed high-water mark is skipped —
    * re-adding the same docs would double their postings AND inflate the
    * BM25 corpus stats. Returns whether the batch was applied.
    */
  def addBatch(batchId: Long, batch: DataFrame, idCol: String,
               textCol: String): Boolean = synchronized {
    require(batchId >= 0 && batchId <= Int.MaxValue, s"bad batch id $batchId")
    if (batchId.toInt <= appliedBatch) return false
    commitGeneration(batch, idCol, textCol, batchId.toInt)
    true
  }

  private def commitGeneration(batch: DataFrame, idCol: String,
                               textCol: String, extBatch: Int): Unit = {
    val b = committedBatches
    // r20: widen a single-split batch before tokenizing — the posting
    // explode otherwise fuses into the one scan task (measured: 0.48 s
    // single-task job inside docs_bm25_indexed's create); no-op on
    // at-scale inputs already at the parallelism floor
    val toks = Dedup.widen(batch).select(col(idCol).as("doc_id"),
      TextSearch.tokens(col(textCol)).as("w"))
    toks.select(col("doc_id"), size(col("w")).as("dl"),
        posexplode(col("w")).as(Seq("pos", "term")))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))
      .withColumn("p", partOf(col("term")))
      // r20: explicit count — coalescing-exempt (the IvfIndex.addWithMark
      // note); each p still hashes to one task ⇒ one file per term dir
      .repartition(graft.GraftSession.parallelismFloor(batch.sparkSession),
        col("p"))
      .write.mode("overwrite").partitionBy("p").parquet(s"$dir/postings/b=$b")
    toks.select(size(col("w")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).cast("double").as("sum_dl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats/b=$b")
    committedBatches = b + 1
    appliedBatch = extBatch
    writeMeta(spark, dir, parts, committedBatches, liveBase, appliedBatch)
  }

  private def live(rel: String): DataFrame =
    reads.parquet(rel, s"$dir/$rel")
      .where(col("b") >= lit(liveBase) && col("b") < lit(committedBatches))

  /** Corpus constants summed across the live batch rows — batch-count-sized
    * read, never the corpus.
    */
  private def stats(): DataFrame =
    live("stats").agg(sum(col("n_docs")).as("n_docs"),
      sum(col("sum_dl")).as("sum_dl"))

  /** Live postings rows for `qTerms`, partition-pruned: the `p` key list is
    * computed from the query terms themselves (one 1-row job, no
    * corpus-side collect), so file listing skips every non-queried dir.
    */
  private def matchRows(qTerms: Seq[String]): DataFrame = {
    val keys = spark.range(1)
      .select(qTerms.map(t => partOf(lit(t))): _*)
      .collect().head.toSeq.map(_.asInstanceOf[Int]).distinct
    live("postings")
      .where(col("p").isin(keys: _*) && col("term").isin(qTerms: _*))
      .select(col("doc_id"), col("dl"), col("term"), col("tf"),
        col("positions"))
  }

  /** BM25 top-k for one query string against the committed index; equals
    * [[TextSearch.bm25TopK]] over everything fed, exactly.
    */
  def searchTopK(query: String, k: Int): DataFrame = {
    val q = TextSearch.terms(query)
    require(q.nonEmpty, "empty query")
    TextSearch.scoreAndRank(matchRows(q), stats(), k)
  }

  /** Boolean retrieval from the postings: ids of docs matching EVERY term
    * in `all` and NONE in `none`; equals [[TextSearch.booleanSearch]] over
    * everything fed. Both term sets drive the same pruned scan.
    */
  def booleanSearch(all: Seq[String], none: Seq[String] = Nil): DataFrame = {
    require(all.nonEmpty, "boolean index search needs at least one positive term")
    val allT = all.map(_.toLowerCase).distinct
    val noneT = none.map(_.toLowerCase).distinct
    val rows = matchRows(allT ++ noneT)
    val hits = rows.where(col("term").isin(allT: _*))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms")) // (doc, term) rows are unique
      .where(col("n_terms") === allT.size)
      .select(col("doc_id"))
    if (noneT.isEmpty) hits
    else hits.join(rows.where(col("term").isin(noneT: _*))
      .select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti")
  }

  /** Phrase retrieval from the POSITIONAL postings: ids of docs containing
    * `phrase`'s tokens consecutively, in order — the classic positional-
    * index intersection (Lucene's PhraseQuery): per doc, keep any start
    * position `p` of the first term with term `i`'s positions containing
    * `p + i` for every later `i`. Equals [[TextSearch.phraseSearch]] over
    * everything fed (spec-pinned). The scan prunes to the phrase's distinct
    * terms' dirs; the position intersection is per-doc array arithmetic,
    * bounded by term frequency — no extra shuffle beyond the per-doc
    * rollup.
    */
  def searchPhrase(phrase: String): DataFrame = {
    val ts = phrase.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    require(ts.nonEmpty, "empty phrase")
    val rows = matchRows(ts.distinct)
    if (ts.size == 1) return rows.select(col("doc_id")).distinct()
    val byDoc = rows
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(
        struct(col("term"), col("positions")))).as("m"))
      // every phrase term must be present before the position check
      .where(ts.distinct.map(t => col("m").getItem(t).isNotNull).reduce(_ && _))
    val starts = filter(col("m").getItem(ts.head), p =>
      ts.zipWithIndex.tail
        .map { case (t, i) => array_contains(col("m").getItem(t), p + i) }
        .reduce(_ && _))
    byDoc.where(size(starts) > 0).select(col("doc_id"))
  }

  /** Per-term-partition live posting counts — the index-health row: hot
    * `p` dirs signal skewed terms (boilerplate tokens) worth a stopword
    * cut. Reads only partition + count, columnar-pruned.
    */
  def partStats(): DataFrame =
    live("postings").groupBy(col("p")).agg(count(lit(1)).as("postings"))

  /** Fold the live generations into one (file-count lever, same grace
    * contract as the family: superseded dirs survive one cycle, vacuumed by
    * the NEXT compact).
    */
  def compact(): Unit = synchronized {
    val b = committedBatches
    if (b - liveBase <= 1) return
    IvfIndex.vacuumBelow(spark, s"$dir/postings", liveBase)
    IvfIndex.vacuumBelow(spark, s"$dir/stats", liveBase)
    live("postings").drop("b")
      .repartition(graft.GraftSession.parallelismFloor(spark), col("p"))
      .write.mode("overwrite").partitionBy("p").parquet(s"$dir/postings/b=$b")
    stats().coalesce(1).write.mode("overwrite").parquet(s"$dir/stats/b=$b")
    liveBase = b
    committedBatches = b + 1
    writeMeta(spark, dir, parts, committedBatches, liveBase, appliedBatch)
  }
}

object TextIndex {
  private val MetaFile = "_graft_text_index.json"
  // 2: positional postings (positions column); 3: external-batch mark
  private val FormatVersion = 3

  /** Build a fresh index over `corpus` at `dir` (replacing any previous
    * index there).
    */
  def create(corpus: DataFrame, idCol: String, textCol: String, dir: String,
             parts: Int = 64): TextIndex = {
    require(parts > 0, s"bad parts=$parts")
    val spark = corpus.sparkSession
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val idx = new TextIndex(spark, dir, parts, 0, 0, -1)
    idx.add(corpus, idCol, textCol)
    idx
  }

  /** Open the committed index at `dir`; meta protocol (fmt skew vs
    * corruption, torn-commit tmp fallback) shared via [[IndexMeta]].
    * Fmt-2 layouts (positional postings, pre-streaming-adds) open in
    * place with the external-batch mark defaulted to −1; fmt 1 predates
    * the positions column and still requires a rebuild.
    */
  def load(spark: SparkSession, dir: String): TextIndex = {
    val Seq(parts, batches, base, batch) = IndexMeta.load(spark, dir, MetaFile,
      FormatVersion, "text", Seq("parts", "batches", "base", "batch"),
      compat = Map(2 -> Map("batch" -> -1)))
    new TextIndex(spark, dir, parts, batches, base, batch)
  }

  private def writeMeta(spark: SparkSession, dir: String, parts: Int,
                        batches: Int, base: Int, batch: Int): Unit =
    IndexMeta.commit(spark, dir, MetaFile,
      s"""{"fmt":$FormatVersion,"parts":$parts,"batches":$batches,""" +
        s""""base":$base,"batch":$batch}""")
}
