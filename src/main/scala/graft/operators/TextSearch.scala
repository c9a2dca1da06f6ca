package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text retrieval over a document corpus: BM25 ranking and boolean
  * term search — the query surface ClickHouse serves with its experimental
  * full-text (inverted) index and `hasToken`-family functions (the
  * reference's ClickHouse target would answer these over the replicated
  * `documents` mirror). One-shot forms here; [[TextIndex]] is the persisted
  * index-lifecycle companion, and a probe against a fresh index EQUALS
  * these one-shot answers exactly (spec-pinned).
  *
  * Scoring is Lucene-flavoured BM25: `idf(t) = ln(1 + (N − df + ½)/(df + ½))`,
  * `score(d) = Σ_t idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))` with
  * k1 = 1.2, b = 0.75. Scores are rounded to 4 decimals BEFORE ranking so
  * the DuckDB oracle (same formula, same rounding) ranks identically.
  *
  * Scale shape: matching rows are produced by one explode→filter→partial-agg
  * pass (docs without any query term are skipped row-level by
  * `arrays_overlap` before the explode); document frequencies are a
  * vocabulary-bounded aggregate broadcast back; the final top-k uses the
  * bounded [[graft.expressions.TopKAggregator]] — each mapper ships k rows,
  * never the matched set.
  */
object TextSearch {
  val K1 = 1.2
  val B = 0.75

  private[operators] def terms(query: String): Seq[String] =
    query.toLowerCase.split(" ").filter(_.nonEmpty).distinct.toSeq

  private[operators] def tokens(textCol: Column): Column =
    split(lower(textCol), " ")

  /** One row per (doc containing a query term, that term): doc_id, dl
    * (FULL doc token count — computed before the term filter), term, tf.
    */
  private[operators] def matchRows(docs: DataFrame, idCol: String,
                                   textCol: String,
                                   qTerms: Seq[String]): DataFrame =
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("w"))
      .where(arrays_overlap(col("w"), array(qTerms.map(lit): _*)))
      .select(col("doc_id"), size(col("w")).as("dl"),
        explode(col("w")).as("term"))
      .where(col("term").isin(qTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Corpus-level constants as a 1-row frame: n_docs, sum_dl. */
  private[operators] def corpusStats(docs: DataFrame, idCol: String,
                                     textCol: String): DataFrame =
    docs.select(size(tokens(col(textCol))).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).cast("double").as("sum_dl"))

  /** The per-(doc, term) BM25 contribution, from columns
    * (tf, dl, df, n_docs, sum_dl). Kept in ONE canonical operation order —
    * the DuckDB oracle spells the identical expression, so both engines
    * round the identical double.
    */
  private[operators] def bm25Term: Column = {
    val avgdl = col("sum_dl") / col("n_docs")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    idf * col("tf") * lit(K1 + 1.0) /
      (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / avgdl))
  }

  /** Score matched rows against `stats` and return the bounded top-k:
    * (doc_id, bm25, rk), ranked by (rounded bm25 desc, doc_id asc).
    */
  private[operators] def scoreAndRank(rows: DataFrame, stats: DataFrame,
                                      k: Int): DataFrame = {
    import org.apache.spark.sql.Encoders
    val df = rows.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = rows.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(round(sum(bm25Term), 4).as("bm25"))
    val topk = udaf(new graft.expressions.TopKAggregator(k),
      Encoders.product[graft.expressions.ScoredId])
    scored.agg(topk(col("doc_id"), col("bm25")).as("top"))
      .select(posexplode(col("top")))
      .select(col("col.id").as("doc_id"), col("col.score").as("bm25"),
        (col("pos") + 1).cast("bigint").as("rk"))
  }

  /** BM25 top-k for one query string over the corpus. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               query: String, k: Int): DataFrame = {
    val q = terms(query)
    require(q.nonEmpty, "empty query")
    scoreAndRank(matchRows(docs, idCol, textCol, q),
      corpusStats(docs, idCol, textCol), k)
  }

  /** Phrase retrieval: ids of docs containing `phrase`'s tokens
    * CONSECUTIVELY, in order. Over a single-space-tokenized corpus this is
    * one bounded substring predicate (the space padding pins word
    * boundaries) — row-level, zero shuffle; [[TextIndex.searchPhrase]]
    * answers the same query positionally from pruned postings.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: String): DataFrame = {
    val norm = phrase.toLowerCase.split(" ").filter(_.nonEmpty).mkString(" ")
    require(norm.nonEmpty, "empty phrase")
    docs.where(contains(concat(lit(" "), lower(col(textCol)), lit(" ")),
        lit(" " + norm + " ")))
      .select(col(idCol).as("doc_id"))
  }

  /** Boolean retrieval: ids of docs whose token set contains EVERY term in
    * `all` and NONE in `none`. Pure row-level predicates — pushes into the
    * scan, no shuffle at all.
    */
  def booleanSearch(docs: DataFrame, idCol: String, textCol: String,
                    all: Seq[String], none: Seq[String] = Nil): DataFrame = {
    require(all.nonEmpty || none.nonEmpty, "empty boolean query")
    val w = tokens(col(textCol))
    val pred = (all.map(t => array_contains(w, t.toLowerCase)) ++
      none.map(t => !array_contains(w, t.toLowerCase))).reduce(_ && _)
    docs.where(pred).select(col(idCol).as("doc_id"))
  }
}
