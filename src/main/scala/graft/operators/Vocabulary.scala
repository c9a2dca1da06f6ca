package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-relative vocabulary statistics for training-data curation: the
  * OOV (out-of-vocabulary) rate of each document against the corpus' own
  * top-k vocabulary — a standard pretraining quality signal (gibberish,
  * wrong-language, and boilerplate-noise documents score high) that the
  * per-document heuristics in [[graft.functions.TextFunctions]] cannot
  * express, because it is relative to the corpus, not the document.
  *
  * Everything is exact integer math (token and OOV counts, no float
  * ratios), so results are engine-comparable; the caller divides if it
  * wants a rate.
  *
  * Scale (100 TB): the token explode is narrow and linear; the vocabulary
  * is CAPPED at k with a deterministic tie-break, planned as
  * TakeOrderedAndProject (each partition ships ≤ k rows, never the token
  * relation); the OOV anti-join broadcasts the k-row vocabulary; the
  * per-document aggregate combines map-side.
  */
object Vocabulary {

  private def toks(textCol: String) =
    explode(graft.functions.TextFunctions.tokens(lower(col(textCol)))).as("w")

  // r20: every tokenizing entry point runs its corpus through
  // [[Dedup.widen]] first — a small corpus arriving as a single parquet
  // row group otherwise fuses the tokenize/shingle explode into the ONE
  // scan task (measured: docs_source_overlap's and docs_ngram_novelty's
  // heaviest jobs were 0.6-1.0 s single-task stages). widen is a no-op on
  // any input already at the session's parallelism floor — real-scale
  // inputs are untouched; the guide's "repartition unsplittable inputs
  // right after the read".

  /** The corpus' `k` most frequent (lowercased, whitespace) tokens. Ties at
    * the cut break by the token itself, so the vocabulary — and everything
    * derived from it — is deterministic across engines and partitionings.
    */
  def topVocabulary(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"bad k=$k")
    Dedup.widen(docs).select(toks(textCol))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w"))
      .limit(k)
  }

  /** One row per document: total token count and how many of its tokens
    * fall outside the corpus' top-`k` vocabulary (both exact integers;
    * zero-OOV and empty documents included).
    */
  def oovStats(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 1000): DataFrame = {
    val vocab = topVocabulary(docs, textCol, k).select(col("w"))
    // both counts come from ONE tokenization of the probe side (a left
    // broadcast join against the k-row vocab marks hits inline), so the
    // corpus is tokenized twice total — the vocabulary pass and the probe
    // pass — never a third time for n_tokens
    val tok = Dedup.widen(docs).select(col(idCol), toks(textCol))
      .where(length(col("w")) > 0)
    val stats = tok
      .join(broadcast(vocab.withColumn("_graft_in", lit(1))), Seq("w"), "left")
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("_graft_in").isNull, 1L).otherwise(0L)).as("oov_tokens"))
    // empty/whitespace-only documents have no token rows but must appear
    docs.select(col(idCol))
      .join(stats, Seq(idCol), "left")
      .na.fill(0L, Seq("n_tokens", "oov_tokens"))
  }

  /** Per-document average token log-probability under the corpus' OWN
    * add-one-smoothed unigram language model — the perplexity-filter
    * signal (CCNet/KenLM-style: documents whose tokens are improbable
    * under the corpus LM are gibberish/outlier candidates; here the model
    * is the corpus itself, so no external artifact is needed).
    * `lp(w) = ln((count(w)+1)/(N+V))`; the per-doc score is the
    * tf-WEIGHTED sum over the doc's distinct terms divided by its token
    * count — the identical formulation (operand shapes included) the
    * DuckDB oracle computes, rounded to 4dp.
    *
    * Scale: one tf aggregation (shared shape with [[tfidfTopTerms]]), a
    * vocabulary-bounded count table joined back (AQE-broadcastable), a
    * 1-row totals broadcast — per-doc summands are distinct-terms-sized,
    * never token-sized.
    */
  def unigramLogprob(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = Dedup.widen(docs).select(col(idCol).as("doc_id"), toks(textCol))
      .where(length(col("w")) > 0)
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val cnt = tf.groupBy(col("w")).agg(sum(col("tf")).as("c"))
    val tot = cnt.agg(sum(col("c")).cast("double").as("n_tok"),
      count(lit(1)).cast("double").as("v"))
    tf.join(cnt, "w").crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        round(sum(col("tf") * log((col("c") + 1) / (col("n_tok") + col("v"))))
          / sum(col("tf")), 4).as("avg_logprob"))
  }

  /** Per-document average BIGRAM log-probability under the corpus' own
    * add-one-smoothed bigram language model — the order-sensitive sibling
    * of [[unigramLogprob]] (a KenLM-style perplexity filter one order up:
    * scrambled or templated text scores low under the bigram model even
    * when its unigram mix looks normal).
    * `lp(w₂|w₁) = ln((c(w₁,w₂)+1)/(c₁(w₁)+V))` with `c₁(w₁)` = count of
    * w₁ in bigram-left position and `V` = corpus unigram vocabulary; the
    * per-doc score is the tf-weighted sum over the doc's distinct bigrams
    * divided by its bigram count, rounded to 4dp — formulation mirrored
    * exactly by the DuckDB oracle. Documents with < 2 tokens have no
    * bigram and are excluded (the model is undefined there).
    *
    * Scale: the bigram explode is linear in tokens; tf aggregates at
    * (doc, bigram) grain with map-side combine; the bigram count table is
    * vocabulary²-bounded in theory but Zipf-bounded in practice (AQE picks
    * broadcast vs shuffle); left-counts re-aggregate from it; the totals
    * frame is one broadcast row.
    */
  def bigramLogprob(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val arr = Dedup.widen(docs).select(col(idCol).as("doc_id"),
      filter(graft.functions.TextFunctions.tokens(lower(col(textCol))),
        w => length(w) > 0).as("a"))
    val bg = arr
      .where(size(col("a")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(a) - 2), i -> struct(a[i] AS w1, a[i+1] AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val tf = bg.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
    val c2 = tf.groupBy(col("w1"), col("w2")).agg(sum(col("tf")).as("c2"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    // V = the corpus' full unigram vocabulary (all positions, not just
    // bigram-left), matching the unigram model's V
    val vocab = docs.select(toks(textCol)).where(length(col("w")) > 0)
      .agg(countDistinct(col("w")).cast("double").as("v"))
    tf.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        round(sum(col("tf") * log((col("c2") + 1) / (col("c1") + col("v"))))
          / sum(col("tf")), 4).as("avg_logprob"))
  }

  /** Interpolated Kneser–Ney bigram signal (Kneser & Ney 1995, the
    * standard n-gram smoothing): per doc, the mean log of
    * `P_KN(w2|w1) = (max(c(w1,w2) − D, 0) + D·N1+(w1,·)·P_cont(w2)) / c(w1)`
    * with discount D = 0.75 and the continuation probability
    * `P_cont(w2) = N1+(·,w2) / |bigram types|` — the model CCNet-style
    * quality bucketing actually uses, where [[bigramLogprob]] is the
    * add-one baseline. Trained on the corpus itself (the perplexity-
    * signal convention here), so every bigram is in-vocabulary and the
    * interpolation term handles the low-count mass.
    *
    * All counts are exact integers from the same one-exploded-pass
    * aggregation tree as [[bigramLogprob]]; the discounted closed form is
    * float only at the end, rounded 4dp (the family's float posture).
    * Count tables join vocab-keyed (co-partitioned aggregates), the
    * type total is a 1-row broadcast.
    */
  def bigramKnLogprob(docs: DataFrame, idCol: String, textCol: String,
                      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"bad discount=$discount")
    val arr = Dedup.widen(docs).select(col(idCol).as("doc_id"),
      filter(graft.functions.TextFunctions.tokens(lower(col(textCol))),
        w => length(w) > 0).as("a"))
    val bg = arr
      .where(size(col("a")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(a) - 2), i -> struct(a[i] AS w1, a[i+1] AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val tf = bg.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
    val c2 = tf.groupBy(col("w1"), col("w2")).agg(sum(col("tf")).as("c2"))
    // per left word: total count and distinct continuations N1+(w1,·)
    val left = c2.groupBy(col("w1"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1l"))
    // per right word: distinct histories N1+(·,w2); their grand total is
    // the bigram type count (each type contributes once)
    val cont = c2.groupBy(col("w2")).agg(count(lit(1)).as("nc"))
    val types = c2.agg(count(lit(1)).cast("double").as("tt"))
    val d = lit(discount)
    val p = (greatest(col("c2") - d, lit(0.0))
      + d * col("n1l") * (col("nc") / col("tt"))) / col("c1")
    tf.join(c2, Seq("w1", "w2")).join(left, Seq("w1")).join(cont, Seq("w2"))
      .crossJoin(broadcast(types))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        round(sum(col("tf") * log(p)) / sum(col("tf")), 4).as("avg_kn_logprob"))
  }

  /** Heaps'-law vocabulary-growth fit — one row: corpus size, vocabulary,
    * and the fitted Heaps exponent β from `V(T) ≈ k·T^β` (OLS of ln V on
    * ln T over the per-doc growth curve; natural-language corpora sit
    * near β ≈ 0.4-0.6, templated/synthetic corpora diverge — the
    * vocabulary-health dual of [[zipfStats]]).
    *
    * The growth curve is EXACT without any sequential scan: a token's
    * first occurrence is `min(doc id)` (one aggregation), so the
    * vocabulary after doc d is the cumsum of first-occurrence counts over
    * the DOC-grained frame. Doc count grows with the corpus, so the
    * cumsums run through [[Ranking.withRunningSums]] (the exactNtile
    * two-pass idiom: global sort + per-partition totals + broadcast
    * offsets) — no single-partition WindowExec anywhere in the plan, at
    * any corpus size. Only the final OLS is float, rounded 4dp (the
    * [[zipfStats]] posture).
    */
  def heapsLaw(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = Dedup.widen(docs).select(col(idCol).as("d"),
        explode(filter(graft.functions.TextFunctions.tokens(
          lower(col(textCol))), w => length(w) > 0)).as("w"))
    val perDoc = tok.groupBy(col("d")).agg(count(lit(1)).as("toks"))
    val firstOcc = tok.groupBy(col("w")).agg(min(col("d")).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("news"))
    val curve = Ranking.withRunningSums(
        perDoc.join(firstOcc, Seq("d"), "left")
          .select(col("d"), col("toks"),
            coalesce(col("news"), lit(0L)).as("news")),
        order = Seq(col("d")), sumCols = Seq("toks", "news"),
        outCols = Seq("t", "v"))
      // a leading run of empty docs has no defined log point
      .where(col("t") > 0 && col("v") > 0)
      .select(log(col("t").cast("double")).as("x"),
        log(col("v").cast("double")).as("y"),
        col("t"), col("v"))
    curve.agg(count(lit(1)).as("n_docs"), max(col("t")).as("total_tokens"),
        max(col("v")).as("vocab_size"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("n_docs"), col("total_tokens"), col("vocab_size"),
        round((col("n_docs").cast("double") * col("sxy")
          - col("sx") * col("sy"))
          / (col("n_docs").cast("double") * col("sxx")
            - col("sx") * col("sx")), 4).as("heaps_beta"))
  }

  /** Corpus-level Zipf/hapax profile — one row: vocabulary size, token
    * total, hapax-legomena count and fraction (terms occurring once — the
    * classic OCR-noise / boilerplate-divergence signal), and the fitted
    * Zipf slope (OLS of ln freq on ln rank over the top-`k` ranks; healthy
    * natural-language corpora sit near −1, templated or synthetic corpora
    * flatten). Counts are exact integers; the slope is a float OLS over a
    * k-bounded rank table rounded to 4dp (the [[unigramLogprob]] float
    * posture).
    *
    * Scale: one token aggregation; the rank table is capped at `k` with a
    * deterministic (freq desc, term) tie-break planned as
    * TakeOrderedAndProject; everything after is k-bounded.
    */
  def zipfStats(docs: DataFrame, textCol: String, k: Int = 1000): DataFrame = {
    require(k > 0, s"bad k=$k")
    val cnt = Dedup.widen(docs).select(toks(textCol))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val totals = cnt.agg(
      count(lit(1)).as("vocab_size"),
      sum(col("c")).as("n_tokens"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
    val top = cnt.orderBy(col("c").desc, col("w")).limit(k)
      .withColumn("rk", row_number().over(org.apache.spark.sql.expressions
        .Window.orderBy(col("c").desc, col("w"))))
    val xy = top.select(log(col("rk").cast("double")).as("x"),
      log(col("c").cast("double")).as("y"))
    val fit = xy.agg(count(lit(1)).cast("double").as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    totals.crossJoin(fit).select(
      col("vocab_size"), col("n_tokens"), col("n_hapax"),
      round(col("n_hapax").cast("double") / col("vocab_size"), 6)
        .as("hapax_frac"),
      round((col("n") * col("sxy") - col("sx") * col("sy"))
        / (col("n") * col("sxx") - col("sx") * col("sx")), 4)
        .as("zipf_slope"))
  }

  /** Jensen-Shannon divergence of each group's unigram distribution from
    * the whole corpus' — the standard domain-shift / slice-drift signal of
    * a pretraining mix (which language/source slices diverge most from the
    * blend they feed). For vocabulary terms ABSENT from a group the
    * p-side term vanishes and the q-side contributes `½q·ln2`, which sums
    * to `½ln2·(1 − Σ_present q)` — so the computation only ever joins the
    * PRESENT (group, term) pairs against the global count table:
    * `JS = ½ln2 + Σ_present [½p·ln(2p/(p+q)) + ½q·ln(2q/(p+q)) − ½q·ln2]`.
    * Bounded in [0, ln 2]; float summands form the identical multiset on
    * both engines (the [[unigramLogprob]] posture), rounded to 4dp.
    *
    * Scale: one tf aggregation at (group, term) grain, the Zipf-bounded
    * global count table joined back, two broadcast totals frames.
    */
  def jsDivergence(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    // r20: tf feeds FOUR consumers (glob, the group totals, the grand
    // total via glob, and the final join) — un-materialized, each re-ran
    // the tokenize explode + (g, w) aggregate (measured: four 32-task
    // passes at 1.2–8.7 s task time each). One eager checkpoint of the
    // vocabulary×groups-sized grain.
    val tf = Dedup.widen(docs).select(col(groupCol).as("g"), toks(textCol))
      .where(length(col("w")) > 0)
      .groupBy(col("g"), col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val glob = tf.groupBy(col("w")).agg(sum(col("c")).as("cg"))
    val gTot = tf.groupBy(col("g")).agg(sum(col("c")).as("ng"))
    val tot = glob.agg(sum(col("cg")).cast("double").as("nn"))
    val p = col("c").cast("double") / col("ng").cast("double")
    val q = col("cg").cast("double") / col("nn")
    val ln2 = lit(math.log(2.0))
    val term = (p * log(lit(2.0) * p / (p + q))
      + q * log(lit(2.0) * q / (p + q)) - q * ln2) / 2.0
    tf.join(glob, "w").join(broadcast(gTot), "g").crossJoin(broadcast(tot))
      .groupBy(col("g"))
      .agg(max(col("ng")).as("n_tokens"),
        round(ln2 / 2.0 + sum(term), 4).as("js_div"))
      .select(col("g").as(groupCol), col("n_tokens"), col("js_div"))
  }

  /** Per-document top-`n` TF-IDF terms — corpus-relative keyword
    * extraction (`idf = ln(N/df)`, score rounded to 4dp BEFORE the rank,
    * ties by term). The document-frequency table is vocabulary-bounded and
    * broadcast; the rank window partitions by doc (per-doc groups are
    * distinct-terms-per-doc-sized — no global sort, no corpus shuffle
    * beyond the tf aggregation it already needs).
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 3): DataFrame = {
    require(n > 0, s"bad n=$n")
    val tf = Dedup.widen(docs).select(col(idCol).as("doc_id"), toks(textCol))
      .where(length(col("w")) > 0)
      .groupBy(col("doc_id"), col("w").as("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    tf.join(broadcast(df), "term").crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
      .select(col("doc_id"), col("term"), col("tfidf"),
        row_number().over(w).cast("bigint").as("rk"))
      .where(col("rk") <= n)
  }

  /** EXACT pairwise n-gram Jaccard between corpus GROUPS (sources,
    * crawls, snapshots): each group's distinct `width`-gram shingle set,
    * then |A∩B| / |A∪B| for every group pair — the corpus-diagnostics
    * dual of per-document dedup ("how much does crawl B re-cover crawl
    * A", the overlap readout every multi-source pretraining mix needs
    * before choosing sampling weights).
    *
    * Scale: the shingle explode is narrow and linear; distinct (group,
    * shingle) shuffles once on the shingle; the intersection join groups
    * BY SHINGLE first, so its fan-out per shingle is bounded by the
    * GROUP COUNT squared (a handful), never document-pair-shaped — no
    * all-pairs path at any corpus size. Counts are exact integers; the
    * one double is the final ratio (6dp).
    */
  /** Per-group token-bigram Shannon entropy — the repetitiveness readout a
    * pretraining-mix curator reads per SOURCE: template/boilerplate-heavy
    * corpora concentrate probability mass on few bigrams (low H), diverse
    * prose spreads it (high H ≈ log2 of the effective bigram vocabulary).
    * The bigram grain (not unigram) is what separates "same words, same
    * phrasing" from "same words, varied phrasing" — the signal n-gram LM
    * perplexity buckets ([[bigramLogprob]]) read per DOCUMENT, here folded
    * to the group grain for mix-weight decisions.
    *
    * H = log2(T) − (Σ c·log2 c)/T over exact bigram counts c, total T —
    * one exploded pass, two map-side-combined aggregations; the final
    * frame is group-grain. The float sum follows the text family's
    * rounding posture (4dp after the division).
    *
    * Output: (group, n_bigrams, n_types, bigram_entropy_bits).
    */
  def bigramEntropy(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val arr = Dedup.widen(docs).select(col(groupCol).as("g"),
      filter(graft.functions.TextFunctions.tokens(lower(col(textCol))),
        w => length(w) > 0).as("a"))
    val bg = arr
      .where(size(col("a")) >= 2)
      .select(col("g"), explode(expr(
        "transform(sequence(0, size(a) - 2), i -> struct(a[i] AS w1, a[i+1] AS w2))"))
        .as("b"))
      .select(col("g"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c = bg.groupBy(col("g"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
    c.groupBy(col("g"))
      .agg(sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("n_types"),
        sum(col("c").cast("double") * log2(col("c").cast("double"))).as("slg"))
      .select(col("g").as(groupCol), col("n_bigrams"), col("n_types"),
        round(log2(col("n_bigrams").cast("double"))
          - col("slg") / col("n_bigrams").cast("double"), 4)
          .as("bigram_entropy_bits"))
  }

  def groupShingleOverlap(docs: DataFrame, groupCol: String, textCol: String,
                          width: Int = 3): DataFrame = {
    require(width >= 1, s"bad shingle width $width")
    val sh = Dedup.widen(docs).select(col(groupCol).as("g"),
        split(lower(col(textCol)), " ").as("tk"))
      .where(size(col("tk")) >= width)
      .select(col("g"), explode(expr(
        s"transform(sequence(0, size(tk) - $width), " +
          s"i -> concat_ws(' ', slice(tk, i + 1, $width)))")).as("sh"))
      .distinct()
    val sizes = sh.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val inter = sh.select(col("g").as("ga"), col("sh"))
      .join(sh.select(col("g").as("gb"), col("sh")), Seq("sh"))
      .where(col("ga") < col("gb"))
      .groupBy(col("ga"), col("gb")).agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("g").as("ga"), col("n").as("na")), Seq("ga"))
      .join(sizes.select(col("g").as("gb"), col("n").as("nb")), Seq("gb"))
      .select(col("ga"), col("gb"), col("na"), col("nb"), col("n_inter"),
        round(col("n_inter").cast("double") /
          (col("na") + col("nb") - col("n_inter")).cast("double"), 6)
          .as("jaccard"))
  }

  /** Mean segmental type-token ratio (MSTTR, Johnson 1944) per source:
    * the length-robust lexical-diversity readout — plain TTR collapses
    * as documents grow (types saturate while tokens don't), so the text
    * is cut into FIXED `segment`-token segments, TTR = distinct/segment
    * is computed per COMPLETE segment, and the per-source mean is
    * reported. The diversity screen that complements `docs_zipf_hapax`
    * (corpus shape) and `docs_bigram_entropy` (repetitiveness) at the
    * document grain.
    *
    * Exactness: segment membership is integer position arithmetic
    * (pos DIV segment), distinct counts are exact, and the mean is one
    * division of an exact integer sum of per-segment distincts by the
    * segment count. One tokenize pass, one (doc, segment) distinct
    * grain, one source rollup — no windows over the token stream.
    */
  def msttr(docs: DataFrame, idCol: String, textCol: String,
            sourceCol: String, segment: Int = 50): DataFrame = {
    require(segment >= 2, s"bad segment=$segment")
    val tok = Dedup.widen(docs)
      .select(col(idCol).as("doc"), col(sourceCol).as("source"),
        posexplode(graft.functions.TextFunctions.tokens(lower(col(textCol)))))
      .withColumnRenamed("col", "w")
      .where(length(col("w")) > 0)
    // only COMPLETE segments count (the convention that makes MSTTR
    // length-robust): a doc's segment s is complete iff it holds exactly
    // `segment` tokens
    val seg = tok
      .groupBy(col("doc"), col("source"),
        (col("pos") / segment).cast("long").as("seg"))
      .agg(count(lit(1)).as("n_tok"), count_distinct(col("w")).as("types"))
      .where(col("n_tok") === segment.toLong)
    seg.groupBy(col("source"))
      .agg(count(lit(1)).as("n_segments"), sum(col("types")).as("st"))
      .select(col("source"), col("n_segments"),
        round(col("st").cast("double")
          / (col("n_segments").cast("double") * segment.toDouble), 6)
          .as("msttr"))
  }

  /** RAKE keyword extraction (Rose et al. 2010) over the corpus:
    * candidate phrases are maximal stopword-free token runs of
    * `minWords..maxWords` words; each word scores deg(w)/freq(w) over
    * the kept candidates (deg = Σ phrase length over phrases containing
    * w — frequency plus within-phrase co-occurrence, RAKE's signature
    * ratio that favors words living in long phrases); a phrase scores
    * the sum of its word scores. Output one row per distinct phrase
    * seen ≥ `minCount` times: (phrase, n_docs, n_occurrences, score).
    *
    * Determinism: the OUTPUT SET is decided by integer counts alone;
    * deg/freq are exact integers, and each occurrence's score fold runs
    * in word-position order (a fixed-order cumulative window — the
    * theilsU idiom), so equal phrases fold identically and the float is
    * engine-reproducible. Scale shape: one doc-partitioned position
    * window builds runs, phrases aggregate at (doc, run) grain, word
    * stats at vocabulary grain (one shuffle join back — never
    * broadcast-assumed), and the phrase rollup is phrase-grain. Nothing
    * pairwise, nothing corpus-global beyond the two dimension grains.
    */
  def rakeKeywords(docs: DataFrame, idCol: String, textCol: String,
                   stopwords: Seq[String], minWords: Int = 2,
                   maxWords: Int = 4, minCount: Long = 2L): DataFrame = {
    require(stopwords.nonEmpty && minWords >= 1 && maxWords >= minWords,
      s"bad rake params")
    val tok = Dedup.widen(docs)
      .select(col(idCol).as("doc"),
        posexplode(graft.functions.TextFunctions.tokens(lower(col(textCol)))))
      .withColumnRenamed("col", "w")
      .where(length(col("w")) > 0)
      .withColumn("stop", col("w").isin(stopwords: _*))
    val byDoc = Window.partitionBy(col("doc")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val members = tok
      .withColumn("run", sum(when(col("stop"), 1L).otherwise(0L)).over(byDoc))
      .where(!col("stop"))
      .select(col("doc"), col("run"), col("pos"), col("w"))
    val phrases = members
      .groupBy(col("doc"), col("run"))
      .agg(count(lit(1)).as("len"),
        expr("array_join(transform(array_sort(collect_list(struct(pos, w)))," +
          " s -> s.w), ' ')").as("phrase"))
      .where(col("len").between(minWords, maxWords))
    val kept = members.join(phrases.select(col("doc"), col("run"),
      col("len"), col("phrase")), Seq("doc", "run"))
    val stats = kept.groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
    val byRun = Window.partitionBy(col("doc"), col("run")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val occ = kept.join(stats, Seq("w"))
      .withColumn("cum", sum(col("deg").cast("double")
        / col("freq").cast("double")).over(byRun))
      .groupBy(col("doc"), col("run"))
      .agg(max(col("phrase")).as("phrase"), max_by(col("cum"), col("pos"))
        .as("score"))
    occ.groupBy(col("phrase"))
      .agg(count_distinct(col("doc")).as("n_docs"),
        count(lit(1)).as("n_occurrences"), max(col("score")).as("score"))
      .where(col("n_occurrences") >= minCount)
      .select(col("phrase"), col("n_docs"), col("n_occurrences"),
        round(col("score"), 6).as("score"))
  }
}
