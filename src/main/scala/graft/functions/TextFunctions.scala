package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a training-data pipeline, built entirely from
  * codegen'd native Spark functions (no UDFs): token counting, quality
  * features, marker-based language ID, canonical fingerprinting.
  *
  * Everything here is a scalar `Column => Column` so it fuses into whatever
  * scan/projection the caller builds — at 100 TB these run inside
  * WholeStageCodegen over the document scan with zero extra shuffles.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token estimate: ~4 chars per subword token (the public
    * rule-of-thumb for byte-pair encoders).
    */
  def bpeTokenEstimate(text: Column): Column =
    ceil(length(text).cast("double") / 4.0).cast("long")

  /** BPE-ish regex tokenization: word pieces capped at 4 chars, digit runs,
    * and single punctuation marks — a cheap deterministic proxy for a
    * byte-pair encoder's segment count.
    */
  def bpeRegexTokens(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
      .cast("long")

  /** Adjacent whitespace-token pairs as "w1 w2" strings — the n=2 case of
    * the n-gram family used for collocation mining and contamination
    * screens. Pure array arithmetic (two slices zipped), so it stays
    * inside WholeStageCodegen; a single-token or empty document yields an
    * empty array.
    */
  def bigrams(text: Column): Column = {
    val w = tokens(text)
    zip_with(slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Count of punctuation characters. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  /** Number of tokens that are common-English stopwords. */
  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin("the", "a", "an", "and", "of", "to", "in", "is")))

  /** Stopword share of all tokens — a cheap fluency/quality signal. */
  def stopwordRatio(text: Column): Column =
    stopwordCount(text).cast("double") / tokenCount(text).cast("double")

  /** Composite quality heuristic in [0,1]-ish space: rewards stopword
    * presence and moderate length, penalizes punctuation soup.
    */
  def qualityScore(text: Column): Column =
    stopwordRatio(text) +
      when(length(text).between(100, 2000), 0.5).otherwise(0.0) -
      punctCount(text).cast("double") / length(text).cast("double")

  /** Marker-token hits for one language's marker set. */
  def markerHits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers: _*)))

  /** Tiny marker-list language ID (public n-gram/stopword heuristic,
    * cf. Cavnar & Trenkle 1994): argmax of per-language marker hits with a
    * fixed tie order. Returns the predicted language code.
    */
  def langId(text: Column): Column = {
    val en = markerHits(text, Seq("the", "a", "and", "of", "is"))
    val fr = markerHits(text, Seq("le", "la", "et", "les", "des"))
    val de = markerHits(text, Seq("der", "die", "und", "das", "ist"))
    val es = markerHits(text, Seq("el", "los", "las", "una", "es"))
    val best = greatest(en, fr, de, es)
    when(best === lit(0), "und")
      .when(en === best, "en")
      .when(fr === best, "fr")
      .when(de === best, "de")
      .otherwise("es")
  }

  /** PII regexes — RE2-compatible (no lookaround), so detection counts are
    * reproducible on any regex engine a downstream auditor uses. Public
    * scrubbing patterns of every open-corpus pipeline (e.g. what C4 / the
    * BigScience data tooling strip): emails, long digit runs that look
    * like phone numbers, dotted-quad IPs, SSN-shaped triples.
    */
  private[graft] val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ssn" -> "[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "ipv4" -> "([0-9]{1,3}\\.){3}[0-9]{1,3}",
    "phone" -> "\\+?[0-9][0-9() -]{6,}[0-9]")

  /** Per-category PII hit counts: a struct column
    * (email, ssn, ipv4, phone) of match counts in `text`. Categories are
    * counted INDEPENDENTLY over the original text, so a phone-shaped SSN
    * hits both counters — precedence between overlapping categories is
    * [[redactPii]]'s job, not the counters'. Pure codegen'd
    * `regexp_count` — fuses into the document scan.
    */
  def piiCounts(text: Column): Column =
    struct(PiiPatterns.map { case (name, re) =>
      regexp_count(text, lit(re)).cast("long").as(name)
    }: _*)

  /** Redact PII in place: each category's matches are replaced by a
    * `<CATEGORY>` tag. Order matters and is fixed — emails before phones
    * (a phone-shaped digit run inside a local part must not pre-empt the
    * email tag), SSNs and IPs before phones (both are phone-shaped).
    */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (t, (name, re)) =>
      regexp_replace(t, re, s"<${name.toUpperCase(java.util.Locale.ROOT)}>")
    }

  /** Canonical content fingerprint: md5 of the sorted distinct word set of
    * the lowercased text — stable under word reordering and duplication, the
    * classic "fingerprint" dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(split(lower(text), " "))), " "))

  /** Gopher-style repetition quality signals (Rae et al. 2021 §A1.1), the
    * repetition half of a corpus quality filter: per document, the share of
    * the most frequent word, the distinct-word ratio, and the share of the
    * most frequent word bigram. Heavily repetitive machine-generated or
    * boilerplate text scores high top-fractions / low distinct ratio.
    *
    * Unlike the scalar helpers above this is a DataFrame operator: the
    * signals need per-(doc, term) counts, which are two hash aggregations
    * keyed by document id (map-side combined, no per-doc state beyond the
    * aggregation buffers — any corpus size). Documents with fewer than two
    * words have no bigrams and report a null top_bigram_fraction.
    */
  /** The Gopher document-quality rules (Rae et al. 2021, Appendix A) as
    * one struct of per-rule verdicts + the composite `keep` — the
    * published rule set the open-corpus pipelines (Gopher/MassiveText,
    * RedPajama, Dolma) filter with. Every ratio test is a MULTIPLIED-OUT
    * integer compare (3n ≤ Σlen ≤ 10n, 10·alpha ≥ 8·n, 10·symbols < n) so
    * verdicts are engine-exact — no float thresholds. All rules evaluate
    * in one codegen'd projection over the scan; rules about lines
    * (bullet/ellipsis starts) are omitted as this corpus is single-line —
    * the remaining five are the word-shape core.
    *
    * Fields: n_words, ok_word_count (50..100000), ok_mean_word_len
    * (mean ∈ [3,10]), ok_symbol_ratio (#/… density < 10%), ok_alpha_words
    * (≥80% of words contain a letter), ok_stopwords (≥2 distinct of the
    * canonical 8), keep (AND).
    */
  def gopherSignals(text: Column): Column = {
    val ws = tokens(text)
    val n = size(ws).cast("long")
    val sumLen = aggregate(transform(ws, w => length(w).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val alphaWords = size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("long")
    val symbols = size(regexp_extract_all(text, lit("#|\\.\\.\\."), lit(0)))
      .cast("long")
    // Gopher's rule is "≥2 distinct words from a fixed stopword list";
    // the engine's canonical list (shared with stopwordCount) stands in
    // for the paper's 8 so the verdict discriminates on any corpus that
    // has function words at all
    val stops = size(array_intersect(array_distinct(ws),
      array(Seq("the", "a", "an", "and", "of", "to", "in", "is")
        .map(lit): _*)))
    val okCount = n.between(50L, 100000L)
    val okMeanLen = (sumLen >= n * 3L) && (sumLen <= n * 10L)
    val okSymbol = symbols * 10L < n
    val okAlpha = alphaWords * 10L >= n * 8L
    val okStops = stops >= 2
    struct(
      n.as("n_words"), okCount.as("ok_word_count"),
      okMeanLen.as("ok_mean_word_len"), okSymbol.as("ok_symbol_ratio"),
      okAlpha.as("ok_alpha_words"), okStops.as("ok_stopwords"),
      (okCount && okMeanLen && okSymbol && okAlpha && okStops).as("keep"))
  }

  def repetitionSignals(docs: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String): org.apache.spark.sql.DataFrame = {
    val ws = docs.select(col(idCol).as("doc_id"),
      split(lower(col(textCol)), " ").as("ws"))
    def topShare(terms: org.apache.spark.sql.DataFrame, termCol: String,
                 shareCol: String, extra: Seq[Column] = Nil) =
      terms.groupBy(col("doc_id"), col(termCol)).agg(count(lit(1)).as("n"))
        .groupBy(col("doc_id")).agg(
          (max(col("n")).cast("double") / sum(col("n"))).as(shareCol), extra: _*)
    val words = topShare(
      ws.select(col("doc_id"), explode(col("ws")).as("w")), "w",
      "top_word_fraction",
      Seq((count(lit(1)).cast("double") / sum(col("n"))).as("distinct_word_ratio")))
    val bigrams = topShare(
      ws.select(col("doc_id"), explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg")), "bg",
      "top_bigram_fraction")
    words.join(bigrams, Seq("doc_id"), "left_outer")
  }

  /** Alphabetic word count — the readability denominator ([A-Za-z]+ runs,
    * so "don't" counts 2 and digits/punct never inflate the word count).
    */
  def alphaWordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+"), lit(0))).cast("long")

  /** Sentence count for readability: runs of terminal punctuation, floored
    * at 1 so fragment-only docs divide by one sentence instead of zero.
    */
  def sentenceCount(text: Column): Column =
    greatest(size(regexp_extract_all(text, lit("[.!?]+"), lit(0))), lit(1))
      .cast("long")

  /** Deterministic syllable estimate: vowel-group runs ([aeiouy]+) across
    * the lowercased text, plus one for every all-consonant word ("rhythm"
    * minus its y's, acronyms) so each word contributes ≥ 1 — the standard
    * cheap heuristic; a dictionary pass is out of scope for a scan-fused
    * scalar and the Flesch formula only needs syllables/word to ~0.1.
    */
  def syllableEstimate(text: Column): Column =
    (size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0))) +
      size(filter(regexp_extract_all(lower(text), lit("[a-z]+"), lit(0)),
        w => !w.rlike("[aeiouy]")))).cast("long")

  /** Flesch reading ease (206.835 − 1.015·words/sentences −
    * 84.6·syllables/words), 4dp, NULL for wordless docs — the
    * quality-filter signal "is this prose or a symbol dump".
    */
  def fleschReadingEase(text: Column): Column = {
    val w = alphaWordCount(text).cast("double")
    val s = sentenceCount(text).cast("double")
    val sy = syllableEstimate(text).cast("double")
    when(w > 0.0, round(lit(206.835) - lit(1.015) * (w / s) -
      lit(84.6) * (sy / w), 4))
  }

  /** Encoding-damage counters, the mojibake screen a web-scrape pipeline
    * runs before training: U+FFFD replacement characters (decoder already
    * gave up), C0 control characters that never appear in clean text (all
    * but \t \n \r), and the UTF-8-read-as-Latin-1 digraph markers
    * (Ã/Â/â€ sequences — every non-ASCII UTF-8 char mis-decoded that way
    * starts with one). Returns the three counts as a struct; combine with
    * doc length for a rate threshold.
    */
  def mojibakeCounts(text: Column): Column = struct(
    size(regexp_extract_all(text, lit("\\uFFFD"), lit(0))).cast("long")
      .as("n_replacement"),
    size(regexp_extract_all(text,
      lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"), lit(0))).cast("long")
      .as("n_control"),
    size(regexp_extract_all(text,
      lit("\\u00C3[\\u0080-\\u00BF]|\\u00E2\\u20AC|\\u00C2[\\u00A0-\\u00BF]"),
      lit(0))).cast("long").as("n_latin1_marks"))
}
