package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data-selection importance weights (Xie et al., "Data
  * Selection for Language Models via Importance Resampling", NeurIPS
  * 2023): score every document by how much its hashed n-gram feature
  * profile resembles a TARGET distribution versus the RAW pool it was
  * drawn from — the standard cheap proxy for "pick pretraining data that
  * looks like the domain I care about". Downstream, the weights feed the
  * existing samplers (`Sampling.temperatureMix` / quality sampling) as
  * the resampling distribution.
  *
  * Features are character bigrams hashed into `buckets` bins
  * (`(cp(c₁)·131 + cp(c₂)) mod buckets` over code points — portable to
  * any engine's `ord`/`ascii`; the multiplier must not be ±1 mod a
  * power-of-two bucket count, or consecutive-codepoint bigrams — the
  * bulk of alphabetic text's structure — collapse into two buckets),
  * bag-of-features per document. Both unigram
  * models are add-one smoothed over the bucket vocabulary; per-bucket
  * log-likelihood ratios are FROZEN to integer micro-nats
  * (`floor(10⁶·ln((ct_b+1)(T_r+B) / ((cr_b+1)(T_t+B))))` — one `ln` of a
  * ratio of exact int64 products), so each document's weight
  * `Σ_b count_b · lr_b` is an exact int64 sum: order-independent,
  * engine-exact, DuckDB-oracle-able. The only floating-point op in the
  * whole pipeline is that one `ln` per bucket (64 values), evaluated
  * identically from identical integers on both engines.
  *
  * Scale shape: one map-side explode of bigram buckets; one
  * (doc, bucket) hash aggregation (≤ `buckets` rows per doc); the
  * global feature models are a `buckets`-row aggregate that broadcasts
  * back. Nothing quadratic, no windows over the corpus. At 100 TB the
  * bucket models would be FIT on a bounded sample (they converge long
  * before the corpus ends) and broadcast as literals; the per-doc scoring
  * pass is unchanged.
  */
object Importance {

  /** Per-document DSIR weight. `isTarget` marks the rows defining the
    * target distribution (e.g. `col("lang") === "en"`, or a curated
    * subset flag). Documents with fewer than 2 characters carry no
    * bigrams and are dropped (declared). Returns
    * (doc_id, n_bigrams, w_micro_nats, avg_lognat) — `w_micro_nats` is
    * the exact integer total log-likelihood ratio in micro-nats,
    * `avg_lognat` its per-bigram mean in nats (the length-normalized
    * score DSIR ranks by).
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, buckets: Int = 64): DataFrame = {
    require(buckets >= 2, s"need at least 2 feature buckets, got $buckets")
    // feature extraction is the native one-pass CharBigramBuckets kernel —
    // code-point-identical to the declarative ascii(substring(…)) form the
    // oracle uses, but O(len) instead of O(len²) per document
    val feats = docs
      .where(length(col(textCol)) >= 2)
      .select(col(idCol).as("doc_id"), isTarget.as("tgt"),
        explode(graft.expressions.NativeFunctions.charBigramBuckets(
          col(textCol), buckets)).as("b"))
    // the (doc, bucket) grain is the ONLY aggregation of the exploded
    // stream; the global bucket models re-aggregate from it (identical
    // subtree → Spark reuses the exchange, the explode runs once — not
    // once per model)
    val perDoc = feats.groupBy(col("doc_id"), col("tgt"), col("b"))
      .agg(count(lit(1)).as("cnt"))
    val global = perDoc.groupBy(col("b"))
      .agg(sum(when(col("tgt"), col("cnt")).otherwise(0L)).as("ct"),
        sum(col("cnt")).as("cr"))
    val tots = global.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    // add-one smoothed LLR per bucket, frozen to integer micro-nats; the
    // ratio's numerator/denominator are exact int64 products cast once
    val lr = global.crossJoin(broadcast(tots))
      .select(col("b"),
        floor(log(
          ((col("ct") + lit(1L)) * (col("tr") + lit(buckets.toLong))).cast("double") /
            ((col("cr") + lit(1L)) * (col("tt") + lit(buckets.toLong))).cast("double")
        ) * lit(1000000.0)).cast("long").as("lr_micro"))
    perDoc.join(broadcast(lr), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        sum(col("cnt") * col("lr_micro")).as("w_micro_nats"))
      .select(col("doc_id"), col("n_bigrams"), col("w_micro_nats"),
        round(col("w_micro_nats").cast("double") /
          (lit(1000000.0) * col("n_bigrams").cast("double")), 6).as("avg_lognat"))
  }
}
