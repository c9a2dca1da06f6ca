package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, key-stable sampling and splitting for training-data
  * pipelines. Unlike `df.sample` (seeded per partition — results change
  * with partitioning and Spark version), these derive the decision from the
  * key alone: the same row lands in the same split on every run, on every
  * cluster layout, and rows sharing a key never straddle a split (no
  * train/test leakage across a document's duplicates).
  *
  * The decider is a multiplicative hash of the key modulo 10_000 — plain
  * integer arithmetic, reproducible in any engine (the DuckDB oracle runs
  * the same formula verbatim).
  */
object Sampling {

  private final val Prime = 2654435761L // Knuth multiplicative constant

  /** Pseudo-random but deterministic bucket in [0, 10000) from a numeric key. */
  def keyBucket(key: Column): Column =
    pmod(key.cast("long") * Prime, lit(10000L))

  /** Keep ~`rate` of rows, stably by key. */
  def stableSample(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.where(keyBucket(key) < (rate * 10000).toLong)

  /** Tag rows with a train/test split, stably by key. */
  def splitByKey(df: DataFrame, key: Column, testFraction: Double): DataFrame =
    df.withColumn("is_test", keyBucket(key) < (testFraction * 10000).toLong)

  /** Exact-count stratified sample: within each stratum keep exactly
    * ⌈fraction · stratum size⌉ rows, chosen deterministically by hash order
    * (ties broken by the key, so the pick is total and reproducible in any
    * engine). Rate-based sampling drifts per stratum at small sizes; this
    * hits the quota exactly — the usual requirement when balancing language
    * or domain mixes in a training set.
    *
    * One shuffle keyed by the strata; within each stratum a window sort
    * (per-group work bounded by stratum size — for giant strata combine
    * with [[stableSample]] to pre-thin before exact balancing).
    */
  def stratifiedSample(df: DataFrame, strata: Seq[String], key: Column,
                       fraction: Double): DataFrame = {
    val byStratum = Window.partitionBy(strata.map(col): _*)
    val picked = byStratum.orderBy(keyBucket(key), key)
    df.withColumn("__rn", row_number().over(picked))
      .withColumn("__m", count(lit(1)).over(byStratum))
      .where(col("__rn") <= ceil(col("__m") * lit(fraction)))
      .drop("__rn", "__m")
  }

  /** Token-budget data mixing: within each stratum (language, domain, …)
    * keep documents in deterministic hash order while the stratum's running
    * token total stays within `budget`. This is the curation step that turns
    * "40% en, 15% de, …" mixture targets into an exact document list — the
    * budget is a hard cap per stratum, the hash order makes the pick
    * reproducible on any cluster layout, and the running total (`cum_tokens`)
    * is emitted so downstream packing can resume the count.
    *
    * One shuffle keyed by the strata; the per-stratum running sum is a
    * window whose partition is the stratum (never a global window). The
    * order key `(hash, key)` is total — `key` must be unique — so the
    * running-sum frame has no peer rows and the selection is exact in any
    * engine (the DuckDB oracle runs the same integer arithmetic verbatim).
    */
  def tokenBudgetMix(df: DataFrame, strata: Seq[String], key: Column,
                     tokens: Column, budget: Long): DataFrame = {
    val order = Window.partitionBy(strata.map(col): _*)
      .orderBy(keyBucket(key), key)
    df.withColumn("n_tokens", tokens.cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(order))
      .where(col("cum_tokens") <= budget)
  }

  /** Temperature-weighted data mixing (the multilingual-pretraining
    * rebalance of XLM-R / mT5, at α = 1/2): the total token budget is split
    * across strata ∝ √(stratum tokens) — upsampling small sources relative
    * to proportional sampling, without letting the head starve the tail —
    * then each stratum fills its allocation in the same deterministic
    * hash order as [[tokenBudgetMix]]. Emits `alloc_tokens` beside the
    * running `cum_tokens` so the mixture is auditable.
    *
    * Every step is ENGINE-EXACT integer arithmetic: stratum totals are
    * exact longs, the weight is the integer ⌊√tokens⌋ (sqrt is IEEE
    * correctly-rounded, its floor exact far beyond any real token count),
    * and the allocation is integer `(budget·w) div Σw` — no float shares
    * whose summation order could flip a boundary row. Shape: one stratum-
    * keyed aggregation (map-side combined), the weight normalization runs
    * on the STRATUM-CARDINALITY frame (the global window touches only
    * those rows), allocations broadcast back onto the per-stratum
    * running-sum window of [[tokenBudgetMix]].
    */
  def temperatureMix(df: DataFrame, strata: Seq[String], key: Column,
                     tokens: Column, totalBudget: Long): DataFrame = {
    require(totalBudget > 0, s"bad totalBudget=$totalBudget")
    val stats = df.groupBy(strata.map(col): _*)
      .agg(sum(tokens.cast("long")).as("_st"))
      .withColumn("_w", floor(sqrt(col("_st").cast("double"))).cast("long"))
    val alloc = stats
      .withColumn("_sw", sum(col("_w")).over())
      .withColumn("alloc_tokens", expr(s"($totalBudget * _w) div _sw"))
      .select(strata.map(col) :+ col("alloc_tokens"): _*)
    val order = Window.partitionBy(strata.map(col): _*)
      .orderBy(keyBucket(key), key)
    df.withColumn("n_tokens", tokens.cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(order))
      .join(broadcast(alloc), strata)
      .where(col("cum_tokens") <= col("alloc_tokens"))
  }

  /** Deterministic global shuffle for training epochs: every row gets a
    * stable, dense position `pos` ∈ [0, N) in a pseudo-random total order
    * (re-keyed per `seed`, so each epoch is a fresh permutation), plus a
    * round-robin `shard` = pos mod `numShards` whose sizes differ by at most
    * one. The order is a pure function of (key, seed) — the same corpus
    * shuffles identically on every run and engine.
    *
    * Scale: there is NO global window. Rows hash into `fanout` ordered
    * ranges; per-range counts (a bounded `fanout`-row collect) become prefix
    * offsets broadcast back in, and each range numbers its own rows with a
    * range-local window (~N/fanout rows per window partition). Global
    * position = range offset + local rank. `fanout` bounds both the driver
    * collect and the per-partition sort — raise it with corpus size.
    */
  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES,
    * Inf. Proc. Letters 2006): keep the k rows with the LARGEST
    * ln(u)/w — u a deterministic per-key uniform in (0,1] derived from
    * [[keyBucket]]'s integer hash, w > 0 the row's weight — which draws
    * each row with probability proportional to its weight, exactly the
    * length- or quality-proportional document pick a token-budgeted
    * training mix needs (Bernoulli thresholding, cf. `stableSample`,
    * cannot pin the SAMPLE SIZE; a weighted exact-k needs the A-ES keys).
    *
    * Deterministic: same keys and weights → same sample, any partitioning.
    * Scale shape: ONE distributed top-k (TakeOrdered — per-partition heaps
    * + a k-row merge, never a global sort); k rows land on the driver side
    * of the plan only as the query RESULT. Ties are broken by key.
    */
  /** The A-ES draw key ln(u)/w with u the deterministic keyBucket
    * uniform — shared by [[weightedSample]] and the maintained
    * [[SampleAgg]] so their draws agree row-for-row by construction.
    * Loud, not wrong: a negative weight would flip its key's SIGN and
    * deterministically win the top-k (ln u < 0), a zero/null weight
    * would silently never sample — corrupted weights fail the job
    * instead of corrupting the draw (the exact-or-loud convention).
    */
  private[operators] def esKey(key: Column, weight: Column): Column = {
    val u = (keyBucket(key) + lit(1L)).cast("double") / lit(10001.0)
    val w = weight.cast("double")
    val guarded = when(w.isNull || w <= 0.0,
      raise_error(concat(lit("weightedSample: weight must be > 0, got "),
        w.cast("string")))).otherwise(w)
    log(u) / guarded
  }

  def weightedSample(df: DataFrame, key: Column, weight: Column,
                     k: Int): DataFrame = {
    require(k > 0, s"k=$k")
    df.withColumn("__es", esKey(key, weight))
      .orderBy(col("__es").desc, key)
      .limit(k)
      .drop("__es")
  }

  /** Per-GROUP weighted sampling without replacement — k docs per
    * stratum drawn ∝ weight: the training-mix primitive combining
    * [[stratifiedSample]]'s per-source quotas with [[weightedSample]]'s
    * A-ES draw ("200 docs per source, length-weighted"). Same
    * deterministic [[esKey]] draw keys, ranked inside each group by one
    * key-partitioned `row_number` window ((es, key)-unique so the cut is
    * stable) — groups sample in parallel, nothing global sorts. Groups
    * smaller than k keep everything (the A-ES semantic).
    */
  def weightedSamplePerGroup(df: DataFrame, group: Column, key: Column,
                             weight: Column, k: Int): DataFrame = {
    require(k > 0, s"k=$k")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(group)
      .orderBy(col("__es").desc, key)
    df.withColumn("__es", esKey(key, weight))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__es", "__rk")
  }

  def globalShuffle(df: DataFrame, key: Column, seed: Long, numShards: Int,
                    fanout: Int = 256): DataFrame = {
    require(numShards > 0 && fanout > 0 && fanout <= 10000,
      s"numShards=$numShards fanout=$fanout out of range")
    // epoch-seeded bucket in [0, 10000); same arithmetic as keyBucket so the
    // oracle can reproduce it with plain integer ops
    val h = pmod((key.cast("long") + seed) * Prime, lit(10000L))
    // range id: monotone in h, so (range, h, key) orders identically to (h, key)
    val range = floor(col("__h") * fanout / lit(10000.0)).cast("int")
    val withRange = df.withColumn("__h", h).withColumn("__b", range)

    val spark = df.sparkSession
    import spark.implicits._
    // bounded collect: one count per range (≤ fanout rows), turned into
    // exclusive prefix offsets and broadcast back as a tiny dimension
    val counts = withRange.groupBy(col("__b")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (b, n)) => (b, acc + n) }
      .tail.zip(counts).map { case ((b, end), (_, n)) => (b, end - n) }
    val offDf = offsets.toSeq.toDF("__b", "__off")

    val local = Window.partitionBy(col("__b")).orderBy(col("__h"), key)
    withRange.join(broadcast(offDf), "__b")
      .withColumn("pos", col("__off") + row_number().over(local) - 1)
      .withColumn("shard", pmod(col("pos"), lit(numShards.toLong)))
      .drop("__h", "__b", "__off")
  }
}
