package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Opinionated session bootstrap for the engine: AQE with skew-join
  * handling, the graft SQL functions registered, and the parquet nanos
  * escape hatch the test tables need.
  * `spark.sql.extensions=graft.expressions.GraftExtensions` achieves the
  * function registration declaratively instead.
  *
  * == The exchange-sizing rule ==
  *
  * A static `spark.sql.shuffle.partitions` makes per-partition pressure
  * grow LINEARLY with data, which is the one measured super-linear term in
  * SCALING.md's 10× curves (`dedup_ngram_jaccard`). The engine's
  * exchange-heavy operators therefore size their heavy exchanges from the
  * INPUT'S OWN byte statistics via [[GraftSession.sizedPartitions]]:
  *
  *   partitions = clamp(inputBytes · expansion / 64 MB,
  *                      floor = spark.sql.shuffle.partitions,
  *                      ceiling = floor × 16)
  *
  * Small input → exactly the configured floor (byte-identical plans and
  * timings to a static config); big input → partitions track bytes, so
  * per-partition memory stays bounded by the advisory target instead of
  * growing with data. `expansion` is the operator's measured fan-out from
  * its scanned bytes to its widest exchange (a tokenizer explodes
  * compressed text ~8×). Pinned by ExchangeSizingSpec.
  *
  * Two roads NOT taken, both measured: session-wide
  * `coalescePartitions.initialPartitionNum = floor × 16` relies on AQE to
  * coalesce back down, but every map task then writes ceiling-many shuffle
  * buckets (and `SQLConf.numShufflePartitions` starts REPORTING the
  * ceiling, silently inflating every explicit repartition site) — 3-4×
  * slower on the dedup pair joins at sf0.1; and raising
  * `shuffle.sort.bypassMergeThreshold` to match made it worse still
  * (512-way bypass writes). Operator-scoped sizing pays the extra buckets
  * only where and when the bytes justify them.
  */
object GraftSession {

  /** Ceiling multiplier over the parallelism floor in
    * [[sizedPartitions]] — bounds task-count blowup on a mis-estimated
    * input the same way the floor bounds starvation. At the ceiling a
    * box-sized config has absorbed a 16× data jump; past it, raise the
    * floor (more executors) rather than the multiplier.
    */
  val PartitionCeilingFactor = 16

  /** The parallelism FLOOR for the engine's EXPLICIT `repartition(n, …)`
    * sites — `spark.sql.shuffle.partitions` as configured, NOT
    * `SQLConf.numShufflePartitions`: under AQE with
    * `initialPartitionNum` set, numShufflePartitions reports that ceiling
    * instead, and a user-specified repartition is EXEMPT from AQE
    * coalescing — every explicit site that read it would silently pin 16×
    * the partitions of (usually small) data into uncoalescable exchanges.
    * Explicit repartitions exist precisely to FORCE the parallelism floor
    * against AQE's byte-based collapse of compute-dense narrow rows.
    */
  def parallelismFloor(spark: SparkSession): Int =
    spark.sessionState.conf.defaultNumShufflePartitions

  /** Self-sizing partition count for an exchange-heavy operator over
    * `input` (see the class doc): `clamp(bytes·expansion / target,
    * floor, floor × 16)`. `input` should be the operator's SCAN-LIKE
    * root (file sources report size cheaply and accurately; derived plans
    * fall back on coarse estimates — still clamped sane). `expansion` is
    * the operator's fan-out from scanned bytes to its widest exchange —
    * for compressed text flowing into posting/hash-set exchanges this is
    * large and measured, not guessed (jaccardPairsPrefix: ~128×).
    * `targetBytes` defaults to the AQE advisory (64 MB); COMPUTE-DENSE
    * exchanges — whose per-row cost is candidate emission or set merges,
    * not scanning — pass an order less (8 MB), because their partition
    * weight must bound WORK skew and sort spill, not raw scan bytes.
    */
  def sizedPartitions(input: DataFrame, expansion: Double = 1.0,
                      targetBytes: Long = 0L): Int =
    sizedPartitionsFromBytes(input.sparkSession,
      input.queryExecution.optimizedPlan.stats.sizeInBytes, expansion,
      targetBytes)

  /** The bytes-based core of [[sizedPartitions]] for callers that estimate
    * their exchange weight directly (e.g. a partition-pruned index probe:
    * relation bytes × pruned-directory fraction — plan stats cannot see
    * partition pruning on file sources, so the DataFrame form would
    * overestimate a small probe at the FULL index size).
    */
  def sizedPartitionsFromBytes(spark: SparkSession, bytes: BigInt,
                               expansion: Double = 1.0,
                               targetBytes: Long = 0L): Int = {
    val floor = parallelismFloor(spark)
    val target = if (targetBytes > 0) targetBytes
      else spark.sessionState.conf.getConf(
        org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES)
    val want = (BigDecimal(bytes) * expansion / BigDecimal(target.max(1L)))
      .setScale(0, BigDecimal.RoundingMode.CEILING)
    val ceil = BigDecimal(floor.toLong * PartitionCeilingFactor)
    want.max(BigDecimal(floor)).min(ceil).toInt
  }

  /** Re-plan `df` on a child session whose exchanges START at `parts`
    * (`coalescePartitions.initialPartitionNum`) instead of the floor — the
    * second half of the sizing rule, for an operator's IMPLICIT exchanges
    * (joins, windows, aggregates). AQE still owns the runtime decisions
    * within that budget: byte-based coalescing back down and — crucially —
    * skew-join splitting, which an explicit repartition on the join key
    * would forfeit (measured 3× slower on hot prefix tokens at sf0.1).
    * At `parts` == floor this is the identity — zero-cost at bench SF; the
    * child session shares the SparkContext, cache, and registered
    * functions (the [[operators.JaccardIndex]] maint-session pattern).
    */
  def sizedExchanges(df: DataFrame, parts: Int,
                     targetBytes: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    if (parts <= parallelismFloor(spark)) df
    else {
      val s = spark.newSession()
      s.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        parts.toString)
      // the advisory must shrink WITH the operator's target weight:
      // parallelismFirst coalescing targets max(min(bytes/floor, advisory),
      // minSize), so at the default 64 MB advisory AQE would fold the
      // sized exchanges straight back to the floor and the ceiling would
      // be a no-op (measured: identical x10 wall time until this was set)
      if (targetBytes > 0) {
        s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
          targetBytes.toString)
        // scale the skew-split trigger down with the target weight too: a
        // compute-dense join's "skewed" partition is one holding a hot
        // key's emission work (tens of MB), invisible to the default
        // 256 MB byte threshold — without this, a small-key-space join
        // (hot prefix tokens, hot LSH buckets) serializes its quadratic
        // emission inside a few partitions no matter how many exist
        s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          (targetBytes * 2).toString)
        s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      }
      org.apache.spark.sql.graft.bridge.ofRows(s, df.queryExecution.logical)
    }
  }

  /** The session-conf wiring [[builder]]/[[create]] apply — exposed so a
    * caller holding an EXISTING SparkContext (tests, notebook kernels) can
    * apply identical wiring to a `newSession()` instead of constructing —
    * and worse, stopping — a context-owning session of its own.
    *
    * The 64 MB advisory is the sizedPartitions target, aligned with AQE's
    * coalesce target so implicit and operator-sized exchanges agree on
    * what one partition should weigh. The 64k `minPartitionSize`: AQE
    * coalesces by shuffle BYTES, and compute-dense narrow rows (hash
    * sets, LSH postings) can collapse a heavy stage onto one task at the
    * default 1 MB floor — 64k keeps coalescing for genuinely empty
    * partitions while preserving parallelism for small-but-hot data.
    */
  def sessionConfs(shufflePartitions: Int): Seq[(String, String)] = Seq(
    "spark.sql.shuffle.partitions" -> shufflePartitions.toString,
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "64k",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // r20: task-commit renames (v2) instead of a single-threaded job-commit
    // walk of every task's partition dirs (v1) — the lifecycle queries
    // commit dozens of small partitioned generations per call, and the v1
    // job-commit walk is serial driver time on every one of them. The v2
    // caveat (a failed job can leave task outputs visible) is covered by
    // the engine's own commit protocols: every index/mirror generation is
    // invisible until the meta/manifest commit flips, so partially-written
    // b=K debris is never read (the JaccardIndex/IvfIndex/SyncManifest
    // contract).
    "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version" -> "2",
    // r20: ≤ this many dirs list on the driver thread instead of spawning
    // a distributed listing job — a 256-dir ANN index paid a 0.56 s
    // listing JOB per probe (measured); a local/HDFS driver lists 1024
    // dirs in milliseconds. Listing of genuinely huge partitioned tables
    // (> 1024 dirs) still goes distributed.
    "spark.sql.sources.parallelPartitionDiscovery.threshold" -> "1024",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true")

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    sessionConfs(shufflePartitions).foldLeft(
      SparkSession.builder().master(master)) {
      case (b, (k, v)) => b.config(k, v)
    }

  def create(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = builder(master, shufflePartitions).getOrCreate()
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    spark
  }
}
