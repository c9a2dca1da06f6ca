package graft.operators

import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus deduplication for training-data pipelines: exact, MinHash+LSH,
  * SimHash, blocked n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design: nothing here is globally O(n²). Every pairwise comparison is
  * preceded by a blocking step (LSH band buckets, simhash prefix bands, or
  * caller-chosen blocking keys) so candidate generation is a hash-shuffle
  * self-join on the block key, and the quadratic work happens only inside
  * blocks. At 100 TB: block sizes are bounded by construction (band bits),
  * skewed blocks are handled by AQE skew-join splitting.
  */
object Dedup {

  /** The previous [[simhashPairsBlocked]] call's persisted signature frame,
    * unpersisted when the next call persists its own — see the method doc.
    */
  private val lastBlockedSigs =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  /** The previous [[semanticPairs]] call's persisted per-cluster size frame,
    * rotated the same way (at most one ≤k-row cache held per session).
    */
  private val lastSemSizes =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  /** The previous [[winnowPairs]] call's persisted fingerprint explosion,
    * rotated the same way.
    */
  private val lastWinnowFps =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  /** Rotate a freshly persisted frame into `slot`, best-effort unpersisting
    * the previous occupant (it may belong to a since-stopped session —
    * never fail THIS call, never swallow cancellation or VM errors).
    */
  private def rotateCache(
      slot: java.util.concurrent.atomic.AtomicReference[DataFrame],
      next: DataFrame): Unit =
    Option(slot.getAndSet(next)).foreach(prev =>
      try prev.unpersist(false) catch {
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); throw e
        case scala.util.control.NonFatal(_) => ()
      })

  /** At least the session's shuffle width of partitions before CPU-heavy
    * per-row kernels (shingling, MinHash, SimHash, winnowing): a small
    * corpus arriving as a single parquet row group otherwise serializes
    * embarrassingly parallel work onto one task. A no-op whenever the
    * source is already wider — any real-scale input.
    */
  private[operators] def widen(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val parts = graft.GraftSession.parallelismFloor(docs.sparkSession)
    // Partition-count probe (`.rdd`) only for scan-like plans, where
    // planning triggers no jobs. On a derived frame (joins/aggregates
    // upstream) the probe would finalize the adaptive plan and EXECUTE its
    // exchange stages, whose results are then discarded and recomputed by
    // the repartition below — so derived frames repartition unconditionally
    // (one small exchange, and they're the narrow-output shapes that need
    // re-spreading anyway).
    val scanLike = docs.queryExecution.logical.collectFirst {
      case p if !p.isInstanceOf[LeafNode] && !p.isInstanceOf[Project]
        && !p.isInstanceOf[Filter] && !p.isInstanceOf[SubqueryAlias] => p
    }.isEmpty
    if (!scanLike) docs.repartition(parts)
    else if (docs.rdd.getNumPartitions < parts) docs.repartition(parts)
    else docs
  }


  /** Exact dedup by canonical fingerprint: one row per distinct content,
    * keeping the smallest id — a single hash aggregation.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), TextFunctions.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup as a pipeline stage: the SURVIVING full rows — one copy
    * per distinct content (smallest id wins, matching [[exact]]) with its
    * duplicate count attached. This is the "drop the copies, keep one"
    * endpoint a training pipeline actually materializes, where [[exact]]
    * is its diagnostic twin (group sizes only).
    *
    * One hash aggregation, same as [[exact]]: rows are packed and the
    * winner picked with `min_by` per content fingerprint, so the shuffle
    * key is the 64-bit fingerprint (never the text itself) and partial
    * aggregation already discards losing copies map-side — the shuffle
    * carries at most one packed row per fingerprint per mapper at any
    * scale. The caller's column order is preserved, `n_copies` appended.
    */
  def exactSurvivors(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val packed = struct(docs.columns.map(col): _*)
    docs.groupBy(TextFunctions.fingerprint(col(textCol)).as("_fp"))
      .agg(min_by(packed, col(idCol)).as("_keep"), count(lit(1)).as("n_copies"))
      .select(docs.columns.map(c => col(s"_keep.$c")) :+ col("n_copies"): _*)
  }

  /** MinHash + banded LSH candidate pairs: docs sharing any band bucket.
    * bands×rowsPerBand = k. Returns (id_a, id_b, n_shared_bands) with
    * id_a < id_b.
    *
    * Shingling + signature + band digests all run inside the native
    * [[graft.expressions.TokenMinHash]] expression (primitive loop inside
    * codegen — the HOF formulation costs ~60 ms/row interpreted plus ~4 s of
    * janino compilation). Pairs are generated by grouping band buckets
    * and expanding within each bucket, so signatures are computed exactly
    * once and no self-join rescans the corpus; `maxBucket` caps degenerate
    * buckets (at 100 TB a hot bucket means near-identical boilerplate — cap
    * and handle separately rather than exploding quadratically).
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 k: Int = 64, bands: Int = 16, shingleWidth: Int = 3,
                 maxBucket: Int = 1000): DataFrame = {
    val banded = widen(docs).select(col(idCol).as("id"),
        posexplode(graft.expressions.NativeFunctions.minhashBands(
          split(lower(col(textCol)), " "), shingleWidth, k, bands)))
      .select(col("id"), col("pos").as("band"), col("col").as("bucket"))
    val buckets = banded.groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("id")).as("ids"))
      .where(size(col("ids")).between(2, maxBucket))
      // keep the m² pair expansion parallel under AQE coalescing (see
      // jaccardPairsBanded)
      .repartition(graft.GraftSession.parallelismFloor(docs.sparkSession),
        col("band"), col("bucket"))
    buckets.select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** 64-bit SimHash over word hashes: per bit, sum of ±1 votes from each
    * token's murmur3 hash; near-dups = small hamming distance. Returns
    * (id, simhash, band) where band is the top-16-bit prefix used as the
    * blocking key for a downstream hamming join.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // token hash is the fingerprint family's SQL-replicable polynomial
    // (PolyHash64) rather than xxhash64: same dispersion for the voting,
    // but an independent engine can replay the exact signature — which is
    // what moves dedup_simhash from rows-only to hash-green
    widen(docs).select(col(idCol).as("id"),
        transform(split(lower(col(textCol)), " "),
          t => graft.expressions.NativeFunctions.polyHash64(t)).as("hs"))
      .select(col("id"),
        graft.expressions.NativeFunctions.simhash64(col("hs")).as("simhash"))
      .withColumn("band", shiftrightunsigned(col("simhash"), 48))

  /** SimHash near-dup pairs with GUARANTEED recall at the hamming budget:
    * pigeonhole banding (the standard simhash blocking, cf. Manku et al.
    * 2007 "Detecting Near-Duplicates for Web Crawling"). The 64-bit
    * signature splits into maxDist+1 contiguous bands; hamming(a,b) ≤
    * maxDist means at most maxDist bands differ, so SOME band is
    * bit-identical and the pair meets in that band's equi-join — unlike a
    * single prefix band, which misses any pair whose flips touch it
    * (recall ≈ (48/64)^d for random flips at the old top-16 prefix).
    *
    * Scale note: band width is 64/(maxDist+1) bits, so the per-band key
    * space is 2^width — tight budgets (small maxDist) widen the bands and
    * the key space; at maxDist=8 each ~7-bit band has 128 buckets, so very
    * large corpora should lower maxDist or pre-block (e.g. by minhash band)
    * before the hamming screen.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 8): DataFrame =
    simhashPairsFromSigs(
      simhash(docs, idCol, textCol).select(col("id"), col("simhash")), maxDist)

  /** Pigeonhole-banded hamming join over precomputed (id, simhash) rows —
    * the pairing half of [[simhashPairs]], separable so recall can be
    * verified on crafted signatures.
    */
  /** The pigeonhole band decomposition of `simhash`: maxDist+1 (band, bv)
    * structs, band i covering bits [i*64/nb, (i+1)*64/nb) — widths differ
    * by ≤1 bit.
    */
  private def pigeonholeBands(maxDist: Int): Column = {
    require(maxDist >= 0 && maxDist < 64, s"bad maxDist=$maxDist")
    val nb = maxDist + 1
    array((0 until nb).map { i =>
      val lo = i * 64 / nb
      val width = (i + 1) * 64 / nb - lo
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      struct(lit(i).as("band"),
        shiftrightunsigned(col("simhash"), lo).bitwiseAND(lit(mask)).as("bv"))
    }: _*)
  }

  def simhashPairsFromSigs(sigs: DataFrame, maxDist: Int = 8): DataFrame = {
    val parts = graft.GraftSession.parallelismFloor(sigs.sparkSession)
    val banded = sigs.select(col("id"), col("simhash"),
        explode(pigeonholeBands(maxDist)).as("e"))
      .select(col("id"), col("simhash"), col("e.band").as("band"), col("e.bv").as("bv"))
    val hamming = bit_count(col("l.simhash").bitwiseXOR(col("r.simhash")))
    // explicit repartition: the signature table is byte-wise tiny and AQE
    // would coalesce the join's probe side onto one task that then runs
    // every in-bucket comparison serially (same trap as jaccardPairsBanded)
    banded.repartition(parts, col("band"), col("bv")).as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bv") === col("r.bv")
          && col("l.id") < col("r.id"))
      .where(hamming <= maxDist)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        hamming.as("hamming_dist"))
      .distinct() // a pair can meet in several identical bands
  }

  /** [[simhashPairs]] with a MinHash band PRE-BLOCK — the corpus-scale
    * variant. The pigeonhole join's per-band key space is fixed at
    * 2^(64/(maxDist+1)) buckets (128 at maxDist=8), so beyond ~millions of
    * docs every band bucket fills with chance collisions of UNRELATED
    * documents and the in-bucket pair expansion goes quadratic. Requiring
    * candidates to also share one of `bands` MinHash band buckets (the
    * [[minhashLsh]] blocking key, whose space scales with the corpus'
    * shingle diversity, not a fixed bit budget) cuts the candidate space to
    * content-plausible pairs; the hamming verification then runs inside
    * buckets that are near-dup-dense instead of noise-dense.
    *
    * The trade is MinHash recall: a pair inside the hamming budget is kept
    * only if it also collides in ≥1 MinHash band (probability
    * 1−(1−J^(k/bands))^bands, ≈1 for the high-Jaccard pairs simhash targets
    * at the defaults). One shuffle on the composed key; each doc explodes
    * into bands × (maxDist+1) small rows — the same order as running both
    * screens separately, without either's cross-noise candidates. A true
    * near-dup pair can meet in up to bands × (maxDist+1) = 144 (defaults)
    * band combinations before the final `distinct()` collapses them — the
    * multiplicity buys the recall; the join keys keep each meeting cheap.
    * The banded signature frame is PERSISTED across the self-join's two
    * sides, so the MinHash/SimHash kernels — the dominant cost at corpus
    * scale — run once per document, not once per side. The cache is
    * ROTATED, not leaked: each call unpersists the previous call's frame,
    * so a long-lived session holds at most one banded cache at a time. A
    * still-open OLDER result then recomputes through the plan's lineage —
    * slower, and correct for DETERMINISTIC sources (file-backed tables,
    * the intended input); over a non-deterministic source (a live JDBC
    * tail) the uncached self-join's two sides evaluate the lineage
    * independently and can observe different snapshots, losing the
    * single-evaluation guarantee — snapshot such sources to parquet first,
    * the same guidance as the probe sides of the persisted indexes.
    */
  def simhashPairsBlocked(docs: DataFrame, idCol: String, textCol: String,
                          maxDist: Int = 8, k: Int = 64, bands: Int = 16,
                          shingleWidth: Int = 3): DataFrame = {
    val parts = graft.GraftSession.parallelismFloor(docs.sparkSession)
    val toks = widen(docs).select(col(idCol).as("id"),
      split(lower(col(textCol)), " ").as("toks"))
    // one pass computes both signatures; each (minhash band, pigeonhole
    // band) combination becomes one row of the composed blocking key.
    // Token hash = PolyHash64, matching [[simhash]]: the family's ONE
    // signature definition, and the SQL-replicable one (the oracle replays
    // both signatures and the blocking exactly)
    val sigs = toks.select(col("id"),
        graft.expressions.NativeFunctions.simhash64(transform(col("toks"),
          t => graft.expressions.NativeFunctions.polyHash64(t))).as("simhash"),
        posexplode(graft.expressions.NativeFunctions.minhashBands(
          col("toks"), shingleWidth, k, bands)))
      .select(col("id"), col("simhash"),
        col("pos").as("mband"), col("col").as("mbucket"))
    val banded = sigs.select(col("id"), col("simhash"), col("mband"),
        col("mbucket"), explode(pigeonholeBands(maxDist)).as("e"))
      .select(col("id"), col("simhash"), col("mband"), col("mbucket"),
        col("e.band").as("band"), col("e.bv").as("bv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rotateCache(lastBlockedSigs, banded)
    val hamming = bit_count(col("l.simhash").bitwiseXOR(col("r.simhash")))
    banded.repartition(parts, col("mband"), col("mbucket"), col("band"), col("bv"))
      .as("l")
      .join(banded.as("r"),
        col("l.mband") === col("r.mband") && col("l.mbucket") === col("r.mbucket")
          && col("l.band") === col("r.band") && col("l.bv") === col("r.bv")
          && col("l.id") < col("r.id"))
      .where(hamming <= maxDist)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        hamming.as("hamming_dist"))
      .distinct() // a pair can meet in several band combinations
  }

  /** MOSS-style overlap pairs from winnowed rolling-hash fingerprints
    * ([[graft.expressions.RollingFingerprint]]): docs sharing at least
    * `minShared` fingerprints. Fingerprints whose document frequency
    * exceeds `maxDf` are dropped before pairing — ubiquitous substrings
    * (boilerplate, headers) otherwise create quadratic hot-key joins at
    * scale while carrying no dedup signal, exactly like stopwords in IDF.
    */
  def winnowPairs(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 16, w: Int = 32, minShared: Int = 3,
                  maxDf: Int = 50): DataFrame = {
    // the winnowing kernel (rolling hash over every char) is the expensive
    // leg and feeds THREE consumers (the df count and both self-join
    // sides) — pin its output once per call, rotated like the simhash
    // signature cache so at most one generation stays resident
    val ex = widen(docs).select(col(idCol).as("id"),
        explode(graft.expressions.NativeFunctions.rollingFingerprint(
          col(textCol), k, w)).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rotateCache(lastWinnowFps, ex)
    val rare = ex.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .where(col("df").between(2, maxDf)) // df=1 can't pair; df>maxDf is noise
    val pruned = ex.join(rare.select("fp"), "fp")
    pruned.as("l").join(pruned.as("r"),
        col("l.fp") === col("r.fp") && col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Per-document duplicated-span statistics — the exact-substring dedup
    * signal (Lee et al., "Deduplicating Training Data Makes Language Models
    * Better"): slide an `n`-token window over each doc and report, per doc,
    * how many of its spans also occur ANYWHERE else in the corpus
    * (including elsewhere in the same doc). Docs shorter than `n` tokens
    * have no spans and are omitted.
    *
    * Plan shape for 100 TB: one shuffle counts span occurrences, then ONLY
    * the spans with count > 1 are joined back — corpus-scale count-1 spans
    * (the overwhelming majority in a deduplicated corpus) never travel a
    * second time, and AQE broadcasts the duplicated-span list when it is
    * small. The per-doc rollup shuffles on the doc id it was already
    * exploded from.
    */
  def duplicatedSpanStats(docs: DataFrame, idCol: String, textCol: String,
                          n: Int = 8): DataFrame = {
    val toks = docs
      .select(col(idCol), split(col(textCol), " ").as("w"))
      .where(size(col("w")) >= n) // sequence(0, negative) would run DOWNWARD
    val grams = toks.select(col(idCol), explode(expr(
      s"transform(sequence(0, size(w) - $n), i -> concat_ws(' ', slice(w, i + 1, $n)))"))
      .as("gram"))
    val dup = grams.groupBy(col("gram")).agg(count(lit(1)).as("c"))
      .where(col("c") > 1)
    grams.join(dup, Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("c").isNotNull, 1L).otherwise(0L)).as("dup_grams"),
        round(sum(when(col("c").isNotNull, 1L).otherwise(0L)).cast("double")
          / count(lit(1)), 4).as("dup_frac"))
  }

  /** Exact-substring span REMOVAL — the transform half of
    * [[duplicatedSpanStats]], after Lee et al. 2022 ("Deduplicating
    * Training Data Makes Language Models Better"): every `n`-token span
    * that occurs more than once corpus-wide keeps its globally FIRST
    * occurrence (minimal (doc id, position)) and is EXCISED everywhere
    * else — a token goes if any removed occurrence's window covers it —
    * then the surviving tokens re-join into the cleaned text. Docs
    * shorter than `n` tokens pass through unchanged.
    *
    * Plan shape for 100 TB: one exploded-gram shuffle with a map-side-
    * combined (count, min-occurrence) aggregate; only grams with count > 1
    * travel back (the count-1 overwhelming majority drops before the
    * join); removed start positions roll up per doc (bounded by doc
    * length), and the excision itself is a per-row higher-order-function
    * walk — no second corpus shuffle beyond the doc-keyed join. Per-row
    * cost is O(tokens × removed windows): for a LONG document that is
    * almost entirely duplicated this approaches quadratic in its length —
    * an accepted corner, since such documents are exactly what the
    * upstream exact/near dedup passes delete outright, and the cost is
    * per-doc, never cross-doc.
    */
  def dropDupSpans(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 8): DataFrame = {
    // key by the ORIGINAL id column, not a cast-to-long: a non-numeric
    // string id would cast to null, silently bypass span removal (null
    // join keys never match) and lose its value in the output. min(struct)
    // orders any orderable id type, and for numeric ids the "globally
    // first" choice is unchanged.
    val toks = docs.select(col(idCol).as("id"),
      split(col(textCol), " ").as("w"))
    val grams = toks.where(size(col("w")) >= n)
      .select(col("id"), explode(expr(
        s"transform(sequence(1, size(w) - ${n - 1}), " +
          s"i -> struct(i AS i, concat_ws(' ', slice(w, i, $n)) AS gram))"))
        .as("g"))
      .select(col("id"), col("g.i").as("i"), col("g.gram").as("gram"))
    // duplicated grams with their globally-first occurrence — exact
    // integer/struct min, so "first" is engine-independent
    val dup = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("c"),
        min(struct(col("id"), col("i"))).as("first"))
      .where(col("c") > 1)
    val removed = grams.join(dup, Seq("gram"))
      .where(!(col("id") === col("first.id") && col("i") === col("first.i")))
      .select(col("id"), col("i"))
    val removedPerDoc = removed.groupBy(col("id"))
      .agg(sort_array(collect_list(col("i"))).as("starts"))
    toks.join(removedPerDoc, Seq("id"), "left")
      .withColumn("starts",
        coalesce(col("starts"), array().cast("array<int>")))
      .select(col("id").as(idCol),
        concat_ws(" ", expr(
          s"transform(filter(transform(w, (t, i) -> struct(t AS t, i + 1 AS p)), " +
            s"s -> NOT exists(starts, st -> s.p >= st AND s.p <= st + ${n - 1})), " +
            "s -> s.t)")).as("clean_text"),
        expr(s"size(filter(transform(w, (t, i) -> i + 1), " +
          s"p -> exists(starts, st -> p >= st AND p <= st + ${n - 1})))")
          .cast("bigint").as("n_removed"))
  }

  /** Asymmetric CONTAINMENT pairs (Broder): directed (a → b) pairs where
    * at least `num/den` of a's distinct tokens also occur in b — the
    * subset-duplicate signal Jaccard misses (a short doc quoted inside a
    * long one scores high containment but low Jaccard). The threshold is
    * a rational compared in INTEGER math (`shared·den ≥ |a|·num`), so the
    * cut is exact on any engine. Blocked by `blockCol` like
    * [[ngramJaccardPairs]]; at scale use an LSH band as the block.
    *
    * Candidates come from GUARANTEED-recall prefix filtering (the
    * containment variant of [[jaccardPairsPrefix]]'s construction): a
    * qualifying pair needs `req = ⌈|a|·num/den⌉` of a's tokens in b, so b
    * must contain at least one of a's `|a| − req + 1` RAREST tokens
    * (pigeonhole — ordering by ascending in-block document frequency, ties
    * by token). Only a's prefix postings join b's full postings on
    * (block, token) — at full containment the prefix is ONE token per doc,
    * collapsing the candidate space from "all pairs sharing any token"
    * (quadratic under a small shared vocabulary) to "pairs sharing a's
    * rarest token". Each candidate is verified with one allocation-free
    * [[graft.expressions.SortedOverlap]] merge over the docs' sorted hash
    * sets (position-filter abort at `req`), and the final distinct is
    * output-sized — a pair re-found via several prefix tokens verifies to
    * the same row. Shuffles at scale: in-block token df (vocabulary-
    * sized), per-doc rank window (keyed by doc), the prefix equi-join
    * (AQE splits skewed tokens), and the output-sized distinct.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       blockCol: String, num: Int = 1, den: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(num > 0 && den > 0 && num <= den, s"bad threshold $num/$den")
    val d = widen(docs).select(col(idCol).as("id"), col(blockCol).as("blk"),
      array_distinct(split(lower(col(textCol)), " ")).as("words"))
    val withSet = d.select(col("id"), col("blk"),
      size(col("words")).cast("bigint").as("n"), // bigint: len() is int64 in DuckDB
      sort_array(transform(col("words"), t => xxhash64(t))).as("wh"),
      col("words"))
    val tok = withSet.select(col("id"), col("blk"), col("n"), col("wh"),
      explode(col("words")).as("w"))
    val dfreq = tok.groupBy(col("blk"), col("w")).agg(count(lit(1)).as("df"))
    val req = floor((col("n") * num + (den - 1)) / den).cast("bigint")
    val byDoc = Window.partitionBy(col("id")).orderBy(col("df"), col("w"))
    val prefix = tok.join(dfreq, Seq("blk", "w"))
      .withColumn("rn", row_number().over(byDoc))
      .where(col("rn") <= col("n") - req + 1)
      .select(col("id").as("id_a"), col("blk"), col("w"),
        col("n").as("n_a"), col("wh").as("wh_a"), req.as("req"))
    val full = tok.select(col("id").as("id_b"), col("blk"), col("w"),
      col("wh").as("wh_b"))
    prefix.join(full, Seq("blk", "w"))
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), col("n_a"),
        graft.expressions.NativeFunctions
          .sortedOverlap(col("wh_a"), col("wh_b"), col("req")).as("shared"),
        col("req"))
      .where(col("shared") >= col("req"))
      .drop("req")
      .distinct()
  }

  /** Exact word-set Jaccard pairs within blocking buckets (`blockCol`), for
    * verifying the approximate paths: J(a,b) ≥ threshold, id_a < id_b.
    * The block key bounds the pair space; at scale use an LSH band as the
    * block instead of a semantic attribute.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        blockCol: String, threshold: Double): DataFrame = {
    // distinct word-hash set per doc, sorted once, so the per-pair Jaccard
    // is an allocation-free two-pointer merge (see SortedJaccard scaladoc).
    // r20: widened (the tokenize otherwise fuses into a single-split scan
    // task) and checkpoint-materialized ONCE — both self-join sides
    // otherwise re-ran the scan + set build (measured: two serial
    // 0.2 s single-task jobs per call at sf0.1)
    val withSet = widen(docs).select(col(idCol).as("id"), col(blockCol).as("blk"),
      sort_array(array_distinct(transform(split(lower(col(textCol)), " "),
        t => xxhash64(t)))).as("wh"))
      .localCheckpoint(true)
    val jac = graft.expressions.NativeFunctions.sortedJaccard(col("l.wh"), col("r.wh"), threshold)
    withSet.as("l").join(withSet.as("r"),
        col("l.blk") === col("r.blk") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"), jac.as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Exact word-set Jaccard self-join with GUARANTEED-recall scalable
    * blocking: prefix filtering (Chaudhuri et al. 2006 "A Primitive
    * Operator for Similarity Joins"; Bayardo et al. 2007 "Scaling Up All
    * Pairs Similarity Search"). Under a global token order — ascending
    * document frequency, ties by token — any two sets with J(a,b) ≥ t must
    * share at least one token within each set's first n − ⌈t·n⌉ + 1 tokens,
    * so joining on prefix tokens loses NO qualifying pair (unlike MinHash
    * bands, whose recall is probabilistic), while the block-key space is
    * the corpus vocabulary — it grows with the data instead of being a
    * fixed semantic attribute. Rare-first ordering keeps prefix buckets
    * small; candidates are then verified with the exact sorted-set merge.
    *
    * Three shuffles at scale: token df (vocabulary-sized aggregate),
    * per-doc rank (window over doc id — per-doc work bounded by doc
    * length), and the prefix-token equi-join; skewed prefix tokens are
    * split by AQE.
    */
  def jaccardPairsPrefix(docs: DataFrame, idCol: String, textCol: String,
                         threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // self-sizing (GraftSession class doc): the pair-join exchange carries
    // prefix postings WITH each doc's attached hash set — measured ~128×
    // the compressed scan bytes — and its per-partition cost is candidate
    // EMISSION (skewed by token group), so it targets 4 MB/partition, an
    // order under the scan advisory (swept 1/2/4/8 MB at 10×: 4 MB gave
    // the best wall with the 1× baseline unchanged). At bench SF this
    // lands on the floor (plan unchanged); at 10×+ the join fans wider
    // and skew-splits finer instead of deepening 32 fixed partitions —
    // the one measured super-linear term in SCALING.md r15 (r10 16× →
    // 11.9×, inside the n log n prediction)
    val parts = graft.GraftSession.sizedPartitions(docs, expansion = 128.0,
      targetBytes = 4L << 20)
    val src = widen(docs)
    val words = src.select(col(idCol).as("id"),
      array_distinct(split(lower(col(textCol)), " ")).as("words"))
    val tok = words.select(col("id"), size(col("words")).as("n"),
      explode(col("words")).as("w"))
    val dfreq = tok.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy(col("id")).orderBy(col("df"), col("w"))
    val prefix = tok.join(dfreq, "w")
      .withColumn("rn", row_number().over(byDoc))
      .where(col("rn") <= col("n") - ceil(col("n") * lit(threshold)) + 1)
      .select(col("id"), col("w"), col("rn"), col("n"))
    // attach each doc's (bounded, doc-length-sized) hash set to its prefix
    // postings BEFORE the self-join: verification then runs inline in the
    // join's codegen pipeline, so the only post-join shuffle carries the
    // surviving (id, id, jaccard) triples — never candidate rows with array
    // payloads. A pair sharing several prefix tokens is re-verified a few
    // times cheaply and collapsed by the final distinct, which is output-
    // sized; the alternative (distinct candidates, then re-join the sets)
    // shuffles the full candidate multiset plus two array-attach exchanges.
    val sets = words.select(col("id"),
      sort_array(array_distinct(transform(col("words"), t => xxhash64(t)))).as("wh"))
    val post = prefix.join(sets, "id")
    // PPJoin positional filter (Xiao et al. 2008), evaluated in the join
    // condition BEFORE any set merge: with the shared token at rank rn of
    // each prefix, the overlap can reach at most 1 + min(n_l − rn_l,
    // n_r − rn_r), and J ≥ t needs overlap·(1+t) ≥ t·(n_l+n_r). This prunes
    // hopeless candidates AND most repeat emissions of the same pair via
    // its later shared tokens (whose bound is tighter) with integer-only
    // arithmetic; a qualifying pair always survives through its first
    // shared prefix token, so recall is untouched.
    val ubound = (lit(1) + least(col("l.n") - col("l.rn"), col("r.n") - col("r.rn")))
      .cast("double") * lit(1.0 + threshold)
    val positional =
      ubound >= (col("l.n") + col("r.n")).cast("double") * lit(threshold) - lit(1e-6)
    val jac = graft.expressions.NativeFunctions.sortedJaccard(col("l.wh"), col("r.wh"), threshold)
    // EXPLICIT repartition of the probe side: AQE coalesces exchanges by
    // INPUT size, and a prefix-posting table small enough to coalesce to
    // one partition still fans out into tens of millions of joined rows —
    // measured as the whole verification stage running in a single task.
    // A user-specified repartition is exempt from coalescing, keeping the
    // explosive probe parallel at every scale (at sizes where AQE would
    // not coalesce anyway, this is one extra small exchange). The join's
    // own w-exchanges stay IMPLICIT — an explicit repartition on the join
    // key was measured 3× slower at sf0.1 because it exempts the join
    // from AQE's skew split, and hot prefix tokens are exactly the skew
    // case — so they are sized by [[graft.GraftSession.sizedExchanges]]
    // instead (initialPartitionNum = `parts` for THIS plan only).
    graft.GraftSession.sizedExchanges(
      post.repartition(parts, col("id")).as("l").join(post.as("r"),
        col("l.w") === col("r.w") && col("l.id") < col("r.id") && positional)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"), jac.as("jaccard"))
      .where(col("jaccard") >= threshold)
      .distinct(), parts, targetBytes = 4L << 20)
  }

  /** Incremental exact-Jaccard dedup: all J ≥ t pairs that TOUCH a newly
    * landed batch — (new × corpus) and (new × new) — without ever pairing
    * the corpus against itself. This is the dedup shape of a continuous
    * pipeline (the reference's whole premise): as CDC lands new documents
    * into the mirror, each batch is checked against the accumulated corpus,
    * paying O(batch) probe work instead of re-running the corpus self-join.
    *
    * Same guaranteed-recall construction as [[jaccardPairsPrefix]] (shared
    * document-frequency order across corpus ∪ batch, prefix postings,
    * positional filter, exact thresholded verification), but only the
    * batch's postings probe the join — corpus postings are index-side only.
    * Ids must be disjoint across the two inputs. Returns (id_a, id_b,
    * jaccard) with id_a < id_b.
    *
    * This one-shot form recomputes document frequency and corpus postings
    * per call — right for a single ad-hoc probe, a corpus rescan per batch
    * in a continuous pipeline. For batch-after-batch use, [[JaccardIndex]]
    * persists both relations next to the mirror and maintains them
    * additively, with results equal to this path by construction.
    */
  def jaccardPairsIncremental(newDocs: DataFrame, corpus: DataFrame,
                              idCol: String, textCol: String,
                              threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // same self-sizing as jaccardPairsPrefix (the shared posting/hash-set
    // exchange shape), sized from the CORPUS scan — the index side is what
    // grows; floor at bench SF, wider + finer-skew-split at 10×+
    val parts = graft.GraftSession.sizedPartitions(corpus, expansion = 128.0,
      targetBytes = 4L << 20)
    def tag(df: DataFrame, isNew: Boolean) =
      widen(df).select(col(idCol).as("id"), lit(isNew).as("isNew"),
        array_distinct(split(lower(col(textCol)), " ")).as("words"))
    // r20: words feeds THREE consumers (df counts, the prefix window, and
    // the verification hash sets) — un-materialized, each re-ran both
    // scans + the tokenize/array_distinct (measured: six serial
    // single-task scan jobs per call). One eager checkpoint, doc-sized.
    val words = tag(corpus, isNew = false).unionByName(tag(newDocs, isNew = true))
      .localCheckpoint(true)
    val tok = words.select(col("id"), col("isNew"), size(col("words")).as("n"),
      explode(col("words")).as("w"))
    val dfreq = tok.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val prefix = tok.join(dfreq, "w")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("w"))))
      .where(col("rn") <= col("n") - ceil(col("n") * lit(threshold)) + 1)
      .select(col("id"), col("isNew"), col("w"), col("rn"), col("n"))
    val sets = words.select(col("id"), sort_array(array_distinct(
      transform(col("words"), t => xxhash64(t)))).as("wh"))
    val post = prefix.join(sets, "id")
    val ubound = (lit(1) + least(col("l.n") - col("l.rn"), col("r.n") - col("r.rn")))
      .cast("double") * lit(1.0 + threshold)
    val positional =
      ubound >= (col("l.n") + col("r.n")).cast("double") * lit(threshold) - lit(1e-6)
    val jac = graft.expressions.NativeFunctions.sortedJaccard(col("l.wh"), col("r.wh"), threshold)
    // probe side = the batch's postings ONLY; a new×new pair is found from
    // both of its sides and collapsed by the final distinct
    graft.GraftSession.sizedExchanges(
      post.where(col("isNew")).repartition(parts, col("id")).as("l")
      .join(post.as("r"),
        col("l.w") === col("r.w") && col("l.id") =!= col("r.id") && positional)
      .select(least(col("l.id"), col("r.id")).as("id_a"),
        greatest(col("l.id"), col("r.id")).as("id_b"), jac.as("jaccard"))
      .where(col("jaccard") >= threshold)
      .distinct(), parts, targetBytes = 4L << 20)
  }

  /** Exact-Jaccard near-dup pairs at scale: banded-MinHash candidate
    * generation + exact sorted-set verification. Same output measure as
    * [[ngramJaccardPairs]] (distinct-word-set Jaccard ≥ threshold, id_a <
    * id_b), but the pair space is bounded by LSH band buckets — a
    * data-independent blocking whose cardinality grows with the corpus —
    * instead of a caller-chosen semantic attribute (a fixed-cardinality
    * block key ⇒ O(n²/|blocks|) pairs at scale).
    *
    * Width-1 shingles make the MinHash estimate and the exact verification
    * measure the same set (per-word hashes), so band recall follows the
    * standard S-curve: at k=64, bands=16 (4 rows/band) a J=0.8 pair shares
    * ≥1 band with prob 1-(1-0.8⁴)^16 ≈ 0.9998, while J≤0.4 noise pairs
    * almost never collide; `maxBucket` caps degenerate boilerplate buckets.
    * Candidates are verified with the exact two-pointer [[graft.expressions.SortedJaccard]]
    * merge, so every emitted pair is a TRUE ≥-threshold pair (banding only
    * affects recall, never precision).
    */
  def jaccardPairsBanded(docs: DataFrame, idCol: String, textCol: String,
                         threshold: Double, k: Int = 64, bands: Int = 16,
                         maxBucket: Int = 1000): DataFrame = {
    val toks = split(lower(col(textCol)), " ")
    val withSet = widen(docs).select(col(idCol).as("id"),
      sort_array(array_distinct(transform(toks, t => xxhash64(t)))).as("wh"),
      graft.expressions.NativeFunctions.minhashBands(toks, 1, k, bands).as("bnds"))
    val banded = withSet.select(col("id"), posexplode(col("bnds")))
      .select(col("id"), col("pos").as("band"), col("col").as("bucket"))
    // explicit repartition between the bucket aggregate and the pair
    // expansion: the agg output is byte-wise small, and AQE would coalesce
    // it to one task that then runs the m² explode AND the downstream
    // verification serially (the same trap as in [[jaccardPairsPrefix]];
    // user repartitions are exempt from coalescing)
    val parts = graft.GraftSession.parallelismFloor(docs.sparkSession)
    val cands = banded.groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("id")).as("ids"))
      .where(size(col("ids")).between(2, maxBucket))
      .repartition(parts, col("band"), col("bucket"))
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .distinct() // a pair sharing several bands is verified once
      // the distinct's reduce side is also byte-wise small and would be
      // coalesced into a single task pipelining ALL verification merges —
      // re-spread it so the merges run wide
      .repartition(parts, col("id_a"))
    val sets = withSet.select(col("id"), col("wh"))
    val jac = graft.expressions.NativeFunctions.sortedJaccard(col("l.wh"), col("r.wh"), threshold)
    cands.join(sets.as("l"), col("id_a") === col("l.id"))
      .join(sets.as("r"), col("id_b") === col("r.id"))
      .select(col("id_a"), col("id_b"), jac.as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Connected components over a near-dup pair list — turns pairwise
    * matches into dedup clusters. Alternating small-star label propagation:
    * every node repeatedly adopts the minimum label in its neighborhood
    * until fixpoint (the public large-star/small-star formulation of
    * map-reduce connected components, Kiveris et al. 2014). Each round is
    * one join + one min-aggregation; rounds needed = graph diameter, which
    * for near-dup clusters is tiny (dupes of a doc link to each other).
    * Each round materializes into a fresh cached RDD (truncating the
    * growing plan lineage) whose predecessor is released immediately.
    *
    * Returns (id, component) where component = min doc id in the cluster;
    * singleton docs are absent (they are their own component).
    */
  def components(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
                 maxRounds: Int = 10, smallGraphThreshold: Long = 1L << 20): DataFrame = {
    // persist: the pair generation upstream (LSH etc.) would otherwise run
    // once for the size probe and again for the traversal
    val edges = pairs.select(col(idA).cast("long").as("a"), col(idB).cast("long").as("b"))
      .persist()

    // Size-aware hybrid: after LSH blocking the pair graph is usually tiny
    // relative to the corpus; below the threshold (~16 MB of longs) a
    // driver-side union-find beats paying 3 shuffles × diameter rounds.
    // Above it, distributed label propagation takes over.
    val nEdges = edges.count()
    if (nEdges == 0) {
      val spark = pairs.sparkSession
      import spark.implicits._
      return Seq.empty[(Long, Long)].toDF("id", "comp")
    }
    if (nEdges <= smallGraphThreshold) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      // one collect(), one job: the threshold gate bounds this to ~16 MB of
      // longs. (toLocalIterator would schedule one job PER PARTITION — 32
      // sequential jobs to fetch a handful of rows.)
      edges.select(col("a"), col("b")).as[(Long, Long)].collect()
        .foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { // union by min so the root is the min id
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
          parent.getOrElseUpdate(a, find(a)); parent.getOrElseUpdate(b, find(b))
        }
      val out = parent.keys.toSeq.map(id => (id, find(id))).toDF("id", "comp")
      edges.unpersist()
      return out
    }

    val spark = pairs.sparkSession
    val undirected = edges.unionByName(
      edges.select(col("b").as("a"), col("a").as("b"))).distinct()
    var labels = undirected.select(col("a").as("id"))
      .union(undirected.select(col("b").as("id"))).distinct()
      .withColumn("comp", col("id"))
    var round = 0
    var converged = false
    var prevRound: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] = null
    while (round < maxRounds && !converged) {
      // each node adopts min(own comp, neighbors' comps)
      val neighborMin = undirected
        .join(labels.withColumnRenamed("id", "b").withColumnRenamed("comp", "bcomp"), "b")
        .groupBy(col("a").as("id")).agg(min(col("bcomp")).as("ncomp"))
      val next = labels.join(neighborMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"),
          col("comp").as("prev"))
      // ONE action per round: the materializing count ALSO tallies changed
      // labels into an accumulator, so convergence needs no second probe
      // job (accumulator overcount on task retry can only ADD a round,
      // never end one early). Rows are copied before caching (the scan
      // iterator reuses its row buffer); the previous round's cache is
      // released as soon as this one is materialized, so at most one
      // label set stays pinned — the one backing the returned frame, which
      // the ContextCleaner frees when the caller drops it.
      val changed = spark.sparkContext.longAccumulator("graft.components.changed")
      val materialized = org.apache.spark.sql.graft.bridge.toInternalRdd(next)
        .mapPartitions { it =>
          it.map { r => if (r.getLong(1) != r.getLong(2)) changed.add(1L); r.copy() }
        }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      materialized.count()
      if (prevRound != null) prevRound.unpersist(false)
      prevRound = materialized
      labels = org.apache.spark.sql.graft.bridge
        .internalCreateDataFrame(spark, materialized, next.schema)
        .select(col("id"), col("comp"))
      converged = changed.value == 0L
      round += 1
    }
    edges.unpersist()
    if (!converged)
      // a pair graph with diameter > maxRounds would silently yield split
      // components (and keepCanonical would keep several "canonical" docs
      // per true cluster) — make that loud instead of silent
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"Dedup.components: label propagation did NOT converge after $maxRounds rounds; " +
          "components may be split. Raise maxRounds for high-diameter pair graphs.")
    labels
  }

  /** Pipeline endpoint: collapse each near-dup cluster to its best document.
    * `quality` scores docs; within a component the max-quality doc (ties →
    * smallest id) is kept, and every kept/dropped decision is returned:
    * (id, component, keep). Docs in no pair are kept trivially.
    */
  def keepCanonical(docs: DataFrame, pairs: DataFrame, idCol: String,
                    quality: Column): DataFrame = {
    val comp = components(pairs)
    val scored = docs.select(col(idCol).cast("long").as("id"), quality.as("q"))
      .join(comp, Seq("id"), "left_outer")
      .withColumn("comp", coalesce(col("comp"), col("id")))
    val winners = scored.groupBy(col("comp"))
      .agg(max_by(col("id"), struct(col("q"), (-col("id")).as("tie"))).as("keep_id"))
    scored.join(winners, "comp")
      .select(col("id"), col("comp").as("component"),
        (col("id") === col("keep_id")).as("keep"))
  }

  /** Embedding near-dup pairs: cosine ≥ threshold among vectors sharing any
    * of `bands` random-hyperplane LSH buckets of `bitsPerBand` sign bits —
    * the OR-across-bands cosine-LSH construction (standard S-curve: a pair
    * with per-hyperplane agreement p = 1 − θ/π shares a band with prob
    * 1 − (1 − p^bitsPerBand)^bands). Unlike a single fixed-width signature,
    * recall is tunable via `bands` and the candidate space shrinks
    * geometrically in `bitsPerBand`: scale up by RAISING bitsPerBand (key
    * space bands × 2^bitsPerBand, within-bucket pairs ∝ n²/2^bitsPerBand
    * per band) and adding bands to hold recall. Defaults suit genuine
    * near-dup thresholds (≥0.8 cosine: recall ≈ 0.996 at 0.9); lower
    * thresholds need shallower bands (see the query entry, which passes
    * bitsPerBand=4, bands=32 for its 0.2 threshold — recall ≈ 0.97).
    *
    * Every emitted pair is exact-verified with one native cosine pass, so
    * banding affects recall only, never precision. `maxBucket` caps
    * degenerate buckets (at scale a hot bucket means mass-duplicated
    * embeddings — handle those by exact dedup first, not by a quadratic
    * explosion here).
    */
  def embeddingPairs(embs: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, bitsPerBand: Int = 8, bands: Int = 16,
                     maxBucket: Int = 4096): DataFrame = {
    val parts = graft.GraftSession.parallelismFloor(embs.sparkSession)
    val withBands = embs.select(col(idCol).as("id"), col(vecCol).as("v"),
      graft.expressions.NativeFunctions.hyperplaneBands(
        col(vecCol), bitsPerBand, bands).as("bnds"))
    val banded = withBands.select(col("id"), posexplode(col("bnds")))
      .select(col("id"), col("pos").as("band"), col("col").as("bucket"))
    // same AQE-coalescing countermeasures as jaccardPairsBanded: the bucket
    // aggregate and the candidate distinct are byte-wise tiny, and without
    // the explicit repartitions the m² expansion and the cosine verifies
    // would pipeline on a single coalesced task
    val cands = banded.groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("id")).as("ids"))
      .where(size(col("ids")).between(2, maxBucket))
      .repartition(parts, col("band"), col("bucket"))
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .distinct() // a pair sharing several bands is verified once
      .repartition(parts, col("id_a"))
    val vecs = withBands.select(col("id"), col("v"))
    val cos = VectorFunctions.cosine(col("l.v"), col("r.v"))
    cands.join(vecs.as("l"), col("id_a") === col("l.id"))
      .join(vecs.as("r"), col("id_b") === col("r.id"))
      .select(col("id_a"), col("id_b"), cos.as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** SemDeDup (Abbas et al. 2023): semantic near-dup pairs via
    * cluster-then-compare — spherical k-means partitions the embedding
    * space, then ONLY within-cluster pairs are cosine-scored exactly. The
    * published trade vs [[embeddingPairs]]' LSH banding: one clustering
    * pass replaces per-row band signatures, candidate work is
    * Σ|cluster|²/2 (choose k ∝ n/targetClusterSize; AQE splits skewed
    * clusters), and recall loss is exactly the near-dup pairs k-means
    * separates — high-cosine pairs co-assign by construction (both land on
    * their shared nearest centroid), which the spec pins on a clusterable
    * fixture.
    *
    * Scale shape: assignment is a projection (driver-bounded codebook
    * inside the native expression — corpus never shuffled to assign); the
    * self-join shuffles the corpus ONCE on cluster id; every emitted pair
    * is exact cosine, so precision is 1.0 regardless of clustering
    * quality.
    *
    * Clusters beyond `maxCluster` are excluded from pairing (a cluster
    * that size means mass-near-identical vectors — run exact dedup first),
    * but NEVER silently: the per-cluster size frame is persisted (≤ k
    * rows, cache ROTATED per call like [[simhashPairsBlocked]]'s — at
    * most one held per session) and eagerly probed before the pair plan
    * is returned, so a drop is always reported — `failOnOversized = true`
    * throws, the default logs a loud warning with the cluster/row counts.
    * The probe job does the (cid → count) aggregation the pairing would
    * have needed anyway, and the pairing reuses the persisted result, so
    * total corpus scans are unchanged. (An `observe` metric was rejected
    * for this: AQE's empty-relation propagation deletes CollectMetrics
    * nodes when the output is empty — precisely the all-dropped case that
    * most needs the signal.)
    */
  def semanticPairs(embs: DataFrame, idCol: String, vecCol: String,
                    threshold: Double, k: Int, iters: Int = 3,
                    maxCluster: Int = 1 << 16,
                    failOnOversized: Boolean = false): DataFrame = {
    val parts = graft.GraftSession.parallelismFloor(embs.sparkSession)
    val (ids, flat, dim) = Similarity.kmeansCentroids(embs, idCol, vecCol, k, iters)
    val assigned = embs.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("v"),
        element_at(Similarity.nearestOf(col(vecCol), ids, flat, dim, 1), 1).as("cid"))
      .repartition(parts, col("cid"))
    // degenerate-cluster guard, same contract as embeddingPairs.maxBucket:
    // a cluster beyond it means mass-identical vectors — exact-dedup first
    val sizes = assigned.groupBy(col("cid")).agg(count(lit(1)).as("csz"))
      .where(col("csz") >= 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rotateCache(lastSemSizes, sizes)
    val over = sizes.where(col("csz") > maxCluster)
      .agg(count(lit(1)).as("n"), sum(col("csz")).as("rows")).collect()(0)
    if (over.getLong(0) > 0) {
      val msg = s"semanticPairs: ${over.getLong(0)} cluster(s) exceed " +
        s"maxCluster=$maxCluster (${over.getLong(1)} rows excluded from " +
        "pairing) — exact-dedup the corpus first or raise maxCluster"
      if (failOnOversized) throw new IllegalStateException(msg)
      Console.err.println(s"[graft] WARN $msg")
    }
    val keep = sizes.where(col("csz") <= maxCluster).select(col("cid"))
    val inPlay = assigned.join(keep, "cid")
    val cos = VectorFunctions.cosine(col("l.v"), col("r.v"))
    inPlay.as("l").join(inPlay.as("r"),
        col("l.cid") === col("r.cid") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        round(cos, 4).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** Corpus-frequency sentence dedup — the CCNet/"paragraph hash" pass
    * (Wenzek et al. 2020) every open web-corpus pipeline runs before
    * training: a sentence appearing in ≥ `minDocs` DISTINCT documents is
    * boilerplate (cookie banners, nav bars, license footers) and is
    * removed from every document, preserving each document's remaining
    * sentence order. Complements [[dropDupSpans]] (which excises PAIRWISE
    * n-gram overlap): this pass is corpus-frequency-based and catches the
    * ten-thousand-document footer no pair enumeration should ever touch.
    *
    * Sentence unit = `". "`-separated pieces — a deterministic,
    * regex-engine-free split both engines reproduce byte-identically
    * (lookbehind sentence splitters are not RE2-expressible, and the
    * orthographic edge cases don't matter for an exact-match frequency
    * key). Matching is on the exact piece.
    *
    * Scale shape: explode to (doc, pos, piece) — linear; ONE grouped
    * count-distinct-docs per piece (the frequency frame is
    * corpus-vocabulary-scale, so the join back is a plain hash join, not
    * a broadcast); one regroup to docs. Nothing pairwise, nothing
    * quadratic: this is the pass that still works when the corpus holds
    * 10¹⁰ documents and one footer appears in 10⁸ of them.
    *
    * Output per document: n_sentences, n_removed, clean_text (possibly
    * empty — a fully-boilerplate doc keeps its row, loudly empty).
    */
  def sentenceDedup(docs: DataFrame, idCol: String, textCol: String,
                    minDocs: Int = 3): DataFrame = {
    require(minDocs >= 2, s"minDocs=$minDocs")
    val pieces = sentencePieces(docs, idCol, textCol)
    val boiler = pieces.groupBy(col("piece"))
      .agg(countDistinct(col("id")).as("df"))
      .where(col("df") >= minDocs)
      .select(col("piece"))
    removeBoiler(pieces, boiler).withColumnRenamed("id", idCol)
  }

  /** The `". "`-piece explode of [[sentenceDedup]] — shared with
    * [[BoilerplateIndex]] so the incremental path splits byte-identically.
    */
  private[operators] def sentencePieces(docs: DataFrame, idCol: String,
                                        textCol: String): DataFrame =
    widen(docs).select(col(idCol).as("id"),
      posexplode(split(col(textCol), "\\. ")).as(Seq("pos", "piece")))

  /** Drop every piece in `boiler` (a `piece` column) and rebuild each
    * document in original order — the removal half of [[sentenceDedup]].
    */
  private[operators] def removeBoiler(pieces: DataFrame,
                                      boiler: DataFrame): DataFrame = {
    val flagged = pieces
      .join(boiler.select(col("piece"), lit(true).as("is_boiler")),
        Seq("piece"), "left")
      .select(col("id"), col("pos"), col("piece"),
        coalesce(col("is_boiler"), lit(false)).as("drop"))
    flagged.groupBy(col("id"))
      .agg(count(lit(1)).as("n_sentences"),
        sum(when(col("drop"), 1L).otherwise(0L)).as("n_removed"),
        concat_ws(". ", expr(
          "transform(filter(array_sort(collect_list(named_struct(" +
            "'pos', pos, 'piece', piece, 'drop', drop))), " +
            "e -> NOT e.drop), e -> e.piece)")).as("clean_text"))
  }

  /** Per-group dedup survivorship report — the governance readout a corpus
    * curator signs off on before a training run: of each SOURCE's
    * documents, how many fall to exact dedup, how many of the exact
    * survivors fall to near-dedup, and what share survives both stages.
    * The per-source keep RATE is what sets mix weights downstream — a
    * source that loses 60% to boilerplate is not the source its raw row
    * count claims it is.
    *
    * Stage rules are the engine's own deterministic conventions: exact =
    * [[TextFunctions.fingerprint]] groups keep their min id; near = an
    * exact SURVIVOR with a J ≥ `threshold` partner of smaller id
    * ([[jaccardPairsPrefix]] — guaranteed recall, so the drop set is
    * exactly reproducible on any engine; pair-grain min-id, not
    * transitive components, so the rule is order-free and SQL-checkable).
    *
    * Scale shape: one fingerprint groupBy, the prefix pair join on the
    * deduped (strictly smaller) survivor set, one distinct of dropped
    * ids, and a group-grain final aggregate. Output: (group, n_docs,
    * n_exact_dropped, n_near_dropped, n_kept, keep_rate).
    */
  def lossReport(docs: DataFrame, idCol: String, textCol: String,
                 groupCol: String, threshold: Double = 0.9): DataFrame = {
    val base = docs.select(col(idCol).as("id"), col(groupCol).as("g"),
      col(textCol).as("text"),
      TextFunctions.fingerprint(col(textCol)).as("fp"))
    val keep = base.groupBy(col("fp")).agg(min(col("id")).as("keep_id"))
    val tagged = base.join(keep, "fp")
      .select(col("id"), col("g"),  col("text"),
        (col("id") =!= col("keep_id")).as("exact_dup"))
    val survivors = tagged.where(!col("exact_dup"))
    val nearDropped = jaccardPairsPrefix(
        survivors.select(col("id"), col("text")), "id", "text", threshold)
      .select(col("id_b").as("id")).distinct()
      .withColumn("near_dup", lit(true))
    tagged.join(nearDropped, Seq("id"), "left")
      .select(col("g"), col("exact_dup"),
        coalesce(col("near_dup"), lit(false)).as("near_dup"))
      .groupBy(col("g").as(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("exact_dup"), 1L).otherwise(0L)).as("n_exact_dropped"),
        sum(when(!col("exact_dup") && col("near_dup"), 1L).otherwise(0L))
          .as("n_near_dropped"),
        sum(when(!col("exact_dup") && !col("near_dup"), 1L).otherwise(0L))
          .as("n_kept"))
      .withColumn("keep_rate",
        round(col("n_kept").cast("double") / col("n_docs").cast("double"), 6))
  }
}
