package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions.{lower, posexplode, split}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private lazy val docs = Seq(
    (0L, base, "en"),
    (1L, base, "en"),                               // exact duplicate of 0
    (2L, base.replace("today", "tomorrow"), "en"),  // near-duplicate of 0
    (3L, "completely different words about spark shuffles and partitions", "en"),
    (4L, "texte francais sans rapport avec les autres documents ici", "fr")
  ).toDF("doc_id", "text", "lang")

  test("exact dedup collapses identical content and keeps the smallest id") {
    val out = Dedup.exact(docs, "doc_id", "text")
    assert(out.count() == 4)
    val dup = out.where($"n_copies" === 2).as[(String, Long, Long)].collect()
    assert(dup.length == 1 && dup.head._2 == 0L)
  }

  test("containmentPairs finds directed subset duplicates (prefix-filtered path)") {
    val cdocs = Seq(
      (0L, "alpha beta gamma delta", "en"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "en"), // superset of 0
      (2L, "alpha beta", "en"),                                    // inside 0 and 1
      (3L, "iota kappa", "en"),                                    // disjoint
      (4L, "alpha beta gamma delta", "fr")                         // other block
    ).toDF("doc_id", "text", "lang")
    // full containment: every token of a inside b
    val full = Dedup.containmentPairs(cdocs, "doc_id", "text", "lang")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(full == Set((0L, 1L, 4L, 4L), (2L, 0L, 2L, 2L), (2L, 1L, 2L, 2L)))
    // rational threshold 1/2: the wider prefix re-finds pairs through
    // several tokens; the output must still be one row per directed pair
    val half = Dedup.containmentPairs(cdocs, "doc_id", "text", "lang", 1, 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(half == Set((0L, 1L, 4L, 4L), (0L, 2L, 4L, 2L), (1L, 0L, 8L, 4L),
      (2L, 0L, 2L, 2L), (2L, 1L, 2L, 2L)))
  }

  test("exactSurvivors keeps the smallest-id full row per content group") {
    val out = Dedup.exactSurvivors(docs, "doc_id", "text")
    assert(out.columns.toSeq == Seq("doc_id", "text", "lang", "n_copies"))
    val rows = out.as[(Long, String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1 (the exact copy) is dropped; its survivor 0 carries n_copies=2
    assert(rows.keySet == Set(0L, 2L, 3L, 4L))
    assert(rows(0L) == ((base, "en", 2L)))
    assert(rows(4L)._3 == 1L)
  }

  test("minhashLsh surfaces exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.forall { case (a, b) => a < b })
    assert(!pairs.exists { case (a, b) => b == 3L || b == 4L || a == 3L || a == 4L })
  }

  test("simhash is identical for identical docs and close for near-dups") {
    val sig = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(sig(0L) == sig(1L))
    val hamming = java.lang.Long.bitCount(sig(0L) ^ sig(2L))
    assert(hamming <= 16, s"near-dup hamming was $hamming")
    val far = java.lang.Long.bitCount(sig(0L) ^ sig(3L))
    assert(far > hamming)
  }

  test("simhashPairs returns near pairs within hamming budget") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("pigeonhole banding finds every hamming<=d pair, incl. flips in the top bits") {
    val maxDist = 8
    val rnd = new scala.util.Random(7)
    val bases = Seq.fill(50)(rnd.nextLong())
    // partner of base i = i with maxDist bits flipped INSIDE the top 16 —
    // the adversarial placement a single top-16-prefix band never pairs
    val sigs = bases.zipWithIndex.flatMap { case (s, i) =>
      val flipped = rnd.shuffle((48 until 64).toList).take(maxDist)
        .foldLeft(s)((acc, b) => acc ^ (1L << b))
      Seq((i * 2L, s), (i * 2L + 1L, flipped))
    }
    val found = Dedup.simhashPairsFromSigs(sigs.toDF("id", "simhash"), maxDist)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    for (i <- 0 until 50)
      assert(found.contains((i * 2L, i * 2L + 1L)), s"planted pair $i missed")
    // and nothing more or less than the brute-force truth: banding is a
    // guaranteed-recall screen and the hamming filter is exact
    val brute = (for {
      a <- sigs; b <- sigs if a._1 < b._1
      if java.lang.Long.bitCount(a._2 ^ b._2) <= maxDist
    } yield (a._1, b._1)).toSet
    assert(found == brute)
  }

  test("simhashPairsBlocked runs the signature kernels once: both join sides read the cache") {
    // planted near-dup pairs: a long shared template per pair, so the
    // result is NONEMPTY (an empty result lets AQE collapse the whole join
    // to EmptyRelation and there would be no plan left to inspect)
    val template = (0 until 30).map(j => s"tok$j").mkString(" ")
    val docs = (0 until 10).flatMap(p => Seq(
      (p * 2L, template + s" tail$p"),
      (p * 2L + 1L, template + s" tailx$p"))).toDF("doc_id", "text")
    val out = Dedup.simhashPairsBlocked(docs, "doc_id", "text", 8)
    assert(out.collect().nonEmpty) // materialize so the adaptive plan is final
    def cacheScans(p: org.apache.spark.sql.execution.SparkPlan): Int = p.collect {
      case _: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => 1
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        cacheScans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        cacheScans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        cacheScans(r.child)
    }.sum
    val n = cacheScans(out.queryExecution.executedPlan)
    // the kernel subtree lives only inside the shared InMemoryRelation — a
    // regression back to two live evaluations shows 0 cache scans here
    assert(n >= 2, s"expected both self-join sides to scan the persisted " +
      s"signature frame, found $n cache scans:\n${out.queryExecution.executedPlan}")
  }

  test("minhash pre-block keeps planted near-dups and cuts chance band collisions") {
    val maxDist = 16
    // 100 noise docs with fully disjoint vocabularies (simhash ~ random,
    // minhash never collides) + 3 planted near-dup pairs from a long
    // template (high Jaccard, small hamming)
    val template = (0 until 30).map(j => s"tok$j").mkString(" ")
    val noise = (0 until 100).map(i =>
      (100L + i, (0 until 12).map(j => s"n${i}w$j").mkString(" ")))
    val planted = (0 until 3).flatMap(p => Seq(
      (p * 2L, template + s" tail$p"),
      (p * 2L + 1L, template + s" tailx$p")))
    val all = (noise ++ planted).toDF("doc_id", "text")

    val blocked = Dedup.simhashPairsBlocked(all, "doc_id", "text", maxDist)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val unblocked = Dedup.simhashPairs(all, "doc_id", "text", maxDist)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    for (p <- 0 until 3)
      assert(blocked.contains((p * 2L, p * 2L + 1L)), s"planted pair $p missed")
    // the pre-block only ever REMOVES candidates; the hamming filter is
    // exact on both paths, so the emitted pairs nest
    assert(blocked.subsetOf(unblocked))

    // candidate-space accounting (the reason the composed key exists): count
    // pairs colliding in >=1 pigeonhole band, with and without the MinHash
    // band requirement — driver-side replication of both blocking keys
    val sigs = Dedup.simhash(all, "doc_id", "text")
      .select("id", "simhash").as[(Long, Long)].collect()
    val nb = maxDist + 1
    def bandsOf(sig: Long): Set[(Int, Long)] = (0 until nb).map { i =>
      val lo = i * 64 / nb
      val width = (i + 1) * 64 / nb - lo
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      (i, (sig >>> lo) & mask)
    }.toSet
    val simBands = sigs.map { case (id, s) => id -> bandsOf(s) }.toMap
    val mhBands = all.select($"doc_id",
        posexplode(graft.expressions.NativeFunctions.minhashBands(
          split(lower($"text"), " "), 3, 64, 16)))
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    val ids = sigs.map(_._1).sorted
    val pairs = for (a <- ids; b <- ids if a < b) yield (a, b)
    val simCand = pairs.count { case (a, b) =>
      (simBands(a) intersect simBands(b)).nonEmpty }
    val blockedCand = pairs.count { case (a, b) =>
      (simBands(a) intersect simBands(b)).nonEmpty &&
        (mhBands(a) intersect mhBands(b)).nonEmpty }
    assert(simCand > 20,
      s"fixture produced no chance band collisions to cut ($simCand)")
    assert(blockedCand * 5 < simCand,
      s"pre-block cut too little: $blockedCand of $simCand candidates remain")
  }

  test("ngramJaccardPairs computes exact word-set jaccard above threshold") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", 0.5)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((0L, 1L)) == 1.0)
    // doc2 swaps one of 11 distinct words: |∩|=10, |∪|=12
    assert(math.abs(pairs((0L, 2L)) - 10.0 / 12.0) < 1e-12)
    assert(!pairs.contains((0L, 3L)))
  }

  test("prefix-filtered jaccard has guaranteed recall: superset of every blocked variant") {
    import org.apache.spark.sql.functions.col
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id_a").cast("long"), col("id_b").cast("long"))
        .as[(Long, Long)].collect().toSet
    val pfx = pairSet(Dedup.jaccardPairsPrefix(real, "doc_id", "text", 0.8))
    val lang = pairSet(Dedup.ngramJaccardPairs(real, "doc_id", "text", "lang", 0.8))
    val band = pairSet(Dedup.jaccardPairsBanded(real, "doc_id", "text", 0.8))
    // prefix filtering provably loses no J>=t pair; semantic blocking misses
    // cross-block pairs and MinHash bands are probabilistic + bucket-capped
    assert((lang -- pfx).isEmpty, "prefix filter missed lang-blocked pairs")
    assert((band -- pfx).isEmpty, "prefix filter missed band-blocked pairs")
    assert(pfx.size >= band.size && band.size >= lang.size)
    // banding verifies exactly, so its pairs are all true >= 0.8 pairs
    val bandJac = Dedup.jaccardPairsBanded(real, "doc_id", "text", 0.8)
      .agg(org.apache.spark.sql.functions.min(col("jaccard"))).collect()(0).getDouble(0)
    assert(bandJac >= 0.8)
  }

  test("components groups transitively connected pairs under the min id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val comp = Dedup.components(pairs).as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("components handles a chain longer than one propagation hop") {
    val chain = (1L to 6L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("id_a", "id_b")
    val comp = Dedup.components(chain).as[(Long, Long)].collect().toMap
    assert(comp.values.toSet == Set(1L))
    assert(comp.keySet == (1L to 6L).toSet)
  }

  test("distributed label propagation agrees with the union-find fast path") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 4L), (7L, 9L), (9L, 8L), (8L, 20L))
      .toDF("id_a", "id_b")
    val unionFind = Dedup.components(pairs).as[(Long, Long)].collect().toMap
    val distributed = Dedup.components(pairs, smallGraphThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(unionFind == distributed)
    assert(unionFind(20L) == 7L && unionFind(4L) == 4L && unionFind(5L) == 4L)
  }

  test("incremental jaccard equals the full self-join restricted to pairs touching the batch") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val fresh = real.where(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = real.where(pmod(col("doc_id"), lit(7)) =!= 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id_a").cast("long"), col("id_b").cast("long"),
        col("jaccard")).as[(Long, Long, Double)].collect().toSet
    val incremental = pairs(
      Dedup.jaccardPairsIncremental(fresh, corpus, "doc_id", "text", 0.8))
    val full = pairs(Dedup.jaccardPairsPrefix(real, "doc_id", "text", 0.8))
      .filter { case (a, b, _) => a % 7 == 0 || b % 7 == 0 }
    assert(incremental == full)
    assert(incremental.nonEmpty)
    // probe-only: no corpus-corpus pair may appear
    assert(incremental.forall { case (a, b, _) => a % 7 == 0 || b % 7 == 0 })
  }

  test("distributed components: one action per round on a >2^20-edge graph") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val n = (1 << 20) + 1000 // just over the union-find gate → distributed path
    val pairs = spark.range(0, n)
      .select((col("id") * 2).as("id_a"), (col("id") * 2 + 1).as("id_b"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val comp = Dedup.components(pairs)
      assert(comp.where(col("comp") =!= col("id") - pmod(col("id"), lit(2))).count() === 0)
      // this all-2-node-component graph converges in 2 rounds. Budget:
      // edge-count probe + 2 × (one materializing round action) + the
      // verification count above, each fanning into a handful of AQE stage
      // jobs. Measured 15-17 with the single-action rounds; the old
      // per-round convergence probe or a per-partition fetch storm blows
      // well past this ceiling.
      assert(jobs.get() <= 24, s"too many jobs for 2 rounds: ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("keepCanonical keeps the highest-quality doc per cluster and all singletons") {
    val pairs = Seq((0L, 1L), (1L, 2L)).toDF("id_a", "id_b")
    val scored = Seq((0L, 0.2), (1L, 0.9), (2L, 0.5), (3L, 0.1))
      .toDF("doc_id", "quality")
    val out = Dedup.keepCanonical(scored, pairs, "doc_id", $"quality")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(0L) == (0L, false) && out(1L) == (0L, true) && out(2L) == (0L, false))
    assert(out(3L) == (3L, true)) // singleton kept
  }

  test("embeddingPairs finds same-direction vectors via LSH blocking") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.99f, 0.1f, 0f, 0f)), // nearly parallel to 0
      (2L, Array(-1f, 0f, 0f, 0f))      // opposite
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(vecs, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("banded embedding LSH recall is pinned vs brute-force cosine pairs") {
    import org.apache.spark.sql.functions.col
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val v = embs.select(col("vec_id").cast("long").as("id"), col("embedding").as("v"))
    val cos = graft.functions.VectorFunctions.cosine(col("l.v"), col("r.v"))
    val brute = v.as("l").join(v.as("r"), col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"), cos.as("c"))
      .where(col("c") >= 0.2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val banded = Dedup.embeddingPairs(embs, "vec_id", "embedding", 0.2,
        bitsPerBand = 4, bands = 32) // the query entry's parameters
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // precision 1.0 by construction (exact cosine verify)…
    assert((banded -- brute).isEmpty, "banded path emitted a sub-threshold pair")
    // …and recall follows the S-curve: 1-(1-p^4)^32 ≈ 0.97 at cos 0.2
    val recall = banded.size.toDouble / brute.size
    assert(brute.nonEmpty && recall >= 0.9,
      s"recall $recall (${banded.size}/${brute.size}) below the S-curve pin")
  }

  test("near-dup defaults find planted high-cosine duplicates") {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod, transform => htransform}
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    // plant a deterministic near-copy of every 5th vector: flip ~2% of mass
    val seeds = embs.where(pmod(col("vec_id"), lit(5)) === 0)
    val planted = seeds.select((col("vec_id") + 100000L).as("vec_id"),
      htransform(col("embedding"),
        (x, i) => x + (hash(i, col("vec_id")).cast("double") / 2147483648.0) * lit(0.05f)
      ).cast("array<float>").as("embedding"))
    val all = embs.unionByName(planted)
    val found = Dedup.embeddingPairs(all, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = seeds.select(col("vec_id")).as[Long].collect()
      .map(i => (i, i + 100000L)).toSet
    val hit = expected.count(found.contains).toDouble / expected.size
    assert(hit >= 0.95, s"only ${hit * 100}% of planted near-dups found")
  }

  test("dropDupSpans keeps the first occurrence corpus-wide, excises the rest, and is idempotent") {
    import spark.implicits._
    // doc 1 carries an 8-token span; doc 2 quotes it verbatim inside other
    // text; doc 3 is too short to carry any span; doc 4 repeats the span
    // INSIDE ITSELF (both occurrences after doc 1's — both excised)
    val span = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"intro $span outro"),
      (2L, s"alpha beta $span gamma delta"),
      (3L, "tiny doc"),
      (4L, s"$span and again $span")).toDF("doc_id", "text")
    val out = Dedup.dropDupSpans(docs, "doc_id", "text")
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1: first occurrence — untouched
    assert(out(1L) == ((s"intro $span outro", 0L)))
    // doc 2: the quoted window excised, fragments re-joined
    assert(out(2L) == (("alpha beta gamma delta", 8L)))
    // doc 3: shorter than n — untouched
    assert(out(3L) == (("tiny doc", 0L)))
    // doc 4: BOTH its occurrences are non-first. Overlapping removal
    // windows compound: every span occurrence of doc 4 is duplicated
    // (each 8-gram it contains appears in doc 1 or earlier in doc 4), so
    // coverage reaches the connector too — exactly Lee et al.'s
    // "remove the duplicated span" semantics, applied per window
    val (t4, n4) = out(4L)
    assert(!t4.contains("one two three four five six seven eight"))
    assert(n4 >= 16L, s"doc 4 removed only $n4 tokens: '$t4'")
    // idempotence on this corpus: a second pass removes nothing
    val second = Dedup.dropDupSpans(
      Dedup.dropDupSpans(docs, "doc_id", "text")
        .selectExpr("doc_id", "clean_text AS text"),
      "doc_id", "text")
      .as[(Long, String, Long)].collect()
    assert(second.forall(_._3 == 0L),
      s"second pass removed tokens: ${second.filter(_._3 > 0).toSeq}")
  }

  test("sentenceDedup removes corpus-frequent pieces, keeps order, empties loudly") {
    val docs = Seq(
      (1L, "FOO. alpha beta. BAR"),
      (2L, "FOO. gamma. BAR"),
      (3L, "FOO. delta"),
      (4L, "unique only"),
      (5L, "FOO")).toDF("doc_id", "text")
    def run(np: Int) =
      Dedup.sentenceDedup(docs.repartition(np), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).sortBy(_._1).toSeq
    val got = run(1)
    // "FOO" appears in 4 distinct docs → boilerplate; "BAR" in 2 → kept
    assert(got === Seq(
      (1L, 3L, 1L, "alpha beta. BAR"),
      (2L, 3L, 1L, "gamma. BAR"),
      (3L, 2L, 1L, "delta"),
      (4L, 1L, 0L, "unique only"),
      (5L, 1L, 1L, "")))
    assert(run(7) === got)
  }

  test("lossReport: exact and near stages attribute drops per source") {
    val t20 = (1 to 20).map(i => s"t$i").mkString(" ")
    val t19u = ((1 to 19).map(i => s"t$i") :+ "u1").mkString(" ")
    val docs = Seq(
      (1L, "A", t20),            // survivor
      (2L, "A", t20),            // exact dup of 1 (same fingerprint)
      (3L, "A", t19u),           // near dup: J = 19/21 ≈ 0.905 ≥ 0.9
      (4L, "B", "solo doc here") // untouched
    ).toDF("doc_id", "source", "text")
    val got = graft.operators.Dedup
      .lossReport(docs, "doc_id", "text", "source")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got("A") === ((3L, 1L, 1L, 1L, 0.333333)))
    assert(got("B") === ((1L, 0L, 0L, 1L, 1.0)))
    // at a tighter threshold the near pair no longer qualifies
    val strict = graft.operators.Dedup
      .lossReport(docs, "doc_id", "text", "source", threshold = 0.95)
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(strict("A") === 0L)
  }
}
