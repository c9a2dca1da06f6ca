package graft

import graft.operators.{Dedup, JaccardIndex}
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
import java.nio.file.Files

class JaccardIndexSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id_a").cast("long"), col("id_b").cast("long"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet

  test("index probe equals the one-shot incremental path across consecutive batches") {
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val corpus = real.where(pmod(col("doc_id"), lit(7)) > 1)
    val batch1 = real.where(pmod(col("doc_id"), lit(7)) === 0)
    val batch2 = real.where(pmod(col("doc_id"), lit(7)) === 1)
    val dir = Files.createTempDirectory("graft_jidx").toString + "/idx"

    val idx = JaccardIndex.create(corpus, "doc_id", "text", 0.8, dir)
    // batch 1 probes the index; the returned pairs are consumed AFTER the
    // add committed — they must still reflect the probe-time index state
    val p1 = idx.probeAndAdd(batch1, "doc_id", "text")
    val got1 = pairs(p1)
    val want1 = pairs(Dedup.jaccardPairsIncremental(batch1, corpus, "doc_id", "text", 0.8))
    assert(got1 == want1)
    assert(got1.nonEmpty)

    // batch 2 probes through a RELOADED index (state resumed from disk) and
    // must see corpus ∪ batch1 — order keys frozen at each token's first
    // appearance, results still equal to the full recompute
    val reloaded = JaccardIndex.load(spark, dir)
    assert(reloaded.threshold == 0.8 && reloaded.batches == 2)
    val got2 = pairs(reloaded.probeAndAdd(batch2, "doc_id", "text"))
    val want2 = pairs(Dedup.jaccardPairsIncremental(
      batch2, corpus.unionByName(batch1), "doc_id", "text", 0.8))
    assert(got2 == want2)
    assert(JaccardIndex.load(spark, dir).batches == 3)
  }

  test("compact folds the three relations into one generation; probes byte-identical") {
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val corpus = real.where(pmod(col("doc_id"), lit(7)) > 1)
    val batch1 = real.where(pmod(col("doc_id"), lit(7)) === 0)
    val batch2 = real.where(pmod(col("doc_id"), lit(7)) === 1)
    val dir = Files.createTempDirectory("graft_jidx_cmp").toString + "/idx"
    val idx = JaccardIndex.create(corpus, "doc_id", "text", 0.8, dir)
    idx.add(batch1, "doc_id", "text")
    // 2 generations → 1; order keys are data, so the probe of batch2 must
    // be byte-identical before and after (and equal the full recompute)
    val before = pairs(Dedup.jaccardPairsIncremental(
      batch2, corpus.unionByName(batch1), "doc_id", "text", 0.8))
    idx.compact()
    assert(idx.base == 2 && idx.batches == 3)
    def gens(r: String) = new java.io.File(s"$dir/$r").listFiles()
      .map(_.getName).filter(_.startsWith("b=")).toSet
    // superseded generations retained one cycle (reader grace)
    assert(gens("postings") == Set("b=0", "b=1", "b=2"), gens("postings").toString)
    // a reloaded instance probes the folded generation identically
    val re = JaccardIndex.load(spark, dir)
    assert(re.base == 2 && re.batches == 3)
    val got = pairs(re.probeAndAdd(batch2, "doc_id", "text"))
    assert(got == before)
    assert(got.nonEmpty)
    // the NEXT compact (now holding the folded gen + batch2's) vacuums the
    // expired grace generations
    re.compact()
    assert(re.base == 4 && re.batches == 5)
    assert(Seq("tokens", "postings", "sets").forall(r =>
      gens(r).forall(_.drop(2).toInt >= 2)), "expired generations not vacuumed")
    // single live generation: a further compact is a no-op
    val (b0, bb0) = (re.base, re.batches)
    re.compact()
    assert(re.base == b0 && re.batches == bb0)
  }

  test("tokens first seen in a later batch pair correctly under their frozen order keys") {
    val corpus = Seq(
      (10L, "zyx wvu tsr qpo nml kji"), // vocabulary unseen anywhere else
      (20L, "alpha beta gamma delta epsilon zeta")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (11L, "zyx wvu tsr qpo nml kjj"),   // near-copy of 10: J = 5/7
      (12L, "foo bar baz qux quux corge"), // ALL-new vocabulary…
      (13L, "foo bar baz qux quux corgf")  // …near-copy inside the same batch
    ).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft_jidx_nv").toString + "/idx"
    val got = pairs(JaccardIndex.create(corpus, "doc_id", "text", 0.7, dir)
      .probeAndAdd(batch, "doc_id", "text"))
    assert(got.map(p => (p._1, p._2)) == Set((10L, 11L), (12L, 13L)))
    assert(got.forall(p => math.abs(p._3 - 5.0 / 7.0) < 1e-12))
  }

  test("uncommitted batch directories are invisible to readers") {
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val corpus = real.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val batch = real.where(pmod(col("doc_id"), lit(7)) === 0)
    val dir = Files.createTempDirectory("graft_jidx_torn").toString + "/idx"
    JaccardIndex.create(corpus, "doc_id", "text", 0.8, dir)
    // simulate a crash mid-add: stray b=5 data (clones of every corpus doc
    // under shifted ids) present on disk but never committed to the meta
    for ((rel, pc, keyOf) <- Seq(("postings", "p", col("w")), ("sets", "q", col("id")))) {
      spark.read.parquet(s"$dir/$rel").drop("b", pc)
        .withColumn("id", col("id") + lit(1000000L))
        .withColumn(pc, pmod(xxhash64(keyOf), lit(64)).cast("int"))
        .write.partitionBy(pc).parquet(s"$dir/$rel/b=5")
    }
    val got = pairs(JaccardIndex.load(spark, dir).probe(batch, "doc_id", "text"))
    // had the stray batch been read, every corpus-side match would repeat
    // against its shifted clone
    assert(got.nonEmpty)
    assert(!got.exists(p => p._1 >= 1000000L || p._2 >= 1000000L),
      "probe read an uncommitted batch directory")
  }

  test("load falls back to a complete meta tmp left by a torn commit") {
    val corpus = Seq((1L, "aa bb cc dd ee ff"), (2L, "aa bb cc dd ee fg"))
      .toDF("doc_id", "text") // J(1,2) = 5/7 ≥ 0.7
    val dir = Files.createTempDirectory("graft_jidx_meta").toString + "/idx"
    JaccardIndex.create(corpus, "doc_id", "text", 0.7, dir)
    // the writeMeta crash window: main file already deleted, rename not yet
    // run — only the COMPLETE tmp remains (data dirs fully committed)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = new org.apache.hadoop.fs.Path(dir, "_graft_jaccard_index.json")
    val tmp = new org.apache.hadoop.fs.Path(dir, "_graft_jaccard_index.json.tmp")
    assert(fs.rename(meta, tmp))
    val idx = JaccardIndex.load(spark, dir)
    assert(idx.threshold == 0.7 && idx.batches == 1)
    val got = pairs(idx.probe(
      Seq((3L, "aa bb cc dd ee fh")).toDF("doc_id", "text"), "doc_id", "text"))
    assert(got.map(p => (p._1, p._2)) == Set((1L, 3L), (2L, 3L)))
  }

  test("an empty corpus creates a loadable index; the first real batch self-pairs") {
    val dir = Files.createTempDirectory("graft_jidx_empty").toString + "/idx"
    val idx = JaccardIndex.create(Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", 0.7, dir)
    assert(idx.batches == 1)
    val batch = Seq((1L, "aa bb cc dd ee ff"), (2L, "aa bb cc dd ee fg"),
      (3L, "zz yy xx ww vv uu")).toDF("doc_id", "text")
    val got = pairs(JaccardIndex.load(spark, dir).probeAndAdd(batch, "doc_id", "text"))
    assert(got.map(p => (p._1, p._2)) == Set((1L, 2L)))
  }

  test("probe scans are partition-pruned to matching postings/sets directories") {
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val corpus = real.where(pmod(col("doc_id"), lit(7)) > 1)
    val batch = real.where(pmod(col("doc_id"), lit(7)) === 0)
    val dir = Files.createTempDirectory("graft_jidx_prune").toString + "/idx"
    val idx = JaccardIndex.create(corpus, "doc_id", "text", 0.8, dir, parts = 16)
    // capture EVERY execution the probe runs — the corpus postings scan now
    // executes inside the candidate-spill write, not in the returned plan
    val captured = scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.execution.SparkPlan]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit =
        captured.synchronized { captured += qe.executedPlan }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    // deep-collect: AQE nests the executed stages under leaf QueryStageExec
    // wrappers, and writes nest their query under command execs
    def scansIn(p: org.apache.spark.sql.execution.SparkPlan): Seq[
      org.apache.spark.sql.execution.FileSourceScanExec] = p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scansIn(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scansIn(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        scansIn(r.child)
    }.flatten
    def scans() = captured.synchronized(captured.toSeq).flatMap(scansIn)
    def batchSide(f: org.apache.spark.sql.execution.FileSourceScanExec) =
      f.partitionFilters.exists(_.exists {
        case eq: org.apache.spark.sql.catalyst.expressions.EqualTo =>
          eq.references.exists(_.name == "b")
        case _ => false
      })
    def prunedOn(rel: String, pc: String) = {
      // the batch side's own spill (under _probe/) is read whole by design —
      // only COMMITTED corpus relations must be scan-pruned
      val s = scans().filter(
        _.relation.location.rootPaths.exists(p =>
          p.toString.endsWith(rel) && !p.toString.contains("/_probe/")))
      s.exists(_.partitionFilters.exists(_.references.exists(_.name == pc))) &&
        s.forall(f => batchSide(f) ||
          f.partitionFilters.exists(_.references.exists(_.name == pc)))
    }
    spark.listenerManager.register(listener)
    val got = try {
      val out = pairs(idx.probe(batch, "doc_id", "text"))
      // QueryExecutionListener events are delivered asynchronously; wait
      // until the pruned corpus scans show up (bounded — on timeout the
      // asserts below report what was actually captured)
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline &&
        !(prunedOn("/postings", "p") && prunedOn("/sets", "q"))) Thread.sleep(100)
      out
    } finally spark.listenerManager.unregister(listener)
    // pruning loses nothing: equal to the one-shot recompute
    assert(got ==
      pairs(Dedup.jaccardPairsIncremental(batch, corpus, "doc_id", "text", 0.8)))
    // and it prunes at the SCAN: every corpus-relation read carries a
    // partition filter on its hash-partition column, so file listing skips
    // non-matching p=J / q=J dirs. The only unpruned scans allowed are the
    // batch side's own committed-b=K reads (one directory by construction).
    def report(rel: String) = s"captured=${captured.synchronized(captured.size)} plans; " +
      scans().filter(_.relation.location.rootPaths.exists(_.toString.endsWith(rel)))
        .map(f => s"$rel scan partitionFilters=${f.partitionFilters}").mkString("; ")
    assert(prunedOn("/postings", "p"),
      s"corpus postings scan not partition-pruned: ${report("/postings")}")
    assert(prunedOn("/sets", "q"),
      s"corpus sets scan not partition-pruned: ${report("/sets")}")
  }

  test("probe is deterministic by construction when the batch source is not") {
    val corpus = Seq((1L, "aa bb cc dd ee ff")).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft_jidx_nd").toString + "/idx"
    val idx = JaccardIndex.create(corpus, "doc_id", "text", 0.7, dir)
    // the live-JDBC-tail regime: every evaluation of the source yields a
    // DIFFERENT doc id for the same near-dup text
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val rdd = spark.sparkContext.parallelize(0 until 1, 1).mapPartitions { _ =>
      val n = JaccardIndexSpec.evals.incrementAndGet()
      Iterator(org.apache.spark.sql.Row(100L + n, "aa bb cc dd ee fg"))
    }
    val nd = spark.createDataFrame(rdd, schema)
    val p = idx.probe(nd, "doc_id", "text")
    val first = pairs(p)
    assert(first.size == 1 && first.head._1 == 1L,
      s"expected the single corpus near-dup pair, got $first")
    // the batch pipeline ran exactly once and was spilled: re-evaluating the
    // returned frame replays files, never the live source
    assert(pairs(p) == first, "probe result changed across evaluations")
    assert(JaccardIndexSpec.evals.get() == 1,
      s"batch source evaluated ${JaccardIndexSpec.evals.get()} times, want 1")
    // the spill never advanced the committed index
    assert(JaccardIndex.load(spark, dir).batches == 1)
    // ... and a real add afterwards simply overwrites the spill
    val got = pairs(JaccardIndex.load(spark, dir).probeAndAdd(
      Seq((200L, "aa bb cc dd ee fh")).toDF("doc_id", "text"), "doc_id", "text"))
    assert(got.map(q => (q._1, q._2)) == Set((1L, 200L)))
  }

  test("concurrent probers of one index dir never overwrite each other's spill") {
    val corpus = Seq((1L, "aa bb cc dd ee ff")).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft_jidx_multi").toString + "/idx"
    JaccardIndex.create(corpus, "doc_id", "text", 0.7, dir)
    val a = JaccardIndex.load(spark, dir)
    val b = JaccardIndex.load(spark, dir)
    val pa = a.probe(Seq((10L, "aa bb cc dd ee fg")).toDF("doc_id", "text"),
      "doc_id", "text")
    val firstA = pairs(pa)
    assert(firstA.map(p => (p._1, p._2)) == Set((1L, 10L)))
    // a second prober of the SAME committed dir (another instance — the same
    // per-instance spill path isolates other processes, which share the
    // committed b=K namespace) probes a disjoint batch while A's frame is
    // still open
    val pb = b.probe(Seq((20L, "zz yy xx ww vv uu"), (21L, "zz yy xx ww vv ut"))
      .toDF("doc_id", "text"), "doc_id", "text")
    assert(pairs(pb).map(p => (p._1, p._2)) == Set((20L, 21L)))
    // A's plan reads A's private spill: re-evaluation is unaffected by B
    assert(pairs(pa) == firstA,
      "a foreign probe's spill corrupted this probe's open plan")
  }

  test("add runs a bounded driver-job chain (the build-latency budget)") {
    // the MaterializedJoinSpec pattern: wall-clock on this box is noise,
    // driver-job count is not. An add = the batch materialize + the
    // order-key/vocabulary jobs of prepare + 3 concurrent relation writes
    // in the AQE-off maintenance session — measured 11. AQE regressing
    // into the build lanes (a job per exchange of every small plan) shows
    // as a jump well past the headroom below.
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val dir = Files.createTempDirectory("graft_jidx_budget").toString + "/idx"
    val idx = JaccardIndex.create(
      real.where(pmod(col("doc_id"), lit(5)) > 0), "doc_id", "text", 0.8, dir)
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      idx.add(real.where(pmod(col("doc_id"), lit(5)) === 0), "doc_id", "text")
      Thread.sleep(500) // listener delivery lag; starts precede add's return
    } finally spark.sparkContext.removeSparkListener(listener)
    val jobs = counter.get()
    assert(jobs <= 15, s"index add ran $jobs driver jobs — the build-latency " +
      "budget (materialize + prepare + 3 AQE-off writes, measured 11) has " +
      "regressed")
  }

  test("load tells format skew apart from corruption") {
    val dir = Files.createTempDirectory("graft_jidx_fmt").toString + "/idx"
    JaccardIndex.create(Seq((1L, "aa bb cc")).toDF("doc_id", "text"),
      "doc_id", "text", 0.7, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def rewriteMeta(json: String): Unit = {
      val out = fs.create(
        new org.apache.hadoop.fs.Path(dir, "_graft_jaccard_index.json"), true)
      try out.write(json.getBytes("UTF-8")) finally out.close()
    }
    // the old un-partitioned layout: parseable meta, no fmt/parts fields —
    // an incompatible format, not corruption
    rewriteMeta("""{"threshold":0.7,"batches":1}""")
    val old = intercept[IllegalStateException](JaccardIndex.load(spark, dir))
    assert(old.getMessage.contains("rebuild with create()"), old.getMessage)
    // a future layout this build does not read
    rewriteMeta("""{"fmt":99,"threshold":0.7,"parts":64,"batches":1}""")
    val fut = intercept[IllegalStateException](JaccardIndex.load(spark, dir))
    assert(fut.getMessage.contains("fmt 99") &&
      fut.getMessage.contains("rebuild with create()"), fut.getMessage)
    // half a meta really is corruption
    rewriteMeta("""{"threshold":0.7""")
    val bad = intercept[IllegalStateException](JaccardIndex.load(spark, dir))
    assert(bad.getMessage.contains("corrupt"), bad.getMessage)
  }

  test("createWithFirstSync is byte-equal to create + probeAndAdd, on disk too") {
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val corpus = real.where(pmod(col("doc_id"), lit(7)) > 1)
    val batch1 = real.where(pmod(col("doc_id"), lit(7)) === 0)
    val batch2 = real.where(pmod(col("doc_id"), lit(7)) === 1)
    val dSeq = Files.createTempDirectory("graft_jseq").toString + "/idx"
    val dFus = Files.createTempDirectory("graft_jfus").toString + "/idx"

    val seqPairs = pairs(JaccardIndex.create(corpus, "doc_id", "text", 0.8, dSeq)
      .probeAndAdd(batch1, "doc_id", "text"))
    val (fused, firstSync) = JaccardIndex.createWithFirstSync(
      corpus, batch1, "doc_id", "text", 0.8, dFus)
    assert(pairs(firstSync) == seqPairs && seqPairs.nonEmpty)
    assert(fused.batches == 2 && fused.base == 0)

    // the committed state must be indistinguishable: a LATER batch probed
    // through a reload of each index returns identical pairs
    val next1 = pairs(JaccardIndex.load(spark, dSeq)
      .probeAndAdd(batch2, "doc_id", "text"))
    val next2 = pairs(JaccardIndex.load(spark, dFus)
      .probeAndAdd(batch2, "doc_id", "text"))
    assert(next1 == next2 && next1.nonEmpty)
  }
}

object JaccardIndexSpec {
  /** Evaluation counter for the non-deterministic-source fixture. */
  val evals = new java.util.concurrent.atomic.AtomicInteger()


}
