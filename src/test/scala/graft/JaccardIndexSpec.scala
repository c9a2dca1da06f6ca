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
    val probe = idx.probe(batch, "doc_id", "text")
    // pruning loses nothing: equal to the one-shot recompute
    assert(pairs(probe) ==
      pairs(Dedup.jaccardPairsIncremental(batch, corpus, "doc_id", "text", 0.8)))
    // and it prunes at the SCAN: every corpus-relation scan carries a
    // partition filter on its hash-partition column, so file listing skips
    // non-matching p=J / q=J directories
    val root = probe.queryExecution.executedPlan
    val inner = root match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = inner.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    def scansOf(rel: String) = scans.filter(
      _.relation.location.rootPaths.exists(_.toString.endsWith(rel)))
    def prunedOn(rel: String, pc: String) = {
      val s = scansOf(rel)
      s.nonEmpty && s.forall(
        _.partitionFilters.exists(_.references.exists(_.name == pc)))
    }
    assert(prunedOn("/postings", "p"), "corpus postings scan not partition-pruned")
    assert(prunedOn("/sets", "q"), "corpus sets scan not partition-pruned")
  }
}
