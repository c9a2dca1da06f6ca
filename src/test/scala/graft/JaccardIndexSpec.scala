package graft

import graft.operators.{Dedup, JaccardIndex}
import org.apache.spark.sql.functions.{col, lit, pmod}
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
    for (rel <- Seq("postings", "sets")) {
      spark.read.parquet(s"$dir/$rel").drop("b")
        .withColumn("id", col("id") + lit(1000000L))
        .write.parquet(s"$dir/$rel/b=5")
    }
    val got = pairs(JaccardIndex.load(spark, dir).probe(batch, "doc_id", "text"))
    // had the stray batch been read, every corpus-side match would repeat
    // against its shifted clone
    assert(got.nonEmpty)
    assert(!got.exists(p => p._1 >= 1000000L || p._2 >= 1000000L),
      "probe read an uncommitted batch directory")
  }
}
