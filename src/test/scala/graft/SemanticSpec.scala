package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.{Dedup, Similarity}

/** Distributed spherical k-means + SemDeDup cluster-then-compare dedup. */
class SemanticSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated direction clusters (pairwise cosine ≈ 0 across,
  // ≥ 0.99 within), four members each, ids grouped by hundred
  private def fixture() = {
    def jitter(base: Seq[Double], i: Int): Seq[Double] =
      base.zipWithIndex.map { case (x, j) => x + 0.01 * ((i + j) % 3) }
    val groups = Seq(
      (100L, Seq(1.0, 0.0, 0.0, 0.0)),
      (200L, Seq(0.0, 1.0, 0.0, 0.0)),
      (300L, Seq(0.0, 0.0, 1.0, 0.0)))
    groups.flatMap { case (base, dir) =>
      (0 until 4).map(i => (base + i, jitter(dir, i)))
    }.toDF("vec_id", "embedding")
  }

  test("kmeansFit recovers separated clusters with correct member counts") {
    val fit = Similarity.kmeansFit(fixture(), "vec_id", "embedding",
        k = 3, iters = 3)
      .as[(Long, Seq[Double], Long)].collect()
    assert(fit.length === 3)
    assert(fit.map(_._3).sorted.toSeq == Seq(4L, 4L, 4L))
    // each centroid points at exactly one of the three cluster directions
    val dirs = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0),
      Seq(0.0, 0.0, 1.0, 0.0))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val matched = fit.map(c => dirs.indexWhere(d => cos(c._2, d) > 0.95))
    assert(matched.forall(_ >= 0) && matched.distinct.length === 3,
      s"centroids did not align 1:1 with the planted directions: ${matched.toSeq}")
  }

  test("semanticPairs equals the brute-force cut when clusters are separable") {
    val df = fixture()
    val brute = df.as("l").join(df.as("r"),
        col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("id_a"), col("r.vec_id").as("id_b"),
        round(VectorFunctions.cosine(col("l.embedding"), col("r.embedding")), 4)
          .as("cos_sim"))
      .where(col("cos_sim") >= 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(brute.size === 18, s"fixture should give 3×C(4,2) pairs, got ${brute.size}")
    val got = Dedup.semanticPairs(df, "vec_id", "embedding", 0.9, k = 3,
        iters = 3)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == brute)
  }

  test("semanticPairs precision is exact and the cluster-size guard holds") {
    // 3 identical-direction vectors + 1 outlier; k=2 so the dup trio forms
    // one cluster — with maxCluster=2 the trio is guarded OUT (degenerate
    // mass-dup cluster), with the default it is found
    val df = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.001)), (3L, Seq(1.0, 0.002)),
      (9L, Seq(0.0, 1.0))).toDF("vec_id", "embedding")
    val full = Dedup.semanticPairs(df, "vec_id", "embedding", 0.99, k = 2,
        iters = 2).as[(Long, Long, Double)].collect()
    assert(full.map(p => (p._1, p._2)).toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(full.forall(_._3 >= 0.99))
    val guarded = Dedup.semanticPairs(df, "vec_id", "embedding", 0.99, k = 2,
        iters = 2, maxCluster = 2).collect()
    assert(guarded.isEmpty)
  }

  test("oversized-cluster drops are surfaced, never silent") {
    // same fixture as the guard test: with maxCluster=2 the dup trio's
    // cluster is excluded from pairing — the drop must be announced even
    // though the RESULT is empty (the case an AQE-pruned observe metric
    // would have lost)
    val df = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.001)), (3L, Seq(1.0, 0.002)),
      (9L, Seq(0.0, 1.0))).toDF("vec_id", "embedding")
    val errBuf = new java.io.ByteArrayOutputStream()
    val out = Console.withErr(errBuf) {
      // the warning fires at PLAN time (eager bounded probe), not at the
      // later action — a caller that never runs the frame still hears it
      val planned = Dedup.semanticPairs(df, "vec_id", "embedding", 0.99,
        k = 2, iters = 2, maxCluster = 2)
      planned.collect()
    }
    assert(out.isEmpty)
    val warned = errBuf.toString("UTF-8")
    assert(warned.contains("1 cluster(s) exceed maxCluster=2") &&
      warned.contains("3 rows"), s"missing drop warning, got: $warned")
    // a clean run stays quiet
    val errBuf2 = new java.io.ByteArrayOutputStream()
    val n = Console.withErr(errBuf2) {
      Dedup.semanticPairs(df, "vec_id", "embedding", 0.99, k = 2,
        iters = 2).count()
    }
    assert(n === 3L)
    assert(!errBuf2.toString("UTF-8").contains("maxCluster"))
    // the batch-pipeline hard gate names the cap and the mass behind it
    val e = intercept[IllegalStateException] {
      Dedup.semanticPairs(df, "vec_id", "embedding", 0.99, k = 2,
        iters = 2, maxCluster = 2, failOnOversized = true)
    }
    assert(e.getMessage.contains("maxCluster=2") && e.getMessage.contains("3 rows"))
    // and does not fire when nothing exceeds the cap
    assert(Dedup.semanticPairs(df, "vec_id", "embedding", 0.99, k = 2,
      iters = 2, failOnOversized = true).count() === 3L)
  }
}
