package graft

import graft.operators.ClusterEval

class ClusterEvalSpec extends SparkSpec {
  import spark.implicits._

  test("centroidSilhouette: hand geometry, two tight separated clusters") {
    // label 0: (0,0), (0,2) → centroid (0,1); label 1: (10,0), (10,2) →
    // centroid (10,1). For every point a = 1, b = sqrt(101) → s = 1 −
    // 1/sqrt(101) = 0.9004962…, micro-floored to 900496 → mean 0.900496.
    val df = Seq(
      (0L, Array(0f, 0f), 0), (1L, Array(0f, 2f), 0),
      (2L, Array(10f, 0f), 1), (3L, Array(10f, 2f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = ClusterEval.centroidSilhouette(df, "vec_id", "embedding", "label")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(0L -> ((2L, 0.900496)), 1L -> ((2L, 0.900496))))
  }

  test("centroidSilhouette: overlapping clusters score near zero or below") {
    // label 0 at x≈0 and label 1 interleaved at x≈0.1: centroids nearly
    // coincide, so b barely beats (or loses to) a — the mean silhouette
    // must be far below the separated case, the signal the operator exists
    // to surface
    val df = Seq(
      (0L, Array(0f, 0f), 0), (1L, Array(0.1f, 1f), 0),
      (2L, Array(0.05f, 0f), 1), (3L, Array(0.05f, 1f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = ClusterEval.centroidSilhouette(df, "vec_id", "embedding", "label")
      .as[(Long, Long, Double)].collect().map(_._3)
    assert(got.forall(_ < 0.2), s"overlapping clusters scored $got")
  }

  test("centroidSilhouette: single label is undefined → empty, loudly") {
    val df = Seq((0L, Array(1f, 2f), 7), (1L, Array(3f, 4f), 7))
      .toDF("vec_id", "embedding", "label")
    assert(ClusterEval.centroidSilhouette(df, "vec_id", "embedding", "label")
      .count() === 0)
  }

  test("centroidSilhouette: refuses an unbounded codebook") {
    val df = (0 until 8).map(i => (i.toLong, Array(i.toFloat), i))
      .toDF("vec_id", "embedding", "label")
    val ex = intercept[IllegalArgumentException](
      ClusterEval.centroidSilhouette(df, "vec_id", "embedding", "label",
        maxLabels = 4))
    assert(ex.getMessage.contains("maxLabels"))
  }

  test("centroidSilhouette: result is partitioning-invariant (exact ints)") {
    val df = (0 until 40).map { i =>
      (i.toLong, Array(i % 7 * 0.31f, (i % 5) * 0.17f, i * 0.013f), i % 3)
    }.toDF("vec_id", "embedding", "label")
    val one = ClusterEval
      .centroidSilhouette(df.coalesce(1), "vec_id", "embedding", "label")
      .as[(Long, Long, Double)].collect().toSet
    val many = ClusterEval
      .centroidSilhouette(df.repartition(13), "vec_id", "embedding", "label")
      .as[(Long, Long, Double)].collect().toSet
    assert(one === many)
  }

  test("dbscanClassify: hand cluster geometry — core, border, noise") {
    // scale 1024; eps² = 3 grid units² → eps ≈ 0.0017 in float space.
    // Points quantize to integer grid coords: cluster {(0,0),(1,0),
    // (0,1),(1,1)} pairwise d² ≤ 2 → each has 4 neighbors (incl. self);
    // (2,2) is d²=2 from (1,1) only → 2 neighbors → border (touches the
    // core (1,1)); (100,100) is alone → noise.
    def v(x: Int, y: Int) = Array(x / 1024f, y / 1024f)
    val df = Seq(
      (0L, v(0, 0)), (1L, v(1, 0)), (2L, v(0, 1)), (3L, v(1, 1)),
      (4L, v(2, 2)), (9L, v(100, 100))
    ).toDF("vec_id", "embedding")
    val got = ClusterEval.dbscanClassify(df, "vec_id", "embedding",
      eps2 = 3L, minPts = 4)
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got(0L) == ((4L, "core")) && got(1L) == ((4L, "core")) &&
      got(2L) == ((4L, "core")))
    assert(got(3L) == ((5L, "core"))) // also reaches (2,2)
    assert(got(4L) == ((2L, "border")))
    assert(got(9L) == ((1L, "noise")))
  }

  test("dbscanClassify is partitioning-invariant; ragged dims throw " +
    "loudly") {
    val df = (1L to 60L)
      .map(i => (i, Array((i % 7).toFloat / 1024f, (i % 5).toFloat / 1024f)))
      .toDF("vec_id", "embedding")
    val a = ClusterEval.dbscanClassify(df.coalesce(1), "vec_id",
      "embedding", 4L, 5).collect().toSet
    val b = ClusterEval.dbscanClassify(df.repartition(11), "vec_id",
      "embedding", 4L, 5).collect().toSet
    assert(a == b && a.nonEmpty)
    val ragged = Seq((1L, Array(0f, 0f)), (2L, Array(0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      ClusterEval.dbscanClassify(ragged, "vec_id", "embedding", 4L, 2)
        .collect()
    }
    assert(ex.getMessage != null)
  }
}
