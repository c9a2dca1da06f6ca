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
}
