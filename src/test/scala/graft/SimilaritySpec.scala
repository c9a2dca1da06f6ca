package graft

import graft.functions.VectorFunctions
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (0L, Array(1f, 0f, 0f)),
    (1L, Array(0.9f, 0.1f, 0f)),
    (2L, Array(0f, 1f, 0f)),
    (3L, Array(0f, 0.9f, 0.1f)),
    (4L, Array(-1f, 0f, 0f))
  ).toDF("vec_id", "embedding")

  test("cosine matches a hand-computed value") {
    val c = corpus.where($"vec_id" === 0)
      .crossJoin(corpus.where($"vec_id" === 1).select($"embedding".as("e2")))
      .select(VectorFunctions.cosine($"embedding", $"e2")).as[Double].head()
    val expected = 0.9 / math.sqrt(0.9 * 0.9 + 0.1 * 0.1)
    assert(math.abs(c - expected) < 1e-6)
  }

  test("bruteForceTopK ranks by cosine, excludes self, returns k rows per query") {
    val out = Similarity.bruteForceTopK(corpus, corpus.where($"vec_id" < 2),
      "vec_id", "embedding", 2)
      .as[(Long, Long, Long)].collect()
    val byQuery = out.groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    assert(byQuery(0L) == Seq(1L, 2L) || byQuery(0L).head == 1L)
    assert(byQuery(1L).head == 0L)
    assert(out.forall { case (q, c, _) => q != c })
    assert(out.groupBy(_._1).forall(_._2.length == 2))
  }

  test("lshTopK returns ranked candidates from matching buckets only") {
    val out = Similarity.lshTopK(corpus, corpus.where($"vec_id" === 0),
      "vec_id", "embedding", 3, bits = 2)
      .as[(Long, Long, Long)].collect()
    assert(out.forall(_._1 == 0L))
    assert(out.forall(r => r._3 >= 1 && r._3 <= 3))
    // parallel vector 1 must share vector 0's hyperplane signature
    assert(out.map(_._2).contains(1L))
  }

  test("ivfTopK probes nearest centroid lists and finds the parallel vector") {
    val out = Similarity.ivfTopK(corpus, corpus.where($"vec_id" === 0),
      "vec_id", "embedding", 3, centroidStride = 2, nProbe = 2)
      .as[(Long, Long, Long)].collect()
    assert(out.forall(_._1 == 0L))
    assert(out.forall(r => r._2 != 0L))
    assert(out.map(_._3).sorted.toSeq == (1L to out.length.toLong).toSeq)
    assert(out.map(_._2).contains(1L))
  }

  test("lsh bucket of identical vectors is identical") {
    val b = corpus.select(VectorFunctions.lshBucket($"embedding", 8).as("b"))
      .where($"b".isNotNull).count()
    assert(b == 5)
    val b0 = corpus.where($"vec_id" === 0)
      .select(VectorFunctions.lshBucket($"embedding", 8)).as[Int].head()
    val b0again = corpus.where($"vec_id" === 0)
      .select(VectorFunctions.lshBucket($"embedding", 8)).as[Int].head()
    assert(b0 == b0again)
  }
}
