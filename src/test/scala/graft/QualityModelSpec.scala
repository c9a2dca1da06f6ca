package graft

import graft.operators.QualityModel

/** The learned quality filter (hashed-BOW logistic regression — CCNet /
  * fastText lineage): full-batch gradient descent over one cached
  * featurized pass, scored statelessly. Approximate-operator contract
  * (float folds): the pins are loss DESCENT, separation accuracy, and
  * cross-partitioning agreement at tolerance — not bit equality.
  */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies => linearly separable under hashed BOW
  private def goodDoc(i: Int) =
    Seq("clear", "prose", "reads", "well", "structured", "argument")
      .drop(i % 3).mkString(" ") + s" sample$i clear prose"
  private def badDoc(i: Int) =
    Seq("zzspam", "clickbait", "garbled", "noise", "keyword", "stuffing")
      .drop(i % 3).mkString(" ") + s" junk$i zzspam noise"

  private lazy val corpus = ((0 until 60).map(i => (i.toLong, goodDoc(i), 1)) ++
    (0 until 60).map(i => (100L + i, badDoc(i), 0)))
    .toDF("doc_id", "text", "y")

  test("separable corpus: loss descends, scores separate the classes") {
    val m = QualityModel.train(corpus, "text", "y", dim = 1 << 12, iters = 40,
      lr = 4.0)
    // loss path is monotonically non-increasing (fixed-lr full batch on a
    // separable problem) and ends well below ln 2 (the all-0.5 start)
    assert(m.lossPath.sliding(2).forall(p => p(1) <= p.head + 1e-12),
      s"loss not descending: ${m.lossPath}")
    assert(m.lossPath.last < 0.35, s"final loss ${m.lossPath.last}")
    val scored = QualityModel.score(corpus, "doc_id", "text", m)
      .as[(Long, Double)].collect().toMap
    val acc = corpus.select("doc_id", "y").as[(Long, Int)].collect().count {
      case (id, y) => (scored(id) >= 0.5) == (y == 1)
    } / 120.0
    assert(acc >= 0.95, s"train accuracy $acc")
    // and the margins are real, not borderline
    assert(scored(0L) > 0.8 && scored(100L) < 0.2,
      s"weak margins: ${scored(0L)}, ${scored(100L)}")
  }

  test("partitioning changes scores only at float-fold tolerance") {
    def scores(np: Int) = {
      val m = QualityModel.train(corpus.repartition(np), "text", "y",
        dim = 1 << 12, iters = 10)
      QualityModel.score(corpus, "doc_id", "text", m)
        .as[(Long, Double)].collect().toMap
    }
    val a = scores(1)
    val b = scores(13)
    val maxDiff = a.keys.map(k => math.abs(a(k) - b(k))).max
    assert(maxDiff < 1e-6, s"partitioning moved scores by $maxDiff")
  }

  test("null labels are ignored; unlabeled rows still score") {
    val semi = corpus.withColumn("y",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("doc_id") % 2 === 0,
        org.apache.spark.sql.functions.col("y")))
    val m = QualityModel.train(semi, "text", "y", dim = 1 << 12, iters = 12)
    val scored = QualityModel.score(corpus, "doc_id", "text", m)
      .as[(Long, Double)].collect().toMap
    // trained on half the rows, still separates (same vocabularies)
    assert(scored(1L) > 0.6 && scored(101L) < 0.4,
      s"semi-supervised separation failed: ${scored(1L)}, ${scored(101L)}")
  }

  test("save/load round-trips the model and scores identically") {
    val m = QualityModel.train(corpus, "text", "y", dim = 1 << 12, iters = 10)
    val dir = java.nio.file.Files.createTempDirectory("graft_qm").toString + "/m"
    QualityModel.save(spark, m, dir)
    val m2 = QualityModel.load(spark, dir)
    assert(m2.dim == m.dim && m2.bias == m.bias &&
      m2.weights.sameElements(m.weights) && m2.lossPath == m.lossPath)
    val a = QualityModel.score(corpus, "doc_id", "text", m)
      .as[(Long, Double)].collect().toMap
    val b = QualityModel.score(corpus, "doc_id", "text", m2)
      .as[(Long, Double)].collect().toMap
    assert(a == b)
  }

  test("contracts fail loudly") {
    intercept[IllegalArgumentException](
      QualityModel.train(corpus, "text", "y", dim = 1000)) // not a power of 2
    intercept[IllegalArgumentException](
      QualityModel.train(corpus.where($"doc_id" < 0), "text", "y"))
  }
}
