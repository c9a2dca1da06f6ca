package graft

import org.apache.spark.sql.functions._

/** The scale-up generator behind SCALING.md: determinism and the
  * structure-preservation invariants that make its curves meaningful
  * (see ScaleUp's scaladoc for why naive replication would manufacture
  * super-linear artifacts).
  */
class ScaleUpSpec extends SparkSpec {
  import spark.implicits._

  private lazy val out1 = {
    val d = java.nio.file.Files.createTempDirectory("scaleup1").toString
    ScaleUp.generate(spark, "/root/testdata/sf0.001", d, 3)
    d
  }

  test("deterministic: two runs produce identical row multisets") {
    val out2 = java.nio.file.Files.createTempDirectory("scaleup2").toString
    ScaleUp.generate(spark, "/root/testdata/sf0.001", out2, 3)
    for (t <- Seq("lineitem", "orders", "customer", "documents", "embeddings",
      "events", "nation")) {
      val a = spark.read.parquet(s"$out1/$t.parquet")
      val b = spark.read.parquet(s"$out2/$t.parquet")
      assert(a.count() == b.count(), s"$t row counts differ")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$t rows differ between runs")
    }
  }

  test("keys shift by disjoint strides; FK relationships survive per replica") {
    val li = spark.read.parquet(s"$out1/lineitem.parquet")
    val ord = spark.read.parquet(s"$out1/orders.parquet")
    val base = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    assert(li.count() == base.count() * 3)
    // every lineitem joins an order in the SAME replica (strides disjoint)
    assert(li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti")
      .count() == 0)
    // dims stay fixed
    assert(spark.read.parquet(s"$out1/nation.parquet").count() ==
      spark.read.parquet("/root/testdata/sf0.001/nation.parquet").count())
  }

  test("token map is bijective within a replica, disjoint across replicas") {
    val docs = spark.read.parquet(s"$out1/documents.parquet")
    val dS = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .agg(max("doc_id")).head().getLong(0) + 1
    def vocab(lo: Long, hi: Long) = docs
      .where(col("doc_id") >= lo && col("doc_id") < hi)
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().as[String].collect().toSet
    val v0 = vocab(0, dS)
    val v1 = vocab(dS, 2 * dS)
    // bijective: same vocab size per replica; disjoint: zero overlap
    assert(v0.size == v1.size, s"vocab sizes ${v0.size} vs ${v1.size}")
    assert(v0.intersect(v1).isEmpty, "cross-replica token overlap")
    // and the map preserves per-doc token structure: doc i+stride has the
    // same token COUNT sequence as doc i
    val counts = docs.select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(counts.filter(_._1 < dS).forall { case (id, n) =>
      counts(id + dS) == n })
  }

  test("embedding transform preserves within-replica cosines exactly, decorrelates across") {
    val embs = spark.read.parquet(s"$out1/embeddings.parquet")
    val vS = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .agg(max("vec_id")).head().getLong(0) + 1
    val rows = embs.where(col("vec_id") < 2 * vS)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    // within-replica pairwise cosines EXACT (diagonal ±1 is orthogonal)
    for (i <- 0L until 5L; j <- (i + 1) to 5L) {
      val c0 = cos(rows(i), rows(j))
      val c1 = cos(rows(i + vS), rows(j + vS))
      assert(math.abs(c0 - c1) < 1e-6, s"cosine($i,$j) drifted: $c0 vs $c1")
    }
    // norms preserved exactly per vector
    for (i <- 0L until 10L) {
      val n0 = math.sqrt(rows(i).map(x => x * x.toDouble).sum)
      val n1 = math.sqrt(rows(i + vS).map(x => x * x.toDouble).sum)
      assert(math.abs(n0 - n1) < 1e-6)
    }
    // cross-replica self-cosine decorrelates (the same vector sign-flipped
    // on ~half its dims is far from parallel)
    val selfCos = (0L until 10L).map(i => math.abs(cos(rows(i), rows(i + vS))))
    assert(selfCos.max < 0.8, s"cross-replica self-cosine too high: $selfCos")
  }
}
