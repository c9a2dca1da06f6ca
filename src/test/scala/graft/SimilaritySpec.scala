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
      "vec_id", "embedding", 3, numCentroids = 3, nProbe = 2)
      .as[(Long, Long, Long)].collect()
    assert(out.forall(_._1 == 0L))
    assert(out.forall(r => r._2 != 0L))
    assert(out.map(_._3).sorted.toSeq == (1L to out.length.toLong).toSeq)
    assert(out.map(_._2).contains(1L))
  }

  // 8 well-separated direction clusters of 40 vectors each: the ANN
  // contract is that same-cluster neighbors share an inverted list / hash
  // bucket, so probing a few recovers most of the true top-k. (Uniform
  // random vectors have no cluster structure and make recall a coin flip
  // for ANY index — not a meaningful test.)
  private lazy val clustered = {
    val dim = 16
    val vecs = for (c <- 0 until 8; i <- 0 until 40) yield {
      val base = Array.fill(dim)(0f)
      base(c * 2) = 1f
      base((c * 2 + 1) % dim) = 0.5f
      // deterministic small perturbation, unique per vector
      val noisy = base.zipWithIndex.map { case (v, j) =>
        v + 0.008f * (((c * 40 + i) * 31 + j * 7) % 11 - 5)
      }
      ((c * 40 + i).toLong, noisy)
    }
    vecs.toDF("vec_id", "embedding")
  }

  private def tops(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap

  // toSeq before mapping: Set.map would collapse equal per-query recalls
  private def recallOf(exact: Map[Long, Set[Long]], got: Map[Long, Set[Long]]) =
    exact.toSeq.map { case (q, e) =>
      (e intersect got.getOrElse(q, Set.empty)).size.toDouble / e.size
    }.sum / exact.size

  test("ivfTopK recall vs brute force on clusterable vectors") {
    val embs = clustered
    val queries = embs.where($"vec_id" % 40 === 0) // one query per cluster
    val exact = tops(Similarity.bruteForceTopK(embs, queries, "vec_id", "embedding", 10))
    val ivf = tops(Similarity.ivfTopK(embs, queries, "vec_id", "embedding", 10,
      numCentroids = 16, nProbe = 4))
    val recall = recallOf(exact, ivf)
    assert(recall >= 0.7, s"IVF recall $recall below 0.7")
  }

  test("lshTopK recall vs brute force on clusterable vectors") {
    // same fixture shape as the IVF pin: tight direction clusters, one
    // query per cluster. Same-cluster vectors agree on nearly every random
    // hyperplane, so bucket candidates recover most of the true top-k —
    // this pins lshTopK against a silent recall collapse after a refactor
    // (it was the only approximate operator with no quality floor).
    val embs = clustered
    val queries = embs.where($"vec_id" % 40 === 0)
    val exact = tops(Similarity.bruteForceTopK(embs, queries, "vec_id", "embedding", 10))
    val lsh = tops(Similarity.lshTopK(embs, queries, "vec_id", "embedding", 10))
    val recall = recallOf(exact, lsh)
    assert(recall >= 0.7, s"LSH recall $recall below 0.7")
  }

  test("multi-table LSH lifts recall without duplicating top-k slots") {
    val embs = clustered
    val queries = embs.where($"vec_id" % 40 === 0)
    val exact = tops(Similarity.bruteForceTopK(embs, queries, "vec_id", "embedding", 10))
    // deeper buckets (harder single-table recall) amplified across 8 tables
    val one = recallOf(exact,
      tops(Similarity.lshTopK(embs, queries, "vec_id", "embedding", 10, bits = 10)))
    val multiDf = Similarity.lshTopK(embs, queries, "vec_id", "embedding", 10,
      bits = 10, tables = 8)
    val multi = recallOf(exact, tops(multiDf))
    assert(multi >= one, s"OR-amplification lowered recall: $multi < $one")
    assert(multi >= 0.9, s"multi-table recall $multi below 0.9")
    // a pair colliding in several tables still occupies one ranked slot
    val rows = multiDf.as[(Long, Long, Long)].collect()
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length.toLong), s"ranks broken for $q")
    }
  }

  test("ivfTopK falls back to brute force on an empty corpus slice") {
    val out = Similarity.ivfTopK(corpus.where($"vec_id" < 0),
      corpus.where($"vec_id" === 0), "vec_id", "embedding", 3)
    assert(out.count() === 0) // no candidates, but no driver-side crash
  }

  test("IvfIndex probe equals the one-shot ivfTopK; reload serves the same result") {
    val embs = clustered
    val queries = embs.where($"vec_id" % 40 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/idx"
    val idx = graft.operators.IvfIndex.create(embs, "vec_id", "embedding", dir,
      numCentroids = 16)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSet
    val got = rows(idx.probe(queries, "vec_id", "embedding", 10, nProbe = 4))
    // same codebook pick, same assignment, same ranking kernels — the
    // persisted index EQUALS the one-shot call, so its recall can never be
    // below the one-shot path's (the spec-pinned >= 0.7 above)
    val oneShot = rows(Similarity.ivfTopK(embs, queries, "vec_id", "embedding", 10,
      numCentroids = 16, nProbe = 4))
    assert(got == oneShot, "persisted-index probe diverged from ivfTopK")
    val reloaded = graft.operators.IvfIndex.load(spark, dir)
    assert(reloaded.dim == 16 && reloaded.centroids == 16 && reloaded.batches == 1)
    assert(rows(reloaded.probe(queries, "vec_id", "embedding", 10, nProbe = 4)) == got,
      "reloaded index diverged from the creating instance")
    // lifecycle error contracts
    intercept[IllegalStateException] {
      graft.operators.IvfIndex.load(spark, dir + "_nowhere")
    }
    intercept[IllegalArgumentException] {
      graft.operators.IvfIndex.create(embs.where($"vec_id" < 0),
        "vec_id", "embedding", dir + "_empty")
    }
  }

  test("IvfIndex add appends batches retrievable under the frozen codebook") {
    val embs = clustered
    val evenClusters = embs.where(($"vec_id" / 40).cast("int") % 2 === 0)
    val oddClusters = embs.where(($"vec_id" / 40).cast("int") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_add").toString + "/idx"
    val idx = graft.operators.IvfIndex.create(evenClusters, "vec_id", "embedding",
      dir, numCentroids = 16)
    idx.add(oddClusters, "vec_id", "embedding")
    assert(idx.batches == 2)
    // queries from EVERY cluster: the added batch's clusters have no own
    // centroid, but their vectors share whatever list they hashed to, so
    // same-cluster neighbors stay retrievable
    val queries = embs.where($"vec_id" % 40 === 0)
    val exact = tops(Similarity.bruteForceTopK(embs, queries, "vec_id", "embedding", 10))
    val got = tops(graft.operators.IvfIndex.load(spark, dir)
      .probe(queries, "vec_id", "embedding", 10, nProbe = 4))
    val recall = recallOf(exact, got)
    assert(recall >= 0.7, s"post-add recall $recall below 0.7")
  }

  test("IvfIndex probe scans are partition-pruned to the probed centroid lists") {
    val embs = clustered
    val queries = embs.where($"vec_id" === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_prune").toString + "/idx"
    val idx = graft.operators.IvfIndex.create(embs, "vec_id", "embedding", dir,
      numCentroids = 16)
    val captured = scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.execution.SparkPlan]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit =
        captured.synchronized { captured += qe.executedPlan }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
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
    def assignedScans() = captured.synchronized(captured.toSeq).flatMap(scansIn)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("/assigned")))
    def pruned() = {
      val s = assignedScans()
      s.nonEmpty && s.forall(
        _.partitionFilters.exists(_.references.exists(_.name == "c")))
    }
    spark.listenerManager.register(listener)
    val got = try {
      val out = idx.probe(queries, "vec_id", "embedding", 10, nProbe = 4)
        .as[(Long, Long, Long)].collect().toSet
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline && !pruned()) Thread.sleep(100)
      out
    } finally spark.listenerManager.unregister(listener)
    // pruning loses nothing...
    assert(got == Similarity.ivfTopK(embs, queries, "vec_id", "embedding", 10,
      numCentroids = 16, nProbe = 4).as[(Long, Long, Long)].collect().toSet)
    // ... and every assignment-list scan carries a partition filter on the
    // centroid dir column, so file listing skips non-probed c=J dirs
    assert(pruned(), "assigned scan not partition-pruned: " +
      assignedScans().map(f => s"filters=${f.partitionFilters}").mkString("; "))
  }

  test("LshIndex create+add equals the one-shot lshTopK over the union exactly") {
    val embs = clustered
    val evenClusters = embs.where(($"vec_id" / 40).cast("int") % 2 === 0)
    val oddClusters = embs.where(($"vec_id" / 40).cast("int") % 2 === 1)
    val queries = embs.where($"vec_id" % 40 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_lshidx").toString + "/idx"
    // signatures use a fixed corpus-independent seed, so (unlike IVF's
    // frozen codebook) the batch split is irrelevant: create(A)+add(B)
    // IS the index of A ∪ B
    val idx = graft.operators.LshIndex.create(evenClusters, "vec_id", "embedding",
      dir, bits = 10, tables = 8)
    idx.add(oddClusters, "vec_id", "embedding")
    assert(idx.batches == 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSet
    val got = rows(idx.probe(queries, "vec_id", "embedding", 10))
    val oneShot = rows(Similarity.lshTopK(embs, queries, "vec_id", "embedding", 10,
      bits = 10, tables = 8))
    assert(got == oneShot, "persisted-index probe diverged from lshTopK")
    val reloaded = graft.operators.LshIndex.load(spark, dir)
    assert(reloaded.bits == 10 && reloaded.tables == 8 && reloaded.batches == 2)
    assert(rows(reloaded.probe(queries, "vec_id", "embedding", 10)) == got)
    // lifecycle error contracts + the fileless-index edge
    intercept[IllegalStateException] {
      graft.operators.LshIndex.load(spark, dir + "_nowhere")
    }
    val empty = graft.operators.LshIndex.create(embs.where($"vec_id" < 0),
      "vec_id", "embedding", dir + "_empty")
    assert(empty.probe(queries, "vec_id", "embedding", 5).count() == 0L)
  }

  test("LshIndex probe scans are partition-pruned to the probed bucket dirs") {
    val embs = clustered
    val queries = embs.where($"vec_id" === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_prune").toString + "/idx"
    val idx = graft.operators.LshIndex.create(embs, "vec_id", "embedding", dir,
      bits = 6, tables = 2)
    val captured = scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.execution.SparkPlan]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit =
        captured.synchronized { captured += qe.executedPlan }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
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
    def assignedScans() = captured.synchronized(captured.toSeq).flatMap(scansIn)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("/assigned")))
    def pruned() = {
      val s = assignedScans()
      s.nonEmpty && s.forall(
        _.partitionFilters.exists(_.references.exists(_.name == "th")))
    }
    spark.listenerManager.register(listener)
    val got = try {
      val out = idx.probe(queries, "vec_id", "embedding", 10)
        .as[(Long, Long, Long)].collect().toSet
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline && !pruned()) Thread.sleep(100)
      out
    } finally spark.listenerManager.unregister(listener)
    assert(got == Similarity.lshTopK(embs, queries, "vec_id", "embedding", 10,
      bits = 6, tables = 2).as[(Long, Long, Long)].collect().toSet)
    assert(pruned(), "assigned scan not partition-pruned: " +
      assignedScans().map(f => s"filters=${f.partitionFilters}").mkString("; "))
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
