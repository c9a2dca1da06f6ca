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

  test("balancedSample caps every cluster at perCluster, deterministically") {
    // 40 vectors on the x axis, 3 on the y axis; centroids = unit x, unit y
    val corpus = ((0L until 40L).map(i => (10L + i, Array(1f, 0.001f * i))) ++
      Seq((100L, Array(0f, 1f)), (101L, Array(0.01f, 1f)), (102L, Array(0f, 0.9f))))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val out = Similarity.balancedSample(corpus, cents, "vec_id", "embedding",
      perCluster = 5).select($"vec_id", $"centroid_id")
      .as[(Long, Long)].collect()
    // dominant mode capped at 5; the small cluster keeps all 3
    val byCluster = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster(0L).size == 5)
    assert(byCluster(1L) == Set(100L, 101L, 102L))
    // deterministic: the same pick on a different partitioning
    val again = Similarity.balancedSample(corpus.repartition(7), cents, "vec_id",
      "embedding", perCluster = 5).select($"vec_id", $"centroid_id")
      .as[(Long, Long)].collect().toSet
    assert(again == out.toSet)
  }

  test("cosine matches a hand-computed value") {
    val c = corpus.where($"vec_id" === 0)
      .crossJoin(corpus.where($"vec_id" === 1).select($"embedding".as("e2")))
      .select(VectorFunctions.cosine($"embedding", $"e2")).as[Double].head()
    val expected = 0.9 / math.sqrt(0.9 * 0.9 + 0.1 * 0.1)
    assert(math.abs(c - expected) < 1e-6)
  }

  test("centroidAssign picks the nearest centroid; ties break to the lower id") {
    val cents = corpus.where($"vec_id".isin(0L, 2L)) // unit x, unit y
    val out = Similarity.centroidAssign(corpus, cents, "vec_id", "embedding")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(0L) == ((0L, 0.0)))               // centroid assigns to itself
    assert(out(1L)._1 == 0L)                     // (0.9,0.1,0) → x axis
    assert(out(3L)._1 == 2L)                     // (0,0.9,0.1) → y axis
    assert(out(4L)._1 == 2L)                     // (-1,0,0): d2 4 vs 2 → y axis
    // exact tie: (1,1,0)/√-free — equidistant from x and y ⇒ lower id wins
    val tie = Seq((9L, Array(1f, 1f, 0f))).toDF("vec_id", "embedding")
    val got = Similarity.centroidAssign(tie, cents, "vec_id", "embedding")
      .as[(Long, Long, Double)].head()
    assert(got == ((9L, 0L, 1.0)))
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
    // the bit-equality configuration: no codebook refinement, raw float
    // postings — the defaults (kmeans + int8) trade exactness for quality
    // and IO, each pinned by its own spec below
    val idx = graft.operators.IvfIndex.create(embs, "vec_id", "embedding", dir,
      numCentroids = 16, kmeansIters = 0, quantizedStore = false)
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
    // bit-equality config: the "pruning loses nothing" assertion below
    // compares against the one-shot ivfTopK (pruning itself is store- and
    // codebook-agnostic — the capped-fallback spec covers the other path)
    val idx = graft.operators.IvfIndex.create(embs, "vec_id", "embedding", dir,
      numCentroids = 16, kmeansIters = 0, quantizedStore = false)
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
    // IS the index of A ∪ B (raw float store — the int8 default keeps the
    // same candidates but rounds scores; its overlap pin is below)
    val idx = graft.operators.LshIndex.create(evenClusters, "vec_id", "embedding",
      dir, bits = 10, tables = 8, quantizedStore = false)
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
    // float store: the assertion below compares against the one-shot lshTopK
    val idx = graft.operators.LshIndex.create(embs, "vec_id", "embedding", dir,
      bits = 6, tables = 2, quantizedStore = false)
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

  // deep plan collector that sees through AQE wrappers — for asserting on
  // the FINAL executed shape of a probe plan
  private def deepCollect[T](p: org.apache.spark.sql.execution.SparkPlan)(
      pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
    val kids: Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        Seq(r.child)
      case other => other.children
    }
    (if (pf.isDefinedAt(p)) Seq(pf(p)) else Nil) ++ kids.flatMap(deepCollect(_)(pf))
  }

  private def bytesUnder(dir: String): Long = {
    val root = java.nio.file.Paths.get(dir)
    val s = java.nio.file.Files.walk(root)
    try s.filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    finally s.close()
  }

  test("k-means-refined codebook recall >= sampled-codebook recall") {
    val embs = clustered
    val queries = embs.where($"vec_id" % 40 === 0)
    val exact = tops(Similarity.bruteForceTopK(embs, queries, "vec_id", "embedding", 10))
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_km").toString
    // float postings both sides: isolates the codebook's effect
    val sampled = graft.operators.IvfIndex.create(embs, "vec_id", "embedding",
      root + "/sampled", numCentroids = 16, kmeansIters = 0, quantizedStore = false)
    val refined = graft.operators.IvfIndex.create(embs, "vec_id", "embedding",
      root + "/refined", numCentroids = 16, kmeansIters = 4, quantizedStore = false)
    val rSampled = recallOf(exact,
      tops(sampled.probe(queries, "vec_id", "embedding", 10, nProbe = 4)))
    val rRefined = recallOf(exact,
      tops(refined.probe(queries, "vec_id", "embedding", 10, nProbe = 4)))
    // the codebook is frozen at create and every probe forever pays its
    // quality — Lloyd steps must never make it worse than the raw sample
    assert(rRefined >= rSampled,
      s"k-means lowered recall: $rRefined < $rSampled")
    assert(rRefined >= 0.7, s"refined recall $rRefined below 0.7")
  }

  test("int8 posting store: top-k overlap >= 0.95 vs the float store, and smaller on disk") {
    val embs = clustered
    val queries = embs.where($"vec_id" % 40 === 0)
    val root = java.nio.file.Files.createTempDirectory("graft_q8").toString
    def overlap(a: Map[Long, Set[Long]], b: Map[Long, Set[Long]]) =
      a.toSeq.map { case (q, s) =>
        (s intersect b.getOrElse(q, Set.empty)).size.toDouble / s.size
      }.sum / a.size
    // IVF: kmeansIters = 0 on both sides pins ONE deterministic codebook,
    // so candidate sets are identical and only the scoring form differs
    val ivfF = graft.operators.IvfIndex.create(embs, "vec_id", "embedding",
      root + "/ivf_f", numCentroids = 16, kmeansIters = 0, quantizedStore = false)
    val ivfQ = graft.operators.IvfIndex.create(embs, "vec_id", "embedding",
      root + "/ivf_q", numCentroids = 16, kmeansIters = 0, quantizedStore = true)
    val oIvf = overlap(
      tops(ivfF.probe(queries, "vec_id", "embedding", 10, nProbe = 4)),
      tops(ivfQ.probe(queries, "vec_id", "embedding", 10, nProbe = 4)))
    assert(oIvf >= 0.95, s"IVF int8 top-k overlap $oIvf below 0.95")
    // LSH: same fixed hyperplanes either way — identical buckets, so the
    // store is the only variable (tables=2 doubles the posting copies the
    // packing is meant to pay for)
    val lshF = graft.operators.LshIndex.create(embs, "vec_id", "embedding",
      root + "/lsh_f", bits = 6, tables = 2, quantizedStore = false)
    val lshQ = graft.operators.LshIndex.create(embs, "vec_id", "embedding",
      root + "/lsh_q", bits = 6, tables = 2, quantizedStore = true)
    val oLsh = overlap(
      tops(lshF.probe(queries, "vec_id", "embedding", 10)),
      tops(lshQ.probe(queries, "vec_id", "embedding", 10)))
    assert(oLsh >= 0.95, s"LSH int8 top-k overlap $oLsh below 0.95")

    // bytes-on-disk on a fixture where DATA dominates parquet metadata
    // (dim-16 × ~20-rows-per-dir files are all footer): 500 near-unique
    // dim-128 vectors over a handful of partition dirs — raw 4·dim float
    // leaves vs dim-byte binaries, so the packed store must win clearly
    val dim = 128
    val big = (0 until 500).map { i =>
      (i.toLong, Array.tabulate(dim)(j =>
        (((i.toLong * dim + j) * 2654435761L % 2000003L) / 1000001.5f) - 1f))
    }.toDF("vec_id", "embedding")
    val bIvfF = graft.operators.IvfIndex.create(big, "vec_id", "embedding",
      root + "/big_ivf_f", numCentroids = 4, kmeansIters = 0, quantizedStore = false)
    val bIvfQ = graft.operators.IvfIndex.create(big, "vec_id", "embedding",
      root + "/big_ivf_q", numCentroids = 4, kmeansIters = 0, quantizedStore = true)
    val (ivfFb, ivfQb) = (bytesUnder(root + "/big_ivf_f/assigned"),
      bytesUnder(root + "/big_ivf_q/assigned"))
    assert(ivfQb * 2 < ivfFb,
      s"int8 IVF postings ($ivfQb B) not under half the float store ($ivfFb B)")
    val bLshF = graft.operators.LshIndex.create(big, "vec_id", "embedding",
      root + "/big_lsh_f", bits = 2, tables = 2, quantizedStore = false)
    val bLshQ = graft.operators.LshIndex.create(big, "vec_id", "embedding",
      root + "/big_lsh_q", bits = 2, tables = 2, quantizedStore = true)
    val (lshFb, lshQb) = (bytesUnder(root + "/big_lsh_f/assigned"),
      bytesUnder(root + "/big_lsh_q/assigned"))
    assert(lshQb * 2 < lshFb,
      s"int8 LSH postings ($lshQb B) not under half the float store ($lshFb B)")
  }

  test("probe pruning past the key cap swaps the isin literal for a broadcast semi-join") {
    val embs = clustered
    val queries = embs.where($"vec_id" % 40 === 0) // 8 queries × nProbe=4 keys
    val dir = java.nio.file.Files.createTempDirectory("graft_cap").toString + "/idx"
    val idx = graft.operators.IvfIndex.create(embs, "vec_id", "embedding", dir,
      numCentroids = 16)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSet
    val pruned = idx.probe(queries, "vec_id", "embedding", 10, nProbe = 4)
    val capped = idx.probe(queries, "vec_id", "embedding", 10, nProbe = 4,
      maxPrunedKeys = 1) // forces the overflow path
    // both paths return the identical result...
    val cappedRows = rows(capped)
    assert(cappedRows == rows(pruned), "semi-join fallback diverged from isin path")
    assert(cappedRows.nonEmpty)
    // ...but the overflowed plan filters through a LEFT-SEMI broadcast join
    // on c with NO literal isin partition filter — the driver never holds
    // more than cap+1 keys however large the probe batch
    val plan = capped.queryExecution.executedPlan
    val semis = deepCollect(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
    }
    assert(semis.nonEmpty, s"no leftsemi broadcast join in capped probe plan:\n$plan")
    val assignedScans = deepCollect(plan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("/assigned")) => f
    }
    assert(assignedScans.nonEmpty)
    assert(assignedScans.forall(_.partitionFilters.forall(_.find {
      case _: org.apache.spark.sql.catalyst.expressions.In => true
      case _: org.apache.spark.sql.catalyst.expressions.InSet => true
      case _ => false
    }.isEmpty)), "capped probe still carries a literal isin partition filter")
  }

  test("compact folds generations into one, preserves probes, vacuums on the next cycle") {
    val embs = clustered
    val queries = embs.where($"vec_id" % 40 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSet
    def gens(dir: String) = new java.io.File(dir + "/assigned")
      .listFiles().map(_.getName).filter(_.startsWith("b=")).toSet

    // IVF: three appended generations → one compacted one
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/ivf"
    val idx = graft.operators.IvfIndex.create(
      embs.where($"vec_id" % 3 === 0), "vec_id", "embedding", dir, numCentroids = 16)
    idx.add(embs.where($"vec_id" % 3 === 1), "vec_id", "embedding")
    idx.add(embs.where($"vec_id" % 3 === 2), "vec_id", "embedding")
    val before = rows(idx.probe(queries, "vec_id", "embedding", 10, nProbe = 4))
    idx.compact()
    assert(idx.base == 3 && idx.batches == 4)
    // a probe sees exactly the same postings through the folded generation
    assert(rows(idx.probe(queries, "vec_id", "embedding", 10, nProbe = 4)) == before)
    // the superseded dirs are RETAINED for one cycle (reader grace) ...
    assert(gens(dir) == Set("b=0", "b=1", "b=2", "b=3"), gens(dir).toString)
    // ... the meta round-trips through load ...
    val re = graft.operators.IvfIndex.load(spark, dir)
    assert(re.base == 3 && re.batches == 4)
    assert(rows(re.probe(queries, "vec_id", "embedding", 10, nProbe = 4)) == before)
    // ... appends keep working on the compacted index ...
    val shifted = embs.select(($"vec_id" + 1000L).as("vec_id"), $"embedding")
    idx.add(shifted, "vec_id", "embedding")
    assert(idx.base == 3 && idx.batches == 5)
    val withAdd = rows(idx.probe(queries, "vec_id", "embedding", 10, nProbe = 4))
    // ... and the NEXT compact folds again and vacuums the expired grace
    idx.compact()
    assert(idx.base == 5 && idx.batches == 6)
    assert(gens(dir) == Set("b=3", "b=4", "b=5"), gens(dir).toString)
    assert(rows(idx.probe(queries, "vec_id", "embedding", 10, nProbe = 4)) == withAdd)

    // LSH on the float store: compact preserves the exact one-shot equality
    val ldir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/lsh"
    val lsh = graft.operators.LshIndex.create(
      embs.where(($"vec_id" / 40).cast("int") % 2 === 0), "vec_id", "embedding",
      ldir, bits = 10, tables = 8, quantizedStore = false)
    lsh.add(embs.where(($"vec_id" / 40).cast("int") % 2 === 1), "vec_id", "embedding")
    lsh.compact()
    assert(lsh.base == 2 && lsh.batches == 3)
    assert(rows(lsh.probe(queries, "vec_id", "embedding", 10)) ==
      rows(Similarity.lshTopK(embs, queries, "vec_id", "embedding", 10,
        bits = 10, tables = 8)))
    // single live generation: compacting again is a no-op
    lsh.compact()
    assert(lsh.base == 2 && lsh.batches == 3)
  }

  test("listStats/bucketStats account for every live posting, through add and compact") {
    val embs = clustered
    val root = java.nio.file.Files.createTempDirectory("graft_stats").toString
    val idx = graft.operators.IvfIndex.create(
      embs.where($"vec_id" < 160), "vec_id", "embedding", root + "/ivf",
      numCentroids = 16)
    idx.add(embs.where($"vec_id" >= 160), "vec_id", "embedding")
    def ivfTotal() = idx.listStats().agg(sum($"postings")).as[Long].head()
    assert(ivfTotal() == 320L) // one posting per doc across all live gens
    idx.compact()
    assert(ivfTotal() == 320L) // folding generations changes layout, not counts
    val lsh = graft.operators.LshIndex.create(embs, "vec_id", "embedding",
      root + "/lsh", bits = 6, tables = 3)
    // ×tables postings per doc — exactly the storage trade bucketStats meters
    assert(lsh.bucketStats().agg(sum($"postings")).as[Long].head() == 960L)
    val empty = graft.operators.LshIndex.create(embs.where($"vec_id" < 0),
      "vec_id", "embedding", root + "/lsh_empty")
    assert(empty.bucketStats().count() == 0L)
  }

  test("streaming maintenance: the vector index rides microbatches, replay-safe") {
    import graft.streaming.CdcStream
    import graft.streaming.CdcStream.Change
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_ivf_stream")
    val target = base.resolve("mirror").toString
    val ckpt = base.resolve("ckpt").toString
    val vdir = base.resolve("ivf").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // deterministic embedding seam: payload chars → 4 hashed coordinates
    def embed(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("embedding", array((0 until 4).map(i =>
        pmod(xxhash64(col("payload"), lit(i)), lit(1000)).cast("double") / 500.0 - 1.0): _*))

    // snapshot backfill creates the index; the stream adopts from there
    val seed = Seq((1L, "alpha doc"), (2L, "beta doc")).toDF("key", "payload")
    val idx = graft.operators.IvfIndex.create(embed(seed), "key", "embedding",
      vdir, numCentroids = 2, kmeansIters = 0, quantizedStore = false)
    val input = MemoryStream[Change]
    def run(): Unit = CdcStream.mirrorToParquetWithVectors(input.toDS(), target,
      ckpt, idx, embed, nBuckets = 4).awaitTermination()

    input.addData(
      Change(3L, 3L, "insert", ts("2024-01-01 00:00:00"), "gamma doc"),
      Change(4L, 4L, "insert", ts("2024-01-01 00:00:01"), "delta doc"))
    run()
    input.addData(
      Change(5L, 5L, "insert", ts("2024-01-01 00:01:00"), "epsilon doc"),
      Change(6L, 6L, "insert", ts("2024-01-01 00:01:01"), "zeta doc"))
    run()

    // probes answer over snapshot ∪ streamed state, exactly the one-shot
    // ivfTopK on the union (the create+add equality, through the stream)
    val live = graft.sources.Mirror.readCommitted(spark, target)
      .where(!col("is_deleted")).select(col("key"), col("payload"))
    val union = embed(seed.unionByName(live)).select(col("key"), col("embedding"))
    val queries = embed(Seq((100L, "alpha doc")).toDF("key", "payload"))
      .select(col("key"), col("embedding"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSet
    val got = rows(idx.probe(queries, "key", "embedding", 4, nProbe = 2))
    val oneShot = rows(Similarity.ivfTopK(union, queries, "key", "embedding", 4,
      numCentroids = 2, nProbe = 2))
    assert(got == oneShot, "streamed index diverged from one-shot over the union")

    // a replayed batch id is a no-op: postings never double
    val before = idx.listStats().agg(sum(col("postings"))).as[Long].head()
    val dupe = embed(Seq((9L, "gamma doc")).toDF("key", "payload"))
    assert(!idx.addBatch(idx.lastBatch.toLong, dupe, "key", "embedding"))
    assert(idx.listStats().agg(sum(col("postings"))).as[Long].head() == before)
    // the mark survives a reopen
    assert(graft.operators.IvfIndex.load(spark, vdir).lastBatch == idx.lastBatch)
  }

  test("streaming maintenance: compact-with-grace rides the stream; " +
    "probes equal the batch-built index; restart-safe") {
    import graft.streaming.CdcStream
    import graft.streaming.CdcStream.Change
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_lsh_stream")
    val target = base.resolve("mirror").toString
    val ckpt = base.resolve("ckpt").toString
    val vdir = base.resolve("lsh").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def embed(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("embedding", array((0 until 8).map(i =>
        pmod(xxhash64(col("payload"), lit(i)), lit(1000)).cast("double") / 500.0 - 1.0): _*))

    val seed = Seq((1L, "alpha doc"), (2L, "beta doc")).toDF("key", "payload")
    val idx = graft.operators.LshIndex.create(embed(seed), "key", "embedding",
      vdir, bits = 4, tables = 4, quantizedStore = false)
    val input = MemoryStream[Change]
    def run(): Unit = CdcStream.mirrorToParquetWithVectors(input.toDS(), target,
      ckpt, idx, embed, nBuckets = 4, compactEvery = 2).awaitTermination()

    // stream FOUR batches; with compactEvery = 2 the sink folds mid-stream
    val names = Seq("gamma", "delta", "epsilon", "zeta", "eta", "theta",
      "iota", "kappa")
    names.zipWithIndex.foreach { case (n, i) =>
      input.addData(Change(3L + i, 3L + i, "insert",
        ts(f"2024-01-01 00:0$i%01d:00"), s"$n doc"))
      run()
    }
    // the stream compacted: live generations stay bounded by the cadence,
    // never one-per-appended-batch
    assert(idx.liveGenerations <= 3,
      s"stream never compacted: ${idx.liveGenerations} live generations")

    // probe answers EQUAL the one-shot lshTopK over snapshot ∪ streamed
    // rows (same fixed seeds) — compaction changed layout, not answers
    val live = graft.sources.Mirror.readCommitted(spark, target)
      .where(!col("is_deleted")).select(col("key"), col("payload"))
    val union = embed(seed.unionByName(live)).select(col("key"), col("embedding"))
    val queries = embed(Seq((100L, "alpha doc"), (101L, "zeta doc"))
      .toDF("key", "payload")).select(col("key"), col("embedding"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSet
    assert(rows(idx.probe(queries, "key", "embedding", 5))
      == rows(Similarity.lshTopK(union, queries, "key", "embedding", 5,
        bits = 4, tables = 4)),
      "streamed+compacted index diverged from the one-shot over the union")

    // restart-safe: a reopened index carries the mark and the same answers
    val reopened = graft.operators.LshIndex.load(spark, vdir)
    assert(reopened.lastBatch == idx.lastBatch)
    assert(rows(reopened.probe(queries, "key", "embedding", 5))
      == rows(idx.probe(queries, "key", "embedding", 5)))
  }

  test("LshIndex addBatch carries the same replay-safe mark as IvfIndex") {
    val embs = clustered
    val a = embs.where($"vec_id" % 2 === 0)
    val b = embs.where($"vec_id" % 2 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_mark").toString + "/idx"
    val idx = graft.operators.LshIndex.create(a, "vec_id", "embedding", dir,
      bits = 4, tables = 4, quantizedStore = false)
    assert(idx.lastBatch == -1)
    assert(idx.addBatch(7L, b, "vec_id", "embedding"))
    val after = idx.bucketStats().agg(sum(col("postings"))).as[Long].head()
    // replayed and stale ids are no-ops; postings never double
    assert(!idx.addBatch(7L, b, "vec_id", "embedding"))
    assert(!idx.addBatch(3L, b, "vec_id", "embedding"))
    assert(idx.bucketStats().agg(sum(col("postings"))).as[Long].head() == after)
    // the union still answers exactly like the one-shot (same fixed seeds)
    val queries = embs.where($"vec_id" % 40 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSet
    assert(rows(idx.probe(queries, "vec_id", "embedding", 10))
      == rows(Similarity.lshTopK(embs, queries, "vec_id", "embedding", 10,
        bits = 4, tables = 4)))
    // mark survives reopen
    assert(graft.operators.LshIndex.load(spark, dir).lastBatch == 7)
  }

  test("pqTopK: recall vs brute force, 32x compression, deterministic on any layout") {
    val embs = clustered // dim 16: m=4 subspaces of 4 dims
    val queries = embs.where($"vec_id" % 40 === 0)
    val exact = tops(Similarity.bruteForceTopK(embs, queries, "vec_id", "embedding", 10))
    val pqDf = Similarity.pqTopK(embs, queries, "vec_id", "embedding", 10,
      m = 4, ksub = 16)
    val recall = recallOf(exact, tops(pqDf))
    assert(recall >= 0.7, s"PQ recall $recall below 0.7")
    // per-partition heap pre-filtering must not change the answer
    val again = Similarity.pqTopK(embs.repartition(13), queries, "vec_id",
      "embedding", 10, m = 4, ksub = 16)
    assert(tops(again) == tops(pqDf))

    // the compression claim is structural: m bytes per coded vector
    val mdl = Similarity.pqTrain(embs, "vec_id", "embedding", m = 4, ksub = 16)
    val codes = Similarity.pqEncode(embs, "vec_id", "embedding", mdl)
      .as[(Long, Array[Byte])].collect()
    assert(codes.length == 320 && codes.forall(_._2.length == 4))
    // encode is deterministic and code values stay inside ksub
    assert(codes.forall(_._2.forall(b => (b & 0xff) < 16)))

    // guards: byte codes cap ksub; dim must split evenly
    intercept[IllegalArgumentException](
      Similarity.pqTrain(embs, "vec_id", "embedding", m = 4, ksub = 300))
    intercept[IllegalArgumentException](
      Similarity.pqTrain(embs, "vec_id", "embedding", m = 5, ksub = 16))
  }

  test("IvfIndex PQ store (IVFADC): m-byte postings, recall, reload bit-equality") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString + "/idx"
    val embs = clustered
    val queries = embs.where($"vec_id" % 40 === 0)
    val idx = graft.operators.IvfIndex.create(embs, "vec_id", "embedding", dir,
      numCentroids = 16, kmeansIters = 2, pqM = 4, pqKsub = 16)
    def rows(i: graft.operators.IvfIndex) =
      i.probe(queries, "vec_id", "embedding", 10, nProbe = 8)
        .as[(Long, Long, Long)].collect().toSet
    val got = rows(idx)
    val exact = tops(Similarity.bruteForceTopK(embs, queries, "vec_id", "embedding", 10))
    val gotSets = got.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val recall = recallOf(exact, gotSets)
    assert(recall >= 0.6, s"IVFADC recall $recall below 0.6")

    // postings really are m bytes: read a live generation's codes column
    val stored = spark.read.parquet(s"$dir/assigned")
      .select($"codes").as[Array[Byte]].collect()
    assert(stored.nonEmpty && stored.forall(_.length == 4))

    // reload serves the identical result (codebooks + sub-codebooks both
    // round-trip through disk)
    assert(rows(graft.operators.IvfIndex.load(spark, dir)) == got)

    // appends encode under the frozen sub-codebooks and stay probeable.
    // PQ collapses near-identical vectors onto one code (ties then break
    // to the lower id), so probe deep enough to cover the whole cluster
    // the appended vector lands in.
    val extra = Seq((9000L, Array.tabulate(16)(j => if (j == 0) 5f else 0.01f)))
      .toDF("vec_id", "embedding")
    idx.add(extra, "vec_id", "embedding")
    val q0 = embs.where($"vec_id" === 0L) // cluster 0 queries point along x0
    val hit = graft.operators.IvfIndex.load(spark, dir)
      .probe(q0, "vec_id", "embedding", 60, nProbe = 8)
      .as[(Long, Long, Long)].collect().map(_._2)
    assert(hit.contains(9000L), s"appended vector not retrieved: ${hit.toSeq}")

    intercept[IllegalArgumentException](
      graft.operators.IvfIndex.create(embs, "vec_id", "embedding", dir + "2",
        numCentroids = 8, pqM = 5)) // 16 dims not divisible by 5
  }

  test("residual IVFADC (fmt 5) beats raw-vector PQ at equal m, round-trips reload") {
    val base = java.nio.file.Files.createTempDirectory("graft_ivfres").toString
    val embs = clustered
    val queries = embs.where($"vec_id" % 40 === 0)
    val exact = tops(Similarity.bruteForceTopK(embs, queries, "vec_id", "embedding", 10))
    def recallAt(dir: String, residual: Boolean): Double = {
      val idx = graft.operators.IvfIndex.create(embs, "vec_id", "embedding",
        dir, numCentroids = 16, kmeansIters = 2, pqM = 4, pqKsub = 4,
        pqResidual = residual)
      val got: Set[(Long, Long, Long)] =
        idx.probe(queries, "vec_id", "embedding", 10, nProbe = 8)
          .as[(Long, Long, Long)].collect().toSet
      recallOf(exact, got.groupBy(_._1).view.mapValues(_.map(_._2)).toMap)
    }
    val raw = recallAt(s"$base/raw", residual = false)
    val res = recallAt(s"$base/res", residual = true)
    // the Jégou §IV-A claim at equal m: residual magnitudes are smaller
    // than raw coordinates on a clustered corpus, so the same 4 bytes
    // quantize finer — recall must not be worse, and must clear the
    // family's floor
    assert(res >= raw, s"residual recall $res < raw recall $raw")
    assert(res >= 0.7, s"residual IVFADC recall $res below 0.7")
    // residual flag survives the meta round trip and probes identically
    val reload = graft.operators.IvfIndex.load(spark, s"$base/res")
    assert(reload.pqResidual)
    val again: Set[(Long, Long, Long)] =
      reload.probe(queries, "vec_id", "embedding", 10, nProbe = 8)
        .as[(Long, Long, Long)].collect().toSet
    assert(recallOf(exact,
      again.groupBy(_._1).view.mapValues(_.map(_._2)).toMap) == res)
  }

  test("OPQ-lite rotation (fmt 6): rotated-residual recall >= unrotated on correlated dims, reload-identical") {
    // correlate dims ACROSS the m=4 subspace boundaries: 45° Givens
    // rotations on pairs (3,4), (7,8), (11,12) smear each cluster's
    // signal over two adjacent subspaces — the exact failure mode plain
    // subspace splitting has on correlated data and the case Ge et al.'s
    // rotation exists for. The mixing is orthogonal, so brute-force
    // ground truth is the same neighbor set as the unmixed fixture.
    val c = math.cos(math.Pi / 4).toFloat
    def mix(v: Array[Float]): Array[Float] = {
      val out = v.clone()
      for (a <- Seq(3, 7, 11)) {
        val (x, y) = (v(a), v(a + 1))
        out(a) = c * x - c * y
        out(a + 1) = c * x + c * y
      }
      out
    }
    val correlated = clustered.as[(Long, Array[Float])]
      .map { case (id, v) => (id, mix(v)) }.toDF("vec_id", "embedding")
      .cache()
    val queries = correlated.where($"vec_id" % 40 === 0)
    val exact = tops(Similarity.bruteForceTopK(correlated, queries,
      "vec_id", "embedding", 10))
    val base = java.nio.file.Files.createTempDirectory("graft_opq").toString
    def recallAt(dir: String, rotate: Boolean): Double = {
      val idx = graft.operators.IvfIndex.create(correlated, "vec_id",
        "embedding", dir, numCentroids = 16, kmeansIters = 2, pqM = 4,
        pqKsub = 4, pqRotate = rotate)
      val got: Set[(Long, Long, Long)] =
        idx.probe(queries, "vec_id", "embedding", 10, nProbe = 8)
          .as[(Long, Long, Long)].collect().toSet
      recallOf(exact, got.groupBy(_._1).view.mapValues(_.map(_._2)).toMap)
    }
    val plain = recallAt(s"$base/plain", rotate = false)
    val rotated = recallAt(s"$base/rot", rotate = true)
    assert(rotated >= plain,
      s"OPQ rotation lowered recall: $rotated < $plain")
    assert(rotated >= 0.7, s"rotated recall $rotated below 0.7")
    // the rotation survives the meta round trip and probes identically
    val reload = graft.operators.IvfIndex.load(spark, s"$base/rot")
    assert(reload.pqRot.isDefined)
    val again: Set[(Long, Long, Long)] =
      reload.probe(queries, "vec_id", "embedding", 10, nProbe = 8)
        .as[(Long, Long, Long)].collect().toSet
    assert(recallOf(exact,
      again.groupBy(_._1).view.mapValues(_.map(_._2)).toMap) == rotated)
  }

  test("clusterOutliers: per-cluster z-scores, singleton clusters never flag, layout-deterministic") {
    // cluster 0 (centroid = unit x): four tight members + one far outlier;
    // cluster 1 (centroid = unit y): exactly one member (singleton)
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat, 0f, 0f)
    val cents = Seq((0L, v(1, 0)), (1L, v(0, 1))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, v(1.00, 0.01)), (11L, v(0.99, 0.02)), (12L, v(1.01, 0.01)),
      (13L, v(1.00, 0.02)), (14L, v(3.00, 0.00)), // far outlier, cluster 0
      (20L, v(0.10, 0.90))) // the only cluster-1 member
      .toDF("vec_id", "embedding")
    val got = Similarity.clusterOutliers(corpus, cents, "vec_id", "embedding")
      .as[(Long, Long, Double, Option[Double], Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(14L)._2 == 0L && got(14L)._5, s"far point not flagged: ${got(14L)}")
    assert(got(14L)._4.exists(_ >= 2.0))
    for (id <- Seq(10L, 11L, 12L, 13L)) assert(!got(id)._5, s"$id flagged")
    // singleton cluster: std 0 -> z null, never an outlier
    assert(got(20L)._2 == 1L && got(20L)._4.isEmpty && !got(20L)._5)
    // layout-deterministic (exact decimal moments): identical on 1 vs 7 parts
    val again = Similarity.clusterOutliers(corpus.repartition(7), cents,
      "vec_id", "embedding")
      .as[(Long, Long, Double, Option[Double], Boolean)].collect().toSet
    assert(again == got.values.toSet)
  }

  test("pqTopK falls back to brute force on an empty corpus slice") {
    val out = Similarity.pqTopK(corpus.where($"vec_id" < 0), corpus,
      "vec_id", "embedding", 3)
    assert(out.count() == 0)
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

  test("jacobiEigen: hand-solvable symmetric matrices") {
    // [[2,1],[1,2]] -> eigenvalues 3, 1; vectors (1,1)/sqrt2, (1,-1)/sqrt2
    val (e2, v2) = Similarity.jacobiEigen(Array(2.0, 1.0, 1.0, 2.0), 2)
    val pairs = (0 until 2).map(i => e2(i) -> Array(v2(i), v2(2 + i)))
      .sortBy(-_._1)
    assert(math.abs(pairs(0)._1 - 3.0) < 1e-12 && math.abs(pairs(1)._1 - 1.0) < 1e-12)
    val r2 = 1.0 / math.sqrt(2.0)
    val top = (0 until 2).map(r => v2(r * 2 + (0 until 2).maxBy(i => e2(i))))
    assert(math.abs(math.abs(top(0) * r2 + top(1) * r2) - 1.0) < 1e-10,
      s"top vector ${top.toSeq} not aligned with (1,1)/sqrt2")
    // diagonal matrix passes through
    val (e3, _) = Similarity.jacobiEigen(
      Array(5.0, 0, 0, 0, 2.0, 0, 0, 0, 9.0), 3)
    assert(e3.sorted.toSeq == Seq(2.0, 5.0, 9.0))
  }

  test("pcaTopK recovers planted principal directions, orthonormal, ordered") {
    val rnd = new scala.util.Random(31)
    val d = 8
    // orthonormal planted directions e0 and (e1+e2)/sqrt2
    val u1 = Array.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
    val u2 = Array.tabulate(d)(i => if (i == 1 || i == 2) 1.0 / math.sqrt(2) else 0.0)
    val rows = (1 to 400).map { _ =>
      val a = rnd.nextGaussian() * 10 // dominant variance
      val b = rnd.nextGaussian() * 3
      Array.tabulate(d)(i =>
        (a * u1(i) + b * u2(i) + rnd.nextGaussian() * 0.05).toFloat)
    }
    val df = rows.map(Tuple1(_)).toDF("embedding").repartition(5)
    val out = Similarity.pcaTopK(df, "embedding", 4)
      .select("component", "eigenvalue", "explained_var", "loadings")
      .as[(Int, Double, Double, Seq[Double])].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1, 2, 3, 4))
    // eigenvalues sorted desc, roughly 100 / 9 / noise
    assert(out(0)._2 > out(1)._2 && out(1)._2 > out(2)._2)
    assert(out(0)._2 > 60 && out(1)._2 > 5 && out(2)._2 < 1)
    // direction recovery
    def dot(x: Seq[Double], y: Array[Double]) = x.zip(y).map(p => p._1 * p._2).sum
    assert(math.abs(dot(out(0)._4, u1)) > 0.95, s"pc1 = ${out(0)._4}")
    assert(math.abs(dot(out(1)._4, u2)) > 0.95, s"pc2 = ${out(1)._4}")
    // orthonormal loadings
    for (i <- 0 until 4; j <- i until 4) {
      val g = dot(out(i)._4, out(j)._4.toArray)
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(g - want) < 1e-8, s"gram($i,$j) = $g")
    }
    // explained variance consistent and bounded
    assert(out.map(_._3).sum <= 1.0 + 1e-9)
    assert(math.abs(out(0)._3 - out(0)._2 / (out.map(_._2).sum +
      (4 until d).map(_ => 0.0).sum) ) < 0.2) // pc1 dominates
    // sign convention: largest-|loading| coordinate positive
    out.foreach { r =>
      val m = r._4.maxBy(math.abs)
      assert(m > 0, s"sign convention violated: ${r._4}")
    }
    // partition-layout tolerance (quality, not bits)
    val out1 = Similarity.pcaTopK(df.coalesce(1), "embedding", 2)
      .select("eigenvalue").as[Double].collect().sorted.toSeq
    val outN = out.take(2).map(_._2).sorted.toSeq
    assert(out1.zip(outN).forall { case (x, y) => math.abs(x - y) < 1e-6 * (1 + y) })
  }

  test("pcaTopK guards: empty/degenerate corpora fail loudly") {
    intercept[IllegalArgumentException](
      Similarity.pcaTopK(Seq(Tuple1(Array(1f, 2f))).toDF("embedding"),
        "embedding", 5).collect())
    intercept[Exception](
      Similarity.pcaTopK(
        spark.emptyDataset[Tuple1[Array[Float]]].toDF("embedding"),
        "embedding", 1).collect())
  }
}
