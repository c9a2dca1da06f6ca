package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Isolation forest anomaly scoring (Liu, Ting & Zhou 2008) — the
  * standard unsupervised outlier screen of a data pipeline: anomalies
  * isolate in few random splits, so short average path lengths score
  * high. `score ∈ (0,1)`, ≈0.5 for inliers, →1 for anomalies.
  *
  * Engine fit (the [[QualityModel]] / codebook pattern): the model is
  * DRIVER-HELD and bounded — `nTrees·sampleSize` sampled rows train the
  * trees locally (the sample is hash-ordered by the id column, so it is
  * deterministic and partitioning-independent), and scoring compiles
  * each tree into a nested `when()` COLUMN — pure Catalyst expressions
  * inside whole-stage codegen, no UDF, one linear pass over the data at
  * any scale. Fixed seed ⇒ bit-reproducible scores.
  */
object IsolationForest {

  /** Binary tree in array form; a leaf holds its precomputed path value
    * (depth + c(leaf size) — the unbuilt-subtree adjustment).
    */
  private[operators] final case class Node(feature: Int, threshold: Double,
                                           left: Int, right: Int,
                                           leafValue: Double)

  final case class Model(features: Seq[String], trees: Seq[Array[Node]],
                         sampleSize: Int) {
    /** Average-path-length normalizer c(n). */
    private def cFactor(n: Int): Double =
      if (n <= 1) 0.0
      else 2.0 * (math.log(n - 1.0) + 0.5772156649015329) - 2.0 * (n - 1.0) / n

    /** `df` + `scoreCol` = 2^(−avgPath/c(ψ)); null features route right
      * (nulls fail `<`), landing with the out-of-range mass.
      *
      * r20: the forest is flattened into ONE native
      * [[graft.expressions.IForestPathSum]] node instead of unrolling
      * each tree into nested `when()` expressions — 20 trees × 2^depth
      * nodes made a ~10k-node expression whose analysis/optimization
      * cost ~1.2 s per plan evaluation. Traversal semantics are
      * bit-identical (NULL and `>= threshold` both descend right; leaf
      * values sum in tree order — the old left-to-right `reduce(_ + _)`).
      */
    def score(df: DataFrame, scoreCol: String): DataFrame = {
      val total = trees.map(_.length).sum
      val feats = new Array[Int](total)
      val thr = new Array[Double](total)
      val lefts = new Array[Int](total)
      val rights = new Array[Int](total)
      val leafs = new Array[Double](total)
      val roots = new Array[Int](trees.size)
      var off = 0
      trees.zipWithIndex.foreach { case (t, ti) =>
        roots(ti) = off
        var i = 0
        while (i < t.length) {
          val nd = t(i)
          feats(off + i) = nd.feature
          thr(off + i) = nd.threshold
          lefts(off + i) = if (nd.left >= 0) off + nd.left else -1
          rights(off + i) = if (nd.right >= 0) off + nd.right else -1
          leafs(off + i) = nd.leafValue
          i += 1
        }
        off += t.length
      }
      // same implicit to-double comparison cast the old `col < lit(thr)`
      // expressions carried
      val featCols = features.map(f => col(f).cast("double"))
      val pathSum = graft.expressions.NativeFunctions.iforestPathSum(
        featCols, feats, thr, lefts, rights, leafs, roots)
      val avg = pathSum / trees.size
      df.withColumn(scoreCol,
        round(pow(lit(2.0), -avg / lit(cFactor(sampleSize))), 6))
    }
  }

  /** Train on a deterministic hash-ordered sample: `nTrees·sampleSize`
    * rows collect to the driver (bounded like a k-means codebook), each
    * tree takes its own disjoint slice, splits pick a seeded random
    * feature and a uniform threshold inside the node's value range, and
    * recursion stops at single/duplicate points or depth ⌈log₂ ψ⌉.
    */
  def train(df: DataFrame, idCol: String, features: Seq[String],
            nTrees: Int = 20, sampleSize: Int = 256,
            seed: Long = 42L): Model = {
    require(nTrees >= 1 && nTrees <= 200, s"bad nTrees=$nTrees")
    require(sampleSize >= 8 && sampleSize <= 4096, s"bad sampleSize=$sampleSize")
    val cols = features.map(f => col(f).cast("double").as(f))
    val rows = df.select(xxhash64(col(idCol)).as("__h") +: cols: _*)
      .where(features.map(col(_).isNotNull).reduce(_ && _))
      .orderBy(col("__h")).limit(nTrees * sampleSize)
      .drop("__h")
      .collect().map(r => Array.tabulate(features.size)(r.getDouble))
    require(rows.length >= sampleSize,
      s"need at least $sampleSize complete rows, got ${rows.length}")
    val rnd = new java.util.Random(seed)
    val depthLimit = math.ceil(math.log(sampleSize.toDouble)
      / math.log(2.0)).toInt
    def cFac(n: Int): Double =
      if (n <= 1) 0.0
      else 2.0 * (math.log(n - 1.0) + 0.5772156649015329) - 2.0 * (n - 1.0) / n
    def build(data: Array[Array[Double]], depth: Int,
              acc: scala.collection.mutable.ArrayBuffer[Node]): Int = {
      val idx = acc.length
      if (data.length <= 1 || depth >= depthLimit) {
        acc += Node(-1, 0.0, -1, -1, depth + cFac(data.length)); idx
      } else {
        // a feature with zero range cannot split; try a few, then leaf
        var tries = 0
        var f = -1
        var lo = 0.0
        var hi = 0.0
        while (f < 0 && tries < features.size * 2) {
          val cand = rnd.nextInt(features.size)
          var mn = Double.MaxValue
          var mx = Double.MinValue
          data.foreach { r =>
            if (r(cand) < mn) mn = r(cand)
            if (r(cand) > mx) mx = r(cand)
          }
          if (mx > mn) { f = cand; lo = mn; hi = mx }
          tries += 1
        }
        if (f < 0) { // all-duplicate block: a leaf of its size
          acc += Node(-1, 0.0, -1, -1, depth + cFac(data.length)); idx
        } else {
          val thr = lo + rnd.nextDouble() * (hi - lo)
          acc += Node(f, thr, -1, -1, 0.0) // children patched below
          val (l, r) = data.partition(_(f) < thr)
          val li = build(l, depth + 1, acc)
          val ri = build(r, depth + 1, acc)
          acc(idx) = acc(idx).copy(left = li, right = ri)
          idx
        }
      }
    }
    val trees = (0 until nTrees).map { t =>
      val slice = rows.slice(t * sampleSize, (t + 1) * sampleSize) match {
        case s if s.nonEmpty => s
        // fewer than nTrees·ψ distinct rows: trees reuse the pool
        case _ => rows.take(sampleSize)
      }
      val acc = scala.collection.mutable.ArrayBuffer.empty[Node]
      build(slice, 0, acc)
      acc.toArray
    }
    Model(features, trees, sampleSize)
  }
}
