package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear quality classifier over hashed bag-of-words features — the
  * fastText/CCNet-style model a production corpus pipeline trains to
  * generalize a rule-based quality signal (Gopher rules, wiki-vs-crawl
  * labels) beyond the rules themselves (Wenzek et al. 2020 "CCNet";
  * Joulin et al. 2017 "fastText" — both public). Re-expressed
  * Spark-first:
  *
  *  - FEATURES are the hashing trick: token → `xxhash64 mod dim`, values
  *    length-normalized counts (fastText's mean-of-embeddings at
  *    embedding-dim = vocab-hash-dim). Computed executor-side per row;
  *    the corpus is never collected or shuffled for training.
  *  - TRAINING is full-batch logistic regression: `iters` gradient steps,
  *    each ONE `treeAggregate` folding the dense `dim`-vector gradient
  *    (dim doubles ≈ 2 MB at 2^18 — a driver-held model, the same cost
  *    class as a k-means codebook; partials combine map-side up the
  *    tree, so the shuffle carries gradients, never rows). Full-batch
  *    (not SGD) keeps every pass order-INSENSITIVE up to float addition:
  *    no sample ordering exists to drift under partitioning.
  *  - SCORING is one stateless projection against the broadcast weights.
  *
  * Float sums across partitions make the fitted weights approximate
  * (~1e-12 relative per fold) rather than bit-identical across
  * partitionings — the spec pins loss descent, separation accuracy, and
  * cross-partitioning score agreement at tolerance instead (the
  * approximate-operator contract, like k-means).
  */
object QualityModel {

  /** A fitted model: `weights(dim)` + bias, with the training-loss path
    * kept for monitoring (loss should descend; a diverging lr is loud).
    */
  final case class Model(dim: Int, weights: Array[Double], bias: Double,
                         lossPath: Seq[Double]) extends Serializable

  private def hashedCounts(text: String, dim: Int): Array[(Int, Double)] = {
    val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
    if (toks.isEmpty) return Array.empty
    val m = new java.util.HashMap[Int, Double]()
    toks.foreach { t =>
      val h = ((scala.util.hashing.MurmurHash3.stringHash(t).toLong & 0x7fffffffL)
        % dim).toInt
      val prev = m.get(h)
      m.put(h, (if (m.containsKey(h)) prev else 0.0) + 1.0)
    }
    val inv = 1.0 / toks.length
    val out = new Array[(Int, Double)](m.size)
    val it = m.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = (e.getKey, e.getValue * inv)
      i += 1
    }
    out
  }

  @inline private def sigmoid(z: Double): Double =
    if (z >= 0) 1.0 / (1.0 + math.exp(-z))
    else { val e = math.exp(z); e / (1.0 + e) }

  /** Fit on `docs(textCol, labelCol)` (label 0/1; null-label rows are
    * ignored — semi-supervised feeds are normal). `l2` regularizes the
    * weights (not the bias), `lr` is the fixed step size.
    */
  def train(docs: DataFrame, textCol: String, labelCol: String,
            dim: Int = 1 << 16, iters: Int = 12, lr: Double = 2.0,
            l2: Double = 1e-6): Model = {
    require(dim > 0 && (dim & (dim - 1)) == 0, s"dim=$dim must be a power of two")
    require(iters > 0 && lr > 0 && l2 >= 0, s"bad iters=$iters lr=$lr l2=$l2")
    val spark = docs.sparkSession
    import spark.implicits._
    // featurize ONCE, pin the (features, label) pairs — every iteration
    // re-reads this cache, not the corpus
    val feats = docs
      .select(col(textCol).cast("string").as("t"),
        col(labelCol).cast("double").as("y"))
      .where(col("y").isNotNull)
      .as[(String, Double)]
      .mapPartitions(_.map { case (t, y) => (hashedCounts(t, dim), y) })
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = feats.count().toDouble
      require(n > 0, "quality model: no labeled rows")
      var w = new Array[Double](dim)
      var b = 0.0
      val losses = Seq.newBuilder[Double]
      for (_ <- 1 to iters) {
        val wB = spark.sparkContext.broadcast(w)
        val bL = b
        // fold (gradient(dim), biasGrad, loss) in one pass
        val (grad, gb, loss) = feats.rdd.treeAggregate(
          (new Array[Double](dim), 0.0, 0.0))(
          seqOp = { case ((g, gb0, l0), (xs, y)) =>
            val wv = wB.value
            var z = bL
            xs.foreach { case (i, v) => z += wv(i) * v }
            val p = sigmoid(z)
            val err = p - y
            xs.foreach { case (i, v) => g(i) += err * v }
            // numerically-stable log loss
            val li =
              if (y > 0.5) math.log1p(math.exp(-math.abs(z))) + math.max(-z, 0)
              else math.log1p(math.exp(-math.abs(z))) + math.max(z, 0)
            (g, gb0 + err, l0 + li)
          },
          combOp = { case ((g1, b1, l1), (g2, b2, l2s)) =>
            var i = 0
            while (i < dim) { g1(i) += g2(i); i += 1 }
            (g1, b1 + b2, l1 + l2s)
          })
        wB.destroy()
        val w2 = new Array[Double](dim)
        var i = 0
        while (i < dim) {
          w2(i) = w(i) - lr * (grad(i) / n + l2 * w(i))
          i += 1
        }
        w = w2
        b -= lr * gb / n
        losses += loss / n
      }
      Model(dim, w, b, losses.result())
    } finally feats.unpersist(false)
  }

  /** Persist a fitted model (weights + bias + loss path) as one small
    * parquet — a production pipeline trains once on a labeled slice and
    * scores every later ingest batch; the artifact is a few hundred KB
    * and loads driver-side like a codebook.
    */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model,
           dir: String): Unit = {
    import spark.implicits._
    Seq((model.dim, model.weights.toSeq, model.bias, model.lossPath))
      .toDF("dim", "weights", "bias", "loss_path")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a model persisted by [[save]]. */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Model = {
    val r = spark.read.parquet(dir).head()
    val m = Model(r.getInt(0), r.getSeq[Double](1).toArray, r.getDouble(2),
      r.getSeq[Double](3))
    require(m.weights.length == m.dim,
      s"corrupt quality model at $dir: ${m.weights.length} weights, dim ${m.dim}")
    m
  }

  /** Score every row: `quality_prob` = σ(w·x + b) against the broadcast
    * model — one stateless pass, no shuffle.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mB = spark.sparkContext.broadcast(model)
    // loud numeric-id contract: a non-numeric string id casts to null and
    // would silently drop the row's identity — raise instead (codegen'd
    // branch, zero cost on valid ids)
    val idAsLong = when(
      col(idCol).isNotNull && col(idCol).cast("long").isNull,
      raise_error(lit(s"QualityModel.score requires a numeric id column; " +
        s"'$idCol' has values that do not cast to long")))
      .otherwise(col(idCol).cast("long"))
    docs.select(idAsLong.as("doc_id"),
        col(textCol).cast("string").as("t"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val m = mB.value
        var z = m.bias
        hashedCounts(t, m.dim).foreach { case (i, v) => z += m.weights(i) * v }
        (id, sigmoid(z))
      })
      .toDF("doc_id", "quality_prob")
  }
}
