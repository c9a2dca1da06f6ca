package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns using Spark's
  * higher-order functions — no UDFs, no serialization off the JVM row
  * format. Accumulation is sequential left-to-right (the `aggregate` HOF
  * contract), so results are deterministic across partitionings.
  */
object VectorFunctions {

  /** Elementwise product-sum of two equal-length vectors, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision — delegates to the native
    * one-pass [[graft.expressions.CosineSim]] (bit-identical to the HOF
    * formulation `dot/(‖a‖·‖b‖)`, ~3×dim fewer interpreted lambda calls).
    */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.NativeFunctions.cosineSim(a, b)

  /** Squared euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Random-hyperplane signature bit: sign of dot(v, plane) where plane
    * components are derived deterministically from (seed, dim index) via a
    * splitmix-style integer hash — reproducible across the cluster with no
    * broadcast state.
    */
  def hyperplaneBit(v: Column, seed: Int): Column = {
    val planed = zip_with(v, sequence(lit(0), size(v) - 1), (x, i) => {
      // deterministic pseudo-random weight in [-1,1) from (seed, i)
      val h = hash(i.cast("int"), lit(seed)).cast("double")
      x.cast("double") * (h / 2147483648.0)
    })
    (aggregate(planed, lit(0.0), (acc, x) => acc + x) >= 0).cast("int")
  }

  /** k-bit random-hyperplane LSH bucket id for a vector — native one-pass
    * [[graft.expressions.HyperplaneLsh]], bit-identical to composing
    * [[hyperplaneBit]] (same murmur-derived planes).
    */
  def lshBucket(v: Column, bits: Int): Column =
    graft.expressions.NativeFunctions.hyperplaneLsh(v, bits)

  /** Symmetric int8 quantization of a float vector: scale = max|x|/127,
    * codes = round(x/scale) — 4× smaller storage for ANN candidate stores.
    * Returns struct(scale double, codes array<int>); exact zero vectors get
    * scale 0 and all-zero codes.
    */
  def quantizeInt8(v: Column): Column = {
    val maxAbs = aggregate(v, lit(0.0), (acc, x) =>
      greatest(acc, abs(x.cast("double"))))
    val scale = maxAbs / 127.0
    struct(scale.as("scale"),
      transform(v, x => when(lit(0.0) === scale, lit(0))
        .otherwise(round(x.cast("double") / scale).cast("int"))).as("codes"))
  }

  /** Inverse of [[quantizeInt8]]: codes × scale, back to array<double>. */
  def dequantizeInt8(q: Column): Column =
    transform(q.getField("codes"), c => c.cast("double") * q.getField("scale"))
}
