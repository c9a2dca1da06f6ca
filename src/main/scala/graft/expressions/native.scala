package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.bridge

/** Column-API entry points for graft's native Catalyst expressions. */
object NativeFunctions {

  /** k-permutation MinHash signature over w-shingles of a token array. */
  def minhashSig(tokens: Column, shingleWidth: Int, k: Int): Column =
    bridge.column(TokenMinHash(bridge.expression(tokens), shingleWidth, k))

  /** Banded-LSH bucket digests (length `bands`) of the w-shingle MinHash. */
  def minhashBands(tokens: Column, shingleWidth: Int, k: Int, bands: Int): Column =
    bridge.column(TokenMinHash(bridge.expression(tokens), shingleWidth, k, bands))

  /** 64-bit SimHash of an `array<long>` of token hashes. */
  def simhash64(tokenHashes: Column): Column =
    bridge.column(SimHash64(bridge.expression(tokenHashes)))

  /** Jaccard similarity of two sorted distinct `array<long>` columns.
    * With `minJ` > 0, sub-threshold pairs early-exit and return −1.
    */
  def sortedJaccard(a: Column, b: Column, minJ: Double = -1.0): Column =
    bridge.column(SortedJaccard(bridge.expression(a), bridge.expression(b), minJ))

  /** Overlap count |a ∩ b| of two sorted distinct `array<long>` columns.
    * With a positive per-row `required`, unreachable pairs early-exit and
    * return −1.
    */
  def sortedOverlap(a: Column, b: Column, required: Column): Column =
    bridge.column(SortedOverlap(bridge.expression(a), bridge.expression(b),
      bridge.expression(required)))

  /** Winnowed rolling-hash fingerprint set of a string column (MOSS). */
  def rollingFingerprint(text: Column, k: Int = 8, w: Int = 16): Column =
    bridge.column(RollingFingerprint(bridge.expression(text), k, w))

  /** SQL-replicable whole-string polynomial hash (the fingerprint
    * family's B=1000003 + splitmix64; see [[RollingFingerprint.hashString]]).
    */
  def polyHash64(text: Column): Column =
    bridge.column(PolyHash64(bridge.expression(text)))

  /** Hashed char-bigram DSIR feature buckets — one linear code-point pass. */
  def charBigramBuckets(text: Column, buckets: Int): Column =
    bridge.column(CharBigramBuckets(bridge.expression(text), buckets))

  /** One-pass cosine similarity of two `array<float|double>` columns. */
  def cosineSim(a: Column, b: Column): Column =
    bridge.column(CosineSim(bridge.expression(a), bridge.expression(b)))

  /** Isolation-forest path-length sum over a flattened forest (see
    * [[IForestPathSum]]); `features` are the double feature columns the
    * trees' node feature indices refer to.
    */
  def iforestPathSum(features: Seq[Column], feats: Array[Int],
                     thr: Array[Double], lefts: Array[Int],
                     rights: Array[Int], leafs: Array[Double],
                     roots: Array[Int]): Column =
    bridge.column(IForestPathSum(features.map(bridge.expression),
      feats, thr, lefts, rights, leafs, roots))

  /** Random-hyperplane LSH bucket id of an embedding column. */
  def hyperplaneLsh(v: Column, bits: Int): Column =
    bridge.column(HyperplaneLsh(bridge.expression(v), bits))

  /** `bands` independent hyperplane bucket ids (bitsPerBand sign bits each). */
  def hyperplaneBands(v: Column, bitsPerBand: Int, bands: Int): Column =
    bridge.column(HyperplaneBands(bridge.expression(v), bitsPerBand, bands))

  /** Packed int8 quantization: struct(scale double, codes binary). */
  def packInt8(v: Column): Column =
    bridge.column(PackInt8(bridge.expression(v)))

  /** Cosine of packed int8 codes (`binary`) vs a float/double query vector. */
  def int8CosineSim(codes: Column, q: Column): Column =
    bridge.column(Int8CosineSim(bridge.expression(codes), bridge.expression(q)))

  /** Membership probe of a string column against broadcast Bloom bytes
    * (built by [[graft.operators.Bloom.buildString]]). No false negatives.
    */
  def bloomMightContain(c: Column,
      bloom: org.apache.spark.broadcast.Broadcast[Array[Byte]]): Column =
    bridge.column(BloomMightContain(bridge.expression(c), bloom))

  /** Readability counters [words, sentences, syllables] — one fused char
    * pass (see [[TextStats]]).
    */
  def textStats(text: Column): Column =
    bridge.column(TextStats(bridge.expression(text)))

  /** Raw-deflate(level 6) byte count of the UTF-8 text — the
    * compression-ratio quality-filter input (see [[DeflateSize]]).
    */
  def deflateSize(text: Column): Column =
    bridge.column(DeflateSize(bridge.expression(text)))
}
