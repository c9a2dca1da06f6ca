package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a w-shingle, k-permutation MinHash
  * (Broder 1997, "On the resemblance and containment of documents")
  * over an `array<string>` token column — returning either the raw signature
  * (`bands = 0`) or the banded-LSH bucket digests (one 64-bit digest per
  * band of k/bands minima), ready to `posexplode` into (band, bucket) keys.
  *
  * Shingle i is tokens[i..i+w), hashed with FNV-1a over the token bytes
  * (order-sensitive mix across the window); permutation j of the MinHash is
  * (h * (2j+1) + j * 0x9e3779b9) mod (2^31 - 1) — a universal-hash family
  * with constants derived from j, reproducible with no runtime randomness.
  *
  * One primitive loop instead of the equivalent
  * `transform(sequence…slice…array_join)` + `aggregate` higher-order
  * pipeline, which costs k × n interpreted lambda invocations per row with
  * boxing (~60 ms/row at k=64, n≈120) AND generates several thousand lines
  * of whole-stage code (~4 s of janino compilation per cold run). Emitting
  * band digests directly also matters: a downstream projection slicing the
  * signature per band re-evaluates the whole signature once per band after
  * `CollapseProject` (lambda-internal references are not counted as
  * duplicated work by the optimizer).
  */
case class TokenMinHash(child: Expression, shingleWidth: Int, k: Int, bands: Int = 0)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    new GenericArrayData(TokenMinHash.compute(arr, shingleWidth, k, bands))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expressions.TokenMinHash.compute($c, $shingleWidth, $k, $bands));")

  override protected def withNewChildInternal(newChild: Expression): TokenMinHash =
    copy(child = newChild)

  override def prettyName: String = "token_minhash"
}

object TokenMinHash {
  private final val P = 2147483647L // 2^31 - 1
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  // private[graft]: PropertySpec pins this kernel against a hex-pair
  // UTF-8 byte replica of the DuckDB oracle formulation (r19 ASCII lift)
  private[graft] def fnv64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * FnvPrime
      i += 1
    }
    h
  }

  /** Tight primitive loop shared by interpreted eval and codegen. */
  def compute(tokens: ArrayData, w: Int, k: Int, bands: Int): Array[Long] = {
    val n = tokens.numElements()
    // per-token FNV-1a hashes, then order-sensitive window mix per shingle
    val tokHash = new Array[Long](n)
    var i = 0
    while (i < n) {
      tokHash(i) = fnv64(tokens.getUTF8String(i))
      i += 1
    }
    val nSh = math.max(n - w + 1, if (n > 0) 1 else 0)
    val shingle = new Array[Long](nSh)
    i = 0
    while (i < nSh) {
      var h = FnvOffset
      var j = 0
      while (j < w && i + j < n) {
        h = (h ^ tokHash(i + j)) * FnvPrime
        j += 1
      }
      shingle(i) = h & 0x7fffffffL
      i += 1
    }
    val sig = new Array[Long](k)
    var p = 0
    while (p < k) {
      val a = p * 2L + 1L
      val b = p * 0x9e3779b9L
      var mn = Long.MaxValue
      var s = 0
      while (s < nSh) {
        val v = Math.floorMod(shingle(s) * a + b, P)
        if (v < mn) mn = v
        s += 1
      }
      sig(p) = mn
      p += 1
    }
    if (bands <= 0) return sig
    // FNV-1a-style digest of each band's minima, seeded by band index
    val rows = k / bands
    val out = new Array[Long](bands)
    var bnd = 0
    while (bnd < bands) {
      var h = FnvOffset ^ bnd
      var r = 0
      while (r < rows) {
        h = (h ^ sig(bnd * rows + r)) * FnvPrime
        r += 1
      }
      out(bnd) = h
      bnd += 1
    }
    out
  }
}
