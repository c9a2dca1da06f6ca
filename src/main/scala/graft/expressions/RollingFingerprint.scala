package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer, Wilkerson, Aiken — SIGMOD
  * 2003, the MOSS algorithm): Rabin-Karp rolling hash over character
  * k-grams, then the minimum hash of each sliding window of `w` consecutive
  * k-gram hashes, deduplicated — a position-robust fingerprint set whose
  * size is ~2/(w+1) of the document length, guaranteed to share entries for
  * any sufficiently long common substring.
  *
  * Native expression: the rolling hash is inherently sequential per row and
  * would need an interpreted fold over characters as HOFs; here it is one
  * primitive pass per document inside whole-stage codegen.
  */
case class RollingFingerprint(child: Expression, k: Int = 8, w: Int = 16)
  extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"rolling_fingerprint needs a string child, got ${child.dataType}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      RollingFingerprint.compute(input.asInstanceOf[UTF8String], k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expressions.RollingFingerprint.compute($c, $k, $w));")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)

  override def prettyName: String = "rolling_fingerprint"
}

object RollingFingerprint {
  private final val B = 1000003L // polynomial base

  /** Rabin-Karp k-gram hashes + winnowing min-per-window, sorted distinct. */
  def compute(text: UTF8String, k: Int, w: Int): Array[Long] = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < k) return Array(hashRange(bytes, 0, n))
    // rolling k-gram hashes
    val nGrams = n - k + 1
    val grams = new Array[Long](nGrams)
    var h = 0L
    var pow = 1L // B^(k-1)
    var i = 0
    while (i < k) {
      h = h * B + (bytes(i) & 0xffL)
      if (i < k - 1) pow *= B
      i += 1
    }
    grams(0) = mix(h)
    i = 1
    while (i < nGrams) {
      h = (h - (bytes(i - 1) & 0xffL) * pow) * B + (bytes(i + k - 1) & 0xffL)
      grams(i) = mix(h)
      i += 1
    }
    // winnow: min of each window of w gram hashes (rightmost min on ties)
    val out = new java.util.TreeSet[java.lang.Long]()
    if (nGrams <= w) {
      var mn = grams(0); i = 1
      while (i < nGrams) { if (grams(i) <= mn) mn = grams(i); i += 1 }
      out.add(mn)
    } else {
      var start = 0
      while (start + w <= nGrams) {
        var mn = grams(start)
        var j = start + 1
        while (j < start + w) { if (grams(j) <= mn) mn = grams(j); j += 1 }
        out.add(mn)
        start += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var idx = 0
    while (it.hasNext) { arr(idx) = it.next(); idx += 1 }
    arr
  }

  private def hashRange(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    mix(h)
  }

  /** The family's whole-string hash: the same B=1000003 polynomial over
    * UTF-8 bytes + splitmix64 finalizer the fingerprint k-grams use —
    * mod-2^64 arithmetic throughout, so an independent SQL engine
    * replays it exactly with HUGEINT modular arithmetic (unlike Spark's
    * xxhash64, whose lane mixing has no tractable SQL dual). This is what
    * lets simhash signatures hash-match a DuckDB oracle.
    */
  def hashString(s: UTF8String): Long = {
    val bytes = s.getBytes
    hashRange(bytes, 0, bytes.length)
  }

  /** splitmix64 finalizer so rolling hashes spread over the long range. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}

/** Native whole-string polynomial hash ([[RollingFingerprint.hashString]])
  * as a codegen'd scalar — the SQL-replicable token hash for the simhash
  * signature path.
  */
case class PolyHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"polyhash64 needs a string child, got ${child.dataType}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    RollingFingerprint.hashString(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.RollingFingerprint.hashString($c);")

  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)

  override def prettyName: String = "polyhash64"
}
