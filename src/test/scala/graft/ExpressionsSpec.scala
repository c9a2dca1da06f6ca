package graft

import graft.expressions.{SimHash64, SortedJaccard, TokenMinHash}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Direct unit coverage of the native expressions' compute kernels (the
  * Column-level paths are exercised by DedupSpec via real plans).
  */
class ExpressionsSpec extends AnyFunSuite {

  private def toks(ws: String*) = new GenericArrayData(
    ws.map(w => UTF8String.fromString(w)).toArray[Any])

  test("TokenMinHash is deterministic and shingle-order sensitive") {
    val a = TokenMinHash.compute(toks("a", "b", "c", "d"), 3, 16, 0)
    val a2 = TokenMinHash.compute(toks("a", "b", "c", "d"), 3, 16, 0)
    val b = TokenMinHash.compute(toks("d", "c", "b", "a"), 3, 16, 0)
    assert(a.toSeq == a2.toSeq)
    assert(a.length == 16)
    assert(a.toSeq != b.toSeq)
  }

  test("TokenMinHash banded output has one digest per band") {
    val d = TokenMinHash.compute(toks("a", "b", "c", "d", "e"), 3, 64, 16)
    assert(d.length == 16)
  }

  test("identical token sets share all bands; disjoint sets share none") {
    val x = TokenMinHash.compute(toks("w1", "w2", "w3", "w4", "w5"), 3, 64, 16)
    val y = TokenMinHash.compute(toks("w1", "w2", "w3", "w4", "w5"), 3, 64, 16)
    val z = TokenMinHash.compute(toks("q1", "q2", "q3", "q4", "q5"), 3, 64, 16)
    assert(x.toSeq == y.toSeq)
    assert(x.zip(z).count { case (p, q) => p == q } == 0)
  }

  test("SimHash64 of one token equals that token's hash bits sign pattern") {
    val h = new GenericArrayData(Array[Any](5L))
    assert(SimHash64.compute(h) == 5L)
  }

  test("SimHash64 majority vote across tokens") {
    // two tokens with bit 0 set, one without → bit 0 survives
    val h = new GenericArrayData(Array[Any](1L, 1L, 0L))
    assert((SimHash64.compute(h) & 1L) == 1L)
  }

  test("SortedJaccard two-pointer merge matches set arithmetic") {
    def arr(xs: Long*) = new GenericArrayData(xs.toArray[Any])
    assert(SortedJaccard.compute(arr(1, 2, 3), arr(2, 3, 4), -1.0) == 2.0 / 4.0)
    assert(SortedJaccard.compute(arr(1, 2), arr(1, 2), -1.0) == 1.0)
    assert(SortedJaccard.compute(arr(1, 2), arr(3, 4), -1.0) == 0.0)
    assert(SortedJaccard.compute(arr(), arr(), -1.0) == 1.0)
  }

  test("thresholded SortedJaccard early-exits below t and is exact at/above t") {
    def arr(xs: Long*) = new GenericArrayData(xs.toArray[Any])
    // J = 0.5: below 0.8 → -1, at/below 0.5 → exact value
    assert(SortedJaccard.compute(arr(1, 2, 3), arr(2, 3, 4), 0.8) == -1.0)
    assert(SortedJaccard.compute(arr(1, 2, 3), arr(2, 3, 4), 0.5) == 0.5)
    // exact boundary: J = 0.8 must survive a 0.8 threshold
    assert(SortedJaccard.compute(arr(1, 2, 3, 4), arr(1, 2, 3, 4, 5), 0.8) == 0.8)
    // disjoint sets abort immediately regardless of size
    assert(SortedJaccard.compute(arr(1, 2, 3), arr(7, 8, 9), 0.1) == -1.0)
    // brute-force agreement on random-ish sets across thresholds
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val a = Seq.fill(rnd.nextInt(12))(rnd.nextInt(20).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(12))(rnd.nextInt(20).toLong).distinct.sorted
      val exact = SortedJaccard.compute(arr(a: _*), arr(b: _*), -1.0)
      for (t <- Seq(0.2, 0.5, 0.8)) {
        val got = SortedJaccard.compute(arr(a: _*), arr(b: _*), t)
        if (exact >= t) assert(got == exact) else assert(got == -1.0)
      }
    }
  }
}
