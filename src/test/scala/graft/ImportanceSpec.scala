package graft

import graft.operators.Importance
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  test("dsirWeights ranks target-looking docs above off-distribution docs") {
    // target = digit-heavy strings; pool = target + letter-heavy strings.
    // An unlabeled digit-heavy probe must outscore a letter-heavy one.
    val docs = Seq(
      (1L, "1234567890123456789012345678901234567890", true),
      (2L, "0987654321098765432109876543210987654321", true),
      (3L, "abcdefghijabcdefghijabcdefghijabcdefghij", false),
      (4L, "qrstuvwxyzqrstuvwxyzqrstuvwxyzqrstuvwxyz", false),
      (5L, "5566778899556677889955667788995566778899", false), // digit probe
      (6L, "kkllmmnnookkllmmnnookkllmmnnookkllmmnnoo", false) // letter probe
    ).toDF("doc_id", "text", "tgt")
    val w = Importance.dsirWeights(docs, "doc_id", "text", col("tgt"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(w(5L) > w(6L),
      s"digit probe must outscore letter probe: ${w(5L)} vs ${w(6L)}")
    assert(w(1L) > w(3L))
  }

  test("dsirWeights arithmetic on a fixture small enough to enumerate") {
    // two docs of 3 chars → 2 bigrams each; doc 1 is the whole target.
    // With buckets=64 the four bigrams hash to distinct buckets unless
    // they collide — use chars whose buckets we can compute directly.
    val docs = Seq((1L, "abc", true), (2L, "xyz", false))
      .toDF("doc_id", "text", "tgt")
    def bucket(c1: Char, c2: Char) = (c1.toInt * 131 + c2.toInt) % 64
    val bAb = bucket('a', 'b'); val bBc = bucket('b', 'c')
    val bXy = bucket('x', 'y'); val bYz = bucket('y', 'z')
    assert(Seq(bAb, bBc, bXy, bYz).distinct.size == 4, "fixture collision")
    // target totals: tt = 2; raw totals: tr = 4
    def lr(ct: Long, cr: Long) =
      math.floor(math.log(((ct + 1) * (4 + 64)).toDouble /
        ((cr + 1) * (2 + 64)).toDouble) * 1e6).toLong
    val lrTgt = lr(1, 1) // buckets of doc 1: in target and raw once
    val lrRaw = lr(0, 1) // buckets of doc 2: raw only
    val w = Importance.dsirWeights(docs, "doc_id", "text", col("tgt"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(w(1L)._2 == 2 && w(2L)._2 == 2)
    assert(w(1L)._3 == 2 * lrTgt, s"got ${w(1L)._3}, want ${2 * lrTgt}")
    assert(w(2L)._3 == 2 * lrRaw, s"got ${w(2L)._3}, want ${2 * lrRaw}")
    assert(math.abs(w(1L)._4 - w(1L)._3.toDouble / (1e6 * 2)) < 1e-6)
  }

  test("dsirWeights drops sub-bigram docs and is partitioning-invariant") {
    val docs = Seq((1L, "a", true), (2L, "", true)) ++
      (3L to 40L).map(i => (i, s"text-$i-${"ab" * (i % 5).toInt}", i % 3 == 0))
    def run(np: Int) =
      Importance.dsirWeights(
        docs.toDF("doc_id", "text", "tgt").repartition(np),
        "doc_id", "text", col("tgt"))
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val a = run(1)
    assert(a == run(11))
    assert(!a.exists(r => r._1 == 1L || r._2 == 2L && r._1 == 2L),
      "docs without bigrams must be dropped")
    assert(!a.map(_._1).contains(1L) && !a.map(_._1).contains(2L))
  }

  test("dsirWeights uses code points, so multibyte text buckets portably") {
    // must not throw and must bucket CJK bigrams deterministically
    val docs = Seq((1L, "汉字处理系统", false), (2L, "hello", true))
      .toDF("doc_id", "text", "tgt")
    val r = Importance.dsirWeights(docs, "doc_id", "text", col("tgt"))
      .as[(Long, Long, Long, Double)].collect().map(x => x._1 -> x._2).toMap
    assert(r(1L) == 5 && r(2L) == 4) // len−1 bigrams each
  }
}
