package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE vocabulary training — pinned against the hand-computable merge
  * sequence of the Sennrich et al. (ACL 2016) worked example: word
  * frequencies low×5, lower×2, newest×6, widest×3.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    Seq.fill(5)("low"), Seq.fill(2)("lower"),
    Seq.fill(6)("newest"), Seq.fill(3)("widest"))
    .flatten.grouped(4).map(_.mkString(" ")).toSeq
    .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .toDF("doc_id", "text")

  test("learnMerges reproduces the textbook merge sequence with total tie-breaks") {
    // initial pair counts peak at 9 for (e,s), (s,t), (t,</w>) — the
    // lexicographic tie-break must pick (e,s) first, then cascade
    val m = Bpe.learnMerges(corpus, "text", 6)
      .map(x => (x.step, x.left, x.right, x.freq))
    assert(m == Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "est", "</w>", 9L),
      (4, "l", "o", 7L),
      (5, "lo", "w", 7L),
      // at 6: (e,w) 6 from newest ties (n,e) 6 and (w,est</w>) 6 —
      // lexicographic left tie-break picks (e,w)
      (6, "e", "w", 6L)))
  }

  test("driver-collected and distributed merge loops agree exactly") {
    val local = Bpe.learnMerges(corpus, "text", 6)
    val dist = Bpe.learnMerges(corpus, "text", 6, driverWordCap = 0)
    assert(local == dist)
  }

  test("learnMerges is partitioning-invariant and stops when fully merged") {
    val a = Bpe.learnMerges(corpus, "text", 6)
    val b = Bpe.learnMerges(corpus.repartition(7), "text", 6)
    assert(a == b)
    // a single repeated word exhausts its pairs: ask for more merges than
    // exist and expect early stop, not an infinite loop
    val tiny = Seq((0L, "ab ab")).toDF("doc_id", "text")
    val m = Bpe.learnMerges(tiny, "text", 10)
    // a,b → ab; ab,</w> → ab</w>; then nothing mergeable remains
    assert(m.map(x => (x.left, x.right)) == Seq(("a", "b"), ("ab", "</w>")))
  }

  test("encodeStats applies merges in priority order (greedy inference)") {
    val merges = Bpe.learnMerges(corpus, "text", 6)
    // "lowest" was never seen whole; its encoding must still compose from
    // learned units: low + est</w>
    val enc = Bpe.encodeStats(
      Seq((42L, "lowest")).toDF("doc_id", "text"), "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().toSeq
    assert(enc == Seq((42L, 2L, 6L))) // 2 subwords, 6 payload chars
    // empty text: zero subwords, present
    val empty = Bpe.encodeStats(
      Seq((7L, "")).toDF("doc_id", "text"), "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().toSeq
    assert(empty == Seq((7L, 0L, 0L)))
  }

  test("non-BMP corpora: code-point symbols, path equality, encode round-trip") {
    // emoji are lone-surrogate landmines for a UTF-16-unit split: the
    // Dataset round-trip would mangle them and diverge the two paths
    val docs = Seq((0L, "😀😀x 😀😀x y😀"), (1L, "😀😀x 𝄞y"))
      .toDF("doc_id", "text")
    val local = Bpe.learnMerges(docs, "text", 4)
    val dist = Bpe.learnMerges(docs, "text", 4, driverWordCap = 0)
    assert(local == dist)
    // tie at freq 3: (😀,😀), (😀,x), (x,</w>) — code-point order puts
    // "x" (U+0078) before "😀" (U+1F600), so (x,</w>) merges first
    assert(local.head == Bpe.Merge(1, "x", Bpe.EndOfWord, 3L))
    // every learned symbol is well-formed: no unpaired surrogates survive
    local.flatMap(m => Seq(m.left, m.right)).foreach { sym =>
      val it = sym.codePoints().iterator()
      while (it.hasNext) {
        val cp = it.next()
        assert(cp < 0xD800 || cp > 0xDFFF, s"lone surrogate in '$sym'")
      }
    }
    val enc = Bpe.encodeStats(docs, "doc_id", "text", local)
      .orderBy("doc_id").collect()
    assert(enc.length == 2 && enc(0).getLong(1) > 0)
  }

  test("encodeStats tolerates null text as an ordinary zero-subword row") {
    val merges = Bpe.learnMerges(corpus, "text", 4)
    val dirty = Seq((1L, "low"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val enc = Bpe.encodeStats(dirty, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(enc == Seq((1L, enc.head._2, 3L), (2L, 0L, 0L)))
  }
}
