package graft

import graft.expressions.NativeFunctions
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The fused one-pass readability kernel must agree with the declarative
  * regex formulation EXACTLY — hand cases, then property equivalence on
  * randomized text over the full ASCII classification surface plus
  * non-ASCII noise (which neither formulation counts).
  */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private def both(texts: Seq[String]) = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val st = NativeFunctions.textStats(col("text"))
    val native = df.select(col("id"), st(0).as("w"), st(1).as("s"),
      st(2).as("sy")).as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val regex = df.select(col("id"),
      TextFunctions.alphaWordCount(col("text")).as("w"),
      TextFunctions.sentenceCount(col("text")).as("s"),
      TextFunctions.syllableEstimate(col("text")).as("sy"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    (native.toSeq, regex.toSeq)
  }

  test("hand cases: runs, floors, all-consonant words, empty") {
    val (n, r) = both(Seq(
      "Hello world. This is great stuff!",
      "xyz 123", // vowelless word → 1 syllable; no [.!?] → 1 sentence
      "", // zero words, sentence floor 1, zero syllables
      "a.b.c...d!?e", // punctuation runs: . . ... !? → 4 sentence runs
      "YyyY AEIOU bcd", // y is a vowel; an all-vowel word; a consonant word
      "don't re-up")) // apostrophes/hyphens split letter runs
    assert(n == r)
    assert(n(0) == ((0L, 6L, 2L, 7L)))
    assert(n(3) == ((3L, 5L, 4L, 5L)))
    assert(n(4) == ((4L, 3L, 1L, 3L)))
    assert(n(5) == ((5L, 4L, 1L, 4L)))
  }

  test("deflate_size: deterministic, repetition compresses, codegen ≡ " +
    "direct compute, SQL surface registered") {
    import graft.expressions.DeflateSize
    import org.apache.spark.unsafe.types.UTF8String
    val repetitive = "the same line over and over\n" * 40
    val varied = (1 to 40).map(i => s"line $i ${i * 7919} ${i * 104729}\n")
      .mkString
    // deterministic across calls
    assert(DeflateSize.compute(UTF8String.fromString(varied)) ==
      DeflateSize.compute(UTF8String.fromString(varied)))
    // the quality-filter premise: repetition compresses far better
    val zr = DeflateSize.compute(UTF8String.fromString(repetitive))
    val zv = DeflateSize.compute(UTF8String.fromString(varied))
    assert(repetitive.length >= varied.length && zr < zv / 2,
      s"zr=$zr zv=$zv")
    // empty still emits a (tiny) terminator, never a crash
    assert(DeflateSize.compute(UTF8String.fromString("")) > 0)
    // the codegen'd column path equals the direct compute, nulls flow
    val df = Seq((1L, repetitive), (2L, varied), (3L, null))
      .toDF("id", "text")
    val got = df.select(col("id"),
        NativeFunctions.deflateSize(col("text")).as("z"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got(1L) == zr && got(2L) == zv && got(3L) == -1L)
    // registered SQL scalar
    val viaSql = df.sparkSession
    org.apache.spark.sql.graft.bridge.registerFunctions(viaSql)
    df.createOrReplaceTempView("dz_docs")
    assert(viaSql.sql(
      "SELECT deflate_size(text) FROM dz_docs WHERE id = 2")
      .collect()(0).getLong(0) == zv)
  }

  test("property: native kernel ≡ regex formulation on randomized text") {
    val charGen = Gen.frequency(
      6 -> Gen.alphaChar,
      2 -> Gen.oneOf(' ', ' ', '.', '!', '?', ',', ';', '-', '\''),
      1 -> Gen.numChar,
      1 -> Gen.oneOf('é', 'ß', 'Ж', '中', '€'))
    val gen = Gen.listOfN(30,
      Gen.choose(0, 80).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString)))
    for (i <- 1L to 10L) {
      val texts = gen.apply(Gen.Parameters.default, Seed(i)).get
      val (n, r) = both(texts)
      assert(n == r, s"seed $i")
    }
  }
}
