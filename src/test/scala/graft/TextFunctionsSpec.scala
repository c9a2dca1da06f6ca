package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions.col

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the cat sat on the mat."),
    (1L, "mat. the on sat cat the"),  // same word set, reordered
    (2L, "le chat est sur le tapis et la table des les"),
    (3L, "word")
  ).toDF("id", "text")

  test("tokenCount counts whitespace tokens") {
    val n = docs.select(col("id"), tokenCount(col("text"))).as[(Long, Int)].collect().toMap
    assert(n(0L) == 6 && n(3L) == 1)
  }

  test("punctCount counts punctuation chars only") {
    val n = docs.select(col("id"), punctCount(col("text"))).as[(Long, Int)].collect().toMap
    assert(n(0L) == 1 && n(3L) == 0)
  }

  test("stopwordCount and ratio reflect the stopword list") {
    val n = docs.select(col("id"), stopwordCount(col("text"))).as[(Long, Int)].collect().toMap
    assert(n(0L) == 2) // two bare "the" ("mat." has punctuation attached)
  }

  test("langId picks the language with most marker hits") {
    val p = docs.select(col("id"), langId(col("text"))).as[(Long, String)].collect().toMap
    assert(p(0L) == "en")
    assert(p(2L) == "fr")
    assert(p(3L) == "und")
  }

  test("fingerprint is invariant under word reordering") {
    val fp = docs.select(col("id"), fingerprint(col("text"))).as[(Long, String)].collect().toMap
    assert(fp(0L) == fp(1L))
    assert(fp(0L) != fp(2L))
  }

  test("bpeTokenEstimate is ceil(chars/4)") {
    val n = docs.select(col("id"), bpeTokenEstimate(col("text"))).as[(Long, Long)].collect().toMap
    assert(n(3L) == 1L)
    assert(n(0L) == math.ceil(23 / 4.0).toLong)
  }
}
