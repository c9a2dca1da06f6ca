package graft

import graft.operators.Fuzzy
import org.apache.spark.sql.functions._

/** Fuzzy.editPairs must equal the naive all-pairs edit-distance join —
  * the q-gram prefix blocking is a pure optimization (guaranteed recall),
  * including across the short-string fallback boundary at (d+1)·q chars.
  */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private lazy val strings = Seq(
    // short pairs (< 16 chars) — gram guarantee doesn't hold, fallback path
    (1L, "abcdefgh"), (2L, "abcdefgX"), (3L, "zbcdefgY"),
    // straddle pairs: one side below 16, one at/above — must still meet
    (4L, "aaaaaaaaaaaaaaa"), (5L, "aaaaaaaaaaaaaaaa"), (6L, "aaaaaaaaaaaaaaaabbb"),
    // long near pairs
    (7L, "the quick brown fox jumps"), (8L, "the quick brown fox jumped"),
    (9L, "the quick brown cat jumps"),
    // long far pair partner
    (10L, "completely unrelated string here"),
    // identical longs
    (11L, "duplicate duplicate duplicate"), (12L, "duplicate duplicate duplicate")
  ).toDF("id", "s")

  private def naive(maxDist: Int): Set[(Long, Long, Int)] = {
    val d = levenshtein(col("l.s"), col("r.s"), maxDist)
    strings.as("l").join(strings.as("r"), col("l.id") < col("r.id"))
      .where(d >= 0)
      .select(col("l.id"), col("r.id"), d.cast("int"))
      .as[(Long, Long, Int)].collect().toSet
  }

  test("editPairs equals naive all-pairs across short, straddle, and long strings") {
    for (maxDist <- Seq(1, 3)) {
      val got = Fuzzy.editPairs(strings, "id", "s", maxDist)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == naive(maxDist), s"mismatch at maxDist=$maxDist")
    }
  }

  test("editPairs respects block columns") {
    val blocked = strings.withColumn("grp", (col("id") % 2).cast("int"))
    val got = Fuzzy.editPairs(blocked, "id", "s", 3, Seq("grp"))
      .as[(Long, Long, Int)].collect().toSet
    val dist = levenshtein(col("l.s"), col("r.s"), 3)
    val want = blocked.as("l").join(blocked.as("r"),
        col("l.id") < col("r.id") && col("l.grp") === col("r.grp"))
      .where(dist >= 0)
      .select(col("l.id"), col("r.id"), dist.cast("int"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == want)
  }
}
