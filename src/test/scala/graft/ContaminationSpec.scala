package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bloom, Contamination}

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  // a corpus where some train docs share distinctive 4-gram runs with the
  // test docs and the rest share nothing
  private def corpus() = {
    val phrase = "the quick brown fox jumps over the lazy dog tonight"
    val docs =
      (1L to 10L).map(i => (i, s"train doc $i with $phrase and padding $i here")) ++
      (11L to 30L).map(i => (i, s"unrelated content number $i " +
        s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i")) ++
      (31L to 33L).map(i => (i, s"test doc $i containing $phrase exactly"))
    docs.toDF("doc_id", "text")
  }

  test("reportBloom equals report exactly, even at an adversarial fpp") {
    val df = corpus()
    val train = df.where(col("doc_id") <= 30)
    val test_ = df.where(col("doc_id") > 30)
    val exact = Contamination.report(train, test_, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture must produce contaminated pairs")
    for (fpp <- Seq(0.4, 0.01)) { // 0.4: false positives WILL ride through
      val bloomed = Contamination.reportBloom(train, test_, "doc_id", "text",
          fpp = fpp)
        .as[(Long, Long, Long)].collect().toSet
      assert(bloomed == exact, s"fpp=$fpp diverged")
    }
  }

  test("the Bloom probe prunes non-member rows and keeps every member") {
    val members = (1 to 200).map(i => s"member-$i").toDF("s")
    val bloom = Bloom.buildString(members, "s", 200, fpp = 0.01)
    val mixed = ((1 to 200).map(i => s"member-$i") ++
      (1 to 5000).map(i => s"other-$i")).toDF("s")
    val kept = mixed.where(Bloom.mightContain(col("s"), bloom))
      .as[String].collect()
    val keptSet = kept.toSet
    (1 to 200).foreach(i => assert(keptSet.contains(s"member-$i"),
      s"false negative: member-$i")) // Bloom contract: NO false negatives
    // at fpp 1% over 5000 non-members, surviving riders should be ~50;
    // 10x slack keeps the assertion box-stable while still proving pruning
    assert(kept.length <= 200 + 500,
      s"filter barely pruned: kept ${kept.length} of 5200")
  }

  test("null probe input yields null, null build rows are dropped") {
    val members = Seq(Some("a"), None, Some("b")).toDF("s")
    val bloom = Bloom.buildString(members, "s", 10)
    val probed = Seq(Some("a"), None, Some("zzz")).toDF("s")
      .select(col("s"), Bloom.mightContain(col("s"), bloom).as("hit"))
      .as[(Option[String], Option[Boolean])].collect().toMap
    assert(probed(Some("a")) == Some(true))
    assert(probed(None) == None)
    assert(probed(Some("zzz")) == Some(false) || probed(Some("zzz")) == Some(true))
  }

  test("noveltyCurve: first-seen shingle shares; short docs excluded") {
    val docs = Seq(
      (1L, "a b c d e"),  // both 4-grams first seen here → 1.0
      (2L, "a b c d x"),  // "a b c d" seen in d1, "b c d x" novel → 0.5
      (3L, "z")).toDF("doc_id", "text")
    val r = graft.operators.Contamination
      .noveltyCurve(docs, "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getDouble(3))).sortBy(_._1).toSeq
    assert(r === Seq((1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5)))
  }
}
