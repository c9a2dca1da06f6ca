package graft

import graft.functions.TextFunctions
import graft.operators.{Graph, Survival}
import org.apache.spark.sql.functions._

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private val DAY = 86400000000L

  test("kaplanMeier: hand-computed survival with censoring; order-free") {
    // c1 orders day 0/10/25 → event gaps {10, 15}, censored 0 (last order
    // IS the horizon); c2 orders day 0 → censored 25. Distinct times
    // ascending: 0(c), 10(d), 15(d), 25(c); n_total=4.
    //   t=10: n_risk 3 (the 0-day censor ended earlier) → S = 2/3
    //   t=15: n_risk 2 → S = (2/3)·(1/2) = 1/3
    val orders = Seq((1L, 0L), (1L, 10L * DAY), (1L, 25L * DAY),
      (2L, 0L)).toDF("cust", "us")
      .select(col("cust"), timestamp_micros(col("us")).as("ots"))
    def run(np: Int) =
      Survival.kaplanMeier(orders.repartition(np), "cust", "ots")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSeq
    val got = run(1)
    assert(got === Seq(
      (10L, 3L, 1L, 0L, 0.666667),
      (15L, 2L, 1L, 0L, 0.333333)))
    assert(run(5) === got)
  }

  test("kaplanMeier: absorbed at zero when the whole risk set dies") {
    // one customer, orders day 0 and 5; horizon = day 5 → censored gap 0,
    // event gap 5 with n_risk 1 = d → survival exactly 0.0, no ln(0)
    val orders = Seq((1L, 0L), (1L, 5L * DAY)).toDF("cust", "us")
      .select(col("cust"), timestamp_micros(col("us")).as("ots"))
    val r = Survival.kaplanMeier(orders, "cust", "ots").collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 5L && r(0).getLong(1) == 1L &&
      r(0).getDouble(4) == 0.0)
  }

  test("kaplanMeierBySegment: independent curves, shared global horizon") {
    // segment A = the single-customer fixture from the hand case above;
    // segment B has one order AT the horizon → censored gap 0 only.
    // B's presence must not change A's curve (its own at-risk set), but
    // the HORIZON is global: A's last order (day 25) defines it.
    val orders = Seq(("A", 1L, 0L), ("A", 1L, 10L * DAY), ("A", 1L, 25L * DAY),
      ("A", 2L, 0L), ("B", 9L, 25L * DAY)).toDF("seg", "cust", "us")
      .select(col("seg"), col("cust"), timestamp_micros(col("us")).as("ots"))
    val r = Survival.kaplanMeierBySegment(orders, "cust", "ots", "seg")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getDouble(5))).toSeq
    assert(r === Seq(("A", 10L, 3L, 0.666667), ("A", 15L, 2L, 0.333333)))
  }

  test("bfsHops: chain distances from the min node; unreachable excluded") {
    // path 1–2–3–4 plus a disconnected pair {10,11}: hop census from
    // seed 1 is 1/1/1/1 over hops 0..3; the island never appears
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L),
      (4L, 3L), (10L, 11L), (11L, 10L)).toDF("src", "dst")
    val full = Graph.bfsHops(edges, "src", "dst", 6)
      .as[(Long, Long)].collect().toSeq
    assert(full === Seq((0L, 1L), (1L, 1L), (2L, 1L), (3L, 1L)))
    // hop budget caps the frontier loop — never walks past maxHops
    val capped = Graph.bfsHops(edges, "src", "dst", 2)
      .as[(Long, Long)].collect().toSeq
    assert(capped === Seq((0L, 1L), (1L, 1L), (2L, 1L)))
    // empty edge list → empty census, not a crash
    assert(Graph.bfsHops(Seq.empty[(Long, Long)].toDF("src", "dst"),
      "src", "dst", 3).count() == 0)
  }

  test("readability + mojibake scalars: hand counts") {
    val df = Seq(
      // 6 words, 2 sentences, 7 syllables by vowel runs: hello=2 (e, o),
      // world=1, this=1, is=1, great=1 (the 'ea' run), stuff=1
      (1L, "Hello world. This is great stuff!"),
      (2L, "xyz 123"), // 1 alpha word, no vowels → 1 syllable (floor)
      (3L, "")).toDF("doc_id", "text")
    val r = df.select(col("doc_id"),
      TextFunctions.alphaWordCount(col("text")).as("w"),
      TextFunctions.sentenceCount(col("text")).as("s"),
      TextFunctions.syllableEstimate(col("text")).as("sy"),
      TextFunctions.fleschReadingEase(col("text")).as("f"))
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 6L && r(0).getLong(2) == 2L &&
      r(0).getLong(3) == 7L)
    // 206.835 − 1.015·3 − 84.6·(7/6) = 105.09
    assert(r(0).getDouble(4) == 105.09)
    assert(r(1).getLong(1) == 1L && r(1).getLong(2) == 1L &&
      r(1).getLong(3) == 1L)
    assert(r(2).getLong(1) == 0L && r(2).isNullAt(4))

    val m = Seq(("ok plain text", 13L),
      ("bad � and \u0007 ctl and Ã© soup", 20L))
      .toDF("text", "n_chars")
      .select(TextFunctions.mojibakeCounts(col("text")).as("mc"))
      .select(col("mc.n_replacement"), col("mc.n_control"),
        col("mc.n_latin1_marks")).collect()
    assert(m(0).getLong(0) == 0L && m(0).getLong(1) == 0L &&
      m(0).getLong(2) == 0L)
    assert(m(1).getLong(0) == 1L && m(1).getLong(1) == 1L &&
      m(1).getLong(2) == 1L)
  }
}
