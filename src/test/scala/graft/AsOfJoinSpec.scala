package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 00:00:00"), 100.0),
    (1L, ts("2024-01-01 00:05:00"), 101.0),
    (2L, ts("2024-01-01 00:01:00"), 50.0)
  ).toDF("key", "qts", "price")

  private lazy val trades = Seq(
    (1L, ts("2024-01-01 00:03:00"), 10),  // matches quote @00:00
    (1L, ts("2024-01-01 00:05:00"), 20),  // equal ts matches quote @00:05
    (1L, ts("2023-12-31 00:00:00"), 30),  // before any quote → unmatched
    (3L, ts("2024-01-01 00:10:00"), 40)   // key with no quotes → unmatched
  ).toDF("key", "tts", "qty")

  test("backward as-of picks the newest right row at or before the left ts") {
    val out = AsOfJoin.backward(trades, quotes, Seq("key"), "tts", "qts")
      .select("key", "qty", "r_price").as[(Long, Int, Double)].collect().toSet
    assert(out == Set((1L, 10, 100.0), (1L, 20, 101.0)))
  }

  test("forward as-of picks the earliest right row at or after the left ts") {
    // reuse the fixtures with roles flipped in time: for each trade, the
    // next quote at or after it
    val out = AsOfJoin.forward(trades, quotes, Seq("key"), "tts", "qts")
      .select("key", "qty", "r_price").as[(Long, Int, Double)].collect().toSet
    // trade@00:03 → quote@00:05; trade@00:05 → equal-ts quote@00:05;
    // trade@2023 → first 2024 quote; key 3 unmatched
    assert(out == Set((1L, 10, 101.0), (1L, 20, 101.0), (1L, 30, 100.0)))
  }

  test("tolerance gates stale matches in both directions; outer keeps the row") {
    val H = 3600L * 1000000
    // backward with 4-minute tolerance: trade@00:03's newest quote is
    // @00:00 (3 min, in); trade@2023 has none; equal ts is gap 0
    val bw = AsOfJoin.backward(trades, quotes, Seq("key"), "tts", "qts",
        toleranceMicros = Some(4L * 60 * 1000000))
      .select("key", "qty", "r_price").as[(Long, Int, Double)].collect().toSet
    assert(bw == Set((1L, 10, 100.0), (1L, 20, 101.0)))
    // forward with 1h tolerance: the 2023 trade's next quote is a year
    // ahead — gated out even though a match EXISTS
    val fw = AsOfJoin.forward(trades, quotes, Seq("key"), "tts", "qts",
        toleranceMicros = Some(H))
      .select("key", "qty", "r_price").as[(Long, Int, Double)].collect().toSet
    assert(fw == Set((1L, 10, 101.0), (1L, 20, 101.0)))
    // outer + tolerance: the gated row survives with a null match
    val outer = AsOfJoin.forward(trades, quotes, Seq("key"), "tts", "qts",
        inner = false, toleranceMicros = Some(H))
      .select("key", "qty", "r_price").as[(Long, Int, Option[Double])]
      .collect().toSet
    assert(outer == Set((1L, 10, Some(101.0)), (1L, 20, Some(101.0)),
      (1L, 30, None), (3L, 40, None)))
  }

  test("physical-operator path matches the window formulation on the small case") {
    val out = AsOfJoin.backwardExec(trades, quotes, Seq("key"), "tts", "qts")
      .select("key", "qty", "r_price").as[(Long, Int, Double)].collect().toSet
    assert(out == Set((1L, 10, 100.0), (1L, 20, 101.0)))
  }

  test("physical-operator path matches the window formulation on real events (incl. self-join)") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "event_id", "r_event_id")
        .as[(Long, Long, Long)].collect().toSet
    val window = rows(AsOfJoin.backward(purchases, clicks, Seq("user_id"), "ts", "ts"))
    val exec = rows(AsOfJoin.backwardExec(purchases, clicks, Seq("user_id"), "ts", "ts"))
    assert(exec == window)
    assert(exec.nonEmpty)
  }

  test("post-join filters on probe columns push through to the probe scan") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    def side(t: String) = ev.where(col("event_type") === t)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val joined = AsOfJoin.backwardExec(side("purchase"), side("click"),
      Seq("user_id"), "ts", "ts")
    val filtered = joined.where(col("value") > 25.0) // probe-side column
    // the rule must land the predicate below AsOfJoinPlan in the optimized plan
    val optimized = filtered.queryExecution.optimizedPlan
    val pushed = optimized.collect {
      case j: graft.plans.AsOfJoinPlan => j.left.toString
    }.exists(s => s.contains("25.0"))
    assert(pushed, s"filter not pushed:\n$optimized")
    // and the results are identical to filtering without the rule's help
    val expected = AsOfJoin.backward(
      side("purchase").where(col("value") > 25.0), side("click"),
      Seq("user_id"), "ts", "ts")
    assert(filtered.count() == expected.count() && filtered.count() > 0)
  }

  test("exec path re-exchanges pre-shuffled inputs that are not co-partitioned") {
    import org.apache.spark.sql.functions.col
    val expected = Set((1L, 10, 100.0), (1L, 20, 101.0))
    // adversarial shapes: each child satisfies ClusteredDistribution on its
    // key by itself, but they are NOT co-partitioned with each other —
    // positional zipPartitions over them un-exchanged would mis-join
    val shapes = Seq(
      // same partition count, different partitioning function (hash vs range)
      (trades.repartition(4, col("key")), quotes.repartitionByRange(4, col("key"))),
      // different partition counts
      (trades.repartition(3, col("key")), quotes.repartition(5, col("key"))),
      // one side single-partition
      (trades.coalesce(1), quotes.repartition(7, col("key"))))
    for ((l, r) <- shapes) {
      val out = AsOfJoin.backwardExec(l, r, Seq("key"), "tts", "qts")
        .select("key", "qty", "r_price").as[(Long, Int, Double)].collect().toSet
      assert(out == expected, s"mis-join on pre-shuffled inputs ($l, $r)")
    }
  }

  test("physical-operator outer variant keeps unmatched left rows") {
    val out = AsOfJoin.backwardExec(trades, quotes, Seq("key"), "tts", "qts", inner = false)
    assert(out.count() == 4)
    assert(out.where($"r_price".isNull).select("qty").as[Int].collect().toSet == Set(30, 40))
  }

  test("bucketized range join equals the naive inequality join on real events") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    def side(t: String) = ev.where(col("event_type") === t)
      .select(col("user_id"), col("event_id"), col("ts"))
    val bucketized = graft.operators.RangeJoin.byKeyAndTime(
        side("purchase"), side("view"), Seq("user_id"), "ts", "ts", 900L, 300L)
      .select(col("event_id"), col("r_event_id"))
      .as[(Long, Long)].collect().toSet
    val naive = side("purchase").as("p").join(side("view").as("v"),
        col("p.user_id") === col("v.user_id")
          && col("v.ts").cast("double") >= col("p.ts").cast("double") - 900
          && col("v.ts").cast("double") <= col("p.ts").cast("double") + 300)
      .select(col("p.event_id"), col("v.event_id"))
      .as[(Long, Long)].collect().toSet
    assert(bucketized == naive)
    assert(bucketized.nonEmpty)
  }

  test("outer variant keeps unmatched left rows with null right columns") {
    val out = AsOfJoin.backward(trades, quotes, Seq("key"), "tts", "qts", inner = false)
    assert(out.count() == 4)
    assert(out.where($"r_price".isNull).select("qty").as[Int].collect().toSet == Set(30, 40))
  }
}
