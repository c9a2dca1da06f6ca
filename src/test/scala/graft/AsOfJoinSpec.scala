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

  test("outer variant keeps unmatched left rows with null right columns") {
    val out = AsOfJoin.backward(trades, quotes, Seq("key"), "tts", "qts", inner = false)
    assert(out.count() == 4)
    assert(out.where($"r_price".isNull).select("qty").as[Int].collect().toSet == Set(30, 40))
  }
}
