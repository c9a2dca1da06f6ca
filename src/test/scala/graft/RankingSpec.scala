package graft

import graft.operators.Ranking
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking.exactNtile / withGlobalRank must equal the single-partition
  * global-window formulation exactly — same bucket for every row — while
  * never moving the whole frame through one partition.
  */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def refNtile(df: org.apache.spark.sql.DataFrame, n: Int) =
    df.withColumn("expected",
      ntile(n).over(Window.orderBy(col("v").desc, col("id"))).cast("bigint"))

  test("exactNtile matches window ntile on uneven bucket sizes") {
    // 1003 rows: 1003 % 4 = 3, so buckets are 251,251,251,250 — exercises
    // the "first (total mod n) buckets get one extra row" rule.
    val df = (1 to 1003).map(i => (i.toLong, (i * 37 % 997).toLong)).toDF("id", "v")
    val got = Ranking.exactNtile(df, 4, Seq(col("v").desc, col("id")), "quartile")
    val joined = refNtile(df, 4).join(got, Seq("id", "v"))
    assert(joined.where(col("expected") =!= col("quartile")).count() === 0)
    assert(got.groupBy("quartile").count().orderBy("quartile")
      .collect().map(_.getLong(1)).toSeq === Seq(251L, 251L, 251L, 250L))
  }

  test("exactNtile is independent of the input's prior partitioning") {
    val df = (1 to 500).map(i => (i.toLong, (i * 13 % 101).toLong)).toDF("id", "v")
    val expected = refNtile(df, 3).select("id", "expected")
    for (reshaped <- Seq(df.repartition(1), df.repartition(7, col("id")),
        df.repartitionByRange(3, col("v")))) {
      val got = Ranking.exactNtile(reshaped, 3, Seq(col("v").desc, col("id")), "b")
      assert(expected.join(got, "id").where(col("expected") =!= col("b")).count() === 0)
    }
  }

  test("withGlobalRank is a 1..N permutation matching row_number") {
    val df = (1 to 777).map(i => (i.toLong, (i * 7 % 31).toLong)).toDF("id", "v")
    val got = Ranking.withGlobalRank(df, Seq(col("v"), col("id")), "rk")
    val ref = df.withColumn("rk_ref",
      row_number().over(Window.orderBy(col("v"), col("id"))).cast("bigint"))
    assert(ref.join(got, Seq("id", "v")).where(col("rk") =!= col("rk_ref")).count() === 0)
  }

  test("exactNtile leaves no persisted blocks behind") {
    // delta-based: other suites sharing the session may have their own
    // legitimately persisted frames; exactNtile must not ADD any
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = (1 to 2000).map(i => (i.toLong, (i * 31 % 503).toLong)).toDF("id", "v")
    val got = Ranking.exactNtile(df, 4, Seq(col("v").desc, col("id")), "q")
    assert(got.count() === 2000)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"rankWithTotal must not leave cached/checkpointed blocks pinned: $leaked")
  }

  test("exactNtile of an empty frame is empty, n=1 puts all rows in bucket 1") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(Ranking.exactNtile(empty, 4, Seq(col("v"), col("id")), "b").count() === 0)
    val df = (1 to 9).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    val one = Ranking.exactNtile(df, 1, Seq(col("v"), col("id")), "b")
    assert(one.where(col("b") =!= 1).count() === 0)
  }

  /** Driver-side reference: smallest v whose cumulative weight ≥ ⌈p·W/100⌉. */
  private def bruteWeighted(rows: Seq[(Double, Long)], p: Int): Double = {
    val kept = rows.filter(_._2 > 0).sortBy(_._1)
    val w = kept.map(_._2).sum
    val target = (w * p + 99L) / 100L
    var cum = 0L
    kept.find { case (_, wt) => cum += wt; cum >= target }.get._1
  }

  test("weightedPercentiles matches the brute-force cut on a skewed corpus") {
    // heavy tail + duplicated values (ties) + varied weights; fanout far
    // smaller than the distinct count so cells hold many values
    val rows = (1 to 3000).map { i =>
      val v = if (i % 7 == 0) 1000.0 + (i % 13) else (i % 97).toDouble
      (v, (i % 5 + 1).toLong)
    }
    val df = rows.toDF("v", "w")
    val got = Ranking.weightedPercentiles(df, "v", "w", Seq(10, 50, 90, 99),
        fanout = 16)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(10L, 50L, 90L, 99L))
    for (p <- Seq(10, 50, 90, 99))
      assert(got(p.toLong) == bruteWeighted(rows, p), s"p=$p")
  }

  test("weightedPercentiles: constant column, null/zero weights, empty input") {
    val const = Seq((5.0, 3L), (5.0, 2L)).toDF("v", "w")
    val g = Ranking.weightedPercentiles(const, "v", "w", Seq(50, 100))
      .as[(Long, Double)].collect().toMap
    assert(g == Map(50L -> 5.0, 100L -> 5.0))
    // zero/negative weights and null values are dropped, not counted
    val mixed = Seq((Some(1.0), 0L), (Some(2.0), -4L), (None, 9L), (Some(3.0), 1L))
      .toDF("v", "w")
    val m = Ranking.weightedPercentiles(mixed, "v", "w", Seq(50))
      .as[(Long, Double)].collect().toMap
    assert(m == Map(50L -> 3.0))
    val empty = Seq.empty[(Double, Long)].toDF("v", "w")
    assert(Ranking.weightedPercentiles(empty, "v", "w", Seq(50)).count() === 0)
  }

  test("timingQuantiles: grid zones, lower-bound rule, negative clamp") {
    import graft.operators.Ranking
    // all three grid zones + a negative (clamps to 0):
    // grid values with counts: 0(1), 5(2), 100(1), 1023(1), 1024(2),
    // 30704(1), 30720(2) — n = 10
    val ms = Seq(5L, 5L, 100L, 1023L, 1024L, 1039L, 30719L, 30720L, 31000L, -7L)
    val df = ms.map(("a", _)).toDF("g", "ms").repartition(5)
    val r = Ranking.timingQuantiles(df, "g", col("ms"), Seq(10, 50, 90, 99))
      .as[(String, Int, Long)].collect().map(x => x._2 -> x._3).toMap
    assert(r == Map(10 -> 0L, 50 -> 1023L, 90 -> 30720L, 99 -> 30720L))
    // clampToClickHouse: the >=30720 ms tail flattens to the 30000
    // sentinel, which sorts BELOW the 16 ms zone's top cells (30704 here)
    // — ClickHouse's own non-monotonic corner, reproduced: the sentinel
    // absorbs q90 but the last in-zone cell still carries q99
    val c = Ranking.timingQuantiles(df, "g", col("ms"), Seq(10, 50, 90, 99),
        clampToClickHouse = true)
      .as[(String, Int, Long)].collect().map(x => x._2 -> x._3).toMap
    assert(c == Map(10 -> 0L, 50 -> 1023L, 90 -> 30000L, 99 -> 30704L))
  }
}
