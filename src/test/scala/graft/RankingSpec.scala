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
}
