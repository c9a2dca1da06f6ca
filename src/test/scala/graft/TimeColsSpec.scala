package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.functions.TimeCols
import graft.operators.{AsOfJoin, Behavior, CdcOps, RangeJoin}

/** Operators must accept BOTH timestamp flavors (LTZ and NTZ): the driver's
  * testdata has shipped `events.ts` as parquet TIMESTAMP(NANOS) (read as
  * long), then as TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
  * TIMESTAMP_NTZ) — and `unix_micros`/cast-to-double reject NTZ at analysis.
  * Every time-arithmetic operator routes through [[TimeCols]]; this spec
  * feeds the same data in both flavors through each of them and demands
  * identical results (the session timezone is pinned UTC, so the flavors are
  * wall-clock-identical).
  */
class TimeColsSpec extends SparkSpec {
  import spark.implicits._

  // (key, op, epoch-seconds) fixture rendered in both flavors
  private val raw = Seq(
    (1L, "signup", 100L), (1L, "click", 160L), (1L, "purchase", 4000L),
    (2L, "signup", 50L), (2L, "purchase", 70L), (2L, "click", 90L),
    (3L, "click", 10L), (3L, "click", 8000L))

  private def flavored(ntz: Boolean): DataFrame = {
    val df = raw.toDF("user_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    if (ntz) df.withColumn("ts", col("ts").cast(TimestampNTZType)) else df
  }

  // passthrough payload columns legitimately keep their input flavor, so
  // normalize every timestamp-ish column to epoch micros before comparing
  private def collectSorted(df: DataFrame): Seq[String] = {
    val norm = df.select(df.schema.map { f =>
      f.dataType match {
        case TimestampType | TimestampNTZType => TimeCols.micros(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }: _*)
    norm.collect().map(_.toString).toSeq.sorted
  }

  private def bothFlavorsAgree(name: String)(f: DataFrame => DataFrame): Unit = {
    val ltz = f(flavored(ntz = false))
    val ntz = f(flavored(ntz = true))
    assert(collectSorted(ltz) == collectSorted(ntz), s"$name: NTZ != LTZ")
    assert(ltz.count() > 0, s"$name: empty fixture result")
  }

  test("TimeCols.micros/seconds accept both flavors and agree") {
    val both = flavored(ntz = true)
      .select(TimeCols.micros(col("ts")).as("us"), TimeCols.seconds(col("ts")).as("s"))
      .as[(Long, Double)].collect().toSet
    assert(both.contains((100000000L, 100.0)))
    assert(flavored(ntz = false).select(TimeCols.micros(col("ts")))
      .as[Long].collect().toSet == raw.map(_._3 * 1000000L).toSet)
  }

  test("changeRates accepts NTZ") {
    bothFlavorsAgree("changeRates") { df =>
      CdcOps.changeRates(df.withColumn("v", TimeCols.micros(col("ts"))),
        "user_id", "ts", "v")
    }
  }

  test("sessionize accepts NTZ") {
    bothFlavorsAgree("sessionize") { df =>
      CdcOps.sessionize(df, Seq("user_id"), "ts", gapSeconds = 1800L)
        .select(col("user_id"), col("event_type"), col("session_seq"))
    }
  }

  test("windowFunnel accepts NTZ") {
    bothFlavorsAgree("windowFunnel") { df =>
      Behavior.windowFunnel(df, "user_id", "event_type", "ts",
        Seq("signup", "purchase"), windowMicros = 3600L * 1000000L)
    }
    // semantic pin: user 2 completes within the window; user 1 stalls at
    // level 1 (signup→purchase gap 3900 s > the 3600 s window); user 3
    // never signs up
    val lvl = Behavior.windowFunnel(flavored(ntz = true), "user_id", "event_type",
        "ts", Seq("signup", "purchase"), 3600L * 1000000L)
      .as[(Long, Long)].collect().toMap
    assert(lvl == Map(1L -> 1L, 2L -> 2L, 3L -> 0L))
  }

  test("as-of join tolerance gate accepts NTZ") {
    bothFlavorsAgree("asof") { df =>
      val clicks = df.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"))
      val purchases = df.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"))
      AsOfJoin.backward(purchases, clicks, Seq("user_id"), "pts", "ts",
        toleranceMicros = Some(60L * 1000000L), inner = false)
    }
  }

  test("range join accepts NTZ") {
    bothFlavorsAgree("rangeJoin") { df =>
      val l = df.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"))
      val r = df.where(col("event_type") =!= "purchase")
        .select(col("user_id"), col("ts"))
      RangeJoin.byKeyAndTime(l, r, Seq("user_id"), "ts", "ts", 30L, 30L)
    }
  }

  test("Tables.load normalizes events.ts to TimestampType") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.limit(1).count() == 1)
  }

  test("Tables.load still converts the legacy long-nanos flavor exactly") {
    // rounds <= 10 shipped ts as parquet TIMESTAMP(NANOS), read as long
    // under nanosAsLong — the branch is no longer exercised by the current
    // testdata, so pin it here against a hand-written long column
    val dir = java.nio.file.Files.createTempDirectory("graft_nanos").toString
    Seq((1L, 1700000000123456789L), (2L, 1700000001000000000L))
      .toDF("event_id", "ts").write.parquet(s"$dir/events.parquet")
    val ev = Tables.load(spark, dir, "events")
    assert(ev.schema("ts").dataType == TimestampType)
    val got = ev.select(col("event_id"), TimeCols.micros(col("ts")))
      .as[(Long, Long)].collect().toMap
    // exact integral nanos->micros division
    assert(got == Map(1L -> 1700000000123456L, 2L -> 1700000001000000L))
  }
}
