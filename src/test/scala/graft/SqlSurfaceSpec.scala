package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Behavior

/** The behavior suite's SQL surface (`window_funnel`, `sequence_match`,
  * `sequence_level`, `retention` registered via GraftExtensions): every
  * form must answer EXACTLY what the library DataFrame twin answers on the
  * same log — including under ties and arbitrary partitioning (which
  * exercises partial aggregation: update/serialize/merge/eval all run).
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000000 // 1h in micros
  private val steps = Seq("signup", "click", "purchase")

  /** Seeded random log: 60 users × ~40 events, coarse timestamps so
    * same-instant collisions actually occur.
    */
  private lazy val events: DataFrame = {
    val rnd = new scala.util.Random(4242)
    val ops = Seq("view", "signup", "click", "purchase", "error")
    val rows = for {
      u <- 1L to 60L
      _ <- 1 to (20 + rnd.nextInt(40))
    } yield (u, ops(rnd.nextInt(ops.size)),
      // 10-minute grid over ~3 days → plenty of per-user ties
      (rnd.nextInt(72 * 6).toLong * 10 * 60 * 1000000))
    val df = rows.toDF("user_id", "event_type", "us")
      .withColumn("t", timestamp_micros(col("us")))
      .repartition(7, col("us")) // deliberately NOT keyed by user
      .cache()
    df.count()
    df.createOrReplaceTempView("sql_surface_events")
    df
  }

  test("window_funnel in SQL equals Behavior.windowFunnel") {
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    events // force view registration
    val viaSql = spark.sql(
      s"""SELECT user_id, window_funnel(${6 * H}, t,
         |         event_type = 'signup', event_type = 'click',
         |         event_type = 'purchase') AS funnel_level
         |FROM sql_surface_events GROUP BY user_id""".stripMargin)
      .as[(Long, Long)].collect().toMap
    val viaLib = Behavior.windowFunnel(events, "user_id", "event_type", "t",
      steps, windowMicros = 6 * H).as[(Long, Long)].collect().toMap
    assert(viaSql == viaLib)
    assert(viaSql.values.exists(_ > 0), "degenerate fixture: nobody funneled")
  }

  test("sequence_match and sequence_level in SQL equal the library DP") {
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    events
    val viaSql = spark.sql(
      s"""SELECT user_id,
         |       sequence_level(${2 * H}, t, event_type = 'signup',
         |         event_type = 'click', event_type = 'purchase') AS lvl,
         |       sequence_match(${2 * H}, t, event_type = 'signup',
         |         event_type = 'click', event_type = 'purchase') AS ok
         |FROM sql_surface_events GROUP BY user_id""".stripMargin)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val lvls = Behavior.sequenceLevels(events, "user_id", "event_type", "t",
      steps, maxGapMicros = 2 * H).as[(Long, Long)].collect().toMap
    val match_ = Behavior.sequenceMatch(events, "user_id", "event_type", "t",
      steps, maxGapMicros = 2 * H).as[(Long, Boolean)].collect().toMap
    assert(viaSql.view.mapValues(_._1).toMap == lvls)
    assert(viaSql.view.mapValues(_._2).toMap == match_)
    // match is definitionally level == k on both paths
    viaSql.values.foreach { case (l, m) => assert(m == (l == steps.size)) }
  }

  test("retention in SQL rolls up to Behavior.retention's counts") {
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    events
    val viaSql = spark.sql(
      """WITH k AS (SELECT user_id,
        |             retention(event_type = 'signup', event_type = 'click',
        |               event_type = 'purchase') AS r
        |           FROM sql_surface_events GROUP BY user_id)
        |SELECT sum(CASE WHEN r[0] THEN 1 ELSE 0 END) AS r0,
        |       sum(CASE WHEN r[1] THEN 1 ELSE 0 END) AS r1,
        |       sum(CASE WHEN r[2] THEN 1 ELSE 0 END) AS r2
        |FROM k""".stripMargin).as[(Long, Long, Long)].head()
    val viaLib = Behavior.retention(events, "user_id",
        Seq(col("event_type") === "signup", col("event_type") === "click",
          col("event_type") === "purchase"))
      .as[(Long, Long, Long)].head()
    assert(viaSql == viaLib)
    assert(viaSql._1 > 0)
  }

  test("chain aggregates honor the strictly-before frame on ties") {
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    // signup and click at the same instant: no hop (both paths agree)
    Seq((1L, "signup", 1000L), (1L, "click", 1000L), (2L, "signup", 1000L),
      (2L, "click", 2000L))
      .toDF("user_id", "event_type", "us")
      .withColumn("t", timestamp_micros(col("us")))
      .createOrReplaceTempView("tie_events")
    val r = spark.sql(
      s"""SELECT user_id,
         |       window_funnel($H, t, event_type = 'signup',
         |         event_type = 'click') AS wf,
         |       sequence_level($H, t, event_type = 'signup',
         |         event_type = 'click') AS sl
         |FROM tie_events GROUP BY user_id""".stripMargin)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(r == Map(1L -> ((1L, 1L)), 2L -> ((2L, 2L))))
  }

  test("bad arguments fail loudly, not silently") {
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    events
    // non-literal window
    assertThrows[Exception] {
      spark.sql("""SELECT window_funnel(us, t, event_type = 'a',
                   event_type = 'b') FROM sql_surface_events""").collect()
    }
    // single condition
    assertThrows[Exception] {
      spark.sql("""SELECT retention(event_type = 'a')
                   FROM sql_surface_events""").collect()
    }
  }
}
