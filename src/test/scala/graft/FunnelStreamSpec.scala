package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Behavior
import graft.streaming.FunnelStream
import graft.streaming.FunnelStream.{FunnelEvent, FunnelLevel}

/** The live funnel's contract: its per-key state is exactly the batch
  * sequence DP's reach vector, so streamed levels over time-ordered
  * microbatches must EQUAL `Behavior.sequenceLevels` over the full feed.
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("signup", "click", "purchase")
  private val Gap = 3600L * 1000000 // 1h hops

  private def finalLevels(table: String): Map[Long, Int] =
    spark.table(table).as[FunnelLevel].collect()
      .groupBy(_.key).map { case (k, rows) => k -> rows.map(_.level).max }

  test("streamed levels equal the batch DP; only deepenings emit") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val q = FunnelStream.levels(input.toDS(), steps, Gap)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Update()).start()
    try {
      val H = 60L * 1000000 // a minute in micros
      // batch 1: user 1 signs up + clicks; user 2 signs up; user 3 noise
      input.addData(
        FunnelEvent(1L, "signup", 0), FunnelEvent(1L, "click", H),
        FunnelEvent(2L, "signup", 0), FunnelEvent(3L, "view", 0))
      q.processAllAvailable()
      assert(finalLevels("funnel_out") == Map(1L -> 2, 2L -> 1))
      val emittedAfterB1 = spark.table("funnel_out").count()

      // batch 2: user 1 purchases (within gap of the click); user 2 clicks
      // but TOO LATE (2h after signup); a stale re-delivery for user 1
      input.addData(
        FunnelEvent(1L, "purchase", 2 * H),
        FunnelEvent(2L, "click", 2 * Gap),
        FunnelEvent(1L, "signup", 0)) // replayed — no deepening, no emit
      q.processAllAvailable()
      assert(finalLevels("funnel_out") == Map(1L -> 3, 2L -> 1))

      // batch 3: a LATE click for user 2 within gap of its signup rescues
      // the chain; user 3 stays silent (never emitted at level 0)
      input.addData(FunnelEvent(2L, "click", 30 * 60 * 1000000L))
      q.processAllAvailable()
      assert(finalLevels("funnel_out") == Map(1L -> 3, 2L -> 2))
      assert(!finalLevels("funnel_out").contains(3L))

      // the batch anchor: same feed through the batch DP agrees
      val allEvents = Seq(
        (1L, "signup", 0L), (1L, "click", H), (2L, "signup", 0L),
        (3L, "view", 0L), (1L, "purchase", 2 * H), (2L, "click", 2 * Gap),
        (1L, "signup", 0L), (2L, "click", 30 * 60 * 1000000L))
        .toDF("user_id", "event_type", "us")
        .withColumn("t", timestamp_micros(col("us")))
      val batch = Behavior.sequenceLevels(allEvents, "user_id", "event_type",
          "t", steps, Gap)
        .as[(Long, Long)].collect().toMap
      val streamed = finalLevels("funnel_out")
      assert(batch.filter(_._2 > 0).map { case (k, v) => k -> v.toInt } ==
        streamed, s"batch $batch vs streamed $streamed")
      // no spurious emissions: every output row was a deepening
      val perKey = spark.table("funnel_out").as[FunnelLevel].collect()
        .groupBy(_.key).values
      assert(perKey.forall(rows => rows.map(_.level).distinct.length == rows.length))
      assert(emittedAfterB1 == 2) // exactly users 1 and 2 after batch 1
    } finally q.stop()
  }

  test("equal-timestamp events honor the strictly-before frame") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val q = FunnelStream.levels(input.toDS(), steps, Gap)
      .writeStream.format("memory").queryName("funnel_ties")
      .outputMode(OutputMode.Update()).start()
    try {
      // signup and click at the SAME instant: the batch DP's strictly-
      // before frame rejects the hop, so the streamed level must be 1
      input.addData(
        FunnelEvent(7L, "signup", 1000), FunnelEvent(7L, "click", 1000))
      q.processAllAvailable()
      assert(finalLevels("funnel_ties") == Map(7L -> 1))
      // a later click still completes the hop
      input.addData(FunnelEvent(7L, "click", 2000))
      q.processAllAvailable()
      assert(finalLevels("funnel_ties") == Map(7L -> 2))

      // the frame holds ACROSS batches too: a same-instant click arriving
      // in a later microbatch must not complete user 8's hop, and a
      // straggler OLDER than the applied signup must not fake a chain
      input.addData(FunnelEvent(8L, "signup", 5000))
      q.processAllAvailable()
      input.addData(FunnelEvent(8L, "click", 5000), // same instant, later batch
        FunnelEvent(8L, "click", 4000))             // straggler before signup
      q.processAllAvailable()
      assert(finalLevels("funnel_ties") == Map(7L -> 2, 8L -> 1))
    } finally q.stop()
  }

  test("a step op repeated in the funnel advances EVERY matching position") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val abab = Seq("signup", "click", "signup") // A,B,A — op at two positions
    val q = FunnelStream.levels(input.toDS(), abab, Gap)
      .writeStream.format("memory").queryName("funnel_repeat")
      .outputMode(OutputMode.Update()).start()
    try {
      val H = 60L * 1000000
      // signup → click → signup: the SECOND signup must complete position 3,
      // not merely refresh position 1 (the steps.indexOf trap)
      input.addData(FunnelEvent(20L, "signup", 0))
      q.processAllAvailable()
      input.addData(FunnelEvent(20L, "click", H))
      q.processAllAvailable()
      input.addData(FunnelEvent(20L, "signup", 2 * H))
      q.processAllAvailable()
      assert(finalLevels("funnel_repeat") == Map(20L -> 3))

      // and the batch twin agrees — the spec-pinned equality holds for
      // repeated-op step lists too
      val allEvents = Seq((20L, "signup", 0L), (20L, "click", H),
          (20L, "signup", 2 * H))
        .toDF("user_id", "event_type", "us")
        .withColumn("t", timestamp_micros(col("us")))
      val batch = Behavior.sequenceLevels(allEvents, "user_id", "event_type",
        "t", abab, Gap).as[(Long, Long)].collect().toMap
      assert(batch == Map(20L -> 3L))
    } finally q.stop()
  }

  test("stateTtl expires idle keys by watermark; expired keys start fresh") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val Min = 60L * 1000000
    val withWm = FunnelStream.withEventTimeWatermark(input.toDS(),
      java.time.Duration.ofMinutes(1))
    val q = FunnelStream.levels(withWm, steps, Gap,
        stateTtl = Some(java.time.Duration.ofMinutes(5)))
      .writeStream.format("memory").queryName("funnel_ttl")
      .outputMode(OutputMode.Update()).start()
    try {
      val B = 1_700_000_000_000_000L // epoch base well past the 0 watermark
      // user 9 signs up and clicks
      input.addData(FunnelEvent(9L, "signup", B),
        FunnelEvent(9L, "click", B + Min))
      q.processAllAvailable()
      assert(finalLevels("funnel_ttl") == Map(9L -> 2))

      // push the watermark far past user 9's TTL via another key, then
      // again so the expired state is actually evicted
      input.addData(FunnelEvent(10L, "signup", B + 60 * Min))
      q.processAllAvailable()
      input.addData(FunnelEvent(10L, "signup", B + 61 * Min))
      q.processAllAvailable()

      // user 9's purchase arrives after expiry: the old click is gone, so
      // NO level-3 completion — the chain restarted from nothing
      input.addData(FunnelEvent(9L, "purchase", B + 62 * Min))
      q.processAllAvailable()
      val levels = finalLevels("funnel_ttl")
      assert(levels(9L) == 2, s"expired key completed a stale chain: $levels")
      // and a fresh signup re-enters at level 1... which never re-emits a
      // LOWER level than already seen (2), so no new row for key 9
      input.addData(FunnelEvent(9L, "signup", B + 63 * Min))
      q.processAllAvailable()
      assert(finalLevels("funnel_ttl")(9L) == 2)
    } finally q.stop()
  }
}
