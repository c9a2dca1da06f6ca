package graft

import graft.operators.Behavior

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnelLevels counts in-order step completion per key") {
    val events = Seq(
      // user 1: full ordered funnel
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 00:01:00")),
      (1L, "purchase", ts("2024-01-01 00:02:00")),
      // user 2: clicked before ever viewing (earliest click precedes view)
      (2L, "click", ts("2024-01-01 00:00:00")),
      (2L, "view", ts("2024-01-01 00:01:00")),
      // user 3: view only
      (3L, "view", ts("2024-01-01 00:00:00")),
      // user 4: no funnel steps at all
      (4L, "error", ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "event_type", "t")
    val levels = Behavior.funnelLevels(events, "user_id", "event_type", "t",
        Seq("view", "click", "purchase"))
      .as[(Long, Long)].collect().toMap
    assert(levels == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("cohortRetention assigns each key to its first-event week") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), // Monday week 1
      (1L, ts("2024-01-10 10:00:00")), // week 2 activity
      (2L, ts("2024-01-10 10:00:00"))  // first seen week 2
    ).toDF("user_id", "t")
    val m = Behavior.cohortRetention(events, "user_id", "t")
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val w1 = ts("2024-01-01 00:00:00")
    val w2 = ts("2024-01-08 00:00:00")
    assert(m == Map((w1, w1) -> 1L, (w1, w2) -> 1L, (w2, w2) -> 1L))
  }
}
