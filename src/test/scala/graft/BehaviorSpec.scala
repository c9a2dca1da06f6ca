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

  test("adaptive histogram: separated clusters recovered; contracts hold anywhere") {
    import org.apache.spark.sql.functions.{col, udaf}
    val rnd = new scala.util.Random(42)
    // three well-separated value clusters with known masses
    val clustered = (Seq.fill(10)(1.0) ++ Seq.fill(5)(100.0) ++ Seq.fill(3)(1000.0))
      .map(v => v + rnd.nextDouble() * 0.1)
    val agg3 = udaf(new graft.expressions.AdaptiveHistogramAggregator(3),
      org.apache.spark.sql.Encoders.scalaDouble)
    val bins = clustered.toDF("v").coalesce(1)
      .agg(agg3(col("v")).as("b")).as[Seq[(Double, Double, Long)]].head()
    assert(bins.map(_._3) == Seq(10L, 5L, 3L), s"cluster masses lost: $bins")
    assert(bins.forall { case (lo, hi, _) => lo <= hi })

    // merge-order-independent contracts on scrambled random data: mass
    // conservation, bin budget, exact global bounds
    val values = Seq.fill(500)(rnd.nextDouble() * 1000)
    val agg8 = udaf(new graft.expressions.AdaptiveHistogramAggregator(8),
      org.apache.spark.sql.Encoders.scalaDouble)
    val got = values.toDF("v").repartition(8)
      .agg(agg8(col("v")).as("b")).as[Seq[(Double, Double, Long)]].head()
    assert(got.size <= 8 && got.map(_._3).sum == 500L)
    assert(got.map(_._1).min == values.min && got.map(_._2).max == values.max)
    assert(got.forall { case (lo, hi, n) => lo <= hi && n > 0 })
  }

  test("uniqUpTo: exact below the cap, capped marker above, merge-safe") {
    import org.apache.spark.sql.functions.{col, udaf}
    val agg = udaf(new graft.expressions.UniqUpToAggregator(3),
      org.apache.spark.sql.Encoders.STRING)
    val rows = Seq(
      (1L, Seq("a")), (2L, Seq("a", "b", "c")),
      (3L, Seq("a", "b", "c", "d")),                      // just over the cap
      (4L, (0 until 100).map(i => s"v$i")),               // far over the cap
      (5L, Seq("a", "a", "a")),                           // duplicates
      (6L, Seq("a", null, "b", null))                     // NULLs don't count
    ).flatMap { case (k, vs) => vs.map(v => (k, v)) }
      .toDF("k", "v").repartition(8) // force real partial-state merges
    val got = rows.groupBy(col("k")).agg(agg(col("v")).as("u"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 3L, 3L -> 4L, 4L -> 4L, 5L -> 1L, 6L -> 2L))
  }

  test("deltaSum: positive deltas only, reset-tolerant, deterministic ties") {
    import org.apache.spark.sql.functions.col
    val events = Seq(
      // key 1: 10 -> 15 -> 3 (reset) -> 8: deltas +5, 0, +5 = 10
      (1L, 0L, 10.0), (1L, 1L, 15.0), (1L, 2L, 3.0), (1L, 3L, 8.0),
      // key 2: single value -> 0
      (2L, 0L, 42.0),
      // key 3: strictly decreasing -> 0
      (3L, 0L, 9.0), (3L, 1L, 5.0), (3L, 2L, 1.0)
    ).map { case (k, seq, v) =>
      (k, seq, v, java.sql.Timestamp.valueOf(s"2024-01-01 00:00:0$seq"))
    }.toDF("k", "seq", "v", "t")
    val got = Behavior.deltaSum(events, "k", "t", "v", "seq")
      .as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 10.0, 2L -> 0.0, 3L -> 0.0))
  }

  test("sequenceCount: disjoint chains, refresh rule, restarts") {
    def us(m: Long) = { // m micros since epoch as a timestamp
      val t = new java.sql.Timestamp(m / 1000)
      t.setNanos(((m % 1000000) * 1000).toInt)
      t
    }
    val gap = 10L
    val events = Seq(
      // key 1: two clean disjoint chains A->B A->B -> 2
      (1L, "A", 0L), (1L, "B", 5L), (1L, "A", 20L), (1L, "B", 25L),
      // key 2: A A B B — the second A refreshes, the second B has no A -> 1
      (2L, "A", 0L), (2L, "A", 2L), (2L, "B", 3L), (2L, "B", 4L),
      // key 3: the refresh rescue — A(0) is too old for B(11), A(9) isn't
      (3L, "A", 0L), (3L, "A", 9L), (3L, "B", 11L),
      // key 4: gap expired, no rescue -> 0
      (4L, "A", 0L), (4L, "B", 11L),
      // key 5: interleaved other events don't consume anything -> 1
      (5L, "A", 0L), (5L, "x", 1L), (5L, "B", 2L),
      // key 6: B before any A -> 0
      (6L, "B", 0L), (6L, "A", 1L)
    ).map { case (k, o, m) => (k, o, us(m)) }.toDF("user_id", "event_type", "t")
    val got = Behavior.sequenceCount(events, "user_id", "event_type", "t",
        Seq("A", "B"), maxGapMicros = gap)
      .as[(String, Long)].collect().toMap
    assert(got == Map("1" -> 2L, "2" -> 1L, "3" -> 1L, "4" -> 0L,
      "5" -> 1L, "6" -> 0L))

    // a NULL key is a real group (the windowed siblings emit it too), not
    // the "no previous key" sentinel — its count must flush
    import org.apache.spark.sql.functions.{col, lit, when}
    val withNull = events.withColumn("user_id",
      when(col("user_id") === 1L, lit(null)).otherwise(col("user_id")))
    val gotNull = Behavior.sequenceCount(withNull, "user_id", "event_type",
        "t", Seq("A", "B"), maxGapMicros = gap)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(gotNull(None) == 2L && gotNull(Some("2")) == 1L)
  }

  test("sequenceCount matches a single-machine reference on random logs") {
    val rnd = new scala.util.Random(20260814L)
    val types = Array("A", "B", "C", "x")
    val gap = 15L
    val events = (1 to 600).map { _ =>
      (rnd.nextInt(50).toLong, rnd.nextInt(200).toLong,
        types(rnd.nextInt(types.length)))
    }
    // independent reference: same documented automaton, run naively on the
    // collected per-key logs — catches distribution/partition-boundary bugs
    val steps = Seq("A", "B", "C")
    def reference(evs: Seq[(Long, String)]): Long = {
      var level = 0; var lastTs = 0L; var count = 0L
      evs.sortBy(e => (e._1, e._2)).foreach { case (t, o) =>
        if (level < steps.size && o == steps(level) &&
            (level == 0 || t - lastTs <= gap)) {
          level += 1; lastTs = t
          if (level == steps.size) { count += 1; level = 0 }
        } else if (level > 0 && o == steps(level - 1)) lastTs = t
        else if (o == steps.head) { level = 1; lastTs = t }
      }
      count
    }
    val expected = events.groupBy(_._1).map { case (u, evs) =>
      u.toString -> reference(evs.map(e => (e._2, e._3)))
    }
    val df = events.map { case (u, m, op) =>
      val t = new java.sql.Timestamp(0L)
      t.setNanos((m * 1000).toInt)
      (u, t, op)
    }.toDF("user_id", "t", "op").repartition(7) // scramble the layout
    val got = Behavior.sequenceCount(df, "user_id", "op", "t", steps, gap)
      .as[(String, Long)].collect().toMap
    assert(got == expected)
  }

  test("sequenceMatch: each consecutive hop bounded separately") {
    val events = Seq(
      // user 1: hops of 1h each — total 2h exceeds nothing per-hop -> match
      (1L, "A", ts("2024-01-01 00:00:00")),
      (1L, "B", ts("2024-01-01 01:00:00")),
      (1L, "C", ts("2024-01-01 02:00:00")),
      // user 2: second hop too wide (3h) -> no match, even though a 4h
      // TOTAL window funnel would accept it
      (2L, "A", ts("2024-01-01 00:00:00")),
      (2L, "B", ts("2024-01-01 00:30:00")),
      (2L, "C", ts("2024-01-01 03:30:00")),
      // user 3: early broken chain rescued by a later B within gap of the
      // FIRST A — interleaved events are fine (no strictness)
      (3L, "A", ts("2024-01-01 00:00:00")),
      (3L, "D", ts("2024-01-01 00:10:00")),
      (3L, "B", ts("2024-01-01 01:30:00")),
      (3L, "C", ts("2024-01-01 02:30:00")),
      // user 4: steps out of order -> no match
      (4L, "B", ts("2024-01-01 00:00:00")),
      (4L, "A", ts("2024-01-01 00:30:00")),
      (4L, "C", ts("2024-01-01 01:00:00"))
    ).toDF("user_id", "event_type", "t")
    val got = Behavior.sequenceMatch(events, "user_id", "event_type", "t",
        Seq("A", "B", "C"), maxGapMicros = 2L * 3600 * 1000000)
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
    // contrast: the total-window funnel DOES accept user 2 at 4h
    val funnel = Behavior.windowFunnel(events, "user_id", "event_type", "t",
        Seq("A", "B", "C"), windowMicros = 4L * 3600 * 1000000)
      .as[(Long, Long)].collect().toMap
    assert(funnel(2L) == 3L)
  }

  test("retention: order-free retained-key counts, gated on the first condition") {
    import org.apache.spark.sql.functions.col
    val events = Seq(
      (1L, "signup"), (1L, "click"), (1L, "purchase"), // retained everywhere
      (2L, "signup"), (2L, "purchase"),                // no click
      (3L, "click"), (3L, "purchase"),                 // never signed up: excluded
      (4L, "purchase"), (4L, "signup")                 // order-free: still counts
    ).map { case (u, t) => (u, t, ts("2024-01-01 00:00:00")) }
      .toDF("user_id", "event_type", "t")
    val r = Behavior.retention(events, "user_id",
        Seq(col("event_type") === "signup", col("event_type") === "click",
          col("event_type") === "purchase"))
      .as[(Long, Long, Long)].head()
    assert(r == ((3L, 1L, 3L))) // 3 signups; 1 also clicked; all 3 purchased
  }

  test("windowFunnelStrictOrder: any intervening event breaks the chain") {
    val H = 3600L * 1000000
    val events = Seq(
      // user 1: A->B->C contiguous -> 3
      (1L, "A", ts("2024-01-01 00:00:00")),
      (1L, "B", ts("2024-01-01 00:10:00")),
      (1L, "C", ts("2024-01-01 00:20:00")),
      // user 2: the ClickHouse doc example A->B->D->C -> stops at 2
      (2L, "A", ts("2024-01-01 00:00:00")),
      (2L, "B", ts("2024-01-01 00:10:00")),
      (2L, "D", ts("2024-01-01 00:15:00")),
      (2L, "C", ts("2024-01-01 00:20:00")),
      // user 3: broken once, completed by a later contiguous restart -> 3
      (3L, "A", ts("2024-01-01 00:00:00")),
      (3L, "D", ts("2024-01-01 00:05:00")),
      (3L, "A", ts("2024-01-01 01:00:00")),
      (3L, "B", ts("2024-01-01 01:10:00")),
      (3L, "C", ts("2024-01-01 01:20:00")),
      // user 4: contiguous but the window expires between B and C -> 2
      (4L, "A", ts("2024-01-01 00:00:00")),
      (4L, "B", ts("2024-01-01 00:30:00")),
      (4L, "C", ts("2024-01-01 03:00:00")),
      // user 5: a repeated first step is itself an intervention for the
      // earlier chain, but starts a fresh one -> 2
      (5L, "A", ts("2024-01-01 00:00:00")),
      (5L, "A", ts("2024-01-01 00:05:00")),
      (5L, "B", ts("2024-01-01 00:10:00")),
      // user 6: nothing relevant -> 0
      (6L, "D", ts("2024-01-01 00:00:00")),
      // user 7: the intervening event matches a DIFFERENT funnel condition
      // (C, out of order, between A and B) — consecutive-events semantics
      // break the chain here too, stricter than ClickHouse's documented
      // unrelated-event example -> 1
      (7L, "A", ts("2024-01-01 00:00:00")),
      (7L, "C", ts("2024-01-01 00:05:00")),
      (7L, "B", ts("2024-01-01 00:10:00")),
      (7L, "C", ts("2024-01-01 00:15:00"))
    ).toDF("user_id", "event_type", "t")
    val strict = Behavior.windowFunnelStrictOrder(events, "user_id",
        "event_type", "t", Seq("A", "B", "C"), windowMicros = 2 * H)
      .as[(Long, Long)].collect().toMap
    assert(strict == Map(1L -> 3L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 2L,
      6L -> 0L, 7L -> 1L))
    // the SQL aggregate implements the same consecutive-events rule
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    events.createOrReplaceTempView("wfso_events")
    val sqlGot = spark.sql(
      s"""SELECT user_id, window_funnel_strict(${2 * H}, t,
            event_type = 'A', event_type = 'B', event_type = 'C') AS lvl
          FROM wfso_events GROUP BY user_id""")
      .as[(Long, Long)].collect().toMap
    assert(sqlGot == Map(1L -> 3L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 2L,
      6L -> 0L, 7L -> 1L))
    // the default mode tolerates the intervention user 2 was broken by
    val loose = Behavior.windowFunnel(events, "user_id", "event_type", "t",
        Seq("A", "B", "C"), windowMicros = 2 * H)
      .as[(Long, Long)].collect().toMap
    assert(loose(2L) == 3L)
  }

  test("windowFunnelStrictOrder: tieCol makes same-timestamp rows deterministic") {
    val H = 3600L * 1000000
    // A and B land at the SAME instant; the event id (tie=1 for A, tie=2
    // for B) is the capture order. With tieCol, lag(1) sees A immediately
    // before B → level 2, on ANY physical layout; without one the sort is
    // ambiguous. Repartitioned shuffles exercise layout independence.
    val events = Seq(
      (1L, "A", 1L, ts("2024-01-01 00:00:00")),
      (1L, "B", 2L, ts("2024-01-01 00:00:00")),
      // user 2: capture order B then A at the same instant → no A-before-B
      // adjacency, level stops at 1 (the A)
      (2L, "B", 1L, ts("2024-01-01 00:00:00")),
      (2L, "A", 2L, ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "event_type", "eid", "t")
    for (parts <- Seq(1, 3)) {
      val r = Behavior.windowFunnelStrictOrder(events.repartition(parts),
          "user_id", "event_type", "t", Seq("A", "B"), windowMicros = H,
          tieCol = Some("eid"))
        .as[(Long, Long)].collect().toMap
      assert(r == Map(1L -> 2L, 2L -> 1L), s"parts=$parts: $r")
    }
  }

  test("windowFunnel: every chain start counts, window and order are exact") {
    val H = 3600L * 1000000 // an hour in micros
    val events = Seq(
      // user 1: clean chain inside the 2h window → 3
      (1L, "s1", ts("2024-01-01 00:00:00")),
      (1L, "s2", ts("2024-01-01 00:30:00")),
      (1L, "s3", ts("2024-01-01 01:00:00")),
      // user 2: the EARLY start can't finish (s3 at +3h), but a LATE
      // restart can — greedy-from-earliest would report 2, truth is 3
      (2L, "s1", ts("2024-01-01 00:00:00")),
      (2L, "s2", ts("2024-01-01 00:10:00")),
      (2L, "s1", ts("2024-01-01 02:30:00")),
      (2L, "s2", ts("2024-01-01 02:40:00")),
      (2L, "s3", ts("2024-01-01 03:00:00")),
      // user 3: steps in order but s3 falls just OUTSIDE the window of the
      // only chain start (2h + 1s) → 2
      (3L, "s1", ts("2024-01-01 00:00:00")),
      (3L, "s2", ts("2024-01-01 00:30:00")),
      (3L, "s3", ts("2024-01-01 02:00:01")),
      // user 4: s3 lands EXACTLY at start + window (inclusive bound) → 3
      (4L, "s1", ts("2024-01-01 00:00:00")),
      (4L, "s2", ts("2024-01-01 01:00:00")),
      (4L, "s3", ts("2024-01-01 02:00:00")),
      // user 5: s2 at the SAME timestamp as s1 — strict order rejects it
      (5L, "s1", ts("2024-01-01 00:00:00")),
      (5L, "s2", ts("2024-01-01 00:00:00")),
      // user 6: steps present but in the wrong time order → 1
      (6L, "s2", ts("2024-01-01 00:00:00")),
      (6L, "s1", ts("2024-01-01 00:30:00")),
      // user 7: no funnel steps at all → 0
      (7L, "x", ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "event_type", "t")
    val levels = Behavior.windowFunnel(events, "user_id", "event_type", "t",
        Seq("s1", "s2", "s3"), windowMicros = 2 * H)
      .as[(Long, Long)].collect().toMap
    assert(levels == Map(1L -> 3L, 2L -> 3L, 3L -> 2L, 4L -> 3L,
      5L -> 1L, 6L -> 1L, 7L -> 0L))
  }

  test("windowFunnel equals brute-force chain enumeration on random logs") {
    val steps = Seq("s1", "s2", "s3")
    val rnd = new scala.util.Random(20260813L)
    val types = Array("s1", "s2", "s3", "x")
    val W = 40L // micros; event times drawn from [0, 100] micros
    // (user, micros, op) — dense ts range so ties and boundary hits occur
    val events = (1 to 400).map { _ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(101).toLong,
        types(rnd.nextInt(types.length)))
    }
    def brute(evs: Seq[(Long, String)]): Long = {
      val Seq(a, b, c) = steps.map(s => evs.filter(_._2 == s).map(_._1))
      val l3 = a.exists(t1 => b.exists(t2 => t1 < t2 &&
        c.exists(t3 => t2 < t3 && t3 <= t1 + W)))
      val l2 = a.exists(t1 => b.exists(t2 => t1 < t2 && t2 <= t1 + W))
      if (l3) 3L else if (l2) 2L else if (a.nonEmpty) 1L else 0L
    }
    val expected = events.groupBy(_._1).map { case (u, evs) =>
      u -> brute(evs.map(e => (e._2, e._3)))
    }
    val df = events.map { case (u, m, op) =>
      val t = new java.sql.Timestamp(0L)
      t.setNanos((m * 1000).toInt) // m µs < 1 ms, so epoch-micros == m
      (u, t, op)
    }.toDF("user_id", "t", "op")
    val got = Behavior.windowFunnel(df, "user_id", "op", "t", steps, W)
      .as[(Long, Long)].collect().toMap
    assert(got == expected, {
      val diff = (got.keySet ++ expected.keySet)
        .filter(k => got.get(k) != expected.get(k))
      s"mismatch on users $diff"
    })
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

  test("hourOfWeekProfile buckets by ISO dow and hour with an exact mean") {
    import org.apache.spark.sql.functions.col
    val events = Seq(
      (ts("2024-01-01 09:15:00"), 1.0), // Monday 9
      (ts("2024-01-08 09:45:00"), 2.0), // next Monday 9 — same cell
      (ts("2024-01-07 23:10:00"), 5.0)  // Sunday 23
    ).toDF("t", "value")
    val cells = Behavior.hourOfWeekProfile(events, "t",
        col("value").cast("decimal(18,2)"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(cells == Map((1L, 9L) -> ((2L, 1.5)), (7L, 23L) -> ((1L, 5.0))))
  }

  test("minMaxScaled normalizes within each group; constant group maps to 0.5") {
    val df = Seq(
      ("a", 10.0), ("a", 20.0), ("a", 30.0),
      ("b", 7.0), ("b", 7.0)
    ).toDF("g", "v")
    val out = Behavior.minMaxScaled(df, "g", "v")
      .select("g", "v", "scaled").as[(String, Double, Double)].collect().toSet
    assert(out == Set(("a", 10.0, 0.0), ("a", 20.0, 0.5), ("a", 30.0, 1.0),
      ("b", 7.0, 0.5)))
    // schema: the helper column pair is dropped, `scaled` appended
    assert(Behavior.minMaxScaled(df, "g", "v").columns.toSeq == Seq("g", "v", "scaled"))
  }

  test("quantileBuckets: equi-depth bins, boundary values land in the lower bin") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val out = Behavior.quantileBuckets(df, "v", 4)
      .select("v", "bucket").as[(Double, Long)].collect().toMap
    // exact percentile boundaries of 1..100 at 0.25/0.5/0.75 are 25.75/50.5/75.25
    assert(out(1.0) == 0L && out(25.0) == 0L)
    assert(out(26.0) == 1L && out(50.0) == 1L)
    assert(out(51.0) == 2L && out(75.0) == 2L)
    assert(out(76.0) == 3L && out(100.0) == 3L)
    // equi-depth: every bucket holds exactly a quarter of the rows
    val sizes = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes == Map(0L -> 25, 1L -> 25, 2L -> 25, 3L -> 25))

    // a value exactly equal to a boundary goes to the LOWER bin
    val tied = Seq(1.0, 2.0, 2.0, 3.0).toDF("v")
    val tb = Behavior.quantileBuckets(tied, "v", 2)
      .select("v", "bucket").as[(Double, Long)].collect().toSet
    // median of (1,2,2,3) = 2.0; rows at 2.0 are NOT above it → bucket 0
    assert(tb == Set((1.0, 0L), (2.0, 0L), (3.0, 1L)))

    intercept[IllegalArgumentException](Behavior.quantileBuckets(df, "v", 1))
  }

  test("madOutliers: median/MAD cut is robust to the outlier itself") {
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("a", 4L, 4.0),
      ("a", 5L, 100.0), // med=3, mad=1: only this row exceeds 2*mad
      ("b", 6L, 5.0), ("b", 7L, 5.0), ("b", 8L, 5.0),
      ("b", 9L, 9.0)   // mad=0 group: every non-median row flags
    ).toDF("g", "id", "v")
    val out = Behavior.madOutliers(df, "g", "v", 2.0)
      .select("id", "med", "mad", "m_score")
      .as[(Long, Double, Double, Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(5L, 9L))
    assert(out(5L) == ((5L, 3.0, 1.0, Some(97.0))))
    assert(out(9L) == ((9L, 5.0, 0.0, None))) // undefined score in a MAD=0 group
    intercept[IllegalArgumentException](Behavior.madOutliers(df, "g", "v", 0.0))
  }

  test("exponentialMovingAvg: recurrence exact per key, partitioning-proof") {
    val df = Seq(
      (1L, 10L, 4.0, ts("2024-01-01 00:00:00")),
      (1L, 11L, 8.0, ts("2024-01-01 00:01:00")),
      (1L, 12L, 2.0, ts("2024-01-01 00:02:00")),
      (2L, 20L, 6.0, ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "event_id", "value", "t")
    val got = Behavior.exponentialMovingAvg(df, "user_id", "event_id",
        "value", "t", alpha = 0.5)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // 4 → .5·8+.5·4 = 6 → .5·2+.5·6 = 4; key 2 restarts at its own first
    assert(got == Map((1L, 10L) -> 4.0, (1L, 11L) -> 6.0, (1L, 12L) -> 4.0,
      (2L, 20L) -> 6.0))

    // same-timestamp rows: event_id tie-break makes the order (and the
    // EMA) deterministic under any input layout
    val tied = Seq(
      (5L, 2L, 100.0, ts("2024-01-01 00:00:00")),
      (5L, 1L, 0.0, ts("2024-01-01 00:00:00")),
      (5L, 3L, 50.0, ts("2024-01-01 00:00:01"))
    ).toDF("user_id", "event_id", "value", "t")
    for (parts <- Seq(1, 3)) {
      val r = Behavior.exponentialMovingAvg(tied.repartition(parts),
          "user_id", "event_id", "value", "t", 0.5)
        .as[(Long, Long, Double)].collect().sortBy(_._2).map(_._3).toSeq
      assert(r == Seq(0.0, 50.0, 50.0), s"parts=$parts: $r")
    }
    intercept[IllegalArgumentException](
      Behavior.exponentialMovingAvg(df, "user_id", "event_id", "value", "t", 0.0))
  }

  test("timeDecayedAvg: whole-half-life decay, restarts, no-gap degenerates to mean") {
    val H = 3600L * 1000000
    val df = Seq(
      (1L, 10L, 10.0, ts("2024-01-01 00:00:00")),
      (1L, 11L, 20.0, ts("2024-01-01 01:00:00")), // 1 half-life → d=0.5
      (1L, 12L, 30.0, ts("2024-01-01 03:00:00")), // 2 half-lives → d=0.25
      (2L, 20L, 7.0, ts("2024-01-01 00:00:00"))   // restart
    ).toDF("user_id", "event_id", "value", "t")
    val got = Behavior.timeDecayedAvg(df, "user_id", "event_id", "value",
        "t", H)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // 10 → (20+10·.5)/(1+.5) = 25/1.5 → (30+25·.25)/(1+1.5·.25) = 36.25/1.375
    assert(got((1L, 10L)) == 10.0)
    assert(got((1L, 11L)) == 25.0 / 1.5)
    assert(got((1L, 12L)) == 36.25 / 1.375)
    assert(got((2L, 20L)) == 7.0)

    // gaps shorter than a half-life decay by 2^0 = 1: the running MEAN
    val dense = Seq(
      (3L, 1L, 3.0, ts("2024-01-01 00:00:00")),
      (3L, 2L, 6.0, ts("2024-01-01 00:10:00")),
      (3L, 3L, 9.0, ts("2024-01-01 00:20:00"))
    ).toDF("user_id", "event_id", "value", "t")
    val m = Behavior.timeDecayedAvg(dense, "user_id", "event_id", "value",
        "t", H)
      .as[(Long, Long, Double)].collect().sortBy(_._2).map(_._3).toSeq
    assert(m == Seq(3.0, 4.5, 6.0))

    // partitioning invariance (bit-level)
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val rnd = new scala.util.Random(11)
    val big = (1 to 400).map(i => (i % 7L, i.toLong,
      rnd.nextDouble() * 100, ts("2024-01-01 00:00:00").getTime / 1000 +
        rnd.nextInt(100000)))
      .toDF("user_id", "event_id", "value", "secs")
      .select(col("user_id"), col("event_id"), col("value"),
        timestamp_seconds(col("secs")).as("t"))
    def run(parts: Int) =
      Behavior.timeDecayedAvg(big.repartition(parts), "user_id", "event_id",
          "value", "t", H)
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(run(1) == run(13))
    intercept[IllegalArgumentException](
      Behavior.timeDecayedAvg(df, "user_id", "event_id", "value", "t", 0L))
  }

  test("lttbDownsample: keeps endpoints, picks max-area points, passes short series") {
    import org.apache.spark.sql.functions.col
    // epoch seconds 0..4 mapped onto timestamps; y integral by contract
    def r(id: Long, sec: Int, y: Long) =
      ("a", id, ts(f"2024-01-01 00:00:0$sec"), y)
    val df = Seq(r(10, 0, 0), r(11, 1, 10), r(12, 2, 0), r(13, 3, 0),
      r(14, 4, 5)).toDF("k", "event_id", "t", "y")
    // nb=3: one middle bucket vs the last point as next representative —
    // (1,10) has area 35 vs 10 and 15: the spike is kept
    val got = Behavior.lttbDownsample(df, "k", "event_id", "t", col("y"), 3)
      .as[(String, Long, Long, Long)].collect().map(_._2).sorted.toSeq
    assert(got == Seq(10L, 11L, 14L))

    // short series pass through whole
    val short = Behavior.lttbDownsample(df, "k", "event_id", "t", col("y"), 5)
      .as[(String, Long, Long, Long)].collect().map(_._2).sorted.toSeq
    assert(short == Seq(10L, 11L, 12L, 13L, 14L))

    // determinism across partitionings on a longer two-key series
    val big = (0 until 80).flatMap { i =>
      Seq(("p", 100L + i, ts(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"),
        ((i * 37) % 23).toLong),
        ("q", 300L + i, ts(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:30"),
          ((i * 17) % 31).toLong))
    }.toDF("k", "event_id", "t", "y")
    val a = Behavior.lttbDownsample(big, "k", "event_id", "t", col("y"), 12)
      .as[(String, Long, Long, Long)].collect().toSet
    val b = Behavior.lttbDownsample(big.repartition(7), "k", "event_id", "t",
        col("y"), 12)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(a == b)
    assert(a.count(_._1 == "p") == 12 && a.count(_._1 == "q") == 12)
    intercept[IllegalArgumentException](
      Behavior.lttbDownsample(df, "k", "event_id", "t", col("y"), 2))
  }

  test("intervalUnionLength: overlaps merge, gaps split, touching spans fuse") {
    def row(k: Long, sec: Int, durUs: Long) =
      (k, ts(f"2024-01-01 00:00:$sec%02d"), durUs)
    val df = Seq(
      // key 1: [0,5s) ∪ [3s,9s) merge → 9s; [20s,21s) separate island
      row(1L, 0, 5000000L), row(1L, 3, 6000000L), row(1L, 20, 1000000L),
      // key 2: [0,2s) then [2s,3s) touch (end == next start): ONE island
      row(2L, 0, 2000000L), row(2L, 2, 1000000L),
      // key 3: zero-duration span covers nothing but counts as an island
      row(3L, 0, 0L),
      // key 4: containment — [0,10s) swallows [2s,3s)
      row(4L, 0, 10000000L), row(4L, 2, 1000000L)
    ).toDF("user_id", "t", "dur")
    val got = Behavior.intervalUnionLength(df, "user_id", "t",
        org.apache.spark.sql.functions.col("dur"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      1L -> ((10000000L, 2L)),
      2L -> ((3000000L, 1L)),
      3L -> ((0L, 1L)),
      4L -> ((10000000L, 1L))))
  }

  test("windowFunnelStrictDedup: matched-repeat interrupts, first-step repeat restarts") {
    import graft.operators.Behavior
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val H = 3600L * 1000000
    def df(rows: (Long, String, Long)*) =
      rows.toDF("u", "op", "tm")
        .select(col("u"), col("op"), timestamp_micros(col("tm")).as("ts"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Behavior.windowFunnelStrictDedup(d, "u", "op", "ts",
        Seq("signup", "click", "purchase"), 24 * H)
        .as[(String, Long)].collect().toMap
    // a repeated matched step (click) kills the chain: the later purchase
    // cannot complete it — plain windowFunnel would report 3
    val interrupted = df((1L, "signup", 0L), (1L, "click", H),
      (1L, "click", 2 * H), (1L, "purchase", 3 * H))
    assert(run(interrupted) == Map("1" -> 2L))
    assert(Behavior.windowFunnel(interrupted, "u", "op", "ts",
      Seq("signup", "click", "purchase"), 24 * H)
      .as[(Long, Long)].collect().toMap == Map(1L -> 3L))
    // a first-step repeat restarts the chain AT that event
    val restarted = df((2L, "signup", 0L), (2L, "signup", H),
      (2L, "click", 2 * H), (2L, "purchase", 3 * H))
    assert(run(restarted) == Map("2" -> 3L))
    // window expiry kills the chain without a repeat
    val expired = df((3L, "signup", 0L), (3L, "click", 30 * H),
      (3L, "purchase", 31 * H))
    assert(run(expired) == Map("3" -> 1L))
    // clean chains agree with the plain funnel; unrelated ops ignored
    val clean = df((4L, "signup", 0L), (4L, "view", H), (4L, "click", 2 * H),
      (4L, "purchase", 3 * H), (5L, "view", 0L))
    assert(run(clean) == Map("4" -> 3L, "5" -> 0L))
    // partitioning invariance on a seeded random log
    val rnd = new scala.util.Random(77)
    val ops = Seq("view", "signup", "click", "purchase")
    val big = (1 to 800).map(_ => (rnd.nextInt(40).toLong,
      ops(rnd.nextInt(4)), rnd.nextInt(100).toLong * 600L * 1000000))
    val bigDf = df(big: _*)
    val a = run(bigDf.repartition(1))
    val b = run(bigDf.repartition(13))
    assert(a == b)
  }

  test("sequenceMatchPattern: minimum gaps, intervals, repeated refs, parser guards") {
    val H = 3600L * 1000000
    val events = Seq(
      // user 1: B exactly 1h after A — inside [30min, 2h] -> match
      (1L, "A", ts("2024-01-01 00:00:00")),
      (1L, "B", ts("2024-01-01 01:00:00")),
      // user 2: B only 10min after A — VIOLATES the minimum gap -> no match
      (2L, "A", ts("2024-01-01 00:00:00")),
      (2L, "B", ts("2024-01-01 00:10:00")),
      // user 3: first B too early, a LATER B at 90min rescues -> match
      (3L, "A", ts("2024-01-01 00:00:00")),
      (3L, "B", ts("2024-01-01 00:05:00")),
      (3L, "B", ts("2024-01-01 01:30:00")),
      // user 4: B too late (3h) -> no match
      (4L, "A", ts("2024-01-01 00:00:00")),
      (4L, "B", ts("2024-01-01 03:00:00"))
    ).toDF("user_id", "event_type", "t")
    val got = Behavior.sequenceMatchPattern(events, "user_id", "event_type",
        "t", s"(?1)(?t>=${H / 2})(?t<=${2 * H})(?2)", Seq("A", "B"))
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))

    // repeated refs: A .. A again (≥1h apart) .. B
    val rep = Seq(
      (1L, "A", ts("2024-01-01 00:00:00")),
      (1L, "A", ts("2024-01-01 02:00:00")),
      (1L, "B", ts("2024-01-01 02:30:00")),
      (2L, "A", ts("2024-01-01 00:00:00")), // only one A -> no match
      (2L, "B", ts("2024-01-01 02:30:00"))
    ).toDF("user_id", "event_type", "t")
    val got2 = Behavior.sequenceMatchPattern(rep, "user_id", "event_type",
        "t", s"(?1)(?t>=$H)(?1).*(?2)", Seq("A", "B"))
      .as[(Long, Boolean)].collect().toMap
    assert(got2 == Map(1L -> true, 2L -> false))

    // the uniform-(?t<=gap) pattern equals sequenceMatch exactly,
    // including on a scrambled random log
    val rnd = new scala.util.Random(71)
    val ops = Seq("A", "B", "C", "D")
    val big = (for (u <- 1L to 40L) yield {
      val t0 = 1700000000000000L
      (0 until 30).map(i => (u, ops(rnd.nextInt(4)),
        new java.sql.Timestamp((t0 + rnd.nextInt(864000) * 100000L) / 1000)))
    }).flatten.toDF("user_id", "event_type", "t").repartition(7)
    val viaPattern = Behavior.sequenceMatchPattern(big, "user_id",
        "event_type", "t", s"(?1)(?t<=${2 * H})(?2)(?t<=${2 * H})(?3)",
        Seq("A", "B", "C"))
      .as[(Long, Boolean)].collect().toMap
    val viaUniform = Behavior.sequenceMatch(big, "user_id", "event_type",
        "t", Seq("A", "B", "C"), 2 * H)
      .as[(Long, Boolean)].collect().toMap
    assert(viaPattern == viaUniform)

    // parser guards fail loudly
    intercept[IllegalArgumentException](Behavior.sequenceMatchPattern(
      events, "user_id", "event_type", "t", "(?t<=5)(?1)(?2)", Seq("A", "B")))
    intercept[IllegalArgumentException](Behavior.sequenceMatchPattern(
      events, "user_id", "event_type", "t", "(?1)(?3)", Seq("A", "B")))
    intercept[IllegalArgumentException](Behavior.sequenceMatchPattern(
      events, "user_id", "event_type", "t", "(?1)(?t>=9)(?t<=5)(?2)", Seq("A", "B")))
    intercept[IllegalArgumentException](Behavior.sequenceMatchPattern(
      events, "user_id", "event_type", "t", "(?1)(?2)(?t<=5)", Seq("A", "B")))
    intercept[IllegalArgumentException](Behavior.sequenceMatchPattern(
      events, "user_id", "event_type", "t", "(?1)garbage(?2)", Seq("A", "B")))
  }

  test("sequenceNextNode: first consecutive match wins; (end) sentinel; tie order") {
    import org.apache.spark.sql.functions.col
    val events = Seq(
      // u1: view,click,purchase -> next after FIRST view>click = purchase
      //     (a later view,click,error chain must NOT win)
      (1L, "view", 0L, 1L), (1L, "click", 1L, 2L), (1L, "purchase", 2L, 3L),
      (1L, "view", 3L, 4L), (1L, "click", 4L, 5L), (1L, "error", 5L, 6L),
      // u2: view,click ends the stream -> "(end)"
      (2L, "view", 0L, 7L), (2L, "click", 1L, 8L),
      // u3: view then purchase (no adjacency) -> no row
      (3L, "view", 0L, 9L), (3L, "purchase", 1L, 10L),
      // u4: same-ts view/click ordered by the tie column, then signup
      (4L, "view", 0L, 11L), (4L, "click", 0L, 12L), (4L, "signup", 1L, 13L))
      .toDF("u", "op", "tsl", "id")
      .select(col("u"), col("op"),
        org.apache.spark.sql.functions.timestamp_seconds(col("tsl")).as("t"),
        col("id"))
    val got = Behavior.sequenceNextNode(events, "u", "op", "t", "id",
        Seq("view", "click"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("purchase" -> 1L, "(end)" -> 1L, "signup" -> 1L))
    intercept[IllegalArgumentException](
      Behavior.sequenceNextNode(events, "u", "op", "t", "id", Nil))
  }

  test("deltaSumCents: only positive increments count; resets contribute 0") {
    import org.apache.spark.sql.functions.{col, lit}
    // g1/u1 counter: 100 -> 150 -> 120 -> 200: deltas +50, 0, +80 = 130
    // g1/u2: single observation -> no deltas, excluded from n_keys
    // g2/u1: 10 -> 10 -> 30: deltas 0, +20
    val rows = Seq(
      ("g1", 1L, 0L, 1L, 100L), ("g1", 1L, 1L, 2L, 150L),
      ("g1", 1L, 2L, 3L, 120L), ("g1", 1L, 3L, 4L, 200L),
      ("g1", 2L, 0L, 5L, 999L),
      ("g2", 1L, 0L, 6L, 10L), ("g2", 1L, 1L, 7L, 10L), ("g2", 1L, 2L, 8L, 30L))
      .toDF("g", "u", "tsl", "id", "c")
      .select(col("g"), col("u"),
        org.apache.spark.sql.functions.timestamp_seconds(col("tsl")).as("t"),
        col("id"), col("c"))
    val got = Behavior.deltaSumCents(rows, "g", "u", col("c"), "t", "id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map("g1" -> ((1L, 2L, 1.3)), "g2" -> ((1L, 1L, 0.2))))
  }
}
