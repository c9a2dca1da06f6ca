package graft

import graft.operators.CdcOps
import org.apache.spark.sql.functions._

class CdcOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val log = Seq(
    // (key, version, op, value)
    (1L, 1L, "insert", 10.0), (1L, 3L, "update", 30.0), (1L, 2L, "update", 20.0),
    (2L, 5L, "insert", 50.0), (2L, 6L, "delete", 0.0),
    (3L, 7L, "insert", 70.0)
  ).toDF("key", "version", "op", "value")

  test("latestSnapshot keeps exactly the max-version row per key") {
    val snap = CdcOps.latestSnapshot(log, Seq("key"), "version")
      .orderBy("key").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(snap.toSeq == Seq((1L, 3L, "update"), (2L, 6L, "delete"), (3L, 7L, "insert")))
  }

  test("latestSnapshot preserves the input column order") {
    assert(CdcOps.latestSnapshot(log, Seq("key"), "version").columns.toSeq ==
      Seq("key", "version", "op", "value"))
  }

  test("latestSnapshot breaks version ties toward the tombstone, deterministically") {
    // same key, same version, one row flagged deleted (the replayed
    // pre-delete batch vs reconcile-sweep tombstone collision) — the
    // tombstone must win no matter the physical row order
    val tied = Seq((1L, 5L, 0, "live"), (1L, 5L, 1, "dead"), (2L, 7L, 0, "only"))
      .toDF("key", "version", "_peerdb_is_deleted", "payload")
    for (df <- Seq(tied, tied.orderBy(desc("_peerdb_is_deleted")), tied.repartition(7))) {
      val snap = CdcOps.latestSnapshot(df, Seq("key"), "version")
        .orderBy("key").collect().map(r => (r.getLong(0), r.getInt(2), r.getString(3)))
      assert(snap.toSeq == Seq((1L, 1, "dead"), (2L, 0, "only")))
    }
    // the streaming path's boolean flag gets the same treatment
    val boolTied = Seq((1L, 5L, false, "live"), (1L, 5L, true, "dead"))
      .toDF("key", "version", "is_deleted", "payload")
    assert(CdcOps.latestSnapshot(boolTied, Seq("key"), "version")
      .select("payload").as[String].collect().toSeq == Seq("dead"))
    // a null flag orders as live, not as an error
    val nullTied = Seq((1L, 5L, Some(1), "dead"), (1L, 5L, None, "live"))
      .toDF("key", "version", "_peerdb_is_deleted", "payload")
    assert(CdcOps.latestSnapshot(nullTied, Seq("key"), "version")
      .select("payload").as[String].collect().toSeq == Seq("dead"))
  }

  test("softDeleteSnapshot drops keys whose newest op is a delete") {
    val snap = CdcOps.softDeleteSnapshot(log, Seq("key"), "version", col("op") === "delete")
    assert(snap.select("key").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("scd2History closes intervals with the next change and marks current") {
    val hist = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00")),
      (1L, 2L, ts("2024-01-02 00:00:00"))
    ).toDF("key", "version", "t")
    val rows = CdcOps.scd2History(hist, Seq("key"), "t", "version")
      .orderBy("version")
      .select("valid_from", "valid_to", "is_current").collect()
    assert(rows(0).getTimestamp(0) == ts("2024-01-01 00:00:00"))
    assert(rows(0).getTimestamp(1) == ts("2024-01-02 00:00:00"))
    assert(!rows(0).getBoolean(2) && rows(1).getBoolean(2))
    assert(rows(1).isNullAt(1))
  }

  test("sessionize starts a new session after the idle gap") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:10:00")),
      (1L, ts("2024-01-01 02:00:00")), // > 30 min gap → new session
      (2L, ts("2024-01-01 00:00:00"))
    ).toDF("key", "t")
    val out = CdcOps.sessionize(events, Seq("key"), "t", 1800L)
      .groupBy("key").agg(max("session_seq").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }

  test("snapshotDiff classifies keys between two version cutoffs") {
    val diffLog = Seq(
      // key 1: updated between the cutoffs            → changed
      (1L, 1L, "insert"), (1L, 6L, "update"),
      // key 2: untouched after v1                     → unchanged
      (2L, 2L, "insert"),
      // key 3: first appears after v1                 → added
      (3L, 7L, "insert"),
      // key 4: live at v1, tombstoned by v2           → removed
      (4L, 3L, "insert"), (4L, 8L, "delete"),
      // key 5: deleted at v1, re-inserted by v2       → added (was invisible)
      (5L, 4L, "delete"), (5L, 9L, "insert"),
      // key 6: dead at both cutoffs                   → omitted
      (6L, 5L, "delete"),
      // key 7: entirely past v2                       → omitted
      (7L, 11L, "insert")
    ).toDF("key", "version", "op")
    val out = CdcOps.snapshotDiff(diffLog, Seq("key"), "version", 5L, 10L,
        col("op") === "delete")
      .as[(Long, Option[Long], Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      1L -> ((Some(1L), 6L, "changed")),
      2L -> ((Some(2L), 2L, "unchanged")),
      3L -> ((None, 7L, "added")),
      4L -> ((Some(3L), 8L, "removed")),
      5L -> ((Some(4L), 9L, "added"))))
  }

  test("snapshotDiff rejects out-of-order cutoffs") {
    intercept[IllegalArgumentException] {
      CdcOps.snapshotDiff(log, Seq("key"), "version", 5L, 3L, col("op") === "delete")
    }
  }

  test("batchStats counts rows, keys and deletes per batch") {
    val withBatch = log.withColumn("b", when(col("version") <= 3, 1).otherwise(2))
    val stats = CdcOps.batchStats(withBatch, col("b"), Seq("key"), col("op"), lit("delete"))
      .orderBy("batch_id")
      .as[(Int, Long, Long, Long)].collect()
    assert(stats.toSeq == Seq((1, 3L, 1L, 0L), (2, 3L, 2L, 1L)))
  }
}
