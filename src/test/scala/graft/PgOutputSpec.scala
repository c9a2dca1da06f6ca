package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.CdcOps
import graft.sources.PgOutput
import graft.sources.PgOutput._
import graft.sources.PgOutput.Fixture

/** pgoutput binary protocol decode — crafted replication frames (the
  * DebeziumEnvelope bar: every claim pinned against hand-built bytes, no
  * live Postgres needed).
  */
class PgOutputSpec extends SparkSpec {

  private val ns = "public"
  private val itemCols = Seq(
    RelCol("id", 20, -1, isKey = true), // int8
    RelCol("name", 25, -1, isKey = false), // text
    RelCol("qty", 23, -1, isKey = false)) // int4

  private def txTs(n: Int): Long = 1700000000000000L + n * 1000000L // unix micros

  /** One committed transaction's frames: Begin, the given DML, Commit. */
  private def tx(n: Int, baseLsn: Long, dml: Seq[Array[Byte]]): Seq[Array[Byte]] = {
    val endLsn = baseLsn + 100
    Fixture.begin(baseLsn, endLsn, txTs(n), xid = 1000 + n) +:
      dml :+ Fixture.commit(endLsn, endLsn, endLsn + 1, txTs(n))
  }

  private def toDf(frames: Seq[Array[Byte]]) = {
    import spark.implicits._
    frames.toDF("frame")
  }

  // ── pure byte-level decode ───────────────────────────────────────────

  test("decodeFrame round-trips every message type") {
    val rel = Fixture.relation(10, 7, ns, "items", itemCols)
    decodeFrame(rel) match {
      case Right(XLogData(10, _, _, Relation(7, s, "items", 'd', cols))) =>
        assert(s == ns)
        assert(cols == itemCols.toIndexedSeq)
      case other => fail(s"relation decoded to $other")
    }

    decodeFrame(Fixture.begin(20, 120, txTs(1), 42)) match {
      case Right(XLogData(20, _, _, Begin(120, ts, 42))) => assert(ts == txTs(1))
      case other => fail(s"begin decoded to $other")
    }

    decodeFrame(Fixture.commit(120, 120, 121, txTs(1))) match {
      case Right(XLogData(120, _, _, Commit(120, 121, ts))) => assert(ts == txTs(1))
      case other => fail(s"commit decoded to $other")
    }

    val ins = Fixture.insert(30, 7, Seq(VText("1"), VText("ann"), VNull))
    decodeFrame(ins) match {
      case Right(XLogData(30, _, _, Insert(7, t))) =>
        assert(t == IndexedSeq(VText("1"), VText("ann"), VNull))
      case other => fail(s"insert decoded to $other")
    }

    val upd = Fixture.update(31, 7, Seq(VText("1"), VText("anne"), VUnchanged),
      old = Some(('K', Seq(VText("1"), VNull, VNull))))
    decodeFrame(upd) match {
      case Right(XLogData(31, _, _, Update(7, Some('K'), Some(old), next))) =>
        assert(old == IndexedSeq(VText("1"), VNull, VNull))
        assert(next == IndexedSeq(VText("1"), VText("anne"), VUnchanged))
      case other => fail(s"update decoded to $other")
    }

    decodeFrame(Fixture.delete(32, 7, Seq(VText("1"), VNull, VNull))) match {
      case Right(XLogData(32, _, _, Delete(7, old))) =>
        assert(old.head == VText("1"))
      case other => fail(s"delete decoded to $other")
    }

    decodeFrame(Fixture.keepalive(99, replyRequested = true)) match {
      case Right(Keepalive(99, _, true)) => ()
      case other => fail(s"keepalive decoded to $other")
    }

    decodeFrame(Fixture.message(40, 40, "wm", "x".getBytes("UTF-8"))) match {
      case Right(XLogData(40, _, _, LogicalMsg(true, 40, "wm", c))) =>
        assert(new String(c, "UTF-8") == "x")
      case other => fail(s"logical Message decoded to $other")
    }

    decodeFrame(Fixture.unknown(41, 'Z')) match {
      case Right(XLogData(41, _, _, Unknown('Z'))) => ()
      case other => fail(s"unknown tag decoded to $other")
    }

    assert(decodeFrame(Array[Byte]('w', 1, 2)).isLeft) // truncated XLogData
    assert(decodeFrame(Array.emptyByteArray).isLeft)
    assert(decodeFrame(Array[Byte]('q', 0)).isLeft) // unknown frame tag
  }

  test("sparkType maps the public OID set; numeric typmod carries precision/scale") {
    assert(sparkType(16, -1) == BooleanType)
    assert(sparkType(21, -1) == ShortType)
    assert(sparkType(23, -1) == IntegerType)
    assert(sparkType(20, -1) == LongType)
    assert(sparkType(700, -1) == FloatType)
    assert(sparkType(701, -1) == DoubleType)
    assert(sparkType(17, -1) == BinaryType)
    assert(sparkType(1082, -1) == DateType)
    assert(sparkType(1114, -1) == TimestampNTZType)
    assert(sparkType(1184, -1) == TimestampType)
    assert(sparkType(25, -1) == StringType)
    assert(sparkType(2950, -1) == StringType) // uuid rides as text
    // numeric(12,3): typmod = ((12 << 16) | 3) + 4
    assert(sparkType(1700, ((12 << 16) | 3) + 4) == DecimalType(12, 3))
    assert(sparkType(1700, -1) == DecimalType(38, 18))
  }

  // ── DataFrame adapter ────────────────────────────────────────────────

  test("parse: insert/update/delete collapse to the expected snapshot") {
    val frames =
      Seq(Fixture.relation(5, 7, ns, "items", itemCols)) ++
        tx(1, 100, Seq(
          Fixture.insert(101, 7, Seq(VText("1"), VText("ann"), VText("3"))),
          Fixture.insert(102, 7, Seq(VText("2"), VText("bob"), VText("5"))))) ++
        Seq(Fixture.keepalive(150)) ++
        tx(2, 200, Seq(
          Fixture.update(201, 7, Seq(VText("1"), VText("anne"), VText("4"))),
          Fixture.insert(202, 7, Seq(VText("3"), VText("cat"), VNull)))) ++
        tx(3, 300, Seq(
          Fixture.delete(301, 7, Seq(VText("2"), VNull, VNull))))

    val parsed = PgOutput.parse(toDf(frames), "frame", "items")
    assert(parsed.deadLetter.count() == 0)

    val changes = parsed.changes
    assert(changes.columns.toSeq == Seq("id", "name", "qty", "_version",
      "_is_deleted", "_event_ts", "_source_table", "_unchanged_toast",
      "_changed_cols"))
    assert(changes.count() == 5)
    // _version is the WAL position of each DML
    assert(changes.select("_version").as[Long](spark.implicits.newLongEncoder)
      .collect().sorted.toSeq == Seq(101L, 102L, 201L, 202L, 301L))
    // _event_ts is the COMMIT timestamp of the enclosing transaction
    val ts1 = changes.where(col("_version") === 101)
      .select(unix_micros(col("_event_ts"))).head().getLong(0)
    assert(ts1 == txTs(1))
    val ts3 = changes.where(col("_version") === 301)
      .select(unix_micros(col("_event_ts"))).head().getLong(0)
    assert(ts3 == txTs(3))

    // the CDC collapse: latest per key, deletes dropped
    val snap = CdcOps.softDeleteSnapshot(changes, Seq("id"), "_version",
        col("_is_deleted"))
      .select("id", "name", "qty").orderBy("id").collect().toSeq
    assert(snap == Seq(Row(1L, "anne", 4), Row(3L, "cat", null)))
  }

  test("parse: mid-stream Relation change versions the schema by LSN") {
    val v2Cols = itemCols :+ RelCol("note", 25, -1, isKey = false)
    val frames =
      Seq(Fixture.relation(5, 7, ns, "items", itemCols)) ++
        tx(1, 100, Seq(
          Fixture.insert(101, 7, Seq(VText("1"), VText("ann"), VText("3"))))) ++
        Seq(Fixture.relation(150, 7, ns, "items", v2Cols)) ++ // ALTER TABLE ADD COLUMN
        tx(2, 200, Seq(
          Fixture.insert(201, 7, Seq(VText("2"), VText("bob"), VText("5"), VText("hi")))))

    val parsed = PgOutput.parse(toDf(frames), "frame", "items")
    assert(parsed.deadLetter.count() == 0)
    val rows = parsed.changes.orderBy("_version")
      .select("id", "name", "qty", "note").collect().toSeq
    // pre-ALTER rows carry null in the new column; post-ALTER rows carry it
    assert(rows == Seq(Row(1L, "ann", 3, null), Row(2L, "bob", 5, "hi")))
  }

  test("parse: unknown tags, malformed frames and bad values dead-letter with reasons") {
    val frames =
      Seq(Fixture.relation(5, 7, ns, "items", itemCols)) ++
        tx(1, 100, Seq(
          Fixture.insert(101, 7, Seq(VText("1"), VText("ann"), VText("3"))),
          // qty is int4 but the value is not a number → coercion dead-letter
          Fixture.insert(102, 7, Seq(VText("2"), VText("bob"), VText("many"))),
          // logical decoding Message is not interpreted → unknown-tag dead-letter
          Fixture.unknown(103, 'Z'))) ++
        Seq(Array[Byte]('w', 9)) // truncated frame

    val parsed = PgOutput.parse(toDf(frames), "frame", "items")
    assert(parsed.changes.count() == 1) // only the clean insert survives
    val reasons = parsed.deadLetter.select("reason")
      .as[String](spark.implicits.newStringEncoder).collect().toSeq
    assert(reasons.size == 3)
    assert(reasons.exists(_.contains("coercion")))
    assert(reasons.exists(_.contains("unknown message tag 'Z'")))
    assert(reasons.exists(_.contains("malformed")))
  }

  test("parse: unchanged-TOAST columns decode to null and are named in _unchanged_toast") {
    val frames =
      Seq(Fixture.relation(5, 7, ns, "items", itemCols)) ++
        tx(1, 100, Seq(
          Fixture.insert(101, 7, Seq(VText("1"), VText("ann"), VText("3"))))) ++
        tx(2, 200, Seq(
          Fixture.update(201, 7, Seq(VText("1"), VUnchanged, VText("9")))))

    val parsed = PgOutput.parse(toDf(frames), "frame", "items")
    assert(parsed.deadLetter.count() == 0)
    val upd = parsed.changes.where(col("_version") === 201)
      .select("name", "_unchanged_toast").head()
    assert(upd.isNullAt(0)) // the toasted slot is NOT a fake value
    assert(upd.getSeq[String](1) == Seq("name")) // ...and is named for repair
  }

  test("parse: the full public type-OID matrix decodes to typed Spark values") {
    val cols = Seq(
      RelCol("id", 20, -1, isKey = true),
      RelCol("b", 16, -1, isKey = false),
      RelCol("s2", 21, -1, isKey = false),
      RelCol("i4", 23, -1, isKey = false),
      RelCol("f4", 700, -1, isKey = false),
      RelCol("f8", 701, -1, isKey = false),
      RelCol("num", 1700, ((10 << 16) | 2) + 4, isKey = false),
      RelCol("raw", 17, -1, isKey = false),
      RelCol("d", 1082, -1, isKey = false),
      RelCol("ts", 1114, -1, isKey = false),
      RelCol("tsz", 1184, -1, isKey = false),
      RelCol("u", 2950, -1, isKey = false))
    val frames =
      Seq(Fixture.relation(5, 9, ns, "typed", cols)) ++
        tx(1, 100, Seq(Fixture.insert(101, 9, Seq(
          VText("7"), VText("t"), VText("12"), VText("345"),
          VText("1.5"), VText("2.25"), VText("12345.67"),
          VText("\\x0aff"), VText("2024-03-04"),
          VText("2024-03-04 05:06:07.123456"),
          VText("2024-03-04 05:06:07.123456+02"),
          VText("123e4567-e89b-12d3-a456-426614174000")))))

    val parsed = PgOutput.parse(toDf(frames), "frame", "typed")
    assert(parsed.deadLetter.count() == 0)
    val sch = parsed.changes.schema
    def dt(n: String) = sch(n).dataType
    assert(dt("b") == BooleanType && dt("s2") == ShortType && dt("i4") == IntegerType)
    assert(dt("f4") == FloatType && dt("f8") == DoubleType)
    assert(dt("num") == DecimalType(10, 2) && dt("raw") == BinaryType)
    assert(dt("d") == DateType && dt("ts") == TimestampNTZType && dt("tsz") == TimestampType)
    assert(dt("u") == StringType)

    val row = parsed.changes.select(
      col("b"), col("s2"), col("i4"), col("f4"), col("f8"),
      col("num").cast("string"), hex(col("raw")), col("d").cast("string"),
      col("ts").cast("string"), unix_micros(col("tsz")), col("u")).head()
    assert(row.getBoolean(0))
    assert(row.getShort(1) == 12.toShort)
    assert(row.getInt(2) == 345)
    assert(row.getFloat(3) == 1.5f)
    assert(row.getDouble(4) == 2.25d)
    assert(row.getString(5) == "12345.67")
    assert(row.getString(6) == "0AFF")
    assert(row.getString(7) == "2024-03-04")
    assert(row.getString(8) == "2024-03-04 05:06:07.123456")
    // 05:06:07.123456 at +02 = 03:06:07.123456 UTC
    val expectedTz = java.time.LocalDateTime.parse("2024-03-04T03:06:07.123456")
      .toInstant(java.time.ZoneOffset.UTC)
    assert(row.getLong(9) ==
      expectedTz.getEpochSecond * 1000000L + expectedTz.getNano / 1000L)
    assert(row.getString(10) == "123e4567-e89b-12d3-a456-426614174000")
  }

  test("parse: DML for other relations is ignored; missing Relation throws") {
    val otherCols = Seq(RelCol("k", 20, -1, isKey = true))
    val frames =
      Seq(Fixture.relation(5, 7, ns, "items", itemCols),
        Fixture.relation(6, 8, ns, "other", otherCols)) ++
        tx(1, 100, Seq(
          Fixture.insert(101, 7, Seq(VText("1"), VText("ann"), VText("3"))),
          Fixture.insert(102, 8, Seq(VText("9")))))
    val parsed = PgOutput.parse(toDf(frames), "frame", "items")
    assert(parsed.changes.count() == 1)
    assert(parsed.deadLetter.count() == 0) // other-table DML is not an error

    assertThrows[IllegalArgumentException] {
      PgOutput.parse(toDf(frames), "frame", "missing_table")
    }
  }

  test("protocol v2: streamed-transaction control frames round-trip") {
    decodeFrame(Fixture.streamStart(500, 77)) match {
      case Right(XLogData(500, _, _, StreamStart(77, true))) => ()
      case other => fail(s"stream start decoded to $other")
    }
    decodeFrame(Fixture.streamStop(510)) match {
      case Right(XLogData(510, _, _, StreamStop)) => ()
      case other => fail(s"stream stop decoded to $other")
    }
    decodeFrame(Fixture.streamCommit(540, 77, 600, 601, txTs(9))) match {
      case Right(XLogData(540, _, _, StreamCommit(77, 600, 601, ts))) =>
        assert(ts == txTs(9))
      case other => fail(s"stream commit decoded to $other")
    }
    decodeFrame(Fixture.streamAbort(550, 88, 88)) match {
      case Right(XLogData(550, _, _, StreamAbort(88, 88))) => ()
      case other => fail(s"stream abort decoded to $other")
    }
    // in-segment DML needs the inStream flag: the xid prefix shifts fields
    val streamedIns = Fixture.insert(501, 7, Seq(VText("1"), VText("a"), VNull), xid = 77)
    decodeFrame(streamedIns, inStream = true) match {
      case Right(XLogData(501, _, _, Streamed(77, Insert(7, t)))) =>
        assert(t == IndexedSeq(VText("1"), VText("a"), VNull))
      case other => fail(s"streamed insert decoded to $other")
    }
  }

  test("parse: a committed streamed transaction lands with its stream-commit ts") {
    val frames =
      Seq(Fixture.relation(5, 7, ns, "items", itemCols)) ++
        // segment 1 of xid 77
        Seq(Fixture.streamStart(500, 77),
          Fixture.insert(501, 7, Seq(VText("1"), VText("ann"), VText("3")), xid = 77),
          Fixture.insert(502, 7, Seq(VText("2"), VText("bob"), VText("5")), xid = 77),
          Fixture.streamStop(510)) ++
        // an ordinary small tx INTERLEAVED between the segments
        tx(1, 512, Seq(
          Fixture.insert(513, 7, Seq(VText("9"), VText("zed"), VText("1"))))) ++
        // segment 2 of xid 77, then its commit
        Seq(Fixture.streamStart(520, 77, firstSegment = false),
          Fixture.update(521, 7, Seq(VText("1"), VText("anne"), VText("4")), xid = 77),
          Fixture.streamStop(530),
          Fixture.streamCommit(540, 77, 600, 601, txTs(9)))

    val parsed = PgOutput.parse(toDf(frames), "frame", "items")
    assert(parsed.deadLetter.count() == 0)
    assert(parsed.changes.count() == 4)
    // streamed rows carry the STREAM COMMIT's timestamp; the interleaved
    // plain tx keeps its own Begin/Commit ts
    val ts501 = parsed.changes.where(col("_version") === 501)
      .select(unix_micros(col("_event_ts"))).head().getLong(0)
    assert(ts501 == txTs(9))
    val ts513 = parsed.changes.where(col("_version") === 513)
      .select(unix_micros(col("_event_ts"))).head().getLong(0)
    assert(ts513 == txTs(1))
    // collapse: the second segment's update wins for key 1
    val snap = CdcOps.softDeleteSnapshot(parsed.changes, Seq("id"), "_version",
        col("_is_deleted"))
      .select("id", "name", "qty").orderBy("id").collect().toSeq
    assert(snap == Seq(Row(1L, "anne", 4), Row(2L, "bob", 5), Row(9L, "zed", 1)))
  }

  test("parse: aborted / unresolved / partially-aborted streamed xids") {
    val frames =
      Seq(Fixture.relation(5, 7, ns, "items", itemCols)) ++
        // xid 88: fully aborted — its rows never happened
        Seq(Fixture.streamStart(500, 88),
          Fixture.insert(501, 7, Seq(VText("1"), VText("gone"), VText("0")), xid = 88),
          Fixture.streamStop(510),
          Fixture.streamAbort(515, 88, 88)) ++
        // xid 99: no commit in this batch — dead-letter for replay
        Seq(Fixture.streamStart(520, 99),
          Fixture.insert(521, 7, Seq(VText("2"), VText("waiting"), VText("0")), xid = 99),
          Fixture.streamStop(530)) ++
        // xid 66: PARTIAL abort (subxid != xid) — dead-letter whole
        Seq(Fixture.streamStart(540, 66),
          Fixture.insert(541, 7, Seq(VText("3"), VText("maybe"), VText("0")), xid = 66),
          Fixture.streamStop(550),
          Fixture.streamAbort(555, 66, 67),
          Fixture.streamCommit(560, 66, 600, 601, txTs(5)))

    val parsed = PgOutput.parse(
      toDf(Fixture.relation(5, 7, ns, "items", itemCols) +: frames),
      "frame", "items")
    assert(parsed.changes.count() == 0)
    val reasons = parsed.deadLetter.select("reason")
      .as[String](spark.implicits.newStringEncoder).collect().toSeq
    assert(reasons.size == 2, s"reasons=$reasons")
    assert(reasons.exists(r => r.contains("xid=99") && r.contains("no Stream Commit")))
    assert(reasons.exists(r => r.contains("xid=66") && r.contains("partially aborted")))
  }

  test("truncate: decodes with options, streamed form carries the xid") {
    decodeFrame(Fixture.truncate(40, Seq(7, 9), cascade = true,
        restartIdentity = true)) match {
      case Right(XLogData(40, _, _, Truncate(rids, true, true))) =>
        assert(rids == IndexedSeq(7, 9))
      case other => fail(s"truncate decoded to $other")
    }
    // streamed form sits inside a segment: xid prefix shifts the fields
    decodeFrame(Fixture.truncate(41, Seq(7), xid = 55), inStream = true) match {
      case Right(XLogData(41, _, _, Streamed(55, Truncate(rids, false, false)))) =>
        assert(rids == IndexedSeq(7))
      case other => fail(s"streamed truncate decoded to $other")
    }
  }

  test("parse: committed truncate wipes at-or-below its LSN; reinserts survive") {
    val frames =
      Seq(Fixture.relation(5, 7, ns, "items", itemCols)) ++
        tx(1, 100, Seq(
          Fixture.insert(101, 7, Seq(VText("1"), VText("ann"), VText("3"))),
          Fixture.insert(102, 7, Seq(VText("2"), VText("bob"), VText("5"))))) ++
        // tx 2: TRUNCATE items, then reinsert key 2 in the SAME transaction
        tx(2, 200, Seq(
          Fixture.truncate(201, Seq(7)),
          Fixture.insert(202, 7, Seq(VText("2"), VText("bob2"), VText("9"))))) ++
        // a truncate of some OTHER table is not ours
        tx(3, 300, Seq(Fixture.truncate(301, Seq(999))))

    val parsed = PgOutput.parse(toDf(frames), "frame", "items")
    assert(parsed.deadLetter.count() == 0)
    assert(parsed.truncates.map(_.walStart) == Seq(201L))
    assert(parsed.truncates.head.tsMicros == txTs(2)) // commit ts of tx 2
    // the faithful log still carries all three inserts…
    assert(parsed.changes.count() == 3)
    // …and applyTruncates + collapse yields only the post-truncate world
    val snap = CdcOps.softDeleteSnapshot(
        PgOutput.applyTruncates(parsed.changes, parsed.truncates),
        Seq("id"), "_version", col("_is_deleted"))
      .select("id", "name", "qty").orderBy("id").collect().toSeq
    assert(snap == Seq(Row(2L, "bob2", 9)))
  }

  test("truncate: aborted streamed one never happened; unresolved dead-letters") {
    val frames =
      Seq(Fixture.relation(5, 7, ns, "items", itemCols)) ++
        tx(1, 100, Seq(
          Fixture.insert(101, 7, Seq(VText("1"), VText("ann"), VText("3"))))) ++
        // xid 88 truncates but aborts: the wipe never happened
        Seq(Fixture.streamStart(500, 88),
          Fixture.truncate(501, Seq(7), xid = 88),
          Fixture.streamStop(510),
          Fixture.streamAbort(515, 88, 88)) ++
        // xid 99 truncates with no commit in this batch: pending wipe must
        // not vanish — dead-letter for replay
        Seq(Fixture.streamStart(520, 99),
          Fixture.truncate(521, Seq(7), xid = 99),
          Fixture.streamStop(530)) ++
        // xid 77's truncate is for another table: ignored entirely
        Seq(Fixture.streamStart(540, 77),
          Fixture.truncate(541, Seq(999), xid = 77),
          Fixture.streamStop(550))

    val parsed = PgOutput.parse(toDf(frames), "frame", "items")
    assert(parsed.truncates.isEmpty)
    assert(parsed.changes.count() == 1)
    val reasons = parsed.deadLetter.select("reason")
      .as[String](spark.implicits.newStringEncoder).collect().toSeq
    assert(reasons.size == 1, s"reasons=$reasons")
    assert(reasons.head.contains("truncate xid=99") &&
      reasons.head.contains("no Stream Commit"))
  }

  test("two-phase: control messages round-trip") {
    decodeFrame(Fixture.beginPrepare(10, 100, 101, txTs(1), 42, "gid-a")) match {
      case Right(XLogData(10, _, _, BeginPrepare(100, 101, ts, 42, "gid-a"))) =>
        assert(ts == txTs(1))
      case other => fail(s"begin-prepare decoded to $other")
    }
    decodeFrame(Fixture.prepare(20, 100, 101, txTs(1), 42, "gid-a")) match {
      case Right(XLogData(20, _, _, Prepare(100, 101, _, 42, "gid-a"))) => ()
      case other => fail(s"prepare decoded to $other")
    }
    decodeFrame(Fixture.commitPrepared(30, 100, 101, txTs(2), 42, "gid-a")) match {
      case Right(XLogData(30, _, _, CommitPrepared(100, 101, ts, 42, "gid-a"))) =>
        assert(ts == txTs(2))
      case other => fail(s"commit-prepared decoded to $other")
    }
    decodeFrame(Fixture.rollbackPrepared(40, 101, 102, txTs(1), txTs(3),
        42, "gid-a")) match {
      case Right(XLogData(40, _, _,
          RollbackPrepared(101, 102, pts, rts, 42, "gid-a"))) =>
        assert(pts == txTs(1) && rts == txTs(3))
      case other => fail(s"rollback-prepared decoded to $other")
    }
    decodeFrame(Fixture.streamPrepare(50, 100, 101, txTs(1), 42, "gid-a")) match {
      case Right(XLogData(50, _, _, StreamPrepare(100, 101, _, 42, "gid-a"))) => ()
      case other => fail(s"stream-prepare decoded to $other")
    }
  }

  test("two-phase: commit-prepared emits with its ts, rollback vanishes, pending dead-letters") {
    def preparedTx(xid: Long, gid: String, baseLsn: Long,
                   dml: Seq[Array[Byte]]): Seq[Array[Byte]] =
      (Fixture.beginPrepare(baseLsn, baseLsn + 90, baseLsn + 91, txTs(1), xid, gid) +:
        dml) :+ Fixture.prepare(baseLsn + 90, baseLsn + 90, baseLsn + 91, txTs(1), xid, gid)

    val frames =
      Seq(Fixture.relation(5, 7, ns, "items", itemCols)) ++
        // xid 41: prepared then COMMIT PREPARED in this batch
        preparedTx(41, "gid-commit", 100, Seq(
          Fixture.insert(101, 7, Seq(VText("1"), VText("ann"), VText("3"))))) ++
        Seq(Fixture.commitPrepared(195, 190, 191, txTs(7), 41, "gid-commit")) ++
        // xid 42: prepared then ROLLBACK PREPARED — never happened
        preparedTx(42, "gid-roll", 200, Seq(
          Fixture.insert(201, 7, Seq(VText("2"), VText("bob"), VText("5"))))) ++
        Seq(Fixture.rollbackPrepared(295, 290, 291, txTs(1), txTs(8), 42, "gid-roll")) ++
        // xid 43: prepared, unresolved in this batch — pending
        preparedTx(43, "gid-wait", 300, Seq(
          Fixture.insert(301, 7, Seq(VText("3"), VText("cat"), VText("9"))))) ++
        // a NORMAL tx after the prepared ones still resolves by its Begin
        tx(4, 400, Seq(
          Fixture.insert(401, 7, Seq(VText("4"), VText("dog"), VText("2")))))

    val parsed = PgOutput.parse(toDf(frames), "frame", "items")
    val byId = parsed.changes.select("id", "_version").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.keySet == Set(1L, 4L), s"got $byId")
    // the committed-prepared row carries the COMMIT PREPARED timestamp
    val ts1 = parsed.changes.where(col("id") === 1)
      .select(unix_micros(col("_event_ts"))).head().getLong(0)
    assert(ts1 == txTs(7))
    val reasons = parsed.deadLetter.select("reason")
      .as[String](spark.implicits.newStringEncoder).collect().toSeq
    assert(reasons.size == 1, s"reasons=$reasons")
    assert(reasons.head.contains("prepared xid=43") &&
      reasons.head.contains("Commit Prepared"))

    // replay contract: the pending tx's frames re-parsed WITH the batch
    // that carries its Commit Prepared now emit
    val replay = PgOutput.parse(toDf(
      Seq(Fixture.relation(5, 7, ns, "items", itemCols)) ++
        preparedTx(43, "gid-wait", 300, Seq(
          Fixture.insert(301, 7, Seq(VText("3"), VText("cat"), VText("9"))))) ++
        Seq(Fixture.commitPrepared(395, 390, 391, txTs(9), 43, "gid-wait"))),
      "frame", "items")
    assert(replay.deadLetter.count() == 0)
    assert(replay.changes.select("id").as[Long](spark.implicits.newLongEncoder)
      .collect().toSeq == Seq(3L))
  }

  test("two-phase: streamed tx ending in Stream Prepare resolves via Commit Prepared") {
    val frames =
      Seq(Fixture.relation(5, 7, ns, "items", itemCols)) ++
        Seq(Fixture.streamStart(500, 88),
          Fixture.insert(501, 7, Seq(VText("1"), VText("sp"), VText("0")), xid = 88),
          Fixture.streamStop(510),
          Fixture.streamPrepare(520, 515, 516, txTs(1), 88, "gid-sp"),
          Fixture.commitPrepared(530, 525, 526, txTs(6), 88, "gid-sp")) ++
        // xid 99: stream-prepared but unresolved — dead-letter, prepared wording
        Seq(Fixture.streamStart(600, 99),
          Fixture.insert(601, 7, Seq(VText("2"), VText("wait"), VText("0")), xid = 99),
          Fixture.streamStop(610),
          Fixture.streamPrepare(620, 615, 616, txTs(1), 99, "gid-sw")) ++
        // xid 77: stream-prepared then ROLLBACK PREPARED — vanishes
        Seq(Fixture.streamStart(700, 77),
          Fixture.insert(701, 7, Seq(VText("3"), VText("gone"), VText("0")), xid = 77),
          Fixture.streamStop(710),
          Fixture.streamPrepare(720, 715, 716, txTs(1), 77, "gid-sr"),
          Fixture.rollbackPrepared(730, 725, 726, txTs(1), txTs(8), 77, "gid-sr"))

    val parsed = PgOutput.parse(toDf(frames), "frame", "items")
    val rows = parsed.changes.select(col("id"), unix_micros(col("_event_ts")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> txTs(6)))
    val reasons = parsed.deadLetter.select("reason")
      .as[String](spark.implicits.newStringEncoder).collect().toSeq
    assert(reasons.size == 1, s"reasons=$reasons")
    assert(reasons.head.contains("streamed-prepared xid=99"))
  }

  test("frameCounts tallies the feed by message tag, streamed DML included") {
    val frames =
      Seq(Fixture.relation(5, 7, ns, "items", itemCols)) ++
        tx(1, 100, Seq(
          Fixture.insert(101, 7, Seq(VText("1"), VText("ann"), VText("3"))))) ++
        Seq(Fixture.keepalive(150), Fixture.unknown(160, 'Z')) ++
        Seq(Fixture.streamStart(500, 77),
          Fixture.insert(501, 7, Seq(VText("2"), VText("bob"), VNull), xid = 77),
          Fixture.streamStop(510),
          Fixture.streamCommit(540, 77, 600, 601, txTs(9)))
    val counts = PgOutput.frameCounts(toDf(frames), "frame")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("relation" -> 1L, "begin" -> 1L, "insert" -> 1L,
      "commit" -> 1L, "keepalive" -> 1L, "unknown:Z" -> 1L,
      "stream_start" -> 1L, "stream:insert" -> 1L, "stream_stop" -> 1L,
      "stream_commit" -> 1L))
  }

  // ── REPLICA IDENTITY FULL: changed-column masks ──────────────────────

  test("_changed_cols diffs the full old image; key-only and absent old give null") {
    val frames =
      Seq(Fixture.relation(5, 7, ns, "items", itemCols, replicaIdentity = 'f')) ++
        tx(1, 100, Seq(
          Fixture.insert(101, 7, Seq(VText("1"), VText("ann"), VText("3"))),
          // full old image: only name changed
          Fixture.update(102, 7, Seq(VText("1"), VText("anne"), VText("3")),
            old = Some(('O', Seq(VText("1"), VText("ann"), VText("3"))))),
          // no-op update: empty mask, not null
          Fixture.update(103, 7, Seq(VText("1"), VText("anne"), VText("3")),
            old = Some(('O', Seq(VText("1"), VText("anne"), VText("3"))))),
          // null→value and value→null both count; toasted new value never does
          Fixture.update(104, 7, Seq(VText("1"), VUnchanged, VNull),
            old = Some(('O', Seq(VText("1"), VText("anne"), VText("3"))))),
          // key-only old image: diff undefined
          Fixture.update(105, 7, Seq(VText("1"), VText("ax"), VText("9")),
            old = Some(('K', Seq(VText("1"), VNull, VNull)))),
          Fixture.delete(106, 7, Seq(VText("1"), VNull, VNull))))
    val rows = PgOutput.parse(toDf(frames), "frame", "items").changes
      .select("_version", "_changed_cols").orderBy("_version")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getSeq[String](1).toList)).toSeq
    assert(rows == Seq(
      (101L, null), (102L, List("name")), (103L, Nil),
      (104L, List("qty")), (105L, null), (106L, null)))
  }

  // ── logical 'M' messages ─────────────────────────────────────────────

  test("logicalMessages surfaces plain, immediate, and streamed frames with tx state") {
    val frames =
      Seq(Fixture.relation(5, 7, ns, "items", itemCols)) ++
        tx(1, 100, Seq(
          Fixture.message(101, 101, "wm", "b1".getBytes("UTF-8")))) ++
        Seq(
          Fixture.message(150, 150, "tick", "t0".getBytes("UTF-8"),
            transactional = false),
          Fixture.streamStart(200, xid = 77),
          Fixture.message(201, 201, "s", "in-stream".getBytes("UTF-8"), xid = 77),
          Fixture.streamStop(210),
          Fixture.streamCommit(211, 77, 211, 212, txTs(2)),
          Fixture.streamStart(300, xid = 88),
          Fixture.message(301, 301, "s", "doomed".getBytes("UTF-8"), xid = 88),
          Fixture.streamStop(310),
          Fixture.streamAbort(311, 88, 88),
          Fixture.streamStart(400, xid = 99),
          Fixture.message(401, 401, "s", "later".getBytes("UTF-8"), xid = 99),
          Fixture.streamStop(410))
    val m = PgOutput.logicalMessages(toDf(frames), "frame")
      .orderBy("wal_start")
      .collect().map(r => (r.getLong(0), r.getString(2),
        new String(r.getAs[Array[Byte]](3), "UTF-8"), r.getBoolean(4),
        if (r.isNullAt(5)) -1L else r.getLong(5), r.getString(6))).toSeq
    assert(m == Seq(
      (101L, "wm", "b1", true, -1L, "committed"),
      (150L, "tick", "t0", false, -1L, "immediate"),
      (201L, "s", "in-stream", true, 77L, "committed"),
      (301L, "s", "doomed", true, 88L, "aborted"),
      (401L, "s", "later", true, 99L, "pending")))
    // parse consumes messages by design: none dead-letter, none are rows
    val parsed = PgOutput.parse(toDf(frames), "frame", "items")
    assert(parsed.deadLetter.isEmpty)
    assert(parsed.changes.isEmpty)
    // frameCounts tags them
    val counts = PgOutput.frameCounts(toDf(frames), "frame")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("message") == 2L && counts("stream:message") == 3L)
  }

  // ── replication-origin loop prevention ───────────────────────────────

  test("skipOrigins filters a marked transaction whole, including its truncate") {
    val frames =
      Seq(Fixture.relation(5, 7, ns, "items", itemCols)) ++
        // tx 1: local write — kept
        tx(1, 100, Seq(
          Fixture.insert(101, 7, Seq(VText("1"), VText("ann"), VText("3"))))) ++
        // tx 2: replicated from peer_b — filtered whole
        (Fixture.begin(200, 300, txTs(2), 1002) +:
          Seq(
            Fixture.origin(201, 42, "peer_b"),
            Fixture.truncate(202, Seq(7)),
            Fixture.insert(203, 7, Seq(VText("2"), VText("bob"), VText("5")))) :+
          Fixture.commit(300, 300, 301, txTs(2))) ++
        // tx 3: from a different origin — kept
        (Fixture.begin(400, 500, txTs(3), 1003) +:
          Seq(
            Fixture.origin(401, 43, "peer_c"),
            Fixture.insert(402, 7, Seq(VText("3"), VText("cat"), VText("9")))) :+
          Fixture.commit(500, 500, 501, txTs(3)))
    val parsed = PgOutput.parse(toDf(frames), "frame", "items",
      skipOrigins = Set("peer_b"))
    assert(parsed.truncates.isEmpty)
    assert(parsed.deadLetter.isEmpty)
    assert(parsed.changes.select("id").orderBy("id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // without the filter everything lands (truncate included)
    val all = PgOutput.parse(toDf(frames), "frame", "items")
    assert(all.truncates.length == 1)
    assert(all.changes.count() == 3)
  }

  test("skipOrigins: an origin inside a prepared tx binds to THAT tx, not the next local one") {
    // the two-phase trap: BeginPrepare..Prepare interval carrying the
    // origin, then an unrelated LOCAL transaction — naive next-plain-Begin
    // binding would silently drop the local insert (data loss)
    val frames =
      Seq(Fixture.relation(5, 7, ns, "items", itemCols)) ++
        Seq(
          Fixture.beginPrepare(100, 110, 111, txTs(1), 501, "gid1"),
          Fixture.origin(101, 42, "peer_b"),
          Fixture.insert(102, 7, Seq(VText("1"), VText("rep"), VText("1"))),
          Fixture.prepare(110, 110, 111, txTs(1), 501, "gid1"),
          Fixture.commitPrepared(150, 110, 151, txTs(2), 501, "gid1")) ++
        (Fixture.begin(200, 300, txTs(3), 1003) +:
          Seq(Fixture.insert(202, 7, Seq(VText("2"), VText("local"), VText("5")))) :+
          Fixture.commit(300, 300, 301, txTs(3)))
    val parsed = PgOutput.parse(toDf(frames), "frame", "items",
      skipOrigins = Set("peer_b"))
    assert(parsed.deadLetter.isEmpty)
    // the replicated prepared tx is filtered; the local tx SURVIVES
    assert(parsed.changes.select("id").orderBy("id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // without the filter both land
    assert(PgOutput.parse(toDf(frames), "frame", "items").changes.count() == 2)
  }

  test("skipOrigins: streamed transactions are origin-unknowable — dead-lettered, not silently applied") {
    // protocol-v2 streamed transactions carry no Origin message, so loop
    // prevention cannot vouch for them: while the filter is active their
    // resolved DML and truncates must surface in the dead-letter frame
    // (loud) instead of re-entering the mirror (a possible loop)
    val frames =
      Seq(Fixture.relation(5, 7, ns, "items", itemCols)) ++
        // local plain tx — kept
        tx(1, 100, Seq(
          Fixture.insert(101, 7, Seq(VText("1"), VText("ann"), VText("3"))))) ++
        Seq(
          // streamed committed tx: DML + truncate → both dead-letter
          Fixture.streamStart(200, xid = 77),
          Fixture.insert(201, 7, Seq(VText("2"), VText("bob"), VText("5")), xid = 77),
          Fixture.truncate(202, Seq(7), xid = 77),
          Fixture.streamStop(210),
          Fixture.streamCommit(211, 77, 211, 212, txTs(2)),
          // streamed ABORTED tx: never happened — stays silent
          Fixture.streamStart(300, xid = 88),
          Fixture.insert(301, 7, Seq(VText("9"), VText("zed"), VText("1")), xid = 88),
          Fixture.streamStop(310),
          Fixture.streamAbort(311, 88, 88))
    val parsed = PgOutput.parse(toDf(frames), "frame", "items",
      skipOrigins = Set("peer_b"))
    assert(parsed.changes.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(parsed.truncates.isEmpty)
    val reasons = parsed.deadLetter.select("reason")
      .collect().map(_.getString(0)).toSeq
    assert(reasons.size == 2)
    assert(reasons.forall(_.contains("cannot be origin-filtered")))
    // with the filter OFF the streamed committed tx applies normally
    val open = PgOutput.parse(toDf(frames), "frame", "items")
    assert(open.deadLetter.isEmpty)
    assert(open.changes.count() == 2)
    assert(open.truncates.length == 1)
  }

  test("logicalMessages resolves two-phase states: committed, aborted, pending") {
    val frames = Seq(
      // prepared + committed
      Fixture.beginPrepare(100, 110, 111, txTs(1), 601, "g1"),
      Fixture.message(101, 101, "p", "c1".getBytes("UTF-8")),
      Fixture.prepare(110, 110, 111, txTs(1), 601, "g1"),
      Fixture.commitPrepared(120, 110, 121, txTs(2), 601, "g1"),
      // prepared + rolled back
      Fixture.beginPrepare(200, 210, 211, txTs(3), 602, "g2"),
      Fixture.message(201, 201, "p", "r1".getBytes("UTF-8")),
      Fixture.prepare(210, 210, 211, txTs(3), 602, "g2"),
      Fixture.rollbackPrepared(220, 211, 221, txTs(3), txTs(4), 602, "g2"),
      // prepared + unresolved in this batch
      Fixture.beginPrepare(300, 310, 311, txTs(5), 603, "g3"),
      Fixture.message(301, 301, "p", "u1".getBytes("UTF-8")),
      Fixture.prepare(310, 310, 311, txTs(5), 603, "g3"),
      // streamed tx ending in Stream Prepare, then Commit Prepared
      Fixture.streamStart(400, xid = 604),
      Fixture.message(401, 401, "p", "s1".getBytes("UTF-8"), xid = 604),
      Fixture.streamStop(410),
      Fixture.streamPrepare(411, 411, 412, txTs(6), 604, "g4"),
      Fixture.commitPrepared(420, 411, 421, txTs(7), 604, "g4"))
    val m = PgOutput.logicalMessages(toDf(frames), "frame")
      .orderBy("wal_start")
      .collect().map(r => (new String(r.getAs[Array[Byte]](3), "UTF-8"),
        r.getString(6))).toSeq
    assert(m == Seq(("c1", "committed"), ("r1", "aborted"),
      ("u1", "pending"), ("s1", "committed")))
  }

  // ── unchanged-TOAST repair ───────────────────────────────────────────

  test("healUnchangedToast: in-batch chain, heal-to-null, unresolved stays loud") {
    val frames =
      Seq(Fixture.relation(5, 7, ns, "items", itemCols)) ++
        tx(1, 100, Seq(
          Fixture.insert(101, 7, Seq(VText("1"), VText("bigA"), VText("1"))))) ++
        tx(2, 200, Seq(
          // toasted update: name unchanged on the wire
          Fixture.update(201, 7, Seq(VText("1"), VUnchanged, VText("2"))),
          // a key with NO prior image anywhere: unresolved
          Fixture.update(202, 7, Seq(VText("2"), VUnchanged, VText("9"))))) ++
        tx(3, 300, Seq(
          // GENUINE transmitted null (UPDATE ... SET name = NULL)
          Fixture.update(301, 7, Seq(VText("1"), VNull, VText("3"))))) ++
        tx(4, 400, Seq(
          // toasted again: must heal to the transmitted NULL, flag cleared
          Fixture.update(401, 7, Seq(VText("1"), VUnchanged, VText("4")))))
    val parsed = PgOutput.parse(toDf(frames), "frame", "items")
    val healed = PgOutput.healUnchangedToast(parsed.changes, Seq("id"))
      .select("id", "_version", "name", "qty", "_unchanged_toast")
      .orderBy("_version").collect().toSeq
    assert(healed == Seq(
      Row(1L, 101L, "bigA", 1, null),
      Row(1L, 201L, "bigA", 2, null), // healed from the insert
      Row(2L, 202L, null, 9, Seq("name")), // no prior image: loud
      Row(1L, 301L, null, 3, null), // real transmitted null
      Row(1L, 401L, null, 4, null))) // healed TO null, flag cleared
  }

  test("healUnchangedToast: mirror base image heals, its own unresolved marker propagates") {
    import spark.implicits._
    val frames =
      Seq(Fixture.relation(5, 7, ns, "items", itemCols)) ++
        tx(1, 500, Seq(
          Fixture.update(501, 7, Seq(VText("1"), VUnchanged, VText("7"))),
          Fixture.update(502, 7, Seq(VText("2"), VUnchanged, VText("8")))))
    val parsed = PgOutput.parse(toDf(frames), "frame", "items")
    // committed mirror: key 1 has a real image (two versions — the NEWEST
    // must win as base); key 2's newest image is itself unresolved for
    // `name`, so its null must NOT transmit
    val mirror = Seq(
      (1L, "old", 1, 10L, null.asInstanceOf[Seq[String]]),
      (1L, "bigB", 2, 20L, null.asInstanceOf[Seq[String]]),
      (2L, null.asInstanceOf[String], 3, 30L, Seq("name")))
      .toDF("id", "name", "qty", "_version", "_unchanged_toast")
    val healed = PgOutput.healUnchangedToast(parsed.changes, Seq("id"), Some(mirror))
      .select("id", "name", "qty", "_unchanged_toast")
      .orderBy("id").collect().toSeq
    assert(healed == Seq(
      Row(1L, "bigB", 7, null), // healed from the newest mirror image
      Row(2L, null, 8, Seq("name")))) // mirror null was itself unresolved
  }

  test("healUnchangedToast: additive schema evolution — mirror lacking the new column") {
    import spark.implicits._
    val v2Cols = itemCols :+ RelCol("note", 25, -1, isKey = false)
    val frames =
      Seq(Fixture.relation(5, 7, ns, "items", v2Cols)) ++
        tx(1, 600, Seq(
          // toasted name heals from a PRE-EVOLUTION mirror image (no
          // `note` column there); a toasted NEW column heals to null —
          // the pre-evolution image's value IS null under the additive-
          // evolution posture ("older rows carry null"), so the flag
          // clears rather than staying unresolved
          Fixture.update(601, 7,
            Seq(VText("1"), VUnchanged, VText("4"), VUnchanged))))
    val parsed = PgOutput.parse(toDf(frames), "frame", "items")
    val mirror = Seq((1L, "bigC", 3, 50L))
      .toDF("id", "name", "qty", "_version") // note never mirrored
    val healed = PgOutput.healUnchangedToast(parsed.changes, Seq("id"),
      Some(mirror))
      .select("id", "name", "qty", "note", "_unchanged_toast")
      .collect().toSeq
    assert(healed == Seq(Row(1L, "bigC", 4, null, null)))
  }

  test("fuzz: decodeFrame never throws and parse dead-letters arbitrary bytes") {
    // parse's metadata passes call decodeFrame bare — a throw on ANY byte
    // sequence would crash the whole capture batch, so no-throw is a load-
    // bearing contract, fuzzed here with seeded deterministic garbage:
    // pure noise, frames with valid outer tags, and valid XLogData headers
    // wrapping noise message bodies (penetrating every decodeMsg branch)
    val rnd = new scala.util.Random(42)
    val msgTags = "BCIUDRTMSOEcPKwkZ?".toCharArray
    val frames = (1 to 400).map { i =>
      val body = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(body)
      i % 4 match {
        case 0 => body // pure noise
        case 1 => Array[Byte]('w') ++ body // XLogData tag, noisy header
        case 2 => Array[Byte]('k') ++ body // keepalive tag, noisy header
        case _ => // valid 25-byte XLogData header + tagged noise message
          val hdr = java.nio.ByteBuffer.allocate(25)
          hdr.put('w'.toByte).putLong(i.toLong).putLong(i.toLong + 1)
            .putLong(0L)
          hdr.array() ++ Array[Byte](msgTags(i % msgTags.length).toByte) ++ body
      }
    }
    frames.foreach { f =>
      PgOutput.decodeFrame(f) // Either, never a throw
      PgOutput.decodeFrame(f, inStream = true)
    }
    // the DataFrame-level parse survives the same garbage: frames that
    // decode to nothing interpretable land in the dead letter with a
    // reason, and nothing ever reaches changes (no Relation registered)
    val parsed = PgOutput.parse(
      toDf(Fixture.relation(5, 7, ns, "items", itemCols) +: frames),
      "frame", "items")
    assert(parsed.changes.count() == 0)
    val dead = parsed.deadLetter.select("reason")
      .as[String](spark.implicits.newStringEncoder).collect()
    assert(dead.nonEmpty && dead.forall(r => r != null && r.nonEmpty))
  }
}
