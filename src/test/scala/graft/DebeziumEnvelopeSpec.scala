package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.CdcOps
import graft.sources.DebeziumEnvelope

class DebeziumEnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private val rowSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType)))

  private def src(lsn: Long, tsMs: Long) =
    s""""source":{"lsn":$lsn,"ts_ms":$tsMs,"table":"users","db":"app","schema":"public","snapshot":"false"}"""

  test("c/u/r/d map to upserts and deletes; wrapper detected per row") {
    val events = Seq(
      // create, wrapped in the schemas.enable=true payload envelope
      s"""{"schema":{},"payload":{"before":null,"after":{"id":1,"name":"ann"},${src(100, 1000)},"op":"c","ts_ms":1000}}""",
      // update, unwrapped (schemas.enable=false)
      s"""{"before":{"id":1,"name":"ann"},"after":{"id":1,"name":"anne"},${src(200, 2000)},"op":"u","ts_ms":2000}""",
      // snapshot read of another key
      s"""{"before":null,"after":{"id":2,"name":"bob"},${src(50, 500)},"op":"r","ts_ms":500}""",
      // delete: image comes from `before`
      s"""{"before":{"id":2,"name":"bob"},"after":null,${src(300, 3000)},"op":"d","ts_ms":3000}"""
    ).toDF("value")
    val p = DebeziumEnvelope.parse(events, "value", rowSchema)
    assert(p.deadLetter.count() === 0)
    val rows = p.changes
      .select(col("id"), col("name"), col("_version"), col("_is_deleted"),
        col("_source_table"))
      .as[(Long, String, Long, Boolean, String)].collect().toSet
    assert(rows == Set(
      (1L, "ann", 100L, false, "users"),
      (1L, "anne", 200L, false, "users"),
      (2L, "bob", 50L, false, "users"),
      (2L, "bob", 300L, true, "users")))
    // end-to-end: the parsed log collapses to the engine's FINAL semantics
    val fin = CdcOps.softDeleteSnapshot(
      p.changes.select(col("id"), col("name"), col("_version"),
        col("_is_deleted")),
      Seq("id"), "_version", col("_is_deleted"))
      .select(col("id"), col("name")).as[(Long, String)].collect().toSet
    assert(fin == Set((1L, "anne"))) // id 2 deleted at the newest version
  }

  test("missing lsn falls back to promoted ts_ms; event ts surfaces") {
    val events = Seq(
      s"""{"before":null,"after":{"id":7,"name":"x"},"source":{"ts_ms":5000,"table":"users"},"op":"c","ts_ms":5000}"""
    ).toDF("value")
    val p = DebeziumEnvelope.parse(events, "value", rowSchema)
    val (v, ts) = p.changes.select(col("_version"), col("_event_ts"))
      .as[(Long, java.sql.Timestamp)].head()
    assert(v === 5000L * 1000)
    assert(ts === java.sql.Timestamp.valueOf("1970-01-01 00:00:05.0"))
  }

  test("streaming end-to-end: a JSON landing zone mirrors through parse") {
    import graft.streaming.CdcStream
    val base = java.nio.file.Files.createTempDirectory("graft_dbz_stream")
    val landing = base.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val target = base.resolve("mirror").toString
    val ckpt = base.resolve("ckpt").toString

    def drop(name: String, lines: String*): Unit =
      java.nio.file.Files.write(landing.resolve(name),
        lines.mkString("\n").getBytes("UTF-8"))

    // batch 1: two creates; batch 2: an update and a delete
    drop("b1.json",
      s"""{"before":null,"after":{"id":1,"name":"ann"},${src(100, 1000)},"op":"c","ts_ms":1000}""",
      s"""{"before":null,"after":{"id":2,"name":"bob"},${src(110, 1100)},"op":"c","ts_ms":1100}""")

    val raw = spark.readStream.text(landing.toString)
    val changes = DebeziumEnvelope.parse(raw, "value", rowSchema).changes
      .select(col("id").as("key"), col("_version").as("version"),
        when(col("_is_deleted"), "delete").otherwise("insert").as("op"),
        col("_event_ts").as("ts"), col("name").as("payload"))
      .as[CdcStream.Change]
    def run(): Unit = CdcStream.mirrorToParquet(changes, target, ckpt,
      nBuckets = 4).awaitTermination()
    run()
    drop("b2.json",
      s"""{"before":{"id":1,"name":"ann"},"after":{"id":1,"name":"anne"},${src(200, 2000)},"op":"u","ts_ms":2000}""",
      s"""{"before":{"id":2,"name":"bob"},"after":null,${src(300, 3000)},"op":"d","ts_ms":3000}""")
    run()

    val fin = graft.sources.Mirror.readCommitted(spark, target)
      .where(!col("is_deleted"))
      .select(col("key"), col("payload")).as[(Long, String)].collect().toSet
    assert(fin == Set((1L, "anne"))) // update applied, delete hides bob
  }

  test("versionless events dead-letter; mixed scales surface and gate") {
    val noPosition = // neither source.lsn nor ts_ms: no place in the order
      """{"before":null,"after":{"id":9,"name":"ghost"},"source":{"table":"users"},"op":"c"}"""
    val events = Seq(
      s"""{"before":null,"after":{"id":1,"name":"ann"},${src(100, 1000)},"op":"c","ts_ms":1000}""",
      s"""{"before":null,"after":{"id":2,"name":"bob"},"source":{"ts_ms":2000,"table":"users"},"op":"c","ts_ms":2000}""",
      noPosition
    ).toDF("value")
    val p = DebeziumEnvelope.parse(events, "value", rowSchema)
    // the versionless event is dead-lettered verbatim, never a null _version
    assert(p.changes.where(col("_version").isNull).count() === 0)
    assert(p.deadLetter.as[String].collect().toSet === Set(noPosition))
    // per-row provenance + per-batch counts expose the mix
    val scales = p.changes.select(col("_version_scale")).as[String].collect().sorted
    assert(scales.toSeq === Seq("lsn", "ts_ms"))
    val counts = DebeziumEnvelope.scaleCounts(p.changes)
      .as[(String, Long)].collect().toMap
    assert(counts === Map("lsn" -> 1L, "ts_ms" -> 1L))
    // the hard gate refuses the mixed feed and names both scales
    val e = intercept[IllegalStateException] {
      DebeziumEnvelope.requireUniformScale(p.changes)
    }
    assert(e.getMessage.contains("lsn=1") && e.getMessage.contains("ts_ms=1"))
    // a uniform feed passes through the gate and still collapses correctly
    val uniform = p.changes.where(col("_version_scale") === "lsn")
    val fin = CdcOps.softDeleteSnapshot(
      DebeziumEnvelope.requireUniformScale(uniform)
        .select(col("id"), col("name"), col("_version"), col("_is_deleted")),
      Seq("id"), "_version", col("_is_deleted"))
      .select(col("id"), col("name")).as[(Long, String)].collect().toSet
    assert(fin === Set((1L, "ann")))
  }

  test("tombstones vanish; corrupt and contract-breaking rows dead-letter") {
    val events = Seq(
      null, // Kafka compaction tombstone — silently dropped
      "this is not json at all{{{",
      """{"hello":"world"}""", // JSON but no op anywhere
      s"""{"before":null,"after":null,${src(10, 10)},"op":"d","ts_ms":10}""", // d without before
      s"""{"before":null,"after":{"id":3,"name":"ok"},${src(11, 11)},"op":"c","ts_ms":11}"""
    ).toDF("value")
    val p = DebeziumEnvelope.parse(events, "value", rowSchema)
    assert(p.changes.count() === 1)
    assert(p.changes.select(col("id")).as[Long].head() === 3L)
    // the three bad rows survive VERBATIM for replay — the tombstone does not
    val dead = p.deadLetter.as[String].collect().toSet
    assert(dead.size === 3)
    assert(dead.contains("this is not json at all{{{"))
  }
}
