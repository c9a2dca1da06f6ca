package graft

import graft.operators.DistinctAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

class DistinctAggSpec extends SparkSpec {
  import spark.implicits._

  private def dir() = Files.createTempDirectory("graft_uniq").toString + "/u"

  private val events = "/root/testdata/sf0.001"

  private def asMap(df: DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("maintained estimate equals the one-shot sketch over the full history") {
    val d = dir()
    val ev = Tables.load(spark, events, "events")
      .select(col("event_type"), col("user_id"))

    // three "sync batches" landed separately...
    val b0 = ev.where(pmod(col("user_id"), lit(3)) === 0)
    val b1 = ev.where(pmod(col("user_id"), lit(3)) === 1)
    val b2 = ev.where(pmod(col("user_id"), lit(3)) === 2)
    val agg = DistinctAgg.create(spark, b0, Seq("event_type"), Seq("user_id"), d)
    agg.refresh(b1)
    agg.refresh(b2)

    // ...must estimate exactly like one sketch over everything (union is
    // associative and commutative — this is equality, not tolerance)
    val oneShot = ev.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))
        .as("approx_distinct_user_id"))
    assert(asMap(agg.read()) == asMap(oneShot))

    // and lands near the exact answer (HLL is exact-ish at this cardinality)
    val exact = asMap(ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")))
    asMap(agg.read()).foreach { case (k, est) =>
      assert(math.abs(est - exact(k)).toDouble / exact(k) < 0.05,
        s"$k: estimate $est vs exact ${exact(k)}")
    }

    // cross-group rollup = union of the group sketches, no rescan
    val globalOneShot = ev.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id")))
        .as("approx_distinct_user_id")).collect().head.getLong(0)
    assert(agg.global().collect().head.getLong(0) == globalOneShot)
  }

  test("compact preserves estimates; replay ids skip; reopen keeps the mark") {
    val d = dir()
    val ev = Tables.load(spark, events, "events")
      .select(col("event_type"), col("user_id"))
    val agg = DistinctAgg.create(spark, ev.limit(200), Seq("event_type"),
      Seq("user_id"), d)
    assert(agg.refreshBatch(1L, ev.limit(400)))
    assert(agg.refreshBatch(2L, ev.limit(600)))
    val before = asMap(agg.read())

    agg.compact()
    assert(asMap(agg.read()) == before && agg.base == 3)

    // replayed id: skipped, estimates untouched
    assert(!agg.refreshBatch(2L, ev.limit(999)))
    assert(asMap(agg.read()) == before)

    val again = DistinctAgg.open(spark, d, Seq("event_type"), Seq("user_id"))
    assert(again.lastBatch == 2 && asMap(again.read()) == before)
    val e = intercept[IllegalArgumentException] {
      DistinctAgg.open(spark, d, Seq("event_type"), Seq("value"))
    }
    assert(e.getMessage.contains("different"))
  }

  test("streaming maintenance rides microbatches; deletes ignored; replay skipped") {
    import graft.streaming.CdcStream
    import graft.streaming.CdcStream.Change
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_uniq_stream")
    val target = base.resolve("mirror").toString
    val ckpt = base.resolve("ckpt").toString
    val adir = base.resolve("agg").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    // group = key parity; tracked value parsed from the payload
    val prep: DataFrame => DataFrame = df => df
      .withColumn("grp", when(col("key") % 2 === 0, "even").otherwise("odd"))
      .withColumn("v", col("payload").cast("long"))

    val empty = prep(Seq.empty[Change].toDS().toDF()
      .withColumn("is_deleted", lit(false)))
    val agg = DistinctAgg.create(spark, empty, Seq("grp"), Seq("v"), adir)

    val input = MemoryStream[Change]
    def run(): Unit = CdcStream.mirrorToParquetWithDistinct(input.toDS(), target,
      ckpt, agg, prep, nBuckets = 4).awaitTermination()

    input.addData(
      Change(1L, 1L, "insert", ts("2024-01-01 00:00:00"), "10"),
      Change(2L, 2L, "insert", ts("2024-01-01 00:00:01"), "20"),
      Change(3L, 3L, "insert", ts("2024-01-01 00:00:02"), "10"),
      Change(4L, 4L, "insert", ts("2024-01-01 00:00:03"), "40"))
    run()
    // odd saw {10,10}->1 distinct; even saw {20,40}->2 (exact at this size)
    assert(asMap(agg.read()) == Map("odd" -> 1L, "even" -> 2L))

    // update key 1 to a NEW value (old stays counted: insert-only), delete
    // key 2 (ignored by the sketch), insert key 5 re-using an even value
    input.addData(
      Change(1L, 5L, "update", ts("2024-01-01 00:01:00"), "30"),
      Change(2L, 6L, "delete", ts("2024-01-01 00:01:01"), "0"),
      Change(5L, 7L, "insert", ts("2024-01-01 00:01:02"), "10"))
    run()
    // odd values ever observed: 10 (k1), 10 (k3), 30 (k1 update), 10 (k5)
    // -> {10,30}; even unchanged (the delete is ignored)
    assert(asMap(agg.read()) == Map("odd" -> 2L, "even" -> 2L))

    // the mirror itself merged normally underneath
    val mirror = graft.sources.Mirror.readCommitted(spark, target)
    assert(mirror.where(!col("is_deleted")).count() == 4) // keys 1,3,4,5
    assert(mirror.where(col("key") === 2L && col("is_deleted")).count() == 1)

    // replayed batch id: skipped
    val dummy = prep(Seq(Change(9L, 99L, "insert", ts("2024-01-01 00:02:00"), "7"))
      .toDS().toDF().withColumn("is_deleted", lit(false)))
    assert(!agg.refreshBatch(agg.lastBatch.toLong, dummy))
    assert(asMap(agg.read()) == Map("odd" -> 2L, "even" -> 2L))
  }
}
