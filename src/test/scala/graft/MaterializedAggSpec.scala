package graft

import graft.operators.MaterializedAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MaterializedAggSpec extends SparkSpec {
  import spark.implicits._

  private def dir() = Files.createTempDirectory("graft_magg").toString + "/agg"

  // (key, group, amount) rows — the live mirror state shapes
  private def rows(t: (Long, String, Long)*): DataFrame =
    t.toSeq.toDF("k", "grp", "amt")

  private def asMap(df: DataFrame): Map[String, (Long, Long)] =
    df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("create + refresh maintains the aggregate under update/delete/insert") {
    val d = dir()
    val initial = rows((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
    val agg = MaterializedAgg.create(spark, initial, Seq("grp"), Seq("amt"), d)
    assert(asMap(agg.read()) == Map("a" -> ((2L, 30L)), "b" -> ((1L, 5L))))

    // sync batch: key 1 updated (10→15), key 3 deleted, key 4 new in "b"
    val upserts = Seq((1L, "a", 15L, false), (3L, "b", 0L, true),
      (4L, "b", 7L, false)).toDF("k", "grp", "amt", "is_deleted")
    agg.refreshFromUpsert(initial, upserts, Seq("k"), "is_deleted")
    assert(asMap(agg.read()) == Map("a" -> ((2L, 35L)), "b" -> ((1L, 7L))))

    // maintenance IO is delta-sized: the new generation holds only the
    // touched groups (one partial row per group in the batch), not the corpus
    val gen1 = spark.read.parquet(s"$d/b=1")
    assert(gen1.count() == 2)

    // a group fully retracted nets to zero and vanishes
    val live2 = rows((1L, "a", 15L), (2L, "a", 20L), (4L, "b", 7L))
    val killB = Seq((4L, "b", 0L, true)).toDF("k", "grp", "amt", "is_deleted")
    agg.refreshFromUpsert(live2, killB, Seq("k"), "is_deleted")
    assert(asMap(agg.read()) == Map("a" -> ((2L, 35L))))
  }

  test("negative net row count is surfaced, not masked") {
    val d = dir()
    val agg = MaterializedAgg.create(spark, rows((1L, "a", 10L)),
      Seq("grp"), Seq("amt"), d)
    // caller bug: retract a row that was never inserted
    agg.refresh(rows().limit(0), rows((9L, "zzz", 3L)))
    val z = agg.read().where($"grp" === "zzz").collect()
    assert(z.length == 1 && z.head.getLong(1) == -1L)
  }

  test("compact folds generations with one-cycle grace; open() re-attaches") {
    val d = dir()
    val initial = rows((1L, "a", 10L), (2L, "b", 20L))
    val agg = MaterializedAgg.create(spark, initial, Seq("grp"), Seq("amt"), d)
    agg.refreshFromUpsert(initial,
      Seq((1L, "a", 11L, false)).toDF("k", "grp", "amt", "is_deleted"), Seq("k"), "is_deleted")
    agg.refreshFromUpsert(rows((1L, "a", 11L), (2L, "b", 20L)),
      Seq((3L, "b", 2L, false)).toDF("k", "grp", "amt", "is_deleted"), Seq("k"), "is_deleted")
    val before = asMap(agg.read())
    assert(before == Map("a" -> ((1L, 11L)), "b" -> ((2L, 22L))) && agg.gens == 3)

    agg.compact()
    assert(asMap(agg.read()) == before && agg.base == 3 && agg.gens == 4)
    // superseded generations keep one cycle of reader grace...
    val ls = new java.io.File(d).list().filter(_.startsWith("b=")).toSet
    assert(Set("b=0", "b=1", "b=2", "b=3").subsetOf(ls))

    // ...and a reopened handle reads the folded state
    val again = MaterializedAgg.open(spark, d, Seq("grp"), Seq("amt"))
    assert(asMap(again.read()) == before)

    // the NEXT compact vacuums them; a single live generation is a no-op
    // compact, so force one more refresh first
    again.refreshFromUpsert(rows((1L, "a", 11L), (2L, "b", 20L), (3L, "b", 2L)),
      Seq((1L, "a", 12L, false)).toDF("k", "grp", "amt", "is_deleted"), Seq("k"), "is_deleted")
    again.compact()
    val ls2 = new java.io.File(d).list().filter(_.startsWith("b=")).toSet
    assert(!ls2.contains("b=0") && !ls2.contains("b=1") && !ls2.contains("b=2"),
      s"pre-compact generations must be vacuumed by the second compact, got $ls2")
    assert(asMap(again.read()) == Map("a" -> ((1L, 12L)), "b" -> ((2L, 22L))))
  }

  test("streaming maintenance rides microbatches and skips replayed ids") {
    import graft.streaming.CdcStream
    import graft.streaming.CdcStream.Change
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_magg_stream")
    val target = base.resolve("mirror").toString
    val ckpt = base.resolve("ckpt").toString
    val adir = base.resolve("agg").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    // group/sum columns derived from the change rows: parity group, amount
    // parsed out of the payload
    val prep: DataFrame => DataFrame = df => df
      .withColumn("grp", when(col("key") % 2 === 0, "even").otherwise("odd"))
      .withColumn("amt", col("payload").cast("long"))

    val empty = prep(Seq.empty[Change].toDS().toDF()
      .withColumn("is_deleted", lit(false)))
    val agg = MaterializedAgg.create(spark, empty, Seq("grp"), Seq("amt"), adir)

    val input = MemoryStream[Change]
    def run(): Unit = CdcStream.mirrorToParquetWithAgg(input.toDS(), target,
      ckpt, agg, prep, nBuckets = 4).awaitTermination()

    input.addData(
      Change(1L, 1L, "insert", ts("2024-01-01 00:00:00"), "10"),
      Change(2L, 2L, "insert", ts("2024-01-01 00:00:01"), "20"),
      Change(3L, 3L, "insert", ts("2024-01-01 00:00:02"), "30"),
      Change(4L, 4L, "insert", ts("2024-01-01 00:00:03"), "40"))
    run()
    assert(asMap(agg.read().select("grp", "n_rows", "sum_amt"))
      == Map("even" -> ((2L, 60L)), "odd" -> ((2L, 40L))))

    // update key 1, delete key 2, insert key 5
    input.addData(
      Change(1L, 5L, "update", ts("2024-01-01 00:01:00"), "100"),
      Change(2L, 6L, "delete", ts("2024-01-01 00:01:01"), "0"),
      Change(5L, 7L, "insert", ts("2024-01-01 00:01:02"), "50"))
    run()
    val expected = Map("even" -> ((1L, 40L)), "odd" -> ((3L, 180L)))
    assert(asMap(agg.read().select("grp", "n_rows", "sum_amt")) == expected)

    // ...and the maintained answer equals a full re-aggregation of the
    // mirror's FINAL state
    val full = prep(graft.sources.Mirror.readCommitted(spark, target)
      .where(!col("is_deleted")))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"), sum(col("amt")).as("sum_amt"))
    assert(asMap(full) == expected)

    // a replayed batch id is skipped — partials never double-count
    val dummy = prep(Seq(Change(9L, 99L, "insert", ts("2024-01-01 00:02:00"), "7"))
      .toDS().toDF().withColumn("is_deleted", lit(false)))
    assert(!agg.refreshBatch(0L, dummy.limit(0), dummy, Seq("key"), "is_deleted"))
    assert(asMap(agg.read().select("grp", "n_rows", "sum_amt")) == expected)
    // the high-water mark survives a reopen
    val again = MaterializedAgg.open(spark, adir, Seq("grp"), Seq("amt"))
    assert(again.lastBatch == agg.lastBatch && agg.lastBatch >= 1)
    assert(!again.refreshBatch(again.lastBatch.toLong, dummy.limit(0), dummy,
      Seq("key"), "is_deleted"))
  }

  test("open with a different spec refuses") {
    val d = dir()
    MaterializedAgg.create(spark, rows((1L, "a", 1L)), Seq("grp"), Seq("amt"), d)
    val e = intercept[IllegalArgumentException] {
      MaterializedAgg.open(spark, d, Seq("k"), Seq("amt"))
    }
    assert(e.getMessage.contains("different"))
  }
}
