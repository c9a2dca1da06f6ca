package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{SampleAgg, Sampling}

class SampleAggSpec extends SparkSpec {
  import spark.implicits._

  private def dir() = Files.createTempDirectory("graft_sample").toString + "/s"

  // keys 1..300 with length-ish weights; weight rule shared everywhere
  private val rows = (1L to 300L).map(i => (i, (i % 37) * 10 + 1))
  private val weight = col("w")

  private def df(filter: Long => Boolean): DataFrame =
    rows.filter(r => filter(r._1)).toDF("k", "w")

  private def sampleSet(d: DataFrame, k: Int): Seq[(Long, Long)] =
    Sampling.weightedSample(d, col("k"), weight, k)
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)

  test("maintained read is EXACTLY the one-shot draw over the union") {
    val d = dir()
    val k = 25
    // three disjoint batches by key mod 3 — winners spread across all
    def gen(i: Int) = df(_ % 3 == i)
    val agg = SampleAgg.create(spark, gen(0), "k", weight, k, d)
    agg.refresh(gen(1), weight)
    agg.refresh(gen(2), weight)
    val got = agg.read().as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == sampleSet(rows.toDF("k", "w"), k))
    // per-generation storage is bounded by k, not batch size
    assert(agg.gens == 3)
  }

  test("compact folds without changing the draw; replay skips; reopen " +
    "keeps the mark; spec mismatch is loud") {
    val d = dir()
    val k = 10
    def gen(i: Int) = df(_ % 3 == i)
    val agg = SampleAgg.create(spark, gen(0), "k", weight, k, d)
    assert(agg.refreshBatch(1L, gen(1), weight))
    assert(agg.refreshBatch(2L, gen(2), weight))
    val before = agg.read().as[(Long, Long)].collect().toSet
    assert(before == sampleSet(rows.toDF("k", "w"), k).toSet)

    agg.compact()
    assert(agg.base == 3)
    assert(agg.read().as[(Long, Long)].collect().toSet == before)

    assert(!agg.refreshBatch(2L, gen(0), weight)) // replayed id: no-op
    assert(agg.read().as[(Long, Long)].collect().toSet == before)

    val again = SampleAgg.open(spark, d, "k", k)
    assert(again.lastBatch == 2)
    assert(again.read().as[(Long, Long)].collect().toSet == before)
    val e = intercept[IllegalArgumentException] {
      SampleAgg.open(spark, d, "k", k + 1)
    }
    assert(e.getMessage.contains("different"))
  }

  test("weight-monotone: doubling one key's weight can only improve its " +
    "draw key, and the reservoir picks it up on re-create") {
    val d = dir()
    val k = 5
    val light = (1L to 50L).map(i => (i, 1L)).toDF("k", "w")
    val boosted = (1L to 50L).map(i => (i, if (i == 7L) 100000L else 1L))
      .toDF("k", "w")
    val a1 = SampleAgg.create(spark, light, "k", weight, k, d + "1")
    val a2 = SampleAgg.create(spark, boosted, "k", weight, k, d + "2")
    val s2 = a2.read().as[(Long, Long)].collect().map(_._1).toSet
    assert(s2.contains(7L)) // ln(u)/w → 0⁻ as w grows: must be sampled
    assert(a1.read().count() == k && a2.read().count() == k)
  }

  test("streaming rider: sample rides microbatches, equals the one-shot " +
    "over the fed inserts, deletes reach the mirror only") {
    import graft.streaming.CdcStream
    import graft.streaming.CdcStream.Change
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_sample_stream")
    val target = base.resolve("mirror").toString
    val ckpt = base.resolve("ckpt").toString
    val adir = base.resolve("agg").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    // weight = payload length (≥1 by construction of the fixtures)
    val w = length(col("payload")).cast("long")
    val prep: DataFrame => DataFrame = df => df.select(col("key"),
      col("payload"))
    val empty = prep(Seq.empty[Change].toDS().toDF()
      .withColumn("is_deleted", lit(false)))
    val agg = SampleAgg.create(spark, empty, "key", w, 3, adir)

    val input = MemoryStream[Change]
    def run(): Unit = CdcStream.mirrorToParquetWithSample(input.toDS(),
      target, ckpt, agg, w, prep, nBuckets = 4).awaitTermination()

    input.addData(
      Change(1L, 1L, "insert", ts("2024-01-01 00:00:00"), "aaaa"),
      Change(2L, 2L, "insert", ts("2024-01-01 00:00:01"), "bb"),
      Change(3L, 3L, "insert", ts("2024-01-01 00:00:02"), "cccccc"))
    run()
    input.addData(
      Change(2L, 4L, "delete", ts("2024-01-01 00:01:00"), "bb"),
      Change(4L, 5L, "insert", ts("2024-01-01 00:01:01"), "dddddddd"),
      Change(5L, 6L, "insert", ts("2024-01-01 00:01:02"), "e"))
    run()

    // the sample equals the one-shot over every INSERTED row (the
    // deleted key 2 was inserted in batch 1, so it is in the draw — the
    // documented insert-only stance; the mirror below honors the delete)
    val fed = Seq((1L, "aaaa"), (2L, "bb"), (3L, "cccccc"),
      (4L, "dddddddd"), (5L, "e")).toDF("key", "payload")
    val want = Sampling.weightedSample(fed, col("key"), w, 3)
      .as[(Long, String)].collect().toSet
    assert(agg.read().as[(Long, String)].collect().toSet == want)
    assert(graft.sources.Mirror.readCommitted(spark, target)
      .where(!col("is_deleted")).count() == 4)
    assert(agg.lastBatch >= 0) // batch marks advanced durably
    val reopened = SampleAgg.open(spark, adir, "key", 3)
    assert(reopened.read().as[(Long, String)].collect().toSet == want)
  }
}
