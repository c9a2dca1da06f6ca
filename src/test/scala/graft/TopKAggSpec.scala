package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TopKAgg

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def dir() = Files.createTempDirectory("graft_topk").toString + "/t"

  // skewed fixture per group: heavy items with known counts + unit noise
  private def fixture(grp: String, heavy: Seq[(String, Int)],
                      noise: Int): Seq[(String, String)] =
    heavy.flatMap { case (w, n) => Seq.fill(n)((grp, w)) } ++
      (0 until noise).map(i => (grp, s"${grp}_noise_$i"))

  private val heavyA = Seq("a" -> 50, "b" -> 30, "c" -> 20)
  private val heavyB = Seq("x" -> 40, "y" -> 25)
  private val rows = fixture("g1", heavyA, 20) ++ fixture("g2", heavyB, 15)

  private def df(filter: ((String, String)) => Boolean): DataFrame =
    rows.filter(filter).toDF("grp", "word")

  private def trueCounts(grp: String): Map[String, Long] =
    rows.filter(_._1 == grp).groupBy(_._2).view.mapValues(_.size.toLong).toMap

  test("maintained top-k honors the Misra-Gries contract across generations") {
    val d = dir()
    val k = 8
    // three generations split by a hash of the word — heavy items spread
    // across ALL generations, the merge has real work to do
    def gen(i: Int) = df(r => math.abs(r._2.hashCode % 3) == i)
    val agg = TopKAgg.create(spark, gen(0), Seq("grp"), "word", k, d)
    agg.refresh(gen(1))
    agg.refresh(gen(2))

    val got = agg.read(n = k)
      .select(col("grp"), col("item"), col("est_count"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap

    for (grp <- Seq("g1", "g2")) {
      val exact = trueCounts(grp)
      val n = exact.values.sum
      val bound = n / (k + 1)
      // guarantee 1: every item above the n/(k+1) threshold survives
      exact.filter(_._2 > bound).keys.foreach { w =>
        assert(got(grp).contains(w), s"$grp: heavy item $w lost (bound $bound)")
      }
      // guarantee 2: reported counts are lower bounds within the band
      got(grp).foreach { case (w, est) =>
        val t = exact(w)
        assert(est <= t && t <= est + bound,
          s"$grp/$w: est $est outside [${t - bound}, $t]")
      }
    }
  }

  test("compact preserves the contract; replay ids skip; reopen keeps the mark") {
    val d = dir()
    val k = 8
    def gen(i: Int) = df(r => math.abs(r._2.hashCode % 3) == i)
    val agg = TopKAgg.create(spark, gen(0), Seq("grp"), "word", k, d)
    assert(agg.refreshBatch(1L, gen(1)))
    assert(agg.refreshBatch(2L, gen(2)))

    def top3(a: TopKAgg): Set[(String, String)] =
      a.read(3).select(col("grp"), col("item"))
        .as[(String, String)].collect().toSet
    val before = top3(agg)
    // the dominant items must be in any top-3 (well above every bound)
    assert(before.contains(("g1", "a")) && before.contains(("g2", "x")))

    agg.compact()
    assert(agg.base == 3 && top3(agg) == before)

    assert(!agg.refreshBatch(2L, gen(0))) // replayed id: no-op
    assert(top3(agg) == before)

    val again = TopKAgg.open(spark, d, Seq("grp"), "word", k)
    assert(again.lastBatch == 2 && top3(again) == before)
    val e = intercept[IllegalArgumentException] {
      TopKAgg.open(spark, d, Seq("grp"), "other", k)
    }
    assert(e.getMessage.contains("different"))

    // cross-group rollup: the global heavy hitter leads
    val g = agg.global(2).as[(String, Long)].collect()
    assert(g.head._1 == "a")
  }

  test("streaming maintenance rides microbatches; deletes ignored; replay safe") {
    import graft.streaming.CdcStream
    import graft.streaming.CdcStream.Change
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_topk_stream")
    val target = base.resolve("mirror").toString
    val ckpt = base.resolve("ckpt").toString
    val adir = base.resolve("agg").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    val prep: DataFrame => DataFrame = df => df
      .withColumn("grp", lit("all"))
      .withColumn("word", col("payload"))

    val empty = prep(Seq.empty[Change].toDS().toDF()
      .withColumn("is_deleted", lit(false)))
    val agg = TopKAgg.create(spark, empty, Seq("grp"), "word", 4, adir)

    val input = MemoryStream[Change]
    def run(): Unit = CdcStream.mirrorToParquetWithTopK(input.toDS(), target,
      ckpt, agg, prep, nBuckets = 4).awaitTermination()

    input.addData(
      Change(1L, 1L, "insert", ts("2024-01-01 00:00:00"), "cat"),
      Change(2L, 2L, "insert", ts("2024-01-01 00:00:01"), "cat"),
      Change(3L, 3L, "insert", ts("2024-01-01 00:00:02"), "dog"))
    run()
    val t1 = agg.read(2).select(col("item"), col("est_count"))
      .as[(String, Long)].collect().toMap
    assert(t1 == Map("cat" -> 2L, "dog" -> 1L)) // exact below k

    // a delete is ignored by the counters; a new insert lands
    input.addData(
      Change(2L, 4L, "delete", ts("2024-01-01 00:01:00"), "cat"),
      Change(4L, 5L, "insert", ts("2024-01-01 00:01:01"), "cat"))
    run()
    val t2 = agg.read(2).select(col("item"), col("est_count"))
      .as[(String, Long)].collect().toMap
    assert(t2 == Map("cat" -> 3L, "dog" -> 1L))
    // the mirror itself still honors the delete
    assert(graft.sources.Mirror.readCommitted(spark, target)
      .where(!col("is_deleted")).count() == 3)
  }
}
