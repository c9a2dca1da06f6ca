package graft

import graft.operators.QuantileAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

class QuantileAggSpec extends SparkSpec {
  import spark.implicits._

  private def dir() = Files.createTempDirectory("graft_quant").toString + "/q"

  private val events = "/root/testdata/sf0.001"

  private def asMap(df: DataFrame): Map[String, Seq[Double]] =
    df.collect().map(r => r.getString(0) ->
      (1 until r.length).map(r.getDouble)).toMap

  /** |rank(est) − q| within `eps`, per group: the KLL contract, checked
    * against the group's actual value multiset.
    */
  private def rankErrOk(ev: DataFrame, got: Map[String, Seq[Double]],
                        qs: Seq[Double], eps: Double): Unit = {
    val values = ev.select(col("event_type"), col("value"))
      .as[(String, Double)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    for ((g, ests) <- got; (est, q) <- ests.zip(qs)) {
      val vs = values(g)
      val rank = vs.count(_ <= est).toDouble / vs.length
      assert(math.abs(rank - q) <= eps,
        s"$g q=$q est=$est rank=$rank off by ${math.abs(rank - q)}")
    }
  }

  test("maintained quantiles honor the KLL rank contract across syncs") {
    val d = dir()
    val qs = Seq(0.5, 0.95)
    val ev = Tables.load(spark, events, "events")
      .select(col("event_type"), col("value"))

    val b0 = ev.where(pmod(col("value").cast("long"), lit(3)) === 0)
    val b1 = ev.where(pmod(col("value").cast("long"), lit(3)) === 1)
    val b2 = ev.where(pmod(col("value").cast("long"), lit(3)) === 2)
    val agg = QuantileAgg.create(spark, b0, Seq("event_type"), Seq("value"), d)
    agg.refresh(b1)
    agg.refresh(b2)

    // every read independently honors the rank contract (KLL merges draw
    // fresh random bits, so bit-equality between reads is NOT guaranteed)
    rankErrOk(ev, asMap(agg.read(qs)), qs, eps = 0.05)
    rankErrOk(ev, asMap(agg.read(qs)), qs, eps = 0.05)

    // global rollup honors the contract against the ungrouped multiset
    val g = agg.global(qs).collect().head
    val all = ev.select(col("value")).as[Double].collect().sorted
    for ((est, q) <- (0 until g.length).map(g.getDouble).zip(qs)) {
      val rank = all.count(_ <= est).toDouble / all.length
      assert(math.abs(rank - q) <= 0.05, s"global q=$q est=$est rank=$rank")
    }
  }

  test("compact keeps the contract; replay ids skip; reopen agrees") {
    val d = dir()
    val qs = Seq(0.5)
    val ev = Tables.load(spark, events, "events")
      .select(col("event_type"), col("value"))
    val agg = QuantileAgg.create(spark, ev.limit(200), Seq("event_type"),
      Seq("value"), d)
    assert(agg.refreshBatch(1L, ev.limit(400)))
    assert(agg.refreshBatch(2L, ev.limit(600)))

    agg.compact()
    assert(agg.base == 3)
    // post-compact estimates still honor the contract over everything fed
    val fed = ev.limit(200).unionByName(ev.limit(400)).unionByName(ev.limit(600))
    rankErrOk(fed, asMap(agg.read(qs)), qs, eps = 0.05)

    // replayed id: skipped — the committed layout (gens/base) is untouched
    val (g0, b0) = (agg.gens, agg.base)
    assert(!agg.refreshBatch(2L, ev.limit(999)))
    assert(agg.gens == g0 && agg.base == b0)
    rankErrOk(fed, asMap(agg.read(qs)), qs, eps = 0.05)

    // a reopened handle reads the same committed bytes — same contract
    val again = QuantileAgg.open(spark, d, Seq("event_type"), Seq("value"))
    assert(again.lastBatch == 2)
    rankErrOk(fed, asMap(again.read(qs)), qs, eps = 0.05)
    val e = intercept[IllegalArgumentException] {
      QuantileAgg.open(spark, d, Seq("event_type"), Seq("other"))
    }
    assert(e.getMessage.contains("different"))
  }

  test("streaming maintenance rides microbatches on the shared rider chassis") {
    import graft.streaming.CdcStream
    import graft.streaming.CdcStream.Change
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_quant_stream")
    val target = base.resolve("mirror").toString
    val ckpt = base.resolve("ckpt").toString
    val qdir = base.resolve("agg").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    val prep: DataFrame => DataFrame = df => df
      .withColumn("grp", when(col("key") % 2 === 0, "even").otherwise("odd"))
      .withColumn("v", col("payload").cast("double"))

    val empty = prep(Seq.empty[Change].toDS().toDF()
      .withColumn("is_deleted", lit(false)))
    val agg = QuantileAgg.create(spark, empty, Seq("grp"), Seq("v"), qdir)

    val input = MemoryStream[Change]
    def run(): Unit = CdcStream.mirrorToParquetWithQuantiles(input.toDS(),
      target, ckpt, agg, prep, nBuckets = 4).awaitTermination()

    input.addData((1 to 40).map(i =>
      Change(i.toLong, i.toLong, "insert", ts("2024-01-01 00:00:00"), i.toString)): _*)
    run()
    input.addData((41 to 80).map(i =>
      Change(i.toLong, i.toLong, "insert", ts("2024-01-01 00:01:00"), i.toString)): _*)
    run()

    // medians of 1..80 by parity: odd {1,3,..,79}, even {2,4,..,80} —
    // KLL is exact at this size (all values retained)
    val got = asMap(agg.read(Seq(0.5)))
    assert(math.abs(got("odd").head - 39) <= 2 &&
      math.abs(got("even").head - 40) <= 2, s"medians off: $got")

    // replay skipped; committed generations untouched
    val dupe = prep(Seq(Change(9L, 99L, "insert", ts("2024-01-01 00:02:00"), "7"))
      .toDS().toDF().withColumn("is_deleted", lit(false)))
    val g0 = agg.gens
    assert(!agg.refreshBatch(agg.lastBatch.toLong, dupe))
    assert(agg.gens == g0)
  }
}
