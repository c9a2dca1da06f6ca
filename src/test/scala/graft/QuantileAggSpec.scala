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
}
