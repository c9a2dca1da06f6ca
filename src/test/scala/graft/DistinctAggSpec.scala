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
}
