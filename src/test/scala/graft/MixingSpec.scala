package graft

import graft.operators.Sampling
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Token-budget mixing and deterministic epoch shuffle: exactness,
  * layout-independence, and the scale contracts (no global window; bounded
  * fanout collect).
  */
class MixingSpec extends SparkSpec {

  private val docs = "/root/testdata/sf0.001"

  /** Collect window nodes, descending through AQE wrappers and finished
    * query stages (stage plans are fields, not children — plain `collect`
    * misses them).
    */
  private def windowsIn(df: DataFrame): Seq[WindowExec] = {
    df.collect() // materialize so AQE has finalized the plan
    def go(p: SparkPlan): Seq[WindowExec] = p.flatMap {
      case a: AdaptiveSparkPlanExec                              => go(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => go(s.plan)
      case w: WindowExec                                         => Seq(w)
      case _                                                     => Nil
    }
    go(df.queryExecution.executedPlan)
  }

  test("tokenBudgetMix: per-stratum totals within budget, pick is maximal") {
    val d = Tables.load(spark, docs, "documents")
    val budget = 800L
    val mixed = Sampling.tokenBudgetMix(d, Seq("lang"), col("doc_id"),
      size(split(col("text"), " ")), budget)

    val perLang = mixed.groupBy(col("lang"))
      .agg(max(col("cum_tokens")).as("used"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(perLang.nonEmpty)
    perLang.foreach { case (lang, used, n) =>
      assert(used <= budget, s"$lang used $used > $budget")
      assert(n > 0, s"$lang picked nothing")
    }

    // maximality: the first unpicked doc per stratum would overflow the budget
    val ranked = d.withColumn("__hb", Sampling.keyBucket(col("doc_id")))
      .withColumn("nt", size(split(col("text"), " ")).cast("long"))
      .orderBy(col("lang"), col("__hb"), col("doc_id"))
      .select(col("lang"), col("doc_id"), col("nt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val pickedIds = mixed.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    ranked.groupBy(_._1).foreach { case (lang, rows) =>
      val firstOut = rows.find(r => !pickedIds.contains(r._2))
      firstOut.foreach { case (_, _, nt) =>
        val used = perLang.find(_._1 == lang).map(_._2).getOrElse(0L)
        assert(used + nt > budget,
          s"$lang: first unpicked doc fits ($used + $nt <= $budget) — pick not maximal")
      }
    }
  }

  test("tokenBudgetMix: stable under repartitioning, window is per-stratum") {
    val d = Tables.load(spark, docs, "documents")
    def run(in: DataFrame): Set[Long] =
      Sampling.tokenBudgetMix(in, Seq("lang"), col("doc_id"),
        size(split(col("text"), " ")), 800L)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(run(d) == run(d.repartition(7)))

    val mixed = Sampling.tokenBudgetMix(d, Seq("lang"), col("doc_id"),
      size(split(col("text"), " ")), 800L)
    val windows = windowsIn(mixed)
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "running sum must be a per-stratum window, never a global one")
  }

  test("temperatureMix: sqrt-weighted allocations, within-budget, maximal fill") {
    val d = Tables.load(spark, docs, "documents")
    val budget = 5000L
    val mixed = Sampling.temperatureMix(d, Seq("source"), col("doc_id"),
      size(split(col("text"), " ")), budget)

    // allocations reproduce the integer formula exactly
    val totals = d.groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = totals.map { case (s, t) => s -> math.sqrt(t.toDouble).toLong }
    val sw = w.values.sum
    val allocs = mixed.select(col("source"), col("alloc_tokens")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    allocs.foreach { case (s, a) =>
      assert(a == budget * w(s) / sw, s"$s: alloc $a != ${budget * w(s) / sw}")
    }
    // per-stratum fill stays within its allocation and is maximal
    val used = mixed.groupBy(col("source"))
      .agg(max(col("cum_tokens")).as("u")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    used.foreach { case (s, u) => assert(u <= allocs(s), s"$s overfilled") }
    // upsampling property: allocation SHARE of the smallest source exceeds
    // its token share (α = 1/2 flattens the mixture)
    val minSrc = totals.minBy(_._2)._1
    val tokShare = totals(minSrc).toDouble / totals.values.sum
    val allocShare = allocs(minSrc).toDouble / allocs.values.sum
    assert(allocShare > tokShare,
      s"smallest source not upsampled: $allocShare <= $tokShare")
    // layout-independence
    def ids(in: DataFrame): Set[Long] =
      Sampling.temperatureMix(in, Seq("source"), col("doc_id"),
        size(split(col("text"), " ")), budget)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids(d) == ids(d.repartition(7)))
  }

  test("globalShuffle: dense permutation, balanced shards, epoch-distinct") {
    val d = Tables.load(spark, docs, "documents")
    val n = d.count()
    val shuffled = Sampling.globalShuffle(d, col("doc_id"), seed = 7L, numShards = 8)

    val pos = shuffled.select(col("pos")).collect().map(_.getLong(0)).sorted
    assert(pos.toSeq == (0L until n).toSeq, "positions must be exactly 0..N-1")

    val shardSizes = shuffled.groupBy(col("shard")).agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(shardSizes.length == 8 && shardSizes.max - shardSizes.min <= 1,
      s"round-robin shards must balance to ±1, got ${shardSizes.mkString(",")}")

    // different seed ⇒ a genuinely different permutation of the same ids
    def order(seed: Long): Seq[Long] =
      Sampling.globalShuffle(d, col("doc_id"), seed, 8)
        .orderBy(col("pos")).select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    val e7 = order(7L)
    val e8 = order(8L)
    assert(e7.toSet == e8.toSet && e7 != e8)
  }

  test("globalShuffle: layout-independent and windowed per range, not globally") {
    val d = Tables.load(spark, docs, "documents")
    def posMap(in: DataFrame, fanout: Int): Map[Long, Long] =
      Sampling.globalShuffle(in, col("doc_id"), 7L, 8, fanout)
        .select(col("doc_id"), col("pos")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = posMap(d, 256)
    assert(posMap(d.repartition(5), 256) == base, "partitioning must not change the order")
    assert(posMap(d, 16) == base, "fanout is an execution knob, not a semantic one")

    val shuffled = Sampling.globalShuffle(d, col("doc_id"), 7L, 8)
    val windows = windowsIn(shuffled)
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "row numbering must be per hash-range, never a single global window")
  }

  test("weightedSample: exact A-ES top-k, weight-monotone and order-free") {
    import spark.implicits._
    // replicate the key formula: es = ln(((id·prime) mod 1e4 + 1)/10001)/w
    val rows = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10000L),
      (5L, 10L), (6L, 10L))
    def es(id: Long, w: Long): Double =
      math.log((Math.floorMod(id * 2654435761L, 10000L) + 1).toDouble
        / 10001.0) / w.toDouble
    val want = rows.sortBy { case (id, w) => (-es(id, w), id) }.take(3)
      .map(_._1).toSet
    def run(np: Int) = Sampling.weightedSample(
      rows.toDF("id", "w").repartition(np), col("id"), col("w"), 3)
      .select("id").as[Long].collect().toSet
    assert(run(1) == want && run(7) == want)
    // the heavy row (weight 1000x) holds the key closest to zero — it is
    // mathematically guaranteed a member for ANY hash draw here
    assert(want.contains(4L))
  }
}
