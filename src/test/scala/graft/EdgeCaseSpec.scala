package graft

import graft.expressions.{RollingFingerprint, TokenMinHash}
import graft.functions.VectorFunctions
import graft.operators.{AsOfJoin, CdcOps, Dedup}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Degenerate-input behavior: empty frames, empty strings, zero vectors —
  * the inputs a 100 TB pipeline will definitely contain somewhere.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  test("topSupplier computes the shared quarter aggregate once (AQE stage reuse)") {
    val d = "/root/testdata/sf0.001"
    val df = graft.operators.Analytics.topSupplier(
      Tables.load(spark, d, "supplier"), Tables.load(spark, d, "lineitem"))
    val out = df.collect()
    assert(out.nonEmpty && out.map(_.getLong(0)).distinct.length == out.length)
    // the per-supplier aggregate feeds both the join side and the max-row
    // scalar; its subtrees are kept canonically identical (explicit
    // null-key filter) so AQE reuses the materialized stage instead of
    // scanning the quarter twice
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedQueryStage") || plan.contains("ReusedExchange"),
      s"no stage reuse in topSupplier plan:\n$plan")
  }

  test("CDC collapse of an empty log is empty, not an error") {
    val empty = Seq.empty[(Long, Long, String)].toDF("key", "version", "op")
    assert(CdcOps.latestSnapshot(empty, Seq("key"), "version").count() == 0)
  }

  test("dedup operators accept empty and single-doc corpora") {
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    assert(Dedup.minhashLsh(empty, "doc_id", "text").count() == 0)
    assert(Dedup.components(Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() == 0)
    val one = Seq((1L, "only document", "en")).toDF("doc_id", "text", "lang")
    assert(Dedup.minhashLsh(one, "doc_id", "text").count() == 0)
    assert(Dedup.simhash(one, "doc_id", "text").count() == 1)
  }

  test("TokenMinHash of an empty token list yields the sentinel signature") {
    val sig = TokenMinHash.compute(new GenericArrayData(Array.empty[Any]), 3, 8, 0)
    assert(sig.length == 8 && sig.forall(_ == Long.MaxValue))
    val bands = TokenMinHash.compute(new GenericArrayData(Array.empty[Any]), 3, 8, 4)
    assert(bands.length == 4)
  }

  test("RollingFingerprint of empty and sub-k strings degrades to one hash") {
    assert(RollingFingerprint.compute(UTF8String.fromString(""), 8, 16).length == 1)
    assert(RollingFingerprint.compute(UTF8String.fromString("ab"), 8, 16).length == 1)
  }

  test("cosine of a zero vector is NaN, not a crash; quantization round-trips") {
    val df = Seq(
      (1L, Array(0f, 0f, 0f)),
      (2L, Array(1f, -2f, 0.5f))).toDF("id", "v")
    val cos = df.where($"id" === 1)
      .select(VectorFunctions.cosine($"v", $"v")).as[Double].head()
    assert(cos.isNaN)

    val rt = df.select($"id",
        VectorFunctions.dequantizeInt8(VectorFunctions.quantizeInt8($"v")).as("rv"),
        $"v")
      .as[(Long, Array[Double], Array[Float])].collect()
    rt.foreach { case (_, rv, v) =>
      rv.zip(v).foreach { case (a, b) =>
        assert(math.abs(a - b) <= math.abs(b) / 127.0 + 1e-9) }
    }
  }

  test("PackInt8 matches quantizeInt8; Int8CosineSim matches cosine of the dequantized vector") {
    val df = Seq(
      (1L, Array(0f, 0f, 0f)),
      (2L, Array(1f, -2f, 0.5f)),
      (3L, Array(-0.25f, 0.75f, 127f))).toDF("id", "v")
    // same math, packed storage: scale equal, codes byte-for-byte equal
    val both = df.select(
        graft.expressions.NativeFunctions.packInt8($"v").as("p"),
        VectorFunctions.quantizeInt8($"v").as("h"))
      .select($"p.scale", $"p.codes", $"h.scale".as("hscale"), $"h.codes".as("hcodes"))
      .as[(Double, Array[Byte], Double, Array[Int])].collect()
    both.foreach { case (ps, pc, hs, hc) =>
      assert(ps == hs)
      assert(pc.map(_.toInt).toSeq == hc.toSeq)
    }
    // cosine is scale-invariant, so scoring straight off the codes equals
    // cosine of the dequantized vector (zero vector: NaN on both, like the
    // float kernel)
    val scored = df.select(
        graft.expressions.NativeFunctions.int8CosineSim(
          graft.expressions.NativeFunctions.packInt8($"v").getField("codes"), $"v").as("qc"),
        VectorFunctions.cosine(
          VectorFunctions.dequantizeInt8(VectorFunctions.quantizeInt8($"v"))
            .cast("array<double>"), $"v").as("fc"))
      .as[(Double, Double)].collect()
    scored.foreach { case (qc, fc) =>
      if (fc.isNaN) assert(qc.isNaN) else assert(math.abs(qc - fc) < 1e-12)
    }
  }

  test("as-of join with an empty right side: inner drops all, outer keeps all") {
    val l = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1))
      .toDF("key", "lts", "lv")
    val r = Seq.empty[(Long, java.sql.Timestamp, Int)].toDF("key", "rts", "rv")
    assert(AsOfJoin.backwardExec(l, r, Seq("key"), "lts", "rts").count() == 0)
    assert(AsOfJoin.backwardExec(l, r, Seq("key"), "lts", "rts", inner = false).count() == 1)
    assert(AsOfJoin.backward(l, r, Seq("key"), "lts", "rts").count() == 0)
  }

  test("round-13 stat/behavior operators accept empty and degenerate inputs") {
    import graft.operators.{Behavior, Ranking, StatTests}
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val empty = spark.emptyDataFrame
      .withColumn("bucket", lit(1L)).withColumn("grp", lit("g"))
      .withColumn("y", lit(1L)).withColumn("x", lit(1L)).limit(0)
    assert(StatTests.ksTest(empty, col("bucket"), col("grp") === "a",
      col("grp") === "b", col("y")).count() == 0)
    assert(StatTests.spearmanCorr(empty, col("bucket"), col("x"),
      col("y")).count() == 0)
    assert(StatTests.linReg(empty, col("bucket"), col("x"),
      col("y")).count() == 0)
    assert(StatTests.anovaF(empty, col("bucket"), col("grp"),
      col("y")).count() == 0)
    assert(Ranking.timingQuantiles(empty, "grp", col("y"),
      Seq(50)).count() == 0)
    val ev = Seq.empty[(Long, String, Long)].toDF("u", "op", "tm")
      .select(col("u"), col("op"), timestamp_micros(col("tm")).as("ts"))
    assert(Behavior.windowFunnelStrictDedup(ev, "u", "op", "ts",
      Seq("a", "b"), 1000L).count() == 0)
    // single-event key: level reflects whether it matches step 0
    val one = Seq((1L, "a", 5L), (2L, "x", 5L)).toDF("u", "op", "tm")
      .select(col("u"), col("op"), timestamp_micros(col("tm")).as("ts"))
    assert(Behavior.windowFunnelStrictDedup(one, "u", "op", "ts",
      Seq("a", "b"), 1000L).as[(String, Long)].collect().toMap ==
      Map("1" -> 1L, "2" -> 0L))
  }

  test("round-15 operators accept empty and degenerate inputs") {
    import graft.operators.{Behavior, Graph, Insights, StatTests}
    val noEv = Seq.empty[(Long, String, Long, Long)].toDF("u", "op", "tm", "y")
      .select(col("u"), col("op"), timestamp_micros(col("tm")).as("ts"),
        col("y"))
    // empty log: no moments, no bars, no gaps, no graph — never an error
    assert(StatTests.momentStats(noEv, col("op"), col("y")).count() == 0)
    assert(StatTests.minSampleSize(noEv, col("op"), 0.01).count() == 0)
    assert(Insights.sparkbar(noEv, col("op"), hour(col("ts")), 24)
      .count() == 0)
    assert(Insights.interpurchaseGaps(noEv, "u", "ts", "y")
      .collect()(0).getLong(1) == 0L) // summary row exists, zero gaps
    assert(Graph.triangleStats(
      Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst").count() == 0)
    // one-hour log: Holt init state only; Theil-Sen has no pair → NULLs
    val oneHour = Seq((1L, "a", 5L, 1L), (2L, "a", 6L, 1L))
      .toDF("u", "op", "tm", "y")
      .select(col("u"), col("op"), timestamp_micros(col("tm")).as("ts"))
    val h = Behavior.hourlyHolt(oneHour, "ts").collect()(0)
    assert(h.getLong(0) == 1L && h.getDouble(1) == 2.0 && h.getDouble(2) == 0.0)
    val t = Behavior.dailyTheilSen(oneHour, "ts").collect()(0)
    assert(t.getLong(0) == 1L && t.getLong(1) == 0L && t.isNullAt(2))
  }

  test("session-3 operators accept empty and degenerate inputs") {
    import graft.operators.{Sampling, StatTests, Survival}
    val noEv = Seq.empty[(Long, Long, Long)].toDF("u", "us", "y")
    // empty log: no variants, no tests — never a crash
    assert(StatTests.cuped(noEv, col("u"), col("y"), col("us")).count() == 0)
    assert(StatTests.bhFdr(noEv.withColumn("g", lit("a")), col("g"),
      col("u") % 2 === 0, col("y")).count() == 0)
    // constant pre-period covariate → varX = 0 → theta pins to 0 and the
    // adjusted mean equals the raw mean (never a division blowup)
    val constX = Seq((1L, 0L, 5L), (1L, 100L, 7L),
      (2L, 0L, 5L), (2L, 100L, 9L)).toDF("u", "us", "y")
    val c = StatTests.cuped(constX, col("u"), col("y"), col("us"))
      .collect().map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(6)))
    assert(c.forall { case (raw, adj, theta) => raw == adj && theta == 0.0 })
    // single order per customer: only censored durations → no event rows
    val lone = Seq((1L, 0L), (2L, 86400000000L)).toDF("cust", "us")
      .select(col("cust"), timestamp_micros(col("us")).as("ots"))
    assert(Survival.kaplanMeier(lone, "cust", "ots").count() == 0)
    // k past the row count returns everything, still deterministic
    val tiny = Seq((1L, 10L), (2L, 20L)).toDF("id", "w")
    assert(Sampling.weightedSample(tiny, col("id"), col("w"), 99)
      .count() == 2)
  }

  test("session-3 late additions accept empty and degenerate inputs") {
    import graft.operators.{Analytics, Behavior, Contamination, Insights, StatTests}
    val noEv = Seq.empty[(Long, Long, Long)].toDF("u", "tm", "eid")
      .select(col("u"), timestamp_micros(col("tm")).as("ts"), col("eid"))
    // empty logs: every daily-series test and the fit return empty frames
    assert(Behavior.dailyMannKendall(noEv, "ts").count() == 0)
    assert(Behavior.dailyRunsTest(noEv, "ts").count() == 0)
    assert(StatTests.interarrivalExpFit(noEv, col("u"), col("ts"),
      col("eid")).count() == 0)
    // single observed day: no pairs, no runs — never a crash
    val oneDay = Seq((1L, 10L, 1L), (2L, 20L, 2L)).toDF("u", "tm", "eid")
      .select(col("u"), timestamp_micros(col("tm")).as("ts"), col("eid"))
    assert(Behavior.dailyMannKendall(oneDay, "ts").count() == 0)
    assert(Behavior.dailyRunsTest(oneDay, "ts").count() == 0)
    // lorenz over an empty key frame / all-zero weights: empty, loudly
    assert(Insights.lorenzCurve(
      Seq.empty[(Long, Long)].toDF("k", "x"), "k", "x").count() == 0)
    assert(Insights.lorenzCurve(
      Seq((1L, 0L), (2L, 0L)).toDF("k", "x"), "k", "x").count() == 0)
    // novelty over an all-short corpus (no shingles): empty
    assert(Contamination.noveltyCurve(
      Seq((1L, "a b"), (2L, "c")).toDF("doc_id", "text"),
      "doc_id", "text").count() == 0)
    // repeat-rate of an empty orders table: empty
    assert(Analytics.repeatRate(
      Seq.empty[(Long, Long)].toDF("o_custkey", "o_orderkey")).count() == 0)
  }

  test("session-4 additions accept empty and degenerate inputs") {
    import graft.operators.{Behavior, Sampling, StatTests}
    val noEv = Seq.empty[(Long, Long, Long, String)]
      .toDF("u", "tm", "y", "op")
      .select(col("u"), timestamp_micros(col("tm")).as("ts"), col("y"),
        col("op"))
    assert(StatTests.wilcoxonSignedRank(noEv, col("u"), col("y"),
      expr("unix_micros(ts)")).count() == 0)
    assert(StatTests.bartlett(noEv, col("op"), col("u"), col("y"))
      .count() == 0)
    assert(StatTests.theilsU(noEv, col("op"), col("u")).count() == 0)
    assert(StatTests.cramersV(noEv, col("op"), col("u")).count() == 0)
    assert(Behavior.seasonalDecompose(noEv, "ts").count() == 0)
    assert(Behavior.linearAttribution(noEv
        .withColumn("eid", col("u")), "u", "op", "ts", "eid",
      "purchase", 1000000L).count() == 0)
    // crosscorr with one type absent: the grid exists but y is all-zero
    // → zero variance → null corr rows, never a crash
    val oneType = Seq((1L, 10L, 5L, "view"), (2L, 3610L, 7L, "view"))
      .toDF("u", "tm", "y", "op")
      .select(col("u"), timestamp_micros(col("tm") * 1000000L).as("ts"),
        col("y"), col("op"))
    val cc = Behavior.hourlyCrossCorr(oneType, "ts", "op", "view",
      "purchase", Seq(0, 1)).collect()
    assert(cc.length == 2 && cc.forall(r => r.isNullAt(2) ||
      r.getDouble(2).isNaN))
    // a series shorter than the 24h MA window: every hour is an edge
    assert(Behavior.seasonalDecompose(oneType, "ts").count() == 0)
    // per-group weighted draw over an empty frame: empty
    assert(Sampling.weightedSamplePerGroup(
      Seq.empty[(Long, String, Long)].toDF("id", "g", "w"),
      col("g"), col("id"), col("w"), 5).count() == 0)
  }

  test("session-5 additions accept empty and degenerate inputs") {
    import graft.operators.{Behavior, ClusterEval, Graph, Insights,
      StatTests, Vocabulary}
    val noEv = Seq.empty[(Long, Long, Long, String)]
      .toDF("u", "tm", "y", "op")
      .select(col("u"), timestamp_micros(col("tm")).as("ts"), col("y"),
        col("op"))
    assert(StatTests.weightedQuantiles(noEv, col("op"), col("y"),
      col("u") + 1, Seq(500)).count() == 0)
    assert(StatTests.gTest(noEv, col("op"), col("u")).count() == 0)
    assert(StatTests.ljungBoxDaily(noEv, "ts", 3).count() == 0)
    assert(StatTests.multiLinReg(noEv, col("op"), col("u"), col("u") + 1,
      col("y")).count() == 0)
    assert(StatTests.poissonBootstrapCi(noEv, col("op"), col("u"),
      col("y"), b = 20).count() == 0)
    assert(StatTests.meanZTest(noEv, col("op"), col("u") % 2 === 0,
      col("u") % 2 === 1, col("y"), 1.0, 1.0).count() == 0)
    assert(Insights.unitValueIndex(noEv, col("ts"), col("u"), col("y"),
      col("y")).count() == 0)
    assert(Insights.crostonForecast(noEv, col("ts"), col("u"), col("y"))
      .count() == 0)
    assert(Insights.basketRules(noEv.select(col("u").as("bk"),
      col("op").as("it")), "bk", "it").count() == 0)
    assert(Insights.revenueHhi(noEv, "op", "u", col("y")).count() == 0)
    assert(Behavior.entropyRate(noEv, "u", "op", "ts", "y").count() == 0)
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.labelPropagation(noEdges, "src", "dst", 2).count() == 0)
    assert(Graph.bipartiteBestPartner(noEdges.toDF("c", "s"), "c", "s")
      .count() == 0)
    val noEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(ClusterEval.dbscanClassify(noEmb, "vec_id", "embedding",
      100L, 2).count() == 0)
    assert(Vocabulary.rakeKeywords(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text",
      Seq("a"), minCount = 1L).count() == 0)
    // single-doc stopword-only text: no candidates, no crash
    assert(Vocabulary.rakeKeywords(Seq((1L, "a a a")).toDF("doc_id", "text"),
      "doc_id", "text", Seq("a"), minCount = 1L).count() == 0)
  }
}
