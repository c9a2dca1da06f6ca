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

  test("as-of join with an empty right side: inner drops all, outer keeps all") {
    val l = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1))
      .toDF("key", "lts", "lv")
    val r = Seq.empty[(Long, java.sql.Timestamp, Int)].toDF("key", "rts", "rv")
    assert(AsOfJoin.backwardExec(l, r, Seq("key"), "lts", "rts").count() == 0)
    assert(AsOfJoin.backwardExec(l, r, Seq("key"), "lts", "rts", inner = false).count() == 1)
    assert(AsOfJoin.backward(l, r, Seq("key"), "lts", "rts").count() == 0)
  }
}
