package graft

import graft.streaming.{ChurnConfig, MirrorRunner, StressHarness}
import java.nio.file.Files

/** The frame-path twin of [[StressBench]] for SURVEY §6 — the same 20k-op
  * insert.ps1 run shape, but transported as pgoutput replication frames
  * (the reference's PRODUCTION transport, docker-compose.yml:21-28)
  * through `FrameChurnGenerator` → parquet frame lake →
  * `MirrorRunner.runFrames`. Run with:
  * `sbt "Test/runMain graft.FrameStressBench"`.
  */
object FrameStressBench {
  def main(args: Array[String]): Unit = {
    // optional arg: total ops (default 20000) — the r19 decade-up rows
    // (200k ops) measure whether per-round capture cost stays
    // delta-proportional as the resident mirror state grows 10x
    val totalOps = args.headOption.map(_.toInt).getOrElse(20000)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .appName("graft-frame-stress-bench")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("fsbenchroot").toString
    // source_url is unused by the frame path but required by the config
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/mirror.yaml"),
      s"""mirror: frame_stress_bench
         |source_url: "jdbc:derby:unused"
         |target_dir: $root/mirror
         |tables:
         |  - name: churn_frames
         |    keys: [id]
         |    version_col: seq
         |    buckets: 8
         |""".stripMargin)
    val runner = MirrorRunner.load(spark, s"$root/mirror.yaml",
      new java.util.Properties())
    val churn = ChurnConfig("churn_frames", recordCount = totalOps,
      batchSize = 500, insertWeight = 90, updateWeight = 6, deleteWeight = 4,
      seed = 42L)
    val res = StressHarness.runFrames(spark, churn, runner,
      syncEveryBatches = 10)
    println(res.report)
    require(res.analysis.converged, s"did not converge: ${res.analysis}")
    // row-level convergence, the guarantee the reference's count-compare
    // monitor cannot make
    val fin = runner.readFramesFinal("churn_frames")
      .selectExpr("cast(id as long)", "cast(seq as long)",
        "cast(qty as int)", "payload")
      .collect().map(_.toSeq).toSet
    val ref = res.gen.expectedFinal(spark).collect().map(_.toSeq).toSet
    require(fin == ref, "frame-path FINAL != reference state")
    println(s"row-level convergence: ${fin.size} rows equal")
    spark.stop()
  }
}
