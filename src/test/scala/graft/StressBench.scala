package graft

import graft.streaming.{ChurnConfig, MirrorRunner, StressHarness}
import java.nio.file.Files

/** One-off tuned stress measurement for SURVEY §6 — the insert.ps1 run
  * shape (5000+ records, 500-row batches) against embedded Derby under a
  * MirrorRunner with reconcile + warehouse sink. Run with:
  * `sbt "Test/runMain graft.StressBench"`.
  */
object StressBench {
  def main(args: Array[String]): Unit = {
    // optional arg: total ops (default 20000) — the r19 decade-up rows
    // (200k ops) measure whether per-round capture cost stays
    // delta-proportional as the resident mirror state grows 10x
    val totalOps = args.headOption.map(_.toInt).getOrElse(20000)
    val home = Files.createTempDirectory("graft_sbench").toString
    System.setProperty("derby.system.home", home)
    val url = "jdbc:derby:sbench;create=true"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .appName("graft-stress-bench")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    def exec(sqls: String*): Unit = {
      val conn = java.sql.DriverManager.getConnection(url)
      try { val st = conn.createStatement()
        try sqls.foreach(st.executeUpdate) finally st.close()
      } finally conn.close()
    }
    exec("CREATE TABLE churn_bench (id BIGINT PRIMARY KEY, seq BIGINT NOT NULL, " +
      "qty INT, payload VARCHAR(64))",
      "CREATE TABLE wh_bench (id BIGINT PRIMARY KEY, seq BIGINT, qty INT, " +
        "payload VARCHAR(64), \"_peerdb_version\" BIGINT)")
    val root = Files.createTempDirectory("sbenchroot").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/mirror.yaml"),
      s"""mirror: stress_bench
         |source_url: "$url"
         |target_dir: $root/mirror
         |reconcile_deletes: true
         |sink_url: "$url"
         |sink_dual: derby
         |tables:
         |  - name: churn_bench
         |    keys: [ID]
         |    version_col: SEQ
         |    buckets: 8
         |    target: wh_bench
         |""".stripMargin)
    val runner = MirrorRunner.load(spark, s"$root/mirror.yaml", props)
    // the insert.ps1 defaults: 5000 records in 500-row batches, zero delay;
    // 90/6/4 mix (the reference's own run is insert-only; ours keeps the
    // mixed-op path under measurement too)
    val churn = ChurnConfig("churn_bench", recordCount = totalOps, batchSize = 500,
      insertWeight = 90, updateWeight = 6, deleteWeight = 4, seed = 42L)
    val res = StressHarness.run(spark, url, churn, runner,
      syncEveryBatches = 10, props = props)
    println(res.report)
    require(res.analysis.converged, s"did not converge: ${res.analysis}")
    spark.stop()
  }
}
