package graft

/** Same-JVM A/B of the graph iteration child session vs the caller's AQE
  * session, over the real sf0.1 driver queries — the controlled experiment
  * box noise denies back-to-back Bench runs. Run with:
  * `sbt "Test/runMain graft.GraphAbBench [sfDir]"`.
  */
object GraphAbBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    val qs = Seq("supplier_pagerank", "part_communities", "supplier_kcore",
      "supplier_bfs_hops")
    def time(q: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once
    qs.foreach(time)
    for (mode <- Seq("true", "false", "true", "false")) {
      spark.conf.set("graft.graph.iterSession", mode)
      val label = if (mode == "true") "child" else "caller"
      qs.foreach { q => println(f"[ab] $label%-6s $q%-24s ${time(q)}%.2f s") }
    }
    spark.stop()
  }
}
