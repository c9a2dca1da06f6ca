package graft

import graft.operators.Graph
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Driver-job budgets for the synchronous-Pregel graph operators — the
  * MaterializedJoinSpec pattern applied to the iterative family (the r16
  * verdict's task 3). Each operator now runs its fixed-point loop in an
  * AQE-off iteration child session; before that move, AQE materialized
  * every exchange of every round's plan as its own driver job. At real
  * cluster round-trip latencies (~200-500 ms/job) the job chain IS the
  * wall-clock of an iterative operator, so a job-count regression is the
  * noise-free signal wall-clock on a co-tenant box cannot give.
  */
class GraphJobBudgetSpec extends SparkSpec {

  import spark.implicits._

  // ~600-node, ~3000-edge deterministic graph: big enough that every
  // round's exchanges are real, small enough for spec time
  private lazy val edges = {
    val raw = (0 until 3000).map { i =>
      val a = (i * 2654435761L) % 600
      val b = (a + 1 + (i * 40503L) % 37) % 600
      (a, b)
    }
    (raw ++ raw.map(_.swap)).toDF("src", "dst").localCheckpoint(true)
  }

  private def countJobs(body: => Unit): Int = {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try { body; Thread.sleep(500) }
    finally spark.sparkContext.removeSparkListener(listener)
    counter.get()
  }

  test("pageRankFixedPoint(5): bounded driver-job chain") {
    // structural jobs: nodes.count (lane pick) + 1 checkpoint at round 5 +
    // the final collect, plus 2 count-gated broadcast builds per round
    // (each replaces an edge-sized shuffle — the right trade; past the
    // 4M-node cap they vanish and the SMJ lane costs no broadcast jobs).
    // Measured 15 in the iteration session.
    val jobs = countJobs {
      Graph.pageRankFixedPoint(edges, "src", "dst", 5).collect()
    }
    info(s"pagerank(5) jobs: $jobs")
    assert(jobs <= 19, s"pageRank(5) ran $jobs driver jobs — the " +
      "iteration-session budget (measured 15) has regressed")
  }

  test("labelPropagation(4): bounded driver-job chain") {
    // node count + 2 paced checkpoints (every 2nd round) + the final
    // collect + 2 count-gated broadcast builds per round. Measured 14 in
    // the iteration session.
    val jobs = countJobs {
      Graph.labelPropagation(edges, "src", "dst", 4).collect()
    }
    info(s"lpa(4) jobs: $jobs")
    assert(jobs <= 18, s"labelPropagation(4) ran $jobs driver jobs — the " +
      "iteration-session budget (measured 14) has regressed")
  }

  test("kCore(k=3): bounded driver-job chain") {
    // per peel round: 1 survivor count (the alive-set broadcast builds
    // fold into it); plus the edge checkpoint, the initial alive count,
    // the final checkpoint + collect. Measured 7 in the iteration
    // session.
    val jobs = countJobs {
      Graph.kCore(edges, "src", "dst", 3).collect()
    }
    info(s"kcore jobs: $jobs")
    assert(jobs <= 13, s"kCore ran $jobs driver jobs — the " +
      "iteration-session budget (measured 8) has regressed")
  }

  test("bfsHops(6): bounded driver-job chain") {
    // 1 edge checkpoint + 1 seed agg + 1 count per hop level + ~2
    // broadcast-relation builds per hop (frontier and visited both stay
    // broadcast-small — those builds run as their own cache-local jobs
    // and are bounded by maxHops, not data). Measured 23 in the
    // iteration session.
    val jobs = countJobs {
      Graph.bfsHops(edges, "src", "dst", 6).collect()
    }
    info(s"bfs jobs: $jobs")
    assert(jobs <= 28, s"bfsHops(6) ran $jobs driver jobs — the " +
      "iteration-session budget (measured 23) has regressed")
  }

  test("iteration child session leaves the caller's session untouched") {
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    Graph.pageRankFixedPoint(edges, "src", "dst", 2).collect()
    assert(spark.conf.get("spark.sql.adaptive.enabled") === before)
    // and results are the caller's rows regardless of which session ran
    val pr = Graph.pageRankFixedPoint(edges, "src", "dst", 3)
    assert(pr.count() === 600L)
    assert(pr.agg(org.apache.spark.sql.functions.min("rank_nano"))
      .collect()(0).getLong(0) >= 150000000L)
  }
}
