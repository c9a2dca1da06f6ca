package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev-only measurement probe (guide §1: measure first): runs ONE query by
  * name and prints a per-JOB cost table — duration, task time, shuffle
  * bytes, job description — so a lifecycle query's wall time can be
  * attributed to its internal phases (index writes, guard collects,
  * iteration rounds) without the Spark UI. Not part of the bench contract;
  * the driver never invokes it.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.BenchProbe <query> [reps]
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ad-hoc A/B of runtime confs: SPARK_GRAFT_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })
    names.foreach { name =>
    val fn = SparkEntry.queries(name)
    // warm codegen/encoders on the tiny sf, like the bench does
    try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }

    final case class JobRow(id: Int, var desc: String = "", var t0: Long = 0,
                            var t1: Long = 0, var nTasks: Int = 0,
                            var taskMs: Long = 0, var shufR: Long = 0,
                            var shufW: Long = 0, var input: Long = 0)
    val rows = new scala.collection.mutable.LinkedHashMap[Int, JobRow]
    val stageJob = new scala.collection.mutable.HashMap[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = rows.synchronized {
        val r = JobRow(e.jobId)
        r.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))).getOrElse("")
        r.t0 = e.time
        e.stageIds.foreach(s => stageJob(s) = e.jobId)
        rows(e.jobId) = r
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = rows.synchronized {
        rows.get(e.jobId).foreach(_.t1 = e.time)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = rows.synchronized {
        for (j <- stageJob.get(e.stageId); r <- rows.get(j);
             m <- Option(e.taskMetrics)) {
          r.nTasks += 1
          r.taskMs += m.executorRunTime
          r.shufR += m.shuffleReadMetrics.totalBytesRead
          r.shufW += m.shuffleWriteMetrics.bytesWritten
          r.input += m.inputMetrics.bytesRead
        }
      }
    }
    for (rep <- 1 to reps) {
      rows.synchronized { rows.clear(); stageJob.clear() }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"==== $name rep $rep: wall $wall%.3f s, $n rows, ${rows.size} jobs ====")
      def mb(b: Long) = f"${b / 1048576.0}%8.1f"
      println(f"${"job"}%4s ${"wall_s"}%8s ${"task_s"}%8s ${"tasks"}%6s " +
        f"${"in_MB"}%8s ${"shR_MB"}%8s ${"shW_MB"}%8s  desc")
      rows.values.toSeq.sortBy(_.id).foreach { r =>
        println(f"${r.id}%4d ${(r.t1 - r.t0) / 1e3}%8.3f ${r.taskMs / 1e3}%8.3f " +
          f"${r.nTasks}%6d ${mb(r.input)} ${mb(r.shufR)} ${mb(r.shufW)}  " +
          r.desc.take(90))
      }
      val jobSum = rows.values.map(r => (r.t1 - r.t0) / 1e3).sum
      println(f"[probe] jobs total $jobSum%.3f s of $wall%.3f s wall " +
        f"(gap = driver/planning ${wall - jobSum}%.3f s)")
    }
    }
    spark.stop()
  }
}
