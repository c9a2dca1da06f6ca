package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // GraftSession.builder carries the self-sizing exchange rule (floor =
    // cpus, ceiling = 16x, 64 MB advisory) — the bench must measure the
    // exact session a user of the engine gets
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // local-iteration filter: comma-separated query names (unset = all)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val picked = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // plan-audit mode: print each picked query's formatted physical plan
    // (no execution beyond planning) and exit — the ".explain and iterate"
    // loop without editing code
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      picked.foreach { case (name, fn) =>
        println(s"===== $name =====")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"(plan failed: $e)") }
      }
      spark.stop()
      return
    }
    // Warm the session AND each query's own codegen/encoder path on the
    // tiny sf0.001 tables, so measured timings reflect steady-state
    // execution cost: janino/encoder compilation is a per-JVM constant
    // (~0.5-2 s per distinct plan shape) that amortizes to zero on a real
    // cluster run, and leaving it in made round-over-round numbers drift
    // with query ordering rather than with the code under test.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    picked.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
    }
    // co-tenant-load watermark (r17 verdict task 3): |rep1−rep2| spread is
    // blind to SUSTAINED load hitting both reps back-to-back (the
    // part_communities 4.9→10.2 s episode) — /proc/loadavg before/after
    // makes a loaded window self-evident in the artifact itself
    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3).mkString(" ")
      catch { case _: Throwable => "" }
    val loadBefore = loadavg()
    // min-of-2 reps per query: the bench box is co-tenant noisy (single-shot
    // totals have swung 1.5-2x with no code change, triggering false
    // regression audits three rounds running); the min of two back-to-back
    // runs is a far better estimator of the code's actual cost. A failed
    // first rep is reported as-is (no retry — an error is not noise).
    // each result: (name, min time, |t1−t2| spread, error). The spread map
    // is the variance signal the round-over-round regression check needs:
    // a query whose spread rivals its min is box noise, not a regression —
    // no more manual box-shift adjudication.
    // r19 (r18 verdict task 2): the start-of-run loaded_window sample
    // missed both mid-run load bands in the r18 driver artifact. The
    // per-ROW signal is /proc/loadavg's 4th field — the INSTANTANEOUS
    // runnable-entity count — sampled at the idle instants just before
    // rep 1 and just after rep 2: at those instants the bench itself
    // contributes ~1-2 runnable threads (executors idle between count()
    // calls), so a high R is co-tenant load inside THIS query's window.
    // The 1-min average cannot make that separation mid-run: the bench's
    // own 32 threads dominate it within a minute of starting.
    def runnableNow(): Int =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ")(3).split("/")(0).toInt
      catch { case _: Throwable => -1 }
    // co-tenant threshold on the runnable sample: the bench's own idle
    // footprint measures 2 on a quiet box (driver thread + sampler); GC /
    // async-cleanup threads can add a couple. Past 5 someone else is
    // computing in the window (calibrated: 12 synthetic busy loops read
    // 6-8 at the sample instants — they momentarily sleep on timer ticks,
    // so R undercounts nproc of the co-tenant load; 5 still catches it).
    val loadedRunnable = 5
    // r20 (r19 verdict task 3): a single high sample can be the session's
    // OWN async cleanup threads on their way down — in SPARK_GRAFT_ONLY
    // runs there is no next query to absorb them, and 2 of 5 quiet
    // solo-run queries false-flagged at runnable 6. A co-tenant band is
    // still there 250 ms later; teardown threads are not. Confirm a high
    // sample after a short settle and take the min — quiet runs never
    // sleep, and the synthetic-busy calibration (sustained loops, R 6-8
    // at every instant) still fires.
    def runnableSettled(): Int = {
      val r1 = runnableNow()
      if (r1 <= loadedRunnable) r1
      else { Thread.sleep(250); math.min(r1, runnableNow()) }
    }
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(e.toString.takeWhile(_ != '\n').take(200)) }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    val firstPass = picked.map { case (name, fn) =>
      def once(): (Double, Option[String]) = timeOnce(fn)
      val rb = runnableSettled()
      val (t1, e1) = once()
      val res =
        if (e1.isDefined) (name, t1, 0.0, e1)
        else {
          // rep-1 success wins: a transient rep-2 failure (co-tenant spike)
          // must not report a working query as errored with a bogus fast time
          // — but a suppressed failure is still a flake signal, so log it
          // let the context cleaner collect rep-1's localCheckpoint
          // blocks before rep 2 times itself: they are unreachable but
          // stay resident until a GC notices (the SCALING rep-2
          // heap-aging note — a real cluster's per-job executors never
          // see a predecessor's cache). Outside the timed region; only
          // BETWEEN REPS — a measured A/B showed a between-QUERIES gc
          // drags totals ~8% (concurrent-phase tails bleed into the next
          // rep-1) and its worker threads false-flag the next row's load
          // sample.
          System.gc()
          val (t2, e2) = once()
          e2.foreach(e => System.err.println(s"[bench] $name rep-2 failed " +
            s"(rep-1 time kept): $e"))
          if (e2.isDefined) (name, t1, 0.0, None)
          else (name, math.min(t1, t2), math.abs(t1 - t2), None)
        }
      val ra = runnableSettled()
      (res._1, res._2, res._3, res._4, math.max(rb, ra))
    }
    // r20 (r19 verdict task 2): a load-flagged row is a co-tenant WINDOW,
    // not a measurement — the r19 driver artifact carried 41 flagged rows
    // and a 310 s total that solo re-runs showed was really ~250 s. Give
    // each flagged row ONE more rep at the end of the run: minutes later
    // the band has usually passed. The reported time is the min across
    // reps (same estimator as min-of-2); the reported load is the RETRY
    // window's own settled sample, so a still-loaded box stays flagged
    // rather than silently re-measured under the same band. Errors are
    // never retried (an error is not noise), and a transient retry
    // failure keeps the measured row.
    val fnByName = picked.toMap
    val retriedNames = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = firstPass.map { case r @ (name, t, s, err, l) =>
      if (err.isDefined || l <= loadedRunnable) r
      else {
        System.gc() // same between-rep hygiene as the main loop
        val rb3 = runnableSettled()
        val (t3, e3) = timeOnce(fnByName(name))
        val ra3 = runnableSettled()
        if (e3.isDefined) {
          System.err.println(s"[bench] $name retry failed (measured row kept): ${e3.get}")
          r
        } else {
          retriedNames += name
          (name, math.min(t, t3), s, err, math.max(rb3, ra3))
        }
      }
    }
    val qs = results.map { case (k, v, _, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def r4(v: Double): Double = math.rint(v * 1e4) / 1e4
    val spreads = results.map { case (k, _, s, _, _) => s"\"" + k + "\":" + r4(s) }
      .mkString("{", ",", "}")
    // per-query max instantaneous runnable count (before-rep1 / after-rep2)
    val loads = results.map { case (k, _, _, _, l) => s"\"" + k + "\":" + l }
      .mkString("{", ",", "}")
    val loadedQueries = results.collect {
      case (k, _, _, _, l) if l > loadedRunnable => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    // JSON string escape: backslash, quote, and all control chars < 0x20
    def esc(s: String): String = s.flatMap {
      case '\\' => "\\\\"
      case '"'  => "\\\""
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val errs = results.collect { case (k, _, _, Some(e), _) =>
      s"\"" + k + "\":\"" + esc(e) + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // a crashed query must be distinguishable from a fast one: its timing
    // still appears, but its name is listed in "errors"; "spread" carries
    // each query's |rep1−rep2| so noise is self-evident in the artifact
    val loadAfter = loadavg()
    // a 32-core box: 1-min load past ~8 BEFORE we start means the window
    // is co-tenant-shifted — flag it so a slow round self-annotates
    // instead of triggering a manual box-shift audit. (The AFTER value is
    // informational only: the bench itself saturates the box, so it is
    // always high on a healthy run.)
    // loaded_window keeps the r18 WHOLE-RUN semantic (start-sample box
    // shift); per-row co-tenant windows live in loaded_queries/load —
    // a 4-row band must not read as "whole artifact suspect"
    val loaded = loadBefore.split(" ").headOption
      .flatMap(_.toDoubleOption).exists(_ > 8.0)
    val retriedJson = retriedNames.map(n => s"\"" + n + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","reps":2,"queries":$qs,"spread":$spreads,"errors":$errs,"loadavg_before":"$loadBefore","loadavg_after":"$loadAfter","loaded_window":$loaded,"load":$loads,"loaded_queries":$loadedQueries,"retried":$retriedJson,"sf":"$sfDir"}"""
    println(line)
    // also land the line in a file: stdout tail-capture windows have
    // truncated the first ~17 queries of a round's artifact, making their
    // timings unjudgeable — the file always carries all of them
    // BENCH_full.json additionally lands IN THE REPO (committed per round):
    // the driver's BENCH_r*.json artifacts keep only a truncated tail, so
    // this file is what makes per-query regressions diffable across rounds
    // a filtered (SPARK_GRAFT_ONLY) dev run must not clobber the committed
    // full-suite artifact with a partial timing set
    val outFiles = Seq(
      Some(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json")),
      if (only.isEmpty) Some("BENCH_full.json") else None).flatten
    outFiles.foreach { outFile =>
      try {
        val p = java.nio.file.Paths.get(outFile)
        Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.writeString(p, line + "\n")
        System.err.println(s"[bench] wrote $outFile")
      } catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $outFile: $e")
      }
    }
    // LAST stdout line: a COMPACT summary guaranteed to fit whole inside
    // the driver's ~2 KB stdout-tail capture window. The full per-query
    // map cannot (251 names ≈ 8 KB; even gzip+base64 overflows the window,
    // which is exactly how the r14/r15 artifacts ended up front-truncated)
    // — so the artifact-of-record for per-query timings is the committed
    // BENCH_full.json, and this line carries everything judgeable at a
    // glance (total, counts, spread profile, slowest queries) plus the
    // full file's SHA-256 so the committed copy is verifiable.
    val sha = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.digest((line + "\n").getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    }
    val sortedSpreads = results.map(_._3).sorted
    val spreadP50 = if (sortedSpreads.isEmpty) 0.0
      else sortedSpreads(sortedSpreads.length / 2)
    val slowest = results.sortBy(-_._2).take(8)
      .map { case (k, v, _, _, _) => s"\"" + k + "\":" + r4(v) }
      .mkString("{", ",", "}")
    // flush the tail window: the driver's round artifact keeps the LAST
    // ~2 KB of stdout, and the 7 KB per-query line above otherwise bleeds
    // a headless map fragment into it (the r16 artifact's parsed: null).
    // These short diagnostic lines are each complete on their own, and
    // together they push every byte of the big line out of the window, so
    // the captured tail holds only whole lines + the final compact JSON.
    val diag = new StringBuilder
    diag.append("[bench] ---- round diagnostics (tail-window flush) ----\n")
    results.sortBy(-_._2).take(20).foreach { case (k, v, s, _, l) =>
      diag.append(f"[bench] slow  $k%-36s ${r4(v)}%8.4f s (spread ${r4(s)}%.4f, runnable $l)\n")
    }
    results.sortBy(-_._3).take(10).foreach { case (k, _, s, _, _) =>
      diag.append(f"[bench] noisy $k%-36s spread ${r4(s)}%8.4f s\n")
    }
    results.filter(_._5 > loadedRunnable).sortBy(-_._5).take(10)
      .foreach { case (k, _, _, _, l) =>
        diag.append(f"[bench] load  $k%-36s runnable $l (co-tenant window)\n")
      }
    retriedNames.foreach { k =>
      diag.append(f"[bench] retry $k%-36s (flagged row re-ran at end of suite)\n")
    }
    while (diag.length < 2200) diag.append("[bench] ----\n")
    print(diag)
    println(s"""{"metric":"total","value":${r4(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"n_errors":${results.count(_._4.isDefined)},"reps":2,"spread_p50":${r4(spreadP50)},"spread_max":${r4(sortedSpreads.lastOption.getOrElse(0.0))},"loadavg_before":"$loadBefore","loadavg_after":"$loadAfter","loaded_window":$loaded,"n_loaded_queries":${results.count(_._5 > loadedRunnable)},"n_retried":${retriedNames.size},"slowest":$slowest,"full":"BENCH_full.json","full_sha256":"$sha"}""")
    spark.stop()
    // a bench with ANY erroring query must not read as a healthy run: the
    // JSON line above still carries the full picture (timings + errors map),
    // but the process exit code tells the driver the round is incomplete
    val nErr = results.count(_._4.isDefined)
    if (nErr > 0) {
      System.err.println(s"[bench] $nErr quer${if (nErr == 1) "y" else "ies"} errored")
      sys.exit(1)
    }
  }
}
