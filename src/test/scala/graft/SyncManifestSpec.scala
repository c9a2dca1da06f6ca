package graft

import graft.operators.CdcOps
import graft.sources.{Incremental, Mirror, SyncManifest, TableConfig}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Reader-visible atomicity of the multi-bucket mirror merge: a FINAL read
  * racing a poll or a reconcile sweep must observe exactly the old or the
  * new sync, never a mix — the ClickHouse-part-set-snapshot guarantee the
  * reference target gives its readers.
  */
class SyncManifestSpec extends SparkSpec {
  import spark.implicits._

  private def state(n: Int, extra: Seq[(Long, Long, String)] = Nil): DataFrame =
    ((1L to n.toLong).map(i => (i, i, s"p$i")) ++ extra)
      .toDF("key", "seq", "payload")

  private def finalRows(dir: String): Set[(Long, Long, String)] =
    Mirror.readFinal(spark, dir, "key")
      .select("key", "seq", "payload").as[(Long, Long, String)].collect().toSet

  private def srcRows(df: DataFrame): Set[(Long, Long, String)] =
    df.as[(Long, Long, String)].collect().toSet

  test("an uncommitted append is invisible; the manifest commit is the atomic flip") {
    val dir = Files.createTempDirectory("graft_manifest_torn").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 4)
    val v0 = state(10)
    Incremental.snapshot(v0, cfg, dir)
    val fin0 = finalRows(dir)

    // the torn window of a multi-bucket merge: new part files appended (all
    // four buckets), manifest commit not yet run — exactly what a reader
    // sees mid-upsert, or forever after a writer crash between the two
    val torn = CdcOps.withMirrorMeta(
      state(10).withColumn("payload", concat(lit("torn-"), col("payload")))
        .withColumn("seq", col("seq") + 100L),
      Seq("key"), "seq", lit(false), lit(99L))
      .withColumn("bucket", pmod(hash(col("key")), lit(cfg.nBuckets)))
    torn.write.mode("append").partitionBy("bucket").parquet(dir)
    val tornFiles = SyncManifest.listVisible(spark, dir).toSet --
      SyncManifest.read(spark, dir).get.files.toSet
    assert(tornFiles.nonEmpty)

    // a plain directory read WOULD see the half-written sync ...
    assert(spark.read.parquet(dir).count() > v0.count())
    // ... the pinned read sees exactly the committed one
    assert(finalRows(dir) == fin0, "reader observed an uncommitted append")

    // a real poll then lands key 1 (same bucket as some torn debris): its
    // commit point flips readers to the new sync, the debris rows never
    // surface, and the debris files in the touched buckets are vacuumed
    val v1 = v0.where($"key" =!= 1L)
      .unionByName(Seq((1L, 200L, "u1")).toDF("key", "seq", "payload"))
    Incremental.poll(v1, cfg, dir)
    val fin1 = finalRows(dir)
    assert(fin1 == srcRows(v1))
    assert(!fin1.exists(_._3.startsWith("torn-")))
    val stillThere = SyncManifest.listVisible(spark, dir).toSet intersect tornFiles
    val touchedBucket = "bucket=" + // the poll touched only key 1's bucket
      torn.where($"key" === 1L).select("bucket").as[Int].head()
    assert(stillThere.forall(f => !f.startsWith(touchedBucket)),
      s"debris not vacuumed from the touched bucket: $stillThere")
  }

  test("a reader pinned before a sync keeps evaluating across exactly one more sync") {
    val dir = Files.createTempDirectory("graft_manifest_grace").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 2)
    val v0 = state(6)
    Incremental.snapshot(v0, cfg, dir)
    val gen0 = SyncManifest.read(spark, dir).get.files.toSet

    // reader pins the snapshot generation BEFORE the next sync lands
    val pinned = Mirror.readFinal(spark, dir, "key")
      .select("key", "seq", "payload")

    val v1 = v0.where($"key" =!= 2L)
      .unionByName(Seq((2L, 100L, "u2")).toDF("key", "seq", "payload"))
    Incremental.poll(v1, cfg, dir)

    // grace generation: the pinned frame still evaluates to the OLD sync
    // (its files are retired, not deleted), while a fresh read sees the new
    assert(pinned.as[(Long, Long, String)].collect().toSet == srcRows(v0))
    assert(finalRows(dir) == srcRows(v1))
    val retired1 = SyncManifest.read(spark, dir).get.retired.toSet
    assert(retired1.nonEmpty && retired1.subsetOf(gen0))
    assert(retired1.subsetOf(SyncManifest.listVisible(spark, dir).toSet))

    // the SECOND sync touching the same bucket ends the grace: the retired
    // generation is vacuumed from disk
    val v2 = v1.where($"key" =!= 2L)
      .unionByName(Seq((2L, 101L, "u2b")).toDF("key", "seq", "payload"))
    Incremental.poll(v2, cfg, dir)
    assert((SyncManifest.listVisible(spark, dir).toSet intersect retired1).isEmpty,
      "grace generation not vacuumed after the second sync")
    assert(finalRows(dir) == srcRows(v2))
  }

  test("a reader that outlives the grace gets the contract error, not a raw file failure") {
    val dir = Files.createTempDirectory("graft_manifest_overrun").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 2)
    val v0 = state(6)
    Incremental.snapshot(v0, cfg, dir)
    val pinned = Mirror.readFinal(spark, dir, "key").select("key", "seq", "payload")
    assert(pinned.count() == 6) // healthy while pinned to the committed sync

    // two subsequent syncs rewriting EVERY bucket: the pinned generation is
    // retired by the first and vacuumed by the second — the reader outlived
    // its one-sync grace
    def bump(df: DataFrame, by: Long) = df
      .withColumn("seq", $"seq" + by)
      .withColumn("payload", concat(lit(s"u$by-"), $"payload"))
    Incremental.poll(bump(v0, 100L), cfg, dir)
    Incremental.poll(bump(v0, 200L), cfg, dir)

    // graced evaluation surfaces the CONTRACT, with the task failure kept
    // as the cause
    val err = intercept[IllegalStateException](
      SyncManifest.graced(dir)(pinned.collect()))
    assert(err.getMessage.contains("outlived the manifest grace")
      && err.getMessage.contains("re-pin"), err.getMessage)
    assert(err.getCause != null)
    // an unrelated failure passes through untranslated
    val other = intercept[IllegalArgumentException](
      SyncManifest.graced(dir)(throw new IllegalArgumentException("boom")))
    assert(other.getMessage == "boom")
    // ... and so does a vanished file that is NOT under this mirror (a
    // UDF's local resource, a different dataset): "re-pin and retry" could
    // never fix those, so translating them would be a misdiagnosis
    val foreign = intercept[java.io.FileNotFoundException](
      SyncManifest.graced(dir)(
        throw new java.io.FileNotFoundException("/somewhere/else/data.bin")))
    assert(foreign.getMessage.contains("/somewhere/else"))
    // re-pinning is the remedy: a fresh read serves the newest sync
    assert(finalRows(dir) == srcRows(bump(v0, 200L)))
  }

  test("withPinnedRetry transparently re-pins a grace-overrun reader") {
    val dir = Files.createTempDirectory("graft_manifest_repin").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 2)
    val v0 = state(6)
    Incremental.snapshot(v0, cfg, dir)
    // a long-held pin that the two polls below will retire then vacuum
    val stale = SyncManifest.readCommitted(spark, dir)
    def bump(df: DataFrame, by: Long) = df
      .withColumn("seq", $"seq" + by)
      .withColumn("payload", concat(lit(s"u$by-"), $"payload"))
    Incremental.poll(bump(v0, 100L), cfg, dir)
    Incremental.poll(bump(v0, 200L), cfg, dir)

    // attempt 1 evaluates the vacuumed pin mid-read (the overrun); the
    // helper re-pins and re-runs, and attempt 2's fresh frame succeeds —
    // the reader never hand-writes the catch/re-pin loop
    var calls = 0
    val rows = SyncManifest.withPinnedRetry(spark, dir) { fresh =>
      calls += 1
      if (calls == 1) stale.collect() // simulated overrun inside the read
      fresh.select($"key", $"seq", $"payload")
        .as[(Long, Long, String)].collect().toSet
    }
    assert(calls == 2, s"expected one re-pin, saw $calls call(s)")
    // the retried read equals the fresh manifest's content
    assert(rows == bump(v0, 200L).as[(Long, Long, String)].collect().toSet)

    // a PERSISTENT overrun (every attempt trips the grace) surfaces the
    // contract error after `attempts` tries, not an infinite loop
    var tries = 0
    val err = intercept[SyncManifest.GraceOverrunException](
      SyncManifest.withPinnedRetry(spark, dir, attempts = 2) { _ =>
        tries += 1
        stale.collect()
      })
    assert(tries == 2)
    assert(err.getMessage.contains("outlived the manifest grace"))
  }

  test("a reader pinned before a reconcile sweep sees the whole pre-sweep state") {
    val dir = Files.createTempDirectory("graft_manifest_sweep").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 4)
    val v0 = state(10)
    Incremental.snapshot(v0, cfg, dir)
    val pinned = Mirror.readFinal(spark, dir, "key")
      .select("key", "seq", "payload")

    // hard-delete keys 3 and 7 at the source (two buckets rewritten in
    // place by the sweep — the doubled race surface)
    Incremental.reconcileDeletes(v0.where($"key" =!= 3L && $"key" =!= 7L), cfg, dir)
    assert(finalRows(dir).map(_._1) == (1L to 10L).toSet - 3L - 7L)
    // the pre-sweep reader still sees every key — never a half-swept mix
    assert(pinned.as[(Long, Long, String)].collect().toSet == srcRows(v0))
  }

  test("a re-snapshot over a live mirror is reader-atomic and resets the tail") {
    val dir = Files.createTempDirectory("graft_manifest_resnap").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 4)
    val v0 = state(8)
    Incremental.snapshot(v0, cfg, dir)
    val pinned = Mirror.readFinal(spark, dir, "key")
      .select("key", "seq", "payload")

    // the re-sync path: a fresh snapshot of a now-smaller source lands over
    // the LIVE mirror — keys 4..8 vanish outright (snapshot semantics, not
    // tombstones), the watermark resets below the old one
    val v1 = state(3)
    val st = Incremental.snapshot(v1, cfg, dir)
    assert(st.watermark == 3L)
    assert(finalRows(dir) == srcRows(v1))
    // a reader pinned before the re-snapshot still sees the old generation
    assert(pinned.as[(Long, Long, String)].collect().toSet == srcRows(v0))

    // and the tail resumes from the new watermark
    val r = Incremental.poll(state(3, Seq((9L, 9L, "p9"))), cfg, dir)
    assert(r.rowsSynced == 1L)
    assert(finalRows(dir) == srcRows(state(3, Seq((9L, 9L, "p9")))))
  }

  test("concurrent FINAL reads during a stream of syncs never observe a mix") {
    val dir = Files.createTempDirectory("graft_manifest_race").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 4)
    var current = state(10)
    Incremental.snapshot(current, cfg, dir)

    // every state the mirror may legitimately serve; the NEXT state is
    // announced BEFORE its poll starts, so during a transition both old and
    // new are valid — a mixed-bucket read matches neither and counts as a
    // tear. Reads racing two full sync commits can hit a vacuumed grace
    // file (bounded retention, by design); those fail loudly and are
    // counted separately, never returning a mix.
    val valid = scala.collection.mutable.Set(srcRows(current))
    val observed = new java.util.concurrent.ConcurrentLinkedQueue[
      Set[(Long, Long, String)]]()
    val readFailures = new java.util.concurrent.atomic.AtomicInteger()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try observed.add(finalRows(dir))
        catch { case _: Throwable => readFailures.incrementAndGet() }
      }
    })
    reader.start()
    try {
      // each round rewrites keys 1 and 2 (distinct buckets at nBuckets=4),
      // so a torn multi-bucket read would pair an old key-1 with a new
      // key-2 — observable as a set matching no announced state
      for (i <- 1 to 6) {
        val next = current.where($"key" > 2L).unionByName(
          Seq((1L, 100L + i * 2L, s"u1-$i"), (2L, 101L + i * 2L, s"u2-$i"))
            .toDF("key", "seq", "payload"))
        valid.synchronized { valid += srcRows(next) }
        Incremental.poll(next, cfg, dir)
        current = next
      }
    } finally { stop.set(true); reader.join(30000) }

    val states = valid.synchronized(valid.toSet)
    val seen = observed.toArray(Array.empty[Set[(Long, Long, String)]])
    assert(seen.nonEmpty, "reader thread never completed a single read")
    val mixes = seen.filterNot(states.contains)
    assert(mixes.isEmpty,
      s"observed ${mixes.length} torn reads, e.g. ${mixes.headOption}")
    assert(finalRows(dir) == srcRows(current))
  }

  test("rebucket changes the mirror layout reader-atomically and keeps the tail") {
    val dir = Files.createTempDirectory("graft_manifest_rebucket").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 4)
    val v0 = state(20)
    Incremental.snapshot(v0, cfg, dir)
    val pinned = Mirror.readFinal(spark, dir, "key")
      .select("key", "seq", "payload")

    // grow the bucket space 4 -> 8 (the 100x-data move)
    val cfg8 = Incremental.rebucket(spark, cfg, dir, 8)
    assert(cfg8.nBuckets == 8)
    assert(finalRows(dir) == srcRows(v0), "rebucket changed the data")
    assert(pinned.as[(Long, Long, String)].collect().toSet == srcRows(v0),
      "pre-rebucket reader torn")
    val buckets = Mirror.readCommitted(spark, dir)
      .select("bucket").distinct().as[Int].collect().toSet
    assert(buckets.forall(b => b >= 0 && b < 8) && buckets.exists(_ >= 4),
      s"bucket ids not re-assigned: $buckets")

    // polling continues under the new config from the same watermark
    val v1 = state(20, Seq((21L, 21L, "p21")))
    val r = Incremental.poll(v1, cfg8, dir)
    assert(r.rowsSynced == 1L)
    assert(finalRows(dir) == srcRows(v1))

    // shrink works too, and the old wide layout's files retire cleanly:
    // after the shrink commit plus one more sync, nothing visible lives
    // outside the new bucket range
    val cfg2 = Incremental.rebucket(spark, cfg8, dir, 2)
    Incremental.poll(state(20, Seq((21L, 21L, "p21"), (22L, 22L, "p22"))), cfg2, dir)
    assert(finalRows(dir) ==
      srcRows(state(20, Seq((21L, 21L, "p21"), (22L, 22L, "p22")))))
    val live = graft.sources.SyncManifest.read(spark, dir).get.files
    assert(live.forall(f => f.startsWith("bucket=0/") || f.startsWith("bucket=1/")),
      s"manifest still lists wide-layout files: $live")
  }

  test("a re-snapshot from an EMPTY source empties the mirror without resurrecting files") {
    val dir = Files.createTempDirectory("graft_manifest_empty_resnap").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 4)
    val v0 = state(6)
    Incremental.snapshot(v0, cfg, dir)
    val pinned = Mirror.readFinal(spark, dir, "key").select("key", "seq", "payload")

    // the source was truncated; the fresh snapshot is legitimately empty.
    // The manifest commits files=[] with the old generation retired (still
    // on disk for the pinned reader) — the committed read must be EMPTY,
    // never fall back to the directory listing and serve the retired rows.
    Incremental.snapshot(state(0), cfg, dir)
    assert(Mirror.readCommitted(spark, dir).count() == 0L,
      "empty-manifest read resurrected retired files")
    assert(Mirror.readFinal(spark, dir, "key").count() == 0L)
    // schema survives for downstream plans
    assert(Mirror.readCommitted(spark, dir).columns.contains("_peerdb_version"))
    // the pinned pre-snapshot reader keeps its grace generation
    assert(pinned.as[(Long, Long, String)].collect().toSet == srcRows(v0))
    // a SECOND empty re-snapshot must not vacuum the last schema carrier:
    // the retired horizon carries forward until a data-bearing commit
    Incremental.snapshot(state(0), cfg, dir)
    assert(Mirror.readCommitted(spark, dir).count() == 0L)
    assert(Mirror.readCommitted(spark, dir).columns.contains("_peerdb_version"),
      "second empty commit lost the schema carrier")

    // and the mirror keeps working: a poll re-lands fresh data
    val r = Incremental.poll(state(0, Seq((50L, 50L, "p50"))), cfg, dir)
    assert(r.rowsSynced == 1L)
    assert(finalRows(dir) == Set((50L, 50L, "p50")))
  }

  test("an empty upsert commits nothing and keeps the reader grace intact") {
    val dir = Files.createTempDirectory("graft_manifest_noop").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 4)
    Incremental.snapshot(state(6), cfg, dir)
    Incremental.poll(state(6, Seq((7L, 7L, "p7"))), cfg, dir)
    val before = SyncManifest.read(spark, dir).get
    assert(before.retired.nonEmpty)
    // a zero-row batch through the public upsert: not a sync — the manifest
    // (and with it the previous generation's grace files) must not move
    graft.streaming.CdcStream.upsertBatch(spark,
      state(0), Seq("key"), "seq", dir, cfg.nBuckets)
    assert(SyncManifest.read(spark, dir).get == before)
    assert(before.retired.toSet.subsetOf(
      SyncManifest.listVisible(spark, dir).toSet),
      "empty upsert vacuumed the grace generation")
  }

  test("a manifest from an incompatible future format is refused, not misread") {
    val dir = Files.createTempDirectory("graft_manifest_fmt").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 2)
    Incremental.snapshot(state(3), cfg, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, "_graft_manifest.json"), true)
    try out.write(
      """{"fmt":99,"files":["bucket=0/zzz.parquet"],"retired":[]}""".getBytes("UTF-8"))
    finally out.close()
    val boom = intercept[IllegalStateException](Mirror.readCommitted(spark, dir))
    assert(boom.getMessage.contains("fmt 99"), boom.getMessage)
  }

  test("readCommitted survives the manifest writer's crash window via the tmp") {
    val dir = Files.createTempDirectory("graft_manifest_crash").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 2)
    Incremental.snapshot(state(5), cfg, dir)
    Incremental.poll(state(5, Seq((6L, 6L, "p6"))), cfg, dir)
    val want = finalRows(dir)

    // crash window: main manifest deleted, complete tmp left behind
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val main = new org.apache.hadoop.fs.Path(dir, "_graft_manifest.json")
    val tmp = new org.apache.hadoop.fs.Path(dir, "_graft_manifest.json.tmp")
    assert(fs.rename(main, tmp))
    assert(finalRows(dir) == want)

    // and the manifest is invisible to hasVisibleParquet / plain listings
    fs.delete(tmp, false)
    assert(SyncManifest.read(spark, dir).isEmpty)
  }
}
