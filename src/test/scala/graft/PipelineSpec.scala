package graft

import graft.operators.CdcOps
import graft.streaming.{CdcStream, Monitor}
import graft.streaming.CdcStream.Change
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The whole reference pipeline, end to end: initial snapshot load (batch
  * 0), streamed incremental batches, ReplacingMergeTree-FINAL reads with
  * soft deletes, and monitoring — equivalent to PeerDB initial-load +
  * CDC mirror + monitor against the events change log.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot + streamed increments converge to the batch soft-delete snapshot") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_pipeline")
    val target = base.resolve("mirror").toString
    val ckpt = base.resolve("ckpt").toString

    val changes = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id").as("key"), col("event_id").as("version"),
        col("event_type").as("op"), col("ts"), col("props").as("payload"))
      .as[Change]

    // phase 1: initial snapshot = latest state of the first 60% of the log,
    // applied as batch 0 (how PeerDB seeds the target before tailing WAL)
    val snapshot = CdcOps.latestSnapshot(
      changes.where(col("version") < 600).toDF(), Seq("key"), "version").as[Change]
    CdcStream.mergeBatch(spark, snapshot, target, nBuckets = 8,
      deleteOp = "error", batchId = 0L)

    // phase 2: tail the rest as two streamed microbatches, monitored
    val monitor = Monitor.attach(spark)
    val input = MemoryStream[Change]
    val tail = changes.where(col("version") >= 600).collect().sortBy(_.version)
    input.addData(tail.take(tail.length / 2).toIndexedSeq)
    CdcStream.mirrorToParquet(input.toDS(), target, ckpt, nBuckets = 8,
      deleteOp = "error").awaitTermination()
    input.addData(tail.drop(tail.length / 2).toIndexedSeq)
    CdcStream.mirrorToParquet(input.toDS(), target, ckpt, nBuckets = 8,
      deleteOp = "error").awaitTermination()
    spark.streams.removeListener(monitor)

    // FINAL read with soft deletes == batch soft-delete snapshot of the log
    val mirrorFinal = graft.sources.Mirror.readCommitted(spark, target)
      .where(!col("is_deleted"))
      .select(col("key"), col("version")).as[(Long, Long)].collect().toMap
    val expected = CdcOps.softDeleteSnapshot(
        Tables.load(spark, "/root/testdata/sf0.001", "events"),
        Seq("user_id"), "event_id", col("event_type") === "error")
      .select(col("user_id"), col("event_id")).as[(Long, Long)].collect().toMap
    assert(mirrorFinal == expected)

    // the monitor saw every streamed row; >= because restarting the stream
    // replays the last uncommitted batch (at-least-once, idempotent merge)
    val deadline = System.currentTimeMillis() + 10000
    while (monitor.totalRowsSynced < tail.length && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(monitor.totalRowsSynced >= tail.length)
    assert(monitor.batches.count(_.numInputRows > 0) >= 2)
  }

  test("continuous training-data pipeline: capture -> indexed incremental dedup -> canonical keep") {
    import graft.operators.{Dedup, JaccardIndex}
    import graft.sources.{Incremental, TableConfig}
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val base = java.nio.file.Files.createTempDirectory("graft_e2e").toString
    val dir = s"$base/docs"
    // the capture sequence is arrival order, not the document id: the
    // fresh batches land later, so they carry higher sequence numbers
    val cfg = TableConfig("docs", Seq("doc_id"), "seq", nBuckets = 4)

    // 1. initial snapshot mirrors most of the corpus; the SAME corpus seeds
    //    the persisted dedup index that will ride along with the mirror
    val corpus = docs.where(pmod(col("doc_id"), lit(5)) =!= 0)
    val corpusSeq = corpus.withColumn("seq", col("doc_id"))
    val fresh1 = docs.where(pmod(col("doc_id"), lit(10)) === 0)
    val fresh2 = docs.where(pmod(col("doc_id"), lit(10)) === 5)
    Incremental.snapshot(corpusSeq, cfg, dir)
    JaccardIndex.create(corpus, "doc_id", "text", 0.8, s"$base/idx")

    // 2. two successive sync batches: each poll lands a delta in the mirror
    //    and the CARRIED index dedups it (probe + absorb, O(batch) compute —
    //    never a corpus rescan); the index is reloaded between syncs, as a
    //    restarted pipeline would
    val src1 = corpusSeq.unionByName(fresh1.withColumn("seq", col("doc_id") + lit(1000000L)))
    assert(Incremental.poll(src1, cfg, dir).rowsSynced == fresh1.count())
    val pairs1 = JaccardIndex.load(spark, s"$base/idx").probeAndAdd(fresh1, "doc_id", "text")

    val src2 = src1.unionByName(fresh2.withColumn("seq", col("doc_id") + lit(2000000L)))
    assert(Incremental.poll(src2, cfg, dir).rowsSynced == fresh2.count())
    val pairs2 = JaccardIndex.load(spark, s"$base/idx").probeAndAdd(fresh2, "doc_id", "text")

    val mirrored = graft.sources.Mirror.readFinal(spark, dir, "doc_id")
    assert(mirrored.count() == docs.count())

    // the carried index saw exactly what per-sync one-shot recomputes see
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id_a").cast("long"), col("id_b").cast("long"))
        .as[(Long, Long)].collect().toSet
    val pairs = pairs1.unionByName(pairs2)
    assert(key(pairs) ==
      (key(Dedup.jaccardPairsIncremental(fresh1, corpus, "doc_id", "text", 0.8)) ++
        key(Dedup.jaccardPairsIncremental(fresh2, corpus.unionByName(fresh1),
          "doc_id", "text", 0.8))))

    // 3. keep-best collapses each near-dup cluster to one canonical doc
    val decisions = Dedup.keepCanonical(docs, pairs, "doc_id",
      graft.functions.TextFunctions.qualityScore(col("text")))
    assert(decisions.count() == docs.count())
    // exactly one keeper per component, and flagged drops exist
    val perComp = decisions.groupBy("component")
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("keepers"))
    assert(perComp.where(col("keepers") =!= 1L).count() == 0)
    assert(decisions.where(!col("keep")).count() > 0)
  }

  test("a maintained aggregate tracks the polled mirror sync by sync") {
    import graft.operators.MaterializedAgg
    import graft.sources.{Incremental, TableConfig}
    val base = Files.createTempDirectory("graft_pipe_magg").toString
    val mdir = s"$base/t"
    val adir = s"$base/agg"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 4)

    def src(rows: Seq[(Long, Long, String, Long, Boolean)]) =
      rows.toDF("key", "seq", "grp", "amt", "del")
    def live() = graft.sources.Mirror.readFinal(spark, mdir, "key")
      .select("key", "grp", "amt")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def expected() = asMap(live().groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"), sum(col("amt")).as("sum_amt")))

    // snapshot seeds both the mirror and the maintained aggregate
    val v0 = (1L to 12L).map(i =>
      (i, i, if (i % 2 == 0) "even" else "odd", i * 10, false))
    Incremental.snapshot(src(v0), cfg, mdir)
    val agg = MaterializedAgg.create(spark, live(), Seq("grp"), Seq("amt"), adir)
    assert(asMap(agg.read()) == expected())

    // sync 1: an update, a delete, an insert. The aggregate refreshes from
    // the SAME delta the poll lands — pre-image retraction from the live
    // mirror, then the poll applies the batch
    val d1 = Seq((2L, 13L, "even", 999L, false), (3L, 14L, "odd", 0L, true),
      (13L, 15L, "odd", 130L, false))
    agg.refreshFromUpsert(live(), src(d1), Seq("key"), "del")
    Incremental.poll(src(v0 ++ d1), cfg, mdir, isDelete = col("del"))
    assert(asMap(agg.read()) == expected())

    // sync 2: a key MOVES groups (retract from odd, insert into even)
    val d2 = Seq((5L, 16L, "even", 555L, false))
    agg.refreshFromUpsert(live(), src(d2), Seq("key"), "del")
    Incremental.poll(src(v0 ++ d1 ++ d2), cfg, mdir, isDelete = col("del"))
    assert(asMap(agg.read()) == expected())

    // compaction changes layout, never answers; a reopened handle agrees
    agg.compact()
    assert(asMap(agg.read()) == expected())
    assert(asMap(MaterializedAgg.open(spark, adir, Seq("grp"), Seq("amt")).read())
      == expected())
  }

  test("maintained distinct counts ride the polled syncs") {
    import graft.operators.DistinctAgg
    import graft.sources.{Incremental, TableConfig}
    val base = Files.createTempDirectory("graft_pipe_uniq").toString
    val mdir = s"$base/t"
    val udir = s"$base/uniq"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 4)

    def src(rows: Seq[(Long, Long, String, Long, Boolean)]) =
      rows.toDF("key", "seq", "grp", "amt", "del")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // snapshot seeds the mirror and the sketch set; each later sync feeds
    // the SAME non-deleted delta the poll lands. The maintained figure is
    // "distinct amt values ever observed per group" — insert-only
    val v0 = (1L to 12L).map(i =>
      (i, i, if (i % 2 == 0) "even" else "odd", (i % 4) * 10, false))
    Incremental.snapshot(src(v0), cfg, mdir)
    val uniq = DistinctAgg.create(spark, src(v0).where(!col("del")),
      Seq("grp"), Seq("amt"), udir)

    val d1 = Seq((2L, 13L, "even", 999L, false), (3L, 14L, "odd", 0L, true),
      (13L, 15L, "odd", 130L, false))
    uniq.refresh(src(d1).where(!col("del")))
    Incremental.poll(src(v0 ++ d1), cfg, mdir, isDelete = col("del"))

    val d2 = Seq((5L, 16L, "even", 555L, false))
    uniq.refresh(src(d2).where(!col("del")))
    Incremental.poll(src(v0 ++ d1 ++ d2), cfg, mdir, isDelete = col("del"))

    // maintained == one-shot sketch over everything ever fed (equality,
    // not tolerance: HLL union is associative), and exact at this size
    val fed = src(v0).where(!col("del"))
      .unionByName(src(d1).where(!col("del")))
      .unionByName(src(d2).where(!col("del")))
    val oneShot = fed.groupBy(col("grp"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("amt")))
        .as("approx_distinct_amt"))
    assert(asMap(uniq.read()) == asMap(oneShot))
    val exact = fed.groupBy(col("grp"))
      .agg(countDistinct(col("amt")).cast("long").as("n"))
    assert(asMap(uniq.read()) == asMap(exact))

    // the mirror polled normally underneath (key 3 deleted, 13 and 5 live)
    val live = graft.sources.Mirror.readFinal(spark, mdir, "key")
    assert(live.count() == 12 && live.where(col("key") === 3L).count() == 0)
  }

  test("text index rides append-only polled syncs; searches track the mirror") {
    import graft.operators.{TextIndex, TextSearch}
    import graft.sources.{Incremental, TableConfig}
    val base = Files.createTempDirectory("graft_pipe_text").toString
    val mdir = s"$base/docs"
    val tdir = s"$base/tidx"
    val cfg = TableConfig("docs", Seq("doc_id"), "doc_id", nBuckets = 4)

    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    // contiguous id ranges: doc_id doubles as the capture version column,
    // so later batches must carry later ids (append-only arrival order)
    val b0 = docs.where(col("doc_id") < 200)
    val b1 = docs.where(col("doc_id") >= 200 && col("doc_id") < 350)
    val b2 = docs.where(col("doc_id") >= 350)

    // snapshot seeds both; each append-only sync feeds the index the SAME
    // fresh docs the poll lands (the index's batches-partition-the-corpus
    // contract — updates would go through a rebuild, as documented)
    Incremental.snapshot(b0, cfg, mdir)
    val idx = TextIndex.create(b0, "doc_id", "text", tdir, parts = 8)
    idx.add(b1, "doc_id", "text")
    Incremental.poll(b0.unionByName(b1), cfg, mdir)
    idx.add(b2, "doc_id", "text")
    Incremental.poll(b0.unionByName(b1).unionByName(b2), cfg, mdir)

    // the index's answers equal one-shot searches of the mirror's FINAL
    // state — BM25 (exact, rank + rounded score), boolean, and phrase
    val live = graft.sources.Mirror.readFinal(spark, mdir, "doc_id")
    assert(live.count() == docs.count())
    def rk(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("bm25"), col("rk"))
        .as[(Long, Double, Long)].collect().sortBy(_._3).toSeq
    assert(rk(idx.searchTopK("spark window dup", 10)) ==
      rk(TextSearch.bm25TopK(live, "doc_id", "text", "spark window dup", 10)))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id")).as[Long].collect().toSet
    assert(ids(idx.booleanSearch(Seq("spark", "window"), Seq("slow"))) ==
      ids(TextSearch.booleanSearch(live, "doc_id", "text",
        Seq("spark", "window"), Seq("slow"))))
    assert(ids(idx.searchPhrase("spark window")) ==
      ids(TextSearch.phraseSearch(live, "doc_id", "text", "spark window")))
  }

  test("stream -> adopt -> warehouse: the full landing path ends in the JDBC target") {
    import graft.sinks.JdbcSink
    import graft.sources.{Incremental, TableConfig}
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_pipe_wh")
    val target = base.resolve("mirror").toString
    val ckpt = base.resolve("ckpt").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    // phase 1: the CDC stream builds the parquet mirror
    val input = MemoryStream[Change]
    input.addData(
      Change(1L, 1L, "insert", ts("2024-01-01 00:00:00"), "a"),
      Change(2L, 2L, "insert", ts("2024-01-01 00:00:01"), "b"),
      Change(3L, 3L, "insert", ts("2024-01-01 00:00:02"), "c"),
      Change(1L, 4L, "update", ts("2024-01-01 00:00:03"), "a2"))
    CdcStream.mirrorToParquet(input.toDS(), target, ckpt, nBuckets = 4)
      .awaitTermination()

    // phase 2: adoption into the polled lifecycle, then delivery into a
    // live Derby warehouse (the reference's ClickHouse landing step)
    val cfg = TableConfig("t", Seq("key"), "version", nBuckets = 4)
    Incremental.adoptMirror(spark, target, cfg)
    val url = "jdbc:derby:memory:graftpipewh;create=true"
    jdbcExec(url,
      "CREATE TABLE wh (\"key\" BIGINT PRIMARY KEY, \"version\" BIGINT, " +
        "\"op\" VARCHAR(16), \"ts\" TIMESTAMP, \"payload\" VARCHAR(64), " +
        "\"_peerdb_version\" BIGINT)")
    def warehouse(): Map[Long, String] =
      jdbcRows(url, "SELECT \"key\", \"payload\" FROM wh")(r =>
        r.getLong(1) -> r.getString(2)).toMap
    val r1 = JdbcSink.sinkMirror(spark, target, url, "wh", Seq("key"),
      dual = JdbcSink.DerbyDual)
    assert(r1.applied && warehouse() == Map(1L -> "a2", 2L -> "b", 3L -> "c"))

    // phase 3: a hard delete at the source reaches the warehouse through
    // sweep + delta-sized re-delivery; a second delivery call is a no-op
    val live = Seq((1L, 4L), (2L, 2L)).toDF("key", "version")
    assert(Incremental.reconcileDeletes(live, cfg, target).rowsSynced == 1L)
    val r2 = JdbcSink.sinkMirror(spark, target, url, "wh", Seq("key"),
      dual = JdbcSink.DerbyDual)
    assert(r2.applied && warehouse() == Map(1L -> "a2", 2L -> "b"))
    val idle = JdbcSink.sinkMirror(spark, target, url, "wh", Seq("key"),
      dual = JdbcSink.DerbyDual)
    assert(!idle.applied && warehouse() == Map(1L -> "a2", 2L -> "b"))
  }
}
