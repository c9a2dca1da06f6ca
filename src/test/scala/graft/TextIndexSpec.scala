package graft

import graft.operators.{TextIndex, TextSearch}
import org.apache.spark.sql.functions._

class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, sf, "documents")
  private def dir() =
    java.nio.file.Files.createTempDirectory("graft_tidx").toString + "/idx"

  private def rk(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double, Long)] =
    df.select(col("doc_id"), col("bm25"), col("rk"))
      .as[(Long, Double, Long)].collect().sortBy(_._3).toSeq

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select(col("doc_id")).as[Long].collect().toSet

  test("create+add search equals the one-shot BM25 over the union exactly") {
    val d = dir()
    val a = docs.where(pmod(col("doc_id"), lit(3)) =!= 0)
    val b = docs.where(pmod(col("doc_id"), lit(3)) === 0)
    val idx = TextIndex.create(a, "doc_id", "text", d, parts = 8)
    idx.add(b, "doc_id", "text")

    val q = "spark window dup table"
    assert(rk(idx.searchTopK(q, 15)) ==
      rk(TextSearch.bm25TopK(docs, "doc_id", "text", q, 15)))

    // boolean retrieval agrees too, including the must-not leg
    assert(ids(idx.booleanSearch(Seq("spark", "window"), Seq("slow"))) ==
      ids(TextSearch.booleanSearch(docs, "doc_id", "text",
        Seq("spark", "window"), Seq("slow"))))

    // compact folds generations; answers are unaffected; a reopened handle
    // (and its advanced base) agrees
    val before = rk(idx.searchTopK(q, 15))
    idx.compact()
    assert(idx.base > 0 && rk(idx.searchTopK(q, 15)) == before)
    val again = TextIndex.load(spark, d)
    assert(again.base == idx.base && again.batches == idx.batches)
    assert(rk(again.searchTopK(q, 15)) == before)
    assert(ids(again.booleanSearch(Seq("spark", "window"), Seq("slow"))) ==
      ids(TextSearch.booleanSearch(docs, "doc_id", "text",
        Seq("spark", "window"), Seq("slow"))))
  }

  test("search scans are partition-pruned to the query terms' posting dirs") {
    val d = dir()
    val idx = TextIndex.create(docs, "doc_id", "text", d, parts = 8)
    val captured = scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.execution.SparkPlan]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit =
        captured.synchronized { captured += qe.executedPlan }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    def scansIn(p: org.apache.spark.sql.execution.SparkPlan): Seq[
      org.apache.spark.sql.execution.FileSourceScanExec] = p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scansIn(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scansIn(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        scansIn(r.child)
    }.flatten
    def postingScans() = captured.synchronized(captured.toSeq).flatMap(scansIn)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("/postings")))
    def pruned() = {
      val s = postingScans()
      s.nonEmpty && s.forall(
        _.partitionFilters.exists(_.references.exists(_.name == "p")))
    }
    spark.listenerManager.register(listener)
    val got = try {
      val out = rk(idx.searchTopK("dup spark", 5))
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline && !pruned()) Thread.sleep(100)
      out
    } finally spark.listenerManager.unregister(listener)
    // pruning loses nothing...
    assert(got == rk(TextSearch.bm25TopK(docs, "doc_id", "text", "dup spark", 5)))
    // ...and every postings scan carries a partition filter on the term-hash
    // dir column, so file listing skips non-queried p=J dirs
    assert(pruned(), "postings scan not partition-pruned: " +
      postingScans().map(f => s"filters=${f.partitionFilters}").mkString("; "))
  }

  test("positional phrase search equals the one-shot substring form") {
    val d = dir()
    val a = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val b = docs.where(pmod(col("doc_id"), lit(2)) =!= 0)
    val idx = TextIndex.create(a, "doc_id", "text", d, parts = 8)
    idx.add(b, "doc_id", "text")

    def oneShot(p: String) =
      ids(TextSearch.phraseSearch(docs, "doc_id", "text", p))
    // multi-term, repeated-term, single-term, and absent phrases all agree
    for (p <- Seq("spark window", "table table", "the fast table",
        "spark", "spark nosuchtoken")) {
      assert(ids(idx.searchPhrase(p)) == oneShot(p), s"phrase '$p' disagrees")
    }
    // the 2-term phrase set is a strict subset of the boolean AND set
    // (adjacency is stricter than co-occurrence)
    val phrase = ids(idx.searchPhrase("spark window"))
    val conj = ids(idx.booleanSearch(Seq("spark", "window")))
    assert(phrase.subsetOf(conj) && phrase.nonEmpty)
    intercept[IllegalArgumentException] { idx.searchPhrase(" ") }
  }

  test("streaming maintenance: the searchable index rides microbatches, replay-safe") {
    import graft.streaming.CdcStream
    import graft.streaming.CdcStream.Change
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_tidx_stream")
    val target = base.resolve("mirror").toString
    val ckpt = base.resolve("ckpt").toString
    val tdir = base.resolve("tidx").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    val empty = Seq.empty[(Long, String)].toDF("key", "payload")
    val idx = TextIndex.create(empty, "key", "payload", tdir, parts = 4)
    val input = MemoryStream[Change]
    def run(): Unit = CdcStream.mirrorToParquetWithText(input.toDS(), target,
      ckpt, idx, nBuckets = 4).awaitTermination()

    input.addData(
      Change(1L, 1L, "insert", ts("2024-01-01 00:00:00"), "spark window agg"),
      Change(2L, 2L, "insert", ts("2024-01-01 00:00:01"), "slow table scan"))
    run()
    input.addData(
      Change(3L, 3L, "insert", ts("2024-01-01 00:01:00"), "spark window join"),
      Change(4L, 4L, "insert", ts("2024-01-01 00:01:01"), "fast spark merge"))
    run()

    // the index answers searches of the mirror's FINAL state, exactly
    val live = graft.sources.Mirror.readCommitted(spark, target)
      .where(!col("is_deleted"))
    assert(rk(idx.searchTopK("spark window", 4)) ==
      rk(TextSearch.bm25TopK(live, "key", "payload", "spark window", 4)))
    assert(ids(idx.searchPhrase("spark window")) == Set(1L, 3L))

    // a replayed batch id is skipped — postings and stats never double
    val dupe = Seq((9L, "spark spark spark")).toDF("key", "payload")
    assert(!idx.addBatch(idx.lastBatch.toLong, dupe, "key", "payload"))
    assert(ids(idx.booleanSearch(Seq("spark"))) == Set(1L, 3L, 4L))
    // the mark survives a reopen
    assert(TextIndex.load(spark, tdir).lastBatch == idx.lastBatch)
  }

  test("boolean search edge cases: empty must-not, no matches, input checks") {
    val d = dir()
    val idx = TextIndex.create(docs, "doc_id", "text", d, parts = 4)
    assert(ids(idx.booleanSearch(Seq("spark"))) ==
      ids(TextSearch.booleanSearch(docs, "doc_id", "text", Seq("spark"))))
    assert(idx.booleanSearch(Seq("nosuchtoken")).isEmpty)
    intercept[IllegalArgumentException] { idx.booleanSearch(Nil) }
    intercept[IllegalArgumentException] { idx.searchTopK("  ", 5) }
    // index health: every partition's posting count is positive and the
    // total equals one row per (doc, distinct term)
    val total = idx.partStats().agg(sum(col("postings"))).collect().head.getLong(0)
    val expected = docs
      .select(explode(array_distinct(split(lower(col("text")), " "))))
      .count()
    assert(total == expected)
  }
}
