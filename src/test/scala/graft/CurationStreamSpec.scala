package graft

import graft.streaming.CurationStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  case class Doc(doc_id: Long, text: String, ts: java.sql.Timestamp)

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // stopword-rich, 100+ chars: passes the quality gate
  private val good =
    "the quick brown fox is in the yard and the dog is of a mind to nap " +
      "in the sun and the cat is off to the barn to hunt for a mouse"
  private val alsoGood =
    "a long day in the field is the best kind of day and the crew is glad " +
      "to be out in the air with the sun high and the work going well"
  // punctuation soup, no stopwords: fails the gate
  private val junk = "zzz;;; qqq!!! xxx,,, yyy... vvv::: www!!! uuu;;; ttt,,,"

  test("curate: quality-gates, first-seen dedup within watermark, state bounded") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val curated = CurationStream.curate(
      input.toDF(), "text", "ts", minQuality = 0.3, dupWindow = "10 minutes")
    val q = curated.writeStream.format("memory").queryName("curated_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Doc(1L, good, ts("2024-01-01 00:00:00")),
        Doc(2L, junk, ts("2024-01-01 00:00:10")))
      q.processAllAvailable()
      // a same-content duplicate inside the window + one fresh doc
      input.addData(
        Doc(3L, good, ts("2024-01-01 00:02:00")),
        Doc(4L, alsoGood, ts("2024-01-01 00:03:00")))
      q.processAllAvailable()

      val out = spark.table("curated_out")
      val ids = out.select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 4L),
        s"expected quality-gated first-seen set {1,4}, got $ids")

      // the emitted fingerprint is the dedup key: distinct across survivors
      val fps = out.select("fp").as[String].collect()
      assert(fps.distinct.length == fps.length)

      // batch agreement: the same gate + first-occurrence dedup over the
      // full feed picks the same content set
      val batch = Seq(
        (1L, good), (2L, junk), (3L, good), (4L, alsoGood)
      ).toDF("doc_id", "text")
        .where(graft.functions.TextFunctions.qualityScore($"text") >= 0.3)
        .select(graft.functions.TextFunctions.fingerprint($"text").as("fp"))
        .distinct()
      assert(batch.count() == out.count())
    } finally q.stop()
  }

  test("curate: duplicates beyond the watermark are the lake's job (state evicted)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val curated = CurationStream.curate(
      input.toDF(), "text", "ts", minQuality = 0.3, dupWindow = "1 minute")
    val q = curated.writeStream.format("memory").queryName("curated_evict")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Doc(1L, good, ts("2024-01-01 00:00:00")))
      q.processAllAvailable()
      // push the watermark far past the first doc's window...
      input.addData(Doc(2L, alsoGood, ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      // ...then a late same-content copy: state for doc 1 is gone, so the
      // stream re-admits it — bounded state is the contract, the lake-side
      // dedup_exact owns cross-window duplicates
      input.addData(Doc(3L, good, ts("2024-01-01 01:00:30")))
      q.processAllAvailable()

      val ids = spark.table("curated_evict")
        .select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }
}
