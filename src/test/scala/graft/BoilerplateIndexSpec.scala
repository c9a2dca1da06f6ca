package graft

import graft.operators.{BoilerplateIndex, Dedup}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The incremental boilerplate index's contract: `cleanAndAdd(batchK)`
  * equals the one-shot `Dedup.sentenceDedup` over batches 1..K restricted
  * to batch K's docs; state resumes from disk; compact folds without
  * changing a single answer.
  */
class BoilerplateIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  private val b1 = docs((1L, "FOO. alpha"), (2L, "FOO. beta. BAR"),
    (3L, "gamma"))
  private val b2 = docs((4L, "FOO. delta. BAR"), (5L, "BAR. epsilon"),
    (6L, "FOO"))
  private val b3 = docs((7L, "FOO. zeta. BAR"), (8L, "eta"), (9L, "BAR"))
  private val b4 = docs((10L, "FOO. BAR. theta"), (11L, "iota"))

  private def oneShot(upTo: Seq[org.apache.spark.sql.DataFrame],
                      batch: org.apache.spark.sql.DataFrame) =
    Dedup.sentenceDedup(upTo.reduce(_ unionByName _), "doc_id", "text")
      .join(batch.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq

  private def got(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq

  test("incremental clean equals the one-shot pass over all batches seen") {
    val dir = Files.createTempDirectory("graft_boiler").toString + "/idx"
    val idx = BoilerplateIndex.create(spark, dir, minDocs = 3)
    // batch 1: FOO df=2 < 3 → nothing removed yet
    val c1 = got(idx.cleanAndAdd(b1, "doc_id", "text"))
    assert(c1 == oneShot(Seq(b1), b1))
    assert(c1.forall(_._3 == 0L))
    // batch 2: FOO reaches df=4 (2 prior + 2 here) → removed HERE, and the
    // one-shot over both batches agrees on batch 2's docs
    val c2 = got(idx.cleanAndAdd(b2, "doc_id", "text"))
    assert(c2 == oneShot(Seq(b1, b2), b2))
    assert(c2.exists(_._3 > 0L))
    assert(idx.batches == 2)
  }

  test("reload resumes from disk; compact folds with byte-identical cleans") {
    val dir = Files.createTempDirectory("graft_boiler2").toString + "/idx"
    val idx = BoilerplateIndex.create(spark, dir, minDocs = 3)
    idx.cleanAndAdd(b1, "doc_id", "text").count()
    idx.cleanAndAdd(b2, "doc_id", "text").count()

    val reloaded = BoilerplateIndex.load(spark, dir)
    assert(reloaded.batches == 2 && reloaded.minDocs == 3)
    val c3 = got(reloaded.cleanAndAdd(b3, "doc_id", "text"))
    assert(c3 == oneShot(Seq(b1, b2, b3), b3))

    reloaded.compact()
    assert(reloaded.base == 3 && reloaded.batches == 4)
    val c4 = got(reloaded.cleanAndAdd(b4, "doc_id", "text"))
    assert(c4 == oneShot(Seq(b1, b2, b3, b4), b4))

    // a reload after the compact sees the folded state and still agrees:
    // clean an empty batch (no new counts) — nothing to remove, no crash
    val again = BoilerplateIndex.load(spark, dir)
    assert(again.base == 3 && again.batches == 5)
    assert(again.cleanAndAdd(docs(), "doc_id", "text").count() == 0)
  }
}
