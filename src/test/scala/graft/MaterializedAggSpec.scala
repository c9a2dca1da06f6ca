package graft

import graft.operators.MaterializedAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MaterializedAggSpec extends SparkSpec {
  import spark.implicits._

  private def dir() = Files.createTempDirectory("graft_magg").toString + "/agg"

  // (key, group, amount) rows — the live mirror state shapes
  private def rows(t: (Long, String, Long)*): DataFrame =
    t.toSeq.toDF("k", "grp", "amt")

  private def asMap(df: DataFrame): Map[String, (Long, Long)] =
    df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("create + refresh maintains the aggregate under update/delete/insert") {
    val d = dir()
    val initial = rows((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
    val agg = MaterializedAgg.create(spark, initial, Seq("grp"), Seq("amt"), d)
    assert(asMap(agg.read()) == Map("a" -> ((2L, 30L)), "b" -> ((1L, 5L))))

    // sync batch: key 1 updated (10→15), key 3 deleted, key 4 new in "b"
    val upserts = Seq((1L, "a", 15L, false), (3L, "b", 0L, true),
      (4L, "b", 7L, false)).toDF("k", "grp", "amt", "is_deleted")
    agg.refreshFromUpsert(initial, upserts, Seq("k"), "is_deleted")
    assert(asMap(agg.read()) == Map("a" -> ((2L, 35L)), "b" -> ((1L, 7L))))

    // maintenance IO is delta-sized: the new generation holds only the
    // touched groups (one partial row per group in the batch), not the corpus
    val gen1 = spark.read.parquet(s"$d/b=1")
    assert(gen1.count() == 2)

    // a group fully retracted nets to zero and vanishes
    val live2 = rows((1L, "a", 15L), (2L, "a", 20L), (4L, "b", 7L))
    val killB = Seq((4L, "b", 0L, true)).toDF("k", "grp", "amt", "is_deleted")
    agg.refreshFromUpsert(live2, killB, Seq("k"), "is_deleted")
    assert(asMap(agg.read()) == Map("a" -> ((2L, 35L))))
  }

  test("negative net row count is surfaced, not masked") {
    val d = dir()
    val agg = MaterializedAgg.create(spark, rows((1L, "a", 10L)),
      Seq("grp"), Seq("amt"), d)
    // caller bug: retract a row that was never inserted
    agg.refresh(rows().limit(0), rows((9L, "zzz", 3L)))
    val z = agg.read().where($"grp" === "zzz").collect()
    assert(z.length == 1 && z.head.getLong(1) == -1L)
  }

  test("compact folds generations with one-cycle grace; open() re-attaches") {
    val d = dir()
    val initial = rows((1L, "a", 10L), (2L, "b", 20L))
    val agg = MaterializedAgg.create(spark, initial, Seq("grp"), Seq("amt"), d)
    agg.refreshFromUpsert(initial,
      Seq((1L, "a", 11L, false)).toDF("k", "grp", "amt", "is_deleted"), Seq("k"), "is_deleted")
    agg.refreshFromUpsert(rows((1L, "a", 11L), (2L, "b", 20L)),
      Seq((3L, "b", 2L, false)).toDF("k", "grp", "amt", "is_deleted"), Seq("k"), "is_deleted")
    val before = asMap(agg.read())
    assert(before == Map("a" -> ((1L, 11L)), "b" -> ((2L, 22L))) && agg.gens == 3)

    agg.compact()
    assert(asMap(agg.read()) == before && agg.base == 3 && agg.gens == 4)
    // superseded generations keep one cycle of reader grace...
    val ls = new java.io.File(d).list().filter(_.startsWith("b=")).toSet
    assert(Set("b=0", "b=1", "b=2", "b=3").subsetOf(ls))

    // ...and a reopened handle reads the folded state
    val again = MaterializedAgg.open(spark, d, Seq("grp"), Seq("amt"))
    assert(asMap(again.read()) == before)

    // the NEXT compact vacuums them; a single live generation is a no-op
    // compact, so force one more refresh first
    again.refreshFromUpsert(rows((1L, "a", 11L), (2L, "b", 20L), (3L, "b", 2L)),
      Seq((1L, "a", 12L, false)).toDF("k", "grp", "amt", "is_deleted"), Seq("k"), "is_deleted")
    again.compact()
    val ls2 = new java.io.File(d).list().filter(_.startsWith("b=")).toSet
    assert(!ls2.contains("b=0") && !ls2.contains("b=1") && !ls2.contains("b=2"),
      s"pre-compact generations must be vacuumed by the second compact, got $ls2")
    assert(asMap(again.read()) == Map("a" -> ((1L, 12L)), "b" -> ((2L, 22L))))
  }

  test("open with a different spec refuses") {
    val d = dir()
    MaterializedAgg.create(spark, rows((1L, "a", 1L)), Seq("grp"), Seq("amt"), d)
    val e = intercept[IllegalArgumentException] {
      MaterializedAgg.open(spark, d, Seq("k"), Seq("amt"))
    }
    assert(e.getMessage.contains("different"))
  }
}
