package graft

import graft.sources.{Incremental, TableConfig}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Retention sweeps: the ClickHouse-TTL analog (`Incremental.expire`) and
  * tombstone GC, with the same reader-atomic bucket-rewrite contract as
  * the delete-reconciliation sweep.
  */
class TtlSpec extends SparkSpec {
  import spark.implicits._

  private def state(n: Int): DataFrame =
    (1L to n.toLong).map(i => (i, i, s"p$i")).toDF("key", "seq", "payload")

  private def finalKeys(dir: String): Set[Long] =
    graft.sources.Mirror.readFinal(spark, dir, "key")
      .select("key").as[Long].collect().toSet

  private def bucketListings(dir: String): Map[String, Set[String]] = {
    val root = new java.io.File(dir)
    root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .map(d => d.getName -> d.list().toSet).toMap
  }

  test("expire drops aged rows, rewriting only the touched buckets") {
    val dir = Files.createTempDirectory("graft_ttl").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 16)
    Incremental.snapshot(state(100), cfg, dir)
    val before = bucketListings(dir)

    val r = Incremental.expire(spark, cfg, dir, col("seq") <= 2L)
    assert(r.rowsSynced == 2L)
    assert(finalKeys(dir) == (3L to 100L).toSet)
    // watermark untouched (TTL is not a sync), batch advanced
    assert(r.state.watermark == 100L && r.state.batchId == 1L)

    // only buckets holding an expired key were rewritten
    val after = bucketListings(dir)
    val changed = before.keySet.filter(b => before(b) != after.getOrElse(b, Set()))
    assert(changed.size <= 2, s"expected <=2 rewritten buckets, got $changed")

    // idempotent: nothing left to expire
    assert(Incremental.expire(spark, cfg, dir, col("seq") <= 2L).rowsSynced == 0L)
  }

  test("wipe guard refuses a mass expiry unless forced") {
    val dir = Files.createTempDirectory("graft_ttl_guard").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 4)
    Incremental.snapshot(state(100), cfg, dir)

    val e = intercept[IllegalStateException] {
      Incremental.expire(spark, cfg, dir, col("seq") <= 90L)
    }
    assert(e.getMessage.contains("maxExpireFraction"))
    assert(finalKeys(dir).size == 100) // untouched after the refusal

    val forced = Incremental.expire(spark, cfg, dir, col("seq") <= 90L,
      maxExpireFraction = 1.0)
    assert(forced.rowsSynced == 90L && finalKeys(dir) == (91L to 100L).toSet)
  }

  test("tombstone GC forgets old tombstones; a re-insert re-lands cleanly") {
    val dir = Files.createTempDirectory("graft_ttl_gc").toString + "/t"
    val cfg = TableConfig("t", Seq("key"), "seq", nBuckets = 4)
    val t0 = lit("2024-01-01 00:00:00").cast("timestamp")
    Incremental.snapshot(state(10), cfg, dir, syncedAt = t0)

    // logical delete of key 5 lands as a tombstone
    val del = Seq((5L, 11L, "DEL")).toDF("key", "seq", "payload")
    Incremental.poll(state(10).unionByName(del), cfg, dir,
      isDelete = col("payload") === "DEL", syncedAt = t0)
    assert(finalKeys(dir) == ((1L to 10L).toSet - 5L))
    def key5Rows() = graft.sources.Mirror.readCommitted(spark, dir)
      .where(col("key") === 5L).count()
    assert(key5Rows() == 1L) // the tombstone row is physically present

    // GC tombstones older than the horizon: the row itself disappears
    val gc = Incremental.expireTombstones(spark, cfg, dir, lit("2024-01-02"))
    assert(gc.rowsSynced == 1L && key5Rows() == 0L)
    assert(finalKeys(dir) == ((1L to 10L).toSet - 5L)) // FINAL unchanged

    // a later re-insert carries a fresh seq and re-lands through the tail
    val back = Seq((5L, 12L, "fresh")).toDF("key", "seq", "payload")
    Incremental.poll(state(10).unionByName(back), cfg, dir, syncedAt = t0)
    assert(finalKeys(dir) == (1L to 10L).toSet)
    assert(graft.sources.Mirror.readFinal(spark, dir, "key")
      .where(col("key") === 5L).select("payload").as[String].collect().head == "fresh")
  }

  test("expireAll drives per-table retention policies across the mirror set") {
    val root = Files.createTempDirectory("graft_ttl_all").toString
    val cfgs = Seq(TableConfig("o", Seq("key"), "seq", nBuckets = 4),
      TableConfig("l", Seq("key"), "seq", nBuckets = 4))
    val srcs = Map("o" -> state(10), "l" -> state(20))
    val mirrors = new graft.sources.MultiTableMirror(spark, cfgs, srcs, root)
    mirrors.snapshotAll()

    // each table has its own horizon — the per-table predicate map
    val res = mirrors.expireAll {
      case "o" => col("seq") <= 2L
      case "l" => col("seq") <= 5L
    }
    assert(res("o").rowsSynced == 2L && res("l").rowsSynced == 5L)
    assert(finalKeys(s"$root/o") == (3L to 10L).toSet)
    assert(finalKeys(s"$root/l") == (6L to 20L).toSet)
  }
}
