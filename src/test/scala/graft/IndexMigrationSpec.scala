package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, LshIndex, TextIndex}

/** Fmt-2 → fmt-3 index migration: fmt 3 only added the streaming-batch mark
  * (`applied`/`batch`), the data layout is unchanged — so a fmt-2 meta must
  * open IN PLACE with the mark defaulted to −1 ("no external batch
  * applied"), not refuse with "rebuild with create()". Each test creates a
  * fmt-3 index, rewrites its meta to the fmt-2 shape (drop the mark, stamp
  * fmt 2), reloads, and probes for identical results. Truly incompatible
  * formats must still skew.
  */
class IndexMigrationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = {
    val r = new scala.util.Random(7)
    (0L until 200L).map { i =>
      val c = (i % 8).toInt
      val v = Array.tabulate(16)(j => (if (j == c * 2) 4f else 0f) + r.nextFloat() * 0.2f)
      (i, v)
    }.toDF("vec_id", "embedding")
  }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/idx"

  // hand-author a meta rewrite the way an old build would have written it:
  // also drop the local-FS .crc sidecar, which the nio rewrite invalidates
  private def rewrite(dir: String, file: String)(f: String => String): Unit = {
    val p = Paths.get(dir, file)
    val txt = Files.readString(p)
    val out = f(txt)
    assert(out != txt, s"meta rewrite had no effect: $txt")
    Files.writeString(p, out)
    Files.deleteIfExists(Paths.get(dir, s".$file.crc"))
  }

  // rewrite dir/file to the fmt-2 shape: stamp fmt 2, drop the given marks
  private def downgrade(dir: String, file: String, dropFields: String*): Unit =
    rewrite(dir, file) { txt =>
      dropFields.foldLeft(txt.replaceAll("\"fmt\":\\d+", "\"fmt\":2")) {
        (t, f) => t.replaceAll(s""","$f":-?\\d+""", "")
      }
    }

  test("fmt-2 IVF meta opens in place and probes identically") {
    val dir = tmp("graft_ivf_fmt2")
    val idx = IvfIndex.create(embs, "vec_id", "embedding", dir, numCentroids = 8)
    val queries = embs.where($"vec_id" % 25 === 0)
    def rows(i: IvfIndex) =
      i.probe(queries, "vec_id", "embedding", 5, nProbe = 3)
        .as[(Long, Long, Long)].collect().toSet
    val before = rows(idx)
    downgrade(dir, "_graft_ivf_index.json", "applied", "pq_res")
    val migrated = IvfIndex.load(spark, dir)
    assert(rows(migrated) == before, "fmt-2 probe diverged")
  }

  test("fmt-2 LSH meta opens in place and probes identically") {
    val dir = tmp("graft_lsh_fmt2")
    val idx = LshIndex.create(embs, "vec_id", "embedding", dir,
      bits = 8, tables = 4)
    val queries = embs.where($"vec_id" % 25 === 0)
    def rows(i: LshIndex) =
      i.probe(queries, "vec_id", "embedding", 5)
        .as[(Long, Long, Long)].collect().toSet
    val before = rows(idx)
    downgrade(dir, "_graft_lsh_index.json", "applied")
    assert(rows(LshIndex.load(spark, dir)) == before, "fmt-2 probe diverged")
  }

  test("fmt-2 text meta opens in place and searches identically") {
    val docs = Seq(
      (1L, "spark window functions over a dup table"),
      (2L, "window over spark"),
      (3L, "an unrelated document about ducks")).toDF("doc_id", "text")
    val dir = tmp("graft_text_fmt2")
    val idx = TextIndex.create(docs, "doc_id", "text", dir, parts = 4)
    def top(i: TextIndex) =
      i.searchTopK("spark window", 3).select(col("doc_id")).as[Long].collect().toSeq
    val before = top(idx)
    assert(before.nonEmpty)
    downgrade(dir, "_graft_text_index.json", "batch")
    assert(top(TextIndex.load(spark, dir)) == before, "fmt-2 search diverged")
  }

  test("fmt-3 IVF meta (pre-PQ, q boolean-valued) opens in place") {
    val dir = tmp("graft_ivf_fmt3")
    val idx = IvfIndex.create(embs, "vec_id", "embedding", dir, numCentroids = 8)
    val queries = embs.where($"vec_id" % 25 === 0)
    def rows(i: IvfIndex) =
      i.probe(queries, "vec_id", "embedding", 5, nProbe = 3)
        .as[(Long, Long, Long)].collect().toSet
    val before = rows(idx)
    // fmt 3 carried the same fields with q limited to 0/1 and no residual
    // flag — only the stamp differs for a non-PQ index
    rewrite(dir, "_graft_ivf_index.json")(
      _.replaceAll("\"fmt\":\\d+", "\"fmt\":3")
        .replaceAll(""","pq_res":\d+""", ""))
    assert(rows(IvfIndex.load(spark, dir)) == before, "fmt-3 probe diverged")
  }

  test("fmt-4 IVF meta (raw PQ, pre-residual) opens in place") {
    val dir = tmp("graft_ivf_fmt4")
    // a fmt-4 index quantized RAW vectors: build one the old way
    // (pqResidual = false), then stamp its meta back to fmt 4 without the
    // residual flag — load must default to raw decoding and probe
    // identically (reading raw codes as residuals would score garbage)
    val idx = IvfIndex.create(embs, "vec_id", "embedding", dir,
      numCentroids = 8, pqM = 4, pqKsub = 16, pqResidual = false,
      pqRotate = false) // fmt-4 builds predate the OPQ rotation too
    val queries = embs.where($"vec_id" % 25 === 0)
    def rows(i: IvfIndex) =
      i.probe(queries, "vec_id", "embedding", 5, nProbe = 3)
        .as[(Long, Long, Long)].collect().toSet
    val before = rows(idx)
    rewrite(dir, "_graft_ivf_index.json")(
      _.replaceAll("\"fmt\":\\d+", "\"fmt\":4")
        .replaceAll(""","pq_res":\d+""", "")
        .replaceAll(""","pq_rot":\d+""", ""))
    val migrated = IvfIndex.load(spark, dir)
    assert(!migrated.pqResidual)
    assert(rows(migrated) == before, "fmt-4 probe diverged")
  }

  test("fmt-5 IVF meta (residual PQ, pre-rotation) opens in place") {
    val dir = tmp("graft_ivf_fmt5")
    // a fmt-5 index quantized UNROTATED residuals: build one the old way
    // (pqRotate = false), stamp back to fmt 5 without the rotation flag —
    // load must default to identity rotation and probe identically
    // (decoding rotated codes without the rotation would score garbage,
    // which is why the rotation bumps the format at all)
    val idx = IvfIndex.create(embs, "vec_id", "embedding", dir,
      numCentroids = 8, pqM = 4, pqKsub = 16, pqRotate = false)
    val queries = embs.where($"vec_id" % 25 === 0)
    def rows(i: IvfIndex) =
      i.probe(queries, "vec_id", "embedding", 5, nProbe = 3)
        .as[(Long, Long, Long)].collect().toSet
    val before = rows(idx)
    rewrite(dir, "_graft_ivf_index.json")(
      _.replaceAll("\"fmt\":\\d+", "\"fmt\":5")
        .replaceAll(""","pq_rot":\d+""", ""))
    val migrated = IvfIndex.load(spark, dir)
    assert(migrated.pqResidual && migrated.pqRot.isEmpty)
    assert(rows(migrated) == before, "fmt-5 probe diverged")
  }

  test("a format outside the compat set still skews, never opens") {
    val dir = tmp("graft_ivf_fmt9")
    IvfIndex.create(embs, "vec_id", "embedding", dir, numCentroids = 8)
    rewrite(dir, "_graft_ivf_index.json")(
      _.replaceAll("\"fmt\":\\d+", "\"fmt\":9"))
    val e = intercept[IllegalStateException] { IvfIndex.load(spark, dir) }
    assert(e.getMessage.contains("rebuild with create()"))
  }
}
