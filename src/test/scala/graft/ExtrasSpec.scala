package graft

import graft.expressions.RollingFingerprint
import graft.operators.{Multimodal, Skew}
import graft.operators.Skew.SaltedAggSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class ExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("SQL functions are callable after bridge.registerFunctions") {
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    val j = spark.sql("SELECT sorted_jaccard(array(1L,2L,3L), array(2L,3L,4L)) AS j")
      .as[Double].head()
    assert(j == 0.5)
    // optional third arg: early-exit threshold (−1 below it, exact at/above)
    val jt = spark.sql(
      "SELECT sorted_jaccard(array(1L,2L,3L), array(2L,3L,4L), 0.8) AS j")
      .as[Double].head()
    assert(jt == -1.0)
    val mh = spark.sql("SELECT size(token_minhash(array('a','b','c','d'), 3, 16)) AS n")
      .as[Int].head()
    assert(mh == 16)
    val sh = spark.sql("SELECT simhash64(array(5L)) AS s").as[Long].head()
    assert(sh == 5L)
    val fp = spark.sql("SELECT size(rolling_fingerprint('abcdefghijklmnopqrstuvwxyz')) AS n")
      .as[Int].head()
    assert(fp >= 1)
    // the packed-int8 pair: codes binary of dim bytes, scale-invariant cosine
    val (len, qc) = spark.sql(
      "SELECT length(p.codes), int8_cosine_sim(p.codes, array(2.0D, 0.0D, 0.0D)) " +
        "FROM (SELECT pack_int8(array(0.5D, 0.0D, 0.0D)) AS p)")
      .as[(Int, Double)].head()
    assert(len == 3)
    assert(math.abs(qc - 1.0) < 1e-12)
  }

  test("rolling fingerprint shares entries for documents with a long common substring") {
    val common = "this exact long passage appears verbatim in both documents end"
    val a = RollingFingerprint.compute(
      UTF8String.fromString("prefix one " + common + " suffix alpha"), 8, 16).toSet
    val b = RollingFingerprint.compute(
      UTF8String.fromString("other start " + common + " different tail"), 8, 16).toSet
    val c = RollingFingerprint.compute(
      UTF8String.fromString("entirely unrelated text with no overlap at all here"), 8, 16).toSet
    assert((a & b).nonEmpty)
    assert((a & c).isEmpty)
  }

  test("rolling fingerprint of short text degrades to a whole-text hash") {
    val s = RollingFingerprint.compute(UTF8String.fromString("abc"), 8, 16)
    assert(s.length == 1)
  }

  test("typed multimodal decode produces per-item features via mapPartitions") {
    val docs = Seq((0L, "hello"), (1L, "world!")).toDF("doc_id", "text")
    val feats = Multimodal.decode(Multimodal.withMediaColumns(docs, "doc_id", "text"))
      .collect().sortBy(_.id)
    assert(feats.map(_.nBytes).toSeq == Seq(5L, 6L))
    assert(feats(0).pixels == 64L * 64L)
    assert(feats.map(_.checksum).distinct.length == 2)
  }

  test("ImageHeader parses crafted PNG/JPEG/GIF headers and rejects non-images") {
    import graft.operators.ImageHeader
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // PNG: signature + IHDR length/type + 640x480 big-endian
    val png = b(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13) ++ "IHDR".getBytes("US-ASCII") ++
      b(0, 0, 2, 0x80, 0, 0, 1, 0xe0, 8, 6, 0, 0, 0)
    assert(ImageHeader.parse(png).contains(ImageHeader.ImageInfo("png", 640, 480)))
    // JPEG: SOI, APP0 (skipped by length), DQT (skipped), SOF0 510x360
    val jpeg = b(0xff, 0xd8,
      0xff, 0xe0, 0, 16) ++ "JFIF".getBytes("US-ASCII") ++ b(0, 1, 1, 0, 0, 1, 0, 1, 0, 0) ++
      b(0xff, 0xdb, 0, 4, 0, 0) ++
      b(0xff, 0xc0, 0, 17, 8, 1, 0x68, 1, 0xfe, 3) ++ Array.fill[Byte](10)(0)
    assert(ImageHeader.parse(jpeg).contains(ImageHeader.ImageInfo("jpeg", 510, 360)))
    // a progressive JPEG carries SOF2 instead of SOF0
    val prog = jpeg.updated(27, 0xc2.toByte) // the 0xc0 marker byte
    assert(ImageHeader.parse(prog).contains(ImageHeader.ImageInfo("jpeg", 510, 360)))
    // GIF89a logical screen 12x34 little-endian
    val gif = "GIF89a".getBytes("US-ASCII") ++ b(12, 0, 34, 0, 0, 0, 0)
    assert(ImageHeader.parse(gif).contains(ImageHeader.ImageInfo("gif", 12, 34)))
    // rejects: truncated PNG, plain text, JPEG with no SOF, null
    assert(ImageHeader.parse(png.take(20)).isEmpty)
    assert(ImageHeader.parse("not an image at all".getBytes("UTF-8")).isEmpty)
    assert(ImageHeader.parse(b(0xff, 0xd8, 0xff, 0xd9)).isEmpty)
    assert(ImageHeader.parse(null).isEmpty)

    // the codec seam: real headers through the typed decode path, with the
    // stub fallback for payloads that are not images
    val media = Seq(
      (1L, png, 7, 9, "img/0"), (2L, jpeg, 7, 9, "img/1"),
      (3L, "just text".getBytes("UTF-8"), 7, 9, "img/2"))
      .toDF("doc_id", "payload", "width", "height", "media_type")
      .select($"doc_id", $"payload",
        org.apache.spark.sql.functions.struct(
          $"width", $"height", $"media_type").as("meta"))
    val feats = Multimodal.decode(media, Multimodal.imageHeaderCodec)
      .collect().sortBy(_.id)
    assert(feats.map(f => (f.id, f.mediaType, f.pixels)).toSeq == Seq(
      (1L, "png", 640L * 480L), (2L, "jpeg", 510L * 360L), (3L, "img/2", 63L)))
  }

  test("resizeStub caps the longest side and preserves aspect ratio") {
    val docs = Seq((0L, "x")).toDF("doc_id", "text") // 64×64
    val media = Multimodal.withMediaColumns(docs, "doc_id", "text")
    val r = Multimodal.resizeStub(media, 32)
      .select($"meta.width", $"meta.height").as[(Int, Int)].head()
    assert(r == (32, 32)) // halved square
    val small = Multimodal.resizeStub(media, 500)
      .select($"meta.width", $"meta.height").as[(Int, Int)].head()
    assert(small == (64, 64)) // under the cap: untouched
  }

  test("frameSampleStub slices every stride-th full frame") {
    val docs = Seq((1L, "a" * 300)).toDF("doc_id", "text") // 4 full 64B frames
    val media = Multimodal.withMediaColumns(docs, "doc_id", "text")
    val frames = Multimodal.frameSampleStub(media, "doc_id", 64, 2)
      .as[(Long, Long, Array[Byte])].collect()
    assert(frames.map(_._2).toSeq == Seq(0L, 2L)) // frames 0 and 2 of 0..3
    assert(frames.forall(_._3.length == 64))
  }

  test("Misra-Gries sketch surfaces true heavy hitters within the error bound") {
    import graft.expressions.FrequentItemsAggregator
    // 1000 items: "hot" 400×, "warm" 200×, 400 singletons
    val items = (Seq.fill(400)("hot") ++ Seq.fill(200)("warm") ++
      (1 to 400).map(i => s"rare$i"))
    val shuffled = new scala.util.Random(7).shuffle(items)
    val agg = udaf(new FrequentItemsAggregator(10), org.apache.spark.sql.Encoders.STRING)
    val out = shuffled.toDF("w").repartition(4)
      .agg(agg($"w").as("top"))
      .select(explode($"top").as("e")).select($"e._1", $"e._2")
      .as[(String, Long)].collect().toMap
    val n = items.size
    // guarantee: freq > n/(k+1) survives; count error ≤ n/(k+1)
    assert(out.contains("hot") && out.contains("warm"))
    assert(out("hot") >= 400 - n / 11 && out("hot") <= 400)
    assert(out.size <= 10)
  }

  test("weighted Misra-Gries honors the total-weight heavy-hitter bound") {
    import graft.expressions.WeightedFrequentItemsAggregator
    // weights: "whale" 50000 across few rows, "mid" 20000, 500 minnows ×100
    val rows = Seq.fill(5)(("whale", 10000L)) ++ Seq.fill(20)(("mid", 1000L)) ++
      (1 to 500).map(i => (s"minnow$i", 100L))
    val shuffled = new scala.util.Random(13).shuffle(rows)
    val agg = udaf(new WeightedFrequentItemsAggregator(10),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong))
    val out = shuffled.toDF("w", "c").repartition(4)
      .agg(agg($"w", $"c").as("top"))
      .select(explode($"top").as("e")).select($"e._1", $"e._2")
      .as[(String, Long)].collect().toMap
    val totalW = rows.map(_._2).sum // 120000
    val bound = totalW / 11
    // guarantee: weight > W/(k+1) survives; reported ≤ true ≤ reported + W/(k+1)
    assert(out.contains("whale") && out.contains("mid"), s"got $out")
    assert(out("whale") <= 50000 && out("whale") >= 50000 - bound)
    assert(out("mid") <= 20000 && out("mid") >= 20000 - bound)
    assert(out.size <= 10)
    // zero/negative weights are no-ops
    val z = Seq(("a", 5L), ("b", 0L), ("b", -3L)).toDF("w", "c")
      .agg(agg($"w", $"c").as("top"))
      .select(explode($"top").as("e")).select($"e._1", $"e._2")
      .as[(String, Long)].collect().toMap
    assert(z == Map("a" -> 5L))
  }

  test("saltedAgg matches the unsalted aggregation") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 10L)).toDF("k", "v")
    val out = Skew.saltedAgg(df, Seq("k"), saltBuckets = 8, Seq(
        SaltedAggSpec("total", col("v"), sum, sum),
        SaltedAggSpec("n", col("v"), c => count(c), sum),
        SaltedAggSpec("mx", col("v"), max, max)))
      .orderBy("k").as[(String, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("a", 6L, 3L, 3L), ("b", 10L, 1L, 10L)))
  }

  test("saltedJoin equals the plain join result") {
    val left = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "lv")
    val right = Seq(("a", 100), ("b", 200)).toDF("k", "rv")
    val salted = Skew.saltedJoin(left, right, Seq("k"), saltBuckets = 4)
      .select("k", "lv", "rv").as[(String, Int, Int)].collect().toSet
    val plain = left.join(right, "k")
      .select("k", "lv", "rv").as[(String, Int, Int)].collect().toSet
    assert(salted == plain)
  }
}
