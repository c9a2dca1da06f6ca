package graft

import org.apache.spark.sql.functions.struct

import graft.operators.{MediaHeader, Multimodal}
import graft.operators.MediaHeader.MediaInfo

/** Crafted-bytes coverage for the WAV/MP4 container parsers and the typed
  * probe seam — the audio/video siblings of ExtrasSpec's image-header
  * tests. Every fixture is built field-by-field from the public specs
  * (RIFF/WAVE; ISO/IEC 14496-12 mvhd/tkhd), so an offset regression fails
  * loudly.
  */
class MediaHeaderSpec extends SparkSpec {
  import spark.implicits._

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def le32(v: Long): Array[Byte] =
    b((v & 0xff).toInt, ((v >> 8) & 0xff).toInt, ((v >> 16) & 0xff).toInt,
      ((v >> 24) & 0xff).toInt)
  private def le16(v: Int): Array[Byte] = b(v & 0xff, (v >> 8) & 0xff)
  private def be32(v: Long): Array[Byte] =
    b(((v >> 24) & 0xff).toInt, ((v >> 16) & 0xff).toInt, ((v >> 8) & 0xff).toInt,
      (v & 0xff).toInt)
  private def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xffffffffL)
  private def t(s: String): Array[Byte] = s.getBytes("US-ASCII")

  // canonical 44-byte WAV header: stereo, 44.1 kHz, 16-bit, 2 s of data
  private def wavBytes: Array[Byte] =
    t("RIFF") ++ le32(36 + 352800) ++ t("WAVE") ++
      t("fmt ") ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
      le32(176400) ++ le16(4) ++ le16(16) ++
      t("data") ++ le32(352800) // payload bytes themselves not needed

  private def mp4Box(boxType: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ t(boxType) ++ payload

  // mvhd version 0: timescale 600, duration 1500 ticks -> 2500 ms
  private def mvhdV0: Array[Byte] = mp4Box("mvhd",
    b(0, 0, 0, 0) ++ be32(0) ++ be32(0) ++ be32(600) ++ be32(1500) ++
      Array.fill[Byte](80)(0))

  // mvhd version 1: 64-bit times, timescale 90000, duration 90000 -> 1000 ms
  private def mvhdV1: Array[Byte] = mp4Box("mvhd",
    b(1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ be32(90000) ++ be64(90000) ++
      Array.fill[Byte](80)(0))

  // tkhd version 0: zero-filled up to the trailing 16.16 width/height
  private def tkhd(w: Int, h: Int): Array[Byte] = mp4Box("tkhd",
    Array.fill[Byte](76)(0) ++ be32(w.toLong << 16) ++ be32(h.toLong << 16))

  private def mp4Bytes(mvhd: Array[Byte], dims: Option[(Int, Int)]): Array[Byte] = {
    val traks = dims.map { case (w, h) => mp4Box("trak", tkhd(w, h)) }
      .getOrElse(Array.empty[Byte])
    mp4Box("ftyp", t("isom") ++ be32(0)) ++ mp4Box("moov", mvhd ++ traks)
  }

  test("WAV header: channels, sample rate, duration from fmt + data chunks") {
    assert(MediaHeader.parse(wavBytes)
      .contains(MediaInfo("wav", 0, 0, 2, 44100, 2000L)))
    // an extra chunk before fmt (LIST metadata) is walked over correctly
    val withList = wavBytes.take(12) ++ t("LIST") ++ le32(6) ++
      t("INFOxx") ++ wavBytes.drop(12)
    assert(MediaHeader.parse(withList)
      .contains(MediaInfo("wav", 0, 0, 2, 44100, 2000L)))
  }

  test("MP4 header: duration from mvhd (v0 and v1), dimensions from tkhd") {
    assert(MediaHeader.parse(mp4Bytes(mvhdV0, Some((1920, 1080))))
      .contains(MediaInfo("mp4", 1920, 1080, 0, 0, 2500L)))
    assert(MediaHeader.parse(mp4Bytes(mvhdV1, Some((640, 360))))
      .contains(MediaInfo("mp4", 640, 360, 0, 0, 1000L)))
    // audio-only: tkhd dims are zero -> skipped, duration still reported
    val audioTrak = mp4Box("trak", tkhd(0, 0))
    val audioOnly = mp4Box("ftyp", t("M4A ") ++ be32(0)) ++
      mp4Box("moov", mvhdV0 ++ audioTrak)
    assert(MediaHeader.parse(audioOnly)
      .contains(MediaInfo("mp4", 0, 0, 0, 0, 2500L)))
  }

  test("image formats delegate to ImageHeader with zeroed stream fields") {
    val png = b(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13) ++ t("IHDR") ++ b(0, 0, 2, 0x80, 0, 0, 1, 0xe0, 8, 6, 0, 0, 0)
    assert(MediaHeader.parse(png).contains(MediaInfo("png", 640, 480, 0, 0, 0L)))
  }

  test("wavHeader/parse round-trip holds across the parameter space") {
    val rnd = new scala.util.Random(1234)
    for (_ <- 1 to 200) {
      val channels = 1 + rnd.nextInt(8)
      val rate = 1 + rnd.nextInt(192000)
      val dataLen = rnd.nextInt(1 << 30)
      val expectMs = dataLen.toLong * 1000L / (rate.toLong * channels * 2)
      assert(MediaHeader.parse(MediaHeader.wavHeader(channels, rate, dataLen))
        .contains(MediaInfo("wav", 0, 0, channels, rate, expectMs)),
        s"round-trip broke at channels=$channels rate=$rate dataLen=$dataLen")
    }
  }

  test("adversarial payloads return None instead of crashing or misparsing") {
    // RIFF chunk size near u32 max: the cursor must not wrap negative
    val hugeChunk = t("RIFF") ++ le32(100) ++ t("WAVE") ++
      t("JUNK") ++ le32(0x7ffffff0L)
    assert(MediaHeader.parse(hugeChunk).isEmpty)
    // ...but a huge FINAL data chunk on an already-satisfied parse is a
    // legal large WAV, not an overflow bail
    val bigData = wavBytes.dropRight(8) ++ t("data") ++ le32(0x7ffffff0L)
    assert(MediaHeader.parse(bigData).exists(_.channels == 2))
    // deeply nested container headers: bounded walk, no stack overflow
    val ftyp = mp4Box("ftyp", t("isom") ++ be32(0))
    val nested = new Array[Byte](200000 * 8)
    var off = 0
    var remaining = nested.length
    while (remaining > 0) {
      System.arraycopy(be32(remaining.toLong) ++ t("moov"), 0, nested, off, 8)
      off += 8; remaining -= 8
    }
    assert(MediaHeader.parse(ftyp ++ nested).isEmpty)
    // an MP4 prefix truncated mid-tkhd must NOT report garbage dimensions
    val truncated = mp4Bytes(mvhdV0, Some((1920, 1080)))
    assert(MediaHeader.parse(truncated.dropRight(60))
      .forall(i => i.width == 0 && i.height == 0))
    // the ISO "unknown duration" sentinel (all ones) is unknown, not huge
    val unkV0 = mp4Box("mvhd",
      b(0, 0, 0, 0) ++ be32(0) ++ be32(0) ++ be32(600) ++ be32(0xffffffffL) ++
        Array.fill[Byte](80)(0))
    assert(MediaHeader.parse(mp4Box("ftyp", t("isom") ++ be32(0)) ++
      mp4Box("moov", unkV0 ++ mp4Box("trak", tkhd(640, 360))))
      .contains(MediaInfo("mp4", 640, 360, 0, 0, 0L)))
    val unkV1 = mp4Box("mvhd",
      b(1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ be32(90000) ++ be64(-1L) ++
        Array.fill[Byte](80)(0))
    val v1Parsed = MediaHeader.parse(mp4Box("ftyp", t("isom") ++ be32(0)) ++
      mp4Box("moov", unkV1 ++ mp4Box("trak", tkhd(640, 360))))
    assert(v1Parsed.contains(MediaInfo("mp4", 640, 360, 0, 0, 0L)))
  }

  test("wavPcmStats decodes the actual samples: peak, clips, sum of squares") {
    // four known samples: 1000, -2000, 32767 (clip), -32768 (clip)
    def le16s(v: Int): Array[Byte] = b(v & 0xff, (v >> 8) & 0xff)
    val pcm = le16s(1000) ++ le16s(-2000) ++ le16s(32767) ++ le16s(-32768)
    val payload = MediaHeader.wavHeader(1, 8000, pcm.length) ++ pcm
    val s = MediaHeader.wavPcmStats(payload).get
    assert(s.nSamples == 4 && s.peak == 32768 && s.clipped == 2)
    assert(s.sumSquares == 1000L * 1000 + 2000L * 2000 +
      32767L * 32767 + 32768L * 32768)

    // a prefix-truncated data chunk decodes the samples actually present
    val truncated = payload.dropRight(4)
    val t = MediaHeader.wavPcmStats(truncated).get
    assert(t.nSamples == 2 && t.peak == 2000 && t.clipped == 0)
    assert(t.sumSquares == 1000L * 1000 + 2000L * 2000)

    // non-PCM (format tag 3 = IEEE float) and headerless payloads refuse
    val float32 = payload.clone()
    float32(20) = 3 // wFormatTag LE at chunk offset 0 (byte 20 of the file)
    assert(MediaHeader.wavPcmStats(float32).isEmpty)
    assert(MediaHeader.wavPcmStats("not audio".getBytes("UTF-8")).isEmpty)
    assert(MediaHeader.wavPcmStats(null).isEmpty)
  }

  test("parseWithTail resolves moov-after-mdat (non-faststart) MP4s") {
    val ftyp = mp4Box("ftyp", t("isom") ++ be32(0))
    val mdat = mp4Box("mdat", Array.fill[Byte](5000)(0x4d))
    val moov = mp4Box("moov", mvhdV0 ++ mp4Box("trak", tkhd(1280, 720)))
    val file = ftyp ++ mdat ++ moov
    // prefix-only parse honestly fails: moov is past the prefix
    val prefix = file.take(256)
    assert(MediaHeader.parse(prefix).isEmpty)
    // ...but prefix + tail resolves it, even with the tail slice starting
    // mid-mdat at an arbitrary (unknown) alignment
    for (tailLen <- Seq(moov.length, moov.length + 37, 1024)) {
      val tail = file.takeRight(tailLen)
      assert(MediaHeader.parseWithTail(prefix, tail)
        .contains(MediaInfo("mp4", 1280, 720, 0, 0, 2500L)), s"tailLen=$tailLen")
    }
    // a fake "moov" byte-string inside mdat data does not fool the scan:
    // validation requires a walkable mvhd/tkhd inside the candidate box
    val trap = mp4Box("mdat",
      Array.fill[Byte](100)(0) ++ be32(64) ++ t("moov") ++ Array.fill[Byte](200)(0))
    val trapFile = ftyp ++ trap ++ moov
    assert(MediaHeader.parseWithTail(trapFile.take(64), trapFile.takeRight(trap.length + moov.length))
      .contains(MediaInfo("mp4", 1280, 720, 0, 0, 2500L)))
    // tail without any real moov stays honestly unresolved
    assert(MediaHeader.parseWithTail(prefix, mdat.takeRight(512)).isEmpty)
    // a faststart file never needs the tail
    assert(MediaHeader.parseWithTail(mp4Bytes(mvhdV0, Some((640, 360))), null)
      .contains(MediaInfo("mp4", 640, 360, 0, 0, 2500L)))
    // WAV/images pass through untouched
    assert(MediaHeader.parseWithTail(wavBytes, null).exists(_.format == "wav"))
  }

  test("a corrupt undersized mvhd must not read its sibling's bytes as duration") {
    // mvhd declares only 8 payload bytes — fewer than the v0 fields need —
    // and a trak sibling follows INSIDE the buffer. Reads bounded only by
    // b.length would pull the sibling's bytes in as timescale/duration.
    val shortMvhd = mp4Box("mvhd", b(0, 0, 0, 0) ++ be32(0))
    val parsed = MediaHeader.parse(mp4Box("ftyp", t("isom") ++ be32(0)) ++
      mp4Box("moov", shortMvhd ++ mp4Box("trak", tkhd(640, 360))))
    // dimensions still come from the intact trak; duration is unknown, not garbage
    assert(parsed.contains(MediaInfo("mp4", 640, 360, 0, 0, 0L)))
  }

  test("probeHeaders tolerates NULL payloads as ordinary dirty rows") {
    val media = Seq((1L, wavBytes), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
      .select($"doc_id", $"payload",
        struct(org.apache.spark.sql.functions.lit(0).as("width"),
          org.apache.spark.sql.functions.lit(0).as("height"),
          org.apache.spark.sql.functions.lit("x").as("media_type")).as("meta"))
    val probes = Multimodal.probeHeaders(media).collect().sortBy(_.id)
    assert(probes(0).format == "wav")
    assert(probes(1).format == "unknown" && probes(1).nBytes == 0L)
  }

  test("malformed and foreign payloads are rejected, not misparsed") {
    assert(MediaHeader.parse(null).isEmpty)
    assert(MediaHeader.parse("plain text payload".getBytes("UTF-8")).isEmpty)
    // RIFF but not WAVE (an AVI) is not claimed as wav
    assert(MediaHeader.parse(t("RIFF") ++ le32(100) ++ t("AVI ")).isEmpty)
    // WAV with no fmt chunk in the prefix
    assert(MediaHeader.parse(wavBytes.take(12)).isEmpty)
    // box soup without a leading ftyp is not claimed as mp4
    assert(MediaHeader.parse(mp4Box("moov", mvhdV0)).isEmpty)
    // ftyp alone (no moov in the prefix — the non-faststart layout)
    assert(MediaHeader.parse(mp4Box("ftyp", t("isom") ++ be32(0))).isEmpty)
    // a zero-size box cannot loop forever
    assert(MediaHeader.parse(mp4Box("ftyp", t("isom") ++ be32(0)) ++
      be32(3) ++ t("junk")).isEmpty)
  }

  test("media_info SQL function probes binary columns inside codegen") {
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    val png = b(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13) ++ t("IHDR") ++ b(0, 0, 2, 0x80, 0, 0, 1, 0xe0, 8, 6, 0, 0, 0)
    Seq((1L, wavBytes), (2L, png), (3L, "nope".getBytes("UTF-8")))
      .toDF("id", "payload").createOrReplaceTempView("media_lake")
    val rows = spark.sql(
      """SELECT id, coalesce(media_info(payload).format, 'none') AS fmt,
                coalesce(media_info(payload).sample_rate_hz, -1) AS rate,
                coalesce(media_info(payload).duration_ms, -1) AS dur,
                coalesce(media_info(payload).width, -1) AS w
         FROM media_lake ORDER BY id""")
      .as[(Long, String, Int, Long, Int)].collect().toSeq
    assert(rows == Seq((1L, "wav", 44100, 2000L, 0),
      (2L, "png", 0, 0L, 640), (3L, "none", -1, -1L, -1)))
    // container-property predicates work as plain SQL filters
    assert(spark.sql(
      "SELECT count(*) FROM media_lake WHERE media_info(payload).format = 'wav'")
      .head().getLong(0) == 1L)
  }

  test("probeHeaders: mixed lake probes every container through one seam") {
    val png = b(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13) ++ t("IHDR") ++ b(0, 0, 2, 0x80, 0, 0, 1, 0xe0, 8, 6, 0, 0, 0)
    val media = Seq(
      (1L, wavBytes, 0, 0, "audio/declared"),
      (2L, mp4Bytes(mvhdV0, Some((1920, 1080))), 0, 0, "video/declared"),
      (3L, png, 7, 9, "img/declared"),
      (4L, "not media".getBytes("UTF-8"), 7, 9, "img/liar"))
      .toDF("doc_id", "payload", "width", "height", "media_type")
      .select($"doc_id", $"payload",
        struct($"width", $"height", $"media_type").as("meta"))
    val probes = Multimodal.probeHeaders(media).collect().sortBy(_.id)
    assert(probes.map(_.format).toSeq == Seq("wav", "mp4", "png", "unknown"))
    assert(probes(0).channels == 2 && probes(0).sampleRateHz == 44100 &&
      probes(0).durationMs == 2000L)
    assert(probes(1).width == 1920 && probes(1).height == 1080 &&
      probes(1).durationMs == 2500L)
    assert(probes(2).width == 640 && probes(2).height == 480)
    // declared-vs-actual drift is visible: the liar's declared type survives
    assert(probes(3).declaredType == "img/liar" && probes(3).format == "unknown")
  }

  // ── BMP pixel decode (the image half of the decode seam) ─────────────

  test("bmpPixelStats round-trips bmpImage exactly, both row orders") {
    def pix(x: Int, y: Int) = (x * 40 + y, 255 - x * 30, (x + y) * 50 % 256)
    val up = MediaHeader.bmpImage(3, 2, pix)
    val down = MediaHeader.bmpImage(3, 2, pix, topDown = true)
    // same pixel function → identical stats regardless of storage order
    val su = MediaHeader.bmpPixelStats(up).get
    val sd = MediaHeader.bmpPixelStats(down).get
    assert(su == sd)
    assert(su.nPixels == 6)
    // hand sums over pix(x,y) for x∈0..2, y∈0..1
    val ps = for (y <- 0 to 1; x <- 0 to 2) yield pix(x, y)
    assert(su.sumR == ps.map(_._1).sum)
    assert(su.sumG == ps.map(_._2).sum)
    assert(su.sumB == ps.map(_._3).sum)
    assert(su.peakLuma ==
      ps.map(p => 299L * p._1 + 587L * p._2 + 114L * p._3).max)
    // header probe sees the dims (top-down reports |h|)
    assert(MediaHeader.parse(up).contains(MediaInfo("bmp", 3, 2, 0, 0, 0L)))
    assert(MediaHeader.parse(down).contains(MediaInfo("bmp", 3, 2, 0, 0, 0L)))
  }

  test("bmpPixelStats: stride padding, truncation to complete rows, rejects") {
    // width 3 → 9 pixel bytes pad to stride 12: padding must not leak in
    val img = MediaHeader.bmpImage(3, 4, (x, y) => (10, 20, 30))
    assert(img.length == 54 + 12 * 4)
    val s = MediaHeader.bmpPixelStats(img).get
    assert(s.nPixels == 12 && s.sumR == 120 && s.sumG == 240 && s.sumB == 360)
    // a prefix cut mid-row decodes only the complete rows
    val cut = java.util.Arrays.copyOfRange(img, 0, 54 + 12 * 2 + 5)
    val sc = MediaHeader.bmpPixelStats(cut).get
    assert(sc.nPixels == 6)
    // rejects: wrong magic, compressed, 32bpp
    assert(MediaHeader.bmpPixelStats("XXnot a bmp".getBytes("UTF-8")).isEmpty)
    val comp = img.clone(); comp(30) = 1 // BI_RLE8
    assert(MediaHeader.bmpPixelStats(comp).isEmpty)
    val deep = img.clone(); deep(28) = 32
    assert(MediaHeader.bmpPixelStats(deep).isEmpty)
    // ...but the dimension PROBE still reads rejected-depth headers
    assert(MediaHeader.parse(deep).contains(MediaInfo("bmp", 3, 4, 0, 0, 0L)))
  }

  test("pngPixelStats round-trips pngImage through every filter type") {
    def px(x: Int, y: Int) = ((x * 37 + y * 101 + 5) % 256,
      (x * 53 + y * 7 + 90) % 256, (x * 11 + y * 191 + 200) % 256)
    def expected(w: Int, h: Int) = {
      val pts = for (x <- 0 until w; y <- 0 until h) yield px(x, y)
      (pts.size.toLong, pts.map(_._1.toLong).sum, pts.map(_._2.toLong).sum,
        pts.map(_._3.toLong).sum,
        pts.map(p => 299L * p._1 + 587L * p._2 + 114L * p._3).max)
    }
    // each filter type alone (a reconstruction bug in any single
    // predictor path breaks its round trip), then cycling all five
    for (ft <- 0 to 4; alpha <- Seq(false, true)) {
      val img = MediaHeader.pngImage(6, 5, px, filterFor = _ => ft,
        withAlpha = alpha)
      val s = MediaHeader.pngPixelStats(img)
        .getOrElse(fail(s"filter $ft alpha=$alpha did not decode"))
      val (n, r, g, b, peak) = expected(6, 5)
      assert((s.nPixels, s.sumR, s.sumG, s.sumB, s.peakLuma) ==
        ((n, r, g, b, peak)), s"filter $ft alpha=$alpha")
    }
    val cyc = MediaHeader.pngImage(9, 7, px, filterFor = _ % 5)
    val s = MediaHeader.pngPixelStats(cyc).get
    val (n, r, g, b, peak) = expected(9, 7)
    assert((s.nPixels, s.sumR, s.sumG, s.sumB, s.peakLuma) ==
      ((n, r, g, b, peak)))
    // 1x1 and single-row/column edges (no left / no up neighbors)
    for ((w, h) <- Seq((1, 1), (1, 6), (6, 1))) {
      val e = expected(w, h)
      val st = MediaHeader.pngPixelStats(
        MediaHeader.pngImage(w, h, px, filterFor = _ % 5)).get
      assert((st.nPixels, st.sumR, st.sumG, st.sumB, st.peakLuma) == e,
        s"${w}x$h")
    }
  }

  test("G.711 expansion: published anchors, sign symmetry, wav integration") {
    import MediaHeader.{alaw2linear, ulaw2linear}
    // published anchor points of the CCITT/Sun reference tables
    assert(ulaw2linear(0xff) == 0) // positive zero
    assert(ulaw2linear(0x7f) == 0) // negative zero
    assert(ulaw2linear(0x00) == -32124) // largest negative magnitude
    assert(ulaw2linear(0x80) == 32124) // largest positive magnitude
    assert(alaw2linear(0x55) == -8) // smallest negative magnitude
    assert(alaw2linear(0xd5) == 8) // smallest positive magnitude
    assert(alaw2linear(0x2a) == -32256)
    assert(alaw2linear(0xaa) == 32256)
    // sign symmetry: flipping the sign bit negates (zeros stay zero)
    for (c <- 0 until 128) {
      assert(ulaw2linear(c) == -ulaw2linear(c ^ 0x80), s"ulaw $c")
      assert(alaw2linear(c) == -alaw2linear(c ^ 0x80), s"alaw $c")
    }
    // monotone magnitude within the positive half (valid companding)
    val uMags = (0 to 127).map(c => ulaw2linear(0x80 | (127 - c)))
    assert(uMags == uMags.sorted, "ulaw not monotone")
    // wav integration: tag 7 / tag 6 data decodes through wavPcmStats,
    // foreign tags reject
    val codes = Array.tabulate(64)(i => ((i * 37 + 5) % 256).toByte)
    val ul = MediaHeader.wavHeader(1, 8000, codes.length, 7, 8) ++ codes
    val su = MediaHeader.wavPcmStats(ul).getOrElse(fail("ulaw wav no decode"))
    val expectedU = codes.map(c => ulaw2linear(c & 0xff))
    assert(su.nSamples == 64 && su.peak == expectedU.map(math.abs).max &&
      su.sumSquares == expectedU.map(v => v.toLong * v).sum)
    val al = MediaHeader.wavHeader(1, 8000, codes.length, 6, 8) ++ codes
    val sa = MediaHeader.wavPcmStats(al).getOrElse(fail("alaw wav no decode"))
    val expectedA = codes.map(c => alaw2linear(c & 0xff))
    assert(sa.sumSquares == expectedA.map(v => v.toLong * v).sum)
    // IEEE-float tag (3) and mismatched widths reject, not misparse
    val bad = MediaHeader.wavHeader(1, 8000, codes.length, 3, 8) ++ codes
    assert(MediaHeader.wavPcmStats(bad).isEmpty)
    val bad2 = MediaHeader.wavHeader(1, 8000, codes.length, 7, 16) ++ codes
    assert(MediaHeader.wavPcmStats(bad2).isEmpty)
  }

  test("gifPixelStats: LZW round trip, cross-validated against the JDK codec both ways") {
    def palette(i: Int) = ((i * 3 + 40) % 256, (i * 5 + 9) % 256, (i * 7 + 77) % 256)
    def idx(x: Int, y: Int) = (x * 5 + y * 17 + 3) % 256
    def expected(w: Int, h: Int) = {
      val pts = for (x <- 0 until w; y <- 0 until h) yield palette(idx(x, y))
      (pts.size.toLong, pts.map(_._1.toLong).sum, pts.map(_._2.toLong).sum,
        pts.map(_._3.toLong).sum,
        pts.map(p => 299L * p._1 + 587L * p._2 + 114L * p._3).max)
    }
    // big enough to force dictionary growth through several code widths
    for ((w, h) <- Seq((3, 2), (40, 30), (1, 1), (200, 90))) {
      val img = MediaHeader.gifImage(w, h, palette, idx)
      // our decoder agrees with the generative formula
      val s = MediaHeader.gifPixelStats(img).getOrElse(fail(s"${w}x$h no decode"))
      val e = expected(w, h)
      assert((s.nPixels, s.sumR, s.sumG, s.sumB, s.peakLuma) == e, s"${w}x$h")
      // the JDK's independent GIF decoder agrees pixel-for-pixel with the
      // formula — validating OUR ENCODER's LZW (widths, clears, packing)
      val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(img))
      assert(bi.getWidth == w && bi.getHeight == h)
      for (x <- 0 until w; y <- 0 until h) {
        val rgb = bi.getRGB(x, y)
        val (er, eg, eb) = palette(idx(x, y))
        assert(((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff) ==
          ((er, eg, eb)), s"pixel ($x,$y) of ${w}x$h vs JDK")
      }
    }
    // reverse direction: OUR DECODER reads the JDK's encoder output
    val w2 = 37; val h2 = 23
    val src = new java.awt.image.BufferedImage(w2, h2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w2; y <- 0 until h2) {
      val (r, g, b) = palette(idx(x, y))
      src.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "gif", bos))
    val jdkGif = bos.toByteArray
    val s2 = MediaHeader.gifPixelStats(jdkGif)
      .getOrElse(fail("JDK-encoded gif did not decode"))
    val e2 = expected(w2, h2)
    assert((s2.nPixels, s2.sumR, s2.sumG, s2.sumB, s2.peakLuma) == e2,
      "JDK-encoded gif stats diverged")
  }

  test("gif LZW: randomized cross-validation against the JDK decoder") {
    // 20 random (size, palette, pixel-field) draws — every one must
    // decode pixel-identically under javax.imageio AND sum-identically
    // under our reader; catches code-width / clear / KwKwK edge
    // combinations a fixed fixture might miss
    val rnd = new scala.util.Random(4711)
    for (trial <- 1 to 20) {
      val w = 1 + rnd.nextInt(60)
      val h = 1 + rnd.nextInt(40)
      val pr = rnd.nextInt(1000); val pg = rnd.nextInt(1000)
      val pb = rnd.nextInt(1000); val px = rnd.nextInt(1000)
      def palette(i: Int) = ((i * 3 + pr) % 256, (i * 5 + pg) % 256,
        (i * 7 + pb) % 256)
      // low-entropy index fields (mod small k) exercise deep dictionary
      // chains; high-entropy ones exercise clears
      val k = 1 + rnd.nextInt(255)
      def idx(x: Int, y: Int) = (x * 5 + y * 17 + px) % k
      val img = MediaHeader.gifImage(w, h, palette, idx)
      val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(img))
      assert(bi != null && bi.getWidth == w && bi.getHeight == h,
        s"trial $trial ${w}x$h k=$k: JDK reject")
      var sr = 0L; var sg = 0L; var sb = 0L; var peak = 0L
      for (x <- 0 until w; y <- 0 until h) {
        val rgb = bi.getRGB(x, y)
        val (er, eg, eb) = palette(idx(x, y))
        assert(((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff) ==
          ((er, eg, eb)), s"trial $trial pixel ($x,$y)")
        sr += er; sg += eg; sb += eb
        val l = 299L * er + 587L * eg + 114L * eb
        if (l > peak) peak = l
      }
      val s = MediaHeader.gifPixelStats(img).get
      assert((s.nPixels, s.sumR, s.sumG, s.sumB, s.peakLuma) ==
        ((w.toLong * h, sr, sg, sb, peak)), s"trial $trial our-decoder")
    }
  }

  test("gifPixelStats rejects foreign payloads and survives truncation") {
    def palette(i: Int) = (i, 255 - i, (i * 2) % 256)
    val img = MediaHeader.gifImage(20, 20, palette, (x, y) => (x + y) % 256)
    assert(MediaHeader.gifPixelStats(null).isEmpty)
    assert(MediaHeader.gifPixelStats("GIF89a".getBytes("US-ASCII")).isEmpty)
    assert(MediaHeader.gifPixelStats(
      MediaHeader.bmpImage(3, 3, (x, y) => (x, y, 0))).isEmpty)
    // interlace flag is a row permutation of the same pixel multiset —
    // identical stats (the JDK cross-validation feeds real interlaced
    // files through the full path; this pins the flag's invariance alone)
    val inter = img.clone()
    // descriptor: 6 (sig) + 7 (lsd) + 768 (gct) at 0x2c; packed at +9
    val descOff = 6 + 7 + 768
    assert((inter(descOff) & 0xff) == 0x2c)
    inter(descOff + 9) = 0x40.toByte
    assert(MediaHeader.gifPixelStats(inter) == MediaHeader.gifPixelStats(img))
    // truncation: decodes the pixels its bytes reach, never crashes
    for (cut <- Seq(10, 700, descOff + 11, img.length / 2, img.length - 3)) {
      val t = java.util.Arrays.copyOf(img, cut)
      MediaHeader.gifPixelStats(t).foreach(s => assert(s.nPixels <= 400))
    }
  }

  test("pngPixelStats rejects foreign/unsupported payloads, survives truncation") {
    def px(x: Int, y: Int) = (x % 256, y % 256, (x + y) % 256)
    // foreign bytes and other containers → None
    assert(MediaHeader.pngPixelStats(null).isEmpty)
    assert(MediaHeader.pngPixelStats(Array.fill[Byte](40)(7)).isEmpty)
    assert(MediaHeader.pngPixelStats(
      MediaHeader.bmpImage(3, 3, px)).isEmpty)
    // interlaced flag → None (Adam7 is out of the decode contract)
    val img = MediaHeader.pngImage(4, 4, px)
    val interlaced = img.clone()
    // IHDR interlace byte sits at offset 8 (sig) + 8 (len+type) + 12
    interlaced(8 + 8 + 12) = 1
    assert(MediaHeader.pngPixelStats(interlaced).isEmpty)
    // truncation mid-IDAT must not crash: decodes the complete rows the
    // inflated prefix reaches (possibly zero), never garbage
    for (cut <- Seq(8, 33, 60, img.length - 5)) {
      val t = java.util.Arrays.copyOf(img, cut)
      MediaHeader.pngPixelStats(t).foreach { s =>
        assert(s.nPixels <= 16 && s.nPixels % 4 == 0)
      }
    }
  }

  test("FLAC STREAMINFO: bit-field round trip, walked blocks, corrupt bytes") {
    import graft.operators.MediaHeader
    // writer-dual round trip at ordinary and field-boundary values
    for ((rate, ch, bps, total) <- Seq(
        (44100, 2, 16, 123456L),
        ((1 << 20) - 1, 8, 32, (1L << 36) - 1),
        (8000, 1, 4, 0L))) {
      val info = MediaHeader.parse(
        MediaHeader.flacHeader(rate, ch, bps, total)).get
      assert(info.format == "flac" && info.channels == ch &&
        info.sampleRateHz == rate &&
        info.durationMs == total * 1000L / rate)
    }
    // STREAMINFO behind a leading PADDING block still found (tolerant walk)
    val si = MediaHeader.flacHeader(16000, 1, 16, 16000L)
    val padded = si.take(4) ++
      Array[Byte](0x01, 0, 0, 2, 0, 0) ++ // PADDING block, 2 bytes, not last
      si.drop(4)
    val walked = MediaHeader.parse(padded).get
    assert(walked.sampleRateHz == 16000 && walked.durationMs == 1000L)
    // truncated mid-STREAMINFO, zero rate, wrong magic: None, never a crash
    assert(MediaHeader.parse(si.take(20)).isEmpty)
    val zeroRate = si.clone()
    zeroRate(18) = 0; zeroRate(19) = 0
    zeroRate(20) = (zeroRate(20) & 0x0f).toByte
    assert(MediaHeader.parse(zeroRate).isEmpty)
    assert(MediaHeader.parse("fLaX-not-flac".getBytes("US-ASCII")).isEmpty)
  }

  test("MP3 frame walk: writer-dual round trip, ID3 skip, VBR, truncation") {
    import graft.operators.MediaHeader
    // round trip across table rates/bitrates, mono and stereo, with and
    // without an ID3v2 prefix
    for ((rate, kbps, ch, frames, id3) <- Seq(
        (44100, 128, 2, 10, 0), (48000, 320, 1, 5, 37),
        (32000, 32, 2, 1, 200))) {
      val info = MediaHeader.parse(
        MediaHeader.mp3Frames(rate, kbps, ch, frames, id3)).get
      assert(info.format == "mp3" && info.channels == ch &&
        info.sampleRateHz == rate &&
        info.durationMs == frames * 1152000L / rate,
        s"rate=$rate kbps=$kbps")
    }
    // VBR: frames at different bitrates still walk (consistent rate)
    val vbr = MediaHeader.mp3Frames(44100, 128, 2, 3) ++
      MediaHeader.mp3Frames(44100, 320, 2, 2)
    assert(MediaHeader.parse(vbr).get.durationMs == 5L * 1152000L / 44100L)
    // a trailing INCOMPLETE frame is not counted (prefix semantics)
    val five = MediaHeader.mp3Frames(44100, 128, 2, 5)
    val cut = five.dropRight(10)
    assert(MediaHeader.parse(cut).get.durationMs == 4L * 1152000L / 44100L)
    // ID3 whose declared size overruns the prefix: None, never a crash;
    // reserved bitrate (0xF) and rate (3) indexes: None
    val id3Only = MediaHeader.mp3Frames(44100, 128, 2, 1, 50).take(30)
    assert(MediaHeader.parse(id3Only).isEmpty)
    val badBr = MediaHeader.mp3Frames(44100, 128, 2, 1)
    badBr(2) = 0xf0.toByte
    assert(MediaHeader.parse(badBr).isEmpty)
    val badRate = MediaHeader.mp3Frames(44100, 128, 2, 1)
    badRate(2) = (badRate(2) | 0x0c).toByte
    assert(MediaHeader.parse(badRate).isEmpty)
  }

  test("TIFF IFD walk: writer-dual round trip across endianness and " +
    "entry types; corrupt headers reject") {
    import graft.operators.ImageHeader
    for (le <- Seq(true, false); long <- Seq(true, false)) {
      val b = ImageHeader.tiffImage(513, 300, le, long)
      assert(ImageHeader.parse(b)
        .contains(ImageHeader.ImageInfo("tiff", 513, 300)),
        s"le=$le long=$long")
      // flows through MediaHeader.parse with zeroed stream fields
      val m = MediaHeader.parse(b).get
      assert(m.format == "tiff" && m.width == 513 && m.channels == 0)
    }
    // SHORT entries only exist for dims <= 65535; LONG carries more
    val big = ImageHeader.tiffImage(70000, 2, littleEndian = true,
      useLongType = true)
    assert(ImageHeader.parse(big)
      .contains(ImageHeader.ImageInfo("tiff", 70000, 2)))
    // bad magic, IFD offset past the buffer, zero/oversized entry count,
    // and a missing dimension tag: all None, never a throw
    val good = ImageHeader.tiffImage(33, 44, littleEndian = true,
      useLongType = false)
    val badMagic = good.clone(); badMagic(2) = 41
    assert(ImageHeader.parse(badMagic).isEmpty)
    val farIfd = good.clone(); farIfd(4) = 0x7f
    assert(ImageHeader.parse(farIfd).isEmpty)
    val zeroEntries = good.clone(); zeroEntries(8) = 0; zeroEntries(9) = 0
    assert(ImageHeader.parse(zeroEntries).isEmpty)
    // retag width(256) -> 255: width never found
    val noWidth = good.clone(); noWidth(10) = 0xff.toByte; noWidth(11) = 0
    assert(ImageHeader.parse(noWidth).isEmpty)
    // an entry with a RATIONAL(5) dim type is skipped, not misread
    val ratType = good.clone(); ratType(12) = 5
    assert(ImageHeader.parse(ratType).isEmpty)
  }

  test("WebP probe: VP8L bit-packed and VP8 start-code duals round-trip; " +
    "corrupt chunks reject") {
    import graft.operators.ImageHeader
    for (lossless <- Seq(true, false); (w, h) <- Seq((1, 1), (66, 56),
        (16383, 2))) {
      val b = ImageHeader.webpImage(w, h, lossless)
      assert(ImageHeader.parse(b)
        .contains(ImageHeader.ImageInfo("webp", w, h)),
        s"lossless=$lossless ${w}x$h")
    }
    // VP8L's width-1 encoding reaches 16384; VP8's raw field stops at
    // 16383 and the writer REFUSES past it rather than wrapping to 0
    assert(ImageHeader.parse(ImageHeader.webpImage(16384, 16384,
      lossless = true))
      .contains(ImageHeader.ImageInfo("webp", 16384, 16384)))
    intercept[IllegalArgumentException] {
      ImageHeader.webpImage(16384, 2, lossless = false)
    }
    // VP8L with nonzero version bits: reject
    val vl = ImageHeader.webpImage(66, 56, lossless = true)
    vl(24) = (vl(24) | 0xe0).toByte
    assert(ImageHeader.parse(vl).isEmpty)
    // VP8 with a broken start code: reject
    val vp = ImageHeader.webpImage(66, 56, lossless = false)
    vp(23) = 0
    assert(ImageHeader.parse(vp).isEmpty)
    // a WAV (also RIFF) must not be claimed by the webp branch
    val wav = MediaHeader.wavHeader(1, 8000, 16) ++ Array.fill(16)(0.toByte)
    assert(ImageHeader.parse(wav).isEmpty)
    assert(MediaHeader.parse(wav).get.format == "wav")
  }
}
