package graft.operators

/** Public audio/video container header parsing, completing the media-probe
  * family next to [[ImageHeader]] — stream properties straight from the
  * container bytes, no codec library. Formats and the fields read:
  *
  *  - WAV (RIFF, the WAVE form of the Microsoft/IBM RIFF spec): channel
  *    count, sample rate, bits per sample from the `fmt ` chunk; duration
  *    from the `data` chunk size over the byte rate.
  *  - MP4 / ISO base media file format (ISO/IEC 14496-12): movie duration
  *    from `moov/mvhd` (timescale + duration), presentation dimensions
  *    from the first visual `moov/trak/tkhd` (16.16 fixed point). The box
  *    walk recurses only through container boxes (`moov`, `trak`) and
  *    reads fixed offsets inside leaves.
  *
  * Like the image path, parsing touches only the byte PREFIX handed in, so
  * the per-item cost at 100 TB is independent of media size. Caveat that a
  * real lake must respect: an MP4 written without `-movflags faststart`
  * carries `moov` after `mdat` (at the file tail) — probe such files with a
  * tail range-read, or remux; this parser reports what is present in the
  * prefix and returns None rather than guessing.
  *
  * The decode itself (PCM samples, video frames) stays outside this
  * container, exactly as with [[ImageHeader]].
  */
object MediaHeader {

  /** Probed stream properties; fields that a format does not carry are 0.
    * `durationMs` is floor-rounded integer milliseconds.
    */
  case class MediaInfo(format: String, width: Int, height: Int,
                       channels: Int, sampleRateHz: Int, durationMs: Long)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def tag(b: Array[Byte], i: Int): String =
    if (i + 4 > b.length) "" else new String(b, i, 4, "US-ASCII")

  /** WAV: "RIFF" + size + "WAVE", then (id, LE u32 size) chunks. Duration
    * needs both `fmt ` (byte rate) and `data` (payload size); chunks pad
    * to even offsets per the RIFF spec.
    */
  private def wav(b: Array[Byte]): Option[MediaInfo] = {
    if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var i = 12
    var channels = 0; var rate = 0L; var byteRate = 0L; var dataLen = -1L
    while (i + 8 <= b.length && (channels == 0 || dataLen < 0)) {
      val id = tag(b, i)
      val len = le32(b, i + 4)
      if (len > Int.MaxValue - 9) return None // would overflow the cursor
      if (id == "fmt " && i + 24 <= b.length) {
        channels = le16(b, i + 10)
        rate = le32(b, i + 12)
        byteRate = le32(b, i + 16)
      } else if (id == "data") {
        dataLen = len // payload bytes follow; no need to have them in the prefix
      }
      i += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    if (channels <= 0 || rate <= 0 || rate > Int.MaxValue) None
    else {
      val durMs = if (dataLen >= 0 && byteRate > 0) dataLen * 1000L / byteRate else 0L
      Some(MediaInfo("wav", 0, 0, channels, rate.toInt, durMs))
    }
  }

  /** One ISO BMFF box header: (payload start, box end, type). `size==1`
    * means a 64-bit largesize follows the type; `size==0` (box runs to end
    * of file) is clamped to the prefix.
    */
  private def box(b: Array[Byte], i: Int): Option[(Int, Long, String)] = {
    if (i + 8 > b.length) return None
    val size32 = be32(b, i)
    val t = tag(b, i + 4)
    if (size32 == 1) {
      if (i + 16 > b.length) return None
      val size64 = be64(b, i + 8)
      if (size64 < 16) return None
      Some((i + 16, i + size64, t))
    } else if (size32 == 0) Some((i + 8, b.length.toLong, t))
    else if (size32 < 8) None
    else Some((i + 8, i + size32, t))
  }

  /** mvhd: version/flags, then (creation, modification, timescale,
    * duration) — u32s in version 0, u64 times + u32 timescale + u64
    * duration in version 1.
    */
  private def mvhdDurationMs(b: Array[Byte], start: Int, end: Long): Option[Long] = {
    if (start + 4 > b.length) return None
    val version = u8(b, start)
    if (version == 0) {
      if (start + 20 > b.length) return None
      val timescale = be32(b, start + 12)
      val duration = be32(b, start + 16)
      if (timescale <= 0) None else Some(duration * 1000L / timescale)
    } else {
      if (start + 32 > b.length) return None
      val timescale = be32(b, start + 20)
      val duration = be64(b, start + 24)
      if (timescale <= 0) None else Some(duration * 1000L / timescale)
    }
  }

  /** tkhd: width/height live in the LAST 8 bytes of the box as 16.16 fixed
    * point (after version-dependent times, ids, matrix). Audio tracks carry
    * zeros there, which conveniently skips them.
    */
  private def tkhdDims(b: Array[Byte], start: Int, end: Long): Option[(Int, Int)] = {
    if (end - 8 < start || end > b.length) return None
    val w = be32(b, (end - 8).toInt) >> 16
    val h = be32(b, (end - 4).toInt) >> 16
    if (w > 0 && h > 0) Some((w.toInt, h.toInt)) else None
  }

  /** Walk the sibling boxes of `[i, limit)`, recursing into containers. */
  private def mp4Walk(b: Array[Byte], i0: Int, limit: Long,
                      state: (Option[Long], Option[(Int, Int)])):
      (Option[Long], Option[(Int, Int)]) = {
    var i = i0
    var s = state
    while (i + 8 <= math.min(limit, b.length.toLong) &&
        (s._1.isEmpty || s._2.isEmpty)) {
      box(b, i) match {
        case None => return s
        case Some((payload, end, t)) =>
          val clampedEnd = math.min(end, b.length.toLong)
          t match {
            case "moov" | "trak" => s = mp4Walk(b, payload, clampedEnd, s)
            case "mvhd" if s._1.isEmpty =>
              s = (mvhdDurationMs(b, payload, clampedEnd), s._2)
            case "tkhd" if s._2.isEmpty =>
              s = (s._1, tkhdDims(b, payload, clampedEnd))
            case _ => ()
          }
          if (end <= i || end > Int.MaxValue) return s // malformed / past prefix
          i = end.toInt
      }
    }
    s
  }

  /** MP4/ISO BMFF: requires a leading `ftyp` box (the brand signature),
    * then walks top-level boxes for `moov`.
    */
  private def mp4(b: Array[Byte]): Option[MediaInfo] = {
    if (b.length < 12) return None
    val first = box(b, 0)
    if (!first.exists(_._3 == "ftyp")) return None
    val (durOpt, dimsOpt) = mp4Walk(b, 0, b.length.toLong, (None, None))
    if (durOpt.isEmpty && dimsOpt.isEmpty) None
    else {
      val (w, h) = dimsOpt.getOrElse((0, 0))
      Some(MediaInfo("mp4", w, h, 0, 0, durOpt.getOrElse(0L)))
    }
  }

  /** Parse the payload prefix as any supported public container: images
    * (via [[ImageHeader]], duration/channels 0), WAV, or MP4.
    */
  def parse(bytes: Array[Byte]): Option[MediaInfo] =
    if (bytes == null) None
    else ImageHeader.parse(bytes)
      .map(i => MediaInfo(i.format, i.width, i.height, 0, 0, 0L))
      .orElse(wav(bytes))
      .orElse(mp4(bytes))

  /** Encode a canonical 44-byte PCM WAV header declaring `dataLen` payload
    * bytes — the writer dual of [[parse]]'s WAV reader (16-bit samples).
    * Used to synthesize deterministic audio lakes in tests/fixtures; a
    * real encoder would append the PCM data after it.
    */
  def wavHeader(channels: Int, sampleRateHz: Int, dataLen: Int): Array[Byte] = {
    require(channels > 0 && sampleRateHz > 0 && dataLen >= 0,
      s"bad wav params: channels=$channels rate=$sampleRateHz dataLen=$dataLen")
    val blockAlign = channels * 2
    val byteRate = sampleRateHz.toLong * blockAlign
    val out = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRateHz)
      .putInt(byteRate.toInt).putShort(blockAlign.toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    out.array()
  }
}
