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
  * the per-item cost at 100 TB is independent of media size. An MP4
  * written without `-movflags faststart` carries `moov` after `mdat` (at
  * the file tail) — [[parse]] reports what is present in the prefix and
  * returns None rather than guessing; [[parseWithTail]] accepts a second
  * tail range-read and resolves exactly those files.
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

  import ByteReaders._

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
      if (id == "fmt " && i + 24 <= b.length) {
        channels = le16(b, i + 10)
        rate = le32(b, i + 12)
        byteRate = le32(b, i + 16)
      } else if (id == "data") {
        dataLen = len // payload bytes follow; no need to have them in the prefix
      }
      if (channels == 0 || dataLen < 0) {
        // Long cursor arithmetic: a crafted chunk size near u32 max would
        // otherwise wrap the Int cursor negative and crash the tag read.
        // Only bail when the parse still NEEDS to advance — a huge final
        // data chunk on an already-satisfied parse is a valid large WAV.
        val next = i.toLong + 8L + len + (len & 1L) // chunks are word-aligned
        if (next > Int.MaxValue) return None
        i = next.toInt
      } else i = b.length // both chunks found: exit via the loop condition
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
    * duration in version 1. The all-ones duration is the ISO 14496-12
    * "unknown duration" sentinel (fragmented/live files) — reported as
    * unknown, not as a huge (v0) or negative (v1) value.
    */
  private def mvhdDurationMs(b: Array[Byte], start: Int, end: Long): Option[Long] = {
    if (start + 4 > b.length || start + 4L > end) return None
    val version = u8(b, start)
    // bound every read by the box's own declared end too: a corrupt mvhd
    // whose size is smaller than the fields read must not pull its sibling
    // box's bytes in as timescale/duration
    val (timescale, duration) =
      if (version == 0) {
        if (start + 20 > b.length || start + 20L > end) return None
        (be32(b, start + 12), be32(b, start + 16))
      } else {
        if (start + 32 > b.length || start + 32L > end) return None
        (be32(b, start + 20), be64(b, start + 24))
      }
    val unknown = if (version == 0) 0xffffffffL else -1L // all ones per width
    if (timescale <= 0 || duration == unknown || duration < 0) None
    else Some(duration * 1000L / timescale)
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

  /** Walk the sibling boxes of `[i, limit)`, recursing into containers.
    * `depth` bounds the recursion: real files nest moov/trak 2-3 deep, and
    * an unbounded walk over crafted nested container headers would
    * otherwise overflow the stack (StackOverflowError is unrecoverable in
    * a task). Leaves receive the box's UNCLAMPED end so their own
    * `end > b.length` truncation guards fire — clamping here would make a
    * prefix-truncated tkhd read garbage trailing bytes as dimensions.
    */
  private def mp4Walk(b: Array[Byte], i0: Int, limit: Long, depth: Int,
                      state: (Option[Long], Option[(Int, Int)])):
      (Option[Long], Option[(Int, Int)]) = {
    if (depth <= 0) return state
    var i = i0
    var s = state
    while (i + 8 <= math.min(limit, b.length.toLong) &&
        (s._1.isEmpty || s._2.isEmpty)) {
      box(b, i) match {
        case None => return s
        case Some((payload, end, t)) =>
          t match {
            case "moov" | "trak" =>
              s = mp4Walk(b, payload, math.min(end, b.length.toLong), depth - 1, s)
            case "mvhd" if s._1.isEmpty =>
              s = (mvhdDurationMs(b, payload, end), s._2)
            case "tkhd" if s._2.isEmpty =>
              s = (s._1, tkhdDims(b, payload, end))
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
    val (durOpt, dimsOpt) = mp4Walk(b, 0, b.length.toLong, depth = 8, (None, None))
    if (durOpt.isEmpty && dimsOpt.isEmpty) None
    else {
      val (w, h) = dimsOpt.getOrElse((0, 0))
      Some(MediaInfo("mp4", w, h, 0, 0, durOpt.getOrElse(0L)))
    }
  }

  /** FLAC: "fLaC" magic, then metadata blocks (1-byte last-flag+type,
    * u24 big-endian length). STREAMINFO (type 0, 34 bytes, xiph.org FLAC
    * format §METADATA_BLOCK_STREAMINFO) bit-packs the stream parameters:
    * after min/max block size (u16×2) and min/max frame size (u24×2) come
    * 20 bits sample rate, 3 bits channels−1, 5 bits bits-per-sample−1 and
    * a 36-bit total-sample count — unpacked here with explicit shifts (a
    * real bit-field decode, not a fixed-offset read). Walks past leading
    * non-STREAMINFO blocks (spec requires STREAMINFO first; tolerate
    * writers that don't) and returns None on truncation or a zero rate.
    */
  private def flac(b: Array[Byte]): Option[MediaInfo] = {
    if (b.length < 8 || tag(b, 0) != "fLaC") return None
    var i = 4
    while (i + 4 <= b.length) {
      val head = u8(b, i)
      val last = (head & 0x80) != 0
      val btype = head & 0x7f
      val len = (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
      if (btype == 0) {
        val s = i + 4
        if (len < 18 || s + 18 > b.length) return None
        val rate = (u8(b, s + 10) << 12) | (u8(b, s + 11) << 4) |
          (u8(b, s + 12) >> 4)
        val channels = ((u8(b, s + 12) >> 1) & 0x7) + 1
        val totalSamples = ((u8(b, s + 13) & 0x0f).toLong << 32) |
          be32(b, s + 14)
        if (rate <= 0) return None
        val durMs = totalSamples * 1000L / rate
        return Some(MediaInfo("flac", 0, 0, channels, rate, durMs))
      }
      if (last) return None
      val next = i.toLong + 4L + len
      if (next > Int.MaxValue) return None
      i = next.toInt
    }
    None
  }

  /** MPEG-1 Layer III sample-rate table (header rate index 0..2; 3 is
    * reserved) and bitrate table in kbps (header bitrate index 1..14; 0
    * is "free", 15 forbidden) — ISO/IEC 11172-3 §2.4.2.3.
    */
  private[operators] val Mp3Rates = Array(44100, 48000, 32000)
  private[operators] val Mp3BitratesKbps =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MP3 (MPEG-1 Layer III): an optional ID3v2 tag (the "ID3" container
    * real files lead with — 10-byte header, 28-bit SYNCSAFE size, skipped
    * whole), then a FRAME WALK: each frame's 4-byte header carries sync
    * (11 set bits), version/layer bits, bitrate index, sample-rate index
    * and padding, from which the frame length is 144000·kbps/rate +
    * padding — the walk hops header to header, counting only COMPLETE
    * frames in the prefix (the honest prefix semantics of the WAV PCM
    * decoder), tolerating per-frame bitrate changes (VBR) but requiring a
    * consistent version/layer/rate. Duration is frames·1152/rate (the
    * fixed MPEG-1 Layer III samples-per-frame), channels from the mode
    * field (mono vs everything else). None on no valid first frame, a
    * reserved rate/bitrate index, or an ID3 size past the prefix.
    */
  private def mp3(b: Array[Byte]): Option[MediaInfo] = {
    if (b == null || b.length < 4) return None
    var i = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      // syncsafe u28: four 7-bit bytes, high bit must be clear
      if ((u8(b, 6) | u8(b, 7) | u8(b, 8) | u8(b, 9)) >= 0x80) return None
      val size = (u8(b, 6) << 21) | (u8(b, 7) << 14) | (u8(b, 8) << 7) | u8(b, 9)
      val next = 10L + size
      if (next + 4 > b.length) return None
      i = next.toInt
    }
    def header(p: Int): Option[(Int, Int, Int, Int)] = {
      if (p + 4 > b.length) return None
      if (u8(b, p) != 0xff || (u8(b, p + 1) & 0xe0) != 0xe0) return None
      val version = (u8(b, p + 1) >> 3) & 0x3
      val layer = (u8(b, p + 1) >> 1) & 0x3
      if (version != 3 || layer != 1) return None // MPEG-1 Layer III only
      val brIdx = (u8(b, p + 2) >> 4) & 0xf
      val rateIdx = (u8(b, p + 2) >> 2) & 0x3
      if (brIdx < 1 || brIdx > 14 || rateIdx > 2) return None
      val padding = (u8(b, p + 2) >> 1) & 0x1
      val mode = (u8(b, p + 3) >> 6) & 0x3
      Some((brIdx, rateIdx, padding, mode))
    }
    val first = header(i).getOrElse(return None)
    val rate = Mp3Rates(first._2)
    val channels = if (first._4 == 3) 1 else 2
    var frames = 0L
    var p = i
    var walking = true
    while (walking) {
      header(p) match {
        case Some((br, r, pad, _)) if r == first._2 =>
          val len = 144000L * Mp3BitratesKbps(br) / rate + pad
          if (p + len > b.length) walking = false // incomplete last frame
          else { frames += 1; p += len.toInt }
        case _ => walking = false
      }
    }
    if (frames == 0) return None
    Some(MediaInfo("mp3", 0, 0, channels, rate, frames * 1152000L / rate))
  }

  /** Parse the payload prefix as any supported public container: images
    * (via [[ImageHeader]], duration/channels 0), WAV, FLAC, MP3, or MP4.
    */
  def parse(bytes: Array[Byte]): Option[MediaInfo] =
    if (bytes == null) None
    else ImageHeader.parse(bytes)
      .map(i => MediaInfo(i.format, i.width, i.height, 0, 0, 0L))
      .orElse(wav(bytes))
      .orElse(flac(bytes))
      .orElse(mp3(bytes))
      .orElse(mp4(bytes))

  /** Locate a complete `moov` box inside a tail slice whose absolute file
    * offset is unknown (the slice may start mid-`mdat`): scan for the box
    * type fourcc, validate the candidate's size header fits the slice, and
    * accept only if walking it actually yields mvhd/tkhd content — a
    * random "moov" byte-string inside media data fails that validation and
    * the scan continues.
    */
  private def findMoovInTail(tail: Array[Byte]): Option[MediaInfo] = {
    if (tail == null) return None
    var p = 4
    while (p + 4 <= tail.length) {
      if (tail(p) == 'm' && tail(p + 1) == 'o' && tail(p + 2) == 'o' &&
          tail(p + 3) == 'v') {
        box(tail, p - 4) match {
          case Some((payload, end, "moov")) if end <= tail.length =>
            val (dur, dims) = mp4Walk(tail, payload, end, depth = 7, (None, None))
            if (dur.nonEmpty || dims.nonEmpty) {
              val (w, h) = dims.getOrElse((0, 0))
              return Some(MediaInfo("mp4", w, h, 0, 0, dur.getOrElse(0L)))
            }
          case _ => ()
        }
      }
      p += 1
    }
    None
  }

  /** Two-range probe for the commonest real-world MP4 layout: a file
    * written without `-movflags faststart` carries `moov` AFTER `mdat`, at
    * the file tail — a prefix read sees only `ftyp` + `mdat` and [[parse]]
    * honestly returns None. Handing in a tail range-read as well (the
    * object-store pattern: GET bytes=0..N and bytes=-N..) resolves those
    * files without remuxing: the prefix identifies the container, the tail
    * supplies the movie header. Prefix-resolvable payloads never consult
    * the tail, so faststart files cost one range-read as before.
    */
  def parseWithTail(prefix: Array[Byte], tail: Array[Byte]): Option[MediaInfo] = {
    val head = parse(prefix)
    val isMp4Ftyp = prefix != null && prefix.length >= 12 &&
      box(prefix, 0).exists(_._3 == "ftyp")
    head match {
      // an MP4 whose prefix yielded nothing beyond the brand: try the tail
      case None if isMp4Ftyp => findMoovInTail(tail)
      case Some(info) if info.format == "mp4" && info.durationMs == 0 &&
          info.width == 0 && info.height == 0 => findMoovInTail(tail).orElse(head)
      case other => other
    }
  }

  /** Decoded PCM sample statistics: count, peak |amplitude|, full-scale
    * clip count, and the exact integer sum of squares (the RMS numerator —
    * kept integral so downstream math is engine-exact).
    */
  case class PcmStats(nSamples: Long, peak: Int, clipped: Long, sumSquares: Long)

  /** G.711 µ-law expansion (the CCITT/Sun reference formula — public):
    * one companded byte → a linear 16-bit sample.
    */
  def ulaw2linear(code: Int): Int = {
    val u = ~code & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** G.711 A-law expansion (the CCITT/Sun reference formula — public). */
  def alaw2linear(code: Int): Int = {
    val a = (code ^ 0x55) & 0xff
    var t = (a & 0x0f) << 4
    val seg = (a & 0x70) >> 4
    if (seg == 0) t += 8
    else { t += 0x108; if (seg > 1) t <<= seg - 1 }
    if ((a & 0x80) != 0) t else -t
  }

  /** REAL payload decode for WAV: walk the RIFF chunks to `data` and fold
    * the samples actually PRESENT in the buffer into [[PcmStats]] — no
    * codec library, just the sample layout the `fmt ` chunk declares:
    * PCM (tag 1, 16-bit little-endian) or the G.711 telephony codings
    * (tag 6 A-law / tag 7 µ-law, 8-bit bytes expanded through the public
    * CCITT reference formulas). This is the decode step
    * [[graft.operators.Multimodal]] previously stubbed: the samples
    * themselves are read, not only the container header.
    *
    * Samples are whatever portion of the declared `data` chunk the buffer
    * holds (a prefix-read of a long file decodes the prefix's samples);
    * stats cover all channels interleaved. Returns None for non-WAV
    * payloads, undecoded format tags, mismatched bit depths, or when
    * `data` is absent.
    */
  def wavPcmStats(b: Array[Byte]): Option[PcmStats] = {
    if (b == null || b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
      return None
    var i = 12
    var fmtTag = -1
    while (i + 8 <= b.length) {
      val id = tag(b, i)
      val len = le32(b, i + 4)
      if (id == "fmt " && i + 24 <= b.length) {
        // format tag at chunk offset 0; bits/sample at offset 14
        val t = le16(b, i + 8)
        val bits = le16(b, i + 22)
        fmtTag =
          if (t == 1 && bits == 16) 1
          else if (t == 6 && bits == 8) 6
          else if (t == 7 && bits == 8) 7
          else -1
      } else if (id == "data") {
        if (fmtTag < 0) return None
        val start = i + 8
        val avail = math.min(len, (b.length - start).toLong).toInt
        val n = if (fmtTag == 1) avail / 2 else avail
        var peak = 0; var clipped = 0L; var sumSq = 0L
        var j = 0
        while (j < n) {
          val v = fmtTag match {
            case 1 =>
              val o = start + 2 * j
              ((b(o) & 0xff) | (b(o + 1) << 8)).toShort.toInt
            case 6 => alaw2linear(b(start + j) & 0xff)
            case _ => ulaw2linear(b(start + j) & 0xff)
          }
          val a = math.abs(v)
          if (a > peak) peak = a
          if (v >= 32767 || v <= -32768) clipped += 1
          sumSq += v.toLong * v
          j += 1
        }
        return Some(PcmStats(n.toLong, peak, clipped, sumSq))
      }
      val next = i.toLong + 8L + len + (len & 1L)
      if (next > Int.MaxValue) return None
      i = next.toInt
    }
    None
  }

  /** Decoded pixel statistics: count, exact per-channel integer sums, and
    * the peak integer luminance (ITU-R BT.601 weights ×1000:
    * `299·R + 587·G + 114·B`, range 0..255000) — all integral so
    * downstream math is engine-exact.
    */
  case class PixelStats(nPixels: Long, sumR: Long, sumG: Long, sumB: Long,
                        peakLuma: Long)

  /** REAL payload decode for uncompressed 24-bit BMP: read the pixel array
    * the headers declare (BGR byte order, 4-byte-padded row stride,
    * bottom-up or top-down) and fold every pixel into [[PixelStats]] — no
    * codec library; the image sibling of [[wavPcmStats]], closing the
    * pixel half of the decode seam. Only COMPLETE rows present in the
    * buffer are decoded (a prefix-read of a long file decodes its full
    * rows; channel sums and the luma peak are row-order-invariant, so
    * bottom-up and top-down files with the same pixels agree). Returns
    * None for non-BMP, compressed, or non-24bpp payloads.
    */
  def bmpPixelStats(b: Array[Byte]): Option[PixelStats] = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    if (le32(b, 14) < 40) return None
    val w = le32(b, 18).toInt
    val hRaw = le32(b, 22).toInt
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (w <= 0 || hRaw == 0 || hRaw == Int.MinValue) return None
    if (bpp != 24 || compression != 0) return None
    val h = math.abs(hRaw)
    val off = le32(b, 10)
    if (off < 54 || off > b.length) return None
    val stride = ((w * 3 + 3) / 4) * 4
    val fullRows = math.min(h.toLong,
      (b.length - off) / stride).toInt.max(0)
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var peak = 0L
    var r = 0
    while (r < fullRows) {
      var x = 0
      val rowStart = off.toInt + r * stride
      while (x < w) {
        val o = rowStart + 3 * x
        val bb = u8(b, o).toLong
        val gg = u8(b, o + 1).toLong
        val rr = u8(b, o + 2).toLong
        sumB += bb; sumG += gg; sumR += rr
        val luma = 299L * rr + 587L * gg + 114L * bb
        if (luma > peak) peak = luma
        x += 1
      }
      r += 1
    }
    Some(PixelStats(fullRows.toLong * w, sumR, sumG, sumB, peak))
  }

  /** Encode a complete uncompressed 24-bit BMP — the writer dual of
    * [[bmpPixelStats]] (BGR bytes, padded stride, bottom-up storage unless
    * `topDown`). `pixel(x, y)` returns (r, g, b) with y = 0 the TOP row in
    * both storage orders, so the same function yields pixel-identical
    * images either way (spec-pinned).
    */
  def bmpImage(width: Int, height: Int,
               pixel: (Int, Int) => (Int, Int, Int),
               topDown: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad bmp dims ${width}x$height")
    val stride = ((width * 3 + 3) / 4) * 4
    val dataLen = stride * height
    val out = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54)
      .putInt(40).putInt(width).putInt(if (topDown) -height else height)
      .putShort(1).putShort(24).putInt(0).putInt(dataLen)
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 DPI, no palette
    var row = 0
    while (row < height) {
      // storage row `row` holds image row y: bottom-up stores the bottom
      // image row first
      val y = if (topDown) row else height - 1 - row
      var x = 0
      while (x < width) {
        val (r, g, bl) = pixel(x, y)
        out.put((bl & 0xff).toByte).put((g & 0xff).toByte).put((r & 0xff).toByte)
        x += 1
      }
      var pad = stride - 3 * width
      while (pad > 0) { out.put(0.toByte); pad -= 1 }
      row += 1
    }
    out.array()
  }

  /** REAL payload decode for PNG — the compressed-image sibling of
    * [[bmpPixelStats]], closing real decode for the commonest web-corpus
    * format using only public JDK primitives: chunk walk → IDAT
    * concatenation → `java.util.zip.Inflater` → per-row filter
    * reconstruction (None/Sub/Up/Average/Paeth, the five PNG filter
    * types) → [[PixelStats]] fold. Supports the dominant web shapes:
    * 8-bit truecolor (color type 2) and truecolor+alpha (6, alpha
    * excluded from the channel sums), non-interlaced. Only COMPLETE
    * reconstructed rows are folded (a truncated IDAT decodes the rows its
    * bytes reach — the [[bmpPixelStats]] prefix contract). Returns None
    * for non-PNG signatures, other color types/bit depths, or interlaced
    * images.
    */
  def pngPixelStats(b: Array[Byte]): Option[PixelStats] = {
    if (b == null || b.length < 8) return None
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    var s = 0
    while (s < 8) { if ((b(s) & 0xff) != sig(s)) return None; s += 1 }
    def be32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    var w = 0; var h = 0; var bpp = 0
    var haveIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var done = false
    while (!done && i + 8 <= b.length) {
      val len = be32(i)
      if (len < 0 || len > Int.MaxValue - 12) return None
      val typ = new String(b, i + 4, 4, "US-ASCII")
      val dataStart = i + 8
      val avail = math.min(len, (b.length - dataStart).toLong).toInt
      typ match {
        case "IHDR" =>
          if (avail < 13) return None
          w = be32(dataStart).toInt
          h = be32(dataStart + 4).toInt
          val bitDepth = b(dataStart + 8) & 0xff
          val colorType = b(dataStart + 9) & 0xff
          val interlace = b(dataStart + 12) & 0xff
          if (w <= 0 || h <= 0 || bitDepth != 8 || interlace != 0) return None
          bpp = colorType match {
            case 2 => 3
            case 6 => 4
            case _ => return None
          }
          haveIhdr = true
        case "IDAT" => idat.write(b, dataStart, avail)
        case "IEND" => done = true
        case _ => () // ancillary chunks carry no pixels
      }
      i = dataStart + avail + 4 // skip CRC (trust the container in a lake)
      if (avail.toLong < len) done = true // truncated read: stop the walk
    }
    if (!haveIhdr) return None
    val rowLen = 1 + w * bpp
    // inflate what the buffer holds (a truncated stream yields a prefix)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val raw = new Array[Byte](rowLen * h)
    var got = 0
    try {
      var n = -1
      while (n != 0 && got < raw.length && !inf.finished()) {
        n = try inf.inflate(raw, got, raw.length - got)
        catch { case _: java.util.zip.DataFormatException => 0 }
        got += n
      }
    } finally inf.end()
    val fullRows = got / rowLen
    // filter reconstruction: cur[i] = raw + predictor(left, up, upleft)
    val prev = new Array[Int](w * bpp)
    val cur = new Array[Int](w * bpp)
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var peak = 0L
    var r = 0
    while (r < fullRows) {
      val rowStart = r * rowLen
      val ft = raw(rowStart) & 0xff
      if (ft > 4) return None // invalid filter type: corrupt stream
      var x = 0
      while (x < w * bpp) {
        val v = raw(rowStart + 1 + x) & 0xff
        val a = if (x >= bpp) cur(x - bpp) else 0
        val up = prev(x)
        val c = if (x >= bpp) prev(x - bpp) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => up
          case 3 => (a + up) / 2
          case 4 =>
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
        }
        cur(x) = (v + pred) & 0xff
        x += 1
      }
      var px = 0
      while (px < w) {
        val o = px * bpp
        val rr = cur(o).toLong; val gg = cur(o + 1).toLong
        val bb2 = cur(o + 2).toLong
        sumR += rr; sumG += gg; sumB += bb2
        val luma = 299L * rr + 587L * gg + 114L * bb2
        if (luma > peak) peak = luma
        px += 1
      }
      System.arraycopy(cur, 0, prev, 0, w * bpp)
      r += 1
    }
    Some(PixelStats(fullRows.toLong * w, sumR, sumG, sumB, peak))
  }

  /** Encode a complete PNG — the writer dual of [[pngPixelStats]].
    * `filterFor(y)` picks each row's filter type (0..4), so fixtures can
    * exercise every reconstruction path; `withAlpha` writes color type 6
    * (alpha = 255·, ignored by the reader's sums). The encode applies the
    * chosen filter EXACTLY per the spec (subtract predictor mod 256), so
    * any reconstruction bug in the reader breaks the round trip loudly.
    */
  def pngImage(width: Int, height: Int,
               pixel: (Int, Int) => (Int, Int, Int),
               filterFor: Int => Int = _ % 5,
               withAlpha: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad png dims ${width}x$height")
    val bpp = if (withAlpha) 4 else 3
    val rowLen = 1 + width * bpp
    val raw = new Array[Byte](rowLen * height)
    val prev = new Array[Int](width * bpp)
    val cur = new Array[Int](width * bpp)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        val o = x * bpp
        cur(o) = r & 0xff; cur(o + 1) = g & 0xff; cur(o + 2) = b & 0xff
        if (withAlpha) cur(o + 3) = 0xff
        x += 1
      }
      val ft = filterFor(y)
      require(ft >= 0 && ft <= 4, s"bad filter type $ft")
      raw(y * rowLen) = ft.toByte
      var i = 0
      while (i < width * bpp) {
        val a = if (i >= bpp) cur(i - bpp) else 0
        val up = prev(i)
        val c = if (i >= bpp) prev(i - bpp) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => up
          case 3 => (a + up) / 2
          case 4 =>
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
        }
        raw(y * rowLen + 1 + i) = ((cur(i) - pred) & 0xff).toByte
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, width * bpp)
      y += 1
    }
    // deflate the filtered scanlines
    val def_ = new java.util.zip.Deflater()
    def_.setInput(raw); def_.finish()
    val zBuf = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](8192)
    while (!def_.finished()) zBuf.write(chunk, 0, def_.deflate(chunk))
    def_.end()
    val z = zBuf.toByteArray
    val out = java.nio.ByteBuffer.allocate(8 + 25 + (12 + z.length) + 12)
    out.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def putChunk(typ: String, data: Array[Byte]): Unit = {
      out.putInt(data.length)
      val tb = typ.getBytes("US-ASCII")
      out.put(tb).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.putInt(crc.getValue.toInt)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put((if (withAlpha) 6 else 2).toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    putChunk("IHDR", ihdr.array())
    putChunk("IDAT", z)
    putChunk("IEND", Array.empty[Byte])
    out.array()
  }

  /** REAL payload decode for GIF — the palette-indexed sibling of
    * [[pngPixelStats]], using no library at all: header + logical screen
    * descriptor + global color table walk, extension skip, then the GIF
    * variant of LZW (variable code width from the image's min-code-size,
    * LSB-first bit packing across sub-blocks, Clear/End codes, 12-bit
    * dictionary cap) decodes the pixel indices, which map through the
    * color table into [[PixelStats]]. First image frame only (animated
    * GIFs report their first frame — the thumbnail/card contract);
    * local color tables override the global one. Interlaced images
    * decode too: GIF interlacing is a ROW PERMUTATION of the identical
    * pixel multiset, and every statistic folded here is order-invariant
    * (the JDK's own GIF writer emits interlaced files, which the spec
    * cross-validates against). Truncated streams fold the complete
    * pixels their bytes reach.
    */
  def gifPixelStats(b: Array[Byte]): Option[PixelStats] = {
    if (b == null || b.length < 13) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    val packed = b(10) & 0xff
    var i = 13
    var gctSize = 0
    var gctOff = -1
    if ((packed & 0x80) != 0) {
      gctSize = 2 << (packed & 7)
      gctOff = 13
      i = 13 + 3 * gctSize
    }
    // walk blocks to the first image descriptor
    while (i < b.length) {
      (b(i) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          i += 2
          while (i < b.length && (b(i) & 0xff) != 0) i += 1 + (b(i) & 0xff)
          i += 1
        case 0x2c => // image descriptor
          if (i + 10 > b.length) return None
          val w = u16(i + 5); val h = u16(i + 7)
          val ip = b(i + 9) & 0xff
          if (w <= 0 || h <= 0 || w.toLong * h > Int.MaxValue) return None
          // interlace (ip bit 0x40) is a row permutation — stats-invariant
          var ctOff = gctOff; var ctSize = gctSize
          var j = i + 10
          if ((ip & 0x80) != 0) {
            ctSize = 2 << (ip & 7); ctOff = j; j += 3 * ctSize
          }
          if (ctOff < 0 || ctOff + 3 * ctSize > b.length) return None
          if (j >= b.length) return None
          val minCode = b(j) & 0xff
          if (minCode < 2 || minCode > 8) return None
          // concatenate the LZW sub-blocks present in the buffer
          val data = new java.io.ByteArrayOutputStream()
          var p = j + 1
          var open = true
          while (open && p < b.length) {
            val len = b(p) & 0xff
            if (len == 0) open = false
            else {
              val avail = math.min(len, b.length - p - 1)
              data.write(b, p + 1, avail)
              p += 1 + len
            }
          }
          val indices = lzwDecode(data.toByteArray, minCode,
            maxPixels = w.toLong * h)
          var sumR = 0L; var sumG = 0L; var sumB = 0L; var peak = 0L
          var n = 0L
          indices.foreach { idx =>
            if (idx < ctSize) {
              val o = ctOff + 3 * idx
              val rr = u8(b, o).toLong
              val gg = u8(b, o + 1).toLong
              val bb2 = u8(b, o + 2).toLong
              sumR += rr; sumG += gg; sumB += bb2
              val luma = 299L * rr + 587L * gg + 114L * bb2
              if (luma > peak) peak = luma
              n += 1
            }
          }
          return Some(PixelStats(n, sumR, sumG, sumB, peak))
        case 0x3b => return None // trailer before any image
        case _ => return None // corrupt block stream
      }
    }
    None
  }

  /** GIF-variant LZW decode (public algorithm): variable code width
    * starting at `minCode + 1`, LSB-first bits, Clear resets the
    * dictionary, End stops, width grows when the dictionary fills its
    * current code space (12-bit cap). Decodes at most `maxPixels` indices
    * (a corrupt stream cannot balloon) and stops cleanly on truncation.
    */
  private def lzwDecode(data: Array[Byte], minCode: Int,
                        maxPixels: Long): Iterator[Int] = {
    val out = new java.io.ByteArrayOutputStream()
    val clear = 1 << minCode
    val end = clear + 1
    // dictionary entries as (prefix code, appended index); roots implicit
    val prefix = new Array[Int](4096)
    val append = new Array[Int](4096)
    var dictSize = end + 1
    var width = minCode + 1
    var prev = -1
    var acc = 0L; var bits = 0; var pos = 0
    val buf = new Array[Byte](4096)
    def emit(code: Int): Int = { // writes the code's string, returns its FIRST index
      var c = code; var n = 0
      while (c >= clear + 2) { buf(n) = append(c).toByte; n += 1; c = prefix(c) }
      buf(n) = c.toByte; n += 1
      var k = n - 1
      while (k >= 0) { out.write(buf(k) & 0xff); k -= 1 }
      c
    }
    var done = false
    while (!done && out.size() < maxPixels) {
      while (bits < width && pos < data.length) {
        acc |= (data(pos) & 0xffL) << bits; bits += 8; pos += 1
      }
      if (bits < width) done = true // truncated stream: stop cleanly
      else {
        val code = (acc & ((1 << width) - 1)).toInt
        acc >>>= width; bits -= width
        if (code == clear) {
          dictSize = end + 1; width = minCode + 1; prev = -1
        } else if (code == end) done = true
        else if (prev == -1) {
          if (code >= clear) done = true // first code must be a root
          else { out.write(code); prev = code }
        } else if (code < dictSize || code == dictSize) {
          val first =
            if (code == dictSize) { // the KwKwK case
              val f = emitFirst(prefix, append, clear, prev)
              emit(prev); out.write(f); f
            } else emit(code)
          if (dictSize < 4096) {
            prefix(dictSize) = prev; append(dictSize) = first
            dictSize += 1
            if (dictSize == (1 << width) && width < 12) width += 1
          }
          prev = code
        } else done = true // corrupt code
      }
    }
    val bytes = out.toByteArray
    if (bytes.length > maxPixels) bytes.iterator.take(maxPixels.toInt).map(_ & 0xff)
    else bytes.iterator.map(_ & 0xff)
  }

  /** First pixel index of a dictionary code's expansion. */
  private def emitFirst(prefix: Array[Int], append: Array[Int],
                        clear: Int, code: Int): Int = {
    var c = code
    while (c >= clear + 2) c = prefix(c)
    c
  }

  /** Encode a complete non-interlaced GIF89a with a full 256-color global
    * palette — the writer dual of [[gifPixelStats]]: real LZW compression
    * (dictionary up to 4096 entries, Clear emitted when full, variable
    * code width, LSB-first packing, 255-byte sub-blocks), so any decoder
    * bug in code-width growth, the KwKwK case, or dictionary resets
    * breaks the round trip. `palette(i)` gives entry i's (r, g, b);
    * `pixelIdx(x, y)` the palette index at (x, y).
    */
  def gifImage(width: Int, height: Int, palette: Int => (Int, Int, Int),
               pixelIdx: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad gif dims ${width}x$height")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(width); w16(height)
    out.write(0x80 | 7) // global color table, 256 entries
    out.write(0); out.write(0)
    for (i <- 0 until 256) {
      val (r, g, bl) = palette(i)
      out.write(r & 0xff); out.write(g & 0xff); out.write(bl & 0xff)
    }
    out.write(0x2c) // image descriptor
    w16(0); w16(0); w16(width); w16(height)
    out.write(0) // no local table, not interlaced
    val minCode = 8
    out.write(minCode)
    // LZW compress the index stream
    val z = new java.io.ByteArrayOutputStream()
    var acc = 0L; var bits = 0
    def put(code: Int, width0: Int): Unit = {
      acc |= code.toLong << bits; bits += width0
      while (bits >= 8) { z.write((acc & 0xff).toInt); acc >>>= 8; bits -= 8 }
    }
    val clear = 1 << minCode
    val end = clear + 1
    var cw = minCode + 1
    val dict = new java.util.HashMap[Long, Integer]()
    var dictSize = end + 1
    put(clear, cw)
    var prev = -1
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val k = pixelIdx(x, y) & 0xff
        if (prev == -1) prev = k
        else {
          val key = (prev.toLong << 12) | k
          val hit = dict.get(key)
          if (hit != null) prev = hit.intValue()
          else {
            put(prev, cw)
            if (dictSize < 4096) {
              dict.put(key, Integer.valueOf(dictSize))
              dictSize += 1
              // encoder grows width when the NEXT code would not fit
              if (dictSize == (1 << cw) + 1 && cw < 12) cw += 1
            } else {
              put(clear, cw)
              dict.clear(); dictSize = end + 1; cw = minCode + 1
            }
            prev = k
          }
        }
        x += 1
      }
      y += 1
    }
    if (prev != -1) put(prev, cw)
    put(end, cw)
    if (bits > 0) z.write((acc & 0xff).toInt)
    // wrap in 255-byte sub-blocks
    val zb = z.toByteArray
    var off = 0
    while (off < zb.length) {
      val n = math.min(255, zb.length - off)
      out.write(n); out.write(zb, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Build a real FLAC signature + STREAMINFO metadata block (the writer
    * dual of [[flac]]'s bit-field decode — same packing, reversed): 4096
    * min/max block size, unknown frame sizes, zeroed MD5. `totalSamples`
    * must fit the format's 36-bit field.
    */
  def flacHeader(sampleRateHz: Int, channels: Int, bitsPerSample: Int,
                 totalSamples: Long): Array[Byte] = {
    require(sampleRateHz > 0 && sampleRateHz < (1 << 20),
      s"bad rate=$sampleRateHz (20-bit field)")
    require(channels >= 1 && channels <= 8, s"bad channels=$channels")
    require(bitsPerSample >= 4 && bitsPerSample <= 32, s"bad bps=$bitsPerSample")
    require(totalSamples >= 0 && totalSamples < (1L << 36),
      s"bad totalSamples=$totalSamples (36-bit field)")
    val out = new Array[Byte](4 + 4 + 34)
    out(0) = 'f'; out(1) = 'L'; out(2) = 'a'; out(3) = 'C'
    out(4) = 0x80.toByte // last metadata block, type 0 = STREAMINFO
    out(5) = 0; out(6) = 0; out(7) = 34
    val s = 8
    out(s) = 0x10; out(s + 1) = 0x00 // min block size 4096
    out(s + 2) = 0x10; out(s + 3) = 0x00 // max block size 4096
    // min/max frame size u24 = 0 (unknown): bytes 4..9 stay zero
    out(s + 10) = ((sampleRateHz >> 12) & 0xff).toByte
    out(s + 11) = ((sampleRateHz >> 4) & 0xff).toByte
    out(s + 12) = (((sampleRateHz & 0xf) << 4) | ((channels - 1) << 1) |
      ((bitsPerSample - 1) >> 4)).toByte
    out(s + 13) = ((((bitsPerSample - 1) & 0xf) << 4) |
      ((totalSamples >> 32) & 0xf)).toInt.toByte
    out(s + 14) = ((totalSamples >> 24) & 0xff).toByte
    out(s + 15) = ((totalSamples >> 16) & 0xff).toByte
    out(s + 16) = ((totalSamples >> 8) & 0xff).toByte
    out(s + 17) = (totalSamples & 0xff).toByte
    // 16-byte MD5 stays zero (unknown)
    out
  }

  /** Build a real MPEG-1 Layer III stream: an optional ID3v2 tag of
    * `id3Bytes` content bytes (syncsafe-sized, zero-filled) followed by
    * `nFrames` complete frames (valid 4-byte headers + zeroed frame
    * bodies at the exact 144000·kbps/rate length) — the writer dual of
    * [[parse]]'s MP3 frame walk. `sampleRateHz` and `bitrateKbps` must
    * be table values ([[Mp3Rates]] / [[Mp3BitratesKbps]]).
    */
  def mp3Frames(sampleRateHz: Int, bitrateKbps: Int, channels: Int,
                nFrames: Int, id3Bytes: Int = 0): Array[Byte] = {
    val rateIdx = Mp3Rates.indexOf(sampleRateHz)
    val brIdx = Mp3BitratesKbps.indexOf(bitrateKbps)
    require(rateIdx >= 0, s"bad sampleRateHz=$sampleRateHz (not a table rate)")
    require(brIdx >= 1, s"bad bitrateKbps=$bitrateKbps (not a table bitrate)")
    require(channels == 1 || channels == 2, s"bad channels=$channels")
    require(nFrames >= 1 && id3Bytes >= 0 && id3Bytes < (1 << 28),
      s"bad nFrames=$nFrames / id3Bytes=$id3Bytes")
    val frameLen = (144000L * bitrateKbps / sampleRateHz).toInt // padding 0
    val out = new java.io.ByteArrayOutputStream()
    if (id3Bytes > 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0) // version 2.4, no flags
      out.write((id3Bytes >> 21) & 0x7f); out.write((id3Bytes >> 14) & 0x7f)
      out.write((id3Bytes >> 7) & 0x7f); out.write(id3Bytes & 0x7f)
      out.write(new Array[Byte](id3Bytes))
    }
    val mode = if (channels == 1) 3 else 0 // stereo vs single-channel
    for (_ <- 0 until nFrames) {
      out.write(0xff)
      out.write(0xe0 | (3 << 3) | (1 << 1)) // sync tail, MPEG-1, Layer III
      out.write((brIdx << 4) | (rateIdx << 2)) // padding 0, private 0
      out.write(mode << 6)
      out.write(new Array[Byte](frameLen - 4))
    }
    out.toByteArray
  }

  /** Encode a canonical 44-byte PCM WAV header declaring `dataLen` payload
    * bytes — the writer dual of [[parse]]'s WAV reader (16-bit samples).
    * Used to synthesize deterministic audio lakes in tests/fixtures; a
    * real encoder would append the PCM data after it.
    */
  def wavHeader(channels: Int, sampleRateHz: Int, dataLen: Int,
                formatTag: Int = 1, bitsPerSample: Int = 16): Array[Byte] = {
    require(channels > 0 && sampleRateHz > 0 && dataLen >= 0,
      s"bad wav params: channels=$channels rate=$sampleRateHz dataLen=$dataLen")
    require(bitsPerSample % 8 == 0 && bitsPerSample > 0,
      s"bad bitsPerSample=$bitsPerSample")
    val blockAlign = channels * (bitsPerSample / 8)
    val byteRate = sampleRateHz.toLong * blockAlign
    val out = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(formatTag.toShort) // 1 PCM, 6 A-law, 7 µ-law
      .putShort(channels.toShort).putInt(sampleRateHz)
      .putInt(byteRate.toInt).putShort(blockAlign.toShort)
      .putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    out.array()
  }
}
