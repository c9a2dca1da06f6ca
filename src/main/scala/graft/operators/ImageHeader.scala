package graft.operators

/** Fixed-width integer readers over raw container bytes, shared by the
  * header parsers ([[ImageHeader]], [[MediaHeader]]) so a hardening fix
  * lands once.
  */
private[operators] object ByteReaders {
  def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  def be64(b: Array[Byte], i: Int): Long = (be32(b, i) << 32) | be32(b, i + 4)
  def tag(b: Array[Byte], i: Int): String =
    if (i < 0 || i + 4 > b.length) "" else new String(b, i, 4, "US-ASCII")
}

/** Public-image-format header parsing — dimensions and format straight from
  * the container bytes, no codec library. This is the first REAL kernel
  * behind [[Multimodal.Codec]]'s seam (the pixel decode itself stays out of
  * this container): PNG and GIF store dimensions at fixed offsets, JPEG in
  * its start-of-frame segment, all documented public formats (PNG: RFC 2083
  * §3.1/§4.1.1; JPEG: ITU-T T.81 §B.2.2; GIF: GIF89a specification §18).
  * Parsing a header touches only the first bytes of the payload, so at
  * 100 TB the per-item cost is independent of media size.
  */
object ImageHeader {
  import ByteReaders._

  /** Detected container format + pixel dimensions. */
  case class ImageInfo(format: String, width: Int, height: Int)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG: 8-byte signature, then the IHDR chunk (length, "IHDR", width u32
    * big-endian, height u32) — IHDR is required to be first.
    */
  private def png(b: Array[Byte]): Option[ImageInfo] = {
    if (b.length < 24 || !b.startsWith(PngSig)) return None
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w > 0 && w <= Int.MaxValue && h > 0 && h <= Int.MaxValue)
      Some(ImageInfo("png", w.toInt, h.toInt))
    else None
  }

  /** GIF87a/GIF89a: 6-byte version signature, then the logical screen
    * width/height as little-endian u16.
    */
  private def gif(b: Array[Byte]): Option[ImageInfo] = {
    if (b.length < 10) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = le16(b, 6)
    val h = le16(b, 8)
    if (w > 0 && h > 0) Some(ImageInfo("gif", w, h)) else None
  }

  /** SOFn markers carrying frame dimensions: C0-CF minus DHT (C4), JPG
    * extension (C8) and DAC (CC).
    */
  private def isSof(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  /** JPEG: SOI, then a marker walk — every non-standalone segment carries a
    * big-endian length (self-inclusive) to skip by; the first SOFn segment
    * holds (precision u8, height u16, width u16) after the length.
    */
  private def jpeg(b: Array[Byte]): Option[ImageInfo] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 1 < b.length) {
      if (u8(b, i) != 0xff) return None // marker desync: not a JPEG stream
      val marker = u8(b, i + 1)
      if (marker == 0xff) i += 1 // fill byte before a marker
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) i += 2 // standalone
      else {
        if (i + 3 >= b.length) return None
        val len = be16(b, i + 2)
        if (len < 2) return None
        if (isSof(marker)) {
          if (i + 8 >= b.length) return None
          val h = be16(b, i + 5)
          val w = be16(b, i + 7)
          return if (w > 0 && h > 0) Some(ImageInfo("jpeg", w, h)) else None
        }
        i += 2 + len
      }
    }
    None
  }

  /** BMP (Windows BITMAPINFOHEADER layout, public): 'BM', then the info
    * header at offset 14 with width/height as LE i32 at 18/22 — a negative
    * height means top-down row order (dimensions report |h|).
    */
  private def bmp(b: Array[Byte]): Option[ImageInfo] = {
    if (b.length < 26 || b(0) != 'B' || b(1) != 'M') return None
    if (le32(b, 14) < 40) return None // pre-BITMAPINFOHEADER cores unsupported
    val w = le32(b, 18).toInt
    val h = le32(b, 22).toInt
    if (w > 0 && h != 0 && h != Int.MinValue)
      Some(ImageInfo("bmp", w, math.abs(h)))
    else None
  }

  /** TIFF (TIFF 6.0 spec): 2-byte order mark ('II' little / 'MM' big
    * endian), magic 42, then a walked IFD whose 12-byte entries carry
    * (tag, type, count, value-or-offset) — dimensions are ImageWidth(256)
    * / ImageLength(257), each legal as SHORT(3) or LONG(4) and, when the
    * value fits, packed LEFT-JUSTIFIED in the entry's 4-byte value field
    * in file byte order. Every read is bounds-guarded and the entry count
    * capped, so hostile bytes return None, never throw (the codec-fuzz
    * no-throw contract).
    */
  private def tiff(b: Array[Byte]): Option[ImageInfo] = {
    if (b.length < 8) return None
    val le = b(0) == 'I' && b(1) == 'I'
    if (!le && !(b(0) == 'M' && b(1) == 'M')) return None
    def g16(o: Int): Int =
      if (o < 0 || o + 2 > b.length) -1
      else if (le) le16(b, o) else be16(b, o)
    def g32(o: Int): Long =
      if (o < 0 || o + 4 > b.length) -1L
      else if (le) le32(b, o) else be32(b, o)
    if (g16(2) != 42) return None
    val ifd = g32(4)
    if (ifd < 8 || ifd > Int.MaxValue - 2 || ifd + 2 > b.length) return None
    val n = g16(ifd.toInt)
    if (n <= 0 || n > 512) return None
    var w = -1L
    var h = -1L
    var k = 0
    while (k < n) {
      val e = ifd.toInt + 2 + 12 * k
      if (e + 12 > b.length) return None
      val tag = g16(e)
      if ((tag == 256 || tag == 257) && g32(e + 4) == 1L) {
        val v = g16(e + 2) match {
          case 3 => g16(e + 8).toLong // SHORT, left-justified value field
          case 4 => g32(e + 8) // LONG
          case _ => -1L
        }
        if (tag == 256) w = v else h = v
      }
      k += 1
    }
    if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
      Some(ImageInfo("tiff", w.toInt, h.toInt))
    else None
  }

  /** Minimal valid single-IFD TIFF writer — the [[tiff]] parser's dual for
    * round-trip tests and deterministic synthetic payloads: either byte
    * order, dimensions as SHORT or LONG entries, plus BitsPerSample /
    * Compression entries so the IFD exercises tag-skipping.
    */
  def tiffImage(width: Int, height: Int, littleEndian: Boolean,
                useLongType: Boolean): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (littleEndian) { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      else { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Long): Unit =
      if (littleEndian) { out.write((v & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt)
        out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 24) & 0xff).toInt) }
      else { out.write(((v >> 24) & 0xff).toInt)
        out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt)
        out.write((v & 0xff).toInt) }
    def entry(tag: Int, typ: Int, value: Long): Unit = {
      w16(tag); w16(typ); w32(1L)
      if (typ == 3) { w16(value.toInt); w16(0) } else w32(value)
    }
    out.write(if (littleEndian) 'I' else 'M')
    out.write(if (littleEndian) 'I' else 'M')
    w16(42)
    w32(8L) // IFD directly after the header
    w16(4) // entry count
    val dimType = if (useLongType) 4 else 3
    entry(256, dimType, width.toLong)
    entry(257, dimType, height.toLong)
    entry(258, 3, 8L) // BitsPerSample: must be skipped by the dim walk
    entry(259, 3, 1L) // Compression = none
    w32(0L) // no next IFD
    out.toByteArray
  }

  /** WebP (RIFF container, Google's public container spec): "RIFF" +
    * LE u32 size + "WEBP", then the first image chunk — either VP8L
    * (lossless: signature byte 0x2F, then width−1 / height−1 as two
    * 14-bit fields bit-packed LSB-first into a LE u32, version bits
    * must be 0) or "VP8 " (lossy: 3-byte frame tag, the 0x9D 01 2A
    * start code, then width / height as LE u16s whose low 14 bits are
    * the dimensions). All reads bounds-guarded; hostile bytes return
    * None (the codec-fuzz no-throw contract).
    */
  private def webp(b: Array[Byte]): Option[ImageInfo] = {
    if (b.length < 20) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P')) return None
    val fourcc = new String(b, 12, 4, "US-ASCII")
    fourcc match {
      case "VP8L" =>
        // chunk size u32 at 16, payload at 20: 0x2F then the packed u32
        if (b.length < 25 || u8(b, 20) != 0x2f) return None
        val bits = le32(b, 21)
        if (((bits >>> 29) & 0x7) != 0) return None // version must be 0
        val w = (bits & 0x3fff).toInt + 1
        val h = ((bits >>> 14) & 0x3fff).toInt + 1
        Some(ImageInfo("webp", w, h))
      case "VP8 " =>
        // payload at 20: 3-byte frame tag, start code, two LE u16 dims
        if (b.length < 30) return None
        if (u8(b, 23) != 0x9d || u8(b, 24) != 0x01 || u8(b, 25) != 0x2a)
          return None
        val w = le16(b, 26) & 0x3fff
        val h = le16(b, 28) & 0x3fff
        if (w > 0 && h > 0) Some(ImageInfo("webp", w, h)) else None
      case _ => None
    }
  }

  /** Minimal valid WebP writer — [[webp]]'s dual for round-trip tests
    * and deterministic synthetic payloads, emitting either the VP8L
    * bit-packed or the VP8 start-code dimension layout.
    */
  def webpImage(width: Int, height: Int, lossless: Boolean): Array[Byte] = {
    // VP8L stores width−1 (range 1..16384); VP8 stores the raw 14-bit
    // dimension (range 1..16383)
    val maxDim = if (lossless) 0x4000 else 0x3fff
    require(width >= 1 && height >= 1 && width <= maxDim &&
      height <= maxDim, s"bad dims ${width}x$height (lossless=$lossless)")
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def ascii(s: String): Unit = s.foreach(c => out.write(c))
    if (lossless) {
      ascii("RIFF"); w32(4 + 4 + 4 + 5)
      ascii("WEBP"); ascii("VP8L"); w32(5)
      out.write(0x2f)
      w32(((width - 1).toLong & 0x3fff) |
        (((height - 1).toLong & 0x3fff) << 14))
    } else {
      ascii("RIFF"); w32(4 + 4 + 4 + 10)
      ascii("WEBP"); ascii("VP8 "); w32(10)
      out.write(0); out.write(0); out.write(0) // frame tag (keyframe)
      out.write(0x9d); out.write(0x01); out.write(0x2a)
      out.write(width & 0xff); out.write((width >> 8) & 0x3f)
      out.write(height & 0xff); out.write((height >> 8) & 0x3f)
    }
    out.toByteArray
  }

  /** Parse the payload's image header, if it is one of the supported public
    * container formats.
    */
  def parse(bytes: Array[Byte]): Option[ImageInfo] =
    if (bytes == null) None
    else png(bytes).orElse(gif(bytes)).orElse(jpeg(bytes)).orElse(bmp(bytes))
      .orElse(tiff(bytes)).orElse(webp(bytes))
}
