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

  /** Parse the payload's image header, if it is one of the supported public
    * container formats.
    */
  def parse(bytes: Array[Byte]): Option[ImageInfo] =
    if (bytes == null) None
    else png(bytes).orElse(gif(bytes)).orElse(jpeg(bytes)).orElse(bmp(bytes))
}
