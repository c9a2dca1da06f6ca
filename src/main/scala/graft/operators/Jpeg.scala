package graft.operators

import java.io.ByteArrayOutputStream

/** Baseline-JPEG ENTROPY codec: a real ITU-T.81 sequential-DCT decoder
  * front half (marker parse → canonical Huffman tables → bit-unstuffed
  * entropy decode → DPCM DC reconstruction, with interleaved-MCU
  * geometry, sampling factors and restart markers) plus the matching
  * writer dual. The reference stack stores media as opaque blobs and
  * ships them through the mirror (reference: the BYTEA/blob columns the
  * PeerDB flow replicates, quickstart_prepare_peers.sh:80); this is the
  * engine-side feature-extraction kernel for them — the JPEG sibling of
  * the PNG inflate+filter and GIF LZW decoders in [[MediaHeader]].
  *
  * Deliberate scope: the ENTROPY layer only — Huffman + run-length +
  * DPCM are defined EXACTLY by the spec (bit-for-bit, no rounding
  * freedom), so quantized DC coefficients are an engine-reproducible
  * contract a DuckDB oracle can regenerate arithmetically. The IDCT is
  * exactly where implementations legally diverge (T.81 Annex A allows
  * approximate IDCTs), so pixel output would be a WEAK contract —
  * decode-to-DC is the strongest exact claim a JPEG reader can make,
  * and DC is the 8× block mean, i.e. the thumbnail/feature signal a
  * training pipeline actually wants.
  *
  * Correctness triangulation (JpegSpec): (1) writer-dual round trip with
  * hand-computable DC sums; (2) the JDK's independent ImageIO decoder
  * reads this writer's files and reproduces `dc + 128` flat blocks
  * (validating the ENCODER against a foreign decoder); (3) this decoder
  * reads the JDK ENCODER's files (validating the decoder against a
  * foreign encoder, incl. its own Huffman tables). Adversarial bytes
  * return None, never throw.
  *
  * Scale shape: one linear pass per payload inside `mapPartitions`
  * (see [[Multimodal.jpegDcStats]]) — decode cost is bounded by payload
  * length, state by the Huffman tables (≤4×256 entries) and one
  * predictor per component.
  */
object Jpeg {

  /** Component-0 (luma) DC statistics of one baseline JPEG: quantized,
    * DPCM-reconstructed DC coefficients — exact integers by spec.
    */
  final case class JpegDc(width: Int, height: Int, nComponents: Int,
                          nBlocks: Long, dcSum: Long, dcMin: Long,
                          dcMax: Long)

  // ---- canonical Huffman (T.81 C.2 / F.2.2.3) ------------------------------

  private final class Huff(bits: Array[Int], val vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally { // canonical code assignment
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) > 0) {
          valPtr(l) = k; minCode(l) = code
          code += bits(l); k += bits(l)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    /** Spec F.16 DECODE; −1 on marker/corruption. */
    def decode(r: BitReader): Int = {
      var code = r.nextBit()
      if (code < 0) return -1
      var l = 1
      while (l <= 16) {
        if (maxCode(l) >= 0 && code <= maxCode(l)) {
          val idx = valPtr(l) + code - minCode(l)
          if (idx < 0 || idx >= vals.length) return -1
          return vals(idx)
        }
        val bit = r.nextBit()
        if (bit < 0) return -1
        code = (code << 1) | bit
        l += 1
      }
      -1
    }
    /** Encoder view: (code, length) per symbol value. */
    def codes: Map[Int, (Int, Int)] = {
      var out = Map.empty[Int, (Int, Int)]
      var l = 1
      while (l <= 16) {
        if (maxCode(l) >= 0) {
          var c = minCode(l)
          while (c <= maxCode(l)) {
            out += vals(valPtr(l) + c - minCode(l)) -> ((c, l))
            c += 1
          }
        }
        l += 1
      }
      out
    }
  }

  // ---- bit reader with 0xFF00 unstuffing (T.81 B.1.1.5) --------------------

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    /** Next scan bit; −1 at a marker or end (pos left AT the 0xFF). */
    def nextBit(): Int = {
      if (bitCnt == 0) {
        if (pos >= b.length) return -1
        val v = b(pos) & 0xff
        if (v == 0xff) {
          if (pos + 1 >= b.length) return -1
          if ((b(pos + 1) & 0xff) != 0) return -1 // real marker ahead
          pos += 2; bitBuf = 0xff; bitCnt = 8     // stuffed 0xFF00
        } else { pos += 1; bitBuf = v; bitCnt = 8 }
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    /** n raw bits MSB-first; Int.MinValue on marker/end. */
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val bit = nextBit()
        if (bit < 0) return Int.MinValue
        v = (v << 1) | bit
        i += 1
      }
      v
    }
    def align(): Unit = bitCnt = 0
    def marker: Int =
      if (pos + 1 < b.length && (b(pos) & 0xff) == 0xff &&
        (b(pos + 1) & 0xff) != 0) b(pos + 1) & 0xff else -1
    def skipMarker(): Unit = { pos += 2; bitCnt = 0 }
  }

  /** Spec F.12 EXTEND: map t received bits to the signed coefficient. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def ceilDiv(a: Int, b: Int): Int = (a + b - 1) / b

  // ---- decoder -------------------------------------------------------------

  private final case class Comp(id: Int, h: Int, v: Int)

  /** Parse one baseline JPEG and return component-0 DC statistics, or
    * None for anything that is not a well-formed baseline sequential
    * file (progressive SOF2 included — its spectral-selection scans
    * need a different state machine and silently-wrong numbers are
    * worse than a loud skip).
    */
  def dcStats(b: Array[Byte]): Option[JpegDc] = {
    try {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
        return None
      def u16(o: Int) = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
      var pos = 2
      var width = 0
      var height = 0
      var comps: Array[Comp] = null
      val dcT = new Array[Huff](4)
      val acT = new Array[Huff](4)
      var ri = 0
      while (pos + 2 <= b.length) {
        if ((b(pos) & 0xff) != 0xff) return None
        val m = b(pos + 1) & 0xff
        if (m == 0xff) pos += 1 // legal fill byte before a marker
        else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) pos += 2
        else if (m == 0xd9) return None // EOI before any scan
        else {
          if (pos + 4 > b.length) return None
          val len = u16(pos + 2)
          if (len < 2) return None
          val seg = pos + 4
          val segEnd = pos + 2 + len
          if (segEnd > b.length) return None
          m match {
            case 0xc0 | 0xc1 => // baseline / extended-sequential SOF
              height = u16(seg + 1); width = u16(seg + 3)
              val nc = b(seg + 5) & 0xff
              if (nc < 1 || seg + 6 + 3 * nc > segEnd) return None
              comps = Array.tabulate(nc) { i =>
                val o = seg + 6 + 3 * i
                Comp(b(o) & 0xff, (b(o + 1) & 0xff) >> 4, b(o + 1) & 0x0f)
              }
              if (comps.exists(c => c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4))
                return None
            case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
                 0xcd | 0xce | 0xcf =>
              return None // progressive / hierarchical / arithmetic
            case 0xc4 =>
              var o = seg
              while (o < segEnd) {
                val tc = (b(o) & 0xff) >> 4
                val th = b(o) & 0x0f
                if (tc > 1 || th > 3 || o + 17 > segEnd) return None
                val bits = new Array[Int](17)
                var tot = 0
                var l = 1
                while (l <= 16) { bits(l) = b(o + l) & 0xff; tot += bits(l); l += 1 }
                if (o + 17 + tot > segEnd) return None
                val vals = Array.tabulate(tot)(i => b(o + 17 + i) & 0xff)
                val h = new Huff(bits, vals)
                if (tc == 0) dcT(th) = h else acT(th) = h
                o += 17 + tot
              }
            case 0xdd =>
              if (seg + 2 > segEnd) return None
              ri = u16(seg)
            case 0xda =>
              if (comps == null) return None
              val ns = b(seg) & 0xff
              if (ns < 1 || seg + 1 + 2 * ns + 3 > segEnd) return None
              val scan = Array.tabulate(ns) { i =>
                val cid = b(seg + 1 + 2 * i) & 0xff
                val td = (b(seg + 2 + 2 * i) & 0xff) >> 4
                val ta = b(seg + 2 + 2 * i) & 0x0f
                (comps.indexWhere(_.id == cid), td, ta)
              }
              if (scan.exists(_._1 < 0)) return None
              if (scan.exists(s => dcT(s._2) == null || acT(s._3) == null))
                return None
              return decodeScan(b, segEnd, width, height, comps, scan,
                dcT, acT, ri)
            case _ => // APPn / COM / DQT / DNL …: skip
          }
          pos = segEnd
        }
      }
      None
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  private def decodeScan(b: Array[Byte], start: Int, width: Int, height: Int,
                         comps: Array[Comp],
                         scan: Array[(Int, Int, Int)],
                         dcT: Array[Huff], acT: Array[Huff],
                         ri: Int): Option[JpegDc] = {
    if (width < 1 || height < 1) return None
    val r = new BitReader(b, start)
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val pred = new Array[Int](comps.length)
    var nBlocks = 0L
    var sum = 0L
    var mn = Long.MaxValue
    var mx = Long.MinValue
    def block(ci: Int, dct: Huff, act: Huff): Boolean = {
      val t = dct.decode(r)
      if (t < 0 || t > 15) return false
      val diff =
        if (t == 0) 0
        else {
          val v = r.receive(t)
          if (v == Int.MinValue) return false
          extend(v, t)
        }
      pred(ci) += diff
      if (ci == 0) {
        val dc = pred(0).toLong
        nBlocks += 1; sum += dc
        if (dc < mn) mn = dc
        if (dc > mx) mx = dc
      }
      var k = 1
      while (k <= 63) {
        val rs = act.decode(r)
        if (rs < 0) return false
        val run = rs >> 4
        val s = rs & 15
        if (s == 0) { if (run == 15) k += 16 else k = 64 } // ZRL / EOB
        else {
          k += run
          if (k > 63) return false
          if (r.receive(s) == Int.MinValue) return false
          k += 1
        }
      }
      true
    }
    // (component index, DC table, AC table, blocks-per-MCU h, v)
    val units: Array[(Int, Huff, Huff, Int, Int)] =
      if (scan.length == 1) {
        // non-interleaved: MCU = one block on the component's own grid
        val (ci, td, ta) = scan(0)
        Array((ci, dcT(td), acT(ta), 1, 1))
      } else scan.map { case (ci, td, ta) =>
        (ci, dcT(td), acT(ta), comps(ci).h, comps(ci).v)
      }
    val totalMcus: Long =
      if (scan.length == 1) {
        val c = comps(scan(0)._1)
        ceilDiv(ceilDiv(width * c.h, hmax), 8).toLong *
          ceilDiv(ceilDiv(height * c.v, vmax), 8)
      } else
        ceilDiv(width, 8 * hmax).toLong * ceilDiv(height, 8 * vmax)
    var mcu = 0L
    while (mcu < totalMcus) {
      if (ri > 0 && mcu > 0 && mcu % ri == 0) {
        r.align()
        val mk = r.marker
        if (mk < 0xd0 || mk > 0xd7) return None
        r.skipMarker()
        java.util.Arrays.fill(pred, 0)
      }
      var u = 0
      while (u < units.length) {
        val (ci, dct, act, hh, vv) = units(u)
        var i = 0
        while (i < hh * vv) {
          if (!block(ci, dct, act)) return None
          i += 1
        }
        u += 1
      }
      mcu += 1
    }
    if (nBlocks == 0) None
    else Some(JpegDc(width, height, comps.length, nBlocks, sum, mn, mx))
  }

  // ---- writer dual ---------------------------------------------------------

  /** Annex K.3.1 luminance DC table (public spec constants). */
  private val stdDcBits =
    Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val stdDcVals = (0 to 11).toArray
  /** Minimal AC table: the single symbol this writer emits (EOB). */
  private val eobAcBits =
    Array(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val eobAcVals = Array(0x00)

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf & 0xff)
          if ((buf & 0xff) == 0xff) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    def flushWithOnes(): Unit =
      if (cnt > 0) put(0x7f, 8 - cnt) // pad bits are 1s per spec
  }

  /** Encode a grayscale baseline JPEG of `blocksWide`×1 blocks (8 rows
    * tall) whose quantized DC DIFFS are exactly `dcDiffs` and whose AC
    * coefficients are all zero. The DC quantizer is 8, so a conforming
    * pixel decoder reconstructs block b as the flat value
    * `clamp(Σdiffs₀..b + 128)` — what JpegSpec checks the JDK decoder
    * against. |running DC| must stay ≤ 2047 (category ≤ 11).
    */
  def encodeGrayDcOnly(blocksWide: Int, dcDiffs: Array[Int]): Array[Byte] = {
    require(blocksWide >= 1 && dcDiffs.length == blocksWide,
      s"need one diff per block: $blocksWide vs ${dcDiffs.length}")
    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def seg(marker: Int, body: Array[Int]): Unit = {
      out.write(0xff); out.write(marker); u16(body.length + 2)
      body.foreach(out.write)
    }
    out.write(0xff); out.write(0xd8) // SOI
    // DQT table 0: DC quantizer 8 (flat-block pixel = dc + 128), rest 16
    seg(0xdb, Array(0x00) ++ Array.tabulate(64)(i => if (i == 0) 8 else 16))
    // SOF0: 8-bit, height 8, width 8·blocksWide, 1 component, 1×1, q-table 0
    seg(0xc0, Array(8, 0, 8, (blocksWide * 8) >> 8, (blocksWide * 8) & 0xff,
      1, 1, 0x11, 0))
    // DHT: DC table 0 (Annex K luminance) + AC table 0 (EOB-only)
    seg(0xc4, Array(0x00) ++ stdDcBits.drop(1) ++ stdDcVals ++
      Array(0x10) ++ eobAcBits.drop(1) ++ eobAcVals)
    // SOS: 1 component, DC/AC tables 0, full spectral range
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0))
    val dcCodes = new Huff(stdDcBits, stdDcVals).codes
    val (eobCode, eobLen) = new Huff(eobAcBits, eobAcVals).codes(0x00)
    val w = new BitWriter(out)
    var b = 0
    var running = 0
    while (b < blocksWide) {
      val diff = dcDiffs(b)
      running += diff
      require(math.abs(running) <= 2047, s"DC out of category range: $running")
      val t = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (c, l) = dcCodes(t)
      w.put(c, l)
      if (t > 0) w.put(if (diff >= 0) diff else diff + (1 << t) - 1, t)
      w.put(eobCode, eobLen)
      b += 1
    }
    w.flushWithOnes()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }
}
