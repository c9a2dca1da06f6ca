package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import graft.operators.Jpeg

/** Baseline-JPEG entropy codec triangulation:
  *   1. writer-dual round trip with hand-computed DPCM sums;
  *   2. the JDK's INDEPENDENT ImageIO decoder reads this writer's files
  *      (foreign decoder validates the encoder — DC-only blocks decode
  *      to exactly flat `dc + 128` pixels, the one JPEG case where the
  *      spec's IDCT freedom collapses to an exact integer);
  *   3. this decoder reads the JDK ENCODER's files (foreign encoder
  *      validates the decoder, incl. its own Huffman tables and real AC
  *      coefficient streams);
  *   4. a hand-assembled restart-marker stream (DRI=1) pins predictor
  *      resets; adversarial bytes return None.
  */
class JpegSpec extends SparkSpec {

  test("writer-dual round trip: hand-computed DPCM DC statistics") {
    // diffs 5, −3, 0, 10 → DC prefix sums 5, 2, 2, 12
    val jpg = Jpeg.encodeGrayDcOnly(4, Array(5, -3, 0, 10))
    val s = Jpeg.dcStats(jpg).get
    assert(s.width === 32 && s.height === 8 && s.nComponents === 1)
    assert(s.nBlocks === 4L && s.dcSum === 21L)
    assert(s.dcMin === 2L && s.dcMax === 12L)
    // negative-heavy stream exercises the ones-complement EXTEND branch
    val neg = Jpeg.dcStats(Jpeg.encodeGrayDcOnly(3, Array(-1, -31, -2))).get
    assert(neg.dcSum === (-1L) + (-32) + (-34))
    assert(neg.dcMin === -34L && neg.dcMax === -1L)
  }

  test("JDK ImageIO decodes this writer's files to flat dc+128 blocks") {
    val diffs = Array(7, -19, 30, -5, 0, 14)
    val jpg = Jpeg.encodeGrayDcOnly(6, diffs)
    val img = ImageIO.read(new ByteArrayInputStream(jpg))
    assert(img != null, "JDK decoder rejected the writer's output")
    assert(img.getWidth === 48 && img.getHeight === 8)
    val dcs = diffs.scanLeft(0)(_ + _).drop(1)
    for (b <- diffs.indices; y <- 0 until 8; x <- 0 until 8) {
      val got = img.getRaster.getSample(b * 8 + x, y, 0)
      assert(got === dcs(b) + 128,
        s"block $b pixel ($x,$y): $got vs ${dcs(b) + 128}")
    }
  }

  test("this decoder reads JDK-encoded files: flat and gradient images") {
    def jdkJpeg(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, px(x, y))
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "jpg", out))
      out.toByteArray
    }
    // flat bright image: every block's DC is identical and positive
    val bright = Jpeg.dcStats(jdkJpeg(24, 16, (_, _) => 180)).get
    assert(bright.width === 24 && bright.height === 16)
    assert(bright.nBlocks === 6L)
    assert(bright.dcMin === bright.dcMax, "flat image must have flat DC")
    assert(bright.dcMin > 0L) // 180 > 128 ⇒ positive level shift
    val dark = Jpeg.dcStats(jdkJpeg(16, 8, (_, _) => 100)).get
    assert(dark.nBlocks === 2L && dark.dcMin === dark.dcMax && dark.dcMax < 0L)
    // gradient: exercises the REAL AC run-length stream (nonzero coeffs,
    // ZRL, mid-block EOBs) through the JDK's own Huffman tables
    val grad = Jpeg.dcStats(jdkJpeg(40, 24, (x, y) => (x * 7 + y * 13) % 256))
    assert(grad.isDefined, "decoder failed on a real JDK AC stream")
    assert(grad.get.nBlocks === 15L)
  }

  test("restart markers reset the DC predictor (hand-assembled DRI=1)") {
    // Reuse the writer's header segments but splice a DRI and one RST0
    // between two single-block restart intervals. Entropy bits computed
    // by hand against the Annex-K DC table:
    //   diff 5  → cat 3 '100' + '101', EOB '0' → 1001010· pad 1 → 0x95
    //   diff −3 → cat 2 '011' + '00',  EOB '0' → 011000·· pad 11 → 0x63
    def seg(marker: Int, body: Array[Int]): Array[Byte] =
      (Array(0xff, marker, (body.length + 2) >> 8, (body.length + 2) & 0xff)
        ++ body).map(_.toByte)
    val dcBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    val bytes =
      Array(0xff, 0xd8).map(_.toByte) ++
        seg(0xc0, Array(8, 0, 8, 0, 16, 1, 1, 0x11, 0)) ++
        seg(0xc4, Array(0x00) ++ dcBits.drop(1) ++ (0 to 11).toArray ++
          Array(0x10) ++ Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
          ++ Array(0x00)) ++
        seg(0xdd, Array(0, 1)) ++
        seg(0xda, Array(1, 1, 0x00, 0, 63, 0)) ++
        Array(0x95, 0xff, 0xd0, 0x63).map(_.toByte) ++
        Array(0xff, 0xd9).map(_.toByte)
    val s = Jpeg.dcStats(bytes).get
    // WITHOUT the reset the second block would read 5 + (−3) = 2; the
    // RST0 pins it back to −3
    assert(s.nBlocks === 2L && s.dcSum === 2L)
    assert(s.dcMin === -3L && s.dcMax === 5L)
  }

  test("adversarial bytes return None, never throw") {
    assert(Jpeg.dcStats(Array.empty[Byte]).isEmpty)
    assert(Jpeg.dcStats(Array[Byte](1, 2, 3)).isEmpty)
    val ok = Jpeg.encodeGrayDcOnly(4, Array(5, -3, 0, 10))
    // every prefix: no throw; prefixes ending at or before the scan
    // header must be loudly None (a cut inside trailing entropy padding
    // or EOI can legally still decode — the MCU count completes first)
    val sosAt = ok.indices.find(i => (ok(i) & 0xff) == 0xff
      && (ok(i + 1) & 0xff) == 0xda).get
    val scanStart = sosAt + 2 +
      ((((ok(sosAt + 2) & 0xff) << 8) | (ok(sosAt + 3) & 0xff)))
    for (cut <- 0 until ok.length) {
      val r = Jpeg.dcStats(ok.take(cut)) // must never throw
      if (cut <= scanStart) assert(r.isEmpty, s"prefix $cut")
    }
    // progressive (SOF2) is declared out of scope → None
    val prog = ok.clone()
    val sofAt = ok.indices.find(i => (ok(i) & 0xff) == 0xff
      && (ok(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.dcStats(prog).isEmpty)
    // flipped entropy bytes: either decodes to SOME stats or None — the
    // contract is no exception (bit garbage may still be a valid stream)
    val flip = ok.clone()
    flip(flip.length - 3) = 0x55
    Jpeg.dcStats(flip)
  }
}
