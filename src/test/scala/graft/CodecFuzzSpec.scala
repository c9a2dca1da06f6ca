package graft

import graft.operators.{ImageHeader, Jpeg, MediaHeader}
import scala.util.Random

/** Seeded fuzz over every byte-level media decoder: the multimodal
  * contract is "adversarial bytes return None, never task kills" — this
  * spec turns that claim into a pinned test. Three garbage classes per
  * decoder: pure noise, valid magic + noise body, and a TRUNCATED valid
  * payload at every prefix length (the slice a ranged object-store read
  * actually hands a prober). A throw anywhere is a task-killer in a
  * mapPartitions decode at 100 TB — exactly the failure class this
  * hunts.
  */
class CodecFuzzSpec extends SparkSpec {

  private val magics: Seq[Array[Byte]] = Seq(
    Array(0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
    "GIF89a".getBytes("US-ASCII"),
    Array(0xff.toByte, 0xd8.toByte, 0xff.toByte), // JPEG SOI
    "BM".getBytes("US-ASCII"),
    "RIFF0000WAVE".getBytes("US-ASCII"),
    "fLaC".getBytes("US-ASCII"),
    Array[Byte](0, 0, 0, 24) ++ "ftypisom".getBytes("US-ASCII"),
    Array[Byte]('I', 'I', 42, 0), // TIFF little-endian mark + magic
    Array[Byte]('M', 'M', 0, 42),
    "RIFF0000WEBP".getBytes("US-ASCII"))

  private def decodeAll(b: Array[Byte]): Unit = {
    MediaHeader.parse(b)
    MediaHeader.parseWithTail(b, b.reverse)
    MediaHeader.wavPcmStats(b)
    MediaHeader.bmpPixelStats(b)
    MediaHeader.pngPixelStats(b)
    MediaHeader.gifPixelStats(b)
    ImageHeader.parse(b)
    Jpeg.dcStats(b)
    ()
  }

  test("fuzz: noise and magic-prefixed noise decode to None, never a throw") {
    val rnd = new Random(1234)
    for (i <- 1 to 300) {
      val body = new Array[Byte](rnd.nextInt(96))
      rnd.nextBytes(body)
      decodeAll(body)
      decodeAll(magics(i % magics.length) ++ body)
    }
    decodeAll(Array.emptyByteArray)
    MediaHeader.parse(null)
    MediaHeader.parseWithTail(null, null)
  }

  test("fuzz: every truncation of a VALID payload is survivable") {
    // real payloads from the same builders the pipeline uses; every
    // prefix length simulates a short ranged read
    val wavs = MediaHeader.wavHeader(2, 16000, 64) ++ Array.fill(64)(7.toByte)
    val flac = MediaHeader.flacHeader(22050, 2, 16, 44100L)
    val mp3 = MediaHeader.mp3Frames(44100, 64, 2, 2, 21)
    val tiffLe = ImageHeader.tiffImage(33, 47, littleEndian = true,
      useLongType = false)
    val tiffBe = ImageHeader.tiffImage(33, 47, littleEndian = false,
      useLongType = true)
    val webpL = ImageHeader.webpImage(33, 47, lossless = true)
    val webpV = ImageHeader.webpImage(33, 47, lossless = false)
    for (payload <- Seq(wavs, flac, mp3, tiffLe, tiffBe, webpL, webpV);
         n <- 0 to payload.length) {
      decodeAll(payload.take(n))
    }
  }

  test("fuzz: a bit-flipped valid payload never kills the decoder") {
    val rnd = new Random(99)
    val payload = MediaHeader.wavHeader(1, 8000, 32) ++
      Array.fill(32)(1.toByte)
    for (_ <- 1 to 200) {
      val mut = payload.clone()
      val i = rnd.nextInt(mut.length)
      mut(i) = (mut(i) ^ (1 << rnd.nextInt(8))).toByte
      decodeAll(mut)
    }
  }
}
