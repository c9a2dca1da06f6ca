package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) travels through the
  * pipeline as an opaque `binary` payload plus a typed metadata struct, and
  * per-item "decode / feature extraction" runs as a columnar transform over
  * that payload.
  *
  * The pixel-decode step is STUBBED (this container has no image/audio
  * libraries): `fakeDecodeStats` derives deterministic pseudo-features from
  * the payload bytes. Everything around it — schema, batch shape,
  * partitioning, group-level aggregation — is the real Spark plumbing a
  * decode UDF would plug into: swap `fakeDecodeStats` for a
  * `mapInPandas`/`mapPartitions` codec and nothing else changes. One real
  * kernel already sits behind the seam: [[imageHeaderCodec]] parses actual
  * PNG/JPEG/GIF container headers ([[ImageHeader]]) for format + dimensions.
  */
object Multimodal {

  /** Attach a synthetic binary payload + typed metadata to each document —
    * stands in for reading (path, bytes, metadata) from a lake of media
    * files. Deterministic: payload = utf8 bytes of the text, metadata
    * derived from the id.
    */
  def withMediaColumns(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        (lit(64) + pmod(col(idCol), lit(448)).cast("int")).as("width"),
        (lit(64) + pmod(col(idCol) * 7, lit(448)).cast("int")).as("height"),
        concat(lit("img/"), pmod(col(idCol), lit(3)).cast("string")).as("media_type"))
        .as("meta"))

  /** STUB decode: deterministic pseudo-features of the payload (length and a
    * byte checksum stand in for decoded pixel stats). Replace with a real
    * codec via mapInPandas/mapPartitions at deployment.
    */
  def fakeDecodeStats(media: DataFrame): DataFrame =
    media.withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("pixels", (col("meta.width") * col("meta.height")).cast("long"))
      .withColumn("aspect_pct",
        (col("meta.width") * 100L).cast("long") / col("meta.height").cast("long"))

  /** One media item as the typed decode pipeline sees it. */
  case class MediaItem(id: Long, payload: Array[Byte], width: Int, height: Int,
                       mediaType: String)

  /** Decoded per-item features. */
  case class MediaFeatures(id: Long, mediaType: String, nBytes: Long,
                           checksum: Long, pixels: Long)

  /** A codec: one partition-worth of items to features. Runs once per
    * partition so a real implementation amortizes model/codec init across
    * the batch (the same shape `mapInPandas` gives Python codecs).
    */
  type Codec = Iterator[MediaItem] => Iterator[MediaFeatures]

  private def byteChecksum(payload: Array[Byte]): Long = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum = sum * 31 + (payload(i) & 0xff); i += 1 }
    sum
  }

  /** STUB codec: deterministic byte checksum in place of pixel decoding.
    * Swap for a JNI/Java image codec at deployment; the pipeline shape
    * (partition iterator in, features out) does not change.
    */
  val stubCodec: Codec = items => items.map { it =>
    MediaFeatures(it.id, it.mediaType, it.payload.length.toLong,
      byteChecksum(it.payload), it.width.toLong * it.height)
  }

  /** Header-parsing codec: REAL public-format parsing ([[ImageHeader]] —
    * PNG IHDR / JPEG SOFn / GIF logical screen) through the same seam the
    * stub occupies. Recognized payloads report the detected container as
    * `mediaType` and the HEADER dimensions as `pixels` (the declared
    * metadata can lie; the bytes cannot); unrecognized payloads fall back
    * to the stub's features under their declared type, since mixed lakes
    * are normal. The pixel decode itself remains out of this container —
    * this codec reads a bounded prefix of each payload.
    */
  val imageHeaderCodec: Codec = items => items.map { it =>
    ImageHeader.parse(it.payload) match {
      case Some(info) =>
        MediaFeatures(it.id, info.format, it.payload.length.toLong,
          byteChecksum(it.payload), info.width.toLong * info.height)
      case None =>
        MediaFeatures(it.id, it.mediaType, it.payload.length.toLong,
          byteChecksum(it.payload), it.width.toLong * it.height)
    }
  }

  /** Attach a synthetic WAV payload to each document — the audio sibling
    * of [[withMediaColumns]], standing in for reading audio files from a
    * lake. The header is REAL ([[MediaHeader.wavHeader]]) with stream
    * parameters derived deterministically from the id (channels 1-2,
    * sample rate 8/12/16 kHz, declared data length 4-8 KB), so a probe of
    * the generated lake is oracle-checkable from id arithmetic alone.
    */
  def withAudioPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions(_.map { id =>
        val channels = 1 + (id % 2).toInt
        val rate = 8000 + (id % 3).toInt * 4000
        val dataLen = 4000 + (id % 5).toInt * 1000
        (id, MediaHeader.wavHeader(channels, rate, dataLen))
      })
      .toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        struct(lit(0).as("width"), lit(0).as("height"),
          lit("audio/wav").as("media_type")).as("meta"))
  }

  /** Attach a real FLAC signature + STREAMINFO block per document — the
    * bit-packed-container sibling of [[withAudioPayloads]]: sample rate /
    * channels / total samples derive from the id alone, so the probe's
    * decoded fields (including the 36-bit sample-count unpack) are
    * re-derivable arithmetically by the oracle.
    */
  def withFlacPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions(_.map { id =>
        val rate = 8000 + (id % 5).toInt * 8000
        val channels = 1 + (id % 2).toInt
        val totalSamples = 10000L + (id % 7) * 4410L
        (id, MediaHeader.flacHeader(rate, channels, 16, totalSamples))
      })
      .toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        struct(lit(0).as("width"), lit(0).as("height"),
          lit("audio/flac").as("media_type")).as("meta"))
  }

  /** Attach a real MPEG-1 Layer III stream per doc (ID3v2 tag + complete
    * frames from the writer dual [[MediaHeader.mp3Frames]]), every
    * parameter derived from the id so an oracle re-derives the probe's
    * outputs with integer arithmetic — the id-arithmetic convention of
    * [[withFlacPayloads]].
    */
  def withMp3Payloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions(_.map { id =>
        val rate = MediaHeader.Mp3Rates((id % 3).toInt)
        val kbps = MediaHeader.Mp3BitratesKbps(1 + (id % 14).toInt)
        val channels = 1 + (id % 2).toInt
        val frames = 5 + (id % 9).toInt
        val id3 = (id % 4).toInt * 17
        (id, MediaHeader.mp3Frames(rate, kbps, channels, frames, id3))
      })
      .toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        struct(lit(0).as("width"), lit(0).as("height"),
          lit("audio/mpeg").as("media_type")).as("meta"))
  }

  /** Attach a synthetic single-IFD TIFF payload per document — id-derived
    * dimensions, alternating byte order, and SHORT/LONG dimension entry
    * types by id residue, so the probe exercises both endian paths and
    * both value layouts while the oracle re-derives every field from
    * doc_id arithmetic alone ([[graft.operators.ImageHeader.tiffImage]]
    * is the parser's writer dual).
    */
  def withTiffPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 16 + (id % 64).toInt
        val h = 16 + ((id / 3) % 48).toInt
        (id, ImageHeader.tiffImage(w, h, littleEndian = id % 2 == 0,
          useLongType = id % 3 == 0))
      })
      .toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        struct(lit(0).as("width"), lit(0).as("height"),
          lit("image/tiff").as("media_type")).as("meta"))
  }

  /** Attach a synthetic WebP payload per document — id-derived
    * dimensions, alternating VP8L (bit-packed dims) and VP8 (start-code
    * dims) chunk layouts by id parity, so the probe exercises both
    * branches while the oracle re-derives every field from doc_id
    * arithmetic ([[graft.operators.ImageHeader.webpImage]] is the
    * parser's writer dual).
    */
  def withWebpPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 16 + (id % 50).toInt
        val h = 16 + ((id / 7) % 40).toInt
        (id, ImageHeader.webpImage(w, h, lossless = id % 2 == 0))
      })
      .toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        struct(lit(0).as("width"), lit(0).as("height"),
          lit("image/webp").as("media_type")).as("meta"))
  }

  /** Attach a synthetic WAV payload WITH actual PCM sample data — the
    * full-decode sibling of [[withAudioPayloads]] (which ships headers
    * only). Samples are the deterministic integer stream
    * `s(i) = ((id·31 + i·7919) mod 65536) − 32768` over
    * `n = 200 + (id mod 5)·50` 16-bit LE slots, so every sample — and
    * therefore every decoded statistic — is re-derivable from id
    * arithmetic alone by any engine (the DuckDB oracle regenerates the
    * stream with `range()` and must agree exactly).
    */
  def withPcmAudioPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions(_.map { id =>
        val channels = 1 + (id % 2).toInt
        val rate = 8000 + (id % 3).toInt * 4000
        val n = 200 + (id % 5).toInt * 50
        val pcm = new Array[Byte](2 * n)
        var i = 0
        while (i < n) {
          val v = (((id * 31 + i.toLong * 7919) % 65536L) - 32768L).toInt
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        (id, MediaHeader.wavHeader(channels, rate, pcm.length) ++ pcm)
      })
      .toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        struct(lit(0).as("width"), lit(0).as("height"),
          lit("audio/wav").as("media_type")).as("meta"))
  }

  /** Attach a synthetic 24-bit BMP payload to each document — the image
    * sibling of [[withPcmAudioPayloads]]: REAL container bytes
    * ([[MediaHeader.bmpImage]]) whose dimensions (`2+id%6 × 1+id%4`) and
    * per-pixel channels (`r = (id·7 + x·13 + y·31) mod 256` and siblings)
    * derive from the id alone, so every decoded statistic is re-derivable
    * arithmetically by the oracle. Alternating ids store bottom-up vs
    * top-down — the decoder must agree on both layouts.
    */
  def withBmpPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 2 + (id % 6).toInt
        val h = 1 + (id % 4).toInt
        val img = MediaHeader.bmpImage(w, h, (x, y) => (
          ((id * 7 + x * 13 + y * 31) % 256).toInt,
          ((id * 11 + x * 17 + y * 37) % 256).toInt,
          ((id * 13 + x * 19 + y * 41) % 256).toInt),
          topDown = id % 2 == 1)
        (id, img)
      })
      .toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        struct(lit(0).as("width"), lit(0).as("height"),
          lit("image/bmp").as("media_type")).as("meta"))
  }

  /** Deterministic synthetic G.711 telephony lake — the COMPANDED sibling
    * of [[withPcmAudioPayloads]]: even ids carry µ-law (fmt tag 7), odd
    * ids A-law (fmt tag 6), each `n = 150 + (id mod 4)·50` code bytes of
    * the stream `c(i) = (id·13 + i·97) mod 256`. The decoder must run the
    * real G.711 expansion; the oracle regenerates the codes AND the
    * expansion arithmetically (both formulas are pure integer bit math),
    * so an expansion-table bug hash-mismatches.
    */
  def withG711Payloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions(_.map { id =>
        val n = 150 + (id % 4).toInt * 50
        val codes = Array.tabulate(n)(i => ((id * 13 + i * 97) % 256).toByte)
        val fmtTag = if (id % 2 == 0) 7 else 6
        (id, MediaHeader.wavHeader(1, 8000, n, fmtTag, 8) ++ codes)
      })
      .toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        struct(lit(0).as("width"), lit(0).as("height"),
          lit("audio/wav").as("media_type")).as("meta"))
  }

  /** Deterministic synthetic PNG lake — the compressed sibling of
    * [[withBmpPayloads]]: same id-derived pixel field (shifted constants),
    * but stored through the FULL PNG pipeline (per-row filters cycling
    * through all five types, deflate). Alternating ids carry an alpha
    * channel (color type 6; the decoder must exclude it from sums). Every
    * decoded statistic is re-derivable arithmetically by the oracle, so a
    * filter-reconstruction, inflate, or channel-order bug hash-mismatches.
    */
  def withPngPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 2 + (id % 5).toInt
        val h = 1 + (id % 3).toInt
        val img = MediaHeader.pngImage(w, h, (x, y) => (
          ((id * 5 + x * 11 + y * 23) % 256).toInt,
          ((id * 7 + x * 13 + y * 29) % 256).toInt,
          ((id * 9 + x * 17 + y * 31) % 256).toInt),
          filterFor = y => ((id + y) % 5).toInt,
          withAlpha = id % 2 == 1)
        (id, img)
      })
      .toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        struct(lit(0).as("width"), lit(0).as("height"),
          lit("image/png").as("media_type")).as("meta"))
  }

  /** Decoded per-item pixel statistics (see [[MediaHeader.bmpPixelStats]]). */
  case class ImageStats(doc_id: Long, n_pixels: Long, sum_r: Long,
                        sum_g: Long, sum_b: Long, peak_luma: Long)

  /** REAL image decode through the codec seam: fold each BMP payload's
    * pixels into per-item statistics — the pixel half of the decode seam,
    * same partition-iterator shape as [[audioStats]]. Non-BMP payloads are
    * dropped (mixed lakes filter here).
    */
  def imageStats(media: DataFrame): Dataset[ImageStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        MediaHeader.bmpPixelStats(payload).map(s =>
          ImageStats(id, s.nPixels, s.sumR, s.sumG, s.sumB, s.peakLuma))
      })
  }

  /** Deterministic synthetic GIF lake — the palette-indexed sibling of
    * [[withPngPayloads]]: a 256-entry id-derived palette and id-derived
    * pixel indices, stored through REAL LZW compression
    * ([[MediaHeader.gifImage]]: dictionary growth, variable code widths,
    * clears). Every decoded statistic is re-derivable arithmetically by
    * the oracle, so an LZW, code-width, or palette bug hash-mismatches.
    */
  def withGifPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 3 + (id % 6).toInt
        val h = 2 + (id % 4).toInt
        val img = MediaHeader.gifImage(w, h,
          palette = i => (
            ((id * 3 + i * 7) % 256).toInt,
            ((id * 5 + i * 11) % 256).toInt,
            ((id * 7 + i * 13) % 256).toInt),
          pixelIdx = (x, y) => ((id + x * 5 + y * 17) % 256).toInt)
        (id, img)
      })
      .toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        struct(lit(0).as("width"), lit(0).as("height"),
          lit("image/gif").as("media_type")).as("meta"))
  }

  /** REAL LZW decode through the codec seam: GIF pixel indices →
    * palette → the same per-item statistics as [[imageStats]]
    * ([[MediaHeader.gifPixelStats]]). Non-GIF payloads drop.
    */
  def gifStats(media: DataFrame): Dataset[ImageStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        MediaHeader.gifPixelStats(payload).map(s =>
          ImageStats(id, s.nPixels, s.sumR, s.sumG, s.sumB, s.peakLuma))
      })
  }

  /** REAL compressed-image decode through the codec seam: inflate + filter
    * reconstruction per [[MediaHeader.pngPixelStats]], folded to the same
    * per-item statistics as [[imageStats]]. Non-PNG payloads drop (mixed
    * lakes filter here).
    */
  def pngStats(media: DataFrame): Dataset[ImageStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        MediaHeader.pngPixelStats(payload).map(s =>
          ImageStats(id, s.nPixels, s.sumR, s.sumG, s.sumB, s.peakLuma))
      })
  }

  /** Synthetic baseline JPEGs through the real writer dual
    * ([[Jpeg.encodeGrayDcOnly]]): per doc a `1 + id % 8`-block grayscale
    * strip whose quantized DC DIFFS are id-derived
    * (`((id·31 + b·17) mod 65) − 32`), so the DPCM-decoded DC values are
    * prefix sums the oracle regenerates with pure `range()` arithmetic —
    * a Huffman-table, bit-stuffing, EXTEND or DPCM bug hash-mismatches
    * immediately.
    */
  def withJpegPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions(_.map { id =>
        val k = 1 + (id % 8).toInt
        val diffs = Array.tabulate(k)(b => ((id * 31 + b * 17) % 65).toInt - 32)
        (id, Jpeg.encodeGrayDcOnly(k, diffs))
      })
      .toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        struct(lit(0).as("width"), lit(0).as("height"),
          lit("image/jpeg").as("media_type")).as("meta"))
  }

  /** Per-item luma-DC statistics through the real baseline-JPEG entropy
    * decode ([[Jpeg.dcStats]]). Non-JPEG / progressive payloads drop.
    */
  case class JpegDcStats(doc_id: Long, width: Int, n_blocks: Long,
                         dc_sum: Long, dc_min: Long, dc_max: Long)

  def jpegDcStats(media: DataFrame): Dataset[JpegDcStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        Jpeg.dcStats(payload).map(s =>
          JpegDcStats(id, s.width, s.nBlocks, s.dcSum, s.dcMin, s.dcMax))
      })
  }

  /** Decoded per-item PCM statistics (see [[MediaHeader.wavPcmStats]]). */
  case class AudioStats(doc_id: Long, n_samples: Long, peak: Long,
                        n_clipped: Long, sum_squares: Long)

  /** REAL audio decode through the codec seam: fold each WAV payload's
    * 16-bit PCM samples into per-item statistics. Same partition-iterator
    * shape as [[decode]] — per-item cost linear in payload bytes, nothing
    * driver-side. Non-WAV / sampleless payloads are dropped (a mixed lake
    * filters here; count them upstream with [[probeHeaders]] if needed).
    */
  def audioStats(media: DataFrame): Dataset[AudioStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        MediaHeader.wavPcmStats(payload).map(s =>
          AudioStats(id, s.nSamples, s.peak.toLong, s.clipped, s.sumSquares))
      })
  }

  /** Full media-probe result: what the container bytes actually say,
    * with the declared metadata kept alongside for drift detection.
    */
  case class MediaProbe(id: Long, format: String, nBytes: Long, width: Int,
                        height: Int, channels: Int, sampleRateHz: Int,
                        durationMs: Long, declaredType: String)

  /** Probe every payload's container header ([[MediaHeader]]: PNG/JPEG/GIF
    * + WAV + MP4) through the same partition-iterator seam as [[decode]].
    * Unrecognized payloads report format "unknown" with zeroed stream
    * properties — mixed lakes are normal, and the declared type column is
    * retained so a consumer can quantify declared-vs-actual drift (the
    * bytes cannot lie; catalogs can). Reads only a bounded prefix per
    * item.
    */
  def probeHeaders(media: DataFrame): Dataset[MediaProbe] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(
        col("doc_id").as("id"), col("payload"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.media_type").as("mediaType"))
      .as[MediaItem]
      .mapPartitions(_.map { it =>
        // a NULL payload is a normal dirty-lake row, not a crash
        val nBytes = if (it.payload == null) 0L else it.payload.length.toLong
        MediaHeader.parse(it.payload) match {
          case Some(info) =>
            MediaProbe(it.id, info.format, nBytes,
              info.width, info.height, info.channels, info.sampleRateHz,
              info.durationMs, it.mediaType)
          case None =>
            MediaProbe(it.id, "unknown", nBytes, 0, 0, 0, 0, 0L, it.mediaType)
        }
      })
  }

  /** Typed decode pass over the media frame produced by [[withMediaColumns]]:
    * `Dataset[MediaItem] → Dataset[MediaFeatures]` via `mapPartitions` with a
    * pluggable [[Codec]] — the per-item kernel is opaque imperative code
    * (image decoding), which is the one place `mapPartitions` beats
    * expressing work as columns.
    */
  def decode(media: DataFrame, codec: Codec = stubCodec): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(
        col("doc_id").as("id"), col("payload"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.media_type").as("mediaType"))
      .as[MediaItem]
      .mapPartitions(codec)
  }

  /** STUB resize: rescales the typed metadata to fit a bounding box and
    * keeps the payload opaque (a real codec would transcode pixels; the
    * metadata arithmetic and column shape are what the pipeline depends
    * on). Aspect ratio preserved with integer math.
    */
  def resizeStub(media: DataFrame, maxDim: Int): DataFrame = {
    val w = col("meta.width")
    val h = col("meta.height")
    val longest = greatest(w, h)
    val nw = when(longest <= maxDim, w)
      .otherwise((w * maxDim).cast("long") / longest).cast("int")
    val nh = when(longest <= maxDim, h)
      .otherwise((h * maxDim).cast("long") / longest).cast("int")
    media.withColumn("meta",
      struct(nw.as("width"), nh.as("height"), col("meta.media_type").as("media_type")))
  }

  /** STUB frame sampling for "video" payloads: treat the binary payload as
    * fixed-size frames and keep every `stride`-th frame as a binary slice —
    * `substr` on binary stays columnar, so the slicing runs inside codegen
    * and only sampled bytes survive the projection. Returns one row per
    * sampled frame: (id, frame_idx, frame bytes).
    */
  def frameSampleStub(media: DataFrame, idCol: String, frameBytes: Int,
                      stride: Int): DataFrame = {
    val nFrames = floor(octet_length(col("payload")).cast("double") / frameBytes).cast("long")
    media.where(nFrames > 0)
      .select(col(idCol), col("payload"),
        explode(sequence(lit(0L), nFrames - 1, lit(stride.toLong))).as("frame_idx"))
      .select(col(idCol), col("frame_idx"),
        col("payload").substr((col("frame_idx") * frameBytes + 1).cast("int"),
          lit(frameBytes)).as("frame"))
  }

  /** Per-media-type rollup of decoded stats — the typical post-decode
    * aggregation (one map-side-combined shuffle on the tiny type key).
    */
  def mediaTypeStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    fakeDecodeStats(withMediaColumns(docs, idCol, textCol))
      .groupBy(col("meta.media_type").as("media_type"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("pixels")).as("total_pixels"),
        min(col("meta.width")).as("min_width"),
        max(col("meta.height")).as("max_height"))
}
