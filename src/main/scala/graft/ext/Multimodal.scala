package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing [EXT]: media payloads as opaque `binary`
  * columns with typed metadata, processed by batched per-partition
  * decode — the Scala analogue of a `mapInPandas` media pipeline.
  *
  * The IMAGE path is a real decode: payloads whose magic bytes say
  * PNG/BMP/JPEG/GIF go through `javax.imageio` (pure JDK, headless),
  * so width/height are genuine pixel dimensions and resize genuinely
  * rescales pixels. The AUDIO path is real too: WAV/AIFF/AU payloads
  * go through `javax.sound.sampled` (also pure JDK), so sample rate,
  * channel count, PCM frame count and duration are genuine, and
  * [[sampleFrames]] splits the DECODED PCM stream at true frame
  * boundaries. Remaining stand-ins — the byte-derived fallback for
  * payloads that are neither (the text corpus posing as media, video
  * containers this JDK can't demux) and the fixed-stride pseudo-frame
  * splitter for those same opaque payloads — are labeled at their
  * definition. The schema, the typed Dataset boundary, the batched
  * partition iteration, and the partitioning story are identical for
  * every path: swapping the fallback for a JNI/ffmpeg call changes no
  * plan shape.
  *
  * Scale notes: feature extraction is a narrow map (no shuffle); the
  * batch loop amortizes per-batch setup (a real decoder's native
  * context) across `BatchSize` rows, exactly like Arrow batches in
  * mapInPandas. Binary payloads stay columnar in parquet; metadata
  * predicates (mime, n_bytes) push down without touching payload
  * bytes.
  */
object Multimodal {

  val BatchSize = 64

  final case class MediaAsset(doc_id: Long, mime: String,
                              payload: Array[Byte])
  /** Per-modality features; fields outside a payload's modality are 0
    * (width/height for audio, sample_rate/n_channels/duration_ms for
    * images and opaque payloads) — a sparse-but-flat schema, so
    * modality predicates (`sample_rate > 0`) stay pushdown-able
    * columns instead of a map lookup.
    */
  final case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
                                 digest: String, width: Int, height: Int,
                                 n_frames: Int, sample_rate: Int,
                                 n_channels: Int, duration_ms: Long)

  /** Wrap documents as binary media assets (text bytes standing in for
    * encoded media — the corpus has no real images; the binary column
    * and its metadata are the point).
    */
  def asAssets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      lit("application/octet-stream").as("mime"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Wrap documents as REAL WAV containers: text bytes as 8-bit
    * unsigned mono PCM at `rate` Hz, written through the JDK's own
    * RIFF writer ([[wavBytes]]). Unlike [[asAssets]]'s opaque
    * payloads, these exercise the genuine audio decode path — the
    * m05 query round-trips synth → container → [[extractFeatures]]
    * and its oracle checks the decoded header facts arithmetically
    * (canonical PCM WAV header = 44 bytes; frames = byte count at
    * 8-bit mono; duration = frames·1000/rate in integer math).
    * Narrow typed mapPartitions, the [[extractFeatures]] boundary.
    */
  def asWavAssets(spark: SparkSession, docs: DataFrame,
                  rate: Int = 8000): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          MediaAsset(id, "audio/wav", wavBytes(
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            rate))
        }
      }.toDF()
  }

  /** A real WAV container around raw 8-bit unsigned mono PCM: the
    * canonical 44-byte RIFF/WAVE header written directly —
    * BYTE-IDENTICAL to what the JDK's `AudioSystem.write` emits for
    * this fixed format (spec-pinned against it), without its
    * per-call provider-registry scan, which dominated m05's synth
    * side at the x10/x30 ladder legs (a synchronized global lookup
    * on every row). The decode side still exercises the real header
    * contract: [[wavHeaderFacts]] must parse exactly these bytes,
    * and javax.sound remains the decoder for every sample consumer.
    */
  private[ext] def wavBytes(pcm: Array[Byte], rate: Int): Array[Byte] = {
    val n = pcm.length
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val b = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes(ascii)).putInt(36 + n)
      .put("WAVE".getBytes(ascii))
      .put("fmt ".getBytes(ascii)).putInt(16)
      .putShort(1).putShort(1) // integer PCM, mono
      .putInt(rate).putInt(rate) // byte rate = rate · 1 channel · 1 B
      .putShort(1).putShort(8) // block align, bits per sample
      .put("data".getBytes(ascii)).putInt(n).put(pcm)
    b.array()
  }

  /** Wrap documents as REAL BMP images — [[asWavAssets]]'s image
    * twin: deterministic per-doc dimensions (w = 4 + n mod 29,
    * h = 3 + 7n mod 23 over the text byte count n) and a pixel
    * gradient seeded by n, encoded through the JDK's own BMP writer.
    * The m06 query decodes them back with the real ImageIO path; its
    * oracle replays the dimension formulas and the 24-bit BMP size
    * contract (54-byte headers + 4-byte-aligned BGR rows) — header
    * facts the decode must READ, since the payload boundary strips
    * everything else.
    */
  def asBmpAssets(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val n = text.getBytes(
            java.nio.charset.StandardCharsets.UTF_8).length
          MediaAsset(id, "image/bmp",
            bmpBytes(4 + n % 29, 3 + (7 * n) % 23, n))
        }
      }.toDF()
  }

  /** A real 24-bit BMP of a deterministic gradient, via ImageIO. */
  private[ext] def bmpBytes(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((x * 37 + y * 101 + seed) & 0xff) << 16 |
          ((x * 13 + y * 7 + seed) & 0xff) << 8 |
          ((x + y + seed) & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream(54 + 4 * w * h)
    javax.imageio.ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  // ---- JPEG marker-segment walk (m12) ----------------------------

  def looksLikeJpeg(payload: Array[Byte]): Boolean =
    payload.length >= 2 && (payload(0) & 0xff) == 0xff &&
      (payload(1) & 0xff) == 0xd8

  /** SOF/EXIF facts of a JPEG, read WITHOUT pixel decode. Orientation
    * is 0 when no EXIF orientation tag is present; `headerBytes` is
    * the offset where entropy-coded data begins (the SOS segment
    * end) — what a range reader needs to fetch for metadata only.
    */
  final case class JpegMeta(width: Int, height: Int, precision: Int,
                            nComponents: Int, orientation: Int,
                            progressive: Boolean, headerBytes: Long,
                            nSegments: Int)

  private def u16be(p: Array[Byte], o: Int): Int =
    ((p(o) & 0xff) << 8) | (p(o + 1) & 0xff)

  /** The EXIF orientation tag (0x0112, SHORT) out of an APP1 `Exif`
    * TIFF block — both byte orders, every offset bounds-checked.
    * None for a structurally broken TIFF (the caller treats that as
    * a framing violation — the strictness of the other walks).
    */
  private def exifOrientation(t: Array[Byte]): Option[Int] = {
    if (t.length < 8) return None
    val le = t(0) == 'I' && t(1) == 'I'
    if (!le && !(t(0) == 'M' && t(1) == 'M')) return None
    def u16(o: Int): Int =
      if (le) (t(o) & 0xff) | ((t(o + 1) & 0xff) << 8)
      else ((t(o) & 0xff) << 8) | (t(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (le) (t(o) & 0xffL) | ((t(o + 1) & 0xffL) << 8) |
        ((t(o + 2) & 0xffL) << 16) | ((t(o + 3) & 0xffL) << 24)
      else ((t(o) & 0xffL) << 24) | ((t(o + 1) & 0xffL) << 16) |
        ((t(o + 2) & 0xffL) << 8) | (t(o + 3) & 0xffL)
    if (u16(2) != 42) return None
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > t.length) return None
    val o0 = ifd.toInt
    val n = u16(o0)
    if (o0 + 2 + 12L * n > t.length) return None
    var i = 0
    var orient = 0
    while (i < n) {
      val e = o0 + 2 + 12 * i
      if (u16(e) == 0x0112 && u16(e + 2) == 3 && u32(e + 4) == 1L)
        orient = u16(e + 8)
      i += 1
    }
    Some(orient)
  }

  /** REAL marker-segment walk for JPEG (ISO 10918-1): SOI, then
    * segments — two-byte big-endian lengths that include themselves,
    * standalone markers (TEM, RSTn) length-free — until SOS, whose
    * end is where entropy-coded data starts. Reads the SOF frame
    * header (precision, height, width, component count; C2 marks
    * progressive) and, from an APP1 `Exif` block, the TIFF
    * orientation tag — the pre-decode facts (dims, orientation) an
    * image-curation pass filters on before any pixel work, for the
    * most common image format. None for non-JPEG or corrupt payloads:
    * truncated segments, a length under 2, a segment past the end, a
    * second SOI, EOI or end-of-bytes before SOF+SOS, zero dims, a
    * broken EXIF TIFF all fail soft (spec-pinned).
    */
  private[ext] def parseJpegMeta(p: Array[Byte]): Option[JpegMeta] = {
    if (!looksLikeJpeg(p)) return None
    val len = p.length
    var off = 2
    var nSeg = 0
    var sof: Option[(Int, Int, Int, Int, Boolean)] = None
    var orient = 0
    while (off + 2 <= len) {
      if ((p(off) & 0xff) != 0xff) return None
      // fill bytes: any run of FFs precedes the marker code
      while (off + 1 < len && (p(off + 1) & 0xff) == 0xff) off += 1
      if (off + 2 > len) return None
      val marker = p(off + 1) & 0xff
      nSeg += 1
      if (marker == 0xd8) return None // a second SOI is hostile
      if (marker == 0xd9) return None // EOI before SOS: no image data
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        off += 2 // standalone: TEM / RSTn carry no length
      } else {
        if (off + 4 > len) return None
        val segLen = u16be(p, off + 2)
        if (segLen < 2 || off + 2 + segLen > len) return None
        val body = off + 4
        val bodyLen = segLen - 2
        if ((marker >= 0xc0 && marker <= 0xcf) && marker != 0xc4 &&
          marker != 0xc8 && marker != 0xcc) {
          // SOF frame header: precision, height, width, components
          if (bodyLen < 6) return None
          val h = u16be(p, body + 1)
          val w = u16be(p, body + 3)
          if (w <= 0 || h <= 0) return None
          sof = Some((w, h, p(body) & 0xff, p(body + 5) & 0xff,
            marker == 0xc2))
        } else if (marker == 0xe1 && bodyLen >= 6 &&
          p(body) == 'E' && p(body + 1) == 'x' && p(body + 2) == 'i' &&
          p(body + 3) == 'f' && p(body + 4) == 0 && p(body + 5) == 0) {
          orient = exifOrientation(
            java.util.Arrays.copyOfRange(p, body + 6, body + bodyLen))
            .getOrElse(return None)
        } else if (marker == 0xda) {
          // SOS: entropy-coded data follows; facts are complete
          return sof.map { case (w, h, prec, comp, prog) =>
            JpegMeta(w, h, prec, comp, orient, prog,
              (off + 2 + segLen).toLong, nSeg)
          }
        }
        off += 2 + segLen
      }
    }
    None // ran out of bytes before SOS
  }

  /** The synth's EXIF APP1 segment: a minimal little-endian TIFF with
    * ONE IFD0 entry — the orientation SHORT. 34 segment bytes.
    */
  private[ext] def app1Exif(orientation: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(36)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(0xff.toByte).put(0xe1.toByte)
    b.put(0x00.toByte).put(34.toByte) // segment length (big-endian 34)
    b.put("Exif".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    b.put(0.toByte).put(0.toByte)
    b.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8) // TIFF hdr
    b.putShort(1) // one IFD0 entry
    b.putShort(0x0112).putShort(3).putInt(1) // orientation, SHORT, ×1
    b.putShort(orientation.toShort).putShort(0) // value + pad
    b.putInt(0) // no next IFD
    b.array()
  }

  /** A REAL JPEG via the JDK's own writer (baseline, 8-bit, 3
    * components for RGB input), with the synth's EXIF APP1 spliced
    * directly after SOI — valid JPEG, and the orientation the m12
    * walk must read back.
    */
  private[ext] def jpegBytes(w: Int, h: Int, seed: Int,
                             orientation: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((x * 37 + y * 101 + seed) & 0xff) << 16 |
          ((x * 13 + y * 7 + seed) & 0xff) << 8 |
          ((x + y + seed) & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream(1024 + w * h)
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    val raw = bos.toByteArray
    raw.take(2) ++ app1Exif(orientation) ++ raw.drop(2)
  }

  /** Wrap documents as REAL JPEGs — [[asBmpAssets]]'s dims formulas
    * (w = 4 + n mod 29, h = 3 + 7n mod 23) plus a deterministic EXIF
    * orientation (1 + n mod 8) over the text byte count n. The m12
    * walk must read dims from the SOF segment and orientation from
    * the spliced EXIF; the oracle replays the three formulas.
    */
  def asJpegAssets(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val n = text.getBytes(
            java.nio.charset.StandardCharsets.UTF_8).length
          MediaAsset(id, "image/jpeg",
            jpegBytes(4 + n % 29, 3 + (7 * n) % 23, n, 1 + n % 8))
        }
      }.toDF()
  }

  final case class JpegFeatures(doc_id: Long, n_bytes: Long,
                                width: Int, height: Int, precision: Int,
                                n_components: Int, orientation: Int,
                                progressive: Boolean, header_bytes: Long)

  /** m12: one facts row per JPEG asset via [[parseJpegMeta]] — zeroed
    * facts for non-JPEG/corrupt payloads (the m05/m10 fail-soft row
    * shape). No pixel decode anywhere on this path.
    */
  def jpegFeatures(spark: SparkSession,
                   assets: DataFrame): Dataset[JpegFeatures] = {
    import spark.implicits._
    assets.as[MediaAsset].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { a =>
          val m = parseJpegMeta(a.payload).getOrElse(
            JpegMeta(0, 0, 0, 0, 0, progressive = false, 0L, 0))
          JpegFeatures(a.doc_id, a.payload.length.toLong, m.width,
            m.height, m.precision, m.nComponents, m.orientation,
            m.progressive, m.headerBytes)
        }
      }
    }
  }

  // ---- PNG chunk walk (m14) --------------------------------------

  def looksLikePng(p: Array[Byte]): Boolean =
    p.length >= 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P' &&
      p(2) == 'N' && p(3) == 'G' && p(4) == 0x0d && p(5) == 0x0a &&
      (p(6) & 0xff) == 0x1a && p(7) == 0x0a

  /** IHDR + chunk-inventory facts (ISO 15948). */
  private[ext] final case class PngMeta(
      width: Int, height: Int, bitDepth: Int, colorType: Int,
      interlace: Int, nChunks: Int, paletteEntries: Int,
      hasAlpha: Boolean, idatBytes: Long, headerBytes: Long)

  /** PNG facts WITHOUT pixel decode (the m12 discipline for the
    * second-most-common web image format): signature, then the chunk
    * train — 4-byte BE length, 4-byte type, data, CRC (carried,
    * never verified — the m09/m10/m11 rule) — with the spec's
    * structural musts enforced: IHDR first and exactly 13 bytes,
    * nonzero dims, compression/filter methods 0, interlace 0/1, PLTE
    * length divisible by 3, at least one IDAT, a zero-length IEND
    * terminating the stream. `headerBytes` = the first IDAT's offset
    * (the metadata prefix a range reader fetches); alpha = color
    * type 4/6 or a tRNS chunk. Any violation → None (fail-soft).
    */
  private[ext] def parsePngMeta(p: Array[Byte]): Option[PngMeta] = {
    if (!looksLikePng(p)) return None
    def be32(i: Int): Int =
      ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
        ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
    var off = 8
    var first = true
    var w = 0; var h = 0; var depth = 0; var ct = 0; var il = 0
    var nChunks = 0; var plte = 0; var alpha = false
    var idat = 0L; var headerBytes = -1L
    var sawEnd = false
    while (!sawEnd) {
      if (off + 8 > p.length) return None // truncated chunk header
      val len = be32(off)
      if (len < 0) return None // >2^31: hostile
      if (off + 8L + len + 4L > p.length) return None // over-running
      val typ = new String(p, off + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      if (first) {
        if (typ != "IHDR" || len != 13) return None
        w = be32(off + 8); h = be32(off + 12)
        if (w <= 0 || h <= 0) return None
        depth = p(off + 16) & 0xff
        ct = p(off + 17) & 0xff
        if ((p(off + 18) & 0xff) != 0 ||
          (p(off + 19) & 0xff) != 0) return None // methods
        il = p(off + 20) & 0xff
        if (il > 1) return None
        first = false
      } else typ match {
        case "PLTE" =>
          if (len % 3 != 0) return None
          plte = len / 3
        case "tRNS" => alpha = true
        case "IDAT" =>
          if (headerBytes < 0) headerBytes = off.toLong
          idat += len.toLong
        case "IEND" =>
          if (len != 0) return None
          sawEnd = true
        case _ => ()
      }
      nChunks += 1
      off += 8 + len + 4
    }
    if (headerBytes < 0) return None // a PNG with no IDAT is not one
    Some(PngMeta(w, h, depth, ct, il, nChunks, plte,
      alpha || ct == 4 || ct == 6, idat, headerBytes))
  }

  /** A real PNG of the shared deterministic gradient, via ImageIO
    * (the JDK writer encodes TYPE_INT_RGB as 8-bit truecolor,
    * non-interlaced, no palette — facts the m14 oracle pins).
    */
  private[ext] def pngBytes(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((x * 37 + y * 101 + seed) & 0xff) << 16 |
          ((x * 13 + y * 7 + seed) & 0xff) << 8 |
          ((x + y + seed) & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream(1024 + w * h)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Documents as REAL PNGs — the m06/m12 dims formulas. */
  def asPngAssets(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val n = text.getBytes(
            java.nio.charset.StandardCharsets.UTF_8).length
          MediaAsset(id, "image/png",
            pngBytes(4 + n % 29, 3 + (7 * n) % 23, n))
        }
      }.toDF()
  }

  final case class PngFeatures(doc_id: Long, n_bytes: Long,
                               width: Int, height: Int, bit_depth: Int,
                               color_type: Int, interlace: Int,
                               palette_entries: Int, has_alpha: Boolean,
                               n_chunks: Int, idat_bytes: Long,
                               header_bytes: Long)

  /** m14: one facts row per PNG asset — zeroed facts for non-PNG or
    * corrupt payloads (the m05/m10/m12 fail-soft row shape).
    */
  def pngFeatures(spark: SparkSession,
                  assets: DataFrame): Dataset[PngFeatures] = {
    import spark.implicits._
    assets.as[MediaAsset].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { a =>
          val m = parsePngMeta(a.payload).getOrElse(
            PngMeta(0, 0, 0, 0, 0, 0, 0, hasAlpha = false, 0L, 0L))
          PngFeatures(a.doc_id, a.payload.length.toLong, m.width,
            m.height, m.bitDepth, m.colorType, m.interlace,
            m.paletteEntries, m.hasAlpha, m.nChunks, m.idatBytes,
            m.headerBytes)
        }
      }
    }
  }

  /** Magic-byte sniff: is this payload an image format the JDK's
    * ImageIO can decode? (PNG, BMP, JPEG, GIF ship with every JDK.)
    * Dispatching on magic — not mime — means a mislabeled asset still
    * decodes, and the sniff is a 4-byte look, not a failed decode.
    */
  def looksLikeImage(payload: Array[Byte]): Boolean =
    payload.length >= 4 && {
      val (b0, b1, b2, b3) =
        (payload(0) & 0xff, payload(1) & 0xff,
          payload(2) & 0xff, payload(3) & 0xff)
      (b0 == 0x89 && b1 == 'P' && b2 == 'N' && b3 == 'G') || // png
      (b0 == 'B' && b1 == 'M') ||                            // bmp
      (b0 == 0xff && b1 == 0xd8) ||                          // jpeg
      (b0 == 'G' && b1 == 'I' && b2 == 'F')                  // gif
    }

  /** Decode a payload to a BufferedImage when it IS an image; None for
    * opaque payloads (and for corrupt bytes behind an image magic —
    * fail-soft to the fallback features rather than poisoning the
    * whole partition). ImageIO's global disk cache is off: these are
    * in-memory byte arrays, a temp-file spool per decode would be
    * pure overhead in an executor.
    */
  private def decodeImage(payload: Array[Byte])
      : Option[java.awt.image.BufferedImage] =
    if (!looksLikeImage(payload)) None
    else {
      javax.imageio.ImageIO.setUseCache(false)
      // NonFatal, not just IOException: the JPEG/GIF plugins throw
      // RuntimeExceptions on some corrupt payloads behind valid magic
      // bytes (CMMException, ArrayIndexOutOfBounds, NegativeArraySize)
      // — any of those escaping here fails the task and poisons the
      // whole partition, the exact thing fail-soft promises not to do.
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }
    }

  private def looksLikeGif(payload: Array[Byte]): Boolean =
    payload.length >= 4 && payload(0) == 'G' && payload(1) == 'I' &&
      payload(2) == 'F'

  /** Count the frames of a GIF payload WITHOUT decoding pixels:
    * `getNumImages(allowSearch = true)` walks the animation stream's
    * block structure only — cheap enough for the per-asset metadata
    * path. None for non-GIF or corrupt payloads (fail-soft as
    * everywhere in this file).
    */
  private def gifFrameCount(payload: Array[Byte]): Option[Int] =
    withGifReader(payload)(r => r.getNumImages(true))
      .filter(_ > 0)

  /** Decode EVERY frame of an animated GIF — the JDK's GIF reader
    * genuinely demuxes the animation stream, so these are real frames
    * (as stored: GIF inter-frame disposal/compositing is a render
    * concern, not a sampling one). None for non-GIF/corrupt payloads.
    */
  private def decodeGifFrames(payload: Array[Byte])
      : Option[IndexedSeq[java.awt.image.BufferedImage]] =
    withGifReader(payload) { r =>
      val n = r.getNumImages(true)
      (0 until n).map(r.read)
    }.filter(_.nonEmpty)

  private def withGifReader[A](payload: Array[Byte])(
      f: javax.imageio.ImageReader => A): Option[A] =
    if (!looksLikeGif(payload)) None
    else
      try {
        javax.imageio.ImageIO.setUseCache(false)
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            // seekForwardOnly = false: getNumImages(true) must search
            try { r.setInput(iis, false, true); Some(f(r)) }
            finally r.dispose()
          }
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic raw-pixel dump (ARGB ints, row-major) — the digest
    * substrate for real frames: identical pixels hash identically
    * regardless of how the container encoded them.
    */
  private def pixelBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val w = img.getWidth; val h = img.getHeight
    val out = java.nio.ByteBuffer.allocate(w * h * 4)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out.putInt(img.getRGB(x, y)); x += 1 }
      y += 1
    }
    out.array()
  }

  /** Magic-byte sniff: is this an audio container the JDK's sampled
    * API can decode? (WAV `RIFF…WAVE`, AIFF/AIFC `FORM…AIF?`, and Sun
    * AU `.snd` ship with every JDK.) Same rationale as
    * [[looksLikeImage]]: dispatch on magic, not mime, and the sniff
    * is a 12-byte look, not a failed decode.
    */
  def looksLikeAudio(payload: Array[Byte]): Boolean =
    payload.length >= 12 && {
      def at(i: Int, s: String): Boolean =
        s.indices.forall(k => (payload(i + k) & 0xff) == s.charAt(k))
      (at(0, "RIFF") && at(8, "WAVE")) ||
      (at(0, "FORM") && at(8, "AIF")) || // AIFF and AIFC
      at(0, ".snd")
    }

  /** Decoded audio: genuine container-header facts plus the raw PCM
    * stream. `frames` is the PCM frame count (one frame = one sample
    * across all channels), `frameSize` its byte width — the real
    * frame boundary [[sampleFrames]] splits at.
    */
  final case class AudioMeta(sampleRate: Int, channels: Int, frames: Long,
                             frameSize: Int, durationMs: Long,
                             pcm: Array[Byte])

  /** Decode a payload via `javax.sound.sampled` when it IS audio;
    * None otherwise. Fail-soft like [[decodeImage]]: corrupt bytes
    * behind a valid audio magic fall back rather than poisoning the
    * partition. With `withPcm = false` only the header facts are read
    * — `getAudioInputStream` parses the container header without
    * touching the stream body, so the feature path never pays the
    * PCM copy (`pcm` comes back empty); [[sampleFrames]] and
    * [[pHash]], which genuinely consume samples, pass true.
    */
  private def decodeAudio(payload: Array[Byte],
                          withPcm: Boolean = true): Option[AudioMeta] =
    if (!looksLikeAudio(payload)) None
    else
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val f = ais.getFormat
          val frames = ais.getFrameLength
          val rate = math.round(f.getSampleRate)
          val durationMs =
            if (rate <= 0 || frames < 0) 0L else frames * 1000L / rate
          Some(AudioMeta(rate, f.getChannels, math.max(frames, 0L),
            math.max(f.getFrameSize, 1), durationMs,
            if (withPcm) ais.readAllBytes()
            else Array.emptyByteArray))
        } finally ais.close()
      } catch { case scala.util.control.NonFatal(_) => None }

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Header-only audio facts for a canonical PCM WAV — (sampleRate,
    * channels, frames, durationMs) straight from the RIFF chunk walk:
    * the fmt chunk carries rate/channels/blockAlign, the data chunk's
    * declared size divided by blockAlign is the frame count (exactly
    * what the JDK's WaveFileReader computes — it trusts the header
    * too, so a truncated body reports identically on both paths).
    * Only format 1 (integer PCM) takes this shortcut: compressed WAVs
    * fall back to the real decoder, whose provider may re-frame them.
    * This is the m05 cost fix: the facts the feature path reports
    * live in the 44-byte header, so decoding (or even copying) the
    * full PCM body for them made m05 the most expensive ladder query.
    */
  private[ext] def wavHeaderFacts(b: Array[Byte])
      : Option[(Int, Int, Long, Long)] = {
    def at(i: Int, s: String): Boolean =
      s.indices.forall(k => (b(i + k) & 0xff) == s.charAt(k))
    if (b.length < 12 || !(at(0, "RIFF") && at(8, "WAVE"))) None
    else {
      var off = 12
      var fmt: Option[(Int, Int, Int, Int)] = None
      var dataSize = -1L
      var ok = true
      while (ok && off + 8 <= b.length && (fmt.isEmpty || dataSize < 0)) {
        val id = fourcc(b, off)
        val size = le32(b, off + 4)
        // also guards the off advance against int overflow (a hostile
        // size field must fail soft into the real decoder, not loop)
        if (size < 0 || size > Int.MaxValue - 9 - off) ok = false
        else {
          if (id == "fmt " && off + 8 + 16 <= b.length)
            fmt = Some((le16(b, off + 8), le16(b, off + 10),
              le32(b, off + 12).toInt, le16(b, off + 20)))
          else if (id == "data") dataSize = size
          // RIFF chunks are word-aligned: odd sizes carry a pad byte
          off += 8 + size.toInt + (size.toInt & 1)
        }
      }
      fmt match {
        case Some((1, ch, rate, ba))
            if ok && dataSize >= 0 && ch > 0 && ba > 0 =>
          val frames = dataSize / ba
          val durationMs =
            if (rate <= 0) 0L else frames * 1000L / rate
          Some((rate, ch, frames, durationMs))
        case _ => None
      }
    }
  }

  /** The feature path's audio facts: the PCM-WAV header walk when the
    * container is that canonical form, the real javax.sound header
    * parse (no PCM copy) otherwise. Identical facts to the full
    * decode on every decodable payload (spec-pinned).
    */
  private def audioHeaderFacts(payload: Array[Byte])
      : Option[(Int, Int, Long, Long)] =
    wavHeaderFacts(payload).orElse(
      decodeAudio(payload, withPcm = false)
        .map(a => (a.sampleRate, a.channels, a.frames, a.durationMs)))

  /** A demuxed AVI: real per-frame payloads plus the main-header
    * facts (dimensions, frame interval) the container records.
    */
  final case class AviMeta(width: Int, height: Int, usPerFrame: Long,
                           frames: IndexedSeq[Array[Byte]])

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** REAL container-level video demux for AVI (RIFF): walk the chunk
    * tree (`LIST` recursion, even-byte chunk padding per the RIFF
    * spec), read the `avih` main header's width/height/frame-interval,
    * and return every `##dc`/`##db` video-frame payload in stream
    * order. This is the genuine demux step of a video pipeline — frame
    * BOUNDARIES and timing come from the container, not from a byte
    * stride. Codec decode is a separate concern: MJPEG-in-AVI frames
    * are plain JPEGs this JDK decodes for real ([[decodeImage]]);
    * other codecs' frames stay opaque payloads (no MP4/WebM/H.264
    * codec ships with the JDK). None for non-AVI or corrupt payloads
    * (fail-soft, as everywhere in this file).
    */
  private[ext] def demuxAvi(payload: Array[Byte]): Option[AviMeta] =
    if (payload.length < 12 || fourcc(payload, 0) != "RIFF" ||
        fourcc(payload, 8) != "AVI ") None
    else
      try {
        var width = 0; var height = 0; var usPerFrame = 0L
        val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
        def walk(start: Int, end: Int): Unit = {
          var off = start
          var ok = true
          while (ok && off + 8 <= end) {
            val id = fourcc(payload, off)
            val sz = le32(payload, off + 4)
            val dataStart = off + 8
            // a size past the buffer marks a truncated/corrupt chunk —
            // stop walking rather than mis-slice
            if (sz < 0 || dataStart + sz > end) ok = false
            else {
              val dataEnd = dataStart + sz.toInt
              if (id == "LIST" && sz >= 4) walk(dataStart + 4, dataEnd)
              else if (id == "avih" && sz >= 40) {
                usPerFrame = le32(payload, dataStart)
                width = le32(payload, dataStart + 32).toInt
                height = le32(payload, dataStart + 36).toInt
              } else if (id(0).isDigit && id(1).isDigit && id(2) == 'd' &&
                  (id(3) == 'c' || id(3) == 'b')) {
                frames += java.util.Arrays.copyOfRange(
                  payload, dataStart, dataEnd)
              }
              off = dataEnd + (sz.toInt & 1) // chunks pad to even
            }
          }
        }
        walk(12, payload.length)
        if (frames.isEmpty) None
        else Some(AviMeta(width, height, usPerFrame, frames.toIndexedSeq))
      } catch { case scala.util.control.NonFatal(_) => None }

  // ---- ISO-BMFF (MP4) container walk --------------------------------

  /** Parsed ISO-BMFF container facts — everything the box tree itself
    * records (codec payloads stay opaque: no H.264/AAC decoder ships
    * with the JDK, exactly like the AVI path's non-MJPEG codecs).
    */
  final case class Mp4Meta(timescale: Long, durationUnits: Long,
                           durationMs: Long, nTracks: Int, nVideo: Int,
                           nAudio: Int, width: Int, height: Int,
                           mdatBytes: Long)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)

  def looksLikeMp4(payload: Array[Byte]): Boolean =
    payload.length >= 12 && fourcc(payload, 4) == "ftyp"

  /** REAL container-level walk for ISO-BMFF (MP4/MOV — the box format
    * of ISO/IEC 14496-12, a pure public byte layout): boxes are
    * big-endian [size][fourcc] with size 1 → a 64-bit largesize and
    * size 0 → "to end of enclosing box"; `moov/trak/mdia` recurse;
    * `mvhd` v0/v1 carries the movie timescale and duration, `tkhd`
    * v0/v1 the 16.16 fixed-point presentation width/height, `hdlr`
    * the per-track handler (vide/soun), and `mdat` the media payload
    * size. duration_ms = duration · 1000 / timescale in integer math
    * — the conversion every MP4 consumer performs. Codec decode is
    * out of scope by design ([[demuxAvi]]'s division of labor); the
    * facts here are the ones a 100 TB video-curation pass filters on
    * BEFORE any decode (duration buckets, resolution gates, track
    * sanity). None for non-MP4 or corrupt payloads — every size field
    * is bounds-checked so a hostile length fails soft instead of
    * looping or mis-slicing (spec-pinned).
    */
  private[ext] def parseMp4(payload: Array[Byte]): Option[Mp4Meta] =
    if (!looksLikeMp4(payload)) None
    else
      try {
        var timescale = 0L; var duration = -1L
        var nTracks = 0; var nVideo = 0; var nAudio = 0
        var width = 0; var height = 0; var mdatBytes = 0L
        var sawMoov = false
        // per-trak state: the first video track's dims win
        def walk(start: Long, end: Long, depth: Int): Boolean = {
          if (depth > 8) return false // box trees are shallow; a deep
          var off = start             // one is hostile — fail soft
          var ok = true
          while (ok && off + 8 <= end) {
            val size0 = be32(payload, off.toInt)
            val id = fourcc(payload, off.toInt + 4)
            // size 1: 64-bit largesize follows; size 0: to end
            val (dataStart, boxEnd) =
              if (size0 == 1L && off + 16 <= end)
                (off + 16, off + be64(payload, off.toInt + 8))
              else if (size0 == 0L) (off + 8, end)
              else (off + 8, off + size0)
            if (boxEnd < dataStart || boxEnd > end) ok = false
            else {
              id match {
                case "moov" =>
                  sawMoov = true
                  ok = walk(dataStart, boxEnd, depth + 1)
                case "trak" =>
                  nTracks += 1
                  ok = walk(dataStart, boxEnd, depth + 1)
                case "mdia" | "minf" =>
                  ok = walk(dataStart, boxEnd, depth + 1)
                case "mvhd" if dataStart + 4 <= boxEnd =>
                  val v = payload(dataStart.toInt) & 0xff
                  // v0: ts at +12, dur32 at +16; v1: ts at +20, dur64
                  if (v == 0 && dataStart + 20 <= boxEnd) {
                    timescale = be32(payload, dataStart.toInt + 12)
                    duration = be32(payload, dataStart.toInt + 16)
                  } else if (v == 1 && dataStart + 32 <= boxEnd) {
                    timescale = be32(payload, dataStart.toInt + 20)
                    duration = be64(payload, dataStart.toInt + 24)
                  }
                case "tkhd" if dataStart + 4 <= boxEnd =>
                  val v = payload(dataStart.toInt) & 0xff
                  // 16.16 fixed width/height close the box (v0: +76,
                  // v1: +88)
                  val wOff = dataStart + (if (v == 1) 88 else 76)
                  if (width == 0 && wOff + 8 <= boxEnd) {
                    val w = (be32(payload, wOff.toInt) >> 16).toInt
                    val h = (be32(payload, wOff.toInt + 4) >> 16).toInt
                    if (w > 0 && h > 0) { width = w; height = h }
                  }
                case "hdlr" if dataStart + 12 <= boxEnd =>
                  fourcc(payload, dataStart.toInt + 8) match {
                    case "vide" => nVideo += 1
                    case "soun" => nAudio += 1
                    case _ => ()
                  }
                case "mdat" => mdatBytes += boxEnd - dataStart
                case _ => ()
              }
              off = boxEnd
            }
          }
          ok
        }
        val ok = walk(0L, payload.length.toLong, 0)
        if (!ok || !sawMoov || timescale <= 0 || duration < 0) None
        else Some(Mp4Meta(timescale, duration,
          duration * 1000L / timescale, nTracks, nVideo, nAudio,
          width, height, mdatBytes))
      } catch { case scala.util.control.NonFatal(_) => None }

  /** Wrap documents as REAL minimal ISO-BMFF containers —
    * [[asWavAssets]]'s video twin: deterministic per-doc facts over
    * the text byte count n (duration 500 + 13n mod 9000 units on the
    * classic 600-unit movie timescale; 1 + n mod 3 tracks alternating
    * vide/soun; the video track's 16.16 dims 16·(4 + n mod 28) ×
    * 16·(3 + 5n mod 17); the text bytes as mdat). The m07 query walks
    * them back ([[parseMp4]]) and its oracle replays the formulas AND
    * the fixed box-size arithmetic (file = 148 + 173·tracks + n
    * bytes), so a writer or parser that drifts from the 14496-12
    * layout mismatches on every row.
    */
  def asMp4Assets(spark: SparkSession, docs: DataFrame,
                  timescale: Long = 600L): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          MediaAsset(id, "video/mp4", mp4Bytes(body, timescale))
        }
      }.toDF()
  }

  /** The minimal valid ISO-BMFF file around `body`: ftyp(24) +
    * moov(8 + mvhd(108) + nTracks·trak(173)) + mdat(8 + n). Every box
    * is the canonical v0 layout at its spec offsets — [[parseMp4]]
    * must read THESE bytes back.
    */
  private[ext] def mp4Bytes(body: Array[Byte],
                            timescale: Long): Array[Byte] = {
    val n = body.length
    val nTracks = 1 + n % 3
    val durUnits = 500L + (n.toLong * 13L) % 9000L
    val w = 16 * (4 + n % 28)
    val h = 16 * (3 + (5 * n) % 17)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val trakSize = 8 + 92 + (8 + 32 + 33)
    val moovSize = 8 + 108 + nTracks * trakSize
    val total = 24 + moovSize + 8 + n
    val b = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    def four(s: String): Unit = { b.put(s.getBytes(ascii)); () }
    // ftyp: major isom, minor 0, compatible [isom, mp41]
    b.putInt(24); four("ftyp"); four("isom"); b.putInt(0)
    four("isom"); four("mp41")
    // moov > mvhd v0 (108 B total)
    b.putInt(moovSize); four("moov")
    b.putInt(108); four("mvhd"); b.putInt(0) // version/flags
    b.putInt(0).putInt(0) // creation, modification
    b.putInt(timescale.toInt).putInt(durUnits.toInt)
    b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, vol
    b.putInt(0).putInt(0) // reserved
    for (m <- Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000))
      b.putInt(m) // unity matrix
    for (_ <- 0 until 6) b.putInt(0) // pre_defined
    b.putInt(nTracks + 1) // next_track_ID
    for (t <- 1 to nTracks) {
      val video = t % 2 == 1 // tracks alternate vide/soun, video first
      b.putInt(trakSize); four("trak")
      // tkhd v0 (92 B total): flags 7 (enabled|in-movie|in-preview)
      b.putInt(92); four("tkhd"); b.putInt(7)
      b.putInt(0).putInt(0) // creation, modification
      b.putInt(t) // track_ID
      b.putInt(0) // reserved
      b.putInt(durUnits.toInt)
      b.putInt(0).putInt(0) // reserved
      b.putShort(0).putShort(0) // layer, alternate_group
      b.putShort(if (video) 0 else 0x0100.toShort).putShort(0) // volume
      for (m <- Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000))
        b.putInt(m)
      b.putInt(if (video) w << 16 else 0) // 16.16 width
      b.putInt(if (video) h << 16 else 0) // 16.16 height
      // mdia (73 B total) > mdhd v0 (32) + hdlr (33)
      b.putInt(8 + 32 + 33); four("mdia")
      b.putInt(32); four("mdhd"); b.putInt(0)
      b.putInt(0).putInt(0) // creation, modification
      b.putInt(timescale.toInt).putInt(durUnits.toInt)
      b.putShort(0x55c4.toShort).putShort(0) // language 'und', predefined
      b.putInt(33); four("hdlr"); b.putInt(0)
      b.putInt(0) // pre_defined
      four(if (video) "vide" else "soun")
      for (_ <- 0 until 3) b.putInt(0) // reserved
      b.put(0.toByte) // empty null-terminated name
    }
    b.putInt(8 + n); four("mdat"); b.put(body)
    b.array()
  }

  final case class Mp4Features(doc_id: Long, n_bytes: Long,
                               timescale: Long, duration_units: Long,
                               duration_ms: Long, n_tracks: Int,
                               n_video: Int, n_audio: Int, width: Int,
                               height: Int, mdat_bytes: Long)

  /** The m07 feature path: walk each asset's box tree and emit the
    * container facts — the same batched narrow-map boundary as
    * [[extractFeatures]]. Payloads that are not (or are corrupt) MP4
    * emit the all-zero fact row rather than failing the task.
    */
  def mp4Features(spark: SparkSession,
                  assets: DataFrame): Dataset[Mp4Features] = {
    import spark.implicits._
    assets.as[MediaAsset].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { a =>
          val m = parseMp4(a.payload).getOrElse(
            Mp4Meta(0L, 0L, 0L, 0, 0, 0, 0, 0, 0L))
          Mp4Features(a.doc_id, a.payload.length.toLong, m.timescale,
            m.durationUnits, m.durationMs, m.nTracks, m.nVideo,
            m.nAudio, m.width, m.height, m.mdatBytes)
        }
      }
    }
  }

  // ---------------------------------------------------------------
  // Matroska / WebM (EBML) — RFC 8794 + the public Matroska element
  // registry: the other major real-world video container next to
  // ISO-BMFF; the same division of labor as parseMp4/demuxAvi
  // (container facts are REAL, codec payloads stay opaque).
  // ---------------------------------------------------------------

  final case class MkvMeta(docType: String, timescaleNs: Long,
                           durationTicks: Long, durationMs: Long,
                           nTracks: Int, nVideo: Int, nAudio: Int,
                           width: Int, height: Int, clusterBytes: Long)

  def looksLikeMkv(payload: Array[Byte]): Boolean =
    payload.length >= 4 && be32(payload, 0) == 0x1A45DFA3L

  /** EBML variable-length integer class: the number of leading zero
    * bits of the FIRST byte + 1 is the total width (RFC 8794 §4).
    * A 0x00 first byte (width > 8) is invalid → -1, caller fails soft.
    */
  private def vintWidth(first: Int): Int =
    if (first == 0) -1
    else java.lang.Integer.numberOfLeadingZeros(first) - 24 + 1

  /** Read an Element ID at `off`: (value INCLUDING the marker bit —
    * the Matroska registry convention — and its width). None when the
    * width is invalid or crosses `end`.
    */
  private def readEbmlId(b: Array[Byte], off: Long,
                         end: Long): Option[(Long, Int)] = {
    if (off + 1 > end) return None
    val w = vintWidth(b(off.toInt) & 0xff)
    if (w < 1 || w > 4 || off + w > end) None
    else {
      var v = 0L
      var i = 0
      while (i < w) { v = (v << 8) | (b(off.toInt + i) & 0xffL); i += 1 }
      Some((v, w))
    }
  }

  /** Read an Element Size at `off`: (value with the marker bit
    * STRIPPED, width, all-ones "unknown size" flag). */
  private def readEbmlSize(b: Array[Byte], off: Long,
                           end: Long): Option[(Long, Int, Boolean)] = {
    if (off + 1 > end) return None
    val first = b(off.toInt) & 0xff
    val w = vintWidth(first)
    if (w < 1 || w > 8 || off + w > end) None
    else {
      var v = (first & (0xff >>> w)).toLong
      var i = 1
      while (i < w) { v = (v << 8) | (b(off.toInt + i) & 0xffL); i += 1 }
      val unknown = v == (1L << (7 * w)) - 1
      Some((v, w, unknown))
    }
  }

  private def beUint(b: Array[Byte], off: Long, len: Long): Long = {
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(off.toInt + i) & 0xffL); i += 1 }
    v
  }

  /** REAL container-level walk for Matroska/WebM: EBML elements are
    * [ID vint][size vint][data] (RFC 8794); the walk recurses through
    * EBML-header/Segment/Info/Tracks/TrackEntry/Video and reads
    * DocType, TimestampScale (ns per tick, Matroska default 1e6 when
    * absent), Duration (a FLOAT in ticks — floored to integer ticks;
    * ms = ticks·scale/1e6 in integer math), per-track TrackType
    * (1=video, 2=audio), the first VIDEO track's PixelWidth/Height
    * (dims planted inside a non-video entry claim nothing), and the
    * summed Cluster payload size (the mdat analogue). Codec decode is
    * out of scope by design ([[parseMp4]]'s division of labor). None
    * for non-EBML or corrupt payloads — every width and size is
    * bounds-checked, depth is capped, and an unknown-size element
    * extends to its parent's end ONLY on the walked MASTER elements
    * (RFC 8794 §6.2 allows unknown size on masters alone — an
    * unknown-size LEAF like TimestampScale would otherwise read the
    * remainder of its parent as payload and yield garbage facts, so
    * it reads as corrupt instead), so hostile lengths fail soft
    * instead of looping or mis-slicing (spec-pinned).
    */
  private[ext] def parseMkv(payload: Array[Byte]): Option[MkvMeta] =
    if (!looksLikeMkv(payload)) None
    else
      try {
        // the master elements this walk recurses into — the only ids
        // an all-ones "unknown size" vint is legal on (RFC 8794 §6.2)
        val unknownSizeMasters = Set(0x1A45DFA3L, 0x18538067L,
          0x1549A966L, 0x1654AE6BL, 0xAEL, 0xE0L, 0x1F43B675L)
        var docType = ""
        var timescale = 0L
        var durTicks = -1L
        var nTracks = 0; var nVideo = 0; var nAudio = 0
        var width = 0; var height = 0; var clusterBytes = 0L
        var sawSegment = false

        // Video settings: the entry-local dims (first-wins per field)
        def walkVideo(start: Long, end: Long): Option[(Int, Int)] = {
          var off = start
          var ok = true
          var w0 = 0; var h0 = 0
          while (ok && off < end) {
            readEbmlId(payload, off, end) match {
              case Some((id, iw)) =>
                readEbmlSize(payload, off + iw, end) match {
                  case Some((sz, sw, unknown)) =>
                    val ds = off + iw + sw
                    val de = ds + sz
                    // everything inside Video settings is a LEAF —
                    // unknown size here is corrupt (RFC 8794 §6.2)
                    if (unknown || de < ds || de > end) ok = false
                    else {
                      id match {
                        case 0xB0 if w0 == 0 =>
                          w0 = beUint(payload, ds, de - ds).toInt
                        case 0xBA if h0 == 0 =>
                          h0 = beUint(payload, ds, de - ds).toInt
                        case _ => ()
                      }
                      off = de
                    }
                  case None => ok = false
                }
              case None => ok = false
            }
          }
          if (ok) Some((w0, h0)) else None
        }

        // TrackEntry content: type + (for video entries) pixel dims,
        // collected locally so the FIRST video track's dims win and a
        // Video element planted inside a non-video entry (hostile
        // nonsense) claims nothing
        def walkTrackEntry(start: Long, end: Long): Boolean = {
          var off = start
          var ok = true
          var isVideo = false
          var w0 = 0; var h0 = 0
          while (ok && off < end) {
            readEbmlId(payload, off, end) match {
              case Some((id, iw)) =>
                readEbmlSize(payload, off + iw, end) match {
                  case Some((sz, sw, unknown)) =>
                    val ds = off + iw + sw
                    // Video settings (0xE0) is the one master inside
                    // a TrackEntry; unknown size on any leaf here
                    // (TrackType, TrackNumber, …) is corrupt
                    val de = if (unknown) end else ds + sz
                    if ((unknown && id != 0xE0L) ||
                        de < ds || de > end) ok = false
                    else {
                      id match {
                        case 0x83 => // TrackType: 1=video, 2=audio
                          beUint(payload, ds, de - ds) match {
                            case 1 => nVideo += 1; isVideo = true
                            case 2 => nAudio += 1
                            case _ => ()
                          }
                        case 0xE0 => // Video settings
                          walkVideo(ds, de) match {
                            case Some((w, h)) =>
                              if (w0 == 0) w0 = w
                              if (h0 == 0) h0 = h
                            case None => ok = false
                          }
                        case _ => ()
                      }
                      off = de
                    }
                  case None => ok = false
                }
              case None => ok = false
            }
          }
          if (ok && isVideo && width == 0 && w0 > 0 && h0 > 0) {
            width = w0; height = h0
          }
          ok
        }

        def walk(start: Long, end: Long, depth: Int): Boolean = {
          if (depth > 8) return false
          var off = start
          var ok = true
          while (ok && off < end) {
            readEbmlId(payload, off, end) match {
              case Some((id, iw)) =>
                readEbmlSize(payload, off + iw, end) match {
                  case Some((sz, sw, unknown)) =>
                    val ds = off + iw + sw
                    // unknown size extends to the parent's end ONLY
                    // on the walked masters; a leaf (TimestampScale,
                    // Duration, DocType, …) with an all-ones size
                    // would swallow the rest of its parent as payload
                    val de = if (unknown) end else ds + sz
                    if ((unknown && !unknownSizeMasters(id)) ||
                        de < ds || de > end) ok = false
                    else {
                      id match {
                        case 0x1A45DFA3L => // EBML header
                          ok = walk(ds, de, depth + 1)
                        case 0x4282 => // DocType (NUL-padded per spec)
                          docType = new String(payload, ds.toInt,
                            (de - ds).toInt,
                            java.nio.charset.StandardCharsets.US_ASCII)
                            .takeWhile(_ != '\u0000')
                        case 0x18538067L => // Segment
                          sawSegment = true
                          ok = walk(ds, de, depth + 1)
                        case 0x1549A966L => // Info
                          ok = walk(ds, de, depth + 1)
                        case 0x2AD7B1 => // TimestampScale (ns/tick)
                          timescale = beUint(payload, ds, de - ds)
                        case 0x4489 if de - ds == 4 => // Duration f32
                          durTicks = java.lang.Float.intBitsToFloat(
                            be32(payload, ds.toInt).toInt)
                            .toDouble.toLong
                        case 0x4489 if de - ds == 8 => // Duration f64
                          durTicks = java.lang.Double.longBitsToDouble(
                            be64(payload, ds.toInt)).toLong
                        case 0x1654AE6BL => // Tracks
                          ok = walk(ds, de, depth + 1)
                        case 0xAE => // TrackEntry
                          nTracks += 1
                          ok = walkTrackEntry(ds, de)
                        case 0x1F43B675L => // Cluster (mdat twin)
                          clusterBytes += de - ds
                        case _ => ()
                      }
                      off = de
                    }
                  case None => ok = false
                }
              case None => ok = false
            }
          }
          ok
        }

        val ok = walk(0L, payload.length.toLong, 0)
        val ts = if (timescale > 0) timescale else 1000000L
        if (!ok || !sawSegment || durTicks < 0) None
        else Some(MkvMeta(docType, ts, durTicks,
          durTicks * ts / 1000000L, nTracks, nVideo, nAudio,
          width, height, clusterBytes))
      } catch { case scala.util.control.NonFatal(_) => None }

  /** Wrap documents as REAL minimal Matroska/WebM containers —
    * [[asMp4Assets]]'s EBML twin: deterministic per-doc facts over
    * the text byte count n (duration 700 + 11n mod 8000 ticks on a
    * 500 µs TimestampScale → ms = ticks/2 in integer math; 1 + n mod
    * 3 tracks alternating video/audio; the video track's pixel dims
    * 8·(10 + n mod 100) × 8·(6 + 3n mod 70); the text bytes inside
    * one Cluster's SimpleBlock). Every size field is written as an
    * 8-byte vint (legal non-minimal EBML), so the file size is the
    * fixed arithmetic 130 + 60·n_video + 29·n_audio + n the m08
    * oracle replays — a writer or parser drifting from RFC 8794
    * mismatches on every row.
    */
  def asMkvAssets(spark: SparkSession, docs: DataFrame,
                  timescaleNs: Long = 500000L): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          MediaAsset(id, "video/webm", mkvBytes(body, timescaleNs))
        }
      }.toDF()
  }

  /** The minimal valid EBML/Matroska file around `body` — every size
    * an 8-byte vint, every element at its registry ID: EBML(DocType
    * "webm") + Segment(Info(TimestampScale + Duration f64) +
    * Tracks(TrackEntry···) + Cluster(Timestamp + SimpleBlock(body))).
    * [[parseMkv]] must read THESE bytes back.
    */
  private[ext] def mkvBytes(body: Array[Byte],
                            timescaleNs: Long): Array[Byte] = {
    val n = body.length
    val nTracks = 1 + n % 3
    val nVideo = (nTracks + 1) / 2
    val nAudio = nTracks / 2
    val durTicks = 700L + (n.toLong * 11L) % 8000L
    val w = 8 * (10 + n % 100)
    val h = 8 * (6 + (3 * n) % 70)
    val tracksContent = nVideo * 60 + nAudio * 29
    val segContent = 45 + (12 + tracksContent) + (35 + n)
    val total = 26 + 12 + segContent
    val b = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    def size8(v: Long): Unit = { // 8-byte vint: 0x01 marker + 56 bits
      b.put(0x01.toByte)
      var i = 6
      while (i >= 0) { b.put(((v >>> (8 * i)) & 0xff).toByte); i -= 1 }
    }
    def id(bytes: Int*): Unit = bytes.foreach(x => b.put(x.toByte))
    // EBML header: DocType "webm"
    id(0x1A, 0x45, 0xDF, 0xA3); size8(14)
    id(0x42, 0x82); size8(4)
    b.put("webm".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    // Segment
    id(0x18, 0x53, 0x80, 0x67); size8(segContent)
    //   Info: TimestampScale (4B uint) + Duration (f64)
    id(0x15, 0x49, 0xA9, 0x66); size8(33)
    id(0x2A, 0xD7, 0xB1); size8(4); b.putInt(timescaleNs.toInt)
    id(0x44, 0x89); size8(8); b.putDouble(durTicks.toDouble)
    //   Tracks
    id(0x16, 0x54, 0xAE, 0x6B); size8(tracksContent)
    for (t <- 1 to nTracks) {
      val video = t % 2 == 1 // alternate video/audio, video first
      id(0xAE); size8(if (video) 51 else 20)
      id(0xD7); size8(1); b.put(t.toByte)           // TrackNumber
      id(0x83); size8(1); b.put(if (video) 1.toByte else 2.toByte)
      if (video) {
        id(0xE0); size8(22)
        id(0xB0); size8(2); b.putShort(w.toShort)   // PixelWidth
        id(0xBA); size8(2); b.putShort(h.toShort)   // PixelHeight
      }
    }
    //   Cluster: Timestamp 0 + SimpleBlock(track 1, ts 0, key, body)
    id(0x1F, 0x43, 0xB6, 0x75); size8(23 + n)
    id(0xE7); size8(1); b.put(0.toByte)
    id(0xA3); size8(4 + n)
    b.put(0x81.toByte).putShort(0.toShort).put(0x80.toByte).put(body)
    b.array()
  }

  final case class MkvFeatures(doc_id: Long, n_bytes: Long,
                               doc_type: String, timescale_ns: Long,
                               duration_ticks: Long, duration_ms: Long,
                               n_tracks: Int, n_video: Int,
                               n_audio: Int, width: Int, height: Int,
                               cluster_bytes: Long)

  /** The m08 feature path: walk each asset's EBML tree and emit the
    * container facts — the same batched narrow-map boundary as
    * [[mp4Features]]. Non-EBML or corrupt payloads emit the all-zero
    * fact row rather than failing the task.
    */
  def mkvFeatures(spark: SparkSession,
                  assets: DataFrame): Dataset[MkvFeatures] = {
    import spark.implicits._
    assets.as[MediaAsset].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { a =>
          val m = parseMkv(a.payload).getOrElse(
            MkvMeta("", 0L, 0L, 0L, 0, 0, 0, 0, 0, 0L))
          MkvFeatures(a.doc_id, a.payload.length.toLong, m.docType,
            m.timescaleNs, m.durationTicks, m.durationMs, m.nTracks,
            m.nVideo, m.nAudio, m.width, m.height, m.clusterBytes)
        }
      }
    }
  }

  // ---------------------------------------------------------------
  // MP3 (MPEG-1/2/2.5 Audio Layer III) — ISO/IEC 11172-3 frame
  // headers + the ID3v2 tag envelope (id3.org, public): the most
  // common real-world audio file; the same division of labor as the
  // other walks (frame-header facts are REAL, the audio payload
  // stays opaque — no codec decode).
  // ---------------------------------------------------------------

  final case class Mp3Meta(id3Bytes: Long, nFrames: Int,
                           bitrateKbps: Int, sampleRate: Int,
                           nChannels: Int, durationMs: Long,
                           audioBytes: Long)

  /** MPEG-1 Layer III bitrate table (kbps, index 1..14; 0 = free and
    * 15 = bad are refused) — ISO 11172-3 Table B.2, shared with the
    * m09 oracle generator so the two cannot drift.
    */
  private[graft] val Mp3BitrateKbpsV1L3: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-2/2.5 Layer III bitrates (ISO 13818-3). */
  private[ext] val Mp3BitrateKbpsV2L3: Array[Int] =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  /** Sample rates by version: MPEG-1 / MPEG-2 / MPEG-2.5 rows,
    * sampling-frequency-index columns (index 3 = reserved, refused).
    * The MPEG-1 row is shared with the m09 oracle generator.
    */
  private[graft] val Mp3SampleRatesV1: Array[Int] =
    Array(44100, 48000, 32000)
  private[ext] val Mp3SampleRatesV2: Array[Int] =
    Array(22050, 24000, 16000)
  private[ext] val Mp3SampleRatesV25: Array[Int] =
    Array(11025, 12000, 8000)

  def looksLikeMp3(payload: Array[Byte]): Boolean =
    payload.length >= 4 &&
      ((payload(0) == 'I' && payload(1) == 'D' && payload(2) == '3') ||
        ((payload(0) & 0xff) == 0xff && (payload(1) & 0xe0) == 0xe0))

  /** REAL frame walk for MP3: an optional ID3v2 envelope ("ID3",
    * version, flags, 4 SYNCSAFE size bytes — high bit must be clear,
    * RFC-style 7-bit groups; the 0x10 footer flag adds 10 bytes),
    * then Layer III frames tiling EXACTLY to the end of the payload:
    * each 4-byte header carries the 11-bit sync, version (MPEG-1/2/
    * 2.5; the reserved code is corrupt), layer (III only — the walk's
    * scope), bitrate and sampling-frequency indices (free/bad/
    * reserved codes are corrupt), padding and channel mode; frame
    * length is the standard integer arithmetic
    * samplesPerFrame/8 · bitrate / sampleRate + padding
    * (1152 samples MPEG-1, 576 MPEG-2/2.5). The sample rate must be
    * constant across frames (one duration divisor); bitrate may vary
    * (VBR) — the reported bitrate is the FIRST frame's, duration is
    * Σ samples · 1000 / rate in integer math. None for non-MP3 or
    * corrupt payloads — every size is bounds-checked and the frames
    * must tile to the payload end, so hostile or truncated bytes fail
    * soft instead of mis-slicing (spec-pinned).
    */
  private[ext] def parseMp3(payload: Array[Byte]): Option[Mp3Meta] =
    if (!looksLikeMp3(payload)) None
    else
      try {
        val len = payload.length
        var off = 0L
        var id3Bytes = 0L
        if (payload(0) == 'I' && payload(1) == 'D' && payload(2) == '3') {
          if (len < 10) return None
          val flags = payload(5) & 0xff
          var tag = 0L
          var i = 6
          while (i < 10) {
            val b = payload(i) & 0xff
            if ((b & 0x80) != 0) return None // not syncsafe: corrupt
            tag = (tag << 7) | b
            i += 1
          }
          id3Bytes = 10L + tag + (if ((flags & 0x10) != 0) 10L else 0L)
          off = id3Bytes
          if (off > len) return None
        }
        var nFrames = 0
        var totalSamples = 0L
        var firstKbps = 0; var rate = 0; var channels = 0
        var ver0 = -1; var srIdx0 = -1
        while (off < len) {
          if (off + 4 > len) return None // truncated header
          val b1 = payload(off.toInt + 1) & 0xff
          val b2 = payload(off.toInt + 2) & 0xff
          val b3 = payload(off.toInt + 3) & 0xff
          if ((payload(off.toInt) & 0xff) != 0xff ||
            (b1 & 0xe0) != 0xe0) return None
          val ver = (b1 >> 3) & 3   // 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
          val layer = (b1 >> 1) & 3 // 1 = Layer III
          if (ver == 1 || layer != 1) return None
          val bIdx = (b2 >> 4) & 15
          val srIdx = (b2 >> 2) & 3
          val pad = (b2 >> 1) & 1
          val mode = (b3 >> 6) & 3
          if (bIdx == 0 || bIdx == 15 || srIdx == 3) return None
          if (nFrames == 0) { ver0 = ver; srIdx0 = srIdx }
          else if (ver != ver0 || srIdx != srIdx0) return None
          val kbps = (if (ver == 3) Mp3BitrateKbpsV1L3
                      else Mp3BitrateKbpsV2L3)(bIdx)
          val r = ver match {
            case 3 => Mp3SampleRatesV1(srIdx)
            case 2 => Mp3SampleRatesV2(srIdx)
            case _ => Mp3SampleRatesV25(srIdx)
          }
          val spf = if (ver == 3) 1152 else 576
          val frameLen = (spf / 8).toLong * kbps * 1000L / r + pad
          if (frameLen <= 4 || off + frameLen > len) return None
          if (nFrames == 0) {
            firstKbps = kbps; rate = r
            channels = if (mode == 3) 1 else 2
          }
          totalSamples += spf
          nFrames += 1
          off += frameLen
        }
        if (nFrames == 0) None // a bare ID3 tag is not an MP3 stream
        else Some(Mp3Meta(id3Bytes, nFrames, firstKbps, rate, channels,
          totalSamples * 1000L / rate, len - id3Bytes))
      } catch { case scala.util.control.NonFatal(_) => None }

  /** Wrap documents as REAL minimal MP3 files — the audio twin of
    * [[asMp4Assets]]/[[asMkvAssets]]: the text bytes ride INSIDE the
    * ID3v2 tag (tag size = n, the standard metadata envelope), then
    * deterministic-over-n MPEG-1 Layer III frames: sample rate
    * index n mod 3, bitrate index 1 + n mod 14, 2 + n mod 24 frames,
    * mono for even n / stereo for odd, zero padding bits. The m09
    * query walks them back ([[parseMp3]]) and its oracle replays the
    * fact formulas AND the frame-length arithmetic
    * (144000·kbps // rate), so a writer or parser drifting from the
    * 11172-3 layout mismatches on every row.
    */
  def asMp3Assets(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          MediaAsset(id, "audio/mpeg", mp3Bytes(body))
        }
      }.toDF()
  }

  /** The minimal valid MP3 around `body`: ID3v2.4 header with
    * syncsafe size n + the n body bytes, then the deterministic frame
    * train — every frame the canonical 4-byte header + zero payload.
    * [[parseMp3]] must read THESE bytes back.
    */
  private[ext] def mp3Bytes(body: Array[Byte]): Array[Byte] = {
    val n = body.length
    val srIdx = n % 3
    val bIdx = 1 + n % 14
    val nFrames = 2 + n % 24
    val mono = n % 2 == 0
    val kbps = Mp3BitrateKbpsV1L3(bIdx)
    val rate = Mp3SampleRatesV1(srIdx)
    val frameLen = (144L * kbps * 1000L / rate).toInt // pad = 0
    val b = java.nio.ByteBuffer.allocate(10 + n + nFrames * frameLen)
    b.put("ID3".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    b.put(0x04.toByte).put(0x00.toByte) // v2.4.0
    b.put(0x00.toByte)                  // flags: no footer
    b.put(((n >>> 21) & 0x7f).toByte).put(((n >>> 14) & 0x7f).toByte)
    b.put(((n >>> 7) & 0x7f).toByte).put((n & 0x7f).toByte)
    b.put(body)
    val hdr2 = ((bIdx << 4) | (srIdx << 2)).toByte // no padding/private
    val hdr3 = (if (mono) 0xc0 else 0x00).toByte   // mode, rest zero
    for (_ <- 0 until nFrames) {
      val at = b.position()
      b.put(0xff.toByte).put(0xfb.toByte) // sync, MPEG1, L3, no CRC
      b.put(hdr2).put(hdr3)
      b.position(at + frameLen) // zero audio payload
    }
    b.array()
  }

  final case class Mp3Features(doc_id: Long, n_bytes: Long,
                               id3_bytes: Long, n_frames: Int,
                               bitrate_kbps: Int, sample_rate: Int,
                               n_channels: Int, duration_ms: Long,
                               audio_bytes: Long)

  /** The m09 feature path: walk each asset's ID3 envelope + frame
    * train and emit the container facts — the same batched narrow-map
    * boundary as [[mp4Features]]/[[mkvFeatures]]. Non-MP3 or corrupt
    * payloads emit the all-zero fact row rather than failing the task.
    */
  def mp3Features(spark: SparkSession,
                  assets: DataFrame): Dataset[Mp3Features] = {
    import spark.implicits._
    assets.as[MediaAsset].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { a =>
          val m = parseMp3(a.payload).getOrElse(
            Mp3Meta(0L, 0, 0, 0, 0, 0L, 0L))
          Mp3Features(a.doc_id, a.payload.length.toLong, m.id3Bytes,
            m.nFrames, m.bitrateKbps, m.sampleRate, m.nChannels,
            m.durationMs, m.audioBytes)
        }
      }
    }
  }

  // ---- ID3v2 text-frame extraction (m13) ---------------------------

  /** Shared formula constants: synth writer + m13 oracle generator. */
  private[graft] val Id3TitlePrefix = "doc-"
  private[graft] val Id3ArtistPrefix = "artist-"
  private[graft] val Id3AlbumPrefix = "album-"
  private[graft] val Id3PrivOwner = "graft"
  private[graft] val Id3ArtistMod = 7L
  private[graft] val Id3AlbumMod = 5L
  private[graft] val Id3PadMod = 11

  /** Walk the ID3v2 tag's FRAMES — the text metadata (TIT2 title,
    * TPE1 artist, TALB album, any `T***`) a curation pass filters on,
    * read with the same syncsafe arithmetic [[parseMp3]] already uses
    * for the envelope. v2.4 frame sizes are syncsafe, v2.3 plain
    * big-endian (the version byte dispatches); an extended header is
    * skipped by its own declared size; padding (a zero byte where a
    * frame ID should start) ends the walk. Text payloads decode from
    * ISO-8859-1 (0x00) or UTF-8 (0x03) with trailing NULs stripped;
    * non-text frames are counted, never decoded. None for hostile
    * framing: a non-tag payload, a truncated tag, a frame ID outside
    * [A-Z0-9]{4}, a non-syncsafe v2.4 size byte, a frame overrunning
    * the tag, an unsupported text encoding (UTF-16 — out of scope,
    * refused rather than mangled).
    *
    * Returns (all-frame count, ordered `T***` (id, text) pairs).
    */
  private[ext] def id3TextFrames(p: Array[Byte])
      : Option[(Int, Seq[(String, String)])] = {
    if (p.length < 10 || p(0) != 'I' || p(1) != 'D' || p(2) != '3')
      return None
    val ver = p(3) & 0xff
    if (ver != 3 && ver != 4) return None
    val flags = p(5) & 0xff
    def syncsafe(o: Int): Long = {
      var v = 0L
      var i = 0
      while (i < 4) {
        val b = p(o + i) & 0xff
        if ((b & 0x80) != 0) return -1L
        v = (v << 7) | b
        i += 1
      }
      v
    }
    val tag = syncsafe(6)
    if (tag < 0 || 10L + tag > p.length) return None
    val end = (10L + tag).toInt
    var off = 10
    if ((flags & 0x40) != 0) { // extended header: skip by its size
      if (off + 4 > end) return None
      val ext = if (ver == 4) syncsafe(off)
        else ((p(off) & 0xffL) << 24) | ((p(off + 1) & 0xffL) << 16) |
          ((p(off + 2) & 0xffL) << 8) | (p(off + 3) & 0xffL)
      // v2.4 ext size INCLUDES its own 4+2 bytes; v2.3 excludes them
      val skip = if (ver == 4) ext else ext + 4L
      if (ext < 0 || off + skip > end) return None
      off += skip.toInt
    }
    var nFrames = 0
    val texts = Seq.newBuilder[(String, String)]
    while (off < end && p(off) != 0) {
      if (off + 10 > end) return None
      val id = new String(p, off, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      if (!id.forall(c => (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')))
        return None
      val size = if (ver == 4) syncsafe(off + 4)
        else ((p(off + 4) & 0xffL) << 24) | ((p(off + 5) & 0xffL) << 16) |
          ((p(off + 6) & 0xffL) << 8) | (p(off + 7) & 0xffL)
      if (size < 0 || off + 10L + size > end) return None
      if (id.startsWith("T") && size >= 1) {
        val enc = p(off + 10) & 0xff
        val cs = enc match {
          case 0x00 => java.nio.charset.StandardCharsets.ISO_8859_1
          case 0x03 => java.nio.charset.StandardCharsets.UTF_8
          case _ => return None // UTF-16 forms: refused, not mangled
        }
        texts += id -> new String(p, off + 11, size.toInt - 1, cs)
          .replaceAll("\u0000+$", "")
      }
      nFrames += 1
      off += 10 + size.toInt
    }
    Some((nFrames, texts.result()))
  }

  /** A REAL ID3v2.4-tagged MP3: TIT2/TPE1/TALB text frames with
    * deterministic values over (id, n), the document bytes in a PRIV
    * frame (binary — counted, never decoded), n mod [[Id3PadMod]]
    * padding, then [[mp3Bytes]]'s exact frame train — so
    * [[parseMp3]]'s m09 facts hold on tagged files too (spec-pinned).
    */
  private[ext] def mp3TaggedBytes(id: Long,
                                  body: Array[Byte]): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    def textFrame(fid: String, v: String): Array[Byte] = {
      val vb = v.getBytes(ascii)
      val size = 1 + vb.length
      fid.getBytes(ascii) ++ Array(
        ((size >>> 21) & 0x7f).toByte, ((size >>> 14) & 0x7f).toByte,
        ((size >>> 7) & 0x7f).toByte, (size & 0x7f).toByte,
        0.toByte, 0.toByte, 0x03.toByte) ++ vb
    }
    val priv = {
      val size = Id3PrivOwner.length + 1 + body.length
      "PRIV".getBytes(ascii) ++ Array(
        ((size >>> 21) & 0x7f).toByte, ((size >>> 14) & 0x7f).toByte,
        ((size >>> 7) & 0x7f).toByte, (size & 0x7f).toByte,
        0.toByte, 0.toByte) ++ Id3PrivOwner.getBytes(ascii) ++
        Array(0.toByte) ++ body
    }
    val n = body.length
    val frames = textFrame("TIT2", Id3TitlePrefix + id) ++
      textFrame("TPE1", Id3ArtistPrefix + (id % Id3ArtistMod)) ++
      textFrame("TALB", Id3AlbumPrefix + (id % Id3AlbumMod)) ++ priv
    val pad = n % Id3PadMod
    val tag = frames.length + pad
    val hdr = "ID3".getBytes(ascii) ++ Array(0x04.toByte, 0x00.toByte,
      0x00.toByte,
      ((tag >>> 21) & 0x7f).toByte, ((tag >>> 14) & 0x7f).toByte,
      ((tag >>> 7) & 0x7f).toByte, (tag & 0x7f).toByte)
    // the m09 frame train, byte for byte (mp3Bytes minus ITS tag)
    val train = mp3Bytes(body).drop(10 + n)
    hdr ++ frames ++ new Array[Byte](pad) ++ train
  }

  def asMp3TaggedAssets(spark: SparkSession,
                        docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          MediaAsset(id, "audio/mpeg", mp3TaggedBytes(id, text.getBytes(
            java.nio.charset.StandardCharsets.UTF_8)))
        }
      }.toDF()
  }

  final case class Id3Tags(doc_id: Long, n_id3_frames: Int,
                           n_text_frames: Int, title: Option[String],
                           artist: Option[String], album: Option[String],
                           tag_bytes: Long)

  /** m13: text-frame facts per tagged asset — zeroed/None row for
    * payloads whose tag fails the walk (the m09 fail-soft shape).
    * tag_bytes is [[parseMp3]]'s envelope figure (header + declared
    * size) — the two walks share the syncsafe arithmetic.
    */
  def id3Tags(spark: SparkSession, assets: DataFrame): Dataset[Id3Tags] = {
    import spark.implicits._
    assets.as[MediaAsset].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { a =>
          id3TextFrames(a.payload) match {
            case Some((nf, ts)) =>
              val m = ts.toMap
              Id3Tags(a.doc_id, nf, ts.size, m.get("TIT2"),
                m.get("TPE1"), m.get("TALB"),
                parseMp3(a.payload).map(_.id3Bytes).getOrElse(0L))
            case None => Id3Tags(a.doc_id, 0, 0, None, None, None, 0L)
          }
        }
      }
    }
  }

  final case class FlacMeta(metaBytes: Long, nBlocks: Int,
                            sampleRate: Int, nChannels: Int,
                            bitsPerSample: Int, totalSamples: Long,
                            durationMs: Long, audioBytes: Long)

  /** The synth's sample-rate / bit-depth menus (all spec-legal FLAC
    * values) — shared with the m10 oracle generator so the two cannot
    * drift. FLAC's STREAMINFO carries the rate as a 20-bit literal
    * (no index table in the format itself).
    */
  private[graft] val FlacSampleRates: Array[Int] =
    Array(8000, 16000, 22050, 24000, 32000, 44100, 48000, 96000)
  private[graft] val FlacBitDepths: Array[Int] = Array(8, 12, 16, 20, 24)

  def looksLikeFlac(payload: Array[Byte]): Boolean =
    payload.length >= 4 && payload(0) == 'f' && payload(1) == 'L' &&
      payload(2) == 'a' && payload(3) == 'C'

  /** REAL metadata walk for FLAC (the xiph format spec / RFC 9639):
    * the "fLaC" magic, then metadata blocks — 1-byte header (bit 7 =
    * last-block flag, bits 0–6 = type; 127 is invalid) + 24-bit
    * big-endian length — with STREAMINFO (type 0, exactly 34 bytes)
    * REQUIRED first: min/max block size, min/max frame size, then the
    * packed 64 bits of sample rate (20b, 0 is invalid), channels−1
    * (3b), bits-per-sample−1 (5b) and total samples (36b), and the
    * 16-byte MD5. The walk stops at the last-flagged block — the
    * audio frames after it are counted as bytes, not parsed (the
    * pre-decode filter shape: CRC-less header facts without touching
    * codec data). None for non-FLAC or corrupt payloads — every
    * length is bounds-checked, a first block that is not a 34-byte
    * STREAMINFO is refused — so hostile or truncated bytes fail soft
    * instead of mis-slicing (spec-pinned).
    */
  private[ext] def parseFlac(payload: Array[Byte]): Option[FlacMeta] =
    if (!looksLikeFlac(payload)) None
    else
      try {
        val len = payload.length
        var off = 4L
        var nBlocks = 0
        var last = false
        var rate = 0; var ch = 0; var bps = 0; var tot = 0L
        while (!last) {
          if (off + 4 > len) return None // truncated block header
          val h = payload(off.toInt) & 0xff
          last = (h & 0x80) != 0
          val btype = h & 0x7f
          if (btype == 127) return None // invalid type per spec
          val blen = ((payload(off.toInt + 1) & 0xff) << 16) |
            ((payload(off.toInt + 2) & 0xff) << 8) |
            (payload(off.toInt + 3) & 0xff)
          if (nBlocks == 0) {
            if (btype != 0 || blen != 34) return None // STREAMINFO first
            val b = off.toInt + 4
            if (b + 34 > len) return None
            val b10 = payload(b + 10) & 0xff
            val b11 = payload(b + 11) & 0xff
            val b12 = payload(b + 12) & 0xff
            val b13 = payload(b + 13) & 0xff
            rate = (b10 << 12) | (b11 << 4) | (b12 >>> 4)
            ch = ((b12 >>> 1) & 7) + 1
            bps = (((b12 & 1) << 4) | (b13 >>> 4)) + 1
            tot = ((b13 & 0x0f).toLong << 32) |
              ((payload(b + 14) & 0xff).toLong << 24) |
              ((payload(b + 15) & 0xff).toLong << 16) |
              ((payload(b + 16) & 0xff).toLong << 8) |
              (payload(b + 17) & 0xff).toLong
            if (rate == 0) return None // spec: 0 is invalid
          }
          off += 4L + blen
          if (off > len) return None // length past payload end
          nBlocks += 1
        }
        Some(FlacMeta(off, nBlocks, rate, ch, bps, tot,
          tot * 1000L / rate, len - off))
      } catch { case scala.util.control.NonFatal(_) => None }

  /** Wrap documents as REAL minimal FLAC files — the lossless-audio
    * sibling of [[asMp3Assets]]: a spec-correct STREAMINFO (rate /
    * channels / bit depth / total samples deterministic over the text
    * byte count n, packed into the 64-bit field exactly as RFC 9639
    * lays it out), then the text bytes as the LAST metadata block (a
    * VORBIS_COMMENT envelope of length n — the standard tag block),
    * then 1 + n mod 17 unparsed audio-section bytes. The m10 query
    * walks them back ([[parseFlac]]) and its oracle replays the fact
    * formulas and the size arithmetic, so a writer or parser drifting
    * from the layout mismatches on every row.
    */
  def asFlacAssets(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          MediaAsset(id, "audio/flac", flacBytes(body))
        }
      }.toDF()
  }

  /** The minimal valid FLAC around `body`: magic + STREAMINFO +
    * body-bearing VORBIS_COMMENT (last block) + the zeroed audio
    * section. [[parseFlac]] must read THESE bytes back.
    */
  private[ext] def flacBytes(body: Array[Byte]): Array[Byte] = {
    val n = body.length
    val rate = FlacSampleRates(n % 8)
    val ch = 1 + n % 8
    val bps = FlacBitDepths(n % 5)
    val total = 1000L + (n.toLong * 441L) % 1000000L
    val audio = 1 + n % 17
    val b = java.nio.ByteBuffer.allocate(4 + 38 + 4 + n + audio)
    b.put("fLaC".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    // STREAMINFO: not last, type 0, 24-bit length 34
    b.put(0x00.toByte).put(0x00.toByte).put(0x00.toByte).put(34.toByte)
    b.putShort(4096.toShort).putShort(4096.toShort) // min/max block size
    b.put(0.toByte).put(0.toByte).put(0.toByte)     // min frame size: unknown
    b.put(0.toByte).put(0.toByte).put(0.toByte)     // max frame size: unknown
    b.put((rate >>> 12).toByte)
    b.put(((rate >>> 4) & 0xff).toByte)
    b.put((((rate & 0xf) << 4) | ((ch - 1) << 1) |
      ((bps - 1) >>> 4)).toByte)
    b.put(((((bps - 1) & 0xf) << 4) | ((total >>> 32) & 0xf).toInt).toByte)
    b.put(((total >>> 24) & 0xff).toByte)
    b.put(((total >>> 16) & 0xff).toByte)
    b.put(((total >>> 8) & 0xff).toByte)
    b.put((total & 0xff).toByte)
    b.put(new Array[Byte](16)) // MD5: unknown (zeros are legal)
    // VORBIS_COMMENT, LAST block, length n, the body bytes
    b.put((0x80 | 4).toByte)
    b.put(((n >>> 16) & 0xff).toByte).put(((n >>> 8) & 0xff).toByte)
    b.put((n & 0xff).toByte)
    b.put(body)
    // the audio section: `audio` zero bytes, counted not parsed
    b.array()
  }

  final case class OggMeta(nPages: Int, nStreams: Int,
                           vorbisChannels: Int, vorbisRate: Int,
                           lastGranule: Long, payloadBytes: Long,
                           durationMs: Long)

  /** The synth's Vorbis sample-rate menu (all legal 32-bit rates) —
    * shared with the m11 oracle generator.
    */
  private[graft] val OggSampleRates: Array[Int] =
    Array(8000, 11025, 16000, 22050, 32000, 44100, 48000)

  def looksLikeOgg(payload: Array[Byte]): Boolean =
    payload.length >= 4 && payload(0) == 'O' && payload(1) == 'g' &&
      payload(2) == 'g' && payload(3) == 'S'

  /** REAL page walk for OGG (RFC 3533) with a Vorbis identification
    * probe: pages — "OggS" capture, version 0, header-type flags,
    * little-endian 64-bit granule position, 32-bit serial/sequence,
    * CRC (carried, not verified — the CRC-less facts discipline of
    * the MP3/FLAC walks), a segment count and its lacing table whose
    * sum is the page payload — must TILE exactly to the payload end.
    * If the FIRST page's payload opens with the Vorbis identification
    * header (0x01 "vorbis"), its channel count and 32-bit rate are
    * read; the granule position of the last granule-bearing page is
    * the stream's sample count, giving duration in integer math.
    * Distinct serials count the multiplexed streams. None for
    * non-OGG or corrupt payloads — short headers, a lacing table or
    * payload past the end, a non-zero version, a broken mid-stream
    * capture all fail soft (spec-pinned).
    */
  private[ext] def parseOgg(payload: Array[Byte]): Option[OggMeta] =
    if (!looksLikeOgg(payload)) None
    else
      try {
        val len = payload.length
        var off = 0L
        var nPages = 0
        var payloadBytes = 0L
        var lastGranule = -1L
        var vCh = 0; var vRate = 0
        val serials = scala.collection.mutable.Set.empty[Int]
        while (off < len) {
          if (off + 27 > len) return None // truncated page header
          val o = off.toInt
          if (payload(o) != 'O' || payload(o + 1) != 'g' ||
            payload(o + 2) != 'g' || payload(o + 3) != 'S') return None
          if (payload(o + 4) != 0) return None // version must be 0
          var granule = 0L
          var i = 7
          while (i >= 0) { // little-endian 64-bit
            granule = (granule << 8) | (payload(o + 6 + i) & 0xffL)
            i -= 1
          }
          var serial = 0
          i = 3
          while (i >= 0) {
            serial = (serial << 8) | (payload(o + 14 + i) & 0xff)
            i -= 1
          }
          val nSegs = payload(o + 26) & 0xff
          if (off + 27 + nSegs > len) return None // lacing past end
          var pl = 0
          i = 0
          while (i < nSegs) { pl += payload(o + 27 + i) & 0xff; i += 1 }
          val bodyAt = o + 27 + nSegs
          if (bodyAt + pl > len) return None // payload past end
          if (nPages == 0 && pl >= 30 &&
            payload(bodyAt) == 0x01 && payload(bodyAt + 1) == 'v' &&
            payload(bodyAt + 2) == 'o' && payload(bodyAt + 3) == 'r' &&
            payload(bodyAt + 4) == 'b' && payload(bodyAt + 5) == 'i' &&
            payload(bodyAt + 6) == 's') {
            vCh = payload(bodyAt + 11) & 0xff
            var r = 0
            i = 3
            while (i >= 0) {
              r = (r << 8) | (payload(bodyAt + 12 + i) & 0xff)
              i -= 1
            }
            vRate = r
          }
          if (granule != -1L && granule > lastGranule)
            lastGranule = granule
          serials += serial
          payloadBytes += pl
          nPages += 1
          off = bodyAt + pl
        }
        if (nPages == 0) return None
        val dur =
          if (vRate > 0 && lastGranule > 0) lastGranule * 1000L / vRate
          else 0L
        Some(OggMeta(nPages, serials.size, vCh, vRate,
          math.max(lastGranule, 0L), payloadBytes, dur))
      } catch { case scala.util.control.NonFatal(_) => None }

  /** Wrap documents as REAL minimal OGG/Vorbis files — the streaming-
    * container sibling of [[asMp3Assets]]/[[asFlacAssets]]: a BOS page
    * carrying a spec-correct Vorbis identification header (channels /
    * rate deterministic over the text byte count), a middle page
    * carrying the text bytes (lacing table per RFC 3533 — ⌊n/255⌋
    * full segments plus the terminating short one), and an EOS page
    * whose granule position is the stream's sample count. CRCs ride
    * as zeros (the walk reads, never verifies — the m09/m10
    * discipline). [[parseOgg]] must read THESE bytes back.
    */
  def asOggAssets(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          MediaAsset(id, "audio/ogg", oggBytes(body))
        }
      }.toDF()
  }

  private[ext] def oggBytes(body: Array[Byte]): Array[Byte] = {
    val n = body.length
    val rate = OggSampleRates(n % 7)
    val ch = 1 + n % 8
    val total = 1000L + (n.toLong * 331L) % 500000L
    val p3 = 1 + n % 9
    val nLace = n / 255 + 1
    val size = (27 + 1 + 30) + (27 + nLace + n) + (27 + 1 + p3)
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def page(headerType: Int, granule: Long, seq: Int,
             lacing: Array[Byte], payload: Array[Byte]): Unit = {
      b.put("OggS".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      b.put(0.toByte).put(headerType.toByte)
      b.putLong(granule)
      b.putInt(0x6772616f) // serial: one logical stream
      b.putInt(seq)
      b.putInt(0) // CRC: carried, not verified
      b.put(lacing.length.toByte).put(lacing)
      b.put(payload)
    }
    // BOS: the Vorbis identification header (30 bytes, one segment)
    val idPkt = java.nio.ByteBuffer.allocate(30)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    idPkt.put(0x01.toByte)
    idPkt.put("vorbis".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    idPkt.putInt(0)            // vorbis_version
    idPkt.put(ch.toByte)       // audio_channels
    idPkt.putInt(rate)         // audio_sample_rate
    idPkt.putInt(0).putInt(0).putInt(0) // bitrate max/nominal/min
    idPkt.put(0xB8.toByte)     // blocksizes (2^8, 2^11)
    idPkt.put(0x01.toByte)     // framing bit
    page(0x02, 0L, 0, Array(30.toByte), idPkt.array())
    // the body page: ⌊n/255⌋ full lacing values + the short terminator
    val lace = Array.fill(n / 255)(255.toByte) :+ (n % 255).toByte
    page(0x00, -1L, 1, lace, body)
    // EOS: granule = the stream's total samples
    page(0x04, total, 2, Array(p3.toByte),
      Array.fill(p3)(0x7a.toByte))
    b.array()
  }

  final case class OggFeatures(doc_id: Long, n_bytes: Long,
                               n_pages: Int, n_streams: Int,
                               vorbis_channels: Int, vorbis_rate: Int,
                               total_samples: Long, payload_bytes: Long,
                               duration_ms: Long)

  /** The m11 feature path — the batched narrow-map boundary of
    * [[mp3Features]]/[[flacFeatures]] on the OGG container. Non-OGG
    * or corrupt payloads emit the all-zero fact row.
    */
  def oggFeatures(spark: SparkSession,
                  assets: DataFrame): Dataset[OggFeatures] = {
    import spark.implicits._
    assets.as[MediaAsset].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { a =>
          val m = parseOgg(a.payload).getOrElse(
            OggMeta(0, 0, 0, 0, 0L, 0L, 0L))
          OggFeatures(a.doc_id, a.payload.length.toLong, m.nPages,
            m.nStreams, m.vorbisChannels, m.vorbisRate, m.lastGranule,
            m.payloadBytes, m.durationMs)
        }
      }
    }
  }

  final case class FlacFeatures(doc_id: Long, n_bytes: Long,
                                meta_bytes: Long, n_blocks: Int,
                                sample_rate: Int, n_channels: Int,
                                bits_per_sample: Int, total_samples: Long,
                                duration_ms: Long, audio_bytes: Long)

  /** The m10 feature path: walk each asset's metadata blocks and emit
    * the container facts — the same batched narrow-map boundary as
    * [[mp3Features]]. Non-FLAC or corrupt payloads emit the all-zero
    * fact row rather than failing the task.
    */
  def flacFeatures(spark: SparkSession,
                   assets: DataFrame): Dataset[FlacFeatures] = {
    import spark.implicits._
    assets.as[MediaAsset].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { a =>
          val m = parseFlac(a.payload).getOrElse(
            FlacMeta(0L, 0, 0, 0, 0, 0L, 0L, 0L))
          FlacFeatures(a.doc_id, a.payload.length.toLong, m.metaBytes,
            m.nBlocks, m.sampleRate, m.nChannels, m.bitsPerSample,
            m.totalSamples, m.durationMs, m.audioBytes)
        }
      }
    }
  }

  /** Bytes → (width, height, n_frames, sample_rate, n_channels,
    * duration_ms). Real pixel dimensions for image payloads
    * (`javax.imageio`), real sample rate / channels / PCM frame count
    * for audio payloads (`javax.sound.sampled`), real container
    * header + frame count for AVI video ([[demuxAvi]] — with an MJPEG
    * pixel-decode fallback for dimensions when the header omits
    * them); for the remaining opaque payloads a deterministic
    * byte-derived stand-in (===== STUB for undecodable media =====:
    * no MP4/WebM codec ships with this JDK — AVI is the video
    * container it CAN demux, and that path is real).
    */
  def decode(payload: Array[Byte]): (Int, Int, Int, Int, Int, Long) =
    // JPEG dims come from the m12 marker walk — no pixel decode on
    // the metadata path (ImageIO remains the PIXEL decoder for
    // resize/digest); corrupt markers fall through to the full chain
    (if (looksLikeJpeg(payload)) parseJpegMeta(payload) else None) match {
      case Some(j) => (j.width, j.height, 1, 0, 0, 0L)
      case None => decodeImage(payload) match {
      case Some(img) =>
        // animated GIF: n_frames is the REAL frame count (block-walk
        // only, no pixel decode); every other image format is 1 frame
        val frames = gifFrameCount(payload).getOrElse(1)
        (img.getWidth, img.getHeight, frames, 0, 0, 0L)
      case None => audioHeaderFacts(payload) match {
        case Some((rate, ch, frames, ms)) =>
          (0, 0, frames.min(Int.MaxValue).toInt, rate, ch, ms)
        case None => demuxAvi(payload) match {
          case Some(avi) =>
            // header dims when recorded; else decode frame 1 (MJPEG)
            val (w, h) =
              if (avi.width > 0) (avi.width, avi.height)
              else avi.frames.headOption.flatMap(decodeImage)
                .map(i => (i.getWidth, i.getHeight)).getOrElse((0, 0))
            (w, h, avi.frames.length, 0, 0,
              avi.usPerFrame * avi.frames.length / 1000L)
          case None => parseMp4(payload) match {
            case Some(m) =>
              // container facts are real ([[parseMp4]]); frame count
              // needs the sample tables this walk deliberately skips
              (m.width, m.height, 1, 0, 0, m.durationMs)
            case None => parseMkv(payload) match {
              case Some(k) =>
                // container facts are real ([[parseMkv]]); frame
                // count would need the block timestamps this walk
                // deliberately skips
                (k.width, k.height, 1, 0, 0, k.durationMs)
              case None => parseMp3(payload) match {
                case Some(a) =>
                  // frame-header facts are real ([[parseMp3]]): the
                  // MPEG frame count, rate, channels and the
                  // sample-arithmetic duration
                  (0, 0, a.nFrames, a.sampleRate, a.nChannels,
                    a.durationMs)
                case None => parseFlac(payload) match {
                  case Some(fl) =>
                    // STREAMINFO facts are real ([[parseFlac]]); the
                    // frame count would need the frame headers this
                    // walk deliberately skips
                    (0, 0, 1, fl.sampleRate, fl.nChannels, fl.durationMs)
                  case None =>
                    val n = payload.length.toLong
                    val width = (64 + n % 960).toInt
                    val height = (64 + (n * 31) % 960).toInt
                    (width, height, 1, 0, 0, 0L)
                }
              }
            }
          }
        }
      }
      }
    }

  /** [[decode]] with a MIME routing hint: an audio-MIME asset probes
    * the audio decoder FIRST, skipping the (measured-expensive)
    * ImageIO reader scan over bytes that were never an image. The
    * outcome is identical to [[decode]] for ANY payload — the image
    * and audio decoders accept DISJOINT container families, so only
    * the probe ORDER changes (spec-pinned) — and a mislabeled payload
    * still falls through the full chain.
    */
  def decodeHinted(mime: String, payload: Array[Byte])
      : (Int, Int, Int, Int, Int, Long) =
    if (mime != null && mime.startsWith("audio/"))
      audioHeaderFacts(payload) match {
        case Some((rate, ch, frames, ms)) =>
          (0, 0, frames.min(Int.MaxValue).toInt, rate, ch, ms)
        case None => decode(payload)
      }
    else decode(payload)

  private def md5Hex(bytes: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(bytes).map("%02x".format(_)).mkString
  }

  final case class FrameSample(doc_id: Long, frame_idx: Int,
                               n_frame_bytes: Long, frame_digest: String)

  /** Frame sampling: keep every k-th frame of the payload's stream.
    * ANIMATION payloads (GIF) sample for real — the demuxed frames ARE
    * the stream, each sampled frame digested over its decoded pixels.
    * VIDEO payloads in an AVI container sample for real too
    * ([[demuxAvi]]): frame boundaries come from the RIFF chunk walk,
    * and a frame that decodes as an image (MJPEG-in-AVI is plain
    * JPEGs) is digested over its decoded pixels — re-encoding
    * invariant like the GIF path — while other codecs' frames digest
    * their stored bytes. AUDIO payloads split for real as well — the
    * DECODED PCM stream is chunked at true frame boundaries (the
    * largest multiple of the format's frame size ≤ `frameBytes`, so a
    * chunk never bisects a sample across channels). Remaining opaque
    * payloads split at fixed byte strides (===== STUB for
    * undecodable media =====: no MP4/WebM codec ships with this JDK —
    * GIF and AVI are the containers it CAN demux, and those paths are
    * real). Same batched-partition shape as [[extractFeatures]] — at
    * scale each task samples its own partition's payloads, no
    * shuffle, and the sampled frames are a `sampleEvery`-fold
    * reduction before anything heavy (a model, a resize) runs.
    */
  def sampleFrames(spark: SparkSession, assets: DataFrame,
                   frameBytes: Int = 64,
                   sampleEvery: Int = 4): Dataset[FrameSample] = {
    import spark.implicits._
    assets.as[MediaAsset].mapPartitions { it =>
      it.flatMap { a =>
        decodeGifFrames(a.payload) match {
          case Some(frames) =>
            frames.zipWithIndex.collect {
              case (img, idx) if idx % sampleEvery == 0 =>
                val px = pixelBytes(img)
                FrameSample(a.doc_id, idx, px.length.toLong, md5Hex(px))
            }
          case None => demuxAvi(a.payload) match {
            case Some(avi) =>
              avi.frames.zipWithIndex.collect {
                case (fb, idx) if idx % sampleEvery == 0 =>
                  val bytes = decodeImage(fb).map(pixelBytes).getOrElse(fb)
                  FrameSample(a.doc_id, idx, bytes.length.toLong,
                    md5Hex(bytes))
              }
            case None =>
              val (stream, chunk) = decodeAudio(a.payload) match {
                case Some(au) =>
                  (au.pcm,
                    math.max(frameBytes / au.frameSize, 1) * au.frameSize)
                case None => (a.payload, frameBytes)
              }
              stream.grouped(chunk).zipWithIndex.collect {
                case (bytes, idx) if idx % sampleEvery == 0 =>
                  FrameSample(a.doc_id, idx, bytes.length.toLong,
                    md5Hex(bytes))
              }
          }
        }
      }
    }
  }

  final case class ResizedAsset(doc_id: Long, target_w: Int, target_h: Int,
                                n_bytes_in: Long, n_bytes_out: Long,
                                out_digest: String)

  /** ===== STUB resize for NON-IMAGE payloads =====: deterministic
    * stride-sample of the payload down to ~targetW·targetH/64 bytes
    * (the opaque analogue of downscaling). Output size is exactly
    * min(n, targetW·targetH/64) bytes. Image payloads never come
    * here — [[resizeBytes]] rescales their pixels for real.
    */
  def resizeStub(payload: Array[Byte], targetW: Int,
                 targetH: Int): Array[Byte] = {
    val outLen = math.max(1, math.min(payload.length, targetW * targetH / 64))
    val stride = math.max(1, payload.length / outLen)
    payload.indices.by(stride).take(outLen).map(payload).toArray
  }

  /** Resize one payload: a genuine pixel rescale (bilinear
    * Graphics2D draw, PNG re-encode — pure JDK, headless-safe) when
    * the payload decodes as an image; the stride-sample stand-in for
    * opaque payloads.
    */
  def resizeBytes(payload: Array[Byte], targetW: Int,
                  targetH: Int): Array[Byte] =
    decodeImage(payload) match {
      case Some(img) =>
        val out = new java.awt.image.BufferedImage(targetW, targetH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, targetW, targetH, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      case None => resizeStub(payload, targetW, targetH)
    }

  /** Resize through the same batched binary pipeline — at scale the
    * bandwidth-dominant step, so payload bytes never shuffle: each task
    * resizes its own partition's assets and emits only the smaller
    * artifact (plus provenance digest).
    */
  def resize(spark: SparkSession, assets: DataFrame, targetW: Int = 224,
             targetH: Int = 224): Dataset[ResizedAsset] = {
    import spark.implicits._
    assets.as[MediaAsset].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // per-batch scaler/codec context would go here
        batch.iterator.map { a =>
          val out = resizeBytes(a.payload, targetW, targetH)
          ResizedAsset(a.doc_id, targetW, targetH, a.payload.length.toLong,
            out.length.toLong, md5Hex(out))
        }
      }
    }
  }

  /** Batched per-partition feature extraction over the typed Dataset —
    * the mapInPandas shape: iterator of batches in, iterator of
    * batches out, one "decoder context" per batch.
    */
  def extractFeatures(spark: SparkSession,
                      assets: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    assets.as[MediaAsset].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // per-batch decoder setup would go here (native context, model)
        batch.iterator.map { a =>
          val (w, h, f, rate, ch, ms) = decodeHinted(a.mime, a.payload)
          MediaFeatures(a.doc_id, a.mime, a.payload.length.toLong,
            md5Hex(a.payload), w, h, f, rate, ch, ms)
        }
      }
    }
  }

  /** 64-bit perceptual fingerprint. Image payloads get a REAL dHash:
    * downscale to a 9×8 grayscale grid (bilinear), bit (x,y) compares
    * horizontal neighbor luminances — the standard difference-hash,
    * robust to re-encoding and small edits because downscaling
    * integrates them away. Audio payloads hash their DECODED PCM with
    * frame-aligned chunking ([[audioHash64]]) — a function of the
    * samples, not the container, so the same audio as WAV and AIFF
    * (even with opposite sample endianness) fingerprints identically.
    * Only opaque payloads fall back to [[pHashStub]]'s raw-byte-chunk
    * analogue.
    */
  def pHash(payload: Array[Byte]): Long =
    decodeImage(payload) match {
      case Some(img) => dHash64(img)
      case None => decodeAudio(payload) match {
        case Some(a) => audioHash64(a)
        case None => pHashStub(payload)
      }
    }

  /** dHash over the audio's energy envelope: the PCM frames split into
    * 65 FRAME-ALIGNED chunks (a frame is never bisected, so a chunk's
    * byte multiset — hence its sum — is identical under either sample
    * endianness: per-sample byte order doesn't change a sum), bit i
    * compares neighbor chunk MEANS. Means, not sums: 65 rarely divides
    * the frame count, so chunk sizes alternate (e.g. 31/32 frames) and
    * raw sums of ANY flat-envelope signal would inherit that size
    * pattern — unrelated audio would fingerprint alike. The mean
    * comparison is exact integer cross-multiplication (sums < 2²⁰ ·
    * bytes, counts < 2³¹ — no overflow, no float). This is the same
    * normalization the image dHash gets from resampling to a fixed
    * grid. Locality contract as [[pHashStub]]: a local edit moves one
    * or two chunk means, so near-identical audio lands within a few
    * bits.
    */
  private[ext] def audioHash64(a: AudioMeta): Long = {
    val pcm = a.pcm
    val nFrames = pcm.length / a.frameSize
    val sums = new Array[Long](65)
    val counts = new Array[Long](65)
    if (nFrames > 0) {
      var f = 0
      while (f < nFrames) {
        val c = (f.toLong * 65 / nFrames).toInt
        var b = f * a.frameSize
        val end = b + a.frameSize
        while (b < end) { sums(c) += (pcm(b) & 0xff).toLong; b += 1 }
        counts(c) += a.frameSize
        f += 1
      }
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      // mean(b) > mean(b+1), cross-multiplied; empty chunks mean 0
      val l = if (counts(b) == 0) 0L else sums(b) * math.max(counts(b + 1), 1L)
      val r = if (counts(b + 1) == 0) 0L
        else sums(b + 1) * math.max(counts(b), 1L)
      if (l > r) fp |= (1L << b)
      b += 1
    }
    fp
  }

  private def dHash64(img: java.awt.image.BufferedImage): Long = {
    val small = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, 9, 8, null)
    g.dispose()
    // integer Rec.601 luma; only the < comparison matters
    def lum(px: Int): Int =
      ((px >> 16 & 0xff) * 299 + (px >> 8 & 0xff) * 587 +
        (px & 0xff) * 114)
    var fp = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (lum(small.getRGB(x, y)) < lum(small.getRGB(x + 1, y)))
          fp |= (1L << bit)
        bit += 1; x += 1
      }
      y += 1
    }
    fp
  }

  /** ===== STUB perceptual hash for NON-IMAGE payloads =====: 64-bit
    * dHash-style fingerprint from payload chunk statistics — the
    * payload is split into 65 even chunks and bit i compares neighbor
    * chunk sums (chunk_i > chunk_i+1). It keeps the property the
    * pipeline depends on: a local edit touches one or two chunks, so
    * near-identical payloads land within a few bits of each other (no
    * global statistic couples distant bits). Image payloads take the
    * real [[dHash64]] path instead.
    */
  def pHashStub(payload: Array[Byte]): Long = {
    val chunks = new Array[Long](65)
    if (payload.nonEmpty) {
      var i = 0
      while (i < payload.length) {
        chunks((i.toLong * 65 / payload.length).toInt) +=
          (payload(i) & 0xff).toLong
        i += 1
      }
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (chunks(b) > chunks(b + 1)) fp |= (1L << b)
      b += 1
    }
    fp
  }

  final case class PHashPair(doc_a: Long, doc_b: Long, hamming: Int)

  /** Media near-dup pairs at Hamming ≤ `maxDist` over the perceptual
    * hash — the multimodal member of the dedup family (Dedup covers
    * text, Similarity covers embeddings). Same banded self-join as
    * Dedup.simhashPairs: 4 bands of 16 bits, so any pair within
    * Hamming 3 agrees exactly on ≥ 1 band (pigeonhole — EXACT, not
    * probabilistic, for maxDist < 4); candidates hit the exact
    * bit_count filter. Payload bytes never shuffle: the fingerprint
    * table (8 bytes/doc) is computed in one narrow pass, persisted,
    * and both self-join sides read it.
    */
  def phashPairs(spark: SparkSession, assets: DataFrame,
                 maxDist: Int = 3): Dataset[PHashPair] = {
    import spark.implicits._
    require(maxDist < 4, s"4x16-bit banding is only exact below 4 bits")
    val fps = assets.as[MediaAsset]
      .map(a => (a.doc_id, pHash(a.payload))).toDF("doc_id", "fp")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = fps.select(col("doc_id"), col("fp"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        shiftrightunsigned(col("fp"), b * 16).bitwiseAND(lit(0xffffL))
          .as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("fp"), col("bk.band").as("band"),
        col("bk.key").as("key"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.fp ^ b.fp)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
      .as[PHashPair]
  }
}
