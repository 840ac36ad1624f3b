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
  * rescales pixels. Non-image payloads (the text corpus posing as
  * media, audio/video containers this JDK can't demux) fall back to
  * deterministic byte-derived features — that fallback, and the
  * fixed-stride pseudo-frame splitter in [[sampleFrames]] (a real
  * demuxer finds frame boundaries), are the only remaining stand-ins,
  * and both are labeled at their definition. The schema, the typed
  * Dataset boundary, the batched partition iteration, and the
  * partitioning story are identical for both paths: swapping the
  * fallback for a JNI/ffmpeg call changes no plan shape.
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
  final case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
                                 digest: String, width: Int, height: Int,
                                 n_frames: Int)

  /** Wrap documents as binary media assets (text bytes standing in for
    * encoded media — the corpus has no real images; the binary column
    * and its metadata are the point).
    */
  def asAssets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      lit("application/octet-stream").as("mime"),
      encode(col("text"), "UTF-8").as("payload"))

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

  /** Bytes → (width, height, n_frames). Real pixel dimensions for
    * image payloads via `javax.imageio`; for opaque payloads a
    * deterministic byte-derived stand-in (===== STUB for non-image
    * media =====: a real pipeline demuxes audio/video here — this
    * container has no such codecs, images are the real path).
    */
  def decode(payload: Array[Byte]): (Int, Int, Int) =
    decodeImage(payload) match {
      case Some(img) => (img.getWidth, img.getHeight, 1)
      case None =>
        val n = payload.length.toLong
        val width = (64 + n % 960).toInt
        val height = (64 + (n * 31) % 960).toInt
        (width, height, 1)
    }

  private def md5Hex(bytes: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(bytes).map("%02x".format(_)).mkString
  }

  final case class FrameSample(doc_id: Long, frame_idx: Int,
                               n_frame_bytes: Long, frame_digest: String)

  /** Frame sampling for "video" payloads: split the byte stream into
    * fixed-size pseudo-frames (===== STUB =====: a real demuxer finds
    * frame boundaries; the fake uses fixed strides) and keep every
    * k-th frame. Same batched-partition shape as [[extractFeatures]] —
    * at scale each task samples its own partition's payloads, no
    * shuffle, and the sampled frames are a `sampleEvery`-fold
    * reduction before anything heavy (a model, a resize) runs.
    */
  def sampleFrames(spark: SparkSession, assets: DataFrame,
                   frameBytes: Int = 64,
                   sampleEvery: Int = 4): Dataset[FrameSample] = {
    import spark.implicits._
    assets.as[MediaAsset].mapPartitions { it =>
      it.flatMap { a =>
        val frames = a.payload.grouped(frameBytes).zipWithIndex
        frames.collect {
          case (bytes, idx) if idx % sampleEvery == 0 =>
            FrameSample(a.doc_id, idx, bytes.length.toLong, md5Hex(bytes))
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
          val (w, h, f) = decode(a.payload)
          MediaFeatures(a.doc_id, a.mime, a.payload.length.toLong,
            md5Hex(a.payload), w, h, f)
        }
      }
    }
  }

  /** 64-bit perceptual fingerprint. Image payloads get a REAL dHash:
    * downscale to a 9×8 grayscale grid (bilinear), bit (x,y) compares
    * horizontal neighbor luminances — the standard difference-hash,
    * robust to re-encoding and small edits because downscaling
    * integrates them away. Opaque payloads fall back to
    * [[pHashStub]]'s byte-chunk analogue.
    */
  def pHash(payload: Array[Byte]): Long =
    decodeImage(payload) match {
      case Some(img) => dHash64(img)
      case None => pHashStub(payload)
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
