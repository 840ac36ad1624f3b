package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing [EXT]: media payloads as opaque `binary`
  * columns with typed metadata, processed by batched per-partition
  * decode — the Scala analogue of a `mapInPandas` media pipeline.
  *
  * The decode itself is a ===== STUB ===== (this container has no
  * image/audio codecs): `decodeStub` derives deterministic fake
  * features from the raw bytes. Everything around it — the schema,
  * the typed Dataset boundary, the batched partition iteration, the
  * partitioning story — is real and tested. Swapping `decodeStub` for
  * a JNI/ffmpeg call changes no plan shape.
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

  /** ===== STUB decode =====: deterministic fake "image" features from
    * payload bytes. A real implementation decodes here (and only
    * here); the fake keeps the same signature: bytes → features.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length.toLong
    val width = (64 + n % 960).toInt
    val height = (64 + (n * 31) % 960).toInt
    val frames = 1
    (width, height, frames)
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

  /** ===== STUB resize =====: deterministic stride-sample of the
    * payload down to ~targetW·targetH/64 bytes (a real implementation
    * decodes and scales pixels here). Output size is exactly
    * min(n, targetW·targetH/64) bytes.
    */
  def resizeStub(payload: Array[Byte], targetW: Int,
                 targetH: Int): Array[Byte] = {
    val outLen = math.max(1, math.min(payload.length, targetW * targetH / 64))
    val stride = math.max(1, payload.length / outLen)
    payload.indices.by(stride).take(outLen).map(payload).toArray
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
          val out = resizeStub(a.payload, targetW, targetH)
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
          val (w, h, f) = decodeStub(a.payload)
          MediaFeatures(a.doc_id, a.mime, a.payload.length.toLong,
            md5Hex(a.payload), w, h, f)
        }
      }
    }
  }

  /** ===== STUB perceptual hash =====: 64-bit dHash-style fingerprint
    * from payload chunk statistics — the payload is split into 65
    * even chunks and bit i compares neighbor chunk sums
    * (chunk_i > chunk_i+1). A real pHash DCTs the DECODED image here;
    * the stub keeps the property the pipeline depends on: a local
    * edit touches one or two chunks, so near-identical payloads land
    * within a few bits of each other (no global statistic couples
    * distant bits).
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
      .map(a => (a.doc_id, pHashStub(a.payload))).toDF("doc_id", "fp")
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
