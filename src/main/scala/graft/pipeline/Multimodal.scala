package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column support: image/audio/video as opaque BINARY columns
 * with typed metadata, plus decode / feature-extract / resize /
 * frame-sample operators.
 *
 * The actual media codecs are NOT available in this environment, so the
 * decode kernels are deterministic STUBs (clearly marked) that parse the
 * synthetic blob header. Everything around them — the schema, the
 * mapPartitions batch shape (the Scala analog of `mapInPandas`: one
 * iterator in, one iterator out, arrow-sized batches), partitioning, and
 * the typed metadata struct — is real and is what a production decode UDF
 * would plug into.
 */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  final case class MediaMeta(width: Int, height: Int, channels: Int, durationMs: Long)

  final case class MediaBlob(doc_id: Long, mediaType: String, data: Array[Byte], meta: MediaMeta)

  /** Decoded/feature row produced by the decode stage. */
  final case class DecodedMedia(
      doc_id: Long,
      mediaType: String,
      width: Int,
      height: Int,
      channels: Int,
      n_bytes: Long,
      features: Array[Float])

  private val Magic = 0x47524d4d // "GRMM"

  /** Deterministic synthetic blob for doc_id: a 13-byte header
    * [magic, width, height, channels] + pseudo-random payload. Stands in
    * for real image/audio bytes so the pipeline shape is testable. */
  def synthesizeBlob(docId: Long, mediaType: String): MediaBlob = {
    val width = (docId % 640 + 16).toInt
    val height = (docId % 480 + 16).toInt
    val channels = if (mediaType == "audio") 1 else 3
    val payloadLen = 64
    val bb = ByteBuffer.allocate(17 + payloadLen).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(Magic).putInt(width).putInt(height).put(channels.toByte)
    val rnd = new java.util.Random(docId)
    val payload = new Array[Byte](payloadLen + 4)
    rnd.nextBytes(payload)
    bb.put(payload, 0, payloadLen)
    MediaBlob(docId, mediaType,
      java.util.Arrays.copyOf(bb.array(), bb.position()),
      MediaMeta(width, height, channels, durationMs = if (mediaType == "video") docId % 60000 else 0))
  }

  /** Attach synthetic media blobs to a documents-like DataFrame. */
  def withSyntheticMedia(spark: SparkSession, df: DataFrame, idCol: String): Dataset[MediaBlob] = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val mt = (id % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      synthesizeBlob(id, mt)
    }
  }

  /**
   * Decode stage — mapPartitions with explicit batching (the Scala shape
   * of `mapInPandas`): pull `batchSize` blobs, "decode" each, emit rows.
   * STUB: header parse + first-16-bytes feature vector stands in for a
   * real image decode; swap `decodeOne` for an actual codec in
   * production. Batch shape, schema, and partition behavior are real.
   */
  def decode(blobs: Dataset[MediaBlob], batchSize: Int = 256): Dataset[DecodedMedia] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map(decodeOne)
      }
    }
  }

  /** STUB decode kernel: parses the synthetic header; a real implementation
    * would call the image/audio library here. */
  private def decodeOne(b: MediaBlob): DecodedMedia = {
    val bb = ByteBuffer.wrap(b.data).order(ByteOrder.BIG_ENDIAN)
    val magic = bb.getInt()
    require(magic == Magic, s"bad media magic: $magic")
    val width = bb.getInt()
    val height = bb.getInt()
    val channels = bb.get().toInt
    val features = new Array[Float](16)
    var i = 0
    while (i < 16 && bb.remaining() > 0) {
      features(i) = (bb.get() & 0xff) / 255.0f
      i += 1
    }
    DecodedMedia(b.doc_id, b.mediaType, width, height, channels, b.data.length.toLong, features)
  }

  /** Resize stub: pure metadata transform (a real kernel would rescale
    * pixels inside the same mapPartitions shape). */
  def resize(decoded: Dataset[DecodedMedia], maxDim: Int): Dataset[DecodedMedia] = {
    import decoded.sparkSession.implicits._
    decoded.map { d =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(d.width, d.height))
      d.copy(
        width = math.max(1, math.round(d.width * scale).toInt),
        height = math.max(1, math.round(d.height * scale).toInt))
    }
  }

  /** Frame-sampling stub for video rows: one output row per sampled frame
    * (flatMap fan-out — the real kernel would seek/decode frames). */
  def sampleFrames(blobs: Dataset[MediaBlob], everyMs: Long): DataFrame = {
    import blobs.sparkSession.implicits._
    blobs.filter(_.mediaType == "video").flatMap { b =>
      val n = math.max(1L, b.meta.durationMs / math.max(1L, everyMs))
      (0L until math.min(n, 32L)).map(f => (b.doc_id, f, f * everyMs))
    }.toDF("doc_id", "frame_idx", "ts_ms")
  }
}
