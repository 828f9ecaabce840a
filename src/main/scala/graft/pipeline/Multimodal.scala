package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column support: image/audio/video as opaque BINARY columns
 * with typed metadata, plus decode / feature-extract / resize /
 * frame-sample operators.
 *
 * Byte-level kernels are pluggable via [[MediaDecoder]]; the default
 * [[SyntheticHeaderDecoder]] is a deterministic STUB (media codecs are
 * not available in this environment) that parses the synthetic blob
 * header. Everything around the kernel — the schema, the mapPartitions
 * batch shape (the Scala analog of `mapInPandas`: one iterator in, one
 * iterator out, arrow-sized batches), partitioning, and the typed
 * metadata struct — is real and is what a production decoder plugs into.
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

  private[pipeline] val Magic = 0x47524d4d // "GRMM"

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
   * of `mapInPandas`): pull `batchSize` blobs, decode each via the
   * pluggable kernel, emit rows. Batch shape, schema, and partition
   * behavior are real; the default kernel is the synthetic-header stub.
   */
  def decode(
      blobs: Dataset[MediaBlob],
      batchSize: Int = 256,
      decoder: MediaDecoder = SyntheticHeaderDecoder): Dataset[DecodedMedia] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map(decoder.decodeOne)
      }
    }
  }

  /** Resize: per-row kernel delegate (the stub transforms metadata; a
    * real kernel rescales pixels inside the same map shape). */
  def resize(
      decoded: Dataset[DecodedMedia],
      maxDim: Int,
      decoder: MediaDecoder = SyntheticHeaderDecoder): Dataset[DecodedMedia] = {
    import decoded.sparkSession.implicits._
    decoded.map(d => decoder.resizeOne(d, maxDim))
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * (flatMap fan-out, bounded by the kernel's frame cap). */
  def sampleFrames(
      blobs: Dataset[MediaBlob],
      everyMs: Long,
      decoder: MediaDecoder = SyntheticHeaderDecoder): DataFrame = {
    import blobs.sparkSession.implicits._
    blobs.filter(_.mediaType == "video").flatMap { b =>
      decoder.sampleFrameTimestamps(b, everyMs).map { case (f, ts) => (b.doc_id, f, ts) }
    }.toDF("doc_id", "frame_idx", "ts_ms")
  }
}
