package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

import graft.pipeline.Multimodal.{DecodedMedia, MediaBlob}

/**
 * Pluggable media decode kernel. The pipeline operators in [[Multimodal]]
 * (decode / resize / frame-sample) are decoder-agnostic: they own the
 * Spark plumbing — schema, mapPartitions batch shape, partitioning,
 * fan-out — and delegate every per-blob byte-level operation here. A
 * production deployment drops in a codec-backed implementation (JavaCV,
 * ImageIO, ffmpeg bindings, …) without touching a single operator.
 *
 * Implementations MUST be serializable (they ship inside task closures)
 * and deterministic per blob (operators may be re-executed on task retry
 * or lineage recompute — a nondeterministic decode would make retried
 * partitions diverge).
 */
trait MediaDecoder extends Serializable {

  /** Decode one opaque blob into dimensions + a feature vector. */
  def decodeOne(b: MediaBlob): DecodedMedia

  /** Rescale one decoded row so max(width, height) ≤ maxDim (a real
    * kernel rescales pixel data; the contract here is the metadata). */
  def resizeOne(d: DecodedMedia, maxDim: Int): DecodedMedia = {
    val scale = math.min(1.0, maxDim.toDouble / math.max(d.width, d.height))
    d.copy(
      width = math.max(1, math.round(d.width * scale).toInt),
      height = math.max(1, math.round(d.height * scale).toInt))
  }

  /** Enumerate sampled frames of a video blob as (frameIdx, tsMs) —
    * bounded (a real kernel seeks/decodes; the cap guards fan-out). */
  def sampleFrameTimestamps(b: MediaBlob, everyMs: Long): Seq[(Long, Long)] = {
    val n = math.max(1L, b.meta.durationMs / math.max(1L, everyMs))
    (0L until math.min(n, 32L)).map(f => (f, f * everyMs))
  }
}

/**
 * Default decoder: a deterministic STUB over the synthetic GRMM blob
 * format ([[Multimodal.synthesizeBlob]]) — media codecs are not
 * available in this environment. Parses the 13-byte header and derives
 * a 16-dim feature vector from the first payload bytes; stands in for a
 * real image/audio decode with the same signature and batch shape.
 */
object SyntheticHeaderDecoder extends MediaDecoder {

  override def decodeOne(b: MediaBlob): DecodedMedia = {
    val bb = ByteBuffer.wrap(b.data).order(ByteOrder.BIG_ENDIAN)
    val magic = bb.getInt()
    require(magic == Multimodal.Magic, s"bad media magic: $magic")
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
}
