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
 * REAL image decoder over the JDK's built-in `javax.imageio` codecs
 * (PNG / BMP / JPEG / GIF — everything registered offline in a stock
 * JRE). Decodes the payload bytes into actual pixels and derives the
 * 16-dim feature vector from them:
 *
 *   f0..f2   global mean R, G, B (÷255)
 *   f3       global mean luminance (299·R + 587·G + 114·B)/1000 ÷255
 *   f4..f15  2×2-grid (TL,TR,BL,BR) × (R,G,B) quadrant means (÷255)
 *
 * All accumulation is integer (exact); only the final per-cell division
 * is floating point, so retried tasks reproduce bit-identical rows.
 * `ImageIO.setUseCache(false)` keeps decode purely in-memory — no
 * temp-file IO inside executor tasks.
 */
object ImageIoDecoder extends MediaDecoder {

  override def decodeOne(b: MediaBlob): DecodedMedia = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b.data))
    require(img != null, s"undecodable media payload for doc ${b.doc_id}")
    val w = img.getWidth
    val h = img.getHeight
    val channels = img.getColorModel.getNumComponents
    val wl = w / 2
    val ht = h / 2
    // [quadrant 0..3][channel r,g,b] integer sums + per-quadrant counts
    val sums = Array.ofDim[Long](4, 3)
    val counts = new Array[Long](4)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val q = (if (y < ht) 0 else 2) + (if (x < wl) 0 else 1)
        val p = img.getRGB(x, y)
        sums(q)(0) += (p >> 16) & 0xff
        sums(q)(1) += (p >> 8) & 0xff
        sums(q)(2) += p & 0xff
        counts(q) += 1L
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    val gr = sums(0)(0) + sums(1)(0) + sums(2)(0) + sums(3)(0)
    val gg = sums(0)(1) + sums(1)(1) + sums(2)(1) + sums(3)(1)
    val gb = sums(0)(2) + sums(1)(2) + sums(2)(2) + sums(3)(2)
    val features = new Array[Float](16)
    features(0) = (gr.toDouble / n / 255.0).toFloat
    features(1) = (gg.toDouble / n / 255.0).toFloat
    features(2) = (gb.toDouble / n / 255.0).toFloat
    features(3) = (((299L * gr + 587L * gg + 114L * gb).toDouble / 1000.0) / n / 255.0).toFloat
    var q = 0
    while (q < 4) {
      var ch = 0
      while (ch < 3) {
        features(4 + q * 3 + ch) =
          if (counts(q) == 0L) 0.0f
          else (sums(q)(ch).toDouble / counts(q) / 255.0).toFloat
        ch += 1
      }
      q += 1
    }
    DecodedMedia(b.doc_id, b.mediaType, w, h, channels, b.data.length.toLong, features)
  }
}

/**
 * Default decoder: a deterministic STUB over the synthetic GRMM blob
 * format ([[Multimodal.synthesizeBlob]]) — kept for the fully
 * closed-form gate; real images go through [[ImageIoDecoder]].
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
