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

  /** Exact decoded-image statistics row: integer channel sums, so the
    * correctness oracle compares BIGINTs with zero float-rounding risk. */
  final case class ImageStats(
      doc_id: Long,
      format: String,
      width: Int,
      height: Int,
      channels: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  final case class HistEqStats(
      doc_id: Long,
      n_pixels: Long,
      eq_sum_r: Long,
      eq_sum_g: Long,
      eq_sum_b: Long)

  final case class QuantizeStats(
      doc_id: Long,
      n_pixels: Long,
      err_r: Long,
      err_g: Long,
      err_b: Long)

  /**
   * Fixed-palette quantization error over the REAL decoded pixels:
   * each channel value snaps to the center of its 32-wide bucket
   * (`q(v) = (v div 32)·32 + 16` — 8 levels per channel, the classic
   * 512-color uniform palette), and the per-channel Σ|v − q(v)| is the
   * exact-integer distortion the palette costs — the
   * compression-preprocessing dial next to [[decodeHistEq]]'s
   * contrast one. Scale shape: one decode pass per row inside
   * mapPartitions, fixed-width stats rows out.
   */
  def decodeQuantizeStats(blobs: Dataset[MediaBlob]): Dataset[QuantizeStats] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { blob =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(blob.data))
        require(img != null, s"no ImageIO reader for doc ${blob.doc_id}")
        val w = img.getWidth
        val h = img.getHeight
        val err = new Array[Long](3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            var ch = 0
            while (ch < 3) {
              val v = (p >> (16 - 8 * ch)) & 0xff
              err(ch) += math.abs(v % 32 - 16)
              ch += 1
            }
            x += 1
          }
          y += 1
        }
        QuantizeStats(blob.doc_id, w.toLong * h, err(0), err(1), err(2))
      }
    }
  }

  final case class BoxFilterStats(
      doc_id: Long,
      n_windows: Long,
      box_r: Long,
      box_g: Long,
      box_b: Long)

  /**
   * 3×3 box-filter response over the REAL decoded pixels, in exact
   * integers — the blur/low-pass primitive of vision preprocessing.
   * Per channel: Σ over all VALID (non-clamped) 3×3 windows of the
   * window's pixel sum, i.e. 9× the blurred mean-sum with no division
   * anywhere, computed through a summed-area table (the O(1)-per-window
   * integral-image structure, so the cost is O(pixels) independent of
   * the window size). The oracle replays it closed-form: each pixel is
   * counted in c(x)·c(y) windows with c a boundary-trimmed constant-3
   * profile, which factorizes per solid quadrant.
   *
   * Scale shape: one decode + two linear passes per row inside
   * mapPartitions — image bytes never cross a shuffle, only the
   * fixed-width stats rows do.
   */
  def decodeBoxFilter(blobs: Dataset[MediaBlob]): Dataset[BoxFilterStats] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { blob =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(blob.data))
        require(img != null, s"no ImageIO reader for doc ${blob.doc_id}")
        val w = img.getWidth
        val h = img.getHeight
        require(w >= 3 && h >= 3,
          s"box filter needs a 3x3 window; got ${w}x$h for doc ${blob.doc_id}")
        val stride = w + 1
        val sat = Array.ofDim[Long](3, stride * (h + 1))
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val i = (y + 1) * stride + (x + 1)
            var ch = 0
            while (ch < 3) {
              val v = (p >> (16 - 8 * ch)) & 0xff
              sat(ch)(i) = v + sat(ch)(i - 1) + sat(ch)(i - stride) -
                sat(ch)(i - stride - 1)
              ch += 1
            }
            x += 1
          }
          y += 1
        }
        val sums = new Array[Long](3)
        var y0 = 0
        while (y0 + 3 <= h) {
          var x0 = 0
          while (x0 + 3 <= w) {
            var ch = 0
            while (ch < 3) {
              sums(ch) += sat(ch)((y0 + 3) * stride + x0 + 3) -
                sat(ch)(y0 * stride + x0 + 3) -
                sat(ch)((y0 + 3) * stride + x0) +
                sat(ch)(y0 * stride + x0)
              ch += 1
            }
            x0 += 1
          }
          y0 += 1
        }
        BoxFilterStats(blob.doc_id, (w - 2).toLong * (h - 2),
          sums(0), sums(1), sums(2))
      }
    }
  }

  /**
   * Histogram equalization in EXACT integer arithmetic — the classic
   * contrast-normalization preprocessing stage, run on the REAL decoded
   * pixels. Per channel: 256-bin histogram → CDF → the textbook mapping
   * `eq(v) = (cdf(v) − cdf_min) · 255 div (N − cdf_min)` with cdf_min
   * the first non-zero CDF value; magnitude-side floor division keeps
   * every mapped level an exact integer, so per-channel equalized pixel
   * SUMS replay closed-form in SQL from the quadrant generator. A
   * constant-channel image (N = cdf_min) maps to 0 by definition.
   *
   * Scale shape: one decode pass per row inside mapPartitions, a
   * 3×256 histogram per image — image bytes never cross a shuffle,
   * only the fixed-width stats rows do.
   */
  def decodeHistEq(blobs: Dataset[MediaBlob]): Dataset[HistEqStats] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { blob =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob.data))
        require(img != null, s"no ImageIO reader for doc ${blob.doc_id}")
        val w = img.getWidth
        val h = img.getHeight
        val hist = Array.ofDim[Long](3, 256)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            hist(0)((p >> 16) & 0xff) += 1
            hist(1)((p >> 8) & 0xff) += 1
            hist(2)(p & 0xff) += 1
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val sums = Array.tabulate(3) { ch =>
          var cdf = 0L
          var cdfMin = -1L
          var eqSum = 0L
          var v = 0
          while (v < 256) {
            val c = hist(ch)(v)
            if (c > 0L) {
              cdf += c
              if (cdfMin < 0L) cdfMin = cdf
              val eq = if (n == cdfMin) 0L else (cdf - cdfMin) * 255L / (n - cdfMin)
              eqSum += c * eq
            }
            v += 1
          }
          eqSum
        }
        HistEqStats(blob.doc_id, n, sums(0), sums(1), sums(2))
      }
    }
  }

  /** Deterministic quadrant-fill image for `docId`, encoded through a
    * REAL `javax.imageio` codec (PNG for even ids, BMP for odd — both
    * ship in a stock JRE, no external codecs). Quadrant q (0=TL, 1=TR,
    * 2=BL, 3=BR) of channel ch (0=R,1=G,2=B) is the solid value
    * `(docId·(3+2·ch) + 31·q + 7) mod 256`, so the decoded per-channel
    * pixel sums have an exact integer closed form:
    * `Σ_q area(q)·v(q,ch)` with `area` from the floor-half quadrant
    * split — which is precisely what the gate oracle recomputes. */
  def encodeQuadrantImage(docId: Long, delta: Int = 0): MediaBlob = {
    val w = (docId % 48 + 8).toInt
    val h = (docId % 32 + 8).toInt
    val fmt = if (docId % 2 == 0) "png" else "bmp"
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val wl = w / 2
    val ht = h / 2
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val q = (if (y < ht) 0 else 2) + (if (x < wl) 0 else 1)
        val r = ((docId * 3 + 31 * q + 7 + delta) % 256).toInt
        val g = ((docId * 5 + 31 * q + 7 + delta) % 256).toInt
        val b = ((docId * 7 + 31 * q + 7 + delta) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    javax.imageio.ImageIO.setUseCache(false)
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, bos), s"no ImageIO writer for $fmt")
    MediaBlob(docId, s"image/$fmt", bos.toByteArray, MediaMeta(w, h, 3, 0L))
  }

  /** Attach REAL encoded image payloads (PNG/BMP bytes from the JDK
    * codecs) to a documents-like DataFrame — the counterpart of
    * [[withSyntheticMedia]] for the real-decode path. */
  def withEncodedImages(spark: SparkSession, df: DataFrame, idCol: String): Dataset[MediaBlob] = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map(encodeQuadrantImage(_))
  }

  /** REAL decode of image payloads to exact integer channel statistics:
    * each blob's bytes go through `javax.imageio` (format detected from
    * the byte stream, not trusted from metadata), pixels summed per
    * channel in integers. mapPartitions keeps codec setup per task and
    * the output row width bounded — no pixel buffers cross a shuffle. */
  def decodeImageStats(blobs: Dataset[MediaBlob]): Dataset[ImageStats] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { blob =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(blob.data))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, s"no ImageIO reader for doc ${blob.doc_id}")
        val reader = readers.next()
        val fmt = reader.getFormatName.toLowerCase
        reader.setInput(iis)
        val img = reader.read(0)
        reader.dispose()
        val w = img.getWidth
        val h = img.getHeight
        val channels = img.getColorModel.getNumComponents
        var sr = 0L
        var sg = 0L
        var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff
            sg += (p >> 8) & 0xff
            sb += p & 0xff
            x += 1
          }
          y += 1
        }
        ImageStats(blob.doc_id, fmt, w, h, channels, sr, sg, sb)
      }
    }
  }

  final case class ImageAHash(
      doc_id: Long,
      width: Int,
      height: Int,
      ahash: Long,
      ahash_bits: Int)

  /**
   * Perceptual average-hash over REAL decoded pixels: nearest-neighbor
   * point-sample an 8×8 grid (cell (i,j) reads pixel (i·h/8, j·w/8) —
   * the same integer floor mapping as the pixel-resize gate, so every
   * sampled value IS a source pixel), take integer luminance
   * 299·R+587·G+114·B per cell, and set bit i·8+j iff the cell's
   * luminance exceeds the 64-cell mean (`lum·64 > Σ lums` — the exact
   * integer form of the comparison, no division). Near-identical images
   * land within a few Hamming bits, which is what image-level near-dup
   * bucketing keys on. All arithmetic is integer, so the hash replays
   * closed-form. Per-row mapPartitions decode; only the 64-bit hash
   * crosses any shuffle.
   */
  def imageAHash(blobs: Dataset[MediaBlob]): Dataset[ImageAHash] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { blob =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(blob.data))
        require(img != null, s"undecodable media payload for doc ${blob.doc_id}")
        val w = img.getWidth
        val h = img.getHeight
        val lums = new Array[Long](64)
        var total = 0L
        var i = 0
        while (i < 8) {
          var j = 0
          while (j < 8) {
            val p = img.getRGB(j * w / 8, i * h / 8)
            val lum = 299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
              114L * (p & 0xff)
            lums(i * 8 + j) = lum
            total += lum
            j += 1
          }
          i += 1
        }
        var hash = 0L
        var k = 0
        while (k < 64) {
          if (lums(k) * 64L > total) hash |= (1L << k)
          k += 1
        }
        ImageAHash(blob.doc_id, w, h, hash, java.lang.Long.bitCount(hash))
      }
    }
  }

  final case class ImageEntropy(
      doc_id: Long,
      n_pixels: Long,
      n_distinct: Long,
      entropy: Double)

  /**
   * Pixel-level Shannon entropy over REAL decoded images: a 256-bin
   * byte histogram of the R channel per image, entropy
   * `ln(n) − Σ c·ln(c) / n` summed in ASCENDING byte-value order
   * (deterministic; the text kernel's convention) — the multimodal
   * twin of `text_char_entropy`: near-zero = solid/padded frames,
   * high = noise/compression artifacts, the junk-image screen. Only
   * 4 numbers per image cross a shuffle; gates round to 6.
   */
  def imageEntropy(blobs: Dataset[MediaBlob]): Dataset[ImageEntropy] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { blob =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(blob.data))
        require(img != null, s"undecodable media payload for doc ${blob.doc_id}")
        val w = img.getWidth
        val h = img.getHeight
        val counts = new Array[Long](256)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            counts(((img.getRGB(x, y) >> 16) & 0xff)) += 1L
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        var slk = 0.0
        var distinct = 0L
        var v = 0
        while (v < 256) {
          val c = counts(v)
          if (c > 0L) { slk += c * math.log(c.toDouble); distinct += 1 }
          v += 1
        }
        val entropy = if (n == 0L) 0.0 else math.log(n.toDouble) - slk / n
        ImageEntropy(blob.doc_id, n, distinct, entropy)
      }
    }
  }

  final case class ImageGradient(
      doc_id: Long,
      n_h_edges: Long,
      sum_h: Long,
      n_v_edges: Long,
      sum_v: Long)

  /**
   * First-difference gradient census over REAL decoded images: per
   * horizontal neighbor pair |R[x+1,y] − R[x,y]| and per vertical pair
   * |R[x,y+1] − R[x,y]|, counting nonzero transitions and summing
   * absolute differences — the edge-energy screen (solid/padded frames
   * score 0; the quadrant generator's analytic oracle predicts exactly
   * the two boundary seams). Exact integers; pixels stay in the task.
   */
  def imageGradientStats(blobs: Dataset[MediaBlob]): Dataset[ImageGradient] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { blob =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(blob.data))
        require(img != null, s"undecodable media payload for doc ${blob.doc_id}")
        val w = img.getWidth
        val h = img.getHeight
        var nh = 0L; var sh = 0L; var nv = 0L; var sv = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = (img.getRGB(x, y) >> 16) & 0xff
            if (x + 1 < w) {
              val d = math.abs(((img.getRGB(x + 1, y) >> 16) & 0xff) - v)
              if (d != 0) { nh += 1; sh += d }
            }
            if (y + 1 < h) {
              val d = math.abs(((img.getRGB(x, y + 1) >> 16) & 0xff) - v)
              if (d != 0) { nv += 1; sv += d }
            }
            x += 1
          }
          y += 1
        }
        ImageGradient(blob.doc_id, nh, sh, nv, sv)
      }
    }
  }

  final case class ImageRle(
      doc_id: Long,
      n_pixels: Long,
      n_runs: Long)

  /**
   * Scanline run-length compression stats over REAL decoded images:
   * R-channel pixels quantized to `256/step` levels (`v / step`), runs
   * counted row-major with a restart at every row boundary — the
   * PackBits/TGA-style scanline-codec model. Emits exact integers only
   * (run count; the gate derives the 2-bytes-per-run compression ratio);
   * pixel buffers never leave the decode task.
   */
  def imageRleRuns(blobs: Dataset[MediaBlob], step: Int): Dataset[ImageRle] = {
    require(step >= 1 && 256 % step == 0, "step must divide 256")
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { blob =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(blob.data))
        require(img != null, s"undecodable media payload for doc ${blob.doc_id}")
        val w = img.getWidth
        val h = img.getHeight
        var runs = 0L
        var y = 0
        while (y < h) {
          var prev = -1
          var x = 0
          while (x < w) {
            val q = ((img.getRGB(x, y) >> 16) & 0xff) / step
            if (q != prev) { runs += 1L; prev = q }
            x += 1
          }
          y += 1
        }
        ImageRle(blob.doc_id, w.toLong * h, runs)
      }
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

  final case class ResizedStats(
      doc_id: Long,
      src_w: Int,
      src_h: Int,
      dst_w: Int,
      dst_h: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  /** REAL pixel resize: decode through `javax.imageio`, downsample with
    * INTEGER nearest-neighbor (dst dims `(side·maxDim) div max(w,h)`,
    * source pixel `(x·srcW) div dstW` — no floating point anywhere, so
    * the resampled channel sums are engine-exact and the gate oracle
    * replays them per destination pixel). Aspect ratio preserved;
    * images already within `maxDim` pass through unscaled. Pixel
    * buffers live and die inside the task — only fixed-width stats rows
    * cross the shuffle. */
  def decodeResizeStats(blobs: Dataset[MediaBlob], maxDim: Int): Dataset[ResizedStats] = {
    import blobs.sparkSession.implicits._
    require(maxDim > 0, "maxDim must be positive")
    blobs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { blob =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob.data))
        require(img != null, s"undecodable media payload for doc ${blob.doc_id}")
        val w = img.getWidth
        val h = img.getHeight
        val side = math.max(w, h)
        val (dw, dh) =
          if (side <= maxDim) (w, h)
          else (math.max(1, w * maxDim / side), math.max(1, h * maxDim / side))
        var sr = 0L
        var sg = 0L
        var sb = 0L
        var y = 0
        while (y < dh) {
          val srcY = y * h / dh
          var x = 0
          while (x < dw) {
            val p = img.getRGB(x * w / dw, srcY)
            sr += (p >> 16) & 0xff
            sg += (p >> 8) & 0xff
            sb += p & 0xff
            x += 1
          }
          y += 1
        }
        ResizedStats(blob.doc_id, w, h, dw, dh, sr, sg, sb)
      }
    }
  }

  /** One decoded frame's exact integer statistics. */
  final case class FrameStats(
      doc_id: Long,
      frame_idx: Long,
      width: Int,
      height: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  /** Deterministic multi-frame ANIMATED GIF for `docId`, encoded through
    * the REAL JDK GIF codec (`writeToSequence` — ships in a stock JRE):
    * `docId % 4 + 2` solid-color frames, frame f's channel value
    * `(docId·(3+2·ch) + 11·f + 5) mod 256`. Solid frames palettize
    * losslessly (one color table entry), so decoded per-frame channel
    * sums have the exact closed form `w·h·v(f,ch)` — what the frames
    * gate oracle recomputes. */
  def encodeAnimatedGif(docId: Long): MediaBlob = {
    val w = (docId % 24 + 8).toInt
    val h = (docId % 16 + 8).toInt
    val n = (docId % 4 + 2).toInt
    javax.imageio.ImageIO.setUseCache(false)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < n) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val r = ((docId * 3 + 11 * f + 5) % 256).toInt
      val g = ((docId * 5 + 11 * f + 5) % 256).toInt
      val b = ((docId * 7 + 11 * f + 5) % 256).toInt
      val gfx = img.createGraphics()
      gfx.setColor(new java.awt.Color(r, g, b))
      gfx.fillRect(0, 0, w, h)
      gfx.dispose()
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    MediaBlob(docId, "video/gif", bos.toByteArray,
      MediaMeta(w, h, 3, durationMs = n * 100L))
  }

  /** Attach REAL animated-GIF payloads to a documents-like DataFrame —
    * the multi-frame counterpart of [[withEncodedImages]]. */
  def withEncodedGifs(spark: SparkSession, df: DataFrame, idCol: String): Dataset[MediaBlob] = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map(encodeAnimatedGif)
  }

  /** REAL frame extraction: every frame of a multi-frame payload goes
    * through the JDK GIF reader (`getNumImages(true)` + per-index
    * `read`) and reduces to exact integer channel sums — the video
    * frame-sampling path with actual decoded pixels (the synthetic
    * [[sampleFrames]] stays for the codec-free gate). Frame pixel
    * buffers live and die inside the task; only fixed-width stats rows
    * cross the shuffle, and the fan-out is one row per frame. */
  def decodeFrameStats(blobs: Dataset[MediaBlob]): Dataset[FrameStats] = {
    import blobs.sparkSession.implicits._
    blobs.flatMap { blob =>
      javax.imageio.ImageIO.setUseCache(false)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(blob.data))
      // iis is Closeable — try/finally so the reject path and a failed
      // read release it too (heap-backed here, but the contract stands)
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, s"no ImageIO reader for doc ${blob.doc_id}")
        val reader = readers.next()
        reader.setInput(iis)
        try {
          val n = reader.getNumImages(true)
          (0 until n).map { f =>
            val img = reader.read(f)
            val w = img.getWidth
            val h = img.getHeight
            var sr = 0L
            var sg = 0L
            var sb = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xff
                sg += (p >> 8) & 0xff
                sb += p & 0xff
                x += 1
              }
              y += 1
            }
            FrameStats(blob.doc_id, f.toLong, w, h, sr, sg, sb)
          }
        } finally reader.dispose()
      } finally iis.close()
    }
  }

  final case class PatchStats(
      doc_id: Long,
      patch_row: Int,
      patch_col: Int,
      n_pixels: Long,
      sum_lum: Long)

  /**
   * ViT-style patch grid over REAL decoded pixels: partition each image
   * into a `grid`×`grid` rectangle grid (floor-division edges — patch
   * (i,j) covers rows [i·h/g, (i+1)·h/g)), and reduce each patch to its
   * exact integer weighted-luminance sum — the patch-embedding prep
   * step (each patch's stats row is what a projection layer consumes).
   * Fan-out is grid² fixed-width rows per image; pixel buffers die in
   * the decode task.
   */
  def patchGridStats(blobs: Dataset[MediaBlob], grid: Int): Dataset[PatchStats] = {
    require(grid >= 1, "grid must be >= 1")
    import blobs.sparkSession.implicits._
    blobs.flatMap { blob =>
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(blob.data))
      require(img != null, s"undecodable media payload for doc ${blob.doc_id}")
      val w = img.getWidth
      val h = img.getHeight
      for {
        pi <- 0 until grid
        pj <- 0 until grid
      } yield {
        val y0 = pi * h / grid; val y1 = (pi + 1) * h / grid
        val x0 = pj * w / grid; val x1 = (pj + 1) * w / grid
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = img.getRGB(x, y)
            sum += 299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
              114L * (p & 0xff)
            x += 1
          }
          y += 1
        }
        PatchStats(blob.doc_id, pi, pj, (y1 - y0).toLong * (x1 - x0), sum)
      }
    }
  }

  /**
   * Scene-cut detection over decoded frame statistics: a frame is a cut
   * when its weighted-luminance sum jumps by at least `minMeanDelta`
   * per pixel vs the previous frame (`|lum_f − lum_{f−1}| ≥
   * w·h·1000·minMeanDelta` — the exact integer form; lum is the
   * 299/587/114 integer weighting, scale 1000). One lag window keyed on
   * the video id over fixed-width stats rows — the pixel buffers died
   * inside the decode task, so the shuffle moves ~40 bytes per frame
   * regardless of resolution.
   */
  def sceneCuts(frames: DataFrame, minMeanDelta: Long): DataFrame = {
    val lum = col("sum_r") * 299L + col("sum_g") * 587L + col("sum_b") * 114L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames
      .withColumn("lum", lum)
      .withColumn("prev_lum", lag(col("lum"), 1).over(w))
      .filter(col("prev_lum").isNotNull &&
        abs(col("lum") - col("prev_lum")) >=
          col("width").cast("long") * col("height") * 1000L * minMeanDelta)
      .select(col("doc_id"), col("frame_idx").as("cut_frame"),
        (col("lum") - col("prev_lum")).as("lum_delta"))
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
