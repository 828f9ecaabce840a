package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Multimodal.{MediaBlob, MediaMeta}

/**
 * REAL audio decode for the multimodal pipeline: a RIFF/WAVE PCM parser
 * implemented directly on the container's public byte layout (RIFF
 * chunk walk → `fmt ` → `data`), so any user's PCM-16 WAV decodes with
 * no external codec. The counterpart of [[ImageIoDecoder]] for the
 * audio modality.
 *
 * Stats are EXACT integers (frame count, Σ|s|, max|s|, Σs²) accumulated
 * in the decode loop — deterministic under task retry, and the gate's
 * synthetic closed-form corpus lets DuckDB re-derive every value from
 * the generator formula (`multimodal_audio_wav`).
 *
 * Scale shape: mapPartitions (one decoder instance per task, the
 * `mapInPandas` batch shape), audio bytes never cross a shuffle —
 * only the fixed-width stats rows do.
 */
object Audio {

  final case class WavStats(
      doc_id: Long,
      sample_rate: Int,
      n_channels: Int,
      bits_per_sample: Int,
      n_frames: Long,
      sum_abs: Long,
      max_abs: Long,
      sum_sq: Long)

  // --- RIFF/WAVE writer (deterministic test corpus) ------------------------

  /** Encode mono PCM-16 samples as a standards-compliant WAV. Every 3rd
    * doc gets a junk `LIST` chunk between `fmt ` and `data` so the gate
    * proves the reader WALKS chunks rather than assuming the canonical
    * 44-byte layout. */
  def encodeWavPcm16(docId: Long, sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val junk = if (docId % 3 == 0) 12 else 0
    val dataLen = samples.length * 2
    val riffLen = 4 + (8 + 16) + (if (junk > 0) 8 + junk else 0) + (8 + dataLen)
    val bb = ByteBuffer.allocate(8 + riffLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)            // PCM
      .putShort(1.toShort)            // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)         // byte rate
      .putShort(2.toShort)            // block align
      .putShort(16.toShort)           // bits/sample
    if (junk > 0) {
      bb.put("LIST".getBytes("US-ASCII")).putInt(junk)
      var i = 0
      while (i < junk) { bb.put((i * 7 % 251).toByte); i += 1 }
    }
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  // --- RIFF/WAVE reader (the real kernel) ----------------------------------

  /** Parse a RIFF/WAVE byte payload: chunk walk (unknown chunks skipped,
    * odd sizes padded per spec), `fmt ` read for rate/channels/bits,
    * PCM-16 LE frames of `data` reduced to exact integer stats. */
  def decodeWavStats(docId: Long, bytes: Array[Byte]): WavStats = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
    }
    require(tag() == "RIFF", s"doc $docId: not a RIFF container")
    bb.getInt() // container length (trust the chunk walk instead)
    require(tag() == "WAVE", s"doc $docId: not a WAVE form")
    var rate = -1; var channels = -1; var bits = -1
    var nFrames = 0L; var sumAbs = 0L; var maxAbs = 0L; var sumSq = 0L
    while (bb.remaining() >= 8) {
      val id = tag()
      val len = bb.getInt()
      // consume every chunk by its declared length (+ odd pad): a data
      // chunk whose len is not a whole frame multiple must not leave
      // remainder bytes to misalign the next chunk tag
      val chunkEnd = math.min(bb.position() + len + (len & 1), bb.limit())
      id match {
        case "fmt " =>
          val codec = bb.getShort()
          require(codec == 1, s"doc $docId: not PCM (fmt $codec)")
          channels = bb.getShort().toInt
          rate = bb.getInt()
          bb.getInt() // byte rate
          bb.getShort() // block align
          bits = bb.getShort().toInt
          require(bits == 16, s"doc $docId: only PCM-16 supported (got $bits)")
        case "data" =>
          require(rate > 0, s"doc $docId: data chunk before fmt")
          val frames = len / (2 * channels)
          var f = 0L
          while (f < frames) {
            var c = 0
            while (c < channels) {
              val s = bb.getShort().toLong
              val a = math.abs(s)
              sumAbs += a
              sumSq += s * s
              if (a > maxAbs) maxAbs = a
              c += 1
            }
            f += 1L
          }
          nFrames += frames
        case _ => () // unknown chunk: skipped by the chunkEnd seek
      }
      bb.position(chunkEnd)
    }
    require(rate > 0 && nFrames > 0, s"doc $docId: missing fmt/data chunk")
    WavStats(docId, rate, channels, bits, nFrames, sumAbs, maxAbs, sumSq)
  }

  // --- deterministic corpus + the end-to-end stage -------------------------

  /** Closed-form synthetic signal (the SQL oracle replays it):
    * n = 256 + id mod 64 samples, s_i = ((id·31 + i·17) mod 2001) − 1000,
    * rate = 8000 + (id mod 8)·1000. */
  def synthBlob(docId: Long): MediaBlob = {
    val n = (256 + docId % 64).toInt
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = (((docId * 31 + i.toLong * 17) % 2001) - 1000).toShort
      i += 1
    }
    val rate = (8000 + (docId % 8) * 1000).toInt
    MediaBlob(docId, "audio/wav", encodeWavPcm16(docId, rate, samples),
      MediaMeta(0, 0, 1, n * 1000L / rate))
  }

  /** [[synthBlob]] scaled 40× and clamped to PCM-16 range — samples
    * with |raw| ≥ 820 saturate at ±32767/−32768, planting deterministic
    * CLIPPING runs (the formula steps +17 mod 2001 per frame, so
    * saturated stretches are contiguous index runs). */
  def synthLoudBlob(docId: Long): MediaBlob = {
    val n = (256 + docId % 64).toInt
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      val raw = ((docId * 31 + i.toLong * 17) % 2001) - 1000
      val scaled = raw * 40
      samples(i) = math.max(-32768L, math.min(32767L, scaled)).toShort
      i += 1
    }
    val rate = (8000 + (docId % 8) * 1000).toInt
    MediaBlob(docId, "audio/wav", encodeWavPcm16(docId, rate, samples),
      MediaMeta(0, 0, 1, n * 1000L / rate))
  }

  final case class WavClippingStats(
      doc_id: Long,
      n_frames: Long,
      n_clipped: Long,
      max_clip_run: Long)

  /**
   * Clipping census over real decoded PCM: a frame is CLIPPED when it
   * saturates the PCM-16 range (s = 32767 or −32768); consecutive
   * clipped frames form runs and the longest run is the audibility
   * dial (a 1-frame clip is inaudible, a 50-frame run is distortion).
   * The audio-QA screen for recording/transcode defects; exact
   * integers, one pass per payload.
   */
  def decodeWavClippingStats(docId: Long, bytes: Array[Byte]): WavClippingStats = {
    val s = decodeSamples(docId, bytes)
    var clipped = 0L
    var run = 0L
    var maxRun = 0L
    var i = 0
    while (i < s.length) {
      if (s(i) == 32767 || s(i) == -32768) {
        clipped += 1; run += 1
        if (run > maxRun) maxRun = run
      } else run = 0
      i += 1
    }
    WavClippingStats(docId, s.length.toLong, clipped, maxRun)
  }

  /** Attach real WAV payloads to a documents-like frame. */
  def withWavAudio(spark: SparkSession, df: DataFrame, idCol: String): Dataset[MediaBlob] = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map(synthBlob)
  }

  /** [[withWavAudio]] with the clipping-planted loud corpus. */
  def withLoudWavAudio(spark: SparkSession, df: DataFrame, idCol: String): Dataset[MediaBlob] = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map(synthLoudBlob)
  }

  /** Clipping-census stage over WAV blobs. */
  def clippingStats(blobs: Dataset[MediaBlob]): Dataset[WavClippingStats] = {
    import blobs.sparkSession.implicits._
    blobs.map(b => decodeWavClippingStats(b.doc_id, b.data))
  }

  /** [[synthBlob]] with planted SILENCE: every third 32-frame block
    * (block index ≡ 0 mod 3) is zeroed, the rest carry the noise
    * formula — the closed-form signal the VAD gate detects speech-like
    * activity islands in. */
  def synthVadBlob(docId: Long): MediaBlob = {
    val n = (256 + docId % 64).toInt
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) =
        if ((i / 32) % 3 == 0) 0
        else (((docId * 31 + i.toLong * 17) % 2001) - 1000).toShort
      i += 1
    }
    val rate = (8000 + (docId % 8) * 1000).toInt
    MediaBlob(docId, "audio/wav", encodeWavPcm16(docId, rate, samples),
      MediaMeta(0, 0, 1, n * 1000L / rate))
  }

  /** VAD-corpus variant of [[withWavAudio]]. */
  def withVadAudio(spark: SparkSession, df: DataFrame, idCol: String): Dataset[MediaBlob] = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map(synthVadBlob)
  }

  /** Near-zero-mean period waveforms for the pitch corpus, one per
    * planted period. Values are hand-designed so the TRUE period's
    * autocorrelation dominates every other candidate lag (a
    * near-period-2 aliased wave like k·997 mod 2001 would not). */
  private val PitchWaves: Map[Int, Array[Int]] = Map(
    2 -> Array(1000, -1000),
    4 -> Array(1000, -200, -1000, 200),
    8 -> Array(1000, 300, -800, 150, -1000, -300, 800, -150))

  /** [[synthBlob]] with planted PERIODICITY: period p = 2·2^(id mod 3)
    * ∈ {2,4,8}, doc-rotated phase, amplitude 1 + id mod 3 — the
    * closed-form signal whose pitch the autocorrelation gate recovers
    * (`best_lag` = p in EVERY window, verified exhaustively). */
  def synthPitchBlob(docId: Long): MediaBlob = {
    val p = 2 << (docId % 3).toInt
    val wave = PitchWaves(p)
    val amp = 1 + (docId % 3).toInt
    val n = (256 + docId % 64).toInt
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = (wave(((i + docId) % p).toInt) * amp).toShort
      i += 1
    }
    val rate = (8000 + (docId % 8) * 1000).toInt
    MediaBlob(docId, "audio/wav", encodeWavPcm16(docId, rate, samples),
      MediaMeta(0, 0, 1, n * 1000L / rate))
  }

  /** Pitch-corpus variant of [[withWavAudio]]. */
  def withPitchAudio(spark: SparkSession, df: DataFrame, idCol: String): Dataset[MediaBlob] = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map(synthPitchBlob)
  }

  /** Decode stage: real parser per blob inside mapPartitions. */
  def decodeStats(blobs: Dataset[MediaBlob]): Dataset[WavStats] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b => decodeWavStats(b.doc_id, b.data)))
  }

  final case class WavDecimStats(
      doc_id: Long,
      factor: Int,
      sample_rate_out: Int,
      n_frames_out: Long,
      sum_abs: Long,
      max_abs: Long,
      sum_sq: Long)

  /** Integer decimation resample: keep every `k`-th FRAME (all channels
    * of frames 0, k, 2k, …) while parsing — the audio twin of the
    * integer pixel downsample ([[Multimodal.decodeResizeStats]]): no
    * floats, no interpolation, every output value IS an input value, so
    * the stats replay closed-form in SQL. (A production resampler would
    * low-pass first; decimation is the exact-arithmetic core the gate
    * can pin.) Output rate is `rate div k` — exact when k divides the
    * rate. */
  def decodeWavDecimatedStats(docId: Long, bytes: Array[Byte], k: Int): WavDecimStats = {
    require(k >= 1, "decimation factor must be >= 1")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
    }
    require(tag() == "RIFF", s"doc $docId: not a RIFF container")
    bb.getInt()
    require(tag() == "WAVE", s"doc $docId: not a WAVE form")
    var rate = -1; var channels = -1
    var nOut = 0L; var sumAbs = 0L; var maxAbs = 0L; var sumSq = 0L
    // global frame index across data chunks: multi-chunk audio is ONE
    // logical stream, so the every-k-th-frame phase must carry over
    // rather than restart at each chunk boundary
    var f = 0L
    while (bb.remaining() >= 8) {
      val id = tag()
      val len = bb.getInt()
      // consume every chunk by its declared length (+ RIFF odd-length
      // pad), never by how many whole frames we happened to read — a
      // data chunk whose len is not a frame multiple would otherwise
      // leave remainder bytes in the buffer and misalign every
      // subsequent chunk tag
      val chunkEnd = math.min(bb.position() + len + (len & 1), bb.limit())
      id match {
        case "fmt " =>
          val codec = bb.getShort()
          require(codec == 1, s"doc $docId: not PCM (fmt $codec)")
          channels = bb.getShort().toInt
          rate = bb.getInt()
          bb.getInt(); bb.getShort()
          val bits = bb.getShort().toInt
          require(bits == 16, s"doc $docId: only PCM-16 supported (got $bits)")
        case "data" =>
          require(rate > 0, s"doc $docId: data chunk before fmt")
          val frames = len / (2 * channels)
          val endFrame = f + frames
          while (f < endFrame) {
            var c = 0
            if (f % k == 0) {
              while (c < channels) {
                val s = bb.getShort().toLong
                val a = math.abs(s)
                sumAbs += a
                sumSq += s * s
                if (a > maxAbs) maxAbs = a
                c += 1
              }
              nOut += 1L
            } else {
              bb.position(bb.position() + 2 * channels)
            }
            f += 1L
          }
        case _ => ()
      }
      bb.position(chunkEnd)
    }
    require(rate > 0 && nOut > 0, s"doc $docId: missing fmt/data chunk")
    WavDecimStats(docId, k, rate / k, nOut, sumAbs, maxAbs, sumSq)
  }

  /** Decimation stage: same mapPartitions shape as [[decodeStats]]. */
  def decimateStats(blobs: Dataset[MediaBlob], k: Int): Dataset[WavDecimStats] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b => decodeWavDecimatedStats(b.doc_id, b.data, k)))
  }

  final case class WavGainStats(
      doc_id: Long,
      max_abs_in: Long,
      peak_out: Long,
      sum_abs_out: Long)

  /**
   * Peak (loudness) normalization in EXACT integer arithmetic: scale
   * every sample so the peak hits `targetPeak`, with the per-sample map
   * `out = sign(v) · (|v|·target div max|v|)` — magnitude-side floor
   * division, so the result is identical under any engine's division
   * convention (truncation vs floor differ on negatives; working on
   * |v| sidesteps it). Silent payloads pass through (gain undefined).
   * One decode pass + one bounded sample buffer per payload; only the
   * stats row crosses the shuffle.
   */
  def decodeWavGainStats(docId: Long, bytes: Array[Byte], targetPeak: Long): WavGainStats = {
    val s = decodeSamples(docId, bytes)
    var maxAbs = 0L
    var i = 0
    while (i < s.length) {
      val a = math.abs(s(i).toLong)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    var sumOut = 0L
    var peakOut = 0L
    if (maxAbs > 0) {
      i = 0
      while (i < s.length) {
        val a = math.abs(s(i).toLong) * targetPeak / maxAbs
        sumOut += a
        if (a > peakOut) peakOut = a
        i += 1
      }
    }
    WavGainStats(docId, maxAbs, peakOut, sumOut)
  }

  /** Decode all PCM-16 samples of a WAV payload (chunk-walk shared with
    * the stats kernels; bounded by the payload). */
  private def decodeSamples(docId: Long, bytes: Array[Byte]): Array[Short] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
    }
    require(tag() == "RIFF", s"doc $docId: not a RIFF container")
    bb.getInt()
    require(tag() == "WAVE", s"doc $docId: not a WAVE form")
    var rate = -1; var channels = -1; var nData = 0
    val out = scala.collection.mutable.ArrayBuffer.empty[Short]
    while (bb.remaining() >= 8) {
      val id = tag()
      val len = bb.getInt()
      val chunkEnd = math.min(bb.position() + len + (len & 1), bb.limit())
      id match {
        case "fmt " =>
          val codec = bb.getShort()
          require(codec == 1, s"doc $docId: not PCM (fmt $codec)")
          channels = bb.getShort().toInt
          rate = bb.getInt()
          bb.getInt(); bb.getShort()
          val bits = bb.getShort().toInt
          require(bits == 16, s"doc $docId: only PCM-16 supported (got $bits)")
        case "data" =>
          require(rate > 0, s"doc $docId: data chunk before fmt")
          nData += 1
          val frames = len / (2 * channels)
          var f = 0
          while (f < frames) {
            var c = 0
            while (c < channels) { out += bb.getShort(); c += 1 }
            f += 1
          }
        case _ => ()
      }
      bb.position(chunkEnd)
    }
    // Same missing-data contract as the sibling kernels (decodeWavStats,
    // decodeWavBlockStats): a WAV with fmt but no data chunk is rejected
    // loudly, not silently decoded to zero samples. A present-but-empty
    // data chunk (len 0) is still legal silence.
    require(rate > 0 && nData > 0, s"doc $docId: missing fmt/data chunk")
    out.toArray
  }

  /** Gain-normalization stage: same mapPartitions shape as decodeStats. */
  def gainStats(blobs: Dataset[MediaBlob], targetPeak: Long): Dataset[WavGainStats] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b => decodeWavGainStats(b.doc_id, b.data, targetPeak)))
  }

  final case class WavBlockStats(
      doc_id: Long,
      block_idx: Long,
      n_frames: Long,
      sum_abs: Long,
      max_abs: Long)

  /** Block-energy decode: the WAV parse of [[decodeWavStats]], reduced
    * per `blockFrames`-frame block (global frame index — blocks span
    * data-chunk boundaries) instead of per payload. The framing step
    * every frame-level audio operator (VAD, loudness normalization,
    * silence trim) keys on; output rows are fixed-width, one per block. */
  def decodeWavBlockStats(
      docId: Long, bytes: Array[Byte], blockFrames: Int): Seq[WavBlockStats] = {
    require(blockFrames >= 1, "blockFrames must be >= 1")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
    }
    require(tag() == "RIFF", s"doc $docId: not a RIFF container")
    bb.getInt()
    require(tag() == "WAVE", s"doc $docId: not a WAVE form")
    var rate = -1; var channels = -1
    var f = 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[WavBlockStats]
    var blk = -1L; var bn = 0L; var bsum = 0L; var bmax = 0L
    def flush(): Unit = if (blk >= 0) {
      out += WavBlockStats(docId, blk, bn, bsum, bmax)
      bn = 0L; bsum = 0L; bmax = 0L
    }
    while (bb.remaining() >= 8) {
      val id = tag()
      val len = bb.getInt()
      val chunkEnd = math.min(bb.position() + len + (len & 1), bb.limit())
      id match {
        case "fmt " =>
          val codec = bb.getShort()
          require(codec == 1, s"doc $docId: not PCM (fmt $codec)")
          channels = bb.getShort().toInt
          rate = bb.getInt()
          bb.getInt(); bb.getShort()
          val bits = bb.getShort().toInt
          require(bits == 16, s"doc $docId: only PCM-16 supported (got $bits)")
        case "data" =>
          require(rate > 0, s"doc $docId: data chunk before fmt")
          val frames = len / (2 * channels)
          val endFrame = f + frames
          while (f < endFrame) {
            val b = f / blockFrames
            if (b != blk) { flush(); blk = b }
            var c = 0
            while (c < channels) {
              val a = math.abs(bb.getShort().toLong)
              bsum += a
              if (a > bmax) bmax = a
              c += 1
            }
            bn += 1L
            f += 1L
          }
        case _ => ()
      }
      bb.position(chunkEnd)
    }
    flush()
    require(rate > 0 && f > 0, s"doc $docId: missing fmt/data chunk")
    out.toSeq
  }

  final case class WavZcrStats(
      doc_id: Long,
      n_samples: Long,
      zcr: Long,
      n_pos: Long,
      n_neg: Long,
      n_zero: Long)

  /**
   * Zero-crossing rate over the real channel-0 PCM stream — the third
   * classic frame feature next to energy ([[blockStats]]) and
   * periodicity ([[autocorrStats]]): `zcr` counts adjacent sample
   * pairs with a STRICT sign flip (s_i·s_{i+1} < 0; zeros break runs,
   * so silence contributes nothing), plus the sign census. Exact
   * integers; one decode pass per row inside mapPartitions.
   */
  def decodeZcrStats(blobs: Dataset[MediaBlob]): Dataset[WavZcrStats] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { blob =>
      val bb = ByteBuffer.wrap(blob.data).order(ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
      }
      require(tag() == "RIFF", s"doc ${blob.doc_id}: not a RIFF container")
      bb.getInt()
      require(tag() == "WAVE", s"doc ${blob.doc_id}: not a WAVE form")
      var rate = -1; var channels = -1
      var f = 0L; var zcr = 0L; var pos = 0L; var neg = 0L; var zero = 0L
      var prev = 0
      while (bb.remaining() >= 8) {
        val id = tag()
        val len = bb.getInt()
        val chunkEnd = math.min(bb.position() + len + (len & 1), bb.limit())
        id match {
          case "fmt " =>
            val codec = bb.getShort()
            require(codec == 1, s"doc ${blob.doc_id}: not PCM (fmt $codec)")
            channels = bb.getShort().toInt
            rate = bb.getInt()
            bb.getInt(); bb.getShort()
            val bits = bb.getShort().toInt
            require(bits == 16,
              s"doc ${blob.doc_id}: only PCM-16 supported (got $bits)")
          case "data" =>
            require(rate > 0, s"doc ${blob.doc_id}: data chunk before fmt")
            val frames = len / (2 * channels)
            val endFrame = f + frames
            while (f < endFrame) {
              val s = bb.getShort().toInt // channel 0
              var c = 1
              while (c < channels) { bb.getShort(); c += 1 }
              if (s > 0) pos += 1 else if (s < 0) neg += 1 else zero += 1
              if (f > 0 && s.toLong * prev < 0) zcr += 1
              prev = s
              f += 1L
            }
          case _ => ()
        }
        bb.position(chunkEnd)
      }
      require(rate > 0 && f > 0, s"doc ${blob.doc_id}: missing fmt/data chunk")
      WavZcrStats(blob.doc_id, f, zcr, pos, neg, zero)
    })
  }

  /** Block-stats stage (flatMap fan-out: one row per block). */
  def blockStats(blobs: Dataset[MediaBlob], blockFrames: Int): Dataset[WavBlockStats] = {
    import blobs.sparkSession.implicits._
    blobs.flatMap(b => decodeWavBlockStats(b.doc_id, b.data, blockFrames))
  }

  /**
   * Amplitude-flux onset detection from block stats: per consecutive
   * block pair, `flux = |sum_abs_w − sum_abs_{w−1}|` — the novelty
   * curve onset/beat trackers threshold; its argmax is the strongest
   * transient. All exact integers over the [[blockStats]] rows (one
   * keyed window + one grouped pass, fixed-width rows only — audio
   * bytes never cross a shuffle); argmax tie-breaks to the earliest
   * block, engine-deterministic.
   */
  def fluxStats(blocks: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("block_idx"))
    val f = blocks
      .withColumn("prev", lag(col("sum_abs"), 1).over(w))
      .where(col("prev").isNotNull)
      .withColumn("flux", abs(col("sum_abs") - col("prev")))
    val pick = Window.partitionBy(col("doc_id"))
      .orderBy(col("flux").desc, col("block_idx"))
    f.withColumn("rk", row_number().over(pick))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_transitions"),
        sum(col("flux")).cast("long").as("total_flux"),
        max(col("flux")).cast("long").as("max_flux"),
        min(when(col("rk") === 1, col("block_idx"))).cast("long")
          .as("max_flux_block"))
      .orderBy(col("doc_id"))
  }

  /**
   * Voice-activity segments from block energies: a block is ACTIVE when
   * `max_abs > threshold`; consecutive active blocks merge into maximal
   * segments (gaps-and-islands — one keyed window, no join), emitted as
   * (seg_idx, start_block, n_blocks, seg_sum_abs). The silence-trim /
   * speech-extraction step of an audio pipeline, over fixed-width
   * block rows only.
   */
  def vadSegments(blocks: DataFrame, threshold: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("block_idx"))
    val active = blocks.filter(col("max_abs") > threshold)
      .withColumn("island", col("block_idx") - row_number().over(w))
    val wSeg = Window.partitionBy(col("doc_id")).orderBy(col("start_block"))
    active.groupBy(col("doc_id"), col("island"))
      .agg(min(col("block_idx")).as("start_block"),
        count(lit(1)).as("n_blocks"),
        sum(col("sum_abs")).as("seg_sum_abs"))
      .withColumn("seg_idx", row_number().over(wSeg).cast("long"))
      .select(col("doc_id"), col("seg_idx"), col("start_block"),
        col("n_blocks"), col("seg_sum_abs"))
  }

  final case class WavAutocorr(
      doc_id: Long,
      win_idx: Long,
      energy: Long,
      corrs: Seq[Long],
      best_lag: Int)

  /**
   * Windowed integer autocorrelation — the periodicity/pitch-detection
   * primitive (the time-domain stage every classic pitch tracker runs
   * before peak-picking). Per full `win`-frame window:
   * `r_ℓ = Σ_{i<win−ℓ} s[i]·s[i+ℓ]` for each candidate lag, plus the
   * window energy `r_0 = Σ s²`; `best_lag` is the argmax over the
   * candidate lags (smallest lag on ties — deterministic). EXACT Long
   * arithmetic end to end (|s| ≤ 32768, win ≤ 2¹⁵ → |r| < 2⁴⁵), so the
   * closed-form gate corpus replays value-for-value in SQL. Trailing
   * partial windows are dropped (a pitch estimate over a ragged tail
   * is not comparable across docs).
   *
   * Scale shape: [[decodeSamples]]' real chunk-walk parse + this loop
   * run per row inside mapPartitions; audio bytes never cross a
   * shuffle — only the fixed-width per-window rows do.
   */
  def decodeWavAutocorr(
      docId: Long, bytes: Array[Byte], win: Int, lags: Seq[Int]): Seq[WavAutocorr] = {
    require(win >= 2, "autocorr window must have at least 2 frames")
    require(lags.nonEmpty && lags.forall(l => l >= 1 && l < win),
      s"lags must be in [1, win); got $lags")
    val s = decodeSamples(docId, bytes)
    val nWin = s.length / win
    (0 until nWin).map { w =>
      val base = w * win
      var energy = 0L
      var i = 0
      while (i < win) {
        val v = s(base + i).toLong
        energy += v * v
        i += 1
      }
      val corrs = lags.map { lag =>
        var r = 0L
        var j = 0
        while (j < win - lag) {
          r += s(base + j).toLong * s(base + j + lag).toLong
          j += 1
        }
        r
      }
      val best = corrs.zip(lags).maxBy { case (r, lag) => (r, -lag) }._2
      WavAutocorr(docId, w.toLong, energy, corrs, best)
    }
  }

  /** Autocorrelation stage: same mapPartitions shape as [[decodeStats]]. */
  def autocorrStats(blobs: Dataset[MediaBlob], win: Int, lags: Seq[Int]): Dataset[WavAutocorr] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap(b => decodeWavAutocorr(b.doc_id, b.data, win, lags)))
  }
}
