package graft.core

import java.nio.ByteBuffer
import java.nio.ByteOrder

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.pipeline.{Audio, Dedup, Packing, Sampling, Sketches, TextAnalysis, TableStats}
import graft.sources.ProtoInterop
import graft.util.{HistogramAccumulator, EngineMetrics, MetricsExport}

/**
 * Round-16 falsifier wave for the branch-coverage backlog named in
 * VERDICT r14 / BASELINE.md: the defensive guards and rarely-taken arms
 * whose FAILING edge the suite never exercised — malformed WAV
 * containers, protobuf wire-format corruption, histogram quantile
 * overflow, every remaining bounds `require` in the pipeline operators,
 * and the non-foldable / null lanes of the custom vector expressions.
 * A guard whose failing edge never fired is a guard we can't trust.
 */
class GuardEdgesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- WAV container guards -------------------------------------------

  /** Minimal RIFF/WAVE builder with arbitrary chunk order/content. */
  private def wav(chunks: (String, Array[Byte])*): Array[Byte] = {
    val body = chunks.map { case (id, payload) =>
      val padded = payload.length + (payload.length & 1)
      val bb = ByteBuffer.allocate(8 + padded).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")); bb.putInt(payload.length); bb.put(payload)
      bb.array()
    }
    val total = body.map(_.length).sum
    val bb = ByteBuffer.allocate(12 + total).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(4 + total)
    bb.put("WAVE".getBytes("US-ASCII"))
    body.foreach(bb.put)
    bb.array()
  }

  private def fmtChunk(codec: Short = 1, channels: Short = 1,
      rate: Int = 8000, bits: Short = 16): Array[Byte] = {
    val bb = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    bb.putShort(codec); bb.putShort(channels); bb.putInt(rate)
    bb.putInt(rate * channels * bits / 8)
    bb.putShort((channels * bits / 8).toShort); bb.putShort(bits)
    bb.array()
  }

  private def dataChunk(samples: Array[Short]): Array[Byte] = {
    val bb = ByteBuffer.allocate(samples.length * 2).order(ByteOrder.LITTLE_ENDIAN)
    samples.foreach(bb.putShort)
    bb.array()
  }

  private val tone = Array.tabulate(32)(i => ((i % 7) * 100 - 300).toShort)

  test("WAV: data chunk before fmt is rejected (stream misorder guard)") {
    val b = wav("data" -> dataChunk(tone), "fmt " -> fmtChunk())
    val e = intercept[IllegalArgumentException] { Audio.decodeWavStats(7L, b) }
    assert(e.getMessage.contains("data chunk before fmt"))
  }

  test("WAV: missing data chunk is rejected after the walk completes") {
    val b = wav("fmt " -> fmtChunk())
    val e = intercept[IllegalArgumentException] { Audio.decodeWavStats(7L, b) }
    assert(e.getMessage.contains("missing fmt/data"))
  }

  test("WAV: not a WAVE form is rejected") {
    val b = wav("fmt " -> fmtChunk(), "data" -> dataChunk(tone))
    b(8) = 'X'.toByte // WAVE -> XAVE
    val e = intercept[IllegalArgumentException] { Audio.decodeWavStats(7L, b) }
    assert(e.getMessage.contains("not a WAVE"))
  }

  test("WAV: non-PCM codec and non-16-bit depth are rejected") {
    val mp3ish = wav("fmt " -> fmtChunk(codec = 85), "data" -> dataChunk(tone))
    assert(intercept[IllegalArgumentException] { Audio.decodeWavStats(7L, mp3ish) }
      .getMessage.contains("not PCM"))
    val eight = wav("fmt " -> fmtChunk(bits = 8), "data" -> dataChunk(tone))
    assert(intercept[IllegalArgumentException] { Audio.decodeWavStats(7L, eight) }
      .getMessage.contains("only PCM-16"))
  }

  test("WAV: unknown chunks (LIST, odd-length pad) are skipped without drift") {
    val plain = wav("fmt " -> fmtChunk(), "data" -> dataChunk(tone))
    val annotated = wav(
      "fmt " -> fmtChunk(),
      "LIST" -> Array[Byte](73, 78, 70, 79, 1), // odd length -> pad byte
      "data" -> dataChunk(tone),
      "cue " -> Array[Byte](0, 0, 0, 0))
    val a = Audio.decodeWavStats(7L, plain)
    val b = Audio.decodeWavStats(7L, annotated)
    assert(a == b, "unknown chunks changed decoded stats")
    // the sample/gain kernels share the chunk walk — same invariant
    val ga = Audio.decodeWavGainStats(7L, plain, targetPeak = 1000L)
    val gb = Audio.decodeWavGainStats(7L, annotated, targetPeak = 1000L)
    assert(ga == gb, "unknown chunks changed gain stats")
  }

  test("WAV block stats: multi-block stereo input exercises the flush boundary") {
    val stereo = Array.tabulate(64)(i => ((i * 37) % 2001 - 1000).toShort)
    val b = wav("fmt " -> fmtChunk(channels = 2), "data" -> dataChunk(stereo))
    val stats = Audio.decodeWavBlockStats(7L, b, blockFrames = 4)
    // 64 samples / 2 channels = 32 frames -> 8 blocks of 4 frames
    assert(stats.length == 8, s"expected 8 blocks, got ${stats.length}")
  }

  // --- protobuf wire-format guards --------------------------------------

  /** Raw tag byte(s) + payload appended after a valid message. */
  private def withTrailing(base: Array[Byte], extra: Array[Byte]): Array[Byte] =
    base ++ extra

  private def tagByte(field: Int, wire: Int): Byte = ((field << 3) | wire).toByte

  test("proto: unknown fixed64/fixed32/varint/len-delimited fields are skipped") {
    val sm = SegmentMeta(3, SegmentState.Sealed, 10, 123456L, 2, 99L)
    val base = ProtoInterop.encodeSegmentMeta(sm)
    val fixed64 = Array(tagByte(12, 1)) ++ Array.fill[Byte](8)(0x5a)
    val fixed32 = Array(tagByte(13, 5)) ++ Array.fill[Byte](4)(0x3c)
    val varint = Array(tagByte(14, 0), 0x7f.toByte)
    val lenDelim = Array(tagByte(15, 2), 3.toByte, 1.toByte, 2.toByte, 3.toByte)
    val decoded = ProtoInterop.decodeSegmentMeta(
      withTrailing(base, fixed64 ++ fixed32 ++ varint ++ lenDelim))
    assert(decoded == sm, "unknown trailing fields must not change the decode")
  }

  test("proto: truncated fixed64/fixed32 and unsupported wire types throw") {
    val sm = SegmentMeta(1, SegmentState.Active, 5, 1L, 0, 0L)
    val base = ProtoInterop.encodeSegmentMeta(sm)
    assert(intercept[IllegalArgumentException] {
      ProtoInterop.decodeSegmentMeta(
        withTrailing(base, Array(tagByte(12, 1), 0x01, 0x02))) // 2 of 8 bytes
    }.getMessage.contains("truncated fixed64"))
    assert(intercept[IllegalArgumentException] {
      ProtoInterop.decodeSegmentMeta(
        withTrailing(base, Array(tagByte(13, 5), 0x01))) // 1 of 4 bytes
    }.getMessage.contains("truncated fixed32"))
    assert(intercept[IllegalArgumentException] {
      ProtoInterop.decodeSegmentMeta(
        withTrailing(base, Array(tagByte(9, 3)))) // groups unsupported
    }.getMessage.contains("unsupported wire type"))
  }

  test("proto: IndexMeta round-trips alpha and skips unknown fields") {
    val m = IndexMeta("pe", dimension = 8, pqM = 2, pqK = 16,
      maxSegmentSize = 100, graphDegree = 4)
    val base = ProtoInterop.encodeIndexMeta(m)
    val junk = Array(tagByte(11, 1)) ++ Array.fill[Byte](8)(1) // unknown fixed64
    val decoded = ProtoInterop.decodeIndexMeta(withTrailing(base, junk))
    assert(decoded.name == m.name && decoded.dimension == m.dimension
      && decoded.pqM == m.pqM && decoded.graphAlpha == m.graphAlpha)
  }

  test("proto: VectorRecord and Codebook decoders skip unknown fields") {
    val rec = VectorRecord(2, 7, 0L, Array(1f, 2f, 3f, 4f), deleted = false,
      Array[Byte](9, 8))
    val recB = ProtoInterop.encodeVectorRecord(rec)
    val junk = Array(tagByte(9, 0), 0x05.toByte)
    val back = ProtoInterop.decodeVectorRecord(withTrailing(recB, junk),
      (s, v) => s.toLong << 32 | v)
    assert(back.segId == 2 && back.vecId == 7
      && back.embedding.toSeq == rec.embedding.toSeq)
    val cb = graft.index.Pq.Codebook(2, 2, 2,
      Array(0f, 0f, 1f, 1f, 2f, 2f, 3f, 3f))
    val cbB = ProtoInterop.encodeCodebook(cb)
    val cbBack = ProtoInterop.decodeCodebook(
      withTrailing(cbB, Array(tagByte(8, 0), 0x01.toByte)))
    assert(cbBack.m == 2 && cbBack.k == 2)
  }

  test("proto: writer drops null/empty strings and byte arrays entirely") {
    val w = new ProtoInterop.Writer
    w.string(1, null); w.string(1, ""); w.bytes(2, null)
    w.bytes(2, Array.emptyByteArray)
    assert(w.result().isEmpty, "null/empty fields must emit zero bytes")
  }

  // --- histogram quantiles ----------------------------------------------

  test("histogram percentile: bounds, empty, and top-bucket overflow arms") {
    intercept[IllegalArgumentException] {
      HistogramAccumulator.percentile(Array(1L), 0.0)
    }
    intercept[IllegalArgumentException] {
      HistogramAccumulator.percentile(Array(1L), 1.5)
    }
    assert(HistogramAccumulator.percentile(Array.fill(64)(0L), 0.5) == 0L)
    // all mass in the last bucket: the (1 << (i+1)) shift would wrap —
    // the i >= 62 arm must clamp to Long.MaxValue
    val top = Array.fill(64)(0L); top(63) = 5L
    assert(HistogramAccumulator.percentile(top, 0.5) == Long.MaxValue)
    val low = Array.fill(64)(0L); low(0) = 3L; low(2) = 1L
    assert(HistogramAccumulator.percentile(low, 0.5) == 1L)   // bucket 0 -> 2^1-1
    assert(HistogramAccumulator.percentile(low, 1.0) == 7L)   // bucket 2 -> 2^3-1
  }

  test("metrics export: parent-less relative path and nested path both write") {
    val em = EngineMetrics.forSession(spark)
    val bare = s"graft-metrics-edge-${System.nanoTime()}.json"
    try {
      MetricsExport.appendTo(bare, em, 123L) // Paths.get(bare).getParent == null
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(bare)))
    } finally java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(bare))
    val nested = java.nio.file.Files.createTempDirectory("graft-metrics")
      .resolve("a/b/m.json")
    MetricsExport.appendTo(nested.toString, em, 124L)
    assert(java.nio.file.Files.exists(nested))
  }

  // --- operator bounds requires ------------------------------------------

  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta", "web", "en"),
    (2L, "alpha beta gamma delta", "web", "en"),
    (3L, "epsilon zeta eta theta iota kappa", "books", "en"),
    (4L, "one two three four five six seven", "web", "en"))
    .toDF("doc_id", "text", "source", "lang")

  test("dedup guards: threshold sweep / aHash / CDC / edit-distance bounds") {
    intercept[IllegalArgumentException] {
      Dedup.jaccardThresholdSweep(docs, "doc_id", "text", thresholds = Seq())
    }
    intercept[IllegalArgumentException] {
      Dedup.jaccardThresholdSweep(docs, "doc_id", "text", thresholds = Seq(0))
    }
    intercept[IllegalArgumentException] {
      Dedup.jaccardThresholdSweep(docs, "doc_id", "text", thresholds = Seq(101))
    }
    val hashes = Seq((1L, 0x1234L), (2L, 0x1235L)).toDF("doc_id", "h")
    intercept[IllegalArgumentException] {
      Dedup.ahashNearDuplicates(hashes, "doc_id", "h", maxHamming = 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.ahashNearDuplicates(hashes, "doc_id", "h", maxHamming = -1)
    }
    intercept[IllegalArgumentException] {
      Dedup.cdcChunkNearDuplicates(docs, "doc_id", "text", threshold = 0.0)
    }
    intercept[IllegalArgumentException] {
      Dedup.cdcChunkNearDuplicates(docs, "doc_id", "text", maxDocsPerChunk = 1)
    }
    intercept[IllegalArgumentException] {
      Dedup.editDistanceVerify(docs, "doc_id", "text", "source", "lang",
        bucketChars = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.editDistanceVerify(docs, "doc_id", "text", "source", "lang",
        bucketChars = 4, maxDistance = 5)
    }
  }

  test("sampling guards: rates, split percentages, temperature") {
    intercept[IllegalArgumentException] {
      Sampling.rebalanceMixture(docs, "doc_id", "source", Map("web" -> 1.5))
    }
    intercept[IllegalArgumentException] {
      Sampling.rebalanceMixture(docs, "doc_id", "source", Map.empty,
        defaultRate = -0.1)
    }
    // multi-source rate fold (both the map-hit and default arms)
    val kept = Sampling.rebalanceMixture(docs, "doc_id", "source",
      Map("web" -> 1.0, "books" -> 0.0))
    assert(kept.count() == 3, "books rows must drop at rate 0")
    intercept[IllegalArgumentException] {
      Sampling.splitByGroup(docs, "doc_id", trainPct = 0)
    }
    intercept[IllegalArgumentException] {
      Sampling.splitByGroup(docs, "doc_id", trainPct = 95, valPct = 10)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(docs, "doc_id", "source", temperature = 0.5)
    }
    // the sqrt fast path (T == 2) and the pow general path must agree
    val t2 = Sampling.temperatureMixture(docs, "doc_id", "source", 2.0)
      .select("source", "rate_ppm").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val t3 = Sampling.temperatureMixture(docs, "doc_id", "source", 3.0)
      .select("source", "rate_ppm").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(t2("books") == 1000000L && t3("books") == 1000000L,
      "smallest source keeps rate 1.0 at any temperature")
    assert(t2("web") < 1000000L && t3("web") < t2("web"),
      "hotter temperature flattens LESS (T=3 keeps more skew... or more)")
  }

  test("table stats / text analysis / packing / sketch guards") {
    intercept[IllegalArgumentException] {
      TableStats.qualityReport(docs, Seq.empty, Seq.empty, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.qualityThresholdFilter(docs, "doc_id", "text", "source",
        keepNum = 3, keepDen = 2)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.qualityThresholdFilter(docs, "doc_id", "text", "source",
        keepNum = 0, keepDen = 2)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.knBigramNll(docs, "doc_id", "text", d = 1.0)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.knBigramNll(docs, "doc_id", "text", d = 0.0)
    }
    val lens = Seq(3L, 10L, 50L, 500L).toDF("n_tokens")
    intercept[IllegalArgumentException] {
      Packing.paddingStats(lens, "n_tokens", Seq(64L, 32L)) // not ascending
    }
    intercept[IllegalArgumentException] {
      Packing.paddingStats(lens, "n_tokens", Seq.empty)
    }
    // boundary fold: lengths on BOTH sides of each boundary
    val buckets = Packing.paddingStats(lens, "n_tokens", Seq(8L, 64L, 256L))
      .select("bucket").as[Long].collect().sorted
    assert(buckets.toSeq == Seq(8L, 64L, 256L))
    intercept[IllegalArgumentException] {
      Sketches.hdrQuantiles(Seq((0L, 1L)).toDF("blo", "n"), 4, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Sketches.hdrQuantiles(Seq((0L, 1L)).toDF("blo", "n"), 4, Seq(1001))
    }
  }

  test("kmv intersections: the at-scale withExact=false path drops only the calibration column") {
    val rows = (for (k <- Seq(1L, 2L); v <- 0L until 40L) yield (k, v * 7 + k * 3))
      .toDF("key", "v")
    val withC = Sketches.kmvIntersections(rows, "key", "v", k = 16, withExact = true)
    val withoutC = Sketches.kmvIntersections(rows, "key", "v", k = 16, withExact = false)
    assert(withC.columns.contains("exact_common"))
    assert(!withoutC.columns.contains("exact_common"))
    val a = withC.drop("exact_common").collect().map(_.toSeq).toSet
    val b = withoutC.collect().map(_.toSeq).toSet
    assert(a == b, "sketch estimates must not depend on the calibration join")
  }

  // --- custom vector expressions: non-foldable + null lanes --------------

  test("vector expressions: column-valued (non-foldable) codebooks match literal ones") {
    import graft.functions.vector._
    val emb = Array(1f, 2f, 3f, 4f)
    val cents = Array(0f, 0f, 1f, 1f, 2f, 2f, 3f, 3f) // m=2,k=2,subDim=2 / dim=4,k=2
    val lut = Array(0.5, 1.5, 2.5, 3.5) // m=2, k=2
    val code = Array[Byte](1, 0)
    val df = Seq((emb, cents, lut, code)).toDF("emb", "cents", "lut", "code")
    val colRow = df.select(
      pq_adc_distance(col("lut"), col("code")).as("adc"),
      pq_encode(col("emb"), col("cents"), lit(2)).as("enc"),
      argmin_l2(col("emb"), col("cents")).as("am"),
      sign_project(col("emb"), col("lut")).as("sp"))
      .head()
    val litRow = df.select(
      pq_adc_distance(typedlit(lut), col("code")).as("adc"),
      pq_encode(col("emb"), typedlit(cents), lit(2)).as("enc"),
      argmin_l2(col("emb"), typedlit(cents)).as("am"),
      sign_project(col("emb"), typedlit(lut)).as("sp"))
      .head()
    assert(colRow.getDouble(0) == litRow.getDouble(0))
    assert(colRow.getAs[Array[Byte]](1).toSeq == litRow.getAs[Array[Byte]](1).toSeq)
    assert(colRow.getInt(2) == litRow.getInt(2))
    assert(colRow.getSeq[Double](3) == litRow.getSeq[Double](3))
  }

  test("vector expressions: null literals and empty codes take the null/zero lanes") {
    import graft.functions.vector._
    val df = Seq((Array(1f, 2f), Array[Byte]())).toDF("emb", "code")
    // foldable NULL second arg: the folded-null lane must yield null, not NPE
    val r = df.select(
      pq_adc_distance(lit(null).cast("array<double>"), col("code")).as("a"),
      argmin_l2(col("emb"), lit(null).cast("array<float>")).as("b"),
      sign_project(col("emb"), lit(null).cast("array<double>")).as("c"))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    // empty code: m == 0 short-circuits to distance 0.0
    val z = df.select(pq_adc_distance(typedlit(Array(1.0, 2.0)), col("code")))
      .head().getDouble(0)
    assert(z == 0.0)
  }
}
