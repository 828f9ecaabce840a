package graft.pipeline

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Falsifier for the WAV/PCM codec pair: for ARBITRARY PCM-16 signals
  * (full short range, any length, any rate, junk-chunk layouts chosen
  * by docId) the writer's bytes must decode back to the exact integer
  * stats of the original samples. */
object AudioProps extends Properties("graft-audio") {

  private val samplesGen: Gen[List[Int]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-32768, 32767))

  property("wav encode/decode round-trips exact stats for arbitrary PCM-16 signals") =
    forAll(Gen.choose(0L, 1000L), samplesGen, Gen.choose(8000, 48000)) {
      (docId, xs, rate) =>
        val samples = xs.map(_.toShort).toArray
        val stats = Audio.decodeWavStats(docId, Audio.encodeWavPcm16(docId, rate, samples))
        stats.n_frames == samples.length.toLong &&
        stats.sample_rate == rate &&
        stats.n_channels == 1 &&
        stats.sum_abs == samples.map(s => math.abs(s.toLong)).sum &&
        stats.max_abs == samples.map(s => math.abs(s.toLong)).max &&
        stats.sum_sq == samples.map(s => s.toLong * s.toLong).sum
    }

  property("decimation keeps exactly frames 0, k, 2k, …; k=1 equals the full decode") =
    forAll(Gen.choose(0L, 1000L), samplesGen, Gen.choose(1, 7)) {
      (docId, xs, k) =>
        val samples = xs.map(_.toShort).toArray
        val bytes = Audio.encodeWavPcm16(docId, 11025, samples)
        val dec = Audio.decodeWavDecimatedStats(docId, bytes, k)
        val kept = samples.zipWithIndex.collect { case (s, i) if i % k == 0 => s.toLong }
        val full = Audio.decodeWavStats(docId, bytes)
        dec.n_frames_out == kept.length.toLong &&
        dec.sum_abs == kept.map(math.abs).sum &&
        dec.max_abs == kept.map(math.abs).max &&
        dec.sum_sq == kept.map(s => s * s).sum &&
        dec.sample_rate_out == 11025 / k &&
        (k != 1 || (dec.sum_abs == full.sum_abs && dec.sum_sq == full.sum_sq &&
          dec.n_frames_out == full.n_frames))
    }
}
