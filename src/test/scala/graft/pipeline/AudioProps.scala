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
}
