package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form checks for [[Audio.decodeWavAutocorr]] — windowed integer
  * autocorrelation (the pitch-detection primitive). */
class AutocorrSpec extends AnyFunSuite {

  private def wav(docId: Long, samples: Array[Short]): Array[Byte] =
    Audio.encodeWavPcm16(docId, 8000, samples)

  test("hand-computed window: win=4, lags 1 and 2") {
    // s = [2, -1, 3, 4]: energy = 4+1+9+16 = 30
    // r1 = 2·(-1) + (-1)·3 + 3·4 = 7;  r2 = 2·3 + (-1)·4 = 2
    val out = Audio.decodeWavAutocorr(1L, wav(1L, Array[Short](2, -1, 3, 4)),
      win = 4, lags = Seq(1, 2))
    assert(out === Seq(Audio.WavAutocorr(1L, 0L, 30L, Seq(7L, 2L), 1)))
  }

  test("argmax tie-break picks the smallest lag") {
    // constant signal: every lag's r differs only by term count —
    // r1 = 3 terms, r2 = 2 terms, so no tie; use zeros for a true tie
    val out = Audio.decodeWavAutocorr(1L, wav(1L, Array[Short](0, 0, 0, 0)),
      win = 4, lags = Seq(2, 1)) // declaration order must not matter
    assert(out.head.corrs === Seq(0L, 0L) && out.head.best_lag === 1)
  }

  test("trailing partial window is dropped; multiple full windows emit in order") {
    val s = Array.tabulate[Short](10)(i => (i + 1).toShort) // two win=4 + tail 2
    val out = Audio.decodeWavAutocorr(7L, wav(7L, s), win = 4, lags = Seq(1))
    assert(out.map(_.win_idx) === Seq(0L, 1L))
    // window 1 = [5,6,7,8]: energy 25+36+49+64 = 174, r1 = 30+42+56 = 128
    assert(out(1).energy === 174L && out(1).corrs === Seq(128L))
  }

  test("pitch corpus: best_lag recovers the planted period in EVERY window") {
    (0L until 24L).foreach { d => // covers all (period, amp, phase) combos
      val blob = Audio.synthPitchBlob(d)
      val p = 2 << (d % 3).toInt
      val out = Audio.decodeWavAutocorr(d, blob.data, win = 64, lags = Seq(1, 2, 4, 8))
      assert(out.nonEmpty && out.forall(_.best_lag === p),
        s"doc $d: planted period $p, got ${out.map(_.best_lag).distinct}")
    }
  }

  test("junk LIST chunks are walked, not mistaken for data (doc_id % 3 == 0)") {
    val a = Audio.decodeWavAutocorr(0L, Audio.synthPitchBlob(0L).data, 64, Seq(1))
    val b = Audio.decodeWavAutocorr(1L, Audio.synthPitchBlob(1L).data, 64, Seq(1))
    assert(a.nonEmpty && b.nonEmpty) // both parse despite layout difference
  }

  test("guards: window < 2, empty lags, lag out of [1, win) throw") {
    val bytes = wav(1L, Array[Short](1, 2, 3, 4))
    intercept[IllegalArgumentException] {
      Audio.decodeWavAutocorr(1L, bytes, win = 1, lags = Seq(1))
    }
    intercept[IllegalArgumentException] {
      Audio.decodeWavAutocorr(1L, bytes, win = 4, lags = Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Audio.decodeWavAutocorr(1L, bytes, win = 4, lags = Seq(0))
    }
    intercept[IllegalArgumentException] {
      Audio.decodeWavAutocorr(1L, bytes, win = 4, lags = Seq(4))
    }
  }
}
