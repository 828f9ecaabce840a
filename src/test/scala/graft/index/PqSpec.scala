package graft.index

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Distances

/** PQ invariants (reference tests: PqTrainerTest.java, PqEncoderTest.java). */
class PqSpec extends AnyFunSuite {

  private def gaussian(n: Int, dim: Int, seed: Long): IndexedSeq[Array[Float]] = {
    val r = new Random(seed)
    IndexedSeq.fill(n)(Array.fill(dim)(r.nextGaussian().toFloat))
  }

  test("training is deterministic: same input ⇒ identical codebook floats") {
    val vecs = gaussian(200, 8, 7)
    val cb1 = Pq.train(vecs, 8, 4, 16)
    val cb2 = Pq.train(vecs, 8, 4, 16)
    assert(cb1.centroids.sameElements(cb2.centroids))
    assert(cb1.m == 4 && cb1.k == 16 && cb1.subDim == 2)
  }

  test("encode picks the nearest centroid per subspace (hand-built codebook)") {
    // m=2, k=2, subDim=2: subspace 0 centroids {(0,0),(10,10)}, subspace 1 {(5,5),(-5,-5)}
    val cb = Pq.Codebook(2, 2, 2, Array(0f, 0f, 10f, 10f, 5f, 5f, -5f, -5f))
    assert(Pq.encode(cb, Array(1f, 1f, 4f, 4f)).sameElements(Array[Byte](0, 0)))
    assert(Pq.encode(cb, Array(9f, 9f, -4f, -6f)).sameElements(Array[Byte](1, 1)))
  }

  test("ADC distance equals the sum of per-subspace exact distances to assigned centroids") {
    val vecs = gaussian(100, 8, 11)
    val cb = Pq.train(vecs, 8, 4, 8)
    val q = gaussian(1, 8, 99).head
    val lut = Pq.buildLut(cb, q)
    for (v <- vecs.take(10)) {
      val code = Pq.encode(cb, v)
      val adc = Pq.adcDistance(lut, cb.k, code)
      // reconstruct: distance from q to v's assigned centroids
      var expect = 0.0
      for (s <- 0 until cb.m) {
        val c = code(s) & 0xff
        expect += Distances.l2SquaredRange(q, s * cb.subDim, cb.centroids, cb.centroidOffset(s, c), cb.subDim)
      }
      assert(math.abs(adc - expect) < 1e-9)
    }
  }

  test("ADC of a vector equal to a centroid tuple is exact") {
    // codebook where centroids are far apart; encoding a centroid point
    // yields ADC == exact squared L2 to the query
    val cb = Pq.Codebook(1, 2, 2, Array(0f, 0f, 100f, 100f))
    val q = Array(1f, 1f)
    val lut = Pq.buildLut(cb, q)
    val code = Pq.encode(cb, Array(0f, 0f))
    assert(math.abs(Pq.adcDistance(lut, cb.k, code) - 2.0) < 1e-9)
  }

  test("training handles n < k (duplicated sample-init centroids)") {
    val vecs = gaussian(3, 4, 5)
    val cb = Pq.train(vecs, 4, 2, 8)
    assert(cb.centroids.length == 2 * 8 * 2)
    // every vector encodes without error
    vecs.foreach(v => Pq.encode(cb, v))
  }

  test("codes quantize with bounded distortion on clustered data") {
    // two tight clusters → k-means must separate them
    val r = new Random(3)
    val cluster0 = IndexedSeq.fill(50)(Array.fill(4)((r.nextGaussian() * 0.01).toFloat))
    val cluster1 = IndexedSeq.fill(50)(Array.fill(4)((10 + r.nextGaussian() * 0.01).toFloat))
    val cb = Pq.train(cluster0 ++ cluster1, 4, 2, 2)
    val c0codes = cluster0.map(v => Pq.encode(cb, v).toSeq).distinct
    val c1codes = cluster1.map(v => Pq.encode(cb, v).toSeq).distinct
    assert(c0codes.size == 1 && c1codes.size == 1 && c0codes != c1codes)
  }
}
