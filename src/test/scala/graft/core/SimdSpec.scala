package graft.core

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Panama SIMD kernel parity: float-lane accumulation is allowed to
  * differ from the scalar double path only by float rounding — and the
  * DEFAULT dispatch must stay scalar (the oracles hash bits). */
class SimdSpec extends AnyFunSuite {

  private def simdAvailable: Boolean =
    try graft.simd.SimdKernels.l2Squared(Array(0f), Array(0f)) == 0.0
    catch { case _: Throwable => false }

  test("SIMD kernels agree with scalar within float-accumulation tolerance") {
    assume(simdAvailable, "jdk.incubator.vector not loaded in this JVM")
    val r = new Random(7)
    for (len <- Seq(1, 7, 8, 63, 64, 768)) {
      val a = Array.fill(len)(r.nextGaussian().toFloat)
      val b = Array.fill(len)(r.nextGaussian().toFloat)
      def close(x: Double, y: Double, what: String): Unit =
        assert(math.abs(x - y) <= 1e-4 * (math.abs(y) + 1.0), s"$what len=$len: simd=$x scalar=$y")
      close(graft.simd.SimdKernels.l2Squared(a, b), Distances.l2Squared(a, b), "l2Squared")
      close(graft.simd.SimdKernels.dot(a, b), Distances.dot(a, b), "dot")
      close(graft.simd.SimdKernels.norm(a), Distances.norm(a), "norm")
      if (len > 4) {
        val off = 2
        close(
          graft.simd.SimdKernels.l2SquaredRange(a, off, b, off, len - off - 1),
          Distances.l2SquaredRange(a, off, b, off, len - off - 1), "l2SquaredRange")
      }
    }
  }

  test("default dispatch is scalar: the opt-in flag is unset in every gate run") {
    assert(!Distances.simdEnabled,
      "graft.simd leaked into the default environment — oracle bit-parity at risk")
    // scalar double accumulation, index order — the documented contract
    val a = Array(0.1f, 0.2f, 0.3f)
    val b = Array(0.3f, 0.1f, 0.0f)
    val expected = (0.1f.toDouble - 0.3f.toDouble) * (0.1f.toDouble - 0.3f.toDouble) +
      (0.2f.toDouble - 0.1f.toDouble) * (0.2f.toDouble - 0.1f.toDouble) +
      0.3f.toDouble * 0.3f.toDouble
    assert(Distances.l2Squared(a, b) == expected)
  }
}
