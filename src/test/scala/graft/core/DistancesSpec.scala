package graft.core

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Kernel invariants mirrored from the reference's DistancesTest.java:55-90
  * (SIMD vs scalar parity becomes kernel vs naive-definition parity). */
class DistancesSpec extends AnyFunSuite {

  private val rnd = new Random(42)
  private def randVec(n: Int): Array[Float] =
    Array.fill(n)(rnd.nextFloat() * 20f - 10f)
  private val dims = Seq(1, 2, 3, 8, 64, 128, 768)

  test("l2Squared matches naive definition across dims") {
    for (d <- dims; _ <- 1 to 5) {
      val a = randVec(d); val b = randVec(d)
      val naive = a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
      assert(math.abs(Distances.l2Squared(a, b) - naive) < 1e-9)
      assert(math.abs(Distances.l2(a, b) - math.sqrt(naive)) < 1e-9)
    }
  }

  test("dot matches naive definition; norm² == dot(a,a)") {
    for (d <- dims; _ <- 1 to 5) {
      val a = randVec(d); val b = randVec(d)
      val naive = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      assert(math.abs(Distances.dot(a, b) - naive) < 1e-9)
      assert(math.abs(Distances.norm(a) - math.sqrt(Distances.dot(a, a))) < 1e-9)
    }
  }

  test("cosine is within [-1,1]; zero-norm yields exactly 0.0") {
    for (d <- dims; _ <- 1 to 5) {
      val c = Distances.cosine(randVec(d), randVec(d))
      assert(c >= -1.0000001 && c <= 1.0000001)
    }
    val z = Array(0f, 0f, 0f)
    assert(Distances.cosine(z, Array(1f, 2f, 3f)) == 0.0)
    assert(Distances.cosine(Array(1f, 2f, 3f), z) == 0.0)
  }

  test("l2SquaredRange equals l2Squared on the sliced sub-range") {
    val a = randVec(16); val b = randVec(16)
    for (off <- 0 until 12; len <- 1 until (16 - off)) {
      val expect = Distances.l2Squared(a.slice(off, off + len), b.slice(off, off + len))
      assert(math.abs(Distances.l2SquaredRange(a, off, b, off, len) - expect) < 1e-12)
    }
  }

  test("float packer round-trips little-endian bytes") {
    for (d <- dims) {
      val a = randVec(d)
      assert(FloatPacker.unpack(FloatPacker.pack(a)).sameElements(a))
    }
    // spot-check endianness: 1.0f is 0x3F800000 → LE bytes 00 00 80 3F
    assert(FloatPacker.pack(Array(1.0f)).sameElements(Array[Byte](0, 0, -128, 63)))
  }

  test("score/distance conventions per metric") {
    val a = Array(1f, 0f)
    val b = Array(0f, 1f)
    val (sL2, dL2) = Distances.scoreAndDistance(Metric.L2, a, b)
    assert(sL2 == -dL2 && math.abs(dL2 - math.sqrt(2)) < 1e-12)
    val (sCos, dCos) = Distances.scoreAndDistance(Metric.Cosine, a, b)
    assert(math.abs(sCos - 0.0) < 1e-12 && math.abs(dCos - 1.0) < 1e-12)
  }
}
