package graft.core

/**
 * Distance / math kernels (SURVEY.md §2.7; reference: Distances.java:31-153,
 * FloatPacker.java:21-39).
 *
 * Semantics preserved exactly:
 *  - squared-distance-everywhere discipline (sqrt elision; α-pruning
 *    operates on squared values — reference: GraphBuilder.java:14-26)
 *  - cosine of a zero-norm vector is 0.0 (reference: Distances.java:149-153)
 *
 * Accumulation is in double, sequentially in index order, so results are
 * bit-deterministic and match a straightforward SQL oracle. The JIT
 * auto-vectorizes these loops; at 100 TB scale these kernels run inside
 * whole-stage-codegen'd expressions (graft.functions.VectorExpressions) or
 * tight mapPartitions loops — never as interpreted row-by-row UDF calls.
 *
 * SIMD: `-Dgraft.simd=1` routes l2Squared/l2SquaredRange/dot/norm
 * through the Panama kernels ([[graft.simd.SimdKernels]], float-lane FMA
 * accumulation — the reference's Distances.java:48-64 lanes). OPT-IN
 * because float accumulation is recall-equivalent but not bit-identical
 * to this scalar double path, and the correctness oracles hash bits;
 * unavailable modules degrade to scalar via the probe.
 */
object Distances {

  /** True when the operator explicitly opted in (-Dgraft.simd=1) AND the
    * incubator module actually loads in this JVM. Decided once at class
    * load — the branch is a constant to the JIT. */
  val simdEnabled: Boolean =
    sys.props.get("graft.simd").contains("1") && {
      try graft.simd.SimdKernels.l2Squared(Array(0f), Array(0f)) == 0.0
      catch { case _: Throwable => false }
    }

  /** Squared Euclidean distance (reference: Distances.java:48-64). */
  def l2Squared(a: Array[Float], b: Array[Float]): Double = {
    if (simdEnabled) return graft.simd.SimdKernels.l2Squared(a, b)
    var acc = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      val d = a(i).toDouble - b(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  /** Squared Euclidean over a sub-range — avoids copies for PQ subspaces
    * (reference: Distances.java:77-94). Compares a(aOff..aOff+len) with
    * b(bOff..bOff+len). */
  def l2SquaredRange(a: Array[Float], aOff: Int, b: Array[Float], bOff: Int, len: Int): Double = {
    if (simdEnabled) return graft.simd.SimdKernels.l2SquaredRange(a, aOff, b, bOff, len)
    var acc = 0.0
    var i = 0
    while (i < len) {
      val d = a(aOff + i).toDouble - b(bOff + i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  /** Early-abandoning variant of [[l2SquaredRange]] for THRESHOLD / ARGMIN
    * decisions only: identical accumulation order, but once the running
    * sum exceeds `bound` it returns the partial sum immediately. Summands
    * are non-negative, so the completed value can only be ≥ the returned
    * partial — any caller comparison of the form `d < bound` or
    * `d <= bound` is already decided (false), which makes decisions
    * bit-identical to the full kernel while skipping the remaining lanes.
    * An abandoned return is NOT the distance — never store or rank by it.
    * Under `-Dgraft.simd=1` it computes the full SIMD value (no abandon)
    * so the opt-in path keeps exactly its existing semantics. */
  def l2SquaredRangeBounded(
      a: Array[Float], aOff: Int, b: Array[Float], bOff: Int, len: Int,
      bound: Double): Double = {
    if (simdEnabled) return graft.simd.SimdKernels.l2SquaredRange(a, aOff, b, bOff, len)
    var acc = 0.0
    var i = 0
    while (i < len) {
      var lim = i + 16
      if (lim > len) lim = len
      while (i < lim) {
        val d = a(aOff + i).toDouble - b(bOff + i).toDouble
        acc += d * d
        i += 1
      }
      if (acc > bound) return acc
    }
    acc
  }

  /** [[l2Squared]] with the [[l2SquaredRangeBounded]] early-abandon
    * contract (threshold/argmin decisions only). Checks the bound every
    * 128 lanes — full-dim callers (α-prune dominance tests) benefit from
    * abandoning a 768-dim sum halfway, but a tighter check cadence costs
    * more vectorization than it saves (measured). */
  def l2SquaredBounded(a: Array[Float], b: Array[Float], bound: Double): Double = {
    if (simdEnabled) return graft.simd.SimdKernels.l2Squared(a, b)
    val len = a.length
    var acc = 0.0
    var i = 0
    while (i < len) {
      var lim = i + 128
      if (lim > len) lim = len
      while (i < lim) {
        val d = a(i).toDouble - b(i).toDouble
        acc += d * d
        i += 1
      }
      if (acc > bound) return acc
    }
    acc
  }

  /** Euclidean distance (reference: Distances.java:31-33). */
  def l2(a: Array[Float], b: Array[Float]): Double = math.sqrt(l2Squared(a, b))

  /** Dot product (reference: Distances.java:103-118). */
  def dot(a: Array[Float], b: Array[Float]): Double = {
    if (simdEnabled) return graft.simd.SimdKernels.dot(a, b)
    var acc = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      acc += a(i).toDouble * b(i).toDouble
      i += 1
    }
    acc
  }

  /** L2 norm (reference: Distances.java:126-140). */
  def norm(a: Array[Float]): Double = {
    if (simdEnabled) return graft.simd.SimdKernels.norm(a)
    var acc = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      acc += a(i).toDouble * a(i).toDouble
      i += 1
    }
    math.sqrt(acc)
  }

  /** Cosine similarity; 0.0 if either norm is 0 (reference: Distances.java:149-153). */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val na = norm(a)
    val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0
    else dot(a, b) / (na * nb)
  }

  /** score/distance conventions (reference: FdbVectorIndex.java:686-693). */
  def scoreAndDistance(metric: Metric, a: Array[Float], b: Array[Float]): (Double, Double) =
    metric match {
      case Metric.L2 =>
        val d = l2(a, b)
        (-d, d)
      case Metric.Cosine =>
        val s = cosine(a, b)
        (s, 1.0 - s)
    }
}

/** float32 ↔ little-endian byte packing for byte-compatible import/export
  * (reference: FloatPacker.java:21-39). Parquet arrays make this unnecessary
  * internally; kept for interop. */
object FloatPacker {
  def pack(v: Array[Float]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(v.length * 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asFloatBuffer().put(v)
    bb.array()
  }
  def unpack(b: Array[Byte]): Array[Float] = {
    require(b.length % 4 == 0, "byte length must be a multiple of 4")
    val fb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
    val out = new Array[Float](b.length / 4)
    fb.get(out)
    out
  }
}
