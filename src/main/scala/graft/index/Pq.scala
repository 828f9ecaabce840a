package graft.index

import scala.util.Random

import graft.core.Distances

/**
 * Product Quantization: codebook training, encoding, and the query-time
 * ADC lookup table (SURVEY.md §2.4 A1/A2, §2.3 J2).
 *
 * Semantics preserved from the reference:
 *  - per-subspace Lloyd's k-means with sample initialization from a single
 *    `Random(seed)` consumed across subspaces in order, fixed iteration
 *    count, and empty clusters re-seeded from a random point
 *    (reference: pq/PqTrainer.java:28-91; invoked with iterations=5,
 *    seed=42 at tasks/SegmentBuildService.java:180)
 *  - encoding picks the nearest centroid per subspace by squared L2
 *    (reference: pq/PqEncoder.java:18-38)
 *  - the LUT holds squared sub-distances of the query to every centroid;
 *    the approximate distance of a code is the sum of its M lookups
 *    (reference: fdb/FdbVectorIndex.java:1057-1079)
 *
 * PQ always trains/encodes with L2 on raw vectors even for COSINE indexes
 * (the reference has no metric switch here — SURVEY.md §7.4 item 5).
 *
 * These are in-memory per-segment kernels: a segment (≤ maxSegmentSize
 * vectors) is one Spark task's worth of work; scale comes from running
 * thousands of segments in parallel, not from distributing one k-means.
 */
object Pq {

  final val DefaultIterations = 5
  final val DefaultSeed = 42L

  /** Codebook as a flat array (Spark/Parquet-friendly):
    * centroid(s, c) starts at (s*k + c) * subDim. */
  final case class Codebook(m: Int, k: Int, subDim: Int, centroids: Array[Float]) {
    require(centroids.length == m * k * subDim, "flat centroid array has wrong length")
    def centroidOffset(s: Int, c: Int): Int = (s * k + c) * subDim
  }

  /** Train codebooks for each of M subspaces over the segment's vectors. */
  def train(
      vectors: IndexedSeq[Array[Float]],
      dimension: Int,
      m: Int,
      k: Int,
      iterations: Int = DefaultIterations,
      seed: Long = DefaultSeed): Codebook = {
    require(m > 0 && k > 0 && dimension > 0, "invalid PQ params")
    require(dimension % m == 0, "dimension must be divisible by m")
    val subDim = dimension / m
    val flat = new Array[Float](m * k * subDim)
    val rnd = new Random(seed)
    val n = vectors.length

    for (s <- 0 until m) {
      val off = s * subDim
      // working centroids for this subspace
      var cents = Array.ofDim[Float](k, subDim)
      for (c <- 0 until k) {
        val idx = if (n == 0) 0 else rnd.nextInt(n)
        if (n > 0) System.arraycopy(vectors(idx), off, cents(c), 0, subDim)
      }
      if (n > 0) {
        val assign = new Array[Int](n)
        var it = 0
        while (it < iterations) {
          // assignment
          var i = 0
          while (i < n) {
            val v = vectors(i)
            var best = 0
            var bestD = Double.PositiveInfinity
            var c = 0
            while (c < k) {
              // NOT the bounded kernel: measured 1.6 s -> 2.8 s here
              // (randomly-seeded centroids abandon too late to beat the
              // vectorized straight-line loop; encode's trained-codebook
              // scan is the profitable case)
              val d = Distances.l2SquaredRange(v, off, cents(c), 0, subDim)
              if (d < bestD) { bestD = d; best = c }
              c += 1
            }
            assign(i) = best
            i += 1
          }
          // update
          val sums = Array.ofDim[Float](k, subDim)
          val counts = new Array[Int](k)
          i = 0
          while (i < n) {
            val a = assign(i)
            val v = vectors(i)
            var d = 0
            while (d < subDim) { sums(a)(d) += v(off + d); d += 1 }
            counts(a) += 1
            i += 1
          }
          var c = 0
          while (c < k) {
            if (counts(c) == 0) {
              // re-seed an empty cluster from a random point
              val idx = rnd.nextInt(n)
              System.arraycopy(vectors(idx), off, sums(c), 0, subDim)
            } else {
              var d = 0
              while (d < subDim) { sums(c)(d) /= counts(c); d += 1 }
            }
            c += 1
          }
          cents = sums
          it += 1
        }
      }
      for (c <- 0 until k)
        System.arraycopy(cents(c), 0, flat, (s * k + c) * subDim, subDim)
    }
    Codebook(m, k, subDim, flat)
  }

  /** Encode one vector: nearest centroid per subspace by squared L2. */
  def encode(cb: Codebook, vector: Array[Float]): Array[Byte] = {
    val codes = new Array[Byte](cb.m)
    var s = 0
    while (s < cb.m) {
      val off = s * cb.subDim
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cb.k) {
        // early-abandon argmin (see Pq.train): decisions bit-identical
        val d = Distances.l2SquaredRangeBounded(
          vector, off, cb.centroids, cb.centroidOffset(s, c), cb.subDim, bestD)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = (best & 0xff).toByte
      s += 1
    }
    codes
  }

  /** Build the query LUT: squared sub-distance of q's s-th subvector to
    * every centroid, flattened [m*k] (row-major by subspace). */
  def buildLut(cb: Codebook, q: Array[Float]): Array[Double] = {
    val lut = new Array[Double](cb.m * cb.k)
    var s = 0
    while (s < cb.m) {
      val off = s * cb.subDim
      var c = 0
      while (c < cb.k) {
        lut(s * cb.k + c) =
          Distances.l2SquaredRange(q, off, cb.centroids, cb.centroidOffset(s, c), cb.subDim)
        c += 1
      }
      s += 1
    }
    lut
  }

  /** Approximate squared-L2 distance of a code: Σ_s lut[s*k + code[s]].
    * Codes with out-of-range centroid ids skip that subspace (tolerance
    * mirrored from the reference's `ci >= kCent → continue`). */
  def adcDistance(lut: Array[Double], k: Int, codes: Array[Byte]): Double = {
    var acc = 0.0
    var s = 0
    val m = codes.length
    while (s < m) {
      val ci = codes(s) & 0xff
      if (ci < k) acc += lut(s * k + ci)
      s += 1
    }
    acc
  }
}
