package graft.pipeline

/**
 * PCA rotation for product quantization — the "OPQ-lite" transform
 * (Ge et al. 2013 motivate learned rotations; the PCA special case
 * already captures the dominant win when variance is anisotropic):
 * rotate vectors into the eigenbasis of their covariance before PQ, so
 * subspace k-means spends its code budget along decorrelated axes
 * instead of splitting correlated energy across subspaces.
 *
 * Everything here is DRIVER-side math over the bounded deterministic
 * training sample (the same ≤64 MB cap as PQ training — covariance in
 * fixed row order, so results are bit-reproducible run to run; a
 * distributed covariance would tree-reduce doubles in nondeterministic
 * order). The eigensolver is classic cyclic Jacobi on the symmetric
 * covariance — deterministic sweep order, no library dependency.
 *
 * Search-time parity note: rotations preserve L2 exactly in the reals,
 * and the ADC scan runs entirely in the rotated space; the exact
 * rerank happens on ORIGINAL embeddings, so at rerank-all configs the
 * result is value-identical to brute force regardless of rotation —
 * which is what lets the gate share the dense-cosine oracle.
 */
object Rotation {

  /** Row-major dim×dim orthonormal rotation (rows = eigenvectors,
    * descending eigenvalue order). */
  final case class RotationModel(dim: Int, matrix: Array[Double]) {
    require(matrix.length == dim * dim, "rotation must be dim x dim")

    /** Rotate one vector — the same accumulate-in-index-order +
      * 6-decimal HALF_UP snap as the SignProject kernel, so a
      * driver-side rotation (query prep) is bit-identical to the
      * executor column path. */
    def rotate(x: Array[Float]): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        var acc = 0.0
        var j = 0
        val off = i * dim
        while (j < dim) {
          acc += matrix(off + j) * x(j).toDouble
          j += 1
        }
        out(i) = java.math.BigDecimal.valueOf(acc)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue().toFloat
        i += 1
      }
      out
    }
  }

  /** Mean-centered covariance of the sample, fixed accumulation order. */
  private[pipeline] def covariance(sample: IndexedSeq[Array[Float]], dim: Int): Array[Double] = {
    val n = sample.length
    require(n >= 2, "covariance needs at least 2 samples")
    val mean = new Array[Double](dim)
    var r = 0
    while (r < n) {
      var j = 0
      while (j < dim) { mean(j) += sample(r)(j); j += 1 }
      r += 1
    }
    var j = 0
    while (j < dim) { mean(j) /= n; j += 1 }
    val cov = new Array[Double](dim * dim)
    r = 0
    while (r < n) {
      val x = sample(r)
      var i = 0
      while (i < dim) {
        val xi = x(i) - mean(i)
        var k = i
        while (k < dim) {
          cov(i * dim + k) += xi * (x(k) - mean(k))
          k += 1
        }
        i += 1
      }
      r += 1
    }
    var i = 0
    while (i < dim) {
      var k = i
      while (k < dim) {
        val v = cov(i * dim + k) / (n - 1)
        cov(i * dim + k) = v
        cov(k * dim + i) = v
        k += 1
      }
      i += 1
    }
    cov
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix.
    * Returns (eigenvalues, eigenvectors as COLUMNS of v). */
  private[pipeline] def jacobiEigen(aIn: Array[Double], dim: Int,
      sweeps: Int = 50, tol: Double = 1e-12): (Array[Double], Array[Double]) = {
    val a = aIn.clone()
    val v = new Array[Double](dim * dim)
    var i = 0
    while (i < dim) { v(i * dim + i) = 1.0; i += 1 }
    var sweep = 0
    var off = offDiagNorm(a, dim)
    while (sweep < sweeps && off > tol) {
      var p = 0
      while (p < dim - 1) {
        var q = p + 1
        while (q < dim) {
          val apq = a(p * dim + q)
          if (math.abs(apq) > tol) {
            val app = a(p * dim + p)
            val aqq = a(q * dim + q)
            val theta = (aqq - app) / (2.0 * apq)
            // explicit theta==0 branch: matching the quotient against
            // 0.0 also caught -0.0 / underflow, where the negative-theta
            // fallback 1/(theta+sqrt(..)) cancels catastrophically
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            // rotate rows/cols p and q of a
            var k = 0
            while (k < dim) {
              val akp = a(k * dim + p)
              val akq = a(k * dim + q)
              a(k * dim + p) = c * akp - s * akq
              a(k * dim + q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < dim) {
              val apk = a(p * dim + k)
              val aqk = a(q * dim + k)
              a(p * dim + k) = c * apk - s * aqk
              a(q * dim + k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < dim) {
              val vkp = v(k * dim + p)
              val vkq = v(k * dim + q)
              v(k * dim + p) = c * vkp - s * vkq
              v(k * dim + q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiagNorm(a, dim)
      sweep += 1
    }
    val eig = Array.tabulate(dim)(d => a(d * dim + d))
    (eig, v)
  }

  private def offDiagNorm(a: Array[Double], dim: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < dim) {
      var j = i + 1
      while (j < dim) { s += a(i * dim + j) * a(i * dim + j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  /** PCA rotation from a training sample: eigenvectors of the sample
    * covariance, descending eigenvalue (index tie-break), each
    * eigenvector sign-canonicalized (first nonzero component positive)
    * so the decomposition is unique. */
  def trainPca(sample: IndexedSeq[Array[Float]], dim: Int): RotationModel = {
    val (eig, v) = jacobiEigen(covariance(sample, dim), dim)
    val order = (0 until dim).sortBy(d => (-eig(d), d))
    val m = new Array[Double](dim * dim)
    var r = 0
    while (r < dim) {
      val col = order(r)
      // find the sign of the first component with |x| > 1e-12
      var sign = 1.0
      var j = 0
      var found = false
      while (j < dim && !found) {
        val x = v(j * dim + col)
        if (math.abs(x) > 1e-12) { sign = math.signum(x); found = true }
        j += 1
      }
      j = 0
      while (j < dim) {
        m(r * dim + j) = sign * v(j * dim + col)
        j += 1
      }
      r += 1
    }
    RotationModel(dim, m)
  }
}
