package graft.index

import scala.util.Random

/** Deterministic low-intrinsic-dimension corpus for the production-shape
  * quality and bench gates. Pure object-level functions: anything
  * referenced inside Dataset closures must not drag a suite instance (or
  * SparkSession) along.
  *
  * Geometry matters here. Iid gaussians at dim 768 have no distance
  * contrast (nearest ≈ median), so recall over them measures quantization
  * noise; well-separated clusters are the opposite failure — ef covers
  * every cluster member and recall pins at 1.0, never exercising the
  * approximate regime. Real embeddings live on a low-dimensional
  * manifold, so: 32-dim latent gaussians mapped through one fixed random
  * 768-wide projection, plus small full-rank ambient noise. The 10-NN
  * ranking then has real contrast (32-dim geometry) while PQ compresses
  * genuinely lossily — the regime production users run in.
  *
  * Lives in main (not test) scope because the per-round bench registry
  * prices a production-shape seal+query on this corpus
  * ([[graft.HeavyBench]]); the GRAFT_HEAVY specs share it. */
object ManifoldData {
  val Dim = 768
  val Latent = 32
  val Ambient = 0.05f

  private def gaussianArray(seed: Long, n: Int): Array[Float] = {
    val r = new Random(seed)
    Array.fill(n)(r.nextGaussian().toFloat)
  }

  /** Fixed latent→ambient projection, rows scaled ~unit so latent and
    * ambient scales are comparable. */
  private lazy val proj: Array[Array[Float]] = {
    val s = (1.0 / math.sqrt(Latent)).toFloat
    Array.tabulate(Latent)(j => gaussianArray(2000L + j, Dim).map(_ * s))
  }

  private def embed(latentSeed: Long, ambientSeed: Long): Array[Float] = {
    val z = gaussianArray(latentSeed, Latent)
    val out = gaussianArray(ambientSeed, Dim)
    var i = 0
    while (i < Dim) { out(i) *= Ambient; i += 1 }
    var j = 0
    while (j < Latent) {
      val zj = z(j); val row = proj(j)
      i = 0
      while (i < Dim) { out(i) += zj * row(i); i += 1 }
      j += 1
    }
    out
  }

  def vectorFor(id: Long): Array[Float] =
    embed(0x9E3779B97F4A7C15L ^ id, 0x5851F42D4C957F2DL ^ id)

  /** Held-out query from the same distribution (disjoint seed space). */
  def queryFor(q: Long): Array[Float] =
    embed(0x7F4A7C159E3779B9L ^ (q + 1000000L), 0x4C957F2D5851F42DL ^ (q + 2000000L))

  private def normalized(v: Array[Float]): Array[Float] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val inv = if (s == 0.0) 0.0 else 1.0 / math.sqrt(s)
    v.map(x => (x * inv).toFloat)
  }

  /** Unit-norm variants for the COSINE gate — pre-normalizing is the
    * standard cosine-ANN practice (the build side is L2 in the reference
    * regardless of metric; on the unit sphere L2 and cosine order
    * identically, so candidate generation aligns with the metric). */
  def unitVectorFor(id: Long): Array[Float] = normalized(vectorFor(id))
  def unitQueryFor(q: Long): Array[Float] = normalized(queryFor(q))
}
