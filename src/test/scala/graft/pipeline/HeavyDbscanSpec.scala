package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * DBSCAN at volume: 1M synthetic 2-D points (planted Gaussian-ish blobs
 * + uniform background) through the grid-bucketed [[Clustering
 * .dbscanLabels]] — the 500×-the-gate-SF evidence that the ε-join's
 * grid bucketing and the pointer-jumping core-CC hold their shape when
 * the data term dominates. Wall-clock is printed for BASELINE.md; the
 * asserts are structural invariants (planted blobs recovered as
 * clusters, class counts consistent, label canonicality) — no oracle
 * at this size.
 *
 * Gated behind GRAFT_HEAVY:
 * {{{ GRAFT_HEAVY=1 sbt "testOnly graft.pipeline.HeavyDbscanSpec" }}}
 */
class HeavyDbscanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("1M-point dbscanLabels: blobs recovered, invariants hold, wall-clock recorded") {
    assume(sys.env.contains("GRAFT_HEAVY") || sys.props.contains("GRAFT_HEAVY"),
      "heavy gate: set GRAFT_HEAVY=1 to run")
    val s = spark
    import s.implicits._

    // 16 planted uniform blobs on a 4x4 grid (60k points each over a
    // unit box, ~19 expected neighbors per eps=0.01 disk) + 40k
    // background points over the full [0,8)^2 (~0.2 per disk — noise).
    // Jitter comes from xxhash64 (a multiplicative-lattice jitter
    // aliases onto a ~125-site orbit and piles points up — measured) —
    // deterministic, no executor RNG.
    val n = 1000000L
    def jit(salt: Int): org.apache.spark.sql.Column =
      pmod(xxhash64(col("id"), lit(salt)), lit(1000000L)).cast("double") / 1000000.0
    val pts = spark.range(n).select(
      col("id"),
      when(col("id") < 960000L,
          (col("id") % 4L).cast("double") * 2.0 + 0.5 + jit(1))
        .otherwise(jit(3) * 8.0).as("x"),
      when(col("id") < 960000L,
          ((col("id") / 4L) % 4L).cast("double") * 2.0 + 0.5 + jit(2))
        .otherwise(jit(4) * 8.0).as("y"))

    val t0 = System.nanoTime()
    // each unit blob spans ~100 eps-cells, so the core CC needs more
    // than the 20-round default (propagation + path-halving per round)
    val out = Clustering.dbscanLabels(pts, "id", col("x"), col("y"),
      eps = 0.01, minPts = 8, ccMaxRounds = 64).persist()
    val byCls = out.groupBy(col("cls")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nClusters = out.filter(col("cls") =!= "noise")
      .agg(countDistinct(col("cluster"))).head().getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"1M-point dbscanLabels: $secs%.1f s, classes=$byCls, clusters=$nClusters")
    println(f"[heavy-dbscan] 1M points eps=0.01 minPts=8: $secs%.1f s, " +
      f"core=${byCls.getOrElse("core", 0L)} border=${byCls.getOrElse("border", 0L)} " +
      f"noise=${byCls.getOrElse("noise", 0L)} clusters=$nClusters")

    // every point classified exactly once
    assert(byCls.values.sum === n)
    // the planted blobs are dense at eps: the overwhelming majority of
    // blob points are core, and each blob is recovered (>= 16 clusters;
    // background speckle may add a few tiny extras)
    assert(byCls("core") > 900000L, s"expected dense blobs to be core: $byCls")
    assert(nClusters >= 16L, s"planted 16 blobs, recovered $nClusters clusters")
    // label canonicality: every cluster label is the min member id
    val badLabel = out.filter(col("cls") =!= "noise")
      .groupBy(col("cluster")).agg(min(col("id")).as("min_id"))
      .filter(col("cluster") =!= col("min_id")).count()
    assert(badLabel === 0L, "cluster label must be the component's min id")
    // noise has label -1, nothing else does
    assert(out.filter(col("cls") === "noise").filter(col("cluster") =!= -1L).isEmpty)
    assert(out.filter(col("cls") =!= "noise").filter(col("cluster") === -1L).isEmpty)
    out.unpersist()
  }
}
