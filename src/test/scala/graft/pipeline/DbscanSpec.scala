package graft.pipeline

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Closed-form checks for [[Clustering.dbscanClassify]] — the
  * grid-bucketed ε-neighborhood classifier (core / border / noise). */
class DbscanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def classify(pts: Seq[(Long, Double, Double)],
                       eps: Double, minPts: Int): Map[Long, (Long, String)] = {
    val s = spark
    import s.implicits._
    Clustering.dbscanClassify(pts.toDF("id", "x", "y"), "id",
        col("x"), col("y"), eps, minPts)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
  }

  test("hand-computed line: dense core, reachable border, far noise") {
    // eps=1.0, minPts=3. Points 1..4 at x=0,0.5,1.0,1.5 (unit chain);
    // point 5 at x=3.2 is within eps of NOTHING.
    // n_eps (incl. self): p1 {1,2,3}=3 core; p2 {1,2,3,4}=4 core;
    // p3 {1,2,3,4}=4 core; p4 {2,3,4}=3 core; p5 {5}=1 noise.
    val out = classify(Seq(
      (1L, 0.0, 0.0), (2L, 0.5, 0.0), (3L, 1.0, 0.0), (4L, 1.5, 0.0),
      (5L, 3.2, 0.0)), eps = 1.0, minPts = 3)
    assert(out === Map(
      1L -> ((3L, "core")), 2L -> ((4L, "core")), 3L -> ((4L, "core")),
      4L -> ((3L, "core")), 5L -> ((1L, "noise"))))
  }

  test("border vs noise: both non-core, only the core-adjacent one is border") {
    // eps=1, minPts=4. Half-unit square {1,2,3,4} (max pairwise √0.5):
    // p2 sees {1,2,3,4,5} = 5, the others see the square = 4 → all core
    // (p4–p5 = √(0.81+0.25) ≈ 1.03 > ε). p5 at (1.4,0): neighbors
    // {2,5,6} = 3 → non-core, adjacent to core p2 → border. p6 at
    // (2.3,0): neighbors {5,6} = 2 → non-core, adjacent only to
    // non-core p5 → noise (NOT density-reachable).
    val out = classify(Seq(
      (1L, 0.0, 0.0), (2L, 0.5, 0.0), (3L, 0.0, 0.5), (4L, 0.5, 0.5),
      (5L, 1.4, 0.0), (6L, 2.3, 0.0)), eps = 1.0, minPts = 4)
    assert(out(5L) === ((3L, "border")))
    assert(out(6L) === ((2L, "noise")))
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_)._2 == "core"))
  }

  test("grid halo finds neighbors across cell boundaries (negative coords too)") {
    // eps=1: p1 and p2 straddle a cell boundary at distance exactly eps;
    // p3 sits in the negative-coordinate quadrant one cell away.
    val out = classify(Seq(
      (1L, -0.5, 0.0), (2L, 0.5, 0.0), (3L, -0.5, -1.0)), eps = 1.0, minPts = 2)
    // dist(1,2)=1.0 <= eps (boundary INCLUSIVE), dist(1,3)=1.0
    assert(out(1L) === ((3L, "core")))
    assert(out(2L)._1 === 2L)
    assert(out(3L)._1 === 2L)
  }

  test("each neighbor is counted exactly once despite the 9-cell probe") {
    // coincident points share a cell; the halo must not multiply-count
    val out = classify(Seq(
      (1L, 0.0, 0.0), (2L, 0.0, 0.0), (3L, 0.0, 0.0)), eps = 0.5, minPts = 3)
    assert(out.values.forall(_ == ((3L, "core"))))
  }

  test("minPts=1 makes every point (even isolated) core") {
    val out = classify(Seq((1L, 0.0, 0.0), (2L, 9.0, 9.0)), eps = 0.1, minPts = 1)
    assert(out.values.forall(_ == ((1L, "core"))))
  }

  private def labels(pts: Seq[(Long, Double, Double)],
                     eps: Double, minPts: Int): Map[Long, (String, Long)] = {
    val s = spark
    import s.implicits._
    Clustering.dbscanLabels(pts.toDF("id", "x", "y"), "id",
        col("x"), col("y"), eps, minPts)
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3)))).toMap
  }

  test("labels: two separate clusters, border attaches to MIN adjacent cluster, noise -1") {
    // eps=1, minPts=3. Cluster A = chain {1,2,3} (0, 0.5, 1.0) all core;
    // cluster B = chain {10,11,12} at x=5.. all core. p20 at (1.7, 0):
    // neighbors {3,20} → non-core, adjacent to core 3 → border of
    // cluster min(A)=1. p30 isolated → noise, cluster -1.
    val out = labels(Seq(
      (1L, 0.0, 0.0), (2L, 0.5, 0.0), (3L, 1.0, 0.0),
      (10L, 5.0, 0.0), (11L, 5.5, 0.0), (12L, 6.0, 0.0),
      (20L, 1.7, 0.0), (30L, 9.0, 9.0)), eps = 1.0, minPts = 3)
    assert(Seq(1L, 2L, 3L).forall(out(_) == (("core", 1L))))
    assert(Seq(10L, 11L, 12L).forall(out(_) == (("core", 10L))))
    assert(out(20L) === (("border", 1L)))
    assert(out(30L) === (("noise", -1L)))
  }

  test("labels: a border between two clusters takes the smaller cluster label") {
    // eps=1, minPts=4, exact-binary quarter coordinates. Cluster A =
    // {1,2,3,4} at 0.25..1.0 (span 0.75, each n_eps=4 → core); cluster
    // B = {7,8,9,10} at 3.0..3.75. p5 at 2.0: neighbors {4,5,7} = 3 <
    // 4 → border, adjacent to core 4 (cluster 1) AND core 7 (cluster
    // 7) at distance exactly 1.0 each → takes min(1, 7) = 1. The two
    // clusters stay separate (1.0 to 3.0 = 2.0 > ε; p5 is no bridge —
    // only CORE adjacency merges clusters).
    val out = labels(Seq(
      (1L, 0.25, 0.0), (2L, 0.5, 0.0), (3L, 0.75, 0.0), (4L, 1.0, 0.0),
      (7L, 3.0, 0.0), (8L, 3.25, 0.0), (9L, 3.5, 0.0), (10L, 3.75, 0.0),
      (5L, 2.0, 0.0)), eps = 1.0, minPts = 4)
    assert(out(5L) === (("border", 1L)))
    assert(out(7L) === (("core", 7L)) && out(1L) === (("core", 1L)))
    assert(out(10L) === (("core", 7L)))
  }

  test("labels: an isolated core is its own singleton cluster") {
    // 5 coincident points are core (n_eps=5 >= 5) with no OTHER core
    // within eps — wait, they are each other's core neighbors; use one
    // point with minPts=1: core with zero core EDGES (self-pairs are
    // excluded) → singleton cluster labeled by its own id.
    val out = labels(Seq((42L, 0.0, 0.0), (50L, 9.0, 0.0)), eps = 1.0, minPts = 1)
    assert(out(42L) === (("core", 42L)) && out(50L) === (("core", 50L)))
  }

  test("plan: the eps-join is a cell-key hash join, never all-pairs") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 0.0, 0.0), (2L, 0.5, 0.0)).toDF("id", "x", "y")
    val p = Clustering.epsNeighborPairs(df, "id", col("x"), col("y"), 1.0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"dbscan eps-join went all-pairs:\n$p")
    assert(p.contains("HashJoin"), s"cell keys must drive a hash join:\n$p")
  }

  test("guards: non-positive eps / minPts < 1 throw") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 0.0, 0.0)).toDF("id", "x", "y")
    intercept[IllegalArgumentException] {
      Clustering.dbscanClassify(df, "id", col("x"), col("y"), 0.0, 3)
    }
    intercept[IllegalArgumentException] {
      Clustering.dbscanClassify(df, "id", col("x"), col("y"), 1.0, 0)
    }
  }
}
