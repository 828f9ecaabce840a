package graft.index

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Graph-construction invariants (reference tests: GraphBuilderTest.java:18-60,
  * GraphBuilderPruningTest.java:12-85). */
class GraphBuilderSpec extends AnyFunSuite {

  test("exact kNN graph on a 3-point line") {
    val vecs = Array(Array(0f), Array(1f), Array(3f))
    val g = GraphBuilder.buildL2Neighbors(vecs, 2)
    assert(g(0).toSeq == Seq(1, 2)) // 0 is closer to 1 than 2
    assert(g(1).toSeq == Seq(0, 2))
    assert(g(2).toSeq == Seq(1, 0))
  }

  test("degree caps and self-exclusion") {
    val vecs = Array.tabulate(10)(i => Array(i.toFloat))
    val g = GraphBuilder.buildL2Neighbors(vecs, 3)
    g.zipWithIndex.foreach { case (nbs, i) =>
      assert(nbs.length == 3)
      assert(!nbs.contains(i))
      assert(nbs.distinct.length == nbs.length)
    }
  }

  test("empty and single-vector edge cases") {
    assert(GraphBuilder.buildVamanaGraph(Array.empty, 4, 8, 1.2).isEmpty)
    assert(GraphBuilder.buildVamanaGraph(Array(Array(1f)), 4, 8, 1.2).head.isEmpty)
    assert(GraphBuilder.buildL2Neighbors(Array(Array(1f)), 4).head.isEmpty)
  }

  test("alpha-prune drops dominated collinear edges") {
    // points on a line: 0 -- 1 -- 2; with alpha>1, node 0 keeps 1 and
    // prunes 2 (since d²(2,1) ≤ α·d²(2,0))
    val vecs = Array(Array(0f), Array(1f), Array(2f))
    val g = GraphBuilder.buildPrunedNeighbors(vecs, 2, 2, 1.2)
    assert(g(0).toSeq == Seq(1))
    // alpha ≤ 1 disables pruning → both kept
    val g2 = GraphBuilder.buildPrunedNeighbors(vecs, 2, 2, 1.0)
    assert(g2(0).toSeq == Seq(1, 2))
  }

  test("medoid of a centered cloud is the center point") {
    val vecs = Array(Array(0f, 0f), Array(10f, 0f), Array(-10f, 0f), Array(0f, 10f), Array(0f, -10f))
    assert(GraphBuilder.findMedoid(vecs) == 0)
  }

  test("Vamana: 8-point 2D graph fully connected from medoid (reference gate)") {
    // reference: GraphBuilderPruningTest.java:54-82 — hand-placed points
    val vecs = Array(
      Array(0f, 0f), Array(1f, 0f), Array(0f, 1f), Array(1f, 1f),
      Array(2f, 0f), Array(2f, 1f), Array(0.5f, 0.5f), Array(1.5f, 0.5f))
    val g = GraphBuilder.buildVamanaGraph(vecs, 4, 8, 1.2)
    assert(reachableFrom(g, GraphBuilder.findMedoid(vecs)) == vecs.length)
  }

  test("Vamana on Gaussian data: degree-capped, ≥99% reachable from medoid") {
    val r = new Random(42)
    val n = 200
    val vecs = Array.fill(n)(Array.fill(8)(r.nextGaussian().toFloat))
    val degree = 16
    val g = GraphBuilder.buildVamanaGraph(vecs, degree, 64, 1.2)
    assert(g.length == n)
    g.foreach(nbs => assert(nbs.length <= degree))
    // full connectivity is NOT a Vamana guarantee on random data; near-full
    // reachability is (stragglers are recovered at query time by ADC seeds)
    val reached = reachableFrom(g, GraphBuilder.findMedoid(vecs))
    assert(reached >= n * 0.99, s"only $reached/$n nodes reachable from medoid")
  }

  private def reachableFrom(g: Array[Array[Int]], start: Int): Int = {
    val seen = scala.collection.mutable.HashSet(start)
    var frontier = List(start)
    while (frontier.nonEmpty) {
      frontier = frontier.flatMap(u => g(u).filter(seen.add))
    }
    seen.size
  }

  test("Vamana reverse edges: early-inserted nodes gain neighbors") {
    val r = new Random(1)
    val vecs = Array.fill(50)(Array.fill(4)(r.nextGaussian().toFloat))
    val g = GraphBuilder.buildVamanaGraph(vecs, 8, 32, 1.2)
    // medoid (inserted first with no candidates) must still have edges
    val medoid = GraphBuilder.findMedoid(vecs)
    assert(g(medoid).nonEmpty)
  }
}
