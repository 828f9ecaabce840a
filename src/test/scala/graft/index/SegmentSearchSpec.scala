package graft.index

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{SearchMode, SearchParams, SeedStrategy}

/** Kernel-level invariants of the sealed-segment search (J2/J3/J4/J6) and
  * the auto-tune/seed formulas (reference: FdbVectorIndex.java:772-812). */
class SegmentSearchSpec extends AnyFunSuite {

  private def buildSegment(n: Int, dim: Int, seed: Long) = {
    val r = new Random(seed)
    val vecs = Array.fill(n)(Array.fill(dim)(r.nextGaussian().toFloat))
    val cb = Pq.train(vecs.toIndexedSeq, dim, m = 4, k = 16)
    val codes = vecs.map(Pq.encode(cb, _))
    val graph = GraphBuilder.buildVamanaGraph(vecs, 16, 64, 1.2)
    val codeMap = codes.zipWithIndex.map { case (c, i) => i -> c }.toMap
    val adj = graph.zipWithIndex.map { case (g, i) => i -> g }.toMap
    (vecs, cb, codeMap, adj)
  }

  test("auto-tune formulas match the reference exactly") {
    val p = SearchParams.defaults(10, 2) // ef=100, beam=20, iters=6, maxExplore=4096
    assert(p.efSearch == 100 && p.beamWidth == 20 && p.maxIters == 6 && p.maxExplore == 4096)
    // nCodes=4000: scale = round(sqrt(4)) = 2 → ef = min(4096, max(100, min(4000, 200))) = 200
    val t1 = SegmentSearch.autoTune(p, nCodes = 4000, k = 20)
    assert(t1.efSearch == 200)
    // beam = max(1, min(4000, max(20, min(64, ceil(sqrt(4000))=64)))) = 64
    assert(t1.beamWidth == 64)
    // tiny segment: nCodes=9 → ef stays base (min(9, ...) < base → max picks base)
    val t2 = SegmentSearch.autoTune(p, nCodes = 9, k = 20)
    assert(t2.efSearch == 100)
    assert(t2.beamWidth == math.max(1, math.min(9, math.max(20, 3))))
  }

  test("BEST_FIRST and BEAM modes both achieve recall on a sealed segment") {
    val (vecs, cb, codeMap, adj) = buildSegment(500, 8, 42)
    val q = vecs(7)
    val defaults = SearchParams.defaults(10, 2)
    for (mode <- Seq(SearchMode.BestFirst, SearchMode.Beam)) {
      val cands = SegmentSearch.searchSealed(0, cb, q, codeMap, adj, k = 20,
        defaults.copy(mode = mode))
      assert(cands.nonEmpty, s"$mode returned nothing")
      // the query point itself must be among the approx candidates
      assert(cands.exists(_.vecId == 7), s"$mode missed the self-point")
    }
  }

  test("RANDOM_PIVOTS seeding is deterministic (seed = (segId<<21) ^ bits(lut[0]))") {
    val (_, cb, codeMap, adj) = buildSegment(300, 8, 7)
    val q = Array.fill(8)(0.5f)
    val params = SearchParams.defaults(10, 2)
      .copy(seedStrategy = SeedStrategy.RandomPivots, pivots = 5)
    val a = SegmentSearch.searchSealed(3, cb, q, codeMap, adj, 20, params)
    val b = SegmentSearch.searchSealed(3, cb, q, codeMap, adj, 20, params)
    assert(a == b)
    // a different segment id changes the pivot PRNG stream
    val c = SegmentSearch.searchSealed(4, cb, q, codeMap, adj, 20, params)
    assert(a.map(_.vecId) != c.map(_.vecId) || a == c) // usually differs; never crashes
  }

  test("dangling adjacency ids and missing codes are tolerated (post-vacuum state)") {
    val (_, cb, codeMap, adj) = buildSegment(100, 8, 9)
    // poison: neighbors pointing at removed ids; some codes missing
    val holeyAdj = adj.map { case (k, v) => k -> (v :+ 9999) }
    val holeyCodes = codeMap - 3 - 4
    val q = Array.fill(8)(0.1f)
    val cands = SegmentSearch.searchSealed(0, cb, q, holeyCodes, holeyAdj, 10,
      SearchParams.defaults(10, 2))
    assert(cands.nonEmpty)
    assert(!cands.exists(c => c.vecId == 3 || c.vecId == 4 || c.vecId == 9999))
  }

  test("BEAM respects maxIters and refineFrontier keeps the frontier sorted-best") {
    val (_, cb, codeMap, adj) = buildSegment(300, 8, 11)
    val q = Array.fill(8)(0.2f)
    val strict = SearchParams(efSearch = 50, beamWidth = 4, maxIters = 1, maxExplore = 4096,
      mode = SearchMode.Beam)
    val oneHop = SegmentSearch.searchSealed(0, cb, q, codeMap, adj, 10, strict)
    val twoHop = SegmentSearch.searchSealed(0, cb, q, codeMap, adj, 10,
      strict.copy(maxIters = 4))
    assert(oneHop.nonEmpty && twoHop.nonEmpty)
    val refined = SegmentSearch.searchSealed(0, cb, q, codeMap, adj, 10,
      strict.copy(maxIters = 4, refineFrontier = true))
    assert(refined.nonEmpty)
  }

  test("unusable code maps return empty: no codes at all, then all-null codes") {
    val (_, cb, _, adj) = buildSegment(50, 8, 21)
    val q = Array.fill(8)(0.3f)
    assert(SegmentSearch.searchSealed(0, cb, q, Map.empty[Int, Array[Byte]],
      adj, 5, SearchParams.defaults(5, 2)).isEmpty)
    val nulls: Map[Int, Array[Byte]] =
      (0 until 50).map(i => i -> (null: Array[Byte])).toMap
    assert(SegmentSearch.searchSealed(0, cb, q, nulls, adj, 5,
      SearchParams.defaults(5, 2)).isEmpty)
  }

  test("minHops keeps a dead-end frontier alive the required hops, then terminates") {
    // every node's adjacency is null: each hop produces nothing, so the
    // frontier survives exactly minHops rounds and the search ends
    // instead of hanging; the ADC seed ranking still comes back.
    val (_, cb, codeMap, _) = buildSegment(30, 8, 22)
    val noAdj: Map[Int, Array[Int]] =
      (0 until 30).map(i => i -> (null: Array[Int])).toMap
    val q = Array.fill(8)(0.1f)
    val p = SearchParams(efSearch = 50, beamWidth = 4, maxIters = 6,
      maxExplore = 4096, minHops = 3)
    val out = SegmentSearch.searchSealed(0, cb, q, codeMap, noAdj, 5, p)
    assert(out.forall(a => a.vecId >= 0 && a.vecId < 30))
  }
}
