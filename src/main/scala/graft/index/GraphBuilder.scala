package graft.index

import scala.collection.mutable

import graft.core.Distances

/**
 * Per-segment kNN-graph construction (SURVEY.md §2.8 G1-G3; reference:
 * graph/GraphBuilder.java:41-327).
 *
 * All ranking uses squared L2 — sqrt is monotonic so ordering is identical,
 * and α-pruning deliberately operates on squared values (d² ≤ α·d² ⇔
 * d ≤ √α·d; reference: GraphBuilder.java:14-26,59-68).
 *
 * Strategy selection mirrors the reference's seal job
 * (tasks/SegmentBuildService.java:207-209): graphAlpha ≤ 1.0 → exact kNN
 * graph, otherwise incremental Vamana.
 *
 * A segment (≤ maxSegmentSize = 100k vectors) is built inside ONE Spark
 * task via mapGroups — the algorithms are inherently sequential (shared
 * adjacency state), so the scaling axis is cross-segment parallelism
 * (SURVEY.md §7.4 item 1).
 */
object GraphBuilder {

  /** O(n²) exact kNN graph, degree-capped, self excluded
    * (reference: GraphBuilder.java:41-56). */
  def buildL2Neighbors(vectors: Array[Array[Float]], degree: Int): Array[Array[Int]] = {
    val n = vectors.length
    Array.tabulate(n) { i =>
      val others = Array.range(0, n).filter(_ != i)
      val dists = new Array[Double](n)
      others.foreach(j => dists(j) = Distances.l2Squared(vectors(i), vectors(j)))
      others.sortBy(dists(_)).take(math.min(degree, n - 1))
    }
  }

  /** Brute-force top-lBuild then greedy α-prune: drop candidate u if a kept
    * neighbor p has d²(u,p) ≤ α·d²(u,i) (reference: GraphBuilder.java:70-108).
    * α ≤ 1 disables pruning. */
  def buildPrunedNeighbors(
      vectors: Array[Array[Float]],
      degree: Int,
      lBuild: Int,
      alpha: Double): Array[Array[Int]] = {
    val n = vectors.length
    val prune = alpha > 1.0
    Array.tabulate(n) { i =>
      val distToI = new Array[Double](n)
      val ranked = Array.range(0, n).filter(_ != i).sortBy { j =>
        val d = Distances.l2Squared(vectors(i), vectors(j))
        distToI(j) = d
        d
      }
      val limit = math.max(0, math.min(lBuild, n - 1))
      val selected = mutable.ArrayBuffer.empty[Int]
      var k = 0
      while (k < limit && selected.size < math.min(degree, limit)) {
        val u = ranked(k)
        // early-abandon threshold check: an abandoned partial is > the
        // bound, so the <= decision is bit-identical to the full kernel
        val bound = alpha * distToI(u)
        val dominated = prune && selected.exists { p =>
          Distances.l2SquaredBounded(vectors(u), vectors(p), bound) <= bound
        }
        if (!dominated) selected += u
        k += 1
      }
      selected.toArray
    }
  }

  /** Medoid: argmin distance to the dataset centroid
    * (reference: GraphBuilder.java:200-226). */
  def findMedoid(vectors: Array[Array[Float]]): Int = {
    val n = vectors.length
    val d = vectors(0).length
    val centroid = new Array[Double](d)
    vectors.foreach { v =>
      var j = 0
      while (j < d) { centroid(j) += v(j); j += 1 }
    }
    var j = 0
    while (j < d) { centroid(j) /= n; j += 1 }
    var best = 0
    var bestDist = Double.MaxValue
    var i = 0
    while (i < n) {
      var dist = 0.0
      var jj = 0
      while (jj < d) {
        val diff = vectors(i)(jj) - centroid(jj)
        dist += diff * diff
        jj += 1
      }
      if (dist < bestDist) { bestDist = dist; best = i }
      i += 1
    }
    best
  }

  /**
   * Incremental Vamana/DiskANN construction
   * (reference: GraphBuilder.java:132-195): medoid entry point, per-node
   * greedy search on the partial graph, robust α-prune, reverse-edge
   * insertion with re-prune when a node exceeds `degree`.
   */
  def buildVamanaGraph(
      vectors: Array[Array[Float]],
      degree: Int,
      lBuild: Int,
      alpha: Double): Array[Array[Int]] = {
    val n = vectors.length
    if (n == 0) return Array.empty
    if (n == 1) return Array(Array.empty[Int])

    val adj = Array.fill(n)(mutable.ArrayBuffer.empty[Int])
    val adjSets = Array.fill(n)(mutable.HashSet.empty[Int])
    val medoid = findMedoid(vectors)
    val inserted = new Array[Boolean](n)
    inserted(medoid) = true

    val order = Iterator.single(medoid) ++ Iterator.range(0, n).filter(_ != medoid)
    order.drop(1).foreach { node =>
      inserted(node) = true
      val candidates = greedySearch(vectors, adj, inserted, medoid, vectors(node), lBuild)
      val pruned = robustPrune(vectors, node, candidates.map(_._1), candidates.map(_._2), degree, alpha)
      adj(node) = mutable.ArrayBuffer(pruned: _*)
      adjSets(node) = mutable.HashSet(pruned: _*)
      // reverse edges: node becomes a neighbor of each selected v
      pruned.foreach { v =>
        if (!adjSets(v).contains(node)) {
          adj(v) += node
          adjSets(v) += node
          if (adj(v).size > degree) {
            // compute each neighbor's distance ONCE: the same values rank
            // the candidates and serve as robustPrune's thresholds
            // (identical pairs, identical kernel — bit-identical to the
            // former recompute inside the prune)
            val withD = adj(v).toArray
              .map(nb => (nb, Distances.l2Squared(vectors(nb), vectors(v))))
            val ranked = withD.sortBy(_._2)
            val rePruned = robustPrune(vectors, v, ranked.map(_._1), ranked.map(_._2), degree, alpha)
            adj(v) = mutable.ArrayBuffer(rePruned: _*)
            adjSets(v) = mutable.HashSet(rePruned: _*)
          }
        }
      }
    }
    adj.map(_.toArray)
  }

  /** Greedy best-first search over the partial graph; returns up to lBuild
    * (node id, squared L2 to the query) pairs, closest first — the dists
    * ride along so robustPrune never recomputes them
    * (reference: GraphBuilder.java:235-279). */
  private def greedySearch(
      vectors: Array[Array[Float]],
      adj: Array[mutable.ArrayBuffer[Int]],
      inserted: Array[Boolean],
      start: Int,
      query: Array[Float],
      lBuild: Int): Array[(Int, Double)] = {
    implicit val byDist: Ordering[(Int, Double)] = Ordering.by[(Int, Double), Double](_._2).reverse
    val frontier = mutable.PriorityQueue.empty[(Int, Double)] // min-heap via reversed ordering
    val visited = new Array[Boolean](vectors.length)
    val startDist = Distances.l2Squared(vectors(start), query)
    frontier.enqueue((start, startDist))
    visited(start) = true

    // best-L list kept sorted ascending by distance
    val best = mutable.ArrayBuffer[(Int, Double)]((start, startDist))

    def insertBest(e: (Int, Double)): Unit = {
      var pos = 0
      while (pos < best.size && best(pos)._2 <= e._2) pos += 1
      best.insert(pos, e)
      if (best.size > lBuild) best.remove(best.size - 1)
    }

    var done = false
    while (!done && frontier.nonEmpty) {
      val (cur, curDist) = frontier.dequeue()
      if (best.size >= lBuild && curDist > best.last._2) done = true
      else {
        adj(cur).foreach { nb =>
          if (!visited(nb) && inserted(nb)) {
            visited(nb) = true
            // NOT the bounded kernel: on the low-intrinsic-dimension
            // corpus neighbor distances cluster tightly, abandons come
            // too late to beat the vectorized straight-line loop
            // (measured 2.0 s -> 2.9 s)
            val dist = Distances.l2Squared(vectors(nb), query)
            frontier.enqueue((nb, dist))
            insertBest((nb, dist))
          }
        }
      }
    }
    best.toArray
  }

  /** RobustPrune (DiskANN) on squared distances: from candidates ranked by
    * distance to `node`, keep p unless a kept neighbor q has
    * d²(p,q) ≤ α·d²(p,node) (reference: GraphBuilder.java:306-327).
    * `rankedDists(i)` is the ALREADY-computed d²(rankedCandidates(i), node)
    * — the same kernel on the same pair the former recompute evaluated, so
    * passing it through is bit-identical and saves one full-dim distance
    * per candidate. */
  private def robustPrune(
      vectors: Array[Array[Float]],
      node: Int,
      rankedCandidates: Array[Int],
      rankedDists: Array[Double],
      degree: Int,
      alpha: Double): Array[Int] = {
    val selected = mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < rankedCandidates.length && selected.size < degree) {
      val p = rankedCandidates(i)
      if (p != node) {
        // early-abandon threshold check: an abandoned partial is > bound,
        // so the <= decision is bit-identical to the full kernel
        val bound = alpha * rankedDists(i)
        val dominated = selected.exists { q =>
          Distances.l2SquaredBounded(vectors(p), vectors(q), bound) <= bound
        }
        if (!dominated) selected += p
      }
      i += 1
    }
    selected.toArray
  }
}
