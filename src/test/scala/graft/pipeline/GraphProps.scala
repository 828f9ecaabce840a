package graft.pipeline

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.TestSpark

/**
 * Falsifiers for the iterative graph operators on random graphs —
 * invariants a bug in the join/aggregate round machinery would break,
 * checked against independent driver implementations (adjacency maps,
 * not Spark plans).
 */
object GraphProps extends Properties("graft-graph") {

  // each case is a real multi-round Spark run (localCheckpoints and
  // all) — 15 random graphs per property is the cost/assurance balance
  // the other engine-driving property suites use
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Random undirected graph as canonical (a < b) distinct edges over
    * ≤ 12 nodes — small enough for exact driver replays, random enough
    * to hit peel cascades, multi-component label spreads, and BFS
    * frontier merges the fixtures don't. */
  private val edgesGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(2, 12)
    density <- Gen.chooseNum(1, 4)
    pairs = for { a <- 0 until n; b <- a + 1 until n } yield (a.toLong, b.toLong)
    kept <- Gen.sequence[List[Boolean], Boolean](
      List.fill(pairs.size)(Gen.frequency((density, Gen.const(true)), (4, Gen.const(false)))))
  } yield pairs.zip(kept).collect { case (p, true) => p }.toList

  private def adjacency(es: List[(Long, Long)]): Map[Long, Set[Long]] =
    (es ++ es.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  property("k-core peel equals the driver fixpoint peel") = forAll(edgesGen, Gen.chooseNum(1, 4)) {
    (es, k) =>
      es.isEmpty || {
        val adj = adjacency(es)
        // driver fixpoint: repeatedly drop nodes with < k surviving neighbors
        var alive = adj.keySet
        var changed = true
        while (changed) {
          val next = alive.filter(v => (adj(v) & alive).size >= k)
          changed = next != alive
          alive = next
        }
        val expected = alive.map(v => v -> (adj(v) & alive).size.toLong).toMap
        // rounds = node count is always past the fixpoint (≥1 drop/round)
        val sym = GraphAlgos.symmetrize(es.toDF("src", "dst"))
        val got = GraphAlgos.kCorePeel(sym, k, rounds = adj.size)
          .as[(Long, Long)].collect().toMap
        got == expected
      }
  }

  property("BFS distances equal driver BFS from the same seeds") =
    forAll(edgesGen, Gen.chooseNum(1, 3)) { (es, rounds) =>
      es.isEmpty || {
        val adj = adjacency(es)
        val seeds = adj.keySet.toSeq.sorted.take(2)
        // driver BFS bounded to `rounds` hops
        var dist = seeds.map(_ -> 0L).toMap
        for (r <- 1 to rounds) {
          val frontier = dist.collect { case (v, d) if d == r - 1 => v }
          frontier.foreach { v =>
            adj(v).foreach(u => if (!dist.contains(u)) dist += u -> r.toLong)
          }
        }
        val sym = GraphAlgos.symmetrize(es.toDF("src", "dst"))
        val got = GraphAlgos.multiSourceDistances(sym, seeds, rounds)
          .as[(Long, Long)].collect().toMap
        got == dist
      }
    }

  property("LPA labels stay in the node-id domain and respect per-round determinism") =
    forAll(edgesGen, Gen.chooseNum(1, 3)) { (es, rounds) =>
      es.isEmpty || {
        val adj = adjacency(es)
        // driver sync LPA: most frequent in-neighbor label, min tie-break
        var labels = adj.keySet.map(v => v -> v).toMap
        for (_ <- 1 to rounds) {
          labels = labels.map { case (v, old) =>
            val nbrLabels = adj(v).toSeq.map(labels)
            if (nbrLabels.isEmpty) v -> old
            else {
              val byLabel = nbrLabels.groupBy(identity).view.mapValues(_.size)
              val best = byLabel.toSeq.minBy { case (l, c) => (-c, l) }._1
              v -> best
            }
          }
        }
        val sym = GraphAlgos.symmetrize(es.toDF("src", "dst"))
        val got = GraphAlgos.labelPropagation(sym, rounds)
          .as[(Long, Long)].collect().toMap
        got == labels
      }
    }
}
