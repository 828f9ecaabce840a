package graft

import scala.collection.mutable
import scala.util.Random

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.core.Distances
import graft.functions.TopKAggregator
import graft.util.HistogramAccumulator

/**
 * Property-based invariants (ScalaCheck, run by sbt's native framework)
 * for the pieces whose correctness depends on ORDER-INVARIANCE — the
 * property a distributed engine actually relies on: partial aggregation
 * and accumulator merges happen in whatever order the scheduler picks,
 * and the answer must not care.
 */
object KernelProps extends Properties("graft-kernels") {

  private val scoresGen: Gen[List[Double]] =
    Gen.listOf(Gen.chooseNum(-1e6, 1e6).map(v => math.rint(v * 100) / 100))

  /** TopKAggregator: any partitioning of the input, reduced per chunk and
    * merged in either direction, equals the global sort-take-k. */
  property("topk is partition- and merge-order-invariant") =
    forAll(scoresGen, Gen.choose(1, 10), Gen.choose(1, 7), Gen.long) {
      (scores, k, nChunks, seed) =>
        val hits = scores.zipWithIndex.map { case (s, i) =>
          (i.toLong, s, Array(i.toByte))
        }
        val shuffled = new Random(seed).shuffle(hits)
        val agg = new TopKAggregator(k)
        val chunks = shuffled.zipWithIndex.groupBy(_._2 % nChunks).values
          .map(_.map(_._1)).toList
        def heapOf(c: List[(Long, Double, Array[Byte])]) =
          c.foldLeft(agg.zero)(agg.reduce)
        def run(hs: List[mutable.PriorityQueue[(Long, Double, Array[Byte])]]) =
          agg.finish(hs.foldLeft(agg.zero)(agg.merge)).map(h => (h._1, h._2))
        val forward = run(chunks.map(heapOf))
        val backward = run(chunks.reverse.map(heapOf))
        val brute = hits.sortBy { case (gid, s, _) => (-s, gid) }.take(k)
          .map(h => (h._1, h._2))
        forward == brute && backward == brute
    }

  private val vecGen: Gen[Array[Float]] =
    Gen.choose(1, 64).flatMap(d =>
      Gen.listOfN(d, Gen.chooseNum(-100f, 100f)).map(_.toArray))

  property("l2Squared: symmetric, zero on self, nonnegative") =
    forAll(vecGen, Gen.long) { (a, seed) =>
      val r = new Random(seed)
      val b = a.map(v => v + r.nextFloat())
      val ab = Distances.l2Squared(a, b)
      Distances.l2Squared(a, a) == 0.0 &&
        ab == Distances.l2Squared(b, a) && ab >= 0.0
    }

  property("cosine bounded in [-1, 1] (within fp rounding)") =
    forAll(vecGen, vecGen) { (a, b0) =>
      val b = b0.take(a.length).padTo(a.length, 0.5f)
      val c = Distances.cosine(a, b)
      c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9
    }

  property("histogram merge is commutative and total-preserving") =
    forAll(Gen.listOf(Gen.choose(0L, 1L << 48)), Gen.listOf(Gen.choose(0L, 1L << 48))) {
      (xs, ys) =>
        def histOf(vs: List[Long]) = {
          val h = new HistogramAccumulator
          vs.foreach(v => h.add(v))
          h
        }
        val ab = histOf(xs); ab.merge(histOf(ys))
        val ba = histOf(ys); ba.merge(histOf(xs))
        ab.value.sameElements(ba.value) &&
          HistogramAccumulator.total(ab.value) == (xs.size + ys.size).toLong &&
          (xs.isEmpty && ys.isEmpty ||
            HistogramAccumulator.percentile(ab.value, 1.0) >=
              HistogramAccumulator.percentile(ab.value, 0.5))
    }

  property("simhash is token-order-invariant") =
    forAll(Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty)), Gen.long) { (toks, seed) =>
      import org.apache.spark.unsafe.types.UTF8String
      def sim(ts: List[String]) = graft.functions.SimHash64Expr(null)
        .nullSafeEval(UTF8String.fromString(ts.mkString(" ")))
      sim(toks) == sim(new Random(seed).shuffle(toks))
    }

  property("sorted_intersect == set intersection on sorted inputs, duplicates tolerated") =
    forAll(Gen.listOf(Gen.choose(-1000L, 1000L)), Gen.listOf(Gen.choose(-1000L, 1000L))) {
      (xs, ys) =>
        import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
        // sorted but NOT deduped — the kernel must keep set semantics
        // (emit each matched value once) even with duplicate entries
        val a = xs.sorted.toArray
        val b = ys.sorted.toArray
        val got = graft.functions.SortedIntersectExpr(null, null)
          .nullSafeEval(new GenericArrayData(a), new GenericArrayData(b))
          .asInstanceOf[ArrayData].toLongArray()
        val want = a.toSet.intersect(b.toSet).toArray.sorted
        got.sameElements(want)
    }
}
