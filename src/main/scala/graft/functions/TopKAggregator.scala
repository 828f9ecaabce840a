package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Bounded top-k aggregator (SURVEY.md §7.3 "custom Aggregator" tier;
 * the distributed analog of the reference's PriorityQueue usage,
 * FdbVectorIndex.java:913).
 *
 * Keeps the k best (score desc, gid asc tie-break) `(gid, score)` pairs in
 * a bounded min-heap. Unlike `Window.partitionBy(query).orderBy(score)` +
 * `row_number`, this combines MAP-SIDE: each partition sends at most k
 * pairs per query into the shuffle instead of every candidate — at
 * 100 TB / thousands of segments, the merge shuffle carries
 * O(queries × k × partitions) rows instead of O(all candidates).
 *
 * Result is sorted best-first.
 */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), mutable.PriorityQueue[(Long, Double)], Seq[(Long, Double)]] {

  // max-heap on (score asc, gid desc) ordering so the WORST kept element is
  // on top and can be evicted in O(log k)
  private def worstFirst: Ordering[(Long, Double)] =
    Ordering.by[(Long, Double), (Double, Long)] { case (gid, score) => (-score, gid) }

  override def zero: mutable.PriorityQueue[(Long, Double)] =
    mutable.PriorityQueue.empty[(Long, Double)](worstFirst)

  private def keeps(heap: mutable.PriorityQueue[(Long, Double)], e: (Long, Double)): Boolean = {
    val (topGid, topScore) = heap.head
    e._2 > topScore || (e._2 == topScore && e._1 < topGid)
  }

  override def reduce(
      heap: mutable.PriorityQueue[(Long, Double)],
      e: (Long, Double)): mutable.PriorityQueue[(Long, Double)] = {
    if (heap.size < k) heap.enqueue(e)
    else if (keeps(heap, e)) { heap.dequeue(); heap.enqueue(e) }
    heap
  }

  override def merge(
      a: mutable.PriorityQueue[(Long, Double)],
      b: mutable.PriorityQueue[(Long, Double)]): mutable.PriorityQueue[(Long, Double)] = {
    b.foreach(e => reduce(a, e))
    a
  }

  override def finish(heap: mutable.PriorityQueue[(Long, Double)]): Seq[(Long, Double)] =
    heap.toSeq.sortBy { case (gid, score) => (-score, gid) }

  override def bufferEncoder: Encoder[mutable.PriorityQueue[(Long, Double)]] =
    Encoders.kryo[mutable.PriorityQueue[(Long, Double)]]

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}
