package graft.index

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core._

/** The dead-context arms of the sealed-input cache, driven for real by
  * STOPPING the shared SparkContext mid-suite (TestSpark.spark is a
  * getOrCreate `def`, so the next touch — here and in every later suite
  * — transparently builds a fresh session):
  *
  *  - release() must no-op on an entry whose context died (its blocks
  *    died with the context; unpersist would throw),
  *  - sweep/invalidate must still DROP such entries from the maps,
  *  - a cached entry from a previous context must read as STALE to a
  *    query arriving on the new context (the `eq sparkContext` guard)
  *    and be rebuilt, not served.
  *
  * These arms were environment-bound (only reachable at JVM teardown in
  * production) and carried scaladoc instead of tests until round 16. */
class StoppedContextCleanupSpec extends AnyFunSuite {

  private def sealedIndex(s: SparkSession, seed: Long): SegmentedIndex = {
    import s.implicits._
    val dir = Files.createTempDirectory("graft-stop").toString
    val store = new IndexStore(dir)
    store.createOrOpen(IndexMeta("stop", dimension = 4, maxSegmentSize = 50,
      pqM = 2, pqK = 4, graphDegree = 4, graphBuildBreadth = 16), 1000L)
    val idx = new SegmentedIndex(s, store)
    val r = new Random(seed)
    val df = (0 until 100).map(i => (i.toLong, Array.fill(4)(r.nextGaussian().toFloat)))
      .toDF("id", "embedding")
    idx.addAll(df, "embedding", "id")
    idx.sealPending()
    idx
  }

  private def q(s: SparkSession, store: IndexStore) =
    store.readVectors(s).filter(col("gid") < 2)
      .select(col("gid").as("queryId"), col("embedding").as("qv"))

  test("stopping the context: invalidate/sweep drop dead entries; a new context rebuilds") {
    val clock0 = Search.clock
    val ttl0 = Search.ttlNanos
    val grace0 = Search.graceNanos
    var now = 1L
    try {
      Search.clock = () => now
      Search.ttlNanos = 1000L
      Search.graceNanos = 0L
      val s1 = TestSpark.spark
      val a = sealedIndex(s1, 51)
      val b = sealedIndex(s1, 52)
      val c = sealedIndex(s1, 53)
      Seq(a, b, c).foreach(i => Search.query(s1, i.store, q(s1, i.store), 5).collect())
      assert(Seq(a, b, c).forall(i => Search.cachedPaths.contains(i.store.path)))

      s1.stop()
      assert(s1.sparkContext.isStopped)

      // invalidate on a dead-context entry: must drop it without throwing
      // (release() has nothing to unpersist — the blocks died with the
      // context)
      Search.invalidate(a.store.path)
      assert(!Search.cachedPaths.contains(a.store.path))

      // TTL sweep over dead-context entries: park + release the same way
      now += Search.ttlNanos + 1
      Search.drainExpired()
      assert(!Search.cachedPaths.contains(b.store.path))
      assert(Search.graceSnapshot.forall(_._2 != b.store.path),
        "grace 0: dead-context entry must drain in the same sweep")

      // new context: getOrCreate ignores the stopped default session
      val s2 = TestSpark.spark
      assert(s2.sparkContext ne s1.sparkContext)
      assert(!s2.sparkContext.isStopped)

      // C was swept above too (same TTL) — a query on the new context
      // is a plain miss and must rebuild + re-cache cleanly (the stale
      // `eq sparkContext` guard itself is driven by the second test,
      // where the TTL is parked out of the way)
      val store2 = new IndexStore(c.store.path)
      val rows = Search.query(s2, store2, q(s2, store2), 5).collect()
      assert(rows.nonEmpty, "rebuild on the new context must serve results")
      assert(Search.cachedPaths.contains(c.store.path))
      Search.invalidate(c.store.path)
    } finally {
      Search.clock = clock0
      Search.ttlNanos = ttl0
      Search.graceNanos = grace0
    }
  }

  test("a cached entry from a DEAD context reads as stale to the live context and rebuilds") {
    val clock0 = Search.clock
    val ttl0 = Search.ttlNanos
    val grace0 = Search.graceNanos
    var now = 1L
    try {
      Search.clock = () => now
      Search.ttlNanos = Long.MaxValue / 4 // TTL must NOT be the evictor here
      Search.graceNanos = 0L
      val s1 = TestSpark.spark
      val a = sealedIndex(s1, 54)
      Search.query(s1, a.store, q(s1, a.store), 5).collect()
      assert(Search.cachedPaths.contains(a.store.path))

      s1.stop()
      val s2 = TestSpark.spark
      // same store, same manifest version, DEAD original context: the
      // `eq sparkContext` guard must treat the entry as stale, park it
      // (release no-ops on the dead context), and rebuild under s2
      val store2 = new IndexStore(a.store.path)
      val rows = Search.query(s2, store2, q(s2, store2), 5).collect()
      assert(rows.nonEmpty)
      assert(Search.cachedPaths.contains(a.store.path),
        "stale dead-context entry must be REPLACED by a live rebuild")
      Search.invalidate(a.store.path)
    } finally {
      Search.clock = clock0
      Search.ttlNanos = ttl0
      Search.graceNanos = grace0
    }
  }
}
