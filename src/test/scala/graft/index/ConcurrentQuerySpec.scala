package graft.index

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core._

/** Concurrent use of the query path: parallel Search.query calls share
  * the per-manifest input cache (guarded by a lock) and Spark's
  * scheduler; and two query results must compose into ONE action (the
  * documented reason observe() names carry a per-invocation suffix). */
class ConcurrentQuerySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sealedIndex(seed: Long): SegmentedIndex = {
    val dir = Files.createTempDirectory("graft-conc-q").toString
    val store = new IndexStore(dir)
    store.createOrOpen(IndexMeta("concq", dimension = 4, maxSegmentSize = 50,
      pqM = 2, pqK = 4, graphDegree = 4, graphBuildBreadth = 16), 1000L)
    val idx = new SegmentedIndex(spark, store)
    val r = new Random(seed)
    val df = (0 until 100).map(i => (i.toLong, Array.fill(4)(r.nextGaussian().toFloat)))
      .toDF("id", "embedding")
    idx.addAll(df, "embedding", "id")
    idx.sealPending()
    idx
  }

  test("8 concurrent query calls against one index return identical results") {
    val idx = sealedIndex(21)
    val q = idx.store.readVectors(spark).filter(col("gid") < 3)
      .select(col("gid").as("queryId"), col("embedding").as("qv"))
    val expected = Search.query(spark, idx.store, q, 5)
      .select("queryId", "gid", "rank").as[(Long, Long, Long)].collect().toSet

    import scala.concurrent._
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val all = Await.result(Future.sequence((1 to 8).map { _ =>
        Future(Search.query(spark, idx.store, q, 5)
          .select("queryId", "gid", "rank").as[(Long, Long, Long)].collect().toSet)
      }), 120.seconds)
      all.foreach(s => assert(s == expected))
    } finally pool.shutdown()
  }

  test("a segment sealed after a cached query is visible to the next query") {
    // pins the input-cache invalidation invariant: the cached sealed
    // payload is keyed by the SAME manifest snapshot the query planned
    // against, so a seal committed between queries always rebuilds the
    // cache — a stale payload would silently drop the new segment's
    // vectors from every result.
    val idx = sealedIndex(24)
    val q0 = idx.store.readVectors(spark).filter(col("gid") < 2)
      .select(col("gid").as("queryId"), col("embedding").as("qv"))
    Search.query(spark, idx.store, q0, 5).collect() // warm the cache

    val r = new Random(99)
    val more = (100 until 200).map(i => (i.toLong, Array.fill(4)(r.nextGaussian().toFloat)))
      .toDF("id", "embedding")
    idx.addAll(more, "embedding", "id")
    idx.sealPending()

    // self-query a vector that lives only in the newly sealed segment:
    // it must come back as its own nearest neighbor
    val target = idx.store.readVectors(spark).filter(col("gid") === 150L)
      .select(lit(0L).as("queryId"), col("embedding").as("qv"))
    val top = Search.query(spark, idx.store, target, 1)
      .select("gid").as[Long].head()
    assert(top == 150L, "newly sealed segment invisible — stale cached payload served")
  }

  test("results of two indexes union into one action (observe names stay unique)") {
    val idxA = sealedIndex(22)
    val idxB = sealedIndex(23)
    def q(idx: SegmentedIndex) = idx.store.readVectors(spark).filter(col("gid") < 2)
      .select(col("gid").as("queryId"), col("embedding").as("qv"))
    val a = Search.query(spark, idxA.store, q(idxA), 3).withColumn("src", lit("a"))
    val b = Search.query(spark, idxB.store, q(idxB), 3).withColumn("src", lit("b"))
    val rows = a.unionByName(b).groupBy("src").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(rows == Map("a" -> 6L, "b" -> 6L)) // 2 queries × k=3 each side
  }
}
