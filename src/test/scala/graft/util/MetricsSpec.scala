package graft.util

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core._
import graft.index.{IndexStore, Search, SegmentedIndex}

/** Engine observability parity (reference: VectorIndexTest.java:625-664
  * asserts the per-phase meters record after a query): a sealed query must
  * move every phase accumulator and surface row counts through the
  * observe() plan metrics. */
class MetricsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("sealed query records per-phase timings, candidate counts and observed row counts") {
    val dim = 8
    val dir = Files.createTempDirectory("graft-metrics").toString
    val store = new IndexStore(dir)
    store.createOrOpen(IndexMeta("metrics", dimension = dim, maxSegmentSize = 30,
      pqM = 4, pqK = 16, graphDegree = 8, graphBuildBreadth = 32), 0L)
    val idx = new SegmentedIndex(spark, store)

    import spark.implicits._
    val r = new Random(3)
    val df = (0 until 90).map(i => (i.toLong, Array.fill(dim)(r.nextGaussian().toFloat)))
      .toDF("id", "embedding")
    idx.addAll(df, "embedding", "id")
    idx.sealPending() // 3 sealed segments

    val em = EngineMetrics.forSession(spark)
    val adc0 = em.adcScanNanos.value
    val trav0 = em.graphTraversalNanos.value
    val cand0 = em.sealedCandidates.value
    val segs0 = em.sealedSegmentsSearched.value

    val queries = df.filter(col("id") < 4)
      .select(col("id").as("queryId"), col("embedding").as("qv"))
    val res = Search.query(spark, store, queries, 5)
    val rows = res.collect()
    assert(rows.length == 20) // 4 queries × k=5

    // phase meters moved (aggregated from executor tasks via accumulators)
    assert(em.adcScanNanos.value > adc0)
    assert(em.graphTraversalNanos.value > trav0)
    assert(em.sealedCandidates.value > cand0)
    // 4 queries × 3 sealed segments
    assert(em.sealedSegmentsSearched.value >= segs0 + 12)

    // observable plan metrics: rerank row count and final top-k count
    // (names carry a per-invocation suffix so query plans stay composable)
    val om = res.queryExecution.observedMetrics
    val rerank = om.collectFirst { case (k, v) if k.startsWith("graft_sealed_rerank") => v }
    val merge = om.collectFirst { case (k, v) if k.startsWith("graft_topk_merge") => v }
    assert(rerank.exists(_.getLong(0) > 0))
    assert(merge.exists(_.getLong(0) == 20L))
  }
}
