package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.{IndexMeta, SearchParams, SegmentState}
import graft.functions.vector

/**
 * Reference-shaped XL gate: 8 sealed segments × 100k vectors at dim 768 —
 * `maxSegmentSize` = the reference's actual production default
 * (VectorIndexConfig.java:391), one notch past HeavyRecallSpec's 4×12.5k.
 * This is the first configuration where the cogrouped per-segment search
 * and the shuffle-hash rerank see reference-shaped volume per task.
 *
 * Gated behind GRAFT_HEAVY_XL (tens of minutes: 8 single-task Vamana
 * builds over 100k × dim-768 each, running concurrently across the
 * local[32] pool):
 *
 * {{{ GRAFT_HEAVY_XL=1 sbt "testOnly graft.index.HeavyXlSpec" }}}
 *
 * Reports ingest/seal wall-clock (seal ≈ per-segment build time since
 * all 8 build in parallel) and per-rep query wall-clock; recall@10 ≥ 0.9
 * is the gate. Measured numbers recorded in BASELINE.md §heavy-xl.
 */
class HeavyXlSpec extends AnyFunSuite {

  test("recall@10 >= 0.9 at dim 768, 8 sealed 100k segments (reference production shape)") {
    assume(sys.env.contains("GRAFT_HEAVY_XL") || sys.props.contains("GRAFT_HEAVY_XL"),
      "XL gate: set GRAFT_HEAVY_XL=1 to run")
    val spark = TestSpark.spark
    import spark.implicits._

    val n = 800000L
    val k = 10
    val numQueries = 100

    val data: DataFrame = spark.range(n)
      .map(id => (id, ManifoldData.vectorFor(id)))
      .toDF("vec_id", "embedding")

    val tmp = java.nio.file.Files.createTempDirectory("graft-heavy-xl").toString
    try {
      val store = new IndexStore(tmp)
      store.createOrOpen(IndexMeta("heavy_xl", dimension = ManifoldData.Dim,
        maxSegmentSize = 100000, pqM = 16, pqK = 256, graphDegree = 64,
        graphBuildBreadth = 256, graphAlpha = 1.2, oversample = 4),
        System.currentTimeMillis())
      val idx = new SegmentedIndex(spark, store)
      val t0 = System.nanoTime()
      idx.addAll(data, "embedding", "vec_id")
      val tIngest = System.nanoTime()
      idx.sealPending()
      val tSeal = System.nanoTime()
      val sealedCount = store.readManifest().segments.count(_.state == SegmentState.Sealed)
      assert(sealedCount == 8, s"expected 8 sealed segments, got $sealedCount")
      info(f"ingest ${(tIngest - t0) / 1e9}%.1f s; " +
        f"seal ${(tSeal - tIngest) / 1e9}%.1f s for 8 parallel 100k builds")

      val queriesDf = spark.range(numQueries.toLong)
        .map(q => (q, ManifoldData.queryFor(q)))
        .toDF("queryId", "qv")

      // exact ground truth once
      val w = Window.partitionBy(col("queryId"))
        .orderBy(col("d2").asc, col("gid").asc)
      val truth = store.readVectors(spark).filter(!col("deleted"))
        .crossJoin(broadcast(queriesDf))
        .withColumn("d2", vector.l2_squared(col("embedding"), col("qv")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= k)
        .select(col("queryId"), col("gid")).as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert(truth.size == numQueries)

      // 3 warm query reps: rep timings bracket the query p50 at this shape
      val params = SearchParams.defaults(k, oversample = 4)
      var recall = 0.0
      (1 to 3).foreach { rep =>
        val tQ = System.nanoTime()
        val approx = Search.query(spark, store, queriesDf, k, Some(params))
          .select(col("queryId"), col("gid")).as[(Long, Long)].collect()
        val secs = (System.nanoTime() - tQ) / 1e9
        val approxByQ = approx.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
        recall = truth.map { case (q, t) =>
          approxByQ.getOrElse(q, Set.empty[Long]).intersect(t).size.toDouble / t.size
        }.sum / truth.size
        info(f"rep $rep: $numQueries queries in $secs%.1f s, recall@$k $recall%.4f")
      }
      assert(recall >= 0.9, f"XL recall@$k $recall%.4f below the 0.9 gate")
    } finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(tmp)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }
}
