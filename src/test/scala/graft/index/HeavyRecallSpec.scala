package graft.index

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.{IndexMeta, SearchParams}
import graft.functions.vector

/**
 * The reference's heavy-N quality gate at production knobs
 * (VectorIndexTest.java:506-563 runs -DVS_HEAVY_N up to 10k;
 * VectorIndexConfig.java:391-397 defaults dim 768 / segment 100k /
 * pqM 16 / pqK 256 / degree 64): recall@10 ≥ 0.9 in the genuinely
 * APPROXIMATE regime — multi-segment, PQ-compressed ADC, bounded ef —
 * not the recall-1.0 pinned configs the DuckDB oracle checks.
 *
 * Slow by design (~minutes: 4 Vamana builds over 12.5k × dim-768 each);
 * gated behind GRAFT_HEAVY so the per-round `sbt test` stays fast:
 *
 * {{{ GRAFT_HEAVY=1 sbt "testOnly graft.index.HeavyRecallSpec" }}}
 *
 * Measured numbers are recorded in BASELINE.md §heavy-recall.
 */
class HeavyRecallSpec extends AnyFunSuite {

  test("recall@10 >= 0.9 at dim 768, 4 sealed 12.5k segments, pqM16/pqK256/deg64") {
    assume(sys.env.contains("GRAFT_HEAVY") || sys.props.contains("GRAFT_HEAVY"),
      "heavy gate: set GRAFT_HEAVY=1 to run")
    val spark = TestSpark.spark
    import spark.implicits._

    val n = 50000L
    val k = 10
    val numQueries = 100

    val data: DataFrame = spark.range(n)
      .map(id => (id, ManifoldData.vectorFor(id)))
      .toDF("vec_id", "embedding")

    val tmp = java.nio.file.Files.createTempDirectory("graft-heavy").toString
    try {
      val store = new IndexStore(tmp)
      // production knobs (reference VectorIndexConfig.java:391-397) with the
      // segment cap sized so n=50k fills exactly 4 sealed segments
      store.createOrOpen(IndexMeta("heavy_recall", dimension = ManifoldData.Dim,
        maxSegmentSize = 12500, pqM = 16, pqK = 256, graphDegree = 64,
        graphBuildBreadth = 256, graphAlpha = 1.2, oversample = 4),
        System.currentTimeMillis())
      val idx = new SegmentedIndex(spark, store)
      val t0 = System.nanoTime()
      idx.addAll(data, "embedding", "vec_id")
      val tIngest = System.nanoTime()
      idx.sealPending()
      val tSeal = System.nanoTime()

      val manifest = store.readManifest()
      val sealedCount = manifest.segments.count(_.state == graft.core.SegmentState.Sealed)
      assert(sealedCount >= 4, s"expected >= 4 sealed segments, got $sealedCount")

      val queriesDf = spark.range(numQueries.toLong)
        .map(q => (q, ManifoldData.queryFor(q)))
        .toDF("queryId", "qv")

      // exact ground truth over the same stored vectors (gid-keyed)
      val w = Window.partitionBy(col("queryId"))
        .orderBy(col("d2").asc, col("gid").asc)
      val truth = store.readVectors(spark).filter(!col("deleted"))
        .crossJoin(broadcast(queriesDf))
        .withColumn("d2", vector.l2_squared(col("embedding"), col("qv")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= k)
        .select(col("queryId"), col("gid")).as[(Long, Long)].collect()
      val truthByQ = truth.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      assert(truthByQ.size == numQueries)

      info(f"ingest ${(tIngest - t0) / 1e9}%.1f s, seal ${(tSeal - tIngest) / 1e9}%.1f s")

      // recall-vs-ef curve from ONE build: the approximation trade-off a
      // production operator actually tunes. Only the default config
      // (ef 160) is gated; the lower-ef points document the curve.
      val defaults = SearchParams.defaults(k, oversample = 4)
      val curve = Seq(48, 96, defaults.efSearch).map { ef =>
        val params = defaults.copy(efSearch = ef)
        val tQ0 = System.nanoTime()
        val approx = Search.query(spark, store, queriesDf, k, Some(params))
          .select(col("queryId"), col("gid")).as[(Long, Long)].collect()
        val secs = (System.nanoTime() - tQ0) / 1e9
        val approxByQ = approx.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
        val recalls = truthByQ.map { case (qid, t) =>
          approxByQ.getOrElse(qid, Set.empty[Long]).intersect(t).size.toDouble / t.size
        }.toSeq
        val mean = recalls.sum / recalls.size
        info(f"ef=$ef%4d: recall@$k mean=$mean%.4f min=${recalls.min}%.2f " +
          f"(${numQueries} queries in $secs%.1f s)")
        ef -> mean
      }
      val gated = curve.last._2
      assert(gated >= 0.9, f"recall@$k $gated%.4f below the 0.9 gate at default ef")
    } finally {
      // temp index trees are multi-GB at this shape — always reclaim
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(tmp)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }

  test("COSINE recall@10 >= 0.9 at production shape (unit-norm corpus)") {
    assume(sys.env.contains("GRAFT_HEAVY") || sys.props.contains("GRAFT_HEAVY"),
      "heavy gate: set GRAFT_HEAVY=1 to run")
    val spark = TestSpark.spark
    import spark.implicits._

    val n = 50000L
    val k = 10
    val numQueries = 100
    val data = spark.range(n)
      .map(id => (id, ManifoldData.unitVectorFor(id)))
      .toDF("vec_id", "embedding")

    val tmp = java.nio.file.Files.createTempDirectory("graft-heavy-cos").toString
    try {
      val store = new IndexStore(tmp)
      store.createOrOpen(IndexMeta("heavy_cos", dimension = ManifoldData.Dim,
        metric = graft.core.Metric.Cosine.name, maxSegmentSize = 12500,
        pqM = 16, pqK = 256, graphDegree = 64, graphBuildBreadth = 256,
        graphAlpha = 1.2, oversample = 4), System.currentTimeMillis())
      val idx = new SegmentedIndex(spark, store)
      idx.addAll(data, "embedding", "vec_id")
      idx.sealPending()
      assert(store.readManifest().segments
        .count(_.state == graft.core.SegmentState.Sealed) >= 4)

      val queriesDf = spark.range(numQueries.toLong)
        .map(q => (q, ManifoldData.unitQueryFor(q)))
        .toDF("queryId", "qv")

      val approx = Search.query(spark, store, queriesDf, k)
        .select(col("queryId"), col("gid")).as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet)

      val w = Window.partitionBy(col("queryId"))
        .orderBy(col("sim").desc, col("gid").asc)
      val truth = store.readVectors(spark).filter(!col("deleted"))
        .crossJoin(broadcast(queriesDf))
        .withColumn("sim", vector.cosine_sim(col("embedding"), col("qv")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= k)
        .select(col("queryId"), col("gid")).as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet)

      val recalls = truth.map { case (qid, t) =>
        approx.getOrElse(qid, Set.empty[Long]).intersect(t).size.toDouble / t.size
      }.toSeq
      val mean = recalls.sum / recalls.size
      info(f"COSINE recall@$k mean=$mean%.4f min=${recalls.min}%.2f")
      assert(mean >= 0.9, f"COSINE recall@$k $mean%.4f below the 0.9 gate")
    } finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(tmp)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }
}
