package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{IndexMeta, SearchParams, SegmentState}
import graft.functions.vector
import graft.index.{IndexStore, ManifoldData, Search, SegmentedIndex}

/**
 * Production-shape bench row: seal + query at dim 768 on the
 * low-intrinsic-dimension manifold corpus (the GRAFT_HEAVY recall gates'
 * shape, scaled so the per-round bench prices it in tens of seconds
 * instead of minutes). 4k vectors fill two 2k segments — PQ 16×256,
 * Vamana degree 48 / breadth 128 — then 20 held-out queries run the full
 * per-segment ADC + exact-rerank path and recall@10 is checked against
 * the brute-force truth inline: a timing row that silently lost its
 * quality would be worthless, so < 0.9 throws and the bench records the
 * failure visibly.
 *
 * Unlike the sf-dir gates this row is SCALE-FACTOR-INDEPENDENT (the
 * corpus is generated); its anchor tracks kernel/build-path regressions
 * at production dimensionality per round, which the dim-64 gates cannot
 * see (HeavyAnnSpec's 29-minute JIT cliff was exactly such a bug).
 */
object HeavyBench {
  val N = 4000L
  val SegmentSize = 2000
  val NumQueries = 20
  val K = 10

  /** Build + query + recall check; returns the query-result row count. */
  def run(spark: SparkSession): Long = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-heavy-bench").toString
    try {
      val data: DataFrame = spark.range(N)
        .map(id => (id, ManifoldData.vectorFor(id)))
        .toDF("vec_id", "embedding")
      val store = new IndexStore(tmp)
      store.createOrOpen(IndexMeta("heavy_bench", dimension = ManifoldData.Dim,
        maxSegmentSize = SegmentSize, pqM = 16, pqK = 256, graphDegree = 48,
        graphBuildBreadth = 128, graphAlpha = 1.2, oversample = 4),
        System.currentTimeMillis())
      val idx = new SegmentedIndex(spark, store)
      idx.addAll(data, "embedding", "vec_id")
      idx.sealPending()
      val sealedCount = store.readManifest().segments.count(_.state == SegmentState.Sealed)
      require(sealedCount == (N / SegmentSize).toInt,
        s"expected ${N / SegmentSize} sealed segments, got $sealedCount")

      val queriesDf = spark.range(NumQueries.toLong)
        .map(q => (q, ManifoldData.queryFor(q)))
        .toDF("queryId", "qv")
      val approx = Search.query(spark, store, queriesDf, K,
          Some(SearchParams.defaults(K, oversample = 4)))
        .select(col("queryId"), col("gid")).as[(Long, Long)].collect()

      val w = Window.partitionBy(col("queryId")).orderBy(col("d2").asc, col("gid").asc)
      val truth = store.readVectors(spark).filter(!col("deleted"))
        .crossJoin(broadcast(queriesDf))
        .withColumn("d2", vector.l2_squared(col("embedding"), col("qv")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= K)
        .select(col("queryId"), col("gid")).as[(Long, Long)].collect()
      val truthByQ = truth.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val approxByQ = approx.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recall = truthByQ.map { case (q, t) =>
        approxByQ.getOrElse(q, Set.empty[Long]).intersect(t).size.toDouble / t.size
      }.sum / truthByQ.size
      require(recall >= 0.9,
        f"production-shape recall@$K collapsed to $recall%.4f — timing a broken index")
      approx.length.toLong
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}
