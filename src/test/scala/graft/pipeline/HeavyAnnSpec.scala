package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.vector
import graft.index.ManifoldData

/**
 * IVF-PQ at production shape (dim 768, 50k vectors, nlist 64,
 * pqM 16 / pqK 256) in the genuinely APPROXIMATE regime — nprobe 32/64,
 * ADC shortlist 400 — on the same low-intrinsic-dimension manifold
 * corpus as the engine's HeavyRecallSpec (unit-norm variants, so L2
 * candidate generation aligns with the cosine metric). The manifold's
 * low intrinsic dimension clusters badly for IVF (nprobe 16 measured
 * 0.844); half-the-lists probing is the honest ≥0.9 configuration.
 *
 * This spec also guards the production-shape BUILD path: before the
 * ArgminL2/foldable-codebook kernels the 50k-row build ran 29 min
 * (unrolled least(struct) assignment ran interpreted past JIT limits);
 * the assertion caps it at 5 min.
 *
 * Gated behind GRAFT_HEAVY (the trainer alone is ~10^10 flops):
 * {{{ GRAFT_HEAVY=1 sbt "testOnly graft.pipeline.HeavyAnnSpec" }}}
 * Measured numbers recorded in BASELINE.md §heavy-recall.
 */
class HeavyAnnSpec extends AnyFunSuite {

  test("IVF-PQ recall@10 >= 0.9 at dim 768 / 50k vectors / nprobe 32/64 / rerank 400") {
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
      .cache()
    val qs = (0L until numQueries.toLong)
      .map(q => (q, ManifoldData.unitQueryFor(q)))

    val t0 = System.nanoTime()
    val model = Ann.trainIvfPq(spark, data, "embedding", "vec_id",
      nlist = 64, pqM = 16, pqK = 256)
    val tTrain = System.nanoTime()
    val index = Ann.buildIndexPq(data, "embedding", model).cache()
    index.count()
    val tBuild = System.nanoTime()

    val approx = Ann.searchIvfPq(spark, index, "vec_id", "embedding", qs, model,
        k = k, nprobe = 32, rerank = 400)
      .select("queryId", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val tSearch = System.nanoTime()

    val brute = Ann.searchBrute(spark, data, "vec_id", "embedding", qs, k)
      .select("queryId", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val hits = qs.map { case (q, _) =>
      approx.getOrElse(q, Set.empty).intersect(brute(q)).size
    }.sum
    val recall = hits.toDouble / (numQueries * k)
    info(f"train ${(tTrain - t0) / 1e9}%.1f s, build ${(tBuild - tTrain) / 1e9}%.1f s, " +
      f"search ${(tSearch - tBuild) / 1e9}%.1f s, recall@10 = $recall%.4f")
    data.unpersist(); index.unpersist()
    assert((tBuild - tTrain) / 1e9 < 300.0,
      f"production-shape build took ${(tBuild - tTrain) / 1e9}%.0f s — " +
        "the assignment/encode kernels have fallen off the JIT path")
    assert(recall >= 0.9, f"IVF-PQ production-shape recall@10 = $recall%.4f")
  }
}
