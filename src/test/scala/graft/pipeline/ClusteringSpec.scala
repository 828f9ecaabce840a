package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ClusteringSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"
  private def embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("k-means converges to exact cluster means on a separable fixture") {
    // two tight blobs far apart; k=2 seeded from the two lowest ids (one
    // in each blob) must converge in one round to the exact blob means
    val fixture = Seq(
      (0L, Array(0.0f, 0.0f)), (2L, Array(0.2f, 0.0f)), (4L, Array(0.0f, 0.2f)),
      (1L, Array(10.0f, 10.0f)), (3L, Array(10.2f, 10.0f)), (5L, Array(10.0f, 10.2f))
    ).toDF("id", "emb")
    val (model, assigned) = Clustering.kMeans(spark, fixture, "id", "emb",
      k = 2, iterations = 2)
    val byCluster = assigned.as[(Long, Int)].collect().groupBy(_._2)
      .view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster(0) == Set(0L, 2L, 4L))
    assert(byCluster(1) == Set(1L, 3L, 5L))
    // exact means: blob A (0.066667ish, 0.066667ish) — snapped at 1e-6
    val cA = model.centroids.take(2).toSeq
    val cB = model.centroids.drop(2).toSeq
    assert(math.abs(cA.head - 0.066667f) < 1e-6 && math.abs(cA(1) - 0.066667f) < 1e-6, cA)
    assert(math.abs(cB.head - 10.066667f) < 1e-4 && math.abs(cB(1) - 10.066667f) < 1e-4, cB)
  }

  test("k-means is bit-deterministic across runs (the snap contract)") {
    def run() = Clustering.kMeans(spark, embeddings, "vec_id", "embedding",
      k = 8, iterations = 2)
    val (m1, a1) = run()
    val (m2, a2) = run()
    assert(m1.centroids.toSeq == m2.centroids.toSeq)
    assert(a1.as[(Long, Int)].collect().toSeq.sorted == a2.as[(Long, Int)].collect().toSeq.sorted)
  }

  test("k-means inertia is non-increasing across iterations") {
    def inertia(iters: Int): Double = {
      val (model, _) = Clustering.kMeans(spark, embeddings, "vec_id", "embedding",
        k = 8, iterations = iters)
      val scored = embeddings.select(
        Ann.clusterOf(col("embedding"), model.ivf).as("c"), col("embedding"))
      (0 until model.k).map { c =>
        val cent = model.ivf.centroid(c).toSeq
        scored.filter(col("c") === c)
          .select(graft.functions.vector.l2_squared(col("embedding"), typedlit(cent)))
          .as[Double].collect().sum
      }.sum
    }
    val i1 = inertia(1)
    val i3 = inertia(3)
    assert(i3 <= i1 + 1e-6, s"inertia rose: $i1 -> $i3")
  }
}
