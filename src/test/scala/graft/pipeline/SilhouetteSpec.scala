package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Closed-form checks for [[Clustering.simplifiedSilhouette]]. */
class SilhouetteSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("hand-computed scores against seed centroids (iterations = 0)") {
    val s = spark
    import s.implicits._
    // seeds (id order): c0 = (0,0), c1 = (4,0)
    val df = Seq(
      (1L, Array(0f, 0f)),  // on c0: a=0, b=4 → 1.0
      (2L, Array(4f, 0f)),  // on c1: a=0, b=4 → 1.0
      (3L, Array(1f, 0f)),  // a=1, b=3 → 0.666667
      (4L, Array(2f, 0f))   // equidistant: argmin ties → c0; a=b=2 → 0.0
    ).toDF("id", "emb")
    val out = Clustering.simplifiedSilhouette(spark, df, "id", "emb",
        k = 2, iterations = 0)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, 0L, 1.0), (2L, 1L, 1.0), (3L, 0L, 0.666667), (4L, 0L, 0.0)))
  }

  test("coincident centroids: a = b = 0 guard yields 0.0, not NaN") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Array(0f, 0f)), (2L, Array(0f, 0f)), (3L, Array(0f, 0f))
    ).toDF("id", "emb")
    val out = Clustering.simplifiedSilhouette(spark, df, "id", "emb",
        k = 2, iterations = 0)
      .collect().map(_.getDouble(2)).toSeq
    assert(out == Seq(0.0, 0.0, 0.0))
  }

  test("scores are bounded in [-1, 1] on testdata") {
    val out = Clustering.simplifiedSilhouette(spark,
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
      "vec_id", "embedding", k = 8, iterations = 2)
    import org.apache.spark.sql.functions._
    val Array(lo, hi) = out.agg(min("silhouette"), max("silhouette"))
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    assert(lo >= -1.0 && hi <= 1.0, s"silhouette out of range: [$lo, $hi]")
  }
}
