package graft.index

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.{IndexMeta, SearchParams}
import graft.functions.vector

/** Deterministic low-intrinsic-dimension corpus for the production-shape
  * recall gate. Pure object-level functions: anything referenced inside
  * Dataset closures must not drag a suite instance (or SparkSession) along.
  *
  * Geometry matters here. Iid gaussians at dim 768 have no distance
  * contrast (nearest ≈ median), so recall over them measures quantization
  * noise; well-separated clusters are the opposite failure — ef covers
  * every cluster member and recall pins at 1.0, never exercising the
  * approximate regime. Real embeddings live on a low-dimensional
  * manifold, so: 32-dim latent gaussians mapped through one fixed random
  * 768-wide projection, plus small full-rank ambient noise. The 10-NN
  * ranking then has real contrast (32-dim geometry) while PQ compresses
  * genuinely lossily — the regime production users run in. */
object HeavyRecallData {
  val Dim = 768
  val Latent = 32
  val Ambient = 0.05f

  private def gaussianArray(seed: Long, n: Int): Array[Float] = {
    val r = new Random(seed)
    Array.fill(n)(r.nextGaussian().toFloat)
  }

  /** Fixed latent→ambient projection, rows scaled ~unit so latent and
    * ambient scales are comparable. */
  private lazy val proj: Array[Array[Float]] = {
    val s = (1.0 / math.sqrt(Latent)).toFloat
    Array.tabulate(Latent)(j => gaussianArray(2000L + j, Dim).map(_ * s))
  }

  private def embed(latentSeed: Long, ambientSeed: Long): Array[Float] = {
    val z = gaussianArray(latentSeed, Latent)
    val out = gaussianArray(ambientSeed, Dim)
    var i = 0
    while (i < Dim) { out(i) *= Ambient; i += 1 }
    var j = 0
    while (j < Latent) {
      val zj = z(j); val row = proj(j)
      i = 0
      while (i < Dim) { out(i) += zj * row(i); i += 1 }
      j += 1
    }
    out
  }

  def vectorFor(id: Long): Array[Float] =
    embed(0x9E3779B97F4A7C15L ^ id, 0x5851F42D4C957F2DL ^ id)

  /** Held-out query from the same distribution (disjoint seed space). */
  def queryFor(q: Long): Array[Float] =
    embed(0x7F4A7C159E3779B9L ^ (q + 1000000L), 0x4C957F2D5851F42DL ^ (q + 2000000L))

  private def normalized(v: Array[Float]): Array[Float] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val inv = if (s == 0.0) 0.0 else 1.0 / math.sqrt(s)
    v.map(x => (x * inv).toFloat)
  }

  /** Unit-norm variants for the COSINE gate — pre-normalizing is the
    * standard cosine-ANN practice (the build side is L2 in the reference
    * regardless of metric; on the unit sphere L2 and cosine order
    * identically, so candidate generation aligns with the metric). */
  def unitVectorFor(id: Long): Array[Float] = normalized(vectorFor(id))
  def unitQueryFor(q: Long): Array[Float] = normalized(queryFor(q))
}

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
      .map(id => (id, HeavyRecallData.vectorFor(id)))
      .toDF("vec_id", "embedding")

    val tmp = java.nio.file.Files.createTempDirectory("graft-heavy").toString
    try {
      val store = new IndexStore(tmp)
      // production knobs (reference VectorIndexConfig.java:391-397) with the
      // segment cap sized so n=50k fills exactly 4 sealed segments
      store.createOrOpen(IndexMeta("heavy_recall", dimension = HeavyRecallData.Dim,
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
        .map(q => (q, HeavyRecallData.queryFor(q)))
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
      .map(id => (id, HeavyRecallData.unitVectorFor(id)))
      .toDF("vec_id", "embedding")

    val tmp = java.nio.file.Files.createTempDirectory("graft-heavy-cos").toString
    try {
      val store = new IndexStore(tmp)
      store.createOrOpen(IndexMeta("heavy_cos", dimension = HeavyRecallData.Dim,
        metric = graft.core.Metric.Cosine.name, maxSegmentSize = 12500,
        pqM = 16, pqK = 256, graphDegree = 64, graphBuildBreadth = 256,
        graphAlpha = 1.2, oversample = 4), System.currentTimeMillis())
      val idx = new SegmentedIndex(spark, store)
      idx.addAll(data, "embedding", "vec_id")
      idx.sealPending()
      assert(store.readManifest().segments
        .count(_.state == graft.core.SegmentState.Sealed) >= 4)

      val queriesDf = spark.range(numQueries.toLong)
        .map(q => (q, HeavyRecallData.unitQueryFor(q)))
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
