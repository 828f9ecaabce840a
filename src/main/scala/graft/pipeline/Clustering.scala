package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.pipeline.Ann.IvfModel

/**
 * Distributed Lloyd's k-means over an embedding column — corpus
 * clustering as a first-class pipeline operator (topic bucketing,
 * dedup-block seeding, mixture analysis).
 *
 * Scale design (the 100 TB story):
 *  - ASSIGNMENT is a codegen'd argmin over broadcast centroids
 *    ([[Ann.clusterOf]]) — one scan pass, no shuffle;
 *  - the UPDATE step aggregates per-cluster element-wise sums with a
 *    custom [[Aggregator]] (map-side partial aggregation: each task
 *    contributes one k×dim partial, the shuffle carries k rows — never
 *    a dim-exploded shuffle and never a full-cluster mapGroups);
 *  - only k×(dim+1) numbers reach the driver per iteration.
 *
 * Determinism: initial centroids are the k lowest-`idCol` rows;
 * per-iteration centroid means are SNAPPED to `snapDecimals` decimals
 * (half-away-from-zero, then float-cast). Double partial-sum merge order
 * varies run to run at ~1e-14 relative error; the 1e-6 snap absorbs it,
 * making results bit-stable across runs AND reproducible in the DuckDB
 * oracle's unrolled-SQL Lloyd's (same snap rule = `round(x, 6)`).
 */
object Clustering {

  final case class KMeansModel(k: Int, dim: Int, centroids: Array[Float]) {
    def ivf: IvfModel = IvfModel(k, dim, centroids)
  }

  /** One-pass (sum, count) per cluster with map-side partial aggregation. */
  private class VecSumAggregator(dim: Int)
      extends Aggregator[Seq[Float], (Array[Double], Long), (Seq[Double], Long)] {
    override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)
    override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
      var i = 0
      while (i < dim) { b._1(i) += v(i).toDouble; i += 1 }
      (b._1, b._2 + 1L)
    }
    override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0
      while (i < dim) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
    override def finish(r: (Array[Double], Long)): (Seq[Double], Long) =
      (r._1.toIndexedSeq, r._2)
    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      Encoders.kryo[(Array[Double], Long)]
    override def outputEncoder: Encoder[(Seq[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Double], Long)]()
  }

  /** DuckDB-`round`-compatible snap: half away from zero at `d` decimals,
    * then to nearest float. */
  private def snap(x: Double, d: Int): Float = {
    val s = math.pow(10, d)
    (math.signum(x) * math.floor(math.abs(x) * s + 0.5) / s).toFloat
  }

  /**
   * Run `iterations` Lloyd's rounds; returns the model and the FINAL
   * assignment `(idCol, cluster)` under the last centroids.
   * Empty clusters keep their previous centroid.
   */
  def kMeans(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      iterations: Int,
      snapDecimals: Int = 6): (KMeansModel, DataFrame) = {
    import spark.implicits._
    val init = df.orderBy(col(idCol)).limit(k)
      .select(col(embCol).cast("array<float>")).as[Array[Float]].collect()
    require(init.length == k, s"need at least k=$k rows to seed k-means")
    val dim = init.head.length
    var centroids: Array[Float] = init.flatten.toArray

    val agg = new VecSumAggregator(dim).toColumn.name("stats")
    var it = 0
    while (it < iterations) {
      val model = IvfModel(k, dim, centroids)
      val stats = df
        .select(Ann.clusterOf(col(embCol), model).as("cluster"),
          col(embCol).cast("array<float>").as("v"))
        .as[(Int, Seq[Float])]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(agg)
        .collect()
        .toMap
      val next = new Array[Float](k * dim)
      var c = 0
      while (c < k) {
        stats.get(c) match {
          case Some((sum, n)) if n > 0 =>
            var i = 0
            while (i < dim) { next(c * dim + i) = snap(sum(i) / n, snapDecimals); i += 1 }
          case _ => // empty cluster: keep the previous centroid
            System.arraycopy(centroids, c * dim, next, c * dim, dim)
        }
        c += 1
      }
      centroids = next
      it += 1
    }

    val model = KMeansModel(k, dim, centroids)
    val assigned = df.select(col(idCol),
      Ann.clusterOf(col(embCol), model.ivf).as("cluster"))
    (model, assigned)
  }

  /** Unit-normalize an ARRAY<FLOAT> column (zero-norm rows pass through
    * unchanged — the K6 convention). Sequential double accumulation +
    * one correctly-rounded sqrt/divide per element, so the result is
    * bit-stable and SQL-replayable. */
  def unitNormalize(emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val n2 = sqrt(aggregate(emb, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    when(n2 === 0.0, emb)
      .otherwise(transform(emb, x => (x.cast("double") / n2).cast("float")))
  }

  /**
   * Spherical k-means — the cosine-geometry trainer (the standard coarse
   * quantizer for cosine IVF): inputs are unit-normalized once, Lloyd's
   * runs in L2 on the sphere (argmin L2 ≡ argmax cosine there), and each
   * round's centroid is the RE-NORMALIZED snapped mean, so centroids
   * stay on the sphere. Same scale shape as [[kMeans]]: codegen argmin
   * assignment, map-side partial sums, k×(dim+1) numbers to the driver
   * per round. Every float stage is correctly-rounded (sqrt, divide,
   * float cast) over the 1e-6-snapped means, so the DuckDB oracle
   * replays rounds bit-for-bit.
   */
  def sphericalKMeans(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      iterations: Int,
      snapDecimals: Int = 6): (KMeansModel, DataFrame) = {
    import spark.implicits._
    val unit = df.select(col(idCol), unitNormalize(col(embCol)).as("__unit"))
    val init = unit.orderBy(col(idCol)).limit(k)
      .select(col("__unit").cast("array<float>")).as[Array[Float]].collect()
    require(init.length == k, s"need at least k=$k rows to seed k-means")
    val dim = init.head.length
    var centroids: Array[Float] = init.flatten.toArray

    val agg = new VecSumAggregator(dim).toColumn.name("stats")
    var it = 0
    while (it < iterations) {
      val model = IvfModel(k, dim, centroids)
      val stats = unit
        .select(Ann.clusterOf(col("__unit"), model).as("cluster"),
          col("__unit").cast("array<float>").as("v"))
        .as[(Int, Seq[Float])]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(agg)
        .collect()
        .toMap
      val next = new Array[Float](k * dim)
      var c = 0
      while (c < k) {
        stats.get(c) match {
          case Some((sum, n)) if n > 0 =>
            val m = new Array[Float](dim)
            var i = 0
            while (i < dim) { m(i) = snap(sum(i) / n, snapDecimals); i += 1 }
            var ss = 0.0
            i = 0
            while (i < dim) { ss += m(i).toDouble * m(i).toDouble; i += 1 }
            val nm = math.sqrt(ss)
            i = 0
            while (i < dim) {
              next(c * dim + i) =
                if (nm == 0.0) m(i) else (m(i).toDouble / nm).toFloat
              i += 1
            }
          case _ => // empty cluster: keep the previous centroid
            System.arraycopy(centroids, c * dim, next, c * dim, dim)
        }
        c += 1
      }
      centroids = next
      it += 1
    }

    val model = KMeansModel(k, dim, centroids)
    val assigned = unit.select(col(idCol),
      Ann.clusterOf(col("__unit"), model.ivf).as("cluster"))
    (model, assigned)
  }
  /**
   * Simplified (centroid-based) silhouette — the standard
   * clustering-quality score at corpus scale: per point,
   * a = L2 distance to its own centroid, b = the nearest OTHER
   * centroid's distance, s = (b - a) / max(a, b) in [-1, 1]
   * (0 when both distances are 0). The all-pairs silhouette is O(n²);
   * the centroid form is the accepted large-scale surrogate and needs
   * only the k snapped centroids from [[kMeans]].
   *
   * Shape at scale: the k·dim centroid table rides into the expression
   * as a broadcast literal and every row is scored in ONE codegen'd
   * pass — no join, no shuffle; the plan is a bare projection over the
   * scan. Distances accumulate in index order (double), matching the
   * L2SquaredDistance kernel and the DuckDB replay bit-for-bit;
   * the score snaps to 6 dp.
   *
   * @return (id, cluster, silhouette)
   */
  def simplifiedSilhouette(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      iterations: Int): DataFrame = {
    require(k >= 2, "silhouette needs at least two clusters")
    val (model, _) = kMeans(spark, df, idCol, embCol, k, iterations)
    val flat = typedlit(model.centroids.toSeq) // k·dim floats, broadcast literal
    val dim = model.dim
    val v = col(embCol)
    // dists[c] = sqrt(Σ_i (v[i] - cent_c[i])²), index-ordered accumulation
    val dists = transform(sequence(lit(1), lit(k)), c =>
      sqrt(aggregate(sequence(lit(1), lit(dim)), lit(0.0), (acc, i) => {
        val d = element_at(v, i).cast("double") -
          element_at(flat, (c - 1) * dim + i).cast("double")
        acc + d * d
      })))
    val withD = df.select(col(idCol),
      Ann.clusterOf(v, model.ivf).cast("long").as("cluster"),
      dists.as("dists"))
    val own = element_at(col("dists"), (col("cluster") + 1).cast("int"))
    val other = array_min(transform(sequence(lit(1), lit(k)), c =>
      when(c === col("cluster") + 1, lit(Double.PositiveInfinity))
        .otherwise(element_at(col("dists"), c.cast("int")))))
    withD.select(col(idCol), col("cluster"),
      when(greatest(own, other) === 0.0, 0.0)
        .otherwise(round((other - own) / greatest(own, other), 6))
        .as("silhouette"))
  }

  /**
   * DBSCAN density classification (core / border / noise) over a 2-D
   * projection, with the ε-neighborhood join GRID-BUCKETED: each point
   * lands in its ⌊coord/ε⌋ cell, probes only the 3×3 cell neighborhood
   * (every point within ε of p is at most one cell away), and exact
   * distances filter the candidates. That replaces the all-pairs
   * O(n²) ε-join with one equi-join on cell keys whose volume is the
   * true neighbor volume plus a constant-factor halo — the standard
   * spatial-bucketing shape that survives 100 TB (points shuffle once
   * by cell; per-task work is bounded by local density, and a
   * pathological all-points-in-one-cell corpus degenerates exactly as
   * DBSCAN itself does, because then the density really IS quadratic).
   *
   * Semantics (Ester et al. 1996): `n_eps` counts neighbors within ε
   * INCLUDING the point itself; core ⇔ n_eps ≥ minPts; border ⇔
   * non-core with a core point within ε; noise otherwise. The full
   * cluster labeling (connected components over core adjacency) is
   * [[graft.pipeline.Dedup]]'s pointer-jumping primitive; this kernel
   * is the density stage that feeds it.
   *
   * Distance parity: dx·dx + dy·dy in doubles, compared against the
   * Scala-evaluated `eps*eps` — the oracle writes the same `eps*eps`
   * product so both engines round the threshold identically.
   */
  def dbscanClassify(
      points: DataFrame,
      idCol: String,
      xCol: org.apache.spark.sql.Column,
      yCol: org.apache.spark.sql.Column,
      eps: Double,
      minPts: Int): DataFrame = {
    require(eps > 0.0, "dbscan eps must be positive")
    require(minPts >= 1, "dbscan minPts must be >= 1")
    val pairs = epsNeighborPairs(points, idCol, xCol, yCol, eps)
      .localCheckpoint() // reused by the count AND the border join
    val counts = pairs.groupBy(col("p")).agg(count(lit(1)).as("n_eps"))
    val coreIds = counts.filter(col("n_eps") >= minPts)
      .select(col("p").as("core_q"))
    val borderIds = pairs.filter(col("p") =!= col("q"))
      .join(coreIds, col("q") === col("core_q"))
      .select(col("p").as("bp")).distinct()
    counts.join(borderIds, col("p") === col("bp"), "left")
      .select(col("p").as(idCol), col("n_eps"),
        when(col("n_eps") >= minPts, lit("core"))
          .when(col("bp").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("cls"))
  }

  /**
   * Full DBSCAN cluster labeling: [[dbscanClassify]]'s density stage
   * plus the component stage — clusters are connected components of
   * the ε-adjacency restricted to CORE points
   * ([[GraphAlgos.connectedComponentsStar]]: large-star/small-star
   * edge rewriting, O(log² n) rounds even on the huge-diameter spatial
   * meshes that defeat label propagation — a 1M-point blob graph
   * converges in ~10 rounds where min-label needed hundreds), borders
   * attach to the MINIMUM cluster label among their adjacent cores
   * (deterministic — textbook DBSCAN leaves border assignment
   * scan-order-dependent), noise labels −1. Cluster label = minimum
   * vec id of the component (an isolated core is its own singleton
   * cluster).
   *
   * Scale shape: the grid-bucketed candidate join runs ONCE
   * (checkpointed) and feeds the count, the core-core edge filter, and
   * the border attach; the CC rounds then touch only core-edge rows.
   */
  def dbscanLabels(
      points: DataFrame,
      idCol: String,
      xCol: org.apache.spark.sql.Column,
      yCol: org.apache.spark.sql.Column,
      eps: Double,
      minPts: Int,
      // star-rewriting rounds: O(log² n), shape-independent — the
      // default is ample headroom for any realistic corpus (a 1M-node
      // 141-hop mesh converges in ~10)
      ccMaxRounds: Int = 30): DataFrame = {
    require(eps > 0.0, "dbscan eps must be positive")
    require(minPts >= 1, "dbscan minPts must be >= 1")
    val pairs = epsNeighborPairs(points, idCol, xCol, yCol, eps)
      .localCheckpoint() // feeds counts, core-edge filter AND border attach
    val counts = pairs.groupBy(col("p")).agg(count(lit(1)).as("n_eps"))
    val core = counts.filter(col("n_eps") >= minPts).select(col("p").as("cp"))
    val coreEdges = pairs.filter(col("p") =!= col("q"))
      .join(core, col("p") === col("cp")).drop("cp")
      .join(core, col("q") === col("cp")).drop("cp")
    val cc = GraphAlgos.connectedComponentsStar(
        coreEdges.select(col("p"), col("q")), maxRounds = ccMaxRounds)
      .select(col("node").as("cc_id"), col("component").as("cluster_id"))
    // isolated cores (no core neighbor) carry no CC row → own-id cluster
    val coreLab = core.join(cc, col("cp") === col("cc_id"), "left")
      .select(col("cp").as("core_node"),
        coalesce(col("cluster_id"), col("cp")).as("core_cluster"))
    val borderLab = pairs.filter(col("p") =!= col("q"))
      .join(coreLab, col("q") === col("core_node"))
      .groupBy(col("p")).agg(min(col("core_cluster")).as("b_cluster"))
      .select(col("p").as("bp"), col("b_cluster"))
    counts
      .join(coreLab, col("p") === col("core_node"), "left")
      .join(borderLab, col("p") === col("bp"), "left")
      .select(col("p").as(idCol), col("n_eps"),
        when(col("core_node").isNotNull, lit("core"))
          .when(col("b_cluster").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("cls"),
        when(col("core_node").isNotNull, col("core_cluster"))
          .when(col("b_cluster").isNotNull, col("b_cluster"))
          .otherwise(lit(-1L)).cast("long").as("cluster"))
  }

  /** The grid-bucketed candidate stage, lazy — split out so the
    * per-stage physical plan stays pinnable in DbscanSpec (the
    * checkpoint in [[dbscanClassify]] reduces the public query's plan
    * to a LogicalRDD scan, the [[GraphAlgos.pageRankStep]] precedent).
    * Emits every ordered pair (p, q) with dist(p, q) ≤ ε — q's home
    * cell is unique and always inside p's 3×3 halo when dist ≤ ε
    * (cells are ε-wide), so each in-range q appears EXACTLY once. */
  private[pipeline] def epsNeighborPairs(
      points: DataFrame,
      idCol: String,
      xCol: org.apache.spark.sql.Column,
      yCol: org.apache.spark.sql.Column,
      eps: Double): DataFrame = {
    val pts = points.select(col(idCol).cast("long").as("id"),
        xCol.cast("double").as("x"), yCol.cast("double").as("y"))
      .withColumn("cx", floor(col("x") / eps).cast("long"))
      .withColumn("cy", floor(col("y") / eps).cast("long"))
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("ox"), lit(dy.toLong).as("oy"))
    val probe = pts.select(col("id").as("p"), col("x").as("px"),
        col("y").as("py"), explode(array(offsets: _*)).as("o"),
        col("cx"), col("cy"))
      .select(col("p"), col("px"), col("py"),
        (col("cx") + col("o.ox")).as("gx"), (col("cy") + col("o.oy")).as("gy"))
    val eps2 = eps * eps
    probe.join(pts, col("gx") === col("cx") && col("gy") === col("cy"))
      .filter((col("px") - col("x")) * (col("px") - col("x")) +
        (col("py") - col("y")) * (col("py") - col("y")) <= lit(eps2))
      .select(col("p"), col("id").as("q"))
  }
}
