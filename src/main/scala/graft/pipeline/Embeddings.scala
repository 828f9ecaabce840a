package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Corpus-level embedding aggregation: per-group elementwise centroids.
 *
 * The same math as the index medoid step (SURVEY §2.4 A3,
 * `GraphBuilder.findMedoid`) lifted to a declarative grouped form:
 * posexplode to (group, dim, value), then one hash aggregation. The
 * explode inflates rows ×dim, but partial (map-side) aggregation
 * collapses every partition to ≤ groups×dim rows before the shuffle, so
 * the exchange carries group-level, not vector-level, cardinality — at
 * 100 TB this is a single scan + a tiny shuffle, the plan a hand-written
 * vector-sum Aggregator would also produce, with codegen for free.
 */
object Embeddings {

  /** Per-`groupCol` elementwise mean of `vecCol` (+ member count):
    * rows (group, dim_idx, centroid_value, n_members). */
  def groupCentroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("dim_idx", "v")))
      .groupBy(col(groupCol), col("dim_idx"))
      .agg(avg(col("v").cast("double")).as("centroid_value"),
        count(lit(1)).as("n_members"))

  /** Distance of each vector to its own group centroid — the dispersion /
    * outlier signal (embedding-quality monitoring). Joins the exploded
    * vectors back to the broadcast centroids on (group, dim). */
  def centroidDispersion(df: DataFrame, idCol: String, groupCol: String, vecCol: String): DataFrame = {
    val dims = df.select(col(idCol), col(groupCol),
      posexplode(col(vecCol)).as(Seq("dim_idx", "v")))
    val cent = groupCentroids(df, groupCol, vecCol)
      .select(col(groupCol), col("dim_idx"), col("centroid_value"))
    dims.join(broadcast(cent), Seq(groupCol, "dim_idx"))
      .groupBy(col(idCol), col(groupCol))
      .agg(sum((col("v").cast("double") - col("centroid_value")) *
        (col("v").cast("double") - col("centroid_value"))).as("d2"))
  }

  /** Convenience: unit-normalize a float-vector column (zero norm → zero
    * vector, matching the K6 zero-norm convention). */
  def l2Normalize(vec: Column): Column = {
    val nrm = sqrt(aggregate(vec, lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    when(nrm === 0.0, vec).otherwise(
      transform(vec, x => (x.cast("double") / nrm).cast("float")))
  }

  /** Matryoshka truncation: keep the first `d` dims and re-unit-normalize
    * (MRL-trained embeddings pack coarse semantics into the prefix, so the
    * renormed prefix is a drop-in cheap representation — 4x less scan
    * width at d = dim/4 for coarse search, with the full vector kept for
    * rerank). Composed built-ins only: slice + the normalize lambda stay
    * inside whole-stage codegen. */
  def matryoshka(vec: Column, d: Int): Column = l2Normalize(slice(vec, 1, d))

  /** The ±1 entry of the deterministic sign-projection matrix at (i, j):
    * the first hex nibble of `md5("i_j")`. A multiplicative-hash bit
    * here is a trap — over consecutive indices its top bit is a
    * quasi-periodic (three-distance) sequence, so matrix ROWS come out
    * correlated and the projection collapses (measured: cosine corr
    * 0.25 vs 0.63 with md5 signs). md5 gives iid signs and both engines
    * have it. */
  private[pipeline] def projSign(i: Int, j: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${i}_$j".getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) < 8) 1.0 else -1.0
  }

  /**
   * Deterministic sign random projection (Achlioptas 2003 / JL lemma):
   * project `dIn`-dim float vectors to `dOut` dims with a ±1 matrix
   * derived from [[projSign]] — the cheap distance-preserving sketch for
   * coarse search, clustering pre-passes, and bandwidth-bound scans
   * (dOut = dIn/4 reads 4x less in the scoring loop; rerank on the full
   * vector restores exactness, the same contract as [[matryoshka]] but
   * model-free).
   *
   * The matrix is tiny and known at PLAN time, so it ships as a folded
   * literal into the compact [[graft.functions.SignProject]] kernel —
   * one whole-stage-codegen loop per row, no shuffle, no UDF, no
   * interpreted lambda (an unrolled per-component sum chain at 2048
   * terms breaks Janino and drops the stage to interpreted mode).
   * Components snap to 6 decimals so both engines rank on bit-identical
   * values.
   *
   * @return `array<double>` column of length `dOut`
   */
  def signRandomProject(vec: Column, dOut: Int, dIn: Int): Column = {
    val flat = Array.tabulate(dOut * dIn)(k => projSign(k / dIn, k % dIn))
    graft.functions.vector.sign_project(vec, typedlit(flat))
  }

  /** Cosine between two double-array columns via in-order fold sums
    * (zero norm → 0.0, the K6 convention), rounded to 6 decimals —
    * engine-reproducible on snapped inputs. */
  def cosineRounded(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    def nrm(v: Column) =
      sqrt(aggregate(v, lit(0.0d), (acc, x) => acc + x * x))
    round(when(nrm(a) === 0.0 || nrm(b) === 0.0, 0.0)
      .otherwise(dot / (nrm(a) * nrm(b))), 6)
  }

  /**
   * Dominant principal component by POWER ITERATION, matrix-free — the
   * embedding-space drift/structure probe (top PCA loading + spectral
   * norm) computed as pure relational algebra: no covariance matrix is
   * ever materialized. Per round, `s_i = cᵢ·v` (one row-level agg) and
   * `w_j = Σᵢ s_i·c_ij` (one dim-level agg) — two partial-agg shuffles
   * over the exploded (row, dim, value) table, with only the dim-sized
   * `w` vector collected per round (the bounded-driver IVF-trainer
   * contract). Per-dim means and each normalized iterate snap to 6
   * decimals (the k-means convention), so an unrolled SQL oracle
   * replays the rounds bit-for-bit.
   *
   * @return (dim_idx, loading, lambda): the unit top eigenvector of the
   *         centered Gram matrix and its eigenvalue estimate ‖w‖
   */
  def pcaPowerIteration(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      iterations: Int = 3): DataFrame = {
    import spark.implicits._
    val dims = df.select(col(idCol).as("vid"),
        posexplode(col(vecCol)).as(Seq("j", "x")))
      .select(col("vid"), col("j"), col("x").cast("double").as("x"))
    val means = dims.groupBy(col("j")).agg(round(avg(col("x")), 6).as("m"))
    val c = dims.join(broadcast(means), Seq("j"))
      .select(col("vid"), col("j"), (col("x") - col("m")).as("cv"))
      .persist()
    val dim = c.agg(max(col("j"))).first().getInt(0) + 1
    var v = Array.tabulate(dim)(j => if (j == 0) 1.0 else 0.0)
    var lambda = 0.0
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (1 to iterations).foreach { _ =>
      val vDf = v.zipWithIndex.map { case (vj, j) => (j, vj) }.toSeq.toDF("j", "vj")
      val s = c.join(broadcast(vDf), Seq("j"))
        .groupBy(col("vid")).agg(sum(col("cv") * col("vj")).as("s"))
      val w = new Array[Double](dim)
      c.join(s, Seq("vid")).groupBy(col("j"))
        .agg(sum(col("cv") * col("s")).as("w"))
        .collect().foreach(r => w(r.getInt(0)) = r.getDouble(1))
      lambda = math.sqrt(w.map(x => x * x).sum)
      v = w.map(x => r6(x / lambda))
    }
    c.unpersist()
    val lam = BigDecimal(lambda).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    v.zipWithIndex.map { case (l, j) => (j, l, lam) }.toSeq
      .toDF("dim_idx", "loading", "lambda")
  }

  /**
   * Hard-negative mining for contrastive training: for each anchor, the
   * `k` nearest vectors carrying a DIFFERENT label — the highest-loss
   * negatives an in-batch sampler misses. Pre-filter semantics (the
   * label predicate narrows the corpus BEFORE ranking), so top-k never
   * starves.
   *
   * Shape at scale: anchors broadcast, one codegen'd cosine scan over
   * the corpus, per-anchor bounded top-k — identical cost to a brute
   * KNN batch; swap the scan for the IVF/SQ8 index when the corpus
   * outgrows it.
   *
   * @return (anchor_id, negative_id, negative_label, rank, cosine)
   */
  def hardNegatives(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      anchors: DataFrame, // (anchor_id, qv, anchor_label)
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cosine").desc, col(idCol))
    df.crossJoin(broadcast(anchors))
      .filter(col(labelCol) =!= col("anchor_label"))
      .withColumn("cosine",
        graft.functions.vector.cosine_sim(col(vecCol), col("qv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("anchor_id"), col(idCol).as("negative_id"),
        col(labelCol).as("negative_label"), col("rank"), col("cosine"))
  }

  /**
   * k-NN majority-vote classification — the instance-based evaluator
   * beside the parametric [[nearestCentroidClassify]]: each query takes
   * the cosine top-`k` among the OTHER labeled vectors and predicts the
   * modal label ((votes DESC, label ASC) tie-break, so the verdict is
   * deterministic). The standard embedding-quality probe: k-NN accuracy
   * is the first number reported for any new embedding model.
   *
   * Shape at scale: the query set broadcasts onto the corpus scan (the
   * KNN contract shared with [[hardNegatives]] and the brute search
   * path); voting is a query-keyed count over the k·queries candidate
   * rows. Production swaps the brute scan for the IVF/sealed-index
   * path — the voting algebra is unchanged.
   */
  /**
   * Mutual k-nearest-neighbor pairs — the reciprocal-rank filter that
   * turns a directed kNN edge list into the high-precision pair graph
   * SemDeDup-style semantic clustering and label-propagation seeds are
   * built on (a one-way neighbor is often a hub artifact; a MUTUAL
   * neighbor almost never is). Exact brute-force cosine top-k per side
   * (ties broken by neighbor id), then a self-join keeps (a,b) only
   * when each ranks in the other's top-k.
   *
   * Scale shape: the candidate stage here is the exact crossJoin-with-
   * broadcast (the bounded-corpus contract shared with [[knnClassify]]);
   * at corpus scale swap it for the IVF/LSH candidate generators in
   * [[Ann]] — the mutual filter is the same directed-edge self-join
   * either way, k·n-sized, never quadratic.
   */
  def mutualKnn(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).cast("long").as("ia"), col(vecCol).as("va"))
    val other = df.select(col(idCol).cast("long").as("ib"), col(vecCol).as("vb"))
    val w = Window.partitionBy(col("ia")).orderBy(col("cosine").desc, col("ib"))
    val topk = base.crossJoin(broadcast(other))
      .filter(col("ia") =!= col("ib"))
      .withColumn("cosine",
        graft.functions.vector.cosine_sim(col("va"), col("vb")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("ia"), col("ib"), col("cosine"))
    topk.persist()
    val out = topk.as("x").join(topk.as("y"),
        col("x.ia") === col("y.ib") && col("x.ib") === col("y.ia") &&
          col("x.ia") < col("x.ib"))
      .select(col("x.ia").as("id_a"), col("x.ib").as("id_b"),
        round(col("x.cosine"), 6).as("cosine"))
      .localCheckpoint()
    topk.unpersist()
    out
  }

  def knnClassify(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      queries: DataFrame, // (query_id, qv, true_label)
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wNn = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol))
    val votes = df.crossJoin(broadcast(queries))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cosine",
        graft.functions.vector.cosine_sim(col(vecCol), col("qv")))
      .withColumn("rnk", row_number().over(wNn))
      .filter(col("rnk") <= k)
      .groupBy(col("query_id"), col("true_label"), col(labelCol).as("vote"))
      .agg(count(lit(1)).as("n_votes"))
    val wV = Window.partitionBy(col("query_id"))
      .orderBy(col("n_votes").desc, col("vote"))
    votes
      .withColumn("vr", row_number().over(wV))
      .filter(col("vr") === 1)
      .select(col("query_id"),
        col("true_label").cast("long").as("true_label"),
        col("vote").cast("long").as("pred_label"),
        col("n_votes"),
        (col("vote") === col("true_label")).as("correct"))
      .orderBy(col("query_id"))
  }

  /**
   * Nearest-centroid (Rocchio) classification: fit one centroid per
   * label from the labeled rows, then assign EVERY row to its nearest
   * centroid by squared L2 — the cheap embedding-space domain/topic
   * tagger (and the standard semi-supervised propagation step: fit on
   * the labeled slice, predict the rest).
   *
   * Shape at scale: centroid fit is [[groupCentroids]] (partial-agg,
   * label-level shuffle only); the tiny (labels × dim) table collects to
   * the driver — bounded by label count, exactly the IVF-trainer
   * contract — and prediction is the same codegen'd [[Ann.clusterOf]]
   * argmin pass the IVF index uses: one scan, no shuffle, no join.
   * Centroid means snap to 6 decimals (the k-means convention) so
   * assignments are reproducible bit-for-bit by an unrolled SQL oracle.
   *
   * @return (idCol, labelCol, predicted_label, correct)
   */
  def nearestCentroidClassify(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String): DataFrame = {
    import spark.implicits._
    val cent = groupCentroids(df.filter(col(labelCol).isNotNull), labelCol, vecCol)
      .select(col(labelCol).cast("long").as("label"), col("dim_idx"),
        round(col("centroid_value"), 6).cast("float").as("cv"))
      .as[(Long, Int, Float)].collect()
    val labels = cent.map(_._1).distinct.sorted
    val dim = cent.map(_._2).max + 1
    val flat = new Array[Float](labels.length * dim)
    val labelIdx = labels.zipWithIndex.toMap
    cent.foreach { case (l, d, v) => flat(labelIdx(l) * dim + d) = v }
    val model = Ann.IvfModel(labels.length, dim, flat)
    val predIdx = Ann.clusterOf(col(vecCol), model)
    val labelLit = typedlit(labels)
    df.select(col(idCol), col(labelCol),
        element_at(labelLit, predIdx + 1).as("predicted_label"))
      .withColumn("correct", col(labelCol) === col("predicted_label"))
  }
}
