package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Distances
import graft.functions.vector
import graft.index.Pq

/**
 * Approximate nearest-neighbor similarity search over an embedding column —
 * the pipeline-level ANN (complementing the segmented DiskANN engine in
 * graft.index): brute-force top-k as the exact baseline, IVF (inverted
 * file) coarse quantization as the scale path.
 *
 * IVF at 100 TB: centroids are trained once on a bounded sample (driver
 * k-means, same deterministic Lloyd's kernel as PQ with m=1), the
 * assignment is a codegen'd argmin over broadcast centroids, and a query
 * probes only `nprobe`/`nlist` of the data — the scan narrows by the
 * cluster equi-join (shuffle-free with the index pre-partitioned by
 * cluster).
 */
object Ann {

  /** Flat IVF model: centroid c starts at c*dim. */
  final case class IvfModel(nlist: Int, dim: Int, centroids: Array[Float]) {
    def centroid(c: Int): Array[Float] = {
      val out = new Array[Float](dim)
      System.arraycopy(centroids, c * dim, out, 0, dim)
      out
    }
    /** nprobe nearest centroid ids for a query (driver-side; nlist is small). */
    def probes(q: Array[Float], nprobe: Int): Seq[Int] =
      (0 until nlist).sortBy(c => Distances.l2SquaredRange(q, 0, centroids, c * dim, dim))
        .take(math.min(nprobe, nlist))
  }

  /** Sampled-path budget: the largest training collect the default
    * trainers will put on the driver (~64 MB of float payload — a 100k
    * sample at dim 768 would be ~300 MB, which is how driver OOMs
    * start). */
  private val SampleBudgetBytes = 64L << 20

  /** At and above this dimensionality the default trainers dispatch to
    * the DISTRIBUTED k-means ([[trainIvfDistributed]]): production
    * embedding dims (256/768/1024+) shouldn't sample-collect at all —
    * the whole corpus participates and only k×(dim+1) numbers reach the
    * driver per iteration. Below it (and under `forceSampled`) the
    * classic bounded-sample Lloyd's runs, capped to the byte budget. */
  val DistributedDimThreshold = 256

  /** Embedding dimensionality probe: one 1-row job, no payload. */
  private def peekDim(df: DataFrame, embCol: String): Int = {
    val r = df.select(size(col(embCol)).cast("int")).limit(1).collect()
    require(r.nonEmpty, "cannot train on an empty dataset")
    r(0).getInt(0)
  }

  /** `sampleSize` capped so the driver collect stays within budget. */
  private def cappedSample(sampleSize: Int, dim: Int, floor: Int): Int =
    math.max(floor, math.min(sampleSize, (SampleBudgetBytes / (4L * dim)).toInt))

  /** Train the coarse quantizer. Default dispatch: dim >=
    * [[DistributedDimThreshold]] trains with distributed k-means (no
    * driver sample at all); below it, deterministic-sample Lloyd's via
    * the PQ trainer with a single subspace (seed fixed), sample capped
    * to the driver byte budget. `forceSampled = true` pins the sampled
    * path regardless of dim (parity/debug). */
  def trainIvf(
      spark: SparkSession,
      df: DataFrame,
      embCol: String,
      idCol: String,
      nlist: Int,
      sampleSize: Int = 100000,
      seed: Long = Pq.DefaultSeed,
      forceSampled: Boolean = false): IvfModel = {
    import spark.implicits._
    val dim = peekDim(df, embCol)
    if (!forceSampled && dim >= DistributedDimThreshold) {
      trainIvfDistributed(spark, df, embCol, idCol, nlist)
    } else {
      val n = cappedSample(sampleSize, dim, floor = nlist)
      val sample = df.orderBy(col(idCol)).limit(n)
        .select(col(embCol).cast("array<float>")).as[Array[Float]].collect()
      require(sample.nonEmpty, "cannot train IVF on an empty dataset")
      val cb = Pq.train(sample.toIndexedSeq, dim, m = 1, k = nlist, seed = seed)
      IvfModel(nlist, dim, cb.centroids)
    }
  }

  /** Cluster-assignment column: argmin squared-L2 over the centroids in
    * ONE compact codegen'd kernel ([[graft.functions.ArgminL2]]). The
    * earlier least(struct(l2_squared…)) unrolling inlined nlist distance
    * kernels into one generated method — past HotSpot's JIT limits at
    * production shape (nlist 64 × dim 768 ran interpreted, ~100×). Same
    * result incl. tie-break (lower cluster id). */
  def clusterOf(emb: Column, model: IvfModel): Column =
    vector.argmin_l2(emb, typedlit(model.centroids.toSeq))

  /** Materialize the IVF index: input rows + their cluster id, repartitioned
    * by cluster so probes are partition-local. */
  def buildIndex(df: DataFrame, embCol: String, model: IvfModel): DataFrame =
    df.withColumn("cluster", clusterOf(col(embCol), model))
      .repartition(col("cluster"))

  /** Incremental index maintenance: assign ONLY the delta batch under the
    * FROZEN coarse quantizer and append it to the existing index — the
    * nightly-ingest path. The base index is untouched (no retrain, no
    * re-shuffle of the corpus); the append job is linear in the delta,
    * and because both legs share the same cluster partitioning, probe
    * equi-joins stay partition-local. Centroid drift is a monitoring
    * concern ([[graft.pipeline.Embeddings]] drift ops), not a per-batch
    * rebuild. */
  def appendToIndex(
      index: DataFrame, delta: DataFrame, embCol: String, model: IvfModel): DataFrame =
    index.unionByName(buildIndex(delta, embCol, model))

  /**
   * IVF query: each (query, probe-cluster) pair equi-joins the index on
   * `cluster`, exact distance on the narrowed set, per-query top-k.
   * `queries`: (queryId LONG, qv ARRAY<FLOAT>) — collected and broadcast
   * (query batches are small relative to the corpus).
   */
  def searchIvf(
      spark: SparkSession,
      index: DataFrame,
      idCol: String,
      embCol: String,
      queries: Seq[(Long, Array[Float])],
      model: IvfModel,
      k: Int,
      nprobe: Int): DataFrame = {
    import spark.implicits._
    val probeRows = queries.flatMap { case (qid, q) =>
      model.probes(q, nprobe).map(c => (qid, c, q))
    }.toDF("queryId", "cluster", "qv")
    val w = Window.partitionBy(col("queryId")).orderBy(col("cosine").desc, col(idCol))
    index.join(broadcast(probeRows), Seq("cluster"))
      .withColumn("cosine", vector.cosine_sim(col(embCol), col("qv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("queryId"), col(idCol).as("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Train the coarse quantizer with DISTRIBUTED k-means
    * ([[Clustering.kMeans]]) instead of a driver-side sample: the whole
    * corpus participates (full scan per iteration, k×(dim+1) numbers to
    * the driver) — the trainer that still works when even a training
    * sample is too big to collect. */
  def trainIvfDistributed(
      spark: SparkSession,
      df: DataFrame,
      embCol: String,
      idCol: String,
      nlist: Int,
      iterations: Int = 3): IvfModel = {
    val (model, _) = Clustering.kMeans(spark, df, idCol, embCol, nlist, iterations)
    model.ivf
  }

  /** IVF-PQ model: IVF coarse quantizer + a PQ codebook for the ADC scan.
    * PQ trains on raw vectors with L2 (the reference has no metric switch
    * here — SURVEY.md §7.4 item 5); k ≤ 256 so codes are one byte per
    * subspace. */
  final case class IvfPqModel(ivf: IvfModel, codebook: Pq.Codebook)

  /** Train coarse quantizer + PQ codebook. Default dispatch mirrors
    * [[trainIvf]]: at dim >= [[DistributedDimThreshold]] the COARSE
    * centroids come from distributed k-means (the expensive, accuracy-
    * critical half — they decide what a probe scans); the PQ codebook
    * still trains on a deterministic sample, but capped to the driver
    * byte budget (~22k rows at dim 768 ≈ 64 MB — subspace k-means
    * saturates far below that). `forceSampled = true` pins the classic
    * single-sample path. */
  def trainIvfPq(
      spark: SparkSession,
      df: DataFrame,
      embCol: String,
      idCol: String,
      nlist: Int,
      pqM: Int,
      pqK: Int,
      sampleSize: Int = 100000,
      seed: Long = Pq.DefaultSeed,
      forceSampled: Boolean = false): IvfPqModel = {
    import spark.implicits._
    require(pqK <= 256, s"pqK=$pqK does not fit a one-byte code")
    val dim = peekDim(df, embCol)
    val n = cappedSample(sampleSize, dim, floor = math.max(nlist, pqK))
    lazy val sample = df.orderBy(col(idCol)).limit(n)
      .select(col(embCol).cast("array<float>")).as[Array[Float]].collect()
    if (!forceSampled && dim >= DistributedDimThreshold) {
      val ivf = trainIvfDistributed(spark, df, embCol, idCol, nlist)
      require(sample.nonEmpty, "cannot train IVF-PQ on an empty dataset")
      val pqCb = Pq.train(sample.toIndexedSeq, dim, m = pqM, k = pqK, seed = seed)
      IvfPqModel(ivf, pqCb)
    } else {
      require(sample.nonEmpty, "cannot train IVF-PQ on an empty dataset")
      val ivfCb = Pq.train(sample.toIndexedSeq, dim, m = 1, k = nlist, seed = seed)
      val pqCb = Pq.train(sample.toIndexedSeq, dim, m = pqM, k = pqK, seed = seed)
      IvfPqModel(IvfModel(nlist, dim, ivfCb.centroids), pqCb)
    }
  }

  /** Materialize the IVF-PQ index: cluster id + one-byte-per-subspace PQ
    * code, both codegen'd columns in the same scan pass; repartitioned by
    * cluster so probes are partition-local. At 100 TB the codes column is
    * what the ADC scan reads — `pqM` bytes per vector instead of the
    * `4*dim`-byte embedding, a 32x scan-width cut at dim=64/m=8. */
  def buildIndexPq(df: DataFrame, embCol: String, model: IvfPqModel): DataFrame =
    df.withColumn("cluster", clusterOf(col(embCol), model.ivf))
      .withColumn("pq_code",
        vector.pq_encode(col(embCol), typedlit(model.codebook.centroids.toSeq),
          lit(model.codebook.m)))
      .repartition(col("cluster"))

  /**
   * IVF-PQ query: probe `nprobe` clusters, rank the narrowed set by the
   * PQ ADC approximation (per-query LUT built driver-side, broadcast with
   * the probe rows — `m*k` doubles per query), keep the best `rerank`
   * candidates per query, then exact-rerank only those on the full
   * embeddings. `rerank >=` the probed-set size degenerates to exact
   * search over the probes (the oracle configuration); production uses
   * `rerank` of a few×k (recall pinned by PipelineSpec).
   *
   * Scale shape: the ADC scan touches (cluster, id, code) only; the
   * embedding column is read in a second pruned scan joined against the
   * broadcast shortlist — at 100 TB that is the difference between
   * sorting 25 TB of floats and scanning 0.8 TB of codes plus a
   * broadcast-filtered rerank pass.
   */
  def searchIvfPq(
      spark: SparkSession,
      index: DataFrame,
      idCol: String,
      embCol: String,
      queries: Seq[(Long, Array[Float])],
      model: IvfPqModel,
      k: Int,
      nprobe: Int,
      rerank: Int): DataFrame = {
    import spark.implicits._
    val probeRows = queries.flatMap { case (qid, q) =>
      val lut = Pq.buildLut(model.codebook, q)
      model.ivf.probes(q, nprobe).map(c => (qid, c, q, lut))
    }.toDF("queryId", "cluster", "qv", "lut")
    val adcW = Window.partitionBy(col("queryId")).orderBy(col("adc"), col(idCol))
    // ADC scan: codes + id only — the embedding column never enters this pass.
    val shortlist = index.select(col("cluster"), col(idCol), col("pq_code"))
      .join(broadcast(probeRows), Seq("cluster"))
      .withColumn("adc", vector.pq_adc_distance(col("lut"), col("pq_code")))
      .withColumn("adc_rank", row_number().over(adcW))
      .filter(col("adc_rank") <= rerank)
      .select(col("queryId"), col(idCol), col("qv"))
    // Exact rerank: the bounded shortlist (|queries|*rerank rows) broadcasts
    // back onto the embeddings — a broadcast-hash join, no shuffle of the
    // corpus, and the scan is pruned to (id, embedding).
    val w = Window.partitionBy(col("queryId")).orderBy(col("cosine").desc, col(idCol))
    index.select(col(idCol), col(embCol))
      .join(broadcast(shortlist), Seq(idCol))
      .withColumn("cosine", vector.cosine_sim(col(embCol), col("qv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("queryId"), col(idCol).as("neighbor_id"), col("rank"), col("cosine"))
  }

  /**
   * RESIDUAL IVF-PQ training — the FAISS-canonical IVFADC formulation
   * (Jégou et al. 2011): the PQ codebook is trained on RESIDUALS
   * `x − centroid(cluster(x))` instead of raw vectors. Residuals are
   * centered near zero with far less variance than the raw corpus, so
   * the same pqM×pqK code budget spends itself on the part of the
   * vector the coarse quantizer did NOT explain — tighter cells, lower
   * ADC error at equal bytes. Coarse training dispatches exactly like
   * [[trainIvfPq]] (distributed at dim ≥ [[DistributedDimThreshold]]);
   * the residual computation for the PQ sample is driver-side over the
   * same bounded deterministic sample.
   */
  def trainIvfPqResidual(
      spark: SparkSession,
      df: DataFrame,
      embCol: String,
      idCol: String,
      nlist: Int,
      pqM: Int,
      pqK: Int,
      sampleSize: Int = 100000,
      seed: Long = Pq.DefaultSeed,
      forceSampled: Boolean = false): IvfPqModel = {
    import spark.implicits._
    require(pqK <= 256, s"pqK=$pqK does not fit a one-byte code")
    val dim = peekDim(df, embCol)
    val n = cappedSample(sampleSize, dim, floor = math.max(nlist, pqK))
    val sample = df.orderBy(col(idCol)).limit(n)
      .select(col(embCol).cast("array<float>")).as[Array[Float]].collect()
    require(sample.nonEmpty, "cannot train residual IVF-PQ on an empty dataset")
    val ivf =
      if (!forceSampled && dim >= DistributedDimThreshold)
        trainIvfDistributed(spark, df, embCol, idCol, nlist)
      else IvfModel(nlist, dim, Pq.train(sample.toIndexedSeq, dim, m = 1, k = nlist, seed = seed).centroids)
    val residuals = sample.map { x =>
      val c = ivf.centroid(nearestCentroid(x, ivf))
      Array.tabulate(x.length)(i => x(i) - c(i))
    }
    IvfPqModel(ivf, Pq.train(residuals.toIndexedSeq, dim, m = pqM, k = pqK, seed = seed))
  }

  /** Driver-side argmin cluster — same squared-L2 + lowest-id tie-break
    * as the codegen'd [[clusterOf]] kernel. */
  private def nearestCentroid(x: Array[Float], ivf: IvfModel): Int =
    (0 until ivf.nlist).minBy(c =>
      Distances.l2SquaredRange(x, 0, ivf.centroids, c * ivf.dim, ivf.dim))

  /** Residual column `emb − centroid(cluster)`: zip_with over the
    * broadcast per-cluster centroid rows — float subtraction, the same
    * IEEE op the driver-side trainer applies, so codes replay exactly. */
  private def residualCol(emb: Column, cluster: Column, ivf: IvfModel): Column = {
    val rows: Seq[Seq[Float]] = (0 until ivf.nlist).map(c => ivf.centroid(c).toSeq)
    zip_with(emb, element_at(typedlit(rows), cluster + lit(1)),
      (a, b) => a - b).cast("array<float>")
  }

  /** [[buildIndexPq]] with residual encoding: cluster id from the raw
    * vector, PQ code from `x − centroid(cluster)` — both codegen'd in
    * the same scan pass; cluster-partitioned like every index build. */
  def buildIndexPqResidual(df: DataFrame, embCol: String, model: IvfPqModel): DataFrame = {
    val cl = clusterOf(col(embCol), model.ivf)
    df.withColumn("cluster", cl)
      .withColumn("pq_code",
        vector.pq_encode(residualCol(col(embCol), col("cluster"), model.ivf),
          typedlit(model.codebook.centroids.toSeq), lit(model.codebook.m)))
      .repartition(col("cluster"))
  }

  /**
   * IVFADC query over a residual index: the LUT for a probed cluster is
   * built from the QUERY residual `q − centroid(c)` — one LUT per
   * (query, probe) pair instead of per query (nprobe·m·k doubles on the
   * driver, still broadcast-sized). Within a probed cluster
   * `‖r_x − r_q‖ = ‖x − q‖` (both drop the same centroid), so residual
   * ADC approximates the true distance rather than the raw-code
   * distance — the precision the residual codebook buys. Scan and
   * rerank shapes are identical to [[searchIvfPq]].
   */
  def searchIvfPqResidual(
      spark: SparkSession,
      index: DataFrame,
      idCol: String,
      embCol: String,
      queries: Seq[(Long, Array[Float])],
      model: IvfPqModel,
      k: Int,
      nprobe: Int,
      rerank: Int): DataFrame = {
    import spark.implicits._
    val probeRows = queries.flatMap { case (qid, q) =>
      model.ivf.probes(q, nprobe).map { c =>
        val cent = model.ivf.centroid(c)
        val rq = Array.tabulate(q.length)(i => q(i) - cent(i))
        (qid, c, q, Pq.buildLut(model.codebook, rq))
      }
    }.toDF("queryId", "cluster", "qv", "lut")
    val adcW = Window.partitionBy(col("queryId")).orderBy(col("adc"), col(idCol))
    val shortlist = index.select(col("cluster"), col(idCol), col("pq_code"))
      .join(broadcast(probeRows), Seq("cluster"))
      .withColumn("adc", vector.pq_adc_distance(col("lut"), col("pq_code")))
      .withColumn("adc_rank", row_number().over(adcW))
      .filter(col("adc_rank") <= rerank)
      .select(col("queryId"), col(idCol), col("qv"))
    val w = Window.partitionBy(col("queryId")).orderBy(col("cosine").desc, col(idCol))
    index.select(col(idCol), col(embCol))
      .join(broadcast(shortlist), Seq(idCol))
      .withColumn("cosine", vector.cosine_sim(col(embCol), col("qv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("queryId"), col(idCol).as("neighbor_id"), col("rank"), col("cosine"))
  }

  /** IVF-PQ model plus the PCA rotation applied before both coarse
    * assignment and PQ encoding. */
  final case class PcaPqModel(rotation: Rotation.RotationModel, inner: IvfPqModel)

  /**
   * PCA-rotated IVF-PQ ("OPQ-lite", Ge et al. 2013's R fixed to the
   * PCA basis): rotate into the covariance eigenbasis, then train
   * coarse + PQ quantizers in the rotated space. Rotation preserves L2
   * exactly (up to the 6-dp kernel snap), so the geometry the
   * quantizers see is the same — but subspaces now split decorrelated
   * axes, which is where PQ loses the most on anisotropic embeddings.
   * Trains on the bounded deterministic sample (rotation + both
   * codebooks — the rotated corpus never materializes).
   */
  def trainPcaPq(
      spark: SparkSession,
      df: DataFrame,
      embCol: String,
      idCol: String,
      nlist: Int,
      pqM: Int,
      pqK: Int,
      sampleSize: Int = 100000,
      seed: Long = Pq.DefaultSeed): PcaPqModel = {
    import spark.implicits._
    require(pqK <= 256, s"pqK=$pqK does not fit a one-byte code")
    val dim = peekDim(df, embCol)
    val n = cappedSample(sampleSize, dim, floor = math.max(nlist, pqK))
    val sample = df.orderBy(col(idCol)).limit(n)
      .select(col(embCol).cast("array<float>")).as[Array[Float]].collect()
    require(sample.length >= 2, "cannot train PCA-PQ on fewer than 2 rows")
    val rot = Rotation.trainPca(sample.toIndexedSeq, dim)
    val rotated = sample.map(rot.rotate).toIndexedSeq
    val ivfCb = Pq.train(rotated, dim, m = 1, k = nlist, seed = seed)
    val pqCb = Pq.train(rotated, dim, m = pqM, k = pqK, seed = seed)
    PcaPqModel(rot, IvfPqModel(IvfModel(nlist, dim, ivfCb.centroids), pqCb))
  }

  /** Rotated-embedding column: the [[graft.functions.SignProject]]
    * dense-projection kernel with the rotation matrix as the projection
    * (same accumulate order + 6-dp snap as the driver-side
    * [[Rotation.RotationModel.rotate]]), cast back to float. */
  private def rotatedCol(emb: Column, rot: Rotation.RotationModel): Column =
    vector.sign_project(emb, typedlit(rot.matrix.toSeq)).cast("array<float>")

  /** Materialize the PCA-rotated IVF-PQ index: cluster + code computed
    * from the ROTATED embedding in one scan pass; the original
    * embedding column rides along for the exact rerank. */
  def buildIndexPcaPq(df: DataFrame, embCol: String, model: PcaPqModel): DataFrame = {
    val rotated = rotatedCol(col(embCol), model.rotation)
    df.withColumn("__rot", rotated)
      .withColumn("cluster", clusterOf(col("__rot"), model.inner.ivf))
      .withColumn("pq_code",
        vector.pq_encode(col("__rot"), typedlit(model.inner.codebook.centroids.toSeq),
          lit(model.inner.codebook.m)))
      .drop("__rot")
      .repartition(col("cluster"))
  }

  /** [[searchIvfPq]] over a PCA-rotated index: queries rotate
    * driver-side (bit-identical kernel replay), the ADC scan runs in
    * rotated space, and the exact rerank scores ORIGINAL embeddings —
    * so rerank-all configs are value-equal to brute force and share
    * the dense-cosine oracle. */
  def searchPcaPq(
      spark: SparkSession,
      index: DataFrame,
      idCol: String,
      embCol: String,
      queries: Seq[(Long, Array[Float])],
      model: PcaPqModel,
      k: Int,
      nprobe: Int,
      rerank: Int): DataFrame = {
    import spark.implicits._
    val probeRows = queries.flatMap { case (qid, q) =>
      val rq = model.rotation.rotate(q)
      val lut = Pq.buildLut(model.inner.codebook, rq)
      model.inner.ivf.probes(rq, nprobe).map(c => (qid, c, q, lut))
    }.toDF("queryId", "cluster", "qv", "lut")
    val adcW = Window.partitionBy(col("queryId")).orderBy(col("adc"), col(idCol))
    val shortlist = index.select(col("cluster"), col(idCol), col("pq_code"))
      .join(broadcast(probeRows), Seq("cluster"))
      .withColumn("adc", vector.pq_adc_distance(col("lut"), col("pq_code")))
      .withColumn("adc_rank", row_number().over(adcW))
      .filter(col("adc_rank") <= rerank)
      .select(col("queryId"), col(idCol), col("qv"))
    val w = Window.partitionBy(col("queryId")).orderBy(col("cosine").desc, col(idCol))
    index.select(col(idCol), col(embCol))
      .join(broadcast(shortlist), Seq(idCol))
      .withColumn("cosine", vector.cosine_sim(col(embCol), col("qv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("queryId"), col(idCol).as("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Symmetric per-vector int8 (SQ8) quantization: `codes[j] =
    * round(x[j]·127/maxAbs)` with `maxAbs = max|x[j]|` (all-zero vectors
    * quantize to all-zero codes). One byte per dim — a 4x narrower scan
    * representation than float32 — and the positive per-vector scale
    * cancels inside cosine, so search never dequantizes. Composed from
    * native array functions; stays in whole-stage codegen. */
  def quantizeSq8(vec: Column): Column = {
    val maxAbs = array_max(transform(vec, x => abs(x.cast("double"))))
    when(maxAbs === 0.0, transform(vec, _ => lit(0).cast("byte")))
      .otherwise(transform(vec,
        x => round(x.cast("double") * 127.0 / maxAbs).cast("byte")))
  }

  /**
   * SQ8 scan + exact rerank: rank everything by [[quantizeSq8]]-code
   * cosine (the codegen'd [[graft.functions.CosineSimilarityI8]] kernel
   * reads 1 B/dim), keep `shortlist` per query, rerank the shortlist
   * with exact float cosine. At `shortlist >= corpus` the result is
   * value-equal to [[searchBrute]] (the oracled gate config); the
   * bounded-shortlist recall is pinned in PipelineSpec.
   */
  def searchSq8(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      embCol: String,
      queries: Seq[(Long, Array[Float])],
      k: Int,
      shortlist: Int): DataFrame = {
    import spark.implicits._
    val q = queries.toDF("queryId", "qv")
    val codes = df.select(col(idCol), quantizeSq8(col(embCol)).as("sq8"))
    val aw = Window.partitionBy(col("queryId")).orderBy(col("approx").desc, col(idCol))
    val short = codes.crossJoin(broadcast(q))
      .withColumn("approx", vector.cosine_sim_i8(col("sq8"), col("qv")))
      .withColumn("arank", row_number().over(aw))
      .filter(col("arank") <= shortlist)
      .select(col("queryId"), col(idCol))
    val w = Window.partitionBy(col("queryId")).orderBy(col("cosine").desc, col(idCol))
    short.join(df.select(col(idCol), col(embCol)), Seq(idCol))
      .join(broadcast(q), Seq("queryId"))
      .withColumn("cosine", vector.cosine_sim(col(embCol), col("qv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("queryId"), col(idCol).as("neighbor_id"), col("rank"), col("cosine"))
  }

  /**
   * Binary (sign-bit) Hamming scan + exact rerank — the third
   * quantization tier next to PQ (product) and SQ8 (scalar): codes are
   * [[graft.functions.BinarizeSign]] packed sign words (32 components
   * per stored long — 128x narrower than float32), the approximate scan
   * ranks by the codegen'd popcount [[graft.functions.HammingDistance]]
   * (Hamming ASC, id tie-break), and the `shortlist` per query is
   * reranked with exact float cosine. Sign-Hamming estimates angular
   * distance (Charikar 2002: P[sign mismatch] = θ/π per dimension), so
   * the shortlist recall tracks cosine ordering; at `shortlist >=
   * corpus` the result is value-equal to [[searchBrute]] — the oracled
   * gate config, same discipline as [[searchSq8]], with the bounded
   * shortlist recall pinned in the spec.
   */
  def searchHamming(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      embCol: String,
      queries: Seq[(Long, Array[Float])],
      k: Int,
      shortlist: Int): DataFrame = {
    import spark.implicits._
    val q = queries.toDF("queryId", "qv")
      .select(col("queryId"), col("qv"), vector.binarize_sign(col("qv")).as("qcode"))
    val codes = df.select(col(idCol), vector.binarize_sign(col(embCol)).as("code"))
    val aw = Window.partitionBy(col("queryId")).orderBy(col("hamming").asc, col(idCol))
    val short = codes.crossJoin(broadcast(q.select(col("queryId"), col("qcode"))))
      .withColumn("hamming", vector.hamming_dist(col("code"), col("qcode")))
      .withColumn("arank", row_number().over(aw))
      .filter(col("arank") <= shortlist)
      .select(col("queryId"), col(idCol))
    val w = Window.partitionBy(col("queryId")).orderBy(col("cosine").desc, col(idCol))
    short.join(df.select(col(idCol), col(embCol)), Seq(idCol))
      .join(broadcast(q.select(col("queryId"), col("qv"))), Seq("queryId"))
      .withColumn("cosine", vector.cosine_sim(col(embCol), col("qv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("queryId"), col(idCol).as("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Exact brute-force cosine top-k — the baseline/oracle.
    *
    * @param snapDecimals when ≥ 0, round the cosine to this many
    *        decimals BEFORE ranking — use when the RANKS themselves are
    *        consumed downstream (e.g. rank fusion): near-tied unrounded
    *        doubles can order differently across engines, and a snapped
    *        score plus the id tie-break makes the rank assignment
    *        engine-reproducible. Default keeps raw scores (the
    *        value-oracled top-k gates compare score values, where the
    *        raw double is the ground truth). */
  def searchBrute(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      embCol: String,
      queries: Seq[(Long, Array[Float])],
      k: Int,
      snapDecimals: Int = -1): DataFrame = {
    import spark.implicits._
    val q = queries.toDF("queryId", "qv")
    val raw = vector.cosine_sim(col(embCol), col("qv"))
    val cos = if (snapDecimals >= 0) round(raw, snapDecimals) else raw
    val w = Window.partitionBy(col("queryId")).orderBy(col("cosine").desc, col(idCol))
    df.crossJoin(broadcast(q))
      .withColumn("cosine", cos)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("queryId"), col(idCol).as("neighbor_id"), col("rank"), col("cosine"))
  }
}
