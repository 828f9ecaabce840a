package graft.core

/**
 * Core data model of the engine (SURVEY.md §1).
 *
 * Mirrors the reference's protobuf data model
 * (reference: src/main/proto/vectorsearch.proto:31-155) re-expressed as
 * Scala case classes backing Spark `Dataset`s and a JSON manifest.
 */

/** Distance metric (reference: vectorsearch.proto:42-43, VectorIndexConfig.java:20-23). */
sealed abstract class Metric(val name: String)
object Metric {
  case object L2 extends Metric("L2")
  case object Cosine extends Metric("COSINE")
  def parse(s: String): Metric = s.toUpperCase match {
    case "L2"     => L2
    case "COSINE" => Cosine
    case other    => throw new IllegalArgumentException(s"unknown metric: $other")
  }
}

/**
 * Index-level immutable configuration, persisted once at creation and
 * validated on every reopen (reference: FdbVectorStore.java:77-166).
 *
 * Defaults follow the reference's production defaults
 * (reference: VectorIndexConfig.java:389-397).
 */
final case class IndexMeta(
    name: String,
    dimension: Int,
    metric: String = Metric.L2.name,
    maxSegmentSize: Int = IndexMeta.DefaultMaxSegmentSize,
    pqM: Int = IndexMeta.DefaultPqM,
    pqK: Int = IndexMeta.DefaultPqK,
    graphDegree: Int = IndexMeta.DefaultGraphDegree,
    graphBuildBreadth: Int = IndexMeta.DefaultGraphBuildBreadth,
    graphAlpha: Double = IndexMeta.DefaultGraphAlpha,
    oversample: Int = IndexMeta.DefaultOversample,
    graphBuildMode: String = GraphBuildMode.Auto) {
  require(dimension > 0, "dimension must be positive")
  require(pqM > 0 && dimension % pqM == 0, s"pqM=$pqM must divide dimension=$dimension")
  require(pqK > 0 && pqK <= 256, "pqK must be in (0,256] (codes are 1 byte/subspace)")
  require(GraphBuildMode.all.contains(graphBuildMode),
    s"graphBuildMode=$graphBuildMode not in ${GraphBuildMode.all}")
  require(maxSegmentSize > 0, "maxSegmentSize must be positive")
  // One segment seals in ONE task (that is what makes seal
  // embarrassingly parallel across segments), so the segment cap is a
  // per-task MEMORY bound, not a tuning suggestion: the build holds the
  // raw vectors (4·dim B), the adjacency under construction
  // (4·graphDegree B), PQ codes (pqM B) and ~64 B of bookkeeping per
  // row. The reference's fixed 100k default sits ~6x inside this bound
  // at its own production shape (dim 768: ~341 MB). Deployments wanting
  // bigger segments either split (more segments seal in parallel and
  // probe independently) or opt into graphBuildMode=PARTITIONED — the
  // sharded Vamana build (PartitionedBuild, DiskANN sharding
  // literature per PAPERS.md) where no task ever holds the whole
  // segment, which lifts this bound entirely.
  require(graphBuildMode == GraphBuildMode.Partitioned ||
      maxSegmentSize.toLong * segmentBuildRowBytes <= IndexMeta.SegmentBuildBudgetBytes,
    s"maxSegmentSize=$maxSegmentSize needs ~${maxSegmentSize.toLong * segmentBuildRowBytes >> 20} MB " +
      s"of per-task seal memory (dim=$dimension, degree=$graphDegree, pqM=$pqM) — " +
      s"over the ${IndexMeta.SegmentBuildBudgetBytes >> 30} GB task budget; " +
      "split into more (parallel) segments instead")
  def metricEnum: Metric = Metric.parse(metric)
  private def segmentBuildRowBytes: Long = 4L * dimension + 4L * graphDegree + pqM + 64L
}

object IndexMeta {
  /** Per-task sealed-build memory budget bounding `maxSegmentSize`
    * (see the validation rationale in the case class). */
  val SegmentBuildBudgetBytes: Long = 2L << 30

  /** Production defaults (reference: VectorIndexConfig.java:389-397),
    * hoisted so interop decoders can fall back to them without
    * constructing a (possibly invalid) dummy meta. */
  val DefaultMaxSegmentSize = 100000
  val DefaultPqM = 16
  val DefaultPqK = 256
  val DefaultGraphDegree = 64
  val DefaultGraphBuildBreadth = 256
  val DefaultGraphAlpha = 1.2
  val DefaultOversample = 2
}

/** Segment graph construction strategy (reference exercises all three
  * builders: SegmentBuildService.java:207-209 auto-selects exact-kNN vs
  * Vamana on alpha; GraphBuilderPruningTest.java:12-85 drives the
  * brute-force top-L + greedy α-prune builder directly).
  *  - AUTO: graphAlpha ≤ 1.0 → exact kNN graph, else incremental Vamana.
  *  - PRUNED: brute-force top-`graphBuildBreadth` then greedy α-prune
  *    (GraphBuilder.buildPrunedNeighbors) regardless of alpha.
  *  - PARTITIONED: sharded Vamana (overlap-2 clustering, per-shard build,
  *    degree-capped edge union — PartitionedBuild); the only mode whose
  *    `maxSegmentSize` may exceed the per-task seal budget. */
object GraphBuildMode {
  val Auto = "AUTO"
  val Pruned = "PRUNED"
  val Partitioned = "PARTITIONED"
  val all: Set[String] = Set(Auto, Pruned, Partitioned)
}

/** Segment lifecycle states (reference: vectorsearch.proto:74-101). */
object SegmentState {
  val Active = "ACTIVE"
  val Pending = "PENDING"
  val Sealed = "SEALED"
  val Compacting = "COMPACTING"
  val Writing = "WRITING"
  val all: Set[String] = Set(Active, Pending, Sealed, Compacting, Writing)
}

/** Per-segment metadata row in the manifest (reference: vectorsearch.proto:74-101).
  *
  * `buildAttempts`/`lastBuildError` are the batch re-expression of the
  * reference's build-queue task claims (SegmentBuildWorker.java:39-55
  * retries failed builds with attempt counts): every seal try — success
  * or failure — increments the counter, a failure records the error (a
  * scheduler polling manifests can see what the reference's queue
  * exposes), and the next successful seal clears it. Defaults keep
  * pre-round-11 manifests deserializing cleanly. */
final case class SegmentMeta(
    segId: Int,
    state: String,
    count: Long,
    deletedCount: Long,
    createdAtMs: Long,
    lastVacuumAtMs: Long = 0L,
    buildAttempts: Int = 0,
    lastBuildError: String = "") {
  require(SegmentState.all.contains(state), s"invalid state $state")
}

/** One vector row (reference: vectorsearch.proto:108-126). */
final case class VectorRecord(
    segId: Int,
    vecId: Int,
    gid: Long,
    embedding: Array[Float],
    deleted: Boolean,
    payload: Array[Byte])

/** Search hit; score is higher-is-better (reference: SearchResult.java:18,
  * FdbVectorIndex.java:686-693): L2 → score = -distance; COSINE → score =
  * similarity, distance = 1 - similarity. */
final case class SearchResult(gid: Long, score: Double, distance: Double, payload: Array[Byte])

/** Graph-search mode (reference: SearchParams.java:33-42). */
object SearchMode {
  val BestFirst = "BEST_FIRST"
  val Beam = "BEAM" // deprecated in the reference; kept for parity with WARN-once
}

object SeedStrategy {
  val TopAdc = "TOP_ADC"
  val RandomPivots = "RANDOM_PIVOTS"
}

/**
 * Search-time parameters (reference: SearchParams.java:20-31).
 */
final case class SearchParams(
    efSearch: Int,
    beamWidth: Int,
    maxIters: Int,
    maxExplore: Int,
    refineFrontier: Boolean = false,
    minHops: Int = 0,
    pivots: Int = 0,
    seedStrategy: String = SeedStrategy.TopAdc,
    perSegmentLimitMultiplier: Int = 1,
    normalizeOnRead: Boolean = false,
    mode: String = SearchMode.BestFirst)

object SearchParams {
  /** Defaults factory (reference: SearchParams.java:74-82):
    * ef = max(100, k*oversample*4), beam = clamp(k*2, 8, 64), iters = 6,
    * maxExplore = max(ef*4, 4096), BEST_FIRST. */
  def defaults(k: Int, oversample: Int): SearchParams = {
    val ef = math.max(100, k * oversample * 4)
    val beam = math.max(8, math.min(64, k * 2))
    SearchParams(
      efSearch = ef,
      beamWidth = beam,
      maxIters = 6,
      maxExplore = math.max(ef * 4, 4096))
  }
}

/** Engine-wide maintenance policy constants (reference: VectorIndexConfig.java:401-418). */
final case class MaintenancePolicy(
    vacuumMinDeletedRatio: Double = 0.25,
    vacuumCooldownMs: Long = 60000L,
    compactionAgeWeight: Double = 0.3,
    compactionSizeWeight: Double = 0.5,
    compactionFragWeight: Double = 0.2,
    compactionMinSegments: Int = 2,
    compactionMaxSegments: Int = 8,
    compactionMinFragmentation: Double = 0.1,
    compactionFillBudget: Double = 0.8,
    maxConcurrentCompactions: Int = 1)
