package graft.index

import org.apache.spark.sql.SparkSession

import graft.core.{IndexMeta, MaintenancePolicy, SegmentState}
import graft.maintenance.Maintenance

/**
 * Multi-index orchestration (SURVEY.md §2.10 T2/T3): one Spark application
 * driving seal + maintenance across many indexes — the batch re-expression
 * of the reference's global cross-index worker queues
 * (GlobalBuildQueueAdapter.java:62-90, GlobalWorkerRunner.java:90-123).
 *
 * The reference's config-merge rule is preserved
 * (GlobalWorkerRunner.java:382-422): DATA parameters (dimension, metric,
 * PQ/graph knobs) always come from each index's persisted IndexMeta;
 * OPERATIONAL parameters (vacuum/compaction policy) come from the runner's
 * template and apply uniformly.
 */
final class GlobalRunner(
    spark: SparkSession,
    val indexPaths: Seq[String],
    val policyTemplate: MaintenancePolicy = MaintenancePolicy(),
    /** Worker threads per sweep — the pool-size analog of the reference's
      * maintenance worker pool (MaintenanceWorkerPool.java:41-71). Each
      * per-index job submits independent Spark jobs; the Spark scheduler
      * interleaves them across the cluster, so at many indexes the driver
      * no longer serializes what the executors could overlap. */
    val sweepParallelism: Int = 8,
    /** Called on the worker thread as each per-index job begins — an
      * observability/test hook (path of the index being swept). */
    private[index] val jobStartHook: String => Unit = _ => ()) {

  /** Open every registered index, validating stored metadata. */
  def indexes: Seq[SegmentedIndex] =
    indexPaths.map(p => new SegmentedIndex(spark, new IndexStore(p)))

  /** Run one job per index on a bounded pool; indexes are independent
    * (each owns its manifest and paths), so concurrent sweeps are safe. */
  private def perIndex[A](f: SegmentedIndex => A): Map[String, A] = {
    val idxs = indexes
    if (idxs.sizeIs <= 1 || sweepParallelism <= 1)
      idxs.map(idx => idx.store.path -> { jobStartHook(idx.store.path); f(idx) }).toMap
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(idxs.size, sweepParallelism))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try {
        val fut = scala.concurrent.Future.sequence(idxs.map { idx =>
          scala.concurrent.Future {
            jobStartHook(idx.store.path)
            idx.store.path -> f(idx)
          }
        })
        scala.concurrent.Await.result(fut, scala.concurrent.duration.Duration.Inf).toMap
      } finally pool.shutdown()
    }
  }

  /** One build sweep: seal every PENDING/WRITING segment of every index
    * (the drain of the reference's global build queue; idempotent). */
  def sealAll(): Map[String, Int] =
    perIndex { idx =>
      val pending = idx.manifest.segments.count(s =>
        s.state == SegmentState.Pending || s.state == SegmentState.Writing)
      idx.sealPending()
      pending
    }

  /** One maintenance sweep: policy-driven vacuum, then compaction anchored
    * on the segments the vacuum left under half-full — the reference's
    * post-vacuum hook (MaintenanceService.java:200-216), never an
    * arbitrary head-of-registry anchor. Returns per-index counts of
    * (vacuumed segments, compactions run). */
  def maintainAll(nowMs: Long): Map[String, (Int, Int)] =
    perIndex { idx =>
      val (vacuumed, compacted) = new Maintenance(idx, policyTemplate).sweep(nowMs)
      (vacuumed.size, compacted)
    }

  /** Queue-empty barrier across every index (T4 awaitIndexingComplete):
    * true when no segment anywhere still needs a build. */
  def indexingComplete: Boolean =
    indexes.forall(_.manifest.segments.forall(s =>
      s.state != SegmentState.Pending && s.state != SegmentState.Writing))
}

object GlobalRunner {
  /** Create-or-open many indexes from (path, meta) templates. */
  def createAll(
      spark: SparkSession,
      specs: Seq[(String, IndexMeta)],
      nowMs: Long,
      policy: MaintenancePolicy = MaintenancePolicy()): GlobalRunner = {
    specs.foreach { case (path, meta) => new IndexStore(path).createOrOpen(meta, nowMs) }
    new GlobalRunner(spark, specs.map(_._1), policy)
  }
}
