package graft.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

import graft.index.SegmentSearch.PhaseSink

/**
 * Engine observability (reference: util/Metrics.java:20-45 publishes OTel
 * histograms for per-phase query timings; FdbVectorIndex.java:99-116
 * records adcScanMs / graphTraversalMs / rerankMs around each phase).
 *
 * Spark re-expression: per-phase work inside executor tasks is aggregated
 * through `LongAccumulator`s (visible in the Spark UI and to the driver
 * after each job), and the declarative stages (rerank, merge) report row
 * counts through `Dataset.observe` metrics readable from any
 * `QueryExecutionListener` — the idiomatic Spark monitoring hooks, no
 * bespoke metrics plumbing.
 */
final class EngineMetrics private[util] (
    /** Nanoseconds spent ADC-scanning codes (LUT build + table scan). */
    val adcScanNanos: LongAccumulator,
    /** Nanoseconds spent in graph expansion (best-first / beam). */
    val graphTraversalNanos: LongAccumulator,
    /** Approximate candidates emitted by sealed-segment searches. */
    val sealedCandidates: LongAccumulator,
    /** (query, sealed segment) search invocations. */
    val sealedSegmentsSearched: LongAccumulator) extends Serializable {

  /** Bridge into the per-(query, segment) kernel. */
  def phaseSink: PhaseSink = new EngineMetrics.AccumulatorSink(this)
}

object EngineMetrics {

  // weak keys: metrics of stopped/discarded sessions become collectable
  // instead of accumulating in a JVM that cycles SparkSessions
  private val perSession =
    new java.util.WeakHashMap[SparkSession, EngineMetrics]()

  /** The engine metrics of a session (created on first use; accumulators
    * are registered once and aggregate across all queries of the session,
    * like the reference's process-wide meters). */
  def forSession(spark: SparkSession): EngineMetrics = perSession.synchronized {
    var em = perSession.get(spark)
    if (em == null) {
      em = new EngineMetrics(
        spark.sparkContext.longAccumulator("graft.query.adcScanNanos"),
        spark.sparkContext.longAccumulator("graft.query.graphTraversalNanos"),
        spark.sparkContext.longAccumulator("graft.query.sealedCandidates"),
        spark.sparkContext.longAccumulator("graft.query.sealedSegmentsSearched"))
      perSession.put(spark, em)
    }
    em
  }

  private final class AccumulatorSink(em: EngineMetrics) extends PhaseSink {
    override def adcScan(nanos: Long): Unit = em.adcScanNanos.add(nanos)
    override def traversal(nanos: Long): Unit = em.graphTraversalNanos.add(nanos)
    override def candidates(n: Int): Unit = {
      em.sealedCandidates.add(n.toLong)
      em.sealedSegmentsSearched.add(1L)
    }
  }
}
