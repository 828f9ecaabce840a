package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery}
import org.apache.spark.sql.Row

import graft.index.SegmentedIndex

/**
 * Streaming execution (SURVEY.md §2.10): the reference's task-queue-driven
 * background machinery (SegmentBuildWorkerPool.java:38-73) maps to
 * Structured Streaming `foreachBatch` — each micro-batch is one
 * addAll + seal cycle, with the manifest commit as the exactly-once
 * boundary (the batch job is idempotent per G4, so replays are safe).
 *
 * Event-time analytics (not present in the reference — Catalyst/streaming
 * gives them for free) use watermarked tumbling windows.
 */
object Streaming {

  /**
   * Continuous vector ingest (T1): every micro-batch appends to the index
   * with strict-cap rotation; full segments seal inline (the "build
   * worker"). `awaitIndexingComplete` (T4) ≙ processAllAvailable.
   *
   * Replay safety: the manifest records the highest ingested batch id, so
   * a micro-batch redelivered after a failure (Structured Streaming's
   * at-least-once foreachBatch contract) is skipped instead of
   * double-ingested.
   */
  def continuousIngest(
      idx: SegmentedIndex,
      stream: DataFrame,
      embeddingCol: String,
      orderCol: String,
      sealEachBatch: Boolean = true): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(idx, batch, batchId, embeddingCol, orderCol, sealEachBatch)
      }

  /** One micro-batch of the continuous ingest — public so replay behavior
    * is directly testable. Skips batches at or below the recorded
    * high-water batch id. */
  def ingestBatch(
      idx: SegmentedIndex,
      batch: DataFrame,
      batchId: Long,
      embeddingCol: String,
      orderCol: String,
      sealEachBatch: Boolean): Unit = {
    val seen = idx.manifest.lastStreamBatchId.getOrElse(-1L)
    if (batchId <= seen || batch.isEmpty) return
    idx.addAll(batch, embeddingCol, orderCol)
    if (sealEachBatch) idx.sealPending()
    val m = idx.manifest
    idx.store.writeManifest(m.copy(lastStreamBatchId = Some(batchId)))
  }

  /** Watermarked tumbling-window event aggregation — the streaming twin of
    * the batch `rel_events_hourly` query. */
  def windowedEventCounts(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Convenience: run a memory-sink query to completion and return it. */
  def runToCompletion(writer: DataStreamWriter[Row]): StreamingQuery = {
    val q = writer.start()
    q.processAllAvailable()
    q
  }
}
