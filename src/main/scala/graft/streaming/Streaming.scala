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
   */
  def continuousIngest(
      idx: SegmentedIndex,
      stream: DataFrame,
      embeddingCol: String,
      orderCol: String,
      sealEachBatch: Boolean = true): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          idx.addAll(batch, embeddingCol, orderCol)
          if (sealEachBatch) idx.sealPending()
        }
        ()
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
