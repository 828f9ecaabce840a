package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.index.SegmentedIndex

/** Open-session state carried between micro-batches by the streaming
  * sessionizer (one per active user). */
final case class SessionState(
    seq: Long, startMs: Long, lastMs: Long, n: Long, value: Double)

/** One closed session, matching the batch `rel_sessionize` row shape. */
final case class SessionOut(
    user_id: Long, session_id: Long, n_events: Long,
    session_start: String, session_value: Double)

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
   * Streaming exact dedup over a document stream: keep the FIRST arrival
   * of each normalized-content fingerprint, drop every later duplicate —
   * the streaming counterpart of `Dedup.exactDuplicates` for ingest-time
   * corpus hygiene (batch dedup picks a canonical survivor after the
   * fact; a stream must decide per event).
   *
   * State/scale story: `dropDuplicatesWithinWatermark` keys state on the
   * 128-bit fingerprint only (not the text) and evicts entries once the
   * watermark passes their event time + the deduplication horizon, so
   * state is bounded by the horizon's fingerprint cardinality, not by all
   * documents ever seen. Duplicates delivered farther apart than the
   * horizon pass through — the same bounded-memory trade every streaming
   * dedup makes; run the batch operator downstream for full-corpus
   * guarantees.
   *
   * `docs` columns: `textCol`, `ts` TIMESTAMP (event time); all other
   * columns (ids, payloads) ride through untouched on the survivors.
   */
  def streamingExactDedup(
      docs: DataFrame,
      textCol: String,
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .withColumn("fingerprint",
        graft.pipeline.TextAnalysis.contentFingerprint(col(textCol)))
      .dropDuplicatesWithinWatermark("fingerprint")

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

  private def fmtSessionStart(ms: Long, zone: String): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneId.of(zone))
      .format(java.time.Instant.ofEpochMilli(ms))

  /**
   * Streaming gap-based sessionization with CUSTOM STATE — the
   * `flatMapGroupsWithState` twin of the batch `rel_sessionize` window
   * query: per-user open-session state carried across micro-batches,
   * sessions closed either by an in-batch gap > `gapSec` or by an
   * event-time timeout once the watermark passes lastEvent + gap.
   * Emits the batch query's (user_id, session_id, n_events,
   * session_start, session_value) rows — same whole-second gap
   * comparison (`unix_timestamp` semantics), same session-time-zone
   * formatting, same 1-based per-user numbering — for event streams
   * delivered in watermark order. Late-but-above-watermark events merge
   * into the open session via min/max bounds; events older than the open
   * session's horizon (start − gap) are discarded like any
   * below-watermark data.
   *
   * Scale/state story: one tiny record per user. An idle user's record
   * is kept for `retentionSec` after its session closes (so numbering
   * stays cumulative across idle periods, like the batch query), then
   * evicted by a second event-time timeout — state is bounded by users
   * active within the retention horizon, not by all users ever seen.
   *
   * NUMBERING CONTRACT: batch parity of the 1-based per-user session_id
   * holds only within the retention horizon. Once eviction drops a user's
   * marker, a returning user restarts at session_id 1 — downstream joins
   * keyed on (user_id, session_id) must treat the horizon as a numbering
   * epoch (or make `retentionSec` as large as the pipeline's lifetime,
   * trading state bounded by ALL users ever seen for cumulative-forever
   * numbering; both are deliberate choices, pick per workload).
   *
   * `events` columns: user_id LONG, event_id LONG, ts TIMESTAMP,
   * value DOUBLE.
   */
  def sessionizeStream(
      events: DataFrame,
      gapSec: Long = 1800L,
      watermark: String = "30 minutes",
      retentionSec: Long = 30L * 24 * 3600): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val zone = spark.sessionState.conf.sessionLocalTimeZone
    val gapMs = gapSec * 1000

    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts"), col("value").cast("double"))
      .as[(Long, Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId, it, state: GroupState[SessionState]) =>
          // batch parity: unix_timestamp compares whole seconds
          def gapExceeded(aMs: Long, bMs: Long): Boolean =
            bMs / 1000 - aMs / 1000 > gapSec
          if (state.hasTimedOut) {
            val s = state.get
            if (s.n == 0L) {
              // numbering-retention horizon passed: evict entirely
              state.remove()
              Iterator.empty
            } else {
              // watermark passed lastEvent + gap: close the session; keep
              // an n=0 marker under a retention timeout so numbering
              // stays cumulative while the user plausibly returns
              state.update(s.copy(n = 0L, value = 0.0))
              state.setTimeoutTimestamp(
                math.max(s.lastMs + retentionSec * 1000, state.getCurrentWatermarkMs() + 1))
              Iterator.single(SessionOut(userId, s.seq, s.n, fmtSessionStart(s.startMs, zone), s.value))
            }
          } else {
            val sorted = it.toArray.sortBy { case (_, eid, ts, _) => (ts.getTime, eid) }
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var open = state.getOption
            sorted.foreach { case (_, _, ts, v) =>
              val ms = ts.getTime
              open match {
                case Some(s) if s.n == 0L => // closed-by-timeout marker
                  open = Some(SessionState(s.seq + 1, ms, ms, 1L, v))
                case Some(s) if !gapExceeded(s.lastMs, ms) && !gapExceeded(ms, s.startMs) =>
                  // in-gap (possibly out-of-order): widen the session
                  open = Some(s.copy(startMs = math.min(s.startMs, ms),
                    lastMs = math.max(s.lastMs, ms), n = s.n + 1, value = s.value + v))
                case Some(s) if gapExceeded(s.lastMs, ms) =>
                  // forward gap: close and start the next
                  closed += SessionOut(userId, s.seq, s.n, fmtSessionStart(s.startMs, zone), s.value)
                  open = Some(SessionState(s.seq + 1, ms, ms, 1L, v))
                case Some(_) =>
                  // older than the open session's horizon — below-watermark
                  // late data by construction; discard (watermark contract)
                  ()
                case None =>
                  open = Some(SessionState(1L, ms, ms, 1L, v))
              }
            }
            open.foreach { s =>
              if (s.n > 0L) {
                state.update(s)
                // never set a timeout at or below the current watermark
                state.setTimeoutTimestamp(
                  math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
              }
            }
            closed.iterator
          }
      }
  }
}
