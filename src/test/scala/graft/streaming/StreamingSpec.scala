package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core._
import graft.index.{IndexStore, Search, SegmentedIndex}

/** Streaming ingest (T1/T4) and watermarked windowed aggregation. */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("foreachBatch ingest rotates, seals, and is immediately queryable") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val store = new IndexStore(dir)
    store.createOrOpen(IndexMeta("s1", dimension = 4, maxSegmentSize = 25,
      pqM = 2, pqK = 4, graphDegree = 4, graphBuildBreadth = 16), 0L)
    val idx = new SegmentedIndex(spark, store)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Float])]
    val r = new Random(2)
    val writer = Streaming.continuousIngest(
      idx, input.toDF().toDF("id", "embedding"), "embedding", "id")

    input.addData((0 until 30).map(i => (i.toLong, Array.fill(4)(r.nextGaussian().toFloat))))
    val q = writer.start()
    q.processAllAvailable()
    input.addData((30 until 60).map(i => (i.toLong, Array.fill(4)(r.nextGaussian().toFloat))))
    q.processAllAvailable()
    q.stop()

    val m = idx.manifest
    assert(m.nextGid == 60L)
    // cap 25: segments 0,1 sealed; segment 2 holds the tail
    assert(m.segment(0).get.state == SegmentState.Sealed)
    assert(m.segment(1).get.state == SegmentState.Sealed)
    assert(m.segments.map(_.count).sum == 60L)

    val queries = Seq((0L, m)).toDF().limit(0) // placeholder never used
    val qdf = idx.store.readVectors(spark).filter(col("gid") === 7)
      .select(col("gid").as("queryId"), col("embedding").as("qv"))
    val top = Search.query(spark, store, qdf, 1).select("gid").as[Long].head()
    assert(top == 7L) // self-query hits itself through the sealed path
  }

  test("micro-batch replay after failure is idempotent (no double ingest)") {
    val dir = Files.createTempDirectory("graft-replay").toString
    val store = new IndexStore(dir)
    store.createOrOpen(IndexMeta("rp", dimension = 4, maxSegmentSize = 100,
      pqM = 2, pqK = 4, graphDegree = 4, graphBuildBreadth = 16), 0L)
    val idx = new SegmentedIndex(spark, store)
    val r = new Random(6)
    val batch = (0 until 20).map(i => (i.toLong, Array.fill(4)(r.nextGaussian().toFloat)))
      .toDF("id", "embedding")

    Streaming.ingestBatch(idx, batch, batchId = 0, "embedding", "id", sealEachBatch = false)
    assert(idx.manifest.nextGid == 20L)
    // the streaming runtime redelivers batch 0 after a simulated failure
    Streaming.ingestBatch(idx, batch, batchId = 0, "embedding", "id", sealEachBatch = false)
    assert(idx.manifest.nextGid == 20L) // skipped, not duplicated
    // the next batch proceeds normally
    Streaming.ingestBatch(idx, batch, batchId = 1, "embedding", "id", sealEachBatch = false)
    assert(idx.manifest.nextGid == 40L)
    assert(idx.manifest.lastStreamBatchId.contains(1L))
  }

  test("flatMapGroupsWithState sessionization: in-batch gaps, cross-batch state, event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Timestamp, Double)]
    val sess = Streaming.sessionizeStream(
      input.toDF().toDF("user_id", "event_id", "ts", "value"))
    val q = sess.toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_out").start()

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    def emitted() = spark.table("sess_out").as[SessionOut].collect().toSet

    // user 1: {10:00, 10:10} then 11:00 (50-min gap closes session 1
    // IN-batch); user 2: one event, stays open
    input.addData((1L, 1L, ts(10, 0), 1.0), (1L, 2L, ts(10, 10), 2.0),
      (1L, 3L, ts(11, 0), 4.0), (2L, 4L, ts(10, 0), 7.0))
    q.processAllAvailable()
    assert(emitted() == Set(SessionOut(1L, 1L, 2L, "2026-01-01 10:00:00", 3.0)))

    // 15:00 closes user 1's session 2 by gap; the advanced watermark
    // (14:30) then times out user 2's idle session
    input.addData((1L, 5L, ts(15, 0), 9.0))
    q.processAllAvailable()
    // 20:00 closes user 1's session 3; numbering stays cumulative
    input.addData((1L, 6L, ts(20, 0), 1.0))
    q.processAllAvailable()

    assert(emitted() == Set(
      SessionOut(1L, 1L, 2L, "2026-01-01 10:00:00", 3.0),
      SessionOut(1L, 2L, 1L, "2026-01-01 11:00:00", 4.0),
      SessionOut(2L, 1L, 1L, "2026-01-01 10:00:00", 7.0),
      SessionOut(1L, 3L, 1L, "2026-01-01 15:00:00", 9.0)))
    // user 1's session 4 (20:00) is still open — not emitted
    q.stop()
  }

  test("sessionization merges late-but-above-watermark events delivered in later micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Timestamp, Double)]
    val sess = Streaming.sessionizeStream(
      input.toDF().toDF("user_id", "event_id", "ts", "value"))
    val q = sess.toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_ooo").start()

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    def emitted() = spark.table("sess_ooo").as[SessionOut].collect().toSet

    // batch 1: open session [10:00, 10:20]; watermark advances to 09:50
    input.addData((7L, 1L, ts(10, 0), 1.0), (7L, 2L, ts(10, 20), 2.0))
    q.processAllAvailable()
    assert(emitted().isEmpty)

    // batch 2: late but above-watermark arrivals — 09:55 is EARLIER than
    // the open session's start (widens it backwards), 10:10 fills the
    // middle; both must merge instead of opening a phantom session
    input.addData((7L, 3L, ts(9, 55), 4.0), (7L, 4L, ts(10, 10), 8.0))
    q.processAllAvailable()
    assert(emitted().isEmpty)

    // batch 3: 13:00 exceeds the gap → session 1 closes with the merged
    // bounds and all four values
    input.addData((7L, 5L, ts(13, 0), 16.0))
    q.processAllAvailable()
    val streamed = emitted()
    assert(streamed == Set(SessionOut(7L, 1L, 4L, "2026-01-01 09:55:00", 15.0)))
    q.stop()

    // batch parity: the same five events through the batch lag-window
    // recipe (rel_sessionize) produce the identical closed-session row
    val batch = Seq(
      (7L, 1L, ts(10, 0), 1.0), (7L, 2L, ts(10, 20), 2.0),
      (7L, 3L, ts(9, 55), 4.0), (7L, 4L, ts(10, 10), 8.0),
      (7L, 5L, ts(13, 0), 16.0)).toDF("user_id", "event_id", "ts", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batchSessions = batch
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        sum(col("value")).as("session_value"))
      .as[SessionOut].collect().toSet
    // session 2 (13:00) is still open in the stream — compare the closed one
    assert(batchSessions.filter(_.session_id == 1L) == streamed)
  }

  test("streaming exact dedup keeps first arrivals, drops cross-batch duplicates within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val deduped = Streaming.streamingExactDedup(
      input.toDF().toDF("doc_id", "text", "ts"), "text")
    val q = deduped.select(col("doc_id")).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_stream").start()

    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    def kept() = spark.table("dedup_stream").as[Long].collect().toSet

    // batch 1: two distinct docs + an in-batch duplicate (same text,
    // different whitespace/case — the normalized fingerprint matches)
    input.addData((1L, "Alpha beta gamma", ts(0)), (2L, "delta epsilon", ts(1)),
      (3L, "alpha  BETA gamma", ts(2)))
    q.processAllAvailable()
    assert(kept() == Set(1L, 2L))

    // batch 2: a cross-batch duplicate of doc 1 within the horizon is
    // dropped; a genuinely new doc passes
    input.addData((4L, "ALPHA beta GAMMA", ts(5)), (5L, "zeta eta theta", ts(6)))
    q.processAllAvailable()
    assert(kept() == Set(1L, 2L, 5L))
    q.stop()
  }

  test("watermarked tumbling-window aggregation over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = Streaming.windowedEventCounts(
      input.toDF().toDF("ts", "event_type", "value"),
      windowLength = "1 hour", watermark = "30 minutes")
    val q = agg.writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("ev_agg").start()

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    input.addData(
      (ts(10, 5), "click", 1.0), (ts(10, 40), "click", 2.0),
      (ts(10, 50), "view", 5.0), (ts(11, 10), "click", 4.0))
    q.processAllAvailable()

    val rows = spark.table("ev_agg")
      .select(col("window_start").cast("string"), col("event_type"), col("n_events"), col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(rows.contains(("2026-01-01 10:00:00", "click", 2L, 3.0)))
    assert(rows.contains(("2026-01-01 10:00:00", "view", 1L, 5.0)))
    assert(rows.contains(("2026-01-01 11:00:00", "click", 1L, 4.0)))
    q.stop()
  }
}
