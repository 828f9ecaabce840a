package graft.maintenance

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core._
import graft.index.{IndexStore, Search, SegmentedIndex}

/** Maintenance invariants mirrored from the reference
  * (VectorIndexTest.java:124-170 vacuum flow + cooldown,
  * CompactionPlannerAndThrottlingTest.java:53-424 planner,
  * GidCompactionStabilityTest.java:52 gid stability). */
class MaintenanceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newIndex(metaName: String, cap: Int = 50): (SegmentedIndex, Maintenance) = {
    val dir = Files.createTempDirectory("graft-maint").toString
    val store = new IndexStore(dir)
    store.createOrOpen(IndexMeta(metaName, dimension = 4, maxSegmentSize = cap,
      pqM = 2, pqK = 4, graphDegree = 4, graphBuildBreadth = 16), 1000L)
    val idx = new SegmentedIndex(spark, store)
    (idx, new Maintenance(idx))
  }

  private def gaussianDf(n: Int, seed: Long) = {
    val r = new Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(4)(r.nextGaussian().toFloat)))
      .toDF("id", "embedding")
  }

  test("vacuum policy: ratio threshold and cooldown") {
    val maint = newIndex("mv1")._2
    val base = SegmentMeta(0, SegmentState.Sealed, 80, 20, 0L) // ratio 0.2
    assert(!maint.shouldVacuum(base, nowMs = 100000))
    val frag = base.copy(count = 70, deletedCount = 30) // ratio 0.3
    assert(maint.shouldVacuum(frag, nowMs = 100000))
    // cooldown: vacuumed recently → skip
    assert(!maint.shouldVacuum(frag.copy(lastVacuumAtMs = 90000), nowMs = 100000))
    assert(maint.shouldVacuum(frag.copy(lastVacuumAtMs = 30000), nowMs = 100000))
  }

  test("vacuum physically removes tombstones + codes + graph rows; counters update") {
    val (idx, maint) = newIndex("mv2", cap = 40)
    idx.addAll(gaussianDf(40, 1), "embedding", "id") // one full PENDING segment
    idx.sealPending()
    idx.delete((0L until 12L))
    val before = idx.manifest.segment(0).get
    assert(before.count == 28 && before.deletedCount == 12)

    val removed = maint.vacuumSegment(0, nowMs = 77777)
    assert(removed == 12)
    val after = idx.manifest.segment(0).get
    assert(after.count == 28 && after.deletedCount == 0 && after.lastVacuumAtMs == 77777)
    assert(idx.store.readVectors(spark).filter(col("segId") === 0).count() == 28)
    assert(idx.store.readCodes(spark).filter(col("segId") === 0).count() == 28)
    assert(idx.store.readGraph(spark).filter(col("segId") === 0).count() == 28)
    // dangling neighbor ids are tolerated: search still works and never
    // returns the vacuumed gids
    val queries = gaussianDf(3, 2).select(col("id").as("queryId"), col("embedding").as("qv"))
    val gids = Search.query(spark, idx.store, queries, 5).select("gid").as[Long].collect()
    assert(gids.nonEmpty && gids.forall(_ >= 12))
  }

  test("vacuum below ratio threshold is a no-op") {
    val (idx, maint) = newIndex("mv3", cap = 40)
    idx.addAll(gaussianDf(40, 3), "embedding", "id")
    idx.sealPending()
    idx.delete(Seq(0L)) // ratio 1/40 < 0.25
    assert(maint.vacuumSegment(0, nowMs = 1) == 0)
    assert(idx.store.readVectors(spark).filter(col("segId") === 0).count() == 40)
  }

  test("compaction planner: weights, budget, thresholds (reference formulas)") {
    val (idx, maint) = newIndex("mp1", cap = 100)
    // hand-build a manifest of sealed segments
    val m0 = idx.manifest
    val segs = List(
      SegmentMeta(0, SegmentState.Sealed, 10, 10, createdAtMs = 1000), // old, small, fragmented
      SegmentMeta(1, SegmentState.Sealed, 20, 10, createdAtMs = 2000),
      SegmentMeta(2, SegmentState.Sealed, 90, 0, createdAtMs = 9000), // big, fresh, clean
      SegmentMeta(3, SegmentState.Active, 5, 0, createdAtMs = 9500))
    idx.store.writeManifest(m0.copy(segments = segs, nextSegId = 4))

    val picked = maint.findCompactionCandidates(anchorSegId = 0)
    // segment 0 scores highest (anchor too); seg 1 next; budget 80 stops
    // before the huge fresh seg 2 is needed (10+20 < 80 → it tries 2, sum 120 ≥ 80)
    assert(picked.startsWith(Seq(0, 1)))
    assert(picked.size >= 2 && picked.size <= 8)

    // all-clean segments → avgFrag < 0.1 → no candidates
    idx.store.writeManifest(m0.copy(segments = segs.map(_.copy(deletedCount = 0)), nextSegId = 4))
    assert(maint.findCompactionCandidates(0).isEmpty)

    // fewer than minSegments sealed → none
    idx.store.writeManifest(m0.copy(segments = segs.take(1), nextSegId = 4))
    assert(maint.findCompactionCandidates(0).isEmpty)
  }

  test("compaction throttling: in-flight cap and non-SEALED candidates refused") {
    val (idx, maint) = newIndex("mp2", cap = 100)
    val m0 = idx.manifest
    idx.store.writeManifest(m0.copy(segments = List(
      SegmentMeta(0, SegmentState.Sealed, 10, 5, 1000),
      SegmentMeta(1, SegmentState.Compacting, 10, 5, 1000),
      SegmentMeta(2, SegmentState.Sealed, 10, 5, 1000)), nextSegId = 3))
    assert(maint.countInFlightCompactions == 1)
    assert(!maint.markCandidatesCompacting(Seq(0, 2))) // throttle: max 1 in flight
    idx.store.writeManifest(m0.copy(segments = List(
      SegmentMeta(0, SegmentState.Sealed, 10, 5, 1000),
      SegmentMeta(1, SegmentState.Sealed, 10, 5, 1000)), nextSegId = 2))
    assert(!maint.markCandidatesCompacting(Seq(0, 5))) // unknown segment
    assert(maint.markCandidatesCompacting(Seq(0, 1)))
    assert(idx.manifest.segments.forall(_.state == SegmentState.Compacting))
  }

  test("compaction merges live rows, keeps gids stable, swaps registry atomically") {
    val (idx, maint) = newIndex("mc1", cap = 30)
    idx.addAll(gaussianDf(60, 5), "embedding", "id") // segs 0,1 full PENDING
    idx.sealPending()
    idx.delete(Seq(3L, 4L, 33L, 34L, 35L))

    // exact-cap ingest already opened empty ACTIVE segment 2 → compaction
    // target is segment 3
    val newSeg = maint.compactSegments(Seq(0, 1), nowMs = 5555)
    assert(newSeg == 3)
    val m = idx.manifest
    assert(m.segment(0).isEmpty && m.segment(1).isEmpty)
    assert(m.segment(3).get.state == SegmentState.Sealed)
    assert(m.segment(3).get.count == 55)

    // gid stability: all surviving gids present exactly once in the new segment
    val rows = idx.store.readVectors(spark)
      .filter(col("segId") === 3).select("gid").as[Long].collect().sorted
    val expect = (0L until 60L).filterNot(Set(3L, 4L, 33L, 34L, 35L))
    assert(rows.toSeq == expect)

    // old partitions physically gone
    assert(!Files.exists(java.nio.file.Paths.get(s"${idx.store.vectorsDir}/segId=0")))

    // search works against the compacted segment and resolves gids
    val queries = gaussianDf(2, 6).select(col("id").as("queryId"), col("embedding").as("qv"))
    assert(Search.query(spark, idx.store, queries, 5).count() == 10)
    val resolved = idx.resolveIds(Seq(5L, 3L))
    assert(resolved(5L)._1 == 3 && resolved(3L) == (-1, -1))
  }

  test("sweep chains vacuum into compaction when a fragmented neighbor joins the set") {
    // the vec_knn_post_vacuum gate scenario at unit scale: seg 0 deleted
    // 2/3 (vacuumed → under-half anchor, frag resets to 0), seg 1 at 20%
    // deletion (below the vacuum ratio) supplies the picked set's
    // fragmentation, so ONE sweep reports both phases
    val (idx, maint) = newIndex("swp", cap = 50)
    idx.addAll(gaussianDf(150, 11), "embedding", "id") // segs 0,1,2 full
    idx.sealPending()
    idx.delete((0L until 50L).filter(_ % 3 != 0) ++ (50L until 100L).filter(_ % 5 == 0))
    val (vacuumed, compacted) = maint.sweep(nowMs = 999999L)
    assert(vacuumed == Seq(0))
    assert(compacted == 1)
    // the compacted segment holds seg 0+1 survivors, gids stable,
    // seg 1's tombstones dropped during the copy
    val m = idx.manifest
    val newSeg = m.segments.filter(_.state == SegmentState.Sealed)
      .filterNot(s => s.segId == 2).maxBy(_.segId)
    assert(newSeg.count == 17 + 40) // 50-33 deleted in seg0, 50-10 in seg1
    assert(newSeg.deletedCount == 0)
    assert(m.segment(0).isEmpty && m.segment(1).isEmpty) // sources dropped
  }

  test("maybeCompact end-to-end with policy gates") {
    val (idx, maint) = newIndex("mc2", cap = 30)
    idx.addAll(gaussianDf(60, 7), "embedding", "id")
    idx.sealPending()
    // below minFragmentation → refused
    assert(maint.maybeCompact(0, nowMs = 1) == -1)
    idx.delete((0L until 10L)) // frag 10/60 > 0.1
    val seg = maint.maybeCompact(0, nowMs = 2)
    assert(seg == 3)
    assert(idx.manifest.segment(3).get.count == 50)
  }

  test("vacuum of a fully-deleted segment drops its physical partitions") {
    val (idx, maint) = newIndex("mve1", cap = 40)
    idx.addAll(gaussianDf(40, 11), "embedding", "id")
    idx.sealPending()
    idx.delete((0L until 40L)) // everything tombstoned
    val removed = maint.vacuumSegment(0, nowMs = 5555, minDeletedRatio = 0.0)
    assert(removed == 40)
    // the nLive == 0 arm: dynamic overwrite writes nothing for an empty
    // partition, so the directories must be dropped directly
    val store = idx.store
    Seq(store.vectorsDir, store.codesDir, store.graphDir).foreach { d =>
      assert(!Files.exists(java.nio.file.Paths.get(s"$d/segId=0")),
        s"$d/segId=0 should be physically gone")
    }
    val after = idx.manifest.segment(0).get
    assert(after.deletedCount == 0 && after.lastVacuumAtMs == 5555)
    // the emptied index still answers queries (no dangling-scan crash)
    val q = Seq((0L, Array(0f, 0f, 0f, 0f))).toDF("queryId", "qv")
    assert(Search.query(spark, store, q, 5).count() == 0)
  }

  test("vacuumSegment threshold override gates in both directions") {
    val (idx, maint) = newIndex("mve2", cap = 40)
    idx.addAll(gaussianDf(40, 12), "embedding", "id")
    idx.sealPending()
    idx.delete((0L until 12L)) // ratio 0.3
    // explicit stricter override refuses (threshold arm, ratio < 0.5)
    assert(maint.vacuumSegment(0, nowMs = 1, minDeletedRatio = 0.5) == 0L)
    assert(idx.manifest.segment(0).get.deletedCount == 12)
    // default (-1) falls back to the policy ratio 0.25 and proceeds
    assert(maint.vacuumSegment(0, nowMs = 2) == 12L)
    assert(idx.manifest.segment(0).get.deletedCount == 0)
  }

  test("compaction scoring degenerate ranges: identical age and size score 0.5") {
    val (idx, maint) = newIndex("mce1", cap = 20)
    // two identical full segments sealed in one pass → ageRange == 0 and
    // countRange == 0; both degenerate arms must yield the 0.5 midpoint
    // and the planner must still produce a deterministic candidate set
    idx.addAll(gaussianDf(40, 13), "embedding", "id")
    idx.sealPending()
    idx.delete((0L until 6L)) // some fragmentation so the frag gate passes
    val candidates = maint.findCompactionCandidates(anchorSegId = 0)
    assert(candidates.nonEmpty && candidates.contains(0))
    assert(candidates == candidates.sorted.distinct ||
      candidates.toSet.subsetOf(Set(0, 1)))
  }
}
