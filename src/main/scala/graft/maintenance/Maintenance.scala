package graft.maintenance

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.functions._

import graft.core._
import graft.index.{IndexStore, SegmentedIndex}

/**
 * Maintenance operators (SURVEY.md §2.9 M2-M5): vacuum policy + execution,
 * weighted compaction planning, and gid-stable compaction with a
 * single-commit registry swap.
 *
 * The reference runs these as task-queue-driven background workers
 * (MaintenanceWorker.java); here they are deterministic batch jobs invoked
 * by the engine driver — same policy math, same invariants, no queue
 * infrastructure (SURVEY.md §2.10).
 */
final class Maintenance(
    val index: SegmentedIndex,
    val policy: MaintenancePolicy = MaintenancePolicy()) {

  private val spark = index.spark
  import spark.implicits._
  private def store: IndexStore = index.store

  // --- M2: vacuum policy ---------------------------------------------------

  /** Vacuum eligibility (reference: FdbVectorIndex.scheduleVacuumForSegment,
    * :552-608): deleted ratio ≥ threshold AND cooldown elapsed. */
  def shouldVacuum(sm: SegmentMeta, nowMs: Long): Boolean =
    Maintenance.shouldVacuum(policy, sm, nowMs)

  /** Segments the policy would schedule for vacuum now. */
  def segmentsNeedingVacuum(nowMs: Long): Seq[Int] =
    index.manifest.segments.filter(shouldVacuum(_, nowMs)).map(_.segId)

  // --- M3: vacuum execution ------------------------------------------------

  /**
   * Physically remove tombstoned rows of a segment plus their PQ codes and
   * adjacency rows (reference: MaintenanceService.vacuumSegment:88-126).
   * Other nodes' neighbor lists are deliberately NOT repaired — queries
   * tolerate dangling neighbor ids (reference: FdbVectorIndex.java:956-957;
   * SURVEY.md §7.4 item 6). Re-checks the ratio like the reference does.
   * Returns the number of physically removed rows.
   */
  def vacuumSegment(segId: Int, nowMs: Long, minDeletedRatio: Double = -1.0): Long = {
    val threshold = if (minDeletedRatio >= 0) minDeletedRatio else policy.vacuumMinDeletedRatio
    val m0 = index.manifest
    val sm = m0.segment(segId).getOrElse(return 0L)
    val total = sm.count + sm.deletedCount
    val ratio = if (total == 0) 0.0 else sm.deletedCount.toDouble / total
    if (threshold > 0.0 && ratio < threshold) return 0L

    val segVectors = store.readVectors(spark).filter(col("segId") === segId)
    val removed = segVectors.filter(col("deleted")).count()
    if (removed > 0) {
      // eager localCheckpoint: survivors must not lazily re-read the files
      // the overwrite below replaces
      val survivors = segVectors.filter(!col("deleted")).as[VectorRecord]
        .localCheckpoint(true)
      val nLive = survivors.count()
      if (nLive == 0) {
        // dynamic overwrite writes nothing for an empty partition — drop
        // the physical partitions directly
        Seq(store.vectorsDir, store.codesDir, store.graphDir)
          .foreach(dir => deleteRecursively(Paths.get(s"$dir/segId=$segId")))
      } else {
        store.overwriteVectorSegments(survivors)
        val liveIds = survivors.select(col("segId"), col("vecId"))
        val codes = store.readCodes(spark).filter(col("segId") === segId)
          .join(liveIds, Seq("segId", "vecId"), "left_semi")
          .as[graft.index.CodeRow]
        if (Files.exists(Paths.get(s"${store.codesDir}/segId=$segId"))) store.writeCodes(codes)
        val graph = store.readGraph(spark).filter(col("segId") === segId)
          .join(liveIds, Seq("segId", "vecId"), "left_semi")
          .as[graft.index.GraphRow]
        if (Files.exists(Paths.get(s"${store.graphDir}/segId=$segId"))) store.writeGraph(graph)
      }
    }
    val m1 = index.manifest
    val updated = m1.segment(segId).get.copy(
      deletedCount = math.max(0L, m1.segment(segId).get.deletedCount - removed),
      lastVacuumAtMs = nowMs)
    store.writeManifest(m1.withSegment(updated).copy(
      segments = m1.withSegment(updated).segments.sortBy(_.segId)))
    removed
  }

  /** Post-vacuum hook (reference: updateMetaAfterVacuum:182-217): a segment
    * at < maxSegmentSize/2 live rows suggests compaction-candidate search. */
  def suggestsCompaction(segId: Int): Boolean =
    index.manifest.segment(segId).exists(_.count < index.meta.maxSegmentSize / 2)

  // --- M5: compaction planning --------------------------------------------

  /** In-flight throttle: segments currently COMPACTING
    * (reference: countInFlightCompactions:532-557). */
  def countInFlightCompactions: Int =
    index.manifest.segments.count(_.state == SegmentState.Compacting)

  /**
   * Weighted compaction-candidate selection over SEALED segments
   * (reference: MaintenanceService.findCompactionCandidates:430-529):
   * composite = ageW·ageScore + sizeW·sizeScore + fragW·fragScore with
   * min-max normalized age (older=higher) and size (smaller=higher) and
   * fragScore = deleted/(live+deleted); degenerate ranges score 0.5;
   * greedy pick (anchor forced first) to the 80% fill budget, bounded by
   * [minSegments, maxSegments]; rejected if the picked set's average
   * fragmentation is below minFragmentation. Pure manifest math — runs on
   * the driver.
   */
  def findCompactionCandidates(anchorSegId: Int): Seq[Int] = {
    val sealedSegs = index.manifest.segments.filter(_.state == SegmentState.Sealed)
    if (sealedSegs.size < policy.compactionMinSegments) return Nil
    // the anchor must itself be a compactable SEALED segment — silently
    // proceeding without it would compact an unrelated set of healthy
    // segments whenever the caller anchors on an ACTIVE/vanished segment
    if (!sealedSegs.exists(_.segId == anchorSegId)) return Nil

    val minCreated = sealedSegs.map(_.createdAtMs).min
    val maxCreated = sealedSegs.map(_.createdAtMs).max
    val minCount = sealedSegs.map(_.count).min
    val maxCount = sealedSegs.map(_.count).max
    val ageRange = maxCreated - minCreated
    val countRange = maxCount - minCount

    val scoredDesc = sealedSegs.map { s =>
      val ageScore = if (ageRange == 0) 0.5 else (maxCreated - s.createdAtMs).toDouble / ageRange
      val sizeScore = if (countRange == 0) 0.5 else (maxCount - s.count).toDouble / countRange
      val tot = s.count + s.deletedCount
      val fragScore = if (tot == 0) 0.0 else s.deletedCount.toDouble / tot
      val composite = policy.compactionAgeWeight * ageScore +
        policy.compactionSizeWeight * sizeScore +
        policy.compactionFragWeight * fragScore
      (s, composite)
    }.sortBy(-_._2)

    val budget = math.max(1L, math.round(policy.compactionFillBudget * index.meta.maxSegmentSize))
    val pick = scala.collection.mutable.ArrayBuffer.empty[Int]
    var sum = 0L
    scoredDesc.find(_._1.segId == anchorSegId).foreach { case (s, _) =>
      pick += s.segId; sum += s.count
    }
    var done = false
    scoredDesc.foreach { case (s, _) =>
      if (!done && !pick.contains(s.segId)) {
        if (pick.size >= policy.compactionMaxSegments) done = true
        else {
          pick += s.segId
          sum += s.count
          if (sum >= budget) done = true
        }
      }
    }
    if (pick.size < policy.compactionMinSegments) return Nil
    if (policy.compactionMinFragmentation > 0.0) {
      val picked = sealedSegs.filter(s => pick.contains(s.segId))
      val live = picked.map(_.count).sum.toDouble
      val del = picked.map(_.deletedCount).sum.toDouble
      val avgFrag = if (live + del == 0) 0.0 else del / (live + del)
      if (avgFrag < policy.compactionMinFragmentation) return Nil
    }
    pick.toSeq
  }

  // --- M4: compaction execution -------------------------------------------

  /** Mark the candidate set COMPACTING in one commit (reference:
    * MaintenanceWorker.markCandidatesCompacting:120-155); COMPACTING
    * segments stay searchable via the sealed path. Returns false if the
    * throttle (maxConcurrentCompactions) is hit or a candidate is not
    * SEALED. */
  def markCandidatesCompacting(segIds: Seq[Int]): Boolean = {
    val m0 = index.manifest
    if (countInFlightCompactions >= policy.maxConcurrentCompactions) return false
    if (!segIds.forall(id => m0.segment(id).exists(_.state == SegmentState.Sealed))) return false
    store.writeManifest(m0.copy(segments = m0.segments.map { s =>
      if (segIds.contains(s.segId)) s.copy(state = SegmentState.Compacting) else s
    }))
    true
  }

  /**
   * Compact source segments into one new segment
   * (reference: MaintenanceService.compactSegments:248-417): reserve a new
   * WRITING segment (invisible to search), copy live vectors preserving
   * gids (stability invariant: GidCompactionStabilityTest.java:52), build
   * PQ+graph artifacts, then ONE manifest commit flips the new segment to
   * SEALED and drops the sources. Source ids are processed in sorted order
   * for idempotency (reference: FdbVectorIndex.requestCompaction:531-543).
   */
  def compactSegments(segIds: Seq[Int], nowMs: Long): Int = {
    val sources = segIds.distinct.sorted
    if (sources.isEmpty) return -1
    val m0 = index.manifest
    val newSegId = m0.nextSegId

    // 1) reserve WRITING segment — invisible to queries from this moment
    store.writeManifest(m0
      .withSegment(SegmentMeta(newSegId, SegmentState.Writing, 0L, 0L, nowMs))
      .copy(nextSegId = newSegId + 1))

    // 2) copy live rows with fresh dense vecIds, gids preserved
    val live = store.readVectors(spark)
      .filter(col("segId").isin(sources: _*))
      .filter(!col("deleted"))
      .as[VectorRecord]
    val ordered = live.orderBy(col("segId"), col("vecId")).as[VectorRecord]
    val copied = ordered.rdd.zipWithIndex.map { case (r, i) =>
      r.copy(segId = newSegId, vecId = i.toInt)
    }.toDS()
    store.appendVectors(copied)
    val n = copied.count()

    // 3) build artifacts while WRITING (idempotent, G4)
    index.buildArtifacts(Seq(newSegId))

    // 4) single-commit registry swap: new SEALED + sources gone
    val m1 = index.manifest
    val swapped = m1.copy(segments =
      m1.segments.filterNot(s => sources.contains(s.segId)).map { s =>
        if (s.segId == newSegId) s.copy(state = SegmentState.Sealed, count = n) else s
      })
    store.writeManifest(swapped)

    // 5) physical cleanup of dropped partitions (post-commit; the manifest
    // no longer references them)
    sources.foreach { sid =>
      Seq(store.vectorsDir, store.codesDir, store.graphDir, store.codebooksDir)
        .foreach(dir => deleteRecursively(Paths.get(s"$dir/segId=$sid")))
    }
    newSegId
  }

  /** Full policy-driven cycle for convenience/tests: plan around an anchor,
    * throttle-check, mark COMPACTING, compact. Returns the new segId or -1. */
  def maybeCompact(anchorSegId: Int, nowMs: Long): Int = {
    val cands = findCompactionCandidates(anchorSegId)
    if (cands.isEmpty) return -1
    if (!markCandidatesCompacting(cands)) return -1
    compactSegments(cands, nowMs)
  }

  /** One full maintenance sweep — the reference's delete → vacuum →
    * compaction chain (FdbVectorIndex.java:552-608 scheduleVacuum…;
    * MaintenanceService.java:200-216 post-vacuum hook): vacuum every
    * segment the policy trips, then compact anchored on the vacuumed
    * segments the hook left under half-full. Shared by the facade's
    * auto-chain and the global runner. Returns (vacuumed segIds,
    * compactions run). */
  def sweep(nowMs: Long): (Seq[Int], Int) = {
    val vacuumed = segmentsNeedingVacuum(nowMs)
      .filter(segId => vacuumSegment(segId, nowMs) > 0)
    val compacted = vacuumed.filter(suggestsCompaction).count { anchor =>
      maybeCompact(anchor, nowMs) >= 0
    }
    (vacuumed, compacted)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    }
}

object Maintenance {

  /** The M2 policy math, index-free so the driver gate can exercise the
    * SAME function the sweep uses (reference:
    * FdbVectorIndex.scheduleVacuumForSegment:552-608). */
  def shouldVacuum(policy: MaintenancePolicy, sm: SegmentMeta, nowMs: Long): Boolean = {
    val total = sm.count + sm.deletedCount
    val ratio = if (total == 0) 0.0 else sm.deletedCount.toDouble / total
    if (ratio < policy.vacuumMinDeletedRatio) false
    else if (policy.vacuumCooldownMs > 0 && sm.lastVacuumAtMs > 0 &&
      nowMs - sm.lastVacuumAtMs < policy.vacuumCooldownMs) false
    else true
  }
}
