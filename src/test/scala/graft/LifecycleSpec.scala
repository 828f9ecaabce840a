package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.index.{IndexStore, Search, SegmentedIndex}
import graft.maintenance.Maintenance

/** The full §3.3 narrative in one test: ingest → seal → query → delete →
  * vacuum → compact → query again — results stay consistent at every
  * stage (the reference's delete/vacuum/compaction integration flow,
  * VectorIndexTest.java:124-169 + GidCompactionStabilityTest.java). */
class LifecycleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ingest → seal → delete → vacuum → compact → search, invariants at every step") {
    val dim = 8
    val dir = Files.createTempDirectory("graft-life").toString
    val store = new IndexStore(dir)
    store.createOrOpen(IndexMeta("life", dimension = dim, maxSegmentSize = 100,
      pqM = 4, pqK = 16, graphDegree = 16, graphBuildBreadth = 64), 0L)
    val idx = new SegmentedIndex(spark, store)
    val maint = new Maintenance(idx)

    val r = new Random(77)
    val data = (0 until 300).map(i => (i.toLong, Array.fill(dim)(r.nextGaussian().toFloat)))
    val df = data.toDF("id", "embedding").cache()

    // 1. ingest + seal: 3 full segments
    idx.addAll(df, "embedding", "id")
    idx.sealPending()
    assert(idx.manifest.segments.count(_.state == SegmentState.Sealed) == 3)

    def topGid(qid: Long): Long = {
      val q = df.filter(col("id") === qid)
        .select(col("id").as("queryId"), col("embedding").as("qv"))
      Search.query(spark, store, q, 1).select("gid").as[Long].head()
    }

    // 2. self-queries hit themselves through the sealed path
    Seq(5L, 150L, 299L).foreach(g => assert(topGid(g) == g))

    // 3. delete a block from segment 0 → hidden immediately
    idx.delete(0L until 30L)
    assert(topGid(5L) != 5L)
    assert(idx.manifest.segment(0).get.deletedCount == 30L)

    // 4. vacuum physically removes them; search still correct w/ danglers
    assert(maint.segmentsNeedingVacuum(1000000).contains(0))
    assert(maint.vacuumSegment(0, 1000000) == 30L)
    assert(store.readVectors(spark).filter(col("segId") === 0).count() == 70)
    assert(topGid(150L) == 150L)

    // 5. fragment another segment, compact the two smallest together
    idx.delete(100L until 130L)
    val picked = maint.findCompactionCandidates(anchorSegId = 0)
    assert(picked.nonEmpty)
    assert(maint.markCandidatesCompacting(picked))
    val newSeg = maint.compactSegments(picked, nowMs = 2000000)
    assert(newSeg >= 3)

    // 6. gids stable across the whole history; deleted ones stay gone
    val live = store.readVectors(spark).filter(!col("deleted"))
      .select("gid").as[Long].collect().toSet
    val expectLive = (0L until 300L).toSet -- (0L until 30L) -- (100L until 130L)
    assert(live == expectLive)
    assert(topGid(150L) == 150L && topGid(299L) == 299L)
    val resolved = idx.resolveIds(Seq(150L, 5L, 105L))
    assert(resolved(150L)._1 >= 0 && resolved(5L) == (-1, -1) && resolved(105L) == (-1, -1))

    // 7. the compacted index keeps answering with full quality
    val queries = df.filter(col("id") >= 200 && col("id") < 220)
      .select(col("id").as("queryId"), col("embedding").as("qv"))
    val hits = Search.query(spark, store, queries, 10)
      .filter(col("rank") === 1).select("queryId", "gid").as[(Long, Long)]
      .collect()
    assert(hits.length == 20 && hits.forall { case (q, g) => q == g })
  }

  test("delete auto-chains vacuum and compaction through the facade (reference queue chain)") {
    val dim = 8
    val dir = Files.createTempDirectory("graft-chain").toString
    val idx = graft.index.VectorIndex.createOrOpen(spark, dir,
      IndexMeta("chain", dimension = dim, maxSegmentSize = 100,
        pqM = 4, pqK = 16, graphDegree = 16, graphBuildBreadth = 64),
      policy = MaintenancePolicy(vacuumCooldownMs = 0))

    val r = new Random(42)
    val vecs = Array.fill(300)(Array.fill(dim)(r.nextGaussian().toFloat))
    idx.addAll(vecs)
    idx.awaitIndexingComplete()
    assert(idx.index.manifest.segments.count(_.state == SegmentState.Sealed) == 3)

    // one deleteAll call: seg0 loses 60 (ratio 0.6 → vacuum trips, 40 live
    // < cap/2 → compaction anchor), seg1 loses 20 (ratio 0.2 → stays
    // fragmented, making the picked set pass the min-fragmentation gate)
    idx.deleteAll((0L until 60L) ++ (100L until 120L))

    val m = idx.index.manifest
    // seg0 was vacuumed (auto) and then compacted away together with seg1
    assert(m.segment(0).isEmpty && m.segment(1).isEmpty)
    val compacted = m.segments.filter(s => s.segId >= 4 && s.state == SegmentState.Sealed)
    assert(compacted.map(_.count) == Seq(120L)) // 40 + 80 live rows merged
    assert(m.segment(2).exists(s => s.state == SegmentState.Sealed && s.count == 100L))

    // data layer agrees: tombstones physically gone, gids stable
    val live = idx.index.store.readVectors(spark).filter(!col("deleted"))
      .select("gid").as[Long].collect().toSet
    assert(live == (0L until 300L).toSet -- (0L until 60L) -- (100L until 120L))
    val res = idx.query(vecs(150), k = 1)
    assert(res.head.gid == 150L)
  }
}
