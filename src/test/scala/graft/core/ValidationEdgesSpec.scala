package graft.core

import java.nio.file.Files

import org.apache.spark.SparkException
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.IndexStore
import graft.pipeline.{Ann, Multimodal}

/**
 * Negative-path falsifiers for the engine's defensive guards — the
 * branch-coverage backlog named in BASELINE.md §round-12: every
 * config-validation `require` in Types, the empty-store fallbacks in
 * IndexStore, the undecodable-payload guards in Multimodal, and the
 * empty-dataset / over-wide-code guards in Ann. A guard whose failing
 * edge is never exercised is a guard we can't trust to fire.
 */
class ValidationEdgesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // --- Metric ---------------------------------------------------------

  test("Metric.parse: known metrics case-insensitively, unknown throws") {
    assert(Metric.parse("l2") == Metric.L2)
    assert(Metric.parse("Cosine") == Metric.Cosine)
    val e = intercept[IllegalArgumentException] { Metric.parse("DOT") }
    assert(e.getMessage.contains("unknown metric"))
  }

  // --- IndexMeta: every failing require edge ---------------------------

  private def meta(dimension: Int = 8, pqM: Int = 2, pqK: Int = 16,
      maxSegmentSize: Int = 1000, graphDegree: Int = 8,
      graphBuildMode: String = GraphBuildMode.Auto) =
    IndexMeta("edges", dimension = dimension, pqM = pqM, pqK = pqK,
      maxSegmentSize = maxSegmentSize, graphDegree = graphDegree,
      graphBuildMode = graphBuildMode)

  test("IndexMeta rejects each invalid field (message names the field)") {
    assert(intercept[IllegalArgumentException] { meta(dimension = 0) }
      .getMessage.contains("dimension"))
    assert(intercept[IllegalArgumentException] { meta(dimension = -4) }
      .getMessage.contains("dimension"))
    assert(intercept[IllegalArgumentException] { meta(pqM = 0) }
      .getMessage.contains("pqM"))
    // pqM positive but not dividing dimension: the OTHER half of the &&
    assert(intercept[IllegalArgumentException] { meta(dimension = 8, pqM = 3) }
      .getMessage.contains("must divide"))
    assert(intercept[IllegalArgumentException] { meta(pqK = 0) }
      .getMessage.contains("pqK"))
    assert(intercept[IllegalArgumentException] { meta(pqK = 257) }
      .getMessage.contains("pqK"))
    assert(intercept[IllegalArgumentException] { meta(graphBuildMode = "HNSW") }
      .getMessage.contains("graphBuildMode"))
    assert(intercept[IllegalArgumentException] { meta(maxSegmentSize = 0) }
      .getMessage.contains("maxSegmentSize"))
    assert(meta(pqK = 256).pqK == 256) // boundary accepted
  }

  test("IndexMeta seal-memory budget: AUTO rejects, PARTITIONED lifts") {
    // dim 768 / degree 64 / pqM 16 → ~3.4 kB/row; 1M rows ≈ 3.4 GB > 2 GB
    def big(mode: String) = IndexMeta("big", dimension = 768, pqM = 16,
      pqK = 256, graphDegree = 64, maxSegmentSize = 1000000,
      graphBuildMode = mode)
    val e = intercept[IllegalArgumentException] { big(GraphBuildMode.Auto) }
    assert(e.getMessage.contains("per-task seal memory"))
    assert(big(GraphBuildMode.Partitioned).maxSegmentSize == 1000000)
  }

  // --- SegmentMeta ------------------------------------------------------

  test("SegmentMeta accepts every lifecycle state and rejects others") {
    SegmentState.all.foreach { s =>
      assert(SegmentMeta(0, s, 0L, 0L, 0L).state == s)
    }
    val e = intercept[IllegalArgumentException] {
      SegmentMeta(0, "FROZEN", 0L, 0L, 0L)
    }
    assert(e.getMessage.contains("invalid state"))
  }

  // --- IndexStore: empty-store fallbacks --------------------------------

  test("IndexStore on a fresh path: exists=false, all table reads empty") {
    val dir = Files.createTempDirectory("graft-empty-store").toString
    try {
      val store = new IndexStore(dir)
      assert(!store.exists)
      assert(store.readVectors(spark).count() == 0L)
      assert(store.readCodes(spark).count() == 0L)
      assert(store.readGraph(spark).count() == 0L)
      assert(store.readCodebooks(spark).count() == 0L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  // --- Multimodal: malformed payloads and invalid knobs ------------------

  private def garbageBlobs = {
    val s = spark
    import s.implicits._
    Seq(Multimodal.MediaBlob(7L, "image/png",
      Array[Byte](1, 2, 3, 4, 5), Multimodal.MediaMeta(0, 0, 0, 0L))).toDS()
  }

  test("Multimodal: undecodable payload fails the task loudly, not as NaN rows") {
    val e = intercept[SparkException] {
      Multimodal.decodeResizeStats(garbageBlobs, maxDim = 32).count()
    }
    assert(e.getMessage.contains("undecodable media payload") ||
      Option(e.getCause).exists(_.getMessage.contains("undecodable media payload")))
  }

  test("Multimodal: invalid knobs rejected at plan time (no job launched)") {
    assert(intercept[IllegalArgumentException] {
      Multimodal.decodeResizeStats(garbageBlobs, maxDim = 0)
    }.getMessage.contains("maxDim"))
    assert(intercept[IllegalArgumentException] {
      Multimodal.patchGridStats(garbageBlobs, grid = 0)
    }.getMessage.contains("grid"))
  }

  // --- Ann: empty training sets and over-wide codes ----------------------

  test("Ann training: empty dataset and pqK>256 guards fire") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "emb")
    assert(intercept[IllegalArgumentException] {
      Ann.trainIvf(spark, empty, "emb", "id", nlist = 4)
    }.getMessage.contains("empty"))
    assert(intercept[IllegalArgumentException] {
      Ann.trainIvfPq(spark, empty, "emb", "id", nlist = 4, pqM = 2, pqK = 512)
    }.getMessage.contains("one-byte code"))
  }
}
