package graft.index

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core._
import graft.sources.VectorSources

/** Multi-index runner (T3) + vector source adapters (K7 interop). */
class GlobalRunnerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gaussianDf(n: Int, dim: Int, seed: Long) = {
    val r = new Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(r.nextGaussian().toFloat)))
      .toDF("id", "embedding")
  }

  test("global runner seals and reports across many indexes; barrier works") {
    val specs = (0 until 3).map { i =>
      val dir = Files.createTempDirectory(s"graft-multi$i").toString
      // per-index DATA params differ (dimension), ops template is shared
      dir -> IndexMeta(s"multi$i", dimension = 4 + 2 * i, maxSegmentSize = 30,
        pqM = 2, pqK = 4, graphDegree = 4, graphBuildBreadth = 16)
    }
    val runner = GlobalRunner.createAll(spark, specs, nowMs = 0L)
    runner.indexes.zipWithIndex.foreach { case (idx, i) =>
      idx.addAll(gaussianDf(60, 4 + 2 * i, i + 1), "embedding", "id")
    }
    assert(!runner.indexingComplete)
    val sealedCounts = runner.sealAll()
    assert(sealedCounts.values.forall(_ == 2)) // 60 rows / cap 30 → 2 PENDING each
    assert(runner.indexingComplete)
    // each index kept its own dimension (config-merge rule: data from meta)
    runner.indexes.zipWithIndex.foreach { case (idx, i) =>
      assert(idx.meta.dimension == 4 + 2 * i)
    }
  }

  test("sealAll sweeps indexes concurrently, results unchanged") {
    val specs = (0 until 2).map { i =>
      val dir = Files.createTempDirectory(s"graft-conc$i").toString
      dir -> IndexMeta(s"conc$i", dimension = 4, maxSegmentSize = 30,
        pqM = 2, pqK = 4, graphDegree = 4, graphBuildBreadth = 16)
    }
    // deterministic concurrency evidence: each per-index job blocks on a
    // 2-party barrier at start — only genuinely overlapping jobs release
    // it; a serial sweep times out here and fails
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val runner = new GlobalRunner(spark, specs.map(_._1),
      jobStartHook = _ => barrier.await(30, java.util.concurrent.TimeUnit.SECONDS))
    specs.foreach { case (path, meta) => new IndexStore(path).createOrOpen(meta, 0L) }
    runner.indexes.zipWithIndex.foreach { case (idx, i) =>
      idx.addAll(gaussianDf(60, 4, i + 1), "embedding", "id")
    }
    val sealedCounts = runner.sealAll()
    assert(sealedCounts.values.forall(_ == 2)) // 60 rows / cap 30 → 2 PENDING each
    assert(runner.indexingComplete)
    // sealed artifacts exist per index (same outcome as serial sweeps)
    runner.indexes.foreach { idx =>
      assert(idx.manifest.segments.count(_.state == SegmentState.Sealed) == 2)
    }
  }

  test("maintenance sweep vacuums fragmented segments across indexes") {
    val dir = Files.createTempDirectory("graft-multi-m").toString
    val meta = IndexMeta("mm", dimension = 4, maxSegmentSize = 40,
      pqM = 2, pqK = 4, graphDegree = 4, graphBuildBreadth = 16)
    val runner = GlobalRunner.createAll(spark, Seq(dir -> meta), nowMs = 0L)
    val idx = runner.indexes.head
    idx.addAll(gaussianDf(40, 4, 5), "embedding", "id")
    runner.sealAll()
    idx.delete(0L until 15L) // ratio 15/40 > 0.25
    val report = runner.maintainAll(nowMs = 999999)
    assert(report(dir)._1 == 1) // one segment vacuumed
    assert(idx.manifest.segment(0).get.deletedCount == 0)
  }

  test("packed-binary and delimited-string vectors round-trip into canonical form") {
    val df = gaussianDf(20, 8, 9)
    // pack → unpack round trip
    assert(VectorSources.roundTripCheck(df, "embedding") == 0)
    // delimited parse matches the original floats
    val asString = df.select(col("id"),
      concat_ws(";", col("embedding")).as("vector"))
    val parsed = asString.select(col("id"),
      VectorSources.parseDelimited(col("vector"), ";").as("embedding"))
    val orig = df.as[(Long, Array[Float])].collect().toMap
    parsed.as[(Long, Array[Float])].collect().foreach { case (id, v) =>
      val o = orig(id)
      assert(v.length == o.length)
      v.zip(o).foreach { case (a, b) => assert(math.abs(a - b) < 1e-4f) }
    }
    // packed import feeds ingest directly
    val packed = df.select(col("id"),
      VectorSources.packEmbedding(col("embedding")).as("blob"))
    val unpacked = packed.select(col("id"),
      VectorSources.unpackEmbedding(col("blob")).as("embedding"))
    val dir = Files.createTempDirectory("graft-import").toString
    val store = new IndexStore(dir)
    store.createOrOpen(IndexMeta("imp", dimension = 8, maxSegmentSize = 100,
      pqM = 2, pqK = 4, graphDegree = 4), 0L)
    val idx = new SegmentedIndex(spark, store)
    val m = idx.addAll(unpacked, "embedding", "id")
    assert(m.nextGid == 20L)
  }

  test("failed seal records attempt count + error in manifest; re-run seals idempotently") {
    val dir = Files.createTempDirectory("graft-retry").toString
    val store = new IndexStore(dir)
    store.createOrOpen(IndexMeta("retry", dimension = 4, maxSegmentSize = 30,
      pqM = 2, pqK = 4, graphDegree = 4, graphBuildBreadth = 16), 0L)
    val idx = new SegmentedIndex(spark, store)
    idx.addAll(gaussianDf(30, 4, 7), "embedding", "id") // exactly one PENDING
    // poison the PENDING segment with a wrong-dimension row written
    // BEHIND the ingest API (the executor-side build must fail)
    store.appendVectors(Seq(
      VectorRecord(0, 999, 999L, Array(1.0f, 2.0f), deleted = false,
        payload = Array.emptyByteArray)).toDS())
    intercept[Exception] { idx.sealPending() }
    val afterFail = idx.manifest.segment(0).get
    assert(afterFail.state == SegmentState.Pending) // no partial commit
    assert(afterFail.buildAttempts == 1)
    assert(afterFail.lastBuildError.nonEmpty)
    // repair: rewrite the segment partition without the poison row
    val good = store.readVectors(spark)
      .filter(r => r.segId == 0 && r.vecId != 999)
    store.overwriteVectorSegments(good)
    val m2 = idx.sealPending()
    val seg = m2.segment(0).get
    assert(seg.state == SegmentState.Sealed)
    assert(seg.buildAttempts == 2) // total tries, success included
    assert(seg.lastBuildError.isEmpty)
    // re-running the sweep is still a no-op barrier
    assert(idx.sealPending().segment(0).get.buildAttempts == 2)
  }

  test("pre-round-11 manifests without retry fields deserialize to zero-state") {
    val dir = Files.createTempDirectory("graft-compat").toString
    val store = new IndexStore(dir)
    store.createOrOpen(IndexMeta("compat", dimension = 4, maxSegmentSize = 30,
      pqM = 2, pqK = 4, graphDegree = 4), 0L)
    val p = java.nio.file.Paths.get(store.manifestPath)
    val stripped = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .replaceAll("""(?s),\s*"buildAttempts"\s*:\s*-?\d+""", "")
      .replaceAll("""(?s),\s*"lastBuildError"\s*:\s*"[^"]*"""", "")
    assert(!stripped.contains("buildAttempts"), "strip failed — field layout changed")
    java.nio.file.Files.write(p, stripped.getBytes("UTF-8"))
    val m = store.readManifest()
    val s = m.segments.head
    assert(s.buildAttempts == 0)
    assert(s.lastBuildError != null && s.lastBuildError.isEmpty)
  }
}
