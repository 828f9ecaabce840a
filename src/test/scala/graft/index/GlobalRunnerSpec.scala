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
}
