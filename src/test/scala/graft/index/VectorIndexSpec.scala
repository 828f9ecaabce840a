package graft.index

import java.nio.file.Files

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core._

/** Facade parity with the reference's API shape (VectorIndex.java):
  * add → query hits itself; delete hides; payload round-trips. */
class VectorIndexSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("add / query / delete / resolveIds through the reference-shaped facade") {
    val dir = Files.createTempDirectory("graft-facade").toString
    val idx = VectorIndex.createOrOpen(spark, dir,
      IndexMeta("facade", dimension = 4, maxSegmentSize = 20,
        pqM = 2, pqK = 4, graphDegree = 4, graphBuildBreadth = 16))

    val r = new Random(13)
    val vecs = Array.fill(30)(Array.fill(4)(r.nextGaussian().toFloat))
    val payloads = vecs.indices.map(i => s"doc-$i".getBytes("UTF-8")).toArray
    val gids = idx.addAll(vecs, payloads)
    assert(gids == (0L until 30L))

    // single add continues the gid sequence
    val g30 = idx.add(Array(9f, 9f, 9f, 9f), "solo".getBytes("UTF-8"))
    assert(g30 == 30L)

    idx.awaitIndexingComplete() // seals the full segment (cap 20)

    // self-query: top hit is itself, payload round-trips, scores ordered
    val res = idx.query(vecs(5), k = 3)
    assert(res.head.gid == 5L)
    assert(new String(res.head.payload, "UTF-8") == "doc-5")
    assert(res.map(_.score) == res.map(_.score).sorted.reverse)
    assert(math.abs(res.head.score - (-res.head.distance)) < 1e-12) // L2 convention

    idx.delete(5L)
    val after = idx.query(vecs(5), k = 3)
    assert(!after.exists(_.gid == 5L))

    assert(idx.resolveIds(Seq(6L, 5L))(6L) == (0, 6))
    assert(idx.resolveIds(Seq(6L, 5L))(5L) == (-1, -1))
  }

  test("normalizeOnRead parity: COSINE scoring matches the fused kernel; zero vectors score 0") {
    // reference FdbVectorIndex.java:823-828,1006-1015: with normalizeOnRead
    // the rerank computes dot/(‖q‖·‖emb‖) with the reference's zero-product
    // guard — same result as the fused cosine kernel on normal-range
    // inputs (asserted here), and 0.0 (not NaN) on the all-zero vector.
    val dir = Files.createTempDirectory("graft-nor").toString
    val idx = VectorIndex.createOrOpen(spark, dir,
      IndexMeta("nor", dimension = 4, metric = Metric.Cosine.name, maxSegmentSize = 20,
        pqM = 2, pqK = 4, graphDegree = 4, graphBuildBreadth = 16))
    val r = new Random(7)
    val vecs = Array.fill(29)(Array.fill(4)(r.nextGaussian().toFloat)) :+ Array(0f, 0f, 0f, 0f)
    idx.addAll(vecs, vecs.indices.map(i => s"d$i".getBytes("UTF-8")).toArray)
    idx.awaitIndexingComplete()

    val q = vecs(3)
    val base = idx.query(q, k = 30)
    val nor = idx.query(q, k = 30,
      params = Some(SearchParams.defaults(30, 2).copy(normalizeOnRead = true)))
    assert(nor.map(r => (r.gid, r.score)) == base.map(r => (r.gid, r.score)))

    // zero query vector: every score 0.0 under the normalize-at-read guard
    val zq = idx.query(Array(0f, 0f, 0f, 0f), k = 5,
      params = Some(SearchParams.defaults(5, 2).copy(normalizeOnRead = true)))
    assert(zq.forall(_.score == 0.0))
  }
}
