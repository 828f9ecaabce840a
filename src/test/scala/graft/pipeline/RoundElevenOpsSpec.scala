package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-11 operator kernels. */
class RoundElevenOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(rows: (Long, String, String, String)*) =
    rows.toDF("doc_id", "text", "source", "lang")

  test("edit verify: a planted one-char deletion is found at its exact distance") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val df = corpus(
      (1L, base, "web", "en"),
      (2L, base.drop(1), "web", "en"), // one deletion
      (3L, "completely different text payload here", "web", "en"))
    val out = Dedup.editDistanceVerify(df, "doc_id", "text", "source", "lang",
      bucketChars = 64, prefixLen = 120, maxDistance = 5)
      .as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 2L, 1)))
  }

  test("edit verify: a pair straddling a bucket boundary is still found") {
    val base = "y" * 64 // bkt 1; the deletion lands in bkt 0
    val df = corpus(
      (1L, base, "web", "en"),
      (2L, base.drop(1), "web", "en"))
    val out = Dedup.editDistanceVerify(df, "doc_id", "text", "source", "lang")
      .as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 2L, 1)), "±1 bucket probe must catch the straddle")
  }

  test("edit verify: |Δlen| beyond maxDistance is skipped even with identical prefixes") {
    val shared = "x" * 128 // identical 120-char prefixes
    val df = corpus(
      (1L, shared, "web", "en"),
      (2L, shared + ("y" * 10), "web", "en")) // len 138, same 64-bucket (2)
    val out = Dedup.editDistanceVerify(df, "doc_id", "text", "source", "lang")
    assert(out.count() == 0, "length lower bound must prune the pair")
  }

  test("edit verify: blocks isolate sources/langs — no cross-block comparisons") {
    val t = "identical text in every row of this corpus fixture"
    val df = corpus(
      (1L, t, "web", "en"),
      (2L, t, "books", "en"), // other source
      (3L, t, "web", "fr"), // other lang
      (4L, t, "web", "en")) // only true pair partner for 1
    val out = Dedup.editDistanceVerify(df, "doc_id", "text", "source", "lang")
      .as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 4L, 0)))
  }

  test("epoch shuffle key: the affine modular map is a bijection per epoch") {
    // mirrors pipeline_epoch_shuffle's ordering key: with P prime and
    // multiplier not divisible by P, k is injective on [0, P)
    val p = 2147483647L
    (0 until 3).foreach { e =>
      val ids = (0L until 1000L)
      val keys = ids.map(id => (id * (48271L + 8191L * e) + 7919L * e) % p)
      assert(keys.distinct.size == ids.size, s"epoch $e collided")
    }
  }
}
