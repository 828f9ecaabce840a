package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ChunkerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def chunk(texts: Seq[(Long, String)], width: Int, stride: Int) =
    Chunker.chunkTokens(texts.toDF("doc_id", "text"), "text", width, stride)
      .select("doc_id", "chunk_id", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("overlapping windows cover every token; last window may be short") {
    val doc = (1 to 10).map(i => s"t$i").mkString(" ")
    val got = chunk(Seq((1L, doc)), width = 4, stride = 3)
    assert(got === Seq(
      (1L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 1L, 4L, "t4 t5 t6 t7"),
      (1L, 2L, 4L, "t7 t8 t9 t10"),
      (1L, 3L, 1L, "t10")))
  }

  test("short doc yields one window; empty/null/whitespace docs yield none") {
    val got = chunk(Seq((1L, "a b"), (2L, ""), (3L, null), (4L, "   \t ")),
      width = 64, stride = 48)
    assert(got === Seq((1L, 0L, 2L, "a b")))
  }

  test("stride == width gives disjoint windows (no overlap)") {
    val doc = (1 to 6).map(i => s"w$i").mkString(" ")
    val got = chunk(Seq((9L, doc)), width = 3, stride = 3)
    assert(got === Seq(
      (9L, 0L, 3L, "w1 w2 w3"),
      (9L, 1L, 3L, "w4 w5 w6")))
    // disjoint cover: concatenation reassembles the doc
    assert(got.map(_._4).mkString(" ") === doc)
  }

  test("multi-whitespace runs tokenize like the oracle's regexp_split+filter") {
    val got = chunk(Seq((5L, "  a\t\tb \n c  ")), width = 2, stride = 2)
    assert(got === Seq((5L, 0L, 2L, "a b"), (5L, 1L, 1L, "c")))
  }
}
