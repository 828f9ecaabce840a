package graft.pipeline

import org.apache.spark.sql.functions.{col, md5}
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

  test("CDC chunks: contiguous exact cover, deterministic, one chunk when no gate fires") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val doc = (1 to 300).map(_ => s"w${rnd.nextInt(100000)}").mkString(" ")
    val rows = Chunker.cdcChunks(Seq((1L, doc)).toDF("doc_id", "text"),
        "doc_id", "text", avgTokens = 16)
      .orderBy(col("chunk_idx"))
      .select("chunk_idx", "start_tok", "n_toks").as[(Long, Long, Long)].collect()
    // exact disjoint cover of all 300 tokens, contiguous indices
    assert(rows.map(_._1).toSeq === rows.indices.map(_.toLong))
    assert(rows.head._2 === 0L && rows.map(_._3).sum === 300L)
    rows.sliding(2).foreach {
      case Array((_, s1, n1), (_, s2, _)) => assert(s2 === s1 + n1)
      case _ =>
    }
    assert(rows.length > 5, s"expected ~300/16 chunks, got ${rows.length}")
    // a doc whose tokens never fire the gate is a single chunk: pick
    // tokens verified gate-negative through the op itself
    val safe = (1 to 40).map(i => s"w$i").mkString(" ")
    val safeChunks = Chunker.cdcChunks(Seq((2L, safe)).toDF("doc_id", "text"),
      "doc_id", "text", avgTokens = 1000000000).count()
    assert(safeChunks === 1L)
  }

  test("CDC chunks are edit-stable: prepending a token preserves downstream fingerprints") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = (1 to 400).map(_ => s"w${rnd.nextInt(100000)}").mkString(" ")
    val edited = "PREPENDED " + base
    def fps(id: Long, text: String): Seq[String] =
      Chunker.cdcChunks(Seq((id, text)).toDF("doc_id", "text"),
          "doc_id", "text", avgTokens = 16)
        .orderBy(col("chunk_idx")).select("chunk_fp").as[String].collect().toSeq
    val a = fps(1L, base)
    val b = fps(2L, edited)
    // only the FIRST chunk (where the edit landed) may differ: if the
    // prepended token fires the gate itself, b = [new] ++ a (all of a
    // survives); otherwise b = [merged-first] ++ a.tail — either way
    // every later chunk keeps its fingerprint bit-for-bit
    assert(b.tail === a || b.tail === a.tail,
      "CDC: all chunks after the first must be unchanged by a prepend")
    assert(a.toSet.intersect(b.toSet).size >= a.size - 1)

    // the motivating contrast: fixed-width windows lose (nearly) all
    // fingerprints under the same one-token prepend
    def fixedFps(id: Long, text: String): Set[String] =
      Chunker.chunkTokens(Seq((id, text)).toDF("doc_id", "text"),
          "text", width = 16, stride = 16)
        .select(md5(col("chunk_text").cast("binary")).as("fp"))
        .as[String].collect().toSet
    val fa = fixedFps(1L, base)
    val fb = fixedFps(2L, edited)
    assert(fa.intersect(fb).size <= 1,
      "fixed windows should lose alignment under a prepend (else the CDC contrast is vacuous)")
  }
}
