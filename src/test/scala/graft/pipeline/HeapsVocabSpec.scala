package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Closed-form checks for [[TextAnalysis.heapsVocabCheckpoints]]. */
class HeapsVocabSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("hand-computed bigram vocabulary growth over two sources") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      // source A, doc order by id: new-bigram arrivals 1, 0, 1, 3
      (1L, "A", "a b"),
      (2L, "A", "a b"),
      (3L, "A", "b c"),
      (4L, "A", "c a x y"),
      // source B: a single doc; every checkpoint sees all of it
      (10L, "B", "p q p q"),
      // source C: only 1-token docs — zero bigrams at every checkpoint
      (20L, "C", "solo"),
      (21L, "C", "alone")
    ).toDF("doc_id", "source", "text")

    val out = TextAnalysis.heapsVocabCheckpoints(docs, "source", "doc_id", "text")
      .orderBy("source", "frac_pct")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    assert(out.filter(_._1 == "A").toSeq == Seq(
      ("A", 25L, 1L, 1L),   // {a b}
      ("A", 50L, 2L, 1L),   // duplicate doc adds nothing
      ("A", 75L, 3L, 2L),   // + {b c}
      ("A", 100L, 4L, 5L))) // + {c a, a x, x y}
    // "p q p q" → distinct bigrams {p q, q p}; ceil(1·frac) = 1 for all cuts
    assert(out.filter(_._1 == "B").toSeq == Seq(
      ("B", 25L, 1L, 2L), ("B", 50L, 1L, 2L),
      ("B", 75L, 1L, 2L), ("B", 100L, 1L, 2L)))
    // bigram-free source still reports its checkpoints, at vocab 0
    assert(out.filter(_._1 == "C").map(_._4).toSeq == Seq(0L, 0L, 0L, 0L))
  }

  test("vocab is non-decreasing in the checkpoint fraction (testdata)") {
    val out = TextAnalysis.heapsVocabCheckpoints(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "source", "doc_id", "text")
      .orderBy("source", "frac_pct").collect()
    out.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val vs = rows.map(_.getLong(3)).toSeq
      assert(vs == vs.sorted, s"source $src vocab curve not monotonic: $vs")
    }
  }
}
