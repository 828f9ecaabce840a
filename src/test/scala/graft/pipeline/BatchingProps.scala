package graft.pipeline

import scala.collection.mutable

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.TestSpark

/**
 * Randomized validation of the two subtlest round-8 equivalence claims —
 * the proofs are in the scaladocs, these are the falsifiers:
 *
 *  - the BATCHED BPE trainer emits exactly the sequence a textbook
 *    one-merge-per-round trainer produces, on adversarial corpora (tiny
 *    alphabet → constant symbol collisions, ties, self-merges, and
 *    concatenations that equal earlier merge results);
 *  - salted band-candidate generation emits exactly the plain
 *    self-join's pair set under aggressive caps.
 */
object BatchingProps extends Properties("graft-batching") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = TestSpark.spark

  /** Textbook sequential BPE over raw word occurrences (weight 1 each):
    * pair counts, argmax (count desc, then (l, r)), support >= 2,
    * leftmost-greedy merge application — no Spark, no batching. */
  private def localBpe(words: Seq[String], numMerges: Int): Seq[(String, String)] = {
    var vocab: Seq[Seq[String]] = words.map(w => Bpe.splitCodepoints(w))
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < numMerges && !done) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { syms =>
        var i = 0
        while (i + 1 < syms.length) {
          counts((syms(i), syms(i + 1))) += 1L
          i += 1
        }
      }
      val best = counts.toSeq
        .sortBy { case ((l, r), n) => (-n, l, r) }
        .headOption.filter(_._2 >= 2L)
      best match {
        case Some(((l, r), _)) =>
          merges += ((l, r))
          vocab = vocab.map(syms => Bpe.applyMerge(syms, l, r))
        case None => done = true
      }
    }
    merges.toSeq
  }

  // single lowercase words over a 2-letter alphabet: pretokenization is
  // the identity on them, and the tiny alphabet forces ties, shared
  // symbols and merged-string collisions — the batching guards' worst case
  private val wordGen: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))
  private val corpusGen: Gen[List[String]] =
    Gen.choose(5, 35).flatMap(n => Gen.listOfN(n, wordGen))

  property("batched Spark trainer == textbook sequential trainer") =
    forAll(corpusGen, Gen.choose(1, 6), Gen.choose(1, 5)) { (words, numMerges, batchN) =>
      import spark.implicits._
      val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text")
      val (got, rounds) =
        Bpe.learnMergesWithStats(spark, df, "text", numMerges, batchN = batchN)
      val want = localBpe(words, numMerges)
      // rounds: one per accepted batch, plus possibly a final empty round
      // that discovers the stop condition
      val ok = got == want && rounds <= want.length + 1
      if (!ok) println(s"MISMATCH words=$words numMerges=$numMerges batchN=$batchN" +
        s"\n  got =$got (rounds=$rounds)\n  want=$want")
      ok
    }

  private val bandedGen: Gen[List[(Int, Long, Long)]] =
    Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, for {
      band <- Gen.choose(0, 2)
      bucket <- Gen.choose(0L, 3L)
      doc <- Gen.choose(0L, 15L)
    } yield (band, bucket, doc)))

  property("salted band candidates == plain self-join pair set at any cap") =
    forAll(bandedGen, Gen.choose(1, 4)) { (rows, cap) =>
      import spark.implicits._
      val df = rows.toDF("band", "bandHash", "doc_id")
      val got = Dedup.bandCandidates(df, cap)
        .as[(Long, Long)].collect().toSet
      val want = (for {
        (ba, ha, a) <- rows
        (bb, hb, b) <- rows
        if ba == bb && ha == hb && a < b
      } yield (a, b)).toSet
      val ok = got == want
      if (!ok) println(s"MISMATCH cap=$cap rows=$rows\n  got=$got\n  want=$want")
      ok
    }
}
