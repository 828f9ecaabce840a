package graft.pipeline

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.TestSpark

/** Falsifier for the greedy longest-match encoder: arbitrary lowercase
  * words against arbitrary vocabularies (single-char coverage
  * guaranteed, random multi-char pieces) must reproduce an independent
  * straightforward reference implementation — through the actual Spark
  * expression, not a scalar shortcut. */
object WordpieceProps extends Properties("graft-wordpiece") {

  private lazy val spark = TestSpark.spark

  private def referenceGreedy(word: String, vocab: Set[String], maxLen: Int): List[String] = {
    var pos = 0
    val out = scala.collection.mutable.ListBuffer.empty[String]
    while (pos < word.length) {
      val take = (math.min(maxLen, word.length - pos) to 1 by -1)
        .map(l => word.substring(pos, pos + l))
        .find(vocab.contains)
        .getOrElse(sys.error(s"uncovered position $pos in $word"))
      out += take
      pos += take.length
    }
    out.toList
  }

  private val wordGen: Gen[String] =
    Gen.chooseNum(1, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))

  /** Independent reference Viterbi: brute-force enumerate ALL
    * segmentations (words ≤ 14 chars, pieces ≤ 4 — bounded) and pick
    * the composite-minimal one. Falsifies both the DP recurrence and
    * the tie-break order. */
  private def referenceViterbi(
      word: String, costs: Map[String, Long], maxLen: Int): (Long, Int, String) = {
    def segs(pos: Int): List[List[String]] =
      if (pos == word.length) List(Nil)
      else (1 to math.min(maxLen, word.length - pos)).toList.flatMap { l =>
        val p = word.substring(pos, pos + l)
        if (costs.contains(p)) segs(pos + l).map(p :: _) else Nil
      }
    segs(0).map { pieces =>
      (pieces.map(costs).sum, pieces.length, pieces.mkString("|"))
    }.min
  }

  property("viterbi_pieces == brute-force minimal segmentation for random vocab costs") =
    forAll(Gen.nonEmptyListOf(wordGen), Gen.listOf(wordGen.map(_.take(4))), Gen.long) {
      (words, extraPieces, seed) =>
        import spark.implicits._
        import org.apache.spark.sql.functions.col
        val rnd = new scala.util.Random(seed)
        val pieces = (Seq("a", "b", "c", "d") ++ extraPieces).distinct
        val vocab = pieces.map(p => p -> (1L + rnd.nextInt(50)))
        val got = Wordpiece.encodeWordsViterbi(
            words.distinct.toDF("word"), "word", vocab, maxPieceLen = 4)
          .select(col("word"), col("total_cost"), col("n_pieces"), col("pieces_str"))
          .as[(String, Long, Long, String)].collect()
          .map(r => r._1 -> ((r._2, r._3.toInt, r._4))).toMap
        val costMap = vocab.toMap
        words.distinct.forall(w => got(w) == referenceViterbi(w, costMap, 4))
    }

  property("greedy_pieces == independent reference for random words and vocabs") =
    forAll(Gen.nonEmptyListOf(wordGen), Gen.listOf(wordGen.map(_.take(4)))) {
      (words, extraPieces) =>
        import spark.implicits._
        import org.apache.spark.sql.functions.col
        // coverage guarantee: all single chars of the alphabet
        val vocab = (Seq("a", "b", "c", "d") ++ extraPieces).distinct
        val got = Wordpiece.encodeWords(
            words.distinct.toDF("word"), "word", vocab, maxPieceLen = 4)
          .select(col("word"), col("pieces_str"))
          .as[(String, String)].collect().toMap
        words.distinct.forall { w =>
          got(w) == referenceGreedy(w, vocab.toSet, 4).mkString("|")
        }
    }
}
