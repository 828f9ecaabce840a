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
