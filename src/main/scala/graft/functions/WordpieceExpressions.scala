package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ARRAY<STRING> greedy longest-match-first subword pieces of a single
  * word (the public WordPiece inference rule): at each position take the
  * longest vocabulary piece (≤ `maxPieceLen`) that prefixes the
  * remaining suffix; the vocabulary is a literal (constructor) set, so
  * the whole encode is one narrow expression with no join. Throws on an
  * uncoverable position rather than emitting a silent UNK — the
  * vocabulary builder guarantees single-char coverage, so a miss is a
  * builder/encoder contract violation worth failing loudly on. */
case class GreedyPiecesExpr(child: Expression, vocab: Seq[String], maxPieceLen: Int)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "greedy_pieces"

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var pos = 0
    while (pos < word.length) {
      var take = math.min(maxPieceLen, word.length - pos)
      var hit: String = null
      while (take >= 1 && hit == null) {
        val cand = word.substring(pos, pos + take)
        if (vocabSet.contains(cand)) hit = cand else take -= 1
      }
      require(hit != null,
        s"greedy_pieces: position $pos of '$word' not covered by the vocabulary")
      out += UTF8String.fromString(hit)
      pos += hit.length
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ARRAY<STRING> minimal-cost segmentation of a word under literal
  * integer piece costs — unigram-LM/SentencePiece-style Viterbi with
  * exact arithmetic: dynamic program over positions minimizing the
  * composite (Σ cost, piece count, rendered string) lexicographically.
  * The string component only breaks exact (cost, n) ties, where both
  * renderings have equal length, so prefix-optimality holds and the DP
  * is globally optimal AND fully deterministic — which is what lets a
  * SQL oracle replay it stage for stage. */
case class ViterbiPiecesExpr(child: Expression, vocab: Seq[(String, Long)], maxPieceLen: Int)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val costOf: java.util.HashMap[String, Long] = {
    val m = new java.util.HashMap[String, Long](vocab.size * 2)
    vocab.foreach { case (p, c) => m.put(p, c) }
    m
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "viterbi_pieces"

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    val n = word.length
    // dp(i) = best (cost, pieces, rendered) for the length-i prefix
    val dp = new Array[(Long, List[String], String)](n + 1)
    dp(0) = (0L, Nil, "")
    var i = 1
    while (i <= n) {
      var best: (Long, List[String], String) = null
      var l = 1
      while (l <= math.min(maxPieceLen, i)) {
        val prev = dp(i - l)
        if (prev != null) {
          val piece = word.substring(i - l, i)
          val c = costOf.get(piece)
          if (costOf.containsKey(piece)) {
            val cand = (prev._1 + c, piece :: prev._2,
              if (prev._3.isEmpty) piece else prev._3 + "|" + piece)
            if (best == null ||
                cand._1 < best._1 ||
                (cand._1 == best._1 && (cand._2.length < best._2.length ||
                  (cand._2.length == best._2.length && cand._3.compareTo(best._3) < 0))))
              best = cand
          }
        }
        l += 1
      }
      dp(i) = best
      i += 1
    }
    require(dp(n) != null,
      s"viterbi_pieces: '$word' not segmentable under the vocabulary")
    new GenericArrayData(dp(n)._2.reverse.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
