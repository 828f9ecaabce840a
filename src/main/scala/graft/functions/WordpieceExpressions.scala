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
