package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GreedyPiecesExpr, ViterbiPiecesExpr}
import org.apache.spark.sql.graft.SparkShims

/**
 * WordPiece-style subword tokenizer — the second tokenizer family next
 * to [[Bpe]] (Sennrich merges): frequency-built piece vocabulary +
 * greedy longest-match-first encoding (the public WordPiece inference
 * rule; the `##` continuation marker is a documented simplification
 * away). Everything is exact strings and integers — no probabilities —
 * so BOTH stages are value-oracled: the vocabulary by a substring-count
 * replay, the encoder by a recursive-CTE greedy walk in DuckDB.
 *
 * Scale shape: vocabulary counting aggregates tokens to
 * (word, n) FIRST and explodes substrings of DISTINCT words weighted by
 * n — corpus bytes are touched once, the substring fan-out runs on the
 * (much smaller) vocabulary of distinct words. Encoding is one narrow
 * map with a broadcast-literal vocabulary (a few KB), linear at any
 * corpus size.
 */
object Wordpiece {

  /** Piece vocabulary: every single character of the corpus (coverage
    * guarantee — greedy matching can always consume one char) plus the
    * `topV` most frequent multi-char substrings of length 2..`maxPieceLen`,
    * ranked by (occurrence count DESC, piece ASC). Occurrences are
    * weighted by word frequency: every position of every token instance
    * counts once. */
  def buildVocab(
      docs: DataFrame,
      textCol: String,
      maxPieceLen: Int = 4,
      topV: Int = 400): DataFrame = {
    val words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    // substrings of distinct words, weighted by the word's frequency
    val subs = words
      .select(col("word"), col("n"), explode(sequence(lit(1), length(col("word")))).as("pos"))
      .select(col("word"), col("n"), col("pos"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("plen"))
      .filter(col("pos") + col("plen") - 1 <= length(col("word")))
      .select(expr("substring(word, pos, plen)").as("piece"), col("n"), col("plen"))
    val counts = subs.groupBy(col("piece"), col("plen"))
      .agg(sum(col("n")).as("occ"))
    val chars = counts.filter(col("plen") === 1).select(col("piece"))
    val w = Window.orderBy(col("occ").desc, col("piece"))
    val multi = counts.filter(col("plen") >= 2)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topV)
      .select(col("piece"))
    chars.unionByName(multi).distinct()
  }

  /** [[buildVocab]] plus an integer COST per piece: its rank under
    * (occurrence DESC, piece ASC) across the whole trimmed vocabulary —
    * the exact-arithmetic stand-in for a unigram-LM negative log-prob
    * (frequent pieces are cheap). Feeds the Viterbi segmenter. */
  def buildVocabWithCosts(
      docs: DataFrame,
      textCol: String,
      maxPieceLen: Int = 4,
      topV: Int = 400): DataFrame = {
    val words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    val subs = words
      .select(col("word"), col("n"), explode(sequence(lit(1), length(col("word")))).as("pos"))
      .select(col("word"), col("n"), col("pos"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("plen"))
      .filter(col("pos") + col("plen") - 1 <= length(col("word")))
      .select(expr("substring(word, pos, plen)").as("piece"), col("n"), col("plen"))
    val counts = subs.groupBy(col("piece"), col("plen"))
      .agg(sum(col("n")).as("occ"))
    val wMulti = Window.orderBy(col("occ").desc, col("piece"))
    val kept = counts.filter(col("plen") === 1)
      .unionByName(counts.filter(col("plen") >= 2)
        .withColumn("rk", row_number().over(wMulti)).filter(col("rk") <= topV)
        .drop("rk"))
    val wAll = Window.orderBy(col("occ").desc, col("piece"))
    kept.withColumn("cost", row_number().over(wAll).cast("long"))
      .select(col("piece"), col("cost"))
  }

  /** Greedy longest-match pieces of a single word under a literal
    * vocabulary (collected once — the vocabulary IS small by
    * construction; ship it in the expression, not a join). */
  def greedyPieces(word: Column, vocab: Seq[String], maxPieceLen: Int): Column =
    SparkShims.column(GreedyPiecesExpr(SparkShims.expression(word), vocab, maxPieceLen))

  /** Encode the distinct words of a corpus: word → pieces array,
    * piece count, and the '|'-joined rendering (the oracle's shape). */
  def encodeWords(
      words: DataFrame,
      wordCol: String,
      vocab: Seq[String],
      maxPieceLen: Int = 4): DataFrame =
    words
      .withColumn("pieces", greedyPieces(col(wordCol), vocab, maxPieceLen))
      .withColumn("n_pieces", size(col("pieces")).cast("long"))
      .withColumn("pieces_str", array_join(col("pieces"), "|"))

  /** Minimal-cost (unigram-LM-style Viterbi) pieces of a single word
    * under literal (piece, cost) pairs. */
  def viterbiPieces(word: Column, vocab: Seq[(String, Long)], maxPieceLen: Int): Column =
    SparkShims.column(ViterbiPiecesExpr(SparkShims.expression(word), vocab, maxPieceLen))

  /** Viterbi-encode the distinct words of a corpus: pieces plus the
    * exact total cost (literal-map lookup, no join). */
  def encodeWordsViterbi(
      words: DataFrame,
      wordCol: String,
      vocab: Seq[(String, Long)],
      maxPieceLen: Int = 4): DataFrame = {
    val costMap = typedlit(vocab.toMap)
    words
      .withColumn("pieces", viterbiPieces(col(wordCol), vocab, maxPieceLen))
      .withColumn("n_pieces", size(col("pieces")).cast("long"))
      .withColumn("total_cost",
        aggregate(transform(col("pieces"), p => element_at(costMap, p)),
          lit(0L), (acc, c) => acc + c))
      .withColumn("pieces_str", array_join(col("pieces"), "|"))
  }
}
