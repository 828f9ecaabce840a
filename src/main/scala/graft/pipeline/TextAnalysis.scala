package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * token/char statistics, quality scoring, language identification, and
 * content fingerprinting.
 *
 * Everything here is composed from native Spark SQL functions (codegen'd,
 * no UDFs), so Catalyst can pipeline these into the parquet scan — at
 * 100 TB these run as a single pass over the text column with full
 * whole-stage codegen.
 */
object TextAnalysis {

  /** Punctuation characters counted by `punct_ratio` — a fixed literal
    * class so SQL oracles can reproduce it byte-for-byte. */
  val PunctClass = """[.,!?;:'"()\-]"""

  /** Whitespace-separated tokens of the lowercased text. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword proxy: tokens × avg-token-length/4, the standard
    * chars/4 heuristic, computed exactly as round(chars_no_ws / 4). */
  def approxBpeTokenCount(text: Column): Column =
    ceil(length(regexp_replace(text, "\\s+", "")).cast("double") / 4.0).cast("long")

  def punctRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, 0.0).otherwise(
      (n - length(regexp_replace(text, PunctClass, ""))).cast("double") / n)
  }

  def digitRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, 0.0).otherwise(
      (n - length(regexp_replace(text, "[0-9]", ""))).cast("double") / n)
  }

  private val stopwordsEn = Seq("the", "a", "an", "of", "and", "to", "in", "is",
    "it", "that", "for", "on", "with", "as", "this", "are", "be", "or")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val sw = typedlit(stopwordsEn)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => array_contains(sw, t))).cast("double") / size(toks))
  }

  /**
   * Composite quality score in [0,1] (the shape of the reference-free
   * quality heuristics used in LLM data pipelines): rewards reasonable
   * length, penalizes punctuation/digit noise, rewards naturally occurring
   * stopwords. Deterministic closed form → SQL-oracle checkable.
   */
  def qualityScore(text: Column): Column = {
    val lengthScore = least(tokenCount(text).cast("double") / 50.0, lit(1.0))
    val punctPenalty = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val digitPenalty = lit(1.0) - least(digitRatio(text) * 5.0, lit(1.0))
    val swScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    round(lengthScore * 0.4 + punctPenalty * 0.2 + digitPenalty * 0.2 + swScore * 0.2, 6)
  }

  // --- language identification ---------------------------------------------

  /** Stopword profiles per language (tiny, deterministic — the classic
    * stopword-voting heuristic; CJK is detected by script range first). */
  private val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "with", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "von", "mit", "den", "ein"),
    "fr" -> Seq("le", "la", "les", "de", "et", "est", "un", "une", "des", "que"))

  /**
   * Language-ID over a text column: CJK-script detection, then stopword
   * voting across language profiles; "und" (undetermined) when no profile
   * scores. Pure column expressions — one codegen'd pass.
   */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val votes = profiles.map { case (lang, words) =>
      val w = typedlit(words)
      struct(size(filter(toks, t => array_contains(w, t))).as("votes"), lit(lang).as("lang"))
    }
    val best = greatest(votes: _*)
    when(text.rlike("[\\x{4e00}-\\x{9fff}]"), "zh")
      .when(text.rlike("[\\x{3040}-\\x{30ff}]"), "ja")
      .when(text.rlike("[\\x{0400}-\\x{04ff}]"), "ru")
      .when(best.getField("votes") > 0, best.getField("lang"))
      .otherwise("und")
  }

  /** Gopher-style repetition signals (one native pass,
    * graft.functions.RepetitionStatsExpr): STRUCT(dup_line_ratio,
    * top_bigram_ratio) — duplicate-line fraction for boilerplate, top
    * single-bigram mass for loops/babble. Integer-ratio doubles, so
    * SQL-oracle-checkable at full precision. */
  def repetitionStats(text: Column): Column =
    graft.functions.text.repetition_stats(text)

  // --- fingerprinting ------------------------------------------------------

  /** Content fingerprint: md5 of the whitespace-normalized lowercased text
    * — the exact-dedup key. */
  def contentFingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Rolling-window document sketch: the `n` numerically smallest distinct
    * hashes over the sliding word-4-gram window (winnowing-style selection
    * — robust to small edits, order-independent). A native expression
    * (graft.functions.GramSketchExpr): tokenizes once per row, and its
    * md5Lower64 hash equals DuckDB's md5_number_lower, so the sketch is
    * SQL-oracle-checkable hash-for-hash. */
  def rollingFingerprint(text: Column, n: Int = 8): Column =
    graft.functions.text.gram_sketch(text, 4, n)

  /** Attach the full stats bundle to a DataFrame. */
  def withTextStats(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_chars_calc", length(t).cast("long"))
      .withColumn("n_tokens", tokenCount(t).cast("long"))
      .withColumn("n_bpe_tokens", approxBpeTokenCount(t))
      .withColumn("punct_ratio", round(punctRatio(t), 6))
      .withColumn("digit_ratio", round(digitRatio(t), 6))
      .withColumn("stopword_ratio", round(stopwordRatio(t), 6))
      .withColumn("quality_score", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fingerprint", contentFingerprint(t))
  }
}
