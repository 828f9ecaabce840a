package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** GPT-2-style pretokenizer pattern, restricted to the Java/RE2-common
    * subset (the upstream pattern's trailing-space lookahead dropped —
    * RE2 has no lookahead): contraction suffixes, letter runs, digit
    * runs, punctuation runs (each absorbing one leading space),
    * whitespace runs. */
  val BpeTokenPattern =
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Pretokenizer segment count — the closer-than-chars/4 budget proxy
    * (actual BPE merges only split within these segments, so this upper
    * bound tracks real token counts well for latin-script text). */
  def bpeRegexTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeTokenPattern)).cast("long")

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

  /** The fixed English stopword list every stopword-driven operator
    * shares (quality scoring, RAKE phrase breaking) — public so SQL
    * oracles can inline the identical set. */
  val stopwordsEn = Seq("the", "a", "an", "of", "and", "to", "in", "is",
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
    // one native pass (QualityStatsExpr) supplies every integer input;
    // the float chain on top is IDENTICAL to the original
    // regexp-composed formulation (same casts, same operation order),
    // so every oracle that replays the regex semantics still matches
    // bit-for-bit. 3 regexp passes + a split per row → 1 char scan:
    // the dominant stage of the 1M-doc rehearsal dropped ~4×.
    val q = graft.functions.text.quality_stats(text, stopwordsEn)
    val len = q.getField("len")
    val nt = q.getField("n_tokens")
    val punct = when(len === 0, 0.0)
      .otherwise(q.getField("n_punct").cast("double") / len)
    val digit = when(len === 0, 0.0)
      .otherwise(q.getField("n_digit").cast("double") / len)
    val swr = when(nt === 0, 0.0)
      .otherwise(q.getField("n_stop").cast("double") / nt)
    val lengthScore = least(nt.cast("double") / 50.0, lit(1.0))
    val punctPenalty = lit(1.0) - least(punct * 5.0, lit(1.0))
    val digitPenalty = lit(1.0) - least(digit * 5.0, lit(1.0))
    val swScore = least(swr * 4.0, lit(1.0))
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

  // --- PII detection / redaction -------------------------------------------

  /** PII patterns kept to the regex subset where Java (Spark) and RE2
    * (DuckDB, the oracle) agree byte-for-byte: no backreferences, no
    * lookaround, ASCII word boundaries only. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Per-row PII occurrence counts: STRUCT(n_emails, n_ipv4, n_phones).
    * One codegen'd pass, pipelined into the scan. */
  def piiCounts(text: Column): Column = struct(
    regexp_count(text, lit(EmailPattern)).cast("long").as("n_emails"),
    regexp_count(text, lit(Ipv4Pattern)).cast("long").as("n_ipv4"),
    regexp_count(text, lit(PhonePattern)).cast("long").as("n_phones"))

  /** Redact all three PII classes with typed placeholders. Order matters:
    * emails first (an address can embed digit runs), then IPs (dotted
    * quads), then phones — each later pattern cannot match inside an
    * earlier placeholder. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  // --- quality-quantile filtering ------------------------------------------

  /**
   * Per-source quality-quantile filter: keep every document whose
   * [[qualityScore]] clears its source's keep-fraction quantile — the
   * "drop the worst X% of each corpus slice" step of quality-driven data
   * curation. The keep fraction is the RATIONAL keepNum/keepDen (integer
   * arithmetic end to end: `k = ceil(keepNum·n / keepDen)` — a float
   * fraction like 0.8 is not exactly representable and `ceil(0.8·5)`
   * rounds differently across engines).
   *
   * Per source with n docs, the threshold is the k-th largest score and
   * every doc scoring ≥ it is kept (score ties at the cut all survive —
   * threshold semantics, no arbitrary tie slicing).
   *
   * Shape at scale: scores are rounded to 6 decimals, so the exact
   * quantile runs on the (source, score) BIN table — one partial-agg
   * groupBy (≤ 10⁶+1 bins per source regardless of corpus size), a
   * window over bins (never raw rows) for the running count, and a
   * broadcast of the per-source thresholds back onto the corpus. No
   * full-partition sort of raw documents anywhere — this is what makes
   * the exact quantile 100 TB-safe where a naive percent_rank window
   * (one task per source) is not.
   *
   * @return one row per input doc: (doc_id, source, quality_score,
   *         q_threshold, kept)
   */
  def qualityThresholdFilter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      keepNum: Int,
      keepDen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keepNum > 0 && keepDen > 0 && keepNum <= keepDen,
      s"keep fraction must be in (0,1]: got $keepNum/$keepDen")
    val scored = df.select(col(idCol).as("doc_id"),
      col(sourceCol).as("source"), qualityScore(col(textCol)).as("quality_score"))
    val bins = scored.groupBy(col("source"), col("quality_score"))
      .agg(count(lit(1)).as("n_bin"))
    val wCum = Window.partitionBy("source").orderBy(col("quality_score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy("source")
    // cum >= ceil(keepNum·n/keepDen) ⇔ cum·keepDen >= keepNum·n — pure
    // integer comparison, no division (double ceil-div loses exactness
    // past 2^53 rows·num)
    val thr = bins
      .withColumn("cum", sum("n_bin").over(wCum))
      .withColumn("n", sum("n_bin").over(wTot))
      .filter(col("cum") * keepDen >= col("n") * keepNum)
      .groupBy("source").agg(max("quality_score").as("q_threshold"))
    scored.join(broadcast(thr), Seq("source"))
      .select(col("doc_id"), col("source"), col("quality_score"),
        col("q_threshold"), (col("quality_score") >= col("q_threshold")).as("kept"))
  }

  // --- TF-IDF keyword extraction -------------------------------------------

  /**
   * Per-document top-`k` terms by smoothed TF-IDF
   * (`tf · (ln((N+1)/(df+1)) + 1)`): the classic keyword-extraction /
   * relevance primitive over a tokenized corpus.
   *
   * Shape at scale: explode → two hash aggregations (both with full
   * map-side partial aggregation, so the shuffles carry term-level, not
   * token-level, cardinality), a broadcast of the single-row corpus size,
   * and a rank-limited window (Catalyst bounds it to k per document
   * before the sort). The document-frequency side is term-keyed — skew
   * concentrates on stopword-grade terms, which partial aggregation
   * already collapses per map task.
   */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, Seq("term")).crossJoin(broadcast(n))
      .withColumn("score", round(
        col("tf").cast("double") *
          (log((col("n_docs").cast("double") + 1.0) / (col("df").cast("double") + 1.0)) + 1.0), 6))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("score"), col("rank"))
  }

  // --- PMI collocations ----------------------------------------------------

  /**
   * Top-`k` word bigrams by pointwise mutual information
   * (`ln(c12·N / (c1·c2))`, counts over the whole corpus, support
   * `c12 >= minCount`) — the classic collocation / multi-word-expression
   * detector. Returns (bigram, c12, pmi) ordered by pmi desc.
   *
   * Shape at scale: bigrams come from one per-row lambda over the token
   * array (no self-join of the token table on position), then two
   * term-keyed hash aggregations and a broadcast of the unigram counts
   * onto the bigram table keyed by each side. The unigram table is
   * vocabulary-sized; if a corpus's vocabulary outgrows broadcast range,
   * both joins degrade gracefully to shuffled hash joins on the term key.
   * pmi rounds to 6 dp (single libm ln; see the TF-IDF note).
   */
  /**
   * Dunning log-likelihood-ratio collocations (Dunning 1993) — the
   * scale-robust sibling of [[pmiBigrams]]: PMI over-rewards rare pairs
   * (one co-occurrence of two hapaxes maxes it out), while LLR weighs
   * the evidence MASS, ranking frequent-and-associated pairs first —
   * the scorer real collocation pipelines use at corpus scale.
   *
   * LLR = 2·(Σ xlogx(k_ij) − Σ xlogx(rowsums) − Σ xlogx(colsums)
   *          + xlogx(N)) over the 2×2 contingency table
   * (k11 = c12, k12 = c1−c12, k21 = c2−c12, k22 = N−c1−c2+c12).
   * Every k is an exact integer; the ln terms are written in ONE fixed
   * left-associated chain (identical fold order in Spark and SQL) and
   * the final score rounds to 4 dp — libm ulp wiggle across engines is
   * ~1e-10 on these magnitudes, five orders below the rounding grid
   * (the PMI single-ln convention, widened to a fixed-order sum).
   * Same one-pass plan shape as PMI: bigram counts persisted, marginals
   * derived from them, checkpoint before the presentation sort.
   */
  def llrBigrams(df: DataFrame, textCol: String, k: Int,
      minCount: Long = 5L): DataFrame = {
    val toks = df.select(tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
    val bi = toks
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .persist()
    val uni1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val uni2 = c12.groupBy(col("w2")).agg(sum(col("c12")).as("c2"))
    val n = c12.agg(sum(col("c12")).as("n_bi"))
    // xlogx(0) = 0 (the entropy convention) — k12/k21/k22 can be 0
    def xlogx(c: Column): Column =
      when(c <= 0L, lit(0.0)).otherwise(c.cast("double") * log(c.cast("double")))
    val k11 = col("c12")
    val k12 = col("c1") - col("c12")
    val k21 = col("c2") - col("c12")
    val k22 = col("n_bi") - col("c1") - col("c2") + col("c12")
    val llr = (lit(2.0) * (xlogx(k11) + xlogx(k12) + xlogx(k21) + xlogx(k22)
      - xlogx(col("c1")) - xlogx(col("n_bi") - col("c1"))
      - xlogx(col("c2")) - xlogx(col("n_bi") - col("c2"))
      + xlogx(col("n_bi"))))
    val out = c12.filter(col("c12") >= minCount)
      .join(broadcast(uni1), Seq("w1"))
      .join(broadcast(uni2), Seq("w2"))
      .crossJoin(broadcast(n))
      .select(concat(col("w1"), lit(" "), col("w2")).as("bigram"), col("c12"),
        (round(llr, 4) + lit(0.0)).as("llr"))
      .localCheckpoint()
    c12.unpersist()
    out.orderBy(col("llr").desc, col("bigram")).limit(k)
  }

  def pmiBigrams(df: DataFrame, textCol: String, k: Int,
      minCount: Long = 5L): DataFrame = {
    // size >= 2 guard: Spark's sequence(1, 0) DESCENDS (it would emit
    // [1, 0] and element_at(t, 0) throws), it does not return empty.
    val toks = df.select(tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
    val bi = toks
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    // ONE corpus pass: the bigram-count table is persisted (bounded by
    // the bigram vocabulary, not the corpus) and the slot marginals +
    // total derive from it — c1(w1) = sum_w2 c12(w1,.) exactly, so the
    // tokenize/explode lineage never re-executes for uni1/uni2/n.
    val c12 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .persist()
    val uni1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val uni2 = c12.groupBy(col("w2")).agg(sum(col("c12")).as("c2"))
    val n = c12.agg(sum(col("c12")).as("n_bi"))
    val out = c12.filter(col("c12") >= minCount)
      .join(broadcast(uni1), Seq("w1"))
      .join(broadcast(uni2), Seq("w2"))
      .crossJoin(broadcast(n))
      // + 0.0 normalizes -0.0 (a near-1 ratio's ln rounds to ±0
      // differently across engines without it — the sign-of-zero rule)
      .select(concat(col("w1"), lit(" "), col("w2")).as("bigram"), col("c12"),
        (round(log((col("c12") * col("n_bi")).cast("double")
          / (col("c1") * col("c2")).cast("double")), 6) + lit(0.0)).as("pmi"))
      // checkpoint BEFORE the presentation sort: materializing a
      // post-limit plan runs CollectLimitExec's single-partition shuffle
      // (measured +0.5 s at sf0.1); here the checkpoint holds the
      // minCount-filtered scored table (vocabulary-bounded) and the
      // consumer's orderBy+limit stays a cheap TakeOrdered over it. The
      // eager materialization is what lets the bigram cache release
      // without a session-lifetime leak (the triangleCounts pattern).
      .localCheckpoint()
    c12.unpersist()
    out.orderBy(col("pmi").desc, col("bigram")).limit(k)
  }

  // --- Unigram-LM perplexity proxy -----------------------------------------

  /**
   * Per-document negative log-likelihood under a Laplace-smoothed unigram
   * model of the corpus itself — the CCNet-style perplexity-proxy quality
   * signal (docs whose token distribution diverges from the corpus score
   * high; boilerplate and gibberish separate from body text without any
   * external LM).
   *
   * `avg_nll = Σ_t tf(d,t) · −ln((cnt(t)+α)/(total+α·|V|)) / Σ_t tf(d,t)`
   *
   * Shape at scale: one explode, two hash aggregations (map-side partial
   * aggregation collapses token-level to term-level before both
   * shuffles), a single-row broadcast of the corpus totals, one
   * term-keyed equi-join, one doc-level aggregation — all linear in
   * token count; the model side is vocabulary-sized.
   */
  def unigramNll(
      df: DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 1.0): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val model = tf.groupBy(col("term")).agg(sum(col("tf")).as("cnt"))
    val totals = model.agg(sum(col("cnt")).as("total"), count(lit(1)).as("vocab"))
    tf.join(model, Seq("term")).crossJoin(broadcast(totals))
      .withColumn("nll_term",
        col("tf").cast("double") * (lit(0.0) - log(
          (col("cnt").cast("double") + lit(alpha))
            / (col("total").cast("double") + lit(alpha) * col("vocab").cast("double")))))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        round(sum(col("nll_term")) / sum(col("tf")).cast("double"), 6).as("avg_nll"))
  }

  /**
   * Bigram-interpolated negative log-likelihood (the KenLM-shaped
   * perplexity proxy one order up from [[unigramNll]]): per bigram
   * position, p = λ·p₂(v|u) + (1−λ)·p₁(v) with add-α smoothing
   * (p₂ = (C(u,v)+α)/(C(u)+α·V), p₁ = (C(v)+α)/(N+α·V)), model fit on
   * the corpus itself. Lower avg_nll ⇒ more predictable text; the
   * spread between unigram and bigram NLL is the classic fluency
   * signal.
   *
   * Shape at scale: bigrams come from one array pass (no window, no
   * self-join); counts are two partial-agg groupBys keyed on terms; the
   * per-doc scoring joins are term-keyed equi-joins plus one broadcast
   * of the 1-row totals. Everything is linear in token count. Docs with
   * < 2 tokens have no bigram positions and drop out (both engines
   * agree by construction).
   *
   * @return (doc_id, n_bigrams, avg_nll) — avg_nll rounded to 6
   */
  def bigramNll(
      df: DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 1.0,
      lambda: Double = 0.75): DataFrame = {
    val toks = tokens(col(textCol))
    // sequence(1, n-1) DESCENDS for n < 2 — guard short docs explicitly
    val big = df.select(col(idCol).as("doc_id"), toks.as("tk"))
      .select(col("doc_id"), explode(expr(
        "if(size(tk) >= 2, " +
          "transform(sequence(1, size(tk) - 1), " +
          "  i -> struct(tk[i - 1] AS u, tk[i] AS v)), " +
          "cast(array() as array<struct<u:string,v:string>>))")).as("uv"))
      .select(col("doc_id"), col("uv.u").as("u"), col("uv.v").as("v"))
    val tf2 = big.groupBy(col("doc_id"), col("u"), col("v"))
      .agg(count(lit(1)).as("tf2"))
    val big2 = tf2.groupBy(col("u"), col("v")).agg(sum(col("tf2")).as("cuv"))
    val tok = df.select(explode(toks).as("term"))
    val uni = tok.groupBy(col("term")).agg(count(lit(1)).as("c1"))
    val totals = uni.agg(sum(col("c1")).as("total"), count(lit(1)).as("vocab"))
    val p2 = (col("cuv").cast("double") + lit(alpha)) /
      (col("cu").cast("double") + lit(alpha) * col("vocab").cast("double"))
    val p1 = (col("cv").cast("double") + lit(alpha)) /
      (col("total").cast("double") + lit(alpha) * col("vocab").cast("double"))
    tf2
      .join(big2, Seq("u", "v"))
      .join(uni.select(col("term").as("u"), col("c1").as("cu")), Seq("u"))
      .join(uni.select(col("term").as("v"), col("c1").as("cv")), Seq("v"))
      .crossJoin(broadcast(totals))
      .withColumn("nll",
        col("tf2").cast("double") *
          (lit(0.0) - log(lit(lambda) * p2 + lit(1.0 - lambda) * p1)))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf2")).as("n_bigrams"),
        round(sum(col("nll")) / sum(col("tf2")).cast("double"), 6).as("avg_nll"))
  }

  /**
   * Interpolated Kneser–Ney bigram NLL — the smoothing the add-α model
   * in [[bigramNll]] approximates badly on Zipfian text (KenLM-class
   * perplexity scoring à la CCNet's quality filter, one discount `d`
   * instead of pseudo-counts):
   *
   *   P(v|u) = (max(c(u,v) − d, 0) + d · N₁₊(u,·) · Pcont(v)) / c(u,·)
   *   Pcont(v) = N₁₊(·,v) / N₁₊(·,·)
   *
   * where c(u,·) is the CONTEXT count (Σ_v c(u,v) — not the unigram
   * count: the last token of a doc is never a context) and the N₁₊ are
   * distinct-continuation counts. Model fit on the corpus itself, so
   * every scored bigram has c(u,v) ≥ 1 and the probability is well-
   * defined with no OOV path.
   *
   * Scale shape mirrors [[bigramNll]]: one array pass for bigrams, the
   * model is three aggs OVER THE BIGRAM-TYPE TABLE (context sums,
   * forward/backward distinct-continuation counts — all map-side
   * combined), scoring is term-keyed equi-joins plus one broadcast
   * 1-row total. The sum is per-(doc,u,v) with tf2 multiplicity, so the
   * float fold has one term per bigram TYPE per doc — deterministic
   * across partitionings.
   *
   * @return (doc_id, n_bigrams, avg_nll) — avg_nll rounded to 6
   */
  def knBigramNll(
      df: DataFrame,
      idCol: String,
      textCol: String,
      d: Double = 0.75): DataFrame = {
    require(d > 0.0 && d < 1.0, s"KN discount must be in (0,1), got $d")
    val toks = tokens(col(textCol))
    val big = df.select(col(idCol).as("doc_id"), toks.as("tk"))
      .select(col("doc_id"), explode(expr(
        "if(size(tk) >= 2, " +
          "transform(sequence(1, size(tk) - 1), " +
          "  i -> struct(tk[i - 1] AS u, tk[i] AS v)), " +
          "cast(array() as array<struct<u:string,v:string>>))")).as("uv"))
      .select(col("doc_id"), col("uv.u").as("u"), col("uv.v").as("v"))
    // ONE corpus pass (the pmiBigrams pattern): tf2 — the per-doc
    // bigram-TYPE table — is persisted so the tokenize/explode lineage
    // never re-executes; big2 and the three model aggs (ctx, cont,
    // totals) all derive from it. Both caches are vocabulary/corpus-type
    // bounded, not raw-token bounded, and are released after the
    // doc-count-sized result materializes.
    val tf2 = big.groupBy(col("doc_id"), col("u"), col("v"))
      .agg(count(lit(1)).as("tf2"))
      .persist()
    val big2 = tf2.groupBy(col("u"), col("v")).agg(sum(col("tf2")).as("cuv"))
      .persist()
    val ctx = big2.groupBy(col("u"))
      .agg(sum(col("cuv")).as("cu"), count(lit(1)).as("n1p_u"))
    val cont = big2.groupBy(col("v")).agg(count(lit(1)).as("n1pb_v"))
    val totals = big2.agg(count(lit(1)).as("n1p_all"))
    val pcont = col("n1pb_v").cast("double") / col("n1p_all").cast("double")
    val pkn = (greatest(col("cuv").cast("double") - lit(d), lit(0.0)) +
      lit(d) * col("n1p_u").cast("double") * pcont) / col("cu").cast("double")
    val out = tf2
      .join(big2, Seq("u", "v"))
      .join(ctx, Seq("u"))
      .join(cont, Seq("v"))
      .crossJoin(broadcast(totals))
      .withColumn("nll", col("tf2").cast("double") * (lit(0.0) - log(pkn)))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf2")).as("n_bigrams"),
        round(sum(col("nll")) / sum(col("tf2")).cast("double"), 6).as("avg_nll"))
      .localCheckpoint()
    big2.unpersist()
    tf2.unpersist()
    out
  }

  /**
   * Vocabulary coverage / OOV-rate under a frozen top-`vocabSize`
   * frequency vocabulary (tokenizer-coverage analysis: how much of each
   * document a top-V word list explains). The vocabulary cut is
   * deterministic — (freq DESC, token ASC) with the tie broken
   * lexicographically — so both engines freeze the identical list.
   *
   * Shape: one corpus-level frequency agg, a top-V TakeOrdered (per-
   * partition V + driver merge, no global sort), then one broadcast
   * membership join and a per-doc agg — linear, one scan of the corpus
   * per side.
   *
   * @return (doc_id, n_tokens, n_oov, oov_ratio) per doc with ≥ 1 token
   */
  def oovStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      vocabSize: Int): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
    val vocab = tok.groupBy(col("term")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term")).limit(vocabSize)
      .select(col("term"), lit(true).as("in_vocab"))
    tok.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("in_vocab").isNull, lit(1))).as("n_oov"))
      .withColumn("oov_ratio",
        round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6))
  }

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

  /**
   * Pairwise co-occurrence mining (the A-priori first pass / market-
   * basket pairs): documents are baskets, DISTINCT tokens are items,
   * and every unordered token pair co-occurring in a document counts
   * once per document. Support-thresholded, top-`k` by count.
   *
   * Scale shape: the pair fan-out is per-document quadratic in the
   * DISTINCT token count only (bounded by per-doc vocabulary, not doc
   * length), generated array-side under the Generate barrier with zero
   * shuffle — the sorted distinct array guarantees t1 < t2 without a
   * self-join. At 100 TB you additionally cap the per-doc distinct
   * count (or pre-filter items below global support, the actual
   * A-priori trick) before the fan-out; the count agg is one map-side
   * combined groupBy.
   */
  def cooccurrencePairs(docs: DataFrame, textCol: String,
      minSupport: Long, k: Int): DataFrame = {
    val base = docs
      .select(array_sort(array_distinct(tokens(col(textCol)))).as("a"))
      .filter(size(col("a")) >= 2)
    base.select(explode(expr(
        """flatten(transform(sequence(1, size(a) - 1),
          |  i -> transform(sequence(i + 1, size(a)),
          |    j -> struct(a[i-1] AS t1, a[j-1] AS t2))))""".stripMargin))
        .as("p"))
      .groupBy(col("p.t1").as("t1"), col("p.t2").as("t2"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minSupport)
      .orderBy(col("n_docs").desc, col("t1"), col("t2"))
      .limit(k)
  }

  /**
   * TextRank keyword extraction (Mihalcea & Tarau 2004): content words
   * (lowercase alphabetic, ≥ 3 chars, non-stopword) are nodes; an
   * undirected unweighted edge links words co-occurring within a window
   * of 2 in the filtered token sequence; 3 rounds of the integer
   * fixed-point PageRank rank the vocabulary and the top `k` words are
   * the corpus keywords — the graph-centrality keyword scorer beside
   * the frequency-centric TF-IDF.
   *
   * Scale shape: the pair fan-out is a zero-shuffle
   * scan→project→generate chain (the filtered token array materializes
   * once under the Generate barrier — same CollapseProject trap and
   * defense as `Chunker.cdcChunks`; the distance-2 probe uses
   * `try_element_at`, not `t[i+1]`, which would throw under ANSI at the
   * sequence tail). The vocabulary is dictionary-encoded to dense long
   * ids (row_number over the distinct-word table — a vocab-sized
   * dimension sort, broadcast back onto the pair stream) so the
   * per-round PageRank joins shuffle longs, not strings; the rank
   * machinery is [[GraphAlgos.pageRankFixedPoint]] unchanged.
   */
  def textRankKeywords(docs: DataFrame, textCol: String = "text",
      k: Int = 40): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sw = typedlit(stopwordsEn)
    val content = filter(tokens(col(textCol)),
      t => t.rlike("^[a-z]{3,}$") && !array_contains(sw, t))
    val base = docs.select(content.as("t")).filter(size(col("t")) >= 2)
    val gen = expr(
      """concat(
        |  transform(sequence(1, size(t) - 1),
        |    i -> struct(t[i-1] AS w1, t[i] AS w2)),
        |  transform(sequence(1, size(t) - 1),
        |    i -> struct(t[i-1] AS w1, try_element_at(t, i + 2) AS w2)))
        |""".stripMargin)
    // pairs' upstream is the regex tokenizer + window-2 fan-out — the
    // chain's dominant CPU. It feeds the vocab union (2 scans), the edge
    // dictionary join, and (via vocab) the final rank join-back: persist
    // it, and checkpoint the (small, distinct-word-sized) vocab once so
    // the id dictionary is never re-derived from raw text again.
    val pairs = base.select(explode(gen).as("b"))
      .filter(col("b.w2").isNotNull && col("b.w1") =!= col("b.w2"))
      .select(col("b.w1").as("wa"), col("b.w2").as("wb"))
    pairs.persist()
    val vocab = pairs.select(col("wa").as("word"))
      .union(pairs.select(col("wb").as("word"))).distinct()
      .withColumn("node",
        row_number().over(Window.orderBy(col("word"))).cast("long"))
      .localCheckpoint()
    val va = vocab.select(col("word").as("__wa"), col("node").as("src"))
    val vb = vocab.select(col("word").as("__wb"), col("node").as("dst"))
    val e = pairs
      .join(broadcast(va), col("wa") === col("__wa"))
      .join(broadcast(vb), col("wb") === col("__wb"))
      .select(col("src"), col("dst"))
    // pageRankFixedPoint materializes its rounds eagerly — pairs is
    // fully consumed when it returns
    val ranks = GraphAlgos.pageRankFixedPoint(
      GraphAlgos.symmetrize(e), iterations = 3)
    pairs.unpersist()
    ranks
      .join(broadcast(vocab.select(col("word"), col("node").as("__n"))),
        col("node") === col("__n"))
      .select(col("word"), col("rank_fp"))
      .orderBy(col("rank_fp").desc, col("word"))
      .limit(k)
  }

  // --- Readability ---------------------------------------------------------

  /** Per-text syllable count under the standard vowel-group heuristic:
    * each whitespace token contributes max(1, #maximal `[aeiouy]+` runs)
    * — tokens with no vowels (numbers, symbols) count one syllable, the
    * convention that keeps grade formulas defined on any text. Exact
    * integer fold over the token array, no shuffle. */
  def syllableCount(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + greatest(lit(1L), regexp_count(t, lit("[aeiouy]+"))))

  /** Sentence count: maximal `[.!?]+` runs, floored at 1 (a fragment
    * with no terminal punctuation is one sentence). */
  def sentenceCount(text: Column): Column =
    greatest(lit(1L), regexp_count(text, lit("[.!?]+")))

  /**
   * Flesch reading ease + Flesch–Kincaid grade — the classic corpus
   * quality/difficulty signals (readability-bucketed mixtures, easy-to-
   * hard curricula). All counts are exact integers; only the two final
   * formula evaluations are floating point, in a fixed operation order
   * both engines reproduce bit-identically. Narrow per-row compute —
   * pipelines into the scan at any scale.
   *
   * ease  = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
   * grade = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59
   */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val wps = col("n_words").cast("double") / col("n_sentences")
    val spw = col("n_syllables").cast("double") / col("n_words")
    df.select(col(idCol),
        tokenCount(t).cast("long").as("n_words"),
        sentenceCount(t).as("n_sentences"),
        syllableCount(t).as("n_syllables"))
      .filter(col("n_words") > 0)
      .withColumn("flesch_ease",
        round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 4))
      .withColumn("fk_grade",
        round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 4))
  }

  // --- Normalization -------------------------------------------------------

  /** Deterministic text normalization chain (the canonical form dedup
    * fingerprints and training text share): strip control characters,
    * lowercase, collapse each repeated terminal-punctuation run to one
    * character (per-char rules — RE2 has no backreferences, so the SQL
    * mirror stays expressible), collapse whitespace runs to one space,
    * trim. IDEMPOTENT by construction — applying it twice is the
    * identity on its own output (pinned by the gate's idem_ok column).
    * Pure narrow string ops; no shuffle. */
  def normalizeText(text: Column): Column = {
    val noCtrl = regexp_replace(text, "[\\x00-\\x1f\\x7f]", " ")
    val lowered = lower(noCtrl)
    val punctDeduped = Seq("\\.", "!", "\\?", ",", ";", ":")
      .foldLeft(lowered)((c, p) =>
        regexp_replace(c, s"$p{2,}", p.replace("\\", "")))
    trim(regexp_replace(punctDeduped, "\\s+", " "))
  }

  // --- Capitalized spans (crude NER) ---------------------------------------

  /**
   * Proper-noun candidate spans: maximal runs of ≥ `minLen` consecutive
   * Capitalized tokens (`^[A-Z][a-z]+$`, ORIGINAL case — tokens are NOT
   * lowercased here) — the zero-model entity tagger used for masking /
   * pseudonymization passes. One posexplode + one gaps-and-islands
   * window keyed on the doc; span text reassembles inside the island
   * aggregate.
   */
  def capitalizedSpans(docs: DataFrame, idCol: String, textCol: String,
      minLen: Int = 2): DataFrame = {
    val rawToks = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    val tok = docs.select(col(idCol).as("doc_id"),
      posexplode(rawToks).as(Seq("pos", "t")))
    val caps = tok.filter(col("t").rlike("^[A-Z][a-z]+$"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = caps
      .withColumn("island", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        count(lit(1)).as("span_len"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("t")))),
          x => x.getField("t"))).as("span_text"))
      .filter(col("span_len") >= minLen)
    val wSpan = Window.partitionBy(col("doc_id")).orderBy(col("span_start"))
    spans
      .withColumn("span_idx", row_number().over(wSpan).cast("long"))
      .select(col("doc_id"), col("span_idx"), col("span_start"),
        col("span_len"), col("span_text"))
  }

  // --- Topic segmentation --------------------------------------------------

  /**
   * TextTiling-style topic segmentation (integer form): split each doc
   * into consecutive `blockTokens`-token blocks, score each adjacent
   * block pair by DISTINCT-token overlap, and call a topic boundary
   * where `overlap · 5 < min(|A|, |B|)` (< 20% lexical cohesion) — the
   * long-document chunking signal that beats fixed windows when topics
   * shift. Exact set arithmetic: the overlap is a (doc, token)-keyed
   * equi-join of adjacent blocks (never a pairwise block join), zero-
   * overlap pairs are kept via the block-table left join.
   *
   * Emits one row per adjacent pair: (doc_id, boundary_after, overlap,
   * size_a, size_b, is_boundary).
   */
  def topicSegments(docs: DataFrame, idCol: String, textCol: String,
      blockTokens: Int): DataFrame = {
    require(blockTokens >= 1, "blockTokens must be >= 1")
    val tok = docs.select(col(idCol).as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "t")))
      .select(col("doc_id"), (col("pos") / blockTokens).cast("long").as("blk"),
        col("t"))
      .distinct()
    val sizes = tok.groupBy(col("doc_id"), col("blk"))
      .agg(count(lit(1)).as("sz"))
    val overlap = tok.as("a")
      .join(tok.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.blk") === col("a.blk") + 1 && col("a.t") === col("b.t"))
      .groupBy(col("a.doc_id").as("doc_id"), col("a.blk").as("blk"))
      .agg(count(lit(1)).as("overlap"))
    val pairs = sizes.as("sa")
      .join(sizes.as("sb"),
        col("sa.doc_id") === col("sb.doc_id") &&
          col("sb.blk") === col("sa.blk") + 1)
      .select(col("sa.doc_id").as("doc_id"), col("sa.blk").as("blk"),
        col("sa.sz").as("size_a"), col("sb.sz").as("size_b"))
    pairs.join(overlap, Seq("doc_id", "blk"), "left")
      .withColumn("overlap", coalesce(col("overlap"), lit(0L)))
      .withColumn("is_boundary",
        col("overlap") * 5 < least(col("size_a"), col("size_b")))
      .select(col("doc_id"), col("blk").as("boundary_after"),
        col("overlap"), col("size_a"), col("size_b"), col("is_boundary"))
  }

  // --- Zipf fit ------------------------------------------------------------

  /**
   * Zipf rank–frequency fit over the corpus vocabulary: OLS slope of
   * ln(count) on ln(rank) across the top-`k` tokens (natural text sits
   * near −1; a corpus drifting away signals boilerplate or templating —
   * a cheap corpus-health dial). One token-count aggregation, one
   * bounded top-k, and a 5-sum reduce over k rows — the corpus-size-
   * independent tail of the job. Returns one row: n_terms, top token/
   * count, slope and intercept (rounded; the only float stage).
   */
  def zipfFit(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val counts = docs
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    // bounded TakeOrdered FIRST (distributed top-k, no global sort of
    // the vocabulary), then the ranking window runs over just k rows
    val w = Window.orderBy(col("n").desc, col("token"))
    val top = counts
      .orderBy(col("n").desc, col("token")).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
    val x = log(col("rank").cast("double"))
    val y = log(col("n").cast("double"))
    top
      .select(col("rank"), col("token"), col("n"),
        x.as("lx"), y.as("ly"), (x * y).as("lxy"), (x * x).as("lxx"))
      .agg(
        count(lit(1)).as("n_terms"),
        max(when(col("rank") === 1, col("token"))).as("top_token"),
        max(when(col("rank") === 1, col("n"))).as("top_count"),
        sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
        sum(col("lxy")).as("sxy"), sum(col("lxx")).as("sxx"))
      .withColumn("zipf_slope", round(
        (col("n_terms") * col("sxy") - col("sx") * col("sy")) /
          (col("n_terms") * col("sxx") - col("sx") * col("sx")), 4))
      .withColumn("zipf_intercept", round(
        (col("sy") - col("zipf_slope") * col("sx")) / col("n_terms"), 4))
      .select(col("n_terms"), col("top_token"), col("top_count"),
        col("zipf_slope"), col("zipf_intercept"))
  }
  /**
   * Heaps'-law vocabulary-growth checkpoints — the corpus-health curve
   * complementing the rank-frequency `zipfSlope`: for each source, the
   * distinct BIGRAM vocabulary V(n) observed in the first n documents
   * (doc-id order) at n = ceil(frac% of the source's docs). A healthy
   * natural corpus grows V(n) ≈ K·n^β (β ≈ 0.4–0.6); a curve that
   * saturates early means duplication/boilerplate, one that stays linear
   * means noise — the standard before/after read on a dedup pass.
   *
   * Bigrams, not unigrams: unigram vocabularies saturate within a few
   * hundred documents on topical corpora, so the unigram curve stops
   * discriminating exactly where dedup decisions happen.
   *
   * Shape at scale: the per-source rank window carries ONLY
   * (source, id) — text never enters the window shuffle; bigrams come
   * from the one-pass token lambda (the [[llrBigrams]] idiom) and join
   * the rank table on id; first-appearance is one (source, bigram)
   * hash aggregation (the dominant shuffle, vocabulary-sized). The
   * checkpoint table is pivoted WIDE (one row per source) and broadcast
   * onto the vocabulary, where each checkpoint is a conditional sum —
   * no outer join ever touches the big side, so a source that dominates
   * the vocabulary cannot skew a join shuffle. All outputs are exact
   * integers.
   *
   * @return (source, frac_pct, n_docs, vocab) — one row per source per
   *         checkpoint, vocab non-decreasing in frac_pct
   */
  def heapsVocabCheckpoints(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      textCol: String,
      fracsPct: Seq[Int] = Seq(25, 50, 75, 100)): DataFrame = {
    val w = Window.partitionBy(col(sourceCol)).orderBy(col(idCol))
    val ranks = df.select(col(sourceCol), col(idCol))
      .withColumn("r", row_number().over(w).cast("long"))
    val bi = df
      .select(col(idCol), tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
        .as("bigram"))
    val firsts = bi.join(ranks, idCol)
      .groupBy(col(sourceCol), col("bigram"))
      .agg(min(col("r")).as("first_r"))
    // one WIDE row per source: the prefix length of every checkpoint
    val lims = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("total"))
      .select(col(sourceCol) +: fracsPct.map(f =>
        ceil(col("total") * f / lit(100.0)).cast("long").as(s"n_$f")): _*)
    val vAggs = fracsPct.map(f =>
      sum(when(col("first_r") <= col(s"n_$f"), 1L).otherwise(0L)).as(s"v_$f"))
    val counted = firsts.join(broadcast(lims), sourceCol)
      .groupBy(col(sourceCol))
      .agg(vAggs.head, vAggs.tail: _*)
    // tiny ⋈ tiny (both sides are per-source aggregates — provably
    // sources-sized, so the hint is safe): re-attach sources with zero
    // bigrams, unpivot to rows
    lims.join(broadcast(counted), Seq(sourceCol), "left")
      .select(col(sourceCol), explode(array(fracsPct.map(f => struct(
        lit(f.toLong).as("frac_pct"),
        col(s"n_$f").as("n_docs"),
        coalesce(col(s"v_$f"), lit(0L)).as("vocab"))): _*)).as("c"))
      .select(col(sourceCol), col("c.frac_pct"), col("c.n_docs"), col("c.vocab"))
  }
}
