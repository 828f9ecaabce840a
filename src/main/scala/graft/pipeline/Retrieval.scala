package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sparse lexical retrieval over a document corpus: an inverted-index
 * postings build plus Okapi BM25 scoring — the candidate-generation /
 * decontamination / hybrid-search counterpart to the dense ANN path
 * (`pipeline.Ann`). The reference engine is dense-only; a training-data
 * pipeline needs the lexical side too (near-dup candidate generation,
 * benchmark decontamination by keyword, hybrid retrieval).
 *
 * Shape at scale (everything linear in corpus token count):
 *  1. postings `(term, doc, tf)`: one explode + one partial-agg groupBy —
 *     the only corpus-sized shuffle;
 *  2. doc lengths and per-term document frequencies are second-level
 *     aggs OVER THE POSTINGS table (no second text scan);
 *  3. the query term list is tiny and broadcast; scoring touches only
 *     the postings slices of the query terms (the inverted-index
 *     property — cost tracks matched postings, not corpus size);
 *  4. per-query top-k via window `row_number` (queries × matched docs;
 *     for huge fan-outs swap in `functions.TopKAggregator` to get
 *     map-side combining — the gate-sized merge doesn't need it).
 *
 * Scores use the Lucene-style non-negative idf
 * `ln(1 + (N - df + 0.5)/(df + 0.5))` and are rounded to 6 decimals
 * BEFORE ranking so the (score DESC, doc ASC) order is reproducible
 * across engines.
 */
object Retrieval {

  /** BM25 top-k: for each `(queryId, terms)` query, the `k` best docs.
    *
    * @return (query_id, doc_id, rank, score), rank 1-based
    */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(Int, Seq[String])],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    // 1. postings — the single corpus-sized pass
    val postings = df
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

    // 2. corpus statistics, derived from postings (no second text scan)
    val docLen = postings.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val termDf = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // avgdl as explicit exact-long-sum / count (not avg()) so both
    // engines derive the identical double
    val stats = docLen.agg(
      count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))

    // 3. score only the postings slices the query terms touch
    val qterms = queries
      .flatMap { case (qid, terms) => terms.map(t => (qid, t)) }
      .toDF("query_id", "term")
    val idf = log(lit(1.0) +
      (col("n").cast("double") - col("df") + lit(0.5)) / (col("df").cast("double") + lit(0.5)))
    val tfNorm = col("tf").cast("double") * (lit(k1) + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    val scored = postings
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(termDf.join(qterms.select("term").distinct(), Seq("term"))), Seq("term"))
      .join(docLen, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(idf * tfNorm), 6).as("score"))

    // 4. rank on the ROUNDED score so ordering is engine-reproducible
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"), col("score"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of any number of
    * rankings: `score(d) = Σ_r 1/(c + rank_r(d))` over the rankings that
    * contain `d`. Rank lists are `(query_id, doc_id, rank)` DataFrames
    * (1-based ranks, already truncated to each ranker's depth). With a
    * constant number of rankers the fused score is an exact sum of
    * machine-representable terms in either engine.
    *
    * Shape: a union + one groupBy keyed on (query, doc) — candidate-count
    * sized, not corpus sized; the re-rank window is per query.
    *
    * @return (query_id, doc_id, rank, rrf_score) — top `k` per query
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val unioned = rankings
      .map(_.select(col("query_id"), col("doc_id"), col("rank")))
      .reduce(_.unionByName(_))
    val fused = unioned
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(lit(1.0) / (lit(c.toDouble) + col("rank"))), 6).as("rrf_score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
    fused
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"), col("rrf_score"))
  }

  /**
   * Positional-postings phrase search — exact phrase matching the way
   * an inverted index does it (adjacent-position intersection of the
   * phrase terms' postings), not a substring scan. The phrase is
   * derived from the corpus itself — its most frequent bigram, with
   * (count DESC, u, v) the deterministic tie-break — so the gate is
   * robust to corpus regeneration.
   *
   * Scale shape: postings are (doc_id, pos, term) from one posexplode
   * pass; joining each side against the broadcast 1-row phrase FIRST
   * prunes both legs to single-term postings lists before the
   * position-adjacency equi-join on (doc_id, pos) — the classic
   * phrase-AND plan, term-selective instead of corpus-wide.
   *
   * @return (doc_id, phrase, n_hits, first_pos) per matching doc,
   *         positions 0-based, overlapping occurrences counted
   */
  def topBigramPhraseSearch(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val bi = docs.select(toks.as("tk"))
      .select(explode(expr(
        "if(size(tk) >= 2, " +
          "transform(sequence(1, size(tk) - 1), " +
          "  i -> struct(tk[i - 1] AS u, tk[i] AS v)), " +
          "cast(array() as array<struct<u:string,v:string>>))")).as("uv"))
      .select(col("uv.u").as("u"), col("uv.v").as("v"))
    val top = bi.groupBy(col("u"), col("v")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("u"), col("v")).limit(1)
      .select(col("u"), col("v"))
    val postings = docs.select(col(idCol).as("doc_id"),
        posexplode(toks).as(Seq("pos", "term")))
    val p1 = postings.join(broadcast(top), col("term") === col("u"))
      .select(col("doc_id"), col("pos"), col("u"), col("v"))
    val p2 = postings.select(col("doc_id").as("doc_id2"),
      col("pos").as("pos2"), col("term").as("term2"))
    p1.join(p2,
        col("doc_id") === col("doc_id2") && col("pos2") === col("pos") + 1 &&
          col("term2") === col("v"))
      .groupBy(col("doc_id"), concat(col("u"), lit(" "), col("v")).as("phrase"))
      .agg(count(lit(1)).as("n_hits"), min(col("pos")).cast("long").as("first_pos"))
      .orderBy(col("doc_id"))
  }
}
