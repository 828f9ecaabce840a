package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data pipelines: data-mixture
 * rebalancing (per-source keep rates) via multiplicative-hash bucketing.
 *
 * No RNG state: a row's fate is a pure function of its id, so the sample
 * is reproducible across engines, runs, and cluster sizes, and the
 * operation is one narrow codegen'd filter pass — no shuffle, no
 * per-partition sampling state, composable with any downstream op. This
 * is the standard mechanism for enforcing corpus mixing ratios (and for
 * deterministic train/val/test splits, `pipeline_split_assignment`).
 */
object Sampling {

  /** Knuth multiplicative-hash bucket of an integral id in [0, buckets).
    * The id is reduced mod 2^31−1 BEFORE the multiply: the product is then
    * ≤ (2^31−2)·2654435761 ≈ 5.7e18 < Long.MaxValue, so the hash never
    * overflows — un-reduced, ids above ~3.5e9 throw under Spark 4's
    * default ANSI mode (and silently wrap otherwise, diverging from any
    * BIGINT-exact oracle). */
  def hashBucket(id: Column, buckets: Int): Column =
    pmod(pmod(id, lit(2147483647L)) * 2654435761L, lit(buckets))

  /**
   * Keep a row iff its id's hash bucket (parts-per-million) falls under
   * the keep rate of its source; sources absent from `rates` keep
   * `defaultRate`.
   */
  def rebalanceMixture(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0, 1]")
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, r).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), 1000000) < rate * 1000000)
  }

  /**
   * Leakage-safe split assignment: the split is a pure function of a
   * GROUP id (e.g. the duplicate-cluster representative), so every
   * member of a near/exact-duplicate cluster lands in the same split —
   * the train/test-contamination guard a corpus pipeline needs after
   * dedup clustering. Same multiplicative-hash determinism as
   * [[hashBucket]]; one narrow codegen'd projection, no shuffle beyond
   * whatever produced the group column.
   */
  def splitByGroup(
      df: DataFrame, groupIdCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      "invalid split percentages")
    val b = hashBucket(col(groupIdCol), 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /**
   * Deterministic stratified sample: the `k` rows of each stratum whose
   * ids draw the smallest multiplicative-hash values (ties broken by id).
   * A pseudo-random-but-reproducible per-group sample — the eval-set /
   * per-source-inspection primitive. One hash-partitioned window per
   * stratum: the shuffle is on the stratum key only, rows stream through
   * `row_number` with rank-limit pushdown (Catalyst rewrites
   * `row_number <= k` into a per-partition bounded top-k, so no stratum
   * ever materializes fully — skew-safe at 100 TB unless k itself is
   * huge).
   */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val draw = hashBucket(col(idCol), 1000000)
    val w = Window.partitionBy(col(stratumCol)).orderBy(draw, col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /**
   * Deterministic weighted sampling WITHOUT replacement (Efraimidis &
   * Spirakis 2006, "Weighted random sampling with a reservoir"): each row
   * draws key = u^(1/w) from a hash-derived uniform u and is kept iff its
   * key ranks in the global top k — exactly the A-ES scheme with the RNG
   * replaced by the [[hashBucket]] multiplicative hash, so the sample is
   * a pure function of (id, weight) and reproducible across engines,
   * runs, and partitionings.
   *
   * Shape: one narrow pass computes the key; the top-k is
   * `orderBy(...).limit(k)` — Spark plans TakeOrderedAndProject (each
   * partition keeps k, driver merges), linear in data size with no full
   * sort shuffle, which is the 100 TB plan. Keys are rounded to 9
   * decimals with an id tie-break so ranking never depends on the last
   * ulp of `pow` across engines.
   *
   * @param weightCol positive integral or double weight (heavier rows
   *                  proportionally more likely to be sampled)
   * @return (idCol, weightCol, samp_key) — the k sampled rows
   */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    // u in (0, 1]: bucket 0..999999 shifted to (1..1000000)/1000000
    val u = (hashBucket(col(idCol), 1000000) + 1).cast("double") / 1000000.0
    df.select(col(idCol), col(weightCol),
        round(pow(u, lit(1.0) / col(weightCol).cast("double")), 9).as("samp_key"))
      .orderBy(col("samp_key").desc, col(idCol))
      .limit(k)
  }

  /**
   * Temperature-scaled mixture sampling — the multilingual/multi-source
   * balancing recipe (XLM-R, mT5): target shares `p_s ∝ n_s^(1/T)`
   * flatten the source distribution. Sampling without replacement, the
   * most-underrepresented source anchors at keep-rate 1 and every other
   * source downsamples by `rate_s = (n_min/n_s)^(1-1/T)`; rates floor
   * to ppm and the per-row keep decision is the usual deterministic
   * [[hashBucket]] filter (reproducible across engines/runs/cluster
   * sizes). At T=2 the exponent evaluates via `sqrt`, which IEEE
   * defines correctly-rounded — bit-identical in any engine (general
   * `pow` is only ~1-ulp and could flip a ppm floor at a boundary).
   *
   * Shape: one count agg + a broadcast of the tiny per-source rate
   * table back onto the corpus — a single narrow filter pass at scale.
   *
   * @return input rows + (n_docs, rate_ppm, kept) for each row's source
   */
  def temperatureMixture(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      temperature: Double = 2.0): DataFrame = {
    require(temperature >= 1.0, "temperature must be >= 1")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
    val minDf = counts.agg(min(col("n_docs")).as("n_min"))
    val ratio = col("n_min").cast("double") / col("n_docs").cast("double")
    val rate =
      if (temperature == 2.0) sqrt(ratio)
      else pow(ratio, 1.0 - 1.0 / temperature)
    val rated = counts.crossJoin(broadcast(minDf))
      .withColumn("rate_ppm", floor(rate * 1000000.0).cast("long"))
      .select(col(sourceCol), col("n_docs"), col("rate_ppm"))
    df.join(broadcast(rated), Seq(sourceCol))
      .withColumn("kept", hashBucket(col(idCol), 1000000) < col("rate_ppm"))
  }

  /**
   * Budget-constrained corpus selection — "the best data that fits the
   * compute budget", the selection every pretraining run makes: admit
   * docs in (quality DESC, doc_id ASC) order while the running TOKEN
   * total stays within `budgetTokens` (prefix semantics: the first doc
   * that would overflow stops admission, as do all after it).
   *
   * Exact greedy WITHOUT a global data sort: per-(6-dp quality score)
   * BINS carry the token mass of all strictly-better bins (the bin
   * table is tiny — bounded by distinct rounded scores — so its
   * single-partition cumsum window is a non-issue), broadcast back, and
   * the per-doc running sum windows only WITHIN each score bin
   * (partitioned, scale-safe). One scan, no corpus-wide sort.
   *
   * @return one row per input doc:
   *         (doc_id, quality_score, n_tokens, cum_tokens, kept)
   */
  def tokenBudgetSelect(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budgetTokens: Long): DataFrame = {
    val scored = df.select(col(idCol).as("doc_id"),
      TextAnalysis.qualityScore(col(textCol)).as("quality_score"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val bins = scored.groupBy(col("quality_score"))
      .agg(sum(col("n_tokens")).as("bin_tokens"))
    val wBin = Window.orderBy(col("quality_score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val binPrev = bins.withColumn("prev_tokens",
      coalesce(sum(col("bin_tokens")).over(wBin), lit(0L)))
    val wDoc = Window.partitionBy(col("quality_score")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .join(broadcast(binPrev.select(col("quality_score"), col("prev_tokens"))),
        Seq("quality_score"))
      .withColumn("cum_tokens", col("prev_tokens") + sum(col("n_tokens")).over(wDoc))
      .withColumn("kept", col("cum_tokens") <= budgetTokens)
      .select(col("doc_id"), col("quality_score"), col("n_tokens"),
        col("cum_tokens"), col("kept"))
  }

  /** 63-bit deterministic shuffle key of an id: md5 of "seed:id", which
    * DuckDB recomputes verbatim as `md5_number_lower(...) >> 1`. Uniform,
    * so range-partitioning on it is balanced by construction. */
  def shuffleKey(id: Column, seed: String): Column =
    shiftrightunsigned(
      graft.functions.text.md5_lower64(concat(lit(seed + ":"), id.cast("string"))),
      1)

  /**
   * Deterministic corpus shuffle + shard assignment: the training-data
   * "global random order" that must be reproducible across runs and
   * cluster sizes. The order key is a pure md5 function of the row id
   * (no RNG state, no zipWithIndex barrier); `shard` is `key % nShards`.
   *
   * This projection is NARROW — no shuffle at all. To materialize shards
   * in shuffled order at scale, follow with [[writeOrder]]: ONE
   * range-exchange on the uniform key (balanced by construction — no
   * sampling skew, since the key is a 63-bit hash) + an in-partition
   * sort, which is the minimum any global permutation costs.
   */
  def deterministicShuffle(
      df: DataFrame, idCol: String, seed: String, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    df.withColumn("shuffle_key", shuffleKey(col(idCol), seed))
      .withColumn("shard", pmod(col("shuffle_key"), lit(nShards.toLong)).cast("int"))
  }

  /** Globally-ordered shuffled layout: range-partition by the shuffle key
    * and sort within partitions — ready for a partitioned parquet write
    * whose file order IS the (deterministic) training order. */
  def writeOrder(shuffled: DataFrame, numPartitions: Int): DataFrame =
    shuffled.repartitionByRange(numPartitions, col("shuffle_key"))
      .sortWithinPartitions(col("shuffle_key"))

  /**
   * Curriculum ordering — easy-to-hard training order from two
   * normalized difficulty signals: document LENGTH (token count) and
   * lexical RARITY (mean ln(N/df) token IDF), each divided by its
   * corpus max and averaged. Stage = `stages` equal-width rank bands
   * (the competence-based curriculum schedule: train on stage ≤ s,
   * grow s).
   *
   * Scale shape: IDF is one corpus df-agg joined term-keyed onto the
   * token stream, the two maxes are a broadcast 1-row agg, and the
   * global easy-to-hard rank is a range-sort in production (the
   * [[writeOrder]] layout applied to `difficulty_r` instead of a
   * shuffle key); the gate's window form is the same ordering at
   * verification scale. Difficulty is 6-dp-snapped BEFORE ranking so
   * (difficulty_r, doc_id) ties break identically in both engines.
   */
  def curriculumOrder(docs: DataFrame, idCol: String, textCol: String,
      stages: Int = 4): DataFrame = {
    require(stages >= 1, "stages must be positive")
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val df = tok.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("dfreq"))
    val perDoc = tok.join(df, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        round(sum(log(col("n_docs").cast("double") /
          col("dfreq").cast("double"))) / count(lit(1)).cast("double"), 6)
          .as("mean_idf_r"))
    val maxes = perDoc.agg(max(col("n_toks")).as("max_toks"),
      max(col("mean_idf_r")).as("max_idf"))
    val scored = perDoc.crossJoin(broadcast(maxes))
      .withColumn("difficulty_r", round(
        (col("n_toks").cast("double") / col("max_toks").cast("double") +
          col("mean_idf_r") / col("max_idf")) / 2.0, 6))
    val w = Window.orderBy(col("difficulty_r"), col("doc_id"))
    val withRank = scored
      .withColumn("curriculum_rank", row_number().over(w).cast("long"))
    val total = withRank.select(count(lit(1)).as("n_total"))
    withRank.crossJoin(broadcast(total))
      .withColumn("stage", expr(
        s"CAST((curriculum_rank - 1) * $stages DIV n_total + 1 AS INT)"))
      .select(col("doc_id"), col("n_toks"), col("mean_idf_r"),
        col("difficulty_r"), col("curriculum_rank"), col("stage"))
      .orderBy(col("curriculum_rank"))
  }

  /**
   * Deterministic weighted source INTERLEAVING (stride scheduling — the
   * smooth mixture ORDER, not just the proportions): item `r` of source
   * `s` runs at virtual time `(2r−1)·SCALE div w_s`, and the global
   * order sorts by (vtime, source, id). A weight-2 source lands twice
   * as often, spread evenly rather than in bursts — what a training
   * loader needs so no shard is source-clumped. Exact integer stride
   * arithmetic (SCALE = 1e6) with a total (source, id) tie order, so
   * the sequence is reproducible on any engine and any partitioning.
   *
   * Scale shape: per-source ranks are one keyed window; the first-`take`
   * cut is an `orderBy().limit()` → TakeOrdered (per-partition top-N +
   * driver merge, never a full sort of the corpus); the final position
   * window runs over `take` rows only.
   */
  def interleaveOrder(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      weight: Column,
      take: Int): DataFrame = {
    val wRank = Window.partitionBy(col(sourceCol)).orderBy(col(idCol))
    val ranked = df.select(col(sourceCol), col(idCol), weight.cast("long").as("weight"))
      .withColumn("r", row_number().over(wRank).cast("long"))
      .withColumn("vtime", expr("((2 * r - 1) * 1000000) div weight"))
    val order = Seq(col("vtime"), col(sourceCol), col(idCol))
    ranked.orderBy(order: _*).limit(take)
      .withColumn("position", row_number().over(Window.orderBy(order: _*)).cast("long"))
      .select(col("position"), col(sourceCol), col(idCol),
        col("weight"), col("vtime"))
  }
}
