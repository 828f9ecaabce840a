package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Preference-pair construction (the DPO/RLHF data-shaping step): within
 * each prompt group, pick the highest-scored response as `chosen` and
 * the lowest as `rejected`, with a minimum score margin so near-ties
 * don't become noisy training signal.
 *
 * Shape at scale: two `min_by`/`max_by`-style struct aggregates over one
 * keyed groupBy — a single shuffle on the group key, no window sort and
 * no self-join (the naive argmax-join reads the group twice and joins it
 * back; the struct-ordering aggregate reads it once). Ties break toward
 * the smaller id on BOTH sides, so pairs are deterministic under any
 * partitioning.
 */
object Preference {

  /**
   * @param df       scored candidates
   * @param groupCols prompt-group key columns
   * @param idCol    candidate id (tie-break, ascending)
   * @param scoreCol numeric preference score
   * @param minMargin minimum (chosen − rejected) score gap; groups whose
   *                  extremes are closer produce no pair
   */
  def dpoPairs(df: DataFrame, groupCols: Seq[String], idCol: String,
      scoreCol: String, minMargin: Double): DataFrame = {
    // max_by/min_by with an explicit struct order: score first, then id
    // DESC for max (so the SMALLER id wins score ties after inversion is
    // not needed — struct compare takes greater id; invert by negating)
    val chosenKey = struct(col(scoreCol).as("s"), (-col(idCol)).as("negid"))
    val rejectedKey = struct((-col(scoreCol)).as("s"), (-col(idCol)).as("negid"))
    df.groupBy(groupCols.map(col): _*)
      .agg(
        max_by(struct(col(idCol).as("id"), col(scoreCol).as("score")), chosenKey)
          .as("ch"),
        max_by(struct(col(idCol).as("id"), col(scoreCol).as("score")), rejectedKey)
          .as("rj"),
        count(lit(1)).as("n_candidates"))
      .filter(col("ch.id") =!= col("rj.id") &&
        col("ch.score") - col("rj.score") >= minMargin)
      .select(
        (groupCols.map(col) ++ Seq(
          col("ch.id").as("chosen_id"),
          col("rj.id").as("rejected_id"),
          col("n_candidates"),
          round(col("ch.score") - col("rj.score"), 6).as("margin"))): _*)
  }

  /**
   * Group-relative advantages — the GRPO/RLOO data-shaping step: each
   * sample's reward is centered and scaled WITHIN its prompt group,
   * `adv = (x − mean) / stddev_pop`. Moments are assembled from exact
   * integer Σx / Σx² (never the builtin stddev aggregate, whose
   * Welford-vs-sum-of-squares implementation differs across engines at
   * ulp), so every double op is a fixed deterministic chain; the one
   * final round(…,6) covers nothing but presentation. Degenerate
   * groups (n = 1 or zero variance) emit adv = 0.
   *
   * Scale shape: one grouped integer aggregation + one broadcast-or-
   * shuffle join of the group-sized moment table back onto the rows.
   */
  def groupAdvantages(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      valueCol: String): DataFrame = {
    val x = col(valueCol).cast("long")
    val moments = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"),
        sum(x * x).as("sx2"))
    df.select((groupCols.map(col) :+ col(idCol) :+ x.as("x")): _*)
      .join(moments, groupCols)
      .withColumn("mean", col("sx").cast("double") / col("n"))
      .withColumn("variance",
        (col("sx2") - col("sx").cast("double") * col("sx") / col("n"))
          / col("n"))
      .withColumn("adv",
        when(col("n") === 1L || col("variance") <= 0.0, 0.0)
          .otherwise((col("x") - col("mean")) / sqrt(col("variance"))))
      .select((groupCols.map(col) :+ col(idCol) :+ col("x").as("value") :+
        col("n") :+ round(col("adv"), 6).as("advantage")): _*)
  }

  /**
   * Bradley–Terry strength fitting over pairwise outcomes — the
   * preference-model step behind reward shaping and arena-style model
   * ranking (Elo's order-free batch cousin: no sequential game order,
   * so the fit is deterministic under any partitioning). Two fixed
   * rounds of the Hunter (2004) MM update
   * `s_i ← W_i / Σ_j n_ij / (s_i + s_j)` from s ≡ 1:
   * round 1 collapses to the closed form 2·W_i/N_i (one double
   * division — bit-exact), round 2 is the first genuinely coupled
   * update. Ratings are round(…, 6): the Σ_j term is a float sum over
   * each player's opponent set (the jsd-family rounding contract).
   *
   * Whenever n_ij > 0, s1_i + s1_j > 0 (someone won at least one of
   * those games), so round 2 never divides by zero; an all-losing
   * player rates exactly 0.
   *
   * Scale shape: one groupBy over directed pair counts, a symmetrized
   * union, two keyed aggregations and two broadcast-or-shuffle joins
   * against the player-sized ratings table — comparisons stream
   * through, nothing is collected.
   *
   * @param matches one row per comparison, already tie-broken
   */
  def bradleyTerry(
      matches: DataFrame,
      winnerCol: String,
      loserCol: String): DataFrame = {
    val m = matches.select(col(winnerCol).cast("long").as("w"),
      col(loserCol).cast("long").as("l"))
    val dir = m.groupBy(col("w").as("i"), col("l").as("j"))
      .agg(count(lit(1)).as("wn"))
    val sym = dir.select(col("i"), col("j"), col("wn").as("w"), col("wn").as("n"))
      .unionByName(dir.select(col("j").as("i"), col("i").as("j"),
        lit(0L).as("w"), col("wn").as("n")))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("w")).as("w"), sum(col("n")).as("n"))
    sym.persist()
    val agg = sym.groupBy(col("i"))
      .agg(sum(col("w")).cast("long").as("w_i"),
        sum(col("n")).cast("long").as("n_i"))
    val s1 = agg.select(col("i"),
      (lit(2.0) * col("w_i") / col("n_i")).as("s"))
    val den = sym
      .join(s1.select(col("i"), col("s").as("s_i")), Seq("i"))
      .join(s1.select(col("i").as("j"), col("s").as("s_j")), Seq("j"))
      .groupBy(col("i"))
      .agg(sum(col("n") / (col("s_i") + col("s_j"))).as("d"))
    val out = agg.join(den, Seq("i"))
      .select(col("i").as("player"), col("w_i").as("wins"),
        col("n_i").as("comparisons"),
        round(when(col("w_i") === 0L, 0.0)
          .otherwise(col("w_i") / col("d")), 6).as("rating"))
      .localCheckpoint()
    sym.unpersist()
    out
  }
}
