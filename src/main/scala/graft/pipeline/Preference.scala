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
}
