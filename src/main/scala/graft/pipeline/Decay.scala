package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Time-decayed aggregation (recency-weighted engagement / freshness
 * scoring) with EXACT integer arithmetic: the decay weight is a power of
 * two chosen by the event's age in half-life units, so every
 * contribution is `cents × 2^k` — an exact integer — and the sum is
 * order- and engine-independent (no float-summation drift, fully
 * oracle-checkable). The float score is derived from the exact scaled
 * sum by ONE IEEE division at the end.
 *
 * Decay model: step-wise half-life — weight halves each `halfLifeDays`
 * of age, floored at `maxUnits` units (events older than
 * `maxUnits × halfLifeDays` all carry the minimum weight 1). This is the
 * standard trick for making exponential decay mergeable and exact:
 * everything is integers until the final rescale.
 *
 * Scale shape: one narrow projection (datediff → clamp → table lookup →
 * multiply) + one hash aggregation on the group keys; partial (map-side)
 * aggregation applies because integer SUM is associative. The scaled
 * sums accumulate in decimal(38,0), so 100 TB of events cannot silently
 * wrap a BIGINT mid-aggregation.
 */
object Decay {

  /**
   * @param df           input with the reference date already attached
   *                     (e.g. via a broadcast 1-row max-date aggregate)
   * @param keyCols      group-by keys
   * @param tsCol        event timestamp column
   * @param valueCol     2-decimal numeric value column
   * @param refDate      reference DATE column (ages measured back from it)
   * @param halfLifeDays days per halving step
   * @param maxUnits     clamp on halving steps (max weight = 2^maxUnits)
   * @return keyCols + n_events + decayed_scaled (exact BIGINT,
   *         Σ cents·2^(maxUnits−units)) + decayed_score
   *         (= decayed_scaled / (100·2^maxUnits))
   */
  def timeDecayedSum(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      refDate: Column,
      halfLifeDays: Int,
      maxUnits: Int): DataFrame = {
    require(halfLifeDays > 0 && maxUnits >= 0 && maxUnits <= 40,
      "halfLifeDays must be positive, maxUnits in [0, 40]")
    val age = datediff(refDate, to_date(col(tsCol)))
    val units = least(lit(maxUnits),
      greatest(lit(0), floor(age / lit(halfLifeDays)).cast("int")))
    // 2^(maxUnits - units) via a literal power table: exact, codegen'd,
    // no Column-typed shift needed
    val powers = typedlit((0 to maxUnits).map(k => 1L << k))
    val weight = element_at(powers, lit(maxUnits + 1) - units)
    val cents = round(col(valueCol) * 100).cast("long")
    val contrib = (cents * weight).cast("decimal(38,0)")
    df.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        sum(contrib).cast("long").as("decayed_scaled"))
      .withColumn("decayed_score",
        col("decayed_scaled").cast("double") / lit(100.0 * (1L << maxUnits)))
  }
}
