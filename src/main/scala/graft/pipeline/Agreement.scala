package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/**
 * Labeling quality control for annotation/RLHF pipelines: inter-rater
 * agreement (Cohen's kappa) between two categorical labelers, per group
 * — the gate in front of accepting a labeling batch (kappa < 0.4 = send
 * the batch back; raters can be humans, model judges, or heuristics).
 *
 * Scale shape: ONE grouped aggregation — the k×k confusion matrix
 * unrolls into conditional-count columns (map-side combined), and
 * po/pe/kappa are FIXED-ORDER expression arithmetic over those integer
 * counts, so everything up to the final divisions is exact and the
 * doubles are bit-deterministic (no float agg, no collect).
 */
object Agreement {

  /**
   * Cohen's kappa between `raterA` and `raterB` over a fixed category
   * list (labels outside `categories` are ignored — both raters must
   * land in the vocabulary for the row to count).
   *
   * Output per group: n (rows rated in-vocabulary by both), po (observed
   * agreement), pe (chance agreement from the marginals), kappa
   * ((po−pe)/(1−pe); 1.0 when pe = 1 — degenerate single-category
   * agreement; all three 0.0 when n = 0, so a wholly un-ratable batch
   * FAILS a "kappa ≥ threshold" QA gate instead of null-skipping it).
   * Raw doubles — callers round for cross-engine compares.
   */
  def cohenKappa(
      df: DataFrame,
      groupCols: Seq[String],
      raterA: String,
      raterB: String,
      categories: Seq[String]): DataFrame = {
    require(categories.size >= 2, "at least two categories")
    val inVocab = col(raterA).isin(categories: _*) && col(raterB).isin(categories: _*)

    // Confusion cells are named by category INDEX, not label: labels with
    // underscores/dots would collide or break col() resolution.
    val idx = categories.indices
    val cells = for (i <- idx; j <- idx) yield
      sum(when(inVocab && col(raterA) === categories(i) && col(raterB) === categories(j), 1L)
        .otherwise(0L))
        .as(s"c_${i}_$j")
    val aggs = Seq(sum(when(inVocab, 1L).otherwise(0L)).as("n")) ++ cells

    val counted = df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)

    val diag = idx.map(i => col(s"c_${i}_$i")).reduce(_ + _)
    // marginals in fixed category order
    val pe = idx.map { k =>
      val rowMarg = idx.map(j => col(s"c_${k}_$j")).reduce(_ + _)
      val colMarg = idx.map(i => col(s"c_${i}_$k")).reduce(_ + _)
      rowMarg.cast("double") * colMarg / (col("n").cast("double") * col("n"))
    }.reduce(_ + _)
    val po = diag.cast("double") / col("n")

    counted
      .withColumn("po", when(col("n") === 0L, 0.0).otherwise(po))
      .withColumn("pe", when(col("n") === 0L, 0.0).otherwise(pe))
      .withColumn("kappa",
        when(col("n") === 0L, 0.0)
          .when(col("pe") >= 1.0, lit(1.0))
          .otherwise((col("po") - col("pe")) / (lit(1.0) - col("pe"))))
      .select(groupCols.map(col) ++
        Seq(col("n"), col("po"), col("pe"), col("kappa")): _*)
  }
}
