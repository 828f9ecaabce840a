package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distribution-drift monitoring for continuously-ingested corpora: the
 * Population Stability Index (PSI) between a baseline slice and a
 * current slice, per group — the standard "did the data shift under me"
 * dial in front of retraining decisions (PSI < 0.1 stable, 0.1–0.25
 * drifting, > 0.25 shifted).
 *
 * Scale shape: ONE grouped aggregation pass over the table — the fixed
 * bin grid unrolls into 2·B conditional-count columns (all map-side
 * combined), and the PSI itself is a FIXED-ORDER expression chain over
 * those counts, so the transcendental sum is bit-deterministic (no
 * float-agg ordering anywhere). Nothing lands on the driver; adding a
 * group key scales the output, not the pass.
 */
object Drift {

  /**
   * PSI over a fixed bin grid [lo, hi) with `bins` equal-width cells
   * (values outside clamp to the edge cells, the standard guard-rail
   * convention). `baseline` marks the reference slice; rows where it is
   * false are the current slice. Laplace-smoothed proportions
   * p = (c+1)/(n+bins) keep empty cells finite on both sides.
   *
   * Output per group: n_base, n_curr, psi (raw double — callers round
   * for cross-engine compares). NULL values are dropped before any
   * counting (a null-valued row belongs to no bin; counting it into
   * n_base/n_curr but no cell would silently deflate every proportion).
   */
  def psiFixedBins(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      baseline: Column,
      bins: Int,
      lo: Double,
      hi: Double): DataFrame = {
    require(bins >= 2, "at least two bins")
    require(hi > lo, "empty value range")
    val width = (hi - lo) / bins
    val rawBin = floor((col(valueCol) - lo) / width).cast("int")
    val bin = least(greatest(rawBin, lit(0)), lit(bins - 1))

    val cellCounts: Seq[Column] = (0 until bins).flatMap { i =>
      Seq(
        sum(when(baseline && bin === i, 1L).otherwise(0L)).as(s"cb_$i"),
        sum(when(!baseline && bin === i, 1L).otherwise(0L)).as(s"cc_$i"))
    }
    val aggs = Seq(
      sum(when(baseline, 1L).otherwise(0L)).as("n_base"),
      sum(when(!baseline, 1L).otherwise(0L)).as("n_curr")) ++ cellCounts

    val counted = df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

    // fixed-order fold over the bin cells: psi = Σ_i (pb_i − pc_i)·ln(pb_i/pc_i)
    val psi = (0 until bins).map { i =>
      val pb = (col(s"cb_$i") + 1L).cast("double") / (col("n_base") + bins)
      val pc = (col(s"cc_$i") + 1L).cast("double") / (col("n_curr") + bins)
      (pb - pc) * log(pb / pc)
    }.reduce(_ + _)

    counted
      .withColumn("psi", psi)
      .select(groupCols.map(col) ++ Seq(col("n_base"), col("n_curr"), col("psi")): _*)
  }
}
