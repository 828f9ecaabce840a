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

    // NULL *and* NaN rows are excluded from the histogram: NaN passes
    // isNotNull but floor/cast would silently land it in bin 0 on the
    // Spark side while DuckDB errors casting NaN to INT.
    val counted = df.filter(col(valueCol).isNotNull && !isnan(col(valueCol)))
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

  /**
   * Jensen–Shannon divergence of each group's unigram distribution vs
   * the REST of the corpus, over the corpus-wide top-`v` vocabulary —
   * the corpus-mixing diagnostic (which source is the odd one out, is a
   * new crawl slice distributionally novel). Bounded: 0 = identical,
   * ln 2 = disjoint.
   *
   * Shape: one tokenize+explode pass → (group, term) counts; the top-v
   * vocabulary is a TakeOrdered cut (count desc, term asc tie-break —
   * never a global sort); per-group JSD is one grouped sum over ≤ v
   * joined rows. Distributions are add-1 smoothed over the vocabulary
   * (in-group token totals RESTRICTED to the vocab), so zero-count
   * terms stay finite. The per-term summands are O(1/v) doubles summed
   * by a float agg — callers round (6) for cross-engine compares, the
   * lang-entropy precedent.
   */
  def jsdByGroup(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      v: Int): DataFrame = {
    require(v >= 2, "need at least a 2-term vocabulary")
    val terms = df.select(col(groupCol).as("grp"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
    terms.persist()
    val vocab = terms.groupBy(col("term")).agg(count(lit(1)).as("total"))
      .orderBy(col("total").desc, col("term")).limit(v)
      .persist() // ≤ v rows; every downstream subtree re-reads it
    // smoothing must add over the REALIZED vocabulary (a corpus with
    // fewer than v distinct terms otherwise leaks probability mass and
    // flattens every divergence); count() also materializes the persist
    // BEFORE terms is released, so the corpus tokenization runs once
    val actualV = vocab.count()
    val grpCounts = terms.join(broadcast(vocab.select("term")), Seq("term"))
      .groupBy(col("grp"), col("term")).agg(count(lit(1)).as("cnt"))
    grpCounts.persist().count() // release the token explosion early
    terms.unpersist()
    // dense (grp × vocab) grid: zero-count cells must exist for smoothing.
    // Groups come from the INPUT, not from grpCounts — a group with zero
    // tokens in the vocabulary (the oddest possible slice: wrong language,
    // binary junk) must score its near-ln2 JSD, not vanish from the output.
    val grps = df.select(col(groupCol).as("grp")).distinct()
    val grid = grps.crossJoin(broadcast(vocab))
      .join(grpCounts, Seq("grp", "term"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val totals = grid.groupBy(col("grp")).agg(sum(col("cnt")).as("n_grp"))
    val corpus = grid.groupBy(col("term")).agg(sum(col("cnt")).as("cnt_all"))
    val allTotal = totals.agg(sum(col("n_grp")).as("n_all"))
    val scored = grid
      .join(broadcast(totals), Seq("grp"))
      .join(broadcast(corpus), Seq("term"))
      .crossJoin(broadcast(allTotal))
      .withColumn("p", (col("cnt") + 1L).cast("double") / (col("n_grp") + actualV))
      .withColumn("q", (col("cnt_all") - col("cnt") + 1L).cast("double") /
        (col("n_all") - col("n_grp") + actualV))
      .withColumn("m", (col("p") + col("q")) / 2.0)
      .withColumn("contrib",
        col("p") * log(col("p") / col("m")) / 2.0 +
          col("q") * log(col("q") / col("m")) / 2.0)
    val out = scored.groupBy(col("grp"))
      .agg(max(col("n_grp")).as("n_vocab_tokens"), sum(col("contrib")).as("jsd"))
      .select(col("grp").as(groupCol), col("n_vocab_tokens"), col("jsd"))
      .localCheckpoint() // materialize (group-sized) before releasing the caches
    grpCounts.unpersist()
    vocab.unpersist()
    out
  }
}
