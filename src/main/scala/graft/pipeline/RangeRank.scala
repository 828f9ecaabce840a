package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact global row_number WITHOUT a single-partition total sort.
 *
 * `row_number().over(Window.orderBy(...))` with no partitionBy plans an
 * Exchange SinglePartition feeding the Window — one task sorts the whole
 * input, the canonical scale-killer on a fact table (fine on a bounded
 * aggregate, fatal at 100 TB of rows). This helper produces the SAME
 * rank with a distributed, fully DETERMINISTIC two-level shape for keys
 * whose primary component has a domain-bounded distinct count (prices in
 * cents, days, small-cardinality codes — the usual rank subjects):
 *
 *   1. histogram of the primary key: `groupBy(k).count` — one map-side-
 *      combined shuffle whose output is bounded by the key DOMAIN, not
 *      the fact table (events sf0.01→sf0.1: 10× rows, 2.7× distinct);
 *   2. cumulative offsets over the DISTINCT keys — a global window, but
 *      over the bounded histogram (the accepted Gini/Lorenz class);
 *   3. broadcast the offsets back and rank WITHIN each tie group by the
 *      tiebreak columns (`row_number` partitioned by the key — per-group
 *      sorts, the largest task sorts only the biggest tie group);
 *      global rank = group offset + in-group rank.
 *
 * Every step is deterministic — no `repartitionByRange` anywhere. That
 * is deliberate: range-boundary SAMPLING is seeded per RDD instance, so
 * when column pruning makes two consumers of the ranked output compile
 * to different scans (breaking exchange reuse), two evaluations of the
 * same range exchange can assign rows to different partitions and the
 * reconstructed ranks silently corrupt (measured at sf0.01: decile
 * counts off by ±18, varying run to run). A sampling-free rank cannot
 * disagree with itself.
 *
 * The (primary, tiebreak*) tuple must be a unique total order for the
 * rank to be reproducible across engines.
 */
object RangeRank {

  def boundedDomainRank(
      df: DataFrame,
      primary: Column,
      tiebreak: Seq[Column],
      out: String,
      totalCol: Option[String] = None): DataFrame = {
    val tagged = df.withColumn("__bd_k", primary)
    val hist = tagged.groupBy(col("__bd_k"))
      .agg(count(lit(1)).cast("long").as("__bd_f"))
    val wk = Window.orderBy(col("__bd_k"))
    val offsets = hist
      .withColumn("__bd_before",
        coalesce(sum(col("__bd_f"))
          .over(wk.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__bd_total",
        sum(col("__bd_f"))
          .over(wk.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)).cast("long"))
      .drop("__bd_f")
    val wTie = Window.partitionBy(col("__bd_k")).orderBy(tiebreak: _*)
    val ranked = tagged.join(broadcast(offsets), Seq("__bd_k"))
      .withColumn(out,
        col("__bd_before") + row_number().over(wTie).cast("long"))
    val withTotal = totalCol match {
      case Some(t) => ranked.withColumn(t, col("__bd_total"))
      case None => ranked
    }
    withTotal.drop("__bd_k", "__bd_before", "__bd_total")
  }

  /** Exact ntile(k) from a [[boundedDomainRank]]-style exact rank +
    * total: the first (n mod k) buckets take ceil(n/k) rows, the rest
    * floor(n/k) — the standard SQL ntile contract, reproduced from the
    * distributed rank so no single-partition Window is ever planned. */
  def ntileFromRank(rk: Column, n: Column, k: Int): Column = {
    // Column `/` is true (double) division; all operands here are
    // non-negative longs (exact in a double far past any real rank), so
    // subtract-mod-divide gives the integral quotient.
    def idiv(a: Column, b: Column): Column = ((a - (a % b)) / b).cast("long")
    val base = idiv(n, lit(k.toLong))
    val rem = n % k
    val cut = rem * (base + 1L)
    when(rk <= cut, idiv(rk - 1L, base + 1L) + 1L)
      .otherwise(rem + idiv(rk - cut - 1L, base) + 1L)
  }
}
