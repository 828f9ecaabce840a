package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental materialized-view maintenance — the aggregate a 100 TB
 * warehouse keeps fresh WITHOUT recomputing the base table: the view's
 * state is the partial-aggregate algebra itself (per-key count / sum /
 * min / max), so appending a delta is `merge(state, aggState(delta))` —
 * a keyed combine over the THIN state rows, never a rescan of the base.
 *
 * Shape at scale: `aggState(delta)` partial-aggregates map-side (the
 * delta collapses to ≤ |keys| rows per task before the shuffle);
 * `merge` unions two |keys|-sized frames and re-aggregates — one keyed
 * shuffle whose volume is the key cardinality, independent of base
 * size. Maintaining a view over a 100 TB base under a 100 GB daily
 * delta touches the delta once and the state twice; a recompute
 * touches 100 TB. min/max are append-only-correct (they are NOT
 * subtractable — deletions need the CDC fold in [[Snapshot]] upstream,
 * or a recompute of the affected keys).
 *
 * The sum column must be EXACT (integer/decimal): float sums are
 * order-sensitive, and an incremental state would drift from the
 * recompute it must stay equal to. Callers scale money to integer
 * units first (the repo-wide oracle-parity rule).
 */
object Mv {

  /** Partial-aggregate state of `df` for an additive view keyed on
    * `keys`: per-key (mv_n, mv_sum, mv_min, mv_max) over `valueCol`.
    *
    * `mv_n` has count(*) semantics: rows where `valueCol` is NULL count
    * toward `mv_n` but are ignored by mv_sum/min/max, so
    * `mv_sum / mv_n` equals SQL `AVG(valueCol)` only on null-free
    * inputs. Callers needing AVG parity on nullable columns must filter
    * nulls upstream. */
  def aggState(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("mv_n"),
        sum(col(valueCol)).as("mv_sum"),
        min(col(valueCol)).as("mv_min"),
        max(col(valueCol)).as("mv_max"))

  /** Merge two states (associative + commutative — any batching of
    * deltas, in any order, folds to the one-shot aggregate). */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("mv_n")).as("mv_n"),
        sum(col("mv_sum")).as("mv_sum"),
        min(col("mv_min")).as("mv_min"),
        max(col("mv_max")).as("mv_max"))

  /** Read view: derive the non-mergeable finishers (avg) from the
    * mergeable state. The division is one double op over two exact
    * integers — bit-identical in any engine. */
  def finish(state: DataFrame): DataFrame =
    state.withColumn("mv_avg",
      round(col("mv_sum").cast("double") / col("mv_n"), 4))
}
