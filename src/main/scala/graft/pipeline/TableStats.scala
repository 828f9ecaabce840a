package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * ANALYZE-style per-column statistics — row count, null count, exact
 * NDV, and min/max — the stats table an optimizer (or a data-quality
 * monitor) keeps per corpus snapshot.
 *
 * One pass over the data: all per-column aggregates run in a single
 * `agg` (Spark plans the multiple DISTINCT aggregates via one Expand —
 * n_cols× row expansion inside one scan, the standard plan, still one
 * shuffle); the wide 1-row result is unpivoted to (col_name, …) rows
 * with an inline explode — nothing touches the driver.
 *
 * min/max are emitted as strings OF SAFE TYPES ONLY (integers and
 * varchars render identically everywhere; raw doubles don't — Spark
 * says `1.0E7` where DuckDB says `10000000.0` — so money columns go
 * in pre-scaled to integer cents).
 */
object TableStats {

  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__ndv_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    } :+ count(lit(1)).as("__rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__rows").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"),
        (col("__rows") - col(s"__nn_$c")).as("n_null"),
        col(s"__ndv_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))
    }
    wide.select(explode(array(entries: _*)).as("s"))
      .select(col("s.*"))
      .orderBy(col("col_name"))
  }

  /**
   * Data-quality expectations report (the dbt-test / Deequ-shaped
   * check): not-null, uniqueness, and arbitrary row-predicate rules
   * evaluated in ONE pass (a single agg; uniqueness rides the same
   * Expand as [[columnStats]]' NDVs), unpivoted to one row per rule
   * with its violation count and verdict. A pipeline gates promotion
   * on `passed` — and because the report is itself a DataFrame, the
   * gate composes with everything else.
   */
  def qualityReport(
      df: DataFrame,
      notNullCols: Seq[String],
      uniqueCols: Seq[String],
      predicates: Seq[(String, Column)]): DataFrame = {
    require(notNullCols.nonEmpty || uniqueCols.nonEmpty || predicates.nonEmpty,
      "at least one rule")
    val aggs =
      Seq(count(lit(1)).as("__n")) ++
        notNullCols.map(c => count(col(c)).as(s"__nn_$c")) ++
        uniqueCols.map(c => count_distinct(col(c)).as(s"__nd_$c")) ++
        predicates.map { case (name, pass) =>
          sum(when(pass, 0L).otherwise(1L)).as(s"__v_$name")
        }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries =
      notNullCols.map(c => struct(lit(s"not_null:$c").as("rule"),
        col("__n").as("n_checked"),
        (col("__n") - col(s"__nn_$c")).as("n_violations"))) ++
      uniqueCols.map(c => struct(lit(s"unique:$c").as("rule"),
        col("__n").as("n_checked"),
        (col("__n") - col(s"__nd_$c")).as("n_violations"))) ++
      predicates.map { case (name, _) => struct(lit(name).as("rule"),
        col("__n").as("n_checked"), col(s"__v_$name").as("n_violations")) }
    wide.select(explode(array(entries: _*)).as("s"))
      .select(col("s.*"))
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy(col("rule"))
  }

  /**
   * Order-insensitive dataset content digest — the dataset-versioning
   * primitive: every row hashes to a 63-bit value (md5_lower64 of the
   * -joined canonical column string, >>> 1 per the repo's
   * positive-range hash idiom), and the digest is (count, Σhash, ⊕hash).
   * Row order and partitioning can't affect it, and it combines across
   * shards/appends by (add, add, xor) — so an incremental pipeline can
   * maintain the digest without rescanning (TableStatsSpec pins the
   * combine law). Σ runs in DECIMAL(38,0): 2^40 rows × 2^63 ≈ 1e31
   * still fits exactly, no modular wrap needed.
   *
   * Column values must render engine-identically (integers/strings —
   * the same safe-types rule as [[columnStats]] min/max).
   */
  def datasetDigest(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    val canon = concat_ws("", cols.map(c => col(c).cast("string")): _*)
    val h = shiftrightunsigned(graft.functions.text.md5_lower64(canon), 1)
    df.select(h.as("h"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("h").cast("decimal(38,0)")).cast("string").as("digest_sum"),
        expr("bit_xor(h)").as("digest_xor"))
  }
}
