package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col}

/**
 * Schema evolution across corpus generations — a long-lived corpus is
 * written over months by pipeline versions with different schemas
 * (columns added: language tags, quality scores, provenance), and a
 * 100 TB reprocess cannot rewrite old generations first. The standard
 * recipe: parquet footer-level schema union on read (`mergeSchema` —
 * absent columns surface as NULL), then explicit per-column defaults so
 * downstream operators never see generation-dependent NULLs.
 *
 * Scale notes: `mergeSchema` reconciles FOOTERS, not data — cost is one
 * footer read per file (driver-side listing scale, not data scale), and
 * column pruning / filter pushdown still apply per file afterwards; a
 * file without a pruned column scans nothing for it. Defaults are
 * `coalesce` projections — codegen'd, pipelined into the scan, and they
 * keep NOT-NULL semantics a later filter or join key can rely on.
 * Incompatible TYPE changes (int -> string) are NOT handled here —
 * parquet merge rejects them loudly, which is the correct failure mode
 * for a corpus boundary.
 */
object SchemaEvolution {

  /** Read every generation under `path` with footer-level schema union,
    * then apply `defaults`: each named column becomes
    * `coalesce(col, default)` — rows from generations that predate the
    * column get the default instead of NULL. Columns in `defaults` that
    * no generation has yet are added as the default outright. */
  def readEvolved(spark: SparkSession, path: String,
      defaults: Map[String, Column]): DataFrame = {
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    defaults.toSeq.sortBy(_._1).foldLeft(merged) { case (df, (name, dflt)) =>
      if (df.columns.contains(name))
        df.withColumn(name, coalesce(col(name), dflt))
      else df.withColumn(name, dflt)
    }
  }
}
