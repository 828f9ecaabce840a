package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * JSONL corpus interchange — the de-facto exchange format for LLM
 * training corpora (one JSON document per line, usually compressed).
 *
 * Scale notes: JSONL is a row format with no pushdown or pruning — use
 * it at the pipeline BOUNDARY (ingest/export) and convert to parquet for
 * everything downstream. Gzip is the common wire codec but is
 * NOT splittable (one file = one task), so exports shard via the
 * DataFrame's partitioning — `df.repartition(n)` before export controls
 * shard count and hence ingest parallelism on the other side. Reading
 * always takes an explicit schema: schema inference is a full extra
 * pass over 100 TB and types drift silently.
 */
object TextInterchange {

  /** Export `df` as gzip-compressed JSONL shards under `path`. */
  def writeJsonl(df: DataFrame, path: String, compression: String = "gzip"): Unit =
    df.write.mode(SaveMode.Overwrite).option("compression", compression).json(path)

  /** Read JSONL shards with a REQUIRED schema (no inference pass).
    * Corrupt lines land in `_corrupt_record` (PERMISSIVE) instead of
    * failing the 100-TB job — Spark only captures them when the read
    * schema actually CONTAINS the corrupt-record column, so it is
    * appended here; drop it (or route it to quarantine) downstream. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val corruptCol = spark.conf.get(
      "spark.sql.columnNameOfCorruptRecord", "_corrupt_record")
    val withCorrupt =
      if (schema.fieldNames.contains(corruptCol)) schema
      else schema.add(corruptCol, org.apache.spark.sql.types.StringType)
    spark.read.schema(withCorrupt).option("mode", "PERMISSIVE").json(path)
  }
}
