package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.FloatPacker
import graft.functions.vector

/**
 * Ingest-side source adapters: normalize external vector representations
 * into the engine's canonical `ARRAY<FLOAT>` embedding column.
 *
 * Three wire formats are supported (SURVEY.md §2.7 K7 — the packed-bytes
 * format is byte-compatible with the reference's FloatPacker little-endian
 * layout, enabling lossless import/export against the reference's records):
 *  1. native parquet ARRAY<FLOAT> (identity)
 *  2. packed little-endian float32 BINARY
 *  3. delimited string (CSV-embedded vectors)
 */
object VectorSources {

  /** BINARY little-endian float32 → ARRAY<FLOAT> (FloatPacker layout). */
  def unpackEmbedding(packed: Column): Column = {
    val toFloats = udf((b: Array[Byte]) => if (b == null) null else FloatPacker.unpack(b))
    toFloats(packed)
  }

  /** ARRAY<FLOAT> → packed little-endian BINARY (export path). */
  def packEmbedding(emb: Column): Column = {
    val toBytes = udf((v: Seq[Float]) => if (v == null) null else FloatPacker.pack(v.toArray))
    toBytes(emb)
  }

  /** Delimited-string vector ("0.1,0.2,...") → ARRAY<FLOAT> — native
    * split+cast, no UDF. */
  def parseDelimited(s: Column, delimiter: String = ","): Column =
    transform(split(s, java.util.regex.Pattern.quote(delimiter)),
      t => trim(t).cast("float"))

  /** Read a CSV of (id, vector-string) into the canonical shape. */
  def readCsvVectors(
      spark: SparkSession,
      path: String,
      idCol: String = "id",
      vecCol: String = "vector",
      delimiter: String = ";"): DataFrame =
    spark.read.option("header", "true").csv(path)
      .select(col(idCol).cast("long").as("id"),
        parseDelimited(col(vecCol), delimiter).as("embedding"))

  /** Round-trip sanity: norm of unpack(pack(v)) equals norm(v). Useful as a
    * cheap import validation predicate. */
  def roundTripCheck(df: DataFrame, embCol: String): Long =
    df.filter(
      abs(vector.vec_norm(unpackEmbedding(packEmbedding(col(embCol)))) -
        vector.vec_norm(col(embCol))) > 1e-6)
      .count()
}
