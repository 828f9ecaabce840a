package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{text => gtext}

/**
 * FineWeb-Edu-style document quality classification at corpus scale: a
 * linear bag-of-hashed-words model applied as ONE narrow codegen'd
 * projection — tokenize → md5 feature bucket → weight-table lookup →
 * per-class integer score sums. No shuffle, no UDF, no explode: the
 * whole pass is linear in corpus bytes, so "score every document with a
 * cheap quality classifier" stays a single map stage at 100 TB (the
 * groupBy/threshold decisions downstream compose onto the scored frame).
 *
 * Scores are EXACT integer weight sums: every class shares the
 * denominator (1000 · n_tokens), so it cancels in the argmax and
 * classification needs no floating point at all. Tie-break is
 * (sum DESC, class ASC), mirrored in the SQL oracle via an ordered CASE.
 *
 * Weights here are md5-derived pseudo-weights — deterministic and
 * engine-independent (`md5Lower64` == DuckDB `md5_number_lower`, so the
 * oracle rebuilds the table hash-for-hash). A real trained model (e.g. a
 * fastText export) drops in through the same seam as literal arrays.
 */
object Classifier {

  /** Little-endian uint64 of MD5 bytes 8..15 — the driver-side scalar
    * twin of `graft.functions.text.md5_lower64` (== DuckDB
    * `md5_number_lower`), used only to derive the small weight table. */
  private def md5Lower64(s: String): Long = {
    val bytes = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (bytes(i) & 0xffL); i -= 1 }
    h
  }

  /** Deterministic weight table: weight(b, c) ∈ [-1000, 1000] derived
    * from md5 of "seed:bucket:class" — rebuildable in oracle SQL as
    * `CAST((md5_number_lower(seed||':'||b||':'||c) >> 1) % 2001 AS BIGINT) - 1000`. */
  def weightTable(seed: String, buckets: Int, classes: Int): IndexedSeq[IndexedSeq[Long]] =
    (0 until classes).map { c =>
      (0 until buckets).map { b =>
        (md5Lower64(s"$seed:$b:$c") >>> 1) % 2001L - 1000L
      }
    }

  /** 63-bit md5 feature bucket of one token (non-negative, so signed %
    * equals DuckDB's unsigned %). */
  private def bucketOf(tok: Column, buckets: Int): Column =
    pmod(shiftrightunsigned(gtext.md5_lower64(tok), 1), lit(buckets.toLong)).cast("int")

  /**
   * Score `df` against the model: appends
   *   `n_tokens`   LONG   — whitespace token count,
   *   `class_sums` ARRAY<LONG> — exact integer weight sum per class,
   *   `pred_class` INT    — argmax class, ties to the smallest class id.
   *
   * One aggregate over the per-row bucket array updates all C
   * accumulator lanes per token, so each token is hashed exactly once
   * regardless of the class count.
   */
  def scoreDocs(
      df: DataFrame,
      textCol: String,
      buckets: Int,
      classes: Int,
      seed: String): DataFrame = {
    require(classes >= 2, "need at least two classes")
    val w = weightTable(seed, buckets, classes)
    val wLits = (0 until classes).map(c => typedlit(w(c)))

    val toks = TextAnalysis.tokens(col(textCol))
    val bkts = transform(toks, t => bucketOf(t, buckets))
    val zero = array((0 until classes).map(_ => lit(0L)): _*)
    val sums = aggregate(bkts, zero, (acc, b) =>
      array((0 until classes).map(c => element_at(acc, c + 1) + element_at(wLits(c), b + 1)): _*))

    val scored = df
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("class_sums", sums)
    // argmax with smallest-class tie-break: lexicographic max of
    // (sum, -class) structs — orderable, codegen-friendly, no UDF.
    val packed = (0 until classes).map(c =>
      struct(element_at(col("class_sums"), c + 1).as("s"), lit(-c).as("nc")))
    scored.withColumn("pred_class", -greatest(packed: _*).getField("nc"))
  }
}
