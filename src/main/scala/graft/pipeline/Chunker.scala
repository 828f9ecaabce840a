package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Context-window document chunking — split each document into
 * overlapping token windows of `width` tokens every `stride` tokens,
 * the standard pre-training / RAG-ingestion shaping step ("pack long
 * documents into model-context-sized pieces with overlap so no span
 * straddles a boundary unseen").
 *
 * Pure narrow operations: one whitespace tokenization, one
 * `sequence`+`explode` per document, one `slice` per window — no
 * shuffle at all (the plan is a single scan→project→generate chain),
 * so it scales embarrassingly: 100 TB of documents chunk at full
 * parallelism with zero exchange. Window starts are 0, stride,
 * 2·stride, … strictly below the token count; the final window is
 * allowed to be short (`n_chunk_tokens` < width) rather than dropped,
 * so every token lands in ≥1 chunk.
 */
object Chunker {

  /** Whitespace tokens with empties dropped (leading-space split
    * artifact), shared with the oracle's
    * `list_filter(regexp_split_to_array(text,'\s+'), …)`. */
  private def toks(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /**
   * One row per (document, window): `chunk_id` (0-based window index),
   * `n_chunk_tokens`, and the re-joined `chunk_text`. Documents with
   * null or whitespace-only text produce no rows.
   */
  def chunkTokens(
      df: DataFrame,
      textCol: String,
      width: Int,
      stride: Int): DataFrame = {
    require(width >= 1 && stride >= 1, "width and stride must be positive")
    require(stride <= width,
      s"stride ($stride) > width ($width) would leave tokens covered by no chunk")
    df.filter(col(textCol).isNotNull)
      .withColumn("__toks", toks(col(textCol)))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .withColumn("__start",
        explode(sequence(lit(0), col("__n") - 1, lit(stride))))
      .select(
        df.columns.map(col) :+
          expr(s"__start div $stride").cast("long").as("chunk_id") :+
          size(slice(col("__toks"), col("__start") + 1, lit(width)))
            .cast("long").as("n_chunk_tokens") :+
          array_join(slice(col("__toks"), col("__start") + 1, lit(width)), " ")
            .as("chunk_text"): _*)
  }
}
