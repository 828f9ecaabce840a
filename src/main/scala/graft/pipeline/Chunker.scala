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
  /**
   * Content-defined chunking (CDC) at token granularity — the
   * dedup-stable segmentation (the token-level analog of gear/Rabin
   * byte CDC used by dedup stores and sub-document near-dup pipelines):
   * a chunk boundary falls AFTER token t iff
   * `(md5_lower64(t) >>> 1) mod avgTokens == 0` — a hash gate on the
   * token's CONTENT, nothing positional. Expected chunk length is
   * `avgTokens`; every boundary decision is local to one token, so an
   * edit or insertion perturbs only the chunk it lands in (and at most
   * its neighbor if the edited token was itself a gate) while every
   * other chunk keeps its fingerprint — unlike fixed-width windows,
   * where one prepended token re-keys every downstream chunk (the
   * property pinned by ChunkerSpec's prepend test, and what makes
   * chunk-fingerprint dedup across document revisions work).
   *
   * Same scale shape as [[chunkTokens]]: tokenize, per-token hash gate,
   * boundary-position arrays, one explode — a scan→project→generate
   * chain with ZERO exchange. A document with no gate tokens is one
   * chunk; a trailing gate token would produce an empty final chunk,
   * which is dropped (start > end), keeping `chunk_idx` contiguous.
   *
   * Output: idCol, chunk_idx, start_tok, n_toks, chunk_fp (md5 hex of
   * the space-rejoined chunk — the cross-revision dedup key).
   */
  def cdcChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      avgTokens: Int): DataFrame = {
    require(avgTokens >= 2, "avgTokens must be >= 2 (1 would cut after every token)")
    import graft.functions.text
    // spans come from ONE kernel pass (graft.functions.CdcSpansExpr —
    // a composed filter/concat Column formulation re-ran the per-token
    // md5 scan once per consumer); the kernel consumes the pre-split
    // __toks array, so the whitespace regex split also runs once per
    // row and feeds both the gate scan and the chunk_fp slicing.
    // posexplode ordinals are the chunk index because the kernel keeps
    // spans contiguous. The Generate node is a projection barrier, so
    // __toks is computed once below it and sliced by attribute above it.
    df.filter(col(textCol).isNotNull)
      .withColumn("__toks", toks(col(textCol)))
      .select(Seq(col(idCol), col("__toks")) :+
        posexplode(text.cdc_spans(col("__toks"), avgTokens)).as(Seq("chunk_idx", "__sp")): _*)
      .select(
        col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("__sp.s").cast("long").as("start_tok"),
        (col("__sp.e") - col("__sp.s") + 1).cast("long").as("n_toks"),
        md5(array_join(
          slice(col("__toks"), col("__sp.s") + 1, col("__sp.e") - col("__sp.s") + 1),
          " ").cast("binary")).as("chunk_fp"))
  }

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
