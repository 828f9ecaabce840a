package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * SFT chat-template rendering — the shaping step that turns
 * (instruction, response) pairs into the single tagged training string
 * a chat model consumes, together with the ASSISTANT SPAN the loss mask
 * needs (only response tokens get loss; prompt/template tokens are
 * masked out).
 *
 * Pure narrow string operations — concat + length arithmetic, no
 * shuffle at all — so the render pipelines into the scan at any scale,
 * and every output column is replayable in SQL (the rendered string is
 * pinned by its md5, the span by pure length arithmetic).
 */
object SftFormat {

  val SystemTag = "<|system|>\n"
  val SystemPrompt = "You are a helpful data assistant.\n"
  val UserTag = "<|user|>\n"
  val AssistantTag = "<|assistant|>\n"
  val EndTag = "<|end|>"

  private def wsTokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => length(t) > 0)

  /**
   * T5-style span-corruption mask SELECTION — the deterministic heart
   * of the denoising objective: token (doc, pos, t) OPENS a mask span
   * iff `md5_lower64(doc#pos#t) >>> 1 mod gateMod == 0` (content+
   * position hash gate, the CDC trick applied to masking), a gate
   * claims itself and the next token, and overlapping claims merge
   * into maximal runs (gaps-and-islands over the covered positions).
   * Expected corruption rate ≈ 2/gateMod.
   *
   * Emits one row per span — (doc_id, span_idx, start_pos,
   * n_span_tokens, span_text) — which is exactly what a local collator
   * needs to build `<extra_id_k>` inputs/targets; the string assembly
   * stays out of the distributed path on purpose. Shape: one
   * posexplode pass, one lag window, one island agg — all keyed on
   * doc, no corpus-wide state.
   */
  def spanCorruptionSpans(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", gateMod: Int = 8): DataFrame = {
    require(gateMod >= 2, "gateMod must be >= 2")
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col(idCol).as("doc_id"),
      posexplode(wsTokens(col(textCol))).as(Seq("pos", "t")))
    val gated = tok.withColumn("g",
      shiftrightunsigned(graft.functions.text.md5_lower64(
        concat_ws("#", col("doc_id"), col("pos"), col("t"))), 1)
        % gateMod === 0)
    val wLag = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val cov = gated
      .withColumn("covered",
        col("g") || coalesce(lag(col("g"), 1).over(wLag), lit(false)))
      .filter(col("covered"))
    val wRn = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = cov
      .withColumn("island", col("pos") - row_number().over(wRn))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).cast("long").as("start_pos"),
        count(lit(1)).as("n_span_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("t")))),
          x => x.getField("t"))).as("span_text"))
    val wSpan = Window.partitionBy(col("doc_id")).orderBy(col("start_pos"))
    spans
      .withColumn("span_idx", row_number().over(wSpan).cast("long"))
      .select(col("doc_id"), col("span_idx"), col("start_pos"),
        col("n_span_tokens"), col("span_text"))
      .orderBy(col("doc_id"), col("span_idx"))
  }

  /**
   * Derive an (instruction, response) pair from a raw document — split
   * at the first token boundary (space) at or past the character
   * midpoint, the deterministic prompt/response derivation for
   * exercising the template on an unlabeled corpus — then render the
   * chat template and compute the assistant span. Documents that can't
   * split (no space past the midpoint, or an empty side) produce no row.
   *
   * Output per doc: `rendered_md5` (pins the exact rendered string),
   * `n_rendered_chars`, `a_start`/`a_len` (1-based char span of the
   * response inside the rendered string — the loss-mask span), and the
   * whitespace token counts of both sides.
   */
  def renderChat(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val mid = (length(t) / 2).cast("int")
    // first space at or after the midpoint, as a 1-based index into t
    val sp = instr(t.substr(mid + 1, greatest(length(t) - mid, lit(0))), " ")
    val pos = when(sp > 0, mid + sp).otherwise(lit(0))
    // greatest(.,0) totalizes the unsplittable row (pos = 0) — a
    // negative substr length is an ANSI error, and predicate pushdown
    // may evaluate these expressions before the pos > 0 filter
    val prompt = trim(t.substr(lit(1), greatest(pos - 1, lit(0))))
    val resp = trim(t.substr(pos + 1,
      greatest(length(t) - pos, lit(0))))
    val head = concat(lit(SystemTag), lit(SystemPrompt), lit(UserTag),
      col("prompt"), lit("\n"), lit(AssistantTag))
    val rendered = concat(col("head"), col("resp"), lit(EndTag))
    docs
      .select(col(idCol), pos.as("pos"), prompt.as("prompt"), resp.as("resp"))
      .filter(col("pos") > 0 && length(col("prompt")) > 0 &&
        length(col("resp")) > 0)
      .withColumn("head", head)
      .withColumn("rendered", rendered)
      .select(
        col(idCol),
        md5(col("rendered").cast("binary")).as("rendered_md5"),
        length(col("rendered")).cast("long").as("n_rendered_chars"),
        (length(col("head")) + 1).cast("long").as("a_start"),
        length(col("resp")).cast("long").as("a_len"),
        size(wsTokens(col("prompt"))).cast("long").as("n_prompt_toks"),
        size(wsTokens(col("resp"))).cast("long").as("n_resp_toks"))
  }
}
