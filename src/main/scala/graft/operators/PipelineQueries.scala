package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Ann, Dedup, Multimodal, TextAnalysis}

/**
 * LLM-data-pipeline operator coverage (dedup / text analysis / similarity
 * search / multimodal — the north-star extensions beyond the reference's
 * surface). SQL-expressible operators carry DuckDB oracles; hash-based
 * ones (xxhash64 signatures) are rows-only here and verified against
 * exact oracles in PipelineSpec.
 *
 * The test corpus plants deterministic duplicates: documents ∪ copies at
 * doc_id+100000 (exact for %10==0, lightly mutated for near-dup paths) —
 * the driver data has no natural duplicates.
 */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** documents ∪ exact copies of every 10th doc (ids shifted by 100000). */
  private def corpusExact(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    d.unionByName(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text")))
  }

  /** documents ∪ near-dup copies (every 10th doc with one token appended). */
  private def corpusNear(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    d.unionByName(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" graftmutation")).as("text")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Text statistics + quality scoring — one codegen'd pass.
    "text_stats" -> ((s, dir) => {
      TextAnalysis.withTextStats(docs(s, dir), "text")
        .filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("n_chars_calc"), col("n_tokens"), col("n_bpe_tokens"),
          col("punct_ratio"), col("digit_ratio"), col("stopword_ratio"),
          col("quality_score"), col("fingerprint"))
        .orderBy(col("doc_id"))
    }),

    // Language-ID heuristic (script ranges + stopword voting) — rows-only
    // (struct-greatest voting is engine-specific); fixture accuracy gated
    // in PipelineSpec.
    "text_langid" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang_pred")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang_pred"))
    }),

    // Rolling-hash document sketch — rows-only (xxhash64 signatures).
    "text_fingerprint_sketch" -> ((s, dir) => {
      docs(s, dir).filter(col("doc_id") < 20)
        .select(col("doc_id"),
          TextAnalysis.rollingFingerprint(col("text")).as("sketch"))
        .select(col("doc_id"), size(col("sketch")).as("sketch_len"),
          element_at(col("sketch"), 1).as("min_gram_hash"))
        .orderBy(col("doc_id"))
    }),

    // Exact dedup: fingerprint groups over the planted-duplicates corpus.
    "dedup_exact" -> ((s, dir) => {
      Dedup.exactDuplicates(corpusExact(s, dir), "doc_id", "text")
        .filter(col("group_size") > 1)
        .orderBy(col("doc_id"))
    }),

    // MinHash-LSH near-dup pairs — rows-only; PipelineSpec proves the
    // candidate set matches the exact-Jaccard oracle.
    "dedup_minhash" -> ((s, dir) => {
      Dedup.minHashNearDuplicates(corpusNear(s, dir), "doc_id", "text", threshold = 0.5)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // SimHash near-dup pairs (Hamming ≤ 3) — rows-only.
    "dedup_simhash" -> ((s, dir) => {
      Dedup.simHashNearDuplicates(corpusNear(s, dir), "doc_id", "text", maxHamming = 3)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Embedding-cosine near-dup pairs, exact — full-precision oracle.
    "dedup_cosine_exact" -> ((s, dir) => {
      Dedup.cosineNearDuplicatesExact(emb(s, dir), "vec_id", "embedding", threshold = 0.4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // LSH-blocked cosine near-dup on a planted high-similarity corpus
    // (embeddings ∪ perturbed copies at vec_id+100000, cosine ≈ 0.999 —
    // the realistic near-dup regime for hyperplane LSH) — rows-only;
    // recall gated in PipelineSpec.
    "dedup_cosine_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      val dim = e.select(size(col("embedding"))).first().getInt(0)
      val perturbed = e.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("embedding"), (v, i) =>
            v + when(i === 0, 0.01f).otherwise(0.0f)).as("embedding"))
      val corpus = e.select("vec_id", "embedding").unionByName(perturbed)
      Dedup.cosineNearDuplicatesLsh(corpus, "vec_id", "embedding", dim, threshold = 0.95)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // IVF ANN over embeddings — rows-only; recall gated in PipelineSpec.
    "ann_ivf_cosine" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir)
      val model = Ann.trainIvf(s, e, "embedding", "vec_id", nlist = 16)
      val index = Ann.buildIndex(e, "embedding", model)
      val qs = e.filter(col("vec_id") < 5)
        .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect().toSeq
      Ann.searchIvf(s, index, "vec_id", "embedding", qs, model, k = 10, nprobe = 8)
        .orderBy(col("queryId"), col("rank"))
    }),

    // Deterministic train/val/test split — hash-free Knuth-multiplicative
    // bucketing on doc_id (reproducible across engines and runs; the
    // standard pattern for dataset splits at scale).
    "pipeline_split_assignment" -> ((s, dir) => {
      val bucket = pmod(col("doc_id") * 2654435761L, lit(100))
      docs(s, dir)
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars_total"))
        .orderBy(col("split"))
    }),

    // Vocabulary statistics: token explode → frequency → top terms.
    "text_vocab_topk" -> ((s, dir) => {
      docs(s, dir)
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token"))
        .limit(25)
    }),

    // Multimodal decode+resize: synthetic blobs → mapPartitions decode stub
    // → metadata out. Fully deterministic → SQL oracle on the closed form.
    "multimodal_decode" -> ((s, dir) => {
      val blobs = Multimodal.withSyntheticMedia(s, docs(s, dir), "doc_id")
      val decoded = Multimodal.resize(Multimodal.decode(blobs), maxDim = 128)
      decoded.toDF()
        .select(col("doc_id"), col("mediaType"), col("width"), col("height"),
          col("channels"), col("n_bytes"))
        .orderBy(col("doc_id"))
    }),

    // Multimodal frame sampling (video rows fan out one row per frame).
    "multimodal_frames" -> ((s, dir) => {
      val blobs = Multimodal.withSyntheticMedia(s, docs(s, dir), "doc_id")
      Multimodal.sampleFrames(blobs, everyMs = 5000)
        .orderBy(col("doc_id"), col("frame_idx"))
    })
  )

  // punct class inside a SQL single-quoted literal ('' = ')
  private val punctSql = """[.,!?;:''"()\-]"""
  private val toksSql =
    """list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0)"""
  private val swListSql =
    "['the','a','an','of','and','to','in','is','it','that','for','on','with','as','this','are','be','or']"

  val oracles: Map[String, String] = Map(
    "text_stats" ->
      s"""WITH base AS (
         |  SELECT doc_id, text,
         |    CAST(len(text) AS BIGINT) AS n_chars_calc,
         |    CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |    CAST(ceil(len(regexp_replace(text, '\\s+', '', 'g')) / 4.0) AS BIGINT) AS n_bpe_tokens,
         |    CASE WHEN len(text) = 0 THEN 0.0
         |         ELSE (len(text) - len(regexp_replace(text, '$punctSql', '', 'g'))) * 1.0 / len(text) END AS praw,
         |    CASE WHEN len(text) = 0 THEN 0.0
         |         ELSE (len(text) - len(regexp_replace(text, '[0-9]', '', 'g'))) * 1.0 / len(text) END AS draw,
         |    CASE WHEN len($toksSql) = 0 THEN 0.0
         |         ELSE len(list_filter($toksSql, t -> list_contains($swListSql, t))) * 1.0
         |              / len($toksSql) END AS swraw,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
         |  FROM documents WHERE doc_id % 5 = 0)
         |SELECT doc_id, n_chars_calc, n_tokens, n_bpe_tokens,
         |  round(praw, 6) AS punct_ratio,
         |  round(draw, 6) AS digit_ratio,
         |  round(swraw, 6) AS stopword_ratio,
         |  round(least(n_tokens / 50.0, 1.0) * 0.4
         |      + (1.0 - least(praw * 5.0, 1.0)) * 0.2
         |      + (1.0 - least(draw * 5.0, 1.0)) * 0.2
         |      + least(swraw * 4.0, 1.0) * 0.2, 6) AS quality_score,
         |  fingerprint
         |FROM base ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |fp AS (
        |  SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        |  FROM corpus),
        |grp AS (
        |  SELECT fingerprint, min(doc_id) AS canonical_id, count(*) AS group_size
        |  FROM fp GROUP BY fingerprint)
        |SELECT f.doc_id, g.canonical_id, g.group_size
        |FROM fp f JOIN grp g USING (fingerprint)
        |WHERE g.group_size > 1
        |ORDER BY f.doc_id""".stripMargin,

    "dedup_cosine_exact" ->
      """SELECT id_a, id_b, cosine FROM (
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |  / (sqrt(list_sum(list_transform(a.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
        |   * sqrt(list_sum(list_transform(b.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cosine
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < b.vec_id) p
        |WHERE cosine >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,

    "pipeline_split_assignment" ->
      """SELECT CASE WHEN (doc_id * 2654435761) % 100 < 80 THEN 'train'
        |            WHEN (doc_id * 2654435761) % 100 < 90 THEN 'val'
        |            ELSE 'test' END AS split,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars_total
        |FROM documents
        |GROUP BY 1 ORDER BY split""".stripMargin,

    "text_vocab_topk" ->
      """SELECT token, count(*) AS freq FROM (
        |  SELECT unnest(list_filter(
        |    regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0)) AS token
        |  FROM documents) x
        |GROUP BY token
        |ORDER BY freq DESC, token
        |LIMIT 25""".stripMargin,

    "multimodal_decode" ->
      """WITH meta AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS mediaType,
        |    CAST(doc_id % 640 + 16 AS INTEGER) AS w0,
        |    CAST(doc_id % 480 + 16 AS INTEGER) AS h0
        |  FROM documents),
        |scaled AS (
        |  SELECT doc_id, mediaType, w0, h0,
        |    least(1.0, 128.0 / greatest(w0, h0)) AS scale
        |  FROM meta)
        |SELECT doc_id, mediaType,
        |  CAST(greatest(1, round(w0 * scale)) AS INTEGER) AS width,
        |  CAST(greatest(1, round(h0 * scale)) AS INTEGER) AS height,
        |  CAST(CASE WHEN mediaType = 'audio' THEN 1 ELSE 3 END AS INTEGER) AS channels,
        |  CAST(77 AS BIGINT) AS n_bytes
        |FROM scaled ORDER BY doc_id""".stripMargin,

    "multimodal_frames" ->
      """SELECT doc_id, CAST(f AS BIGINT) AS frame_idx, CAST(f * 5000 AS BIGINT) AS ts_ms
        |FROM (SELECT doc_id, doc_id % 60000 AS dur FROM documents WHERE doc_id % 3 = 2) v,
        |  LATERAL (SELECT unnest(generate_series(0,
        |    CAST(least(greatest(1, dur // 5000), 32) - 1 AS BIGINT))) AS f) g
        |ORDER BY doc_id, frame_idx""".stripMargin
  )
}
