package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.text

/** Distributed frequency / cardinality sketches over the document corpus —
  * the streaming-friendly summaries a 100 TB pipeline keeps instead of
  * exact tables (heavy-hitter monitoring, cross-shard distinct counts).
  *
  * Both sketches hash with md5_lower64 (= DuckDB `md5_number_lower`), so
  * every cell / register — and therefore the final estimates — are
  * recomputable in oracle SQL hash-for-hash. Scale shape: the only
  * full-data pass is the token count aggregation (map-side combined);
  * everything after operates on the distinct-token table, and the sketch
  * itself is d·w cells / m registers regardless of corpus size, which is
  * the entire point — mergeable across shards by cell-wise add / max.
  */
object Sketches {

  /** Count-min sketch of token frequencies plus its estimate for the
    * exact top-`k` tokens: (token, exact_n, cms_n), cms_n >= exact_n by
    * construction (one-sided error). Row `j` of the sketch hashes token
    * `t` to bucket md5_lower64(j # t) >>> 1 mod `w`; a cell is the sum of
    * the counts landing on it.
    *
    * The sketch build aggregates (d rows x w buckets) cells from the
    * distinct-token counts — two shuffles total (token counts, then
    * cells), both map-side combined; the top-k probe re-derives its d
    * buckets and joins the broadcast sketch. */
  def cmsHeavyHitters(docs: DataFrame, textCol: String = "text",
      d: Int = 4, w: Int = 1024, k: Int = 20): DataFrame = {
    val tp = cmsTokenPartials(docs, textCol)
    cmsFinish(tp, cmsCellPartials(tp, d, w), d, w, k)
  }

  /** Per-slice token-count partial — additive across slices (the merge
    * is a groupBy-sum), so an incremental/streaming pipeline appends
    * one of these per batch and never reprocesses history. */
  def cmsTokenPartials(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("exact_n"))

  /** Per-slice CMS cell partial — the sketch's defining property is
    * that these merge by CELL-WISE ADDITION (SketchesSpec pins cell
    * additivity; the streaming gate merges per-batch sketches this
    * way). d·w rows regardless of slice size. */
  def cmsCellPartials(tokenCounts: DataFrame, d: Int = 4, w: Int = 1024): DataFrame =
    tokenCounts.select(col("token"), col("exact_n"),
        explode(array((0 until d).map(lit): _*)).as("j"))
      .withColumn("bucket", bucketOf(col("j"), col("token"), w))
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("exact_n")).as("cell_n"))

  /** Finish from (possibly multi-slice) partials: merge token counts
    * and cells by sum, probe the exact top-`k` against the merged
    * sketch. With single-slice partials this is exactly the one-shot
    * [[cmsHeavyHitters]] plan. */
  def cmsFinish(tokenPartials: DataFrame, cellPartials: DataFrame,
      d: Int = 4, w: Int = 1024, k: Int = 20): DataFrame = {
    val exact = tokenPartials.groupBy(col("token"))
      .agg(sum(col("exact_n")).as("exact_n"))
    val sketch = cellPartials.groupBy(col("j"), col("bucket"))
      .agg(sum(col("cell_n")).as("cell_n"))
    val top = exact
      .orderBy(col("exact_n").desc, col("token")).limit(k)
      .select(col("token"), col("exact_n"),
        explode(array((0 until d).map(lit): _*)).as("j"))
      .withColumn("bucket", bucketOf(col("j"), col("token"), w))
    top.join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy(col("token"))
      .agg(max(col("exact_n")).as("exact_n"), min(col("cell_n")).as("cms_n"))
      .orderBy(col("exact_n").desc, col("token"))
  }

  /** Sketch-row `j`'s bucket for a token: 63-bit nonnegative hash mod w. */
  private def bucketOf(j: Column, token: Column, w: Int): Column =
    shiftrightunsigned(
      text.md5_lower64(concat(j.cast("string"), lit("#"), token)), 1) % w

  /** HyperLogLog over the corpus vocabulary: m = 256 registers (b = 8).
    * Register index = low 8 hash bits; rho = leading-zero rank of the
    * remaining 56 bits (position of the first 1 from the top, 57 when
    * all-zero). Returns ONE row:
    * (exact_distinct, n_zero_registers, hll_estimate, lc_estimate).
    *
    * The harmonic sum stays in integers: sum_j 2^-M_j is computed as
    * sum_j 2^(50-M_j) at fixed scale 2^50 with floor shifts — identical
    * in both engines, no float-sum order sensitivity (M_j > 50 never
    * occurs with 56-bit hashes at any real vocabulary size, and the CASE
    * floor matches the oracle exactly anyway). Unseen registers
    * contribute 2^50 each via the (m - observed) closed form, so no
    * 0..255 scaffold table is needed. The raw E = alpha_m m^2 / sum
    * estimate is one double expression with a fixed parenthesization —
    * bit-identical across engines. The ln-based small-range correction
    * is NOT folded into hll_estimate; linear counting rides along as its
    * own 4-dp-snapped `lc_estimate` column (NULL once no register is
    * empty) so the raw-estimate column stays libm-free.
    *
    * One corpus pass: the distinct-token aggregation feeds BOTH the
    * register maxima and (as the per-register token tally summed back
    * up) the exact distinct count. */
  def hllVocabulary(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val regs = withRegRho(
      docs.select(explode(TextAnalysis.tokens(col(textCol))).as("token")).distinct())
      .groupBy(col("reg"))
      .agg(max(col("rho")).as("m_j"), count(lit(1)).as("n_tok"))
    regs
      // coalesce: on an empty corpus the global agg's sum is NULL but the
      // oracle's scalar `count(*) FROM words` is 0 (sum_fp/hll_estimate
      // stay NULL on both sides — only this column needs the floor)
      .agg(seenSum, nSeen,
        coalesce(sum(col("n_tok")), lit(0L)).as("exact_distinct"))
      .select(col("exact_distinct"), sumFp, nZero)
      .select(col("exact_distinct"), col("n_zero_registers"),
        hllEstimate, lcEstimate)
  }

  /** The property that makes HLL the 100 TB distinct-counter: shards
    * sketch locally, the coordinator merges by element-wise register
    * max, and the merged sketch IS the whole-corpus sketch. One row per
    * source plus a `__merged__` row; SketchesSpec pins merged ==
    * whole-corpus and the gate's oracle recomputes every row
    * register-for-register.
    *
    * Shape: one token pass → per-(source, register) max (map-side
    * combined), then a 256-row-per-source table drives everything —
    * the merge itself never touches the corpus again. */
  def hllBySource(docs: DataFrame, textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    val perSrc = withRegRho(
      docs.select(col(sourceCol).as("source"),
        explode(TextAnalysis.tokens(col(textCol))).as("token")))
      .groupBy(col("source"), col("reg")).agg(max(col("rho")).as("m_j"))
    // register-max merge — the only cross-shard traffic is 256 longs/shard
    val merged = perSrc.groupBy(col("reg"))
      .agg(max(col("m_j")).as("m_j"))
      .withColumn("source", lit("__merged__"))
    perSrc.unionByName(merged)
      .groupBy(col("source"))
      .agg(seenSum, nSeen)
      .select(col("source"), sumFp, nZero)
      .select(col("source"), col("n_zero_registers"), hllEstimate, lcEstimate)
      .orderBy(col("source"))
  }

  // --- the one copy of the HLL estimator (both gates compile from these,
  // --- so the cross-engine-parity-critical formula cannot drift) --------

  /** reg = low 8 hash bits; rho = first-1 rank of the upper 56 (57 when
    * all-zero). bin() drops leading zeros, so a 56-bit field with
    * bit-length L has 56-L leading zeros -> rank 57-L. */
  private def withRegRho(tokens: DataFrame): DataFrame = {
    val h = text.md5_lower64(col("token"))
    tokens
      .withColumn("reg", h.bitwiseAND(lit(255L)))
      .withColumn("rest", shiftrightunsigned(h, 8))
      .withColumn("rho",
        when(col("rest") === 0L, lit(57L))
          .otherwise(lit(57L) - length(bin(col("rest")))))
  }

  private def pow2_50: Column = expr("shiftleft(CAST(1 AS BIGINT), 50)")

  /** Integer harmonic-sum pieces over a (reg, m_j) group. */
  private def seenSum: Column =
    sum(when(col("m_j") <= 50L,
      expr("shiftleft(CAST(1 AS BIGINT), CAST(50 - m_j AS INT))"))
      .otherwise(lit(0L))).as("seen_sum")
  private def nSeen: Column = count(lit(1)).as("n_seen")
  private def sumFp: Column =
    (col("seen_sum") + (lit(256L) - col("n_seen")) * pow2_50).as("sum_fp")
  private def nZero: Column = (lit(256L) - col("n_seen")).as("n_zero_registers")

  /** alpha_256 · m² — fixed parenthesization shared by every estimate. */
  private def alphaM2: Column =
    lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(256.0) * lit(256.0)

  private def hllEstimate: Column =
    round(alphaM2 * pow2_50 / col("sum_fp"), 4).as("hll_estimate")

  /** The HLL++ small-range path: linear counting on empty registers (the
    * estimate a production HLL returns at low cardinality; one libm ln,
    * 4-dp snapped; NULL when no register is empty — LC inapplicable). */
  private def lcEstimate: Column =
    when(col("n_zero_registers") > 0L,
      round(lit(256.0) * log(lit(256.0) / col("n_zero_registers").cast("double")), 4))
      .as("lc_estimate")

  // --- mergeable length histogram ----------------------------------------

  /** Geometric bin of a positive integer: its BIT LENGTH, computed as
    * `length(bin(v))` — both engines render the same minimal binary
    * string, so the bin edge is integer-exact (a floor(log2(v)) on
    * doubles can land on the wrong side of the edge at exact powers of
    * two). v <= 0 → bin 0. */
  def bitLengthBin(v: Column): Column =
    when(v <= 0L, lit(0)).otherwise(length(bin(v.cast("long"))))

  /**
   * Mergeable per-source length-distribution sketch: geometric
   * (bit-length) bins of the per-doc token count, per source plus a
   * `__merged__` row that is the bin-wise SUM of the per-source sketches
   * (SketchesSpec pins merged == whole-corpus). From the fixed ≤64-bin
   * table it derives exact bin-resolution quantiles: `pXX_ub` =
   * 2^bin − 1, the upper token bound of the first bin where the
   * cumulative count reaches XX% (ceil rank semantics).
   *
   * The 100 TB shape: one token-count pass (map-side combined into at
   * most sources×64 cells), then everything — merge, quantiles, the data
   * card — runs on the cell table. This is the corpus-scale answer to
   * "what is p99 doc length per source" without any global sort.
   */
  def lengthHistogramBySource(docs: DataFrame, textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    val perSrc = docs
      .select(col(sourceCol).as("source"),
        bitLengthBin(size(TextAnalysis.tokens(col(textCol))).cast("long")).as("bin"))
      .groupBy(col("source"), col("bin")).agg(count(lit(1)).as("n"))
    val merged = perSrc.groupBy(col("bin"))
      .agg(sum(col("n")).as("n"))
      .withColumn("source", lit("__merged__"))
    val cells = perSrc.unionByName(merged)
    val w = Window.partitionBy(col("source")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("source"))
    // bin upper bound 2^bin − 1 via a literal power table (bins ≤ 63;
    // Column-typed shift counts aren't in the functions API)
    val powers = typedlit((0 to 63).map(k => (1L << k) - 1L))
    val qual = cells
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("total", sum(col("n")).over(wAll))
      .withColumn("ub", element_at(powers, col("bin") + 1))
    // ceil-rank: the first bin whose cumulative count covers pct% of
    // docs (cum·100 >= pct·total in exact integers)
    def pctUb(pct: Int): Column =
      min(when(col("cum") * 100 >= col("total") * pct, col("ub"))).as(s"p${pct}_ub")
    qual.groupBy(col("source"))
      .agg(max(col("total")).as("n_docs"),
        pctUb(50), pctUb(90), pctUb(99))
      .orderBy(col("source"))
  }

  // --- KMV / bottom-k distinct sketch ------------------------------------

  /** Per-source bottom-`k` (KMV) sketch over the word-shingle hash
    * space: the k smallest shingle hashes each source has ever seen.
    * k rows per source REGARDLESS of corpus size, and mergeable — the
    * sketch of a union is the bottom-k of the sketch union
    * (SketchesSpec pins the law) — which is what replaces
    * `dedup_source_overlap`'s exact all-shingle self-join at 100 TB:
    * overlap questions answered from k·sources rows. */
  def bottomKSketches(docs: DataFrame, textCol: String, sourceCol: String,
      k: Int, shingleK: Int = 3): DataFrame = {
    require(k >= 1, "sketch size must be positive")
    // md5-hashed shingle STRINGS (not the XXH64 kernel, which has no
    // DuckDB twin — KMV needs the ORDER of hashes replayed, not just
    // their Jaccard structure). The token array materializes once
    // under the Generate barrier (the cdcChunks defense), and hashes
    // are taken BEFORE the distinct so only 8-byte longs shuffle.
    val sh = docs
      .select(col(sourceCol).as("source"),
        TextAnalysis.tokens(col(textCol)).as("tk"))
      .select(col("source"), explode(expr(
        s"""if(size(tk) >= $shingleK,
           |  transform(sequence(1, size(tk) - ${shingleK - 1}),
           |    i -> concat_ws(' ', slice(tk, i, $shingleK))),
           |  array(array_join(tk, ' ')))""".stripMargin)).as("s"))
      .select(col("source"), text.md5_lower64(col("s")).as("h"))
      .distinct()
    val w = Window.partitionBy(col("source")).orderBy(col("h"))
    sh.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("source"), col("h"))
  }

  /** KMV Jaccard between every source pair (Beyer et al.'s k-minimum-
    * values estimator): of the k smallest hashes in the MERGED pair
    * sketch, the fraction present in both sides estimates J(A,B).
    * Everything downstream of the sketches is pair-count × k sized —
    * the 190-pair audit runs on ~k·sources rows, never re-touching the
    * corpus. */
  def bottomKJaccard(sketches: DataFrame, k: Int): DataFrame = {
    val srcs = sketches.select(col("source")).distinct()
    val pairs = srcs.select(col("source").as("source_a"))
      .join(srcs.select(col("source").as("source_b")),
        col("source_a") < col("source_b"))
    val ra = pairs
      .join(sketches.withColumnRenamed("source", "source_a"), Seq("source_a"))
      .select(col("source_a"), col("source_b"), col("h"),
        lit(1L).as("in_a"), lit(0L).as("in_b"))
    val rb = pairs
      .join(sketches.withColumnRenamed("source", "source_b"), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("h"),
        lit(0L).as("in_a"), lit(1L).as("in_b"))
    val merged = ra.unionByName(rb)
      .groupBy(col("source_a"), col("source_b"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val w = Window.partitionBy(col("source_a"), col("source_b"))
      .orderBy(col("h"))
    merged.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("k_eff"),
        sum(col("in_a") * col("in_b")).as("n_common"))
      .withColumn("jacc_est_r", round(
        col("n_common").cast("double") / col("k_eff").cast("double"), 6))
      .orderBy(col("source_a"), col("source_b"))
  }

  // --- HDR quantile sketch (sub-bucketed geometric histogram) ------------

  /** 2^k power table — Column-typed shift counts aren't in the functions
    * API, so shifts by a computed count go through element_at. */
  private val pow2 = typedlit((0 to 62).map(k => 1L << k))

  /** Bucket LOWER BOUND of a positive integer under an HDR-histogram
    * binning with `subBits` sub-bucket bits: the value with all bits
    * below `bitlen(v)-1-subBits` cleared (`v - v % 2^shift`). Buckets
    * are exact below 2^(subBits+1) and have relative width 2^-subBits
    * above, so any quantile read off the histogram carries a guaranteed
    * relative error <= 2^-subBits — the HdrHistogram/DDSketch bound,
    * from integer bit arithmetic only (no libm, bit-exact across
    * engines: the bin edge of a floor(log) on doubles can land on the
    * wrong side at exact powers). The lower bound alone identifies the
    * bucket: shift is recoverable from bitlen(blo). */
  def hdrBucketLo(v: Column, subBits: Int): Column = {
    val shift = greatest(length(bin(v.cast("long"))) - 1 - subBits, lit(0))
    v - v % element_at(pow2, shift + 1)
  }

  /** Per-slice histogram partial: (blo, n) cells, at most ~63·2^subBits
    * rows regardless of slice size. Additive across slices — the merge
    * is a groupBy-sum (SketchesSpec pins sharded == direct), which is
    * what makes this the quantile summary a 100 TB pipeline keeps per
    * shard/day and folds on read instead of ever sorting raw values. */
  def hdrCells(values: DataFrame, valueCol: String, subBits: Int): DataFrame =
    values.select(
        // positivity is the binning's domain contract (bitlen/shift
        // arithmetic is ill-defined at v <= 0: Spark's % follows the
        // dividend sign and a negative value's 64-char bin() pushes
        // element_at past the pow2 table) — fail loudly in-plan
        // instead of silently mis-bucketing or dropping nulls
        when(col(valueCol) > 0, hdrBucketLo(col(valueCol), subBits))
          .otherwise(raise_error(concat(
            lit(s"hdrCells: non-positive value in '$valueCol' ("),
            col(valueCol).cast("string"),
            lit(") — the HDR binning is defined for positive integers"))))
          .as("blo"))
      .groupBy(col("blo")).agg(count(lit(1)).as("n"))

  /** Quantile finish over (possibly multi-slice) cells: per-mille ranks
    * with ceil semantics (`cum·1000 >= q‰·total` in exact integers),
    * answering each q with the first covering bucket's [est_lo, est_ub].
    * The only sort is the window over the fixed-size cell table; the
    * quantile probe is a crossJoin against the broadcast q-list. */
  def hdrQuantiles(cells: DataFrame, subBits: Int,
      quantilesPerMille: Seq[Int]): DataFrame = {
    require(quantilesPerMille.nonEmpty &&
      quantilesPerMille.forall(q => q >= 1 && q <= 1000),
      "quantiles are per-mille ranks in [1, 1000]")
    val merged = cells.groupBy(col("blo")).agg(sum(col("n")).as("n"))
    val wCum = Window.orderBy(col("blo"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = merged.agg(sum(col("n")).as("total"))
    val spark = cells.sparkSession
    import spark.implicits._
    val qdf = quantilesPerMille.toDF("q_pm")
    val ubShift =
      greatest(length(bin(col("est_lo"))) - 1 - subBits, lit(0))
    merged.withColumn("cum", sum(col("n")).over(wCum))
      .crossJoin(broadcast(total))
      .crossJoin(broadcast(qdf))
      .filter(col("cum") * 1000 >= col("q_pm") * col("total"))
      .groupBy(col("q_pm"))
      .agg(min(col("blo")).as("est_lo"), max(col("total")).as("n_total"))
      .withColumn("est_ub",
        col("est_lo") + element_at(pow2, ubShift + 1) - 1)
      .select(col("q_pm"), col("est_lo"), col("est_ub"), col("n_total"))
      .orderBy(col("q_pm"))
  }

  // --- KMV/theta intersection (distinct set algebra) ----------------------

  /**
   * KMV/theta-sketch set-INTERSECTION estimation between every key
   * pair — the sketch-algebra counterpart of [[bottomKJaccard]]
   * (which estimates the ratio; this estimates the CARDINALITY, the
   * theta-sketch `intersect` people reach for in cross-shard distinct
   * overlap audits). Per key: the k smallest hashes of the distinct
   * value set with θ = the k-th minimum; per pair: both sketches are
   * truncated at θ* = min(θ_a, θ_b) (below θ* each sketch is a FULL
   * record of its hashes), so
   * `est = n_common · 2³² / (θ* + 1)` unbiasedly scales the shared
   * count back up. `exact_common` is carried alongside for
   * calibration. Pairs sharing no sketch hash emit no row.
   *
   * The hash is the Knuth multiplicative hash `pmod(v·2654435761, 2³²)`
   * — odd constant, hence BIJECTIVE on the key space: distinct values
   * never collide, ranking ties are impossible, and a relational
   * engine replays it with plain integer arithmetic. PRECONDITION:
   * values must be non-negative and < Long.MaxValue/2654435761 ≈
   * 3.47e9 — beyond that the Long multiply wraps in Spark while a
   * strict BIGINT engine (DuckDB) raises, a cross-engine divergence.
   * Ids outside that range must be pre-reduced (e.g. the
   * `pmod(id, 2³¹−1)` fold [[graft.pipeline.Sampling]] uses); pmod
   * (not `%`) keeps h ∈ [0, 2³²) even for negative inputs.
   *
   * Scale shape: one distinct + one window top-k per key (sketch is
   * k-sized regardless of set size), the pair join runs on sketch
   * rows only — never on the raw sets. `exact_common` is the one
   * full-data pair join; at production scale drop it (it is the
   * calibration column, not the operator).
   */
  def kmvIntersections(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      k: Int,
      /** Attach the full-data `exact_common` calibration column. The
        * production path at scale disables it — it is the one
        * pair-join over raw sets (the scaladoc's drop-at-scale note),
        * everything else touches k-sized sketches only. */
      withExact: Boolean = true): DataFrame = {
    require(k >= 1, "sketch size must be positive")
    val raw = df.select(col(keyCol).cast("long").as("key"),
      col(valCol).cast("long").as("v")).distinct()
    raw.persist()
    val hashed = raw.select(col("key"),
      pmod(col("v") * 2654435761L, lit(4294967296L)).as("h"))
    val w = Window.partitionBy(col("key")).orderBy(col("h"))
    val sk = hashed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("key"), col("h"))
    sk.persist()
    val theta = sk.groupBy(col("key")).agg(max(col("h")).as("theta"))
    val common = sk.as("a").join(sk.as("b"),
        col("a.h") === col("b.h") && col("a.key") < col("b.key"))
      .select(col("a.key").as("key_a"), col("b.key").as("key_b"), col("a.h"))
    val sketchOut = common
      .join(theta.select(col("key").as("key_a"), col("theta").as("ta")),
        Seq("key_a"))
      .join(theta.select(col("key").as("key_b"), col("theta").as("tb")),
        Seq("key_b"))
      .filter(col("h") <= least(col("ta"), col("tb")))
      .groupBy(col("key_a"), col("key_b"))
      .agg(count(lit(1)).cast("long").as("n_common"),
        min(least(col("ta"), col("tb"))).cast("long").as("theta_star"))
    val withEst = sketchOut
      .select(col("key_a"), col("key_b"), col("n_common"), col("theta_star"),
        round(col("n_common") * lit(4294967296.0) / (col("theta_star") + 1), 6)
          .as("est_common"))
    val out = (if (withExact) {
      val exact = raw.as("x").join(raw.as("y"),
          col("x.v") === col("y.v") && col("x.key") < col("y.key"))
        .groupBy(col("x.key").as("key_a"), col("y.key").as("key_b"))
        .agg(count(lit(1)).cast("long").as("exact_common"))
      withEst.join(exact, Seq("key_a", "key_b"))
    } else withEst).localCheckpoint()
    sk.unpersist()
    raw.unpersist()
    out
  }
}
