package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * CDC snapshot compaction (the lakehouse MERGE a continuously-refreshed
 * corpus needs): fold a changelog of keyed upserts and deletes into the
 * next snapshot — exactly-once per key, latest version wins, deletes
 * tombstone.
 *
 * Shape at scale: ONE window pass keyed on the merge key (single
 * shuffle, map-side partial none needed — row_number prunes to one row
 * per key before anything wide). No join: base rows enter the same
 * stream as changelog rows at version floor, so base-vs-delta is just
 * another version comparison. At 100 TB the shuffle is the unavoidable
 * cost of keyed dedup; everything else is narrow.
 */
object Snapshot {

  /** Merge a base snapshot with a changelog.
    *
    * @param base      current snapshot (all rows implicitly version
    *                  `baseVersion`, operation upsert)
    * @param changelog (key, version, op, payload...) — op `U` upserts the
    *                  payload, `D` deletes the key; versions must be
    *                  unique per key (the CDC log contract); ties broken
    *                  toward delete for safety
    * @param keyCol    merge key column name (shared by both inputs)
    * @param verCol    changelog version column
    * @param opCol     changelog operation column (`U` / `D`)
    * @return the next snapshot: payload columns of the winning upsert
    *         per surviving key, plus the winning version as `verCol`
    */
  def merge(
      base: DataFrame,
      changelog: DataFrame,
      keyCol: String,
      verCol: String,
      opCol: String,
      baseVersion: Long = 0L): DataFrame = {
    val baseAsLog = base
      .withColumn(verCol, lit(baseVersion))
      .withColumn(opCol, lit("U"))
    val unioned = baseAsLog.unionByName(changelog.select(baseAsLog.columns.map(col): _*))
    // delete-first tie-break: at equal versions a D outranks a U ("D" < "U")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(verCol).desc, col(opCol).asc)
    unioned
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) === "U")
      .drop("__rn", opCol)
  }

  /**
   * Version-PRESERVING merge step for incremental/streaming CDC apply:
   * like [[merge]], but the state's existing `verCol` is kept instead
   * of being floored to `baseVersion`, AND delete tombstones are
   * RETAINED in the carried state (as rows with `opCol = "D"`). With
   * tombstones retained, the fold is order-insensitive per key — the
   * max-version row survives no matter how the changelog is batched,
   * so a stale upsert arriving after a higher-versioned delete loses
   * the window instead of silently resurrecting the key (the defect a
   * drop-tombstones fold has under any non-monotone batch order). No
   * monotonicity precondition, no guard needed: per-key version
   * uniqueness (the CDC log contract) is the only requirement, and
   * fold-then-[[finish]] equals the one-shot [[merge]] under ANY
   * partition of the changelog into batches.
   *
   * A state missing `opCol` (the first fold over a plain base
   * snapshot) is treated as all-upserts. Read the live view with
   * [[finish]]; reclaim old tombstones with [[compactState]] once all
   * producers are past a version horizon.
   */
  def fold(
      state: DataFrame,
      changelog: DataFrame,
      keyCol: String,
      verCol: String,
      opCol: String): DataFrame = {
    val stateAsLog =
      if (state.columns.contains(opCol)) state
      else state.withColumn(opCol, lit("U"))
    val unioned = stateAsLog
      .unionByName(changelog.select(stateAsLog.columns.map(col): _*))
    // delete-first tie-break mirrors merge: at equal versions D wins
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(verCol).desc, col(opCol).asc)
    unioned
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Live view of a fold state: surviving upserts only, op dropped —
    * the exact shape [[merge]] returns. */
  def finish(state: DataFrame, opCol: String): DataFrame =
    state.filter(col(opCol) === "U").drop(opCol)

  /** Tombstone compaction: drop delete rows whose version is strictly
    * below `horizon` — safe once every producer is known to be past
    * the horizon (no batch can still carry a lower version), the
    * standard lakehouse state-GC step. Upserts are never dropped. */
  def compactState(state: DataFrame, verCol: String, opCol: String,
      horizon: Long): DataFrame =
    state.filter(col(opCol) === "U" || col(verCol) >= horizon)

  /**
   * SCD type-2 interval versioning: turn a change event stream into the
   * slowly-changing-dimension table — per key, each change opens a
   * version valid from its own timestamp until the NEXT change's
   * timestamp (`valid_to` null = current version). The warehouse shape
   * for "what did this dimension row look like at time T" joins.
   *
   * ONE window pass keyed on the dimension key (single shuffle): the
   * interval close is a `lead`, the version ordinal a `row_number`,
   * both over the same (ts, tie) sort — no self-join, no second pass.
   * `tieCol` makes same-timestamp changes deterministic (last writer by
   * tie order wins the shorter interval).
   */
  def scd2(
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn("version_seq", row_number().over(w).cast("long"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /**
   * Incremental SCD2 maintenance: fold a TIME-ORDERED change batch into
   * an existing [[scd2]] dimension table — each touched key's open
   * version closes at the batch's first change for that key, the
   * batch's own versions chain via a within-batch [[scd2]] pass and
   * renumber after the key's carried max. Under per-key time-ordered
   * batches (every batch date strictly after the key's carried dates —
   * date-range batching gives this globally), folding batch-by-batch
   * yields EXACTLY the one-shot [[scd2]] over the concatenated stream,
   * including version numbers and the single open version per key.
   *
   * Shape: the close step joins the (thin) state against two per-key
   * 1-row aggregates of the batch; the append step is the within-batch
   * window pass. Nothing rescans history beyond the state rows.
   */
  def scd2Fold(
      state: DataFrame,
      batch: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String): DataFrame = {
    val firstTs = batch.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("__first_ts"))
    val maxSeq = state.groupBy(col(keyCol))
      .agg(max(col("version_seq")).as("__max_seq"))
    val closed = state.join(firstTs, Seq(keyCol), "left")
      .withColumn("valid_to",
        when(col("is_current") && col("__first_ts").isNotNull, col("__first_ts"))
          .otherwise(col("valid_to")))
      .withColumn("is_current", col("is_current") && col("__first_ts").isNull)
      .drop("__first_ts")
    val appended = scd2(batch, keyCol, tsCol, tieCol)
      .join(maxSeq, Seq(keyCol), "left")
      .withColumn("version_seq",
        col("version_seq") + coalesce(col("__max_seq"), lit(0L)))
      .drop("__max_seq")
    closed.unionByName(appended.select(closed.columns.map(col): _*))
  }

  /**
   * Corpus snapshot diff: classify every key across two generations as
   * `added` / `removed` / `changed` / `unchanged` by comparing content
   * fingerprints — the audit step between corpus refreshes (how much
   * churn did the new crawl introduce? what must be re-embedded?).
   *
   * Scale shape: both sides project to (key, fingerprint) BEFORE the
   * full-outer equi-join, so the shuffle moves two thin columns, never
   * document bytes; downstream re-processing joins back on the key for
   * just the `added`/`changed` slice.
   */
  def diff(
      base: DataFrame,
      next: DataFrame,
      keyCol: String,
      fpCol: String): DataFrame = {
    val a = base.select(col(keyCol), col(fpCol).as("__fp_base"))
    val b = next.select(col(keyCol), col(fpCol).as("__fp_next"))
    a.join(b, Seq(keyCol), "full_outer")
      .withColumn("status",
        when(col("__fp_base").isNull, lit("added"))
          .when(col("__fp_next").isNull, lit("removed"))
          .when(col("__fp_base") === col("__fp_next"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(col(keyCol), col("status"))
  }
}
