package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Blocked fuzzy (edit-distance) join — the entity-resolution primitive:
 * match dirty strings (typos, truncations) against a canonical list
 * without the all-pairs cartesian product.
 *
 * Blocking: candidates must share a `prefixLen`-char prefix and have
 * lengths within `maxDist` — an EQUI-join on the prefix key (hash join,
 * never a nested loop), with the O(len²) Levenshtein verification run
 * only inside blocks. At 100 TB the block key bounds the candidate set
 * the way LSH bands bound the near-dup join; edits inside the prefix
 * escape the block (the standard single-pass blocking caveat — run a
 * second pass on a suffix or sorted-ngram key when recall must be
 * complete, same multi-band recipe as MinHash).
 */
object FuzzyJoin {

  /** @return left + right rows with `edit_dist <= maxDist`, one row per
    *         matched pair */
  def blockedJoin(
      left: DataFrame,
      right: DataFrame,
      leftCol: String,
      rightCol: String,
      maxDist: Int,
      prefixLen: Int): DataFrame = {
    val l = left.withColumn("__blk", substring(col(leftCol), 1, prefixLen))
    val r = right.withColumn("__blk", substring(col(rightCol), 1, prefixLen))
    l.join(r, Seq("__blk"))
      .filter(abs(length(col(leftCol)) - length(col(rightCol))) <= maxDist)
      .withColumn("edit_dist", levenshtein(col(leftCol), col(rightCol)))
      .filter(col("edit_dist") <= maxDist)
      .drop("__blk")
  }
}
