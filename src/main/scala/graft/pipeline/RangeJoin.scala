package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Range (interval) join without a theta join: match point rows to the
 * interval rows containing them via time-axis bucketing.
 *
 * Scale design: a naive `p BETWEEN start AND end` join is a
 * BroadcastNestedLoop/cartesian plan — quadratic work at scale. Here the
 * axis is cut into `bucketWidth` buckets; every interval EXPLODES into
 * the buckets it touches (⌈len/width⌉+1 rows) and every point maps to
 * one bucket, so the match becomes a hash equi-join on the bucket id
 * plus a residual range predicate. Shuffle volume is linear in
 * |points| + |intervals|·avgBucketsPerInterval; pick `bucketWidth` near
 * the median interval length to keep that factor ~2. Bucket skew (a hot
 * time range) is AQE's skew-join case, same as any hot key.
 */
object RangeJoin {

  /**
   * @param points      rows carrying `pointCol` (integral axis position)
   * @param pointCol    LONG column of the probe position
   * @param intervals   rows carrying [`startCol`, `endCol`] (inclusive)
   * @param bucketWidth bucket size in axis units (> 0)
   * @return points ⋈ intervals where startCol <= pointCol <= endCol,
   *         with all columns of both sides
   */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val pts = points.withColumn("__bucket", floorDiv(col(pointCol), w))
    val ints = intervals.withColumn("__bucket",
      explode(sequence(floorDiv(col(startCol), w), floorDiv(col(endCol), w))))
    pts.join(ints, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Exact LONG floor-division. Spark's `/` on LONGs is DOUBLE division —
    * beyond 2^53 (epoch-nanos territory) `floor(a / w)` can land a point
    * or interval boundary in the wrong bucket and the residual predicate
    * then silently drops genuinely matching rows. Integral `div` truncates
    * toward zero; subtract 1 when a negative value has a remainder. */
  private def floorDiv(c: Column, w: Column): Column = {
    val q = call_function("div", c, w)
    val r = c % w // sign follows c; w > 0 by require above
    q - when(r < 0, 1).otherwise(0)
  }
}
