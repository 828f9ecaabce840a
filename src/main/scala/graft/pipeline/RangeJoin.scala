package graft.pipeline

import org.apache.spark.sql.DataFrame
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
    val pts = points.withColumn("__bucket", floor(col(pointCol) / w))
    val ints = intervals.withColumn("__bucket",
      explode(sequence(floor(col(startCol) / w), floor(col(endCol) / w))))
    pts.join(ints, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }
}
