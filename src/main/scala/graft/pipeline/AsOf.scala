package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Backward as-of join: for every left row, attach the LATEST right row
 * with `right.ts <= left.ts` within the same key group — the standard
 * event-pipeline operator (sessionless attribution, point-in-time
 * feature lookup) that Spark has no built-in for.
 *
 * Implementation is the union-and-carry pattern, not a range join: tag
 * both sides, union, sort within each key by (ts, right-before-left),
 * and carry the last right payload forward with a `last(ignoreNulls)`
 * window. ONE shuffle on the key column, linear in input size — a
 * theta/range join would be quadratic per key group. Preference order
 * (a) of SURVEY.md §7.3: composed from built-ins, no custom SparkPlan.
 */
object AsOf {

  /**
   * @param left      probe side
   * @param right     reference side
   * @param keyCols   equi-join keys (present on both sides)
   * @param tsCol     event-time column name (present on both sides)
   * @param valueCols right-side columns to attach, output as `asof_<name>`
   *                  (null when no right row precedes the left row)
   */
  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    val rightTagged = right.select(
      keyCols.map(col) ++ Seq(col(tsCol), lit(1).as("_side"),
        struct(valueCols.map(col): _*).as("_carry")): _*)
    val leftTagged = left
      .withColumn("_side", lit(0))
      .withColumn("_carry", lit(null).cast(rightTagged.schema("_carry").dataType))
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)

    // right rows sort BEFORE left rows at equal ts (backward as-of
    // includes exact-tie matches); carry the latest right payload down
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCarry = unioned
      .withColumn("_asof", last(col("_carry"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .drop("_side", "_carry")

    valueCols.foldLeft(withCarry) { (df, c) =>
      df.withColumn(s"asof_$c", col("_asof").getField(c))
    }.drop("_asof")
  }
}
