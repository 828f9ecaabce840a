package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.SparkShims

/**
 * Column API over Spark's internal bloom-filter runtime-filter
 * expressions (the machinery behind
 * `spark.sql.optimizer.runtime.bloomFilter.enabled`, here exposed as a
 * MANUAL pre-join reduction for when the optimizer doesn't inject one —
 * e.g. the filtered build side is only known at pipeline-assembly time).
 *
 * Usage shape: aggregate the build side's join keys into one bloom blob,
 * broadcast the single-row result onto the probe side, and filter with
 * `might_contain` BEFORE the exact join. False positives are removed by
 * the join itself, so the final result is identical to the plain join —
 * the bloom pass only cuts the probe side's shuffle volume (at 100 TB,
 * that is the difference between shuffling the full fact table and
 * shuffling the ~selectivity fraction that can possibly match).
 */
object bloom {
  /** Aggregate LONG keys into a bloom filter blob (BINARY). */
  def bloom_filter_agg(keys: Column, estimatedItems: Long, numBits: Long): Column =
    SparkShims.column(new BloomFilterAggregate(
      SparkShims.expression(keys),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Probe a bloom blob; NULL blob → NULL (treat as keep). */
  def might_contain(bloomBlob: Column, key: Column): Column =
    SparkShims.column(BloomFilterMightContain(
      SparkShims.expression(bloomBlob), SparkShims.expression(key)))
}
