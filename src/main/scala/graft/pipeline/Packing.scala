package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for LLM training pipelines: assign documents to
 * fixed-token-budget packs (context windows) deterministically.
 *
 * Scale design: a single global greedy pass is inherently sequential, so
 * the corpus is first split into `shards` deterministic shards (id hash),
 * and packing runs independently per shard — prefix-sum bucketing where
 * pack p of a shard covers token offsets [p·budget, (p+1)·budget) and a
 * document belongs to the pack its first token lands in. One partitioned
 * window (never a global no-partition window), fully parallel across
 * shards; at 100 TB pick shards ≈ cluster parallelism and each shard's
 * running sum stays a single in-partition scan.
 */
object Packing {

  /**
   * @param df       input rows
   * @param idCol    unique orderable id (pack order within a shard)
   * @param tokenCol per-row token count column
   * @param budget   tokens per pack
   * @param shards   deterministic shard count (id mod shards)
   * @return input ids + (pack_shard, pack_bin) assignment
   */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      shards: Int): DataFrame = {
    val w = Window.partitionBy(col("pack_shard")).orderBy(col(idCol))
    df.withColumn("pack_shard", pmod(col(idCol), lit(shards)).cast("int"))
      .withColumn("start_off",
        sum(col(tokenCol)).over(w) - col(tokenCol))
      .withColumn("pack_bin", expr(s"start_off DIV $budget"))
      .drop("start_off")
  }
}
