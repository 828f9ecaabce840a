package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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

  /**
   * Padding-efficiency audit for length-bucketed batching: every
   * sequence is assigned the smallest bucket boundary that holds its
   * (clamped) token count; batching a bucket at its boundary pads each
   * sequence to that length. Reports, per bucket, the exact token /
   * padded-slot totals and the waste ratio — the number that decides
   * bucket boundaries for inference serving and packed-SFT batching.
   *
   * Everything up to the final ratio is exact integers (ratio = one IEEE
   * division of exact sums), and the whole op is one narrow projection +
   * one small aggregation — linear at any corpus size.
   *
   * @param boundaries ascending bucket upper bounds; the last one also
   *                   clamps longer sequences (truncation semantics)
   */
  def paddingStats(
      df: DataFrame,
      tokenCol: String,
      boundaries: Seq[Long]): DataFrame = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted && boundaries.head > 0,
      "boundaries must be ascending and positive")
    val maxLen = boundaries.last
    val len = least(col(tokenCol).cast("long"), lit(maxLen))
    val bucket = boundaries.init.reverse.foldLeft(lit(maxLen): Column) {
      case (acc, b) => when(len <= b, lit(b)).otherwise(acc)
    }
    df.select(len.as("len"), bucket.as("bucket"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_seqs"),
        sum(col("len")).as("n_tokens"))
      .withColumn("n_slots", col("n_seqs") * col("bucket"))
      .withColumn("waste_ratio",
        lit(1.0) - col("n_tokens").cast("double") / col("n_slots").cast("double"))
      .orderBy(col("bucket"))
  }
}
