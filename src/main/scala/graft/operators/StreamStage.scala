package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit

/**
 * Shared staging for the file-source streaming gates: lay out N
 * micro-batch inputs (identical schemas) as single-file parquets with
 * strictly increasing pinned mtimes — the file source orders batches by
 * MODIFICATION TIME, and several downstream folds are order-sensitive,
 * so sub-second write timing can never be trusted for ordering.
 *
 * All batches are written in ONE Spark job (partitionBy on a batch tag
 * that is dropped from the file payload) instead of N serial
 * coalesce(1) jobs: the staging cost is driver-blocking fixed overhead
 * in every streaming gate, and was the dominant term in the
 * stream_cdc_apply bench creep (r12 adjudication: 3.34 s → 2.31 s).
 */
object StreamStage {

  /** State-store width sizing for a stateful streaming drain (the
    * stream_decay / stream_interval_join precedent, generalized): the
    * state shuffle width is pinned by `spark.sql.shuffle.partitions` at
    * batch 0, and every micro-batch pays per-store open/snapshot/commit
    * overhead — 32 stores for a few-hundred-key aggregate is pure fixed
    * cost. Gates size the width to their key space / arrival rate and
    * restore the session default afterwards; a 100 TB deployment sets
    * the same knob to cluster scale. */
  def withStateParts[T](
      s: org.apache.spark.sql.SparkSession, n: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body
    finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  def stageBatches(
      root: java.io.File,
      filesDir: java.io.File,
      batches: Seq[DataFrame]): Unit = {
    require(batches.nonEmpty, "no batches to stage")
    val stage = new java.io.File(root, "stage")
    batches.zipWithIndex
      .map { case (b, i) => b.withColumn("__b", lit(i)) }
      .reduce(_ unionByName _)
      .coalesce(1)
      .write.partitionBy("__b").mode("overwrite").parquet(stage.toString)
    batches.indices.foreach { i =>
      val dest = new java.io.File(filesDir, s"batch$i.parquet")
      val dir = new java.io.File(stage, s"__b=$i")
      if (dir.isDirectory) {
        val part = dir.listFiles().find(_.getName.startsWith("part-"))
          .getOrElse(sys.error(s"no staged part file under $dir"))
        java.nio.file.Files.move(part.toPath, dest.toPath)
      } else {
        // an EMPTY batch produces no partition directory — stage a
        // 0-row single-file parquet so the stream still sees the batch
        batches(i).limit(0).coalesce(1)
          .write.mode("overwrite").parquet(dir.toString)
        val part = dir.listFiles().find(_.getName.startsWith("part-"))
          .getOrElse(sys.error(s"no empty-batch part file under $dir"))
        java.nio.file.Files.move(part.toPath, dest.toPath)
      }
      require(dest.setLastModified(1700000000000L + i * 60000L),
        s"could not pin mtime on $dest")
    }
  }
}
