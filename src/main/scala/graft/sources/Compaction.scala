package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Small-file compaction — the table-maintenance pass that rewrites a
 * fragmented parquet directory into ceil(totalBytes / targetBytes)
 * right-sized files. Thousands of kilobyte-scale files are the classic
 * 100 TB-lake failure mode: every scan pays one task + one footer read
 * per file, and the namenode/listing cost grows linearly — compaction
 * restores scan parallelism chosen by DATA SIZE, not by historical
 * write patterns.
 *
 * The rewrite is one narrow-ish job: scan → round-robin repartition to
 * the computed file count → write. (At lake scale you run this
 * per partition directory and let AQE coalesce the read side; the
 * sizing rule is the same.)
 */
object Compaction {

  /** Total bytes of data files under `dir` (skips _SUCCESS/.crc). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) total += f.getLen
    }
    total
  }

  /** Number of parquet data files under `dir`. */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) {
      val f = it.next().getPath.getName
      if (f.endsWith(".parquet")) n += 1
    }
    n
  }

  /**
   * Rewrite `inDir` into `outDir` as ceil(bytes / targetBytes) files.
   * Returns the target file count. Overwrites `outDir`.
   */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val bytes = dataBytes(spark, inDir)
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outDir)
    nFiles
  }

  /** Read back a compacted directory. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
