package graft.tools

import org.apache.spark.sql.SparkSession

/** Bench-anchor adjudication driver (test scope — never ships in the
  * production jar). Runs one registered query for `reps` warm
  * repetitions on an isolated session and prints each rep plus the
  * median — the `BenchAnchors` protocol recorded in BASELINE.md.
  *
  * Usage: sbt "Test/runMain graft.tools.Probe <query>[,<query>...] [sfDir] [reps]"
  * (comma-separated names probe sequentially in one session — each still
  * gets its own cold warmup rep before its timed reps)
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    spark.range(1000000).selectExpr("sum(id)").collect()
    args(0).split(",").foreach(name => probeOne(spark, name, dir, reps))
    spark.stop()
  }

  private def probeOne(
      spark: SparkSession, name: String, dir: String, reps: Int): Unit =
    // a bad name / failing query must not abort the rest of the sweep
    try probeOneUnsafe(spark, name, dir, reps)
    catch { case e: Throwable => println(s"[probe] $name FAILED: $e") }

  private def probeOneUnsafe(
      spark: SparkSession, name: String, dir: String, reps: Int): Unit = {
    // warmup (session machinery + one cold pass of the query itself)
    spark.sparkContext.setJobDescription(s"warmup $name")
    try graft.SparkEntry.queries(name)(spark, dir).count()
    catch { case e: Throwable => println(s"[probe] warmup failed: $e") }
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name rep $i: $t%.3f s ($n rows)")
      t
    }.sorted
    // true median: average the two central elements for even rep counts
    // (upper-middle alone biases anchors high)
    val median =
      if (times.length % 2 == 1) times(times.length / 2)
      else (times(times.length / 2 - 1) + times(times.length / 2)) / 2.0
    println(f"[probe] $name MEDIAN: $median%.3f s over $reps warm reps")
    // dual-anchor adjudication (BenchAnchors.isolatedSeconds): dual-
    // regime queries keep a tight isolated anchor alongside the
    // loosened in-bench one — a real regression trips HERE at 1.5x
    // even when the loaded bench anchor would absorb it
    graft.BenchAnchors.isolatedSeconds.get(name).foreach { a =>
      val r = median / a
      println(f"[probe] $name vs isolated anchor $a%.3f s: ${r}%.2fx" +
        (if (r > 1.5) "  ** REGRESSION vs isolated anchor — investigate or re-anchor from THIS protocol **" else ""))
    }
  }
}
