package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-evidence dumper (test scope — optimization-round deliverable):
  * writes `.explain("formatted")` for each named registered query to
  * `<outDir>/<query>_<tag>.txt`, using the same session shape as
  * graft.Bench so the captured plan is the one the bench actually runs.
  *
  * Usage: sbt "Test/runMain graft.tools.ExplainDump <q1>[,<q2>...] <tag> [outDir] [sfDir]"
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("explain-dump").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tag = args(1)
    val outDir = if (args.length > 2) args(2) else "plans/r16"
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    args(0).split(",").foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
          plan.getBytes("UTF-8"))
        println(s"[explain] wrote $outDir/${name}_$tag.txt (${plan.length} chars)")
      } catch {
        case e: Throwable => println(s"[explain] $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
