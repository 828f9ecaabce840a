package graft

import org.apache.spark.sql.SparkSession

/** Isolated-gate probe: runs the named registry gates for N reps each in
  * a fresh session and prints per-rep times + the median. This is the
  * adjudication instrument BASELINE.md's bench protocol prescribes for
  * anchor flags — a driver-bench flag is trusted only if the gate is
  * still slow under a 5-rep quiet-box probe whose CONTROL rows (stable
  * CPU-bound gates) sit near their anchors.
  *
  * Usage: runMain graft.Probe <gate> [<gate> ...] [--reps N]
  * A leading `--controls` inserts the three standard control rows first.
  */
object Probe {
  val ControlRows: Seq[String] =
    Seq("dedup_exact", "rel_markov_transitions", "graph_hash_walks")

  def main(args: Array[String]): Unit = {
    val reps = args.sliding(2).collectFirst {
      case Array("--reps", n) => n.toInt
    }.getOrElse(5)
    val names0 = args.filterNot(_.startsWith("--"))
      .filterNot(a => args.sliding(2).exists {
        case Array("--reps", n) => n == a; case _ => false
      }).toSeq
    val names =
      if (args.contains("--controls")) ControlRows ++ names0 else names0
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup as Bench so rep 1 doesn't absorb session startup
    try {
      SparkEntry.entry(spark).count()
      spark.range(1000000).selectExpr("sum(id)").collect()
    } catch { case _: Throwable => }

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[probe] UNKNOWN gate: $name")
        case Some(fn) =>
          val times = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          val med = times.sorted.apply(times.size / 2)
          val anchor = BenchAnchors.seconds.get(name)
          val ratio = anchor.map(a => f"${med / a}%.2fx of ${a}%.3f").getOrElse("no anchor")
          println(f"[probe] $name%-28s median $med%6.3f s  ($ratio)  reps=${times.map(t => f"$t%.3f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
