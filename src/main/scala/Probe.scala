import org.apache.spark.sql.SparkSession

/** Temporary adjudication probe (deleted after use): isolated warm medians
  * for the round-5 bench watch-list queries. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = Seq("rel_rollup_flags", "rel_q3_shipping_priority",
      "rel_q1_pricing_summary", "rel_q4_order_priority")

    // warmup: session + codegen + one run of each probed query
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach(n => graft.SparkEntry.queries(n)(spark, sfDir).count())

    names.foreach { n =>
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val med = reps.sorted.apply(1)
      println(f"PROBE $n%-28s median=$med%.3f reps=${reps.map(r => f"$r%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
