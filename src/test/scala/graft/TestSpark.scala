package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites. A `def` riding
  * getOrCreate (not a lazy val): getOrCreate ignores a STOPPED default
  * session and builds a fresh one, which is what lets
  * StoppedContextCleanupSpec stop the context mid-run to drive Search's
  * dead-context cache arms — every later suite transparently gets a new
  * session. Suites cache it per-suite via their own `lazy val`; suites
  * run sequentially in the one forked test JVM, so no suite observes a
  * stop from another suite mid-flight. */
object TestSpark {
  def spark: SparkSession = synchronized {
    // GRAFT_TEST_MASTER widens the pool for the heavy gates (e.g.
    // local[32] for HeavyXlSpec's 8 concurrent 100k Vamana builds);
    // default stays small so `sbt test` parallelism composes
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_TEST_MASTER", "local[4]"))
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_TEST_SHUFFLE", "8"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
