package graft.pipeline

import org.apache.spark.sql.functions._



/** Diagnostic main: times connected components on the heavy DBSCAN
  * blob graph (16 unit-box blobs, ~19 neighbors per ε-disk). This is
  * the harness behind two BASELINE.md round-13 findings: (1) localCheckpoint
  * loops with a self-join compound Catalyst size estimates into
  * driver-killing BigInteger math (fixed by SparkShims
  * .freshCheckpointStats), and (2) min-label propagation converges in
  * Θ(diameter) rounds on spatial meshes (fixed by
  * GraphAlgos.connectedComponentsStar). Usage:
  * {{{ sbt "Test/runMain graft.pipeline.CcProbe 960000" }}} */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val nBlob = args.headOption.map(_.toLong).getOrElse(240000L)
    val n = nBlob + nBlob / 24
    def jit(salt: Int) =
      pmod(xxhash64(col("id"), lit(salt)), lit(1000000L)).cast("double") / 1000000.0
    val pts = spark.range(n).select(
      col("id"),
      when(col("id") < nBlob, (col("id") % 4L).cast("double") * 2.0 + 0.5 + jit(1))
        .otherwise(jit(3) * 8.0).as("x"),
      when(col("id") < nBlob, ((col("id") / 4L) % 4L).cast("double") * 2.0 + 0.5 + jit(2))
        .otherwise(jit(4) * 8.0).as("y"))
    val pairs = Clustering.epsNeighborPairs(pts, "id", col("x"), col("y"), 0.01)
      .localCheckpoint()
    val counts = pairs.groupBy(col("p")).agg(count(lit(1)).as("n_eps"))
    val core = counts.filter(col("n_eps") >= 8).select(col("p").as("cp"))
    val coreEdges = pairs.filter(col("p") =!= col("q"))
      .join(core, col("p") === col("cp")).drop("cp")
      .join(core, col("q") === col("cp")).drop("cp")
      .localCheckpoint()
    println(s"[ccprobe] n=$n core=${core.count()} coreEdges=${coreEdges.count()}")

    // production CC path (star rewriting — what dbscanLabels runs)
    val tP = System.nanoTime()
    val prod = GraphAlgos.connectedComponentsStar(coreEdges.select(col("p"), col("q")))
    val nClusters = prod.select(countDistinct(col("component"))).head().getLong(0)
    println(f"[ccprobe] connectedComponentsStar: ${(System.nanoTime() - tP) / 1e9}%.1f s, clusters=$nClusters")

    spark.stop()
  }
}
