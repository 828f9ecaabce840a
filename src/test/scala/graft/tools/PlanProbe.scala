package graft.tools
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val p = graft.SparkEntry.queries("vec_knn_distributed_queries")(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/plan_dist.txt"), p.getBytes)
    println("written " + p.length)
  }
}
