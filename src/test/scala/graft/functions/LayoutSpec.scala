package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LayoutSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zorder2 interleaves bits: known values, SQL == DSL") {
    graft.GraftExtensions.register(spark)
    val df = Seq((3, 1), (0, 0), (65535, 65535), (1, 0), (0, 1)).toDF("x", "y")
    val got = df.select(layout.zorder2(col("x"), col("y"))).as[Long].collect().toSeq
    // (3,1): x bits 0,1 → z bits 0,2; y bit 0 → z bit 1 → 0b0111 = 7
    // (65535,65535): all 32 low bits set
    assert(got === Seq(7L, 0L, 0xFFFFFFFFL, 1L, 2L))
    df.createOrReplaceTempView("graft_layout_z")
    val viaSql = spark.sql("SELECT zorder2(x, y) FROM graft_layout_z")
      .as[Long].collect().toSeq
    assert(viaSql === got)
  }

  test("z-order locality: a z-range window bounds BOTH dimension spans") {
    // full 64x64 grid; any aligned 2^6-wide z-range covers an 8x8 tile
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x, y)
    val z = grid.toDF("x", "y")
      .select(col("x"), col("y"), layout.zorder2(col("x"), col("y")).as("z"))
      .withColumn("bucket", expr("z div 64"))
      .groupBy("bucket")
      .agg((max(col("x")) - min(col("x"))).as("xs"),
        (max(col("y")) - min(col("y"))).as("ys"),
        count(lit(1)).as("n"))
      .as[(Long, Int, Int, Long)].collect()
    assert(z.length === 64)
    assert(z.forall { case (_, xs, ys, n) => xs <= 7 && ys <= 7 && n == 64 },
      z.toSeq.take(5))
  }
}
