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

  /** Independent implementation of the INVERSE walk (d → xy, the classic
    * public-domain counterpart) — round-tripping through it falsifies any
    * rotation/flip/quadrant error in the forward kernel. */
  private def d2xy(d: Long): (Int, Int) = {
    var t = d
    var x = 0
    var y = 0
    var s = 1
    while (s < 65536) {
      val rx = (1L & (t / 2)).toInt
      val ry = (1L & (t ^ rx)).toInt
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }

  test("hilbert2 round-trips the independent inverse walk; SQL == DSL; injective") {
    graft.GraftExtensions.register(spark)
    // deterministic spread of curve positions incl. the corners
    val ds = (Seq(0L, 1L, 2L, 3L, 4294967295L) ++
      (0 until 4096).map(i => (i.toLong * 1048583L) % 4294967296L)).distinct
    val pts = ds.map { d => val (x, y) = d2xy(d); (d, x, y) }
    val df = pts.toDF("d", "x", "y")
    val got = df.select(col("d"), layout.hilbert2(col("x"), col("y")).as("h"))
      .as[(Long, Long)].collect()
    assert(got.forall { case (d, h) => h == d },
      got.filter { case (d, h) => h != d }.take(5).toSeq)
    // SQL registry parity
    df.createOrReplaceTempView("graft_layout_h")
    val viaSql = spark.sql("SELECT d, hilbert2(x, y) FROM graft_layout_h")
      .as[(Long, Long)].collect()
    assert(viaSql.forall { case (d, h) => h == d })
    // adjacency (the Hilbert property Morton lacks): consecutive curve
    // positions are 4-neighbors
    val walk = (0L until 2048L).map(d2xy)
    assert(walk.sliding(2).forall { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) == 1 })
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
