package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-14 operator kernels. */
class RoundFourteenOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("substring runs: a planted shared passage is found at its exact length") {
    val shared = "0123456789abcdefghijklmnopqrstuvwxyzABCD" // 40 chars
    val df = Seq(
      (1L, s"prefix one $shared suffix one"),
      (2L, s"a different lead-in $shared and another tail"),
      (3L, "no overlap with anything else in this corpus at all, none"))
      .toDF("doc_id", "text")
    val out = Dedup.substringRuns(df, "doc_id", "text", gramLen = 30, maxDf = 50)
      .as[(Long, Long, Long, Long)].collect().toSet
    // the shared run is " 0123...ABCD " (42 chars with both spaces)
    assert(out == Set((1L, 2L, 42L, 1L)))
  }

  test("substring runs: two disjoint shared passages count as two runs") {
    val a = "A".concat("x" * 30).concat("MIDDLE-A-ONLY-SECTION-PADDING!!")
      .concat("y" * 30).concat("Z")
    val b = "B".concat("x" * 30).concat("other-middle-entirely-here-now!")
      .concat("y" * 30).concat("Q")
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val out = Dedup.substringRuns(df, "doc_id", "text", gramLen = 30, maxDf = 50)
      .as[(Long, Long, Long, Long)].collect().toSet
    // x-run is exactly 30; both middles end in '!' so the y-run is 31
    assert(out == Set((1L, 2L, 31L, 2L)))
  }

  test("bradley-terry: two MM rounds match hand math; shutout rates 0") {
    // A beats B twice, B beats A once, A beats C twice.
    // s1 = 2W/N: A = 2*4/5, B = 2/3, C = 0.
    // den_A = 3/(s1A+s1B) + 2/(s1A+s1C) = 3/(34/15) + 2/(8/5)
    // s2_A = 4/den_A; s2_B = 1/(3/(34/15)); C shutout -> 0.
    val m = Seq((1L, 2L), (1L, 2L), (2L, 1L), (1L, 3L), (1L, 3L))
      .toDF("winner", "loser")
    val got = Preference.bradleyTerry(m, "winner", "loser")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val s1a = 2.0 * 4 / 5; val s1b = 2.0 / 3; val s1c = 0.0
    val denA = 3 / (s1a + s1b) + 2 / (s1a + s1c)
    val denB = 3 / (s1a + s1b)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) === ((4L, 5L, r6(4 / denA))))
    assert(got(2L) === ((1L, 3L, r6(1 / denB))))
    assert(got(3L) === ((0L, 2L, 0.0)))
  }

  test("substring survivors: higher-id doc carries the coverage, union never double-counts") {
    val shared = "0123456789abcdefghijklmnopqrstuvwxyzABCD" // 40 chars
    val df = Seq(
      (1L, s"prefix one $shared suffix one"),
      (2L, s"lead $shared tail"), // covered 42 of 51 -> dropped
      (3L, "no overlap with anything else in this corpus at all, none"))
      .toDF("doc_id", "text")
    val out = Dedup.substringSurvivors(df, "doc_id", "text",
        gramLen = 30, maxDf = 50, dropFraction = 0.5)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    // only doc 2 (the higher id of the pair) emits a row
    assert(out.map(_._1).toSet === Set(2L))
    val r = out.head
    assert(r._2 === ("lead " + shared + " tail").length.toLong)
    assert(r._3 === 42L) // " <shared> " with both boundary spaces
    assert(r._5 === (42.0 / r._2 >= 0.5))
  }

  test("guard falsifiers: invalid parameters throw, never mis-compute") {
    val df = Seq((1L, "abc")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.substringRuns(df, "doc_id", "text", gramLen = 1, maxDf = 50)
    }
    intercept[IllegalArgumentException] {
      Dedup.substringRuns(df, "doc_id", "text", gramLen = 30, maxDf = 1)
    }
    intercept[IllegalArgumentException] {
      Sketches.kmvIntersections(df, "doc_id", "doc_id", k = 0)
    }
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      GraphAlgos.hashWalks(e, Seq(1L), steps = 0)
    }
    intercept[IllegalArgumentException] {
      GraphAlgos.hashWalks(e, Seq.empty, steps = 2)
    }
    intercept[IllegalArgumentException] {
      GraphAlgos.katzCentrality(e, rounds = 0, base = 8L)
    }
    intercept[IllegalArgumentException] {
      GraphAlgos.katzCentrality(e, rounds = 2, base = 1L)
    }
    intercept[IllegalArgumentException] {
      GraphAlgos.stressCentrality(e, Seq(1L), rounds = 1)
    }
  }

  test("box filter rejects images narrower than the window") {
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val blobs = spark.createDataset(Seq(Multimodal.MediaBlob(
      7L, "image/png", bos.toByteArray, Multimodal.MediaMeta(2, 2, 3, 0L))))
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeBoxFilter(blobs).collect()
    }
    assert(ex.getMessage != null)
  }

  test("hash walks: dead-end directed node ends the walk early") {
    // 1 -> 2, no out-edges from 2: step 1 reaches 2, steps 2+ emit no row
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val got = GraphAlgos.hashWalks(e, Seq(1L), steps = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 0L, 1L), (1L, 1L, 2L)))
  }

  test("substring runs: the df-cap drops corpus-wide boilerplate") {
    val boiler = "b" * 40
    val rows = (1L to 6L).map(i => (i, s"doc $i carries $boiler verbatim"))
    val df = rows.toDF("doc_id", "text")
    // cap 5 < 6 docs: every gram inside the boilerplate is dropped
    val out = Dedup.substringRuns(df, "doc_id", "text", gramLen = 30, maxDf = 5)
    assert(out.count() === 0L)
  }
}
