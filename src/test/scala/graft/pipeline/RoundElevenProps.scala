package graft.pipeline

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Falsifiers for the round-11 kernels: the blocked edit-distance verify
  * against an independent classic-DP reference, and the epoch-shuffle
  * permutation key. */
object RoundElevenProps extends Properties("graft-round11") {

  // --- edit-distance verify vs an independent reference ---------------------

  /** Textbook Wagner–Fischer — deliberately NOT the engine's code path
    * (the kernel uses Spark's banded built-in). */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
  private val textGen: Gen[String] =
    Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val rowGen: Gen[(String, String, String)] = for {
    t <- textGen
    s <- Gen.oneOf("web", "books")
    l <- Gen.oneOf("en", "fr")
  } yield (t, s, l)

  property("edit verify == brute-force replay of blocking + classic DP") = {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val bucketChars = 16
    val prefixLen = 24
    val maxDist = 3
    forAll(Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, rowGen))) { rows =>
      val docs = rows.zipWithIndex.map { case ((t, s, l), i) => (i.toLong, t, s, l) }
      val df = docs.toDF("doc_id", "text", "source", "lang")
      val got = Dedup.editDistanceVerify(df, "doc_id", "text", "source", "lang",
        bucketChars, prefixLen, maxDist).as[(Long, Long, Int)].collect().toSet
      val want = (for {
        (ia, ta, sa, la) <- docs
        (ib, tb, sb, lb) <- docs
        if ia < ib && sa == sb && la == lb
        if math.abs(ta.length / bucketChars - tb.length / bucketChars) <= 1
        if math.abs(ta.length - tb.length) <= maxDist
        d = lev(ta.take(prefixLen), tb.take(prefixLen))
        if d <= maxDist
      } yield (ia, ib, d)).toSet
      got == want
    }
  }

  // --- epoch-shuffle key -----------------------------------------------------

  property("epoch key: injective on any id set below P, for any epoch") =
    forAll(Gen.choose(0, 1000), Gen.nonEmptyListOf(Gen.choose(0L, 1000000L))) {
      (e, rawIds) =>
        val p = 2147483647L
        val ids = rawIds.distinct
        // multiplier 48271 + 8191e is in (0, P) for all e here and P is
        // prime, so id -> key is a bijection on [0, P): no ties, the
        // per-epoch ordering is a full deterministic permutation
        val keys = ids.map(id => (id * (48271L + 8191L * e) + 7919L * e) % p)
        keys.distinct.size == ids.size
    }
}
