package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Invariant gates for the count-min / HLL sketches and PMI collocations
  * (the DuckDB gate pins them value-for-value; these pin the structural
  * properties that make the sketches correct sketches). */
class SketchesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  /** Independent md5Lower64 reimplementation (little-endian last 8
    * bytes) — deliberately NOT TextKernels, so the specs cross-check
    * the kernel rather than restate it. */
  private def md5Lower64(s: String): Long = {
    val b = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    (15 to 8 by -1).foldLeft(0L)((h, i) => (h << 8) | (b(i) & 0xffL))
  }

  test("CMS: estimate is one-sided (cms_n >= exact_n) and exact when buckets dwarf vocabulary") {
    val out = Sketches.cmsHeavyHitters(docs).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val (exact, cms) = (r.getAs[Long]("exact_n"), r.getAs[Long]("cms_n"))
      assert(cms >= exact, s"${r.getAs[String]("token")}: cms $cms < exact $exact")
    }
    // exact top-1 must dominate the list (ordering is by exact count)
    val counts = out.map(_.getAs[Long]("exact_n"))
    assert(counts.sameElements(counts.sortBy(-_)))
  }

  test("CMS: a forced collision inflates the colliding token only upward") {
    // two tokens in one doc each; a third token duplicated heavily. A
    // 2-bucket sketch forces collisions; every estimate still bounds
    // its exact count from above.
    val tiny = Seq.tabulate(40)(i => (i.toLong, if (i < 30) "aaa" else s"tok$i"))
      .toDF("doc_id", "text")
    val out = Sketches.cmsHeavyHitters(tiny, d = 2, w = 2, k = 12).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("cms_n") >= r.getAs[Long]("exact_n"))
    }
    val a = out.find(_.getAs[String]("token") == "aaa").get
    assert(a.getAs[Long]("exact_n") == 30L)
  }

  test("HLL: registers reproduce the scalar kernel; estimates within sketch error") {
    val row = Sketches.hllVocabulary(docs).collect().head
    val exact = row.getAs[Long]("exact_distinct")
    val zeros = row.getAs[Long]("n_zero_registers")
    // recompute the zero-register count from the scalar kernel
    val toks = docs.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .distinct().as[String].collect()
    val seen = toks.map(t => md5Lower64(t) & 255L).toSet
    assert(zeros == 256L - seen.size)
    // linear counting is the right estimator at this cardinality: ±15%
    val lc = row.getAs[Double]("lc_estimate")
    assert(math.abs(lc - exact) <= math.max(4.0, 0.15 * exact),
      s"lc $lc vs exact $exact")
  }

  test("PMI: hand-computed two-bigram fixture") {
    // corpus: "a b" x4, "a c" x1  ->  bigrams: (a,b)=4, (a,c)=1, N=5
    // c1(a)=5, c2(b)=4, c2(c)=1
    // pmi(a b) = ln(4*5 / (5*4)) = 0; needs support>=minCount
    val df = (Seq.fill(4)("a b") ++ Seq("a c")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextAnalysis.pmiBigrams(df, "text", k = 5, minCount = 1L).collect()
    val m = out.map(r => r.getAs[String]("bigram") ->
      (r.getAs[Long]("c12"), r.getAs[Double]("pmi"))).toMap
    assert(m("a b") == ((4L, 0.0)))
    assert(m("a c") == ((1L, 0.0))) // ln(1*5/(5*1)) = 0 too
    assert(out.length == 2)
  }

  test("CMS mergeability: shard sketches summed cell-wise equal the whole-corpus sketch") {
    // the CMS counterpart of the HLL merge property: cells ADD across
    // shards. Build the global sketch and two shard sketches by hand
    // from exact token counts and compare cell-for-cell.
    def cells(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] = {
      df.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
        .groupBy("t").count().as[(String, Long)].collect()
        .flatMap { case (t, n) =>
          (0 until 4).map(j => (j, (md5Lower64(s"$j#$t") >>> 1) % 1024) -> n)
        }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    }
    val whole = cells(docs)
    val shardA = cells(docs.filter(col("doc_id") % 2 === 0))
    val shardB = cells(docs.filter(col("doc_id") % 2 =!= 0))
    val merged = (shardA.keySet ++ shardB.keySet).map(k =>
      k -> (shardA.getOrElse(k, 0L) + shardB.getOrElse(k, 0L))).toMap
    assert(merged == whole)
  }

  test("CMS partial-merge API: cmsFinish over sliced partials equals the one-shot sketch") {
    // the operator-level counterpart of the cell-additivity property:
    // partials from arbitrary disjoint slices, merged by cmsFinish,
    // reproduce cmsHeavyHitters row-for-row (what the streaming
    // foreachBatch gate relies on)
    val slices = Seq(
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 === 1),
      docs.filter(col("doc_id") % 3 === 2))
    val tokParts = slices.map(Sketches.cmsTokenPartials(_)).reduce(_ unionByName _)
    val cellParts = slices.map(s => Sketches.cmsCellPartials(Sketches.cmsTokenPartials(s)))
      .reduce(_ unionByName _)
    val merged = Sketches.cmsFinish(tokParts, cellParts)
      .as[(String, Long, Long)].collect().toSeq
    val oneShot = Sketches.cmsHeavyHitters(docs)
      .as[(String, Long, Long)].collect().toSeq
    assert(merged === oneShot)
  }

  test("HLL merge: the __merged__ row equals the whole-corpus sketch") {
    val whole = Sketches.hllVocabulary(docs).collect().head
    val merged = Sketches.hllBySource(docs).collect()
      .find(_.getAs[String]("source") == "__merged__").get
    assert(merged.getAs[Long]("n_zero_registers") ==
      whole.getAs[Long]("n_zero_registers"))
    assert(merged.getAs[Double]("hll_estimate") ==
      whole.getAs[Double]("hll_estimate"))
  }

  test("PMI: single-token docs are dropped, not exploded into bad indexes") {
    val df = Seq((1L, "solo"), (2L, "x y x y")).toDF("doc_id", "text")
    val out = TextAnalysis.pmiBigrams(df, "text", k = 10, minCount = 1L).collect()
    // bigrams: (x,y)=2, (y,x)=1; no row from the single-token doc
    assert(out.map(_.getAs[String]("bigram")).toSet == Set("x y", "y x"))
  }

  test("KMV bottom-k: estimate tracks exact Jaccard; sketch-union merge law holds") {
    // doc i contributes 4 unique shingles; A = docs 0-39, B = 20-59
    // -> exact shingle Jaccard = 80 / 240 = 1/3
    def text(i: Int) = s"a$i b$i c$i d$i e$i f$i"
    val rows = (0 until 40).map(i => (s"d$i", "A", text(i))) ++
      (20 until 60).map(i => (s"e$i", "B", text(i)))
    val df = rows.toDF("doc_id", "source", "text")
    val k = 64
    val est = Sketches.bottomKJaccard(
      Sketches.bottomKSketches(df, "text", "source", k), k).collect().head
    val j = est.getAs[Double]("jacc_est_r")
    assert(est.getAs[Long]("k_eff") == k)
    assert(math.abs(j - 1.0 / 3.0) < 0.15,
      s"KMV estimate $j too far from exact 0.333 at k=$k")
    // merge law: the k smallest of (sketchA ∪ sketchB) ARE the k
    // smallest of the full union — sketches compose without raw data
    val sketches = Sketches.bottomKSketches(df, "text", "source", k).collect()
    val mergedFromSketches = sketches.map(_.getAs[Long]("h"))
      .distinct.sorted.take(k).toSeq
    val full = Sketches.bottomKSketches(
      df.withColumn("source", lit("all")), "text", "source", k)
      .collect().map(_.getAs[Long]("h")).sorted.toSeq
    assert(mergedFromSketches == full, "KMV union-merge law violated")
  }

  test("HDR quantiles: sharded partials merge to the direct sketch; bounds bracket the exact quantile") {
    val rnd = new scala.util.Random(7)
    // wide-dynamic-range positives: exp-ish spread over ~6 decades
    val vals = (1 to 5000).map(_ => math.max(1L,
      math.round(math.exp(rnd.nextDouble() * 14))))
    val df = vals.toDF("v")
    val qs = Seq(10, 250, 500, 750, 900, 990, 999)
    val direct = Sketches.hdrQuantiles(
      Sketches.hdrCells(df, "v", subBits = 5), subBits = 5, qs).collect()
    val sharded = Sketches.hdrQuantiles(
      (0 until 4).map(sh => Sketches.hdrCells(
        df.filter(col("v") % 4 === sh), "v", subBits = 5))
        .reduce(_ unionByName _), subBits = 5, qs).collect()
    assert(direct.map(_.toSeq).toSeq == sharded.map(_.toSeq).toSeq)
    val sorted = vals.sorted
    direct.foreach { r =>
      val qpm = r.getAs[Int]("q_pm")
      val rank = (qpm.toLong * vals.size + 999) / 1000 // ceil
      val exact = sorted((rank - 1).toInt)
      val (lo, ub) = (r.getAs[Long]("est_lo"), r.getAs[Long]("est_ub"))
      assert(lo <= exact && exact <= ub, s"q=$qpm: [$lo,$ub] misses $exact")
      // HDR bound: bucket width <= 2^-5 relative
      assert(ub - lo + 1 <= math.max(1L, lo >> 5) * 2,
        s"q=$qpm: bucket [$lo,$ub] wider than the 2^-5 relative bound")
    }
  }

  test("HDR quantiles at 50M rows: cell table stays tiny, quantiles bracket the closed form") {
    assume(sys.env.contains("GRAFT_HEAVY") || sys.props.contains("GRAFT_HEAVY"),
      "heavy gate: set GRAFT_HEAVY=1 to run")
    // 50M deterministic wide-range positives from spark.range — the
    // volume proof: the sketch's working set is the CELL table
    // (<= ~63·32 rows), never the raw column
    val n = 50000000L
    val vals = spark.range(n).select(
      (pmod(col("id") * 2654435761L, lit(1000000007L)) + 1L).as("v"))
    val cells = Sketches.hdrCells(vals, "v", subBits = 5)
    val nCells = cells.count()
    assert(nCells <= 63L * 32, s"cell table must stay bounded, got $nCells")
    val qs = Sketches.hdrQuantiles(cells, subBits = 5, Seq(500, 990)).collect()
    // v is a near-uniform permutation-ish map into [1, 1e9+7]: p50
    // must sit within the 2^-5 band around ~5e8, p99 around ~9.9e8
    val p50 = qs.find(_.getAs[Int]("q_pm") == 500).get
    val (lo, ub) = (p50.getAs[Long]("est_lo"), p50.getAs[Long]("est_ub"))
    assert(lo <= 520000000L && ub >= 480000000L,
      s"p50 bucket [$lo,$ub] implausible for a near-uniform 1e9 domain")
    assert(qs.forall(_.getAs[Long]("n_total") == n))
  }

  test("HDR quantiles: exact (width-1 buckets) below 2^(subBits+1)") {
    val df = (1L to 63L).toDF("v")
    val out = Sketches.hdrQuantiles(
      Sketches.hdrCells(df, "v", subBits = 5), subBits = 5,
      Seq(500, 1000)).collect()
    // n=63: p500 ceil-rank 32 -> exactly 32; p1000 -> 63
    assert(out.map(r => (r.getAs[Int]("q_pm"),
      r.getAs[Long]("est_lo"), r.getAs[Long]("est_ub"))).toSeq ==
      Seq((500, 32L, 32L), (1000, 63L, 63L)))
  }

  test("HDR cells: non-positive values fail loudly instead of mis-bucketing") {
    for (bad <- Seq(0L, -7L)) {
      val df = Seq(5L, bad, 9L).toDF("v")
      val err = intercept[Exception] {
        Sketches.hdrCells(df, "v", subBits = 5).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(err).exists(_.contains("non-positive")), s"value $bad")
    }
  }
}
