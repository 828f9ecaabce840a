package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-11 second-wave kernels: char entropy, line boilerplate,
  * Cohen's kappa, PSI drift, modularity. */
class RoundElevenBSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def entropyOf(s: String): (Long, Long, Double) = {
    val row = Seq(s).toDF("t")
      .select(graft.functions.text.char_entropy(col("t")).as("ce"))
      .select(col("ce.n_cps"), col("ce.n_distinct"), col("ce.entropy"))
      .head()
    (row.getLong(0), row.getLong(1), row.getDouble(2))
  }

  test("char entropy: closed forms — empty, constant, uniform") {
    assert(entropyOf("") == ((0L, 0L, 0.0)))
    assert(entropyOf("aaaa") == ((4L, 1L, 0.0)))
    val (n, d, h) = entropyOf("abab")
    assert(n == 4L && d == 2L && math.abs(h - math.log(2)) < 1e-12)
    val (_, d4, h4) = entropyOf("abcdabcd")
    assert(d4 == 4L && math.abs(h4 - math.log(4)) < 1e-12)
  }

  test("char entropy: a surrogate pair is ONE codepoint") {
    val (n, d, _) = entropyOf("😀a") // 😀a
    assert(n == 2L && d == 2L)
  }

  test("char entropy: brute replay over mixed-script strings") {
    val samples = Seq("héllo wörld", "日本語テキスト", "aa bb cc aa", "x",
      "the quick brown fox", "ααββγγ mixed με latin")
    samples.foreach { s =>
      val cps = s.codePoints().toArray
      val counts = cps.groupBy(identity).view.mapValues(_.length.toLong)
      val n = cps.length.toLong
      val expected =
        if (n == 0) 0.0
        else math.log(n.toDouble) -
          counts.toSeq.sortBy(_._1).map { case (_, c) => c * math.log(c.toDouble) }.sum / n
      val (gn, gd, gh) = entropyOf(s)
      assert(gn == n && gd == counts.size.toLong)
      assert(math.abs(gh - expected) < 1e-12, s"entropy mismatch on '$s'")
    }
  }

  test("line boilerplate: df >= minDocs within one source, never across sources") {
    val df = Seq(
      (1L, "web", "nav bar\nbody one"),
      (2L, "web", "nav bar\nbody two"),
      (3L, "web", "nav bar\nbody three"),
      (4L, "web", "rare line\nbody four"),
      (5L, "books", "nav bar\nchapter text") // same line, other source
    ).toDF("doc_id", "source", "text")
    val out = Dedup.lineBoilerplate(df, "doc_id", "text", "source", minDocs = 3L)
      .orderBy("doc_id")
      .select("doc_id", "n_lines", "n_boiler_lines", "boiler_char_frac")
      .as[(Long, Long, Long, Double)].collect()
    assert(out(0) == ((1L, 2L, 1L, 7.0 / 15.0))) // 'nav bar'=7, 'body one'=8
    assert(out(3)._3 == 0L, "df=1 line is not boilerplate")
    assert(out(4)._3 == 0L, "the books copy must not inherit web's df")
  }

  test("line boilerplate: trimming and empty-line semantics match the repetition kernel") {
    val df = Seq(
      (1L, "s", "  padded  \n\n\t\r\nx"),
      (2L, "s", "padded\ny"),
      (3L, "s", "padded\nz")).toDF("doc_id", "source", "text")
    val out = Dedup.lineBoilerplate(df, "doc_id", "text", "source", minDocs = 3L)
      .orderBy("doc_id").select("n_lines", "n_boiler_lines")
      .as[(Long, Long)].collect()
    assert(out(0) == ((2L, 1L)), "'  padded  ' trims to 'padded'; blank lines drop")
  }

  test("cohen kappa: perfect agreement is 1, and the hand confusion matrix replays") {
    val perfect = Seq(("g", "a", "a"), ("g", "b", "b"), ("g", "c", "c"))
      .toDF("grp", "ra", "rb")
    val k1 = Agreement.cohenKappa(perfect, Seq("grp"), "ra", "rb", Seq("a", "b", "c"))
      .select("kappa").as[Double].head()
    assert(k1 == 1.0)

    // hand case: n=10, diag=7, marginals A:(5,3,2) B:(5,3,2)
    // po=0.7, pe=(25+9+4)/100=0.38, kappa=0.32/0.62
    val rows = Seq.fill(4)(("g", "a", "a")) ++ Seq(("g", "a", "b")) ++
      Seq(("g", "b", "b"), ("g", "b", "b")) ++ Seq(("g", "b", "c")) ++
      Seq(("g", "c", "a")) ++ Seq(("g", "c", "c"))
    val out = Agreement.cohenKappa(rows.toDF("grp", "ra", "rb"),
        Seq("grp"), "ra", "rb", Seq("a", "b", "c"))
      .select("n", "po", "pe", "kappa").as[(Long, Double, Double, Double)].head()
    assert(out._1 == 10L)
    assert(math.abs(out._2 - 0.7) < 1e-12)
    assert(math.abs(out._3 - 0.38) < 1e-12)
    assert(math.abs(out._4 - 0.32 / 0.62) < 1e-12)
  }

  test("cohen kappa: out-of-vocabulary labels are ignored, degenerate pe=1 yields 1.0") {
    val df = Seq(("g", "a", "a"), ("g", "junk", "a"), ("g", "a", "junk"))
      .toDF("grp", "ra", "rb")
    val out = Agreement.cohenKappa(df, Seq("grp"), "ra", "rb", Seq("a", "b"))
      .select("n", "kappa").as[(Long, Double)].head()
    assert(out._1 == 1L, "only the in-vocab row counts")
    assert(out._2 == 1.0, "single-category agreement: pe=1 guard")
  }

  test("cohen kappa: a group with zero in-vocab rows scores 0.0, never NULL") {
    val df = Seq(("g", "junk", "junk"), ("g", "junk", "a")).toDF("grp", "ra", "rb")
    val out = Agreement.cohenKappa(df, Seq("grp"), "ra", "rb", Seq("a", "b"))
      .select("n", "po", "pe", "kappa").as[(Long, Double, Double, Double)].head()
    assert(out == ((0L, 0.0, 0.0, 0.0)),
      "an un-ratable batch must FAIL a kappa>=threshold gate, not null-skip it")
  }

  test("psi: NULL values belong to no slice — dropped before counting") {
    val df = Seq(("e", Some(10.0), true), ("e", None, true),
      ("e", Some(10.0), false)).toDF("k", "value", "base")
    val row = Drift.psiFixedBins(df, Seq("k"), "value", col("base"),
        bins = 10, lo = 0.0, hi = 500.0)
      .select("n_base", "n_curr").as[(Long, Long)].head()
    assert(row == ((1L, 1L)), "the null row must not deflate the proportions")
  }

  test("psi: identical distributions score exactly zero; a shift scores positive") {
    val same = (0 until 100).flatMap(i =>
      Seq(("e", i.toDouble * 5, true), ("e", i.toDouble * 5, false)))
      .toDF("k", "value", "base")
    val psi0 = Drift.psiFixedBins(same, Seq("k"), "value", col("base"),
        bins = 10, lo = 0.0, hi = 500.0)
      .select("psi").as[Double].head()
    assert(psi0 == 0.0, "equal per-bin counts cancel term-for-term")

    val shifted = ((0 until 100).map(i => ("e", i.toDouble, true)) ++
      (0 until 100).map(i => ("e", 400.0 + i, false)))
      .toDF("k", "value", "base")
    val psi1 = Drift.psiFixedBins(shifted, Seq("k"), "value", col("base"),
        bins = 10, lo = 0.0, hi = 500.0)
      .select("psi").as[Double].head()
    assert(psi1 > 1.0, s"a full-range shift must flag hard, got $psi1")
  }

  test("psi: out-of-range values clamp to the edge bins") {
    val df = Seq(("e", -50.0, true), ("e", 1e9, true),
      ("e", -50.0, false), ("e", 1e9, false)).toDF("k", "value", "base")
    val psi = Drift.psiFixedBins(df, Seq("k"), "value", col("base"),
        bins = 10, lo = 0.0, hi = 500.0)
      .select("psi").as[Double].head()
    assert(psi == 0.0, "clamped identical slices still cancel")
  }

  test("modularity: two triangles + bridge closed form") {
    // communities: {1,2,3} and {4,5,6}; bridge 1-4; m=7
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (1L, 4L)).toDF("src", "dst")
    val comm = Seq((1L, 0L), (2L, 0L), (3L, 0L),
      (4L, 1L), (5L, 1L), (6L, 1L)).toDF("node", "community")
    val out = GraphAlgos.modularity(edges, comm).orderBy("community")
      .select("community", "n_nodes", "degree_sum", "intra_edges", "m_edges", "contribution")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(out.length == 2)
    out.foreach { case (_, nn, ds, ie, m, q) =>
      assert(nn == 3L && ds == 7L && ie == 3L && m == 7L)
      assert(math.abs(q - (3.0 / 7 - 0.25)) < 1e-12)
    }
  }

  test("assortativity: a star is perfectly disassortative, a cycle degenerates to 0") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val r = GraphAlgos.assortativity(star)
      .select("assortativity").as[Double].head()
    assert(math.abs(r - (-1.0)) < 1e-12, s"star must score -1, got $r")

    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r2 = GraphAlgos.assortativity(cycle)
      .select("assortativity").as[Double].head()
    assert(r2 == 0.0, "regular graph: zero variance guard")
  }

  test("assortativity: integer sums replay the hand computation") {
    // path 1-2-3: degrees 1,2,1; edges (1,2),(2,3) → j·k sums = 2+2
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val row = GraphAlgos.assortativity(path)
      .select("m_edges", "sum_jk", "sum_deg", "sum_deg2")
      .as[(Long, Long, Long, Long)].head()
    assert(row == ((2L, 4L, 6L, 10L)))
  }

  test("stitch pairs: a continuation starting with the suffix is found; short docs drop") {
    val df = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "c d e f g h i j continuation text goes onward"),
      (3L, "too short to key"),
      (4L, "unrelated body of nine tokens padding out fully")).toDF("doc_id", "text")
    val out = Dedup.stitchPairs(df, "doc_id", "text", k = 8)
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L)))
  }

  test("stitch pairs: identical repetitive docs pair both ways but never self-pair") {
    val t = "x x x x x x x x x x"
    val df = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val out = Dedup.stitchPairs(df, "doc_id", "text", k = 8)
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (2L, 1L)))
  }

  test("modularity: the whole graph as one community scores zero") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val comm = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("node", "community")
    val q = GraphAlgos.modularity(edges, comm)
      .select("contribution").as[Double].head()
    assert(math.abs(q) < 1e-12, "e_c=m and d_c=2m cancel exactly")
  }

  test("conductance: two triangles + bridge — one leaky edge over volume 7") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (1L, 4L)).toDF("src", "dst")
    val comm = Seq((1L, 0L), (2L, 0L), (3L, 0L),
      (4L, 1L), (5L, 1L), (6L, 1L)).toDF("node", "community")
    val out = GraphAlgos.conductance(edges, comm).orderBy("community")
      .select("volume", "cut_edges", "conductance")
      .as[(Long, Long, Double)].collect()
    out.foreach { case (vol, cut, phi) =>
      assert(vol == 7L && cut == 1L)
      assert(math.abs(phi - 1.0 / 7) < 1e-12)
    }
  }

  test("conductance: a sealed partition scores zero") {
    val edges = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    val comm = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)).toDF("node", "community")
    val phis = GraphAlgos.conductance(edges, comm)
      .select("conductance").as[Double].collect()
    assert(phis.forall(_ == 0.0))
  }

  test("jaccard threshold sweep: hand pairs land in the right buckets") {
    val df = Seq(
      (1L, "a b c d e f"), // shingles abc bcd cde def
      (2L, "a b c d e f"), // identical -> jaccard 1.0 with 1
      (3L, "a b c d x y")) // shares abc,bcd with 1/2 -> 2/6 = 0.333
      .toDF("doc_id", "text")
    val row = Dedup.jaccardThresholdSweep(df, "doc_id", "text")
      .select("n_candidate_pairs", "pairs_ge_50", "pairs_ge_90")
      .as[(Long, Long, Long)].head()
    assert(row == ((3L, 1L, 1L)),
      "3 candidates (1-2, 1-3, 2-3); only the identical pair clears 50/90")
  }

  test("image entropy: a solid frame scores zero; the quadrant closed form replays") {
    def pngBlob(id: Long, colors: Seq[Int], w: Int, h: Int): Multimodal.MediaBlob = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, colors((y * w + x) % colors.length) << 16)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      Multimodal.MediaBlob(id, "image/png", bos.toByteArray,
        Multimodal.MediaMeta(w, h, 3, 0L))
    }
    val blobs = Seq(
      pngBlob(1L, Seq(42), 8, 8), // solid
      pngBlob(2L, Seq(10, 200), 8, 8)) // perfect 2-value alternation
      .toDS()
    val out = Multimodal.imageEntropy(blobs).collect().sortBy(_.doc_id)
    assert(out(0).n_pixels == 64L && out(0).n_distinct == 1L && out(0).entropy == 0.0)
    assert(out(1).n_distinct == 2L &&
      math.abs(out(1).entropy - math.log(2)) < 1e-12)
  }

  test("jsd: a group with ZERO vocabulary overlap still appears, scoring high") {
    // the oddest possible slice (no token in the corpus top-v) must not
    // vanish from the diagnostic's output. The corpus dist must be
    // SKEWED: a uniform corpus coincides with the zero-count group's
    // add-1 prior and scores a legitimate 0.
    val df = Seq(("a", "x x x x x y y"), ("b", "zzz qqq www")).toDF("source", "text")
    val rows = Drift.jsdByGroup(df, "source", "text", v = 2)
      .select("source", "n_vocab_tokens", "jsd")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("a", "b"), "both groups must be present")
    val b = rows(1)
    assert(b._2 == 0L, "b has no vocab tokens")
    // add-1 smoothing over a 7-token corpus dampens the magnitude; what
    // the regression guards is PRESENCE with a strictly positive score
    // (the pre-fix kernel dropped the row entirely)
    assert(b._3 > 0.0, s"zero-overlap group must score positive, got ${b._3}")
  }

  test("jsd: identical group distributions score exactly zero; disjoint score high") {
    val same = Seq(("a", "x y z x y"), ("b", "x y z x y")).toDF("source", "text")
    val jsd0 = Drift.jsdByGroup(same, "source", "text", v = 10)
      .select("jsd").as[Double].collect()
    assert(jsd0.forall(_ == 0.0), "equal counts give p = q term-for-term")

    val disjoint = Seq(("a", "x x x x x x x x"), ("b", "y y y y y y y y"))
      .toDF("source", "text")
    val jsds = Drift.jsdByGroup(disjoint, "source", "text", v = 10)
      .select("jsd").as[Double].collect()
    // closed form with add-1 over the 2-term vocab: p=(.9,.1), q=(.1,.9)
    // -> JSD = 2·(0.45·ln1.8 + 0.05·ln0.2) = 0.36806...
    assert(jsds.forall(j => math.abs(j - 0.3680642071684971) < 1e-12),
      s"disjoint two-term closed form, got ${jsds.toSeq}")
  }
}
