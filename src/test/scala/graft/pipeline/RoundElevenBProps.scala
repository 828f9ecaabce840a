package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Falsifiers for the round-11 second-session kernels: each engine result
  * is replayed by an independent naive Scala implementation over
  * generated inputs — deliberately NOT sharing code with the kernels. */
object RoundElevenBProps extends Properties("graft-round11b") {

  private lazy val spark = graft.TestSpark.spark

  // --- char entropy vs a naive codepoint map --------------------------------

  property("char entropy == naive codepoint histogram") = {
    import spark.implicits._
    forAll(Gen.listOfN(5, Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'z', '1', 'é', '中', '✓', ' ', '\n'))
        .map(_.mkString)))) { texts =>
      val rows = texts.toDF("t")
        .select(graft.functions.text.char_entropy(col("t")).as("ce"))
        .select(col("ce.n_cps"), col("ce.n_distinct"), col("ce.entropy"))
        .as[(Long, Long, Double)].collect()
      texts.zip(rows).forall { case (s, (n, d, h)) =>
        val cps = s.codePoints().toArray
        val counts = cps.groupBy(identity).view.mapValues(_.length.toLong).toMap
        val wantH =
          if (cps.isEmpty) 0.0
          else math.log(cps.length.toDouble) -
            counts.toSeq.sortBy(_._1).map { case (_, c) => c * math.log(c.toDouble) }.sum / cps.length
        n == cps.length.toLong && d == counts.size.toLong && math.abs(h - wantH) < 1e-12
      }
    }
  }

  // --- Cohen's kappa vs the textbook formula ---------------------------------

  property("cohen kappa == naive confusion-matrix replay") = {
    import spark.implicits._
    val cats = Seq("a", "b", "c")
    val label = Gen.oneOf("a", "b", "c", "junk")
    forAll(Gen.choose(1, 25).flatMap(n =>
      Gen.listOfN(n, Gen.zip(label, label)))) { pairs =>
      val got = Agreement.cohenKappa(
          pairs.toDF("ra", "rb").withColumn("g", lit("g")),
          Seq("g"), "ra", "rb", cats)
        .select("n", "po", "pe", "kappa")
        .as[(Long, Double, Double, Double)].head()
      val in = pairs.filter { case (a, b) => cats.contains(a) && cats.contains(b) }
      val n = in.size
      if (n == 0) got == ((0L, 0.0, 0.0, 0.0))
      else {
        val po = in.count { case (a, b) => a == b }.toDouble / n
        val pe = cats.map { k =>
          val ra = in.count(_._1 == k).toDouble
          val rb = in.count(_._2 == k).toDouble
          ra * rb / (n.toDouble * n)
        }.sum
        val kappa = if (pe >= 1.0) 1.0 else (po - pe) / (1.0 - pe)
        got._1 == n.toLong && math.abs(got._2 - po) < 1e-9 &&
          math.abs(got._3 - pe) < 1e-9 && math.abs(got._4 - kappa) < 1e-9
      }
    }
  }

  // --- PSI vs a naive binned replay ------------------------------------------

  property("psi == naive fixed-bin replay with Laplace smoothing") = {
    import spark.implicits._
    val bins = 5
    val (lo, hi) = (0.0, 100.0)
    forAll(Gen.choose(1, 40).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(-20.0, 120.0), Gen.oneOf(true, false))))) { rows =>
      val got = Drift.psiFixedBins(rows.toDF("value", "base").withColumn("k", lit("k")),
          Seq("k"), "value", col("base"), bins, lo, hi)
        .select("n_base", "n_curr", "psi").as[(Long, Long, Double)].head()
      def bin(v: Double): Int =
        math.min(math.max(math.floor((v - lo) / ((hi - lo) / bins)).toInt, 0), bins - 1)
      val base = rows.filter(_._2).map(r => bin(r._1))
      val curr = rows.filterNot(_._2).map(r => bin(r._1))
      val psi = (0 until bins).map { i =>
        val pb = (base.count(_ == i) + 1.0) / (base.size + bins)
        val pc = (curr.count(_ == i) + 1.0) / (curr.size + bins)
        (pb - pc) * math.log(pb / pc)
      }.sum
      got._1 == base.size.toLong && got._2 == curr.size.toLong &&
        math.abs(got._3 - psi) < 1e-9
    }
  }

  // --- threshold sweep vs brute set Jaccard ----------------------------------

  property("threshold sweep == brute distinct-shingle Jaccard over the pruned space") = {
    import spark.implicits._
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val text = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    forAll(Gen.choose(2, 7).flatMap(n => Gen.listOfN(n, text))) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val maxDf = 100L // pruning disabled: tiny corpora, test the bucketing
      val got = Dedup.jaccardThresholdSweep(docs.toDF("doc_id", "text"),
          "doc_id", "text", shingleK = 3, maxDf = maxDf)
        .select("n_candidate_pairs", "pairs_ge_50", "pairs_ge_90")
        .as[(Long, Long, Long)].head()
      def sh(t: String): Set[String] = {
        val tk = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        if (tk.length < 3) Set(tk.mkString(" "))
        else tk.sliding(3).map(_.mkString(" ")).toSet
      }
      val pairs = for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        inter = (sh(ta) intersect sh(tb)).size if inter > 0
      } yield (inter, (sh(ta) union sh(tb)).size)
      got._1 == pairs.size.toLong &&
        got._2 == pairs.count { case (i, u) => i * 100 >= u * 50 }.toLong &&
        got._3 == pairs.count { case (i, u) => i * 100 >= u * 90 }.toLong
    }
  }

  // --- stitch pairs vs a brute suffix/prefix scan ------------------------------

  property("stitch pairs == brute suffix/prefix comparison") = {
    import spark.implicits._
    val word = Gen.oneOf("aa", "bb", "cc")
    val text = Gen.choose(1, 7).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val k = 3
    forAll(Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, text))) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.stitchPairs(docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .as[(Long, Long)].collect().toSet
      def toks(t: String) = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val want = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia != ib
        a = toks(ta); b = toks(tb)
        if a.length >= k && b.length >= k && a.takeRight(k) == b.take(k)
      } yield (ia, ib)).toSet
      got == want
    }
  }

  // --- line boilerplate vs a naive per-line replay -----------------------------

  property("line boilerplate == naive df counting with the light trim") = {
    import spark.implicits._
    val line = Gen.oneOf("nav", "  nav  ", "body one", "body two", "", "\t", "x")
    val text = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, line)).map(_.mkString("\n"))
    forAll(Gen.choose(1, 8).flatMap(n => Gen.listOfN(n,
      Gen.zip(text, Gen.oneOf("s1", "s2"))))) { rows =>
      val docs = rows.zipWithIndex.map { case ((t, src), i) => (i.toLong, src, t) }
      val minDocs = 2L
      val got = Dedup.lineBoilerplate(docs.toDF("doc_id", "source", "text"),
          "doc_id", "text", "source", minDocs)
        .select("doc_id", "n_lines", "n_boiler_lines", "n_line_chars", "n_boiler_chars")
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      def lines(t: String): Seq[String] =
        t.split("\n", -1).toSeq
          .map(_.dropWhile(c => c == ' ' || c == '\t' || c == '\r')
            .reverse.dropWhile(c => c == ' ' || c == '\t' || c == '\r').reverse)
          .filter(_.nonEmpty)
      val df = docs.flatMap { case (id, src, t) => lines(t).distinct.map(l => (src, l, id)) }
        .groupBy(p => (p._1, p._2)).view.mapValues(_.map(_._3).distinct.size).toMap
      docs.forall { case (id, src, t) =>
        val ls = lines(t)
        val boiler = ls.filter(l => df((src, l)) >= minDocs)
        val (_, gn, gb, gc, gbc) = got(id)
        gn == ls.size.toLong && gb == boiler.size.toLong &&
          gc == ls.map(_.length).sum.toLong && gbc == boiler.map(_.length).sum.toLong
      }
    }
  }

  // --- modularity + conductance + assortativity vs brute graph math ----------

  private val edgeGen: Gen[List[(Long, Long)]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, 7L), Gen.choose(0L, 7L))))
      .map(_.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }
        .distinct)
      .suchThat(_.nonEmpty)

  property("modularity + conductance == brute per-community replay") = {
    import spark.implicits._
    forAll(edgeGen) { edges =>
      val comm = (0L to 7L).map(n => (n, n % 3)).toMap
      val commDf = comm.toSeq.toDF("node", "community")
      val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val m = edges.size.toLong
      val gotQ = GraphAlgos.modularity(edges.toDF("src", "dst"), commDf)
        .select("community", "intra_edges", "degree_sum", "contribution")
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> r).toMap
      val gotPhi = GraphAlgos.conductance(edges.toDF("src", "dst"), commDf)
        .select("community", "cut_edges", "volume", "conductance")
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> r).toMap
      val present = deg.keys.map(comm).toSet
      present.forall { c =>
        val members = deg.keys.filter(comm(_) == c).toSet
        val dc = members.toSeq.map(deg).sum
        val ec = edges.count(e => members(e._1) && members(e._2)).toLong
        val cut = edges.count(e => members(e._1) ^ members(e._2)).toLong
        val q = ec.toDouble / m - (dc.toDouble / (2 * m)) * (dc.toDouble / (2 * m))
        val denom = math.min(dc, 2 * m - dc)
        val phi = if (denom == 0) 0.0 else cut.toDouble / denom
        val (_, gec, gdc, gq) = gotQ(c)
        val (_, gcut, gvol, gphi) = gotPhi(c)
        gec == ec && gdc == dc && math.abs(gq - q) < 1e-12 &&
          gcut == cut && gvol == dc && math.abs(gphi - phi) < 1e-12
      }
    }
  }

  property("assortativity == brute Pearson over edge-endpoint degrees") = {
    import spark.implicits._
    forAll(edgeGen) { edges =>
      val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val m = edges.size.toLong
      val sjk = edges.map(e => deg(e._1) * deg(e._2)).sum
      val sd = edges.map(e => deg(e._1) + deg(e._2)).sum
      val sd2 = edges.map(e => deg(e._1) * deg(e._1) + deg(e._2) * deg(e._2)).sum
      val mean = sd.toDouble / (2 * m)
      val num = sjk.toDouble / m - mean * mean
      val den = sd2.toDouble / (2 * m) - mean * mean
      val want = if (den == 0.0) 0.0 else num / den
      val got = GraphAlgos.assortativity(edges.toDF("src", "dst"))
        .select("assortativity").as[Double].head()
      math.abs(got - want) < 1e-12
    }
  }
}
