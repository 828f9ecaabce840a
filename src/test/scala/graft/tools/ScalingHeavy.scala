package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scaling curves for the bench-TOP rows (verdict r11 item 6): the r11
 * 3-SF record evidenced linearity on overhead-dominated queries; this
 * tool generates corpora at 3 sizes (1x/3x/10x) for the five most
 * expensive bench families, so the linear claim is measured where the
 * DATA term dominates the row. Timings go to BASELINE.md §round-12.
 *
 *   sbt "Test/runMain graft.tools.ScalingHeavy"           # all families
 *   sbt "Test/runMain graft.tools.ScalingHeavy graph,cms" # subset
 *
 * Run on a QUIET box (same protocol as Probe anchors).
 */
object ScalingHeavy {

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  /** Deterministic Zipf-ish corpus of ALPHABETIC words (the text kernels
    * filter `[a-z]{3,}`, so digit-suffixed tokens would vanish): rank is
    * skewed by a product-of-mods, then rendered as two syllables. */
  private def docsAt(spark: SparkSession, nDocs: Long): DataFrame = {
    val syl = typedlit(("ba be bi bo bu da de di do du fa fe fi fo fu " +
      "ga ge gi go gu ka ke ki ko ku la le li lo lu " +
      "ma me mi mo mu na ne ni no nu").split(" ").toSeq)
    spark.range(nDocs).select(col("id"),
      concat_ws(" ",
        transform(sequence(lit(0), lit(119)), i => {
          val r = (pmod(col("id") * 131 + i * 7919, lit(1000)) *
            pmod(col("id") + i, lit(50)) / lit(49)).cast("int")
          concat(element_at(syl, pmod(r, lit(40)) + 1),
            element_at(syl, (r / 40).cast("int") + 1))
        })
      ).as("text"))
  }

  /** Power-law-ish digraph: |E| edges over ~|E|/20 vertices. */
  private def edgesAt(spark: SparkSession, nEdges: Long): DataFrame = {
    val v = math.max(100L, nEdges / 20)
    spark.range(nEdges).select(
      pmod(col("id") * 2654435761L, lit(v)).as("src"),
      // square-rank skew: low ids attract quadratically more in-edges
      pmod(pmod(col("id") * 40503L, lit(v)) * pmod(col("id") * 40503L, lit(v)) / lit(v), lit(v)).as("dst"))
      .filter(col("src") =!= col("dst"))
  }

  /** One substring-run dedup probe (shared by `substring` and `top10`):
    * HeavySubstringSpec's corpus shape so planted-pair recall is
    * checkable at every size. */
  private def substringProbe(spark: SparkSession, n: Long): Unit = {
    val nPairs = n / 400
    val words = expr(
      """concat_ws(' ', transform(sequence(1, 40),
        |  i -> concat('w', pmod(xxhash64(id, i), 4096))))""".stripMargin)
    val boiler = "THIS DOCUMENT IS PROVIDED AS-IS WITHOUT WARRANTY OF " +
      "ANY KIND EXPRESS OR IMPLIED BOILERPLATE."
    val passage = expr(
      s"""substring(repeat(concat('PLANTED-', pmod(id, $nPairs), '-'), 8),
         |1, 60)""".stripMargin)
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        words,
        when(pmod(col("id"), lit(3L)) === 0L, lit(boiler)).otherwise(lit("")),
        when(col("id") < nPairs * 2, passage).otherwise(lit(""))).as("text"))
      .persist()
    docs.count()
    val (t, agg) = time {
      val out = graft.pipeline.Dedup.substringRuns(
        docs, "doc_id", "text", gramLen = 30, maxDf = 50)
      out.agg(count(lit(1)),
        sum(when(col("max_shared_run") >= 60, 1L).otherwise(0L))).head()
    }
    println(f"[scale] substring docs=$n%8d  runs=$t%7.1f s  " +
      f"pairs=${agg.getLong(0)}%8d  planted>=${agg.getLong(1)}%6d/$nPairs")
    docs.unpersist()
    ()
  }

  /** The staged-batch watermarked-window drain that is
    * stream_cusum_changepoint / stream_late_drop's data term: n synthetic
    * events over ~n/1000 hours, 4 mtime-pinned parquet batches, hourly
    * windowed agg drained with AvailableNow into a memory sink. Times the
    * DRAIN only (staging is setup). */
  private def streamDrainProbe(spark: SparkSession, n: Long): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val ev = spark.range(n).select(
      col("id").as("event_id"),
      expr("timestamp_micros(id * 3600000000 div 1000)").as("ts"),
      concat(lit("t"), pmod(col("id") * 7L, lit(8L))).as("event_type"),
      (pmod(col("id") * 131L, lit(1000L)) / lit(10.0)).as("value"))
    val root = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_scale_stream_$n")
    if (root.exists()) org.apache.commons.io.FileUtils.deleteDirectory(root)
    val filesDir = new java.io.File(root, "in")
    java.nio.file.Files.createDirectories(filesDir.toPath)
    graft.operators.StreamStage.stageBatches(root, filesDir, (0 until 4).map(b =>
      ev.filter(col("event_id") >= n * b / 4 && col("event_id") < n * (b + 1) / 4)))
    val (t, rows) = time {
      val agg = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(filesDir.toString)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      val name = s"scale_stream_$n"
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val c = spark.table(name).count()
      spark.catalog.dropTempView(name)
      c
    }
    println(f"[scale] stream-drain events=$n%8d  $t%6.2f s ($rows windows)")
    org.apache.commons.io.FileUtils.deleteDirectory(root)
  }

  def main(args: Array[String]): Unit = {
    val families = if (args.isEmpty) Set("seal", "graph", "cms", "textrank")
      else args(0).split(",").toSet
    val spark = graft.TestSpark.spark
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect() // warm

    if (families("seal")) {
      // vec_heavy_seal_query's data term: ONE segment's Vamana build at
      // dim 768 (single task by design — cross-segment parallelism is the
      // scale axis, so per-segment n IS the data term) + 100-query search
      for (n <- Seq(12500, 37500, 125000)) {
        val data = spark.range(n.toLong)
          .map(id => (id, graft.index.ManifoldData.vectorFor(id)))
          .toDF("vec_id", "embedding")
        val tmp = java.nio.file.Files.createTempDirectory(s"graft-scale-seal$n").toString
        val store = new graft.index.IndexStore(tmp)
        store.createOrOpen(graft.core.IndexMeta(s"scale$n",
          dimension = graft.index.ManifoldData.Dim, maxSegmentSize = n,
          pqM = 16, pqK = 256, graphDegree = 64, graphBuildBreadth = 256,
          graphAlpha = 1.2, oversample = 4), 1000L)
        val idx = new graft.index.SegmentedIndex(spark, store)
        idx.addAll(data, "embedding", "vec_id")
        val (tSeal, _) = time { idx.sealPending() }
        val queries = spark.range(100L)
          .map(q => (q, graft.index.ManifoldData.queryFor(q))).toDF("queryId", "qv")
        val (tQ, cnt) = time {
          graft.index.Search.query(spark, store, queries, 10).count()
        }
        println(f"[scale] seal n=$n%7d  seal=$tSeal%8.1f s  query100=$tQ%6.2f s  rows=$cnt")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      }
    }

    if (families("graph")) {
      for (e <- Seq(100000L, 300000L, 1000000L)) {
        val edges = edgesAt(spark, e).persist()
        edges.count()
        val (tTri, nTri) = time {
          graft.pipeline.GraphAlgos.triangleCounts(
            edges.select(col("src").as("a"), col("dst").as("b"))).count()
        }
        val (tCore, nCore) = time {
          graft.pipeline.GraphAlgos.kCorePeel(edges, k = 10, rounds = 8).count()
        }
        println(f"[scale] graph |E|=$e%8d  triangles=$tTri%6.2f s ($nTri rows)  kcore=$tCore%6.2f s ($nCore rows)")
        edges.unpersist()
      }
    }

    if (families("centrality")) {
      // r14 kernels: Brandes fwd+bwd (stress) and integer Katz — the
      // per-round shape is edges⋈state + keyed agg, so the data term is
      // |E| per round; seeds fixed at 5 (the pivot-sampling regime)
      for (e <- Seq(1000000L, 3000000L, 10000000L)) {
        val edges = graft.pipeline.GraphAlgos.symmetrize(edgesAt(spark, e)).persist()
        edges.count()
        val seeds = edges.select(col("src")).limit(100).distinct()
          .orderBy(col("src")).limit(5)
          .collect().map(_.getLong(0)).toSeq
        val (tSt, nSt) = time {
          graft.pipeline.GraphAlgos.stressCentrality(edges, seeds, rounds = 3).count()
        }
        val (tKz, nKz) = time {
          graft.pipeline.GraphAlgos.katzCentrality(edges, rounds = 3, base = 8L).count()
        }
        println(f"[scale] centrality |E|=$e%9d  stress=$tSt%6.2f s ($nSt rows)  katz=$tKz%6.2f s ($nKz rows)")
        edges.unpersist()
      }
    }

    if (families("substring")) {
      // exact substring-run dedup's data term: posting-list volume is
      // ~270 grams/doc; planted pairs + capped boilerplate mirror the
      // HeavySubstringSpec corpus so recall is checkable at every size
      for (n <- Seq(100000L, 300000L, 1000000L)) substringProbe(spark, n)
    }

    if (families("kmv")) {
      // kmvIntersections' production (sketch-only) data term: the
      // per-key distinct + window top-k; the pair join touches k-sized
      // sketches regardless of set size. 200 keys, values Zipf-shared
      // so every pair overlaps. The exact_common calibration column is
      // OFF (the drop-at-scale path); its cost is the one quadratic
      // term and is reported once at the smallest size for contrast.
      for (n <- Seq(1000000L, 3000000L, 10000000L)) {
        val pairs = spark.range(n).select(
          pmod(col("id"), lit(200L)).as("key"),
          // value space ~n/40 with heavy sharing across keys; xxhash64
          // decorrelates value from key (a multiplicative map mod a
          // multiple of 200 would make v mod 200 a function of the key
          // and no two keys would ever share a value)
          pmod(expr("xxhash64(id)"), lit(math.max(1009L, n / 40))).as("v"))
          .persist()
        pairs.count()
        val (t, rows) = time {
          graft.pipeline.Sketches.kmvIntersections(
            pairs, "key", "v", k = 256, withExact = false).count()
        }
        val exactNote = if (n == 1000000L) {
          val (tx, _) = time {
            graft.pipeline.Sketches.kmvIntersections(
              pairs, "key", "v", k = 256, withExact = true).count()
          }
          f"  (withExact=$tx%6.2f s at this size only)"
        } else ""
        println(f"[scale] kmv rows=$n%9d  sketch=$t%6.2f s ($rows pairs)$exactNote")
        pairs.unpersist()
      }
    }

    if (families("walks")) {
      // hashWalks' data term: one edges⋈frontier equi-join + keyed
      // min_by per step; the frontier is seed-sized. Sweep |E| at
      // fixed 10k seeds, then seeds at fixed |E| (both axes flat-ish
      // per unit is the claim).
      for (e <- Seq(1000000L, 3000000L, 10000000L)) {
        val edges = edgesAt(spark, e).persist()
        edges.count()
        val seeds = (0L until 10000L).map(_ * 7L)
        val (t, rows) = time {
          graft.pipeline.GraphAlgos.hashWalks(edges, seeds, steps = 4).count()
        }
        println(f"[scale] walks |E|=$e%9d seeds=10000  $t%6.2f s ($rows rows)")
        edges.unpersist()
      }
      val edges = edgesAt(spark, 3000000L).persist()
      edges.count()
      for (s <- Seq(10000, 30000, 100000)) {
        // stride 1 keeps every seed inside the ~150k-node id range (a
        // 7-stride pushed the 30k/100k sweeps past the node universe
        // and silently capped the effective seed set)
        val seeds = (0L until s.toLong)
        val (t, rows) = time {
          graft.pipeline.GraphAlgos.hashWalks(edges, seeds, steps = 4).count()
        }
        println(f"[scale] walks |E|=3000000 seeds=$s%6d  $t%6.2f s ($rows rows)")
      }
      edges.unpersist()
    }

    if (families("markov")) {
      // rel_markov_transitions' kernel: per-user lead window + grouped
      // transition counts — one shuffle on user_id, one on the 2-key
      // cell. Data term = event rows.
      for (n <- Seq(1000000L, 3000000L, 10000000L)) {
        val ev = spark.range(n).select(
          pmod(col("id") * 40503L, lit(n / 100)).as("user_id"),
          col("id").as("ts"),
          pmod(col("id") * 7L, lit(8L)).as("event_type"))
          .persist()
        ev.count()
        val (t, rows) = time {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id")).orderBy(col("ts"))
          ev.withColumn("next_type", lead(col("event_type"), 1).over(w))
            .where(col("next_type").isNotNull)
            .groupBy(col("event_type"), col("next_type"))
            .agg(count(lit(1))).count()
        }
        println(f"[scale] markov rows=$n%9d  $t%6.2f s ($rows cells)")
        ev.unpersist()
      }
    }

    if (families("acf")) {
      // rel_acf_seasonality's kernel: per-series window index + two
      // lag self-joins + variance — data term = series length. 8
      // series, lags 1/24, exact integer covariances.
      for (n <- Seq(100000L, 300000L, 1000000L)) {
        val y0 = spark.range(n).select(
          pmod(col("id"), lit(8L)).as("series"),
          (col("id") / 8L).as("i"),
          (pmod(col("id") * 131L, lit(100L)) - 50L).as("y"))
          .persist()
        y0.count()
        val (t, rows) = time {
          val lagd = Seq(1L, 24L).map { l =>
            y0.as("a").join(y0.as("b"),
                col("a.series") === col("b.series") &&
                  col("b.i") === col("a.i") + l)
              .groupBy(col("a.series"))
              .agg(sum(col("a.y") * col("b.y")).as("cov_scaled"))
              .withColumn("lag", lit(l))
          }
          val v0 = y0.groupBy(col("series"))
            .agg(sum(col("y") * col("y")).as("var_scaled"))
          lagd.reduce(_ unionByName _).join(v0, Seq("series")).count()
        }
        println(f"[scale] acf rows=$n%8d  $t%6.2f s ($rows rows)")
        y0.unpersist()
      }
    }

    if (families("cms")) {
      for (n <- Seq(5000L, 15000L, 50000L)) {
        val docs = docsAt(spark, n).persist()
        docs.count()
        val (t, rows) = time {
          // the stream gate's data term: 4 batch partials + cell merge + finish
          val parts = (0 until 4).map(b =>
            docs.filter(pmod(col("id"), lit(4)) === b))
          val tok = parts.map(graft.pipeline.Sketches.cmsTokenPartials(_, "text"))
            .reduce(_ unionByName _)
          val cells = parts.map(p => graft.pipeline.Sketches.cmsCellPartials(
            graft.pipeline.Sketches.cmsTokenPartials(p, "text")))
            .reduce(_ unionByName _)
          graft.pipeline.Sketches.cmsFinish(tok, cells).count()
        }
        println(f"[scale] cms docs=$n%6d  4-batch partials+merge=$t%6.2f s ($rows rows)")
        docs.unpersist()
      }
    }

    if (families("textrank")) {
      for (n <- Seq(5000L, 15000L, 50000L)) {
        val docs = docsAt(spark, n).persist()
        docs.count()
        val (t, rows) = time {
          graft.pipeline.TextAnalysis.textRankKeywords(docs, "text").count()
        }
        println(f"[scale] textrank docs=$n%6d  $t%6.2f s ($rows rows)")
        docs.unpersist()
      }
    }

    if (families("analytics")) {
      // r14 product-analytics wave (verdict r14 item 6): volume evidence
      // for funnel paths, RFM, square motifs, edge support, eccentricity.
      // Each replays its GATE's plan shape on synthetic corpora whose
      // data term is the one the gate's scaladoc claims dominates.

      // funnel + RFM: events/orders 1M -> 10M
      for (n <- Seq(1000000L, 3000000L, 10000000L)) {
        val users = n / 20
        val ev = spark.range(n).select(
          pmod(col("id") * 2654435761L, lit(users)).as("user_id"),
          col("id").as("event_id"),
          element_at(typedlit(Seq("view", "click", "cart", "purchase", "refund")),
            pmod(col("id") * 40503L, lit(5)).cast("int") + 1).as("event_type"),
          timestamp_seconds(pmod(col("id") * 7919L, lit(86400L * 365))).as("ts"))
          .persist()
        ev.count()
        val (tF, nF) = time {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          ev.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
            .groupBy(col("user_id"))
            .agg(expr("array_join(transform(sort_array(collect_list(" +
              "struct(rn, event_type))), s -> s.event_type), '>')").as("path"))
            .groupBy(col("path"))
            .agg(count(lit(1)).cast("long").as("n_users"))
            .orderBy(col("n_users").desc, col("path")).limit(20).count()
        }
        // RFM over the same scale: per-customer aggregate (the window
        // subject is customers = rows/20, never the fact table)
        val (tR, nR) = time {
          val w = org.apache.spark.sql.expressions.Window
          val rfm = ev.groupBy(col("user_id"))
            .agg(max(col("ts")).cast("long").as("last_ts"),
              count(lit(1)).cast("long").as("n_ev"),
              sum(col("event_id") % 1000).cast("long").as("m"))
          rfm.withColumn("r_q", ntile(4).over(
              w.orderBy(col("last_ts"), col("user_id"))).cast("long"))
            .withColumn("f_q", ntile(4).over(
              w.orderBy(col("n_ev"), col("user_id"))).cast("long"))
            .withColumn("m_q", ntile(4).over(
              w.orderBy(col("m"), col("user_id"))).cast("long"))
            .groupBy((col("r_q") * 100 + col("f_q") * 10 + col("m_q")).as("seg"))
            .agg(count(lit(1)).cast("long").as("n"), sum(col("m")).as("mass"))
            .count()
        }
        println(f"[scale] funnel events=$n%9d  paths=$tF%6.2f s ($nF rows)  rfm=$tR%6.2f s ($nR rows)")
        ev.unpersist()
      }

      // motifs + edge support: bounded-degree graph, |E| 1M -> 10M
      // (adjacency joins fan out by degree, so the synthetic graph pins
      // degree ~40 like the gate's decile co-purchase projection)
      for (e <- Seq(1000000L, 3000000L, 10000000L)) {
        val v = e / 20
        val edges = spark.range(e).select(
            pmod(col("id"), lit(v)).as("a"),
            pmod(col("id") + 1 + pmod(col("id") * 40503L, lit(37)), lit(v)).as("b"))
          .filter(col("a") =!= col("b"))
          .select(least(col("a"), col("b")).as("a"),
            greatest(col("a"), col("b")).as("b"))
          .distinct().persist()
        val ne = edges.count()
        // both rows ride the SHARED wedge-class operators the gates call
        // since r16 (cappedWedgePairs / cappedSupport) — the curve
        // measures the production code path, not a replica of it
        val eSd = edges.select(col("a").as("src"), col("b").as("dst"))
        val (tM, nM) = time {
          graft.pipeline.GraphAlgos.cappedWedgePairs(eSd, minCommon = 2L)
            .orderBy(col("c").desc, col("u"), col("w")).limit(20).count()
        }
        val (tS, nS) = time {
          graft.pipeline.GraphAlgos.cappedSupport(eSd)
            .groupBy(least(col("support"), lit(10L)).as("bk"))
            .agg(count(lit(1))).count()
        }
        val (tE, nE) = time {
          graft.pipeline.GraphAlgos.shortestPathCounts(
              graft.pipeline.GraphAlgos.symmetrize(
                edges.select(col("a").as("src"), col("b").as("dst"))),
              sources = Seq(0L, 2L, 4L, 6L, 8L, 10L, 12L, 14L), rounds = 4)
            .groupBy(col("seed"))
            .agg(max(col("dist")), count(lit(1))).count()
        }
        println(f"[scale] motifs |E|=$ne%9d  squares=$tM%6.2f s ($nM)  support=$tS%6.2f s ($nS)  ecc=$tE%6.2f s ($nE)")
        edges.unpersist()
      }

      // clipping census: loud WAV corpus 1x -> 10x (2k/6k/20k docs)
      // (see also the `truss` family below for the r15-wave peel curve)
      for (n <- Seq(2000L, 6000L, 20000L)) {
        val docs = spark.range(n).select(col("id").as("doc_id")).persist()
        docs.count()
        val (t, rows) = time {
          graft.pipeline.Audio.clippingStats(
            graft.pipeline.Audio.withLoudWavAudio(spark, docs.toDF(), "doc_id"))
            .toDF().count()
        }
        println(f"[scale] clipping docs=$n%6d  $t%6.2f s ($rows rows)")
        docs.unpersist()
      }
    }

    if (families("truss")) {
      // graph_k_truss's data term (verdict r15 item 2): TWO support
      // passes over a shrinking survivor set — wedge-volume work, the
      // motif-square class. Measured 1M -> 10M edges on the same
      // bounded-degree (~40) generator as the motifs block, uncapped
      // AND with the degreeCap production knob so the knob's effect is
      // a number, not a narrative. Support rides the intersection form
      // (sorted adjacency + merge walk), so out-degree is O(√m)-bounded
      // by orientation even before the cap.
      for (e <- Seq(1000000L, 3000000L, 10000000L)) {
        val v = e / 20
        val edges = spark.range(e).select(
            pmod(col("id"), lit(v)).as("a"),
            pmod(col("id") + 1 + pmod(col("id") * 40503L, lit(37)), lit(v)).as("b"))
          .filter(col("a") =!= col("b"))
          .select(least(col("a"), col("b")).as("src"),
            greatest(col("a"), col("b")).as("dst"))
          .distinct().persist()
        val ne = edges.count()
        val (tT, nT) = time {
          graft.pipeline.GraphAlgos.kTrussPeel(edges, k = 4, rounds = 2).count()
        }
        val (tC, nC) = time {
          graft.pipeline.GraphAlgos.kTrussPeel(edges, k = 4, rounds = 2,
            degreeCap = 60).count()
        }
        println(f"[scale] truss |E|=$ne%9d  4-truss=$tT%7.2f s ($nT edges)  " +
          f"cap60=$tC%7.2f s ($nC edges)")
        edges.unpersist()
      }
    }

    if (families("top10")) {
      // Verdict r15 item 7/6: the PER-ROUND sf-step-up probe — every
      // bench-TOP-10 row's data kernel at gate-equivalent volume and at
      // 10x, one rep each, so scale regressions surface before a 100x
      // deploy would find them. Rows covered fresh here: graph_triangles,
      // graph_kcore, graph_pagerank, graph_stress_paths,
      // graph_betweenness (one shared edge build per size),
      // dedup_substring_runs/survivors (posting-list kernel), and
      // stream_cusum_changepoint / stream_late_drop (staged-batch
      // watermarked drain). vec_heavy_seal_query is NOT re-run: its
      // single-segment Vamana curve (r11, 10x n -> 24x wall, capped by
      // maxSegmentSize + cross-segment parallelism) stands while the
      // seal path is byte-identical; re-measure it via the `seal` family
      // whenever index/ code changes.
      for (e <- Seq(1000000L, 10000000L)) {
        val edges = graft.pipeline.GraphAlgos.symmetrize(edgesAt(spark, e)).persist()
        edges.count()
        val seeds = edges.select(col("src")).limit(100).distinct()
          .orderBy(col("src")).limit(5)
          .collect().map(_.getLong(0)).toSeq
        val (tTri, _) = time {
          graft.pipeline.GraphAlgos.triangleCounts(
            edges.select(col("src").as("a"), col("dst").as("b"))).count()
        }
        val (tCore, _) = time {
          graft.pipeline.GraphAlgos.kCorePeel(edges, k = 10, rounds = 8).count()
        }
        val (tPr, _) = time {
          graft.pipeline.GraphAlgos.pageRankFixedPoint(edges, iterations = 3).count()
        }
        val (tSt, _) = time {
          graft.pipeline.GraphAlgos.stressCentrality(edges, seeds, rounds = 3).count()
        }
        val (tBw, _) = time {
          graft.pipeline.GraphAlgos.betweennessCentrality(edges, seeds, rounds = 3).count()
        }
        println(f"[scale] top10-graph |E|=$e%9d  tri=$tTri%6.2f  kcore=$tCore%6.2f  " +
          f"pr3=$tPr%6.2f  stress=$tSt%6.2f  betw=$tBw%6.2f s")
        edges.unpersist()
      }
      for (n <- Seq(100000L, 1000000L)) substringProbe(spark, n)
      for (n <- Seq(100000L, 1000000L)) streamDrainProbe(spark, n)
    }
  }
}
