package graft.tools

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Sampling, TextAnalysis}

/**
 * Volume rehearsal of the full training-data pipeline chain
 * (dedup → quality filter → leakage-safe split → token budget) on a
 * generated ≥1M-doc corpus — the composite "does the whole pipeline
 * hold" record beside the per-operator scale curves (BASELINE.md
 * round-15). Per-stage walls are measured with a count() barrier per
 * stage (honest per-stage cost, pays some recompute), then the FUSED
 * single-plan run is timed separately — the shape a production job
 * actually executes (one pass, no stage barriers).
 *
 *   sbt "Test/runMain graft.tools.PipelineVolume [nDocs]"
 *
 * Run on a QUIET box (Probe protocol). ~1M docs ≈ 120 tokens each;
 * every 10th doc is an exact duplicate planted at doc_id+10M so the
 * dedup stage has a verifiable kill set.
 */
object PipelineVolume {

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = graft.TestSpark.spark
    spark.range(1000000).selectExpr("sum(id)").collect() // warm

    val syl = typedlit(("ba be bi bo bu da de di do du fa fe fi fo fu " +
      "ga ge gi go gu ka ke ki ko ku la le li lo lu " +
      "ma me mi mo mu na ne ni no nu").split(" ").toSeq)
    // per-token xxhash64(id, i) gives every token draw full (id, i)
    // entropy, so base docs are unique whp (any map that only mixes id
    // through one modulus collapses the corpus to that many distinct
    // texts — the ScalingHeavy kmv generator lesson); the
    // product-of-mods keeps a Zipf-ish token skew
    val base = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ",
        transform(sequence(lit(0), lit(119)), i => {
          val r = (pmod(xxhash64(col("id"), i), lit(1000)) *
            pmod(xxhash64(col("id"), i, lit(7)), lit(50)) / lit(49)).cast("int")
          concat(element_at(syl, pmod(r, lit(40)) + 1),
            element_at(syl, (r / 40).cast("int") + 1))
        })).as("text"))
    val corpus = base.unionByName(
      base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text")))
      .persist()
    val total = corpus.count()
    println(f"[volume] corpus: $total%d docs (${n}%d base + ${total - n}%d planted dups)")

    // stage 1: exact dedup survivors
    val (t1, kept) = time {
      val k = Dedup.exactDedupSurvivors(corpus, "doc_id", "text").persist()
      (k.count(), k)
    } match { case (t, (c, k)) => println(f"[volume] dedup     $t%7.1f s  survivors=$c%d"); (t, k) }

    // stage 2: quality filter
    val (t2, filtered) = time {
      val f = kept.withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .filter(col("quality") >= 0.45).persist()
      (f.count(), f)
    } match { case (t, (c, f)) => println(f"[volume] quality   $t%7.1f s  kept=$c%d"); (t, f) }

    // stage 3: split assignment (hash-bucket, exact integers)
    val bucket = Sampling.hashBucket(col("doc_id"), 100)
    val (t3, splitCounts) = time {
      filtered.withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
        .groupBy(col("split")).agg(count(lit(1)).as("n"))
        .orderBy(col("split")).collect()
    }
    println(f"[volume] split     $t3%7.1f s  " +
      splitCounts.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" "))

    // stage 4: token budget
    val (t4, toks) = time {
      filtered.select(sum(TextAnalysis.approxBpeTokenCount(col("text"))))
        .head().getLong(0)
    }
    println(f"[volume] budget    $t4%7.1f s  n_bpe_tokens=$toks%d")
    filtered.unpersist(); kept.unpersist()

    // fused single-plan run (the production shape: no stage barriers)
    val (tf, fused) = time {
      val k = Dedup.exactDedupSurvivors(corpus, "doc_id", "text")
      k.withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .filter(col("quality") >= 0.45)
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
        .withColumn("toks", TextAnalysis.approxBpeTokenCount(col("text")))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_bpe_tokens"))
        .orderBy(col("split")).collect()
    }
    println(f"[volume] FUSED     $tf%7.1f s  " + fused.map(r =>
      s"${r.getString(0)}=${r.getLong(1)}/${r.getLong(2)}tok").mkString(" "))
    corpus.unpersist()
    spark.stop()
  }
}
