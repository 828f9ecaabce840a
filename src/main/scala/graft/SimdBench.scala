package graft

import org.apache.spark.sql.SparkSession

import graft.index.ManifoldData

/**
 * Continuously-priced SIMD kernel row (`vec_simd_l2_topk`).
 *
 * The Panama kernels (graft.simd.SimdKernels — the Spark analog of the
 * reference's default SIMD distance path, Distances.java:48-64) are
 * OPT-IN for engine queries (`-Dgraft.simd=1`) because float-lane
 * accumulation is recall-equivalent but not bit-identical to the scalar
 * double path the correctness oracles hash. That made them invisible to
 * the per-round driver bench. This row prices them EVERY round by
 * calling the kernels directly (the incubator module is always on the
 * forked JVM's module path; `Distances.simdEnabled` stays untouched):
 * one brute-force top-k pass over a generated dim-768 corpus with the
 * SIMD kernel, one with the scalar double loop, recall-gated against
 * each other — a kernel regression (or a silently vanished module)
 * surfaces as a timing spike or a visible error, never as a wrong hash.
 *
 * The reported row time is the SIMD pass only; the scalar pass time and
 * speedup go to stderr for the round log.
 */
object SimdBench {
  val N = 50000L // corpus vectors (dim 768 → ~150 MB of floats)
  val Q = 1024 // queries
  val K = 10

  private def scalarL2(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      val d = a(i).toDouble - b(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  /** One distributed brute-force top-K pass; useSimd picks the kernel. */
  private def topkPass(
      spark: SparkSession,
      corpus: org.apache.spark.rdd.RDD[(Long, Array[Float])],
      queries: Array[(Long, Array[Float])],
      useSimd: Boolean): Array[(Long, Array[Long])] = {
    val qB = spark.sparkContext.broadcast(queries)
    corpus.mapPartitions { it =>
      val qs = qB.value
      // per-query bounded max-heaps of (d2, vecId); kernel call is the
      // ONLY difference between the two passes
      val heaps = Array.fill(qs.length)(
        new java.util.PriorityQueue[(Double, Long)](K + 1,
          (x: (Double, Long), y: (Double, Long)) => {
            val c = java.lang.Double.compare(y._1, x._1) // max-heap on d2
            if (c != 0) c else java.lang.Long.compare(y._2, x._2)
          }))
      it.foreach { case (vecId, v) =>
        var qi = 0
        while (qi < qs.length) {
          val d2 =
            if (useSimd) graft.simd.SimdKernels.l2Squared(qs(qi)._2, v)
            else scalarL2(qs(qi)._2, v)
          val h = heaps(qi)
          if (h.size < K) h.add((d2, vecId))
          else if (d2 < h.peek()._1 ||
            (d2 == h.peek()._1 && vecId < h.peek()._2)) {
            h.poll(); h.add((d2, vecId))
          }
          qi += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        val qid = qs(qi)._1
        val it2 = h.iterator()
        Iterator.continually(if (it2.hasNext) Some(it2.next()) else None)
          .takeWhile(_.isDefined).map(e => (qid, e.get._1, e.get._2))
      }
    }
      // global merge: partial top-Ks are tiny (parts × Q × K rows)
      .groupBy(_._1)
      .mapValues(rows =>
        rows.toArray.sortBy(r => (r._2, r._3)).take(K).map(_._3))
      .collect()
      .sortBy(_._1)
  }

  /** The timed slice for the bench row: SIMD pass seconds (corpus build
    * and the scalar cross-check are priced outside the row — see Bench).
    * Throws if SIMD/scalar top-Ks diverge past the recall gate. */
  def timedRun(spark: SparkSession): (Double, Long) = {
    import spark.implicits._
    val corpus = spark.range(N)
      .map(id => (id.toLong, ManifoldData.vectorFor(id)))
      .rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    corpus.count() // materialize OUTSIDE both timed passes
    val queries = (0 until Q).map(q => (q.toLong, ManifoldData.queryFor(q.toLong))).toArray
    val t0 = System.nanoTime()
    val scalar = topkPass(spark, corpus, queries, useSimd = false)
    val tScalar = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val simd = topkPass(spark, corpus, queries, useSimd = true)
    val tSimd = (System.nanoTime() - t1) / 1e9
    corpus.unpersist(blocking = false)
    // recall gate (not hash: float-lane accumulation may legally flip
    // near-tie neighbors): mean overlap of the two top-K sets >= 0.99
    require(scalar.length == Q && simd.length == Q,
      s"top-k pass lost queries: scalar ${scalar.length}, simd ${simd.length}")
    val recall = scalar.zip(simd).map { case ((qa, a), (qb, b)) =>
      require(qa == qb, s"query order diverged: $qa vs $qb")
      a.toSet.intersect(b.toSet).size.toDouble / K
    }.sum / Q
    require(recall >= 0.99,
      f"SIMD vs scalar top-$K recall collapsed to $recall%.4f — kernel broken")
    System.err.println(
      f"[bench] vec_simd_l2_topk: scalar $tScalar%.2f s, simd $tSimd%.2f s " +
        f"(${tScalar / tSimd}%.1fx), recall $recall%.4f")
    (tSimd, Q.toLong)
  }
}
