package graft.index

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Distances, IndexMeta}

/**
 * Partitioned (sharded) Vamana segment build — the documented
 * beyond-budget path (`IndexMeta` rationale, PAPERS.md sharded-DiskANN
 * literature): when one segment's in-memory graph build would exceed the
 * 2 GB per-task seal budget, the graph is built as overlapping shards and
 * merged, so NO task ever holds the whole segment.
 *
 * The recipe is the DiskANN sharded build (Subramanya et al., NeurIPS'19
 * §4 "building an SSD-friendly index via partitions"; PAPERS.md):
 *
 *  1. k-means cluster a byte-capped sample into S shard centers
 *     (driver-side, the same bounded-collect contract as `Ann`'s PQ
 *     trainers; S sized so an overlap-factor shard fits the task budget);
 *  2. assign every vector to its `Overlap` = 2 closest centers —
 *     overlapping membership is what stitches the final graph: any two
 *     near points co-occur in at least one shard with high probability,
 *     so the union graph needs no separate cross-shard pass;
 *  3. build a Vamana graph per shard in ONE task each
 *     (`flatMapGroups` keyed by shard — cross-shard parallelism is
 *     Spark's, exactly like the per-segment classic seal);
 *  4. merge: per node, union its per-shard adjacency lists and keep the
 *     `graphDegree` closest by true distance (the paper's degree-capped
 *     edge union).
 *
 * PQ training moves to the same sample (driver Lloyd's via `Pq.train`,
 * broadcast codebook, distributed encode) — the classic per-segment-task
 * trainer would hold the over-budget segment too.
 *
 * The query path is UNCHANGED: per-segment artifacts have the same
 * schema, the searcher's seed set is the full ADC scan (no medoid
 * dependency), and search-side per-row state (pqM code bytes + degree
 * ints) is ~50× smaller than build-side, so an over-budget *build*
 * segment is still comfortably a single search task.
 *
 * Reference scope: the reference's fixed 100k segments never need this
 * (VectorIndexConfig.java:391); this mode lifts the one workload shape
 * (huge single segment) the budget check otherwise rejects.
 */
object PartitionedBuild {

  /** Overlap factor ℓ: each vector joins its ℓ closest shards
    * (DiskANN sharded build uses ℓ = 2). */
  val Overlap = 2

  /** Per-shard-task memory budget; `private[index] var` so specs can
    * shrink it to force multi-shard builds on small fixtures. */
  private[index] var shardBudgetBytes: Long = IndexMeta.SegmentBuildBudgetBytes

  /** Driver-side training-sample byte cap (embeddings only) — the same
    * bounded-collect contract as `Ann`'s samplers. */
  private[index] var sampleBudgetBytes: Long = 256L << 20

  /** Build codes + graph + codebook artifacts for `segIds` of a
    * PARTITIONED-mode index; returns the segIds that had rows (the
    * caller writes zero-codebooks for the rest, same as the classic
    * path's empty-segment parity rule).
    *
    * Segments are processed SEQUENTIALLY by design: each segment's
    * writes are dynamic-partition overwrites into the shared artifact
    * tables, and concurrent overwrite commits to one table path race in
    * the commit protocol (staging collisions) — while each segment's
    * own build is fully distributed (encode, `Overlap`·S shard tasks,
    * merge). A genuinely over-budget segment has S sized to the task
    * budget, i.e. many shards, so one segment alone fills the pool; a
    * many-small-segments index wanting cross-segment parallelism is the
    * classic mode's shape (one task per segment, all parallel), not
    * this one's. */
  def buildSegments(
      spark: SparkSession,
      store: IndexStore,
      segIds: Seq[Int],
      meta: IndexMeta): Set[Int] = {
    import spark.implicits._
    val built = scala.collection.mutable.Set.empty[Int]
    segIds.foreach { sid =>
      val seg = store.readVectors(spark).filter(col("segId") === sid)
        .as[graft.core.VectorRecord]
      val count = seg.count()
      if (count > 0L) {
        built += sid

        // --- driver-side training on a deterministic byte-capped sample
        val rowBytes = 4L * meta.dimension + 4L * meta.graphDegree + meta.pqM + 64L
        val sampleCap = math.max(1L, sampleBudgetBytes / (4L * meta.dimension))
        val step = math.max(1L, (count + sampleCap - 1) / sampleCap)
        // Dense-vecId contract: per-segment vecIds are 0..count-1
        // (SegmentedIndex assigns pos % cap), so `vecId % step == 0`
        // yields ~count/step rows — the byte cap. Sparse/global ids
        // would silently break the sample size; assert the density.
        val sample = seg.filter(r => r.vecId % step == 0)
          .map(_.embedding).collect().toIndexedSeq
        require(sample.size <= sampleCap + 1,
          s"dense-vecId sampling contract violated: ${sample.size} rows " +
            s"sampled for cap $sampleCap (segment $sid, step $step) — " +
            "per-segment vecIds must be dense from 0")
        val cb = Pq.train(sample, meta.dimension, meta.pqM, meta.pqK)
        // shard count: overlap-inflated segment must fit task budget;
        // floor 2 — PARTITIONED means partitioned, so even a small
        // segment exercises the sharded path it opted into
        val byBudget = ((Overlap * count * rowBytes + shardBudgetBytes - 1) /
          shardBudgetBytes).toInt
        val s = math.max(if (count >= 2L * Overlap) 2 else 1,
          math.min(byBudget, math.max(1, (count / 2).toInt)))
        // full-dim k-means IS Pq.train at m=1 (same seed, iterations,
        // empty-cluster reseed — one Lloyd's implementation, not two)
        val centers = Pq.train(sample, meta.dimension, 1, s).centroids
        val cbB = spark.sparkContext.broadcast(cb)
        val centersB = spark.sparkContext.broadcast(centers)
        val dim = meta.dimension

        // --- distributed encode (broadcast codebook)
        store.writeCodes(seg.mapPartitions { it =>
          val c = cbB.value
          it.map(r => CodeRow(sid, r.vecId, Pq.encode(c, r.embedding)))
        })

        // --- overlap-ℓ shard assignment → per-shard Vamana, one task per
        // shard; emits one (vecId, neighbors, dists) row per node per
        // shard so the merge sees every node (isolated ones included)
        val degree = meta.graphDegree
        val lBuild = meta.graphBuildBreadth
        val alpha = meta.graphAlpha
        val shardRows = seg.flatMap { r =>
          val cs = centersB.value
          val nC = cs.length / dim
          // ℓ smallest center distances, center-index tie-break
          val d = new Array[Double](nC)
          var c = 0
          while (c < nC) {
            d(c) = Distances.l2SquaredRange(r.embedding, 0, cs, c * dim, dim)
            c += 1
          }
          val picks = Array.range(0, nC)
            .sortBy(i => (d(i), i)).take(math.min(Overlap, nC))
          picks.iterator.map(shard => (shard, r))
        }
          .groupByKey(_._1)
          .flatMapGroups { (_, it) =>
            val recs = it.map(_._2).toArray.sortBy(_.vecId)
            val vecs = recs.map(_.embedding)
            val graph =
              if (alpha <= 1.0) GraphBuilder.buildL2Neighbors(vecs, degree)
              else GraphBuilder.buildVamanaGraph(vecs, degree, lBuild, alpha)
            recs.iterator.zipWithIndex.map { case (r, i) =>
              val nbrs = graph(i).map(p => recs(p).vecId)
              val dists = graph(i).map(p =>
                Distances.l2Squared(r.embedding, vecs(p)))
              (r.vecId, nbrs, dists)
            }
          }

        // --- degree-capped edge union (closest-by-true-distance wins)
        store.writeGraph(shardRows
          .groupByKey(_._1)
          .mapGroups { (vid, it) =>
            val merged = scala.collection.mutable.HashMap.empty[Int, Double]
            it.foreach { case (_, nbrs, dists) =>
              var i = 0
              while (i < nbrs.length) {
                val nb = nbrs(i)
                val d = dists(i)
                if (merged.getOrElse(nb, Double.MaxValue) > d) merged(nb) = d
                i += 1
              }
            }
            val kept = merged.toArray.sortBy { case (nb, d) => (d, nb) }
              .take(degree).map(_._1)
            GraphRow(sid, vid, kept)
          })

        store.writeCodebooks(Seq(
          CodebookRow(sid, cb.m, cb.k, cb.subDim, cb.centroids)).toDS())
        cbB.destroy()
        centersB.destroy()
      }
    }
    built.toSet
  }
}
