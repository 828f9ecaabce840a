package graft.index

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core._
import graft.functions.vector

/** Unified per-segment payload row for the sealed search cogroup: each row
  * is either a PQ code (`code != null`) or an adjacency list
  * (`neighbors != null`). Unioning codes+graph into one keyed stream lets a
  * single binary cogroup against the codebooks table deliver everything a
  * segment task needs — the codebooks never pass through the driver. */
final case class SegPayloadRow(
    segId: Int, vecId: Int, code: Array[Byte], neighbors: Array[Int])

/** One replicated query row for the distributed-queries sealed search:
  * the query (queryId, qv) keyed to (segId, bucket) so it shuffles into
  * the segment task that owns its bucket. */
final case class QueryRep(segId: Int, bucket: Int, queryId: Long, qv: Array[Float])

/** Left-side row of the distributed-queries cogroup: either a segment
  * payload row (`centroids == null`) or that segment's codebook row
  * (`centroids != null`), replicated per query bucket. */
final case class SealedSideRow(
    segId: Int, bucket: Int, vecId: Int, code: Array[Byte],
    neighbors: Array[Int], pqM: Int, pqK: Int, subDim: Int,
    centroids: Array[Float])

/**
 * Distributed KNN query (SURVEY.md §3.1): the Spark re-expression of the
 * reference's per-segment fan-out (FdbVectorIndex.query, :351-467).
 *
 * Plan shape (one job, three stages):
 *  1. driver: read manifest, collect + broadcast the query batch (small);
 *  2. SEALED/COMPACTING segments: cogroup(codebooks, codes ∪ graph) by
 *     segId — one task per segment loads its own codebook (T5/T6 cache →
 *     per-segment cogroup load; the driver never holds codebooks) and runs
 *     ADC + best-first expansion for every query (J2/J3), emitting approx
 *     candidates only (16 B/vector codes are scanned, never raw
 *     embeddings — the PQ bandwidth win at 100 TB);
 *     ACTIVE/PENDING segments: brute-force scan (J1) via broadcast-join +
 *     codegen'd distance, no candidate stage;
 *  3. exact rerank of sealed candidates (J5): semi-join back to the
 *     vectors table (partition-pruned on segId), codegen'd exact distance,
 *     then per-segment cap and global top-k merge (J7/J8) with window
 *     functions; `gid` is the deterministic tie-break.
 *
 * WRITING segments are invisible (F2); deleted rows are dropped at rerank
 * (F1); scores follow the reference conventions exactly (L2: -distance;
 * COSINE: similarity, distance = 1 - similarity).
 */
object Search {

  /** observe() metric names must be unique within one Spark plan —
    * suffix them per invocation so two Search.query results can be
    * combined (union across indexes, different k) in a single action. */
  private val observeId = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Per-process reuse of sealed-search inputs across query calls — the
    * Spark analog of the reference's TTL'd segment caches
    * (SegmentCaches.java:37-129), with the block manager playing
    * Caffeine. Caches ONLY the compressed representations built to be
    * cached — PQ codes, adjacency, codebooks — never raw vectors (the
    * reference caches exactly the same two tables). Keyed by the
    * manifest content hash: every mutation commits a new manifest, so a
    * changed index invalidates on the next call and the stale persisted
    * blocks are released. Entries keep full lineage (persist, not
    * checkpoint), so memory-pressure eviction degrades to a re-scan,
    * never an error. */
  /** Manifest-state partitions of the query fan-out (F2 dispatch):
    * sealed+compacting ride the PQ/graph path, active+pending ride the
    * brute scan, WRITING is invisible (in neither set). */
  private val SealedStates: Set[String] =
    Set(SegmentState.Sealed, SegmentState.Compacting)
  private val BruteStates: Set[String] =
    Set(SegmentState.Active, SegmentState.Pending)

  // plain class, not a case class: entries are compared by identity
  // only, and the synthetic equals/copy of a case class is dead weight
  private[index] final class CachedInputs(
      val version: String,
      val payload: org.apache.spark.sql.Dataset[SegPayloadRow],
      val codebooks: org.apache.spark.sql.Dataset[CodebookRow]) {
    /** Updated on every hit — the expireAfterAccess clock. */
    var lastAccess: Long = 0L
  }
  /** Access-ordered (hits re-insert at the tail) so overflow evicts the
    * least-recently-used store — bounds a long-lived service querying
    * many ephemeral indexes. */
  private val inputCache = mutable.LinkedHashMap.empty[String, CachedInputs]
  /** Size bound on cached stores (reference parity: SegmentCaches.java:
    * 39-45 maximumSize). Var so CacheExpirySpec can drive the LRU
    * overflow arm with three tiny stores instead of 65. */
  private[index] var maxCachedStores: Int = 64
  /** Reference parity: SegmentCaches.java:39-45 evicts by
    * expireAfterAccess(10 min) as well as by size — without it a
    * long-lived service on one busy index pins codes+graph in the block
    * manager indefinitely. Swept on every cache access. */
  private[index] var ttlNanos: Long = 10L * 60 * 1000 * 1000 * 1000
  /** Superseded / size-evicted entries are NOT unpersisted at replacement
    * time: a concurrent query planned against the old manifest may still
    * be mid-flight, and its recompute-from-lineage could hit segment
    * files the very mutation that superseded the entry (vacuum,
    * compaction) has already deleted. They park on a grace list and are
    * released one grace period later, by which time any in-flight action
    * has finished or failed for its own reasons. */
  private[index] var graceNanos: Long = 60L * 1000 * 1000 * 1000
  private val graceList = mutable.ArrayBuffer.empty[(Long, String, CachedInputs)]
  /** Injectable for TTL tests; production uses the monotonic clock. */
  private[index] var clock: () => Long = () => System.nanoTime()

  /** Sealed-path query batches are broadcast and searched in chunks of
    * this size (one cogroup per chunk, unioned): per-segment task time
    * and broadcast size stay flat as the batch grows, and chunks
    * parallelize across the executor pool. Var for tests. */
  private[index] var queryChunkSize: Int = 1024

  /** Above this many chunks the per-chunk cogroup plans are fused into a
    * single LogicalRDD leaf via RDD-level union instead of a Catalyst
    * Union of N analyzed cogroup subtrees — a 100k-query batch (100
    * chunks) must not build a 100-subtree plan on the driver. Var for
    * tests. */
  private[index] var chunkUnionPlanThreshold: Int = 32

  /** Whether the last sealed-path query fused its chunk union into a
    * single LogicalRDD leaf (observability for tests). */
  @volatile private[index] var lastChunkPlanFused: Boolean = false

  private def release(e: CachedInputs): Unit =
    // an entry from a stopped context has nothing to release — its blocks
    // died with the context, and unpersist would throw
    if (!e.payload.sparkSession.sparkContext.isStopped) {
      e.payload.unpersist(blocking = false)
      e.codebooks.unpersist(blocking = false)
    }

  /** Park a no-longer-current entry for deferred release (see graceNanos). */
  private def parkSuperseded(path: String, e: CachedInputs, now: Long): Unit =
    graceList += ((now + graceNanos, path, e))

  /** Evict cache entries idle past the TTL and release grace-listed
    * entries past their deadline. TTL-expired entries are PARKED, not
    * released: a query planned >ttlNanos ago against a since-vacuumed
    * manifest can still be in flight, and an immediate unpersist would
    * let a memory-evicted block recompute from lineage into deleted
    * segment files. Parking precedes the drain so a zero grace period
    * still releases within the same sweep. Called under the cache lock. */
  private def sweep(now: Long): Unit = {
    val expired = inputCache.iterator
      .filter(kv => now - kv._2.lastAccess > ttlNanos).map(_._1).toList
    expired.foreach { p => inputCache.remove(p).foreach(parkSuperseded(p, _, now)) }
    val due = graceList.filter(_._1 <= now)
    if (due.nonEmpty) {
      due.foreach(t => release(t._3))
      graceList.filterInPlace(_._1 > now)
    }
  }

  /** Cheap idle-path drain: release overdue grace-listed entries and
    * TTL-expired cache entries without needing a sealed-segment query.
    * `sweep` otherwise runs only inside `sealedInputs`, so on an index
    * with no sealed segments parked blocks would stay pinned until JVM
    * exit. Called at every `query()` entry. */
  private[index] def drainExpired(): Unit = inputCache.synchronized {
    if (graceList.nonEmpty || inputCache.nonEmpty) sweep(clock())
  }

  /** Drop and release the cached entry for `storePath`, bypassing the
    * grace list. Call BEFORE deleting the store's files: once the files
    * are gone a lingering persisted entry is a trap — any block evicted
    * under memory pressure would recompute from lineage into the deleted
    * tree. Only correct when the caller owns the store exclusively (e.g.
    * a temp index being rebuilt on data-fingerprint change). */
  def invalidate(storePath: String): Unit = inputCache.synchronized {
    inputCache.remove(storePath).foreach(release)
    var i = 0
    while (i < graceList.length) {
      if (graceList(i)._2 == storePath) {
        release(graceList(i)._3)
        graceList.remove(i)
        ()
      } else i += 1
    }
  }

  /** Test hooks: entry count and grace-list depth under the lock. */
  private[index] def cacheStats: (Int, Int) =
    inputCache.synchronized((inputCache.size, graceList.size))
  private[index] def cachedPaths: Set[String] =
    inputCache.synchronized(inputCache.keySet.toSet)
  private[index] def graceSnapshot: List[(Long, String, CachedInputs)] =
    inputCache.synchronized(graceList.toList)

  private def sealedInputs(
      spark: SparkSession,
      store: IndexStore,
      sealedSegs: Seq[Int],
      version: String): (org.apache.spark.sql.Dataset[SegPayloadRow],
        org.apache.spark.sql.Dataset[CodebookRow]) = inputCache.synchronized {
    import org.apache.spark.storage.StorageLevel
    import spark.implicits._
    val now = clock()
    sweep(now)
    // `version` is the hash of the SAME manifest bytes the caller planned
    // against — never re-read here, or a concurrent seal between the two
    // reads would cache a payload filtered by the old segment set under
    // the new version (serving it, minus the new segment, forever after).
    inputCache.get(store.path) match {
      case Some(e) if e.version == version &&
          (e.payload.sparkSession.sparkContext eq spark.sparkContext) &&
          !spark.sparkContext.isStopped =>
        e.lastAccess = now
        // re-insert at the tail: LinkedHashMap iterates in insertion
        // order, so overflow eviction below sees true LRU order
        inputCache.remove(store.path)
        inputCache.put(store.path, e)
        (e.payload, e.codebooks)
      case stale =>
        stale.foreach { e =>
          inputCache.remove(store.path)
          parkSuperseded(store.path, e, now)
        }
        val cb = store.readCodebooks(spark)
          .filter(col("segId").isin(sealedSegs: _*)).as[CodebookRow]
          .persist(StorageLevel.MEMORY_AND_DISK)
        val payload = store.readCodes(spark)
          .filter(col("segId").isin(sealedSegs: _*)).as[CodeRow]
          .map(c => SegPayloadRow(c.segId, c.vecId, c.code, null))
          .unionByName(store.readGraph(spark)
            .filter(col("segId").isin(sealedSegs: _*)).as[GraphRow]
            .map(g => SegPayloadRow(g.segId, g.vecId, null, g.neighbors)))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val entry = new CachedInputs(version, payload, cb)
        entry.lastAccess = now
        inputCache.put(store.path, entry)
        while (inputCache.size > maxCachedStores) {
          val (oldPath, old) = inputCache.head
          inputCache.remove(oldPath)
          parkSuperseded(oldPath, old, now)
        }
        (payload, cb)
    }
  }

  /** queriesDf columns: (queryId LONG, qv ARRAY<FLOAT>).
    * Returns (queryId, gid, score, distance, payload, rank).
    * `useAggregatorMerge` selects the bounded-heap top-k merge (default,
    * map-side combining) vs the window-function merge (full sort). */
  def query(
      spark: SparkSession,
      store: IndexStore,
      queriesDf: DataFrame,
      k: Int,
      paramsOpt: Option[SearchParams] = None,
      useAggregatorMerge: Boolean = true): DataFrame = {
    import spark.implicits._

    drainExpired() // free stale cache blocks even on brute-only queries
    val (m, manifestVersion) = store.readManifestWithVersion()
    val im = m.meta
    val metric = im.metricEnum
    val params = paramsOpt.getOrElse(SearchParams.defaults(k, im.oversample))
    val perSegLimit = k * math.max(1, im.oversample) // FdbVectorIndex.java:420

    // per-phase engine metrics (reference Metrics.java meters): kernel
    // phases aggregate through accumulators; declarative stages report
    // row counts through observe() nodes
    val phaseSink = graft.util.EngineMetrics.forSession(spark).phaseSink
    val obsTag = observeId.incrementAndGet()

    val sealedSegs = m.segments.filter(s => SealedStates(s.state)).map(_.segId)
    val bruteSegs = m.segments.filter(s => BruteStates(s.state)).map(_.segId)

    // collect the query batch (the KNN contract is a bounded batch) — the
    // analog of sending q to every segment task. Broadcast and searched
    // in chunks of `queryChunkSize` below, so per-segment task time and
    // broadcast size stay flat as the batch grows.
    val queries: Array[(Long, Array[Float])] = queriesDf
      .select(col("queryId").cast("long"), col("qv").cast("array<float>"))
      .as[(Long, Array[Float])]
      .collect()

    val vectors = store.readVectors(spark)

    // ---- brute-force path over ACTIVE/PENDING segments (J1) -------------
    val bruteScored: DataFrame =
      if (bruteSegs.isEmpty) emptyResults(spark)
      else {
        val live = vectors
          .filter(col("segId").isin(bruteSegs: _*))
          .filter(!col("deleted"))
        scored(live.crossJoin(broadcast(queriesDf)), metric, params.normalizeOnRead)
          .select(col("queryId"), col("segId"), col("gid"), col("score"), col("distance"), col("payload"))
      }

    // ---- sealed path: per-segment ADC + graph expansion (J2/J3) ---------
    val sealedScored: DataFrame =
      if (sealedSegs.isEmpty) emptyResults(spark)
      else {
        // Codebooks are loaded PER SEGMENT inside the search task (the
        // Spark analog of the reference's per-segment cache bulk-load,
        // SegmentCaches.java:37-84) — never collected to the driver. At
        // production shape (dim 768, pqM 16, pqK 256) one codebook is
        // ~786 KB; at 10k sealed segments a driver collect+broadcast would
        // hold ~8 GB per query call. Instead the codebooks table (one row
        // per segment) rides its own tiny shuffle keyed by segId into the
        // same cogroup that already co-locates codes+graph.
        val (payload, cbs) = sealedInputs(spark, store, sealedSegs, manifestVersion)
        val cbK = cbs.groupByKey(_.segId)
        val payloadK = payload.groupByKey(_.segId)

        // the query batch enters in bounded chunks: one cogroup per chunk,
        // unioned. A single cogroup looping the WHOLE batch makes every
        // segment task a straggler proportional to batch size; chunking
        // bounds per-task time AND parallelizes chunks across the
        // executor pool (the payload is persisted, so the per-chunk
        // re-shuffle reads cached blocks, not parquet). Batches up to
        // `queryChunkSize` keep the exact single-cogroup plan.
        val chunks = // one empty chunk keeps the empty-batch plan shape
          if (queries.isEmpty) Seq(Array.empty[(Long, Array[Float])])
          else queries.grouped(queryChunkSize).toSeq
        val chunkCandidates = chunks.map { chunk =>
          val qB = spark.sparkContext.broadcast(chunk)
          // codebook side first (left) — one row, read before the bulk stream
          cbK.cogroup(payloadK) { (segId, cbs, rows) =>
            if (!cbs.hasNext) Iterator.empty // missing codebook → segment yields nothing
            else {
              val cbr = cbs.next()
              val cb = Pq.Codebook(cbr.m, cbr.k, cbr.subDim, cbr.centroids)
              val codeMap = new mutable.HashMap[Int, Array[Byte]]()
              val adj = new mutable.HashMap[Int, Array[Int]]()
              rows.foreach { r =>
                if (r.code != null) codeMap.put(r.vecId, r.code)
                else adj.put(r.vecId, r.neighbors)
              }
              // accessor form, not a case-lambda: the tuple is total here
              // and scalac's partial-function scaffold is pure dead weight
              // on the per-query hot path
              qB.value.iterator.flatMap { t =>
                SegmentSearch.searchSealed(segId, cb, t._2, codeMap, adj, perSegLimit, params, phaseSink)
                  .iterator.map(a => (t._1, segId, a.vecId))
              }
            }
          }.toDF("queryId", "segId", "vecId")
        }
        // small batches: plain Catalyst union (keeps the exact committed
        // plan shape). Past `chunkUnionPlanThreshold` chunks, fuse into
        // one LogicalRDD leaf — driver planning time stays flat instead
        // of growing with an N-subtree Union the optimizer re-walks.
        val fuse = chunkCandidates.lengthCompare(chunkUnionPlanThreshold) > 0
        lastChunkPlanFused = fuse
        val candidates =
          if (!fuse) chunkCandidates.reduce(_ unionByName _)
          else org.apache.spark.sql.graft.SparkShims
            .unionAsSingleLeaf(spark, chunkCandidates)

        // exact rerank (J5): candidates ⋈ vectors (pruned to sealed segs).
        // Shuffle hash join, NOT broadcast: candidates are O(queries ×
        // segments × k·oversample) rows — at 100× segment count a broadcast
        // would exceed driver/executor limits; a hash shuffle on
        // (segId, vecId) scales linearly and the vectors side is already
        // partition-pruned.
        val sealedVectors = vectors.filter(col("segId").isin(sealedSegs: _*))
        val joined = sealedVectors
          .join(candidates.hint("shuffle_hash"), Seq("segId", "vecId"))
          .filter(!col("deleted"))
          .join(broadcast(queriesDf), Seq("queryId"))
        scored(joined, metric, params.normalizeOnRead)
          .select(col("queryId"), col("segId"), col("gid"), col("score"), col("distance"), col("payload"))
          .observe(s"graft_sealed_rerank_$obsTag", count(lit(1)).as("rows"))
      }

    capAndMerge(spark, bruteScored.unionByName(sealedScored), k, perSegLimit,
      metric, useAggregatorMerge, obsTag)
  }

  /** Distributed-queries KNN: identical semantics and results to
    * [[query]], but the query set STAYS a distributed DataFrame — nothing
    * query-sized ever passes through the driver, so a multi-million-row
    * query table (the offline-retrieval shape: "embed every training
    * document, fetch its neighbors") is a legal input.
    *
    * Layout (the block-nested-loop shape a 1000-executor cluster wants):
    * queries are hashed into `Q = ceil(M / queriesPerTask)` buckets and
    * replicated once per sealed segment (each replica is one (id, qv) row
    * — the small side); the per-segment codes∪graph payload and codebook
    * are replicated once per BUCKET (the big side, so Q is chosen to keep
    * its replication factor minimal while bounding per-task query count).
    * One cogroup on (segId, bucket) then gives every task exactly one
    * segment's state plus ≤ queriesPerTask queries — per-task memory and
    * time are both bounded regardless of M, and the M×S search work is
    * spread across Q×S tasks. Rerank joins candidates back to the
    * partition-pruned vectors table and to the (distributed) queries on
    * queryId — no broadcast anywhere, AQE free to pick strategies.
    *
    * The single `count()` sizing job on the queries table is the one
    * driver-side action: the bucket count must be fixed before the
    * replication shuffle (AQE cannot re-plan a flatMap's fan-out).
    *
    * ACTIVE/PENDING segments take the brute path as a plain (un-hinted)
    * cross join: Catalyst broadcasts a small queries side by itself and
    * falls back to a partitioned cartesian for a huge one — both are the
    * honest M×N work the brute contract states. */
  def queryDistributed(
      spark: SparkSession,
      store: IndexStore,
      queriesDf: DataFrame,
      k: Int,
      paramsOpt: Option[SearchParams] = None,
      queriesPerTask: Int = 1024): DataFrame = {
    import spark.implicits._

    drainExpired()
    val (m, manifestVersion) = store.readManifestWithVersion()
    val im = m.meta
    val metric = im.metricEnum
    val params = paramsOpt.getOrElse(SearchParams.defaults(k, im.oversample))
    val perSegLimit = k * math.max(1, im.oversample)
    val phaseSink = graft.util.EngineMetrics.forSession(spark).phaseSink
    val obsTag = observeId.incrementAndGet()

    val sealedSegs = m.segments.filter(s => SealedStates(s.state)).map(_.segId)
    val bruteSegs = m.segments.filter(s => BruteStates(s.state)).map(_.segId)

    val q = queriesDf
      .select(col("queryId").cast("long"), col("qv").cast("array<float>"))
    val vectors = store.readVectors(spark)

    // ---- brute path: un-hinted cross join (queries side distributed) ----
    val bruteScored: DataFrame =
      if (bruteSegs.isEmpty) emptyResults(spark)
      else {
        val live = vectors
          .filter(col("segId").isin(bruteSegs: _*))
          .filter(!col("deleted"))
        scored(live.crossJoin(q), metric, params.normalizeOnRead)
          .select(col("queryId"), col("segId"), col("gid"), col("score"), col("distance"), col("payload"))
      }

    // ---- sealed path: (segId, bucket) cogroup ---------------------------
    val sealedScored: DataFrame =
      if (sealedSegs.isEmpty) emptyResults(spark)
      else {
        val qCount = q.count() // sizing job: fixes the bucket layout
        val numBuckets = math.max(1L,
          (qCount + queriesPerTask - 1) / queriesPerTask).toInt

        val (payload, cbs) = sealedInputs(spark, store, sealedSegs, manifestVersion)
        val segs = sealedSegs.toArray
        val qRep = q.as[(Long, Array[Float])].flatMap { t =>
          // floorMod: Int.MinValue.abs is still negative
          val b = java.lang.Math.floorMod(java.lang.Long.hashCode(t._1), numBuckets)
          segs.iterator.map(sid => QueryRep(sid, b, t._1, t._2))
        }
        val leftSide = payload.flatMap { r =>
          Iterator.range(0, numBuckets).map(b =>
            SealedSideRow(r.segId, b, r.vecId, r.code, r.neighbors, 0, 0, 0, null))
        }.unionByName(cbs.flatMap { c =>
          Iterator.range(0, numBuckets).map(b =>
            SealedSideRow(c.segId, b, -1, null, null, c.m, c.k, c.subDim, c.centroids))
        })

        val candidates = leftSide.groupByKey(r => (r.segId, r.bucket))
          .cogroup(qRep.groupByKey(r => (r.segId, r.bucket))) { (key, rows, qs) =>
            val segId = key._1
            var cb: Pq.Codebook = null
            val codeMap = new mutable.HashMap[Int, Array[Byte]]()
            val adj = new mutable.HashMap[Int, Array[Int]]()
            rows.foreach { r =>
              if (r.centroids != null) cb = Pq.Codebook(r.pqM, r.pqK, r.subDim, r.centroids)
              else if (r.code != null) codeMap.put(r.vecId, r.code)
              else adj.put(r.vecId, r.neighbors)
            }
            if (cb == null) Iterator.empty // missing codebook → segment yields nothing
            else qs.flatMap { qr =>
              SegmentSearch.searchSealed(segId, cb, qr.qv, codeMap, adj, perSegLimit, params, phaseSink)
                .iterator.map(a => (qr.queryId, segId, a.vecId))
            }
          }.toDF("queryId", "segId", "vecId")

        // Rerank joins are UN-hinted here (unlike the bounded-batch path,
        // which forces shuffle_hash building the contractually-small
        // candidates side): with unbounded queries the candidates table is
        // M × S × k·oversample rows and may dwarf the vectors side, so
        // neither side is always the right hash build — AQE picks from
        // runtime stats and sort-merge spills safely when both are huge.
        val sealedVectors = vectors.filter(col("segId").isin(sealedSegs: _*))
        val joined = sealedVectors
          .join(candidates, Seq("segId", "vecId"))
          .filter(!col("deleted"))
          .join(q, Seq("queryId"))
        scored(joined, metric, params.normalizeOnRead)
          .select(col("queryId"), col("segId"), col("gid"), col("score"), col("distance"), col("payload"))
          .observe(s"graft_dist_rerank_$obsTag", count(lit(1)).as("rows"))
      }

    capAndMerge(spark, bruteScored.unionByName(sealedScored), k, perSegLimit,
      metric, useAggregatorMerge = true, obsTag)
  }

  /** Per-segment cap (J8) + global top-k merge (J7) — the shared tail of
    * both the bounded-batch and the distributed-queries paths. */
  private def capAndMerge(
      spark: SparkSession,
      all: DataFrame,
      k: Int,
      perSegLimit: Int,
      metric: Metric,
      useAggregatorMerge: Boolean,
      obsTag: Long): DataFrame = {
    val perSeg = Window.partitionBy(col("queryId"), col("segId"))
      .orderBy(col("score").desc, col("gid"))
    val capped = all
      .withColumn("segRank", row_number().over(perSeg))
      .filter(col("segRank") <= perSegLimit)

    if (useAggregatorMerge) {
      // scale path: bounded-heap top-k Aggregator — partial aggregation
      // sends ≤ k hits per (query, partition) into the merge shuffle
      // instead of every capped candidate (SURVEY.md §7.3). The payload
      // rides through the heap and distance derives from score, so the
      // merge output IS the final result — the candidate subtree (segment
      // search + rerank) is evaluated exactly once.
      import spark.implicits._
      val topkAgg = new graft.functions.TopKAggregator(k)
      val merged = capped.select(col("queryId"), col("gid"), col("score"), col("payload"))
        .as[(Long, Long, Double, Array[Byte])]
        .groupByKey(_._1)
        .mapValues(r => (r._2, r._3, r._4))
        .agg(topkAgg.toColumn.name("topk"))
        .flatMap { t =>
          t._2.iterator.zipWithIndex.map { zi =>
            (t._1, zi._1._1, zi._1._2, zi._1._3, zi._2 + 1)
          }
        }
        .toDF("queryId", "gid", "score", "payload", "rank")
      val distance =
        if (metric eq Metric.L2) -col("score") else lit(1.0) - col("score")
      merged
        .withColumn("distance", distance)
        .select(col("queryId"), col("gid"), col("score"), col("distance"), col("payload"), col("rank"))
        .observe(s"graft_topk_merge_$obsTag", count(lit(1)).as("rows"))
    } else {
      val global = Window.partitionBy(col("queryId"))
        .orderBy(col("score").desc, col("gid"))
      capped
        .withColumn("rank", row_number().over(global))
        .filter(col("rank") <= k)
        .select(col("queryId"), col("gid"), col("score"), col("distance"), col("payload"), col("rank"))
        .observe(s"graft_topk_merge_$obsTag", count(lit(1)).as("rows"))
    }
  }

  /** Attach score/distance columns per the reference's conventions
    * (FdbVectorIndex.java:686-693) via codegen'd expressions.
    *
    * `normalizeOnRead` (COSINE only, reference FdbVectorIndex.java:823-828,
    * 1006-1015): similarity is computed as dot(q,emb)/(‖q‖·‖emb‖) with the
    * reference's zero-PRODUCT → 0.0 guard (`denom == 0.0 ? 0.0 : …`) —
    * kept verbatim for parity, including its behavior on subnormal norms
    * whose product underflows (the fused kernel guards each norm
    * individually and would return a finite similarity there). */
  private[index] def scored(
      df: DataFrame,
      metric: Metric,
      normalizeOnRead: Boolean = false): DataFrame =
    // `eq`: Metric values are the parse() singletons, reference identity
    if (metric eq Metric.L2) {
      val d = sqrt(vector.l2_squared(col("embedding"), col("qv")))
      df.withColumn("distance", d).withColumn("score", -col("distance"))
    } else {
      val sim =
        if (normalizeOnRead) {
          val denom = vector.vec_norm(col("embedding")) * vector.vec_norm(col("qv"))
          when(denom === 0.0, 0.0)
            .otherwise(vector.vec_dot(col("embedding"), col("qv")) / denom)
        } else vector.cosine_sim(col("embedding"), col("qv"))
      df.withColumn("score", sim).withColumn("distance", lit(1.0) - col("score"))
    }

  private def emptyResults(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Int, Long, Double, Double, Array[Byte])]
      .toDF("queryId", "segId", "gid", "score", "distance", "payload")
  }
}
