package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SparkShims

/**
 * Distributed graph analytics over edge DataFrames — the two classic
 * iterative/join-shaped workloads a training-data pipeline runs over
 * derived graphs (user-item bipartite graphs, co-occurrence graphs,
 * near-dup similarity graphs; cf. the connected-components resolver in
 * [[Dedup.resolveClusters]]).
 *
 * Everything here is EXACT INTEGER arithmetic. PageRank uses fixed-point
 * mass units (a configurable power-of-ten total) with floor division, so
 * results are bit-identical across engines and partitionings — no
 * float-sum order sensitivity, which is what lets the DuckDB oracle
 * reproduce ranks exactly (the same rule the money queries use:
 * scale to integer, don't round).
 *
 * Scale notes (100 TB / 1000 executors):
 *  - each PageRank iteration is one equi-join of ranks onto edge sources
 *    plus one shuffle on the destination key — the canonical Pregel step
 *    expressed relationally. Pre-partitioning `edges` by `src` and
 *    reusing that layout across iterations removes the per-round edge
 *    shuffle (bucketing; see Bucketing.writeBucketed); ranks are
 *    per-node and co-partition with the join key.
 *  - iteration state is localCheckpoint'ed per round, so plan depth and
 *    lineage stay O(1) (same recipe as [[Dedup.resolveClusters]]'s
 *    pointer-jumping loop).
 *  - triangle counting enumerates each triangle once via id-canonical
 *    orientation (a<b<c). On skewed degree distributions the standard
 *    upgrade is degree-ordered orientation (orient every edge toward the
 *    higher-(degree,id) endpoint), which bounds wedge fan-out by
 *    O(sqrt(|E|)) per node; id-ordering keeps the oracle trivially
 *    expressible and is identical in the uniform-degree test data.
 */
object GraphAlgos {

  /** Undirected view of a directed edge list: both orientations,
    * distinct. One explode pass over the (possibly expensive) input and
    * ONE distinct — not union-of-two-scans + distinct. */
  def symmetrize(edges: DataFrame): DataFrame =
    edges.select(explode(array(
        struct(col("src").cast("long").as("src"), col("dst").cast("long").as("dst")),
        struct(col("dst").cast("long").as("src"), col("src").cast("long").as("dst"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()

  /**
   * Fixed-point PageRank: `iterations` rounds of
   *   r'(v) = base + Σ_{(u,v)∈E} (alphaNum · r(u)) div (alphaDen · deg(u))
   * with base = ((alphaDen−alphaNum) · (tot div N)) div alphaDen and
   * r₀(v) = tot div N. All divisions are floor divisions on longs —
   * deterministic, exact, overflow-safe for tot ≤ 1e12 (alphaNum·r ≤
   * 8.5e13 « Long.Max). Mass lost to flooring is the deliberate price of
   * exactness; ranks remain a strict monotone transform of real-valued
   * PageRank on these graphs.
   *
   * `edges` is taken as directed (symmetrize first for undirected
   * semantics); dangling nodes (no out-edges) contribute nothing, nodes
   * with no in-edges settle at `base`.
   */
  def pageRankFixedPoint(
      edges: DataFrame,
      iterations: Int,
      tot: Long = 1000000000000L,
      alphaNum: Long = 85L,
      alphaDen: Long = 100L): DataFrame = {
    require(iterations >= 1, "at least one iteration")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // disjoint column names per join side — these all derive from the
    // same scan, and same-name df("col") conditions trip Spark's
    // ambiguous-self-join detection
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("deg_node"), col("deg"))
    // static relations, read once per job not once per iteration
    e.persist(); nodes.persist(); deg.persist()
    val n = nodes.count() // one tiny job; N is also the r0 denominator
    require(n > 0, "pageRankFixedPoint on an empty edge set (no nodes)")
    val r0 = tot / n
    val base = ((alphaDen - alphaNum) * r0) / alphaDen

    // localCheckpoint each round (NOT persist/unpersist): the iteration
    // state must become a LogicalRDD leaf, or every round's plan chains
    // all previous rounds and unpersisting round n-1 cascades into round
    // n's cache — the full chain then recomputes from the source scan
    // each iteration (see Bpe.learnMerges for the pathological case).
    // n is already on the driver — use it to size the per-round join
    // strategy: under the bound the rank/degree/contribution tables
    // (O(|V|) rows of 2 longs) broadcast and the EDGE SET NEVER
    // SHUFFLES in any round (only the map-side-combined dst aggregation
    // moves data); past it every join stays partitioned for
    // billion-node graphs.
    val bcastRanks = n <= BroadcastRankMaxNodes
    // Partitioned regime (the billion-node path): shape the edge set
    // ONCE — hash-partitioned AND sorted by src, materialized as a
    // checkpoint whose LogicalRDD carries both properties — so every
    // round's rank⋈edge sort-merge join reuses the layout with NO
    // exchange and NO sort on the edge leg (the in-memory equivalent of
    // Bucketing.writeBucketed; GraphAlgosSpec pins the plan). The rank
    // side is O(|V|) and re-shuffles to co-partition each round — that
    // per-round cost is node-sized, never edge-sized.
    val eJ =
      if (bcastRanks) e
      else {
        val shaped = shapeEdges(e)
        nodes.count(); deg.count() // materialize before releasing their source
        e.unpersist()
        shaped
      }
    var ranks = nodes.withColumn("rank_fp", lit(r0)).localCheckpoint()
    for (_ <- 1 to iterations) {
      val next = pageRankStep(eJ, nodes, deg, ranks, base, alphaNum, alphaDen,
          broadcastRanks = bcastRanks)
        .localCheckpoint()
      SparkShims.unpersistCheckpoint(ranks) // release the superseded round
      ranks = next
    }
    if (bcastRanks) e.unpersist() else SparkShims.unpersistCheckpoint(eJ)
    nodes.unpersist(); deg.unpersist()
    ranks
  }

  /** Node-count bound for broadcasting the per-round rank-side tables
    * (~16 bytes/node -> ~64 MB at the bound). */
  val BroadcastRankMaxNodes: Long = 4L * 1000 * 1000

  /** Edge layout for the partitioned regime: hash-partitioned and
    * sorted by `src`, materialized as an eager checkpoint whose
    * LogicalRDD CARRIES both properties — every later src-keyed
    * sort-merge join reuses the layout with no exchange and no sort on
    * this side. AQE must be off for the one shaping action: an adaptive
    * plan reports UnknownPartitioning to the checkpoint, which would
    * silently reintroduce the per-round edge shuffle this exists to
    * remove (the spec pins the plan, so a regression is loud). */
  private[pipeline] def shapeEdges(e: DataFrame): DataFrame = {
    val sess = e.sparkSession
    val prev = sess.conf.get("spark.sql.adaptive.enabled", "true")
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    try e.repartition(col("src")).sortWithinPartitions(col("src")).localCheckpoint()
    finally sess.conf.set("spark.sql.adaptive.enabled", prev)
  }

  /** One PageRank round, lazy — split out so the per-iteration physical
    * plan stays pinnable in GraphAlgosSpec (the checkpoint in the loop
    * reduces the public query's plan to a LogicalRDD scan). */
  private[pipeline] def pageRankStep(
      e: DataFrame, nodes: DataFrame, deg: DataFrame, ranks: DataFrame,
      base: Long, alphaNum: Long, alphaDen: Long,
      broadcastRanks: Boolean = false): DataFrame =
    pageRankStepBase(e, nodes, deg, ranks, lit(base), alphaNum, alphaDen, broadcastRanks)

  /** The step with a per-NODE teleport column (constant for classic
    * PageRank, source-restricted for the personalized variant). */
  private[pipeline] def pageRankStepBase(
      e: DataFrame, nodes: DataFrame, deg: DataFrame, ranks: DataFrame,
      baseCol: org.apache.spark.sql.Column, alphaNum: Long, alphaDen: Long,
      broadcastRanks: Boolean = false): DataFrame = {
    def maybeBcast(df: DataFrame): DataFrame =
      if (broadcastRanks) broadcast(df) else df
    val contrib = ranks.join(maybeBcast(deg), col("node") === col("deg_node"))
      .select(col("node").as("c_src"),
        expr(s"($alphaNum * rank_fp) div ($alphaDen * deg)").as("c"))
    val inSum = e.join(maybeBcast(contrib), col("src") === col("c_src"))
      .groupBy(col("dst")).agg(sum(col("c")).as("in_c"))
      .select(col("dst").as("in_node"), col("in_c"))
    nodes.join(maybeBcast(inSum), col("node") === col("in_node"), "left")
      .select(col("node"),
        (baseCol + coalesce(col("in_c"), lit(0L))).as("rank_fp"))
  }

  /**
   * Personalized PageRank (integer fixed-point): teleport mass restricted
   * to `sources` — the "similar to these" relevance primitive (seed
   * expansion, related-item graphs). Same scale machinery as
   * [[pageRankFixedPoint]]: localCheckpoint'ed rounds, size-aware
   * rank-side broadcast with the exchange-free shaped-edge fallback;
   * the per-node teleport is a literal IN over the (small) seed set, so
   * the only new cost vs classic PageRank is a codegen'd CASE.
   */
  def personalizedPageRank(
      edges: DataFrame,
      sources: Seq[Long],
      iterations: Int,
      tot: Long = 1000000000000L,
      alphaNum: Long = 85L,
      alphaDen: Long = 100L): DataFrame = {
    require(iterations >= 1, "at least one iteration")
    require(sources.nonEmpty, "personalized PageRank needs a non-empty seed set")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("deg_node"), col("deg"))
    e.persist(); nodes.persist(); deg.persist()
    val n = nodes.count()
    require(n > 0, "personalizedPageRank on an empty edge set (no nodes)")
    val r0v = tot / sources.size
    val tele = ((alphaDen - alphaNum) * r0v) / alphaDen
    def seeded(thenC: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(col("node").isInCollection(sources), thenC).otherwise(lit(0L))
    val bcastRanks = n <= BroadcastRankMaxNodes
    val eJ =
      if (bcastRanks) e
      else {
        val shaped = shapeEdges(e)
        nodes.count(); deg.count()
        e.unpersist()
        shaped
      }
    var ranks = nodes.withColumn("rank_fp", seeded(lit(r0v))).localCheckpoint()
    for (_ <- 1 to iterations) {
      val next = pageRankStepBase(eJ, nodes, deg, ranks, seeded(lit(tele)),
          alphaNum, alphaDen, broadcastRanks = bcastRanks)
        .localCheckpoint()
      SparkShims.unpersistCheckpoint(ranks)
      ranks = next
    }
    if (bcastRanks) e.unpersist() else SparkShims.unpersistCheckpoint(eJ)
    nodes.unpersist(); deg.unpersist()
    ranks
  }

  /**
   * Per-node triangle participation counts. `edges` must be the
   * id-canonical undirected edge set: distinct rows with a < b. Edges
   * are re-oriented from lower to higher DEGREE (id tie-break) before
   * the wedge→close join: every vertex's out-degree is then bounded by
   * O(√m) (the arboricity argument of Chiba–Nishizeki / Schank–Wagner
   * "forward"), so wedge volume is Σ C(out,2) and a hub of degree d
   * costs O(d) wedges instead of the O(d²) an id-only orientation pays —
   * the difference between a night and a never on a skewed 100 TB graph.
   * Each triangle is enumerated exactly once, at its minimum-order
   * corner, and credited to all three.
   */
  /** Total adjacency payload is exactly |E| longs, so the edge count is
    * the broadcast-size decision variable: under this bound (~64 MB of
    * neighbor ids) the adjacency table broadcasts to both legs of the
    * close join and the 1000-executor plan ships NO wide array rows
    * through a shuffle; past it, the close falls back to partitioned
    * hash joins on src/dst. A billion-edge graph takes the shuffle path
    * automatically. */
  val BroadcastAdjacencyMaxEdges: Long = 8L * 1000 * 1000

  def triangleCounts(edges: DataFrame): DataFrame = {
    // the input edge set is typically the expensive part (a fact-table
    // self-join + distinct); orientation consumes it twice (degree agg,
    // then the degree join) — persist it or that work runs twice
    val e = edges.select(col("a").cast("long"), col("b").cast("long")).persist()
    // one pass over the cached edges prices the adjacency broadcast
    // (measured on the sf0.1 co-purchase graph: broadcast close 6.4 s
    // vs shuffled 15.6 s — the shuffle ships two ~out-degree arrays
    // per edge row, the broadcast ships each adjacency list once)
    val nEdges = e.count()
    // the oriented set feeds all three legs of the intersection join —
    // persist it (src/dst only; the order key `dd` has no consumer on
    // this path), or the degree join is computed thrice
    val o = orientByDegree(e).select(col("src"), col("dst")).persist()
    val counts = wedgeClose(o, broadcastAdj = nEdges <= BroadcastAdjacencyMaxEdges)
      .localCheckpoint() // materialize (≤ |V| rows) before releasing e/o
    o.unpersist()
    e.unpersist()
    counts
  }

  /** Orient each undirected edge from its (degree, id)-smaller to its
    * (degree, id)-larger endpoint. Also emits the dst's degree (`dd`) —
    * the order key a wedge-ORDERING consumer needs (the hub-star wedge
    * property in GraphAlgosSpec builds on it); the intersection-form
    * [[wedgeClose]] reads only (src, dst). */
  private[pipeline] def orientByDegree(e: DataFrame): DataFrame = {
    val deg = e.select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val fwd = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    e.join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(
        when(fwd, col("a")).otherwise(col("b")).as("src"),
        when(fwd, col("b")).otherwise(col("a")).as("dst"),
        when(fwd, col("db")).otherwise(col("da")).as("dd"))
  }

  /** Triangle enumeration over a degree-oriented edge set, in
    * ADJACENCY-INTERSECTION form: a triangle's corners orient u→v, u→w,
    * v→w (u the (deg,id)-minimum), so the oriented edge (u, v) anchors
    * exactly the triangles {u, v, w} with `w ∈ N⁺(u) ∩ N⁺(v)` — each
    * found once, ever. The naive wedge→close alternative shuffles every
    * wedge (Σ C(out, 2) rows — ~35M on the sf0.1 co-purchase graph, 3×
    * slower measured); here the only wide rows are |E| edges carrying
    * two adjacency arrays, and `array_intersect` does the per-edge work
    * in one codegen'd pass. Out-degree (and so array width) is bounded
    * by O(√m) — the degree-orientation guarantee that makes the
    * collect_list safe on a skewed 100 TB graph. */
  private[pipeline] def wedgeClose(o: DataFrame,
      broadcastAdj: Boolean = false): DataFrame = {
    // adjacency lists sorted ONCE here so the per-edge close can be a
    // merge walk (SortedIntersectExpr) instead of array_intersect's
    // per-row hash-set build — the close step's dominant cost on a
    // dense co-purchase graph
    val adj0 = o.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
    val adj = if (broadcastAdj) broadcast(adj0) else adj0
    // dst-side inner join doubles as pruning: a sink dst has no
    // out-neighbors and its edges can anchor no triangle
    val tris = o.select(col("src"), col("dst"))
      .join(adj.select(col("src"), col("nbrs").as("un")), Seq("src"))
      .join(adj.select(col("src").as("dst"), col("nbrs").as("vn")), Seq("dst"))
      .select(col("src"), col("dst"),
        graft.functions.graph.sorted_intersect(col("un"), col("vn")).as("ws"))
      .filter(size(col("ws")) > 0)
    val credits = tris
      .select(col("src").as("node"), size(col("ws")).cast("long").as("c"))
      .unionByName(tris.select(col("dst").as("node"), size(col("ws")).cast("long").as("c")))
      .unionByName(tris.select(explode(col("ws")).as("node"), lit(1L).as("c")))
    credits.groupBy(col("node")).agg(sum(col("c")).as("n_triangles"))
  }

  /** The wedge→close join from a raw id-canonical edge set (compat entry
    * for plan pins): degree-orient, then [[wedgeClose]]. */
  private[pipeline] def triangleJoin(e: DataFrame): DataFrame =
    wedgeClose(orientByDegree(e))
}
