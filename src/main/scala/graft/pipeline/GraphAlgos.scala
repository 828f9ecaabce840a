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
    // deg rides IN the iteration state (node, deg, rank_fp): the former
    // per-round rank⋈deg join — and in the broadcast regime its per-round
    // broadcast BUILD job — becomes a one-time left join at init. The
    // contribution rows are identical (inner-join rows = deg-not-null
    // rows), so every round's integer math is unchanged.
    var ranks = nodes
      .join(deg, col("node") === col("deg_node"), "left")
      .select(col("node"), col("deg"), lit(r0).as("rank_fp"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val next = pageRankStep(eJ, ranks, base, alphaNum, alphaDen,
          broadcastRanks = bcastRanks)
        .localCheckpoint()
      SparkShims.unpersistCheckpoint(ranks) // release the superseded round
      ranks = next
    }
    if (bcastRanks) e.unpersist() else SparkShims.unpersistCheckpoint(eJ)
    nodes.unpersist(); deg.unpersist()
    ranks.select(col("node"), col("rank_fp"))
  }

  /** Node-count bound for broadcasting the per-round rank-side tables
    * (~16 bytes/node -> ~64 MB at the bound). Tunable per deployment via
    * `-Dgraft.graph.broadcastRankMaxNodes` (bigger executors can afford a
    * higher cutover; tests force 0 to drive the partitioned billion-node
    * regime on small fixtures and assert it matches the broadcast one). */
  def BroadcastRankMaxNodes: Long =
    sys.props.get("graft.graph.broadcastRankMaxNodes")
      .map(_.toLong).getOrElse(4L * 1000 * 1000)

  /**
   * EDGE-WEIGHTED fixed-point PageRank: mass flows proportionally to
   * integer edge weights (co-occurrence counts, interaction strength) —
   *   r'(v) = base + Σ_{(u,v,w)∈E} (alphaNum · r(u) · w) div (alphaDen · W(u))
   * with `W(u) = Σ out-weights`. Per-EDGE floor division (the unweighted
   * variant divides per-edge too — weights just scale the numerator);
   * everything stays exact integers, bit-reproducible, oracle-replayable.
   * Overflow bound: alphaNum·r·w ≤ 85·tot·w_max — safe for
   * w_max ≤ ~10⁵ at the default tot (the require enforces it).
   *
   * Same scale machinery as [[pageRankFixedPoint]]: static persisted
   * edges, node-sized localCheckpoint'ed state, size-aware broadcast of
   * the rank-side tables. (The shaped-edge exchange-free regime applies
   * above the node bound exactly as in the unweighted variant; weighted
   * graphs small enough to broadcast skip it.)
   */
  def pageRankWeighted(
      edges: DataFrame,
      iterations: Int,
      tot: Long = 1000000000000L,
      alphaNum: Long = 85L,
      alphaDen: Long = 100L): DataFrame = {
    require(iterations >= 1, "at least one iteration")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("w").cast("long"))
    e.persist()
    val wRow = e.agg(min(col("w")), max(col("w"))).head()
    val (wMin, wMax) = (wRow.getLong(0), wRow.getLong(1))
    // min too, not just max: a zero/negative weight passes a max-only
    // guard but makes some node's out-weight sum ≤ 0 — the per-edge
    // division then yields NULL (silently dropped from the sum) or
    // sign-flipped mass, corrupting ranks with no error anywhere
    require(wMin >= 1, s"edge weights must be positive (found $wMin)")
    // guard the guard: alphaNum*tot can itself overflow Long for
    // caller-supplied tot >= ~1.1e17, silently weakening the bound check
    require(alphaNum <= Long.MaxValue / tot,
      s"alphaNum=$alphaNum * tot=$tot overflows Long — shrink tot")
    require(wMax <= Long.MaxValue / (alphaNum * tot),
      s"w_max=$wMax overflows alphaNum*tot*w — rescale weights or shrink tot")
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
      .select(col("src").as("w_node"), col("ow"))
    nodes.persist(); outW.persist()
    val n = nodes.count()
    require(n > 0, "pageRankWeighted on an empty edge set")
    val r0 = tot / n
    val base = ((alphaDen - alphaNum) * r0) / alphaDen
    val bcast = n <= BroadcastRankMaxNodes
    def maybeBcast(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df

    // out-weight rides IN the state (see pageRankFixedPoint's deg): the
    // per-round rank⋈outW join and its broadcast build collapse into a
    // one-time left join at init; per-edge integer math unchanged
    var ranks = nodes
      .join(maybeBcast(outW), col("node") === col("w_node"), "left")
      .select(col("node"), col("ow"), lit(r0).as("rank_fp"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val rw = ranks.where(col("ow").isNotNull)
        .select(col("node").as("r_src"), col("rank_fp"), col("ow"))
      val inSum = e.join(maybeBcast(rw), col("src") === col("r_src"))
        .select(col("dst"),
          expr(s"($alphaNum * rank_fp * w) div ($alphaDen * ow)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_c"))
        .select(col("dst").as("in_node"), col("in_c"))
      val next = ranks.join(maybeBcast(inSum), col("node") === col("in_node"), "left")
        .select(col("node"), col("ow"),
          (lit(base) + coalesce(col("in_c"), lit(0L))).as("rank_fp"))
        .localCheckpoint()
      SparkShims.unpersistCheckpoint(ranks)
      ranks = next
    }
    nodes.unpersist(); outW.unpersist(); e.unpersist()
    ranks.select(col("node"), col("rank_fp"))
  }

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
    * reduces the public query's plan to a LogicalRDD scan). `state`
    * carries (node, deg, rank_fp) with deg NULL for sink nodes. */
  private[pipeline] def pageRankStep(
      e: DataFrame, state: DataFrame,
      base: Long, alphaNum: Long, alphaDen: Long,
      broadcastRanks: Boolean = false): DataFrame =
    pageRankStepBase(e, state, lit(base), alphaNum, alphaDen, broadcastRanks)

  /** The step with a per-NODE teleport column (constant for classic
    * PageRank, source-restricted for the personalized variant). The
    * contribution rows come straight from the deg-carrying state — the
    * `deg.isNotNull` filter selects exactly the rows the former
    * rank⋈deg inner join produced, with no per-round join or broadcast
    * build; the state is node-complete so the final left join against it
    * re-emits every node. */
  private[pipeline] def pageRankStepBase(
      e: DataFrame, state: DataFrame,
      baseCol: org.apache.spark.sql.Column, alphaNum: Long, alphaDen: Long,
      broadcastRanks: Boolean = false): DataFrame = {
    def maybeBcast(df: DataFrame): DataFrame =
      if (broadcastRanks) broadcast(df) else df
    val contrib = state.where(col("deg").isNotNull)
      .select(col("node").as("c_src"),
        expr(s"($alphaNum * rank_fp) div ($alphaDen * deg)").as("c"))
    val inSum = e.join(maybeBcast(contrib), col("src") === col("c_src"))
      .groupBy(col("dst")).agg(sum(col("c")).as("in_c"))
      .select(col("dst").as("in_node"), col("in_c"))
    state.join(maybeBcast(inSum), col("node") === col("in_node"), "left")
      .select(col("node"), col("deg"),
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
    // deg in the state — see pageRankFixedPoint
    var ranks = nodes
      .join(deg, col("node") === col("deg_node"), "left")
      .select(col("node"), col("deg"), seeded(lit(r0v)).as("rank_fp"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val next = pageRankStepBase(eJ, ranks, seeded(lit(tele)),
          alphaNum, alphaDen, broadcastRanks = bcastRanks)
        .localCheckpoint()
      SparkShims.unpersistCheckpoint(ranks)
      ranks = next
    }
    if (bcastRanks) e.unpersist() else SparkShims.unpersistCheckpoint(eJ)
    nodes.unpersist(); deg.unpersist()
    ranks.select(col("node"), col("rank_fp"))
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

  /** Floor under which the degree/adjacency broadcast is NOT worth its
    * fixed build latency: each broadcast is a separate collect + hashed-
    * relation build + ship (~tens of ms even for a few KB), while the
    * sort-merge exchange it replaces costs time LINEAR in the edge count
    * — measured on the sf0.1 gates: the ~900k-edge co-purchase
    * orientation gains 0.4 s from broadcasting, the ~20k-edge capped
    * truss graph LOSES ~1 s to per-round broadcast builds. Below the
    * floor both plans' data movement is trivial, so the fixed cost
    * dominates; above it the linear term does. Tunable per deployment
    * via `-Dgraft.graph.broadcastStructMinEdges`. */
  def BroadcastStructMinEdges: Long =
    sys.props.get("graft.graph.broadcastStructMinEdges")
      .map(_.toLong).getOrElse(200L * 1000)

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
    val bcast = nEdges <= BroadcastAdjacencyMaxEdges &&
      nEdges >= BroadcastStructMinEdges
    val o = orientByDegree(e, broadcastDeg = bcast)
      .select(col("src"), col("dst")).persist()
    // wedgeClose is eager (returns its counts checkpointed), so e/o can
    // be released as soon as it returns
    val counts = wedgeClose(o, broadcastAdj = bcast)
    o.unpersist()
    e.unpersist()
    counts
  }

  /** Orient each undirected edge from its (degree, id)-smaller to its
    * (degree, id)-larger endpoint. Also emits the dst's degree (`dd`) —
    * the order key a wedge-ORDERING consumer needs (the hub-star wedge
    * property in GraphAlgosSpec builds on it); the intersection-form
    * [[wedgeClose]] reads only (src, dst). */
  private[pipeline] def orientByDegree(
      e: DataFrame, broadcastDeg: Boolean = false): DataFrame = {
    // the degree table is node-sized — under the same size bound the
    // adjacency broadcast uses, ship it to both joins instead of
    // exchanging + sorting the EDGE set twice (the planner cannot see
    // the aggregate's size, so it never converts on its own)
    def maybeBcast(df: DataFrame): DataFrame =
      if (broadcastDeg) broadcast(df) else df
    val deg = e.select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val fwd = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    e.join(maybeBcast(deg.select(col("n").as("a"), col("d").as("da"))), "a")
      .join(maybeBcast(deg.select(col("n").as("b"), col("d").as("db"))), "b")
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
    // the triangle set feeds THREE credit legs — materialize it once
    // (eager, closed-wedge-sized) or each union leg re-runs the whole
    // adjacency join + merge-walk intersect (measured 3× the close
    // stage's cost on the sf0.1 co-purchase graph). Returns the
    // node-sized counts ALREADY checkpointed so the triangle rows can
    // be released here rather than leak to the caller.
    val tris = closedWedges(o, broadcastAdj).localCheckpoint()
    val credits = tris
      .select(col("src").as("node"), size(col("ws")).cast("long").as("c"))
      .unionByName(tris.select(col("dst").as("node"), size(col("ws")).cast("long").as("c")))
      .unionByName(tris.select(explode(col("ws")).as("node"), lit(1L).as("c")))
    val counts = credits.groupBy(col("node")).agg(sum(col("c")).as("n_triangles"))
      .localCheckpoint()
    SparkShims.unpersistCheckpoint(tris)
    counts
  }

  /** The triangle SET under a degree orientation, one row per oriented
    * anchor edge: (src, dst, ws) with `ws = N⁺(src) ∩ N⁺(dst)` non-empty
    * — each triangle appears exactly once, on its (deg,id)-minimum
    * corner's edge. Shared by the node-credit consumer [[wedgeClose]]
    * and the edge-credit consumer [[supportOn]] (k-truss). */
  private[pipeline] def closedWedges(o: DataFrame,
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
    o.select(col("src"), col("dst"))
      .join(adj.select(col("src"), col("nbrs").as("un")), Seq("src"))
      .join(adj.select(col("src").as("dst"), col("nbrs").as("vn")), Seq("dst"))
      .select(col("src"), col("dst"),
        graft.functions.graph.sorted_intersect(col("un"), col("vn")).as("ws"))
      .filter(size(col("ws")) > 0)
  }

  /** The wedge→close join from a raw id-canonical edge set (compat entry
    * for plan pins): degree-orient, then [[wedgeClose]]. */
  private[pipeline] def triangleJoin(e: DataFrame): DataFrame =
    wedgeClose(orientByDegree(e))

  // ── Wedge-class machinery: degree cap, edge support, truss peel ─────
  //
  // graph_edge_support, graph_motif_square and graph_k_truss all
  // enumerate common-neighbor structure; the methods below are the ONE
  // implementation they share. Wedge enumeration is Θ(Σ_v deg(v)²)
  // physics — on a skewed 100 TB graph the bound on that volume is the
  // DEGREE CAP, which used to live baked into each gate's pre-filter
  // and is now an explicit operator parameter (parity with
  // [[kCorePeel]]'s k; verdict r15 items 3 and 5).

  /** Id-canonical (a < b) undirected edge set restricted to nodes of
    * degree ≤ degreeCap (self-loops dropped, duplicates collapsed).
    * `Int.MaxValue` = exact/uncapped (skips the degree pass entirely).
    * Capping drops the hub nodes AND every edge touching them — the
    * standard wedge-volume bound: post-cap Σ deg² ≤ |E|·degreeCap. */
  private[pipeline] def degreeCappedCanonical(
      edges: DataFrame, degreeCap: Int): DataFrame = {
    require(degreeCap >= 1, "degreeCap must be >= 1")
    val e0 = edges
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .where(col("a") < col("b"))
      .distinct()
    if (degreeCap == Int.MaxValue) e0
    else {
      val keep = e0.select(explode(array(col("a"), col("b"))).as("n"))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
        .where(col("d") <= degreeCap)
      e0.join(keep.select(col("n").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("n").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
    }
  }

  /** Per-edge triangle support over the degree-capped graph: (a, b,
    * support) for EVERY surviving edge, zeros included. Support rides
    * the intersection form ([[closedWedges]]: degree-oriented sorted
    * adjacency + per-edge merge walk, out-degree bounded O(√m)) rather
    * than a wedge-enumerating self-join — each triangle credits its
    * three edges once, id-canonicalized. The input edge set is
    * localCheckpoint'ed (eager, edge-sized) because the support plan
    * consumes it four times (orientation degrees, both join sides,
    * the zero-fill left join). */
  def cappedSupport(edges: DataFrame,
      degreeCap: Int = Int.MaxValue): DataFrame = {
    val e = degreeCappedCanonical(edges, degreeCap).localCheckpoint()
    val nE = e.count()
    val out = supportOn(e,
      nE <= BroadcastAdjacencyMaxEdges && nE >= BroadcastStructMinEdges)
    SparkShims.unpersistCheckpoint(e) // supportOn is eager — e is consumed
    out
  }

  /** Support body over an ALREADY materialized canonical edge set —
    * shared by [[cappedSupport]] and each [[kTrussPeel]] round. `bcast`
    * is the caller's size-aware degree/adjacency broadcast decision
    * (same bound as [[triangleCounts]]); callers price it ONCE — the
    * previous shape never passed the flag, so every truss round
    * sort-merge-joined the edge set against its own degree table. */
  private def supportOn(e: DataFrame, bcast: Boolean): DataFrame = {
    // materialize the triangle set once (same 3-reference fan-out as
    // [[wedgeClose]] — without this each credit leg re-runs the whole
    // support join); the returned support table is checkpointed so the
    // triangle rows can be released before returning
    val tris = closedWedges(orientByDegree(e, broadcastDeg = bcast), bcast)
      .localCheckpoint()
    val cred = tris.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"),
        size(col("ws")).cast("long").as("c"))
      .unionByName(tris.select(col("src"), explode(col("ws")).as("w"))
        .select(least(col("src"), col("w")).as("a"),
          greatest(col("src"), col("w")).as("b"), lit(1L).as("c")))
      .unionByName(tris.select(col("dst"), explode(col("ws")).as("w"))
        .select(least(col("dst"), col("w")).as("a"),
          greatest(col("dst"), col("w")).as("b"), lit(1L).as("c")))
    val sup = cred.groupBy(col("a"), col("b"))
      .agg(sum(col("c")).cast("long").as("support"))
    val out = e.join(sup, Seq("a", "b"), "left").na.fill(0L, Seq("support"))
      .localCheckpoint()
    SparkShims.unpersistCheckpoint(tris)
    out
  }

  /** Per-PAIR common-neighbor counts over the degree-capped graph:
    * (u, w, c) for every unordered pair u < w with
    * c = |N(u) ∩ N(w)| ≥ minCommon. Unlike [[cappedSupport]] the pairs
    * need NOT be edges — this is the square-motif / butterfly census
    * shape, and inherently wedge-ENUMERATION work (one row per wedge
    * through each center; Σ C(deg, 2) rows). The degreeCap is the
    * production bound on that volume; uncapped it is honest Θ(Σ deg²)
    * physics (BASELINE.md ScalingHeavy, square-motif family). */
  def cappedWedgePairs(edges: DataFrame, degreeCap: Int = Int.MaxValue,
      minCommon: Long = 1L): DataFrame = {
    val e = degreeCappedCanonical(edges, degreeCap).localCheckpoint()
    val nbrs = e.select(col("a").as("v"), col("b").as("n"))
      .unionByName(e.select(col("b").as("v"), col("a").as("n")))
    nbrs.as("x").join(nbrs.as("y"),
        col("x.v") === col("y.v") && col("x.n") < col("y.n"))
      .groupBy(col("x.n").as("u"), col("y.n").as("w"))
      .agg(count(lit(1)).cast("long").as("c"))
      .where(col("c") >= minCommon)
  }

  /** k-truss peel: `rounds` synchronous rounds of "drop every edge in
    * fewer than k−2 triangles", over the degree-capped canonical graph.
    * Fixed rounds keep the result oracle-replayable as an unrolled CTE
    * (the kCorePeel / PageRank discipline — both engines run the same N
    * rounds whether or not the peel converged); rounds large enough to
    * reach the fixpoint give the exact k-truss of the capped graph.
    * Returns the surviving (a, b) edges.
    *
    * Scale shape: per-round state is the shrinking survivor EDGE set,
    * localCheckpoint'ed each round — round r+1 consumes it four times
    * (orientation degrees, adjacency, both support-join sides), and
    * without the checkpoint round 2's plan re-runs round 1's entire
    * support join once per reference (measured 4.71 → 1.29 s on the
    * sf0.1 gate when first caught; the standing iterative-loop rule).
    * The degree cap is applied ONCE, up front — capping inside the loop
    * would re-peel by a moving target and is not the truss definition. */
  def kTrussPeel(edges: DataFrame, k: Int, rounds: Int,
      degreeCap: Int = Int.MaxValue): DataFrame = {
    require(k >= 3, "k-truss needs k >= 3")
    require(rounds >= 1, "at least one peel round")
    var cur = degreeCappedCanonical(edges, degreeCap).localCheckpoint()
    // one size decision for all rounds: the survivor set only SHRINKS,
    // so a ≤-bound decision taken on the initial capped set stays valid
    // (a set that starts under the broadcast floor stays under it)
    val nE = cur.count()
    val bcast =
      nE <= BroadcastAdjacencyMaxEdges && nE >= BroadcastStructMinEdges
    // supportOn is eager (returns its support table checkpointed), so a
    // round's survivor set is a cheap filter VIEW over that checkpoint —
    // re-materializing the filtered rows per round would write the
    // edge-sized state twice per round for nothing
    var curCkpt = cur
    var curView: DataFrame = cur
    for (_ <- 1 to rounds) {
      val sup = supportOn(curView, bcast)
      SparkShims.unpersistCheckpoint(curCkpt)
      curCkpt = sup
      curView = sup.where(col("support") >= k - 2)
        .select(col("a"), col("b"))
    }
    curView
  }

  /**
   * k-core peeling: `rounds` synchronous rounds of "drop every node whose
   * degree among surviving nodes is < k", over a symmetrized edge set
   * (same input contract as [[pageRankFixedPoint]]). With `rounds` large
   * enough to reach the fixpoint this is exactly the k-core; a fixed
   * round count keeps the result closed-form for the value oracle (the
   * PageRank unrolled-rounds discipline — both engines run the same N
   * rounds whether or not the peel has converged).
   *
   * Returns surviving `(node, core_deg)` — degree within the surviving
   * subgraph after the last round.
   *
   * Scale shape: per-round state is the NODE-sized survivor set (two
   * longs/row, localCheckpoint'ed — O(1) lineage); the edge set is
   * persisted once and NEVER materialized per round — each round
   * re-derives surviving degrees by two semi-joins of the static edges
   * against the survivor set (broadcast under the
   * [[BroadcastRankMaxNodes]] bound, partitioned hash past it, exactly
   * the PageRank regime switch). Degree counting is a map-side-combined
   * groupBy. Checkpointing the shrinking edge set instead would write
   * O(|E|) per round — node-sized state is what survives a 100 TB graph.
   */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    e.persist()
    val out = kCorePeelOn(e, k, rounds)
    e.unpersist()
    out
  }

  /** The peel loop over an ALREADY-persisted, long-cast edge set —
    * shared by [[kCorePeel]] and [[kCorePeelAtPercentile]] so the
    * percentile path never caches the same edges twice. `knownNodeBound`
    * lets a caller that already ran a sizing action (the percentile
    * path's src-distinct count) price the broadcast DECISION without the
    * extra union-distinct count job — it only selects the per-round join
    * strategy, never the result. */
  private def kCorePeelOn(e: DataFrame, k: Int, rounds: Int,
      knownNodeBound: Option[Long] = None): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1, "at least one peel round")
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // prices the broadcast decision; the count also materializes e
    val n = knownNodeBound.getOrElse(nodes.count())
    val bcast = n <= BroadcastRankMaxNodes

    var alive = nodes.localCheckpoint()
    for (_ <- 1 to rounds) {
      val next = survivingDegStep(e, alive, bcast)
        .filter(col("core_deg") >= k)
        .select(col("src").as("node"))
        .localCheckpoint()
      SparkShims.unpersistCheckpoint(alive)
      alive = next
    }
    val out = survivingDegStep(e, alive, bcast)
      .select(col("src").as("node"), col("core_deg"))
      .localCheckpoint() // materialize (≤ |V| rows) before releasing e
    SparkShims.unpersistCheckpoint(alive)
    out
  }

  /** One peel round's degree computation, lazy — split out so the
    * per-round physical plan stays pinnable in GraphAlgosSpec (the
    * public query's checkpoints collapse it to a LogicalRDD scan):
    * two node-sized semi-joins against the static edges, then a
    * map-side-combined degree count. */
  private[pipeline] def survivingDegStep(
      e: DataFrame, alive: DataFrame, broadcastAlive: Boolean): DataFrame = {
    def maybeBcast(df: DataFrame): DataFrame =
      if (broadcastAlive) broadcast(df) else df
    e.join(maybeBcast(alive.select(col("node").as("src"))), Seq("src"), "left_semi")
      .join(maybeBcast(alive.select(col("node").as("dst"))), Seq("dst"), "left_semi")
      .groupBy(col("src")).agg(count(lit(1)).as("core_deg"))
  }

  /**
   * [[kCorePeel]] with a DATA-RELATIVE threshold: k = the degree value
   * at ascending-rank position ceil(pct·|V|) of the initial degree
   * sequence — "peel away the sparsest pct of the graph and whatever
   * that drags down". An absolute k goes stale as a graph grows (every
   * degree scales with data volume; a fixed threshold peels everything
   * or nothing); the rank rule keeps the peel biting at any scale and
   * is still exact-integer-deterministic.
   *
   * The k-th-smallest is computed from degree-VALUE bin cumsums (group
   * degrees by value, running sum over the ≤max-degree distinct values,
   * first bin whose cumulative count reaches the position) — no global
   * sort of |V| rows, no TakeOrdered collect; the only window runs over
   * the tiny value-histogram (the token-budget selection pattern).
   */
  def kCorePeelAtPercentile(edges: DataFrame, pct: Double, rounds: Int): DataFrame = {
    require(pct > 0.0 && pct < 1.0, "pct must be in (0, 1)")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    e.persist()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("c"))
    // ONE driver action for n, pos and k (was three: deg.count, then a
    // separate window + head): n = Σm over the degree-value histogram,
    // pos = max(1, ceil(pct·n)) computed inside the plan with the same
    // double math, k = min value whose cumulative count reaches pos.
    // Also materializes e for the peel below.
    val wCum = org.apache.spark.sql.expressions.Window
      .orderBy(col("c")).rowsBetween(Long.MinValue, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val hist = deg.groupBy(col("c")).agg(count(lit(1)).as("m"))
    val kRow = hist
      .withColumn("cum", sum(col("m")).over(wCum))
      .withColumn("n", sum(col("m")).over(wAll))
      .filter(col("cum") >=
        greatest(lit(1L), ceil(lit(pct) * col("n")).cast("long")))
      .agg(min(col("c")), max(col("n"))).head()
    require(!kRow.isNullAt(0), "kCorePeelAtPercentile on an empty edge set")
    val k = kRow.getLong(0)
    val n = kRow.getLong(1)
    // n (src-distinct count) prices the broadcast decision: on the
    // symmetrized inputs this operator documents it IS the node count
    val out = kCorePeelOn(e, k.toInt, rounds, knownNodeBound = Some(n))
    e.unpersist()
    out
  }

  /**
   * HITS hubs-and-authorities (Kleinberg 1999), `rounds` rounds of the
   * EXACT INTEGER recurrence on a DIRECTED edge set:
   *   auth'(v) = Σ_{(u,v)∈E} hub(u)   (then, with the new auth)
   *   hub'(u)  = Σ_{(u,v)∈E} auth'(v)
   * from hub₀ = 1. No per-round normalization — the reals-and-L2 version
   * is float-order-sensitive; the unnormalized integer iterate is the
   * same ranking (scores scale by a per-round constant on convergence)
   * and lets the oracle replay rounds bit-exactly. Magnitudes grow as
   * ≤ d_max^(2·rounds), so the caller keeps `rounds` small (the
   * require below enforces the Long-overflow bound d_max^(2r) ≤ 2^62 —
   * at the gate's 2 rounds that allows d_max ~ 46k; ranking needs few
   * rounds, convergence-grade scores want the normalized float variant,
   * deliberately out of scope).
   *
   * Scale shape per round: two src/dst-keyed equi-joins of node-sized
   * score tables onto the static edges with map-side-combined sums —
   * the PageRank regime (broadcast under [[BroadcastRankMaxNodes]],
   * partitioned past it), localCheckpoint'ed per round.
   */
  def hitsFixedRounds(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "at least one HITS round")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    e.persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    nodes.persist()
    val n = nodes.count()
    require(n > 0, "hitsFixedRounds on an empty edge set")
    val dMax = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .unionByName(e.groupBy(col("dst")).agg(count(lit(1)).as("d"))
        .select(col("dst").as("src"), col("d")))
      .agg(max(col("d"))).head().getLong(0)
    require(2 * rounds * math.log(dMax.toDouble.max(2.0)) <= 62 * math.log(2.0),
      s"d_max=$dMax^(2*$rounds) would overflow Long — fewer rounds or the normalized variant")
    val bcast = n <= BroadcastRankMaxNodes

    var scores = nodes.select(col("node"), lit(1L).as("hub"), lit(1L).as("auth"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      // authorities this round feed hubs the same round (classic order)
      val withAuth = hitsAuthStep(e, scores, bcast).localCheckpoint()
      val next = hitsHubStep(e, withAuth, bcast).localCheckpoint()
      SparkShims.unpersistCheckpoint(scores)
      SparkShims.unpersistCheckpoint(withAuth)
      scores = next
    }
    nodes.unpersist()
    e.unpersist()
    scores
  }

  /**
   * Multi-source BFS: exact hop distance from the nearest of `sources`
   * for every node reached within `rounds` hops — the k-hop
   * neighborhood / seed-expansion primitive (the bounded-round sibling
   * of [[Dedup.resolveClusters]]' run-to-fixpoint pointer jumping).
   * dist₀ = 0 at the seeds; each round relaxes
   * `dist'(v) = min(dist(v), 1 + min_{(u,v)∈E} dist(u))` — pure integer
   * mins, bit-exact, replayed by the oracle as unrolled rounds.
   * Unreached nodes carry no row (no sentinel ∞ to disagree on).
   *
   * Scale shape per round: the node-sized frontier table equi-joins the
   * static edges on src (broadcast under [[BroadcastRankMaxNodes]],
   * partitioned past it), min-aggregated map-side; state
   * localCheckpoints per round — O(1) lineage. A round's join input is
   * the full reached set, not just the new frontier — at bounded
   * `rounds` the simplicity wins over frontier-delta bookkeeping (the
   * delta optimization matters for diameter-length traversals, not
   * k-hop neighborhoods).
   */
  def multiSourceDistances(
      edges: DataFrame,
      sources: Seq[Long],
      rounds: Int): DataFrame = {
    require(rounds >= 1, "at least one BFS round")
    require(sources.nonEmpty, "multiSourceDistances needs a non-empty seed set")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    e.persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val n = nodes.count()
    require(n > 0, "multiSourceDistances on an empty edge set")
    val bcast = n <= BroadcastRankMaxNodes

    var dist = nodes.filter(col("node").isInCollection(sources))
      .withColumn("dist", lit(0L)).localCheckpoint()
    for (_ <- 1 to rounds) {
      val next = bfsStep(e, dist, bcast).localCheckpoint()
      SparkShims.unpersistCheckpoint(dist)
      dist = next
    }
    e.unpersist()
    dist
  }

  /**
   * Jaccard link prediction: score NON-adjacent node pairs by
   * `|N(u) ∩ N(v)| / |N(u) ∪ N(v)|` over candidate pairs that share at
   * least `minShared` common neighbors — the related-items / missing-
   * edge primitive. Runs entirely on scalars: shared counts come from
   * the wedge self-join (no adjacency arrays), union sizes from
   * `deg(u) + deg(v) − shared`, so nothing wide ever shuffles.
   *
   * Scale: wedge volume through a center of degree d is C(d, 2) —
   * quadratic in hub degree — so centers with degree >
   * `maxCenterDegree` are EXCLUDED from candidate generation (the cap
   * bounds the join at cap²/2 rows per center). That makes `shared` a
   * documented LOWER bound on true common-neighbor counts (hub-only
   * co-neighbors drop out — at a hub of degree 10⁶ they are also the
   * least informative); degrees in the denominator stay exact and
   * full. The oracle replays the same cap, so parity is exact.
   *
   * `edges` is the id-canonical undirected edge set (distinct, a < b —
   * the [[triangleCounts]] contract).
   */
  /** Shared candidate machinery of the link-prediction scorers: the
    * symmetrized (persisted) view, the (persisted) degree table, the
    * size-aware broadcast decision, and the hub-capped wedge legs.
    * Both scorers MUST stay on this one implementation — their twin
    * oracles assume identical cap/orientation semantics. Caller
    * releases via [[LinkCtx.release]] after materializing its output. */
  private final case class LinkCtx(
      sym: DataFrame, deg: DataFrame, adj: DataFrame,
      maybeBcast: DataFrame => DataFrame) {
    def release(): Unit = { deg.unpersist(); sym.unpersist() }
  }

  private def linkContext(
      edges: DataFrame, maxCenterDegree: Int, minShared: Int, topK: Int,
      carryCenterDegree: Boolean): LinkCtx = {
    require(maxCenterDegree >= 2, "a center below degree 2 anchors no wedge")
    require(minShared >= 1 && topK >= 1, "minShared and topK must be positive")
    val sym = edges.select(col("a").cast("long"), col("b").cast("long"))
      .select(explode(array(
          struct(col("a").as("src"), col("b").as("dst")),
          struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    sym.persist()
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("d"))
    deg.persist()
    val n = deg.count() // materialize both (deg scan materializes sym)
    val bcast = n <= BroadcastRankMaxNodes
    val maybeBcast: DataFrame => DataFrame =
      df => if (bcast) broadcast(df) else df
    val capped = deg.filter(col("d") <= maxCenterDegree)
    val adj =
      if (carryCenterDegree) sym.join(maybeBcast(capped), Seq("src"))
      else sym.join(maybeBcast(capped.select(col("src"))), Seq("src"), "left_semi")
    LinkCtx(sym, deg, adj, maybeBcast)
  }

  /** Non-adjacent filter + deterministic top-K tail shared by the
    * scorers; `scoreCol` orders descending with (u, v) tie-break. */
  private def linkTail(
      edges: DataFrame, pairs: DataFrame, scoreCol: String, topK: Int): DataFrame =
    pairs.join(
        edges.select(col("a").cast("long").as("u"), col("b").cast("long").as("v")),
        Seq("u", "v"), "left_anti")
      .orderBy(col(scoreCol).desc, col("u"), col("v"))
      .limit(topK)

  def jaccardLinkPredictions(
      edges: DataFrame,
      maxCenterDegree: Int,
      minShared: Int,
      topK: Int): DataFrame = {
    val ctx = linkContext(edges, maxCenterDegree, minShared, topK,
      carryCenterDegree = false)
    val shared = ctx.adj.select(col("src"), col("dst").as("u"))
      .join(ctx.adj.select(col("src"), col("dst").as("v")), Seq("src"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .join(ctx.deg.select(col("src").as("u"), col("d").as("du")), Seq("u"))
      .join(ctx.deg.select(col("src").as("v"), col("d").as("dv")), Seq("v"))
      .withColumn("jaccard", col("shared").cast("double") /
        (col("du") + col("dv") - col("shared")).cast("double"))
    val out = linkTail(edges, shared, "jaccard", topK)
      .select(col("u"), col("v"), col("shared"), col("jaccard"))
      .localCheckpoint() // topK rows; release the cached graph below
    ctx.release()
    out
  }

  /**
   * Resource-allocation link prediction (Zhou et al. 2009):
   * `RA(u,v) = Σ_{w ∈ N(u)∩N(v)} 1/deg(w)` — like Adamic-Adar but
   * degree-reciprocal, and here in EXACT INTEGER fixed-point:
   * each shared neighbor contributes `scale div deg(w)` (floor
   * division), so the per-pair score is an order-free integer sum —
   * bit-exact across engines and partitionings, where a float
   * Σ 1/ln(d) (Adamic-Adar's form) would be sum-order-sensitive and
   * un-oracle-able. Same capped-wedge candidate machinery and
   * lower-bound semantics as [[jaccardLinkPredictions]]; the wedge
   * rows additionally carry the center's degree, everything else is
   * identical scalars.
   */
  def resourceAllocationLinkPredictions(
      edges: DataFrame,
      maxCenterDegree: Int,
      minShared: Int,
      topK: Int,
      scale: Long = 1000000000000L): DataFrame = {
    // wedge legs carry the CENTER degree (the RA denominator)
    val ctx = linkContext(edges, maxCenterDegree, minShared, topK,
      carryCenterDegree = true)
    val pairs = ctx.adj.select(col("src"), col("dst").as("u"), col("d"))
      .join(ctx.adj.select(col("src"), col("dst").as("v")), Seq("src"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("shared"),
        sum(expr(s"$scale div d")).as("ra_fp"))
      .filter(col("shared") >= minShared)
    val out = linkTail(edges, pairs, "ra_fp", topK)
      .select(col("u"), col("v"), col("shared"), col("ra_fp"))
      .localCheckpoint()
    ctx.release()
    out
  }

  /** One BFS relaxation round, lazy (pinnable in GraphAlgosSpec):
    * reached-set join onto static edges, then a min-merge with the
    * current distances via a full outer union-aggregate (windowless). */
  private[pipeline] def bfsStep(
      e: DataFrame, dist: DataFrame, broadcastDist: Boolean): DataFrame = {
    def maybeBcast(df: DataFrame): DataFrame =
      if (broadcastDist) broadcast(df) else df
    val relaxed = e.join(
        maybeBcast(dist.select(col("node").as("src"), col("dist"))), Seq("src"))
      .select(col("dst").as("node"), (col("dist") + 1L).as("dist"))
    dist.unionByName(relaxed)
      .groupBy(col("node")).agg(min(col("dist")).as("dist"))
  }

  /**
   * Per-source exact hop distances — [[multiSourceDistances]] with the
   * seed IDENTITY kept (state keyed on (seed, node), min-relaxation per
   * key), the primitive under sampled centrality measures. State is
   * |sources| × reached-nodes rows; the per-round shape is the same
   * single equi-join + keyed min as plain BFS.
   */
  def perSourceDistances(
      edges: DataFrame,
      sources: Seq[Long],
      rounds: Int): DataFrame = {
    require(rounds >= 1, "at least one BFS round")
    require(sources.nonEmpty, "perSourceDistances needs a non-empty seed set")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    e.persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val n = nodes.count()
    require(n > 0, "perSourceDistances on an empty edge set")
    val bcast = n * sources.size <= BroadcastRankMaxNodes

    def maybeBcast(df: DataFrame): DataFrame =
      if (bcast) broadcast(df) else df
    var dist = sources.toDF("seed")
      .join(nodes, col("seed") === col("node"), "left_semi")
      .select(col("seed"), col("seed").as("node"), lit(0L).as("dist"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val relaxed = e.join(
          maybeBcast(dist.select(col("seed"), col("node").as("src"), col("dist"))),
          Seq("src"))
        .select(col("seed"), col("dst").as("node"), (col("dist") + 1L).as("dist"))
      val next = dist.unionByName(relaxed)
        .groupBy(col("seed"), col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint()
      SparkShims.unpersistCheckpoint(dist)
      dist = next
    }
    e.unpersist()
    dist
  }

  /**
   * Connected components by alternating large-star/small-star edge
   * rewriting (Kiveris et al., "Connected Components in MapReduce and
   * Beyond") — O(log² n) rounds on ANY graph shape, including the
   * huge-diameter meshes that defeat min-label propagation.
   *
   * Why this exists next to [[Dedup.duplicateClusters]]: label
   * propagation (even with pointer jumping) moves information ONE graph
   * hop per round, so a spatial cluster spanning d grid cells costs
   * Θ(d) rounds — measured 289 rounds on a 300×300 mesh with random
   * ids, where the label forest offers no shortcuts because each
   * neighborhood minimum is geometrically local. Star rewriting instead
   * RESHAPES the edge set toward stars rooted at component minima: the
   * same mesh converges in 9 rounds. Near-dup clusters (tiny diameter)
   * keep using duplicateClusters; spatial/mesh-like graphs use this.
   *
   * Per round: large-star hangs every higher neighbor of v onto
   * min(N(v) ∪ {v}); small-star re-hangs the lower-or-equal neighbors
   * (and v). Each is one symmetric-view groupBy-min + equi-join +
   * distinct over the edge set — no node-count blowup (the paper bounds
   * the edge multiset). Rounds localCheckpoint with
   * [[SparkShims.freshCheckpointStats]] so driver-side size estimates
   * stay measured, not compounded. Convergence = edge-set fixpoint,
   * checked with an order-insensitive (count, Σhash, ⊕hash) digest.
   *
   * Output: (node, component) for every endpoint of `edges0`, component
   * = minimum node id of the component (the star root).
   */
  def connectedComponentsStar(edges0: DataFrame, maxRounds: Int = 30): DataFrame = {
    require(maxRounds >= 1, "at least one star round")
    val init = edges0.select(
        least(col(edges0.columns(0)), col(edges0.columns(1))).cast("long").as("a"),
        greatest(col(edges0.columns(0)), col(edges0.columns(1))).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

    def sym(e: DataFrame): DataFrame = e.select(explode(array(
        struct(col("a").as("v"), col("b").as("u")),
        struct(col("b").as("v"), col("a").as("u")))).as("x"))
      .select(col("x.v").as("v"), col("x.u").as("u"))

    /** m(v) = min(N(v) ∪ {v}) joined back onto the symmetric view. */
    def withMin(s: DataFrame): DataFrame = {
      val mins = s.groupBy(col("v")).agg(min(col("u")).as("mn"))
        .select(col("v").as("mv"), least(col("mn"), col("mv")).as("m"))
      s.join(mins, col("v") === col("mv")).drop("mv")
    }

    def canon(df: DataFrame): DataFrame = df
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

    def largeStar(e: DataFrame): DataFrame =
      canon(withMin(sym(e)).filter(col("u") > col("v"))
        .select(col("m").as("x"), col("u").as("y")))

    def smallStar(e: DataFrame): DataFrame = {
      val s = withMin(sym(e))
      canon(s.filter(col("u") <= col("v"))
          .select(col("m").as("x"), col("u").as("y"))
        .unionByName(s.select(col("m").as("x"), col("v").as("y")).distinct()))
    }

    def digest(e: DataFrame): (Long, String, Long) = {
      // decimal Σhash: exact and overflow-free under ANSI mode
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)")),
        expr("bit_xor(xxhash64(a, b))")).head()
      (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toString,
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }

    var e = SparkShims.freshCheckpointStats(init.localCheckpoint(true))
    var d = digest(e)
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val next = SparkShims.freshCheckpointStats(
        smallStar(largeStar(e)).localCheckpoint(true))
      val d2 = digest(next)
      SparkShims.unpersistCheckpoint(e)
      e = next
      converged = d2 == d
      d = d2
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge within $maxRounds rounds")
    // stars: every node's component is min(N(v) ∪ {v})
    sym(e).groupBy(col("v")).agg(min(col("u")).as("mn"))
      .select(col("v").as("node"), least(col("mn"), col("v")).as("component"))
  }

  /**
   * Shortest-path multiplicities from each seed — the Brandes forward
   * pass: per (seed, node) the exact hop distance AND the number of
   * distinct shortest paths σ, the primitive under betweenness/stress
   * centrality and route-diversity scoring. Layer-synchronous BFS with
   * path counting: layer-r candidates come from layer-(r−1) frontier
   * rows only (σ_v = Σ over frontier predecessors of σ_u), and a
   * left-anti join against the settled set admits only FIRST-time —
   * hence shortest — arrivals, so σ never double-counts longer walks.
   * Pure Long arithmetic (σ ≤ deg^rounds « 2⁶³ at bounded rounds);
   * seeds absent from the graph are dropped.
   *
   * Scale shape per round: one edges⋈frontier equi-join + keyed sum +
   * anti-join against node-sized state; rounds localCheckpoint so
   * lineage stays O(1) (the BFS/PageRank discipline). `edges` directed;
   * symmetrize upstream for undirected semantics (multi-edges must be
   * deduped — σ counts paths in the SIMPLE graph).
   */
  def shortestPathCounts(
      edges: DataFrame,
      sources: Seq[Long],
      rounds: Int): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    e.persist()
    val out = shortestPathCountsOn(e, sources, rounds)
    e.unpersist()
    out
  }

  /** The forward-pass body over an ALREADY-persisted, long-cast edge
    * set — shared with [[betweennessCentrality]] / [[stressCentrality]],
    * whose backward passes reuse the SAME cached edges (the public entry
    * used to persist and release its own copy, so each centrality gate
    * re-derived the full edge set — typically a fact-table join +
    * symmetrize distinct — a second time for the backward pass). */
  private def shortestPathCountsOn(
      e: DataFrame,
      sources: Seq[Long],
      rounds: Int): DataFrame = {
    require(rounds >= 1, "at least one BFS round")
    require(sources.nonEmpty, "shortestPathCounts needs a non-empty seed set")
    val spark = e.sparkSession
    import spark.implicits._
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val n = nodes.count()
    require(n > 0, "shortestPathCounts on an empty edge set")
    val bcast = n * sources.size <= BroadcastRankMaxNodes
    def maybeBcast(df: DataFrame): DataFrame =
      if (bcast) broadcast(df) else df

    // settled state = the LIST of per-round frontier checkpoints, united
    // lazily where needed — re-checkpointing the whole accumulated set
    // every round (the previous shape) wrote O(rounds · settled) and its
    // shuffle-side anti-join moved the settled set per round; the union
    // of checkpointed leaves scans the same rows with NO re-write, and
    // under the broadcast regime the anti-join ships the (seed×node)-
    // sized settled keys once per round instead of shuffling both sides.
    var frontier = sources.toDF("seed")
      .join(nodes, col("seed") === col("node"), "left_semi")
      .select(col("seed"), col("seed").as("node"),
        lit(0L).as("dist"), lit(1L).as("sigma"))
      .localCheckpoint()
    var frontiers = List(frontier)
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val cand = e.join(
          maybeBcast(frontier.select(col("seed"), col("node").as("src"), col("sigma"))),
          Seq("src"))
        .groupBy(col("seed"), col("dst"))
        .agg(sum(col("sigma")).as("sigma"))
        .select(col("seed"), col("dst").as("node"), col("sigma"))
      val settledKeys = frontiers
        .map(_.select(col("seed"), col("node")))
        .reduce(_ unionByName _)
      val fresh = cand
        .join(maybeBcast(settledKeys), Seq("seed", "node"), "left_anti")
        .select(col("seed"), col("node"), lit(r.toLong).as("dist"), col("sigma"))
        .localCheckpoint()
      frontiers ::= fresh
      frontier = fresh
      // an empty frontier is a fixpoint: every later round joins it and
      // yields another empty set, so the remaining rounds are no-ops —
      // exit with the identical settled union (take(1) on the freshly
      // checkpointed frontier is a ~ms job; saturation before the round
      // bound is the common case on small-diameter graphs)
      exhausted = fresh.isEmpty
      r += 1
    }
    val settled = frontiers.reduce(_ unionByName _).localCheckpoint()
    frontiers.foreach(SparkShims.unpersistCheckpoint)
    settled
  }

  /**
   * Deterministic hash-driven walks — the DeepWalk/node2vec corpus-prep
   * step without executor RNG: from each seed, `steps` steps where the
   * step-t successor of u is the neighbor v minimizing the mixed
   * multiplicative hash `pmod(u·2654435761 + v·40503 + t·2246822519,
   * 2³²)`. The choice is uniform-ish over neighbors, REPRODUCIBLE under
   * any partitioning/retry (the property RNG walks lose on speculative
   * re-execution), and replayable relationally (plain integer
   * arithmetic). PRECONDITION: node ids must be non-negative and
   * < 2³¹ — the u-term then stays ≤ 2³¹·2654435761 ≈ 5.7e18 and the
   * three-term sum fits Long; for larger ids the multiply wraps in
   * Spark but errors in a strict BIGINT engine, so pre-reduce ids
   * first. Within that range the v-term is injective mod 2³² for
   * v < 2³², so argmin ties are impossible; pmod (not `%`) keeps the
   * mix in [0, 2³²) even if a negative id slips through. Emits one row per (seed, step, node),
   * step 0 = the seed itself; seeds with no out-edges are dropped, and
   * a walk that reaches a dead-end node (directed graphs) simply ends
   * early — no row for the unreachable steps.
   *
   * Scale shape per step: the walk state is seed-sized (broadcast side
   * of one edges⋈state equi-join) + a keyed min_by — walk count scales
   * to millions of seeds before the state side stops broadcasting,
   * and steps are a fixed small constant (the walk-corpus regime).
   */
  def hashWalks(
      edges: DataFrame,
      sources: Seq[Long],
      steps: Int): DataFrame = {
    require(steps >= 1, "at least one walk step")
    require(sources.nonEmpty, "hashWalks needs a non-empty seed set")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    e.persist()
    val nodes = e.select(col("src").as("node")).distinct()
    var cur = sources.toDF("seed")
      .join(nodes, col("seed") === col("node"), "left_semi")
      .select(col("seed"), col("seed").as("node"))
      .localCheckpoint()
    var rows = List(cur.select(col("seed"), lit(0L).as("step"), col("node")))
    var checkpoints = List(cur)
    for (t <- 1 to steps) {
      val next = e.join(broadcast(cur.select(col("seed"), col("node").as("src"))),
          Seq("src"))
        .select(col("seed"), col("src"), col("dst"),
          pmod(col("src") * 2654435761L + col("dst") * 40503L
            + lit(t.toLong) * 2246822519L, lit(4294967296L)).as("mix"))
        .groupBy(col("seed"))
        .agg(min_by(col("dst"), col("mix")).as("node"))
        .localCheckpoint()
      cur = next
      checkpoints ::= next
      rows ::= next.select(col("seed"), lit(t.toLong).as("step"), col("node"))
    }
    val out = rows.reduce(_ unionByName _).localCheckpoint()
    checkpoints.foreach(SparkShims.unpersistCheckpoint)
    e.unpersist()
    out
  }

  /**
   * Katz centrality, exact-integer form. With attenuation β = 1/base
   * (base a small integer), base^R · Σ_{r=1..R} β^r · walks_r(v) =
   * Σ_{r=1..R} base^(R−r) · walks_r(v), where walks_r(v) is the number
   * of length-r walks ENDING at v — a pure-Long recurrence
   * (walks_r(v) = Σ_{(u,v)∈E} walks_{r−1}(u), walks_0 ≡ 1), so the
   * scaled score is engine-bit-exact with no float anywhere. Ranking
   * equals float Katz at the same β truncated to R terms.
   *
   * Scale shape: each round is ONE edges⋈walks equi-join + keyed sum
   * (the PageRank shuffle), walks state is node-sized and
   * localCheckpoint'ed so lineage stays O(1). Overflow-safe for
   * bounded R: walks_r ≤ (max in-degree)^r. `edges` directed and
   * assumed deduped; symmetrize upstream for undirected semantics.
   */
  def katzCentrality(edges: DataFrame, rounds: Int, base: Long): DataFrame = {
    require(rounds >= 1, "at least one walk round")
    require(base >= 2, "attenuation base must be >= 2")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    e.persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val n = nodes.count()
    val bcast = n <= BroadcastRankMaxNodes
    def maybeBcast(df: DataFrame): DataFrame =
      if (bcast) broadcast(df) else df
    def scale(r: Int): Long =
      (1 to (rounds - r)).foldLeft(1L)((acc, _) => acc * base)
    var walks = nodes.select(col("node"), lit(1L).as("w")).localCheckpoint()
    var rounds0 = List(walks)
    var contribs = List.empty[DataFrame]
    for (r <- 1 to rounds) {
      val next = e.join(
          maybeBcast(walks.select(col("node").as("src"), col("w"))), Seq("src"))
        .groupBy(col("dst")).agg(sum(col("w")).as("w"))
        .select(col("dst").as("node"), col("w"))
        .localCheckpoint()
      walks = next
      rounds0 ::= next
      contribs ::= next.select(col("node"), (col("w") * scale(r)).as("contrib"))
    }
    val scored = contribs.reduce(_ unionByName _)
      .groupBy(col("node")).agg(sum(col("contrib")).as("katz_scaled"))
    val out = nodes.join(scored, Seq("node"), "left")
      .select(col("node"), coalesce(col("katz_scaled"), lit(0L)).as("katz_scaled"))
      .localCheckpoint()
    rounds0.foreach(SparkShims.unpersistCheckpoint)
    e.unpersist()
    out
  }

  /**
   * Bounded-horizon betweenness centrality — the classic Brandes
   * accumulation in its fractional form, completing the integer
   * [[stressCentrality]] twin: δ(v) = Σ over shortest-path-DAG
   * successors w of (σ_v/σ_w)·(1 + δ(w)), summed over the seed set
   * for interior vertices. This is the pivot-sampled betweenness
   * estimate (Brandes–Pich): exact on the sampled seeds, scaled up by
   * seed-fraction downstream if an absolute value is needed. Scores
   * are round(…,6) — the per-node successor sum is a float fold (the
   * jsd-family rounding contract); σ itself stays exact Long from the
   * forward pass.
   *
   * Scale shape identical to [[stressCentrality]]: one backward
   * edges⋈δ join + keyed sum per layer over (seed × reached)-sized
   * state.
   */
  def betweennessCentrality(
      edges: DataFrame,
      sources: Seq[Long],
      rounds: Int): DataFrame = {
    require(rounds >= 2, "betweenness needs at least an interior layer")
    // one cast+persist shared by BOTH passes — the forward pass must not
    // cache and release a private copy, or the (often join-derived) edge
    // set is recomputed from source for the backward layers
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    e.persist()
    val fwd = shortestPathCountsOn(e, sources, rounds).persist()
    // backward layers are (seed × layer)-sized — broadcast them under the
    // same node bound as the forward pass, or every layer's δ⋈edges join
    // SHUFFLES the static edge set (delta is a LogicalRDD leaf whose size
    // the planner cannot estimate, so it never converts on its own)
    val bcast = fwd.count() <= BroadcastRankMaxNodes
    def maybeBcast(df: DataFrame): DataFrame =
      if (bcast) broadcast(df) else df
    var delta = fwd.where(col("dist") === rounds)
      .select(col("seed"), col("node"), col("sigma"), lit(0.0).as("delta"))
      .localCheckpoint()
    var layers = List(delta)
    for (r <- (rounds - 1) to 1 by -1) {
      val contrib = e.join(
          maybeBcast(delta.select(col("seed"), col("node").as("dst"),
            ((lit(1.0) + col("delta")) / col("sigma")).as("share"))),
          Seq("dst"))
        .groupBy(col("seed"), col("src"))
        .agg(sum(col("share")).as("sh"))
        .select(col("seed"), col("src").as("node"), col("sh"))
      val layer = fwd.where(col("dist") === r)
        .select(col("seed"), col("node"), col("sigma"))
      val dr = layer.join(maybeBcast(contrib), Seq("seed", "node"), "left")
        .select(col("seed"), col("node"), col("sigma"),
          (col("sigma") * coalesce(col("sh"), lit(0.0))).as("delta"))
        .localCheckpoint()
      delta = dr
      layers ::= dr
    }
    val out = layers.reduce(_ unionByName _)
      .groupBy(col("node"))
      .agg(round(sum(col("delta")), 6).as("betweenness"))
      .localCheckpoint()
    layers.foreach(SparkShims.unpersistCheckpoint)
    fwd.unpersist()
    SparkShims.unpersistCheckpoint(fwd)
    e.unpersist()
    out
  }

  /**
   * Bounded-horizon stress centrality — the Brandes BACKWARD pass in
   * its integer form, completing [[shortestPathCounts]] (the forward
   * pass): per node, the number of shortest paths from the seed set
   * that pass through it as an INTERIOR vertex, over paths of ≤
   * `rounds` hops. The classic accumulation carries σ_v/σ_w fractions;
   * this formulation cancels them exactly: with g(v) = DAG-path-suffix
   * count (g = 1 + Σ over shortest-path-DAG successors of g, computed
   * layer-by-layer from the horizon inward; DAG edge u→w iff edge(u,w)
   * and dist_w = dist_u + 1), the paths through v are
   * σ_s(v) · (g(v) − 1) — pure Longs end-to-end, so the gate is
   * bit-exact against a relational replay.
   *
   * Scale shape: forward pass as [[shortestPathCounts]]; each backward
   * layer is one edges⋈g equi-join + keyed sum + a layer-sized left
   * join — state is (seed × reached-nodes)-sized, never all-pairs
   * (the pivot-sampling regime: at 100 TB you sample seeds).
   */
  def stressCentrality(
      edges: DataFrame,
      sources: Seq[Long],
      rounds: Int): DataFrame = {
    require(rounds >= 2, "stress needs at least an interior layer")
    // one cast+persist shared by both passes (see betweennessCentrality)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    e.persist()
    val fwd = shortestPathCountsOn(e, sources, rounds).persist()
    // same broadcast rule as betweennessCentrality: layer state is
    // (seed × layer)-sized — without the hint each backward layer
    // shuffles the static edge set into a sort-merge join
    val bcast = fwd.count() <= BroadcastRankMaxNodes
    def maybeBcast(df: DataFrame): DataFrame =
      if (bcast) broadcast(df) else df
    var g = fwd.where(col("dist") === rounds)
      .select(col("seed"), col("node"), lit(1L).as("g"))
      .localCheckpoint()
    var layers = List(g)
    for (r <- (rounds - 1) to 1 by -1) {
      val succSum = e.join(
          maybeBcast(g.select(col("seed"), col("node").as("dst"), col("g"))),
          Seq("dst"))
        .groupBy(col("seed"), col("src"))
        .agg(sum(col("g")).as("sg"))
        .select(col("seed"), col("src").as("node"), col("sg"))
      val layer = fwd.where(col("dist") === r).select(col("seed"), col("node"))
      val gr = layer.join(maybeBcast(succSum), Seq("seed", "node"), "left")
        .select(col("seed"), col("node"),
          (lit(1L) + coalesce(col("sg"), lit(0L))).as("g"))
        .localCheckpoint()
      g = gr
      layers ::= gr
    }
    val stress = layers.reduce(_ unionByName _)
      .join(fwd.where(col("dist") >= 1)
        .select(col("seed"), col("node"), col("sigma")), Seq("seed", "node"))
      .groupBy(col("node"))
      .agg(sum(col("sigma") * (col("g") - 1L)).as("stress"))
      .localCheckpoint()
    layers.foreach(SparkShims.unpersistCheckpoint)
    fwd.unpersist()
    SparkShims.unpersistCheckpoint(fwd)
    e.unpersist()
    stress
  }

  /**
   * Bounded-round weighted single-source shortest paths (Bellman–Ford
   * relaxation): integer edge weights, `rounds` rounds of
   * `dist_v = min(dist_v, dist_u + w_uv)` — exact distances for every
   * path of ≤ `rounds` edges. Each round is ONE equi-join + keyed min
   * over the frontier state; rounds are localCheckpoint'ed so lineage
   * stays O(1) (the iterative-algorithm discipline shared by PageRank/
   * BFS/LPA here). Unreached nodes emit no row.
   *
   * `edges`: (src, dst, w) directed — symmetrize (both directions)
   * upstream for undirected graphs.
   */
  def weightedSssp(
      edges: DataFrame,
      source: Long,
      rounds: Int): DataFrame = {
    require(rounds >= 1, "at least one relaxation round")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("w").cast("long"))
    e.persist()
    val n = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().count()
    val bcast = n <= BroadcastRankMaxNodes
    def maybeBcast(df: DataFrame): DataFrame =
      if (bcast) broadcast(df) else df
    val spark = edges.sparkSession
    import spark.implicits._
    var dist = Seq((source, 0L)).toDF("node", "dist").localCheckpoint()
    for (_ <- 1 to rounds) {
      val relaxed = e.join(
          maybeBcast(dist.select(col("node").as("src"), col("dist"))), Seq("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      val next = dist.unionByName(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint()
      SparkShims.unpersistCheckpoint(dist)
      dist = next
    }
    e.unpersist()
    dist
  }

  /**
   * k-bounded closeness centrality of the seed set: per seed,
   * `(reached − 1) / Σ dist` over the nodes within `rounds` hops — the
   * sampled-centrality estimate (HyperBall-family shape: exact per-seed
   * BFS within a bounded horizon, aggregated to two scalars per seed;
   * at 100 TB you sample seeds, never all-pairs). Exact integers until
   * the one final division.
   */
  def kBoundedCloseness(
      edges: DataFrame,
      sources: Seq[Long],
      rounds: Int): DataFrame =
    perSourceDistances(edges, sources, rounds)
      .groupBy(col("seed"))
      .agg(count(lit(1)).as("n_reached"), sum(col("dist")).as("sum_dist"))
      .withColumn("closeness",
        when(col("sum_dist") > 0, round(
          (col("n_reached") - 1).cast("double") / col("sum_dist"), 6))
          .otherwise(lit(0.0)))

  /** HITS auth half-round, lazy (pinnable in GraphAlgosSpec). */
  private[pipeline] def hitsAuthStep(
      e: DataFrame, scores: DataFrame, broadcastScores: Boolean): DataFrame = {
    def maybeBcast(df: DataFrame): DataFrame =
      if (broadcastScores) broadcast(df) else df
    val auth = e.join(maybeBcast(scores.select(col("node").as("src"), col("hub"))), Seq("src"))
      .groupBy(col("dst")).agg(sum(col("hub")).as("a"))
      .select(col("dst").as("a_node"), col("a"))
    scores.join(maybeBcast(auth), col("node") === col("a_node"), "left")
      .select(col("node"), col("hub"), coalesce(col("a"), lit(0L)).as("auth"))
  }

  /** HITS hub half-round over the refreshed auth scores, lazy. */
  private[pipeline] def hitsHubStep(
      e: DataFrame, withAuth: DataFrame, broadcastScores: Boolean): DataFrame = {
    def maybeBcast(df: DataFrame): DataFrame =
      if (broadcastScores) broadcast(df) else df
    val hub = e.join(maybeBcast(withAuth.select(col("node").as("dst"), col("auth"))), Seq("dst"))
      .groupBy(col("src")).agg(sum(col("auth")).as("h"))
      .select(col("src").as("h_node"), col("h"))
    withAuth.join(maybeBcast(hub), col("node") === col("h_node"), "left")
      .select(col("node"), coalesce(col("h"), lit(0L)).as("hub"), col("auth"))
  }

  /**
   * Synchronous label propagation (`rounds` rounds) — the linear-time
   * community-detection primitive (Raghavan et al. 2007) over a
   * symmetrized edge set. l₀(v) = v; each round every node adopts the
   * most frequent label among its in-neighbors, ties broken toward the
   * SMALLEST label — fully deterministic, so the DuckDB oracle replays
   * the rounds as unrolled CTEs bit-for-bit (the async/random-order
   * variants of LPA are not oracle-able; synchronous-deterministic is
   * the distributed-engine formulation anyway).
   *
   * Scale shape per round: one src-keyed equi-join of the node-sized
   * label table onto the static edges (label side broadcast under
   * [[BroadcastRankMaxNodes]], partitioned past it), then a two-level
   * map-side-combinable aggregation — count by (dst, label), then
   * argmax via `max(struct(cnt, -label))` (NO window over the joined
   * edge volume: a row_number window would sort every (node, label)
   * group through a single-partition-per-key exchange; the struct-max
   * is a partial-aggregating one-pass argmax with the identical
   * (cnt DESC, label ASC) tie-break). Label state localCheckpoints
   * per round — O(1) lineage, node-sized writes.
   */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "at least one propagation round")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    e.persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val n = nodes.count()
    val bcast = n <= BroadcastRankMaxNodes
    nodes.persist()

    var labels = nodes.withColumn("label", col("node")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val next = lpaStep(e, labels, bcast).localCheckpoint()
      SparkShims.unpersistCheckpoint(labels)
      labels = next
    }
    nodes.unpersist()
    e.unpersist()
    labels
  }

  /** One label-propagation round, lazy (pinnable in GraphAlgosSpec):
    * node-sized label join onto static edges, two-level argmax. */
  private[pipeline] def lpaStep(
      e: DataFrame, labels: DataFrame, broadcastLabels: Boolean): DataFrame = {
    def maybeBcast(df: DataFrame): DataFrame =
      if (broadcastLabels) broadcast(df) else df
    val voted = e.join(
        maybeBcast(labels.select(col("node").as("src"), col("label"))), Seq("src"))
      .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("dst"))
      .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
      .select(col("dst").as("v_node"), (-col("m.nl")).as("v_label"))
    // left join + coalesce: on a symmetrized graph every node is a dst,
    // but the API accepts directed inputs where sinks keep their label
    labels.join(maybeBcast(voted), col("node") === col("v_node"), "left")
      .select(col("node"), coalesce(col("v_label"), col("label")).as("label"))
  }

  /**
   * Degree assortativity (Newman's r): the Pearson correlation of the
   * endpoint degrees over edges — do hubs link to hubs (> 0, social
   * graphs) or to leaves (< 0, web/biology)? The structural dial that
   * predicts whether hub-cap heuristics (link prediction, wedge
   * bounds) will bite.
   *
   * `edges`: undirected, each edge exactly once. With j,k the endpoint
   * degrees and M = |E|:
   *   r = [Sjk/M − (Sd/(2M))²] / [Sd2/(2M) − (Sd/(2M))²]
   * where Sjk = Σ j·k, Sd = Σ (j+k), Sd2 = Σ (j²+k²). All three sums
   * are EXACT INTEGERS (one degree join per side, one map-side-combined
   * agg), so the only doubles are the final divisions — deterministic;
   * gates round to 6. Regular graphs (zero variance) return r = 0.
   *
   * Precondition (shared by [[modularity]] and [[conductance]]): the
   * inputs must be DETERMINISTIC plans — the single-job shape evaluates
   * `edges` in more than one subtree, so a nondeterministic source
   * (sample(), limit over an unordered scan) could present different
   * edge sets to the degree and join passes. Persist such inputs first.
   */
  def assortativity(edges: DataFrame): DataFrame = {
    // single-job shape, deliberately: no persist, no sizing action — the
    // degree subtree and the main join consume the SAME edge plan inside
    // one final aggregation, so ReuseExchange shares the shuffle and AQE
    // picks the degree-join strategy from the actual runtime size (the
    // count()-then-broadcast idiom the iterative algorithms need would
    // add a second full job here for nothing).
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val degrees = e.select(explode(array(col("src"), col("dst"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val out = e
      .join(degrees.select(col("node").as("src"), col("deg").as("j")), Seq("src"))
      .join(degrees.select(col("node").as("dst"), col("deg").as("k")), Seq("dst"))
      .agg(
        count(lit(1)).as("m_edges"),
        sum(col("j") * col("k")).as("sum_jk"),
        sum(col("j") + col("k")).as("sum_deg"),
        sum(col("j") * col("j") + col("k") * col("k")).as("sum_deg2"))
      .withColumn("mean_half",
        col("sum_deg").cast("double") / (col("m_edges") * 2L))
      .withColumn("num",
        col("sum_jk").cast("double") / col("m_edges") - col("mean_half") * col("mean_half"))
      .withColumn("den",
        col("sum_deg2").cast("double") / (col("m_edges") * 2L) - col("mean_half") * col("mean_half"))
      .withColumn("assortativity",
        when(col("den") === 0.0, lit(0.0)).otherwise(col("num") / col("den")))
      .select(col("m_edges"), col("sum_jk"), col("sum_deg"), col("sum_deg2"),
        col("assortativity"))
    out
  }

  /**
   * Conductance of each community in a node partition:
   *   φ(c) = cut(c) / min(vol(c), 2m − vol(c))
   * with cut(c) = edges with exactly one endpoint in c and vol(c) = Σ
   * degree over c's members — modularity's companion dial (modularity
   * rewards dense insides, conductance punishes leaky boundaries; a
   * good community is high-Q AND low-φ). 0 = perfectly sealed,
   * 1 = all-boundary; φ = 0 by convention when min(vol, 2m−vol) = 0.
   *
   * Same plan shape and input contract as [[modularity]] (each edge
   * once, no self-loops; integers exact until the final division) —
   * the two share one tagged-edges pass if the caller reuses the input,
   * and ReuseExchange shares the edge shuffle across the consumers.
   */
  def conductance(edges: DataFrame, communities: DataFrame): DataFrame = {
    // one-shot aggregation: no sizing action — AQE picks the community-
    // join strategy from runtime sizes (see assortativity's comment)
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val comm = communities.select(col("node").cast("long").as("node"),
      col("community").cast("long").as("community"))

    val degrees = e.select(explode(array(col("src"), col("dst"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val vol = degrees.join(comm, Seq("node"))
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("volume"))

    val tagged = e
      .join(comm.select(col("node").as("src"), col("community").as("ca")), Seq("src"))
      .join(comm.select(col("node").as("dst"), col("community").as("cb")), Seq("dst"))
      .filter(col("ca") =!= col("cb"))
    // a cut edge contributes to BOTH endpoint communities' cuts
    val cut = tagged
      .select(explode(array(col("ca"), col("cb"))).as("community"))
      .groupBy(col("community")).agg(count(lit(1)).as("cut_edges"))

    val m = e.agg(count(lit(1)).as("m_edges"))
    vol.join(cut, Seq("community"), "left")
      .withColumn("cut_edges", coalesce(col("cut_edges"), lit(0L)))
      .crossJoin(broadcast(m))
      .withColumn("denom",
        least(col("volume"), col("m_edges") * 2L - col("volume")))
      .withColumn("conductance",
        when(col("denom") === 0L, lit(0.0))
          .otherwise(col("cut_edges").cast("double") / col("denom")))
      .select(col("community"), col("n_nodes"), col("volume"),
        col("cut_edges"), col("m_edges"), col("conductance"))
  }

  /**
   * Newman modularity of a node partition, per community:
   *   Q_c = e_c/m − (d_c/(2m))²   (Q = Σ_c Q_c)
   * where m = |E|, e_c = edges with BOTH endpoints in c, d_c = Σ degree
   * over c's members. The quality dial for any community assignment
   * (LPA labels, attribute partitions, embedding clusters).
   *
   * `edges`: undirected edge list with each edge exactly ONCE (canonical
   * a<b pairs; no self-loops). `communities`: (node, community).
   *
   * Shape: degrees from one explode+groupBy pass; two node-sized
   * community joins (broadcast when the partition table is small, the
   * same size-aware rule as the rank algorithms); per-community partial
   * aggs; m arrives as a broadcast 1-row cross join — no collect, and
   * e_c/d_c/m stay exact integers so the only doubles are the two final
   * divisions (deterministic; gates round to 6).
   */
  def modularity(edges: DataFrame, communities: DataFrame): DataFrame = {
    // NO persist/checkpoint here, deliberately: degrees, intra tagging,
    // and m consume IDENTICAL edge subplans inside ONE final plan, and
    // Catalyst's ReuseExchange shares the join's shuffle output across
    // them — a persist+checkpoint barrier defeats that and measured
    // ~35% SLOWER (2.04 s vs 1.51 s at sf0.1) for the cache-write cost.
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val comm = communities.select(col("node").cast("long").as("node"),
      col("community").cast("long").as("community"))
    // one-shot aggregation: no sizing action either (see assortativity)
    val degrees = e.select(explode(array(col("src"), col("dst"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val commDeg = degrees.join(comm, Seq("node"))
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("degree_sum"))

    val tagged = e
      .join(comm.select(col("node").as("src"), col("community").as("ca")), Seq("src"))
      .join(comm.select(col("node").as("dst"), col("community").as("cb")), Seq("dst"))
    val intra = tagged.filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community")).agg(count(lit(1)).as("intra_edges"))

    val m = e.agg(count(lit(1)).as("m_edges"))
    val out = commDeg.join(intra, Seq("community"), "left")
      .withColumn("intra_edges", coalesce(col("intra_edges"), lit(0L)))
      .crossJoin(broadcast(m))
      .withColumn("contribution",
        col("intra_edges").cast("double") / col("m_edges") -
          (col("degree_sum").cast("double") / (col("m_edges") * 2L)) *
          (col("degree_sum").cast("double") / (col("m_edges") * 2L)))
      .select(col("community"), col("n_nodes"), col("degree_sum"),
        col("intra_edges"), col("m_edges"), col("contribution"))
    out
  }
}
