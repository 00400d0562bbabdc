package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge DataFrames — the web-graph
  * face of a training-data pipeline (domain quality ranking via
  * PageRank, crawl-component discovery, local clustering for spam
  * detection). There is no graph "engine" here: every operator is a
  * loop of keyed joins + aggregates, which is exactly the shape that
  * scales — each iteration is one shuffle on the edge key, partial
  * aggregation map-side, nothing driver-resident but the fixpoint
  * flag and the node count.
  *
  * The fixtures derive a deterministic co-purchase graph from
  * `lineitem` (parts co-occurring in an order), the classic
  * item-item graph; at 100 TB the same operators run on a
  * domain-link graph with billions of edges — edge generation is
  * linear because pairs-per-order is bounded by order width, and
  * every iteration below is a plain shuffle join that AQE can
  * re-plan per round.
  *
  * Numeric discipline for PageRank: per-edge contributions are
  * rounded to 12 decimals and summed as DECIMAL(28,12) — exact,
  * order-independent decimal addition, so results are bit-identical
  * across engines and partitionings (the t29/t30 LM-quantization
  * pattern).
  */
object GraphOps {

  /** Directed co-purchase edges: one row per ordered pair of distinct
    * parts that co-occur in at least `minOrders` orders. Pairs per
    * order are bounded by order width (≤7 in TPC-H), so the self-join
    * is linear in `lineitem`; the groupBy both deduplicates and
    * counts support in one shuffle.
    */
  def copurchaseEdges(lineitem: DataFrame, minOrders: Int = 1): DataFrame = {
    // co-occurrence support is symmetric, so the directed set is the
    // s<d set mirrored — the self-join and the dedup groupBy process
    // half the pair instances of a p≠p formulation
    val u = copurchaseEdgesUndirected(lineitem, minOrders)
    u.unionAll(u.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Undirected (src < dst) variant of [[copurchaseEdges]].
    *
    * Materialized (`localCheckpoint`) before returning: every consumer
    * reads the edge set at least twice (the directed mirror union, the
    * bidirectional union in components/reach, g04's probe selection),
    * and left lazy each read would replay the lineitem self-join +
    * dedup groupBy — the expensive part of every graph query.
    */
  def copurchaseEdgesUndirected(lineitem: DataFrame, minOrders: Int): DataFrame =
    copurchaseBase(lineitem, minOrders).select(col("src"), col("dst"))

  /** The (src < dst, support) co-occurrence base both edge builders
    * share — one self-join + one dedup-and-count groupBy, materialized.
    */
  private def copurchaseBase(lineitem: DataFrame, minOrders: Int): DataFrame = {
    val b = lineitem.select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    b.as("a").join(b.as("b"), col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("src"), col("b.p").as("dst"))
      .agg(count(lit(1)).as("w"))
      .where(col("w") >= minOrders)
      .localCheckpoint(true)
  }

  /** PageRank with damping 0.85 over `edges(src, dst)` restricted to
    * `nodes(node)`, run for exactly `iters` iterations (fixed count —
    * the oracle unrolls the same recurrence). Dangling mass is dropped,
    * the textbook simplification; nodes with no in-edges hold the
    * teleport base. Each iteration is one join edges⋈ranks⋈outdeg
    * (all keyed on src) and one dst-keyed aggregate — two exchanges,
    * both map-side combined.
    *
    * Rank state is FIXED-POINT: a BIGINT in 10⁻¹² units. Per-edge
    * contributions are `(rank_u · 85) div (outdeg · 100)` — pure
    * integer arithmetic, truncating division (operands positive, so
    * Spark's `div` and any floor division agree). Float rounding is
    * never involved, so results are exactly reproducible across
    * engines, partitionings and summation orders; truncation loses at
    * most 10⁻¹² of mass per edge per iteration. (A first formulation
    * quantized doubles with `round(x, 12)` — Spark rounds the shortest
    * decimal repr where DuckDB rounds via a 10¹² multiply, and the two
    * disagreed by 1 ulp on real ranks. Integers close that class, not
    * just that instance.)
    *
    * The node count is the single driver-side scalar (the teleport
    * denominator) — bounded and justified, like the corpus-stats
    * scalars elsewhere.
    */
  val PrScale = 1000000000000L // 10^12 fixed-point units

  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int): DataFrame =
    // the unweighted rank IS the weighted one at w ≡ 1: outw = outdeg
    // and (rank_u·85·1) div (outdeg·100) is the unweighted contrib,
    // integer for integer — one recurrence to maintain, not two
    pageRankWeighted(
      edges.select(col("src"), col("dst")).withColumn("w", lit(1L)),
      nodes, iters)

  /** Directed co-purchase edges carrying their SUPPORT (co-occurrence
    * count) as an integer weight — the weighted-graph input for
    * [[pageRankWeighted]]: [[copurchaseBase]] mirrored (support is
    * symmetric).
    */
  def copurchaseEdgesWeighted(lineitem: DataFrame, minOrders: Int): DataFrame = {
    val u = copurchaseBase(lineitem, minOrders)
    u.unionAll(u.select(col("dst").as("src"), col("src").as("dst"), col("w")))
  }

  /** Support-weighted PageRank: mass flows along each edge in
    * proportion to its integer weight — contrib =
    * (rank_u · 85 · w) div (Σw_out · 100), still pure fixed-point
    * integer arithmetic (see [[pageRank]]'s doc), so weighted
    * results stay bit-reproducible at any partitioning. No overflow:
    * rank_u ≤ 10¹², ×85×w keeps far under 2⁶³ for any realistic
    * support.
    *
    * Edges are RESTRICTED to `nodes` (semi-joins on both endpoints)
    * before iterating — without it an edge head outside the node set
    * would inject a phantom rank row and skew the teleport mass
    * against the documented semantics. The edge list and out-weights
    * materialize ONCE (`localCheckpoint`): left lazy, the
    * edge-derivation subtree is replayed in every iteration's lineage
    * — measured 8.4s → 2.9s at sf0.1. The 100 TB form is the same:
    * persist the edges, iterate over the materialized blocks.
    */
  def pageRankWeighted(edges: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    val nodeSet = nodes.select(col("node")).localCheckpoint(true)
    val n = nodeSet.count()
    require(n > 0, "pageRankWeighted requires a non-empty node set")
    // out-weight is STATIC across iterations — attach it to the edge
    // frame once (guide §2.4: two operations keyed the same way share
    // one exchange) so each iteration pays ONE src-keyed join
    // (edges⋈ranks) instead of two (edges⋈ranks⋈deg). A src-partitioned
    // window sum computes it inside the SAME src exchange the frame
    // needs anyway — no deg join, no second edge-sized checkpoint (the
    // r17 formulation paid both and measured flat). Arithmetic per
    // edge is unchanged, so ranks stay bit-identical.
    val ew = edges.select(col("src"), col("dst"), col("w"))
      .join(nodeSet.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
      .join(nodeSet.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
      .withColumn("outw", sum(col("w")).over(
        Window.partitionBy(col("src"))))
      .localCheckpoint(true)
    val baseU = lit(PrScale * 15L / 100L / n) // 0.15/n in e-12 units
    var ranks = nodeSet.select(col("node"), lit(PrScale / n).as("rank_u"))
    var i = 0
    while (i < iters) {
      val contribs = ew
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"),
          expr("(rank_u * 85L * w) div (outw * 100L)").as("contrib"))
      // a zero row per node replaces a nodes LEFT JOIN: same sums,
      // one exchange per iteration instead of two
      ranks = contribs.select(col("dst").as("node"), col("contrib"))
        .unionAll(nodeSet.select(col("node"), lit(0L).as("contrib")))
        .groupBy(col("node"))
        .agg((baseU + sum(col("contrib"))).as("rank_u"))
      i += 1
    }
    ranks
  }

  /** Personalized PageRank: teleport mass returns to a SEED set
    * instead of spreading uniformly — the recommendation / expansion
    * face of the rank family ("items related to this basket", seed
    * -domain crawl prioritization). Same fixed-point integer
    * discipline as [[pageRank]]; the only structural difference is
    * that the teleport vector is a frame, not a scalar, so each
    * iteration carries one extra (node-keyed, seed-sparse) left join
    * — which is also why this is a separate loop rather than a flag
    * on [[pageRankWeighted]]: the scalar-base loop should not pay
    * that join. Nodes unreachable from the seeds hold exactly 0.
    */
  def pageRankPersonalized(
      edges: DataFrame, nodes: DataFrame, seeds: DataFrame,
      iters: Int): DataFrame = {
    val nodeSet = nodes.select(col("node")).localCheckpoint(true)
    val seedSet = seeds.select(col("node")).localCheckpoint(true)
    val nSeeds = seedSet.count()
    require(nSeeds > 0,
      "pageRankPersonalized requires a non-empty seed set")
    // static out-weight attached once via the src window — see
    // pageRankWeighted
    val ew = edges.select(col("src"), col("dst")).withColumn("w", lit(1L))
      .join(nodeSet.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
      .join(nodeSet.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
      .withColumn("outw", sum(col("w")).over(
        Window.partitionBy(col("src"))))
      .localCheckpoint(true)
    val base = seedSet
      .select(col("node"), lit(PrScale * 15L / 100L / nSeeds).as("base_u"))
      .localCheckpoint(true)
    var ranks = nodeSet
      .join(base, Seq("node"), "left")
      .select(col("node"),
        when(col("base_u").isNotNull, lit(PrScale / nSeeds))
          .otherwise(lit(0L)).as("rank_u"))
    var i = 0
    while (i < iters) {
      val contribs = ew
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"),
          expr("(rank_u * 85L * w) div (outw * 100L)").as("contrib"))
      ranks = contribs.select(col("dst").as("node"), col("contrib"))
        .unionAll(nodeSet.select(col("node"), lit(0L).as("contrib")))
        .groupBy(col("node")).agg(sum(col("contrib")).as("__c"))
        .join(base, Seq("node"), "left")
        .select(col("node"),
          (coalesce(col("base_u"), lit(0L)) + col("__c")).as("rank_u"))
      i += 1
    }
    ranks
  }

  /** Connected components by min-label propagation to fixpoint, capped
    * at `maxRounds` (the oracle unrolls exactly `maxRounds` rounds —
    * once converged further rounds are the identity, so the two agree
    * whenever the graph converges within the cap; the fixture graphs
    * converge in ≤11). Each round is one join + one min-aggregate on
    * the neighbor key. Rounds needed = component eccentricity of its
    * min node — fine for the short-diameter components of co-occurrence
    * and domain graphs; a 2^rounds alternative (large-star/small-star,
    * Kiveris '14) slots into the same loop if diameters grow.
    *
    * `localCheckpoint` truncates the per-round lineage so the fixpoint
    * count doesn't recompute the whole history each round — the same
    * discipline a 1000-executor run needs, where round k's plan must
    * not replay rounds 1..k-1.
    */
  def connectedComponents(edgesUndirected: DataFrame, maxRounds: Int): DataFrame = {
    // materialized once — every round joins against it (see pageRank)
    val both = edgesUndirected.select(col("src"), col("dst"))
      .unionAll(edgesUndirected.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    var labels = both.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    var round = 0
    var changed = true
    while (changed && round < maxRounds) {
      // each node's own label rides the same union as its neighbors' —
      // min(self, neighbors) in ONE keyed aggregate, no left join
      val next = both
        .join(labels.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("label"))
        .unionAll(labels)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .localCheckpoint(true)
      changed = next.as("n").join(labels.as("o"), Seq("node"))
        .where(col("n.label") =!= col("o.label")).limit(1).count() > 0
      labels = next
      round += 1
    }
    labels
  }

  /** Synchronous label propagation (Raghavan et al. 2007) for
    * community detection, run a FIXED `iters` rounds with a total
    * tie rule — each node adopts the most frequent label among its
    * neighbors, ties to the smallest label — so the loop is a pure
    * function of the edge set (no RNG, no visit order), bit-replayable
    * by an oracle that unrolls the same rounds. Communities are the
    * modularity-style refinement of [[connectedComponents]]'s
    * reachability classes: CC answers "same mirror cluster?", LPA
    * answers "same densely-linked neighborhood?" — the link-farm /
    * topic-cluster signal of a crawl-curation pipeline.
    *
    * Per iteration: one keyed join carries labels to neighbors, one
    * map-side-combined (node, label) count, one per-node window rank
    * — the same 2-exchange discipline as [[pageRank]], with
    * `localCheckpoint` truncating the per-round lineage. Synchronous
    * updates can oscillate on bipartite structures; with a fixed
    * iteration count both engines see the SAME oscillation, so
    * determinism survives (convergence is a quality knob here, not a
    * correctness one).
    */
  def labelPropagation(edgesUndirected: DataFrame, iters: Int): DataFrame = {
    val both = edgesUndirected.select(col("src"), col("dst"))
      .unionAll(edgesUndirected.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    var labels = both.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("node"))
      .orderBy(col("cnt").desc, col("label").asc)
    for (_ <- 1 to iters) {
      labels = both
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select(col("node"), col("label"))
        .localCheckpoint(true)
    }
    labels
  }

  /** HITS (Kleinberg 1999) hubs-and-authorities over a DIRECTED
    * edge set, run a fixed `iters` rounds. The two-sided companion
    * to [[pageRank]] — on a bipartite buyer→item graph the hub score
    * grades buyers by the authority of what they buy and the
    * authority score grades items by the hubness of who buys them,
    * the classic recommender/curation mutual refinement (PageRank on
    * a bipartite graph just interleaves the two sides; HITS keeps
    * them separate).
    *
    * Score state is FIXED-POINT BIGINT in 10⁻⁶ units, and the
    * per-round normalization is BY THE MAXIMUM rather than the L2
    * norm: s′ = (s_raw · 10⁶) div max(s_raw) — a positive scalar per
    * round, so the RANKING is identical to the textbook L2 variant
    * while every step stays pure integer arithmetic (the [[pageRank]]
    * determinism discipline: no engine-ordered float sums, no sqrt).
    * The max itself is exact and order-free. The raw·10⁶ product runs
    * in DECIMAL(30,0)·(7,0) → (38,0) so a 10¹⁵-scale raw sum (10⁹
    * in-degree at full scale) cannot overflow; `div` truncates and
    * DuckDB's `//` floors — equal on the all-positive operands.
    *
    * Per round: two keyed joins + two map-side-combined aggregates
    * (one per side) and two 1-row max folds (broadcast) — the
    * two-sided version of the pageRank exchange budget, with
    * `localCheckpoint` truncating each side's lineage. Every src has
    * out-degree ≥ 1 and hubs start positive, so both maxima stay > 0
    * and the divisions are total.
    */
  val HitsScale = 1000000L // 10^6 fixed-point units

  def hits(edges: DataFrame, iters: Int): DataFrame = {
    // iters = 0 would leave the authority side uninitialized (there is
    // no round-0 authority state) and surface as a schema error from
    // the final union — reject the argument loudly instead
    require(iters >= 1, s"hits requires iters >= 1, got $iters")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val norm = expr(
      s"CAST(__raw AS DECIMAL(30,0)) * ${HitsScale}L div CAST(__mx AS DECIMAL(30,0))")
    var hubs = e.select(col("src")).distinct()
      .select(col("src"), lit(HitsScale).as("hub_e6"))
    var auths: DataFrame = e.sparkSession.emptyDataFrame
    var i = 0
    while (i < iters) {
      val araw = e.join(hubs, "src")
        .groupBy(col("dst")).agg(sum(col("hub_e6")).as("__raw"))
        .localCheckpoint(true) // the max fold AND the normalize
      val amax = araw.agg(max(col("__raw")).as("__mx"))
      auths = araw.crossJoin(broadcast(amax))
        .select(col("dst"), norm.as("auth_e6"))
      val hraw = e.join(auths, "dst")
        .groupBy(col("src")).agg(sum(col("auth_e6")).as("__raw"))
        .localCheckpoint(true)
      val hmax = hraw.agg(max(col("__raw")).as("__mx"))
      hubs = hraw.crossJoin(broadcast(hmax))
        .select(col("src"), norm.as("hub_e6"))
      i += 1
    }
    hubs.select(lit("hub").as("role"), col("src").as("node"),
        col("hub_e6").as("score_e6"))
      .unionAll(auths.select(lit("authority").as("role"),
        col("dst").as("node"), col("auth_e6").as("score_e6")))
  }

  /** Per-node triangle count + local clustering coefficient over an
    * undirected (src < dst) edge set. The src<dst orientation
    * enumerates each triangle exactly once as (a<b<c) — a 3-way
    * self-join whose intermediate is bounded by Σ deg(v)² on the
    * *oriented* graph, the standard compact-forward bound; per-node
    * counts come from exploding each triangle into its three corners
    * and aggregating.
    */
  def triangles(edgesUndirected: DataFrame): DataFrame = {
    // the edge set feeds three join branches + the degree count —
    // materialize once (see pageRank)
    val e = edgesUndirected.select(col("src"), col("dst"))
      .localCheckpoint(true)
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.dst") === col("e2.src"))
      .join(e.as("e3"),
        col("e3.src") === col("e1.src") && col("e3.dst") === col("e2.dst"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
    val corners = tri.select(col("a").as("node"))
      .unionAll(tri.select(col("b").as("node")))
      .unionAll(tri.select(col("c").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    val deg = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    // clustering in fixed-point nano-units (truncating div — operands
    // positive), rendered as u/1e9: round(double, 9) is the 1-ulp
    // cross-engine divergence class g01/q117 document, closed the same
    // way here
    deg.join(corners, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("clustering",
        when(col("degree") >= 2,
          expr("(triangles * 2000000000L) div (degree * (degree - 1))")
            .cast("double") / lit(1000000000.0))
          .otherwise(lit(0.0)))
  }

  /** HyperBall (Boldi–Vigna '13) with KMV counters instead of HLL:
    * the neighborhood function for EVERY node simultaneously — per
    * node a mergeable k-min-hash sketch of its closed h-ball, updated
    * per hop by merging each node's counter with its neighbors'.
    * Per-hop cost is O(|E|·k) counter traffic regardless of ball
    * sizes, where exact expansion ([[khopReach]]) pays Σ|ball| —
    * quadratic on a well-connected graph. This is the scale path to
    * khopReach's correctness baseline, the s01↔s02 relationship.
    *
    * KMV (not HLL) because the sketch is a SET FUNCTION of the ball:
    * the k smallest distinct hashes of a union are the k smallest of
    * the merged k-smallest sets, so the iterated merge equals the
    * k-min of the exact ball — which is what lets the DuckDB oracle
    * replay the estimate from exact balls and hash-match it, proving
    * the mergeable-counter iteration implements the set semantics
    * (the q86/q96 mergeable-sketch identity on a graph recursion).
    * Estimates are exact below k distinct members.
    */
  def hyperballReach(edgesUndirected: DataFrame, maxHops: Int, k: Int): DataFrame = {
    import graft.functions.KmvSketch
    val both = edgesUndirected.select(col("src"), col("dst"))
      .unionAll(edgesUndirected.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    var counters = both.select(col("src").as("node")).distinct()
      .select(col("node"), array(KmvSketch.hash64(col("node"))).as("ctr"))
      .localCheckpoint(true)
    def est = when(size(col("ctr")) < k, size(col("ctr")).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble) * lit(KmvSketch.TwoPow60)
        / element_at(col("ctr"), k).cast("double")).cast("long"))
    val out = Seq.newBuilder[DataFrame]
    var h = 1
    while (h <= maxHops) {
      val contrib = counters.select(col("node"), explode(col("ctr")).as("h"))
        .unionAll(both
          .join(counters.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"), explode(col("ctr")).as("h")))
      counters = contrib.groupBy(col("node"))
        .agg(KmvSketch.kmvHashes(col("h"), k).as("ctr"))
        .localCheckpoint(true)
      out += counters.select(col("node"), lit(h).as("hop"), est.as("n_ball_est"))
      h += 1
    }
    out.result().reduce(_ unionAll _)
  }

  /** Exact k-hop reach from a probe set: for each probe, the number of
    * distinct nodes within ≤h hops (self excluded), h = 1..maxHops.
    * Each hop is frontier⋈edges + distinct — the multi-source BFS
    * whose 100 TB form caps the frontier (or switches to HyperBall
    * KMV/HLL counters, [[hyperballReach]]) once reach saturates;
    * exact expansion is the correctness baseline those sketches are
    * judged against.
    */
  def khopReach(edgesUndirected: DataFrame, probes: DataFrame, maxHops: Int): DataFrame = {
    // materialized once — each hop joins the frontier against it
    val both = edgesUndirected.select(col("src"), col("dst"))
      .unionAll(edgesUndirected.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    var reach = probes.select(col("probe"), col("probe").as("node"))
      .localCheckpoint(true)
    val out = Seq.newBuilder[DataFrame]
    var h = 1
    while (h <= maxHops) {
      // checkpoint per hop: reach is referenced twice (self ∪ its own
      // expansion), so a lazy plan doubles every hop — exponential in
      // maxHops, the same lineage discipline as connectedComponents
      reach = reach
        .unionAll(reach.join(both, reach("node") === both("src"))
          .select(col("probe"), col("dst").as("node")))
        .distinct()
        .localCheckpoint(true)
      out += reach.where(col("node") =!= col("probe"))
        .groupBy(col("probe")).agg(count(lit(1)).as("n_reached"))
        .select(col("probe"), lit(h).as("hop"), col("n_reached"))
      h += 1
    }
    out.result().reduce(_ unionAll _)
  }

  /** k-core decomposition (coreness per node) of an undirected edge
    * set by the distributed H-INDEX iteration (Lü, Chen, Ren, Zhang,
    * Zhang & Zhou, "Vital nodes identification in complex networks",
    * and the h-index convergence result of Lü et al. 2016, public
    * literature): h₀(v) = degree(v); each round h(v) ← H-index of the
    * neighbors' current h values (the largest k with ≥ k neighbors at
    * h ≥ k); the fixpoint IS the peeling coreness. Coreness is the
    * graph-curation signal the family lacked: the dense core a
    * link-spam cluster forms survives k-core peeling long after
    * organic tree-ish link mass is stripped (g03's triangles are the
    * local version; coreness is the global one).
    *
    * Per round: one keyed join carries h to neighbors, one per-node
    * window ranks them (keyed by the data-scale node id), one
    * map-side-combined max — the g02 two-exchange discipline, h
    * monotonically non-increasing integers, so the result is exactly
    * reproducible at any partitioning (ties inside the window leave
    * the H-index invariant: equal values occupy contiguous ranks and
    * the count of positions with value ≥ rank does not depend on
    * their order). Iterates to fixpoint with early exit, capped at
    * `maxRounds` (the oracle unrolls exactly that many rounds; once
    * converged every extra round is the identity — the g02
    * CcRounds contract, convergence spec-asserted at fixture scale:
    * 21/10/5 rounds at sf 0.001/0.01/0.1).
    *
    * Returns (node, coreness, degree).
    */
  def coreness(edgesUndirected: DataFrame, maxRounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val both = edgesUndirected.select(col("src"), col("dst"))
      .unionAll(edgesUndirected.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    val deg = both.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("degree"))
      .localCheckpoint(true)
    var h = deg.select(col("node"), col("degree").as("h"))
      .localCheckpoint(true)
    var round = 0
    var changed = true
    while (changed && round < maxRounds) {
      val nb = both
        .join(h.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("h").as("__nh"))
      val w = Window.partitionBy(col("node")).orderBy(col("__nh").desc)
      val next = h.select(col("node"))
        .join(nb.withColumn("__rn", row_number().over(w))
            .where(col("__nh") >= col("__rn"))
            .groupBy(col("node")).agg(max(col("__rn")).as("h")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("h"), lit(0L)).cast("long").as("h"))
        .localCheckpoint(true)
      changed = next.as("n").join(h.as("o"), Seq("node"))
        .where(col("n.h") =!= col("o.h")).limit(1).count() > 0
      h = next
      round += 1
    }
    h.join(deg, Seq("node"))
      .select(col("node"), col("h").as("coreness"), col("degree"))
  }

  /** Multi-source single-source-shortest-paths over a WEIGHTED
    * undirected edge set — synchronous Bellman–Ford relaxation
    * (every edge relaxes every round; the classic distributed SSSP,
    * and the weighted complement of [[khopReach]]'s hop counting):
    * state is (probe, node, dist) with EXACT BIGINT costs, each round
    * one keyed join carrying dist+cost along edges and one
    * map-side-combined min — the g02 two-exchange discipline, so the
    * frontier is bit-reproducible at any partitioning. Unreachable
    * (probe, node) pairs simply never materialize a row. Iterates to
    * fixpoint with early exit, capped at `maxRounds` (the oracle
    * unrolls exactly that many rounds; past the fixpoint every round
    * is the identity — the g02 CcRounds contract; measured 4/11/5
    * rounds at sf 0.001/0.01/0.1, convergence spec-asserted).
    *
    * `edges(src, dst, cost)` is treated as undirected (mirrored
    * internally). No overflow: cost ≤ 10⁶ per edge and paths are
    * node-bounded, so dist stays far under 2⁶³.
    */
  def shortestPaths(edges: DataFrame, probes: DataFrame,
      maxRounds: Int): DataFrame = {
    val both = edges.select(col("src"), col("dst"), col("cost"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst"),
        col("cost")))
      .localCheckpoint(true)
    var dist = probes.select(col("probe"), col("probe").as("node"),
      lit(0L).as("dist")).localCheckpoint(true)
    var round = 0
    var changed = true
    while (changed && round < maxRounds) {
      val next = both
        .join(dist.withColumnRenamed("node", "src"), "src")
        .select(col("probe"), col("dst").as("node"),
          (col("dist") + col("cost")).as("dist"))
        .unionAll(dist.select(col("probe"), col("node"), col("dist")))
        .groupBy(col("probe"), col("node"))
        .agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
      changed = next.as("n")
        .join(dist.as("o"), Seq("probe", "node"), "left")
        .where(col("o.dist").isNull || col("n.dist") =!= col("o.dist"))
        .limit(1).count() > 0
      dist = next
      round += 1
    }
    dist
  }

  /** DIRECTED sequence edges from `lineitem`: src part immediately
    * followed by dst part within an order (consecutive `l_linenumber`
    * positions), each src keeping only its `topK` most-frequent
    * followers (support DESC, dst ASC tie-break). The asymmetric
    * top-K cut is what makes the graph genuinely DIRECTED — the
    * co-purchase builders are symmetric by construction, so their
    * SCCs degenerate to connected components. Out-degree ≤ topK keeps
    * the edge set linear in the part domain at any corpus size; the
    * sequence window is per-order (bounded width), the support
    * aggregate map-side combined, the top-K cut one window keyed by
    * the data-scale src.
    *
    * Determinism: the fixture's (l_orderkey, l_linenumber) is NOT
    * unique (≈20% duplicated keys), so ordering by l_linenumber alone
    * leaves LEAD nondeterministic — measured: three runs, three edge
    * sets. The window orders by (l_linenumber, l_partkey), a key on
    * which any remaining ties are FULL duplicates of the projected
    * row, so every permutation yields the identical follower
    * sequence. The oracle states the same two-column ORDER BY.
    */
  def sequenceTopFollowerEdges(lineitem: DataFrame, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wSeq = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"))
    val pair = lineitem
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
      .withColumn("__nxt", lead(col("l_partkey"), 1).over(wSeq))
      .where(col("__nxt").isNotNull && col("__nxt") =!= col("l_partkey"))
      .select(col("l_partkey").as("src"), col("__nxt").as("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
    val wTop = Window.partitionBy(col("src"))
      .orderBy(col("w").desc, col("dst").asc)
    pair.withColumn("__rn", row_number().over(wTop))
      .where(col("__rn") <= topK)
      .select(col("src"), col("dst"))
      .localCheckpoint(true) // every consumer iterates over it
  }

  /** Strongly connected components of a DIRECTED `edges(src, dst)`
    * set — the spider-trap / mirror-ring detector the undirected
    * [[connectedComponents]] cannot express (every real link graph is
    * directed; an undirected CC merges a one-way citation chain into
    * one "component").
    *
    * Algorithm — min-label settle rounds, each round two simultaneous
    * fixpoint propagations over the ACTIVE subgraph:
    * f(v) = min(ancestors(v) ∪ {v}), b(v) = min(descendants(v) ∪ {v}).
    * Within one SCC every member has the SAME ancestor and descendant
    * sets, so f and b are SCC-uniform; f(v) = b(v) = u implies u is
    * both an ancestor and a descendant of v — u ∈ SCC(v) — and since
    * u minimizes ancestors ∪ self ⊇ SCC(v), u IS the SCC's min label:
    * settled nodes get exactly the canonical min-member id. The
    * active-subgraph's global min always settles (f = b = itself), so
    * every round retires ≥ 1 whole SCC; removal is sound because any
    * path witnessing mutual reachability between two active nodes
    * lies entirely inside their own SCC (each intermediate node is
    * mutually reachable with both endpoints), never through a settled
    * one. Empirically the fixture graphs settle in 5/6/9 outer rounds
    * at sf 0.001/0.01/0.1 (the verdict-grade convergence measurement
    * lives in GraphSpec); both caps FAIL LOUDLY when exceeded — the
    * BhMaxM discipline — rather than return a wrong partition.
    *
    * A trim prepass runs first: nodes with zero in- or out-degree lie
    * on no cycle, so they are peeled iteratively as singleton SCCs
    * (Tarjan's "trivial SCC" observation) before any propagation —
    * on real digraphs the acyclic tail is most of the graph, and a
    * peel round costs two semi-joins instead of a settle round's
    * full fixpoint.
    *
    * Scale shape: state is (node, f, b) BIGINTs; each propagation
    * round is two keyed joins + one map-side-combined min aggregate
    * (batched `innerStride` rounds per materialization to amortize
    * job launch); min-folds are order-free, so the result is
    * bit-reproducible at any partitioning — the g02 discipline. No
    * driver state beyond the fixpoint flag.
    */
  def stronglyConnectedComponents(edges0: DataFrame,
      maxOuter: Int = 16, maxInner: Int = 36): DataFrame = {
    // 2 propagation rounds per materialized job: each round references
    // the state frame THREE times (f-join, b-join, self-union), so a
    // stride-s lazy plan has 3^s state leaves — stride 7 measured 413s
    // at sf0.001 (analysis/codegen explosion) vs 21.5s at stride 2;
    // stride 1 doubles the job count for no plan saving
    val innerStride = 2
    var active = edges0.select(col("src"), col("dst")).localCheckpoint(true)
    var nodes = active.select(col("src").as("node"))
      .unionAll(active.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    var result = nodes.select(col("node"), col("node").as("scc_id"))
      .where(lit(false)).localCheckpoint(true)
    // Trim prepass: a node with zero in-degree or zero out-degree in
    // the active subgraph lies on no cycle — it is its own singleton
    // SCC (label = itself = its min member, matching the settle
    // loop's labeling). Peel such nodes iteratively (each peel can
    // expose new trivial nodes) BEFORE the settle loop: on real link
    // graphs the acyclic tail is the bulk of the node set, and one
    // peel round is two semi-joins vs the settle loop's O(diameter)
    // propagation. The cap only stops peeling — leftovers settle
    // correctly in the main loop — so it never needs to fail loudly.
    var nNodes = nodes.count()
    var trim = 0
    var peeled = true
    while (peeled && trim < 24 && nNodes > 0L) {
      trim += 1
      val cyclic = active.select(col("src").as("node")).distinct()
        .join(active.select(col("dst").as("node")).distinct(),
          Seq("node"), "left_semi")
      val remain = nodes.join(cyclic, Seq("node"), "left_semi")
        .localCheckpoint(true)
      val nRemain = remain.count()
      if (nRemain == nNodes) peeled = false
      else {
        val trivial = nodes.join(remain, Seq("node"), "left_anti")
        result = result.unionAll(
          trivial.select(col("node"), col("node").as("scc_id")))
        nodes = remain
        active = active
          .join(remain.select(col("node").as("src")), Seq("src"), "left_semi")
          .join(remain.select(col("node").as("dst")), Seq("dst"), "left_semi")
          .select(col("src"), col("dst"))
          .localCheckpoint(true)
        nNodes = nRemain
      }
    }
    var outer = 0
    while (nodes.limit(1).count() > 0) {
      outer += 1
      require(outer <= maxOuter,
        s"scc: settle rounds exceeded maxOuter=$maxOuter — raise the cap")
      var st = nodes
        .select(col("node"), col("node").as("f"), col("node").as("b"))
        .localCheckpoint(true)
      // one propagation round, composed lazily: min(f) arrives along
      // in-edges, min(b) along out-edges, self rides the union — ONE
      // keyed aggregate, the connectedComponents shape done twice-in-one
      def propagate(s: DataFrame): DataFrame = {
        val nullL = lit(null).cast(s.schema("f").dataType)
        active.join(s.select(col("node").as("src"), col("f")), "src")
          .select(col("dst").as("node"), col("f"), nullL.as("b"))
          .unionAll(
            active.join(s.select(col("node").as("dst"), col("b")), "dst")
              .select(col("src").as("node"), nullL.as("f"), col("b")))
          .unionAll(s.select(col("node"), col("f"), col("b")))
          .groupBy(col("node")).agg(min(col("f")).as("f"),
            min(col("b")).as("b"))
      }
      var inner = 0
      var changed = true
      while (changed) {
        inner += innerStride
        require(inner <= maxInner + innerStride,
          s"scc: propagation exceeded maxInner=$maxInner — raise the cap")
        // stride rounds per materialization: propagation past the
        // fixpoint is the identity, so overshooting inside a stride is
        // harmless and the change check runs once per stride
        val next = (1 to innerStride).foldLeft(st)((s, _) => propagate(s))
          .localCheckpoint(true)
        changed = next.as("n").join(st.as("o"), Seq("node"))
          .where(col("n.f") =!= col("o.f") || col("n.b") =!= col("o.b"))
          .limit(1).count() > 0
        st = next
      }
      val settled = st.where(col("f") === col("b"))
        .select(col("node"), col("f").as("scc_id"))
      // st is checkpointed, so the growing union stays shallow (≤
      // maxOuter branches over materialized leaves) — no per-round
      // checkpoint needed on the accumulator
      result = result.unionAll(settled)
      nodes = st.where(col("f") =!= col("b")).select(col("node"))
        .localCheckpoint(true)
      active = active
        .join(nodes.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(nodes.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint(true)
    }
    result
  }
}
