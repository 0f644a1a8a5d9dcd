package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components (EXT,
  * SURVEY.md §2.14): weighted PageRank over an edge list — the
  * link-quality signal web-corpus pipelines use to weight training
  * documents (Common-Crawl-style harmonic/PageRank centrality).
  *
  * Scale design (100 TB stance):
  *  - one rank iteration = ONE equi-join shuffle of the edge list with
  *    the (much smaller) rank relation on src, then a hash aggregate on
  *    dst — the canonical distributed PageRank round, O(|E|) shuffled
  *    rows per round, never O(N²);
  *  - transition probabilities (w / out-weight) are materialized ONCE
  *    before iterating, so the per-round join carries a single double
  *    per edge;
  *  - the two per-round scalars (node count, dangling mass) stay
  *    IN-PLAN as one-row broadcast cross joins (q46's scalar-subquery
  *    class) — no driver collect inside the loop, the whole ladder
  *    stays one lazy plan;
  *  - a fixed iteration count keeps lineage bounded (3 rounds ≈ the
  *    corpus-weighting use case); an unbounded convergence loop would
  *    localCheckpoint per round like [[NearDup.connectedComponents]];
  *  - each round's ranks are rounded to 12 decimals: float summation
  *    order differs across engines/partitionings by last-ulp amounts,
  *    and re-rounding every round stops drift compounding, so any
  *    engine recomputing the ladder lands on identical keys.
  */
object Graph {

  /** Weighted PageRank with dangling-mass redistribution.
    *
    * r₀(v) = 1/N;  r_{k+1}(v) = (1−d)/N + d·(Σ_{u→v} r_k(u)·w/out(u)
    * + dangling_k/N), where dangling_k = Σ r_k over nodes with no
    * out-edges. Returns (id, rank) — rank rounded to 12 dp per round.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               wCol: String, iters: Int = 3,
               damping: Double = 0.85): DataFrame = {
    // Checkpoint the EDGE relation once (r13, guide §5/§7.2 lineage
    // truncation): the unrolled ladder references it (via nodes/outw/
    // trans) several times per round, and each round doubles the
    // references to ranks(i−1), so without the cut the CALLER's whole
    // edge-construction subtree (q113/q322: events scan + lag window +
    // groupBy) replays exponentially — the captured q113 plan carried
    // 162 parquet scans / 544 Exchanges for iters=3. One cut at e is
    // enough: everything past it is an O(|V|)-row join ladder whose
    // replays are cheap and partially deduped by exchange reuse;
    // checkpointing every round was measured SLOWER at harness scale
    // (per-job scheduling floor × rounds beats the saved tiny joins).
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).cast("double").as("w"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst"))).distinct()
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    // per-edge transition probability, computed once and reused by
    // every round (at scale: persist + pre-partition by src)
    val trans = e.join(outw, Seq("src"))
      .select(col("src"), col("dst"), (col("w") / col("ow")).as("p"))
    val nn = nodes.agg(count(lit(1)).cast("double").as("n_nodes"))
    var ranks = nodes.crossJoin(broadcast(nn))
      .select(col("id"), round(lit(1.0) / col("n_nodes"), 12).as("r"))
    for (_ <- 1 to iters) {
      val contrib = trans.join(ranks, trans("src") === ranks("id"))
        .groupBy(col("dst")).agg(sum(col("r") * col("p")).as("c"))
      val dangling = ranks
        .join(outw, ranks("id") === outw("src"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0.0)).as("dm"))
      ranks = nodes
        .join(contrib, nodes("id") === contrib("dst"), "left").drop("dst")
        .crossJoin(broadcast(nn)).crossJoin(broadcast(dangling))
        .select(col("id"),
          round(lit(1.0 - damping) / col("n_nodes") +
            lit(damping) * (coalesce(col("c"), lit(0.0)) +
              col("dm") / col("n_nodes")), 12).as("r"))
    }
    ranks
  }

  /** HITS hubs & authorities by unrolled power iteration on the
    * DISTINCT directed edge set, L1-normalized each half-step and
    * rounded to 12 dp (q113 pageRank's cross-engine float discipline:
    * the in-neighbor SUM is partition-order dependent, so both engines
    * re-align on the rounded values before the next round). Each round
    * is two edge⋈score equi-joins + two O(1) normalization scalars —
    * O(|E|) per round over a checkpointed edge list (r13): the
    * within-round fan-out (auth/hub each referenced several times)
    * compounds across rounds, so the one cut at e keeps every replay
    * an O(|V|)-row join instead of the caller's full edge build.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 2): DataFrame = {
    // Checkpoint the edge relation once (r13, guide §5/§7.2): auth is
    // referenced by hRaw, hub and the round's final scores join —
    // without the cut the within-round fan-out compounds across rounds
    // and replays the CALLER's event-transition subtree per reference
    // (captured q304 plan: 452 parquet scans / 1502 Exchanges for
    // iters=2). Value-neutral.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst"))).distinct()
    val nn = nodes.agg(count(lit(1)).cast("double").as("n_nodes"))
    var scores = nodes.crossJoin(broadcast(nn))
      .select(col("id"), round(lit(1.0) / col("n_nodes"), 12).as("hub"),
        round(lit(1.0) / col("n_nodes"), 12).as("auth"))
    for (_ <- 1 to iters) {
      val aRaw = e.join(scores.select(col("id"), col("hub")),
          e("src") === col("id"))
        .groupBy(col("dst")).agg(sum(col("hub")).as("ar"))
      val aNorm = aRaw.agg(sum(col("ar")).as("asum"))
      val auth = nodes
        .join(aRaw, nodes("id") === aRaw("dst"), "left").drop("dst")
        .crossJoin(broadcast(aNorm))
        .select(col("id"),
          round(coalesce(col("ar"), lit(0.0)) / col("asum"), 12)
            .as("auth"))
      val hRaw = e.join(auth.select(col("id").as("aid"), col("auth")),
          e("dst") === col("aid"))
        .groupBy(col("src")).agg(sum(col("auth")).as("hr"))
      val hNorm = hRaw.agg(sum(col("hr")).as("hsum"))
      val hub = nodes
        .join(hRaw, nodes("id") === hRaw("src"), "left").drop("src")
        .crossJoin(broadcast(hNorm))
        .select(col("id"),
          round(coalesce(col("hr"), lit(0.0)) / col("hsum"), 12)
            .as("hub"))
      scores = hub.join(auth.withColumnRenamed("id", "aid"),
          hub("id") === col("aid"))
        .select(col("id"), col("hub"), col("auth"))
    }
    scores
  }

  /** Event-stream transition edges: consecutive events per `keyCol`
    * (ordered by `orderCols`, which must be a total order) become
    * (prev node → node) edges with transition counts; self-loops drop.
    * The lag window shuffles once on the entity key — the same
    * partitioning sessionization uses.
    */
  def transitionEdges(events: DataFrame, keyCol: Column, nodeCol: Column,
                      orderCols: Column*): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    events.select(nodeCol.as("dst_node"), lag(nodeCol, 1).over(w).as("src_node"))
      .filter(col("src_node").isNotNull && col("src_node") =!= col("dst_node"))
      .groupBy(col("src_node").as("src"), col("dst_node").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** Synchronous weighted label propagation (Raghavan et al. 2007) —
    * community detection for source/domain clustering: every node
    * starts as its own label; each round it adopts the label with the
    * highest total edge weight among its neighbors (ties → smallest
    * label, so rounds are DETERMINISTIC — the async/random variant is
    * not oracle-able). A fixed round count bounds lineage; each round
    * is ONE edge⋈labels equi-join + one (node, label) vote aggregate +
    * one argmax window — all O(|E|) shuffled rows, the PageRank cost
    * shape — and the label frame localCheckpoints per round (the q69
    * discipline) so round r never replays rounds 1..r−1. Integer vote
    * weights keep every argmax exact on any engine.
    */
  def labelPropagation(edges: DataFrame, aCol: String, bCol: String,
                       wCol: String, rounds: Int): DataFrame = {
    // checkpoint the symmetrized edge list ONCE: every round joins it,
    // and without the cut each round would replay the whole upstream
    // edge-construction pipeline (profiled 19 s → 6 s on the q183
    // co-purchase graph, whose pair join dominates)
    val e = edges.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst"),
          col(wCol).as("w")),
        struct(col(bCol).as("src"), col(aCol).as("dst"),
          col(wCol).as("w")))).as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst"),
        col("p.w").as("w"))
      .localCheckpoint(true)
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val votes = e
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src"), col("label")).agg(sum(col("w")).as("wv"))
      // argmax as ONE hash aggregate instead of a rank window: max_by
      // over (wv, -label) picks the highest vote with ties to the
      // SMALLEST label (same total order as the previous
      // row_number(wv desc, label asc) spelling — measured ~25% off
      // the per-round cost by replacing the window's sort with a
      // partial+final hash agg that map-side combines)
      labels = votes.groupBy(col("src"))
        .agg(max_by(col("label"),
          struct(col("wv"), (-col("label")).as("nl"))).as("label"))
        .select(col("src").as("node"), col("label"))
        .localCheckpoint(true)
    }
    labels
  }

  /** Exact per-node triangle counts over an undirected edge list — the
    * clustering/community-density signal (spam farms are triangle-poor,
    * organic link neighborhoods triangle-rich). Edges canonicalize to
    * (a < b) and dedup first, so the enumeration is the standard
    * ordered-wedge plan: E ⋈ E on the middle vertex yields wedges
    * x < y < z (the ordering is FREE because both joined copies are
    * already a < b — each triangle forms exactly one ordered wedge),
    * then one equi-join against E on (x, z) closes them. Two shuffles
    * total, both O(|wedges|); no node ever compares against the whole
    * graph. This id-ordered form is the oracle-portable ENUMERATION
    * BASELINE — its wedge frontier is quadratic in a low-id hub's
    * degree; [[triangleCountsDegreeOriented]] is the hub-robust
    * production form (same counts, frontier bounded by arboricity).
    * Returns (node, n_triangles), nodes in ≥1 triangle only.
    */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val tris = e.toDF("x", "y").join(e.toDF("y", "z"), Seq("y"))
      .join(e.toDF("x", "z"), Seq("x", "z"))
    tris.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }

  /** Degree-oriented exact triangle counts — the hub-robust production
    * form of [[triangleCounts]]: orient every undirected edge toward
    * its HIGHER-(degree, id) endpoint, enumerate wedges only between
    * out-neighbor pairs, close with one equi-join on the oriented edge.
    * The (degree, id) total order makes the orientation acyclic, so
    * each triangle still forms exactly one wedge at its lowest-rank
    * corner — identical counts to the id-ordered form (q179's oracle
    * proves the equality through the gate). What changes is the BOUND:
    * a node's out-degree under degree orientation is O(sqrt(|E|))
    * (each out-neighbor has rank ≥ the node's, and there can only be
    * 2·sqrt(|E|) nodes of degree ≥ sqrt(|E|)), so wedge fanout is
    * O(|E|^1.5) worst-case / O(|E|·arboricity) in general, where the
    * id-ordered form is quadratic in a hub's degree: a d-star whose
    * center draws the LOW id enumerates d·(d−1)/2 id-ordered wedges
    * but ZERO degree-oriented ones (GraphSpec pins this). Cost: one
    * extra degree aggregate + broadcast-or-shuffle join before the
    * same two wedge-bounded equi-joins.
    */
  def triangleCountsDegreeOriented(edges: DataFrame, aCol: String,
                                   bCol: String): DataFrame = {
    val tris = orientedWedges(edges, aCol, bCol, byDegree = true)
    tris.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }

  /** Closed wedges (= triangles, one row per triangle) under the chosen
    * edge orientation; factored out so the spec can count the OPEN
    * wedge frontier each orientation enumerates. Returns (u, v, w)
    * with u the wedge corner.
    */
  private[graft] def orientedWedges(edges: DataFrame, aCol: String,
                                    bCol: String,
                                    byDegree: Boolean): DataFrame = {
    val eor = orientEdges(edges, aCol, bCol, byDegree)
    openWedges(eor)
      .join(eor.select(col("src").as("v"), col("dst").as("w")),
        Seq("v", "w"))
  }

  /** The open-wedge relation (u, v, w, rv, rw): out-neighbor pairs of
    * each node under the orientation, BEFORE the closing join — its
    * cardinality is the quantity degree orientation exists to bound.
    */
  private[graft] def openWedges(eor: DataFrame): DataFrame =
    eor.select(col("src").as("u"), col("dst").as("v"), col("rdst").as("rv"))
      .join(eor.select(col("src").as("u"), col("dst").as("w"),
        col("rdst").as("rw")), Seq("u"))
      .filter(col("rv") < col("rw"))

  /** Canonicalize + orient an undirected edge list: dedup to a < b,
    * then point each edge at its higher-rank endpoint where rank =
    * (degree, id) when `byDegree` (struct comparison is lexicographic,
    * so ties break by id and the order is total) or plain id otherwise.
    * Carries the dst rank so wedge enumeration can order out-neighbor
    * pairs without re-joining degrees.
    */
  private[graft] def orientEdges(edges: DataFrame, aCol: String,
                                 bCol: String,
                                 byDegree: Boolean): DataFrame = {
    val e0 = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    if (!byDegree)
      // id order: rank(x) = x, already a < b (no checkpoint: this
      // plan references e exactly as often as the old inline form)
      e0.select(col("a").as("src"), col("b").as("dst"),
        col("b").as("rdst"))
    else {
      // checkpoint BOTH the canonical edge list and the oriented
      // result (the labelPropagation discipline, ext/Graph.scala
      // labelPropagation): the degree path references e three times
      // (degree aggregate + two rank joins) and the caller references
      // the oriented edges three more (two wedge legs + the closing
      // join) — without the cuts an expensive upstream edge
      // construction (q179's basket self-join + p95 threshold) re-runs
      // per reference (measured: 10.9 s vs 3.9 s for the id form at
      // sf0.1; with the cuts the orientation overhead is one degree
      // aggregate + join on the materialized ~5%-dense edge list)
      val e = e0.localCheckpoint(true)
      val deg = e.select(col("a").as("node"))
        .unionByName(e.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val ranked = e
        .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
        .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
        .select(col("a"), col("b"),
          struct(col("da").as("d"), col("a").as("i")).as("ra"),
          struct(col("db").as("d"), col("b").as("i")).as("rb"))
      ranked.select(
        when(col("ra") < col("rb"), col("a")).otherwise(col("b")).as("src"),
        when(col("ra") < col("rb"), col("b")).otherwise(col("a")).as("dst"),
        when(col("ra") < col("rb"), col("rb")).otherwise(col("ra")).as("rdst"))
        .localCheckpoint(true)
    }
  }

  /** Personalized PageRank (r7) — topic-sensitive ranking: restart
    * mass returns to a SEED set (uniform 1/|S| over seeds, 0
    * elsewhere) instead of the whole graph, so rank concentrates in
    * the seeds' neighborhood — the graph-proximity scorer behind
    * seed-based corpus curation ("find documents/users near this
    * trusted set"). Same damped power-iteration ladder as [[pageRank]]
    * (per-edge transition probs computed once; dangling mass returns
    * to the seeds; round-12 between rounds so float summation order
    * can't compound); seeds outside the graph are ignored. Scale: per
    * round one keyed join + aggregate, O(|E|) — identical to pageRank.
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String,
      dstCol: String, wCol: String, seeds: DataFrame, seedCol: String,
      iters: Int = 2, damping: Double = 0.85): DataFrame = {
    // Same lineage-truncation discipline as [[pageRank]] (r13, guide
    // §5/§7.2): ONE cut at the edge relation keeps the unrolled ladder's
    // replays O(|V|)-cheap instead of replaying the caller's edge build
    // (captured q322 plan before: 214 parquet scans / 668 Exchanges).
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).cast("double").as("w"))
      .localCheckpoint(true)
    personalizedPageRankPrecut(e, seeds, seedCol, iters, damping)
  }

  /** [[personalizedPageRank]] body over an ALREADY-CUT (src, dst, w)
    * edge relation (r14, ADVICE-r13): a caller that has localCheckpointed
    * its edges for its own derivations (q322's seed set) calls this so
    * the frame isn't copied into the block manager a SECOND time — the
    * cheap projection over the caller's LogicalRDD replays per reference
    * instead. `w` may be any numeric type; it is cast here.
    */
  private[graft] def personalizedPageRankPrecut(edges: DataFrame,
      seeds: DataFrame, seedCol: String,
      iters: Int, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst"),
      col("w").cast("double").as("w"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst"))).distinct()
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    val trans = e.join(outw, Seq("src"))
      .select(col("src"), col("dst"), (col("w") / col("ow")).as("p"))
    val sd = seeds.select(col(seedCol).as("id")).distinct()
      .join(nodes, Seq("id"), "left_semi")
    val ns = sd.agg(count(lit(1)).cast("double").as("n_seeds"))
    // restart vector: 1/|S| on seeds, 0 elsewhere — carried alongside
    // the rank so every round's spelling stays one keyed join
    val base = nodes
      .join(sd.withColumn("__seed", lit(1)), Seq("id"), "left")
      .crossJoin(broadcast(ns))
      .select(col("id"),
        when(col("__seed").isNotNull,
          round(lit(1.0) / col("n_seeds"), 12)).otherwise(lit(0.0)).as("s"))
    var ranks = base.select(col("id"), col("s").as("r"))
    for (_ <- 1 to iters) {
      val contrib = trans.join(ranks, trans("src") === ranks("id"))
        .groupBy(col("dst")).agg(sum(col("r") * col("p")).as("c"))
      val dangling = ranks
        .join(outw, ranks("id") === outw("src"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0.0)).as("dm"))
      ranks = base
        .join(contrib, base("id") === contrib("dst"), "left").drop("dst")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          round(lit(1.0 - damping) * col("s") +
            lit(damping) * (coalesce(col("c"), lit(0.0)) +
              col("dm") * col("s")), 12).as("r"))
    }
    ranks
  }

  /** Per-round BFS telemetry: hop index, frontier size (nodes first
    * discovered at this hop), and expansion-join output rows
    * (Σ degree over the previous frontier) — the quantity GraphSpec
    * pins as tracking the FRONTIER, not |V_reached|. */
  private[graft] final case class BfsRound(hop: Long, frontier: Long,
                                           expandedRows: Long)

  /** Single-source BFS hop distances (frontier expansion — the "how
    * far is everything from this hub" primitive under reachability
    * audits and neighborhood features). Frontier-DELTA iteration
    * (r7 rewrite): per round only the newly-discovered frontier joins
    * the edge list — O(Σ deg(frontier)) shuffled rows — and the
    * already-settled check is an anti-join against just the last TWO
    * frontiers, which is exact because the edge list is symmetrized:
    * a neighbor of a hop-h node has hop ∈ {h−1, h, h+1}, so any
    * already-settled candidate lies in frontier(h−1) ∪ frontier(h).
    * Per-round cost is therefore independent of |V_reached| (the
    * previous min-hop relaxation re-joined and re-aggregated the full
    * dist relation every round — the engine's designed-in scale tax).
    * The result is the union of the per-hop frontiers, each already
    * checkpointed, so the final union is narrow — no extra shuffle and
    * no node appears twice. Returns (node, hop) for REACHABLE nodes
    * only; rounds = eccentricity of the source.
    */
  def bfsHops(edges: DataFrame, aCol: String, bCol: String,
              source: Long, maxHops: Int = 30): DataFrame =
    bfsHopsWithStats(edges, aCol, bCol, source, maxHops,
      collectStats = false)._1

  /** `collectStats = true` (GraphSpec's telemetry path) materializes
    * the raw expansion per round and counts it; the production path
    * skips that — one fewer checkpoint + action per round.
    */
  private[graft] def bfsHopsWithStats(
      edges: DataFrame, aCol: String, bCol: String,
      source: Long, maxHops: Int = 30,
      collectStats: Boolean = true): (DataFrame, Seq[BfsRound]) = {
    // single-pass symmetrize (r13): the union form referenced the edge
    // subtree twice per materialization
    val sym = edges.select(explode(array(
        struct(col(aCol).cast("long").as("src"),
          col(bCol).cast("long").as("dst")),
        struct(col(bCol).cast("long").as("src"),
          col(aCol).cast("long").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint(true)
    val spark = edges.sparkSession
    import spark.implicits._
    var frontier = Seq((source, 0L)).toDF("node", "hop")
      .localCheckpoint(true)
    var prev = frontier.limit(0)
    var layers = Vector(frontier)
    var stats = Vector.empty[BfsRound]
    var frontierN = 1L
    var hop = 0L
    while (frontierN > 0 && hop < maxHops) {
      // with stats: checkpoint the raw expansion so the telemetry
      // count reuses materialized rows instead of re-running the join
      val expanded0 = frontier
        .join(sym, col("node") === col("src"))
        .select(col("dst").as("node"))
      val expanded = if (collectStats) expanded0.localCheckpoint(true)
        else expanded0
      val next = expanded.distinct()
        .join(prev.select(col("node"))
          .unionByName(frontier.select(col("node"))), Seq("node"),
          "left_anti")
        .select(col("node"), lit(hop + 1L).as("hop"))
        .localCheckpoint(false) // materialized by the count below (r13)
      val m = next.count()
      if (collectStats)
        stats :+= BfsRound(hop + 1L, m, expanded.count())
      else stats :+= BfsRound(hop + 1L, m, -1L)
      if (m > 0) layers :+= next
      prev = frontier
      frontier = next
      frontierN = m
      hop += 1
    }
    if (frontierN > 0)
      throw new IllegalStateException(s"bfsHops did not settle in $maxHops")
    (layers.reduce(_ unionByName _), stats)
  }

  /** k-core decomposition (the densest-region extractor — community
    * seeds, spam-farm detection, coreness as a document-authority
    * feature): synchronized peeling — each round drops EVERY node whose
    * degree within the surviving set is < k, until stable. Unique
    * fixpoint regardless of order; the sync formulation is what a
    * relational engine replays exactly.
    *
    * Scale shape: one round = two semi-joins of the (checkpointed)
    * symmetric edge list against the alive set + one degree aggregate —
    * O(|E|) per round, the [[NearDup.connectedComponents]] discipline
    * (localCheckpoint per round, convergence by count).
    *
    * Returns (node, core_deg) — the surviving nodes with their final
    * within-core degree.
    */
  def kCore(edges: DataFrame, aCol: String, bCol: String, k: Int,
            maxIter: Int = 50): DataFrame = {
    // single-pass symmetrize (r13): the union form referenced the edge
    // subtree twice per materialization
    val sym = edges.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint(true)
    def coreDeg(alive: DataFrame): DataFrame =
      sym.join(alive.select(col("node").as("src")), Seq("src"))
        .join(alive.select(col("node").as("dst")), Seq("dst"))
        .groupBy(col("src")).agg(count(lit(1)).as("core_deg"))
    var alive = sym.select(col("src").as("node")).distinct()
      .localCheckpoint(false) // materialized by the count below (r13)
    var n = alive.count()
    var it = 0
    var stable = false
    while (!stable && it < maxIter) {
      val next = coreDeg(alive).filter(col("core_deg") >= k)
        .select(col("src").as("node"))
        .localCheckpoint(false) // materialized by the count below (r13)
      val m = next.count()
      stable = m == n
      n = m
      alive = next
      it += 1
    }
    if (!stable)
      throw new IllegalStateException(s"kCore did not converge in $maxIter")
    coreDeg(alive).select(col("src").as("node"), col("core_deg"))
  }
}
