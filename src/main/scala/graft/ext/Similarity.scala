package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Graft.roundz

/** Vector similarity search over an `Array[Float]` embedding column
  * (north-star EXT, SURVEY.md §2.14).
  *
  * Two paths:
  *  - [[bruteTopK]]: exact cosine top-k — broadcast the (small) query set
  *    against the corpus; one narrow pass per corpus partition, top-k via
  *    window. The 100 TB baseline when the query set is bounded.
  *  - [[lshTopK]]: random-hyperplane LSH — corpus bucketed by sign
  *    pattern (one narrow pass), queries probe only their bucket; turns
  *    the scan into an equi-join on the bucket key. Approximate: recall
  *    traded for a corpus-partition-pruned plan.
  *
  * All dot products run in double precision via codegen'd higher-order
  * functions (`zip_with` + `aggregate`) — no UDF deserialization of the
  * float arrays (SURVEY.md §7.5#7).
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision, left-to-right (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Higher-order-function cosine — works on any numeric array type. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native fused cosine over `array<float>` (graft.expr.CosineSimilarity,
    * codegen'd, zero per-pair allocation) — requires [[graft.expr
    * .GraftFunctions.register]] on the session; bit-identical to
    * [[cosine]] (same left-to-right accumulation).
    */
  def cosineNative(a: Column, b: Column): Column =
    call_function(graft.expr.GraftFunctions.CosineSimName, a, b)

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param queries  small DataFrame (qid, qvec) — broadcast side
    * @param corpus   large DataFrame (id, vec)
    */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    val joined = corpus.join(broadcast(queries), col("qid") =!= col("id"))
      .select(col("qid"), col("id").as("nid"),
        cosineNative(col("qvec"), col("vec")).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), roundz(col("cos"), 6).as("cos6"))
  }

  /** ColBERT-style late-interaction MaxSim: score(doc) = Σ over query
    * vectors of MAX over the doc's vectors of cos(q, v) — multi-vector
    * retrieval where a document is a BAG of vectors, not one pooled
    * embedding. Shape: broadcast query set × corpus vector scan (q40's
    * class — at 100 TB the corpus side swaps in any ANN shortlist),
    * one (doc, qid) max aggregate (order-insensitive), then the Σ over
    * qid as an ORDERED cumsum so the float summation order is pinned
    * on both engines (SURVEY §5).
    *
    * @param queryVecs (qid, qvec) — the small, broadcast side
    * @param docVecs   (doc, vec) — one row per document vector
    */
  def maxSim(queryVecs: DataFrame, docVecs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expr.GraftFunctions.register(docVecs.sparkSession)
    val best = docVecs.crossJoin(broadcast(queryVecs))
      .select(col("doc"), col("qid"),
        cosineNative(col("qvec"), col("vec")).as("cos"))
      .groupBy(col("doc"), col("qid"))
      .agg(max(col("cos")).as("best"))
    val wOrd = Window.partitionBy(col("doc")).orderBy(col("qid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPick = Window.partitionBy(col("doc")).orderBy(col("qid").desc)
    best
      .withColumn("maxsim", sum(col("best")).over(wOrd))
      .withColumn("pick", row_number().over(wPick))
      .filter(col("pick") === 1)
      .select(col("doc"), col("maxsim"))
  }

  /** Deterministic pseudo-random hyperplane component: hash-derived value
    * in [-1, 1) from (plane index, dimension index). Zero-egress, seed-free
    * reproducibility — the planes are a pure function of (p, j).
    */
  private def planeComponent(p: Int, j: Column): Column =
    (pmod(xxhash64(lit("plane"), lit(p), j), lit(20000L)).cast("double")
      / 10000.0) - 1.0

  /** Sign-pattern bucket id of a vector under `nPlanes` hyperplanes —
    * native fused pass (graft.expr.HyperplaneSignBits: cached component
    * table, one nPlanes×dim loop, codegen'd). Bit-identical to
    * [[lshBucketHof]] (pinned in SimilaritySpec); requires
    * GraftFunctions.register on the session.
    */
  def lshBucket(vec: Column, nPlanes: Int = 8): Column =
    call_function(graft.expr.GraftFunctions.HyperplaneBitsName, vec, lit(nPlanes))

  /** Higher-order-function form of [[lshBucket]] — the readable spec of
    * the bucket function, kept as the equality reference for the native
    * expression. Interpreted per plane per row: do NOT use in hot paths.
    */
  def lshBucketHof(vec: Column, nPlanes: Int = 8): Column =
    (0 until nPlanes).map { p =>
      val d = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, j) => x.cast("double") * planeComponent(p, j)),
        lit(0.0), (acc, v) => acc + v)
      when(d > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact embedding-cosine near-duplicate pairs: (id_a < id_b) with
    * cosine ≥ tau. The all-pairs baseline (O(n²) — the verification
    * reference for [[lshNearDupPairs]], which is the 100 TB path).
    */
  def cosinePairsExact(emb: DataFrame, tau: Double): DataFrame = {
    graft.expr.GraftFunctions.register(emb.sparkSession)
    val a = emb.select(col("id").as("id_a"), col("vec").as("vec_a"))
    val b = emb.select(col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosineNative(col("vec_a"), col("vec_b")))
      .filter(col("cos") >= tau)
      .select(col("id_a"), col("id_b"), roundz(col("cos"), 6).as("cos6"))
  }

  /** Banded sign-bit keys for near-dup candidate generation: `nPlanes`
    * hyperplane sign bits split into bands of `bandBits`; two vectors are
    * candidates iff they agree on ALL bits of ≥1 band (same OR-of-ANDs
    * construction as MinHash banding, with hyperplane signs as the hash).
    */
  def lshBandKeys(vec: Column, nPlanes: Int, bandBits: Int): Column = {
    val sig = lshBucket(vec, nPlanes)
    val keys = (0 until nPlanes / bandBits).map { band =>
      struct(lit(band).as("band"),
        pmod(shiftright(sig, band * bandBits), lit(1L << bandBits)).as("bits"))
    }
    array(keys: _*)
  }

  /** Approximate near-dup pairs at scale: candidates from banded
    * hyperplane LSH (equi-join on band key — no cross join), then exact
    * cosine verification ≥ tau. Precision 1.0 by construction; recall
    * governed by (nPlanes, bandBits) — pinned against
    * [[cosinePairsExact]] in SimilaritySpec.
    */
  def lshNearDupPairs(emb: DataFrame, tau: Double, nPlanes: Int = 16,
                      bandBits: Int = 4): DataFrame = {
    graft.expr.GraftFunctions.register(emb.sparkSession)
    val keyed = emb.select(col("id"), col("vec"),
        explode(lshBandKeys(col("vec"), nPlanes, bandBits)).as("bk"))
    val a = keyed.select(col("bk"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = keyed.select(col("bk"), col("id").as("id_b"), col("vec").as("vec_b"))
    // verify BEFORE dedup: a pair surfacing in b bands costs b cheap
    // codegen'd cosines, but the dedup shuffle then moves only ids+cos6
    // (24 bytes) instead of two full vectors per candidate
    a.join(b, Seq("bk")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosineNative(col("vec_a"), col("vec_b")))
      .filter(col("cos") >= tau)
      .select(col("id_a"), col("id_b"), roundz(col("cos"), 6).as("cos6"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Mutual-kNN graph over the banded-LSH candidate set — the
    * graph-construction step of SemDeDup-style clustering and
    * graph-based curation: an edge survives only when EACH endpoint
    * ranks the other inside its top-k (by cos desc, id), which prunes
    * hub vectors that merely sit near everything. Built entirely from
    * [[lshNearDupPairs]] candidates (equi-join on band keys — never
    * all-pairs), so the per-node lists rank CANDIDATES, the approximate
    * regime every billion-vector kNN graph runs in. One symmetrize
    * union + one id-keyed rank window + one self-equi-join on the
    * (a, b) edge key — all O(|candidate pairs|). Rounded-cos ranking
    * keys keep the lists engine-portable (the bm25TopK convention).
    */
  def mutualKnnGraph(emb: DataFrame, k: Int, tau: Double,
                     nPlanes: Int = 16, bandBits: Int = 4): DataFrame =
    mutualKnnFromPairs(lshNearDupPairs(emb, tau, nPlanes, bandBits), k)

  /** The rank-and-intersect stage of [[mutualKnnGraph]], factored over
    * any scored pair relation (id_a, id_b, cos6): symmetrize, rank each
    * node's candidates by (cos6 desc, id), keep edges present in BOTH
    * endpoints' top-k.
    */
  def mutualKnnFromPairs(pairs: DataFrame, k: Int): DataFrame = {
    // Canonicalize + dedup up front: a duplicated input row (or the same
    // pair in both orientations) would otherwise inflate row_number ranks
    // in the top-k window AND multiply matching rows in the final
    // fwd⋈rev join, emitting duplicate edges. lshNearDupPairs already
    // guarantees unique (id_a<id_b) pairs, but this stage is factored
    // over ANY scored pair relation — make the precondition a no-op
    // exchange instead of a silent corruption. Same-pair duplicates
    // carry the same cos6 (deterministic scoring), so the kept row is
    // well-defined.
    val canon = pairs.select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("cos6"))
      .filter(col("id_a") =!= col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val sym = canon.select(explode(array(
        struct(col("id_a").as("id"), col("id_b").as("nb"), col("cos6")),
        struct(col("id_b").as("id"), col("id_a").as("nb"), col("cos6"))))
        .as("e"))
      .select(col("e.id").as("id"), col("e.nb").as("nb"),
        col("e.cos6").as("cos6"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("cos6").desc, col("nb"))
    val topk = sym.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
    val fwd = topk.filter(col("id") < col("nb"))
      .select(col("id").as("id_a"), col("nb").as("id_b"), col("cos6"))
    val rev = topk.filter(col("id") > col("nb"))
      .select(col("nb").as("id_a"), col("id").as("id_b"))
    fwd.join(rev, Seq("id_a", "id_b"))
  }

  /** Directed kNN navigation graph from any scored pair relation
    * (id_a, id_b, cos6): symmetrize, keep each node's `k` best
    * neighbors (cos6 desc, id). Unlike [[mutualKnnFromPairs]] the
    * reverse direction is NOT required, so hub-adjacent nodes keep
    * their outbound links — the denser, navigable graph a beam search
    * ([[graphBeamTopK]]) needs, vs the mutual graph's cluster-analysis
    * sparsity. Output is directed (id, nb).
    */
  def knnGraphFromPairs(pairs: DataFrame, k: Int): DataFrame = {
    val canon = pairs.select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("cos6"))
      .filter(col("id_a") =!= col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val sym = canon.select(explode(array(
        struct(col("id_a").as("id"), col("id_b").as("nb"), col("cos6")),
        struct(col("id_b").as("id"), col("id_a").as("nb"), col("cos6"))))
        .as("e"))
      .select(col("e.id").as("id"), col("e.nb").as("nb"),
        col("e.cos6").as("cos6"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("cos6").desc, col("nb"))
    sym.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k).select(col("id"), col("nb"))
  }

  /** Query-aware entry points for [[graphBeamTopK]]: each query's LSH
    * band-bucket mates (fine buckets — default 2 bands × 8 bits), capped
    * to `perQuery` by a deterministic hash so seeding costs no cosine.
    * The standard graph-ANN seeding move: enter the graph NEAR the
    * query instead of at fixed global points, which keeps recall flat
    * as the corpus grows (fixed entry points decay — the beam can't
    * cross a growing graph in bounded hops).
    */
  def lshSeedCandidates(queries: DataFrame, corpus: DataFrame,
                        nPlanes: Int = 16, bandBits: Int = 8,
                        perQuery: Int = 16): DataFrame = {
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    val cb = corpus.select(col("id"),
      explode(lshBandKeys(col("vec"), nPlanes, bandBits)).as("bk"))
    val qk = queries.select(col("qid"),
      explode(lshBandKeys(col("qvec"), nPlanes, bandBits)).as("bk"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(xxhash64(lit("seedsel"), col("id")), col("id"))
    broadcast(qk).join(cb, Seq("bk"))
      .select(col("qid"), col("id")).distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perQuery)
      .select(col("qid"), col("id"))
  }

  /** Global hash-uniform entry points (qid × nSeeds corpus ids with the
    * smallest seed hash) — the connectivity fallback unioned with
    * [[lshSeedCandidates]] so a query whose buckets are empty still
    * enters the graph somewhere.
    */
  def uniformSeedCandidates(queries: DataFrame, corpus: DataFrame,
                            nSeeds: Int = 8): DataFrame = {
    val seeds = corpus
      .select(col("id"), xxhash64(lit("seed"), col("id")).as("__h"))
      .orderBy(col("__h"), col("id")).limit(nSeeds)
      .select(col("id"))
    queries.select(col("qid")).crossJoin(broadcast(seeds))
  }

  /** HNSW-class graph ANN: hop-synchronous beam search over a prebuilt
    * proximity graph (e.g. [[knnGraphFromPairs]]). HNSW itself is a
    * sequential-insert structure that doesn't distribute; the
    * Spark-shaped equivalent is exactly this — navigate a precomputed
    * kNN graph from per-query entry points, expanding a per-query beam
    * of the best-scored frontier one hop at a time:
    *
    *  1. entry points: `seeds` (qid, id) — [[lshSeedCandidates]] ∪
    *     [[uniformSeedCandidates]] in the standard composition;
    *  2. each hop: frontier ⋈ adjacency (equi-join, O(frontier·degree))
    *     → drop already-visited (qid,id) via left-anti → fetch vectors
    *     by one corpus equi-join → score with the native codegen'd
    *     cosine against the BROADCAST query set;
    *  3. next frontier = each query's `beam` best newly-visited nodes
    *     (cos desc, id tiebreak); after `hops` rounds the answer is the
    *     global top-k of everything visited.
    *
    * Work is O(queries · beam · degree) per hop — independent of corpus
    * size, the property that makes graph ANN the latency-optimal scale
    * path; the corpus appears only as the probed side of equi-joins.
    * Reused relations (adjacency, the growing visited set) are
    * localCheckpoint'ed: each is referenced 2+ times per hop, and Spark
    * re-executes shared subtrees per reference (the labelPropagation /
    * orientEdges discipline).
    */
  def graphBeamTopK(queries: DataFrame, corpus: DataFrame, edges: DataFrame,
                    seeds: DataFrame, k: Int, beam: Int = 8,
                    hops: Int = 3): DataFrame =
    graphBeamSweep(queries, corpus, edges, seeds, k, Seq(beam), Seq(hops))
      .select(col("qid"), col("nid"), col("rank"), col("cos6"))

  /** Tagged multi-leg beam search (r14, guide §1.2/§2.6 — the r13
    * tagged-union move applied INSIDE the search): run several beam
    * widths and/or hop budgets of the same (queries, corpus, graph,
    * seeds, k) search as ONE hop-synchronous ladder. Every join and
    * window below is keyed by (bw, qid), so each (bw, qid) leg advances
    * independently and its rows are EXACTLY what a separate
    * graphBeamTopK(beam = bw, hops = h) call returns — the search is
    * deterministic and a shorter-hops leg is the same search stopped
    * earlier (the superset property q331 pins). The adjacency, the seed
    * scoring, and each hop's scored frontier are computed and
    * checkpointed ONCE for all legs, so a sweep rig pays hops+2 jobs
    * instead of legs×(hops+2).
    *
    * Plan-growth note (ADVICE-r13): `visited` stays a lazy union of the
    * per-hop CHECKPOINTED frames, so its plan grows linearly in hops
    * and each hop's anti-join re-reads every prior hop's cached blocks
    * — O(hops²) block reads, no recompute. Fine at the library's
    * hops ≤ 3; a caller raising hops past ~6 should re-checkpoint the
    * union periodically.
    *
    * Returns (bw, hops, qid, nid, rank, cos6): the per-query top-k for
    * every bw in `beams` × every h in `emitHops` (h = 0 is the scored
    * seed set).
    */
  def graphBeamSweep(queries: DataFrame, corpus: DataFrame,
                     edges: DataFrame, seeds: DataFrame, k: Int,
                     beams: Seq[Int], emitHops: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(beams.nonEmpty && emitHops.nonEmpty && emitHops.forall(_ >= 0),
      "graphBeamSweep needs at least one beam width and hop budget")
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    val maxHops = emitHops.max
    // single-pass symmetrize (r13): the union form referenced the edge
    // subtree twice per materialization
    val adj = edges
      .select(explode(array(
        struct(col("id"), col("nb")),
        struct(col("nb").as("id"), col("id").as("nb")))).as("e"))
      .select(col("e.id").as("id"), col("e.nb").as("nb"))
      .dropDuplicates("id", "nb")
      .localCheckpoint()
    val qb = broadcast(queries.select(col("qid"), col("qvec")))
    // (bw, qid, id) candidates -> (bw, qid, id, cos); queries broadcast,
    // corpus probed by equi-join on id
    def score(cand: DataFrame): DataFrame =
      cand.join(corpus, Seq("id"))
        .join(qb, Seq("qid"))
        .select(col("bw"), col("qid"), col("id"),
          cosineNative(col("qvec"), col("vec")).as("cos"))
    def topBeam(scored: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("bw"), col("qid"))
        .orderBy(col("cos").desc, col("id"))
      scored.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= col("bw"))
        .select(col("bw"), col("qid"), col("id"))
    }
    // seeds scored ONCE, untagged (identical for every beam width),
    // then fanned out to one row per width
    val seed0 = seeds.select(col("qid"), col("id")).distinct()
      .join(corpus, Seq("id")).join(qb, Seq("qid"))
      .select(col("qid"), col("id"),
        cosineNative(col("qvec"), col("vec")).as("cos"))
      .localCheckpoint()
    var visited = seed0.select(explode(typedlit(beams)).as("bw"),
      col("qid"), col("id"), col("cos"))
    var frontier = topBeam(visited)
    var emitted = Vector.empty[(Int, DataFrame)]
    if (emitHops.contains(0)) emitted :+= (0, visited)
    for (h <- 1 to maxHops) {
      val fresh = frontier.join(adj, Seq("id"))
        .select(col("bw"), col("qid"), col("nb").as("id")).distinct()
        .join(visited.select(col("bw"), col("qid"), col("id")),
          Seq("bw", "qid", "id"), "left_anti")
      val scored = score(fresh).localCheckpoint()
      // visited stays a LAZY union of the per-hop checkpointed frames
      // (r13): each hop's scored frame is already materialized, so
      // re-checkpointing the whole union per hop only re-copied the
      // accumulated candidates O(hops²) times — one eager job per hop
      // saved, same rows.
      visited = visited.unionByName(scored)
      frontier = topBeam(scored)
      if (emitHops.contains(h)) emitted :+= (h, visited)
    }
    val w = Window.partitionBy(col("hops"), col("bw"), col("qid"))
      .orderBy(col("cos").desc, col("id"))
    emitted.map { case (h, vis) =>
        vis.withColumn("hops", lit(h)) }
      .reduce(_ unionByName _)
      .filter(col("qid") =!= col("id"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("bw"), col("hops"), col("qid"), col("id").as("nid"),
        col("rank"), roundz(col("cos"), 6).as("cos6"))
  }

  /** Nearest-centroid index of a vector against a driver-side centroid
    * matrix — one narrow native pass (graft.expr.ArgMaxCosine), no join,
    * no shuffle. The matrix rides into executors as a foldable literal
    * (nlist×dim floats — the broadcast-dim analogue).
    */
  def argMaxCosine(vec: Column, centroids: Seq[Seq[Float]]): Column =
    call_function(graft.expr.GraftFunctions.ArgMaxCosName, vec,
      typedlit(centroids))

  /** IVF (inverted-file) approximate top-k — the classic ANN scale path:
    *  1. coarse quantizer: `nlist` centroids from a deterministic seed
    *     (first `nlist` corpus vectors by id) refined by `lloydIters`
    *     rounds of spherical k-means; the matrix lives driver-side
    *     (nlist×dim floats — KBs) like any broadcast dim;
    *  2. inverted lists: each corpus vector tagged with its nearest
    *     centroid via the native [[argMaxCosine]] — a NARROW map. The
    *     corpus×centroids join + per-row window this replaces shuffled
    *     n×nlist rows just to rank them, which at corpus scale was the
    *     whole IVF cost;
    *  3. probe: each query scans only its `nprobe` nearest lists — an
    *     equi-join on `list_id` replaces the full corpus scan.
    * Recentering (training only) still shuffles n×dim (pos, v) pairs;
    * at 100 TB train the quantizer on a sample, then step 2 stays one
    * narrow pass over the full corpus.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4, lloydIters: Int = 1): DataFrame = {
    val cmat = ivfCentroids(corpus, nlist, lloydIters)
    ivfProbeTopK(queries, ivfAssign(corpus, cmat), cmat, k, nprobe)
  }

  /** Coarse-quantizer training (step 1 of [[ivfTopK]], split out in r9
    * so an index can be MAINTAINED incrementally: train once on the
    * main corpus, then [[ivfAssign]] appended deltas against the same
    * frozen matrix — see q340). Deterministic seed (first `nlist`
    * corpus vectors by id) refined by `lloydIters` spherical-k-means
    * rounds; the matrix lives driver-side (nlist×dim floats — KBs).
    */
  def ivfCentroids(corpus: DataFrame, nlist: Int,
                   lloydIters: Int): Seq[Seq[Float]] = {
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    var cmat: Seq[Seq[Float]] = corpus.orderBy(col("id")).limit(nlist)
      .select(col("vec")).collect().map(_.getSeq[Float](0)).toSeq
    for (_ <- 0 until lloydIters) {
      // recenter: coordinate mean per (list, pos). Indices are rebuilt
      // from scratch each round (empty lists drop out); consistency only
      // needs assignment and probe to share the SAME final matrix.
      cmat = ivfAssign(corpus, cmat)
        .select(col("list_id"), posexplode(col("vec")).as(Seq("pos", "v")))
        .groupBy(col("list_id"), col("pos")).agg(avg(col("v")).as("m"))
        .groupBy(col("list_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(expr("transform(pm, x -> cast(x.m as float))").as("cvec"))
        .collect().map(_.getSeq[Float](0)).toSeq
    }
    cmat
  }

  /** Inverted-list assignment (step 2): one NARROW native pass tagging
    * each (id, vec) row with its nearest centroid. Per-row and
    * matrix-pure — assigning main ∪ delta equals assigning main and
    * delta separately and unioning (the q340 incremental-index
    * theorem).
    */
  def ivfAssign(corpus: DataFrame, cmat: Seq[Seq[Float]]): DataFrame = {
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    corpus.withColumn("list_id", argMaxCosine(col("vec"), cmat))
  }

  /** Probe (step 3): each query scans only its `nprobe` nearest lists
    * of an [[ivfAssign]]-shaped index — an equi-join on `list_id`
    * replaces the full corpus scan.
    */
  def ivfProbeTopK(queries: DataFrame, assigned: DataFrame,
                   cmat: Seq[Seq[Float]], k: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = assigned.sparkSession
    import spark.implicits._
    graft.expr.GraftFunctions.register(spark)
    val cdf = cmat.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("list_id", "cvec")
    val probeW = Window.partitionBy(col("qid"))
      .orderBy(col("__cos").desc, col("list_id"))
    val probes = queries.join(broadcast(cdf))
      .withColumn("__cos", cosineNative(col("qvec"), col("cvec")))
      .withColumn("__rn", row_number().over(probeW))
      .filter(col("__rn") <= nprobe)
      .select(col("qid"), col("qvec"), col("list_id"))

    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    assigned.select(col("list_id"), col("id"), col("vec"))
      .join(broadcast(probes), Seq("list_id"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nid"),
        cosineNative(col("qvec"), col("vec")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), roundz(col("cos"), 6).as("cos6"))
  }

  /** Approximate top-k via LSH bucket probing. With `maxProbeHamming`
    * = 0 each query scans only its own bucket (maximum pruning); with
    * h > 0 it MULTI-PROBES every bucket within hamming distance h of
    * its own sign pattern (Lv et al., "Multi-Probe LSH", VLDB'07) —
    * the standard recall lever when the embedding space has weak
    * neighborhood structure: a near neighbor differing on a few sign
    * bits is still found, at the cost of Σ C(nPlanes, i), i ≤ h probe
    * buckets per query (37 of 256 at nPlanes=8, h=2 ⇒ ~14% of the
    * corpus scanned instead of 100%).
    *
    * Scale shape: the probe fan-out explodes only the (small,
    * broadcast) QUERY side — the corpus is bucketed once, narrow, and
    * joined by bucket equality; probe keys are distinct, so a corpus
    * vector meets a query at most once and no dedup is needed.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nPlanes: Int = 8, maxProbeHamming: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxProbeHamming >= 0 && maxProbeHamming <= nPlanes)
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    val masks: Seq[Long] = (0 to maxProbeHamming).flatMap(h =>
      (0 until nPlanes).combinations(h)
        .map(_.foldLeft(0L)((acc, b) => acc | (1L << b))))
    val bq = queries.withColumn("__b0", lshBucket(col("qvec"), nPlanes))
      .withColumn("bucket",
        explode(array(masks.map(m => col("__b0").bitwiseXOR(lit(m))): _*)))
      .drop("__b0")
    val bc = corpus.withColumn("bucket", lshBucket(col("vec"), nPlanes))
    val joined = bc.join(broadcast(bq), Seq("bucket"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nid"),
        cosineNative(col("qvec"), col("vec")).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), roundz(col("cos"), 6).as("cos6"))
  }

  /** Symmetric per-vector int8 quantization: scale = max|v| / 127,
    * qᵢ = ⌊vᵢ/scale + 0.5⌋ (round-half-up, engine-portable — no
    * banker's-rounding ambiguity). Returns `struct(scale, q)`; the
    * reconstruction vᵢ ≈ qᵢ·scale is within scale/2 per element.
    *
    * Scale rationale: a 100 TB float32 embedding store drops to a
    * quarter the bytes (and a quarter the scan+shuffle volume for ANN
    * pre-filtering) at < 0.4% max relative error per dimension. Pure
    * narrow per-row math over codegen'd HOFs — no shuffle, no UDF.
    * A zero vector yields scale 0 and null q (documented, not thrown).
    */
  def quantizeInt8(vec: Column): Column = {
    val v = transform(vec, x => x.cast("double"))
    val scale = array_max(transform(v, x => abs(x))) / lit(127.0)
    struct(scale.as("scale"),
      when(scale > 0,
        transform(v, x => floor(x / scale + lit(0.5)).cast("long")))
        .as("q"))
  }

  /** Per-element absolute reconstruction error |vᵢ − qᵢ·scale|. */
  def dequantError(vec: Column, q: Column, scale: Column): Column =
    zip_with(vec, q, (x, qi) => abs(x.cast("double") - qi * scale))

  /** Train an m-subspace × k-codeword product-quantization codebook
    * driver-side: per subspace, Lloyd k-means over the training
    * vectors' subvector slices. Deterministic end to end — seeds are
    * the first k training subvectors (callers pass an id-ordered
    * sample), assignment ties break to the lowest codeword, and an
    * emptied codeword keeps its previous position. The training sample
    * is the IVF trade: a few thousand vectors fit on the driver; the
    * ENCODING pass over the full corpus is the distributed part.
    */
  def pqTrain(train: Seq[Seq[Float]], m: Int, k: Int,
              iters: Int = 8): Seq[Seq[Seq[Float]]] = {
    require(train.nonEmpty, "PQ training sample is empty")
    val dim = train.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    (0 until m).map { s =>
      val sub = train.map(v => v.slice(s * dsub, (s + 1) * dsub).toArray)
      var cents = sub.take(k).map(_.clone()).toArray
      for (_ <- 0 until iters) {
        val sums = Array.fill(cents.length)(new Array[Double](dsub))
        val ns = new Array[Long](cents.length)
        sub.foreach { x =>
          var best = 0; var bestD = Double.MaxValue
          var j = 0
          while (j < cents.length) {
            var d = 0.0; var t = 0
            while (t < dsub) {
              val diff = x(t).toDouble - cents(j)(t); d += diff * diff; t += 1
            }
            if (d < bestD) { bestD = d; best = j }
            j += 1
          }
          ns(best) += 1
          var t = 0
          while (t < dsub) { sums(best)(t) += x(t); t += 1 }
        }
        cents = cents.zipWithIndex.map { case (c, j) =>
          if (ns(j) == 0) c
          else Array.tabulate(dsub)(t => (sums(j)(t) / ns(j)).toFloat)
        }
      }
      cents.map(_.toSeq).toSeq
    }
  }

  /** PQ/ADC approximate top-k — the MEMORY-side ANN scale path (IVF
    * prunes which vectors are scanned; PQ shrinks what a scan reads):
    * the corpus is encoded ONCE into m small codes per vector (narrow
    * native pass, 32× less scan volume at m=8/dim=64), and queries rank
    * candidates by asymmetric distance against the codebook literal —
    * no float vectors move for the corpus side at all. Returns
    * (qid, nid, rank, adist) by ascending ADC distance, self excluded.
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             codebook: Seq[Seq[Seq[Float]]]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    val cbLit = typedlit(codebook)
    val enc = corpus.select(col("id"),
      call_function(graft.expr.GraftFunctions.PqEncodeName, col("vec"), cbLit)
        .as("codes"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adist").asc, col("nid"))
    enc.join(broadcast(queries))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nid"),
        call_function(graft.expr.GraftFunctions.PqAdcName,
          col("codes"), col("qvec"), cbLit).as("adist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"),
        roundz(col("adist"), 6).as("adist6"))
  }

  /** PQ shortlist + exact re-rank — the standard production pipeline:
    * ADC over the 32×-smaller encoded corpus produces a `shortlist`
    * per query, then ONLY the shortlisted vectors are fetched (the
    * small shortlist broadcasts against the corpus — no corpus
    * shuffle) and re-ranked by exact cosine. Quantization error
    * affects which candidates surface, never their final order.
    */
  def pqTopKRerank(queries: DataFrame, corpus: DataFrame, k: Int,
                   shortlist: Int,
                   codebook: Seq[Seq[Seq[Float]]]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val short = pqTopK(queries, corpus, shortlist, codebook)
      .select(col("qid").as("sqid"), col("nid"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    corpus.join(broadcast(short), col("id") === col("nid"))
      .join(broadcast(queries), col("qid") === col("sqid"))
      .select(col("qid"), col("nid"),
        cosineNative(col("qvec"), col("vec")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), roundz(col("cos"), 6).as("cos6"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): block
    * the corpus into buckets, compare pairs only WITHIN a bucket by
    * exact cosine, and drop every vector that has an earlier (lower-id)
    * bucket-mate with cosine ≥ `tau`. Emits one row per dropped vector
    * with its minimal witness — exactly what a curation pass subtracts
    * from the corpus.
    *
    * Blocking here is the first `signBits` coordinate signs — a
    * deterministic, engine-recomputable stand-in for SemDeDup's k-means
    * cluster assignment (the clustered variant is [[graft.ext.Embeddings.kmeans]]
    * + this same within-bucket pairing; sign blocking keeps the oracle a
    * full SQL recompute). The drop rule (any earlier neighbor, kept or
    * not) is the standard parallel approximation of greedy SemDeDup: it
    * is order-deterministic, one-pass, and over-drops only within an
    * already-duplicated clique.
    *
    * Scale: the bucket key is a narrow per-row expression; the pair join
    * is an equi-join on the bucket (never all-pairs), with per-bucket
    * cost bounded by the blocking granularity — at 100 TB raise
    * `signBits` (or swap in k-means cells) so bucket populations stay
    * square-able, and cap degenerate buckets like the LSH paths do.
    */
  def semDedupPairs(emb: DataFrame, tau: Double,
                    signBits: Int = 4): DataFrame = {
    graft.expr.GraftFunctions.register(emb.sparkSession)
    val bucket = (0 until signBits)
      .map(b => when(element_at(col("vec"), b + 1) >= 0,
        lit(1 << (signBits - 1 - b))).otherwise(lit(0)))
      .reduce(_ + _)
    val keyed = emb.select(col("id"), col("vec"), bucket.as("__bk"))
    val a = keyed.select(col("__bk"), col("id").as("id_a"),
      col("vec").as("vec_a"))
    val b = keyed.select(col("__bk"), col("id").as("id_b"),
      col("vec").as("vec_b"))
    a.join(b, Seq("__bk")).filter(col("id_a") < col("id_b"))
      .withColumn("__cos", cosineNative(col("vec_a"), col("vec_b")))
      .filter(col("__cos") >= tau)
      .groupBy(col("id_b").as("dropped_id"))
      .agg(min(col("id_a")).as("witness_id"),
        count(lit(1)).as("n_dups"))
  }
}
