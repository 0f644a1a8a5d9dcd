package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate detection for document corpora (north-star EXT,
  * SURVEY.md §2.14): MinHash + LSH banding, SimHash, and n-gram Jaccard
  * verification.
  *
  * Scale design (100 TB stance):
  *  - signatures are computed per-row with codegen'd higher-order array
  *    functions — a single narrow pass over the corpus, no UDFs;
  *  - candidate generation shuffles only (band_key, doc_id) pairs — a few
  *    dozen bytes per doc per band, NOT document text;
  *  - exact Jaccard verification runs only on LSH candidates (the
  *    classic shingle→minhash→band→bucket-join plan), never all-pairs;
  *  - skew guard: a band bucket holding B docs yields B² pairs; cap with
  *    a count filter before the self-join so a degenerate key (e.g. empty
  *    docs) can't explode a partition.
  */
object NearDup {

  /** Word w-shingles from a pre-split token array; documents shorter
    * than `w` tokens fall back to a single whole-text shingle so they
    * still participate.
    *
    * Takes tokens, not text, on purpose: higher-order functions are
    * interpreted (not whole-stage-codegen'd), so a `split` embedded in
    * the lambda would re-tokenize the document for every element_at —
    * O(tokens²) per row. Callers project `split(lower(text), " ")` into
    * a column first (kept from collapsing back by the repartition
    * barrier they already need).
    */
  def shinglesFromTokens(toks: Column, w: Int = 3): Column = {
    val n = size(toks)
    when(n < w, array(array_join(toks, " "))).otherwise(
      transform(sequence(lit(1), n - (w - 1)),
        i => concat_ws(" ", (0 until w).map(o => element_at(toks, i + o)): _*)))
  }

  /** Word w-shingles of the lowercased text (single-expression form —
    * prefer [[shinglesFromTokens]] after a token projection in hot paths).
    */
  def shingles(text: Column, w: Int = 3): Column =
    shinglesFromTokens(split(lower(text), " "), w)

  /** Distinct 64-bit shingle hashes in one native fused pass
    * (graft.expr.ShingleHashes, codegen'd) — the composed
    * `array_distinct(transform(shingles, xxhash64))` form is interpreted
    * per element and ~50x slower; byte-identical values (pinned in
    * NearDupSpec). Requires GraftFunctions.register on the session.
    */
  def shingleHashes(toks: Column, w: Int = 3): Column =
    call_function(graft.expr.GraftFunctions.ShingleHashesName, toks, lit(w))

  /** Full positional shingle-hash sequence (no dedup) — the rolling-hash
    * stream for winnowing-style fingerprints.
    */
  def shingleHashesOrdered(toks: Column, w: Int = 3): Column =
    call_function(graft.expr.GraftFunctions.ShingleHashesAllName, toks, lit(w))

  /** Positional STRING shingle sequence (native, no dedup) — same shape
    * as [[shinglesFromTokens]] but one fused codegen'd pass. Used where
    * the shingles must stay DuckDB-recomputable (the oracle-checked
    * fingerprint query) instead of hashed.
    */
  def shingleStrings(toks: Column, w: Int = 3): Column =
    call_function(graft.expr.GraftFunctions.WordShinglesName, toks, lit(w))

  /** k seeded-minhash values over pre-hashed shingles, one native k×n
    * loop (graft.expr.SeededMinHash).
    */
  def minhashSignature(sh: Column, k: Int = 16): Column =
    call_function(graft.expr.GraftFunctions.MinHashSigName, sh, lit(k))

  /** LSH band keys: the signature split into `bands` rows-per-band
    * groups, each band hashed to one 64-bit key (banded so that docs
    * agreeing on ANY band become candidates).
    */
  def bandKeys(sig: Column, k: Int = 16, bands: Int = 8): Column = {
    val r = k / bands
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64((b +: (0 until r).map(i =>
        element_at(sig, b * r + i + 1))): _*))
  }

  /** Exact Jaccard similarity of two (deduped) shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    val inter = size(array_intersect(da, db)).cast("double")
    inter / (size(da) + size(db) - size(array_intersect(da, db)))
  }

  /** Docs with per-row hashed-shingle set, minhash signature and band
    * keys (one narrow pass, native hot loops).
    */
  def signed(docs: DataFrame, idCol: String, textCol: String,
             k: Int = 16, bands: Int = 8): DataFrame = {
    graft.expr.GraftFunctions.register(docs.sparkSession)
    docs.select(col(idCol).as("doc_id"),
        split(lower(col(textCol)), " ").as("toks"))
      .select(col("doc_id"), shingleHashes(col("toks")).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), k))
      .withColumn("band_keys", bandKeys(col("sig"), k, bands))
  }

  /** Candidate pairs from band-bucket collisions (id_a < id_b), with the
    * per-bucket blowup capped at `maxBucket`.
    */
  def candidatePairs(signedDocs: DataFrame, maxBucket: Int = 64): DataFrame = {
    val exploded = signedDocs
      .select(col("doc_id"), explode(col("band_keys")).as("bk"))
    val bounded = exploded.groupBy(col("bk"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
    bounded
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
  }

  /** Full MinHash near-dup pipeline: candidates verified with exact
    * Jaccard over shingle sets, thresholded.
    */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.7, k: Int = 16,
                      bands: Int = 8): DataFrame = {
    // checkpoint the signed pass ONCE (r13, guide §7.2): the plan below
    // references it three times (candidate explode + both verify-join
    // sides), and each reference otherwise replays the full shingle/
    // minhash native pass over the corpus — at scale this is the
    // persist-don't-recompute call every LSH pipeline makes
    val s = signed(docs, idCol, textCol, k, bands).localCheckpoint(true)
    // sh from signed is already distinct (ShingleHashes contract)
    val sh = s.select(col("doc_id"), col("sh").as("shd"), size(col("sh")).as("n"))
    candidatePairs(s)
      .join(sh.toDF("id_a", "sh_a", "n_a"), "id_a")
      .join(sh.toDF("id_b", "sh_b", "n_b"), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .select(col("id_a"), col("id_b"),
        round(col("inter") / (col("n_a") + col("n_b") - col("inter")), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Per-token 64-bit hashes (compute ONCE into a column, then feed
    * [[simhashFromHashes]] — keeps the 64 bit-votes from re-hashing).
    */
  def tokenHashes(text: Column): Column =
    transform(split(lower(text), " "), t => xxhash64(t))

  /** 64-bit SimHash: per-bit majority vote over the token hashes, one
    * native fused pass (graft.expr.SimHash64, codegen'd). Shuffle-free.
    * Requires GraftFunctions.register on the session.
    */
  def simhashFromHashes(hs: Column): Column =
    call_function(graft.expr.GraftFunctions.SimHashName, hs)

  /** Composed column form of [[simhashFromHashes]] — 64 interpreted
    * array traversals per row; kept ONLY as the independent reference
    * the spec pins the native expression against byte-for-byte.
    */
  def simhashFromHashesComposed(hs: Column): Column = {
    val n = size(hs)
    val bits = (63 to 0 by -1).map { b =>
      val ones = size(filter(hs,
        h => shiftright(h, b).bitwiseAND(1L) === 1L))
      when(ones * 2 > n, lit(1L)).otherwise(lit(0L))
    }
    bits.reduce((acc, bit) => acc * 2 + bit)
  }

  /** Convenience single-expression form (see [[tokenHashes]] for the
    * two-step variant used in hot paths).
    */
  def simhash(text: Column): Column = simhashFromHashes(tokenHashes(text))

  /** Hamming distance between two simhashes (popcount of xor). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on 4 exact-match 16-bit bands (any
    * pair within hamming distance 3 shares at least one band), then
    * verify hamming ≤ maxDist on candidates only.
    */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxDist: Int = 3): DataFrame = {
    graft.expr.GraftFunctions.register(docs.sparkSession)
    val withSim = docs
      .select(col(idCol).as("doc_id"), tokenHashes(col(textCol)).as("hs"))
      .select(col("doc_id"), simhashFromHashes(col("hs")).as("sim"))
    val banded = withSim.select(col("doc_id"), col("sim"),
        explode(array((0 until 4).map(b =>
          concat(lit(s"$b:"), shiftright(col("sim"), 16 * b)
            .bitwiseAND(lit(0xFFFFL)).cast("string"))): _*)).as("band"))
    val a = banded.select(col("band"), col("doc_id").as("id_a"), col("sim").as("sim_a"))
    val b = banded.select(col("band"), col("doc_id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming(col("sim_a"), col("sim_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Top n-gram Jaccard pairs within blocking keys (same lang + length
    * bucket), via an inverted shingle join rather than per-pair array
    * intersection: explode (block, shingle-hash), self-join on equality,
    * and the per-pair match count IS the intersection size. Pairs with
    * zero overlap never materialize (they can't rank), and no array
    * object is built per candidate pair — the cost is proportional to
    * actual shingle collisions, not to block-size². Shingles are hashed
    * to 64-bit first (long equi-join keys; collisions negligible).
    */
  def blockedJaccardPairs(docs: DataFrame, topK: Int = 50,
                          maxBucket: Int = 256): DataFrame = {
    // spreadIfNarrow fans shingling across cores at harness scale
    // (single-file input) and is a no-op on a many-split source; the
    // native ShingleHashes expression evaluates its token input once per
    // row, so no projection barrier is needed for single evaluation.
    graft.expr.GraftFunctions.register(docs.sparkSession)
    val base = graft.Graft.spreadIfNarrow(
        docs.select(col("doc_id"), col("lang"),
          (col("n_chars") / 50).cast("long").as("lenb"),
          split(lower(col("text")), " ").as("toks")),
        col("doc_id"))
      .select(col("doc_id"), col("lang"), col("lenb"),
        shingleHashes(col("toks"), 3).as("sh"))
      .withColumn("n", size(col("sh")))
    // inverted index: one row per (block, shingle); docs sharing a
    // shingle meet in its bucket, so the per-pair bucket-match count IS
    // the intersection size. Zero-overlap pairs never materialize and the
    // corpus is scanned once — no self-join, shuffle ∝ total shingles.
    // Skew guard (100 TB): a stop-shingle shared by B docs in one block
    // would fan out B² pair rows — a boilerplate footer shared by every
    // page makes that THE job-killer partition. Buckets over `maxBucket`
    // are dropped (a shingle that common carries no near-dup signal
    // anyway — it's a stop-shingle by definition); the default sits ~35×
    // above the harness corpus' max per-block df (7 at sf0.1), so the
    // exact result is untouched there. NearDupSpec pins both properties.
    val buckets = base
      .select(col("lang"), col("lenb"), explode(col("sh")).as("h"),
        struct(col("doc_id"), col("n")).as("d"))
      .groupBy(col("lang"), col("lenb"), col("h"))
      .agg(collect_list(col("d")).as("ds"))
      .filter(size(col("ds")) > 1 && size(col("ds")) <= maxBucket)
    buckets
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a"), explode(col("ds")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .agg(count(lit(1)).as("inter"))
      // |A∪B| = |A|+|B|−|A∩B|
      .select(col("id_a"), col("id_b"),
        round(col("inter") / (col("n_a") + col("n_b") - col("inter")), 4)
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(topK)
  }

  /** DIRECTED shingle containment |A∩B| / |A| ≥ tau — the asymmetric
    * similarity that catches excerpts, quotes, and syndicated fragments
    * that symmetric Jaccard structurally misses: a 12-token excerpt of
    * a 500-token article has Jaccard ≈ 0.02 but containment 1.0. Same
    * inverted-index shape as [[blockedJaccardPairs]] minus the
    * length-bucket blocking (by DESIGN: length blocking would never
    * let a short doc meet its long parent — exactly the pairs this
    * operator exists for), with the same stop-shingle bucket cap as
    * the skew guard. Emits ordered pairs (id_a contained in id_b).
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       tau: Double, maxBucket: Int = 256): DataFrame = {
    graft.expr.GraftFunctions.register(docs.sparkSession)
    val base = graft.Graft.spreadIfNarrow(
        docs.select(col(idCol).as("__id"),
          split(lower(col(textCol)), " ").as("toks")),
        col("__id"))
      .select(col("__id"), shingleHashes(col("toks"), 3).as("sh"))
      .withColumn("n", size(col("sh")))
    val buckets = base
      .select(explode(col("sh")).as("h"),
        struct(col("__id"), col("n")).as("d"))
      .groupBy(col("h")).agg(collect_list(col("d")).as("ds"))
      .filter(size(col("ds")) > 1 && size(col("ds")) <= maxBucket)
    // Count UNORDERED pairs (a < b) and mirror both directions AFTER
    // the aggregate (r14, guide §2.3 — the q243 move): |A∩B| is
    // symmetric in the pair, so the ordered relation the tau filter
    // consumes is exactly lower ∪ mirror(lower) — row-identical to the
    // old a ≠ b spelling — while the bucket pair expansion feeding the
    // count aggregate carries HALF the rows. The mirror is one explode
    // pass (NOT a self-union, which would duplicate the whole
    // inverted-index subtree); each direction keeps its own denominator
    // (n_a for a⊂b, n_b for the mirror).
    buckets
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a"), explode(col("ds")).as("b"))
      .filter(col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .agg(count(lit(1)).as("inter"))
      .select(explode(array(
          struct(col("id_a"), col("id_b"), col("n_a"), col("inter")),
          struct(col("id_b").as("id_a"), col("id_a").as("id_b"),
            col("n_b").as("n_a"), col("inter")))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.n_a").as("n_a"), col("p.inter").as("inter"))
      .filter(col("inter") / col("n_a") >= tau)
      .select(col("id_a"), col("id_b"),
        graft.Graft.roundz(col("inter") / col("n_a"), 4).as("cont"))
  }

  /** Incremental (delta) dedup — the daily-ingest screen: classify each
    * NEW-batch document against an EXISTING corpus as `exact_dup`
    * (normalized sha-256 match, q35's normalization), `near_dup`
    * (blocked n-gram Jaccard ≥ tau against any existing doc), or `new`.
    * Returns (id, status).
    *
    * Scale design: the exact screen is a semi join on a 32-byte hash
    * (tiny shuffle); only its SURVIVORS enter the near-dup screen — a
    * cascade, so the expensive stage sees the small residue. The
    * near-dup stage is the q38 inverted-index shape across two
    * relations: both sides explode hashed shingles, meet on the 8-byte
    * key, and the per-pair match count IS the intersection — no
    * all-pairs join, work ∝ actual shingle collisions. Stop-shingles
    * on the existing side (df > maxBucket) are dropped before the join
    * (they carry no near-dup signal; at harness df the cap never
    * fires, so the oracle equality is untouched — q38's stance).
    */
  def deltaDedup(newDocs: DataFrame, existing: DataFrame, idCol: String,
                 textCol: String, tau: Double = 0.5, w: Int = 3,
                 maxBucket: Int = 256): DataFrame = {
    graft.expr.GraftFunctions.register(newDocs.sparkSession)
    def norm(c: Column) = trim(regexp_replace(lower(c), "\\s+", " "))
    def prep(df: DataFrame, id: String) = df
      .select(col(idCol).as(id), norm(col(textCol)).as("__t"))
      .select(col(id), sha2(col("__t"), 256).as("__h"),
        shingleHashes(split(col("__t"), " "), w).as("__sh"))
    val n = prep(newDocs, "__nid")
    val e = prep(existing, "__eid")
    val eHashes = e.select(col("__h")).distinct()
    val exact = n.join(eHashes, Seq("__h"), "left_semi")
      .select(col("__nid"), lit(1).as("__ex"))
    val rest = n.join(eHashes, Seq("__h"), "left_anti")
    val nIdx = rest.select(col("__nid"), size(col("__sh")).as("na"),
      explode(col("__sh")).as("h"))
    val eIdx = e.select(col("__eid"), size(col("__sh")).as("nb"),
      explode(col("__sh")).as("h"))
    val eCapped = eIdx.join(
      eIdx.groupBy(col("h")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxBucket).select(col("h")),
      Seq("h"), "left_semi")
    val near = nIdx.join(eCapped, Seq("h"))
      .groupBy(col("__nid"), col("__eid"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .filter(col("inter") / (col("na") + col("nb") - col("inter")) >= tau)
      .select(col("__nid")).distinct()
      .withColumn("__nr", lit(1))
    newDocs.select(col(idCol))
      .join(exact, col(idCol) === exact("__nid"), "left").drop("__nid")
      .join(near, col(idCol) === near("__nid"), "left").drop("__nid")
      .select(col(idCol),
        when(col("__ex") === 1, lit("exact_dup"))
          .when(col("__nr") === 1, lit("near_dup"))
          .otherwise(lit("new")).as("status"))
  }

  /** Connected components over a near-dup pair list — the step that
    * turns PAIRS into dedup CLUSTERS (pick one canonical doc per
    * component, drop the rest). Component id = min vertex id reachable.
    *
    * Algorithm: iterative hash-min label propagation. Each round is one
    * equi-join shuffle on vertex id (labels × symmetrized edges →
    * min neighbor label), so a round costs O(|E|) shuffled rows;
    * convergence needs O(graph diameter) rounds — near-dup clusters are
    * shallow (dups of dups), so this is a handful. `localCheckpoint`
    * truncates lineage each round (iterative plans otherwise double in
    * depth per iteration and overwhelm the optimizer). At larger
    * diameters the alternating large-star/small-star formulation
    * (Kiveris et al., "Connected Components in MapReduce") halves round
    * count; hash-min is the right trade for shallow dup graphs.
    *
    * Vertices are those appearing in `edges` — singleton docs (no dup)
    * are not emitted; callers union them back as their own component if
    * needed. Throws if not converged within `maxIter` (a silent
    * non-converged result would be wrong, not approximate).
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20): DataFrame = {
    // LAZY checkpoint + action fusion (r13, guide §1.2): the count that
    // follows is the materializing action, so marking the checkpoint
    // lazy persists the frame as a side effect of a job the loop pays
    // anyway — the eager form ran a separate materialization job first.
    // The same fusion is applied to every round below (the convergence
    // sum doubles as the round's materializer), halving the loop's job
    // count.
    // single-pass symmetrize (r13, guide §7.2): union(edges, swapped)
    // references the edge subtree twice — for q69 that re-ran the whole
    // exact-cosine pair build inside the materialization job; the
    // explode mirror emits both orientations in one pass
    val sym0 = edges.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint(false)
    // The pair graph is orders of magnitude smaller than the corpus that
    // produced it; every round shuffles it, so iteration parallelism must
    // track |E|, not the session default sized for corpus scans (tiny
    // rounds on wide shuffles are pure scheduler overhead). Scope the
    // conf to a cloned session — never mutate the shared one.
    val nEdges = sym0.count()
    val parentP =
      edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val p = math.max(1L, math.min(parentP.toLong, nEdges / 1000000L + 1)).toInt
    val s = edges.sparkSession.newSession()
    s.conf.set("spark.sql.shuffle.partitions", p.toString)
    val sym = s.createDataFrame(sym0.rdd, sym0.schema)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(false) // materialized by the compSum below
    // sum(comp) is strictly decreasing until fixpoint (labels only ever
    // shrink), so an unchanged sum IS convergence — one tiny aggregate
    // action per round instead of a changed-flag scan.
    def compSum(l: DataFrame): Long =
      l.agg(sum(col("comp"))).head.getLong(0)
    var prevSum = compSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // message pass: every vertex offers its comp to each neighbor;
      // min over (own comp ∪ offers) is the hash-min step
      val msgs = sym.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("comp"))
      val minned = labels.select(col("id"), col("comp")).union(msgs)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
      // pointer jump: also adopt comp(comp) — labels chase shortcuts,
      // collapsing chains in O(log diameter) rounds instead of
      // O(diameter). Deliberately ONE jump per round (r13): composing
      // more jumps per round was measured SLOWER — uncut the 3-jump
      // chain 8×'d the round's plan and paid it in optimizer time;
      // with lazy cuts between jumps the nested lazy-checkpoint RDDs
      // degraded 10× — the single jump keeps each round's plan two
      // joins deep and rounds at ~log₂ diameter.
      val jumpSrc = minned
        .select(col("id").as("jid"), col("comp").as("jcomp"))
      val jumped = minned.join(jumpSrc, col("comp") === col("jid"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("jcomp"), col("comp"))).as("comp"))
        .localCheckpoint(false) // materialized by the compSum below
      val s = compSum(jumped)
      converged = s == prevSum
      prevSum = s
      labels = jumped
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** Duplicated-substring span detection (the token-k-gram form of
    * suffix-array substring dedup from Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): find every maximal
    * token span of a document whose k-grams ALL also occur in at least
    * one other document. The output `(doc, span_start, span_end)` is
    * what an excision pass consumes — unlike doc-level dedup, this
    * catches boilerplate shared by documents that are otherwise unique.
    *
    * Mechanics: (1) one narrow pass builds the k-gram relation with
    * positions (array slices, never a token explode); (2) one aggregate
    * keyed by the k-gram finds grams spanning ≥2 docs; (3) a semi-join
    * marks duplicated positions; (4) a per-doc window coalesces
    * consecutive positions into maximal spans via the islands trick
    * (`pos − row_number` is constant within a run of consecutive
    * positions).
    *
    * Scale: the k-gram aggregate is the one wide stage, with map-side
    * combine; the islands window shuffles only (doc, pos) for the
    * duplicated subset. Keys here are the gram TEXT so the oracle can
    * recompute exactly — at 100 TB key both the aggregate and the
    * semi-join by xxhash64(gram) instead (fixed 8-byte keys, same
    * shape; a hash collision can only ADD a span, and only at ~2⁻⁶⁴).
    */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 5): DataFrame = {
    val grams = kgramPositions(docs, idCol, textCol, k)
    // ONE pass over the gram relation (r14, guide §2.4): the old
    // countDistinct aggregate + left-semi computed `grams` twice and
    // shuffled it twice (into the aggregate, then into the join); a
    // kg-keyed window marks a gram occurrence as cross-doc-duplicated
    // iff its bucket spans more than one distinct doc — max(__id) ≠
    // min(__id) ⟺ countDistinct(__id) ≥ 2 — in the same single
    // shuffle. Skew exposure is unchanged: the semi-join also hashed
    // every occurrence of a hot gram to one partition.
    val w = Window.partitionBy(col("kg"))
    val dupPos = grams
      .withColumn("__mx", max(col("__id")).over(w))
      .withColumn("__mn", min(col("__id")).over(w))
      .filter(col("__mx") =!= col("__mn"))
      .select(col("__id"), col("pos"))
    coalesceSpans(dupPos, idCol, k)
  }

  /** The cross-relation form of [[duplicateSpans]] — eval-set
    * DECONTAMINATION at span granularity: every maximal token span of a
    * corpus document whose k-grams all occur somewhere in `ref` (the
    * benchmark/eval set). Doc-level screens (q78's contaminationScreen)
    * tell you WHICH documents overlap; this emits the positions an
    * excision pass cuts so the document's clean remainder survives.
    *
    * Scale: eval sets are tiny next to a 100 TB corpus, so the ref gram
    * set is distinct-ed and BROADCAST — the corpus-side gram relation
    * streams through a broadcast semi-join with no corpus shuffle at
    * all; the only shuffle is the islands window over the (rare) hit
    * positions. Same text-key/oracle trade as [[duplicateSpans]]:
    * production keys by xxhash64(gram).
    */
  def crossDuplicateSpans(corpus: DataFrame, ref: DataFrame,
                          idCol: String, textCol: String,
                          k: Int = 8): DataFrame = {
    val refGrams = broadcast(
      kgramPositions(ref, idCol, textCol, k).select(col("kg")).distinct())
    val hits = kgramPositions(corpus, idCol, textCol, k)
      .join(refGrams, Seq("kg"), "left_semi")
    coalesceSpans(hits, idCol, k)
  }

  /** Intra-document repeated-passage spans: every maximal token span
    * consisting of k-gram start positions whose gram already occurred
    * EARLIER in the same document — the "remove later repetitions"
    * excision pass (CCNet/Gopher-style self-repetition cleanup at span
    * rather than ratio granularity; [[graft.ext.Corpus]] repetition
    * ratios GATE whole docs, this cuts the repeated passage and keeps
    * the rest).
    *
    * Scale: the only wide stage is one window keyed by (doc, gram) —
    * and because both sides of the key live in the same document, it
    * partitions by doc id in practice and never crosses documents; the
    * islands pass reuses the same doc-keyed shuffle. Nothing here
    * touches a corpus-wide gram table, so this composes with (and runs
    * much cheaper than) the cross-doc passes.
    */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    val grams = kgramPositions(docs, idCol, textCol, k)
    val w = Window.partitionBy(col("__id"), col("kg")).orderBy(col("pos"))
    val repeats = grams
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") >= 2)
      .select(col("__id"), col("pos"))
    coalesceSpans(repeats, idCol, k)
  }

  /** Excise flagged token spans from documents — the consumer of
    * [[duplicateSpans]]/[[crossDuplicateSpans]]/[[repeatedSpans]]
    * output: rebuild each document from the tokens OUTSIDE its flagged
    * `[span_start, span_end]` ranges, keeping the clean remainder
    * instead of dropping the whole doc.
    *
    * Scale: one doc-keyed aggregate packs a doc's ranges into a small
    * array (spans per doc are few by construction — they're maximal),
    * one doc-keyed left join carries them to the text, and the rebuild
    * is a narrow indexed-lambda filter per row. Documents with no
    * flagged spans pass through untouched on the null branch — no
    * range array is ever materialized for the clean majority.
    */
  def exciseSpans(docs: DataFrame, spans: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val ranges = spans.groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("__ranges"))
    val toks = filter(split(lower(col(textCol)), " "), t => t =!= lit(""))
    docs.join(ranges, Seq(idCol), "left")
      .select(col(idCol), toks.as("__toks"), col("__ranges"))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        when(col("__ranges").isNull, col("__toks"))
          .otherwise(filter(col("__toks"), (x, i) =>
            !exists(col("__ranges"), r =>
              i.cast("long") >= r.getField("s") &&
                i.cast("long") <= r.getField("e"))))
          .as("__kept"))
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - size(col("__kept"))).cast("long")
          .as("n_removed"),
        array_join(col("__kept"), " ").as("clean_text"))
  }

  /** One narrow pass: the k-gram relation `(__id, pos, kg)` with
    * 0-based start positions, built from array slices (the token stream
    * is never exploded on its own).
    */
  private def kgramPositions(docs: DataFrame, idCol: String,
                             textCol: String, k: Int): DataFrame =
    docs
      .select(col(idCol).as("__id"),
        filter(split(lower(col(textCol)), " "), t => t =!= lit(""))
          .as("__toks"))
      .filter(size(col("__toks")) >= k)
      .select(col("__id"),
        posexplode(transform(sequence(lit(0), size(col("__toks")) - k),
          i => array_join(slice(col("__toks"), i + 1, lit(k)), " ")))
          .as(Seq("pos", "kg")))

  /** Islands coalescing: runs of consecutive duplicated start positions
    * (`pos − row_number` constant within a run) become one maximal span
    * covering `[min pos, max pos + k − 1]` in token coordinates.
    */
  private def coalesceSpans(dupPos: DataFrame, idCol: String,
                            k: Int): DataFrame = {
    val w = Window.partitionBy(col("__id")).orderBy(col("pos"))
    dupPos
      .withColumn("__grp", col("pos") - row_number().over(w))
      .groupBy(col("__id"), col("__grp"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + (k - 1)).cast("long").as("span_end"),
        count(lit(1)).as("n_grams"))
      .withColumn("span_tokens", col("span_end") - col("span_start") + 1)
      .select(col("__id").as(idCol), col("span_start"), col("span_end"),
        col("span_tokens"), col("n_grams"))
  }
}
