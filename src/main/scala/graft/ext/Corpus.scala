package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for a large-scale training-data pipeline
  * (north-star EXT, SURVEY.md §2.14): repetition/quality filtering
  * (Gopher-style), deterministic stratified sampling, shard packing by
  * token budget, and PII scrubbing.
  *
  * Scale design (100 TB stance):
  *  - token stats run as explode → two-stage hash aggregate (map-side
  *    combine on (doc, token)), never a per-row HOF over giant arrays;
  *  - sampling is a pure per-row predicate on a deterministic hash —
  *    no shuffle, no rand() (retries must keep the same sample);
  *  - shard packing cumsums per STRATUM (parallel across strata), not
  *    globally — one global ordered cumsum would serialize the corpus
  *    through a single partition;
  *  - scrubbing is per-row regexp_replace, shuffle-free and codegen'd.
  */
object Corpus {

  /** Per-document token statistics: total tokens, distinct tokens, and
    * the top token's count — the inputs to repetition filters. Explode +
    * two-stage aggregation: both aggregates map-side combine, and the
    * (doc, token) key spreads one document's work across no more than
    * one task without materializing a counts map per row.
    */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(split(lower(col(textCol)), " ")).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("cnt")).as("top_cnt"))

  /** Gopher-style repetition metrics + keep decision: documents whose
    * vocabulary is too repetitive (low distinct ratio, or one token
    * dominating) are flagged for removal.
    */
  def repetitionFilter(docs: DataFrame, idCol: String, textCol: String,
                       minDistinctRatio: Double = 0.45,
                       maxTopFraction: Double = 0.15): DataFrame =
    tokenStats(docs, idCol, textCol)
      .select(col(idCol),
        col("n_tokens"), col("n_distinct"),
        round(col("n_distinct") / col("n_tokens"), 4).as("distinct_ratio"),
        round(col("top_cnt") / col("n_tokens"), 4).as("top_frac"))
      .withColumn("kept",
        col("distinct_ratio") >= minDistinctRatio &&
          col("top_frac") <= maxTopFraction)

  /** Segment-level dedup — the line/paragraph dedup step of web-corpus
    * pipelines (CCNet-style), re-expressed over fixed token windows
    * (this corpus has no newlines): split each document's token stream
    * into consecutive `segLen`-token segments, keep only each distinct
    * segment's FIRST occurrence corpus-wide (ordered by (doc, position) —
    * so within-doc repeats drop too), and reassemble the surviving text
    * per document in original order.
    *
    * Scale design: segments are built in ONE narrow pass (array slices —
    * the token stream is never exploded), so the only wide relation is
    * (segment, doc, pos); first-occurrence marking is a single
    * row_number window shuffle keyed by the segment. The key here is the
    * segment TEXT so the oracle can recompute the ordering exactly — at
    * 100 TB key the window by xxhash64(seg_text) instead (same shuffle
    * shape, fixed-width keys) and keep the text only as a carried value.
    * Reassembly is a hash aggregate back on the already-shuffled doc id.
    */
  def segmentDedup(docs: DataFrame, idCol: String, textCol: String,
                   segLen: Int = 3): DataFrame = {
    val segs = docs
      .select(col(idCol).as("__id"),
        split(lower(col(textCol)), " ").as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col("__id"),
        posexplode(transform(
          sequence(lit(0),
            floor((size(col("__toks")) - 1) / segLen).cast("int")),
          i => array_join(slice(col("__toks"), i * segLen + 1, lit(segLen)), " ")))
          .as(Seq("seg", "seg_text")))
    val w = Window.partitionBy(col("seg_text"))
      .orderBy(col("__id"), col("seg"))
    segs.withColumn("rn", row_number().over(w))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        // collect_list drops the nulls `when` leaves for non-kept rows;
        // array_sort on (seg, seg_text) structs restores document order
        array_join(transform(array_sort(collect_list(
          when(col("rn") === 1, struct(col("seg"), col("seg_text"))))),
          x => x.getField("seg_text")), " ").as("kept_text"))
      .withColumn("kept_frac", round(col("n_kept") / col("n_segs"), 4))
      .select(col("__id").as(idCol), col("n_segs"), col("n_kept"),
        col("kept_frac"), col("kept_text"))
  }

  /** Deterministic per-row sample bucket in [0, 1000): multiplicative
    * (Knuth) hash of a key column — reproducible across retries and
    * re-runs, and recomputable by any engine (plain integer math, unlike
    * xxhash64). For keys with adversarial structure prefer
    * [[sampleBucketStrong]]; for sequential ids the multiplicative mix
    * is uniform enough and oracle-checkable.
    */
  def sampleBucket(key: Column): Column =
    // reduce mod 1000 BEFORE multiplying: ((a mod m)·K) mod m = (a·K)
    // mod m exactly, and 999·K fits in Int64 — so neither this side nor
    // a recomputing oracle ever overflows/wraps at large ids (DuckDB
    // raises on BIGINT overflow where Spark would wrap silently)
    pmod(pmod(key.cast("long"), lit(1000L)) * lit(2654435761L), lit(1000L))

  /** xxhash64 variant of [[sampleBucket]] — stronger mixing for string
    * or structured keys; not recomputable outside Spark.
    */
  def sampleBucketStrong(key: Column*): Column =
    pmod(xxhash64(key: _*), lit(1000L))

  /** Stratified deterministic sample: keep a row iff its sample bucket
    * falls under its stratum's permille rate. A pure per-row predicate —
    * pushes to the scan, no shuffle, no rand(); re-running the pipeline
    * (or retrying a task) selects the identical sample.
    */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
                       permille: Map[String, Long],
                       defaultPermille: Long): DataFrame =
    df.filter(sampleBucket(key) <
      coalesce(element_at(typedlit(permille), stratum), lit(defaultPermille)))

  /** Pack documents into training shards by cumulative weight (e.g.
    * token count): shard k holds rows while the running total sits in
    * [k·budget, (k+1)·budget). Cumsum is PER STRATUM — strata process in
    * parallel; the ordering column makes assignment deterministic. The
    * current row's weight is excluded from its own threshold so the
    * first row of each stratum always lands in shard 0 even when it
    * exceeds the budget alone.
    */
  def packShards(df: DataFrame, stratum: Column, order: Column,
                 weight: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__w", weight)
      .withColumn("shard",
        floor((sum(col("__w")).over(w) - col("__w")) / budget))
      .drop("__w")
  }

  /** Deterministic train/test split on a hash of the key: same pure
    * per-row predicate machinery as [[stratifiedSample]], so assignment
    * is stable across retries/re-runs and never shuffles. Split by
    * DOCUMENT IDENTITY (an id, a URL), never by row position — position
    * is partitioning-dependent and would reassign rows on re-layout.
    */
  def trainTestSplit(df: DataFrame, key: Column, testPermille: Long): DataFrame =
    df.withColumn("split",
      when(sampleBucket(key) < testPermille, lit("test")).otherwise(lit("train")))

  /** Cross-split leakage detection: a fingerprint (e.g. a hash of the
    * normalized text) that appears in more than one split means the
    * test set leaks into training. One hash-partitioned aggregation on
    * the fingerprint — both the count-distinct-splits and the join back
    * shuffle on the fingerprint key, so the work spreads by content, not
    * by document count per split. Returns the input plus `n_splits`
    * (how many distinct splits this row's fingerprint occurs in) and
    * `leaked` (n_splits > 1).
    */
  def crossSplitLeakage(df: DataFrame, splitCol: Column,
                        fingerprint: Column): DataFrame = {
    val tagged = df.withColumn("__fp", fingerprint)
    val spread = tagged.groupBy(col("__fp"))
      .agg(countDistinct(splitCol).as("n_splits"))
    // left join + coalesce: a NULL fingerprint never equi-joins, but the
    // row must still come back (contract: input + columns). Null
    // fingerprints are unmatchable content → n_splits 1, never leaked.
    tagged.join(spread, Seq("__fp"), "left")
      .withColumn("n_splits", coalesce(col("n_splits"), lit(1L)))
      .withColumn("leaked", col("n_splits") > 1)
      .drop("__fp")
  }

  /** Word n-grams of an already-split words array, as space-joined
    * strings (engine-portable — any SQL engine can rebuild them, unlike
    * hashed shingles). Empty array when the document is shorter than n.
    */
  def wordNgrams(words: Column, n: Int): Column =
    when(size(words) >= n,
      transform(sequence(lit(1), size(words) - (n - 1)),
        i => array_join(slice(words, i, lit(n)), " ")))
      .otherwise(typedlit(Seq.empty[String]))

  /** Benchmark-contamination screen: flag corpus documents sharing any
    * word n-gram with a benchmark/eval set. Returns one row per corpus
    * document THAT HAS AT LEAST ONE n-gram (documents shorter than `n`
    * words produce none, cannot be n-gram-contaminated, and are absent —
    * callers computing corpus-wide rates should take the denominator
    * from the input, not this output), with `n_ngrams` (distinct
    * n-grams), `n_hit` (n-grams also present in the benchmark), and
    * `overlap` (= n_hit / n_ngrams).
    *
    * Scale design: the benchmark set is small by nature (eval suites,
    * not corpora) — its distinct n-grams BROADCAST, so the corpus side
    * is a scan + generate + map-side semi probe with one aggregation
    * shuffled on doc id; the 100 TB corpus never shuffles its text. For
    * benchmark sets too large to broadcast, swap the join for
    * [[graft.ops.BloomJoin]] on hashed n-grams.
    */
  def contaminationScreen(corpus: DataFrame, bench: DataFrame,
                          idCol: String, textCol: String,
                          n: Int = 8): DataFrame = {
    // distinct + join run on the 64-bit xxhash of each n-gram, not the
    // string: the dedup shuffle carries 8 bytes per gram instead of the
    // n-word text (same trade q38 makes; counts identical up to ~2⁻⁶⁴
    // within-document collisions). The grams come from the native
    // ShingleHashes pass (byte-identical to xxhash64 of the space-joined
    // gram, per-doc-distinct inside the expression) — no interpreted
    // HOF string building and no cross-corpus (doc, gram) dedup
    // shuffle; the pre-filter preserves the shorter-than-n absence
    // contract (ShingleHashes would otherwise hash short docs whole).
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    def grams(df: DataFrame) =
      df.select(col(idCol), split(lower(col(textCol)), " ").as("__toks"))
        .filter(size(col("__toks")) >= n)
        .select(col(idCol),
          explode(graft.ext.NearDup.shingleHashes(col("__toks"), n))
            .as("ngh"))
    // single pass over the corpus grams: mark hits via the broadcast
    // bench set (left join), then one aggregation produces totals AND
    // hit counts — not two scans of the exploded corpus
    val benchGrams = broadcast(
      grams(bench).select(col("ngh")).distinct().withColumn("__hit", lit(1L)))
    grams(corpus).join(benchGrams, Seq("ngh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hit"))
      .select(col(idCol), col("n_ngrams"), col("n_hit"),
        round(col("n_hit") / col("n_ngrams"), 4).as("overlap"))
  }

  /** Rebalance a corpus to target stratum SHARES (domain-mixture
    * control: "make the training mix 50% en / 30% de / 20% zh") by
    * deterministic downsampling. The largest feasible total is
    * T = min over strata of nₛ/tₛ (downsample-only — no stratum can be
    * upsampled); each stratum then keeps ≈ T·tₛ rows via a permille
    * threshold on the [[sampleBucket]] hash. Strata absent from
    * `targetShares` are dropped (share 0).
    *
    * Scale design: one tiny counts aggregate, then the keep decision is
    * a broadcast-joined per-row predicate — the 100 TB corpus is
    * scanned once and never shuffled; re-runs/retries keep the
    * identical sample (no rand()).
    */
  def rebalanceMixture(df: DataFrame, stratum: Column, key: Column,
                       targetShares: Map[String, Double]): DataFrame = {
    val counts = df.groupBy(stratum.as("__st")).agg(count(lit(1)).as("__n"))
    val withT = counts
      .withColumn("__t", element_at(typedlit(targetShares), col("__st")))
      .filter(col("__t").isNotNull)
      .withColumn("__cap", col("__n") / col("__t"))
    // global min over the per-stratum counts table (rows = #strata, a
    // handful — the unpartitioned window never sees corpus-sized data).
    // NB: "__tmin", not "__T" — column resolution is case-insensitive
    // by default, so "__T" would capture references to "__t".
    val rates = withT
      .withColumn("__tmin", min(col("__cap")).over(Window.partitionBy()))
      .withColumn("__permille",
        floor(lit(1000.0) * col("__tmin") * col("__t") / col("__n")))
      .select(col("__st"), col("__permille"))
    df.join(broadcast(rates), stratum === col("__st"))
      .filter(sampleBucket(key) < col("__permille"))
      .drop("__st", "__permille")
  }

  /** EXACT-k deterministic sample per stratum (eval/holdout sets want
    * exact sizes; [[stratifiedSample]]'s rate predicate gives binomial
    * counts). Rank rows inside each stratum by their sample-bucket hash
    * (ties by the key itself) and keep the first k — stable under
    * re-runs and additive: growing the corpus only swaps rows whose
    * hash rank crosses the k boundary. One window shuffle, strata rank
    * in parallel.
    */
  def exactKSample(df: DataFrame, key: Column, stratum: Column,
                   k: Int): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(sampleBucket(key), key)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Weighted exact-k sampling, Efraimidis–Spirakis A-Res form with
    * DETERMINISTIC per-row uniforms from [[sampleBucket]]: priority =
    * u^(1/w), sample = the k largest priorities (ties → key). Inclusion
    * probability scales with weight as in the randomized original, but
    * retries, re-runs, and other engines reproduce the identical set —
    * the q57/q96 reproducibility story, weighted. Global top-k plans as
    * TakeOrderedAndProject (O(k) per partition, no full sort). Rows
    * with null or non-positive weight are excluded (u^(1/w) is
    * undefined there, matching the A-Res precondition w > 0).
    */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
                     k: Int): DataFrame = {
    val u = (sampleBucket(key).cast("double") + lit(0.5)) / lit(1000.0)
    df.filter(weight.isNotNull && weight > 0)
      .withColumn("__pri", pow(u, lit(1.0) / weight.cast("double")))
      .orderBy(col("__pri").desc, key)
      .limit(k)
      .drop("__pri")
  }

  /** Vocabulary-coverage / OOV-rate audit: build the top-`vocabSize`
    * vocabulary by DOCUMENT frequency (ties → lexicographic term), then
    * score every document's out-of-vocabulary token ratio and roll up
    * per stratum. Two corpus passes by necessity — the vocabulary is a
    * global artifact computed before coverage; at 100 TB the df pass
    * runs over a persisted postings relation or a stratified sample.
    * The vocabulary (≤ vocabSize rows) broadcasts, so the coverage pass
    * is explode → broadcast left join → two map-side-combined
    * aggregates; document text never shuffles.
    */
  def vocabCoverage(docs: DataFrame, idCol: String, textCol: String,
                    stratum: Column, vocabSize: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"), stratum.as("__st"),
      explode(filter(split(lower(col(textCol)), " "), t => t =!= lit("")))
        .as("term"))
    val vocab = toks.select(col("__id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term")).limit(vocabSize)
      .select(col("term"), lit(true).as("__inv"))
    toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("__id"), col("__st"))
      .agg(count(lit(1)).as("n_toks"),
        sum(when(col("__inv"), lit(0L)).otherwise(lit(1L))).as("n_oov"))
      .groupBy(col("__st").as("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_oov").cast("double") / col("n_toks")), 4)
          .as("avg_oov"),
        sum(when(col("n_oov") === 0, lit(1L)).otherwise(lit(0L)))
          .as("full_cover"))
  }

  /** DSIR-style importance weighting: score every document by the
    * average per-token log-likelihood ratio between a TARGET unigram
    * model (rows where `isTarget`) and the REFERENCE model (the whole
    * corpus), both add-one smoothed over the shared vocabulary —
    * "select source data that looks like the target domain", the
    * importance-resampling selection step. `lr6 ≥ 0` means the target
    * model likes the document at least as much as the reference.
    *
    * Engine-portable float chain (the q145 KL discipline): integer
    * counts, per-token term rounded to 12 dp BEFORE the per-doc sum,
    * ONE division by n_toks, final [[graft.Graft.roundz]] to 6 (the
    * ratio straddles zero, so signed-zero normalization applies).
    *
    * Plan shape: one tokenize pass, one (tok) count aggregate with the
    * target/reference counts FUSED (conditional sum — one shuffle, not
    * two), totals as a one-row broadcast, then tokens join the O(vocab)
    * weight table and one per-doc aggregate. At 100 TB production DSIR
    * hashes tokens into B buckets, capping the weight table at O(B) and
    * making that join a broadcast; the exact-token form here keeps the
    * features DuckDB-recomputable — the plumbing is identical.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"), isTarget.as("__t"),
      explode(filter(split(lower(col(textCol)), " "), t => t =!= lit("")))
        .as("tok"))
    val counts = toks.groupBy(col("tok"))
      .agg(sum(when(col("__t"), lit(1L)).otherwise(lit(0L))).as("kt"),
        count(lit(1)).as("kr"))
    val tot = counts.agg(sum(col("kt")).as("nt"), sum(col("kr")).as("nr"),
      count(lit(1)).as("v"))
    val term = counts.crossJoin(broadcast(tot))
      .select(col("tok"),
        round(log((col("kt") + 1) * lit(1.0) / (col("nt") + col("v"))) -
              log((col("kr") + 1) * lit(1.0) / (col("nr") + col("v"))), 12)
          .as("__lr"))
    toks.join(term, Seq("tok"))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_toks"), sum(col("__lr")).as("__s"))
      .withColumn("lr6", graft.Graft.roundz(col("__s") / col("n_toks"), 6))
      .withColumn("selected", col("lr6") >= 0.0)
      .drop("__s")
  }

  /** Bigram-LM perplexity scoring (the CCNet-style statistical quality
    * filter): train add-one-smoothed bigram counts on a REFERENCE slice
    * of the corpus, then score every candidate document by its average
    * bigram log-probability — low-perplexity docs read like the
    * reference; gibberish and boilerplate score high. Returns one row
    * per candidate with ≥2 tokens: `n_bigrams`, `n_unseen` (bigrams
    * absent from the reference — integer, bit-deterministic) and `ppl`
    * (exp of the negated mean log-prob, rounded).
    *
    * P(w2|w1) = (C(w1 w2) + 1) / (C(w1) + V), V = reference unigram
    * vocabulary size. Bigrams come from the native [[graft.expr.WordShingles]]
    * pass (positional, no dedup).
    *
    * Scale design: the count tables are corpus-derived, so they are
    * JOINED on their keys (bigram string / first word), never broadcast
    * — at 100 TB the LM itself is tens of billions of rows and must
    * shuffle; candidate text is tokenized once and only (doc, bigram)
    * pairs move. V rides as a one-row broadcast (q46's scalar class).
    */
  def bigramLmScore(candidates: DataFrame, reference: DataFrame,
                    idCol: String, textCol: String): DataFrame = {
    graft.expr.GraftFunctions.register(candidates.sparkSession)
    def toks(df: DataFrame) = df
      .select(col(idCol),
        filter(split(lower(col(textCol)), " "), t => t =!= lit(""))
          .as("__toks"))
      .filter(size(col("__toks")) >= 2)
    def bigrams(df: DataFrame) = toks(df).select(col(idCol),
      explode(graft.ext.NearDup.shingleStrings(col("__toks"), 2)).as("bg"))
    val cBi = bigrams(reference)
      .groupBy(col("bg")).agg(count(lit(1)).as("c_bg"))
    val unis = toks(reference)
      .select(explode(col("__toks")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c_w"))
    val vocab = unis.agg(count(lit(1)).as("v_size"))
    bigrams(candidates)
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(cBi, Seq("bg"), "left")
      .join(unis, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("lp",
        log((coalesce(col("c_bg"), lit(0L)) + lit(1L)) /
          (coalesce(col("c_w"), lit(0L)) + col("v_size"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c_bg").isNull, 1L).otherwise(0L)).as("n_unseen"),
        round(exp(-avg(col("lp"))), 4).as("ppl"))
  }

  /** Linear quality-classifier INFERENCE (the fastText-style keep/drop
    * scorer): per-token weights looked up from a hashed feature table,
    * mean-pooled, squashed through a sigmoid, thresholded. The weight
    * function here is a deterministic arithmetic stand-in (token length
    * and first/last code points — an honest stub, same stance as the
    * multimodal decode): a real model would broadcast its weight array
    * and hash tokens into it; the SHAPE — narrow per-row HOF fold, no
    * shuffle, no UDF — is exactly what a 100 TB inference scan needs.
    * Output: `n_toks`, `score` (rounded sigmoid), `keep`.
    */
  def qualityScoreLinear(docs: DataFrame, idCol: String, textCol: String,
                         threshold: Double = 0.5): DataFrame = {
    val toksC = filter(split(lower(col(textCol)), " "), t => t =!= lit(""))
    val w = (t: Column) =>
      ((length(t) * 37 + ascii(substring(t, 1, 1)) * 17 +
        ascii(substring(t, -1, 1))) % 201 - 100).cast("double") / 100.0
    docs.select(col(idCol), toksC.as("__toks"))
      .filter(size(col("__toks")) > 0)
      .withColumn("__s",
        aggregate(col("__toks"), lit(0.0), (acc, t) => acc + w(t)))
      .select(col(idCol), size(col("__toks")).as("n_toks"),
        round(lit(1.0) / (lit(1.0) + exp(-col("__s") / size(col("__toks")))), 4)
          .as("score"))
      .withColumn("keep", col("score") >= threshold)
  }

  /** Pack documents into fixed-length training SEQUENCES, splitting
    * documents across sequence boundaries (the packing step before
    * tokenized examples — [[packShards]] is the file-level sibling that
    * never splits). Per-stratum token cumsum gives each doc its global
    * offset; a doc spanning [st, st+n) yields one row per overlapped
    * sequence with the token sub-range `[tok_start, tok_end)`. Every
    * sequence is exactly `seqLen` tokens except each stratum's last.
    *
    * Scale: cumsum parallelizes across strata (one window shuffle on
    * the stratum key); the explode emits ⌈n/seqLen⌉+1 rows per doc —
    * integer math only, no token materialization.
    */
  def sliceSequences(df: DataFrame, stratum: Column, order: Column,
                     nTokens: Column, seqLen: Long): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__n", nTokens)
      .withColumn("__st", sum(col("__n")).over(w) - col("__n"))
      // zero-weight docs emit NO slice rows: unguarded, sequence(a, a-1)
      // would count DOWN ([a, a-1]) and fabricate a seq_id = -1 row at
      // stratum start; explode of the empty array drops the row instead
      .withColumn("seq_id",
        explode(when(col("__n") > 0,
          sequence(floor(col("__st") / seqLen),
            floor((col("__st") + col("__n") - 1) / seqLen)))
          .otherwise(typedlit(Seq.empty[Long]))))
      .withColumn("tok_start", greatest(col("__st"), col("seq_id") * seqLen))
      .withColumn("tok_end",
        least(col("__st") + col("__n"), (col("seq_id") + 1) * seqLen))
      .drop("__n", "__st")
  }

  /** Overlapping fixed-size token chunks (stride < chunkLen ⇒ adjacent
    * chunks share chunkLen−stride tokens) — the retrieval/RAG chunking
    * shape, vs [[sliceSequences]]' disjoint budget packing. One NARROW
    * pass: tokens from a per-row split, chunk starts from an exploded
    * integer sequence, chunk text from an array slice — tokens never
    * explode and nothing shuffles; at 100 TB this is a map-only stage
    * whose output fans out ~n/stride rows per doc.
    *
    * n_chunks = 1 + ceil(max(n − chunkLen, 0) / stride): every token is
    * covered (guaranteed by stride ≤ chunkLen, enforced below — a larger
    * stride would leave gaps between adjacent chunks), the last chunk may
    * be short, a short/empty doc yields exactly one chunk row.
    */
  def chunkOverlap(docs: DataFrame, idCol: String, textCol: String,
                   chunkLen: Int, stride: Int): DataFrame = {
    require(chunkLen > 0 && stride > 0,
      s"chunkOverlap: chunkLen ($chunkLen) and stride ($stride) must be > 0")
    require(stride <= chunkLen,
      s"chunkOverlap: stride ($stride) > chunkLen ($chunkLen) would leave token gaps")
    docs
      .withColumn("__toks", split(col(textCol), " "))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        expr(s"(greatest(0L, __n - $chunkLen) + ${stride - 1}) div $stride"))))
      .withColumn("tok_start", col("chunk_idx") * stride)
      .withColumn("chunk",
        array_join(slice(col("__toks"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(chunkLen)), " "))
      .withColumn("n_toks",
        least(lit(chunkLen.toLong), col("__n") - col("tok_start")))
      .drop("__toks", "__n")
  }

  /** Per-stratum top-p (nucleus) selection under a token budget: order
    * docs by quality (desc, id tiebreak) and keep the smallest prefix
    * whose token mass reaches share `permille`/1000 of the stratum
    * total — "spend the budget on the best docs first", the
    * quality-ordered complement of rate sampling ([[stratifiedSample]])
    * and exact-k ([[exactKSample]]). The boundary doc (the one whose
    * inclusion crosses the budget) is kept, so the target share is
    * always reached. The keep test is integer-exact (no float share
    * drift): 1000·(cum − tok) < permille·total.
    *
    * Shuffle profile: ONE hash exchange on the stratum key serves both
    * windows (ordered running sum + unordered total); at 100 TB the
    * running sum is per-stratum sequential — strata are the unit of
    * parallelism, matching every other per-stratum op here.
    */
  def topPBudget(df: DataFrame, stratum: Column, score: Column,
                 tie: Column, tokens: Column, permille: Long): DataFrame = {
    require(permille >= 0 && permille <= 1000,
      s"topPBudget: permille ($permille) must be in [0, 1000]")
    val ord = Window.partitionBy(stratum).orderBy(score.desc, tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(stratum)
    df.withColumn("__tok", tokens)
      .withColumn("__cum", sum(col("__tok")).over(ord))
      .withColumn("__total", sum(col("__tok")).over(all))
      .withColumn("kept",
        (col("__cum") - col("__tok")) * 1000L < col("__total") * permille)
      .drop("__tok")
  }

  /** Deterministic dense ids 0..n-1 in `order`-column order — the
    * distributed zipWithIndex: training pipelines need stable dense ids
    * (example ids, vocab ids) and `row_number() OVER (ORDER BY ...)` is
    * a single-partition serialization of the corpus at 100 TB. Instead:
    * range-partition by the order column ONCE, rank within partitions
    * in parallel, add broadcast cumulative partition offsets.
    *
    * The checkpoint after the range exchange is load-bearing, not a
    * cache hint: the offsets branch and the ranking branch both consume
    * `parts`, and two independent re-evaluations would run two
    * RangePartitioners whose boundary SAMPLING is seeded by each
    * exchange's RDD id — at any scale where the sampler sees a subset,
    * the branches could disagree on boundaries and emit duplicate +
    * missing ids. One materialization = one sampling = one truth.
    *
    * Shuffle profile: the range exchange moves the data once; the
    * per-partition window adds a hash exchange on __pid (cheap keys,
    * already clustered). The win over a global window is parallelism —
    * no stage runs on one partition. `order` must be unique (ids are
    * deterministic only if the total order is).
    *
    * Durability trade-off: the default `localCheckpoint` stores the
    * materialized partitions on EXECUTOR-LOCAL storage with lineage
    * truncated — fast, but an executor loss/decommission after the
    * checkpoint makes those partitions unrecoverable and fails the job.
    * Right for short interactive jobs; for long-running 1000-executor
    * runs pass `reliableCheckpoint = true` (requires
    * `sparkContext.setCheckpointDir` to a cluster-visible path) to pay
    * one write to reliable storage for fault-tolerant re-reads.
    */
  def denseIds(df: DataFrame, order: Column, partitions: Int = 0,
               reliableCheckpoint: Boolean = false): DataFrame = {
    val n = if (partitions > 0) partitions
      else df.sparkSession.sparkContext.defaultParallelism
    val ranged = df.repartitionByRange(n, order)
      .withColumn("__pid", spark_partition_id())
    val parts =
      if (reliableCheckpoint) ranged.checkpoint(true)
      else ranged.localCheckpoint(true)
    val offsets = parts.groupBy(col("__pid")).count()
      .withColumn("__offset",
        coalesce(sum(col("count")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__offset"))
    val w = Window.partitionBy(col("__pid")).orderBy(order)
    parts.join(broadcast(offsets), Seq("__pid"))
      .withColumn("dense_id",
        row_number().over(w).cast("long") + col("__offset") - 1L)
      .drop("__pid", "__offset")
  }

  /** Canonical-document selection: given duplicate-cluster assignments
    * (e.g. [[graft.ext.NearDup.connectedComponents]] output), keep ONE
    * representative per cluster — the highest-`quality` row, ties broken
    * by smallest `order` (deterministic). One hash-partitioned window
    * per cluster key; no shuffle of non-cluster rows if pre-filtered.
    */
  def keepCanonical(df: DataFrame, cluster: Column, quality: Column,
                    order: Column): DataFrame = {
    val w = Window.partitionBy(cluster).orderBy(quality.desc, order.asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1).drop("__rk")
  }

  /** Boilerplate/markup strip for scraped corpora: drop
    * script/style elements WITH their content, strip remaining tags,
    * decode the common entities, collapse whitespace. RE2-compatible
    * patterns (no backrefs/lookahead) so any engine — and the DuckDB
    * oracle — reproduces them; per-row regexp chain, shuffle-free and
    * codegen'd like [[scrubPii]]. Whitespace is an EXPLICIT class, not
    * `\s`: Java's `\s` includes \x0B where RE2's does not, so the
    * shorthand silently diverges across engines on vertical-tab input —
    * explicit classes mean both engines run the identical automaton.
    */
  def stripMarkup(text: Column): Column = {
    val noScript = regexp_replace(text,
      "<(script|style)[^>]*>[^<]*</(script|style)>", " ")
    val noTags = regexp_replace(noScript, "<[^>]*>", " ")
    // entity order matters: &amp; must decode LAST, or doubly-escaped
    // text ("&amp;lt;" = the literal string "&lt;") double-unescapes
    val decoded = regexp_replace(
      regexp_replace(
        regexp_replace(noTags, "&lt;", "<"),
        "&gt;", ">"),
      "&amp;", "&")
    trim(regexp_replace(decoded, "[ \\t\\n\\f\\r]+", " "))
  }

  /** Email addresses → `<EMAIL>`, hyphen/dot-delimited US phone numbers
    * → `<PHONE>`. Patterns restricted to RE2-compatible constructs
    * (character classes + \b) so any engine reproduces them; replace is
    * global in both Spark and DuckDB.
    */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhonePattern = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** One BPE merge iteration's pair statistics: the frequency of every
    * adjacent symbol pair (here: character bigram inside a word),
    * weighted by word frequency — the quantity `argmax`-ed by each
    * byte-pair-encoding training step (Sennrich et al. 2016).
    *
    * The classic BPE trick makes this cheap at corpus scale: pair
    * counting runs over the DISTINCT-word vocabulary with multiplicity
    * weights, not over the token stream. Plan: one corpus-wide word
    * count (the only big shuffle, with map-side combine — the vocabulary
    * is orders of magnitude smaller than the corpus), then a narrow
    * per-word pair expansion over the vocabulary and a second, tiny
    * aggregate; top-N via TakeOrdered (no global sort). Iterating BPE
    * re-runs only the vocabulary-side stages — the corpus is scanned
    * once, ever.
    *
    * Ordering is total (count desc, then pair asc) so the top-N cut is
    * deterministic and oracle-checkable.
    */
  /** Fill-in-the-middle (FIM) training-example construction (Bavarian
    * et al. 2022): split each document's token stream into
    * prefix/middle/suffix at deterministic cut points (⌊n/3⌋ and
    * ⌊2n/3⌋ — production uses a seeded hash of the doc id through the
    * same plumbing) and re-serialize in PSM order
    * (`<fim_prefix> P <fim_suffix> S <fim_middle> M`), the layout that
    * teaches infilling while keeping the target contiguous at the end.
    *
    * A pure per-row projection: array slices + concat, no shuffle, no
    * UDF — at 100 TB this is a map over the corpus scan and the
    * sentinel strings ride through whatever tokenizer pass follows.
    */
  def fimExamples(docs: DataFrame, idCol: String, textCol: String,
                  minTokens: Int = 12): DataFrame = {
    val toks = filter(split(lower(col(textCol)), " "), t => t =!= lit(""))
    docs
      .select(col(idCol), toks.as("__toks"))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .filter(col("n_tokens") >= minTokens)
      .withColumn("__p1", (col("n_tokens") / 3).cast("int"))
      .withColumn("__p2", (col("n_tokens") * 2 / 3).cast("int"))
      .select(col(idCol), col("n_tokens"),
        col("__p1").cast("long").as("n_prefix"),
        (col("__p2") - col("__p1")).cast("long").as("n_middle"),
        (col("n_tokens") - col("__p2")).cast("long").as("n_suffix"),
        concat(lit("<fim_prefix> "),
          array_join(slice(col("__toks"), lit(1), col("__p1")), " "),
          lit(" <fim_suffix> "),
          array_join(slice(col("__toks"), col("__p2") + 1,
            size(col("__toks")) - col("__p2")), " "),
          lit(" <fim_middle> "),
          array_join(slice(col("__toks"), col("__p1") + 1,
            col("__p2") - col("__p1")), " ")).as("psm"))
  }

  def bpePairCounts(docs: DataFrame, textCol: String,
                    topN: Int = 30): DataFrame = {
    val vocab = docs
      .select(explode(
        filter(split(lower(col(textCol)), " "), t => t =!= lit("")))
        .as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    vocab
      .filter(length(col("w")) >= 2)
      .select(col("wc"),
        explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("wc")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(topN)
  }

  /** Temperature-based mixture sampling (the mT5/XLM-R α-smoothing
    * rule, α = 0.5): sampling mass per stratum ∝ n^α, so low-resource
    * strata are up-weighted relative to their share without drowning
    * the head. Per-stratum keep probability p = min(1, B·(w/W)/n)
    * with w = √n (sqrt, not pow — sqrt is correctly-rounded IEEE on
    * every engine, pow is not), floored to integer BASIS POINTS so the
    * keep decision is an integer compare against the deterministic
    * doc-id hash (q57's scan predicate — no rand(), retries resample
    * identically). Plan: one tiny stratum count, rates as a broadcast
    * joined back on the stratum key, then a pure scan predicate —
    * corpus-side work is one narrow pass.
    */
  def temperatureSample(docs: DataFrame, keyCol: Column, idCol: Column,
                        budget: Long): DataFrame = {
    val counts = docs.groupBy(keyCol.as("__k"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", sqrt(col("__n").cast("double")))
    // W as a global-window sum over the stratum table (a handful of
    // rows — no self-join, no driver collect). NOT named "__W":
    // Spark's default case-INsensitive resolution would make
    // withColumn overwrite "__w".
    val rates = counts
      .withColumn("__wsum", sum(col("__w"))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1))))
      .select(col("__k"),
        floor(least(lit(1.0),
          lit(budget.toDouble) * (col("__w") / col("__wsum")) / col("__n"))
          * 10000).cast("long").as("rate_bp"))
    docs.join(broadcast(rates), keyCol === col("__k"))
      // reduce-first (see sampleBucket): identical values, overflow-safe
      .filter(pmod(pmod(idCol.cast("long"), lit(10000L)) * 2654435761L,
        lit(10000L)) < col("rate_bp"))
      .drop("__k")
  }

  /** One left-to-right, non-overlapping BPE merge pass over a symbol
    * array: every adjacent (a, b) becomes the single symbol a+b, and a
    * freshly merged symbol is NOT re-matched as the left side of the
    * same pass ("l l l" → ["ll", "l"], the Sennrich 2016 semantics).
    * A pure indexed fold — narrow, no shuffle.
    */
  def applyBpeMerge(toks: Column, a: String, b: String): Column =
    aggregate(toks, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Learn `k` BPE merges from a counted vocabulary (w, wc) — the
    * distributed form of byte-pair-encoding training: after ONE corpus
    * word-count pass (the caller's [[bpePairCounts]]-style aggregate),
    * every training iteration touches only the DISTINCT-word vocab,
    * which is bounded by language, not corpus size (~10⁶ rows at any
    * scale — this is why production BPE trainers count words first).
    * Per round: adjacent-pair counts weighted by wc (one tiny
    * aggregate), argmax under the total order (count desc, pair), one
    * [[applyBpeMerge]] map. State is localCheckpoint'ed per round (the
    * q69 connected-components discipline) so round r's plan does not
    * replay rounds 1..r−1; the argmax is a 1-row collect — bounded
    * driver material, the PQ-codebook/k-means precedent.
    */
  def bpeLearn(vocab: DataFrame, wCol: String, wcCol: String,
               k: Int): Seq[(String, String)] = {
    var state = vocab
      .select(col(wcCol).as("__wc"), split(col(wCol), "").as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    for (_ <- 1 to k) {
      val best = state
        .filter(size(col("__toks")) >= 2)
        .select(col("__wc"),
          explode(transform(sequence(lit(1), size(col("__toks")) - 1),
            i => struct(element_at(col("__toks"), i).as("a"),
              element_at(col("__toks"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("__wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.nonEmpty) {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        // lazy cut + action fusion (r14, the r13 loop discipline): the
        // next round's best-pair collect is the materializing action,
        // so the eager per-round checkpoint job is saved — one job per
        // merge round instead of two. (Not nested: each round's state
        // is materialized by its collect before the next builds on it.)
        state = state
          .withColumn("__toks", applyBpeMerge(col("__toks"), a, b))
          .localCheckpoint(false)
      }
    }
    merges.result()
  }

  /** Apply a learned merge list to a word column: chars → fold each
    * merge in priority order (one [[applyBpeMerge]] pass per merge —
    * the standard apply algorithm). Pure per-row projection: zero
    * shuffle, a map fused into whatever scan feeds it; at 100 TB the
    * encode of a corpus is exactly this expression over the document
    * scan (or over the distinct-word vocab + a re-join, when words
    * repeat enough to amortize).
    */
  def bpeEncode(words: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(split(words, "")) {
      case (toks, (a, b)) => applyBpeMerge(toks, a, b)
    }

  /** k-anonymity suppression over quasi-identifier columns — the
    * aggregate privacy guard beside [[scrubPii]]'s per-row regexes: any
    * combination of quasi values shared by fewer than `k` rows is
    * suppressed (every quasi column → "*"), so no released row's quasi
    * tuple isolates fewer than k individuals. One count over the quasi
    * key (window form here; the equivalent aggregate-then-join-back
    * spelling shuffles the same key once and broadcasts the rare-group
    * set when it is small — the 100 TB variant). Adds
    * `anon_suppressed`; deterministic, no generalization hierarchy —
    * suppression is the conservative base policy.
    */
  def kAnonymize(df: DataFrame, quasi: Seq[String], k: Long): DataFrame = {
    require(quasi.nonEmpty && k > 0)
    val w = Window.partitionBy(quasi.map(col): _*)
    val withN = df.withColumn("__n", count(lit(1)).over(w))
    quasi.foldLeft(withN) { (d, q) =>
      d.withColumn(q, when(col("__n") >= k, col(q)).otherwise(lit("*")))
    }.withColumn("anon_suppressed", col("__n") < k).drop("__n")
  }

  /** Input/output rows of [[packBinsFFD]]. */
  case class DocW(id: Long, stratum: String, w: Long)
  case class PackedDoc(id: Long, stratum: String, w: Long,
                       bin: Long, nf_bin: Long)

  /** First-fit-decreasing bin packing per stratum — [[packShards]]'s
    * quality upgrade when padding waste matters (context-window packing
    * for training batches): the cumsum form fills shards in arrival
    * order and lets the straddling document overflow its shard; FFD
    * sorts each stratum's documents by descending weight and places
    * each in the FIRST bin it fits, so no bin ever exceeds `budget`
    * (callers filter documents with w > budget — an oversized document
    * would otherwise open its own over-budget bin) and the bin count is
    * within 11/9·OPT + 1. Sequential by nature, so the parallel unit is
    * the STRATUM: one `repartition(stratum)` + in-partition sort, then
    * one mapPartitions pass; at 100 TB a hot stratum salts into S
    * sub-streams packed independently (bin ids offset by sub-stream —
    * the FFD bound holds per sub-stream). `nf_bin` is the bin next-fit
    * would assign ON THE SAME sorted order, emitted from the same pass
    * so callers (and the q212 contract) can pin that first-fit never
    * loses to the one-open-bin strategy it strictly generalizes.
    */
  def packBinsFFD(docs: org.apache.spark.sql.Dataset[DocW],
                  budget: Long): org.apache.spark.sql.Dataset[PackedDoc] = {
    require(budget > 0)
    implicit val enc: org.apache.spark.sql.Encoder[PackedDoc] =
      org.apache.spark.sql.Encoders.product[PackedDoc]
    docs.repartition(col("stratum"))
      .sortWithinPartitions(col("stratum"), col("w").desc, col("id"))
      .mapPartitions { it =>
        var cur: String = null
        val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
        var nfBin = -1L; var nfLoad = 0L
        it.map { d =>
          if (d.stratum != cur) {
            cur = d.stratum; loads.clear(); nfBin = -1L; nfLoad = 0L
          }
          var b = loads.indexWhere(_ + d.w <= budget)
          if (b < 0) { loads += 0L; b = loads.length - 1 }
          loads(b) += d.w
          if (nfBin < 0 || nfLoad + d.w > budget) { nfBin += 1; nfLoad = 0L }
          nfLoad += d.w
          PackedDoc(d.id, d.stratum, d.w, b.toLong, nfBin)
        }
      }
  }
}
