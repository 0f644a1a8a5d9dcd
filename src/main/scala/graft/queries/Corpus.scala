package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft.{roundz, spreadIfNarrow, table}
import graft.expr.HeavyHitterSketch
import graft.ext.{Corpus => CorpusOps}

/** Corpus-curation query entries (EXT, SURVEY.md §2.14): repetition
  * filtering, deterministic stratified sampling, exact length
  * quantiles, shard packing, and PII scrubbing — each oracle-checked
  * (the operators are deliberately built from engine-portable math so
  * DuckDB can recompute them independently).
  */
object Corpus {

  private def docs(s: SparkSession, d: String) =
    spreadIfNarrow(table(s, d, "documents"), col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gopher-style repetition filter: per-doc token stats via explode +
    // two-stage agg (map-side combine), keep decision on distinct/top
    // ratios.
    "q56_repetition_filter" -> ((s, d) =>
      CorpusOps.repetitionFilter(docs(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // Deterministic stratified sampling: per-stratum permille rates on a
    // multiplicative-hash bucket — a pure scan predicate (no shuffle, no
    // rand()), identical sample on every re-run/retry.
    "q57_stratified_sample" -> ((s, d) =>
      CorpusOps.stratifiedSample(
          table(s, d, "documents"), col("doc_id"), col("lang"),
          permille = Map("en" -> 300L, "zh" -> 50L), defaultPermille = 150L)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // Exact length quantiles per language (the corpus-report shape that
    // drives cutoff choices). Exact percentile, not approx: at 100 TB
    // swap in approx_percentile; the exact form is the oracle-checkable
    // contract.
    "q58_length_quantiles" -> ((s, d) =>
      table(s, d, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          round(element_at(percentile(col("n_chars"),
            typedlit(Seq(0.5, 0.9, 0.99))), 1), 4).as("p50"),
          round(element_at(percentile(col("n_chars"),
            typedlit(Seq(0.5, 0.9, 0.99))), 2), 4).as("p90"),
          round(element_at(percentile(col("n_chars"),
            typedlit(Seq(0.5, 0.9, 0.99))), 3), 4).as("p99"))
        .orderBy(col("lang"))),

    // Approximate quantiles (the 100 TB form of q58): percentile_approx
    // is a mergeable sketch — map-side partials, no sort, no full
    // materialization of the column. The sketch value itself is not
    // DuckDB-recomputable, so (like q43) the oracle pins the accuracy
    // CONTRACT: the approx p50/p90 must land inside the exact
    // [p40,p60]/[p80,p95] rank brackets — far looser than the sketch's
    // guarantee at accuracy=10000, so deterministic; a sketch
    // regression flips the booleans red in CORRECTNESS.
    "q66_approx_quantiles" -> ((s, d) =>
      table(s, d, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          percentile_approx(col("n_chars"), typedlit(Seq(0.5, 0.9)),
            lit(10000)).as("ap"),
          percentile(col("n_chars"),
            typedlit(Seq(0.4, 0.6, 0.8, 0.95))).as("ex"))
        .select(col("lang"), col("n"),
          (element_at(col("ap"), 1) >= element_at(col("ex"), 1) &&
            element_at(col("ap"), 1) <= element_at(col("ex"), 2)).as("p50_ok"),
          (element_at(col("ap"), 2) >= element_at(col("ex"), 3) &&
            element_at(col("ap"), 2) <= element_at(col("ex"), 4)).as("p90_ok"))
        .orderBy(col("lang"))),

    // KLL-style quantile sketch (r8, §7.6): the same rank-bracket
    // contract as q66, but through the LIBRARY'S OWN mergeable
    // compactor UDAF (expr/QuantileSketch) instead of the engine's
    // percentile_approx — the construction is surface, not a black
    // box, and the distributed aggregation itself exercises the merge
    // algebra (32 map partials merge level-wise through the shuffle).
    // Same loose brackets as q66: p50 ∈ [p40,p60] exact ranks, p90 ∈
    // [p80,p95] — far outside the sketch's error at k=256, so
    // deterministic despite nondeterministic merge order.
    "q337_kll_quantiles" -> ((s, d) => {
      val sk = udaf(new graft.expr.QuantileSketch(256, Seq(0.5, 0.9)),
        graft.expr.QuantileSketch.inputEncoder)
      table(s, d, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sk(col("n_chars").cast("long")).as("ap"),
          percentile(col("n_chars"),
            typedlit(Seq(0.4, 0.6, 0.8, 0.95))).as("ex"))
        .select(col("lang"), col("n"),
          (element_at(col("ap"), 1).cast("double") >=
            element_at(col("ex"), 1) &&
            element_at(col("ap"), 1).cast("double") <=
              element_at(col("ex"), 2)).as("p50_ok"),
          (element_at(col("ap"), 2).cast("double") >=
            element_at(col("ex"), 3) &&
            element_at(col("ap"), 2).cast("double") <=
              element_at(col("ex"), 4)).as("p90_ok"))
        .orderBy(col("lang"))
    }),

    // t-digest quantiles (r9, §7.6): the TAIL-ACCURATE sketch beside
    // q337's uniform-error KLL — centroid capacity follows the k1
    // arcsine scale, so rank error ∝ √(q(1−q)) and p99 costs ~5× less
    // error than the median. "Pick your sketch by error shape" is the
    // library story: KLL when every quantile matters equally, t-digest
    // for SLO tails. Contract stance as q66/q337 (the digest is
    // merge-order-sensitive, so brackets, not values): p50 ∈ [p40,p60]
    // exact ranks; the TAIL leg pins p99 ∈ [p97, max] — the upper
    // bracket is max (not p995) because the interpolation-free
    // cum-weight read legitimately returns the top value in small
    // groups, and exact-percentile interpolation puts p995 BELOW max.
    // The sharp 0.5%-rank tail bound lives in TDigestSpec where the
    // distribution is controlled.
    "q342_tdigest_quantiles" -> ((s, d) => {
      val td = udaf(new graft.expr.TDigest(200.0, Seq(0.5, 0.99)),
        graft.expr.TDigest.inputEncoder)
      table(s, d, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          td(col("n_chars").cast("double")).as("ap"),
          percentile(col("n_chars"),
            typedlit(Seq(0.4, 0.6, 0.97, 1.0))).as("ex"))
        .select(col("lang"), col("n"),
          (element_at(col("ap"), 1) >= element_at(col("ex"), 1) &&
            element_at(col("ap"), 1) <= element_at(col("ex"), 2))
            .as("p50_ok"),
          (element_at(col("ap"), 2) >= element_at(col("ex"), 3) &&
            element_at(col("ap"), 2) <= element_at(col("ex"), 4))
            .as("p99_ok"))
        .orderBy(col("lang"))
    }),

    // Rendezvous (highest-random-weight) shard routing (r9): the
    // 100 TB shard-ASSIGNMENT story beside the packing operators —
    // owner(doc) = argmax over nodes of a portable per-(doc, node)
    // hash, so adding a node moves ONLY the docs whose new-node hash
    // beats their old maximum, and every mover lands ON the new node
    // (the rendezvous theorem: old nodes' scores are unchanged, so a
    // changed argmax can only be the newcomer). The query scores 8
    // nodes, then 9, and pins: the movers-only-to-new boolean, the
    // ~1/9 moved fraction, and post-add balance (max/min node load) —
    // every cell exact because the hash is plain modular arithmetic
    // both engines compute (the q288/q57 portable-hash discipline;
    // xxhash would be faster but is not oracle-replayable). The node
    // panel is a 9-row broadcast; ownership is one row_number window
    // per doc — no shuffle beyond the doc_id hash partition.
    "q351_rendezvous_routing" -> ((s, d) => {
      import s.implicits._
      val ids = table(s, d, "documents").select(col("doc_id"))
      val nodes = (0L to 8L).toDF("node")
      // two sub-P factors multiplied then reduced — mixes doc and node
      // into every output bit-range (a plain linear form leaves the
      // sequential doc_id structure visible: measured 2x load skew);
      // both factors < P ~ 1e9 so the product stays inside int64
      val scored = ids.crossJoin(broadcast(nodes))
        .withColumn("h", pmod(
          pmod(col("doc_id") * lit(2654435761L) + col("node") + lit(1L),
            lit(1000000007L)) *
            pmod(col("node") * lit(97003969L) + col("doc_id") + lit(12345L),
              lit(1000000007L)),
          lit(1000000007L)))
      def owner(maxNode: Long, alias: String): DataFrame = {
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("h").desc, col("node"))
        scored.filter(col("node") <= maxNode)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("node").as(alias))
      }
      val j = owner(7L, "owner_before").join(owner(8L, "owner_after"),
        Seq("doc_id")).localCheckpoint(true)
      val loads = j.groupBy(col("owner_after"))
        .agg(count(lit(1)).as("ld"))
        .agg(max(col("ld")).as("max_load_after"),
          min(col("ld")).as("min_load_after"))
      j.agg(count(lit(1)).as("n_docs"),
          sum((col("owner_after") =!= col("owner_before")).cast("long"))
            .as("n_moved"),
          sum((col("owner_after") =!= col("owner_before") &&
            col("owner_after") =!= 8).cast("long")).as("__cross"))
        .crossJoin(broadcast(loads))
        .select(col("n_docs"), col("n_moved"),
          expr("(n_moved * 1000) div n_docs").as("moved_permille"),
          (col("__cross") === 0).as("moves_only_to_new"),
          col("max_load_after"), col("min_load_after"))
    }),

    // Delta-aware staged relation (r9, SURVEY §7.6 backlog item #1):
    // ops.Staged.deltaRelation stages a PER-DEP-map relation slice by
    // slice, so an input change rebuilds O(|Δ|), not O(corpus) — the
    // q340 IVF main∪delta pattern promoted into the staging protocol.
    // The rig: two deterministic input slices of documents (main =
    // doc_id%5≠4, delta = %5=4), each itself published via
    // Staged.relation (staged-on-staged — the derived relation's deps
    // are stage DIRECTORIES, fingerprinted by their leaf files); the
    // per-doc quality features (token/char counts — a row-local map,
    // the legality condition for delta staging) are then delta-staged
    // over those two dirs. The THEOREM the query pins: a per-row map
    // commutes with union, so union-of-slice-stages ≡ the direct
    // full-corpus build — verified by symmetric exceptAll emptiness
    // inside the query; the per-lang rollup is replayed by the oracle
    // from the raw table. The INCREMENTALITY claim (untouched slices'
    // stage dirs are not rewritten when a sibling changes) is pinned
    // by StagedSpec, not here — mtimes aren't SQL.
    "q344_delta_staged_quality" -> ((s, d) => {
      val src = s"$d/documents.parquet"
      val base = table(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
      val depDirs = Seq(
        "q344_docs_main" -> (pmod(col("doc_id"), lit(5)) =!= 4),
        "q344_docs_delta" -> (pmod(col("doc_id"), lit(5)) === 4))
        .map { case (nm, pred) =>
          graft.ops.Staged.relation(s, nm, "v1", Seq(src))(base.filter(pred))
          graft.ops.Staged.stagePath(nm, "v1", Seq(src)).toString
        }
      def quality(df: DataFrame): DataFrame =
        df.select(col("doc_id"), col("lang"),
          size(split(lower(col("text")), " ")).cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("n_chars"))
      val staged = graft.ops.Staged.deltaRelation(
        s, "q344_doc_quality", "v1", depDirs)(
        dep => quality(s.read.parquet(dep)))
      val direct = quality(base)
      val eq = staged.exceptAll(direct).isEmpty &&
        direct.exceptAll(staged).isEmpty
      staged.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("tokens"),
          sum(col("n_chars")).as("chars"))
        .withColumn("staged_eq_direct", lit(eq))
        .orderBy(col("lang"))
    }),

    // Shard packing: documents → fixed-token-budget training shards,
    // cumsum per language stratum (parallel across strata; a global
    // ordered cumsum would serialize the corpus through one partition).
    "q59_shard_packing" -> ((s, d) =>
      CorpusOps.packShards(
          docs(s, d).withColumn("n_tokens",
            size(split(lower(col("text")), " ")).cast("long")),
          stratum = col("lang"), order = col("doc_id"),
          weight = col("n_tokens"), budget = 2000L)
        .groupBy(col("lang"), col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
        .orderBy(col("lang"), col("shard"))),

    // PII scrubbing: deterministic synthetic PII injected (the corpus
    // fixture has none), then redacted; counts prove global replacement.
    "q60_pii_scrub" -> ((s, d) => {
      val injected = docs(s, d).withColumn("t",
        concat(col("text"),
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(lit(" contact user"), col("doc_id"), lit("@example.com now")))
            .when(pmod(col("doc_id"), lit(7)) === 3,
              concat(lit(" call 555-123-4567 ext "), col("doc_id")))
            .otherwise(lit(""))))
      injected.select(col("doc_id"),
          CorpusOps.scrubPii(col("t")).as("scrubbed"))
        .withColumn("n_email",
          ((length(col("scrubbed")) -
            length(replace(col("scrubbed"), lit("<EMAIL>"), lit("")))) / 7)
            .cast("long"))
        .withColumn("n_phone",
          ((length(col("scrubbed")) -
            length(replace(col("scrubbed"), lit("<PHONE>"), lit("")))) / 7)
            .cast("long"))
        .orderBy(col("doc_id"))
    }),

    // Train/test split + leakage audit. The fixture has no duplicate
    // texts, so deterministic duplicates are injected first (doc_id%17
    // docs get a copy at doc_id+100000 — both engines reproduce the
    // injection): the copies land in whichever split their own id
    // hashes to, so some fingerprints straddle the split boundary =
    // leakage the audit must surface. Fingerprint = md5 of normalized
    // text (portable across engines).
    "q77_split_leakage" -> ((s, d) => {
      val docs = table(s, d, "documents")
      val dup = docs.filter(pmod(col("doc_id"), lit(17)) === 0)
        .withColumn("doc_id", col("doc_id") + 100000L)
      val corpus = docs.unionByName(dup)
      val split = CorpusOps.trainTestSplit(corpus, col("doc_id"), 200L)
      CorpusOps.crossSplitLeakage(split, col("split"),
          md5(lower(col("text"))))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("leaked"), 1L).otherwise(0L)).as("n_leaked"))
        .orderBy(col("split"))
    }),

    // Benchmark-contamination screen: docs with doc_id%97==0 act as the
    // benchmark; contamination is injected deterministically (docs with
    // doc_id%23==7 get benchmark doc 0's first 15 words appended) so
    // the screen has true positives to find. Output = contaminated docs
    // only, with n-gram overlap counts.
    "q78_contamination" -> ((s, d) => {
      val docs = table(s, d, "documents")
      val snippet = broadcast(docs.filter(col("doc_id") === 0)
        .select(array_join(slice(split(lower(col("text")), " "), 1, 15), " ")
          .as("snip")))
      val corpus = spreadIfNarrow(docs, col("doc_id")).crossJoin(snippet)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(23)) === 7,
            concat(lower(col("text")), lit(" "), col("snip")))
            .otherwise(lower(col("text"))))
        .drop("snip")
      val bench = corpus.filter(pmod(col("doc_id"), lit(97)) === 0)
      val scanned = corpus.filter(pmod(col("doc_id"), lit(97)) =!= 0)
      CorpusOps.contaminationScreen(scanned, bench, "doc_id", "text", n = 8)
        .filter(col("n_hit") > 0)
        .orderBy(col("doc_id"))
    }),

    // Heavy-hitter tokens, two-pass: pass 1 is the Misra-Gries sketch
    // (bounded O(k) state per partition, mergeable partials — no full
    // token histogram in the shuffle); pass 2 exact-counts ONLY the ≤ k
    // candidates via a broadcast semi join. MG guarantees every token
    // with frequency > n/(k+1) survives pass 1 (k=64 ≫ 1/frac here), so
    // the final filter on exact counts is deterministic and equals the
    // plain GROUP BY ... HAVING the oracle runs.
    "q81_heavy_hitters" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toks = docs(s, d)
        .select(explode(split(lower(col("text")), " ")).as("tok"))
      val hh = udaf(new HeavyHitterSketch(64), HeavyHitterSketch.inputEncoder)
      val cands = toks.agg(hh(col("tok")).as("cands"))
        .select(explode(col("cands")).as("tok"))
      // pass 2 folds the corpus total into the exact-count scan: tokens
      // outside the candidate set collapse into one NULL group (map-side
      // combined like any other key) whose count completes n_total — the
      // token relation is scanned twice (sketch + counts), never a third
      // time just for the denominator. The window runs over ≤ k+1 rows.
      val counted = toks
        .join(broadcast(cands.withColumn("__cand", lit(1))), Seq("tok"), "left")
        .groupBy(when(col("__cand").isNotNull, col("tok")).as("tok"))
        .agg(count(lit(1)).as("cnt"))
      counted
        .withColumn("n_total", sum(col("cnt")).over(Window.partitionBy()))
        .filter(col("tok").isNotNull && col("cnt") >= ceil(col("n_total") * 0.03))
        .select(col("tok"), col("cnt"))
        .orderBy(col("cnt").desc, col("tok"))
    }),

    // Markup/boilerplate strip over synthetically-wrapped docs (the
    // fixture is clean text, so HTML wrapping is injected
    // deterministically — both engines reproduce it): script bodies
    // die with their tags, entities decode, whitespace collapses.
    "q84_markup_strip" -> ((s, d) => {
      val wrapped = docs(s, d).withColumn("t",
        when(pmod(col("doc_id"), lit(11)) === 3,
          concat(lit("<div class=\"post\"><h1>T</h1><p>"), col("text"),
            lit("</p><script>track();</script> &amp; more &lt;tail&gt;</div>")))
          .otherwise(col("text")))
      wrapped.select(col("doc_id"),
          CorpusOps.stripMarkup(col("t")).as("cleaned"))
        .withColumn("n_clean", length(col("cleaned")))
        .orderBy(col("doc_id"))
    }),

    // Unicode NFC canonicalization via the native graft_normalize
    // expression (ASCII fast path; java.text.Normalizer tail). The
    // fixture is ASCII, so DECOMPOSED sequences are injected: e +
    // U+0301 must collapse to U+00E9 before fingerprints compare equal
    // — DuckDB's nfc_normalize recomputes the same strings.
    "q85_nfc_normalize" -> ((s, d) => {
      graft.expr.GraftFunctions.register(s)
      val injected = docs(s, d).withColumn("t",
        when(pmod(col("doc_id"), lit(13)) === 4,
          concat(col("text"),
            lit(" cafe\u0301 nai\u0308ve")))  // combining acute, diaeresis
          .otherwise(col("text")))
      injected.select(col("doc_id"),
          call_function(graft.expr.GraftFunctions.NormalizeName,
            col("t")).as("norm"))
        .select(col("doc_id"), length(col("norm")).as("n_norm"),
          md5(col("norm")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // Fixed-length sequence packing WITH doc splitting: every training
    // sequence is exactly 512 tokens (except each stratum's last) and
    // records how many docs contribute to it. Pure integer/offset math
    // over a per-lang cumsum — DuckDB reproduces it exactly.
    "q86_sequence_slices" -> ((s, d) => {
      val w = docs(s, d).withColumn("n_tok",
        size(split(lower(col("text")), " ")).cast("long"))
      CorpusOps.sliceSequences(w, col("lang"), col("doc_id"),
          col("n_tok"), 512L)
        .groupBy(col("lang"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok_end") - col("tok_start")).as("n_tokens"))
        .orderBy(col("lang"), col("seq_id"))
    }),

    // Overlapping RAG chunking (CorpusOps.chunkOverlap): 64-token
    // chunks at stride 48 (16-token overlap) — retrieval-index
    // construction over the corpus. Map-only (no token explode, no
    // shuffle until the output sort); the oracle re-derives every
    // chunk's text (md5), start and length from the same split.
    "q126_chunk_overlap" -> ((s, d) =>
      CorpusOps.chunkOverlap(docs(s, d), "doc_id", "text",
          chunkLen = 64, stride = 48)
        .select(col("doc_id"), col("chunk_idx"), col("tok_start"),
          col("n_toks"), md5(col("chunk")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // Per-language top-p (nucleus) token-budget selection
    // (CorpusOps.topPBudget): longest-first docs kept until 60% of the
    // language's token mass is covered; integer-exact keep test. The
    // oracle replays the identical windows in SQL.
    "q127_top_p_budget" -> ((s, d) => {
      val w = docs(s, d).withColumn("n_tok",
        size(split(col("text"), " ")).cast("long"))
      CorpusOps.topPBudget(w, col("lang"), col("n_chars"),
          col("doc_id"), col("n_tok"), permille = 600L)
        .filter(col("kept"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_tok")).as("tok_kept"),
          max(col("__total")).as("tok_total"))
        .orderBy(col("lang"))
    }),

    // Length-bucketed batch packing: sequences grouped into power-of-2
    // length buckets, then fixed-size batches of B within each bucket
    // in deterministic (len, doc_id) order — the padding-minimization
    // layout for training batches (batch cost = B × max len in batch;
    // mixing a 10-token doc into a 1000-token batch wastes 99% of the
    // pad). Per-bucket windows are fine at scale: buckets are the unit
    // of parallelism and each is ~log2 of the length range. The output
    // reports per-batch padded vs real tokens — the waste metric that
    // justifies the layout.
    "q133_length_batching" -> ((s, d) => {
      val B = 8
      docs(s, d)
        .withColumn("n_tok",
          size(split(col("text"), " ")).cast("long"))
        // bucket = ceil(log2(n)) computed EXACTLY as the bit length of
        // n-1 (float log2 disagrees across engines at powers of two)
        .withColumn("bucket",
          when(col("n_tok") <= 1L, 0L)
            .otherwise(length(bin(col("n_tok") - 1)).cast("long")))
        .withColumn("batch_idx",
          expr(s"(row_number() OVER (PARTITION BY bucket ORDER BY n_tok, doc_id) - 1) div $B"))
        .groupBy(col("bucket"), col("batch_idx"))
        .agg(count(lit(1)).as("n_seqs"),
          sum(col("n_tok")).as("real_toks"),
          (max(col("n_tok")) * count(lit(1))).as("padded_toks"))
        .orderBy(col("bucket"), col("batch_idx"))
    }),

    // Per-group WEIGHTED median (lower): the doc-length midpoint where
    // half the TOKEN MASS sits below — the right cut for budget
    // decisions (a plain median over docs ignores that long docs carry
    // the tokens; q58's exact percentiles are row-weighted). One
    // ordered window per stratum, integer-exact test 2·cumw ≥ W.
    "q149_weighted_median" -> ((s, d) => {
      val byLen = Window.partitionBy(col("lang"))
        .orderBy(col("n_chars"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val all = Window.partitionBy(col("lang"))
      val t = docs(s, d)
        .withColumn("wt", size(split(col("text"), " ")).cast("long"))
        .withColumn("cumw", sum(col("wt")).over(byLen))
        .withColumn("total", sum(col("wt")).over(all))
        .filter(col("cumw") * 2 >= col("total"))
      val first = Window.partitionBy(col("lang"))
        .orderBy(col("n_chars"), col("doc_id"))
      t.withColumn("rn", row_number().over(first))
        .filter(col("rn") === 1)
        .select(col("lang"), col("n_chars").as("w_median_chars"),
          col("total").as("total_tokens"))
        .orderBy(col("lang"))
    }),

    // Token-distribution KL divergence between corpus snapshots — the
    // drift metric run before swapping a training mixture: D(P‖Q) over
    // add-one-smoothed token frequencies of two deterministic slices
    // (old = even doc_id, new = odd). Counts are exact integers from
    // two-stage hash aggs; each term is computed in a FIXED float op
    // order and the per-token contributions are rounded THEN summed, so
    // the total is engine-identical (summing raw doubles would expose
    // reduction order). Vocabulary = union of both slices via full
    // outer join on the token key.
    "q145_token_kl" -> ((s, d) => {
      def toks(df: DataFrame) = df
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(count(lit(1)).as("k"))
      val all = docs(s, d)
      val p = toks(all.filter(pmod(col("doc_id"), lit(2)) === 0))
        .withColumnRenamed("k", "kp")
      val q = toks(all.filter(pmod(col("doc_id"), lit(2)) === 1))
        .withColumnRenamed("k", "kq")
      val joined = p.join(q, Seq("tok"), "full_outer")
        .select(coalesce(col("kp"), lit(0L)).as("kp"),
          coalesce(col("kq"), lit(0L)).as("kq"))
      val tot = joined.agg(sum(col("kp")).as("np"), sum(col("kq")).as("nq"),
        count(lit(1)).as("v"))
      joined.crossJoin(broadcast(tot))
        // add-one smoothing: p = (k+1)/(n+V); contribution rounded to
        // 12 dp BEFORE the sum so reduction order cannot drift
        .select(round(
          ((col("kp") + 1) * 1.0 / (col("np") + col("v"))) *
            log(((col("kp") + 1) * 1.0 / (col("np") + col("v"))) /
              ((col("kq") + 1) * 1.0 / (col("nq") + col("v")))), 12)
          .as("term"))
        .agg(roundz(sum(col("term")), 6).as("kl_nats"),
          count(lit(1)).as("vocab"))
    }),

    // Per-stratum quantile calibration: raw quality proxies are not
    // comparable ACROSS languages (a "long" zh doc and a "long" en doc
    // sit at different raw scales), so each doc's score becomes its
    // percentile WITHIN its language — after which one global threshold
    // means the same thing everywhere. percent_rank over the stratum
    // window (strata are the unit of parallelism); ties share a rank by
    // construction. Rolled up to decile counts per lang: a calibrated
    // score is uniform within each stratum, which the oracle pins.
    "q146_quantile_calibrate" -> ((s, d) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"))
      docs(s, d)
        .withColumn("pct", percent_rank().over(w))
        .withColumn("decile",
          least(floor(col("pct") * 10).cast("long"), lit(9L)))
        .groupBy(col("lang"), col("decile"))
        .agg(count(lit(1)).as("n"),
          min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
        .orderBy(col("lang"), col("decile"))
    }),

    // Per-source quota capping: at most 3 docs per source, best first
    // (n_chars desc, id tiebreak) — the anti-domination rule that stops
    // one crawler domain from flooding the mixture (the per-SOURCE
    // complement of q83's per-language rebalance). One bounded window
    // per source key; at 100 TB swap the window for TopKByScore (q68)
    // to keep state O(k) — semantics identical.
    "q144_source_quota" -> ((s, d) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      docs(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).as("chars_kept"),
          min(col("n_chars")).as("cutoff_chars"))
        .orderBy(col("source"))
    }),

    // Golden-record survivorship: after dup clustering, the output
    // record MERGES the best non-null attribute from each cluster
    // member (vs q95's keepCanonical, which picks one whole row) —
    // id = min, text = longest (deterministic (n_chars, -id) tiebreak
    // via max_by on a struct key), lang = any non-null survivor,
    // chars = max. Corrupted duplicates are derived in-query (%13==4
    // docs get a +300000 copy with NULL lang and 5-token truncated
    // text). ONE hash aggregate on the cluster key — survivorship is
    // an agg, not a self-join.
    "q137_golden_record" -> ((s, d) => {
      val base = docs(s, d)
        .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      val trunc = array_join(slice(split(col("text"), " "), 1, 5), " ")
      val dups = base.filter(pmod(col("doc_id"), lit(13)) === 4)
        .select((col("doc_id") + 300000L).as("doc_id"),
          trunc.as("text"), lit(null).cast("string").as("lang"),
          length(trunc).cast("long").as("n_chars"))
      base.unionByName(dups)
        .withColumn("cl",
          when(col("doc_id") >= 300000L, col("doc_id") - 300000L)
            .otherwise(col("doc_id")))
        .groupBy(col("cl"))
        .agg(min(col("doc_id")).as("canonical_id"),
          count(lit(1)).as("n_members"),
          max_by(col("text"),
            struct(col("n_chars"), (-col("doc_id")).as("nd"))).as("text"),
          max(col("lang")).as("lang"),
          max(col("n_chars")).as("chars"))
        .select(col("cl"), col("canonical_id"), col("n_members"),
          md5(col("text")).as("text_md5"), col("lang"), col("chars"))
        .orderBy(col("cl"))
    }),

    // Per-group closed-form OLS (chars-per-token trend per language):
    // ONE aggregate collects integer moment sums (n, Σx, Σy, Σx²,
    // Σxy) — map-side combined, O(groups) state — and slope/intercept
    // are derived in a fixed float op order from EXACT integers, so
    // both engines compute bit-identical doubles (same IEEE ops on the
    // same values). The grouped-statistics shape for per-segment trend
    // fits at corpus scale: no per-row residual pass, no iteration.
    "q135_group_regression" -> ((s, d) => {
      val m = docs(s, d)
        .select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("x"),
          col("n_chars").as("y"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
      val slopeRaw = (col("n") * col("sxy") - col("sx") * col("sy")) * 1.0 /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      m.select(col("lang"), col("n"),
          roundz(slopeRaw, 6).as("slope"),
          roundz((col("sy") - slopeRaw * col("sx")) / col("n"), 6)
            .as("intercept"))
        .orderBy(col("lang"))
    }),

    // Character-distribution entropy per doc — the cheap gibberish
    // filter (low-entropy = repeated chars, high = uniform noise). Char
    // histogram via explode + two-stage agg (map-side combine), exact
    // integer counts; only the final -Σp·log₂p is floating-point,
    // rounded to 4 for engine-portable comparison. The char pattern is
    // an explicit [^\n\r] class, not '.': Java's dot excludes \r where
    // RE2's matches it — explicit means both engines agree on CR input.
    "q87_char_entropy" -> ((s, d) => {
      val cnt = docs(s, d)
        .select(col("doc_id"),
          explode(regexp_extract_all(lower(col("text")), lit("[^\\n\\r]"), lit(0)))
            .as("c"))
        .groupBy(col("doc_id"), col("c")).agg(count(lit(1)).as("k"))
      val n = cnt.groupBy(col("doc_id")).agg(sum(col("k")).as("n"))
      cnt.join(n, Seq("doc_id"))
        .groupBy(col("doc_id"))
        .agg(roundz(-sum((col("k") / col("n")) *
          log(2.0, col("k") / col("n"))), 4).as("entropy"))
        .withColumn("keep", col("entropy") >= 3.0)
        .orderBy(col("doc_id"))
    }),

    // Distributed dense-id assignment: 0..n-1 in doc_id order WITHOUT a
    // single-partition global window (range partitions ranked in
    // parallel + broadcast cumulative offsets). Output must equal the
    // serial row_number() the oracle computes.
    "q94_dense_ids" -> ((s, d) =>
      CorpusOps.denseIds(table(s, d, "documents"), col("doc_id"))
        .select(col("doc_id"), col("dense_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // Canonical selection after dup clustering: duplicates injected
    // deterministically (doc_id%19==1 docs get a copy at +200000 with
    // shorter text), clusters keyed by md5 of the ORIGINAL text; the
    // canonical pick is highest n_chars, ties to smallest doc_id — so
    // originals must win over their truncated copies.
    "q95_keep_canonical" -> ((s, d) => {
      val docs = table(s, d, "documents")
      val dup = docs.filter(pmod(col("doc_id"), lit(19)) === 1)
        .withColumn("doc_id", col("doc_id") + 200000L)
        .withColumn("n_chars", floor(col("n_chars") / 2).cast("long"))
      val corpus = docs.unionByName(dup)
        .withColumn("cluster", md5(lower(col("text"))))
      CorpusOps.keepCanonical(corpus, col("cluster"),
          col("n_chars"), col("doc_id"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        // n_chars tiebreak keeps the ORDER BY total even at scale
        // factors where doc_id+200000 collides with a real doc_id
        .orderBy(col("doc_id"), col("n_chars"))
    }),

    // Exact-k per-stratum sample: exactly 20 docs per language (or all
    // of a smaller stratum), chosen by deterministic hash rank — the
    // eval-set construction shape, vs q57's rate-based binomial counts.
    "q96_exact_k_sample" -> ((s, d) =>
      CorpusOps.exactKSample(table(s, d, "documents"),
          col("doc_id"), col("lang"), k = 20)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // Weighted exact-k sample (A-Res with deterministic hash uniforms:
    // priority = u^(1/w), w = document length): longer docs are
    // proportionally likelier, yet the set is bit-reproducible across
    // retries and engines — DuckDB recomputes the identical priorities.
    // Plans as TakeOrderedAndProject: no full sort at 100 TB.
    "q102_weighted_sample" -> ((s, d) =>
      CorpusOps.weightedSample(table(s, d, "documents"),
          col("doc_id"), col("n_chars"), k = 25)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))),

    // Vocabulary coverage / OOV-rate audit vs the corpus' own top-30
    // df vocabulary: global vocab pass (TakeOrdered, ties →
    // lexicographic), broadcast membership join, per-doc OOV ratio,
    // per-lang rollup — text never shuffles.
    "q103_vocab_coverage" -> ((s, d) =>
      CorpusOps.vocabCoverage(table(s, d, "documents"),
          "doc_id", "text", col("lang"), vocabSize = 30)
        .withColumnRenamed("stratum", "lang")
        .orderBy(col("lang"))),

    // Bigram-LM perplexity scoring (CCNet-style): reference LM = even
    // doc_ids, candidates = odd; add-one-smoothed P(w2|w1); count
    // tables JOIN on their keys (an LM is corpus-sized at 100 TB —
    // never broadcast), V rides as a one-row broadcast scalar. The
    // top-20 highest-perplexity candidates surface.
    "q105_bigram_lm" -> ((s, d) => {
      val all = docs(s, d)
      CorpusOps.bigramLmScore(
          all.filter(pmod(col("doc_id"), lit(2)) === 1),
          all.filter(pmod(col("doc_id"), lit(2)) === 0),
          "doc_id", "text")
        .orderBy(col("ppl").desc, col("doc_id")).limit(20)
    }),

    // Linear quality-classifier inference (fastText-shape): narrow
    // per-row HOF fold over tokens — zero shuffles for the scoring
    // scan; deterministic arithmetic weights stand in for a broadcast
    // model so DuckDB recomputes the identical scores.
    "q106_quality_classifier" -> ((s, d) =>
      CorpusOps.qualityScoreLinear(docs(s, d), "doc_id", "text")
        .filter(col("keep")).orderBy(col("score").desc, col("doc_id"))
        .limit(25)),

    // Domain-mixture rebalance: downsample to a 50/30/20 en/de/zh mix
    // (es/fr dropped — share 0). The achieved per-stratum counts are
    // deterministic (hash-threshold sampling), so DuckDB recomputes
    // them exactly from the same integer math.
    // Temperature-sampled mixture (Corpus.temperatureSample, α = 0.5 —
    // the mT5/XLM-R rule): unlike q83's FIXED target mix, the rates
    // here derive from the observed counts (mass ∝ √n), so
    // low-resource languages up-weight automatically. Keep decisions
    // are integer basis-point compares on the q57 hash — the whole
    // sample is one scan predicate after a broadcast rate join. Full
    // recompute oracle (sqrt is correctly-rounded IEEE, one float
    // chain in mirrored op order, integer floor before any compare).
    "q188_temperature_mixture" -> ((s, d) =>
      graft.ext.Corpus.temperatureSample(
          table(s, d, "documents"), col("lang"), col("doc_id"),
          budget = 300L)
        .groupBy(col("lang"), col("rate_bp"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).cast("long").as("chars"))
        .orderBy(col("lang"))),

    "q83_mixture_rebalance" -> ((s, d) =>
      CorpusOps.rebalanceMixture(
          table(s, d, "documents"), col("lang"), col("doc_id"),
          Map("en" -> 0.5, "de" -> 0.3, "zh" -> 0.2))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("chars"))
        .orderBy(col("lang"))),

    // OT-driven mixture rebalancing (r8) — the composition the
    // Sinkhorn operator exists for: q83 rebalances strata toward a
    // HAND-PICKED target with per-stratum keep rates; here the target
    // is a SHAPE (flatten the document-length distribution to uniform
    // deciles) and the coupling says how to get there — which source
    // bin serves which target bin, preferring NEARBY lengths (ground
    // cost |i−j|, ε=1). ext.Transport.sinkhorn produces the coupling
    // over the observed length-decile histogram vs uniform 0.1;
    // Transport.routingRates quantizes each row of the coupling to
    // permille hash ranges; each document then routes to its target
    // stratum through ONE deterministic sampleBucket range predicate
    // (q57's machinery — no rand(), pushes to the scan, floor
    // remainders dropped). Output = the realized routing table:
    // (src_bin → tgt_bin, permille, docs routed). Everything after the
    // histogram groupBy is O(bins²); the assignment join broadcasts
    // ≤ bins² routing rows against the corpus scan — the 100 TB shape.
    "q332_ot_rebalance" -> ((s, d) => {
      val docs0 = table(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
      val mx = docs0.agg(max(col("n_chars")).as("maxc"))
      val binned = docs0.crossJoin(broadcast(mx))
        .select(col("doc_id"),
          expr("(n_chars * 10) div (maxc + 1)").as("bin"))
      val spine = mx.select(explode(sequence(lit(0L), lit(9L))).as("bin"))
      val tot = binned.agg(count(lit(1)).as("n"))
      val aDf = spine
        .join(binned.groupBy(col("bin")).agg(count(lit(1)).as("c")),
          Seq("bin"), "left")
        .crossJoin(broadcast(tot))
        .select(col("bin"), round(coalesce(col("c"), lit(0L))
          .cast("double") / col("n").cast("double"), 12).as("a"))
      val bDf = spine.select(col("bin"), lit(0.1).as("b"))
      val routes = graft.ext.Transport.routingRates(
        graft.ext.Transport.sinkhorn(aDf, bDf,
          (i, j) => abs(i - j), eps = 1.0, iters = 3))
      binned.join(broadcast(routes),
          col("bin") === col("i") &&
            CorpusOps.sampleBucket(col("doc_id")) >= col("lo") &&
            CorpusOps.sampleBucket(col("doc_id")) < col("hi"))
        .groupBy(col("i").as("src_bin"), col("j").as("tgt_bin"),
          col("pm").as("route_pm"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("src_bin"), col("tgt_bin"))
    }),

    // The WHOLE curation pipeline composed end-to-end in ONE lazy plan —
    // quality filter (Gopher repetition ratios) → exact dedup
    // (normalized sha256, min-id canonical) → deterministic stratified
    // sample → token-budget shard packing → per-shard manifest. This is
    // the composition statement: every stage is the same operator the
    // standalone queries run, chained with no materialization barriers,
    // so Catalyst sees one tree (scan pruning + pushdown cross stage).
    "q119_pipeline_e2e" -> ((s, d) => {
      val base = docs(s, d)
      val kept = CorpusOps.repetitionFilter(base, "doc_id", "text")
        .filter(col("kept")).select(col("doc_id"))
      val quality = base.join(kept, Seq("doc_id"), "left_semi")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__h")).orderBy(col("doc_id"))
      val deduped = quality
        .withColumn("__h",
          sha2(trim(regexp_replace(lower(col("text")), "\\s+", " ")), 256))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__h", "__rn")
      val sampled = CorpusOps.stratifiedSample(deduped, col("doc_id"),
        col("lang"), permille = Map("en" -> 400L), defaultPermille = 200L)
      CorpusOps.packShards(
          sampled.withColumn("n_tokens",
            size(split(lower(col("text")), " ")).cast("long")),
          stratum = col("lang"), order = col("doc_id"),
          weight = col("n_tokens"), budget = 1500L)
        .groupBy(col("lang"), col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy(col("lang"), col("shard"))
    }),

    // DSIR-style importance resampling scores (graft.ext.Corpus
    // .importanceWeights): target = lang='en', reference = full corpus;
    // avg per-token smoothed log-likelihood ratio per doc, selection at
    // lr6 >= 0. Full DuckDB recompute with the identical count/smooth/
    // pre-round/sum/divide order (q145 discipline); lr6 straddles zero
    // -> roundz/+0.0 on both sides per SURVEY §5.
    "q154_importance_resampling" -> ((s, d) =>
      CorpusOps.importanceWeights(docs(s, d), "doc_id", "text",
          col("lang") === "en")
        .orderBy(col("doc_id"))),

    // The q119 curation pipeline with the banded MinHash-LSH near-dup
    // stage in its production position — between exact dedup and
    // sampling — so the 100 TB dedup path runs INSIDE the composed
    // end-to-end plan, not only standalone (q36). Near-copies are
    // injected AFTER the quality gate (doc_id%21==5 → +500000, one
    // appended token), so exact-hash dedup must pass them through and
    // the LSH stage must catch them: for an n-token doc the copy's
    // shingle Jaccard is (n-2)/(n-1), far above tau=0.6, and 8 bands of
    // 2 rows make the candidate probability ≈1 at that similarity.
    // CONTRACT-ORACLE form (q36/q97 pattern): the LSH pair set is
    // xxhash64-derived, so DuckDB recomputes what it can (quality and
    // exact-dedup counts — same math as q119's oracle) and the
    // hash-dependent stages ride as booleans: injected-copy recall,
    // verify-stage precision (min pair Jaccard ≥ tau by construction),
    // and downstream sample/pack sanity. Driver-side .head() calls are
    // one-row aggregates (the q97 shape), not data collects.
    "q152_pipeline_neardup" -> ((s, d) => {
      import s.implicits._
      val base = docs(s, d)
      val kept = CorpusOps.repetitionFilter(base, "doc_id", "text")
        .filter(col("kept")).select(col("doc_id"))
      val quality = base.join(kept, Seq("doc_id"), "left_semi")
      val inj = quality.filter(pmod(col("doc_id"), lit(21)) === 5)
        .withColumn("doc_id", col("doc_id") + 500000L)
        .withColumn("text", concat(col("text"), lit(" zqduptoken")))
      val corpus = quality.unionByName(inj)
      val wx = Window.partitionBy(col("__h")).orderBy(col("doc_id"))
      val exact = corpus
        .withColumn("__h",
          sha2(trim(regexp_replace(lower(col("text")), "\\s+", " ")), 256))
        .withColumn("__rn", row_number().over(wx))
        .filter(col("__rn") === 1).drop("__h", "__rn")
        .persist()
      try {
        val pairs = graft.ext.NearDup
          .minhashNearDups(exact, "doc_id", "text", threshold = 0.6)
          .persist()
        try {
          val removed = pairs.select(col("id_b").as("doc_id")).distinct()
          val survivors = exact.join(removed, Seq("doc_id"), "left_anti")
          val sampled = CorpusOps.stratifiedSample(survivors, col("doc_id"),
            col("lang"), permille = Map("en" -> 400L), defaultPermille = 200L)
          val packed = CorpusOps.packShards(
              sampled.withColumn("n_tokens",
                size(split(lower(col("text")), " ")).cast("long")),
              stratum = col("lang"), order = col("doc_id"),
              weight = col("n_tokens"), budget = 1500L)
            .groupBy(col("lang"), col("shard"))
            .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
          // ONE driver action for all five telemetry scalars (r14,
          // guide §1.2/§2.6): these are independent one-row aggregates
          // over already-persisted (or once-computed) subtrees, and
          // running them as five sequential .head() jobs paid the
          // per-job floor four extra times; the cross join of one-row
          // frames computes every subtree once in a single job.
          val tele = corpus.agg(
              count(lit(1)).as("n_corpus"),
              sum(when(col("doc_id") >= 500000L, 1L).otherwise(0L))
                .as("n_injected"))
            .crossJoin(exact.agg(
              count(lit(1)).as("n_after_exact"),
              sum(when(col("doc_id") >= 500000L, 1L).otherwise(0L))
                .as("n_inj_exact")))
            .crossJoin(removed.join(exact.select(col("doc_id")), Seq("doc_id"))
              .agg(count(lit(1)).as("n_removed"),
                sum(when(col("doc_id") >= 500000L, 1L).otherwise(0L))
                  .as("n_inj_removed")))
            .crossJoin(pairs.agg(min(col("jaccard")).as("min_j")))
            .crossJoin(packed.agg(count(lit(1)).as("n_shards"),
              min(col("tokens")).as("min_tok"),
              sum(col("n_docs")).as("n_sampled")))
            .head()
          val (nCorpus, nInjected) =
            (tele.getLong(0), tele.getLong(1))
          val (nAfterExact, nInjExact) =
            (tele.getLong(2), tele.getLong(3))
          val (nRemoved, nInjRemoved) =
            (tele.getLong(4), tele.getLong(5))
          val minJ = tele.getDouble(6)
          val (nShards, minTok, nSampled) =
            (tele.getLong(7), tele.getLong(8), tele.getLong(9))
          val recallOk = nInjExact > 0 &&
            nInjRemoved.toDouble / nInjExact >= 0.9
          val precisionOk = nRemoved == 0 || minJ >= 0.6
          val pipelineOk = nSampled <= nAfterExact - nRemoved &&
            nShards >= 1 && minTok > 0
          Seq((nCorpus - nInjected, nInjected, nAfterExact,
              recallOk, precisionOk, pipelineOk))
            .toDF("n_quality", "n_injected", "n_after_exact",
              "injected_recall_ok", "precision_ok", "pipeline_ok")
        } finally { pairs.unpersist(); () }
      } finally { exact.unpersist(); () }
    }),

    // Segment-level (line/paragraph) dedup, CCNet-style: 3-token
    // windows, first corpus-wide occurrence wins (by doc, then
    // position), documents reassembled from surviving segments. One
    // narrow slicing pass + one window shuffle; DuckDB recomputes the
    // whole thing including the reassembled text. Shown for the first
    // 40 docs to keep the dump small; the aggregate tail row
    // (kept_frac over ALL docs) pins corpus-wide behavior.
    "q112_segment_dedup" -> ((s, d) => {
      val deduped = CorpusOps.segmentDedup(docs(s, d), "doc_id", "text")
      val head = deduped.filter(col("doc_id") < 40)
      val tail = deduped.agg(
        lit(-1L).as("doc_id"),
        sum(col("n_segs")).as("n_segs"), sum(col("n_kept")).as("n_kept"),
        round(sum(col("n_kept")) / sum(col("n_segs")), 4).as("kept_frac"),
        lit("").as("kept_text"))
      head.unionByName(tail).orderBy(col("doc_id"))
    }),

    // Duplicated-substring span detection (ext.NearDup.duplicateSpans):
    // maximal token spans whose 5-grams all recur in some other
    // document — the token-k-gram form of Lee et al. 2022's
    // suffix-array substring dedup, feeding an excision pass rather
    // than a whole-doc drop. One k-gram aggregate (the wide stage), one
    // semi-join to mark duplicated positions, one per-doc islands
    // window to coalesce runs. Full DuckDB recompute of every stage.
    "q160_dup_spans" -> ((s, d) =>
      graft.ext.NearDup.duplicateSpans(docs(s, d), "doc_id", "text", k = 5)
        .orderBy(col("doc_id"), col("span_start"))),

    // Span-level eval-set DECONTAMINATION (ext.NearDup
    // .crossDuplicateSpans): q78's doc-level screen says which docs
    // overlap the benchmark; this emits the token spans an excision
    // pass cuts. Same q78 fixture (bench = doc_id%97==0; docs %23==7
    // get bench doc 0's first 15 words appended → a guaranteed
    // 15-token span of 8 start positions at each injected doc's tail).
    // The bench gram set is distinct-ed and BROADCAST — the corpus side
    // streams through the semi-join with zero corpus shuffle; only the
    // (rare) hit positions reach the islands window.
    "q162_decontaminate_spans" -> ((s, d) => {
      val docs0 = table(s, d, "documents")
      val snippet = broadcast(docs0.filter(col("doc_id") === 0)
        .select(array_join(slice(split(lower(col("text")), " "), 1, 15), " ")
          .as("snip")))
      val corpus = spreadIfNarrow(docs0, col("doc_id")).crossJoin(snippet)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(23)) === 7,
            concat(lower(col("text")), lit(" "), col("snip")))
            .otherwise(lower(col("text"))))
        .drop("snip")
      val bench = corpus.filter(pmod(col("doc_id"), lit(97)) === 0)
      val train = corpus.filter(pmod(col("doc_id"), lit(97)) =!= 0)
      graft.ext.NearDup.crossDuplicateSpans(train, bench, "doc_id", "text",
          k = 8)
        .orderBy(col("doc_id"), col("span_start"))
    }),

    // Bloom-broadcast decontamination (BloomJoin over gram hashes) —
    // q162's exact broadcast gram set costs O(set) to ship; at a 100 TB
    // corpus with a large benchmark suite the production pre-filter is
    // an O(bits) Bloom of the eval grams, probed corpus-side BEFORE any
    // exchange, with the (rare) survivors exactly confirmed by the
    // equi-join — false positives cost shuffle only, false negatives
    // are impossible (the Bloom property), so the result is EXACTLY the
    // exact recompute and the oracle needs no sketch model (q74's
    // stance, composed with the q162 fixture: same injected snippet,
    // same 8-gram keys). Output = per-doc shared-gram counts.
    "q206_bloom_decontaminate" -> ((s, d) => {
      graft.expr.GraftFunctions.register(s)
      val docs0 = table(s, d, "documents")
      val snippet = broadcast(docs0.filter(col("doc_id") === 0)
        .select(array_join(slice(split(lower(col("text")), " "), 1, 15), " ")
          .as("snip")))
      val corpus = spreadIfNarrow(docs0, col("doc_id")).crossJoin(snippet)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(23)) === 7,
            concat(lower(col("text")), lit(" "), col("snip")))
            .otherwise(lower(col("text"))))
        .drop("snip")
      def grams(df: DataFrame, out: String) = df
        .select(col("doc_id"),
          explode(graft.ext.NearDup.shingleHashes(
            split(col("text"), " "), 8)).as(out))
      val bench = grams(corpus.filter(pmod(col("doc_id"), lit(97)) === 0), "bgh")
        .select(col("bgh")).distinct()
      val train = grams(corpus.filter(pmod(col("doc_id"), lit(97)) =!= 0), "gh")
      // eager count of the SMALL side sizes the Bloom (bench grams are
      // the broadcast-dim analogue — KBs of bitmap, not the gram set)
      val m = math.max(1L, bench.count())
      graft.ops.BloomJoin.join(train, bench, "gh", "bgh",
          expectedDimRows = m, fpp = 0.001)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
        .orderBy(col("doc_id"))
    }),

    // Intra-document repeated-passage spans (ext.NearDup
    // .repeatedSpans): 3-gram start positions whose gram already
    // occurred EARLIER in the same doc, coalesced into excisable
    // spans — the within-doc sibling of q160 (cross-doc) and the span
    // form of q56's whole-doc repetition gate. The (doc, gram) window
    // never crosses documents, so the shuffle is doc-keyed.
    "q163_repeat_spans" -> ((s, d) =>
      graft.ext.NearDup.repeatedSpans(docs(s, d), "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("span_start"))),

    // Fill-in-the-middle example construction (ext.Corpus.fimExamples):
    // PSM re-serialization at deterministic ⌊n/3⌋/⌊2n/3⌋ cuts — a pure
    // per-row projection (array slices + concat, zero shuffle); the
    // oracle rebuilds every field including the sentinel-joined PSM
    // string byte-for-byte.
    "q164_fim_examples" -> ((s, d) =>
      CorpusOps.fimExamples(docs(s, d), "doc_id", "text", minTokens = 12)
        .orderBy(col("doc_id"))),

    // Curriculum phases by model-based difficulty: q105's bigram-LM
    // perplexity orders the scored candidates easy → hard; ntile(4)
    // over the total order (ppl, doc_id) assigns training phases and
    // the output is per-phase stats. The exact global ntile keeps the
    // oracle bit-exact; at 100 TB phase assignment uses broadcast
    // quantile CUTPOINTS (q66's sketch) against the same score — a
    // narrow map instead of a global window, same downstream schema.
    "q167_curriculum_phases" -> ((s, d) => {
      val all = docs(s, d)
      val scored = CorpusOps.bigramLmScore(
        all.filter(pmod(col("doc_id"), lit(2)) === 1),
        all.filter(pmod(col("doc_id"), lit(2)) === 0),
        "doc_id", "text")
      val w = Window.orderBy(col("ppl"), col("doc_id"))
      scored.withColumn("phase", ntile(4).over(w).cast("long"))
        .groupBy(col("phase"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("ppl")).as("ppl_min"), max(col("ppl")).as("ppl_max"),
          sum(col("n_bigrams")).as("n_bigrams"))
        .orderBy(col("phase"))
    }),

    // The span REFINERY, end-to-end: intra-doc repeated passages are
    // excised (q163's spans through NearDup.exciseSpans), then the
    // CLEANED text is screened against the benchmark slice
    // (doc_id%97==0, kept raw — eval sets are external) and
    // contaminated spans excised too. Two chained excisions in ONE
    // lazy plan; per-doc rows for doc_id < 30 plus a corpus tail row
    // (-1) pin both stages' total removals. Full DuckDB recompute of
    // every stage including the rebuilt text — positions shift after
    // stage 1, so stage 2's grams must be recomputed on clean text in
    // both engines.
    "q172_span_refinery" -> ((s, d) => {
      val base = docs(s, d)
      val r1 = graft.ext.NearDup.exciseSpans(base,
        graft.ext.NearDup.repeatedSpans(base, "doc_id", "text", k = 3),
        "doc_id", "text")
      val bench = base.filter(pmod(col("doc_id"), lit(97)) === 0)
        .select(col("doc_id"), col("text").as("text1"))
      val train = r1.filter(pmod(col("doc_id"), lit(97)) =!= 0)
        .withColumnRenamed("clean_text", "text1")
        .withColumnRenamed("n_removed", "rm_repeat")
        .withColumnRenamed("n_tokens", "n0")
      val contam = graft.ext.NearDup.crossDuplicateSpans(
        train.select(col("doc_id"), col("text1")), bench,
        "doc_id", "text1", k = 5)
      val r2 = graft.ext.NearDup.exciseSpans(
          train.select(col("doc_id"), col("text1")), contam,
          "doc_id", "text1")
        .withColumnRenamed("n_removed", "rm_contam")
        .select(col("doc_id"), col("rm_contam"), col("clean_text"))
      val out = train.select(col("doc_id"), col("n0"), col("rm_repeat"))
        .join(r2, Seq("doc_id"))
      val head = out.filter(col("doc_id") < 30)
      val tail = out.agg(lit(-1L).as("doc_id"),
        sum(col("n0")).as("n0"), sum(col("rm_repeat")).as("rm_repeat"),
        sum(col("rm_contam")).as("rm_contam"), lit("").as("clean_text"))
      head.unionByName(tail).orderBy(col("doc_id"))
    }),

    // The DATA CARD — the one-page corpus summary every released
    // dataset ships (docs, whitespace tokens, exact-dedup distincts,
    // language/source universes, quality-gate survivors), emitted as
    // (metric, value) rows so downstream tooling diffs cards across
    // corpus versions mechanically. Every number is an exact integer
    // from operators the suite already pins (q32 tokens, q35 norm-hash
    // dedup, q56 gate); the whole card is a handful of map-side-
    // combined aggregates unioned — each metric's scan prunes to the
    // columns it needs.
    // k-anonymity release audit (the aggregate privacy guard beside
    // q60's per-row PII scrub): quasi-identifier tuples — (lang,
    // source, a 97-bucket length attribute, fine enough that rare
    // combinations exist at every SF) — shared by < k rows are
    // suppressed to '*'. Fully relational, so DuckDB replays the exact
    // suppression decision per group.
    "q213_k_anonymity" -> ((s, d) => {
      val base = docs(s, d).withColumn("bucket",
        pmod(col("n_chars"), lit(97)).cast("string"))
      CorpusOps.kAnonymize(base, Seq("lang", "source", "bucket"), k = 5)
        .groupBy(col("lang"), col("source"), col("bucket"),
          col("anon_suppressed"))
        .agg(count(lit(1)).as("n_rows"))
        .orderBy(col("lang"), col("source"), col("bucket"),
          col("anon_suppressed"))
    }),

    // First-fit-decreasing context-window packing (q59's quality
    // upgrade): per-lang FFD bins with the budget as a HARD cap —
    // unlike the cumsum shards, no bin overflows. The bin assignment is
    // algorithmic (sequential within stratum), so the oracle pins exact
    // conservation totals plus the three packing invariants as contract
    // booleans: no bin exceeds budget, FFD never uses more bins than
    // same-order next-fit (emitted from the same pass), and the count
    // respects the ceil(total/budget) lower bound.
    "q212_ffd_binpack" -> ((s, d) => {
      import s.implicits._
      val budget = 1500L
      val dw = docs(s, d)
        .select(col("doc_id").as("id"), col("lang").as("stratum"),
          size(split(lower(col("text")), " ")).cast("long").as("w"))
        .filter(col("w") <= budget)
        .as[CorpusOps.DocW]
      // one materialization: the packed relation feeds both the
      // per-stratum rollup and the per-bin load audit
      val pk = CorpusOps.packBinsFFD(dw, budget).toDF().localCheckpoint()
      val loads = pk.groupBy(col("stratum"), col("bin"))
        .agg(sum(col("w")).as("load"))
        .groupBy(col("stratum")).agg(max(col("load")).as("__maxload"))
      pk.groupBy(col("stratum"))
        .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("tokens_total"),
          (max(col("bin")) + 1).as("__nb"),
          (max(col("nf_bin")) + 1).as("__nnf"))
        .join(loads, Seq("stratum"))
        .select(col("stratum").as("lang"), col("n_docs"),
          col("tokens_total"),
          (col("__maxload") <= budget).as("no_overflow"),
          (col("__nb") <= col("__nnf")).as("ffd_le_nextfit"),
          (col("__nb") >= floor((col("tokens_total") + lit(budget - 1))
            / lit(budget)).cast("long")).as("ffd_ge_lowerbound"))
        .orderBy(col("lang"))
    }),

    "q200_data_card" -> ((s, d) => {
      val base = table(s, d, "documents")
      val toks = base.select(
        size(filter(split(lower(col("text")), " "), t => t =!= lit("")))
          .cast("long").as("nt"))
      def row(m: String, df: DataFrame) =
        df.select(lit(m).as("metric"), col("v").cast("long").as("value"))
      val card = Seq(
        row("docs", base.agg(count(lit(1)).as("v"))),
        row("tokens_ws", toks.agg(sum(col("nt")).as("v"))),
        row("distinct_norm_docs", base.select(
            sha2(trim(regexp_replace(lower(col("text")), "\\s+", " ")), 256)
              .as("h"))
          .agg(countDistinct(col("h")).as("v"))),
        row("langs", base.agg(countDistinct(col("lang")).as("v"))),
        row("sources", base.agg(countDistinct(col("source")).as("v"))),
        row("quality_kept", CorpusOps
          .repetitionFilter(base, "doc_id", "text")
          .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("v"))))
      card.reduce(_ unionByName _).orderBy(col("metric"))
    }),

    // Calibration (reliability) bins — the eval that decides whether
    // q106's classifier SCORES can gate the corpus or only rank it:
    // scores bucket into deciles and each bin reports its empirical
    // positive rate against an independent outcome (the Gopher
    // repetition gate, q56's kept flag). Bins key on the ROUNDED score
    // (engine-stable by q106's contract), the rate is one division of
    // exact integers, and the whole thing is two narrow per-doc scans
    // + one doc-keyed join + a 10-row aggregate.
    "q194_calibration_bins" -> ((s, d) => {
      val base = docs(s, d)
      val sc = CorpusOps.qualityScoreLinear(base, "doc_id", "text")
        .select(col("doc_id"), col("score"))
      val lbl = CorpusOps.repetitionFilter(base, "doc_id", "text")
        .select(col("doc_id"), col("kept"))
      sc.join(lbl, Seq("doc_id"))
        .withColumn("bin",
          least(floor(col("score") * 10), lit(9.0)).cast("long"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          graft.Graft.roundz(sum(col("score")) / count(lit(1)), 4)
            .as("mean_score4"),
          graft.Graft.roundz(
            sum(when(col("kept"), 1L).otherwise(0L)) / count(lit(1)), 4)
            .as("pos_rate4"))
        .orderBy(col("bin"))
    }),

    // Group-integral K-fold assignment (GroupKFold): cross-validation
    // folds where every document of a SOURCE lands in the same fold —
    // the split that prevents near-duplicate leakage across folds when
    // a source syndicates its own content (q77 audits doc-level
    // leakage; this is the split discipline that avoids it by
    // construction). Fold = deterministic hash of the GROUP key, so
    // assignment is a pure scan predicate (no shuffle beyond the
    // rollup), retry-stable, and any executor computes it locally.
    // Output pins fold sizes AND group integrity (each source's
    // fold-count must be 1 — flips red if assignment ever keys on the
    // doc instead of the group).
    "q193_group_kfold" -> ((s, d) => {
      // the q57 multiplicative hash on the numeric group key keeps the
      // oracle recomputable; arbitrary string groups use xxhash64
      // through the identical plumbing
      val folded = table(s, d, "documents")
        .withColumn("fold",
          pmod(pmod(substring(col("source"), 4, 10).cast("long"), lit(5L))
            * 2654435761L, lit(5L)))
      val sizes = folded.groupBy(col("fold"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"))
      val integ = folded.groupBy(col("source"))
        .agg(countDistinct(col("fold")).as("nf"))
        .agg(max(col("nf")).as("max_folds_per_source"))
      sizes.crossJoin(broadcast(integ))
        .select(col("fold"), col("n_docs"), col("n_sources"),
          (col("max_folds_per_source") === 1).as("group_integrity_ok"))
        .orderBy(col("fold"))
    }),

    // Takedown with TRANSITIVE span excision — the right-to-be-forgotten
    // / DMCA pass a training corpus actually needs: dropping a revoked
    // source's documents is not enough, because other documents QUOTE
    // them — so the revoked docs' 5-grams become the reference set and
    // every span of surviving text built from them is excised (q162's
    // cross-duplicate machinery consuming q172's excision operator).
    // The revoked side is small vs the corpus, so its gram set
    // broadcasts — the surviving corpus crosses a broadcast semi-join
    // with zero corpus shuffle (the q162 asymmetry). Per-doc rows for
    // doc_id < 30 plus the corpus tail row (-1) pin total removals.
    "q192_takedown_excision" -> ((s, d) => {
      val base = docs(s, d)
      val gone = base.filter(col("source") === lit("src7"))
        .select(col("doc_id"), col("text"))
      val keep = base.filter(col("source") =!= lit("src7"))
        .select(col("doc_id"), col("text"))
      val spans = graft.ext.NearDup.crossDuplicateSpans(
        keep, gone, "doc_id", "text", k = 5)
      val r = graft.ext.NearDup.exciseSpans(keep, spans, "doc_id", "text")
      val head = r.filter(col("doc_id") < 30)
      val tail = r.agg(lit(-1L).as("doc_id"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_removed")).as("n_removed"), lit("").as("clean_text"))
      head.unionByName(tail).orderBy(col("doc_id"))
    }),

    // Cross-source overlap matrix: distinct shared 5-grams per source
    // pair — the provenance diagnostic that shows which corpus sources
    // copy from each other (mirror sites, syndication) BEFORE dedup
    // spends a corpus pass. Grams dedup to (source, kg) first (one
    // aggregate), so the pair join fans out per gram by the number of
    // sources sharing it — bounded by the source universe, the
    // q121-basket shape, not by corpus size. Text keys for the oracle;
    // production keys by xxhash64(gram) as in q160.
    "q166_source_overlap" -> ((s, d) => {
      val grams = docs(s, d)
        .select(col("source"),
          filter(split(lower(col("text")), " "), t => t =!= lit(""))
            .as("__toks"))
        .filter(size(col("__toks")) >= 5)
        .select(col("source"),
          explode(transform(sequence(lit(0), size(col("__toks")) - 5),
            i => array_join(slice(col("__toks"), i + 1, lit(5)), " ")))
            .as("kg"))
      // ONE pass over the gram relation (r14, guide §2.4): the old
      // (source, kg) distinct + kg self-join computed the corpus-wide
      // gram explode twice and shuffled it three times; one kg-keyed
      // collect_set (map-side partial dedup, set bounded by the source
      // universe — the same q121-basket bound the join relied on)
      // yields each gram's source list, and the ordered pairs explode
      // from the tiny array. Counts are identical: collect_set dedups
      // exactly what the distinct did.
      grams.groupBy(col("kg"))
        .agg(sort_array(collect_set(col("source"))).as("ss"))
        .filter(size(col("ss")) > 1)
        .select(explode(col("ss")).as("source_a"), col("ss"))
        .select(col("source_a"), explode(col("ss")).as("source_b"))
        .filter(col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_shared_grams"))
        .orderBy(col("source_a"), col("source_b"))
    }))

  val oracles: Map[String, String] = Map(
    // identical modular-arithmetic hash replayed; the movers-only-to-
    // the-new-node boolean is the rendezvous theorem, hash-checked
    "q351_rendezvous_routing" ->
      """WITH n AS (SELECT unnest(generate_series(0, 8)) AS node),
         s AS (
           SELECT d.doc_id, n.node,
             (((d.doc_id * 2654435761 + n.node + 1) % 1000000007)
              * ((n.node * 97003969 + d.doc_id + 12345) % 1000000007))
               % 1000000007 AS h
           FROM documents d CROSS JOIN n),
         o8 AS (
           SELECT doc_id, node AS owner_before FROM (
             SELECT doc_id, node, ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY h DESC, node) AS rn
             FROM s WHERE node <= 7) t WHERE rn = 1),
         o9 AS (
           SELECT doc_id, node AS owner_after FROM (
             SELECT doc_id, node, ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY h DESC, node) AS rn
             FROM s) t WHERE rn = 1),
         j AS (
           SELECT owner_before, owner_after
           FROM o8 JOIN o9 USING (doc_id)),
         loads AS (
           SELECT owner_after, COUNT(*) AS ld FROM j GROUP BY 1),
         agg AS (
           SELECT COUNT(*) AS n_docs,
             SUM(CASE WHEN owner_after <> owner_before
               THEN 1 ELSE 0 END) AS n_moved,
             SUM(CASE WHEN owner_after <> owner_before
               AND owner_after <> 8 THEN 1 ELSE 0 END) AS x
           FROM j)
         SELECT CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_moved AS BIGINT) AS n_moved,
           CAST((n_moved * 1000) // n_docs AS BIGINT) AS moved_permille,
           x = 0 AS moves_only_to_new,
           (SELECT CAST(MAX(ld) AS BIGINT) FROM loads) AS max_load_after,
           (SELECT CAST(MIN(ld) AS BIGINT) FROM loads) AS min_load_after
         FROM agg""",
    // union-of-slice-stages ≡ direct build is a theorem (per-row map
    // commutes with union), query-verified; the rollup is replayed raw
    "q344_delta_staged_quality" ->
      """SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT)
             AS tokens,
           CAST(SUM(len(text)) AS BIGINT) AS chars,
           TRUE AS staged_eq_direct
         FROM documents GROUP BY lang ORDER BY lang""",
    "q56_repetition_filter" ->
      """WITH e AS (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
           FROM documents),
         c AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM e GROUP BY 1, 2),
         m AS (
           SELECT doc_id, SUM(cnt) AS n_tokens, COUNT(*) AS n_distinct,
                  MAX(cnt) AS top_cnt
           FROM c GROUP BY 1)
         SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           round(n_distinct * 1.0 / n_tokens, 4) AS distinct_ratio,
           round(top_cnt * 1.0 / n_tokens, 4) AS top_frac,
           (round(n_distinct * 1.0 / n_tokens, 4) >= 0.45
            AND round(top_cnt * 1.0 / n_tokens, 4) <= 0.15) AS kept
         FROM m ORDER BY doc_id""",
    "q57_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
         WHERE (doc_id % 1000 * 2654435761) % 1000 <
           CASE lang WHEN 'en' THEN 300 WHEN 'zh' THEN 50 ELSE 150 END
         ORDER BY doc_id""",
    "q58_length_quantiles" ->
      """SELECT lang, COUNT(*) AS n,
         round(quantile_cont(n_chars, 0.5), 4) AS p50,
         round(quantile_cont(n_chars, 0.9), 4) AS p90,
         round(quantile_cont(n_chars, 0.99), 4) AS p99
         FROM documents GROUP BY lang ORDER BY lang""",
    "q66_approx_quantiles" ->
      """SELECT lang, COUNT(*) AS n, TRUE AS p50_ok, TRUE AS p90_ok
         FROM documents GROUP BY lang ORDER BY lang""",
    // same contract stance as q66: the sketch value is construction-
    // derived, the rank brackets are the provable correctness story
    "q337_kll_quantiles" ->
      """SELECT lang, COUNT(*) AS n, TRUE AS p50_ok, TRUE AS p90_ok
         FROM documents GROUP BY lang ORDER BY lang""",
    // same contract stance: rank brackets, tail leg capped at max
    "q342_tdigest_quantiles" ->
      """SELECT lang, COUNT(*) AS n, TRUE AS p50_ok, TRUE AS p99_ok
         FROM documents GROUP BY lang ORDER BY lang""",
    "q59_shard_packing" ->
      """WITH w AS (
           SELECT doc_id, lang,
             len(string_split(lower(text), ' ')) AS n_tokens
           FROM documents),
         c AS (
           SELECT lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
           FROM w)
         SELECT lang, CAST(floor((cum - n_tokens) / 2000.0) AS BIGINT) AS shard,
           COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS tokens
         FROM c GROUP BY 1, 2 ORDER BY lang, shard""",
    "q60_pii_scrub" ->
      """WITH inj AS (
           SELECT doc_id, text ||
             CASE WHEN doc_id % 7 = 0
                  THEN ' contact user' || doc_id || '@example.com now'
                  WHEN doc_id % 7 = 3
                  THEN ' call 555-123-4567 ext ' || doc_id
                  ELSE '' END AS t
           FROM documents),
         s AS (
           SELECT doc_id,
             regexp_replace(
               regexp_replace(t, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
               '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS scrubbed
           FROM inj)
         SELECT doc_id, scrubbed,
           CAST((len(scrubbed) - len(replace(scrubbed, '<EMAIL>', ''))) / 7 AS BIGINT) AS n_email,
           CAST((len(scrubbed) - len(replace(scrubbed, '<PHONE>', ''))) / 7 AS BIGINT) AS n_phone
         FROM s ORDER BY doc_id""",
    "q77_split_leakage" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 100000, text FROM documents WHERE doc_id % 17 = 0),
         sp AS (
           SELECT md5(lower(text)) AS fp,
             CASE WHEN (doc_id % 1000 * 2654435761) % 1000 < 200
                  THEN 'test' ELSE 'train' END AS split
           FROM corpus),
         spread AS (
           SELECT fp, COUNT(DISTINCT split) AS n_splits FROM sp GROUP BY 1)
         SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked
         FROM sp JOIN spread USING (fp)
         GROUP BY split ORDER BY split""",
    "q78_contamination" ->
      """WITH snip AS (
           SELECT array_to_string(string_split(lower(text), ' ')[1:15], ' ') AS s
           FROM documents WHERE doc_id = 0),
         corpus AS (
           SELECT doc_id,
             CASE WHEN doc_id % 23 = 7
                  THEN lower(text) || ' ' || (SELECT s FROM snip)
                  ELSE lower(text) END AS t
           FROM documents),
         toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM corpus),
         g AS (
           SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS ng
           FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w)-7)) AS i) ix
           WHERE len(w) >= 8),
         bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % 97 = 0),
         cand AS (SELECT doc_id, ng FROM g WHERE doc_id % 97 <> 0),
         hit AS (
           SELECT c.doc_id, COUNT(*) AS n_hit
           FROM cand c JOIN bench b USING (ng) GROUP BY 1),
         tot AS (SELECT doc_id, COUNT(*) AS n_ngrams FROM cand GROUP BY 1)
         SELECT t.doc_id, CAST(t.n_ngrams AS BIGINT) AS n_ngrams,
           CAST(h.n_hit AS BIGINT) AS n_hit,
           round(h.n_hit * 1.0 / t.n_ngrams, 4) AS overlap
         FROM tot t JOIN hit h USING (doc_id)
         WHERE h.n_hit > 0 ORDER BY t.doc_id""",
    // MG candidates then exact-count = plain GROUP BY ... HAVING
    "q81_heavy_hitters" ->
      """WITH toks AS (
           SELECT unnest(string_split(lower(text), ' ')) AS tok
           FROM documents),
         tot AS (SELECT COUNT(*) AS n FROM toks)
         SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
         HAVING COUNT(*) >= (SELECT ceil(n * 0.03) FROM tot)
         ORDER BY cnt DESC, tok""",
    // injection + strip chain mirrored step for step (same regexes,
    // same order); 'g' flags since Spark regexp_replace is global
    "q84_markup_strip" ->
      """WITH w AS (
           SELECT doc_id, CASE WHEN doc_id % 11 = 3
             THEN '<div class="post"><h1>T</h1><p>' || text ||
                  '</p><script>track();</script> &amp; more &lt;tail&gt;</div>'
             ELSE text END AS t
           FROM documents),
         s1 AS (SELECT doc_id, regexp_replace(t,
                  '<(script|style)[^>]*>[^<]*</(script|style)>', ' ', 'g') AS t
                FROM w),
         s2 AS (SELECT doc_id, regexp_replace(t, '<[^>]*>', ' ', 'g') AS t FROM s1),
         s3 AS (SELECT doc_id,
                  regexp_replace(regexp_replace(regexp_replace(t,
                    '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&amp;', '&', 'g') AS t
                FROM s2),
         s4 AS (SELECT doc_id,
                  trim(regexp_replace(t, '[ \t\n\f\r]+', ' ', 'g')) AS cleaned
                FROM s3)
         SELECT doc_id, cleaned, CAST(length(cleaned) AS INT) AS n_clean
         FROM s4 ORDER BY doc_id""",
    // chr(769)/chr(776) = the combining marks the Spark side injects
    "q85_nfc_normalize" ->
      """WITH inj AS (
           SELECT doc_id, CASE WHEN doc_id % 13 = 4
             THEN text || ' cafe' || chr(769) || ' nai' || chr(776) || 've'
             ELSE text END AS t
           FROM documents)
         SELECT doc_id,
           CAST(length(nfc_normalize(t)) AS INT) AS n_norm,
           md5(nfc_normalize(t)) AS fp
         FROM inj ORDER BY doc_id""",
    "q96_exact_k_sample" ->
      """WITH r AS (
           SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
               ORDER BY (doc_id % 1000 * 2654435761) % 1000, doc_id) AS rk
           FROM documents)
         SELECT doc_id, lang FROM r WHERE rk <= 20 ORDER BY doc_id""",
    // identical A-Res priorities: pow of the same hash-uniform and
    // weight (all-DOUBLE math), ties by doc_id
    "q102_weighted_sample" ->
      """WITH r AS (
           SELECT doc_id, lang, n_chars,
             row_number() OVER (ORDER BY
               pow(((doc_id % 1000 * 2654435761) % 1000 + CAST(0.5 AS DOUBLE))
                     / CAST(1000.0 AS DOUBLE),
                   CAST(1.0 AS DOUBLE) / n_chars) DESC, doc_id) AS rk
           FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
         SELECT doc_id, lang, n_chars FROM r WHERE rk <= 25
         ORDER BY doc_id""",
    // full LM recompute: positional bigrams via aligned unnest +
    // generate_subscripts self-join, same add-one smoothing (ln, not
    // DuckDB's log10), identical rounding and tiebreak
    "q105_bigram_lm" ->
      """WITH base AS (
           SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
           FROM documents WHERE text IS NOT NULL),
         toks AS (
           SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS pos
           FROM base WHERE len(l) >= 2),
         bg AS (
           SELECT a.doc_id, a.w || ' ' || b.w AS bg, a.w AS w1
           FROM toks a JOIN toks b
             ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         cbi AS (
           SELECT bg, COUNT(*) AS c_bg FROM bg WHERE doc_id % 2 = 0
           GROUP BY bg),
         uni AS (
           SELECT w AS w1, COUNT(*) AS c_w FROM toks WHERE doc_id % 2 = 0
           GROUP BY w),
         v AS (SELECT COUNT(*) AS v_size FROM uni)
         SELECT c.doc_id, COUNT(*) AS n_bigrams,
           CAST(SUM(CASE WHEN cbi.c_bg IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_unseen,
           round(exp(-avg(ln(
             CAST(coalesce(cbi.c_bg, 0) + 1 AS DOUBLE) /
             (coalesce(uni.c_w, 0) + v.v_size)))), 4) AS ppl
         FROM bg c LEFT JOIN cbi USING (bg)
           LEFT JOIN uni ON uni.w1 = c.w1 CROSS JOIN v
         WHERE c.doc_id % 2 = 1
         GROUP BY c.doc_id
         ORDER BY ppl DESC, doc_id LIMIT 20""",
    // identical arithmetic weights, mean pool, sigmoid, rounding
    "q106_quality_classifier" ->
      """WITH base AS (
           SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
           FROM documents WHERE text IS NOT NULL),
         tt AS (
           SELECT doc_id, unnest(l) AS tok, len(l) AS n FROM base
           WHERE len(l) > 0),
         s AS (
           SELECT doc_id, CAST(any_value(n) AS INT) AS n_toks,
             SUM(CAST((length(tok) * 37 + ascii(tok[1:1]) * 17 +
                       ascii(tok[-1:])) % 201 - 100 AS DOUBLE) / 100.0)
               AS ssum
           FROM tt GROUP BY doc_id),
         sc AS (
           SELECT doc_id, n_toks,
             round(1.0 / (1.0 + exp(-ssum / n_toks)), 4) AS score
           FROM s)
         SELECT doc_id, n_toks, score, TRUE AS keep FROM sc
         WHERE score >= 0.5 ORDER BY score DESC, doc_id LIMIT 25""",
    "q103_vocab_coverage" ->
      """WITH toks AS (
           SELECT doc_id, lang,
             unnest(list_filter(string_split(lower(text), ' '),
                                t -> t <> '')) AS term
           FROM documents WHERE text IS NOT NULL),
         vocab AS (
           SELECT term FROM (
             SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks
             GROUP BY term ORDER BY df DESC, term LIMIT 30)),
         per_doc AS (
           SELECT doc_id, any_value(lang) AS lang, COUNT(*) AS n_toks,
             sum(CASE WHEN term IN (SELECT term FROM vocab)
                 THEN 0 ELSE 1 END) AS n_oov
           FROM toks GROUP BY doc_id)
         SELECT lang, COUNT(*) AS n_docs,
           round(avg(CAST(n_oov AS DOUBLE) / n_toks), 4) AS avg_oov,
           CAST(sum(CASE WHEN n_oov = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS full_cover
         FROM per_doc GROUP BY lang ORDER BY lang""",
    // the parallel two-phase ranking must equal the serial window
    "q94_dense_ids" ->
      """SELECT doc_id,
         CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS dense_id,
         lang
         FROM documents ORDER BY doc_id""",
    "q95_keep_canonical" ->
      """WITH corpus AS (
           SELECT doc_id, lang, lower(text) AS t, n_chars FROM documents
           UNION ALL
           SELECT doc_id + 200000, lang, lower(text),
             CAST(floor(n_chars / 2) AS BIGINT)
           FROM documents WHERE doc_id % 19 = 1),
         r AS (
           SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY md5(t)
               ORDER BY n_chars DESC, doc_id ASC) AS rk
           FROM corpus)
         SELECT doc_id, lang, n_chars FROM r WHERE rk = 1
         ORDER BY doc_id, n_chars""",
    "q86_sequence_slices" ->
      """WITH w AS (
           SELECT doc_id, lang,
             len(string_split(lower(text), ' ')) AS n_tok
           FROM documents),
         c AS (
           SELECT doc_id, lang, n_tok,
             SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - n_tok AS st
           FROM w),
         sl AS (
           SELECT lang, i AS seq_id,
             greatest(st, i*512) AS s0,
             least(st + n_tok, (i+1)*512) AS s1
           FROM c, LATERAL (SELECT unnest(generate_series(
               CAST(floor(st/512) AS BIGINT),
               CAST(floor((st + n_tok - 1)/512.0) AS BIGINT))) AS i) t)
         SELECT lang, seq_id, COUNT(*) AS n_docs,
           CAST(SUM(s1 - s0) AS BIGINT) AS n_tokens
         FROM sl GROUP BY 1, 2 ORDER BY lang, seq_id""",
    // identical ordered cumulative-weight test
    "q149_weighted_median" ->
      """WITH t AS (
           SELECT lang, doc_id, n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS wt
           FROM documents),
         c AS (
           SELECT lang, doc_id, n_chars,
             SUM(wt) OVER (PARTITION BY lang ORDER BY n_chars, doc_id
               ROWS UNBOUNDED PRECEDING) AS cumw,
             SUM(wt) OVER (PARTITION BY lang) AS total
           FROM t),
         f AS (
           SELECT lang, n_chars, total,
             row_number() OVER (PARTITION BY lang
               ORDER BY n_chars, doc_id) AS rn
           FROM c WHERE cumw * 2 >= total)
         SELECT lang, CAST(n_chars AS BIGINT) AS w_median_chars,
           CAST(total AS BIGINT) AS total_tokens
         FROM f WHERE rn = 1 ORDER BY lang""",
    // identical percent_rank semantics (ties share (rank-1)/(n-1))
    "q146_quantile_calibrate" ->
      """WITH p AS (
           SELECT lang, n_chars,
             percent_rank() OVER (PARTITION BY lang ORDER BY n_chars)
               AS pct
           FROM documents)
         SELECT lang,
           least(CAST(floor(pct * 10) AS BIGINT), 9) AS decile,
           COUNT(*) AS n,
           CAST(MIN(n_chars) AS BIGINT) AS lo,
           CAST(MAX(n_chars) AS BIGINT) AS hi
         FROM p GROUP BY lang, decile ORDER BY lang, decile""",
    // same counts, same smoothing, same op order, same pre-round
    "q145_token_kl" ->
      """WITH cp AS (
           SELECT tok, COUNT(*) AS kp FROM (
             SELECT unnest(string_split(text, ' ')) AS tok
             FROM documents WHERE doc_id % 2 = 0)
           WHERE tok <> '' GROUP BY tok),
         cq AS (
           SELECT tok, COUNT(*) AS kq FROM (
             SELECT unnest(string_split(text, ' ')) AS tok
             FROM documents WHERE doc_id % 2 = 1)
           WHERE tok <> '' GROUP BY tok),
         j AS (
           SELECT coalesce(kp, 0) AS kp, coalesce(kq, 0) AS kq
           FROM cp FULL OUTER JOIN cq USING (tok)),
         t AS (
           SELECT CAST(SUM(kp) AS BIGINT) AS np,
             CAST(SUM(kq) AS BIGINT) AS nq, COUNT(*) AS v FROM j)
         SELECT round(SUM(round(
             ((kp + 1) * 1.0 / (np + v)) *
               ln(((kp + 1) * 1.0 / (np + v)) /
                  ((kq + 1) * 1.0 / (nq + v))), 12)), 6) + 0.0 AS kl_nats,
           COUNT(*) AS vocab
         FROM j, t""",
    // identical window replay of the quota
    "q144_source_quota" ->
      """WITH r AS (
           SELECT source, n_chars,
             row_number() OVER (PARTITION BY source
               ORDER BY n_chars DESC, doc_id) AS rn
           FROM documents)
         SELECT source, COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS chars_kept,
           CAST(MIN(n_chars) AS BIGINT) AS cutoff_chars
         FROM r WHERE rn <= 3 GROUP BY source ORDER BY source""",
    // identical dup derivation, survivorship replayed with a window
    "q137_golden_record" ->
      """WITH base AS (
           SELECT doc_id, text, lang, n_chars FROM documents),
         dups AS (
           SELECT doc_id + 300000 AS doc_id,
             array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ')
               AS text,
             NULL AS lang,
             CAST(len(array_to_string(
               list_slice(string_split(text, ' '), 1, 5), ' ')) AS BIGINT)
               AS n_chars
           FROM base WHERE doc_id % 13 = 4),
         al AS (SELECT * FROM base UNION ALL SELECT * FROM dups),
         cl AS (
           SELECT *,
             CASE WHEN doc_id >= 300000 THEN doc_id - 300000
                  ELSE doc_id END AS cl,
             row_number() OVER (PARTITION BY
               CASE WHEN doc_id >= 300000 THEN doc_id - 300000
                    ELSE doc_id END
               ORDER BY n_chars DESC, doc_id) AS rk
           FROM al)
         SELECT cl, MIN(doc_id) AS canonical_id, COUNT(*) AS n_members,
           md5(MIN(CASE WHEN rk = 1 THEN text END)) AS text_md5,
           MAX(lang) AS lang, CAST(MAX(n_chars) AS BIGINT) AS chars
         FROM cl GROUP BY cl ORDER BY cl""",
    // same integer moments, same float op order → identical doubles
    "q135_group_regression" ->
      """WITH m AS (
           SELECT lang, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy
           FROM (SELECT lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
               n_chars AS y FROM documents)
           GROUP BY lang)
         SELECT lang, n,
           round((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 6)
             + 0.0 AS slope,
           round((sy - (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx)
             * sx) / n, 6) + 0.0 AS intercept
         FROM m ORDER BY lang""",
    // identical integer bucket/batch math, serial window replay
    "q133_length_batching" ->
      """WITH t AS (
           SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents),
         b AS (
           SELECT n_tok,
             CASE WHEN n_tok <= 1 THEN 0
                  ELSE len(bin(n_tok - 1)) END AS bucket,
             (row_number() OVER (PARTITION BY
                CASE WHEN n_tok <= 1 THEN 0
                     ELSE len(bin(n_tok - 1)) END
                ORDER BY n_tok, doc_id) - 1) // 8 AS batch_idx
           FROM t)
         SELECT CAST(bucket AS BIGINT) AS bucket, batch_idx,
           COUNT(*) AS n_seqs,
           CAST(SUM(n_tok) AS BIGINT) AS real_toks,
           CAST(MAX(n_tok) * COUNT(*) AS BIGINT) AS padded_toks
         FROM b GROUP BY bucket, batch_idx
         ORDER BY bucket, batch_idx""",
    // every chunk's identity (start, length, md5 of the joined slice)
    // re-derived from the same single-space split
    "q126_chunk_overlap" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS toks,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n
           FROM documents),
         c AS (
           SELECT doc_id, n, toks, i AS chunk_idx
           FROM t, LATERAL (SELECT unnest(generate_series(0,
               (greatest(n - 64, 0) + 47) // 48)) AS i) g)
         SELECT doc_id, chunk_idx,
           chunk_idx * 48 AS tok_start,
           least(64, n - chunk_idx * 48) AS n_toks,
           md5(array_to_string(
             list_slice(toks, chunk_idx * 48 + 1, chunk_idx * 48 + 64),
             ' ')) AS chunk_md5
         FROM c ORDER BY doc_id, chunk_idx""",
    // identical windows: longest-first cumulative token mass per lang,
    // keep while the running sum BEFORE the doc is under 60% of total
    "q127_top_p_budget" ->
      """WITH t AS (
           SELECT lang, doc_id, n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents),
         w AS (
           SELECT lang, n_tok,
             SUM(n_tok) OVER (PARTITION BY lang
               ORDER BY n_chars DESC, doc_id
               ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(n_tok) OVER (PARTITION BY lang) AS total
           FROM t)
         SELECT lang, COUNT(*) AS n_kept,
           CAST(SUM(n_tok) AS BIGINT) AS tok_kept,
           CAST(MAX(total) AS BIGINT) AS tok_total
         FROM w WHERE (cum - n_tok) * 1000 < 600 * total
         GROUP BY lang ORDER BY lang""",
    "q87_char_entropy" ->
      """WITH ch AS (
           SELECT doc_id, unnest(regexp_extract_all(lower(text), '[^\n\r]')) AS c
           FROM documents),
         cnt AS (SELECT doc_id, c, COUNT(*) AS k FROM ch GROUP BY 1, 2),
         n AS (SELECT doc_id, SUM(k) AS n FROM cnt GROUP BY 1)
         SELECT cnt.doc_id,
           round(-SUM((k*1.0/n) * log2(k*1.0/n)), 4) + 0.0 AS entropy,
           round(-SUM((k*1.0/n) * log2(k*1.0/n)), 4) >= 3.0 AS keep
         FROM cnt JOIN n USING (doc_id) GROUP BY 1 ORDER BY cnt.doc_id""",
    // same double-precision rate math, same multiplicative-hash predicate
    // same α-smoothing chain: √n weights, one-row W, basis-point floor,
    // q57 hash keep predicate
    "q188_temperature_mixture" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
         w AS (SELECT lang, n, sqrt(CAST(n AS DOUBLE)) AS ws FROM c),
         t AS (SELECT SUM(ws) AS W FROM w),
         r AS (SELECT lang,
             CAST(floor(least(CAST(1.0 AS DOUBLE),
               CAST(300 AS DOUBLE) * (ws / t.W) / n) * 10000) AS BIGINT)
               AS rate_bp
           FROM w, t)
         SELECT d.lang, r.rate_bp, COUNT(*) AS n_kept,
           CAST(SUM(d.n_chars) AS BIGINT) AS chars
         FROM documents d JOIN r ON d.lang = r.lang
         WHERE (d.doc_id % 10000 * 2654435761) % 10000 < r.rate_bp
         GROUP BY d.lang, r.rate_bp ORDER BY d.lang""",
    "q83_mixture_rebalance" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
         t(lang, share) AS (VALUES
           ('en', CAST(0.5 AS DOUBLE)), ('de', CAST(0.3 AS DOUBLE)),
           ('zh', CAST(0.2 AS DOUBLE))),
         j AS (SELECT c.lang, n, share, n / share AS cap
               FROM c JOIN t USING (lang)),
         m AS (SELECT MIN(cap) AS tt FROM j),
         r AS (SELECT lang, floor(1000.0 * tt * share / n) AS permille
               FROM j, m)
         SELECT d.lang, COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS chars
         FROM documents d JOIN r USING (lang)
         WHERE (doc_id % 1000 * 2654435761) % 1000 < permille
         GROUP BY 1 ORDER BY d.lang""",
    // the q330 unrolled Sinkhorn CTE over the length-decile marginals,
    // then the permille routing + multiplicative-hash range assignment
    // replayed with identical integer math
    "q332_ot_rebalance" ->
      """WITH d0 AS (SELECT doc_id, n_chars FROM documents),
         mx AS (SELECT MAX(n_chars) AS maxc FROM d0),
         binned AS (
           SELECT doc_id,
             (CAST(n_chars AS BIGINT) * 10) // (maxc + 1) AS bin
           FROM d0, mx),
         sp AS (SELECT unnest(generate_series(0, 9)) AS bin),
         tot AS (SELECT COUNT(*) AS n FROM binned),
         am AS (
           SELECT sp.bin, round(CAST(COALESCE(x.c, 0) AS DOUBLE)
             / CAST(tot.n AS DOUBLE), 12) AS a
           FROM sp LEFT JOIN (SELECT bin, COUNT(*) AS c FROM binned
             GROUP BY bin) x ON x.bin = sp.bin, tot),
         bm AS (SELECT bin, CAST(0.1 AS DOUBLE) AS b FROM sp),
         g0 AS (
           SELECT am.bin AS i, bm.bin AS j,
             round(exp(-CAST(abs(am.bin - bm.bin) AS DOUBLE) / 1.0), 12)
               AS k,
             am.a, bm.b, 1.0 AS u
           FROM am CROSS JOIN bm),
         s1 AS (SELECT *, MAX(cs) OVER (PARTITION BY j) AS s FROM (
           SELECT *, SUM(k*u) OVER (PARTITION BY j ORDER BY i
             ROWS UNBOUNDED PRECEDING) AS cs FROM g0) x1),
         v1 AS (SELECT i, j, k, a, b, u,
           round(CASE WHEN b > 0 THEN b/s ELSE 0.0 END, 12) AS v
           FROM s1),
         t1 AS (SELECT *, MAX(ct) OVER (PARTITION BY i) AS tt FROM (
           SELECT *, SUM(k*v) OVER (PARTITION BY i ORDER BY j
             ROWS UNBOUNDED PRECEDING) AS ct FROM v1) x2),
         g1 AS (SELECT i, j, k, a, b,
           round(CASE WHEN a > 0 THEN a/tt ELSE 0.0 END, 12) AS u, v
           FROM t1),
         s2 AS (SELECT *, MAX(cs) OVER (PARTITION BY j) AS s FROM (
           SELECT *, SUM(k*u) OVER (PARTITION BY j ORDER BY i
             ROWS UNBOUNDED PRECEDING) AS cs FROM g1) x3),
         v2 AS (SELECT i, j, k, a, b, u,
           round(CASE WHEN b > 0 THEN b/s ELSE 0.0 END, 12) AS v
           FROM s2),
         t2 AS (SELECT *, MAX(ct) OVER (PARTITION BY i) AS tt FROM (
           SELECT *, SUM(k*v) OVER (PARTITION BY i ORDER BY j
             ROWS UNBOUNDED PRECEDING) AS ct FROM v2) x4),
         g2 AS (SELECT i, j, k, a, b,
           round(CASE WHEN a > 0 THEN a/tt ELSE 0.0 END, 12) AS u, v
           FROM t2),
         s3 AS (SELECT *, MAX(cs) OVER (PARTITION BY j) AS s FROM (
           SELECT *, SUM(k*u) OVER (PARTITION BY j ORDER BY i
             ROWS UNBOUNDED PRECEDING) AS cs FROM g2) x5),
         v3 AS (SELECT i, j, k, a, b, u,
           round(CASE WHEN b > 0 THEN b/s ELSE 0.0 END, 12) AS v
           FROM s3),
         t3 AS (SELECT *, MAX(ct) OVER (PARTITION BY i) AS tt FROM (
           SELECT *, SUM(k*v) OVER (PARTITION BY i ORDER BY j
             ROWS UNBOUNDED PRECEDING) AS ct FROM v3) x6),
         g3 AS (SELECT i, j, k, a, b,
           round(CASE WHEN a > 0 THEN a/tt ELSE 0.0 END, 12) AS u, v
           FROM t3),
         p AS (SELECT i, j, a, round(u*k*v, 9) AS p9 FROM g3),
         pmt AS (SELECT i, j,
           CASE WHEN a > 0 THEN CAST(floor(1000.0 * p9 / a) AS BIGINT)
             ELSE 0 END AS pm FROM p),
         rng AS (SELECT i, j, pm,
           SUM(pm) OVER (PARTITION BY i ORDER BY j
             ROWS UNBOUNDED PRECEDING) AS hi FROM pmt),
         asg AS (
           SELECT b2.doc_id, r.i, r.j, r.pm
           FROM binned b2 JOIN rng r ON b2.bin = r.i
            AND (b2.doc_id % 1000 * 2654435761) % 1000 >= r.hi - r.pm
            AND (b2.doc_id % 1000 * 2654435761) % 1000 < r.hi)
         SELECT i AS src_bin, j AS tgt_bin, pm AS route_pm,
           COUNT(*) AS n_docs
         FROM asg GROUP BY 1, 2, 3 ORDER BY src_bin, tgt_bin""",
    // the full four-stage chain replayed as CTEs: q56's rounded
    // repetition ratios, q35's normalized-sha dedup window, q57's
    // multiplicative-hash sample predicate, q59's per-stratum cumsum
    "q119_pipeline_e2e" ->
      """WITH e AS (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
           FROM documents),
         c AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM e GROUP BY 1, 2),
         m AS (SELECT doc_id, SUM(cnt) AS n_tokens, COUNT(*) AS n_distinct,
                 MAX(cnt) AS top_cnt FROM c GROUP BY 1),
         q AS (SELECT d.* FROM documents d JOIN m ON d.doc_id = m.doc_id
               WHERE round(m.n_distinct * 1.0 / m.n_tokens, 4) >= 0.45
                 AND round(m.top_cnt * 1.0 / m.n_tokens, 4) <= 0.15),
         dd AS (SELECT *, row_number() OVER (
                  PARTITION BY sha256(trim(regexp_replace(lower(text),
                    '\s+', ' ', 'g')))
                  ORDER BY doc_id) AS rn FROM q),
         sm AS (SELECT * FROM dd WHERE rn = 1
                AND (doc_id % 1000 * 2654435761) % 1000 <
                    CASE WHEN lang = 'en' THEN 400 ELSE 200 END),
         w AS (SELECT doc_id, lang,
                 len(string_split(lower(text), ' ')) AS n_tokens FROM sm),
         cm AS (SELECT lang, doc_id, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
               FROM w)
         SELECT lang, CAST(floor((cum - n_tokens) / 1500.0) AS BIGINT) AS shard,
           COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
         FROM cm GROUP BY 1, 2 ORDER BY lang, shard""",
    // full recompute: fused target/reference counts, add-one smoothing
    // over the shared vocab, 12-dp pre-rounded terms, one division
    "q154_importance_resampling" ->
      """WITH e AS (
           SELECT doc_id, lang,
             unnest(list_filter(string_split(lower(text), ' '),
               x -> x <> '')) AS tok
           FROM documents),
         c AS (SELECT tok,
             SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS kt,
             COUNT(*) AS kr
           FROM e GROUP BY 1),
         t AS (SELECT CAST(SUM(kt) AS BIGINT) AS nt,
             CAST(SUM(kr) AS BIGINT) AS nr, COUNT(*) AS v FROM c),
         lr AS (SELECT tok,
             round(ln((kt + 1) * 1.0 / (nt + v)) -
                   ln((kr + 1) * 1.0 / (nr + v)), 12) AS lr
           FROM c, t),
         d AS (SELECT e.doc_id, COUNT(*) AS n_toks, SUM(lr.lr) AS s
           FROM e JOIN lr USING (tok) GROUP BY 1)
         SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
           round(s / n_toks, 6) + 0.0 AS lr6,
           round(s / n_toks, 6) + 0.0 >= 0.0 AS selected
         FROM d ORDER BY doc_id""",
    // quality + injection + exact-dedup counts recomputed with q119's
    // math; the xxhash64-derived LSH stages ride as contract booleans
    "q152_pipeline_neardup" ->
      """WITH e AS (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
           FROM documents),
         c AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM e GROUP BY 1, 2),
         m AS (SELECT doc_id, SUM(cnt) AS n_tokens, COUNT(*) AS n_distinct,
                 MAX(cnt) AS top_cnt FROM c GROUP BY 1),
         q AS (SELECT d.* FROM documents d JOIN m ON d.doc_id = m.doc_id
               WHERE round(m.n_distinct * 1.0 / m.n_tokens, 4) >= 0.45
                 AND round(m.top_cnt * 1.0 / m.n_tokens, 4) <= 0.15),
         inj AS (SELECT doc_id + 500000 AS doc_id,
                   text || ' zqduptoken' AS text
                 FROM q WHERE doc_id % 21 = 5),
         u AS (SELECT doc_id, text FROM q
               UNION ALL SELECT doc_id, text FROM inj),
         dd AS (SELECT doc_id, row_number() OVER (
                  PARTITION BY sha256(trim(regexp_replace(lower(text),
                    '\s+', ' ', 'g')))
                  ORDER BY doc_id) AS rn FROM u)
         SELECT (SELECT COUNT(*) FROM q) AS n_quality,
           (SELECT COUNT(*) FROM inj) AS n_injected,
           (SELECT COUNT(*) FROM dd WHERE rn = 1) AS n_after_exact,
           TRUE AS injected_recall_ok, TRUE AS precision_ok,
           TRUE AS pipeline_ok""",
    // full recomputation: 3-token windows (1-based inclusive list
    // slices clip at the end exactly like Spark's slice), first
    // occurrence by (doc, pos), per-doc reassembly via ordered
    // string_agg (NULL-skipping, '' for fully-deduped docs)
    "q112_segment_dedup" ->
      """WITH s AS (
           SELECT doc_id, string_split(lower(text), ' ') AS toks
           FROM documents
           WHERE len(string_split(lower(text), ' ')) > 0),
         segs AS (
           SELECT doc_id, i AS seg,
             array_to_string(toks[i*3+1 : i*3+3], ' ') AS seg_text
           FROM s, unnest(generate_series(0,
             CAST(floor((len(toks) - 1) / 3.0) AS BIGINT))) AS t(i)),
         marked AS (
           SELECT doc_id, seg, seg_text,
             row_number() OVER (PARTITION BY seg_text
                                ORDER BY doc_id, seg) AS rn
           FROM segs),
         per_doc AS (
           SELECT doc_id, COUNT(*) AS n_segs,
             SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_kept,
             COALESCE(string_agg(CASE WHEN rn = 1 THEN seg_text END,
               ' ' ORDER BY seg), '') AS kept_text
           FROM marked GROUP BY doc_id)
         SELECT doc_id, CAST(n_segs AS BIGINT) AS n_segs,
           CAST(n_kept AS BIGINT) AS n_kept,
           round(n_kept * 1.0 / n_segs, 4) AS kept_frac, kept_text
         FROM per_doc WHERE doc_id < 40
         UNION ALL
         SELECT -1, CAST(SUM(n_segs) AS BIGINT), CAST(SUM(n_kept) AS BIGINT),
           round(SUM(n_kept) * 1.0 / SUM(n_segs), 4), ''
         FROM per_doc
         ORDER BY doc_id""",
    // same k-gram relation with positions, ≥2-distinct-doc grams,
    // islands via pos − row_number — full recompute of every stage
    "q160_dup_spans" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
           FROM documents),
         g AS (
           SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos,
             array_to_string(t.toks[u.i:u.i+4], ' ') AS kg
           FROM t, unnest(range(1, len(t.toks) - 3)) AS u(i)
           WHERE len(t.toks) >= 5),
         dup AS (
           SELECT kg FROM g GROUP BY kg
           HAVING COUNT(DISTINCT doc_id) >= 2),
         d AS (SELECT doc_id, pos FROM g
               WHERE kg IN (SELECT kg FROM dup)),
         isl AS (
           SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
           FROM d)
         SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 4 AS span_end,
           MAX(pos) - MIN(pos) + 5 AS span_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_grams
         FROM isl GROUP BY doc_id, grp
         ORDER BY doc_id, span_start""",
    // exact recompute with STRING grams (q38's hash-equivalence
    // stance), mirroring ShingleHashes semantics precisely: plain
    // split (no empty-token filter), per-doc DISTINCT windows,
    // whole-text fallback below k=8 tokens. The Bloom pre-filter
    // cannot change the result (no false negatives; positives are
    // removed by the exact confirm join), so no sketch model appears
    // here — identical to q74's stance.
    "q206_bloom_decontaminate" ->
      """WITH snip AS (
           SELECT array_to_string(string_split(lower(text), ' ')[1:15], ' ')
             AS s
           FROM documents WHERE doc_id = 0),
         corpus AS (
           SELECT doc_id,
             CASE WHEN doc_id % 23 = 7
                  THEN lower(text) || ' ' || (SELECT s FROM snip)
                  ELSE lower(text) END AS t
           FROM documents),
         toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM corpus),
         sh AS (
           SELECT doc_id,
             CASE WHEN len(w) < 8 THEN [array_to_string(w, ' ')]
                  ELSE list_distinct([array_to_string(w[i:i+7], ' ')
                                      for i in generate_series(1, len(w)-7)])
             END AS kgs
           FROM toks),
         g AS (SELECT doc_id, unnest(kgs) AS kg FROM sh),
         bench AS (SELECT DISTINCT kg FROM g WHERE doc_id % 97 = 0)
         SELECT doc_id, COUNT(*) AS n_shared
         FROM g JOIN bench USING (kg)
         WHERE doc_id % 97 <> 0
         GROUP BY doc_id ORDER BY doc_id""",
    // q78's injection fixture + q160's islands machinery: bench grams
    // distinct-ed, train positions semi-joined, runs coalesced
    "q162_decontaminate_spans" ->
      """WITH snip AS (
           SELECT array_to_string(string_split(lower(text), ' ')[1:15], ' ')
             AS s
           FROM documents WHERE doc_id = 0),
         corpus AS (
           SELECT doc_id,
             CASE WHEN doc_id % 23 = 7
                  THEN lower(text) || ' ' || (SELECT s FROM snip)
                  ELSE lower(text) END AS t
           FROM documents),
         toks AS (
           SELECT doc_id,
             list_filter(string_split(t, ' '), x -> x <> '') AS w
           FROM corpus),
         g AS (
           SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos,
             array_to_string(toks.w[u.i:u.i+7], ' ') AS kg
           FROM toks, unnest(range(1, len(toks.w) - 6)) AS u(i)
           WHERE len(toks.w) >= 8),
         bench AS (SELECT DISTINCT kg FROM g WHERE doc_id % 97 = 0),
         hits AS (
           SELECT doc_id, pos FROM g
           WHERE doc_id % 97 <> 0 AND kg IN (SELECT kg FROM bench)),
         isl AS (
           SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
           FROM hits)
         SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 7 AS span_end,
           MAX(pos) - MIN(pos) + 8 AS span_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_grams
         FROM isl GROUP BY doc_id, grp
         ORDER BY doc_id, span_start""",
    // per-(doc, gram) row_number marks later recurrences; islands
    // coalesce them — same machinery as q160 scoped within the doc
    "q163_repeat_spans" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
           FROM documents),
         g AS (
           SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos,
             array_to_string(t.w[u.i:u.i+2], ' ') AS kg
           FROM t, unnest(range(1, len(t.w) - 1)) AS u(i)
           WHERE len(t.w) >= 3),
         r AS (
           SELECT doc_id, pos,
             row_number() OVER (PARTITION BY doc_id, kg ORDER BY pos)
               AS rn
           FROM g),
         isl AS (
           SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
           FROM r WHERE rn >= 2)
         SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 2 AS span_end,
           MAX(pos) - MIN(pos) + 3 AS span_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_grams
         FROM isl GROUP BY doc_id, grp
         ORDER BY doc_id, span_start""",
    // deterministic integer cuts, list slices, byte-identical PSM
    // sentinel join
    "q164_fim_examples" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
           FROM documents),
         m AS (
           SELECT doc_id, w, len(w) AS n,
             len(w) // 3 AS p1, (len(w) * 2) // 3 AS p2
           FROM t WHERE len(w) >= 12)
         SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           CAST(p1 AS BIGINT) AS n_prefix,
           CAST(p2 - p1 AS BIGINT) AS n_middle,
           CAST(n - p2 AS BIGINT) AS n_suffix,
           '<fim_prefix> ' || array_to_string(w[1:p1], ' ')
             || ' <fim_suffix> ' || array_to_string(w[p2+1:n], ' ')
             || ' <fim_middle> ' || array_to_string(w[p1+1:p2], ' ')
             AS psm
         FROM m ORDER BY doc_id""",
    // q105's LM recompute (no LIMIT) + the same ntile over (ppl,
    // doc_id) + per-phase rollup
    "q167_curriculum_phases" ->
      """WITH base AS (
           SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
           FROM documents WHERE text IS NOT NULL),
         toks AS (
           SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS pos
           FROM base WHERE len(l) >= 2),
         bg AS (
           SELECT a.doc_id, a.w || ' ' || b.w AS bg, a.w AS w1
           FROM toks a JOIN toks b
             ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         cbi AS (
           SELECT bg, COUNT(*) AS c_bg FROM bg WHERE doc_id % 2 = 0
           GROUP BY bg),
         uni AS (
           SELECT w AS w1, COUNT(*) AS c_w FROM toks WHERE doc_id % 2 = 0
           GROUP BY w),
         v AS (SELECT COUNT(*) AS v_size FROM uni),
         scored AS (
           SELECT c.doc_id, COUNT(*) AS n_bigrams,
             round(exp(-avg(ln(
               CAST(coalesce(cbi.c_bg, 0) + 1 AS DOUBLE) /
               (coalesce(uni.c_w, 0) + v.v_size)))), 4) AS ppl
           FROM bg c LEFT JOIN cbi USING (bg)
             LEFT JOIN uni ON uni.w1 = c.w1 CROSS JOIN v
           WHERE c.doc_id % 2 = 1
           GROUP BY c.doc_id),
         ph AS (
           SELECT doc_id, n_bigrams, ppl,
             CAST(ntile(4) OVER (ORDER BY ppl, doc_id) AS BIGINT)
               AS phase
           FROM scored)
         SELECT phase, CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(ppl) AS ppl_min, MAX(ppl) AS ppl_max,
           CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams
         FROM ph GROUP BY phase ORDER BY phase""",
    // full two-stage replay: stage-1 islands → indexed-lambda excision
    // → stage-2 grams on the REBUILT token stream → second excision
    // every card metric recomputed from the base table with the same
    // operator definitions (q32/q35/q56 spellings)
    // identical suppression decision replayed per quasi group
    "q213_k_anonymity" ->
      """WITH g AS (
           SELECT lang, source,
             CAST(n_chars % 97 AS VARCHAR) AS bucket,
             COUNT(*) OVER (PARTITION BY lang, source, n_chars % 97)
               AS n
           FROM documents)
         SELECT CASE WHEN n >= 5 THEN lang ELSE '*' END AS lang,
           CASE WHEN n >= 5 THEN source ELSE '*' END AS source,
           CASE WHEN n >= 5 THEN bucket ELSE '*' END AS bucket,
           n < 5 AS anon_suppressed, COUNT(*) AS n_rows
         FROM g GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""",
    // conservation totals are exact; the packing invariants are in-job
    // contract booleans (the assignment itself is algorithmic state)
    "q212_ffd_binpack" ->
      """WITH dw AS (
           SELECT doc_id, lang,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS w
           FROM documents)
         SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS tokens_total,
           TRUE AS no_overflow, TRUE AS ffd_le_nextfit,
           TRUE AS ffd_ge_lowerbound
         FROM dw WHERE w <= 1500 GROUP BY lang ORDER BY lang""",
    "q200_data_card" ->
      """WITH tok AS (
           SELECT len(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS nt
           FROM documents),
         tt AS (SELECT doc_id, unnest(list_filter(
             string_split(lower(text), ' '), x -> x <> '')) AS tok
           FROM documents),
         c AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM tt GROUP BY 1, 2),
         m AS (SELECT doc_id, SUM(cnt) AS n_tokens, COUNT(*) AS n_distinct,
                 MAX(cnt) AS top_cnt FROM c GROUP BY 1),
         kept AS (
           SELECT COUNT(*) AS v FROM m
           WHERE round(n_distinct * 1.0 / n_tokens, 4) >= 0.45
             AND round(top_cnt * 1.0 / n_tokens, 4) <= 0.15)
         SELECT metric, value FROM (
           SELECT 'docs' AS metric, COUNT(*) AS value FROM documents
           UNION ALL
           SELECT 'tokens_ws', CAST(SUM(nt) AS BIGINT) FROM tok
           UNION ALL
           SELECT 'distinct_norm_docs', COUNT(DISTINCT
             sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))))
           FROM documents
           UNION ALL
           SELECT 'langs', COUNT(DISTINCT lang) FROM documents
           UNION ALL
           SELECT 'sources', COUNT(DISTINCT source) FROM documents
           UNION ALL
           SELECT 'quality_kept', CAST(v AS BIGINT) FROM kept)
         ORDER BY metric""",
    // q106's score chain ⋈ q56's keep rule, binned on the rounded score
    "q194_calibration_bins" ->
      """WITH base AS (
           SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
           FROM documents WHERE text IS NOT NULL),
         tt AS (
           SELECT doc_id, unnest(l) AS tok, len(l) AS n FROM base
           WHERE len(l) > 0),
         s AS (
           SELECT doc_id, CAST(any_value(n) AS INT) AS n_toks,
             SUM(CAST((length(tok) * 37 + ascii(tok[1:1]) * 17 +
                       ascii(tok[-1:])) % 201 - 100 AS DOUBLE) / 100.0)
               AS ssum
           FROM tt GROUP BY doc_id),
         sc AS (
           SELECT doc_id,
             round(1.0 / (1.0 + exp(-ssum / n_toks)), 4) AS score
           FROM s),
         c AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM tt GROUP BY 1, 2),
         m AS (
           SELECT doc_id, SUM(cnt) AS n_tokens, COUNT(*) AS n_distinct,
             MAX(cnt) AS top_cnt
           FROM c GROUP BY 1),
         k AS (
           SELECT doc_id,
             (round(n_distinct * 1.0 / n_tokens, 4) >= 0.45
              AND round(top_cnt * 1.0 / n_tokens, 4) <= 0.15) AS kept
           FROM m),
         j AS (SELECT sc.doc_id, sc.score, k.kept
               FROM sc JOIN k USING (doc_id)),
         b AS (SELECT least(floor(score * 10), 9) AS bin, score, kept
               FROM j)
         SELECT CAST(bin AS BIGINT) AS bin, COUNT(*) AS n,
           round(SUM(score) / COUNT(*), 4) + 0.0 AS mean_score4,
           round(SUM(CASE WHEN kept THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
             + 0.0 AS pos_rate4
         FROM b GROUP BY bin ORDER BY bin""",
    // same multiplicative group hash; integrity re-derived from the
    // assignment itself
    "q193_group_kfold" ->
      """WITH f AS (
           SELECT *, (CAST(substr(source, 4, 10) AS BIGINT) % 5
                      * 2654435761) % 5 AS fold
           FROM documents),
         sz AS (
           SELECT fold, COUNT(*) AS n_docs,
             COUNT(DISTINCT source) AS n_sources
           FROM f GROUP BY fold),
         integ AS (
           SELECT MAX(nf) AS mx FROM (
             SELECT source, COUNT(DISTINCT fold) AS nf
             FROM f GROUP BY source))
         SELECT fold, n_docs, CAST(n_sources AS BIGINT) AS n_sources,
           (SELECT mx FROM integ) = 1 AS group_integrity_ok
         FROM sz ORDER BY fold""",
    // the q172 single-stage form: revoked-source grams as the
    // reference set, hits → islands → spans → rebuilt text
    "q192_takedown_excision" ->
      """WITH t AS (
           SELECT doc_id, source,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
           FROM documents),
         ref AS (
           SELECT DISTINCT array_to_string(t.w[u.i:u.i+4], ' ') AS kg
           FROM t, unnest(range(1, len(t.w) - 3)) AS u(i)
           WHERE len(t.w) >= 5 AND source = 'src7'),
         keepd AS (SELECT doc_id, w FROM t WHERE source <> 'src7'),
         g5 AS (
           SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos,
             array_to_string(keepd.w[u.i:u.i+4], ' ') AS kg
           FROM keepd, unnest(range(1, len(keepd.w) - 3)) AS u(i)
           WHERE len(keepd.w) >= 5),
         hits AS (
           SELECT doc_id, pos FROM g5
           WHERE kg IN (SELECT kg FROM ref)),
         isl AS (
           SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
           FROM hits),
         sp AS (
           SELECT doc_id, MIN(pos) AS s, MAX(pos) + 4 AS e
           FROM isl GROUP BY doc_id, grp),
         rg AS (
           SELECT doc_id, list({'s': s, 'e': e}) AS rs
           FROM sp GROUP BY doc_id),
         c AS (
           SELECT keepd.doc_id, len(keepd.w) AS n0,
             CASE WHEN rg.rs IS NULL THEN keepd.w
                  ELSE list_filter(keepd.w, (x, i) ->
                    len(list_filter(rg.rs,
                      r -> i - 1 >= r.s AND i - 1 <= r.e)) = 0)
             END AS w2
           FROM keepd LEFT JOIN rg ON rg.doc_id = keepd.doc_id),
         fin AS (
           SELECT doc_id, CAST(n0 AS BIGINT) AS n_tokens,
             CAST(n0 - len(w2) AS BIGINT) AS n_removed,
             array_to_string(w2, ' ') AS clean_text
           FROM c)
         SELECT doc_id, n_tokens, n_removed, clean_text
         FROM fin WHERE doc_id < 30
         UNION ALL
         SELECT -1, CAST(SUM(n_tokens) AS BIGINT),
           CAST(SUM(n_removed) AS BIGINT), ''
         FROM fin
         ORDER BY doc_id""",
    "q172_span_refinery" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
           FROM documents),
         g3 AS (
           SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos,
             array_to_string(t.w[u.i:u.i+2], ' ') AS kg
           FROM t, unnest(range(1, len(t.w) - 1)) AS u(i)
           WHERE len(t.w) >= 3),
         r3 AS (
           SELECT doc_id, pos,
             row_number() OVER (PARTITION BY doc_id, kg ORDER BY pos) AS rn
           FROM g3),
         isl1 AS (
           SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM r3 WHERE rn >= 2),
         sp1 AS (
           SELECT doc_id, MIN(pos) AS s, MAX(pos) + 2 AS e
           FROM isl1 GROUP BY doc_id, grp),
         rg1 AS (
           SELECT doc_id, list({'s': s, 'e': e}) AS rs
           FROM sp1 GROUP BY doc_id),
         c1 AS (
           SELECT t.doc_id, len(t.w) AS n0,
             CASE WHEN rg1.rs IS NULL THEN t.w
                  ELSE list_filter(t.w, (x, i) ->
                    len(list_filter(rg1.rs,
                      r -> i - 1 >= r.s AND i - 1 <= r.e)) = 0)
             END AS w1
           FROM t LEFT JOIN rg1 ON rg1.doc_id = t.doc_id),
         bench AS (
           SELECT DISTINCT array_to_string(t.w[u.i:u.i+4], ' ') AS kg
           FROM t, unnest(range(1, len(t.w) - 3)) AS u(i)
           WHERE len(t.w) >= 5 AND t.doc_id % 97 = 0),
         train AS (
           SELECT doc_id, n0, w1 FROM c1 WHERE doc_id % 97 <> 0),
         g5 AS (
           SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos,
             array_to_string(train.w1[u.i:u.i+4], ' ') AS kg
           FROM train, unnest(range(1, len(train.w1) - 3)) AS u(i)
           WHERE len(train.w1) >= 5),
         hits AS (
           SELECT doc_id, pos FROM g5
           WHERE kg IN (SELECT kg FROM bench)),
         isl2 AS (
           SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM hits),
         sp2 AS (
           SELECT doc_id, MIN(pos) AS s, MAX(pos) + 4 AS e
           FROM isl2 GROUP BY doc_id, grp),
         rg2 AS (
           SELECT doc_id, list({'s': s, 'e': e}) AS rs
           FROM sp2 GROUP BY doc_id),
         c2 AS (
           SELECT tr.doc_id, tr.n0, tr.w1,
             CASE WHEN rg2.rs IS NULL THEN tr.w1
                  ELSE list_filter(tr.w1, (x, i) ->
                    len(list_filter(rg2.rs,
                      r -> i - 1 >= r.s AND i - 1 <= r.e)) = 0)
             END AS w2
           FROM train tr LEFT JOIN rg2 ON rg2.doc_id = tr.doc_id),
         fin AS (
           SELECT doc_id, CAST(n0 AS BIGINT) AS n0,
             CAST(n0 - len(w1) AS BIGINT) AS rm_repeat,
             CAST(len(w1) - len(w2) AS BIGINT) AS rm_contam,
             array_to_string(w2, ' ') AS clean_text
           FROM c2)
         SELECT doc_id, n0, rm_repeat, rm_contam, clean_text
         FROM fin WHERE doc_id < 30
         UNION ALL
         SELECT -1, CAST(SUM(n0) AS BIGINT), CAST(SUM(rm_repeat) AS BIGINT),
           CAST(SUM(rm_contam) AS BIGINT), ''
         FROM fin
         ORDER BY doc_id""",
    // distinct (source, gram) first, then the pair join — same shape
    "q166_source_overlap" ->
      """WITH t AS (
           SELECT source,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
           FROM documents),
         g AS (
           SELECT DISTINCT source,
             array_to_string(t.w[u.i:u.i+4], ' ') AS kg
           FROM t, unnest(range(1, len(t.w) - 3)) AS u(i)
           WHERE len(t.w) >= 5)
         SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_grams
         FROM g a JOIN g b ON a.kg = b.kg AND a.source < b.source
         GROUP BY 1, 2 ORDER BY 1, 2""")
}
