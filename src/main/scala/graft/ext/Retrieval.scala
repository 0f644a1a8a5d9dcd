package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft.roundz

/** Keyword / lexical retrieval over a document corpus, and rank fusion
  * with the vector side ([[graft.ext.Similarity]]) — the missing half of
  * hybrid search (EXT, SURVEY.md §2.14): BM25 scoring via an inverted
  * postings join, set-overlap ranking, and reciprocal-rank fusion.
  *
  * Scale design (100 TB stance):
  *  - the corpus is tokenized in exactly TWO passes: one tiny
  *    count/avg aggregate for (N, avgdl) — map-side combined, no
  *    shuffle of text — and one postings pass (term, doc, tf) that is
  *    immediately probed by the broadcast query vocabulary, so only
  *    matching postings survive; document text never joins anything.
  *    (A deployment that runs many query batches over one corpus
  *    would persist the postings relation; a function can't own that
  *    lifecycle, so the stats pass stays explicit here.)
  *  - the query set (keyword queries are human-issued: thousands, not
  *    billions) broadcasts; scoring touches only postings whose term
  *    appears in some query — a broadcast semi probe on the postings
  *    scan, so corpus-side work is proportional to matching postings,
  *    never to |corpus| × |queries|;
  *  - document frequencies are computed for QUERY terms only (a
  *    handful of rows) and broadcast back — the full-vocabulary df
  *    table is never materialized;
  *  - all ordering keys are rounded scores with id tiebreaks, so
  *    rankings are deterministic and engine-portable.
  */
object Retrieval {

  /** Okapi BM25 scores for every (query, document) pair with at least
    * one matching term. `queries` is a small DataFrame (qid, qtext);
    * `docs` provides (idCol, textCol). Tokenization = split on single
    * spaces, lowercased (the corpus convention used by every text
    * operator here).
    *
    * score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    * with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — the
    * non-negative Robertson–Spärck-Jones form.
    *
    * Documents with null or whitespace-only text are excluded from the
    * corpus BEFORE any statistic, so N, avgdl, df and tf are all
    * computed over the same population; empty tokens produced by
    * consecutive/leading/trailing spaces are dropped (they would
    * otherwise inflate dl/df and form a matchable "" term).
    *
    * Returns (qid, doc id, score) — unrounded; rank with
    * [[bm25TopK]] for the deterministic rounded ordering.
    */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
                 queries: DataFrame, k1: Double = 1.2,
                 b: Double = 0.75): DataFrame = {
    val toks = docs
      .select(col(idCol).as("__id"),
        filter(split(lower(col(textCol)), " "), t => t =!= lit(""))
          .as("__toks"))
      .filter(col("__toks").isNotNull && size(col("__toks")) > 0)
    // corpus stats: one tiny map-side-combined aggregate over the SAME
    // filtered population as the postings, broadcast everywhere
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      avg(size(col("__toks"))).as("avgdl"))
    // postings (term, doc, tf) + per-doc length; two-stage hash agg
    val postings = toks
      .select(col("__id"), size(col("__toks")).as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy(col("__id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val qterms = queries
      .select(col("qid"),
        explode(filter(split(lower(col("qtext")), " "), t => t =!= lit("")))
          .as("term"))
      .distinct()
    // ONE pass over postings: probe with the broadcast query VOCAB
    // (qid-free, so (term, __id) stays unique), then df(term) =
    // row-count per term over the surviving slice — an exact distinct
    // doc count because postings is grouped, computed by a window on
    // the already-tiny matched relation instead of a second postings
    // branch (which would re-tokenize the corpus).
    val qvocab = qterms.select(col("term")).distinct()
    val matched = postings
      .join(broadcast(qvocab), Seq("term"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
    matched
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("__w",
        col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .join(broadcast(qterms), Seq("term"))
      .groupBy(col("qid"), col("__id"))
      .agg(sum(col("__w")).as("score"))
      .select(col("qid"), col("__id").as(idCol), col("score"))
  }

  /** Top-k BM25 per query, ranked by the ROUNDED score (4 decimals)
    * with doc-id tiebreak — rounding first makes the ordering
    * engine-portable: two engines whose float sums differ in the last
    * ulp still agree on the rounded key, and equal rounded scores
    * resolve by id on both sides.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, k: Int, k1: Double = 1.2,
               b: Double = 0.75): DataFrame = {
    val scored = bm25Scores(docs, idCol, textCol, queries, k1, b)
      .withColumn("score_r", roundz(col("score"), 4))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_r").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col(idCol), col("rank"), col("score_r"))
  }

  /** TF-IDF cosine retrieval (the classic "ltc" vector-space model —
    * Salton & Buckley 1988): document weight w_dt = (1 + ln tf)·ln(N/df),
    * query weight w_qt = ln(N/df) (distinct query terms, qtf = 1), score
    * = Σ w_dt·w_qt / (‖d‖·‖q‖) with ‖d‖ the L2 norm over the FULL
    * document vector — which is what distinguishes this build from
    * [[bm25Scores]]: cosine normalization needs idf for EVERY term in
    * every document, i.e. the complete inverted index, not just the
    * query slice.
    *
    * Scale shape (the standard distributed index build):
    *  - postings (doc, term, tf) from one tokenize pass;
    *  - df attached by a count-over-term WINDOW on postings — postings
    *    is unique per (doc, term), so the window count IS the document
    *    frequency, and the one term-keyed shuffle it costs replaces
    *    both a separate vocabulary aggregate AND the postings↔df join
    *    that a naive build would pay;
    *  - document norms: one doc-keyed aggregate over weighted postings;
    *  - scoring probes the weighted postings with the BROADCAST query
    *    vocabulary — corpus work after the index build is proportional
    *    to matching postings only.
    * Documents whose every term occurs in all documents (idf 0 ⇒ zero
    * norm) cannot be ranked by cosine and are excluded, as are queries
    * with no corpus term. Ordering = (round(score,4) desc, id) — the
    * engine-portable convention of [[bm25TopK]].
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                queries: DataFrame, k: Int): DataFrame = {
    val toks = docs
      .select(col(idCol).as("__id"),
        filter(split(lower(col(textCol)), " "), t => t =!= lit(""))
          .as("__toks"))
      .filter(col("__toks").isNotNull && size(col("__toks")) > 0)
    val stats = toks.agg(count(lit(1)).as("n_docs"))
    val posts = toks
      .select(col("__id"), explode(col("__toks")).as("term"))
      .groupBy(col("__id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
    val weighted = posts.crossJoin(broadcast(stats))
      .withColumn("idf", log(col("n_docs").cast("double") / col("df")))
      .withColumn("w_dt", (lit(1.0) + log(col("tf").cast("double"))) * col("idf"))
    val norms = weighted.groupBy(col("__id"))
      .agg(sqrt(sum(col("w_dt") * col("w_dt"))).as("norm_d"))
      .filter(col("norm_d") > 0)
    val qterms = queries
      .select(col("qid"),
        explode(filter(split(lower(col("qtext")), " "), t => t =!= lit("")))
          .as("term"))
      .distinct()
    val matched = weighted.join(broadcast(qterms), Seq("term"))
    // query norms: df of each query term read off the matched slice
    // (distinct per (qid, term) by construction of posts), tiny
    val qnorms = matched.select(col("qid"), col("term"), col("idf")).distinct()
      .groupBy(col("qid"))
      .agg(sqrt(sum(col("idf") * col("idf"))).as("norm_q"))
      .filter(col("norm_q") > 0)
    val scored = matched
      .groupBy(col("qid"), col("__id"))
      .agg(sum(col("w_dt") * col("idf")).as("dot"))
      .join(norms, Seq("__id"))
      .join(broadcast(qnorms), Seq("qid"))
      .withColumn("score_r",
        roundz(col("dot") / (col("norm_d") * col("norm_q")), 4))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_r").desc, col("__id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("__id").as(idCol), col("rank"), col("score_r"))
  }

  /** Distinct-token-overlap top-k: rank documents by |Q ∩ D| (distinct
    * tokens shared with the query), ties by id. An INTEGER-keyed
    * lexical ranking — no floats anywhere, so the rank numbers are
    * bit-portable across engines; the cheap recall-oriented lexical leg
    * for rank fusion. Same broadcast-probe shape as [[bm25Scores]].
    */
  def overlapTopK(docs: DataFrame, idCol: String, textCol: String,
                  queries: DataFrame, k: Int): DataFrame = {
    val docTerms = docs.select(col(idCol).as("__id"),
        explode(filter(split(lower(col(textCol)), " "), t => t =!= lit("")))
          .as("term"))
      .distinct()
    val qterms = queries
      .select(col("qid"),
        explode(filter(split(lower(col("qtext")), " "), t => t =!= lit("")))
          .as("term"))
      .distinct()
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("inter").desc, col("__id"))
    docTerms.join(broadcast(qterms), Seq("term"))
      .groupBy(col("qid"), col("__id"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("__id").as(idCol), col("rank"), col("inter"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) of two ranked
    * lists keyed (qid, id, rank): rrf = Σ 1/(c + rank) over the lists
    * containing the item. Input ranks are integers, each 1/(c+rank) is
    * a correctly-rounded IEEE division, and the two-term sum is written
    * in a fixed order — so the fused score is bit-identical on any
    * engine, and the fused ORDERING (score desc, id) is deterministic
    * without rounding tricks.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, k: Int,
              c: Int = 60): DataFrame = {
    val left = a.select(col("qid"), col(idCol), col("rank").as("rank_a"))
    val right = b.select(col("qid"), col(idCol), col("rank").as("rank_b"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf").desc, col(idCol))
    left.join(right, Seq("qid", idCol), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(c) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("rank_b")), lit(0.0)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col(idCol), col("rank"),
        col("rank_a"), col("rank_b"), roundz(col("rrf"), 6).as("rrf6"))
  }
}
