package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.{spreadIfNarrow, table}
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
    }))

  val oracles: Map[String, String] = Map(
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
         WHERE (doc_id * 2654435761) % 1000 <
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
         FROM s ORDER BY doc_id""")
}
