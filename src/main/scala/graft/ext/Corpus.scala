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

  /** Deterministic per-row sample bucket in [0, 1000): multiplicative
    * (Knuth) hash of a key column — reproducible across retries and
    * re-runs, and recomputable by any engine (plain integer math, unlike
    * xxhash64). For keys with adversarial structure prefer
    * [[sampleBucketStrong]]; for sequential ids the multiplicative mix
    * is uniform enough and oracle-checkable.
    */
  def sampleBucket(key: Column): Column =
    pmod(key.cast("long") * lit(2654435761L), lit(1000L))

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
}
