package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.queries.{Advanced, AdvancedStreaming, Analytics, Corpus, Events, Ext, Geo, Metrics, Relational, Sources, Stats, Text}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: Relational (§2.4/2.6/2.8/2.9 over TPC-H-ish tables),
  * Events (dedup/session/window/pivot), Text (EXT text analysis + exact
  * dedup), Ext (near-dup, similarity search, Active911 pipeline).
  * Every SQL-expressible entry has a DuckDB oracle with byte-stable
  * semantics (exact integer cents, BIGINT casts, total ORDER BY).
  */
object SparkEntry {

  /** Flagship on sf0.001: the composed LLM-curation pipeline — the
    * engine's signature surface (quality gate → exact dedup → banded
    * MinHash-LSH near-dup removal → stratified sample → shard packing,
    * the q152/q119 shape) joined with the relational core it shares the
    * session with (revenue by nation, broadcast dims, exact cents). One
    * smoke run exercises tokenize/agg, window dedup, the xxhash64
    * expression stack, the LSH band join, the sampling predicate, the
    * packing window, AND the join/agg relational path. Driver
    * smoke-checks rows > 0 (one row per packed shard).
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    // curation leg: quality → exact dedup → LSH near-dup → sample → pack
    val base = Graft.table(spark, d, "documents")
    val kept = graft.ext.Corpus.repetitionFilter(base, "doc_id", "text")
      .filter(col("kept")).select(col("doc_id"))
    val quality = base.join(kept, Seq("doc_id"), "left_semi")
    val wx = Window.partitionBy(col("__h")).orderBy(col("doc_id"))
    val exact = quality
      .withColumn("__h",
        sha2(trim(regexp_replace(lower(col("text")), "\\s+", " ")), 256))
      .withColumn("__rn", row_number().over(wx))
      .filter(col("__rn") === 1).drop("__h", "__rn")
    val removed = graft.ext.NearDup
      .minhashNearDups(exact, "doc_id", "text", threshold = 0.6)
      .select(col("id_b").as("doc_id")).distinct()
    val survivors = exact.join(removed, Seq("doc_id"), "left_anti")
    val sampled = graft.ext.Corpus.stratifiedSample(survivors, col("doc_id"),
      col("lang"), permille = Map("en" -> 400L), defaultPermille = 200L)
    val shards = graft.ext.Corpus.packShards(
        sampled.withColumn("n_tokens",
          size(split(lower(col("text")), " ")).cast("long")),
        stratum = col("lang"), order = col("doc_id"),
        weight = col("n_tokens"), budget = 1500L)
      .groupBy(col("lang"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
    // relational leg: revenue by nation (broadcast dims, exact cents)
    val li = Graft.table(spark, d, "lineitem")
    val o = Graft.table(spark, d, "orders")
    val c = Graft.table(spark, d, "customer")
    val n = Graft.table(spark, d, "nation")
    val rev = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) * 100, 0)
        .cast("long").as("revenue_cents"),
        count(lit(1)).as("n_lineitems"))
    shards.crossJoin(broadcast(rev)) // one-row relational summary per shard
      .orderBy(col("lang"), col("shard"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Events.queries ++ Text.queries ++ Ext.queries ++
      Advanced.queries ++ AdvancedStreaming.queries ++ Corpus.queries ++ Sources.queries ++ Geo.queries ++
      Metrics.queries ++ Analytics.queries ++ Stats.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (hash/LSH-based ops, the
    * Active911 wire pipeline) are non-SQL-expressible → rows-only check;
    * their semantics are pinned by ScalaTest specs.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Events.oracles ++ Text.oracles ++ Ext.oracles ++
      Advanced.oracles ++ AdvancedStreaming.oracles ++ Corpus.oracles ++ Sources.oracles ++ Geo.oracles ++
      Metrics.oracles ++ Analytics.oracles ++ Stats.oracles
}
