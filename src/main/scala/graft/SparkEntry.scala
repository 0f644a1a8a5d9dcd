package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.queries.{Advanced, Corpus, Events, Ext, Relational, Sources, Text}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: Relational (§2.4/2.6/2.8/2.9 over TPC-H-ish tables),
  * Events (dedup/session/window/pivot), Text (EXT text analysis + exact
  * dedup), Ext (near-dup, similarity search, Active911 pipeline).
  * Every SQL-expressible entry has a DuckDB oracle with byte-stable
  * semantics (exact integer cents, BIGINT casts, total ORDER BY).
  */
object SparkEntry {

  /** Flagship on sf0.001: revenue by nation with dimension broadcast
    * joins, exact-cents aggregation, and a window rank — a cross-section
    * of the engine's relational core. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = Graft.table(spark, d, "lineitem")
    val o = Graft.table(spark, d, "orders")
    val c = Graft.table(spark, d, "customer")
    val n = Graft.table(spark, d, "nation")
    val rev = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) * 100, 0)
        .cast("long").as("revenue_cents"),
        count(lit(1)).as("n_lineitems"))
    rev.withColumn("rank",
        row_number().over(Window.orderBy(col("revenue_cents").desc, col("n_name"))))
      .orderBy(col("rank"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Events.queries ++ Text.queries ++ Ext.queries ++
      Advanced.queries ++ Corpus.queries ++ Sources.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (hash/LSH-based ops, the
    * Active911 wire pipeline) are non-SQL-expressible → rows-only check;
    * their semantics are pinned by ScalaTest specs.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Events.oracles ++ Text.oracles ++ Ext.oracles ++
      Advanced.oracles ++ Corpus.oracles ++ Sources.oracles
}
