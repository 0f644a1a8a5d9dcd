package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (Deequ-style constraint suites)
  * and snapshot diffing (CDC-shape change detection) — the admission
  * control a training-data pipeline runs before a table enters the
  * corpus, and the audit trail when a table is republished.
  *
  * Scale design (100 TB stance):
  *  - a whole constraint suite (row count, per-column null counts,
  *    accepted-value violations, numeric bounds, key uniqueness) is
  *    FUSED into ONE aggregate over one scan — metric count doesn't
  *    multiply passes (Deequ's analyzer-fusion idea); the single
  *    distinct-count rides the same two-stage hash aggregate;
  *  - referential integrity is a left-anti join COUNT on the key —
  *    never materializing orphan rows, broadcast when the parent's key
  *    column is dimension-sized;
  *  - snapshot diff is one full-outer join on the key with per-column
  *    change flags computed in the join projection, aggregated to
  *    per-status / per-column counts — the diff never collects, and a
  *    null-safe comparison (`<=>`) keeps null transitions honest.
  */
object Audit {

  /** One-scan constraint suite. Returns (check, target, metric, ok):
    * `row_count` (metric = n, ok = n > 0), `not_null` per column
    * (metric = null count), `accepted_values` per column (metric =
    * violation count), `bounds` per column (metric = out-of-range
    * count), `unique_key` (metric = n − distinct(key), 0 when the key
    * is unique).
    */
  def tableAudit(df: DataFrame, uniqueKey: Seq[String],
                 notNull: Seq[String] = Seq.empty,
                 accepted: Map[String, Seq[String]] = Map.empty,
                 bounds: Map[String, (Double, Double)] = Map.empty): DataFrame = {
    val aggs =
      Seq(count(lit(1)).cast("double").as("__n"),
        count_distinct(struct(uniqueKey.map(col): _*)).cast("double")
          .as("__dk")) ++
      notNull.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("double")
          .as(s"__nn_$c")) ++
      accepted.map { case (c, vals) =>
        sum(when(col(c).isNull || !col(c).isin(vals: _*), 1L).otherwise(0L))
          .cast("double").as(s"__av_$c") } ++
      bounds.map { case (c, (lo, hi)) =>
        sum(when(col(c).isNull || col(c) < lo || col(c) > hi, 1L)
          .otherwise(0L)).cast("double").as(s"__bd_$c") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single metrics row into (check, target, metric, ok)
    val rows: Seq[Column] =
      Seq(struct(lit("row_count").as("check"), lit("*").as("target"),
          col("__n").as("metric"), (col("__n") > 0).as("ok")),
        struct(lit("unique_key").as("check"),
          lit(uniqueKey.mkString(",")).as("target"),
          (col("__n") - col("__dk")).as("metric"),
          (col("__n") === col("__dk")).as("ok"))) ++
      notNull.map(c => struct(lit("not_null").as("check"), lit(c).as("target"),
        col(s"__nn_$c").as("metric"), (col(s"__nn_$c") === 0).as("ok"))) ++
      accepted.keys.toSeq.sorted.map(c =>
        struct(lit("accepted_values").as("check"), lit(c).as("target"),
          col(s"__av_$c").as("metric"), (col(s"__av_$c") === 0).as("ok"))) ++
      bounds.keys.toSeq.sorted.map(c =>
        struct(lit("bounds").as("check"), lit(c).as("target"),
          col(s"__bd_$c").as("metric"), (col(s"__bd_$c") === 0).as("ok")))
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check").as("check"), col("r.target").as("target"),
        col("r.metric").as("metric"), col("r.ok").as("ok"))
  }

  /** Referential-integrity check: count of child keys with no parent.
    * Anti-join on the key only — parent projects a single column and
    * broadcasts when small.
    */
  def refIntegrity(child: DataFrame, childKey: String, parent: DataFrame,
                   parentKey: String, checkName: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).cast("double").as("metric"))
      .select(lit(checkName).as("check"), lit(childKey).as("target"),
        col("metric"), (col("metric") === 0).as("ok"))

  /** Snapshot diff on a key: per-row status (added / removed / changed /
    * unchanged) from ONE full-outer join, with null-safe per-column
    * change flags. Returns the keyed row-level diff; aggregate for the
    * summary shape.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, key: String,
                   compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select(col(key) +: compareCols.map(c => col(c).as(s"o_$c")): _*)
      .withColumn("__in_o", lit(1))
    val n = newDf.select(col(key) +: compareCols.map(c => col(c).as(s"n_$c")): _*)
      .withColumn("__in_n", lit(1))
    val changedFlags = compareCols.map(c =>
      (!(col(s"o_$c") <=> col(s"n_$c"))).cast("int").as(s"chg_$c"))
    val j = o.join(n, Seq(key), "full_outer")
      .select(Seq(col(key), col("__in_o"), col("__in_n")) ++ changedFlags: _*)
    val nChanged = compareCols.map(c => col(s"chg_$c"))
      .reduce(_ + _)
    j.withColumn("status",
        when(col("__in_o").isNull, lit("added"))
          .when(col("__in_n").isNull, lit("removed"))
          .when(nChanged > 0, lit("changed"))
          .otherwise(lit("unchanged")))
      .select(Seq(col(key), col("status")) ++
        compareCols.map(c =>
          when(col("status") === "changed", col(s"chg_$c"))
            .otherwise(lit(0)).as(s"chg_$c")): _*)
  }
}
