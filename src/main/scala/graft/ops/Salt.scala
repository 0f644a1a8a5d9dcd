package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (SURVEY.md §7 / builder north star: "salting for skew").
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default in [[graft.Graft.session]]) handles sort-merge skew at
  * runtime; explicit salting is the static fallback for the cases AQE
  * can't rewrite — aggregations over one giant key, or broadcast-hash
  * joins where a single probe-side key floods one task.
  */
object Salt {

  /** Deterministic per-row salt in [0, buckets): hash of the given
    * columns (no `rand()` — task retries must produce the same salt or
    * shuffle-file reuse breaks correctness).
    */
  def saltCol(buckets: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong))

  /** Skew-resistant equi-join: the big (skewed) side is split into
    * `buckets` sub-keys by a deterministic row hash; the small side is
    * replicated once per bucket. A hot key's rows then land on `buckets`
    * tasks instead of one. Cost: small side shuffled/broadcast ×buckets —
    * use for genuinely skewed keys, not as the default join.
    */
  def skewJoin(big: DataFrame, small: DataFrame,
               bigKey: String, smallKey: String,
               buckets: Int = 8, joinType: String = "inner"): DataFrame = {
    // the small side is replicated once per bucket, so join types that
    // emit unmatched SMALL-side rows (right/full outer) would duplicate
    // each such row `buckets` times — only inner/left variants are sound
    val canonical = joinType.toLowerCase.replaceAll("[_ ]", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "semi",
        "leftanti", "anti").contains(canonical),
      s"skewJoin supports inner/left join types only (small side is " +
        s"replicated per bucket; right/full outer would emit unmatched " +
        s"small-side rows $buckets times) — got '$joinType'")
    val saltCols = big.columns.map(col).toSeq
    val b = big.withColumn("__salt", saltCol(buckets, saltCols: _*))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    b.join(s, b(bigKey) === s(smallKey) && b("__salt") === s("__salt"), joinType)
      .drop("__salt")
  }

  /** Two-stage aggregation for skewed group keys: partial aggregate on
    * (key, salt), final aggregate on key. Spark's hash aggregate already
    * map-side-combines, but when one key dominates an entire partition
    * AFTER the shuffle, pre-splitting it is the only static remedy.
    * `partials` maps each input aggregation to its merge form, e.g.
    * `sum(x) -> sum`, `count(*) -> sum`.
    */
  def saltedAgg(df: DataFrame, key: Column, buckets: Int,
                partial: Seq[(Column, String)],
                merge: Seq[(String, Column => Column)]): DataFrame = {
    val salted = df
      .withColumn("__salt", saltCol(buckets, df.columns.map(col).toSeq: _*))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partial.head._1.as(partial.head._2),
        partial.tail.map { case (c, n) => c.as(n) }: _*)
    salted.groupBy(col("__key"))
      .agg(merge.head._2(col(merge.head._1)).as(merge.head._1),
        merge.tail.map { case (n, f) => f(col(n)).as(n) }: _*)
  }
}
