package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-key skew diagnostics — the measurement that justifies picking
  * [[Salt.skewJoin]] (q98) over a plain shuffle join. At 100 TB you do
  * not guess whether a key is hot; you run ONE map-side-combined
  * aggregation over the key (the same shuffle the join itself would
  * do, minus the payload) and read the histogram.
  */
object Diagnose {

  /** Top-`topK` heaviest keys with their counts and corpus share, plus
    * constant summary columns (distinct keys, mean rows/key, max/mean
    * skew factor). The per-key aggregate is two-stage hash agg; top-K
    * is TakeOrderedAndProject; the one-row summary broadcasts back over
    * the K result rows (scale-safe by construction).
    *
    * Reading: `skew_factor` ≈ 1 means uniform keys — shuffle join is
    * fine; ≫ 1 means the hottest key's partition dominates the stage —
    * reach for salting (`Salt.skewJoin`), AQE skew split, or a
    * broadcast if the other side is small.
    */
  def keyHistogram(df: DataFrame, key: Column, topK: Int): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
    val summary = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"))
    counts
      .orderBy(col("cnt").desc, col("key"))
      .limit(topK)
      .crossJoin(broadcast(summary))
      .select(col("key"), col("cnt"),
        round(col("cnt").cast("double") / col("n_rows"), 6).as("share"),
        col("n_keys"),
        round(col("max_cnt").cast("double") * col("n_keys") / col("n_rows"), 4)
          .as("skew_factor"))
  }
}
